"""Pure checkpoint/rollback kernels (SURVEY §2.A A5, A13, A16).

Semantics mirror the reference exactly:

  * rolling checkpoint window — keep the newest K distinct-slot points
    (src/Argus.Sync/Data/ReducerStateCheckpointWindow.cs:19-45)
  * rollback normalization — Exclusive keeps the point (delete > slot ⇒
    delete_from = slot+1); Inclusive deletes the point too
    (src/Argus.Sync/Utils/ArgusUtil.cs:90-99,
    Workers/ReducerGraphProcessor.cs:178-183)
  * max-rollback-depth guard
    (Workers/CardanoIndexWorker.cs:229-247)

Pure Python over tiny lists — checkpoint metadata, never a data path.
"""

from __future__ import annotations

from dataclasses import dataclass

DEFAULT_WINDOW = 10  # RollbackBuffer default (CardanoIndexWorker.cs:64)
DEFAULT_MAX_ROLLBACK_SLOTS = 10_000  # MaxRollbackSlots (CardanoIndexWorker.cs:63)


class CheckpointWindowError(Exception):
    pass


@dataclass(frozen=True, order=True)
class Point:
    slot: int
    hash: str

    def as_dict(self) -> dict:
        return {"hash": self.hash, "slot": self.slot}

    @staticmethod
    def from_dict(d: dict) -> "Point":
        return Point(slot=int(d["slot"]), hash=str(d["hash"]))


def _normalize(points: list[Point], k: int) -> list[Point]:
    """Sort desc by slot, distinct by slot, take K (newest-first)."""
    seen: set[int] = set()
    out: list[Point] = []
    for p in sorted(points, key=lambda p: p.slot, reverse=True):
        if p.slot not in seen:
            seen.add(p.slot)
            out.append(p)
        if len(out) == k:
            break
    return out


def window_roll_forward(
    points: list[Point], new: Point, k: int = DEFAULT_WINDOW
) -> list[Point]:
    """Advance the window to ``new``: any retained point at slot ≥
    new.slot is stale (same-slot re-apply or out-of-order echo) and is
    dropped before the new point is added."""
    kept = [p for p in points if p.slot < new.slot]
    return _normalize([new, *kept], k)


def window_roll_back(
    points: list[Point], slot: int, k: int = DEFAULT_WINDOW
) -> list[Point]:
    """Rewind: drop every point at slot ≥ the delete-from slot."""
    return _normalize([p for p in points if p.slot < slot], k)


def latest_slot(points: list[Point]) -> int | None:
    return max((p.slot for p in points), default=None)


def normalize_rollback(rollback_slot: int, rollback_type: str) -> int:
    """Map a provider rollback point to the delete-from slot.

    exclusive → keep the point, delete strictly after it (slot+1);
    inclusive → delete the point too (slot). Origin maps to inclusive 0
    upstream (ArgusUtil.cs:94-98).
    """
    if rollback_type == "exclusive":
        return rollback_slot + 1
    if rollback_type == "inclusive":
        return rollback_slot
    raise ValueError(f"unknown rollback type: {rollback_type!r}")


def check_rollback_depth(
    current_slot: int | None,
    delete_from_slot: int,
    max_rollback_slots: int = DEFAULT_MAX_ROLLBACK_SLOTS,
) -> None:
    """Fail fast on a rollback deeper than the retained buffer (A16)."""
    if current_slot is None:
        return
    depth = current_slot - delete_from_slot
    if depth > max_rollback_slots:
        raise CheckpointWindowError(
            f"rollback to slot {delete_from_slot} is {depth} slots behind "
            f"current {current_slot}, exceeding max {max_rollback_slots}"
        )


def safe_intersection(windows: dict[str, list[Point]]) -> Point | None:
    """A15 — resume point for a reducer graph: the *minimum* of members'
    latest checkpoints, so the laggiest member's blocks are re-fed
    (CardanoIndexWorker.StartPoints.cs:217-269)."""
    latests = [p[0] for p in windows.values() if p]
    if not latests or len(latests) < len(windows):
        return None  # some member has no checkpoint → start from origin
    return min(latests, key=lambda p: p.slot)
