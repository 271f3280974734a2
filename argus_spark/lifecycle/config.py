"""appsettings-shaped configuration for the lifecycle engine — the
reference's entire tuning surface is an `IConfiguration` tree read by
the worker (src/Argus.Sync/Workers/CardanoIndexWorker.cs:54-72 and the
rollback-mode block ibid:181-202); a user switching from the reference
brings an ``appsettings.json`` and expects the same keys to mean the
same things. This module reads THAT shape (colon-separated key paths,
identical defaults) and maps it onto the rebuild's constructors:

  reference key                                   → rebuild knob
  ------------------------------------------------------------------
  Sync:Commit:BatchSize            (500, min 1)   → IndexDriver.batch_size
  Sync:Commit:MaxDelayMs           (1000, min 1)  → IndexDriver.max_delay_s
  CardanoNodeConnection:MaxRollbackSlots (10_000) → IndexDriver.max_rollback_slots
  CardanoNodeConnection:RollbackBuffer   (10)     → IndexDriver.window_k
  Sync:Pipeline:ChannelCapacity    (256)          → StreamingIndexer.max_files_per_trigger
                                                    (the bounded-inbox analogue, A6)
  CardanoNodeConnection:NetworkMagic (2)          → carried for connectors
  CardanoNodeConnection:Hash/Slot  (required)     → default start point (A14)
  Sync:Worker:ExitOnCompletion     (true)         → availableNow vs continuous trigger
  Sync:Dashboard:TuiMode (true) / RefreshInterval
                        (1000, clamped ≥ 2000)    → telemetry/dashboard cadence
  Sync:Rollback:Enabled (false) + Slot
    + Reducers:<name>:{Enabled,Slot}              → one-shot startup rewind
                                                    (A17 — ``rewind_plan``)

Unknown keys are REJECTED under the recognized prefixes (a typo like
``Sync:Commit:BatchSiz`` silently reverting to a default is the classic
config foot-gun), and pass through untouched elsewhere (provider
sections the rebuild doesn't own).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any

_KNOWN = {
    "Sync:Pipeline:ChannelCapacity",
    "Sync:Commit:BatchSize",
    "Sync:Commit:MaxDelayMs",
    "Sync:Rollback:Enabled",
    "Sync:Rollback:Hash",
    "Sync:Rollback:Slot",
    "Sync:Worker:ExitOnCompletion",
    "Sync:Dashboard:TuiMode",
    "Sync:Dashboard:RefreshInterval",
    "CardanoNodeConnection:MaxRollbackSlots",
    "CardanoNodeConnection:RollbackBuffer",
    "CardanoNodeConnection:NetworkMagic",
    "CardanoNodeConnection:Hash",
    "CardanoNodeConnection:Slot",
}
# prefixes under which unknown leaves are config errors
_OWNED_PREFIXES = ("Sync:", "CardanoNodeConnection:")
# dynamic per-reducer subtree: Sync:Rollback:Reducers:<name>:{Enabled,Slot,Hash}
_REDUCER_PREFIX = "Sync:Rollback:Reducers:"


class ConfigError(ValueError):
    pass


def _flatten(tree: dict, prefix: str = "") -> dict[str, Any]:
    out: dict[str, Any] = {}
    for k, v in tree.items():
        path = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, path + ":"))
        else:
            out[path] = v
    return out


@dataclass
class IndexerConfig:
    """Parsed appsettings with the reference's defaults applied."""

    batch_size: int = 500
    max_delay_s: float = 1.0
    max_rollback_slots: int = 10_000
    window_k: int = 10
    channel_capacity: int = 256
    network_magic: int = 2
    start_hash: str = ""
    start_slot: int = 0
    exit_on_completion: bool = True
    tui_mode: bool = True
    dashboard_refresh_ms: int = 2000
    rollback_enabled: bool = False
    rollback_slot: int | None = None
    rollback_reducers: dict[str, dict[str, Any]] = field(default_factory=dict)
    extras: dict[str, Any] = field(default_factory=dict)

    @classmethod
    def from_dict(cls, tree: dict) -> "IndexerConfig":
        flat = _flatten(tree)
        reducers: dict[str, dict[str, Any]] = {}
        leftovers: dict[str, Any] = {}
        for path, v in list(flat.items()):
            if path.startswith(_REDUCER_PREFIX):
                rest = path[len(_REDUCER_PREFIX):]
                name, _, leaf = rest.rpartition(":")
                if leaf not in ("Enabled", "Slot", "Hash") or not name:
                    raise ConfigError(f"unrecognized rollback key: {path}")
                reducers.setdefault(name, {})[leaf] = v
                del flat[path]
            elif path not in _KNOWN:
                if path.startswith(_OWNED_PREFIXES):
                    raise ConfigError(
                        f"unrecognized config key: {path} (typo? the "
                        "reference would silently default here)"
                    )
                leftovers[path] = v
                del flat[path]
        if "CardanoNodeConnection:Hash" not in flat:
            raise ConfigError("Default start hash not configured.")
        if "CardanoNodeConnection:Slot" not in flat:
            raise ConfigError("Default start slot not configured.")
        return cls(
            batch_size=max(1, int(flat.get("Sync:Commit:BatchSize", 500))),
            max_delay_s=max(1, int(flat.get("Sync:Commit:MaxDelayMs", 1000)))
            / 1000.0,
            max_rollback_slots=int(
                flat.get("CardanoNodeConnection:MaxRollbackSlots", 10_000)
            ),
            window_k=int(flat.get("CardanoNodeConnection:RollbackBuffer", 10)),
            channel_capacity=int(
                flat.get("Sync:Pipeline:ChannelCapacity", 256)
            ),
            network_magic=int(
                flat.get("CardanoNodeConnection:NetworkMagic", 2)
            ),
            start_hash=str(flat["CardanoNodeConnection:Hash"]),
            start_slot=int(flat["CardanoNodeConnection:Slot"]),
            exit_on_completion=bool(
                flat.get("Sync:Worker:ExitOnCompletion", True)
            ),
            tui_mode=bool(flat.get("Sync:Dashboard:TuiMode", True)),
            # the reference clamps the refresh to >= 2000 ms
            dashboard_refresh_ms=max(
                int(flat.get("Sync:Dashboard:RefreshInterval", 1000)), 2000
            ),
            rollback_enabled=bool(flat.get("Sync:Rollback:Enabled", False)),
            rollback_slot=(
                int(flat["Sync:Rollback:Slot"])
                if "Sync:Rollback:Slot" in flat
                else None
            ),
            rollback_reducers=reducers,
            extras=leftovers,
        )

    @classmethod
    def from_json(cls, path: str) -> "IndexerConfig":
        with open(path) as f:
            return cls.from_dict(json.load(f))

    def driver_kwargs(self) -> dict[str, Any]:
        """kwargs for ``IndexDriver(spark, registry, store, blocks,
        **cfg.driver_kwargs())``."""
        return {
            "batch_size": self.batch_size,
            "max_delay_s": self.max_delay_s,
            "window_k": self.window_k,
            "max_rollback_slots": self.max_rollback_slots,
        }

    def rewind_plan(
        self, reducer_names: list[str]
    ) -> tuple[dict[str, int], list[str]] | None:
        """The reference's startup rollback mode
        (CardanoIndexWorker.cs:181-202): when ``Sync:Rollback:Enabled``,
        every reducer rewinds to the default ``Sync:Rollback:Slot``
        unless its ``Reducers:<name>`` block overrides the slot or opts
        out (``Enabled: false``). The configured point is an
        INTERSECTION: the reference replays the chain FROM it, and the
        chainsync opening rollback is Exclusive — the point's own block
        is KEPT — so the per-reducer delete-from is ``slot + 1`` (the
        A5 normalization). Returns ``(overrides, exclude)`` for
        ``IndexDriver.rewind_to`` — or None when rollback mode is off.
        Enabling rollback mode without any slot anywhere is a config
        error (the reference throws on the missing value too)."""
        if not self.rollback_enabled:
            return None
        overrides: dict[str, int] = {}
        exclude: list[str] = []
        for name in reducer_names:
            sub = self.rollback_reducers.get(name, {})
            if not sub.get("Enabled", True):
                exclude.append(name)
                continue
            slot = sub.get("Slot", self.rollback_slot)
            if slot is None:
                raise ConfigError(
                    f"rollback mode enabled but no slot for reducer "
                    f"{name!r} (set Sync:Rollback:Slot or "
                    f"Sync:Rollback:Reducers:{name}:Slot)"
                )
            overrides[name] = int(slot) + 1  # exclusive: keep the point
        return overrides, exclude

    def apply_startup_rewind(self, driver) -> bool:
        """Run the one-shot startup rewind against a constructed
        ``IndexDriver``; returns True if a rewind happened."""
        plan = self.rewind_plan([r.name for r in driver.registry])
        if plan is None:
            return False
        overrides, exclude = plan
        if not overrides:
            return False
        driver.rewind_to(
            min(overrides.values()),
            meta={"reason": "config_rollback_mode"},
            overrides=overrides,
            exclude=exclude,
        )
        return True
