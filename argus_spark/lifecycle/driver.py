"""IndexDriver — the checkpointed, rollback-aware micro-batch engine
(SURVEY §2.A A8-A18; §3.1-3.3 lifecycle traces).

Consumes an ordered stream of chain events (roll_forward(block_slot) /
roll_back(slot, type)); folds blocks through the reducer DAG in
topological order; commits data + checkpoints atomically per epoch via
ParquetStateStore.

Commit triggers (A9, ReducerGraphProcessor.cs:166-173):
  * batch full (``batch_size`` blocks, default 500 — the measured
    throughput knee, CardanoIndexWorker.cs:55-60)
  * age > ``max_delay_s`` (default 1.0)
  * drain (end of feed / rollback arriving)

Empty epochs defer their commit (A10): checkpoint advance piggybacks
on the next data-bearing commit, so quiet periods cost zero fsyncs.

Rollback (A12): commit the open batch first (pre-fork blocks are
valid), then one atomic retraction commit — every table loses
``slot >= X``, every window rewinds — in topo order semantics but a
single manifest publish.

Resume (A14/A15): per-reducer skip slots from committed checkpoints;
a fresh dependent starts at its parent's position instead of genesis;
a root graph resumes from the minimum latest across its members.

Control flow (event sequencing, checkpoint windows) is driver-side
Python over tiny metadata; block payloads only ever move through
DataFrame transforms — nothing on the data path is collected.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from argus_spark.lifecycle.dag import Reducer, ReducerRegistry
from argus_spark.lifecycle.state import (
    DEFAULT_MAX_ROLLBACK_SLOTS,
    DEFAULT_WINDOW,
    Point,
    check_rollback_depth,
    latest_slot,
    normalize_rollback,
    window_roll_back,
    window_roll_forward,
)
from argus_spark.lifecycle.store import ParquetStateStore, ReducerStateRow


@dataclass
class ChainEvent:
    action: str  # 'roll_forward' | 'roll_back'
    block_slot: int | None = None
    rollback_slot: int | None = None
    rollback_type: str | None = None

    @staticmethod
    def from_row(row) -> "ChainEvent":
        return ChainEvent(
            action=row["action"],
            block_slot=row["block_slot"],
            rollback_slot=row["rollback_slot"],
            rollback_type=row["rollback_type"],
        )


class ReducerContext:
    """What a reducer sees during an epoch: the epoch's blocks (already
    filtered past its own checkpoint) and read-your-writes table access
    (B17 — committed sink state unioned with this epoch's uncommitted
    appends, the ``.Local`` + DB union,
    LovelaceBalanceByAddressReducer.cs:91-97)."""

    def __init__(
        self,
        spark: SparkSession,
        store: ParquetStateStore,
        blocks: DataFrame,
        pending: dict[str, list[DataFrame]],
        epoch_range: tuple[int, int],
    ) -> None:
        self.spark = spark
        self.store = store
        self.blocks = blocks
        self._pending = pending
        self.epoch_range = epoch_range

    def table(self, name: str, min_slot: int | None = None) -> DataFrame | None:
        committed = self.store.read_table(self.spark, name, min_slot)
        parts = list(self._pending.get(name, []))
        if committed is not None:
            parts.append(committed)
        if not parts:
            return None
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out


@dataclass
class DriverStats:
    blocks: int = 0
    epochs: int = 0
    rollbacks: int = 0
    skipped: int = 0
    reducer_seconds: dict[str, float] = field(default_factory=dict)
    wall_seconds: float = 0.0


class IndexDriver:
    def __init__(
        self,
        spark: SparkSession,
        registry: ReducerRegistry,
        store: ParquetStateStore,
        blocks_df: DataFrame,
        batch_size: int = 500,
        max_delay_s: float = 1.0,
        window_k: int = DEFAULT_WINDOW,
        max_rollback_slots: int = DEFAULT_MAX_ROLLBACK_SLOTS,
        telemetry=None,  # optional lifecycle.telemetry.Telemetry (A21)
        compact_every: int | None = None,  # epochs between maintenance passes
        compact_min_groups: int = 8,  # only touch tables fragmented past this
    ) -> None:
        self.spark = spark
        self.registry = registry
        self.compact_every = compact_every
        self.compact_min_groups = compact_min_groups
        self.store = store
        self.blocks_df = blocks_df
        self.batch_size = batch_size
        self.max_delay_s = max_delay_s
        self.window_k = window_k
        self.max_rollback_slots = max_rollback_slots
        self.telemetry = telemetry
        registry.validate()
        self._order = registry.topo_order()
        # in-memory checkpoint windows, loaded from the committed manifest
        self._windows: dict[str, list[Point]] = {}
        self._deferred_states = False  # A10: windows advanced but not persisted
        self._resume: dict[str, int] = {}
        self._load_state()
        self.stats = DriverStats()

    # ---------------- state / resume (A13-A15) ----------------

    def _load_state(self) -> None:
        states = self.store.reducer_states()
        for r in self._order:
            st = states.get(r.name)
            self._windows[r.name] = st.window() if st else []
        for r in self._order:
            st = states.get(r.name)
            # exact committed floor: persisted resume cursor, falling back
            # to the window's newest point (pre-cursor manifests)
            mine = st.resume_slot if st else -1
            wlatest = latest_slot(self._windows[r.name])
            if wlatest is not None:
                mine = max(mine, wlatest)
            if mine < 0 and r.depends_on is not None:
                # A14 — fresh dependent of a synced parent starts at the
                # parent's position, not genesis (StartPoints.cs:98-180)
                mine = self._resume.get(r.depends_on, -1)
            self._resume[r.name] = mine

    def graph_resume_slot(self) -> int:
        """A15 — safe intersection: min of members' committed floors.
        Blocks at or below this are skipped on replay (idempotent
        at-least-once → exactly-once effect, B41)."""
        floors = [self._resume[r.name] for r in self._order]
        return min(floors) if floors else -1

    # ---------------- main loop ----------------

    def run(self, events) -> DriverStats:
        """Process an iterable of ChainEvent (or chain_events rows) in
        order. Returns stats. Restartable: committed state resumes."""
        t0 = time.monotonic()
        pending: list[int] = []
        batch_opened = time.monotonic()
        graph_floor = self.graph_resume_slot()

        for ev in events:
            if not isinstance(ev, ChainEvent):
                ev = ChainEvent.from_row(ev)
            if ev.action == "roll_forward":
                if ev.block_slot is None:
                    continue
                if ev.block_slot <= graph_floor and not pending:
                    # replayed block below every member's checkpoint
                    self.stats.skipped += 1
                    continue
                if not pending:
                    batch_opened = time.monotonic()
                pending.append(ev.block_slot)
                full = len(pending) >= self.batch_size
                aged = (time.monotonic() - batch_opened) >= self.max_delay_s
                if full or aged:
                    self._flush(pending)
                    pending = []
            elif ev.action == "roll_back":
                # A12 — commit the open batch first: pre-fork blocks are valid
                if pending:
                    self._flush(pending)
                    pending = []
                self._apply_rollback(ev)
                graph_floor = self.graph_resume_slot()
            else:
                raise ValueError(f"unknown action {ev.action!r}")
        if pending:  # drain trigger (at tip / end of feed)
            self._flush(pending)
        if self._deferred_states:  # persist windows deferred by empty epochs
            self._commit_states_only()
        self.stats.wall_seconds = time.monotonic() - t0
        return self.stats

    # ---------------- epoch flush (A8, A9, A11) ----------------

    def _flush(self, slots: list[int]) -> None:
        lo, hi = min(slots), max(slots)
        blocks = self.blocks_df.filter(
            (F.col("slot") >= lo) & (F.col("slot") <= hi)
        )
        n_blocks = len(slots)
        if n_blocks > 1:
            # Reused by every reducer in the epoch. Materialized eagerly
            # (by the tip-points collect below — TakeOrdered evaluates
            # every partition, filling the cache): the epoch's writes run
            # concurrently, and concurrent actions on a cold cache each
            # recompute the scan instead of sharing.
            blocks = blocks.cache()

        pending_out: dict[str, list[DataFrame]] = {}
        cached_out: list[DataFrame] = []
        appends: dict[str, tuple[DataFrame, int, int]] = {}
        epoch_times: dict[str, float] = {}
        # DAG level per reducer → write waves (parents' sinks before
        # dependents' sinks, parallel within a level)
        level: dict[str, int] = {}
        for r in self._order:
            level[r.name] = 0 if r.depends_on is None else level[r.depends_on] + 1
        table_level: dict[str, int] = {}
        try:
            # checkpoint advance source: the newest K points of the epoch
            # (folding newest K gives the same window as folding all N).
            # Collected BEFORE the reducer loop — the one action that
            # both fills the shared block cache and fetches the control-
            # plane points (a few rows, not a data-path collect).
            tip_points = [
                Point(slot=row["slot"], hash=row["hash"])
                for row in blocks.select("slot", "hash")
                .orderBy(F.desc("slot"))
                .limit(self.window_k)
                .collect()
            ][::-1]
            for r in self._order:
                floor = self._resume[r.name]
                my_blocks = blocks.filter(F.col("slot") > floor) if floor >= lo else blocks
                ctx = ReducerContext(
                    self.spark, self.store, my_blocks, pending_out, (lo, hi)
                )
                t = time.monotonic()
                outputs = r.apply(ctx) or {}
                epoch_times[r.name] = time.monotonic() - t
                self.stats.reducer_seconds[r.name] = self.stats.reducer_seconds.get(
                    r.name, 0.0
                ) + epoch_times[r.name]
                for tbl, df in outputs.items():
                    # Each output is consumed up to three times: by its
                    # own sink write, by dependents' read-your-writes
                    # plans (B17), and by dependents' writes. cache() +
                    # level-waved writes (below) ⇒ each lineage
                    # materializes exactly once — its own sink write —
                    # and everything downstream reads the cached rows
                    # (Spark's cache manager substitutes matching plan
                    # subtrees in later plans too).
                    df = df.cache()
                    cached_out.append(df)
                    pending_out.setdefault(tbl, []).append(df)
                    table_level[tbl] = level[r.name]

            for tbl, dfs in pending_out.items():
                df = dfs[0]
                for d in dfs[1:]:
                    df = df.unionByName(d)
                appends[tbl] = (df, lo, hi)

            for r in self._order:
                w = self._windows[r.name]
                for p in tip_points:
                    if p.slot > self._resume[r.name]:
                        w = window_roll_forward(w, p, self.window_k)
                self._windows[r.name] = w
                self._resume[r.name] = max(self._resume[r.name], hi)

            n_levels = max(table_level.values(), default=0) + 1
            waves = [
                [t for t, lv in table_level.items() if lv == i]
                for i in range(n_levels)
            ]
            manifest = self.store.commit(
                appends=appends,
                states=self._state_rows(),
                meta={"epoch": [lo, hi], "n_blocks": n_blocks},
                waves=waves,
            )
            # A10 — if nothing was written, the manifest still published
            # (cheap local JSON); defer-if-empty is tracked for parity
            self._deferred_states = not manifest.get("_wrote_data", True)
            self.stats.blocks += n_blocks
            self.stats.epochs += 1
            if self.telemetry is not None:
                self.telemetry.record_epoch(
                    manifest["id"], lo, hi, n_blocks, epoch_times
                )
            if self.compact_every and self.stats.epochs % self.compact_every == 0:
                self._maintain()
        finally:
            for df in cached_out:
                df.unpersist()
            if n_blocks > 1:
                blocks.unpersist()

    def _maintain(self) -> None:
        """Scheduled maintenance: frozen-zone compaction + vacuum.
        Only file-groups wholly below the rollback horizon (tip −
        max_rollback_slots) are merged, so retraction cost stays
        O(reorg depth) while read amplification and file fan-out stay
        bounded in chain length — the Delta/Iceberg OPTIMIZE analogue,
        commit-atomic via the same manifest rename."""
        tip = max((self._resume[r.name] for r in self._order), default=-1)
        horizon = tip - self.max_rollback_slots
        if horizon <= 0:
            return
        for tbl in list(self.store.current_manifest()["tables"]):
            if len(self.store.table_groups(tbl)) >= self.compact_min_groups:
                self.store.compact(self.spark, tbl, upto_slot=horizon)
        self.store.vacuum()

    def _state_rows(self) -> dict[str, ReducerStateRow]:
        existing = self.store.reducer_states()
        out = {}
        for r in self._order:
            prev = existing.get(r.name)
            out[r.name] = ReducerStateRow(
                name=r.name,
                created_at=prev.created_at if prev else time.time(),
                start_point=prev.start_point if prev else None,
                latest_points=[p.as_dict() for p in self._windows[r.name]],
                resume_slot=self._resume[r.name],
            )
        return out

    def _commit_states_only(self) -> None:
        self.store.commit(appends={}, states=self._state_rows(), meta={"ckpt": True})
        self._deferred_states = False

    # ---------------- rollback (A5, A12, A16, A17) ----------------

    def _apply_rollback(self, ev: ChainEvent) -> None:
        delete_from = normalize_rollback(ev.rollback_slot, ev.rollback_type)
        current = max(
            (self._resume[r.name] for r in self._order), default=-1
        )
        check_rollback_depth(
            current if current >= 0 else None, delete_from, self.max_rollback_slots
        )
        self.rewind_to(delete_from)
        self.stats.rollbacks += 1
        if self.telemetry is not None:
            self.telemetry.record_event("rollback", ev.rollback_type or "", delete_from)

    def rewind_to(self, delete_from: int, meta: dict[str, Any] | None = None) -> None:
        """A17 operator rewind / A12 reorg retraction: one atomic commit
        deleting ``slot >= delete_from`` everywhere + rewound windows.
        Custom per-reducer retract hooks run first (for tables outside
        the slot convention)."""
        for r in self._order:
            if r.retract is not None:
                r.retract(self.store, delete_from)
        for r in self._order:
            self._windows[r.name] = window_roll_back(
                self._windows[r.name], delete_from, self.window_k
            )
            self._resume[r.name] = min(self._resume[r.name], delete_from - 1)
        self.store.commit(
            appends={},
            states=self._state_rows(),
            retract_from=delete_from,
            spark=self.spark,
            meta=meta or {"rollback_to": delete_from},
        )
