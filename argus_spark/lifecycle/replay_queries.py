"""Driver-provable lifecycle scenarios — CORRECTNESS rows backed by a
REAL ``IndexDriver`` run, not operator SQL (r8 verdict item 5).

``balances_after_rollback`` (operators/utxo.py) proves the rollback
*math*; these two queries prove the *engine*: each constructs a real
store + reducer DAG, drives it through the scripted scenario the
reference's own flagship test uses (LovelaceBalanceRollbackTest.cs:
22-66 — sync, reorg, resume), and returns the committed serving view
for the driver's hash gate. The DuckDB oracle is the stateless closed
form over the same chain tables, so a green row certifies
incremental + checkpointed + rolled-back ≡ stateless recompute —
through the full A8-A18 path (epoch batching, atomic manifest
commits, rollback retraction, dependent start-point adjustment,
at-least-once replay absorption).

Both are EAGER by construction (the driver runs while the query is
built — the streaming-replay precedent); the returned DataFrame is a
lazy read of the committed store. Chains are capped (L_REORG/L_CRASH
blocks) to bound driver wall-clock; the caps appear in the oracles as
``least(count(*), L)`` so both engines cut at the same block.

Scale note: the scenario schedule is the correctness frame; the 100 TB
arguments live with the driver itself (per-epoch manifest-pruned
deltas, one atomic commit per epoch, retraction as metadata).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from argus_spark.chain.synth import CHAIN_SQL_CTES, synth_blocks, synth_watched
from argus_spark.lifecycle.driver import ChainEvent, IndexDriver
from argus_spark.lifecycle.store import ParquetStateStore
from argus_spark.reducers.examples import build_example_registry, current_balances

L_REORG = 2000  # blocks fed to the reorg scenario (cap; min with chain)
L_CRASH = 1200  # blocks fed to the crash scenario

_STATE_DIRS: dict[str, str] = {}


def _state_dir(key: str) -> str:
    """One store dir per (process, scenario, sf): re-construction wipes
    and re-runs rather than accumulating a store copy per call. The
    wipe re-creates the (now empty) dir — the SQL backend connects to
    a file INSIDE it and requires the parent to exist."""
    if key not in _STATE_DIRS:
        d = tempfile.mkdtemp(prefix=f"argus_lifecycle_{key.split('|')[0]}_")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        _STATE_DIRS[key] = d
    else:
        shutil.rmtree(_STATE_DIRS[key], ignore_errors=True)
        os.makedirs(_STATE_DIRS[key], exist_ok=True)
    return _STATE_DIRS[key]


def _fwd(slots: list[int]) -> list[ChainEvent]:
    return [ChainEvent("roll_forward", block_slot=s) for s in slots]


def _chain(spark: SparkSession, sf_dir: str, cap: int):
    blocks = synth_blocks(spark, sf_dir)
    watched = synth_watched(spark, sf_dir)
    # control-plane collect: the slot schedule (narrow ints), never data
    slots = [
        r.slot for r in blocks.select("slot").orderBy("slot").limit(cap).collect()
    ]
    return blocks, watched, slots


def lifecycle_reorg_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sync → mid-chain reorg → resume a SHORTER branch, through a real
    driver; return the final serving balances (latest snapshot per
    watched address).

    Schedule over the first L = min(chain, 2000) blocks: roll forward
    all L; roll back EXCLUSIVE to slots[L//2] (mid-batch — batch size
    is not a divisor of the fork index, so the retraction cuts inside
    an epoch); a FRESH driver (A14 start-point adjustment from
    persisted state) resumes the branch slots[L//2+1 : 3L//4]. The
    final tip is therefore slots[3L//4 - 1] — the oracle's balances
    cut there, so the VALUES prove the retraction actually removed
    [fork+1, tip] and the resume re-applied exactly the branch, not a
    straight-run equivalence."""
    blocks, watched, slots = _chain(spark, sf_dir, L_REORG)
    n = len(slots)
    fork, r = n // 2, 3 * n // 4
    store = ParquetStateStore(_state_dir(f"reorg|{sf_dir}"))
    blocks = blocks.cache()
    try:
        reg = build_example_registry(spark, watched)
        d = IndexDriver(
            spark, reg, store, blocks, batch_size=500, max_delay_s=1e9
        )
        d.run(_fwd(slots))
        d.run(
            [
                ChainEvent(
                    "roll_back",
                    rollback_slot=slots[fork],
                    rollback_type="exclusive",
                )
            ]
        )
        d2 = IndexDriver(
            spark, reg, store, blocks, batch_size=500, max_delay_s=1e9
        )
        d2.run(_fwd(slots[fork + 1 : r]))
    finally:
        blocks.unpersist()
    return current_balances(spark, store).select(
        "address_name", "slot", "balance"
    )


LIFECYCLE_REORG_REPLAY_SQL = (
    CHAIN_SQL_CTES
    + f"""
, ds AS (
  SELECT slot, row_number() OVER (ORDER BY slot) AS rn
  FROM (SELECT DISTINCT slot FROM outputs)
), lim AS (SELECT least(count(*), {L_REORG}) AS l FROM ds),
cut AS (
  SELECT max(ds.slot) AS tip FROM ds, lim WHERE ds.rn <= 3 * lim.l // 4
)
SELECT w.name AS address_name,
       cut.tip::BIGINT AS slot,
       CAST(COALESCE(b.balance, 0) AS BIGINT) AS balance
FROM watched w CROSS JOIN cut
LEFT JOIN (
  SELECT o.address_name, CAST(sum(o.amount) AS BIGINT) AS balance
  FROM outputs o, cut
  WHERE o.slot <= cut.tip
    AND NOT EXISTS (SELECT 1 FROM inputs i, cut c2
                    WHERE o.tx_hash = i.tx_id AND o.tx_index = i.idx
                      AND i.spend_slot <= c2.tip)
  GROUP BY o.address_name
) b ON w.name = b.address_name
"""
)


def lifecycle_reorg_replay_sqltxn(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The SAME reorg scenario as ``lifecycle_reorg_replay``, driven
    into the SQL-TRANSACTION backend (lifecycle/duckstore.py — the
    reference's EF/Postgres deployment shape: one ACID transaction per
    epoch, keyed MERGE upserts, slot-range retraction as SQL DELETEs,
    synchronous commits since a live database has no pinned
    snapshots). Same oracle as the parquet-backend row, so a green
    pair certifies both A11 backends converge to the identical state
    through sync → mid-chain reorg → fresh-driver branch resume."""
    from argus_spark.lifecycle.duckstore import DuckDBStateStore

    blocks, watched, slots = _chain(spark, sf_dir, L_REORG)
    n = len(slots)
    fork, r = n // 2, 3 * n // 4
    store = DuckDBStateStore(
        os.path.join(_state_dir(f"reorgsql|{sf_dir}"), "argus.duckdb")
    )
    blocks = blocks.cache()
    try:
        reg = build_example_registry(spark, watched)
        d = IndexDriver(
            spark, reg, store, blocks, batch_size=500, max_delay_s=1e9
        )
        d.run(_fwd(slots))
        d.run(
            [
                ChainEvent(
                    "roll_back",
                    rollback_slot=slots[fork],
                    rollback_type="exclusive",
                )
            ]
        )
        d2 = IndexDriver(
            spark, reg, store, blocks, batch_size=500, max_delay_s=1e9
        )
        d2.run(_fwd(slots[fork + 1 : r]))
        out = current_balances(spark, store).select(
            "address_name", "slot", "balance"
        )
    finally:
        blocks.unpersist()
    # the serving frame is a lazy scan of the store's parquet export,
    # which outlives the connection
    store.close()
    return out


class _CrashingStore(ParquetStateStore):
    """Injects a crash at the A11 commit point: data files for the
    torn epoch are on disk, the manifest rename never happens — the
    exact torn state the atomic-commit design makes invisible."""

    def __init__(self, root: str, publishes_before_crash: int) -> None:
        super().__init__(root)
        self._publishes_left = publishes_before_crash

    def _publish(self, manifest: dict) -> None:
        if self._publishes_left <= 0:
            raise RuntimeError("injected crash before manifest publish")
        self._publishes_left -= 1
        super()._publish(manifest)


def lifecycle_crash_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crash MID-EPOCH (during the commit, after data writes, before
    the manifest publish), then restart + full at-least-once replay;
    return the final serving balances.

    Over the first L = min(chain, 1200) blocks at batch
    min(400, L // 3) (derived so the feed always spans ≥3 epochs): the
    injected store crashes epoch 3's publish, so the driver dies with
    ~2 epochs committed and epoch 3's data files TORN on disk. A fresh
    store + driver re-runs the FULL feed from genesis: blocks below
    the committed floor are skipped (B41), the torn epoch is invisible
    (A11 — old manifest intact) and re-applies cleanly, and the final
    balances equal the stateless closed form at slots[L-1]. A
    duplicate-absorbing failure mode (torn files counted twice) would
    shift every balance — the hash gate catches it."""
    blocks, watched, slots = _chain(spark, sf_dir, L_CRASH)
    root = _state_dir(f"crash|{sf_dir}")
    # Derive the epoch size from the ACTUAL chain length so the injected
    # crash (at the 3rd manifest publish) always lands inside the feed:
    # a fixed 400 would yield <3 epochs on a truncated fixture (<=800
    # distinct slots) and the scenario would error instead of degrade.
    batch = max(1, min(400, len(slots) // 3))
    blocks = blocks.cache()
    try:
        reg = build_example_registry(spark, watched)
        crashing = _CrashingStore(root, publishes_before_crash=2)
        d1 = IndexDriver(
            spark, reg, crashing, blocks, batch_size=batch, max_delay_s=1e9
        )
        try:
            d1.run(_fwd(slots))
            raise AssertionError("injected crash did not fire")
        except RuntimeError:
            pass  # the crash — epoch 3's manifest never published
        store = ParquetStateStore(root)
        d2 = IndexDriver(
            spark, reg, store, blocks, batch_size=batch, max_delay_s=1e9
        )
        stats = d2.run(_fwd(slots))
        if stats.skipped == 0:
            raise AssertionError("restart must skip committed blocks")
    finally:
        blocks.unpersist()
    return current_balances(spark, store).select(
        "address_name", "slot", "balance"
    )


LIFECYCLE_CRASH_REPLAY_SQL = (
    CHAIN_SQL_CTES
    + f"""
, ds AS (
  SELECT slot, row_number() OVER (ORDER BY slot) AS rn
  FROM (SELECT DISTINCT slot FROM outputs)
), lim AS (SELECT least(count(*), {L_CRASH}) AS l FROM ds),
cut AS (SELECT max(ds.slot) AS tip FROM ds, lim WHERE ds.rn <= lim.l)
SELECT w.name AS address_name,
       cut.tip::BIGINT AS slot,
       CAST(COALESCE(b.balance, 0) AS BIGINT) AS balance
FROM watched w CROSS JOIN cut
LEFT JOIN (
  SELECT o.address_name, CAST(sum(o.amount) AS BIGINT) AS balance
  FROM outputs o, cut
  WHERE o.slot <= cut.tip
    AND NOT EXISTS (SELECT 1 FROM inputs i, cut c2
                    WHERE o.tx_hash = i.tx_id AND o.tx_index = i.idx
                      AND i.spend_slot <= c2.tip)
  GROUP BY o.address_name
) b ON w.name = b.address_name
"""
)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "lifecycle_reorg_replay": lifecycle_reorg_replay,
    "lifecycle_reorg_replay_sqltxn": lifecycle_reorg_replay_sqltxn,
    "lifecycle_crash_replay": lifecycle_crash_replay,
}

ORACLES: dict[str, str] = {
    "lifecycle_reorg_replay": LIFECYCLE_REORG_REPLAY_SQL,
    "lifecycle_reorg_replay_sqltxn": LIFECYCLE_REORG_REPLAY_SQL,
    "lifecycle_crash_replay": LIFECYCLE_CRASH_REPLAY_SQL,
}
