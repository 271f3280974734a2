"""One-call indexer assembly from an appsettings-shaped config — the
rebuild's equivalent of the reference's DI composition + hosted worker
(``services.AddCardanoIndexer(configuration)`` +
``AddReducers(configuration)`` + the `CardanoIndexWorker` BackgroundService
loop, src/Argus.Sync/Extensions/ServiceCollectionExtensions.cs and
Workers/CardanoIndexWorker.cs): a user brings their ``appsettings.json``
and a reducer registry, and one call wires transport, single-instance
lock, allow-list, startup rewind, and the streaming loop together with
the same config keys driving the same decisions.

Composition (each seam individually proven by the provider/config/
streaming e2e tests; this module just assembles them in the reference's
order):

  1. ``cfg.apply_allowlist(registry)``   — CardanoIndexReducers (A20)
  2. ``cfg.make_lock(store.root)``       — Sync:SingleInstanceLock (A19);
     acquisition parks like WaitForAcquisitionAsync
  3. ``cfg.make_provider()``             — CardanoNodeConnection (A1-A3)
  4. :class:`ProviderFeedPump.drain`     — transport → feed segments,
     resuming from the pump's persisted seq (A14)
  5. startup rewind                      — Sync:Rollback one-shot mode
     (A17), hash-validated against the committed window
  6. ``StreamingIndexer.run_from_config`` — ExitOnCompletion dispatch:
     availableNow drain vs follow-the-tip processingTime (A9)

Crash-safety across the seams is the same at-least-once story as the
batch path: pump state persists after segment publish, the streaming
checkpoint tracks files, the driver's committed floor skips replayed
blocks (B41).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from argus_spark.lifecycle.config import IndexerConfig
from argus_spark.lifecycle.dag import ReducerRegistry
from argus_spark.lifecycle.lock import LeaseKeeper, SingleInstanceLock
from argus_spark.lifecycle.store import ParquetStateStore
from argus_spark.sources.providers import ProviderFeedPump
from argus_spark.streaming.indexer import StreamingIndexer


@dataclass
class RunReport:
    pumped_events: int
    rewound: bool
    # drain mode (ExitOnCompletion): the finished StreamingStats.
    # follow-the-tip mode: the live StreamingQuery — caller stops it,
    # then calls ``release()``.
    stats: Any
    indexer: StreamingIndexer
    lock: SingleInstanceLock | None = None
    keeper: LeaseKeeper | None = None

    def lock_lost(self) -> bool:
        """True if the lease was ever lost mid-run (the renewal loop's
        latched flag — the reference stops the host on this)."""
        return self.keeper is not None and self.keeper.lost

    def release(self) -> None:
        """Release the single-instance lock (follow-the-tip mode hands
        lock ownership to the caller; drain mode already released)."""
        if self.keeper is not None:
            self.keeper.stop()
            self.keeper = None
        if self.lock is not None:
            self.lock.release()
            self.lock = None


def run_indexer_from_config(
    spark: SparkSession,
    cfg: IndexerConfig,
    registry: ReducerRegistry,
    store: ParquetStateStore,
    blocks_df: DataFrame,
    feed_dir: str,
    checkpoint_dir: str,
    lock_timeout_s: float | None = None,
    provider=None,
) -> RunReport:
    """Assemble and run the indexer exactly as the config says.

    ``provider`` overrides ``cfg.make_provider()`` for tests/embedded
    feeds; everything else comes from the config. With
    ``ExitOnCompletion`` this drains the transport, releases the lock,
    and returns finished stats; in follow-the-tip mode the report
    carries the live StreamingQuery AND the still-held lock — the
    caller stops the query, then ``report.release()`` (the lock must
    outlive the query: releasing it while the loop still writes would
    let a second instance run concurrently, the exact corruption the
    reference's lock exists to prevent).

    Raises ``TimeoutError`` when another live instance holds the lock
    past ``lock_timeout_s`` — the reference parks forever by default
    (lock_timeout_s=None), surfacing the wait in logs."""
    registry = cfg.apply_allowlist(registry)
    lock: SingleInstanceLock | None = cfg.make_lock(store.root)
    if lock is not None and not lock.wait_for_acquisition(
        timeout_s=lock_timeout_s
    ):
        raise TimeoutError(
            f"another indexer instance holds the lock at {store.root}"
        )
    # Renew while we run (RenewSeconds cadence): a drain longer than
    # LeaseSeconds must not let the lease lapse mid-write — an expired
    # lease is stealable and a second instance could start. On loss the
    # keeper latches `lost`; drain mode raises LockLostError after the
    # run, tip mode exposes it via report.lock_lost() (the reference
    # stops the whole host, CardanoIndexWorker.cs:81-84).
    keeper = LeaseKeeper(lock) if lock is not None else None
    if keeper is not None:
        keeper.__enter__()
    try:
        pump = ProviderFeedPump(
            provider if provider is not None else cfg.make_provider(),
            feed_dir,
        )
        pumped = pump.drain()
        indexer = StreamingIndexer.from_config(
            spark, registry, store, blocks_df, feed_dir, checkpoint_dir, cfg
        )
        rewound = cfg.apply_startup_rewind(indexer.driver)
        result = indexer.run_from_config(cfg)
    except BaseException:
        if keeper is not None:
            keeper.stop()
        if lock is not None:
            lock.release()
        raise
    if cfg.exit_on_completion:
        lost = keeper.lost if keeper is not None else False
        if keeper is not None:
            keeper.stop()
        if lock is not None:
            lock.release()
        if lost:
            from argus_spark.lifecycle.lock import LockLostError

            raise LockLostError(
                f"single-instance lease at {store.root} was lost during "
                "the run — results may race a second instance"
            )
        return RunReport(pumped, rewound, result, indexer)
    return RunReport(pumped, rewound, result, indexer, lock=lock, keeper=keeper)
