"""StreamingIndexer — Structured Streaming wrapper over IndexDriver.

Maps the reference's steady-state loop (SURVEY §3.1) onto Spark
streaming primitives:

  reference                            Spark
  ---------                            -----
  chain provider push (A1-A3)          file/Kafka source → micro-batch
  bounded channel + triggers (A6,A9)   micro-batch boundary (the trigger)
  graph apply in topo order (A8)       foreachBatch body → IndexDriver.run
  atomic data+ckpt commit (A11)        ParquetStateStore.commit per epoch
  crash → replay from ckpt (A18,B41)   restart query: streaming checkpoint
                                       re-feeds unread files; the driver's
                                       own committed floor skips replayed
                                       blocks (idempotent at-least-once)

Two checkpoint layers cooperate, exactly as in the reference (which
also has two: the node's intersection points AND the DB checkpoint):
Spark's streaming checkpoint tracks *source progress* (files read);
the store's ``reducer_states`` tracks *semantic progress* (slots
committed per reducer). A crash between them is safe in both
directions — unread files replay, replayed blocks are skipped.

TIP-MODE OVERHEAD, profiled (scripts/profile_tip.py, r7): on the
bench workload (2,000 blocks, batch 500; tip = maxFilesPerTrigger=1 →
5 triggers, catch-up = one availableNow trigger), in-foreachBatch time
is mode-INDEPENDENT (driver 4.4-5.2s both modes — same epochs either
way) and the only structural difference is the streaming engine's
fixed per-trigger cost: 0.27s for 1 trigger vs 0.78s for 5 → ~130-160
ms marginal per trigger, spent in offset-WAL + commit-log writes,
file-source listing, micro-batch planning, and the control-plane
collect job's scheduling. That is Structured Streaming's irreducible
foreachBatch machinery (a sort job per trigger was already cut,
r6 fe55cc7; the collect itself measures 26ms/trigger). bench.py's
historical tip/catch-up gap (~1.26x) is this fixed cost on top of
driver-time noise between runs — in the clean profiled run tip's wall
BEAT catch-up (5.29s vs 5.57s). At a real chain tip (one block every
~20s) a 150ms trigger cost is 0.75% duty cycle — not a bottleneck at
any deployment scale.

Events are control-plane rows (a few per block, no payload); collecting
one micro-batch of them to the driver is the bounded-inbox analogue
(A6), not a data-path collect. Block payloads flow only through
DataFrame transforms inside the reducers.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from argus_spark.lifecycle.dag import ReducerRegistry
from argus_spark.lifecycle.driver import ChainEvent, DriverStats, IndexDriver
from argus_spark.lifecycle.store import ParquetStateStore
from argus_spark.sources.chain_feed import read_feed_stream


@dataclass
class StreamingStats:
    micro_batches: int = 0
    events: int = 0
    driver: DriverStats = field(default_factory=DriverStats)


class StreamingIndexer:
    """Run a reducer DAG over a streaming chain-event feed.

    One ``IndexDriver`` instance persists across micro-batches of a
    run (in-memory checkpoint windows stay warm); a restarted process
    reloads committed state from the store — SURVEY §3.3.
    """

    def __init__(
        self,
        spark: SparkSession,
        registry: ReducerRegistry,
        store: ParquetStateStore,
        blocks_df: DataFrame,
        feed_dir: str,
        checkpoint_dir: str,
        batch_size: int = 500,
        max_files_per_trigger: int | None = None,
        window_k: int | None = None,
    ) -> None:
        self.spark = spark
        self.feed_dir = feed_dir
        self.checkpoint_dir = checkpoint_dir
        self.max_files_per_trigger = max_files_per_trigger
        kwargs = {"batch_size": batch_size, "max_delay_s": float("inf")}
        if window_k is not None:
            kwargs["window_k"] = window_k
        self.driver = IndexDriver(spark, registry, store, blocks_df, **kwargs)
        self.stats = StreamingStats()

    @classmethod
    def from_config(
        cls,
        spark: SparkSession,
        registry: ReducerRegistry,
        store: ParquetStateStore,
        blocks_df: DataFrame,
        feed_dir: str,
        checkpoint_dir: str,
        cfg,
    ) -> "StreamingIndexer":
        """Construct from an appsettings-shaped ``IndexerConfig``
        (lifecycle/config.py): ``Sync:Commit:BatchSize`` → driver epoch
        size, ``CardanoNodeConnection:RollbackBuffer`` → checkpoint
        window, ``Sync:Pipeline:ChannelCapacity`` → files per trigger
        (the bounded-inbox capacity, A6 — the reference suspends the
        producer at this depth; the file source simply never requests
        more). Pair with ``run_available_now`` when
        ``cfg.exit_on_completion`` (the reference's
        ``Sync:Worker:ExitOnCompletion``) else ``run_continuous``."""
        return cls(
            spark, registry, store, blocks_df, feed_dir, checkpoint_dir,
            batch_size=cfg.batch_size,
            max_files_per_trigger=cfg.channel_capacity,
            window_k=cfg.window_k,
        )

    def run_from_config(self, cfg):
        """Dispatch on the reference's ExitOnCompletion flag: bounded
        drain (availableNow) vs follow-the-tip (processingTime). The
        continuous trigger interval is ``Sync:Commit:MaxDelayMs`` — the
        reference's commit max-delay IS its batching trigger (A9), the
        exact semantic of Spark's processingTime; the dashboard refresh
        key controls only telemetry cadence (Dashboard.cs), never
        pipeline batching."""
        if cfg.exit_on_completion:
            return self.run_available_now()
        trigger_ms = max(1, int(round(cfg.max_delay_s * 1000)))
        return self.run_continuous(
            processing_time=f"{trigger_ms} milliseconds"
        )

    # foreachBatch body — one micro-batch of chain events
    def _process_batch(self, batch_df: DataFrame, epoch_id: int) -> None:
        # Control-plane rows only (a few per block, no payload). Sort
        # driver-side: a distributed orderBy on a tiny frame costs an
        # extra range-partition SAMPLING job per trigger — pure fixed
        # per-trigger overhead in tip-following mode, where the
        # per-trigger cost IS the throughput gap vs catch-up.
        rows = sorted(batch_df.collect(), key=lambda r: r["seq"])
        if not rows:
            return
        events = [ChainEvent.from_row(r) for r in rows]
        self.driver.run(events)  # flushes (drain trigger) before returning
        self.stats.micro_batches += 1
        self.stats.events += len(rows)
        self.stats.driver = self.driver.stats

    def run_available_now(self) -> StreamingStats:
        """Process everything currently in the feed, then stop — the
        reference's bounded live-smoke mode (A22). Restartable: the
        streaming checkpoint skips already-read files."""
        stream = read_feed_stream(
            self.spark, self.feed_dir, self.max_files_per_trigger
        )
        q = (
            stream.writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return self.stats

    def run_continuous(self, processing_time: str = "1 seconds"):
        """Follow-the-tip mode (A9 max-delay trigger ≈ processingTime).
        Returns the live StreamingQuery; caller owns stop()."""
        stream = read_feed_stream(
            self.spark, self.feed_dir, self.max_files_per_trigger
        )
        return (
            stream.writeStream.foreachBatch(self._process_batch)
            .option("checkpointLocation", self.checkpoint_dir)
            .trigger(processingTime=processing_time)
            .start()
        )
