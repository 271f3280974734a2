"""Attribute the streaming TIP-mode throughput gap (bench: tip ~432
vs catch-up ~545 blk/s, a stable ~1.26x) to its components — r6-verdict
item 6: "tip gap ≤ 1.15x or a committed profile attributing the
remainder to irreducible foreachBatch machinery".

Same workload as bench.py's stream_run (2,000 blocks, batch_size=500,
one mid-stream rollback): catch-up = one availableNow trigger draining
the whole feed (4 internal epochs), tip = maxFilesPerTrigger=1 (5
triggers of 500 events). Per-trigger work inside foreachBatch is
IDENTICAL in both modes (same 4-5 driver epochs total); the gap is
pure per-trigger streaming machinery.

Instruments:
  * collect_s  — the control-plane batch_df.collect() job
  * driver_s   — IndexDriver.run (reducer DAG + atomic commit)
  * engine_s   — total wall minus all foreachBatch time: Spark's
                 streaming engine (file-source listing, offset WAL +
                 commit-log writes, trigger planning/scheduling)

Usage: python scripts/profile_tip.py
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from argus_spark.chain.synth import synth_chain_events, synth_watched
    from argus_spark.lifecycle.store import ParquetStateStore
    from argus_spark.reducers.examples import build_example_registry
    from argus_spark.session import get_spark
    from argus_spark.sources.chain_feed import write_feed_file
    from argus_spark.sources.ingest import first_n_blocks, ingest_blocks
    from argus_spark.streaming.indexer import StreamingIndexer

    spark = get_spark("argus_profile_tip")
    ingest_blocks(spark, SF_DIR)

    n_stream = 2000
    s_blocks = first_n_blocks(spark, SF_DIR, n_stream)
    s_slots = [r.slot for r in s_blocks.select("slot").orderBy("slot").collect()]
    ev_rows = [
        r.asDict()
        for r in synth_chain_events(
            spark, SF_DIR,
            rollbacks=[(1200, s_slots[1100], "exclusive")],
            limit=n_stream,
        ).orderBy("seq").collect()
    ]
    watched = synth_watched(spark, SF_DIR).cache()
    watched.count()

    td = tempfile.mkdtemp(prefix="argus_tipprof_")
    try:
        for mode, mfpt in (("catchup", None), ("tip", 1)):
            for i in range(2):  # run 0 warms
                feed = os.path.join(td, f"feed_{mode}_{i}")
                for fi in range(0, len(ev_rows), 500):
                    write_feed_file(feed, fi // 500, ev_rows[fi : fi + 500])
                store = ParquetStateStore(os.path.join(td, f"st_{mode}_{i}"))
                si = StreamingIndexer(
                    spark, build_example_registry(spark, watched), store,
                    s_blocks, feed, os.path.join(td, f"ck_{mode}_{i}"),
                    batch_size=500, max_files_per_trigger=mfpt,
                )
                prof = {"collect_s": 0.0, "driver_s": 0.0, "batches": 0}
                orig = si._process_batch

                def process(batch_df, epoch_id, _si=si, _prof=prof):
                    t0 = time.perf_counter()
                    rows = sorted(batch_df.collect(), key=lambda r: r["seq"])
                    t1 = time.perf_counter()
                    _prof["collect_s"] += t1 - t0
                    if not rows:
                        return
                    from argus_spark.lifecycle.driver import ChainEvent

                    events = [ChainEvent.from_row(r) for r in rows]
                    _si.driver.run(events)
                    _prof["driver_s"] += time.perf_counter() - t1
                    _prof["batches"] += 1

                si._process_batch = process
                t0 = time.perf_counter()
                si.run_available_now()
                wall = time.perf_counter() - t0
                if i == 0:
                    continue
                inside = prof["collect_s"] + prof["driver_s"]
                engine = wall - inside
                print(
                    f"{mode:8} wall {wall:6.2f}s  blk/s {n_stream/wall:7.1f}  "
                    f"batches {prof['batches']}  "
                    f"collect {prof['collect_s']:5.2f}s  "
                    f"driver {prof['driver_s']:5.2f}s  "
                    f"engine {engine:5.2f}s"
                    f"  (engine/trigger {engine/max(1,prof['batches'])*1000:6.0f}ms)",
                    flush=True,
                )
        watched.unpersist()
    finally:
        shutil.rmtree(td, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
