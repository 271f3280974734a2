"""Fast-iteration harness for the two lifecycle bench points the judge
grades (BENCH_r{N} vs BASELINE.md): batch-500 throughput and depth-3
retention. Mirrors bench.py's lc_run exactly, but runs only the
lifecycle section so a change can be timed in ~1 min instead of a full
bench pass.

Usage: python scripts/bench_lifecycle.py [b500|depth|all]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    from argus_spark.chain.synth import synth_watched
    from argus_spark.lifecycle.driver import ChainEvent, IndexDriver
    from argus_spark.lifecycle.store import ParquetStateStore
    from argus_spark.reducers.examples import (
        build_chain_registry,
        build_example_registry,
    )
    from argus_spark.session import get_spark
    from argus_spark.sources.ingest import first_n_blocks

    spark = get_spark()
    td = tempfile.mkdtemp(prefix="argus_benchlc_")
    out: dict[str, float] = {}
    try:
        watched = synth_watched(spark, SF_DIR).cache()
        watched.count()

        def lc_run(n_lc: int, batch: int, tag: str, registry_fn=None) -> float:
            lc_blocks = first_n_blocks(spark, SF_DIR, n_lc)
            slots = [
                r.slot for r in lc_blocks.select("slot").orderBy("slot").collect()
            ]
            events = [ChainEvent("roll_forward", block_slot=s) for s in slots]
            wall = float("inf")
            for i in range(2):
                store = ParquetStateStore(os.path.join(td, f"store_{tag}_{i}"))
                reg = (
                    registry_fn()
                    if registry_fn
                    else build_example_registry(spark, watched)
                )
                drv = IndexDriver(
                    spark, reg, store, lc_blocks,
                    batch_size=batch, max_delay_s=1e9, max_rollback_slots=10**12,
                )
                t0 = time.perf_counter()
                drv.run(list(events))
                wall = min(wall, time.perf_counter() - t0)
            return round(n_lc / wall, 1)

        if which in ("b500", "all"):
            out["blocks_per_sec_lifecycle_batch500"] = lc_run(2000, 500, "b500")
        if which in ("depth", "all"):
            d1 = lc_run(10000, 10000, "d1", lambda: build_chain_registry(1))
            d3 = lc_run(10000, 10000, "d3", lambda: build_chain_registry(3))
            out["blocks_per_sec_depth1_chain"] = d1
            out["blocks_per_sec_depth3_chain"] = d3
            out["depth3_retention"] = round(d3 / d1, 3) if d1 else 0.0
        watched.unpersist()
    finally:
        shutil.rmtree(td, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
