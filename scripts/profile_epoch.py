"""Instrument one lifecycle run: per-phase wall time inside _flush and
per-table write time inside store._write_group. Diagnostic only.

Usage: python scripts/profile_epoch.py [b500|depth]
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
    which = sys.argv[1] if len(sys.argv) > 1 else "b500"
    from argus_spark.chain.synth import synth_watched
    from argus_spark.lifecycle import store as store_mod
    from argus_spark.lifecycle.driver import ChainEvent, IndexDriver
    from argus_spark.lifecycle.store import ParquetStateStore
    from argus_spark.reducers.examples import (
        build_chain_registry,
        build_example_registry,
    )
    from argus_spark.session import get_spark
    from argus_spark.sources.ingest import first_n_blocks

    spark = get_spark()

    orig_wg = ParquetStateStore._write_group

    def timed_wg(self, name, df, lo, hi, **kw):
        t0 = time.perf_counter()
        out = orig_wg(self, name, df, lo, hi, **kw)
        print(f"    write[{name}] {time.perf_counter() - t0:.3f}s", flush=True)
        return out

    ParquetStateStore._write_group = timed_wg

    orig_commit = ParquetStateStore.commit

    def timed_commit(self, *a, **kw):
        t0 = time.perf_counter()
        out = orig_commit(self, *a, **kw)
        print(f"  commit total {time.perf_counter() - t0:.3f}s", flush=True)
        return out

    ParquetStateStore.commit = timed_commit

    orig_flush = IndexDriver._flush

    def timed_flush(self, slots):
        t0 = time.perf_counter()
        out = orig_flush(self, slots)
        print(f"epoch({len(slots)} blocks) {time.perf_counter() - t0:.3f}s", flush=True)
        return out

    IndexDriver._flush = timed_flush

    orig_rt = ParquetStateStore.read_table

    def timed_rt(self, spark_, name, min_slot=None, **kw):
        t0 = time.perf_counter()
        out = orig_rt(self, spark_, name, min_slot, **kw)
        dt = time.perf_counter() - t0
        if dt > 0.01:
            print(f"    read_table[{name}] {dt:.3f}s", flush=True)
        return out

    ParquetStateStore.read_table = timed_rt

    td = tempfile.mkdtemp(prefix="argus_prof_")
    try:
        if which == "b500":
            n_lc, batch, reg_fn = 2000, 500, None
        else:
            n_lc, batch, reg_fn = 10000, 10000, lambda: build_chain_registry(3)
        watched = synth_watched(spark, SF_DIR).cache()
        watched.count()
        lc_blocks = first_n_blocks(spark, SF_DIR, n_lc)
        slots = [r.slot for r in lc_blocks.select("slot").orderBy("slot").collect()]
        events = [ChainEvent("roll_forward", block_slot=s) for s in slots]
        # warm run then measured run
        for i in range(2):
            print(f"--- run {i} ---", flush=True)
            store = ParquetStateStore(os.path.join(td, f"store_{i}"))
            reg = reg_fn() if reg_fn else build_example_registry(spark, watched)

            class Tel:
                def record_epoch(self, mid, lo, hi, n, times):
                    print(
                        "  apply:",
                        {k: round(v, 3) for k, v in times.items()},
                        flush=True,
                    )

                def record_event(self, *a):
                    pass

            drv = IndexDriver(
                spark, reg, store, lc_blocks,
                batch_size=batch, max_delay_s=1e9, max_rollback_slots=10**12,
                telemetry=Tel(),
            )
            t0 = time.perf_counter()
            drv.run(list(events))
            print(f"run total {time.perf_counter() - t0:.3f}s", flush=True)
    finally:
        shutil.rmtree(td, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
