#!/usr/bin/env python
"""Standalone bench-protocol re-measure for a named query subset.

Same protocol as bench.py's sweep (2 untimed warm runs + median-of-3
timed noop-sink runs per query, scoped caches reused across same-query
repeats, flushed between queries) WITHOUT touching bench_full.json —
for optimization-round before/after evidence on a quiet host.

Usage: python scripts/bench_subset.py q1 q2 ... [--sf DIR]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as e
    from argus_spark.datapipe.scoped_cache import flush_scoped
    from argus_spark.session import get_spark
    from argus_spark.sources.ingest import ingest_blocks

    spark = get_spark("argus_spark_bench_subset")
    qs = e.queries()
    ingest_blocks(spark, "/root/testdata/sf0.001")
    ingest_blocks(spark, sf_dir)

    def _run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    out = {}
    for n in args:
        spark.sparkContext.setJobDescription(f"warmup:{n}")
        try:
            _run(qs[n](spark, "/root/testdata/sf0.001"))
        except Exception as ex:  # warm failures surface in timed runs
            print(f"warm {n}: {ex}", file=sys.stderr)
        runs = []
        for i in range(5):
            spark.sparkContext.setJobDescription(f"{n}:{i}")
            t0 = time.perf_counter()
            _run(qs[n](spark, sf_dir))
            dt = time.perf_counter() - t0
            if i >= 2:
                runs.append(dt)
        runs.sort()
        out[n] = {"median": round(runs[1], 3), "min": round(runs[0], 3)}
        flush_scoped()
        print(n, out[n], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
