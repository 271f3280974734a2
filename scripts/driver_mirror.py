"""Mirror of the driver's correctness harness.

Runs every ``queries()`` entry on a FOREIGN SparkSession (stock configs,
no get_spark() tuning — exactly the driver contract) and its DuckDB
oracle at the given SF, compares row count / schema / order-insensitive
pandas value hash, and prints one JSON line per query plus a summary.

Usage: python scripts/driver_mirror.py [sf_dir] [query ...]
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(v):
    if v is None:
        return None
    if isinstance(v, (list, tuple, np.ndarray)):
        # The DRIVER's canonicalizer hashes raw cells and crashes on
        # list-valued ones (TypeError: unhashable type: 'list') — the
        # exact failure mode that kept embedding_quantize_int8 red for
        # two rounds while this mirror's friendlier stringification
        # passed it (r5-verdict item 9). Mirror the driver faithfully:
        # reject, never stringify.
        raise TypeError("unhashable type: 'list'")
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return repr(f)
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if v is pd.NaT:
        return None
    return str(v)


def _is_null(v):
    if isinstance(v, (list, tuple, np.ndarray)):
        return False
    try:
        return bool(pd.isna(v))
    except (TypeError, ValueError):
        return v is None


def canon_rows(pdf):
    return sorted(
        (
            tuple(None if _is_null(v) else _canon(v) for v in row)
            for row in pdf.itertuples(index=False, name=None)
        ),
        key=lambda row: tuple((v is not None, v or "") for v in row),
    )


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    # Foreign session: deliberately NOT get_spark() — stock shuffle
    # partitions, no nanosAsLong, just like the driver's harness.
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("driver_mirror")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()

    # Schema lint runs INLINE, on the main loop's single construction
    # of each query: any top-level container-typed output column is
    # driver-incompatible regardless of values, so the query fails on
    # the lint without executing. (A separate pre-flight pass was not
    # cheap — some constructions run driver-side jobs eagerly
    # (heavy_hitter_tokens: corpus count + freqItems; dedup_semantic:
    # count + seed collect + Lloyd) and the second construction also
    # flushed the first's scoped caches, recomputing the materialized
    # candidate frames the r6 perf work exists to avoid.)
    from pyspark.sql import types as ST

    results = {}
    t_total = time.time()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        rec = {"rows_match": None, "schema_match": None, "hash_match": None,
               "spark_s": None, "oracle_s": None, "err": None}
        try:
            t0 = time.time()
            sdf = fn(spark, sf_dir)
            bad_cols = [
                f"{fld.name}:{fld.dataType.simpleString()}"
                for fld in sdf.schema.fields
                if isinstance(
                    fld.dataType, (ST.ArrayType, ST.MapType, ST.StructType)
                )
            ]
            if bad_cols:
                rec["err"] = (
                    "driver-incompatible output schema (top-level "
                    f"container column): {bad_cols}"
                )
                results[name] = rec
                print(json.dumps({"q": name, "ok": False, **rec}), flush=True)
                continue
            sp_pdf = sdf.toPandas()
            rec["spark_s"] = round(time.time() - t0, 2)
            sql = oracles.get(name)
            if sql is None:
                rec["rows_match"] = len(sp_pdf) >= 0
                rec["note"] = "rows-only (no oracle)"
            else:
                t0 = time.time()
                du_pdf = con.execute(sql).df()
                rec["oracle_s"] = round(time.time() - t0, 2)
                sp_cols = sorted(sp_pdf.columns)
                du_cols = sorted(du_pdf.columns)
                rec["schema_match"] = sp_cols == du_cols
                rec["rows_match"] = len(sp_pdf) == len(du_pdf)
                if rec["schema_match"] and rec["rows_match"]:
                    rec["hash_match"] = (
                        canon_rows(sp_pdf[sp_cols]) == canon_rows(du_pdf[du_cols])
                    )
                rec["spark_rows"] = len(sp_pdf)
                rec["oracle_rows"] = len(du_pdf)
        except Exception as ex:
            rec["err"] = f"{type(ex).__name__}: {ex}"[:500]
        results[name] = rec
        ok = rec["err"] is None and rec.get("hash_match") in (True, None) and rec["rows_match"]
        print(json.dumps({"q": name, "ok": bool(ok), **rec}), flush=True)

    bad = [n for n, r in results.items()
           if r["err"] or r.get("hash_match") is False
           or r.get("schema_match") is False or not r.get("rows_match")]
    print(json.dumps({
        "summary": {"total": len(results), "bad": bad,
                    "wall_s": round(time.time() - t_total, 1)}
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
