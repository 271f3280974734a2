"""Shared fixtures: one local SparkSession per test run, and a DuckDB
oracle-compare harness mirroring the driver's correctness gate
(row-count + schema-width + order-insensitive value hash)."""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
SF_SMOKE = os.path.join(TESTDATA, "sf0.001")
SF_CORRECT = os.path.join(TESTDATA, "sf0.01")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session")
def spark():
    from argus_spark.session import get_spark

    s = get_spark("argus_spark_tests", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    yield con
    con.close()


def duck_with_views(con: duckdb.DuckDBPyConnection, sf_dir: str):
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(v):
    """Canonicalize a cell for order-insensitive comparison.

    Cells come from PANDAS frames (numpy scalars), not fetchall() Python
    objects — this is deliberate: the driver's correctness gate hashes
    pandas dataframes, where e.g. DuckDB HUGEINT (un-CAST sum(BIGINT))
    degrades to float64 and hashes differently from Spark's int64. A
    str()-over-fetchall mirror masked exactly that class in round 1
    (VERDICT.md finding #2); hashing what the driver hashes means that
    drift fails locally first."""
    import numpy as np

    if v is None:
        return None
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(str(_canon(x)) for x in v) + "]"
    if isinstance(v, (bytes, bytearray)):
        return bytes(v).hex()
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        # collapse -0.0 vs 0.0 and tiny representation noise
        return repr(f)
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    try:
        import pandas as pd

        if v is pd.NaT:
            return None
    except Exception:
        pass
    return str(v)


def _is_null(v):
    """Pandas-aware null check for scalar cells (arrays are never null
    here — Spark/DuckDB return them as list/ndarray)."""
    import numpy as np

    if isinstance(v, (list, tuple, np.ndarray)):
        return False
    import pandas as pd

    try:
        return bool(pd.isna(v))
    except (TypeError, ValueError):
        return v is None


def compare_frames(spark_df, duck_rel, name: str, float_tol: float | None = None):
    """Driver-style compare: row count, column names, sorted-value
    equality. Columns sorted by name (the driver sorts before hashing),
    rows sorted by their full canonical tuple. Both sides are fetched as
    PANDAS frames to reproduce the driver's type coercions (see _canon)."""
    sp_cols = sorted(spark_df.columns)
    du_cols_raw = [c[0] for c in duck_rel.description]
    du_cols = sorted(du_cols_raw)
    assert sp_cols == du_cols, f"{name}: columns {sp_cols} != {du_cols}"

    sp_pdf = spark_df.toPandas()[sp_cols]
    du_pdf = duck_rel.df()[du_cols]
    sp_rows = [
        tuple(None if _is_null(v) else _canon(v) for v in row)
        for row in sp_pdf.itertuples(index=False, name=None)
    ]
    du_rows = [
        tuple(None if _is_null(v) else _canon(v) for v in row)
        for row in du_pdf.itertuples(index=False, name=None)
    ]
    assert len(sp_rows) == len(du_rows), (
        f"{name}: row count {len(sp_rows)} != {len(du_rows)}"
    )
    key = lambda row: tuple((v is not None, v or "") for v in row)  # noqa: E731
    sp_rows.sort(key=key)
    du_rows.sort(key=key)
    mismatches = [
        (a, b) for a, b in zip(sp_rows, du_rows) if a != b
    ]
    assert not mismatches, (
        f"{name}: {len(mismatches)} mismatched rows; first 3: {mismatches[:3]}"
    )
