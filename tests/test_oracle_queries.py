"""Run every declared query against its DuckDB oracle — the local
mirror of the driver's t2 correctness gate (sf0.01) plus a fast smoke
pass at sf0.001."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from tests.conftest import SF_CORRECT, SF_SMOKE, compare_frames, duck_with_views

ALL_QUERIES = sorted(entrymod.queries().keys())


@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_vs_oracle_smoke(spark, duck, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    df = q(spark, SF_SMOKE)
    if sql is None:
        # rows-only check for non-SQL-expressible ops
        assert df.count() >= 0
        return
    con = duck_with_views(duck, SF_SMOKE)
    rel = con.sql(sql)
    compare_frames(df, rel, name)


@pytest.mark.correctness
@pytest.mark.parametrize("name", ALL_QUERIES)
def test_query_vs_oracle_sf001(spark, duck, name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql().get(name)
    df = q(spark, SF_CORRECT)
    if sql is None:
        assert df.count() >= 0
        return
    con = duck_with_views(duck, SF_CORRECT)
    rel = con.sql(sql)
    compare_frames(df, rel, name)


def test_approx_distinct_error_bound(spark):
    """HLL++ estimate must sit within the contract bound of the exact
    distinct count at both test SFs (VERDICT r2 item 2: the approximate
    aggregate needs a hard, checkable contract)."""
    from argus_spark.operators.temporal import (
        APPROX_DISTINCT_BOUND,
        approx_distinct_users_raw,
    )

    for sf in (SF_SMOKE, SF_CORRECT):
        rows = approx_distinct_users_raw(spark, sf).collect()
        assert rows, sf
        for r in rows:
            rel_err = abs(r.approx_users - r.exact_users) / r.exact_users
            assert rel_err <= APPROX_DISTINCT_BOUND, (
                sf, r.event_type, r.approx_users, r.exact_users, rel_err,
            )


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"address_name", "address", "balance"}


def test_no_top_level_container_output_columns(spark):
    """Driver-compat schema lint (r5-verdict item 9, CI face of the
    mirror's inline lint): the driver's canonicalizer hashes raw cells
    and crashes on container-typed ones — embedding_quantize_int8 was
    red for two rounds because of exactly this. Every oracled query
    must expose scalar-only output columns. Mostly analysis-only, but
    a few constructions run real driver-side jobs eagerly
    (heavy_hitter_tokens, dedup_semantic/kmeans) — cheap at sf0.001,
    which is why this sweep runs at SF_SMOKE."""
    from pyspark.sql import types as ST

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    bad = {}
    for name, fn in qs.items():
        if name not in osql:
            continue  # rows-only queries are never value-hashed
        cols = [
            f"{fld.name}:{fld.dataType.simpleString()}"
            for fld in fn(spark, SF_SMOKE).schema.fields
            if isinstance(fld.dataType, (ST.ArrayType, ST.MapType, ST.StructType))
        ]
        if cols:
            bad[name] = cols
    assert not bad, bad
