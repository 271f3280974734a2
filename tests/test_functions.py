"""Scalar function library tests (B31-B37)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from argus_spark import functions as fx


def test_hex_roundtrip_canonical_case(spark):
    df = spark.createDataFrame([(b"\xab\xcd\xef",)], "b binary").select(
        fx.hex_encode("b").alias("h")
    )
    row = df.select(
        "h",
        fx.hex_decode("h").alias("back"),
        fx.canonical_hex(F.upper("h")).alias("canon"),
    ).collect()[0]
    assert row.h == "abcdef"          # lower is canonical (B31 foot-gun)
    assert bytes(row.back) == b"\xab\xcd\xef"
    assert row.canon == "abcdef"      # mixed case normalizes


def test_display_prefix(spark):
    r = spark.range(1).select(
        fx.display_prefix(F.lit("deadbeefcafe0123"), 8).alias("p")
    ).collect()[0]
    assert r.p == "deadbeef..."


def test_json_points_roundtrip(spark):
    df = spark.createDataFrame(
        [([("h1", 10), ("h2", 20)],)],
        "points array<struct<hash:string,slot:long>>",
    )
    back = df.select(
        fx.from_json_points(fx.to_json_points("points")).alias("p")
    ).collect()[0]
    assert [(p.hash, p.slot) for p in back.p] == [("h1", 10), ("h2", 20)]


def test_stable_hash_is_stable(spark):
    a = spark.range(5).select(fx.stable_hash64("id").alias("h")).collect()
    b = spark.range(5).select(fx.stable_hash64("id").alias("h")).collect()
    assert [r.h for r in a] == [r.h for r in b]
    assert len({r.h for r in a}) == 5


def test_rollback_delete_from_matches_reference_mapping(spark):
    df = spark.createDataFrame(
        [(100, "exclusive"), (100, "inclusive")], "rs long, rt string"
    )
    got = [
        r.d for r in df.select(fx.rollback_delete_from("rs", "rt").alias("d")).collect()
    ]
    # exclusive keeps slot 100 (delete from 101); inclusive deletes it
    assert got == [101, 100]


def test_slot_tip_gap_floors_at_zero(spark):
    df = spark.createDataFrame([(5, 100), (100, 5)], "cur long, tip long")
    got = [r.g for r in df.select(fx.slot_tip_gap("cur", "tip").alias("g")).collect()]
    assert got == [95, 0]


class TestVectorUDFs:
    def test_cosine_udf_matches_fold_within_tolerance(self, spark):
        """The Arrow/numpy fast path agrees with the oracle-exact HOF
        fold to float tolerance (summation order differs by design)."""
        from pyspark.sql import functions as F

        from argus_spark.datapipe.dedup import _as_double, _dot, cosine_prenorm, norm
        from argus_spark.functions.vectors import cosine_scores, norm_udf
        from argus_spark.session import load
        from tests.conftest import SF_SMOKE

        e = load(spark, SF_SMOKE, "embeddings").select(
            "vec_id", _as_double("embedding").alias("v")
        ).limit(100)
        qvec = [float(i % 7 - 3) / 5.0 for i in range(64)]
        qcol = F.array(*[F.lit(x) for x in qvec])
        exact = e.select(
            "vec_id",
            cosine_prenorm(_dot(F.col("v"), qcol), norm(F.col("v")), norm(qcol)).alias("c"),
        )
        fast = e.select("vec_id", cosine_scores(e, "v", qvec).alias("c"))
        ex = {r.vec_id: r.c for r in exact.collect()}
        fa = {r.vec_id: r.c for r in fast.collect()}
        assert ex.keys() == fa.keys()
        assert all(abs(ex[k] - fa[k]) < 1e-9 for k in ex), max(
            abs(ex[k] - fa[k]) for k in ex
        )
        # norms too
        n_exact = {r.vec_id: r.n for r in e.select("vec_id", norm(F.col("v")).alias("n")).collect()}
        n_fast = {r.vec_id: r.n for r in e.select("vec_id", norm_udf(F.col("v")).alias("n")).collect()}
        assert all(abs(n_exact[k] - n_fast[k]) < 1e-9 for k in n_exact)

    def test_cosine_udf_plan_is_map_only(self, spark):
        from argus_spark.datapipe.dedup import _as_double
        from argus_spark.functions.vectors import cosine_scores
        from argus_spark.plans.checks import formatted_plan, n_shuffle_exchanges
        from argus_spark.session import load
        from tests.conftest import SF_SMOKE

        e = load(spark, SF_SMOKE, "embeddings").select(
            "vec_id", _as_double("embedding").alias("v")
        )
        df = e.select("vec_id", cosine_scores(e, "v", [1.0] * 64).alias("c"))
        plan = formatted_plan(df)
        assert "ArrowEvalPython" in plan or "Python" in plan, plan
        assert n_shuffle_exchanges(plan) == 0, plan
