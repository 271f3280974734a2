"""Skew operators (salted == plain invariance) and the materialized
ingest table (pruning + flat-view equivalence with the synthesis
definitions)."""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from argus_spark.chain.synth import synth_inputs, synth_outputs
from argus_spark.operators.skew import salted_broadcast_join, salted_group_sum
from argus_spark.plans.checks import formatted_plan, pushed_filters
from argus_spark.sources.ingest import (
    blocks_table,
    first_n_blocks,
    inputs_table,
    outputs_table,
)
from tests.conftest import SF_SMOKE


def _rows(df):
    return sorted(tuple(map(str, r)) for r in df.collect())


class TestSalted:
    def test_salted_group_sum_equals_plain(self, spark):
        e = spark.range(0, 5000).select(
            (F.col("id") % 3).cast("string").alias("k"),
            (F.col("id") * 7 % 101).alias("v"),
        )
        plain = e.groupBy("k").agg(
            F.sum("v").alias("sum_value"), F.count(F.lit(1)).alias("n_rows")
        )
        for n_salts in (1, 4, 32):
            salted = salted_group_sum(e, "k", F.col("v"), n_salts=n_salts)
            assert _rows(salted) == _rows(plain), n_salts

    def test_salted_join_equals_plain(self, spark):
        fact = spark.range(0, 2000).select(
            (F.col("id") % 4).cast("string").alias("k"), F.col("id").alias("v")
        )
        dim = spark.createDataFrame(
            [(str(i), f"tag{i}") for i in range(4)], ["k", "tag"]
        )
        plain = fact.join(dim, "k", "inner").select("k", "v", "tag")
        for n_salts in (1, 3, 8):
            salted = salted_broadcast_join(fact, dim, "k", n_salts=n_salts).select(
                "k", "v", "tag"
            )
            assert _rows(salted) == _rows(plain), n_salts

    def test_salt_deterministic_across_partitionings(self, spark):
        """Round-1 verdict: the salt must hash row CONTENT, not
        monotonically_increasing_id — the same row gets the same salt
        on any partition layout (task retries / different input splits
        re-salt identically, so runs are reproducible)."""
        base = spark.range(0, 1000).select(
            (F.col("id") % 4).cast("string").alias("k"), F.col("id").alias("v")
        )
        salted = base.withColumn(
            "_salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in base.columns]), F.lit(8)),
        )
        a = sorted(
            (r["k"], r["v"], r["_salt"]) for r in salted.collect()
        )
        re = base.repartition(17, "v")
        resalted = re.withColumn(
            "_salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in re.columns]), F.lit(8)),
        )
        b = sorted(
            (r["k"], r["v"], r["_salt"]) for r in resalted.collect()
        )
        assert a == b


class TestConnectedComponents:
    def test_known_components(self, spark):
        from argus_spark.datapipe.dedup import connected_components

        # triangle {1,2,3}, pair {4,5}, long path 10-11-...-20 (exercises
        # pointer jumping), isolated 99 (no edge -> absent from output)
        edges = [(1, 2), (2, 3), (1, 3), (4, 5)] + [
            (i, i + 1) for i in range(10, 20)
        ]
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {
            (r.doc, r.label) for r in connected_components(df).collect()
        }
        want = {(1, 1), (2, 1), (3, 1), (4, 4), (5, 4)} | {
            (i, 10) for i in range(10, 21)
        }
        assert got == want


def _union_find_labels(edges: list[tuple[int, int]]) -> dict[int, int]:
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def test_connected_components_random_graphs(spark):
    """Property: distributed label propagation == sequential union-find
    on random graphs (deterministic seeds; covers chains, cliques,
    forests and singleton-free edge soups)."""
    import random

    from argus_spark.datapipe.dedup import connected_components

    for seed in (1, 7, 42):
        rng = random.Random(seed)
        n = rng.randint(10, 60)
        m = rng.randint(5, 2 * n)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(m)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {(r.doc, r.label) for r in connected_components(df).collect()}
        want = set(_union_find_labels(edges).items())
        assert got == want, (seed, sorted(got - want)[:5], sorted(want - got)[:5])


def test_connected_components_past_gate_distributed_path(spark, monkeypatch):
    """The small-graph fast paths (driver union-find under
    CC_ONE_TASK_MAX_ROWS, broadcast label sides under
    CC_BROADCAST_MAX_ROWS) are row-count gated; every realistic test
    graph sits UNDER the gates, so the corpus-scale branch — shuffle
    joins, multi-partition rounds — would otherwise ship untested.
    Force BOTH gates shut and re-run the union-find equivalence
    property: labels must be bit-identical on either branch."""
    import random

    from argus_spark.datapipe import dedup as dd

    monkeypatch.setattr(dd, "CC_BROADCAST_MAX_ROWS", 0)
    monkeypatch.setattr(dd, "CC_ONE_TASK_MAX_ROWS", 0)
    for seed in (3, 11):
        rng = random.Random(seed)
        n = rng.randint(10, 60)
        m = rng.randint(5, 2 * n)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {(r.doc, r.label) for r in dd.connected_components(df).collect()}
        want = set(_union_find_labels(edges).items())
        assert got == want, (seed, sorted(got - want)[:5], sorted(want - got)[:5])


def test_connected_components_mid_band_broadcast_loop(spark, monkeypatch):
    """The r15 gate split's MIDDLE branch (one-task gate < edges ≤
    broadcast gate: distributed propagate loop with broadcast label
    sides and a width ramp instead of coalesce(1)) — force only the
    one-task gate shut so a small graph takes the mid branch, and
    re-run the union-find equivalence property."""
    import random

    from argus_spark.datapipe import dedup as dd

    monkeypatch.setattr(dd, "CC_ONE_TASK_MAX_ROWS", 0)
    for seed in (5, 23):
        rng = random.Random(seed)
        n = rng.randint(10, 60)
        m = rng.randint(5, 2 * n)
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, ["src", "dst"])
        got = {(r.doc, r.label) for r in dd.connected_components(df).collect()}
        want = set(_union_find_labels(edges).items())
        assert got == want, (seed, sorted(got - want)[:5], sorted(want - got)[:5])


class TestBucketed:
    def test_bucketed_join_has_no_exchange(self, spark, tmp_path):
        """The 100 TB layout contract: two tables bucketed on the join
        key join with zero shuffles; the same join unbucketed shuffles
        both sides."""
        from argus_spark.operators.bucketed import co_located_join, write_bucketed
        from argus_spark.plans.checks import formatted_plan, n_shuffle_exchanges
        from argus_spark.sources.ingest import inputs_table, outputs_table

        out = outputs_table(spark, SF_SMOKE).withColumnRenamed("tx_hash", "k")
        inp = (
            inputs_table(spark, SF_SMOKE)
            .withColumnRenamed("tx_id", "k")
            .withColumnRenamed("idx", "tx_index")
        )
        # disable auto-broadcast: at smoke scale every join broadcasts,
        # hiding the layout effect this test pins down (at 100 TB
        # neither side fits in memory — SMJ is the real plan)
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            unbucketed = out.join(inp, ["k", "tx_index"], "inner")
            assert n_shuffle_exchanges(formatted_plan(unbucketed)) >= 1

            write_bucketed(
                out, "b_outputs", ["k"], 8, path=str(tmp_path / "b_outputs")
            )
            write_bucketed(
                inp, "b_inputs", ["k"], 8, path=str(tmp_path / "b_inputs")
            )
            joined = co_located_join(spark, "b_outputs", "b_inputs", ["k"])
            plan = formatted_plan(joined)
            assert n_shuffle_exchanges(plan) == 0, plan
            # same rows as the unbucketed single-key join
            want = out.join(inp, ["k"], "inner").count()
            assert joined.count() == want
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
            spark.sql("DROP TABLE IF EXISTS b_outputs")
            spark.sql("DROP TABLE IF EXISTS b_inputs")


class TestIngest:
    def test_flat_views_match_synthesis(self, spark):
        """outputs_table/inputs_table (explode of the materialized
        nested table) must be row-identical to the window-based
        synthesis definitions — the ingest contract."""
        got = outputs_table(spark, SF_SMOKE).select(
            "tx_hash", "tx_index", "slot", "address", "address_name", "amount"
        )
        want = synth_outputs(spark, SF_SMOKE).select(
            "tx_hash", "tx_index", "slot", "address", "address_name", "amount"
        )
        assert _rows(got) == _rows(want)

        got_i = inputs_table(spark, SF_SMOKE).select("tx_id", "idx", "spend_slot")
        want_i = synth_inputs(spark, SF_SMOKE).select("tx_id", "idx", "spend_slot")
        assert _rows(got_i) == _rows(want_i)

    def test_slot_filter_pushes_down_to_scan(self, spark):
        """Epoch reads (slot range) must prune at the parquet scan of
        the range-partitioned ingest table — the property that keeps
        per-epoch cost ∝ epoch size, not chain length."""
        b = blocks_table(spark, SF_SMOKE).filter(
            (F.col("slot") >= 10) & (F.col("slot") <= 20)
        )
        plan = formatted_plan(b)
        pushed = pushed_filters(plan)
        assert any("slot" in p for p in pushed), plan

    def test_first_n_blocks_count_and_order(self, spark):
        total = blocks_table(spark, SF_SMOKE).count()
        n = min(50, total)
        f = first_n_blocks(spark, SF_SMOKE, n)
        assert f.count() == n
        # the n smallest slots, exactly
        all_slots = [
            r.slot
            for r in blocks_table(spark, SF_SMOKE)
            .select("slot")
            .orderBy("slot")
            .limit(n)
            .collect()
        ]
        got = sorted(r.slot for r in f.select("slot").collect())
        assert got == sorted(all_slots)
