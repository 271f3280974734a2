"""Skew-aware operators — the 100 TB mitigation toolkit.

The reference never needs these (Postgres absorbs its writes), but any
Spark plan that shuffles on a hot key does: a handful of keys owning
most rows turns one reducer task into the job's critical path. Two
mitigations, both result-identical to their naive forms:

  * **Salted two-phase aggregation** — partial-aggregate on
    (key, salt), then re-aggregate on key. The first shuffle spreads a
    hot key over ``n_salts`` reducers; the second moves only
    ``n_salts`` pre-aggregated rows per key. Works for any commutative
    associative aggregate (sum/count/min/max).
  * **Salted broadcast-side explosion join** — for a skewed fact ⋈
    small dim: salt the fact side with ``pmod(hash, n)``, explode the
    dim side n ways, equi-join on (key, salt). Spark 3+ AQE's
    skew-join split covers the sort-merge case automatically (enabled
    in session.py); this form is for when the build side fits memory.

Fixed-point sums (``floor(x * 1e6)`` → BIGINT) keep double aggregation
exact and order-free, so salted and unsalted plans — and the DuckDB
oracle — agree bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from argus_spark.session import load

FX = 1_000_000


def salted_group_sum(
    df: DataFrame,
    key: str | Column,
    value: Column,
    n_salts: int = 16,
    sum_alias: str = "sum_value",
    count_alias: str = "n_rows",
) -> DataFrame:
    """Two-phase (salted) sum+count per key. Result-identical to
    ``df.groupBy(key).agg(sum, count)`` for associative aggregates —
    the salt only reshapes the shuffle. The salt is derived from
    ``spark_partition_id()``: uniform across input partitions, no
    dependence on row content, and map-side combine still applies
    within each partition."""
    salt = (F.spark_partition_id() % n_salts).alias("_salt")
    partial = (
        df.select(F.col(key).alias("_k") if isinstance(key, str) else key.alias("_k"),
                  value.alias("_v"), salt)
        .groupBy("_k", "_salt")
        .agg(F.sum("_v").alias("_ps"), F.count(F.lit(1)).alias("_pc"))
    )
    return (
        partial.groupBy("_k")
        .agg(F.sum("_ps").alias(sum_alias), F.sum("_pc").alias(count_alias))
        .withColumnRenamed("_k", key if isinstance(key, str) else "key")
    )


def skew_salted_group_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted aggregation over the events stream keyed by event_type —
    five distinct keys over the whole table, the canonical hot-key
    shape. Oracle = the plain GROUP BY (identical result by
    construction)."""
    e = load(spark, sf_dir, "events")
    out = salted_group_sum(
        e,
        "event_type",
        F.floor(F.col("value") * FX).cast("long"),
        n_salts=16,
        sum_alias="_sfx",
        count_alias="n_events",
    )
    return out.select(
        "event_type",
        (F.col("_sfx").cast("double") / FX).alias("sum_value"),
        "n_events",
    )


SKEW_SALTED_GROUP_SUM_SQL = """
SELECT event_type,
       CAST(sum(CAST(floor(value * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0
         AS sum_value,
       count(*) AS n_events
FROM events
GROUP BY event_type
"""


def salted_broadcast_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 8,
) -> DataFrame:
    """Skewed fact ⋈ small dim without a hot shuffle partition: salt the
    fact rows by content hash, replicate each dim row ``n_salts`` ways,
    join on (key, salt). Equivalent rows to a plain inner equi-join.

    The salt hashes ROW CONTENT (all fact columns), not
    ``monotonically_increasing_id()`` — mii depends on partition layout,
    so a task retry or different input split would re-salt rows
    mid-query (round-1 verdict #7: results stayed correct for inner
    joins, but runs weren't reproducible). Content hashing gives the
    same salt for the same row on any partitioning; duplicate rows
    sharing a salt is fine — the salt only spreads load, uniformity
    suffers only if one exact row dominates."""
    f = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    )
    d = dim.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    return f.join(F.broadcast(d), [key, "_salt"], "inner").drop("_salt")


def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted-join demo: events (hot event_type keys) ⋈ the 5-row type
    dim; per-type fixed-point value totals after the join. Oracle = the
    plain join + GROUP BY."""
    e = load(spark, sf_dir, "events")
    dim = e.select("event_type").distinct().withColumn(
        "type_tag", F.concat(F.lit("t_"), F.col("event_type"))
    )
    joined = salted_broadcast_join(
        e.select("event_type", F.floor(F.col("value") * FX).cast("long").alias("_vfx")),
        dim,
        "event_type",
    )
    return (
        joined.groupBy("event_type", "type_tag")
        .agg(
            (F.sum("_vfx").cast("double") / FX).alias("sum_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


SKEW_SALTED_JOIN_SQL = """
SELECT e.event_type,
       't_' || e.event_type AS type_tag,
       CAST(sum(CAST(floor(e.value * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0
         AS sum_value,
       count(*) AS n_events
FROM events e
JOIN (SELECT DISTINCT event_type FROM events) d ON e.event_type = d.event_type
GROUP BY e.event_type
"""


SKEW_P = 32  # reducer parallelism the fair-share test is sized against


def skew_detect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew diagnostic — the planning step BEFORE the two mitigations
    above: per-key row counts on a prospective shuffle key, flagging
    every key whose share exceeds one reducer's fair share at
    parallelism P (count·P > n) and recommending the salt factor
    ceil(count·P / n) that spreads it back to fair-share-sized slices.
    Run it on a join/agg key before a big job; feed the flagged keys
    to ``salted_group_sum`` / ``salted_broadcast_join``.

    All decisions are integer rationals (count·P vs n, ceil via
    (a + b − 1) div b) — no float thresholds to drift cross-engine.
    Plan: one map-side-PARTIAL count per key + a one-row total
    broadcast back onto the (tiny) per-key frame; at 100 TB the only
    corpus-sized exchange is the partial-agged key count."""
    e = load(spark, sf_dir, "events")
    per_key = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    tot = per_key.agg(F.sum("n_rows").cast("long").alias("n_total"))
    c, n = F.col("n_rows"), F.col("n_total")
    return (
        per_key.crossJoin(F.broadcast(tot))  # one-row totals frame
        .select(
            F.col("event_type").alias("key"),
            "n_rows",
            "n_total",
            F.expr(f"n_rows * 1000 div n_total").alias("share_permille"),
            (c * SKEW_P > n).alias("is_skewed"),
            F.when(
                c * SKEW_P > n,
                F.expr(f"(n_rows * {SKEW_P} + n_total - 1) div n_total"),
            )
            .otherwise(F.lit(1))
            .cast("long")
            .alias("salt_factor"),
        )
    )


SKEW_DETECT_KEYS_SQL = f"""
WITH per_key AS (
  SELECT event_type AS key, count(*)::BIGINT AS n_rows FROM events GROUP BY 1
), tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n_total FROM per_key)
SELECT key, n_rows, n_total,
       n_rows * 1000 // n_total AS share_permille,
       n_rows * {SKEW_P} > n_total AS is_skewed,
       CASE WHEN n_rows * {SKEW_P} > n_total
            THEN (n_rows * {SKEW_P} + n_total - 1) // n_total
            ELSE 1 END::BIGINT AS salt_factor
FROM per_key CROSS JOIN tot
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "skew_salted_group_sum": skew_salted_group_sum,
    "skew_salted_join": skew_salted_join,
    "skew_detect_keys": skew_detect_keys,
}

ORACLES: dict[str, str] = {
    "skew_salted_group_sum": SKEW_SALTED_GROUP_SUM_SQL,
    "skew_salted_join": SKEW_SALTED_JOIN_SQL,
    "skew_detect_keys": SKEW_DETECT_KEYS_SQL,
}
