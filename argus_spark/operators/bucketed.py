"""Bucketed (co-located) tables — the shuffle-elimination strategy for
the hot spend join at warehouse scale.

The §2.C pipeline's one unavoidable big-big join is
``outputs ⋈ inputs ON (tx_hash, tx_index)`` (B14/B15). At 100 TB both
sides re-shuffle on every run unless their storage layout already
agrees with the join key. Spark's answer is bucketing: write both
tables ``bucketBy(N, keys)``; each side's files are hash-partitioned
on disk, the reader reports the partitioning to Catalyst, and the join
plans with **zero Exchange** operators — the same join the reference
delegates to Postgres's secondary indexes (TestDbContext.cs:35-37),
re-expressed as a layout contract.

Guidance encoded here:
  * bucket count is a layout constant — both sides MUST agree (a
    mismatch re-shuffles the smaller side).
  * ``sortBy`` the bucket key so the join is a zip of sorted runs
    (no in-task sort).
  * at 100 TB pick N so a bucket ≈ 100-500 MB per file-group;
    compaction rewrites keep bucket identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    n_buckets: int = 16,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed+sorted managed table. Reads via
    ``spark.table(table)`` carry the bucket layout into planning."""
    w = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(n_buckets, *keys)
        .sortBy(*keys)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def co_located_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    keys: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket keys.
    With agreeing layouts Catalyst plans a sort-merge join with no
    Exchange on either side — verified by
    tests/test_skew_ingest.py::TestBucketed."""
    return spark.table(left_table).join(spark.table(right_table), keys, how)
