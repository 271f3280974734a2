"""Streaming deduplication — the stream-native face of the datapipe
dedup family (datapipe/dedup.py is the batch form).

Two complementary operators:

  * ``first_wins_dedup_sink`` — incremental exact dedup with UNBOUNDED
    lookback: a ``foreachBatch`` sink that anti-joins each micro-batch
    against the keys already committed to the output table, so the
    first occurrence of a key ever seen wins and replays are idempotent
    (at-least-once source ⇒ exactly-once effect, the lifecycle A11
    argument applied to dedup). State lives in the *output table* —
    queryable, compactable, and unbounded-window-correct, where Spark's
    own ``dropDuplicates`` on a stream would grow executor state store
    forever.
  * ``dedup_within_watermark`` — bounded-lookback form using Spark's
    ``dropDuplicatesWithinWatermark``: duplicates only arrive within a
    known lateness horizon, so state is bounded and evicted by the
    watermark. The right tool when the dup window is bounded (e.g. a
    crawler re-emitting within hours), wrong when it isn't.

Scale: the anti-join's sink-side scan prunes to the key columns
(parquet column pruning), and at 100 TB the output table should be
bucketed by the key so the anti-join is co-located (operators/
bucketed.py pattern); the micro-batch side is small by construction.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def first_wins_dedup_sink(
    spark: SparkSession,
    out_dir: str,
    key_cols: list[str],
):
    """Build a ``foreachBatch`` function that appends only
    never-seen-before keys to ``out_dir`` (parquet). Within a batch,
    ties collapse via dropDuplicates; across batches and across
    replays, the committed table is the authority."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        fresh = batch_df.dropDuplicates(key_cols)
        if os.path.isdir(out_dir) and any(
            f.endswith(".parquet") for f in os.listdir(out_dir)
        ):
            seen = spark.read.parquet(out_dir).select(*key_cols)
            fresh = fresh.join(seen, key_cols, "left_anti")
        fresh.write.mode("append").parquet(out_dir)

    return sink


def dedup_within_watermark(
    stream: DataFrame,
    key_cols: list[str],
    ts_col: str,
    lateness: str,
) -> DataFrame:
    """Bounded-state streaming dedup: drop rows whose key was already
    seen within the watermark horizon; state for a key is evicted once
    the watermark passes it."""
    return stream.withWatermark(ts_col, lateness).dropDuplicatesWithinWatermark(
        key_cols
    )
