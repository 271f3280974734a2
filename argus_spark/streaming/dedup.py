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


def minhash_dedup_sink(
    spark: SparkSession,
    out_dir: str,
    tau: float = 0.9,
):
    """Incremental NEAR-dup dedup with unbounded lookback — the
    streaming face of the batch MinHash-LSH → verify → keep pipeline
    (datapipe/dedup.py): a ``foreachBatch`` sink whose state is two
    queryable parquet tables under ``out_dir``:

      * ``docs/``  — surviving documents (doc_id, text);
      * ``bands/`` — their banded MinHash index (doc_id, band, bh).

    Per micro-batch: signatures + bands are map-only (the shared
    ``_minhash_sig_df``/``_minhash_bands_df`` kernels); candidates =
    band equi-join WITHIN the batch (smaller doc_id dominates) plus
    batch-vs-committed band probe (committed survivors always
    dominate); every candidate is VERIFIED by exact word-set Jaccard
    ≥ ``tau`` before it drops anything — LSH alone never discards a
    document. Survivors and their bands append.

    Semantics contract: a doc is dropped iff a verified near-dup with
    higher priority exists, priority = committed-before > smaller
    doc_id (the same dominance rule — not greedy-kept-set —
    documented for ``dedup_semantic``; they differ only on chains
    where the dominator was itself dropped). Replay-idempotent the
    same way ``first_wins_dedup_sink`` is: re-delivered docs collide
    with their own committed copy at J = 1.

    100 TB shape: the probe is an equi-join against the bands table
    (bucket it by ``bh`` at deployment); verify joins only the slim
    candidate pairs back to text. The bands table is the only state —
    no executor state store, so state is compactable, queryable, and
    survives any restart."""
    import pyspark.sql.functions as F

    from argus_spark.datapipe.dedup import (
        _minhash_bands_df,
        _minhash_sig_df,
    )
    from argus_spark.datapipe.hashing import words_col

    docs_dir = os.path.join(out_dir, "docs")
    bands_dir = os.path.join(out_dir, "bands")

    def _has_data(d: str) -> bool:
        return os.path.isdir(d) and any(
            f.endswith(".parquet") for f in os.listdir(d)
        )

    def _jaccard_ok(cand: DataFrame, wa: DataFrame, wb: DataFrame) -> DataFrame:
        """cand(keep_id, drop_id) → verified drops (exact J ≥ tau)."""
        i = F.size(F.array_intersect("wa", "wb"))
        return (
            cand.join(wa, "keep_id")
            .join(wb, "drop_id")
            .withColumn("i", i)
            .filter(
                F.col("i").cast("double")
                / (F.size("wa") + F.size("wb") - F.col("i")).cast("double")
                >= tau
            )
            .select("drop_id")
            .distinct()
        )

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        d = batch_df.select("doc_id", "text").dropDuplicates(["doc_id"])
        words = d.select(
            "doc_id", F.array_distinct(words_col()).alias("w")
        )
        eb = _minhash_bands_df(_minhash_sig_df(d))
        wa = words.select(F.col("doc_id").alias("keep_id"), F.col("w").alias("wa"))
        wb = words.select(F.col("doc_id").alias("drop_id"), F.col("w").alias("wb"))

        # within-batch dominance candidates (smaller doc_id wins)
        a, x = eb.alias("a"), eb.alias("x")
        cand = (
            a.join(x, ["band", "bh"])
            .filter(F.col("a.doc_id") < F.col("x.doc_id"))
            .select(
                F.col("a.doc_id").alias("keep_id"),
                F.col("x.doc_id").alias("drop_id"),
            )
        )
        if _has_data(bands_dir):
            committed_bands = spark.read.parquet(bands_dir)
            cand = cand.unionByName(
                eb.join(
                    committed_bands.select(
                        F.col("doc_id").alias("keep_id"), "band", "bh"
                    ),
                    ["band", "bh"],
                ).select("keep_id", F.col("doc_id").alias("drop_id"))
            )
            committed_words = spark.read.parquet(docs_dir).select(
                F.col("doc_id").alias("keep_id"),
                F.array_distinct(words_col()).alias("wa"),
            )
            wa = wa.unionByName(committed_words)
        dropped = _jaccard_ok(cand.distinct(), wa, wb).withColumnRenamed(
            "drop_id", "doc_id"
        )
        kept = d.join(dropped, "doc_id", "left_anti")
        kept.write.mode("append").parquet(docs_dir)
        eb.join(dropped, "doc_id", "left_anti").write.mode("append").parquet(
            bands_dir
        )

    return sink
