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

    CRASH ATOMICITY (r5-verdict item: the former two-append form could
    commit docs/ without bands/, so a replayed doc missed its own band
    index, survived the probe, and duplicated forever): both tables
    now commit through ONE atomic marker, the lifecycle A11 manifest
    pattern (lifecycle/store.py:358). Per epoch:

      1. ``docs/epoch=<id>/``  ← overwrite (idempotent on redo)
      2. ``bands/epoch=<id>/`` ← overwrite
      3. ``_committed_epochs.json`` ← temp-write + ``os.replace`` —
         the single commit point covering BOTH tables.

    Readers (the in-sink probe, ``committed_docs``/``committed_bands``)
    see only manifest-listed epochs, so a crash anywhere before step 3
    leaves torn epoch dirs invisible, and the replayed epoch overwrites
    them cleanly. An epoch already in the manifest is SKIPPED — the
    standard foreachBatch batchId-idempotency contract (Structured
    Streaming re-delivers a failed batch under the same epoch_id with
    the same data). One logical stream owns ``out_dir`` (the lifecycle
    single-writer rule); two queries sharing a state dir would collide
    on epoch ids by construction.

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
        committed = _committed_epochs(out_dir)
        if int(epoch_id) in committed:
            return  # already atomically committed — redo is a no-op
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
        if committed:
            committed_bands = committed_bands_df(spark, out_dir, committed)
            cand = cand.unionByName(
                eb.join(
                    committed_bands.select(
                        F.col("doc_id").alias("keep_id"), "band", "bh"
                    ),
                    ["band", "bh"],
                ).select("keep_id", F.col("doc_id").alias("drop_id"))
            )
            committed_words = committed_docs_df(spark, out_dir, committed).select(
                F.col("doc_id").alias("keep_id"),
                F.array_distinct(words_col()).alias("wa"),
            )
            wa = wa.unionByName(committed_words)
        dropped = _jaccard_ok(cand.distinct(), wa, wb).withColumnRenamed(
            "drop_id", "doc_id"
        )
        kept = d.join(dropped, "doc_id", "left_anti")
        kept.write.mode("overwrite").parquet(
            os.path.join(docs_dir, f"epoch={int(epoch_id)}")
        )
        eb.join(dropped, "doc_id", "left_anti").write.mode("overwrite").parquet(
            os.path.join(bands_dir, f"epoch={int(epoch_id)}")
        )
        _commit_epoch(out_dir, int(epoch_id))  # the atomic commit point

    return sink


# ---------------- manifest (single atomic commit point) ----------------

_MANIFEST = "_committed_epochs.json"


def _committed_epochs(out_dir: str) -> list[int]:
    path = os.path.join(out_dir, _MANIFEST)
    if not os.path.exists(path):
        return []
    import json

    with open(path) as f:
        return [int(e) for e in json.load(f)]


def _commit_epoch(out_dir: str, epoch_id: int) -> None:
    """Append ``epoch_id`` to the manifest via temp-write + rename —
    one atomic op makes the epoch's docs AND bands visible together."""
    import json

    os.makedirs(out_dir, exist_ok=True)
    epochs = sorted(set(_committed_epochs(out_dir)) | {int(epoch_id)})
    path = os.path.join(out_dir, _MANIFEST)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(epochs, f)
    os.replace(tmp, path)


def compact_state(spark: SparkSession, out_dir: str) -> int:
    """Fold all committed epoch dirs into ONE epoch — the operational
    half of the sink's "state is compactable" contract. At 100 TB the
    bands index accretes one small parquet dir per micro-batch
    (thousands per day at tip cadence); probe cost follows file count,
    so periodic compaction is what keeps the band equi-join cheap.

    Same atomicity argument as the sink itself: the merged docs and
    bands land in a FRESH epoch dir (id = max committed + 1 — never
    reused, so no collision with the sink's skip-by-epoch logic), then
    one manifest rename swaps visibility from the old epoch list to
    the single new one. A crash before the rename leaves the old state
    fully intact (the half-written merge dirs are manifest-invisible);
    after it, readers see only the compacted generation. Old epoch
    dirs are GC'd last — a crash mid-GC leaves orphans no reader can
    see, cleaned by the next compaction. Returns the new epoch id."""
    epochs = _committed_epochs(out_dir)
    if len(epochs) <= 1:
        return epochs[0] if epochs else -1
    gen = max(epochs) + 1
    docs = committed_docs_df(spark, out_dir, epochs)
    bands = committed_bands_df(spark, out_dir, epochs)
    docs.write.mode("overwrite").parquet(
        os.path.join(out_dir, "docs", f"epoch={gen}")
    )
    bands.write.mode("overwrite").parquet(
        os.path.join(out_dir, "bands", f"epoch={gen}")
    )
    # the single atomic visibility swap
    import json

    path = os.path.join(out_dir, _MANIFEST)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump([gen], f)
    os.replace(tmp, path)
    # GC old generations (invisible already; best-effort)
    import shutil

    for e in epochs:
        for tbl in ("docs", "bands"):
            shutil.rmtree(
                os.path.join(out_dir, tbl, f"epoch={e}"), ignore_errors=True
            )
    return gen


def committed_docs_df(
    spark: SparkSession, out_dir: str, epochs: list[int] | None = None
) -> DataFrame:
    """The surviving corpus — committed epochs only (torn epoch dirs
    from a crash before the manifest rename are invisible here)."""
    eps = _committed_epochs(out_dir) if epochs is None else epochs
    return spark.read.parquet(
        *[os.path.join(out_dir, "docs", f"epoch={e}") for e in eps]
    )


def committed_bands_df(
    spark: SparkSession, out_dir: str, epochs: list[int] | None = None
) -> DataFrame:
    """The committed banded-MinHash index (same visibility rule)."""
    eps = _committed_epochs(out_dir) if epochs is None else epochs
    return spark.read.parquet(
        *[os.path.join(out_dir, "bands", f"epoch={e}") for e in eps]
    )
