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
        # replay guard consults ONLY stream-committed batch ids — never
        # compaction generations, which live in a disjoint namespace
        if int(epoch_id) in _committed_epochs(out_dir):
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
        if _has_state(out_dir):
            committed_bands = committed_bands_df(spark, out_dir)
            cand = cand.unionByName(
                eb.join(
                    committed_bands.select(
                        F.col("doc_id").alias("keep_id"), "band", "bh"
                    ),
                    ["band", "bh"],
                ).select("keep_id", F.col("doc_id").alias("drop_id"))
            )
            committed_words = committed_docs_df(spark, out_dir).select(
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
#
# Two DISJOINT id namespaces, because they have different owners:
#   * stream_epochs — foreachBatch batch ids, assigned by Structured
#     Streaming; the sink's replay guard consults ONLY this list.
#   * generations   — compaction outputs, assigned by compact_state,
#     stored in dirs named ``gen=<n>``. They can NEVER collide with a
#     future batch id (the former single-list design set the compacted
#     id to max(epoch)+1 — exactly the stream's next batch id — so the
#     replay guard silently dropped that real batch's data).
# Readers see the union of both; the skip check sees only the first.

_MANIFEST = "_committed_epochs.json"


def _read_manifest(out_dir: str) -> dict:
    path = os.path.join(out_dir, _MANIFEST)
    if not os.path.exists(path):
        return {"stream_epochs": [], "generations": []}
    import json

    with open(path) as f:
        m = json.load(f)
    if isinstance(m, list):  # legacy v1 single-list manifest
        return {"stream_epochs": [int(e) for e in m], "generations": []}
    return {
        "stream_epochs": [int(e) for e in m.get("stream_epochs", [])],
        "generations": [int(g) for g in m.get("generations", [])],
    }


def _write_manifest(out_dir: str, manifest: dict) -> None:
    """Temp-write + ``os.replace`` — the single atomic commit point."""
    import json

    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, _MANIFEST)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, path)


def _committed_epochs(out_dir: str) -> list[int]:
    """Stream-committed batch ids ONLY (the replay-skip namespace)."""
    return _read_manifest(out_dir)["stream_epochs"]


def _commit_epoch(out_dir: str, epoch_id: int) -> None:
    m = _read_manifest(out_dir)
    m["stream_epochs"] = sorted(set(m["stream_epochs"]) | {int(epoch_id)})
    _write_manifest(out_dir, m)


def _state_dirs(out_dir: str, tbl: str, manifest: dict | None = None) -> list[str]:
    m = _read_manifest(out_dir) if manifest is None else manifest
    return [
        os.path.join(out_dir, tbl, f"gen={g}") for g in m["generations"]
    ] + [os.path.join(out_dir, tbl, f"epoch={e}") for e in m["stream_epochs"]]


def _has_state(out_dir: str) -> bool:
    m = _read_manifest(out_dir)
    return bool(m["stream_epochs"] or m["generations"])


def compact_state(spark: SparkSession, out_dir: str) -> int:
    """Fold all committed state (epoch dirs + prior generations) into
    ONE generation — the operational half of the sink's "state is
    compactable" contract. At 100 TB the bands index accretes one small
    parquet dir per micro-batch (thousands per day at tip cadence);
    probe cost follows file count, so periodic compaction is what keeps
    the band equi-join cheap.

    Generations live in their own id namespace (``gen=<n>`` dirs,
    ``generations`` manifest key) so a compacted id can never equal a
    future foreachBatch batch id — the replay guard keeps consulting
    only ``stream_epochs`` and real future batches are never skipped.

    Same atomicity argument as the sink itself: the merged docs and
    bands land in a fresh ``gen=<n>`` dir, then one manifest rename
    swaps visibility from the old state list to the single new
    generation. A crash before the rename leaves the old state fully
    intact (the half-written merge dirs are manifest-invisible); after
    it, readers see only the compacted generation. Old dirs are GC'd
    last — a crash mid-GC leaves orphans no reader can see, cleaned by
    the next compaction.

    MUST NOT run concurrently with an in-flight micro-batch: the
    manifest swap GCs dirs a running batch's lazy plan may still read.
    Run it from the stream's own driver between triggers (e.g. in a
    ``StreamingQueryListener`` or a paused window) — the same
    single-writer rule the sink itself documents. Returns the new
    generation id (or the current sole generation / -1 if nothing to
    do)."""
    m = _read_manifest(out_dir)
    if not m["stream_epochs"] and len(m["generations"]) <= 1:
        return m["generations"][0] if m["generations"] else -1
    gen = (max(m["generations"]) + 1) if m["generations"] else 0
    old_dirs = [
        (tbl, d) for tbl in ("docs", "bands") for d in _state_dirs(out_dir, tbl, m)
    ]
    committed_docs_df(spark, out_dir).write.mode("overwrite").parquet(
        os.path.join(out_dir, "docs", f"gen={gen}")
    )
    committed_bands_df(spark, out_dir).write.mode("overwrite").parquet(
        os.path.join(out_dir, "bands", f"gen={gen}")
    )
    # the single atomic visibility swap — stream_epochs resets empty;
    # the ids stay burned from the stream's side via its checkpoint
    # (Structured Streaming never reissues a batch id it has committed,
    # and an uncommitted replay re-delivers with data we'd reprocess
    # idempotently against the compacted state).
    _write_manifest(out_dir, {"stream_epochs": [], "generations": [gen]})
    # GC old dirs (invisible already; best-effort)
    import shutil

    for _tbl, d in old_dirs:
        shutil.rmtree(d, ignore_errors=True)
    return gen


def committed_docs_df(spark: SparkSession, out_dir: str) -> DataFrame:
    """The surviving corpus — manifest-visible state only (torn dirs
    from a crash before the manifest rename are invisible here)."""
    return spark.read.parquet(*_state_dirs(out_dir, "docs"))


def committed_bands_df(spark: SparkSession, out_dir: str) -> DataFrame:
    """The committed banded-MinHash index (same visibility rule)."""
    return spark.read.parquet(*_state_dirs(out_dir, "bands"))
