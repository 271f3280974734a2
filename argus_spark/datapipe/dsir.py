"""DSIR-style data selection — hashed n-gram importance scoring of a
raw corpus against a target domain (Xie et al., "Data Selection for
Language Models via Importance Resampling", NeurIPS 2023).

``dsir_affinity``: per-document affinity of every corpus doc to the
target domain (here: the ``lang = 'en'`` slice of ``documents``),
under hashed-unigram bag-of-words models with Laplace smoothing —
the standard cheap proxy for "does this raw doc look like my target
distribution" that drives importance resampling of web-scale corpora.

Departure from the paper, deliberate: DSIR sums per-token LOG
probability ratios; ``ln`` is not correctly rounded and differs in
the last ulp across engines, which would break the bit-exact oracle
contract (same reasoning as tfidf_top_terms' log-free idf,
sampling.py). Instead each token contributes the probability
DIFFERENCE p_target(bucket) − p_raw(bucket): every input is an exact
integer, each division is one correctly-rounded IEEE op, and the
difference of two identical doubles is again correctly rounded — so
the per-token value is bit-identical in Spark and DuckDB. The
cross-token sum uses the kmeans fixed-point discipline
(clustering.py): ``floor(val · 2³⁰)`` (power-of-two scale ⇒ exact
multiply) summed as BIGINT — order-free and exact — with ONE closing
division. Monotone ranking behavior matches the log form for the
selection use-case; swap in ``ln`` at deployment if true
log-likelihood ratios are needed and cross-engine exactness is not a
contract.

100 TB shape: token hashing + bucketing is map-side; the two bucket
models are 256-row tables built by map-side-PARTIAL aggregates
(skew-immune under Zipfian tokens — same argument as
fluency_unigram) and BROADCAST back onto the token stream; the only
corpus-sized exchange is the final per-doc rollup, which partial-
aggregates. Scoring 100 TB against a new target domain re-uses the
corpus bucket table — only the tiny target model recomputes.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from argus_spark.datapipe.hashing import h64, h64_sql, words_col, words_sql
from argus_spark.session import load

DSIR_BUCKETS = 256        # hashed-unigram model size
DSIR_TARGET_LANG = "en"   # registered target-domain slice
DSIR_SCALE = 1 << 30      # fixed-point quantum for the per-doc sum


def dsir_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document target-domain affinity: Σ_tokens
    (p_target(b(tok)) − p_raw(b(tok))), fixed-point-summed.
    Positive ⇒ the doc's hashed token distribution leans toward the
    target domain; downstream selection keeps the top mass."""
    d = load(spark, sf_dir, "documents", widen=True).select(
        "doc_id", "lang", words_col().alias("ws")
    )
    tok = d.select("doc_id", "lang", F.explode("ws").alias("w")).select(
        "doc_id", "lang", (h64(F.col("w"), "dsir") % DSIR_BUCKETS).alias("b")
    )
    # r14 opt (guide §2.3 aggregate-before-shuffle + §5 cache-at-the-
    # fan-out): the md5-hashed token stream used to feed TWO plan
    # branches (the model aggregate and the scoring probe), each
    # re-running the words split + explode + per-token md5 from the
    # scan. Collapse first to the per-(doc, lang, b) occurrence-count
    # frame (≤ 256 rows per doc — lang is constant within a doc, so the
    # key adds no fan-out): the models are a pure aggregate of it and
    # the per-doc rollup sums m·floor(val·2³⁰) — identical val within a
    # bucket, integer multiply of an already-floored long, so the sum
    # is bit-identical to the per-occurrence form. One token pass + one
    # small shuffle replaces two token passes; the probe join and the
    # rollup now move per-doc-bucket rows, not occurrences.
    from argus_spark.datapipe.scoped_cache import scoped_cache

    dbc = scoped_cache(
        tok.groupBy("doc_id", "lang", "b").agg(F.count(F.lit(1)).alias("m"))
    )
    # BOTH models in one partial-aggregated pass over the token stream
    # (cr = all occurrences, ct = target-slice occurrences via a
    # conditional sum), and the totals fold from the 256-row model
    # table itself — one corpus pass builds everything, vs the naive
    # three (raw counts, target counts, totals). Absent target buckets
    # carry ct=0 and smooth via the +1 Laplace term.
    models = dbc.groupBy("b").agg(
        F.sum("m").alias("cr"),
        F.sum(
            F.when(F.col("lang") == DSIR_TARGET_LANG, F.col("m")).otherwise(
                F.lit(0)
            )
        ).alias("ct"),
    )
    tots = models.agg(  # 256-row input: control-plane-cheap
        F.sum("cr").alias("nr"), F.sum("ct").alias("nt")
    )
    bucket = (
        models.crossJoin(F.broadcast(tots))  # one-row totals frame
        .select(
            "b",
            (
                (F.col("ct") + F.lit(1)).cast("double")
                / (F.col("nt") + F.lit(DSIR_BUCKETS)).cast("double")
                - (F.col("cr") + F.lit(1)).cast("double")
                / (F.col("nr") + F.lit(DSIR_BUCKETS)).cast("double")
            ).alias("val"),
        )
    )
    return (
        dbc.join(F.broadcast(bucket), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("m").cast("long").alias("n_tokens"),
            F.sum(
                F.col("m")
                * F.floor(F.col("val") * F.lit(float(DSIR_SCALE))).cast("long")
            )
            .cast("long")
            .alias("affinity_fp"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "affinity_fp",
            (F.col("affinity_fp").cast("double") / F.lit(float(DSIR_SCALE)))
            .alias("affinity"),
        )
    )


DSIR_AFFINITY_SQL = f"""
WITH d AS (
  SELECT doc_id, lang, {words_sql()} AS ws FROM documents
), tok AS (
  SELECT doc_id, lang, ({h64_sql("w", "dsir")}) % {DSIR_BUCKETS} AS b
  FROM (SELECT doc_id, lang, unnest(ws) AS w FROM d)
), cr AS (
  SELECT b, count(*)::BIGINT AS cr FROM tok GROUP BY b
), ct AS (
  SELECT b, count(*)::BIGINT AS ct FROM tok
  WHERE lang = '{DSIR_TARGET_LANG}' GROUP BY b
), tots AS (
  SELECT (SELECT count(*) FROM tok)::BIGINT AS nr,
         (SELECT count(*) FROM tok
          WHERE lang = '{DSIR_TARGET_LANG}')::BIGINT AS nt
), bucket AS (
  SELECT cr.b,
         ((coalesce(ct.ct, 0) + 1)::DOUBLE
            / (tots.nt + {DSIR_BUCKETS})::DOUBLE
          - (cr.cr + 1)::DOUBLE
            / (tots.nr + {DSIR_BUCKETS})::DOUBLE) AS val
  FROM cr LEFT JOIN ct USING (b) CROSS JOIN tots
)
SELECT doc_id,
       count(*)::BIGINT AS n_tokens,
       CAST(sum(CAST(floor(val * {float(DSIR_SCALE)!r}) AS BIGINT))
            AS BIGINT) AS affinity_fp,
       CAST(sum(CAST(floor(val * {float(DSIR_SCALE)!r}) AS BIGINT))
            AS BIGINT)::DOUBLE / {float(DSIR_SCALE)!r} AS affinity
FROM tok JOIN bucket USING (b)
GROUP BY doc_id
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dsir_affinity": dsir_affinity,
}

ORACLES: dict[str, str] = {
    "dsir_affinity": DSIR_AFFINITY_SQL,
}
