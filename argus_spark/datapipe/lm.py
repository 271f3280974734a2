"""Language-model-flavoured corpus scoring: bigram fluency and a
hashed-feature linear quality classifier.

These extend the CCNet-style filtering family (textprep.fluency_unigram
is the unigram proxy) one modelling step up, the way a pre-training
pipeline actually gates documents:

  * ``fluency_bigram`` — per-document mean bigram conditional
    probability under an add-one-smoothed corpus bigram LM
    p(cur | prev) = (c2(prev,cur)+1) / (c1(prev)+V). Real perplexity
    sums per-token LOG probability; ``ln`` is not correctly rounded and
    drifts in the last ulp across engines, so — the dsir.py convention,
    stated there — each token contributes the PROBABILITY itself
    (exact-integer numerator/denominator, one correctly-rounded IEEE
    division), and the cross-token sum uses the kmeans fixed-point
    discipline: floor(p · 2³⁰) summed as BIGINT, order-free and exact,
    with the closing divisions last. Ranking behaviour for
    keep/drop gating is monotone-equivalent; swap in ln at deployment
    if true perplexity is required off the oracle contract.

  * ``quality_classifier_hashed`` — fastText-style linear scorer over
    hashed bag-of-words features: score(doc) = Σ_tok w[h(tok) mod D]
    / n_tokens. The weight of a bucket is DERIVED from the bucket id by
    the same seeded md5 hash both engines share (an integer in
    [-1000, 1000]), so the whole model is a pure expression — no weight
    table, no join, and the oracle is exact. At deployment the derived
    weights are replaced by a trained vector broadcast as a D-row
    table (the dsir.py model-table shape); the plan is otherwise
    identical. Everything before the per-doc rollup is map-side.

Scale shapes (the 100 TB contract):
  * fluency_bigram — bigram expansion is map-side (transform over the
    token array, posexplode). The bigram model table is built by a
    map-side-PARTIAL groupBy (skew-immune under Zipfian pairs); unlike
    the unigram vocabulary it can outgrow broadcast at corpus scale, so
    the probe back onto the bigram stream is a plain equi-join on
    (prev, cur) — hash-partitioned both sides, AQE-skew-splittable —
    while the much smaller context table (c1) and the one-row V frame
    broadcast. Σ exchange cost: one bigram-keyed shuffle + the
    partial-agged per-doc rollup.
  * quality_classifier_hashed — map-only: tokens → bucket → inline
    weight → per-doc BIGINT fold (partial-agged). Zero joins, zero
    model state; the only exchange is the rollup.

Reference parity: Argus has no LM surface (its expressions stop at
hex/JSON scalars, SURVEY §2 B31-B33); this module is part of the
datapipe extension the task brief mandates (text analysis / quality
scoring).

Float rule (module-wide, see text.py): no float accumulation — exact
integer folds, each division a single correctly-rounded IEEE op on
exactly-representable operands (< 2^53), fixed-point BIGINT sums.

Cache note: scoped-caching the bigram frame was MEASURED (sf0.1 A/B:
2.2s plain vs 1.8s cached, ~20%) and REJECTED — unlike the dedup
candidate frames, the bigram stream is corpus-sized (≈ one row per
token), so at 100 TB pinning it (even spill-to-disk) costs a full
corpus copy to save three map-side re-expansions whose input scan
Catalyst already shares. The plain recompute is the scale-correct
shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from argus_spark.datapipe.hashing import h64, h64_sql, words_col, words_sql
from argus_spark.session import load

FB_SCALE = 1 << 30   # fixed-point quantum for the per-doc probability sum

QC_BUCKETS = 1024    # hashed feature dimension D
QC_SEED = "qcw"      # weight-derivation hash seed
QC_RANGE = 1000      # weights are integers in [-QC_RANGE, QC_RANGE]


def fluency_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean add-one-smoothed bigram probability per document.

    Output: doc_id, n_bigrams, prob_mass_fp (Σ floor(p·2³⁰) as BIGINT),
    fluency (= prob_mass_fp / 2³⁰ / n_bigrams). Docs with < 2 tokens
    carry no bigram and are absent (same convention as chunking's
    empty-doc filter)."""
    d = load(spark, sf_dir, "documents", widen=True).select(
        "doc_id", words_col().alias("ws")
    )
    n = F.size("ws")
    # bigram expansion, map-side: pair token i with token i+1
    pairs = F.transform(
        F.slice("ws", 1, n - 1),
        lambda w, i: F.struct(
            w.alias("prev"), F.element_at(F.col("ws"), i + 2).alias("cur")
        ),
    )
    big = (
        d.filter(n >= 2)
        .select("doc_id", F.explode(pairs).alias("p"))
        .select("doc_id", F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur"))
    )
    # r14 opt (guide §2.3 aggregate-before-shuffle + §5 cache-at-the-
    # fan-out): the exploded bigram stream used to feed THREE plan
    # branches (c2 model, c1 model, probe side), each re-running the
    # words split + bigram explode from the scan (the before-plan
    # showed 8 parquet scans of documents). Collapse first to the
    # per-(doc, prev, cur) occurrence-count frame — every downstream
    # consumer is a pure aggregate of it: c2 = Σm over (prev,cur),
    # c1 = Σm over prev, per-doc n_bigrams = Σm, and the fixed-point
    # mass Σ_occurrences floor(p·2³⁰) = Σ m·floor(p·2³⁰) exactly
    # (identical p within a (prev,cur) group, integer multiply of an
    # already-floored long — bit-identical to the per-occurrence sum).
    # One explode pass + one (doc,prev,cur) shuffle replaces three
    # explode passes; the model shuffles now move distinct-bigram rows,
    # not occurrences.
    from argus_spark.datapipe.scoped_cache import scoped_cache

    dbc = scoped_cache(
        big.groupBy("doc_id", "prev", "cur").agg(
            F.count(F.lit(1)).alias("m")
        )
    )
    # model tables: c2 over (prev,cur) and c1 over prev are both
    # corpus-vocabulary-shaped — equi-join probes with NO forced
    # broadcast (at 100 TB the distinct-unigram table also outgrows the
    # driver; AQE picks broadcast at test scale on its own and degrades
    # to a shuffle join when the stats say otherwise). Only the one-row
    # V frame is hinted.
    c2 = dbc.groupBy("prev", "cur").agg(F.sum("m").alias("c2"))
    c1 = dbc.groupBy("prev").agg(F.sum("m").alias("c1"))
    vocab = (
        d.select(F.explode("ws").alias("tok"))
        .agg(F.count_distinct("tok").alias("v"))
    )
    scored = (
        dbc.join(c2, ["prev", "cur"])
        .join(c1, "prev")
        .crossJoin(F.broadcast(vocab))  # one-row V frame
        .withColumn(
            "p",
            (F.col("c2") + F.lit(1)).cast("double")
            / (F.col("c1") + F.col("v")).cast("double"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("m").cast("long").alias("n_bigrams"),
            F.sum(
                F.col("m") * F.floor(F.col("p") * F.lit(float(FB_SCALE))).cast("long")
            )
            .cast("long")
            .alias("prob_mass_fp"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "prob_mass_fp",
            (
                F.col("prob_mass_fp").cast("double")
                / F.lit(float(FB_SCALE))
                / F.col("n_bigrams").cast("double")
            ).alias("fluency"),
        )
    )


FLUENCY_BIGRAM_SQL = f"""
WITH d AS (
  SELECT doc_id, {words_sql()} AS ws FROM documents
), big AS (
  SELECT doc_id, ws[u.i] AS prev, ws[u.i + 1] AS cur
  FROM (SELECT doc_id, ws, len(ws) AS n FROM d WHERE len(ws) >= 2) k,
       unnest(range(1, k.n)) AS u(i)
), c2 AS (
  SELECT prev, cur, count(*)::BIGINT AS c2 FROM big GROUP BY prev, cur
), c1 AS (
  SELECT prev, count(*)::BIGINT AS c1 FROM big GROUP BY prev
), vocab AS (
  SELECT count(DISTINCT tok)::BIGINT AS v
  FROM (SELECT unnest(ws) AS tok FROM d)
), scored AS (
  SELECT doc_id,
         (c2.c2 + 1)::DOUBLE / (c1.c1 + vocab.v)::DOUBLE AS p
  FROM big JOIN c2 USING (prev, cur) JOIN c1 USING (prev) CROSS JOIN vocab
)
SELECT doc_id,
       count(*)::BIGINT AS n_bigrams,
       CAST(sum(CAST(floor(p * {float(FB_SCALE)!r}) AS BIGINT)) AS BIGINT)
         AS prob_mass_fp,
       CAST(sum(CAST(floor(p * {float(FB_SCALE)!r}) AS BIGINT)) AS BIGINT)::DOUBLE
         / {float(FB_SCALE)!r} / count(*)::BIGINT::DOUBLE AS fluency
FROM scored GROUP BY doc_id
"""


def quality_classifier_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fastText-style hashed linear scorer, map-only.

    Per token: bucket b = h(tok) mod D, weight w(b) = (h(b) mod
    (2R+1)) − R ∈ [−R, R] derived inline from the shared md5 hash.
    Per doc: weight_mass = Σ w (BIGINT, exact), score = mass/n_tokens
    (one division), keep = score > 0."""
    d = load(spark, sf_dir, "documents", widen=True).select(
        "doc_id", words_col().alias("ws")
    )
    tok = d.filter(F.size("ws") > 0).select(
        "doc_id", F.explode("ws").alias("tok")
    )
    b = h64(F.col("tok"), QC_SEED) % QC_BUCKETS
    w = (h64(b.cast("string"), QC_SEED) % (2 * QC_RANGE + 1)) - QC_RANGE
    return (
        tok.select("doc_id", w.alias("w"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("w").cast("long").alias("weight_mass"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "weight_mass",
            (
                F.col("weight_mass").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("score"),
            (F.col("weight_mass") > 0).alias("keep"),
        )
    )


QUALITY_CLASSIFIER_HASHED_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({words_sql()}) AS tok FROM documents
), wt AS (
  SELECT doc_id,
         (({h64_sql(f"CAST(({h64_sql('tok', QC_SEED)}) % {QC_BUCKETS} AS VARCHAR)", QC_SEED)})
            % {2 * QC_RANGE + 1}) - {QC_RANGE} AS w
  FROM tok
)
SELECT doc_id,
       count(*)::BIGINT AS n_tokens,
       CAST(sum(w) AS BIGINT) AS weight_mass,
       CAST(sum(w) AS BIGINT)::DOUBLE / count(*)::BIGINT::DOUBLE AS score,
       CAST(sum(w) AS BIGINT) > 0 AS keep
FROM wt GROUP BY doc_id
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "fluency_bigram": fluency_bigram,
    "quality_classifier_hashed": quality_classifier_hashed,
}

ORACLES: dict[str, str] = {
    "fluency_bigram": FLUENCY_BIGRAM_SQL,
    "quality_classifier_hashed": QUALITY_CLASSIFIER_HASHED_SQL,
}
