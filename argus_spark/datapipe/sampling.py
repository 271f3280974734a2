"""Training-data sampling / mixture / term-weighting operators over the
``documents`` table — the selection layer of a pre-training pipeline
(the reference has no analogue; these are the beyond-reference datapipe
ops the build brief calls for, in the same oracle-checked style).

All randomness is *hash-determinism*: the shared md5-based ``h64``
(hashing.py) drives every sampling decision, so a run is reproducible
across engines, partitionings, and cluster sizes — the property a
100 TB pipeline actually needs (re-running a failed stage must pick the
same rows).

Scale shapes:
  * ``sample_stratified`` — map-side filter, zero shuffle: rate lookup
    is a literal CASE, the keep/drop decision is pure per-row hashing.
  * ``dataset_mixture``   — per-source exact quotas: tiny count agg →
    broadcast back → per-source top-k by hash (WindowGroupLimit prunes
    map-side, so the shuffle carries ≈ quota rows per source, not the
    corpus).
  * ``tfidf_top_terms``   — explode → two partial-agged shuffles (term
    stats are corpus-wide by construction) → per-doc top-k.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from argus_spark.datapipe.hashing import h64, h64_sql, words_col, words_sql
from argus_spark.session import load

# Per-source keep-rate in percent; sources absent from the map fall back
# to DEFAULT_RATE. Mirrors a real mixture config (e.g. upsample books,
# downsample web crawl).
SAMPLE_RATES: dict[str, int] = {
    "src0": 100, "src1": 80, "src2": 60, "src3": 40, "src4": 20,
    "src5": 10, "src6": 90, "src7": 70, "src8": 50, "src9": 30,
}
DEFAULT_RATE = 25

# dataset_mixture: relative integer weights and a global budget.
MIX_WEIGHTS: dict[str, int] = {"src0": 4, "src1": 2, "src2": 2, "src3": 1}
MIX_BUDGET = 120


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-deterministic stratified sampling: keep a doc iff
    ``h64(doc_id) % 100 < rate(source)``. Pure map-side — the decision
    needs no shuffle, no RNG state, and is stable under retries and
    repartitioning (unlike ``df.sample``, whose output depends on the
    partitioning)."""
    d = load(spark, sf_dir, "documents", widen=True)
    rate = F.lit(DEFAULT_RATE)
    for src, r in sorted(SAMPLE_RATES.items()):
        rate = F.when(F.col("source") == src, F.lit(r)).otherwise(rate)
    bucket = h64(F.col("doc_id").cast("string"), "strat") % F.lit(100)
    return (
        d.withColumn("bucket", bucket)
        .withColumn("rate", rate)
        .filter(F.col("bucket") < F.col("rate"))
        .select("doc_id", "source", "bucket", "rate")
    )


_RATE_SQL = (
    "CASE "
    + " ".join(
        f"WHEN source = '{s}' THEN {r}" for s, r in sorted(SAMPLE_RATES.items())
    )
    + f" ELSE {DEFAULT_RATE} END"
)

SAMPLE_STRATIFIED_SQL = f"""
WITH b AS (
  SELECT doc_id, source,
         {h64_sql("doc_id::VARCHAR", "strat")} % 100 AS bucket,
         {_RATE_SQL} AS rate
  FROM documents
)
SELECT doc_id, source, bucket, rate FROM b WHERE bucket < rate
"""


def dataset_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota mixture sampling: split a global budget across
    sources by weight (quota_s = budget * w_s / Σw, capped at the
    source's size), then take each source's quota as the docs with the
    smallest sampling hashes — a deterministic 'bottom-k by hash'
    reservoir. Weight-listed sources only.

    Integer arithmetic end-to-end (quotas via integer floor division),
    so both engines agree exactly; the per-source counts are a tiny
    aggregate broadcast back onto the corpus."""
    d = load(spark, sf_dir, "documents", widen=True)
    wsum = sum(MIX_WEIGHTS.values())
    weight = F.lit(None).cast("long")
    for src, w in sorted(MIX_WEIGHTS.items()):
        weight = F.when(F.col("source") == src, F.lit(w)).otherwise(weight)
    pool = d.withColumn("w", weight).filter(F.col("w").isNotNull())
    quotas = (
        pool.groupBy("source", "w")
        .agg(F.count("*").alias("n_src"))
        .withColumn(
            "quota",
            F.least(
                F.col("n_src"),
                (F.lit(MIX_BUDGET) * F.col("w") / F.lit(wsum)).cast("long"),
            ),
        )
        .select("source", "n_src", "quota")
    )
    ranked = (
        pool.join(F.broadcast(quotas), "source")
        .withColumn("h", h64(F.col("doc_id").cast("string"), "mix"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("source").orderBy(F.asc("h"), F.asc("doc_id"))
            ),
        )
    )
    return ranked.filter(F.col("rk") <= F.col("quota")).select(
        "doc_id", "source", "quota", "rk"
    )


_WEIGHT_SQL = (
    "CASE "
    + " ".join(f"WHEN source = '{s}' THEN {w}" for s, w in sorted(MIX_WEIGHTS.items()))
    + " ELSE NULL END"
)

DATASET_MIXTURE_SQL = f"""
WITH pool AS (
  SELECT doc_id, source, {_WEIGHT_SQL}::BIGINT AS w FROM documents
  WHERE {_WEIGHT_SQL} IS NOT NULL
), quotas AS (
  SELECT source, count(*)::BIGINT AS n_src,
         least(count(*)::BIGINT,
               ({MIX_BUDGET} * any_value(w)) // {sum(MIX_WEIGHTS.values())}) AS quota
  FROM pool GROUP BY source
), ranked AS (
  SELECT p.doc_id, p.source, q.quota,
         row_number() OVER (
           PARTITION BY p.source
           ORDER BY {h64_sql("p.doc_id::VARCHAR", "mix")}, p.doc_id
         ) AS rk
  FROM pool p JOIN quotas q USING (source)
)
SELECT doc_id, source, quota, rk FROM ranked WHERE rk <= quota
"""

TFIDF_TOP_K = 3


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by tf·inverse-df.

    Weight = tf × (N+1)/(df+1) — the idf log is omitted deliberately:
    ranking is what matters and a single correctly-rounded IEEE
    division (exact int→double inputs) is bit-identical across engines,
    where ``ln`` implementations may differ in the last ulp.

    Plan: explode(words) → per-(doc,term) count (partial-agged) →
    per-term df (partial-agged, joined back — term dictionary is far
    smaller than the corpus) → per-doc top-k window."""
    d = load(spark, sf_dir, "documents", widen=True)
    n_docs = d.count()  # control-plane scalar (one tiny job)
    terms = d.select(
        "doc_id", F.explode(words_col()).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = terms.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    scored = tf.join(df_, "term").withColumn(
        "score",
        F.col("tf").cast("double")
        * (F.lit(float(n_docs + 1)) / (F.col("df").cast("double") + F.lit(1.0))),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= TFIDF_TOP_K)
        .select("doc_id", "term", "tf", "df", "score", "rnk")
    )


TFIDF_TOP_TERMS_SQL = f"""
WITH terms AS (
  SELECT doc_id, unnest({words_sql()}) AS term FROM documents
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM terms GROUP BY doc_id, term
), df AS (
  SELECT term, count(DISTINCT doc_id)::BIGINT AS df FROM terms GROUP BY term
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, df.df,
         tf.tf::DOUBLE * (((SELECT count(*) FROM documents) + 1)::DOUBLE
                          / (df.df::DOUBLE + 1.0)) AS score
  FROM tf JOIN df USING (term)
)
SELECT doc_id, term, tf, df, score, rnk FROM (
  SELECT *, row_number() OVER (PARTITION BY doc_id
                               ORDER BY score DESC, term) AS rnk
  FROM scored
) WHERE rnk <= {TFIDF_TOP_K}
"""


N_SHARDS = 8
SEQ_CAPACITY = 512  # tokens per packed training sequence


def pack_sequences(
    spark: SparkSession, sf_dir: str, docs_df: DataFrame | None = None
) -> DataFrame:
    """Document-concatenation packing: place every doc at a (shard,
    seq_id, offset) in fixed-capacity token sequences — the layout step
    that turns a filtered corpus into training shards.

    Deterministic end-to-end: shard = hash % N_SHARDS, order within a
    shard = (hash, doc_id) (hash order ≡ a reproducible global
    shuffle), position = running sum of preceding docs' token counts,
    seq_id = position // capacity. Docs may straddle a boundary —
    downstream concatenation splits there; this operator's contract is
    the placement, which is the distributed part.

    Scale shape: the only shuffle is hash-partitioning by shard; the
    running sum is a per-shard window, so parallelism = N_SHARDS (set
    it to O(cluster cores) in production — there is no global order to
    maintain, by design).

    ``docs_df`` lets a pipeline pack an already-filtered frame (any
    frame with doc_id + text — see scripts/example_curation.py); the
    default reads the raw table, which is what the registered oracle
    query checks."""
    d = (
        docs_df
        if docs_df is not None
        else load(spark, sf_dir, "documents", widen=True)
    )
    n_tokens = F.size(words_col()).cast("long")
    h = h64(F.col("doc_id").cast("string"), "pack")
    base = d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        h.alias("h"),
        (h % F.lit(N_SHARDS)).alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.asc("h"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pos = F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("long"))
    return base.select(
        "doc_id",
        "shard",
        "n_tokens",
        pos.alias("pos"),
        (pos / F.lit(SEQ_CAPACITY)).cast("long").alias("seq_id"),
        (pos % F.lit(SEQ_CAPACITY)).alias("offset"),
    )


PACK_SEQUENCES_SQL = f"""
WITH base AS (
  SELECT doc_id,
         len({words_sql()})::BIGINT AS n_tokens,
         {h64_sql("doc_id::VARCHAR", "pack")} AS h
  FROM documents
), pos AS (
  SELECT doc_id, h % {N_SHARDS} AS shard, n_tokens,
         COALESCE(sum(n_tokens) OVER (
           PARTITION BY h % {N_SHARDS}
           ORDER BY h, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0)::BIGINT AS pos
  FROM base
)
SELECT doc_id, shard, n_tokens, pos,
       pos // {SEQ_CAPACITY} AS seq_id,
       pos % {SEQ_CAPACITY} AS offset
FROM pos
"""


_PACKED_DIRS: dict[str, str] = {}


def _packed_out_dir(sf_dir: str) -> str:
    """Per-process output dir for the shard export, keyed by sf_dir:
    created once, registered for exit cleanup once, overwritten in
    place by every subsequent construction (ADVICE r8: the former
    fresh-mkdtemp-per-call leaked one dataset copy per repeat)."""
    import atexit
    import shutil
    import tempfile

    if sf_dir not in _PACKED_DIRS:
        d = tempfile.mkdtemp(prefix="argus_packed_shards_")
        atexit.register(shutil.rmtree, d, ignore_errors=True)
        _PACKED_DIRS[sf_dir] = d
    return _PACKED_DIRS[sf_dir]


def export_packed_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The training-export WRITE path: materialize the
    ``pack_sequences`` layout as shard-partitioned parquet (one
    directory per shard — the file layout a training loader consumes),
    then derive the per-shard manifest FROM THE WRITTEN FILES, so the
    oracle hash proves the round-trip (partitioned write → partition
    discovery → read-back) and not just the in-memory plan. Eager by
    construction (the write runs when the query is built — the
    streaming-replay precedent); the returned frame is a lazy read of
    the written dataset.

    Scale: the write is partitioned by the same shard key the packing
    shuffle already established — no extra exchange; the manifest agg
    has N_SHARDS output groups. shard is re-cast to BIGINT because
    partition-column discovery narrows it to INT on read.

    The output dir is ONE per (process, sf_dir), overwritten in place
    on re-construction — bench's warm+timed repeats and long harness
    sessions must not accumulate a packed-dataset copy per call."""
    out = _packed_out_dir(sf_dir)
    pack_sequences(spark, sf_dir).write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(out)
    written = spark.read.parquet(out)
    return (
        written.groupBy(F.col("shard").cast("long").alias("shard"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.count_distinct("seq_id").cast("long").alias("n_seqs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )


EXPORT_PACKED_SHARDS_SQL = f"""
WITH packed AS ({PACK_SEQUENCES_SQL})
SELECT shard::BIGINT AS shard,
       count(*)::BIGINT AS n_docs,
       count(DISTINCT seq_id)::BIGINT AS n_seqs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens
FROM packed GROUP BY shard
"""


# ---------------- quality-stratified sampling ----------------

QD_N = 10
# Per-decile keep rate in per-mille, best decile first: keep all of the
# top decile, grade down to 10% of the worst — the standard
# "oversample high quality" mixing curve (a config knob in practice).
QD_RATES = [1000, 900, 800, 700, 600, 500, 400, 300, 200, 100]


def sample_quality_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-stratified sampling: rank docs into quality deciles
    WITHIN each source (ntile over the shared composite quality score,
    doc_id tie-break — a total order, so deciles are deterministic),
    then keep hash-deterministically at the decile's rate. Combines
    the quality-scoring and hash-sampling disciplines: reproducible
    under retries/repartitioning, bit-identical across engines.

    Scale shape: one per-source ranking window (the same shuffle
    curate_quality_topk pays — at 100 TB you'd swap exact ntile for
    broadcast approx-quantile decile boundaries, trading exactness for
    a map-only assignment) plus a map-side hash filter."""
    from argus_spark.datapipe.text import text_quality

    tq = text_quality(spark, sf_dir, keep=("source",)).select(
        "doc_id", "source", "quality_score"
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("quality_score"), F.asc("doc_id")
    )
    dec = F.ntile(QD_N).over(w)
    rate = F.element_at(F.array(*[F.lit(r) for r in QD_RATES]), dec)
    bucket = h64(F.col("doc_id").cast("string"), "qdec") % F.lit(1000)
    return (
        tq.withColumn("decile", dec.cast("long"))
        .withColumn("rate", rate.cast("long"))
        .withColumn("bucket", bucket)
        .filter(F.col("bucket") < F.col("rate"))
        .select("doc_id", "source", "decile", "rate")
    )


def _qdec_sql() -> str:
    from argus_spark.datapipe.text import QUALITY_SCORE_SQL, quality_cte_sql

    rates = "[" + ", ".join(str(r) for r in QD_RATES) + "]"
    return f"""
WITH {quality_cte_sql(extra_cols=", source")},
q AS (
  SELECT doc_id, source, {QUALITY_SCORE_SQL} AS quality_score FROM m
), d AS (
  SELECT doc_id, source,
         ntile({QD_N}) OVER (PARTITION BY source
                             ORDER BY quality_score DESC, doc_id) AS decile
  FROM q
)
SELECT doc_id, source, decile::BIGINT AS decile,
       ({rates}[decile])::BIGINT AS rate
FROM d
WHERE {h64_sql("doc_id::VARCHAR", "qdec")} % 1000 < {rates}[decile]
"""


SAMPLE_QUALITY_DECILES_SQL = _qdec_sql()


# Temperature sampling: quotas ∝ n_s^(1/2) (α = 0.5 — the standard
# multilingual-corpus rebalancing knob: tail sources are upsampled
# relative to their share, head sources downsampled). Budget separate
# from MIX_BUDGET so the two mixture ops stay independently tunable.
TEMP_BUDGET = 300
TEMP_SCALE = 1_000_000  # fixed-point for sqrt(n): floor(sqrt·1e6)


def dataset_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture sampling over ALL sources: source s
    gets quota_s = ⌊budget · s_fp / Σ s_fp⌋ docs where s_fp =
    ⌊√n_s · 1e6⌋ — the α=0.5 temperature curve, in FIXED-POINT so the
    cross-source sum is an integer sum (order-free; a float Σ√n would
    depend on summation order and drift between engines; √ itself is
    correctly-rounded IEEE in both, so the scaled floor agrees
    bit-for-bit). Selection within a source is the same deterministic
    bottom-k-by-hash reservoir as ``dataset_mixture``.

    100 TB shape: per-source counts are a tiny partial-agged aggregate;
    the fixed-point temperature arithmetic happens on that ~|sources|-
    row frame driver-free; quotas broadcast back; WindowGroupLimit
    prunes the per-source ranking map-side so the shuffle carries
    ≈ quota rows per source."""
    d = load(spark, sf_dir, "documents", widen=True)
    counts = (
        d.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_src"))
        .withColumn(
            "s_fp",
            F.floor(F.sqrt(F.col("n_src").cast("double")) * F.lit(float(TEMP_SCALE)))
            .cast("long"),
        )
    )
    tot = counts.agg(F.sum("s_fp").alias("tot_fp"))
    quotas = (
        counts.crossJoin(F.broadcast(tot))
        .withColumn(
            "quota",
            # integer `div`, not float `/`+cast: at fixed-point
            # magnitudes a correctly-rounded double quotient can land
            # on the far side of an integer from the true rational
            F.least(
                F.col("n_src"),
                F.expr(f"({TEMP_BUDGET} * s_fp) div tot_fp"),
            ),
        )
        .select("source", "n_src", "quota")
    )
    ranked = (
        d.select("doc_id", "source")
        .join(F.broadcast(quotas), "source")
        .withColumn("h", h64(F.col("doc_id").cast("string"), "temp"))
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("source").orderBy(F.asc("h"), F.asc("doc_id"))
            ),
        )
    )
    return ranked.filter(F.col("rk") <= F.col("quota")).select(
        "doc_id", "source", "quota", "rk"
    )


DATASET_MIXTURE_TEMPERATURE_SQL = f"""
WITH counts AS (
  SELECT source, count(*)::BIGINT AS n_src,
         CAST(floor(sqrt(count(*)::DOUBLE) * {float(TEMP_SCALE)!r}) AS BIGINT)
           AS s_fp
  FROM documents GROUP BY source
), tot AS (
  SELECT CAST(sum(s_fp) AS BIGINT) AS tot_fp FROM counts
), quotas AS (
  SELECT source, n_src,
         least(n_src, ({TEMP_BUDGET} * s_fp) // tot_fp) AS quota
  FROM counts CROSS JOIN tot
), ranked AS (
  SELECT d.doc_id, d.source, q.quota,
         row_number() OVER (
           PARTITION BY d.source
           ORDER BY {h64_sql("d.doc_id::VARCHAR", "temp")}, d.doc_id
         ) AS rk
  FROM documents d JOIN quotas q USING (source)
)
SELECT doc_id, source, quota, rk FROM ranked WHERE rk <= quota
"""


def pack_efficiency_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency rollup over the ``pack_sequences`` layout:
    per shard, the docs placed, token mass, sequences touched
    (⌊(max(pos + n_tokens) − 1) / capacity⌋ + 1), and utilization =
    tokens / (sequences · capacity) — the padding-waste diagnostic a
    packing run publishes (utilization near 1 ⇒ the layout wastes
    little sequence capacity on tail padding).

    One |shards|-key partial-agged aggregate over the packing frame —
    the packing plan's own shuffle already delivered shard
    partitioning, so this rollup adds one tiny exchange."""
    p = pack_sequences(spark, sf_dir)
    return (
        p.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            (
                F.floor(
                    (F.max(F.col("pos") + F.col("n_tokens")) - F.lit(1))
                    / F.lit(SEQ_CAPACITY)
                )
                + F.lit(1)
            ).cast("long").alias("n_seqs"),
        )
        .select(
            "shard", "n_docs", "total_tokens", "n_seqs",
            (
                F.col("total_tokens").cast("double")
                / (F.col("n_seqs") * F.lit(SEQ_CAPACITY)).cast("double")
            ).alias("utilization"),
        )
    )


PACK_EFFICIENCY_STATS_SQL = f"""
WITH packed AS ({PACK_SEQUENCES_SQL}),
agg AS (
  SELECT shard, count(*)::BIGINT AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
         ((max(pos + n_tokens) - 1) // {SEQ_CAPACITY} + 1)::BIGINT AS n_seqs
  FROM packed GROUP BY shard
)
SELECT shard, n_docs, total_tokens, n_seqs,
       total_tokens::DOUBLE / (n_seqs * {SEQ_CAPACITY})::DOUBLE AS utilization
FROM agg
"""


# weighted Bernoulli sampling: expected sample size (in docs) and the
# 60-bit uniform's modulus, shared by both engines.
WB_TARGET = 100
WB_MOD = 1 << 60


def weighted_sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-weighted Bernoulli sampling: include doc i independently
    with probability p_i = min(1, K·w_i / W) where w_i = n_chars and
    W = Σw — the standard one-pass weighted downsample (expected-size
    K, longer docs proportionally likelier; the length-bias partner of
    the uniform ``sample_stratified``).

    The inclusion test is EXACT INTEGER arithmetic: with u_i =
    h64(doc_id) uniform on [0, 2⁶⁰), include iff
    u_i · W < K · w_i · 2⁶⁰, evaluated in DECIMAL(38,0) (Spark) /
    HUGEINT (DuckDB) so the products never round (u·W < 2⁶⁰·W and at
    100 TB W ≈ 10¹⁴ ⇒ ≈ 2¹⁰⁷ < 2¹²⁶). The p ≥ 1 case needs no special
    path: u < 2⁶⁰ makes the inequality always true when K·w ≥ W.
    Plan: one tiny total aggregate, broadcast one-row back (the house
    crossJoin shape), then a pure map-side filter — zero data shuffles."""
    d = load(spark, sf_dir, "documents", widen=True)
    tot = d.agg(F.sum("n_chars").cast("decimal(38,0)").alias("w_total"))
    u = h64(F.col("doc_id").cast("string"), "wbern")
    return (
        d.crossJoin(F.broadcast(tot))  # one-row totals frame
        .withColumn("u", u)
        .filter(
            F.col("u").cast("decimal(38,0)") * F.col("w_total")
            < F.lit(WB_TARGET).cast("decimal(38,0)")
            * F.col("n_chars").cast("decimal(38,0)")
            * F.lit(WB_MOD).cast("decimal(38,0)")
        )
        .select(
            "doc_id",
            "source",
            F.col("n_chars").cast("long").alias("weight"),
            "u",
            F.col("w_total").cast("long").alias("w_total"),
        )
    )


WEIGHTED_SAMPLE_BERNOULLI_SQL = f"""
WITH tot AS (
  SELECT CAST(sum(n_chars) AS HUGEINT) AS w_total FROM documents
)
SELECT doc_id, source,
       n_chars::BIGINT AS weight,
       {h64_sql("doc_id::VARCHAR", "wbern")} AS u,
       w_total::BIGINT AS w_total
FROM documents CROSS JOIN tot
WHERE ({h64_sql("doc_id::VARCHAR", "wbern")})::HUGEINT * w_total
      < {WB_TARGET}::HUGEINT * n_chars::HUGEINT * {WB_MOD}::HUGEINT
"""


# ---------------- token-budget mixture (epoch-capped repeats) ----------------

# The LLaMA-style data recipe: every weight-listed source should
# contribute share w_s/Σw of a TOKEN budget, realized as a per-source
# REPEAT factor (epochs) over the source — up-sampling scarce
# high-weight sources (capped at TBM_CAP_EPOCHS passes, the standard
# "don't repeat any source more than N×" rule) and down-sampling
# abundant low-weight ones. Differs from ``dataset_mixture`` /
# ``dataset_mixture_temperature`` on both axes that matter: the budget
# is token-denominated (docs have very different lengths; recipes are
# written in tokens), and the output is a repeat COUNT per doc
# (n_copies ∈ {0, 1, 2, ...}), not a keep/drop subset.
TBM_WEIGHTS: dict[str, int] = {
    "src0": 2, "src2": 3, "src5": 1, "src8": 1, "src11": 10, "src14": 2,
}
TBM_CAP_EPOCHS = 4       # never repeat a source more than 4 passes
TBM_FP = 1_000_000       # fixed-point scale for the repeat factor


def token_budget_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repeat counts realizing a token-denominated source
    recipe: budget B = ⌊T_pool/2⌋ tokens (half the weight-listed pool's
    token mass — scale-invariant, so the recipe means the same thing at
    every sf); source s gets target B·w_s/Σw tokens, i.e. repeat factor

        r_s = min(CAP, B·w_s / (Σw·T_s))   (fixed-point ×1e6)

    and each doc is emitted ⌊r_s⌋ times plus one more with probability
    frac(r_s) — decided by the shared deterministic hash, so a re-run
    (or a recovered stage) picks the SAME fractional-epoch docs. All
    arithmetic is int64 fixed-point: products are bounded by
    T_pool·max(w)·1e6, exact to ~9·10¹¹ pool tokens (≈3.6 TB of text);
    a 100 TB corpus drops TBM_FP to 1e3 or widens to DECIMAL(38) —
    same expressions, wider type.

    Plan at 100 TB: per-source token totals are one map-side-partial
    aggregate over a 3-column projection; the ~|sources|-row rate frame
    is computed frame-side (no driver round-trip) and BROADCAST back;
    the per-doc copy count is a map-side expression. One corpus
    shuffle total, on the uniform ``source`` key space of the tiny
    aggregate — the corpus itself never reshuffles."""
    d = load(spark, sf_dir, "documents", widen=True)
    wsum = sum(TBM_WEIGHTS.values())
    weight = F.lit(None).cast("long")
    for src, w in sorted(TBM_WEIGHTS.items()):
        weight = F.when(F.col("source") == src, F.lit(w)).otherwise(weight)
    pool = (
        d.select(
            "doc_id",
            "source",
            F.size(words_col()).cast("long").alias("tok"),
            weight.alias("w"),
        )
        .filter(F.col("w").isNotNull())
    )
    per_src = pool.groupBy("source", "w").agg(F.sum("tok").alias("t_src"))
    tot = per_src.agg(F.sum("t_src").alias("t_tot"))
    rates = (
        per_src.crossJoin(F.broadcast(tot))
        .withColumn(
            "r_fp",
            F.least(
                F.lit(TBM_CAP_EPOCHS * TBM_FP).cast("long"),
                F.expr(
                    f"((t_tot div 2) * w * {TBM_FP}) div ({wsum} * t_src)"
                ),
            ),
        )
        .select("source", "r_fp")
    )
    n_copies = (
        F.expr(f"r_fp div {TBM_FP}")
        + F.when(
            h64(F.col("doc_id").cast("string"), "tbm") % TBM_FP
            < F.col("r_fp") % TBM_FP,
            1,
        ).otherwise(0)
    ).cast("long")
    return (
        pool.join(F.broadcast(rates), "source")
        .select("doc_id", "source", "tok", "r_fp", n_copies.alias("n_copies"))
        .filter(F.col("n_copies") > 0)
    )


_TBM_WEIGHT_SQL = (
    "CASE "
    + " ".join(f"WHEN source = '{s}' THEN {w}" for s, w in sorted(TBM_WEIGHTS.items()))
    + " ELSE NULL END"
)

TOKEN_BUDGET_MIXTURE_SQL = f"""
WITH pool AS (
  SELECT doc_id, source,
         len({words_sql()})::BIGINT AS tok,
         ({_TBM_WEIGHT_SQL})::BIGINT AS w
  FROM documents
  WHERE ({_TBM_WEIGHT_SQL}) IS NOT NULL
), per_src AS (
  SELECT source, any_value(w) AS w, CAST(sum(tok) AS BIGINT) AS t_src
  FROM pool GROUP BY source
), tot AS (
  SELECT CAST(sum(t_src) AS BIGINT) AS t_tot FROM per_src
), rates AS (
  SELECT source,
         least({TBM_CAP_EPOCHS * TBM_FP},
               ((t_tot // 2) * w * {TBM_FP}) // ({sum(TBM_WEIGHTS.values())} * t_src))
           AS r_fp
  FROM per_src CROSS JOIN tot
), out AS (
  SELECT p.doc_id, p.source, p.tok, r.r_fp,
         (r.r_fp // {TBM_FP}
          + CASE WHEN ({h64_sql("p.doc_id::VARCHAR", "tbm")}) % {TBM_FP}
                      < r.r_fp % {TBM_FP}
                 THEN 1 ELSE 0 END)::BIGINT AS n_copies
  FROM pool p JOIN rates r USING (source)
)
SELECT doc_id, source, tok, r_fp, n_copies FROM out WHERE n_copies > 0
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "sample_stratified": sample_stratified,
    "token_budget_mixture": token_budget_mixture,
    "weighted_sample_bernoulli": weighted_sample_bernoulli,
    "dataset_mixture": dataset_mixture,
    "dataset_mixture_temperature": dataset_mixture_temperature,
    "tfidf_top_terms": tfidf_top_terms,
    "sample_quality_deciles": sample_quality_deciles,
    "pack_sequences": pack_sequences,
    "pack_efficiency_stats": pack_efficiency_stats,
    "export_packed_shards": export_packed_shards,
}

ORACLES: dict[str, str] = {
    "sample_stratified": SAMPLE_STRATIFIED_SQL,
    "token_budget_mixture": TOKEN_BUDGET_MIXTURE_SQL,
    "weighted_sample_bernoulli": WEIGHTED_SAMPLE_BERNOULLI_SQL,
    "dataset_mixture": DATASET_MIXTURE_SQL,
    "dataset_mixture_temperature": DATASET_MIXTURE_TEMPERATURE_SQL,
    "tfidf_top_terms": TFIDF_TOP_TERMS_SQL,
    "sample_quality_deciles": SAMPLE_QUALITY_DECILES_SQL,
    "pack_sequences": PACK_SEQUENCES_SQL,
    "pack_efficiency_stats": PACK_EFFICIENCY_STATS_SQL,
    "export_packed_shards": EXPORT_PACKED_SHARDS_SQL,
}
