"""Text-analysis operators over the ``documents`` table: quality
scoring, language-ID heuristic, token counting, fingerprinting.

Everything is per-row (map-side, whole-stage codegen, no shuffle) —
the 100 TB plan for all four queries is a single scan with column
pruning down to (doc_id, text[, lang, n_chars]). No Python UDFs:
split / regexp / fold cover it JVM-side.

Floating point follows the module rule: explicit double casts and
identical expression trees in the DuckDB oracle → bit-equal results.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from argus_spark.datapipe.hashing import h64, h64_sql, words_col, words_sql
from argus_spark.session import load

# Works identically in Java regex and DuckDB RE2: ASCII classes only.
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
PUNCT_RE = r"[^A-Za-z0-9 ]"

STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it", "on", "for"]

# Real-world function-word markers per language; honest heuristic (the
# synthetic corpus shares one vocabulary, so most docs score 'en' —
# deterministic either way, and the operator generalizes to real text).
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "und", "das", "ist"],
    "en": ["the", "is", "and", "of", "it"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "et", "les", "des"],
    "zh": ["的", "了", "是", "我", "不"],
}
LANGS = sorted(LANG_MARKERS)


def text_quality(
    spark: SparkSession, sf_dir: str, keep: tuple = ()
) -> DataFrame:
    """Per-doc quality signals: word count, mean word length, stopword
    ratio, punctuation ratio, and a fixed-weight composite score —
    the standard pre-training quality-filter features. ``keep`` threads
    extra document columns (e.g. ``source``) through for downstream
    composition (curation ranking) without a self-join back to the
    table."""
    d = load(spark, sf_dir, "documents", widen=True)
    ws = words_col()
    n_words = F.size(ws).cast("long")
    char_sum = F.aggregate(
        ws, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(ws, lambda w: F.array_contains(stop_arr, w))).cast("long")
    n_punct = F.size(F.regexp_extract_all("text", F.lit(PUNCT_RE), 0)).cast("long")
    out = d.select(
        "doc_id",
        *keep,
        n_words.alias("n_words"),
        (char_sum.cast("double") / n_words.cast("double")).alias("avg_word_len"),
        (n_stop.cast("double") / n_words.cast("double")).alias("stop_ratio"),
        (n_punct.cast("double") / F.col("n_chars").cast("double")).alias("punct_ratio"),
    )
    return out.withColumn(
        "quality_score",
        F.col("stop_ratio") * F.lit(0.4)
        + (F.lit(1.0) - F.col("punct_ratio")) * F.lit(0.3)
        + F.least(F.col("n_words").cast("double") / F.lit(100.0), F.lit(1.0))
        * F.lit(0.3),
    )


_STOP_SQL = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"

# Composite score over the m-CTE's feature columns — ONE definition
# shared by every oracle that ranks or filters on quality (text_quality,
# curate_quality_topk): a weight change can never drift between them.
QUALITY_SCORE_SQL = (
    "(n_stop::DOUBLE / n_words::DOUBLE) * 0.4"
    " + (1.0 - n_punct::DOUBLE / n_chars::DOUBLE) * 0.3"
    " + least(n_words::DOUBLE / 100.0, 1.0) * 0.3"
)


def quality_cte_sql(extra_cols: str = "") -> str:
    """The shared ``w``/``m`` feature CTEs (tokens, punct, stopword,
    char-sum counts). ``extra_cols`` threads additional document
    columns (e.g. ``", source"``) through both CTEs — the SQL twin of
    ``text_quality(keep=...)``."""
    return f"""w AS (
  SELECT doc_id{extra_cols}, n_chars, {words_sql()} AS ws,
         len(regexp_extract_all(text, '{PUNCT_RE}'))::BIGINT AS n_punct
  FROM documents
), m AS (
  SELECT doc_id{extra_cols}, n_chars, n_punct,
         len(ws)::BIGINT AS n_words,
         list_reduce(list_prepend(0::BIGINT, list_transform(ws, x -> length(x)::BIGINT)),
                     (acc, v) -> acc + v) AS char_sum,
         len(list_filter(ws, x -> list_contains({_STOP_SQL}, x)))::BIGINT AS n_stop
  FROM w
)"""


TEXT_QUALITY_SQL = f"""
WITH {quality_cte_sql()}
SELECT doc_id, n_words,
       char_sum::DOUBLE / n_words::DOUBLE AS avg_word_len,
       n_stop::DOUBLE / n_words::DOUBLE AS stop_ratio,
       n_punct::DOUBLE / n_chars::DOUBLE AS punct_ratio,
       {QUALITY_SCORE_SQL} AS quality_score
FROM m
"""


def lang_id_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language ID: score = count of per-language function
    words, argmax with alphabetical tie-break. Map-side only."""
    d = load(spark, sf_dir, "documents", widen=True)
    ws = words_col()
    def score_col(markers: list[str]) -> F.Column:
        # closure, not a default arg (PySpark HOFs dispatch on lambda arity)
        arr = F.array(*[F.lit(x) for x in markers])
        return F.size(F.filter(ws, lambda w: F.array_contains(arr, w))).cast("long")

    scores = {lang: score_col(markers) for lang, markers in LANG_MARKERS.items()}
    scored = d.select(
        "doc_id", "lang", *[scores[lang].alias(f"s_{lang}") for lang in LANGS]
    )
    mx = F.greatest(*[F.col(f"s_{lang}") for lang in LANGS])
    pred = F.lit(None).cast("string")
    for lang in reversed(LANGS):
        pred = F.when(F.col(f"s_{lang}") == mx, F.lit(lang)).otherwise(pred)
    return scored.select(
        "doc_id",
        pred.alias("pred_lang"),
        mx.alias("score"),
        (pred == F.col("lang")).alias("matches_label"),
    )


def _lang_sql() -> str:
    score_exprs = ",\n    ".join(
        "len(list_filter(ws, x -> list_contains([{m}], x)))::BIGINT AS s_{lang}".format(
            m=", ".join(f"'{x}'" for x in LANG_MARKERS[lang]), lang=lang
        )
        for lang in LANGS
    )
    mx = "greatest(" + ", ".join(f"s_{lang}" for lang in LANGS) + ")"
    pred = "CASE " + " ".join(
        f"WHEN s_{lang} = {mx} THEN '{lang}'" for lang in LANGS
    ) + " END"
    return f"""
WITH w AS (
  SELECT doc_id, lang, {words_sql()} AS ws FROM documents
), s AS (
  SELECT doc_id, lang,
    {score_exprs}
  FROM w
)
SELECT doc_id, {pred} AS pred_lang, {mx} AS score,
       ({pred} = lang) AS matches_label
FROM s
"""


LANG_ID_NGRAM_SQL = _lang_sql()


def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokens + BPE-ish regex tokens ([A-Za-z]+ | digits |
    single other char) + chars-per-token — the budget estimator for a
    tokenizer-bound pipeline."""
    d = load(spark, sf_dir, "documents", widen=True)
    ws_tokens = F.size(words_col()).cast("long")
    bpe_tokens = F.size(F.regexp_extract_all("text", F.lit(BPE_RE), 0)).cast("long")
    return d.select(
        "doc_id",
        ws_tokens.alias("ws_tokens"),
        bpe_tokens.alias("bpe_tokens"),
        (F.col("n_chars").cast("double") / bpe_tokens.cast("double")).alias(
            "chars_per_token"
        ),
    )


TOKEN_COUNT_SQL = rf"""
SELECT doc_id,
       len({words_sql()})::BIGINT AS ws_tokens,
       len(regexp_extract_all(text, '{BPE_RE}'))::BIGINT AS bpe_tokens,
       n_chars::DOUBLE / len(regexp_extract_all(text, '{BPE_RE}'))::BIGINT::DOUBLE
         AS chars_per_token
FROM documents
"""

# Polynomial rolling-hash fingerprint parameters. Bounds keep every
# intermediate strictly inside int64 in both engines (no wraparound
# dependence): acc < 2^30, word hash < 2^20, mult < 2^20 ⇒
# acc*mult + h < 2^50.
FP_MULT = 1_000_003
FP_WORD_MOD = 1 << 20
FP_MOD = 1 << 30


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive document fingerprint: left-fold polynomial hash
    over the word sequence — equal fingerprints ⟹ (w.h.p.) same word
    sequence; used as a cheap shard-local pre-dedup key."""
    d = load(spark, sf_dir, "documents", widen=True)
    hs = F.transform(words_col(), lambda w: h64(w, "fp") % F.lit(FP_WORD_MOD))
    fp = F.aggregate(
        hs,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * F.lit(FP_MULT) + h) % F.lit(FP_MOD),
    )
    return d.select("doc_id", fp.alias("fingerprint"))


DOC_FINGERPRINT_SQL = f"""
WITH w AS (
  SELECT doc_id,
         list_transform({words_sql()}, x -> {h64_sql('x', 'fp')} % {FP_WORD_MOD}) AS hs
  FROM documents
)
SELECT doc_id,
       list_reduce(list_prepend(0::BIGINT, hs),
                   (acc, h) -> (acc * {FP_MULT} + h) % {FP_MOD}) AS fingerprint
FROM w
"""


# Eval-set decontamination: n-gram size and the deterministic stand-in
# benchmark sample (every 50th doc plays the held-out eval set).
DECON_N = 8
BENCH_STRIDE = 50


def _gram_hashes(ws: F.Column, width: int, seed: str) -> F.Column:
    """Hashes of all ``width``-word shingles of a word array — empty
    when the doc is shorter than one shingle (NB: a bare
    ``sequence(1, n-k)`` would run DESCENDING for short docs, Spark
    auto-reverses; the ``when`` guard is load-bearing)."""
    n = F.size(ws)
    return F.when(
        n >= F.lit(width),
        F.transform(
            F.sequence(F.lit(1), n - F.lit(width - 1)),
            lambda i: h64(F.concat_ws(" ", F.slice(ws, i, width)), seed),
        ),
    ).otherwise(F.array().cast("array<long>"))


def decontaminate_ngram_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training/eval decontamination: flag corpus docs sharing any
    8-word shingle with the benchmark set (docs ``doc_id % 50 == 0``
    stand in for the eval suite). Returns contaminated non-benchmark
    docs with their distinct-hit counts — the rows a pipeline would
    drop or audit before training.

    Plan: benchmark shingle hashes are DISTINCT'd then broadcast (an
    eval suite is tiny next to a corpus), so the corpus side is one
    scan → explode → broadcast semi-probe → per-doc count; the only
    wide shuffle is the final per-doc aggregation, partial-agged."""
    d = load(spark, sf_dir, "documents", widen=True)
    ws = words_col()
    grams = d.select(
        "doc_id", F.explode(_gram_hashes(ws, DECON_N, "decon")).alias("g")
    )
    bench = (
        grams.filter(F.col("doc_id") % BENCH_STRIDE == 0)
        .select("g")
        .distinct()
    )
    return (
        grams.filter(F.col("doc_id") % BENCH_STRIDE != 0)
        .join(F.broadcast(bench), "g", "left_semi")
        .groupBy("doc_id")
        .agg(F.count_distinct("g").alias("n_hits"))
    )


def _grams_sql(width: int, seed: str) -> str:
    """DuckDB twin of ``_gram_hashes``: range(1, n-k+1) is empty when
    n < width (half-open upper bound), matching the Spark guard."""
    shingle = f"array_to_string(list_slice(ws, i, i + {width - 1}), ' ')"
    return (
        f"list_transform(range(1, greatest(len(ws) - {width - 1}, 0) + 1), "
        f"i -> {h64_sql(shingle, seed)})"
    )


DECONTAMINATE_SQL = f"""
WITH w AS (
  SELECT doc_id, {words_sql()} AS ws FROM documents
), grams AS (
  SELECT doc_id, unnest({_grams_sql(DECON_N, 'decon')}) AS g
  FROM w
), bench AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % {BENCH_STRIDE} = 0
)
SELECT doc_id, count(DISTINCT g)::BIGINT AS n_hits
FROM grams
WHERE doc_id % {BENCH_STRIDE} <> 0
  AND g IN (SELECT g FROM bench)
GROUP BY doc_id
"""


# Containment threshold as an integer rational (n_shared/n_bench ≥ 1/2)
# — the repo convention: thresholds compare in integers on both engine
# and oracle sides, never through a float literal.
CONTAIN_NUM, CONTAIN_DEN = 1, 2


def decontaminate_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leak SEVERITY scoring, the asymmetric complement of the two
    decontamination audits above: for each (corpus doc, benchmark doc)
    pair, the CONTAINMENT of the benchmark in the doc —
    |grams(bench) ∩ grams(doc)| / |grams(bench)| over verbatim
    8-grams — kept where ≥ 1/2. This is the measure that catches a
    SHORT eval item quoted inside a LONG training document: such a
    pair's Jaccard is tiny (length mismatch), so symmetric near-dup
    dedup and MinHash banding (which approximates Jaccard) both miss
    it, while nearly all of the benchmark's 8-grams appearing verbatim
    is exactly what "the eval leaked" means.

    100 TB shape: the benchmark gram index and its per-doc sizes are
    eval-suite-small → broadcast both; the corpus side is one scan →
    gram explode → broadcast equi-join → partial-agged (doc, bench)
    counts. No corpus×corpus work anywhere; output rows ≤ corpus hits
    against the suite."""
    from argus_spark.datapipe.scoped_cache import scoped_cache

    d = load(spark, sf_dir, "documents", widen=True)
    # Scoped-cached: the gram explode feeds the benchmark slice (twice:
    # sizes + probe index) and the corpus probe side.
    grams = scoped_cache(
        d.select(
            "doc_id",
            F.explode(
                F.array_distinct(_gram_hashes(words_col(), DECON_N, "decon"))
            ).alias("g"),
        )
    )
    bench = grams.filter(F.col("doc_id") % BENCH_STRIDE == 0).select(
        F.col("doc_id").alias("bench_id"), "g"
    )
    n_bench = bench.groupBy("bench_id").agg(F.count(F.lit(1)).alias("n_bench"))
    hits = (
        grams.filter(F.col("doc_id") % BENCH_STRIDE != 0)
        .join(F.broadcast(bench), "g")
        .groupBy("doc_id", "bench_id")
        # grams are distinct per doc on both sides → count = |∩|
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        hits.join(F.broadcast(n_bench), "bench_id")
        .filter(
            F.col("n_shared") * F.lit(CONTAIN_DEN)
            >= F.col("n_bench") * F.lit(CONTAIN_NUM)
        )
        .select(
            "doc_id", "bench_id", "n_shared", "n_bench",
            (
                F.col("n_shared").cast("double")
                / F.col("n_bench").cast("double")
            ).alias("containment"),
        )
    )


DECONTAMINATE_CONTAINMENT_SQL = f"""
WITH w AS (
  SELECT doc_id, {words_sql()} AS ws FROM documents
), grams AS (
  SELECT DISTINCT doc_id, unnest({_grams_sql(DECON_N, 'decon')}) AS g FROM w
), bench AS (
  SELECT doc_id AS bench_id, g FROM grams WHERE doc_id % {BENCH_STRIDE} = 0
), nb AS (
  SELECT bench_id, count(*)::BIGINT AS n_bench FROM bench GROUP BY bench_id
), hits AS (
  SELECT c.doc_id, b.bench_id, count(*)::BIGINT AS n_shared
  FROM grams c JOIN bench b USING (g)
  WHERE c.doc_id % {BENCH_STRIDE} <> 0
  GROUP BY c.doc_id, b.bench_id
)
SELECT h.doc_id, h.bench_id, h.n_shared, nb.n_bench,
       h.n_shared::DOUBLE / nb.n_bench::DOUBLE AS containment
FROM hits h JOIN nb USING (bench_id)
WHERE h.n_shared * {CONTAIN_DEN} >= nb.n_bench * {CONTAIN_NUM}
"""

NOV_N = 5  # novelty shingle width


def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc NOVELTY against the corpus in doc_id order: the
    fraction of a doc's distinct ``NOV_N``-grams whose FIRST corpus
    occurrence (min doc_id) is this doc. A curation signal with two
    standard uses: low-novelty docs late in a crawl are near-copies /
    boilerplate even when no single pair crosses a dedup threshold
    (cumulative, not pairwise), and the corpus-level novelty curve is
    the diminishing-returns diagnostic for "is more of this source
    still adding new text".

    100 TB shape (r15 restructure, guide §2.3/§2.4): one gram explode
    → one partial-agged min(doc_id) per gram (the inverted-index
    shuffle, uniform md5 keys); per-doc NOVEL counts are then a
    re-aggregation of that vocab-sized frame by ``first_doc`` — the
    corpus-sized grams⋈first equi-join the old shape paid (a sort of
    every (doc, gram) row against the gram vocabulary) is gone,
    because "number of grams whose first_doc is d" never needed the
    join: it is a groupBy over the FIRST table alone. Per-doc TOTAL
    gram counts are a partial-agged rollup of the cached gram frame,
    and the two doc-keyed aggregates meet in a doc-level join (vocab-
    and doc-sized inputs — both tiny next to the occurrence stream).
    Docs all of whose grams first occur elsewhere get n_novel = 0 via
    the left join's coalesce, exactly the old sum(when(...)) = 0 row.
    Bit-exact: counts of the same disjoint row partitions, the one
    closing division unchanged."""
    from argus_spark.datapipe.scoped_cache import scoped_cache

    d = load(spark, sf_dir, "documents", widen=True)
    # Scoped-cached: the exploded gram frame feeds both the
    # first-occurrence agg and the per-doc total rollup — cache or the
    # md5 shingle pass runs twice.
    grams = scoped_cache(
        d.select(
            "doc_id",
            F.explode(
                F.array_distinct(_gram_hashes(words_col(), NOV_N, "nov"))
            ).alias("g"),
        )
    )
    first = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    novel = first.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("long").alias("n_novel")
    )
    totals = grams.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams")
    )
    return (
        totals.join(novel, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce(F.col("n_novel"), F.lit(0).cast("long")).alias(
                "n_novel"
            ),
        )
        .select(
            "doc_id", "n_grams", "n_novel",
            (
                F.col("n_novel").cast("double")
                / F.col("n_grams").cast("double")
            ).alias("novelty"),
        )
    )


NGRAM_NOVELTY_SQL = f"""
WITH w AS (
  SELECT doc_id, {words_sql()} AS ws FROM documents
), grams AS (
  SELECT DISTINCT doc_id, unnest({_grams_sql(NOV_N, 'nov')}) AS g FROM w
), first AS (
  SELECT g, min(doc_id) AS first_doc FROM grams GROUP BY g
)
SELECT doc_id, count(*)::BIGINT AS n_grams,
       CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       CAST(sum(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
         ::DOUBLE / count(*)::DOUBLE AS novelty
FROM grams JOIN first USING (g)
GROUP BY doc_id
"""

REP_N = 3  # repetition shingle size
REP_TAU = 0.2


def repetition_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signal: fraction of a doc's 3-word
    shingles taken by its single most-repeated shingle; ``repetitive``
    flags ratio > 0.2. Degenerate docs (< one shingle) are excluded
    (no signal). One explode → per-(doc,gram) partial-agged count →
    per-doc max/sum — all shuffles partial-aggregate first."""
    d = load(spark, sf_dir, "documents", widen=True)
    ws = words_col()
    grams = d.select(
        "doc_id", F.explode(_gram_hashes(ws, REP_N, "rep")).alias("g")
    )
    per_gram = grams.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    per_doc = per_gram.groupBy("doc_id").agg(
        F.max("c").alias("max_rep"),
        F.sum("c").alias("n_grams"),
    )
    return per_doc.select(
        "doc_id",
        "max_rep",
        "n_grams",
        (F.col("max_rep").cast("double") / F.col("n_grams").cast("double")).alias(
            "rep_ratio"
        ),
        (
            F.col("max_rep").cast("double") / F.col("n_grams").cast("double")
            > F.lit(REP_TAU)
        ).alias("repetitive"),
    )


REPETITION_SQL = f"""
WITH w AS (
  SELECT doc_id, {words_sql()} AS ws FROM documents
), grams AS (
  SELECT doc_id, unnest({_grams_sql(REP_N, 'rep')}) AS g
  FROM w
), per_gram AS (
  SELECT doc_id, g, count(*)::BIGINT AS c FROM grams GROUP BY doc_id, g
), per_doc AS (
  SELECT doc_id, max(c)::BIGINT AS max_rep, sum(c)::BIGINT AS n_grams
  FROM per_gram GROUP BY doc_id
)
SELECT doc_id, max_rep, n_grams,
       max_rep::DOUBLE / n_grams::DOUBLE AS rep_ratio,
       (max_rep::DOUBLE / n_grams::DOUBLE > {REP_TAU}) AS repetitive
FROM per_doc
"""


# Cleaning patterns — ASCII-only classes so Java regex (Spark) and RE2
# (DuckDB) agree byte-for-byte.
URL_RE = r"https?://[^\s]+"
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
WS_RE = r"[ \t]+"


def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard pre-training cleanup: lowercase, URL/email scrub
    (placeholder tokens keep token positions auditable), whitespace
    collapse + trim. Pure map-side regexp chain — one scan, no
    shuffle, whole-stage codegen."""
    d = load(spark, sf_dir, "documents", widen=True)
    t = F.lower(F.col("text"))
    t = F.regexp_replace(t, URL_RE, "<url>")
    t = F.regexp_replace(t, EMAIL_RE, "<email>")
    t = F.trim(F.regexp_replace(t, WS_RE, " "))
    return d.select(
        "doc_id",
        t.alias("clean_text"),
        F.length(t).alias("clean_chars"),
        (F.length(t) < F.col("n_chars")).alias("shrunk"),
    )


TEXT_NORMALIZE_SQL = f"""
WITH c AS (
  SELECT doc_id, n_chars,
         trim(regexp_replace(
           regexp_replace(
             regexp_replace(lower(text), '{URL_RE}', '<url>', 'g'),
             '{EMAIL_RE}', '<email>', 'g'),
           '{WS_RE}', ' ', 'g')) AS clean_text
  FROM documents
)
SELECT doc_id, clean_text,
       length(clean_text)::BIGINT AS clean_chars,
       (length(clean_text) < n_chars) AS shrunk
FROM c
"""


WIN_K = 5  # winnowing: shingle width (words)
WIN_W = 4  # winnowing: window of consecutive shingle hashes


def winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every WIN_K-word shingle,
    slide a WIN_W-window over the shingle-hash stream, keep each
    window's MINIMUM — guaranteeing at least one shared fingerprint
    for any matching passage of ≥ WIN_K+WIN_W−1 words while storing
    only ~2/(WIN_W+1) of the shingles. The sparse, position-robust
    complement to ``doc_fingerprint`` (one hash per doc) and
    ``dedup_exact_substring`` (every window hashed): downstream
    substring-overlap joins meet on fingerprints that survive
    insertions outside the match.

    Selection is by hash VALUE (min of the window), so tie handling
    needs no positional rule and both engines agree exactly. Map-only:
    shingle hashing, window minima, and per-doc distinct all happen
    inside one projection — zero shuffles at any scale; output is the
    exploded (doc_id, fp) fingerprint index. Scaling, measured
    (BENCH_SCALE.md, r7, 5k→50k docs): wall exponent ≈ 0.6-0.7 at
    output exponent 1.0 — the map-only control row for the run."""
    d = load(spark, sf_dir, "documents", widen=True).select(
        "doc_id", words_col().alias("ws")
    )
    # Materialize the shingle-hash array once per row (a named column,
    # not an inlined expression — Catalyst would otherwise recompute
    # the md5 pass per window), then take window minima via WIN_W
    # element reads per window. The earlier slice()+array_min form
    # allocated a fresh 4-element array per window inside an
    # interpreted HOF — measured 8.5s at sf0.1 vs ~1s for this form.
    h = d.select("doc_id", _gram_hashes(F.col("ws"), WIN_K, "win").alias("hs"))
    hs = F.col("hs")
    nh = F.size(hs)
    win_min = lambda i: F.least(  # noqa: E731
        *[F.element_at(hs, i + F.lit(k)) for k in range(WIN_W)]
    )
    mins = (
        F.when(
            nh >= F.lit(WIN_W),
            F.transform(F.sequence(F.lit(1), nh - F.lit(WIN_W - 1)), win_min),
        )
        # short doc: fewer shingles than one window → one global-min fp
        .when(nh > F.lit(0), F.array(F.array_min(hs)))
        .otherwise(F.array().cast("array<long>"))
    )
    return h.select(
        "doc_id", F.explode(F.array_distinct(mins)).alias("fp")
    )


WINNOW_FINGERPRINTS_SQL = f"""
WITH d AS (
  SELECT doc_id, {words_sql()} AS ws FROM documents
), h AS (
  SELECT doc_id, {_grams_sql(WIN_K, 'win')} AS hs FROM d
), m AS (
  SELECT doc_id,
         CASE
           WHEN len(hs) >= {WIN_W} THEN
             list_transform(range(1, len(hs) - {WIN_W - 1} + 1),
                            i -> list_min(hs[i:i + {WIN_W - 1}]))
           WHEN len(hs) > 0 THEN [list_min(hs)]
           ELSE []::BIGINT[]
         END AS mins
  FROM h
)
SELECT doc_id, unnest(list_distinct(mins)) AS fp FROM m
"""


WP_MAXDF = 16      # fingerprint document-frequency cut (boilerplate)
WP_MIN_SHARED = 2  # pairs must share at least this many fingerprints


def winnow_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The detection half of the winnowing story (MOSS, SIGMOD'03):
    ``winnow_fingerprints`` builds the index; this reports doc PAIRS
    sharing ≥ WP_MIN_SHARED selected fingerprints — the plagiarism /
    near-copy candidates a winnowing system actually surfaces.

    Same scale discipline as ``dedup_exact_substring``: fingerprints
    appearing in > WP_MAXDF docs are boilerplate and are cut BEFORE
    the self-join (the df agg is partial-agged, the cut bounds any
    fingerprint's pair fan-out at WP_MAXDF²); the pair join is equi on
    the fingerprint with both sides hash-partitioned by it, and the
    final (doc_a, doc_b) count is partial-agged. Within the df-cut
    the result is exact."""
    # Scoped-cached: the fingerprint frame's computation (the winnow
    # HOF pass) feeds THREE plan branches (df-cut + both join sides) —
    # without the cache Catalyst recomputes it per branch (the r6
    # candidate-materialization root cause).
    from argus_spark.datapipe.scoped_cache import scoped_cache

    fps = scoped_cache(winnow_fingerprints(spark, sf_dir))
    keep = (
        fps.groupBy("fp")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= WP_MAXDF)
        .select("fp")
    )
    pruned = fps.join(keep, "fp")
    a, b = pruned.alias("a"), pruned.alias("b")
    return (
        a.join(b, "fp")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= WP_MIN_SHARED)
    )


WINNOW_OVERLAP_PAIRS_SQL = f"""
WITH base AS ({WINNOW_FINGERPRINTS_SQL}),
keep AS (
  SELECT fp FROM base GROUP BY fp HAVING count(*) <= {WP_MAXDF}
), pruned AS (
  SELECT doc_id, fp FROM base JOIN keep USING (fp)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS n_shared
FROM pruned a JOIN pruned b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING count(*) >= {WP_MIN_SHARED}
"""


def corpus_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card rollup: per-source doc count, token mass, and mean
    composite quality — the summary table a curation run publishes
    alongside its shards (mixture accounting + quality drift watch).

    One scan (quality features are map-side, source threaded through
    ``text_quality(keep=...)``) + one partial-aggregated groupBy on
    ~20 source keys. The quality mean uses the module's fixed-point
    convention (floor(q·10⁶) BIGINT sum → two correctly-rounded
    closing divisions) so the double is bit-identical cross-engine
    despite being an order-free distributed sum."""
    from argus_spark.operators.relational import FX, _fx

    q = text_quality(spark, sf_dir, keep=("source",))
    return (
        q.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_tokens"),
            F.sum(_fx(F.col("quality_score"))).alias("_sq"),
        )
        .select(
            "source",
            "n_docs",
            "n_tokens",
            (
                (F.col("_sq").cast("double") / F.lit(float(FX)))
                / F.col("n_docs").cast("double")
            ).alias("mean_quality"),
        )
    )


CORPUS_STATS_BY_SOURCE_SQL = f"""
WITH {quality_cte_sql(extra_cols=", source")},
q AS (
  SELECT doc_id, source, n_words, {QUALITY_SCORE_SQL} AS qs FROM m
)
SELECT source,
       count(*)::BIGINT AS n_docs,
       CAST(sum(n_words) AS BIGINT) AS n_tokens,
       (CAST(sum(CAST(floor(qs * 1000000.0) AS BIGINT)) AS DOUBLE)
          / 1000000.0) / count(*)::DOUBLE AS mean_quality
FROM q GROUP BY source
"""


HH_SUPPORT = 0.005  # heavy-hitter threshold: > 0.5% of all tokens


def heavy_hitter_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus heavy-hitter tokens with a SKETCH CONTRACT check — the
    stop-token discovery step that feeds df-cuts (exact-substring
    dedup) and PPJoin prefix ordering.

    Two faces, same pattern as ``approx_distinct_users``: the
    streaming-friendly sketch is ``df.stat.freqItems`` (Karp et al.
    one-pass counter summary — map-side partial merge, ≤ 1/support
    cells of state, the shape that survives 100 TB where an exact
    groupBy would be the fallback, not the default); the EXACT side
    (one partial-agged groupBy) is what the oracle can verify. The
    published contract is freqItems' superset guarantee — every token
    with frequency > support·n must appear in the sketch result —
    emitted as the ``in_sketch`` boolean the oracle pins to TRUE.
    Token counts are Zipfian, so this is non-vacuous at every harness
    SF (30 heavy tokens above 0.5%)."""
    tok = (
        load(spark, sf_dir, "documents", widen=True)
        .select(F.explode(words_col()).alias("tok"))
    )
    # one-pass sketch; result is ONE driver row holding ≤ 1/support items
    sketch = set(tok.stat.freqItems(["tok"], HH_SUPPORT).first()[0])
    # The exact side is ONE corpus pass: the total token count n is the
    # SUM over the grouped counts (a vocab-sized frame), joined back as
    # a one-row broadcast — both branches share the identical
    # hashpartitioning(tok) exchange, which Catalyst dedupes via
    # ReuseExchange, so the scan+explode+partial-agg runs once (the
    # plan gate asserts the ReusedExchange). A separate driver-side
    # tok.count() here cost a full third corpus pass.
    counts = tok.groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )
    total = counts.agg(
        F.sum("n_occurrences").cast("long").alias("n_total")
    )
    # integer-rational threshold (count*1000 > 5*n ⟺ count > 0.005n),
    # matching the PPJoin convention: filters in integer rationals,
    # never float, so Spark and the oracle agree bit-for-bit at any n
    exact = (
        counts.join(F.broadcast(total))
        .filter(
            F.col("n_occurrences") * F.lit(1000) > F.lit(5) * F.col("n_total")
        )
    )
    return exact.select(
        "tok",
        "n_occurrences",
        F.col("tok").isin(sketch).alias("in_sketch"),
    )


HEAVY_HITTER_TOKENS_SQL = f"""
WITH t AS (
  SELECT unnest({words_sql()}) AS tok FROM documents
)
SELECT tok, count(*)::BIGINT AS n_occurrences, TRUE AS in_sketch
FROM t GROUP BY tok
HAVING count(*) * 1000 > 5 * (SELECT count(*) FROM t)
"""


def source_token_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source vocabulary overlap: Jaccard similarity between the
    distinct-token sets of every source pair — the corpus-composition
    diagnostic that flags near-duplicate sources (a mirrored crawl, a
    re-scraped site) before mixture weights are assigned.

    Plan at 100 TB: (source, tok) distinct is ONE map-side-PARTIAL
    aggregate on uniform composite keys; per-source vocab sizes land in
    a |sources|-row frame that broadcasts; the pair expansion is a
    self-equi-join ON tok whose per-token fan-out is bounded by
    |sources|² (≤400 here) — never all-pairs over rows — and the pair
    rollup has ≤ C(|sources|,2) output groups. Jaccard is exact small-
    integer arithmetic with one closing IEEE division."""
    # NOT scoped-cached (r14, measured): the three consumers (sizes +
    # both self-join sides) share ONE identical aggregate subtree that
    # ReuseExchange already dedups — the scan/explode/partial-agg runs
    # once and each branch re-runs only the cheap post-shuffle final
    # agg. Caching replaced that with an InMemoryRelation
    # materialization of a wide (string, string) frame and measured
    # SLOWER (0.7 → 1.2 s at sf0.1).
    tok = (
        load(spark, sf_dir, "documents", widen=True)
        .select("source", F.explode(words_col()).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.lit(1))
        .select("source", "tok")
    )
    sizes = tok.groupBy("source").agg(F.count(F.lit(1)).alias("n_vocab"))
    a = tok.select(F.col("source").alias("source_a"), "tok")
    b = tok.select(F.col("source").alias("source_b"), "tok")
    shared = (
        a.join(b, "tok")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared"))
    )
    sa = sizes.select(
        F.col("source").alias("source_a"), F.col("n_vocab").alias("n_a")
    )
    sb = sizes.select(
        F.col("source").alias("source_b"), F.col("n_vocab").alias("n_b")
    )
    return (
        shared.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            (
                F.col("n_shared").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")).cast("double")
            ).alias("jaccard"),
        )
    )


SOURCE_TOKEN_OVERLAP_SQL = f"""
WITH tok AS (
  SELECT DISTINCT source, tok
  FROM (SELECT source, unnest({words_sql()}) AS tok FROM documents)
), sizes AS (
  SELECT source, count(*)::BIGINT AS n_vocab FROM tok GROUP BY source
), shared AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*)::BIGINT AS n_shared
  FROM tok a JOIN tok b ON a.tok = b.tok AND a.source < b.source
  GROUP BY a.source, b.source
)
SELECT source_a, source_b, n_shared,
       sa.n_vocab AS n_a, sb.n_vocab AS n_b,
       n_shared::DOUBLE / (sa.n_vocab + sb.n_vocab - n_shared)::DOUBLE AS jaccard
FROM shared
JOIN sizes sa ON sa.source = source_a
JOIN sizes sb ON sb.source = source_b
"""


TTS_TOP_K = 5
TTS_MIN_COUNT = 5  # rare-token noise floor


def top_terms_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinctive terms: the top-K tokens by rate ratio
    (within-source rate ÷ corpus rate) — the "what is this source
    about" line of a dataset card, complementing the per-DOC
    ``tfidf_top_terms``. Tokens under TTS_MIN_COUNT occurrences in the
    source are dropped (rare-token ratios are noise).

    Determinism: the ratio c_s(t)·N / (N_s·c(t)) is a division of two
    exact BIGINT products (< 2⁵³ here ⇒ the double is correctly
    rounded and engine-identical; at 100 TB move the products to
    DECIMAL(38,0) — the wbern precedent); the ranking order
    (ratio DESC, tok ASC) is total either way.

    Plan: ONE map-side-PARTIAL (source, tok) count; corpus counts and
    source totals are re-aggregations of that small frame; the one-row
    corpus total and the |sources|-row totals broadcast; the final
    per-source top-K is a window over ≤ |sources|·|vocab| rows."""
    from argus_spark.datapipe.scoped_cache import scoped_cache

    # Scoped-cached — r15 ADJUDICATION of the r14 driver regression
    # (verdict #1): interleaved quiet-host 32-core A/B under the
    # driver protocol, three invocations per arm — CACHED warm medians
    # 0.77/0.88/0.92 s vs UNCACHED 1.07/1.20/1.26 s (cache wins every
    # pairing by ~0.4 s); cold-path (flush between repeats) CACHED
    # 1.43 s vs UNCACHED 1.15 s. The driver times warm medians, so the
    # cache stays; its cold cost is now VISIBLE per query via the
    # bench_full.json `cold` row (r14 verdict #3). The ReuseExchange-
    # overhead hypothesis for the driver's 1.26 s did NOT reproduce —
    # the uncached arm measures ~1.2 s here, i.e. the driver's number
    # matches the UNCACHED cost profile of its slower host, not a
    # cache pathology. Unlike source_token_overlap's (source, tok)
    # DISTINCT frame (cache measured slower, note above), this frame
    # is re-CONSUMED by post-exchange aggregates 3× and is vocab-sized
    # at any corpus scale — the scale-correct thing to pin.
    st = scoped_cache(
        load(spark, sf_dir, "documents", widen=True)
        .select("source", F.explode(words_col()).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("long").alias("c_st"))
    )
    src_tot = st.groupBy("source").agg(F.sum("c_st").cast("long").alias("n_s"))
    tok_tot = st.groupBy("tok").agg(F.sum("c_st").cast("long").alias("c_t"))
    # r15: the one-row corpus total re-aggregates the |sources|-row
    # src_tot frame, not a FOURTH full branch over st — Σ_s Σ_t c_st
    # = Σ c_st exactly (BIGINT sums), one less final-agg pass.
    corpus_tot = src_tot.agg(F.sum("n_s").cast("long").alias("n"))
    scored = (
        st.filter(F.col("c_st") >= TTS_MIN_COUNT)
        .join(F.broadcast(src_tot), "source")
        .join(tok_tot, "tok")
        .crossJoin(F.broadcast(corpus_tot))  # one-row corpus total
        .withColumn(
            "rate_ratio",
            (F.col("c_st") * F.col("n")).cast("double")
            / (F.col("n_s") * F.col("c_t")).cast("double"),
        )
    )
    w = Window.partitionBy("source").orderBy(
        F.desc("rate_ratio"), F.asc("tok")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= TTS_TOP_K)
        .select(
            "source",
            "tok",
            F.col("c_st").alias("n_in_source"),
            "rate_ratio",
            F.col("rk").cast("long").alias("rk"),
        )
    )


TOP_TERMS_BY_SOURCE_SQL = f"""
WITH st AS (
  SELECT source, tok, count(*)::BIGINT AS c_st
  FROM (SELECT source, unnest({words_sql()}) AS tok FROM documents)
  GROUP BY source, tok
), src_tot AS (
  SELECT source, CAST(sum(c_st) AS BIGINT) AS n_s FROM st GROUP BY source
), tok_tot AS (
  SELECT tok, CAST(sum(c_st) AS BIGINT) AS c_t FROM st GROUP BY tok
), corpus_tot AS (SELECT CAST(sum(c_st) AS BIGINT) AS n FROM st),
scored AS (
  SELECT st.source, st.tok, st.c_st,
         (st.c_st * n)::DOUBLE / (n_s * c_t)::DOUBLE AS rate_ratio
  FROM st
  JOIN src_tot USING (source) JOIN tok_tot USING (tok) CROSS JOIN corpus_tot
  WHERE st.c_st >= {TTS_MIN_COUNT}
)
SELECT source, tok, c_st AS n_in_source, rate_ratio, rk::BIGINT AS rk FROM (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY rate_ratio DESC, tok ASC) AS rk
  FROM scored
) WHERE rk <= {TTS_TOP_K}
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "heavy_hitter_tokens": heavy_hitter_tokens,
    "source_token_overlap": source_token_overlap,
    "top_terms_by_source": top_terms_by_source,
    "winnow_fingerprints": winnow_fingerprints,
    "winnow_overlap_pairs": winnow_overlap_pairs,
    "decontaminate_containment": decontaminate_containment,
    "ngram_novelty": ngram_novelty,
    "corpus_stats_by_source": corpus_stats_by_source,
    "text_normalize": text_normalize,
    "text_quality": text_quality,
    "lang_id_ngram": lang_id_ngram,
    "token_count": token_count,
    "doc_fingerprint": doc_fingerprint,
    "decontaminate_ngram_overlap": decontaminate_ngram_overlap,
    "repetition_ratio": repetition_ratio,
}

ORACLES: dict[str, str] = {
    "heavy_hitter_tokens": HEAVY_HITTER_TOKENS_SQL,
    "source_token_overlap": SOURCE_TOKEN_OVERLAP_SQL,
    "top_terms_by_source": TOP_TERMS_BY_SOURCE_SQL,
    "winnow_fingerprints": WINNOW_FINGERPRINTS_SQL,
    "winnow_overlap_pairs": WINNOW_OVERLAP_PAIRS_SQL,
    "decontaminate_containment": DECONTAMINATE_CONTAINMENT_SQL,
    "ngram_novelty": NGRAM_NOVELTY_SQL,
    "corpus_stats_by_source": CORPUS_STATS_BY_SOURCE_SQL,
    "text_normalize": TEXT_NORMALIZE_SQL,
    "text_quality": TEXT_QUALITY_SQL,
    "lang_id_ngram": LANG_ID_NGRAM_SQL,
    "token_count": TOKEN_COUNT_SQL,
    "doc_fingerprint": DOC_FINGERPRINT_SQL,
    "decontaminate_ngram_overlap": DECONTAMINATE_SQL,
    "repetition_ratio": REPETITION_SQL,
}
