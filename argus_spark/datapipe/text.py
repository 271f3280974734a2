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

from pyspark.sql import DataFrame, SparkSession
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


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality signals: word count, mean word length, stopword
    ratio, punctuation ratio, and a fixed-weight composite score —
    the standard pre-training quality-filter features."""
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

TEXT_QUALITY_SQL = f"""
WITH w AS (
  SELECT doc_id, n_chars, {words_sql()} AS ws,
         len(regexp_extract_all(text, '{PUNCT_RE}'))::BIGINT AS n_punct
  FROM documents
), m AS (
  SELECT doc_id, n_chars, n_punct,
         len(ws)::BIGINT AS n_words,
         list_reduce(list_prepend(0::BIGINT, list_transform(ws, x -> length(x)::BIGINT)),
                     (acc, v) -> acc + v) AS char_sum,
         len(list_filter(ws, x -> list_contains({_STOP_SQL}, x)))::BIGINT AS n_stop
  FROM w
)
SELECT doc_id, n_words,
       char_sum::DOUBLE / n_words::DOUBLE AS avg_word_len,
       n_stop::DOUBLE / n_words::DOUBLE AS stop_ratio,
       n_punct::DOUBLE / n_chars::DOUBLE AS punct_ratio,
       (n_stop::DOUBLE / n_words::DOUBLE) * 0.4
       + (1.0 - n_punct::DOUBLE / n_chars::DOUBLE) * 0.3
       + least(n_words::DOUBLE / 100.0, 1.0) * 0.3 AS quality_score
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


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "text_quality": text_quality,
    "lang_id_ngram": lang_id_ngram,
    "token_count": token_count,
    "doc_fingerprint": doc_fingerprint,
}

ORACLES: dict[str, str] = {
    "text_quality": TEXT_QUALITY_SQL,
    "lang_id_ngram": LANG_ID_NGRAM_SQL,
    "token_count": TOKEN_COUNT_SQL,
    "doc_fingerprint": DOC_FINGERPRINT_SQL,
}
