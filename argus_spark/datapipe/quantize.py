"""Embedding quantization — the serving-prep stage of an ANN pipeline.

``embedding_quantize_int8``: per-dimension min/max (asymmetric linear)
int8 quantization of the ``embeddings`` corpus — the standard 4×
memory cut applied before building IVF/LSH serving indexes (float32 →
int8 codes + one tiny per-dimension scale table).

100 TB shape: pass 1 is ONE partially-aggregated min/max reduction
(64 mins + 64 maxes fold map-side; the exchange carries one row per
partition); the stats row is then broadcast back and quantization is
a pure MAP-SIDE elementwise transform — the corpus never shuffles.
This is the same one-row-broadcast pattern as the IVF codebook
(similarity.ann_ivf_topk).

Cross-engine determinism: quantization is elementwise IEEE arithmetic
on identical operands — ``floor((v[i]-mn[i]) * 254.0 / (mx[i]-mn[i]))
- 127`` evaluates in the same op order in Spark and DuckDB, so codes
match bit-exactly (no fold-order concerns: nothing is summed).
Constant dimensions (range 0) quantize to code 0 in both engines.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from argus_spark.datapipe.dedup import DIM, _as_double, _dot, _dot_sql
from argus_spark.datapipe.whiten_params import WHITEN_W
from argus_spark.session import load

Q_LEVELS = 254.0  # codes span [-127, 127]


def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension asymmetric int8 codes for every corpus vector,
    plus the per-vector code extrema as a quick sanity column pair."""
    e = load(spark, sf_dir, "embeddings", widen=True).select(
        "vec_id", _as_double("embedding").alias("v")
    )
    # r15 (guide §4 at the plan-construction boundary — the r14
    # ``_ec_bands_array_expr`` pattern): the two extrema arrays are
    # parsed as ONE SQL expression each instead of 2×DIM ``F.min``/
    # ``F.max`` ``Column`` constructions (128 Py4J round trips —
    # measured as the bulk of this query's 0.5 s construct phase).
    # Identical analyzed plan: ``v[i]`` is the same 0-based getItem.
    stats = e.agg(
        F.expr(
            "array(" + ", ".join(f"min(v[{i}])" for i in range(DIM)) + ")"
        ).alias("mn"),
        F.expr(
            "array(" + ", ".join(f"max(v[{i}])" for i in range(DIM)) + ")"
        ).alias("mx"),
    )
    num = F.zip_with(F.col("v"), F.col("mn"), lambda x, y: x - y)
    rng = F.zip_with(F.col("mx"), F.col("mn"), lambda x, y: x - y)
    codes = F.zip_with(
        num,
        rng,
        lambda x, y: F.when(y == F.lit(0.0), F.lit(0).cast("long")).otherwise(
            F.floor(x * F.lit(Q_LEVELS) / y) - F.lit(127)
        ),
    )
    # The driver's canonicalizer hashes scalar columns only (top-level
    # ArrayType output crashes it), so the code vector is registered as
    # a comma-joined string — lossless for int8 codes, and DuckDB's
    # array_to_string produces the identical text.
    return (
        e.crossJoin(F.broadcast(stats))  # one-row stats frame
        .select(
            "vec_id",
            F.array_join(
                F.transform(codes, lambda x: x.cast("string")), ","
            ).alias("q8_csv"),
            F.array_min(codes).alias("q_min"),
            F.array_max(codes).alias("q_max"),
        )
    )


EMBEDDING_QUANTIZE_INT8_SQL = f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
s AS (
  SELECT [{", ".join(f"min(v[{i + 1}])" for i in range(DIM))}] AS mn,
         [{", ".join(f"max(v[{i + 1}])" for i in range(DIM))}] AS mx
  FROM e
), q AS (
  SELECT vec_id,
         list_transform(range(1, {DIM + 1}),
           i -> CASE WHEN mx[i] - mn[i] = 0 THEN 0::BIGINT
                ELSE floor((v[i] - mn[i]) * {Q_LEVELS!r} / (mx[i] - mn[i]))::BIGINT
                     - 127 END) AS q8
  FROM e CROSS JOIN s
)
SELECT vec_id, array_to_string(q8, ',') AS q8_csv,
       list_min(q8)::BIGINT AS q_min, list_max(q8)::BIGINT AS q_max
FROM q
"""


# --------------------------------------------------------------------------
# Distributed Gram matrix — the PCA / whitening / covariance prep pass
# --------------------------------------------------------------------------

GRAM_FP = 1_000_000  # fixed-point scale for per-pair products


def _gram_batches(it):
    """Arrow-batch partial Gram: fold every batch of a partition into
    ONE d×d int64 accumulator, yield the upper triangle once at the
    end — the partition's entire contribution is 2,080 rows no matter
    how many vectors it held. Per-vector fixed-point flooring (not
    floor-after-sum) keeps the fold order-free: each (vector, i, j)
    term is an integer before anything is summed, so partition
    boundaries, batch sizes, and reduce order cannot change the total."""
    import numpy as np
    import pandas as pd

    d = None
    acc = None
    for pdf in it:
        if len(pdf) == 0:
            continue
        x = np.stack(pdf["v"].to_numpy()).astype(np.float64)
        if acc is None:
            d = x.shape[1]
            acc = np.zeros((d, d), dtype=np.int64)
        # per-vector outer products, floored to fixed point BEFORE the
        # sum (chunked so the n×d×d intermediate stays ~32 MB)
        for lo in range(0, x.shape[0], 1024):
            xb = x[lo : lo + 1024]
            outer = xb[:, :, None] * xb[:, None, :]
            acc += np.floor(outer * float(GRAM_FP)).astype(np.int64).sum(axis=0)
    if acc is None:
        return
    iu, ju = np.triu_indices(d)
    yield pd.DataFrame(
        {"i": iu.astype("int64"), "j": ju.astype("int64"),
         "gram_fp": acc[iu, ju]}
    )


def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle Gram matrix Σᵥ ⌊vᵢ·vⱼ·1e6⌋ over the embedding
    corpus — the one-pass aggregation behind PCA, ZCA whitening, and
    covariance-based OPQ rotation fitting. The d×d result is tiny by
    construction (d=64 → 2,080 cells); the whole job is getting there
    in ONE corpus pass with no corpus shuffle.

    100 TB shape: ``mapInPandas`` folds every partition into a single
    d×d int64 accumulator (Arrow-batched numpy, never row-at-a-time)
    and emits 2,080 partial rows per PARTITION — so the only exchange
    is a partial-agged sum over ≤ 2,080 × n_partitions skinny rows,
    i.e. the classic treeAggregate shape expressed declaratively. For
    d ≫ 64 the accumulator blocks into d/b × d/b tiles; the plan is
    unchanged.

    Determinism: each (vector, i, j) term is floored to fixed point
    BEFORE summation, so the total is an integer sum — order-free
    across partitions, batch sizes, and engines. Magnitude bound:
    |Σ ⌊vᵢvⱼ·1e6⌋| ≤ n·max|v|²·1e6 — int64-exact to n·max|v|² ≈ 9·10¹²,
    far past any embedding corpus this op would see (beyond that,
    shrink GRAM_FP — same op, coarser grid)."""
    e = load(spark, sf_dir, "embeddings", widen=True).select(
        _as_double("embedding").alias("v")
    )
    partials = e.mapInPandas(
        _gram_batches, schema="i long, j long, gram_fp long"
    )
    return (
        partials.groupBy("i", "j")
        .agg(F.sum("gram_fp").alias("gram_fp"))
    )


EMBEDDING_GRAM_MATRIX_SQL = f"""
WITH ex AS (
  SELECT vec_id, t.i AS i, embedding[t.i + 1]::DOUBLE AS ei
  FROM embeddings, unnest(range(0, {DIM})) AS t(i)
)
SELECT a.i AS i, b.i AS j,
       CAST(sum(floor(a.ei * b.ei * {float(GRAM_FP)!r})) AS BIGINT) AS gram_fp
FROM ex a JOIN ex b ON a.vec_id = b.vec_id AND a.i <= b.i
GROUP BY a.i, b.i
"""


# --------------------------------------------------------------------------
# PCA whitening projection — the registered consumer of the Gram matrix
# --------------------------------------------------------------------------


def embedding_whiten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCA-whitening projection of every corpus vector to W_DIM
    uncorrelated unit-second-moment components w0..w15 — the
    registered pipeline step the Gram matrix exists for (r11 verdict
    #4): whiten before OPQ rotation fitting, before cosine bucketing,
    or as the decorrelated input to downstream quality models.

    The whitening matrix is FIT OFFLINE (scripts/fit_whiten.py: one
    ``embedding_gram_matrix`` pass over the committed sf0.001 fit
    shard + a 64×64 ``numpy.linalg.eigh`` on the driver — pure
    control plane) and committed as literals (whiten_params.py), the
    standard fit-on-a-sample / apply-at-scale pattern. Fit provenance
    is pinned by tests/test_datapipe_units.py::TestWhitenFit, which
    recomputes the fit from the Spark-side Gram operator.

    100 TB shape: identical to ``embedding_project_rp`` — the literal
    matrix rides the plan, so this is a pure scan→project MAP-ONLY
    pass; zero shuffles (plan-gated). Cross-engine bit-exactness: same
    literals + the same ordered left-fold dot in both engines."""
    e = load(spark, sf_dir, "embeddings", widen=True).select(
        "vec_id", _as_double("embedding").alias("v")
    )
    # One parsed expression per component instead of W_DIM×DIM F.lit()
    # Py4J round trips (r14 opt — the _assign_flat lesson; same
    # left-fold dot, repr round-trips the fitted doubles exactly).
    def _w(k: int, w: list[float]) -> F.Column:
        arr = "array(" + ", ".join(f"{float(x)!r}D" for x in w) + ")"
        return F.expr(
            f"aggregate(zip_with(v, {arr}, (x, y) -> x * y), "
            "0.0D, (acc, t) -> acc + t)"
        ).alias(f"w{k}")

    return e.select(
        "vec_id", *[_w(k, w) for k, w in enumerate(WHITEN_W)]
    )


def _whiten_row_sql(w: list[float]) -> str:
    return "[" + ", ".join(repr(x) for x in w) + "]"


EMBEDDING_WHITEN_SQL = (
    "SELECT vec_id, "
    + ", ".join(
        f"{_dot_sql('v', _whiten_row_sql(w))} AS w{k}"
        for k, w in enumerate(WHITEN_W)
    )
    + " FROM (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)"
)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "embedding_quantize_int8": embedding_quantize_int8,
    "embedding_gram_matrix": embedding_gram_matrix,
    "embedding_whiten": embedding_whiten,
}

ORACLES: dict[str, str] = {
    "embedding_quantize_int8": EMBEDDING_QUANTIZE_INT8_SQL,
    "embedding_gram_matrix": EMBEDDING_GRAM_MATRIX_SQL,
    "embedding_whiten": EMBEDDING_WHITEN_SQL,
}
