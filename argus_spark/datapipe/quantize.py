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

from argus_spark.datapipe.dedup import DIM, _as_double
from argus_spark.session import load

Q_LEVELS = 254.0  # codes span [-127, 127]


def embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension asymmetric int8 codes for every corpus vector,
    plus the per-vector code extrema as a quick sanity column pair."""
    e = load(spark, sf_dir, "embeddings", widen=True).select(
        "vec_id", _as_double("embedding").alias("v")
    )
    stats = e.agg(
        F.array(*[F.min(F.col("v")[i]) for i in range(DIM)]).alias("mn"),
        F.array(*[F.max(F.col("v")[i]) for i in range(DIM)]).alias("mx"),
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


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "embedding_quantize_int8": embedding_quantize_int8,
}

ORACLES: dict[str, str] = {
    "embedding_quantize_int8": EMBEDDING_QUANTIZE_INT8_SQL,
}
