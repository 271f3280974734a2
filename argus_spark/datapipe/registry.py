"""Datapipe query registry — union of the dedup / similarity / text /
multimodal surfaces for ``__spark_entry__.queries()``."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from argus_spark.datapipe import (
    clustering,
    curation,
    quantize,
    dedup,
    dsir,
    lm,
    multimodal,
    sampling,
    similarity,
    text,
    textprep,
)

# Ordered so the queries the round-1 correctness run never reached
# (text/sampling/similarity/multimodal, then dedup's clusters/cosine)
# register ahead of the already-green dedup quartet: the driver walks
# registry order under a wall-clock budget, so untested entries go first.
from argus_spark.streaming import replay

_MODULES = [
    textprep, clustering, quantize, dsir, lm, text, sampling, similarity,
    multimodal, dedup, replay, curation,
]

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}
for _m in _MODULES:
    QUERIES.update(_m.QUERIES)
    ORACLES.update(_m.ORACLES)
