"""Datapipe query registry — union of the dedup / similarity / text /
multimodal surfaces for ``__spark_entry__.queries()``."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from argus_spark.datapipe import dedup, multimodal, sampling, similarity, text

_MODULES = [dedup, similarity, text, multimodal, sampling]

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}
for _m in _MODULES:
    QUERIES.update(_m.QUERIES)
    ORACLES.update(_m.ORACLES)
