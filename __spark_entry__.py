"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship §2.C UTxO-balance pipeline at
sf0.001; ``queries()`` / ``oracle_sql()`` expose every implemented
operator from SURVEY.md §2 with its DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: watched-address lovelace
    balances over the unspent UTxO set (SURVEY §2.C)."""
    from argus_spark.operators.utxo import watched_balances

    return watched_balances(spark, "/root/testdata/sf0.001")


def _modules():
    from argus_spark.operators import relational, skew, temporal, utxo

    # Datapipe first: the round-1 correctness run walked registry order
    # under a wall-clock budget and never reached the datapipe tail, so
    # the queries with no CORRECTNESS row yet now register ahead of the
    # already-green relational block.
    mods = []
    try:
        from argus_spark.datapipe import registry as dp_registry

        mods.append(dp_registry)
    except ImportError:
        pass
    mods.extend([relational, skew, temporal, utxo])
    return mods


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for m in _modules():
        out.update(m.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL per query key (same column names/aliases
    as the Spark result — the driver's compare is name-keyed)."""
    out: dict[str, str] = {}
    for m in _modules():
        out.update(m.ORACLES)
    return out
