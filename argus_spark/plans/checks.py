"""Plan-quality checks over ``df.explain('formatted')`` output.

Usage (tests or interactive tuning):

    plan = formatted_plan(df)
    assert pushed_filters(plan), "filter did not reach the scan"
    assert has_broadcast_hash_join(plan)
    assert n_shuffle_exchanges(plan) <= 1

These parse the stable, documented parts of the formatted explain
(node names, ``PushedFilters:``, ``ReadSchema:``) — the same strings a
human reads when tuning, so a failure message *is* the tuning hint.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(plan: str) -> list[str]:
    """Filters that reached a parquet scan (flattened across scans)."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            out.extend(p.strip() for p in body.split(","))
    return out


def read_schemas(plan: str) -> list[str]:
    """ReadSchema struct strings, one per scan — column-pruning proof."""
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", plan)]


def scan_columns(plan: str) -> set[str]:
    """Union of column names actually read from all scans."""
    cols: set[str] = set()
    for schema in read_schemas(plan):
        cols.update(re.findall(r"(\w+):", schema))
    return cols


def has_broadcast_hash_join(plan: str) -> bool:
    return "BroadcastHashJoin" in plan


def has_sort_merge_join(plan: str) -> bool:
    return "SortMergeJoin" in plan


def n_shuffle_exchanges(plan: str) -> int:
    """Hash/range shuffles only — round-robin repartitions (the local
    single-row-group fan-out in ``load()``) are excluded because they
    do not exist on a well-partitioned 100 TB layout."""
    n = 0
    for m in re.finditer(r"Arguments: (\w+)partitioning", plan):
        if m.group(1).lower() in ("hash", "range"):
            n += 1
    return n


def has_partial_aggregation(plan: str) -> bool:
    """Map-side combine: at least two HashAggregate nodes around the
    exchange (partial_ functions in the first)."""
    return plan.count("HashAggregate") >= 2 and "partial_" in plan


def wholestage_codegen_ids(plan: str) -> set[int]:
    return {int(m) for m in re.findall(r"WholeStageCodegen \((\d+)\)", plan)}
