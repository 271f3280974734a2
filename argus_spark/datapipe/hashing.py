"""Cross-engine deterministic hashing primitives.

Spark's ``xxhash64``/``hash`` and DuckDB's ``hash`` disagree, so every
hash-dependent datapipe operator (MinHash, SimHash, fingerprints, LSH)
is built on **md5** — the one hash both engines expose with identical
output — truncated to a 60-bit non-negative BIGINT:

    h64(s, seed) = int(md5(seed || '|' || s)[:15 hex], 16)

15 hex digits = 60 bits < 2^63, so the value is a positive signed long
in both engines and all downstream integer arithmetic (min, %, *, +,
bit tests) is exact and engine-independent.

Each helper returns a *pair* of builders (Spark Column fn, SQL-text fn)
generated from the same parameters, so the Spark plan and the DuckDB
oracle can never drift.

Scale: md5 here runs JVM-side inside whole-stage codegen (built-in
``F.md5``) — no Python round-trip; at 100 TB the cost is one pass over
the tokenized column, map-side only.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MASK60_HEX = 15  # 15 hex chars = 60 bits, always positive in int64


def h64(col: Column, seed: str) -> Column:
    """Seeded 60-bit hash of a string column (Spark side)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(seed + "|"), col)), 1, MASK60_HEX),
            16,
            10,
        )
        .cast("long")
    )


def h64_sql(expr: str, seed: str) -> str:
    """Seeded 60-bit hash of a string expression (DuckDB side)."""
    return f"('0x' || substr(md5('{seed}|' || {expr}), 1, {MASK60_HEX}))::BIGINT"


def words_col(text_col: str = "text") -> Column:
    """Whitespace tokens, empties dropped, order preserved (Spark)."""
    return F.filter(F.split(F.col(text_col), " "), lambda w: w != F.lit(""))


def words_sql(expr: str = "text") -> str:
    """Whitespace tokens, empties dropped, order preserved (DuckDB)."""
    return f"list_filter(string_split({expr}, ' '), x -> x <> '')"
