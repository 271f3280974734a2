"""Scalar column functions — the reference's utility surface as
composable Spark expressions (all JVM-side, codegen-friendly; no UDFs).

Citations map each helper to its reference behavior:

  * hex (B31): the reference mixes Convert.ToHexString (UPPER) with
    ToHexStringLower and a comment admits spend-matching broke on the
    mismatch (LovelaceBalanceByAddressReducer.cs:51-62). Policy here:
    ONE canonical case (lower) applied at ingest; ``canonical_hex``
    is the only hex entry point the engine uses.
  * display prefix (B32): ``Hash[..8] + "…"`` (StartPoints.cs:143-145)
  * JSON points (B33): ReducerState stores Point/window as JSON strings
    (ReducerState.cs:24-36); native structs are preferred (schemas.py),
    these exist for wire/interop parity.
  * stable hash (B34): FNV-1a advisory-lock key
    (PostgresSingleInstanceLock.cs:177-188) → any deterministic 64-bit
    key works; ``stable_hash64`` = xxhash64 (JVM, seed-stable), and
    ``h64`` (md5-based, from datapipe.hashing) when the value must be
    reproducible outside Spark.
  * slot math (B36): exclusive→inclusive rollback (+1)
    (ReducerGraphProcessor.cs:178-183) and tip-gap
    (N2NProvider.cs:146).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from argus_spark.datapipe.hashing import h64  # noqa: F401  (re-export)
from argus_spark.schemas import POINT

# ---------------- hex (B31) ----------------


def hex_encode(col: Column | str) -> Column:
    """binary → lowercase hex (the canonical case)."""
    return F.lower(F.hex(col))


def hex_decode(col: Column | str) -> Column:
    """hex (either case) → binary."""
    return F.unhex(F.upper(col) if isinstance(col, Column) else F.upper(F.col(col)))


def canonical_hex(col: Column | str) -> Column:
    """Normalize a hex string to the engine-wide canonical (lower)
    case. Apply at ingest; join keys must never carry mixed case."""
    return F.lower(col)


# ---------------- display (B32) ----------------


def display_prefix(col: Column | str, n: int = 8) -> Column:
    return F.concat(F.substring(col, 1, n), F.lit("..."))


# ---------------- JSON interop (B33) ----------------


def to_json_points(points: Column | str) -> Column:
    """array<struct<hash,slot>> → JSON string (ReducerState wire shape)."""
    return F.to_json(points)


def from_json_points(json_col: Column | str) -> Column:
    """JSON string → array<struct<hash,slot>>."""
    return F.from_json(json_col, T.ArrayType(POINT))


# ---------------- stable hash (B34) ----------------


def stable_hash64(*cols: Column | str, seed: int = 42) -> Column:
    """Deterministic 64-bit key (xxhash64): partitioner/lock-key
    grade, stable across sessions and executors."""
    return F.xxhash64(*cols, F.lit(seed))


# ---------------- slot arithmetic (B36) ----------------


def rollback_delete_from(rollback_slot: Column | str, rollback_type: Column | str) -> Column:
    """Normalize a provider rollback to the first slot to DELETE:
    exclusive keeps the point (delete from slot+1), inclusive deletes
    the point itself (ArgusUtil.cs:90-99 → ReducerGraphProcessor.cs:
    178-183)."""
    rs = F.col(rollback_slot) if isinstance(rollback_slot, str) else rollback_slot
    rt = F.col(rollback_type) if isinstance(rollback_type, str) else rollback_type
    return F.when(rt == "exclusive", rs + 1).otherwise(rs)


def slot_tip_gap(current_slot: Column | str, tip_slot: Column | str) -> Column:
    """How far behind the tip — drives adaptive batching (A2)."""
    cs = F.col(current_slot) if isinstance(current_slot, str) else current_slot
    ts = F.col(tip_slot) if isinstance(tip_slot, str) else tip_slot
    return F.greatest(ts - cs, F.lit(0))
