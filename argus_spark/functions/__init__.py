"""Scalar function library (SURVEY §2.B B31-B37)."""

from argus_spark.functions.scalars import (  # noqa: F401
    canonical_hex,
    display_prefix,
    from_json_points,
    h64,
    hex_decode,
    hex_encode,
    rollback_delete_from,
    slot_tip_gap,
    stable_hash64,
    to_json_points,
)
