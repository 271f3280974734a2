"""Scalar function library tests (B31-B37)."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from argus_spark import functions as fx


def test_hex_roundtrip_canonical_case(spark):
    df = spark.createDataFrame([(b"\xab\xcd\xef",)], "b binary").select(
        fx.hex_encode("b").alias("h")
    )
    row = df.select(
        "h",
        fx.hex_decode("h").alias("back"),
        fx.canonical_hex(F.upper("h")).alias("canon"),
    ).collect()[0]
    assert row.h == "abcdef"          # lower is canonical (B31 foot-gun)
    assert bytes(row.back) == b"\xab\xcd\xef"
    assert row.canon == "abcdef"      # mixed case normalizes


def test_display_prefix(spark):
    r = spark.range(1).select(
        fx.display_prefix(F.lit("deadbeefcafe0123"), 8).alias("p")
    ).collect()[0]
    assert r.p == "deadbeef..."


def test_json_points_roundtrip(spark):
    df = spark.createDataFrame(
        [([("h1", 10), ("h2", 20)],)],
        "points array<struct<hash:string,slot:long>>",
    )
    back = df.select(
        fx.from_json_points(fx.to_json_points("points")).alias("p")
    ).collect()[0]
    assert [(p.hash, p.slot) for p in back.p] == [("h1", 10), ("h2", 20)]


def test_stable_hash_is_stable(spark):
    a = spark.range(5).select(fx.stable_hash64("id").alias("h")).collect()
    b = spark.range(5).select(fx.stable_hash64("id").alias("h")).collect()
    assert [r.h for r in a] == [r.h for r in b]
    assert len({r.h for r in a}) == 5


def test_rollback_delete_from_matches_reference_mapping(spark):
    df = spark.createDataFrame(
        [(100, "exclusive"), (100, "inclusive")], "rs long, rt string"
    )
    got = [
        r.d for r in df.select(fx.rollback_delete_from("rs", "rt").alias("d")).collect()
    ]
    # exclusive keeps slot 100 (delete from 101); inclusive deletes it
    assert got == [101, 100]


def test_slot_tip_gap_floors_at_zero(spark):
    df = spark.createDataFrame([(5, 100), (100, 5)], "cur long, tip long")
    got = [r.g for r in df.select(fx.slot_tip_gap("cur", "tip").alias("g")).collect()]
    assert got == [95, 0]
