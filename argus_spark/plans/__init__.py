"""Physical-plan introspection & quality gates.

The reference has no optimizer (SURVEY §4) — Catalyst provides ours.
This package makes the optimizer's work *checkable*: tests assert that
filters reach the parquet scan, small dims broadcast, aggregations run
map-side partial, and map-only operators stay shuffle-free — so a
regression that would melt down at 100 TB fails CI at 60 k rows.
"""
