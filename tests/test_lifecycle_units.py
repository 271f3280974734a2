"""Unit tests on the pure lifecycle kernels (SURVEY §5.3 pattern:
checkpoint window, rollback mapping, graph validation, store commit
semantics)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from argus_spark.lifecycle.dag import GraphError, Reducer, ReducerRegistry
from argus_spark.lifecycle.state import (
    CheckpointWindowError,
    Point,
    check_rollback_depth,
    normalize_rollback,
    safe_intersection,
    window_roll_back,
    window_roll_forward,
)


def P(slot):
    return Point(slot=slot, hash=f"h{slot}")


class TestCheckpointWindow:
    """Mirrors ReducerStateCheckpointWindow.cs:19-45 semantics."""

    def test_roll_forward_keeps_newest_k(self):
        w = []
        for s in range(1, 15):
            w = window_roll_forward(w, P(s), k=10)
        assert [p.slot for p in w] == list(range(14, 4, -1))

    def test_roll_forward_drops_stale_ge_new(self):
        w = [P(5), P(4), P(3)]
        w = window_roll_forward(w, P(4), k=10)
        assert [p.slot for p in w] == [4, 3]

    def test_distinct_by_slot(self):
        w = window_roll_forward([P(3), P(2)], P(5), k=10)
        w2 = window_roll_forward(w, P(6), k=10)
        assert len({p.slot for p in w2}) == len(w2)

    def test_rollback_drops_ge_slot(self):
        w = [P(s) for s in range(10, 0, -1)]
        assert [p.slot for p in window_roll_back(w, 6)] == [5, 4, 3, 2, 1]

    def test_rollback_to_origin_empties(self):
        w = [P(s) for s in range(5, 0, -1)]
        assert window_roll_back(w, 0) == []


class TestRollbackMapping:
    """ChainSyncRollbackMappingTest.cs:7-26 equivalents, incl. the
    origin-point regression (origin = inclusive at 0 → delete all)."""

    def test_exclusive_keeps_point(self):
        assert normalize_rollback(100, "exclusive") == 101

    def test_inclusive_deletes_point(self):
        assert normalize_rollback(100, "inclusive") == 100

    def test_origin_inclusive_zero_deletes_all(self):
        assert normalize_rollback(0, "inclusive") == 0

    def test_unknown_type_rejected(self):
        with pytest.raises(ValueError):
            normalize_rollback(5, "sideways")

    def test_depth_guard(self):
        check_rollback_depth(10_500, 600, max_rollback_slots=10_000)
        with pytest.raises(CheckpointWindowError):
            check_rollback_depth(10_601, 600, max_rollback_slots=10_000)


class TestSafeIntersection:
    def test_min_across_members(self):
        w = {"a": [P(90), P(80)], "b": [P(70), P(60)]}
        assert safe_intersection(w).slot == 70

    def test_missing_member_means_origin(self):
        assert safe_intersection({"a": [P(90)], "b": []}) is None


def _noop(ctx):
    return {}


class TestGraph:
    def test_duplicate_name_rejected(self):
        reg = ReducerRegistry().register(Reducer("a", _noop))
        with pytest.raises(GraphError):
            reg.register(Reducer("a", _noop))

    def test_missing_parent_rejected(self):
        reg = ReducerRegistry().register(Reducer("b", _noop, depends_on="ghost"))
        with pytest.raises(GraphError):
            reg.validate()

    def test_cycle_rejected(self):
        reg = ReducerRegistry()
        reg.register(Reducer("a", _noop, depends_on="b"))
        reg.register(Reducer("b", _noop, depends_on="a"))
        with pytest.raises(GraphError):
            reg.validate()

    def test_topo_parents_first(self):
        reg = ReducerRegistry()
        reg.register(Reducer("child", _noop, depends_on="root"))
        reg.register(Reducer("root", _noop))
        reg.register(Reducer("grand", _noop, depends_on="child"))
        assert [r.name for r in reg.topo_order()] == ["root", "child", "grand"]

    def test_allowlist_closure(self):
        reg = ReducerRegistry()
        reg.register(Reducer("root", _noop))
        reg.register(Reducer("child", _noop, depends_on="root"))
        with pytest.raises(GraphError):
            reg.with_allowlist(["child"])  # parent not active
        assert len(reg.with_allowlist(["root"])) == 1
