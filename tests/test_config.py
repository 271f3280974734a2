"""appsettings-shaped config loader (lifecycle/config.py) — the
reference's tuning surface (CardanoIndexWorker.cs:54-72, rollback mode
ibid:181-202) mapped onto the rebuild's constructors, with the SAME key
paths, defaults, clamps, and required-key errors."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from argus_spark.chain.synth import synth_blocks
from argus_spark.lifecycle.config import ConfigError, IndexerConfig
from argus_spark.lifecycle.dag import Reducer, ReducerRegistry
from argus_spark.lifecycle.driver import ChainEvent, IndexDriver
from argus_spark.lifecycle.store import ParquetStateStore
from argus_spark.reducers.examples import _blocks_reducer
from tests.conftest import SF_SMOKE

BASE = {
    "CardanoNodeConnection": {
        "NetworkMagic": 764824073,
        "MaxRollbackSlots": 1000,
        "RollbackBuffer": 5,
        "Hash": "abc123",
        "Slot": 55_555,
    },
    "Sync": {
        "Commit": {"BatchSize": 42, "MaxDelayMs": 250},
        "Pipeline": {"ChannelCapacity": 64},
        "Worker": {"ExitOnCompletion": False},
        "Dashboard": {"TuiMode": False, "RefreshInterval": 1000},
    },
    # a section the rebuild doesn't own must pass through untouched
    "ConnectionStrings": {"CardanoContext": "Host=..."},
}


def test_parse_reference_key_paths_and_defaults():
    cfg = IndexerConfig.from_dict(BASE)
    assert cfg.batch_size == 42
    assert cfg.max_delay_s == 0.25
    assert cfg.max_rollback_slots == 1000
    assert cfg.window_k == 5
    assert cfg.channel_capacity == 64
    assert cfg.network_magic == 764824073
    assert (cfg.start_hash, cfg.start_slot) == ("abc123", 55_555)
    assert cfg.exit_on_completion is False
    # the reference clamps the dashboard refresh to >= 2000 ms
    assert cfg.dashboard_refresh_ms == 2000
    assert cfg.rollback_enabled is False
    assert cfg.extras == {"ConnectionStrings:CardanoContext": "Host=..."}
    assert cfg.driver_kwargs() == {
        "batch_size": 42,
        "max_delay_s": 0.25,
        "window_k": 5,
        "max_rollback_slots": 1000,
    }


def test_defaults_match_reference_when_absent():
    cfg = IndexerConfig.from_dict(
        {"CardanoNodeConnection": {"Hash": "h", "Slot": 1}}
    )
    assert cfg.batch_size == 500
    assert cfg.max_delay_s == 1.0
    assert cfg.max_rollback_slots == 10_000
    assert cfg.window_k == 10
    assert cfg.channel_capacity == 256
    assert cfg.network_magic == 2
    assert cfg.exit_on_completion is True
    assert cfg.dashboard_refresh_ms == 2000


def test_required_start_point_and_clamps():
    with pytest.raises(ConfigError, match="start hash"):
        IndexerConfig.from_dict({"CardanoNodeConnection": {"Slot": 1}})
    with pytest.raises(ConfigError, match="start slot"):
        IndexerConfig.from_dict({"CardanoNodeConnection": {"Hash": "h"}})
    cfg = IndexerConfig.from_dict(
        {
            "CardanoNodeConnection": {"Hash": "h", "Slot": 1},
            "Sync": {"Commit": {"BatchSize": 0, "MaxDelayMs": 0}},
        }
    )
    assert cfg.batch_size == 1  # Math.Max(1, ...) in the reference
    assert cfg.max_delay_s == 0.001


def test_unknown_owned_key_rejected_not_silently_defaulted():
    bad = {
        "CardanoNodeConnection": {"Hash": "h", "Slot": 1},
        "Sync": {"Commit": {"BatchSiz": 9}},  # typo
    }
    with pytest.raises(ConfigError, match="BatchSiz"):
        IndexerConfig.from_dict(bad)


def test_rewind_plan_overrides_and_opt_out():
    cfg = IndexerConfig.from_dict(
        {
            "CardanoNodeConnection": {"Hash": "h", "Slot": 1},
            "Sync": {
                "Rollback": {
                    "Enabled": True,
                    "Slot": 700,
                    "Reducers": {
                        "a": {"Slot": 300},
                        "b": {"Enabled": False},
                    },
                }
            },
        }
    )
    overrides, exclude = cfg.rewind_plan(["a", "b", "c"])
    # exclusive intersection semantics: the configured point is kept
    assert overrides == {"a": 301, "c": 701}
    assert exclude == ["b"]
    # enabled without any slot anywhere = config error (reference throws)
    cfg2 = IndexerConfig.from_dict(
        {
            "CardanoNodeConnection": {"Hash": "h", "Slot": 1},
            "Sync": {"Rollback": {"Enabled": True}},
        }
    )
    with pytest.raises(ConfigError, match="no slot"):
        cfg2.rewind_plan(["a"])
    # rollback mode off -> no plan
    cfg3 = IndexerConfig.from_dict(
        {"CardanoNodeConnection": {"Hash": "h", "Slot": 1}}
    )
    assert cfg3.rewind_plan(["a"]) is None


def test_config_driven_driver_sync_and_startup_rewind(spark, tmp_path):
    """End to end: construct the driver FROM the parsed config, sync,
    then restart in the reference's rollback mode — the config-driven
    startup rewind must cut the table to the configured slot exactly."""
    blocks = synth_blocks(spark, SF_SMOKE).cache()
    try:
        slots = [
            r.slot for r in blocks.select("slot").orderBy("slot").collect()
        ]
        cut = slots[len(slots) // 2]
        cfg = IndexerConfig.from_dict(
            {
                "CardanoNodeConnection": {
                    "Hash": "h", "Slot": 0, "RollbackBuffer": 5,
                    "MaxRollbackSlots": 10**12,
                },
                "Sync": {"Commit": {"BatchSize": 300, "MaxDelayMs": 10**9}},
            }
        )
        store = ParquetStateStore(str(tmp_path / "store"))
        reg = ReducerRegistry().register(
            Reducer("block_tests", _blocks_reducer, tables=["block_tests"])
        )
        d = IndexDriver(spark, reg, store, blocks, **cfg.driver_kwargs())
        assert d.batch_size == 300 and d.window_k == 5
        d.run([ChainEvent("roll_forward", block_slot=s) for s in slots])
        assert not cfg.apply_startup_rewind(d)  # rollback mode off

        rb = IndexerConfig.from_dict(
            {
                "CardanoNodeConnection": {
                    "Hash": "h", "Slot": 0, "MaxRollbackSlots": 10**12,
                },
                "Sync": {"Rollback": {"Enabled": True, "Slot": cut}},
            }
        )
        d2 = IndexDriver(spark, reg, store, blocks, **rb.driver_kwargs())
        assert rb.apply_startup_rewind(d2)
        got = sorted(
            r.slot
            for r in store.read_table(spark, "block_tests")
            .select("slot")
            .collect()
        )
        # the configured intersection slot itself is KEPT (exclusive)
        assert got == [s for s in slots if s <= cut]
    finally:
        blocks.unpersist()


def test_streaming_indexer_from_config(spark, tmp_path):
    """Config → StreamingIndexer → real availableNow run: BatchSize,
    RollbackBuffer, and ChannelCapacity land on the right knobs and the
    ExitOnCompletion dispatch drains the feed to the oracle state."""
    import json as _json

    from argus_spark.sources.chain_feed import write_feed_file
    from argus_spark.streaming.indexer import StreamingIndexer

    blocks = synth_blocks(spark, SF_SMOKE).cache()
    try:
        slots = [
            r.slot for r in blocks.select("slot").orderBy("slot").collect()
        ]
        cfg_path = tmp_path / "appsettings.json"
        cfg_path.write_text(_json.dumps({
            "CardanoNodeConnection": {
                "Hash": "h", "Slot": 0,
                "RollbackBuffer": 7, "MaxRollbackSlots": 10**12,
            },
            "Sync": {
                "Commit": {"BatchSize": 150, "MaxDelayMs": 10**12},
                "Pipeline": {"ChannelCapacity": 2},
                "Worker": {"ExitOnCompletion": True},
            },
        }))
        cfg = IndexerConfig.from_json(str(cfg_path))
        feed = str(tmp_path / "feed")
        rows = [
            {"seq": i, "action": "roll_forward", "block_slot": s,
             "rollback_slot": None, "rollback_type": None}
            for i, s in enumerate(slots)
        ]
        seg = max(1, len(rows) // 5)
        for i, lo in enumerate(range(0, len(rows), seg)):
            write_feed_file(feed, i, rows[lo : lo + seg])
        store = ParquetStateStore(str(tmp_path / "store"))
        reg = ReducerRegistry().register(
            Reducer("block_tests", _blocks_reducer, tables=["block_tests"])
        )
        si = StreamingIndexer.from_config(
            spark, reg, store, blocks, feed, str(tmp_path / "ck"), cfg
        )
        assert si.driver.batch_size == 150
        assert si.driver.window_k == 7
        assert si.max_files_per_trigger == 2
        stats = si.run_from_config(cfg)
        assert stats.micro_batches >= 3  # 6 files at 2/trigger
        got = sorted(
            r.slot
            for r in store.read_table(spark, "block_tests")
            .select("slot")
            .collect()
        )
        assert got == slots
    finally:
        blocks.unpersist()
