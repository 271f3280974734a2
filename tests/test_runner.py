"""run_indexer_from_config — the one-call hosted-worker assembly
(lifecycle/runner.py): config → allow-list → lock → provider → pump →
startup rewind → streaming loop, end to end against the stateless
oracle, including a restart leg where every layer resumes from its own
persisted state (pump seq, streaming checkpoint, committed floor)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from argus_spark.chain.synth import synth_blocks, synth_watched
from argus_spark.lifecycle.config import IndexerConfig
from argus_spark.lifecycle.runner import run_indexer_from_config
from argus_spark.lifecycle.store import ParquetStateStore
from argus_spark.reducers.examples import build_example_registry
from argus_spark.sources.providers import (
    ProviderFeedPump,
    SocketLineProvider,
    serve_feed_once,
)
from tests.conftest import SF_SMOKE
from tests.test_lifecycle_e2e import driver_balances, expected_balances
from tests.test_providers import feed_rows_of


@pytest.fixture(scope="module")
def chain(spark):
    blocks = synth_blocks(spark, SF_SMOKE).cache()
    watched = synth_watched(spark, SF_SMOKE).cache()
    slots = [r.slot for r in blocks.select("slot").orderBy("slot").collect()]
    yield blocks, watched, slots
    blocks.unpersist()
    watched.unpersist()


def _cfg(host, port, batch=300):
    return IndexerConfig.from_dict({
        "CardanoNodeConnection": {
            "ConnectionType": "TCP",
            "TCP": {"Host": host, "Port": port},
            "Hash": "genesis", "Slot": 0,
            "MaxRollbackSlots": 10**12, "RollbackBuffer": 10,
        },
        "Sync": {
            "Commit": {"BatchSize": batch, "MaxDelayMs": 10**12},
            "Pipeline": {"ChannelCapacity": 4},
            "Worker": {"ExitOnCompletion": True},
            "SingleInstanceLock": {"Enabled": True, "LeaseSeconds": 30},
        },
    })


def test_runner_end_to_end_from_config(spark, chain, tmp_path):
    """Full assembly: the config-built TCP provider is pumped into feed
    segments, the streaming loop drains them under the config-built
    lock, and the final store state equals the stateless oracle."""
    blocks, watched, slots = chain
    host, port = serve_feed_once(feed_rows_of(slots))
    cfg = _cfg(host, port)
    store = ParquetStateStore(str(tmp_path / "store"))
    reg = build_example_registry(spark, watched)
    report = run_indexer_from_config(
        spark, cfg, reg, store, blocks,
        str(tmp_path / "feed"), str(tmp_path / "ck"),
    )
    assert report.pumped_events == len(slots)
    assert not report.rewound
    assert report.stats.driver.blocks == len(slots)
    # drain mode released the lock: a second instance can acquire
    lock2 = cfg.make_lock(store.root)
    assert lock2.try_acquire()
    lock2.release()
    assert driver_balances(spark, store) == expected_balances(spark)


def test_runner_restart_resumes_every_layer(spark, chain, tmp_path):
    """Leg 1 indexes the first half; leg 2 (fresh pump + fresh driver +
    same checkpoint) connects to a server holding the FULL chain,
    intersects at the pump's persisted seq, and converges to the oracle
    with only the tail re-pumped."""
    blocks, watched, slots = chain
    half = len(slots) // 2
    store = ParquetStateStore(str(tmp_path / "store"))
    reg = build_example_registry(spark, watched)
    feed, ck = str(tmp_path / "feed"), str(tmp_path / "ck")

    host1, port1 = serve_feed_once(feed_rows_of(slots[:half]))
    r1 = run_indexer_from_config(
        spark, _cfg(host1, port1), reg, store, blocks, feed, ck
    )
    assert r1.pumped_events == half

    host2, port2 = serve_feed_once(feed_rows_of(slots))
    r2 = run_indexer_from_config(
        spark, _cfg(host2, port2), reg, store, blocks, feed, ck
    )
    # the pump offered its persisted seq: only the tail replayed
    assert r2.pumped_events == len(slots) - half
    assert driver_balances(spark, store) == expected_balances(spark)


def test_pump_is_incremental_and_crash_safe(spark, chain, tmp_path):
    """drain() twice against the same server population writes nothing
    new the second time; state persists after segment publish."""
    _, _, slots = chain
    feed = str(tmp_path / "feed")
    host, port = serve_feed_once(feed_rows_of(slots))
    pump = ProviderFeedPump(SocketLineProvider(host, port), feed,
                            batch_rows=7)
    assert pump.drain() == len(slots)
    assert pump.resume_points() == [len(slots) - 1]
    host2, port2 = serve_feed_once(feed_rows_of(slots))
    pump2 = ProviderFeedPump(SocketLineProvider(host2, port2), feed)
    assert pump2.drain() == 0  # caught up — nothing re-pumped
    # segments rotate at batch_rows and parse back to the same events
    from argus_spark.sources.chain_feed import read_feed

    rows = read_feed(spark, feed).orderBy("seq").collect()
    assert [r["seq"] for r in rows] == list(range(len(slots)))


def test_runner_respects_lock_holder(spark, chain, tmp_path):
    blocks, watched, slots = chain
    host, port = serve_feed_once(feed_rows_of(slots))
    cfg = _cfg(host, port)
    store = ParquetStateStore(str(tmp_path / "store"))
    reg = build_example_registry(spark, watched)
    holder = cfg.make_lock(store.root)
    assert holder.try_acquire()
    try:
        with pytest.raises(TimeoutError, match="holds the lock"):
            run_indexer_from_config(
                spark, cfg, reg, store, blocks,
                str(tmp_path / "feed"), str(tmp_path / "ck"),
                lock_timeout_s=0.5,
            )
    finally:
        holder.release()


def test_runner_follow_the_tip_mode(spark, chain, tmp_path):
    """ExitOnCompletion=false: the report carries the LIVE query and
    the still-held lock; new events pumped while the query runs are
    picked up by the next trigger (MaxDelayMs = the A9 trigger); the
    lock stays held until the caller releases it after stopping."""
    blocks, watched, slots = chain
    half = len(slots) // 2
    store = ParquetStateStore(str(tmp_path / "store"))
    reg = build_example_registry(spark, watched)
    feed, ck = str(tmp_path / "feed"), str(tmp_path / "ck")

    host, port = serve_feed_once(feed_rows_of(slots[:half]))
    cfg = IndexerConfig.from_dict({
        "CardanoNodeConnection": {
            "ConnectionType": "TCP",
            "TCP": {"Host": host, "Port": port},
            "Hash": "genesis", "Slot": 0,
            "MaxRollbackSlots": 10**12, "RollbackBuffer": 10,
        },
        "Sync": {
            "Commit": {"BatchSize": 50, "MaxDelayMs": 200},
            "Worker": {"ExitOnCompletion": False},
            "SingleInstanceLock": {"Enabled": True},
        },
    })
    report = run_indexer_from_config(
        spark, cfg, reg, store, blocks, feed, ck
    )
    query = report.stats  # live StreamingQuery in tip mode
    try:
        assert report.lock is not None and report.lock.held()
        # while the loop runs, the lock blocks a second instance
        assert not cfg.make_lock(store.root).try_acquire()
        # the tip advances: pump the remaining half mid-flight
        host2, port2 = serve_feed_once(feed_rows_of(slots))
        pumped = ProviderFeedPump(
            SocketLineProvider(host2, port2), feed
        ).drain()
        assert pumped == len(slots) - half
        import time as _t

        deadline = _t.monotonic() + 60
        while _t.monotonic() < deadline:
            if report.indexer.stats.driver.blocks >= len(slots):
                break
            _t.sleep(0.3)
        assert report.indexer.stats.driver.blocks == len(slots)
    finally:
        query.stop()
        query.awaitTermination()
        report.release()
    assert cfg.make_lock(store.root).try_acquire()  # released
    assert driver_balances(spark, store) == expected_balances(spark)


def test_runner_reorg_through_the_pump(spark, chain, tmp_path):
    """Leg 2's transport carries a mid-chain REORG (exclusive rollback
    + replacement tail): the pump serializes the rollback event into
    the feed, the streaming loop retracts (A12) and re-applies, and the
    final state equals the stateless oracle — the full retraction path
    driven end to end from config + live transport."""
    blocks, watched, slots = chain
    reorg_at = slots[int(len(slots) * 0.8)]
    rows1 = feed_rows_of(slots)  # full chain first
    store = ParquetStateStore(str(tmp_path / "store"))
    reg = build_example_registry(spark, watched)
    feed, ck = str(tmp_path / "feed"), str(tmp_path / "ck")

    host1, port1 = serve_feed_once(rows1)
    run_indexer_from_config(
        spark, _cfg(host1, port1), reg, store, blocks, feed, ck
    )

    # leg 2: the node reorged — roll back (exclusive at reorg_at, its
    # own block KEPT) then re-serve the tail above it
    n = len(rows1)
    tail = [s for s in slots if s > reorg_at]
    rows2 = rows1 + [
        {"seq": n, "action": "roll_back", "block_slot": None,
         "rollback_slot": reorg_at, "rollback_type": "exclusive"},
    ] + [
        {"seq": n + 1 + i, "action": "roll_forward", "block_slot": s,
         "rollback_slot": None, "rollback_type": None}
        for i, s in enumerate(tail)
    ]
    host2, port2 = serve_feed_once(rows2)
    r2 = run_indexer_from_config(
        spark, _cfg(host2, port2), reg, store, blocks, feed, ck
    )
    assert r2.pumped_events == 1 + len(tail)  # rollback + re-applied tail
    assert r2.stats.driver.rollbacks >= 1
    assert driver_balances(spark, store) == expected_balances(spark)


def test_pump_random_crash_points_converge(spark, chain, tmp_path):
    """Property (Hypothesis): crash the pump at ANY point mid-drain
    (transport error after K events), resume with a fresh pump +
    fresh connection — the feed always converges to at-least-once
    coverage of the full stream (every seq present; duplicates allowed
    and absorbed downstream by the driver's committed floor, B41)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _, _, slots = chain
    rows = feed_rows_of(slots)

    class CrashingProvider:
        """Wraps a replay of `rows` but dies after `crash_after`
        events — the transport-failure injection point."""

        def __init__(self, crash_after):
            self.crash_after = crash_after
            self.last_seq = None

        def events(self, intersect=None):
            from argus_spark.sources.providers import TransportError

            pts = intersect or []
            known = {r["seq"] for r in rows}
            after = next((p for p in pts if p in known), None)
            out = [r for r in rows if after is None or r["seq"] > after]
            for k, r in enumerate(out):
                if k == self.crash_after:
                    raise TransportError("injected mid-stream failure")
                self.last_seq = r["seq"]
                yield event_of_row_roundtrip(r)

    from argus_spark.sources.providers import event_of_row

    def event_of_row_roundtrip(r):
        return event_of_row(r)

    from argus_spark.sources.providers import ProviderFeedPump, TransportError

    @settings(max_examples=12, deadline=None)
    @given(
        st.integers(0, len(rows) - 1),
        st.integers(1, 16),
        st.integers(0, 10**6),
    )
    def prop(crash_after, batch_rows, salt):
        feed = str(tmp_path / f"feed-{crash_after}-{batch_rows}-{salt}")
        pump = ProviderFeedPump(
            CrashingProvider(crash_after), feed, batch_rows=batch_rows
        )
        try:
            pump.drain()
        except TransportError:
            pass
        # resume with a healthy connection
        pump2 = ProviderFeedPump(
            CrashingProvider(10**9), feed, batch_rows=batch_rows
        )
        pump2.drain()
        # at-least-once coverage of the whole stream
        import json as _json
        import os as _os

        seqs = []
        for f in sorted(_os.listdir(feed)):
            if f.startswith("feed-") and f.endswith(".json"):
                with open(_os.path.join(feed, f)) as fh:
                    seqs.extend(_json.loads(line)["seq"] for line in fh if line.strip())
        assert set(seqs) == {r["seq"] for r in rows}, (crash_after, batch_rows)

    prop()
