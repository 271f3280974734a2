"""Deployable source adapters → IndexDriver, end to end (SURVEY §2.A3;
the reference's live transports N2CProvider.cs:47-106 /
N2NProvider.cs:89-215 / U5CProvider.cs:21-76). Each test drives a REAL
driver from the adapter and asserts the same stateless oracle as
test_forward_sync_matches_oracle — proving the provider boundary
composes with the full lifecycle (resume intersection, at-least-once
redelivery, ordering validation)."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from argus_spark.chain.synth import synth_blocks, synth_watched
from argus_spark.lifecycle.driver import IndexDriver
from argus_spark.lifecycle.store import ParquetStateStore
from argus_spark.reducers.examples import build_example_registry
from argus_spark.sources.chain_feed import write_feed_file
from argus_spark.sources.providers import (
    FileTopic,
    KafkaShapedChainSource,
    SocketLineProvider,
    TransportError,
    serve_feed_once,
)
from tests.conftest import SF_SMOKE
from tests.test_lifecycle_e2e import driver_balances, expected_balances


@pytest.fixture(scope="module")
def chain(spark):
    blocks = synth_blocks(spark, SF_SMOKE).cache()
    watched = synth_watched(spark, SF_SMOKE).cache()
    slots = [r.slot for r in blocks.select("slot").orderBy("slot").collect()]
    yield blocks, watched, slots
    blocks.unpersist()
    watched.unpersist()


def feed_rows_of(slots):
    return [
        {"seq": i, "action": "roll_forward", "block_slot": s,
         "rollback_slot": None, "rollback_type": None}
        for i, s in enumerate(slots)
    ]


def test_socket_provider_forward_sync_matches_oracle(spark, chain, tmp_path):
    """TCP line-protocol provider → IndexDriver: full sync from origin
    equals the stateless oracle (the N2C deployment shape end to end)."""
    blocks, watched, slots = chain
    host, port = serve_feed_once(feed_rows_of(slots))
    prov = SocketLineProvider(host, port)
    events = list(prov.events(intersect=[]))
    assert len(events) == len(slots)
    assert prov.last_seq == len(slots) - 1

    store = ParquetStateStore(str(tmp_path / "store"))
    reg = build_example_registry(spark, watched)
    d = IndexDriver(spark, reg, store, blocks, batch_size=400, max_delay_s=1e9)
    stats = d.run(events)
    assert stats.blocks == len(slots)
    assert driver_balances(spark, store) == expected_balances(spark)


def test_socket_provider_resume_intersection(chain):
    """FindIntersection resume: a client presenting its last-known seq
    receives only the events strictly after it (N2CProvider.cs:68-85)."""
    _, _, slots = chain
    rows = feed_rows_of(slots)
    k = len(slots) // 2
    host, port = serve_feed_once(rows)
    prov = SocketLineProvider(host, port)
    events = list(prov.events(intersect=[k]))
    assert len(events) == len(slots) - k - 1
    assert events[0].block_slot == slots[k + 1]


def test_socket_provider_seq_regression_raises(chain):
    _, _, slots = chain
    rows = feed_rows_of(slots[:10])
    rows[5]["seq"] = 3  # corrupt the total order
    host, port = serve_feed_once(rows)
    with pytest.raises(TransportError):
        list(SocketLineProvider(host, port).events())


def test_kafka_shaped_consumer_at_least_once(spark, chain, tmp_path):
    """Poll/commit consumer over the file-backed offset log, committing
    offsets only AFTER each driver epoch commit; a crash between poll
    and commit redelivers the uncommitted batch on resume, and the
    driver's committed floor absorbs the replay (B41) — final state
    equals the stateless oracle."""
    blocks, watched, slots = chain
    feed = str(tmp_path / "feed")
    rows = feed_rows_of(slots)
    seg = max(1, len(rows) // 4)
    for i, lo in enumerate(range(0, len(rows), seg)):
        write_feed_file(feed, i, rows[lo : lo + seg])
    topic = FileTopic(feed)
    assert topic.end_offset() == len(slots)

    store = ParquetStateStore(str(tmp_path / "store"))
    reg = build_example_registry(spark, watched)
    d = IndexDriver(spark, reg, store, blocks, batch_size=300, max_delay_s=1e9)

    src = KafkaShapedChainSource(topic)
    n_batches = 0
    for events, commit in src.run_batches(max_records=400):
        d.run(events)
        n_batches += 1
        if n_batches == 2:
            break  # CRASH before committing batch 2's offset
        commit()
    crash_floor = src.committed
    assert 0 < crash_floor < len(slots)  # batch 1 committed, batch 2 not

    # fresh consumer + fresh driver resume from the committed offset:
    # batch 2 is REDELIVERED (at-least-once), the driver skips its
    # already-committed blocks
    src2 = KafkaShapedChainSource(topic, start_offset=crash_floor)
    d2 = IndexDriver(spark, reg, store, blocks, batch_size=300, max_delay_s=1e9)
    skipped = 0
    for events, commit in src2.run_batches(max_records=400):
        stats = d2.run(events)
        skipped += stats.skipped
        commit()
    assert skipped > 0
    assert src2.committed == len(slots)
    assert driver_balances(spark, store) == expected_balances(spark)
