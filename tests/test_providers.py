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
    FollowTipShapedProvider,
    KafkaShapedChainSource,
    SocketLineProvider,
    TransportError,
    event_of_followtip,
    serve_feed_once,
    serve_followtip_once,
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


def test_socket_provider_multipoint_resume_older_match(chain):
    """Post-reorg resume: the client offers points newest-first and the
    server matches an OLDER one (the newest was orphaned). The ordering
    guard must seed from the ECHOED intersection, not the client's
    newest point — pre-fix this raised a spurious TransportError on the
    legitimate replay (seqs <= newest offered point)."""
    _, _, slots = chain
    rows = feed_rows_of(slots)
    k = len(slots) // 3
    host, port = serve_feed_once(rows)
    prov = SocketLineProvider(host, port)
    # newest point 10**6 is NOT on the server's chain; k is
    events = list(prov.events(intersect=[10**6, k]))
    assert prov.intersection == k
    assert len(events) == len(slots) - k - 1
    assert events[0].block_slot == slots[k + 1]


def test_socket_provider_no_match_replays_from_origin(chain):
    """No offered point matches (deep reorg past the client's window):
    the server echoes intersection=null and replays from origin — the
    guard must accept seqs starting at 0."""
    _, _, slots = chain
    host, port = serve_feed_once(feed_rows_of(slots))
    prov = SocketLineProvider(host, port)
    events = list(prov.events(intersect=[10**6, 10**6 + 1]))
    assert prov.intersection is None
    assert len(events) == len(slots)


def test_unix_socket_provider_forward_sync(spark, chain, tmp_path):
    """N2C shape: the same line protocol over a Unix domain socket
    (CardanoNodeConnection:UnixSocket:Path) drives a full sync to the
    stateless oracle."""
    blocks, watched, slots = chain
    sock = str(tmp_path / "node.socket")
    serve_feed_once(feed_rows_of(slots), unix_path=sock)
    prov = SocketLineProvider(unix_path=sock)
    events = list(prov.events(intersect=[]))
    assert len(events) == len(slots)

    store = ParquetStateStore(str(tmp_path / "store"))
    reg = build_example_registry(spark, watched)
    d = IndexDriver(spark, reg, store, blocks, batch_size=400, max_delay_s=1e9)
    d.run(events)
    assert driver_balances(spark, store) == expected_balances(spark)


def followtip_messages_of(slots):
    """Forward sync + a tip reorg expressed in the FollowTip vocabulary:
    apply all blocks, Undo the last (inclusive retraction), Reset to
    the prior block (exclusive — kept), re-apply the last block."""
    msgs = [
        {"seq": i, "action": "apply", "slot": s} for i, s in enumerate(slots)
    ]
    n = len(slots)
    msgs.append({"seq": n, "action": "undo", "slot": slots[-1]})
    msgs.append({"seq": n + 1, "action": "reset", "slot": slots[-2]})
    msgs.append({"seq": n + 2, "action": "apply", "slot": slots[-1]})
    return msgs


def test_followtip_mapping_table():
    """The A5 normalization table verbatim (U5CProvider.cs:54-70)."""
    ev = event_of_followtip({"action": "apply", "slot": 7})
    assert (ev.action, ev.block_slot) == ("roll_forward", 7)
    ev = event_of_followtip({"action": "undo", "slot": 7})
    assert (ev.action, ev.rollback_slot, ev.rollback_type) == (
        "roll_back", 7, "inclusive")
    ev = event_of_followtip({"action": "reset", "slot": 7})
    assert (ev.action, ev.rollback_slot, ev.rollback_type) == (
        "roll_back", 7, "exclusive")
    with pytest.raises(TransportError):
        event_of_followtip({"action": "rewind", "slot": 7})


def test_followtip_provider_sync_with_reorg_matches_oracle(
    spark, chain, tmp_path
):
    """FollowTip transport → IndexDriver e2e: a full sync THROUGH an
    Undo/Reset/re-apply tip reorg converges to the stateless oracle —
    proving the gRPC-shaped action mapping composes with A5/A12."""
    blocks, watched, slots = chain
    host, port = serve_followtip_once(
        followtip_messages_of(slots), require_api_key="dmtr-key-1"
    )
    prov = FollowTipShapedProvider(f"{host}:{port}", api_key="dmtr-key-1")
    events = list(prov.events(intersect=[]))
    assert len(events) == len(slots) + 3

    store = ParquetStateStore(str(tmp_path / "store"))
    reg = build_example_registry(spark, watched)
    d = IndexDriver(spark, reg, store, blocks, batch_size=400, max_delay_s=1e9)
    d.run(events)
    assert driver_balances(spark, store) == expected_balances(spark)


def test_followtip_provider_rejects_bad_api_key(chain):
    _, _, slots = chain
    host, port = serve_followtip_once(
        followtip_messages_of(slots), require_api_key="dmtr-key-1"
    )
    with pytest.raises(TransportError, match="unauthorized"):
        list(FollowTipShapedProvider(f"{host}:{port}", api_key="wrong").events())


def test_followtip_provider_resume_redelivery(spark, chain, tmp_path):
    """Crash-and-resume over FollowTip: leg 1 stops mid-stream; leg 2
    reconnects offering (stale, last_seq) newest-first, the server
    intersects at last_seq, and the driver's committed floor absorbs
    any block overlap (B41) — final state equals the oracle."""
    blocks, watched, slots = chain
    msgs = followtip_messages_of(slots)
    store = ParquetStateStore(str(tmp_path / "store"))
    reg = build_example_registry(spark, watched)
    d = IndexDriver(spark, reg, store, blocks, batch_size=300, max_delay_s=1e9)

    host, port = serve_followtip_once(msgs)
    prov = FollowTipShapedProvider(f"{host}:{port}")
    leg1 = []
    for ev in prov.events(intersect=[]):
        leg1.append(ev)
        if len(leg1) == len(slots) // 2:
            break  # CRASH mid-stream
    d.run(leg1)
    resume = prov.last_seq
    assert resume is not None and 0 < resume < len(msgs) - 1

    host2, port2 = serve_followtip_once(msgs)
    prov2 = FollowTipShapedProvider(f"{host2}:{port2}")
    d2 = IndexDriver(spark, reg, store, blocks, batch_size=300, max_delay_s=1e9)
    events2 = list(prov2.events(intersect=[10**6, resume]))
    assert prov2.intersection == resume
    d2.run(events2)
    assert driver_balances(spark, store) == expected_balances(spark)


def test_followtip_endpoint_shapes():
    """The reference's gRPC endpoint is URL-shaped (https://host[:port],
    ConfigurationChainProviderFactory.cs:52) — all common shapes parse;
    TLS default port 443 when omitted."""
    for ep, want in [
        ("relay:50051", ("relay", 50051)),
        ("https://relay.example:443", ("relay.example", 443)),
        ("https://your-utxorpc-endpoint", ("your-utxorpc-endpoint", 443)),
        ("http://relay/", ("relay", 443)),
        ("grpcs://relay:9090", ("relay", 9090)),
    ]:
        p = FollowTipShapedProvider(ep)
        assert (p.host, p.port) == want, ep
    with pytest.raises(ValueError):
        FollowTipShapedProvider("")
