"""Deployable chain-event providers for the ``CHAIN_EVENTS`` contract
(SURVEY §2.A3 — the reference ships three live transports:
src/Argus.Sync/Providers/N2CProvider.cs:47-106 (Unix-socket node-to-
client), N2NProvider.cs:89-215 (pipelined TCP node-to-node),
U5CProvider.cs:21-76 (gRPC UtxoRPC); this module is the rebuild's
deployment-shaped pair, closing the "file feed only" gap).

Two adapters, both producing ``ChainEvent`` streams an ``IndexDriver``
consumes directly — the provider boundary is a plain ordered event
iterator, so every lifecycle guarantee (A5 rollback normalization, A14
resume, B41 idempotent replay) composes unchanged:

* :class:`SocketLineProvider` — a TCP line protocol: on connect the
  client sends one intersection request (its resume points, newest
  first — the reference's FindIntersection, N2CProvider.cs:68-85) and
  the server replays ndjson events from the first matching point. The
  wire rows are exactly ``write_feed_file``'s (seq, action, ...) shape.

* :class:`KafkaShapedChainSource` — a poll/commit consumer over any
  single-partition offset log exposing
  ``poll(offset, max_records) -> (rows, next_offset)``.
  :class:`FileTopic` is the embedded file-backed log used in the
  sandbox (no broker here); on a real deployment the same consumer
  wraps a Kafka partition: ``poll`` ↔ ``Consumer.poll``, offsets ↔
  Kafka offsets, ``commit``/resume ↔ committed group offsets. Offsets
  are committed AFTER the driver epoch commits, so redelivery on crash
  is at-least-once — absorbed by the driver's committed floor (B41).

Both validate the transport invariant the lifecycle relies on: ``seq``
strictly increasing within a connection/offset range (a totally-ordered
stream — single-partition topic, single socket).

Scale: events are ~5-column control-plane metadata; payloads never
transit the feed (blocks stay in their own table, chain_feed.py:17-19).
"""

from __future__ import annotations

import json
import os
import socket
from collections.abc import Iterator

from argus_spark.lifecycle.driver import ChainEvent

# ---------------------------------------------------------------------------
# wire row <-> ChainEvent
# ---------------------------------------------------------------------------


def event_of_row(row: dict) -> ChainEvent:
    """One wire row (the ``write_feed_file`` shape) → ``ChainEvent``."""
    if row["action"] == "roll_forward":
        return ChainEvent("roll_forward", block_slot=int(row["block_slot"]))
    return ChainEvent(
        "roll_back",
        rollback_slot=int(row["rollback_slot"]),
        rollback_type=row.get("rollback_type") or "exclusive",
    )


class TransportError(RuntimeError):
    """Ordering/protocol violation on a provider connection."""


def _ordered(rows: Iterator[dict], min_seq: int | None) -> Iterator[dict]:
    """Enforce strictly-increasing ``seq`` (the totally-ordered-stream
    contract every adapter promises the driver)."""
    last = None if min_seq is None else min_seq - 1
    for row in rows:
        seq = int(row["seq"])
        if last is not None and seq <= last:
            raise TransportError(
                f"seq regressed: {seq} after {last} — the transport must "
                "deliver a totally ordered stream (single partition / "
                "single socket)"
            )
        last = seq
        yield row


# ---------------------------------------------------------------------------
# TCP line-protocol provider (N2C/N2N shape)
# ---------------------------------------------------------------------------


class SocketLineProvider:
    """Ordered chain events over a TCP line protocol.

    Protocol (one round trip, then a one-way replay — the
    chainsync Intersect+RequestNext shape without the per-event
    ping-pong, which a pipelined transport elides, N2NProvider.cs:
    89-215):

      1. client → server: one JSON line
         ``{"intersect": [seq, ...]}`` (resume points, newest first;
         ``[]`` = from origin);
      2. server → client: ndjson event rows starting at the first
         matching point (exclusive), ``{"eof": true}`` terminator.

    ``events()`` yields ``ChainEvent``s; ``last_seq`` afterwards is the
    resume point to persist next to the driver checkpoint."""

    def __init__(self, host: str, port: int, timeout_s: float = 30.0) -> None:
        self.host, self.port, self.timeout_s = host, port, timeout_s
        self.last_seq: int | None = None

    def events(
        self, intersect: list[int] | None = None
    ) -> Iterator[ChainEvent]:
        with socket.create_connection(
            (self.host, self.port), timeout=self.timeout_s
        ) as sk:
            sk.sendall(
                (json.dumps({"intersect": intersect or []}) + "\n").encode()
            )
            f = sk.makefile("r", encoding="utf-8")
            start = (intersect[0] + 1) if intersect else None
            for row in _ordered(
                (r for r in map(json.loads, f) if not r.get("eof")), start
            ):
                self.last_seq = int(row["seq"])
                yield event_of_row(row)


def serve_feed_once(
    feed_rows: list[dict], host: str = "127.0.0.1", port: int = 0
) -> tuple[str, int]:
    """Minimal single-connection replay server for tests/fixtures: binds,
    returns (host, port), and serves ONE client on a daemon thread —
    replaying ``feed_rows`` from the client's intersection point. The
    deployment analogue is the node itself; this stub exists so the
    provider's protocol is exercised over a real socket."""
    import threading

    srv = socket.create_server((host, port))
    bound = srv.getsockname()

    def _serve() -> None:
        with srv:
            conn, _ = srv.accept()
            with conn:
                f = conn.makefile("r", encoding="utf-8")
                req = json.loads(f.readline())
                pts = req.get("intersect") or []
                known = {int(r["seq"]) for r in feed_rows}
                after = next((p for p in pts if p in known), None)
                out = [
                    r
                    for r in feed_rows
                    if after is None or int(r["seq"]) > after
                ]
                payload = "".join(json.dumps(r) + "\n" for r in out)
                conn.sendall((payload + json.dumps({"eof": True}) + "\n").encode())

    threading.Thread(target=_serve, daemon=True).start()
    return bound[0], bound[1]


# ---------------------------------------------------------------------------
# Kafka-shaped poll/commit consumer over an offset log
# ---------------------------------------------------------------------------


class FileTopic:
    """Embedded single-partition offset log over a feed directory (the
    ``write_feed_file`` segments). Offsets are global line ordinals
    across segments in name order — the same contract as a Kafka
    partition's offsets, so :class:`KafkaShapedChainSource` is
    transport-agnostic."""

    def __init__(self, feed_dir: str) -> None:
        self.feed_dir = feed_dir

    def _segments(self) -> list[str]:
        return sorted(
            os.path.join(self.feed_dir, f)
            for f in os.listdir(self.feed_dir)
            if f.startswith("feed-") and f.endswith(".json")
        )

    def end_offset(self) -> int:
        n = 0
        for seg in self._segments():
            with open(seg) as f:
                n += sum(1 for line in f if line.strip())
        return n

    def poll(
        self, offset: int, max_records: int
    ) -> tuple[list[dict], int]:
        """Rows at [offset, offset+max_records) and the next offset.
        Empty list = caught up to the log end."""
        rows: list[dict] = []
        pos = 0
        for seg in self._segments():
            if len(rows) >= max_records:
                break
            with open(seg) as f:
                for line in f:
                    if not line.strip():
                        continue
                    if pos >= offset and len(rows) < max_records:
                        rows.append(json.loads(line))
                    pos += 1
        return rows, offset + len(rows)


class KafkaShapedChainSource:
    """Poll/commit consumer of a chain-event offset log.

    ``run_batches`` polls up to ``max_records`` rows, yields each batch
    as ``(events, commit)`` where ``commit()`` records the batch's end
    offset as consumed — call it only AFTER the downstream epoch
    commit, so a crash between poll and commit redelivers (at-least-
    once; the driver's committed floor absorbs the replay, B41). The
    poll size is the A2 adaptive-depth lever: feed it
    ``adaptive_pipeline_depth`` of the current tip gap."""

    def __init__(self, topic, start_offset: int = 0) -> None:
        self.topic = topic
        self.committed = start_offset
        self._last_seq: int | None = None

    def run_batches(
        self, max_records: int = 1000
    ) -> Iterator[tuple[list[ChainEvent], "_Commit"]]:
        offset = self.committed
        while True:
            rows, nxt = self.topic.poll(offset, max_records)
            if not rows:
                return
            evs = [
                event_of_row(r)
                for r in _ordered(
                    iter(rows),
                    None if self._last_seq is None else self._last_seq + 1,
                )
            ]
            self._last_seq = int(rows[-1]["seq"])
            yield evs, _Commit(self, nxt)
            offset = nxt


class _Commit:
    def __init__(self, src: KafkaShapedChainSource, offset: int) -> None:
        self._src, self._offset = src, offset

    def __call__(self) -> None:
        self._src.committed = self._offset
