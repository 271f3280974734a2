"""Deployable chain-event providers for the ``CHAIN_EVENTS`` contract
(SURVEY §2.A3 — the reference ships three live transports:
src/Argus.Sync/Providers/N2CProvider.cs:47-106 (Unix-socket node-to-
client), N2NProvider.cs:89-215 (pipelined TCP node-to-node),
U5CProvider.cs:21-76 (gRPC UtxoRPC); this module is the rebuild's
deployment-shaped pair, closing the "file feed only" gap).

Three adapters — one per reference transport shape — all producing
``ChainEvent`` streams an ``IndexDriver`` consumes directly; the
provider boundary is a plain ordered event iterator, so every lifecycle
guarantee (A5 rollback normalization, A14 resume, B41 idempotent
replay) composes unchanged:

* :class:`SocketLineProvider` — a line protocol over TCP (N2N shape)
  or a Unix domain socket (N2C shape — the reference's
  ``CardanoNodeConnection:UnixSocket:Path``): on connect the client
  sends one intersection request (its resume points, newest first —
  the reference's FindIntersection, N2CProvider.cs:68-85), the server
  ECHOES the matched point (the reference's IntersectionFound
  response — the client must not assume its newest point matched; a
  post-reorg server may intersect at an OLDER point or none at all),
  then replays ndjson events from it. The wire rows are exactly
  ``write_feed_file``'s (seq, action, ...) shape.

* :class:`FollowTipShapedProvider` — the gRPC/UtxoRPC FollowTip shape
  (U5CProvider.cs:54-70): the server speaks Apply/Undo/Reset messages
  and the adapter normalizes them onto the lifecycle's rollback
  algebra — Apply → RollForward, Undo → RollBack(Inclusive) (the
  undone block itself is retracted), Reset → RollBack(Exclusive) (the
  reset point is KEPT, replay resumes after it) — the A5 table. An
  api-key header rides the handshake (the reference's ``dmtr-api-key``
  metadata). The sandbox wire is the same ndjson-over-socket stand-in
  (no gRPC stack here); the adapter logic — the action mapping the
  lifecycle depends on — is the real, tested thing.

* :class:`KafkaShapedChainSource` — a poll/commit consumer over any
  single-partition offset log exposing
  ``poll(offset, max_records) -> (rows, next_offset)``.
  :class:`FileTopic` is the embedded file-backed log used in the
  sandbox (no broker here); on a real deployment the same consumer
  wraps a Kafka partition: ``poll`` ↔ ``Consumer.poll``, offsets ↔
  Kafka offsets, ``commit``/resume ↔ committed group offsets. Offsets
  are committed AFTER the driver epoch commits, so redelivery on crash
  is at-least-once — absorbed by the driver's committed floor (B41).

All adapters validate the transport invariant the lifecycle relies
on: ``seq`` strictly increasing within a connection/offset range (a
totally-ordered stream — single-partition topic, single socket).
:class:`ProviderFeedPump` (below) bridges any of them into feed
segment files for the Structured Streaming path, with its own
persisted resume seq.

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
# socket line-protocol provider (N2N over TCP / N2C over Unix socket)
# ---------------------------------------------------------------------------


def _connect(
    host: str | None, port: int | None, unix_path: str | None, timeout_s: float
) -> socket.socket:
    if unix_path is not None:
        sk = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        sk.settimeout(timeout_s)
        sk.connect(unix_path)
        return sk
    return socket.create_connection((host, port), timeout=timeout_s)


class SocketLineProvider:
    """Ordered chain events over a socket line protocol — TCP
    (``host``/``port``, the N2N shape) or a Unix domain socket
    (``unix_path``, the N2C shape; both reference transports speak the
    same chainsync once connected, so one provider class serves both).

    Protocol (one round trip, then a one-way replay — the
    chainsync Intersect+RequestNext shape without the per-event
    ping-pong, which a pipelined transport elides, N2NProvider.cs:
    89-215):

      1. client → server: one JSON line
         ``{"intersect": [seq, ...]}`` (resume points, newest first;
         ``[]`` = from origin);
      2. server → client: one ack line ``{"intersection": seq|null}``
         naming WHICH point matched (the IntersectionFound response,
         N2CProvider.cs:68-85 — null = no match, replay from origin);
      3. server → client: ndjson event rows strictly after the matched
         point, ``{"eof": true}`` terminator.

    The ordering guard is seeded from the ECHOED intersection, never
    from the client's own newest point: after a reorg the server may
    match an older point in the list (that is what the newest-first
    list is FOR), and seeding from points[0] would misread the
    legitimate replay as a seq regression.

    ``events()`` yields ``ChainEvent``s; ``last_seq`` afterwards is the
    resume point to persist next to the driver checkpoint;
    ``intersection`` is the server-confirmed resume point of the last
    connection (None = origin). ``pipeline_depth`` carries the
    reference's ``CardanoNodeConnection:TCP:PipelineDepth`` (max
    chain-sync requests in flight while catching up, default 100) as
    the A2 adaptive-depth cap hint for batch consumers."""

    def __init__(
        self,
        host: str | None = None,
        port: int | None = None,
        timeout_s: float = 30.0,
        unix_path: str | None = None,
        pipeline_depth: int = 100,
    ) -> None:
        if unix_path is None and (host is None or port is None):
            raise ValueError("need host+port (TCP) or unix_path (N2C)")
        self.host, self.port, self.timeout_s = host, port, timeout_s
        self.unix_path = unix_path
        self.pipeline_depth = pipeline_depth
        self.last_seq: int | None = None
        self.intersection: int | None = None

    def events(
        self, intersect: list[int] | None = None
    ) -> Iterator[ChainEvent]:
        with _connect(
            self.host, self.port, self.unix_path, self.timeout_s
        ) as sk:
            sk.sendall(
                (json.dumps({"intersect": intersect or []}) + "\n").encode()
            )
            f = sk.makefile("r", encoding="utf-8")
            ack = json.loads(f.readline())
            if "intersection" not in ack:
                raise TransportError(
                    "server did not echo an intersection ack (got "
                    f"{sorted(ack)})"
                )
            matched = ack["intersection"]
            self.intersection = None if matched is None else int(matched)
            if intersect and self.intersection is not None and (
                self.intersection not in intersect
            ):
                raise TransportError(
                    f"server intersected at {self.intersection}, not one of "
                    f"the points we offered — protocol violation"
                )
            start = None if self.intersection is None else self.intersection + 1
            for row in _ordered(
                (r for r in map(json.loads, f) if not r.get("eof")), start
            ):
                self.last_seq = int(row["seq"])
                yield event_of_row(row)


def serve_feed_once(
    feed_rows: list[dict],
    host: str = "127.0.0.1",
    port: int = 0,
    unix_path: str | None = None,
) -> tuple[str, int]:
    """Minimal single-connection replay server for tests/fixtures: binds
    (TCP, or a Unix socket when ``unix_path`` is given), returns
    (host, port) — ``(unix_path, 0)`` for Unix — and serves ONE client
    on a daemon thread: echoes the matched intersection point, then
    replays ``feed_rows`` strictly after it. The deployment analogue is
    the node itself; this stub exists so the provider's protocol is
    exercised over a real socket."""
    import threading

    if unix_path is not None:
        srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        srv.bind(unix_path)
        srv.listen(1)
        bound = (unix_path, 0)
    else:
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
                # first MATCHING point in the client's newest-first list
                # — not necessarily points[0] (post-reorg fallback)
                after = next((p for p in pts if p in known), None)
                out = [
                    r
                    for r in feed_rows
                    if after is None or int(r["seq"]) > after
                ]
                head = json.dumps({"intersection": after}) + "\n"
                payload = "".join(json.dumps(r) + "\n" for r in out)
                conn.sendall(
                    (head + payload + json.dumps({"eof": True}) + "\n").encode()
                )

    threading.Thread(target=_serve, daemon=True).start()
    return bound[0], bound[1]


# ---------------------------------------------------------------------------
# FollowTip-shaped provider (gRPC / UtxoRPC shape)
# ---------------------------------------------------------------------------


def event_of_followtip(msg: dict) -> ChainEvent:
    """One FollowTip message → ``ChainEvent``: the U5CProvider.cs:54-70
    normalization table (A5) —

      Apply(block)  → RollForward(block.slot)
      Undo(block)   → RollBack(block.slot, Inclusive)  # undone block
                                                       # retracted too
      Reset(point)  → RollBack(point.slot, Exclusive)  # point KEPT,
                                                       # resume after it
    """
    action = msg["action"]
    if action == "apply":
        return ChainEvent("roll_forward", block_slot=int(msg["slot"]))
    if action == "undo":
        return ChainEvent(
            "roll_back", rollback_slot=int(msg["slot"]),
            rollback_type="inclusive",
        )
    if action == "reset":
        return ChainEvent(
            "roll_back", rollback_slot=int(msg["slot"]),
            rollback_type="exclusive",
        )
    raise TransportError(f"unknown FollowTip action: {action!r}")


class FollowTipShapedProvider:
    """Ordered chain events from a FollowTip-shaped endpoint — the
    reference's third live transport (U5CProvider.cs:21-76, gRPC
    UtxoRPC): the server pushes Apply/Undo/Reset messages which this
    adapter normalizes onto RollForward/RollBack(Inclusive|Exclusive)
    via :func:`event_of_followtip`, so the lifecycle sees the exact
    same event algebra as the chainsync transports.

    ``endpoint`` is ``host:port``; ``api_key`` rides the handshake as
    the ``dmtr-api-key`` header (ConfigurationChainProviderFactory.cs:
    58-62 — the reference sends it as gRPC metadata). The handshake and
    ack/eof framing match :class:`SocketLineProvider`; only the message
    vocabulary differs (actions instead of pre-normalized wire rows)."""

    def __init__(
        self, endpoint: str, api_key: str | None = None,
        timeout_s: float = 30.0,
    ) -> None:
        # the reference hands a gRPC channel a URL-shaped endpoint
        # (``https://host[:port]``, ConfigurationChainProviderFactory
        # .cs:52) — accept the same shape: optional scheme, port
        # defaulting to 443 (the Demeter/UtxoRPC TLS default)
        bare = endpoint
        for scheme in ("https://", "http://", "grpc://", "grpcs://"):
            if bare.startswith(scheme):
                bare = bare[len(scheme):]
                break
        bare = bare.rstrip("/")
        host, sep, port = bare.rpartition(":")
        if sep and port.isdigit():
            self.host, self.port = host, int(port)
        elif bare and ":" not in bare:
            self.host, self.port = bare, 443
        else:
            raise ValueError(
                f"endpoint must be [scheme://]host[:port], got {endpoint!r}"
            )
        self.api_key = api_key
        self.timeout_s = timeout_s
        self.last_seq: int | None = None
        self.intersection: int | None = None

    def events(
        self, intersect: list[int] | None = None
    ) -> Iterator[ChainEvent]:
        with socket.create_connection(
            (self.host, self.port), timeout=self.timeout_s
        ) as sk:
            headers = {"dmtr-api-key": self.api_key} if self.api_key else {}
            sk.sendall(
                (
                    json.dumps(
                        {"intersect": intersect or [], "headers": headers}
                    )
                    + "\n"
                ).encode()
            )
            f = sk.makefile("r", encoding="utf-8")
            ack = json.loads(f.readline())
            if ack.get("error"):
                raise TransportError(f"FollowTip rejected: {ack['error']}")
            matched = ack.get("intersection")
            self.intersection = None if matched is None else int(matched)
            start = None if self.intersection is None else self.intersection + 1
            for msg in _ordered(
                (m for m in map(json.loads, f) if not m.get("eof")), start
            ):
                self.last_seq = int(msg["seq"])
                yield event_of_followtip(msg)


def serve_followtip_once(
    messages: list[dict],
    host: str = "127.0.0.1",
    port: int = 0,
    require_api_key: str | None = None,
) -> tuple[str, int]:
    """Single-connection FollowTip replay server for tests/fixtures:
    checks the api-key header when ``require_api_key`` is set (rejects
    with an error line — the Demeter gateway behaviour), echoes the
    matched intersection, then streams Apply/Undo/Reset messages."""
    import threading

    srv = socket.create_server((host, port))
    bound = srv.getsockname()

    def _serve() -> None:
        with srv:
            conn, _ = srv.accept()
            with conn:
                f = conn.makefile("r", encoding="utf-8")
                req = json.loads(f.readline())
                if require_api_key is not None and (
                    req.get("headers", {}).get("dmtr-api-key")
                    != require_api_key
                ):
                    conn.sendall(
                        (json.dumps({"error": "unauthorized"}) + "\n").encode()
                    )
                    return
                pts = req.get("intersect") or []
                known = {int(m["seq"]) for m in messages}
                after = next((p for p in pts if p in known), None)
                out = [
                    m
                    for m in messages
                    if after is None or int(m["seq"]) > after
                ]
                head = json.dumps({"intersection": after}) + "\n"
                payload = "".join(json.dumps(m) + "\n" for m in out)
                conn.sendall(
                    (head + payload + json.dumps({"eof": True}) + "\n").encode()
                )

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


# ---------------------------------------------------------------------------
# provider → feed-file pump (transport boundary → Structured Streaming)
# ---------------------------------------------------------------------------


def row_of_event(ev: ChainEvent, seq: int) -> dict:
    """Inverse of :func:`event_of_row` — re-serialize a normalized
    event as the ``write_feed_file`` wire shape."""
    if ev.action == "roll_forward":
        return {"seq": seq, "action": "roll_forward",
                "block_slot": ev.block_slot,
                "rollback_slot": None, "rollback_type": None}
    return {"seq": seq, "action": "roll_back", "block_slot": None,
            "rollback_slot": ev.rollback_slot,
            "rollback_type": ev.rollback_type}


class ProviderFeedPump:
    """Tails a live transport into feed segment files — the bridge from
    the provider boundary (A1-A3) to the Structured Streaming file
    source a :class:`~argus_spark.streaming.indexer.StreamingIndexer`
    reads. This is how the reference's steady-state loop composes on
    Spark: provider → (this pump) → file source → foreachBatch →
    IndexDriver, with each layer keeping its own resume state:

      * the pump persists the transport's last seq
        (``_pump_state.json``) and offers it — newest first, behind
        any caller-supplied fallbacks — as the next connection's
        intersection points (A14);
      * the streaming checkpoint tracks which FILES were read;
      * the driver's committed floor skips replayed BLOCKS (B41).

    A crash between any two layers therefore re-delivers, never
    drops — the same at-least-once composition the provider e2e tests
    prove for the batch path.

    Scale: feed rows are ~5-column control-plane metadata (no
    payloads); segment files rotate every ``batch_rows`` events so the
    file source's listing stays proportional to the unread backlog."""

    STATE_FILE = "_pump_state.json"

    def __init__(self, provider, feed_dir: str, batch_rows: int = 512):
        self.provider = provider
        self.feed_dir = feed_dir
        self.batch_rows = batch_rows
        os.makedirs(feed_dir, exist_ok=True)

    def _state_path(self) -> str:
        return os.path.join(self.feed_dir, self.STATE_FILE)

    def resume_points(self) -> list[int]:
        try:
            with open(self._state_path()) as f:
                st = json.load(f)
            return [int(st["last_seq"])] if st.get("last_seq") is not None else []
        except (FileNotFoundError, json.JSONDecodeError, KeyError):
            return []

    def _next_idx(self) -> int:
        idxs = [
            int(f[5:13])
            for f in os.listdir(self.feed_dir)
            if f.startswith("feed-") and f.endswith(".json")
        ]
        return max(idxs) + 1 if idxs else 0

    def drain(self, intersect: list[int] | None = None) -> int:
        """One connect-and-drain cycle: replay everything the transport
        has past the intersection (pump state, newest first, then any
        caller fallbacks) into feed segments. Returns events written.
        Call again to poll the tip — the persisted seq makes each
        cycle incremental."""
        from argus_spark.sources.chain_feed import write_feed_file

        points = self.resume_points() + list(intersect or [])
        idx = self._next_idx()
        written = 0
        batch: list[dict] = []

        def _flush() -> None:
            nonlocal idx, written
            if not batch:
                return
            write_feed_file(self.feed_dir, idx, batch)
            # state persists AFTER the segment publishes: a crash
            # between them re-replays the segment's events on the next
            # drain — at-least-once, absorbed downstream (B41)
            tmp = self._state_path() + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"last_seq": batch[-1]["seq"]}, f)
            os.replace(tmp, self._state_path())
            idx += 1
            written += len(batch)
            batch.clear()

        for ev in self.provider.events(intersect=points):
            batch.append(row_of_event(ev, self.provider.last_seq))
            if len(batch) >= self.batch_rows:
                _flush()
        _flush()
        return written
