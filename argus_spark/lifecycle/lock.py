"""SingleInstanceLock — advisory single-writer mutual exclusion
(SURVEY §2.A A19).

The reference guards its sink with a Postgres session advisory lock
(PostgresSingleInstanceLock.cs:28-201: FNV-1a key of the schema name,
poll ``pg_try_advisory_lock``, health-probe the holding connection) or
a Mongo TTL lease (MongoSingleInstanceLock.cs:11-55: atomic upsert of a
lease document, renew at < lease interval, steal when expired).

A Spark driver is already the single writer for its own job, but the
*store* can be shared by several drivers (backfill + tail, or a crashed
driver's supervisor restart racing the old process). This lock is the
Mongo-lease pattern on the store's filesystem, which is the only
coordination substrate the store itself needs:

  * acquire  = atomic ``O_CREAT | O_EXCL`` create of ``_lock.json``
               holding (owner, expires_at) — the atomic-upsert analogue
  * renew    = rewrite-and-rename while held, pushing expires_at out
  * steal    = if the lease has expired, unlink + retry create (the
               dead holder's supervisor may be gone for good)
  * release  = unlink when owner matches

Crash-safety: a holder that dies without releasing simply lets the
lease expire — exactly the Mongo TTL behaviour. ``held()`` is the
health-probe: callers embedding long work should assert it still owns
the lease before each commit (the reference stops the host on loss,
CardanoIndexWorker.cs:81-84).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid


class LockLostError(Exception):
    """The lease expired (or was stolen) while we believed we held it."""


class SingleInstanceLock:
    """``renew_s`` / ``poll_s`` / ``health_s`` mirror the reference's
    ``Sync:SingleInstanceLock:{LeaseSeconds,RenewSeconds,PollSeconds,
    HealthCheckSeconds}`` knobs (MongoSingleInstanceLock.cs:54-55,
    PostgresSingleInstanceLock.cs:64-65): renew cadence while held,
    acquisition poll interval, and the suggested ``held()`` health-probe
    cadence for embedding callers. The reference's minimum clamps
    (lease ≥ 2 s, others ≥ 1 s) are applied at CONFIG-read time
    (lifecycle/config.py), not here — tests use sub-second leases."""

    def __init__(
        self,
        root: str,
        lease_s: float = 30.0,
        owner: str | None = None,
        renew_s: float = 10.0,
        poll_s: float = 2.0,
        health_s: float = 5.0,
    ):
        self.path = os.path.join(root, "_lock.json")
        self.lease_s = lease_s
        self.renew_s = renew_s
        self.poll_s = poll_s
        self.health_s = health_s
        self.owner = owner or f"{os.getpid()}-{uuid.uuid4().hex[:8]}"
        os.makedirs(root, exist_ok=True)

    # ---------------- internals ----------------

    def _read(self) -> dict | None:
        try:
            with open(self.path) as fh:
                return json.load(fh)
        except (FileNotFoundError, json.JSONDecodeError):
            return None

    def _try_create(self) -> bool:
        try:
            fd = os.open(self.path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            return False
        try:
            os.write(
                fd,
                json.dumps(
                    {"owner": self.owner, "expires_at": time.time() + self.lease_s}
                ).encode(),
            )
        finally:
            os.close(fd)
        return True

    # ---------------- API (mirrors ISingleInstanceLock) ----------------

    def _steal_marker_path(self, cur: dict) -> str:
        """Marker file naming the SPECIFIC expired lease being stolen.
        The token binds to the lease's content, so claiming it grants
        the right to remove that lease and nothing newer."""
        token = hashlib.sha256(
            f"{cur.get('owner')}|{cur.get('expires_at')}".encode()
        ).hexdigest()[:16]
        return self.path + f".steal-{token}"

    def _steal(self, cur: dict) -> bool:
        """Atomic expired-lease takeover. A bare unlink+create has a
        double-steal TOCTOU: two processes that both read the expired
        lease each unlink+create, and the slower unlink removes the
        faster one's FRESH lock — two believed holders. Instead, the
        right to remove lease `cur` is claimed by an O_CREAT|O_EXCL
        marker keyed to cur's content: exactly one claimer wins, and
        the unlink it performs can only ever remove the lease it
        observed (a renewed/fresh lock has a different token and is
        never claimed by this marker)."""
        marker = self._steal_marker_path(cur)
        try:
            fd = os.open(marker, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
        except FileExistsError:
            # another process claimed this steal. If it crashed between
            # claiming and completing, the marker goes stale — expire it
            # on lease cadence so the slot cannot deadlock.
            try:
                if time.time() - os.path.getmtime(marker) > self.lease_s:
                    os.unlink(marker)
            except FileNotFoundError:
                pass
            # either way, just race for the (soon-)empty slot
            return self._try_create()
        try:
            # Holding the marker serializes verify+unlink: no other
            # stealer can proceed (needs this marker), slot-racers need
            # the slot empty, and an expired lease cannot be renewed
            # (renew() raises). Re-verify the on-disk lease is STILL the
            # one we observed — if a completed steal already replaced it
            # with a fresh lease (our read was stale), we must not touch
            # the slot.
            live = self._read()
            if live is not None and (
                live.get("owner") != cur.get("owner")
                or live.get("expires_at") != cur.get("expires_at")
            ):
                return self._try_create()
            try:
                os.unlink(self.path)
            except FileNotFoundError:
                pass
            return self._try_create()
        finally:
            try:
                os.unlink(marker)
            except FileNotFoundError:
                pass

    def try_acquire(self) -> bool:
        """One non-blocking attempt (``pg_try_advisory_lock``)."""
        if self._try_create():
            return True
        cur = self._read()
        if cur is None:
            # unreadable/corrupt lease (or vanished between create and
            # read) — steal under the marker protocol with an empty
            # observation; re-verify inside _steal keeps it safe if a
            # valid fresh lease appears meanwhile.
            return self._steal({})
        if cur.get("expires_at", 0) <= time.time():
            # expired lease — steal (Mongo's expired-lease takeover)
            return self._steal(cur)
        return cur.get("owner") == self.owner

    def wait_for_acquisition(
        self, timeout_s: float | None = None, poll_s: float | None = None
    ) -> bool:
        """Park until the lock is ours (WaitForAcquisitionAsync). Returns
        False only on timeout. ``poll_s`` defaults to the configured
        ``PollSeconds`` cadence."""
        poll_s = self.poll_s if poll_s is None else poll_s
        deadline = None if timeout_s is None else time.monotonic() + timeout_s
        while True:
            if self.try_acquire():
                return True
            if deadline is not None and time.monotonic() >= deadline:
                return False
            time.sleep(poll_s)

    def held(self) -> bool:
        """Health probe: do we still own an unexpired lease?"""
        cur = self._read()
        return (
            cur is not None
            and cur.get("owner") == self.owner
            and cur.get("expires_at", 0) > time.time()
        )

    def renew(self) -> None:
        """Extend the lease (must renew at < lease_s cadence while busy).
        Raises LockLostError if the lease was lost — the caller should
        stop, like the reference stops its host on lock loss."""
        if not self.held():
            raise LockLostError(f"lease at {self.path} lost by {self.owner}")
        tmp = self.path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(
                {"owner": self.owner, "expires_at": time.time() + self.lease_s}, fh
            )
        os.rename(tmp, self.path)

    def release(self) -> None:
        if self.held():
            try:
                os.unlink(self.path)
            except FileNotFoundError:
                pass

    # ---------------- context manager ----------------

    def __enter__(self) -> "SingleInstanceLock":
        if not self.wait_for_acquisition():
            raise LockLostError("unreachable: untimed wait returned False")
        return self

    def __exit__(self, *exc) -> None:
        self.release()


class LeaseKeeper:
    """Background renewal of a held lease — the reference's renew loop
    (MongoSingleInstanceLock.cs: renew every RenewSeconds < lease;
    PostgresSingleInstanceLock health-probes and STOPS THE HOST on
    loss). A long busy stretch must not let the lease lapse: an
    expired lease is stealable, and a second instance running
    concurrently is the exact corruption the lock exists to prevent.

    ``lost`` latches True if a renewal ever fails; ``on_lost`` (if
    given) fires once from the renewal thread — wire it to stop the
    work loop, mirroring IHostApplicationLifetime.StopApplication."""

    def __init__(self, lock: SingleInstanceLock, on_lost=None) -> None:
        import threading

        self.lock = lock
        self.lost = False
        self._on_lost = on_lost
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)

    def _run(self) -> None:
        while not self._stop.wait(self.lock.renew_s):
            try:
                self.lock.renew()
            except LockLostError:
                self.lost = True
                if self._on_lost is not None:
                    try:
                        self._on_lost()
                    except Exception:
                        pass
                return

    def __enter__(self) -> "LeaseKeeper":
        self._thread.start()
        return self

    def __exit__(self, *exc) -> None:
        self.stop()

    def stop(self) -> None:
        self._stop.set()
        self._thread.join(timeout=max(1.0, self.lock.renew_s * 2))
