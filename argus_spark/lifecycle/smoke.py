"""SmokeMonitor — bounded progress assertion over a running indexer
(SURVEY §2.A A22).

The reference's live smoke harness polls the output database for a
bounded time and requires every reducer to make progress, exiting
0 (healthy) or 1 (stalled) for CI consumption
(src/Argus.Sync.Example/Services/LiveSmokeMonitor.cs:12-60,
Example/README.md:40-75). Same contract here, over the store's
committed ``reducer_states``: progress = the committed resume cursor
advancing, which transitively proves data commits (cursor and data
publish in the same manifest, A11).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from argus_spark.lifecycle.store import ParquetStateStore


@dataclass
class SmokeReport:
    ok: bool
    exit_code: int
    elapsed_s: float
    start_slots: dict[str, int]
    end_slots: dict[str, int]
    stalled: list[str] = field(default_factory=list)

    def advanced(self, name: str) -> int:
        return self.end_slots.get(name, -1) - self.start_slots.get(name, -1)


class SmokeMonitor:
    """Watch ``store`` until every reducer in ``expected`` advances by
    ≥ ``min_slots`` from its starting floor, or ``timeout_s`` elapses.

    Use alongside ``StreamingIndexer.run_continuous`` (live mode) or
    after ``run_available_now`` with ``timeout_s=0`` (post-hoc assert).
    """

    def __init__(
        self,
        store: ParquetStateStore,
        expected: list[str],
        min_slots: int = 1,
        timeout_s: float = 30.0,
        poll_s: float = 0.5,
    ) -> None:
        self.store = store
        self.expected = list(expected)
        self.min_slots = min_slots
        self.timeout_s = timeout_s
        self.poll_s = poll_s

    def _floors(self) -> dict[str, int]:
        return {
            name: st.resume_slot for name, st in self.store.reducer_states().items()
        }

    def run(self, start_slots: dict[str, int] | None = None) -> SmokeReport:
        start = self._floors() if start_slots is None else dict(start_slots)
        t0 = time.monotonic()
        while True:
            now = self._floors()
            stalled = [
                n
                for n in self.expected
                if now.get(n, -1) - start.get(n, -1) < self.min_slots
            ]
            elapsed = time.monotonic() - t0
            if not stalled:
                return SmokeReport(True, 0, elapsed, start, now)
            if elapsed >= self.timeout_s:
                return SmokeReport(False, 1, elapsed, start, now, stalled)
            time.sleep(self.poll_s)
