"""Scoped caching for registered queries.

Several datapipe queries materialize a skinny intermediate (candidate
pairs, signatures, cluster assignments) with ``.cache()`` because their
verify stage consumes it from multiple plan branches — without the
cache Catalyst recomputes the expensive subtree per branch (measured
5-20x wall-time regressions, r6 bench campaign). But the returned
DataFrame's lineage still references the cached frame, so the query
function itself can never unpersist it — and a long-lived session that
runs many queries (the driver's 50-query sweep, bench's loop) would pin
one executor-memory copy per query forever (r6 verdict hygiene item).

The contract here: query functions register their caches through
``scoped_cache()``; the registry wrapper (``__spark_entry__.queries``)
calls ``flush_scoped()`` before constructing each query, so at any
moment at most ONE query's frames are pinned. Unpersisting never breaks
correctness — a still-held DataFrame just recomputes — so an external
caller holding an old result loses only the cache, not the answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_LIVE: list[DataFrame] = []


def scoped_cache(df: DataFrame) -> DataFrame:
    """Cache ``df`` and track it for release at the next flush."""
    df = df.cache()
    _LIVE.append(df)
    return df


def flush_scoped() -> int:
    """Unpersist every tracked frame (returns how many were released).

    Called by the registry wrapper before each query construction and
    by harnesses after a sweep; safe to call any time — consumers of an
    unpersisted frame recompute from lineage."""
    n = 0
    while _LIVE:
        df = _LIVE.pop()
        try:
            # Async on purpose (r14, measured): unpersist(blocking=True)
            # was tried against the "Asked to cache already cached
            # data" re-registration race and made composed-plan repeats
            # ~10× WORSE (curation 16 → 158 s/run — the synchronous
            # block-removal wait serializes against the 32-core local
            # executor's in-flight work). The async race costs at most
            # a recompute of a skinny frame; the blocking wait costs
            # the wall. Keep async.
            df.unpersist()
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n
