"""Streaming-only semantics: watermarked windowed aggregation (late-data
drop) and applyInPandasWithState (custom stateful operator).

These have no DuckDB oracle by nature (SURVEY §2 B38-B41: the driver
records rows-only checks for non-SQL-expressible ops); correctness is
asserted against hand-computed expectations and the batch equivalent.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("value", T.DoubleType(), True),
    ]
)


def _write_file(d: str, idx: int, rows: list[tuple[str, int, float]]) -> None:
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"ev-{idx:04d}.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        for ts, uid, val in rows:
            f.write(json.dumps({"ts": ts, "user_id": uid, "value": val}) + "\n")
    os.replace(tmp, path)


def test_watermark_drops_late_data(spark, tmp_path):
    """1-hour tumbling count with a 30-min watermark across a restart:
    the watermark persists in the streaming checkpoint, so an event
    arriving (in a later run) for an already-finalized window is
    dropped; finalized windows emit exactly once (append mode)."""
    feed = str(tmp_path / "feed")

    emitted: dict[str, int] = {}

    def run():
        stream = spark.readStream.schema(EVENT_SCHEMA).json(feed)
        agg = (
            stream.withWatermark("ts", "30 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count("*").alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )

        def sink(batch_df, epoch_id):
            for r in batch_df.collect():
                emitted[str(r.ws)] = r.n

        q = (
            agg.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return dict(emitted)

    # run 1: window 10:00 gets 2 events; max ts 11:40 → watermark 11:10
    # → the 10:00 window ([10,11) < 11:10) finalizes with n=2.
    _write_file(feed, 0, [
        ("2024-01-01 10:05:00", 1, 1.0),
        ("2024-01-01 10:20:00", 2, 1.0),
        ("2024-01-01 11:40:00", 3, 1.0),
    ])
    got = run()
    assert got.get("2024-01-01 10:00:00") == 2, got

    # run 2 (restart, same checkpoint → watermark 11:10 recovered):
    # 10:30 is LATE (its window already finalized) → dropped;
    # 11:45 joins the open 11:00 window; 13:00 advances the watermark
    # to 12:30 which finalizes the 11:00 window with n=2 (NOT 3).
    _write_file(feed, 1, [
        ("2024-01-01 10:30:00", 4, 1.0),
        ("2024-01-01 11:45:00", 5, 1.0),
        ("2024-01-01 13:00:00", 6, 1.0),
    ])
    got = run()
    assert got.get("2024-01-01 10:00:00") == 2, got  # emitted once, unchanged
    assert got.get("2024-01-01 11:00:00") == 2, got  # late row excluded
    assert "2024-01-01 13:00:00" not in got, got     # still open


def test_apply_in_pandas_with_state_running_counts(spark, tmp_path):
    """Custom stateful operator (B38 analogue): per-user running event
    count + value sum via streaming.stateful.running_totals, checked
    against the batch groupBy on the same data."""
    from argus_spark.streaming.stateful import running_totals

    feed = str(tmp_path / "feed")
    _write_file(feed, 0, [
        ("2024-01-01 10:00:00", 1, 1.0),
        ("2024-01-01 10:01:00", 1, 2.0),
        ("2024-01-01 10:02:00", 2, 3.0),
    ])
    _write_file(feed, 1, [
        ("2024-01-01 10:03:00", 1, 4.0),
        ("2024-01-01 10:04:00", 2, 5.0),
        ("2024-01-01 10:05:00", 3, 6.0),
    ])

    stream = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(feed)
    )
    counts = running_totals(stream, "user_id", "value")
    q = (
        counts.writeStream.format("memory")
        .queryName("state_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM state_sink").collect()
    # last (largest) emission per user is the running total
    final: dict[int, tuple[int, float]] = {}
    for r in rows:
        prev = final.get(r.user_id, (0, 0.0))
        if r.total_events >= prev[0]:
            final[r.user_id] = (r.total_events, r.total_value)
    assert final == {1: (3, 7.0), 2: (2, 8.0), 3: (1, 6.0)}, rows


def test_streaming_first_wins_dedup_idempotent(spark, tmp_path):
    """Incremental exact dedup with unbounded lookback: only the first
    occurrence of a user_id ever reaches the output table, and a full
    replay (fresh checkpoint over the same feed) appends nothing."""
    from argus_spark.streaming.dedup import first_wins_dedup_sink

    feed = str(tmp_path / "feed")
    out = str(tmp_path / "deduped")
    _write_file(feed, 0, [
        ("2024-01-01 10:00:00", 1, 1.0),
        ("2024-01-01 10:01:00", 1, 2.0),   # in-batch dup
        ("2024-01-01 10:02:00", 2, 3.0),
    ])
    _write_file(feed, 1, [
        ("2024-01-01 10:03:00", 1, 4.0),   # cross-batch dup
        ("2024-01-01 10:04:00", 3, 5.0),
    ])

    def run(ckpt: str) -> None:
        stream = (
            spark.readStream.schema(EVENT_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .json(feed)
        )
        q = (
            stream.writeStream.foreachBatch(
                first_wins_dedup_sink(spark, out, ["user_id"])
            )
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run("ckpt1")
    got = sorted(
        (r.user_id, r.value) for r in spark.read.parquet(out).collect()
    )
    assert [u for u, _ in got] == [1, 2, 3], got
    # first occurrence won for user 1 (value 1.0 or 2.0 — in-batch tie
    # collapses to one row; cross-batch 4.0 must NOT be present)
    assert dict(got)[1] != 4.0, got

    run("ckpt2")  # full replay, fresh checkpoint
    n_after = spark.read.parquet(out).count()
    assert n_after == 3, n_after


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """Bounded-lookback dedup: duplicates inside the lateness horizon
    are dropped, state is watermark-evicted (Spark-native operator)."""
    from argus_spark.streaming.dedup import dedup_within_watermark

    feed = str(tmp_path / "feed")
    _write_file(feed, 0, [
        ("2024-01-01 10:00:00", 1, 1.0),
        ("2024-01-01 10:05:00", 1, 2.0),   # dup within horizon
        ("2024-01-01 10:06:00", 2, 3.0),
    ])
    stream = spark.readStream.schema(EVENT_SCHEMA).json(feed)
    deduped = dedup_within_watermark(stream, ["user_id"], "ts", "30 minutes")
    q = (
        deduped.writeStream.format("memory")
        .queryName("wm_dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = sorted(
        (r.user_id, r.value)
        for r in spark.sql("SELECT * FROM wm_dedup_sink").collect()
    )
    assert rows == [(1, 1.0), (2, 3.0)], rows


def test_watermark_replay_batching_invariant(spark):
    """The r8 red-row regression test: the watermark-dedup replay's
    RESULT must not depend on the engine's file→micro-batch
    assignment. Replay the same scripted feed under the contract
    batching (1 file/trigger) and a deliberately perturbed one
    (2 files/trigger — files 0+1 bundle, so a different duplicate
    wins; the sentinel bundles with the filler file, and the +10
    batch has completed so the watermark already covers it), and
    assert the batching-invariant aggregate is identical: every user
    exactly once, sentinel absent."""
    from argus_spark.streaming.replay import (
        WM_LATE_SENTINEL,
        _watermark_replay_run,
    )

    sf = "/root/testdata/sf0.001"

    def agg(mfpt):
        res = _watermark_replay_run(spark, sf, max_files_per_trigger=mfpt)
        rows = res.groupBy("user_id").count().collect()
        return {r.user_id: r["count"] for r in rows}

    contract, perturbed = agg(1), agg(2)
    assert contract == perturbed
    assert WM_LATE_SENTINEL not in contract
    assert set(contract.values()) == {1}


def test_delta_dedup_replay_batch_cut_invariant(spark):
    """streaming_delta_dedup_replay: the committed verified pair set
    must be BIT-IDENTICAL under every perturbed micro-batch cut of the
    arriving shard (the base index is fixed before arrival and delta
    docs never probe each other, so each doc's verdict is a pure
    function of (doc, stored index)) — and must equal the vs_base leg
    of the BATCH incremental op verified at the same τ, tying the
    streaming twin to dedup_incremental_delta's semantics."""
    from pyspark.sql import functions as F

    from argus_spark.datapipe.dedup import dedup_incremental_delta
    from argus_spark.datapipe.hashing import words_col
    from argus_spark.session import load
    from argus_spark.streaming.replay import (
        REPLAY_TAU,
        _delta_dedup_replay_run,
    )

    sf = "/root/testdata/sf0.001"

    def rows(mfpt):
        return sorted(
            (r.delta_id, r.match_id)
            for r in _delta_dedup_replay_run(spark, sf, mfpt).collect()
        )

    one, two, three = rows(1), rows(2), rows(3)
    assert one == two == three
    assert len(one) > 0  # the gate must actually see pairs

    # batch-op tie: vs_base candidates verified at τ = the replay set
    w = load(spark, sf, "documents", widen=True).select(
        "doc_id", F.array_distinct(words_col()).alias("w")
    )
    cand = (
        dedup_incremental_delta(spark, sf)
        .filter(F.col("side") == "base")
        .select("delta_id", "match_id")
    )
    i = F.size(F.array_intersect("wa", "wx"))
    verified = (
        cand.join(
            w.select(F.col("doc_id").alias("delta_id"), F.col("w").alias("wa")),
            "delta_id",
        )
        .join(
            w.select(F.col("doc_id").alias("match_id"), F.col("w").alias("wx")),
            "match_id",
        )
        .withColumn("i", i)
        .filter(
            F.col("i").cast("double")
            / (F.size("wa") + F.size("wx") - F.col("i")).cast("double")
            >= REPLAY_TAU
        )
    )
    want = sorted((r.delta_id, r.match_id) for r in verified.collect())
    assert one == want


def test_sessionize_replay_matches_batch_and_is_batching_invariant(spark):
    """session_tracker drained over the real events table must equal
    the batch sessionize_events exactly, and the monotone-merge read
    must yield the identical result under a perturbed micro-batch cut
    (2 files/trigger splits users' sessions differently across state
    updates)."""
    from argus_spark.operators.temporal import sessionize_events
    from argus_spark.streaming.replay import _sessionize_replay_run

    sf = "/root/testdata/sf0.001"

    def rows(df):
        return sorted(
            (r.user_id, r.session_ord, r.n_events, r.start_us, r.end_us)
            for r in df.collect()
        )

    batch = rows(sessionize_events(spark, sf))
    assert rows(_sessionize_replay_run(spark, sf, 1)) == batch
    assert rows(_sessionize_replay_run(spark, sf, 2)) == batch


def test_session_tracker_invariant_under_tiny_arrow_chunks(spark, tmp_path):
    """A key whose micro-batch rows span MULTIPLE Arrow record batches
    gets them as separate chunks in applyInPandasWithState with no
    cross-chunk ordering guarantee. Feed one user's events in REVERSE
    time order inside a single micro-batch (legal: the ordering
    contract binds across batches, not within) with
    maxRecordsPerBatch=2, so successive chunks regress in time; the
    tracker must concat-then-sort (r9 advice: per-chunk sort+fold
    feeds regressed timestamps into the fold and mis-segments
    sessions) and still produce the closed-form sessions."""
    import json as _json

    from argus_spark.streaming.stateful import session_tracker

    gap = 100
    # 12 events, sessions of 4 at 1000-spacing: [0..3],[1000..1003],...
    times = [1000 * s + i for s in range(3) for i in range(4)]
    feed = str(tmp_path / "feed")
    os.makedirs(feed, exist_ok=True)
    with open(os.path.join(feed, "f0.json"), "w") as f:
        for i, us in enumerate(sorted(times, reverse=True)):
            f.write(
                _json.dumps({"user_id": 7, "event_id": i, "us": us}) + "\n"
            )
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType(), True),
            T.StructField("event_id", T.LongType(), True),
            T.StructField("us", T.LongType(), True),
        ]
    )
    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    prior = spark.conf.get(key)
    spark.conf.set(key, "2")
    try:
        stream = spark.readStream.schema(schema).json(feed)
        q = (
            session_tracker(stream, gap)
            .writeStream.format("memory")
            .queryName("tinychunk_sink")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(key, prior)
    got = sorted(
        (r.session_ord, r.n_events, r.start_us, r.end_us)
        for r in spark.sql("SELECT * FROM tinychunk_sink").collect()
    )
    want = [(s + 1, 4, 1000 * s, 1000 * s + 3) for s in range(3)]
    assert got == want, (got, want)


def test_streaming_funnel_converges_to_batch_funnel(spark, tmp_path):
    """funnel_tracker (applyInPandasWithState) drained over the real
    events table — ordered feed, 3 micro-batches — must reproduce the
    batch funnel_conversion stage counts exactly."""
    import json as _json

    from argus_spark.operators.temporal import (
        FUNNEL_STAGES,
        funnel_conversion,
    )
    from argus_spark.session import load
    from argus_spark.streaming.stateful import funnel_tracker

    sf = "/root/testdata/sf0.001"
    ev = (
        load(spark, sf, "events")
        .select("user_id", F.unix_micros("ts").alias("us"), "event_type")
        .orderBy("us", "user_id")
        .collect()
    )
    feed = str(tmp_path / "feed")
    os.makedirs(feed, exist_ok=True)
    n = len(ev)
    for idx, lo in enumerate(range(0, n, (n + 2) // 3)):
        path = os.path.join(feed, f"ev-{idx:04d}.json")
        with open(path + ".tmp", "w") as f:
            for r in ev[lo : lo + (n + 2) // 3]:
                f.write(_json.dumps(
                    {"user_id": r.user_id, "us": r.us, "event_type": r.event_type}
                ) + "\n")
        os.replace(path + ".tmp", path)

    schema = T.StructType([
        T.StructField("user_id", T.LongType(), True),
        T.StructField("us", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
    ])
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).json(feed)
    )
    q = (
        funnel_tracker(stream, FUNNEL_STAGES)
        .writeStream.format("memory")
        .queryName("funnel_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM funnel_sink").collect()
    final: dict[int, int] = {}
    for r in rows:  # stage is monotone per user; keep the max emission
        final[r.user_id] = max(final.get(r.user_id, 0), r.stage)
    got = {
        s: sum(1 for st in final.values() if st >= i + 1)
        for i, s in enumerate(FUNNEL_STAGES)
    }
    want = {
        r["event_type"]: r["n_users"]
        for r in funnel_conversion(spark, sf).collect()
    }
    assert got == want, (got, want)


def test_streaming_minhash_neardup_sink(spark, tmp_path):
    """Incremental near-dup dedup: exact dup within a batch, exact dup
    across batches, and a VERIFIED near-dup (one word changed, J≈0.9)
    across batches all drop; distinct docs survive; replaying the feed
    into the same state is idempotent."""
    from argus_spark.streaming.dedup import minhash_dedup_sink

    base = "alpha bravo charlie delta echo foxtrot golf hotel india " \
           "juliet kilo lima mike november oscar papa quebec romeo " \
           "sierra tango"
    near = base.replace("tango", "uniform")  # 19/21 distinct-set J ≈ 0.905
    docs0 = [(1, base), (2, base), (3, "the quick brown fox jumps")]
    docs1 = [(4, near), (5, "entirely different words here"),
             (6, "the quick brown fox jumps")]

    feed = str(tmp_path / "docfeed")
    os.makedirs(feed, exist_ok=True)
    import time as _time

    t0 = _time.time()
    for idx, batch in enumerate([docs0, docs1]):
        p = os.path.join(feed, f"d-{idx:04d}.json")
        with open(p + ".tmp", "w") as f:
            for did, text in batch:
                f.write(json.dumps({"doc_id": did, "text": text}) + "\n")
        os.replace(p + ".tmp", p)
        # FileStreamSource orders by mtime; equal stamps make batch
        # order unspecified — pin it
        os.utime(p, (t0 + idx, t0 + idx))

    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
    ])
    out = str(tmp_path / "state")

    def drain(ckpt: str) -> None:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).json(feed)
        )
        q = (
            stream.writeStream
            .foreachBatch(minhash_dedup_sink(spark, out, tau=0.85))
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain("ck1")
    kept = {
        r.doc_id for r in spark.read.parquet(os.path.join(out, "docs")).collect()
    }
    assert kept == {1, 3, 5}, kept
    # replay with a fresh checkpoint: re-delivered docs collide with
    # their committed selves (J=1) — state unchanged
    drain("ck2")
    kept2 = [
        r.doc_id for r in spark.read.parquet(os.path.join(out, "docs")).collect()
    ]
    assert sorted(kept2) == [1, 3, 5], kept2
    bands = spark.read.parquet(os.path.join(out, "bands"))
    assert {r.doc_id for r in bands.collect()} == {1, 3, 5}


def test_streaming_minhash_sink_crash_between_writes_is_atomic(spark, tmp_path):
    """r5-verdict item 6: a crash AFTER the docs write but BEFORE the
    bands write (the former non-atomic window) must not duplicate on
    replay. Simulated torn state: epoch 1's docs dir exists on disk but
    the manifest (the single commit point) was never renamed — the
    replayed epoch must overwrite the torn dir and commit both tables
    exactly once."""
    import pyspark.sql.functions as F

    from argus_spark.streaming.dedup import (
        _committed_epochs,
        committed_bands_df,
        committed_docs_df,
        minhash_dedup_sink,
    )

    out = str(tmp_path / "state")
    sink = minhash_dedup_sink(spark, out, tau=0.85)
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")

    b0 = mk([(1, "alpha bravo charlie delta echo"), (2, "zulu yankee xray")])
    sink(b0, 0)
    assert _committed_epochs(out) == [0]

    # Torn epoch 1: docs written, bands NOT, manifest NOT (= crash in
    # the old two-append window). Write what the sink would have.
    b1 = mk([(3, "golf hotel india juliet kilo"), (1, "alpha bravo charlie delta echo")])
    b1.filter("doc_id = 3").write.mode("overwrite").parquet(
        os.path.join(out, "docs", "epoch=1")
    )
    # committed view is unaffected by the torn dir
    assert {r.doc_id for r in committed_docs_df(spark, out).collect()} == {1, 2}

    # Replay epoch 1 end-to-end: must land exactly once, both tables.
    sink(b1, 1)
    assert _committed_epochs(out) == [0, 1]
    docs = [r.doc_id for r in committed_docs_df(spark, out).collect()]
    assert sorted(docs) == [1, 2, 3], docs  # re-delivered doc 1 dropped (J=1)
    band_ids = {r.doc_id for r in committed_bands_df(spark, out).collect()}
    assert band_ids == {1, 2, 3}  # every survivor is band-indexed
    # redo of an already-committed epoch is a no-op (batchId contract)
    sink(b1, 1)
    assert sorted(
        r.doc_id for r in committed_docs_df(spark, out).collect()
    ) == [1, 2, 3]


def test_streaming_funnel_negative_timestamps_match_batch(spark, tmp_path):
    """r5-verdict item 7: the old ``t_prev = -1`` sentinel required
    ``ts > -1`` even at stage 0, so integer timestamps <= -1 could
    never start the funnel — diverging from batch ``funnel_over``.
    Drive an all-negative-timestamp stream through the tracker and
    assert per-stage user counts equal the batch funnel exactly."""
    import json as _json

    from pyspark.sql import functions as SF

    from argus_spark.operators.temporal import FUNNEL_STAGES, funnel_over
    from argus_spark.streaming.stateful import funnel_tracker

    # user 1 completes all 3 stages strictly ordered in negative time;
    # user 2 stalls at stage 1 (its click ties the signup ts — strict
    # ordering must reject it); user 3 starts at the old sentinel's
    # exact blind spot, ts = -1.
    events = [
        (1, -50, "signup"), (1, -30, "click"), (1, -10, "purchase"),
        (2, -40, "signup"), (2, -40, "click"),
        (3, -1, "signup"),
    ]
    batch = funnel_over(
        spark.createDataFrame(
            events, "user_id long, ts long, event_type string"
        ).select("user_id", SF.col("ts").cast("timestamp").alias("ts"),
                 "event_type")
    )
    want = {r["event_type"]: r["n_users"] for r in batch.collect()}
    assert want == {"signup": 3, "click": 1, "purchase": 1}, want

    feed = str(tmp_path / "negfeed")
    os.makedirs(feed, exist_ok=True)
    path = os.path.join(feed, "ev-0000.json")
    with open(path + ".tmp", "w") as f:
        for uid, us, et in events:
            f.write(_json.dumps(
                {"user_id": uid, "us": us, "event_type": et}) + "\n")
    os.replace(path + ".tmp", path)

    schema = T.StructType([
        T.StructField("user_id", T.LongType(), True),
        T.StructField("us", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
    ])
    stream = spark.readStream.schema(schema).json(feed)
    q = (
        funnel_tracker(stream, FUNNEL_STAGES)
        .writeStream.format("memory")
        .queryName("neg_funnel_sink")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "negck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    final: dict[int, int] = {}
    for r in spark.sql("SELECT * FROM neg_funnel_sink").collect():
        final[r.user_id] = max(final.get(r.user_id, 0), r.stage)
    got = {
        s: sum(1 for st in final.values() if st >= i + 1)
        for i, s in enumerate(FUNNEL_STAGES)
    }
    assert got == want, (got, want)


def test_streaming_minhash_state_compaction_atomic(spark, tmp_path):
    """compact_state folds committed epochs into one generation behind
    the same atomic manifest rename: state is value-identical before
    and after, the sink keeps working on the compacted state, and a
    crash BEFORE the manifest swap (merge dirs written, manifest not)
    leaves the old state fully visible and intact."""
    import pyspark.sql.functions as F

    from argus_spark.streaming.dedup import (
        _committed_epochs,
        committed_bands_df,
        committed_docs_df,
        compact_state,
        minhash_dedup_sink,
    )

    out = str(tmp_path / "state")
    sink = minhash_dedup_sink(spark, out, tau=0.85)
    mk = lambda rows: spark.createDataFrame(rows, "doc_id long, text string")
    sink(mk([(1, "alpha bravo charlie delta echo"), (2, "zulu yankee xray")]), 0)
    sink(mk([(3, "golf hotel india juliet kilo"),
             (1, "alpha bravo charlie delta echo")]), 1)
    before_docs = sorted(
        (r.doc_id, r.text) for r in committed_docs_df(spark, out).collect()
    )
    before_bands = sorted(
        map(tuple, committed_bands_df(spark, out)
            .select("doc_id", "band", "bh").collect())
    )

    # crash before the swap: merge dirs on disk, manifest untouched
    import json as _json
    docs = committed_docs_df(spark, out)
    docs.write.mode("overwrite").parquet(os.path.join(out, "docs", "epoch=99"))
    assert _committed_epochs(out) == [0, 1]
    assert sorted(
        (r.doc_id, r.text) for r in committed_docs_df(spark, out).collect()
    ) == before_docs

    gen = compact_state(spark, out)
    # generations live in a namespace disjoint from stream batch ids:
    # the replay-skip list is now EMPTY, so no future batch id can
    # collide with the compacted generation's id
    assert _committed_epochs(out) == []
    assert gen == 0
    assert os.path.isdir(os.path.join(out, "docs", f"gen={gen}"))
    assert sorted(
        (r.doc_id, r.text) for r in committed_docs_df(spark, out).collect()
    ) == before_docs
    assert sorted(
        map(tuple, committed_bands_df(spark, out)
            .select("doc_id", "band", "bh").collect())
    ) == before_bands
    # old epoch dirs GC'd
    assert not os.path.isdir(os.path.join(out, "docs", "epoch=0"))

    # REGRESSION (data-loss bug): the next real micro-batch carries the
    # CONSECUTIVE batch id (2 == old max epoch + 1, which the former
    # single-namespace design burned as the compacted id, silently
    # dropping this batch). It must be processed, and the near-dup
    # probe against compacted state must still work: dup of doc 3 drops.
    sink(mk([(9, "golf hotel india juliet kilo"),
             (10, "completely novel content here")]), 2)
    docs_now = {r.doc_id for r in committed_docs_df(spark, out).collect()}
    assert docs_now == {1, 2, 3, 10}, docs_now
    assert _committed_epochs(out) == [2]

    # a second compaction folds gen=0 + epoch=2 into gen=1
    gen2 = compact_state(spark, out)
    assert gen2 == 1 and _committed_epochs(out) == []
    docs_now = {r.doc_id for r in committed_docs_df(spark, out).collect()}
    assert docs_now == {1, 2, 3, 10}, docs_now


# ---- pure-fold property: session state machine vs closed form ----------

from hypothesis import given, settings
from hypothesis import strategies as hst


@settings(max_examples=300, deadline=None)
@given(
    ts=hst.lists(hst.integers(min_value=0, max_value=10**7), max_size=60),
    cuts=hst.lists(hst.integers(min_value=0, max_value=60), max_size=4),
    gap=hst.integers(min_value=1, max_value=10**6),
)
def test_session_fold_cut_invariant_matches_closed_form(ts, cuts, gap):
    """session_fold across ARBITRARY batch cuts, monotone-merged, must
    equal the independent closed form (split sorted times where the
    consecutive gap exceeds the horizon) — the pure-core version of
    the replay's batching-invariance, over random inputs."""
    from argus_spark.streaming.stateful import session_fold

    ts = sorted(ts)
    # independent reference: group consecutive times by gap rule
    ref = {}
    groups = []
    for t in ts:
        if not groups or t - groups[-1][-1] > gap:
            groups.append([t])
        else:
            groups[-1].append(t)
    for i, g in enumerate(groups, start=1):
        ref[i] = (len(g), g[0], g[-1])

    # fold the same times across the random batch cuts, merging the
    # per-batch touched rows monotonically (the replay's read rule)
    merged = {}
    state = (0, 0, 0, 0)
    bounds = sorted({min(c, len(ts)) for c in cuts} | {len(ts)})
    lo = 0
    for b in bounds:
        touched = {}
        state = session_fold(state, ts[lo:b], gap, touched)
        for k, v in touched.items():
            old = merged.get(k)
            merged[k] = (
                v
                if old is None
                else (max(old[0], v[0]), min(old[1], v[1]), max(old[2], v[2]))
            )
        lo = b
    assert merged == ref


def test_embedding_delta_replay_batch_cut_invariant(spark):
    """streaming_embedding_delta_replay: the committed verified pair
    set must be BIT-IDENTICAL (including cos_sim doubles — the JSON
    feed round-trip is exact) under every perturbed micro-batch cut,
    and must equal the 'base'-side leg of the BATCH incremental op —
    tying the streaming twin to embedding_incremental_delta's
    semantics the same way the token-shingle pair is tied."""
    from pyspark.sql import functions as F

    from argus_spark.datapipe.dedup import embedding_incremental_delta
    from argus_spark.streaming.replay import _embedding_delta_replay_run

    sf = "/root/testdata/sf0.001"

    def rows(mfpt):
        return sorted(
            (r.delta_id, r.match_id, r.cos_sim)
            for r in _embedding_delta_replay_run(spark, sf, mfpt).collect()
        )

    one, two, three = rows(1), rows(2), rows(3)
    assert one == two == three
    assert len(one) > 0  # the gate must actually see pairs

    # batch-op tie: the op's verified 'base' side = the replay set
    batch = sorted(
        (r.delta_id, r.match_id, r.cos_sim)
        for r in embedding_incremental_delta(spark, sf)
        .filter(F.col("side") == "base")
        .select("delta_id", "match_id", "cos_sim")
        .collect()
    )
    assert one == batch


def test_read_committed_empty_run_returns_empty_frame(spark, tmp_path):
    """An all-empty replay run (every micro-batch verified nothing →
    zero part files) must return an EMPTY frame of the declared
    schema, not fail parquet schema inference on a directory of
    _SUCCESS markers (r13 review finding)."""
    from argus_spark.streaming.replay import _read_committed

    d = str(tmp_path / "res")
    # case 1: directory never created (no batch ever wrote)
    out = _read_committed(spark, d, "delta_id long, match_id long")
    assert out.count() == 0 and out.columns == ["delta_id", "match_id"]
    # case 2: directory exists but holds no part files (empty writes)
    import os

    os.makedirs(d, exist_ok=True)
    open(os.path.join(d, "_SUCCESS"), "w").close()
    out = _read_committed(spark, d, "delta_id long, match_id long")
    assert out.count() == 0
