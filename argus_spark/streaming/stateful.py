"""Custom stateful streaming operators via ``applyInPandasWithState``
(SURVEY §2 B38 — ordered stateful apply, stream-native form).

The lifecycle engine keeps its state in *tables* (queryable and
retractable — the reference's model). These operators are the
complementary stream-native form for derived, non-retractable running
aggregates where per-key state in the state store is the right
tradeoff: arbitrary Python state machines per key, Arrow-batched, with
Spark handling state persistence, recovery, and (optionally) timeouts.

Scale notes: state is partitioned by the group key across executors;
one Arrow batch round-trip per key-group per micro-batch. Skewed keys
skew state partitions — salt upstream (operators/skew.py) if a key
dominates. No retraction: rollback-able state belongs in the lifecycle
store, not here.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def running_totals(
    stream: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running event count + value sum. Emits one row per key
    per micro-batch in which the key appeared (outputMode=update
    downstream). Key dtype is inherited from the input schema."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_field = stream.schema[key_col]
    out_schema = T.StructType(
        [
            T.StructField(key_col, key_field.dataType, True),
            T.StructField("total_events", T.LongType(), True),
            T.StructField("total_value", T.DoubleType(), True),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("n", T.LongType(), True),
            T.StructField("s", T.DoubleType(), True),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf[value_col].fillna(0.0).sum())
        state.update((n, s))
        yield pd.DataFrame(
            {key_col: [key[0]], "total_events": [n], "total_value": [s]}
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def session_fold(
    state: tuple[int, int, int, int],
    ts_sorted,
    gap_us: int,
    touched: dict[int, tuple[int, int, int]],
) -> tuple[int, int, int, int]:
    """Pure core of ``session_tracker``: fold one (already time-sorted)
    run of event times into the per-key session state, recording every
    touched session's current (n_events, start, end) row into
    ``touched``. State = (session_ord, start, last, n); ord == 0 means
    no event seen yet. Separated from the GroupState plumbing so the
    property test can drive it across arbitrary batch cuts."""
    ord_, start, last, n = state
    for ts in ts_sorted:
        ts = int(ts)
        if ord_ == 0:  # first event ever for this key
            ord_, start, last, n = 1, ts, ts, 1
        elif ts - last > gap_us:
            touched[ord_] = (n, start, last)  # final row
            ord_, start, last, n = ord_ + 1, ts, ts, 1
        else:
            last, n = ts, n + 1
        touched[ord_] = (n, start, last)  # provisional row
    return ord_, start, last, n


def session_tracker(
    stream: DataFrame,
    gap_us: int,
    key_col: str = "user_id",
    ts_col: str = "us",
    id_col: str = "event_id",
) -> DataFrame:
    """Streaming form of ``operators.temporal.sessionize_events``: a
    per-user gap-based session state machine. State = (session ordinal,
    session start, last event time, event count); an event whose gap to
    the previous one exceeds ``gap_us`` closes the open session and
    opens the next — identical boundary semantics (strict >, (ts, id)
    tie order) to the batch operator.

    EMISSION IS MONOTONE-MERGEABLE, which makes any downstream replay
    batching-invariant: each micro-batch emits the current row of every
    session it TOUCHED (closed ones finally, the open one provisionally),
    and for a fixed (key, session_ord) the emitted (n_events, end_us)
    only grow across batches while start_us never changes — so
    ``groupBy(key, ord).agg(max n, min start, max end)`` over appended
    emissions yields the same result under every legal micro-batch
    cut. No timeout machinery is needed to flush the final open
    session: its provisional row is already emitted.

    Ordering contract: per-key events must not regress in ``ts_col``
    across micro-batches (the A1 ordered-source contract); within a
    batch the tracker sorts by (ts, id).

    Scale: state is 4 longs per live user, partitioned by key across
    executors; emission is one row per (user, touched session) per
    batch."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_field = stream.schema[key_col]
    out_schema = T.StructType(
        [
            T.StructField(key_col, key_field.dataType, True),
            T.StructField("session_ord", T.LongType(), True),
            T.StructField("n_events", T.LongType(), True),
            T.StructField("start_us", T.LongType(), True),
            T.StructField("end_us", T.LongType(), True),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("ord", T.LongType(), True),
            T.StructField("start", T.LongType(), True),
            T.StructField("last", T.LongType(), True),
            T.StructField("n", T.LongType(), True),
        ]
    )

    def update(key, pdfs, state: GroupState):
        st = state.get if state.exists else (0, 0, 0, 0)
        touched: dict[int, tuple[int, int, int]] = {}
        # Concatenate ALL Arrow chunks before sorting: a key whose rows
        # span multiple chunks (> arrow maxRecordsPerBatch) has no
        # cross-chunk ordering guarantee, and folding chunks
        # independently could feed regressed timestamps into the fold,
        # breaking the "within a batch the tracker sorts by (ts, id)"
        # invariant the monotone-merge proof relies on.
        chunks = [c for c in pdfs if len(c)]
        if chunks:
            pdf = pd.concat(chunks, ignore_index=True)
            pdf = pdf.sort_values([ts_col, id_col])
            st = session_fold(st, pdf[ts_col], gap_us, touched)
        state.update(st)
        if touched:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(touched),
                    "session_ord": list(touched),
                    "n_events": [v[0] for v in touched.values()],
                    "start_us": [v[1] for v in touched.values()],
                    "end_us": [v[2] for v in touched.values()],
                }
            )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def funnel_tracker(
    stream: DataFrame,
    stages: list[str],
    key_col: str = "user_id",
    ts_col: str = "us",
    type_col: str = "event_type",
) -> DataFrame:
    """Streaming form of ``operators.temporal.funnel_conversion``: a
    per-user greedy funnel state machine. State = (stage reached,
    completion time of the last reached stage); an event advances the
    machine iff it is the next stage's type and STRICTLY later than
    the previous completion — identical semantics to the batch
    operator, proven by the convergence test
    (tests/test_streaming_windows.py): after draining an ordered
    stream, per-stage user counts equal the batch funnel exactly.

    Ordering contract: per-key events must not regress in ``ts_col``
    across micro-batches (the A1 ordered-source contract); within a
    batch the tracker sorts. Emits (key, stage) per key per batch it
    appeared in (outputMode=update — downstream keeps the latest row
    per key)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    key_field = stream.schema[key_col]
    out_schema = T.StructType(
        [
            T.StructField(key_col, key_field.dataType, True),
            T.StructField("stage", T.LongType(), True),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("stage", T.LongType(), True),
            T.StructField("t_prev", T.LongType(), True),
        ]
    )

    def update(key, pdfs, state: GroupState):
        # "No stage yet" is the stage==0 state itself, not a time
        # sentinel: the old ``t_prev = -1`` + unconditional ``ts >
        # t_prev`` silently blocked events with ts <= -1 from ever
        # starting the funnel, diverging from the batch operator
        # (r5-verdict item 7). t_prev is only meaningful — and only
        # consulted — once stage >= 1.
        stage, t_prev = state.get if state.exists else (0, 0)
        # Concat-then-sort across ALL Arrow chunks (same cross-chunk
        # ordering hazard as session_tracker above).
        chunks = [c for c in pdfs if len(c)]
        pdf = pd.concat(chunks, ignore_index=True) if chunks else None
        pdf = pdf.sort_values(ts_col) if pdf is not None else pd.DataFrame(
            {ts_col: [], type_col: []}
        )
        for ts, et in zip(pdf[ts_col], pdf[type_col]):
            if (
                stage < len(stages)
                and et == stages[stage]
                and (stage == 0 or int(ts) > t_prev)
            ):
                stage, t_prev = stage + 1, int(ts)
        state.update((stage, t_prev))
        yield pd.DataFrame({key_col: [key[0]], "stage": [stage]})

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
