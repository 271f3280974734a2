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
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
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
