"""Temporal / analytical operators over the ``events`` stream table —
the stretch surface SURVEY §2 marks "explicitly absent" in the
reference (time windows, as-of/range joins, cube/grouping sets,
percentiles, approximate aggregates), provided via Spark built-ins.

Scale notes:
  * All window aggs are partial-aggregatable groupBys — one shuffle on
    (window, key); Catalyst handles map-side combine.
  * The as-of join is the union+ordered-window formulation — ONE
    sort-shuffle by (user, ts); never a per-key loop or a point lookup
    per row. This is the formulation that survives 100 TB.
  * The range join buckets time into gap-sized bins and joins on
    (key, bin±1) — candidate pairs stay linear in data size for fixed
    gap; the exact predicate filters inside the bucket. A raw theta
    join (the oracle) would be quadratic.
  * Doubles aggregate via the fixed-point convention (``_fx``) so sums
    are order-free and engine-identical.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from argus_spark.operators.relational import FX, _fx
from argus_spark.session import load

# --------------------------------------------------------------------------
# Time-window aggregations (tumbling / sliding / session)
# --------------------------------------------------------------------------


def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows per event_type: count + exact sum.
    In streaming mode the same expression runs behind a watermark
    (see streaming tests); windows align to epoch hours."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_fx(F.col("value"))).alias("_sv"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            (F.col("_sv").cast("double") / FX).alias("sum_value"),
        )
    )


TUMBLING_WINDOW_AGG_SQL = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0
         AS sum_value
FROM events GROUP BY 1, 2
"""


def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-hour windows sliding by 1 hour (each event lands in two
    windows) — count per window."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


SLIDING_WINDOW_AGG_SQL = """
SELECT date_trunc('hour', ts) - o.o * INTERVAL 1 HOUR AS window_start,
       count(*) AS n_events
FROM events CROSS JOIN (VALUES (0), (1)) AS o(o)
GROUP BY 1
"""


def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions with a 30-minute inactivity gap: session start,
    event count, exact value sum. ``session_window`` is the built-in
    merging-window operator (streaming-capable); the oracle derives the
    identical sessionization with a lag-gap-cumsum window."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(_fx(F.col("value"))).alias("_sv"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            (F.col("_sv").cast("double") / FX).alias("sum_value"),
        )
    )


SESSION_WINDOW_AGG_SQL = """
WITH g AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
), s AS (
  SELECT user_id, ts, value,
         sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sess_id
  FROM g
)
SELECT user_id, min(ts) AS session_start, count(*) AS n_events,
       CAST(sum(CAST(floor(value * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0
         AS sum_value
FROM s GROUP BY user_id, sess_id
"""


# --------------------------------------------------------------------------
# As-of join (union + ordered window — the 100 TB formulation)
# --------------------------------------------------------------------------


def asof_join_prior_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every click, the user's latest strictly-prior view (as-of
    join, left semantics). Both streams union into ONE ordered window
    per user — a single sort-shuffle, no per-row lookups. (user_id, ts)
    is unique in the feed, so the order is total and the result exact."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_type", "event_id", "value"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    prior_view = F.last(
        F.when(
            F.col("event_type") == "view",
            F.struct(F.col("event_id"), F.col("value")),
        ),
        ignorenulls=True,
    ).over(w)
    return (
        e.withColumn("pv", prior_view)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("pv.event_id").alias("view_id"),
            F.col("pv.value").alias("view_value"),
        )
    )


ASOF_JOIN_PRIOR_VIEW_SQL = """
WITH t AS (
  SELECT event_id, user_id, ts, event_type,
         last_value(CASE WHEN event_type = 'view'
                         THEN struct_pack(event_id := event_id, value := value)
                    END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv
  FROM events
)
SELECT event_id AS click_id, user_id,
       pv.event_id AS view_id, pv.value AS view_value
FROM t WHERE event_type = 'click'
"""


# --------------------------------------------------------------------------
# Range join (bucketed — linear candidates for fixed gap)
# --------------------------------------------------------------------------

RANGE_GAP_US = 300_000_000  # 5 minutes in microseconds


def range_join_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairs of events by the same user within 5 minutes of each other.
    Scale shape: bucket time into gap-sized bins, probe (key, bin±1)
    with an equi-join, verify the exact predicate inside the bucket —
    candidates stay O(data × bucket-occupancy), never O(n²). The
    oracle is the quadratic theta join (fine at oracle SF)."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    a = e.select(
        "user_id",
        F.col("event_id").alias("ev_a"),
        F.col("us").alias("us_a"),
        F.explode(
            F.array(
                (F.col("us") / RANGE_GAP_US).cast("long") - 1,
                (F.col("us") / RANGE_GAP_US).cast("long"),
                (F.col("us") / RANGE_GAP_US).cast("long") + 1,
            )
        ).alias("bin"),
    )
    b = e.select(
        "user_id",
        F.col("event_id").alias("ev_b"),
        F.col("us").alias("us_b"),
        (F.col("us") / RANGE_GAP_US).cast("long").alias("bin"),
    )
    return (
        a.join(b, ["user_id", "bin"], "inner")
        .filter(
            (F.col("ev_a") < F.col("ev_b"))
            & (F.abs(F.col("us_a") - F.col("us_b")) <= RANGE_GAP_US)
        )
        .select(
            "user_id", "ev_a", "ev_b",
            F.abs(F.col("us_a") - F.col("us_b")).alias("gap_us"),
        )
    )


RANGE_JOIN_PAIRS_SQL = f"""
SELECT a.user_id, a.event_id AS ev_a, b.event_id AS ev_b,
       abs(epoch_us(a.ts) - epoch_us(b.ts)) AS gap_us
FROM events a JOIN events b
  ON a.user_id = b.user_id AND a.event_id < b.event_id
WHERE abs(epoch_us(a.ts) - epoch_us(b.ts)) <= {RANGE_GAP_US}
"""


# --------------------------------------------------------------------------
# Cube / grouping sets / percentiles / approx
# --------------------------------------------------------------------------


def cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, hour-of-day): all four grouping
    combinations in one pass (partial-aggregated expand)."""
    e = load(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").cast("long").alias("hr")
    )
    return e.cube("event_type", "hr").agg(F.count("*").alias("n"))


CUBE_COUNTS_SQL = """
SELECT event_type, hr, count(*) AS n
FROM (SELECT event_type, hour(ts)::BIGINT AS hr FROM events)
GROUP BY CUBE (event_type, hr)
"""


def grouping_sets_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((event_type), (user_id), ()): totals by
    type, by user, and grand total — one scan, one expand."""
    e = load(spark, sf_dir, "events")
    e.createOrReplaceTempView("_gs_events")
    return spark.sql(
        """
        SELECT event_type, user_id,
               sum(CAST(floor(value * 1000000.0) AS BIGINT)) AS sv_fx,
               count(*) AS n
        FROM _gs_events
        GROUP BY GROUPING SETS ((event_type), (user_id), ())
        """
    ).select(
        "event_type",
        "user_id",
        (F.col("sv_fx").cast("double") / FX).alias("sum_value"),
        "n",
    )


GROUPING_SETS_VALUE_SQL = """
SELECT event_type, user_id,
       CAST(sum(CAST(floor(value * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0
         AS sum_value,
       count(*) AS n
FROM events
GROUP BY GROUPING SETS ((event_type), (user_id), ())
"""


def median_value_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median per event_type (Spark ``percentile``
    ≡ DuckDB ``quantile_cont`` — both sort + linear interpolation).
    Exact percentile is a full sort per group; at 100 TB prefer
    ``approx_percentile`` (see approx_distinct_users for the pattern)."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.percentile("value", 0.5).alias("median_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
    )


MEDIAN_VALUE_BY_TYPE_SQL = """
SELECT event_type,
       quantile_cont(value, 0.5) AS median_value,
       min(value) AS min_value,
       max(value) AS max_value
FROM events GROUP BY event_type
"""


APPROX_DISTINCT_RSD = 0.01  # HLL++ target relative standard deviation
APPROX_DISTINCT_BOUND = 0.05  # hard contract: |approx-exact|/exact <= 5 %


def approx_distinct_users_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct users per event_type (rsd 1%) next to
    the exact count — the 100 TB cardinality estimator (no per-key set
    materialization, mergeable sketches). Raw form for the error-bound
    unit test; the registered/oracled query is ``approx_distinct_users``
    below (sketch values are engine-specific, so the raw estimate can
    never hash-match a DuckDB oracle)."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", APPROX_DISTINCT_RSD).alias(
            "approx_users"
        ),
        F.count_distinct("user_id").alias("exact_users"),
    )


def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oracle-checkable contract for the HLL++ estimator: emit the exact
    distinct count plus a boolean asserting the approximation landed
    within ±5 % of it. The DuckDB oracle computes the exact count and a
    literal TRUE — if Spark's sketch ever drifts past the bound the
    boolean flips and the value-hash goes red. HLL register merge is
    max-based (commutative/associative), so the estimate is
    deterministic for a fixed dataset regardless of partitioning."""
    raw = approx_distinct_users_raw(spark, sf_dir)
    rel_err = F.abs(F.col("approx_users") - F.col("exact_users")) / F.col(
        "exact_users"
    )
    return raw.select(
        "event_type",
        "exact_users",
        (rel_err <= F.lit(APPROX_DISTINCT_BOUND)).alias("approx_within_bound"),
    )


APPROX_DISTINCT_USERS_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS approx_within_bound
FROM events GROUP BY event_type
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-cohort retention matrix: users grouped by their first
    active day; for each (cohort_day, day_offset) the count of distinct
    cohort users active that many days later — the standard engagement
    rollup. Two partial-agged shuffles at scale: per-user first-day
    (one groupBy user), then the (cohort, offset) distinct-user count;
    no self-join — first_day rides a per-user aggregation joined back
    broadcast-free by staying in the same aggregation pipeline. All
    outputs are integers/dates — engine-exact."""
    e = load(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    )
    per_user_day = e.distinct()  # one row per (user, active day)
    first_day = per_user_day.groupBy("user_id").agg(
        F.min("day").alias("cohort_day")
    )
    return (
        per_user_day.join(first_day, "user_id")
        .select(
            # ISO string, not DateType: pandas canonicalizes Spark DATE
            # to datetime.date but database DATE to a midnight
            # Timestamp — stringifying on both sides keeps the harness
            # hash dtype-independent
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff(F.col("day"), F.col("cohort_day")).cast("long").alias(
                "day_offset"
            ),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


COHORT_RETENTION_SQL = """
WITH d AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), f AS (
  SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id
)
SELECT strftime(cohort_day, '%Y-%m-%d') AS cohort_day,
       (day - cohort_day)::BIGINT AS day_offset,
       count(DISTINCT d.user_id)::BIGINT AS n_users
FROM d JOIN f USING (user_id)
GROUP BY 1, 2
"""


FUNNEL_STAGES = ["signup", "click", "purchase"]


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event funnel — the classic product-analytics rollup:
    how many users reach stage k having passed stages 1..k-1 IN TIME
    ORDER (stage k's event must be strictly later than the user's
    stage-k-1 completion time; completion = the EARLIEST qualifying
    event, the standard greedy funnel semantics — earliest completion
    maximizes the remaining window, so greedy is optimal and the count
    is order-maximal).

    Plan: one stage-filtered min-ts aggregation per stage plus an
    equi-join per transition, all keyed on user_id — partial-agged,
    broadcast-eligible (the qualified-user set shrinks every stage),
    co-partitioned end-to-end if events are laid out by user_id.
    Output is integers only (stage ordinal + distinct-user counts) —
    engine-exact with no float hashing concerns."""
    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    return funnel_over(ev)


def funnel_over(ev: DataFrame, stages: list[str] | None = None) -> DataFrame:
    """Core of ``funnel_conversion`` over any (user_id, ts, event_type)
    frame — separated so property tests (and callers with their own
    event sources) can drive arbitrary streams through the identical
    plan."""
    stages = stages if stages is not None else FUNNEL_STAGES
    cur = (
        ev.filter(F.col("event_type") == stages[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    )
    stage_counts = [
        cur.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(1).cast("long").alias("stage"),
            F.lit(stages[0]).alias("event_type"),
            "n_users",
        )
    ]
    for i, s in enumerate(stages[1:], start=2):
        prev = cur.select("user_id", F.col("t").alias("t_prev"))
        cur = (
            ev.filter(F.col("event_type") == s)
            .join(prev, "user_id")
            .filter(F.col("ts") > F.col("t_prev"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
        )
        stage_counts.append(
            cur.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
                F.lit(i).cast("long").alias("stage"),
                F.lit(s).alias("event_type"),
                "n_users",
            )
        )
    out = stage_counts[0]
    for sc in stage_counts[1:]:
        out = out.unionByName(sc)
    return out


def _funnel_sql() -> str:
    ctes = [
        f"s1 AS (SELECT user_id, min(ts) AS t FROM events "
        f"WHERE event_type = '{FUNNEL_STAGES[0]}' GROUP BY user_id)"
    ]
    for i, s in enumerate(FUNNEL_STAGES[1:], start=2):
        ctes.append(
            f"s{i} AS (SELECT e.user_id, min(e.ts) AS t FROM events e "
            f"JOIN s{i - 1} p USING (user_id) "
            f"WHERE e.event_type = '{s}' AND e.ts > p.t GROUP BY e.user_id)"
        )
    selects = " UNION ALL ".join(
        f"SELECT {i + 1}::BIGINT AS stage, '{s}' AS event_type, "
        f"count(*)::BIGINT AS n_users FROM s{i + 1}"
        for i, s in enumerate(FUNNEL_STAGES)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + selects


FUNNEL_CONVERSION_SQL = _funnel_sql()


APPROX_Q_ACC = 10000     # GK sketch accuracy (rank error <= n/ACC)
APPROX_Q_BOUND = 0.05    # |approx_p50 - exact_p50| <= 5% of the p05-p95 spread


def approx_quantiles_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-quantile contract, same shape as
    ``approx_distinct_users``: the 100 TB estimator is
    ``percentile_approx`` (a mergeable GK sketch — no per-group sort,
    rank error ≤ n/accuracy), and the hard oracle signal comes from
    EXACT rank-based discrete quantiles computed alongside it plus a
    boolean asserting the sketch landed within 5 % of the p05–p95
    spread. Exact quantiles use an explicit 1-based rank formula
    (``ceil(p·n)`` over a (value, event_id)-ordered ranking) instead of
    engine ``percentile`` builtins, so both engines select the SAME
    data element — every emitted number is a stored value, never
    interpolated arithmetic, hence bit-identical across engines. The
    oracle emits a literal TRUE for the bound flag: a sketch regression
    flips the boolean and the value hash goes red."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    nw = Window.partitionBy("event_type")
    ranked = (
        e.select("event_type", "event_id", "value")
        .withColumn("rn", F.row_number().over(w))
        .withColumn("n", F.count(F.lit(1)).over(nw))
    )

    def _at(a: int, b: int) -> F.Column:
        # value at 1-based rank ceil(a*n/b) = floor((a*n + b - 1)/b)
        idx = F.floor((F.col("n") * a + (b - 1)) / b)
        return F.max(F.when(F.col("rn") == idx, F.col("value")))

    agg = ranked.groupBy("event_type").agg(
        F.max("n").alias("n_events"),
        _at(1, 20).alias("p05"),
        _at(1, 2).alias("exact_p50"),
        _at(19, 20).alias("exact_p95"),
        F.percentile_approx("value", 0.5, APPROX_Q_ACC).alias("approx_p50"),
    )
    within = F.abs(F.col("approx_p50") - F.col("exact_p50")) <= F.lit(
        APPROX_Q_BOUND
    ) * (F.col("exact_p95") - F.col("p05"))
    return agg.select(
        "event_type", "n_events", "exact_p50", "exact_p95",
        within.alias("approx_within_bound"),
    )


APPROX_QUANTILES_VALUE_SQL = """
WITH r AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type,
       max(n)::BIGINT AS n_events,
       max(CASE WHEN rn = (n + 1) // 2 THEN value END) AS exact_p50,
       max(CASE WHEN rn = (19 * n + 19) // 20 THEN value END) AS exact_p95,
       TRUE AS approx_within_bound
FROM r GROUP BY event_type
"""


def user_path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition counts over per-user event paths: for every
    consecutive event pair in a user's (ts, event_id)-ordered stream,
    count (from_type → to_type) — the classic product-analytics "what
    do users do next" rollup feeding sankeys and next-step models.

    Scale shape: the lag window partitions by user_id — per-user
    sequences are short and user cardinality is huge, so the ONE
    window exchange is well-spread (the opposite regime from the
    fluency token window); the closing (from,to) groupBy
    partial-aggregates over ≤ |event_types|² keys. event_id breaks ts
    ties so the path order — and hence the oracle comparison — is
    total."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = e.withColumn("prev_type", F.lag("event_type").over(w))
    return (
        s.filter(F.col("prev_type").isNotNull())
        .groupBy(
            F.col("prev_type").alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_transitions"))
    )


USER_PATH_TRANSITIONS_SQL = """
WITH s AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
)
SELECT prev_type AS from_type, event_type AS to_type,
       count(*)::BIGINT AS n_transitions
FROM s WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""


SESSION_GAP_US = 1_800_000_000  # 30 minutes in microseconds


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization with explicit session IDENTITY — the
    complement of ``session_window_agg`` (which only aggregates):
    assign each user's events to numbered sessions (a new session
    starts when the gap to the previous event exceeds 30 minutes),
    then emit per-session stats. This is the op that materializes a
    session dimension other queries can join.

    Plan: ONE window exchange on user_id (huge cardinality, short
    per-user sequences — the well-spread regime, same argument as
    ``user_path_transitions``); the session ordinal is a running sum
    of new-session flags inside the same window spec, so Catalyst
    fuses both window functions into one Window node; the closing
    per-(user, session) rollup is partial-agged. event_id breaks ts
    ties so session boundaries are total-order deterministic."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    return sessionize_over(e)


def sessionize_over(e: DataFrame, gap_us: int = SESSION_GAP_US) -> DataFrame:
    """Core of ``sessionize_events`` over any (user_id, event_id, us)
    frame — separated (the ``funnel_over`` pattern) so property tests
    and callers with their own event sources drive the identical
    plan."""
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    flagged = e.withColumn(
        "new_session",
        F.when(
            (F.col("us") - F.lag("us").over(w)) > gap_us, 1
        ).otherwise(
            F.when(F.lag("us").over(w).isNull(), 1).otherwise(0)
        ),
    ).withColumn(
        "session_ord",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        flagged.groupBy("user_id", "session_ord")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("us").alias("start_us"),
            F.max("us").alias("end_us"),
        )
        .select(
            "user_id",
            F.col("session_ord").cast("long").alias("session_ord"),
            "n_events",
            "start_us",
            "end_us",
            (F.col("end_us") - F.col("start_us")).alias("duration_us"),
        )
    )


SESSIONIZE_EVENTS_SQL = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS us FROM events
), flagged AS (
  SELECT user_id, event_id, us,
         CASE WHEN lag(us) OVER w IS NULL THEN 1
              WHEN us - lag(us) OVER w > {SESSION_GAP_US} THEN 1
              ELSE 0 END AS new_session
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
), numbered AS (
  SELECT user_id, us,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY us, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_ord
  FROM flagged
)
SELECT user_id, session_ord::BIGINT AS session_ord,
       count(*)::BIGINT AS n_events,
       min(us) AS start_us, max(us) AS end_us,
       max(us) - min(us) AS duration_us
FROM numbered GROUP BY user_id, session_ord
"""


DIFF_T1 = "2024-01-15"  # snapshot A cutoff (events span 2024-01-01..31)


def user_state_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style snapshot diff: compare each user's derived state (the
    latest event_type, (ts, event_id)-argmax) between snapshot A
    (events before DIFF_T1) and snapshot B (all events), classifying
    every user as added (appears only in B), changed (state differs),
    or unchanged — the audit an incremental indexer runs to prove a
    delta load against a full rebuild. Append-only feed ⇒ no removed
    class.

    Plan: each snapshot is a latest-per-key (B28 argmax) — ONE
    user-keyed window exchange over its filtered scan (the A-side
    filter pushes to the parquet scan); the diff is a full-outer
    equi-join on user_id, co-partitioned with the windows, so at
    100 TB the whole op is two filtered scans + shuffles on the same
    uniform key."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy(
        F.desc("ts"), F.desc("event_id")
    )

    def latest(df: DataFrame, alias: str) -> DataFrame:
        return (
            df.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("user_id", F.col("event_type").alias(alias))
        )

    a = latest(
        ev.filter(F.col("ts") < F.lit(DIFF_T1).cast("timestamp")), "state_a"
    )
    b = latest(ev, "state_b")
    return b.join(a, "user_id", "full_outer").select(
        "user_id",
        "state_a",
        "state_b",
        F.when(F.col("state_a").isNull(), F.lit("added"))
        .when(F.col("state_a") != F.col("state_b"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("change"),
    )


USER_STATE_DIFF_SQL = f"""
WITH a AS (
  SELECT user_id, event_type AS state_a FROM (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events WHERE ts < TIMESTAMP '{DIFF_T1}'
  ) WHERE rn = 1
), b AS (
  SELECT user_id, event_type AS state_b FROM (
    SELECT user_id, event_type,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts DESC, event_id DESC) AS rn
    FROM events
  ) WHERE rn = 1
)
SELECT user_id, state_a, state_b,
       CASE WHEN state_a IS NULL THEN 'added'
            WHEN state_a <> state_b THEN 'changed'
            ELSE 'unchanged' END AS change
FROM b FULL OUTER JOIN a USING (user_id)
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "user_path_transitions": user_path_transitions,
    "sessionize_events": sessionize_events,
    "user_state_diff": user_state_diff,
    "tumbling_window_agg": tumbling_window_agg,
    "sliding_window_agg": sliding_window_agg,
    "session_window_agg": session_window_agg,
    "asof_join_prior_view": asof_join_prior_view,
    "range_join_pairs": range_join_pairs,
    "cube_counts": cube_counts,
    "grouping_sets_value": grouping_sets_value,
    "median_value_by_type": median_value_by_type,
    "approx_distinct_users": approx_distinct_users,
    "approx_quantiles_value": approx_quantiles_value,
    "cohort_retention": cohort_retention,
    "funnel_conversion": funnel_conversion,
}

ORACLES: dict[str, str] = {
    "user_path_transitions": USER_PATH_TRANSITIONS_SQL,
    "sessionize_events": SESSIONIZE_EVENTS_SQL,
    "user_state_diff": USER_STATE_DIFF_SQL,
    "tumbling_window_agg": TUMBLING_WINDOW_AGG_SQL,
    "sliding_window_agg": SLIDING_WINDOW_AGG_SQL,
    "session_window_agg": SESSION_WINDOW_AGG_SQL,
    "asof_join_prior_view": ASOF_JOIN_PRIOR_VIEW_SQL,
    "range_join_pairs": RANGE_JOIN_PAIRS_SQL,
    "cube_counts": CUBE_COUNTS_SQL,
    "grouping_sets_value": GROUPING_SETS_VALUE_SQL,
    "median_value_by_type": MEDIAN_VALUE_BY_TYPE_SQL,
    # the approx estimate itself is engine-specific; the contract query
    # oracles the exact count + the 5 % error bound as a boolean
    "approx_distinct_users": APPROX_DISTINCT_USERS_SQL,
    "approx_quantiles_value": APPROX_QUANTILES_VALUE_SQL,
    "cohort_retention": COHORT_RETENTION_SQL,
    "funnel_conversion": FUNNEL_CONVERSION_SQL,
}
