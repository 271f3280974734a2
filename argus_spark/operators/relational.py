"""The relational operator surface (SURVEY.md §2.B) over the driver's
TPC-H-ish testdata, each with a DuckDB oracle (FIXTURES.md §5 mapping).

Every query here is a named entry in ``QUERIES`` (Spark impl) with a
matching ANSI-SQL string in ``ORACLES`` — the driver's correctness gate
runs both and hash-compares.

Determinism rules (so Spark and DuckDB hash-match):
  * Aggregated doubles go through fixed-point: ``floor(x * 1e6)`` →
    exact BIGINT sum (order-free) → ``sum / 1e6`` back to double.
    Row-wise double arithmetic is IEEE-identical in both engines and
    stays native.
  * Every ranking window has a total tie-break order.
  * "Keep one duplicate" is expressed as argmin (row_number = 1), never
    bare dropDuplicates (which is nondeterministic about the survivor).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from argus_spark.session import load

FX = 1_000_000.0  # fixed-point scale for order-free double aggregation


def _fx(c):
    """floor(x*1e6) as BIGINT — exact, order-free aggregation unit."""
    return F.floor(c * F.lit(FX)).cast("long")


# --------------------------------------------------------------------------
# Scans / projection / filter  (B3, B8, B13)
# --------------------------------------------------------------------------

def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B3/B8/B13 — predicate scan + projection with a computed column.
    Filters and the 5-column projection push down to the parquet scan
    (check ``PushedFilters`` in .explain)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_quantity") > 30)
    ).select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_quantity",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("disc_price"),
    )


FILTER_PROJECT_SQL = """
SELECT l_orderkey, l_linenumber, l_partkey, l_quantity,
       l_extendedprice * (1 - l_discount) AS disc_price
FROM lineitem
WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_quantity > 30
"""


# --------------------------------------------------------------------------
# Flatten with ordinal  (B9/B10 — posexplode supplies the running index
# the reference computes imperatively, TransactionTestReducer.cs:36-42)
# --------------------------------------------------------------------------

def explode_ordinal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9/B10 — nest lineitems per order (sorted array), then posexplode
    back out with the intra-group ordinal."""
    li = load(spark, sf_dir, "lineitem")
    nested = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(F.struct("l_linenumber", "l_partkey", "l_quantity"))
        ).alias("lines")
    )
    return nested.select(
        "l_orderkey", F.posexplode("lines").alias("pos", "line")
    ).select(
        "l_orderkey",
        "pos",
        F.col("line.l_linenumber").alias("l_linenumber"),
        F.col("line.l_partkey").alias("l_partkey"),
    )


EXPLODE_ORDINAL_SQL = """
SELECT l_orderkey,
       CAST(row_number() OVER (PARTITION BY l_orderkey
                               ORDER BY l_linenumber, l_partkey, l_quantity) - 1 AS INT) AS pos,
       l_linenumber, l_partkey
FROM lineitem
"""


# --------------------------------------------------------------------------
# Broadcast lookup join  (B12)
# --------------------------------------------------------------------------

def broadcast_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B12 — filter facts by a small watched set: customer ⋈
    broadcast(nation ⋈ broadcast(region='ASIA')). The two dims are tiny
    → explicit broadcast hints; no shuffle of the fact side."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dim = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey, "inner")
    return c.join(
        F.broadcast(dim), c.c_nationkey == dim.n_nationkey, "inner"
    ).select("c_custkey", "c_name", "n_name")


BROADCAST_LOOKUP_SQL = """
SELECT c_custkey, c_name, n_name
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
"""


# --------------------------------------------------------------------------
# Semi / anti joins  (B14-B16)
# --------------------------------------------------------------------------

def semi_join_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B14/B16 — orders having at least one heavy line (left_semi =
    EXISTS; the spend-matching prefilter shape)."""
    o = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return o.join(li, o.o_orderkey == li.l_orderkey, "left_semi").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )


SEMI_JOIN_EXISTS_SQL = """
SELECT o_orderkey, o_orderstatus, o_totalprice
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
"""


def anti_join_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B15 — customers with no HIGH-VALUE order (left_anti = NOT
    EXISTS; the unspent-UTxO shape). The orders side is restricted to
    o_totalprice > 300000 (r5-verdict item 10): the unrestricted form
    returned zero rows at every harness SF — every customer has some
    order — making the green row vacuous; this slice yields non-empty
    results at sf0.001/0.01/0.1 (3/30/308 rows) so the anti-join
    semantics are actually exercised. (B15 is also proven at volume by
    ``utxo_unspent``.)"""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_nationkey"
    )


ANTI_JOIN_NOT_EXISTS_SQL = """
SELECT c_custkey, c_name, c_nationkey
FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
"""


# --------------------------------------------------------------------------
# Union of uncommitted + committed with priority dedup  (B17 —
# read-your-writes: batch-local rows win over sink rows,
# LovelaceBalanceByAddressReducer.cs:91-97)
# --------------------------------------------------------------------------

def union_dedup_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    local = o.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        (F.col("o_totalprice") * 2).alias("o_totalprice"),
        F.lit(1).alias("src"),
    )
    committed = o.select("o_orderkey", "o_totalprice", F.lit(2).alias("src"))
    w = Window.partitionBy("o_orderkey").orderBy("src")
    return (
        local.unionByName(committed)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


UNION_DEDUP_PRIORITY_SQL = """
SELECT o_orderkey, o_totalprice, src
FROM (
  SELECT u.*, row_number() OVER (PARTITION BY o_orderkey ORDER BY src) AS rn
  FROM (
    SELECT o_orderkey, o_totalprice * 2 AS o_totalprice, 1 AS src
    FROM orders WHERE o_orderkey % 10 = 0
    UNION ALL
    SELECT o_orderkey, o_totalprice, 2 AS src FROM orders
  ) u
) WHERE rn = 1
"""


# --------------------------------------------------------------------------
# Aggregations  (B18-B23)
# --------------------------------------------------------------------------

def group_sum_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B18/B19/B22 — the TPC-H Q1 shape: group-by two keys, sums, counts,
    average. Double sums via fixed-point (see module docstring); partial
    (map-side) aggregation + AQE-coalesced shuffle — the plan that holds
    at 100 TB."""
    li = load(spark, sf_dir, "lineitem")
    g = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_fx(F.col("l_quantity"))).alias("_sq"),
        F.sum(_fx(F.col("l_extendedprice"))).alias("_sp"),
        F.sum(_fx(F.col("l_extendedprice") * (1 - F.col("l_discount")))).alias("_sd"),
        F.count(F.lit(1)).alias("count_order"),
    )
    return g.select(
        "l_returnflag",
        "l_linestatus",
        (F.col("_sq").cast("double") / FX).alias("sum_qty"),
        (F.col("_sp").cast("double") / FX).alias("sum_base_price"),
        (F.col("_sd").cast("double") / FX).alias("sum_disc_price"),
        (F.col("_sq").cast("double") / FX / F.col("count_order")).alias("avg_qty"),
        "count_order",
    )


GROUP_SUM_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(floor(l_quantity * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_qty,
       CAST(sum(CAST(floor(l_extendedprice * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_base_price,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sum_disc_price,
       CAST(sum(CAST(floor(l_quantity * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 / count(*) AS avg_qty,
       count(*) AS count_order
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def count_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B19 — count per key (txs-at-slot shape)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n_orders"))


COUNT_BY_KEY_SQL = "SELECT o_orderstatus, count(*) AS n_orders FROM orders GROUP BY o_orderstatus"


def agg_min_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B20/B21 — global min/max/exact-distinct over the stream table."""
    e = load(spark, sf_dir, "events")
    return e.agg(
        F.max("event_id").alias("max_slot"),
        F.min("event_id").alias("min_slot"),
        F.countDistinct("user_id").alias("n_users"),
    )


AGG_MIN_MAX_SQL = """
SELECT max(event_id) AS max_slot, min(event_id) AS min_slot,
       count(DISTINCT user_id) AS n_users
FROM events
"""


def avg_by_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B22 — per-key average (telemetry shape), fixed-point safe."""
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        (F.sum(_fx(F.col("value"))).cast("double") / FX / F.count(F.lit(1))).alias(
            "avg_value"
        ),
        F.count(F.lit(1)).alias("n"),
    )


AVG_BY_KEY_SQL = """
SELECT event_type,
       CAST(sum(CAST(floor(value * 1000000.0) AS BIGINT)) AS DOUBLE) / 1000000.0 / count(*) AS avg_value,
       count(*) AS n
FROM events GROUP BY event_type
"""


def min_safe_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15/B21 — min across per-group latest checkpoints: the safe
    resume slot for a reducer chain (StartPoints.cs:217-269 shape)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(F.max("event_id").alias("latest_slot"))
        .agg(F.min("latest_slot").alias("safe_slot"))
    )


MIN_SAFE_INTERSECTION_SQL = """
SELECT min(latest_slot) AS safe_slot
FROM (SELECT event_type, max(event_id) AS latest_slot FROM events GROUP BY event_type)
"""


def left_join_fillna(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B23 — every dim row gets a value even with no facts (0-filled
    balance shape, WatchedAddressBalanceReducer.cs:85-95)."""
    n = load(spark, sf_dir, "nation")
    c = load(spark, sf_dir, "customer")
    counts = c.groupBy("c_nationkey").agg(F.count(F.lit(1)).alias("n_customers"))
    return (
        n.join(counts, n.n_nationkey == counts.c_nationkey, "left")
        .select("n_nationkey", "n_name", "n_customers")
        .fillna(0, subset=["n_customers"])
    )


LEFT_JOIN_FILLNA_SQL = """
SELECT n_nationkey, n_name, COALESCE(n_customers, 0) AS n_customers
FROM nation
LEFT JOIN (SELECT c_nationkey, count(*) AS n_customers FROM customer GROUP BY c_nationkey) c
  ON n_nationkey = c_nationkey
"""


# --------------------------------------------------------------------------
# Distinct / dedup  (B24-B26)
# --------------------------------------------------------------------------

def dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B24 — distinct-by composite key keeping a deterministic survivor
    (argmin row_number, the reliable form of DistinctBy)."""
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_partkey", "l_suppkey").orderBy(
        "l_orderkey", "l_linenumber"
    )
    return (
        li.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("l_partkey", "l_suppkey", "l_orderkey", "l_linenumber")
    )


DEDUP_KEEP_FIRST_SQL = """
SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber
FROM (SELECT l_partkey, l_suppkey, l_orderkey, l_linenumber,
             row_number() OVER (PARTITION BY l_partkey, l_suppkey
                                ORDER BY l_orderkey, l_linenumber) AS rn
      FROM lineitem)
WHERE rn = 1
"""


def duplicate_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B26 — keys appearing more than once (validation shape,
    ReducerExtension.cs:79-89)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


DUPLICATE_DETECT_SQL = """
SELECT l_partkey, count(*) AS n FROM lineitem GROUP BY l_partkey HAVING count(*) > 1
"""


# --------------------------------------------------------------------------
# Sorts / top-k / latest-per-key  (B27-B30)
# --------------------------------------------------------------------------

def topk_newest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B27/A13 — newest K=10 distinct slots (the checkpoint rolling
    window shape, ReducerStateCheckpointWindow.cs:36-45)."""
    e = load(spark, sf_dir, "events")
    return (
        e.select("event_id").distinct().orderBy(F.desc("event_id")).limit(10)
    )


TOPK_NEWEST_SQL = """
SELECT DISTINCT event_id FROM events ORDER BY event_id DESC LIMIT 10
"""


def latest_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B28 — argmax per key with total tie-break (latest balance
    snapshot shape)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    )


LATEST_PER_KEY_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders)
WHERE rn = 1
"""


def topk_serving(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B29 — order-by + limit for serving (README.md:241-246 shape)."""
    o = load(spark, sf_dir, "orders")
    return o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey")).limit(10).select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )


TOPK_SERVING_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


# --------------------------------------------------------------------------
# Set operations (SURVEY §2.B — union is native; intersect/except free)
# --------------------------------------------------------------------------

def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    p = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(p)


SET_INTERSECT_SQL = """
SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
INTERSECT
SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
"""


def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey")
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.exceptAll(o.distinct())


SET_EXCEPT_SQL = """
SELECT c_custkey FROM customer
EXCEPT
SELECT DISTINCT o_custkey AS c_custkey FROM orders
"""


# --------------------------------------------------------------------------
# Window frames / rollup / pivot (stretch per SURVEY §2.B "explicitly
# absent" — provided via Spark built-ins)
# --------------------------------------------------------------------------

def running_sum_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic frame: running quantity per supplier in ship order
    (fixed-point so the running sum is exact)."""
    li = load(spark, sf_dir, "lineitem")
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        (F.sum(_fx(F.col("l_quantity"))).over(w).cast("double") / FX).alias(
            "running_qty"
        ),
    )


RUNNING_SUM_FRAME_SQL = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(sum(CAST(floor(l_quantity * 1000000.0) AS BIGINT))
            OVER (PARTITION BY l_suppkey
                  ORDER BY l_shipdate, l_orderkey, l_linenumber
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       / 1000000.0 AS running_qty
FROM lineitem
"""


def rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n")
    )


ROLLUP_COUNTS_SQL = """
SELECT l_returnflag, l_linestatus, count(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    p = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(_fx(F.col("l_quantity"))))
    )
    return p.select(
        "l_returnflag",
        (F.coalesce(F.col("O"), F.lit(0)).cast("double") / FX).alias("qty_o"),
        (F.coalesce(F.col("F"), F.lit(0)).cast("double") / FX).alias("qty_f"),
    )


PIVOT_STATUS_SQL = """
SELECT l_returnflag,
       CAST(COALESCE(sum(CAST(floor(l_quantity * 1000000.0) AS BIGINT)) FILTER (WHERE l_linestatus = 'O'), 0) AS DOUBLE) / 1000000.0 AS qty_o,
       CAST(COALESCE(sum(CAST(floor(l_quantity * 1000000.0) AS BIGINT)) FILTER (WHERE l_linestatus = 'F'), 0) AS DOUBLE) / 1000000.0 AS qty_f
FROM lineitem GROUP BY l_returnflag
"""


# --------------------------------------------------------------------------
# Scalar functions  (B31-B34)
# --------------------------------------------------------------------------

def hex_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B31 — hex encode with canonical lowercase (the reference's
    case-mismatch foot-gun, LovelaceBalanceByAddressReducer.cs:51-62)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.lower(F.hex(F.encode(F.substring("text", 1, 8), "utf-8"))).alias("hex8"),
    )


HEX_CANONICAL_SQL = """
SELECT doc_id, lower(hex(CAST(substr(text, 1, 8) AS BLOB))) AS hex8 FROM documents
"""


def prefix_display(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B32 — hash prefix display form (StartPoints.cs:143-145)."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.concat(F.substring(F.md5(F.col("text")), 1, 8), F.lit("...")).alias("disp"),
    )


PREFIX_DISPLAY_SQL = """
SELECT doc_id, substr(md5(text), 1, 8) || '...' AS disp FROM documents
"""


def json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B33 — JSON field extraction (ReducerState stores points as JSON;
    here the events.props payload)."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


JSON_EXTRACT_SQL = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events
"""


def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stretch string/regex library (SURVEY lists it as absent in the
    reference): regexp extract, regexp split-count, regexp_replace with
    global flag, case map, padding. Patterns kept in the common
    Java-regex/RE2 subset so Spark and DuckDB agree."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract(F.lower("text"), "[a-z]+", 0).alias("first_word"),
        F.size(F.split(F.trim(F.col("text")), "[ ]+")).alias("n_tokens"),
        F.upper(F.substring("text", 1, 6)).alias("head_upper"),
        F.regexp_replace("text", "[aeiou]", "_").alias("devoweled"),
        F.lpad(F.col("n_chars").cast("string"), 8, "0").alias("padded_len"),
    )


STRING_FUNCS_SQL = """
SELECT doc_id,
       regexp_extract(lower(text), '[a-z]+') AS first_word,
       len(regexp_split_to_array(trim(text), '[ ]+')) AS n_tokens,
       upper(substr(text, 1, 6)) AS head_upper,
       regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled,
       lpad(CAST(n_chars AS VARCHAR), 8, '0') AS padded_len
FROM documents
"""


def stable_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B34 — deterministic stable key hash (advisory-lock key shape;
    md5 is the cross-engine-stable choice)."""
    n = load(spark, sf_dir, "nation")
    return n.select("n_name", F.md5(F.col("n_name")).alias("lock_key"))


STABLE_HASH_SQL = "SELECT n_name, md5(n_name) AS lock_key FROM nation"


def slot_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B36/A5 — rollback-slot normalization math: exclusive→slot+1,
    inclusive→slot (ReducerGraphProcessor.cs:178-183) expressed over the
    events table (even ids stand in for 'exclusive')."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.when(F.col("event_id") % 2 == 0, F.col("event_id") + 1)
        .otherwise(F.col("event_id"))
        .alias("delete_from_slot"),
    )


SLOT_ARITHMETIC_SQL = """
SELECT event_id,
       CASE WHEN event_id % 2 = 0 THEN event_id + 1 ELSE event_id END AS delete_from_slot
FROM events
"""


# --------------------------------------------------------------------------
# Multi-join analytics (TPC-H Q3/Q5/Q10 shapes) — the join-reordering /
# broadcast / top-k-over-join surface a warehouse engine must have.
# The reference composes the same shapes from its reducer primitives
# (Argus.Sync join + group reducers); here Catalyst plans them whole.
# --------------------------------------------------------------------------

SHIP_CUTOFF = "1998-06-15"   # Q3-style date split inside the data range
REV_YEAR_LO = "1996-01-01"   # Q5-style one-year order window
REV_YEAR_HI = "1997-01-01"


def shipping_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join, filtered both sides of a date split,
    revenue agg, top-10. Plan at 100 TB: the c_mktsegment filter prunes
    customer BEFORE the orders join (predicate pushdown), both big
    joins are key-partitioned hash joins AQE can re-plan, and the
    top-10 is TakeOrderedAndProject (per-partition heap + driver merge
    of 10 rows, never a global sort). Ranking ties are impossible on
    doubles-by-luck; we rank on the exact fixed-point BIGINT revenue
    with (o_orderdate, l_orderkey) tie-breaks so both engines agree."""
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit(SHIP_CUTOFF).cast("timestamp")
    )
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit(SHIP_CUTOFF).cast("timestamp")
    )
    g = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(_fx(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("_rev")
        )
    )
    return (
        g.orderBy(F.desc("_rev"), F.asc("o_orderdate"), F.asc("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            (F.col("_rev").cast("double") / FX).alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


SHIPPING_PRIORITY_TOPK_SQL = f"""
WITH g AS (
  SELECT l_orderkey, o_orderdate, o_orderpriority,
         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1e6) AS BIGINT))
              AS BIGINT) AS _rev
  FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON o_orderkey = l_orderkey
  WHERE c_mktsegment = 'BUILDING'
    AND o_orderdate < TIMESTAMP '{SHIP_CUTOFF}'
    AND l_shipdate  > TIMESTAMP '{SHIP_CUTOFF}'
  GROUP BY l_orderkey, o_orderdate, o_orderpriority
)
SELECT l_orderkey, _rev::DOUBLE / 1e6 AS revenue, o_orderdate, o_orderpriority
FROM g ORDER BY _rev DESC, o_orderdate ASC, l_orderkey ASC LIMIT 10
"""


def regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join (lineitem⋈orders⋈customer⋈supplier⋈
    nation⋈region) with the local-supply constraint c_nationkey =
    s_nationkey, one-year order window, revenue per nation. Plan at
    100 TB: region/nation are permanently tiny → explicit broadcast;
    lineitem⋈orders⋈customer⋈supplier are key-partitioned hash joins
    (supplier broadcasts at test SF by size; at scale AQE keeps it a
    shuffle join — same plan text, different physical pick); the final
    agg has ≤|nation| groups. Fixed-point revenue for the cross-engine
    hash."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation").join(
        F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey")
    )
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit(REV_YEAR_LO).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(REV_YEAR_HI).cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem")
    j = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            s,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        j.groupBy("n_name")
        .agg(
            F.sum(_fx(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("_rev")
        )
        .select("n_name", (F.col("_rev").cast("double") / FX).alias("revenue"))
    )


REGIONAL_REVENUE_SQL = f"""
SELECT n_name,
       CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1e6) AS BIGINT))
            AS BIGINT)::DOUBLE / 1e6 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '{REV_YEAR_LO}'
  AND o_orderdate <  TIMESTAMP '{REV_YEAR_HI}'
GROUP BY n_name
"""


def returned_item_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: revenue lost to returned items per customer,
    top-20. Plan at 100 TB: the l_returnflag = 'R' filter prunes
    lineitem at the scan; customer⋈orders⋈lineitem are key-partitioned
    hash joins; nation broadcasts; TakeOrderedAndProject for the
    top-20 on the exact BIGINT revenue with c_custkey tie-break."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    g = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(_fx(F.col("l_extendedprice") * (1 - F.col("l_discount"))))
            .alias("_rev")
        )
    )
    return (
        g.orderBy(F.desc("_rev"), F.asc("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            (F.col("_rev").cast("double") / FX).alias("revenue"),
            "c_acctbal",
            "n_name",
        )
    )


RETURNED_ITEM_LOSSES_SQL = """
WITH g AS (
  SELECT c_custkey, c_name, c_acctbal, n_name,
         CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 1e6) AS BIGINT))
              AS BIGINT) AS _rev
  FROM customer
  JOIN orders   ON c_custkey = o_custkey
  JOIN lineitem ON o_orderkey = l_orderkey
  JOIN nation   ON c_nationkey = n_nationkey
  WHERE l_returnflag = 'R'
  GROUP BY c_custkey, c_name, c_acctbal, n_name
)
SELECT c_custkey, c_name, _rev::DOUBLE / 1e6 AS revenue, c_acctbal, n_name
FROM g ORDER BY _rev DESC, c_custkey ASC LIMIT 20
"""


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "filter_project": filter_project,
    "explode_ordinal": explode_ordinal,
    "broadcast_lookup": broadcast_lookup,
    "semi_join_exists": semi_join_exists,
    "anti_join_not_exists": anti_join_not_exists,
    "union_dedup_priority": union_dedup_priority,
    "group_sum_pricing": group_sum_pricing,
    "count_by_key": count_by_key,
    "agg_min_max": agg_min_max,
    "avg_by_key": avg_by_key,
    "min_safe_intersection": min_safe_intersection,
    "left_join_fillna": left_join_fillna,
    "dedup_keep_first": dedup_keep_first,
    "duplicate_detect": duplicate_detect,
    "topk_newest": topk_newest,
    "latest_per_key": latest_per_key,
    "topk_serving": topk_serving,
    "set_intersect": set_intersect,
    "set_except": set_except,
    "running_sum_frame": running_sum_frame,
    "rollup_counts": rollup_counts,
    "pivot_status": pivot_status,
    "hex_canonical": hex_canonical,
    "prefix_display": prefix_display,
    "json_extract": json_extract,
    "string_funcs": string_funcs,
    "stable_hash": stable_hash,
    "slot_arithmetic": slot_arithmetic,
    "shipping_priority_topk": shipping_priority_topk,
    "regional_revenue": regional_revenue,
    "returned_item_losses": returned_item_losses,
}

ORACLES: dict[str, str] = {
    "filter_project": FILTER_PROJECT_SQL,
    "explode_ordinal": EXPLODE_ORDINAL_SQL,
    "broadcast_lookup": BROADCAST_LOOKUP_SQL,
    "semi_join_exists": SEMI_JOIN_EXISTS_SQL,
    "anti_join_not_exists": ANTI_JOIN_NOT_EXISTS_SQL,
    "union_dedup_priority": UNION_DEDUP_PRIORITY_SQL,
    "group_sum_pricing": GROUP_SUM_PRICING_SQL,
    "count_by_key": COUNT_BY_KEY_SQL,
    "agg_min_max": AGG_MIN_MAX_SQL,
    "avg_by_key": AVG_BY_KEY_SQL,
    "min_safe_intersection": MIN_SAFE_INTERSECTION_SQL,
    "left_join_fillna": LEFT_JOIN_FILLNA_SQL,
    "dedup_keep_first": DEDUP_KEEP_FIRST_SQL,
    "duplicate_detect": DUPLICATE_DETECT_SQL,
    "topk_newest": TOPK_NEWEST_SQL,
    "latest_per_key": LATEST_PER_KEY_SQL,
    "topk_serving": TOPK_SERVING_SQL,
    "set_intersect": SET_INTERSECT_SQL,
    "set_except": SET_EXCEPT_SQL,
    "running_sum_frame": RUNNING_SUM_FRAME_SQL,
    "rollup_counts": ROLLUP_COUNTS_SQL,
    "pivot_status": PIVOT_STATUS_SQL,
    "hex_canonical": HEX_CANONICAL_SQL,
    "prefix_display": PREFIX_DISPLAY_SQL,
    "json_extract": JSON_EXTRACT_SQL,
    "string_funcs": STRING_FUNCS_SQL,
    "stable_hash": STABLE_HASH_SQL,
    "slot_arithmetic": SLOT_ARITHMETIC_SQL,
    "shipping_priority_topk": SHIPPING_PRIORITY_TOPK_SQL,
    "regional_revenue": REGIONAL_REVENUE_SQL,
    "returned_item_losses": RETURNED_ITEM_LOSSES_SQL,
}
