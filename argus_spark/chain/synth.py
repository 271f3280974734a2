"""Deterministic chain-table synthesis from the TPC-H-ish testdata.

The reference's inputs are Cardano blocks (FIXTURES.md §1); the driver's
correctness oracle runs over the synthetic star schema (TESTDATA.md).
This module maps one onto the other (FIXTURES.md §5) with a derivation
that is expressible both as Spark DataFrame ops and as ANSI SQL (DuckDB
CTEs in ``CHAIN_SQL_CTES``), so every chain-shaped query stays
oracle-checkable end to end:

  * one block per order: ``slot = l_orderkey``
  * one transaction per order: ``tx_hash = cast(l_orderkey as string)``
  * outputs = lineitem rows: ``tx_index`` = dense ordinal within the tx
    (positional, like Cardano output refs), address keyed by supplier,
    ``amount = floor(l_extendedprice * 100)`` (integer lovelace — exact
    arithmetic, no FP-sum drift; SURVEY §1.2 foot-gun)
  * spend refs (inputs) = lineitem rows with ``l_returnflag = 'R'``,
    spending output (tx_hash, ordinal) at ``slot + 7`` — only when a
    block exists at that slot (every input is deliverable)
  * watched set = the ``supplier`` dim (small → broadcast join, B12)

``floor`` (not bare CAST) because Spark truncates double→bigint while
DuckDB rounds; floor is identical on identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from argus_spark.session import load

# Spend delay in slots: an output created at slot S is consumed at S + 7.
SPEND_DELAY = 7

# DuckDB CTE block reproducing the derivation below. Prepend to any
# oracle SQL that consumes the chain tables.
CHAIN_SQL_CTES = """
WITH outputs AS (
    SELECT CAST(l_orderkey AS VARCHAR)          AS tx_hash,
           CAST(row_number() OVER (PARTITION BY l_orderkey
                                   ORDER BY l_linenumber, l_suppkey,
                                            l_extendedprice, l_returnflag) - 1
                AS INT) AS tx_index,
           l_orderkey                            AS slot,
           'addr_' || CAST(l_suppkey AS VARCHAR) AS address,
           's_'    || CAST(l_suppkey AS VARCHAR) AS address_name,
           CAST(floor(l_extendedprice * 100) AS BIGINT) AS amount
    FROM lineitem
), inputs AS (
    SELECT tx_id, idx, spend_slot FROM (
        SELECT CAST(l_orderkey AS VARCHAR) AS tx_id,
               CAST(row_number() OVER (PARTITION BY l_orderkey
                                       ORDER BY l_linenumber, l_suppkey,
                                                l_extendedprice, l_returnflag) - 1
                    AS INT) AS idx,
               l_orderkey + 7  AS spend_slot,
               l_returnflag    AS rf,
               l_orderkey      AS ok
        FROM lineitem
    ) t
    WHERE rf = 'R'
      AND EXISTS (SELECT 1 FROM lineitem b WHERE b.l_orderkey = t.ok + 7)
), watched AS (
    SELECT 's_'    || CAST(s_suppkey AS VARCHAR) AS name,
           'addr_' || CAST(s_suppkey AS VARCHAR) AS address
    FROM supplier
)
"""


def synth_outputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UTxO-creation rows (block→tx→output flatten, B8-B10 analogue).
    ``tx_index`` is the output's dense ordinal within its tx — exactly
    its position in the nested ``outputs`` array (Cardano outputs are
    referenced positionally)."""
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_suppkey", "l_extendedprice", "l_returnflag"
    )
    return li.select(
        F.col("l_orderkey").cast("string").alias("tx_hash"),
        (F.row_number().over(w) - 1).alias("tx_index"),
        F.col("l_orderkey").alias("slot"),
        F.concat(F.lit("addr_"), F.col("l_suppkey").cast("string")).alias("address"),
        F.concat(F.lit("s_"), F.col("l_suppkey").cast("string")).alias("address_name"),
        F.floor(F.col("l_extendedprice") * 100).cast("long").alias("amount"),
    )


def synth_inputs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spend references — (tx_id, idx) consumed at ``spend_slot`` (B11).
    A spend only exists if a block exists at its spend slot (keeps the
    stream self-consistent: every input is deliverable)."""
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        "l_linenumber", "l_suppkey", "l_extendedprice", "l_returnflag"
    )
    refs = (
        li.select(
            F.col("l_orderkey").cast("string").alias("tx_id"),
            (F.row_number().over(w) - 1).alias("idx"),
            (F.col("l_orderkey") + SPEND_DELAY).alias("spend_slot"),
            F.col("l_returnflag").alias("rf"),
        )
        .filter(F.col("rf") == "R")
        .drop("rf")
    )
    slots = li.select(F.col("l_orderkey").alias("b_slot")).distinct()
    return refs.join(slots, refs.spend_slot == slots.b_slot, "left_semi")


def synth_watched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watched-address broadcast set (B12; supplier dim stands in for the
    config-loaded dict, LovelaceBalanceByAddressReducer.cs:24-36)."""
    s = load(spark, sf_dir, "supplier")
    return s.select(
        F.concat(F.lit("s_"), F.col("s_suppkey").cast("string")).alias("name"),
        F.concat(F.lit("addr_"), F.col("s_suppkey").cast("string")).alias("address"),
    )


def synth_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested ``blocks`` DataFrame per FIXTURES.md §1 — one block per
    order, one tx per block, outputs/inputs arrays sorted by ordinal.

    Built with groupBy + collect_list; ``sort_array`` pins intra-array
    order so downstream ``posexplode`` ordinals are deterministic
    (B9/B10 need the running index the reference computes imperatively,
    TransactionTestReducer.cs:36-42).
    """
    out = synth_outputs(spark, sf_dir)
    inp = synth_inputs(spark, sf_dir)
    li = load(spark, sf_dir, "lineitem")

    outs_by_tx = out.groupBy("tx_hash", "slot").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("tx_index"),
                    F.struct(
                        F.col("address"),
                        F.sha2(F.col("address"), 256).alias("address_hex"),
                        F.col("amount").alias("lovelace"),
                    ).alias("o"),
                )
            )
        ).alias("outs")
    )
    # inputs attach to the *spending* block (spend_slot), referencing the
    # created output's (tx_id, idx)
    ins_by_slot = inp.groupBy("spend_slot").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("tx_id"), F.col("idx").alias("index")))
        ).alias("ins")
    )

    txs = (
        outs_by_tx.join(ins_by_slot, outs_by_tx.slot == ins_by_slot.spend_slot, "left")
        .select(
            "slot",
            F.struct(
                F.col("tx_hash"),
                F.coalesce(F.col("ins"), F.array().cast("array<struct<tx_id:string,index:int>>")).alias(
                    "inputs"
                ),
                F.transform(F.col("outs"), lambda x: x["o"]).alias("outputs"),
                F.encode(F.col("tx_hash"), "utf-8").alias("raw"),
            ).alias("tx"),
        )
    )
    blocks = txs.groupBy("slot").agg(
        F.sort_array(F.collect_list(F.struct(F.col("tx.tx_hash").alias("k"), F.col("tx")))).alias(
            "txs_s"
        )
    )
    # height = global slot ordinal. A bare dense_rank() over an
    # unpartitioned window would drag every FAT nested block row through
    # ONE task; rank the narrow (slot) set instead and join it back —
    # AQE broadcasts the rank table, the fat side never re-shuffles
    # (it is already hash-partitioned by slot from the groupBy).
    heights = (
        li.select(F.col("l_orderkey").alias("slot"))
        .distinct()
        .withColumn(
            "height", F.dense_rank().over(Window.orderBy("slot"))
        )
    )
    return blocks.join(heights, "slot").select(
        F.sha2(F.col("slot").cast("string"), 256).alias("hash"),
        F.col("slot"),
        F.col("height"),
        F.lit("conway").alias("era"),
        F.transform(F.col("txs_s"), lambda x: x["tx"]).alias("txs"),
    )


def synth_chain_events(
    spark: SparkSession,
    sf_dir: str,
    rollbacks: list[tuple[int, int, str]] | None = None,
    limit: int | None = None,
) -> DataFrame:
    """chain_events sequence (FIXTURES.md §2): roll_forward per block in
    slot order, with scripted ``(after_seq, rollback_slot, type)``
    reorgs interleaved — the MockChainSyncProvider.cs:108-134 pattern.
    """
    from argus_spark.sources.ingest import blocks_table

    blocks = blocks_table(spark, sf_dir).select("slot").orderBy("slot")
    if limit:
        blocks = blocks.limit(limit)
    rows = [r.slot for r in blocks.collect()]
    events: list[tuple] = []
    seq = 0
    rb = sorted(rollbacks or [], key=lambda t: t[0])
    rb_i = 0
    for slot in rows:
        events.append((seq, "roll_forward", None, None, slot))
        seq += 1
        while rb_i < len(rb) and rb[rb_i][0] == seq - 1:
            _, rslot, rtype = rb[rb_i]
            events.append((seq, "roll_back", rtype, rslot, None))
            seq += 1
            rb_i += 1
    from argus_spark.schemas import CHAIN_EVENTS

    return spark.createDataFrame(events, CHAIN_EVENTS)
