"""The canonical end-to-end pipeline (SURVEY.md §2.C): UTxO ledger fold
→ watched-address balances, with rollback-state recompute.

Reference semantics (LovelaceBalanceByAddressReducer.cs,
WatchedAddressBalanceReducer.cs, oracle test
LovelaceBalanceRollbackTest.cs:22-66):

  outputs ⋉ watched_addresses        (B12 broadcast filter)
  utxos  ⋉ inputs on (tx_hash, idx)  (B14 spend semi-join → spent_slot)
  unspent = spent_slot IS NULL       (B15 anti-join semantics)
  balance(addr) = SUM(amount) GROUP BY address_name, 0-filled (B18, B23)
  rollback(X): drop created slot ≥ X (B6); spent_slot ≥ X → NULL (B7)

Scale notes: the spend join is an equi-join on (tx_hash, tx_index) —
both sides shuffle-partition on that key; at 100 TB, AQE handles skew
and the watched set stays a broadcast. Amounts are integer lovelace
(exact, order-free sums — SURVEY §1.2 unsigned-64 foot-gun avoided by
staying within int64).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from argus_spark.chain.synth import CHAIN_SQL_CTES, synth_watched
from argus_spark.sources.ingest import inputs_table, outputs_table


def utxo_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full wallet_utxos table: every created output with its spent_slot
    (NULL = unspent) — the B14 spend match as a left join."""
    out = outputs_table(spark, sf_dir)
    inp = inputs_table(spark, sf_dir)
    return out.join(
        inp,
        (out.tx_hash == inp.tx_id) & (out.tx_index == inp.idx),
        "left",
    ).select(
        "tx_hash", "tx_index", "slot", "address", "address_name", "amount",
        F.col("spend_slot").alias("spent_slot"),
    )


UTXO_STATE_SQL = (
    CHAIN_SQL_CTES
    + """
SELECT o.tx_hash, o.tx_index, o.slot, o.address, o.address_name, o.amount,
       i.spend_slot AS spent_slot
FROM outputs o
LEFT JOIN inputs i ON o.tx_hash = i.tx_id AND o.tx_index = i.idx
"""
)


def utxo_spent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B14 — outputs that have been consumed (left_semi on the spend
    refs)."""
    out = outputs_table(spark, sf_dir)
    inp = inputs_table(spark, sf_dir)
    return out.join(
        inp,
        (out.tx_hash == inp.tx_id) & (out.tx_index == inp.idx),
        "left_semi",
    ).select("tx_hash", "tx_index", "slot", "address_name", "amount")


UTXO_SPENT_SQL = (
    CHAIN_SQL_CTES
    + """
SELECT o.tx_hash, o.tx_index, o.slot, o.address_name, o.amount
FROM outputs o
WHERE EXISTS (SELECT 1 FROM inputs i
              WHERE o.tx_hash = i.tx_id AND o.tx_index = i.idx)
"""
)


def utxo_unspent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B15 — the unspent set: created minus spent (left_anti)."""
    out = outputs_table(spark, sf_dir)
    inp = inputs_table(spark, sf_dir)
    return out.join(
        inp,
        (out.tx_hash == inp.tx_id) & (out.tx_index == inp.idx),
        "left_anti",
    ).select("tx_hash", "tx_index", "slot", "address_name", "amount")


UTXO_UNSPENT_SQL = (
    CHAIN_SQL_CTES
    + """
SELECT o.tx_hash, o.tx_index, o.slot, o.address_name, o.amount
FROM outputs o
WHERE NOT EXISTS (SELECT 1 FROM inputs i
                  WHERE o.tx_hash = i.tx_id AND o.tx_index = i.idx)
"""
)


def watched_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The flagship result: lovelace balance per watched address over
    unspent UTxOs, every watched address present (0-filled)."""
    unspent = utxo_unspent(spark, sf_dir)
    watched = synth_watched(spark, sf_dir)
    bal = unspent.groupBy("address_name").agg(F.sum("amount").alias("balance"))
    # left outer can only broadcast its RIGHT (non-preserved) side; the
    # aggregate is ≤ one row per watched address, so it is the small side
    return (
        watched
        .join(F.broadcast(bal), watched.name == bal.address_name, "left")
        .select(
            F.col("name").alias("address_name"),
            "address",
            F.coalesce(F.col("balance"), F.lit(0)).alias("balance"),
        )
    )


WATCHED_BALANCES_SQL = (
    CHAIN_SQL_CTES
    + """
SELECT w.name AS address_name, w.address,
       CAST(COALESCE(b.balance, 0) AS BIGINT) AS balance
FROM watched w
LEFT JOIN (
    SELECT o.address_name, CAST(sum(o.amount) AS BIGINT) AS balance
    FROM outputs o
    WHERE NOT EXISTS (SELECT 1 FROM inputs i
                      WHERE o.tx_hash = i.tx_id AND o.tx_index = i.idx)
    GROUP BY o.address_name
) b ON w.name = b.address_name
"""
)


def balances_after_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rollback-state recompute (B6/B7/A12): at X = floor(max_slot/2),
    outputs created at slot ≥ X are deleted and spends at spent_slot ≥ X
    are resurrected; balances recomputed over the surviving unspent set.

    X stays in-plan (scalar subquery via cross join) — no driver-side
    collect on the data path."""
    out = outputs_table(spark, sf_dir)
    inp = inputs_table(spark, sf_dir)
    watched = synth_watched(spark, sf_dir)
    x = out.agg(F.floor(F.max("slot") / 2).alias("x"))
    surviving = out.crossJoin(F.broadcast(x)).filter(F.col("slot") < F.col("x"))
    live_spends = inp.crossJoin(F.broadcast(x)).filter(
        F.col("spend_slot") < F.col("x")
    )
    unspent = surviving.join(
        live_spends,
        (surviving.tx_hash == live_spends.tx_id)
        & (surviving.tx_index == live_spends.idx),
        "left_anti",
    )
    bal = unspent.groupBy("address_name").agg(F.sum("amount").alias("balance"))
    return (
        watched
        .join(F.broadcast(bal), watched.name == bal.address_name, "left")
        .select(
            F.col("name").alias("address_name"),
            F.coalesce(F.col("balance"), F.lit(0)).alias("balance"),
        )
    )


BALANCES_AFTER_ROLLBACK_SQL = (
    CHAIN_SQL_CTES
    + """
, x AS (SELECT CAST(floor(max(slot) / 2) AS BIGINT) AS x FROM outputs)
SELECT w.name AS address_name, CAST(COALESCE(b.balance, 0) AS BIGINT) AS balance
FROM watched w
LEFT JOIN (
    SELECT o.address_name, CAST(sum(o.amount) AS BIGINT) AS balance
    FROM outputs o, x
    WHERE o.slot < x.x
      AND NOT EXISTS (SELECT 1 FROM inputs i, x x2
                      WHERE o.tx_hash = i.tx_id AND o.tx_index = i.idx
                        AND i.spend_slot < x2.x)
    GROUP BY o.address_name
) b ON w.name = b.address_name
"""
)


def tx_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B9/B10/B11 over the real nested blocks: posexplode block→tx, then
    per-tx input/output cardinalities and output total from the nested
    arrays. Scans the materialized ingest table (A4: decode once) — the
    query cost is explode + agg, not nested-table construction."""
    from argus_spark.sources.ingest import blocks_table

    blocks = blocks_table(spark, sf_dir)
    txs = blocks.select(
        "slot", "height", F.posexplode("txs").alias("tx_pos", "tx")
    )
    return txs.select(
        "slot",
        "tx_pos",
        F.col("tx.tx_hash").alias("tx_hash"),
        F.size("tx.inputs").alias("n_inputs"),
        F.size("tx.outputs").alias("n_outputs"),
        F.aggregate(
            "tx.outputs", F.lit(0).cast("long"), lambda acc, o: acc + o["lovelace"]
        ).alias("total_out"),
    )


# Structural mirror of the engine's nested-table derivation
# (chain/synth.py): per-tx aggregates grouped by (slot, tx_hash);
# inputs attach SLOT-wise (ins_by_slot joins on slot == spend_slot in
# synth_blocks, so every tx of a block sees the block's input list —
# the oracle reproduces that rule rather than assuming one tx per
# block); tx_pos = ordinal of the tx within its block's array, which
# sort_array orders by tx_hash (binary string collation both engines).
TX_FLATTEN_SQL = (
    CHAIN_SQL_CTES
    + """
, per_tx AS (
  SELECT slot, tx_hash,
         CAST(count(*) AS INT) AS n_outputs,
         CAST(sum(amount) AS BIGINT) AS total_out
  FROM outputs GROUP BY slot, tx_hash
)
SELECT t.slot,
       CAST(row_number() OVER (PARTITION BY t.slot ORDER BY t.tx_hash) - 1
            AS INT) AS tx_pos,
       t.tx_hash,
       COALESCE(i.n_inputs, 0) AS n_inputs,
       t.n_outputs,
       t.total_out
FROM per_tx t
LEFT JOIN (SELECT spend_slot, CAST(count(*) AS INT) AS n_inputs
           FROM inputs GROUP BY spend_slot) i
  ON t.slot = i.spend_slot
"""
)


def checkpoint_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13/B27 — the newest K=10 distinct-slot points over the block
    stream (the persisted rollback buffer)."""
    from argus_spark.sources.ingest import blocks_table

    blocks = blocks_table(spark, sf_dir)
    return (
        blocks.select("slot", "hash")
        .orderBy(F.desc("slot"))
        .limit(10)
    )


CHECKPOINT_WINDOW_SQL = (
    CHAIN_SQL_CTES
    + """
SELECT slot, sha256(CAST(slot AS VARCHAR)) AS hash
FROM (SELECT DISTINCT slot FROM outputs)
ORDER BY slot DESC LIMIT 10
"""
)


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "utxo_state": utxo_state,
    "utxo_spent": utxo_spent,
    "utxo_unspent": utxo_unspent,
    "watched_balances": watched_balances,
    "balances_after_rollback": balances_after_rollback,
    "tx_flatten": tx_flatten,
    "checkpoint_window": checkpoint_window,
}

ORACLES: dict[str, str] = {
    "utxo_state": UTXO_STATE_SQL,
    "utxo_spent": UTXO_SPENT_SQL,
    "utxo_unspent": UTXO_UNSPENT_SQL,
    "watched_balances": WATCHED_BALANCES_SQL,
    "balances_after_rollback": BALANCES_AFTER_ROLLBACK_SQL,
    "tx_flatten": TX_FLATTEN_SQL,
    "checkpoint_window": CHECKPOINT_WINDOW_SQL,
}
