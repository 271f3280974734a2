"""Example reducers — the Spark re-expression of the reference's
example indexer (src/Argus.Sync.Example/Reducers/).

Key re-architecture for scale: the reference *updates* WalletUtxo rows
in place (set SpentSlot) and must un-update them on rollback
(LovelaceBalanceByAddressReducer.cs:109-128). Here every mutation is an
**append keyed by slot**: spends land in their own ``utxo_spends``
table (slot = spend slot), and the spent/unspent view is a join. Slot-
range retraction then covers B6 *and* B7 with the same O(reorg-depth)
file-group surgery — no update-in-place anywhere.

Reducers:
  block_tests        — block → (hash, height, slot)        (BlockTestReducer.cs)
  transaction_tests  — posexplode block → txs              (TransactionTestReducer.cs)
  wallet_utxos       — created outputs ⋉ watched set       (LovelaceBalanceByAddressReducer.cs:58-78)
  utxo_spends        — inputs matched to prior UTxOs       (ibid:88-106, as appends)
  balances           — per-epoch snapshot per watched addr (WatchedAddressBalanceReducer.cs)
                       [depends on wallet_utxos/utxo_spends output]
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from argus_spark.lifecycle.dag import Reducer, ReducerRegistry


def _blocks_reducer(ctx) -> dict[str, DataFrame]:
    return {
        "block_tests": ctx.blocks.select(
            "hash", "height", "slot", F.current_timestamp().alias("created_at")
        )
    }


def _transactions_reducer(ctx) -> dict[str, DataFrame]:
    txs = ctx.blocks.select(
        F.col("hash").alias("block_hash"),
        F.col("height").alias("block_height"),
        "slot",
        F.posexplode("txs").alias("tx_index", "tx"),
    )
    return {
        "transaction_tests": txs.select(
            F.col("tx.tx_hash").alias("tx_hash"),
            F.col("tx_index").cast("long").alias("tx_index"),
            "slot",
            "block_hash",
            "block_height",
            F.col("tx.raw").alias("raw_tx"),
        )
    }


def make_utxo_reducer(watched: DataFrame):
    """UTxO ledger fold. ``watched`` is the small config-loaded address
    set — broadcast so the filter never shuffles the block side (B12)."""

    def _apply(ctx) -> dict[str, DataFrame]:
        txs = ctx.blocks.select("slot", F.explode("txs").alias("tx"))
        outputs = txs.select(
            F.col("tx.tx_hash").alias("tx_hash"),
            F.posexplode("tx.outputs").alias("tx_index", "out"),
            "slot",
        ).select(
            "tx_hash",
            "tx_index",
            "slot",
            F.col("out.address").alias("address"),
            F.col("out.lovelace").alias("amount"),
        )
        created = outputs.join(
            F.broadcast(watched.select("address", "name")), "address", "inner"
        ).select(
            "tx_hash", "tx_index", "slot", "address",
            F.col("name").alias("address_name"), "amount",
        )

        # spend matching (B14): known UTxOs = committed wallet_utxos ∪
        # this epoch's created rows (read-your-writes B17 — intra-epoch
        # spends resolve correctly). The epoch's inputs are small →
        # broadcast them and probe the big UTxO side, never the reverse.
        # 100 TB note: this probe scans the committed table (an old UTxO
        # is always spendable, so slot pruning can't help); the scale
        # mitigation is layout, not logic — write wallet_utxos bucketed
        # by tx_hash (operators/bucketed.py) so the probe prunes to the
        # buckets the epoch's inputs hash into.
        inputs = txs.select(
            "slot", F.explode("tx.inputs").alias("inp")
        ).select(
            F.col("inp.tx_id").alias("tx_id"),
            F.col("inp.index").alias("index"),
            F.col("slot").alias("spend_slot"),
        )
        committed = ctx.table("wallet_utxos")
        known = created if committed is None else committed.unionByName(created)
        spends = (
            known.alias("u")
            .join(
                F.broadcast(inputs).alias("i"),
                (F.col("u.tx_hash") == F.col("i.tx_id"))
                & (F.col("u.tx_index") == F.col("i.index")),
                "inner",
            )
            .select(
                F.col("u.tx_hash").alias("tx_hash"),
                F.col("u.tx_index").alias("tx_index"),
                # address/amount denormalized onto the spend row so the
                # balance fold is incremental (delta = created − spent
                # per epoch) without re-joining the full UTxO set
                F.col("u.address_name").alias("address_name"),
                F.col("u.amount").alias("amount"),
                F.col("i.spend_slot").alias("slot"),  # spend slot → rollbackable
            )
        )
        return {"wallet_utxos": created, "utxo_spends": spends}

    return _apply


def make_balance_reducer(watched: DataFrame):
    """Per-epoch balance snapshot per watched address (B18 + B23),
    slot-stamped with the epoch tip so rollback retracts snapshots.

    **Incremental fold**: new snapshot = previous snapshot + (created −
    spent) since the previous snapshot's slot. The delta scan is
    manifest-pruned to the file-groups above ``prev_slot`` (typically
    the current epoch only), so per-epoch cost is O(epoch), flat in
    chain length — where a from-scratch anti-join recompute was
    O(chain) per epoch, O(chain²) for a sync. Every snapshot row covers
    every watched address (0-filled), so the previous snapshot is a
    complete balance vector; lovelace sums are integers, so the
    incremental fold is exactly the from-scratch result (oracle-checked
    through rollback/replay in test_lifecycle_e2e). The ``slot >
    prev_slot`` predicate — not "this epoch's blocks" — also makes
    mid-epoch rollbacks exact: surviving rows between the last
    surviving snapshot and the fork are swept into the next delta."""

    def _apply(ctx) -> dict[str, DataFrame]:
        hi = ctx.epoch_range[1]
        # control-plane: previous snapshot slot from the manifest alone
        prev_slot = max(
            (g.max_slot for g in ctx.store.table_groups("watched_address_balances")),
            default=-1,
        )
        created = ctx.table("wallet_utxos", min_slot=prev_slot + 1)
        if created is None:
            return {}
        spent = ctx.table("utxo_spends", min_slot=prev_slot + 1)
        plus = (
            created.filter(F.col("slot") > prev_slot)
            .groupBy("address_name")
            .agg(F.sum("amount").alias("plus"))
        )
        base = watched.select(F.col("name").alias("address_name"), "address")
        if prev_slot >= 0:
            prev = (
                ctx.store.read_table(ctx.spark, "watched_address_balances", prev_slot)
                .filter(F.col("slot") == prev_slot)
                .select("address_name", F.col("balance").alias("prev_balance"))
            )
            base = base.join(F.broadcast(prev), "address_name", "left")
        else:
            base = base.withColumn("prev_balance", F.lit(None).cast("long"))
        # broadcast the aggregates (right/non-preserved side of the left
        # outer — the only broadcastable side; ≤ one row per address)
        merged = base.join(F.broadcast(plus), "address_name", "left")
        if spent is not None:
            minus = (
                spent.filter(F.col("slot") > prev_slot)
                .groupBy("address_name")
                .agg(F.sum("amount").alias("minus"))
            )
            merged = merged.join(F.broadcast(minus), "address_name", "left")
        else:
            merged = merged.withColumn("minus", F.lit(None).cast("long"))
        snap = merged.select(
            F.lit("balance_by_address").alias("reducer"),
            "address_name",
            "address",
            F.lit(hi).cast("long").alias("slot"),
            (
                F.coalesce(F.col("prev_balance"), F.lit(0))
                + F.coalesce(F.col("plus"), F.lit(0))
                - F.coalesce(F.col("minus"), F.lit(0))
            ).alias("balance"),
        )
        return {"watched_address_balances": snap}

    return _apply


def build_example_registry(spark: SparkSession, watched: DataFrame) -> ReducerRegistry:
    reg = ReducerRegistry()
    reg.register(Reducer("block_tests", _blocks_reducer, tables=["block_tests"]))
    reg.register(
        Reducer("transaction_tests", _transactions_reducer, tables=["transaction_tests"])
    )
    reg.register(
        Reducer(
            "utxos_by_address",
            make_utxo_reducer(watched),
            tables=["wallet_utxos", "utxo_spends"],
        )
    )
    reg.register(
        Reducer(
            "balance_by_address",
            make_balance_reducer(watched),
            depends_on="utxos_by_address",
            tables=["watched_address_balances"],
        )
    )
    return reg


def build_chain_registry(depth: int) -> ReducerRegistry:
    """Linear dependency chain of ``depth`` reducers — the topology of
    the reference's pipeline bench (src/Argus.Sync.Bench/README.md:7,
    LinearDepth3): the root emits one row per block; each child reads
    its parent's uncommitted epoch output (read-your-writes, B17) and
    re-emits with one more hop stamped.

    Used by bench.py to measure throughput vs DAG depth. The reference's
    sequential cascade collapses ~30x at depth 3 (274 vs 8,200 slots/s)
    because every envelope waits on per-reducer DB round-trips; here
    stages compose lazily into Spark plans and the per-epoch sink writes
    run concurrently, so throughput should be depth-independent."""
    reg = ReducerRegistry()

    def _root(ctx) -> dict[str, DataFrame]:
        return {
            "chain_1": ctx.blocks.select(
                "slot", F.lit(1).cast("long").alias("hops")
            )
        }

    reg.register(Reducer("chain_1", _root, tables=["chain_1"]))
    for i in range(2, depth + 1):

        def _mk(i: int):
            def _apply(ctx) -> dict[str, DataFrame]:
                parent = ctx.table(f"chain_{i - 1}", min_slot=ctx.epoch_range[0])
                lo, hi = ctx.epoch_range
                df = parent.filter(F.col("slot").between(lo, hi))
                return {
                    f"chain_{i}": df.select(
                        "slot", (F.col("hops") + 1).alias("hops")
                    )
                }

            return _apply

        reg.register(
            Reducer(
                f"chain_{i}",
                _mk(i),
                depends_on=f"chain_{i - 1}",
                tables=[f"chain_{i}"],
            )
        )
    return reg


def current_balances(spark: SparkSession, store) -> DataFrame | None:
    """Serving view: latest balance snapshot per address (B28
    latest-per-key over the snapshot table)."""
    from pyspark.sql import Window

    snaps = store.read_table(spark, "watched_address_balances")
    if snaps is None:
        return None
    w = Window.partitionBy("address_name").orderBy(F.desc("slot"))
    return (
        snaps.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("address_name", "address", "slot", "balance")
    )
