"""Declared schemas for the chain data model (FIXTURES.md).

The reference uses fixed, user-declared schemas (EF ``OnModelCreating``,
src/Argus.Sync.Example/Data/TestDbContext.cs:25-42); no inference
anywhere. Amounts are unsigned 64-bit in the reference — total supply
fits in a signed int64, so ``LongType`` is safe (SURVEY §1.2).
"""

from __future__ import annotations

from pyspark.sql import types as T

# struct<hash,slot> — the chain Point (src/Argus.Sync/Data/Models/Point.cs:8-13)
POINT = T.StructType(
    [
        T.StructField("hash", T.StringType(), False),
        T.StructField("slot", T.LongType(), False),
    ]
)

TX_INPUT = T.StructType(
    [
        T.StructField("tx_id", T.StringType(), False),
        T.StructField("index", T.IntegerType(), False),
    ]
)

TX_OUTPUT = T.StructType(
    [
        T.StructField("address", T.StringType(), False),
        T.StructField("address_hex", T.StringType(), True),
        T.StructField("lovelace", T.LongType(), False),
    ]
)

TRANSACTION = T.StructType(
    [
        T.StructField("tx_hash", T.StringType(), False),
        T.StructField("inputs", T.ArrayType(TX_INPUT), False),
        T.StructField("outputs", T.ArrayType(TX_OUTPUT), False),
        T.StructField("raw", T.BinaryType(), True),
    ]
)

# blocks — the source stream, eagerly decoded at ingest (SURVEY §2.A A4:
# the reference needs a defensive byte-copy exactly because it decodes
# lazily, src/Argus.Sync/Utils/ArgusUtil.cs:40-48; we decode once).
BLOCKS = T.StructType(
    [
        T.StructField("hash", T.StringType(), False),
        T.StructField("slot", T.LongType(), False),
        T.StructField("height", T.LongType(), False),
        T.StructField("era", T.StringType(), True),
        T.StructField("txs", T.ArrayType(TRANSACTION), False),
    ]
)

# chain_events — NextResponse shape (src/Argus.Sync/Data/Models/NextResponse.cs:10-16)
CHAIN_EVENTS = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("action", T.StringType(), False),  # roll_forward | roll_back
        T.StructField("rollback_type", T.StringType(), True),  # inclusive | exclusive
        T.StructField("rollback_slot", T.LongType(), True),
        T.StructField("block_slot", T.LongType(), True),
    ]
)

WATCHED_ADDRESSES = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("bech32", T.StringType(), True),
        T.StructField("address_hex", T.StringType(), True),
    ]
)

# Output tables (FIXTURES.md §4)
BLOCK_TESTS = T.StructType(
    [
        T.StructField("hash", T.StringType(), False),
        T.StructField("height", T.LongType(), False),
        T.StructField("slot", T.LongType(), False),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

TRANSACTION_TESTS = T.StructType(
    [
        T.StructField("tx_hash", T.StringType(), False),
        T.StructField("tx_index", T.LongType(), False),
        T.StructField("slot", T.LongType(), False),
        T.StructField("block_hash", T.StringType(), True),
        T.StructField("block_height", T.LongType(), True),
        T.StructField("raw_tx", T.BinaryType(), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

WALLET_UTXOS = T.StructType(
    [
        T.StructField("tx_hash", T.StringType(), False),
        T.StructField("tx_index", T.IntegerType(), False),
        T.StructField("slot", T.LongType(), False),
        T.StructField("address", T.StringType(), False),
        T.StructField("address_name", T.StringType(), True),
        T.StructField("amount", T.LongType(), False),
        T.StructField("spent_slot", T.LongType(), True),  # NULL = unspent
    ]
)

WATCHED_ADDRESS_BALANCES = T.StructType(
    [
        T.StructField("reducer", T.StringType(), False),
        T.StructField("address_name", T.StringType(), False),
        T.StructField("address", T.StringType(), True),
        T.StructField("slot", T.LongType(), False),
        T.StructField("balance", T.LongType(), False),
    ]
)

# reducer_states — per-reducer checkpoint, persisted atomically with data
# (src/Argus.Sync/Data/Models/ReducerState.cs:11-39). JSON indirection in
# the reference becomes native structs here (SURVEY §1.2).
REDUCER_STATES = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("start_point", POINT, True),
        T.StructField("latest_points", T.ArrayType(POINT), False),
    ]
)
