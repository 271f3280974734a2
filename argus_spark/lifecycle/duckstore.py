"""DuckDBStateStore — the lifecycle sink contract on a real ACID SQL
database (SURVEY §2.A A11; the reference's EntityFramework/Postgres
deployment shape, src/Argus.Sync.EntityFramework/EfBlockUnitOfWork.cs:94-121).

ParquetStateStore proves the engine's snapshot-isolation semantics
dependency-free; this backend proves the *same driver* commits into an
external transactional database unchanged — the portability the
reference ships (Postgres + Mongo backends behind one IBlockUnitOfWork):

  * one SQL transaction per epoch covers every reducer's rows AND every
    reducer's checkpoint row (atomic data+checkpoint, A11) — BEGIN,
    INSERT data, UPSERT ``_reducer_states``, COMMIT; a crash anywhere
    before COMMIT rolls the whole epoch back (A18 fail-fast)
  * rollback = ``DELETE FROM t WHERE slot >= X`` per table, in the same
    transaction as the checkpoint rewind (A12 = B6) — the literal
    EfBlockUnitOfWork retraction
  * keyed upserts append version-stamped rows (``_v``) resolved
    latest-per-key on read, so slot-range retraction *resurrects* the
    prior version (B7) with semantics identical to ParquetStateStore

Data path at scale: Spark writes each epoch's rows DISTRIBUTED to a
parquet staging area; the transaction ingests them with DuckDB's
``read_parquet`` (the COPY-from-staging pattern every warehouse load
uses — executors never funnel rows through the driver). Reads of
committed state come back via Arrow. In a production deployment this
read path is ``spark.read.jdbc`` (predicate pushdown to the database)
— a sandbox database and a 100 TB Spark cluster meet at exactly this
staging/COPY + JDBC boundary, which is why the store keeps it.

No snapshot reads: a live database has one current state, so
``supports_snapshots = False`` and IndexDriver degrades pipelined
commits to synchronous per-epoch transactions — exactly the reference's
EF behaviour (its unified design overlaps commit with *processing*,
never two commits).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import threading
import time
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from argus_spark.lifecycle.store import FileGroup, ReducerStateRow


def _q(name: str) -> str:
    """Quote an identifier (table names come from reducer registrations,
    but defense-in-depth costs one line)."""
    return '"' + name.replace('"', '""') + '"'


class DuckDBStateStore:
    supports_snapshots = False

    def __init__(self, db_path: str, staging_dir: str | None = None) -> None:
        import duckdb

        self.db_path = db_path
        self.staging_dir = staging_dir or tempfile.mkdtemp(prefix="argus_duck_stage_")
        os.makedirs(self.staging_dir, exist_ok=True)
        self._con = duckdb.connect(db_path)
        # one writer at a time — DuckDB connections are not thread-safe
        # and the single-writer contract (A19) is per-store anyway.
        # REENTRANT: commit() holds it across the transaction and its
        # states_fn callback reads reducer_states() on the same thread.
        self._lock = threading.RLock()
        self._con.execute(
            """CREATE TABLE IF NOT EXISTS _reducer_states(
                 name TEXT PRIMARY KEY, created_at DOUBLE,
                 start_point TEXT, latest_points TEXT,
                 resume_slot BIGINT)"""
        )
        self._con.execute(
            """CREATE TABLE IF NOT EXISTS _catalog(
                 name TEXT PRIMARY KEY, keyed TEXT)"""
        )
        self._con.execute(
            """CREATE TABLE IF NOT EXISTS _commits(
                 id BIGINT PRIMARY KEY, ts DOUBLE, meta TEXT)"""
        )

    # ---------------- catalog / manifest facade ----------------

    def _tables(self) -> dict[str, list[str] | None]:
        return {
            r[0]: (json.loads(r[1]) if r[1] else None)
            for r in self._con.execute("SELECT name, keyed FROM _catalog").fetchall()
        }

    def _version(self) -> int:
        v = self._con.execute("SELECT coalesce(max(id), 0) FROM _commits").fetchone()
        return int(v[0])

    def current_manifest(self) -> dict:
        """Manifest facade over live catalog state, so IndexDriver's
        snapshot/floor/tips plumbing works unchanged. ``tables`` maps
        each known table to its synthetic single group."""
        with self._lock:
            tables = {
                name: [g.as_dict() for g in self._groups_unlocked(name)]
                for name in self._tables()
            }
            return {
                "id": self._version(),
                "tables": tables,
                "keyed_tables": {
                    n: k for n, k in self._tables().items() if k
                },
                "reducer_states": {
                    name: {
                        "created_at": created_at,
                        "start_point": json.loads(sp) if sp else None,
                        "latest_points": json.loads(lp) if lp else [],
                        "resume_slot": resume,
                    }
                    for name, created_at, sp, lp, resume in self._con.execute(
                        "SELECT * FROM _reducer_states"
                    ).fetchall()
                },
            }

    def _groups_unlocked(self, name: str) -> list[FileGroup]:
        row = self._con.execute(
            f"SELECT min(slot), max(slot), count(*) FROM {_q(name)}"
        ).fetchone()
        if not row or row[2] == 0:
            return []
        return [FileGroup(path=name, min_slot=row[0], max_slot=row[1], rows=row[2])]

    def table_groups(
        self, name: str, min_slot: int | None = None, manifest: dict | None = None
    ) -> list[FileGroup]:
        with self._lock:
            if name not in self._tables():
                return []
            groups = self._groups_unlocked(name)
        if min_slot is not None:
            groups = [g for g in groups if g.max_slot >= min_slot]
        return groups

    def reducer_states(self) -> dict[str, ReducerStateRow]:
        with self._lock:
            return {
                name: ReducerStateRow(
                    name=name,
                    created_at=created_at,
                    start_point=json.loads(sp) if sp else None,
                    latest_points=json.loads(lp) if lp else [],
                    resume_slot=resume,
                )
                for name, created_at, sp, lp, resume in self._con.execute(
                    "SELECT * FROM _reducer_states"
                ).fetchall()
            }

    # ---------------- reads ----------------

    def read_table(
        self,
        spark: SparkSession,
        name: str,
        min_slot: int | None = None,
        manifest: dict | None = None,
    ) -> DataFrame | None:
        """Committed state back into Spark via Arrow (production: this
        is ``spark.read.jdbc`` with pushdown — same boundary). Keyed
        tables resolve latest-per-key server-side; ``min_slot`` pushes
        the slot predicate into the database."""
        with self._lock:
            keyed = self._tables().get(name)
            if name not in self._tables():
                return None
            if keyed:
                keys = ", ".join(_q(k) for k in keyed)
                sql = (
                    f"SELECT * EXCLUDE (_v, _rn) FROM ("
                    f"  SELECT *, row_number() OVER ("
                    f"    PARTITION BY {keys} ORDER BY _v DESC, slot DESC"
                    f"  ) AS _rn FROM {_q(name)}) WHERE _rn = 1"
                )
                if min_slot is not None:
                    sql = f"SELECT * FROM ({sql}) WHERE slot >= {int(min_slot)}"
            else:
                sql = f"SELECT * FROM {_q(name)}"
                if min_slot is not None:
                    sql += f" WHERE slot >= {int(min_slot)}"
            tbl = self._con.execute(sql).arrow()
        if tbl.num_rows == 0:
            # schema inference over an empty pandas frame fails, and
            # ReducerContext.table treats None as "no committed rows"
            return None
        return spark.createDataFrame(tbl.to_pandas())

    # ---------------- transactional commit (A11) ----------------

    def commit(
        self,
        appends: dict[str, tuple[DataFrame, int, int]],
        states: dict[str, ReducerStateRow] | None = None,
        retract_from: int | None = None,
        spark: SparkSession | None = None,
        meta: dict[str, Any] | None = None,
        upserts: dict[str, tuple[DataFrame, list[str], int, int]] | None = None,
        waves=None,
        states_fn=None,
        write_parts: int | None = None,
        write_shuffle: bool = False,
        after=None,
        retract_tables: list[str] | None = None,
    ) -> dict:
        """One database transaction: retraction + appends + upserts +
        checkpoint rows, all-or-nothing. Spark stages each table's rows
        as parquet (distributed write), the transaction ingests the
        staged files; a crash before COMMIT leaves only orphaned
        staging files (swept on the next commit)."""
        if after is not None:
            after.result()

        # Phase 1 — distributed staging writes (outside the db tx).
        staged: dict[str, tuple[str, bool, list[str] | None]] = {}
        stage_batch = os.path.join(self.staging_dir, f"e-{uuid.uuid4().hex}")
        for name, (df, lo, hi) in appends.items():
            path = os.path.join(stage_batch, name)
            d = df.coalesce(write_parts) if write_parts else df
            d.write.mode("overwrite").parquet(path)
            staged[name] = (path, False, None)
        for name, (df, keys, lo, hi) in (upserts or {}).items():
            path = os.path.join(stage_batch, name)
            d = df.coalesce(write_parts) if write_parts else df
            d.write.mode("overwrite").parquet(path)
            staged[name] = (path, True, list(keys))

        wrote_data = retract_from is not None
        with self._lock:
            catalog = self._tables()
            version = self._version() + 1
            self._con.execute("BEGIN")
            try:
                if retract_from is not None:
                    scope = (
                        set(retract_tables) if retract_tables is not None else None
                    )
                    for name, keyed in catalog.items():
                        if scope is not None and name not in scope:
                            continue
                        self._con.execute(
                            f"DELETE FROM {_q(name)} WHERE slot >= {int(retract_from)}"
                        )
                import glob as globmod

                for name, (path, is_upsert, keys) in staged.items():
                    glob = os.path.join(path, "*.parquet")
                    if not globmod.glob(glob):
                        continue  # empty epoch output — nothing staged
                    prev_keys = catalog.get(name)
                    if is_upsert and prev_keys is not None and prev_keys != keys:
                        raise ValueError(
                            f"upsert keys for {name!r} changed: {prev_keys} -> {keys}"
                        )
                    sel = f"SELECT * FROM read_parquet('{glob}')"
                    if is_upsert:
                        sel = (
                            f"SELECT *, {version} AS _v"
                            f" FROM read_parquet('{glob}')"
                        )
                    if name not in catalog:
                        self._con.execute(
                            f"CREATE TABLE {_q(name)} AS {sel}"
                        )
                        self._con.execute(
                            "INSERT INTO _catalog VALUES (?, ?)",
                            [name, json.dumps(keys) if is_upsert else None],
                        )
                        catalog[name] = keys if is_upsert else None
                    else:
                        self._con.execute(f"INSERT INTO {_q(name)} {sel}")
                    n = self._con.execute(
                        f"SELECT count(*) FROM read_parquet('{glob}')"
                    ).fetchone()[0]
                    wrote_data = wrote_data or n > 0
                if states_fn is not None:
                    assert states is None, "pass states OR states_fn, not both"
                    states = states_fn()
                for name, st in (states or {}).items():
                    self._con.execute(
                        "INSERT OR REPLACE INTO _reducer_states VALUES (?,?,?,?,?)",
                        [
                            name,
                            st.created_at,
                            json.dumps(st.start_point) if st.start_point else None,
                            json.dumps(st.latest_points),
                            st.resume_slot,
                        ],
                    )
                self._con.execute(
                    "INSERT INTO _commits VALUES (?, ?, ?)",
                    [version, time.time(), json.dumps(meta or {})],
                )
                self._con.execute("COMMIT")
            except Exception:
                self._con.execute("ROLLBACK")
                raise
            finally:
                shutil.rmtree(stage_batch, ignore_errors=True)
        return {"id": version, "meta": meta or {}, "_wrote_data": wrote_data}

    # ---------------- maintenance (db-native no-ops) ----------------

    def compact(self, spark: SparkSession, name: str, upto_slot: int | None = None):
        return self.current_manifest()  # the database maintains its own layout

    def vacuum(self) -> int:
        removed = 0
        for d in os.listdir(self.staging_dir):  # orphaned staging batches
            shutil.rmtree(os.path.join(self.staging_dir, d), ignore_errors=True)
            removed += 1
        return removed

    def close(self) -> None:
        self._con.close()
