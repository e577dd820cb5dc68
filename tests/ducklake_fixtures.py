"""DuckLake catalog fixtures built with pyarrow + raw SQL.

Mirrors the reference's integration-fixture strategy (tests/common/mod.rs:
DuckDB's ducklake extension creates catalogs, then the engine under test
reads them). The ducklake extension isn't installable in this offline
container, so we synthesize byte-equivalent artifacts: SQLite/DuckDB
catalog DBs with the seven metadata tables, UUID-named parquet data files
with PARQUET:field_id stamped, and positional-delete parquet files with
schema (file_path VARCHAR, pos BIGINT).
"""

from __future__ import annotations

import os
import sqlite3
import uuid

import pyarrow as pa
import pyarrow.parquet as pq

from datafusion_ducklake_spark.metadata.writer import DDL

USERS_NAMES = ["id", "name", "email"]


def _field(name: str, typ: pa.DataType, field_id: int) -> pa.Field:
    return pa.field(name, typ, metadata={b"PARQUET:field_id": str(field_id).encode()})


def users_arrow_schema(names=USERS_NAMES) -> pa.Schema:
    return pa.schema([
        _field(names[0], pa.int32(), 1),
        _field(names[1], pa.string(), 2),
        _field(names[2], pa.string(), 3),
    ])


def write_data_file(table_dir: str, rows: list[tuple], names=USERS_NAMES) -> tuple[str, int]:
    os.makedirs(table_dir, exist_ok=True)
    name = f"ducklake-{uuid.uuid4()}.parquet"
    path = os.path.join(table_dir, name)
    cols = list(zip(*rows)) if rows else [[], [], []]
    tbl = pa.table({names[0]: pa.array(cols[0], pa.int32()),
                    names[1]: pa.array(cols[1], pa.string()),
                    names[2]: pa.array(cols[2], pa.string())},
                   schema=users_arrow_schema(names))
    pq.write_table(tbl, path)
    return name, os.path.getsize(path)


def write_delete_file(table_dir: str, data_file_name: str,
                      positions: list[int]) -> tuple[str, int]:
    name = f"ducklake-delete-{uuid.uuid4()}.parquet"
    path = os.path.join(table_dir, name)
    tbl = pa.table({"file_path": pa.array([data_file_name] * len(positions), pa.string()),
                    "pos": pa.array(positions, pa.int64())})
    pq.write_table(tbl, path)
    return name, os.path.getsize(path)


class FixtureCatalog:
    """Raw-SQL catalog builder over sqlite3 (optionally replicated into a
    DuckDB file for the duckdb-provider tests)."""

    def __init__(self, root: str):
        self.root = str(root)
        self.data_path = os.path.join(self.root, "lake")
        os.makedirs(self.data_path, exist_ok=True)
        self.db_path = os.path.join(self.root, "catalog.sqlite")
        self.conn = sqlite3.connect(self.db_path)
        for stmt in DDL.strip().split(";"):
            if stmt.strip():
                self.conn.execute(stmt)
        self.conn.execute(
            "INSERT INTO ducklake_metadata (key, value, scope) VALUES "
            "('data_path', ?, NULL)", (self.data_path,))
        self.conn.execute(
            "INSERT INTO ducklake_snapshot (snapshot_id) VALUES (0)")
        self.conn.commit()
        self._ids = {"snapshot": 0, "schema": 0, "table": 0,
                     "column": 0, "data_file": 0, "delete_file": 0}

    def snapshot(self) -> int:
        self._ids["snapshot"] += 1
        s = self._ids["snapshot"]
        self.conn.execute(
            "INSERT INTO ducklake_snapshot (snapshot_id) VALUES (?)", (s,))
        self.conn.commit()
        return s

    def schema(self, name: str, begin: int, path: str | None = None) -> int:
        self._ids["schema"] += 1
        sid = self._ids["schema"]
        self.conn.execute(
            "INSERT INTO ducklake_schema (schema_id, schema_name, path, "
            "path_is_relative, begin_snapshot) VALUES (?, ?, ?, 1, ?)",
            (sid, name, path if path is not None else name, begin))
        self.conn.commit()
        os.makedirs(os.path.join(self.data_path, path or name), exist_ok=True)
        return sid

    def table(self, schema_id: int, schema_name: str, name: str, begin: int) -> int:
        self._ids["table"] += 1
        tid = self._ids["table"]
        self.conn.execute(
            "INSERT INTO ducklake_table (table_id, schema_id, table_name, path, "
            "path_is_relative, begin_snapshot) VALUES (?, ?, ?, ?, 1, ?)",
            (tid, schema_id, name, name, begin))
        self.conn.commit()
        os.makedirs(self.table_dir(schema_name, name), exist_ok=True)
        return tid

    def table_dir(self, schema_name: str, table_name: str) -> str:
        return os.path.join(self.data_path, schema_name, table_name)

    def column(self, table_id: int, col_id: int, name: str, typ: str,
               order: int, begin: int, nullable: bool = True,
               parent: int | None = None, end: int | None = None) -> int:
        self.conn.execute(
            "INSERT INTO ducklake_column (column_id, table_id, column_name, "
            "column_type, column_order, nulls_allowed, parent_column, "
            "begin_snapshot, end_snapshot) VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?)",
            (col_id, table_id, name, typ, order, nullable, parent, begin, end))
        self.conn.commit()
        self._ids["column"] = max(self._ids["column"], col_id)
        return col_id

    def data_file(self, table_id: int, name: str, size: int, begin: int,
                  record_count: int, end: int | None = None,
                  row_id_start: int | None = None) -> int:
        self._ids["data_file"] += 1
        fid = self._ids["data_file"]
        self.conn.execute(
            "INSERT INTO ducklake_data_file (data_file_id, table_id, path, "
            "path_is_relative, file_size_bytes, record_count, row_id_start, "
            "begin_snapshot, end_snapshot) VALUES (?, ?, ?, 1, ?, ?, ?, ?, ?)",
            (fid, table_id, name, size, record_count, row_id_start, begin, end))
        self.conn.commit()
        return fid

    def delete_file(self, table_id: int, data_file_id: int, name: str,
                    size: int, count: int, begin: int,
                    end: int | None = None) -> int:
        self._ids["delete_file"] += 1
        did = self._ids["delete_file"]
        self.conn.execute(
            "INSERT INTO ducklake_delete_file (delete_file_id, data_file_id, "
            "table_id, path, path_is_relative, file_size_bytes, delete_count, "
            "begin_snapshot, end_snapshot) VALUES (?, ?, ?, ?, 1, ?, ?, ?, ?)",
            (did, data_file_id, table_id, name, size, count, begin, end))
        self.conn.commit()
        return did

    def end_data_file(self, data_file_id: int, end: int) -> None:
        self.conn.execute(
            "UPDATE ducklake_data_file SET end_snapshot = ? WHERE data_file_id = ?",
            (end, data_file_id))
        self.conn.commit()

    def to_duckdb(self) -> str:
        """Replicate this catalog into a DuckDB database file (for the
        DuckdbMetadataProvider tests)."""
        import duckdb
        out = os.path.join(self.root, "catalog.duckdb")
        if os.path.exists(out):
            os.remove(out)
        dcon = duckdb.connect(out)
        for stmt in DDL.strip().split(";"):
            if stmt.strip():
                dcon.execute(stmt)
        for tbl in ("ducklake_metadata", "ducklake_snapshot", "ducklake_schema",
                    "ducklake_table", "ducklake_column", "ducklake_data_file",
                    "ducklake_delete_file"):
            cur = self.conn.execute(f"SELECT * FROM {tbl}")
            rows = cur.fetchall()
            if rows:
                ph = ",".join("?" * len(rows[0]))
                dcon.executemany(f"INSERT INTO {tbl} VALUES ({ph})", rows)
        dcon.close()
        return out


def build_users_fixture(root: str) -> dict:
    """The canonical multi-snapshot fixture:

    s1: create main.users(id int, name varchar, email varchar) + file1 (4 rows)
    s2: append file2 (2 rows)
    s3: delete positions [1] of file1        (delete file v1)
    s4: delete positions [1,3] of file1      (superseding delete file v2)
    Expected live rows at s4: file1 rows 0,2 + file2 rows 0,1.
    """
    cat = FixtureCatalog(root)
    s1 = cat.snapshot()
    schema_id = cat.schema("main", s1)
    table_id = cat.table(schema_id, "main", "users", s1)
    cat.column(table_id, 1, "id", "int32", 0, s1)
    cat.column(table_id, 2, "name", "varchar", 1, s1)
    cat.column(table_id, 3, "email", "varchar", 2, s1)
    tdir = cat.table_dir("main", "users")

    f1_rows = [(1, "alice", "a@x.com"), (2, "bob", "b@x.com"),
               (3, "carol", "c@x.com"), (4, "dave", "d@x.com")]
    f1_name, f1_size = write_data_file(tdir, f1_rows)
    f1_id = cat.data_file(table_id, f1_name, f1_size, s1, len(f1_rows))

    s2 = cat.snapshot()
    f2_rows = [(5, "erin", "e@x.com"), (6, "frank", "f@x.com")]
    f2_name, f2_size = write_data_file(tdir, f2_rows)
    f2_id = cat.data_file(table_id, f2_name, f2_size, s2, len(f2_rows))

    s3 = cat.snapshot()
    d1_name, d1_size = write_delete_file(tdir, f1_name, [1])
    d1_id = cat.delete_file(table_id, f1_id, d1_name, d1_size, 1, s3)

    s4 = cat.snapshot()
    # superseding delete: cumulative positions [1, 3]; previous ends at s4
    cat.conn.execute(
        "UPDATE ducklake_delete_file SET end_snapshot = ? WHERE delete_file_id = ?",
        (s4, d1_id))
    cat.conn.commit()
    d2_name, d2_size = write_delete_file(tdir, f1_name, [1, 3])
    cat.delete_file(table_id, f1_id, d2_name, d2_size, 2, s4)

    return {"cat": cat, "db_path": cat.db_path, "table_id": table_id,
            "snapshots": (s1, s2, s3, s4), "f1": (f1_id, f1_name),
            "f2": (f2_id, f2_name), "tdir": tdir}
