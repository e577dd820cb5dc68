"""Typed-column integration: list reconstruction from parent/child catalog
rows, decimal/date/timestamp round-trips through the full connector read
path (ports of types.test / list.test scenarios from the reference's
sqllogictest corpus)."""

from __future__ import annotations

import datetime
import os
import uuid
from decimal import Decimal

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from datafusion_ducklake_spark.catalog import DuckLakeSession
from tests.ducklake_fixtures import FixtureCatalog


def _write(table_dir: str, tbl: pa.Table) -> tuple[str, int]:
    os.makedirs(table_dir, exist_ok=True)
    name = f"ducklake-{uuid.uuid4()}.parquet"
    path = os.path.join(table_dir, name)
    pq.write_table(tbl, path)
    return name, os.path.getsize(path)


def _field(name, typ, fid):
    return pa.field(name, typ, metadata={b"PARQUET:field_id": str(fid).encode()})


@pytest.fixture(scope="module")
def typed_fx(tmp_path_factory):
    root = tmp_path_factory.mktemp("typed_fx")
    cat = FixtureCatalog(root)
    s1 = cat.snapshot()
    sid = cat.schema("main", s1)

    # table with a list column stored as parent/child rows
    tid = cat.table(sid, "main", "vecs", s1)
    cat.column(tid, 1, "vid", "int64", 0, s1)
    cat.column(tid, 2, "emb", "list", 1, s1)              # parent row
    cat.column(tid, 3, "element", "float32", 2, s1, parent=2)  # child row
    schema = pa.schema([_field("vid", pa.int64(), 1),
                        _field("emb", pa.list_(pa.float32()), 2)])
    tbl = pa.table({"vid": pa.array([1, 2], pa.int64()),
                    "emb": pa.array([[1.0, 2.0], [3.0]], pa.list_(pa.float32()))},
                   schema=schema)
    name, size = _write(cat.table_dir("main", "vecs"), tbl)
    cat.data_file(tid, name, size, s1, 2)

    # table exercising decimal/date/timestamp/bool/binary
    tid2 = cat.table(sid, "main", "typed", s1)
    for cid, (cname, ctype) in enumerate([
            ("k", "int32"), ("price", "decimal(10,2)"), ("d", "date"),
            ("ts", "timestamp"), ("flag", "boolean"), ("payload", "blob")],
            start=10):
        cat.column(tid2, cid, cname, ctype, cid - 10, s1)
    schema2 = pa.schema([
        _field("k", pa.int32(), 10),
        _field("price", pa.decimal128(10, 2), 11),
        _field("d", pa.date32(), 12),
        _field("ts", pa.timestamp("us"), 13),
        _field("flag", pa.bool_(), 14),
        _field("payload", pa.binary(), 15)])
    tbl2 = pa.table({
        "k": pa.array([1, 2], pa.int32()),
        "price": pa.array([Decimal("12.34"), Decimal("0.01")],
                          pa.decimal128(10, 2)),
        "d": pa.array([datetime.date(2024, 1, 2), datetime.date(1999, 12, 31)],
                      pa.date32()),
        "ts": pa.array([datetime.datetime(2024, 1, 2, 3, 4, 5, 123456),
                        datetime.datetime(2000, 6, 1)], pa.timestamp("us")),
        "flag": pa.array([True, None], pa.bool_()),
        "payload": pa.array([b"\x01\x02", None], pa.binary())},
        schema=schema2)
    name2, size2 = _write(cat.table_dir("main", "typed"), tbl2)
    cat.data_file(tid2, name2, size2, s1, 2)
    return cat


def test_list_column_reconstruction_and_scan(spark, typed_fx):
    dl = DuckLakeSession(spark, typed_fx.db_path)
    cols = {c.column_name: c.column_type
            for c in dl.table_handle("main.vecs").columns}
    assert cols == {"vid": "int64", "emb": "list<float32>"}
    rows = {r["vid"]: r["emb"] for r in dl.table("main.vecs").collect()}
    assert rows[1] == pytest.approx([1.0, 2.0])
    assert rows[2] == pytest.approx([3.0])


def test_list_column_spark_ops(spark, typed_fx):
    """Array ops work on connector-scanned list columns (higher-order fns)."""
    dl = DuckLakeSession(spark, typed_fx.db_path)
    dl.table("main.vecs").createOrReplaceTempView("v")
    got = dl.spark.sql(
        "SELECT vid, size(emb) AS n, aggregate(emb, CAST(0.0 AS DOUBLE), "
        "(a, x) -> a + x) AS s FROM v ORDER BY vid").collect()
    assert [(r["vid"], r["n"], r["s"]) for r in got] == [
        (1, 2, pytest.approx(3.0)), (2, 1, pytest.approx(3.0))]


def test_typed_columns_round_trip(spark, typed_fx):
    dl = DuckLakeSession(spark, typed_fx.db_path)
    df = dl.table("main.typed")
    assert dict(df.dtypes) == {
        "k": "int", "price": "decimal(10,2)", "d": "date",
        "ts": "timestamp_ntz", "flag": "boolean", "payload": "binary"}
    rows = {r["k"]: r for r in df.collect()}
    assert rows[1]["price"] == Decimal("12.34")
    assert rows[1]["d"] == datetime.date(2024, 1, 2)
    assert rows[1]["ts"] == datetime.datetime(2024, 1, 2, 3, 4, 5, 123456)
    assert rows[1]["flag"] is True
    assert bytes(rows[1]["payload"]) == b"\x01\x02"
    assert rows[2]["flag"] is None and rows[2]["payload"] is None


def test_typed_filter_pushdown(spark, typed_fx):
    dl = DuckLakeSession(spark, typed_fx.db_path)
    got = dl.table("main.typed").filter("price > 1.00").select("k").collect()
    assert [r["k"] for r in got] == [1]
