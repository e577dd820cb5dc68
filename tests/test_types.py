"""Type-system unit tests — port of the reference's in-module matrix
(src/types.rs:500-1301: mapping, aliases, decimal validation, promotion)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from datafusion_ducklake_spark.errors import UnsupportedType
from datafusion_ducklake_spark.types import (ducklake_to_spark_type,
                                             is_promotable,
                                             normalize_ducklake_type,
                                             spark_to_ducklake_type,
                                             types_compatible)


@pytest.mark.parametrize("dl,expected", [
    ("boolean", T.BooleanType()), ("bool", T.BooleanType()),
    ("int8", T.ByteType()), ("tinyint", T.ByteType()),
    ("int16", T.ShortType()), ("smallint", T.ShortType()),
    ("int32", T.IntegerType()), ("int", T.IntegerType()),
    ("INTEGER", T.IntegerType()),
    ("int64", T.LongType()), ("bigint", T.LongType()), ("long", T.LongType()),
    ("uint8", T.ShortType()), ("uint16", T.IntegerType()),
    ("uint32", T.LongType()), ("uint64", T.DecimalType(20, 0)),
    ("float32", T.FloatType()), ("float", T.FloatType()), ("real", T.FloatType()),
    ("float64", T.DoubleType()), ("double", T.DoubleType()),
    ("date", T.DateType()),
    ("timestamp", T.TimestampNTZType()),
    ("timestamp_s", T.TimestampNTZType()),
    ("timestamp_ms", T.TimestampNTZType()),
    ("timestamp_ns", T.TimestampNTZType()),
    ("timestamptz", T.TimestampType()),
    ("timestamp with time zone", T.TimestampType()),
    ("varchar", T.StringType()), ("text", T.StringType()),
    ("string", T.StringType()), ("json", T.StringType()),
    ("blob", T.BinaryType()), ("binary", T.BinaryType()),
    ("bytea", T.BinaryType()), ("uuid", T.BinaryType()),
    ("geometry", T.BinaryType()), ("point", T.BinaryType()),
    ("timetz", T.StringType()),
    ("time", T.TimeType()),
    ("decimal(10,2)", T.DecimalType(10, 2)),
    ("DECIMAL(38, 6)", T.DecimalType(38, 6)),
    ("numeric(5,0)", T.DecimalType(5, 0)),
    ("list<int32>", T.ArrayType(T.IntegerType())),
    ("array<varchar>", T.ArrayType(T.StringType())),
    ("int32[]", T.ArrayType(T.IntegerType())),
    ("list<decimal(10,2)>", T.ArrayType(T.DecimalType(10, 2))),
])
def test_mapping(dl, expected):
    assert ducklake_to_spark_type(dl).spark_type == expected


@pytest.mark.parametrize("bad", [
    "decimal(40,2)", "decimal(0,0)",
    "decimal(5,9)", "frobnicate",
    "union<a:int32>", "struct<>", "map<varchar>",
    # interval is readable since r8 (tests/test_interval.py) but only
    # at top level
    "list<interval>", "struct<a:interval>",
])
def test_rejections(bad):
    with pytest.raises(UnsupportedType):
        ducklake_to_spark_type(bad)


@pytest.mark.parametrize("nested,canon", [
    # supported since the nested-types extension (beyond the reference,
    # which rejects struct/map/nested lists — types.rs:74-90)
    ("struct<a int32>", "struct<a:int32>"),
    ("map<varchar,int32>", "map<varchar,int32>"),
    ("list<list<int32>>", "list<list<int32>>"),
    ("list<struct<a int32>>", "list<struct<a:int32>>"),
])
def test_nested_accepted(nested, canon):
    assert ducklake_to_spark_type(nested).canonical == canon


@pytest.mark.parametrize("alias,canon", [
    ("int", "int32"), ("INTEGER", "int32"), ("text", "varchar"),
    ("bool", "boolean"), ("double", "float64"), ("long", "int64"),
    ("array<int>", "list<int32>"),
])
def test_normalize(alias, canon):
    assert normalize_ducklake_type(alias) == canon


@pytest.mark.parametrize("frm,to,ok", [
    ("int8", "int16", True), ("int8", "int64", True), ("int16", "int8", False),
    ("int32", "int64", True), ("int64", "int32", False),
    ("uint8", "uint32", True), ("uint32", "uint8", False),
    ("int32", "uint32", False), ("uint8", "int16", False),
    ("float32", "float64", True), ("float64", "float32", False),
    ("int32", "float64", True), ("int32", "float32", False),
    ("timestamp", "timestamptz", True), ("timestamptz", "timestamp", False),
    ("decimal(10,2)", "decimal(12,2)", True),
    ("decimal(10,2)", "decimal(12,4)", True),
    ("decimal(10,2)", "decimal(10,4)", False),  # integer digits shrink
    ("decimal(10,4)", "decimal(10,2)", False),  # fraction digits shrink
    ("int32", "int32", True),
    ("varchar", "int32", False),
])
def test_promotion(frm, to, ok):
    assert is_promotable(frm, to) is ok


def test_types_compatible_via_alias():
    assert types_compatible("int", "integer")
    assert types_compatible("int", "bigint")
    assert not types_compatible("bigint", "int")


@pytest.mark.parametrize("spark_t,dl", [
    (T.IntegerType(), "int32"), (T.LongType(), "int64"),
    (T.StringType(), "varchar"), (T.DoubleType(), "float64"),
    (T.TimestampNTZType(), "timestamp"), (T.TimestampType(), "timestamptz"),
    (T.DecimalType(12, 3), "decimal(12,3)"),
    (T.ArrayType(T.StringType()), "list<varchar>"),
    (T.BinaryType(), "blob"), (T.DateType(), "date"),
])
def test_spark_to_ducklake_roundtrip(spark_t, dl):
    assert spark_to_ducklake_type(spark_t) == dl
    assert ducklake_to_spark_type(dl).spark_type == spark_t


def test_uuid_insert_parses_text_to_16_bytes(spark, tmp_path):
    """sql/types/ + add_files_type_check_uuid fix the on-disk shape:
    uuid is 16-byte binary. A TEXT literal INSERTed into a uuid column
    parses (DuckDB's implicit VARCHAR->UUID cast) instead of
    byte-encoding the 36-char string."""
    from datafusion_ducklake_spark.catalog import DuckLakeSession
    from datafusion_ducklake_spark.metadata.writer import CatalogWriter
    db = str(tmp_path / "uu.sqlite")
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=str(tmp_path / "uulake"))
    w.close()
    dl = DuckLakeSession(spark, db)
    dl.sql("CREATE TABLE uu (id UUID, tag STRING)")
    dl.sql("INSERT INTO uu VALUES "
           "('550e8400-e29b-41d4-a716-446655440000', 'a')")
    rows = dl.table("main.uu").collect()
    assert len(rows) == 1
    assert len(rows[0]["id"]) == 16
    assert rows[0]["id"].hex() == "550e8400e29b41d4a716446655440000"
    # the catalog keeps the uuid type identity
    assert {c.column_name: c.column_type
            for c in dl.table_handle("main.uu").columns}["id"] == "uuid"
