"""Nested struct/map/list types — a deliberate extension over the
reference (its engine rejects nesting: types.rs:74-90). Covers the type
string round-trip, DuckDB parent/child tree reconstruction, and the
write → catalog → scan round-trip."""

import pyspark.sql.types as T
import pytest

from datafusion_ducklake_spark.catalog import DuckLakeSession
from datafusion_ducklake_spark.metadata.provider import (
    ColumnMeta, reconstruct_list_columns)
from datafusion_ducklake_spark.metadata.writer import CatalogWriter
from datafusion_ducklake_spark.types import (ducklake_to_spark_type,
                                             spark_to_ducklake_type)


def test_type_string_roundtrip():
    cases = [
        ("struct<a:int32,b:varchar>",
         T.StructType([T.StructField("a", T.IntegerType()),
                       T.StructField("b", T.StringType())])),
        ("map<varchar,int64>",
         T.MapType(T.StringType(), T.LongType())),
        ("list<struct<k:varchar,v:int32>>",
         T.ArrayType(T.StructType([T.StructField("k", T.StringType()),
                                   T.StructField("v", T.IntegerType())]))),
        ("struct<inner:struct<x:float64>,ys:list<int32>>",
         T.StructType([
             T.StructField("inner", T.StructType(
                 [T.StructField("x", T.DoubleType())])),
             T.StructField("ys", T.ArrayType(T.IntegerType()))])),
    ]
    for canonical, spark_t in cases:
        mapped = ducklake_to_spark_type(canonical)
        assert mapped.spark_type.simpleString() == spark_t.simpleString()
        assert mapped.canonical == canonical
        assert spark_to_ducklake_type(mapped.spark_type) == canonical

    # DuckDB SQL renderings parse too
    assert ducklake_to_spark_type(
        "STRUCT(a INTEGER, b VARCHAR)").canonical == \
        "struct<a:int32,b:varchar>"
    assert ducklake_to_spark_type(
        "MAP(VARCHAR, INTEGER)").canonical == "map<varchar,int32>"


def test_tree_reconstruction():
    def col(cid, name, typ):
        return ColumnMeta(cid, name, typ, True, None, None, None)
    rows = [
        (col(1, "id", "int32"), None),
        (col(2, "s", "struct"), None),
        (col(3, "a", "int32"), 2),
        (col(4, "b", "varchar"), 2),
        (col(5, "m", "map"), None),
        (col(6, "key", "varchar"), 5),
        (col(7, "value", "int64"), 5),
        (col(8, "xs", "list"), None),
        (col(9, "element", "struct"), 8),
        (col(10, "k", "varchar"), 9),
    ]
    out = reconstruct_list_columns(rows)
    types = {c.column_name: c.column_type for c in out}
    assert types == {
        "id": "int32",
        "s": "struct<a:int32,b:varchar>",
        "m": "map<varchar,int64>",
        "xs": "list<struct<k:varchar>>",
    }


def test_nested_write_read_roundtrip(spark, tmp_path):
    db = str(tmp_path / "cat.sqlite")
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=str(tmp_path / "lake"))
    w.close()
    dl = DuckLakeSession(spark, db)
    df = spark.sql("""
        SELECT id,
               named_struct('a', CAST(id AS INT), 'b', concat('v', id)) AS s,
               map(concat('k', id), id) AS m,
               array(named_struct('x', CAST(id * 2 AS DOUBLE))) AS arr
        FROM range(5)""")
    dl.create_table("main.n", df)
    dl.refresh()
    back = dl.table("main.n")
    assert back.schema["s"].dataType.simpleString() == \
        "struct<a:int,b:string>"
    assert back.schema["m"].dataType.simpleString() == "map<string,bigint>"
    rows = {r["id"]: r for r in back.collect()}
    assert rows[3]["s"]["b"] == "v3"
    assert rows[3]["m"]["k3"] == 3
    assert rows[2]["arr"][0]["x"] == 4.0

    # nested columns flow through MOR DELETE
    dl.delete_from("main.n", "s.a = 1")
    dl.refresh()
    assert sorted(r["id"] for r in dl.table("main.n").collect()) == \
        [0, 2, 3, 4]

    # and through CDC
    ins = dl.table_changes("main.n", 0, 999).filter("change_type='insert'")
    assert ins.count() == 5
