"""DuckLake parquet write settings (corpus: sql/settings/): compression,
writer version, row-group byte size — applied through the catalog's
scoped options with table > schema > global precedence."""

import glob

import pyarrow.parquet as pq
import pytest

from datafusion_ducklake_spark.catalog import DuckLakeSession
from datafusion_ducklake_spark.metadata.writer import CatalogWriter


@pytest.fixture()
def dl(spark, tmp_path):
    db = str(tmp_path / "cat.sqlite")
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=str(tmp_path / "lake"))
    w.close()
    return DuckLakeSession(spark, db)


def _files(tmp_path, table):
    return [p for p in glob.glob(f"{tmp_path}/lake/main/{table}/*.parquet")]


def _codecs(paths):
    out = set()
    for p in paths:
        meta = pq.read_metadata(p)
        for rg in range(meta.num_row_groups):
            out.add(meta.row_group(rg).column(0).compression)
    return out


def test_compression_and_version_apply(dl, spark, tmp_path):
    dl.sql("CALL ducklake_set_option('parquet_compression', 'zstd')")
    dl.sql("CALL ducklake_set_option('parquet_version', '2')")
    dl.create_table("main.t", spark.range(1000).selectExpr(
        "CAST(id AS INT) AS i", "repeat('x', 20) AS s"))
    assert _codecs(_files(tmp_path, "t")) == {"ZSTD"}
    # v2 writer emits data-page-v2 encodings (RLE/DELTA family, never
    # the v1 PLAIN_DICTIONARY)
    meta = pq.read_metadata(_files(tmp_path, "t")[0])
    encs = {e for rg in range(meta.num_row_groups)
            for e in meta.row_group(rg).column(0).encodings}
    assert "PLAIN_DICTIONARY" not in encs

    # clearing restores the default codec for new writes
    dl.sql("CALL ducklake_set_option('parquet_compression', NULL)")
    dl.insert_into("main.t", spark.range(5).selectExpr(
        "CAST(id AS INT) AS i", "'y' AS s"))
    assert len(_codecs(_files(tmp_path, "t"))) == 2


def test_row_group_size_bytes(dl, spark, tmp_path):
    dl.sql(
        "CALL ducklake_set_option('parquet_row_group_size_bytes', '65536')")
    dl.create_table("main.rg", spark.range(200000).selectExpr(
        "id", "repeat('payload', 4) AS s"))
    meta = pq.read_metadata(_files(tmp_path, "rg")[0])
    assert meta.num_row_groups >= 2


def test_per_table_scope_beats_global(dl, spark, tmp_path):
    dl.create_table("main.a", spark.range(10).selectExpr("id"))
    dl.create_table("main.b", spark.range(10).selectExpr("id"))
    dl.sql("CALL ducklake_set_option('parquet_compression', 'uncompressed')")
    dl.sql("CALL ducklake_set_option('parquet_compression', 'zstd', "
           "table_name => 'a')")
    dl.insert_into("main.a", spark.range(10).selectExpr("id"))
    dl.insert_into("main.b", spark.range(10).selectExpr("id"))
    assert "ZSTD" in _codecs(_files(tmp_path, "a"))
    assert _codecs(_files(tmp_path, "b")) >= {"UNCOMPRESSED"}
    assert "ZSTD" not in _codecs(_files(tmp_path, "b"))
