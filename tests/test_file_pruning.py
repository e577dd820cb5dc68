"""Catalog-stats file pruning (ducklake_file_column_stats) — the
reference's own TODO (metadata_provider.rs:569). Stats are written by our
write path and DuckDB's ducklake extension alike; pruning must be
conservative (no stats / NULL bounds ⇒ keep)."""

from __future__ import annotations

import sqlite3

import pytest
from pyspark.sql import functions as F

from datafusion_ducklake_spark.catalog import DuckLakeSession
from datafusion_ducklake_spark.metadata.writer import CatalogWriter


@pytest.fixture()
def ranged_dl(spark, tmp_path):
    """Three appends with disjoint id ranges → three files with disjoint
    min/max stats."""
    db = str(tmp_path / "cat.sqlite")
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=str(tmp_path / "lake"))
    w.close()
    dl = DuckLakeSession(spark, db)
    mk = lambda lo, hi: spark.createDataFrame(  # noqa: E731
        [(i, f"s{i}", float(i) / 2) for i in range(lo, hi)],
        "id INT, s STRING, v DOUBLE")
    dl.create_table("main.r", mk(0, 100))
    dl.insert_into("main.r", mk(100, 200))
    dl.insert_into("main.r", mk(200, 300))
    return dl, db


def _files_read(df):
    return df.select(F.input_file_name()).distinct().count()


def test_stats_written(ranged_dl):
    dl, db = ranged_dl
    con = sqlite3.connect(db)
    rows = con.execute(
        "SELECT data_file_id, column_id, min_value, max_value "
        "FROM ducklake_file_column_stats ORDER BY data_file_id, column_id"
    ).fetchall()
    con.close()
    assert len(rows) == 9            # 3 files x 3 columns
    first_id = [r for r in rows if r[0] == rows[0][0]][0]
    assert first_id[2] == "0" and first_id[3] == "99"


def test_prune_drops_excluded_files(spark, ranged_dl):
    dl, _ = ranged_dl
    full = dl.table("main.r")
    assert _files_read(full) == 3
    pruned = dl.table("main.r", prune_filters=[("id", ">=", 250)])
    assert _files_read(pruned) == 1          # only the [200,300) file
    # pruning is file-granular; the row filter still applies on top
    got = sorted(r["id"] for r in
                 pruned.filter(F.col("id") >= 250).collect())
    want = sorted(r["id"] for r in
                  full.filter(F.col("id") >= 250).collect())
    assert got == want and len(got) == 50


def test_prune_equality_and_ranges(ranged_dl):
    dl, _ = ranged_dl
    assert _files_read(dl.table("main.r",
                                prune_filters=[("id", "=", 150)])) == 1
    assert _files_read(dl.table("main.r",
                                prune_filters=[("id", "<", 100)])) == 1
    assert _files_read(dl.table("main.r",
                                prune_filters=[("id", "<=", 100)])) == 2
    assert _files_read(dl.table("main.r",
                                prune_filters=[("v", ">=", 100.0)])) == 1


def test_prune_conservative_without_stats(ranged_dl):
    dl, db = ranged_dl
    con = sqlite3.connect(db)
    con.execute("DELETE FROM ducklake_file_column_stats")
    con.commit()
    con.close()
    dl.refresh()
    assert _files_read(dl.table("main.r",
                                prune_filters=[("id", ">=", 250)])) == 3


def test_prune_string_column(ranged_dl):
    dl, _ = ranged_dl
    # s ranges: file1 s0..s99 (lex min 's0' max 's99'), file3 s200..s299
    pruned = dl.table("main.r", prune_filters=[("s", "=", "s250")])
    assert _files_read(pruned) <= 2          # lex overlap is conservative
    assert pruned.filter(F.col("s") == "s250").count() == 1


def test_gate_pruned_query_actually_prunes(spark):
    """The gated ducklake_pruned_scan_agg must read fewer files than the
    table holds (hash-match alone wouldn't catch a no-op pruner)."""
    from datafusion_ducklake_spark.catalog import DuckLakeSession
    from datafusion_ducklake_spark.queries.ducklake_gate import _build_catalog

    sf = "/root/testdata/sf0.001"
    dl = DuckLakeSession(spark, _build_catalog(sf))
    full = dl.table("main.lineitem_parts")
    cutoff = (full.agg(F.max("l_orderkey").alias("m")).collect()[0]["m"]
              * 3.0 / 4.0)
    pruned = dl.table("main.lineitem_parts",
                      prune_filters=[("l_orderkey", ">=", cutoff)])
    assert _files_read(full) == 4
    assert _files_read(pruned) <= 2
