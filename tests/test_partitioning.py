"""Partitioning (DuckLake ducklake_partition_info/_column/
_file_partition_value; corpus: tests/sqllogictests/sql/partitioning/):
SET PARTITIONED BY records the spec, inserts split into hive-style
per-value files with catalog partition values, and prune_files drops
non-matching files exactly."""

from __future__ import annotations

import os

import pytest

from datafusion_ducklake_spark.catalog import DuckLakeSession
from datafusion_ducklake_spark.errors import InvalidConfig
from datafusion_ducklake_spark.metadata.writer import CatalogWriter


@pytest.fixture()
def dl(spark, tmp_path):
    db = str(tmp_path / "catalog.sqlite")
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=str(tmp_path / "lake"))
    w.close()
    return DuckLakeSession(spark, db)


def _mk(dl, spark, name="main.pt"):
    dl.create_table(name, spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(30)],
        "id INT, part_key INT, s STRING"))
    dl.set_partitioned_by(name, ["part_key"])
    dl.insert_into(name, spark.createDataFrame(
        [(100 + i, i % 3, f"w{i}") for i in range(30)],
        "id INT, part_key INT, s STRING"))
    return dl.table_handle(name)


def test_insert_splits_by_partition(dl, spark):
    handle = _mk(dl, spark)
    # 1 pre-spec file + 3 per-value files from the partitioned insert
    assert len(handle._raw_files) == 4
    hive = [f.path for f in handle._raw_files if "part_key=" in f.path]
    assert len(hive) == 3
    assert sorted({p.split("/")[0] for p in hive}) == \
        ["part_key=0", "part_key=1", "part_key=2"]
    vals = dl.provider.get_file_partition_values(handle.meta.table_id)
    assert sorted(v[0] for v in vals.values()) == ["0", "1", "2"]


def test_partitioned_readback_correct(dl, spark):
    _mk(dl, spark)
    rows = {r["id"]: r["part_key"] for r in dl.table("main.pt").collect()}
    assert len(rows) == 60
    assert all(rows[i] == i % 3 for i in range(30))
    assert all(rows[100 + i] == i % 3 for i in range(30))


def test_prune_files_exact_on_partition_values(dl, spark):
    handle = _mk(dl, spark)
    pruned = handle.prune_files([("part_key", "=", 1)])
    # keeps the pre-spec file (no recorded value, conservative) + the
    # single part_key=1 file
    assert len(pruned) == 2
    kept_paths = {f.data_uri for f in pruned}
    assert any("part_key=1" in p for p in kept_paths)
    assert not any("part_key=0" in p or "part_key=2" in p
                   for p in kept_paths)
    # range ops prune too
    assert len(handle.prune_files([("part_key", ">=", 2)])) == 2


def test_table_with_prune_filters_matches_full_scan(dl, spark):
    _mk(dl, spark)
    from pyspark.sql import functions as F
    full = sorted(r["id"] for r in dl.table("main.pt")
                  .filter(F.col("part_key") == 1).collect())
    pruned = sorted(r["id"] for r in
                    dl.table("main.pt",
                             prune_filters=[("part_key", "=", 1)])
                    .filter(F.col("part_key") == 1).collect())
    assert pruned == full and len(full) == 20


def test_sql_alter_set_and_reset(dl, spark):
    dl.create_table("main.sq", spark.createDataFrame(
        [(1, "a")], "k INT, s STRING"))
    dl.sql("ALTER TABLE sq SET PARTITIONED BY (k)")
    handle = dl.table_handle("main.sq")
    assert dl.provider.get_partition_columns(
        handle.meta.table_id, dl.catalog.snapshot_id) != []
    dl.sql("ALTER TABLE sq RESET PARTITIONED BY")
    assert dl.provider.get_partition_columns(
        dl.table_handle("main.sq").meta.table_id,
        dl.catalog.snapshot_id) == []


def test_unknown_partition_column_rejected(dl, spark):
    dl.create_table("main.bad", spark.createDataFrame([(1,)], "id INT"))
    with pytest.raises(InvalidConfig, match="unknown columns"):
        dl.set_partitioned_by("main.bad", ["nope"])


def test_null_partition_value(dl, spark):
    dl.create_table("main.np", spark.createDataFrame(
        [(1, "x"), (2, None)], "id INT, k STRING"))
    dl.set_partitioned_by("main.np", ["k"])
    dl.insert_into("main.np", spark.createDataFrame(
        [(3, "x"), (4, None)], "id INT, k STRING"))
    rows = {r["id"]: r["k"] for r in dl.table("main.np").collect()}
    assert rows == {1: "x", 2: None, 3: "x", 4: None}
    handle = dl.table_handle("main.np")
    vals = dl.provider.get_file_partition_values(handle.meta.table_id)
    assert sorted((v[0] for v in vals.values()),
                  key=lambda x: (x is None, x or "")) == ["x", None]


def test_multi_key_partition(dl, spark):
    dl.create_table("main.mk", spark.createDataFrame(
        [(i, i % 2, i % 3) for i in range(12)], "id INT, a INT, b INT"))
    dl.set_partitioned_by("main.mk", ["a", "b"])
    dl.insert_into("main.mk", spark.createDataFrame(
        [(100 + i, i % 2, i % 3) for i in range(12)],
        "id INT, a INT, b INT"))
    handle = dl.table_handle("main.mk")
    hive = [f.path for f in handle._raw_files if "a=" in f.path]
    assert len(hive) == 6                    # 2 x 3 value combinations
    assert all("/b=" in "/" + p.split("/")[1] or p.split("/")[1].startswith("b=")
               for p in hive)
    pruned = handle.prune_files([("a", "=", 0), ("b", "=", 2)])
    assert len(pruned) == 2                  # pre-spec file + exact match
    assert len(dl.table("main.mk").collect()) == 24


def test_partitioned_insert_on_schemed_path(spark, tmp_path):
    db = str(tmp_path / "cat2.sqlite")
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=f"file://{tmp_path}/lake2")
    w.close()
    dl = DuckLakeSession(spark, db)
    dl.create_table("main.sp", spark.createDataFrame(
        [(1, 0)], "id INT, k INT"))
    dl.set_partitioned_by("main.sp", ["k"])
    dl.insert_into("main.sp", spark.createDataFrame(
        [(2, 0), (3, 1)], "id INT, k INT"))
    handle = dl.table_handle("main.sp")
    assert handle.table_path.startswith("file://")
    hive = [f.path for f in handle._raw_files if "k=" in f.path]
    assert len(hive) == 2
    assert sorted(r["id"] for r in dl.table("main.sp").collect()) == \
        [1, 2, 3]


def test_update_rewrites_keep_partition_values(dl, spark):
    """UPDATE over a partitioned table splits its rewrite files by the
    spec and records their partition values, so pruning stays exact as
    DML accumulates."""
    _mk(dl, spark)
    n = dl.update_where("main.pt", {"s": "concat(s, '!')"}, "part_key = 1")
    assert n == 20
    handle = dl.table_handle("main.pt")
    vals = dl.provider.get_file_partition_values(handle.meta.table_id)
    rewrite_files = [f for f in handle._raw_files
                     if f.path.startswith("part_key=1/")]
    assert len(rewrite_files) >= 2          # original + rewrite file
    assert all(vals.get(f.data_file_id, {}).get(0) == "1"
               for f in rewrite_files)
    # pruning on part_key=2 excludes every part_key=1 file incl. rewrites
    pruned = handle.prune_files([("part_key", "=", 2)])
    assert not any("part_key=1" in f.data_uri for f in pruned)
    rows = {r["id"]: r["s"] for r in dl.table("main.pt").collect()}
    assert len(rows) == 60
    assert rows[1].endswith("!") and not rows[0].endswith("!")


def test_compact_partitioned_preserves_partition_values(spark, tmp_path):
    # compact over a live partition spec rewrites per-partition chains:
    # partition values carry to the outputs, rowids survive, and MOR
    # debt collapses — pruning never degrades through maintenance
    from datafusion_ducklake_spark.catalog import DuckLakeSession
    from datafusion_ducklake_spark.metadata.writer import CatalogWriter
    db = str(tmp_path / "cp.sqlite")
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=str(tmp_path / "lake"))
    w.close()
    dl = DuckLakeSession(spark, db)
    dl.sql("CREATE TABLE cp (pk INTEGER, v INTEGER)")
    dl.sql("ALTER TABLE cp SET PARTITIONED BY (pk)")
    for k in range(2):
        dl.insert_into("main.cp", spark.createDataFrame(
            [(1, 10 + k), (1, 50 + k), (2, 20 + k)], "pk INT, v INT"))
    dl.delete_from("main.cp", "v = 50")
    assert len(dl.table_handle("main.cp").files) == 4

    # rowids interleave across partitions, so only the DIRTY file is
    # rewritable (rowid-preserving merges can't span the gaps): compact
    # collapses the MOR debt and leaves the clean files registered
    n = dl.compact("main.cp")
    assert n == 1                       # the dirty file's one survivor
    after = dl.table_handle("main.cp")
    assert len(after._raw_files) == 4
    assert all(f.delete_file is None for f in after._raw_files)
    pv = dl.provider.get_file_partition_values(after.meta.table_id)
    for f in after._raw_files:
        assert f.data_file_id in pv     # every output carries its value
    vals = sorted(pv[f.data_file_id][0] for f in after._raw_files)
    assert set(vals) == {"1", "2"}
    rows = sorted((r.pk, r.v) for r in dl.table("main.cp").collect())
    assert rows == [(1, 10), (1, 11), (1, 51), (2, 20), (2, 21)]


def test_transform_partitioning_year_month(dl, spark):
    """Partition transforms (sql/partitioning/year_month_day.test):
    year(ts)/month(ts) split into transform-named hive dirs, the
    TRANSFORMED values land in ducklake_file_partition_value, and a
    year() range predicate prunes files (monotone transform)."""
    import datetime
    rows = [(i, datetime.datetime(2020, 11, 1) +
             datetime.timedelta(hours=3 * i)) for i in range(1000)]
    dl.create_table("main.tp", spark.createDataFrame(
        rows, "id INT, ts TIMESTAMP_NTZ").limit(0))
    dl.set_partitioned_by("main.tp", ["year(ts)", "month(ts)"])
    dl.insert_into("main.tp", spark.createDataFrame(
        rows, "id INT, ts TIMESTAMP_NTZ"))
    handle = dl.table_handle("main.tp")
    hive = [f.path for f in handle._raw_files if "year=" in f.path]
    assert hive, "expected transform-named hive dirs"
    assert all(p.split("/")[0].startswith("year=20") and
               "month=" in p.split("/")[1] for p in hive)
    vals = dl.provider.get_file_partition_values(handle.meta.table_id)
    years = {v[0] for v in vals.values()}
    assert years == {"2020", "2021"}
    # readback identical to the unpartitioned frame
    got = sorted((r["id"], r["ts"]) for r in dl.table("main.tp").collect())
    assert got == sorted(rows)
    # year-transform pruning: a ts >= 2021 filter drops every 2020 file
    all_files = handle.files
    kept = handle.prune_files([("ts", ">=", "2021-01-01 00:00:00")])
    assert len(kept) < len(all_files)
    kept_2020 = [f for f in kept if "year=2020" in f.data_uri]
    assert not kept_2020
    # and the pruned scan still returns every matching row
    n_full = dl.table("main.tp").filter("ts >= '2021-01-01'").count()
    n_pruned = (dl.table("main.tp",
                         prune_filters=[("ts", ">=", "2021-01-01")])
                .filter("ts >= '2021-01-01'").count())
    assert n_full == n_pruned


def test_transform_rejects_non_temporal(dl, spark):
    dl.create_table("main.tnt", spark.createDataFrame(
        [(1, "a")], "id INT, s STRING"))
    with pytest.raises(InvalidConfig, match="date/timestamp"):
        dl.set_partitioned_by("main.tnt", ["year(id)"])


def test_create_table_partitioned_by_clause(dl, spark):
    """One-statement CREATE TABLE ... PARTITIONED BY (col, year(ts))."""
    dl.sql("CREATE TABLE ctp (pk INT, d DECIMAL(10,2), ts TIMESTAMP) "
           "PARTITIONED BY (pk, year(ts))")
    dl.sql("INSERT INTO ctp VALUES (1, 2.5, TIMESTAMP'2020-01-01 00:00:00')"
           ", (2, 3.5, TIMESTAMP'2021-06-01 00:00:00')")
    handle = dl.table_handle("main.ctp")
    dirs = sorted(tuple(f.path.split("/")[:2]) for f in handle._raw_files)
    assert dirs == [("pk=1", "year=2020"), ("pk=2", "year=2021")]
