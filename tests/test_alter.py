"""Metadata-only ALTER TABLE: rename/add/drop column (sql/alter/ corpus
parity). Zero file I/O — existing files resolve through stable field ids
after every alteration; time travel sees the pre-alter schema."""

from __future__ import annotations

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
    session = DuckLakeSession(spark, db)
    session.create_table("main.t", spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id INT, tag STRING, v DOUBLE"))
    return session


def test_rename_column_is_metadata_only(dl):
    files_before = [f.path for f in dl.table_handle("main.t")._raw_files]
    dl.rename_column("main.t", "tag", "label")
    handle = dl.table_handle("main.t")
    assert [f.path for f in handle._raw_files] == files_before  # no rewrite
    got = sorted((r["id"], r["label"]) for r in dl.table("main.t").collect())
    assert got == [(1, "a"), (2, "b")]


def test_rename_then_append_keeps_field_id(dl, spark):
    dl.rename_column("main.t", "tag", "label")
    dl.insert_into("main.t", spark.createDataFrame(
        [(3, "c", 3.5)], "id INT, label STRING, v DOUBLE"))
    got = sorted((r["id"], r["label"]) for r in dl.table("main.t").collect())
    assert got == [(1, "a"), (2, "b"), (3, "c")]
    # the renamed column kept its column_id across rename + append
    ids = {c.column_name: c.column_id
           for c in dl.table_handle("main.t").columns}
    assert len(set(ids.values())) == 3


def test_rename_time_travel_sees_old_name(dl):
    snap = dl.provider.get_current_snapshot()
    dl.rename_column("main.t", "tag", "label")
    old = DuckLakeSession(dl.spark, dl.catalog_path, snapshot_id=snap)
    assert "tag" in old.table("main.t").columns
    assert "label" in dl.table("main.t").columns


def test_rename_validation(dl):
    with pytest.raises(InvalidConfig):
        dl.rename_column("main.t", "nope", "x")
    with pytest.raises(InvalidConfig):
        dl.rename_column("main.t", "tag", "id")


def test_add_column_reads_null_for_old_files(dl, spark):
    dl.add_column("main.t", "score", "float64")
    got = {r["id"]: r["score"] for r in dl.table("main.t").collect()}
    assert got == {1: None, 2: None}
    # new appends carry the column
    dl.insert_into("main.t", spark.createDataFrame(
        [(3, "c", 3.5, 9.0)], "id INT, tag STRING, v DOUBLE, score DOUBLE"))
    got = {r["id"]: r["score"] for r in dl.table("main.t").collect()}
    assert got == {1: None, 2: None, 3: 9.0}


def test_add_column_duplicate_rejected(dl):
    with pytest.raises(InvalidConfig):
        dl.add_column("main.t", "tag", "varchar")


def test_drop_column(dl):
    dl.drop_column("main.t", "v")
    assert dl.table("main.t").columns == ["id", "tag"]
    with pytest.raises(InvalidConfig):
        dl.drop_column("main.t", "nope")


def test_drop_then_readd_gets_fresh_null_column(dl):
    """DuckLake semantics: re-adding a same-named column after a drop is a
    NEW column (fresh field id) — old values do not resurrect."""
    dl.drop_column("main.t", "v")
    dl.add_column("main.t", "v", "float64")
    got = {r["id"]: r["v"] for r in dl.table("main.t").collect()}
    assert got == {1: None, 2: None}


def test_alter_via_sql(dl):
    dl.sql("ALTER TABLE main.t RENAME COLUMN tag TO label")
    assert "label" in dl.table("main.t").columns
    dl.sql("ALTER TABLE t ADD COLUMN extra int64")
    assert "extra" in dl.table("main.t").columns
    dl.sql("ALTER TABLE main.t DROP COLUMN extra")
    assert "extra" not in dl.table("main.t").columns


def test_alter_interacts_with_dml(dl):
    dl.rename_column("main.t", "v", "val")
    n = dl.update_where("main.t", {"val": "val * 2"}, "id = 1")
    assert n == 1
    got = {r["id"]: r["val"] for r in dl.table("main.t").collect()}
    assert got[1] == 3.0 and got[2] == 2.5


def test_drop_table_and_time_travel(dl):
    snap = dl.provider.get_current_snapshot()
    dl.drop_table("main.t")
    from datafusion_ducklake_spark.errors import TableNotFound
    with pytest.raises(TableNotFound):
        dl.table("main.t")
    old = DuckLakeSession(dl.spark, dl.catalog_path, snapshot_id=snap)
    assert old.table("main.t").count() == 2


def test_ctas_and_drop_via_sql(dl):
    dl.register_views()
    out = dl.sql("CREATE TABLE main.t2 AS SELECT id, v * 2 AS v2 FROM t")
    assert out.collect()[0]["count"] == 2
    got = sorted((r["id"], r["v2"]) for r in dl.table("main.t2").collect())
    assert got == [(1, 3.0), (2, 5.0)]
    dl.sql("DROP TABLE main.t2")
    from datafusion_ducklake_spark.errors import TableNotFound
    with pytest.raises(TableNotFound):
        dl.table("main.t2")
    dl.sql("DROP TABLE IF EXISTS main.t2")   # no raise


def test_dropped_table_view_gone_from_sql(dl):
    dl.register_views()
    assert dl.sql("SELECT count(*) AS n FROM t").collect()[0]["n"] == 2
    dl.drop_table("main.t")
    import pyspark.errors
    with pytest.raises(Exception):
        dl.sql("SELECT count(*) AS n FROM t").collect()


def test_non_default_schema_lifecycle(dl, spark):
    """Tables outside 'main': create/read/SQL (flat schema__table view +
    dotted rewrite), ALTER, DML, DROP."""
    dl.create_table("analytics.m", spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "id INT, v DOUBLE"))
    dl.register_views()
    assert dl.sql(
        "SELECT count(*) AS n FROM analytics.m").collect()[0]["n"] == 2
    dl.rename_column("analytics.m", "v", "val")
    assert dl.sql("UPDATE analytics.m SET val = val + 1 WHERE id = 1") \
        .collect()[0]["count"] == 1
    got = {r["id"]: r["val"] for r in dl.table("analytics.m").collect()}
    assert got == {1: 11.0, 2: 20.0}
    dl.drop_table("analytics.m")
    from datafusion_ducklake_spark.errors import TableNotFound
    with pytest.raises(TableNotFound):
        dl.table("analytics.m")
