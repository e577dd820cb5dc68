"""READ_ONLY attach (ref corpus: sql/general/ducklake_read_only.test):
reads work, every mutation path refuses."""

import pytest

from datafusion_ducklake_spark.catalog import DuckLakeSession
from datafusion_ducklake_spark.errors import InvalidConfig
from datafusion_ducklake_spark.metadata.writer import CatalogWriter


def test_read_only_session(spark, tmp_path):
    db = str(tmp_path / "cat.sqlite")
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=str(tmp_path / "lake"))
    w.close()
    rw = DuckLakeSession(spark, db)
    rw.create_table("main.t", spark.range(5).selectExpr("id"))

    ro = DuckLakeSession(spark, db, read_only=True)
    assert ro.table("main.t").count() == 5
    ro.register_views()
    assert ro.sql("SELECT count(*) AS n FROM t").collect()[0][0] == 5

    with pytest.raises(InvalidConfig, match="read-only"):
        ro.sql("INSERT INTO t VALUES (42)")
    with pytest.raises(InvalidConfig, match="read-only"):
        ro.sql("DELETE FROM t WHERE id = 1")
    with pytest.raises(InvalidConfig, match="read-only"):
        ro.insert_into("main.t", spark.range(1).selectExpr("id"))
    with pytest.raises(InvalidConfig, match="read-only"):
        ro.compact("main.t")
    with pytest.raises(InvalidConfig, match="read-only"):
        ro.sql("CALL ducklake_set_option('parquet_compression', 'zstd')")

    # the read-write session still works and the data is intact
    rw.refresh()
    assert rw.table("main.t").count() == 5


def test_pinned_snapshot_is_read_only(spark, tmp_path):
    """attach_at_snapshot parity: a historical pin refuses writes and a
    nonexistent snapshot refuses to attach."""
    db = str(tmp_path / "p.sqlite")
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=str(tmp_path / "plake"))
    w.close()
    rw = DuckLakeSession(spark, db)
    rw.create_table("main.t", spark.range(3).selectExpr("id"))
    snap = rw.provider.get_current_snapshot()
    rw.insert_into("main.t", spark.range(3).selectExpr("id"))

    pinned = DuckLakeSession(spark, db, snapshot_id=snap)
    assert pinned.table("main.t").count() == 3
    with pytest.raises(InvalidConfig, match="read-only"):
        pinned.sql("INSERT INTO t VALUES (9)")

    with pytest.raises(InvalidConfig, match="No snapshot found at version"):
        DuckLakeSession(spark, db, snapshot_id=9999)
