"""Attach/initialize semantics (corpus: sql/initialize/, sql/attach/,
sql/general/generated_columns.test)."""

from __future__ import annotations

import os

import pytest

from datafusion_ducklake_spark.catalog import DuckLakeSession
from datafusion_ducklake_spark.errors import InvalidConfig
from datafusion_ducklake_spark.metadata.writer import CatalogWriter


def test_create_if_not_exists_false_rejects_missing(spark, tmp_path):
    db = str(tmp_path / "nonexistent.db")
    with pytest.raises(InvalidConfig, match="explicitly disabled"):
        DuckLakeSession(spark, db, create_if_not_exists=False)
    assert not os.path.exists(db)


def test_auto_create_then_reattach(spark, tmp_path):
    # initialize/ducklake_create_new.test: auto-create on first attach,
    # CREATE_IF_NOT_EXISTS false succeeds on the second (db now exists)
    db = str(tmp_path / "fresh.db")
    dl = DuckLakeSession(spark, db)
    dl.sql("CREATE TABLE t (i INTEGER)")
    dl.sql("INSERT INTO t VALUES (1), (2)")
    dl2 = DuckLakeSession(spark, db, create_if_not_exists=False)
    assert dl2.sql("SELECT count(*) AS n FROM t").collect()[0][0] == 2
    # default data path is <catalog>.files
    assert dl2.provider.get_data_path().rstrip("/") == db + ".files"


def test_read_only_cannot_create_new(spark, tmp_path):
    db = str(tmp_path / "ro.db")
    with pytest.raises(InvalidConfig, match="read-only"):
        DuckLakeSession(spark, db, read_only=True)
    assert not os.path.exists(db)


def test_data_path_mismatch_rejected_and_override(spark, tmp_path):
    # attach/different_paths.test
    db = str(tmp_path / "paths.db")
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=str(tmp_path / "some"))
    w.close()
    dl = DuckLakeSession(spark, db, data_path=str(tmp_path / "some"))
    dl.sql("CREATE TABLE t (a INTEGER)")
    dl.sql("INSERT INTO t VALUES (1)")
    with pytest.raises(InvalidConfig, match="does not match existing"):
        DuckLakeSession(spark, db, data_path=str(tmp_path / "other_path"))
    dl3 = DuckLakeSession(spark, db,
                          data_path=str(tmp_path / "other_path"),
                          override_data_path=True)
    assert dl3.provider.get_data_path().rstrip("/") == \
        str(tmp_path / "other_path")
    # the relocated data path holds no files: reads must fail loudly,
    # never silently return empty (missing-file contract)
    with pytest.raises(Exception):
        dl3.table("main.t").collect()


def test_generated_columns_rejected(spark, tmp_path):
    db = str(tmp_path / "gen.db")
    dl = DuckLakeSession(spark, db)
    with pytest.raises(InvalidConfig, match="generated columns"):
        dl.sql("CREATE TABLE t0 (c0 INT AS (1), c1 INT)")


def test_ducklake_secret_attach(spark, tmp_path):
    """sql/secrets/ducklake_secrets.test: an empty attach string resolves
    the default DUCKLAKE secret (METADATA_PATH + DATA_PATH); without one
    it errors; data lands under the secret's data path and a re-attach
    through the secret sees it."""
    import os

    from datafusion_ducklake_spark.catalog import (DuckLakeSession,
                                                   create_ducklake_secret,
                                                   drop_ducklake_secret)
    from datafusion_ducklake_spark.errors import InvalidConfig

    drop_ducklake_secret()
    with pytest.raises(InvalidConfig, match="Default secret was not found"):
        DuckLakeSession(spark, "")

    meta = str(tmp_path / "metadata.db")
    data = str(tmp_path / "my_data_path")
    create_ducklake_secret(meta, data)
    try:
        dl = DuckLakeSession(spark, "")
        dl.sql("CREATE TABLE test (i INTEGER)")
        dl.sql("INSERT INTO test VALUES (1), (2), (3)")
        files = [f for _r, _d, fs in os.walk(data) for f in fs
                 if f.endswith(".parquet")]
        assert len(files) == 1
        # re-attach through the secret
        dl2 = DuckLakeSession(spark, "ducklake:")
        assert sorted(r["i"] for r in dl2.sql("SELECT i FROM test")
                      .collect()) == [1, 2, 3]
    finally:
        drop_ducklake_secret()


def test_meta_type_parameter(spark, tmp_path):
    """sql/general/metadata_parameters.test: META_TYPE selects the
    catalog backend explicitly; unknown values error by name."""
    from datafusion_ducklake_spark.catalog import DuckLakeSession
    from datafusion_ducklake_spark.errors import InvalidConfig

    db = str(tmp_path / "mt_catalog.db")     # .db would sniff — force type
    dl = DuckLakeSession(spark, db, meta_type="DUCKDB",
                         data_path=str(tmp_path / "mt_files"))
    dl.sql("CREATE TABLE tbl AS SELECT * FROM range(1000)")
    assert dl.sql("SELECT count(*) AS n FROM tbl").collect()[0]["n"] == 1000
    # the full write surface works against the duckdb-format catalog
    dl.sql("INSERT INTO tbl SELECT * FROM range(1000, 1100)")
    dl.sql("DELETE FROM tbl WHERE id < 50")
    dl.sql("ALTER TABLE tbl ADD COLUMN tag VARCHAR")
    dl.sql("UPDATE tbl SET tag = 'hi' WHERE id >= 1050")
    assert dl.sql("SELECT count(*) AS n, count(tag) AS t FROM tbl"
                  ).collect()[0].asDict() == {"n": 1050, "t": 50}
    import duckdb
    con = duckdb.connect(db)    # really a DuckDB-format catalog
    assert con.sql("SELECT count(*) FROM ducklake_snapshot").fetchone()[0] >= 1
    con.close()

    with pytest.raises(InvalidConfig, match="duckdbxx"):
        DuckLakeSession(spark, str(tmp_path / "x.db"), meta_type="DUCKDBXX")


def test_attach_snapshot_time(spark, tmp_path):
    """ATTACH (SNAPSHOT_TIME => ...) — sql/general/attach_at_snapshot:
    a time pin resolves to the newest snapshot at-or-before it, the
    session is read-only, and combining VERSION+TIME or pinning before
    history errors."""
    import pytest

    from datafusion_ducklake_spark.errors import InvalidConfig
    db = str(tmp_path / "st.sqlite")
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=str(tmp_path / "stlake"))
    w.close()
    dl = DuckLakeSession(spark, db)
    dl.create_table("main.t", spark.createDataFrame([(1,)], "i INT"))
    dl.insert_into("main.t", spark.createDataFrame([(2,)], "i INT"))

    pinned = DuckLakeSession(spark, db, snapshot_time="9999-01-01")
    assert sorted(r["i"] for r in pinned.table("main.t").collect()) == [1, 2]
    assert pinned.read_only

    with pytest.raises(InvalidConfig, match="No snapshot found at or"):
        DuckLakeSession(spark, db, snapshot_time="1969-01-01")
    with pytest.raises(InvalidConfig, match="cannot be combined"):
        DuckLakeSession(spark, db, snapshot_id=1,
                        snapshot_time="9999-01-01")


def test_attach_pinned_snapshot_resurrects_macro(spark, tmp_path):
    """sql/macros/test_attach_timetravel.test: a macro created then
    dropped is callable again from a session pinned (SNAPSHOT_VERSION)
    at the create snapshot — macro resolution is MVCC'd on the session's
    snapshot id, and the snapshot log records both lifecycle events."""
    db = str(tmp_path / "mtt.sqlite")
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=str(tmp_path / "mttlake"))
    w.close()
    dl = DuckLakeSession(spark, db)
    dl.sql("CREATE MACRO simple(a) AS a")
    pin = dl.provider.get_current_snapshot()
    dl.sql("DROP MACRO simple")

    with pytest.raises(Exception, match="simple"):
        dl.sql("SELECT simple(1) AS v").collect()

    # the snapshot log carries create + drop (upstream's snapshots() rows)
    changes = [r["changes"] for r in dl.snapshots().collect()]
    assert any("macro" in str(c) and "creat" in str(c) for c in changes)
    assert any("macro" in str(c) and "drop" in str(c) for c in changes)

    pinned = DuckLakeSession(spark, db, snapshot_id=pin)
    assert pinned.sql("SELECT simple(1) AS v").collect()[0]["v"] == 1
    # the live session still rejects it
    with pytest.raises(Exception, match="simple"):
        dl.sql("SELECT simple(2) AS v").collect()
