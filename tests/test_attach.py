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
