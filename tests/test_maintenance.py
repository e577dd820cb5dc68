"""Snapshot expiry + old-file cleanup (ducklake_expire_snapshots /
ducklake_cleanup_old_files parity; corpus: cleanup/, remove_orphans/)."""

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
    session = DuckLakeSession(spark, db)
    session.create_table("main.m", spark.createDataFrame(
        [(i, float(i)) for i in range(20)], "id INT, v DOUBLE"))
    return session


def _parquet_count(dl):
    n = 0
    for root, _d, files in os.walk(
            os.path.dirname(dl.catalog_path)):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def test_expire_then_cleanup_removes_superseded_files(dl):
    dl.delete_from("main.m", "id < 5")
    dl.compact("main.m")                  # supersedes data + delete files
    before_disk = _parquet_count(dl)
    assert before_disk >= 3               # original + delete + compacted

    snaps_before = len(dl.provider.list_snapshots())
    assert snaps_before >= 3
    n = dl.expire_snapshots()             # keep only the latest
    assert n == snaps_before - 1
    assert len(dl.provider.list_snapshots()) == 1

    live = sorted(r["id"] for r in dl.table("main.m").collect())
    removed = dl.cleanup_old_files()
    assert len(removed) >= 2              # superseded data + delete file
    for p in removed:
        assert not os.path.exists(p)
    # current state unaffected
    assert sorted(r["id"] for r in dl.table("main.m").collect()) == live
    assert live == list(range(5, 20))


def test_cleanup_dry_run_deletes_nothing(dl):
    dl.insert_into("main.m", dl.spark.createDataFrame(
        [(100, 1.0)], "id INT, v DOUBLE"), overwrite=True)
    dl.expire_snapshots()
    candidates = dl.cleanup_old_files(dry_run=True)
    assert candidates
    for p in candidates:
        assert os.path.exists(p)


def test_expire_keeps_latest_and_time_travel_to_it(dl):
    cur = dl.provider.get_current_snapshot()
    dl.expire_snapshots()
    assert dl.provider.get_current_snapshot() == cur
    pinned = DuckLakeSession(dl.spark, dl.catalog_path, snapshot_id=cur)
    assert len(pinned.table("main.m").collect()) == 20


def test_expire_with_cutoff(dl):
    dl.insert_into("main.m", dl.spark.createDataFrame(
        [(200, 2.0)], "id INT, v DOUBLE"))
    snaps = [s.snapshot_id for s in dl.provider.list_snapshots()]
    cutoff = snaps[-2]
    dl.expire_snapshots(before=cutoff)
    left = [s.snapshot_id for s in dl.provider.list_snapshots()]
    assert left == [s for s in snaps if s >= cutoff]


def test_expire_inside_transaction_rejected(dl):
    dl.begin_transaction()
    try:
        with pytest.raises(InvalidConfig, match="transaction"):
            dl.expire_snapshots()
    finally:
        dl.commit()


def test_cleanup_noop_when_nothing_expired(dl):
    assert dl.cleanup_old_files() == []


def test_cleanup_sweeps_expired_inlined_rows(spark, tmp_path):
    from datafusion_ducklake_spark.catalog import DuckLakeSession as DLS
    db = str(tmp_path / "i.sqlite")
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=str(tmp_path / "ilake"))
    w.close()
    dl = DLS(spark, db)
    dl.create_table("main.i", spark.createDataFrame(
        [(1,)], "id INT"))
    dl.set_option("data_inlining_row_limit", 10)
    dl.insert_into("main.i", spark.createDataFrame([(2,)], "id INT"))
    dl.flush_inlined_data("main.i")       # ends the inlined row
    dl.expire_snapshots()
    dl.cleanup_old_files()
    import sqlite3
    con = sqlite3.connect(db)
    tid = dl.table_handle("main.i").meta.table_id
    left = con.execute(
        f"SELECT COUNT(*) FROM ducklake_inlined_data_{tid}_0").fetchone()[0]
    con.close()
    assert left == 0                       # expired inlined row swept
    assert sorted(r["id"] for r in dl.table("main.i").collect()) == [1, 2]
