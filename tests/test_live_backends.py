"""Live Postgres/MySQL conformance suite — env-gated (r5 verdict #6).

The offline pins (tests/test_provider_goldens.py wire goldens,
tests/test_provider_dialects.py rewrite checks) make a live server a
connection-string change; this suite IS that change. It collects and
SKIPS cleanly when no server is reachable, and runs the full provider +
engine lifecycle when one is:

    DUCKLAKE_PG_DSN='postgresql://user:pw@host:5432/db' \\
        python -m pytest -m live_backend tests/test_live_backends.py
    DUCKLAKE_MYSQL_DSN='mysql://user:pw@host:3306/db' \\
        python -m pytest -m live_backend tests/test_live_backends.py

Reference parity: the per-backend conformance families of
tests/sqlite_metadata_provider_test.rs:482-832 (x3 backends).
"""

from __future__ import annotations

import os
import uuid

import pytest

pytestmark = pytest.mark.live_backend

_BACKENDS = [
    ("postgres", "DUCKLAKE_PG_DSN", "psycopg"),
    ("mysql", "DUCKLAKE_MYSQL_DSN", "mysql.connector"),
]


def _dsn_or_skip(env: str, driver: str) -> str:
    dsn = os.environ.get(env)
    if not dsn:
        pytest.skip(f"{env} not set — live backend unavailable")
    try:
        __import__(driver)
    except ImportError:
        pytest.skip(f"driver {driver!r} not installed")
    return dsn


@pytest.fixture(params=_BACKENDS, ids=[b[0] for b in _BACKENDS])
def live_catalog(request, tmp_path):
    """A freshly initialized DuckLake catalog on the live backend.
    Each run uses throwaway table names (uuid suffix) so repeated runs
    against a shared server don't collide; catalog tables are the
    standard DuckLake schema, created IF NOT EXISTS."""
    name, env, driver = request.param
    dsn = _dsn_or_skip(env, driver)
    from datafusion_ducklake_spark.table_writer import _catalog_writer_raw

    class _S:   # minimal session stub for the writer factory
        catalog_path = dsn
        read_only = False

    w = _catalog_writer_raw(_S())
    w.initialize_schema(data_path=str(tmp_path / "lake"))
    w.close()
    return dsn


def test_provider_roundtrip(live_catalog):
    from datafusion_ducklake_spark.metadata.provider import provider_for
    p = provider_for(live_catalog)
    try:
        snap = p.get_current_snapshot()
        assert snap >= 0
        assert p.get_data_path()
        assert isinstance(p.list_snapshots(), list)
    finally:
        p.close()


def test_engine_lifecycle(spark, live_catalog):
    """create / insert / delete / update / compact / time travel / CDC
    against the live catalog — every catalog statement the engine emits
    crosses the real wire."""
    from datafusion_ducklake_spark.catalog import DuckLakeSession
    dl = DuckLakeSession(spark, live_catalog)
    t = f"main.live_{uuid.uuid4().hex[:8]}"
    dl.create_table(t, spark.createDataFrame(
        [(i, float(i)) for i in range(50)], "id INT, v DOUBLE"))
    pre = dl.provider.get_current_snapshot()
    dl.insert_into(t, spark.createDataFrame(
        [(100, 1.5)], "id INT, v DOUBLE"))
    dl.delete_from(t, "id < 10")
    dl.update_where(t, {"v": "v + 0.25"}, "id = 20")
    rows = {r["id"]: r["v"] for r in dl.table(t).collect()}
    assert len(rows) == 41 and rows[20] == 20.25 and rows[100] == 1.5
    dl.compact(t)
    assert len(dl.table(t).collect()) == 41
    pinned = DuckLakeSession(spark, live_catalog, snapshot_id=pre)
    assert len(pinned.table(t).collect()) == 50
    changes = dl.table_changes(t, pre, dl.provider.get_current_snapshot())
    assert changes.count() > 0


def test_transactions_and_conflicts(spark, live_catalog):
    from datafusion_ducklake_spark.catalog import DuckLakeSession
    dl = DuckLakeSession(spark, live_catalog)
    t = f"main.live_{uuid.uuid4().hex[:8]}"
    dl.create_table(t, spark.createDataFrame([(1,)], "id INT"))
    dl.begin_transaction()
    dl.insert_into(t, spark.createDataFrame([(2,)], "id INT"))
    dl.rollback()
    assert [r["id"] for r in dl.table(t).collect()] == [1]
    dl.begin_transaction()
    dl.insert_into(t, spark.createDataFrame([(3,)], "id INT"))
    dl.commit()
    assert sorted(r["id"] for r in dl.table(t).collect()) == [1, 3]
