from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

SF_SMOKE = "/root/testdata/sf0.001"
SF_CORRECT = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    from datafusion_ducklake_spark.sparkutil import build_spark
    s = build_spark("pytest", cpus=8)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def duck(tmp_path_factory):
    import duckdb

    from datafusion_ducklake_spark.queries._util import TABLES
    con = duckdb.connect()
    for name in TABLES:
        con.sql(f"CREATE VIEW {name} AS SELECT * FROM "
                f"read_parquet('{SF_SMOKE}/{name}.parquet')")
    yield con
    con.close()


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "live_backend: needs a live Postgres/MySQL server "
        "(DUCKLAKE_PG_DSN / DUCKLAKE_MYSQL_DSN); skips cleanly offline")
