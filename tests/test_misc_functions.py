"""database_size introspection + parameterized queries (prepared-
statement parity; ref corpus: sql/general/)."""

import pytest

from datafusion_ducklake_spark.catalog import DuckLakeSession
from datafusion_ducklake_spark.errors import InvalidConfig
from datafusion_ducklake_spark.metadata.writer import CatalogWriter


@pytest.fixture()
def dl(spark, tmp_path):
    db = str(tmp_path / "cat.sqlite")
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=str(tmp_path / "lake"))
    w.close()
    s = DuckLakeSession(spark, db)
    s.create_table("main.t", spark.range(100).selectExpr(
        "id", "id % 7 AS grp"))
    return s


def test_database_size(dl):
    dl.register_sql_functions()
    row = dl.sql("SELECT * FROM ducklake_database_size()").collect()[0]
    assert row["data_size_bytes"] > 0
    assert row["metadata_size_bytes"] > 0
    assert row["file_count"] == 1


def test_parameterized_sql(dl):
    dl.register_views()
    assert dl.sql("SELECT count(*) AS n FROM t WHERE grp = ?",
                  [3]).collect()[0]["n"] == 14
    assert dl.sql("SELECT count(*) AS n FROM t WHERE id < :hi AND grp = :g",
                  {"hi": 50, "g": 0}).collect()[0]["n"] == 8
    with pytest.raises(InvalidConfig, match="not DML"):
        dl.sql("DELETE FROM t WHERE grp = ?", [1])


def test_at_timestamp_time_travel(dl, spark):
    """AT (TIMESTAMP => ...) resolves to the newest snapshot at-or-before
    the given time (lexicographic over ISO snapshot_time)."""
    import sqlite3
    dl.insert_into("main.t", spark.range(5).selectExpr(
        "id", "id % 7 AS grp"))
    # deterministic snapshot times: restamp them 1 minute apart
    con = sqlite3.connect(dl.catalog_path)
    snaps = [r[0] for r in con.execute(
        "SELECT snapshot_id FROM ducklake_snapshot ORDER BY snapshot_id")]
    for i, sid in enumerate(snaps):
        con.execute(
            "UPDATE ducklake_snapshot SET snapshot_time = ? "
            "WHERE snapshot_id = ?", (f"2024-01-01 10:{i:02d}:00", sid))
    con.commit()
    con.close()
    dl.refresh()
    # the second-to-last snapshot is the 100-row create
    ts = f"2024-01-01 10:{len(snaps) - 2:02d}:30"
    n = dl.sql("SELECT count(*) AS n FROM t "
               f"AT (TIMESTAMP => '{ts}')").collect()[0]["n"]
    assert n == 100
    assert dl.sql("SELECT count(*) AS n FROM t").collect()[0]["n"] == 105

    import pytest as _pytest

    from datafusion_ducklake_spark.errors import InvalidConfig as _IC
    with _pytest.raises(_IC, match="No snapshot found"):
        dl.sql("SELECT * FROM t AT (TIMESTAMP => '1999-01-01 00:00:00')")
