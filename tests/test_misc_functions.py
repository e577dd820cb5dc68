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
