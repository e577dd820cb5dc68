"""add_files over external parquet: globs, allow_missing, hive layouts
(is_partition name-mapping rows + path-value injection), mapping
dedup, and catalog pruning on synthesized hive stats.

Reference corpus: tests/sqllogictests/sql/add_files/ (add_files.test,
add_files_hive.test, add_files_missing_columns.test)."""

import sqlite3

import duckdb
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
    return DuckLakeSession(spark, db)


def _copy(sql: str, dest: str):
    duckdb.connect().execute(f"COPY ({sql}) TO '{dest}'")


def test_add_files_glob_and_mapping_dedup(dl, spark, tmp_path):
    dl.create_table("main.t", spark.sql(
        "SELECT CAST(1 AS INT) a, CAST('x' AS STRING) b"))
    _copy("SELECT 2 a, 'y' b", f"{tmp_path}/f1.parquet")
    _copy("SELECT 'z' b, 3 a", f"{tmp_path}/f2.parquet")  # reversed order
    n = dl.add_files("main.t", [f"{tmp_path}/f*.parquet"])
    assert n == 2
    dl.refresh()
    assert sorted(r["a"] for r in dl.table("main.t").collect()) == [1, 2, 3]
    # one mapping per distinct column-name shape (duplicate-eliminated)
    con = sqlite3.connect(str(tmp_path / "cat.sqlite"))
    assert con.execute(
        "SELECT count(*) FROM ducklake_column_mapping").fetchone()[0] == 1

    with pytest.raises(InvalidConfig, match="no files match"):
        dl.add_files("main.t", [f"{tmp_path}/nope*.parquet"])


def test_add_files_hive_prunes_and_survives_rename(dl, spark, tmp_path):
    dl.create_table("main.h", spark.sql(
        "SELECT CAST(NULL AS INT) pk, CAST(NULL AS STRING) v WHERE false"))
    for pk, v in [(1, "a"), (2, "b")]:
        d = tmp_path / f"hv/pk={pk}"
        d.mkdir(parents=True)
        _copy(f"SELECT '{v}' v", f"{d}/data.parquet")
    dl.add_files("main.h", [f"{tmp_path}/hv/**/*.parquet"])
    dl.refresh()
    rows = {(r["pk"], r["v"]) for r in dl.table("main.h").collect()}
    assert rows == {(1, "a"), (2, "b")}

    # synthesized min=max stats make partition pruning exact: the pk=2
    # hive file is excluded (the stats-less empty seed file is kept —
    # conservative by design)
    h = dl.table_handle("main.h")
    kept = {f.data_uri for f in h.prune_files([("pk", "=", 1)])}
    assert not any("pk=2" in u for u in kept)
    assert any("pk=1" in u for u in kept)

    # rename keeps the injection working (mapping is by column_id)
    dl.rename_column("main.h", "pk", "pk2")
    dl.refresh()
    rows = {(r["pk2"], r["v"]) for r in dl.table("main.h").collect()}
    assert rows == {(1, "a"), (2, "b")}


def test_add_files_missing_column_contract(dl, spark, tmp_path):
    dl.create_table("main.m", spark.sql(
        "SELECT CAST(1 AS INT) i, CAST(2 AS INT) j"))
    _copy("SELECT 42 j", f"{tmp_path}/mj.parquet")
    with pytest.raises(InvalidConfig, match='Column "i" exists in table'):
        dl.add_files("main.m", [f"{tmp_path}/mj.parquet"])
    dl.add_files("main.m", [f"{tmp_path}/mj.parquet"], allow_missing=True)
    dl.refresh()
    rows = sorted(((r["i"], r["j"]) for r in dl.table("main.m").collect()),
                  key=lambda t: (t[0] is None, t[0]))
    assert rows == [(1, 2), (None, 42)]


def test_hive_many_partitions_single_scan(dl, spark, tmp_path):
    """Above MAX_HIVE_VALUE_BRANCHES distinct partition tuples the scan
    derives hive values from _metadata.file_path in ONE plan branch —
    no per-partition scan explosion at 100k-partition scale."""
    dl.create_table("main.hm", spark.sql(
        "SELECT CAST(NULL AS INT) pk, CAST(NULL AS STRING) v WHERE false"))
    # decoy segment whose name merely ENDS with "pk=": the value regexp
    # must anchor at a path-segment start
    for pk in range(40):
        d = tmp_path / f"hm/decoy_pk=999/pk={pk}"
        d.mkdir(parents=True)
        _copy(f"SELECT 'val{pk}' v", f"{d}/data.parquet")
    dl.add_files("main.hm", [f"{tmp_path}/hm/**/*.parquet"])
    dl.refresh()
    df = dl.table("main.hm")
    rows = {(r["pk"], r["v"]) for r in df.collect()}
    assert rows == {(pk, f"val{pk}") for pk in range(40)}
    # one scan branch for all 40 partitions (plus the empty seed file)
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Relation") <= 2, plan
    # filters on derived values still work
    assert df.filter("pk = 17").collect()[0]["v"] == "val17"


def test_hive_null_marker_and_escaped_values(dl, spark, tmp_path):
    """__HIVE_DEFAULT_PARTITION__ reads as NULL and percent-escaped
    values decode — with None/str value mixes surviving the scan's
    group sort (review fix: sorted() TypeError)."""
    dl.create_table("main.hx", spark.sql(
        "SELECT CAST(NULL AS STRING) pk, CAST(NULL AS STRING) v "
        "WHERE false"))
    cases = [("a%20b", "a b"), ("plain", "plain"),
             ("__HIVE_DEFAULT_PARTITION__", None)]
    for raw, _dec in cases:
        d = tmp_path / f"hx/pk={raw}"
        d.mkdir(parents=True)
        _copy(f"SELECT 'v_{raw}' v", f"{d}/data.parquet")
    dl.add_files("main.hx", [f"{tmp_path}/hx/**/*.parquet"])
    dl.refresh()
    rows = {r["v"]: r["pk"] for r in dl.table("main.hx").collect()}
    assert rows["v_a%20b"] == "a b"
    assert rows["v_plain"] == "plain"
    assert rows["v___HIVE_DEFAULT_PARTITION__"] is None
    # DML over the same mix exercises the dml-side group sort too
    assert dl.delete_from("main.hx", "pk IS NULL") == 1
    dl.refresh()
    assert dl.table("main.hx").count() == 2


def test_hive_scan_preserves_schema_column_order(dl, spark, tmp_path):
    """Partition columns declared FIRST in the table must come back
    first from the mapped scan (review fix: apply_mapping appended
    injected columns at the end)."""
    dl.create_table("main.ho", spark.sql(
        "SELECT CAST(NULL AS INT) pk, CAST(NULL AS STRING) v "
        "WHERE false"))
    d = tmp_path / "ho/pk=1"
    d.mkdir(parents=True)
    _copy("SELECT 'x' v", f"{d}/data.parquet")
    dl.add_files("main.ho", [f"{tmp_path}/ho/**/*.parquet"])
    dl.refresh()
    df = dl.table("main.ho")
    assert df.columns == ["pk", "v"]
    assert df.collect()[0][0] == 1          # positional access


def test_hive_scale_path_with_escaped_minority(dl, spark, tmp_path):
    """Past the branch threshold, faithful partitions take the one-scan
    regexp path while escaped/NULL partitions keep exact literal
    branches — same results either side of the split."""
    dl.create_table("main.hs", spark.sql(
        "SELECT CAST(NULL AS STRING) pk, CAST(NULL AS STRING) v "
        "WHERE false"))
    expect = {}
    for i in range(40):
        raw = f"p{i}"
        d = tmp_path / f"hs/pk={raw}"
        d.mkdir(parents=True)
        _copy(f"SELECT 'v{i}' v", f"{d}/data.parquet")
        expect[f"v{i}"] = raw
    for raw, dec in [("x%20y", "x y"), ("__HIVE_DEFAULT_PARTITION__",
                                        None)]:
        d = tmp_path / f"hs/pk={raw}"
        d.mkdir(parents=True)
        _copy(f"SELECT 'v_{raw}' v", f"{d}/data.parquet")
        expect[f"v_{raw}"] = dec
    dl.add_files("main.hs", [f"{tmp_path}/hs/**/*.parquet"])
    dl.refresh()
    got = {r["v"]: r["pk"] for r in dl.table("main.hs").collect()}
    assert got == expect


def test_add_files_old_list_structure(dl, spark, tmp_path):
    """sql/add_files/add_old_list.test: parquet written with the LEGACY
    list annotation (list.item naming instead of the compliant
    list.element) registers and reads back — nested-list name mapping
    must not depend on the modern layout."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = str(tmp_path / "old_list.parquet")
    t = pa.table({"l": pa.array([[[1, 2], [3, 4]]],
                                pa.list_(pa.list_(pa.int32())))})
    pq.write_table(t, path, use_compliant_nested_type=False)
    # sanity: the file really is old-style (list.item leaves)
    assert "item" in str(pq.read_schema(path))

    dl.sql("CREATE TABLE ol (l INT[][])")
    dl.sql(f"CALL ducklake_add_data_files('ol', '{path}')")
    rows = dl.table("main.ol").collect()
    assert len(rows) == 1
    assert rows[0]["l"] == [[1, 2], [3, 4]]
    # a native insert coexists with the mapped legacy file
    dl.sql("INSERT INTO ol SELECT array(array(9)) AS l")
    got = sorted(r["l"] for r in dl.table("main.ol").collect())
    assert got == [[[1, 2], [3, 4]], [[9]]]


def test_add_files_two_level_legacy_list(dl, spark, tmp_path):
    """sql/add_files/add_old_list.test: the TRUE legacy 2-level avro
    list layout (`repeated group array` directly under the LIST group —
    what Spark's writeLegacyFormat and old Hive writers emit). pyarrow
    surfaces the wrapper as a single-field struct, so the footer type
    check must collapse it (types.normalize_legacy_arrow_lists); Spark's
    reader handles the layout natively at scan time."""
    import glob as _glob

    spark.conf.set("spark.sql.parquet.writeLegacyFormat", "true")
    try:
        spark.sql("SELECT array(array(1, 2), array(3, 4)) AS l")\
            .coalesce(1).write.parquet(str(tmp_path / "old2"))
    finally:
        spark.conf.unset("spark.sql.parquet.writeLegacyFormat")
    f = _glob.glob(str(tmp_path / "old2" / "*.parquet"))[0]
    # sanity: this really is the 2-level layout (repeated group "array")
    import pyarrow.parquet as pq
    assert "repeated group field_id=-1 array" in str(pq.ParquetFile(f).schema)

    dl.sql("CREATE TABLE ol2 (l INT[][])")
    dl.sql(f"CALL ducklake_add_data_files('ol2', '{f}')")
    rows = dl.table("main.ol2").collect()
    assert len(rows) == 1 and rows[0]["l"] == [[1, 2], [3, 4]]
    # a genuine single-field struct column does NOT collapse: the direct
    # check passes first, so the fallback never rewrites it
    dl.sql("CREATE TABLE keep (s STRUCT(array INT[]))")
    import duckdb
    duckdb.connect().execute(
        "COPY (SELECT {'array': [7]} AS s) TO "
        f"'{tmp_path}/keep.parquet'")
    dl.sql(f"CALL ducklake_add_data_files('keep', '{tmp_path}/keep.parquet')")
    krows = dl.table("main.keep").collect()
    assert krows[0]["s"]["array"] == [7]
