"""DuckLake struct field evolution (reference corpus:
tests/sqllogictests/sql/alter/struct_evolution*.test).

The catalog records one ducklake_column child row per nested field
(parent_column set — the shape metadata_provider.rs:361-410 reads), the
writer stamps those ids as parquet field ids at EVERY nesting level, and
the scan resolves struct fields by id, so:
- adding a field reads NULL from older files,
- dropping + re-adding a field yields a FRESH id (no value resurrection),
- kept fields survive renames of nothing but their parent's type string.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
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


def _rows(dl, sql):
    return sorted([tuple(r) for r in dl.sql(sql).collect()], key=str)


def test_add_promote_drop_fields(dl):
    dl.sql("CREATE TABLE t (col1 STRUCT<i:INT,j:INT>)")
    dl.sql("INSERT INTO t SELECT named_struct('i', 1, 'j', 2) AS col1")
    dl.sql("ALTER TABLE t ALTER COLUMN col1 SET DATA TYPE "
           "STRUCT(i INT, j INT, k TINYINT)")
    dl.sql("INSERT INTO t VALUES (named_struct('i', 10, 'j', 20, 'k', 3))")
    assert _rows(dl, "SELECT col1.i, col1.j, col1.k FROM t") == \
        [(1, 2, None), (10, 20, 3)]
    # promote k TINYINT -> INT: old int8 pages widen at scan
    dl.sql("ALTER TABLE t ALTER COLUMN col1 SET DATA TYPE "
           "STRUCT(i INT, j INT, k INTEGER)")
    dl.sql("INSERT INTO t VALUES (named_struct('i', 5, 'j', 6, 'k', 1000))")
    assert _rows(dl, "SELECT col1.k FROM t WHERE col1.k IS NOT NULL") == \
        [(1000,), (3,)]
    # drop i: projection disappears everywhere, files untouched
    dl.sql("ALTER TABLE t ALTER COLUMN col1 SET DATA TYPE "
           "STRUCT(j INT, k INTEGER)")
    assert "i" not in dl.table("main.t").schema["col1"].dataType.names
    assert _rows(dl, "SELECT col1.j FROM t") == [(2,), (20,), (6,)]


def test_reuse_gets_fresh_field_id(dl):
    dl.sql("CREATE TABLE t (col1 STRUCT<i:INT,j:INT>)")
    dl.sql("INSERT INTO t SELECT named_struct('i', 1, 'j', 2) AS col1")
    old = {p: i for p, i in dl.table_handle("main.t").columns[0].nested_ids}
    dl.sql("ALTER TABLE t ALTER COLUMN col1 SET DATA TYPE STRUCT(j INT)")
    dl.sql("INSERT INTO t SELECT named_struct('j', 20) AS col1")
    dl.sql("ALTER TABLE t ALTER COLUMN col1 SET DATA TYPE "
           "STRUCT(j INT, i INT)")
    new = {p: i for p, i in dl.table_handle("main.t").columns[0].nested_ids}
    assert new[("j",)] == old[("j",)]          # kept field: stable id
    assert new[("i",)] != old[("i",)]          # re-added field: fresh id
    # and therefore: no resurrection of the pre-drop values
    assert _rows(dl, "SELECT col1.j, col1.i FROM t") == \
        [(2, None), (20, None)]


def test_child_rows_written_and_stable(dl, tmp_path):
    import sqlite3
    dl.sql("CREATE TABLE t (a INT, col1 STRUCT<i:INT,j:STRUCT<c1:INT>>)")
    dl.sql("INSERT INTO t SELECT 1 AS a, "
           "named_struct('i', 1, 'j', named_struct('c1', 2)) AS col1")
    ids1 = dict(dl.table_handle("main.t").columns[1].nested_ids)
    assert set(ids1) == {("i",), ("j",), ("j", "c1")}
    conn = sqlite3.connect(dl.catalog_path)
    rows = conn.execute(
        "SELECT column_name, parent_column FROM ducklake_column "
        "WHERE end_snapshot IS NULL AND parent_column IS NOT NULL").fetchall()
    conn.close()
    assert {r[0] for r in rows} == {"i", "j", "c1"}
    # a second insert re-versions the columns; nested ids must not drift
    dl.sql("INSERT INTO t SELECT 2, named_struct('i', 3, 'j', "
           "named_struct('c1', 4))")
    ids2 = dict(dl.table_handle("main.t").columns[1].nested_ids)
    assert ids2 == ids1


def test_parquet_files_carry_nested_field_ids(dl):
    dl.sql("CREATE TABLE t (col1 STRUCT<i:INT,j:INT>)")
    dl.sql("INSERT INTO t SELECT named_struct('i', 1, 'j', 2) AS col1")
    handle = dl.table_handle("main.t")
    ids = dict(handle.columns[0].nested_ids)
    [f] = handle.files
    path = f.data_uri[len("file://"):] if f.data_uri.startswith("file://") \
        else f.data_uri
    s = pq.read_schema(path)
    struct = s.field(0).type
    got = {struct.field(k).name: int(struct.field(k).metadata[b"PARQUET:field_id"])
           for k in range(struct.num_fields)}
    assert got == {"i": ids[("i",)], "j": ids[("j",)]}


def test_dotted_alter_list_and_map(dl):
    dl.sql("CREATE TABLE t (col1 STRUCT<i:INT>[])")
    dl.sql("INSERT INTO t SELECT array(named_struct('i', 1)) AS col1")
    dl.sql("ALTER TABLE t ADD COLUMN col1.element.k INT")
    dl.sql("INSERT INTO t SELECT array(named_struct('i', 2, 'k', 20))")
    assert _rows(dl, "SELECT col1[0].i, col1[0].k FROM t") == \
        [(1, None), (2, 20)]
    with pytest.raises(InvalidConfig, match="already exists"):
        dl.sql("ALTER TABLE t ADD COLUMN col1.element.k INT")
    with pytest.raises(InvalidConfig, match="not a struct"):
        dl.sql("ALTER TABLE t ADD COLUMN col1.element.k.x INT")
    dl.sql("ALTER TABLE t DROP COLUMN col1.element.i")
    with pytest.raises(InvalidConfig, match="last field"):
        dl.sql("ALTER TABLE t DROP COLUMN col1.element.k")


def test_pre_nested_id_files_fall_back_to_name(spark, tmp_path):
    """A data file written BEFORE nested-id stamping (top-level ids only)
    under a child-row catalog schema must resolve struct fields by NAME —
    not silently read all-NULL (the fieldId.read.ignoreMissing hazard)."""
    from tests.ducklake_fixtures import FixtureCatalog

    cat = FixtureCatalog(str(tmp_path))
    s1 = cat.snapshot()
    sid = cat.schema("main", s1)
    tid = cat.table(sid, "main", "legacy", s1)
    cat.column(tid, 1, "col1", "struct<i:int32,j:int32>", 0, s1)
    cat.column(tid, 2, "i", "int32", 1, s1, parent=1)
    cat.column(tid, 3, "j", "int32", 2, s1, parent=1)

    tdir = cat.table_dir("main", "legacy")
    os.makedirs(tdir, exist_ok=True)
    # top-level field id only — the pre-upgrade writer's output
    struct_t = pa.struct([pa.field("i", pa.int32()), pa.field("j", pa.int32())])
    schema = pa.schema([pa.field("col1", struct_t,
                                 metadata={b"PARQUET:field_id": b"1"})])
    path = os.path.join(tdir, "ducklake-legacy.parquet")
    pq.write_table(pa.table({"col1": [{"i": 7, "j": 8}]}, schema=schema), path)
    cat.data_file(tid, "ducklake-legacy.parquet", os.path.getsize(path), s1, 1)

    import datafusion_ducklake_spark.sources.scan as scan_mod
    scan_mod._FIELD_ID_CACHE.clear()
    dl = DuckLakeSession(spark, cat.db_path)
    assert [tuple(r) for r in
            dl.sql("SELECT col1.i, col1.j FROM legacy").collect()] == [(7, 8)]


def test_table_changes_pins_schema_at_range_end(dl):
    """A CDC window that closes BEFORE an ALTER surfaces that era's
    schema (DuckDB's table_changes resolves the table at end_snapshot),
    while a window spanning the ALTER reads under the evolved schema
    with NULL-filled new fields."""
    dl.sql("CREATE TABLE t (col1 STRUCT<i:INT,j:INT>)")
    dl.sql("INSERT INTO t SELECT named_struct('i', 1, 'j', 2)")
    s1 = dl.provider.get_current_snapshot()
    dl.sql("ALTER TABLE t ALTER COLUMN col1 SET DATA TYPE "
           "STRUCT(i INT, j INT, k INT)")
    dl.sql("INSERT INTO t SELECT named_struct('i', 10, 'j', 20, 'k', 30)")
    s2 = dl.provider.get_current_snapshot()
    pre = dl.table_changes("main.t", 0, s1)
    assert pre.schema["col1"].dataType.names == ["i", "j"]
    assert [tuple(r["col1"]) for r in pre.collect()] == [(1, 2)]
    full = dl.table_changes("main.t", 0, s2)
    assert full.schema["col1"].dataType.names == ["i", "j", "k"]
    assert sorted(tuple(r["col1"]) for r in full.collect()) == \
        [(1, 2, None), (10, 20, 30)]


def test_nested_field_rename_preserves_values(dl):
    """RENAME COLUMN col1.i TO x keeps the nested FIELD ID, so existing
    files resolve the renamed field with their original values (the
    nested analog of metadata-only top-level renames)."""
    dl.sql("CREATE TABLE t (col1 STRUCT<i:INT,j:STRUCT<c1:INT>>)")
    dl.sql("INSERT INTO t SELECT named_struct('i', 1, 'j', "
           "named_struct('c1', 7))")
    before = dict(dl.table_handle("main.t").columns[0].nested_ids)
    dl.sql("ALTER TABLE t RENAME COLUMN col1.i TO x")
    after = dict(dl.table_handle("main.t").columns[0].nested_ids)
    assert after[("x",)] == before[("i",)]          # id preserved
    assert _rows(dl, "SELECT col1.x FROM t") == [(1,)]   # value survives
    # renaming an inner struct carries the grandchildren's ids too
    dl.sql("ALTER TABLE t RENAME COLUMN col1.j TO jj")
    after2 = dict(dl.table_handle("main.t").columns[0].nested_ids)
    assert after2[("jj", "c1")] == before[("j", "c1")]
    assert _rows(dl, "SELECT col1.jj.c1 FROM t") == [(7,)]
    with pytest.raises(InvalidConfig, match="already exists"):
        dl.sql("ALTER TABLE t RENAME COLUMN col1.x TO jj")
    with pytest.raises(InvalidConfig, match="does not exist"):
        dl.sql("ALTER TABLE t RENAME COLUMN col1.nope TO y")


def test_mapped_files_never_resurrect_nested_fields(dl, spark, tmp_path):
    """A name-mapped (add_files) file carries NO nested field ids, so a
    dropped-then-readded struct field must be era-clipped from its read
    (NULL), not read by name — the nested analog of the mapping's
    top-level dropped-column shadowing."""
    import duckdb
    ext = str(tmp_path / "ext.parquet")
    duckdb.sql(f"COPY (SELECT {{'i': 7, 'j': 8}} AS col1) TO '{ext}'")
    dl.sql("CREATE TABLE m (col1 STRUCT<i:INT,j:INT>)")
    dl.sql(f"CALL ducklake_add_data_files('m', '{ext}')")
    dl.sql("ALTER TABLE m ALTER COLUMN col1 SET DATA TYPE STRUCT(j INT)")
    dl.sql("ALTER TABLE m ALTER COLUMN col1 SET DATA TYPE "
           "STRUCT(j INT, i INT)")
    assert _rows(dl, "SELECT col1.j, col1.i FROM m") == [(8, None)]
    # an engine-written post-evolution file coexists, resolving by id
    dl.sql("INSERT INTO m SELECT named_struct('j', 1, 'i', 2)")
    assert _rows(dl, "SELECT col1.j, col1.i FROM m") == \
        [(1, 2), (8, None)]
    # and DML through the mapped+clipped read stays correct
    assert dl.delete_from("main.m", "col1.j = 8") == 1
    assert _rows(dl, "SELECT col1.j, col1.i FROM m") == [(1, 2)]
