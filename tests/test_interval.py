"""INTERVAL column support (reference: types.rs:56 maps DuckLake
``interval`` to Arrow Interval(MonthDayNano) for scans).

Spark has no interval COLUMN type readable from parquet (its schema
converter rejects FIXED_LEN_BYTE_ARRAY(INTERVAL)), so the engine reads
the physical 12-byte value as binary and decodes the three little-endian
u32 components (months, days, millis — the parquet logical-type spec's
layout) JVM-side into struct<months:int, days:int, micros:long>.
Fixtures are written by DuckDB itself (COPY ... TO parquet), the one
engine here that can produce parquet INTERVAL — every decoded value is
cross-checked against DuckDB reading the same file.

Write-side (r9): df.write.parquet and pyarrow (probed: 16.1 raises
ArrowNotImplementedError on month_day_nano_interval) cannot emit the
parquet INTERVAL logical type, but an executor-side embedded DuckDB
``COPY`` can — INSERT/CTAS stage through it
(table_writer._write_interval_distributed), registering the files under
an identity name mapping exactly like add_files. Rewrites
(UPDATE/MERGE/compact/merge_adjacent) stage through the same writer;
cluster_by is the one remaining boundary (Spark's bucketed writer owns
bucket-id file naming). DELETE (positional-delete files only) and
add_files work as before.
"""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from datafusion_ducklake_spark.catalog import DuckLakeSession
from datafusion_ducklake_spark.errors import InvalidConfig, UnsupportedType
from datafusion_ducklake_spark.metadata.writer import CatalogWriter
from datafusion_ducklake_spark.types import (
    INTERVAL_SPARK_TYPE, ducklake_to_spark_type)

N = 60


def _write_interval_parquet(path: str, n: int = N) -> None:
    """DuckDB-written parquet with an INTERVAL column derived
    deterministically from the row index (NULL every 7th row)."""
    duckdb.connect().execute(f"""
        COPY (SELECT i::INT AS id,
                     CASE WHEN i % 7 = 3 THEN NULL
                          ELSE INTERVAL (i % 25) MONTH
                             + INTERVAL (i % 40) DAY
                             + INTERVAL (i * 321) MILLISECOND END AS iv
              FROM range({n}) t(i))
        TO '{path}' (FORMAT PARQUET)""")


@pytest.fixture()
def iv_session(spark, tmp_path):
    """Session over a catalog whose ``main.iv`` table is one
    DuckDB-written interval parquet, registered via the interop path
    (create_empty_table + add_files)."""
    data = str(tmp_path / "iv.parquet")
    _write_interval_parquet(data)
    db = str(tmp_path / "catalog.sqlite")
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=str(tmp_path / "lake"))
    w.close()
    s = DuckLakeSession(spark, db)
    s.create_empty_table("main.iv", "id INTEGER, iv INTERVAL")
    assert s.add_files("main.iv", [data]) == N
    return s, data


def _duckdb_expected(data: str, where: str = "TRUE"):
    """(sum months, sum days, sum micros, null count) via DuckDB's own
    interval accessors over the same file — the cross-engine oracle."""
    return duckdb.connect().execute(f"""
        SELECT sum(date_part('year', iv)*12 + date_part('month', iv)),
               sum(date_part('day', iv)),
               sum((date_part('hour', iv)*3600
                    + date_part('minute', iv)*60)*1000000
                   + date_part('microsecond', iv)),
               count(*) FILTER (iv IS NULL)
        FROM '{data}' WHERE {where}""").fetchone()


def _spark_actual(df):
    r = df.agg(F.sum("iv.months"), F.sum("iv.days"), F.sum("iv.micros"),
               F.count(F.when(F.col("iv").isNull(), 1))).collect()[0]
    return tuple(r)


def test_type_mapping():
    m = ducklake_to_spark_type("interval")
    assert m.spark_type == INTERVAL_SPARK_TYPE
    assert m.canonical == "interval"
    assert not m.lossless          # u32 months/days narrow to int32


def test_nested_interval_rejected():
    for t in ("list<interval>", "struct<a:interval>",
              "map<varchar,interval>"):
        with pytest.raises(UnsupportedType, match="top-level"):
            ducklake_to_spark_type(t)


def test_scan_values_match_duckdb(iv_session):
    s, data = iv_session
    assert _spark_actual(s.table("main.iv")) == _duckdb_expected(data)


def test_scan_per_row_decode(iv_session):
    s, data = iv_session
    rows = {r.id: r.iv for r in s.table("main.iv").collect()}
    exp = duckdb.connect().execute(f"""
        SELECT id,
               date_part('year', iv)*12 + date_part('month', iv),
               date_part('day', iv),
               (date_part('hour', iv)*3600
                + date_part('minute', iv)*60)*1000000
               + date_part('microsecond', iv)
        FROM '{data}' ORDER BY id""").fetchall()
    assert len(rows) == N
    for rid, months, days, micros in exp:
        got = rows[rid]
        if months is None:
            assert got is None
        else:
            assert (got.months, got.days, got.micros) == \
                (months, days, micros)


def test_zero_interval_is_not_null(iv_session):
    s, _ = iv_session
    r0 = s.table("main.iv").filter("id = 0").collect()[0]
    assert r0.iv is not None
    assert (r0.iv.months, r0.iv.days, r0.iv.micros) == (0, 0, 0)


def test_sql_seam_over_interval(iv_session):
    s, data = iv_session
    got = s.sql("SELECT sum(iv.days) AS d FROM main.iv "
                "WHERE id < 30").collect()[0]["d"]
    exp = _duckdb_expected(data, "id < 30")[1]
    assert got == exp


def test_filter_on_other_column_pushes_down(iv_session):
    """The decode projection must not block pushdown of predicates on
    other columns into the parquet scan."""
    s, _ = iv_session
    plan = s.table("main.iv").filter("id > 50") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "GreaterThan(id,50)" in plan


def test_delete_then_scan(iv_session):
    """DELETE writes only positional-delete files — allowed; the MOR
    scan decodes the surviving interval values."""
    s, data = iv_session
    n = s.delete_from("main.iv", "id % 2 = 1")
    assert n == N // 2
    s.refresh()
    assert _spark_actual(s.table("main.iv")) == \
        _duckdb_expected(data, "id % 2 = 0")


def test_rowid_scan(iv_session):
    s, _ = iv_session
    df = s.table("main.iv", with_rowid=True)
    rows = df.select("rowid", "id", "iv").orderBy("rowid").collect()
    assert [r.rowid for r in rows] == list(range(N))
    assert rows[1].iv.months == 1


def test_time_travel_after_delete(iv_session):
    s, data = iv_session
    snap_before = s.provider.get_current_snapshot()
    s.delete_from("main.iv", "id >= 10")
    s.refresh()
    assert s.table("main.iv").count() == 10
    old = s.sql(f"SELECT * FROM main.iv AT (VERSION => {snap_before})")
    assert _spark_actual(old) == _duckdb_expected(data)


def test_insert_from_scan_roundtrips(iv_session, spark):
    """r9 write path: INSERT of the struct representation (here: a scan
    of the table itself) stages through the executor-side duckdb COPY
    and the file carries the REAL parquet INTERVAL logical type —
    DuckDB reads it back as INTERVAL with the same values."""
    import glob

    s, data = iv_session
    sel = s.table("main.iv").filter(F.col("id") < 5)
    exp = _spark_actual(sel)
    assert s.insert_into("main.iv", sel) == 5
    s.refresh()
    got = _spark_actual(s.table("main.iv"))
    base = _duckdb_expected(data)
    assert got[3] == base[3] + exp[3]          # null count adds up
    assert got[0] == base[0] + (exp[0] or 0)
    # the engine-written file is genuine parquet INTERVAL
    lake = s.table_handle("main.iv").table_path
    lake = lake[len("file://"):] if lake.startswith("file://") else lake
    written = [p for p in glob.glob(lake + "/*.parquet")
               if os.path.basename(p).startswith("ducklake-")]
    assert written
    typ, cnt = duckdb.connect().execute(
        f"SELECT any_value(typeof(iv)), count(*) "
        f"FROM '{written[0]}'").fetchone()
    assert typ == "INTERVAL" and cnt == 5


def test_interval_ctas_and_submilli_truncation(spark, tmp_path):
    """CTAS with an INTERVAL_MARK-ed struct column declares a real
    INTERVAL column; sub-millisecond micros truncate exactly as
    DuckDB's own parquet interval COPY does (parquet stores millis),
    and a bare struct WITHOUT the mark stays a struct column."""
    from pyspark.sql import types as T

    from datafusion_ducklake_spark.types import INTERVAL_MARK
    db = str(tmp_path / "ctas.sqlite")
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=str(tmp_path / "lake"))
    w.close()
    s = DuckLakeSession(spark, db)
    src = spark.range(6).select(
        F.col("id").cast("int").alias("id"),
        F.struct(F.lit(1).cast("int").alias("months"),
                 F.lit(2).cast("int").alias("days"),
                 (F.col("id") * 1000 + 1).cast("long").alias("micros"))
        .alias("iv", metadata={INTERVAL_MARK: True}))
    s.create_table("main.ivc", src)
    assert [(c.column_name, c.column_type)
            for c in s.table_handle("main.ivc").columns] \
        == [("id", "int32"), ("iv", "interval")]
    rows = {r.id: r.iv for r in s.table("main.ivc").collect()}
    # micros = id*1000 + 1: the trailing +1 µs truncates on write
    assert all(v.micros == k * 1000 for k, v in rows.items())
    assert all((v.months, v.days) == (1, 2) for v in rows.values())
    # unmarked struct (same shape, no INTERVAL_MARK): stays a struct
    # column — the shape alone must never be hijacked into interval.
    # (Selecting/aliasing a MARKED column keeps its metadata, so derived
    # frames of real intervals still declare interval — by design.)
    s.create_table("main.plain_struct", spark.range(2).select(
        F.col("id").cast("int").alias("id"),
        F.struct(F.lit(1).cast("int").alias("months"),
                 F.lit(2).cast("int").alias("days"),
                 F.lit(0).cast("long").alias("micros")).alias("s")))
    assert s.table_handle("main.plain_struct").columns[1].column_type \
        != "interval"
    # rewrites stage through the same duckdb writer (r9): compact after
    # a delete keeps the truncated-but-stable values
    s.delete_from("main.ivc", "id = 0")
    s.refresh()
    s.compact("main.ivc")
    s.refresh()
    rows2 = {r.id: r.iv for r in s.table("main.ivc").collect()}
    assert rows2 == {k: v for k, v in rows.items() if k != 0}
    # the one remaining rewrite boundary: the bucketed export
    with pytest.raises(UnsupportedType, match="INTERVAL"):
        s.cluster_by("main.ivc", "id", 2)
    # negative components fail loudly (DuckDB's own parquet guard)
    import pyspark.errors
    with pytest.raises(Exception, match="negative intervals"):
        s.insert_into("main.ivc", spark.range(1).select(
            F.lit(99).cast("int").alias("id"),
            F.struct(F.lit(-1).cast("int").alias("months"),
                     F.lit(0).cast("int").alias("days"),
                     F.lit(0).cast("long").alias("micros"))
            .alias("iv", metadata={INTERVAL_MARK: True})))


def test_rewrites_work_cluster_by_rejected(iv_session):
    """r9: every rewrite except cluster_by stages through the
    duckdb-backed interval writer. UPDATE of a non-interval column
    keeps the decoded interval values intact through the rewrite;
    compact collapses MOR debt; MERGE updates rows. cluster_by is the
    one remaining boundary (Spark's bucketed writer owns the bucket-id
    file naming and cannot emit INTERVAL)."""
    s, data = iv_session
    base = _duckdb_expected(data)
    assert s.update_where("main.iv", {"id": "id + 1000"},
                          "id < 3") == 3
    s.refresh()
    assert _spark_actual(s.table("main.iv")) == base
    assert sorted(r.id for r in
                  s.table("main.iv").filter("id >= 1000").collect()) \
        == [1000, 1001, 1002]
    s.delete_from("main.iv", "id = 1000")
    s.refresh()
    s.compact("main.iv")
    s.refresh()
    exp = _duckdb_expected(data, "id <> 0")       # original row 0 deleted
    got = _spark_actual(s.table("main.iv"))
    assert got[3] == exp[3] and got[1] == exp[1]
    # MERGE from an independent source frame (self-referential merge
    # sources are a separate, pre-existing lineage limitation)
    from pyspark.sql import types as T
    row = s.table("main.iv").filter("id = 1001").select("iv").collect()[0]
    src = s.spark.createDataFrame(
        [(1001, row.iv)],
        T.StructType([T.StructField("id", T.IntegerType()),
                      T.StructField("iv", INTERVAL_SPARK_TYPE)]))
    res = s.merge_into("main.iv", src, on=["id"],
                       when_matched_update={"id": "100001"})
    assert res["updated"] == 1
    s.refresh()
    assert s.table("main.iv").filter("id = 100001").count() == 1
    with pytest.raises(UnsupportedType, match="INTERVAL"):
        s.cluster_by("main.iv", "id", 4)


def test_maintenance_sweep_skips_interval_tables(iv_session, spark):
    """A catalog-wide merge_adjacent_files pass leaves a single-file
    interval table untouched (ineligible: no adjacency or delete debt);
    since r9 eligible interval tables DO rewrite through the duckdb
    staging instead of being skipped."""
    s, _ = iv_session
    df = spark.createDataFrame([(i,) for i in range(10)], "k INT")
    s.create_table("main.plain", df)
    s.insert_into("main.plain", df)      # 2 files → eligible for merge
    assert s.merge_adjacent_files() == 1  # plain merged, iv skipped
    s.refresh()
    assert s.table("main.iv").count() == N


def test_add_files_type_check_rejects_non_interval(iv_session, tmp_path):
    """A file whose column is NOT 12-byte fixed binary must not register
    into an interval column."""
    s, _ = iv_session
    bad = str(tmp_path / "bad.parquet")
    duckdb.connect().execute(
        f"COPY (SELECT 1::INT AS id, 'x' AS iv) TO '{bad}' "
        f"(FORMAT PARQUET)")
    with pytest.raises(InvalidConfig):
        s.add_files("main.iv", [bad])


def test_interval_stats_recorded_harmlessly(iv_session):
    """add_files records per-column stats; the interval column's FLBA
    min/max is non-UTF8 → stored NULL → pruning keeps the file."""
    s, data = iv_session
    handle = s.table_handle("main.iv")
    kept = handle.prune_files([("id", ">", 10)])
    assert len(kept) == 1          # id stats prune nothing here (one file)
    assert _spark_actual(s.table("main.iv")) == _duckdb_expected(data)


def test_multi_file_and_dirty_union(iv_session, tmp_path):
    """Second interval file appended via add_files + a delete over the
    first — clean/dirty branches both decode."""
    s, data = iv_session
    data2 = str(tmp_path / "iv2.parquet")
    duckdb.connect().execute(f"""
        COPY (SELECT (i + {N})::INT AS id,
                     INTERVAL (i) DAY AS iv FROM range(10) t(i))
        TO '{data2}' (FORMAT PARQUET)""")
    s.add_files("main.iv", [data2])
    s.refresh()
    s.delete_from("main.iv", f"id < 5")
    s.refresh()
    got = _spark_actual(s.table("main.iv"))
    exp1 = _duckdb_expected(data, "id >= 5")
    exp2 = duckdb.connect().execute(f"""
        SELECT sum(date_part('day', iv)) FROM '{data2}'""").fetchone()[0]
    assert got[0] == exp1[0]
    assert got[1] == exp1[1] + exp2
    assert got[3] == exp1[3]


def test_cdc_over_interval(iv_session):
    """table_changes decodes interval values in delete pre-images (the
    CDC read primitive funnels through the same _read_parquet)."""
    s, _ = iv_session
    s.delete_from("main.iv", "id < 3")
    s.refresh()
    snap = s.provider.get_current_snapshot()
    ch = s.table_changes("main.iv", snap - 1, snap).collect()
    assert len(ch) == 3
    assert all(r.change_type == "delete" for r in ch)
    by_id = {r.id: r.iv for r in ch}
    assert (by_id[2].months, by_id[2].days) == (2, 2)


@pytest.mark.slow


def test_stream_inserts_over_interval(iv_session, spark):
    """The catalog-driven insert stream reads files through pyarrow —
    interval columns must arrive decoded (interval_decode_arrow)."""
    from datafusion_ducklake_spark.streaming import cdc_source
    s, data = iv_session
    stream = cdc_source.stream_inserts(s, "main.iv")
    q = (stream.writeStream.format("memory").queryName("iv_stream")
         .trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = spark.sql("SELECT * FROM iv_stream")
    assert got.count() == N
    assert _spark_actual(got) == _duckdb_expected(data)


def test_grouped_dirty_scan_decodes(spark, tmp_path):
    """More dirty files than MAX_PER_FILE_BRANCHES routes through the
    single grouped scan + keyed anti-join — the decode and the
    _metadata-based position/file keying must still compose."""
    from datafusion_ducklake_spark.sources import scan as scan_mod
    n_files, per = 4, 6
    db = str(tmp_path / "catalog.sqlite")
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=str(tmp_path / "lake"))
    w.close()
    s = DuckLakeSession(spark, db)
    s.create_empty_table("main.iv", "id INTEGER, iv INTERVAL")
    for k in range(n_files):
        p = str(tmp_path / f"f{k}.parquet")
        duckdb.connect().execute(f"""
            COPY (SELECT (i + {k * per})::INT AS id,
                         INTERVAL (i + {k * per}) DAY AS iv
                  FROM range({per}) t(i)) TO '{p}' (FORMAT PARQUET)""")
        s.add_files("main.iv", [p])
        s.refresh()
    s.delete_from("main.iv", "id % 3 = 0")   # dirties every file
    s.refresh()
    old = scan_mod.MAX_PER_FILE_BRANCHES
    scan_mod.MAX_PER_FILE_BRANCHES = 2       # force the grouped path
    try:
        rows = s.table("main.iv").select("id", "iv.days").collect()
    finally:
        scan_mod.MAX_PER_FILE_BRANCHES = old
    surviving = [i for i in range(n_files * per) if i % 3 != 0]
    assert sorted(r["id"] for r in rows) == surviving
    assert all(r["id"] == r["days"] for r in rows)


def test_sql_ddl_create_interval_table(spark, tmp_path):
    """CREATE TABLE ... (iv INTERVAL) through the SQL seam."""
    db = str(tmp_path / "catalog.sqlite")
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=str(tmp_path / "lake"))
    w.close()
    s = DuckLakeSession(spark, db)
    s.sql("CREATE TABLE main.ivd (id INTEGER, iv INTERVAL)")
    cols = {c.column_name: c.column_type
            for c in s.table_handle("main.ivd").columns}
    assert cols["iv"] == "interval"
    assert s.table("main.ivd").count() == 0   # empty-table scan works


def test_decode_property_fuzz(spark, tmp_path):
    """Randomized (months, days, millis) triples round-trip bit-exactly
    through DuckDB's writer and our decode — including u32-boundary-ish
    values DuckDB can represent."""
    import random
    rng = random.Random(8)
    rows = [(i, rng.randrange(0, 12000), rng.randrange(0, 40000),
             rng.randrange(0, 2**40)) for i in range(200)]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id INT, m INT, d INT, us BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?)", rows)
    data = str(tmp_path / "fuzz.parquet")
    con.execute(f"""
        COPY (SELECT id, INTERVAL (m) MONTH + INTERVAL (d) DAY
                         + INTERVAL (us) MICROSECOND AS iv FROM t)
        TO '{data}' (FORMAT PARQUET)""")
    db = str(tmp_path / "catalog.sqlite")
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=str(tmp_path / "lake"))
    w.close()
    s = DuckLakeSession(spark, db)
    s.create_empty_table("main.fz", "id INTEGER, iv INTERVAL")
    s.add_files("main.fz", [data])
    got = {r.id: r.iv for r in s.table("main.fz").collect()}
    for rid, m, d, us in rows:
        # DuckDB truncates sub-milli on parquet write
        assert (got[rid].months, got[rid].days, got[rid].micros) == \
            (m, d, (us // 1000) * 1000)


def test_add_files_rejects_unannotated_flba12(iv_session, tmp_path):
    """A 12-byte binary column WITHOUT the parquet INTERVAL logical type
    must not register into an interval column — the decode is semantic,
    so an arbitrary blob would be silently misread as (months, days,
    millis)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    s, _ = iv_session
    blob = str(tmp_path / "blob12.parquet")
    pq.write_table(pa.table({
        "id": pa.array([100], pa.int32()),
        "iv": pa.array([b"\x01" * 12], pa.binary(12))}), blob)
    with pytest.raises(InvalidConfig, match="INTERVAL logical type"):
        s.add_files("main.iv", [blob])


def test_dotted_column_name_beside_interval(spark, tmp_path):
    """Column names may contain single dots (validate_name rejects only
    '..'; the DataFrame create path accepts them) — the decode
    projection must reference them name-safely, not as nested paths."""
    data = str(tmp_path / "dot.parquet")
    duckdb.connect().execute(f"""
        COPY (SELECT i::INT AS "a.b", INTERVAL (i) DAY AS iv
              FROM range(5) t(i)) TO '{data}' (FORMAT PARQUET)""")
    db = str(tmp_path / "catalog.sqlite")
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=str(tmp_path))
    with w._txn() as cur:
        cur.execute("INSERT INTO ducklake_snapshot (snapshot_id) VALUES (1)")
        cur.execute(
            "INSERT INTO ducklake_schema (schema_id, schema_name, path, "
            "path_is_relative, begin_snapshot) VALUES (1,'main','main',1,1)")
        cur.execute(
            "INSERT INTO ducklake_table (table_id, schema_id, table_name, "
            "path, path_is_relative, begin_snapshot) "
            "VALUES (1,1,'dt','dt',1,1)")
        for order, (cname, ctype) in enumerate(
                [("a.b", "int32"), ("iv", "interval")]):
            cur.execute(
                "INSERT INTO ducklake_column (column_id, table_id, "
                "column_name, column_type, column_order, nulls_allowed, "
                "begin_snapshot) VALUES (?,1,?,?,?,1,1)",
                (order + 1, cname, ctype, order))
        cur.execute(
            "INSERT INTO ducklake_data_file (data_file_id, table_id, path, "
            "path_is_relative, file_size_bytes, record_count, "
            "begin_snapshot) VALUES (1,1,?,0,?,5,1)",
            (data, os.path.getsize(data)))
    w.close()
    s = DuckLakeSession(spark, db)
    rows = s.table("main.dt").collect()
    assert sorted(r["a.b"] for r in rows) == [0, 1, 2, 3, 4]
    assert {r["a.b"]: r["iv"].days for r in rows}[3] == 3


def test_interval_decode_arrow_overflow_raises():
    """u32 months/days >= 2^31 must fail loudly in the numpy twin, never
    wrap to negatives (matching the JVM decode's ANSI cast)."""
    import numpy as np
    import pyarrow as pa

    from datafusion_ducklake_spark.sources.scan import interval_decode_arrow
    big = np.array([2 ** 31, 1, 0], dtype="<u4").tobytes()
    arr = pa.array([big], type=pa.binary(12))
    with pytest.raises(ValueError, match="2\\^31"):
        interval_decode_arrow(pa.chunked_array([arr]))


def test_interval_decode_arrow_unit():
    """Direct unit test of the pyarrow decode twin: offsets, nulls,
    empty and multi-chunk inputs."""
    import numpy as np
    import pyarrow as pa

    from datafusion_ducklake_spark.sources.scan import interval_decode_arrow

    def enc(m, d, ms):
        return np.array([m, d, ms], dtype="<u4").tobytes()

    vals = [enc(1, 2, 3), None, enc(0, 0, 0), enc(4000, 50, 123456)]
    arr = pa.array(vals, type=pa.binary(12))
    out = interval_decode_arrow(pa.chunked_array([arr]))
    assert out.to_pylist() == [
        {"months": 1, "days": 2, "micros": 3000},
        None,
        {"months": 0, "days": 0, "micros": 0},
        {"months": 4000, "days": 50, "micros": 123456000}]
    # sliced chunk (non-zero offset)
    sliced = arr.slice(2)
    out2 = interval_decode_arrow(pa.chunked_array([sliced]))
    assert out2.to_pylist()[0] == {"months": 0, "days": 0, "micros": 0}
    # empty
    empty = pa.chunked_array([], type=pa.binary(12))
    assert len(interval_decode_arrow(empty)) == 0


def test_encrypted_interval_scan(spark, tmp_path):
    """A DuckDB-written PME-encrypted file with an interval column reads
    through the executor-side decrypt path: pyarrow's decryption reader
    surfaces month_day_nano_interval, decoded to the struct
    representation (the reference CANNOT read DuckDB-encrypted files at
    all — parquet-rs requires aad_file_unique; encryption.rs:25-41)."""
    key = "0123456789abcdef"          # raw 16-byte AES-128, VARCHAR form
    data = str(tmp_path / "enc_iv.parquet")
    con = duckdb.connect()
    con.execute(f"PRAGMA add_parquet_key('k1', '{key}')")
    con.execute(f"""
        COPY (SELECT i::INT AS id,
                     CASE WHEN i = 2 THEN NULL
                          ELSE INTERVAL (i * 3) MONTH + INTERVAL (i) DAY
                             + INTERVAL (i * 7) MILLISECOND END AS iv
              FROM range(12) t(i))
        TO '{data}' (FORMAT PARQUET, ENCRYPTION_CONFIG {{footer_key: 'k1'}})""")

    db = str(tmp_path / "catalog.sqlite")
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=str(tmp_path))
    with w._txn() as cur:
        cur.execute("INSERT INTO ducklake_snapshot (snapshot_id) VALUES (1)")
        cur.execute(
            "INSERT INTO ducklake_schema (schema_id, schema_name, path, "
            "path_is_relative, begin_snapshot) VALUES (1,'main','main',1,1)")
        cur.execute(
            "INSERT INTO ducklake_table (table_id, schema_id, table_name, "
            "path, path_is_relative, begin_snapshot) "
            "VALUES (1,1,'enc_iv','enc_iv',1,1)")
        for order, (cname, ctype) in enumerate(
                [("id", "int32"), ("iv", "interval")]):
            cur.execute(
                "INSERT INTO ducklake_column (column_id, table_id, "
                "column_name, column_type, column_order, nulls_allowed, "
                "begin_snapshot) VALUES (?,1,?,?,?,1,1)",
                (order + 1, cname, ctype, order))
        cur.execute(
            "INSERT INTO ducklake_data_file (data_file_id, table_id, path, "
            "path_is_relative, file_size_bytes, record_count, "
            "encryption_key, begin_snapshot) VALUES (1,1,?,0,?,12,?,1)",
            (data, os.path.getsize(data), key))
    w.close()

    s = DuckLakeSession(spark, db)
    rows = {r.id: r.iv for r in s.table("main.enc_iv").collect()}
    assert len(rows) == 12
    assert rows[2] is None
    assert (rows[3].months, rows[3].days, rows[3].micros) == (9, 3, 21000)
    got = sorted((r, v.months, v.days, v.micros)
                 for r, v in rows.items() if v is not None)
    exp = con.execute(f"""
        SELECT id, date_part('year', iv)*12 + date_part('month', iv),
               date_part('day', iv),
               (date_part('hour', iv)*3600 + date_part('minute', iv)*60)
                 *1000000 + date_part('microsecond', iv)
        FROM read_parquet('{data}', encryption_config={{footer_key: 'k1'}})
        WHERE iv IS NOT NULL ORDER BY id""").fetchall()
    assert got == [tuple(e) for e in exp]


def test_renamed_interval_column_scans(iv_session):
    """r8 ADVICE follow-through: an add_files interval table whose
    column was RENAMED reads through the name-mapped branch with the
    same binary->struct decode (INTERVAL_MARK now rides into the mapped
    read schema) instead of the pre-r9 loud rejection."""
    s, data = iv_session
    s.rename_column("main.iv", "iv", "iv_renamed")
    s.refresh()
    df = s.table("main.iv")
    assert "iv_renamed" in df.columns
    r = df.agg(F.sum("iv_renamed.months"), F.sum("iv_renamed.days"),
               F.sum("iv_renamed.micros"),
               F.count(F.when(F.col("iv_renamed").isNull(), 1))
               ).collect()[0]
    assert tuple(r) == _duckdb_expected(data)


def test_cdc_update_pair_over_interval(iv_session):
    """table_changes pairs pre/postimage for an UPDATE over an interval
    table (r9: updates rewrite through the duckdb staging; the CDC read
    primitive decodes the rewritten file's intervals)."""
    s, _ = iv_session
    assert s.update_where("main.iv", {"id": "id + 500"}, "id = 2") == 1
    s.refresh()
    snap = s.provider.get_current_snapshot()
    ch = s.table_changes("main.iv", snap - 1, snap).collect()
    assert sorted(r.change_type for r in ch) \
        == ["update_postimage", "update_preimage"]
    pre = next(r for r in ch if r.change_type == "update_preimage")
    post = next(r for r in ch if r.change_type == "update_postimage")
    assert (pre.id, post.id) == (2, 502)
    assert pre.iv == post.iv and pre.iv.months == 2


def test_rename_after_interval_rewrite_keeps_values(iv_session):
    """r9 review finding: rewrite files staged by the duckdb writer
    carry no parquet field ids, so they must register under an identity
    name mapping — otherwise a later column RENAME silently reads the
    renamed column as NULL in every rewritten row."""
    s, data = iv_session
    assert s.update_where("main.iv", {"id": "id + 1000"}, "id < 3") == 3
    s.refresh()
    s.rename_column("main.iv", "id", "id2")
    s.refresh()
    got = sorted(r.id2 for r in
                 s.table("main.iv").filter("id2 >= 1000").collect())
    assert got == [1000, 1001, 1002]      # NOT NULLs
    df = s.table("main.iv")
    r = df.agg(F.sum("iv.months"), F.sum("iv.days"), F.sum("iv.micros"),
               F.count(F.when(F.col("iv").isNull(), 1))).collect()[0]
    assert tuple(r) == _duckdb_expected(data)


def test_merge_adjacent_and_rewrite_data_files_over_interval(
        iv_session, spark):
    """r9 review finding: contiguous-rowid interval groups must NOT
    route through rewrite_file_groups (Spark's writer would silently
    re-store INTERVAL as a plain struct and break every later scan) —
    both maintenance surfaces take the rowid-column duckdb staging."""
    s, data = iv_session
    # second contiguous file via engine INSERT (row_id_start set)
    s.insert_into("main.iv", s.table("main.iv").filter("id < 10"))
    s.refresh()
    assert len(s.table_handle("main.iv").files) == 2
    assert s.merge_adjacent_files("iv") == 1
    s.refresh()
    assert len(s.table_handle("main.iv").files) == 1
    base, extra = _duckdb_expected(data), _duckdb_expected(data, "id < 10")
    got = _spark_actual(s.table("main.iv"))
    assert got[3] == base[3] + extra[3]
    assert got[1] == base[1] + extra[1]
    # the merged file is still genuine parquet INTERVAL
    import glob
    lake = s.table_handle("main.iv").table_path
    lake = lake[len("file://"):] if lake.startswith("file://") else lake
    files = [p for p in glob.glob(lake + "/*.parquet")
             if "delete" not in os.path.basename(p)]
    live = {f.data_uri.rsplit("/", 1)[-1]
            for f in s.table_handle("main.iv").files}
    merged = [p for p in files if os.path.basename(p) in live]
    assert merged
    assert duckdb.connect().execute(
        f"SELECT any_value(typeof(iv)) FROM '{merged[0]}'"
    ).fetchone()[0] == "INTERVAL"
    # rewrite_data_files over a dirty interval file: same routing
    s.delete_from("main.iv", "id = 1")
    s.refresh()
    assert s.rewrite_data_files("main.iv", delete_threshold=0.0) > 0
    s.refresh()
    assert s.table_handle("main.iv").files[0].delete_uri is None
    got2 = _spark_actual(s.table("main.iv"))
    base2 = _duckdb_expected(data, "id <> 1")
    extra2 = _duckdb_expected(data, "id < 10 AND id <> 1")
    assert got2[3] == base2[3] + extra2[3]


def test_rename_after_interval_merge_adjacent_keeps_values(iv_session):
    """r10 advice: merge_groups_rowid_column (the merge_adjacent_files /
    rewrite_data_files staging for interval tables) registered its
    duckdb-staged outputs WITHOUT a name mapping — the same
    no-field-ids hazard _register_append fixed in r9, missed on this
    path: a later column RENAME silently read every merged row's
    renamed column as NULL."""
    s, data = iv_session
    s.insert_into("main.iv", s.table("main.iv").filter("id < 10"))
    s.refresh()
    assert s.merge_adjacent_files("iv") == 1     # duckdb-staged merge
    s.refresh()
    assert len(s.table_handle("main.iv").files) == 1
    s.rename_column("main.iv", "id", "id2")
    s.refresh()
    df = s.table("main.iv")
    assert df.filter("id2 IS NULL").count() == 0    # NOT all-NULL
    assert df.filter("id2 < 10").count() == 20      # originals + copies
    got = _spark_actual(df)
    base, extra = _duckdb_expected(data), _duckdb_expected(data, "id < 10")
    assert got[3] == base[3] + extra[3]
    assert got[0] == base[0] + extra[0]


def test_interval_write_file_scheme_path(spark, tmp_path):
    """r10 (r9 verdict Missing #4): interval INSERT against a
    file://-SCHEME'D table path — the Hadoop-FS code path every other
    writer serves — runs the same gate scenarios as the posix path:
    engine CTAS + INSERT + MOR DELETE, values matching DuckDB
    recomputing the identical intervals."""
    from datafusion_ducklake_spark.types import (
        INTERVAL_MARK, INTERVAL_SPARK_TYPE)
    db = str(tmp_path / "sch.sqlite")
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path="file://" + str(tmp_path / "lake_sch"))
    w.close()
    s = DuckLakeSession(spark, db)
    src = (spark.range(0, 50).select(
        (F.col("id") % 3).alias("bucket"),
        F.col("id").cast("int").alias("id"),
        F.when(F.col("id") % 7 == 3,
               F.lit(None).cast(INTERVAL_SPARK_TYPE))
        .otherwise(F.struct(
            (F.col("id") % 25).cast("int").alias("months"),
            (F.col("id") % 40).cast("int").alias("days"),
            (F.col("id") * 321000).cast("long").alias("micros")))
        .alias("iv", metadata={INTERVAL_MARK: True})))
    s.create_table("main.iv_sch", src.filter("id % 2 = 0"))
    s.insert_into("main.iv_sch", src.filter("id % 2 = 1"))
    assert s.delete_from("main.iv_sch", "bucket = 2") > 0
    s.refresh()
    got = _spark_actual(s.table("main.iv_sch"))
    exp = duckdb.connect().execute("""
        WITH t AS (
          SELECT CASE WHEN i % 7 = 3 THEN NULL
                      ELSE INTERVAL (i % 25) MONTH
                           + INTERVAL (i % 40) DAY
                           + INTERVAL (i * 321) MILLISECOND END AS iv
          FROM range(50) r(i) WHERE i % 3 <> 2)
        SELECT sum(date_part('year', iv)*12 + date_part('month', iv)),
               sum(date_part('day', iv)),
               sum((date_part('hour', iv)*3600
                    + date_part('minute', iv)*60)*1000000
                   + date_part('microsecond', iv)),
               count(*) FILTER (iv IS NULL)
        FROM t""").fetchone()
    assert got == exp


def test_interval_write_mock_object_store(spark, tmp_path, monkeypatch):
    """r10 (r9 verdict Missing #4): interval INSERT against an
    s3a://-shaped table path stages the duckdb COPY to executor-local
    tmp and uploads through pyarrow FileSystem.from_uri +
    open_output_stream — here rerouted to a local mock root
    (SPARK_GRAFT_MOCK_OBJECT_STORE), the identical upload code path as
    real S3 with a local client behind it. Verified store-side: the
    uploaded files are genuine parquet INTERVAL and their values match
    the catalog manifest."""
    from datafusion_ducklake_spark.types import (
        INTERVAL_MARK, INTERVAL_SPARK_TYPE)
    mock_root = str(tmp_path / "mockstore")
    monkeypatch.setenv("SPARK_GRAFT_MOCK_OBJECT_STORE", mock_root)
    db = str(tmp_path / "s3.sqlite")
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path="s3a://ivbucket/lake")
    w.close()
    s = DuckLakeSession(spark, db)
    s.create_empty_table("main.iv_s3", "id INTEGER, iv INTERVAL")
    src = (spark.range(0, 30).select(
        F.col("id").cast("int").alias("id"),
        F.struct(
            (F.col("id") % 12).cast("int").alias("months"),
            (F.col("id") % 28).cast("int").alias("days"),
            (F.col("id") * 5000).cast("long").alias("micros"))
        .alias("iv", metadata={INTERVAL_MARK: True})))
    assert s.insert_into("main.iv_s3", src) == 30
    s.refresh()
    # files landed under the mock bucket, registered in the catalog
    handle = s.table_handle("main.iv_s3")
    assert handle.table_path.startswith("s3a://ivbucket/")
    import glob as _glob
    uploaded = _glob.glob(mock_root + "/ivbucket/**/*.parquet",
                          recursive=True)
    live = {f.data_uri.rsplit("/", 1)[-1] for f in handle.files}
    assert live and live == {os.path.basename(p) for p in uploaded}
    con = duckdb.connect()
    files_sql = ", ".join(f"'{p}'" for p in sorted(uploaded))
    assert con.execute(
        f"SELECT any_value(typeof(iv)), count(*), sum(id) "
        f"FROM read_parquet([{files_sql}])").fetchone() \
        == ("INTERVAL", 30, sum(range(30)))
    # months survive the round trip store-side
    assert con.execute(
        f"SELECT sum(date_part('year', iv)*12 + date_part('month', iv)) "
        f"FROM read_parquet([{files_sql}])").fetchone()[0] \
        == sum(i % 12 for i in range(30))


def test_interval_write_unsupported_scheme_fails_cleanly(spark, tmp_path):
    from datafusion_ducklake_spark.table_writer import _interval_dest_uri
    with pytest.raises(InvalidConfig, match="not supported"):
        _interval_dest_uri("wasbs://c@acct/lake")
    assert _interval_dest_uri("/plain/posix") is None
    assert _interval_dest_uri("file:///x/y") is None
    assert _interval_dest_uri("s3a://b/k") == "s3://b/k"


def test_interval_replica_family_serves_cluster_key(iv_session, spark):
    """r10 (r9 verdict task #5): REPLICA clustering over an interval
    table. The replica's bucket files are catalog-invisible, so they
    store the engine's decoded struct representation through Spark's
    bucketed writer — table(name, cluster_key=k) then serves the
    bucketed layout with values identical to the plain scan, while the
    live file set stays genuine parquet INTERVAL for interop."""
    s, data = iv_session
    assert s.cluster_by("main.iv", "id", 4, replica=True) == N
    s.refresh()
    rep = s.table("main.iv", cluster_key="id")
    assert "ducklake_clureplica" in \
        rep._jdf.queryExecution().executedPlan().toString()
    # identical values through the replica
    assert _spark_actual(rep) == _duckdb_expected(data)
    # the INTERVAL_MARK metadata survives the replica projection, so a
    # replica-read frame round-trips into another interval table
    fld = next(f for f in rep.schema.fields if f.name == "iv")
    from datafusion_ducklake_spark.types import INTERVAL_MARK
    assert fld.metadata.get(INTERVAL_MARK) is True
    # live files are still genuine INTERVAL (replica never replaces them)
    handle = s.table_handle("main.iv")
    live = sorted(f.data_uri for f in handle.files)
    lp = live[0][len("file://"):] if live[0].startswith("file://") \
        else live[0]
    assert duckdb.connect().execute(
        f"SELECT any_value(typeof(iv)) FROM '{lp}'"
    ).fetchone()[0] == "INTERVAL"
    # DML invalidates -> silent plain-scan fallback, never wrong rows
    s.insert_into("main.iv", s.table("main.iv").filter("id = 0"))
    s.refresh()
    post = s.table("main.iv", cluster_key="id")
    assert "ducklake_clureplica" not in \
        post._jdf.queryExecution().executedPlan().toString()
    assert post.count() == N + 1
    # refresh rebuilds the family, reviving the fast path
    assert s.refresh_replica("main.iv") == 1
    revived = s.table("main.iv", cluster_key="id")
    assert "ducklake_clureplica" in \
        revived._jdf.queryExecution().executedPlan().toString()
    assert revived.count() == N + 1


def test_interval_primary_cluster_by_still_refused(iv_session):
    """The PRIMARY path stays refused: its bucket files register as
    ducklake_data_file rows, which must be genuine parquet INTERVAL —
    and the ceiling is the READER (probe below), not file naming."""
    s, _ = iv_session
    with pytest.raises(UnsupportedType, match="replica"):
        s.cluster_by("main.iv", "id", 4)


def test_interval_bucket_naming_probe_reader_is_the_ceiling(
        spark, tmp_path):
    """r10 probe (r9 verdict task #5): a duckdb-staged genuine-INTERVAL
    file renamed to Spark's bucket naming convention is still unusable —
    Spark's parquet schema converter rejects FLBA(12)/INTERVAL at READ
    time, so bucket-id naming was never the blocker. Pinned so the
    primary-path refusal stays justified by a committed probe."""
    import shutil
    src = str(tmp_path / "iv_src.parquet")
    _write_interval_parquet(src, 20)
    loc = tmp_path / "bucketed_iv"
    loc.mkdir()
    shutil.copy(src, str(loc / "data_00000.parquet"))  # bucket-0 name
    with pytest.raises(Exception, match="(?i)parquet|interval"):
        spark.read.parquet(str(loc)).collect()
