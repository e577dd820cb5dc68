"""Driver-gated queries that exercise the DuckLake CONNECTOR itself.

Each builds (idempotently, keyed by sf_dir) a real DuckLake catalog whose
data files are the driver's own parquet files registered by absolute path
(path_is_relative=0 — exercising the hierarchical resolver's absolute
branch), then queries through DuckLakeSession. The MOR variant writes a
positional-delete file whose positions are exactly the rows with
``l_linenumber = 1`` — so plain DuckDB SQL with the equivalent predicate
is an exact oracle for the delete-filtering scan.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import dsum


def _locked_build(fn):
    """Serialize a catalog builder across processes (r8 ADVICE: two
    concurrent gate processes could both miss the ``.done`` marker and
    one would ``rmtree`` the other's half-built catalog mid-write).

    Takes a blocking exclusive ``flock`` keyed by (builder name, string
    args) for the duration of the call; the in-function ``.done`` check
    stays the idempotence fast path, so the steady-state cost is one
    open+flock+close per gate query (~µs). The lock file lives next to
    the build roots in the system tempdir and is released on any exit,
    including exceptions (the ``with open`` closes the fd)."""
    import functools

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        import fcntl
        key = hashlib.md5(
            (fn.__name__ + "|"
             + "|".join(a for a in args if isinstance(a, str))).encode()
        ).hexdigest()[:12]
        lockpath = os.path.join(tempfile.gettempdir(),
                                f"ducklake_build_{key}.lock")
        with open(lockpath, "w") as fh:
            fcntl.flock(fh, fcntl.LOCK_EX)
            return fn(*args, **kwargs)
    return wrapper


_LINEITEM_COLS = [
    ("l_orderkey", "int64"), ("l_partkey", "int64"), ("l_suppkey", "int64"),
    ("l_linenumber", "int32"), ("l_quantity", "float64"),
    ("l_extendedprice", "float64"), ("l_discount", "float64"),
    ("l_tax", "float64"), ("l_returnflag", "varchar"),
    ("l_linestatus", "varchar"), ("l_shipdate", "timestamp"),
]


@_locked_build
def _build_catalog(sf_dir: str) -> str:
    """Create (once per sf_dir) a catalog with two tables over the SAME
    lineitem parquet: ``main.lineitem`` (plain) and ``main.lineitem_mor``
    (with a delete file covering all l_linenumber=1 positions)."""
    from ..metadata.writer import CatalogWriter
    tag = hashlib.md5((sf_dir + "/v2").encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"ducklake_gate_{tag}")
    db = os.path.join(root, "catalog.sqlite")
    done = os.path.join(root, ".done")
    if os.path.exists(done):
        return db
    os.makedirs(root, exist_ok=True)

    import pyarrow.parquet as pq
    data_file = os.path.join(sf_dir, "lineitem.parquet")
    meta = pq.read_metadata(data_file)

    # delete positions: file order indices where l_linenumber == 1
    tbl = pq.read_table(data_file, columns=["l_linenumber"])
    ln = tbl.column("l_linenumber").to_pylist()
    positions = [i for i, v in enumerate(ln) if v == 1]
    import pyarrow as pa
    delete_name = f"ducklake-delete-{uuid.uuid4()}.parquet"
    delete_path = os.path.join(root, delete_name)
    pq.write_table(pa.table({
        "file_path": pa.array([data_file] * len(positions), pa.string()),
        "pos": pa.array(positions, pa.int64())}), delete_path)

    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=root)
    with w._txn() as cur:
        cur.execute("INSERT INTO ducklake_snapshot (snapshot_id) VALUES (1)")
        cur.execute(
            "INSERT INTO ducklake_schema (schema_id, schema_name, path, "
            "path_is_relative, begin_snapshot) VALUES (1, 'main', 'main', 1, 1)")
        for tid, tname in ((1, "lineitem"), (2, "lineitem_mor")):
            cur.execute(
                "INSERT INTO ducklake_table (table_id, schema_id, table_name, "
                "path, path_is_relative, begin_snapshot) VALUES (?, 1, ?, ?, 1, 1)",
                (tid, tname, tname))
            for order, (cname, ctype) in enumerate(_LINEITEM_COLS):
                cur.execute(
                    "INSERT INTO ducklake_column (column_id, table_id, "
                    "column_name, column_type, column_order, nulls_allowed, "
                    "begin_snapshot) VALUES (?, ?, ?, ?, ?, 1, 1)",
                    (tid * 100 + order, tid, cname, ctype, order))
            # absolute-path registration (path_is_relative = 0)
            cur.execute(
                "INSERT INTO ducklake_data_file (data_file_id, table_id, path, "
                "path_is_relative, file_size_bytes, record_count, begin_snapshot) "
                "VALUES (?, ?, ?, 0, ?, ?, 1)",
                (tid, tid, data_file, os.path.getsize(data_file), meta.num_rows))
        cur.execute(
            "INSERT INTO ducklake_delete_file (delete_file_id, data_file_id, "
            "table_id, path, path_is_relative, file_size_bytes, delete_count, "
            "begin_snapshot) VALUES (1, 2, 2, ?, 0, ?, ?, 1)",
            (delete_path, os.path.getsize(delete_path), len(positions)))
    # third table: lineitem range-split into 4 files with per-file column
    # stats — exercises catalog-stats file pruning through the gate
    full = pq.read_table(data_file)
    order = pa.compute.sort_indices(full, sort_keys=[("l_orderkey", "ascending")])
    full = full.take(order)
    n = full.num_rows
    part_ids = {cname: 300 + i for i, (cname, _) in enumerate(_LINEITEM_COLS)}
    with w._txn() as cur:
        cur.execute(
            "INSERT INTO ducklake_table (table_id, schema_id, table_name, "
            "path, path_is_relative, begin_snapshot) "
            "VALUES (3, 1, 'lineitem_parts', 'lineitem_parts', 1, 1)")
        for i, (cname, ctype) in enumerate(_LINEITEM_COLS):
            cur.execute(
                "INSERT INTO ducklake_column (column_id, table_id, "
                "column_name, column_type, column_order, nulls_allowed, "
                "begin_snapshot) VALUES (?, 3, ?, ?, ?, 1, 1)",
                (part_ids[cname], cname, ctype, i))
    from ..table_writer import column_stats_of
    for k in range(4):
        lo, hi = k * n // 4, (k + 1) * n // 4
        chunk = full.slice(lo, hi - lo)
        part_path = os.path.join(root, f"ducklake-part{k}-{uuid.uuid4()}.parquet")
        pq.write_table(chunk, part_path)
        with w._txn() as cur:
            cur.execute(
                "INSERT INTO ducklake_data_file (data_file_id, table_id, "
                "path, path_is_relative, file_size_bytes, record_count, "
                "begin_snapshot) VALUES (?, 3, ?, 0, ?, ?, 1)",
                (10 + k, part_path, os.path.getsize(part_path),
                 chunk.num_rows))
        w.register_file_column_stats(10 + k, 3,
                                     column_stats_of(part_path, part_ids))
    w.close()
    with open(done, "w") as f:
        f.write("ok")
    return db


def _session(spark: SparkSession, sf_dir: str):
    from ..catalog import DuckLakeSession
    return DuckLakeSession(spark, _build_catalog(sf_dir))


def ducklake_scan_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over a DuckLake-cataloged scan (connector in the gate)."""
    dl = _session(spark, sf_dir)
    return (dl.table("main.lineitem")
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum("l_quantity").alias("sum_qty")))


ORACLE_SCAN_AGG = """
SELECT l_returnflag, COUNT(*) AS n,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY l_returnflag
"""


def ducklake_mor_delete_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same aggregate through the merge-on-read delete filter: the delete
    file removes every l_linenumber=1 position, so the predicate-equivalent
    DuckDB query is an exact oracle for the positional filtering."""
    dl = _session(spark, sf_dir)
    return (dl.table("main.lineitem_mor")
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum("l_quantity").alias("sum_qty")))


ORACLE_MOR_AGG = """
SELECT l_returnflag, COUNT(*) AS n,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
FROM lineitem WHERE l_linenumber <> 1 GROUP BY l_returnflag
"""


@_locked_build
def _build_dml_catalog(spark: SparkSession, sf_dir: str) -> str:
    """Create (once per sf_dir) a catalog whose table is produced by OUR
    full DML cycle: CTAS from the driver's orders parquet, then
    delete_from (MOR positional-delete write), then update_where (delete
    + rewrite append) — so the gate checks the artifacts this engine
    WRITES, not just the ones it reads."""
    import shutil

    from ..catalog import DuckLakeSession
    from ..metadata.writer import CatalogWriter

    tag = hashlib.md5((sf_dir + "/dml-v2").encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"ducklake_dml_{tag}")
    db = os.path.join(root, "catalog.sqlite")
    done = os.path.join(root, ".done")
    if os.path.exists(done):
        return db
    if os.path.exists(root):           # half-built leftovers: start over
        shutil.rmtree(root)
    os.makedirs(root)
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=os.path.join(root, "lake"))
    w.close()
    dl = DuckLakeSession(spark, db)
    src = (spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
           .select("o_orderkey", "o_orderstatus", "o_totalprice"))
    dl.create_table("main.dml_orders", src)
    dl.delete_from("main.dml_orders", "o_orderkey % 7 = 0")
    dl.update_where("main.dml_orders",
                    {"o_totalprice": "o_totalprice * 2"},
                    "o_orderstatus = 'F'")
    with open(done, "w") as f:
        f.write("ok")
    return db


def ducklake_dml_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over a table shaped by our own DELETE + UPDATE (MOR
    artifacts written by operators/dml.py); the oracle recomputes the
    same final state from the base table with predicate logic."""
    from ..catalog import DuckLakeSession
    dl = DuckLakeSession(spark, _build_dml_catalog(spark, sf_dir))
    return (dl.table("main.dml_orders")
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum("o_totalprice").alias("sum_price")))


ORACLE_DML_AGG = """
SELECT o_orderstatus, COUNT(*) AS n,
  CAST(SUM(CAST(CASE WHEN o_orderstatus = 'F' THEN o_totalprice * 2
                     ELSE o_totalprice END AS DECIMAL(38,6))) AS DOUBLE)
    AS sum_price
FROM orders
WHERE o_orderkey % 7 <> 0
GROUP BY o_orderstatus
"""


def ducklake_cdc_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC read path in the gate: the FULL table_changes feed (upstream
    surface — inserts, deletions, rowid-paired update image pairs) over
    the DML catalog's history: CTAS insert, MOR delete, update rewrite
    (which keeps rowids, so the update snapshot classifies as
    update_preimage/update_postimage pairs). The oracle recomputes every
    change cohort from the base table."""
    from ..catalog import DuckLakeSession
    dl = DuckLakeSession(spark, _build_dml_catalog(spark, sf_dir))
    cur = dl.provider.get_current_snapshot()
    feed = dl.table_changes("main.dml_orders", 0, cur)
    return (feed.groupBy(F.col("change_type").alias("change"))
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum("o_totalprice").alias("sum_price")))


ORACLE_CDC_AGG = """
WITH base AS (
  SELECT o_orderkey % 7 = 0 AS is7, o_orderstatus = 'F' AS isF,
         o_totalprice AS p
  FROM orders)
SELECT 'insert' AS change,
  (SELECT COUNT(*) FROM base) AS n,
  CAST((SELECT SUM(CAST(p AS DECIMAL(38,6))) FROM base) AS DOUBLE)
    AS sum_price
UNION ALL
SELECT 'delete',
  (SELECT COUNT(*) FROM base WHERE is7),
  CAST((SELECT SUM(CAST(p AS DECIMAL(38,6))) FROM base WHERE is7)
    AS DOUBLE)
UNION ALL
SELECT 'update_preimage',
  (SELECT COUNT(*) FROM base WHERE isF AND NOT is7),
  CAST((SELECT SUM(CAST(p AS DECIMAL(38,6)))
        FROM base WHERE isF AND NOT is7) AS DOUBLE)
UNION ALL
SELECT 'update_postimage',
  (SELECT COUNT(*) FROM base WHERE isF AND NOT is7),
  CAST((SELECT SUM(CAST(p * 2 AS DECIMAL(38,6)))
        FROM base WHERE isF AND NOT is7) AS DOUBLE)
"""


@_locked_build
def _build_part_catalog(spark: SparkSession, sf_dir: str) -> str:
    """Catalog (once per sf_dir) whose table is CTAS'd from the driver's
    orders parquet (even orderkeys) with a partition spec on
    o_orderstatus, then appended (odd orderkeys) through the partitioned
    write path — per-status files with catalog partition values."""
    import shutil

    from ..catalog import DuckLakeSession
    from ..metadata.writer import CatalogWriter

    tag = hashlib.md5((sf_dir + "/part-v1").encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"ducklake_part_{tag}")
    db = os.path.join(root, "catalog.sqlite")
    done = os.path.join(root, ".done")
    if os.path.exists(done):
        return db
    if os.path.exists(root):
        shutil.rmtree(root)
    os.makedirs(root)
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=os.path.join(root, "lake"))
    w.close()
    dl = DuckLakeSession(spark, db)
    src = (spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
           .select("o_orderkey", "o_orderstatus", "o_totalprice"))
    dl.create_table("main.part_orders",
                    src.filter(F.col("o_orderkey") % 2 == 0))
    dl.set_partitioned_by("main.part_orders", ["o_orderstatus"])
    dl.insert_into("main.part_orders",
                   src.filter(F.col("o_orderkey") % 2 == 1))
    with open(done, "w") as f:
        f.write("ok")
    return db


def ducklake_partitioned_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned write + partition-value file pruning in the gate: the
    scan keeps only files whose recorded o_orderstatus = 'O' (plus the
    conservative pre-spec file); wrong pruning (a dropped file holding
    matching rows) breaks the hash match against the full-table oracle."""
    from ..catalog import DuckLakeSession
    dl = DuckLakeSession(spark, _build_part_catalog(spark, sf_dir))
    df = dl.table("main.part_orders",
                  prune_filters=[("o_orderstatus", "=", "O")])
    return (df.filter(F.col("o_orderstatus") == "O")
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum("o_totalprice").alias("sum_price")))


ORACLE_PARTITIONED_AGG = """
SELECT o_orderstatus, COUNT(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
FROM orders WHERE o_orderstatus = 'O'
GROUP BY o_orderstatus
"""


def ducklake_virtual_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Virtual columns in the gate: snapshot_id distinguishes the CTAS
    era (even orderkeys, one file) from the append era (odd, one file
    PER o_orderstatus via the partition spec), so the era's
    max(file_row_number) equals (largest per-file rowcount) - 1 — all
    recomputed by the oracle from key parity and status counts."""
    from ..catalog import DuckLakeSession
    dl = DuckLakeSession(spark, _build_part_catalog(spark, sf_dir))
    df = dl.table("main.part_orders", with_virtual=True)
    s_min = df.agg(F.min("snapshot_id").alias("m")).collect()[0]["m"]
    return (df.groupBy((F.col("snapshot_id") == s_min).alias("is_first"))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.max("file_row_number").alias("max_pos"),
                 dsum("o_totalprice").alias("sum_price")))


ORACLE_VIRTUAL_AGG = """
WITH base AS (
  SELECT o_orderkey % 2 = 0 AS is_first, o_orderstatus AS st,
         o_totalprice AS p
  FROM orders),
era_status AS (
  SELECT is_first, st, COUNT(*) AS cnt FROM base GROUP BY is_first, st)
SELECT b.is_first, COUNT(*) AS n,
  CASE WHEN b.is_first THEN COUNT(*) - 1
       ELSE (SELECT MAX(cnt) - 1 FROM era_status e
             WHERE NOT e.is_first) END AS max_pos,
  CAST(SUM(CAST(b.p AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
FROM base b GROUP BY b.is_first
"""


@_locked_build
def _build_inline_catalog(spark: SparkSession, sf_dir: str) -> str:
    """Catalog (once per sf_dir) exercising WRITE-SIDE data inlining:
    CTAS of customers with c_custkey > 100, then an append of the
    c_custkey <= 100 slice under data_inlining_row_limit=1000 — the
    small append lands as rows in the catalog DB, not parquet."""
    import shutil

    from ..catalog import DuckLakeSession
    from ..metadata.writer import CatalogWriter

    tag = hashlib.md5((sf_dir + "/inline-v1").encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"ducklake_inline_{tag}")
    db = os.path.join(root, "catalog.sqlite")
    done = os.path.join(root, ".done")
    if os.path.exists(done):
        return db
    if os.path.exists(root):
        shutil.rmtree(root)
    os.makedirs(root)
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=os.path.join(root, "lake"))
    w.close()
    dl = DuckLakeSession(spark, db)
    src = (spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
           .select("c_custkey", "c_mktsegment", "c_acctbal"))
    dl.create_table("main.inline_cust",
                    src.filter(F.col("c_custkey") > 100))
    dl.set_option("data_inlining_row_limit", 1000)
    dl.insert_into("main.inline_cust",
                   src.filter(F.col("c_custkey") <= 100))
    handle = dl.table_handle("main.inline_cust")
    assert len(handle.inlined_rows()) > 0, "append was not inlined"
    with open(done, "w") as f:
        f.write("ok")
    return db


def ducklake_inlined_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write-side inlining + the inlined READ path in the gate: rows
    stored in the catalog DB must aggregate identically to the oracle
    over the full customer table."""
    from ..catalog import DuckLakeSession
    dl = DuckLakeSession(spark, _build_inline_catalog(spark, sf_dir))
    return (dl.table("main.inline_cust")
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum("c_acctbal").alias("sum_bal")))


ORACLE_INLINED_AGG = """
SELECT c_mktsegment, COUNT(*) AS n,
  CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS sum_bal
FROM customer GROUP BY c_mktsegment
"""


def ducklake_pruned_scan_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over a PRUNED multi-file scan: catalog min/max stats drop
    the files whose l_orderkey range falls below the cutoff before any
    parquet I/O; the row filter then applies on top. Wrong pruning (a
    dropped file that held matching rows) breaks the hash match."""
    dl = _session(spark, sf_dir)
    cutoff = (dl.table("main.lineitem_parts")
              .agg(F.max("l_orderkey").alias("m")).collect()[0]["m"]
              * 3.0 / 4.0)
    df = dl.table("main.lineitem_parts",
                  prune_filters=[("l_orderkey", ">=", cutoff)])
    return (df.filter(F.col("l_orderkey") >= cutoff)
            .groupBy("l_returnflag")
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum("l_quantity").alias("sum_qty")))


ORACLE_PRUNED_AGG = """
SELECT l_returnflag, COUNT(*) AS n,
  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE l_orderkey >= (SELECT MAX(l_orderkey) * 3.0 / 4.0 FROM lineitem)
GROUP BY l_returnflag
"""


@_locked_build
def _build_nested_catalog(spark: SparkSession, sf_dir: str) -> str:
    """Catalog (once per sf_dir) with a NESTED-typed table — struct and
    map columns built from orders and written through the engine (the
    nested-types extension; the reference rejects nesting)."""
    import shutil

    from ..catalog import DuckLakeSession
    from ..metadata.writer import CatalogWriter

    tag = hashlib.md5((sf_dir + "/nested-v1").encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"ducklake_nested_{tag}")
    db = os.path.join(root, "catalog.sqlite")
    done = os.path.join(root, ".done")
    if os.path.exists(done):
        return db
    if os.path.exists(root):
        shutil.rmtree(root)
    os.makedirs(root)
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=os.path.join(root, "lake"))
    w.close()
    dl = DuckLakeSession(spark, db)
    src = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    dl.create_table("main.nested_orders", src.select(
        "o_orderkey",
        F.struct(F.col("o_custkey").alias("custkey"),
                 F.col("o_totalprice").alias("total")).alias("info"),
        F.create_map(F.lit("priority"),
                     F.col("o_orderpriority")).alias("attrs")))
    with open(done, "w") as f:
        f.write("ok")
    return db


def ducklake_nested_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct/map columns through the full engine write -> catalog ->
    scan path, flattened back to scalars so plain SQL over the original
    orders parquet is an exact oracle."""
    from ..catalog import DuckLakeSession
    dl = DuckLakeSession(spark, _build_nested_catalog(spark, sf_dir))
    t = dl.table("main.nested_orders")
    return (t.select(
                F.col("attrs")["priority"].alias("priority"),
                F.col("info.total").alias("total"),
                F.col("info.custkey").alias("custkey"))
            .groupBy("priority")
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum("total").alias("sum_total"),
                 F.sum("custkey").alias("sum_custkey")))


ORACLE_NESTED_AGG = """
SELECT o_orderpriority AS priority, COUNT(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_total,
  CAST(SUM(o_custkey) AS BIGINT) AS sum_custkey
FROM orders GROUP BY o_orderpriority
"""


@_locked_build
def _build_geo_catalog(spark: SparkSession, sf_dir: str) -> str:
    """Catalog (once per sf_dir) with a GEOMETRY table — customer rows as
    WKB points written through the engine's DDL + DML path (geo corpus:
    sql/geo/ducklake_geometry.test; the value plane is oracle-checkable
    because st_x/st_y recover the source coordinates exactly — IEEE
    doubles roundtrip through WKB bit-for-bit)."""
    import shutil

    from ..catalog import DuckLakeSession
    from ..metadata.writer import CatalogWriter

    tag = hashlib.md5((sf_dir + "/geo-v1").encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"ducklake_geo_{tag}")
    db = os.path.join(root, "catalog.sqlite")
    done = os.path.join(root, ".done")
    if os.path.exists(done):
        return db
    if os.path.exists(root):
        shutil.rmtree(root)
    os.makedirs(root)
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=os.path.join(root, "lake"))
    w.close()
    dl = DuckLakeSession(spark, db)
    dl.sql("CREATE TABLE geo_points (ck BIGINT, g GEOMETRY)")
    (spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
     .select("c_custkey", "c_acctbal")
     .createOrReplaceTempView("geo_gate_src"))
    dl.sql("INSERT INTO geo_points SELECT c_custkey AS ck, "
           "st_point(CAST(c_custkey AS DOUBLE), c_acctbal) AS g "
           "FROM geo_gate_src")
    with open(done, "w") as f:
        f.write("ok")
    return db


def ducklake_geo_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GEOMETRY end-to-end: WKT/WKB codec + catalog geometry type +
    st_x/st_y accessors, folded to a bbox-style aggregate whose oracle is
    plain SQL over the source customer parquet."""
    from ..catalog import DuckLakeSession
    dl = DuckLakeSession(spark, _build_geo_catalog(spark, sf_dir))
    return dl.sql(
        "SELECT COUNT(*) AS n, "
        "CAST(MIN(st_x(g)) AS BIGINT) AS min_x, "
        "CAST(MAX(st_x(g)) AS BIGINT) AS max_x, "
        "MIN(st_y(g)) AS min_y, MAX(st_y(g)) AS max_y "
        "FROM geo_points")


ORACLE_GEO_AGG = """
SELECT COUNT(*) AS n, MIN(c_custkey) AS min_x, MAX(c_custkey) AS max_x,
  MIN(c_acctbal) AS min_y, MAX(c_acctbal) AS max_y
FROM customer
"""


def geo_measure_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geometry measurement surface (st_geomfromtext -> st_area /
    st_length / st_npoints) over rectangles BUILT from customer columns —
    the oracle recomputes the same quantities with plain arithmetic, so
    the WKT parser, WKB codec, shoelace area and perimeter walk are all
    value-checked end-to-end."""
    from ..functions.geo import register_geo_functions
    register_geo_functions(spark)
    cust = (spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
            .select("c_custkey",
                    (F.col("c_custkey") % 7 + 1).alias("w"),
                    (F.col("c_custkey") % 11 + 1).alias("h")))
    wkt = F.format_string(
        "POLYGON ((0 0, %d 0, %d %d, 0 %d, 0 0))",
        F.col("w"), F.col("w"), F.col("h"), F.col("h"))
    g = (cust.withColumn("__wkt", wkt)
         .selectExpr("c_custkey", "st_geomfromtext(__wkt) AS geom"))
    return g.selectExpr(
        "COUNT(*) AS n",
        "CAST(SUM(st_area(geom)) AS BIGINT) AS sum_area",
        "CAST(SUM(st_length(geom)) AS BIGINT) AS sum_perimeter",
        "CAST(SUM(st_npoints(geom)) AS BIGINT) AS sum_points")


ORACLE_GEO_MEASURE = """
SELECT COUNT(*) AS n,
  CAST(SUM((c_custkey % 7 + 1) * (c_custkey % 11 + 1)) AS BIGINT)
    AS sum_area,
  CAST(SUM(2 * ((c_custkey % 7 + 1) + (c_custkey % 11 + 1))) AS BIGINT)
    AS sum_perimeter,
  CAST(COUNT(*) * 5 AS BIGINT) AS sum_points
FROM customer
"""


@_locked_build
def _build_struct_evo_catalog(spark: SparkSession, sf_dir: str) -> str:
    """Create (once per sf_dir) a table shaped by the FULL struct field
    evolution cycle (sql/alter/struct_evolution*.test): create with
    struct<a,b>, insert; ADD field c, insert; DROP a then RE-ADD a
    (fresh field id), insert. Rows derive deterministically from the
    driver's orders parquet so a plain-SQL oracle can restate the
    field-id resolution semantics batch by batch."""
    import shutil

    from ..catalog import DuckLakeSession
    from ..metadata.writer import CatalogWriter

    tag = hashlib.md5((sf_dir + "/sevo-v1").encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"ducklake_sevo_{tag}")
    db = os.path.join(root, "catalog.sqlite")
    done = os.path.join(root, ".done")
    if os.path.exists(done):
        return db
    if os.path.exists(root):
        shutil.rmtree(root)
    os.makedirs(root)
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=os.path.join(root, "lake"))
    w.close()
    dl = DuckLakeSession(spark, db)
    keys = (spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
            .select(F.col("o_orderkey").cast("long").alias("k"))
            .filter("o_orderkey % 32 = 0"))
    keys.createOrReplaceTempView("__sevo_keys")
    dl.sql("CREATE TABLE evo (col1 STRUCT<a:BIGINT,b:BIGINT>)")
    dl.sql("INSERT INTO evo SELECT named_struct('a', k, 'b', k + 1) "
           "FROM __sevo_keys WHERE k % 3 = 0")
    dl.sql("ALTER TABLE evo ALTER COLUMN col1 SET DATA TYPE "
           "STRUCT(a BIGINT, b BIGINT, c BIGINT)")
    dl.sql("INSERT INTO evo SELECT named_struct('a', k, 'b', k + 1, "
           "'c', k * 2) FROM __sevo_keys WHERE k % 3 = 1")
    dl.sql("ALTER TABLE evo ALTER COLUMN col1 SET DATA TYPE "
           "STRUCT(b BIGINT, c BIGINT)")
    dl.sql("ALTER TABLE evo ALTER COLUMN col1 SET DATA TYPE "
           "STRUCT(b BIGINT, c BIGINT, a BIGINT)")
    dl.sql("INSERT INTO evo SELECT named_struct('b', k + 1, 'c', k * 2, "
           "'a', k * 7) FROM __sevo_keys WHERE k % 3 = 2")
    with open(done, "w") as f:
        f.write("ok")
    return db


def ducklake_struct_evo_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct field evolution through the gate: the re-added field 'a'
    must read NULL for every pre-re-add row (fresh field id — no value
    resurrection), the added field 'c' NULL for batch 1, and the kept
    field 'b' everywhere; the oracle restates those semantics from the
    source keys batch by batch."""
    from ..catalog import DuckLakeSession
    dl = DuckLakeSession(spark, _build_struct_evo_catalog(spark, sf_dir))
    return dl.sql(
        "SELECT count(*) AS n, "
        "CAST(sum(col1.b) AS BIGINT) AS sb, "
        "CAST(sum(col1.c) AS BIGINT) AS sc, "
        "CAST(sum(col1.a) AS BIGINT) AS sa, "
        "count(col1.a) AS na, count(col1.c) AS nc FROM evo")


ORACLE_STRUCT_EVO = """
WITH keys AS (
  SELECT CAST(o_orderkey AS BIGINT) AS k FROM orders
  WHERE o_orderkey % 32 = 0
), rows_ AS (
  SELECT k + 1 AS b, CAST(NULL AS BIGINT) AS c, CAST(NULL AS BIGINT) AS a
  FROM keys WHERE k % 3 = 0
  UNION ALL
  SELECT k + 1, k * 2, CAST(NULL AS BIGINT) FROM keys WHERE k % 3 = 1
  UNION ALL
  SELECT k + 1, k * 2, k * 7 FROM keys WHERE k % 3 = 2
)
SELECT COUNT(*) AS n, CAST(SUM(b) AS BIGINT) AS sb,
       CAST(SUM(c) AS BIGINT) AS sc, CAST(SUM(a) AS BIGINT) AS sa,
       COUNT(a) AS na, COUNT(c) AS nc
FROM rows_
"""


@_locked_build
def _build_transform_catalog(spark: SparkSession, sf_dir: str) -> str:
    """Create (once per sf_dir) a table partitioned by year(o_orderdate)
    (partition TRANSFORM — sql/partitioning/year_month_day.test): the
    insert splits into year=<y> hive dirs with the transformed values in
    ducklake_file_partition_value."""
    import shutil

    from ..catalog import DuckLakeSession
    from ..metadata.writer import CatalogWriter

    tag = hashlib.md5((sf_dir + "/ptf-v1").encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"ducklake_ptf_{tag}")
    db = os.path.join(root, "catalog.sqlite")
    done = os.path.join(root, ".done")
    if os.path.exists(done):
        return db
    if os.path.exists(root):
        shutil.rmtree(root)
    os.makedirs(root)
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=os.path.join(root, "lake"))
    w.close()
    dl = DuckLakeSession(spark, db)
    src = (spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
           .select("o_orderkey", F.col("o_orderdate").cast("date")
                   .alias("o_orderdate"), "o_totalprice"))
    dl.sql("CREATE TABLE tf_orders (o_orderkey BIGINT, o_orderdate DATE, "
           "o_totalprice DOUBLE)")
    dl.set_partitioned_by("main.tf_orders", ["year(o_orderdate)"])
    dl.insert_into("main.tf_orders", src, single_file=False)
    with open(done, "w") as f:
        f.write("ok")
    return db


def ducklake_transform_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-transform write + transform-aware pruning in the gate:
    the scan prunes to files whose recorded year(o_orderdate) can hold
    dates >= 1996-01-01 (monotone year transform); over-pruning (a
    dropped year=1996+ file) breaks the hash match with the full-table
    oracle."""
    from ..catalog import DuckLakeSession
    dl = DuckLakeSession(spark, _build_transform_catalog(spark, sf_dir))
    df = dl.table("main.tf_orders",
                  prune_filters=[("o_orderdate", ">=", "1996-01-01")])
    return (df.filter(F.col("o_orderdate") >= F.lit("1996-01-01"))
            .groupBy(F.year("o_orderdate").alias("y"))
            .agg(F.count(F.lit(1)).alias("n"),
                 dsum("o_totalprice").alias("sum_price"))
            .orderBy("y"))


ORACLE_TRANSFORM_AGG = """
SELECT EXTRACT(year FROM CAST(o_orderdate AS DATE)) AS y, COUNT(*) AS n,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '1996-01-01'
GROUP BY 1 ORDER BY 1
"""


@_locked_build
def _build_clustered_catalog(spark: SparkSession, sf_dir: str) -> str:
    """Catalog whose lineitem + orders are catalog-CLUSTERED on orderkey
    (operators/layout.cluster_by via CALL ducklake_cluster_by): bucket
    files are ducklake_data_file rows, the clustering spec a table-scoped
    option, and scans reconstruct Spark's bucketed scan — the 100 TB
    fact-fact join layout, driver-hash-checked end to end."""
    import shutil

    from ..catalog import DuckLakeSession
    from ..metadata.writer import CatalogWriter

    tag = hashlib.md5((sf_dir + "/clu-v2").encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"ducklake_clu_{tag}")
    db = os.path.join(root, "catalog.sqlite")
    done = os.path.join(root, ".done")
    if os.path.exists(done):
        return db
    if os.path.exists(root):
        shutil.rmtree(root)
    os.makedirs(root)
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=os.path.join(root, "lake"))
    w.close()
    dl = DuckLakeSession(spark, db)
    li = (spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
          .select("l_orderkey", "l_linestatus", "l_quantity",
                  "l_extendedprice"))
    o = (spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
         .select("o_orderkey", "o_orderstatus"))
    dl.create_table("main.cl_lineitem", li)
    dl.create_table("main.cl_orders", o)
    dl.sql("CALL ducklake_cluster_by('cl_lineitem', 'l_orderkey', 4)")
    dl.sql("CALL ducklake_cluster_by('cl_orders', 'o_orderkey', 4)")
    with open(done, "w") as f:
        f.write("ok")
    return db


def ducklake_clustered_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join THROUGH the catalog-clustered layout: both scans
    come back bucketed (zero join-side exchanges — asserted in
    tests/test_layout.py; here the oracle hash proves the values), then
    aggregate by (l_linestatus, o_orderstatus)."""
    from ..catalog import DuckLakeSession
    dl = DuckLakeSession(spark, _build_clustered_catalog(spark, sf_dir))
    li = dl.table("main.cl_lineitem")
    o = dl.table("main.cl_orders")
    return (li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("l_linestatus", "o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.col("l_quantity").cast("long")).alias("sum_qty"),
                 dsum("l_extendedprice").alias("sum_price"))
            .orderBy("l_linestatus", "o_orderstatus"))


ORACLE_CLUSTERED_AGG = """
SELECT l_linestatus, o_orderstatus, COUNT(*) AS n,
  CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_price
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_linestatus, o_orderstatus
ORDER BY l_linestatus, o_orderstatus
"""


@_locked_build
def _build_family_catalog(spark: SparkSession, sf_dir: str) -> str:
    """Catalog exercising the SECOND clustered family (r8): customer is
    catalog-clustered primary on c_custkey; orders carries a custkey
    REPLICA layout beside its untouched live files (CALL
    ducklake_cluster_by(..., replica => true) — operators/layout). The
    custkey join then runs exchange-free through the catalog while the
    plain scan still serves every other query of the same table."""
    import shutil

    from ..catalog import DuckLakeSession
    from ..metadata.writer import CatalogWriter

    tag = hashlib.md5((sf_dir + "/fam-v1").encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"ducklake_fam_{tag}")
    db = os.path.join(root, "catalog.sqlite")
    done = os.path.join(root, ".done")
    if os.path.exists(done):
        return db
    if os.path.exists(root):
        shutil.rmtree(root)
    os.makedirs(root)
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=os.path.join(root, "lake"))
    w.close()
    dl = DuckLakeSession(spark, db)
    cust = (spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
            .select("c_custkey", "c_nationkey", "c_acctbal"))
    o = (spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
         .select("o_orderkey", "o_custkey", "o_totalprice"))
    dl.create_table("main.fam_customer", cust)
    dl.create_table("main.fam_orders", o)
    dl.sql("CALL ducklake_cluster_by('fam_customer', 'c_custkey', 4)")
    dl.sql("CALL ducklake_cluster_by('fam_orders', 'o_custkey', 4, "
           "replica => true)")
    with open(done, "w") as f:
        f.write("ok")
    return db


def ducklake_family_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer⋈orders on custkey THROUGH the second clustered family:
    the customer scan is the primary custkey layout, the orders scan the
    catalog-invisible custkey replica (cluster_key dispatch) — zero
    join-side exchanges, asserted in tests/test_layout.py; here the
    oracle hash proves the values match the plain data."""
    from ..catalog import DuckLakeSession
    dl = DuckLakeSession(spark, _build_family_catalog(spark, sf_dir))
    cust = dl.table("main.fam_customer", cluster_key="c_custkey")
    o = dl.table("main.fam_orders", cluster_key="o_custkey")
    per_cust = (o.groupBy("o_custkey")
                .agg(F.count(F.lit(1)).alias("n_orders"),
                     dsum("o_totalprice").alias("spend")))
    return (cust.join(per_cust, cust.c_custkey == per_cust.o_custkey)
            .groupBy("c_nationkey")
            .agg(F.count(F.lit(1)).alias("n_buyers"),
                 F.sum("n_orders").alias("n_orders"),
                 dsum("spend").alias("total_spend"))
            .orderBy("c_nationkey"))


ORACLE_FAMILY_AGG = """
WITH per_cust AS (
  SELECT o_custkey, COUNT(*) AS n_orders,
    CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS spend
  FROM orders GROUP BY o_custkey)
SELECT c_nationkey, COUNT(*) AS n_buyers,
  CAST(SUM(n_orders) AS BIGINT) AS n_orders,
  CAST(SUM(CAST(spend AS DECIMAL(38,6))) AS DOUBLE) AS total_spend
FROM customer JOIN per_cust ON c_custkey = o_custkey
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


@_locked_build
def _build_interval_catalog(sf_dir: str) -> str:
    """Create (once per sf_dir) a catalog whose ``main.lineitem_iv``
    table is a DuckDB-written parquet with a real INTERVAL column
    (parquet FIXED_LEN_BYTE_ARRAY(12), logical type INTERVAL) derived
    deterministically from lineitem — the one local engine that can
    produce that physical type. The gate proves the binary→struct
    decode (sources/scan.py interval_decode; reference maps the same
    column to Arrow Interval(MonthDayNano), types.rs:56) against
    DuckDB's own interval accessors recomputing the identical values
    from the source columns."""
    import duckdb

    tag = hashlib.md5((sf_dir + "/iv-v1").encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"ducklake_iv_{tag}")
    db = os.path.join(root, "catalog.sqlite")
    done = os.path.join(root, ".done")
    if os.path.exists(done):
        return db
    import shutil
    if os.path.exists(root):           # half-built leftovers: start over
        shutil.rmtree(root)
    os.makedirs(root)

    src = os.path.join(sf_dir, "lineitem.parquet")
    data = os.path.join(root, f"ducklake-iv-{uuid.uuid4()}.parquet")
    duckdb.connect().execute(f"""
        COPY (SELECT l_orderkey % 7 AS bucket,
                     INTERVAL (l_linenumber) MONTH
                     + INTERVAL (l_orderkey % 100) DAY
                     + INTERVAL (l_suppkey * 50) MILLISECOND AS iv
              FROM '{src}')
        TO '{data}' (FORMAT PARQUET)""")
    import pyarrow.parquet as pq
    meta = pq.read_metadata(data)

    from ..metadata.writer import CatalogWriter
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=root)
    with w._txn() as cur:
        cur.execute("INSERT INTO ducklake_snapshot (snapshot_id) VALUES (1)")
        cur.execute(
            "INSERT INTO ducklake_schema (schema_id, schema_name, path, "
            "path_is_relative, begin_snapshot) VALUES (1, 'main', 'main', 1, 1)")
        cur.execute(
            "INSERT INTO ducklake_table (table_id, schema_id, table_name, "
            "path, path_is_relative, begin_snapshot) "
            "VALUES (1, 1, 'lineitem_iv', 'lineitem_iv', 1, 1)")
        for order, (cname, ctype) in enumerate(
                [("bucket", "int64"), ("iv", "interval")]):
            cur.execute(
                "INSERT INTO ducklake_column (column_id, table_id, "
                "column_name, column_type, column_order, nulls_allowed, "
                "begin_snapshot) VALUES (?, 1, ?, ?, ?, 1, 1)",
                (order + 1, cname, ctype, order))
        cur.execute(
            "INSERT INTO ducklake_data_file (data_file_id, table_id, path, "
            "path_is_relative, file_size_bytes, record_count, begin_snapshot) "
            "VALUES (1, 1, ?, 0, ?, ?, 1)",
            (data, os.path.getsize(data), meta.num_rows))
    w.close()
    with open(done, "w") as f:
        f.write("ok")
    return db


def ducklake_interval_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERVAL-column scan through the connector: sum the decoded
    months/days/micros components per bucket. The oracle recomputes the
    same intervals in DuckDB and decomposes them with its own
    date_part accessors — a full cross-engine check of the FLBA(12)
    little-endian decode."""
    from ..catalog import DuckLakeSession
    dl = DuckLakeSession(spark, _build_interval_catalog(sf_dir))
    return (dl.table("main.lineitem_iv")
            .groupBy("bucket")
            .agg(F.sum("iv.months").alias("sum_months"),
                 F.sum("iv.days").alias("sum_days"),
                 F.sum("iv.micros").alias("sum_micros"),
                 F.count(F.lit(1)).alias("n")))


ORACLE_INTERVAL_AGG = """
WITH t AS (
  SELECT l_orderkey % 7 AS bucket,
         INTERVAL (l_linenumber) MONTH
         + INTERVAL (l_orderkey % 100) DAY
         + INTERVAL (l_suppkey * 50) MILLISECOND AS iv
  FROM lineitem)
SELECT bucket,
  CAST(SUM(date_part('year', iv)*12 + date_part('month', iv)) AS BIGINT)
    AS sum_months,
  CAST(SUM(date_part('day', iv)) AS BIGINT) AS sum_days,
  CAST(SUM((date_part('hour', iv)*3600 + date_part('minute', iv)*60)*1000000
           + date_part('microsecond', iv)) AS BIGINT) AS sum_micros,
  COUNT(*) AS n
FROM t GROUP BY bucket
"""


@_locked_build
def _build_interval_write_catalog(spark: SparkSession, sf_dir: str) -> str:
    """Create (once per sf_dir) a catalog whose ``main.iv_written``
    table is produced by the ENGINE's OWN interval write path (r9):
    CTAS of an INTERVAL_MARK-ed struct frame derived from lineitem (even
    orderkeys), then an engine INSERT of the odd-orderkey slice, plus a
    DELETE carving a MOR slice — the write-side twin of
    _build_interval_catalog, whose files DuckDB writes. Every staged
    file carries the real parquet INTERVAL logical type via the
    executor-side duckdb COPY (table_writer._write_interval_distributed;
    reference writes interval natively, src/types.rs:95-164). Values are
    millisecond-granular on purpose so the parquet INTERVAL(millis)
    encoding is lossless and DuckDB recomputing from lineitem is an
    exact oracle."""
    import shutil

    from ..catalog import DuckLakeSession
    from ..metadata.writer import CatalogWriter
    from ..types import INTERVAL_MARK, INTERVAL_SPARK_TYPE

    tag = hashlib.md5((sf_dir + "/ivw-v1").encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"ducklake_ivw_{tag}")
    db = os.path.join(root, "catalog.sqlite")
    done = os.path.join(root, ".done")
    if os.path.exists(done):
        return db
    if os.path.exists(root):           # half-built leftovers: start over
        shutil.rmtree(root)
    os.makedirs(root)
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=os.path.join(root, "lake"))
    w.close()
    dl = DuckLakeSession(spark, db)
    src = (spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
           .select(
               (F.col("l_orderkey") % 7).alias("bucket"),
               F.col("l_orderkey"),
               F.when(F.col("l_orderkey") % 11 == 3,
                      F.lit(None).cast(INTERVAL_SPARK_TYPE))
               .otherwise(F.struct(
                   F.col("l_linenumber").cast("int").alias("months"),
                   (F.col("l_orderkey") % 100).cast("int").alias("days"),
                   (F.col("l_suppkey") * 50000).cast("long").alias("micros")))
               .alias("iv", metadata={INTERVAL_MARK: True})))
    dl.create_table("main.iv_written",
                    src.filter(F.col("l_orderkey") % 2 == 0)
                    .drop("l_orderkey"))
    dl.insert_into("main.iv_written",
                   src.filter(F.col("l_orderkey") % 2 == 1)
                   .drop("l_orderkey"))
    dl.delete_from("main.iv_written", "bucket = 5")
    with open(done, "w") as f:
        f.write("ok")
    return db


def ducklake_interval_write_agg(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Write-side INTERVAL gate (r9): the engine CTAS+INSERTs interval
    rows through its duckdb-backed staging, DELETEs a MOR slice, and
    the decoded components aggregate per bucket — the oracle recomputes
    the identical intervals from lineitem with DuckDB's own date_part
    accessors, so a wrong encode (or a file that isn't real parquet
    INTERVAL) breaks the hash."""
    from ..catalog import DuckLakeSession
    dl = DuckLakeSession(spark, _build_interval_write_catalog(spark, sf_dir))
    return (dl.table("main.iv_written")
            .groupBy("bucket")
            .agg(F.sum("iv.months").alias("sum_months"),
                 F.sum("iv.days").alias("sum_days"),
                 F.sum("iv.micros").alias("sum_micros"),
                 F.count(F.when(F.col("iv").isNull(), 1)).alias("n_null"),
                 F.count(F.lit(1)).alias("n")))


ORACLE_INTERVAL_WRITE_AGG = """
WITH t AS (
  SELECT l_orderkey % 7 AS bucket,
         CASE WHEN l_orderkey % 11 = 3 THEN NULL
              ELSE INTERVAL (l_linenumber) MONTH
                   + INTERVAL (l_orderkey % 100) DAY
                   + INTERVAL (l_suppkey * 50) MILLISECOND END AS iv
  FROM lineitem WHERE l_orderkey % 7 <> 5)
SELECT bucket,
  CAST(SUM(date_part('year', iv)*12 + date_part('month', iv)) AS BIGINT)
    AS sum_months,
  CAST(SUM(date_part('day', iv)) AS BIGINT) AS sum_days,
  CAST(SUM((date_part('hour', iv)*3600 + date_part('minute', iv)*60)*1000000
           + date_part('microsecond', iv)) AS BIGINT) AS sum_micros,
  COUNT(*) FILTER (iv IS NULL) AS n_null,
  COUNT(*) AS n
FROM t GROUP BY bucket
"""


@_locked_build
def _build_mv_catalog(spark: SparkSession, sf_dir: str) -> str:
    """Create (once per sf_dir) a catalog exercising the materialized-
    view surface end to end (operators/matview.py, beyond-parity — the
    reference has plain views only): CTAS the source from two thirds of
    orders, CREATE MATERIALIZED VIEW over it, engine-INSERT the
    remaining third and refresh (the window is insert-only and the
    definition is a recognized SUM/COUNT/MAX shape, so this MUST take
    the incremental CDC-delta MERGE path — the build fails loudly if it
    does not), then DELETE a slice and refresh again (MUST take the
    full-recompute path). The final MV contents therefore combine both
    refresh modes; DuckDB recomputing the definition over the final
    source state is an exact oracle because the sums are decimal."""
    import shutil

    from ..catalog import DuckLakeSession
    from ..metadata.writer import CatalogWriter

    tag = hashlib.md5((sf_dir + "/mv-v1").encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"ducklake_mv_{tag}")
    db = os.path.join(root, "catalog.sqlite")
    done = os.path.join(root, ".done")
    if os.path.exists(done):
        return db
    if os.path.exists(root):           # half-built leftovers: start over
        shutil.rmtree(root)
    os.makedirs(root)
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=os.path.join(root, "lake"))
    w.close()
    dl = DuckLakeSession(spark, db)
    src = (spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
           .select("o_orderkey", "o_orderstatus", "o_totalprice"))
    dl.create_table("main.mv_src", src.filter(F.col("o_orderkey") % 3 != 0))
    dl.sql("CREATE MATERIALIZED VIEW main.mv_agg AS "
           "SELECT o_orderstatus, "
           "SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS total, "
           "COUNT(*) AS n, MAX(o_totalprice) AS hi "
           "FROM main.mv_src GROUP BY o_orderstatus")
    dl.insert_into("main.mv_src", src.filter(F.col("o_orderkey") % 3 == 0))
    out = dl.refresh_materialized_view("main.mv_agg")
    if out["mode"] != "incremental":
        raise RuntimeError(
            f"mv gate: insert-only refresh took {out['mode']!r}, "
            f"expected the incremental CDC-delta MERGE path")
    dl.delete_from("main.mv_src", "o_orderkey % 7 = 0")
    out = dl.refresh_materialized_view("main.mv_agg")
    if out["mode"] != "full":
        raise RuntimeError(
            f"mv gate: delete-window refresh took {out['mode']!r}, "
            f"expected the full-recompute path")
    with open(done, "w") as f:
        f.write("ok")
    return db


def ducklake_mv_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view gate: the MV's final contents after an
    incremental (insert-only MERGE) refresh AND a full (post-DELETE)
    refresh must equal DuckDB recomputing the definition over the final
    source state — a wrong delta combine, a missed group, or a stale
    window breaks the hash."""
    from ..catalog import DuckLakeSession
    dl = DuckLakeSession(spark, _build_mv_catalog(spark, sf_dir))
    return (dl.table("main.mv_agg")
            .select("o_orderstatus",
                    F.col("total").cast("double").alias("total"),
                    F.col("n").cast("long").alias("n"),
                    F.col("hi").alias("hi")))


ORACLE_MV_AGG = """
SELECT o_orderstatus,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total,
  COUNT(*) AS n, MAX(o_totalprice) AS hi
FROM orders
WHERE o_orderkey % 7 <> 0
GROUP BY o_orderstatus
"""
