"""Write path: INSERT INTO (append/overwrite) and CTAS.

Reference parity (SURVEY.md §2A A8-A10): DuckLakeInsertExec
(src/insert_exec.rs:34-214) + DuckLakeTableWriter
(src/table_writer.rs:44-130, 201-291) + the one-transaction catalog setup
(src/metadata_writer_sqlite.rs:331-470). Ordering matches the reference:
catalog transaction first (snapshot/schema/table/columns [+end files for
Replace]), then file upload, then register-file — a crash between upload
and register leaves an orphaned file, never a corrupt catalog
(ref: table_writer.rs:181,293 comments).

Spark-first: the input DataFrame is written by executors with
``df.write.parquet`` (field ids stamped via schema metadata +
spark.sql.parquet.fieldId.write.enabled); N written files register as N
``ducklake_data_file`` rows in one snapshot — the catalog model supports
that natively, unlike the reference's collect-to-one-batch limitation
(insert_exec.rs:3-5), which ``single_file=True`` (coalesce(1)) emulates
for small results.
"""

from __future__ import annotations

import os
import uuid
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .errors import InvalidConfig
from .metadata.writer import CatalogWriter, ColumnDef, DataFileInfo, WriteMode
from .types import (is_geometry_type, is_interval_type,
                    spark_to_ducklake_type)


def _catalog_writer(session) -> CatalogWriter:
    w = _catalog_writer_raw(session)
    # max_retry_count (DuckDB's ducklake_max_retry_count, default 10):
    # retries of the catalog BEGIN on transient cross-process lock
    # contention — sql/settings/max_retry_count.test
    raw = session.provider.get_option("max_retry_count")
    if raw is not None:
        try:
            w.max_retry_count = max(0, int(raw))
        except (TypeError, ValueError):
            pass
    note = getattr(session, "_note_txn_snapshot", None)
    if note is not None:
        # explicit-transaction bookkeeping: the session records the
        # snapshot ids ITS statements allocate so ROLLBACK rewinds only
        # them (writer.rollback_to_snapshot's `only` parameter)
        w.on_snapshot = note
    return w


def _catalog_writer_raw(session) -> CatalogWriter:
    if getattr(session, "read_only", False):
        # READ_ONLY attach (corpus: sql/general/ducklake_read_only.test)
        raise InvalidConfig(
            "Cannot write to the catalog: the session is read-only")
    path = session.catalog_path
    if path.startswith(("postgresql://", "postgres://")):
        return CatalogWriter.postgres(path)
    if path.startswith("mysql://"):
        from urllib.parse import unquote, urlparse
        u = urlparse(path)
        # urlparse leaves userinfo percent-encoded; credentials with
        # special characters (e.g. %40 for @) must be decoded before
        # they reach the driver
        return CatalogWriter.mysql(
            host=u.hostname, port=u.port or 3306,
            user=unquote(u.username) if u.username else u.username,
            password=unquote(u.password) if u.password else u.password,
            database=unquote(u.path.lstrip("/")))
    if path.endswith((".duckdb", ".ddb")):
        return CatalogWriter.duckdb(path)
    if path.endswith((".sqlite", ".sqlite3", ".db")):
        # sniff like provider_for: a .db catalog may be DuckDB-format
        # (META_TYPE 'DUCKDB'; sql/general/metadata_parameters.test)
        try:
            with open(path, "rb") as f:
                if not f.read(16).startswith(b"SQLite format 3"):
                    return CatalogWriter.duckdb(path)
        except FileNotFoundError:
            pass
    return CatalogWriter.sqlite(path)


def _parquet_write_options(session, schema_id: int,
                           table_id: int) -> dict[str, str]:
    """DataFrameWriter options for the DuckLake parquet write settings
    (corpus: sql/settings/), resolved with table > schema > global
    precedence: parquet_compression ('uncompressed'|'snappy'|'gzip'|
    'zstd'|'lz4'), parquet_compression_level (zstd), parquet_version
    ('1'|'2' → parquet-mr writer version), parquet_row_group_size_bytes
    (→ parquet.block.size). parquet_row_group_size (a ROW count) is
    stored for DuckDB writers sharing the catalog but has no parquet-mr
    equivalent — Spark's writer splits row groups by bytes."""
    get = lambda k: session.provider.get_scoped_option(  # noqa: E731
        k, schema_id, table_id)
    opts: dict[str, str] = {}
    comp = get("parquet_compression")
    if comp:
        # 'lz4' means parquet LZ4_RAW (what DuckDB writes; upstream
        # per_table_settings.test asserts LZ4_RAW) — Spark's bare "lz4"
        # is the deprecated Hadoop-framed codec pyarrow/DuckDB can't read
        opts["compression"] = {"uncompressed": "none",
                               "lz4": "lz4_raw"}.get(comp.lower(),
                                                     comp.lower())
    level = get("parquet_compression_level")
    if level:
        opts["parquet.compression.codec.zstd.level"] = level
    version = get("parquet_version")
    if version:
        opts["parquet.writer.version"] = f"v{version.lstrip('vV')}"
    rg_bytes = get("parquet_row_group_size_bytes")
    if rg_bytes:
        opts["parquet.block.size"] = rg_bytes
    return opts


def _column_defs(schema: T.StructType) -> list[ColumnDef]:
    # a field carrying INTERVAL_MARK (a scan of an interval column, or a
    # user alias(metadata=...)) declares INTERVAL in the catalog; the
    # bare struct shape without the mark stays a struct column — a user
    # struct that merely shares the months/days/micros shape must not be
    # hijacked into interval CTAS
    from .types import INTERVAL_MARK
    return [ColumnDef(f.name,
                      "interval" if (f.metadata or {}).get(INTERVAL_MARK)
                      else spark_to_ducklake_type(f.dataType),
                      f.nullable)
            for f in schema.fields]


def _with_field_ids(df: DataFrame, column_ids: list[int],
                    nested: Optional[list] = None) -> DataFrame:
    """Stamp catalog column_ids as parquet field ids so renames stay
    metadata-only (ref: table_writer.rs:303-317). Uses alias(metadata=...)
    for the top level; nested struct-field ids (struct evolution — corpus
    sql/alter/struct_evolution*.test) ride in via a cast to the same
    structural type carrying ``parquet.field.id`` metadata on its nested
    StructFields (verified: the parquet writer emits them at any depth).
    ``nested``: per-column {path: id} maps parallel to column_ids."""
    from pyspark.sql import functions as F
    from .types import annotate_nested_ids
    nested = nested or [None] * len(column_ids)
    cols = []
    for f, cid, nmap in zip(df.schema.fields, column_ids, nested):
        c = F.col(f.name)
        if nmap:
            c = c.cast(annotate_nested_ids(f.dataType, (), dict(nmap)))
        cols.append(c.alias(f.name, metadata={**(f.metadata or {}),
                                              "parquet.field.id": cid}))
    return df.select(*cols)


def _enforce_not_null(df: DataFrame, not_null: list[str]) -> DataFrame:
    """Row-level NOT NULL enforcement INSIDE the write job: raise_error
    fails the stage at the first violating row — one distributed pass, no
    separate pre-scan action (the cost shape of DuckDB's constraint check;
    corpus parity: sql/constraints/not_null.test). Must be applied before
    field-id stamping (the when/otherwise projection drops metadata)."""
    if not not_null:
        return df
    from pyspark.sql import functions as F
    keep = set(not_null)
    return df.select(*[
        F.when(F.col(c).isNull(), F.raise_error(F.lit(
            f"NOT NULL constraint violated: column \"{c}\" contains NULL")))
        .otherwise(F.col(c)).alias(c) if c in keep else F.col(c)
        for c in df.columns])


def _raise_if_constraint(e: Exception):
    """Map a raise_error-failed write job back to the engine's typed
    error; re-raise anything else untouched."""
    if "NOT NULL constraint violated" in str(e):
        import re as _re
        m = _re.search(r"NOT NULL constraint violated: [^\n']*", str(e))
        raise InvalidConfig(m.group(0) if m else
                            "NOT NULL constraint violated") from None
    raise


def footer_size_of(path: str) -> int:
    """Parquet footer size from the trailing 8 bytes: 4-byte little-endian
    metadata length + 'PAR1' magic (ref: table_writer.rs:319-338)."""
    with open(path, "rb") as f:
        f.seek(-8, os.SEEK_END)
        tail = f.read(8)
    if tail[4:] != b"PAR1":
        raise InvalidConfig(f"not a parquet file: {path}")
    return int.from_bytes(tail[:4], "little") + 8


def _footer_size_from_tail(tail: bytes, path: str) -> int:
    if tail[4:] != b"PAR1":
        raise InvalidConfig(f"not a parquet file: {path}")
    return int.from_bytes(tail[:4], "little") + 8


class _HadoopFs:
    """Thin wrapper over Spark's Hadoop FileSystem — the object-store-
    capable staging route (ref: the reference writes through object_store,
    table_writer.rs:261-274). Works on any scheme Spark itself can write
    (file://, s3a://, hdfs://, gs://, abfss://); integration-tested via
    file:// since no object store exists offline."""

    def __init__(self, spark, root: str):
        self._jvm = spark._jvm
        self._gw = spark.sparkContext._gateway
        jpath = self._jvm.org.apache.hadoop.fs.Path(root)
        self._fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())

    def _p(self, path: str):
        return self._jvm.org.apache.hadoop.fs.Path(path)

    def list_names(self, dir_path: str) -> list[str]:
        return [st.getPath().getName()
                for st in self._fs.listStatus(self._p(dir_path))]

    def rename(self, src: str, dst: str) -> None:
        if not self._fs.rename(self._p(src), self._p(dst)):
            raise InvalidConfig(f"rename failed: {src} -> {dst}")

    def size(self, path: str) -> int:
        return int(self._fs.getFileStatus(self._p(path)).getLen())

    def exists(self, path: str) -> bool:
        return bool(self._fs.exists(self._p(path)))

    def delete(self, path: str, recursive: bool = False) -> None:
        self._fs.delete(self._p(path), recursive)

    def list_statuses(self, dir_path: str) -> list[tuple[str, bool]]:
        return [(st.getPath().getName(), bool(st.isDirectory()))
                for st in self._fs.listStatus(self._p(dir_path))]

    def list_files(self, dir_path: str) -> list[tuple[str, int]]:
        """(name, size) for every plain file — one LIST RPC, no
        per-file getFileStatus round trips."""
        return [(st.getPath().getName(), int(st.getLen()))
                for st in self._fs.listStatus(self._p(dir_path))
                if not st.isDirectory()]

    def mkdirs(self, path: str) -> None:
        self._fs.mkdirs(self._p(path))

    def tail(self, path: str, n: int, size: Optional[int] = None) -> bytes:
        # py4j passes byte[] by value, so readFully(pos, buf) can't hand
        # data back; n is tiny (8 bytes — the parquet footer-length field),
        # so per-byte read() round trips are fine. Pass ``size`` when the
        # file length is already known (from a LIST) to skip one RPC.
        ln = self.size(path) if size is None else size
        stream = self._fs.open(self._p(path))
        try:
            stream.seek(ln - n)
            out = bytearray()
            for _ in range(n):
                b = stream.read()
                if b < 0:
                    break
                out.append(b & 0xFF)
            return bytes(out)
        finally:
            stream.close()


def _local_readable(table_path: str, name: str) -> Optional[str]:
    """Local filesystem path for a just-written file, or None if it lives
    on an object store (stats collection is then skipped — a distributed
    stats job is the object-store refinement)."""
    base = table_path
    if base.startswith("file://"):
        base = base[len("file://"):]
    if "://" in base:
        return None
    return os.path.join(base, name)


def nested_stats_ids(columns) -> dict[str, int]:
    """parquet ``path_in_schema`` → field id for NESTED leaves, built from
    the catalog's per-column nested ids (list element / map key/value /
    struct fields). Feeding these into column_stats_of records min/max
    per nested leaf — the statistics the reference keeps for array and
    struct-array columns (sql/add_files/
    add_files_complex_nested_stats_mre.test). Both the duckdb/Spark
    3-level list spelling (``col.list.element``) and pyarrow's
    (``col.list.item``) are mapped."""
    from .types import _type_kind, nested_child_slots, normalize_ducklake_type
    out: dict[str, int] = {}
    for c in columns:
        for path, fid in (c.nested_ids or ()):
            # walk the canonical type along the path: whether 'key'/'value'
            # is a MAP slot or a struct FIELD NAME depends on the parent
            # type's kind, not the segment spelling
            try:
                cur = normalize_ducklake_type(c.column_type)
            except Exception:
                continue
            segs, item_segs, ok = [c.column_name], [c.column_name], True
            for p in path:
                kind = _type_kind(cur)
                slots = dict(nested_child_slots(cur))
                child = slots.get(p.lower())
                if child is None:
                    ok = False
                    break
                if kind == "list":
                    segs += ["list", "element"]
                    item_segs += ["list", "item"]
                elif kind == "map":
                    segs += ["key_value", p.lower()]
                    item_segs += ["key_value", p.lower()]
                else:
                    segs.append(p)
                    item_segs.append(p)
                cur = child
            if ok:
                out[".".join(segs)] = fid
                out[".".join(item_segs)] = fid
    return out


def column_stats_of(path: str, column_ids: dict[str, int],
                    geo_columns: "set[str] | None" = None) -> list[tuple]:
    """Per-column (column_id, size, value_count, null_count, min, max,
    contains_nan[, extra_stats]) aggregated across row groups, rendered
    as DuckLake stores them (stringified values). Columns without usable
    parquet statistics get NULL min/max — pruning treats that as 'keep'.

    ``geo_columns``: GEOMETRY column names — those get a bbox/types
    ``extra_stats`` JSON from one single-column read of the just-written
    file (geo corpus: sql/geo/ducklake_geometry.test:30-44)."""
    import datetime

    import pyarrow.parquet as pq

    def render(v):
        if v is None:
            return None
        if isinstance(v, bytes):
            try:
                return v.decode("utf-8")
            except UnicodeDecodeError:
                return None
        if isinstance(v, (datetime.date, datetime.datetime)):
            return v.isoformat(sep=" ") if isinstance(v, datetime.datetime) \
                else v.isoformat()
        if isinstance(v, float):
            return repr(v)
        return str(v)

    meta = pq.read_metadata(path)
    agg: dict[str, list] = {}
    for rg in range(meta.num_row_groups):
        group = meta.row_group(rg)
        for ci in range(group.num_columns):
            col = group.column(ci)
            name = col.path_in_schema
            if name not in column_ids:
                continue                      # nested leaf / helper column
            a = agg.setdefault(name, [0, 0, 0, None, None, False])
            a[0] += col.total_compressed_size
            a[1] += col.num_values
            try:
                st = col.statistics
                has = st is not None and st.has_min_max
                mn, mx = (st.min, st.max) if has else (None, None)
            except Exception:
                # pyarrow can't cast stats for some physical types (e.g.
                # FIXED_LEN_BYTE_ARRAY decimals) — record column sizes but
                # no range; pruning treats unknown range as 'keep'
                has = False
            if not has:
                # all-NULL chunk: parquet writes no min/max but the null
                # count is exact — count it and leave the range alone
                # (sql/stats/global_stats.test: a NULL insert must not
                # erase the table envelope's Min/Max)
                try:
                    nc = st.null_count if st is not None else None
                except Exception:
                    nc = None
                if nc is not None and nc == col.num_values:
                    a[2] += nc
                    continue
                a[3] = a[4] = None
                a[5] = True                   # poison: unknown range
                continue
            if a[5]:
                continue
            a[2] += (st.null_count or 0)
            a[3] = mn if a[3] is None or (mn is not None and mn < a[3]) else a[3]
            a[4] = mx if a[4] is None or (mx is not None and mx > a[4]) else a[4]
    out = []
    for name, (size, count, nulls, mn, mx, poison) in agg.items():
        if poison:
            mn = mx = None
        extra = None
        if geo_columns and name in geo_columns:
            from .functions.geo import file_extra_stats
            extra = file_extra_stats(path, name)
        out.append((column_ids[name], size, count, nulls,
                    render(mn), render(mx), None, extra))
    return out


def _finalize_local(staging: str, table_path: str
                    ) -> list[tuple[str, int, int, int]]:
    """Local-FS staging finalize: returns [(name, size, footer, rows)]."""
    import pyarrow.parquet as pq
    staged = []
    for part in sorted(os.listdir(staging)):
        if not part.endswith(".parquet"):
            continue
        final_name = f"ducklake-{uuid.uuid4()}.parquet"
        final_path = os.path.join(table_path, final_name)
        os.rename(os.path.join(staging, part), final_path)
        meta = pq.read_metadata(final_path)
        staged.append((final_name, os.path.getsize(final_path),
                       footer_size_of(final_path), meta.num_rows))
    for leftover in os.listdir(staging):
        os.remove(os.path.join(staging, leftover))
    os.rmdir(staging)
    return staged


def _enumerate_parquet_dir(spark, dir_path: str
                           ) -> list[tuple[str, int, int, int]]:
    """[(name, size, footer, rows)] for every parquet file already in a
    scheme'd directory — object-store discipline: one LIST RPC for
    names+sizes, an 8-byte ranged tail per file for the footer length,
    ONE distributed count-from-footer-stats job for row counts (skipped
    entirely when the directory holds no parquet files, e.g. the
    rewrite of an empty table — spark.read.parquet cannot infer a
    schema from nothing). The driver never downloads payload bytes."""
    from pyspark.sql import functions as F

    fs = _HadoopFs(spark, dir_path)
    files = sorted((n, sz) for n, sz in fs.list_files(dir_path)
                   if n.endswith(".parquet"))
    if not files:
        return []
    counts = {
        r["f"].rsplit("/", 1)[-1]: r["count"]
        for r in (spark.read.parquet(dir_path)
                  .groupBy(F.col("_metadata.file_path").alias("f"))
                  .count().collect())}
    out = []
    for name, sz in files:
        fpath = dir_path.rstrip("/") + "/" + name
        tail = fs.tail(fpath, 8, size=sz)
        out.append((name, sz, _footer_size_from_tail(tail, fpath),
                    int(counts.get(name, 0))))
    return out


def _finalize_hadoop(spark, staging: str, table_path: str
                     ) -> list[tuple[str, int, int, int]]:
    """Hadoop-FS staging finalize (file:// s3a:// hdfs:// gs:// abfss://).

    Row counts come from one distributed metadata job over the staged
    parquet (count-from-footer-stats; no payload read), sizes from one
    LIST, footer sizes from an 8-byte ranged tail read — the driver
    never downloads file contents, matching the reference's object_store
    discipline (table_writer.rs:261-274). Size/footer/rows are measured
    BEFORE the rename (they are rename-invariant), so an empty staging
    dir finalizes to zero files instead of crashing schema inference."""
    fs = _HadoopFs(spark, table_path)
    staged = []
    for part, size, footer, rows in _enumerate_parquet_dir(spark, staging):
        final_name = f"ducklake-{uuid.uuid4()}.parquet"
        final_path = table_path.rstrip("/") + "/" + final_name
        fs.rename(staging.rstrip("/") + "/" + part, final_path)
        staged.append((final_name, size, footer, rows))
    fs.delete(staging, recursive=True)
    return staged


_PART_PREFIX = "__part_"


def _partition_keys(spec: list, id_to_name: dict) -> list[tuple]:
    """Live-spec staging keys as (base_column, transform, dir_key)
    triples. dir_key is the hive directory name: the column name for
    identity, the transform name otherwise (DuckDB's layout —
    year=2020/month=1; corpus: sql/partitioning/year_month_day.test)."""
    out = []
    for _idx, cid, tf in spec:
        if cid not in id_to_name:
            continue
        name = id_to_name[cid]
        out.append((name, tf, name if tf == "identity" else tf))
    return out


def _partition_expr(base_col: str, transform: str):
    """Staging Column for one partition key (string-typed hive value)."""
    from pyspark.sql import functions as F
    col = F.col(base_col)
    fns = {"identity": lambda c: c, "year": F.year, "month": F.month,
           "day": F.dayofmonth, "hour": F.hour}
    if transform not in fns:
        raise InvalidConfig(
            f"unsupported partition transform {transform!r} "
            "(identity/year/month/day/hour)")
    return fns[transform](col).cast("string")


def _parse_part_segs(segs: list[str], key_names: list[str]):
    """Hive staging dir segments (__part_<i>=<escaped>) → ([(key_index,
    value|None)], final subdir segments using the REAL column names —
    the hive-style layout DuckDB's writer produces)."""
    from urllib.parse import unquote
    pvals, subsegs = [], []
    for seg in segs:
        k, _, v = seg.partition("=")
        idx = int(k[len(_PART_PREFIX):])
        val = None if v == "__HIVE_DEFAULT_PARTITION__" else unquote(v)
        pvals.append((idx, val))
        subsegs.append(f"{key_names[idx]}={v}")
    return pvals, subsegs


def _hive_file_pattern(session, table_id: int,
                       schema_id: "int | None" = None) -> bool:
    """The ``hive_file_pattern`` scoped option (sql/partitioning/
    disable_hive_partitioning.test): False writes a partitioned table's
    files FLAT in the table dir — partition values still register in the
    catalog, so pruning is unaffected; only the directory layout
    changes. Default True (hive-style key=value subdirs)."""
    if schema_id is None:
        # callers that only know the table (UPDATE/MERGE rewrite, flush)
        # still honor a SCHEMA-scoped setting
        try:
            rows = session.provider._fetchall(
                "SELECT schema_id FROM ducklake_table "
                "WHERE table_id = ? AND end_snapshot IS NULL", (table_id,))
            schema_id = int(rows[0][0]) if rows else None
        except Exception:
            schema_id = None
    v = session.provider.get_scoped_option(
        "hive_file_pattern", schema_id, table_id)
    return v is None or str(v).strip().lower() not in (
        "false", "0", "no", "f")


def _finalize_partitioned_local(staging: str, table_path: str,
                                key_names: list[str],
                                hive_dirs: bool = True) -> list[tuple]:
    """[(final_relpath, size, footer, rows, [(key_index, value)])] for a
    hive-partitioned staging dir on the local FS. ``hive_dirs`` False
    drops the key=value subdirs (flat layout; catalog values only)."""
    import shutil

    import pyarrow.parquet as pq
    staged = []
    for root, _dirs, files_ in sorted(os.walk(staging)):
        parts = sorted(p for p in files_ if p.endswith(".parquet"))
        if not parts:
            continue
        rel = os.path.relpath(root, staging)
        segs = [] if rel == "." else rel.split(os.sep)
        pvals, subsegs = _parse_part_segs(segs, key_names)
        if not hive_dirs:
            subsegs = []
        os.makedirs(os.path.join(table_path, *subsegs), exist_ok=True)
        for part in parts:
            final_name = "/".join(
                subsegs + [f"ducklake-{uuid.uuid4()}.parquet"])
            final_path = os.path.join(table_path, final_name)
            os.rename(os.path.join(root, part), final_path)
            staged.append((final_name, os.path.getsize(final_path),
                           footer_size_of(final_path),
                           pq.read_metadata(final_path).num_rows, pvals))
    shutil.rmtree(staging)
    return staged


def _finalize_partitioned_hadoop(spark, staging: str, table_path: str,
                                 key_names: list[str],
                                 hive_dirs: bool = True) -> list[tuple]:
    """Object-store variant: recursive FileSystem walk, distributed
    footer row counts, ranged tail reads — driver never downloads
    payload bytes."""
    from pyspark.sql import functions as F

    fs = _HadoopFs(spark, table_path)
    # key counts by the path RELATIVE to the staging root, not the
    # basename: Spark's dynamic-partition writer resets its file counter
    # per partition dir, so two partition dirs can hold files with
    # IDENTICAL basenames and a basename map would register one file
    # with the other's record_count (corrupting rowid ranges)
    stage_base = staging.rstrip("/").rsplit("/", 1)[-1]

    def _relkey(p: str) -> str:
        i = p.find("/" + stage_base + "/")
        return p[i + len(stage_base) + 2:] if i >= 0 \
            else p.rsplit("/", 1)[-1]

    counts = {
        _relkey(r["f"]): r["count"]
        for r in (spark.read.parquet(staging)
                  .groupBy(F.col("_metadata.file_path").alias("f"))
                  .count().collect())}

    staged = []

    def walk(dir_path: str, segs: list[str]):
        entries = sorted(fs.list_statuses(dir_path))
        parts = [n for n, is_dir in entries
                 if not is_dir and n.endswith(".parquet")]
        if parts:
            pvals, subsegs = _parse_part_segs(segs, key_names)
            if not hive_dirs:
                subsegs = []
            if subsegs:
                fs.mkdirs(table_path.rstrip("/") + "/" + "/".join(subsegs))
            for part in parts:
                final_name = "/".join(
                    subsegs + [f"ducklake-{uuid.uuid4()}.parquet"])
                final_path = table_path.rstrip("/") + "/" + final_name
                fs.rename(dir_path.rstrip("/") + "/" + part, final_path)
                staged.append((final_name, fs.size(final_path),
                               _footer_size_from_tail(
                                   fs.tail(final_path, 8), final_path),
                               int(counts.get("/".join(segs + [part]), 0)),
                               pvals))
        for n, is_dir in entries:
            if is_dir and n.startswith(_PART_PREFIX):
                walk(dir_path.rstrip("/") + "/" + n, segs + [n])

    walk(staging, [])
    fs.delete(staging, recursive=True)
    return staged


MAX_COMPACT_RUNS = 256


def _survivor_run_df(session, file_rows: list, dirty_pairs: list):
    """Merged contiguous LIVE rowid runs as a DataFrame (__grp, start, cnt)
    — entirely executor-side, so a heavily-deleted table (billions of
    delete positions) never materializes positions on the driver (r3
    VERDICT wrongness #3; the old path collect_list(pos)'d per file).

    ``file_rows``: (data_basename, group_id, row_id_start, record_count)
    for EVERY member file; ``dirty_pairs``: (delete_uri, data_basename).
    Mechanics: per-file live islands are the gaps between consecutive
    delete positions (lag window over the delete parquets, keyed via the
    catalog delete→data pairing on _metadata.file_path — never the delete
    parquet's own file_path column, ref table.rs:84-85), plus the tail
    after max(pos), plus whole-file runs for clean members; adjacent runs
    then merge within each group via an island window. Output size is
    O(live islands); callers collect it capped."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    spark = session.spark
    fmap = spark.createDataFrame(
        file_rows, "__data STRING, __grp LONG, __rstart LONG, __rcount LONG")
    if dirty_pairs:
        pair_df = spark.createDataFrame(
            [(d.rsplit("/", 1)[-1], b) for d, b in dirty_pairs],
            "__del STRING, __data STRING")
        dels = (spark.read.parquet(*[d for d, _ in dirty_pairs])
                .select(F.element_at(
                    F.split(F.col("_metadata.file_path"), "/"), -1)
                    .alias("__del"), "pos")
                .join(F.broadcast(pair_df), "__del")
                .join(F.broadcast(fmap), "__data"))
        w = Window.partitionBy("__data").orderBy("pos")
        gaps = (dels.withColumn("__prev", F.lag("pos", 1, -1).over(w))
                .filter(F.col("pos") > F.col("__prev") + 1)
                .select("__grp",
                        (F.col("__rstart") + F.col("__prev") + 1)
                        .alias("start"),
                        (F.col("pos") - F.col("__prev") - 1).alias("cnt")))
        tails = (dels.groupBy("__data", "__grp", "__rstart", "__rcount")
                 .agg(F.max("pos").alias("__mx"))
                 .filter(F.col("__rcount") > F.col("__mx") + 1)
                 .select("__grp",
                         (F.col("__rstart") + F.col("__mx") + 1)
                         .alias("start"),
                         (F.col("__rcount") - F.col("__mx") - 1)
                         .alias("cnt")))
        clean = (fmap.join(pair_df.select("__data").distinct(),
                           "__data", "left_anti")
                 .filter(F.col("__rcount") > 0)
                 .select("__grp", F.col("__rstart").alias("start"),
                         F.col("__rcount").alias("cnt")))
        runs = gaps.unionByName(tails).unionByName(clean)
    else:
        runs = (fmap.filter(F.col("__rcount") > 0)
                .select("__grp", F.col("__rstart").alias("start"),
                        F.col("__rcount").alias("cnt")))
    w2 = Window.partitionBy("__grp").orderBy("start")
    return (runs
            .withColumn("__pend",
                        F.lag(F.col("start") + F.col("cnt"), 1, -1).over(w2))
            .withColumn("__new",
                        F.when(F.col("start") != F.col("__pend"), 1)
                        .otherwise(0))
            .withColumn("__island",
                        F.sum("__new").over(
                            w2.rowsBetween(Window.unboundedPreceding, 0)))
            .groupBy("__grp", "__island")
            .agg(F.min("start").alias("start"), F.sum("cnt").alias("cnt"))
            .select("__grp", "start", "cnt"))


def _carve_rowid_runs(session, handle,
                      cap: Optional[int] = None) -> list[tuple[int, int]]:
    """[(start_rowid, count)] of the table's contiguous LIVE rowid runs.
    Runs are computed and merged executor-side (_survivor_run_df); the
    driver receives at most ``cap + 1`` rows when a cap is given, so a
    shattered table raises in the caller without ever materializing its
    islands."""
    pairs = sorted(zip(handle._raw_files, handle.files),
                   key=lambda t: t[0].row_id_start)
    file_rows = [(os.path.basename(mf.path), 0, mf.row_id_start,
                  mf.record_count) for mf, _ in pairs]
    dirty_pairs = [(rf.delete_uri, os.path.basename(mf.path))
                   for mf, rf in pairs if rf.delete_uri is not None]
    if not file_rows:
        return []
    df = _survivor_run_df(session, file_rows, dirty_pairs).orderBy("start")
    if cap is not None:
        df = df.limit(cap + 1)
    return [(r["start"], r["cnt"]) for r in df.collect()]


def compact_table(session, name: str, single_file: bool = True,
                  max_runs: int = MAX_COMPACT_RUNS) -> int:
    """Rewrite a table's live rows into clean files, PRESERVING virtual
    rowids (ADVICE r1: real DuckLake keeps rowids stable through
    rewrites; naively re-registering loses them and shows compaction as
    delete+insert in CDC).

    Mechanism: rowid = row_id_start + file position, so an output file
    can only carry rows whose rowids are CONTIGUOUS. Deletions punch
    holes, splitting the survivors into runs (gaps-and-islands on
    rowid); each run becomes one output file registered with
    row_id_start = run start. Tables whose deletion pattern shatters
    them into more than ``max_runs`` islands are refused — re-run after
    more deletes accumulate contiguously, or accept fresh rowids via
    ``session.compact(name, preserve_rowids=False)``.

    Tables without rowids (files lacking row_id_start, e.g. foreign
    fixtures) take the plain rewrite path unchanged.

    Scale: run discovery reads ONLY the catalog + delete files (the holes
    define the islands) — no full-table sort, and the islands are carved
    AND merged executor-side (_survivor_run_df), so the driver receives at
    most max_runs+1 run rows, never a position list. Rows then assign to
    runs with a broadcast range join (≤ max_runs ranges)."""
    from pyspark.sql import functions as F

    handle = session.table_handle(name)
    if handle.inlined_tables and handle.inlined_rows():
        raise InvalidConfig(
            "compact over tables with live inlined data rows is not "
            "supported — call flush_inlined_data() first")
    from .types import is_interval_type
    if any(is_interval_type(c.column_type) for c in handle.columns):
        # interval rewrite (r9): carry rowids in-file through the
        # duckdb-backed staging — the run-carving path below writes via
        # Spark's parquet writer, which cannot emit INTERVAL
        if not handle.files:
            return 0
        return _compact_rowid_column(session, name, handle,
                                     single_file=single_file)
    if any(f.encryption_key is not None for f in handle.files):
        raise InvalidConfig(
            "compact with rowid preservation over encrypted tables is not "
            "supported — compact(preserve_rowids=False) rewrites "
            "encrypted (fresh rowids)")
    if not handle.files or any(f.row_id_start is None for f in handle.files):
        from .operators.dml import rowids_preservable
        if handle.files and rowids_preservable(handle):
            # UPDATE-rewritten files carry their rowids as the reserved
            # in-file column — compact preserves them by carrying the
            # column through the rewrite (run-carving needs contiguous
            # start-based ranges, which such tables no longer have)
            return _compact_rowid_column(session, name, handle,
                                         single_file=single_file)
        return create_or_insert(session, name, session.table(name),
                                mode="overwrite", single_file=single_file,
                                maintenance=True)

    if session.provider.get_partition_columns(handle.meta.table_id,
                                              handle.snapshot_id):
        # live partition spec: a cross-partition rewrite would strip the
        # outputs' exact partition values (pruning loss). Compact becomes
        # per-partition adjacent-chain rewrites instead (pv carried;
        # single_file necessarily per-partition, not per-table).
        groups = partition_chains(session, handle)
        if not groups:
            return 0
        return rewrite_file_groups(session, name, groups, op="compact")

    run_list = _carve_rowid_runs(session, handle, cap=max_runs)
    if len(run_list) > max_runs:
        raise InvalidConfig(
            f"compact: {name} has more than {max_runs} contiguous rowid "
            f"runs; rowids cannot be preserved in that many "
            f"files — compact with preserve_rowids=False to renumber")
    runs = [(i, s, c) for i, (s, c) in enumerate(run_list)]

    df = session.table(name, with_rowid=True)
    ranges = session.spark.createDataFrame(
        [(i, s, s + c - 1) for i, s, c in runs] or [(0, 0, -1)],
        "__run LONG, __lo LONG, __hi LONG")
    df2 = (df.join(F.broadcast(ranges),
                   (F.col("rowid") >= F.col("__lo"))
                   & (F.col("rowid") <= F.col("__hi")))
           .drop("__lo", "__hi"))

    writer = _catalog_writer(session)
    try:
        cols = [ColumnDef(c.column_name, c.column_type, c.nulls_allowed)
                for c in handle.columns]
        schema_name, table_name = session._split(name)
        setup = writer.begin_write_transaction(
            schema_name, table_name, cols, WriteMode.REPLACE,
            maintenance=True)

        if not runs:          # empty table: just end the old files
            session.refresh()
            return 0

        table_path = handle.table_path
        session.spark.conf.set("spark.sql.parquet.fieldId.write.enabled",
                               "true")
        data_cols = [f.name for f in session.table(name).schema.fields]
        out = (df2.repartition("__run").sortWithinPartitions("rowid")
               .select(*data_cols, "__run"))
        out = _with_field_ids_partial(
            out, data_cols, setup.column_ids,
            [dict(c.nested_ids or ()) for c in handle.columns])
        staging = table_path.rstrip("/") + f"/stage-{uuid.uuid4().hex}"
        schema_meta = session.provider.get_schema_by_name(
            schema_name, setup.snapshot_id)
        wopts = _parquet_write_options(
            session, schema_meta.schema_id, handle.meta.table_id)
        (out.write.options(**wopts).partitionBy("__run")
         .parquet(staging, mode="errorifexists"))

        staged = _finalize_compact_runs(session, staging, table_path, runs)
        n_rows = 0
        for (run_id, start, cnt), (final_name, size, footer) in \
                zip(runs, staged):
            fid = writer.register_data_file(
                handle.meta.table_id, setup.snapshot_id,
                DataFileInfo(path=final_name, path_is_relative=True,
                             file_size_bytes=size, footer_size=footer,
                             record_count=cnt, row_id_start=int(start)))
            local = _local_readable(table_path, final_name)
            if local is not None:
                writer.register_file_column_stats(
                    fid, handle.meta.table_id,
                    column_stats_of(local,
                                    dict(zip(data_cols, setup.column_ids)),
                                    {c.column_name for c in handle.columns
                                     if is_geometry_type(c.column_type)}))
            n_rows += cnt
        session.refresh()
        return n_rows
    finally:
        writer.close()


def _compact_rowid_column(session, name: str, handle,
                          single_file: bool = True) -> int:
    """Compact a table whose files carry explicit in-file rowids: scan
    live rows WITH rowid, rewrite them keeping the reserved column, and
    register the outputs with row_id_start NULL in one maintenance
    Replace snapshot — rowids stay stable through compaction exactly as
    through the UPDATE that created them."""
    from .operators.dml import _register_append, _stage_append
    df = session.table(name, with_rowid=True)
    schema_name, table_name = session._split(name)
    writer = _catalog_writer(session)
    try:
        cols = [ColumnDef(c.column_name, c.column_type, c.nulls_allowed,
                          c.initial_default, c.default_value)
                for c in handle.columns]
        setup = writer.begin_write_transaction(
            schema_name, table_name, cols, WriteMode.REPLACE,
            maintenance=True)
        staged = _stage_append(session, handle, df,
                               single_file=single_file, include_rowid=True)
        n = _register_append(session, writer, setup.snapshot_id, handle,
                             staged, rowid_in_file=True)
    finally:
        writer.close()
    session.refresh()
    return n


def _insert_encrypted(session, writer, setup, table_meta, table_path,
                      out: DataFrame, df: DataFrame,
                      commit_marker, part_keys=None) -> int:
    """Encrypted-catalog insert tail: PME-write each partition inside
    executor tasks (fresh random key per file), then register the
    manifest in ONE transaction with the keys in the catalog. With
    ``part_keys`` the files land FLAT (no value-leaking path segments)
    and each file's partition combo registers as catalog rows
    (sql/encryption/partitioning_encryption.test)."""
    import json as _json

    from .sources.encryption import (write_encrypted_distributed,
                                     write_encrypted_partitioned)

    base = table_path[len("file://"):] \
        if table_path.startswith("file://") else table_path
    os.makedirs(base, exist_ok=True)
    if part_keys:
        from pyspark.sql import functions as F
        pk_cols = []
        for i, (base_col, tf, _dk) in enumerate(part_keys):
            out = out.withColumn(f"{_PART_PREFIX}{i}",
                                 _partition_expr(base_col, tf))
            pk_cols.append(f"{_PART_PREFIX}{i}")
        out = out.repartition(*[F.col(c) for c in pk_cols])
        manifest = write_encrypted_partitioned(out, table_path, pk_cols)
    else:
        manifest = write_encrypted_distributed(out, table_path)
    n_rows = 0
    next_rowid = writer.next_row_id(table_meta.table_id)
    with writer._txn():
        for row in sorted(manifest, key=lambda r: r["name"]):
            fid = writer.register_data_file(
                table_meta.table_id, setup.snapshot_id,
                DataFileInfo(path=row["name"], path_is_relative=True,
                             file_size_bytes=row["size"],
                             footer_size=row["footer"],
                             record_count=row["rows"],
                             row_id_start=next_rowid,
                             encryption_key=row["key"]))
            # column stats stay unwritten: the payload is encrypted and
            # min/max in the catalog would leak it (DuckDB's extension
            # does the same — pruning falls back to 'keep all')
            if row.get("pvals"):
                writer.register_file_partition_values(
                    fid, table_meta.table_id,
                    list(enumerate(_json.loads(row["pvals"]))))
            next_rowid += row["rows"]
            n_rows += row["rows"]
        if commit_marker is not None:
            writer.set_option(commit_marker[0], commit_marker[1])
    session.refresh()
    return n_rows


def _interval_dest_uri(dest_dir: str) -> "str | None":
    """None for posix/file:// table paths (the direct local write). For
    an object-store path, the pyarrow-FileSystem URI the executor tasks
    upload through: s3a:// (Hadoop's S3 scheme) maps to pyarrow's
    s3://; gs/hdfs pass through; anything else fails driver-side with a
    clean error before any job runs. SPARK_GRAFT_MOCK_OBJECT_STORE=<dir>
    reroutes s3/s3a URIs to file://<dir>/<bucket-and-path> — the tests'
    mock object store: the task still resolves FileSystem.from_uri and
    streams through open_output_stream, the identical upload code path
    as real S3 with a local client behind it."""
    if "://" not in dest_dir or dest_dir.startswith("file://"):
        return None
    scheme, rest = dest_dir.split("://", 1)
    scheme = scheme.lower()
    if scheme in ("s3", "s3a"):
        mock = os.environ.get("SPARK_GRAFT_MOCK_OBJECT_STORE")
        if mock:
            return "file://" + os.path.join(mock, rest)
        return "s3://" + rest
    if scheme in ("gs", "gcs", "hdfs", "viewfs"):
        return dest_dir
    from .errors import InvalidConfig
    raise InvalidConfig(
        f"interval writes to {scheme}:// table paths are not supported "
        f"(no executor-side pyarrow FileSystem client for this scheme); "
        f"use add_files or a local/s3a/gs/hdfs table path")


def _write_interval_distributed(df: DataFrame, dest_dir: str,
                                iv_cols: list[str]) -> list[dict]:
    """Write a DataFrame holding interval columns (months/days/micros
    struct representation) as parquet files carrying the REAL parquet
    INTERVAL logical type, one file per non-empty partition, written
    INSIDE executor tasks through an embedded DuckDB ``COPY`` — the one
    local engine that emits FLBA(12)/INTERVAL (r9 probe: pyarrow 16
    raises ArrowNotImplementedError on month_day_nano_interval, and
    df.write.parquet has no interval column type; reference writes
    interval natively via its Arrow writer, src/types.rs:95-164). Same
    distributed shape as write_encrypted_distributed: the driver never
    touches payload bytes, the returned manifest is a tiny per-file
    collect.

    Parity notes: sub-millisecond micros truncate (parquet INTERVAL
    stores millis; DuckDB's own COPY truncates identically), NULL struct
    → NULL interval, NULL components coalesce to 0, and negative
    components fail loudly inside the task with DuckDB's own "Parquet
    files do not support negative intervals".

    Object-store table paths (r10, reference parity
    src/table_writer.rs:261-274 — write buffer → object_store.put): the
    COPY stages to EXECUTOR-local tmp, then the task streams the bytes
    up through a pyarrow FileSystem resolved from the destination URI
    (s3a:// translated to pyarrow's s3://). The Hadoop FileSystem API
    the driver-side paths use is py4j-only and unreachable from an
    executor's Python worker, so the executor-side client is pyarrow's
    native one — same object-store discipline (the driver still never
    touches payload bytes). Posix and file:// paths keep the direct
    local write."""
    fs_uri = _interval_dest_uri(dest_dir)
    base = None
    if fs_uri is None:
        base = dest_dir[len("file://"):] \
            if dest_dir.startswith("file://") else dest_dir
    iv = set(iv_cols)

    def q(name: str) -> str:
        return '"' + name.replace('"', '""') + '"'

    cols_sql = ", ".join(
        (f"CASE WHEN {q(c)} IS NULL THEN NULL ELSE "
         f"to_months(COALESCE({q(c)}.months, 0)) "
         f"+ to_days(COALESCE({q(c)}.days, 0)) "
         f"+ to_microseconds(COALESCE({q(c)}.micros, 0)) END AS {q(c)}")
        if c in iv else q(c)
        for c in df.columns)

    def write_part(batch_iter):
        import os as _os
        import shutil as _shutil
        import tempfile as _tempfile
        import uuid as _uuid

        import duckdb as _duckdb
        import pyarrow as pa
        batches = [b for b in batch_iter]
        rows = sum(b.num_rows for b in batches)
        if rows == 0:
            return
        tbl = pa.Table.from_batches(batches)
        name = f"ducklake-{_uuid.uuid4()}.parquet"
        tmpdir = None
        if fs_uri is None:
            path = _os.path.join(base, name)
            _os.makedirs(base, exist_ok=True)
        else:
            tmpdir = _tempfile.mkdtemp(prefix="ducklake-iv-")
            path = _os.path.join(tmpdir, name)
        try:
            con = _duckdb.connect()
            try:
                con.register("__iv_batch", tbl)
                con.execute(
                    f"COPY (SELECT {cols_sql} FROM __iv_batch) "
                    f"TO '{path.replace(chr(39), chr(39) * 2)}' "
                    f"(FORMAT PARQUET)")
            finally:
                con.close()
            size = _os.path.getsize(path)
            with open(path, "rb") as f:
                f.seek(-8, 2)
                tail = f.read(8)
            if tail[4:] != b"PAR1":
                # a truncated/partial COPY output must fail loudly inside
                # the task, not register a garbage footer_size (matches
                # _footer_size_from_tail's magic check)
                raise IOError(
                    f"staged interval file {name!r} is not a complete "
                    f"parquet file (missing PAR1 magic)")
            footer = int.from_bytes(tail[:4], "little") + 8
            if fs_uri is not None:
                from pyarrow import fs as _pafs
                fs, inner = _pafs.FileSystem.from_uri(fs_uri)
                try:
                    fs.create_dir(inner, recursive=True)
                except Exception:
                    pass        # object stores have no real directories
                dest = inner.rstrip("/") + "/" + name
                with open(path, "rb") as src, \
                        fs.open_output_stream(dest) as out:
                    _shutil.copyfileobj(src, out, 1 << 20)
        finally:
            if tmpdir is not None:
                _shutil.rmtree(tmpdir, ignore_errors=True)
        yield pa.RecordBatch.from_pydict({
            "name": [name], "rows": [rows], "size": [size],
            "footer": [footer]})

    try:
        manifest = df.mapInArrow(
            write_part, "name string, rows long, size long, footer long"
        ).collect()
    except Exception as e:
        # NOT NULL violations raised by _enforce_not_null inside the
        # write job must surface as the engine's constraint error here
        # too, not as a raw executor exception (r9 review finding);
        # _raise_if_constraint re-raises everything else untouched
        _raise_if_constraint(e)
    return [r.asDict() for r in manifest]


def _insert_interval(session, writer, setup, table_meta, table_path,
                     out: DataFrame, iv_cols: list[str], commit_marker,
                     post_cols) -> int:
    """Insert tail for tables with INTERVAL columns: duckdb-backed
    executor staging (see _write_interval_distributed), then register
    the manifest in ONE transaction. The files carry no parquet field
    ids (duckdb's writer doesn't emit them), so they register under an
    identity name mapping — the same contract as cluster_by exports and
    add_files, which the scan already resolves by name; interval/time
    physical-read marks ride into mapped read schemas since r9."""
    manifest = _write_interval_distributed(out, table_path, iv_cols)
    live_names = [c.column_name for c in post_cols]
    n_rows = 0
    next_rowid = writer.next_row_id(table_meta.table_id)
    ids_by_name = {c.column_name: c.column_id for c in post_cols}
    with writer._txn():
        mid = writer.create_name_mapping(
            table_meta.table_id, live_names,
            [ids_by_name[n] for n in live_names])
        base = table_path[len("file://"):] \
            if table_path.startswith("file://") else table_path
        for row in sorted(manifest, key=lambda r: r["name"]):
            fid = writer.register_data_file(
                table_meta.table_id, setup.snapshot_id,
                DataFileInfo(path=row["name"], path_is_relative=True,
                             file_size_bytes=row["size"],
                             footer_size=row["footer"],
                             record_count=row["rows"],
                             row_id_start=next_rowid,
                             mapping_id=mid))
            # stats: interval FLBA min/max is non-UTF8 → stored NULL →
            # pruning keeps the file (same as the add_files path); the
            # other columns' stats register normally
            local_f = os.path.join(base, row["name"])
            if os.path.exists(local_f):
                from .types import is_geometry_type
                geo = {c.column_name for c in post_cols
                       if is_geometry_type(c.column_type)}
                writer.register_file_column_stats(
                    fid, table_meta.table_id,
                    column_stats_of(local_f, ids_by_name, geo))
            next_rowid += row["rows"]
            n_rows += row["rows"]
        if commit_marker is not None:
            writer.set_option(commit_marker[0], commit_marker[1])
    session.refresh()
    return n_rows


def partition_chains(session, handle, target: "int | None" = None,
                     adjacency: bool = True) -> list:
    """Groups for partition-aware maintenance: bucket live files by their
    exact partition-value tuple, chain files within each bucket capped
    at ``target`` bytes. ``adjacency=True`` additionally breaks a chain
    at every rowid gap (outputs register with contiguous row_id_start —
    the classic path); ``adjacency=False`` packs a whole bucket
    regardless of gaps (the upstream merge shape —
    compaction_partitioned_non_adjacent.test — whose outputs must carry
    rowids in-file). Returns only the groups worth rewriting: >1 member
    or delete debt."""
    pv_map = session.provider.get_file_partition_values(
        handle.meta.table_id)
    members = sorted(zip(handle._raw_files, handle.files),
                     key=lambda pr: pr[0].row_id_start)
    buckets: dict = {}
    for mf, rf in members:
        key = tuple(sorted(pv_map.get(mf.data_file_id, {}).items()))
        buckets.setdefault(key, []).append((mf, rf))
    groups = []
    for _key, bucket in sorted(buckets.items()):
        cur, cur_bytes = [], 0
        for mf, rf in bucket:
            sz = mf.file_size_bytes or 0
            adjacent = bool(cur) and (
                cur[-1][0].row_id_start + (cur[-1][0].record_count or 0)
                == mf.row_id_start)
            if cur and ((adjacency and not adjacent) or (
                    target is not None and cur_bytes + sz > target)):
                groups.append(cur)
                cur, cur_bytes = [], 0
            cur.append((mf, rf))
            cur_bytes += sz
        if cur:
            groups.append(cur)
    return [g for g in groups
            if len(g) > 1 or any(rf.delete_uri for _, rf in g)]


def group_is_contiguous(group: list) -> bool:
    """True when the group's member files form one gapless rowid chain
    (every member catalog-started)."""
    prev_end = None
    for mf, _rf in group:
        if mf.row_id_start is None:
            return False
        if prev_end is not None and mf.row_id_start != prev_end:
            return False
        prev_end = mf.row_id_start + (mf.record_count or 0)
    return True


def merge_groups_rowid_column(session, name: str, groups: list,
                              op: str = "merge_adjacent_files") -> int:
    """Merge arbitrary (non-contiguous) groups of a table's files into
    ONE output file per group, preserving BOTH virtual rowids and
    per-row snapshot_ids via the reserved in-file columns
    (row_id_start NULL) — the upstream merge contract for partitioned
    tables whose per-value files interleave in rowid order
    (sql/compaction/compaction_partitioned_non_adjacent.test: rowid AND
    snapshot_id survive the merge). Stage first, register in one
    maintenance transaction (orphans on crash, never corruption); the
    snapshot is labeled compacted_table so CDC stays silent."""
    from pyspark.sql import functions as F

    from .operators.dml import _stage_append
    from .sources.scan import scan_table

    handle = session.table_handle(name)
    tid = handle.meta.table_id
    data_cols = [c.column_name for c in handle.columns]
    col_ids = [c.column_id for c in handle.columns]
    geo_cols = {c.column_name for c in handle.columns
                if is_geometry_type(c.column_type)}
    staged_groups = []
    for group in groups:
        df = scan_table(session.spark, handle.spark_schema,
                        [rf for _mf, rf in group], with_virtual=True)
        df = df.select(*data_cols, "rowid",
                       F.col("snapshot_id").alias("__begin_snapshot"))
        staged_groups.append(_stage_append(
            session, handle, df, single_file=True,
            include_rowid=True, include_snapshot=True))

    writer = _catalog_writer(session)
    try:
        snap = writer.create_snapshot([f"compacted_table:{tid}"])
        n_rows = 0
        with writer._txn():
            mid = None
            if any(is_interval_type(c.column_type)
                   for c in handle.columns):
                # interval groups staged through the duckdb writer carry
                # no parquet field ids: register the identity name
                # mapping (same contract as _register_append /
                # _insert_interval) so a later column RENAME keeps
                # resolving instead of reading these rows as NULL
                mid = writer.create_name_mapping(tid, data_cols, col_ids)
            for group in groups:
                for mf, _rf in group:
                    writer.expect_live_delete(
                        mf.data_file_id,
                        mf.delete_file.delete_file_id
                        if mf.delete_file else None)
                    writer.end_delete_file(mf.data_file_id, snap)
                    writer.end_data_file(mf.data_file_id, snap)
            for staged in staged_groups:
                for final_name, size, footer, count, pvals, enc_key in \
                        staged:
                    if count == 0:
                        continue
                    fid = writer.register_data_file(
                        tid, snap,
                        DataFileInfo(path=final_name,
                                     path_is_relative=True,
                                     file_size_bytes=size,
                                     footer_size=footer,
                                     record_count=count,
                                     row_id_start=None,
                                     mapping_id=mid,
                                     encryption_key=enc_key))
                    if pvals:
                        writer.register_file_partition_values(
                            fid, tid, pvals)
                    local = _local_readable(handle.table_path, final_name)
                    if local is not None and enc_key is None:
                        writer.register_file_column_stats(
                            fid, tid,
                            column_stats_of(
                                local, dict(zip(data_cols, col_ids)),
                                geo_cols))
                    n_rows += count
        session.refresh()
        return n_rows
    finally:
        writer.close()


def rewrite_data_files(session, name: str, max_runs: int = 512,
                       delete_threshold: "float | None" = None) -> int:
    """Selective MOR-debt rewrite — the corpus's
    ``CALL ducklake_rewrite_data_files`` (sql/rewrite_data_files/):
    rewrite ONLY the data files carrying a live delete file; clean files
    keep their catalog registration untouched. ``delete_threshold``
    further gates on the deleted fraction (catalog delete_count /
    record_count — no file reads), skipping barely-dirty files whose
    rewrite would cost more I/O than the debt it retires. At 100 TB the
    cost is proportional to the DIRTY byte count above the threshold,
    never the table size (compact() rewrites everything). Each dirty
    file is its own group — see rewrite_file_groups for the mechanism."""
    handle = session.table_handle(name)
    pairs = [(mf, rf) for mf, rf in zip(handle._raw_files, handle.files)
             if rf.delete_uri is not None]
    if delete_threshold is not None and delete_threshold > 0:
        def _frac(mf):
            dc = mf.delete_file.delete_count if mf.delete_file else None
            if dc is None or not mf.record_count:
                return 1.0      # unknown debt: rewrite (conservative)
            return dc / mf.record_count
        pairs = [p for p in pairs if _frac(p[0]) >= delete_threshold]
    if not pairs:
        return 0
    # rowid-in-file members (row_id_start NULL — gapped-merge outputs)
    # can't re-register as contiguous runs; their surviving rows rewrite
    # through the rowid-column path instead, one group per dirty file
    started = [p for p in pairs if p[0].row_id_start is not None]
    infile = [p for p in pairs if p[0].row_id_start is None]
    from .types import is_interval_type
    if any(is_interval_type(c.column_type) for c in handle.columns):
        # interval rewrites must stage through the duckdb writer (the
        # run path's Spark writer can't emit INTERVAL) — the rowid-
        # column route preserves ids in-file for both member kinds
        infile, started = started + infile, []
    n = 0
    if started:
        n += rewrite_file_groups(session, name, [[p] for p in started],
                                 max_runs=max_runs,
                                 op="rewrite_data_files")
    if infile:
        n += merge_groups_rowid_column(session, name,
                                       [[p] for p in infile],
                                       op="rewrite_data_files")
    return n


def rewrite_file_groups(session, name: str, groups: list,
                        max_runs: int = 512,
                        op: str = "rewrite_file_groups") -> int:
    """Rewrite arbitrary GROUPS of a table's files in one snapshot.

    ``groups``: list of lists of ``(DataFileMeta, ResolvedFile)`` pairs.
    Every member file (and its delete file) is ended; the surviving rows
    re-register as contiguous-rowid runs — runs MERGE across adjacent
    members within a group (that is what makes ducklake_merge_adjacent's
    target_file_size packing produce one output file per group), never
    across groups. Files outside the groups keep their exact catalog
    registration. Scan + run discovery touch only the group members and
    their delete parquets."""
    from pyspark.sql import functions as F

    from .sources.scan import scan_table

    handle = session.table_handle(name)
    from .types import is_interval_type
    if any(is_interval_type(c.column_type) for c in handle.columns):
        # defense in depth (r9 review): this path writes via Spark's
        # parquet writer, which would silently re-store INTERVAL as a
        # plain struct and make the table unreadable — interval groups
        # must route through merge_groups_rowid_column (duckdb staging),
        # as compact/merge_adjacent/rewrite_data_files now do
        from .errors import UnsupportedType
        raise UnsupportedType(
            f"{op}: interval file groups must rewrite through the "
            "rowid-column path (merge_groups_rowid_column)")
    if handle.inlined_tables and handle.inlined_rows():
        raise InvalidConfig(
            f"{op} over tables with live inlined data rows "
            "is not supported — call flush_inlined_data() first")
    pairs = [m for g in groups for m in g]
    if not pairs:
        return 0
    if any(rf.encryption_key is not None for _, rf in pairs):
        raise InvalidConfig(
            f"{op} over encrypted tables is not supported — "
            "compact(preserve_rowids=False) rewrites encrypted")
    if any(mf.row_id_start is None for mf, _ in pairs):
        raise InvalidConfig(
            f"{op} needs row_id_start on every rewritten file — "
            "compact(preserve_rowids=False) renumbers instead")

    # survivor runs per member, carved and merged within each group
    # executor-side (_survivor_run_df) — the driver receives at most
    # max_runs+1 run rows, never delete positions
    base = os.path.basename
    file_rows = [(base(mf.path), gi, mf.row_id_start, mf.record_count)
                 for gi, group in enumerate(groups) for mf, _rf in group]
    dirty_pairs = [(rf.delete_uri, base(mf.path))
                   for _gi, group in enumerate(groups)
                   for mf, rf in group if rf.delete_uri is not None]
    rows = (_survivor_run_df(session, file_rows, dirty_pairs)
            .orderBy("__grp", "start").limit(max_runs + 1).collect())
    if len(rows) > max_runs:
        raise InvalidConfig(
            f"{op}: {name} shatters into more than {max_runs} "
            f"rowid runs; use compact()")
    run_list: list[tuple[int, int]] = [(r["start"], r["cnt"]) for r in rows]
    run_group: list[int] = [r["__grp"] for r in rows]

    tid = handle.meta.table_id
    writer = _catalog_writer(session)
    try:
        # maintenance marker, not a data change: CDC (operators/cdc.py)
        # skips compacted_table snapshots so a rewrite never re-reports
        # rows as inserted/deleted (upstream table_changes is silent
        # across compaction too)
        snap = writer.create_snapshot([f"compacted_table:{tid}"])
        if not run_list:
            # every row of every member file was deleted: just end them
            with writer._txn():
                for mf, _rf in pairs:
                    writer.expect_live_delete(
                        mf.data_file_id,
                        mf.delete_file.delete_file_id
                        if mf.delete_file else None)
                    writer.end_delete_file(mf.data_file_id, snap)
                    writer.end_data_file(mf.data_file_id, snap)
            session.refresh()
            return 0

        runs = [(i, s, c) for i, (s, c) in enumerate(run_list)]
        df = scan_table(session.spark, handle.spark_schema,
                        [rf for _, rf in pairs], with_rowid=True)
        ranges = session.spark.createDataFrame(
            [(i, s, s + c - 1) for i, s, c in runs],
            "__run LONG, __lo LONG, __hi LONG")
        df2 = (df.join(F.broadcast(ranges),
                       (F.col("rowid") >= F.col("__lo"))
                       & (F.col("rowid") <= F.col("__hi")))
               .drop("__lo", "__hi"))

        table_path = handle.table_path
        session.spark.conf.set("spark.sql.parquet.fieldId.write.enabled",
                               "true")
        data_cols = [c.column_name for c in handle.columns]
        col_ids = [c.column_id for c in handle.columns]
        out = (df2.repartition("__run").sortWithinPartitions("rowid")
               .select(*data_cols, "__run"))
        out = _with_field_ids_partial(
            out, data_cols, col_ids,
            [dict(c.nested_ids or ()) for c in handle.columns])
        staging = table_path.rstrip("/") + f"/stage-{uuid.uuid4().hex}"
        schema_name, _tbl = session._split(name)
        schema_meta = session.provider.get_schema_by_name(schema_name, snap)
        wopts = _parquet_write_options(session, schema_meta.schema_id, tid)
        (out.write.options(**wopts).partitionBy("__run")
         .parquet(staging, mode="errorifexists"))
        staged = _finalize_compact_runs(session, staging, table_path, runs)

        geo_cols = {c.column_name for c in handle.columns
                    if is_geometry_type(c.column_type)}
        # partition-value carry (sql/compaction/compaction_partitioned_
        # table shape): a rewritten file inherits its group's exact
        # partition values when every member agrees — maintenance never
        # degrades partition pruning on partitioned tables. Mixed groups
        # (only possible via a caller that packs across partitions) get
        # no values, which is correct-but-unpruned.
        pv_map = session.provider.get_file_partition_values(tid)
        group_pv: list = []
        for group in groups:
            pvs = [pv_map.get(mf.data_file_id, {}) for mf, _rf in group]
            group_pv.append(sorted(pvs[0].items())
                            if pvs[0] and all(d == pvs[0] for d in pvs)
                            else None)
        n_rows = 0
        with writer._txn():
            for mf, _rf in pairs:
                # optimistic concurrency: the runs were computed from
                # THIS delete state; a concurrent DML aborts the rewrite
                writer.expect_live_delete(
                    mf.data_file_id,
                    mf.delete_file.delete_file_id
                    if mf.delete_file else None)
                writer.end_delete_file(mf.data_file_id, snap)
                writer.end_data_file(mf.data_file_id, snap)
            for ri, ((run_id, start, cnt), (final_name, size, footer)) in \
                    enumerate(zip(runs, staged)):
                fid = writer.register_data_file(
                    tid, snap,
                    DataFileInfo(path=final_name, path_is_relative=True,
                                 file_size_bytes=size, footer_size=footer,
                                 record_count=cnt, row_id_start=int(start)))
                if group_pv[run_group[ri]]:
                    writer.register_file_partition_values(
                        fid, tid, group_pv[run_group[ri]])
                local = _local_readable(table_path, final_name)
                if local is not None:
                    writer.register_file_column_stats(
                        fid, tid,
                        column_stats_of(local, dict(zip(data_cols,
                                                        col_ids)),
                                        geo_cols))
                n_rows += cnt
        session.refresh()
        return n_rows
    finally:
        writer.close()


def _finalize_compact_runs(session, staging: str, table_path: str,
                           runs: list[tuple[int, int, int]]
                           ) -> list[tuple[str, int, int]]:
    """Move each ``__run=N`` directory's single part file to a UUID name
    in the table dir; returns [(final_name, size, footer)] aligned with
    ``runs``. Scheme'd table paths (file:// s3a:// hdfs:// ...) go through
    the Hadoop FS API with row counts from one distributed footer job —
    the driver never downloads file contents; bare local paths take the
    direct os/pyarrow route."""
    out = []
    if "://" in table_path:
        from pyspark.sql import functions as F  # noqa: F401
        fs = _HadoopFs(session.spark, table_path)
        counts = {int(r["__run"]): int(r["count"])
                  for r in (session.spark.read.parquet(staging)
                            .groupBy("__run").count().collect())}
        for run_id, _start, cnt in runs:
            run_dir = staging.rstrip("/") + f"/__run={run_id}"
            parts = [p for p in sorted(fs.list_names(run_dir))
                     if p.endswith(".parquet")]
            assert len(parts) == 1, \
                f"run {run_id} produced {len(parts)} files"
            assert counts.get(run_id, 0) == cnt, \
                f"run {run_id}: staged {counts.get(run_id, 0)} rows, " \
                f"expected {cnt}"
            final_name = f"ducklake-{uuid.uuid4()}.parquet"
            final_path = table_path.rstrip("/") + "/" + final_name
            fs.rename(run_dir + "/" + parts[0], final_path)
            out.append((final_name, fs.size(final_path),
                        _footer_size_from_tail(fs.tail(final_path, 8),
                                               final_path)))
        fs.delete(staging, recursive=True)
        return out
    import shutil

    import pyarrow.parquet as pq
    for run_id, _start, cnt in runs:
        run_dir = os.path.join(staging, f"__run={run_id}")
        parts = [p for p in sorted(os.listdir(run_dir))
                 if p.endswith(".parquet")]
        assert len(parts) == 1, f"run {run_id} produced {len(parts)} files"
        final_name = f"ducklake-{uuid.uuid4()}.parquet"
        final_path = os.path.join(table_path, final_name)
        os.rename(os.path.join(run_dir, parts[0]), final_path)
        assert pq.read_metadata(final_path).num_rows == cnt
        out.append((final_name, os.path.getsize(final_path),
                    footer_size_of(final_path)))
    shutil.rmtree(staging)
    return out


def _with_field_ids_partial(df: DataFrame, data_cols: list[str],
                            column_ids: list[int],
                            nested: Optional[list] = None) -> DataFrame:
    """Stamp field ids on the data columns, pass helper columns through.
    ``nested``: per-column nested-id maps parallel to data_cols (see
    _with_field_ids)."""
    from pyspark.sql import functions as F
    from .types import annotate_nested_ids
    ids = dict(zip(data_cols, column_ids))
    nmaps = dict(zip(data_cols, nested)) if nested else {}
    cols = []
    for f in df.schema.fields:
        if f.name not in ids:
            cols.append(F.col(f.name))
            continue
        c = F.col(f.name)
        if nmaps.get(f.name):
            c = c.cast(annotate_nested_ids(f.dataType, (),
                                           dict(nmaps[f.name])))
        cols.append(c.alias(f.name, metadata={**(f.metadata or {}),
                                              "parquet.field.id": ids[f.name]}))
    return df.select(*cols)


_INLINABLE_SPARK_TYPES = ("IntegerType", "LongType", "ShortType",
                          "ByteType", "DoubleType", "FloatType",
                          "StringType", "BooleanType", "DateType",
                          "TimestampType", "TimestampNTZType",
                          "DecimalType")


def _try_inline_append(session, writer, setup, table_id: int,
                       df: DataFrame, not_null: list[str]):
    """Inline the append into the catalog DB when at or under the
    data_inlining_row_limit option; returns the row count, or None to
    take the parquet path."""
    import datetime
    import decimal

    limit_s = session.provider.get_option("data_inlining_row_limit")
    if not limit_s:
        return None
    try:
        limit = int(limit_s)
    except ValueError:
        return None
    if limit <= 0:
        return None
    if not all(type(f.dataType).__name__ in _INLINABLE_SPARK_TYPES
               for f in df.schema.fields):
        return None
    sample = df.limit(limit + 1).collect()
    if len(sample) > limit:
        return None                      # big append: parquet path

    def store(v):
        if isinstance(v, (datetime.datetime, datetime.date)):
            return v.isoformat(sep=" ") if isinstance(
                v, datetime.datetime) else v.isoformat()
        if isinstance(v, decimal.Decimal):
            return str(v)
        return v

    names = [f.name for f in df.schema.fields]
    for row in sample:
        for c in not_null:
            if row[c] is None:
                raise InvalidConfig(
                    f'NOT NULL constraint violated: column "{c}" '
                    "contains NULL")
    cols = session.provider.get_table_columns(table_id, setup.snapshot_id)
    type_by_name = {c.column_name: c.column_type for c in cols}
    writer.insert_inlined_rows(
        table_id, setup.snapshot_id, names,
        [type_by_name.get(n, "varchar") for n in names],
        [tuple(store(row[n]) for n in names) for row in sample])
    return len(sample)


def create_or_insert(session, name: str, df: DataFrame, mode: str,
                     single_file: bool = True, if_exists: str = "error",
                     commit_marker: tuple[str, str] | None = None,
                     maintenance: bool = False,
                     replace_definition: bool = False) -> int:
    """Returns the number of rows written (the reference returns a 1-row
    count batch; insert_exec.rs:24-31). ``commit_marker``: a
    (metadata key, value) recorded in the SAME catalog transaction as
    the file registrations — the streaming sink's exactly-once anchor."""
    schema_name, table_name = session._split(name)
    writer = _catalog_writer(session)
    try:
        write_mode = WriteMode.REPLACE if mode == "overwrite" else WriteMode.APPEND

        if mode == "create" and if_exists == "error":
            snap = session.provider.get_current_snapshot()
            schema_meta = session.provider.get_schema_by_name(schema_name, snap)
            if schema_meta is not None and session.provider.table_exists(
                    schema_meta.schema_id, table_name, snap):
                raise InvalidConfig(f"Table already exists: {name}")

        # 1) one catalog transaction: snapshot + schema/table/columns
        #    (+ end files on overwrite)
        setup = writer.begin_write_transaction(
            schema_name, table_name, _column_defs(df.schema), write_mode,
            maintenance=maintenance, replace_definition=replace_definition)

        # 2) stage parquet to the table's data directory (executor-side)
        resolver = session.catalog.resolver
        schema_meta = session.provider.get_schema_by_name(
            schema_name, setup.snapshot_id)
        table_meta = session.provider.get_table_by_name(
            schema_meta.schema_id, table_name, setup.snapshot_id)
        schema_path = resolver.schema_path(
            schema_meta.path, schema_meta.path_is_relative)
        table_path = resolver.table_path(
            schema_path, table_meta.path, table_meta.path_is_relative)

        session.spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
        # Constraint set: ALWAYS the post-setup catalog columns. For
        # append that is the table's preserved constraints; for create
        # it equals the input schema's nullability (the columns came
        # from it); for REPLACE it includes any NOT NULL the writer
        # restored onto type-unchanged columns (a data overwrite keeps
        # declared constraints — and they are enforced here against the
        # new data, so the restoration can never record a violated
        # constraint).
        post_cols = session.provider.get_table_columns(
            table_meta.table_id, setup.snapshot_id)
        not_null = [c.column_name for c in post_cols
                    if not c.nulls_allowed]
        # Write-side data inlining (sql/data_inlining/ corpus): appends at
        # or under data_inlining_row_limit store their rows IN the catalog
        # DB instead of parquet — DuckDB's DATA_INLINING_ROW_LIMIT
        # behavior. limit(n+1) terminates early on big inputs, so large
        # appends pay at most a truncated scan before taking the parquet
        # path; simple scalar columns only (arrays/structs/binary fall
        # through to parquet).
        if write_mode == WriteMode.APPEND:
            # reentrant txn: the inline rows and the streaming sink's
            # batch marker commit atomically (same guarantee as the
            # parquet registration path)
            with writer._txn():
                n_inlined = _try_inline_append(session, writer, setup,
                                               table_meta.table_id, df,
                                               not_null)
                if n_inlined is not None and commit_marker is not None:
                    writer.set_option(commit_marker[0], commit_marker[1])
            if n_inlined is not None:
                session.refresh()
                return n_inlined

        out = _with_field_ids(_enforce_not_null(df, not_null),
                              setup.column_ids, setup.nested_ids)
        if single_file:
            # target_file_size (sql/insert/insert_file_size.test): a
            # large insert splits into ~target-sized files instead of one
            # coalesced file. Catalyst's plan-stats sizeInBytes is the
            # split estimate — no extra job; in-memory row width
            # overestimates the compressed parquet, so the split errs
            # toward MORE files, never a too-big one.
            target_raw = session.provider.get_scoped_option(
                "target_file_size", schema_meta.schema_id,
                table_meta.table_id)
            n_out = 1
            if target_raw:
                target = session._parse_size(target_raw)
                try:
                    est = int(str(out._jdf.queryExecution()
                                  .optimizedPlan().stats().sizeInBytes()))
                except Exception:
                    est = 0
                if est > 0 and target > 0:
                    n_out = max(1, min(4096, -(-est // target)))
            # per_thread_output (sql/settings/per_thread_output.test):
            # keep the plan's write parallelism — one file per Spark
            # partition instead of a coalesced single file. The
            # scale-friendly shape for bulk loads; off by default to
            # match DuckLake's one-file-per-insert contract.
            per_thread = (session.provider.get_scoped_option(
                "per_thread_output", schema_meta.schema_id,
                table_meta.table_id) or "").lower() in ("true", "1")
            if per_thread and n_out <= 1:
                pass                        # plan parallelism untouched
            else:
                out = (out.repartition(n_out) if n_out > 1
                       else out.coalesce(1))

        # Partition spec (sql/partitioning/ corpus): split the insert by
        # the live spec's columns. The partition columns are DUPLICATED
        # into __part_<i> staging keys so the data files stay
        # self-contained (partitionBy drops its keys from file contents;
        # DuckLake files must carry every column).
        from pyspark.sql import functions as F
        id_to_name = {cid: fname for fname, cid in
                      zip([f.name for f in df.schema.fields],
                          setup.column_ids)}
        spec = session.provider.get_partition_columns(
            table_meta.table_id, setup.snapshot_id)
        part_keys = _partition_keys(spec, id_to_name)

        from .types import is_interval_type
        iv_cols = [c.column_name for c in post_cols
                   if is_interval_type(c.column_type)]
        if iv_cols:
            # INTERVAL columns: duckdb-backed executor staging emits the
            # parquet INTERVAL logical type df.write/pyarrow cannot (r9;
            # see _write_interval_distributed). Encrypted and partitioned
            # combinations stay refused — PME-writing the struct would
            # silently change the physical contract, and the partition
            # staging machinery is not carried by this path.
            if (session.provider.get_option("encrypted") or "").lower() \
                    in ("true", "1"):
                raise InvalidConfig(
                    "INTERVAL columns in an encrypted catalog are not "
                    "writable (the PME writer cannot emit the parquet "
                    "INTERVAL logical type)")
            if part_keys:
                raise InvalidConfig(
                    "INSERT into a partitioned table with INTERVAL "
                    "columns is not supported")
            return _insert_interval(session, writer, setup, table_meta,
                                    table_path, out, iv_cols,
                                    commit_marker, post_cols)

        if (session.provider.get_option("encrypted") or "").lower() \
                in ("true", "1"):
            # ENCRYPTED catalog (sql/encryption/ corpus): every data file
            # is PME-encrypted with its own random key, recorded in
            # ducklake_data_file.encryption_key. Written executor-side.
            return _insert_encrypted(session, writer, setup, table_meta,
                                     table_path, out, df, commit_marker,
                                     part_keys=part_keys)

        staging = table_path.rstrip("/") + f"/stage-{uuid.uuid4().hex}"
        wopts = _parquet_write_options(
            session, schema_meta.schema_id, table_meta.table_id)
        try:
            if part_keys:
                for i, (base, tf, _dk) in enumerate(part_keys):
                    out = out.withColumn(f"{_PART_PREFIX}{i}",
                                         _partition_expr(base, tf))
                (out.write.options(**wopts)
                 .partitionBy([f"{_PART_PREFIX}{i}"
                               for i in range(len(part_keys))])
                 .parquet(staging, mode="errorifexists"))
            else:
                out.write.options(**wopts).parquet(staging,
                                                   mode="errorifexists")
        except Exception as e:
            _raise_if_constraint(e)

        # 3) move part files to UUID names in the table dir (hive-style
        #    subdirs for partitioned tables) and register each in the
        #    catalog (multi-file snapshot) with its partition values.
        #    Scheme'd paths go through the Hadoop FS API (object-store-
        #    capable); bare local paths take the direct os/pyarrow route.
        if part_keys:
            dir_keys = [dk for _b, _t, dk in part_keys]
            hive = _hive_file_pattern(session, table_meta.table_id,
                                      schema_meta.schema_id)
            if "://" in table_path:
                staged = _finalize_partitioned_hadoop(
                    session.spark, staging, table_path, dir_keys,
                    hive_dirs=hive)
            else:
                staged = _finalize_partitioned_local(
                    staging, table_path, dir_keys, hive_dirs=hive)
        elif "://" in table_path:
            staged = [(*s, None) for s in
                      _finalize_hadoop(session.spark, staging, table_path)]
        else:
            staged = [(*s, None) for s in
                      _finalize_local(staging, table_path)]

        n_rows = 0
        next_rowid = writer.next_row_id(table_meta.table_id)
        col_ids = dict(zip([f.name for f in df.schema.fields],
                           setup.column_ids))
        _cat_cols = session.provider.get_table_columns(
            table_meta.table_id, setup.snapshot_id)
        # nested leaves (list element / map value / struct fields) get
        # their own stats rows keyed by field id, like top-level columns
        col_ids.update(nested_stats_ids(_cat_cols))
        geo_cols = {c.column_name for c in _cat_cols
                    if is_geometry_type(c.column_type)}
        # ONE catalog transaction for the whole registration (reentrant
        # _txn): either every staged file becomes visible or none — and
        # the streaming sink's batch marker commits atomically with the
        # files it covers (exactly-once under foreachBatch replays).
        with writer._txn():
            for final_name, size, footer, count, pvals in staged:
                fid = writer.register_data_file(
                    table_meta.table_id, setup.snapshot_id,
                    DataFileInfo(path=final_name, path_is_relative=True,
                                 file_size_bytes=size, footer_size=footer,
                                 record_count=count,
                                 row_id_start=next_rowid))
                if pvals:
                    writer.register_file_partition_values(
                        fid, table_meta.table_id, pvals)
                local = _local_readable(table_path, final_name)
                if local is not None:
                    writer.register_file_column_stats(
                        fid, table_meta.table_id,
                        column_stats_of(local, col_ids, geo_cols))
                next_rowid += count
                n_rows += count
            if commit_marker is not None:
                writer.set_option(commit_marker[0], commit_marker[1])

        session.refresh()
        return n_rows
    finally:
        writer.close()
