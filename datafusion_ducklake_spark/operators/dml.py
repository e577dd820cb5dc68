"""DML beyond INSERT: DELETE / UPDATE / MERGE INTO over DuckLake tables
(merge-on-read).

The reference's own write surface stops at INSERT (src/insert_exec.rs);
the positional-delete files it READS (src/delete_filter.rs) are produced
by DuckDB's ducklake extension. This module emits exactly those artifacts
— a CUMULATIVE positional-delete parquet ``(file_path, pos)`` per touched
data file, registered with supersedence
(metadata/writer.register_delete_file, mirroring SQL_GET_DATA_FILES'
per-snapshot LEFT JOIN semantics) — so this engine's DML output reads
back identically from DuckDB. Corpus parity: sql/delete/, sql/update/,
sql/merge/ in the reference's vendored sqllogictests.

Scale shape (100 TB discipline):
- match: ONE declarative scan with the file basename + ``row_index``
  attached; existing delete positions are anti-joined away; the predicate
  is pushed into the parquet scan by Catalyst. No driver-side row
  movement.
- write: matched positions group by file; each task writes its file's
  cumulative delete parquet via pyarrow.fs (executor-side, object-store
  capable) and returns a ONE-ROW manifest. Only the manifest reaches the
  driver (O(touched files), never O(rows)).
- register: one snapshot carries the delete registrations plus any
  appended data files. UPDATE keeps rowids STABLE (the DuckLake
  contract, sql/rowid/ducklake_row_id_update.test): rewritten rows carry
  their original ids as the reserved in-file rowid column and the new
  file registers with row_id_start NULL; MERGE and non-preservable
  tables (encrypted, foreign fixtures without starts) append with fresh
  ids.
"""

from __future__ import annotations

import os
import uuid
from functools import reduce
from typing import Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..errors import InvalidConfig, MergeActionError
from ..metadata.writer import DataFileInfo
from ..sources.scan import (_configure_fieldid_read, _read_parquet,
                            _split_by_field_ids)
from ..table_writer import (_catalog_writer, _enforce_not_null,
                            _finalize_hadoop, _finalize_local,
                            _local_readable, _raise_if_constraint,
                            _with_field_ids, column_stats_of)

FILE_COL = "__ducklake_dml_file"
POS_COL = "__ducklake_dml_pos"

NEW_COL = "__ducklake_dml_new"

_MANIFEST_SCHEMA = ("file_name string, delete_name string, "
                    "cum_count long, new_count long, size long, "
                    "enc_key string")


def _as_condition(condition: Union[str, Column, None]) -> Column:
    if condition is None:
        return F.lit(True)
    return F.expr(condition) if isinstance(condition, str) else condition


def _require_no_inlined(handle) -> None:
    if handle.inlined_tables and handle.inlined_rows():
        raise InvalidConfig(
            "DML over tables with live inlined data rows is not supported "
            "— call flush_inlined_data() first (positional deletes only "
            "address parquet rows)")


def _match_inlined(handle, condition, using: Optional[DataFrame] = None,
                   target_alias: Optional[str] = None
                   ) -> Optional[DataFrame]:
    """Matched LIVE inlined rows (rowid + data columns) for a DML
    predicate, or None when the table has none. Inlined sets are bounded
    by the inlining row limit, so driver-side handling is the right cost
    shape (corpus: sql/data_inlining/data_inlining_delete.test — DELETE/
    UPDATE work directly over inlined rows, no flush required)."""
    if not (handle.inlined_tables and handle.inlined_rows()):
        return None
    base = handle._inlined_df(with_rowid=True)
    if base is None:
        return None
    if using is not None:
        lv = base.alias(target_alias) if target_alias else base
        return lv.join(using, _as_condition(condition), "left_semi")
    return base.filter(_as_condition(condition))


def rowids_preservable(handle) -> bool:
    """True when every live parquet file can yield exact rowids (a
    catalog row_id_start, or the explicit in-file row_id column of an
    UPDATE-rewritten file) — the precondition for keeping rowids stable
    through UPDATE (sql/rowid/ducklake_row_id_update.test)."""
    from ..sources.scan import file_has_rowid_column
    for f in handle.files:
        if f.encryption_key is not None:
            return False    # PME rewrite path renumbers (documented)
        if f.row_id_start is None and not file_has_rowid_column(f.data_uri):
            return False
    return True


def _live_with_filepos(session, handle, with_rowid: bool = False
                       ) -> DataFrame:
    """The table's LIVE rows (existing deletes applied) with the data file
    basename and file-local position attached. PARQUET rows only — callers
    handle inlined rows via _match_inlined. ``with_rowid`` (callers must
    have checked rowids_preservable) additionally attaches each row's
    exact rowid: start+pos for catalog-started files, the in-file column
    for UPDATE-rewritten ones."""
    from ..sources.scan import ROWID_FILE_COL, file_has_rowid_column
    _configure_fieldid_read(session.spark)
    files = handle.files
    encd = [f for f in files if f.encryption_key is not None]
    files = [f for f in files if f.encryption_key is None]
    ridcol = [f for f in files if with_rowid and f.row_id_start is None
              and f.mapped_cols is None
              and file_has_rowid_column(f.data_uri)]
    _ridcol_uris = {f.data_uri for f in ridcol}
    files = [f for f in files if f.data_uri not in _ridcol_uris]
    plain = [f for f in files if f.mapped_cols is None]
    mapped = [f for f in files if f.mapped_cols is not None]
    parts = []
    if ridcol:
        from pyspark.sql import types as T
        rid_schema = T.StructType(
            list(handle.spark_schema.fields)
            + [T.StructField(ROWID_FILE_COL, T.LongType(), True)])
        # tri-level footer probe, same as scan_table: an UPDATE-rewritten
        # file written by Spark carries field ids, but a duckdb-staged
        # rewrite of an INTERVAL table (r9) carries none — reading the
        # id-stamped schema over an id-less file returns NULL columns
        for group_schema, group in _split_by_field_ids(rid_schema, ridcol):
            df = _read_parquet(session.spark, group_schema,
                               [f.data_uri for f in group])
            parts.append(
                df.withColumnRenamed(ROWID_FILE_COL, "__rid_file")
                .withColumn(
                    FILE_COL,
                    F.element_at(F.split(
                        F.col("_metadata.file_path"), "/"), -1))
                .withColumn(POS_COL, F.col("_metadata.row_index")))
    if encd:
        # encrypted data files: executor-side PME decode with positions
        # (sql/encryption/ corpus — DELETE over an ENCRYPTED catalog)
        from pyspark.sql import types as T

        from ..sources.encryption import decode_with_positions
        out_schema = T.StructType(
            list(handle.spark_schema.fields)
            + [T.StructField(POS_COL, T.LongType(), False),
               T.StructField(FILE_COL, T.StringType(), False)])
        parts.append(decode_with_positions(
            session.spark,
            [(f.data_uri, f.encryption_key,
              f.data_uri.rsplit("/", 1)[-1]) for f in encd],
            out_schema))
    for group_schema, group in _split_by_field_ids(handle.spark_schema,
                                                   plain):
        df = _read_parquet(session.spark, group_schema,
                           [f.data_uri for f in group])
        parts.append(df.withColumn(
            FILE_COL,
            F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1)
        ).withColumn(POS_COL, F.col("_metadata.row_index")))
    if mapped:
        # name-mapped add_files tables (renames / hive injection): apply
        # the mapping so DML conditions see the LIVE column names
        from pyspark.sql import types as T

        from ..sources.scan import (_era_clip_type, _mark_metadata,
                                    apply_mapping)
        types = {f.name: f.dataType
                 for f in handle.spark_schema.fields}
        marks = {f.name: _mark_metadata(f)
                 for f in handle.spark_schema.fields}
        groups: dict[tuple, list] = {}
        for f in mapped:
            clipped = {dst: _era_clip_type(types[dst], f.begin_snapshot)
                       for _src, dst in f.mapped_cols}
            eff = tuple((src, dst) for src, dst in f.mapped_cols
                        if clipped[dst] is not None)
            from ..sources.scan import _strip_nested_metadata
            rs = T.StructType([T.StructField(
                src, _strip_nested_metadata(clipped[dst]), True,
                metadata=marks[dst])
                for src, dst in eff])
            groups.setdefault(
                (eff, f.hive_values or (), rs.simpleString()),
                [rs, []])[1].append(f)
        for (mcols, hive, _sig), (read_schema, group) in sorted(
                groups.items(), key=lambda kv: repr(kv[0])):
            df = (_read_parquet(session.spark, read_schema,
                                [f.data_uri for f in group])
                  .withColumn(FILE_COL,
                              F.element_at(
                                  F.split(F.col("_metadata.file_path"),
                                          "/"), -1))
                  .withColumn(POS_COL, F.col("_metadata.row_index")))
            hive_lits = tuple((h[0], h[2]) for h in hive)
            parts.append(apply_mapping(df, handle.spark_schema, mcols,
                                       hive_lits, [FILE_COL, POS_COL]))
    if not parts:
        # every live row is inlined (or the table is empty): the parquet
        # half of the DML matches nothing
        from pyspark.sql import types as T
        empty_schema = T.StructType(
            list(handle.spark_schema.fields)
            + [T.StructField(FILE_COL, T.StringType(), True),
               T.StructField(POS_COL, T.LongType(), True)]
            + ([T.StructField("rowid", T.LongType(), True)]
               if with_rowid else []))
        return session.spark.createDataFrame([], empty_schema)
    scanned = reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), parts) \
        if with_rowid else reduce(DataFrame.unionByName, parts)
    if with_rowid:
        if "__rid_file" not in scanned.columns:
            scanned = scanned.withColumn("__rid_file",
                                         F.lit(None).cast("long"))
        starts = [(f.data_uri.rsplit("/", 1)[-1], f.row_id_start)
                  for f in plain + mapped if f.row_id_start is not None]
        if starts:
            smap = session.spark.createDataFrame(
                starts, f"{FILE_COL} STRING, __rid_start LONG")
            scanned = scanned.join(F.broadcast(smap), FILE_COL, "left")
        else:
            scanned = scanned.withColumn("__rid_start",
                                         F.lit(None).cast("long"))
        scanned = (scanned.withColumn(
            "rowid",
            F.coalesce(F.col("__rid_file"),
                       (F.col("__rid_start") + F.col(POS_COL)).cast("long")))
            .drop("__rid_file", "__rid_start"))
    dels = _existing_deletes(session, handle)
    if dels is None:
        return scanned
    return scanned.join(dels, [FILE_COL, POS_COL], "left_anti")


def _existing_deletes(session, handle) -> Optional[DataFrame]:
    """(data file basename, pos) across all current delete files, or None.

    Keys deletes to their data file via the CATALOG pairing
    (delete-file name -> data-file name, joined on the delete parquet's
    own ``_metadata.file_path``) — never via the delete parquet's
    ``file_path`` COLUMN, which the DuckLake contract treats as
    documentation-only (ref: src/table.rs:84-85; a DuckDB- or
    Iceberg-style writer stores absolute paths/URIs there, and trusting
    it silently resurrects previously-deleted rows). Mirrors
    sources/scan._scan_dirty_grouped."""
    name_of = lambda uri: uri.rsplit("/", 1)[-1]  # noqa: E731
    enc_pairs = [(f.delete_uri, f.delete_encryption_key, f.data_uri)
                 for f in handle.files
                 if f.delete_uri is not None
                 and f.delete_encryption_key is not None]
    pairs = [(f.delete_uri, f.data_uri) for f in handle.files
             if f.delete_uri is not None
             and f.delete_encryption_key is None]
    enc_dels = None
    if enc_pairs:
        enc_dels = _decode_encrypted_deletes(
            session.spark, [(d, k, name_of(a)) for d, k, a in enc_pairs])
    if not pairs:
        return enc_dels
    if len({name_of(d) for d, _ in pairs}) != len(pairs):
        # non-unique delete basenames (never true for UUID-named files):
        # per-file branches with literal tags
        plain_dels = reduce(DataFrame.unionByName, (
            session.spark.read.parquet(d)
            .select(F.lit(name_of(a)).alias(FILE_COL),
                    F.col("pos").alias(POS_COL))
            for d, a in pairs))
    else:
        dels = (session.spark.read.parquet(*[d for d, _ in pairs])
                .select(F.element_at(
                    F.split(F.col("_metadata.file_path"), "/"),
                    -1).alias("__del_file"),
                    F.col("pos").alias(POS_COL)))
        pairing = session.spark.createDataFrame(
            [(name_of(d), name_of(a)) for d, a in pairs],
            f"`__del_file` STRING, `{FILE_COL}` STRING")
        plain_dels = (dels.join(F.broadcast(pairing), "__del_file")
                      .select(FILE_COL, POS_COL))
    if enc_dels is None:
        return plain_dels
    return plain_dels.unionByName(enc_dels)


def _decode_encrypted_deletes(spark, triples: list[tuple]) -> DataFrame:
    """(delete_uri, key, data-file basename) → (FILE_COL, POS_COL) rows,
    decrypted executor-side (encrypted-catalog DML: the existing delete
    files are PME parquet too)."""
    def decode(pdf_iter):
        import pandas as pd

        from ..sources.encryption import decode_key, read_encrypted_arrow
        for pdf in pdf_iter:
            for path, key, tag in zip(pdf["path"], pdf["key"], pdf["tag"]):
                tbl = read_encrypted_arrow(path, decode_key(key))
                out = pd.DataFrame({FILE_COL: tag,
                                    POS_COL: tbl.column("pos").to_pandas()})
                yield out

    pairs = spark.createDataFrame(
        triples, "path STRING, key STRING, tag STRING") \
        .repartition(max(len(triples), 1))
    return pairs.mapInPandas(decode,
                             f"`{FILE_COL}` STRING, `{POS_COL}` LONG")


def _pyarrow_dest(table_path: str):
    """(filesystem, base_dir) for executor-side pyarrow writes."""
    import pyarrow.fs as pafs
    p = table_path
    if p.startswith("file://"):
        p = p[len("file://"):]
    if "://" in p:
        if p.startswith("s3a://"):          # Spark scheme -> pyarrow scheme
            p = "s3://" + p[len("s3a://"):]
        fs, base = pafs.FileSystem.from_uri(p)
        return fs, base
    return pafs.LocalFileSystem(), p


def _write_delete_parquets(spark, cumulative: DataFrame,
                           table_path: str,
                           encrypt: bool = False) -> list:
    """Write one cumulative delete parquet per TOUCHED file from the
    executors; returns the collected manifest rows (O(files)).

    ``cumulative`` carries every candidate position tagged with NEW_COL
    (1 = newly matched this DML, 0 = carried over from an existing delete
    file). Groups with no new positions are untouched files — no write,
    no manifest row — so the manifest's ``new_count`` sum IS the matched-
    row count and no separate .count() action (a second execution of the
    match join) is ever needed."""

    def write_group(pdf):
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq
        new_count = int(pdf[NEW_COL].sum())
        if new_count == 0:
            return pd.DataFrame({
                "file_name": pd.Series(dtype="object"),
                "delete_name": pd.Series(dtype="object"),
                "cum_count": pd.Series(dtype="int64"),
                "new_count": pd.Series(dtype="int64"),
                "size": pd.Series(dtype="int64"),
                "enc_key": pd.Series(dtype="object")})
        fname = pdf[FILE_COL].iloc[0]
        positions = sorted(int(p) for p in pdf[POS_COL].tolist())
        fs, base = _pyarrow_dest(table_path)
        try:
            # the table dir may not exist yet: a table populated only
            # via add_files (absolute external paths) never had a data
            # write create it. Idempotent; object stores have no dirs.
            fs.create_dir(base, recursive=True)
        except Exception:
            pass
        name = f"ducklake-delete-{uuid.uuid4()}.parquet"
        dest = base.rstrip("/") + "/" + name
        tbl = pa.table({
            "file_path": pa.array([fname] * len(positions), pa.string()),
            "pos": pa.array(positions, pa.int64())})
        enc_key = None
        if encrypt:
            # encrypted catalog: delete files are PME parquet too
            # (sql/encryption/encryption.test asserts *-del*.parquet
            # is unreadable as plain parquet)
            import base64
            import secrets

            from ..sources.encryption import write_encrypted
            key = secrets.token_bytes(16)
            enc_key = base64.b64encode(key).decode("ascii")
            write_encrypted(tbl, dest, key)
        else:
            with fs.open_output_stream(dest) as out:
                pq.write_table(tbl, out)
        size = fs.get_file_info(dest).size
        return pd.DataFrame([{"file_name": fname, "delete_name": name,
                              "cum_count": len(positions),
                              "new_count": new_count, "size": size,
                              "enc_key": enc_key}])

    return (cumulative.repartition(FILE_COL).groupBy(FILE_COL)
            .applyInPandas(write_group, _MANIFEST_SCHEMA).collect())


def _register_deletes(writer, handle, snapshot_id: int, manifest) -> None:
    by_name = {os.path.basename(f.path):
               (f.data_file_id,
                f.delete_file.delete_file_id
                if f.delete_file is not None else None)
               for f in handle._raw_files}
    for row in sorted(manifest, key=lambda r: r["file_name"]):
        entry = by_name.get(row["file_name"])
        if entry is None:
            raise InvalidConfig(
                f"delete manifest references unknown data file "
                f"{row['file_name']!r}")
        fid, prev_delete_id = entry
        # optimistic concurrency: the cumulative file was computed from
        # prev_delete_id's positions — a concurrent DML superseding it
        # must abort this one, not be silently overwritten
        writer.register_delete_file(
            handle.meta.table_id, fid, snapshot_id, row["delete_name"],
            True, int(row["size"]), int(row["cum_count"]),
            expected_prev_delete_id=prev_delete_id,
            encryption_key=row["enc_key"])


def _stage_append(session, handle, df: DataFrame,
                  single_file: bool = True,
                  include_rowid: bool = False,
                  include_snapshot: bool = False) -> list:
    """Write df's rows as finalized parquet in the table dir WITHOUT
    registering them (mirrors table_writer.create_or_insert step 2); the
    returned [(name, size, footer, count, pvals|None)] carries the row
    counts, so no .count() pre-action is needed. A crash (or a no-op DML
    discovered after staging) leaves an unregistered file, never a
    corrupt catalog — the same orphan-not-corruption discipline as the
    insert path.

    Partition-aware: rewrites into a partitioned table split by the live
    spec and register their partition values, so pruning keeps working
    over an UPDATE/MERGE-heavy table instead of degrading as unvalued
    rewrite files accumulate."""
    from ..table_writer import (_PART_PREFIX, _finalize_partitioned_hadoop,
                                _finalize_partitioned_local)
    data_cols = [c.column_name for c in handle.columns]
    column_ids = [c.column_id for c in handle.columns]
    not_null = [c.column_name for c in handle.columns if not c.nulls_allowed]
    if include_rowid:
        # UPDATE rewrite keeping original rowids: the ROWID_FILE_COL
        # rides into the parquet (no field id — resolved by its reserved
        # name) and the file registers with row_id_start NULL.
        # ``include_snapshot`` (flush_inlined_data) additionally rides
        # each row's original insertion snapshot as SNAPSHOT_FILE_COL so
        # the virtual snapshot_id column survives the storage migration.
        from ..sources.scan import ROWID_FILE_COL, SNAPSHOT_FILE_COL
        from ..table_writer import _with_field_ids_partial
        extra = [F.col("rowid").cast("long").alias(ROWID_FILE_COL)]
        if include_snapshot:
            extra.append(F.col("__begin_snapshot").cast("long")
                         .alias(SNAPSHOT_FILE_COL))
        out = _with_field_ids_partial(
            _enforce_not_null(df.select(*data_cols, *extra), not_null),
            data_cols, column_ids,
            [dict(c.nested_ids or ()) for c in handle.columns])
    else:
        out = _with_field_ids(
            _enforce_not_null(df.select(*data_cols), not_null), column_ids,
            [dict(c.nested_ids or ()) for c in handle.columns])
    if single_file:
        out = out.coalesce(1)
    session.spark.conf.set("spark.sql.parquet.fieldId.write.enabled", "true")
    table_path = handle.table_path

    id_to_name = dict(zip(column_ids, data_cols))
    from ..table_writer import _partition_expr, _partition_keys
    spec = session.provider.get_partition_columns(
        handle.meta.table_id, handle.snapshot_id)
    part_keys = _partition_keys(spec, id_to_name)

    from ..types import is_interval_type
    iv_cols = [c.column_name for c in handle.columns
               if is_interval_type(c.column_type)]
    if iv_cols:
        # INTERVAL rewrite halves (UPDATE/MERGE/compact) stage through
        # the duckdb-backed writer — the only local route to the parquet
        # INTERVAL logical type (r9; table_writer._write_interval_
        # distributed). Rowid/snapshot rider columns pass through as
        # plain longs. Partitioned/encrypted interval rewrites stay
        # refused (neither staging shape is carried by this path).
        from ..errors import InvalidConfig
        if part_keys:
            raise InvalidConfig(
                "rewrites of a partitioned table with INTERVAL columns "
                "are not supported")
        if (session.provider.get_option("encrypted") or "").lower() \
                in ("true", "1"):
            raise InvalidConfig(
                "rewrites of INTERVAL columns in an encrypted catalog "
                "are not supported (the PME writer cannot emit the "
                "parquet INTERVAL logical type)")
        from ..table_writer import _write_interval_distributed
        manifest = _write_interval_distributed(out, table_path, iv_cols)
        return [(r["name"], r["size"], r["footer"], r["rows"], None, None)
                for r in manifest]

    if (session.provider.get_option("encrypted") or "").lower() \
            in ("true", "1"):
        # encrypted catalog: rewrite/insert halves of UPDATE/MERGE are
        # PME parquet with per-file keys, like the insert path
        if part_keys:
            # per-combo files, flat names, combos in the manifest —
            # same shape as the encrypted insert
            # (sql/encryption/partitioning_encryption.test)
            import json as _json

            from ..sources.encryption import write_encrypted_partitioned
            pk_cols = []
            for i, (base, tf, _dk) in enumerate(part_keys):
                out = out.withColumn(f"{_PART_PREFIX}{i}",
                                     _partition_expr(base, tf))
                pk_cols.append(f"{_PART_PREFIX}{i}")
            out = out.repartition(*[F.col(c) for c in pk_cols])
            manifest = write_encrypted_partitioned(out, table_path, pk_cols)
            return [(r["name"], r["size"], r["footer"], r["rows"],
                     list(enumerate(_json.loads(r["pvals"]))), r["key"])
                    for r in manifest]
        from ..sources.encryption import write_encrypted_distributed
        manifest = write_encrypted_distributed(out, table_path)
        return [(r["name"], r["size"], r["footer"], r["rows"], None,
                 r["key"]) for r in manifest]

    staging = table_path.rstrip("/") + f"/stage-{uuid.uuid4().hex}"
    try:
        if part_keys:
            for i, (base, tf, _dk) in enumerate(part_keys):
                out = out.withColumn(f"{_PART_PREFIX}{i}",
                                     _partition_expr(base, tf))
            (out.write
             .partitionBy([f"{_PART_PREFIX}{i}"
                           for i in range(len(part_keys))])
             .parquet(staging, mode="errorifexists"))
        else:
            out.write.parquet(staging, mode="errorifexists")
    except Exception as e:
        _raise_if_constraint(e)
    if part_keys:
        from ..table_writer import _hive_file_pattern
        dir_keys = [dk for _b, _t, dk in part_keys]
        hive = _hive_file_pattern(session, handle.meta.table_id)
        if "://" in table_path:
            return [(*t, None) for t in _finalize_partitioned_hadoop(
                session.spark, staging, table_path, dir_keys,
                hive_dirs=hive)]
        return [(*t, None) for t in _finalize_partitioned_local(
            staging, table_path, dir_keys, hive_dirs=hive)]
    if "://" in table_path:
        return [(*s, None, None) for s in
                _finalize_hadoop(session.spark, staging, table_path)]
    return [(*s, None, None) for s in _finalize_local(staging, table_path)]


def _register_append(session, writer, snapshot_id: int, handle,
                     staged: list, rowid_in_file: bool = False) -> int:
    """Register staged files into an EXISTING snapshot (so UPDATE/MERGE
    record their delete + insert halves atomically). ``rowid_in_file``:
    the files carry their rowids as the reserved column — register with
    row_id_start NULL (the DuckLake stable-rowid-update convention)."""
    data_cols = [c.column_name for c in handle.columns]
    column_ids = [c.column_id for c in handle.columns]
    table_path = handle.table_path
    n_rows = 0
    next_rowid = writer.next_row_id(handle.meta.table_id)
    ids_by_name = dict(zip(data_cols, column_ids))
    from ..types import is_interval_type
    mid = None
    if any(is_interval_type(c.column_type) for c in handle.columns):
        # interval rewrites staged through the duckdb writer carry no
        # parquet field ids (r9 review finding): register the identity
        # name mapping — the same contract as _insert_interval and
        # add_files — so a later column RENAME keeps resolving instead
        # of silently reading the renamed column as NULL
        mid = writer.create_name_mapping(
            handle.meta.table_id, data_cols, column_ids)
    for final_name, size, footer, count, pvals, enc_key in staged:
        if count == 0:
            continue
        fid = writer.register_data_file(
            handle.meta.table_id, snapshot_id,
            DataFileInfo(path=final_name, path_is_relative=True,
                         file_size_bytes=size, footer_size=footer,
                         record_count=count,
                         row_id_start=None if rowid_in_file else next_rowid,
                         mapping_id=mid,
                         encryption_key=enc_key))
        if pvals:
            writer.register_file_partition_values(
                fid, handle.meta.table_id, pvals)
        local = _local_readable(table_path, final_name)
        if local is not None and enc_key is None:
            # encrypted files skip stats: the footer is unreadable without
            # the key, and catalog min/max would leak the payload anyway
            from ..types import is_geometry_type
            writer.register_file_column_stats(
                fid, handle.meta.table_id,
                column_stats_of(local, ids_by_name,
                                {c.column_name for c in handle.columns
                                 if is_geometry_type(c.column_type)}))
        next_rowid += count
        n_rows += count
    return n_rows


def delete_rows(session, name: str,
                condition: Union[str, Column],
                using: Optional[DataFrame] = None,
                target_alias: Optional[str] = None) -> int:
    """DELETE FROM name [USING using] WHERE condition. With ``using``
    the matched set is a LEFT SEMI join (each target row deletes at most
    once no matter how many using-rows it matches — DuckDB's USING
    semantics; corpus: sql/delete/delete_join.test). Returns rows
    deleted."""
    handle = session.table_handle(name)
    inl = _match_inlined(handle, condition, using, target_alias)
    inl_ids = [int(r["rowid"]) for r in inl.select("rowid").collect()] \
        if inl is not None else []
    live = _live_with_filepos(session, handle)
    if using is not None:
        lv = live.alias(target_alias) if target_alias else live
        matched = lv.join(using, _as_condition(condition),
                          "left_semi").select(FILE_COL, POS_COL)
    else:
        matched = live.filter(_as_condition(condition)).select(FILE_COL,
                                                               POS_COL)
    n_matched, _ = _delete_and_append(session, handle, matched, None,
                                      inlined_row_ids=inl_ids)
    return n_matched


def update_rows(session, name: str, assignments: dict,
                condition: Union[str, Column, None] = None,
                from_df: Optional[DataFrame] = None,
                target_alias: Optional[str] = None) -> int:
    """UPDATE name SET assignments [FROM from_df] WHERE condition — MOR
    delete of the matched positions + append of the rewritten rows,
    KEEPING their rowids whenever every live file can yield exact ids
    (the DuckLake stable-rowid contract). ``assignments``:
    column -> SQL expr string or Column, evaluated over the matched rows
    (with ``from_df``, over the join — so they may reference the source;
    a target row matching MULTIPLE source rows is rejected as ambiguous,
    the corpus's update_join_duplicates contract). Returns rows
    updated."""
    handle = session.table_handle(name)
    data_cols = [c.column_name for c in handle.columns]
    unknown = set(assignments) - set(data_cols)
    if unknown:
        raise InvalidConfig(f"update: unknown columns {sorted(unknown)}")
    if from_df is not None:
        # UPDATE ... FROM over live inlined rows stays behind the flush
        # guard (the ambiguity check is position-keyed)
        _require_no_inlined(handle)
        inl = None
    else:
        inl = _match_inlined(handle, condition)
    inl_ids = [int(r["rowid"]) for r in inl.select("rowid").collect()] \
        if inl is not None else []
    # rowid stability through UPDATE (sql/rowid/ducklake_row_id_update.
    # test): when every live file can yield exact rowids, the rewritten
    # rows keep them — written as the reserved in-file rowid column,
    # registered with row_id_start NULL. Otherwise (encrypted / foreign
    # fixtures without starts) the legacy fresh-rowid path applies.
    keep_rowids = rowids_preservable(handle)
    live = _live_with_filepos(session, handle, with_rowid=keep_rowids)
    # Persist the matched set for the DML's duration: both halves (the
    # delete-position write and the rewrite append) consume it, and the
    # cache bounds the live scan + predicate to ONE execution. Size is
    # bounded by the rewrite set, which is materialized as parquet anyway.
    if from_df is not None:
        from pyspark.sql import Window
        lv = live.alias(target_alias) if target_alias else live
        cached = (lv.join(from_df, _as_condition(condition), "inner")
                  .withColumn("__n_matches",
                              F.count(F.lit(1)).over(
                                  Window.partitionBy(FILE_COL, POS_COL)))
                  .persist())
        if cached.filter(F.col("__n_matches") > 1).limit(1).count():
            cached.unpersist()
            raise InvalidConfig(
                "UPDATE ... FROM: a target row matches multiple source "
                "rows — ambiguous update rejected")
        matched = cached.drop("__n_matches")
    else:
        cached = matched = live.filter(_as_condition(condition)).persist()
    try:
        types = {f.name: f.dataType for f in handle.spark_schema.fields}
        # cast every assignment to the column's catalog type — SQL literals
        # otherwise change it (Spark parses `0.0` as DECIMAL(1,1), not
        # DOUBLE)
        # with FROM, unassigned target columns must be alias-qualified:
        # the join output may carry same-named source columns
        ref = (lambda c: F.col(f"{target_alias}.{c}")) \
            if from_df is not None and target_alias else F.col
        updated = matched.select(*(
            [(F.expr(assignments[c]) if isinstance(assignments[c], str)
              else assignments[c]).cast(types[c]).alias(c)
             if c in assignments else ref(c).alias(c)
             for c in data_cols]
            + ([ref("rowid").alias("rowid")] if keep_rowids else [])))
        if inl_ids:
            # updated versions of the matched inlined rows append through
            # the normal parquet path; with keep_rowids their ORIGINAL
            # inlined rowids ride along, else fresh ids; the old inlined
            # rows MVCC-end in the same snapshot either way
            inl_updated = inl.select(*(
                [(F.expr(assignments[c]) if isinstance(assignments[c], str)
                  else assignments[c]).cast(types[c]).alias(c)
                 if c in assignments else F.col(c).alias(c)
                 for c in data_cols]
                + ([F.col("rowid")] if keep_rowids else [])))
            updated = updated.unionByName(inl_updated)
        n_matched, _ = _delete_and_append(
            session, handle, matched.select(FILE_COL, POS_COL), updated,
            append_only_if_matched=True, inlined_row_ids=inl_ids,
            rowid_in_file=keep_rowids)
        return n_matched
    finally:
        cached.unpersist()


def _filter_with_absent_side(df: DataFrame, pred: str, present_alias: str,
                             absent_schema, absent_alias: str) -> DataFrame:
    """Filter ``df`` (aliased ``present_alias``) with a MERGE clause
    predicate that may reference the ABSENT side's columns — upstream
    evaluates such references as NULL (a NOT MATCHED BY SOURCE predicate
    has no source row; a NOT MATCHED insert predicate has no target row),
    so comparisons against them come out not-TRUE and the action skips,
    rather than failing analysis (r7 ADVICE: we raised AnalysisException).

    The absent side is attached as ONE all-NULL struct column named
    after its alias, so ``src.v`` resolves as a struct-field access while
    unqualified names keep resolving to the present side alone — a
    cross-joined null relation would make every shared unqualified
    column (the merge keys, always) AMBIGUOUS instead. Pure projection:
    no join, no execution cost. A predicate naming a column that exists
    on neither side still raises — typos stay loud."""
    if absent_alias in df.columns:
        # a data column literally named like the alias would collide
        # with the struct: fall back to qualified-only resolution
        return df.alias(present_alias).filter(F.expr(pred))
    nulls = F.struct(*[F.lit(None).cast(f.dataType).alias(f.name)
                       for f in absent_schema.fields])
    return (df.alias(present_alias)
            .withColumn(absent_alias, nulls)
            .filter(F.expr(pred))
            .drop(absent_alias))


def merge_rows(session, target: str, source: DataFrame, on: list[str],
               when_matched_update: Optional[dict] = None,
               when_matched_delete: bool = False,
               when_not_matched_insert: "bool | dict" = True,
               when_matched_pred: Optional[str] = None,
               when_not_matched_pred: Optional[str] = None,
               when_matched_error: "bool | str" = False,
               by_source_delete: bool = False,
               by_source_pred: Optional[str] = None) -> dict:
    """MERGE INTO target USING source ON target.k = source.k ... —
    the corpus's merge shapes (sql/merge/, incl. the conditional /
    by-source forms of merge_into_tpch.test_slow and
    merge_partition.test:75-79). Matched target rows are deleted (and,
    for update, rewritten with the source's values); unmatched source
    rows are inserted. Exactly one of ``when_matched_update`` /
    ``when_matched_delete`` may act on matches; with neither, matches
    are left untouched.

    ``when_matched_update``: column -> SQL expr over the joined frame
    (target columns by name, source columns as ``src.<col>``), or the
    string "source" to take every source column wholesale.

    Conditional clauses (``WHEN ... AND <pred> THEN``):
    ``when_matched_pred`` gates the matched action (SQL predicate over
    the joined frame, ``tgt.``/``src.`` qualified); rows failing it stay
    untouched. ``when_not_matched_pred`` gates the insert (over the
    unmatched source rows, alias ``src``). ``when_matched_error`` raises
    MergeActionError before anything is written if any match (satisfying
    the given predicate, if it is a string) exists — WHEN MATCHED THEN
    ERROR. ``by_source_delete`` deletes target rows no source row joins
    to (WHEN NOT MATCHED BY SOURCE THEN DELETE), optionally gated by
    ``by_source_pred`` over the target columns. In NOT MATCHED
    predicates, references to the ABSENT side's columns (``src.`` in a
    BY SOURCE predicate, ``tgt.`` in an insert predicate) evaluate as
    NULL — the upstream engine's semantics (there is no row on that
    side) — so comparisons against them come out not-TRUE and the
    action skips; unknown columns still raise.

    Multiple source rows matching one target row are not detected (DuckDB
    raises; here the last-writer is undefined) — pre-aggregate the source
    if its keys are not unique. Returns {"updated": n, "deleted": n,
    "inserted": n}.
    """
    if when_matched_update is not None and when_matched_delete:
        raise InvalidConfig("merge: choose update OR delete for matches")
    handle = session.table_handle(target)
    _require_no_inlined(handle)
    data_cols = [c.column_name for c in handle.columns]
    for k in on:
        if k not in data_cols:
            raise InvalidConfig(f"merge: key {k!r} not in target columns")
        if k not in source.columns:
            raise InvalidConfig(f"merge: key {k!r} not in source columns")

    # MERGE's update half keeps rowids like plain UPDATE (stable-rowid
    # contract); its insert half appends separately with fresh ids
    keep_rowids = when_matched_update is not None \
        and rowids_preservable(handle)
    live = _live_with_filepos(session, handle, with_rowid=keep_rowids)
    # Persist source and the joined match set: the source feeds two
    # structurally distinct joins (inner match + left-anti insert probe)
    # and the match set feeds both DML halves — caching bounds each to
    # ONE execution; counts come from the write manifests, never from
    # extra .count() actions over the join.
    src = source.persist().alias("src")
    joined = live.alias("tgt").join(
        src, [F.col(f"tgt.{k}") == F.col(f"src.{k}") for k in on],
        "inner").persist()
    bs_pos = None
    try:
        if when_matched_error:
            # WHEN MATCHED [AND pred] THEN ERROR: probe BEFORE any write
            # so a triggering merge leaves no snapshot behind. One extra
            # bounded action over the already-persisted match set.
            probe = joined
            if isinstance(when_matched_error, str):
                probe = probe.filter(F.expr(when_matched_error))
            hit = probe.limit(1).count()
            if hit:
                raise MergeActionError(
                    f"MERGE INTO {target}: WHEN MATCHED THEN ERROR — "
                    "a source row matched an existing target row")
        counts = {"updated": 0, "deleted": 0, "inserted": 0}
        acted = joined if when_matched_pred is None \
            else joined.filter(F.expr(when_matched_pred))
        matched_pos = acted.select(F.col(f"tgt.{FILE_COL}").alias(FILE_COL),
                                   F.col(f"tgt.{POS_COL}").alias(POS_COL))
        appended, fresh = None, None
        if when_matched_update == "source":
            when_matched_update = {c: f"src.{c}" for c in data_cols
                                   if c in source.columns and c not in on}
        types = {f.name: f.dataType for f in handle.spark_schema.fields}
        update_mode = when_matched_update is not None
        if update_mode:
            rewritten = acted.select(*(
                [(F.expr(when_matched_update[c])
                  if isinstance(when_matched_update[c], str)
                  else when_matched_update[c]).cast(types[c]).alias(c)
                 if c in when_matched_update else F.col(f"tgt.{c}")
                 for c in data_cols]
                + ([F.col("tgt.rowid").alias("rowid")]
                   if keep_rowids else [])))
            appended = rewritten
        elif not when_matched_delete:
            matched_pos = matched_pos.limit(0)

        n_by_source = 0
        if by_source_delete:
            # WHEN NOT MATCHED BY SOURCE THEN DELETE: target rows no
            # source row joins to. Counted explicitly (one action over an
            # anti-join of the persisted source) so the manifest total can
            # split into matched-action vs by-source deletions.
            bs = live.alias("tgt").join(
                src, [F.col(f"tgt.{k}") == F.col(f"src.{k}") for k in on],
                "left_anti")
            if by_source_pred is not None:
                # src.<col> refs evaluate as NULL here (no source row)
                bs = _filter_with_absent_side(
                    bs, by_source_pred, "tgt", source.schema, "src")
            bs_pos = bs.select(FILE_COL, POS_COL).persist()
            n_by_source = bs_pos.count()
            matched_pos = matched_pos.unionByName(bs_pos)

        if when_not_matched_insert:
            unmatched = src.join(live.select(*on), on, "left_anti")
            if when_not_matched_pred is not None:
                # tgt.<col> refs evaluate as NULL here (no target row)
                unmatched = _filter_with_absent_side(
                    unmatched, when_not_matched_pred, "src",
                    handle.spark_schema, "tgt")
            if isinstance(when_not_matched_insert, dict):
                # INSERT (cols) VALUES (exprs) — exprs over src.<col>;
                # unnamed target columns take NULL (merge corpus shape)
                fresh = unmatched.alias("src").select(*[
                    (F.expr(when_not_matched_insert[c])
                     if c in when_not_matched_insert
                     else F.lit(None)).cast(types[c]).alias(c)
                    for c in data_cols])
            else:
                missing = [c for c in data_cols if c not in source.columns]
                if missing:
                    raise InvalidConfig(
                        f"merge insert: source lacks target columns "
                        f"{missing}")
                fresh = unmatched.select(
                    *[F.col(c).cast(types[c]).alias(c) for c in data_cols])
            if appended is None or not keep_rowids:
                appended = fresh if appended is None \
                    else appended.unionByName(fresh)
                fresh = None

        n_matched, n_append = _delete_and_append(
            session, handle, matched_pos, appended,
            rowid_in_file=keep_rowids,
            appended_fresh=fresh if keep_rowids else None)
        # updated rows re-append 1:1 with matched positions, so the
        # append total splits into (updated = matched) + inserts
        if update_mode:
            counts["updated"] = n_matched - n_by_source
            counts["deleted"] = n_by_source
            counts["inserted"] = n_append - counts["updated"]
        else:
            if when_matched_delete:
                counts["deleted"] = n_matched
            else:
                counts["deleted"] = n_by_source
            counts["inserted"] = n_append
        return counts
    finally:
        if bs_pos is not None:
            bs_pos.unpersist()
        joined.unpersist()
        src.unpersist()


def _delete_and_append(session, handle, matched_pos: DataFrame,
                       appended: Optional[DataFrame],
                       append_only_if_matched: bool = False,
                       inlined_row_ids: Optional[list] = None,
                       rowid_in_file: bool = False,
                       appended_fresh: Optional[DataFrame] = None
                       ) -> tuple[int, int]:
    """Shared tail: write cumulative delete files for the matched
    positions, append rewritten/new rows, register everything in ONE
    snapshot, refresh the session. Returns (matched, appended) counts.

    Single-execution discipline: counts come from the write artifacts —
    the delete manifest's new_count and the staged files' footer counts —
    so the match join / live scan never runs extra .count() actions. The
    candidate set unions ALL existing delete positions (tagged carry-over)
    instead of semi-joining on the touched-file list, which would have
    been a second execution of the match. ``append_only_if_matched``
    (UPDATE) skips staging when the manifest shows zero matches, since
    its append derives from the matched rows."""
    cumulative = matched_pos.withColumn(NEW_COL, F.lit(1))
    dels = _existing_deletes(session, handle)
    if dels is not None:
        cumulative = cumulative.unionByName(
            dels.withColumn(NEW_COL, F.lit(0)))
    encrypted_catalog = (session.provider.get_option("encrypted")
                         or "").lower() in ("true", "1")
    manifest = _write_delete_parquets(session.spark, cumulative,
                                      handle.table_path,
                                      encrypt=encrypted_catalog)
    n_matched = sum(int(r["new_count"]) for r in manifest) \
        + len(inlined_row_ids or [])

    staged, staged_fresh = [], []
    if appended is not None and (n_matched > 0 or not append_only_if_matched):
        staged = _stage_append(session, handle, appended,
                               include_rowid=rowid_in_file)
    if appended_fresh is not None:
        # MERGE's insert half: fresh rows in their own files so the
        # update half's rowid-column files stay pure (every row of a
        # rowid-column file must carry an id)
        staged_fresh = _stage_append(session, handle, appended_fresh)
    n_append = sum(t[3] for t in staged) + sum(t[3] for t in staged_fresh)

    if n_matched == 0 and n_append == 0:
        return 0, 0                    # no snapshot for a no-op DML
    writer = _catalog_writer(session)
    try:
        tid = handle.meta.table_id
        labels = ([f"deleted_from_table:{tid}"] if n_matched else []) + \
                 ([f"inserted_into_table:{tid}"]
                  if staged or staged_fresh else [])
        snapshot_id = writer.create_snapshot(labels)
        _register_deletes(writer, handle, snapshot_id, manifest)
        if inlined_row_ids:
            # matched inlined rows MVCC-end in the same snapshot (sql/
            # data_inlining/data_inlining_delete.test: DML addresses
            # inlined rows directly, no flush)
            writer.delete_inlined_rows(tid, snapshot_id, inlined_row_ids)
        if staged:
            _register_append(session, writer, snapshot_id, handle, staged,
                             rowid_in_file=rowid_in_file)
        if staged_fresh:
            _register_append(session, writer, snapshot_id, handle,
                             staged_fresh)
    finally:
        writer.close()
    session.refresh()
    return n_matched, n_append
