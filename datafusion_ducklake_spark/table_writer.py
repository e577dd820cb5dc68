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

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from .errors import InvalidConfig
from .metadata.writer import CatalogWriter, ColumnDef, DataFileInfo, WriteMode
from .types import spark_to_ducklake_type


def _catalog_writer(session) -> CatalogWriter:
    path = session.catalog_path
    if path.startswith(("postgresql://", "postgres://", "mysql://")):
        # Read providers exist for these backends; a catalog WRITER does
        # not. Fail clearly instead of opening a bogus local sqlite file.
        raise InvalidConfig(
            "catalog writes are not supported on postgres/mysql backends "
            f"(catalog: {path}); use a sqlite or duckdb catalog for writes")
    if path.endswith((".duckdb", ".ddb")):
        return CatalogWriter.duckdb(path)
    return CatalogWriter.sqlite(path)


def _column_defs(schema: T.StructType) -> list[ColumnDef]:
    return [ColumnDef(f.name, spark_to_ducklake_type(f.dataType), f.nullable)
            for f in schema.fields]


def _with_field_ids(df: DataFrame, column_ids: list[int]) -> DataFrame:
    """Stamp catalog column_ids as parquet field ids so renames stay
    metadata-only (ref: table_writer.rs:303-317). Uses alias(metadata=...)
    — DataFrame.to(schema) keeps metadata logically but the parquet writer
    ignores it; aliased metadata reaches the footer."""
    from pyspark.sql import functions as F
    return df.select(*[
        F.col(f.name).alias(f.name, metadata={**(f.metadata or {}),
                                              "parquet.field.id": cid})
        for f, cid in zip(df.schema.fields, column_ids)])


def footer_size_of(path: str) -> int:
    """Parquet footer size from the trailing 8 bytes: 4-byte little-endian
    metadata length + 'PAR1' magic (ref: table_writer.rs:319-338)."""
    with open(path, "rb") as f:
        f.seek(-8, os.SEEK_END)
        tail = f.read(8)
    if tail[4:] != b"PAR1":
        raise InvalidConfig(f"not a parquet file: {path}")
    return int.from_bytes(tail[:4], "little") + 8


def create_or_insert(session, name: str, df: DataFrame, mode: str,
                     single_file: bool = True, if_exists: str = "error") -> int:
    """Returns the number of rows written (the reference returns a 1-row
    count batch; insert_exec.rs:24-31)."""
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
            schema_name, table_name, _column_defs(df.schema), write_mode)

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
        out = _with_field_ids(df, setup.column_ids)
        if single_file:
            out = out.coalesce(1)
        staging = os.path.join(table_path, f"stage-{uuid.uuid4().hex}")
        out.write.parquet(staging, mode="errorifexists")

        # 3) move part files to UUID names in the table dir and register
        #    each in the catalog (multi-file snapshot)
        n_rows = 0
        next_rowid = writer.next_row_id(table_meta.table_id)
        import pyarrow.parquet as pq
        for part in sorted(os.listdir(staging)):
            if not part.endswith(".parquet"):
                continue
            final_name = f"ducklake-{uuid.uuid4()}.parquet"
            final_path = os.path.join(table_path, final_name)
            os.rename(os.path.join(staging, part), final_path)
            meta = pq.read_metadata(final_path)
            n_rows += meta.num_rows
            writer.register_data_file(
                table_meta.table_id, setup.snapshot_id,
                DataFileInfo(path=final_name, path_is_relative=True,
                             file_size_bytes=os.path.getsize(final_path),
                             footer_size=footer_size_of(final_path),
                             record_count=meta.num_rows,
                             row_id_start=next_rowid))
            next_rowid += meta.num_rows
        for leftover in os.listdir(staging):
            os.remove(os.path.join(staging, leftover))
        os.rmdir(staging)

        session.refresh()
        return n_rows
    finally:
        writer.close()
