"""Structured Streaming over DuckLake tables.

The reference is batch-only (SURVEY.md §2B: streaming = none); this is the
optional stretch it suggests — exposing ``ducklake_table_changes`` as a
stream. Three modes:

- ``stream_inserts`` (default, catalog-driven): a custom Python streaming
  source whose offsets are ROWID EXTENTS over ``ducklake_data_file``
  registrations. Each micro-batch reads the files whose rowid range is
  new; compaction rewrites PRESERVE rowids, so rewritten files fall below
  the offset and never re-emit — exactly-once per row without an
  append-only restriction.
- ``stream_inserts(mode="glob")``: the plain file-source fallback on the
  table's data directory (append-only tables only — superseded files
  left on disk would re-emit as duplicates; guarded via the catalog's
  ended-file count).
- ``replay_changes``: deterministic micro-batch replay of the CDC log via
  ``foreachBatch``-style iteration over snapshot ranges — for backfills
  and tests (``Trigger.AvailableNow`` semantics driven by the catalog's
  snapshot log instead of file mtimes).
"""

from __future__ import annotations

from typing import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.datasource import (DataSource, DataSourceStreamReader,
                                    InputPartition)


# Data files are ducklake-<uuid4>.parquet; delete files are
# ducklake-delete-<uuid4>.parquet. The first uuid4 group is 8 hex chars,
# and "delete-"'s third character ('l') is not hex — so this glob admits
# every data file and no positional-delete file.
_DATA_FILE_GLOB = ("ducklake-" + "[0-9a-f]" * 8 + "-*.parquet")


class _FileSlice(InputPartition):
    def __init__(self, uri: str, encryption_key: str | None = None):
        self.uri = uri
        # stored-form PME footer key: ships inside the serialized
        # partition so the decrypt happens executor-side
        self.encryption_key = encryption_key


class _CatalogStreamReader(DataSourceStreamReader):
    """Rowid-extent offsets over ``ducklake_data_file``: a file is
    emitted iff its ``row_id_start`` lies in the unseen rowid range.
    ``next_row_id`` is monotone over ALL files ever registered, so new
    appends always land above the offset, while compaction rewrites
    (which preserve rowids) land below it and never re-emit. Offsets are
    {"rowid": n} — a plain JSON dict, restart-safe via the checkpoint."""

    def __init__(self, schema, options):
        self._schema = schema
        self._catalog_path = options["catalog_path"]
        self._table = options["table"]
        self._provider = None

    def __getstate__(self):
        # the reader ships to executors for read(); the provider's DB
        # connection stays on the driver
        state = dict(self.__dict__)
        state["_provider"] = None
        return state

    def _handle(self):
        from ..catalog import DuckLakeSession
        from ..metadata.provider import provider_for
        if self._provider is None:
            self._provider = provider_for(self._catalog_path)
        # a fresh session view per call: new snapshots must be visible
        return DuckLakeSession(
            None, self._catalog_path,
            provider=self._provider).table_handle(self._table)

    def initialOffset(self) -> dict:
        return {"rowid": 0}

    def latestOffset(self) -> dict:
        handle = self._handle()
        top = max((f.row_id_start + (f.record_count or 0)
                   for f in handle.files if f.row_id_start is not None),
                  default=0)
        return {"rowid": top}

    def partitions(self, start: dict, end: dict):
        from ..errors import InvalidConfig
        handle = self._handle()
        out = []
        for f in handle.files:
            if f.row_id_start is None:
                raise InvalidConfig(
                    f"catalog-driven streaming needs row_id_start for "
                    f"every data file of {self._table} (foreign add_files "
                    f"tables: use mode='glob' or replay_changes())")
            if start["rowid"] <= f.row_id_start < end["rowid"]:
                out.append(_FileSlice(f.data_uri, f.encryption_key))
        return out or [_FileSlice("")]        # API requires >= 1 partition

    def read(self, partition: _FileSlice):
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema
        if not partition.uri:
            return iter(())
        path = partition.uri
        if path.startswith("file://"):
            path = path[len("file://"):]
        target = to_arrow_schema(self._schema)
        if partition.encryption_key is not None:
            from ..sources.encryption import decode_key, read_encrypted_arrow
            table = read_encrypted_arrow(
                path, decode_key(partition.encryption_key))
        else:
            table = pq.read_table(path)
        return iter(table.select(target.names).cast(target).to_batches())

    def commit(self, end: dict) -> None:
        pass


class DuckLakeInsertsDataSource(DataSource):
    """``spark.readStream.format("ducklake_inserts")`` — catalog-driven
    insert stream for DuckLake tables (registered by stream_inserts)."""

    @classmethod
    def name(cls) -> str:
        return "ducklake_inserts"

    def schema(self):
        from ..catalog import DuckLakeSession
        return DuckLakeSession(
            None, self.options["catalog_path"]).table_handle(
                self.options["table"]).spark_schema

    def streamReader(self, schema):
        return _CatalogStreamReader(schema, self.options)


def stream_inserts(session, name: str, mode: str = "catalog") -> DataFrame:
    """readStream of newly-added rows for a DuckLake table. Start with
    ``.trigger(availableNow=True)`` for catch-up semantics.

    ``mode="catalog"`` (default): file list driven by the catalog's
    ``ducklake_data_file`` registrations with rowid-extent offsets —
    exactly-once per row even across compaction/overwrite (rewrites
    preserve rowids and land below the offset). Requires row_id_start on
    every file. Inlined rows (data inlining) are invisible to the stream
    until flush_inlined_data migrates them to parquet — they then stream
    exactly once under their fresh rowids.

    ``mode="glob"``: plain Spark file source on the data directory.
    Append-only tables only: superseded files from overwrite/compaction
    stay on disk and would re-emit as duplicates, so tables with ended
    files are rejected (catalog guard); a table compacted mid-stream has
    the same hazard — inherent to directory-based file sources.
    """
    from ..errors import InvalidConfig

    table = session.table_handle(name)
    if mode == "catalog":
        session.spark.dataSource.register(DuckLakeInsertsDataSource)
        return (session.spark.readStream
                .format("ducklake_inserts")
                .option("catalog_path", session.catalog_path)
                .option("table", name)
                .load())
    ended = session.provider.count_ended_files(table.meta.table_id)
    if ended > 0:
        raise InvalidConfig(
            f"stream_inserts(mode='glob') requires an append-only table, "
            f"but {name} has {ended} removed data file(s) (overwrite/"
            f"compaction history); superseded files remain on disk and "
            f"would stream as duplicates — use the default catalog mode "
            f"or replay_changes() instead")
    schema = table.spark_schema
    return (session.spark.readStream
            .schema(schema)
            .format("parquet")
            .option("maxFilesPerTrigger", 8)
            .option("pathGlobFilter", _DATA_FILE_GLOB)
            .load(table.table_path + "/"))


def replay_changes(session, name: str, start: int, end: int,
                   batch_fn: Callable[[DataFrame, int], None],
                   step: int = 1) -> int:
    """Replay the FULL CDC feed (inserts + deletes + update image
    pairs — operators/cdc.table_changes) snapshot-by-snapshot: calls
    ``batch_fn(batch_df, snapshot_id)`` for each snapshot range chunk in
    (start, end], in commit order — the deterministic backfill path.
    Returns the number of non-empty batches delivered."""
    delivered = 0
    s = start
    while s < end:
        e = min(s + step, end)
        batch = session.table_changes(name, s, e)
        if batch.limit(1).count() > 0:
            batch_fn(batch, e)
            delivered += 1
        s = e
    return delivered
