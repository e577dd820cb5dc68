"""Structured Streaming over DuckLake tables.

The reference is batch-only (SURVEY.md §2B: streaming = none); this is the
optional stretch it suggests — exposing ``ducklake_table_changes`` as a
stream. Two modes:

- ``stream_inserts``: a real ``readStream`` on the table's data directory.
  DuckLake data files are immutable and append-only, which is exactly the
  contract of Spark's file streaming source — each newly-registered data
  file becomes a micro-batch. MOR deletes don't rewrite data files, so
  insert streams are append-correct by construction.
- ``replay_changes``: deterministic micro-batch replay of the CDC log via
  ``foreachBatch``-style iteration over snapshot ranges — for backfills
  and tests (``Trigger.AvailableNow`` semantics driven by the catalog's
  snapshot log instead of file mtimes).
"""

from __future__ import annotations

from typing import Callable, Iterator

from pyspark.sql import DataFrame


# Data files are ducklake-<uuid4>.parquet; delete files are
# ducklake-delete-<uuid4>.parquet. The first uuid4 group is 8 hex chars,
# and "delete-"'s third character ('l') is not hex — so this glob admits
# every data file and no positional-delete file.
_DATA_FILE_GLOB = ("ducklake-" + "[0-9a-f]" * 8 + "-*.parquet")


def stream_inserts(session, name: str) -> DataFrame:
    """readStream of newly-added rows for a DuckLake table (file-source
    based: new immutable parquet data files == new micro-batches).
    Start with ``.trigger(availableNow=True)`` for catch-up semantics.

    Scope guard: positional-delete parquet lives in the same directory and
    is excluded by glob; tables that ever had a file REMOVED (overwrite /
    compaction leave superseded files on disk, which the file source
    would re-emit as duplicates) are rejected here — use
    ``replay_changes``, which walks the catalog instead of the directory.
    A table compacted mid-stream has the same hazard and cannot be
    detected from a running stream; this is inherent to directory-based
    file sources and is documented in the class of engines that use them.
    """
    from ..errors import InvalidConfig

    table = session.table_handle(name)
    ended = session.provider._fetchall(
        "SELECT COUNT(*) FROM ducklake_data_file "
        "WHERE table_id = ? AND end_snapshot IS NOT NULL",
        (table.meta.table_id,))[0][0]
    if int(ended) > 0:
        raise InvalidConfig(
            f"stream_inserts requires an append-only table, but {name} has "
            f"{ended} removed data file(s) (overwrite/compaction history); "
            f"superseded files remain on disk and would stream as "
            f"duplicates — use replay_changes() instead")
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
    """Replay the CDC insert log snapshot-by-snapshot: calls
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
