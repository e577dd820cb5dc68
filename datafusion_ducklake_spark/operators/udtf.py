"""SQL-callable table functions (UDTF parity for SURVEY §2A A14).

The reference registers five UDTFs (table_functions.rs:370-394). Our
primary surface is the Python API (``dl.snapshots()`` etc. — the survey's
recommended mapping); this module adds SQL-callable parity for the
metadata trio via Spark Python UDTFs:

    SELECT * FROM ducklake_snapshots();
    SELECT * FROM ducklake_table_info();
    SELECT * FROM ducklake_list_files();

Each UDTF re-opens the catalog DB inside the executor task (the catalog
path travels by closure; connections don't pickle). The data-bearing CDC
functions (table_changes/table_deletions) stay API-level: funneling table
data through a row-yielding Python UDTF would abandon the vectorized scan
path — ``dl.table_changes(...)`` returns a real parquet-backed DataFrame
instead.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


def register_sql_functions(session) -> None:
    catalog_path = session.catalog_path
    snapshot_id = session.catalog.snapshot_id

    @udtf(returnType="snapshot_id BIGINT, schema_version BIGINT, "
                     "snapshot_time STRING, author STRING, "
                     "commit_message STRING, changes STRING")
    class DucklakeSnapshots:
        # schema_version mirrors DuckDB's ducklake_snapshots() column
        # (sql/functions/ducklake_snapshots.test): it increments on every
        # DDL-bearing snapshot after the bootstrap. The catalog stores
        # changes, not versions, so it's derived — a snapshot whose
        # change labels include create/drop/alter/rename bumps it.
        _DDL = ("created", "dropped", "altered", "renamed", "promoted")

        def eval(self):
            from ..metadata.provider import provider_for
            p = provider_for(catalog_path)
            try:
                changes = p.get_snapshot_changes()
                version = 0
                for s in sorted(p.list_snapshots(),
                                key=lambda x: x.snapshot_id):
                    ch = changes.get(s.snapshot_id)
                    if s.snapshot_id > 0 and ch and any(
                            k in ch for k in self._DDL):
                        version += 1
                    yield (s.snapshot_id, version, s.snapshot_time,
                           s.author, s.commit_message, ch)
            finally:
                p.close()

    @udtf(returnType="snapshot_id BIGINT")
    class DucklakeCurrentSnapshot:
        # the session's pinned snapshot (sql/snapshot_info/
        # ducklake_current_commit.test)
        def eval(self):
            yield (snapshot_id,)

    @udtf(returnType="snapshot_id BIGINT")
    class DucklakeLastCommittedSnapshot:
        # latest snapshot COMMITTED to the catalog DB, which may be ahead
        # of this session's pin (ducklake_last_commit.test)
        def eval(self):
            from ..metadata.provider import provider_for
            p = provider_for(catalog_path)
            try:
                yield (p.get_current_snapshot(),)
            finally:
                p.close()

    @udtf(returnType="schema_name STRING, table_name STRING, table_id BIGINT, "
                     "file_count BIGINT, file_size_bytes BIGINT, "
                     "delete_file_count BIGINT, delete_file_size_bytes BIGINT")
    class DucklakeTableInfo:
        def eval(self):
            from ..metadata.provider import provider_for
            p = provider_for(catalog_path)
            try:
                agg: dict = {}
                ids: dict = {}
                for schema_name, t in p.list_all_tables(snapshot_id):
                    agg[(schema_name, t.table_name)] = [0, 0, 0, 0]
                    ids[(schema_name, t.table_name)] = t.table_id
                for schema_name, table_name, f in p.list_all_files(snapshot_id):
                    a = agg.setdefault((schema_name, table_name), [0, 0, 0, 0])
                    a[0] += 1
                    a[1] += f.file_size_bytes
                    if f.delete_file is not None:
                        a[2] += 1
                        a[3] += f.delete_file.file_size_bytes
                for (s, t), a in sorted(agg.items()):
                    yield s, t, ids.get((s, t)), a[0], a[1], a[2], a[3]
            finally:
                p.close()

    @udtf(returnType="data_size_bytes BIGINT, metadata_size_bytes BIGINT, "
                     "file_count BIGINT")
    class DucklakeDatabaseSize:
        # PRAGMA database_size parity (sql/general/database_size.test):
        # live data+delete bytes at the pinned snapshot, plus the catalog
        # DB's own on-disk size
        def eval(self):
            import os as _os

            from ..metadata.provider import provider_for
            p = provider_for(catalog_path)
            try:
                total = n = 0
                for _s, _t, f in p.list_all_files(snapshot_id):
                    total += f.file_size_bytes or 0
                    n += 1
                    if f.delete_file is not None:
                        total += f.delete_file.file_size_bytes or 0
                meta = (_os.path.getsize(catalog_path)
                        if _os.path.isfile(catalog_path) else 0)
                yield total, meta, n
            finally:
                p.close()

    @udtf(returnType="schema_name STRING, table_name STRING, "
                     "data_file_path STRING, file_size_bytes BIGINT, "
                     "record_count BIGINT, delete_file_path STRING, "
                     "delete_count BIGINT, data_file_footer_size BIGINT")
    class DucklakeListFiles:
        # data_file_footer_size: the recorded footer-size hint (DuckDB's
        # ducklake_list_files exposes it — sql/add_files/
        # add_file_footer_size.test)
        def eval(self):
            from ..metadata.provider import provider_for
            p = provider_for(catalog_path)
            try:
                for schema_name, table_name, f in p.list_all_files(snapshot_id):
                    d = f.delete_file
                    yield (schema_name, table_name, f.path, f.file_size_bytes,
                           f.record_count, d.path if d else None,
                           d.delete_count if d else None, f.footer_size)
            finally:
                p.close()

    @udtf(returnType="data_file_id BIGINT, table_id BIGINT, "
                     "column_id BIGINT, column_size_bytes BIGINT, "
                     "value_count BIGINT, null_count BIGINT, "
                     "min_value STRING, max_value STRING, "
                     "contains_nan BOOLEAN, extra_stats STRING")
    class DucklakeFileColumnStats:
        # geo corpus: SELECT extra_stats FROM ducklake_file_column_stats
        # (sql/geo/ducklake_geometry.test:30-44)
        def eval(self):
            from ..metadata.provider import provider_for
            p = provider_for(catalog_path)
            try:
                for row in p.get_raw_file_column_stats():
                    yield tuple(row)
            finally:
                p.close()

    @udtf(returnType="table_id BIGINT, column_id BIGINT, "
                     "contains_null BOOLEAN, contains_nan BOOLEAN, "
                     "min_value STRING, max_value STRING, "
                     "extra_stats STRING")
    class DucklakeTableColumnStats:
        def eval(self):
            from ..metadata.provider import provider_for
            p = provider_for(catalog_path)
            try:
                for row in p.get_raw_table_column_stats():
                    r = list(row)
                    # sqlite stores booleans as 0/1; the UDTF's Boolean
                    # fields null out ints unless converted here
                    r[2] = None if r[2] is None else bool(r[2])
                    r[3] = None if r[3] is None else bool(r[3])
                    yield tuple(r)
            finally:
                p.close()

    @udtf(returnType="option_name STRING, value STRING, scope STRING, "
                     "scope_entry STRING")
    class DucklakeOptions:
        # ducklake.options() parity (sql/settings/per_table_settings.test
        # tail): one row per persisted option with its scope — GLOBAL
        # (scope_entry NULL), SCHEMA (schema name), TABLE (qualified
        # schema.table name). Internal bootstrap keys (data_path etc.)
        # are options too, matching the catalog's ducklake_metadata rows.
        def eval(self):
            from ..metadata.provider import provider_for
            p = provider_for(catalog_path)
            try:
                schema_names = {}
                table_names = {}
                for s in p.list_schemas(snapshot_id):
                    schema_names[s.schema_id] = s.schema_name
                    for t in p.list_tables(s.schema_id, snapshot_id):
                        table_names[t.table_id] = \
                            f"{s.schema_name}.{t.table_name}"
                for key, value, scope, scope_id in p.list_options():
                    if scope == "schema":
                        yield key, value, "SCHEMA", schema_names.get(scope_id)
                    elif scope == "table":
                        yield key, value, "TABLE", table_names.get(scope_id)
                    else:
                        yield key, value, "GLOBAL", None
            finally:
                p.close()

    @udtf(returnType="schema_name STRING, table_name STRING, kind STRING, "
                     "cluster_key STRING, buckets BIGINT, n_files BIGINT, "
                     "directory STRING, current BOOLEAN")
    class DucklakeClusteringInfo:
        # r8 verdict Missing #5: nothing surfaced "this replica is
        # stale". One row per clustering entry (primary spec + each
        # replica family); current=false means the fast path has
        # degraded to the plain scan (DML diverged the live-set digest,
        # or the schema changed) — refresh with
        # CALL ducklake_refresh_replica('t', 'key'), or drop it.
        def eval(self):
            from ..metadata.provider import provider_for
            from .layout import clustering_status_rows
            p = provider_for(catalog_path)
            try:
                yield from clustering_status_rows(p, snapshot_id)
            finally:
                p.close()

    @udtf(returnType="schema_name STRING, table_name STRING, "
                     "source_table STRING, incremental BOOLEAN, "
                     "last_snapshot BIGINT, current_snapshot BIGINT, "
                     "current BOOLEAN")
    class DucklakeMatviewInfo:
        # one row per materialized view; current=false means the source
        # gained data/delete files since the last refresh — run
        # CALL ducklake_refresh_materialized_view('name')
        def eval(self):
            from ..metadata.provider import provider_for
            from .matview import matview_status_rows
            p = provider_for(catalog_path)
            try:
                yield from matview_status_rows(p, snapshot_id)
            finally:
                p.close()

    session.spark.udtf.register("ducklake_matview_info",
                                DucklakeMatviewInfo)
    session.spark.udtf.register("ducklake_clustering_info",
                                DucklakeClusteringInfo)
    session.spark.udtf.register("ducklake_options", DucklakeOptions)
    session.spark.udtf.register("ducklake_file_column_stats",
                                DucklakeFileColumnStats)
    session.spark.udtf.register("ducklake_table_column_stats",
                                DucklakeTableColumnStats)
    from ..functions.geo import register_geo_functions
    register_geo_functions(session.spark)
    session.spark.udtf.register("ducklake_snapshots", DucklakeSnapshots)
    session.spark.udtf.register("ducklake_table_info", DucklakeTableInfo)
    session.spark.udtf.register("ducklake_list_files", DucklakeListFiles)
    session.spark.udtf.register("ducklake_current_snapshot",
                                DucklakeCurrentSnapshot)
    session.spark.udtf.register("ducklake_last_committed_snapshot",
                                DucklakeLastCommittedSnapshot)
    session.spark.udtf.register("ducklake_database_size",
                                DucklakeDatabaseSize)
