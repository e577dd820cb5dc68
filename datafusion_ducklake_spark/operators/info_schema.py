"""information_schema: six virtual metadata tables + UDTF-style helpers.

Reference parity (SURVEY.md §2A A13-A14; src/information_schema.rs):
snapshots (:44-111), schemata (:115-206), tables (:210-317),
table_info (:428-590 incl. per-table file/byte aggregation :469-539),
columns (:321-424), files (:594-706). Live-queried from the catalog DB on
every call via the bulk queries (metadata_provider.rs:200-264), then
served as small DataFrames — Spark's analog of the reference's MemTable
(projection/filter/limit come free from Catalyst).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

VIEWS = ("snapshots", "schemata", "tables", "table_info", "columns",
         "files", "views", "clustering", "materialized_views")


def snapshots_df(session) -> DataFrame:
    changes = session.provider.get_snapshot_changes()
    rows = [(s.snapshot_id, s.snapshot_time, s.author, s.commit_message,
             changes.get(s.snapshot_id))
            for s in session.provider.list_snapshots()]
    return session.spark.createDataFrame(
        rows, "snapshot_id BIGINT, snapshot_time STRING, "
              "author STRING, commit_message STRING, changes STRING")


def schemata_df(session) -> DataFrame:
    snap = session.catalog.snapshot_id
    rows = [(s.schema_id, s.schema_name, s.path, s.path_is_relative)
            for s in session.provider.list_schemas(snap)]
    return session.spark.createDataFrame(
        rows, "schema_id BIGINT, schema_name STRING, path STRING, "
              "path_is_relative BOOLEAN")


def tables_df(session) -> DataFrame:
    snap = session.catalog.snapshot_id
    rows = [(schema_name, t.table_id, t.table_name, t.path, t.path_is_relative)
            for schema_name, t in session.provider.list_all_tables(snap)]
    return session.spark.createDataFrame(
        rows, "schema_name STRING, table_id BIGINT, table_name STRING, "
              "path STRING, path_is_relative BOOLEAN")


def columns_df(session) -> DataFrame:
    snap = session.catalog.snapshot_id
    by_table: dict = {}
    rows = []
    for schema_name, table_name, c in session.provider.list_all_columns(snap):
        pos = by_table.get((schema_name, table_name), 0) + 1
        by_table[(schema_name, table_name)] = pos
        rows.append((schema_name, table_name, c.column_id, c.column_name,
                     c.column_type, c.nulls_allowed,
                     # SQL-standard aliases (DuckDB exposes both shapes)
                     c.column_type, "YES" if c.nulls_allowed else "NO",
                     pos))
    # VIEW columns surface too (upstream sql/view/
    # ducklake_view_info_columns.test): resolved from the view's own
    # plan schema; column_id is NULL — views have no stored columns.
    # Re-entrancy guard: a view whose body queries information_schema
    # would otherwise recurse through this resolution.
    if getattr(session, "_resolving_view_columns", False):
        return session.spark.createDataFrame(rows, _COLUMNS_SCHEMA)
    session._resolving_view_columns = True
    try:
        _append_view_columns(session, snap, rows)
    finally:
        session._resolving_view_columns = False
    return session.spark.createDataFrame(rows, _COLUMNS_SCHEMA)


_COLUMNS_SCHEMA = ("schema_name STRING, table_name STRING, "
                   "column_id BIGINT, column_name STRING, "
                   "column_type STRING, nulls_allowed BOOLEAN, "
                   "data_type STRING, is_nullable STRING, "
                   "ordinal_position INT")


def _append_view_columns(session, snap, rows) -> None:
    from ..types import spark_to_ducklake_type
    for sch in session.provider.list_schemas(snap):
        for v in session.provider.list_views(sch.schema_id, snap):
            try:
                vschema = session.sql(
                    f"SELECT * FROM {sch.schema_name}.{v.view_name} "
                    f"LIMIT 0").schema
            except Exception:
                continue        # view over a dropped/renamed table
            for pos, f in enumerate(vschema.fields, start=1):
                try:
                    dtype = spark_to_ducklake_type(f.dataType)
                except Exception:
                    dtype = f.dataType.simpleString()
                rows.append((sch.schema_name, v.view_name, None, f.name,
                             dtype, True, dtype, "YES", pos))


def views_df(session) -> DataFrame:
    """information_schema.views: live catalog views at the snapshot."""
    snap = session.catalog.snapshot_id
    rows = []
    for sch in session.provider.list_schemas(snap):
        for v in session.provider.list_views(sch.schema_id, snap):
            rows.append((sch.schema_name, v.view_name, v.sql, v.dialect))
    return session.spark.createDataFrame(
        rows, "schema_name STRING, table_name STRING, view_definition "
              "STRING, dialect STRING")


def files_df(session, table: str = None,
             snapshot_version: int = None) -> DataFrame:
    """``table``/``snapshot_version`` mirror ducklake_list_files'
    optional arguments (sql/list_files/ducklake_list_files.test:
    table + schema => + snapshot_version =>): restrict to one table
    and/or list the files AS OF an earlier snapshot."""
    from ..errors import InvalidConfig
    snap = session.catalog.snapshot_id
    if snapshot_version is not None:
        if not session.provider.snapshot_exists(int(snapshot_version)):
            raise InvalidConfig(
                f"No snapshot found at version {snapshot_version}")
        snap = int(snapshot_version)
    want = None
    if table is not None:
        want = session._split(table)
        live = {(s, t.table_name)
                for s, t in session.provider.list_all_tables(snap)}
        if want not in live:
            raise InvalidConfig(
                f"Table {table!r} does not exist at snapshot {snap}")
    rows = []
    for schema_name, table_name, f in session.provider.list_all_files(snap):
        if want is not None and (schema_name, table_name) != want:
            continue
        d = f.delete_file
        rows.append((schema_name, table_name, f.data_file_id, f.path,
                     f.path_is_relative, f.file_size_bytes, f.footer_size,
                     f.record_count,
                     d.delete_file_id if d else None,
                     d.path if d else None,
                     d.file_size_bytes if d else None,
                     d.delete_count if d else None))
    schema = T.StructType([
        T.StructField("schema_name", T.StringType()),
        T.StructField("table_name", T.StringType()),
        T.StructField("data_file_id", T.LongType()),
        T.StructField("data_file_path", T.StringType()),
        T.StructField("path_is_relative", T.BooleanType()),
        T.StructField("file_size_bytes", T.LongType()),
        T.StructField("footer_size", T.LongType()),
        T.StructField("record_count", T.LongType()),
        T.StructField("delete_file_id", T.LongType()),
        T.StructField("delete_file_path", T.StringType()),
        T.StructField("delete_file_size_bytes", T.LongType()),
        T.StructField("delete_count", T.LongType()),
    ])
    return session.spark.createDataFrame(rows, schema)


def table_info_df(session) -> DataFrame:
    """Per-table aggregates: file_count, file_size_bytes,
    delete_file_count, delete_file_size_bytes
    (ref: information_schema.rs:469-539)."""
    snap = session.catalog.snapshot_id
    agg: dict[tuple[str, str], list[int]] = {}
    ids: dict[tuple[str, str], int] = {}
    for schema_name, t in session.provider.list_all_tables(snap):
        agg[(schema_name, t.table_name)] = [0, 0, 0, 0]
        ids[(schema_name, t.table_name)] = t.table_id
    for schema_name, table_name, f in session.provider.list_all_files(snap):
        a = agg.setdefault((schema_name, table_name), [0, 0, 0, 0])
        a[0] += 1
        a[1] += f.file_size_bytes
        if f.delete_file is not None:
            a[2] += 1
            a[3] += f.delete_file.file_size_bytes
    rows = [(s, t, ids.get((s, t)), a[0], a[1], a[2], a[3])
            for (s, t), a in sorted(agg.items())]
    return session.spark.createDataFrame(
        rows, "schema_name STRING, table_name STRING, table_id BIGINT, "
              "file_count BIGINT, file_size_bytes BIGINT, "
              "delete_file_count BIGINT, delete_file_size_bytes BIGINT")


def clustering_df(session) -> DataFrame:
    """SQL-visible staleness surface for catalog-clustered layouts —
    the ``ducklake_clustering_info()`` UDTF's information_schema twin
    (r10, r9 verdict task #6: pure-SQL sessions need the staleness row
    the way they get the six reference info-schema tables). One row per
    clustering entry — primary spec and each replica family — with the
    same catalog-level currency flag the read-path gate applies
    (operators/layout.clustering_status_rows). Beyond reference: the
    single-node reference keeps no layout metadata."""
    from .layout import clustering_status_rows
    rows = [(r[0], r[1], r[2], r[3],
             int(r[4]) if r[4] is not None else None,
             int(r[5]) if r[5] is not None else None,
             r[6], bool(r[7]))
            for r in clustering_status_rows(session.provider,
                                            session.catalog.snapshot_id)]
    return session.spark.createDataFrame(
        rows, "schema_name STRING, table_name STRING, kind STRING, "
              "cluster_key STRING, buckets BIGINT, n_files BIGINT, "
              "directory STRING, current BOOLEAN")


def materialized_views_df(session) -> DataFrame:
    """SQL-visible staleness surface for materialized views — the
    ``ducklake_matview_info()`` UDTF's information_schema twin, built
    from the same provider-only row builder
    (operators/matview.matview_status_rows) so the view and the refresh
    path cannot disagree. Beyond reference: the reference has plain
    views only."""
    from .matview import matview_status_rows
    rows = [(r[0], r[1], r[2], bool(r[3]),
             int(r[4]) if r[4] is not None else None,
             int(r[5]) if r[5] is not None else None,
             bool(r[6]) if r[6] is not None else None)
            for r in matview_status_rows(session.provider,
                                         session.catalog.snapshot_id)]
    return session.spark.createDataFrame(
        rows, "schema_name STRING, table_name STRING, "
              "source_table STRING, incremental BOOLEAN, "
              "last_snapshot BIGINT, current_snapshot BIGINT, "
              "current BOOLEAN")


_BUILDERS = {
    "snapshots": snapshots_df,
    "schemata": schemata_df,
    "tables": tables_df,
    "table_info": table_info_df,
    "columns": columns_df,
    "views": views_df,
    "files": files_df,
    "clustering": clustering_df,
    "materialized_views": materialized_views_df,
}


def view(session, name: str) -> DataFrame:
    if name not in _BUILDERS:
        raise KeyError(f"unknown information_schema view: {name} "
                       f"(available: {', '.join(VIEWS)})")
    return _BUILDERS[name](session)


def register_all(session) -> None:
    """Register as ``information_schema_<name>`` temp views
    (flat names — Spark temp views live in one namespace)."""
    for name, builder in _BUILDERS.items():
        builder(session).createOrReplaceTempView(f"information_schema_{name}")
