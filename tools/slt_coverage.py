"""Generate tests/slt/COVERAGE_FILES.md — a per-file disposition of EVERY
sqllogictest file in /root/reference/tests/sqllogictests/sql/ (r5 verdict
task #5: the directory-level COVERAGE.md claim, made auditable file by
file).

Disposition kinds:
- same-name port: tests/slt/<stem>.test exists (the default; covers ~140
  files without an entry here).
- RENAMED: the port lives under a different corpus name (upstream uses
  ducklake_/test_ prefixes and some synonyms).
- PYTEST: the scenario is exercised programmatically (engine seams a
  hybrid slt cannot reach: attach options, read-only sessions, migration
  fixtures, concurrency threads).
- N_A: no offline/Spark analog; reason given.

Run: python tools/slt_coverage.py   (rewrites tests/slt/COVERAGE_FILES.md)
"""

from __future__ import annotations

import os
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference/tests/sqllogictests/sql")
OUT = REPO / "tests" / "slt" / "COVERAGE_FILES.md"

# upstream path (relative to sql/) -> disposition for files whose stem has
# no same-named tests/slt/<stem>.test
MAPPED: dict[str, str] = {
    # --- renamed ports (same scenario, our corpus name) -----------------
    "add_files/add_files_complex_nested_stats_mre.test":
        "add_files_complex_nested_stats.test (the MRE is a reduction of "
        "the same nested-stats bug)",
    "add_files/add_files_missing_columns.test":
        "add_files_missing_fields.test + add_files_missing.test",
    "add_files/add_files_table_changes.test": "add_files_changes.test",
    "add_files/add_files_transaction_local.test":
        "add_files_txn_local.test",
    "add_files/add_rollback.test": "add_files_rollback.test",
    "alter/add_column_transaction_local.test":
        "alter_add_column_txn_local.test",
    "alter/expire_snapshot_bug.test": "expire_snapshot_rename_bug.test",
    "alter/mixed_alter.test": "alter_mixed.test",
    "alter/mixed_alter2.test": "alter_mixed2.test",
    "alter/rename_table_within_transaction.test":
        "alter_rename_in_transaction.test",
    "audit/test_base_audit.test": "audit.test",
    "checkpoint/checkpoint_ducklake.test": "checkpoint.test",
    "checkpoint/checkpoint_updates_interleaved.test":
        "checkpoint_interleaved.test",
    "checkpoint/many_inserts_transaction.test":
        "checkpoint_many_inserts.test",
    "checkpoint/view_checkpoint.test":
        "checkpoint_interleaved.test + checkpoint_many_inserts.test "
        "(view survives CHECKPOINT in both)",
    "cleanup/cleanup_old_files.test":
        "cleanup_expire.test + cleanup_old_files_global_option.test; "
        "tests/test_maintenance.py (per-file row drops, retention guard)",
    "cleanup/create_drop_cleanup.test":
        "expire_snapshots_drop_table.test",
    "compaction/compaction_cleanup_global.test":
        "cleanup_old_files_global_option.test",
    "compaction/compaction_full_file_delete.test":
        "compaction_full_delete.test",
    "compaction/compaction_partitioned_non_adjacent.test":
        "compaction_partitioned.test (covers the non-adjacent interleave)",
    "compaction/compaction_partitioned_table.test":
        "compaction_partitioned.test",
    "compaction/mix_large_small_insertions.test":
        "compaction_mix_large_small.test",
    "compaction/multi_compaction.test": "compaction_multi.test",
    "compaction/small_insert_compaction.test":
        "compaction_small_inserts.test",
    "concurrent/concurrent_insert_conflict.test":
        "concurrent_conflict.test; tests/test_concurrency.py "
        "(threaded writers, disjoint-file commits, conflict detection)",
    "concurrent/concurrent_insert_data_inlining.test":
        "data_inlining_concurrent.test",
    "data_inlining/basic_data_inlining.test": "data_inlining.test",
    "data_inlining/data_inlining_option_transaction_local.test":
        "data_inlining_option_txn_local.test",
    "data_inlining/data_inlining_transaction_local_alter.test":
        "data_inlining_txn_local_alter.test",
    "data_inlining/data_inlining_transaction_local_delete.test":
        "data_inlining_txn_local_delete.test",
    "data_inlining/inlining_global_options.test":
        "data_inlining_option.test (global + scoped lifecycle)",
    "data_inlining/insert_inlining_concurrent.test":
        "data_inlining_concurrent.test",
    "delete/basic_delete.test":
        "delete_update.test + empty_delete.test + multi_deletes.test",
    "delete/delete_join.test":
        "delete_using.test (USING each-target-deletes-once semantics)",
    "geo/ducklake_geometry.test": "geo_geometry.test",
    "geo/ducklake_geometry_add_files.test": "geo_add_files.test",
    "geo/ducklake_geometry_inlining.test": "geo_inlining.test",
    "geo/ducklake_geometry_merge.test":
        "geo_dml.test (MERGE/UPDATE/ALTER over GEOMETRY)",
    "geo/ducklake_geometry_nested.test": "geo_nested.test",
    "insert/insert_file_size.test":
        "insert.test (target_file_size split assertions)",
    "insert/insert_into_self.test": "insert_self.test",
    "list_files/ducklake_list_files.test":
        "snapshot_info.test (ducklake_list_files directives incl. "
        "snapshot_version arg)",
    "macros/test_default_parameter.test":
        "macros.test (parameter defaults)",
    "macros/test_defined_types.test": "macro_defined_types.test",
    "macros/test_macro_tables.test": "macros.test (table macros)",
    "macros/test_macro_transactions.test": "macro_transactions.test",
    "macros/test_multiple_implementations.test":
        "macros.test (multi-arity overloads + OR REPLACE)",
    "macros/test_scalar_table_macros.test":
        "macros.test (scalar + table forms)",
    "macros/test_schema_dependency.test": "macro_schema_dependency.test",
    "macros/test_simple_macro.test": "macro_simple_lifecycle.test",
    "merge/merge_partition_update.test": "merge_partition.test",
    "merge/merge_timestamp.test":
        "merge_transform_partition.test (MERGE into year/month "
        "transform partitions)",
    "merge/merge_update_insert.test":
        "merge.test (matched-update + unmatched-insert clauses)",
    "partitioning/basic_partitioning.test": "partitioning.test",
    "partitioning/multi_key_merge.test": "multi_key_merge.test",
    "partitioning/multi_table_partition.test":
        "partitioning.test + multi_key_partition.test; "
        "tests/test_partitioning.py (independent specs per table)",
    "partitioning/year_month_day.test":
        "partitioning_transforms.test (year/month/day transforms)",
    "remove_orphans/remove_orphaned_files.test": "remove_orphans.test",
    "rewrite_data_files/test_last_snapshot_merge_rewrite.test":
        "rewrite_then_merge.test",
    "rowid/ducklake_row_id.test": "rowid.test",
    "rowid/ducklake_row_id_update.test": "rowid_update.test",
    "schema_evolution/field_ids.test":
        "schema_evolution.test + struct_evolution_reuse.test (field-id "
        "stability, fresh ids on drop+readd); tests/test_struct_evolution.py",
    "settings/parquet_compression.test":
        "settings_parquet.test (codec matrix incl. lz4->LZ4_RAW)",
    "settings/parquet_row_group_size_bytes.test":
        "settings_parquet.test; tests/test_settings.py (row-group size "
        "assertions read back from footers)",
    "snapshot_info/ducklake_current_commit.test":
        "functions_snapshots_info.test (ducklake_current_commit UDTF)",
    "snapshot_info/ducklake_last_commit.test":
        "functions_snapshots_info.test (ducklake_last_committed UDTF)",
    "table_changes/ducklake_lower_timestamp.test":
        "table_changes_timestamp.test",
    "table_changes/ducklake_table_changes.test": "table_changes.test",
    "table_changes/ducklake_table_deletions.test":
        "table_changes.test (deletions side) ; tests/test_cdc.py "
        "(ducklake_table_deletions: superseding delta, whole-file "
        "synthesis, rowid column)",
    "table_changes/ducklake_table_insertions.test":
        "table_insertions.test",
    "time_travel/basic_time_travel.test":
        "time_travel.test + time_travel_at.test",
    "transaction/basic_transaction.test":
        "transaction_ddl.test + transaction_rollback.test",
    "transaction/concurrent_table_creation.test": "create_conflict.test",
    "transaction/transaction_conflict_inlining.test":
        "transaction_inlining.test",
    "transaction/transaction_schema.test":
        "transaction_ddl.test (schema create/drop inside txns) + "
        "catalog_schemas.test",
    "types/all_types.test": "types_all.test",
    "update/basic_update.test": "delete_update.test + update_from.test",
    "update/test_update_expression.test":
        "update_same_transaction.test (CASE/expression SET forms)",
    "update/update_join_duplicates.test":
        "update_from.test (duplicate-match rejection + DISTINCT "
        "workaround)",
    "update/update_not_null.test": "update_constraints.test",
    "view/ducklake_rename_view.test":
        "view.test (ALTER VIEW RENAME lifecycle)",
    "view/ducklake_rename_view_incorect.test":
        "view.test + view_table_conflict.test (rename error paths)",
    "view/ducklake_view.test": "view.test",
    "view/ducklake_view_info_columns.test": "view_info_columns.test",
    "view/ducklake_view_schema.test": "view_schemas.test",
    "view/ducklake_view_table_conflict.test": "view_table_conflict.test",
    "virtualcolumns/ducklake_snapshot_id.test":
        "virtual_columns.test (snapshot_id column incl. inlined rows)",
    "virtualcolumns/ducklake_virtual_columns.test": "virtual_columns.test",
    "merge/merge.test": "merge.test",
    # --- pytest-covered engine seams ------------------------------------
    "attach/attach_replace.test":
        "PYTEST tests/test_attach.py (re-attach / OR REPLACE semantics)",
    "attach/different_paths.test":
        "PYTEST tests/test_attach.py (data_path mismatch + override)",
    "general/attach_at_snapshot.test":
        "PYTEST tests/test_attach.py (SNAPSHOT pin incl. macro "
        "resurrection)",
    "general/detach_ducklake.test":
        "PYTEST tests/test_attach.py (detach = session close + "
        "re-attach round trip)",
    "general/ducklake_read_only.test":
        "PYTEST tests/test_read_only.py",
    "general/generated_columns.test":
        "PYTEST tests/test_misc_functions.py (generated-columns "
        "rejection with the reference's error)",
    "general/metadata_parameters.test":
        "PYTEST tests/test_attach.py (META_TYPE / metadata parameters)",
    "general/missing_parquet.test":
        "PYTEST tests/test_paths.py (missing file -> corruption error)",
    "general/prepared_statement.test":
        "PYTEST tests/test_misc_functions.py (parameterized queries)",
    "general/recursive_metadata_catalog.test":
        "PYTEST tests/test_misc_functions.py (metadata-catalog SQL "
        "passthrough guard)",
    "initialize/ducklake_create_new.test":
        "PYTEST tests/test_attach.py (auto-create on first attach)",
    "initialize/read_only_mode.test":
        "PYTEST tests/test_read_only.py",
    "metadata/ducklake_duckdb_tables.test":
        "PYTEST tests/test_info_schema.py (information_schema over the "
        "metadata catalog's own tables)",
    "migration/v01_partitioned.test":
        "PYTEST tests/test_migration.py (old-layout catalog fixtures)",
    "rewrite_data_files/test_rewrite_concurrency.test":
        "PYTEST tests/test_concurrency.py (rewrite vs concurrent delete "
        "conflicts, threaded)",
    "rewrite_data_files/test_rewrite_transaction_conflict.test":
        "compaction_delete_conflict.test; PYTEST tests/test_concurrency.py",
    "secrets/ducklake_secrets.test":
        "PYTEST tests/test_attach.py::test_ducklake_secret_attach",
    # --- remaining renamed ports (no dir-prefix pattern) -----------------
    "catalog/drop_table.test": "drop_table_txn.test",
    "catalog/schema.test": "catalog_schemas.test",
    "compaction/expire_snapshots.test":
        "cleanup_expire.test + expire_versions.test + "
        "expire_snapshots_schema.test",
    "alter/struct_evolution_nested.test":
        "struct_evolution_nested2.test + struct_evolution_nested_alter.test",
    "data_inlining/inlining_issue_on_empty_inline.test":
        "data_inlining_flush_all.test + data_inlining_empty_flush.test",
    "delete/delete_same_transaction.test":
        "empty_delete.test (delete_same_transaction scenario)",
    "ducklake_basic.test":
        "basic_types.test (plus the whole engine — the file is the "
        "upstream hello-world)",
    "encryption/partitioning_encryption.test":
        "encryption_partitioned.test",
    "functions/ducklake_snapshots.test":
        "functions_snapshots_info.test (snapshots UDTF incl. derived "
        "schema_version)",
    "functions/ducklake_table_info.test":
        "functions_snapshots_info.test (table_info after MOR delete)",
    "macros/test_macro_multiple_connections.test":
        "macro_two_sessions.test",
    "partitioning/disable_hive_partitioning.test":
        "partitioning_hive_pattern.test (hive_file_pattern option)",
    "remove_orphans/mixed_paths.test": "remove_orphans_mixed.test",
    "rewrite_data_files/insert_delete_loop.test":
        "rewrite_data_files.test (the loop, unrolled)",
    "rewrite_data_files/last_snapshot_multiple_inserts.test":
        "rewrite_multiple_inserts.test",
    "rewrite_data_files/test_last_snapshot_rewrite.test":
        "rewrite_delete_threshold.test",
    "rewrite_data_files/test_rewrite_db.test": "rewrite_db_wide.test",
    "rewrite_data_files/test_rewrite_merge_adjacent.test":
        "rewrite_then_merge.test",
    "settings/max_retry_count.test": "settings_max_retry.test",
    "transaction/transaction_conflicts.test":
        "transaction_conflicts_delete.test + "
        "transaction_conflicts_view.test",
    "types/list.test": "types_nested.test (list cases)",
    "types/struct.test": "types_nested.test (struct cases)",
    "types/null_byte.test": "strings_null_byte.test",
    # --- pytest-covered engine seams (continued) -------------------------
    "add_files/add_old_list.test":
        "PYTEST tests/test_add_files.py (true 2-level legacy list layout "
        "via normalize_legacy_arrow_lists)",
    "catalog/quoted_identifiers.test":
        "PYTEST tests/test_misc_functions.py::test_quoted_identifiers "
        "(SQL-shim divergence documented there)",
    "concurrent/file_level_conflict.test":
        "PYTEST tests/test_concurrency.py (N threads deleting disjoint "
        "partition files all commit)",
    "data_inlining/inlining_unsupported_systems.test":
        "PYTEST n/a-by-design: inlining works on EVERY metadata backend "
        "here (documented deviation; tests/test_inlined.py)",
    "delete/delete_ignore_extra_columns.test":
        "PYTEST tests/test_catalog_read.py::"
        "test_delete_file_with_extra_columns",
    "general/data_path_tag.test":
        "PYTEST tests/test_attach.py (data_path tag handling)",
    "general/database_size.test":
        "PYTEST tests/test_misc_functions.py (ducklake_database_size())",
    "general/default_path.test":
        "PYTEST tests/test_attach.py (default data-path derivation)",
    "general/paths.test": "PYTEST tests/test_paths.py",
    "macros/test_attach_timetravel.test":
        "PYTEST tests/test_attach.py::"
        "test_attach_pinned_snapshot_resurrects_macro",
    "migration/migration.test": "PYTEST tests/test_migration.py",
    "settings/per_table_settings.test":
        "PYTEST tests/test_settings.py (scoped options, 4-level "
        "precedence, ducklake_options())",
    "stats/cardinality.test":
        "PYTEST tests/test_catalog_read.py::"
        "test_scan_plan_statistics_track_catalog_sizes",
    "transaction/transaction_conflict_cleanup.test":
        "PYTEST tests/test_misc_functions.py::"
        "test_rollback_removes_staged_files",
    # --- no offline / Spark analog --------------------------------------
    "autoloading/autoload_data_path.test":
        "N_A DuckDB extension autoloading has no Spark analog (the "
        "engine is a library import, not a loadable extension)",
    "cloud/test_cloud_cases.test":
        "N_A requires a live object store; Hadoop-FS routes are "
        "exercised via scheme'd file:// paths (tests/test_write_path.py)",
    "general/metadata_cache.test":
        "N_A DuckDB host setting (parquet footer cache); the Spark-side "
        "equivalents are already on (FileStatusCache + the per-delete-"
        "file bitset LRU)",
    # --- .test_slow tier (upstream's SF1-scale files) --------------------
    "tpch/tpch_sf1.test_slow":
        "PYTEST tests/test_official_suites.py — the full 22-query TPC-H "
        "suite cross-engine against DuckDB at bench scale "
        "(OFFICIAL_SUITES.json: 22/22)",
    "clickbench/clickbench.test_slow":
        "PYTEST tests/test_clickbench.py — all 40 ClickBench query texts "
        "through the catalog, cross-engine (CLICKBENCH.json: 40/40; the "
        "reference vendors but skips this file)",
    "partitioning/partition_tpch.test_slow":
        "partition_tpch.test (reduced scale; the upstream glob-count "
        "layout assertions become ducklake_list_files() counts and the "
        "TPC-H answer-file loop becomes the hybrid mirror comparison; "
        "pruning mechanics in tests/test_partitioning.py + "
        "tests/test_file_pruning.py)",
    "merge/merge_into_tpch.test_slow":
        "merge_into_tpch.test (deterministic predicates replace "
        "random(); full clause-shape parity: USING key lists, WHEN "
        "MATCHED THEN ERROR, conditional AND predicates, bare UPDATE, "
        "NOT MATCHED BY TARGET / BY SOURCE)",
}


def main() -> None:
    upstream = sorted(
        str(p.relative_to(REF))
        for pat in ("*.test", "*.test_slow") for p in REF.rglob(pat))
    ours = {f for f in os.listdir(REPO / "tests" / "slt")
            if f.endswith(".test")}
    rows, missing = [], []
    counts = {"same-name": 0, "renamed": 0, "pytest": 0, "n/a": 0}
    for rel in upstream:
        stem = os.path.basename(rel)
        if rel in MAPPED:
            d = MAPPED[rel]
            if d.startswith("N_A"):
                kind = "n/a"
                d = d[4:]
            elif d.startswith("PYTEST"):
                kind = "pytest"
                d = d[7:]
            else:
                kind = "renamed"
                first = d.split()[0].rstrip(";,")
                if first.endswith(".test") and first not in ours:
                    missing.append((rel, first))
        elif stem in ours:
            kind, d = "same-name", f"tests/slt/{stem}"
        elif f"{os.path.dirname(rel)}_{stem}" in ours:
            # dir-prefix convention: upstream alter/add_column.test is our
            # alter_add_column.test (flat corpus, dir folded into the name)
            kind = "renamed"
            d = f"tests/slt/{os.path.dirname(rel)}_{stem}"
        else:
            missing.append((rel, None))
            kind, d = "UNMAPPED", "?"
        counts[kind] = counts.get(kind, 0) + 1
        rows.append((rel, kind, d))
    lines = [
        "# Reference sqllogictest corpus — per-file disposition",
        "",
        "Generated by `python tools/slt_coverage.py` (do not hand-edit).",
        f"Upstream files: {len(upstream)}. "
        f"same-name ports: {counts['same-name']}, renamed ports: "
        f"{counts['renamed']}, pytest-covered: {counts['pytest']}, "
        f"n/a: {counts['n/a']}.",
        "",
        "| upstream file | kind | covered by |",
        "|---|---|---|",
    ]
    for rel, kind, d in rows:
        lines.append(f"| {rel} | {kind} | {d} |")
    OUT.write_text("\n".join(lines) + "\n")
    print(f"wrote {OUT} ({len(rows)} rows)")
    if missing:
        print("MISSING targets:")
        for rel, tgt in missing:
            print("  ", rel, "->", tgt)


if __name__ == "__main__":
    main()
