"""datafusion_ducklake_spark — a PySpark-native analytics engine with the
capabilities of the reference DataFusion+DuckLake extension
(hotdata-dev/datafusion-ducklake), rebuilt Spark-first.

Layers
------
- ``metadata/``  — DuckLake catalog-DB providers (sqlite3 / duckdb) issuing
  the reference's 15 catalog SQL queries (ref: src/metadata_provider.rs).
- ``catalog``    — snapshot-pinned Catalog→Schema→Table chain
  (ref: src/catalog.rs, src/schema.rs, src/table.rs).
- ``sources/``   — snapshot-consistent Parquet scan with merge-on-read
  delete filtering and field-id renames (ref: src/delete_filter.rs,
  src/column_rename.rs).
- ``operators/`` — CDC table functions, information_schema
  (ref: src/table_changes.rs, src/table_deletions.rs,
  src/information_schema.rs).
- ``queries/``   — the analytics query suite exercised by the driver's
  correctness/bench gates (TPC-H-ish, events, documents, embeddings).
- ``functions/`` — training-data pipeline ops: dedup (exact/minhash/simhash),
  similarity search, text analysis, multimodal plumbing.
"""

from __future__ import annotations

__version__ = "0.1.0"
