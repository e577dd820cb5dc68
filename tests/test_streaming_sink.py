"""Exactly-once streaming sink into a DuckLake table
(streaming/sink.py): a real file-source stream lands in the lake; a
replayed foreachBatch epoch (same batch_id) is skipped because the
batch marker commits atomically with the file registrations."""

import pyspark.sql.types as T

from datafusion_ducklake_spark.catalog import DuckLakeSession
from datafusion_ducklake_spark.metadata.writer import CatalogWriter
from datafusion_ducklake_spark.streaming.sink import ducklake_sink


def _mk_catalog(tmp_path):
    db = str(tmp_path / "cat.sqlite")
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=str(tmp_path / "lake"))
    w.close()
    return db


def test_stream_into_lake_exactly_once(spark, tmp_path):
    db = _mk_catalog(tmp_path)
    src = tmp_path / "src"
    src.mkdir()
    spark.range(10).selectExpr("id", "id * 2 AS v") \
        .coalesce(1).write.parquet(str(src / "drop1"))

    schema = T.StructType([T.StructField("id", T.LongType()),
                           T.StructField("v", T.LongType())])
    sink = ducklake_sink(db, "main.sunk", source_id="t1")
    stream = spark.readStream.schema(schema).parquet(f"{src}/*")
    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    dl = DuckLakeSession(spark, db)
    assert dl.table("main.sunk").count() == 10

    # second drop → second run picks up only the new files
    spark.range(10, 15).selectExpr("id", "id * 2 AS v") \
        .coalesce(1).write.parquet(str(src / "drop2"))
    q = (stream.writeStream.foreachBatch(sink)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    dl.refresh()
    assert dl.table("main.sunk").count() == 15

    # crash-replay simulation: Spark re-delivers an epoch with the SAME
    # batch_id after an un-checkpointed commit — the marker skips it
    batch = spark.range(10, 15).selectExpr("id", "id * 2 AS v")
    last_marker = int(dl.provider.get_option("stream_sink:t1:main.sunk"))
    sink(batch, last_marker)           # replay of committed epoch
    dl.refresh()
    assert dl.table("main.sunk").count() == 15

    # a genuinely new epoch commits and advances the marker
    sink(batch, last_marker + 1)
    dl.refresh()
    assert dl.table("main.sunk").count() == 20
    assert int(dl.provider.get_option(
        "stream_sink:t1:main.sunk")) == last_marker + 1


def test_sink_marker_atomic_with_inlined_batch(spark, tmp_path):
    """With data inlining on, the batch marker still commits atomically
    with the rows (review fix: it previously landed in a second
    transaction)."""
    db = _mk_catalog(tmp_path)
    dl = DuckLakeSession(spark, db)
    dl.create_table("main.s2", spark.range(1).selectExpr("id"))
    dl.set_option("data_inlining_row_limit", 100)
    sink = ducklake_sink(db, "main.s2", source_id="inl")
    sink(spark.range(10, 13).selectExpr("id"), 0)
    dl.refresh()
    assert dl.table("main.s2").count() == 4
    assert len(dl.table_handle("main.s2").inlined_rows()) == 3
    assert dl.provider.get_option("stream_sink:inl:main.s2") == "0"
    # replay of the same epoch is skipped
    sink(spark.range(10, 13).selectExpr("id"), 0)
    dl.refresh()
    assert dl.table("main.s2").count() == 4
