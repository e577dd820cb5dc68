"""Streaming tests: file-source CDC inserts, watermarked windows,
stateful sessionization — all run with availableNow/processAllAvailable
so they terminate deterministically."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from datafusion_ducklake_spark.catalog import DuckLakeSession
from datafusion_ducklake_spark.metadata.writer import CatalogWriter
from datafusion_ducklake_spark.streaming import cdc_source, sessionize, windows


@pytest.fixture()
def fresh_dl(spark, tmp_path):
    db = str(tmp_path / "catalog.sqlite")
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=str(tmp_path / "lake"))
    w.close()
    return DuckLakeSession(spark, db)


def test_stream_inserts_sees_appends(spark, fresh_dl, tmp_path):
    fresh_dl.create_table("main.ev", spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "id BIGINT, v DOUBLE"))
    fresh_dl.insert_into("main.ev", spark.createDataFrame(
        [(3, 30.0)], "id BIGINT, v DOUBLE"))

    stream = cdc_source.stream_inserts(fresh_dl, "main.ev")
    assert stream.isStreaming
    out = str(tmp_path / "sink")
    q = (stream.writeStream.format("memory").queryName("ins")
         .trigger(availableNow=True)
         .option("checkpointLocation", out).start())
    q.awaitTermination(60)
    got = sorted(r["id"] for r in spark.sql("SELECT * FROM ins").collect())
    assert got == [1, 2, 3]


@pytest.mark.slow
def test_replay_changes_batches_in_order(spark, fresh_dl):
    fresh_dl.create_table("main.t", spark.createDataFrame(
        [(1,)], "id BIGINT"))
    fresh_dl.insert_into("main.t", spark.createDataFrame([(2,)], "id BIGINT"))
    fresh_dl.insert_into("main.t", spark.createDataFrame([(3,)], "id BIGINT"))
    end = fresh_dl.provider.get_current_snapshot()

    seen = []
    n = cdc_source.replay_changes(
        fresh_dl, "main.t", 0, end,
        lambda df, snap: seen.append((snap, sorted(r["id"] for r in df.collect()))))
    assert n == 3
    assert [ids for _, ids in seen] == [[1], [2], [3]]
    assert [s for s, _ in seen] == sorted(s for s, _ in seen)


def test_windowed_rollup_stream(spark, tmp_path):
    src_dir = str(tmp_path / "events_src")
    rows = [("2024-01-01 00:10:00", "click", 1.0, 1),
            ("2024-01-01 00:50:00", "click", 2.0, 2),
            ("2024-01-01 01:10:00", "view", 3.0, 1),
            ("2024-01-01 01:20:00", "click", 4.0, 3)]
    df = spark.createDataFrame(rows, "ts_s STRING, event_type STRING, value DOUBLE, user_id BIGINT") \
        .select(F.col("ts_s").cast("timestamp").alias("ts"),
                "event_type", "value", "user_id")
    df.write.parquet(src_dir)

    stream = (spark.readStream.schema(df.schema).parquet(src_dir))
    rolled = windows.hourly_rollup_stream(stream, watermark="1 hour")
    q = (rolled.writeStream.format("memory").queryName("rollup")
         .outputMode("complete")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = {(str(r["window_start"]), r["event_type"]): r["n_events"]
           for r in spark.sql("SELECT * FROM rollup").collect()}
    assert got[("2024-01-01 00:00:00", "click")] == 2
    assert got[("2024-01-01 01:00:00", "click")] == 1
    assert got[("2024-01-01 01:00:00", "view")] == 1


def _events_batch(spark, rows):
    return spark.createDataFrame(
        rows, "user_id BIGINT, ts_us BIGINT, value DOUBLE")


def test_sessionize_batch_semantics(spark):
    gap = 30 * 60 * 1_000_000
    h = 3_600_000_000
    rows = [(1, 0, 1.0), (1, 10**6, 2.0), (1, 2 * h, 5.0),  # two sessions
            (2, 0, 7.0)]
    out = sessionize.sessionize_batch(_events_batch(spark, rows), gap_us=gap)
    got = sorted((r["user_id"], r["session_start_us"], r["n_events"],
                  r["total_value"]) for r in out.collect())
    assert got == [(1, 0, 2, 3.0), (1, 2 * h, 1, 5.0), (2, 0, 1, 7.0)]


@pytest.mark.slow
def test_sessionize_stream_matches_batch(spark, tmp_path):
    gap = 30 * 60 * 1_000_000
    h = 3_600_000_000
    rows = [(1, 0, 1.0), (1, 10**6, 2.0), (1, 2 * h, 5.0), (2, 0, 7.0)]
    src = str(tmp_path / "sess_src")
    _events_batch(spark, rows).write.parquet(src)

    stream = spark.readStream.schema(
        "user_id BIGINT, ts_us BIGINT, value DOUBLE").parquet(src)
    sessions = sessionize.sessionize_stream(stream, gap_us=gap)
    q = (sessions.writeStream.format("memory").queryName("sess")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    # Gap-closed sessions are always emitted; trailing (open) sessions are
    # emitted only if the processing-time timeout fires before the run ends
    # — timing-dependent under availableNow, so assert containment.
    got = sorted((r["user_id"], r["session_start_us"], r["n_events"])
                 for r in spark.sql("SELECT * FROM sess").collect())
    full = [(1, 0, 2), (1, 2 * h, 1), (2, 0, 1)]  # == batch twin's output
    assert (1, 0, 2) in got
    assert set(got) <= set(full)


def test_stream_inserts_ignores_delete_files(spark, fresh_dl, tmp_path):
    """ADVICE r1: a positional-delete parquet in the table dir must not
    stream as all-NULL rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import uuid as _uuid

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id INT, s STRING")
    fresh_dl.create_table("main.evd", df)
    # drop a delete-style parquet next to the data (as DELETE would)
    handle = fresh_dl.table_handle("main.evd")
    dpath = f"{handle.table_path}/ducklake-delete-{_uuid.uuid4()}.parquet"
    pq.write_table(pa.table({"file_path": pa.array(["x"], pa.string()),
                             "pos": pa.array([0], pa.int64())}), dpath)

    from datafusion_ducklake_spark.streaming import cdc_source
    stream = cdc_source.stream_inserts(fresh_dl, "main.evd")
    q = (stream.writeStream.format("memory").queryName("evd_sink")
         .trigger(availableNow=True).start())
    q.awaitTermination(60)
    rows = sorted((r["id"], r["s"])
                  for r in spark.sql("SELECT * FROM evd_sink").collect())
    assert rows == [(1, "a"), (2, "b")]  # no NULL rows from the delete file


def test_glob_stream_rejects_rewritten_tables(spark, fresh_dl):
    """Overwrite leaves superseded files on disk; the glob file source
    would re-emit them as duplicates, so that mode must refuse
    (ADVICE r1). The catalog mode handles these tables instead."""
    from datafusion_ducklake_spark.errors import InvalidConfig
    from datafusion_ducklake_spark.streaming import cdc_source

    df = spark.createDataFrame([(1, "a")], "id INT, s STRING")
    fresh_dl.create_table("main.evo", df)
    fresh_dl.insert_into("main.evo", df, overwrite=True)
    with pytest.raises(InvalidConfig, match="append-only"):
        cdc_source.stream_inserts(fresh_dl, "main.evo", mode="glob")


@pytest.mark.slow
def test_catalog_stream_exactly_once_across_compaction(spark, fresh_dl,
                                                       tmp_path):
    """The catalog-driven stream's rowid-extent offsets make compaction
    invisible: rewritten files preserve rowids and land below the offset,
    so every row is delivered exactly once across delete + compact +
    append (the r2 verdict's stream-over-compacted-table contract)."""
    fresh_dl.create_table("main.evc", spark.createDataFrame(
        [(i, float(i)) for i in range(10)], "id BIGINT, v DOUBLE"))
    fresh_dl.delete_from("main.evc", "id IN (2, 5, 7)")
    fresh_dl.compact("main.evc")          # rewrites files, keeps rowids

    ckpt = str(tmp_path / "ckpt_evc")
    sink = str(tmp_path / "sink_evc")

    def run_once():
        stream = cdc_source.stream_inserts(fresh_dl, "main.evc")
        q = (stream.writeStream.format("parquet")
             .option("path", sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(60)

    run_once()
    got = sorted(r["id"] for r in spark.read.parquet(sink).collect())
    assert got == [i for i in range(10) if i not in (2, 5, 7)]  # once each

    # append after compaction: only the new rows arrive on the next run
    fresh_dl.insert_into("main.evc", spark.createDataFrame(
        [(100, 1.0), (101, 2.0)], "id BIGINT, v DOUBLE"))
    run_once()
    got2 = sorted(r["id"] for r in spark.read.parquet(sink).collect())
    assert got2 == got + [100, 101]       # exactly the two new rows added


def test_dedup_stream_within_watermark(spark, tmp_path):
    from datafusion_ducklake_spark.streaming import dedup_join
    src = str(tmp_path / "dd_src")
    rows = [(1, "2024-01-01 00:00:00", 10, "click", 1.0, None),
            (2, "2024-01-01 00:00:00", 10, "click", 1.0, None),  # dup of 1
            (3, "2024-01-01 00:05:00", 10, "click", 2.0, None),
            (4, "2024-01-01 00:05:00", 11, "view", 3.0, None)]
    df = spark.createDataFrame(
        rows, "event_id BIGINT, ts_s STRING, user_id BIGINT, "
              "event_type STRING, value DOUBLE, props STRING") \
        .select("event_id", F.col("ts_s").cast("timestamp").alias("ts"),
                "user_id", "event_type", "value", "props")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = dedup_join.dedup_stream(stream, watermark="10 minutes")
    q = (out.writeStream.format("memory").queryName("dd")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "dd_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = sorted((r["user_id"], str(r["ts"]))
                 for r in spark.sql("SELECT * FROM dd").collect())
    assert got == [(10, "2024-01-01 00:00:00"),
                   (10, "2024-01-01 00:05:00"),
                   (11, "2024-01-01 00:05:00")]


def test_click_attribution_stream_matches_batch(spark, tmp_path):
    """The stream-stream interval join must produce exactly the pairs the
    batch twin's join produces on the same data."""
    from datafusion_ducklake_spark.streaming import dedup_join
    src = str(tmp_path / "att_src")
    rows = [(1, "2024-01-01 00:10:00", 1, "click", 0.0, None),
            (2, "2024-01-01 00:50:00", 1, "purchase", 9.0, None),   # <- 1
            (3, "2024-01-01 02:00:00", 1, "purchase", 9.0, None),   # none
            (4, "2024-01-01 00:45:00", 2, "click", 0.0, None),
            (5, "2024-01-01 00:55:00", 2, "click", 0.0, None),
            (6, "2024-01-01 01:00:00", 2, "purchase", 9.0, None),   # <- 4,5
            (7, "2024-01-01 01:00:00", 3, "view", 0.0, None)]
    df = spark.createDataFrame(
        rows, "event_id BIGINT, ts_s STRING, user_id BIGINT, "
              "event_type STRING, value DOUBLE, props STRING") \
        .select("event_id", F.col("ts_s").cast("timestamp").alias("ts"),
                "user_id", "event_type", "value", "props")
    df.write.parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = dedup_join.click_attribution_stream(stream, horizon="1 hour")
    q = (out.writeStream.format("memory").queryName("att")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / "att_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted((r["purchase_id"], r["click_id"])
                 for r in spark.sql("SELECT * FROM att").collect())
    assert got == [(2, 1), (6, 4), (6, 5)]


@pytest.mark.slow
def test_catalog_stream_over_partition_transform_table(spark, fresh_dl,
                                                       tmp_path):
    """r3 VERDICT next #8: the catalog-driven stream over a table with a
    partition TRANSFORM spec (year(ts)/month(ts) hive layout). The base
    columns stay in the parquet files, so every per-partition file
    streams under its rowid extent; a later partitioned insert arrives
    incrementally and exactly once."""
    import datetime

    rows = [(i, datetime.datetime(2020, 11, 1) + datetime.timedelta(
        hours=30 * i)) for i in range(40)]
    mk = lambda rs: spark.createDataFrame(rs, "id BIGINT, ts TIMESTAMP_NTZ")  # noqa: E731
    fresh_dl.create_table("main.pt", mk(rows).limit(0))
    fresh_dl.set_partitioned_by("main.pt", ["year(ts)", "month(ts)"])
    fresh_dl.insert_into("main.pt", mk(rows[:25]))
    handle = fresh_dl.table_handle("main.pt")
    assert any("year=" in f.path for f in handle._raw_files)  # real split

    ckpt, sink = str(tmp_path / "ckpt_pt"), str(tmp_path / "sink_pt")

    def run_once():
        q = (cdc_source.stream_inserts(fresh_dl, "main.pt")
             .writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(60)

    run_once()
    got = sorted((r["id"], r["ts"])
                 for r in spark.read.parquet(sink).collect())
    assert got == sorted(rows[:25])

    fresh_dl.insert_into("main.pt", mk(rows[25:]))
    run_once()
    got2 = sorted((r["id"], r["ts"])
                  for r in spark.read.parquet(sink).collect())
    assert got2 == sorted(rows)           # each row exactly once


@pytest.mark.slow
def test_catalog_stream_over_encrypted_table(spark, tmp_path):
    """r3 VERDICT next #8: the catalog-driven stream decrypts PME files
    executor-side (the stored footer key ships inside the serialized
    partition). Rows stream exactly once across an encrypted append."""
    from datafusion_ducklake_spark.sources import encryption as enc

    db = str(tmp_path / "enc_stream.sqlite")
    w = CatalogWriter.sqlite(db)
    w.initialize_schema(data_path=str(tmp_path / "lake"))
    w.set_option("encrypted", "true")
    w.close()
    edl = DuckLakeSession(spark, db)
    edl.create_table("main.es", spark.createDataFrame(
        [(i, f"s{i}") for i in range(8)], "id BIGINT, s STRING"))
    handle = edl.table_handle("main.es")
    assert all(f.encryption_key is not None for f in handle.files)
    for f in handle.files:
        p = f.data_uri.removeprefix("file://")
        assert enc.is_encrypted_parquet(p), p  # actually PME on disk

    ckpt, sink = str(tmp_path / "ckpt_es"), str(tmp_path / "sink_es")

    def run_once():
        q = (cdc_source.stream_inserts(edl, "main.es")
             .writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(60)

    run_once()
    got = sorted((r["id"], r["s"]) for r in spark.read.parquet(sink).collect())
    assert got == [(i, f"s{i}") for i in range(8)]

    edl.insert_into("main.es", spark.createDataFrame(
        [(100, "x")], "id BIGINT, s STRING"))
    run_once()
    got2 = sorted(r["id"] for r in spark.read.parquet(sink).collect())
    assert got2 == list(range(8)) + [100]


@pytest.mark.slow
def test_catalog_stream_exactly_once_across_flush(spark, fresh_dl, tmp_path):
    """Inlined rows are invisible to the insert stream; a flush migrates
    them to a rowid-in-file parquet (row_id_start NULL) whose extent
    places it ABOVE the already-seen offset — the rows then stream
    exactly once, under their original rowids."""
    fresh_dl.create_table("main.evf", spark.createDataFrame(
        [(1, "a"), (2, "b")], "id BIGINT, s STRING"))
    fresh_dl.set_option("data_inlining_row_limit", 10)

    ckpt, sink = str(tmp_path / "ckpt_evf"), str(tmp_path / "sink_evf")

    def run_once():
        q = (cdc_source.stream_inserts(fresh_dl, "main.evf")
             .writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(60)

    run_once()
    got = sorted(r["id"] for r in spark.read.parquet(sink).collect())
    assert got == [1, 2]

    fresh_dl.insert_into("main.evf", spark.createDataFrame(
        [(3, "c")], "id BIGINT, s STRING"))           # inlined — invisible
    run_once()
    got = sorted(r["id"] for r in spark.read.parquet(sink).collect())
    assert got == [1, 2]

    fresh_dl.flush_inlined_data("main.evf")           # now a file — emits
    run_once()
    got = sorted(r["id"] for r in spark.read.parquet(sink).collect())
    assert got == [1, 2, 3]

    run_once()                                        # and only once
    got = sorted(r["id"] for r in spark.read.parquet(sink).collect())
    assert got == [1, 2, 3]


@pytest.mark.slow
def test_catalog_stream_silent_across_update_rewrite(spark, fresh_dl,
                                                     tmp_path):
    """UPDATE rewrites register rowid-in-file files (row_id_start NULL);
    their rows' ORIGINAL file stays live in the raw insert stream, so
    the rewrite must not re-emit. (Before round 5 the reader raised on
    any NULL-start file — streaming after UPDATE was broken.)"""
    fresh_dl.create_table("main.evu", spark.createDataFrame(
        [(i, float(i)) for i in range(5)], "id BIGINT, v DOUBLE"))

    ckpt, sink = str(tmp_path / "ckpt_evu"), str(tmp_path / "sink_evu")

    def run_once():
        q = (cdc_source.stream_inserts(fresh_dl, "main.evu")
             .writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(60)

    run_once()
    got = sorted(r["id"] for r in spark.read.parquet(sink).collect())
    assert got == [0, 1, 2, 3, 4]

    assert fresh_dl.update_where("main.evu", {"v": "v + 100"}, "id = 2") == 1
    assert any(f.row_id_start is None
               for f in fresh_dl.table_handle("main.evu").files)
    run_once()                                        # rewrite is silent
    got = sorted(r["id"] for r in spark.read.parquet(sink).collect())
    assert got == [0, 1, 2, 3, 4]

    fresh_dl.insert_into("main.evu", spark.createDataFrame(
        [(100, 0.5)], "id BIGINT, v DOUBLE"))
    run_once()                                        # appends still flow
    got = sorted(r["id"] for r in spark.read.parquet(sink).collect())
    assert got == [0, 1, 2, 3, 4, 100]


@pytest.mark.slow
def test_catalog_stream_flush_after_later_file_insert(spark, fresh_dl,
                                                      tmp_path):
    """Inlined rowids can sit BELOW file rowids registered later
    (insert-inlined → insert-parquet → stream → flush). The flush file
    rides a separate 'flush' offset axis, so its rows still stream
    exactly once even though the main rowid watermark already passed
    their ids."""
    fresh_dl.create_table("main.evi", spark.createDataFrame(
        [(1, "a"), (2, "b")], "id BIGINT, s STRING"))
    fresh_dl.set_option("data_inlining_row_limit", 3)
    fresh_dl.insert_into("main.evi", spark.createDataFrame(
        [(3, "c")], "id BIGINT, s STRING"))            # inlined, rowid 2
    fresh_dl.insert_into("main.evi", spark.createDataFrame(
        [(10 + i, "x") for i in range(5)], "id BIGINT, s STRING"))  # file

    ckpt, sink = str(tmp_path / "ckpt_evi"), str(tmp_path / "sink_evi")

    def run_once():
        q = (cdc_source.stream_inserts(fresh_dl, "main.evi")
             .writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(60)

    run_once()      # watermark passes the later file's rowids
    got = sorted(r["id"] for r in spark.read.parquet(sink).collect())
    assert got == [1, 2, 10, 11, 12, 13, 14]           # inlined invisible

    fresh_dl.flush_inlined_data("main.evi")
    run_once()      # the below-watermark flush file still emits
    got = sorted(r["id"] for r in spark.read.parquet(sink).collect())
    assert got == [1, 2, 3, 10, 11, 12, 13, 14]

    run_once()      # exactly once
    got = sorted(r["id"] for r in spark.read.parquet(sink).collect())
    assert got == [1, 2, 3, 10, 11, 12, 13, 14]


@pytest.mark.slow
def test_catalog_stream_after_gapped_merge(spark, fresh_dl, tmp_path):
    """Compaction outputs carrying in-file rowids (gapped per-partition
    merge) must stream to a FRESH consumer (their originals are ended)
    while a caught-up consumer, which already received the rows from
    the pre-merge files, gets no duplicates."""
    fresh_dl.create_table("main.evg", spark.createDataFrame(
        [(1, 10)], "pk INT, v INT"))
    fresh_dl.sql("ALTER TABLE evg SET PARTITIONED BY (pk)")
    for pk, v in [(2, 100), (1, 20), (2, 200)]:
        fresh_dl.insert_into("main.evg", spark.createDataFrame(
            [(pk, v)], "pk INT, v INT"))

    ckpt_a, sink_a = str(tmp_path / "ck_a"), str(tmp_path / "sk_a")

    def run(ckpt, sink):
        q = (cdc_source.stream_inserts(fresh_dl, "main.evg")
             .writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(60)

    run(ckpt_a, sink_a)        # consumer A catches up pre-merge
    got_a = sorted(r["v"] for r in spark.read.parquet(sink_a).collect())
    assert got_a == [10, 20, 100, 200]

    fresh_dl.sql("CALL ducklake_merge_adjacent_files()")
    files = fresh_dl.table_handle("main.evg").files
    assert any(f.row_id_start is None for f in files)   # gapped outputs

    run(ckpt_a, sink_a)        # caught-up consumer: no duplicates
    got_a = sorted(r["v"] for r in spark.read.parquet(sink_a).collect())
    assert got_a == [10, 20, 100, 200]

    # fresh consumer B, started AFTER the merge, still gets every row
    ckpt_b, sink_b = str(tmp_path / "ck_b"), str(tmp_path / "sk_b")
    run(ckpt_b, sink_b)
    got_b = sorted(r["v"] for r in spark.read.parquet(sink_b).collect())
    assert got_b == [10, 20, 100, 200]


@pytest.mark.slow
def test_compaction_straddling_partial_consumer_delivers_tail(
        spark, fresh_dl, tmp_path):
    """ADVICE r5 (medium): a compaction output whose rowid extent
    STRADDLES a partially-caught-up consumer's watermark (lo < watermark
    <= max) used to be skipped whole — the undelivered tail between the
    watermark and the file max was silently lost. The output must now
    stream filtered to rowid >= watermark: the tail exactly once, no
    duplicates of the already-delivered head."""
    fresh_dl.create_table("main.evs", spark.createDataFrame(
        [(i, float(i)) for i in range(5)], "id BIGINT, v DOUBLE"))

    ckpt, sink = str(tmp_path / "ck_s"), str(tmp_path / "sk_s")

    def run():
        q = (cdc_source.stream_inserts(fresh_dl, "main.evs")
             .writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(60)

    run()                       # consumer catches up to rowid 5
    assert sorted(r["id"] for r in spark.read.parquet(sink).collect()) \
        == [0, 1, 2, 3, 4]

    # a second file lands (rowids 5..9) that the consumer does NOT see,
    # then compaction folds both files into one rowid-in-file output
    # whose extent straddles the watermark (0 < 5 <= 9)
    fresh_dl.insert_into("main.evs", spark.createDataFrame(
        [(i, float(i)) for i in range(5, 10)], "id BIGINT, v DOUBLE"))
    fresh_dl.compact("main.evs")
    files = fresh_dl.table_handle("main.evs").files
    # contiguous compact → catalog-started output straddling the
    # watermark on the MAIN axis (rowid = start + position)
    assert [f.row_id_start for f in files] == [0]

    run()                       # must deliver EXACTLY the tail
    got = sorted(r["id"] for r in spark.read.parquet(sink).collect())
    assert got == list(range(10))


@pytest.mark.slow
def test_compaction_straddle_rowid_in_file_variant(
        spark, fresh_dl, tmp_path):
    """Same straddle, rowid-IN-FILE flavor: an UPDATE before compaction
    forces the compacted output to carry rowids in-file (NULL start), so
    the tail is recovered by filtering the reserved rowid column."""
    fresh_dl.create_table("main.evt", spark.createDataFrame(
        [(i, float(i)) for i in range(5)], "id BIGINT, v DOUBLE"))

    ckpt, sink = str(tmp_path / "ck_t"), str(tmp_path / "sk_t")

    def run():
        q = (cdc_source.stream_inserts(fresh_dl, "main.evt")
             .writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(60)

    run()                       # watermark at rowid 5
    fresh_dl.insert_into("main.evt", spark.createDataFrame(
        [(i, float(i)) for i in range(5, 10)], "id BIGINT, v DOUBLE"))
    # UPDATE (rewrite keeping rowids) then compact: output is NULL-start
    fresh_dl.update_where("main.evt", {"v": "v + 0.5"}, "id = 0")
    fresh_dl.compact("main.evt")
    files = fresh_dl.table_handle("main.evt").files
    assert all(f.row_id_start is None for f in files)

    run()
    got = sorted(r["id"] for r in spark.read.parquet(sink).collect())
    assert got == list(range(10))   # tail exactly once, head not repeated


@pytest.mark.slow
def test_second_compaction_after_insert_without_batch(
        spark, fresh_dl, tmp_path):
    """Code-review r6: the flush axis is keyed by REGISTRATION SNAPSHOT,
    not min in-file rowid — with a min-rowid key, a second compaction
    output starting at rowid 0 lands below the flush watermark advanced
    by the first one and the rows inserted between the two compactions
    (never streamed) are silently lost."""
    fresh_dl.create_table("main.evu", spark.createDataFrame(
        [(i,) for i in range(5)], "id BIGINT"))
    fresh_dl.update_where("main.evu", {"id": "id"}, "id = 0")  # keep rowids
    fresh_dl.compact("main.evu")    # rowid-in-file output, min rowid 0
    ckpt, sink = str(tmp_path / "ck_u"), str(tmp_path / "sk_u")

    def run():
        q = (cdc_source.stream_inserts(fresh_dl, "main.evu")
             .writeStream.format("parquet").option("path", sink)
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(60)

    run()     # consumer catches up THROUGH the first compaction output
    assert sorted(r["id"] for r in spark.read.parquet(sink).collect()) \
        == [0, 1, 2, 3, 4]

    # new rows land and a SECOND compaction folds them in before any
    # batch runs — its output's min rowid is again 0
    fresh_dl.insert_into("main.evu", spark.createDataFrame(
        [(i,) for i in range(5, 10)], "id BIGINT"))
    fresh_dl.update_where("main.evu", {"id": "id"}, "id = 0")
    fresh_dl.compact("main.evu")
    files = fresh_dl.table_handle("main.evu").files
    assert all(f.row_id_start is None for f in files)

    run()     # the in-between rows must arrive exactly once
    got = sorted(r["id"] for r in spark.read.parquet(sink).collect())
    assert got == list(range(10))
