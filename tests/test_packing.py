"""Sequence packing (functions/packing): distributed global prefix sum
and concat-and-chunk assignment match a driver-side reference."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from datafusion_ducklake_spark.functions.packing import (pack_chunks,
                                                         with_global_offsets)


def test_global_offsets_match_serial_cumsum(spark):
    rng = random.Random(7)
    rows = [(i, rng.randint(0, 50)) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id LONG, n LONG")
    # force several range partitions so partition offsets matter
    got = {r["doc_id"]: r["start"]
           for r in with_global_offsets(df, "n", "doc_id",
                                        num_partitions=7).collect()}
    acc = 0
    for i, n in rows:
        assert got[i] == acc, f"doc {i}"
        acc += n


def test_pack_chunks_straddle_and_ids(spark):
    # budget 10: docs of 4,4,4 -> third doc starts at 8, straddles into
    # chunk 1; a zero-token doc occupies one slot (GREATEST(n,1))
    df = spark.createDataFrame(
        [(1, 4), (2, 4), (3, 4), (4, 0)], "doc_id LONG, n LONG")
    out = {r["doc_id"]: (r["start"], r["chunk_id"], r["straddles"])
           for r in pack_chunks(df, "n", "doc_id", budget=10,
                                num_partitions=3).collect()}
    assert out[1] == (0, 0, 0)
    assert out[2] == (4, 0, 0)
    assert out[3] == (8, 0, 1)       # tokens 8..11 cross the boundary
    assert out[4] == (12, 1, 0)


def test_empty_frame(spark):
    df = spark.createDataFrame([], "doc_id LONG, n LONG")
    assert pack_chunks(df, "n", "doc_id", budget=10).count() == 0
