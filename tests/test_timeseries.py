"""Unit tests for functions/timeseries: asof_join + gap_fill semantics.

The asof contract mirrors pandas merge_asof / DuckDB ASOF JOIN (which is
also the oracle for the gated query events_asof_last_purchase): backward
picks the greatest right_ts <= left_ts per key, inclusive; forward the
smallest right_ts >= left_ts; tolerance nulls stale matches.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from datafusion_ducklake_spark.functions.timeseries import (
    ASOF_TS, asof_join, gap_fill)


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, "u", _ts(10)), (2, "u", _ts(20)), (3, "u", _ts(5)),
         (4, "v", _ts(15)), (5, "w", _ts(30))],
        "id INT, k STRING, ts TIMESTAMP")
    right = spark.createDataFrame(
        [("u", _ts(8), 80.0), ("u", _ts(20), 200.0), ("v", _ts(16), 160.0)],
        "k STRING, rts TIMESTAMP, px DOUBLE")
    return left, right


def test_asof_backward_inclusive(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, ["k"], "ts", "rts")
    got = {r["id"]: r["px"] for r in out.collect()}
    # id=1 (u@10) -> u@8; id=2 (u@20) -> u@20 (inclusive tie);
    # id=3 (u@5) -> none; id=4 (v@15) -> none (v@16 is later); id=5 -> none
    assert got == {1: 80.0, 2: 200.0, 3: None, 4: None, 5: None}
    assert out.count() == 5                      # left join keeps all


def test_asof_forward(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, ["k"], "ts", "rts", direction="forward")
    got = {r["id"]: r["px"] for r in out.collect()}
    # forward: id=1 (u@10) -> u@20; id=3 (u@5) -> u@8; id=4 (v@15) -> v@16
    assert got == {1: 200.0, 2: 200.0, 3: 80.0, 4: 160.0, 5: None}


def test_asof_tolerance_and_inner(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, ["k"], "ts", "rts",
                    tolerance=F.expr("INTERVAL 3 SECONDS"))
    got = {r["id"]: r["px"] for r in out.collect()}
    # id=1: u@8 is 2s stale (within 3s); id=2: exact; others none
    assert got == {1: 80.0, 2: 200.0, 3: None, 4: None, 5: None}
    inner = asof_join(left, right, ["k"], "ts", "rts", how="inner")
    assert sorted(r["id"] for r in inner.collect()) == [1, 2]


def test_asof_carries_match_timestamp(spark):
    left, right = _frames(spark)
    out = asof_join(left, right, ["k"], "ts", "rts")
    ts_of = {r["id"]: r[ASOF_TS] for r in out.collect()}
    assert ts_of[1] == _ts(8) and ts_of[2] == _ts(20) and ts_of[3] is None


def test_gap_fill_dense_buckets(spark):
    agg = spark.createDataFrame(
        [("a", _ts(0), 2, 1.5), ("a", _ts(3), 1, 0.5), ("b", _ts(1), 4, 4.0)],
        "g STRING, h TIMESTAMP, n BIGINT, total DOUBLE")
    dense = gap_fill(agg, ["g"], "h", F.expr("INTERVAL 1 SECOND"),
                     fill={"n": 0, "total": 0.0})
    rows = {(r["g"], r["h"].second): (r["n"], r["total"])
            for r in dense.collect()}
    # bounds are global (sec 0..3): both groups get 4 buckets
    assert len(rows) == 8
    assert rows[("a", 1)] == (0, 0.0) and rows[("a", 2)] == (0, 0.0)
    assert rows[("b", 1)] == (4, 4.0) and rows[("b", 0)] == (0, 0.0)
    assert rows[("a", 0)] == (2, 1.5) and rows[("a", 3)] == (1, 0.5)
