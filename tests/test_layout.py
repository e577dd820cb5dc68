"""Bucketed-layout (storage-partitioned join) tests: correctness parity
with the shuffle path, plus the plan-level proof that co-bucketed facts
join with ZERO exchanges on the join inputs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_ducklake_spark.operators.layout import (
    export_bucketed, join_side_exchanges)
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed(spark):
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    lb = export_bucketed(li, "t_layout_li", "l_orderkey", 8)
    ob = export_bucketed(o, "t_layout_o", "o_orderkey", 8)
    yield lb, ob
    spark.sql("DROP TABLE IF EXISTS t_layout_li")
    spark.sql("DROP TABLE IF EXISTS t_layout_o")


def _q12_shape(li, o):
    return (li.join(o, li["l_orderkey"] == o["o_orderkey"])
            .groupBy("l_linestatus", "o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy("l_linestatus", "o_orderpriority"))


def test_bucketed_join_elides_exchanges(spark, bucketed):
    lb, ob = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = _q12_shape(lb, ob)
        assert join_side_exchanges(j) == 0, (
            j._jdf.queryExecution().executedPlan().toString())
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_matches_shuffle_join(spark, bucketed):
    lb, ob = bucketed
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    assert (_q12_shape(lb, ob).collect()
            == _q12_shape(li, o).collect())


def test_override_swaps_scan_only(spark, bucketed):
    """Query bodies are layout-independent: injecting the bucketed source
    under queries._util.t leaves results identical."""
    from datafusion_ducklake_spark.queries import REGISTRY
    from datafusion_ducklake_spark.queries._util import set_table_override
    lb, ob = bucketed
    spec = REGISTRY["q12_shipping_buckets"]
    plain = spec.fn(spark, SF_SMOKE).collect()
    set_table_override("lineitem", lb)
    set_table_override("orders", ob)
    try:
        assert spec.fn(spark, SF_SMOKE).collect() == plain
    finally:
        set_table_override("lineitem", None)
        set_table_override("orders", None)
