"""Measure the storage-partitioned (bucketed) join against the shuffle
join on the r4 weak queries (q12/q07 — both dominated by the
lineitem⋈orders fact-fact exchange).

Writes BENCH_bucketed.json: per-tier, per-query wall times for the plain
parquet layout vs the catalog-controlled bucketed layout (facts
re-clustered by orderkey via operators/layout.export_bucketed), plus the
one-time export cost — the honest amortization denominator.

Usage: python tools/bench_bucketed.py [scale ...]   (default: 10 30)
"""

from __future__ import annotations

import json
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench as benchmod
from datafusion_ducklake_spark.operators.layout import (
    export_bucketed, join_side_exchanges)
from datafusion_ducklake_spark.queries import REGISTRY
from datafusion_ducklake_spark.queries._util import (
    set_exact_sums, set_table_override, t)
from datafusion_ducklake_spark.sparkutil import build_spark
from tools.scale_data import scale_dir

QUERIES = ["q12_shipping_buckets", "q07_volume_shipping",
           "q04_order_priority"]
BUCKETS = 64  # 2x local cores; at cluster scale pick 2-4x executor cores


def _time(fn, iters=3):
    runs = []
    for _ in range(iters):
        t0 = time.perf_counter()
        benchmod._materialize(fn())
        runs.append(time.perf_counter() - t0)
    return round(statistics.mean(runs), 4), round(min(runs), 4)


def main() -> None:
    scales = [int(a) for a in sys.argv[1:]] or [10, 30]
    spark = build_spark("ducklake-bench-bucketed")
    spark.sparkContext.setLogLevel("ERROR")
    set_exact_sums(False)
    out = {"buckets": BUCKETS, "tiers": {}}
    for sc in scales:
        d = scale_dir("/root/testdata/sf0.1", sc, str(REPO / ".bench_scaled"))
        benchmod._tune_for_dir(spark, d)
        tier = {"sf_equivalent": round(0.1 * sc, 2), "plain": {},
                "bucketed": {}, "plain_min": {}, "bucketed_min": {}}

        # warm both layouts' scans
        for q in QUERIES:
            benchmod._materialize(REGISTRY[q].fn(spark, d))
        for q in QUERIES:
            tier["plain"][q], tier["plain_min"][q] = _time(
                lambda q=q: REGISTRY[q].fn(spark, d))

        t0 = time.perf_counter()
        lb = export_bucketed(t(spark, d, "lineitem"),
                             f"bkt_lineitem_{sc}", "l_orderkey", BUCKETS)
        ob = export_bucketed(t(spark, d, "orders"),
                             f"bkt_orders_{sc}", "o_orderkey", BUCKETS)
        tier["export_sec"] = round(time.perf_counter() - t0, 2)

        # the storage-partitioned join matters exactly when neither fact
        # fits broadcast (the 100 TB regime); measure that regime too by
        # disabling broadcast for a second pass on BOTH layouts
        set_table_override("lineitem", lb)
        set_table_override("orders", ob)
        try:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            probe = (lb.join(ob, lb["l_orderkey"] == ob["o_orderkey"])
                     .groupBy("o_orderpriority").count())
            probe.collect()
            tier["join_side_exchanges"] = join_side_exchanges(probe)
            benchmod._tune_for_dir(spark, d)  # restore broadcast conf
            for q in QUERIES:
                benchmod._materialize(REGISTRY[q].fn(spark, d))  # warm
            for q in QUERIES:
                tier["bucketed"][q], tier["bucketed_min"][q] = _time(
                    lambda q=q: REGISTRY[q].fn(spark, d))
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            tier["bucketed_nobc_min"] = {}
            for q in QUERIES:
                _, tier["bucketed_nobc_min"][q] = _time(
                    lambda q=q: REGISTRY[q].fn(spark, d), iters=2)
        finally:
            set_table_override("lineitem", None)
            set_table_override("orders", None)
        tier["plain_nobc_min"] = {}
        for q in QUERIES:
            _, tier["plain_nobc_min"][q] = _time(
                lambda q=q: REGISTRY[q].fn(spark, d), iters=2)
        benchmod._tune_for_dir(spark, d)
        tier["speedup_min"] = {
            q: round(tier["plain_min"][q] / tier["bucketed_min"][q], 2)
            for q in QUERIES if tier["bucketed_min"][q] > 0}
        tier["speedup_min_no_broadcast"] = {
            q: round(tier["plain_nobc_min"][q] / tier["bucketed_nobc_min"][q], 2)
            for q in QUERIES if tier["bucketed_nobc_min"][q] > 0}
        out["tiers"][f"scale{sc}x"] = tier
        for name in (f"bkt_lineitem_{sc}", f"bkt_orders_{sc}"):
            spark.sql(f"DROP TABLE IF EXISTS {name}")
    (REPO / "BENCH_bucketed.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
