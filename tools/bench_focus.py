"""Focused A/B timing for a subset of headline queries at a scaled tier.

Usage:
  python tools/bench_focus.py [--sf-dir DIR] [--iters N] [--clustered]
                              [--plans] q05_local_supplier_volume ...

Times the named queries (Spark avg/min over N reps after a warmup) and
their DuckDB oracles on the same data; with --clustered, lineitem+orders
are served from the cached DuckLake clustered catalog (<dir>-ducklake-v2)
exactly as bench.py's clustered sub-tier does. Iteration harness mirrors
bench.py (_materialize via toArrow, rebuild the DataFrame per rep).
"""
from __future__ import annotations

import argparse
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf-dir", default=str(REPO / ".bench_scaled/sf0.1-scale100x"))
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--clustered", action="store_true")
    ap.add_argument("--plans", action="store_true",
                    help="print .explain(formatted) for each query")
    ap.add_argument("--conf", action="append", default=[],
                    help="extra spark conf k=v, applied AFTER the bench "
                         "tuning (repeatable) — for A/B experiments")
    args = ap.parse_args()

    from datafusion_ducklake_spark.queries import headline_queries, oracle_queries
    from datafusion_ducklake_spark.queries._util import (
        TABLES, set_bench_rewrites, set_exact_sums, set_table_override)
    from datafusion_ducklake_spark.sparkutil import build_spark
    import bench

    spark = build_spark("bench-focus")
    spark.sparkContext.setLogLevel("ERROR")
    set_exact_sums(False)
    set_bench_rewrites(True)     # mirror bench.py's timed configuration
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    floor = bench._measure_floor(spark, cpus)
    bench._tune_for_dir(spark, args.sf_dir)
    for kv in args.conf:
        k, _, v = kv.partition("=")
        if not v:
            sys.exit(f"--conf expects k=v, got {kv!r}")
        spark.conf.set(k, v)

    if args.clustered:
        from datafusion_ducklake_spark.catalog import DuckLakeSession
        db = args.sf_dir.rstrip("/") + "-ducklake-v2/catalog.sqlite"
        dl = DuckLakeSession(spark, db)
        set_table_override("lineitem", dl.table("main.lineitem"))
        set_table_override("orders", dl.table("main.orders"))
        # mirror bench.py's clustered sub-tier: runtime bloom OFF over
        # zero-exchange layouts (r10 opt — no shuffle to shrink)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "false")

    qs = headline_queries()
    oracles = oracle_queries()
    import duckdb
    con = duckdb.connect()
    con.execute(f"SET threads={cpus}")
    for t_ in TABLES:
        con.execute(f"CREATE VIEW {t_} AS SELECT * FROM "
                    f"read_parquet('{os.path.join(args.sf_dir, t_)}.parquet')")

    for name in args.queries:
        fn = qs[name]
        if args.plans:
            fn(spark, args.sf_dir).explain("formatted")
        bench._materialize(fn(spark, args.sf_dir))  # warm
        runs = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            bench._materialize(fn(spark, args.sf_dir))
            runs.append(time.perf_counter() - t0)
        sql = oracles.get(name)
        d_runs = []
        if sql:
            con.execute(sql).arrow()
            for _ in range(args.iters):
                t0 = time.perf_counter()
                con.execute(sql).arrow()
                d_runs.append(time.perf_counter() - t0)
        s_min, s_avg = min(runs), statistics.mean(runs)
        d_min = min(d_runs) if d_runs else None
        print(f"{name}: spark avg={s_avg:.3f} min={s_min:.3f} "
              f"reps={[round(r, 3) for r in runs]} "
              f"duck min={d_min and round(d_min, 3)} "
              f"ratio_min={d_min and round(s_min / d_min, 2)} "
              f"ratio_floor_adj={d_min and round(max(s_min - floor, 0) / d_min, 2)}")

    if args.clustered:
        set_table_override("lineitem", None)
        set_table_override("orders", None)


if __name__ == "__main__":
    main()
