"""Dump .explain("formatted") for headline queries to plans/<round>/.

Usage:
  python tools/dump_plans.py --out plans/r10 --suffix _before \
      [--sf-dir DIR] [--clustered] [query ...]

Captures each named query's physical plan under the SAME configuration
bench.py times it with (_tune_for_dir conf, native-double sums). With no
query names, dumps every headline query. Plan capture only builds and
plans the DataFrame — no job runs, so this is safe to run alongside
other work. With --clustered, lineitem+orders come from the cached
DuckLake clustered catalog (<sf-dir>-ducklake-v2) and files get a
``_clustered`` infix, mirroring bench.py's clustered sub-tier.
"""
from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--sf-dir",
                    default=str(REPO / ".bench_scaled/sf0.1-scale100x"))
    ap.add_argument("--out", default="plans/r10")
    ap.add_argument("--suffix", default="_before")
    ap.add_argument("--clustered", action="store_true")
    ap.add_argument("--bloom-off", action="store_true",
                    help="disable the runtime bloom filter, as bench.py's "
                         "clustered/family/events sub-tiers do")
    ap.add_argument("--events-clustered", action="store_true",
                    help="serve events from the cached clustered catalog "
                         "(bench.py's events-clustered sub-tier)")
    args = ap.parse_args()

    from datafusion_ducklake_spark.queries import headline_queries
    from datafusion_ducklake_spark.queries._util import (set_bench_rewrites,
                                                         set_exact_sums,
                                                         set_table_override)
    from datafusion_ducklake_spark.sparkutil import build_spark
    import bench

    spark = build_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    set_exact_sums(False)
    set_bench_rewrites(True)     # mirror bench.py's timed configuration
    bench._tune_for_dir(spark, args.sf_dir)
    if args.bloom_off:
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "false")

    infix = ""
    if args.clustered:
        from datafusion_ducklake_spark.catalog import DuckLakeSession
        db = args.sf_dir.rstrip("/") + "-ducklake-v2/catalog.sqlite"
        dl = DuckLakeSession(spark, db)
        set_table_override("lineitem", dl.table("main.lineitem"))
        set_table_override("orders", dl.table("main.orders"))
        infix = "_clustered"
    if args.events_clustered:
        from datafusion_ducklake_spark.catalog import DuckLakeSession
        db = args.sf_dir.rstrip("/") + "-ducklake-v2/catalog.sqlite"
        dl = DuckLakeSession(spark, db)
        set_table_override("events", dl.table("main.events"))
        infix += "_events_clustered"

    out_dir = REPO / args.out
    out_dir.mkdir(parents=True, exist_ok=True)
    qs = headline_queries()
    names = args.queries or list(qs)
    from datafusion_ducklake_spark.queries import REGISTRY
    for name in names:
        # named pipeline/similarity operators are dumpable too, not just
        # the headline suite
        fn = qs.get(name) or REGISTRY[name].fn
        df = fn(spark, args.sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = out_dir / f"{name}{infix}{args.suffix}.txt"
        header = (f"# {name}{infix} — explain(formatted)\n"
                  f"# data: {args.sf_dir}\n"
                  f"# conf: bench.py _tune_for_dir (see bench.py)\n\n")
        path.write_text(header + plan)
        print("wrote", path)


if __name__ == "__main__":
    main()
