"""A/B experiment for ds_monthly_brand_rank join shapes at a scaled tier.

Variants (same logical query, measured interleaved):
  A current   — SMJ facts + broadcast part
  B shj       — shuffle_hash hint on orders + broadcast part
  C shj_part  — shuffle_hash orders + shuffle_hash part (no broadcast)
Usage: python tools/exp_ds_monthly.py [--iters N] [--sf-dir DIR]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--sf-dir",
                    default=str(REPO / ".bench_scaled/sf0.1-scale100x"))
    args = ap.parse_args()

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from datafusion_ducklake_spark.queries._util import (
        back_to_double, exact_cast, set_exact_sums, t)
    from datafusion_ducklake_spark.sparkutil import build_spark
    import bench

    spark = build_spark("exp-ds-monthly")
    spark.sparkContext.setLogLevel("ERROR")
    set_exact_sums(False)
    bench._tune_for_dir(spark, args.sf_dir)
    sf_dir = args.sf_dir

    def build(variant: str):
        li = t(spark, sf_dir, "lineitem")
        o = t(spark, sf_dir, "orders")
        p = t(spark, sf_dir, "part").select("p_partkey", "p_brand")
        if variant == "B":
            o = o.hint("shuffle_hash")
        joined = li.join(o, li["l_orderkey"] == o["o_orderkey"])
        if variant == "C":
            joined = joined.join(p.hint("shuffle_hash"),
                                 li["l_partkey"] == p["p_partkey"])
        else:
            joined = joined.join(F.broadcast(p),
                                 li["l_partkey"] == p["p_partkey"])
        if variant == "D":
            # B + the orders side pre-projected to the two join columns
            pass
        monthly = (
            joined
            .groupBy(F.date_trunc("month", F.col("o_orderdate")).alias("m"),
                     F.col("p_brand").alias("brand"))
            .agg(F.sum(exact_cast(F.col("l_extendedprice")
                                  * (1 - F.col("l_discount")))).alias("rev"),
                 F.count(F.lit(1)).alias("n_items")))
        w_mov = (Window.partitionBy("brand").orderBy("m")
                 .rowsBetween(-2, Window.currentRow))
        w_rank = Window.partitionBy("m").orderBy(F.desc("rev"),
                                                 F.asc("brand"))
        return monthly.select(
            F.date_format("m", "yyyy-MM").alias("month"), "brand",
            back_to_double(F.col("rev")).alias("revenue"), "n_items",
            (back_to_double(F.sum("rev").over(w_mov))
             / F.count(F.lit(1)).over(w_mov)).alias("mov_avg3"),
            F.rank().over(w_rank).alias("brand_rank"))

    variants = ["A", "B", "C"]
    for v in variants:                      # warm each shape once
        bench._materialize(build(v))
    walls: dict[str, list[float]] = {v: [] for v in variants}
    for _ in range(args.iters):             # interleaved reps
        for v in variants:
            t0 = time.perf_counter()
            bench._materialize(build(v))
            walls[v].append(time.perf_counter() - t0)
    for v in variants:
        r = walls[v]
        print(f"{v}: min={min(r):.3f} avg={sum(r)/len(r):.3f} "
              f"reps={[round(x, 3) for x in r]}")


if __name__ == "__main__":
    main()
