"""Config-variant experiment for the scaled bench suite (throwaway tool).

Times a representative query subset on the scaled dir under different
runtime configs to find where the 1-2 s/query wall goes. Usage:
    python tools/bench_experiment.py [variant ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from datafusion_ducklake_spark.queries import headline_queries
from datafusion_ducklake_spark.queries._util import set_exact_sums
from datafusion_ducklake_spark.sparkutil import build_spark

QUERIES = ["q03_shipping_priority", "q18_large_orders", "q07_volume_shipping",
           "q15_top_supplier", "q17_small_quantity_orders",
           "events_hourly_rollup", "q13_customer_distribution",
           "q01_pricing_summary"]

VARIANTS = {
    "base": {},
    "noaqe": {"spark.sql.adaptive.enabled": "false"},
    "p8": {"spark.sql.shuffle.partitions": "8"},
    "p64": {"spark.sql.shuffle.partitions": "64"},
    "nocomp": {"spark.shuffle.compress": "false",
               "spark.shuffle.spill.compress": "false"},
    "bigadvisory": {"spark.sql.adaptive.advisoryPartitionSizeInBytes": "256m",
                    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "32m"},
}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR",
                            str(REPO / ".bench_scaled" / "sf0.1-scale10x"))
    names = sys.argv[1:] or list(VARIANTS)
    spark = build_spark("bench-experiment")
    spark.sparkContext.setLogLevel("ERROR")
    set_exact_sums(False)
    import bench
    bench._tune_for_dir(spark, sf_dir)
    baseline_conf = {k: spark.conf.get(k, None) for v in VARIANTS.values()
                     for k in v}
    qs = {n: f for n, f in headline_queries().items() if n in QUERIES}
    for fn in qs.values():
        fn(spark, sf_dir).toArrow()      # warm codegen + file listing
    results = {}
    for vname in names:
        conf = VARIANTS[vname]
        for k, v in conf.items():
            spark.conf.set(k, v)
        try:
            per = {}
            for n, fn in qs.items():
                runs = []
                for _ in range(3):
                    t0 = time.perf_counter()
                    fn(spark, sf_dir).toArrow()
                    runs.append(time.perf_counter() - t0)
                per[n] = round(min(runs), 3)
            results[vname] = per
            print(f"{vname:12s} total={sum(per.values()):7.3f}  "
                  + " ".join(f"{n.split('_')[0]}={t:.2f}"
                             for n, t in per.items()), flush=True)
        finally:
            for k in conf:
                if baseline_conf.get(k) is not None:
                    spark.conf.set(k, baseline_conf[k])
                else:
                    spark.conf.unset(k)


if __name__ == "__main__":
    main()
