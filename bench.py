"""Benchmark harness (driver contract).

Runs the headline query suite at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully executed (collected to the driver via a count over the
materialized result) — timing covers plan + execute, mirroring the
reference's avg wall-clock-per-query methodology
(ref: benchmark/src/main.rs, benchmark/src/metrics.rs:15-52).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from datafusion_ducklake_spark.queries import headline_queries
from datafusion_ducklake_spark.sparkutil import build_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = build_spark("ducklake-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen paths once with a trivial action (the reference
    # likewise runs a warmup iteration; benchmark/src/main.rs:55-57).
    spark.range(1000).count()

    timings: dict[str, float] = {}
    for name, fn in headline_queries().items():
        start = time.perf_counter()
        df = fn(spark, sf_dir)
        df.collect()
        timings[name] = round(time.perf_counter() - start, 4)

    total = round(sum(timings.values()), 4)
    print(json.dumps({
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
