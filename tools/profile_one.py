"""Ad-hoc per-query profiler: time one or more headline queries at a
given sf dir (default the scaled cache), with the same tuning bench.py
uses, and optionally print the executed plan.

Usage: python tools/profile_one.py q18_large_orders [more...] [--explain]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import bench  # noqa: E402
from datafusion_ducklake_spark.queries import headline_queries  # noqa: E402
from datafusion_ducklake_spark.queries._util import set_exact_sums  # noqa: E402
from datafusion_ducklake_spark.sparkutil import build_spark  # noqa: E402


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    explain = "--explain" in sys.argv
    sf_dir = str(REPO / ".bench_scaled" / "sf0.1-scale10x")
    for a in list(args):
        if "/" in a:
            sf_dir = a
            args.remove(a)
    spark = build_spark()
    set_exact_sums(False)
    bench._tune_for_dir(spark, sf_dir)
    qs = headline_queries()
    names = args or list(qs)
    for name in names:
        fn = qs[name]
        bench._materialize(fn(spark, sf_dir))      # warm
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            bench._materialize(fn(spark, sf_dir))
            runs.append(time.perf_counter() - t0)
        print(f"{name}: {min(runs):.3f}s min / {sum(runs)/3:.3f}s avg")
        if explain:
            fn(spark, sf_dir).explain("formatted")


if __name__ == "__main__":
    main()
