"""Pin the DuckDB denominator: one committed per-tier DuckDB timing for
this box generation, so cross-round ratio movements stop riding on the
oracle engine's own run-to-run swing (r10 verdict #3: the sf0.1 DuckDB
total moved 2.23 -> 1.43 s between driver runs on identical SQL — a
±35% denominator swing that dwarfs real Spark-side changes at that
tier).

Usage:
  python tools/pin_duckdb.py [--iters 7] [--out DUCKDB_PINNED.json] \
      [tier_dir ...]

Default tiers: the driver dir (/root/testdata/sf0.1) plus the cached
scaled dirs bench.py uses (.bench_scaled/sf0.1-scale{10,30,100}x).
Each tier records min/avg walls per headline oracle over N reps, plus a
single-thread CPU probe so a future box generation is detectable.
bench.py picks the file up automatically and reports
ratio_vs_duckdb_pinned alongside the in-run ratio; the in-run
denominator stays the primary, same-session measurement.
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def cpu_probe() -> float:
    """Single-thread busy-loop seconds — a box-generation fingerprint
    (r10 writeup: this sandbox shows multi-second stall windows; the
    probe lets a reader judge whether a pinned run was clean)."""
    t0 = time.perf_counter()
    x = 0
    for i in range(20_000_000):
        x += i
    return round(time.perf_counter() - t0, 3)


def main() -> None:
    import duckdb

    from datafusion_ducklake_spark.queries import (headline_queries,
                                                   oracle_queries)
    from datafusion_ducklake_spark.queries._util import TABLES

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    iters = 7
    out = REPO / "DUCKDB_PINNED.json"
    for i, a in enumerate(sys.argv):
        if a == "--iters":
            iters = int(sys.argv[i + 1])
        if a == "--out":
            out = Path(sys.argv[i + 1])
    tiers = args or [
        os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
        str(REPO / ".bench_scaled/sf0.1-scale10x"),
        str(REPO / ".bench_scaled/sf0.1-scale30x"),
        str(REPO / ".bench_scaled/sf0.1-scale100x"),
    ]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    names = list(headline_queries())
    oracles = oracle_queries()

    doc = {
        "note": ("committed DuckDB denominator per tier (min-of-N warm "
                 "walls, threads=cpus, Arrow materialization — the same "
                 "methodology as bench.py's in-run denominator). Ratios "
                 "against this file isolate Spark-side movement from "
                 "DuckDB's own run-to-run swing; regenerate with "
                 "tools/pin_duckdb.py when the box generation changes "
                 "(compare cpu_probe_sec)."),
        "cpus": cpus,
        "iters": iters,
        "cpu_probe_sec": cpu_probe(),
        "tiers": {},
    }
    for tier in tiers:
        if not os.path.isdir(tier):
            print(f"skip {tier}: not a directory", file=sys.stderr)
            continue
        con = duckdb.connect()
        con.execute(f"SET threads={cpus}")
        for t in TABLES:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"read_parquet('{os.path.join(tier, t)}.parquet')")
        mins, avgs = {}, {}
        try:
            for name in names:
                sql = oracles.get(name)
                if sql is None:
                    continue
                con.execute(sql).arrow()          # warm
                runs = []
                for _ in range(iters):
                    t0 = time.perf_counter()
                    con.execute(sql).arrow()
                    runs.append(time.perf_counter() - t0)
                mins[name] = round(min(runs), 4)
                avgs[name] = round(statistics.mean(runs), 4)
        finally:
            con.close()
        key = os.path.basename(tier.rstrip("/"))
        doc["tiers"][key] = {
            "dir": tier,
            "queries_min": mins,
            "queries_avg": avgs,
            "total_min": round(sum(mins.values()), 4),
        }
        print(f"{key}: total_min={doc['tiers'][key]['total_min']}",
              file=sys.stderr)
    out.write_text(json.dumps(doc, indent=1))
    print(f"wrote {out}", file=sys.stderr)


if __name__ == "__main__":
    main()
