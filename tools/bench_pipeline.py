"""Timed + plan-audited pass over the LLM-data-pipeline operators.

For each non-headline registry query (dedup, similarity, text, packing,
multimodal-adjacent, geo): time N reps of the bench materialization at a
given sf dir and count Python-boundary / exchange nodes in the executed
plan. Evidence for the optimization-round operator checklist.

Usage: python tools/bench_pipeline.py [--sf-dir DIR] [--iters N] [names...]
"""
from __future__ import annotations

import argparse
import re
import sys
import time
from collections import Counter
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

DEFAULT = [
    "dedup_exact_summary", "dedup_exact_keep", "minhash_dup_pairs",
    "simhash_pairs", "ngram_jaccard_dup_pairs", "dedup_duplicate_clusters",
    "dedup_canonical_select", "doc_decontamination",
    "doc_fingerprint_overlap", "doc_prefix_fingerprint",
    "embedding_cosine_bruteforce", "embedding_cosine_near_dup",
    "lsh_ann_neighbors", "doc_pack_chunks", "doc_quality_scores",
    "doc_quality_advanced", "doc_pii_redaction", "doc_repetition_stats",
    "corpus_term_stats", "doc_token_deciles", "doc_token_stats",
    "doc_chunking", "events_sessionize", "events_running_value",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--iters", type=int, default=3)
    args = ap.parse_args()

    from datafusion_ducklake_spark.queries import REGISTRY
    from datafusion_ducklake_spark.queries._util import set_exact_sums
    from datafusion_ducklake_spark.sparkutil import build_spark
    import bench

    spark = build_spark("bench-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    set_exact_sums(False)
    bench._tune_for_dir(spark, args.sf_dir)

    names = args.names or [n for n in DEFAULT if n in REGISTRY]
    for name in names:
        spec = REGISTRY[name]
        try:
            df = spec.fn(spark, args.sf_dir)
            bench._materialize(df)          # warm
            walls = []
            for _ in range(args.iters):
                t0 = time.perf_counter()
                bench._materialize(spec.fn(spark, args.sf_dir))
                walls.append(time.perf_counter() - t0)
            plan = df._jdf.queryExecution().executedPlan().toString()
            nodes = Counter(re.findall(
                r"BatchEvalPython|ArrowEvalPython|MapInArrow|PythonMapInArrow"
                r"|MapInPandas|FlatMapGroupsInPandas|Exchange|SortMergeJoin"
                r"|ShuffledHashJoin|BroadcastHashJoin|CartesianProduct"
                r"|BroadcastNestedLoopJoin", plan))
            print(f"{name}: min={min(walls):.3f} "
                  f"reps={[round(w, 3) for w in walls]} nodes={dict(nodes)}")
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")


if __name__ == "__main__":
    main()
