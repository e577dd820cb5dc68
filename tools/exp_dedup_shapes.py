"""A/B experiments for MinHash/SimHash operator shapes (bit-identical).

Variants:
  poly1   — poly_hash64 with one struct-accumulator pass (vs two folds)
  sig_agg — minhash signature via explode + 128 codegen'd min aggregates
  sim_agg — simhash via explode + 64 codegen'd bit-vote sums
  late_ver— minhash verification shingles computed above the cand join
Each is validated for exact equality against the current implementation
at sf0.01, then timed (min of N interleaved with the current shape).

Usage: python tools/exp_dedup_shapes.py [--iters N] [--sf-dir DIR] [which...]
"""
from __future__ import annotations

import argparse
import random
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("which", nargs="*",
                    default=["poly1", "sim_agg", "sig_agg"])
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from datafusion_ducklake_spark.functions import dedup
    from datafusion_ducklake_spark.queries._util import set_exact_sums, t
    from datafusion_ducklake_spark.sparkutil import build_spark
    import bench

    spark = build_spark("exp-dedup"); spark.sparkContext.setLogLevel("ERROR")
    set_exact_sums(False)
    bench._tune_for_dir(spark, args.sf_dir)
    docs = t(spark, args.sf_dir, "documents")

    M = dedup._MERSENNE

    def poly1(col):
        """Single-pass dual-fold poly_hash64."""
        c = F.col(col) if isinstance(col, str) else col
        codes = F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(c), F.lit(1))),
            lambda i: F.ascii(c.substr(i, F.lit(1))).cast("long"))
        acc0 = F.struct(F.lit(7).cast("long").alias("a"),
                        F.lit(11).cast("long").alias("b"))
        folded = F.aggregate(
            codes, acc0,
            lambda acc, x: F.struct(
                F.pmod(acc["a"] * 31 + x, F.lit(M)).alias("a"),
                F.pmod(acc["b"] * 37 + x, F.lit(M)).alias("b")))
        return folded["a"] * F.lit(1 << 31).cast("long") + folded["b"]

    def check(name, df_cur, df_new):
        cur = sorted(map(tuple, df_cur.collect()))
        new = sorted(map(tuple, df_new.collect()))
        print(f"{name}: equal={cur == new} n={len(cur)}")
        return cur == new

    def ab(name, build_cur, build_new):
        bench._materialize(build_cur()); bench._materialize(build_new())
        w = {"cur": [], "new": []}
        for _ in range(args.iters):
            t0 = time.perf_counter(); bench._materialize(build_cur())
            w["cur"].append(time.perf_counter() - t0)
            t0 = time.perf_counter(); bench._materialize(build_new())
            w["new"].append(time.perf_counter() - t0)
        print(f"{name}: cur min={min(w['cur']):.3f} {[round(x,3) for x in w['cur']]} "
              f"new min={min(w['new']):.3f} {[round(x,3) for x in w['new']]}")

    if "poly1" in args.which:
        base = docs.limit(2000).select("doc_id", "text")
        check("poly1-equality",
              base.select(dedup.poly_hash64("text").alias("h")),
              base.select(poly1("text").alias("h")))
        ab("poly1",
           lambda: docs.select(dedup.poly_hash64("text").alias("h")),
           lambda: docs.select(poly1("text").alias("h")))

    if "sim_agg" in args.which:
        def cur_sim():
            return docs.select(
                "doc_id", dedup.simhash("text",
                                        hash_fn=dedup.poly_hash64).alias("sig"))

        def new_sim():
            c = F.trim(F.col("text"))
            toks = F.split(c, r"\s+")
            ex = docs.select("doc_id", F.explode(toks).alias("tok"))
            h = dedup.poly_hash64(F.col("tok"))
            aggs = [F.sum(F.getbit(h, F.lit(j))).alias(f"o{j}")
                    for j in range(64)] + [F.count(F.lit(1)).alias("n")]
            votes = ex.groupBy("doc_id").agg(*aggs)
            sig = F.lit(0).cast("long")
            for j in range(64):
                bit_val = F.lit(-(1 << 63) if j == 63 else (1 << j)).cast("long")
                sig = sig.bitwiseOR(
                    F.when(F.col(f"o{j}") * 2 > F.col("n"), bit_val)
                    .otherwise(F.lit(0).cast("long")))
            return votes.select("doc_id", sig.alias("sig"))

        check("sim_agg-equality", cur_sim(), new_sim())
        ab("sim_agg", cur_sim, new_sim)

    if "stage_split" in args.which:
        # Where does minhash_dup_pairs' wall go? Time cumulative prefixes.
        def sh_df():
            return docs.select(
                "doc_id",
                dedup.word_shingles("text", 3,
                                    hash_fn=dedup.poly_hash64).alias("sh"))

        def sig_df():
            return sh_df().select(
                "doc_id", dedup.minhash_signature(F.col("sh"), 128).alias("sig"))

        def band_df():
            return dedup.minhash_lsh_candidates(sig_df(), "doc_id", "sig", 16,
                                                hash_fn=dedup.poly_hash64)

        for nm, bf in [("shingles", sh_df), ("sig", sig_df), ("bands", band_df)]:
            bench._materialize(bf())
            walls = []
            for _ in range(args.iters):
                t0 = time.perf_counter(); bench._materialize(bf())
                walls.append(time.perf_counter() - t0)
            print(f"stage {nm}: min={min(walls):.3f} "
                  f"{[round(x, 3) for x in walls]}")

    if "sig_hoist" in args.which or "sig_fold" in args.which:
        rng = random.Random(42)
        params = [(rng.randrange(1, M), rng.randrange(0, M))
                  for _ in range(128)]

        def sh_df():
            return docs.select(
                "doc_id",
                dedup.word_shingles("text", 3,
                                    hash_fn=dedup.poly_hash64).alias("sh"))

        def cur_sig():
            return sh_df().select(
                "doc_id", dedup.minhash_signature(F.col("sh"), 128).alias("sig"))

        def hoist_sig():
            # pmod(x, M) computed once per shingle in a prior transform
            xm = F.transform(F.col("sh"), lambda x: F.pmod(x, F.lit(M)))
            sig = F.array(*[
                F.array_min(F.transform(
                    F.col("xm"),
                    lambda v: F.pmod(v * F.lit(a) + F.lit(b), F.lit(M))))
                for a, b in params])
            return (sh_df().withColumn("xm", xm)
                    .select("doc_id", sig.alias("sig")))

        def fold_sig():
            # one aggregate pass, 128-field struct accumulator
            xm = F.transform(F.col("sh"), lambda x: F.pmod(x, F.lit(M)))
            init = F.struct(*[F.lit(M).cast("long").alias(f"m{i}")
                              for i in range(128)])
            folded = F.aggregate(
                xm, init,
                lambda acc, v: F.struct(*[
                    F.least(acc[f"m{i}"],
                            F.pmod(v * F.lit(a) + F.lit(b), F.lit(M)))
                    .alias(f"m{i}")
                    for i, (a, b) in enumerate(params)]))
            sig = F.array(*[folded[f"m{i}"] for i in range(128)])
            return sh_df().select("doc_id", sig.alias("sig"))

        if "sig_hoist" in args.which:
            check("sig_hoist-equality", cur_sig(), hoist_sig())
            ab("sig_hoist", cur_sig, hoist_sig)
        if "sig_fold" in args.which:
            check("sig_fold-equality", cur_sig(), fold_sig())
            ab("sig_fold", cur_sig, fold_sig)

    if "sig_agg" in args.which:
        rng = random.Random(42)
        params = [(rng.randrange(1, M), rng.randrange(0, M))
                  for _ in range(128)]

        def sh_df():
            return docs.select(
                "doc_id",
                dedup.word_shingles("text", 3,
                                    hash_fn=dedup.poly_hash64).alias("sh"))

        def cur_sig():
            return sh_df().select(
                "doc_id", dedup.minhash_signature(F.col("sh"), 128).alias("sig"))

        def new_sig():
            ex = sh_df().select("doc_id", F.explode("sh").alias("x"))
            xm = F.pmod(F.col("x"), F.lit(M))
            aggs = [F.min(F.pmod(xm * F.lit(a) + F.lit(b), F.lit(M)))
                    .alias(f"m{i}") for i, (a, b) in enumerate(params)]
            g = ex.groupBy("doc_id").agg(*aggs)
            return g.select(
                "doc_id",
                F.array(*[F.col(f"m{i}") for i in range(128)]).alias("sig"))

        check("sig_agg-equality", cur_sig(), new_sig())
        ab("sig_agg", cur_sig, new_sig)


if __name__ == "__main__":
    main()
