"""Similarity search over embedding columns (array<float>).

Three tiers:
- ``cosine_topk``: brute-force exact — broadcast the probe set, one pass
  over the corpus, per-probe top-k by window rank. The correctness
  baseline; at 100 TB it is one full scan, embarrassingly parallel.
- ``lsh_ann_topk``: random-hyperplane LSH — bucket corpus and probes by
  signature (optionally multi-probe with single-bit flips), search only
  within colliding buckets. Sub-linear work at the cost of recall;
  same output schema, so callers can swap tiers.
- ``ivf_topk``: inverted-file ANN — partition the corpus into nlist
  cells by nearest centroid (a caller-supplied, typically sampled or
  offline-trained set), search only the ``nprobe`` cells nearest each
  probe. The cell assignment is a broadcast argmax (centroids are tiny);
  the search is a cluster_id equi-join — no cross join anywhere, and at
  100 TB the assignment is one map-side pass while the probe join moves
  only the probed cells' vectors.

Vector math uses zip_with/aggregate (JVM-side) in double precision.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def as_double(arr: Column | str) -> Column:
    c = F.col(arr) if isinstance(arr, str) else arr
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_topk(corpus: DataFrame, probes: DataFrame, k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding",
                probe_id_col: str = "query_id") -> DataFrame:
    """Exact top-k cosine neighbors for each probe. Norms are precomputed
    once per side; probes are broadcast."""
    c = corpus.select(F.col(id_col), as_double(vec_col).alias("__v"))
    c = c.withColumn("__n", l2_norm(F.col("__v")))
    p = probes.select(F.col(probe_id_col), as_double(vec_col).alias("__pv"))
    p = p.withColumn("__pn", l2_norm(F.col("__pv")))
    pairs = c.crossJoin(F.broadcast(p)).filter(
        F.col(id_col) != F.col(probe_id_col))
    sim = (dot(F.col("__pv"), F.col("__v")) / (F.col("__pn") * F.col("__n")))
    w = Window.partitionBy(probe_id_col).orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (pairs.select(probe_id_col, F.col(id_col).alias("neighbor_id"),
                         sim.alias("cos_sim"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .drop("rn"))


def cosine_topk_blocked(corpus: DataFrame, probe_rows, k: int = 10,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        probe_id_col: str = "query_id") -> DataFrame:
    """Arrow-vectorized exact top-k cosine: the probe set (small — caller
    collects it driver-side) is closed over as a dense float64 matrix; each
    Arrow batch of the corpus computes one (batch x probes) matmul and emits
    only its per-batch top-k per probe, so the global rank sees
    #batches * probes * k candidate rows instead of n * probes.

    Same (sim desc, id asc) total order as ``cosine_topk`` — every global
    top-k element is inside its own batch's top-k under a total order, so
    the union-of-partials rank is exact, not approximate. This is the
    BLAS-throughput tier of the same operator: one corpus pass,
    embarrassingly parallel, no shuffle until the tiny candidate union.
    (Reference parity: benchmark-only vector path; the reference has no
    native ANN operator, so both tiers here are Spark-first extensions.)
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    q_ids = np.asarray([r[0] for r in probe_rows], dtype=np.int64)
    Q = np.asarray([list(r[1]) for r in probe_rows], dtype=np.float64)
    Qn = np.sqrt((Q * Q).sum(axis=1))

    out_schema = T.StructType([
        T.StructField(probe_id_col, T.LongType()),
        T.StructField("neighbor_id", T.LongType()),
        T.StructField("cos_sim", T.DoubleType()),
    ])

    def _batch_topk(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            V = np.asarray([np.asarray(v, dtype=np.float64)
                            for v in pdf[vec_col]], dtype=np.float64)
            Vn = np.sqrt((V * V).sum(axis=1))
            S = (V @ Q.T) / np.outer(Vn, Qn)
            outs = []
            for j in range(len(q_ids)):
                keep = ids != q_ids[j]
                s, nid = S[keep, j], ids[keep]
                if len(nid) == 0:
                    continue
                order = np.lexsort((nid, -s))[:k]   # sim desc, id asc
                outs.append(pd.DataFrame({
                    probe_id_col: np.full(len(order), q_ids[j],
                                          dtype=np.int64),
                    "neighbor_id": nid[order],
                    "cos_sim": s[order]}))
            if outs:
                yield pd.concat(outs, ignore_index=True)

    partial = (corpus.select(id_col, vec_col)
               .mapInPandas(_batch_topk, out_schema))
    w = Window.partitionBy(probe_id_col).orderBy(F.desc("cos_sim"),
                                                 F.asc("neighbor_id"))
    return (partial.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn"))


def hyperplane_signature(vec: Column, dim: int, n_planes: int = 16,
                         seed: int = 42) -> Column:
    """Random-hyperplane LSH signature (n_planes bits, as a long).
    Hyperplanes are seeded-deterministic; sign(dot(v, h_i)) sets bit i."""
    rng = random.Random(seed)
    planes = [[rng.gauss(0.0, 1.0) for _ in range(dim)]
              for _ in range(n_planes)]
    bits = []
    for i, h in enumerate(planes):
        harr = F.array(*[F.lit(x) for x in h])
        bits.append(F.when(dot(vec, harr) > 0,
                           F.shiftleft(F.lit(1).cast("long"), i))
                    .otherwise(F.lit(0).cast("long")))
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def lsh_ann_topk(corpus: DataFrame, probes: DataFrame, dim: int, k: int = 10,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 probe_id_col: str = "query_id", n_planes: int = 12,
                 n_tables: int = 4, seed: int = 42) -> DataFrame:
    """Approximate top-k: n_tables independent hyperplane signatures;
    candidates = bucket collisions in any table; rank candidates exactly.
    Recall grows with n_tables; work stays sub-linear because the join key
    is (table, signature)."""
    c = corpus.select(F.col(id_col), as_double(vec_col).alias("__v"))
    c = c.withColumn("__n", l2_norm(F.col("__v")))
    p = probes.select(F.col(probe_id_col), as_double(vec_col).alias("__pv"))
    p = p.withColumn("__pn", l2_norm(F.col("__pv")))

    c_sigs, p_sigs = [], []
    for t in range(n_tables):
        c_sigs.append(c.select(
            id_col, hyperplane_signature(F.col("__v"), dim, n_planes,
                                         seed + t).alias("sig"),
            F.lit(t).alias("tbl")))
        p_sigs.append(p.select(
            probe_id_col, hyperplane_signature(F.col("__pv"), dim, n_planes,
                                               seed + t).alias("sig"),
            F.lit(t).alias("tbl")))
    from functools import reduce
    cs = reduce(DataFrame.unionByName, c_sigs)
    ps = reduce(DataFrame.unionByName, p_sigs)

    cand = (cs.join(F.broadcast(ps), ["tbl", "sig"])
            .filter(F.col(id_col) != F.col(probe_id_col))
            .select(id_col, probe_id_col).distinct())

    scored = (cand.join(c, id_col).join(F.broadcast(p), probe_id_col))
    sim = dot(F.col("__pv"), F.col("__v")) / (F.col("__pn") * F.col("__n"))
    w = Window.partitionBy(probe_id_col).orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (scored.select(probe_id_col, F.col(id_col).alias("neighbor_id"),
                          sim.alias("cos_sim"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .drop("rn"))


def ivf_assign(corpus: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id", vec_col: str = "embedding",
               cent_id_col: str = "cent_id", cent_vec_col: str = "embedding",
               score_round: int = 6) -> DataFrame:
    """Assign every corpus vector to its nearest centroid by cosine
    (rounded to ``score_round`` decimals so cross-engine summation order
    can't flip near-ties; centroid id breaks exact ties). Output: the
    corpus columns plus ``cluster_id``. Centroids are broadcast — the
    assignment is a map-side pass over the corpus."""
    c = corpus.select(F.col(id_col), as_double(vec_col).alias("__v"))
    c = c.withColumn("__n", l2_norm(F.col("__v")))
    cents = centroids.select(F.col(cent_id_col).alias("__cid"),
                             as_double(cent_vec_col).alias("__cv"))
    cents = cents.withColumn("__cn", l2_norm(F.col("__cv")))
    s = F.round(dot(F.col("__v"), F.col("__cv"))
                / (F.col("__n") * F.col("__cn")), score_round)
    w = Window.partitionBy(id_col).orderBy(F.desc("__s"), F.asc("__cid"))
    return (c.crossJoin(F.broadcast(cents))
            .select(id_col, "__v", "__n", "__cid", s.alias("__s"))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select(id_col, "__v", "__n",
                    F.col("__cid").alias("cluster_id")))


def ivf_topk(corpus: DataFrame, probes: DataFrame, centroids: DataFrame,
             k: int = 10, nprobe: int = 3,
             id_col: str = "vec_id", vec_col: str = "embedding",
             probe_id_col: str = "query_id",
             cent_id_col: str = "cent_id", cent_vec_col: str = "embedding",
             score_round: int = 6) -> DataFrame:
    """IVF approximate top-k: rank candidates exactly, but only within the
    ``nprobe`` cells whose centroids are nearest each probe. Same output
    schema as ``cosine_topk``/``lsh_ann_topk`` (query_id, neighbor_id,
    cos_sim) so the tiers are drop-in swaps."""
    assigned = ivf_assign(corpus, centroids, id_col, vec_col,
                          cent_id_col, cent_vec_col, score_round)
    p = probes.select(F.col(probe_id_col), as_double(vec_col).alias("__pv"))
    p = p.withColumn("__pn", l2_norm(F.col("__pv")))
    cents = centroids.select(F.col(cent_id_col).alias("__cid"),
                             as_double(cent_vec_col).alias("__cv"))
    cents = cents.withColumn("__cn", l2_norm(F.col("__cv")))
    ps = F.round(dot(F.col("__pv"), F.col("__cv"))
                 / (F.col("__pn") * F.col("__cn")), score_round)
    wp = Window.partitionBy(probe_id_col).orderBy(F.desc("__s"),
                                                  F.asc("__cid"))
    probed = (p.crossJoin(F.broadcast(cents))
              .select(probe_id_col, "__cid", ps.alias("__s"))
              .withColumn("__rn", F.row_number().over(wp))
              .filter(F.col("__rn") <= nprobe)
              .select(probe_id_col, F.col("__cid").alias("cluster_id")))
    # each vector lives in exactly one cell -> the equi-join yields each
    # (probe, vector) pair at most once; no distinct needed
    cand = (assigned.join(F.broadcast(probed), "cluster_id")
            .filter(F.col(id_col) != F.col(probe_id_col))
            .join(F.broadcast(p), probe_id_col))
    sim = dot(F.col("__pv"), F.col("__v")) / (F.col("__pn") * F.col("__n"))
    w = Window.partitionBy(probe_id_col).orderBy(F.desc("cos_sim"),
                                                 F.asc("neighbor_id"))
    return (cand.select(probe_id_col, F.col(id_col).alias("neighbor_id"),
                        sim.alias("cos_sim"))
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn"))


def embedding_near_dup_pairs(df: DataFrame, dim: int,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             threshold: float = 0.95,
                             n_planes: int = 12, n_tables: int = 6,
                             seed: int = 7) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH self-join candidates +
    exact cosine verification ≥ threshold."""
    base = df.select(F.col(id_col), as_double(vec_col).alias("__v"))
    base = base.withColumn("__n", l2_norm(F.col("__v")))
    sigs = []
    for t in range(n_tables):
        sigs.append(base.select(
            id_col, hyperplane_signature(F.col("__v"), dim, n_planes,
                                         seed + t).alias("sig"),
            F.lit(t).alias("tbl")))
    from functools import reduce
    s = reduce(DataFrame.unionByName, sigs)
    a = s.select(F.col(id_col).alias("id_a"), "tbl", "sig")
    b = s.select(F.col(id_col).alias("id_b"), "tbl", "sig")
    cand = (a.join(b, ["tbl", "sig"]).filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())
    va = base.select(F.col(id_col).alias("id_a"), F.col("__v").alias("va"),
                     F.col("__n").alias("na"))
    vb = base.select(F.col(id_col).alias("id_b"), F.col("__v").alias("vb"),
                     F.col("__n").alias("nb"))
    return (cand.join(va, "id_a").join(vb, "id_b")
            .withColumn("cos_sim", dot(F.col("va"), F.col("vb"))
                        / (F.col("na") * F.col("nb")))
            .filter(F.col("cos_sim") >= threshold)
            .select("id_a", "id_b", "cos_sim"))
