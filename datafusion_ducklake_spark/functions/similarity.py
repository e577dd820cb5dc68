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


def _hyperplane_sigs_batch(dim: int, n_planes: int, n_tables: int,
                           seed: int):
    """Arrow-vectorized equivalent of ``n_tables`` stacked
    ``hyperplane_signature`` expressions, returning one array<bigint> of
    per-table signatures per row (guide §4.2).

    Why this exists: the expression form builds ~n_tables*n_planes
    zip_with/aggregate trees over ``dim``-literal plane arrays — at
    (16 tables, 6 planes, dim 64) that is a multi-thousand-node tree
    whose ANALYSIS dominates the query (17-21 s build vs ~2 s execute
    at sf0.01, measured). This UDF replays the expression semantics
    bit for bit: plane coordinates come from the same
    ``random.Random(seed + t)`` draws, and the accumulation runs
    ``acc = acc + v[d]*h[d]`` for d = 0..dim-1 — the exact fold-left
    IEEE rounding order of ``dot``'s aggregate, vectorized ACROSS rows
    instead of along the vector. Edge semantics are replayed too:
    NULL vectors, NULL elements and wrong-length vectors make every
    plane dot NULL in the expression form (zip_with pads to the longer
    length with NULLs), leaving every bit unset — the expression-side
    sanitizer below maps those rows to NULL input, which the UDF turns
    into an all-zero signature. A NaN DOT, by contrast, sets its bit:
    Spark's ordering ranks NaN greater than any number, so
    ``when(dot > 0)`` is TRUE — mirrored with ``isnan(acc)`` (NaN
    cannot arise from NULLs here because those never reach the UDF)."""
    import numpy as np
    import pandas as pd

    rows = []
    for t in range(n_tables):
        rng = random.Random(seed + t)
        for _ in range(n_planes):
            rows.append([rng.gauss(0.0, 1.0) for _ in range(dim)])
    H = np.asarray(rows, dtype=np.float64)           # (T*P, dim)
    shifts = np.asarray(
        [(1 << i) if i < 63 else -(1 << 63) for i in range(n_planes)],
        dtype=np.int64)

    # plain signature + explicit eval type: the typehinted form would
    # need module-level pandas just to resolve the annotation strings
    from pyspark.sql.pandas.functions import PythonEvalType

    @F.pandas_udf("array<bigint>", PythonEvalType.SQL_SCALAR_PANDAS_UDF)
    def sigs(vecs):
        n = len(vecs)
        V = np.zeros((n, dim), dtype=np.float64)
        null_rows = np.zeros(n, dtype=bool)
        for j, v in enumerate(vecs):
            if v is None:
                null_rows[j] = True
            else:
                V[j] = np.asarray(v, dtype=np.float64)
        acc = np.zeros((n, H.shape[0]), dtype=np.float64)
        with np.errstate(invalid="ignore", over="ignore"):
            for d in range(dim):
                acc = acc + V[:, d:d + 1] * H[None, :, d]
        bits = ((acc > 0.0) | np.isnan(acc)) & ~null_rows[:, None]
        bits = bits.reshape(n, n_tables, n_planes)
        vals = np.where(bits, shifts, np.int64(0)).sum(axis=2,
                                                       dtype=np.int64)
        return pd.Series(list(vals))

    def apply(col: Column) -> Column:
        # expression-side sanitizer: rows the expression form would
        # zero out via NULL dots never reach the numeric path
        clean = F.when(
            (F.size(col) == dim)
            & ~F.exists(col, lambda x: x.isNull()), col)
        return sigs(clean)

    return apply


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

    # r10 opt (guide §1.2/§4.2): the old shape built one union branch
    # per table — the corpus was scanned, cast and re-normed n_tables
    # times, and the stacked signature expressions made ANALYSIS the
    # dominant cost (17-21 s build vs ~2 s execute at sf0.01). One
    # posexplode over the Arrow-batched per-table signature array
    # computes the identical (tbl, sig) rows in a single corpus pass —
    # posexplode's position IS the old F.lit(t) table id, and
    # _hyperplane_sigs_batch bit-replays the expression's seeded planes
    # and fold-left dot order. Equality-checked vs the expression form.
    sig_udf = _hyperplane_sigs_batch(dim, n_planes, n_tables, seed)

    def sig_rows(df: DataFrame, key: str, vcol: str) -> DataFrame:
        return df.select(key, F.posexplode(sig_udf(F.col(vcol)))
                         .alias("tbl", "sig"))

    cs = sig_rows(c, id_col, "__v")
    ps = sig_rows(p, probe_id_col, "__pv")

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
    # r10 opt: single-pass Arrow-batched signatures (see lsh_ann_topk)
    # plus a repartition on the join key before the self-join branches
    # so ReuseExchange computes the signature subtree once, not twice
    # (same shape as minhash_lsh_candidates in dedup.py).
    sig_udf = _hyperplane_sigs_batch(dim, n_planes, n_tables, seed)
    s = base.select(F.col(id_col),
                    F.posexplode(sig_udf(F.col("__v"))).alias("tbl", "sig"))
    s = s.repartition("tbl", "sig")
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
