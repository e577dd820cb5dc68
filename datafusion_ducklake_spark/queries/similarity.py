"""Similarity search over the ``embeddings`` table (array<float> column).

Brute-force cosine top-k is the correctness baseline; the LSH-bucketed
scale path lives in ``functions.similarity``. Dot products / norms are
computed with higher-order functions (F.zip_with + F.aggregate) entirely
JVM-side — no Python UDF — in double precision, and cosines are rounded to
4 decimals so engine-internal summation order (Spark fold vs DuckDB SIMD)
cannot flip the hash compare.

Scale note: the probe set is broadcast; the big side streams. At 100 TB the
same plan holds — broadcast the query vectors, one pass over the corpus,
per-partition top-k via window rank (AQE coalesces the tiny output).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ._util import t

N_PROBES = 5
TOP_K = 10


def _as_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def knn_bruteforce_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-k via the Arrow-vectorized tier
    (functions/similarity.cosine_topk_blocked): the 5-row probe set is
    collected driver-side, each corpus batch scores a BLAS matmul and
    emits only its local top-k, and a window rank over the tiny candidate
    union finishes. ~10x the zip_with/aggregate fold on the same data; the
    HOF Column tier (cosine_topk) remains the no-Python baseline."""
    from ..functions.similarity import cosine_topk_blocked

    emb = t(spark, sf_dir, "embeddings")
    probe_rows = [(r["vec_id"], r["embedding"]) for r in
                  emb.filter(F.col("vec_id") < N_PROBES)
                  .select("vec_id", "embedding").collect()]
    out = cosine_topk_blocked(emb, probe_rows, k=TOP_K)
    return out.select("query_id", "neighbor_id",
                      F.round(F.col("cos_sim"), 4).alias("cosine"))


ORACLE_KNN = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
  FROM embeddings),
probes AS (
  SELECT vec_id AS query_id, e AS qe, norm AS qnorm FROM e
  WHERE vec_id < {N_PROBES}),
scored AS (
  SELECT query_id, vec_id AS neighbor_id,
    list_dot_product(qe, e) / (qnorm * norm) AS cos_sim
  FROM e, probes WHERE vec_id <> query_id)
SELECT query_id, neighbor_id, ROUND(cos_sim, 4) AS cosine
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY cos_sim DESC, neighbor_id ASC) AS rn FROM scored) x
WHERE rn <= {TOP_K}
"""


NLIST = 8      # seed centroids: embeddings with vec_id < NLIST
NPROBE = 3     # cells searched per probe


def ivf_ann_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-k (functions/similarity.ivf_topk): corpus partitioned
    into NLIST cells by nearest seed centroid, probes search only their
    NPROBE nearest cells via a cluster_id equi-join — the scale path next
    to knn_bruteforce_cosine's exact scan. Seed centroids (first NLIST
    vectors) keep the operator deterministic and SQL-expressible, so the
    approximate result itself is oracle-checked (a trained-centroid
    deployment swaps in a k-means table; the plan shape is identical)."""
    from ..functions.similarity import ivf_topk

    emb = t(spark, sf_dir, "embeddings")
    cents = (emb.filter(F.col("vec_id") < NLIST)
             .select(F.col("vec_id").alias("cent_id"), "embedding"))
    probes = (emb.filter(F.col("vec_id") < N_PROBES)
              .select(F.col("vec_id").alias("query_id"), "embedding"))
    out = ivf_topk(emb, probes, cents, k=TOP_K, nprobe=NPROBE)
    return out.select("query_id", "neighbor_id",
                      F.round(F.col("cos_sim"), 4).alias("cosine"))


ORACLE_IVF = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS e,
         sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS norm
  FROM embeddings),
cents AS (
  SELECT vec_id AS cent_id, e AS ce, norm AS cnorm FROM e
  WHERE vec_id < {NLIST}),
scored AS (
  SELECT vec_id, cent_id,
    ROUND(list_dot_product(e.e, ce) / (norm * cnorm), 6) AS s
  FROM e, cents),
assigned AS (
  SELECT vec_id, cent_id AS cluster_id FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
        ORDER BY s DESC, cent_id ASC) AS rn FROM scored) x
  WHERE rn = 1),
probed AS (
  SELECT query_id, cluster_id FROM (
    SELECT vec_id AS query_id, cent_id AS cluster_id,
      ROW_NUMBER() OVER (PARTITION BY vec_id
          ORDER BY s DESC, cent_id ASC) AS rn
    FROM scored WHERE vec_id < {N_PROBES}) x
  WHERE rn <= {NPROBE}),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM assigned a JOIN probed p ON a.cluster_id = p.cluster_id
  WHERE a.vec_id <> p.query_id),
sc AS (
  SELECT c.query_id, c.neighbor_id,
    list_dot_product(q.e, n.e) / (q.norm * n.norm) AS cos_sim
  FROM cand c
  JOIN e q ON q.vec_id = c.query_id
  JOIN e n ON n.vec_id = c.neighbor_id)
SELECT query_id, neighbor_id, ROUND(cos_sim, 4) AS cosine
FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
        ORDER BY cos_sim DESC, neighbor_id ASC) AS rn FROM sc) x
WHERE rn <= {TOP_K}
"""


def embedding_label_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector stats: count + mean L2 norm (rounded pre-avg so the
    avg is over identical doubles in both engines)."""
    emb = t(spark, sf_dir, "embeddings").select(
        "label", _as_double(F.col("embedding")).alias("e"))
    norm_r = F.round(F.sqrt(_dot(F.col("e"), F.col("e"))), 6)
    return (
        emb.select("label", norm_r.alias("norm_r"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_vecs"),
             (F.sum(F.col("norm_r").cast("decimal(38,6)")).cast("double")
              / F.count(F.lit(1))).alias("avg_norm"))
    )


ORACLE_LABEL_STATS = """
SELECT label, COUNT(*) AS n_vecs,
  CAST(SUM(CAST(ROUND(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6)
      AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_norm
FROM embeddings
GROUP BY label
"""


def embedding_centroid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each vector to the nearest of the per-label mean dimension-0..3
    centroid — exercises array indexing + argmin over a small broadcast set.
    Output: label, assigned count per (label, nearest_label)."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", "label", _as_double(F.col("embedding")).alias("e"))
    # centroids over first 4 dims, exact decimal means for determinism
    dims = [F.round(
        F.sum(F.element_at(F.col("e"), i + 1).cast("decimal(38,9)")).cast("double")
        / F.count(F.lit(1)), 6).alias(f"c{i}") for i in range(4)]
    cents = emb.groupBy(F.col("label").alias("c_label")).agg(*dims)
    # broadcast boundary: one row per label — bounded by the label-domain
    # cardinality (constant, not data-sized); size-invariant broadcast
    joined = emb.crossJoin(F.broadcast(cents))
    dist = sum(
        (F.element_at(F.col("e"), i + 1) - F.col(f"c{i}"))
        * (F.element_at(F.col("e"), i + 1) - F.col(f"c{i}"))
        for i in range(4))
    w = Window.partitionBy("vec_id").orderBy(F.asc("d"), F.asc("c_label"))
    return (
        joined.select("vec_id", "label", F.col("c_label"),
                      F.round(dist, 9).alias("d"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .groupBy("label", F.col("c_label").alias("nearest_label"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


ORACLE_CENTROID = """
WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings),
cents AS (
  SELECT label AS c_label,
    ROUND(CAST(SUM(CAST(e[1] AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*), 6) AS c0,
    ROUND(CAST(SUM(CAST(e[2] AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*), 6) AS c1,
    ROUND(CAST(SUM(CAST(e[3] AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*), 6) AS c2,
    ROUND(CAST(SUM(CAST(e[4] AS DECIMAL(38,9))) AS DOUBLE) / COUNT(*), 6) AS c3
  FROM e GROUP BY label),
scored AS (
  SELECT vec_id, label, c_label,
    ROUND((e[1]-c0)*(e[1]-c0) + (e[2]-c1)*(e[2]-c1)
        + (e[3]-c2)*(e[3]-c2) + (e[4]-c3)*(e[4]-c3), 9) AS d
  FROM e, cents),
best AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
      ORDER BY d ASC, c_label ASC) AS rn FROM scored)
SELECT label, c_label AS nearest_label, COUNT(*) AS n
FROM best WHERE rn = 1
GROUP BY label, c_label
"""


def embedding_int8_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization per vector (the storage-shrink step of
    an ANN index build): scale = 127 / max|x|, q = round(x * scale).
    Pure array Columns (transform/array_max) — map-side only, no shuffle;
    at 100 TB this runs embedded in the scan stage."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("e"))
    amax = F.array_max(F.transform(F.col("e"), lambda x: F.abs(x)))
    scale = F.lit(127.0) / amax
    q = F.transform(F.col("e"),
                    lambda x: F.round(x * scale).cast("int"))
    return emb.select(
        "vec_id",
        F.round(scale, 6).alias("scale_r"),
        F.element_at(q, 1).alias("q0"), F.element_at(q, 2).alias("q1"),
        F.element_at(q, 3).alias("q2"), F.element_at(q, 4).alias("q3"))


ORACLE_INT8_QUANT = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
s AS (SELECT vec_id, e,
        127.0 / list_max(list_transform(e, x -> abs(x))) AS scale
      FROM e)
SELECT vec_id, ROUND(scale, 6) AS scale_r,
  CAST(ROUND(e[1] * scale) AS INT) AS q0,
  CAST(ROUND(e[2] * scale) AS INT) AS q1,
  CAST(ROUND(e[3] * scale) AS INT) AS q2,
  CAST(ROUND(e[4] * scale) AS INT) AS q3
FROM s
"""


K_CENTS = 4        # k-means: clusters
K_ITERS = 3        # fixed Lloyd iterations (unrolled in the oracle)
K_DIMS = 4         # first 4 dims (keeps the unrolled SQL manageable)


def _km_assign(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """Nearest-centroid assignment on K_DIMS dims: squared distance
    rounded to 9dp (cross-engine fp safety), centroid id breaks ties."""
    from pyspark.sql.window import Window
    # broadcast boundary: cents is exactly K_CENTS rows at any data
    # scale; size-invariant broadcast
    joined = emb.crossJoin(F.broadcast(cents))
    dist = sum((F.col(f"d{i}") - F.col(f"c{i}"))
               * (F.col(f"d{i}") - F.col(f"c{i}")) for i in range(K_DIMS))
    w = Window.partitionBy("vec_id").orderBy(F.asc("dd"), F.asc("cent_id"))
    return (joined.select("vec_id", *[f"d{i}" for i in range(K_DIMS)],
                          "cent_id", F.round(dist, 9).alias("dd"))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .drop("rn", "dd"))


def _km_means(assigned: DataFrame) -> DataFrame:
    """Per-cluster decimal-exact means rounded to 6dp (identical float
    inputs for the next iteration on both engines)."""
    aggs = [F.round(
        F.sum(F.col(f"d{i}").cast("decimal(38,9)")).cast("double")
        / F.count(F.lit(1)), 6).alias(f"c{i}") for i in range(K_DIMS)]
    return assigned.groupBy("cent_id").agg(*aggs)


def kmeans_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means over the embedding head dims: K_ITERS Lloyd iterations,
    seeded from the first K_CENTS vectors — the iterative-algorithm
    pattern (train loop driving DataFrame ops), made oracle-checkable by
    fixed iteration count + decimal-rounded means (the oracle unrolls
    the same iterations as CTE stages). Per iteration: one broadcast
    crossJoin (k rows) + one shuffle on cent_id — at 100 TB each
    iteration is a map-side assignment plus a k-row aggregate."""
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("e"))
    emb = emb.select(
        "vec_id", *[F.element_at("e", i + 1).alias(f"d{i}")
                    for i in range(K_DIMS)])
    cents = (emb.filter(F.col("vec_id") < K_CENTS)
             .select(F.col("vec_id").cast("int").alias("cent_id"),
                     *[F.round(F.col(f"d{i}"), 6).alias(f"c{i}")
                       for i in range(K_DIMS)]))
    assigned = None
    for _ in range(K_ITERS):
        assigned = _km_assign(emb, cents)
        cents = _km_means(assigned)
    final = assigned.groupBy("cent_id").agg(F.count(F.lit(1)).alias("n"))
    return (cents.join(final, "cent_id")
            .select("cent_id", "n", *[f"c{i}" for i in range(K_DIMS)]))


def _kmeans_ctes(n_assign: "int | None" = None) -> tuple[list, int]:
    """Shared CTE prefix for the k-means oracles: seed c0, then
    assign/means pairs a1..c{K_ITERS}; ``n_assign`` > K_ITERS appends
    extra assignment-only stages against the final centroids (the IVF
    composition needs the corpus assigned to c{K_ITERS})."""
    dims = range(K_DIMS)
    assign = """
a{it} AS (
  SELECT vec_id, {dcols}, cent_id FROM (
    SELECT e.vec_id, {edcols}, c.cent_id,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        ROUND({dist}, 9) ASC, c.cent_id ASC) AS rn
    FROM e, c{prev} c) x
  WHERE rn = 1)"""
    means = """
c{it} AS (
  SELECT cent_id, {mcols}
  FROM a{it} GROUP BY cent_id)"""
    parts = ["""e AS (
  SELECT vec_id, {eds} FROM (
    SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings) x)""".format(
        eds=", ".join(f"e[{i+1}] AS d{i}" for i in dims)), """
c0 AS (
  SELECT CAST(vec_id AS INT) AS cent_id, {cs} FROM e
  WHERE vec_id < {k})""".format(
        cs=", ".join(f"ROUND(d{i}, 6) AS c{i}" for i in dims), k=K_CENTS)]

    def one_assign(it: int, prev: int) -> str:
        return assign.format(
            it=it, prev=prev,
            dcols=", ".join(f"d{i}" for i in dims),
            edcols=", ".join(f"e.d{i}" for i in dims),
            dist=" + ".join(f"(e.d{i} - c.c{i}) * (e.d{i} - c.c{i})"
                            for i in dims))

    for it in range(1, K_ITERS + 1):
        parts.append(one_assign(it, it - 1))
        parts.append(means.format(
            it=it,
            mcols=", ".join(
                f"ROUND(CAST(SUM(CAST(d{i} AS DECIMAL(38,9))) AS DOUBLE)"
                f" / COUNT(*), 6) AS c{i}" for i in dims)))
    last = K_ITERS
    for it in range(K_ITERS + 1, (n_assign or K_ITERS) + 1):
        parts.append(one_assign(it, K_ITERS))
        last = it
    return parts, last


def _kmeans_oracle() -> str:
    dims = range(K_DIMS)
    parts, last = _kmeans_ctes()
    return ("WITH " + ",".join(parts) + f"""
SELECT c.cent_id, f.n, {", ".join(f"c.c{i}" for i in dims)}
FROM c{last} c
JOIN (SELECT cent_id, COUNT(*) AS n FROM a{last} GROUP BY cent_id) f
  ON c.cent_id = f.cent_id""")


ORACLE_KMEANS = _kmeans_oracle()

# trained-ANN composition parameters
IVF_T_PROBES = 3
IVF_T_NPROBE = 2
IVF_T_TOPK = 5


def ivf_trained_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full train-then-search ANN pipeline in one plan: k-means
    centroids (same fixed-iteration loop as kmeans_centroids) partition
    the corpus; each probe searches only its IVF_T_NPROBE nearest
    TRAINED cells; exact squared-distance rank within the candidates.
    Composition of two oracle-checked stages, itself oracle-checked —
    the deployment shape the seed-centroid ivf_ann_neighbors entry
    stands in for. At 100 TB: per-iteration map-side assignment +
    k-row aggregate, then a cluster_id equi-join — no cross join over
    the corpus pairs anywhere."""
    from pyspark.sql.window import Window
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double(F.col("embedding")).alias("e"))
    emb = emb.select(
        "vec_id", *[F.element_at("e", i + 1).alias(f"d{i}")
                    for i in range(K_DIMS)])
    cents = (emb.filter(F.col("vec_id") < K_CENTS)
             .select(F.col("vec_id").cast("int").alias("cent_id"),
                     *[F.round(F.col(f"d{i}"), 6).alias(f"c{i}")
                       for i in range(K_DIMS)]))
    for _ in range(K_ITERS):
        cents = _km_means(_km_assign(emb, cents))
    assigned = _km_assign(emb, cents)          # corpus -> final cells
    probes = emb.filter(F.col("vec_id") < IVF_T_PROBES)
    pdist = F.round(sum((F.col(f"d{i}") - F.col(f"c{i}"))
                        * (F.col(f"d{i}") - F.col(f"c{i}"))
                        for i in range(K_DIMS)), 9)
    wp = Window.partitionBy("query_id").orderBy(F.asc("dd"),
                                                F.asc("cent_id"))
    probed = (probes.crossJoin(F.broadcast(cents))
              .select(F.col("vec_id").alias("query_id"), "cent_id",
                      pdist.alias("dd"))
              .withColumn("rn", F.row_number().over(wp))
              .filter(F.col("rn") <= IVF_T_NPROBE)
              .select("query_id", "cent_id"))
    q = probes.select(F.col("vec_id").alias("query_id"),
                      *[F.col(f"d{i}").alias(f"q{i}")
                        for i in range(K_DIMS)])
    # broadcast boundaries: probed ≤ IVF_T_PROBES×IVF_T_NPROBE rows and
    # q = IVF_T_PROBES rows — both bounded by the query-batch constant,
    # not by corpus size; a production batch of millions of queries
    # would drop these hints and shuffle on cent_id/query_id instead
    cand = (assigned.join(F.broadcast(probed), "cent_id")
            .filter(F.col("vec_id") != F.col("query_id"))
            .join(F.broadcast(q), "query_id"))
    dist2 = F.round(sum((F.col(f"d{i}") - F.col(f"q{i}"))
                        * (F.col(f"d{i}") - F.col(f"q{i}"))
                        for i in range(K_DIMS)), 6)
    wk = Window.partitionBy("query_id").orderBy(F.asc("dist"),
                                                F.asc("neighbor_id"))
    return (cand.select("query_id", F.col("vec_id").alias("neighbor_id"),
                        dist2.alias("dist"))
            .withColumn("rn", F.row_number().over(wk))
            .filter(F.col("rn") <= IVF_T_TOPK)
            .drop("rn"))


def _ivf_trained_oracle() -> str:
    dims = range(K_DIMS)
    parts, last = _kmeans_ctes(n_assign=K_ITERS + 1)
    cdist = " + ".join(f"(e.d{i} - c.c{i}) * (e.d{i} - c.c{i})"
                       for i in dims)
    ndist = " + ".join(f"(n.d{i} - q.d{i}) * (n.d{i} - q.d{i})"
                       for i in dims)
    return ("WITH " + ",".join(parts) + f""",
probed AS (
  SELECT query_id, cent_id FROM (
    SELECT e.vec_id AS query_id, c.cent_id,
      ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
        ROUND({cdist}, 9) ASC, c.cent_id ASC) AS rn
    FROM e, c{K_ITERS} c WHERE e.vec_id < {IVF_T_PROBES}) x
  WHERE rn <= {IVF_T_NPROBE}),
cand AS (
  SELECT p.query_id, a.vec_id AS neighbor_id
  FROM a{last} a JOIN probed p ON a.cent_id = p.cent_id
  WHERE a.vec_id <> p.query_id),
d2 AS (
  SELECT c.query_id, c.neighbor_id, ROUND({ndist}, 6) AS dist
  FROM cand c
  JOIN e q ON q.vec_id = c.query_id
  JOIN e n ON n.vec_id = c.neighbor_id)
SELECT query_id, neighbor_id, dist FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
      ORDER BY dist ASC, neighbor_id ASC) AS rn FROM d2) x
WHERE rn <= {IVF_T_TOPK}""")


ORACLE_IVF_TRAINED = _ivf_trained_oracle()
