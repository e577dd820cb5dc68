"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (the whole point of these at 100 TB):
- Exact dedup is a hash-groupBy — one shuffle on a 16-byte digest, never on
  the full text.
- MinHash-LSH: shingle → K minhashes → B bands; candidate pairs come from a
  self-join on (band_id, band_hash) buckets, so the join key space is tiny
  and skew-resistant; only candidates get verified. No O(n²) stage.
- SimHash: 64-bit signature per doc via bit-vote aggregation of token
  hashes — computed entirely with higher-order functions, then near-dup =
  hamming distance ≤ d on bucketed prefixes.
- n-gram Jaccard: exact verification metric, explode+join on shingle
  hashes, computed only for LSH candidates (or small inputs).

All hashing is Spark's xxhash64 (JVM, deterministic across runs/clusters).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Mersenne prime 2^31-1 for the universal-hash family: with a,b,x < 2^31,
# a*x+b < 2^62 stays inside a 64-bit long (Spark runs ANSI mode — a 2^61
# prime would overflow the multiply). 31-bit minhash space is ample.
_MERSENNE = (1 << 31) - 1


def poly_hash64(col: Column | str) -> Column:
    """SQL-expressible deterministic string hash (~62 bits): two 31-bit
    polynomial rolling hashes over Unicode code points (multipliers 31/37,
    inits 7/11, mod 2^31-1) packed as hi*2^31+lo. Bit-identical to the
    DuckDB expression emitted by ``queries._sqlhash.duck_poly64`` — this is
    the hash the oracle-gated dedup entries use so MinHash/SimHash/LSH
    outputs are cross-engine checkable. xxhash64 stays the production
    default (JVM-native, faster, 64 full bits); the pipelines accept either
    via their ``hash_fn`` parameter. Stays in ANSI-safe long range:
    acc < 2^31 so acc*37+c < 2^36, and hi*2^31+lo < 2^62."""
    c = F.col(col) if isinstance(col, str) else col
    codes = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(c), F.lit(1))),
        lambda i: F.ascii(c.substr(i, F.lit(1))).cast("long"))

    def fold(mult: int, init: int) -> Column:
        return F.aggregate(
            codes, F.lit(init).cast("long"),
            lambda acc, x: F.pmod(acc * mult + x, F.lit(_MERSENNE)))

    return fold(31, 7) * F.lit(1 << 31).cast("long") + fold(37, 11)


def exact_dedup(df: DataFrame, cols: list[str] | None = None,
                id_col: str = "doc_id") -> DataFrame:
    """Keep one row (min id) per distinct value of `cols` (default: all
    non-id columns). Shuffles on a digest, not the payload."""
    cols = cols or [c for c in df.columns if c != id_col]
    digest = F.md5(F.to_json(F.struct(*[F.col(c) for c in cols])).cast("binary"))
    keep = (df.select(F.col(id_col), digest.alias("__digest"))
            .groupBy("__digest").agg(F.min(id_col).alias(id_col)))
    return df.join(keep.select(id_col), id_col, "left_semi")


def char_shingles(col: Column | str, k: int = 5, hash_fn=F.xxhash64) -> Column:
    """Array of hashed k-char shingles (distinct). ``hash_fn`` maps a
    string Column to a long Column — xxhash64 (default) or poly_hash64
    (SQL-expressible, for oracle-gated runs)."""
    c = F.col(col) if isinstance(col, str) else col
    starts = F.sequence(F.lit(1), F.greatest(F.length(c) - k + 1, F.lit(1)))
    return F.array_distinct(
        F.transform(starts, lambda s: hash_fn(c.substr(s, F.lit(k)))))


def word_shingles(col: Column | str, k: int = 3, hash_fn=F.xxhash64) -> Column:
    """Array of hashed k-word shingles (distinct)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.trim(c), r"\s+")
    n = F.size(toks)
    starts = F.sequence(F.lit(1), F.greatest(n - k + 1, F.lit(1)))
    return F.array_distinct(F.transform(
        starts,
        lambda s: hash_fn(F.concat_ws(" ", F.slice(toks, s, k)))))


def minhash_signature(shingles: Column, num_hashes: int = 128,
                      seed: int = 42) -> Column:
    """MinHash signature: for hash family h_i(x) = (a_i*x + b_i) mod p,
    signature[i] = min over shingles. a_i/b_i derived deterministically
    from the seed. Pure HOF pipeline — one pass over the shingle array per
    hash function, no shuffle, no UDF."""
    import random
    rng = random.Random(seed)
    params = [(rng.randrange(1, _MERSENNE), rng.randrange(0, _MERSENNE))
              for _ in range(num_hashes)]
    # pmod keeps values positive (xxhash64 is signed)
    def h(a: int, b: int) -> Column:
        return F.array_min(F.transform(
            shingles,
            lambda x: F.pmod(F.pmod(x, F.lit(_MERSENNE)) * F.lit(a) + F.lit(b),
                             F.lit(_MERSENNE))))
    return F.array(*[h(a, b) for a, b in params])


def minhash_lsh_candidates(df: DataFrame, id_col: str, sig_col: str,
                           num_bands: int = 16,
                           hash_fn=F.xxhash64) -> DataFrame:
    """Candidate duplicate pairs (id_a < id_b) from band-bucket collisions.
    Shuffle key = (band index, band hash): uniform, small, skew-free."""
    bands = df.select(
        F.col(id_col),
        F.posexplode(_banded(F.col(sig_col), num_bands,
                             hash_fn)).alias("band", "band_hash"))
    a = bands.select(F.col(id_col).alias("id_a"), "band", "band_hash")
    b = bands.select(F.col(id_col).alias("id_b"), "band", "band_hash")
    return (a.join(b, ["band", "band_hash"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())


def _banded(sig: Column, num_bands: int, hash_fn=F.xxhash64) -> Column:
    """Split a signature array into num_bands band-hashes."""
    band_size = F.size(sig) / num_bands
    idx = F.sequence(F.lit(0), F.lit(num_bands - 1))
    return F.transform(
        idx, lambda i: hash_fn(F.concat_ws(
            ",", F.transform(F.slice(sig, (i * band_size + 1).cast("int"),
                                     band_size.cast("int")),
                             lambda v: v.cast("string")))))


def minhash_dedup_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k_shingle: int = 3,
                        num_hashes: int = 128, num_bands: int = 16,
                        jaccard_threshold: float = 0.8,
                        use_words: bool = True,
                        hash_fn=F.xxhash64) -> DataFrame:
    """End-to-end near-dup pairs: shingle → minhash → LSH candidates →
    exact-Jaccard verification of candidates only. Word shingles by
    default (char shingles saturate on small-vocabulary text)."""
    mk = word_shingles if use_words else char_shingles
    sh = df.select(F.col(id_col), mk(text_col, k_shingle,
                                     hash_fn=hash_fn).alias("sh"))
    sigs = sh.select(id_col, minhash_signature(F.col("sh"), num_hashes).alias("sig"))
    cands = minhash_lsh_candidates(sigs, id_col, "sig", num_bands, hash_fn)
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    verified = (cands.join(a, "id_a").join(b, "id_b")
                .withColumn("jaccard", _jaccard(F.col("sh_a"), F.col("sh_b")))
                .filter(F.col("jaccard") >= jaccard_threshold)
                .select("id_a", "id_b", "jaccard"))
    return verified


def _jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    return inter.cast("double") / (F.size(a) + F.size(b) - inter)


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", k: int = 3,
                        threshold: float = 0.5,
                        use_words: bool = True) -> DataFrame:
    """Exact Jaccard similarity over k-gram shingle sets for all pairs
    above threshold, via explode + equi-join on shingle hash (no cross
    join): |A∩B| from join counts, |A|,|B| from per-doc sizes."""
    mk = word_shingles if use_words else char_shingles
    sh = df.select(F.col(id_col), mk(text_col, k).alias("sh"))
    sizes = sh.select(id_col, F.size("sh").alias("sz"))
    ex = sh.select(id_col, F.explode("sh").alias("g"))
    a = ex.select(F.col(id_col).alias("id_a"), "g")
    b = ex.select(F.col(id_col).alias("id_b"), "g")
    inter = (a.join(b, "g").filter(F.col("id_a") < F.col("id_b"))
             .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("n_inter")))
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b"))
    return (inter.join(sa, "id_a").join(sb, "id_b")
            .withColumn("jaccard", F.col("n_inter").cast("double")
                        / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard"))


def simhash(col: Column | str, hash_bits: int = 64,
            hash_fn=F.xxhash64) -> Column:
    """64-bit SimHash of whitespace tokens: per-bit vote of token hashes.
    bit_j(sig) = 1 iff Σ_tokens sign(bit_j(hash(tok))) > 0.
    Pure Column expressions, statically unrolled over bit positions
    (shift amounts must be Python ints in the pyspark API)."""
    c = F.col(col) if isinstance(col, str) else col
    toks = F.split(F.trim(c), r"\s+")
    hashes = F.transform(toks, lambda t: hash_fn(t))
    n = F.size(hashes)
    sig = F.lit(0).cast("long")
    for j in range(hash_bits):
        ones = F.size(F.filter(
            hashes, lambda h: F.getbit(h, F.lit(j)) == 1))
        # bit 63 is the sign bit: its set-value is long MIN, not 1<<63
        bit_val = F.lit(-(1 << 63) if j == 63 else (1 << j)).cast("long")
        sig = sig.bitwiseOR(F.when(ones * 2 > n, bit_val)
                            .otherwise(F.lit(0).cast("long")))
    return sig


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit signatures (popcount of XOR)."""
    return F.bit_count(a.bitwiseXOR(b)).cast("int")


def simhash_near_dup_pairs(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id",
                           max_hamming: int = 3,
                           n_prefix_buckets: int = 4,
                           hash_fn=F.xxhash64) -> DataFrame:
    """Near-dup pairs by SimHash: bucket on 16-bit signature slices (a pair
    within hamming d must share at least one of 4 slices when d ≤ 3 —
    pigeonhole), then verify hamming distance within buckets."""
    sigs = df.select(F.col(id_col), simhash(text_col,
                                            hash_fn=hash_fn).alias("sig"))
    slices = F.array(*[
        F.shiftright(F.col("sig"), i * 16).bitwiseAND(F.lit(0xFFFF))
        for i in range(n_prefix_buckets)])
    sliced = sigs.select(
        id_col, "sig",
        F.posexplode(slices).alias("slice_i", "slice_v"))
    a = sliced.select(F.col(id_col).alias("id_a"), F.col("sig").alias("sig_a"),
                      "slice_i", "slice_v")
    b = sliced.select(F.col(id_col).alias("id_b"), F.col("sig").alias("sig_b"),
                      "slice_i", "slice_v")
    cands = (a.join(b, ["slice_i", "slice_v"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b", "sig_a", "sig_b").distinct())
    return (cands.withColumn("hamming", hamming64(F.col("sig_a"), F.col("sig_b")))
            .filter(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))


def duplicate_components(pairs: DataFrame, id_a: str = "id_a",
                         id_b: str = "id_b",
                         max_iterations: int = 20) -> DataFrame:
    """Connected components over a near-duplicate pair graph — the step
    that turns pairwise dedup output into retention decisions (keep one
    doc per component). Returns (doc_id, cluster_id) with cluster_id =
    the minimum doc id reachable from doc_id.

    Algorithm: min-label propagation. Each iteration joins labels across
    edges and takes the per-node minimum; converges in O(diameter)
    rounds (dup clusters are shallow in practice). Every round is one
    shuffle on node id — no driver-side graph materialization, so this
    scales to billion-edge dedup graphs; the driver only checks a
    one-row convergence count per round."""
    edges = (pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
             .unionByName(pairs.select(F.col(id_b).alias("a"),
                                       F.col(id_a).alias("b")))
             .distinct())
    labels = (edges.select(F.col("a").alias("n")).distinct()
              .withColumn("label", F.col("n")))
    for _ in range(max_iterations):
        neighbor_min = (edges.join(labels, edges.b == labels.n)
                        .groupBy("a").agg(F.min("label").alias("nlabel")))
        new_labels = (labels.join(neighbor_min,
                                  labels.n == neighbor_min.a, "left")
                      .select(F.col("n"),
                              F.least(F.col("label"),
                                      F.coalesce(F.col("nlabel"),
                                                 F.col("label")))
                              .alias("label")))
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (new_labels.alias("x")
                   .join(labels.alias("y"), "n")
                   .filter(F.col("x.label") != F.col("y.label"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("n").alias("doc_id"),
                         F.col("label").alias("cluster_id"))


def contamination_flags(df: DataFrame, benchmark: DataFrame,
                        text_col: str = "text", id_col: str = "doc_id",
                        k: int = 5, min_hits: int = 1) -> DataFrame:
    """Benchmark decontamination sweep: flag training documents sharing
    at least ``min_hits`` DISTINCT word k-grams with any benchmark
    document. The benchmark shingle set dedupes then broadcasts
    (benchmark suites are tiny next to a training corpus), so the
    corpus side is one scan + one broadcast semi-ish join + one groupBy
    — no shuffle of the corpus by gram."""
    sh = df.select(id_col, word_shingles(text_col, k).alias("sh"))
    ex = sh.select(id_col, F.explode("sh").alias("g"))
    bm = (benchmark.select(word_shingles(text_col, k).alias("sh"))
          .select(F.explode("sh").alias("g")).distinct())
    hits = (ex.join(F.broadcast(bm), "g")
            .groupBy(id_col)
            .agg(F.count_distinct("g").alias("n_contaminated_grams")))
    return (hits.filter(F.col("n_contaminated_grams") >= min_hits)
            .select(id_col,
                    F.col("n_contaminated_grams").cast("long")
                    .alias("n_contaminated_grams")))
