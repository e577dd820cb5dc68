"""Generated DuckDB oracle SQL for the hash-dependent pipeline operators.

Round-3 verdict "Next round #2": MinHash/SimHash/LSH gate entries were
``no_oracle`` because their production hash (xxhash64) is JVM-only. Nothing
in those algorithms requires xxhash64 specifically, so the gate entries run
with ``functions.dedup.poly_hash64`` — an SQL-expressible deterministic
string hash — and this module emits the *matching* DuckDB SQL, constant for
constant (minhash (a,b) params, LSH hyperplane coordinates), so the driver
can hash-compare full pipeline outputs cross-engine. Production paths keep
xxhash64 via the ``hash_fn`` default.

The SQL is generated (Python f-strings over the same seeded constants the
Spark builders use) rather than hand-written, so the two sides cannot
drift: both derive from ``random.Random(seed)`` in the same order.
"""

from __future__ import annotations

import random

_P = (1 << 31) - 1  # functions.dedup._MERSENNE


def duck_poly64(expr: str) -> str:
    """DuckDB expression computing functions.dedup.poly_hash64(expr):
    hi*2^31+lo with hi/lo = polynomial fold (mult 31/37, init 7/11) over
    code points mod 2^31-1. Fold-left with a prepended init is IEEE/
    integer-identical to Spark's F.aggregate(init, ...). ``expr`` is
    referenced four times — pass a column name, not a subexpression."""
    codes = (f"[CAST(ascii({expr}[__i]) AS BIGINT) "
             f"for __i in range(1, greatest(length({expr}), 1) + 1)]")

    def fold(mult: int, init: int) -> str:
        return (f"list_reduce(list_prepend(CAST({init} AS BIGINT), {codes}), "
                f"(__a, __c) -> (__a * {mult} + __c) % {_P})")

    return f"({fold(31, 7)} * 2147483648 + {fold(37, 11)})"


def duck_dot(va: str, vb: str, dim: int) -> str:
    """DuckDB expression for functions.similarity.dot(va, vb): fold-left
    sum of elementwise products from a 0.0 seed — the exact IEEE order
    Spark's aggregate(zip_with(...)) uses, so sign decisions on
    hyperplane projections cannot diverge."""
    prods = f"[{va}[__i] * {vb}[__i] for __i in range(1, {dim} + 1)]"
    return (f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), {prods}), "
            f"(__a, __x) -> __a + __x)")


def _word_gram_ctes(k: int = 3) -> str:
    """Shared CTE prefix: distinct poly-hashed word k-grams per document
    (mirrors functions.dedup.word_shingles(text, k, hash_fn=poly_hash64):
    slice-short tail grams included, distinct applied AFTER hashing)."""
    idx = ", ".join(f"tk[__i+{j}]" for j in range(k))
    return f"""
toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
         FROM documents),
grams AS (SELECT doc_id,
            [concat_ws(' ', {idx})
             for __i in range(1, greatest(len(tk) - {k - 1}, 1) + 1)] AS g
          FROM toks),
gx AS (SELECT doc_id, unnest(g) AS s FROM grams),
hx AS (SELECT doc_id, {duck_poly64('s')} AS hv FROM gx),
shh AS (SELECT doc_id, list_distinct(list(hv)) AS h FROM hx GROUP BY doc_id)
"""


def minhash_oracle(num_hashes: int = 128, num_bands: int = 16,
                   seed: int = 42, k_shingle: int = 3,
                   threshold: float = 0.1) -> str:
    """Full MinHash+LSH+verify pipeline in DuckDB SQL, matching
    functions.dedup.minhash_dedup_pairs(..., hash_fn=poly_hash64): the
    (a_i, b_i) universal-hash params replay minhash_signature's
    random.Random(seed) draws in order."""
    rng = random.Random(seed)
    params = [(rng.randrange(1, _P), rng.randrange(0, _P))
              for _ in range(num_hashes)]
    sig_items = ",\n    ".join(
        f"list_min(list_transform(h, __x -> ((__x % {_P}) * {a} + {b}) % {_P}))"
        for a, b in params)
    rows_per_band = num_hashes // num_bands
    return f"""
WITH {_word_gram_ctes(k_shingle)},
sig AS (SELECT doc_id, [
    {sig_items}
  ] AS sig FROM shh),
bands0 AS (
  SELECT doc_id, b.band,
         array_to_string(list_slice(sig, b.band * {rows_per_band} + 1,
                                    (b.band + 1) * {rows_per_band}), ',') AS bs
  FROM sig, (SELECT unnest(range(0, {num_bands})) AS band) b),
bands AS (SELECT doc_id, band, {duck_poly64('bs')} AS bh FROM bands0),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
j AS (
  SELECT id_a, id_b,
         CAST(len(list_intersect(sa.h, sb.h)) AS DOUBLE)
           / (len(sa.h) + len(sb.h) - len(list_intersect(sa.h, sb.h)))
           AS jac
  FROM cand JOIN shh sa ON id_a = sa.doc_id JOIN shh sb ON id_b = sb.doc_id)
SELECT id_a, id_b, ROUND(jac, 6) AS jaccard FROM j WHERE jac >= {threshold}
"""


def simhash_oracle(max_hamming: int = 12, n_slices: int = 4) -> str:
    """SimHash near-dup pipeline in DuckDB SQL, matching
    functions.dedup.simhash_near_dup_pairs(..., hash_fn=poly_hash64).
    poly_hash64 values are < 2^62, so signature bits 62/63 can never win a
    vote — the bit unroll stops at 61 (Spark's loop to 63 produces 0 for
    those bits identically)."""
    votes = "\n    + ".join(
        f"CASE WHEN 2 * len(list_filter(h, __x -> ((__x >> {j}) & 1) = 1)) > n"
        f" THEN CAST({1 << j} AS BIGINT) ELSE 0 END"
        for j in range(62))
    return f"""
WITH toks AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS tk
              FROM documents),
tx AS (SELECT doc_id, unnest(tk) AS s FROM toks),
hx AS (SELECT doc_id, {duck_poly64('s')} AS hv FROM tx),
sg AS (SELECT doc_id, list(hv) AS h, count(*) AS n FROM hx GROUP BY doc_id),
sig AS (SELECT doc_id, ({votes}) AS sig FROM sg),
sl AS (SELECT doc_id, sig, b.i AS slice_i,
              (sig >> (b.i * 16)) & 65535 AS slice_v
       FROM sig, (SELECT unnest(range(0, {n_slices})) AS i) b),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.sig AS sig_a, b.sig AS sig_b
  FROM sl a JOIN sl b
    ON a.slice_i = b.slice_i AND a.slice_v = b.slice_v
   AND a.doc_id < b.doc_id)
SELECT id_a, id_b, CAST(bit_count(xor(sig_a, sig_b)) AS INTEGER) AS hamming
FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= {max_hamming}
"""


def lsh_ann_oracle(dim: int = 64, k: int = 10, n_planes: int = 6,
                   n_tables: int = 16, seed: int = 42,
                   n_probes: int = 5) -> str:
    """Random-hyperplane LSH ANN in DuckDB SQL, matching
    functions.similarity.lsh_ann_topk: plane coordinates replay
    hyperplane_signature's random.Random(seed + t).gauss draws; repr()
    round-trips each float64 bit-exactly into the SQL text."""
    def sig_expr(v: str, t: int) -> str:
        rng = random.Random(seed + t)
        planes = [[rng.gauss(0.0, 1.0) for _ in range(dim)]
                  for _ in range(n_planes)]
        bits = []
        for i, h in enumerate(planes):
            lit = "[" + ", ".join(repr(x) for x in h) + "]"
            bits.append(f"CASE WHEN {duck_dot(v, f'({lit})', dim)} > 0 "
                        f"THEN CAST({1 << i} AS BIGINT) ELSE 0 END")
        return "(" + "\n   + ".join(bits) + ")"

    csig = "\n  UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, {sig_expr('v', t)} AS sig FROM n"
        for t in range(n_tables))
    psig = "\n  UNION ALL ".join(
        f"SELECT query_id, {t} AS tbl, {sig_expr('pv', t)} AS sig FROM p"
        for t in range(n_tables))
    return f"""
WITH e AS (SELECT vec_id, [CAST(__x AS DOUBLE) for __x in embedding] AS v
           FROM embeddings),
n AS (SELECT vec_id, v, sqrt({duck_dot('v', 'v', dim)}) AS nn FROM e),
p AS (SELECT vec_id AS query_id, v AS pv, nn AS pn FROM n
      WHERE vec_id < {n_probes}),
csig AS (
  {csig}),
psig AS (
  {psig}),
cand AS (
  SELECT DISTINCT c.vec_id AS neighbor_id, s.query_id
  FROM csig c JOIN psig s ON c.tbl = s.tbl AND c.sig = s.sig
  WHERE c.vec_id != s.query_id),
scored AS (
  SELECT cand.query_id, cand.neighbor_id,
         {duck_dot('p.pv', 'n.v', dim)} / (p.pn * n.nn) AS cos_sim
  FROM cand JOIN n ON cand.neighbor_id = n.vec_id
            JOIN p ON cand.query_id = p.query_id),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rn
  FROM scored)
SELECT query_id, neighbor_id, ROUND(cos_sim, 4) AS cosine
FROM ranked WHERE rn <= {k}
"""


# --- multimodal fake-decoder oracles -------------------------------------
# The mm_* gate entries feed documents.text bytes (pure ASCII — byte i ==
# code point i) through the real mapInPandas plumbing with the documented
# deterministic fake codecs (functions/multimodal.py). Those codecs are
# plain byte arithmetic, so DuckDB can replay them over the same text.

def _byte_sum(limit: int) -> str:
    return (f"list_sum([CAST(ascii(text[__i]) AS BIGINT) "
            f"for __i in range(1, least(length(text), {limit}) + 1)])")


ORACLE_MM_IMAGE = f"""
WITH b AS (SELECT doc_id AS media_id, length(text) AS n,
                  {_byte_sum(64)} AS s FROM documents)
SELECT media_id,
  CAST((n % 640) + 1 AS INTEGER) AS width,
  CAST((n % 480) + 1 AS INTEGER) AS height,
  CAST(n AS BIGINT) AS n_bytes,
  CAST(s % 2560 AS DOUBLE) / 10.0 AS mean_luma
FROM b
"""

ORACLE_MM_AUDIO = f"""
WITH b AS (SELECT doc_id AS media_id, length(text) AS n,
                  {_byte_sum(128)} AS s FROM documents)
SELECT media_id,
  CAST(n * 5 AS BIGINT) AS duration_ms,
  CAST(n AS BIGINT) AS n_bytes,
  CAST(8000 + (n % 5) * 8000 AS INTEGER) AS est_sample_rate,
  CAST(s % 10000 AS DOUBLE) / 10000.0 AS rms_energy
FROM b
"""

ORACLE_MM_FRAMES = """
WITH d AS (SELECT doc_id AS media_id, text, length(text) AS n,
                  length(text) * 10 AS dur
           FROM documents WHERE doc_id < 50),
f AS (SELECT media_id, text, n,
             unnest(range(0, CAST(dur AS BIGINT), 1000)) AS ts
      FROM d)
SELECT media_id,
  CAST(ts // 1000 AS INTEGER) AS frame_idx,
  CAST(ts AS BIGINT) AS ts_ms,
  md5(substring(text, CAST((ts // 100) % greatest(n, 1) AS BIGINT) + 1,
                256)) AS frame_md5
FROM f
"""
# frame_md5 note: DuckDB's md5() is VARCHAR-only; the document text is
# ASCII so md5(substring(text,...)) hashes the same bytes Spark's
# F.md5(frame_payload) hashes (payload = encode(text,'utf-8'), fake
# extractor slices bytes at the same offsets). The gate projects a digest
# rather than raw bytes because the driver's pandas canonicalizer cannot
# sort bytearray cells (r4 verdict #1).

def fingerprint_overlap_oracle(window: int = 64, stride: int = 32,
                               min_shared: int = 2) -> str:
    """Rolling-fingerprint containment pairs in DuckDB SQL, matching
    functions.text.rolling_fingerprints(..., hash_fn=poly_hash64):
    documents sharing >= min_shared distinct window hashes."""
    return f"""
WITH w AS (
  SELECT doc_id,
         [substring(text, __s, {window})
          for __s in range(1, greatest(length(text) - {window - 1}, 1) + 1,
                           {stride})] AS ws
  FROM documents),
wx AS (SELECT doc_id, unnest(ws) AS s FROM w),
hx AS (SELECT DISTINCT doc_id, {duck_poly64('s')} AS hv FROM wx),
pairs AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         COUNT(*) AS n_shared
  FROM hx a JOIN hx b ON a.hv = b.hv AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT id_a, id_b, CAST(n_shared AS BIGINT) AS n_shared
FROM pairs WHERE n_shared >= {min_shared}
"""


ORACLE_FP_OVERLAP = fingerprint_overlap_oracle()

ORACLE_PREFIX_FP = """
SELECT source, COUNT(*) AS n_docs,
       COUNT(DISTINCT md5(substring(text, 1, 256))) AS n_fingerprints
FROM documents GROUP BY source ORDER BY source
"""

ORACLE_MINHASH = minhash_oracle()
ORACLE_SIMHASH = simhash_oracle()
ORACLE_LSH_ANN = lsh_ann_oracle()
