"""Text analysis operators: tokenization, quality scoring, language ID,
fingerprinting. All pure Column expressions (whole-stage codegen'd,
shuffle-free per row) — at 100 TB these run map-side at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it",
                     "that", "for", "on", "with", "as", "was", "at")

# a BPE-ish word/piece splitter: words, numbers, or single non-space symbols
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def whitespace_tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def bpe_ish_tokens(col: Column | str) -> Column:
    """Regex sub-word-ish tokenization (letters / digit runs / symbols) —
    the cheap stand-in for a BPE vocab when only counts matter."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0)


def token_count(col: Column | str) -> Column:
    return F.size(whitespace_tokens(col)).cast("long")


def bpe_ish_token_count(col: Column | str) -> Column:
    return F.size(bpe_ish_tokens(col)).cast("long")


def stopword_ratio(col: Column | str,
                   stopwords: tuple[str, ...] = DEFAULT_STOPWORDS) -> Column:
    toks = whitespace_tokens(col)
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, F.lower(x))))
    return n_stop.cast("double") / F.size(toks)


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    n_punct = F.length(c) - F.length(F.regexp_replace(c, r"[^\w\s]", ""))
    return n_punct.cast("double") / F.greatest(F.length(c), F.lit(1))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach n_tokens / stopword_ratio / punct_ratio / mean_token_len /
    quality_score columns (length+punct+stopword heuristic)."""
    toks = whitespace_tokens(text_col)
    n_tok = F.size(toks).cast("long")
    mean_len = F.length(F.col(text_col)).cast("double") / n_tok
    sr = stopword_ratio(text_col)
    pr = punct_ratio(text_col)
    score = (F.lit(1.0) / (F.lit(1.0) + F.exp(-(sr * 8 - pr * 4
             - F.abs(mean_len - 6) * 0.2))))
    return (df.withColumn("n_tokens", n_tok)
              .withColumn("stopword_ratio", sr)
              .withColumn("punct_ratio", pr)
              .withColumn("mean_token_len", mean_len)
              .withColumn("quality_score", score))


def language_id(col: Column | str,
                stopwords: tuple[str, ...] = DEFAULT_STOPWORDS,
                threshold: float = 0.02) -> Column:
    """Stopword-density heuristic language ID ('en' / 'unk'). A real n-gram
    model slots in the same shape: per-language score columns + greatest()."""
    return F.when(stopword_ratio(col, stopwords) > threshold,
                  F.lit("en")).otherwise(F.lit("unk"))


def prefix_fingerprint(col: Column | str, n: int = 256) -> Column:
    """md5 of the first n chars — cheap near-identity fingerprint."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.substring(c, 1, n).cast("binary"))


def rolling_fingerprints(col: Column | str, window: int = 64,
                         stride: int = 32, hash_fn=F.xxhash64) -> Column:
    """Array of hashed fingerprints over sliding character windows —
    the building block for containment/overlap detection. Computed with
    sequence+transform (JVM-side), no UDF. ``hash_fn``: xxhash64
    (default, production) or dedup.poly_hash64 (SQL-expressible, for
    oracle-gated runs)."""
    c = F.col(col) if isinstance(col, str) else col
    starts = F.sequence(F.lit(1),
                        F.greatest(F.length(c) - window + 1, F.lit(1)),
                        F.lit(stride))
    return F.transform(starts, lambda s: hash_fn(c.substr(s, F.lit(window))))


def rolling_fingerprint_rows(df: DataFrame, id_col: str, text_col: str,
                             window: int = 64,
                             stride: int = 32) -> DataFrame:
    """(id, h) rows — one per DISTINCT rolling-window fingerprint — via
    ONE mapInPandas over (id, text): the Arrow-batched equivalent of
    ``explode(array_distinct(rolling_fingerprints(text,
    hash_fn=poly_hash64)))`` (guide §4.2; pinned bit-equal by
    tests/test_functions.py::test_rolling_fingerprint_rows_match).

    Replayed semantics: window starts are ``sequence(1,
    greatest(len-window+1, 1), stride)`` (so a short or empty text
    yields ONE window — the whole text, '' hashing as the single code
    0), substr slices by code point, array_distinct keeps first
    occurrence, and a NULL text yields ONE (id, NULL) row — greatest
    skips the NULL length so the expression form still makes one
    window, whose substr(NULL) hash is NULL and array_distinct([NULL])
    = [NULL]. poly_hash64 only — xxhash64 callers keep the native-JVM
    Column form."""
    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType
    import numpy as np

    from .dedup import _poly_hash_batch

    def gen(batches):
        for pdf in batches:
            ids_out: list = []
            wins: list = []
            bounds = [0]
            ids = list(pdf[id_col])
            texts = list(pdf["__t"])
            for t in texts:
                if t is not None:
                    stop = max(len(t) - window + 1, 1)
                    wins.extend(t[s:s + window]
                                for s in range(0, stop, stride))
                bounds.append(len(wins))
            hashes = _poly_hash_batch(wins, np)
            out_ids: list = []
            out_h: list = []
            for i, (lo, hi) in enumerate(zip(bounds, bounds[1:])):
                if texts[i] is None:
                    out_ids.append(ids[i])
                    out_h.append(None)
                elif hi > lo:
                    distinct = dict.fromkeys(hashes[lo:hi].tolist())
                    out_ids.extend([ids[i]] * len(distinct))
                    out_h.extend(distinct)
            yield pd.DataFrame({id_col: out_ids,
                                "h": pd.array(out_h, dtype="Int64")})

    src = df.select(F.col(id_col), F.col(text_col).alias("__t"))
    schema = StructType([src.schema[id_col], StructField("h", LongType())])
    return src.mapInPandas(gen, schema)


def bigram_array(col: Column | str) -> Column:
    """Adjacent-token bigrams as 'a b' strings (empty array for <2 tokens).
    Pure Column ops — slice+zip_with, no UDF."""
    toks = whitespace_tokens(col)
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.zip_with(F.slice(toks, 1, n - 1),
                   F.slice(toks, F.lit(2), n - 1),
                   lambda a, b: F.concat_ws(" ", a, b))
    ).otherwise(F.array().cast("array<string>"))


_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+?\d[\d\s().-]{7,}\d"
_PII_URL = r"https?://[^\s]+"


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-document counts of common PII / link patterns — the detection
    half of a scrubbing stage. regexp_count is JVM-side codegen; no UDF.
    Keys: n_emails, n_phones, n_urls (loose patterns) plus n_ssns,
    n_ipv4s (the strict dialect-portable patterns redact_pii uses)."""
    c = F.col(col) if isinstance(col, str) else col
    return {"n_emails": F.regexp_count(c, F.lit(_PII_EMAIL)),
            "n_phones": F.regexp_count(c, F.lit(_PII_PHONE)),
            "n_urls": F.regexp_count(c, F.lit(_PII_URL)),
            "n_ssns": F.regexp_count(c, F.lit(PII_SSN_RE)),
            "n_ipv4s": F.regexp_count(c, F.lit(PII_IPV4_RE))}


def scrub_pii(col: Column | str) -> Column:
    """Replace emails/phones/URLs with typed placeholder tokens — the
    rewrite half of the scrubbing stage (order matters: URLs first, their
    paths can contain @ and digit runs)."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, _PII_URL, "<URL>")
    c = F.regexp_replace(c, _PII_EMAIL, "<EMAIL>")
    c = F.regexp_replace(c, _PII_PHONE, "<PHONE>")
    return c


# --- PII scrubbing (training-data hygiene) -----------------------------

# Conservative patterns expressible identically in Java regex (Spark)
# and RE2 (DuckDB) — no backrefs, no lookarounds:
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}\b"
PII_SSN_RE = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"
PII_IPV4_RE = (r"\b(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])"
               r"(?:\.(?:25[0-5]|2[0-4][0-9]|1[0-9]{2}|[1-9]?[0-9])){3}\b")

_PII_RULES = ((PII_EMAIL_RE, "<EMAIL>"), (PII_SSN_RE, "<SSN>"),
              (PII_PHONE_RE, "<PHONE>"), (PII_IPV4_RE, "<IP>"))


def redact_pii(col: Column | str) -> Column:
    """Replace emails, phone numbers, SSNs and IPv4 addresses with typed
    placeholder tokens — a chain of regexp_replace Columns, so the whole
    scrub stays inside whole-stage codegen (map-side at scan speed; the
    standard hygiene pass before LLM training). SSN runs before PHONE so
    the overlapping ddd-dd-dddd shape keeps its specific tag."""
    c = F.col(col) if isinstance(col, str) else col
    for pattern, token in _PII_RULES:
        c = F.regexp_replace(c, pattern, token)
    return c


# (per-row audit counts live in pii_counts above — one shared surface)
