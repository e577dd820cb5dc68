"""Text-analysis + dedup queries over the ``documents`` table.

These are the oracle-checked entry points for the training-data-pipeline
text operators; the reusable operator implementations live in
``datafusion_ducklake_spark.functions.text`` / ``functions.dedup`` and are
kept expression-identical with the DuckDB oracle SQL here.

All string ops are JVM-side built-ins (split/regexp/md5) — no Python UDFs in
the hot path, so whole-stage codegen applies and this scales linearly with
executors at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ._util import t

STOPWORDS = ("the", "a", "of", "and", "to", "in")


def _tokens(col):
    return F.split(F.trim(col), r"\s+")


def doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting + length stats per (lang, source)."""
    docs = t(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    return (
        docs.select("lang", "source", "n_chars",
                    F.size(toks).cast("long").alias("n_tokens"))
        .groupBy("lang", "source")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.sum("n_chars").cast("long").alias("total_chars"),
             F.sum("n_tokens").cast("long").alias("total_tokens"),
             (F.sum("n_chars").cast("double") / F.sum("n_tokens"))
             .alias("chars_per_token"))
    )


ORACLE_TOKEN_STATS = """
SELECT lang, source, COUNT(*) AS n_docs,
  CAST(SUM(n_chars) AS BIGINT) AS total_chars,
  CAST(SUM(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS total_tokens,
  CAST(SUM(n_chars) AS DOUBLE) / SUM(len(string_split_regex(trim(text), '\\s+')))
    AS chars_per_token
FROM documents
GROUP BY lang, source
"""


def doc_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features: token count, stopword ratio,
    mean token length, and a composite score. Formula mirrored in oracle."""
    docs = t(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    n_tok = F.size(toks).cast("long")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))).cast("long")
    stop_ratio = n_stop.cast("double") / n_tok
    mean_tok_len = (F.col("n_chars").cast("double") / n_tok)
    return docs.select(
        "doc_id", "lang",
        n_tok.alias("n_tokens"),
        n_stop.alias("n_stopwords"),
        stop_ratio.alias("stopword_ratio"),
        mean_tok_len.alias("mean_token_len"),
        (stop_ratio * F.lit(2.0) + F.lit(1.0) / mean_tok_len).alias("quality_score"),
    )


ORACLE_QUALITY = """
WITH feats AS (
  SELECT doc_id, lang, n_chars,
    CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
    CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
        x -> x IN ('the','a','of','and','to','in'))) AS BIGINT) AS n_stopwords
  FROM documents)
SELECT doc_id, lang, n_tokens, n_stopwords,
  CAST(n_stopwords AS DOUBLE) / n_tokens AS stopword_ratio,
  CAST(n_chars AS DOUBLE) / n_tokens AS mean_token_len,
  (CAST(n_stopwords AS DOUBLE) / n_tokens) * 2.0
    + 1.0 / (CAST(n_chars AS DOUBLE) / n_tokens) AS quality_score
FROM feats
"""


def dedup_exact_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-dedup stats: hash-groupBy on md5(text)."""
    docs = t(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct(F.md5(F.col("text").cast("binary"))).alias("n_unique"),
        (F.count(F.lit(1)) - F.countDistinct(F.md5(F.col("text").cast("binary"))))
        .alias("n_dupes"),
    )


ORACLE_DEDUP_SUMMARY = """
SELECT COUNT(*) AS n_docs,
  COUNT(DISTINCT md5(text)) AS n_unique,
  COUNT(*) - COUNT(DISTINCT md5(text)) AS n_dupes
FROM documents
"""


def dedup_exact_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup operator itself: one surviving doc_id per distinct text
    (min doc_id wins — deterministic)."""
    docs = t(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5(F.col("text").cast("binary")).alias("text_hash"))
        .agg(F.min("doc_id").alias("keep_doc_id"),
             F.count(F.lit(1)).alias("n_copies"))
    )


ORACLE_DEDUP_KEEP = """
SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_doc_id,
  COUNT(*) AS n_copies
FROM documents
GROUP BY md5(text)
"""


def lang_id_heuristic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-density language ID (n-gram-free heuristic baseline):
    predict 'en' when the stopword ratio exceeds 2%; report confusion
    counts against the labeled lang column."""
    docs = t(spark, sf_dir, "documents")
    toks = _tokens(F.col("text"))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    ratio = (F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x)))
             .cast("double") / F.size(toks))
    pred = F.when(ratio > 0.02, F.lit("en")).otherwise(F.lit("unk"))
    return (
        docs.select("lang", pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


ORACLE_LANG_ID = """
SELECT lang,
  CASE WHEN CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
      x -> x IN ('the','a','of','and','to','in'))) AS DOUBLE)
      / len(string_split_regex(trim(text), '\\s+')) > 0.02
    THEN 'en' ELSE 'unk' END AS pred_lang,
  COUNT(*) AS n
FROM documents
GROUP BY 1, 2
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheap document fingerprint: md5 of the first 256 chars + length
    bucket; the shingle/minhash variants live in functions.dedup."""
    docs = t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.md5(F.substring(F.col("text"), 1, 256).cast("binary")).alias("prefix_fp"),
        (F.floor(F.col("n_chars") / F.lit(100)) * 100).cast("long").alias("len_bucket"),
    )


ORACLE_FINGERPRINT = """
SELECT doc_id, md5(substr(text, 1, 256)) AS prefix_fp,
  CAST(FLOOR(n_chars / 100) * 100 AS BIGINT) AS len_bucket
FROM documents
"""
