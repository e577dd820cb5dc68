"""Tests for the training-data pipeline operators (functions/)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datafusion_ducklake_spark.functions import (dedup, multimodal,
                                                 similarity, text)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_with_dups(spark):
    """Documents plus planted near-duplicates: one exact copy and one copy
    with a few words changed, ids offset by 10_000."""
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "text")
    exact = (docs.filter(F.col("doc_id") < 5)
             .select((F.col("doc_id") + 10_000).alias("doc_id"), "text"))
    near = (docs.filter((F.col("doc_id") >= 5) & (F.col("doc_id") < 10))
            .select((F.col("doc_id") + 20_000).alias("doc_id"),
                    F.concat(F.lit("zzz qqq "), F.col("text")).alias("text")))
    return docs.unionByName(exact).unionByName(near).cache()


class TestExactDedup:
    def test_removes_planted_exact_copies(self, docs_with_dups):
        out = dedup.exact_dedup(docs_with_dups, cols=["text"])
        assert out.count() == docs_with_dups.count() - 5
        # min-id survivor: originals survive, 10_00x copies dropped
        assert out.filter(F.col("doc_id") >= 10_000).filter(
            F.col("doc_id") < 20_000).count() == 0


class TestMinHash:
    def test_finds_exact_and_near_dups(self, docs_with_dups):
        pairs = dedup.minhash_dedup_pairs(
            docs_with_dups, jaccard_threshold=0.5).collect()
        found = {(r["id_a"], r["id_b"]) for r in pairs}
        for i in range(5):  # exact copies must be found
            assert (i, i + 10_000) in found
        near_found = sum((i, i + 20_000) in found for i in range(5, 10))
        assert near_found >= 4  # near-copies (tiny prefix edit) mostly found

    def test_soundness_on_clean_corpus(self, spark):
        """Every returned pair must truly clear the Jaccard threshold
        (LSH candidates are verified, never emitted raw)."""
        docs = spark.read.parquet(f"{SF}/documents.parquet") \
            .select("doc_id", "text").limit(100)
        pairs = dedup.minhash_dedup_pairs(docs, jaccard_threshold=0.8).collect()
        assert all(r["jaccard"] >= 0.8 for r in pairs)
        assert len(pairs) < 10  # word-soup corpus: few genuine near-dups

    def test_signature_deterministic(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet") \
            .select("doc_id", "text").limit(5)
        sig = docs.select(
            "doc_id",
            dedup.minhash_signature(dedup.char_shingles("text"), 32).alias("s"))
        a = {r["doc_id"]: r["s"] for r in sig.collect()}
        b = {r["doc_id"]: r["s"] for r in sig.collect()}
        assert a == b

    def test_minhash_batched_matches_expression(self, spark):
        """The mapInPandas signature path (minhash_signatures) must be
        bit-identical to the minhash_signature Column form — same seeded
        (a,b) draws, same pmod arithmetic, NULL/empty text producing the
        all-NULL signature — over word AND char shingles, xxhash64 AND
        poly_hash64, real documents AND edge rows, with a Union source
        (the shape whose pushed-through projection broke scalar-UDF
        extraction and motivated the mapInPandas form)."""
        docs = spark.read.parquet(f"{SF}/documents.parquet") \
            .select("doc_id", "text").limit(60)
        edge = spark.createDataFrame(
            [(100001, None), (100002, ""), (100003, "a"), (100004, "   "),
             (100005, "x y z w v u t s"), (100006, "é中文 tokens here")],
            "doc_id long, text string")
        docs = docs.unionByName(edge)
        for mk in (dedup.word_shingles, dedup.char_shingles):
            for hf in (F.xxhash64, dedup.poly_hash64):
                sh = docs.select("doc_id", mk("text", 3, hash_fn=hf).alias("sh"))
                e = {r["doc_id"]: r["sig"] for r in sh.select(
                    "doc_id", dedup.minhash_signature(
                        F.col("sh"), 32).alias("sig")).collect()}
                b = {r["doc_id"]: r["sig"] for r in dedup.minhash_signatures(
                    sh, "doc_id", F.col("sh"), 32).collect()}
                assert e == b
        # edge rows really exercised the NULL path
        assert b[100001] == [None] * 32
        assert b[100002] is not None

    def test_minhash_fused_matches_expression(self, spark):
        """The fused text->shingle->signature mapInPandas path
        (minhash_text_signatures) must be bit-identical to the
        word/char_shingles(poly_hash64) + minhash_signature expression
        chain: Java-\\s tokenization (NBSP is NOT a separator; leading
        tab yields a leading empty token), trim-strips-only-0x20,
        code-point substr/ascii (astral chars), empty string hashing as
        the single code 0, array_distinct first-occurrence order, and
        the NULL-text asymmetry (word shingles of NULL collapse to
        [hash('')] via concat_ws over the null token array; char
        shingles propagate NULL into the all-NULL signature)."""
        docs = spark.read.parquet(f"{SF}/documents.parquet") \
            .select("doc_id", "text").limit(60)
        edge = spark.createDataFrame(
            [(100001, None), (100002, ""), (100003, "a"), (100004, "   "),
             (100005, "\tlead tab b c"), (100006, "trail tab\t"),
             (100007, "a\xa0nbsp c d"), (100008, "é中文 tokens 𝄞clef here x"),
             (100009, "nowhitespacetoken" * 50), (100010, "x \x0b y \r z w")],
            "doc_id long, text string")
        docs = docs.unionByName(edge)
        for use_words in (True, False):
            mk = dedup.word_shingles if use_words else dedup.char_shingles
            for hf in (dedup.poly_hash64, F.xxhash64):
                sh = docs.select("doc_id", mk("text", 3,
                                              hash_fn=hf).alias("sh"))
                e = {r["doc_id"]: r["sig"] for r in sh.select(
                    "doc_id", dedup.minhash_signature(
                        F.col("sh"), 32).alias("sig")).collect()}
                f = {r["doc_id"]: r["sig"]
                     for r in dedup.minhash_text_signatures(
                         docs, "doc_id", "text", 3, 32,
                         use_words=use_words, hash_fn=hf).collect()}
                assert e == f
                # the NULL-text asymmetry really took the intended branch
                if use_words:
                    assert f[100001] is not None and None not in f[100001]
                elif hf is dedup.poly_hash64:
                    # poly propagates the NULL substring through its
                    # aggregate: [NULL] shingle -> all-NULL signature
                    assert f[100001] == [None] * 32
                else:
                    # xxhash64 skips NULL children -> [42] shingle ->
                    # a real (never-NULL) signature
                    assert None not in f[100001]

    def test_minhash_fused_bands_match_expression(self, spark):
        """The fully fused text->bands mapInPandas path
        (minhash_text_bands) must replay
        posexplode(_banded(minhash_signature(word/char_shingles(...))))
        bit for bit: double-arithmetic band slicing, long->string csv
        with concat_ws skipping NULL elements (the all-NULL signature of
        a NULL text hashes every band to the same '' csv), and the band
        index as posexplode's int position."""
        docs = spark.read.parquet(f"{SF}/documents.parquet") \
            .select("doc_id", "text").limit(40)
        edge = spark.createDataFrame(
            [(100001, None), (100002, ""), (100003, "a b c d e"),
             (100004, "é中文 tokens 𝄞clef here x")],
            "doc_id long, text string")
        docs = docs.unionByName(edge)
        for use_words in (True, False):
            mk = dedup.word_shingles if use_words else dedup.char_shingles
            for hf in (dedup.poly_hash64, F.xxhash64):
                sh = docs.select("doc_id", mk("text", 3,
                                              hash_fn=hf).alias("sh"))
                sigs = sh.select("doc_id", dedup.minhash_signature(
                    F.col("sh"), 64).alias("sig"))
                e = sorted((r["doc_id"], r["band"], r["band_hash"])
                           for r in sigs.select("doc_id", F.posexplode(
                               dedup._banded(F.col("sig"), 16,
                                             hf)).alias(
                                   "band", "band_hash")).collect())
                f = sorted((r["doc_id"], r["band"], r["band_hash"])
                           for r in dedup.minhash_text_bands(
                               docs, "doc_id", "text", 3, 64, 16,
                               use_words=use_words, hash_fn=hf).collect())
                assert e == f
                if not use_words and hf is dedup.poly_hash64:
                    # NULL text under poly char shingles: the all-NULL
                    # signature makes all 16 bands collide on the '' csv
                    null_bands = {bh for d, _, bh in f if d == 100001}
                    assert len(null_bands) == 1

    def test_simhash_fused_matches_aggregate(self, spark):
        """The fused text->simhash mapInPandas path
        (simhash_text_signatures) must be bit-identical to the
        poly_hash64 bit-vote aggregation form (simhash_signatures):
        Java-\\s tokens over the 0x20-trimmed text, per-token poly
        hashes, ones*2 > n majority votes with bit 63 as long MIN,
        NULL text -> sig 0, empty text -> the one ''-token signature."""
        docs = spark.read.parquet(f"{SF}/documents.parquet") \
            .select("doc_id", "text").limit(60)
        edge = spark.createDataFrame(
            [(100001, None), (100002, ""), (100003, "a"), (100004, "   "),
             (100005, "\tlead tab b c"), (100006, "a\xa0nbsp c d"),
             (100007, "é中文 tokens 𝄞clef here x"),
             (100008, "x \x0b y \r z w")],
            "doc_id long, text string")
        docs = docs.unionByName(edge)
        for hf in (dedup.poly_hash64, F.xxhash64):
            e = {r["doc_id"]: r["sig"] for r in dedup.simhash_signatures(
                docs, "text", "doc_id", hash_fn=hf).collect()}
            f = {r["doc_id"]: r["sig"]
                 for r in dedup.simhash_text_signatures(
                     docs, "text", "doc_id", hash_fn=hf).collect()}
            assert e == f
            assert f[100001] == 0          # NULL text votes 0 everywhere
            assert f[100002] == f[100004]  # '' and '   ' share the '' token

    def test_xxh64_batch_matches_spark(self, spark):
        """_xxh64_batch must replay Spark's xxhash64(string) bit for bit:
        every tail length 0..40 (covering the 8/4/1-byte ladder), the
        31/32/33 and 63/64/65-byte stripe boundaries, multibyte and
        astral UTF-8, and long inputs spanning many 32-byte stripes."""
        import numpy as np
        texts = [''.join(chr(97 + (i * 7) % 26) for i in range(n))
                 for n in range(41)]
        texts += ['héllo wörld', 'こんにちは世界', '𝄞𝄞𝄞 astral 𝄞',
                  'x' * 31, 'x' * 32, 'x' * 33, 'x' * 63, 'x' * 64,
                  'x' * 65, 'y' * 1000, '1,2,3,-9223372036854775808',
                  ' ', '\t', 'a\xa0b']
        got = dedup._xxh64_batch(texts, np)
        df = spark.createDataFrame([(t,) for t in texts], "s string")
        want = [r[0] for r in df.select(F.xxhash64("s")).collect()]
        assert got.tolist() == want


class TestSimHash:
    def test_exact_copies_have_zero_hamming(self, docs_with_dups):
        pairs = dedup.simhash_near_dup_pairs(
            docs_with_dups, max_hamming=3).collect()
        found = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
        for i in range(5):
            assert found.get((i, i + 10_000)) == 0

    def test_hamming64(self, spark):
        df = spark.createDataFrame([(0b1011, 0b0010)], "a LONG, b LONG")
        got = df.select(dedup.hamming64(F.col("a"), F.col("b")).alias("h")) \
            .collect()[0]["h"]
        assert got == 2


class TestNgramJaccard:
    def test_planted_pairs_score_high(self, docs_with_dups):
        small = docs_with_dups.filter(
            (F.col("doc_id") < 20) | (F.col("doc_id") >= 10_000))
        pairs = dedup.ngram_jaccard_pairs(small, k=3, threshold=0.5).collect()
        found = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
        for i in range(5):
            assert found.get((i, i + 10_000)) == pytest.approx(1.0)


class TestDedupOptimizedShapes:
    """Pin the r10 shape optimizations: single-pass poly_hash64, the
    aggregate-form simhash signatures, and the ReuseExchange self-join
    layout (upstream shingle/signature work computed once, not once per
    join side)."""

    def test_poly_hash64_pinned_recurrence(self, spark):
        M = (1 << 31) - 1

        def ref(s):
            if s is None:
                return None
            codes = [ord(c) for c in s] if s else [0]
            a, b = 7, 11
            for x in codes:
                a = (a * 31 + x) % M
                b = (b * 37 + x) % M
            return a * (1 << 31) + b

        vals = ["abc", "hello world", "", "a", "The quick brown fox", None]
        df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                                   "id INT, s STRING")
        got = {r["id"]: r["h"] for r in
               df.select("id", dedup.poly_hash64("s").alias("h")).collect()}
        assert got == {i: ref(v) for i, v in enumerate(vals)}

    def test_simhash_signatures_matches_column_form(self, spark):
        rows = [(1, "hello world foo"), (2, None), (3, ""), (4, "   "),
                (5, "solo"), (6, "a b"), (7, "x x x y zz")]
        df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
        for fn in (F.xxhash64, dedup.poly_hash64):
            col_form = {r[0]: r[1] for r in df.select(
                "doc_id", dedup.simhash("text", hash_fn=fn).alias("sig"))
                .collect()}
            agg_form = {r[0]: r[1] for r in
                        dedup.simhash_signatures(df, "text", "doc_id",
                                                 hash_fn=fn).collect()}
            assert agg_form == col_form

    def test_minhash_candidates_reuse_exchange(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet") \
            .select("doc_id", "text").limit(200)
        sh = docs.select("doc_id",
                         dedup.word_shingles("text", 3).alias("sh"))
        sigs = sh.select("doc_id",
                         dedup.minhash_signature(F.col("sh"), 32).alias("sig"))
        cands = dedup.minhash_lsh_candidates(sigs, "doc_id", "sig", 8)
        cands.collect()
        plan = cands._jdf.queryExecution().executedPlan().toString()
        assert "ReusedExchange" in plan

    def test_ngram_jaccard_reuse_exchange(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet") \
            .select("doc_id", "text").limit(200)
        pairs = dedup.ngram_jaccard_pairs(docs, k=3, threshold=0.1)
        pairs.collect()
        plan = pairs._jdf.queryExecution().executedPlan().toString()
        assert "ReusedExchange" in plan

    def test_duplicate_components_clusters(self, spark):
        # chain 1-2-3 plus pair (10, 11); singleton 99 never appears
        pairs = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "id_a LONG, id_b LONG")
        got = {r["doc_id"]: r["cluster_id"] for r in
               dedup.duplicate_components(pairs).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


class TestSimilarityOptimizedShapes:
    def test_batched_hyperplane_sigs_match_expression_form(self, spark):
        """The Arrow-batched signature path must replay the expression
        form bit for bit, including the edge semantics: NULL vector,
        NULL element, wrong length (all-zero sig via NULL dots), actual
        NaN (sets the bit — Spark ranks NaN above any number), ±inf."""
        from pyspark.sql import Row, types as T
        from datafusion_ducklake_spark.functions import similarity as S
        emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(50)
        edge = spark.createDataFrame(
            [Row(vec_id=9001, embedding=None, label=0),
             Row(vec_id=9002, embedding=[float("nan")] * 64, label=0),
             Row(vec_id=9003, embedding=[0.0] * 64, label=0),
             Row(vec_id=9004, embedding=[1.0] * 10, label=0),
             Row(vec_id=9005, embedding=[1.0] * 63 + [None], label=0),
             Row(vec_id=9006, embedding=[float("inf")] * 64, label=0),
             Row(vec_id=9007, embedding=[-1.0] * 64, label=0)],
            T.StructType([T.StructField("vec_id", T.LongType()),
                          T.StructField("embedding",
                                        T.ArrayType(T.FloatType())),
                          T.StructField("label", T.IntegerType())]))
        base = emb.unionByName(edge).select(
            "vec_id", S.as_double("embedding").alias("__v"))
        expr = base.select("vec_id", *[
            S.hyperplane_signature(F.col("__v"), 64, 6, 42 + t)
            .alias(f"s{t}") for t in range(8)])
        udf = S._hyperplane_sigs_batch(64, 6, 8, 42)
        got = base.select("vec_id", udf(F.col("__v")).alias("sigs"))
        e = {r[0]: tuple(r[1:]) for r in expr.collect()}
        g = {r[0]: tuple(r[1]) for r in got.collect()}
        assert g == e


class TestSimilarity:
    def test_lsh_ann_recall_vs_bruteforce(self, spark):
        """Random gaussian embeddings are the LSH worst case (top-10
        neighbors sit at cosine ~0.4, nearly orthogonal), so absolute
        recall is data-limited; 6 planes x 16 tables lands ~0.6 here.
        Real embedding corpora have much tighter neighborhoods."""
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        probes = emb.filter(F.col("vec_id") < 5).select(
            F.col("vec_id").alias("query_id"), "embedding")
        exact = similarity.cosine_topk(emb, probes, k=10)
        approx = similarity.lsh_ann_topk(emb, probes, dim=64, k=10,
                                         n_planes=6, n_tables=16)
        e = {(r["query_id"], r["neighbor_id"]) for r in exact.collect()}
        a = {(r["query_id"], r["neighbor_id"]) for r in approx.collect()}
        recall = len(e & a) / len(e)
        assert recall >= 0.4, f"LSH recall too low: {recall}"

    def test_lsh_always_finds_planted_duplicate(self, spark):
        """A near-identical vector collides in every table — recall 1.0 on
        the pairs that matter for dedup."""
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        dup = emb.filter(F.col("vec_id") == 7).select(
            F.lit(10_007).cast("long").alias("query_id"), "embedding")
        out = similarity.lsh_ann_topk(emb, dup, dim=64, k=3,
                                      n_planes=12, n_tables=4)
        top = out.filter(F.col("query_id") == 10_007) \
            .orderBy(F.desc("cos_sim")).first()
        assert top["neighbor_id"] == 7
        assert top["cos_sim"] > 0.999

    def test_embedding_near_dup_finds_planted_copy(self, spark):
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        copy = emb.filter(F.col("vec_id") == 0).select(
            (F.col("vec_id") + 10_000).alias("vec_id"), "embedding", "label")
        both = emb.unionByName(copy)
        pairs = similarity.embedding_near_dup_pairs(both, dim=64,
                                                    threshold=0.99).collect()
        assert any(r["id_a"] == 0 and r["id_b"] == 10_000 for r in pairs)


class TestText:
    def test_quality_features_columns(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet").limit(10)
        out = text.quality_features(docs)
        row = out.first()
        assert 0.0 <= row["stopword_ratio"] <= 1.0
        assert 0.0 <= row["quality_score"] <= 1.0
        assert row["n_tokens"] > 0

    def test_bpe_ish_counts_ge_whitespace(self, spark):
        docs = spark.read.parquet(f"{SF}/documents.parquet").limit(20)
        out = docs.select(
            text.token_count("text").alias("ws"),
            text.bpe_ish_token_count("text").alias("bpe"))
        assert all(r["bpe"] >= r["ws"] for r in out.collect())

    def test_language_id(self, spark):
        df = spark.createDataFrame(
            [("the cat sat on the mat and it was a good day",),
             ("xyzzy frobnitz quux blorp",)], "text STRING")
        got = [r[0] for r in df.select(text.language_id("text")).collect()]
        assert got == ["en", "unk"]

    def test_rolling_fingerprints_detect_shared_window(self, spark):
        df = spark.createDataFrame(
            [(1, "A" * 200), (2, "A" * 200), (3, "B" * 200)], "id INT, t STRING")
        fp = df.select("id", text.rolling_fingerprints("t").alias("fp"))
        rows = {r["id"]: r["fp"] for r in fp.collect()}
        assert rows[1] == rows[2] != rows[3]

    def test_rolling_fingerprint_rows_match(self, spark):
        """The Arrow-batched rolling_fingerprint_rows operator must be
        row-identical to explode(array_distinct(rolling_fingerprints(
        text, hash_fn=poly_hash64))): code-point windows, short/empty
        texts producing ONE whole-text window ('' hashing as code 0),
        first-occurrence distinct order, and NULL text yielding one
        (id, NULL) row (greatest skips the NULL length)."""
        from datafusion_ducklake_spark.functions import dedup
        docs = spark.read.parquet(f"{SF}/documents.parquet") \
            .select("doc_id", "text").limit(40)
        edge = spark.createDataFrame(
            [(100001, None), (100002, ""), (100003, "short"),
             (100004, "x" * 63), (100005, "y" * 64), (100006, "z" * 65),
             (100007, "é中文" * 40), (100008, "ab " * 40)],
            "doc_id long, text string")
        docs = docs.unionByName(edge)
        d = docs.select("doc_id", F.array_distinct(text.rolling_fingerprints(
            F.col("text"), hash_fn=dedup.poly_hash64)).alias("fp"))
        e = sorted(((r["doc_id"], r["h"]) for r in d.select(
            "doc_id", F.explode("fp").alias("h")).collect()), key=str)
        f = sorted(((r["doc_id"], r["h"]) for r in
                    text.rolling_fingerprint_rows(
                        docs, "doc_id", "text").collect()), key=str)
        assert e == f
        assert (100001, None) in f


class TestMultimodal:
    @pytest.fixture(scope="class")
    def media(self, spark):
        rows = [(1, "image", b"\x89PNG" + b"x" * 500, "image/png", None, None, None),
                (2, "image", b"\xff\xd8" + b"y" * 900, "image/jpeg", None, None, None),
                (3, "video", b"\x00\x00ftyp" + b"z" * 2000, "video/mp4",
                 None, None, 3500),
                (4, "audio", b"RIFF" + b"a" * 100, "audio/wav", None, None, 1000),
                (5, "image", None, "image/png", None, None, None)]
        return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)

    def test_image_features_plumbing(self, media):
        out = multimodal.decode_image_features(media)
        rows = {r["media_id"]: r for r in out.collect()}
        assert set(rows) == {1, 2, 5}
        assert rows[1]["n_bytes"] == 504
        assert rows[5]["mean_luma"] is None  # null payload survives
        # deterministic fake decode
        assert rows[2]["width"] == (902 % 640) + 1

    def test_strict_mode_requires_real_codec(self, media):
        with pytest.raises(NotImplementedError):
            multimodal.decode_image_features(media, strict=True)

    def test_resize_roundtrip_schema(self, media):
        out = multimodal.resize_images(media, 8, 8)
        rows = {r["media_id"]: r["payload"] for r in out.collect()}
        assert len(rows[1]) == 64
        assert rows[5] is None

    def test_video_frame_sampling_one_to_many(self, media):
        out = multimodal.sample_video_frames(media, every_ms=1000)
        rows = out.orderBy("frame_idx").collect()
        assert [r["ts_ms"] for r in rows] == [0, 1000, 2000, 3000]
        assert all(r["media_id"] == 3 for r in rows)

    def test_audio_features_plumbing(self, media):
        out = multimodal.decode_audio_features(media)
        rows = {r["media_id"]: r for r in out.collect()}
        assert set(rows) == {4}
        assert rows[4]["n_bytes"] == 104
        assert rows[4]["duration_ms"] == 1000
        assert rows[4]["est_sample_rate"] == 8000 + (104 % 5) * 8000
        with pytest.raises(NotImplementedError):
            multimodal.decode_audio_features(media, strict=True)

    def test_audio_window_rms_one_to_many(self, media):
        out = multimodal.audio_window_rms(media, window_ms=400)
        rows = out.orderBy("window_idx").collect()
        assert [r["start_ms"] for r in rows] == [0, 400, 800]
        assert all(r["media_id"] == 4 for r in rows)
        assert all(r["rms"] is not None for r in rows)


def test_pii_counts_and_scrub(spark):
    from datafusion_ducklake_spark.functions import text as T
    from pyspark.sql import functions as F
    rows = [
        (1, "contact me at jane.doe@example.com or +1 (555) 123-4567 ok"),
        (2, "see https://example.com/a?b=c and http://x.org too"),
        (3, "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, "id INT, text STRING")
    counts = df.select("id", *[v.alias(k)
                               for k, v in T.pii_counts("text").items()])
    got = {r["id"]: (r["n_emails"], r["n_phones"], r["n_urls"])
           for r in counts.collect()}
    assert got[1] == (1, 1, 0)
    assert got[2] == (0, 0, 2)
    assert got[3] == (0, 0, 0)
    scrubbed = {r["id"]: r["s"] for r in
                df.select("id", T.scrub_pii("text").alias("s")).collect()}
    assert "<EMAIL>" in scrubbed[1] and "<PHONE>" in scrubbed[1]
    assert scrubbed[2].count("<URL>") == 2
    assert "@" not in scrubbed[1]
    assert scrubbed[3] == "no pii here at all"


def test_bigram_array(spark):
    from datafusion_ducklake_spark.functions import text as T
    from pyspark.sql import functions as F
    df = spark.createDataFrame([(1, "a b c"), (2, "solo"), (3, "")],
                               "id INT, text STRING")
    got = {r["id"]: r["b"] for r in
           df.select("id", T.bigram_array("text").alias("b")).collect()}
    assert got[1] == ["a b", "b c"]
    assert got[2] == []
