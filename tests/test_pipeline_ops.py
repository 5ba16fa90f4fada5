"""Training-data pipeline ops: dedup, similarity, text stats, multimodal."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from credigraph_spark.pipeline import (
    cosine_topk_bruteforce,
    exact_dedup,
    lsh_bucketed_topk,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_near_dups,
    text_quality,
    language_id,
    document_fingerprint,
)
from credigraph_spark.pipeline.multimodal import (
    attach_binary_metadata,
    extract_features,
    frame_sample_plan,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),        # exact dup of 1
    (3, "the quick brown fox leaps over the lazy dog"),        # near dup
    (4, "completely different text about spark and graphs"),
    (5, "le chat est sur la table et il est content"),
    (6, "der hund ist nicht mit der katze und das ist gut"),
]


def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_exact_dedup(spark):
    out = exact_dedup(docs_df(spark)).collect()
    by_keep = {r["keep_id"]: r["dup_count"] for r in out}
    assert by_keep[1] == 2          # docs 1,2 identical
    assert len(out) == 5


def test_minhash_jaccard_monotonicity(spark):
    """Identical docs share all minhashes; near-dups share more than
    unrelated docs (probabilistic but deterministic given fixed salts)."""
    sigs = {r["doc_id"]: [r[f"mh_{i}"] for i in range(8)]
            for r in minhash_signatures(docs_df(spark), num_hashes=8).collect()}
    same = sum(a == b for a, b in zip(sigs[1], sigs[2]))
    near = sum(a == b for a, b in zip(sigs[1], sigs[3]))
    far = sum(a == b for a, b in zip(sigs[1], sigs[4]))
    assert same == 8
    assert near >= far
    assert far <= 2


def test_lsh_candidates_contain_exact_dups(spark):
    pairs = {(r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(docs_df(spark)).collect()}
    assert (1, 2) in pairs
    assert (1, 4) not in pairs and (4, 5) not in pairs


def test_ngram_jaccard_exact_values(spark):
    """Spark Jaccard equals a Python set-based oracle."""
    out = {(r["id_a"], r["id_b"]): r["jaccard"]
           for r in ngram_jaccard_pairs(docs_df(spark), threshold=0.2).collect()}

    def sh(t, n=3):
        w = t.lower().split()
        grams = {" ".join(w[i:i + n]) for i in range(max(len(w) - n + 1, 1))}
        return grams

    for (a, b), j in out.items():
        ta = dict(DOCS)[a]
        tb = dict(DOCS)[b]
        sa, sb = sh(ta), sh(tb)
        expect = len(sa & sb) / len(sa | sb)
        assert math.isclose(j, expect, rel_tol=1e-9), (a, b)
    assert (1, 2) in out and out[(1, 2)] == 1.0
    assert (1, 3) in out  # near dup above 0.2


def _simhash_py(text: str) -> int:
    """Clean-room oracle for the engine's pure-SQL simhash: md5-derived
    64-bit token hash (hi = first 8 hex chars -> bits 32..63, lo = next 8
    -> bits 0..31), ±1 sign aggregation per bit."""
    toks = {t for t in text.lower().split() if t}
    acc = [0] * 64
    for t in toks:
        h = hashlib.md5(t.encode()).hexdigest()
        v = (int(h[0:8], 16) << 32) | int(h[8:16], 16)
        for b in range(64):
            acc[b] += 1 if (v >> b) & 1 else -1
    out = 0
    for b in range(64):
        if acc[b] > 0:
            out |= 1 << b
    return out - (1 << 64) if out >= (1 << 63) else out


def test_simhash_matches_python_oracle(spark):
    from credigraph_spark.pipeline.dedup import simhash

    got = {r["doc_id"]: r["simhash"] for r in simhash(docs_df(spark)).collect()}
    for doc_id, text in DOCS:
        assert got[doc_id] == _simhash_py(text), doc_id
    # empty / whitespace-only docs -> signature 0, not a missing row
    edge = spark.createDataFrame([(10, ""), (11, "   "), (12, None)], ["doc_id", "text"])
    got_edge = {r["doc_id"]: r["simhash"] for r in simhash(edge).collect()}
    assert got_edge == {10: 0, 11: 0, 12: 0}


def test_simhash_near_dups_rejects_unsound_blocking(spark):
    with pytest.raises(ValueError, match="pigeonhole"):
        simhash_near_dups(docs_df(spark), max_hamming=12, n_tables=4)


def test_ngram_jaccard_df_cap_bounds_pairs(spark):
    """A boilerplate shingle shared by every doc must NOT make the pair
    count quadratic: with the shingle over the DF cap, discovery drops it."""
    boiler = "copyright acme corp all rights reserved"
    rows = [(i, f"{boiler} unique{i} filler{i} tail{i}") for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    capped = ngram_jaccard_pairs(df, threshold=0.0, max_shingle_df=10)
    assert capped.count() == 0  # every shared shingle is boilerplate (df=50 > 10)
    # raising the cap re-admits them — and jaccard is computed on the FULL
    # sets either way (exactness not affected by the cap)
    uncapped = ngram_jaccard_pairs(df, threshold=0.0, max_shingle_df=100)
    assert uncapped.count() == 50 * 49 // 2


def test_simhash_near_dups(spark):
    # pigeonhole: n_tables=16 guarantees detection for hamming <= 15;
    # doc 1 vs 3 differ by one word (hamming 10), 1 vs 4 are unrelated (~32)
    pairs = {(r["id_a"], r["id_b"]): r["hamming"]
             for r in simhash_near_dups(docs_df(spark), max_hamming=10,
                                        n_tables=16).collect()}
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and pairs[(1, 3)] <= 10
    assert (1, 4) not in pairs


def _embeddings(spark, n=40, dim=6, seed=5):
    rng = np.random.default_rng(seed)
    rows = [(i, rng.standard_normal(dim).tolist()) for i in range(n)]
    return rows, spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_cosine_topk_matches_numpy(spark):
    rows, df = _embeddings(spark)
    queries = df.where(F.col("vec_id") < 3)
    got = cosine_topk_bruteforce(queries, df, k=4).collect()
    mat = {i: np.array(v) for i, v in rows}
    for q in range(3):
        sims = sorted(
            ((float(mat[q] @ mat[c] / (np.linalg.norm(mat[q]) * np.linalg.norm(mat[c]))), -c)
             for c in mat if c != q),
            reverse=True,
        )[:4]
        expect = [-c for _, c in sims]
        mine = [r["neighbor_id"] for r in sorted(got, key=lambda r: r["rank"]) if r["query_id"] == q]
        assert mine == expect, q


def _recall_vs_bruteforce(spark, df, queries, k, **lsh_kwargs):
    exact = cosine_topk_bruteforce(queries, df, k=k).collect()
    approx = lsh_bucketed_topk(queries, df, k=k, **lsh_kwargs).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    return len(exact_set & approx_set) / len(exact_set)


def test_lsh_bucketed_topk_reasonable_recall(spark):
    rows, df = _embeddings(spark, n=60)
    queries = df.where(F.col("vec_id") < 5)
    recall = _recall_vs_bruteforce(spark, df, queries, k=3,
                                   bits_per_table=4, n_tables=6)
    assert recall >= 0.4, recall  # approximate, but must beat random by far


def test_lsh_bucketed_topk_recall_gate(spark):
    """The defined correctness bar for the (rows-only) ann_lsh_topk driver
    query: at a production-shaped table count, recall@k vs brute force
    must clear 0.8 on the same fixture."""
    rows, df = _embeddings(spark, n=60)
    queries = df.where(F.col("vec_id") < 5)
    recall = _recall_vs_bruteforce(spark, df, queries, k=3,
                                   bits_per_table=4, n_tables=16)
    assert recall >= 0.8, recall


def test_lsh_topk_survives_null_and_ragged_embeddings(spark):
    """A NULL, empty, or off-dimension embedding row must not crash the
    bucket UDF stage (at 100 TB one malformed row kills a task otherwise);
    well-formed rows still rank normally."""
    from pyspark.sql.types import ArrayType, DoubleType, LongType, StructField, StructType

    rows, _ = _embeddings(spark, n=20)
    schema = StructType([StructField("vec_id", LongType()),
                         StructField("embedding", ArrayType(DoubleType()))])
    dirty = rows + [(100, None), (101, []), (102, [1.0, 2.0])]  # ragged: dim 2 vs 6
    df = spark.createDataFrame(dirty, schema)
    queries = df.where(F.col("vec_id") < 3)
    got = lsh_bucketed_topk(queries, df, k=3, bits_per_table=4, n_tables=8).collect()
    assert {r["query_id"] for r in got} == {0, 1, 2}
    # the dim-2 row buckets against its own planes; never against dim-6 rows
    assert all(r["neighbor_id"] != 102 for r in got)


def test_md5_sign_planes_deterministic():
    from credigraph_spark.pipeline.similarity import _md5_sign_planes

    a = _md5_sign_planes(6, 16, seed=7)
    b = _md5_sign_planes(6, 16, seed=7)
    assert (a == b).all() and set(np.unique(a)) == {-1.0, 1.0}
    assert not (a == _md5_sign_planes(6, 16, seed=8)).all()


def test_text_quality_and_langid(spark):
    q = {r["doc_id"]: r.asDict() for r in text_quality(docs_df(spark)).collect()}
    assert q[1]["n_tokens"] == 9
    assert q[1]["stopword_ratio"] > 0.2
    assert 0 <= q[4]["punct_ratio"] <= 1
    langs = {r["doc_id"]: r["lang_pred"] for r in language_id(docs_df(spark)).collect()}
    assert langs[1] == "en" and langs[5] == "fr" and langs[6] == "de"


def test_repetition_stats_matches_python(spark):
    """Unique-token / top-bigram / dup-trigram fractions vs a direct
    Python computation with the same tokenizer."""
    import re

    from credigraph_spark.pipeline import repetition_stats

    docs = DOCS + [
        (7, "spam spam spam spam spam ham"),
        (8, "ab cd ab cd ab cd ab cd"),
        (9, "x"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(df).collect()}

    for doc_id, text in docs:
        toks = [t for t in re.split(r"[^a-z0-9']+", text.lower()) if t]
        n = len(toks)
        bg = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        tg = [f"{a} {b} {c}" for a, b, c in zip(toks, toks[1:], toks[2:])]
        g = got[doc_id]
        assert g["n_tokens"] == n
        assert abs(g["uniq_token_frac"] - (len(set(toks)) / n if n else 0)) < 1e-12
        want_bg = 2.0 * max(bg.count(d) for d in set(bg)) / n if n >= 2 else 0.0
        assert abs(g["top_bigram_frac"] - want_bg) < 1e-12, doc_id
        want_tg = 1.0 - len(set(tg)) / len(tg) if n >= 3 else 0.0
        assert abs(g["dup_trigram_frac"] - want_tg) < 1e-12, doc_id


def test_benchmark_contamination(spark):
    """Docs sharing >= min_shared 3-gram shingles with the benchmark set
    are flagged with the exact distinct-shared count; clean docs are not."""
    from credigraph_spark.pipeline import benchmark_contamination

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [(1, "see the quick brown fox jumps today"),   # shares 3-grams
         (2, "completely unrelated words entirely here"),
         (3, "the quick brown fox jumps over the lazy dog")],  # full copy
        ["doc_id", "text"])
    got = {r["doc_id"]: r["n_shared_ngrams"]
           for r in benchmark_contamination(
               corpus, bench, shingle_n=3, min_shared=2).collect()}
    # doc 1: shingles of its text vs benchmark's 3-grams
    b_sh = {"the quick brown", "quick brown fox", "brown fox jumps",
            "fox jumps over", "jumps over the", "over the lazy",
            "the lazy dog"}
    c1 = {"see the quick", "the quick brown", "quick brown fox",
          "brown fox jumps", "fox jumps today"}
    assert got[1] == len(c1 & b_sh) == 3
    assert got[3] == 7
    assert 2 not in got


def test_fingerprint_normalization_invariance(spark):
    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "other words")],
        ["doc_id", "text"],
    )
    fp = {r["doc_id"]: r["fingerprint"] for r in document_fingerprint(df).collect()}
    assert fp[1] == fp[2] != fp[3]


def test_multimodal_plumbing(spark):
    rows = [(i, "image", bytes([i] * (10 + i))) for i in range(6)]
    df = spark.createDataFrame(rows, ["media_id", "modality", "data"])
    meta = attach_binary_metadata(df).collect()
    for r in meta:
        assert r["sha256"] == hashlib.sha256(bytes([r["media_id"]] * r["n_bytes"])).hexdigest()
    feats = extract_features(df.repartition(3), dim=8).collect()
    assert len(feats) == 6
    assert all(len(r["feature"]) == 8 and r["n_bytes"] >= 10 for r in feats)
    # determinism across partitionings
    feats2 = {r["media_id"]: r["feature"] for r in extract_features(df.repartition(1), dim=8).collect()}
    assert all(feats2[r["media_id"]] == r["feature"] for r in feats)
    plan = frame_sample_plan(df, n_frames=4).collect()
    assert len(plan) == 24 and {r["frame_idx"] for r in plan} == {0, 1, 2, 3}


def _bmp(width: int, height: int) -> bytes:
    """Minimal uncompressed 24-bit BMP (real, openable file)."""
    import struct

    row = ((width * 3 + 3) // 4) * 4
    pix = bytes(row * height)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pix),
                       2835, 2835, 0, 0)
    return header + info + pix


def _wav(channels: int, rate: int, n_samples: int = 32) -> bytes:
    """Minimal PCM16 WAV (real, playable file)."""
    import struct

    data = bytes(2 * channels * n_samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2,
                      channels * 2, 16)
    return (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def _png(width: int, height: int) -> bytes:
    """Minimal valid PNG (signature + CRC-correct IHDR; grayscale)."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", len(ihdr)) + chunk
            + struct.pack(">I", zlib.crc32(chunk)) + bytes(64))


def test_multimodal_real_decoder(spark):
    rows = [
        (0, "image", _bmp(17, 9)),
        (1, "image", _png(321, 123)),
        (2, "audio", _wav(2, 44100)),
        (3, "image", b"\x00garbage not a container"),  # flagged, not fatal
        (4, "image", None),
    ]
    df = spark.createDataFrame(rows, "media_id long, modality string, data binary")
    got = {r["media_id"]: r for r in
           extract_features(df.repartition(3), dim=4, decoder="real").collect()}
    assert (got[0]["width"], got[0]["height"]) == (17, 9)
    assert (got[1]["width"], got[1]["height"]) == (321, 123)
    # audio overload: width=channels, height=sample_rate
    assert (got[2]["width"], got[2]["height"]) == (2, 44100)
    assert got[3]["width"] == got[3]["height"] == -1
    assert got[4]["width"] == -1 and got[4]["n_bytes"] == 0
    assert all(len(r["feature"]) == 4 for r in got.values())


def test_embedding_near_dup_pairs(spark):
    """Exact pairs match numpy; LSH blocking recovers >= 80% of them."""
    from credigraph_spark.pipeline import embedding_near_dup_pairs

    rows, df = _embeddings(spark, n=80)
    mat = {i: np.array(v) for i, v in rows}
    expect = set()
    for a in mat:
        for b in mat:
            if a < b:
                c = float(mat[a] @ mat[b] / (np.linalg.norm(mat[a]) * np.linalg.norm(mat[b])))
                if c >= 0.4:
                    expect.add((a, b))
    exact = {(r["id_a"], r["id_b"])
             for r in embedding_near_dup_pairs(df, threshold=0.4, method="exact").collect()}
    assert exact == expect and expect
    approx = {(r["id_a"], r["id_b"])
              for r in embedding_near_dup_pairs(df, threshold=0.4, method="lsh",
                                                bits_per_table=4, n_tables=16).collect()}
    assert approx <= exact                       # blocking never invents pairs
    assert len(approx) / len(exact) >= 0.8       # recall gate


def test_lsh_bucket_cap_drops_hot_buckets(spark):
    """A boilerplate cluster that floods one band bucket is dropped by the
    cap instead of emitting ~size^2/2 pairs."""
    rows = [(i, "identical boilerplate text repeated everywhere") for i in range(40)]
    rows += [(100, "some unique document about spark"),
             (101, "some unique document about spark")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    capped = lsh_candidate_pairs(df, max_bucket_size=10)
    got = {(r["id_a"], r["id_b"]) for r in capped.collect()}
    assert (100, 101) in got                    # small buckets still pair
    assert all(a >= 100 for a, _ in got)        # 40-doc hot bucket dropped
    uncapped = lsh_candidate_pairs(df, max_bucket_size=None)
    assert uncapped.count() >= 40 * 39 // 2


def test_dedup_canonical_transitive_clusters(spark):
    """A~B and B~C chains must collapse to ONE canonical id (the cluster
    min) even when A and C share no LSH band directly; untouched docs are
    their own canonical."""
    from credigraph_spark.pipeline import dedup_canonical, lsh_candidate_pairs

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    docs = spark.createDataFrame(
        [(1, base), (2, base + " tail two"), (3, base + " tail two three"),
         (4, "completely different text about spark dataframes and shuffles "
             "partitions catalyst tungsten codegen" * 3)],
        "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"])
             for r in lsh_candidate_pairs(docs, num_hashes=4,
                                          rows_per_band=2).collect()}
    got = {r["doc_id"]: (r["canonical_id"], r["is_canonical"])
           for r in dedup_canonical(docs, num_hashes=4,
                                    rows_per_band=2).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[4] == (4, True)          # untouched doc canonicalizes to self
    # every doc in the near-dup cluster maps to the cluster min
    cluster = {d for p in pairs for d in p}
    if cluster:
        lo = min(cluster)
        for d in cluster:
            assert got[d] == (lo, d == lo)
    # exactly one canonical per cluster + one per singleton
    n_canon = sum(1 for _, (c, is_c) in got.items() if is_c)
    assert n_canon == 4 - len(cluster) + (1 if cluster else 0)


def _md5_frac(key: str) -> float:
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16) / 16 ** 15


def test_stratified_sample_matches_single_window(spark):
    """The two-phase (salted, then global) plan must equal the plain
    one-window selection: smallest-k md5(doc_id|seed) per group."""
    from credigraph_spark.pipeline import stratified_sample

    rows = [(i, ["en", "de", "fr"][i % 3]) for i in range(90)]
    df = spark.createDataFrame(rows, ["doc_id", "lang"])
    got = {(r["doc_id"], r["lang"])
           for r in stratified_sample(df, "lang", k=4, key_cols=["doc_id"],
                                      seed=42, n_salts=8).collect()}
    expect = set()
    for lang in ("en", "de", "fr"):
        members = [i for i, l in rows if l == lang]
        members.sort(key=lambda i: hashlib.md5(f"{i}|42".encode()).hexdigest())
        expect |= {(i, lang) for i in members[:4]}
    assert got == expect


def test_stratified_sample_small_groups_kept_whole(spark):
    from credigraph_spark.pipeline import stratified_sample

    df = spark.createDataFrame([(1, "a"), (2, "a"), (3, "b")],
                               ["doc_id", "lang"])
    out = stratified_sample(df, "lang", k=10, key_cols=["doc_id"]).collect()
    assert len(out) == 3


def test_hash_split_matches_python_and_is_stable(spark):
    from credigraph_spark.pipeline import hash_split

    df = spark.createDataFrame([(i,) for i in range(1000)], ["doc_id"])
    weights = {"train": 0.8, "val": 0.1, "test": 0.1}
    got = {r["doc_id"]: r["split"]
           for r in hash_split(df, ["doc_id"], weights, seed=7).collect()}

    def expect_split(i):
        f = _md5_frac(f"{i}|7")
        return "train" if f < 0.8 else ("val" if f < 0.9 else "test")

    assert got == {i: expect_split(i) for i in range(1000)}
    # proportions in the right ballpark on 1000 keys
    from collections import Counter
    c = Counter(got.values())
    assert 700 < c["train"] < 880 and c["val"] > 50 and c["test"] > 50
    # growing the corpus never reassigns an existing key
    df2 = spark.createDataFrame([(i,) for i in range(2000)], ["doc_id"])
    got2 = {r["doc_id"]: r["split"]
            for r in hash_split(df2, ["doc_id"], weights, seed=7).collect()}
    assert all(got2[i] == got[i] for i in range(1000))


def test_hash_split_rejects_bad_weights(spark):
    from credigraph_spark.pipeline import hash_split

    df = spark.createDataFrame([(1,)], ["doc_id"])
    with pytest.raises(ValueError):
        hash_split(df, ["doc_id"], {"a": 0.5, "b": 0.4})
