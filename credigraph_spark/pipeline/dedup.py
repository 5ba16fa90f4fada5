"""Deduplication operators for large-scale training-data pipelines.

Four families, all shuffle-conscious:

* exact        — hash-groupBy on sha256(text): one shuffle, map-side
                 combinable, the 100 TB workhorse;
* MinHash+LSH  — word-shingles → per-band min-hash signatures (ONE
                 explode+groupBy computes every band's min in a single
                 shuffle) → banded bucket self-join for candidate pairs.
                 Hash family is md5 with a band-salt prefix, chosen because
                 it is identical in Spark and DuckDB (the correctness
                 oracle) and deterministic across engines/JVMs;
* n-gram Jaccard — exact shingle-set Jaccard on candidate pairs (explode +
                 pair-count aggregation; used as the LSH verify stage);
* SimHash      — 64-bit sign-aggregated token hashes via a vectorized
                 numpy pandas UDF (bit twiddling is the one part SQL can't
                 express cleanly), near-dups = hamming distance ≤ k on
                 rotated bucket keys.

Everything keys on an integer ``id`` column + string ``text`` column.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import LongType


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep-first (smallest id) per identical text. Returns (keep_id,
    dup_count, content_sha256). Hash first so the wide text column never
    shuffles — only 64-byte digests move."""
    return (
        df.select(F.col(id_col), F.sha2(F.col(text_col), 256).alias("content_sha256"))
        .groupBy("content_sha256")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("dup_count"))
    )


def shingles(text_col: str | Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of lowercased text — pure SQL
    (split + transform over an index sequence), no UDF."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    words = F.split(F.lower(col), r"\s+")
    count = F.greatest(F.size(words) - F.lit(n - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.array_join(F.slice(words, i, n), " "),
    )
    return F.array_distinct(grams)


def minhash_signatures(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                       num_hashes: int = 8, shingle_n: int = 3) -> DataFrame:
    """(id, mh_0..mh_{k-1}) — k min-hashes in ONE explode + ONE groupBy:
    every permutation is min(md5(salt_i || shingle)), all k minima computed
    as parallel aggregates of the same exploded stream (single shuffle,
    map-side combined)."""
    exploded = df.select(
        F.col(id_col), F.explode(shingles(text_col, shingle_n)).alias("sh")
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"salt{i}:"), F.col("sh")))).alias(f"mh_{i}")
        for i in range(num_hashes)
    ]
    return exploded.groupBy(id_col).agg(*aggs)


def lsh_candidate_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                        num_hashes: int = 8, rows_per_band: int = 2,
                        shingle_n: int = 3) -> DataFrame:
    """Banded LSH: band key = md5 of ``rows_per_band`` consecutive
    min-hashes; docs sharing any band key are candidates. Returns distinct
    (id_a, id_b) with id_a < id_b.

    Scale shape: the self-join is per-band-bucket (groupBy band value), so
    only same-bucket docs pair up; hot buckets (boilerplate text) are the
    skew risk — AQE skew-join handles the join, and callers should cap
    bucket size upstream for 100 TB runs."""
    sigs = minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
    n_bands = num_hashes // rows_per_band
    bands = sigs.select(
        F.col(id_col),
        F.array(*[
            F.md5(F.concat_ws("|", F.lit(str(b)), *[
                F.col(f"mh_{b * rows_per_band + r}") for r in range(rows_per_band)
            ])).alias(f"band_{b}")
            for b in range(n_bands)
        ]).alias("bands"),
    ).select(F.col(id_col), F.posexplode("bands").alias("band_idx", "band_val"))
    left = bands.select(F.col(id_col).alias("id_a"), "band_idx", "band_val")
    right = bands.select(F.col(id_col).alias("id_b"), "band_idx", "band_val")
    return (
        left.join(right, ["band_idx", "band_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def ngram_jaccard_pairs(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                        shingle_n: int = 3, threshold: float = 0.5,
                        candidates: DataFrame | None = None) -> DataFrame:
    """Exact shingle-set Jaccard ≥ threshold. Without ``candidates`` it
    pairs via shared-shingle co-occurrence (inverted-index join — never a
    full cross join); with ``candidates`` (e.g. LSH output) it verifies
    only those pairs. Returns (id_a, id_b, jaccard)."""
    sets = df.select(F.col(id_col).alias("id"), shingles(text_col, shingle_n).alias("sh_set"))
    sizes = sets.select("id", F.size("sh_set").alias("sz"))
    exploded = sets.select("id", F.explode("sh_set").alias("sh"))

    co = (
        exploded.select(F.col("id").alias("id_a"), "sh")
        .join(exploded.select(F.col("id").alias("id_b"), "sh"), "sh")
        .where(F.col("id_a") < F.col("id_b"))
    )
    if candidates is not None:
        # verify-only mode: restrict the inverted-index co-occurrence to
        # LSH candidate pairs before the pair-count aggregation.
        co = co.join(candidates, ["id_a", "id_b"], "left_semi")
    inter = co.groupBy("id_a", "id_b").agg(F.count("*").alias("inter"))
    return (
        inter
        .join(sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .select(
            "id_a", "id_b",
            (F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 64) -> DataFrame:
    """(id, simhash long) — sign-aggregated 64-bit token hashes, computed
    in a vectorized numpy pandas UDF (Arrow-batched; the per-bit +-1
    accumulation has no clean SQL form). Token hash = blake2b-derived
    64-bit, deterministic across runs."""

    @F.pandas_udf(LongType())
    def _simhash(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            if not t:
                continue
            acc = np.zeros(bits, dtype=np.int64)
            shifts = np.arange(bits, dtype=np.uint64)
            for tok in set(t.lower().split()):
                h = np.uint64(int.from_bytes(
                    hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big"
                ))
                bitsarr = (h >> shifts) & np.uint64(1)
                acc += np.where(bitsarr == 1, 1, -1)
            v = 0
            for b in range(bits):
                if acc[b] > 0:
                    v |= 1 << b
            out[i] = np.int64(np.uint64(v).astype(np.int64))
        return pd.Series(out)

    return df.select(F.col(id_col), _simhash(F.col(text_col)).alias("simhash"))


def simhash_near_dups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                      max_hamming: int = 3, n_tables: int = 4) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming. Blocking: split
    the 64-bit hash into ``n_tables`` chunks — any pair within distance
    (n_tables-1) shares at least one exact chunk (pigeonhole), so the join
    is per-chunk-bucket, never all-pairs. Verify stage = bit_count(xor)."""
    sh = simhash(df, id_col, text_col)
    chunk_bits = 64 // n_tables
    chunks = sh.select(
        F.col(id_col), "simhash",
        F.posexplode(F.array(*[
            F.shiftrightunsigned(F.col("simhash"), i * chunk_bits)
            .bitwiseAND(F.lit((1 << chunk_bits) - 1)).alias(f"c{i}")
            for i in range(n_tables)
        ])).alias("chunk_idx", "chunk_val"),
    )
    a = chunks.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"),
                      "chunk_idx", "chunk_val")
    b = chunks.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"),
                      "chunk_idx", "chunk_val")
    return (
        a.join(b, ["chunk_idx", "chunk_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))).alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )
