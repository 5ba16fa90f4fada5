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
* n-gram Jaccard — candidate pairs from a document-frequency-capped
                 inverted index (a boilerplate shingle shared by 1M docs
                 would otherwise make the self-join quadratic), then EXACT
                 jaccard per pair via array intersect/union — the cap only
                 bounds discovery, never distorts the score;
* SimHash      — 64-bit sign-aggregated token hashes computed entirely in
                 SQL (64 conditional sums per doc, map-side combinable —
                 zero Python anywhere), near-dups = hamming distance ≤ k
                 with pigeonhole chunk blocking.

Everything keys on an integer ``id`` column + string ``text`` column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from credigraph_spark.session import eager_checkpoint


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
    """Distinct word n-gram shingles of lowercased text — pure SQL, no
    UDF. Grams are built as n−1 chained ``zip_with``s over shifted
    slices of the word array (the repetition_stats bigram trick): n
    whole-array slices + n−1 elementwise concats per document, instead
    of one interpreted slice+array_join PER GRAM — ~3x faster on the
    bench corpus with byte-identical output. A document shorter than n
    words yields its full word join, matching the old
    ``greatest(count, 1)`` + truncated-slice semantics.

    (A concat_ws-over-try_element_at formulation was measured 2-4x
    SLOWER than the old slice+array_join — TryEval wraps each lookup in
    per-call exception handling — and was reverted; see
    OPTIMIZATION_r06.md.)"""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    words = F.split(F.lower(col), r"\s+")
    sz = F.size(words)
    m = sz - F.lit(n - 1)
    grams = F.slice(words, 1, m)
    for k in range(1, n):
        grams = F.zip_with(grams, F.slice(words, k + 1, m),
                           lambda a, b: F.concat_ws(" ", a, b))
    full = F.when(sz >= n, grams).otherwise(
        F.array(F.array_join(words, " ")))
    return F.array_distinct(full)


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
                        shingle_n: int = 3,
                        max_bucket_size: int | None = 100_000,
                        sigs: DataFrame | None = None) -> DataFrame:
    """Banded LSH: band key = md5 of ``rows_per_band`` consecutive
    min-hashes; docs sharing any band key are candidates. Returns distinct
    (id_a, id_b) with id_a < id_b.

    Scale shape: the self-join is per-band-bucket, so only same-bucket
    docs pair up. Hot buckets (boilerplate text that min-hashes
    identically across millions of docs) are the quadratic risk: buckets
    larger than ``max_bucket_size`` are DROPPED before the self-join —
    one such bucket would emit ~size²/2 pairs, and a bucket that hot is a
    near-exact-duplicate cluster better handled by ``exact_dedup``. Pass
    None to disable the cap (the driver oracle check runs well under it
    either way)."""
    if sigs is None:
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
    if max_bucket_size is not None:
        small = (
            bands.groupBy("band_idx", "band_val")
            .agg(F.count("*").alias("_sz"))
            .where(F.col("_sz") <= max_bucket_size)
            .select("band_idx", "band_val")
        )
        bands = bands.join(small, ["band_idx", "band_val"], "left_semi")
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
                        candidates: DataFrame | None = None,
                        max_shingle_df: int = 1000) -> DataFrame:
    """Exact shingle-set Jaccard ≥ threshold. Returns (id_a, id_b, jaccard).

    Candidate discovery: with ``candidates`` (e.g. LSH output) only those
    pairs are verified; otherwise pairs come from an inverted-index
    self-join restricted to shingles appearing in ≤ ``max_shingle_df``
    documents. The DF cap is what keeps the self-join sub-quadratic at
    scale — ONE boilerplate shingle shared by 1M docs would otherwise emit
    ~10¹² pairs. Pairs sharing ONLY ultra-common shingles are therefore
    not discovered (documented approximation, standard for web dedup);
    every discovered pair still gets its EXACT jaccard, computed from the
    full shingle arrays (intersect/union), not from the capped stream."""
    sets = df.select(F.col(id_col).alias("id"), shingles(text_col, shingle_n).alias("sh_set"))

    if candidates is not None:
        pairs = candidates.select("id_a", "id_b")
    else:
        exploded = sets.select("id", F.explode("sh_set").alias("sh"))
        # DF cap: shingles are already distinct per doc, so count(*) per
        # shingle == its document frequency (map-side combinable agg).
        rare = (
            exploded.groupBy("sh").agg(F.count("*").alias("df_cnt"))
            .where(F.col("df_cnt") <= max_shingle_df)
            .select("sh")
        )
        capped = exploded.join(rare, "sh", "left_semi")
        pairs = (
            capped.select(F.col("id").alias("id_a"), "sh")
            .join(capped.select(F.col("id").alias("id_b"), "sh"), "sh")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b")
            .distinct()
        )

    # exact verify: jaccard from the full (uncapped) shingle arrays.
    return (
        pairs
        .join(sets.select(F.col("id").alias("id_a"), F.col("sh_set").alias("sh_a")), "id_a")
        .join(sets.select(F.col("id").alias("id_b"), F.col("sh_set").alias("sh_b")), "id_b")
        .select(
            "id_a", "id_b",
            (F.size(F.array_intersect("sh_a", "sh_b"))
             / F.size(F.array_union("sh_a", "sh_b"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 64) -> DataFrame:
    """(id, simhash long) — sign-aggregated ``bits``-bit token hashes,
    computed ENTIRELY in SQL: explode distinct lowercase tokens, derive a
    64-bit token hash from md5 (two 32-bit halves via conv — md5 is
    bit-identical in Spark and DuckDB, so the correctness oracle can
    recompute signatures), then one groupBy with ``bits`` conditional sums
    (map-side combinable; whole-stage codegen; zero Python anywhere).

    Bit b of the signature is 1 iff Σ_tokens (±1 by token-hash bit b) > 0.
    Empty/whitespace-only docs get signature 0."""
    if not 1 <= bits <= 64:
        raise ValueError("bits must be in 1..64")
    toks = F.array_distinct(
        F.filter(F.split(F.lower(F.col(text_col)), r"\s+"), lambda t: F.length(t) > 0)
    )
    exploded = df.select(F.col(id_col).alias("id"), F.explode(toks).alias("tok"))
    # 64-bit token hash as two 32-bit halves of md5 (conv is exact ≤ 8 hex
    # chars; 16 would overflow signed long). lo covers bits 0..31, hi 32..63.
    hashed = exploded.select(
        "id",
        F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long").alias("hi"),
        F.conv(F.substring(F.md5("tok"), 9, 8), 16, 10).cast("long").alias("lo"),
    )

    def bit_sum(b: int) -> Column:
        src = F.col("lo") if b < 32 else F.col("hi")
        return F.sum(
            F.when(F.shiftright(src, b % 32).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"acc_{b}")

    accs = hashed.groupBy("id").agg(*[bit_sum(b) for b in range(bits)])
    # pack: bit 63 is the sign bit of a long, added as -2^63 when set.
    packed = None
    for b in range(bits):
        term = F.when(F.col(f"acc_{b}") > 0,
                      F.lit(-(1 << 63) if b == 63 else (1 << b)).cast("long")
                      ).otherwise(F.lit(0).cast("long"))
        packed = term if packed is None else packed + term
    sigs = accs.select("id", packed.alias("simhash"))
    # docs with no tokens produce no exploded rows: re-attach with 0.
    return (
        df.select(F.col(id_col))
        .join(sigs.withColumnRenamed("id", id_col), id_col, "left")
        .select(F.col(id_col), F.coalesce("simhash", F.lit(0).cast("long")).alias("simhash"))
    )


def simhash_near_dups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                      max_hamming: int = 3, n_tables: int = 4) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming. Blocking: split
    the 64-bit hash into ``n_tables`` chunks — any pair within distance
    (n_tables-1) shares at least one exact chunk (pigeonhole), so the join
    is per-chunk-bucket, never all-pairs. Verify stage = bit_count(xor).

    The pigeonhole guarantee REQUIRES ``n_tables > max_hamming`` (a pair at
    distance n_tables can differ in every chunk); rejected loudly rather
    than silently missing pairs. Note the scale trade-off: larger
    max_hamming forces more tables → fewer bits per chunk → coarser
    buckets → a more expensive self-join."""
    if max_hamming >= n_tables:
        raise ValueError(
            f"pigeonhole blocking needs n_tables > max_hamming "
            f"(got n_tables={n_tables}, max_hamming={max_hamming}): pairs at "
            f"hamming {n_tables}..{max_hamming} would be silently missed"
        )
    if 64 % n_tables != 0:
        raise ValueError("n_tables must divide 64")
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


def dedup_canonical(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", num_hashes: int = 8,
                    rows_per_band: int = 2, shingle_n: int = 3,
                    max_bucket_size: int | None = 100_000) -> DataFrame:
    """End-to-end corpus dedup: LSH candidate pairs -> connected
    components over the pair graph -> one canonical doc per near-dup
    cluster (the cluster's smallest id, which is exactly what hash-min
    CC converges to). Returns (id_col, canonical_id, is_canonical) for
    EVERY input document; keep-one filtering is ``where(is_canonical)``.

    This is the composition a training-data pipeline actually ships:
    pair detection alone leaves A~B~C chains ambiguous (keep A and C?);
    the transitive closure makes "keep exactly one per cluster"
    well-defined and deterministic. Scale shape: the pair graph is tiny
    relative to the corpus (only near-dup docs appear), so the CC
    supersteps run on a graph orders of magnitude smaller than the
    input; everything else is one broadcast-able join back."""
    from credigraph_spark.graph.components import connected_components

    pairs = lsh_candidate_pairs(df, id_col, text_col, num_hashes,
                                rows_per_band, shingle_n, max_bucket_size)
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    labels, _ = connected_components(edges)
    return (
        df.select(F.col(id_col))
        .join(labels.withColumnRenamed("vid", id_col), id_col, "left")
        .select(
            id_col,
            F.coalesce("component", F.col(id_col)).alias("canonical_id"),
            (F.coalesce("component", F.col(id_col)) == F.col(id_col)
             ).alias("is_canonical"),
        )
    )


def jaccard_prefix_pairs(
    df: DataFrame,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 6,
) -> DataFrame:
    """EXACT Jaccard similarity self-join via prefix filtering (the
    AllPairs/PPJoin family, Bayardo et al. WWW'07): every pair of docs
    whose distinct-token Jaccard >= ``threshold``, with no candidate
    ever missed — the exact complement to the probabilistic LSH/minhash
    paths above. Returns (id_a, id_b, common, n_union, jaccard), a < b.

    How it prunes: tokens get a global rarity order (df asc, token);
    each doc's candidate prefix is its first n - floor(t*n) + 1 tokens
    under that order (one LONGER than the textbook n - ceil(t*n) + 1,
    so float wobble in t*n can only ADD candidates, never lose one —
    completeness is float-proof). Any pair with J >= t must share a
    prefix token [overlap >= t*max(|x|,|y|) >= ceil(t*|x|)], so the
    equi-join on prefix tokens sees every qualifying pair; a size
    filter min >= t*max prunes further, then the exact intersect
    verifies. Candidate volume ~ sum over tokens of df(token in
    prefixes)^2 — the rare-first order keeps frequent tokens out of
    prefixes, which is what makes this run at corpus scale.

    Shape: two bounded aggs (token df, per-doc sorted array), one
    prefix explode + equi-join, one verify join against the per-doc
    arrays. No Python, no windows over data-sized input."""
    toks = (df.select(F.col(id_col).alias("_id"),
                      F.explode(F.array_distinct(F.filter(
                          F.split(F.lower(F.col(text_col)), r"\s+"),
                          lambda w: w != F.lit("")))).alias("tok")))
    dfreq = toks.groupBy("tok").agg(F.count("*").alias("_df"))
    ordered = (
        toks.join(dfreq, "tok")
        .groupBy("_id")
        .agg(F.transform(
            F.sort_array(F.collect_list(F.struct("_df", "tok"))),
            lambda s: s.getField("tok")).alias("toks"))
        .select("_id", "toks", F.size("toks").cast("long").alias("n"))
    )
    prefix_len = (F.col("n")
                  - F.floor(F.lit(float(threshold)) * F.col("n")).cast("int")
                  + F.lit(1))
    pre = ordered.select(
        "_id", "n",
        F.explode(F.slice("toks", F.lit(1), prefix_len)).alias("tok"))
    cand = (
        pre.alias("l").join(pre.alias("r"), "tok")
        .where(F.col("l._id") < F.col("r._id"))
        .where(F.least("l.n", "r.n")
               >= F.lit(float(threshold)) * F.greatest("l.n", "r.n"))
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
    )
    arr = ordered.select("_id", "toks", "n")
    verified = (
        cand
        .join(arr.select(F.col("_id").alias("id_a"),
                         F.col("toks").alias("ta"),
                         F.col("n").alias("na")), "id_a")
        .join(arr.select(F.col("_id").alias("id_b"),
                         F.col("toks").alias("tb"),
                         F.col("n").alias("nb")), "id_b")
        .select("id_a", "id_b",
                F.size(F.array_intersect("ta", "tb")).cast("long")
                .alias("common"),
                (F.col("na") + F.col("nb")).alias("_sum"))
        .select("id_a", "id_b", "common",
                (F.col("_sum") - F.col("common")).cast("long")
                .alias("n_union"))
        .where(F.col("common")
               >= F.lit(float(threshold)) * F.col("n_union"))
    )
    return verified.select(
        "id_a", "id_b", "common", "n_union",
        F.round(F.col("common") / F.col("n_union"),
                round_digits).alias("jaccard"))


def minhash_calibration(df: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", num_hashes: int = 8,
                        rows_per_band: int = 2, shingle_n: int = 3,
                        max_bucket_size: int | None = 100_000,
                        round_digits: int = 6) -> DataFrame:
    """(id_a, id_b, est_jaccard, exact_jaccard, abs_err) over the LSH
    candidate pairs: the MinHash estimator (fraction of the k
    signature minima that agree) next to the exact shingle Jaccard —
    the dedup family's quality gate, playing the role ann_recall_at_k
    plays for the ANN family. A drifting abs_err distribution flags a
    k too small (or boilerplate shingle collisions) BEFORE a dedup run
    deletes the wrong documents.

    One signature pass is shared between banding and the estimator
    (sigs passed through to lsh_candidate_pairs); the exact side is
    bounded by the candidate set — intersection counts come from two
    id-keyed joins of the exploded shingle stream against the pairs,
    never an all-pairs product. Both jaccards and the error are rounded
    (cross-engine float discipline)."""
    sigs = (minhash_signatures(df, id_col, text_col, num_hashes, shingle_n)
            .transform(eager_checkpoint))  # two consumers: bands + estimator
    cands = lsh_candidate_pairs(df, id_col, text_col, num_hashes,
                                rows_per_band, shingle_n, max_bucket_size,
                                sigs=sigs)
    a = sigs.select(F.col(id_col).alias("id_a"),
                    *[F.col(f"mh_{i}").alias(f"a_{i}")
                      for i in range(num_hashes)])
    b = sigs.select(F.col(id_col).alias("id_b"),
                    *[F.col(f"mh_{i}").alias(f"b_{i}")
                      for i in range(num_hashes)])
    matches = sum(
        F.when(F.col(f"a_{i}") == F.col(f"b_{i}"), 1).otherwise(0)
        for i in range(num_hashes))
    est = (cands.join(a, "id_a").join(b, "id_b")
           .select("id_a", "id_b",
                   (matches / F.lit(float(num_hashes))).alias("est")))
    sh = df.select(F.col(id_col).alias("id"),
                   F.explode(shingles(text_col, shingle_n)).alias("sh"))
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    inter = (cands
             .join(sh.select(F.col("id").alias("id_a"), "sh"), "id_a")
             .join(sh.select(F.col("id").alias("id_b"), "sh"),
                   ["id_b", "sh"])
             .groupBy("id_a", "id_b").agg(F.count("*").alias("inter")))
    return (est
            .join(inter, ["id_a", "id_b"], "left")
            .join(sizes.select(F.col("id").alias("id_a"),
                               F.col("n").alias("na")), "id_a")
            .join(sizes.select(F.col("id").alias("id_b"),
                               F.col("n").alias("nb")), "id_b")
            .select(
                "id_a", "id_b",
                F.round("est", round_digits).alias("est_jaccard"),
                F.round(F.coalesce("inter", F.lit(0)).cast("double")
                        / (F.col("na") + F.col("nb")
                           - F.coalesce("inter", F.lit(0))),
                        round_digits).alias("exact_jaccard"),
                F.round(F.abs(
                    F.col("est") - F.coalesce("inter", F.lit(0))
                    / (F.col("na") + F.col("nb")
                       - F.coalesce("inter", F.lit(0)))),
                    round_digits).alias("abs_err")))


def split_leakage(df: DataFrame, weights: dict[str, float],
                  id_col: str = "doc_id", text_col: str = "text",
                  num_hashes: int = 8, rows_per_band: int = 2,
                  shingle_n: int = 3, seed: int = 42,
                  max_bucket_size: int | None = 100_000) -> DataFrame:
    """Train/test split-contamination screen: near-duplicate candidate
    pairs (the LSH blocking) that CROSS a deterministic hash split —
    the leakage an eval suite inherits when dedup runs before splitting
    but not across the boundary (Lee et al. 2022 §6 measure this
    directly; it is the within-corpus sibling of the external
    benchmark-contamination screen).

    Output: one row per split-pair (split_a, split_b, n_pairs,
    n_cross) with split_a <= split_b lexically, n_cross = pairs whose
    endpoints land in different splits — plus the grand totals readable
    by summing. Composes the engine's own hash_split (md5 fraction,
    bit-stable) and lsh_candidate_pairs; the pair table never grows
    beyond the banded candidates, and the rollup is one bounded
    partial agg (≤ C(n_splits+1, 2) rows)."""
    from credigraph_spark.pipeline.sampling import hash_split

    splits = (hash_split(df.select(id_col), [id_col], weights, seed)
              .select(F.col(id_col), F.col("split")))
    cands = lsh_candidate_pairs(df, id_col, text_col, num_hashes,
                                rows_per_band, shingle_n, max_bucket_size)
    j = (cands
         .join(splits.select(F.col(id_col).alias("id_a"),
                             F.col("split").alias("sa")), "id_a")
         .join(splits.select(F.col(id_col).alias("id_b"),
                             F.col("split").alias("sb")), "id_b"))
    return (j.select(
                F.least("sa", "sb").alias("split_a"),
                F.greatest("sa", "sb").alias("split_b"),
                (F.col("sa") != F.col("sb")).alias("_cross"))
            .groupBy("split_a", "split_b")
            .agg(F.count("*").alias("n_pairs"),
                 F.sum(F.when(F.col("_cross"), 1).otherwise(0))
                 .cast("long").alias("n_cross")))


def prefix_jaccard_topk(df: DataFrame, threshold: float = 0.9, k: int = 50,
                        id_col: str = "doc_id", text_col: str = "text",
                        round_digits: int = 6) -> DataFrame:
    """Top-k most-similar document pairs by exact token-set Jaccard,
    with LOSSLESS prefix-filter candidate generation (AllPairs/PPJoin).

    Complements ngram_jaccard_pairs: that path caps shingle document
    frequency (lossy but safe for boilerplate-heavy web text); this one
    is exact — if J(A,B) >= threshold the pair IS discovered. Principle:
    under one global token order, J(A,B) >= t forces |A∩B| >= ceil(t·|A|);
    if no common token sat in A's first |A| - ceil(t·|A|) + 1 tokens, the
    at-most ceil(t·|A|) - 1 suffix tokens could not cover that overlap.
    So indexing only each set's PREFIX under a rarest-first global order
    finds every qualifying pair while high-frequency tokens (the join
    blow-up risk) fall outside most prefixes.

    Scale shape: one distinct-token explode, one token-df aggregation, a
    per-doc window bounded by the doc's vocabulary, a self-join on PREFIX
    tokens only (each prefix is ~(1-t)·|set| + 1 of the rarest tokens),
    then exact verification from per-row token arrays. Top-k ranks on the
    ROUNDED jaccard with an (id_a, id_b) tiebreak; jaccard itself is a
    single division of exact integers — bit-identical across engines.
    """
    from pyspark.sql import Window

    toks = F.filter(F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
                    lambda t: F.length(t) > 0)
    sets = df.select(F.col(id_col).alias("id"),
                     F.array_distinct(toks).alias("ts"))
    exploded = sets.select("id", F.size("ts").alias("s"),
                           F.explode("ts").alias("t"))
    dfreq = exploded.groupBy("t").agg(F.count("*").alias("df_cnt"))
    w = Window.partitionBy("id").orderBy(F.col("df_cnt").asc(),
                                         F.col("t").asc())
    prefix = (exploded.join(dfreq, "t")
              .withColumn("rn", F.row_number().over(w))
              .where(F.col("rn") <= F.col("s")
                     - F.ceil(F.lit(threshold) * F.col("s")) + 1)
              .select("id", "t"))
    cand = (prefix.select(F.col("id").alias("id_a"), "t")
            .join(prefix.select(F.col("id").alias("id_b"), "t"), "t")
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())
    inter = F.size(F.array_intersect("ts_a", "ts_b"))
    return (cand
            .join(sets.select(F.col("id").alias("id_a"),
                              F.col("ts").alias("ts_a")), "id_a")
            .join(sets.select(F.col("id").alias("id_b"),
                              F.col("ts").alias("ts_b")), "id_b")
            .select("id_a", "id_b",
                    F.round(inter / (F.size("ts_a") + F.size("ts_b")
                                     - inter),
                            round_digits).alias("jaccard"))
            .where(F.col("jaccard") >= threshold)
            .orderBy(F.col("jaccard").desc(), "id_a", "id_b")
            .limit(k))


def containment_pairs(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", shingle_n: int = 3,
                      threshold: float = 0.8,
                      max_shingle_df: int = 1000) -> DataFrame:
    """Asymmetric shingle CONTAINMENT C(a ⊆ b) = |A ∩ B| / |A| — the
    quote/boilerplate/subset detector that Jaccard misses: a short doc
    fully embedded in a long one has tiny Jaccard but containment 1.0.
    Returns (id_a, id_b, n_a, common, containment) for every ORDERED
    pair with containment >= threshold, id_a != id_b (id_a is the
    contained side).

    Candidates come from the same document-frequency-capped inverted
    index as ``ngram_jaccard_pairs`` (the cap bounds the self-join at
    corpus scale; pairs sharing only ultra-common shingles are not
    discovered — documented approximation), then every candidate's
    containment is EXACT from the full shingle arrays. One unordered
    candidate join verifies both directions."""
    sets = df.select(F.col(id_col).alias("id"),
                     shingles(text_col, shingle_n).alias("sh_set"))
    exploded = sets.select("id", F.explode("sh_set").alias("sh"))
    rare = (exploded.groupBy("sh").agg(F.count("*").alias("df_cnt"))
            .where(F.col("df_cnt") <= max_shingle_df).select("sh"))
    capped = exploded.join(rare, "sh", "left_semi")
    pairs = (capped.select(F.col("id").alias("u"), "sh")
             .join(capped.select(F.col("id").alias("v"), "sh"), "sh")
             .where(F.col("u") < F.col("v"))
             .select("u", "v").distinct())
    verified = (
        pairs
        .join(sets.select(F.col("id").alias("u"),
                          F.col("sh_set").alias("sa")), "u")
        .join(sets.select(F.col("id").alias("v"),
                          F.col("sh_set").alias("sb")), "v")
        .select("u", "v",
                F.size(F.array_intersect("sa", "sb")).cast("long")
                .alias("common"),
                F.size("sa").cast("long").alias("na"),
                F.size("sb").cast("long").alias("nb")))
    both = (
        verified.select(F.col("u").alias("id_a"), F.col("v").alias("id_b"),
                        "common", F.col("na").alias("n_a"))
        .unionByName(
            verified.select(F.col("v").alias("id_a"),
                            F.col("u").alias("id_b"),
                            "common", F.col("nb").alias("n_a"))))
    return (both
            .select("id_a", "id_b", "n_a", "common",
                    (F.col("common") / F.col("n_a")).alias("containment"))
            .where(F.col("containment") >= threshold))


def hamming_prefix_pairs(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text", prefix_len: int = 24,
                         max_dist: int = 2) -> DataFrame:
    """LOSSLESS fixed-length Hamming near-dup join on the lowercased
    ``prefix_len``-char document prefix: every pair at Hamming distance
    <= ``max_dist`` is found, none missed. Pigeonhole chunk blocking
    (the exact-recall counterpart of SimHash's probabilistic banding):
    split the prefix into ``max_dist + 1`` contiguous chunks — any pair
    with <= max_dist substitutions must agree EXACTLY on at least one
    chunk, so an equi-join on (chunk_idx, chunk_text) sees every
    qualifying pair while random prefixes almost never collide. The
    Hamming verify is a JVM-side zip_with/aggregate over the char
    arrays — no UDF. Returns (id_a, id_b, dist), id_a < id_b."""
    n_chunks = max_dist + 1
    base = prefix_len // n_chunks
    pfx = (df.where(F.col(text_col).isNotNull()
                    & (F.length(text_col) >= prefix_len))
           .select(F.col(id_col).alias("id"),
                   F.lower(F.substring(text_col, 1, prefix_len))
                   .alias("pfx")))
    chunk_structs = []
    for j in range(n_chunks):
        start = j * base + 1
        ln = base if j < n_chunks - 1 else prefix_len - base * (n_chunks - 1)
        chunk_structs.append(F.struct(
            F.lit(j).alias("ci"),
            F.substring("pfx", start, ln).alias("ch")))
    idx = (pfx.select("id", "pfx",
                      F.explode(F.array(*chunk_structs)).alias("c"))
           .select("id", "pfx", F.col("c.ci").alias("ci"),
                   F.col("c.ch").alias("ch")))
    cand = (idx.alias("l").join(idx.alias("r"), ["ci", "ch"])
            .where(F.col("l.id") < F.col("r.id"))
            .select(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"),
                    F.col("l.pfx").alias("pa"), F.col("r.pfx").alias("pb"))
            .distinct())
    ham = F.aggregate(
        F.zip_with(F.split("pa", ""), F.split("pb", ""),
                   lambda x, y: F.when(x == y, F.lit(0)).otherwise(F.lit(1))),
        F.lit(0), lambda acc, x: acc + x)
    return (cand.select("id_a", "id_b", ham.cast("long").alias("dist"))
            .where(F.col("dist") <= max_dist))


def snm_candidate_pairs(df: DataFrame, sort_key, window: int = 6,
                        min_sim: float = 0.5, id_col: str = "doc_id",
                        text_col: str = "text", prefix_len: int = 40,
                        num_ranges: int | None = None,
                        round_digits: int = 6) -> DataFrame:
    """Sorted-neighborhood method (SNM — Hernandez & Stolfo 1995):
    entity-resolution blocking by a GLOBAL SORT instead of hashing —
    records are ranked by ``sort_key`` (near-duplicate records
    lexicographically cluster), and each record is compared only to the
    next ``window−1`` records in the order. The classic complement to
    LSH blocking: SNM catches prefix-preserving edits (typos deep in
    the string) that shingle/minhash buckets can split.

    The windowed self-join is an EQUI-join on rank+offset (offsets
    exploded 1..window−1) — never a range join; the global rank uses
    the O3 distributed construction (range-partition + per-partition
    row_number + ONE broadcast of the O(num_ranges) offsets). Pair
    score = levenshtein on the first ``prefix_len`` chars (bit-equal
    across engines — integer DP), sim = 1 − dist/max(len).

    Returns (doc_a, doc_b, dist, sim) for pairs with sim ≥ min_sim."""
    from pyspark.sql.window import Window as W

    spark = df.sparkSession
    base = df.select(F.col(id_col).alias("doc_id"),
                     F.substring(F.col(text_col), 1, prefix_len)
                     .alias("_t"),
                     sort_key.alias("_k"))
    if num_ranges is None:
        num_ranges = max(
            32, int(spark.conf.get("spark.sql.shuffle.partitions")))
    parts = (base.repartitionByRange(num_ranges, "_k", "doc_id")
             .withColumn("_pid", F.spark_partition_id()))
    wl = W.partitionBy("_pid").orderBy("_k", "doc_id")
    local = parts.withColumn("_r", F.row_number().over(wl))
    counts = parts.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    wo = (W.partitionBy(F.lit(0)).orderBy("_pid")
          .rowsBetween(W.unboundedPreceding, -1))
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(wo), F.lit(0)))
    ranked = (local.join(F.broadcast(offsets.select("_pid", "_off")),
                         "_pid")
              .select("doc_id", "_t",
                      (F.col("_off") + F.col("_r")).alias("rank")))
    probes = ranked.select(
        F.col("doc_id").alias("doc_a"), F.col("_t").alias("_ta"),
        F.explode(F.expr(f"transform(sequence(1, {window - 1}), "
                         f"o -> rank + o)")).alias("rank"))
    pairs = probes.join(
        ranked.select(F.col("doc_id").alias("doc_b"),
                      F.col("_t").alias("_tb"), "rank"), "rank")
    dist = F.levenshtein("_ta", "_tb")
    sim = F.round(
        F.lit(1.0) - dist / F.greatest(F.length("_ta"), F.length("_tb"),
                                       F.lit(1)).cast("double"),
        round_digits)
    return (pairs.select("doc_a", "doc_b", dist.cast("long").alias("dist"),
                         sim.alias("sim"))
            .where(F.col("sim") >= min_sim))


def dup_span_stats(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", k: int = 5) -> DataFrame:
    """Duplicate-substring span statistics (X195) — the exact-substring
    dedup diagnostic of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better"), bounded to token k-grams: a window
    is duplicated when its k-gram occurs >= 2 times anywhere in the
    corpus (cross- or within-document); duplicated windows are merged
    into maximal spans (overlapping OR token-adjacent windows coalesce)
    and each document reports how much of it is duplicated material.

    Returns one row per document: (id_col, n_tokens, n_dup_windows,
    n_spans, dup_tokens, dup_frac) with zero-filled stats for clean
    documents.

    Scale shape: one explode to (doc, pos, md5(k-gram)) — corpus-token
    bounded, the same footprint as the MinHash shingle explode above —
    one map-side-combinable groupBy on the 128-bit hash for the global
    frequency, a semi-join back, and per-DOCUMENT window functions for
    the island merge (partitions are single documents, never the
    corpus; no global sort). All JVM expressions, no UDFs.
    """
    from pyspark.sql.window import Window as W

    toks = F.filter(F.split(F.lower(F.col(text_col)), r"\s+"),
                    lambda t: F.length(t) > 0)
    base = (df.select(F.col(id_col).alias("_id"), toks.alias("tk"))
            .withColumn("n_tokens", F.size("tk").cast("long")))

    wins = (base.where(F.col("n_tokens") >= k)
            .select("_id", F.explode(F.expr(
                f"transform(sequence(1, size(tk) - {k - 1}), "
                f"i -> struct(i AS s, "
                f"md5(array_join(slice(tk, i, {k}), ' ')) AS h))"))
                .alias("w"))
            .select("_id", F.col("w.s").alias("s"), F.col("w.h").alias("h")))

    dup_h = (wins.groupBy("h").agg(F.count("*").alias("c"))
             .where(F.col("c") >= 2).select("h"))
    marks = (wins.join(dup_h, "h", "left_semi")
             .select("_id", "s", (F.col("s") + F.lit(k - 1)).alias("e")))

    wkey = W.partitionBy("_id").orderBy("s")
    prev_max = F.max("e").over(wkey.rowsBetween(W.unboundedPreceding, -1))
    isl = (marks
           .withColumn("_new", F.when(prev_max.isNull()
                                      | (F.col("s") > prev_max + 1), 1)
                  .otherwise(0))
           .withColumn("_g", F.sum("_new")
                       .over(wkey.rowsBetween(W.unboundedPreceding, 0))))
    spans = isl.groupBy("_id", "_g").agg(F.min("s").alias("ss"),
                                         F.max("e").alias("ee"))
    per = spans.groupBy("_id").agg(
        F.count("*").cast("long").alias("n_spans"),
        F.sum(F.col("ee") - F.col("ss") + 1).cast("long")
        .alias("dup_tokens"))
    nd = marks.groupBy("_id").agg(
        F.count("*").cast("long").alias("n_dup_windows"))

    return (base.select("_id", "n_tokens")
            .join(nd, "_id", "left").join(per, "_id", "left")
            .select(
                F.col("_id").alias(id_col),
                "n_tokens",
                F.coalesce("n_dup_windows", F.lit(0)).cast("long")
                .alias("n_dup_windows"),
                F.coalesce("n_spans", F.lit(0)).cast("long")
                .alias("n_spans"),
                F.coalesce("dup_tokens", F.lit(0)).cast("long")
                .alias("dup_tokens"),
                F.round(
                    F.when(F.col("n_tokens") > 0,
                           F.coalesce("dup_tokens", F.lit(0))
                           / F.col("n_tokens"))
                    .otherwise(F.lit(0.0)), 6).alias("dup_frac")))


def incremental_dedup_screen(df: DataFrame, base_pred,
                             id_col: str = "doc_id",
                             text_col: str = "text",
                             num_hashes: int = 4,
                             rows_per_band: int = 2,
                             shingle_n: int = 3) -> DataFrame:
    """Incremental crawl-batch dedup screen (X265): flag each NEW
    document that LSH-collides with the EXISTING base corpus — the
    asymmetric new-x-base band join every recurring crawl runs
    instead of re-deduping the whole corpus (new-new pairs are the
    NEXT batch's intra-dedup problem; base-base pairs were settled
    when the base landed). The batch-shaped sibling of X150's
    cross-source dup-flow matrix.

    Returns one row per NEW document: (id, n_base_matches, is_dup) —
    n_base_matches = distinct base docs sharing >= 1 band.

    Scale shape: signatures/bands computed ONCE over the union frame
    (the base side's bands are reusable artifacts in practice); the
    candidate join is bands(new) x bands(base) on the band key — hot
    buckets stay bounded by the base side only, and the quadratic
    new-x-new blowup never happens by construction.
    """
    sigs = minhash_signatures(df, id_col, text_col, num_hashes,
                              shingle_n)
    n_bands = num_hashes // rows_per_band
    bands = sigs.select(
        F.col(id_col),
        F.posexplode(F.array(*[
            F.md5(F.concat_ws("|", F.lit(str(b)), *[
                F.col(f"mh_{b * rows_per_band + r}")
                for r in range(rows_per_band)]))
            for b in range(n_bands)])).alias("band_idx", "band_val"))
    base_ids = df.where(base_pred).select(F.col(id_col)).distinct()
    bb = (bands.join(base_ids, id_col, "left_semi")
          .select(F.col(id_col).alias("base_id"), "band_idx",
                  "band_val"))
    nb = bands.join(base_ids, id_col, "left_anti")
    m = (nb.join(bb, ["band_idx", "band_val"])
         .groupBy(id_col)
         .agg(F.countDistinct("base_id").cast("long")
              .alias("n_base_matches")))
    new_ids = (df.select(F.col(id_col)).distinct()
               .join(base_ids, id_col, "left_anti"))
    return (new_ids.join(m, id_col, "left")
            .select(id_col,
                    F.coalesce("n_base_matches", F.lit(0))
                    .cast("long").alias("n_base_matches"))
            .withColumn("is_dup", F.col("n_base_matches") > 0))
