"""Count-min sketch: fixed-memory frequency estimation (Cormode &
Muthukrishnan 2005) — the vocabulary/heavy-hitter primitive of corpus
curation when the true term universe (URLs, shingles, n-grams) is too
large to count exactly.

The sketch is a depth × width integer grid; every occurrence increments
one cell per row (col = hash_r(term) mod width) and a point estimate is
the MIN over the term's depth cells — an overestimate with classical
(ε, δ) bounds, never an underestimate.

Engine shape: the grid is a (row, col, cnt) DataFrame with at most
depth·width rows — it BROADCASTS no matter how large the corpus is, and
building it is one union of depth per-row projections + one
partial-aggregatable groupBy: hub terms combine map-side, the shuffle
moves at most depth·width cells per map task. Hashes are md5-derived
(first 15 hex digits, the hash_split/weighted_sample trick) so the grid
is deterministic and bit-identical in any engine with md5 — which makes
the sketch itself oracle-checkable, not just its error bound. Counts are
exact integers end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _cms_col(term: Column, row: int, width: int, seed: int) -> Column:
    h = F.conv(F.substring(
        F.md5(F.concat_ws(":", F.lit(str(seed)), F.lit(str(row)), term)),
        1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(width))


def cms_build(occurrences: DataFrame, term_col: str = "term",
              depth: int = 4, width: int = 512,
              seed: int = 7) -> DataFrame:
    """Build the sketch grid (row, col, cnt) from one DataFrame row per
    term OCCURRENCE (pre-exploded). Missing cells are implicit zeros."""
    term = F.col(term_col)
    parts = None
    for r in range(depth):
        p = occurrences.select(
            F.lit(r).alias("row"),
            _cms_col(term, r, width, seed).alias("col"))
        parts = p if parts is None else parts.unionByName(p)
    return parts.groupBy("row", "col").agg(F.count("*").alias("cnt"))


def cms_estimate(cms: DataFrame, terms: DataFrame, term_col: str = "term",
                 depth: int = 4, width: int = 512,
                 seed: int = 7) -> DataFrame:
    """Point estimates (term, cms_n) for each distinct term in ``terms``:
    MIN over the term's depth cells. The sketch side broadcasts
    (<= depth*width rows); absent cells count 0 (term never seen)."""
    term = F.col(term_col)
    probes = None
    for r in range(depth):
        p = terms.select(term.alias("term"), F.lit(r).alias("row"),
                         _cms_col(term, r, width, seed).alias("col"))
        probes = p if probes is None else probes.unionByName(p)
    return (
        probes.join(F.broadcast(cms), ["row", "col"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_n"))
    )


def kmv_distinct(df: DataFrame, group_cols: list[str], value_col: str,
                 k: int = 8, seed: int = 7,
                 round_digits: int = 6) -> DataFrame:
    """K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002,
    the Theta-sketch family): per group keep the k SMALLEST hash values
    of the distinct inputs; if fewer than k distinct hashes exist the
    count is exact, else estimate (k-1) / u_k where u_k is the k-th
    minimum normalized to [0,1). The fixed-memory distinct counter for
    when the value universe (users, URLs, shingles) is too large for
    count_distinct's full dedup state.

    Hashes are md5-derived 60-bit integers (the cms/hash_split trick) —
    deterministic and bit-identical in any engine with md5, so the
    ESTIMATE itself is oracle-checkable, not just its error bound.

    Scale shape: one partial-aggregatable distinct over (group, hash) —
    duplicate values combine map-side, the dominant cost — then a
    per-group bottom-k (rank<=k window, the W1 top-k-per-group shape)
    over the deduped hashes and one tiny per-group agg. Returns
    (group..., n_exact, kmv_estimate, rel_err) — n_exact is computed
    alongside for calibration and costs one more agg over the SAME
    deduped pairs (shared scan), not a second pass over the raw data."""
    from pyspark.sql import Window

    hmax = float(16 ** 15)  # hashes are uniform in [0, 2^60)
    h = F.conv(F.substring(
        F.md5(F.concat_ws(":", F.lit(str(seed)),
                          F.col(value_col).cast("string"))),
        1, 15), 16, 10).cast("long")
    pairs = df.select(*group_cols, h.alias("h")).distinct()
    w = Window.partitionBy(*group_cols).orderBy("h")
    kmin = (pairs.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .groupBy(*group_cols)
            .agg(F.count("*").alias("n_min"), F.max("h").alias("kth")))
    exact = pairs.groupBy(*group_cols).agg(
        F.count("*").alias("n_exact"))
    est = F.when(
        F.col("n_min") < k, F.col("n_min").cast("double")
    ).otherwise(
        F.round(F.lit(float(k - 1) * hmax) / F.col("kth").cast("double"),
                round_digits))
    return (exact.join(kmin, group_cols)
            .withColumn("kmv_estimate", est)
            .withColumn("rel_err",
                        F.round(F.abs(F.col("kmv_estimate") - F.col("n_exact"))
                                / F.col("n_exact"), round_digits))
            .drop("n_min", "kth"))


def hll_distinct(df: DataFrame, group_cols: list[str], value_col: str,
                 b: int = 6, seed: int = 7,
                 round_digits: int = 6) -> DataFrame:
    """HyperLogLog distinct-count sketch (Flajolet et al. 2007) — the
    fixed-2^b-register counter that, unlike kmv_distinct, needs NO
    distinct pre-pass: max(rho) absorbs duplicates map-side, so the
    whole sketch is ONE partial-aggregatable groupBy over
    (group, bucket). Registers from the same md5-derived 60-bit hash as
    kmv/cms: bucket = h mod m, rho = leading zeros of the next 52 bits
    + 1 computed via length(bin(w)) — an exact INTEGER path (floor(log2)
    on doubles mis-floors just below powers of two), bit-identical in
    any engine with md5.

    Estimate: alpha_m * m^2 / sum_j 2^(-M_j) with the standard
    small-range correction E <= 2.5m & V>0 -> m*ln(m/V). The register
    sum is a sum of exact dyadic doubles — ORDER-INDEPENDENT — so the
    estimate itself is oracle-checkable to the final rounding.

    Returns (group..., n_exact, hll_estimate, rel_err); n_exact rides a
    separate count_distinct for calibration."""
    m = 1 << b
    h = F.conv(F.substring(
        F.md5(F.concat_ws(":", F.lit(str(seed)),
                          F.col(value_col).cast("string"))),
        1, 15), 16, 10).cast("long")
    rows = df.where(F.col(value_col).isNotNull()).select(
        *group_cols, h.alias("h"))
    w = F.expr(f"(h DIV {m}) % {1 << 52}")
    rho = F.when(w == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.bin(w)))
    regs = (rows.select(*group_cols, F.pmod(F.col("h"), F.lit(m))
                        .alias("bucket"), rho.alias("rho"))
            .groupBy(*group_cols, "bucket")
            .agg(F.max("rho").alias("reg")))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    per = (regs.groupBy(*group_cols)
           .agg(F.count("*").alias("n_present"),
                F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("s_present")))
    sumt = F.col("s_present") + (F.lit(m) - F.col("n_present"))
    v = F.lit(m) - F.col("n_present")
    e_raw = F.lit(alpha * m * m) / sumt
    est = F.when((e_raw <= 2.5 * m) & (v > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m)) / v)
                 ).otherwise(e_raw)
    exact = (df.where(F.col(value_col).isNotNull())
             .groupBy(*group_cols)
             .agg(F.countDistinct(value_col).alias("n_exact")))
    return (exact.join(per, list(group_cols))
            .select(*group_cols, "n_exact",
                    F.round(est, round_digits).alias("hll_estimate"),
                    F.round(F.abs(est - F.col("n_exact"))
                            / F.col("n_exact"),
                            round_digits).alias("rel_err")))


def bloom_build(keys: DataFrame, key_col: str, m_bits: int = 1024,
                k_hashes: int = 3, seed: int = 7) -> DataFrame:
    """Build a Bloom filter over a key set as ONE row holding
    ``m_bits/64`` int64 words — the runtime-filter / semi-join-pruning
    primitive: ship the tiny bitmap to the big side instead of
    shuffling the big side to the small one.

    Bit positions are md5-derived (pos_j = md5(seed:j:key) mod m), so
    the filter — and therefore exactly WHICH rows pass, including the
    false positives — is bit-reproducible in any engine.

    Scale shape: explode k positions per key, ONE bit_or aggregation
    over at most m/64 word keys (map-side combinable), then a bounded
    sort_array collect into the single-row array. Returns (words:
    array<long>) with exactly m/64 entries."""
    n_words = m_bits // 64
    base = keys.select(F.col(key_col).cast("string").alias("_k")).distinct()
    probes = base.select(
        F.explode(F.expr(
            f"transform(sequence(0, {k_hashes - 1}), j -> "
            f"cast(conv(substring(md5(concat('{seed}', ':', j, ':', _k)), "
            f"1, 15), 16, 10) as long) % {m_bits})")).alias("pos"))
    words = (probes
             .select(F.expr("pos DIV 64").alias("w"),
                     F.expr("shiftleft(1L, cast(pos % 64 as int))")
                     .alias("bit"))
             .groupBy("w").agg(F.bit_or("bit").alias("bits")))
    return words.agg(
        F.expr(
            f"transform(sequence(0, {n_words - 1}), i -> "
            f"coalesce(element_at(map_from_arrays(collect_list(w), "
            f"collect_list(bits)), cast(i as long)), 0L))").alias("words"))


def bloom_filter_rows(df: DataFrame, key_col: str, bloom: DataFrame,
                      m_bits: int = 1024, k_hashes: int = 3,
                      seed: int = 7) -> DataFrame:
    """Keep only rows whose key MIGHT be in the Bloom filter (no false
    negatives; false positives at the classic (1−e^{−kn/m})^k rate).
    The bitmap rides in as ONE broadcast row; the membership test is a
    pure per-row expression (k md5s + k bit probes) — no shuffle, no
    join on the data path. Compose with an exact join AFTER the
    prefilter: the filter only cuts the shuffled volume."""
    test = F.expr(
        f"aggregate("
        f"transform(sequence(0, {k_hashes - 1}), j -> "
        f"cast(conv(substring(md5(concat('{seed}', ':', j, ':', "
        f"cast({key_col} as string))), 1, 15), 16, 10) as long) "
        f"% {m_bits}), "
        f"true, "
        f"(acc, p) -> acc AND (((element_at(_bw, cast(p DIV 64 as int) "
        f"+ 1) >> cast(p % 64 as int)) & 1L) = 1L))")
    return (df.crossJoin(F.broadcast(
        bloom.select(F.col("words").alias("_bw"))))
            .where(test).drop("_bw"))
