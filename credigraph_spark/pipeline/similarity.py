"""Similarity search over embedding columns (array<float/double>).

* ``cosine_topk_bruteforce`` — exact top-k: query×candidate join with the
  dot product expressed as ``zip_with`` + ``aggregate`` (JVM-side, no
  Python). The query side is small by construction and is broadcast, so
  the "cross join" is really a broadcast nested loop that streams the
  candidate table once — the right baseline shape at any scale.
* ``lsh_bucketed_topk`` — the scale path: random-hyperplane LSH bucket
  keys (sign bits of dot(v, plane_j)), computed by a vectorized numpy
  pandas UDF; queries only compare against same-bucket candidates across
  ``n_tables`` independent tables (approximate, tunable recall).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import ArrayType, LongType
from pyspark.sql.window import Window

from credigraph_spark.session import eager_checkpoint


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine_similarity(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(queries: DataFrame, candidates: DataFrame, k: int = 5,
                           id_col: str = "vec_id", vec_col: str = "embedding",
                           exclude_self: bool = True,
                           round_digits: int | None = None) -> DataFrame:
    """(query_id, neighbor_id, cosine) — exact top-k per query.
    Ties broken by smallest neighbor id for determinism. ``round_digits``
    ranks by the rounded cosine (cross-engine-stable ordering, same knob
    as lsh_bucketed_topk)."""
    # norms are per-VECTOR, not per-pair: compute each side's ||v|| once
    # before the pair join so the per-pair work is a single zip_with dot
    # instead of three interpreted array folds (guide §2.3 — same
    # doubles, same fold order, bit-identical cosine)
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"),
                       _norm(F.col(vec_col)).alias("_qn"))
    c = candidates.select(F.col(id_col).alias("neighbor_id"),
                          F.col(vec_col).alias("cv"),
                          _norm(F.col(vec_col)).alias("_cn"))
    scored = F.broadcast(q).crossJoin(c).select(
        "query_id", "neighbor_id",
        (_dot(F.col("qv"), F.col("cv"))
         / (F.col("_qn") * F.col("_cn"))).alias("cosine"),
    )
    if exclude_self:
        scored = scored.where(F.col("query_id") != F.col("neighbor_id"))
    order_key = (F.round("cosine", round_digits) if round_digits is not None
                 else F.col("cosine"))
    w = Window.partitionBy("query_id").orderBy(order_key.desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _md5_sign_planes(dim: int, total_bits: int, seed: int) -> np.ndarray:
    """Deterministic ±1 (Rademacher) hyperplanes derived from md5 — a
    valid sign-LSH projection family (Achlioptas-style sparse/sign random
    projections preserve the hyperplane-LSH collision property) with one
    extra property N(0,1) planes lack: any SQL engine with md5 can
    recompute the planes bit-for-bit, so the whole bucketing plan is
    oracle-checkable in DuckDB. plane[d, b] = +1 iff the first 8 hex chars
    of md5("seed:b:d") parse to an even integer."""
    import hashlib

    signs = np.empty((dim, total_bits), dtype=np.float64)
    for b in range(total_bits):
        for d in range(dim):
            h = hashlib.md5(f"{seed}:{b}:{d}".encode()).hexdigest()
            signs[d, b] = 1.0 if int(h[:8], 16) % 2 == 0 else -1.0
    return signs


def _hyperplane_bits_udf(bits_per_table: int, n_tables: int, seed: int):
    """Vectorized bucket-key UDF: one matrix multiply + one reshape-matmul
    bit-pack per Arrow batch against deterministic md5-derived ±1
    hyperplanes — fully batch-vectorized, no per-row Python. The vector
    dimension is read from the batch itself and the plane matrix is cached
    per dim, so NO driver-side collect is ever needed to probe it.
    Null/empty/ragged rows return NULL keys (posexplode then drops them)
    instead of crashing the stage — at 100 TB one malformed row must not
    kill a task."""
    total_bits = bits_per_table * n_tables
    plane_cache: dict[int, np.ndarray] = {}

    @F.pandas_udf(ArrayType(LongType()))
    def _buckets(vecs: pd.Series) -> pd.Series:
        out = pd.Series([None] * len(vecs), dtype=object, index=vecs.index)
        lens = vecs.map(lambda v: -1 if v is None else len(v))
        # one matmul per distinct dim in the batch (normally exactly one)
        for dim in (int(d) for d in lens.unique() if d > 0):
            planes = plane_cache.get(dim)
            if planes is None:
                planes = _md5_sign_planes(dim, total_bits, seed)
                plane_cache[dim] = planes
            sub = vecs[lens == dim]
            mat = np.stack(sub.to_numpy())         # (m, dim)
            signs = (mat @ planes) > 0             # (m, total_bits)
            weights = (1 << np.arange(bits_per_table, dtype=np.int64))
            # (m, n_tables, bits_per_table) @ (bits_per_table,) -> (m, n_tables)
            keys = signs.reshape(len(mat), n_tables, bits_per_table) @ weights
            out[sub.index] = pd.Series(keys.astype(np.int64).tolist(), index=sub.index)
        return out

    return _buckets


def lsh_bucketed_topk(queries: DataFrame, candidates: DataFrame, k: int = 5,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      dim: int | None = None, bits_per_table: int = 8,
                      n_tables: int = 4, seed: int = 7,
                      exclude_self: bool = True,
                      round_digits: int | None = None) -> DataFrame:
    """Approximate top-k: compare only within matching (table, bucket)
    pairs. Recall grows with n_tables; cost shrinks ~2^bits_per_table×
    vs brute force. ``dim`` is ignored (kept for API compatibility): the
    bucket UDF reads the dimension from each Arrow batch, so the plan has
    no driver-side collect.

    A (query, neighbor) pair sharing b buckets is deduped BEFORE the
    cosine, so each pair pays exactly one dot product (near-identical
    vectors — the hot case — share all n_tables buckets).

    ``round_digits``: rank by cosine rounded to that many digits (ties
    then break on neighbor_id) — makes the ranking reproducible across
    engines whose float summation order differs (the DuckDB oracle)."""
    udf = _hyperplane_bits_udf(bits_per_table, n_tables, seed)

    def with_buckets(df, id_alias, vec_alias, norm_alias):
        vc = F.col(vec_col)
        # ||v|| once per input row (before the posexplode fan-out), not
        # per pair — the pair score is then a single zip_with dot
        return (
            df.where(vc.isNotNull() & (F.size(vc) > 0))
            .select(F.col(id_col).alias(id_alias), vc.alias(vec_alias),
                    _norm(vc).alias(norm_alias), udf(vc).alias("bk"))
            .select(id_alias, vec_alias, norm_alias,
                    F.posexplode("bk").alias("table_idx", "bucket"))
        )

    q = with_buckets(queries, "query_id", "qv", "_qn")
    c = with_buckets(candidates, "neighbor_id", "cv", "_cn")
    pairs = (
        q.join(c, ["table_idx", "bucket"])
        .select("query_id", "qv", "_qn", "neighbor_id", "cv", "_cn")
        .dropDuplicates(["query_id", "neighbor_id"])   # qv/cv are functions of the ids
    )
    if exclude_self:
        pairs = pairs.where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id", "neighbor_id",
        (_dot(F.col("qv"), F.col("cv"))
         / (F.col("_qn") * F.col("_cn"))).alias("cosine"),
    )
    order_key = (F.round("cosine", round_digits) if round_digits is not None
                 else F.col("cosine"))
    w = Window.partitionBy("query_id").orderBy(order_key.desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def ann_recall_at_k(approx: DataFrame, exact: DataFrame, k: int,
                    round_digits: int = 8) -> DataFrame:
    """Recall@k of an approximate neighbor result against the exact
    top-k: per query, |approx ∩ exact| / |exact| over (query_id,
    neighbor_id) pairs. The standard ANN quality gate (FAISS-style
    evaluation), here as a first-class relational operator so recall is
    measured IN the engine rather than in a test harness.

    Both inputs are (query_id, neighbor_id[, ...]) top-k tables — pass
    outputs of cosine_topk_bruteforce / lsh_bucketed_topk / ivf_topk.
    Queries with an empty approximate result still report a row
    (recall 0.0) via the left join from the exact side.

    Scale shape: two k-row-per-query inputs, one co-keyed semi-ish join
    + per-query count — negligible next to producing either input; the
    ratio is one int/int division, rounded (exact in any engine)."""
    ex = exact.select("query_id", "neighbor_id")
    ap = approx.select("query_id", "neighbor_id")
    hits = (ex.join(ap, ["query_id", "neighbor_id"])
            .groupBy("query_id").agg(F.count("*").alias("n_hits")))
    base = ex.groupBy("query_id").agg(F.count("*").alias("n_exact"))
    return (base.join(hits, "query_id", "left")
            .select("query_id", "n_exact",
                    F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
                    F.round(F.coalesce("n_hits", F.lit(0))
                            / F.col("n_exact"), round_digits).alias("recall")))


def embedding_near_dup_pairs(df: DataFrame, threshold: float = 0.9,
                             id_col: str = "vec_id", vec_col: str = "embedding",
                             method: str = "lsh", bits_per_table: int = 8,
                             n_tables: int = 8, seed: int = 7) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine) with
    cosine ≥ threshold and id_a < id_b.

    ``method='exact'``: all-pairs (broadcast-nested-loop on the sorted-id
    inequality) — the O(n²) verification/oracle baseline, correct at
    query-table sizes only.
    ``method='lsh'``: random-hyperplane bucket blocking (same batched
    UDF as ``lsh_bucketed_topk``) — pairs only form inside matching
    (table, bucket) cells, the 100 TB shape; recall grows with
    ``n_tables`` (cosine-similar vectors land in the same half-space
    bucket with probability rising in the similarity)."""
    # per-vector ||v|| computed once on each side of the pair join; the
    # per-pair cosine is then one dot fold (bit-identical, guide §2.3)
    ids = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                    _norm(F.col(vec_col)).alias("n"))
    if method == "exact":
        a = ids.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                       F.col("n").alias("_na"))
        b = ids.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                       F.col("n").alias("_nb"))
        pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    elif method == "lsh":
        udf = _hyperplane_bits_udf(bits_per_table, n_tables, seed)
        bk = (ids.where(F.col("v").isNotNull() & (F.size("v") > 0))
                 .select("id", "v", "n",
                         F.posexplode(udf(F.col("v"))).alias("t", "bk")))
        a = bk.select(F.col("id").alias("id_a"), F.col("v").alias("va"),
                      F.col("n").alias("_na"), "t", "bk")
        b = bk.select(F.col("id").alias("id_b"), F.col("v").alias("vb"),
                      F.col("n").alias("_nb"), "t", "bk")
        pairs = (
            a.join(b, ["t", "bk"])
            .where(F.col("id_a") < F.col("id_b"))
            .dropDuplicates(["id_a", "id_b"])
        )
    else:
        raise ValueError(f"unknown method: {method}")
    return (
        pairs.select("id_a", "id_b",
                     (_dot(F.col("va"), F.col("vb"))
                      / (F.col("_na") * F.col("_nb"))).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def quantize_int8_stats(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_digits: int = 8,
) -> DataFrame:
    """Symmetric per-vector int8 quantization audit: scale = max|x|/127,
    code_i = clamp(round(x_i/scale), ±127), x̂_i = code_i·scale. Returns
    (vec_id, dim, scale, mse, max_err) — the reconstruction statistics a
    pipeline checks before shipping an int8-quantized ANN index (4×
    smaller than fp32; PQ in pipeline/pq.py is the next compression
    step down). All-zero vectors quantize losslessly (scale 0).

    Scale shape: every column is a per-row array fold over the 64-dim
    (or any-dim) vector — zero shuffle, whole-stage codegen, no Python.
    float→double casts and the x/scale divisions are exact-input IEEE
    ops, so the 8dp-rounded doubles hash identically across engines."""
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    max_abs = F.array_max(F.transform(x, F.abs))
    scale = (max_abs / F.lit(127.0)).alias("_scale")
    d = df.select(F.col(id_col).alias("vec_id"),
                  F.size(vec_col).cast("long").alias("dim"),
                  x.alias("_x"), scale)
    codes = F.transform(
        F.col("_x"),
        lambda v: F.when(F.col("_scale") > 0,
                         F.greatest(F.lit(-127.0),
                                    F.least(F.lit(127.0),
                                            F.round(v / F.col("_scale")))))
        .otherwise(F.lit(0.0)))
    err = F.zip_with(F.col("_x"), codes,
                     lambda v, c: F.abs(v - c * F.col("_scale")))
    return d.select(
        "vec_id", "dim",
        F.round(F.col("_scale"), round_digits).alias("scale"),
        F.when(F.col("dim") > 0,
               F.round(F.aggregate(err, F.lit(0.0),
                                   lambda acc, e: acc + e * e)
                       / F.col("dim"), round_digits))
        .otherwise(0.0).alias("mse"),
        F.round(F.coalesce(F.array_max(err), F.lit(0.0)),
                round_digits).alias("max_err"),
    )


def split_embedding_drift(df: DataFrame, weights: dict[str, float],
                          id_col: str = "vec_id",
                          vec_col: str = "embedding", seed: int = 7,
                          round_digits: int = 6) -> DataFrame:
    """(split_a, split_b, cosine, l2_dist) between the per-split mean
    embeddings under the engine's deterministic hash split — the
    covariate-shift pre-flight: a train/val/test split whose centroids
    drift apart ships a distribution mismatch into every eval number
    downstream (the embedding-space sibling of split_leakage's
    duplicate check).

    Per-split means are one posexplode + (split, idx) partial agg; the
    centroid table is tiny (n_splits × dim rows), so the pairwise
    cosine/L2 is a broadcast-scale self-join. Outputs rounded."""
    from credigraph_spark.pipeline.sampling import hash_split

    sp = hash_split(df.select(id_col, vec_col), [id_col], weights, seed)
    comp = (sp.select("split", F.posexplode(vec_col).alias("i", "x"))
            .groupBy("split", "i")
            .agg(F.avg(F.col("x").cast("double")).alias("m")))
    a = comp.select(F.col("split").alias("split_a"), "i",
                    F.col("m").alias("ma"))
    b = comp.select(F.col("split").alias("split_b"), "i",
                    F.col("m").alias("mb"))
    return (a.join(b, "i")
            .where(F.col("split_a") < F.col("split_b"))
            .groupBy("split_a", "split_b")
            .agg(
                F.round(
                    F.sum(F.col("ma") * F.col("mb"))
                    / (F.sqrt(F.sum(F.col("ma") * F.col("ma")))
                       * F.sqrt(F.sum(F.col("mb") * F.col("mb")))),
                    round_digits).alias("cosine"),
                F.round(F.sqrt(F.sum(
                    (F.col("ma") - F.col("mb"))
                    * (F.col("ma") - F.col("mb")))),
                    round_digits).alias("l2_dist")))


def knn_graph(df: DataFrame, k: int = 5, id_col: str = "vec_id",
              vec_col: str = "embedding", bits_per_table: int = 4,
              n_tables: int = 6, seed: int = 7) -> DataFrame:
    """k-nearest-neighbour GRAPH over an embedding corpus — the
    precursor every semantic-clustering / SemDedup / label-spreading
    pipeline builds first. Directed edges u -> its k nearest
    neighbours (LSH-bucketed candidates, so construction never goes
    all-pairs), plus the ``mutual`` flag (v also has u in ITS top-k)
    that mutual-kNN clustering prunes on.

    Same determinism contract as lsh_bucketed_topk: md5-derived ±1
    hyperplanes and round(cosine, 6) ranking with a neighbor-id
    tie-break, so the whole graph — including the mutuality flags —
    is bit-reproducible in the SQL oracle.

    Scale shape: bucket join (2^bits fan-in per table) -> per-pair one
    dot product -> per-query top-k window over candidate rows only;
    the mutual flag is ONE self-join of the k·n-row result keyed on
    (u, v). Returns (u, v, rank, mutual)."""
    topk = lsh_bucketed_topk(df, df, k=k, id_col=id_col, vec_col=vec_col,
                             bits_per_table=bits_per_table,
                             n_tables=n_tables, seed=seed,
                             round_digits=6)
    fwd = topk.select(F.col("query_id").alias("u"),
                      F.col("neighbor_id").alias("v"), "rank")
    rev = topk.select(F.col("neighbor_id").alias("u"),
                      F.col("query_id").alias("v"),
                      F.lit(True).alias("_m"))
    return (fwd.join(rev, ["u", "v"], "left")
            .select("u", "v", "rank",
                    F.coalesce("_m", F.lit(False)).alias("mutual")))


def semdedup(df: DataFrame, k: int = 8, iters: int = 2,
             threshold: float = 0.95, id_col: str = "vec_id",
             vec_col: str = "embedding", seed: int = 7) -> DataFrame:
    """SemDedup (Abbas et al. 2023): semantic deduplication by
    embedding — cluster the corpus with deterministic k-means, compare
    cosines only WITHIN each cluster, and greedily drop the larger-id
    member of every pair above ``threshold`` (the deterministic stand-in
    for the paper's epsilon-ball representative pick). The composition
    that made semantic dedup tractable at web scale: the pair join is
    bounded by cluster size, never corpus², with k scaled so clusters
    stay O(corpus/k).

    Every stage is the engine's bit-replayable construction (md5-seeded
    centroids, quantized Lloyd means, 6dp cosines), so cluster
    assignments AND keep flags oracle-check exactly.

    Returns (vec_id, cluster, keep) for every input vector."""
    from credigraph_spark.pipeline.ivf import kmeans_assign

    asg = (kmeans_assign(df, k=k, iters=iters, id_col=id_col,
                         vec_col=vec_col, seed=seed)
           .select(F.col("id").alias("vec_id"),
                   F.col("list_id").alias("cluster"))
           .persist())
    # ||v|| once per vector (|V| folds), carried through the cluster
    # pair join — the O(cluster²) per-pair work is one dot fold instead
    # of three (bit-identical value, guide §2.3)
    vecs = df.select(F.col(id_col).alias("vec_id"),
                     F.col(vec_col).alias("_v"),
                     _norm(F.col(vec_col)).alias("_n"))
    av = asg.join(vecs, "vec_id")
    pairs = (av.select(F.col("vec_id").alias("u"), "cluster",
                       F.col("_v").alias("_vu"), F.col("_n").alias("_nu"))
             .join(av.select(F.col("vec_id").alias("w"),
                             F.col("cluster").alias("cluster2"),
                             F.col("_v").alias("_vw"),
                             F.col("_n").alias("_nw")),
                   (F.col("cluster") == F.col("cluster2"))
                   & (F.col("u") < F.col("w")))
             .select("u", "w",
                     F.round(_dot(F.col("_vu"), F.col("_vw"))
                             / (F.col("_nu") * F.col("_nw")),
                             6).alias("cos")))
    # Materialize the (u, w, cos) pair table BEFORE the threshold filter:
    # otherwise Catalyst pushes `round(cos) >= threshold` into the
    # cluster-equi join CONDITION, and the zip_with/aggregate cosine (a
    # higher-order function, no codegen) is then interpreted per candidate
    # pair inside the join — measured 4.8 s vs 0.4 s for the identical
    # pair set at bench scale. The checkpoint keeps the join equi-only and
    # the cosine a post-join projection; only (u, w, cos) rows are stored.
    pairs = pairs.transform(eager_checkpoint)
    dropped = (pairs.where(F.col("cos") >= threshold)
               .select(F.col("w").alias("vec_id")).distinct()
               .withColumn("_d", F.lit(True)))
    out = (asg.join(dropped, "vec_id", "left")
           .select("vec_id", "cluster",
                   F.coalesce(~F.col("_d"), F.lit(True)).alias("keep")))
    out = out.transform(eager_checkpoint)
    asg.unpersist()
    return out


def lsh_multiprobe_topk(queries: DataFrame, candidates: DataFrame,
                        k: int = 5, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        bits_per_table: int = 4, n_tables: int = 6,
                        seed: int = 7,
                        round_digits: int = 6) -> DataFrame:
    """Multi-probe LSH top-k (Lv et al. 2007): each QUERY probes its
    exact bucket AND every 1-bit-flip neighbour bucket per table —
    near-miss vectors that landed one hyperplane away become candidates
    without adding tables. Recall rises toward brute-force at the cost
    of (1 + bits_per_table)× more probe rows on the QUERY side only;
    the candidate index is untouched, which is the whole point at
    100 TB (the corpus is bucketed once, probing effort is a per-query
    knob).

    Same md5 hyperplanes and rounded-cosine ranking as
    lsh_bucketed_topk, so the result — including which candidates the
    probes reach — replays bit-identically in SQL.

    Returns (query_id, neighbor_id, rank)."""
    udf = _hyperplane_bits_udf(bits_per_table, n_tables, seed)

    def with_buckets(df, id_alias, vec_alias, norm_alias):
        vc = F.col(vec_col)
        # ||v|| once per input row, before the bucket fan-out
        return (
            df.where(vc.isNotNull() & (F.size(vc) > 0))
            .select(F.col(id_col).alias(id_alias), vc.alias(vec_alias),
                    _norm(vc).alias(norm_alias), udf(vc).alias("bk"))
            .select(id_alias, vec_alias, norm_alias,
                    F.posexplode("bk").alias("table_idx", "bucket"))
        )

    q = with_buckets(queries, "query_id", "qv", "_qn")
    # probe set: the bucket itself plus every 1-bit flip
    flips = F.expr(
        f"concat(array(bucket), transform(sequence(0, {bits_per_table - 1}), "
        f"j -> cast(bucket ^ shiftleft(1L, j) as long)))")
    q = q.select("query_id", "qv", "_qn", "table_idx",
                 F.explode(flips).alias("bucket"))
    c = with_buckets(candidates, "neighbor_id", "cv", "_cn")
    pairs = (
        q.join(c, ["table_idx", "bucket"])
        .select("query_id", "qv", "_qn", "neighbor_id", "cv", "_cn")
        .dropDuplicates(["query_id", "neighbor_id"])
        .where(F.col("query_id") != F.col("neighbor_id"))
    )
    scored = pairs.select(
        "query_id", "neighbor_id",
        (_dot(F.col("qv"), F.col("cv"))
         / (F.col("_qn") * F.col("_cn"))).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(
        F.round("cosine", round_digits).desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank"))


def mrl_truncation_audit(df: DataFrame, dims: tuple[int, ...] = (8, 16, 32),
                         k: int = 10, n_queries: int = 10,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Matryoshka truncation audit (X216; Kusupati et al. 2022 MRL):
    how much ANN quality survives when embeddings are truncated to
    their first d dimensions — the storage/recall dial every
    MRL-trained embedding deployment tunes. For each d in ``dims``,
    recall@k of the truncated-vector exact top-k against the
    full-dimension exact top-k over the deterministic
    ``n_queries``-smallest-id query set.

    Returns one row per dim: (dim, n_queries, k, total_hits, recall)
    with recall = total_hits / (n_queries*k) — hit counts are INTEGER,
    so the replay is exact (rank ordering uses the engine's
    round(cosine, 6) stable knob).

    Scale shape: one broadcast-queries crossJoin top-k per dim over the
    SLICED vectors (d floats/row instead of D — truncation cuts the
    scan, which is the whole MRL point); the recall join is top-k rows
    only.
    """
    emb = df.select(F.col(id_col).alias("vid"),
                    F.col(vec_col).cast("array<double>").alias("v"))
    qids = emb.select("vid").orderBy("vid").limit(n_queries)
    full_q = emb.join(qids, "vid", "left_semi")
    exact = cosine_topk_bruteforce(
        full_q.select(F.col("vid").alias(id_col),
                      F.col("v").alias(vec_col)),
        emb.select(F.col("vid").alias(id_col), F.col("v").alias(vec_col)),
        k=k, round_digits=6).select("query_id", "neighbor_id")

    nq = qids.agg(F.count("*").cast("long").alias("n_queries"))
    rows = None
    for d in dims:
        trunc = emb.select("vid", F.slice("v", 1, int(d)).alias("v"))
        tq = trunc.join(qids, "vid", "left_semi")
        topd = cosine_topk_bruteforce(
            tq.select(F.col("vid").alias(id_col),
                      F.col("v").alias(vec_col)),
            trunc.select(F.col("vid").alias(id_col),
                         F.col("v").alias(vec_col)),
            k=k, round_digits=6)
        hits = (topd.join(exact, ["query_id", "neighbor_id"], "left_semi")
                .agg(F.count("*").cast("long").alias("total_hits")))
        row = (hits.crossJoin(nq)
               .select(F.lit(int(d)).cast("long").alias("dim"),
                       "n_queries", F.lit(int(k)).cast("long").alias("k"),
                       "total_hits",
                       F.round(F.col("total_hits")
                               / (F.col("n_queries") * k), 6)
                       .alias("recall")))
        rows = row if rows is None else rows.unionByName(row)
    return rows


def jl_distortion_audit(df: DataFrame, dims=(8, 16, 32),
                        id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        sample_pred=None, seed: int = 7,
                        round_digits: int = 6) -> DataFrame:
    """Johnson-Lindenstrauss distortion audit (X233): project the
    embeddings to each target dim k with the engine's deterministic
    md5 ±1 sign family (_md5_sign_planes — a valid Achlioptas-style
    JL map), and measure, over all pairs of a deterministic sample,
    the ratio of the projected squared L2 distance estimate
    ((1/k)·Σ_b y_b²) to the exact 64-d distance. The storage/recall
    dial below X216's MRL truncation: MRL keeps a PREFIX the encoder
    was trained to order, JL works on any vectors but pays the
    1±O(sqrt(log n / k)) distortion this audit measures — run it
    before deciding how many dims the ANN tier actually needs.

    Returns one row per k: (k, n_pairs, mean_ratio, min_ratio,
    max_ratio, within_30pct) — within_30pct = share of pairs whose
    rounded ratio lies in [0.7, 1.3].

    Scale shape: the k projections are pure per-row fold expressions
    over literal sign arrays (k x 64 multiply-adds inside codegen, no
    shuffle, no UDF); only the audit's pair join is quadratic and it
    runs on the small deterministic sample — the projection itself is
    the 100 TB path.
    """
    import numpy as np  # noqa: F401  (signs come back as ndarray)

    if sample_pred is None:
        sample_pred = F.col(id_col) < 40
    dim = 64
    proj_cols = []
    for k in dims:
        signs = _md5_sign_planes(dim, k, seed)   # (dim, k)
        comps = []
        for b in range(k):
            arr = ", ".join(
                f"{'1.0' if signs[d, b] > 0 else '-1.0'}D"
                for d in range(dim))
            comps.append(
                f"aggregate(zip_with({vec_col}, array({arr}), "
                f"(x, s) -> cast(x as double) * s), 0D, "
                f"(acc, v) -> acc + v)")
        proj_cols.append(F.expr("array(" + ", ".join(comps) + ")")
                         .alias(f"_y{k}"))
    s = (df.where(sample_pred)
         .select(F.col(id_col).alias("_id"),
                 F.col(vec_col).alias("_v"), *proj_cols))
    a = s.select(*[F.col(c).alias(c + "_a") for c in s.columns])
    b = s.select(*[F.col(c).alias(c + "_b") for c in s.columns])
    pairs = a.join(b, F.col("_id_a") < F.col("_id_b"))

    def d2(ca, cb):
        return F.expr(
            f"aggregate(zip_with({ca}, {cb}, "
            f"(x, y) -> (cast(x as double) - cast(y as double)) "
            f"* (cast(x as double) - cast(y as double))), 0D, "
            f"(acc, v) -> acc + v)")

    ratio_structs = [
        F.struct(F.lit(int(k)).cast("long").alias("k"),
                 F.round(d2(f"_y{k}_a", f"_y{k}_b") / F.lit(float(k))
                         / d2("_v_a", "_v_b"), round_digits)
                 .alias("ratio")) for k in dims]
    long = (pairs.select(F.explode(F.array(*ratio_structs)).alias("r"))
            .select(F.col("r.k").alias("k"),
                    F.col("r.ratio").alias("ratio")))
    return (long.groupBy("k")
            .agg(F.count("*").cast("long").alias("n_pairs"),
                 F.round(F.avg("ratio"), round_digits)
                 .alias("mean_ratio"),
                 F.min("ratio").alias("min_ratio"),
                 F.max("ratio").alias("max_ratio"),
                 F.round(F.sum(((F.col("ratio") >= 0.7)
                                & (F.col("ratio") <= 1.3))
                               .cast("long")) / F.count("*"),
                         round_digits).alias("within_30pct")))


def reclist_quality(queries: DataFrame, candidates: DataFrame,
                    k: int = 5, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    round_digits: int = 6) -> DataFrame:
    """Recommendation-list quality metrics (X257): given the exact
    top-k neighbor lists (round-6-stable ranking, the X33 baseline),
    report the three health numbers every retrieval/recs surface is
    judged on beyond accuracy — CATALOG COVERAGE (distinct items
    recommended / catalog size: a high-accuracy system that only ever
    surfaces 2% of the catalog is a popularity loop), CONCENTRATION
    (share of all recommendation slots owned by the 10
    most-recommended items), and INTRA-LIST DIVERSITY (1 − mean
    pairwise cosine within each list, averaged: near-duplicate lists
    score ~0). Run it whenever an ANN index or embedding changes.

    Returns ONE row: (n_queries, k, catalog_size, coverage,
    top10_share, mean_ild).

    Scale shape: the list metrics run on the top-k OUTPUT (n_queries
    x k rows) — the pairwise-within-list join is k² per query, never
    corpus-quadratic; coverage/concentration are two bounded
    groupBys. Use an ANN tier's lists in place of the brute-force
    baseline at scale; the metric layer is identical.
    """
    top = cosine_topk_bruteforce(queries, candidates, k=k,
                                 id_col=id_col, vec_col=vec_col,
                                 round_digits=round_digits)
    nq = top.select("query_id").distinct().count()
    catalog = candidates.select(F.col(id_col)).distinct().count()
    per_item = (top.groupBy("neighbor_id")
                .agg(F.count("*").alias("n")))
    cov = per_item.count()
    top10 = (per_item.orderBy(F.desc("n"), F.asc("neighbor_id"))
             .limit(10).agg(F.sum("n")).collect()[0][0] or 0)
    total_slots = nq * k
    vecs = candidates.select(F.col(id_col).alias("neighbor_id"),
                             F.col(vec_col).alias("v"),
                             _norm(F.col(vec_col)).alias("n"))
    lists = top.join(vecs, "neighbor_id").select("query_id",
                                                 "neighbor_id", "v", "n")
    a = lists.select("query_id", F.col("neighbor_id").alias("ia"),
                     F.col("v").alias("va"), F.col("n").alias("_na"))
    b = lists.select("query_id", F.col("neighbor_id").alias("ib"),
                     F.col("v").alias("vb"), F.col("n").alias("_nb"))
    pair = (a.join(b, "query_id")
            .where(F.col("ia") < F.col("ib"))
            .select((_dot(F.col("va"), F.col("vb"))
                     / (F.col("_na") * F.col("_nb"))).alias("c")))
    ild = pair.agg(F.round(1.0 - F.avg("c"), round_digits)) \
        .collect()[0][0]
    spark = queries.sparkSession
    # with k = 1 (or every list of length 1) there are no intra-list
    # pairs: avg is NULL — propagate NULL mean_ild exactly like the SQL
    # oracle's AVG-over-empty instead of raising on float(None)
    return spark.createDataFrame(
        [(nq, k, catalog, round(cov / catalog, round_digits),
          round(top10 / total_slots, round_digits),
          float(ild) if ild is not None else None)],
        "n_queries LONG, k LONG, catalog_size LONG, coverage DOUBLE, "
        "top10_share DOUBLE, mean_ild DOUBLE")
