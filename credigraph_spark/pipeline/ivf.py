"""IVF (inverted-file) approximate nearest-neighbour search.

The scale path complementary to random-hyperplane LSH
(``similarity.lsh_bucketed_topk``): partition the candidate corpus into
``n_lists`` Voronoi cells around coarse centroids, then answer each query
by scanning only its ``nprobe`` nearest cells — cost drops from O(|C|)
to ~O(|C| * nprobe / n_lists) dot products per query.

Spark-first shape (designed for 100 TB):

* the centroid table is tiny (``n_lists`` rows) and is **broadcast**; the
  assignment "cross join" is a broadcast nested loop that streams the
  candidate table exactly once — no shuffle of the corpus;
* the per-vector argmax over centroids is a ``groupBy(id).agg(max(struct))``
  whose input is clustered by id (every id×centroid row is produced in the
  same task), so map-side partial aggregation collapses it to one row per
  vector before any shuffle;
* the probe join shuffles on ``list_id`` — O(|C|/cluster) rows, never
  all-pairs; a candidate belongs to exactly one list so no pair dedup is
  needed;
* for large ``n_lists`` the SQL argmax degrades (n_lists rows per vector);
  ``assign_method='matmul'`` switches to one numpy matmul + argmax per
  Arrow batch against the broadcast centroid matrix (one-time setup
  collect of the tiny centroid table, never per-row Python).

Determinism / oracle-ability: centroids are seeded by md5 order
(k-means||-style seeding without the Lloyd refinement), every ranking
orders by ``round(cosine, round_digits)`` then id, and both the seeding
and the fold-order of the dot products are reproducible in any SQL engine
with md5 — so the whole ``ivf_topk`` plan has a bit-exact DuckDB oracle
(see ``__spark_entry__._ann_ivf_sql``). Optional ``refine_iters`` runs
Lloyd iterations for better cell balance at scale (recall-gated in
pytest rather than oracle-checked: mean-vector summation order is not
portable across engines).

Reference scope: the reference repo (ekmpa/CrediGraph) has no ANN; this
module is part of the training-data-pipeline surface layered on top of
the link-graph engine.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import IntegerType
from pyspark.sql.window import Window

from .similarity import cosine_similarity

from credigraph_spark.session import eager_checkpoint


def seed_centroids(candidates: DataFrame, n_lists: int,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   seed: int = 7) -> DataFrame:
    """(list_id, centroid) — ``n_lists`` deterministic seed centroids:
    the candidate vectors whose ``md5(seed || ':' || id)`` sort first
    (ties by id). Equivalent to the sampling step of k-means|| with a
    hash in place of the RNG, which makes it replayable in SQL."""
    key = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    # orderBy().limit() compiles to TakeOrderedAndProject — a distributed
    # per-partition top-n + driver merge, NOT a global sort; the window
    # that numbers the lists only ever sees the n_lists-row result.
    picked = (
        candidates
        .select(F.col(id_col).alias("_cid"), F.col(vec_col).alias("centroid"), key.alias("_k"))
        .orderBy(F.col("_k").asc(), F.col("_cid").asc())
        .limit(n_lists)
    )
    # constant partition key: only the n_lists-row result is ranked; a
    # non-empty spec avoids WindowExec's single-partition warning
    w = Window.partitionBy(F.lit(0)).orderBy(F.col("_k").asc(), F.col("_cid").asc())
    return (
        picked.withColumn("list_id", F.row_number().over(w))
        .select("list_id", "centroid")
    )


def refine_centroids(candidates: DataFrame, centroids: DataFrame,
                     iters: int = 2, id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Lloyd refinement: ``iters`` rounds of assign-to-nearest +
    per-list mean. Each round is one broadcast assignment plus one
    groupBy(list_id) mean over zipped arrays — O(|C|) work, n_lists-row
    shuffle. Empty lists keep their previous centroid."""
    for _ in range(iters):
        assigned = assign_lists(candidates, centroids, id_col=id_col, vec_col=vec_col)
        dim_means = (
            assigned
            .select("list_id", F.posexplode(F.col("v")).alias("d", "x"))
            .groupBy("list_id", "d").agg(F.avg("x").alias("m"))
            .groupBy("list_id")
            .agg(F.array_sort(F.collect_list(F.struct("d", "m"))).alias("dm"))
            .select("list_id", F.transform("dm", lambda s: s["m"]).alias("new_centroid"))
        )
        centroids = (
            centroids.join(dim_means, "list_id", "left")
            .select("list_id",
                    F.coalesce("new_centroid", "centroid").alias("centroid"))
        )
    return centroids


def refine_centroids_exact(candidates: DataFrame, centroids: DataFrame,
                           iters: int = 1, id_col: str = "vec_id",
                           vec_col: str = "embedding",
                           round_digits: int = 6) -> DataFrame:
    """Lloyd refinement with ORDER-INDEPENDENT means: member inputs are
    quantized to 1e-9 (``floor(x·1e9)``), summed exactly as decimals,
    with one double division at the end — bit-identical under any
    partitioning and replayable in SQL, unlike :func:`refine_centroids`'
    raw float means (recall-gated only). The same construction as
    ``pq.refine_codebooks``, applied to whole vectors: it upgrades
    k-means itself to an oracle-checkable operator (see
    ``__spark_entry__._kmeans_sql``). Empty cells keep their previous
    centroid. Per iteration: one broadcast assignment over the corpus,
    one integer-sum groupBy(list_id, d) — n_lists·dim result rows — and
    a tiny rebuild join; the n_lists-row state is eager-localCheckpointed
    (it feeds two consumers next iteration)."""
    for _ in range(iters):
        assigned = assign_lists(candidates, centroids, id_col=id_col,
                                vec_col=vec_col, round_digits=round_digits)
        comp = (
            assigned.select("list_id", F.posexplode("v").alias("d", "x"))
            .withColumn("sx", F.floor(F.col("x") * 1e9).cast("decimal(38,0)"))
            .groupBy("list_id", "d")
            .agg((F.sum("sx").cast("double")
                  / F.count(F.lit(1)).cast("double") / F.lit(1e9))
                 .alias("cmp"))
        )
        newc = (
            comp.groupBy("list_id")
            .agg(F.array_sort(F.collect_list(F.struct("d", "cmp"))).alias("dm"))
            .select("list_id",
                    F.transform("dm", lambda s: s["cmp"]).alias("nc"))
        )
        centroids = (
            centroids.join(newc, "list_id", "left")
            .select("list_id", F.coalesce("nc", "centroid").alias("centroid"))
            .transform(eager_checkpoint)
        )
    return centroids


def kmeans_assign(df: DataFrame, k: int = 8, iters: int = 2,
                  id_col: str = "vec_id", vec_col: str = "embedding",
                  seed: int = 7, round_digits: int = 6) -> DataFrame:
    """(id, list_id) — deterministic k-means clustering of an embedding
    corpus: md5-seeded centroids, ``iters`` exact quantized-mean Lloyd
    iterations, final nearest-centroid assignment by 6dp-rounded cosine
    (ties to the smaller list_id). Every step replays bit-identically in
    SQL, so the full clustering is oracle-checked — the training-data
    use case is corpus sharding / topic bucketing ahead of per-cluster
    sampling."""
    cents = seed_centroids(df, k, id_col, vec_col, seed)
    cents = refine_centroids_exact(df, cents, iters=iters, id_col=id_col,
                                   vec_col=vec_col,
                                   round_digits=round_digits)
    return assign_lists(df, cents, id_col=id_col, vec_col=vec_col,
                        round_digits=round_digits).select("id", "list_id")


def _centroid_cosines(df: DataFrame, centroids: DataFrame,
                      id_col: str, vec_col: str,
                      round_digits: int) -> DataFrame:
    """(id, v, list_id, c) — every vector × every centroid with the
    rounded cosine. Broadcast nested loop; no corpus shuffle. ||v|| is
    computed once per vector and ||centroid|| once per (broadcast)
    centroid, so each of the n_lists rows per vector pays one dot fold
    instead of three array folds (bit-identical value)."""
    from .similarity import _dot, _norm

    cents = centroids.select("list_id", "centroid",
                             _norm(F.col("centroid")).alias("_cn"))
    return (
        df.where(F.col(vec_col).isNotNull() & (F.size(vec_col) > 0))
        .select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                _norm(F.col(vec_col)).alias("_vn"))
        .crossJoin(F.broadcast(cents))
        .select("id", "v", "list_id",
                F.round(_dot(F.col("v"), F.col("centroid"))
                        / (F.col("_vn") * F.col("_cn")),
                        round_digits).alias("c"))
    )


def assign_lists(df: DataFrame, centroids: DataFrame,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 round_digits: int = 6,
                 assign_method: str = "sql") -> DataFrame:
    """(id, v, list_id) — each vector's single nearest centroid by
    cosine (ties: smallest list_id).

    ``assign_method='sql'`` — struct-max argmax, map-side combinable,
    whole plan JVM-side. ``'matmul'`` — one numpy matmul + argmax per
    Arrow batch against the collected centroid matrix; use when
    ``n_lists`` is large enough (thousands) that emitting n_lists rows
    per vector dominates."""
    if assign_method == "matmul":
        return _assign_lists_matmul(df, centroids, id_col, vec_col, round_digits)
    scored = _centroid_cosines(df, centroids, id_col, vec_col, round_digits)
    # group by id only (not the array) so the shuffle key is narrow; every
    # row of an id carries the same v, so first(v) is deterministic.
    return (
        scored
        .groupBy("id")
        .agg(F.max(F.struct(F.col("c"), (-F.col("list_id")).alias("nl"))).alias("best"),
             F.first("v").alias("v"))
        .select("id", "v", (-F.col("best.nl")).alias("list_id"))
    )


def _assign_lists_matmul(df: DataFrame, centroids: DataFrame,
                         id_col: str, vec_col: str,
                         round_digits: int = 6) -> DataFrame:
    """Vectorized assignment: centroids are a tiny table — collect ONCE
    at plan-build time (setup action, like a broadcast variable), L2-
    normalize into a (n_lists, dim) matrix, then per Arrow batch one
    (m, dim) @ (dim, n_lists) matmul + argmax. No per-row Python.

    Similarities are rounded to ``round_digits`` before the argmax and
    rows are ordered by list_id, so tie-breaking (smallest list_id wins)
    matches the SQL struct-max path bit-for-bit — the two assign methods
    are interchangeable without changing cell assignment (ADVICE r3)."""
    rows = centroids.orderBy("list_id").collect()
    list_ids = np.array([r["list_id"] for r in rows], dtype=np.int64)
    cmat = np.stack([np.asarray(r["centroid"], dtype=np.float64) for r in rows])
    cmat = cmat / np.linalg.norm(cmat, axis=1, keepdims=True)

    @F.pandas_udf(IntegerType())
    def _nearest(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy()).astype(np.float64)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        sims = np.round(mat @ cmat.T, round_digits)  # (m, n_lists)
        # np.argmax keeps the FIRST max; list_ids ascending -> smallest id
        return pd.Series(list_ids[np.argmax(sims, axis=1)].astype(np.int32))

    return (
        df.where(F.col(vec_col).isNotNull() & (F.size(vec_col) > 0))
        .select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .withColumn("list_id", _nearest(F.col("v")))
    )


def ivf_topk(queries: DataFrame, candidates: DataFrame, k: int = 5,
             n_lists: int = 8, nprobe: int = 3,
             id_col: str = "vec_id", vec_col: str = "embedding",
             seed: int = 7, refine_iters: int = 0,
             exclude_self: bool = True, round_digits: int = 6,
             assign_method: str = "sql") -> DataFrame:
    """(query_id, neighbor_id, cosine, rank) — approximate top-k per
    query scanning only the ``nprobe`` nearest of ``n_lists`` inverted
    lists. Recall grows with nprobe (nprobe = n_lists is exact)."""
    cents = seed_centroids(candidates, n_lists, id_col, vec_col, seed)
    if refine_iters:
        cents = refine_centroids(candidates, cents, refine_iters, id_col, vec_col)
    from .similarity import _dot, _norm

    cand = (assign_lists(candidates, cents, id_col, vec_col, round_digits,
                         assign_method).withColumnRenamed("id", "neighbor_id")
            .withColumnRenamed("v", "cv")
            # ||cv|| once per candidate, before the probe join fans each
            # candidate out to every query probing its list
            .withColumn("_cn", _norm(F.col("cv"))))
    # queries are small by construction: a window over query_id is fine
    qs = _centroid_cosines(queries, cents, id_col, vec_col, round_digits)
    wq = Window.partitionBy("id").orderBy(F.col("c").desc(), F.col("list_id").asc())
    qprobe = (
        qs.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= nprobe)
        .select(F.col("id").alias("query_id"), F.col("v").alias("qv"),
                _norm(F.col("v")).alias("_qn"), "list_id")
    )
    pairs = qprobe.join(cand, "list_id").select(
        "query_id", "qv", "_qn", "neighbor_id", "cv", "_cn")
    if exclude_self:
        pairs = pairs.where(F.col("query_id") != F.col("neighbor_id"))
    scored = pairs.select(
        "query_id", "neighbor_id",
        (_dot(F.col("qv"), F.col("cv"))
         / (F.col("_qn") * F.col("_cn"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.round("cosine", round_digits).desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def kmeans_silhouette(df: DataFrame, k: int = 8, iters: int = 2,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      seed: int = 7, round_digits: int = 6) -> DataFrame:
    """(list_id, n, mean_silhouette) — simplified (centroid-based)
    silhouette of the deterministic k-means clustering: per vector
    s = (c_own − c_best_other) / max(1−c_own, 1−c_best_other) over the
    6dp-rounded centroid cosines (a/b distances = 1−cosine), rolled up
    per cluster. The clustering-quality gate that tells you whether the
    corpus shards (X64's assignment) mean anything — near 0/negative
    clusters are noise buckets. Centroid-based silhouette costs
    O(n·k) (the assignment pass already pays it), not the O(n²) of the
    classic definition — the only silhouette that exists at corpus
    scale. Identical training chain to kmeans_assign, so the whole
    metric replays in SQL."""
    cents = seed_centroids(df, k, id_col, vec_col, seed)
    cents = refine_centroids_exact(df, cents, iters=iters, id_col=id_col,
                                   vec_col=vec_col,
                                   round_digits=round_digits)
    scored = _centroid_cosines(df, cents, id_col, vec_col, round_digits) \
        .select("id", "list_id", "c").transform(eager_checkpoint)
    asg = (scored.groupBy("id")
           .agg(F.max(F.struct(F.col("c"),
                               (-F.col("list_id")).alias("nl")))
                .alias("best"))
           .select("id", (-F.col("best.nl")).alias("own")))
    per = (scored.join(asg, "id")
           .groupBy("id", "own")
           .agg(F.max(F.when(F.col("list_id") == F.col("own"),
                             F.col("c"))).alias("co"),
                F.max(F.when(F.col("list_id") != F.col("own"),
                             F.col("c"))).alias("cb")))
    denom = F.greatest(F.lit(1.0) - F.col("co"), F.lit(1.0) - F.col("cb"))
    s = F.when(denom > 0,
               (F.col("co") - F.col("cb")) / denom).otherwise(F.lit(0.0))
    return (per.select(F.col("own").alias("list_id"), s.alias("s"))
            .groupBy("list_id")
            .agg(F.count("*").alias("n"),
                 F.round(F.avg("s"), round_digits)
                 .alias("mean_silhouette")))


def ivf_nprobe_sweep(queries: DataFrame, candidates: DataFrame,
                     nprobes: tuple[int, ...] = (1, 2, 4, 8),
                     k: int = 5, n_lists: int = 8, seed: int = 7,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """IVF nprobe tuning curve (X222) — the recall-vs-cost dial every
    IVF deployment sets: recall@k of ``ivf_topk`` against the exact
    brute-force top-k at each probe count (nprobe = n_lists is exact by
    construction, so the curve must end at recall 1.0 — a built-in
    self-check). The FAISS benchmark ritual as a first-class relational
    operator.

    Returns one row per nprobe: (nprobe, n_queries, k, total_hits,
    recall) — integer hit counts, exact replay (both rankings use the
    round(cosine, 6) stable ordering).

    Scale shape: the exact baseline is ONE broadcast-queries crossJoin
    (the documented small-q oracle path); each sweep point scans only
    its nprobe cells; the recall join touches top-k rows only.
    """
    from credigraph_spark.pipeline.similarity import cosine_topk_bruteforce

    exact = cosine_topk_bruteforce(queries, candidates, k=k,
                                   id_col=id_col, vec_col=vec_col,
                                   round_digits=6) \
        .select("query_id", "neighbor_id")
    nq = queries.agg(F.countDistinct(id_col).cast("long")
                     .alias("n_queries"))
    rows = None
    for p in nprobes:
        approx = ivf_topk(queries, candidates, k=k, n_lists=n_lists,
                          nprobe=p, seed=seed, id_col=id_col,
                          vec_col=vec_col, round_digits=6) \
            .select("query_id", "neighbor_id")
        hits = (approx.join(exact, ["query_id", "neighbor_id"],
                            "left_semi")
                .agg(F.count("*").cast("long").alias("total_hits")))
        row = (hits.crossJoin(nq)
               .select(F.lit(int(p)).cast("long").alias("nprobe"),
                       "n_queries",
                       F.lit(int(k)).cast("long").alias("k"),
                       "total_hits",
                       F.round(F.col("total_hits")
                               / (F.col("n_queries") * k), 6)
                       .alias("recall")))
        rows = row if rows is None else rows.unionByName(row)
    return rows
