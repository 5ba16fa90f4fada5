"""Neighborhood-overlap link prediction: common neighbors, Jaccard,
Adamic-Adar.

Not in the reference; the natural "what edge comes next" companion to its
link-graph analytics (the CrediBench use case scores domain credibility —
predicting likely-but-absent links is the same co-citation machinery as
its score joins, `txt_to_csv_sqlite.py:206-275`, applied to topology).

Semantics (standard, networkx-compatible, over the cleaned UNDIRECTED
graph):

    CN(u,v)  = |N(u) ∩ N(v)|
    J(u,v)   = |N(u) ∩ N(v)| / |N(u) ∪ N(v)|
    AA(u,v)  = Σ_{w ∈ N(u)∩N(v)} 1 / ln(deg(w))

scored for candidate pairs u < v with ≥1 common neighbor and (u,v) NOT an
existing edge (the link-prediction target set).

Scale shape: one two-path self-join through the shared neighbor
(exactly the triangle join's wedge enumeration) → groupBy(u, v) with
map-side-combinable count/sum aggregates; existing edges removed with a
left-anti join on the same (src, dst) hash partitioning. A neighbor of
degree d emits d·(d-1)/2 wedges, so hubs dominate cost quadratically:
``max_neighbor_degree`` drops wedge CENTERS above the cap (standard
top-degree truncation; scores through dropped hubs are the least
informative — 1/ln(deg) → 0 — and the cap is the knob that bounds the
shuffle at 100 TB). Degrees deg(w) are computed BEFORE the cap so
retained scores are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from credigraph_spark.graph.adjacency import clean_edges

from credigraph_spark.session import eager_checkpoint


def link_prediction_scores(
    edges: DataFrame, max_neighbor_degree: int | None = None
) -> DataFrame:
    """(u, v, common_neighbors, jaccard, adamic_adar) for all non-adjacent
    pairs u < v with at least one common neighbor (subject to the wedge-
    center degree cap)."""
    e = clean_edges(edges)
    und = (
        e.select("src", "dst")
        .unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .dropDuplicates(["src", "dst"])
    )
    deg = und.groupBy(F.col("src").alias("w")).agg(F.count("*").alias("deg"))
    # incidence (w, n): neighbor n of wedge-center w, with w's exact degree
    inc = und.select(F.col("src").alias("w"), F.col("dst").alias("n")).join(deg, "w")
    if max_neighbor_degree is not None:
        inc = inc.where(F.col("deg") <= max_neighbor_degree)
    wedges = (
        inc.alias("a")
        .join(inc.alias("b"), "w")
        .where(F.col("a.n") < F.col("b.n"))
        .select(F.col("a.n").alias("u"), F.col("b.n").alias("v"),
                F.col("a.deg").alias("wdeg"))
    )
    scores = wedges.groupBy("u", "v").agg(
        F.count("*").alias("common_neighbors"),
        F.sum(1.0 / F.log(F.col("wdeg").cast("double"))).alias("adamic_adar"),
    )
    # drop pairs that are already edges (candidate set = absent links)
    existing = und.select(F.col("src").alias("u"), F.col("dst").alias("v"))
    cand = scores.join(existing, ["u", "v"], "left_anti")
    du = deg.select(F.col("w").alias("u"), F.col("deg").alias("du"))
    dv = deg.select(F.col("w").alias("v"), F.col("deg").alias("dv"))
    return (
        cand.join(du, "u").join(dv, "v")
        .select(
            "u", "v", "common_neighbors",
            (F.col("common_neighbors")
             / (F.col("du") + F.col("dv") - F.col("common_neighbors"))
             ).alias("jaccard"),
            "adamic_adar",
        )
    )


def cocitation_scores(
    edges: DataFrame,
    mode: str = "cocitation",
    max_center_degree: int | None = None,
) -> DataFrame:
    """Directed shared-neighbor similarity over the DIRECTED graph.

    ``cocitation(u, v)`` = |{w : w→u AND w→v}| — pages cited together
    (Small 1973); the wedge CENTER w fans out, pair degree = in-degree.
    ``coupling(u, v)``   = |{w : u→w AND v→w}| — pages citing the same
    references (Kessler 1963); center fans in, pair degree = out-degree.
    Both carry the cosine normalization
    ``score / sqrt(d(u) · d(v))`` (Salton), the standard similarity the
    raw count lacks (hubs co-occur with everything).

    Same family as the reference's credibility score joins
    (txt_to_csv_sqlite.py:206-275) applied to topology; the directed
    complement of the undirected :func:`link_prediction_scores`.

    Scale shape: one self-join of the incidence list on the wedge
    center → groupBy(u, v) with a map-side-combinable count. A center of
    fan-out d emits d·(d-1)/2 pairs, so ``max_center_degree`` drops
    centers above the cap BEFORE the join (degrees for the cosine are
    computed before the cap, so retained normalizations stay exact) —
    the one knob that bounds the wedge shuffle at 100 TB.
    """
    e = clean_edges(edges).select("src", "dst").dropDuplicates(["src", "dst"])
    if mode == "cocitation":
        inc = e.select(F.col("src").alias("w"), F.col("dst").alias("n"))
    elif mode == "coupling":
        inc = e.select(F.col("dst").alias("w"), F.col("src").alias("n"))
    else:
        raise ValueError(f"unknown mode {mode!r}")
    # derived from `inc` (not `e`) so the dedup exchange subtree is
    # identical to the wedge join's inputs and Spark reuses it instead of
    # recomputing the edge dedup three times
    pair_deg = inc.groupBy("n").agg(F.count("*").alias("d"))
    if max_center_degree is not None:
        cdeg = inc.groupBy("w").agg(F.count("*").alias("cd"))
        inc = inc.join(cdeg.where(F.col("cd") <= max_center_degree), "w").drop("cd")
    pairs = (
        inc.alias("a")
        .join(inc.alias("b"), "w")
        .where(F.col("a.n") < F.col("b.n"))
        .groupBy(F.col("a.n").alias("u"), F.col("b.n").alias("v"))
        .agg(F.count("*").alias("shared"))
    )
    du = pair_deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = pair_deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    return (
        pairs.join(du, "u").join(dv, "v")
        .select(
            "u", "v", "shared",
            (F.col("shared") / F.sqrt(F.col("du") * F.col("dv"))).alias("cosine"),
        )
    )


def cocitation_topk(edges: DataFrame, k: int = 50, mode: str = "cocitation",
                    max_center_degree: int | None = None,
                    round_digits: int = 6) -> DataFrame:
    """Top-k vertex pairs by cosine-normalized shared-neighbor count,
    ordered on the rounded score (+ (u, v) tiebreak — same determinism
    contract as :func:`link_prediction_topk`). TakeOrdered, no full sort."""
    scores = cocitation_scores(edges, mode=mode,
                               max_center_degree=max_center_degree)
    r = F.round(F.col("cosine"), round_digits)
    return scores.orderBy(r.desc(), F.col("u").asc(), F.col("v").asc()).limit(k)


def link_prediction_topk(edges: DataFrame, k: int = 50,
                         by: str = "adamic_adar",
                         max_neighbor_degree: int | None = None,
                         round_digits: int = 6) -> DataFrame:
    """Top-k candidate links by a score column, ordered by the score
    ROUNDED to ``round_digits`` (summation-order float noise cannot flip
    the ordering between engines) with (u, v) tiebreak. TakeOrdered —
    no full sort."""
    scores = link_prediction_scores(edges, max_neighbor_degree)
    r = F.round(F.col(by), round_digits)
    return (
        scores.orderBy(r.desc(), F.col("u").asc(), F.col("v").asc())
        .limit(k)
    )


def negative_samples(edges: DataFrame, k: int = 3, seed: int = 42,
                     oversample: int = 3) -> DataFrame:
    """(src, neg_dst, draw) — up to ``k`` deterministic NEGATIVE edges
    per source vertex: uniform draws over the vertex set that are not
    true edges and not self-loops, reproducible across reruns, retries
    and partitionings (the training-data contract: a GNN epoch must see
    the same negatives the feature store was built with). Draw i for
    source s hits vertex rank md5(seed:s:i) mod |V| under the dense
    vid-ascending ranking; collisions dedupe keep-first and survivors
    re-rank 1..k by draw order, so some sources may emit fewer than k
    (dense neighborhoods) — raise ``oversample`` to tighten that.

    Scale shape: the dense ranking reuses the extraction layer's
    range-partition + broadcast-offsets construction (no single global
    window); draws are a row-explode of k·oversample per source; the
    rank->vid resolution is an equi-join on idx; true-edge exclusion is
    one anti join; the final per-source windows see <= k·oversample
    rows. |V| is the one setup scalar (same class as PPR's seed count).
    """
    from pyspark.sql.window import Window

    e = clean_edges(edges).dropDuplicates(["src", "dst"]).persist()
    verts = (e.select(F.col("src").alias("vid"))
             .unionByName(e.select(F.col("dst").alias("vid"))).distinct())
    num_ranges = max(32, verts.rdd.getNumPartitions())
    parts = verts.repartitionByRange(num_ranges, "vid").withColumn(
        "_pid", F.spark_partition_id())
    local = parts.withColumn(
        "_rank", F.row_number().over(Window.partitionBy("_pid").orderBy("vid")))
    counts = local.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    w_off = (Window.partitionBy(F.lit(0)).orderBy("_pid")
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)))
    ids = (local.join(F.broadcast(offsets.select("_pid", "_off")), "_pid")
           .select("vid", (F.col("_off") + F.col("_rank") - 1)
                   .cast("long").alias("idx")))
    n_verts = verts.count()  # setup scalar for the mod

    n_draws = k * oversample
    draws = (
        e.select(F.col("src")).distinct()
        .select("src", F.explode(F.sequence(F.lit(1), F.lit(n_draws)))
                .alias("i"))
        .withColumn(
            "idx",
            F.pmod(
                F.conv(F.substring(
                    F.md5(F.concat_ws(":", F.lit(str(seed)),
                                      F.col("src").cast("string"),
                                      F.col("i").cast("string"))), 1, 15),
                    16, 10).cast("long"),
                F.lit(int(n_verts))))
    )
    cand = (draws.join(ids, "idx")
            .select("src", F.col("vid").alias("neg_dst"), "i")
            .where(F.col("src") != F.col("neg_dst")))
    neg = cand.join(e.withColumnRenamed("dst", "neg_dst"),
                    ["src", "neg_dst"], "left_anti")
    # dedupe repeated hits keep-first, then re-rank; both windows are
    # bounded by n_draws rows per (src) group
    w_dd = Window.partitionBy("src", "neg_dst").orderBy("i")
    w_rk = Window.partitionBy("src").orderBy("i")
    out = (neg.withColumn("_dd", F.row_number().over(w_dd))
           .where(F.col("_dd") == 1)
           .withColumn("draw", F.row_number().over(w_rk).cast("long"))
           .where(F.col("draw") <= k)
           .select("src", "neg_dst", "draw"))
    out = out.transform(eager_checkpoint)
    e.unpersist()
    return out
