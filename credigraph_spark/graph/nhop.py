"""n-hop subnetwork extraction (BFS frontier expansion).

Reference: tgrag/construct_graph_scripts/subnetwork_construct.py:19-72 —
pandas frontier loop over the undirected incidence relation, run
``n_hop + 1`` rounds, with a seen-set dedup. Goldens in
test/test_construct/test_subnetwork_construction.py:38-95 (4-node path,
seed {1}: hop0 -> {1,2}, hop1 -> {1,2,3}, hop2 -> {1,2,3}).

Spark-first: per round, two semi-join-shaped joins (edges incident to the
frontier via src and via dst), union, distinct; the seen set is a
DataFrame, dedup via left_anti. Same loop skeleton as CC/LPA supersteps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from credigraph_spark.session import eager_checkpoint


def n_hop_subgraph(edges: DataFrame, seeds: DataFrame, n_hop: int) -> tuple[DataFrame, DataFrame]:
    """Returns (vertices(vid), sub_edges(src,dst)).

    ``seeds``: single-column DataFrame of seed vids. Expansion runs
    ``n_hop + 1`` rounds (reference semantics: hop 0 already includes the
    seeds' direct neighbors, subnetwork_construct.py:44-60)."""
    # localCheckpoint (not persist) for per-round state: materialized once,
    # plan truncated each round (the union chain would otherwise grow), and
    # blocks are GC-tied to this call — nothing stays cached across calls
    # in a long-lived session.
    seen = (
        seeds.select(F.col(seeds.columns[0]).alias("vid")).distinct()
        .transform(eager_checkpoint)
    )
    frontier = seen
    for _ in range(n_hop + 1):
        inc_s = edges.join(frontier.withColumnRenamed("vid", "src"), "src", "left_semi")
        inc_t = edges.join(frontier.withColumnRenamed("vid", "dst"), "dst", "left_semi")
        incident = inc_s.select("src", "dst").unionByName(inc_t.select("src", "dst"))
        endpoints = (
            incident.select(F.col("src").alias("vid"))
            .unionByName(incident.select(F.col("dst").alias("vid")))
            .distinct()
        )
        new = endpoints.join(seen, "vid", "left_anti").transform(eager_checkpoint)
        if new.isEmpty():
            break
        seen = seen.unionByName(new).distinct().transform(eager_checkpoint)
        frontier = new
    sub_edges = (
        edges.join(seen.withColumnRenamed("vid", "src"), "src", "left_semi")
        .join(seen.withColumnRenamed("vid", "dst"), "dst", "left_semi")
        .select("src", "dst")
    )
    return seen, sub_edges


def bfs_distances(edges: DataFrame, seeds: DataFrame, max_hops: int,
                  directed: bool = True) -> DataFrame:
    """(vid, dist) — minimum hop count from the seed set, up to
    ``max_hops``; unreachable vertices are absent. Same frontier-loop
    skeleton as ``n_hop_subgraph`` (one semi-join + anti-join per round,
    localCheckpoint truncates lineage), but tracks the discovery round:
    BFS discovers each vertex at its minimum distance, so no min-agg is
    ever needed. Exactly oracle-checkable with a depth-bounded recursive
    CTE (min over all ≤max_hops paths)."""
    seen = (
        seeds.select(F.col(seeds.columns[0]).alias("vid")).distinct()
        .select("vid", F.lit(0).alias("dist"))
        .transform(eager_checkpoint)
    )
    frontier = seen.select("vid")
    for h in range(1, max_hops + 1):
        nbrs = (
            edges.join(frontier.withColumnRenamed("vid", "src"), "src", "left_semi")
            .select(F.col("dst").alias("vid"))
        )
        if not directed:
            rev = (
                edges.join(frontier.withColumnRenamed("vid", "dst"), "dst", "left_semi")
                .select(F.col("src").alias("vid"))
            )
            nbrs = nbrs.unionByName(rev)
        new = (
            nbrs.distinct()
            .join(seen.select("vid"), "vid", "left_anti")
            .select("vid", F.lit(h).alias("dist"))
            .transform(eager_checkpoint)
        )
        if new.isEmpty():
            break
        seen = seen.unionByName(new).transform(eager_checkpoint)
        frontier = new.select("vid")
    return seen


def per_seed_distances(edges: DataFrame, seeds: DataFrame, max_hops: int,
                       directed: bool = True) -> DataFrame:
    """(seed, vid, dist) — minimum hop count from EACH seed separately,
    up to ``max_hops`` (bfs_distances collapses the seed set to one
    source; this keeps the seed dimension, the building block for
    per-source centralities). Same frontier skeleton, state keyed by
    (seed, vid): BFS discovers each pair at its minimum distance, so no
    min-agg is needed. Seed rows themselves appear with dist = 0."""
    rel = edges.select("src", "dst")
    if not directed:
        rel = rel.unionByName(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    seen = (
        seeds.select(F.col(seeds.columns[0]).alias("seed")).distinct()
        .select("seed", F.col("seed").alias("vid"), F.lit(0).alias("dist"))
        .transform(eager_checkpoint)
    )
    frontier = seen.select("seed", "vid")
    for h in range(1, max_hops + 1):
        nbrs = (
            frontier.join(rel.withColumnRenamed("src", "vid"), "vid")
            .select("seed", F.col("dst").alias("vid"))
            .distinct()
        )
        new = (
            nbrs.join(seen.select("seed", "vid"), ["seed", "vid"], "left_anti")
            .select("seed", "vid", F.lit(h).alias("dist"))
            .transform(eager_checkpoint)
        )
        if new.isEmpty():
            break
        seen = seen.unionByName(new).transform(eager_checkpoint)
        frontier = new.select("seed", "vid")
    return seen


def closeness_centrality(edges: DataFrame, seeds: DataFrame, max_hops: int,
                         directed: bool = True) -> DataFrame:
    """(seed, n_reachable, sum_dist, closeness) — bounded-horizon
    closeness of each seed: r / Σ dist over the r vertices reachable
    within ``max_hops`` (0.0 when nothing is reachable). Companion to
    ``harmonic_centrality`` on the same ``per_seed_distances`` primitive;
    the reference's graph layer has no distance analytics at all
    (its analytics stop at degree/PageRank, tgrag/algorithms/), so this
    is survey-extension surface like harmonic/betweenness.

    r and Σd are exact integers (one count + one long-sum per seed), so
    the only float op is the final division — reproducible bit-for-bit
    in any engine, rounded to 8 decimals like the other centralities."""
    d = per_seed_distances(edges, seeds, max_hops, directed)
    agg = (
        d.where(F.col("dist") > 0)
        .groupBy("seed")
        .agg(F.count("*").alias("n_reachable"),
             F.sum("dist").cast("long").alias("sum_dist"))
    )
    return (
        agg.join(seeds.select(F.col(seeds.columns[0]).alias("seed")).distinct(),
                 "seed", "right")
        .select(
            "seed",
            F.coalesce("n_reachable", F.lit(0)).alias("n_reachable"),
            F.coalesce("sum_dist", F.lit(0)).alias("sum_dist"),
            F.when(F.coalesce("sum_dist", F.lit(0)) > 0,
                   F.round(F.col("n_reachable") / F.col("sum_dist"), 8))
             .otherwise(F.lit(0.0)).alias("closeness"),
        )
    )


def eccentricity(edges: DataFrame, seeds: DataFrame, max_hops: int,
                 directed: bool = True) -> DataFrame:
    """(seed, n_reachable, ecc) — bounded-horizon eccentricity of each
    seed: the max hop distance over vertices reachable within
    ``max_hops`` (0 when nothing is reachable — matching the isolated-
    vertex convention of closeness_centrality). All-integer outputs, so
    the oracle comparison is exact with no rounding at all. Third member
    of the per_seed_distances readout family (harmonic, closeness)."""
    d = per_seed_distances(edges, seeds, max_hops, directed)
    agg = (
        d.where(F.col("dist") > 0)
        .groupBy("seed")
        .agg(F.count("*").alias("n_reachable"),
             F.max("dist").cast("int").alias("ecc"))
    )
    return (
        agg.join(seeds.select(F.col(seeds.columns[0]).alias("seed")).distinct(),
                 "seed", "right")
        .select("seed",
                F.coalesce("n_reachable", F.lit(0)).alias("n_reachable"),
                F.coalesce("ecc", F.lit(0)).alias("ecc"))
    )


def diameter_2approx(edges: DataFrame, max_hops: int,
                     directed: bool = False) -> DataFrame:
    """ONE row (start_vid, far_vid, far_dist, diameter_lb) — the classic
    double-BFS diameter estimate (a 2-approximation on undirected graphs:
    ecc(far) ≥ diameter/2, and ≥ the true value it lower-bounds): BFS
    from the smallest vid, take the farthest vertex (ties to the smaller
    vid), BFS again from it and report its bounded eccentricity.

    Fully declarative: the second BFS is seeded by the LIMIT-1 frame of
    the first (no driver collect between phases); everything else is the
    per_seed_distances frontier loop, so costs are 2× one bounded BFS.
    All-integer outputs — the oracle comparison is exact."""
    verts = (edges.select(F.col("src").alias("vid"))
             .unionByName(edges.select(F.col("dst").alias("vid")))
             .distinct())
    start = verts.agg(F.min("vid").alias("start_vid"))
    d1 = per_seed_distances(edges, start.select("start_vid"), max_hops,
                            directed)
    far = (d1.orderBy(F.desc("dist"), F.asc("vid")).limit(1)
           .select(F.col("vid").alias("far_vid"),
                   F.col("dist").cast("int").alias("far_dist")))
    d2 = per_seed_distances(edges, far.select("far_vid"), max_hops,
                            directed)
    return (
        start.crossJoin(far)
        .crossJoin(d2.agg(F.max("dist").cast("int").alias("diameter_lb")))
        .select("start_vid", "far_vid", "far_dist", "diameter_lb")
    )


def harmonic_centrality(edges: DataFrame, seeds: DataFrame, max_hops: int,
                        directed: bool = True) -> DataFrame:
    """(seed, centrality) — harmonic centrality of each seed within the
    ``max_hops`` horizon: Σ over reachable v≠seed of 1/dist(seed, v).
    Computed from per-hop COUNTS (count of vertices at each distance,
    then Σ count_d / d over ≤max_hops ordered terms), so the float
    reduction has a fixed tiny term order and is reproducible across
    engines; rounded to 8 decimals like the other centrality outputs."""
    d = per_seed_distances(edges, seeds, max_hops, directed)
    per_hop = (
        d.where(F.col("dist") > 0)
        .groupBy("seed", "dist").agg(F.count("*").alias("cnt"))
    )
    return (
        per_hop.groupBy("seed")
        .agg(F.round(F.sum(F.col("cnt") / F.col("dist")), 8).alias("centrality"))
        .join(seeds.select(F.col(seeds.columns[0]).alias("seed")).distinct(),
              "seed", "right")
        .select("seed", F.coalesce("centrality", F.lit(0.0)).alias("centrality"))
    )


def landmark_distances(edges: DataFrame, n_landmarks: int = 3,
                       n_sample: int = 10, max_hops: int = 4,
                       directed: bool = False) -> DataFrame:
    """Landmark-based distance oracle (X208; Potamias et al. 2009,
    "Fast shortest path distance estimation in large networks"): pick
    ``n_landmarks`` landmarks (min-vid deterministic), precompute the
    bounded BFS field d(L, ·) once, and estimate any pairwise distance
    as est(u, v) = min_L d(u, L) + d(L, v) — an UPPER bound on the true
    distance (triangle inequality), exact whenever some landmark lies
    on a shortest u-v path. The standard sketch for web-scale "how far
    apart" queries where per-pair BFS is unaffordable.

    Evaluated here on the deterministic sample of the ``n_sample``
    smallest vids (all unordered pairs): returns (u, v, est_dist,
    n_covering) with est_dist NULL when no landmark reaches both ends
    within ``max_hops``.

    Scale shape: ONE per-seed bounded BFS (the per_seed_distances
    frontier loop — L·|reachable| state rows), then the estimate is two
    joins of the pair list against that field keyed on the landmark —
    no per-pair traversal. At serving time the field is the persisted
    artifact; estimates are pure joins.
    """
    d = None
    verts = (edges.select(F.col("src").alias("vid"))
             .unionByName(edges.select(F.col("dst").alias("vid")))
             .distinct())
    landmarks = verts.orderBy("vid").limit(n_landmarks)
    d = per_seed_distances(edges, landmarks, max_hops, directed)

    sample = verts.orderBy("vid").limit(n_sample).select(
        F.col("vid").alias("u"))
    pairs = (sample.crossJoin(sample.select(F.col("u").alias("v")))
             .where(F.col("u") < F.col("v")))
    du = d.select("seed", F.col("vid").alias("u"), F.col("dist").alias("du"))
    dv = d.select("seed", F.col("vid").alias("v"), F.col("dist").alias("dv"))
    est = (pairs.join(du, "u").join(dv, ["seed", "v"])
           .groupBy("u", "v")
           .agg(F.min(F.col("du") + F.col("dv")).cast("long")
                .alias("est_dist"),
                F.countDistinct("seed").cast("long").alias("n_covering")))
    return (pairs.join(est, ["u", "v"], "left")
            .select("u", "v", "est_dist",
                    F.coalesce("n_covering", F.lit(0)).cast("long")
                    .alias("n_covering")))


def truncated_hitting_time(edges: DataFrame, targets: DataFrame,
                           rounds: int = 3,
                           round_digits: int = 8) -> DataFrame:
    """Truncated hitting time to a target set (X230; Sarkar & Moore
    2007): expected steps for a uniform random walk from each vertex to
    first reach any target, truncated at ``rounds`` — h(v) = 0 for
    targets, else min(T, 1 + mean over out-neighbors of h(u)), with
    dangling non-targets pinned at the cap T (their walk can never
    hit). The walk-expectation counterpart of bfs_distances: BFS gives
    the SHORTEST path, hitting time weights every path by its walk
    probability, so a vertex with many long detours scores worse than
    one with a single short line — the proximity measure behind
    hitting-time link prediction and trust propagation to seed sets.

    Returns (vid, h) over ALL vertices, h rounded to ``round_digits``
    (the pagerank-oracle float policy: raw doubles in flight, one final
    round).

    Scale shape: identical to a PageRank superstep — one
    contribution-AVG shuffle per round over the cleaned edge set (the
    mean over out-neighbors IS the P h matvec for uniform P), state
    re-derived from the localCheckpointed vertex frame each round; no
    driver action inside the loop.
    """
    from credigraph_spark.graph.adjacency import clean_edges

    e = clean_edges(edges).persist()
    verts = (e.select(F.col("src").alias("vid"))
             .unionByName(e.select(F.col("dst").alias("vid")))
             .distinct())
    cap = float(rounds)
    base = (verts.join(targets.select(F.col("vid")).distinct()
                       .withColumn("_t", F.lit(1)), "vid", "left")
            .transform(eager_checkpoint))
    h = base.select("vid", F.when(F.col("_t") == 1, 0.0)
                    .otherwise(F.lit(cap)).alias("h"))
    for _ in range(rounds):
        nb = (e.join(h.select(F.col("vid").alias("dst"), "h"), "dst")
              .groupBy(F.col("src").alias("vid"))
              .agg(F.avg("h").alias("nh")))
        h = (base.join(nb, "vid", "left")
             .select("vid",
                     F.when(F.col("_t") == 1, 0.0)
                     .otherwise(F.least(
                         F.lit(cap),
                         1.0 + F.coalesce("nh", F.lit(cap))))
                     .alias("h"))
             .transform(eager_checkpoint))
    e.unpersist()
    return h.select("vid", F.round("h", round_digits).alias("h"))
