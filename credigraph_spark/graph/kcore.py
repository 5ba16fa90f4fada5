"""k-core decomposition by iterative degree peeling (undirected graph).

Not in the reference; standard companion to its degree-filter pass
(tgrag/scripts/process.py two-pass threshold filter generalized to a
fixpoint). Each round removes vertices whose undirected degree in the
CURRENT subgraph is < k and restricts the edge set to survivors — the
fixpoint is the k-core.

Scale shape: each round is one map-side-combinable degree aggregation plus
two left-semi joins, all keyed on the same vertex hash partitioning; the
edge set only shrinks, so rounds get cheaper. One driver action per round
(the surviving-edge count doubles as the convergence test). No collect of
vertex data, no windows, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from credigraph_spark.graph.adjacency import clean_edges

from credigraph_spark.session import (adaptive_partitions,
                                      eager_checkpoint,
                                      loop_tuning)


def k_core(
    edges: DataFrame, k: int, max_rounds: int | None = None
) -> tuple[DataFrame, int]:
    """Peel to the k-core (or for ``max_rounds`` rounds if given — the
    fixed-round form is deterministic mid-convergence and oracle-friendly).

    Returns ((vid, deg) of the surviving subgraph's undirected degrees,
    rounds_run).
    """
    e = clean_edges(edges)
    und = (
        e.select("src", "dst")
        .unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .dropDuplicates(["src", "dst"])
        .persist()
    )
    n_edges = und.count()
    rounds = 0
    # size the peel rounds to the measured symmetrized edge count and
    # pause AQE for the loop (the k-core rounds' stage shapes are static)
    with loop_tuning(edges.sparkSession, adaptive_partitions(n_edges)):
        while True:
            if max_rounds is not None and rounds >= max_rounds:
                break
            deg = und.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("deg"))
            keep = deg.where(F.col("deg") >= k).select("vid")
            nxt = (
                und.join(keep.withColumnRenamed("vid", "src"), "src", "left_semi")
                .join(keep.withColumnRenamed("vid", "dst"), "dst", "left_semi")
                .select("src", "dst")
                .persist()
            )
            n_next = nxt.count()
            und.unpersist()
            und = nxt
            rounds += 1
            if n_next == n_edges:
                break
            n_edges = n_next

    # materialize before releasing the surviving-edge cache (previously
    # the final persist LEAKED and the returned plan was lazy on it)
    result = eager_checkpoint(
        und.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("deg")))
    und.unpersist()
    return result, rounds


def s_core(
    edges: DataFrame, s, weight_col: str = "w",
    max_rounds: int | None = None,
) -> tuple[DataFrame, int]:
    """Weighted k-core (s-core, Eidsaa & Almaas 2013): peel vertices whose
    summed incident edge weight in the CURRENT subgraph is < ``s``.
    Generalizes ``k_core`` (k_core == s_core with weight 1); the strength
    threshold is the natural core notion for importance-scored link
    graphs (the reference scores edges — txt_to_csv_sqlite.py:206-275 —
    so "core by total edge importance" is the user-facing ask).

    Same scale shape as ``k_core``: per round ONE map-side-combinable
    strength aggregation + two left-semi joins on the shrinking edge set,
    one driver action per round. Parallel edges are summed during
    symmetrization. With integer weights every strength is exact, so the
    fixed-round form replays bit-identically in SQL.

    Returns ((vid, strength) of the surviving subgraph, rounds_run)."""
    e = (
        edges.select("src", "dst", F.col(weight_col).alias("w"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .where(F.col("src") != F.col("dst"))
    )
    und = (
        e.unionByName(e.select(F.col("dst").alias("src"),
                               F.col("src").alias("dst"), "w"))
        .groupBy("src", "dst").agg(F.sum("w").alias("w"))
        .persist()
    )
    n_edges = und.count()
    rounds = 0
    with loop_tuning(edges.sparkSession, adaptive_partitions(n_edges)):
        while True:
            if max_rounds is not None and rounds >= max_rounds:
                break
            strength = und.groupBy(F.col("src").alias("vid")).agg(
                F.sum("w").alias("strength"))
            keep = strength.where(F.col("strength") >= s).select("vid")
            nxt = (
                und.join(keep.withColumnRenamed("vid", "src"), "src", "left_semi")
                .join(keep.withColumnRenamed("vid", "dst"), "dst", "left_semi")
                .select("src", "dst", "w")
                .persist()
            )
            n_next = nxt.count()
            und.unpersist()
            und = nxt
            rounds += 1
            if n_next == n_edges:
                break
            n_edges = n_next

    # materialize before releasing the surviving-edge cache (same
    # leak/lazy-return shape as k_core)
    result = eager_checkpoint(
        und.groupBy(F.col("src").alias("vid")).agg(
            F.sum("w").alias("strength")))
    und.unpersist()
    return result, rounds


def coreness(
    edges: DataFrame,
    k_max: int | None = None,
    rounds_per_k: int | None = None,
) -> DataFrame:
    """Per-vertex core number: the largest k such that the vertex belongs
    to the k-core of the undirected graph. Returns (vid, core) for every
    vertex of the cleaned symmetrized graph (all have core >= 1).

    Batch peel: phases k = 2, 3, ... reuse the shrinking edge set — the
    (k-1)-core peel output IS the k-phase input, so total work is one
    monotone sweep, not |k| independent decompositions. Each phase runs
    the same map-side-combinable degree agg + two left-semi joins as
    ``k_core``; vertices dropped during phase k get core = k-1. The
    accumulated assignment is localCheckpointed once per phase so lineage
    stays flat across the ~degeneracy phases (a web graph's degeneracy is
    a few hundred — a few hundred cheap, shrinking rounds at 100 TB).

    ``k_max``: cap — survivors of phase k_max get core = k_max (needed
    for a deterministic fixed-size SQL oracle). ``rounds_per_k``: run
    each phase exactly this many peel rounds instead of to fixpoint —
    deterministic mid-convergence, matching an unrolled oracle; None
    (default) peels each phase to its fixpoint (the true core number).
    """
    spark = edges.sparkSession
    e = clean_edges(edges)
    und = (
        e.select("src", "dst")
        .unionByName(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .dropDuplicates(["src", "dst"])
        .transform(eager_checkpoint)
    )
    n_edges = und.count()
    cores = spark.createDataFrame([], "vid long, core long")
    k = 2
    while n_edges > 0 and (k_max is None or k <= k_max):
        before = und.select(F.col("src").alias("vid")).distinct()
        rounds = 0
        while rounds_per_k is None or rounds < rounds_per_k:
            deg = und.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("deg"))
            keep = deg.where(F.col("deg") >= k).select("vid")
            nxt = (
                und.join(keep.withColumnRenamed("vid", "src"), "src", "left_semi")
                .join(keep.withColumnRenamed("vid", "dst"), "dst", "left_semi")
                .select("src", "dst")
                .transform(eager_checkpoint)
            )
            n_next = nxt.count()
            und = nxt
            rounds += 1
            if n_next == n_edges:
                break
            n_edges = n_next
        removed = before.join(
            und.select(F.col("src").alias("vid")).distinct(), "vid", "left_anti"
        ).select("vid", F.lit(k - 1).alias("core"))
        cores = cores.unionByName(removed).transform(eager_checkpoint)
        k += 1
    if n_edges > 0:  # survivors at the cap
        cores = cores.unionByName(
            und.select(F.col("src").alias("vid")).distinct()
            .select("vid", F.lit(k_max).alias("core"))
        )
    return cores


def densest_subgraph(edges: DataFrame, eps_tenths: int = 1,
                     max_rounds: int = 8,
                     round_digits: int = 6) -> DataFrame:
    """Densest-subgraph peeling (X238; Charikar's 2-approx, in the
    Bahmani-Kumar-Vassilvitskii 2012 DISTRIBUTED form): each round
    computes the current average density rho = |E|/|V| of the
    undirected simple graph and removes EVERY vertex with degree <=
    2(1+eps)rho at once — O(log n) rounds instead of n sequential
    min-degree peels, a (2+2eps)-approximation. The densest prefix is
    the classic link-farm / spam-cluster detector: a set of pages
    whose internal density no global threshold would reveal.

    The threshold test is EXACT integer arithmetic: with eps =
    eps_tenths/10, "deg <= 2(1+eps)|E|/|V|" is evaluated as
    10 * deg * |V| <= (20 + 2*eps_tenths) * |E| — no floats in the
    peel decision, so every round's survivor set replays bit-exactly.

    Returns one row per round (including round 0, the input graph):
    (round, n_vertices, n_edges, density, is_best) — density =
    |E|/|V| of the UNDIRECTED simple graph at that round (rounded),
    is_best marks the densest round (ties to the earliest).

    Scale shape: per round ONE degree aggregation + two semi-joins
    (the k_core peel shape, audited for scale there); the density
    scalar is the round's one driver action.
    """
    e = clean_edges(edges)
    und = (e.select("src", "dst")
           .unionByName(e.select(F.col("dst").alias("src"),
                                 F.col("src").alias("dst")))
           .dropDuplicates(["src", "dst"])
           .persist())
    rows = []
    thr = 20 + 2 * eps_tenths
    prev = None
    # one extra action to size the peel loop from the measured
    # symmetrized edge count, then AQE paused for the loop
    n_und0 = und.count()
    with loop_tuning(edges.sparkSession,
                     adaptive_partitions(n_und0)):
        for r in range(max_rounds + 1):
            deg = und.groupBy(F.col("src").alias("vid")).agg(
                F.count("*").alias("deg"))
            # the round's ONE action — also materializes und's cache, so
            # the previous round's cache can only be dropped AFTER it
            stats = deg.agg(F.count("*").alias("nv"),
                            F.sum("deg").alias("d2")).collect()
            if prev is not None:
                prev.unpersist()
            nv = int(stats[0]["nv"] or 0)
            ne = int(stats[0]["d2"] or 0) // 2
            if nv == 0:
                break
            rows.append((r, nv, ne, round(ne / nv, round_digits)))
            # 10 * deg * nv <= thr * ne  <=>  deg <= 2(1+eps) * ne/nv
            keep = deg.where(10 * F.col("deg") * nv > thr * ne).select("vid")
            nxt = (und.join(keep.withColumnRenamed("vid", "src"), "src",
                            "left_semi")
                   .join(keep.withColumnRenamed("vid", "dst"), "dst",
                         "left_semi")
                   .select("src", "dst").persist())
            prev = und
            und = nxt
    und.unpersist()
    if prev is not None:
        prev.unpersist()
    if not rows:
        # empty cleaned graph (e.g. only self-loops/nulls): no rounds —
        # return the empty-schema frame instead of max() of nothing
        return edges.sparkSession.createDataFrame(
            [], "round LONG, n_vertices LONG, n_edges LONG, "
                "density DOUBLE, is_best BOOLEAN")
    best = max(range(len(rows)), key=lambda i: (rows[i][3], -i))
    out = [(r, nv, ne, d, i == best)
           for i, (r, nv, ne, d) in enumerate(rows)]
    return edges.sparkSession.createDataFrame(
        out, "round LONG, n_vertices LONG, n_edges LONG, "
             "density DOUBLE, is_best BOOLEAN")
