"""HITS (hubs & authorities) over the directed edge table.

Not in the reference; a natural sibling of its PageRank surface
(tgrag/algorithms/pagerank.py pins the iterative-scores contract). Same
physical design as graph/pagerank.py: edges cached and hash-partitioned
once, per-iteration state is a (vid, hub, auth) DataFrame, updates are two
map-side-combinable groupBy sums (auth ← Σ hub over in-edges, then
hub ← Σ new-auth over out-edges), and L1 normalization rides as lazy
scalar-aggregate cross joins so no per-iteration driver action is needed.
One eager localCheckpoint per iteration bounds plan growth exactly like
the PageRank loop.

Scale shape: each iteration shuffles O(|E|) contribution rows keyed by
dst/src plus one O(|V|) normalization scan — no collect, no windows, no
Python. Skewed authorities are plain groupBy sums (AQE-splittable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from credigraph_spark.graph.adjacency import clean_edges


def hits(edges: DataFrame, max_iter: int = 3) -> DataFrame:
    """Fixed-iteration HITS with L1 normalization each half-step.

    Returns (vid, hub, auth) rounded to 8 decimals, one row per vertex of
    the cleaned graph. Fixed iterations (not tolerance) keep the result
    deterministic and oracle-checkable.
    """
    e = clean_edges(edges).persist()
    verts = (
        e.select(F.col("src").alias("vid"))
        .unionByName(e.select(F.col("dst").alias("vid")))
        .distinct()
        .persist()
    )
    n = verts.count()  # one-time setup action, also materializes the caches
    state = verts.select(
        "vid", F.lit(1.0 / n).alias("hub"), F.lit(1.0 / n).alias("auth")
    ).localCheckpoint(eager=True)

    for _ in range(max_iter):
        # auth'(v) = Σ_{(u,v)∈E} hub(u), L1-normalized
        contrib_a = (
            e.join(state.select(F.col("vid").alias("src"), "hub"), "src")
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.sum("hub").alias("raw"))
        )
        auth_raw = verts.join(contrib_a, "vid", "left").select(
            "vid", F.coalesce("raw", F.lit(0.0)).alias("raw")
        )
        sa = auth_raw.agg(F.sum("raw").alias("_s"))
        auth = auth_raw.crossJoin(F.broadcast(sa)).select(
            "vid", (F.col("raw") / F.col("_s")).alias("auth")
        )

        # hub'(v) = Σ_{(v,w)∈E} auth'(w), L1-normalized
        contrib_h = (
            e.join(auth.select(F.col("vid").alias("dst"), "auth"), "dst")
            .groupBy(F.col("src").alias("vid"))
            .agg(F.sum("auth").alias("raw"))
        )
        hub_raw = verts.join(contrib_h, "vid", "left").select(
            "vid", F.coalesce("raw", F.lit(0.0)).alias("raw")
        )
        sh = hub_raw.agg(F.sum("raw").alias("_s"))
        hub = hub_raw.crossJoin(F.broadcast(sh)).select(
            "vid", (F.col("raw") / F.col("_s")).alias("hub")
        )

        new_state = hub.join(auth, "vid").localCheckpoint(eager=True)
        state.unpersist()
        state = new_state

    e.unpersist()
    verts.unpersist()
    return state.select(
        "vid", F.round("hub", 8).alias("hub"), F.round("auth", 8).alias("auth")
    )
