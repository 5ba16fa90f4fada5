"""HITS (hubs & authorities) over the directed edge table.

Not in the reference; a natural sibling of its PageRank surface
(tgrag/algorithms/pagerank.py pins the iterative-scores contract). Same
physical design as graph/pagerank.py: edges cached and hash-partitioned
once, per-half-step state is a raw-score DataFrame materialized by ONE
eager localCheckpoint whose job also fills an Observation with the L1 sum
(exactly how PageRank's dangling mass / L1 ride the superstep action), so
normalization is a literal division — no scalar-subquery re-execution of
the half-step lineage, no extra driver action.

Scale shape: each half-step shuffles O(|E|) contribution rows keyed by
dst/src plus one O(|V|) normalization projection — no collect, no windows,
no Python. Skewed authorities are plain groupBy sums (map-side combine
absorbs hub fan-in).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation, functions as F

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

    def _half_step(scores: DataFrame, edge_key: str, group_key: str,
                   tag: str) -> DataFrame:
        """Gather (vid, score) over edges on the edge_key side, sum per
        group_key vertex, L1-normalize. One job: the eager localCheckpoint
        fills the Observation with the raw L1 sum, normalization divides by
        it as a literal."""
        contrib = (
            e.join(scores.select(F.col("vid").alias(edge_key), "score"), edge_key)
            .groupBy(F.col(group_key).alias("vid"))
            .agg(F.sum("score").alias("raw"))
        )
        obs = Observation(f"hits_{tag}")
        raw = (
            verts.join(contrib, "vid", "left")
            .select("vid", F.coalesce("raw", F.lit(0.0)).alias("raw"))
            .observe(obs, F.sum("raw").alias("s"))
            .localCheckpoint(eager=True)
        )
        return raw.select(
            "vid", (F.col("raw") / F.lit(obs.get["s"])).alias("score")
        )

    hub = verts.select("vid", F.lit(1.0 / n).alias("score")).localCheckpoint(eager=True)
    auth = hub
    for i in range(max_iter):
        # auth'(v) = Σ_{(u,v)∈E} hub(u), normalized; then
        # hub'(v) = Σ_{(v,w)∈E} auth'(w), normalized
        auth = _half_step(hub, "src", "dst", f"auth_{i}")
        hub = _half_step(auth, "dst", "src", f"hub_{i}")

    result = (
        hub.withColumnRenamed("score", "hub")
        .join(auth.withColumnRenamed("score", "auth"), "vid")
        .select("vid", F.round("hub", 8).alias("hub"),
                F.round("auth", 8).alias("auth"))
    )
    e.unpersist()
    verts.unpersist()
    return result
