"""TrustRank and spam mass — link-level credibility scoring.

The reference's whole purpose is scoring domain credibility over the web
link graph (CrediGraph's rank/score joins, `txt_to_csv_sqlite.py:206-275`;
PageRank as the centrality backbone, `tgrag/algorithms/pagerank.py`).
TrustRank (Gyongyi, Garcia-Molina, Pedersen, VLDB 2004) is the canonical
link-spam-era formulation of exactly that idea: run PageRank with the
teleport restricted to a vetted trusted seed set, so rank can only flow
out of trustworthy pages; pages whose ordinary PageRank is NOT explained
by trust flow are suspect. The standard derived signal is the *relative
spam mass* (Gyongyi et al., "Link Spam Detection Based on Mass
Estimation", VLDB 2006):

    spam_mass(v) = (PR(v) - TR(v)) / PR(v)

in (-inf, 1]: ~1 means none of v's rank is reachable from trust (likely
spam), <= 0 means v holds at least its fair share of trusted rank.

Spark-first shape: TrustRank IS ``personalized_pagerank`` with the
trusted set as seeds (same sparse receiver-only state, Observation-
carried dangling mass restarted to the seed distribution, one action
per superstep), and PageRank is the existing G1 loop — so spam mass is
two iterate passes over the SAME cached adjacency plus one final
vid-partitioned join. Nothing here adds a new shuffle shape; at 100 TB
it scales exactly as far as the two rank loops it composes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from credigraph_spark.graph.pagerank import pagerank
from credigraph_spark.graph.ppr import personalized_pagerank


def trustrank(
    edges: DataFrame,
    trusted: DataFrame,
    damping: float = 0.85,
    max_iter: int = 20,
) -> DataFrame:
    """TrustRank scores (vid, rank): PageRank with teleport + dangling
    mass restarted to the uniform distribution over ``trusted`` (first
    column = vid). Sparse: only seeds and reachable receivers get rows;
    every other vertex's score is exactly 0."""
    return personalized_pagerank(edges, trusted, damping=damping,
                                 max_iter=max_iter)


def top_indegree_seeds(edges: DataFrame, k: int) -> DataFrame:
    """Deterministic trusted-seed pick: the k most-linked vertices
    (in-degree, vid ascending tiebreak) — the 'inverse PageRank' seed
    heuristic of the TrustRank paper collapsed to its first iteration.
    Tiny result (k rows); the order-by is on an aggregated table."""
    return (
        edges.groupBy(F.col("dst").alias("vid"))
        .agg(F.count("*").alias("ind"))
        .orderBy(F.desc("ind"), "vid")
        .limit(k)
        .select("vid")
    )


def spam_mass(
    edges: DataFrame,
    trusted: DataFrame,
    damping: float = 0.85,
    max_iter: int = 20,
) -> DataFrame:
    """(vid, pr, tr, spam_mass) for every vertex: PageRank, TrustRank
    from ``trusted``, and the relative spam mass (PR - TR) / PR
    (0 where PR = 0 — unreachable isolated extras). Both loops run the
    same number of fixed iterations so the two scores are comparable
    partial sums of the same Neumann series."""
    pr, _ = pagerank(edges, damping=damping, tol=0.0, max_iter=max_iter)
    tr = trustrank(edges, trusted, damping=damping, max_iter=max_iter)
    tr = tr.select("vid", F.col("rank").alias("tr"))
    out = pr.join(tr, "vid", "left").select(
        "vid",
        F.col("rank").alias("pr"),
        F.coalesce(F.col("tr"), F.lit(0.0)).alias("tr"),
    )
    return out.select(
        "vid", "pr", "tr",
        F.when(F.col("pr") > 0,
               (F.col("pr") - F.col("tr")) / F.col("pr"))
        .otherwise(F.lit(0.0)).alias("spam_mass"),
    )
