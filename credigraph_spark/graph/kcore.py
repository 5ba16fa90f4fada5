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

    result = und.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("deg"))
    return result, rounds
