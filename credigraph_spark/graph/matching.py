"""Distributed greedy maximal matching — synchronous proposal rounds.

Each round every active vertex proposes to its minimum-id active
neighbour; a mutual proposal (u->v AND v->u) is a matched pair, and
matched vertices deactivate with their incident edges. This is the
classic handshake/pointer matching (a deterministic relative of
Israeli-Itai); like MIS it converges in O(log n) expected rounds and is
the building block for coarsening in multilevel partitioners (METIS
shape) and for conflict-free pair scheduling. The reference repo
(ekmpa/CrediGraph) has no analog; it extends the engine's graph family
(SURVEY.md §2.12).

Determinism: proposals go to MIN(neighbour id) — no randomness at all —
so a round-bounded run replays bit-identically in any SQL engine
(unrolled-CTE oracle, the kcore score_2round convention).

Scale shape: per round ONE groupBy(src).min aggregation over the live
edge set + a self-join of the (vertex -> proposal) table on the mutual
condition + two anti joins to retire matched endpoints. Live-edge and
match state are localCheckpointed each round (lineage truncation — the
Louvain lesson).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from credigraph_spark.graph.adjacency import undirected_simple

from credigraph_spark.session import eager_checkpoint


def greedy_matching(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """Returns matched pairs (u, v), u < v, after ``rounds`` synchronous
    proposal rounds (maximal when run to fixpoint; round-bounded for
    the mid-convergence determinism the driver checks)."""
    live = undirected_simple(edges).transform(eager_checkpoint)
    out = None
    for _ in range(rounds):
        if live.isEmpty():
            break
        prop = live.groupBy("src").agg(F.min("dst").alias("prop"))
        other = prop.select(F.col("src").alias("b_src"),
                            F.col("prop").alias("b_prop"))
        matched = (prop.join(other,
                             (F.col("b_src") == F.col("prop"))
                             & (F.col("b_prop") == F.col("src")))
                   .where(F.col("src") < F.col("prop"))
                   .select(F.col("src").alias("u"),
                           F.col("prop").alias("v"))).transform(eager_checkpoint)
        if matched.isEmpty():
            break
        out = matched if out is None else out.unionByName(matched)
        gone = (matched.select(F.col("u").alias("vid"))
                .unionByName(matched.select(F.col("v").alias("vid"))))
        live = (live.join(gone.withColumnRenamed("vid", "src"), "src",
                          "left_anti")
                .join(gone.withColumnRenamed("vid", "dst"), "dst",
                      "left_anti")
                .select("src", "dst").transform(eager_checkpoint))
    if out is None:
        spark = edges.sparkSession
        return spark.createDataFrame([], "u LONG, v LONG")
    return out
