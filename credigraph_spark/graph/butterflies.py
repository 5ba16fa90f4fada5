"""Butterfly (2x2 biclique) counting over the directed edge table.

A butterfly is two sources both linking to the same two destinations —
the bipartite analog of the triangle, and the standard cohesion motif
for host->page / user->item graphs (Sanei-Mehri et al., KDD 2018;
Wang et al., VLDB 2019 parallel butterfly counting). Not in the
reference (its motif surface stops at triangles); survey-extension
companion to graph/triangles.py on the same wedge-join physical plan.

Counting identity: for every unordered source pair (s1 < s2) let
c(s1,s2) = |common out-neighbors|; then

    #butterflies = sum_pairs C(c, 2) = sum_pairs c*(c-1)/2

— all integer arithmetic, exact in any engine.

Scale shape: the wedge join (e ⋈ e on dst) materializes sum_d C(indeg_d,
2) wedge rows — the same cost envelope as triangle counting's wedge
step, partial-aggregatable by (s1, s2). On web graphs the few mega-indeg
hub destinations dominate that sum; ``hub_cap`` (count only wedges
through destinations with indeg <= cap) is the standard approximation
switch (KDD'18 vertex-priority variant) — default None = exact, which
is also the oracle-checked contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from credigraph_spark.graph.adjacency import clean_edges


def butterfly_count(edges: DataFrame, hub_cap: int | None = None) -> DataFrame:
    """One-row (n_wedge_pairs, n_butterflies): the number of source pairs
    sharing >= 2 out-neighbors, and the exact butterfly count."""
    e = clean_edges(edges)
    if hub_cap is not None:
        keep = (e.groupBy("dst").agg(F.count("*").alias("ind"))
                .where(F.col("ind") <= hub_cap).select("dst"))
        e = e.join(keep, "dst", "left_semi")
    a = e.select(F.col("src").alias("s1"), "dst")
    b = e.select(F.col("src").alias("s2"), "dst")
    pairs = (
        a.join(b, "dst")
        .where(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count("*").alias("c"))
    )
    return pairs.agg(
        F.sum(F.when(F.col("c") >= 2, 1).otherwise(0)).cast("long")
        .alias("n_wedge_pairs"),
        F.sum(F.expr("CAST(c * (c - 1) DIV 2 AS BIGINT)")).cast("long")
        .alias("n_butterflies"),
    )
