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

— all integer arithmetic, exact in any engine. The SAME butterflies are
equally counted from the destination side (pairs of dsts sharing >= 2
sources), so the wedge join can be ORIENTED to whichever side has the
smaller sum of squared degrees (Wang et al., VLDB 2019) — on the bench
graph (part->supplier) the source orientation materializes ~20x fewer
wedge rows than the supplier side.

Scale shape: the wedge join (e ⋈ e on the pivot column) materializes
sum_p C(deg_p, 2) wedge rows — the same cost envelope as triangle
counting's wedge step, partial-aggregatable by the vertex pair. On web
graphs the few mega-degree pivot hubs dominate that sum; ``hub_cap``
(count only wedges through pivots with degree <= cap) is the standard
approximation switch (KDD'18 vertex-priority variant) — default None =
exact, which is also the oracle-checked contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from credigraph_spark.graph.adjacency import clean_edges


def butterfly_count(edges: DataFrame, hub_cap: int | None = None,
                    orient: str = "src") -> DataFrame:
    """One-row (n_wedge_pairs, n_butterflies). ``orient`` picks the wedge
    pivot: 'src' pairs sources by common out-neighbor (the oracle-checked
    contract), 'dst' pairs destinations by common source, 'auto' measures
    sum(deg^2) on both sides (two tiny aggregates) and takes the cheaper —
    n_butterflies is identical in every orientation; n_wedge_pairs counts
    the chosen orientation's >=2-common-neighbor pairs."""
    e = clean_edges(edges)
    if orient == "auto":
        # orientation 'src' pivots on dst (wedges = sum indeg^2); 'dst'
        # pivots on src (wedges = sum outdeg^2) — pick the smaller pivot.
        cost_dst_pivot = e.groupBy("dst").agg(F.count("*").alias("d")).agg(
            F.sum(F.col("d") * F.col("d"))).collect()[0][0] or 0
        cost_src_pivot = e.groupBy("src").agg(F.count("*").alias("d")).agg(
            F.sum(F.col("d") * F.col("d"))).collect()[0][0] or 0
        orient = "src" if cost_dst_pivot <= cost_src_pivot else "dst"
    pivot, side = ("dst", "src") if orient == "src" else ("src", "dst")
    if hub_cap is not None:
        keep = (e.groupBy(pivot).agg(F.count("*").alias("deg"))
                .where(F.col("deg") <= hub_cap).select(pivot))
        e = e.join(keep, pivot, "left_semi")
    a = e.select(F.col(side).alias("s1"), pivot)
    b = e.select(F.col(side).alias("s2"), pivot)
    pairs = (
        a.join(b, pivot)
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
