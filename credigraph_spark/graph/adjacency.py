"""Adjacency / degree primitives shared by all graph algorithms.

The reference builds adjacency as driver-side Python dicts
(tgrag/utils/pagerank_utils.py:156-186: out-neighbor SETS, in-neighbor
lists); here each form is a DataFrame:

* flat deduped edge table ``(src, dst)``           — the working form every
  iterative algorithm joins against (one row per distinct edge, so
  ``count per src`` IS the distinct-successor out-degree the reference
  uses, pagerank_utils.py:178-181);
* grouped CSR-style ``(src, dsts array, out_deg)`` — provided for API
  parity with the north rule; note hub vertices make ``collect_set`` a
  skew hazard, so the hot paths use the flat form + salted aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def clean_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Dedup + drop self-loops + drop nulls (pagerank_utils.py:141-150)."""
    return (
        edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected view: union of (s,t) and (t,s), deduped."""
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return edges.select("src", "dst").unionByName(rev).dropDuplicates(["src", "dst"])


def undirected_simple(edges: DataFrame) -> DataFrame:
    """``symmetrize(clean_edges(edges))`` in ONE dedup shuffle instead of
    two: canonicalize each raw edge to its unordered (least, greatest)
    form, dedup the canonical half (|E| rows shuffled, not |E| + 2|E|),
    then mirror shuffle-free. Same output set — both directions of every
    non-loop edge, exactly once."""
    canon = (edges
             .where(F.col("src").isNotNull() & F.col("dst").isNotNull()
                    & (F.col("src") != F.col("dst")))
             .select(F.least("src", "dst").alias("src"),
                     F.greatest("src", "dst").alias("dst"))
             .dropDuplicates(["src", "dst"]))
    return canon.unionByName(
        canon.select(F.col("dst").alias("src"), F.col("src").alias("dst")))


def out_degrees(edges: DataFrame) -> DataFrame:
    """(vid, out_deg) — distinct successors, assuming cleaned edges (A4)."""
    return edges.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("out_deg"))


def in_degrees(edges: DataFrame) -> DataFrame:
    return edges.groupBy(F.col("dst").alias("vid")).agg(F.count("*").alias("in_deg"))


def degrees(edges: DataFrame) -> DataFrame:
    """(vid, in_deg, out_deg) with 0 fill — full-outer merge of the two
    one-sided counts (the reference does this with external Unix sort +
    a hand-written two-pointer merge, tgrag/utils/writers.py:109-167;
    Catalyst's sort-merge join replaces all of it)."""
    return (
        out_degrees(edges)
        .join(in_degrees(edges), "vid", "full_outer")
        .select(
            "vid",
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
        )
    )


def vertices_from_edges(edges: DataFrame) -> DataFrame:
    """Distinct endpoint set (vid) — pagerank_utils.py:124-138 analog."""
    return (
        edges.select(F.col("src").alias("vid"))
        .unionByName(edges.select(F.col("dst").alias("vid")))
        .distinct()
    )


def build_adjacency(edges: DataFrame) -> DataFrame:
    """CSR-style grouped adjacency (src, dsts array<long>, out_deg int) —
    A4/A5 in SURVEY.md §2.4 (reference: groupby('src')['dst'].apply(set))."""
    return edges.groupBy("src").agg(
        F.collect_set("dst").alias("dsts"),
        F.count("*").alias("out_deg"),
    )
