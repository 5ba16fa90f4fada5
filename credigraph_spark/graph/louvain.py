"""Synchronous Louvain local-move community detection.

The modularity-gain counterpart of LPA (Blondel et al. 2008, "Fast
unfolding of communities in large networks", phase 1): every vertex moves
to the neighbouring community with the largest modularity gain

    ΔQ(u → c) ∝ w(u, c) − deg(u) · Σtot(c \\ u) / 2m

where ``w(u, c)`` is the number of edges from u into c, ``Σtot(c)`` the
total degree of c's members and ``2m`` the directed count of the
symmetrized edge set. Sequential Louvain moves one vertex at a time;
that is inherently serial, so this is the standard SYNCHRONOUS variant
(all vertices decide simultaneously against the previous round's
communities — the same parallel-update semantics our LPA uses, and the
usual distributed formulation, e.g. Spark/GraphX ports of Louvain).
Ties break on the smaller community id, so rounds are deterministic and
the whole unrolled recurrence replays in SQL (see
``__spark_entry__._louvain_sql``).

Scale shape per round (the same family as one LPA superstep):

* ``w(u, c)`` is one edge×state join + groupBy(src, community) with a
  map-side-combinable count;
* ``Σtot(c)`` is a groupBy(community) sum over the vertex-degree table —
  |V| rows, partial-aggregated;
* the per-vertex argmax is ONE ``max(struct(score, −community))`` —
  no window;
* the gain product ``deg(u) · Σtot`` is computed in DOUBLE (exact to
  2⁵³; the decimal-moment trick of ``analytics.degree_assortativity``
  applies if a graph ever exceeds that).

Reference scope: the reference repo (ekmpa/CrediGraph) has no community
detection at all; this completes the engine's community family
(LPA / weighted LPA / modularity scoring — SURVEY.md §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from credigraph_spark.graph.adjacency import clean_edges, symmetrize


def louvain_local_move(edges: DataFrame, rounds: int = 2) -> DataFrame:
    """(vid, community) after ``rounds`` synchronous local-move rounds
    from singleton communities on the cleaned undirected graph."""
    und = symmetrize(clean_edges(edges)).persist()
    two_m = float(und.count())
    deg = und.groupBy(F.col("src").alias("vid")).agg(
        F.count("*").alias("deg"))
    state = deg.select("vid", F.col("vid").alias("community"))
    for _ in range(rounds):
        # edges from u into each neighbouring community under `state`
        w_uc = (
            und.join(state.select(F.col("vid").alias("dst"),
                                  F.col("community").alias("c")), "dst")
            .groupBy(F.col("src").alias("vid"), "c")
            .agg(F.count("*").alias("w"))
        )
        tot = (state.join(deg, "vid")
               .groupBy(F.col("community").alias("c"))
               .agg(F.sum("deg").alias("tot")))
        # candidate set = neighbouring communities ∪ the current one
        # (w = 0 when u has no intra-community neighbour)
        cur = state.select("vid", F.col("community").alias("c"),
                           F.lit(0).alias("w0"))
        cand = (
            w_uc.join(cur, ["vid", "c"], "full_outer")
            .select("vid", "c", F.coalesce("w", "w0").alias("w"))
        )
        scored = (
            cand.join(tot, "c")
            .join(deg, "vid")
            .join(state, "vid")
            .select(
                "vid", "c",
                (F.col("w").cast("double")
                 - F.col("deg").cast("double")
                 * (F.col("tot") - F.when(F.col("c") == F.col("community"),
                                          F.col("deg")).otherwise(F.lit(0)))
                 .cast("double") / F.lit(two_m)).alias("score"),
            )
        )
        state = (
            scored.groupBy("vid")
            .agg(F.max(F.struct(F.col("score"), (-F.col("c")).alias("negc")))
                 .alias("best"))
            .select("vid", (-F.col("best.negc")).alias("community"))
            # eager checkpoint: `state` feeds THREE subplans next round
            # (w_uc, the candidate union, the scored join) — without it
            # each round re-executes the previous round's whole plan per
            # reference, exponential in rounds (measured 46x a PR
            # superstep at 20M edges before this line)
            .localCheckpoint(eager=True)
        )
    return state

def _local_move_weighted(ce: DataFrame, rounds: int) -> DataFrame:
    """Synchronous local move on a WEIGHTED symmetric graph ``ce``
    (src, dst, w) whose self-loop rows (src == dst) are stored once and
    already carry the doubled intra mass (the natural output of
    contracting a both-directions edge list): strength
    k(v) = Σ_all-rows w — so Σ k = 2m exactly as in the unweighted
    case. Used by :func:`louvain_two_level` for the coarse level."""
    deg = ce.groupBy(F.col("src").alias("vid")).agg(F.sum("w").alias("deg"))
    two_m = float(deg.agg(F.sum("deg")).collect()[0][0])
    nonself = ce.where(F.col("src") != F.col("dst"))
    state = deg.select("vid", F.col("vid").alias("community"))
    for _ in range(rounds):
        w_uc = (
            nonself.join(state.select(F.col("vid").alias("dst"),
                                      F.col("community").alias("c")), "dst")
            .groupBy(F.col("src").alias("vid"), "c")
            .agg(F.sum("w").alias("w"))
        )
        tot = (state.join(deg, "vid")
               .groupBy(F.col("community").alias("c"))
               .agg(F.sum("deg").alias("tot")))
        cur = state.select("vid", F.col("community").alias("c"),
                           F.lit(0).alias("w0"))
        cand = (
            w_uc.join(cur, ["vid", "c"], "full_outer")
            .select("vid", "c", F.coalesce("w", "w0").alias("w"))
        )
        scored = (
            cand.join(tot, "c").join(deg, "vid").join(state, "vid")
            .select(
                "vid", "c",
                (F.col("w").cast("double")
                 - F.col("deg").cast("double")
                 * (F.col("tot") - F.when(F.col("c") == F.col("community"),
                                          F.col("deg")).otherwise(F.lit(0)))
                 .cast("double") / F.lit(two_m)).alias("score"),
            )
        )
        state = (
            scored.groupBy("vid")
            .agg(F.max(F.struct(F.col("score"), (-F.col("c")).alias("negc")))
                 .alias("best"))
            .select("vid", (-F.col("best.negc")).alias("community"))
            .localCheckpoint(eager=True)
        )
    return state


def louvain_two_level(edges: DataFrame, rounds: int = 2,
                      coarse_rounds: int = 1) -> DataFrame:
    """Two-level Louvain (Blondel phase 1 + phase 2): ``rounds`` of
    synchronous local moves from singletons, then the community graph is
    CONTRACTED (edge weight = number of original directed-symmetrized
    edges between communities; intra mass lands on self-loop rows) and
    ``coarse_rounds`` of the weighted local move run on it. Returns
    (vid, community) with community = the coarse-level community of the
    vertex's phase-1 community — the multi-level modularity hierarchy
    the flat local move cannot reach."""
    s1 = louvain_local_move(edges, rounds=rounds)
    und = symmetrize(clean_edges(edges))
    ce = (
        und.join(s1.select(F.col("vid").alias("src"),
                           F.col("community").alias("cu")), "src")
        .join(s1.select(F.col("vid").alias("dst"),
                        F.col("community").alias("cv")), "dst")
        .groupBy(F.col("cu").alias("src"), F.col("cv").alias("dst"))
        .agg(F.count("*").alias("w"))
        .localCheckpoint(eager=True)
    )
    s2 = _local_move_weighted(ce, rounds=coarse_rounds)
    return (
        s1.join(s2.select(F.col("vid").alias("community"),
                          F.col("community").alias("c2")), "community")
        .select("vid", F.col("c2").alias("community"))
    )
