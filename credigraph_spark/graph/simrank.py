"""Two-iteration SimRank with candidate pruning.

SimRank (Jeh & Widom 2002): s(a,b) = C/(|I(a)||I(b)|) Σ_{i∈I(a),j∈I(b)}
s(i,j), s(v,v) = 1, over in-neighborhoods I(·). Exact all-pairs SimRank
is O(V²) state — never viable at web scale. The standard scalable shape
(what this module implements) is candidate-generate-then-refine:

1. s₁ pass: first-iteration SimRank is closed-form — s₁(x,y) =
   C·|I(x)∩I(y)| / (|I(x)||I(y)|) — and only CO-CITED pairs (sharing at
   least one in-neighbor) are nonzero, so the full s₁ table is the
   cocitation join: one self-join on the in-edge list grouped by pair,
   map-side combinable, linear in Σ_v indeg(v)² (the same bound every
   cocitation/bibliographic-coupling system accepts, hub-cappable).
2. Candidate cut: keep the global top-``n_candidates`` pairs by
   (rounded s₁, pair) — a tiny sort on the aggregated pair table.
3. s₂ refinement, exact, only for candidates: s₂(a,b) =
   C/(|I(a)||I(b)|) · [ |I(a)∩I(b)| + Σ_{i∈I(a),j∈I(b), i≠j} s₁(i,j) ].
   The cross sum joins each candidate's two in-neighbor lists against
   the s₁ table — work bounded by n_candidates · d_a · d_b, independent
   of graph size.

Recall tradeoff, stated: a pair with NO shared in-neighbor has s₁ = 0
and is never a candidate, even though its s₂ can be positive (via
cocited in-neighbors). That is the price of s₁-based generation — the
same first-hop blocking every LSH/cocitation candidate scheme accepts.
The refined s₂ values themselves are exact (modulo s₁'s 6dp rounding,
which both engines share).

Everything is DataFrame joins/aggregations (no Python, no collect); the
one global sort ranks the already-aggregated candidate table.

Reference parity note: the reference has no SimRank (its analytics stop
at PageRank, tgrag/algorithms/pagerank.py); this extends the link-graph
family the same way HITS/SALSA/Katz do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from credigraph_spark.graph.adjacency import clean_edges

from credigraph_spark.session import eager_checkpoint

__all__ = ["simrank2_topk"]


def simrank2_topk(
    edges: DataFrame,
    c: float = 0.8,
    n_candidates: int = 100,
    k: int = 20,
    round_digits: int = 6,
) -> DataFrame:
    """Top-``k`` vertex pairs by 2-iteration SimRank (see module doc).

    Returns (a, b, common, s1, s2, rnk) with a < b, ranked by
    (s2 desc, a, b); ``common`` = |I(a)∩I(b)|, s1/s2 rounded to
    ``round_digits`` (the rounded s1 also drives the candidate cut, so
    the cut is deterministic across engines and partitionings)."""
    e = clean_edges(edges).dropDuplicates(["src", "dst"])
    # in-neighbor list as (v, i): i -> v
    inn = e.select(F.col("dst").alias("v"), F.col("src").alias("i")).persist()
    indeg = inn.groupBy("v").agg(F.count("*").alias("d"))

    pairs = (
        inn.alias("l").join(inn.alias("r"), F.col("l.i") == F.col("r.i"))
        .where(F.col("l.v") < F.col("r.v"))
        .groupBy(F.col("l.v").alias("a"), F.col("r.v").alias("b"))
        .agg(F.count("*").alias("common"))
    )
    s1_full = (
        pairs
        .join(indeg.select(F.col("v").alias("a"), F.col("d").alias("da")), "a")
        .join(indeg.select(F.col("v").alias("b"), F.col("d").alias("db")), "b")
        .select("a", "b", "common", "da", "db",
                F.round(c * F.col("common") / (F.col("da") * F.col("db")),
                        round_digits).alias("s1"))
        .persist()
    )
    # distributed top-N: TakeOrderedAndProject (per-partition heaps +
    # driver merge), NOT a single-partition window — (s1, a, b) is a
    # total order, so the cut is deterministic.
    cand = s1_full.orderBy(F.desc("s1"), "a", "b").limit(n_candidates)

    # cross term: for candidate (a,b), sum s1(i,j) over i in I(a),
    # j in I(b), i != j — s1 is canonical (x < y), probe both orders.
    # PRE-FILTER (guide §3.2): s1(i,j) is nonzero only when BOTH i and j
    # appear in some s1 pair, so each in-neighbor list is semi-joined
    # against the s1 pair-member set BEFORE the candidate cross product —
    # provably-zero probes are dropped pre-explosion instead of streaming
    # n_candidates·d² rows into a miss-heavy lookup (35M -> ~90k probe
    # rows at bench scale). Exact: dropped rows contribute 0.
    s1_lut = s1_full.select(F.col("a").alias("x"), F.col("b").alias("y"), "s1")
    mem = (s1_full.select(F.col("a").alias("i"))
           .unionByName(s1_full.select(F.col("b").alias("i")))
           .distinct())
    inn_s1 = inn.join(mem, "i", "semi")
    ij = (
        cand.select("a", "b")
        .join(inn_s1.select(F.col("v").alias("a"), F.col("i").alias("ia")), "a")
        .join(inn_s1.select(F.col("v").alias("b"), F.col("i").alias("ib")), "b")
        .where(F.col("ia") != F.col("ib"))
        .select("a", "b",
                F.least("ia", "ib").alias("x"),
                F.greatest("ia", "ib").alias("y"))
    )
    cross = (ij.join(s1_lut, ["x", "y"])
             .groupBy("a", "b").agg(F.sum("s1").alias("cross")))

    out = (
        cand.join(cross, ["a", "b"], "left")
        .select(
            "a", "b", "common", "s1",
            F.round(
                c * (F.col("common") + F.coalesce("cross", F.lit(0.0)))
                / (F.col("da") * F.col("db")),
                round_digits).alias("s2"))
    )
    # bounded input: <= n_candidates rows reach this window
    wk = Window.orderBy(F.desc("s2"), "a", "b")
    res = (out.withColumn("rnk", F.row_number().over(wk).cast("long"))
           .where(F.col("rnk") <= k)
           .select("a", "b", "common", "s1", "s2", "rnk"))
    res = res.transform(eager_checkpoint)  # materialize before releasing the caches
    inn.unpersist()
    s1_full.unpersist()
    return res
