"""Temporal motif counting (Paranjape, Benson & Leskovec, WSDM 2017,
restricted to the two 3-edge triangle motifs): how often does u→v
happen, THEN v→w, THEN an edge closing the triangle — all inside a
δ window? The cyclic close (w→u) vs the feed-forward close (u→w)
distinguishes feedback from broadcast dynamics in a crawl/link stream;
the static triad census (graph/triangles.py:directed_triad_census) is
the time-blind version of this.

Engine shape: edges collapse to FIRST-CONTACT (u, v, min ts) — one
partial-aggregatable shuffle that also makes the motif well-defined on
multigraph streams. Wedges are one co-keyed join with the δ window and
strict time order applied IN the join condition (Catalyst pushes the
band predicate into the sort-merge join, so only in-window pairs
materialize — the window, not a degree cap, is the blowup control;
δ plays the role the hot-bucket cap plays for LSH). The wedge table is
eager-localCheckpointed because BOTH closes consume it (the Louvain
two-subplan lesson), and each close is one join + one partial-agg
count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from credigraph_spark.session import eager_checkpoint


def temporal_triangles(edges: DataFrame, delta: int,
                       src: str = "src", dst: str = "dst",
                       ts: str = "ts") -> DataFrame:
    """One row: (n_wedges, n_cyclic, n_feedforward).

    Over first-contact edges (u, v, t) = min-ts per distinct ordered
    pair (self-loops/nulls dropped):

    * wedge:        u→v at t1, v→w at t2,  w ≠ u,  t1 < t2 ≤ t1 + δ
    * cyclic:       wedge + w→u at t3,      t2 < t3 ≤ t1 + δ
    * feed-forward: wedge + u→w at t3,      t2 < t3 ≤ t1 + δ

    ``ts`` must be integer-comparable (epoch days/seconds); δ is in the
    same unit. Strictly increasing times, window measured from t1 —
    the standard δ-motif semantics."""
    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"),
                      F.col(ts).cast("long").alias("t"))
         .where(F.col("u").isNotNull() & F.col("v").isNotNull()
                & (F.col("u") != F.col("v")))
         .groupBy("u", "v").agg(F.min("t").alias("t")))
    e = e.transform(eager_checkpoint)  # three consumers: wedge + 2 closes
    e2 = e.select(F.col("u").alias("v"), F.col("v").alias("w"),
                  F.col("t").alias("t2"))
    wedge = (e.withColumnRenamed("t", "t1").join(e2, "v")
             .where((F.col("w") != F.col("u"))
                    & (F.col("t2") > F.col("t1"))
                    & (F.col("t2") <= F.col("t1") + F.lit(delta)))
             .select("u", "v", "w", "t1", "t2")
             .transform(eager_checkpoint))
    e3c = e.select(F.col("u").alias("w"), F.col("v").alias("u"),
                   F.col("t").alias("t3"))
    cyc = (wedge.join(e3c, ["w", "u"])
           .where((F.col("t3") > F.col("t2"))
                  & (F.col("t3") <= F.col("t1") + F.lit(delta)))
           .agg(F.count("*").alias("n_cyclic")))
    e3f = e.select(F.col("u").alias("u"), F.col("v").alias("w"),
                   F.col("t").alias("t3"))
    ff = (wedge.join(e3f, ["u", "w"])
          .where((F.col("t3") > F.col("t2"))
                 & (F.col("t3") <= F.col("t1") + F.lit(delta)))
          .agg(F.count("*").alias("n_feedforward")))
    nw = wedge.agg(F.count("*").alias("n_wedges"))
    return nw.crossJoin(cyc).crossJoin(ff)
