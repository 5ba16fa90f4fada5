"""Weisfeiler-Leman (1-WL) color refinement — structural-role
fingerprinting over the undirected simple graph.

The canonical structural primitive: iteratively recolor every vertex by
hashing its own color together with the MULTISET of its neighbours'
colors. Vertices that 1-WL cannot distinguish end in the same color
class — the exact expressiveness ceiling of message-passing GNNs, the
standard graph-isomorphism pre-test, and a role-equivalence feature
(same color = same local structure to radius r).

Scale design: the textbook formulation sorts each vertex's neighbour
color list — a per-vertex array that explodes on hubs. Here the
multiset is combined ORDER-INDEPENDENTLY instead: each neighbour color
hashes to a 60-bit integer (first 15 hex chars of md5 — the engine's
portable-hash convention), the multiset becomes the EXACT decimal sum of
those integers plus the neighbour count, and the new color is
md5(old_color : sum : count). Sum and count are map-side-combinable
aggregates, so a superstep is ONE groupBy with constant per-vertex
state — hub-skew-safe, no arrays, no sorting. Distinct multisets
collide only if their 60-bit hash sums tie (negligible; and a collision
only MERGES classes — it can never split one, so the refinement stays
sound as an equivalence upper bound).

Round 0 color = degree (as a string), the standard initialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from credigraph_spark.graph.adjacency import undirected_simple


def _h60(col):
    """Portable 60-bit hash of a string column (md5 first 15 hex)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def wl_refinement(edges: DataFrame, rounds: int = 3) -> DataFrame:
    """Returns (vid, color, class_size) after ``rounds`` refinement
    rounds; ``color`` is a 16-hex-char canonical class id, class_size
    the number of vertices sharing it."""
    und = undirected_simple(edges).persist()
    colors = (und.groupBy(F.col("src").alias("vid"))
              .agg(F.count("*").alias("_d"))
              .select("vid", F.col("_d").cast("string").alias("color")))
    for _ in range(rounds):
        msgs = (und.join(colors.withColumnRenamed("vid", "dst")
                         .withColumnRenamed("color", "_nc"), "dst")
                .groupBy(F.col("src").alias("vid"))
                .agg(F.sum(_h60(F.col("_nc")).cast("decimal(38,0)"))
                     .alias("_s"),
                     F.count("*").alias("_n")))
        colors = (colors.join(msgs, "vid")
                  .select("vid",
                          F.substring(
                              F.md5(F.concat_ws(
                                  ":", "color",
                                  F.col("_s").cast("string"),
                                  F.col("_n").cast("string"))), 1, 16)
                          .alias("color"))
                  .localCheckpoint(eager=True))
    sizes = colors.groupBy("color").agg(F.count("*").alias("class_size"))
    out = colors.join(sizes, "color").select("vid", "color", "class_size")
    out = out.localCheckpoint(eager=True)
    und.unpersist()
    return out
