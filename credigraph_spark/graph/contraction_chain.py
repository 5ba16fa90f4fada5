"""Chain contraction: degree-2 path smoothing (WebGraph-style\ncompression primitive). See chain_contraction."""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from credigraph_spark.session import eager_checkpoint


def chain_contraction(edges: "DataFrame") -> "DataFrame":
    """Chain (degree-2 path) contraction — the WebGraph-style
    compression primitive: every maximal path of degree-2 vertices
    collapses to ONE weighted super-edge between its two terminal
    (non-degree-2) vertices, carrying the hop length; edges between
    terminals pass through with length 1. Pure degree-2 CYCLES have no
    terminals and are dropped (reported nowhere to attach). The typical
    crawl graph loses 20-40% of its vertices to chains, and every
    downstream distance/flow algorithm runs on the contracted graph
    with weights.

    Scale shape: one degree agg, hash-min CC restricted to the CHAIN
    subgraph (edges whose both endpoints have degree 2 — usually a tiny
    fraction of E), then one groupBy per chain to pick its two
    terminals (min/max attachment) and sum its length. Terminal
    attachments come from the chain/non-chain boundary edges — a single
    semi-join split of the edge set.

    Returns (src, dst, length) — the contracted undirected edge set,
    canonical src < dst; parallel contracted edges (two chains joining
    the same terminals, or a chain paralleling a direct edge) keep the
    MIN length, matching shortest-path semantics."""
    from credigraph_spark.graph.adjacency import undirected_simple
    from credigraph_spark.graph.components import connected_components

    und = undirected_simple(edges).persist()
    cnd = und.where(F.col("src") < F.col("dst")).persist()
    deg = und.groupBy(F.col("src").alias("vid")) \
             .agg(F.count("*").alias("deg"))
    chain_v = deg.where("deg = 2").select("vid").persist()

    is_a = chain_v.withColumnRenamed("vid", "src")
    is_b = chain_v.withColumnRenamed("vid", "dst")
    chain_e = cnd.join(is_a, "src", "semi").join(is_b, "dst", "semi") \
                 .select("src", "dst")
    # boundary: exactly one endpoint is a chain vertex
    bnd_a = (cnd.join(is_a, "src", "semi").join(is_b, "dst", "anti")
             .select(F.col("src").alias("cv"), F.col("dst").alias("term")))
    bnd_b = (cnd.join(is_a, "src", "anti").join(is_b, "dst", "semi")
             .select(F.col("dst").alias("cv"), F.col("src").alias("term")))
    boundary = bnd_a.unionByName(bnd_b)
    # through edges: neither endpoint is a chain vertex
    through = (cnd.join(is_a, "src", "anti").join(is_b, "dst", "anti")
               .select("src", "dst", F.lit(1).cast("long").alias("length")))

    # label every chain vertex with its chain id (isolated chain
    # vertices — between two terminals directly — form singleton chains)
    labels, _ = connected_components(chain_e, vertices=chain_v)
    lab = labels.select(F.col("vid").alias("cv"),
                        F.col("component").alias("chain"))
    # chain length in EDGES of the contracted super-edge =
    # (#chain vertices) + 1; internal chain edges = n_vertices - 1,
    # plus the two boundary hops
    nlen = lab.groupBy("chain").agg((F.count("*") + 1).cast("long")
                                    .alias("length"))
    # a proper chain has exactly two boundary attachments; cycles have 0
    att = (boundary.join(lab, "cv")
           .groupBy("chain")
           .agg(F.min("term").alias("t1"), F.max("term").alias("t2"),
                F.count("*").alias("n_att"))
           .where(F.col("n_att") == 2))
    contracted = (att.join(nlen, "chain")
                  .select(F.least("t1", "t2").alias("src"),
                          F.greatest("t1", "t2").alias("dst"), "length")
                  .where(F.col("src") != F.col("dst")))
    out = (through.unionByName(contracted)
           .groupBy("src", "dst").agg(F.min("length").alias("length")))
    out = out.transform(eager_checkpoint)
    for df in (und, cnd, chain_v):
        df.unpersist()
    return out
