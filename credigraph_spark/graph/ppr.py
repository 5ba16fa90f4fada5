"""Personalized PageRank (seed-restart random walk).

Standard PPR recurrence with the dangling mass restarted to the seed
distribution (so total mass stays 1):

    r_{t+1}(v) = (1-d)*p(v) + d * ( sum_{u->v} r_t(u)/outdeg(u)
                                    + dang_t * p(v) )
    p(v) = 1/|S| for seeds, 0 otherwise;  r_0 = p;
    dang_t = sum of r_t over vertices with no out-edges.

The reference repo has no PPR; this extends the PageRank family
(pagerank.py's semantics generalize: uniform p recovers G1) for
seed-centric relevance queries over the link graph.

Scale shape: edges cached hash-partitioned by src once; each iteration
is one state-to-edges join + one groupBy(dst) partial-aggregated sum —
O(|E|/cluster) shuffle. State is kept only for vertices with nonzero
rank (the reachable set of the seeds — often far smaller than |V|),
joined sparse exactly like pagerank's receiver state. The dangling sum
is a scalar aggregate per iteration; at 100 TB it would ride an
Observation on the contribution stream exactly as graph/pagerank.py
does (kept as a separate tiny job here for clarity — it aggregates the
sparse state, not the edges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from credigraph_spark.graph.adjacency import clean_edges, out_degrees


def personalized_pagerank(edges: DataFrame, seeds: DataFrame,
                          damping: float = 0.85, max_iter: int = 5,
                          num_partitions: int | None = None) -> DataFrame:
    """Returns (vid, rank) for every vertex with nonzero PPR mass after
    ``max_iter`` iterations (vertices the walk cannot reach are absent =
    exactly rank (1-d)*0 = 0)."""
    spark = edges.sparkSession
    shuffle_n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    e = clean_edges(edges)
    deg = out_degrees(e)
    ed = (
        e.join(deg.withColumnRenamed("vid", "src"), "src")
        .repartition(shuffle_n, "src")
        .persist()
    )
    ed.count()

    s = seeds.select(F.col(seeds.columns[0]).alias("vid")).distinct()
    n_seeds = s.count()
    if n_seeds == 0:
        ed.unpersist()
        return s.select("vid", F.lit(0.0).alias("rank"))
    p = 1.0 / n_seeds
    # teleport rows: static tiny table, broadcast into every update
    seed_rows = s.localCheckpoint(eager=True)

    state = seed_rows.select("vid", F.lit(p).alias("rank")).localCheckpoint(eager=True)
    for _ in range(max_iter):
        dang = (
            state.join(deg, "vid", "left_anti")
            .agg(F.sum("rank")).collect()[0][0] or 0.0
        )
        contribs = (
            ed.join(state.withColumnRenamed("vid", "src"), "src")
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.sum(F.col("rank") / F.col("out_deg")).alias("contrib"))
        )
        teleport = (1.0 - damping) * p + damping * dang * p
        state = (
            contribs.join(F.broadcast(seed_rows.withColumn("_seed", F.lit(True))),
                          "vid", "full")
            .select(
                "vid",
                (F.when(F.coalesce("_seed", F.lit(False)), F.lit(teleport))
                 .otherwise(0.0)
                 + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    ed.unpersist()
    return state
