"""Distributed PageRank with the reference's exact numeric semantics.

Reference algorithm (pandas, single-threaded): tgrag/algorithms/pagerank.py
:79-157 + tgrag/utils/pagerank_utils.py:83-216. Semantics reproduced here
(BASELINE.json: per-vertex allclose 1e-6 at convergence):

* preprocessing: dedupe edges keep-first, drop self-loops, vertex set =
  given vertices ∪ edge endpoints (pagerank_utils.py:83-153);
* out-degree counts DISTINCT successors (pagerank_utils.py:178-181);
* init rank = 1/N (pagerank.py:114);
* per iteration (pagerank.py:89-99,117-135):
      dangling = Σ rank[v] over out_deg(v)=0
      new[v]   = (1-d)/N + d * (Σ_{u→v} rank[u]/out_deg[u] + dangling/N)
* converged iff Σ_v |new-old| < tol (pagerank_utils.py:208-216);
* defaults d=0.85, max_iter=100, tol=1e-6 (pagerank.py:49-65).

Spark-first physical design (NOT a port of the per-node Python loop):

* contributions are one join + one aggregation per superstep —
  ``edges ⋈ rank on src`` then ``groupBy(dst).sum(rank/out_deg)``;
* the edge table is pre-joined with out-degrees, hash-repartitioned by
  ``src`` and cached ONCE, so each superstep only shuffles the rank state;
* exactly ONE driver action per superstep: the convergence L1 and the NEXT
  superstep's dangling mass come out of the same aggregation over the
  prev⋈new rank join (iteration 0's dangling mass is analytic:
  n_dangling / N under the uniform init);
* hub-vertex in-degree skew: optional two-phase salted aggregation
  (north rule) — partial sums on (dst, salt) then final sum on dst;
* per-superstep checkpoints to the CheckpointStore (lineage truncation +
  resume + metrics).
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, functions as F

from credigraph_spark.checkpoint import CheckpointStore
from credigraph_spark.graph.adjacency import clean_edges, out_degrees, vertices_from_edges


def pagerank(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    ckpt: CheckpointStore | None = None,
    checkpoint_every: int = 5,
    salt_buckets: int = 0,
    resume: bool = True,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict]:
    """Returns (ranks(vid, rank), info dict).

    ``vertices``: optional single-column DataFrame of extra vids; edge
    endpoints are always added (J10 semantics, pagerank_utils.py:124-138).
    ``salt_buckets`` > 0 enables two-phase salted contribution aggregation.
    """
    spark = edges.sparkSession
    shuffle_n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    e = clean_edges(edges)
    verts = vertices_from_edges(e)
    if vertices is not None:
        verts = verts.unionByName(
            vertices.select(F.col(vertices.columns[0]).alias("vid"))
        ).distinct()

    deg = out_degrees(e)
    # vertex table with the dangling flag (out_deg == 0) attached once —
    # lets every superstep fold the dangling-mass sum into its L1 action.
    verts = (
        verts.join(deg, "vid", "left")
        .select("vid", F.col("out_deg").isNull().alias("dangling"))
        .repartition(shuffle_n, "vid")
        .persist()
    )
    n = verts.count()
    info: dict = {"n_vertices": n, "iterations": 0, "converged": n <= 0, "l1_history": []}
    if n == 0:
        return verts.select("vid", F.lit(0.0).alias("rank")), info
    n_dangling = verts.where("dangling").count()
    info["n_dangling"] = n_dangling

    # Edges with the contributor's out-degree attached, partitioned by src
    # and cached: the per-superstep join reuses this exchange, only the
    # rank side moves.
    edges_deg = (
        e.join(deg.withColumnRenamed("vid", "src"), "src")
        .repartition(shuffle_n, "src")
        .persist()
    )
    info["n_edges"] = edges_deg.count()

    start_iter = 0
    rank = None
    dangling_sum = n_dangling * (1.0 / n)  # analytic under uniform init
    if ckpt is not None and resume:
        last = ckpt.latest_iteration()
        if last is not None:
            rank = ckpt.read_state(spark, last).repartition(shuffle_n, "vid")
            start_iter = last + 1
            info["resumed_from"] = last
            dangling_sum = (
                rank.join(verts.where("dangling"), "vid", "left_semi")
                .agg(F.sum("rank")).collect()[0][0]
            ) or 0.0
    if rank is None:
        rank = verts.select("vid", F.lit(1.0 / n).alias("rank"))
    rank = rank.persist()

    converged = info["converged"]
    it = start_iter
    while it < max_iter and not converged:
        t0 = time.time()
        contribs_in = (
            edges_deg.join(rank.withColumnRenamed("vid", "src"), "src")
            .select("src", "dst", (F.col("rank") / F.col("out_deg")).alias("c"))
        )
        if salt_buckets > 0:
            # two-phase salted aggregation for hub dst skew (SURVEY.md §4):
            # partial sums spread a hot dst key over `salt_buckets` reducers.
            contribs = (
                contribs_in
                .withColumn("_salt", F.pmod(F.xxhash64("src"), F.lit(salt_buckets)))
                .groupBy("dst", "_salt").agg(F.sum("c").alias("c"))
                .groupBy("dst").agg(F.sum("c").alias("contrib"))
            )
        else:
            contribs = contribs_in.groupBy("dst").agg(F.sum("c").alias("contrib"))

        base = (1.0 - damping) / n
        new_rank = (
            verts.join(contribs.withColumnRenamed("dst", "vid"), "vid", "left")
            .select(
                "vid",
                "dangling",
                (F.lit(base) + F.lit(damping) * (
                    F.coalesce(F.col("contrib"), F.lit(0.0)) + F.lit(dangling_sum / n)
                )).alias("rank"),
            )
            .persist()
        )

        # ONE action: convergence L1 + next superstep's dangling mass.
        agg = (
            rank.select("vid", F.col("rank").alias("prev"))
            .join(new_rank, "vid")
            .agg(
                F.sum(F.abs(F.col("rank") - F.col("prev"))).alias("l1"),
                F.sum(F.when(F.col("dangling"), F.col("rank")).otherwise(0.0)).alias("dang"),
            )
            .collect()[0]
        )
        l1, next_dangling = agg["l1"], agg["dang"] or 0.0
        rank.unpersist()
        rank = new_rank.drop("dangling")
        converged = l1 < tol
        it += 1
        info["iterations"] = it
        info["l1_history"].append(l1)

        if ckpt is not None and (converged or it % checkpoint_every == 0 or it >= max_iter):
            rank = ckpt.write_state(rank, it - 1)  # fresh lineage
            new_rank.unpersist()
            ckpt.append_metrics(
                it - 1,
                {"algo": "pagerank", "l1_diff": l1, "dangling_mass": dangling_sum,
                 "wall_ms": (time.time() - t0) * 1e3, "rows": n,
                 "converged": converged},
            )
        elif it % checkpoint_every == 0:
            # no durable store: still truncate lineage — iterative plans grow
            # per superstep and Catalyst analysis cost compounds without this.
            truncated = rank.localCheckpoint(eager=True)
            new_rank.unpersist()
            rank = truncated
        dangling_sum = next_dangling

    info["converged"] = converged
    verts.unpersist()
    edges_deg.unpersist()
    return rank, info
