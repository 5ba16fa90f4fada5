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

* SPARSE state: only vertices with in-edges ("receivers") carry a rank
  row. Every non-receiver has the identical analytic rank
  ``base + d*dangling/N`` (zero contributions), so the whole non-receiver
  population is ONE scalar + a static count — no all-vertices join per
  superstep, and the shuffled state is exactly the receiver set;
* contributions are one join + one aggregation per superstep:
  ``edges ⋈ rank on src`` (left join; missing src = non-receiver =
  scalar default) then ``groupBy(dst).sum(rank/out_deg)`` — the
  aggregation output is by construction exactly the receiver set;
* the edge table is pre-joined with out-degrees, hash-repartitioned by
  ``src`` and cached ONCE, so each superstep only shuffles rank state;
* exactly ONE driver action per superstep: the convergence L1 and the NEXT
  superstep's dangling mass come out of the same aggregation over the
  prev⋈new join (sparse parts) plus closed-form non-receiver terms;
  iteration 0's dangling mass is analytic (n_dangling / N);
* hub-vertex in-degree skew: optional two-phase salted aggregation
  (north rule) — partial-sum on (dst, salt) then final-sum on dst;
* per-superstep checkpoints (full vid,rank table) to the CheckpointStore:
  lineage truncation + resume + metrics; localCheckpoint truncation when
  no durable store is attached (plans otherwise grow per superstep).
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
    """Returns (ranks(vid, rank) for ALL vertices, info dict).

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

    # receivers (have in-edges) carry sparse state, flagged with
    # dangling = no out-edges; both sets are static across supersteps.
    receivers = e.select(F.col("dst").alias("vid")).distinct()
    recv_flags = (
        receivers.join(deg, "vid", "left")
        .select("vid", F.col("out_deg").isNull().alias("dangling"))
        .repartition(shuffle_n, "vid")
        .persist()
    )
    n_recv = recv_flags.count()
    n_recv_dangling = recv_flags.where("dangling").count()

    nonrecv = verts.join(receivers, "vid", "left_anti").persist()
    m = nonrecv.count()
    m_dangling = nonrecv.join(deg, "vid", "left_anti").count()

    n = n_recv + m
    info: dict = {
        "n_vertices": n, "n_receivers": n_recv, "n_nonreceivers": m,
        "n_dangling": n_recv_dangling + m_dangling,
        "iterations": 0, "converged": n <= 0, "l1_history": [],
    }
    if n == 0:
        return verts.select("vid", F.lit(0.0).alias("rank")), info

    edges_deg = (
        e.join(deg.withColumnRenamed("vid", "src"), "src")
        .repartition(shuffle_n, "src")
        .persist()
    )
    info["n_edges"] = edges_deg.count()
    base = (1.0 - damping) / n

    def full_rank(sparse: DataFrame, default: float) -> DataFrame:
        out = sparse.select("vid", "rank")
        if m > 0:
            out = out.unionByName(nonrecv.select("vid", F.lit(default).alias("rank")))
        return out

    # -- initial / resumed state ------------------------------------------
    start_iter = 0
    sparse = None
    default = 1.0 / n
    dangling_sum = info["n_dangling"] * (1.0 / n)  # analytic under uniform init
    if ckpt is not None and resume:
        last = ckpt.latest_iteration()
        if last is not None:
            full = ckpt.read_state(spark, last)
            sparse = (
                full.join(recv_flags, "vid")
                .select("vid", "rank", "dangling")
                .repartition(shuffle_n, "vid")
                .persist()
            )
            if m > 0:
                default = full.join(nonrecv, "vid", "left_semi").select("rank").first()["rank"]
            recv_dang = (
                sparse.where("dangling").agg(F.sum("rank")).collect()[0][0] or 0.0
            )
            dangling_sum = recv_dang + m_dangling * default
            start_iter = last + 1
            info["resumed_from"] = last
    if sparse is None:
        sparse = recv_flags.select("vid", F.lit(1.0 / n).alias("rank"), "dangling").persist()

    converged = info["converged"]
    it = start_iter
    while it < max_iter and not converged:
        t0 = time.time()
        src_rank = (
            edges_deg.join(
                sparse.select(F.col("vid").alias("src"), "rank"), "src", "left"
            )
            .select(
                "src", "dst",
                (F.coalesce(F.col("rank"), F.lit(default)) / F.col("out_deg")).alias("c"),
            )
        )
        if salt_buckets > 0:
            # two-phase salted aggregation for hub dst skew (SURVEY.md §4)
            contribs = (
                src_rank
                .withColumn("_salt", F.pmod(F.xxhash64("src"), F.lit(salt_buckets)))
                .groupBy("dst", "_salt").agg(F.sum("c").alias("c"))
                .groupBy("dst").agg(F.sum("c").alias("contrib"))
            )
        else:
            contribs = src_rank.groupBy("dst").agg(F.sum("c").alias("contrib"))

        default_new = base + damping * (dangling_sum / n)
        new_sparse = (
            contribs.select(
                F.col("dst").alias("vid"),
                (F.lit(base) + F.lit(damping) * (
                    F.col("contrib") + F.lit(dangling_sum / n)
                )).alias("rank"),
            )
            .join(recv_flags, "vid")  # attach static dangling flag
            .persist()
        )

        # ONE action: sparse L1 + sparse part of next dangling mass.
        agg = (
            sparse.select("vid", F.col("rank").alias("prev"))
            .join(new_sparse, "vid")
            .agg(
                F.sum(F.abs(F.col("rank") - F.col("prev"))).alias("l1"),
                F.sum(F.when(F.col("dangling"), F.col("rank")).otherwise(0.0)).alias("dang"),
            )
            .collect()[0]
        )
        l1 = (agg["l1"] or 0.0) + m * abs(default_new - default)
        next_dangling = (agg["dang"] or 0.0) + m_dangling * default_new
        sparse.unpersist()
        sparse = new_sparse
        default = default_new
        converged = l1 < tol
        it += 1
        info["iterations"] = it
        info["l1_history"].append(l1)

        if ckpt is not None and (converged or it % checkpoint_every == 0 or it >= max_iter):
            full = ckpt.write_state(full_rank(sparse, default), it - 1)
            ckpt.append_metrics(
                it - 1,
                {"algo": "pagerank", "l1_diff": l1, "dangling_mass": dangling_sum,
                 "wall_ms": (time.time() - t0) * 1e3, "rows": n,
                 "converged": converged},
            )
            truncated = (
                full.join(recv_flags, "vid").select("vid", "rank", "dangling")
                .repartition(shuffle_n, "vid").persist()
            )
            new_sparse.unpersist()
            sparse = truncated
        elif it % checkpoint_every == 0:
            # no durable store: still truncate lineage (plans grow per step)
            truncated = sparse.localCheckpoint(eager=True)
            new_sparse.unpersist()
            sparse = truncated
        dangling_sum = next_dangling

    info["converged"] = converged
    result = full_rank(sparse, default)
    edges_deg.unpersist()
    return result, info
