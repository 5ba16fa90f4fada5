"""Connected components via hash-min label exchange.

Not implemented anywhere in the reference (SURVEY.md §2.9 G5 — its
``build_from_BCC``, tgrag/utils/writers.py:49-57, only computes degrees);
semantics pinned by the north rule: label⁰(v)=vid, each superstep
label(v) = min(label(v), min over neighbors' labels) on the UNDIRECTED
edge set, until no label changes. Validated exactly against a pure-Python
union-find oracle.

Physical plan per superstep: one join (symmetrized edges ⋈ labels on src)
+ one min-aggregation by dst + one join back — all map-side-combinable,
so hub skew is absorbed by partial aggregation (messages are monotone
minima, no salting needed). Each superstep ALSO pointer-jumps
(label(v) := label(label(v)), one self-join) so chains collapse in
O(log diameter) rounds instead of O(diameter) — the converged labels are
identical to plain hash-min, only the round count shrinks. Symmetrized
edges are partitioned by src and cached once.

EXACTLY ONE driver action per superstep: the changed-label count rides as
an ``Observation`` on the same eager ``localCheckpoint`` job that
materializes the new state (the previous label is carried through the
plan as a ``prev`` column, so no separate compare-join/count job runs).
The localCheckpoint itself is required anyway — the pointer-jump
self-join references the state twice, so without per-step plan truncation
the logical plan doubles every round.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation, functions as F

from credigraph_spark.checkpoint import CheckpointStore
from credigraph_spark.session import aqe_paused
from credigraph_spark.graph.adjacency import clean_edges, symmetrize, vertices_from_edges


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iter: int = 200,
    ckpt: CheckpointStore | None = None,
    checkpoint_every: int = 5,
    resume: bool = True,
    num_partitions: int | None = None,
) -> tuple[DataFrame, dict]:
    """Returns (labels(vid, component), info). ``component`` = min vid of
    the vertex's component at convergence."""
    spark = edges.sparkSession
    shuffle_n = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))

    und = symmetrize(clean_edges(edges)).repartition(shuffle_n, "src").persist()
    verts = vertices_from_edges(und)
    if vertices is not None:
        verts = verts.unionByName(
            vertices.select(F.col(vertices.columns[0]).alias("vid"))
        ).distinct()
    verts = verts.repartition(shuffle_n, "vid").persist()
    n = verts.count()
    und.count()
    info: dict = {"n_vertices": n, "iterations": 0, "converged": n == 0}

    start_iter = 0
    labels = None
    if ckpt is not None and resume:
        done = ckpt.converged_iteration()
        if done is not None:
            # resume of an already-converged run: return the converged state
            # verbatim — re-running a superstep would drift by < tol and
            # burn a full pass.
            und.unpersist()
            verts.unpersist()
            info.update(iterations=done + 1, converged=True, resumed_from=done)
            return ckpt.read_state(spark, done), info
        last = ckpt.latest_iteration()
        if last is not None:
            labels = ckpt.read_state(spark, last)
            start_iter = last + 1
            info["resumed_from"] = last
    if labels is None:
        labels = verts.select("vid", F.col("vid").alias("component"))
    labels = labels.persist()

    it = start_iter
    converged = info["converged"]
    with aqe_paused(spark):
        while it < max_iter and not converged:
            t0 = time.time()
            # neighbor minima: message component(src) -> dst
            msgs = (
                und.join(labels.withColumnRenamed("vid", "src"), "src")
                .groupBy(F.col("dst").alias("vid"))
                .agg(F.min("component").alias("nbr_min"))
            )
            stepped = (
                labels.select("vid", F.col("component").alias("prev"))
                .join(msgs, "vid", "left")
                .select(
                    "vid", "prev",
                    F.least(F.col("prev"), F.coalesce("nbr_min", F.col("prev"))).alias("component"),
                )
                .persist()  # referenced twice below (direct + jump branch)
            )
            # pointer jumping: also adopt the label OF my current label vertex
            # (component values are always vids, so the self-join hits). This
            # collapses long chains in O(log diameter) supersteps instead of
            # O(diameter) — the difference between ~30 and ~10^5 rounds at
            # web scale.
            jump = stepped.select(F.col("vid").alias("component"), F.col("component").alias("_jump"))
            # ONE driver action: the eager localCheckpoint both truncates the
            # doubled plan AND fills the changed-count observation (prev label
            # is carried in the plan — no separate compare-join job).
            obs = Observation(f"cc_changed_{it}")
            new_labels = (
                stepped.join(jump, "component", "left")
                .select("vid", "prev",
                        F.least("component", F.coalesce("_jump", "component")).alias("component"))
                .observe(obs, F.sum((F.col("component") != F.col("prev")).cast("long")).alias("changed"))
                .select("vid", "component")
                .localCheckpoint(eager=True)
            )
            stepped.unpersist()
            changed = obs.get["changed"] or 0
            labels.unpersist()
            labels = new_labels
            converged = changed == 0
            it += 1
            info["iterations"] = it

            if ckpt is not None and (converged or it % checkpoint_every == 0 or it >= max_iter):
                labels = ckpt.write_state(labels, it - 1)
                ckpt.append_metrics(
                    it - 1,
                    {"algo": "cc", "changed": changed, "rows": n,
                     "wall_ms": (time.time() - t0) * 1e3, "converged": converged},
                )
                if converged:
                    ckpt.mark_converged(it - 1)

    info["converged"] = converged
    und.unpersist()
    verts.unpersist()
    return labels, info
