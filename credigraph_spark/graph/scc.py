"""Strongly connected components + Broder bow-tie decomposition.

Not implemented anywhere in the reference (its graph layer computes only
degrees — tgrag/utils/writers.py:49-57); SCC is the missing primitive for
the classic webgraph structure analysis (Broder et al., "Graph structure
in the Web", WWW 2000): the bow-tie of CORE / IN / OUT / OTHER that any
link-credibility study reports. Algorithm: distributed trim + forward-max
coloring + backward reach (Orzan's coloring SCC; the FW-BW family of
Slota et al.), expressed as DataFrame supersteps.

Per phase on the remaining subgraph:

1. **Trim fixpoint** — vertices with no in-edge or no out-edge are
   singleton SCCs; peel until none remain. On web-like graphs this
   removes the huge acyclic fringe (tendrils/IN/OUT leaves) before any
   label exchange happens, and it is what bounds the phase count: after
   a full trim, every remaining vertex lies on a cycle.
2. **Coloring fixpoint** — color(v) := max vid over v's discovered
   ancestors ∪ {v}, propagated forward (one join + map-side-combinable
   max agg per superstep) with pointer jumping (color(v) :=
   max(color(v), color(color(v))) — colors are vids, so the self-join
   hits; valid because ancestors of my ancestor are my ancestors), so
   the fixpoint lands in O(log diameter) supersteps.
3. **Backward reach** — roots are vertices with color == vid. Restrict
   edges to color-equal endpoints (colors are frozen now, so ONE triplet
   join builds the subgraph), then flood a boolean backward from the
   roots. Everything reached is the root's SCC: extract with
   scc_id = color, remove, next phase.

``scc_id`` is therefore the MAX vid in the SCC (a root is extracted only
once every higher-vid external ancestor is gone, at which point its color
is the component's own maximum) — deterministic, and expressible in
DuckDB as ``greatest(vid, max(mutually-reachable vid))`` for the oracle.

One driver action per superstep in each fixpoint: the changed/kept count
rides an Observation on the eager localCheckpoint that truncates the
per-round plan (same contract as components.py). Trimmed-singleton labels
are derived once per phase as ``verts@phase-start ANTI verts@post-trim``
(no per-round label unions, so lineage stays flat however many trim
rounds run). Messages are monotone maxima / boolean ORs — partial
aggregation absorbs hub skew, no salting needed. A phase-count cap guards
the theoretical worst case (a condensation chain in descending-vid order
needs O(chain) phases); real web graphs finish in a handful of phases
because one giant SCC and the trimmed fringe dominate.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame, Observation, functions as F

from credigraph_spark.session import adaptive_partitions, eager_checkpoint, loop_tuning
from credigraph_spark.graph.adjacency import clean_edges, vertices_from_edges
from credigraph_spark.graph.pregel import aggregate_messages, triplets


def _ckpt_observe(df: DataFrame, obs_name: str, *metrics):
    """Eager localCheckpoint with an Observation riding the same job."""
    obs = Observation(obs_name)
    out = df.observe(obs, *metrics).transform(eager_checkpoint)
    return out, obs.get


def _induced(e: DataFrame, verts: DataFrame) -> DataFrame:
    """Edges with both endpoints in verts (two semi joins)."""
    return (e.join(verts.withColumnRenamed("vid", "src").hint("shuffle_hash"),
                  "src", "semi")
             .join(verts.withColumnRenamed("vid", "dst").hint("shuffle_hash"),
                   "dst", "semi"))


def strongly_connected_components(
    edges: DataFrame,
    max_phases: int = 30,
    max_steps: int = 200,
    trim_rounds: int = 100,
) -> tuple[DataFrame, dict]:
    """Returns (labels(vid, scc_id), info). ``scc_id`` = max vid of the
    vertex's strongly connected component. Every vertex appearing as an
    edge endpoint gets a row; trivial (singleton) SCCs included."""
    spark = edges.sparkSession
    # partition the phase loop by the MEASURED edge count (scale-adaptive,
    # the connected_components discipline): small graphs run few tasks per
    # superstep, web-scale graphs derive thousands
    e0 = clean_edges(edges).persist()
    n_e = e0.count()
    shuffle_n = adaptive_partitions(n_e)
    e = e0.repartition(shuffle_n, "src").persist()
    verts = vertices_from_edges(e).repartition(shuffle_n, "vid").persist()
    n = verts.count()
    e.count()
    e0.unpersist()
    info: dict = {"n_vertices": n, "phases": 0, "supersteps": 0,
                  "converged": n == 0, "phase_extracted": []}

    done: DataFrame | None = None
    phase = 0
    with loop_tuning(spark, shuffle_n):
        while phase < max_phases and n > 0:
            t0 = time.time()
            verts_start, n_start = verts, n   # stays persisted through phase

            # ---- 1. trim fixpoint: no-in or no-out vertices are singletons
            for _ in range(trim_rounds):
                on_cycle_side = (e.select("src").distinct()
                                 .join(e.select(F.col("dst").alias("src"))
                                        .distinct(), "src", "semi")
                                 .withColumnRenamed("src", "vid"))
                kept, m = _ckpt_observe(
                    verts.join(on_cycle_side.hint("shuffle_hash"), "vid", "semi"),
                    f"scc_trim_{phase}_{info['supersteps']}",
                    F.count("vid").alias("n"))
                info["supersteps"] += 1
                n_kept = m["n"] or 0
                if verts is not verts_start:
                    verts.unpersist()
                verts = kept.persist()
                if n_kept in (n, 0):
                    n = n_kept
                    break
                new_e = _induced(e, verts).transform(eager_checkpoint)
                e.unpersist()
                e = new_e.persist()
                n = n_kept

            members = None
            colors = None
            if n > 0:
                # ---- 2. coloring fixpoint: forward max + pointer jump
                colors = verts.select("vid", F.col("vid").alias("color")).persist()
                for _ in range(max_steps):
                    msgs = aggregate_messages(
                        e, colors, to_dst=F.col("src_color"),
                        agg={"nbr_max": F.max}, attach=("src",), how="inner",
                    )
                    stepped = (
                        colors.select("vid", F.col("color").alias("prev"))
                        .join(msgs, "vid", "left")
                        .select("vid", "prev",
                                F.greatest(F.col("prev"),
                                           F.coalesce("nbr_max", F.col("prev"))
                                           ).alias("color"))
                        .persist()
                    )
                    jump = stepped.select(F.col("vid").alias("color"),
                                          F.col("color").alias("_jump"))
                    new_colors, m = _ckpt_observe(
                        stepped.join(jump.hint("shuffle_hash"), "color", "left")
                        .select("vid", "prev",
                                F.greatest("color", F.coalesce("_jump", "color")
                                           ).alias("color")),
                        f"scc_color_{phase}_{info['supersteps']}",
                        F.sum((F.col("color") != F.col("prev")).cast("long")
                              ).alias("changed"),
                    )
                    new_colors = new_colors.select("vid", "color")
                    stepped.unpersist()
                    colors.unpersist()
                    colors = new_colors.persist()
                    info["supersteps"] += 1
                    if (m["changed"] or 0) == 0:
                        break

                # ---- 3. backward reach from roots in frozen-color subgraph
                same_color_e = (
                    triplets(e, colors, attach=("src", "dst"), how="inner")
                    .where(F.col("src_color") == F.col("dst_color"))
                    .select("src", "dst")
                    .transform(eager_checkpoint)
                ).persist()
                flags = colors.select(
                    "vid", (F.col("vid") == F.col("color")).alias("flag")
                ).persist()
                for _ in range(max_steps):
                    msgs = aggregate_messages(
                        same_color_e, flags, to_src=F.col("dst_flag"),
                        agg={"nbr_any": F.max}, attach=("dst",), how="inner",
                    )
                    new_flags, m = _ckpt_observe(
                        flags.select("vid", F.col("flag").alias("prev"))
                        .join(msgs, "vid", "left")
                        .select("vid", "prev",
                                (F.col("prev") | F.coalesce("nbr_any",
                                                            F.lit(False))
                                 ).alias("flag")),
                        f"scc_bw_{phase}_{info['supersteps']}",
                        F.sum((F.col("flag") != F.col("prev")).cast("long")
                              ).alias("changed"),
                    )
                    new_flags = new_flags.select("vid", "flag")
                    flags.unpersist()
                    flags = new_flags.persist()
                    info["supersteps"] += 1
                    if (m["changed"] or 0) == 0:
                        break
                same_color_e.unpersist()
                members = (flags.where("flag").join(colors, "vid")
                           .select("vid", F.col("color").alias("scc_id"))
                           .persist())

            # phase labels = trimmed singletons + extracted SCC members;
            # materialize into `done` BEFORE unpersisting phase state.
            trimmed = (verts_start.join(verts, "vid", "anti")
                       .select("vid", F.col("vid").alias("scc_id")))
            phase_labels = trimmed if members is None \
                else trimmed.unionByName(members)
            done = phase_labels if done is None \
                else done.unionByName(phase_labels)
            done = done.transform(eager_checkpoint)

            if members is not None:
                remaining, m = _ckpt_observe(
                    verts.join(members.select("vid"), "vid", "anti"),
                    f"scc_shrink_{phase}", F.count("vid").alias("n"))
                info["supersteps"] += 1
                n_next = m["n"] or 0
                members.unpersist()
                flags.unpersist()
                colors.unpersist()
            else:
                remaining, n_next = verts, 0
            info["phase_extracted"].append(
                {"phase": phase, "extracted": n_start - n_next,
                 "wall_ms": round((time.time() - t0) * 1e3, 1)})
            if n_next > 0:
                new_e = _induced(e, remaining).transform(eager_checkpoint)
                e.unpersist()
                e = new_e.persist()
            if verts is not verts_start:
                verts.unpersist()
            verts_start.unpersist()
            verts = remaining.persist()
            n = n_next
            phase += 1
            info["phases"] = phase

    info["converged"] = n == 0
    e.unpersist()
    verts.unpersist()
    if done is None:
        done = spark.createDataFrame([], "vid long, scc_id long")
    return done, info


def bowtie_classes(
    edges: DataFrame,
    scc_labels: DataFrame | None = None,
    max_steps: int = 200,
) -> DataFrame:
    """Broder bow-tie decomposition relative to the largest SCC.

    Returns (vid, cls) with cls ∈ {'core','in','out','other'}:
    core = member of the largest SCC (ties broken by smaller scc_id);
    in   = reaches the core but is not in it;
    out  = reachable from the core but not in it;
    other = everything else (tendrils, tubes, disconnected).

    Physical shape: after SCC, two boolean BFS floods (forward from core
    along edges, backward along reversed edges), each one join + OR-agg
    per superstep with the Observation/localCheckpoint contract — no
    closure materialization, state is one boolean per vertex. The
    core-pick itself is a 1-row aggregate (top-1 by count)."""
    spark = edges.sparkSession
    e = clean_edges(edges).persist()
    shuffle_n = adaptive_partitions(e.count())
    if scc_labels is None:
        scc_labels, _ = strongly_connected_components(e)
    labels = scc_labels.persist()

    core_row = (labels.groupBy("scc_id").count()
                .orderBy(F.desc("count"), F.asc("scc_id")).limit(1)
                .collect())
    if not core_row:
        e.unpersist()
        labels.unpersist()
        return spark.createDataFrame([], "vid long, cls string")
    core_id = core_row[0]["scc_id"]

    state = labels.select(
        "vid", (F.col("scc_id") == F.lit(core_id)).alias("core")).persist()

    def _flood(col: str, forward: bool) -> DataFrame:
        """Boolean closure: reach-from-core (forward=True) or
        reach-to-core (forward=False); seeded with the core itself."""
        cur = state.withColumn(col, F.col("core")).persist()
        for step in range(max_steps):
            kwargs = ({"to_dst": F.col(f"src_{col}"), "attach": ("src",)}
                      if forward else
                      {"to_src": F.col(f"dst_{col}"), "attach": ("dst",)})
            msgs = aggregate_messages(e, cur, agg={"nbr_any": F.max},
                                      how="inner", **kwargs)
            new_cur, m = _ckpt_observe(
                cur.withColumnRenamed(col, "prev")
                .join(msgs, "vid", "left")
                .select("vid", "core", "prev",
                        (F.col("prev") | F.coalesce("nbr_any", F.lit(False))
                         ).alias(col)),
                f"bowtie_{col}_{step}",
                F.sum((F.col(col) != F.col("prev")).cast("long")
                      ).alias("changed"),
            )
            new_cur = new_cur.select("vid", "core", col)
            cur.unpersist()
            cur = new_cur.persist()
            if (m["changed"] or 0) == 0:
                break
        return cur

    with loop_tuning(spark, shuffle_n):
        fwd = _flood("fwd", forward=True)      # core ⇝ v
        bwd = _flood("bwd", forward=False)     # v ⇝ core

    out = (
        fwd.select("vid", "core", "fwd")
        .join(bwd.select("vid", "bwd"), "vid")
        .select(
            "vid",
            F.when(F.col("core"), F.lit("core"))
             .when(F.col("bwd"), F.lit("in"))
             .when(F.col("fwd"), F.lit("out"))
             .otherwise(F.lit("other")).alias("cls"),
        )
    ).transform(eager_checkpoint)
    fwd.unpersist()
    bwd.unpersist()
    state.unpersist()
    labels.unpersist()
    e.unpersist()
    return out
