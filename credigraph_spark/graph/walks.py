"""Deterministic random-walk sampling (node2vec/DeepWalk prep).

The reference's GNN layer consumes neighbor samples
(tgrag/dataset/torch_geometric_graph_store.py); the data-side primitive
a training pipeline actually needs is walk GENERATION at corpus scale.
This is the deterministic analog of uniform random walks: at each step
the walker at v moves to the out-neighbor u minimizing
md5(seed:start:widx:step:u) — statistically uniform over neighbors,
bit-reproducible in any engine with md5 (the same portability trick as
sample_neighbors O6 and the ANF registers), and varying per walk index
and per step so parallel walks from one start diverge.

Physical shape per step: one hash join (frontier ⋈ edges on src) and one
struct-MIN aggregation per walk — partial-aggregatable, so a hub's
candidate fan-out collapses map-side and no walk ever serializes a hot
partition. State is one row per live walk; walks die at sinks
(inner-join semantics). Each step is localCheckpointed: plans stay flat
for arbitrary walk lengths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from credigraph_spark.graph.adjacency import clean_edges


def deterministic_walks(
    edges: DataFrame,
    seeds: DataFrame,
    walk_length: int,
    walks_per_seed: int = 1,
    seed: int = 42,
) -> DataFrame:
    """Returns (start, widx, step, vid): for each seed vertex and walk
    index, the vertex visited at each step (step 0 = the seed itself;
    a walk that hits a sink simply stops emitting rows)."""
    rel = clean_edges(edges).select("src", "dst").persist()
    cur = (
        seeds.select(F.col(seeds.columns[0]).alias("start")).distinct()
        .select(
            "start",
            F.explode(F.sequence(
                F.lit(0), F.lit(walks_per_seed - 1))).alias("widx"),
        )
        .withColumn("widx", F.col("widx").cast("long"))
        .select("start", "widx", F.col("start").alias("vid"),
                F.lit(0).alias("step"))
        .localCheckpoint(eager=True)
    )
    out = cur
    for step in range(1, walk_length + 1):
        h = F.md5(F.concat_ws(
            ":", F.lit(str(seed)), F.col("start").cast("string"),
            F.col("widx").cast("string"), F.lit(str(step)),
            F.col("dst").cast("string")))
        nxt = (
            cur.join(rel, cur["vid"] == rel["src"])
            .groupBy("start", "widx")
            .agg(F.min(F.struct(h.alias("h"),
                                F.col("dst").alias("dst"))).alias("m"))
            .select("start", "widx", F.col("m.dst").alias("vid"),
                    F.lit(step).alias("step"))
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        out = out.unionByName(nxt)
        cur = nxt
    rel.unpersist()
    return out.select("start", "widx", "step", "vid")
