"""GraphFrames-style message-passing primitive (aggregateMessages).

The engine's iterative algorithms (pagerank.py, components.py, lpa.py)
each hand-build the same physical shape: join vertex state onto the
cached edge table, emit a message per edge endpoint, aggregate per
receiving vertex. This module exposes that shape as a reusable
primitive so users can write NEW graph algorithms declaratively —
the Spark-native analog of GraphFrames' ``aggregateMessages`` /
Pregel's gather phase (public API shape; implementation from scratch).

Messages are Column expressions over the TRIPLET view, whose columns are
``src``, ``dst``, every edge attribute, plus every vertex attribute
twice: ``src_<attr>`` and ``dst_<attr>``.

Physical shape: two equi joins build the triplet view (vertex side
broadcast when small — pass ``broadcast_vertices=True``), the message
union is map-side combinable through the final groupBy, so hub vertices
never serialize a single task.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, functions as F


def triplets(edges: DataFrame, vertices: DataFrame, vid_col: str = "vid",
             broadcast_vertices: bool = False) -> DataFrame:
    """The triplet view: one row per edge with both endpoints' vertex
    attributes attached (``src_*`` / ``dst_*``)."""
    sv = vertices.select(*[F.col(c).alias(f"src_{c}") for c in vertices.columns])
    dv = vertices.select(*[F.col(c).alias(f"dst_{c}") for c in vertices.columns])
    if broadcast_vertices:
        sv, dv = F.broadcast(sv), F.broadcast(dv)
    return (
        edges.join(sv, edges["src"] == sv[f"src_{vid_col}"], "left")
        .join(dv, edges["dst"] == dv[f"dst_{vid_col}"], "left")
        .drop(f"src_{vid_col}", f"dst_{vid_col}")
    )


def aggregate_messages(
    edges: DataFrame,
    vertices: DataFrame,
    agg: dict[str, Callable[[Column], Column]],
    to_dst: Column | None = None,
    to_src: Column | None = None,
    vid_col: str = "vid",
    broadcast_vertices: bool = False,
) -> DataFrame:
    """Evaluate message expressions over the triplet view and aggregate
    them per receiving vertex.

    ``to_dst`` / ``to_src``: message Column (triplet-view columns) sent to
    the edge's dst / src — at least one required.
    ``agg``: output column name -> aggregator over the message column,
    e.g. ``{"nbr_sum": F.sum, "nbr_max": F.max}``. All aggregators must
    be partial-aggregatable SQL aggregates for the skew-immunity claim to
    hold (sum/min/max/count/avg are).

    Returns (vid, *agg-columns) — only vertices that received a message.
    Example — each vertex's mean neighbor out-degree (one line of Pregel):

        aggregate_messages(edges, degrees, to_dst=F.col("src_out_deg"),
                           agg={"nbr_avg": F.avg})
    """
    if to_dst is None and to_src is None:
        raise ValueError("provide to_dst and/or to_src")
    t = triplets(edges, vertices, vid_col, broadcast_vertices)
    parts = []
    if to_dst is not None:
        parts.append(t.select(F.col("dst").alias(vid_col), to_dst.alias("msg")))
    if to_src is not None:
        parts.append(t.select(F.col("src").alias(vid_col), to_src.alias("msg")))
    msgs = parts[0]
    for p in parts[1:]:
        msgs = msgs.unionByName(p)
    return msgs.groupBy(vid_col).agg(
        *[fn(F.col("msg")).alias(name) for name, fn in agg.items()]
    )
