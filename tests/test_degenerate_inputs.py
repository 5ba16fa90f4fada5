"""Degenerate-input guards (ADVICE r5): operators must not crash on
empty/trivial inputs reachable through the CLI."""

import pytest
from pyspark.sql import functions as F


def test_densest_subgraph_empty_graph(spark):
    from credigraph_spark.graph.kcore import densest_subgraph

    e = spark.createDataFrame([(1, 1), (2, 2)], "src long, dst long")
    out = densest_subgraph(e, max_rounds=2)
    assert out.count() == 0
    assert out.columns == ["round", "n_vertices", "n_edges", "density",
                           "is_best"]


def test_snapshot_similarity_empty_side(spark):
    from credigraph_spark.temporal import graph_snapshot_similarity

    old = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    new = spark.createDataFrame([], "src long, dst long")
    row = graph_snapshot_similarity(old, new).collect()[0]
    assert row.vertex_jaccard == 0.0
    assert row.edge_jaccard == 0.0
    assert row.degree_tv == 0.0
    # both sides empty: every denominator is zero
    row2 = graph_snapshot_similarity(new, new).collect()[0]
    assert row2.vertex_jaccard == 0.0 and row2.edge_jaccard == 0.0


def test_km_churn_empty_events(spark):
    from credigraph_spark.temporal import km_churn

    ev = spark.createDataFrame([], "user_id long, ts timestamp")
    out = km_churn(ev)
    assert out.count() == 0
    assert out.columns == ["duration", "n_risk", "n_events", "survival"]


def test_reclist_quality_k1_null_ild(spark):
    from credigraph_spark.pipeline.similarity import reclist_quality

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    row = reclist_quality(emb.where(F.col("vec_id") < 5), emb,
                          k=1).collect()[0]
    # no intra-list pairs at k=1: mean_ild is NULL (the oracle's
    # AVG-over-empty), not a TypeError
    assert row.mean_ild is None
    assert row.k == 1
