"""Incremental streaming ingest: per-file exactly-once + resume."""

from __future__ import annotations

from credigraph_spark import corpus
from credigraph_spark.streaming import stream_extract_edges


def test_stream_extract_exactly_once(spark, tmp_path):
    inp = str(tmp_path / "repos_in")
    out = str(tmp_path / "edges_out")
    ckpt = str(tmp_path / "ckpt")

    # slice 1 lands
    pdf1 = corpus.repos_pdf(seed=1, n_repos=20, files_per_repo=1)
    spark.createDataFrame(pdf1).coalesce(1).write.mode("append").parquet(inp)
    stream_extract_edges(spark, inp, out, ckpt)
    n1 = spark.read.parquet(out).count()
    expect1 = sum(len(corpus._targets_for(1, i, 0, 20)) for i in range(20))
    assert n1 == expect1

    # re-run with nothing new: checkpoint prevents reprocessing
    stream_extract_edges(spark, inp, out, ckpt)
    assert spark.read.parquet(out).count() == n1

    # slice 2 lands (different seed -> different rows); only the delta is read
    pdf2 = corpus.repos_pdf(seed=2, n_repos=20, files_per_repo=1)
    spark.createDataFrame(pdf2).coalesce(1).write.mode("append").parquet(inp)
    stream_extract_edges(spark, inp, out, ckpt)
    n2 = spark.read.parquet(out).count()
    expect2 = sum(len(corpus._targets_for(2, i, 0, 20)) for i in range(20))
    assert n2 == expect1 + expect2
