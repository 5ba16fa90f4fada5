"""M3: checkpoint/resume — kill after superstep k, resume, identical result."""

from __future__ import annotations

import numpy as np

from credigraph_spark.checkpoint import CheckpointStore
from credigraph_spark.graph import connected_components, pagerank

from tests.conftest import edges_df

EDGES = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (5, 0), (6, 5), (7, 6), (8, 7)]


def test_pagerank_resume_matches_uninterrupted(spark, tmp_path):
    full_ranks, full_info = pagerank(edges_df(spark, EDGES), max_iter=16)
    full = {r["vid"]: r["rank"] for r in full_ranks.collect()}

    # phase 1: run only 6 supersteps, checkpointing every 2 ("the kill")
    ck = CheckpointStore(str(tmp_path / "pr"), "run1")
    pagerank(edges_df(spark, EDGES), max_iter=6, ckpt=ck, checkpoint_every=2)
    assert ck.latest_iteration() == 5
    assert len(ck.read_metrics()) >= 3

    # phase 2: resume from the committed superstep and finish
    ranks2, info2 = pagerank(edges_df(spark, EDGES), max_iter=16, ckpt=ck,
                             checkpoint_every=2, resume=True)
    assert info2["resumed_from"] == 5
    got = {r["vid"]: r["rank"] for r in ranks2.collect()}
    vids = sorted(full)
    np.testing.assert_allclose([got[v] for v in vids], [full[v] for v in vids], atol=1e-9)


def test_cc_resume(spark, tmp_path):
    full_labels, _ = connected_components(edges_df(spark, EDGES))
    full = {r["vid"]: r["component"] for r in full_labels.collect()}

    ck = CheckpointStore(str(tmp_path / "cc"), "run1")
    connected_components(edges_df(spark, EDGES), max_iter=2, ckpt=ck, checkpoint_every=1)
    labels2, info2 = connected_components(edges_df(spark, EDGES), ckpt=ck, checkpoint_every=1)
    assert "resumed_from" in info2
    got = {r["vid"]: r["component"] for r in labels2.collect()}
    assert got == full


def test_resume_after_convergence_short_circuits(spark, tmp_path):
    """Resuming a run whose checkpointed state already converged must not
    burn an extra superstep — result identical, zero new checkpoints."""
    ck = CheckpointStore(str(tmp_path / "cc_conv"), "run1")
    labels1, info1 = connected_components(edges_df(spark, EDGES), ckpt=ck, checkpoint_every=1)
    assert info1["converged"]
    n_states = len(ck.committed_iterations())
    assert ck.converged_iteration() == info1["iterations"] - 1

    labels2, info2 = connected_components(edges_df(spark, EDGES), ckpt=ck, checkpoint_every=1)
    assert info2["converged"] and info2["resumed_from"] == ck.converged_iteration()
    assert len(ck.committed_iterations()) == n_states  # no new superstep ran
    got1 = {r["vid"]: r["component"] for r in labels1.collect()}
    got2 = {r["vid"]: r["component"] for r in labels2.collect()}
    assert got1 == got2

    # pagerank: same contract
    ckp = CheckpointStore(str(tmp_path / "pr_conv"), "run1")
    r1, i1 = pagerank(edges_df(spark, EDGES), max_iter=50, ckpt=ckp)
    assert i1["converged"]
    r2, i2 = pagerank(edges_df(spark, EDGES), max_iter=50, ckpt=ckp)
    assert i2["converged"] and "resumed_from" in i2
    g1 = {r["vid"]: r["rank"] for r in r1.collect()}
    g2 = {r["vid"]: r["rank"] for r in r2.collect()}
    assert g1 == g2  # bit-identical: the state is re-read, not recomputed


def test_iceberg_catalog_fallback(spark, tmp_path):
    """A store configured with an Iceberg catalog name must fall back to
    the parquet-dir backend when the session has no Iceberg catalog (this
    sandbox ships no Iceberg jar) — write/read/resume all work."""
    from credigraph_spark.checkpoint import _iceberg_available

    assert not _iceberg_available(spark)
    ck = CheckpointStore(str(tmp_path / "ice"), "run1", catalog="iceberg_cat")
    df = spark.createDataFrame([(1, 0.5), (2, 0.7)], ["vid", "rank"])
    out = ck.write_state(df, 0)
    assert {r["vid"]: r["rank"] for r in out.collect()} == {1: 0.5, 2: 0.7}
    assert ck.latest_iteration() == 0
    again = ck.read_state(spark, 0)
    assert again.count() == 2


def test_lineage_and_metrics_recorded(spark, tmp_path):
    ck = CheckpointStore(str(tmp_path / "pr2"), "runX")
    pagerank(edges_df(spark, EDGES), max_iter=4, ckpt=ck, checkpoint_every=2)
    metrics = ck.read_metrics()
    assert metrics and all("l1_diff" in m and "dangling_mass" in m for m in metrics)
    lineage_file = ck.run_dir + "/lineage.jsonl"
    import json
    with open(lineage_file) as f:
        recs = [json.loads(x) for x in f]
    assert recs and all("partitions" in r for r in recs)
    # per-partition rows sum to vertex count
    assert sum(recs[-1]["partitions"].values()) == 9
