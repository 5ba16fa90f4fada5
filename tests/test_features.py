"""Feature-assembly layer (VERDICT r4 #8) vs the reference encoder
semantics (tgrag/encoders/*.py + tgrag/utils/readers.py:188-203) and the
serving-store round trip (construct_relational_table.py:99-117
domain(id, ts, x BLOB, y REAL))."""

from __future__ import annotations

import sqlite3

import numpy as np
import pytest
from pyspark.sql import functions as F

from credigraph_spark.features import (
    assemble_features,
    categorical_vocabulary,
    pack_float32,
    unpack_float32,
)
from credigraph_spark.serving import read_sqlite, write_sqlite


def _nodes(spark):
    rows = [
        (1, 10.0, "B", 3),
        (2, 30.0, "A", 5),
        (3, 20.0, "C", 3),
        (4, 40.0, "A", 9),
        (5, 25.0, "B", 1),
    ]
    return rows, spark.createDataFrame(
        rows, "id long, bal double, seg string, t int")


def _reference_matrix(rows):
    """The reference pipeline in numpy: NormEncoder min-max
    (norm_encoding.py), CategoricalEncoder one-hot over np.unique
    (categorical_encoder.py), TimeStampEncoder raw passthrough
    (time_encoder.py), ZeroEncoder, concatenated dim=-1
    (readers.py:193-201)."""
    bal = np.array([r[1] for r in rows], dtype=np.float64).reshape(-1, 1)
    norm = (bal - bal.min()) / (bal.max() - bal.min())
    segs = np.array([r[2] for r in rows])
    classes = np.unique(segs)
    onehot = np.eye(len(classes))[
        np.vectorize({c: i for i, c in enumerate(classes)}.get)(segs)]
    t = np.array([r[3] for r in rows], dtype=np.float64).reshape(-1, 1)
    zero = np.zeros((len(rows), 1))
    return np.concatenate([norm, onehot, t, zero], axis=-1)


def test_assemble_matches_reference_encoders(spark):
    rows, df = _nodes(spark)
    out, names = assemble_features(
        df, "id", norm_cols=["bal"], categorical_cols=["seg"],
        time_cols=["t"], zero_dims=1)
    got = {r["id"]: np.array(r["x"]) for r in out.collect()}
    want = _reference_matrix(rows)
    assert names == ["norm:bal", "onehot:seg=A", "onehot:seg=B",
                     "onehot:seg=C", "time:t", "zero:0"]
    for i, r in enumerate(rows):
        assert np.array_equal(got[r[0]], want[i]), (r[0], got[r[0]], want[i])


def test_rni_tail_deterministic_and_bounded(spark):
    _, df = _nodes(spark)
    out, names = assemble_features(df, "id", rni_dims=3, rni_seed=11)
    a = {r["id"]: tuple(r["x"]) for r in out.collect()}
    b = {r["id"]: tuple(r["x"])
         for r in assemble_features(df.repartition(3), "id", rni_dims=3,
                                    rni_seed=11)[0].collect()}
    assert a == b
    vals = [v for x in a.values() for v in x]
    assert all(0.0 <= v < 1.0 for v in vals)
    assert len(set(vals)) > 10  # actually varies across (id, dim)


def test_degenerate_norm_column_is_zero_not_nan(spark):
    df = spark.createDataFrame([(1, 7.0), (2, 7.0)], "id long, v double")
    out, _ = assemble_features(df, "id", norm_cols=["v"])
    assert all(r["x"] == [0.0] for r in out.collect())


def test_categorical_vocabulary_cardinality_guard(spark):
    df = spark.range(200).select(
        F.col("id"), F.col("id").cast("string").alias("c"))
    with pytest.raises(ValueError, match="classes"):
        categorical_vocabulary(df, "c", max_classes=100)


def test_feature_store_roundtrip(spark, tmp_path):
    """Assemble → pack float32 BLOB → serving sqlite domain-table analog
    → read back → unpack: bytes survive and decode to the float32 cast
    of the assembled vector (the reference's x BLOB cell)."""
    rows, df = _nodes(spark)
    out, _ = assemble_features(
        df, "id", norm_cols=["bal"], categorical_cols=["seg"],
        time_cols=["t"], rni_dims=2, rni_seed=5)
    packed = out.select(
        "id", F.lit(20260101).alias("ts"), pack_float32("x").alias("x"),
        F.lit(0.5).alias("y"))
    dst = str(tmp_path / "feat.db")
    assert write_sqlite(packed, dst, "domain", index_cols=["id"],
                        shards=2) == 5
    with sqlite3.connect(dst) as conn:
        blobs = dict(conn.execute("SELECT id, x FROM domain").fetchall())
    want = {r["id"]: np.asarray(r["x"], dtype="<f4") for r in out.collect()}
    assert set(blobs) == set(want)
    for i, blob in blobs.items():
        assert np.array_equal(unpack_float32(blob), want[i])
    back = read_sqlite(spark, dst, "domain")
    assert back.count() == 5 and set(back.columns) == {"id", "ts", "x", "y"}


def test_neighbor_mean_exact_two_hop_differential(spark):
    """2-hop exact mean-of-means vs plain Python with the same
    floor(x*1e9) quantization — bit-equal — plus partition invariance."""
    import math

    from credigraph_spark.features import neighbor_mean_exact

    edges = [(1, 2), (3, 2), (2, 4), (3, 4), (4, 1)]
    feats = {1: [0.125, -1.75], 2: [2.5, 0.3], 3: [-0.7, 1.1],
             4: [9.25, 0.001]}
    e = spark.createDataFrame(edges, "src long, dst long")
    f = spark.createDataFrame([(k, v) for k, v in feats.items()],
                              "vid long, v array<double>")

    def qmean(vals):
        s = sum(math.floor(x * 1e9) for x in vals)
        return s / float(len(vals)) / 1e9

    cur = {k: list(v) for k, v in feats.items()}
    for _ in range(2):
        nxt = {}
        for v in feats:
            ins = [s for s, d in edges if d == v and s in cur]
            if ins:
                nxt[v] = [qmean([cur[s][j] for s in ins]) for j in range(2)]
        cur = nxt

    got = {(r["vid"], r["d"]): r["val"]
           for r in neighbor_mean_exact(e, f, hops=2).collect()}
    want = {(v, j): x for v, vec in cur.items() for j, x in enumerate(vec)}
    assert got == want
    got2 = {(r["vid"], r["d"]): r["val"]
            for r in neighbor_mean_exact(e.repartition(3), f.repartition(2),
                                         hops=2).collect()}
    assert got2 == got


def test_ldp_features_hand_math(spark):
    from credigraph_spark.features import ldp_features
    from tests.conftest import edges_df

    # star hub 0 with 3 leaves + edge 1-2 between two leaves
    edges = edges_df(spark, [(0, 1), (0, 2), (0, 3), (1, 2)])
    out = {r.vid: r for r in ldp_features(edges).collect()}
    # degrees: 0->3, 1->2, 2->2, 3->1
    assert out[0].deg == 3
    # hub's neighbors have degrees {2, 2, 1}
    assert (out[0].nd_min, out[0].nd_max, out[0].nd_sum) == (1, 2, 5)
    assert out[0].nd_mean == pytest.approx(5 / 3, abs=1e-6)
    # leaf 3 sees only the hub (deg 3)
    assert (out[3].nd_min, out[3].nd_max) == (3, 3)
    assert out[3].nd_mean == 3.0
