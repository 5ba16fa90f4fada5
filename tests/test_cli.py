"""Smoke tests for the spark-submit CLI surface (credigraph_spark.cli).

Each subcommand runs end-to-end on tiny parquet fixtures; `main` reuses
the session fixture's JVM (stop() is patched out so later tests keep it).
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import SparkSession, functions as F

from credigraph_spark.cli import main


@pytest.fixture()
def keep_session(monkeypatch):
    monkeypatch.setattr(SparkSession, "stop", lambda self: None)


@pytest.fixture()
def docs_parquet(spark, tmp_path):
    rows = [(1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different content about spark engines"),
            (4, "completely different content about spark engines")]
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(rows, ["doc_id", "text"]).write.parquet(p)
    return p


def _run(capsys, argv) -> dict:
    assert main(argv) == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_cli_sql_uri_path_with_colons(spark, tmp_path, keep_session, capsys, docs_parquet):
    """`--table name=file:/abs/path` must keep the URI intact (the format
    suffix is only split off when the trailing token is format-like)."""
    info = _run(capsys, [
        "sql", "--table", f"d=file:{docs_parquet}",
        "--query", "SELECT COUNT(*) AS n FROM d", "--master", "local[4]",
    ])
    assert info["sample"][0]["n"] == 4


def test_cli_sql_explicit_format_suffix(spark, tmp_path, keep_session, capsys):
    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,2\n3,4\n")
    info = _run(capsys, [
        "sql", "--table", f"t={p}:csv",
        "--query", "SELECT SUM(CAST(a AS BIGINT)) AS s FROM t", "--master", "local[4]",
    ])
    assert info["sample"][0]["s"] == 4


def test_cli_dedup(spark, tmp_path, keep_session, capsys, docs_parquet):
    out = str(tmp_path / "pairs")
    info = _run(capsys, [
        "dedup", "--input", docs_parquet, "--output", out,
        "--threshold", "0.5", "--master", "local[4]",
    ])
    got = {(r["id_a"], r["id_b"]) for r in spark.read.parquet(out).collect()}
    assert (3, 4) in got and info["pairs"] == len(got)


def test_cli_simhash(spark, tmp_path, keep_session, capsys, docs_parquet):
    out = str(tmp_path / "sh_pairs")
    info = _run(capsys, [
        "simhash", "--input", docs_parquet, "--output", out,
        "--max-hamming", "12", "--n-tables", "16", "--master", "local[4]",
    ])
    got = {(r["id_a"], r["id_b"]) for r in spark.read.parquet(out).collect()}
    assert (3, 4) in got and info["pairs"] == len(got)


def test_cli_ann(spark, tmp_path, keep_session, capsys):
    import numpy as np

    rng = np.random.default_rng(3)
    rows = [(i, rng.standard_normal(6).tolist()) for i in range(30)]
    emb = str(tmp_path / "emb.parquet")
    spark.createDataFrame(rows, ["vec_id", "embedding"]).write.parquet(emb)
    out = str(tmp_path / "topk")
    info = _run(capsys, [
        "ann", "--input", emb, "--output", out, "--k", "3",
        "--bits-per-table", "4", "--n-tables", "8", "--master", "local[4]",
    ])
    res = spark.read.parquet(out)
    assert info["rows"] == res.count() > 0
    assert res.groupBy("query_id").count().agg(F.max("count")).first()[0] <= 3


def test_cli_ann_ivf(spark, tmp_path, keep_session, capsys):
    import numpy as np

    rng = np.random.default_rng(4)
    rows = [(i, rng.standard_normal(6).tolist()) for i in range(40)]
    emb = str(tmp_path / "emb.parquet")
    spark.createDataFrame(rows, ["vec_id", "embedding"]).write.parquet(emb)
    out = str(tmp_path / "topk_ivf")
    info = _run(capsys, [
        "ann", "--input", emb, "--output", out, "--k", "3", "--ivf",
        "--n-lists", "8", "--nprobe", "8", "--master", "local[4]",
    ])
    res = spark.read.parquet(out)
    assert info["rows"] == res.count() > 0
    assert res.groupBy("query_id").count().agg(F.max("count")).first()[0] <= 3


def test_cli_sqlite(spark, tmp_path, keep_session, capsys, docs_parquet):
    import sqlite3

    dst = str(tmp_path / "serve.db")
    info = _run(capsys, [
        "sqlite", "--input", docs_parquet, "--output", dst,
        "--db-table", "docs", "--index", "doc_id", "--shards", "2",
        "--master", "local[4]",
    ])
    assert info["rows"] == 4
    with sqlite3.connect(dst) as conn:
        assert conn.execute("SELECT COUNT(*) FROM docs").fetchone()[0] == 4
        names = {r[0] for r in conn.execute(
            "SELECT name FROM sqlite_master WHERE type='index'")}
    assert "idx_docs_doc_id" in names


def test_cli_features(spark, tmp_path, keep_session, capsys):
    """features: assemble encoder vectors + labels -> sqlite domain table
    (id, ts, x BLOB float32, y REAL) with the -1.0 missing sentinel."""
    import sqlite3

    import numpy as np

    nodes = str(tmp_path / "nodes.parquet")
    labels = str(tmp_path / "labels.parquet")
    spark.createDataFrame(
        [(1, 10.0, "A"), (2, 20.0, "B"), (3, 30.0, "A")],
        "id long, bal double, seg string").write.parquet(nodes)
    spark.createDataFrame([(1, 0.9), (3, 0.1)],
                          "id long, y double").write.parquet(labels)
    dst = str(tmp_path / "feat.db")
    info = _run(capsys, [
        "features", "--input", nodes, "--id-col", "id", "--norm", "bal",
        "--categorical", "seg", "--rni-dims", "1", "--labels", labels,
        "--ts", "20260101", "--output", dst, "--shards", "2",
        "--master", "local[4]",
    ])
    assert info["rows"] == 3 and info["x_dim"] == 4
    with sqlite3.connect(dst) as conn:
        rows = {r[0]: r for r in conn.execute(
            "SELECT id, ts, x, y FROM domain").fetchall()}
    assert rows[2][3] == -1.0 and rows[1][3] == 0.9
    x2 = np.frombuffer(rows[2][2], dtype="<f4")
    assert len(x2) == 4 and x2[0] == 0.5 and x2[2] == 1.0  # norm, onehot B
    assert all(r[1] == 20260101 for r in rows.values())


def test_cli_hits_and_kcore(spark, tmp_path, keep_session, capsys):
    e = str(tmp_path / "edges.parquet")
    spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 10), (10, 11), (11, 12)], ["src", "dst"]
    ).write.parquet(e)

    out = _run(capsys, ["hits", "--edges", e, "--output",
                        str(tmp_path / "hits"), "--max-iter", "3"])
    assert out["n_vertices"] == 6 and out["iterations"] == 3

    out = _run(capsys, ["kcore", "--edges", e, "--output",
                        str(tmp_path / "core"), "--k", "2"])
    assert out["core_vertices"] == 3 and out["k"] == 2


def test_cli_scc_bowtie_ktruss(spark, tmp_path, keep_session, capsys):
    e = str(tmp_path / "edges2.parquet")
    # core cycle {0,1,2} + feeder 5, drain 9; {0,1,2} is also a triangle
    spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (1, 0), (2, 1), (0, 2), (5, 0), (2, 9)],
        ["src", "dst"]
    ).write.parquet(e)

    out = _run(capsys, ["scc", "--edges", e, "--output",
                        str(tmp_path / "scc")])
    assert out["converged"] and out["n_vertices"] == 5
    got = {r["vid"]: r["scc_id"]
           for r in spark.read.parquet(str(tmp_path / "scc")).collect()}
    assert got == {0: 2, 1: 2, 2: 2, 5: 5, 9: 9}

    out = _run(capsys, ["bowtie", "--edges", e, "--output",
                        str(tmp_path / "bt")])
    assert out["class_counts"] == {"core": 3, "in": 1, "out": 1}

    out = _run(capsys, ["ktruss", "--edges", e, "--output",
                        str(tmp_path / "tr"), "--k", "3"])
    assert out["surviving_edges"] == 3          # the triangle is a 3-truss


def test_cli_louvain_and_cocite(spark, tmp_path, keep_session, capsys):
    e = str(tmp_path / "edges3.parquet")
    # two triangles joined by one bridge
    spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        ["src", "dst"]
    ).write.parquet(e)

    out = _run(capsys, ["louvain", "--edges", e, "--output",
                        str(tmp_path / "lv"), "--rounds", "2"])
    assert out["n_vertices"] == 6 and out["n_communities"] >= 2

    out = _run(capsys, ["cocite", "--edges", e, "--output",
                        str(tmp_path / "cc2"), "--mode", "coupling",
                        "--top-k", "5"])
    assert out["rows"] >= 1
    rows = spark.read.parquet(str(tmp_path / "cc2")).collect()
    assert {"u", "v", "shared", "cosine"} <= set(rows[0].asDict())


def test_cli_sssp(spark, tmp_path, keep_session, capsys):
    e = str(tmp_path / "wedges.parquet")
    spark.createDataFrame(
        [(1, 2, 10.0), (1, 3, 1.0), (3, 4, 1.0), (4, 2, 1.0)],
        "src long, dst long, w double"
    ).write.parquet(e)
    out = _run(capsys, ["sssp", "--edges", e, "--output",
                        str(tmp_path / "d"), "--seeds", "1",
                        "--max-rounds", "5"])
    assert out["reached"] == 4
    got = {r["vid"]: r["dist"]
           for r in spark.read.parquet(str(tmp_path / "d")).collect()}
    assert got == {1: 0.0, 2: 3.0, 3: 1.0, 4: 2.0}


def test_cli_katz(spark, tmp_path, keep_session, capsys):
    e = str(tmp_path / "kedges.parquet")
    spark.createDataFrame([(1, 2), (3, 2), (2, 4)], "src long, dst long") \
        .write.parquet(e)
    out = _run(capsys, ["katz", "--edges", e, "--output",
                        str(tmp_path / "kz"), "--alpha", "0.1",
                        "--max-iter", "3"])
    assert out["n_vertices"] == 4
    got = {r["vid"]: r["x"]
           for r in spark.read.parquet(str(tmp_path / "kz")).collect()}
    assert got[1] == 1.0 and got[3] == 1.0
    assert abs(got[2] - 1.2) < 1e-12          # beta + 2*alpha*beta
    assert abs(got[4] - (1 + 0.1 * 1.2)) < 1e-12


def test_cli_salsa_butterflies_sessions(spark, tmp_path, keep_session, capsys):
    e = str(tmp_path / "edges3.parquet")
    spark.createDataFrame(
        [(s, d) for s in (1, 2, 3) for d in (10, 11)] + [(4, 12)],
        ["src", "dst"]).write.parquet(e)

    out = _run(capsys, ["salsa", "--edges", e, "--output",
                        str(tmp_path / "salsa"), "--max-iter", "2"])
    assert out["n_vertices"] == 7 and out["iterations"] == 2

    out = _run(capsys, ["butterflies", "--edges", e, "--output",
                        str(tmp_path / "bf"), "--orient", "auto"])
    # K_{3,2}: C(3,2)=3 src pairs each sharing 2 dsts -> 3 butterflies
    assert out["n_butterflies"] == 3

    import datetime as dt
    ev = str(tmp_path / "ev.parquet")
    spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 10, 0), 1),
         (1, dt.datetime(2024, 1, 1, 10, 5), 2),
         (1, dt.datetime(2024, 1, 1, 12, 0), 3)],
        "user_id long, ts timestamp, event_id long").write.parquet(ev)
    out = _run(capsys, ["sessions", "--input", ev, "--output",
                        str(tmp_path / "sess"), "--gap-minutes", "30"])
    assert out["n_sessions"] == 2


def test_cli_quality_and_simrank(spark, tmp_path, keep_session, capsys):
    docs = str(tmp_path / "docs.parquet")
    good = "the quick brown fox jumps over the lazy dog and that is all " * 5
    spark.createDataFrame([(1, good), (2, "tiny doc")],
                          "doc_id long, text string").write.parquet(docs)

    out = _run(capsys, ["quality", "--input", docs, "--output",
                        str(tmp_path / "g"), "--signal", "gopher"])
    assert out["n_docs"] == 2 and out["n_kept"] == 1

    out = _run(capsys, ["quality", "--input", docs, "--output",
                        str(tmp_path / "d"), "--signal", "dsir",
                        "--target-sql", "doc_id = 1"])
    assert out["n_docs"] == 2 and "n_kept" not in out

    e = str(tmp_path / "edges4.parquet")
    spark.createDataFrame(
        [(1, 10), (2, 10), (1, 11), (2, 11), (3, 11)],
        ["src", "dst"]).write.parquet(e)
    out = _run(capsys, ["simrank", "--edges", e, "--output",
                        str(tmp_path / "sr"), "--top-k", "5"])
    assert out["n_pairs"] == 1  # only (10, 11) share an in-neighbor


def test_cli_triads_dyads(spark, tmp_path, keep_session, capsys):
    ep = str(tmp_path / "edges")
    spark.createDataFrame([(1, 2), (2, 3), (3, 1), (2, 1)],
                          ["src", "dst"]).write.parquet(ep)
    info = _run(capsys, ["triads", "--edges", ep,
                         "--output", str(tmp_path / "tri"),
                         "--master", "local[4]"])
    assert info["n_triangles"] == 1 and info["n_cyclic"] == 1
    # 2->1 reciprocal adds a transitive embedding: 3->1, 1->2, 3->2? no —
    # instances: (2,3,1)? 2->3,3->1,2->1 yes -> exactly 1 transitive
    assert info["n_transitive"] == 1
    info = _run(capsys, ["dyads", "--edges", ep,
                         "--output", str(tmp_path / "dy"),
                         "--master", "local[4]"])
    assert info["n_mutual"] == 1 and info["n_asymmetric"] == 2
    assert info["n_null"] == 0


def test_cli_spread_and_funnel(spark, tmp_path, keep_session, capsys):
    ep = str(tmp_path / "edges")
    spark.createDataFrame([(1, 2), (2, 3)], ["src", "dst"]).write.parquet(ep)
    sp = str(tmp_path / "seeds")
    spark.createDataFrame([(1, 1.0)], ["vid", "y"]).write.parquet(sp)
    info = _run(capsys, ["spread", "--edges", ep, "--seeds", sp,
                         "--output", str(tmp_path / "sc"),
                         "--max-iter", "2", "--master", "local[4]"])
    assert info["n_vertices"] == 3 and info["n_seeds"] == 1

    import datetime as dt
    evp = str(tmp_path / "ev")
    T = dt.datetime
    spark.createDataFrame(
        [(1, "view", T(2024, 1, 1, 1)), (1, "click", T(2024, 1, 1, 2))],
        "user_id LONG, event_type STRING, ts TIMESTAMP").write.parquet(evp)
    info = _run(capsys, ["funnel", "--input", evp, "--steps", "view,click",
                         "--output", str(tmp_path / "fn"),
                         "--master", "local[4]"])
    assert info["stage1_view"] == 1 and info["stage2_click"] == 1


def test_cli_safety_pii(spark, tmp_path, keep_session, capsys):
    p = str(tmp_path / "pdocs.parquet")
    spark.createDataFrame(
        [(1, "write to alice@example.com today"),
         (2, "server at 10.1.2.3 is fine"),
         (3, "nothing sensitive here")],
        ["doc_id", "text"]).write.parquet(p)
    out = str(tmp_path / "pii")
    info = _run(capsys, ["safety", "--input", p, "--output", out,
                         "--signal", "pii", "--master", "local[4]"])
    assert info["n_docs"] == 3 and info["n_flagged"] == 2


def test_cli_safety_blocklist(spark, tmp_path, keep_session, capsys,
                              docs_parquet):
    out = str(tmp_path / "bl")
    info = _run(capsys, ["safety", "--input", docs_parquet, "--output", out,
                         "--signal", "blocklist", "--blocklist", "lazy",
                         "--master", "local[4]"])
    assert info["n_docs"] == 4 and info["n_dropped"] == 2


def test_cli_tokenizer_and_perplexity(spark, tmp_path, keep_session, capsys,
                                      docs_parquet):
    out = str(tmp_path / "tok")
    info = _run(capsys, ["tokenizer", "--input", docs_parquet, "--output",
                         out, "--mode", "fertility", "--merges", "2",
                         "--master", "local[4]"])
    assert info["n_rows"] == 4
    out2 = str(tmp_path / "ppl")
    info = _run(capsys, ["perplexity", "--input", docs_parquet, "--output",
                         out2, "--order", "1", "--master", "local[4]"])
    assert info["n_docs"] == 4


def test_cli_matching_and_cpm(spark, tmp_path, keep_session, capsys):
    p = str(tmp_path / "medges.parquet")
    spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 3), (2, 4)],
        ["src", "dst"]).write.parquet(p)
    out = str(tmp_path / "match")
    info = _run(capsys, ["matching", "--edges", p, "--output", out,
                         "--rounds", "5", "--master", "local[4]"])
    assert info["matched_pairs"] == 2
    out2 = str(tmp_path / "cpm")
    info = _run(capsys, ["cpm", "--edges", p, "--output", out2,
                         "--master", "local[4]"])
    assert info["n_communities"] == 1 and info["membership_rows"] == 4


def test_cli_densest_and_influencemax(spark, tmp_path, keep_session,
                                      capsys):
    # 5-clique + a pendant chain: the clique is the densest subgraph
    clique = [(i, j) for i in range(5) for j in range(5) if i < j]
    chain = [(100 + i, 101 + i) for i in range(30)]
    p = str(tmp_path / "dedges.parquet")
    spark.createDataFrame(clique + chain, ["src", "dst"]) \
        .write.parquet(p)
    out = str(tmp_path / "densest")
    info = _run(capsys, ["densest", "--edges", p, "--output", out,
                         "--max-rounds", "4", "--master", "local[4]"])
    assert info["best_vertices"] == 5
    assert info["best_density"] == 2.0      # 10 undirected edges / 5
    out2 = str(tmp_path / "im")
    info = _run(capsys, ["influencemax", "--edges", p, "--output", out2,
                         "--k", "2", "--p", "1.0", "--sims", "2",
                         "--master", "local[4]"])
    assert len(info["seeds"]) == 2
    assert info["est_spread"] > 0


def test_cli_datasheet(spark, tmp_path, keep_session, capsys):
    rows = [(1, "A", "the quick brown fox and the dog"),
            (2, "A", "the quick brown fox and the dog"),
            (3, "B", "le chat est une bete que les gens")]
    p = str(tmp_path / "dsdocs.parquet")
    spark.createDataFrame(rows, ["doc_id", "source", "text"]) \
        .write.parquet(p)
    out = str(tmp_path / "datasheet")
    info = _run(capsys, ["datasheet", "--input", p, "--output", out,
                         "--master", "local[4]"])
    assert info["n_sources"] == 2 and info["n_docs"] == 3
