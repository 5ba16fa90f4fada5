"""Relational operator suite: ported reference goldens (SURVEY.md §5).

Covers analytics (degrees/density — test_analytics.py goldens), the W1
window op, enrichment joins (suffix trie semantics, label binarization
goldens from test_writers.py), and scalar functions.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from credigraph_spark.analytics import (
    degree_filter,
    degree_stats,
    density,
    degree_table,
    top_k_by,
    total_degree_counts,
)
from credigraph_spark.content import length_filter, language_filter, top_bottom_k_per_group
from credigraph_spark.enrich import (
    attach_edge_scores,
    attach_scores,
    average_binarize_labels,
    longest_suffix_match,
    overlap_count,
)
from credigraph_spark.functions import (
    iso_week_monday_yyyymmdd,
    is_valid_reversed_host,
    normalize_domain,
    reverse_host,
    sigmoid,
)

from tests.conftest import edges_df


def test_three_edge_triangle_goldens(spark):
    """Reference golden: 3-edge triangle a->b, a->c, b->c — every vertex has
    total degree 2; density = 3/(3*2) = 0.5 (test_analytics.py:21-27,103-108)."""
    e = edges_df(spark, [(0, 1), (0, 2), (1, 2)])
    degs = {r["vid"]: r["deg"] for r in total_degree_counts(e).collect()}
    assert degs == {0: 2, 1: 2, 2: 2}
    d = density(e).collect()[0]
    assert d["n_edges"] == 3 and d["n_vertices"] == 3 and d["density"] == 0.5


def test_three_cycle_in_out_degrees(spark):
    """Reference golden: 3-cycle -> V=3, E=3, all in/out degrees 1
    (test_writers.py:104-131 build_from_BCC contract)."""
    e = edges_df(spark, [(0, 1), (1, 2), (2, 0)])
    rows = degree_table(e).collect()
    assert len(rows) == 3
    assert all(r["in_deg"] == 1 and r["out_deg"] == 1 for r in rows)


def test_degree_stats_and_filter(spark):
    e = edges_df(spark, [(0, i) for i in range(1, 6)] + [(1, 2)])
    s = degree_stats(e).collect()[0]
    assert s["max_deg"] == 5 and s["min_deg"] == 1 and s["n_leaves"] == 3
    kept, fe = degree_filter(e, min_degree=1)
    kept_ids = {r["vid"] for r in kept.collect()}
    assert kept_ids == {0, 1, 2}
    assert {(r["src"], r["dst"]) for r in fe.collect()} == {(0, 1), (0, 2), (1, 2)}


def test_top_bottom_k_per_group(spark):
    df = spark.createDataFrame(
        [("a", i, f"r{i}") for i in range(1, 6)] + [("b", 7, "x")],
        ["grp", "len", "payload"],
    )
    out = top_bottom_k_per_group(df, "grp", "len", k=2, tiebreak="payload")
    by_grp = {}
    for r in out.collect():
        by_grp.setdefault(r["grp"], set()).add(r["len"])
    assert by_grp["a"] == {1, 2, 4, 5}
    assert by_grp["b"] == {7}


def test_top_k_by(spark):
    df = spark.createDataFrame([(i, float(i % 7)) for i in range(50)], ["vid", "rank"])
    out = top_k_by(df, "rank", k=5, tiebreak="vid").collect()
    assert [r["vid"] for r in out] == [6, 13, 20, 27, 34]


def test_content_filters(spark):
    df = spark.createDataFrame(
        [("d1", "eng", 600), ("d2", "deu", 700), ("d3", "eng,fra", 100)],
        ["Domain_Name", "WARC_Identified_Content_Language", "Content_Length"],
    )
    assert {r["Domain_Name"] for r in length_filter(df).collect()} == {"d1", "d2"}
    assert {r["Domain_Name"] for r in language_filter(df).collect()} == {"d1", "d3"}


def test_attach_scores_sentinel(spark):
    """J4: missing score -> -1.0 (txt_to_csv_sqlite.py:193-196)."""
    nodes = spark.createDataFrame([("a.com",), ("b.com",)], ["domain"])
    scores = spark.createDataFrame([("a.com", 0.5, 0.7)], ["domain", "pr_val", "hc_val"])
    out = {r["domain"]: (r["pr_val"], r["hc_val"])
           for r in attach_scores(nodes, scores).collect()}
    assert out["a.com"] == (0.5, 0.7) and out["b.com"] == (-1.0, -1.0)


def test_attach_edge_scores(spark):
    edges = spark.createDataFrame([("a.com", "b.com")], ["src", "dst"])
    scores = spark.createDataFrame([("a.com", 0.5, 0.7)], ["domain", "pr_val", "hc_val"])
    r = attach_edge_scores(edges, scores).collect()[0]
    assert (r["pr_val_src"], r["hc_val_src"]) == (0.5, 0.7)
    assert (r["pr_val_dst"], r["hc_val_dst"]) == (-1.0, -1.0)


def test_longest_suffix_match_trie_semantics(spark):
    """J6 goldens (merge_dqr_ratings_trie_filter.py:33-51): deepest
    dot-boundary suffix wins; no partial-label matches; -1.0 on miss."""
    nodes = spark.createDataFrame(
        [("news.bbc.co.uk",), ("bbc.co.uk",), ("notbbc.co.uk",), ("other.com",)],
        ["domain"],
    )
    rated = spark.createDataFrame(
        [("co.uk", 0.1), ("bbc.co.uk", 0.9)], ["domain", "pc1"]
    )
    out = {r["domain"]: r["pc1"] for r in longest_suffix_match(nodes, rated).collect()}
    assert out["news.bbc.co.uk"] == 0.9       # deepest match wins
    assert out["bbc.co.uk"] == 0.9            # exact match
    assert out["notbbc.co.uk"] == 0.1         # dot boundary: only co.uk matches
    assert out["other.com"] == -1.0           # miss sentinel


def test_average_binarize_labels(spark):
    """A14 golden: mean >= 0.5 -> 1 (test_writers.py:70-87 semantics)."""
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 0.0), ("b", 0.0), ("b", 0.0), ("b", 1.0)],
        ["domain", "label"],
    )
    out = {r["domain"]: r["label"] for r in average_binarize_labels(df).collect()}
    assert out == {"a": 1, "b": 0}


def test_overlap_count(spark):
    a = spark.createDataFrame([("x",), ("y",)], ["domain"])
    b = spark.createDataFrame([("y",), ("z",)], ["domain"])
    assert overlap_count(a, b) == 1


def test_scalar_functions(spark):
    df = spark.createDataFrame(
        [("  WWW.Example.COM  ", 0.0)], ["domain", "x"]
    ).select(
        normalize_domain(F.col("domain")).alias("norm"),
        reverse_host(normalize_domain(F.col("domain"))).alias("rev"),
        sigmoid(F.col("x")).alias("sig"),
    )
    r = df.collect()[0]
    assert r["norm"] == "example.com"
    assert r["rev"] == "com.example"
    assert math.isclose(r["sig"], 0.5)


def test_iso_week_monday(spark):
    """F11 golden: 2024-05-08 (Wed) -> ISO-week Monday 2024-05-06."""
    df = spark.createDataFrame([("2024-05-08 10:00:00",)], ["ts"]) \
        .select(iso_week_monday_yyyymmdd(F.to_timestamp("ts")).alias("wk"))
    assert df.collect()[0]["wk"] == "20240506"


def test_tld_whitelist_join(spark):
    hosts = spark.createDataFrame([("com.example",), ("zzz.bogus",)], ["host"])
    tlds = spark.createDataFrame([("com",), ("org",)], ["tld"])
    out = is_valid_reversed_host(hosts, "host", tlds)
    assert [r["host"] for r in out.collect()] == ["com.example"]
