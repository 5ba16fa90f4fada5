"""Round-5 operator wave: temporal (sessionize / as-of / interval / cohort),
exact quantiles, SALSA, butterflies, effective-diameter readout, line-level
dedup stats, TF-IDF top terms. Differential oracles are pure Python."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import edges_df


def _ts(day, h=0, m=0, s=0):
    return dt.datetime(2024, 1, day, h, m, s)


# ---------------------------------------------------------------------------
# sessionize
# ---------------------------------------------------------------------------

def test_sessionize_gap_splits(spark):
    from credigraph_spark.temporal import sessionize

    rows = [
        # user 1: 3 events tight, then a 2h gap, then 1 event
        (1, _ts(1, 10, 0), 1),
        (1, _ts(1, 10, 10), 2),
        (1, _ts(1, 10, 20), 3),
        (1, _ts(1, 12, 30), 4),
        # user 2: single event
        (2, _ts(2, 9, 0), 5),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    out = {(r.user_id, r.session_idx): r
           for r in sessionize(ev, gap_minutes=30).collect()}
    assert len(out) == 3
    s1 = out[(1, 1)]
    assert s1.n_events == 3
    assert s1.duration_us == 20 * 60 * 1_000_000
    s2 = out[(1, 2)]
    assert s2.n_events == 1 and s2.duration_us == 0
    assert out[(2, 1)].n_events == 1


def test_sessionize_boundary_exact_gap_stays(spark):
    """A gap of exactly gap_minutes does NOT split (strict >)."""
    from credigraph_spark.temporal import sessionize

    ev = spark.createDataFrame(
        [(1, _ts(1, 10, 0), 1), (1, _ts(1, 10, 30), 2)],
        "user_id long, ts timestamp, event_id long")
    out = sessionize(ev, gap_minutes=30).collect()
    assert len(out) == 1 and out[0].n_events == 2


# ---------------------------------------------------------------------------
# asof_join
# ---------------------------------------------------------------------------

def test_asof_join_basic(spark):
    from credigraph_spark.temporal import asof_join

    left = spark.createDataFrame(
        [(1, _ts(1, 12), "a"), (1, _ts(1, 9), "b"), (2, _ts(1, 12), "c")],
        "k long, lts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, _ts(1, 10), 10.0), (1, _ts(1, 11), 11.0), (2, _ts(2, 1), 99.0)],
        "k long, rts timestamp, val double")
    out = asof_join(left, right, on="k", left_ts="lts", right_ts="rts",
                    right_payload=["val"])
    got = {r.tag: r.val for r in out.collect()}
    # 12:00 sees the 11:00 snapshot; 9:00 predates everything -> null;
    # user 2's only right row is in the future -> null.
    assert got == {"a": 11.0, "b": None, "c": None}
    assert out.count() == 3


def test_asof_join_equal_ts_visible(spark):
    """A right row AT the left timestamp counts as visible."""
    from credigraph_spark.temporal import asof_join

    left = spark.createDataFrame([(1, _ts(1, 10), "x")],
                                 "k long, lts timestamp, tag string")
    right = spark.createDataFrame([(1, _ts(1, 10), 7.0)],
                                  "k long, rts timestamp, val double")
    out = asof_join(left, right, on="k", left_ts="lts", right_ts="rts",
                    right_payload=["val"]).collect()
    assert out[0].val == 7.0


def test_asof_join_tiebreak(spark):
    """Among equal-ts right rows the largest tiebreak wins."""
    from credigraph_spark.temporal import asof_join

    left = spark.createDataFrame([(1, _ts(1, 10), "x")],
                                 "k long, lts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, _ts(1, 9), 1.0, 5), (1, _ts(1, 9), 2.0, 9)],
        "k long, rts timestamp, val double, seq long")
    out = asof_join(left, right, on="k", left_ts="lts", right_ts="rts",
                    right_payload=["val"], right_tiebreak="seq").collect()
    assert out[0].val == 2.0


# ---------------------------------------------------------------------------
# interval_count_join
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("bin_days", [1, 7, 30])
def test_interval_count_join_exact(spark, bin_days):
    from credigraph_spark.temporal import interval_count_join

    intervals = spark.createDataFrame(
        [(1, 0, 10), (2, 5, 6), (3, 100, 130), (4, 50, 50)],
        "key long, s long, e long")
    pts = [0, 1, 5, 5, 9, 10, 99, 100, 129, 130, 200]
    points = spark.createDataFrame([(p,) for p in pts], "d long")
    out = {r.key: r.n_points for r in interval_count_join(
        intervals, points, "key", "s", "e", "d", bin_days=bin_days).collect()}
    # brute force
    exp = {}
    for k, s, e in [(1, 0, 10), (2, 5, 6), (3, 100, 130), (4, 50, 50)]:
        exp[k] = sum(1 for p in pts if s <= p < e)
    # empty interval (4) is dropped from binning but kept at 0
    assert out == exp
    assert out[4] == 0


# ---------------------------------------------------------------------------
# cohort_retention
# ---------------------------------------------------------------------------

def test_cohort_retention(spark):
    from credigraph_spark.temporal import cohort_retention

    # 2024-01-01 is a Monday.
    rows = [
        (1, _ts(1)), (1, _ts(3)), (1, _ts(9)),     # cohort w1, active w1+w2
        (2, _ts(2)), (2, _ts(16)),                  # cohort w1, active w1+w3
        (3, _ts(8)),                                # cohort w2
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(r.cohort_week, r.week_offset): r.n_active
           for r in cohort_retention(ev).collect()}
    assert out == {
        ("2024-01-01", 0): 2,
        ("2024-01-01", 1): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


# ---------------------------------------------------------------------------
# exact_quantiles
# ---------------------------------------------------------------------------

def test_exact_quantiles_matches_ceil_rank(spark):
    from credigraph_spark.analytics import exact_quantiles

    # duplicates + negative + skew, shuffled across partitions
    vals = [5.0, 1.0, 1.0, 2.0, 9.0, 9.0, 9.0, -3.0, 4.0, 7.5, 2.0, 0.0]
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(7)
    qs = (0.1, 0.25, 0.5, 0.75, 0.9, 1.0)
    out = {r.q: r.value for r in
           exact_quantiles(df, "x", qs=qs, num_ranges=5).collect()}
    srt = sorted(vals)
    exp = {q: srt[math.ceil(q * len(vals)) - 1] for q in qs}
    assert out == exp


def test_exact_quantiles_single_partition_equiv(spark):
    from credigraph_spark.analytics import exact_quantiles

    vals = [float(i % 13) for i in range(200)]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    a = {r.q: r.value for r in
         exact_quantiles(df, "x", num_ranges=1).collect()}
    b = {r.q: r.value for r in
         exact_quantiles(df.repartition(11), "x", num_ranges=9).collect()}
    assert a == b and len(a) == 5


# ---------------------------------------------------------------------------
# SALSA
# ---------------------------------------------------------------------------

def _salsa_py(edges, iters):
    verts = sorted({v for e in edges for v in e})
    od, idg = {}, {}
    for s, d in edges:
        od[s] = od.get(s, 0) + 1
        idg[d] = idg.get(d, 0) + 1
    hub = {v: 1.0 / len(verts) for v in verts}
    auth = {}
    for _ in range(iters):
        auth = {}
        for s, d in edges:
            auth[d] = auth.get(d, 0.0) + hub.get(s, 0.0) / od[s]
        hub = {}
        for s, d in edges:
            hub[s] = hub.get(s, 0.0) + auth.get(d, 0.0) / idg[d]
    return {v: (hub.get(v, 0.0), auth.get(v, 0.0)) for v in verts}


def test_salsa_differential(spark):
    from credigraph_spark.graph.salsa import salsa

    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (4, 2), (5, 1)]
    exp = _salsa_py(edges, 3)
    out = {r.vid: (r.hub, r.auth)
           for r in salsa(edges_df(spark, edges), max_iter=3).collect()}
    assert set(out) == set(exp)
    for v in exp:
        assert out[v][0] == pytest.approx(exp[v][0], abs=1e-8)
        assert out[v][1] == pytest.approx(exp[v][1], abs=1e-8)


def test_salsa_mass_preserved(spark):
    """Both SALSA transition matrices are column-stochastic: after each
    full step total hub mass == total auth mass == mass reachable from
    non-dangling starts (here: all of it, every vertex has an out-edge)."""
    from credigraph_spark.graph.salsa import salsa

    edges = [(1, 2), (2, 3), (3, 1), (2, 1), (3, 2)]
    out = salsa(edges_df(spark, edges), max_iter=4).agg(
        F.sum("hub").alias("h"), F.sum("auth").alias("a")).collect()[0]
    assert out.h == pytest.approx(1.0, abs=1e-6)
    assert out.a == pytest.approx(1.0, abs=1e-6)


# ---------------------------------------------------------------------------
# butterflies
# ---------------------------------------------------------------------------

def _butterflies_py(edges):
    from collections import defaultdict
    outs = defaultdict(set)
    for s, d in edges:
        if s != d:
            outs[s].add(d)
    srcs = sorted(outs)
    pairs = 0
    bf = 0
    for i, s1 in enumerate(srcs):
        for s2 in srcs[i + 1:]:
            c = len(outs[s1] & outs[s2])
            if c >= 2:
                pairs += 1
            bf += c * (c - 1) // 2
    return pairs, bf


def test_butterfly_count_differential(spark):
    from credigraph_spark.graph.butterflies import butterfly_count

    # K_{3,3}-ish plus noise: lots of shared-neighbor structure
    edges = [(s, d) for s in (1, 2, 3) for d in (10, 11, 12)]
    edges += [(4, 10), (4, 11), (5, 12), (1, 99), (2, 99), (7, 7)]
    exp_pairs, exp_bf = _butterflies_py(edges)
    row = butterfly_count(edges_df(spark, edges)).collect()[0]
    assert (row.n_wedge_pairs, row.n_butterflies) == (exp_pairs, exp_bf)
    assert row.n_butterflies >= 9  # C(3,2)^2 from the K_{3,3} block


def test_butterfly_orientation_invariant(spark):
    """n_butterflies is identical from either wedge orientation (and
    under auto), even though n_wedge_pairs is orientation-specific."""
    from credigraph_spark.graph.butterflies import butterfly_count

    edges = [(s, d) for s in (1, 2, 3) for d in (10, 11, 12)]
    edges += [(4, 10), (4, 11), (5, 12), (1, 99), (2, 99)]
    e = edges_df(spark, edges)
    _, exp_bf = _butterflies_py(edges)
    for orient in ("src", "dst", "auto"):
        row = butterfly_count(e, orient=orient).collect()[0]
        assert row.n_butterflies == exp_bf, orient


def test_butterfly_hub_cap(spark):
    from credigraph_spark.graph.butterflies import butterfly_count

    edges = [(s, d) for s in (1, 2, 3) for d in (10, 11)]
    edges += [(i, 50) for i in range(1, 20)]  # hub dst indeg 19
    full = butterfly_count(edges_df(spark, edges)).collect()[0]
    capped = butterfly_count(edges_df(spark, edges), hub_cap=5).collect()[0]
    exp_pairs, exp_bf = _butterflies_py([(s, d) for s, d in edges if d != 50])
    assert (capped.n_wedge_pairs, capped.n_butterflies) == (exp_pairs, exp_bf)
    assert full.n_butterflies > capped.n_butterflies


# ---------------------------------------------------------------------------
# effective-diameter hop readout
# ---------------------------------------------------------------------------

def test_effective_diameter_hops_consistent_with_curve(spark):
    from credigraph_spark.graph.anf import anf_sketch, effective_diameter_hops

    # 9-cycle: reach keeps growing through hop 4
    edges = [(i, (i + 1) % 9) for i in range(9)]
    e = edges_df(spark, edges)
    per_hop, _ = anf_sketch(e, max_hops=4, num_registers=4)
    curve = {r.hop: r.sum_rho for r in per_hop.collect()}
    final = curve[4]
    exp_hop = min(h for h in sorted(curve) if curve[h] * 10 >= final * 9)
    row = effective_diameter_hops(e, max_hops=4).collect()[0]
    assert row.eff_hop == exp_hop
    assert row.sum_rho_final == final
    assert row.sum_rho_eff == curve[exp_hop]


# ---------------------------------------------------------------------------
# line_dedup_stats
# ---------------------------------------------------------------------------

def test_line_dedup_stats(spark):
    from credigraph_spark.pipeline.textstats import line_dedup_stats

    docs = [
        (1, "home | about\ncontact us\nunique one"),
        (2, "home | about\ncontact us\nunique two"),
        (3, "totally distinct\n\n   \nanother line"),
        (4, ""),  # no non-empty lines
        (5, "dup inside\ndup inside\nfresh"),  # intra-doc dup: distinct once
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r.doc_id: r for r in line_dedup_stats(df).collect()}
    assert out[1].n_lines == 3 and out[1].n_dup_lines == 2
    assert out[2].n_lines == 3 and out[2].n_dup_lines == 2
    assert out[3].n_lines == 2 and out[3].n_dup_lines == 0
    assert out[4].n_lines == 0 and out[4].dup_ratio == 0.0
    # intra-doc repetition is NOT cross-doc duplication
    assert out[5].n_lines == 2 and out[5].n_dup_lines == 0
    assert out[1].dup_ratio == pytest.approx(2 / 3, abs=1e-8)


# ---------------------------------------------------------------------------
# tfidf_top_terms
# ---------------------------------------------------------------------------

def test_tfidf_top_terms(spark):
    from credigraph_spark.pipeline.textstats import tfidf_top_terms

    docs = [
        (1, "apple apple banana shared"),
        (2, "banana cherry shared"),
        (3, "cherry cherry cherry shared"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = tfidf_top_terms(df, n_docs=3, k=2).collect()
    top = {(r.doc_id, r.rnk): (r.term, r.tfidf) for r in out}
    # doc 1: apple tf=2 df=1 -> 2*ln(3); banana tf=1 df=2 -> ln(1.5)
    assert top[(1, 1)][0] == "apple"
    assert top[(1, 1)][1] == pytest.approx(round(2 * math.log(3), 6), abs=1e-9)
    assert top[(1, 2)][0] == "banana"
    # 'shared' has df=3 -> score 0 everywhere, never in top-2 where beaten
    assert top[(3, 1)][0] == "cherry"
    assert all(r.rnk <= 2 for r in out)


# ---------------------------------------------------------------------------
# weighted_sample (Efraimidis-Spirakis, deterministic md5 draw)
# ---------------------------------------------------------------------------

def _es_key_py(doc_id, w, seed=42, digits=9):
    import hashlib
    h = hashlib.md5(f"{doc_id}|{seed}".encode()).hexdigest()[:15]
    u = (int(h, 16) + 1.0) / float(16 ** 15)
    return round(math.log(u) / w, digits)


def test_weighted_sample_differential(spark):
    from credigraph_spark.pipeline.sampling import weighted_sample

    rows = [(i, float(1 + (i * 7) % 13)) for i in range(1, 101)]
    rows += [(200, 0.0), (201, None)]  # excluded: non-positive / null weight
    df = spark.createDataFrame(rows, "doc_id long, w double").repartition(9)
    out = weighted_sample(df, ["doc_id"], "w", k=10).collect()
    assert len(out) == 10
    exp = sorted(((_es_key_py(i, w), -i) for i, w in rows if w),
                 reverse=True)[:10]
    exp_ids = sorted(-e[1] for e in exp)
    assert sorted(r.doc_id for r in out) == exp_ids
    for r in out:
        assert r.es_key == pytest.approx(
            _es_key_py(r.doc_id, dict(rows)[r.doc_id]), abs=1e-12)


def test_weighted_sample_partition_invariant(spark):
    from credigraph_spark.pipeline.sampling import weighted_sample

    rows = [(i, float(i % 5 + 1)) for i in range(1, 60)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    a = sorted(r.doc_id for r in weighted_sample(df, ["doc_id"], "w", 7).collect())
    b = sorted(r.doc_id for r in
               weighted_sample(df.repartition(13), ["doc_id"], "w", 7).collect())
    assert a == b


# ---------------------------------------------------------------------------
# pmi_top_pairs
# ---------------------------------------------------------------------------

def test_pmi_top_pairs(spark):
    from credigraph_spark.pipeline.textstats import pmi_top_pairs

    docs = [
        (1, "alpha beta gamma"),
        (2, "alpha beta"),
        (3, "alpha beta delta"),
        (4, "gamma delta"),
        (5, "alpha epsilon"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = pmi_top_pairs(df, n_docs=5, vocab_k=10, min_pair_docs=2, k=5).collect()
    got = {(r.a, r.b): (r.cab, r.pmi) for r in out}
    # alpha-beta co-occur in 3 docs; c(alpha)=4, c(beta)=3
    assert got[("alpha", "beta")][0] == 3
    assert got[("alpha", "beta")][1] == pytest.approx(
        round(math.log(5 * 3 / (4 * 3)), 6), abs=1e-9)
    # pairs below min_pair_docs=2 are dropped
    assert ("gamma", "delta") not in got or got[("gamma", "delta")][0] >= 2
    # ranking: beta-? with the highest pmi first
    ranks = {r.rnk for r in out}
    assert ranks == set(range(1, len(out) + 1))


def test_pmi_vocab_cutoff_bounds_pairs(spark):
    from credigraph_spark.pipeline.textstats import pmi_top_pairs

    # vocab_k=2 keeps only the 2 most frequent terms -> at most 1 pair
    docs = [(i, "common other rare%d unique%d" % (i, i)) for i in range(10)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = pmi_top_pairs(df, n_docs=10, vocab_k=2, min_pair_docs=2, k=50).collect()
    assert len(out) <= 1
    if out:
        assert {out[0].a, out[0].b} == {"common", "other"}


# ---------------------------------------------------------------------------
# burst_days
# ---------------------------------------------------------------------------

def test_burst_days(spark):
    from credigraph_spark.temporal import burst_days

    # type A: 3 days with counts 2, 2, 8 (day 3 is the burst)
    rows = []
    for day, n in ((1, 2), (2, 2), (3, 8)):
        rows += [(f"A", dt.datetime(2024, 1, day, 10, i)) for i in range(n)]
    # type B: single day -> degenerate, z = 0.0
    rows += [("B", dt.datetime(2024, 1, 1, 9, 0))]
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp")
    out = {(r.event_type, r.day): r for r in burst_days(ev).collect()}
    xs = [2, 2, 8]
    n = len(xs)
    mean = sum(xs) / n
    var = (n * sum(x * x for x in xs) - sum(xs) ** 2) / (n * (n - 1))
    z8 = round((8 - mean) / math.sqrt(var), 6)
    assert out[("A", "2024-01-03")].z == pytest.approx(z8, abs=1e-9)
    assert out[("A", "2024-01-03")].n_events == 8
    assert out[("B", "2024-01-01")].z == 0.0
    assert len(out) == 4


# ---------------------------------------------------------------------------
# Boruvka minimum spanning forest
# ---------------------------------------------------------------------------

def _kruskal_msf(edges):
    """Unique MSF under the (w, u, v) total order — tiebreak makes
    weights effectively distinct, so Boruvka must agree exactly."""
    canon = {}
    for s, d, w in edges:
        if s == d:
            continue
        u, v = min(s, d), max(s, d)
        canon[(u, v)] = min(canon.get((u, v), w), w)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for (u, v), w in sorted(canon.items(), key=lambda kv: (kv[1], kv[0])):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[ru] = rv
            out.add((u, v, w))
    return out


def test_boruvka_matches_kruskal(spark):
    from credigraph_spark.graph.mst import boruvka_msf

    # weighted graph with ties, parallel + reverse edges, two components
    edges = [(1, 2, 4), (2, 3, 1), (3, 1, 4), (2, 1, 7), (3, 4, 2),
             (4, 5, 2), (5, 3, 2), (10, 11, 5), (11, 12, 5), (12, 10, 5)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    exp = _kruskal_msf(edges)
    got = {(r.u, r.v, r.w)
           for r in boruvka_msf(df, max_rounds=6).collect()}
    assert got == exp
    # spanning forest size: n - #components = 8 - 2
    assert len(got) == 6


def test_boruvka_round_budget_is_subset(spark):
    from credigraph_spark.graph.mst import boruvka_msf

    import random
    rng = random.Random(7)
    edges = [(rng.randrange(30), rng.randrange(30), rng.randrange(1, 50))
             for _ in range(120)]
    edges = [(s, d, w) for s, d, w in edges if s != d]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    full = {(r.u, r.v, r.w) for r in boruvka_msf(df, max_rounds=8).collect()}
    one = {(r.u, r.v, r.w) for r in boruvka_msf(df, max_rounds=1).collect()}
    assert one <= full
    assert full == _kruskal_msf(edges)


# ---------------------------------------------------------------------------
# count-min sketch
# ---------------------------------------------------------------------------

def _cms_col_py(term, row, width=512, seed=7):
    import hashlib
    h = hashlib.md5(f"{seed}:{row}:{term}".encode()).hexdigest()[:15]
    return int(h, 16) % width


def test_cms_estimates_differential(spark):
    from credigraph_spark.pipeline.sketch import cms_build, cms_estimate

    words = (["apple"] * 30 + ["banana"] * 12 + ["cherry"] * 5
             + [f"rare{i}" for i in range(40)])
    occ = spark.createDataFrame([(w,) for w in words], "term string")
    depth, width = 3, 64
    cms = cms_build(occ, depth=depth, width=width, seed=7)
    # python replica of the grid
    from collections import Counter
    grid = Counter()
    for w in words:
        for r in range(depth):
            grid[(r, _cms_col_py(w, r, width))] += 1
    got_grid = {(r.row, r.col): r.cnt for r in cms.collect()}
    assert got_grid == dict(grid)

    terms = spark.createDataFrame([("apple",), ("banana",), ("never",)],
                                  "term string")
    est = {r.term: r.cms_n for r in
           cms_estimate(cms, terms, depth=depth, width=width, seed=7).collect()}
    exp = {t: min(grid[(r, _cms_col_py(t, r, width))] for r in range(depth))
           for t in ("apple", "banana", "never")}
    assert est == exp
    # overestimate property: never below the true count
    assert est["apple"] >= 30 and est["banana"] >= 12
    assert est["never"] >= 0


def test_cms_wide_sketch_is_exact(spark):
    """With width >> distinct terms, collisions vanish and the sketch
    returns exact counts."""
    from credigraph_spark.pipeline.sketch import cms_build, cms_estimate

    words = ["a"] * 7 + ["b"] * 3 + ["c"]
    occ = spark.createDataFrame([(w,) for w in words], "term string")
    cms = cms_build(occ, depth=4, width=4096, seed=7)
    terms = occ.distinct()
    est = {r.term: r.cms_n for r in
           cms_estimate(cms, terms, depth=4, width=4096, seed=7).collect()}
    assert est == {"a": 7, "b": 3, "c": 1}


# ---------------------------------------------------------------------------
# Luby coloring
# ---------------------------------------------------------------------------

def _coloring_py(edges, n_colors=3, rounds=3, seed=7):
    import hashlib
    und = {}
    for s, d in edges:
        if s == d:
            continue
        und.setdefault(s, set()).add(d)
        und.setdefault(d, set()).add(s)
    remaining = set(und)
    colored = {}
    for c in range(1, n_colors + 1):
        pri = {v: hashlib.md5(f"{seed}:{c}:{v}".encode()).hexdigest()
               for v in remaining}
        active = set(remaining)
        for _ in range(rounds):
            if not active:
                break
            winners = {v for v in active
                       if all(pri[v] < pri[n]
                              for n in und[v] if n in active)}
            removed = {n for v in winners for n in und[v]
                       if n in active} - winners
            for v in winners:
                colored[v] = c
            active -= winners | removed
        remaining -= {v for v in colored if colored.get(v) == c}
    for v in remaining:
        colored.setdefault(v, 0)
    return colored


def test_coloring_differential(spark):
    from credigraph_spark.graph.coloring import luby_coloring

    import random
    rng = random.Random(3)
    edges = list({(rng.randrange(25), rng.randrange(25)) for _ in range(70)})
    edges = [(s, d) for s, d in edges if s != d]
    df = edges_df(spark, edges)
    got = {r.vid: r.color for r in luby_coloring(df).collect()}
    exp = _coloring_py(edges)
    assert got == exp


def test_coloring_is_proper(spark):
    from credigraph_spark.graph.coloring import luby_coloring

    edges = [(i, j) for i in range(10) for j in range(10)
             if i < j and (i + j) % 3 == 0]
    df = edges_df(spark, edges)
    colors = {r.vid: r.color for r in luby_coloring(df, n_colors=4).collect()}
    for s, d in edges:
        if colors[s] != 0:
            assert colors[s] != colors[d], (s, d)
    # each vertex exactly once
    assert len(colors) == len({v for e in edges for v in e})


# ---------------------------------------------------------------------------
# TrustRank / spam mass
# ---------------------------------------------------------------------------

def _py_pagerank(edges, n_iter, d=0.85):
    verts = sorted({v for e in edges for v in e})
    out = {}
    for s, t in edges:
        out.setdefault(s, []).append(t)
    n = len(verts)
    r = {v: 1.0 / n for v in verts}
    for _ in range(n_iter):
        dang = sum(r[v] for v in verts if v not in out)
        nxt = {v: 0.0 for v in verts}
        for u, tgts in out.items():
            for t in tgts:
                nxt[t] += r[u] / len(tgts)
        r = {v: (1 - d) / n + d * (nxt[v] + dang / n) for v in verts}
    return r


def _py_trustrank(edges, seeds, n_iter, d=0.85):
    out = {}
    for s, t in edges:
        out.setdefault(s, []).append(t)
    p = 1.0 / len(seeds)
    r = {v: p for v in seeds}
    for _ in range(n_iter):
        dang = sum(rk for v, rk in r.items() if v not in out)
        nxt = {}
        for u, rk in r.items():
            for t in out.get(u, []):
                nxt[t] = nxt.get(t, 0.0) + rk / len(out[u])
        r = {v: d * c for v, c in nxt.items()}
        for v in seeds:
            r[v] = r.get(v, 0.0) + (1 - d) * p + d * dang * p
    return r


def test_spam_mass_differential(spark):
    from credigraph_spark.graph import spam_mass

    # trusted hub 1 -> {2,3}, 2 -> 3; disconnected "spam farm" 10<->11->12
    pairs = [(1, 2), (1, 3), (2, 3), (10, 11), (11, 10), (11, 12)]
    trusted = spark.createDataFrame([(1,)], "vid long")
    got = {r.vid: r for r in
           spam_mass(edges_df(spark, pairs), trusted, max_iter=4).collect()}

    pr = _py_pagerank(pairs, 4)
    tr = _py_trustrank(pairs, [1], 4)
    assert set(got) == set(pr)
    for v in pr:
        assert got[v].pr == pytest.approx(pr[v], abs=1e-12)
        assert got[v].tr == pytest.approx(tr.get(v, 0.0), abs=1e-12)
        want = (pr[v] - tr.get(v, 0.0)) / pr[v] if pr[v] > 0 else 0.0
        assert got[v].spam_mass == pytest.approx(want, abs=1e-12)
    # the farm receives zero trust: spam_mass exactly 1 there
    assert got[12].spam_mass == pytest.approx(1.0)
    assert got[10].spam_mass == pytest.approx(1.0)
    # the trusted seed holds more than its fair share: spam_mass <= 0
    assert got[1].spam_mass <= 0.0


def test_top_indegree_seeds(spark):
    from credigraph_spark.graph import top_indegree_seeds

    pairs = [(1, 5), (2, 5), (3, 5), (1, 6), (2, 6), (1, 7), (9, 8), (9, 7)]
    got = sorted(r.vid for r in
                 top_indegree_seeds(edges_df(spark, pairs), 2).collect())
    # in-degrees: 5->3, 6->2, 7->2, 8->1; top-2 = {5, 6} (vid tiebreak)
    assert got == [5, 6]


def test_gopher_quality_rules(spark):
    from credigraph_spark.pipeline import gopher_quality

    long_good = "the quick brown fox jumps over a lazy dog " * 6  # 54 words
    too_short = "the tiny a doc"
    no_stop = "alpha beta gamma delta " * 15  # 60 words, 0 stopwords
    digits = " ".join(["12345"] * 60) + " the a the"  # alpha_frac ~ 0.05
    df = spark.createDataFrame(
        [(1, long_good), (2, too_short), (3, no_stop), (4, digits), (5, "")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in
           gopher_quality(df, min_words=50, stopwords=("the", "a"),
                          min_stopwords=2).collect()}

    for doc_id, text in [(1, long_good), (2, too_short), (3, no_stop),
                         (4, digits), (5, "")]:
        w = [x for x in text.lower().split() if x]
        assert got[doc_id].n_words == len(w)
        if w:
            assert got[doc_id].mean_word_len == pytest.approx(
                round(sum(len(x) for x in w) / len(w), 8), abs=1e-12)
            alpha = sum(1 for x in w if any("a" <= c <= "z" for c in x))
            assert got[doc_id].alpha_frac == pytest.approx(
                round(alpha / len(w), 8), abs=1e-12)
        assert got[doc_id].n_stop == len({"the", "a"} & set(w))
    assert got[1].keep is True
    assert got[2].keep is False      # < min_words
    assert got[3].keep is False      # no stopwords
    assert got[4].keep is False      # alpha_frac < 0.8
    assert got[5].keep is False      # empty


def test_c4_line_stats_rules(spark):
    from credigraph_spark.pipeline import c4_line_stats

    doc1 = ("This is a good sentence with enough words.\n"
            "short line.\n"
            "Another proper sentence that should be kept here!\n"
            "this line has no terminal punctuation at all\n"
            "Uses javascript so it must be dropped away now.\n"
            "   \n"
            "A final valid closing sentence ends the doc?")
    doc2 = "One single valid sentence that still fails the doc floor."
    df = spark.createDataFrame([(1, doc1), (2, doc2)],
                               "doc_id long, text string")
    got = {r.doc_id: r for r in
           c4_line_stats(df, min_words_per_line=5, min_kept_lines=2).collect()}

    # doc1: 6 non-empty lines; kept = lines 1, 3, 7
    assert got[1].n_lines == 6
    assert got[1].kept_lines == 3
    assert got[1].kept_words == 8 + 8 + 8
    assert got[1].kept_frac == pytest.approx(round(3 / 6, 8))
    assert got[1].keep is True
    assert got[2].n_lines == 1 and got[2].kept_lines == 1
    assert got[2].keep is False


def test_dsir_importance_differential(spark):
    import hashlib
    import math

    from credigraph_spark.pipeline import dsir_importance

    texts = {1: "the cat sat on the mat", 2: "the dog ate the cat food",
             3: "quantum flux capacitor drives the core", 4: "",
             5: "cat cat cat"}
    target_ids = {1, 2}  # in-domain: cat/dog sentences
    df = spark.createDataFrame(sorted(texts.items()), "doc_id long, text string")
    got = {r.doc_id: r for r in
           dsir_importance(df, target=F.col("doc_id").isin(*target_ids))
           .collect()}

    def feats(t):
        w = [x for x in t.lower().split() if x]
        return w + [f"{a} {b}" for a, b in zip(w, w[1:])]

    def bucket(f):
        return hashlib.md5(f.encode()).hexdigest()[:2]

    cnt, tcnt = {}, {}
    for d, t in texts.items():
        for f in feats(t):
            b = bucket(f)
            cnt[b] = cnt.get(b, 0) + 1
            if d in target_ids:
                tcnt[b] = tcnt.get(b, 0) + 1
    rt, tt = sum(cnt.values()), sum(tcnt.values())
    lr = {b: math.log((tcnt.get(b, 0) + 1.0) / (tt + 256.0))
          - math.log((c + 1.0) / (rt + 256.0)) for b, c in cnt.items()}

    for d, t in texts.items():
        fs = feats(t)
        assert got[d].n_feats == len(fs)
        want = round(sum(lr[bucket(f)] for f in fs), 6)
        assert got[d].logw == pytest.approx(want, abs=1e-9)
    # in-domain docs must outscore the out-of-domain one
    assert got[1].logw > got[3].logw and got[2].logw > got[3].logw
    assert got[4].n_feats == 0 and got[4].logw == 0.0


def test_community_conductance_differential(spark):
    from credigraph_spark.analytics import community_conductance

    # two 4-cliques bridged by one edge; labels = clique id
    c1, c2 = [1, 2, 3, 4], [5, 6, 7, 8]
    pairs = ([(a, b) for a in c1 for b in c1 if a < b]
             + [(a, b) for a in c2 for b in c2 if a < b] + [(4, 5)])
    labels = spark.createDataFrame(
        [(v, 100) for v in c1] + [(v, 200) for v in c2], "vid long, label long")
    got = {r.community: r for r in
           community_conductance(edges_df(spark, pairs), labels).collect()}

    # m = 13; each side: vol = 2*6 + 1 = 13, cut = 1
    for c in (100, 200):
        assert got[c].n_members == 4
        assert got[c].volume == 13
        assert got[c].cut_edges == 1
        assert got[c].conductance == pytest.approx(round(1 / 13, 8))

    # single community owning everything -> denominator 0 -> 0.0
    one = spark.createDataFrame([(v, 7) for v in c1 + c2], "vid long, label long")
    row = community_conductance(edges_df(spark, pairs), one).collect()
    assert len(row) == 1 and row[0].conductance == 0.0 and row[0].cut_edges == 0


def test_quantize_int8_differential(spark):
    from credigraph_spark.pipeline import quantize_int8_stats

    vecs = {1: [1.0, -0.5, 0.25, 127.0], 2: [0.0, 0.0], 3: [-2.0]}
    df = spark.createDataFrame(
        [(k, [float(x) for x in v]) for k, v in sorted(vecs.items())],
        "vec_id long, embedding array<float>")
    got = {r.vec_id: r for r in quantize_int8_stats(df).collect()}

    for vid, v in vecs.items():
        mx = max(abs(x) for x in v)
        scale = mx / 127.0
        if scale > 0:
            codes = [max(-127.0, min(127.0, round(x / scale))) for x in v]
            errs = [abs(x - c * scale) for x, c in zip(v, codes)]
        else:
            errs = [0.0] * len(v)
        assert got[vid].dim == len(v)
        assert got[vid].scale == pytest.approx(round(scale, 8), abs=1e-12)
        assert got[vid].mse == pytest.approx(
            round(sum(e * e for e in errs) / len(v), 8), abs=1e-12)
        assert got[vid].max_err == pytest.approx(round(max(errs), 8), abs=1e-12)
    # exactly representable grid -> zero error; max element always exact
    assert got[3].mse == 0.0 and got[3].max_err == 0.0
    assert got[2].scale == 0.0 and got[2].mse == 0.0


def test_simrank2_matches_python(spark):
    from credigraph_spark.graph.simrank import simrank2_topk

    # two "universities" pointing at shared "professors", plus noise
    pairs = [(1, 10), (2, 10), (1, 11), (2, 11), (3, 11), (3, 12),
             (4, 12), (4, 10), (5, 13), (1, 13)]
    C = 0.8
    inn = {}
    for s, d in pairs:
        inn.setdefault(d, set()).add(s)

    def s1(x, y):
        if x == y:
            return 1.0
        a, b = min(x, y), max(x, y)
        ia, ib = inn.get(a, set()), inn.get(b, set())
        if not ia or not ib:
            return 0.0
        return round(C * len(ia & ib) / (len(ia) * len(ib)), 6)

    def s2(a, b):
        ia, ib = inn[a], inn[b]
        tot = sum(1.0 if i == j else s1(i, j) for i in ia for j in ib)
        return round(C * tot / (len(ia) * len(ib)), 6)

    got = simrank2_topk(edges_df(spark, pairs), c=C,
                        n_candidates=100, k=20).collect()
    want = sorted(
        ((a, b) for a in inn for b in inn
         if a < b and inn[a] & inn[b]),
        key=lambda p: (-s2(*p), p))
    assert [(r.a, r.b) for r in got] == want[:20]
    for r in got:
        assert r.common == len(inn[r.a] & inn[r.b])
        assert r.s1 == pytest.approx(s1(r.a, r.b), abs=1e-9)
        assert r.s2 == pytest.approx(s2(r.a, r.b), abs=1e-9)
        assert 0.0 < r.s2 <= C + 1e-9


def test_earliest_arrival_time_respecting(spark):
    from credigraph_spark.graph.sssp import earliest_arrival

    # 1 -(t5)-> 2 -(t3)-> 3: the 2->3 edge departs BEFORE arrival at 2,
    # so 3 is reachable only via the later 2 -(t7)-> 3 edge.
    edges = spark.createDataFrame(
        [(1, 2, 5), (2, 3, 3), (2, 3, 7), (1, 4, 2), (4, 5, 2), (5, 6, 1)],
        "src long, dst long, ts long")
    seeds = spark.createDataFrame([(1,)], "vid long")
    got = {r.vid: r.t_arr for r in
           earliest_arrival(edges, seeds, max_rounds=4).collect()}
    # 6 unreachable: edge 5->6 departs at t1 < arrival at 5 (t2)
    assert got == {1: 0, 2: 5, 3: 7, 4: 2, 5: 2}

    # round bound: 1 round reaches only direct successors
    got1 = {r.vid: r.t_arr for r in
            earliest_arrival(edges, seeds, max_rounds=1).collect()}
    assert got1 == {1: 0, 2: 5, 4: 2}

    # start_ts after every edge: nothing but the seed survives
    late = {r.vid: r.t_arr for r in
            earliest_arrival(edges, seeds, max_rounds=4,
                             start_ts=100).collect()}
    assert late == {1: 100}


def test_jaccard_prefix_pairs_complete(spark):
    from credigraph_spark.pipeline import jaccard_prefix_pairs

    texts = {
        1: "apple banana cherry date elderberry",
        2: "apple banana cherry date fig",          # J(1,2) = 4/6
        3: "apple banana cherry date elderberry",   # J(1,3) = 1
        4: "zebra yak xerus wombat",
        5: "zebra yak xerus wombat apple",          # J(4,5) = 4/5
        6: "totally different words here now",
        7: "apple",                                 # tiny doc
    }
    df = spark.createDataFrame(sorted(texts.items()),
                               "doc_id long, text string")

    def jacc(a, b):
        sa, sb = set(texts[a].split()), set(texts[b].split())
        return len(sa & sb) / len(sa | sb)

    for t in (0.5, 0.7, 0.99):
        got = {(r.id_a, r.id_b): r for r in
               jaccard_prefix_pairs(df, threshold=t).collect()}
        ids = sorted(texts)
        want = {(a, b) for a in ids for b in ids
                if a < b and len(set(texts[a].split()) | set(texts[b].split()))
                and jacc(a, b) >= t}
        assert set(got) == want, f"threshold {t}"
        for (a, b), r in got.items():
            sa, sb = set(texts[a].split()), set(texts[b].split())
            assert r.common == len(sa & sb)
            assert r.n_union == len(sa | sb)
            assert r.jaccard == pytest.approx(round(jacc(a, b), 6))


def test_ppr_sweep_cut_finds_planted_cluster(spark):
    from credigraph_spark.graph import ppr_sweep_cut

    # planted: 5-clique around the seed, one bridge to a 5-clique far side
    c1, c2 = [1, 2, 3, 4, 5], [11, 12, 13, 14, 15]
    pairs = ([(a, b) for a in c1 for b in c1 if a < b]
             + [(a, b) for a in c2 for b in c2 if a < b] + [(5, 11)])
    seeds = spark.createDataFrame([(1,)], "vid long")
    curve = ppr_sweep_cut(edges_df(spark, pairs), seeds,
                          max_iter=8, top_m=10).collect()
    rows = {r.rnk: r for r in curve}
    # prefix of rank 5 == the seed clique: vol = 4*4+5 = 21, cut = 1
    proper = [r for r in curve if r.conductance is not None]
    best = min(proper, key=lambda r: (r.conductance, r.rnk))
    assert best.rnk == 5
    # the whole-graph prefix is 0/0 — reported as NULL, never the argmin
    assert rows[10].conductance is None and rows[10].cut_edges == 0
    assert rows[5].vol == 21 and rows[5].cut_edges == 1
    assert rows[5].conductance == pytest.approx(round(1 / 21, 8))
    assert sorted(rows[r].vid for r in range(1, 6)) == c1
    # monotone bookkeeping: vol strictly increases, cut >= 0
    vols = [rows[r].vol for r in sorted(rows)]
    assert vols == sorted(vols) and all(r.cut_edges >= 0 for r in curve)


def test_cc_incremental_matches_full(spark):
    from credigraph_spark.graph import (
        connected_components, connected_components_incremental)

    old = [(1, 2), (2, 3), (10, 11), (20, 21), (30, 31)]
    # delta: merges {1,2,3}+{10,11}, brings in brand-new {40,41},
    # and one intra-component edge (no-op)
    delta = [(3, 10), (40, 41), (1, 3)]
    prev, _ = connected_components(edges_df(spark, old))
    got, info = connected_components_incremental(prev, edges_df(spark, delta))
    want, _ = connected_components(edges_df(spark, old + delta))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))
    assert info["n_condensed_edges"] == 2  # (1,10) and (40,41) condensed

    # empty-merge delta: only intra-component edges -> zero condensed
    got2, info2 = connected_components_incremental(
        prev, edges_df(spark, [(2, 3)]))
    assert info2["n_condensed_edges"] == 0
    assert sorted(map(tuple, got2.collect())) == \
        sorted(map(tuple, prev.collect()))


def test_negative_samples_contract(spark):
    import hashlib

    from credigraph_spark.graph import negative_samples

    pairs = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 1), (5, 1)]
    e = edges_df(spark, pairs)
    out = negative_samples(e, k=2, seed=7, oversample=4).collect()
    true_edges = set(pairs)
    for r in out:
        assert (r.src, r.neg_dst) not in true_edges
        assert r.src != r.neg_dst
        assert 1 <= r.draw <= 2

    # partition-invariance: identical rows from a different layout
    out2 = negative_samples(e.repartition(13), k=2, seed=7,
                            oversample=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, out2))

    # differential: replay the md5 draw chain for one source
    verts = sorted({v for p in pairs for v in p})
    got_for_1 = [r.neg_dst for r in sorted(
        (r for r in out if r.src == 1), key=lambda r: r.draw)]
    want, seen = [], set()
    for i in range(1, 9):
        h = int(hashlib.md5(f"7:1:{i}".encode()).hexdigest()[:15], 16)
        cand = verts[h % len(verts)]
        if cand == 1 or (1, cand) in true_edges or cand in seen:
            continue
        seen.add(cand)
        want.append(cand)
    assert got_for_1 == want[:2]


def test_heat_kernel_matches_python(spark):
    import math

    from credigraph_spark.graph.ppr import heat_kernel_scores

    pairs = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 1), (2, 4), (5, 1)]
    t, K = 2.0, 4
    seeds = spark.createDataFrame([(1,), (5,)], "vid long")
    got = {r.vid: r.score for r in
           heat_kernel_scores(edges_df(spark, pairs), seeds,
                              t=t, n_terms=K).collect()}

    out = {}
    for s, d in pairs:
        out.setdefault(s, []).append(d)
    v = {1: 0.5, 5: 0.5}
    acc = {u: math.exp(-t) * m for u, m in v.items()}
    for k in range(1, K + 1):
        nxt = {}
        for u, m in v.items():
            for d in out.get(u, []):
                nxt[d] = nxt.get(d, 0.0) + m * (1.0 / len(out[u]))
        v = nxt
        c = math.exp(-t) * t ** k / math.factorial(k)
        for u, m in v.items():
            acc[u] = acc.get(u, 0.0) + c * m
    assert set(got) == set(acc)
    for u in acc:
        assert got[u] == pytest.approx(acc[u], abs=1e-12)
    # total heat mass <= 1 (equals 1 minus truncation + dangling loss)
    assert sum(got.values()) <= 1.0 + 1e-9


def test_hub_removal_robustness(spark):
    from credigraph_spark.analytics import hub_removal_robustness

    # star around hub 1 (+ pendant chain) vs a separate triangle
    pairs = [(1, v) for v in range(2, 8)] + [(8, 9), (9, 10), (10, 8)]
    row = hub_removal_robustness(edges_df(spark, pairs + [(2, 3)]),
                                 k=1).collect()[0]
    # before: star {1..7} with the 2-3 chord (size 7) vs triangle (3)
    assert row.n_vertices == 10 and row.lcc_before == 7
    # removing hub 1 shatters the star: survivors {2,3} pair + triangle
    assert row.lcc_after == 3
    assert row.lcc_drop_frac == pytest.approx(round((7 - 3) / 7, 8))
    assert row.k_removed == 1


def test_funnel_steps_order_and_strictness(spark):
    from credigraph_spark.temporal import funnel_steps

    T = dt.datetime
    rows = [
        # u1 completes the full ordered funnel
        (1, "view", T(2024, 1, 1, 10)), (1, "click", T(2024, 1, 1, 11)),
        (1, "purchase", T(2024, 1, 1, 12)),
        # u2 clicks BEFORE viewing -> stalls at view
        (2, "click", T(2024, 1, 2, 9)), (2, "view", T(2024, 1, 2, 10)),
        # u3 view+click simultaneous -> strict > rejects the click
        (3, "view", T(2024, 1, 3, 8)), (3, "click", T(2024, 1, 3, 8)),
        # u4 purchases with no view at all -> not in the funnel
        (4, "purchase", T(2024, 1, 4, 7)),
        # u5 view -> click, never purchases
        (5, "view", T(2024, 1, 5, 6)), (5, "click", T(2024, 1, 5, 7)),
    ]
    ev = spark.createDataFrame(rows, "user_id LONG, event_type STRING, ts TIMESTAMP")
    got = {r.step: r for r in funnel_steps(
        ev, ["view", "click", "purchase"]).collect()}
    assert got["view"].n_users == 4        # u1, u2, u3, u5
    assert got["click"].n_users == 2       # u1, u5 (u2 out of order, u3 tie)
    assert got["purchase"].n_users == 1    # u1
    assert got["view"].frac_of_first == pytest.approx(1.0)
    assert got["click"].frac_of_first == pytest.approx(0.5)
    assert got["purchase"].frac_of_first == pytest.approx(0.25)
    assert [got[s].step_idx for s in ("view", "click", "purchase")] == [1, 2, 3]


def test_funnel_steps_later_retry_counts(spark):
    from credigraph_spark.temporal import funnel_steps

    T = dt.datetime
    # first click precedes the first view, but a SECOND click after the
    # view must still advance the funnel (min ts AFTER prev, not global min)
    rows = [(1, "click", T(2024, 1, 1, 8)), (1, "view", T(2024, 1, 1, 9)),
            (1, "click", T(2024, 1, 1, 10))]
    ev = spark.createDataFrame(rows, "user_id LONG, event_type STRING, ts TIMESTAMP")
    got = {r.step: r.n_users for r in funnel_steps(
        ev, ["view", "click"]).collect()}
    assert got == {"view": 1, "click": 1}


def test_ann_recall_at_k(spark):
    from credigraph_spark.pipeline import ann_recall_at_k

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21), (2, 22)],
        "query_id LONG, neighbor_id LONG")
    # q1 gets 2/3 right; q2's approximate list is empty (missing rows)
    approx = spark.createDataFrame(
        [(1, 10), (1, 12), (1, 99)], "query_id LONG, neighbor_id LONG")
    got = {r.query_id: r for r in ann_recall_at_k(approx, exact, k=3).collect()}
    assert got[1].n_exact == 3 and got[1].n_hits == 2
    assert got[1].recall == pytest.approx(round(2 / 3, 8))
    assert got[2].n_exact == 3 and got[2].n_hits == 0 and got[2].recall == 0.0
    # self-recall of the exact result is 1.0 everywhere
    perfect = ann_recall_at_k(exact, exact, k=3).collect()
    assert all(r.recall == 1.0 for r in perfect)


def test_kmv_distinct_differential(spark):
    import hashlib

    from credigraph_spark.pipeline.sketch import kmv_distinct

    # group 'a': 40 distinct values (sketch path, k=8); 'b': 3 (exact path)
    rows = [("a", v) for v in range(40) for _ in (0, 1)] + \
           [("b", v) for v in (100, 101, 102)]
    df = spark.createDataFrame(rows, "g STRING, v LONG")
    got = {r.g: r for r in kmv_distinct(df, ["g"], "v", k=8, seed=7).collect()}

    def h60(v):
        return int(hashlib.md5(f"7:{v}".encode()).hexdigest()[:15], 16)

    hs = sorted({h60(v) for v in range(40)})
    expect_a = round(7 * float(16 ** 15) / float(hs[7]), 6)
    assert got["a"].n_exact == 40
    assert got["a"].kmv_estimate == pytest.approx(expect_a, abs=1e-9)
    # estimate is in a sane band for k=8 (rel std ~ 1/sqrt(k-2) ~ 0.41)
    assert 10 <= got["a"].kmv_estimate <= 160
    # under-k group reports the EXACT distinct count
    assert got["b"].n_exact == 3 and got["b"].kmv_estimate == 3.0
    assert got["b"].rel_err == 0.0


def test_rolling_active_users(spark):
    from credigraph_spark.temporal import rolling_active_users

    T = dt.datetime
    # u1 active days 1,2; u2 day 1 only; u3 day 9 (outside 7d of day 1-2)
    rows = [(1, T(2024, 1, 1)), (1, T(2024, 1, 2)), (1, T(2024, 1, 2, 5)),
            (2, T(2024, 1, 1)), (3, T(2024, 1, 9))]
    ev = spark.createDataFrame(rows, "user_id LONG, ts TIMESTAMP")
    got = {r.day: r for r in rolling_active_users(ev, window_days=7).collect()}
    assert got["2024-01-01"].dau == 2 and got["2024-01-01"].wau == 2
    assert got["2024-01-02"].dau == 1 and got["2024-01-02"].wau == 2
    # day 9: u1's day-2 activity is 7 days earlier -> outside [3,9]; only u3
    assert got["2024-01-09"].dau == 1 and got["2024-01-09"].wau == 1
    assert got["2024-01-02"].stickiness == pytest.approx(0.5)
    assert set(got) == {"2024-01-01", "2024-01-02", "2024-01-09"}


def test_dup_ngram_profile(spark):
    from credigraph_spark.pipeline.textstats import dup_ngram_profile

    docs = spark.createDataFrame(
        [(1, "a b c d e f"),          # grams: "a b c", "b c d", "c d e", "d e f"
         (2, "a b c x y z"),          # shares "a b c" with doc 1
         (3, "q r s t u")],           # fully unique
        "doc_id LONG, text STRING")
    got = {r.doc_id: r for r in
           dup_ngram_profile(docs, shingle_n=3).collect()}
    assert got[1].n_ngrams == 4 and got[1].n_dup_ngrams == 1
    assert got[1].dup_frac == pytest.approx(0.25)
    assert got[2].n_ngrams == 4 and got[2].n_dup_ngrams == 1
    assert got[3].n_ngrams == 3 and got[3].n_dup_ngrams == 0
    assert got[3].dup_frac == 0.0


def test_dup_ngram_profile_short_doc(spark):
    from credigraph_spark.pipeline.textstats import dup_ngram_profile

    # docs shorter than n collapse to ONE whole-text shingle; identical
    # short docs therefore count each other as duplicates
    docs = spark.createDataFrame(
        [(1, "hi there"), (2, "hi there"), (3, "bye")],
        "doc_id LONG, text STRING")
    got = {r.doc_id: r for r in
           dup_ngram_profile(docs, shingle_n=5).collect()}
    assert got[1].n_ngrams == 1 and got[1].n_dup_ngrams == 1
    assert got[2].dup_frac == 1.0
    assert got[3].n_dup_ngrams == 0


def test_label_spreading_differential(spark):
    from credigraph_spark.graph import label_spreading

    # path 1-2-3-4 with seeds f(1)=1, f(4)=0; undirected averaging
    edges = edges_df(spark, [(1, 2), (2, 3), (3, 4)])
    seeds = spark.createDataFrame([(1, 1.0), (4, 0.0)], "vid LONG, y DOUBLE")
    got = {r.vid: r for r in
           label_spreading(edges, seeds, max_iter=3).collect()}

    # hand iteration: f0 = {1:1, 2:0, 3:0, 4:0}
    f = {1: 1.0, 2: 0.0, 3: 0.0, 4: 0.0}
    nbrs = {1: [2], 2: [1, 3], 3: [2, 4], 4: [3]}
    for _ in range(3):
        nf = {v: sum(f[u] for u in nbrs[v]) / len(nbrs[v]) for v in nbrs}
        nf[1], nf[4] = 1.0, 0.0   # clamp
        f = nf
    for v in f:
        assert got[v].score == pytest.approx(f[v], abs=1e-12), v
    assert got[1].is_seed and got[4].is_seed and not got[2].is_seed
    # clamps hold exactly
    assert got[1].score == 1.0 and got[4].score == 0.0


def test_label_spreading_seed_dedup(spark):
    from credigraph_spark.graph import label_spreading

    edges = edges_df(spark, [(1, 2)])
    # duplicate seed rows for vid 1 -> keep-min (0.25), not double-count
    seeds = spark.createDataFrame([(1, 0.75), (1, 0.25)], "vid LONG, y DOUBLE")
    got = {r.vid: r.score for r in
           label_spreading(edges, seeds, max_iter=1).collect()}
    assert got[1] == 0.25 and got[2] == 0.25


def test_directed_triad_census_hand_case(spark):
    from credigraph_spark.graph import directed_triad_census

    # one cyclic triangle (1→2→3→1) and one transitive (4→5, 5→6, 4→6)
    edges = edges_df(spark, [(1, 2), (2, 3), (3, 1),
                             (4, 5), (5, 6), (4, 6)])
    row = directed_triad_census(edges).collect()[0]
    assert row.n_triangles == 2
    assert row.n_cyclic == 1 and row.n_transitive == 1


def test_directed_triad_census_reciprocal_differential(spark):
    import itertools
    import random

    from credigraph_spark.graph import directed_triad_census

    rnd = random.Random(11)
    pairs = {(rnd.randrange(12), rnd.randrange(12)) for _ in range(70)}
    pairs = [(a, b) for a, b in pairs if a != b]  # reciprocals survive
    es = set(pairs)
    cyc = sum(1 for a, b, c in itertools.permutations(range(12), 3)
              if (a, b) in es and (b, c) in es and (c, a) in es) // 3
    trans = sum(1 for a, b, c in itertools.permutations(range(12), 3)
                if (a, b) in es and (b, c) in es and (a, c) in es)
    und = {tuple(sorted(p)) for p in es}
    tri = sum(1 for x, y, z in itertools.combinations(sorted({v for p in es for v in p}), 3)
              if (x, y) in und and (x, z) in und and (y, z) in und)
    row = directed_triad_census(edges_df(spark, pairs)).collect()[0]
    assert (row.n_triangles, row.n_cyclic, row.n_transitive) == (tri, cyc, trans)


def test_dyad_census(spark):
    from credigraph_spark.graph import dyad_census

    # 1<->2 mutual; 1->3, 3->4 asymmetric; 5 isolated-but-connected via 4->5
    edges = edges_df(spark, [(1, 2), (2, 1), (1, 3), (3, 4), (4, 5)])
    row = dyad_census(edges).collect()[0]
    assert row.n_vertices == 5
    assert row.n_mutual == 1 and row.n_asymmetric == 3
    # C(5,2)=10 pairs, 4 connected -> 6 null
    assert row.n_null == 6


def test_association_rules(spark):
    from credigraph_spark.analytics import association_rules

    # baskets: {1,2,3}, {1,2}, {1,2}, {3}; pair (1,2) in 3 baskets
    rows = [(10, 1), (10, 2), (10, 3), (11, 1), (11, 2),
            (12, 1), (12, 2), (13, 3), (10, 1)]   # dup row dedupes
    b = spark.createDataFrame(rows, "bid LONG, item LONG")
    got = {(r.item_a, r.item_b): r for r in association_rules(
        b, "bid", "item", min_pair_count=2, top_k=10).collect()}
    r = got[(1, 2)]
    assert (r.n_a, r.n_b, r.n_ab) == (3, 3, 3)
    assert r.support == pytest.approx(0.75)        # 3 of 4 baskets
    assert r.conf_a_b == 1.0 and r.conf_b_a == 1.0
    assert r.lift == pytest.approx(round(4 * 3 / 9, 8))
    # (1,3)/(2,3) co-occur once -> filtered by min_pair_count=2
    assert set(got) == {(1, 2)}


def test_pca_top_component_differential(spark):
    import numpy as np

    from credigraph_spark.pipeline.pca import pca_top_component

    rng = np.random.RandomState(5)
    # anisotropic cloud: dominant variance along a known direction
    base = rng.randn(80, 6) * np.array([5.0, 1, 1, 0.5, 0.5, 0.1])
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    got = pca_top_component(df, n_iter=8).collect()
    v = np.array([r.component for r in sorted(got, key=lambda r: r.dim_idx)])

    # numpy reference: same centered power iteration, same init
    x = base - base.mean(axis=0)
    ref = np.ones(6) / np.sqrt(6)
    for _ in range(8):
        w = x.T @ (x @ ref)
        ref = w / np.linalg.norm(w)
    assert np.allclose(v, ref, atol=1e-9)
    # and it matches the true top eigenvector up to sign
    evec = np.linalg.eigh(np.cov(base.T))[1][:, -1]
    align = abs(float(v @ evec))
    assert align > 0.999
    assert abs(np.linalg.norm(v) - 1.0) < 1e-12


def test_remove_top_component(spark):
    import numpy as np

    from credigraph_spark.pipeline.pca import remove_top_component

    rng = np.random.RandomState(9)
    base = rng.randn(60, 5) * np.array([6.0, 1, 1, 0.3, 0.3])
    rows = [(int(i), [float(x) for x in base[i]]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    got = {r.vec_id: r for r in
           remove_top_component(df, n_iter=8).collect()}

    x = base - base.mean(axis=0)
    v = np.ones(5) / np.sqrt(5)
    for _ in range(8):
        w = x.T @ (x @ v)
        v = w / np.linalg.norm(w)
    t = x @ v
    nb = np.linalg.norm(x, axis=1)
    na = np.sqrt(nb ** 2 - t ** 2)
    for i in range(60):
        assert got[i].proj == pytest.approx(t[i], abs=1e-9)
        assert got[i].norm_before == pytest.approx(nb[i], abs=1e-9)
        assert got[i].norm_after == pytest.approx(na[i], abs=1e-9)
    # removal shrinks (or preserves) every centered norm
    assert all(got[i].norm_after <= got[i].norm_before + 1e-12
               for i in range(60))


def test_burstiness_regular_vs_bursty(spark):
    from credigraph_spark.temporal import burstiness

    T = dt.datetime
    rows = []
    # 'tick': perfectly regular 60s gaps for one user -> B = -1
    for i in range(6):
        rows.append((1, i, "tick", T(2024, 1, 1, 0, i)))
    # 'burst': gaps 1s,1s,1s,100000s -> sigma >> mu -> B near +1
    times = [0, 1, 2, 3, 100003]
    for j, s in enumerate(times):
        rows.append((2, 100 + j, "burst",
                     T(2024, 1, 1) + dt.timedelta(seconds=s)))
    ev = spark.createDataFrame(
        rows, "user_id LONG, event_id LONG, event_type STRING, ts TIMESTAMP")
    got = {r.event_type: r for r in burstiness(ev).collect()}
    assert got["tick"].n_gaps == 5
    assert got["tick"].mean_gap_s == pytest.approx(60.0)
    assert got["tick"].burstiness == pytest.approx(-1.0)

    import math
    g = [1, 1, 1, 100000]
    n, sg, sg2 = len(g), sum(g), sum(x * x for x in g)
    d = n * sg2 - sg * sg
    expect = round((math.sqrt(d) - sg) / (math.sqrt(d) + sg), 8)
    assert got["burst"].burstiness == pytest.approx(expect, abs=1e-12)
    # finite-size ceiling for one dominant gap among n=4 is
    # (sqrt(3)-1)/(sqrt(3)+1) ~= 0.268 — this sits essentially at it
    assert got["burst"].burstiness > 0.25


def test_eigenvector_centrality_differential(spark):
    import numpy as np

    from credigraph_spark.graph import eigenvector_centrality

    # star + chain: 1 hub to 2..5, plus 5-6
    pairs = [(1, 2), (1, 3), (1, 4), (1, 5), (5, 6)]
    got = {r.vid: r.x for r in
           eigenvector_centrality(edges_df(spark, pairs),
                                  max_iter=10).collect()}
    vids = sorted(got)
    n = len(vids)
    A = np.zeros((n, n))
    for a, b in pairs:
        A[vids.index(a), vids.index(b)] = 1
        A[vids.index(b), vids.index(a)] = 1
    x = np.ones(n)
    for _ in range(10):
        x = A @ x
        x /= np.linalg.norm(x)
    for i, v in enumerate(vids):
        assert got[v] == pytest.approx(x[i], abs=1e-12), v
    # leaves of the hub score below it; the pendant scores lowest
    assert got[2] < got[1] and got[6] == min(got.values())


def test_rank_concentration(spark):
    from credigraph_spark.analytics import rank_concentration

    # 10 scores: one dominant holder of half the mass
    xs = [1.0] + [1.0 / 9] * 9
    df = spark.createDataFrame(
        [(i, x) for i, x in enumerate(xs)], "vid LONG, rank DOUBLE")
    row = rank_concentration(df).collect()[0]
    assert row.n_vertices == 10
    assert row.total_mass == pytest.approx(2.0)

    xs_r = sorted(round(x, 8) for x in xs)
    n, s = len(xs_r), sum(xs_r)
    t = sum((i + 1) * x for i, x in enumerate(xs_r))
    assert row.gini == pytest.approx(round(2 * t / (n * s) - (n + 1) / n, 8))
    # top 1% of 10 -> ceil = 1 vertex -> half the mass
    assert row.top1pct_mass == pytest.approx(0.5)
    assert row.top10pct_mass == pytest.approx(0.5)


def test_rank_concentration_uniform_gini_zero(spark):
    from credigraph_spark.analytics import rank_concentration

    df = spark.createDataFrame(
        [(i, 0.25) for i in range(4)], "vid LONG, rank DOUBLE")
    row = rank_concentration(df).collect()[0]
    assert row.gini == pytest.approx(0.0)
    assert row.top10pct_mass == pytest.approx(0.25)


def test_component_size_distribution(spark):
    from credigraph_spark.graph import connected_components
    from pyspark.sql import functions as SF

    # two triangles + one pair + one isolated edge chain of 4
    pairs = [(1, 2), (2, 3), (3, 1), (4, 5), (5, 6), (6, 4),
             (7, 8), (9, 10), (10, 11), (11, 12)]
    labels, _ = connected_components(edges_df(spark, pairs))
    hist = {r.component_size: r.n_components for r in
            (labels.groupBy("component").agg(SF.count("*").alias("sz"))
             .groupBy(SF.col("sz").alias("component_size"))
             .agg(SF.count("*").alias("n_components"))).collect()}
    assert hist == {3: 2, 2: 1, 4: 1}


def test_label_spreading_weighted(spark):
    from credigraph_spark.graph import label_spreading

    # 1-2 (w 3), 2-3 (w 1); seed f(1)=1. Weighted avg at 2:
    # (3*f1 + 1*f3)/4
    edges = spark.createDataFrame([(1, 2, 3.0), (2, 3, 1.0)],
                                  "src LONG, dst LONG, w DOUBLE")
    seeds = spark.createDataFrame([(1, 1.0)], "vid LONG, y DOUBLE")
    got = {r.vid: r.score for r in
           label_spreading(edges, seeds, max_iter=3,
                           weight_col="w").collect()}
    f = {1: 1.0, 2: 0.0, 3: 0.0}
    for _ in range(3):
        nf = {1: 1.0,
              2: (3 * f[1] + 1 * f[3]) / 4,
              3: f[2]}
        f = nf
    for v in f:
        assert got[v] == pytest.approx(f[v], abs=1e-12), v
    # the heavy edge pulls vertex 2 toward the seed faster than uniform
    got_u = {r.vid: r.score for r in
             label_spreading(edges.select("src", "dst"), seeds,
                             max_iter=3).collect()}
    assert got[2] > got_u[2]


def test_undirected_simple_equals_symmetrize_clean(spark):
    from credigraph_spark.graph.adjacency import (
        clean_edges, symmetrize, undirected_simple)

    # nulls, self-loop, duplicates, both-direction duplicates
    raw = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (3, 3), (None, 4), (4, None), (2, 5),
         (5, 6), (6, 5)],
        "src LONG, dst LONG")
    want = sorted((r.src, r.dst) for r in
                  symmetrize(clean_edges(raw)).collect())
    got = sorted((r.src, r.dst) for r in undirected_simple(raw).collect())
    assert got == want
    assert (1, 2) in got and (2, 1) in got
    assert (3, 3) not in got


def _lsq(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    syy = sum(y * y for y in ys)
    cov, varx, vary = sxy - sx * sy / n, sxx - sx * sx / n, syy - sy * sy / n
    slope = cov / varx
    return slope, (sy - slope * sx) / n, cov * cov / (varx * vary)


def test_zipf_fit_closed_form(spark):
    from credigraph_spark.pipeline.textstats import zipf_fit

    # freqs: a=4, b=2, c=1 -> ranks 1,2,3
    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "a, b! c"), (3, "A")], "doc_id LONG, text STRING")
    row = zipf_fit(docs, top_r=10).collect()[0]
    assert row.n_tokens == 7 and row.n_types == 3 and row.r_fit == 3
    xs = [math.log(r) for r in (1, 2, 3)]
    ys = [math.log(f) for f in (4, 2, 1)]
    slope, intercept, r2 = _lsq(xs, ys)
    assert row.alpha == pytest.approx(-slope, abs=1e-6)
    assert row.intercept == pytest.approx(intercept, abs=1e-6)
    assert row.r2 == pytest.approx(r2, abs=1e-6)


def test_zipf_fit_top_r_cut(spark):
    from credigraph_spark.pipeline.textstats import zipf_fit

    docs = spark.createDataFrame(
        [(1, "a a a b b c d e")], "doc_id LONG, text STRING")
    row = zipf_fit(docs, top_r=2).collect()[0]
    # fit uses only ranks 1..2 but totals cover the whole spectrum
    assert row.r_fit == 2 and row.n_types == 5 and row.n_tokens == 8
    xs = [math.log(1), math.log(2)]
    ys = [math.log(3), math.log(2)]
    slope, _, _ = _lsq(xs, ys)
    assert row.alpha == pytest.approx(-slope, abs=1e-6)


def test_heaps_fit_closed_form(spark):
    from credigraph_spark.pipeline.textstats import heaps_fit

    # (tokens m, types v): (4,2), (9,3); the 1-token doc is excluded
    docs = spark.createDataFrame(
        [(1, "a a b b"), (2, "a b c a b c a b c"), (3, "solo")],
        "doc_id LONG, text STRING")
    row = heaps_fit(docs).collect()[0]
    assert row.n_docs == 2
    slope, intercept, r2 = _lsq([math.log(4), math.log(9)],
                                [math.log(2), math.log(3)])
    assert row.beta == pytest.approx(slope, abs=1e-6)
    assert row.ln_k == pytest.approx(intercept, abs=1e-6)
    assert row.r2 == pytest.approx(1.0, abs=1e-6)  # 2 points: perfect fit


def test_rfm_segments_hand_case(spark):
    from credigraph_spark.analytics import rfm_segments

    # 4 customers, n_bins=2. Max date = 2024-01-10.
    # cust 1: orders on 01-10, 01-01 -> recency 0, freq 2, monetary 30
    # cust 2: order  on 01-05        -> recency 5, freq 1, monetary 100
    # cust 3: order  on 01-02        -> recency 8, freq 1, monetary 5
    # cust 4: orders on 01-09 x3     -> recency 1, freq 3, monetary 9
    rows = [(1, "2024-01-10", 10.0), (1, "2024-01-01", 20.0),
            (2, "2024-01-05", 100.0), (3, "2024-01-02", 5.0),
            (4, "2024-01-09", 3.0), (4, "2024-01-09", 3.0),
            (4, "2024-01-09", 3.0)]
    orders = spark.createDataFrame(rows, "o_custkey LONG, d STRING, a DOUBLE") \
        .selectExpr("o_custkey", "CAST(d AS DATE) AS o_orderdate",
                    "a AS o_totalprice")
    got = {r.customer: r for r in
           rfm_segments(orders, n_bins=2).collect()}
    assert len(got) == 4
    # recency asc: 1(0), 4(1), 2(5), 3(8) -> ranks 1,2,3,4 -> bins 1,1,2,2
    # reversed (recent=best): scores 2,2,1,1
    assert [got[c].r_score for c in (1, 4, 2, 3)] == [2, 2, 1, 1]
    # frequency asc w/ customer tiebreak: 2(1),3(1),1(2),4(3) -> bins 1,1,2,2
    assert [got[c].f_score for c in (2, 3, 1, 4)] == [1, 1, 2, 2]
    # monetary asc: 3(5), 4(9), 1(30), 2(100) -> scores 1,1,2,2
    assert [got[c].m_score for c in (3, 4, 1, 2)] == [1, 1, 2, 2]
    assert got[1].segment == "222" and got[3].segment == "111"
    assert got[1].recency_days == 0 and got[4].frequency == 3
    assert got[2].monetary == 100.0


def _np_fiedler(edges, rounds):
    """Reference deflated power iteration, identical arithmetic."""
    import numpy as np

    vids = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(vids)}
    n = len(vids)
    A = np.zeros((n, n))
    for s, d in edges:
        A[idx[s], idx[d]] = 1.0
        A[idx[d], idx[s]] = 1.0
    deg = A.sum(axis=1)
    rs = 1.0 / np.sqrt(deg)
    v1 = np.sqrt(deg) / math.sqrt(deg.sum())
    import hashlib

    def h(v):
        return int(hashlib.md5(f"fiedler:{v}".encode()).hexdigest()[:15],
                   16) / float(16 ** 15) * 2.0 - 1.0

    x = np.array([h(v) for v in vids], dtype=float)
    c = (x * v1).sum()
    x = (x - c * v1) / math.sqrt((x * x).sum() - c * c)
    for _ in range(rounds):
        y = x + rs * (A @ (x * rs))
        c = (y * v1).sum()
        x = (y - c * v1) / math.sqrt((y * y).sum() - c * c)
    return {v: x[idx[v]] for v in vids}


def test_fiedler_numpy_differential(spark):
    from credigraph_spark.graph import fiedler_vector

    edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4),
             (1, 7), (7, 8)]
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    got = {r.vid: r.f for r in fiedler_vector(df, max_iter=4).collect()}
    want = _np_fiedler(edges, 4)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_fiedler_bisects_two_cliques(spark):
    from credigraph_spark.graph import fiedler_vector

    # two 4-cliques joined by one bridge: the sign of f splits them
    k1 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    k2 = [(a, b) for a in range(11, 15) for b in range(a + 1, 15)]
    edges = k1 + k2 + [(4, 11)]
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    got = {r.vid: r.f for r in fiedler_vector(df, max_iter=15).collect()}
    s1 = {1 if got[v] > 0 else -1 for v in range(1, 5)}
    s2 = {1 if got[v] > 0 else -1 for v in range(11, 15)}
    assert len(s1) == 1 and len(s2) == 1 and s1 != s2


def test_temporal_triangles_hand_case(spark):
    from credigraph_spark.graph.temporal_motifs import temporal_triangles

    # cyclic: 1->2 (t=0), 2->3 (t=5), 3->1 (t=9)   within delta=10
    # feed-forward: 4->5 (t=0), 5->6 (t=3), 4->6 (t=7)
    # out-of-window wedge: 7->8 (t=0), 8->9 (t=20)  (delta=10 -> dropped)
    # wrong-order close: 10->11 (t=0), 11->12 (t=5), 10->12 (t=2) -> wedge
    #   counted, close NOT (t3 must exceed t2)
    rows = [(1, 2, 0), (2, 3, 5), (3, 1, 9),
            (4, 5, 0), (5, 6, 3), (4, 6, 7),
            (7, 8, 0), (8, 9, 20),
            (10, 11, 0), (11, 12, 5), (10, 12, 2)]
    df = spark.createDataFrame(rows, "src LONG, dst LONG, ts LONG")
    r = temporal_triangles(df, delta=10).collect()[0]
    assert r.n_cyclic == 1
    assert r.n_feedforward == 1
    # wedges: (1,2,3), (2,3,1), (4,5,6), (10,11,12) = 4
    assert r.n_wedges == 4


def test_temporal_triangles_window_boundary(spark):
    from credigraph_spark.graph.temporal_motifs import temporal_triangles

    # t3 == t1 + delta is INSIDE (inclusive); t3 == t1 + delta + 1 is out
    rows = [(1, 2, 0), (2, 3, 1), (3, 1, 10)]
    df = spark.createDataFrame(rows, "src LONG, dst LONG, ts LONG")
    assert temporal_triangles(df, delta=10).collect()[0].n_cyclic == 1
    assert temporal_triangles(df, delta=9).collect()[0].n_cyclic == 0
    # strict order: duplicate pair keeps MIN ts (first contact)
    rows2 = rows + [(2, 3, 0)]
    df2 = spark.createDataFrame(rows2, "src LONG, dst LONG, ts LONG")
    # 2->3 collapses to t=0, no longer strictly after 1->2 at t=0
    assert temporal_triangles(df2, delta=10).collect()[0].n_cyclic == 0


def test_joint_degree_matrix_hand_case(spark):
    from credigraph_spark.analytics import joint_degree_matrix

    # 1->2, 1->3, 1->4, 2->3: out-deg 1=3, 2=1; in-deg 2=1, 3=2, 4=1
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3)], "src LONG, dst LONG")
    got = {(r.src_bucket, r.dst_bucket): r.n_edges
           for r in joint_degree_matrix(edges).collect()}
    # buckets: floor(log2): deg 1 -> 0, deg 2 -> 1, deg 3 -> 1
    # edges: 1->2 (od 3 -> b1, id 1 -> b0), 1->3 (b1, id 2 -> b1),
    #        1->4 (b1, b0), 2->3 (od 1 -> b0, b1)
    assert got == {(1, 0): 2, (1, 1): 1, (0, 1): 1}


def test_eigen_weighted_differential(spark):
    import numpy as np

    from credigraph_spark.graph.spreading import (
        eigenvector_centrality_weighted)

    edges = [(1, 2, 2.0), (2, 3, 1.0), (1, 3, 5.0), (2, 1, 1.0)]
    df = spark.createDataFrame(edges, "src LONG, dst LONG, w DOUBLE")
    got = {r.vid: r.x for r in
           eigenvector_centrality_weighted(df, "w", max_iter=4).collect()}
    vids = [1, 2, 3]
    W = np.zeros((3, 3))
    for s, d, w in edges:
        W[s - 1, d - 1] += w
        W[d - 1, s - 1] += w
    x = np.ones(3)
    for _ in range(4):
        x = W @ x
        x = x / math.sqrt((x * x).sum())
    for i, v in enumerate(vids):
        assert got[v] == pytest.approx(x[i], abs=1e-9), v


def test_minhash_calibration_exact_side(spark):
    from credigraph_spark.pipeline.dedup import minhash_calibration

    # near-identical docs -> candidate pair with known exact jaccard
    t1 = "the quick brown fox jumps over the lazy dog today"
    t2 = "the quick brown fox jumps over the lazy dog tonight"
    docs = spark.createDataFrame(
        [(1, t1), (2, t2), (3, "completely different text body here")],
        "doc_id LONG, text STRING")
    rows = minhash_calibration(docs, num_hashes=8, shingle_n=3).collect()
    pairs = {(r.id_a, r.id_b): r for r in rows}
    assert (1, 2) in pairs
    r = pairs[(1, 2)]
    # shingle sets: 8 x 3-grams each, 7 shared -> J = 7/9
    assert r.exact_jaccard == pytest.approx(7 / 9, abs=1e-6)
    assert 0.0 <= r.est_jaccard <= 1.0
    assert r.abs_err == pytest.approx(
        abs(r.est_jaccard - r.exact_jaccard), abs=1e-5)


def test_minhash_calibration_estimator_converges(spark):
    from credigraph_spark.pipeline.dedup import minhash_calibration

    t1 = " ".join(f"w{i}" for i in range(40))
    t2 = " ".join(f"w{i}" for i in range(20)) + " " + " ".join(
        f"v{i}" for i in range(20))
    docs = spark.createDataFrame([(1, t1), (2, t2)],
                                 "doc_id LONG, text STRING")
    # rows_per_band=1 guarantees candidacy at any overlap
    r8 = minhash_calibration(docs, num_hashes=8, rows_per_band=1).collect()
    r32 = minhash_calibration(docs, num_hashes=32, rows_per_band=1).collect()
    assert len(r8) == 1 and len(r32) == 1
    # more hashes -> error no bigger on average (deterministic fixture:
    # just assert the 32-hash estimate is within estimator variance)
    assert r32[0].abs_err <= r8[0].abs_err + 0.25


def test_clustering_null_model_closed_form(spark):
    from credigraph_spark.graph.triangles import clustering_null_model

    # triangle: N=3, deg=2 everywhere -> k1=2, k2=4,
    # c_exp = (4-2)^2 / (3*8) = 1/6; transitivity = 1 -> ratio = 6
    tri = spark.createDataFrame([(1, 2), (2, 3), (3, 1)],
                                "src LONG, dst LONG")
    r = clustering_null_model(tri).collect()[0]
    assert r.n_vertices == 3 and r.n_triangles == 1
    assert r.transitivity == pytest.approx(1.0, abs=1e-8)
    assert r.mean_deg == pytest.approx(2.0, abs=1e-8)
    assert r.c_expected == pytest.approx(1 / 6, abs=1e-8)
    assert r.small_world_ratio == pytest.approx(6.0, abs=1e-5)

    # star K_{1,4}: no triangles, ratio 0 branch not hit (c_exp > 0)
    star = spark.createDataFrame([(0, i) for i in range(1, 5)],
                                 "src LONG, dst LONG")
    r = clustering_null_model(star).collect()[0]
    # deg: center 4, leaves 1 -> k1 = 8/5, k2 = 20/5 = 4
    assert r.n_triangles == 0
    assert r.c_expected == pytest.approx(
        (4 - 8 / 5) ** 2 / (5 * (8 / 5) ** 3), abs=1e-8)
    assert r.small_world_ratio == 0.0


def test_chi2_discriminative_terms_closed_form(spark):
    from credigraph_spark.pipeline.textstats import (
        chi2_discriminative_terms)

    # 4 docs, 2 classes. "foo" only in class A docs, "the" in all.
    docs = spark.createDataFrame(
        [(1, "A", "foo the alpha"), (2, "A", "foo the beta"),
         (3, "B", "bar the gamma"), (4, "B", "bar the delta")],
        "doc_id LONG, lang STRING, text STRING")
    rows = chi2_discriminative_terms(docs, vocab_k=50, k=3).collect()
    got = {(r.lang, r.term): r.chi2 for r in rows}
    # perfect separator: a=2, b=0, c=0, d=2 -> chi2 = 4*(4-0)^2/(2*2*2*2)=4
    assert got[("A", "foo")] == pytest.approx(4.0, abs=1e-6)
    assert got[("B", "bar")] == pytest.approx(4.0, abs=1e-6)
    # uninformative term: a=2, b=2, c=0, d=0 -> chi2 = 0
    assert got.get(("A", "the"), 0.0) == pytest.approx(0.0, abs=1e-6)
    for r in rows:
        assert r.rnk <= 3


def test_split_leakage_counts(spark):
    from credigraph_spark.pipeline.dedup import split_leakage
    from credigraph_spark.pipeline.sampling import hash_split

    # two near-identical docs + one unique; all pairs discovered with
    # rows_per_band=1. Cross/within classification must follow the
    # engine's own hash_split assignment.
    t = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(i, t + (" extra" if i == 3 else "")) for i in (1, 2, 3)],
        "doc_id LONG, text STRING")
    out = {(r.split_a, r.split_b): (r.n_pairs, r.n_cross)
           for r in split_leakage(
               docs, {"train": 0.5, "test": 0.5}, num_hashes=8,
               rows_per_band=1, seed=7).collect()}
    assign = {r.doc_id: r.split for r in hash_split(
        docs.select("doc_id"), ["doc_id"],
        {"train": 0.5, "test": 0.5}, seed=7).collect()}
    total_pairs = sum(p for p, _ in out.values())
    assert total_pairs >= 1  # the near-identical pair must be found
    for (sa, sb), (n_pairs, n_cross) in out.items():
        assert sa <= sb
        if sa == sb:
            assert n_cross == 0
        else:
            assert n_cross == n_pairs
    # exact recomputation from the engine's own candidates + assignment
    from credigraph_spark.pipeline.dedup import lsh_candidate_pairs
    pairs = [(r.id_a, r.id_b) for r in lsh_candidate_pairs(
        docs, num_hashes=8, rows_per_band=1).collect()]
    want: dict = {}
    for a, b in pairs:
        key = tuple(sorted((assign[a], assign[b])))
        p, c = want.get(key, (0, 0))
        want[key] = (p + 1, c + (assign[a] != assign[b]))
    assert out == want


def test_spectral_sweep_finds_two_clique_cut(spark):
    from credigraph_spark.graph.spreading import spectral_sweep_cut

    # two 5-cliques joined by one bridge: the minimum-conductance prefix
    # is one whole clique, cut_edges = 1 (the bridge)
    k1 = [(a, b) for a in range(1, 6) for b in range(a + 1, 6)]
    k2 = [(a, b) for a in range(11, 16) for b in range(a + 1, 16)]
    edges = k1 + k2 + [(5, 11)]
    df = spark.createDataFrame(edges, "src LONG, dst LONG")
    curve = spectral_sweep_cut(df, max_iter=20, top_m=10).collect()
    best = min((r for r in curve if r.conductance is not None),
               key=lambda r: (r.conductance, r.rnk))
    assert best.rnk == 5          # one clique exactly
    assert best.cut_edges == 1    # the bridge
    first5 = {r.vid for r in curve if r.rnk <= 5}
    assert first5 in ({1, 2, 3, 4, 5}, {11, 12, 13, 14, 15})


def test_rank_biased_overlap_closed_form(spark):
    from credigraph_spark.analytics import rank_biased_overlap

    # identical rankings -> overlap 1 at every depth;
    # RBO_min = (1-p)/p * sum p^d = (1-p)/p * p(1-p^k)/(1-p) = 1 - p^k
    l = spark.createDataFrame([(i, float(10 - i)) for i in range(1, 6)],
                              "vid LONG, score DOUBLE")
    r = rank_biased_overlap(l, l, k=5, p=0.5).collect()[0]
    assert r.overlap_at_k == pytest.approx(1.0, abs=1e-6)
    assert r.rbo_min == pytest.approx(1 - 0.5 ** 5, abs=1e-6)

    # disjoint rankings -> 0 everywhere
    m = spark.createDataFrame([(i + 100, float(10 - i))
                               for i in range(1, 6)],
                              "vid LONG, score DOUBLE")
    r = rank_biased_overlap(l, m, k=5, p=0.5).collect()[0]
    assert r.overlap_at_k == 0.0 and r.rbo_min == 0.0

    # hand case: same top-1, ranks 2-3 swapped between the two lists
    a = spark.createDataFrame([(1, 3.0), (2, 2.0), (3, 1.0)],
                              "vid LONG, score DOUBLE")
    b = spark.createDataFrame([(1, 3.0), (3, 2.0), (2, 1.0)],
                              "vid LONG, score DOUBLE")
    r = rank_biased_overlap(a, b, k=3, p=0.5).collect()[0]
    # X_1=1, X_2=1 (vid2/vid3 enter at depth max(2,3)=3), X_3=3
    want = (0.5 / 0.5) * (0.5 * 1 / 1 + 0.25 * 1 / 2 + 0.125 * 3 / 3)
    assert r.rbo_min == pytest.approx(want, abs=1e-6)


def test_readability_closed_form(spark):
    from credigraph_spark.pipeline.textstats import readability

    # "the cat sat. it ran!" -> 5 words, 5 syllables, 2 sentences
    docs = spark.createDataFrame(
        [(1, "the cat sat. it ran!"), (2, ""), (3, "beautiful education")],
        "doc_id LONG, text STRING")
    got = {r.doc_id: r for r in readability(docs).collect()}
    r = got[1]
    assert (r.n_words, r.n_syllables, r.n_sentences) == (5, 5, 2)
    wps, spw = 5 / 2, 5 / 5
    assert r.flesch == pytest.approx(
        round(206.835 - 1.015 * wps - 84.6 * spw, 4), abs=1e-9)
    assert r.fk_grade == pytest.approx(
        round(0.39 * wps + 11.8 * spw - 15.59, 4), abs=1e-9)
    assert got[2].flesch is None and got[2].n_words == 0
    # beautiful: b-eau-t-i-f-u-l -> vowel runs eau,i,u = 3 (+ final? no)
    # wait: 'beautiful' runs: 'eau','i','u' = 3; education: e,u,a,io = 4
    assert got[3].n_syllables == 7


def test_preferential_attachment_linear_kernel(spark):
    from credigraph_spark.analytics import preferential_attachment

    # construct arrivals EXACTLY proportional to early degree:
    # early: hub 1 with degree 4, vertices 5,6 with degree 1 each
    early = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (1, 5), (6, 7)], "src LONG, dst LONG")
    # late: hub 1 gets 8 arrivals, vid 6 (deg 1) gets 2 -> alpha = 1
    late = spark.createDataFrame(
        [(1, 90 + i) for i in range(8)] + [(6, 99), (6, 98)],
        "src LONG, dst LONG")
    r = preferential_attachment(early, late).collect()[0]
    # degree classes: d=4 (vid 1) mean 8; d=1 (vids 2..7) -> arrivals:
    # vid 6 has 2, vids 2,3,4,5,7 have 0 -> class mean 2/6 = 1/3
    # slope = (ln 8 - ln(1/3)) / (ln 4 - ln 1)
    want = (math.log(8) - math.log(1 / 3)) / math.log(4)
    assert r.n_degrees == 2
    assert r.pa_exponent == pytest.approx(want, abs=1e-6)
    assert r.r2 == pytest.approx(1.0, abs=1e-6)


def test_rank_normalize_uniform_and_ties(spark):
    from credigraph_spark.features import rank_normalize

    df = spark.createDataFrame(
        [(1, 10.0), (2, 30.0), (3, 20.0), (4, 20.0)], "id LONG, v DOUBLE")
    got = {r.id: r.v_rank for r in
           rank_normalize(df, "id", ["v"]).collect()}
    # order: 10(id1), 20(id3), 20(id4), 30(id2) -> ranks 1..4
    assert got[1] == pytest.approx(0.5 / 4)
    assert got[3] == pytest.approx(1.5 / 4)  # tie broken by id
    assert got[4] == pytest.approx(2.5 / 4)
    assert got[2] == pytest.approx(3.5 / 4)
    assert all(0.0 < v < 1.0 for v in got.values())


def test_contract_graph_hand_case(spark):
    from credigraph_spark.analytics import contract_graph

    # communities A={1,2}, B={3}; edges 1->2 (intra A), 2->3, 3->1,
    # duplicate 2->3 (deduped by clean_edges), self-loop 3->3 (dropped)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (2, 3), (3, 1), (3, 3)], "src LONG, dst LONG")
    labels = spark.createDataFrame(
        [(1, "A"), (2, "A"), (3, "B")], "vid LONG, label STRING")
    got = {(r.src_comm, r.dst_comm): r.n_edges
           for r in contract_graph(edges, labels).collect()}
    assert got == {("A", "A"): 1, ("A", "B"): 1, ("B", "A"): 1}


def test_sparsify_edges_properties(spark):
    from credigraph_spark.graph.sampling import sparsify_edges

    # star: hub 0 with 6 leaves -> d0=6, leaves d=1;
    # p = min(1, c/sqrt(6)) per edge
    star = spark.createDataFrame([(0, i) for i in range(1, 7)],
                                 "src LONG, dst LONG")
    # huge c -> keeps everything at weight 1
    all_kept = sparsify_edges(star, c=100.0).collect()
    assert len(all_kept) == 6 and all(r.w == 1.0 for r in all_kept)
    # c=1 -> p = 1/sqrt(6); every survivor reweighted to exactly 1/p
    kept = sparsify_edges(star, c=1.0).collect()
    import math as _m
    want_w = round(_m.sqrt(6.0), 9)
    assert all(r.w == pytest.approx(want_w, abs=1e-9) for r in kept)
    assert 0 < len(kept) < 6  # thinned but connected-ish on this seed
    # deterministic: identical sample on rerun
    again = sparsify_edges(star, c=1.0).collect()
    assert sorted((r.src, r.dst) for r in kept) == \
        sorted((r.src, r.dst) for r in again)


def test_split_embedding_drift_hand_case(spark):
    import numpy as np

    from credigraph_spark.pipeline.sampling import hash_split
    from credigraph_spark.pipeline.similarity import split_embedding_drift

    vecs = {i: [float(i), float(i % 3), 1.0] for i in range(1, 21)}
    df = spark.createDataFrame(
        [(i, v) for i, v in vecs.items()],
        "vec_id LONG, embedding ARRAY<DOUBLE>")
    weights = {"train": 0.5, "test": 0.5}
    got = {(r.split_a, r.split_b): (r.cosine, r.l2_dist)
           for r in split_embedding_drift(df, weights).collect()}
    assign = {r.vec_id: r.split for r in hash_split(
        df.select("vec_id"), ["vec_id"], weights, seed=7).collect()}
    cents = {}
    for s in set(assign.values()):
        m = np.mean([vecs[i] for i in vecs if assign[i] == s], axis=0)
        cents[s] = m
    a, b = cents["test"], cents["train"]
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    l2 = float(np.linalg.norm(a - b))
    assert got[("test", "train")][0] == pytest.approx(cos, abs=1e-6)
    assert got[("test", "train")][1] == pytest.approx(l2, abs=1e-6)


def test_signal_smoothness_hand_case(spark):
    from credigraph_spark.analytics import signal_smoothness

    path = spark.createDataFrame([(1, 2), (2, 3)], "src LONG, dst LONG")
    sc = spark.createDataFrame([(1, 0.0), (2, 1.0), (3, 1.0)],
                               "vid LONG, score DOUBLE")
    r = signal_smoothness(path, sc).collect()[0]
    # dirichlet = (0-1)^2 + 0 = 1; norm_sq = 1*0 + 2*1 + 1*1 = 3
    assert r.n_edges_scored == 2
    assert r.dirichlet == pytest.approx(1.0)
    assert r.norm_sq == pytest.approx(3.0)
    assert r.smoothness == pytest.approx(1 / 3, abs=1e-8)
    # constant signal: perfectly smooth
    const = spark.createDataFrame([(i, 2.0) for i in (1, 2, 3)],
                                  "vid LONG, score DOUBLE")
    r = signal_smoothness(path, const).collect()[0]
    assert r.dirichlet == 0.0 and r.smoothness == 0.0
    # alternating signal on an edge: Rayleigh quotient hits 2 on
    # bipartite structure -> here (1,-1) on a single edge: 4 / 2 = 2
    one = spark.createDataFrame([(1, 2)], "src LONG, dst LONG")
    alt = spark.createDataFrame([(1, 1.0), (2, -1.0)],
                                "vid LONG, score DOUBLE")
    r = signal_smoothness(one, alt).collect()[0]
    assert r.smoothness == pytest.approx(2.0)


def test_robust_scale_closed_form(spark):
    from credigraph_spark.analytics import robust_scale

    # values 1..5 with an outlier 100: n=6, median = value at ceil(3)=3
    # sorted: 1,2,3,4,5,100 -> med = 3; deviations: 2,1,0,1,2,97
    # sorted: 0,1,1,2,2,97 -> MAD at pos 3 = 1
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 100])],
        "id LONG, v DOUBLE")
    got = {r.id: r.robust for r in robust_scale(df, "id", "v").collect()}
    assert got[0] == pytest.approx(-2.0)   # (1-3)/1
    assert got[2] == pytest.approx(0.0)
    assert got[5] == pytest.approx(97.0)   # outlier visible, not inf
    # constant column -> MAD 0 -> all zeros, no division blowup
    const = spark.createDataFrame([(i, 7.0) for i in range(4)],
                                  "id LONG, v DOUBLE")
    assert all(r.robust == 0.0 for r in
               robust_scale(const, "id", "v").collect())


def test_source_quality_rollup(spark):
    from credigraph_spark.pipeline.textstats import source_quality_rollup

    # mean word len must land in [3,10]: 'the'(3)+'cats'(4) -> 3.5
    good = "the cats " * 30 + "a dogs"     # passes gopher (the,a rules)
    bad = "zz"                              # fails (too short)
    docs = spark.createDataFrame(
        [(1, "A", good), (2, "A", bad),
         (3, "B", "le la les de des " * 20),   # french-stopword heavy
         (4, "B", "the the of to and is " * 20)],
        "doc_id LONG, source STRING, text STRING")
    got = {r.source: r for r in source_quality_rollup(
        docs, stopwords=("the", "a"), min_stopwords=2).collect()}
    assert got["A"].n_docs == 2
    assert got["A"].gopher_keep_rate == pytest.approx(0.5, abs=1e-6)
    # source A: both docs language-ID as the same or different; entropy
    # bounded in [0, 2]; source B mixes fr and en -> entropy 1.0
    assert got["B"].lang_entropy == pytest.approx(1.0, abs=1e-6)
    assert 0.0 <= got["A"].lang_entropy <= 2.0


def test_ks_split_drift_scipy_differential(spark):
    from credigraph_spark.pipeline.sampling import hash_split, ks_split_drift

    vals = {i: float((i * 37) % 100) for i in range(1, 101)}
    df = spark.createDataFrame([(i, v) for i, v in vals.items()],
                               "doc_id LONG, x DOUBLE")
    weights = {"train": 0.5, "test": 0.5}
    r = ks_split_drift(df, ["doc_id"], "x", weights,
                       seed=7).collect()[0]
    assign = {a.doc_id: a.split for a in hash_split(
        df.select("doc_id"), ["doc_id"], weights, seed=7).collect()}
    xs = sorted(vals[i] for i in vals if assign[i] == "train")
    ys = sorted(vals[i] for i in vals if assign[i] == "test")
    # exact two-sample KS by brute force over all observed values
    grid = sorted(set(xs) | set(ys))
    import bisect
    d = max(abs(bisect.bisect_right(xs, g) / len(xs)
                - bisect.bisect_right(ys, g) / len(ys)) for g in grid)
    assert r.n_a == len(xs) and r.n_b == len(ys)
    assert r.ks_stat == pytest.approx(d, abs=1e-9)


def test_weighted_assortativity_differential(spark):
    import numpy as np

    from credigraph_spark.analytics import weighted_assortativity

    edges = [(1, 2, 3.0), (2, 3, 1.0), (3, 4, 2.0), (1, 4, 1.0),
             (2, 1, 1.0)]  # parallel/reverse 1-2 sums to 4
    df = spark.createDataFrame(edges, "src LONG, dst LONG, w DOUBLE")
    r = weighted_assortativity(df).collect()[0]
    # reference computation
    und = {}
    for s, d, w in edges:
        k = (min(s, d), max(s, d))
        und[k] = und.get(k, 0.0) + w
    st = {}
    for (a, b), w in und.items():
        st[a] = st.get(a, 0.0) + w
        st[b] = st.get(b, 0.0) + w
    st = {v: round(s, 8) for v, s in st.items()}
    xs, ys, ws = [], [], []
    for (a, b), w in und.items():
        for u, v in ((a, b), (b, a)):
            xs.append(st[u]); ys.append(st[v]); ws.append(w)
    xs, ys, ws = map(np.array, (xs, ys, ws))
    W = ws.sum()
    mx, my = (ws * xs).sum() / W, (ws * ys).sum() / W
    cov = (ws * xs * ys).sum() / W - mx * my
    vx = (ws * xs * xs).sum() / W - mx * mx
    vy = (ws * ys * ys).sum() / W - my * my
    want = cov / (vx ** 0.5 * vy ** 0.5)
    assert r.n_edges == 4
    assert r.total_weight == pytest.approx(8.0)
    assert r.r == pytest.approx(want, abs=1e-6)


def test_source_js_divergence_closed_form(spark):
    from credigraph_spark.pipeline.textstats import source_js_divergence

    # A: all 'x'; B: all 'y' -> disjoint distributions -> JS = 1 bit
    # C: half x half y -> JS(A,C): pa=(1,0), pc=(.5,.5)
    docs = spark.createDataFrame(
        [(1, "A", "x x x x"), (2, "B", "y y y y"), (3, "C", "x y x y")],
        "doc_id LONG, source STRING, text STRING")
    got = {(r.source_a, r.source_b): r.js_bits
           for r in source_js_divergence(docs, vocab_k=10).collect()}
    assert got[("A", "B")] == pytest.approx(1.0, abs=1e-6)
    # JS(A,C): m=(0.75, 0.25);
    # = 0.5*log2(1/.75)/1*... compute directly:
    ja = 1.0 / 2 * math.log2(1.0 / 0.75)
    jc = (0.5 / 2 * math.log2(0.5 / 0.75)
          + 0.5 / 2 * math.log2(0.5 / 0.25))
    assert got[("A", "C")] == pytest.approx(ja + jc, abs=1e-6)
    # symmetry comes free of the (a<b) canonicalization; bounded [0,1]
    assert all(0.0 <= v <= 1.0 for v in got.values())


def test_curation_threshold_sweep_monotone(spark):
    from credigraph_spark.pipeline.textstats import (
        curation_threshold_sweep)

    docs = spark.createDataFrame(
        [(i, "abcdefgh"[: 2 + (i % 7)] * 3, 3 * (2 + (i % 7)))
         for i in range(1, 41)],
        "doc_id LONG, text STRING, n_chars LONG")
    rows = sorted(curation_threshold_sweep(docs).collect(),
                  key=lambda r: r.q)
    # higher threshold keeps fewer docs; kept_frac consistent with n
    for a, b in zip(rows, rows[1:]):
        assert a.threshold <= b.threshold
        assert a.n_kept >= b.n_kept
    assert all(r.kept_frac == pytest.approx(r.n_kept / 40, abs=1e-6)
               for r in rows)
    # the q=0.1 threshold keeps at least 90% minus ties
    assert rows[0].n_kept >= 0.9 * 40 - 1


def test_percolation_curve_properties(spark):
    from credigraph_spark.analytics import percolation_curve
    from credigraph_spark.graph.components import connected_components

    # ring of 30 + a pendant chain
    ring = [(i, (i % 30) + 1) for i in range(1, 31)]
    chain = [(30, 40), (40, 41), (41, 42)]
    df = spark.createDataFrame(ring + chain, "src LONG, dst LONG")
    rows = sorted(percolation_curve(df, keep_fracs=(0.4, 0.8, 1.0))
                  .collect(), key=lambda r: r.keep_frac)
    # nested samples: kept edges and LCC monotone in p
    for a, b in zip(rows, rows[1:]):
        assert a.n_edges_kept <= b.n_edges_kept
        assert a.lcc_size <= b.lcc_size
    full = rows[-1]
    assert full.n_edges_kept == 33
    labels, _ = connected_components(df)
    true_lcc = max(r[1] for r in labels.groupBy("component")
                   .count().collect())
    assert full.lcc_size == true_lcc and full.lcc_frac == 1.0


def test_transition_stationary_two_state(spark):
    import datetime as dt

    from credigraph_spark.temporal import transition_stationary

    # one user alternating A,B,A,B,A -> P(A->B)=1, P(B->A)=1;
    # pi stays (0.5, 0.5) at every round (period-2 chain, uniform init)
    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0 + dt.timedelta(minutes=i), 1,
             "A" if i % 2 == 0 else "B")
            for i in range(5)]
    ev = spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG, "
              "event_type STRING")
    got = {r.event_type: r.pi for r in
           transition_stationary(ev, rounds=4).collect()}
    assert got == {"A": pytest.approx(0.5), "B": pytest.approx(0.5)}

    # absorbing sink: A->B only, B has no outgoing -> all mass ends in B
    rows2 = [(1, t0, 1, "A"), (2, t0 + dt.timedelta(minutes=1), 1, "B")]
    ev2 = spark.createDataFrame(
        rows2, "event_id LONG, ts TIMESTAMP, user_id LONG, "
               "event_type STRING")
    got2 = {r.event_type: r.pi for r in
            transition_stationary(ev2, rounds=3).collect()}
    assert got2["B"] == pytest.approx(1.0)
    assert got2["A"] == pytest.approx(0.0)  # stays in the table at 0


def test_disparity_backbone_hand_case(spark):
    from credigraph_spark.graph.sampling import disparity_backbone

    # hub 1 with 4 edges: one dominant (w=97), three weak (w=1);
    # leaves have k=1 (p=0 -> everything kept by the leaf side with
    # alpha large); at alpha=0.05 and k=1-kept convention every edge
    # survives via the leaf. Use a 2-core shape instead:
    # vertices 1 and 2 each with 3 edges; edge (1,2) dominant.
    edges = [(1, 2, 98.0), (1, 3, 1.0), (1, 4, 1.0),
             (2, 3, 1.0), (2, 4, 1.0), (3, 4, 1.0)]
    df = spark.createDataFrame(edges, "src LONG, dst LONG, w DOUBLE")
    got = {(r.src, r.dst): r.alpha_min for r in
           disparity_backbone(df, alpha=0.05).collect()}
    # endpoint 1: s=100, k=3 -> p(1,2) = (1-0.98)^2 = 4e-4 < 0.05: kept
    assert (1, 2) in got
    assert got[(1, 2)] == pytest.approx((1 - 98 / 100) ** 2, abs=1e-9)
    # edge (3,4): endpoints s=3,k=3 -> p=(1-1/3)^2=0.444 both sides:
    # NOT significant
    assert (3, 4) not in got
    # strict filter keeps only the dominant edge here
    assert set(got) == {(1, 2)}


def test_vocab_coverage_closed_form(spark):
    from credigraph_spark.pipeline.textstats import vocab_coverage

    # freqs: a=6, b=3, c=1 (total 10). cum: a->6 (.6), ab->9 (.9),
    # abc->10 (1.0)
    docs = spark.createDataFrame(
        [(1, "a a a b"), (2, "a a a b b c")], "doc_id LONG, text STRING")
    got = {r.q: (r.n_types_needed, r.coverage) for r in
           vocab_coverage(docs, qs=(0.5, 0.9, 0.95)).collect()}
    assert got[0.5] == (1, pytest.approx(0.6))
    assert got[0.9] == (2, pytest.approx(0.9))   # boundary: t <= cm
    assert got[0.95] == (3, pytest.approx(1.0))


def test_kmeans_silhouette_separated_clusters(spark):
    from credigraph_spark.pipeline.ivf import kmeans_silhouette

    # two tight, well-separated direction clusters in 4-d
    rows = []
    for i in range(10):
        rows.append((i, [10.0, 0.1 * i, 0.0, 0.0]))
    for i in range(10, 20):
        rows.append((i, [0.0, 0.0, 10.0, 0.1 * i]))
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    out = kmeans_silhouette(df, k=2, iters=2, seed=7).collect()
    assert sum(r.n for r in out) == 20
    # well-separated clusters: strongly positive mean silhouette
    for r in out:
        assert r.mean_silhouette > 0.5


def test_bm25_hand_case(spark):
    import math

    from credigraph_spark.pipeline.retrieval import bm25_topk

    # 3 docs, query = ["cat"]: doc 1 has tf=2/dl=4, doc 2 tf=1/dl=2,
    # doc 3 no match (excluded). df(cat)=2, N=3.
    docs = spark.createDataFrame(
        [(1, "cat cat dog fish"), (2, "cat dog"), (3, "dog dog fish")],
        "doc_id LONG, text STRING")
    got = {r.doc_id: r.score for r in
           bm25_topk(docs, ["cat"], n_docs=3, k=10).collect()}
    assert set(got) == {1, 2}
    avgdl = (4 + 2 + 3) / 3.0
    idf = math.log(1.0 + (3 - 2 + 0.5) / (2 + 0.5))

    def score(tf, dl):
        raw = idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl))
        return round(round(raw * 1e8) / 1e8, 6)

    assert got[1] == pytest.approx(score(2, 4), abs=2e-6)
    assert got[2] == pytest.approx(score(1, 2), abs=2e-6)
    # higher tf with moderate length penalty: doc 1 ranks first
    assert got[1] > got[2]


def test_bm25_multi_term_sum_and_topk(spark):
    from credigraph_spark.pipeline.retrieval import bm25_topk

    docs = spark.createDataFrame(
        [(i, "alpha beta " + ("gamma " * (i % 3))) for i in range(1, 21)],
        "doc_id LONG, text STRING")
    out = bm25_topk(docs, ["alpha", "gamma"], n_docs=20, k=5).collect()
    assert len(out) == 5
    scores = [r.score for r in out]
    assert scores == sorted(scores, reverse=True)
    # gamma is rarer than alpha (present in 2/3 of docs): gamma-bearing
    # docs outrank gamma-free ones
    assert out[0].doc_id % 3 != 0


def test_prefix_jaccard_hand_case(spark):
    from credigraph_spark.pipeline.dedup import prefix_jaccard_topk

    docs = spark.createDataFrame([
        (1, "a b c d e"),          # {a..e}
        (2, "a b c d e f"),        # J(1,2) = 5/6 = 0.8333
        (3, "a b c d e"),          # J(1,3) = 1.0
        (4, "x y z"),              # disjoint
    ], "doc_id LONG, text STRING")
    got = {(r.id_a, r.id_b): r.jaccard for r in
           prefix_jaccard_topk(docs, threshold=0.8, k=10).collect()}
    assert got[(1, 3)] == pytest.approx(1.0)
    assert got[(1, 2)] == pytest.approx(5 / 6, abs=1e-6)
    assert got[(2, 3)] == pytest.approx(5 / 6, abs=1e-6)
    assert set(got) == {(1, 3), (1, 2), (2, 3)}


def test_prefix_jaccard_lossless_vs_bruteforce(spark):
    from credigraph_spark.pipeline.dedup import prefix_jaccard_topk

    # deterministic word-salad docs with heavy overlap
    vocab = ["w%d" % i for i in range(12)]
    rows = []
    for i in range(30):
        words = [vocab[(i * 7 + j * 3) % 12] for j in range(8)]
        rows.append((i, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {(r.id_a, r.id_b): r.jaccard for r in
           prefix_jaccard_topk(docs, threshold=0.6, k=1000).collect()}

    sets = {i: set(t.split()) for i, t in rows}
    want = {}
    for a in range(30):
        for b in range(a + 1, 30):
            j = round(len(sets[a] & sets[b]) / len(sets[a] | sets[b]), 6)
            if j >= 0.6:
                want[(a, b)] = j
    assert set(got) == set(want)
    for p, j in want.items():
        assert got[p] == pytest.approx(j, abs=1e-6)


def test_containment_hand_case(spark):
    from credigraph_spark.pipeline.dedup import containment_pairs

    # unigram shingles so the sets are easy to reason about
    docs = spark.createDataFrame([
        (1, "a b c"),            # {a,b,c} fully inside doc 2
        (2, "a b c d e"),        # superset
        (3, "x y z"),            # disjoint
    ], "doc_id LONG, text STRING")
    got = {(r.id_a, r.id_b): (r.n_a, r.common, r.containment) for r in
           containment_pairs(docs, shingle_n=1, threshold=0.5).collect()}
    # C(1 in 2) = 3/3 = 1.0; C(2 in 1) = 3/5 = 0.6; both pass at 0.5
    assert got[(1, 2)] == (3, 3, pytest.approx(1.0))
    assert got[(2, 1)] == (5, 3, pytest.approx(0.6))
    assert set(got) == {(1, 2), (2, 1)}


def test_containment_vs_bruteforce(spark):
    from credigraph_spark.pipeline.dedup import containment_pairs

    vocab = ["w%d" % i for i in range(10)]
    rows = []
    for i in range(25):
        words = [vocab[(i * 3 + j * 5) % 10] for j in range(3 + i % 6)]
        rows.append((i, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {(r.id_a, r.id_b): r.containment for r in
           containment_pairs(docs, shingle_n=2, threshold=0.5).collect()}

    def grams(t):
        w = t.split()
        if len(w) <= 2:
            return {" ".join(w)}
        return {" ".join(w[k:k + 2]) for k in range(len(w) - 1)}

    sets = {i: grams(t) for i, t in rows}
    want = {}
    for a in sets:
        for b in sets:
            if a == b or not sets[a] & sets[b]:
                continue
            c = len(sets[a] & sets[b]) / len(sets[a])
            if c >= 0.5:
                want[(a, b)] = c
    assert set(got) == set(want)
    for p, c in want.items():
        assert got[p] == pytest.approx(c, abs=1e-9)


def test_hamming_prefix_hand_case(spark):
    from credigraph_spark.pipeline.dedup import hamming_prefix_pairs

    base = "abcdefghijklmnopqrstuvwx"          # 24 chars
    docs = spark.createDataFrame([
        (1, base + " tail one"),
        (2, base[:5] + "Z" + base[6:] + " x"),   # dist 1 from base
        (3, base[:5] + "Z" + base[6:11] + "Q" + base[12:]),  # dist 2
        (4, "zzzzzzzzzzzzzzzzzzzzzzzz"),         # far away
        (5, "short"),                             # filtered (<24 chars)
    ], "doc_id LONG, text STRING")
    got = {(r.id_a, r.id_b): r.dist for r in
           hamming_prefix_pairs(docs, prefix_len=24, max_dist=2).collect()}
    assert got == {(1, 2): 1, (1, 3): 2, (2, 3): 1}


def test_hamming_prefix_lossless_and_case_fold(spark):
    from credigraph_spark.pipeline.dedup import hamming_prefix_pairs

    # deterministic strings over a 3-letter alphabet: plenty of close
    # pairs, verify against brute force (case-insensitive)
    rows = []
    for i in range(40):
        s = "".join("abc"[(i * (j + 3) + j * j) % 3] for j in range(24))
        if i % 4 == 0:
            s = s.upper()
        rows.append((i, s + " suffix"))
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {(r.id_a, r.id_b): r.dist for r in
           hamming_prefix_pairs(docs, prefix_len=24, max_dist=3).collect()}
    want = {}
    for a in range(40):
        for b in range(a + 1, 40):
            d = sum(x != y for x, y in
                    zip(rows[a][1][:24].lower(), rows[b][1][:24].lower()))
            if d <= 3:
                want[(a, b)] = d
    assert got == want


def test_lm_cross_entropy_hand_case(spark):
    import math

    from credigraph_spark.pipeline.textstats import lm_cross_entropy

    # corpus: tokens a a a b  ->  p(a)=3/4, p(b)=1/4
    docs = spark.createDataFrame([
        (1, "a a a"),     # H = -log2(3/4)
        (2, "b"),         # H = -log2(1/4) = 2
        (3, ""),          # tokenless
    ], "doc_id LONG, text STRING")
    got = {r.doc_id: r for r in lm_cross_entropy(docs).collect()}
    h1 = -math.log2(3 / 4)
    assert got[1].n_tokens == 3
    assert abs(got[1].h_bits - round(h1, 6)) < 1e-9
    assert abs(got[1].ppl - round(2 ** round(h1, 6), 6)) < 1e-9
    assert got[2].n_tokens == 1
    assert got[2].h_bits == 2.0 and got[2].ppl == 4.0
    assert got[2].h_bucket == 4  # floor(2.0 / 0.5)
    assert got[3].n_tokens == 0 and got[3].h_bits == 0.0
    assert got[3].ppl == 1.0 and got[3].h_bucket == 0


def test_lm_cross_entropy_python_differential(spark):
    import math
    import re
    from collections import Counter

    from credigraph_spark.pipeline.textstats import lm_cross_entropy

    rows = [(i, " ".join("tok%d" % ((i * (j + 7) + j * j) % 13)
                         for j in range(i % 9 + 1)))
            for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r.doc_id: r for r in lm_cross_entropy(docs).collect()}

    def toks(s):
        return [t for t in re.split(r"[^a-z0-9']+", s.lower()) if t]

    vocab = Counter(t for _, s in rows for t in toks(s))
    n = sum(vocab.values())
    for i, s in rows:
        ts = toks(s)
        h = round(-sum(math.log2(vocab[t] / n) for t in ts) / len(ts), 6)
        assert got[i].n_tokens == len(ts)
        assert abs(got[i].h_bits - h) < 1e-6, (i, got[i].h_bits, h)
        assert got[i].h_bucket == math.floor(got[i].h_bits / 0.5)


def test_pii_scrub_hand_case(spark):
    import hashlib

    from credigraph_spark.pipeline.safety import pii_scrub

    docs = spark.createDataFrame([
        (1, "mail bob.smith+x@sub.example.org and 192.168.0.1 ok"),
        (2, "call +1 555-010 0199 now"),
        (3, "clean text with no pii at all"),
        (4, "two mails a@b.co c@d.io one ip 10.0.0.255"),
    ], "doc_id LONG, text STRING")
    got = {r.doc_id: r for r in pii_scrub(docs).collect()}
    assert (got[1].n_emails, got[1].n_ipv4, got[1].n_phones) == (1, 1, 0)
    assert got[1].has_pii
    red1 = "mail <EMAIL> and <IP> ok"
    assert got[1].redacted_sha == hashlib.sha256(red1.encode()).hexdigest()
    assert got[2].n_phones == 1 and got[2].n_emails == 0
    assert got[3].has_pii is False
    assert got[3].redacted_sha == hashlib.sha256(
        b"clean text with no pii at all").hexdigest()
    assert (got[4].n_emails, got[4].n_ipv4) == (2, 1)


def test_pii_scrub_python_re_parity(spark):
    import re

    from credigraph_spark.pipeline.safety import (EMAIL_RE, IPV4_RE,
                                                  PHONE_RE, pii_scrub)

    rows = []
    for i in range(50):
        parts = ["doc %d body" % i]
        if i % 3 == 0:
            parts.append("u%d@ex%d.net" % (i, i % 5))
        if i % 4 == 0:
            parts.append("%d.%d.%d.%d" % (i % 250, i % 7, i % 11, i % 13))
        if i % 5 == 0:
            parts.append("+%d 123-456 78%d" % (i % 9 + 1, i % 10))
        rows.append((i, " ".join(parts)))
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r.doc_id: r for r in pii_scrub(docs).collect()}
    for i, s in rows:
        assert got[i].n_emails == len(re.findall(EMAIL_RE, s)), (i, s)
        assert got[i].n_ipv4 == len(re.findall(IPV4_RE, s)), (i, s)
        assert got[i].n_phones == len(re.findall(PHONE_RE, s)), (i, s)


def test_blocklist_screen(spark):
    from credigraph_spark.pipeline.safety import blocklist_screen

    docs = spark.createDataFrame([
        (1, "good text slow and JUNK here"),   # 2/6 blocked
        (2, "all clean tokens"),
        (3, ""),
    ], "doc_id LONG, text STRING")
    got = {r.doc_id: r for r in
           blocklist_screen(docs, ["slow", "junk"], max_frac=0.2).collect()}
    assert got[1].n_tokens == 6 and got[1].n_blocked == 2
    assert not got[1].keep          # 0.333 > 0.2
    assert got[2].n_blocked == 0 and got[2].keep
    assert got[3].n_tokens == 0 and got[3].keep


def test_bigram_cross_entropy_hand_case(spark):
    import math

    from credigraph_spark.pipeline.textstats import bigram_cross_entropy

    # corpus bigrams: (a,b) x2 from doc1, (b,a) x1 from doc1 "a b a b"?
    # doc1 = "a b a b": bigrams (a,b),(b,a),(a,b); doc2 = "b b": (b,b)
    docs = spark.createDataFrame([
        (1, "a b a b"),
        (2, "b b"),
        (3, "single"),
    ], "doc_id LONG, text STRING")
    lam = 0.7
    got = {r.doc_id: r for r in
           bigram_cross_entropy(docs, lam=lam).collect()}
    # model: c(a,b)=2 c(b,a)=1 c(b,b)=1; c(a.)=2 c(b.)=2
    # uni over second elems: c(b)=3, c(a)=1; n_bg=4
    one_m = 1.0 - lam
    p_ab = lam * 2 / 2 + one_m * 3 / 4
    p_ba = lam * 1 / 2 + one_m * 1 / 4
    p_bb = lam * 1 / 2 + one_m * 3 / 4
    h1 = round(-(2 * math.log2(p_ab) + math.log2(p_ba)) / 3, 6)
    h2 = round(-math.log2(p_bb), 6)
    assert got[1].n_bigrams == 3
    assert abs(got[1].h2_bits - h1) < 1e-9
    assert got[2].n_bigrams == 1
    assert abs(got[2].h2_bits - h2) < 1e-9
    assert got[3].n_bigrams == 0 and got[3].h2_bits == 0.0
    assert got[3].ppl2 == 1.0


def test_clique_percolation_overlap(spark):
    from credigraph_spark.graph.triangles import clique_percolation_k3

    # triangles (1,2,3)+(2,3,4) share edge (2,3) -> one community;
    # (4,5,6) shares only VERTEX 4 -> separate community; vertex 4 is
    # in both (overlap, the defining CPM property). Edge (7,8) is in
    # no triangle -> absent from the output.
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (2, 4), (3, 4),
         (4, 5), (5, 6), (4, 6), (7, 8)],
        "src LONG, dst LONG")
    rows = clique_percolation_k3(edges).collect()
    comms = {}
    for r in rows:
        comms.setdefault(r.community, set()).add(r.vid)
    assert sorted(map(sorted, comms.values())) == [[1, 2, 3, 4], [4, 5, 6]]
    # vertex 4 appears in exactly two communities
    assert sum(1 for r in rows if r.vid == 4) == 2


def test_bpe_learn_classic(spark):
    from credigraph_spark.pipeline.textstats import bpe_learn

    df = spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "new newer newest new")],
        "doc_id LONG, text STRING")
    got = [(r.rank, r.lhs, r.rhs, r.freq)
           for r in bpe_learn(df, n_merges=4).collect()]
    # 'l o' x5 -> 'lo w' x5 (merged symbol participates) -> 'e w' x4
    # -> 'n ew' x4 (merged symbol as rhs)
    assert got == [(1, "l", "o", 5), (2, "lo", "w", 5),
                   (3, "e", "w", 4), (4, "n", "ew", 4)]


def test_bpe_learn_chain_merge(spark):
    from credigraph_spark.pipeline.textstats import bpe_learn

    # 'abab': after merging (a,b) BOTH occurrences must merge in one
    # pass (adjacent delimited matches share no chars), so round 2 sees
    # pair (ab, ab)
    df = spark.createDataFrame([(1, "abab abab ax")],
                               "doc_id LONG, text STRING")
    got = [(r.rank, r.lhs, r.rhs, r.freq)
           for r in bpe_learn(df, n_merges=2).collect()]
    assert got[0] == (1, "a", "b", 4)
    assert got[1] == (2, "ab", "ab", 2)


def test_bpe_fertility_hand_case(spark):
    from credigraph_spark.pipeline.textstats import bpe_fertility

    # merges on this corpus: (l,o)x5 -> (lo,w)x5 -> (e,w)x4
    # after 3 merges: low -> [low] 1 sym; lower -> [low,e,r] 3;
    # lowest -> [low,e,s,t] 4; new -> [n,ew] 2
    df = spark.createDataFrame(
        [(1, "low lower lowest low low"), (2, "new newer newest new")],
        "doc_id LONG, text STRING")
    got = {r.doc_id: r for r in bpe_fertility(df, n_merges=3).collect()}
    assert got[1].n_words == 5
    assert got[1].n_subwords == 1 + 3 + 4 + 1 + 1
    assert abs(got[1].fertility - 10 / 5) < 1e-9
    assert got[2].n_words == 4
    # new->[n,ew]=2, newer->[n,ew,e,r]=4, newest->[n,ew,e,s,t]=5, new->2
    assert got[2].n_subwords == 2 + 4 + 5 + 2


def test_greedy_matching_path(spark):
    from credigraph_spark.graph.matching import greedy_matching

    # path 1-2-3-4: round 1 matches (1,2) (mutual min proposals; 3
    # proposes 2 which is taken), round 2 matches (3,4)
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 4)],
                                  "src LONG, dst LONG")
    got = sorted((r.u, r.v) for r in
                 greedy_matching(edges, rounds=3).collect())
    assert got == [(1, 2), (3, 4)]


def test_greedy_matching_is_matching_and_maximal(spark):
    from credigraph_spark.graph.matching import greedy_matching

    rows = [(i, (i * 7 + 3) % 40) for i in range(40)] + \
           [(i, (i * 11 + 5) % 40) for i in range(40)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in rows if a != b], "src LONG, dst LONG")
    pairs = [(r.u, r.v) for r in greedy_matching(edges, rounds=50).collect()]
    used = [v for p in pairs for v in p]
    assert len(used) == len(set(used))          # a matching
    eset = set()
    for a, b in rows:
        if a != b:
            eset.add((min(a, b), max(a, b)))
    assert set(pairs) <= eset                    # pairs are real edges
    # maximal: every edge has a matched endpoint
    for a, b in eset:
        assert a in used or b in used, (a, b)


def test_skew_report_hand_case(spark):
    from credigraph_spark.analytics import skew_report

    # counts: k=0 -> 4, k=1 -> 3, k=2 -> 3, k=9 -> 1
    df = spark.createDataFrame([(i % 3,) for i in range(10)] + [(9,)],
                               "k LONG")
    r = skew_report(df, "k").collect()[0]
    assert (r.n_rows, r.n_keys, r.max_cnt) == (11, 4, 4)
    # sorted x=[1,3,3,4]: G = 2*(1+6+9+16)/(4*11) - 5/4
    assert abs(r.gini - round(2 * 32 / 44 - 5 / 4, 6)) < 1e-9
    assert r.top_key == "0" and abs(r.top_frac - 4 / 11) < 1e-8
    assert (r.p50_cnt, r.p90_cnt, r.p99_cnt) == (3, 4, 4)


def test_skew_report_uniform_gini_zero(spark):
    from credigraph_spark.analytics import skew_report

    df = spark.createDataFrame([(i % 8,) for i in range(80)], "k LONG")
    r = skew_report(df, "k").collect()[0]
    assert r.gini == 0.0 and r.n_keys == 8 and r.max_cnt == 10


def test_naive_bayes_learns_separable_fixture(spark):
    from credigraph_spark.pipeline.classify import naive_bayes_lang

    # two clearly separable vocabularies; train = doc_id % 5 != 0
    rows = []
    for i in range(60):
        lang = "aa" if i % 2 == 0 else "bb"
        words = (["apple", "pear", "plum"] if lang == "aa"
                 else ["wolf", "bear", "lynx"])
        rows.append((i, " ".join(words[(i + j) % 3] for j in range(8)), lang))
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")
    out = naive_bayes_lang(docs).collect()
    assert len(out) == 12                       # doc_id % 5 == 0 held out
    assert all(r.correct for r in out)          # fully separable


def test_naive_bayes_unseen_token_and_prior_pull(spark):
    from credigraph_spark.pipeline.classify import naive_bayes_lang

    # test doc 0 contains ONLY a token never seen in training: every
    # class scores log prior - n_d*log(N_c+V); majority class wins on
    # the prior (tie-break on class name if priors equal)
    rows = [(0, "zzz", "xx")]
    for i in range(1, 10):
        rows.append((i, "common words here", "xx" if i <= 6 else "yy"))
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")
    out = {r.doc_id: r for r in naive_bayes_lang(docs).collect()}
    # N_c equal per class? xx has 6 train docs * 3 toks, yy has 3 * 3
    # -> logden differs; prior(xx) > prior(yy) and N_xx > N_yy;
    # score = logprior - 1*log(N_c + V): xx = ln(6/9) - ln(18+3),
    # yy = ln(3/9) - ln(9+3)
    import math
    sxx = math.log(6 / 9) - math.log(18 + 3)
    syy = math.log(3 / 9) - math.log(9 + 3)
    want = "xx" if round(sxx, 6) > round(syy, 6) else "yy"
    assert out[0].pred == want


def test_logreg_gd_learns_separable(spark):
    from pyspark.sql import functions as F

    from credigraph_spark.pipeline.classify import logistic_regression_gd

    # y = 1 iff x > 0: GD must find positive slope and move the
    # boundary toward 0
    rows = [(float(x), 1.0 if x > 0 else 0.0)
            for x in range(-20, 21) if x != 0]
    df = spark.createDataFrame(rows, "x DOUBLE, y DOUBLE")
    betas = {r.feature: r.beta for r in logistic_regression_gd(
        df, {"x": F.col("x") / 10.0}, label=F.col("y") > 0.5,
        iters=10, lr=1.0).collect()}
    assert betas["x"] > 0.5
    assert abs(betas["intercept"]) < 0.3


def test_logreg_gd_python_differential(spark):
    import math

    from pyspark.sql import functions as F

    from credigraph_spark.pipeline.classify import logistic_regression_gd

    rows = [((i % 7) / 7.0, 1.0 if i % 3 == 0 else 0.0) for i in range(30)]
    df = spark.createDataFrame(rows, "x DOUBLE, y DOUBLE")
    got = {r.feature: r.beta for r in logistic_regression_gd(
        df, {"x": F.col("x")}, label=F.col("y") > 0.5,
        iters=3, lr=0.5).collect()}
    # replicate the quantized GD exactly
    n = len(rows)
    b0 = b1 = 0.0
    for _ in range(3):
        def qsum(vals):
            return sum(math.floor(v * 1e9) for v in vals) / (1e9 * n)
        ps = [1.0 / (1.0 + math.exp(-(b0 + b1 * x))) for x, _ in rows]
        g0 = round(qsum([p - y for p, (_, y) in zip(ps, rows)]), 6)
        g1 = round(qsum([x * (p - y) for p, (x, y) in zip(ps, rows)]), 6)
        b0 = round(b0 - 0.5 * g0, 7)
        b1 = round(b1 - 0.5 * g1, 7)
    assert got["intercept"] == b0 and got["x"] == b1


def test_edge_embeddedness_hand_case(spark):
    from credigraph_spark.graph.triangles import edge_embeddedness

    # triangle 1-2-3 plus pendant 3-4: (1,2) has N(1)\{2}={3},
    # N(2)\{1}={3} -> common=1, union={3} -> emb=1.0; (1,3):
    # common={2}, union={2,4} -> 0.5; (3,4): weak tie, 0.0
    e = spark.createDataFrame([(1, 2), (2, 3), (1, 3), (3, 4)],
                              "src LONG, dst LONG")
    got = {(r.src, r.dst): (r.common, r.emb)
           for r in edge_embeddedness(e).collect()}
    assert got == {(1, 2): (1, 1.0), (1, 3): (1, 0.5),
                   (2, 3): (1, 0.5), (3, 4): (0, 0.0)}


def test_hll_distinct_accuracy_and_dup_invariance(spark):
    from credigraph_spark.pipeline.sketch import hll_distinct

    # 2000 distinct values: HLL with 64 registers has ~13% std error;
    # duplicates must not change the sketch at all
    rows = [("g", i % 2000) for i in range(6000)]
    df = spark.createDataFrame(rows, "g STRING, v LONG")
    r = hll_distinct(df, ["g"], "v", b=6).collect()[0]
    assert r.n_exact == 2000
    assert abs(r.hll_estimate - 2000) / 2000 < 0.35
    uniq = spark.createDataFrame([("g", i) for i in range(2000)],
                                 "g STRING, v LONG")
    r2 = hll_distinct(uniq, ["g"], "v", b=6).collect()[0]
    assert r2.hll_estimate == r.hll_estimate   # dup-invariant sketch


def test_hll_distinct_python_differential(spark):
    import hashlib
    import math

    from credigraph_spark.pipeline.sketch import hll_distinct

    vals = [i * 3 for i in range(500)]
    df = spark.createDataFrame([("g", v) for v in vals], "g STRING, v LONG")
    got = hll_distinct(df, ["g"], "v", b=6).collect()[0]
    m = 64
    regs = {}
    for v in set(vals):
        h = int(hashlib.md5(f"7:{v}".encode()).hexdigest()[:15], 16)
        b, w = h % m, (h // m) % (1 << 52)
        rho = 53 if w == 0 else 53 - w.bit_length()
        regs[b] = max(regs.get(b, 0), rho)
    s = sum(2.0 ** -r for r in regs.values()) + (m - len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    e = alpha * m * m / s
    if e <= 2.5 * m and m - len(regs) > 0:
        e = float(m) * math.log(float(m) / (m - len(regs)))
    assert got.hll_estimate == round(e, 6)


def test_hashed_logreg_learns_separable_text(spark):
    from pyspark.sql import functions as F

    from credigraph_spark.pipeline.classify import hashed_text_logreg

    # two disjoint vocabularies: positive docs repeat 'alpha beta',
    # negative docs 'gamma delta' — after GD the buckets that 'alpha'
    # and the 'alpha_beta' bigram hash to must carry positive weight,
    # the gamma-side buckets negative weight
    rows = ([(i, "alpha beta alpha beta alpha", "en") for i in range(20)]
            + [(100 + i, "gamma delta gamma delta gamma", "fr")
               for i in range(20)])
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")
    w = {r.bucket: r.w for r in hashed_text_logreg(
        docs, label=F.col("lang") == "en", n_buckets=16,
        iters=8, lr=2.0).collect()}
    import hashlib

    def bucket(feat):
        return int(hashlib.md5(feat.encode()).hexdigest()[:8], 16) % 16

    pos = {bucket(f) for f in ("alpha", "beta", "alpha_beta", "beta_alpha")}
    neg = {bucket(f) for f in ("gamma", "delta", "gamma_delta",
                               "delta_gamma")}
    assert all(w[b] > 0 for b in pos - neg)
    assert all(w[b] < 0 for b in neg - pos)
    # untouched buckets stay exactly zero; intercept row present
    untouched = set(range(16)) - pos - neg
    assert all(w[b] == 0.0 for b in untouched)
    assert -1 in w


def test_hashed_logreg_python_differential(spark):
    import hashlib
    import math

    from pyspark.sql import functions as F

    from credigraph_spark.pipeline.classify import hashed_text_logreg

    rows = [(i, ["w%d" % (i % 5), "w%d" % (i % 3), "zz"][i % 3] + " tail",
             "en" if i % 2 == 0 else "de") for i in range(12)]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")
    nb, iters, lr = 8, 3, 0.5
    got = {r.bucket: r.w for r in hashed_text_logreg(
        docs, label=F.col("lang") == "en", n_buckets=nb,
        iters=iters, lr=lr).collect()}

    def bucket(feat):
        return int(hashlib.md5(feat.encode()).hexdigest()[:8], 16) % nb

    # replicate: tokenization, bigrams, hashed L1-normalized tf
    xs, ys = [], []
    for _, text, lang in rows:
        toks = [t for t in
                __import__("re").split(r"[^a-z0-9']+", text.lower()) if t]
        feats = toks + [a + "_" + b for a, b in zip(toks, toks[1:])]
        tf = {}
        for f in feats:
            tf[bucket(f)] = tf.get(bucket(f), 0) + 1
        n_f = sum(tf.values())
        xs.append({b: round(c / n_f, 6) for b, c in tf.items()})
        ys.append(1.0 if lang == "en" else 0.0)
    n = len(rows)
    w = [0.0] * nb
    b0 = 0.0
    for _ in range(iters):
        zs = [round(b0 + sum(math.floor(x * w[j] * 1e9)
                             for j, x in d.items()) / 1e9, 6)
              for d in xs]
        rs = [1.0 / (1.0 + math.exp(-z)) - y for z, y in zip(zs, ys)]
        gb = round(sum(math.floor(r * 1e9) for r in rs) / (1e9 * n), 6)
        gw = [round(sum(math.floor(d[j] * r * 1e9)
                        for d, r in zip(xs, rs) if j in d) / (1e9 * n), 6)
              for j in range(nb)]
        w = [round(w[j] - lr * gw[j], 7) for j in range(nb)]
        b0 = round(b0 - lr * gb, 7)
    assert got[-1] == b0
    assert all(got[j] == w[j] for j in range(nb))


def test_dcsbm_loglik_two_blocks_hand(spark):
    import math

    from credigraph_spark.analytics import dcsbm_loglik

    # two triangles joined by one bridge: blocks A={1,2,3}, B={4,5,6}
    # kappa_A = kappa_B = 7, m_AA = m_BB = 6 (=2*intra), m_AB = 1
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "src LONG, dst LONG")
    labels = spark.createDataFrame(
        [(v, "A") for v in (1, 2, 3)] + [(v, "B") for v in (4, 5, 6)],
        "vid LONG, label STRING")
    row = dcsbm_loglik(edges, labels).collect()[0]
    assert row.n_edges == 7
    assert row.n_blocks == 2
    # unordered-pair terms with the same 1e-9 quantization
    terms = [2 * 3 * (math.log(6.0) - 2 * math.log(7.0)),   # AA diag
             2 * 3 * (math.log(6.0) - 2 * math.log(7.0)),   # BB diag
             2 * 1 * (math.log(1.0) - 2 * math.log(7.0))]   # AB pair
    want = round(sum(math.floor(t * 1e9) for t in terms) / 1e9, 6)
    assert row.dcsbm_ll == want


def test_dcsbm_prefers_true_blocks_over_merged(spark):
    from pyspark.sql import functions as F  # noqa: F401

    from credigraph_spark.analytics import dcsbm_loglik

    # the DC-SBM likelihood of the true 2-block split must beat the
    # all-one-block labeling on a graph with clear block structure
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "src LONG, dst LONG")
    true_lab = spark.createDataFrame(
        [(v, "A") for v in (1, 2, 3)] + [(v, "B") for v in (4, 5, 6)],
        "vid LONG, label STRING")
    one_lab = spark.createDataFrame(
        [(v, "X") for v in range(1, 7)], "vid LONG, label STRING")
    l_true = dcsbm_loglik(edges, true_lab).collect()[0].dcsbm_ll
    l_one = dcsbm_loglik(edges, one_lab).collect()[0].dcsbm_ll
    assert l_true > l_one


def test_incremental_triangles_hand_and_invariant(spark):
    from credigraph_spark.graph.triangles import (incremental_triangles,
                                                  triangle_count)

    # base: square 1-2-3-4 plus chord (1,3) -> 2 triangles
    base = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 4), (1, 3)], "src LONG, dst LONG")
    # delta: chord (2,4) closes 2 NEW triangles (1-2-4, 2-3-4) each
    # using exactly 1 new edge; plus new vertex edge (4,5),(3,5) -> one
    # triangle 3-4-5 using 2 new edges; (1,2) is a duplicate of base
    delta = spark.createDataFrame(
        [(2, 4), (4, 5), (3, 5), (1, 2)], "src LONG, dst LONG")
    row = incremental_triangles(base, delta).collect()[0]
    assert row.n_base_edges == 5
    assert row.n_new_edges == 3          # (1,2) dropped as existing
    assert row.tri_1new == 2             # 1-2-4 and 2-3-4
    assert row.tri_2new == 1             # 3-4-5
    assert row.tri_3new == 0
    assert row.new_triangles == 3
    # invariant: triangles(base ∪ delta) = triangles(base) + new
    _, t_base = triangle_count(base)
    _, t_union = triangle_count(base.unionByName(delta))
    assert t_union == t_base + row.new_triangles


def test_incremental_triangles_all_new_graph(spark):
    from credigraph_spark.graph.triangles import incremental_triangles

    base = spark.createDataFrame([], "src LONG, dst LONG")
    delta = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3)], "src LONG, dst LONG")
    row = incremental_triangles(base, delta).collect()[0]
    assert (row.tri_3new, row.new_triangles) == (1, 1)
    assert row.tri_1new == row.tri_2new == 0


def test_mixture_weights_math_and_invariants(spark):
    import math

    from credigraph_spark.pipeline.sampling import mixture_weights

    # source A: 4 tokens x 2 docs = 8; source B: 2 tokens x 1 doc = 2
    docs = spark.createDataFrame(
        [(1, "a b c d", "A"), (2, "e f g h", "A"), (3, "i j", "B")],
        "doc_id LONG, text STRING, source STRING")
    rows = {r.source: r for r in mixture_weights(
        docs, budget_tokens=100).collect()}
    sw = (math.floor(math.sqrt(8.0) * 1e9)
          + math.floor(math.sqrt(2.0) * 1e9)) / 1e9
    pa = round(math.sqrt(8.0) / sw, 8)
    pb = round(math.sqrt(2.0) / sw, 8)
    assert rows["A"].n_tokens == 8 and rows["B"].n_tokens == 2
    assert rows["A"].p_sample == pa and rows["B"].p_sample == pb
    assert rows["A"].epochs == round(100.0 * pa / 8.0, 6)
    assert rows["B"].epochs == round(100.0 * pb / 2.0, 6)
    # temperature sampling UP-boosts the small source, down the big one
    assert rows["B"].boost > 1.0 > rows["A"].boost
    # probabilities sum to ~1
    assert abs(pa + pb - 1.0) < 1e-6


def test_egonet_anomaly_python_differential(spark):
    import math

    from credigraph_spark.graph.triangles import egonet_anomaly

    # K4 clique + a 4-leaf star + a path, one graph
    E = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),      # K4
         (10, 11), (10, 12), (10, 13), (10, 14),              # star
         (20, 21), (21, 22), (22, 23)]                        # path
    edges = spark.createDataFrame(E, "src LONG, dst LONG")
    got = {r.vid: r for r in egonet_anomaly(edges, top_k=100).collect()}

    adj = {}
    for u, v in E:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    pts = []
    for v, ns in adj.items():
        t = sum(len(ns & adj[w]) for w in ns) // 2
        n, e = len(ns), len(ns) + t
        pts.append((v, n, e, math.log(n), math.log(e)))
    m = float(len(pts))

    def qs(vals):
        return sum(math.floor(x * 1e9) for x in vals) / 1e9

    sx, sy = qs([p[3] for p in pts]), qs([p[4] for p in pts])
    sxy = qs([p[3] * p[4] for p in pts])
    sxx = qs([p[3] * p[3] for p in pts])
    theta = (m * sxy - sx * sy) / (m * sxx - sx * sx)
    c = (sy - theta * sx) / m
    for v, n, e, x, y in pts:
        r = got[v]
        assert (r.n, r.e) == (n, e)
        assert r.resid == round(abs(y - (c + theta * x)), 6)


def test_egonet_anomaly_flags_clique_and_star(spark):
    from credigraph_spark.graph.triangles import egonet_anomaly

    # background: long path (e = n exactly for inner vertices); planted:
    # a K5 near-clique. Clique members (above the fitted line) and the
    # two degree-1 path ENDPOINTS (below it) are the only off-line
    # points, so the top-7 is exactly those; every inner path vertex
    # must score strictly lower than every clique member
    E = [(i, i + 1) for i in range(100, 140)]
    clique = [(a, b) for a in range(1, 6) for b in range(1, 6) if a < b]
    edges = spark.createDataFrame(E + clique, "src LONG, dst LONG")
    rows = egonet_anomaly(edges, top_k=100).collect()
    top7 = {r.vid for r in rows[:7]}
    assert top7 == set(range(1, 6)) | {100, 140}
    resid = {r.vid: r.resid for r in rows}
    inner_max = max(v for k, v in resid.items() if 100 < k < 140)
    assert all(resid[v] > inner_max for v in range(1, 6))


def test_egonet_anomaly_degenerate_regular_graph(spark):
    from credigraph_spark.graph.triangles import egonet_anomaly

    # 6-cycle: every vertex has n=2, e=2 — ndist==1 branch, theta=0,
    # residuals all 0 (no NaN/crash)
    E = [(i, (i + 1) % 6) for i in range(6)]
    edges = spark.createDataFrame(E, "src LONG, dst LONG")
    rows = egonet_anomaly(edges, top_k=10).collect()
    assert len(rows) == 6
    assert all(r.resid == 0.0 for r in rows)


def test_knn_graph_mutual_flags_consistent(spark):
    from credigraph_spark.pipeline.similarity import knn_graph

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet") \
        .selectExpr("vec_id", "cast(embedding as array<double>) embedding")
    rows = knn_graph(emb, k=3).collect()
    pairs = {(r.u, r.v) for r in rows}
    for r in rows:
        # mutual iff the reverse directed edge is in the graph
        assert r.mutual == ((r.v, r.u) in pairs)
    # every query contributes at most k rows with ranks 1..k
    from collections import Counter
    per_u = Counter(r.u for r in rows)
    assert max(per_u.values()) <= 3
    ranks = {}
    for r in rows:
        ranks.setdefault(r.u, []).append(r.rank)
    assert all(sorted(v) == list(range(1, len(v) + 1))
               for v in ranks.values())


def test_semdedup_drops_planted_duplicates(spark):
    from credigraph_spark.pipeline.similarity import semdedup

    base = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").selectExpr(
        "vec_id", "cast(embedding as array<double>) embedding").limit(30)
    # plant exact duplicates of vectors 0,1 under new larger ids
    dups = base.where("vec_id < 2").selectExpr(
        "vec_id + 100000 as vec_id", "embedding")
    out = {r.vec_id: r for r in semdedup(
        base.unionByName(dups), k=4, iters=1, threshold=0.99).collect()}
    # exact copies share the cluster of their original and are dropped
    # (they carry the larger id); the originals stay kept
    for v in (0, 1):
        if v in out and v + 100000 in out:
            assert out[v + 100000].cluster == out[v].cluster
            assert out[v + 100000].keep is False
            assert out[v].keep is True
    # nothing outside the planted pair is affected at threshold 0.99
    assert sum(1 for r in out.values() if not r.keep) == 2


def test_pack_shards_offsets_and_partition_invariance(spark):
    from credigraph_spark.pipeline.sampling import pack_shards

    rows = [(i, " ".join("tok%d" % j for j in range(i % 5 + 1)))
            for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    got = {r.doc_id: r for r in pack_shards(docs, budget_tokens=7,
                                            num_ranges=8).collect()}
    # replicate: sequential cumsum in doc_id order
    off = 0
    for i in range(40):
        n = i % 5 + 1
        r = got[i]
        assert (r.n_tokens, r.offset, r.shard) == (n, off, off // 7)
        off += n
    # invariance: a different range-partitioning yields identical output
    got2 = {r.doc_id: (r.offset, r.shard) for r in pack_shards(
        docs.repartition(3), budget_tokens=7, num_ranges=2).collect()}
    assert got2 == {k: (v.offset, v.shard) for k, v in got.items()}


def test_collective_influence_hand_star_path(spark):
    from credigraph_spark.graph.spreading import collective_influence

    # path 1-2-3-4-5: CI(1)=(1-1)*...=0; CI(2)=(2-1)*((k4-1))=1*1=1
    # (2-hop shell of 2 is {4}, k4=2); CI(3)=(2-1)*((k1-1)+(k5-1))=0
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src LONG, dst LONG")
    got = {r.vid: r.ci for r in collective_influence(edges).collect()}
    assert got == {1: 0, 2: 1, 3: 0, 4: 1, 5: 0}


def test_collective_influence_networkx_free_differential(spark):
    from credigraph_spark.graph.spreading import collective_influence

    E = [(i % 13, (i * 7) % 17 + 20) for i in range(60)]
    edges = spark.createDataFrame(E, "src LONG, dst LONG")
    got = {r.vid: (r.deg, r.ci)
           for r in collective_influence(edges).collect()}
    adj = {}
    for u, v in set(E):
        if u == v:
            continue
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    for i, ns in adj.items():
        shell = set()
        for v in ns:
            shell |= adj[v]
        shell -= ns | {i}
        ci = (len(ns) - 1) * sum(len(adj[w]) - 1 for w in shell)
        assert got[i] == (len(ns), ci)


def test_winnowing_guarantee_shared_run(spark):
    from credigraph_spark.pipeline.textstats import winnowing_pairs

    # docs 1 and 2 share a 12-token run (>= w+k-1 = 7 tokens), so the
    # winnowing guarantee says they MUST share a fingerprint; doc 3 is
    # disjoint and must not pair with either above chance
    run = "alpha beta gamma delta epsilon zeta eta theta iota kappa " \
          "lambda mu"
    docs = spark.createDataFrame(
        [(1, "start one two " + run),
         (2, run + " tail other words here"),
         (3, "completely different tokens nothing in common at all "
             "none whatsoever really")],
        "doc_id LONG, text STRING")
    rows = winnowing_pairs(docs, k=4, w=4, max_doc_freq=10, top=50) \
        .collect()
    pairs = {(r.doc_a, r.doc_b): r.shared for r in rows}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_winnowing_doc_freq_cap_drops_boilerplate(spark):
    from credigraph_spark.pipeline.textstats import winnowing_pairs

    # the same boilerplate in 12 docs: with max_doc_freq=3 every
    # boilerplate fingerprint is dropped, so no pairs survive
    docs = spark.createDataFrame(
        [(i, "common boilerplate header repeated across many documents")
         for i in range(12)],
        "doc_id LONG, text STRING")
    assert winnowing_pairs(docs, k=4, w=4, max_doc_freq=3).count() == 0


def test_hyperball_harmonic_monotone_and_sane(spark):
    from credigraph_spark.graph.anf import hyperball_harmonic

    # directed path 1->2->3->4: ball sizes grow along the path; vertex 4
    # reaches nothing, so its counters never grow and harmonic ~ 0
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "src LONG, dst LONG")
    rows = {r.vid: r for r in hyperball_harmonic(
        edges, max_hops=3, num_registers=8).collect()}
    for r in rows.values():
        # counters are monotone under bit_or
        assert r.s_1 <= r.s_2 <= r.s_3
        assert r.harmonic >= 0.0
    sink = rows[4]
    assert sink.s_1 == sink.s_2 == sink.s_3
    assert sink.harmonic == 0.0
    # source 1 reaches strictly more than vertex 3 (reaches only 4)
    assert rows[1].s_3 >= rows[3].s_3


def test_hyperball_estimates_match_anf_totals(spark):
    from credigraph_spark.graph.anf import anf_sketch, hyperball_harmonic

    edges = spark.createDataFrame(
        [(i % 11, (i * 3) % 13 + 20) for i in range(40)],
        "src LONG, dst LONG")
    hb = hyperball_harmonic(edges, max_hops=2, num_registers=4).collect()
    per_hop, info = anf_sketch(edges, max_hops=2, num_registers=4)
    # per-vertex rho sums aggregate to exactly the anf_sketch totals
    for h in (1, 2):
        assert sum(getattr(r, f"s_{h}") for r in hb) == info["sum_rho"][h]


def test_wl_distinguishes_roles_on_path(spark):
    from credigraph_spark.graph.wl import wl_refinement

    # path 1-2-3-4-5-6: after enough rounds, positions symmetric about
    # the center share colors: {1,6}, {2,5}, {3,4} — three classes of 2
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)], "src LONG, dst LONG")
    rows = {r.vid: r for r in wl_refinement(edges, rounds=3).collect()}
    assert rows[1].color == rows[6].color
    assert rows[2].color == rows[5].color
    assert rows[3].color == rows[4].color
    assert len({rows[1].color, rows[2].color, rows[3].color}) == 3
    assert all(r.class_size == 2 for r in rows.values())


def test_wl_separates_nonisomorphic_neighborhoods(spark):
    from credigraph_spark.graph.wl import wl_refinement

    # triangle + path3: degree alone cannot separate the triangle's
    # vertices (deg 2) from the path's middle vertex (deg 2), but one
    # WL round can (neighbour colors differ)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (10, 11), (11, 12)],
        "src LONG, dst LONG")
    rows = {r.vid: r for r in wl_refinement(edges, rounds=2).collect()}
    tri_colors = {rows[v].color for v in (1, 2, 3)}
    assert len(tri_colors) == 1
    assert rows[11].color not in tri_colors
    # on a vertex-transitive graph (the triangle) the class is size 3
    assert rows[1].class_size == 3


def test_chain_contraction_hand_cases(spark):
    from credigraph_spark.graph.contraction_chain import chain_contraction

    # T1(1) - c(2) - c(3) - c(4) - T2(5): chain of 3 deg-2 vertices ->
    # super-edge (1,5,4); direct edge (1,10); pure 3-cycle 20-21-22
    # (all deg 2, no terminals) dropped; T1 and T2 get extra spokes so
    # they are NOT degree-2 themselves
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5),
         (1, 10), (1, 11), (5, 12), (5, 13),
         (20, 21), (21, 22), (20, 22)],
        "src LONG, dst LONG")
    got = {(r.src, r.dst): r.length
           for r in chain_contraction(edges).collect()}
    assert got[(1, 5)] == 4
    assert got[(1, 10)] == 1 and got[(1, 11)] == 1
    assert got[(5, 12)] == 1 and got[(5, 13)] == 1
    assert not any(s in (20, 21, 22) or d in (20, 21, 22)
                   for s, d in got)


def test_chain_contraction_parallel_min_and_singleton(spark):
    from credigraph_spark.graph.contraction_chain import chain_contraction

    # terminals 1 and 5 joined by a direct edge AND a 2-hop chain
    # through 3: parallel contracted edges keep MIN length (=1);
    # singleton chain 6 between 1 and 5... use separate terminals to
    # keep vertex degrees > 2 at the terminals
    edges = spark.createDataFrame(
        [(1, 5), (1, 3), (3, 5),           # direct + chain via 3
         (1, 7), (1, 8), (5, 9), (5, 10)],  # spokes
        "src LONG, dst LONG")
    got = {(r.src, r.dst): r.length
           for r in chain_contraction(edges).collect()}
    assert got[(1, 5)] == 1  # min(direct 1, chain 2)


def test_calibration_bins_hand_math(spark):
    from pyspark.sql import functions as F

    from credigraph_spark.pipeline.classify import calibration_bins

    # scores land in known bins; a perfectly calibrated score has
    # frac_pos == avg_score per bin
    rows = [(0.05, 0), (0.05, 0), (0.15, 0), (0.95, 1), (0.95, 1),
            (1.0, 1)]
    df = spark.createDataFrame(rows, "p DOUBLE, y LONG")
    got = {r.bin: r for r in calibration_bins(
        df, score=F.col("p"), label=F.col("y") == 1, n_bins=10).collect()}
    assert got[0].n == 2 and got[0].frac_pos == 0.0
    assert got[1].n == 1
    # score exactly 1.0 clamps into the top bin (index 9) with 0.95s
    assert got[9].n == 3 and got[9].frac_pos == 1.0
    import math
    want = round((math.floor(0.95 * 1e9) * 2 + math.floor(1.0 * 1e9))
                 / (1e9 * 3), 6)
    assert got[9].avg_score == want


def test_rmat_determinism_and_skew(spark):
    from collections import Counter

    from credigraph_spark.graph.generate import rmat_edges

    a = rmat_edges(spark, scale=7, n_edges=1000, seed=7).collect()
    b = rmat_edges(spark, scale=7, n_edges=1000, seed=7).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # vertices in range
    assert all(0 <= r.src < 128 and 0 <= r.dst < 128 for r in a)
    # R-MAT skew: the top source vertex owns far more than the uniform
    # share (1000/128 ~ 8); uniform Erdos-Renyi would almost never
    # exceed ~20
    deg = Counter(r.src for r in a)
    assert max(deg.values()) > 40
    # a different seed changes the edge multiset
    c = rmat_edges(spark, scale=7, n_edges=1000, seed=8).collect()
    assert sorted(map(tuple, a)) != sorted(map(tuple, c))


def test_truss_decomposition_levels(spark):
    from credigraph_spark.graph.triangles import truss_decomposition

    # K5 (trussness 4 with max_k=4... K5 edges survive 4-truss exactly:
    # support 3 >= 2) + a triangle hanging off (trussness 3) + a tail
    # edge in no triangle (trussness 2)
    k5 = [(a, b) for a in range(1, 6) for b in range(1, 6) if a < b]
    tri = [(5, 10), (5, 11), (10, 11)]
    tail = [(11, 20)]
    edges = spark.createDataFrame(k5 + tri + tail, "src LONG, dst LONG")
    got = {(r.src, r.dst): r.trussness
           for r in truss_decomposition(edges, max_k=5,
                                        rounds_per_level=4).collect()}
    for e in k5:
        assert got[e] == 5          # K5 = 5-truss (support 3 = 5-2)
    for e in tri:
        assert got[e] == 3          # triangle edges die at the 4-level
    assert got[(11, 20)] == 2       # no triangle: peeled at level 3
    # trussness is monotone under the peel order: every edge got a level
    assert len(got) == len(k5) + len(tri) + 1


def test_configuration_rewire_degree_mass_and_determinism(spark):
    from credigraph_spark.graph.generate import configuration_rewire

    E = [(i % 17, (i * 5) % 19 + 30) for i in range(80)]
    edges = spark.createDataFrame(E, "src LONG, dst LONG")
    r1 = sorted(map(tuple, configuration_rewire(edges, seed=7).collect()))
    r2 = sorted(map(tuple, configuration_rewire(edges, seed=7).collect()))
    assert r1 == r2                      # deterministic
    r3 = sorted(map(tuple, configuration_rewire(edges, seed=8).collect()))
    assert r1 != r3                      # seed changes the instance
    # pre-projection the pairing preserves degrees exactly; after
    # dropping self-pairs/dups the edge count can only shrink a little
    from credigraph_spark.graph.adjacency import undirected_simple
    m = undirected_simple(edges).count() // 2
    assert 0.8 * m <= len(r1) <= m
    # vertex set is preserved up to isolated-by-projection vertices
    orig_v = {v for e in E for v in e if e[0] != e[1]}
    new_v = {v for e in r1 for v in e}
    assert new_v <= orig_v


def test_multiprobe_recall_dominates_single_probe(spark):
    from credigraph_spark.pipeline.similarity import (
        ann_recall_at_k, cosine_topk_bruteforce, lsh_bucketed_topk,
        lsh_multiprobe_topk)

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet").selectExpr(
        "vec_id", "cast(embedding as array<double>) embedding")
    q = emb.where("vec_id < 8")
    exact = cosine_topk_bruteforce(q, emb, k=5)
    plain = lsh_bucketed_topk(q, emb, k=5, bits_per_table=6, n_tables=2,
                              round_digits=6)
    multi = lsh_multiprobe_topk(q, emb, k=5, bits_per_table=6, n_tables=2)

    def mean_recall(approx):
        rows = ann_recall_at_k(approx, exact, k=5).collect()
        return sum(r.recall for r in rows) / len(rows)

    # the probe set strictly contains the single-probe buckets, so
    # candidate sets are supersets -> recall can only go up
    assert mean_recall(multi) >= mean_recall(plain)
    # and the candidate-pair superset property holds exactly
    p_pairs = {(r.query_id, r.neighbor_id) for r in plain.collect()}
    m_all = lsh_multiprobe_topk(q, emb, k=1000, bits_per_table=6,
                                n_tables=2)
    m_pairs = {(r.query_id, r.neighbor_id) for r in m_all.collect()}
    assert p_pairs <= m_pairs


def test_snm_finds_adjacent_typos_and_windows(spark):
    from pyspark.sql import functions as F

    from credigraph_spark.pipeline.dedup import snm_candidate_pairs

    # near-identical records sort adjacently (typo deep in the string);
    # record 99 is lexicographically far and must not pair
    docs = spark.createDataFrame(
        [(1, "acme corporation ltd new york"),
         (2, "acme corporation ltd new yrok"),     # typo variant
         (3, "acme corporation llc new york"),
         (99, "zzz totally unrelated record here")],
        "doc_id LONG, text STRING")
    rows = snm_candidate_pairs(
        docs, sort_key=F.lower(F.substring("text", 1, 20)),
        window=3, min_sim=0.5).collect()
    pairs = {(r.doc_a, r.doc_b): r for r in rows}
    assert any({a, b} == {1, 2} for a, b in pairs)
    assert not any(99 in (a, b) for a, b in pairs)
    # levenshtein hand-check on the (1, 2) pair: 'yrok' vs 'york' = 2
    p12 = next(v for (a, b), v in pairs.items() if {a, b} == {1, 2})
    assert p12.dist == 2
    assert p12.sim == round(1.0 - 2 / 29.0, 6)


def test_snm_rank_partition_invariance(spark):
    from pyspark.sql import functions as F

    from credigraph_spark.pipeline.dedup import snm_candidate_pairs

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(60)
    key = F.lower(F.substring("text", 1, 20))
    a = {(r.doc_a, r.doc_b) for r in snm_candidate_pairs(
        docs, sort_key=key, window=4, num_ranges=2).collect()}
    b = {(r.doc_a, r.doc_b) for r in snm_candidate_pairs(
        docs.repartition(7), sort_key=key, window=4,
        num_ranges=16).collect()}
    assert a == b


def test_rrf_fuse_hand_math(spark):
    from credigraph_spark.pipeline.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)],
                              "doc_id LONG, rank LONG")
    b = spark.createDataFrame([(3, 1), (1, 2), (9, 3)],
                              "doc_id LONG, rank LONG")
    import math
    got = {r.doc_id: r for r in rrf_fuse([a, b], rrf_k=60,
                                         top=10).collect()}

    def q(*ranks):
        return round(sum(math.floor(1e9 / (60 + r))
                         for r in ranks) / 1e9, 6)

    assert got[1].rrf == q(1, 2) and got[1].n_lists == 2
    assert got[3].rrf == q(3, 1) and got[3].n_lists == 2
    assert got[2].rrf == q(2) and got[2].n_lists == 1
    assert got[9].rrf == q(3)
    # consensus docs (in both lists) out-rank single-list docs here
    order = sorted(got.values(), key=lambda r: (-r.rrf, r.doc_id))
    assert [r.doc_id for r in order[:2]] == [1, 3]


def test_lpa_init_labels_warm_start(spark):
    from credigraph_spark.graph import label_propagation

    # two triangles bridged by one edge; seed labels pre-assign the
    # left triangle to community 1 — a 1-round warm start keeps the
    # left side at 1 while the unseeded right side votes normally
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)],
        "src LONG, dst LONG")
    seed = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1)], "vid LONG, label LONG")
    labels, info = label_propagation(edges, init_labels=seed, max_iter=1)
    got = {r.vid: r.label for r in labels.collect()}
    assert got[1] == got[2] == 1
    # a vertex absent from the seed starts as itself: 5's neighbors are
    # {4, 6} with labels (4, 6) -> min tie-break elects 4
    assert got[5] == 4
    # identical to a cold run whose l0 was the seeded labeling — the
    # warm start is pure initialization, not a different algorithm
    labels2, _ = label_propagation(edges, init_labels=seed, max_iter=1)
    assert got == {r.vid: r.label for r in labels2.collect()}


def test_bloom_no_false_negatives_and_fp_rate(spark):
    from credigraph_spark.pipeline.sketch import (bloom_build,
                                                  bloom_filter_rows)

    members = spark.createDataFrame([(i,) for i in range(0, 500, 13)],
                                    "key LONG")
    bloom = bloom_build(members, "key", m_bits=1024, k_hashes=3)
    # exactly m/64 words always
    assert len(bloom.collect()[0].words) == 16
    big = spark.createDataFrame([(i,) for i in range(500)], "key LONG")
    out = {r.key for r in bloom_filter_rows(
        big, "key", bloom, m_bits=1024, k_hashes=3).collect()}
    mem = set(range(0, 500, 13))
    assert mem <= out                       # NO false negatives, ever
    # fp rate ~ (1 - e^{-kn/m})^k ~ 0.1% here; allow generous slack
    assert len(out - mem) <= 25
    # determinism: a rebuilt filter passes the identical set
    bloom2 = bloom_build(members, "key", m_bits=1024, k_hashes=3)
    out2 = {r.key for r in bloom_filter_rows(
        big, "key", bloom2, m_bits=1024, k_hashes=3).collect()}
    assert out == out2


def test_zorder_is_morton_curve_and_skips(spark):
    from credigraph_spark.store import zorder_key

    grid = spark.createDataFrame(
        [(x, y) for x in range(4) for y in range(4)], "x LONG, y LONG")
    rows = {(r.x, r.y): r.z for r in zorder_key(
        grid, ["x", "y"], bits=2).collect()}
    # the classic 4x4 Morton curve
    assert rows[(0, 0)] == 0 and rows[(0, 1)] == 1
    assert rows[(1, 0)] == 2 and rows[(1, 1)] == 3
    assert rows[(3, 3)] == 15
    assert sorted(rows.values()) == list(range(16))
    # locality: sorting by z, any contiguous quarter of the curve spans
    # at most half the x range AND half the y range (the file-skipping
    # property a 1-column sort lacks on its second column)
    order = sorted(rows.items(), key=lambda kv: kv[1])
    for q in range(4):
        quarter = [xy for xy, _ in order[q * 4:(q + 1) * 4]]
        assert max(p[0] for p in quarter) - min(p[0] for p in quarter) <= 1
        assert max(p[1] for p in quarter) - min(p[1] for p in quarter) <= 1


def test_filter_ablation_hand_math(spark):
    from credigraph_spark.pipeline.ablation import filter_ablation

    # 6 docs; filter A kills {1,2,3}, filter B kills {3,4}
    fa = spark.createDataFrame(
        [(i, i not in (1, 2, 3)) for i in range(6)],
        "doc_id LONG, keep BOOLEAN")
    fb = spark.createDataFrame(
        [(i, i not in (3, 4)) for i in range(6)],
        "doc_id LONG, keep BOOLEAN")
    rows = {(r.filter_a, r.filter_b): r for r in filter_ablation(
        {"a": fa, "b": fb}).collect()}
    assert rows[("a", "a")].killed_a == 3
    assert rows[("a", "a")].jaccard == 1.0
    assert rows[("b", "b")].killed_a == 2
    ab = rows[("a", "b")]
    assert (ab.killed_a, ab.killed_b, ab.killed_both) == (3, 2, 1)
    assert ab.jaccard == round(1 / 4, 6)
    # a filter that kills nothing: diagonal jaccard reads 0.0, not NaN
    fz = spark.createDataFrame([(i, True) for i in range(6)],
                               "doc_id LONG, keep BOOLEAN")
    z = {(r.filter_a, r.filter_b): r for r in filter_ablation(
        {"a": fa, "z": fz}).collect()}
    assert z[("z", "z")].killed_a == 0 and z[("z", "z")].jaccard == 0.0


def test_triad_census_all_seven_classes(spark):
    from credigraph_spark.graph.triads import triad_class_census as triad_census

    pairs = [
        # 030T: transitive triangle
        (1, 2), (2, 3), (1, 3),
        # 030C: cyclic triangle
        (11, 12), (12, 13), (13, 11),
        # 120D: mutual 21<->22, third node 23 receives from both
        (21, 22), (22, 21), (21, 23), (22, 23),
        # 120U: mutual 31<->32, third node 33 sends to both
        (31, 32), (32, 31), (33, 31), (33, 32),
        # 120C: mutual 41<->42, path through 43
        (41, 42), (42, 41), (41, 43), (43, 42),
        # 210: two mutual dyads
        (51, 52), (52, 51), (52, 53), (53, 52), (51, 53),
        # 300: all mutual
        (61, 62), (62, 61), (62, 63), (63, 62), (61, 63), (63, 61),
        # a dangling dyad: contributes no triad
        (71, 72),
    ]
    out = {r.triad_class: r.n
           for r in triad_census(edges_df(spark, pairs)).collect()}
    assert out == {"030T": 1, "030C": 1, "120D": 1, "120U": 1,
                   "120C": 1, "210": 1, "300": 1}


def test_triad_census_invariant_under_relabel(spark):
    from credigraph_spark.graph.triads import triad_class_census as triad_census

    base = [(1, 2), (2, 3), (1, 3), (3, 1)]  # one triangle, one mutual dyad
    # 120-family: mutual {1,3}, third node 2 has in=1 (1->2), out=1 (2->3)
    out = {r.triad_class: r.n
           for r in triad_census(edges_df(spark, base)).collect()}
    assert out["120C"] == 1 and sum(out.values()) == 1
    # relabel vertices arbitrarily: census must be identical
    relabeled = [(a * 97 % 1000, b * 97 % 1000) for a, b in base]
    out2 = {r.triad_class: r.n
            for r in triad_census(edges_df(spark, relabeled)).collect()}
    assert out2 == out


def test_dup_span_stats_hand_math(spark):
    from credigraph_spark.pipeline.dedup import dup_span_stats

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h"),            # shares 2 windows with doc 2
            (2, "x a b c d e f y"),
            (3, "p q r s t u p q r s t u"),    # within-doc repeat, adjacency
            (4, "short text"),                  # < k tokens: zero-filled
            (5, "m n o p q"),                   # one unique window: clean
        ],
        "doc_id LONG, text STRING")
    out = {r.doc_id: r for r in dup_span_stats(docs, k=5).collect()}
    assert len(out) == 5

    # docs 1/2: dup windows [1,5]+[2,6] (resp. [2,6]+[3,7]) merge to one
    # 6-token span out of 8 tokens
    for d in (1, 2):
        r = out[d]
        assert (r.n_tokens, r.n_dup_windows, r.n_spans, r.dup_tokens) == \
            (8, 2, 1, 6)
        assert r.dup_frac == round(6 / 8, 6)

    # doc 3: within-doc repetition; [1,6] and [7,12] are token-adjacent
    # and coalesce into one full-cover span
    r3 = out[3]
    assert (r3.n_tokens, r3.n_dup_windows, r3.n_spans, r3.dup_tokens) == \
        (12, 4, 1, 12)
    assert r3.dup_frac == 1.0

    # short + clean docs: zero-filled stats
    assert (out[4].n_tokens, out[4].n_dup_windows, out[4].dup_tokens) == \
        (2, 0, 0)
    assert (out[5].n_tokens, out[5].n_dup_windows, out[5].n_spans,
            out[5].dup_frac) == (5, 0, 0, 0.0)


def test_dag_levels_hand_math(spark):
    from credigraph_spark.graph.dag import dag_levels

    # oriented low->high the support becomes:
    # 1->2->3->4 (chain), 1->4 (shortcut), 5->6, isolated-pair 7->8
    pairs = [(1, 2), (3, 2), (3, 4), (4, 1), (5, 6), (8, 7)]
    lvl, rounds = dag_levels(edges_df(spark, pairs))
    out = {r.vid: r.level for r in lvl.collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 3, 5: 0, 6: 1, 7: 0, 8: 1}
    assert rounds == 4  # depth 3 + the fixpoint-confirming round


def test_dag_levels_horizon_cap(spark):
    from credigraph_spark.graph.dag import dag_levels

    chain = [(i, i + 1) for i in range(1, 8)]  # depth 7
    lvl, rounds = dag_levels(edges_df(spark, chain), max_rounds=3)
    out = {r.vid: r.level for r in lvl.collect()}
    assert rounds == 3
    # capped at horizon 3: level = min(true level, 3)
    assert out == {v: min(v - 1, 3) for v in range(1, 9)}


def test_closed_walk_census_path_and_triangle(spark):
    from credigraph_spark.graph.walks import closed_walk_census

    # path 1-2-3: A2 diag = (1,2,1); A4 diag = (2,4,2); no triangles
    out = {r.vid: r for r in
           closed_walk_census(edges_df(spark, [(1, 2), (2, 3)])).collect()}
    assert [(out[v].w2, out[v].w3, out[v].w4) for v in (1, 2, 3)] == \
        [(1, 0, 2), (2, 0, 4), (1, 0, 2)]
    assert out[2].sc4 == round(2 / 2 + 0 / 6 + 4 / 24, 6)

    # triangle: every vertex w2=2, w3=2 (one triangle, both directions),
    # w4 = sum of A2 row squares = 2^2 + 1 + 1 = 6
    tri = {r.vid: r for r in closed_walk_census(
        edges_df(spark, [(1, 2), (2, 3), (3, 1)])).collect()}
    for v in (1, 2, 3):
        assert (tri[v].w2, tri[v].w3, tri[v].w4) == (2, 2, 6)


def test_closed_walk_w3_is_twice_triangles(spark):
    from credigraph_spark.graph.triangles import triangle_count
    from credigraph_spark.graph.walks import closed_walk_census

    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3), (5, 6),
             (6, 1), (2, 6)]
    cw = {r.vid: r.w3 for r in
          closed_walk_census(edges_df(spark, pairs)).collect()}
    per_vertex, _ = triangle_count(edges_df(spark, pairs))
    tri = {r.vid: r.triangles for r in per_vertex.collect()}
    for v, t in tri.items():
        assert cw[v] == 2 * t


def test_label_assortativity_hand_math(spark):
    from credigraph_spark.graph.adjacency import undirected_simple

    # replicate the query's mixing math on a hand graph: two label
    # blocks {1,2,3}=A, {4,5,6}=B, dense within, one cross edge
    pairs = [(1, 2), (2, 3), (1, 3), (4, 5), (5, 6), (4, 6), (3, 4)]
    lab = {v: ("A" if v <= 3 else "B") for v in range(1, 7)}
    und = undirected_simple(edges_df(spark, pairs))
    rows = und.collect()
    from collections import Counter
    m = Counter((lab[r.src], lab[r.dst]) for r in rows)
    t = sum(m.values())            # 14 directed
    d = m[("A", "A")] + m[("B", "B")]  # 12
    row = Counter()
    for (a, _), n in m.items():
        row[a] += n
    s = sum(v * v for v in row.values())  # 7^2 + 7^2 = 98
    assert (t, d, s) == (14, 12, 98)
    num, den = t * d - s, t * t - s      # 70, 98
    assert round(num / den, 6) == round(70 / 98, 6)
    # near-perfect homophily: one cross edge keeps r just under 1
    assert 0.7 < num / den < 1.0


def test_threshold_percolation_hand_math(spark):
    from credigraph_spark.graph.components import threshold_percolation

    ew = spark.createDataFrame(
        [(1, 2, 3), (2, 3, 2), (3, 4, 1), (5, 6, 2)],
        "src LONG, dst LONG, w LONG")
    out = {r.threshold: r for r in
           threshold_percolation(ew, thresholds=(1, 2, 3)).collect()}
    assert (out[1].n_vertices, out[1].n_edges, out[1].n_components,
            out[1].giant_size) == (6, 4, 2, 4)
    assert (out[2].n_vertices, out[2].n_edges, out[2].n_components,
            out[2].giant_size) == (5, 3, 2, 3)
    assert (out[3].n_vertices, out[3].n_edges, out[3].n_components,
            out[3].giant_size) == (2, 1, 1, 2)


def test_k_anonymity_audit_hand_math(spark):
    from credigraph_spark.pipeline.safety import k_anonymity_audit

    rows = (
        # group (1, 'A'): 5 rows, 3 distinct sensitive -> safe at k=5
        [(1, "A", s) for s in (10, 10, 20, 30, 30)]
        # group (1, 'B'): 4 rows -> too small
        + [(1, "B", s) for s in (10, 20, 30, 40)]
        # group (2, 'A'): 6 rows but single sensitive value -> no diversity
        + [(2, "A", 7)] * 6
    )
    df = spark.createDataFrame(rows, "nat LONG, seg STRING, bal LONG")
    out = {(r.nat, r.seg): r for r in
           k_anonymity_audit(df, ["nat", "seg"], "bal", k=5).collect()}
    assert (out[(1, "A")].group_size, out[(1, "A")].l_diversity,
            out[(1, "A")].suppress) == (5, 3, False)
    assert (out[(1, "B")].group_size, out[(1, "B")].suppress) == (4, True)
    assert (out[(2, "A")].l_diversity, out[(2, "A")].suppress) == (1, True)


def test_leiden_refine_splits_disconnected_community(spark):
    from credigraph_spark.graph.louvain import leiden_connectivity_refine

    # community 1 is internally disconnected: {1,2,3} and {10,11};
    # community 2 is connected; community 3 is a single stranded vertex.
    edges = edges_df(spark, [(1, 2), (2, 3), (10, 11), (4, 5),
                             (3, 4), (11, 20)])  # cross-community edges too
    labels = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 1), (11, 1), (4, 2), (5, 2),
         (20, 3)],
        "vid LONG, community LONG")
    out = {r.vid: r for r in
           leiden_connectivity_refine(edges, labels).collect()}
    assert {out[v].refined_community for v in (1, 2, 3)} == {1}
    assert {out[v].refined_community for v in (10, 11)} == {10}
    assert all(out[v].n_parts == 2 for v in (1, 2, 3, 10, 11))
    assert out[4].refined_community == out[5].refined_community == 4
    assert out[4].n_parts == 1
    # stranded singleton keeps itself as its refined community
    assert (out[20].refined_community, out[20].n_parts) == (20, 1)


def test_scd2_compact_hand_math(spark):
    from credigraph_spark.temporal import scd2_compact

    rows = [
        # user 1: A A B A  -> three versions (A folds, then B, then A again)
        (1, 10, "A", 1), (1, 20, "A", 2), (1, 30, "B", 3), (1, 40, "A", 4),
        # user 2: single event -> one open version
        (2, 15, "X", 5),
        # user 3: same-ts tie broken by event_id: B(6) then A(7)
        (3, 50, "B", 6), (3, 50, "A", 7),
    ]
    df = spark.createDataFrame(
        rows, "uid LONG, ts LONG, val STRING, eid LONG")
    out = sorted(
        scd2_compact(df, "uid", "val", "ts", order_col="eid").collect(),
        key=lambda r: (r.uid, r.valid_from, r.valid_to is None,
                       r.valid_to or 0))
    u1 = [(r.val, r.valid_from, r.valid_to, r.n_rows)
          for r in out if r.uid == 1]
    assert u1 == [("A", 10, 30, 2), ("B", 30, 40, 1), ("A", 40, None, 1)]
    u2 = [(r.val, r.valid_from, r.valid_to) for r in out if r.uid == 2]
    assert u2 == [("X", 15, None)]
    u3 = [(r.val, r.valid_from, r.valid_to) for r in out if r.uid == 3]
    assert u3 == [("B", 50, 50), ("A", 50, None)]


def test_touch_attribution_hand_math(spark):
    from credigraph_spark.temporal import touch_attribution

    us = 1_000_000
    rows = [
        # user 1: view(10s) click(20s) purchase(30s) -> first=view last=click
        (1, 10 * us, "view", 1), (1, 20 * us, "click", 2),
        (1, 30 * us, "purchase", 3),
        # user 1 second purchase at 40s: touches now include all 2
        (1, 40 * us, "purchase", 4),
        # user 2: organic purchase (no touches)
        (2, 50 * us, "purchase", 5),
        # user 3: touch OUTSIDE the lookback window
        (3, 0, "view", 6), (3, 100 * us, "purchase", 7),
    ]
    ev = spark.createDataFrame(
        rows, "user_id LONG, ts_us LONG, event_type STRING, event_id LONG")
    out = {r.conversion_id: r for r in
           touch_attribution(ev, lookback_us=60 * us).collect()}
    p3 = out[3]
    assert (p3.first_type, p3.first_id, p3.last_type, p3.last_id,
            p3.n_touches) == ("view", 1, "click", 2, 2)
    p4 = out[4]
    assert (p4.first_id, p4.last_id, p4.n_touches) == (1, 2, 2)
    assert (out[5].first_ts, out[5].last_ts, out[5].n_touches) == \
        (None, None, 0)
    # 100s - 0s > 60s lookback: the old view does not attribute
    assert (out[7].first_ts, out[7].n_touches) == (None, 0)


def test_leiden_two_level_guarantees(spark):
    from collections import defaultdict

    from credigraph_spark.graph import louvain_local_move
    from credigraph_spark.graph.louvain import leiden_two_level

    # two cliques bridged by a chain + a barbell — enough structure for
    # phase 1 to form real communities
    pairs = ([(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
             + [(a, b) for a in range(10, 14) for b in range(a + 1, 14)]
             + [(4, 7), (7, 10), (2, 20), (20, 21), (21, 11)])
    edges = edges_df(spark, pairs)
    out = leiden_two_level(edges, rounds=2, coarse_rounds=1).collect()
    part_of = {r.vid: r.part for r in out}
    comm_of = {r.vid: r.community for r in out}

    # (a) parts sub-partition the phase-1 Louvain communities
    lv = {r.vid: r.community
          for r in louvain_local_move(edges, rounds=2).collect()}
    by_part = defaultdict(set)
    for v, p in part_of.items():
        by_part[p].add(lv[v])
    assert all(len(cs) == 1 for cs in by_part.values())

    # (b) the merge constraint: a final community never mixes parts of
    # different phase-1 communities
    by_comm = defaultdict(set)
    for v, c in comm_of.items():
        by_comm[c].add(lv[v])
    assert all(len(cs) == 1 for cs in by_comm.values())

    # (c) the Leiden guarantee: every final community is internally
    # connected (BFS over the community-induced subgraph)
    adj = defaultdict(set)
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    for c in set(comm_of.values()):
        members = {v for v, cc in comm_of.items() if cc == c}
        seen, todo = set(), [next(iter(members))]
        while todo:
            v = todo.pop()
            if v in seen:
                continue
            seen.add(v)
            todo += [n for n in adj[v] if n in members and n not in seen]
        assert seen == members, f"community {c} disconnected"


def test_profile_table_hand_math(spark):
    from credigraph_spark.pipeline.profiling import profile_table

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (2, None), (None, "b")],
        "k LONG, s STRING")
    out = {r.column: r for r in profile_table(df).collect()}
    assert (out["k"].n_rows, out["k"].n_nulls, out["k"].n_distinct,
            out["k"].min_str, out["k"].max_str) == (4, 1, 2, "1", "2")
    assert (out["s"].n_nulls, out["s"].n_distinct, out["s"].min_str,
            out["s"].max_str) == (1, 2, "a", "b")


def test_dq_checks_hand_math(spark):
    from credigraph_spark.pipeline.profiling import dq_checks

    child = spark.createDataFrame(
        [(1, 10, "O", 5.0), (1, 11, "O", -2.0), (2, 99, "X", 50.0),
         (3, None, "F", 20.0)],
        "id LONG, fk LONG, status STRING, amt DOUBLE")
    parent = spark.createDataFrame([(10,), (11,)], "pk LONG")
    out = {(r.check, r.column): r for r in dq_checks(
        child,
        unique=["id"],
        not_null=["fk"],
        ranges={"amt": (0.0, 100.0)},
        references={"fk": (parent, "pk")},
        accepted={"status": ["O", "F"]}).collect()}
    assert out[("unique", "id")].n_violations == 1          # id=1 twice
    assert out[("not_null", "fk")].n_violations == 1        # one null fk
    assert out[("range", "amt")].n_violations == 1          # -2.0
    assert out[("accepted_values", "status")].n_violations == 1  # 'X'
    r = out[("references", "fk")]
    assert (r.n_violations, bool(r.passed)) == (1, False)   # fk=99 orphan
    assert all(not r.passed for r in out.values())


def test_landmark_distances_hand_math(spark):
    from credigraph_spark.graph.nhop import landmark_distances

    # path graph 1-2-3-4-5 plus spur 1-6: landmarks {1,2,3}, sample all
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (1, 6)]
    out = {(r.u, r.v): r for r in landmark_distances(
        edges_df(spark, pairs), n_landmarks=3, n_sample=6,
        max_hops=4, directed=False).collect()}
    # landmark ON the shortest path -> exact: d(2,4) via L=3: 1+1=2
    assert out[(2, 4)].est_dist == 2
    # est is an upper bound and here exact via L=1: d(5,6)=d(5,1)+d(1,6)=5
    assert out[(5, 6)].est_dist == 5
    # d(4,5) via L=3: 1+2=3 (true 1 — upper bound, no landmark on path)
    assert out[(4, 5)].est_dist == 3
    assert out[(4, 5)].n_covering >= 1
    # every sampled pair present
    assert len(out) == 15


def test_scc_condensation_levels(spark):
    from credigraph_spark.graph import strongly_connected_components
    from credigraph_spark.graph.adjacency import clean_edges
    from credigraph_spark.graph.dag import dag_levels
    from pyspark.sql import functions as F

    # two 2-cycles chained through a singleton: {1,2} -> 3 -> {4,5}
    pairs = [(1, 2), (2, 1), (2, 3), (3, 4), (4, 5), (5, 4)]
    edges = edges_df(spark, pairs)
    labels, _ = strongly_connected_components(edges)
    lab = {r.vid: r.scc_id for r in labels.collect()}
    assert lab[1] == lab[2] and lab[4] == lab[5] and lab[3] not in \
        (lab[1], lab[4])
    ce = clean_edges(edges)
    qe = (ce.join(labels.select(F.col("vid").alias("src"),
                                F.col("scc_id").alias("cu")), "src")
          .join(labels.select(F.col("vid").alias("dst"),
                              F.col("scc_id").alias("cv")), "dst")
          .where(F.col("cu") != F.col("cv"))
          .select(F.col("cu").alias("src"), F.col("cv").alias("dst"))
          .distinct())
    lvl, rounds = dag_levels(qe, orient=False)
    out = {r.vid: r.level for r in lvl.collect()}
    # condensation chain SCC(1,2) -> SCC(3) -> SCC(4,5): levels 0,1,2
    assert out[lab[1]] == 0 and out[lab[3]] == 1 and out[lab[4]] == 2


def test_target_encode_hand_math(spark):
    from credigraph_spark.features import target_encode

    # cats: A 3 rows 2 pos; B 2 rows 0 pos. N=5, S=2, prior=0.4, m=10
    df = spark.createDataFrame(
        [("A", 1), ("A", 1), ("A", 0), ("B", 0), ("B", 0)],
        "cat STRING, y LONG")
    out = {r.cat: r for r in target_encode(df, "cat", "y", m=10).collect()}
    a, b = out["A"], out["B"]
    assert (a.n, a.pos, a.enc_num, a.enc_den) == (3, 2, 2 * 5 + 20, 5 * 13)
    assert a.enc == round(30 / 65, 6)
    assert (b.n, b.pos) == (2, 0)
    assert b.enc == round(20 / 60, 6)
    # shrinkage: both encodings pulled toward the 0.4 prior
    assert 2 / 3 > a.enc > 0.4 > b.enc > 0.0


def test_opic_cash_conservation_and_hand_math(spark):
    from credigraph_spark.graph.pagerank import opic

    # 1 -> 2 -> 3 (3 a dangling sink), 1 -> 3
    out = {r.vid: r for r in
           opic(edges_df(spark, [(1, 2), (2, 3), (1, 3)]), rounds=2)
           .collect()}
    third = 1 / 3
    # round 1: dang = c(3) = 1/3; c1(1)=dang/3, c1(2)=1/3/2+dang/3,
    # c1(3)=1/3/2+1/3+dang/3; h1 = 1/3 each
    d0 = third / 3
    c1 = {1: d0, 2: third / 2 + d0, 3: third / 2 + third + d0}
    assert abs(sum(c1.values()) - 1.0) < 1e-12  # cash conserved
    # round 2
    d1 = c1[3] / 3
    c2 = {1: d1, 2: c1[1] / 2 + d1, 3: c1[1] / 2 + c1[2] + d1}
    h2 = {v: third + c1[v] for v in (1, 2, 3)}
    for v in (1, 2, 3):
        assert out[v].cash == round(c2[v], 8)
        assert out[v].history == round(h2[v], 8)
    assert abs(sum(r.cash for r in out.values()) - 1.0) < 1e-6


def test_apportion_budget_hand_math(spark):
    from credigraph_spark.analytics import apportion_budget

    # weights 5,3,2 with budget 7: quotas 3.5/2.1/1.4 -> base 3,2,1
    # (sum 6); 1 leftover goes to the largest remainder (5*7%10=5)
    w = spark.createDataFrame([(1, 5), (2, 3), (3, 2)], "vid LONG, w LONG")
    out = {r.vid: r for r in apportion_budget(w, budget=7).collect()}
    assert {v: (out[v].base, out[v].extra, out[v].alloc)
            for v in (1, 2, 3)} == {1: (3, 1, 4), 2: (2, 0, 2),
                                    3: (1, 0, 1)}
    assert sum(r.alloc for r in out.values()) == 7

    # remainder tie broken by smaller id: weights 1,1 budget 3 ->
    # base 1,1; one leftover; equal remainders -> vid 1 wins
    w2 = spark.createDataFrame([(9, 1), (4, 1)], "vid LONG, w LONG")
    out2 = {r.vid: r.alloc for r in apportion_budget(w2, budget=3).collect()}
    assert out2 == {4: 2, 9: 1}


def test_partition_quality_hand_math(spark):
    from credigraph_spark.store import partition_quality

    # vids 0..7, chain edges: range placement at k=2 puts 0-3 | 4-7,
    # so only the 3-4 edge is cut; loads 4/4
    pairs = [(i, i + 1) for i in range(7)]
    out = {r.strategy: r for r in
           partition_quality(edges_df(spark, pairs), k=2).collect()}
    rg = out["range"]
    assert (rg.n_vertices, rg.n_edges, rg.n_cut) == (8, 7, 1)
    assert (rg.max_load, rg.min_load) == (4, 4)
    assert rg.cut_frac == round(1 / 7, 6)
    # hash placement exists and counts every edge exactly once
    h = out["hash"]
    assert h.n_edges == 7 and 0 <= h.n_cut <= 7
    assert h.max_load + h.min_load <= 8


def test_cdc_apply_hand_math(spark):
    from credigraph_spark.temporal import cdc_apply

    base = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (3, 30.0)], "k LONG, v DOUBLE")
    changes = spark.createDataFrame(
        [
            (1, "U", 5, 1, 11.0),   # update k=1
            (1, "U", 7, 2, 12.0),   # later update wins
            (2, "D", 6, 3, 0.0),    # delete k=2
            (4, "I", 8, 4, 40.0),   # insert new key
            (3, "D", 4, 5, 0.0),    # delete then re-insert: later wins
            (3, "I", 9, 6, 33.0),
        ],
        "k LONG, op STRING, ts LONG, seq LONG, v DOUBLE")
    out = {r.k: r for r in
           cdc_apply(base, changes, "k", ["v"], seq_col="seq").collect()}
    assert set(out) == {1, 3, 4}
    assert (out[1].v, out[1].last_op) == (12.0, "U")
    assert (out[3].v, out[3].last_op) == (33.0, "I")
    assert (out[4].v, out[4].last_op) == (40.0, "I")

    # same-ts tie broken by seq: seq 2 beats seq 1
    ch2 = spark.createDataFrame(
        [(1, "U", 5, 1, 100.0), (1, "U", 5, 2, 200.0)],
        "k LONG, op STRING, ts LONG, seq LONG, v DOUBLE")
    out2 = {r.k: r.v for r in
            cdc_apply(base, ch2, "k", ["v"], seq_col="seq").collect()}
    assert out2[1] == 200.0


def test_mrl_truncation_audit_properties(spark):
    from credigraph_spark.pipeline.similarity import mrl_truncation_audit

    # deterministic 8-dim vectors where the first 4 dims carry most
    # of the signal: full-dim recall must be recovered at d=8 (= full)
    import math
    rows = [(i, [math.sin(i * j + 1) for j in range(1, 9)])
            for i in range(1, 21)]
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    out = {r.dim: r for r in mrl_truncation_audit(
        emb, dims=(2, 8), k=5, n_queries=5).collect()}
    # d = full dimension: truncation is a no-op -> perfect recall
    assert out[8].recall == 1.0 and out[8].total_hits == 25
    # d=2 loses information: recall in [0, 1], integer hits consistent
    r2 = out[2]
    assert 0.0 <= r2.recall <= 1.0
    assert r2.total_hits == round(r2.recall * 25)
    assert (r2.n_queries, r2.k) == (5, 5)


def test_padding_waste_audit_hand_math(spark):
    from credigraph_spark.pipeline.sampling import padding_waste_audit

    # 4 docs with 1/10/1/10 whitespace tokens, batch_size=2.
    # arrival: batches (1,10),(1,10): waste (2*10-11)*2 = 18
    # sorted:  batches (1,1),(10,10): waste 0
    docs = spark.createDataFrame(
        [(1, "a"), (2, " ".join(["w"] * 10)), (3, "b"),
         (4, " ".join(["v"] * 10))],
        "doc_id LONG, text STRING")
    out = {r.policy: r for r in
           padding_waste_audit(docs, batch_size=2).collect()}
    arr, srt = out["arrival"], out["length_sorted"]
    assert (arr.n_docs, arr.n_batches, arr.total_tokens) == (4, 2, 22)
    assert arr.padded_tokens == 18
    assert arr.waste_frac == round(18 / 40, 6)
    assert (srt.padded_tokens, srt.waste_frac) == (0, 0.0)


def test_dup_flow_matrix_semantics(spark):
    from pyspark.sql import functions as F

    from credigraph_spark.pipeline import lsh_candidate_pairs

    # identical texts across sources A/B plus an A-internal duplicate
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog", "A"),
         (2, "the quick brown fox jumps over the lazy dog", "B"),
         (3, "the quick brown fox jumps over the lazy dog", "A"),
         (4, "completely different text about spark engines here", "B")],
        "doc_id LONG, text STRING, source STRING")
    pairs = lsh_candidate_pairs(docs, num_hashes=4, rows_per_band=2)
    src = docs.select("doc_id", "source")
    j = (pairs
         .join(src.select(F.col("doc_id").alias("id_a"),
                          F.col("source").alias("sa")), "id_a")
         .join(src.select(F.col("doc_id").alias("id_b"),
                          F.col("source").alias("sb")), "id_b")
         .select(F.least("sa", "sb").alias("a"),
                 F.greatest("sa", "sb").alias("b"))
         .groupBy("a", "b").agg(F.count("*").alias("n")))
    out = {(r.a, r.b): r.n for r in j.collect()}
    # pairs (1,2),(1,3),(2,3): one A-A and two A-B; doc 4 pairs nowhere
    assert out == {("A", "A"): 1, ("A", "B"): 2}


def test_path_trigrams_hand_math(spark):
    from credigraph_spark.temporal import path_trigrams

    rows = [
        # user 1: A B C A B C -> trigrams ABC, BCA, CAB, ABC
        (1, 1, "A", 1), (1, 2, "B", 2), (1, 3, "C", 3),
        (1, 4, "A", 4), (1, 5, "B", 5), (1, 6, "C", 6),
        # user 2: A B C (never crosses users)
        (2, 1, "A", 7), (2, 2, "B", 8), (2, 3, "C", 9),
        # user 3: too short for a trigram
        (3, 1, "Z", 10), (3, 2, "Z", 11),
    ]
    ev = spark.createDataFrame(
        rows, "user_id LONG, ts LONG, event_type STRING, event_id LONG")
    out = {(r.step1, r.step2, r.step3): r.n
           for r in path_trigrams(ev, k=10).collect()}
    assert out == {("A", "B", "C"): 3, ("B", "C", "A"): 1,
                   ("C", "A", "B"): 1}


def test_wl_quotient_star_roles(spark):
    from credigraph_spark.graph.wl import wl_quotient

    # two identical 3-star centers + leaves: WL yields 2 roles
    # (center, leaf); quotient = 1 role-pair with 6 edges
    pairs = [(1, 2), (1, 3), (1, 4), (10, 11), (10, 12), (10, 13)]
    out = wl_quotient(edges_df(spark, pairs), rounds=3).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_edges == 6
    assert {r.size_a, r.size_b} == {2, 6}  # 2 centers, 6 leaves
    assert r.color_a != r.color_b


def test_wl_quotient_preserves_edge_total(spark):
    from credigraph_spark.graph.wl import wl_quotient

    pairs = [(1, 2), (2, 3), (3, 4), (4, 1), (1, 3), (2, 5)]
    out = wl_quotient(edges_df(spark, pairs), rounds=2).collect()
    assert sum(r.n_edges for r in out) == 6  # every edge counted once


def test_retrieval_eval_hand_math(spark):
    from credigraph_spark.pipeline.retrieval import retrieval_eval

    docs = spark.createDataFrame(
        [(1, "spark spark spark engine"),     # tf(spark)=3 -> relevant
         (2, "spark engine"),                 # tf=1 -> not relevant
         (3, "spark spark spark spark data"), # tf=4 -> relevant
         (4, "nothing to see here"),
         (5, "query query query query")],     # relevant for 'query'
        "doc_id LONG, text STRING")
    out = {r.term: r for r in retrieval_eval(
        docs, ["spark", "query", "absent"], n_docs=5, k=3).collect()}
    s = out["spark"]
    # docs 1 and 3 are relevant; both rank in the top 3 (doc 2 lower tf)
    assert (s.n_relevant, s.hits_at_k, s.first_rel_rank) == (2, 2, 1)
    assert s.rr == 1.0
    q = out["query"]
    assert (q.n_relevant, q.hits_at_k, q.first_rel_rank, q.rr) == \
        (1, 1, 1, 1.0)
    a = out["absent"]
    assert (a.n_relevant, a.hits_at_k, a.first_rel_rank, a.rr) == \
        (0, 0, 0, 0.0)


def test_ivf_nprobe_sweep_monotone_to_exact(spark):
    import math

    from credigraph_spark.pipeline.ivf import ivf_nprobe_sweep

    rows = [(i, [math.cos(i * j + 0.5) for j in range(1, 9)])
            for i in range(1, 41)]
    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    out = {r.nprobe: r for r in ivf_nprobe_sweep(
        emb.where("vec_id <= 4"), emb, nprobes=(1, 4), k=3,
        n_lists=4, seed=7).collect()}
    # probing every list IS the exact search: recall must be 1.0
    assert out[4].recall == 1.0 and out[4].total_hits == 12
    # fewer probes can only lose candidates
    assert out[1].total_hits <= out[4].total_hits
    assert 0.0 <= out[1].recall <= 1.0


def test_psi_drift_hand_math(spark):
    import math

    from credigraph_spark.analytics import psi_drift

    # reference uniform over [0, 10); current shifted up
    ref = spark.createDataFrame([(float(i),) for i in range(10)],
                                "v DOUBLE")
    cur = spark.createDataFrame(
        [(float(9),)] * 5 + [(float(0),)] * 5, "v DOUBLE")
    out = {r.bin: r for r in psi_drift(ref, cur, "v", n_bins=2).collect()}
    # ref: 5 in [0,4.5), 5 in [4.5,9]; cur: 5 at 0 (bin 0), 5 at 9 (bin 1)
    assert (out[0].n_ref, out[0].n_cur) == (5, 5)
    assert (out[1].n_ref, out[1].n_cur) == (5, 5)
    # identical proportions -> zero drift
    assert all(r.psi_contrib == 0.0 for r in out.values())

    cur2 = spark.createDataFrame([(float(9),)] * 10, "v DOUBLE")
    out2 = {r.bin: r for r in psi_drift(ref, cur2, "v",
                                        n_bins=2).collect()}
    # all current mass in bin 1: contrib_1 = (1-.5)*ln(1/.5)
    assert out2[1].psi_contrib == round(0.5 * math.log(2), 6)
    # empty current bin floors at eps
    assert out2[0].p_cur == round(1e-6, 6)
    assert out2[0].psi_contrib > 0  # (eps-.5)*ln(eps/.5) is positive


def test_lang_confusion_compose(spark):
    from pyspark.sql import functions as F

    from credigraph_spark.pipeline import language_id

    docs = spark.createDataFrame(
        [(1, "the and of to in the and", "en"),
         (2, "le la et les des le la", "fr"),
         (3, "zzz qqq xxx", "en")],      # no stopword hits -> 'und'
        "doc_id LONG, text STRING, lang STRING")
    pred = language_id(docs).select("doc_id", "lang_pred")
    m = {(r.lang, r.lang_pred): 1 for r in
         docs.join(pred, "doc_id").select("lang", "lang_pred").collect()}
    assert ("en", "en") in m and ("fr", "fr") in m and ("en", "und") in m


# ---------------------------------------------------------------------------
# X225 Fellegi-Sunter record linkage
# ---------------------------------------------------------------------------

def test_fs_linkage_hand_math(spark):
    from credigraph_spark.pipeline.linkage import fs_match_weights, fs_weights

    rows = [(1, "b1", 1), (2, "b1", 1), (3, "b1", 2), (4, "b1", 2),
            (5, "b2", 1)]  # id 5 in its own block: no pairs
    df = spark.createDataFrame(rows, "id LONG, blk STRING, f LONG")
    out = fs_match_weights(
        df, "id", ["blk"], [("f", F.col("f"), 0.9, 0.1)], top_k=10
    ).collect()
    wa, wd = fs_weights(0.9, 0.1)
    assert wa == math.log2(0.9 / 0.1)
    assert wd == math.log2((1 - 0.9) / (1 - 0.1))
    assert abs(wa - math.log2(9)) < 1e-12 and abs(wd + math.log2(9)) < 1e-12
    # C(4,2)=6 pairs inside b1, none touching id 5
    assert len(out) == 6
    assert all(5 not in (r.id_a, r.id_b) for r in out)
    # agreements first (weight desc), ties by (id_a, id_b)
    assert [(r.id_a, r.id_b) for r in out[:2]] == [(1, 2), (3, 4)]
    assert out[0].weight == round(wa, 6) and out[0].pattern == "1"
    assert out[0].agree_f is True
    assert [(r.id_a, r.id_b) for r in out[2:]] == [
        (1, 3), (1, 4), (2, 3), (2, 4)]
    assert all(r.weight == round(wd, 6) and r.pattern == "0"
               for r in out[2:])


def test_fs_linkage_null_safe_and_multi_field(spark):
    from credigraph_spark.pipeline.linkage import fs_match_weights, fs_weights

    rows = [(1, None, 7), (2, None, 8), (3, 4, 7)]
    df = spark.createDataFrame(rows, "id LONG, f1 INT, f2 LONG")
    out = {(r.id_a, r.id_b): r for r in fs_match_weights(
        df, "id", [], [("f1", F.col("f1") + 0, 0.8, 0.2),
                       ("f2", F.col("f2"), 0.9, 0.3)], top_k=10,
    ).collect()}
    # blockless join still yields all C(3,2) pairs
    assert len(out) == 3
    w1a, w1d = fs_weights(0.8, 0.2)
    w2a, w2d = fs_weights(0.9, 0.3)
    # (1,2): both f1 NULL -> null-safe agree; f2 disagrees
    assert out[(1, 2)].pattern == "10"
    assert out[(1, 2)].weight == round(w1a + w2d, 6)
    # (1,3): f1 NULL vs 4 -> disagree; f2 agrees
    assert out[(1, 3)].pattern == "01"
    assert out[(1, 3)].weight == round(w1d + w2a, 6)


# ---------------------------------------------------------------------------
# X226 IPF / raking
# ---------------------------------------------------------------------------

def test_ipf_rake_differential(spark):
    from credigraph_spark.analytics import ipf_rake

    # counts: r1=(1,3), r2=(2,2) -> total 8, targets row 4, col 4
    rows = ([("r1", "c1")] * 1 + [("r1", "c2")] * 3
            + [("r2", "c1")] * 2 + [("r2", "c2")] * 2)
    df = spark.createDataFrame(rows, "src STRING, lng STRING")
    out = {(r.src, r.lng): r for r in
           ipf_rake(df, "src", "lng", rounds=3).collect()}

    # pure-Python replay of the same sweeps
    w = {("r1", "c1"): 1.0, ("r1", "c2"): 3.0,
         ("r2", "c1"): 2.0, ("r2", "c2"): 2.0}
    for _ in range(3):
        for r in ("r1", "r2"):
            s = w[(r, "c1")] + w[(r, "c2")]
            for c in ("c1", "c2"):
                w[(r, c)] = w[(r, c)] * (8.0 / 2.0) / s
        for c in ("c1", "c2"):
            s = w[("r1", c)] + w[("r2", c)]
            for r in ("r1", "r2"):
                w[(r, c)] = w[(r, c)] * (8.0 / 2.0) / s
    for k, v in w.items():
        assert out[k].w_fit == pytest.approx(v, abs=2e-8)
    # after the final column sweep, column sums hit the target exactly
    assert (out[("r1", "c1")].w_fit + out[("r2", "c1")].w_fit
            == pytest.approx(4.0, abs=2e-8))
    # counts preserved
    assert out[("r1", "c2")].n == 3


def test_ipf_rake_balanced_fixed_point(spark):
    from credigraph_spark.analytics import ipf_rake

    # already-uniform marginals: IPF is the identity
    rows = [("a", "x"), ("a", "y"), ("b", "x"), ("b", "y")]
    df = spark.createDataFrame(rows, "src STRING, lng STRING")
    out = ipf_rake(df, "src", "lng", rounds=2).collect()
    assert all(r.w_fit == 1.0 for r in out)


def test_ngram_novelty_hand_math(spark):
    from credigraph_spark.pipeline.textstats import ngram_novelty

    # doc 1 introduces "a b c" and "b c d"; doc 2 repeats "a b c" and
    # introduces "c d e"; doc 3 is all-repeat.
    rows = [
        (1, "a b c d"),          # grams: "a b c", "b c d" -> both novel
        (2, "a b c d e"),        # grams: "a b c"(old), "b c d"(old), "c d e"(new)
        (3, "a b c"),            # gram: "a b c"(old)
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    out = {r.doc_id: r for r in ngram_novelty(df, shingle_n=3).collect()}
    assert (out[1].n_ngrams, out[1].n_novel) == (2, 2)
    assert out[1].novelty == 1.0
    assert (out[2].n_ngrams, out[2].n_novel) == (3, 1)
    assert out[2].novelty == pytest.approx(1 / 3, abs=1e-8)
    assert (out[3].n_ngrams, out[3].n_novel) == (1, 0)
    assert out[3].novelty == 0.0


def test_ngram_novelty_counts_distinct_grams(spark):
    from credigraph_spark.pipeline.textstats import ngram_novelty

    # repeated shingle inside one doc counts ONCE (distinct-set semantics)
    df = spark.createDataFrame([(1, "x y z x y z x y z")],
                               "doc_id INT, text STRING")
    row = ngram_novelty(df, shingle_n=3).collect()[0]
    # 7 positions but only 3 distinct grams: "x y z", "y z x", "z x y"
    assert row.n_ngrams == 3 and row.n_novel == 3


def test_file_skipping_audit_differential(spark):
    from credigraph_spark.store import file_skipping_audit

    n, n_files, bits, n_probes = 64, 4, 3, 3
    rows = [(i, (i * 37 + 5) % 64) for i in range(n)]
    df = spark.createDataFrame(rows, "a LONG, b LONG")
    out = {(r.layout, r.probe_col): r for r in
           file_skipping_audit(df, ["a", "b"], n_files=n_files,
                               bits=bits, n_probes=n_probes).collect()}

    # pure-Python replay of the same integer formulas
    mn1, mx1 = 0, n - 1
    mn2 = min(b for _, b in rows)
    mx2 = max(b for _, b in rows)

    def zkey(a, b):
        b1 = (a - mn1) * (1 << bits) // (mx1 - mn1 + 1)
        b2 = (b - mn2) * (1 << bits) // (mx2 - mn2 + 1)
        z = 0
        for j in range(bits):
            z += ((b1 >> j) & 1) << (j * 2 + 1)
            z += ((b2 >> j) & 1) << (j * 2)
        return z

    layouts = {
        "sort_a": lambda a, b: (a - mn1) * n_files // (mx1 - mn1 + 1),
        "zorder": lambda a, b: zkey(a, b) * n_files // (1 << (2 * bits)),
    }
    for lname, fassign in layouts.items():
        zone = {}
        for a, b in rows:
            f = fassign(a, b)
            z = zone.setdefault(f, [a, a, b, b, 0])
            z[0], z[1] = min(z[0], a), max(z[1], a)
            z[2], z[3] = min(z[2], b), max(z[3], b)
            z[4] += 1
        for col, (mn, mx, lo, hi) in (
                ("a", (mn1, mx1, 0, 1)), ("b", (mn2, mx2, 2, 3))):
            skipped = scanned = 0
            for p in range(1, n_probes + 1):
                v = mn + (mx - mn) * p // (n_probes + 1)
                for z in zone.values():
                    if v < z[lo] or v > z[hi]:
                        skipped += 1
                    else:
                        scanned += z[4]
            r = out[(lname, col)]
            assert r.n_files == len(zone)
            assert r.n_skipped == skipped
            assert r.rows_scanned == scanned
            assert r.skip_frac == pytest.approx(
                skipped / (len(zone) * n_probes), abs=1e-6)


def test_file_skipping_sorted_layout_prunes_own_column(spark):
    from credigraph_spark.store import file_skipping_audit

    # a strictly increasing, b decorrelated: the a-sorted layout must
    # prune a-probes (disjoint file ranges) and nothing on b
    rows = [(i, (i * 29 + 3) % 128) for i in range(128)]
    df = spark.createDataFrame(rows, "a LONG, b LONG")
    out = {(r.layout, r.probe_col): r for r in
           file_skipping_audit(df, ["a", "b"], n_files=8,
                               bits=4, n_probes=5).collect()}
    assert out[("sort_a", "a")].n_skipped > 0
    assert out[("sort_a", "a")].scan_frac < 0.3
    assert out[("sort_a", "b")].n_skipped == 0
    # z-order prunes on BOTH columns
    assert out[("zorder", "a")].n_skipped > 0
    assert out[("zorder", "b")].n_skipped > 0


def test_crawl_capacity_hand_math(spark):
    from credigraph_spark.analytics import crawl_capacity

    # one slot (n_slots=1): host A 5 urls, host B 2 urls, one null host
    rows = [("a",)] * 5 + [("b",)] * 2 + [(None,)]
    df = spark.createDataFrame(rows, "host STRING")
    out = crawl_capacity(df, n_slots=1, fetch_cost=2,
                         host_delay=10).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_hosts == 2 and r.n_urls == 7
    # throughput: 7 urls x cost 2 = 14; politeness: (5-1)*10 + 2 = 42
    assert r.throughput_bound == 14
    assert r.politeness_bound == 42
    assert r.makespan == 42 and r.binding == "politeness"


def test_crawl_capacity_throughput_bound(spark):
    from credigraph_spark.analytics import crawl_capacity

    # many singleton hosts: politeness bound = fetch_cost, work wins
    rows = [(f"h{i}",) for i in range(20)]
    df = spark.createDataFrame(rows, "host STRING")
    out = crawl_capacity(df, n_slots=1, fetch_cost=3,
                         host_delay=100).collect()
    r = out[0]
    assert r.throughput_bound == 60 and r.politeness_bound == 3
    assert r.makespan == 60 and r.binding == "throughput"
    # slot partition is a function of the host: total urls conserved
    out4 = crawl_capacity(df, n_slots=4, fetch_cost=3,
                          host_delay=100).collect()
    assert sum(x.n_urls for x in out4) == 20
    assert sum(x.n_hosts for x in out4) == 20


def test_truncated_hitting_time_hand_math(spark):
    from credigraph_spark.graph.nhop import truncated_hitting_time

    # chain 1 -> 2 -> 3 (target), plus 4 -> 3 and dangling-source 5 -> 1
    edges = edges_df(spark, [(1, 2), (2, 3), (4, 3), (5, 1)])
    targets = spark.createDataFrame([(3,)], "vid LONG")
    out = {r.vid: r.h for r in
           truncated_hitting_time(edges, targets, rounds=3).collect()}
    # h(3)=0; h(2)=1; h(4)=1; h(1)=1+h(2)=2; h(5)=1+h(1)=3 (at cap)
    assert out[3] == 0.0
    assert out[2] == 1.0 and out[4] == 1.0
    assert out[1] == 2.0
    assert out[5] == 3.0


def test_truncated_hitting_time_walk_weighting(spark):
    from credigraph_spark.graph.nhop import truncated_hitting_time

    # vertex 1 splits: half to target 9, half into a detour 2 -> 9;
    # dangling non-target 7 pinned at the cap
    edges = edges_df(spark, [(1, 9), (1, 2), (2, 9), (9, 7)])
    targets = spark.createDataFrame([(9,)], "vid LONG")
    out = {r.vid: r.h for r in
           truncated_hitting_time(edges, targets, rounds=4).collect()}
    # h(2) = 1; h(1) = 1 + (0 + 1)/2 = 1.5; h(7) dangling = cap 4
    assert out[2] == 1.0
    assert out[1] == pytest.approx(1.5, abs=1e-9)
    assert out[7] == 4.0


def _bloom_pos(v, seed=7, k=3, m=64):
    import hashlib
    return {int(hashlib.md5(f"{seed}:{j}:{v}".encode())
                .hexdigest()[:15], 16) % m for j in range(k)}


def test_bloom_skipping_audit_differential(spark):
    from credigraph_spark.store import bloom_skipping_audit

    # 32 rows, 4 files by a; b values cluster per file so some probes
    # exist in SOME files; tiny m=64 makes false positives plausible
    n, n_files, m, k, n_probes = 32, 4, 64, 3, 5
    rows = [(i, (i // 8) * 100 + (i * 13) % 7) for i in range(n)]
    df = spark.createDataFrame(rows, "a LONG, b LONG")
    out = {r.v: r for r in
           bloom_skipping_audit(df, "a", "b", n_files=n_files,
                                m_bits=m, k_hashes=k,
                                n_probes=n_probes).collect()}

    mn1, mx1 = 0, n - 1
    bs = [b for _, b in rows]
    mn2, mx2 = min(bs), max(bs)
    files = {}
    for a, b in rows:
        f = (a - mn1) * n_files // (mx1 - mn1 + 1)
        files.setdefault(f, set()).add(b)
    probes = {mn2 + (mx2 - mn2) * p // (n_probes + 1)
              for p in range(1, n_probes + 1)}
    assert set(out) == probes
    for v in probes:
        req = _bloom_pos(v, m=m)
        zm = sum(1 for vals in files.values()
                 if v < min(vals) or v > max(vals))
        blm = has = 0
        for vals in files.values():
            fset = set().union(*(_bloom_pos(x, m=m) for x in vals))
            if not req <= fset:
                blm += 1
            if v in vals:
                has += 1
        r = out[v]
        assert r.n_files == len(files)
        assert r.zm_skipped == zm
        assert r.bloom_skipped == blm
        assert r.n_containing == has
        assert r.bloom_false_pos == len(files) - blm - has
        # a file that contains v can NEVER be bloom-skipped
        assert r.bloom_skipped <= len(files) - has
    # the fixture exercises both presence and absence
    assert any(out[v].n_containing > 0 for v in probes)
    assert any(out[v].bloom_skipped > 0 for v in probes)


def test_label_noise_screen_hand_math(spark):
    from credigraph_spark.pipeline.classify import label_noise_screen

    # classes a, b. Docs 1-3 labeled a (self-conf 0.9, 0.8, 0.2),
    # doc 4 labeled b with p_b = 0.3 but p_a = 0.9 -> suspected a.
    rows = [
        (1, "a", "a", 0.9), (1, "a", "b", 0.1),
        (2, "a", "a", 0.8), (2, "a", "b", 0.2),
        (3, "a", "a", 0.2), (3, "a", "b", 0.6),
        (4, "b", "a", 0.9), (4, "b", "b", 0.3),
    ]
    df = spark.createDataFrame(
        rows, "doc_id INT, label STRING, cls STRING, p DOUBLE")
    # t_a = mean(0.9, 0.8, 0.2) ~ 0.633333; t_b = mean(0.3) = 0.3
    out = {(r.label, r.pred): r for r in label_noise_screen(df).collect()}
    # doc1: a confident (0.9 >= t_a) -> (a, a)
    # doc2: a confident (0.8 >= t_a) -> (a, a)
    # doc3: only b above threshold (0.6 >= 0.3) -> (a, b)  SUSPECT
    # doc4: both above -> argmax = a -> (b, a)  SUSPECT
    assert out[("a", "a")].n == 2 and not out[("a", "a")].suspect
    assert out[("a", "b")].n == 1 and out[("a", "b")].suspect
    assert out[("b", "a")].n == 1 and out[("b", "a")].suspect
    assert out[("a", "a")].share == pytest.approx(2 / 3, abs=1e-6)
    assert out[("b", "a")].share == 1.0


def test_label_noise_screen_unthresholded_class_never_predicted(spark):
    from credigraph_spark.pipeline.classify import label_noise_screen

    # class c has NO self-labeled examples -> no threshold -> never
    # predicted even with p = 1.0
    rows = [
        (1, "a", "a", 0.5), (1, "a", "c", 1.0),
        (2, "a", "a", 0.6), (2, "a", "c", 1.0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id INT, label STRING, cls STRING, p DOUBLE")
    out = label_noise_screen(df).collect()
    assert all(r.pred == "a" for r in out)


def test_jl_distortion_numpy_differential(spark):
    import numpy as np

    from credigraph_spark.pipeline.similarity import (
        _md5_sign_planes, jl_distortion_audit)

    rng = np.random.RandomState(3)
    vecs = rng.randn(10, 64).astype(np.float32)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    out = {r.k: r for r in
           jl_distortion_audit(df, dims=(8, 32),
                               sample_pred=F.col("vec_id") < 10)
           .collect()}

    v64 = vecs.astype(np.float64)
    for k in (8, 32):
        planes = _md5_sign_planes(64, k, 7)           # (64, k)
        y = v64 @ planes                              # (10, k)
        ratios = []
        for i in range(10):
            for j in range(i + 1, 10):
                d2o = float(((v64[i] - v64[j]) ** 2).sum())
                d2k = float(((y[i] - y[j]) ** 2).sum())
                ratios.append(round(d2k / k / d2o, 6))
        r = out[k]
        assert r.n_pairs == 45
        assert r.mean_ratio == pytest.approx(
            sum(ratios) / len(ratios), abs=2e-6)
        assert r.min_ratio == pytest.approx(min(ratios), abs=2e-6)
        assert r.max_ratio == pytest.approx(max(ratios), abs=2e-6)
    # more dims -> tighter concentration (JL), at least not worse
    assert out[32].within_30pct >= out[8].within_30pct


def test_jl_projection_preserves_identical_vectors(spark):
    from credigraph_spark.pipeline.similarity import jl_distortion_audit

    # distances scale linearly: scaling every vector by c leaves the
    # distortion ratios unchanged
    import numpy as np
    rng = np.random.RandomState(11)
    vecs = rng.randn(6, 64)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(6)]
    rows_scaled = [(i, [float(3.0 * x) for x in vecs[i]])
                   for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<FLOAT>")
    df2 = spark.createDataFrame(rows_scaled,
                                "vec_id LONG, embedding ARRAY<FLOAT>")
    a = {r.k: r for r in jl_distortion_audit(
        df, dims=(16,), sample_pred=F.col("vec_id") < 6).collect()}
    b = {r.k: r for r in jl_distortion_audit(
        df2, dims=(16,), sample_pred=F.col("vec_id") < 6).collect()}
    assert a[16].mean_ratio == pytest.approx(b[16].mean_ratio, abs=1e-4)


def test_gap_compression_hand_math(spark):
    from credigraph_spark.store import gap_compression_audit

    # src 1 -> sorted dsts [2, 5, 500]: gaps 2, 3, 495 -> 1+1+2 bytes;
    # src 9 -> [20000]: gap 20000 > 128^2 -> 3 bytes (deg_bits 1)
    edges = edges_df(spark, [(1, 5), (1, 2), (1, 500), (9, 20000)])
    out = {r.deg_bits: r for r in gap_compression_audit(edges).collect()}
    # deg 3 -> bits 2; deg 1 -> bits 1
    assert out[2].n_lists == 1 and out[2].n_edges == 3
    assert out[2].varint_bytes == 4          # 1 + 1 + 2
    assert out[2].raw_bytes == 24
    assert out[2].bytes_per_edge == pytest.approx(4 / 3, abs=1e-6)
    assert out[1].n_lists == 1 and out[1].varint_bytes == 3


def test_gap_compression_dense_list_compresses(spark):
    from credigraph_spark.store import gap_compression_audit

    # a dense consecutive neighbor list costs ~1 byte/edge
    edges = edges_df(spark, [(1, d) for d in range(2, 102)])
    out = gap_compression_audit(edges).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_edges == 100
    assert r.varint_bytes == 100             # every gap < 128
    assert r.ratio == pytest.approx(1 / 8, abs=1e-6)


def test_robust_outlier_screen_hand_math(spark):
    from credigraph_spark.analytics import robust_outlier_screen

    # values 1..9 plus a wild 1000. n=10 -> median = rank 5 = 5;
    # abs devs sorted: 0,1,1,2,2,3,3,4,4,995 -> MAD = rank 5 = 2.
    # modified z of 1000 = 0.6745*995/2 = 335.56; of 9 = 1.349 (kept out)
    rows = [(i, float(i)) for i in range(1, 10)] + [(10, 1000.0)]
    df = spark.createDataFrame(rows, "id INT, x DOUBLE")
    out = robust_outlier_screen(df, "id", "x").collect()
    assert len(out) == 1
    r = out[0]
    assert r.id == 10 and r.med == 5.0 and r.mad == 2.0
    assert r.modified_z == pytest.approx(0.6745 * 995 / 2, abs=1e-6)


def test_robust_outlier_screen_zero_mad_flags_nothing(spark):
    from credigraph_spark.analytics import robust_outlier_screen

    # >50% of mass on one value -> MAD 0 -> screen undefined, no flags
    rows = [(i, 5.0) for i in range(6)] + [(10, 1e9), (11, -1e9)]
    df = spark.createDataFrame(rows, "id INT, x DOUBLE")
    assert robust_outlier_screen(df, "id", "x").count() == 0


def test_ic_influence_full_probability_is_bfs(spark):
    from credigraph_spark.graph.spreading import ic_influence

    # p = 1.0: every edge alive in every sim -> reach = 3-hop BFS set
    edges = edges_df(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (9, 1)])
    seeds = spark.createDataFrame([(1,)], "vid LONG")
    out = ic_influence(edges, seeds, n_sims=2, p=1.0, rounds=3).collect()
    assert len(out) == 2
    for r in out:
        assert r.n_alive == 5
        assert r.n_reached == 4          # {1, 2, 3, 4}; 5 is 4 hops out


def test_ic_influence_zero_probability_reaches_seeds_only(spark):
    from credigraph_spark.graph.spreading import ic_influence

    edges = edges_df(spark, [(1, 2), (2, 3)])
    seeds = spark.createDataFrame([(1,), (3,)], "vid LONG")
    out = ic_influence(edges, seeds, n_sims=3, p=0.0, rounds=2).collect()
    for r in out:
        assert r.n_alive == 0 and r.n_reached == 2


def test_ic_influence_monotone_in_p(spark):
    from credigraph_spark.graph.spreading import ic_influence

    # same coins: alive set at p=0.3 is a subset of alive at p=0.8,
    # so per-sim reach is monotone
    edges = edges_df(spark, [(i, j) for i in range(10)
                             for j in range(10) if i != j])
    seeds = spark.createDataFrame([(0,)], "vid LONG")
    lo = {r.sim: r for r in
          ic_influence(edges, seeds, n_sims=4, p=0.3, rounds=2).collect()}
    hi = {r.sim: r for r in
          ic_influence(edges, seeds, n_sims=4, p=0.8, rounds=2).collect()}
    for s in lo:
        assert lo[s].n_alive <= hi[s].n_alive
        assert lo[s].n_reached <= hi[s].n_reached


def test_greedy_coverage_select_hand_math(spark):
    from credigraph_spark.pipeline.sampling import greedy_coverage_select

    # unigram shingles (shingle_n=1 -> each word a shingle).
    # doc 1: {a b c d}, doc 2: {a b e}, doc 3: {e f}, doc 4: {a}
    rows = [(1, "a b c d"), (2, "a b e"), (3, "e f"), (4, "a")]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = greedy_coverage_select(df, k=3, shingle_n=1).collect()
    # round 1: doc 1 gain 4; round 2: doc 3 gains {e,f}=2 beats doc 2
    # ({e}=1); round 3: nothing new remains -> the greedy STOPS early
    assert [(r.round, r.doc_id, r.gain, r.covered_total)
            for r in out] == [(1, 1, 4, 4), (2, 3, 2, 6)]


def test_greedy_coverage_is_submodular_monotone(spark):
    from credigraph_spark.pipeline.sampling import greedy_coverage_select

    docs = [(i, " ".join(f"w{(i * 7 + j) % 40}" for j in range(12)))
            for i in range(15)]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    out = greedy_coverage_select(df, k=4, shingle_n=1).collect()
    gains = [r.gain for r in out]
    # greedy gains are non-increasing (submodularity)
    assert gains == sorted(gains, reverse=True)
    # coverage totals are the prefix sums
    tot = 0
    for r in out:
        tot += r.gain
        assert r.covered_total == tot


def test_densest_subgraph_finds_planted_clique(spark):
    from credigraph_spark.graph.kcore import densest_subgraph

    # a 6-clique (undirected density 15/6 = 2.5) planted in a long
    # sparse chain (density < 1): peeling must strip the chain and
    # flag the clique round as best
    clique = [(i, j) for i in range(6) for j in range(6) if i < j]
    chain = [(100 + i, 101 + i) for i in range(60)]
    edges = edges_df(spark, clique + chain)
    out = densest_subgraph(edges, eps_tenths=1, max_rounds=4).collect()
    best = [r for r in out if r.is_best][0]
    assert best.n_vertices == 6 and best.n_edges == 15
    assert best.density == 2.5
    assert best.round > 0          # the full graph is NOT the best


def test_densest_subgraph_round0_counts(spark):
    from credigraph_spark.graph.kcore import densest_subgraph

    edges = edges_df(spark, [(1, 2), (2, 3), (3, 1)])
    out = {r.round: r for r in
           densest_subgraph(edges, max_rounds=2).collect()}
    # triangle: 3 vertices, 3 undirected edges, density 1.0; a
    # triangle is its own densest subgraph and survives nothing past
    # the threshold 2.2*1.0 < deg 2? 10*2*3=60 <= 22*3=66 -> peeled
    assert out[0].n_vertices == 3 and out[0].n_edges == 3
    assert out[0].density == 1.0 and out[0].is_best
    assert 1 not in out            # everything peeled after round 0


def test_token_blocking_audit_hand_math(spark):
    from credigraph_spark.pipeline.linkage import token_blocking_audit

    # blocks: "red"->{1,2,3}, "widget"->{1,2}, "bolt"->{3,4},
    # "blue"->{4} (dropped, singleton)
    rows = [(1, "red widget"), (2, "red widget"),
            (3, "red bolt"), (4, "blue bolt")]
    df = spark.createDataFrame(rows, "id LONG, name STRING")
    out = {r.stage: r for r in
           token_blocking_audit(df, "id", "name", purge_max=2)
           .collect()}
    raw = out["raw"]
    # raw: blocks red(3), widget(2), bolt(2) -> 3 + 1 + 1 = 5 comps
    assert raw.n_blocks == 3 and raw.n_comparisons == 5
    assert raw.max_block == 3 and raw.distinct_pairs == -1
    pur = out["purged"]
    # purged (max 2): widget{1,2}, bolt{3,4} -> 2 comps, 2 distinct
    assert pur.n_blocks == 2 and pur.n_comparisons == 2
    assert pur.distinct_pairs == 2 and pur.max_block == 2


def test_token_blocking_distinct_pairs_deduplicates(spark):
    from credigraph_spark.pipeline.linkage import token_blocking_audit

    # 1 and 2 share TWO blocks -> 2 aggregate comparisons but ONE
    # distinct pair
    rows = [(1, "red widget"), (2, "red widget")]
    df = spark.createDataFrame(rows, "id LONG, name STRING")
    out = {r.stage: r for r in
           token_blocking_audit(df, "id", "name", purge_max=10)
           .collect()}
    assert out["purged"].n_comparisons == 2
    assert out["purged"].distinct_pairs == 1


def test_greedy_influence_max_p1_two_stars(spark):
    from credigraph_spark.graph.spreading import greedy_influence_max

    # two disjoint stars: hub 1 -> 10 leaves, hub 2 -> 6 leaves.
    # p=1 -> deterministic reach; greedy must pick hub 1 then hub 2
    star1 = [(1, 100 + i) for i in range(10)]
    star2 = [(2, 200 + i) for i in range(6)]
    edges = edges_df(spark, star1 + star2)
    out = greedy_influence_max(edges, k=2, n_cands=4, n_sims=2,
                               p=1.0, rounds=2).collect()
    assert [r.seed_vid for r in out] == [1, 2]
    # hub1 reach = {1 + 10 leaves} x 2 sims = 22 elements
    assert out[0].marginal == 22
    assert out[1].marginal == 14
    assert out[1].covered_total == 36
    assert out[1].est_spread == pytest.approx(18.0, abs=1e-9)


def test_greedy_influence_max_marginal_not_raw_reach(spark):
    from credigraph_spark.graph.spreading import greedy_influence_max

    # hubs 1 and 2 share ALL leaves; second pick's marginal must be
    # only its unshared self-vertex, not its full reach
    shared = [(1, 100 + i) for i in range(8)] \
        + [(2, 100 + i) for i in range(8)]
    edges = edges_df(spark, shared)
    out = greedy_influence_max(edges, k=2, n_cands=2, n_sims=3,
                               p=1.0, rounds=1).collect()
    assert out[0].marginal == 27      # (1 + 8 leaves) x 3 sims
    assert out[1].marginal == 3       # just vertex 2 itself, x 3 sims


def test_negative_samples_draw_semantics(spark):
    from credigraph_spark.graph.sampling import negative_samples

    edges = edges_df(spark, [(0, 1), (0, 2), (20, 3), (40, 1),
                             (5, 6), (7, 8)])
    out = negative_samples(edges, k=3,
                           pos_pred=F.col("src") % 20 == 0).collect()
    # positives: (0,1), (0,2), (20,3), (40,1) -> 4 x 3 draws
    assert len(out) == 12
    negs = {r.neg_vid for r in out}
    # negatives are always actual edge DESTINATIONS (degree-proportional)
    assert negs <= {1, 2, 3, 6, 8}
    for r in out:
        # clean iff not self and not an existing out-neighbor of src
        expect = (r.neg_vid != r.src
                  and (r.src, r.neg_vid) not in
                  {(0, 1), (0, 2), (20, 3), (40, 1), (5, 6), (7, 8)})
        assert r.clean == expect


def test_negative_samples_deterministic(spark):
    from credigraph_spark.graph.sampling import negative_samples

    edges = edges_df(spark, [(0, i) for i in range(1, 30)]
                     + [(3, 7), (9, 11)])
    a = sorted(map(tuple, negative_samples(edges, k=2).collect()))
    b = sorted(map(tuple, negative_samples(edges, k=2).collect()))
    assert a == b
    # a different seed moves at least one draw
    c = sorted(map(tuple,
                   negative_samples(edges, k=2, seed=99).collect()))
    assert a != c


def test_sampler_bias_star_graph(spark):
    from credigraph_spark.graph.sampling import sampler_bias_audit

    # star: hub 0 with 200 leaves. Edge-endpoint sampling ALWAYS sees
    # the hub (deg 200), so its mean degree >> node sampling's.
    edges = edges_df(spark, [(0, i) for i in range(1, 201)])
    out = {r.method: r for r in
           sampler_bias_audit(edges, q_tenths=2).collect()}
    pop = out["population"]
    assert pop.n_vertices == 201 and pop.induced_edges == 200
    assert pop.degree_bias == 1.0
    # population mean degree = 2|E|/|V| = 400/201
    assert pop.mean_degree == pytest.approx(400 / 201, abs=1e-6)
    assert out["edge"].degree_bias > out["node"].degree_bias
    # the always-sampled hub inflates the edge sample's mean well
    # above the population mean (~2); node sampling stays near it
    assert out["edge"].degree_bias > 2.0
    assert out["node"].degree_bias < 2.0


def test_sampler_bias_regular_graph_unbiased(spark):
    from credigraph_spark.graph.sampling import sampler_bias_audit

    # a cycle is 2-regular: EVERY sampler sees mean degree exactly 2
    edges = edges_df(spark, [(i, (i + 1) % 50) for i in range(50)])
    out = {r.method: r for r in
           sampler_bias_audit(edges, q_tenths=5).collect()}
    for m in ("population", "node", "edge"):
        if out[m].n_vertices:
            assert out[m].mean_degree == 2.0
            assert out[m].degree_bias == 1.0


def test_rebalance_audit_identity_and_ordering(spark):
    from credigraph_spark.store import rebalance_audit

    df = spark.createDataFrame([(i,) for i in range(400)], "k LONG")
    # same slot count -> nothing moves under either scheme
    out0 = {r.scheme: r for r in
            rebalance_audit(df, "k", n_from=6, n_to=6).collect()}
    assert out0["hrw"].moved == 0 and out0["mod"].moved == 0
    # growing 4 -> 5: HRW moves ~1/5, mod ~4/5
    out = {r.scheme: r for r in
           rebalance_audit(df, "k", n_from=4, n_to=5).collect()}
    assert out["hrw"].n_keys == 400
    assert out["hrw"].moved_frac < 0.35
    assert out["mod"].moved_frac > 0.6
    assert out["hrw"].moved < out["mod"].moved


def test_rebalance_audit_deduplicates_keys(spark):
    from credigraph_spark.store import rebalance_audit

    df = spark.createDataFrame([(1,), (1,), (2,)], "k LONG")
    out = rebalance_audit(df, "k", n_from=2, n_to=3).collect()
    assert all(r.n_keys == 2 for r in out)


def test_h_index_hand_math(spark):
    from credigraph_spark.analytics import h_index_centrality

    # star hub 0 with 5 leaves: hub deg 5 but all neighbors deg 1 ->
    # h(0)=1; leaves have 1 neighbor of deg 5 -> h=1
    edges = edges_df(spark, [(0, i) for i in range(1, 6)])
    out = {r.vid: r for r in h_index_centrality(edges).collect()}
    assert out[0].deg == 5 and out[0].h == 1
    assert all(out[i].h == 1 for i in range(1, 6))


def test_h_index_bounds_core_and_degree(spark):
    from credigraph_spark.analytics import h_index_centrality

    # 4-clique + pendant: clique members have 3 neighbors of deg>=3
    # (pendant host has deg 4) -> h=3 for all clique vertices
    clique = [(i, j) for i in range(4) for j in range(4) if i < j]
    edges = edges_df(spark, clique + [(0, 9)])
    out = {r.vid: r for r in h_index_centrality(edges).collect()}
    for v in range(4):
        assert out[v].h == 3
        assert out[v].h <= out[v].deg
    assert out[9].h == 1


def test_encoding_health_detects_mojibake(spark):
    from credigraph_spark.pipeline.textstats import encoding_health

    rows = [
        (1, "perfectly clean ascii text"),
        (2, "lossy decode scar: �� here"),
        (3, "binary junk \x01\x02 inside"),
        (4, "tabs\tand\nnewlines are fine"),
        (5, "légitime non-ASCII français"),
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    out = {r.doc_id: r for r in encoding_health(df).collect()}
    assert not out[1].flagged and out[1].n_non_ascii == 0
    assert out[2].flagged and out[2].n_replacement == 2
    assert out[3].flagged and out[3].n_control == 2
    assert not out[4].flagged       # \t and \n are NOT control junk
    # non-ASCII alone (accented French) is NOT a flag
    assert not out[5].flagged and out[5].n_non_ascii > 0


def test_source_boilerplate_hand_math(spark):
    from credigraph_spark.pipeline.textstats import source_boilerplate

    # source A (3 docs): "shared footer tag" in all 3 (df 3/3 >= 50%),
    # each doc also has unique grams. Source B: single doc -> no
    # boilerplate by definition.
    rows = [
        (1, "A", "shared footer tag unique one alpha"),
        (2, "A", "shared footer tag unique two beta"),
        (3, "A", "shared footer tag unique three gamma"),
        (4, "B", "shared footer tag whatever here now"),
    ]
    df = spark.createDataFrame(rows,
                               "doc_id INT, source STRING, text STRING")
    out = {r.doc_id: r for r in source_boilerplate(df).collect()}
    # doc 1 grams (n=3 shingles of 6 words = 4 distinct):
    # 'shared footer tag' appears in all 3 A-docs -> boiler;
    # 'footer tag unique' also in all 3 -> boiler; the rest unique
    assert out[1].n_shingles == 4
    assert out[1].n_boiler == 2
    assert out[1].boiler_frac == 0.5
    # single-doc source: zero boilerplate even though text repeats
    assert out[4].n_boiler == 0 and out[4].boiler_frac == 0.0


def test_source_boilerplate_threshold(spark):
    from credigraph_spark.pipeline.textstats import source_boilerplate

    # gram in 1 of 4 docs (25%) stays below the 50% threshold
    rows = [(i, "S", f"unique{i} gram{i} text{i} common motif here"
             if i == 0 else f"unique{i} gram{i} text{i} filler{i} x{i}")
            for i in range(4)]
    df = spark.createDataFrame(rows,
                               "doc_id INT, source STRING, text STRING")
    out = source_boilerplate(df).collect()
    assert all(r.n_boiler == 0 for r in out)


def test_threshold_sweep_hand_math(spark):
    from credigraph_spark.pipeline.classify import threshold_sweep

    # scores: positives at 0.9, 0.8, 0.3; negatives at 0.7, 0.1
    rows = [(True, 0.9), (True, 0.8), (True, 0.3),
            (False, 0.7), (False, 0.1)]
    df = spark.createDataFrame(rows, "y BOOLEAN, s DOUBLE")
    out = {r.thr: r for r in
           threshold_sweep(df, "y", "s", bins=10).collect()}
    # thr 0.8: predict s>=0.8 -> tp=2 fp=0 fn=1; f1 = 4/5
    r = out[0.8]
    assert (r.tp, r.fp, r.fn) == (2, 0, 1)
    assert r.f1 == pytest.approx(0.8, abs=1e-6)
    # thr 0.3: tp=3 fp=1 fn=0 -> f1 = 6/7 = 0.857143 -> the best
    r = out[0.3]
    assert (r.tp, r.fp, r.fn) == (3, 1, 0)
    assert r.is_best
    assert sum(1 for x in out.values() if x.is_best) == 1
    # lowest threshold: everything positive -> recall 1
    assert out[0.1].recall == 1.0


def test_threshold_sweep_perfect_classifier(spark):
    from credigraph_spark.pipeline.classify import threshold_sweep

    rows = [(True, 0.95)] * 5 + [(False, 0.05)] * 5
    df = spark.createDataFrame(rows, "y BOOLEAN, s DOUBLE")
    out = [r for r in threshold_sweep(df, "y", "s").collect()
           if r.is_best]
    assert out[0].f1 == 1.0 and out[0].fp == 0 and out[0].fn == 0


def test_km_churn_hand_math(spark):
    from credigraph_spark.temporal import km_churn

    # day-unit lifetimes: users a(0d, churn), b(1d, churn), c(2d,
    # CENSORED at end), d(5d, defines corpus end, censored)
    rows = [
        ("a", _ts(1)), ("a", _ts(1, 6)),                 # dur 0
        ("b", _ts(1)), ("b", _ts(2)),                    # dur 1
        ("c", _ts(4)), ("c", _ts(6)),                    # dur 2, ld=6
        ("d", _ts(1)), ("d", _ts(6)),                    # dur 5, ld=6
    ]
    df = spark.createDataFrame(rows, "user_id STRING, ts TIMESTAMP")
    out = {r.duration: r for r in
           km_churn(df, time_unit_s=86400,
                    censor_margin_units=1).collect()}
    # corpus end day = day(6); churn iff ld < end-1 -> a, b churn
    # KM: d=0: risk 4, events 1 -> S=0.75
    #     d=1: risk 3, events 1 -> S=0.75*(2/3)=0.5
    assert set(out) == {0, 1}
    assert out[0].n_risk == 4 and out[0].survival == 0.75
    assert out[1].n_risk == 3 and out[1].survival == 0.5


def test_km_churn_all_censored_is_empty(spark):
    from credigraph_spark.temporal import km_churn

    rows = [("a", _ts(5)), ("b", _ts(5, 1)), ("c", _ts(5, 2))]
    df = spark.createDataFrame(rows, "user_id STRING, ts TIMESTAMP")
    assert km_churn(df, time_unit_s=86400,
                    censor_margin_units=2).count() == 0


def test_ring_balance_vnodes_smooth_loads(spark):
    from credigraph_spark.store import ring_balance_audit

    df = spark.createDataFrame([(i,) for i in range(2000)], "k LONG")
    out = ring_balance_audit(df, "k", n_slots=4,
                             vnodes=(1, 64)).collect()
    by_v = {}
    for r in out:
        by_v.setdefault(r.vnodes, []).append(r.n_keys)
    # totals conserved at every vnode count
    assert sum(by_v[1]) == 2000 and sum(by_v[64]) == 2000
    # virtual nodes smooth the load: max/min spread shrinks
    spread1 = max(by_v[1]) - min(by_v[1] + [0] * (4 - len(by_v[1])))
    spread64 = max(by_v[64]) - min(by_v[64])
    assert len(by_v[64]) == 4          # every slot owns keys at v=64
    assert spread64 < spread1


def test_ring_balance_deterministic(spark):
    from credigraph_spark.store import ring_balance_audit

    df = spark.createDataFrame([(i,) for i in range(300)], "k LONG")
    a = sorted(map(tuple, ring_balance_audit(df, "k").collect()))
    b = sorted(map(tuple, ring_balance_audit(df, "k").collect()))
    assert a == b


def test_woe_iv_informative_vs_random_feature(spark):
    import math

    from credigraph_spark.pipeline.classify import woe_iv

    # perfectly separating feature: positives all high, negatives low
    rows = [(True, 90.0 + i) for i in range(50)] \
        + [(False, float(i)) for i in range(50)]
    df = spark.createDataFrame(rows, "y BOOLEAN, v DOUBLE")
    out = woe_iv(df, "y", "v", bins=4).collect()
    iv_strong = out[0].iv
    assert iv_strong > 0.3                  # "strong" by convention
    # every row carries the same feature-level IV
    assert len({r.iv for r in out}) == 1
    # a constant-ish independent feature: IV ~ 0
    rows2 = [(i % 2 == 0, float(i % 7)) for i in range(700)]
    df2 = spark.createDataFrame(rows2, "y BOOLEAN, v DOUBLE")
    out2 = woe_iv(df2, "y", "v", bins=7).collect()
    assert out2[0].iv < 0.02                # "useless" by convention


def test_woe_iv_hand_math(spark):
    import math

    from credigraph_spark.pipeline.classify import woe_iv

    # one bin: 3 pos, 1 neg; other bin: 1 pos, 3 neg; bins=2
    rows = [(True, 0.0)] * 3 + [(False, 0.0)] * 1 \
        + [(True, 10.0)] * 1 + [(False, 10.0)] * 3
    df = spark.createDataFrame(rows, "y BOOLEAN, v DOUBLE")
    out = {r.bin: r for r in woe_iv(df, "y", "v", bins=2).collect()}
    ps0, ns0 = (3 + 0.5) / (4 + 1.0), (1 + 0.5) / (4 + 1.0)
    assert out[0].woe == pytest.approx(math.log(ps0 / ns0), abs=1e-6)
    assert out[0].n_pos == 3 and out[0].n_neg == 1


def test_assort_significance_null_kills_structure(spark):
    from credigraph_spark.analytics import degree_assortativity
    from credigraph_spark.graph.generate import configuration_rewire

    # strongly DISassortative by construction: two hubs, each wired
    # to its own leaf set (hub-leaf edges only)
    edges = edges_df(spark, [(0, i) for i in range(1, 30)]
                     + [(100, 100 + i) for i in range(1, 30)])
    obs = degree_assortativity(edges).collect()[0]
    nul = degree_assortativity(
        configuration_rewire(edges)).collect()[0]
    assert obs.assortativity == -1.0       # pure hub-leaf mixing
    # the degree-preserving rewire keeps the degree sequence but can
    # only keep or weaken perfect disassortativity
    assert nul.assortativity >= obs.assortativity
    # degrees preserved implies the end count stays in the same range
    assert nul.n_ends <= obs.n_ends


def test_language_purity_mixed_doc(spark):
    from credigraph_spark.pipeline.textstats import language_purity

    en = "the quick fox and the dog that it was for"      # en stopwords
    fr = "le chat est une bete que les gens pour la"      # fr stopwords
    rows = [
        (1, " ".join([en] * 4)),           # pure en: 40 toks, 2 chunks
        (2, " ".join([en, en, fr, fr])),   # half en / half fr
        (3, "xqz wvk ppp qqq"),            # no stopwords -> und
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    out = {r.doc_id: r for r in
           language_purity(df, window=10).collect()}
    assert out[1].majority_lang == "en" and out[1].purity == 1.0
    assert out[2].n_chunks == 4
    assert out[2].purity == 0.5            # 2 en + 2 fr chunks
    assert out[3].majority_lang == "und"


def test_language_purity_single_chunk_doc(spark):
    from credigraph_spark.pipeline.textstats import language_purity

    df = spark.createDataFrame([(1, "the and of")],
                               "doc_id INT, text STRING")
    r = language_purity(df, window=50).collect()[0]
    assert r.n_chunks == 1 and r.purity == 1.0
    assert r.majority_lang == "en"


def test_salting_audit_single_hot_key(spark):
    from credigraph_spark.store import salting_audit

    # ONE key, 800 rows: plain puts every row on one reducer
    # (straggler ratio = n_reducers); salting with 8 salts spreads it
    df = spark.createDataFrame([("hot", i) for i in range(800)],
                               "k STRING, rid LONG")
    out = {r.scheme: r for r in
           salting_audit(df, "k", "rid", n_reducers=16,
                         n_salts=8).collect()}
    assert out["plain"].n_rows == out["salted"].n_rows == 800
    assert out["plain"].max_load == 800
    assert out["plain"].straggler_ratio == pytest.approx(16.0)
    # 8 salts -> at most 8 reducers loaded, straggler ratio way down
    assert out["salted"].max_load < 800
    assert out["salted"].straggler_ratio < out["plain"].straggler_ratio


def test_salting_audit_uniform_keys_no_regression(spark):
    from credigraph_spark.store import salting_audit

    # many distinct keys: already balanced; salting must not DEGRADE
    # the straggler ratio by more than noise
    df = spark.createDataFrame([(f"k{i}", i) for i in range(4000)],
                               "k STRING, rid LONG")
    out = {r.scheme: r for r in
           salting_audit(df, "k", "rid", n_reducers=16,
                         n_salts=8).collect()}
    assert out["salted"].straggler_ratio < \
        out["plain"].straggler_ratio * 1.2


def test_code_shape_hand_math(spark):
    from credigraph_spark.pipeline.textstats import code_shape

    src = "# top comment\ndef f(x) {\n    return x\n}\n// done"
    df = spark.createDataFrame([(1, src)], "doc_id INT, text STRING")
    r = code_shape(df).collect()[0]
    assert r.n_lines == 5
    assert r.comment_frac == pytest.approx(2 / 5, abs=1e-6)  # # and //
    assert r.max_indent == 4
    assert r.brace_balance == 0
    assert r.max_line_len == len("# top comment")


def test_code_shape_flags_minified_and_truncated(spark):
    from credigraph_spark.pipeline.textstats import code_shape

    rows = [
        (1, "x" * 500),                     # minified: one huge line
        (2, "if a {\n  if b {\n    y\n"),   # truncated: brace imbalance
    ]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING")
    out = {r.doc_id: r for r in code_shape(df).collect()}
    assert out[1].n_lines == 1 and out[1].max_line_len == 500
    assert out[2].brace_balance == 2


def test_subsample_ci_brackets_point_estimate(spark):
    from credigraph_spark.analytics import subsample_ci

    df = spark.createDataFrame([(i, float(i % 100)) for i in range(3000)],
                               "doc_id LONG, x DOUBLE")
    r = subsample_ci(df, "x", n_resamples=16,
                     key_cols=["doc_id"]).collect()[0]
    assert r.n_resamples == 16 and r.n_rows == 3000
    assert r.lo95 <= r.point_mean <= r.hi95
    # resample means of a ~uniform(0,99) column concentrate near 49.5
    assert abs(r.point_mean - 49.5) < 1.0
    assert r.hi95 - r.lo95 < 10.0


def test_subsample_ci_deterministic(spark):
    from credigraph_spark.analytics import subsample_ci

    df = spark.createDataFrame([(i, float(i)) for i in range(500)],
                               "doc_id LONG, x DOUBLE")
    a = subsample_ci(df, "x", n_resamples=8,
                     key_cols=["doc_id"]).collect()[0]
    b = subsample_ci(df, "x", n_resamples=8,
                     key_cols=["doc_id"]).collect()[0]
    assert tuple(a) == tuple(b)


def test_reclist_quality_popularity_loop(spark):
    from credigraph_spark.pipeline.similarity import reclist_quality

    import numpy as np
    rng = np.random.RandomState(5)
    # one "magnet" direction all queries point near -> every top-1 is
    # the same few items: coverage low, concentration high
    base = rng.randn(8)
    cands = [(i, [float(x) for x in base + 0.01 * rng.randn(8)])
             for i in range(10)]
    spread = [(100 + i, [float(x) for x in rng.randn(8)])
              for i in range(20)]
    df = spark.createDataFrame(cands + spread,
                               "vec_id LONG, embedding ARRAY<DOUBLE>")
    qs = df.where(F.col("vec_id") < 10)
    r = reclist_quality(qs, df, k=3).collect()[0]
    assert r.n_queries == 10 and r.k == 3 and r.catalog_size == 30
    # the magnet cluster recommends itself: low ILD (near-dup lists)
    assert r.mean_ild < 0.1
    assert r.top10_share > 0.9
    assert r.coverage <= 12 / 30 + 1e-9


def test_reclist_quality_bounds(spark):
    from credigraph_spark.pipeline.similarity import reclist_quality

    import numpy as np
    rng = np.random.RandomState(9)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(40)]
    df = spark.createDataFrame(rows,
                               "vec_id LONG, embedding ARRAY<DOUBLE>")
    r = reclist_quality(df.where(F.col("vec_id") < 10), df,
                        k=4).collect()[0]
    assert 0.0 < r.coverage <= 1.0
    assert 0.0 < r.top10_share <= 1.0
    assert 0.0 <= r.mean_ild <= 2.0


def test_markov_eval_learns_deterministic_chain(spark):
    from credigraph_spark.temporal import markov_next_event_eval

    # train users (u=1,2) and test user (u=0) all follow a -> b -> c
    rows = []
    for u in (0, 1, 2):
        for i, t in enumerate(["a", "b", "c", "a", "b", "c"]):
            rows.append((u, _ts(1, i), i, t))
    df = spark.createDataFrame(
        rows, "user_id LONG, ts TIMESTAMP, event_id LONG, "
              "event_type STRING")
    out = {r.src_type: r for r in
           markov_next_event_eval(df).collect()}
    # the chain is deterministic: per-source accuracy 1.0 everywhere
    assert out["a"].pred == "b" and out["a"].accuracy == 1.0
    assert out["b"].pred == "c" and out["b"].accuracy == 1.0
    assert out["c"].pred == "a" and out["c"].accuracy == 1.0
    # the context-free baseline cannot match a 3-cycle everywhere
    assert any(out[s].baseline_accuracy < 1.0 for s in "abc")


def test_markov_eval_unseen_source_scores_zero(spark):
    from credigraph_spark.temporal import markov_next_event_eval

    rows = [
        (1, _ts(1, 0), 0, "a"), (1, _ts(1, 1), 1, "b"),   # train: a->b
        (0, _ts(1, 0), 2, "z"), (0, _ts(1, 1), 3, "b"),   # test: z->b
    ]
    df = spark.createDataFrame(
        rows, "user_id LONG, ts TIMESTAMP, event_id LONG, "
              "event_type STRING")
    out = {r.src_type: r for r in
           markov_next_event_eval(df).collect()}
    # source 'z' never seen in train: empty pred, accuracy 0, but the
    # baseline (majority next = 'b') still gets it right
    assert out["z"].pred == "" and out["z"].accuracy == 0.0
    assert out["z"].baseline_pred == "b"
    assert out["z"].baseline_accuracy == 1.0


def test_hash_collision_sweep_monotone(spark):
    from credigraph_spark.pipeline.classify import hash_collision_sweep

    docs = [(i, " ".join(f"w{(i * 13 + j) % 300}" for j in range(20)))
            for i in range(40)]
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    out = sorted(hash_collision_sweep(df, buckets=(16, 64, 4096))
                 .collect(), key=lambda r: r.n_buckets)
    nf = out[0].n_features
    assert all(r.n_features == nf for r in out)
    # more buckets -> fewer colliding features (monotone non-increasing)
    collis = [r.colliding_features for r in out]
    assert collis == sorted(collis, reverse=True)
    # at 16 buckets for hundreds of features nearly everything collides
    assert out[0].collision_frac > 0.9
    # buckets_hit can never exceed the bucket count or the vocab
    for r in out:
        assert r.buckets_hit <= min(r.n_buckets, nf)


def test_hash_collision_sweep_tiny_vocab_exact(spark):
    from credigraph_spark.pipeline.classify import hash_collision_sweep

    # 2 docs, one word each -> vocab = {a, b}, no bigrams
    df = spark.createDataFrame([(1, "a"), (2, "b")],
                               "doc_id LONG, text STRING")
    r = hash_collision_sweep(df, buckets=(4096,)).collect()[0]
    assert r.n_features == 2
    assert r.colliding_features in (0, 2)   # md5-determined, tiny odds
    assert r.buckets_hit in (1, 2)


def test_join_cardinality_audit_hand_math(spark):
    from credigraph_spark.analytics import join_cardinality_audit

    # A: key 1 x3, key 2 x1;  B: key 1 x2, key 3 x5
    a = spark.createDataFrame([(1,)] * 3 + [(2,)], "k LONG")
    b = spark.createDataFrame([(1,)] * 2 + [(3,)] * 5, "k LONG")
    out = {r.method: r for r in
           join_cardinality_audit(a, "k", b, "k").collect()}
    # actual = 3*2 = 6 (only key 1 overlaps)
    assert out["exact"].actual == 6 and out["exact"].err_ratio == 1.0
    # sysr: 4*7 / max(2, 2) = 14
    assert out["sysr_independence"].estimate == 14.0
    assert out["sysr_independence"].err_ratio == pytest.approx(
        14 / 6, abs=1e-6)
    # overlap: (4/2)*(7/2)*1 = 7
    assert out["overlap_uniform"].estimate == 7.0


def test_join_cardinality_skew_underestimate(spark):
    from credigraph_spark.analytics import join_cardinality_audit

    # one hot key owns half of each side: uniformity UNDERestimates
    rows = [(0,)] * 500 + [(i,) for i in range(1, 501)]
    df = spark.createDataFrame(rows, "k LONG")
    out = {r.method: r for r in
           join_cardinality_audit(df, "k", df, "k").collect()}
    # actual = 500^2 + 500; sysr = 1000^2/501 ~ 1996 << actual
    assert out["exact"].actual == 500 * 500 + 500
    assert out["sysr_independence"].err_ratio < 0.05


def test_robust_means_hand_math(spark):
    from credigraph_spark.analytics import robust_means

    # 1..18 plus two wild outliers; 10% trim (p10/p90 picks)
    vals = [float(i) for i in range(1, 19)] + [1000.0, -1000.0]
    df = spark.createDataFrame([(v,) for v in vals], "x DOUBLE")
    r = robust_means(df, "x", trim_pct=10).collect()[0]
    assert r.n == 20
    # plain mean polluted by the outliers; trimmed/winsorized are not
    assert abs(r.mean - 8.55) < 1e-6
    assert 5 < r.trimmed_mean < 12
    assert 5 < r.winsorized_mean < 13
    # cuts are ACTUAL data values (percentile_disc picks)
    assert r.lo_cut in vals and r.hi_cut in vals
    assert r.n_trimmed >= 2
    # winsorized keeps all mass: clamped outliers pull less than raw
    assert abs(r.winsorized_mean - 9.5) < 3.0


def test_robust_means_clean_data_all_agree(spark):
    from credigraph_spark.analytics import robust_means

    df = spark.createDataFrame([(float(5),)] * 50, "x DOUBLE")
    r = robust_means(df, "x", trim_pct=5).collect()[0]
    assert r.mean == r.trimmed_mean == r.winsorized_mean == 5.0
    assert r.n_trimmed == 0


def test_snapshot_similarity_identical_and_disjoint(spark):
    from credigraph_spark.temporal import graph_snapshot_similarity

    e = edges_df(spark, [(1, 2), (2, 3), (3, 4)])
    r = graph_snapshot_similarity(e, e).collect()[0]
    assert r.vertex_jaccard == 1.0 and r.edge_jaccard == 1.0
    assert r.degree_tv == 0.0
    # disjoint vertex sets, same SHAPE (a 3-chain): TV still 0
    e2 = edges_df(spark, [(11, 12), (12, 13), (13, 14)])
    r2 = graph_snapshot_similarity(e, e2).collect()[0]
    assert r2.vertex_jaccard == 0.0 and r2.edge_jaccard == 0.0
    assert r2.degree_tv == 0.0        # size/id-invariant by design


def test_snapshot_similarity_shape_shift(spark):
    from credigraph_spark.temporal import graph_snapshot_similarity

    # chain (all deg<=2) vs star (one hub deg 5): distributions differ
    chain = edges_df(spark, [(i, i + 1) for i in range(1, 6)])
    star = edges_df(spark, [(0, i) for i in range(1, 6)])
    r = graph_snapshot_similarity(chain, star).collect()[0]
    assert r.degree_tv > 0.3
    assert r.v_old == 6 and r.v_new == 6


def test_table_fingerprint_order_and_partition_invariant(spark):
    from credigraph_spark.store import table_fingerprint

    rows = [(i, f"name{i}") for i in range(200)]
    a = spark.createDataFrame(rows, "id LONG, name STRING")
    b = spark.createDataFrame(list(reversed(rows)),
                              "id LONG, name STRING").repartition(7)
    fa = table_fingerprint(a).collect()[0]
    fb = table_fingerprint(b).collect()[0]
    assert fa.fingerprint == fb.fingerprint and fa.n_rows == fb.n_rows
    # any single-cell change moves the fingerprint
    c = spark.createDataFrame(
        rows[:-1] + [(199, "nameX")], "id LONG, name STRING")
    fc = table_fingerprint(c).collect()[0]
    assert fc.fingerprint != fa.fingerprint


def test_table_fingerprint_null_vs_empty_and_dup_caveat(spark):
    from credigraph_spark.store import table_fingerprint

    a = spark.createDataFrame([(1, None)], "id LONG, name STRING")
    b = spark.createDataFrame([(1, "")], "id LONG, name STRING")
    assert (table_fingerprint(a).collect()[0].fingerprint
            != table_fingerprint(b).collect()[0].fingerprint)
    # the documented XOR caveat: duplicate PAIRS cancel; n_rows catches it
    d = spark.createDataFrame([(1, "x"), (1, "x"), (2, "y")],
                              "id LONG, name STRING")
    e = spark.createDataFrame([(2, "y")], "id LONG, name STRING")
    fd, fe = (table_fingerprint(x).collect()[0] for x in (d, e))
    assert fd.fingerprint == fe.fingerprint
    assert fd.n_rows != fe.n_rows


def test_quantile_map_normalize_aligns_sources(spark):
    from credigraph_spark.pipeline.sampling import quantile_map_normalize

    # source A scores inflated 10x vs source B, same internal ORDER:
    # after mapping, equal within-source quantiles get equal values
    rows = [(i, "A", float((i + 1) * 10)) for i in range(10)] \
        + [(100 + i, "B", float(i + 1)) for i in range(10)]
    df = spark.createDataFrame(rows, "id LONG, src STRING, s DOUBLE")
    out = {r.id: r for r in
           quantile_map_normalize(df, "src", "s", "id").collect()}
    # the rank-j element of A and of B map to the same global value
    for j in range(10):
        assert out[j].norm_value == out[100 + j].norm_value
    # mapping is monotone within each source
    for j in range(9):
        assert out[j].norm_value <= out[j + 1].norm_value
    # every normalized value is an ACTUAL global value (disc pick)
    allv = {r.norm_value for r in out.values()}
    raw = {v for _, _, v in rows}
    assert allv <= raw


def test_quantile_map_single_source_top_is_max(spark):
    from credigraph_spark.pipeline.sampling import quantile_map_normalize

    rows = [(i, "A", float(i)) for i in range(1, 8)]
    df = spark.createDataFrame(rows, "id LONG, src STRING, s DOUBLE")
    out = {r.id: r for r in
           quantile_map_normalize(df, "src", "s", "id").collect()}
    # one source: identity mapping
    assert all(out[i].norm_value == float(i) for i in range(1, 8))


def test_incremental_dedup_screen_semantics(spark):
    from credigraph_spark.pipeline.dedup import incremental_dedup_screen

    txt = "the quick brown fox jumps over the lazy dog tonight"
    rows = [
        (1, txt),                       # base (id % 3 != 0)
        (2, "totally unrelated content about spark engines here"),
        (3, txt),                       # NEW, dup of base doc 1
        (6, "fresh novel text that matches nothing in the base set"),
        (9, txt),                       # NEW, also dup of base doc 1
    ]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = {r.doc_id: r for r in
           incremental_dedup_screen(df, F.col("doc_id") % 3 != 0)
           .collect()}
    # only NEW docs are screened
    assert set(out) == {3, 6, 9}
    assert out[3].is_dup and out[3].n_base_matches == 1
    assert out[9].is_dup                   # matches base doc 1
    assert not out[6].is_dup and out[6].n_base_matches == 0
    # new-x-new collisions do NOT count: docs 3 and 9 are identical
    # to each other but only their BASE matches are reported
    assert out[3].n_base_matches == out[9].n_base_matches == 1


def test_cheirank_is_reverse_pagerank(spark):
    from credigraph_spark.graph import pagerank

    # star OUT of hub 0: pagerank crowns the leaves' shared target?
    # no -- hub has no in-links; CheiRank (reverse) crowns the hub
    edges = edges_df(spark, [(0, i) for i in range(1, 9)])
    rev = edges.select(F.col("dst").alias("src"),
                       F.col("src").alias("dst"))
    pr, _ = pagerank(edges, max_iter=5, tol=0.0)
    cr, _ = pagerank(rev, max_iter=5, tol=0.0)
    top_pr = pr.orderBy(F.desc("rank")).first().vid
    top_cr = cr.orderBy(F.desc("rank")).first().vid
    assert top_pr != 0          # the out-only hub is nobody's target
    assert top_cr == 0          # but it dominates the reversed graph


def test_source_datasheet_composition(spark):
    from credigraph_spark.pipeline.textstats import source_datasheet

    en = ("the quick brown fox and the lazy dog that it was for "
          "sure again")
    rows = [
        (1, "A", en), (2, "A", en),            # A: english, exact dups
        (4, "A", "xqz wvk unique alpha beta gamma delta words"),
        (3, "B", "le chat est une bete que les gens pour la vie"),
    ]
    df = spark.createDataFrame(rows,
                               "doc_id LONG, source STRING, text STRING")
    out = {r.source: r for r in source_datasheet(df).collect()}
    assert out["A"].n_docs == 3 and out["B"].n_docs == 1
    # A's lang-id: 2 of 3 docs are english
    assert out["A"].en_share == pytest.approx(2 / 3, abs=1e-6)
    assert out["B"].en_share == 0.0
    # docs 1 and 2 are identical -> both flagged near-dup
    assert out["A"].dup_doc_frac == pytest.approx(2 / 3, abs=1e-6)
    assert out["B"].dup_doc_frac == 0.0
    assert out["A"].mean_chars > 0


def test_er_edges_uniformity_and_determinism(spark):
    from credigraph_spark.graph.generate import er_edges

    e = er_edges(spark, n_vertices=64, n_draws=4000)
    rows = e.collect()
    assert len(rows) == 4000
    assert all(0 <= r.src < 64 and 0 <= r.dst < 64 for r in rows)
    # determinism
    rows2 = er_edges(spark, n_vertices=64, n_draws=4000).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))
    # uniformity: no vertex owns a wildly outsized share of endpoints
    from collections import Counter
    c = Counter([r.src for r in rows] + [r.dst for r in rows])
    assert max(c.values()) < 4 * (8000 / 64)
    # unlike R-MAT there is NO heavy tail: top vertex < 2x the median
    med = sorted(c.values())[len(c) // 2]
    assert max(c.values()) < 2 * med


def test_ws_edges_lattice_and_rewire_regimes(spark):
    from credigraph_spark.graph.generate import ws_edges

    # beta = 0: pure ring lattice, every dst = src + off (mod n)
    lat = ws_edges(spark, n_vertices=20, k_half=2,
                   beta_tenths=0).collect()
    assert len(lat) == 40
    assert all(not r.rewired for r in lat)
    assert all((r.dst - r.src) % 20 in (1, 2) for r in lat)
    # beta = 10: everything rewired
    rnd = ws_edges(spark, n_vertices=20, k_half=2,
                   beta_tenths=10).collect()
    assert all(r.rewired for r in rnd)
    # small-world regime: SOME rewired shortcuts, most lattice intact
    ws = ws_edges(spark, n_vertices=100, k_half=3,
                  beta_tenths=2).collect()
    n_re = sum(1 for r in ws if r.rewired)
    assert 0 < n_re < len(ws) // 2


def test_ws_edges_clustering_beats_er(spark):
    from credigraph_spark.graph.generate import er_edges, ws_edges
    from credigraph_spark.graph.triangles import triangle_count

    ws = ws_edges(spark, n_vertices=100, k_half=3, beta_tenths=1)
    er = er_edges(spark, n_vertices=100, n_draws=300)
    _, t_ws = triangle_count(ws.select("src", "dst"))
    _, t_er = triangle_count(er.select("src", "dst"))
    # the lattice's triangle structure survives light rewiring; ER at
    # the same density has almost none
    assert t_ws > 3 * max(t_er, 1)


def test_otsu_threshold_separates_bimodal(spark):
    from credigraph_spark.pipeline.classify import otsu_threshold

    # clean bimodal: cluster at ~5, cluster at ~95
    rows = [(5.0 + (i % 5) * 0.1,) for i in range(200)] \
        + [(95.0 + (i % 5) * 0.1,) for i in range(100)]
    df = spark.createDataFrame(rows, "x DOUBLE")
    out = otsu_threshold(df, "x", bins=16).collect()
    best = [r for r in out if r.is_best][0]
    # the best cut separates the two modes, splitting 200 / 100
    assert 10 < best.thr < 95
    assert best.n_below == 200 and best.n_above == 100
    assert sum(1 for r in out if r.is_best) == 1
    # conservation at every candidate cut
    assert all(r.n_below + r.n_above == 300 for r in out)


def test_otsu_threshold_flat_for_uniform(spark):
    from credigraph_spark.pipeline.classify import otsu_threshold

    df = spark.createDataFrame([(float(i),) for i in range(1000)],
                               "x DOUBLE")
    out = otsu_threshold(df, "x", bins=20).collect()
    best = max(r.between_var for r in out)
    # uniform data: criterion peaks mildly at the middle; the curve's
    # max stays far below a true bimodal split's variance scale
    mid = [r for r in out if r.is_best][0]
    assert 300 < mid.thr < 700
    assert best < ((999 / 2) ** 2) / 3


def test_circuit_rank_forest_and_cycles(spark):
    from credigraph_spark.analytics import circuit_rank

    # a tree: rank 0
    tree = edges_df(spark, [(1, 2), (1, 3), (3, 4)])
    r = circuit_rank(tree).collect()[0]
    assert (r.n_vertices, r.n_edges, r.n_components) == (4, 3, 1)
    assert r.circuit_rank == 0 and r.is_forest
    # a triangle + a disjoint 4-cycle: rank 2, 2 components
    g = edges_df(spark, [(1, 2), (2, 3), (3, 1),
                         (10, 11), (11, 12), (12, 13), (13, 10)])
    r2 = circuit_rank(g).collect()[0]
    assert r2.n_components == 2
    assert r2.circuit_rank == 2 and not r2.is_forest
