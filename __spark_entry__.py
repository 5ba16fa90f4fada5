"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes the engine's operator surface over the driver's
TPC-H-ish testdata; ``oracle_sql()`` gives DuckDB-equivalent SQL for every
query whose semantics a single SQL statement can express (iterative
algorithms are unrolled to a fixed superstep budget so they ARE
expressible; only genuinely open-ended convergence loops are rows-only).

The link graph used by graph queries is derived deterministically from
``lineitem``: edges (l_partkey -> l_suppkey), deduped, self-loops dropped —
the same contract as the engine's extraction output (SURVEY.md §1.1).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

SF_SMOKE = "/root/testdata/sf0.001"

# ---------------------------------------------------------------------------
# shared fragments
# ---------------------------------------------------------------------------

def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    from credigraph_spark.graph.adjacency import clean_edges

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst")
    )
    return clean_edges(li)

# DuckDB fragment: the same cleaned edge table.
_E_SQL = ("SELECT DISTINCT l_partkey AS src, l_suppkey AS dst FROM lineitem "
          "WHERE l_partkey <> l_suppkey")
_UND_SQL = (f"SELECT src, dst FROM ({_E_SQL}) UNION "
            f"SELECT dst AS src, src AS dst FROM ({_E_SQL})")
_VERTS_SQL = f"SELECT src AS vid FROM ({_E_SQL}) UNION SELECT dst FROM ({_E_SQL})"

# DuckDB fragment: distinct 3-word shingles per document.
_SHINGLES_SQL = r"""
sets AS (
  SELECT doc_id AS id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(w) - 2, 1)),
           i -> array_to_string(w[i:i+2], ' ')
         )) AS sh_set
  FROM (SELECT doc_id, string_split_regex(lower(text), '\s+') AS w FROM documents)
)"""


# ---------------------------------------------------------------------------
# graph queries
# ---------------------------------------------------------------------------

def q_degree_counts(spark, sf_dir):
    from credigraph_spark.analytics import total_degree_counts

    return total_degree_counts(_edges(spark, sf_dir))


def q_in_out_degrees(spark, sf_dir):
    from credigraph_spark.graph.adjacency import degrees

    return degrees(_edges(spark, sf_dir))


def q_density(spark, sf_dir):
    from credigraph_spark.analytics import density

    return density(_edges(spark, sf_dir))


def q_degree_filter(spark, sf_dir):
    from credigraph_spark.analytics import degree_filter

    _, kept_edges = degree_filter(_edges(spark, sf_dir), min_degree=25)
    return kept_edges


def q_triangles(spark, sf_dir):
    from credigraph_spark.graph import triangle_count

    per_vertex, _ = triangle_count(_edges(spark, sf_dir))
    return per_vertex


def q_clustering_coeff(spark, sf_dir):
    from credigraph_spark.graph import clustering_coefficient

    return clustering_coefficient(_edges(spark, sf_dir))


def q_avg_neighbor_degree(spark, sf_dir):
    """Per-vertex mean neighbor degree (local assortativity view),
    exact integer sums / single division — no rounding."""
    from credigraph_spark.analytics import avg_neighbor_degree

    return avg_neighbor_degree(_edges(spark, sf_dir))


def q_degree_histogram(spark, sf_dir):
    """Log2-binned undirected degree histogram — all-integer."""
    from credigraph_spark.analytics import degree_histogram

    return degree_histogram(_edges(spark, sf_dir))


def q_rich_club(spark, sf_dir):
    """Rich-club coefficient at k=40 on the undirected lineitem graph:
    how densely the >k-degree hubs interconnect. All-integer counts,
    exact ratio — no rounding."""
    from credigraph_spark.analytics import rich_club

    return rich_club(_edges(spark, sf_dir), k=40)


def q_reciprocity(spark, sf_dir):
    from credigraph_spark.analytics import reciprocity

    return reciprocity(_edges(spark, sf_dir))


def q_assortativity(spark, sf_dir):
    from credigraph_spark.analytics import degree_assortativity

    return degree_assortativity(_edges(spark, sf_dir))


def q_hits3(spark, sf_dir):
    from credigraph_spark.graph import hits

    return hits(_edges(spark, sf_dir), max_iter=3)


def q_kcore3(spark, sf_dir):
    from credigraph_spark.graph import k_core

    result, _ = k_core(_edges(spark, sf_dir), k=30, max_rounds=3)
    return result


def q_score_2round(spark, sf_dir):
    """Weighted k-core (s-core): peel vertices with summed incident
    weight < 900 for 2 fixed rounds, weight = summed integer l_quantity
    per (partkey, suppkey) pair — exact longs, so strengths compare
    bit-identically."""
    from credigraph_spark.graph import s_core

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst"),
        F.col("l_quantity").cast("bigint").alias("w"))
    wedges = li.groupBy("src", "dst").agg(F.sum("w").alias("w"))
    result, _ = s_core(wedges, s=900, max_rounds=2)
    return result


def q_coreness(spark, sf_dir):
    """Capped fixed-round coreness decomposition (k_max=4, 2 peel rounds
    per phase): vertices dropped in phase k get core k-1, phase-4
    survivors get 4. Fixed rounds make the mid-convergence state
    deterministic, so the unrolled DuckDB peel is an exact oracle; the
    unbounded API (coreness(edges)) peels each phase to fixpoint."""
    from credigraph_spark.graph import coreness

    out = coreness(_edges(spark, sf_dir), k_max=4, rounds_per_k=2)
    return out.select("vid", F.col("core").cast("long").alias("core"))


def q_pagerank5(spark, sf_dir):
    from credigraph_spark.graph import pagerank

    ranks, _ = pagerank(_edges(spark, sf_dir), max_iter=5, tol=0.0)
    return ranks.select("vid", F.round("rank", 8).alias("rank"))


def q_pagerank_timedecay(spark, sf_dir):
    """Time-decayed weighted PageRank: each lineitem edge occurrence is
    weighted 1/(1 + age_days) relative to the newest order date (joined
    from orders), summed per (src, dst) pair — recency-weighted
    centrality, the temporal composition of the weighted sparse loop.
    The decay is one exact integer datediff + one division, identical in
    both engines; pair-sum order noise (~1e-16 relative) sits 12 orders
    of magnitude under the 8dp output rounding."""
    from credigraph_spark.graph import pagerank

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    maxd = o.agg(F.max(F.to_date("o_orderdate")).alias("maxd"))
    e = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .crossJoin(F.broadcast(maxd))
        .where(F.col("l_partkey") != F.col("l_suppkey"))
        .select(
            F.col("l_partkey").alias("src"),
            F.col("l_suppkey").alias("dst"),
            (F.lit(1.0) / (F.lit(1.0) + F.datediff(
                "maxd", F.to_date("o_orderdate")))).alias("w"))
        .groupBy("src", "dst").agg(F.sum("w").alias("w"))
    )
    ranks, _ = pagerank(e, max_iter=5, tol=0.0, weight_col="w")
    return ranks.select("vid", F.round("rank", 8).alias("rank"))


def q_pagerank_incremental(spark, sf_dir):
    """Incremental PageRank across crawl snapshots as an oracle query:
    5 fixed iterations on the OLD snapshot (edges with at least one
    supporting lineitem row where l_orderkey % 10 != 0), then 5 warm-started
    iterations on the FULL graph seeded from the old ranks (receivers
    keep their previous rank, new/non-receiver vertices get 1/N, total
    mass renormalized to 1 — graph/pagerank.py warm-start semantics,
    mirrored CTE-for-CTE in the oracle). The driver-visible form of the
    engine's daily-refresh story: S9 resume + init_ranks as one query."""
    from credigraph_spark.graph import pagerank
    from credigraph_spark.graph.adjacency import clean_edges

    li = _t(spark, sf_dir, "lineitem")
    old = clean_edges(
        li.where(F.col("l_orderkey") % 10 != 0).select(
            F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst")))
    init, _ = pagerank(old, max_iter=5, tol=0.0)
    ranks, _ = pagerank(_edges(spark, sf_dir), max_iter=5, tol=0.0,
                        init_ranks=init)
    return ranks.select("vid", F.round("rank", 8).alias("rank"))


def q_pagerank_weighted5(spark, sf_dir):
    """Weighted PageRank, 5 fixed iterations: contribution ∝ edge weight
    (summed l_quantity over parallel (partkey, suppkey) pairs — integer-
    valued doubles, so the weight sums are exact in both engines)."""
    from credigraph_spark.graph import pagerank

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst"),
        F.col("l_quantity").cast("double").alias("w"),
    )
    ranks, _ = pagerank(li, max_iter=5, tol=0.0, weight_col="w")
    return ranks.select("vid", F.round("rank", 8).alias("rank"))


def q_connected_components(spark, sf_dir):
    from credigraph_spark.graph import connected_components

    labels, _ = connected_components(_edges(spark, sf_dir))
    return labels


def q_cc_incremental(spark, sf_dir):
    """Incremental CC: full label exchange on 6/7 of the edges, then the
    remaining delta folded in through the label-condensed graph — the
    oracle is the FULL recompute, so green == bit-identical composition
    (graph/components.py:connected_components_incremental)."""
    from credigraph_spark.graph import (
        connected_components, connected_components_incremental)

    edges = _edges(spark, sf_dir)
    is_delta = F.pmod(F.col("src") + F.col("dst"), F.lit(7)) == 0
    prev, _ = connected_components(edges.where(~is_delta))
    labels, _ = connected_components_incremental(prev,
                                                 edges.where(is_delta))
    return labels


def q_scc(spark, sf_dir):
    """Strongly connected components (trim + FW-BW coloring);
    scc_id = max vid in the component, so the oracle is the recursive
    closure's greatest(vid, max mutually-reachable vid)."""
    from credigraph_spark.graph import strongly_connected_components

    labels, _ = strongly_connected_components(_edges(spark, sf_dir))
    return labels


def q_bowtie(spark, sf_dir):
    """Broder bow-tie classes relative to the largest SCC (ties by
    smaller scc_id): core / in / out / other."""
    from credigraph_spark.graph import bowtie_classes

    return bowtie_classes(_edges(spark, sf_dir))


def q_lpa3(spark, sf_dir):
    from credigraph_spark.graph import label_propagation

    labels, _ = label_propagation(_edges(spark, sf_dir), max_iter=3)
    return labels


def q_lpa_weighted3(spark, sf_dir):
    """Weighted LPA, 3 fixed supersteps: neighbor labels vote with the
    summed l_quantity undirected edge weight (integer-valued doubles, so
    the vote sums — and therefore the argmax tie-breaks — are exact in
    both engines)."""
    from credigraph_spark.graph import label_propagation

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst"),
        F.col("l_quantity").cast("double").alias("w"),
    )
    labels, _ = label_propagation(li, max_iter=3, weight_col="w")
    return labels


def q_sample_neighbors(spark, sf_dir):
    from credigraph_spark.graph import sample_neighbors

    return sample_neighbors(_edges(spark, sf_dir), k=3, seed=42)


def q_nhop2(spark, sf_dir):
    from credigraph_spark.graph import n_hop_subgraph

    edges = _edges(spark, sf_dir)
    seeds = (
        edges.select(F.col("src").alias("vid"))
        .unionByName(edges.select(F.col("dst").alias("vid")))
        .distinct().orderBy("vid").limit(3)
    )
    verts, _ = n_hop_subgraph(edges, seeds, n_hop=2)
    return verts


def q_neighbor_avg_outdeg(spark, sf_dir):
    """Pregel-style aggregate_messages: each vertex's mean in-neighbor
    out-degree — one gather call on the reusable primitive."""
    from credigraph_spark.graph import aggregate_messages
    from credigraph_spark.graph.adjacency import out_degrees

    edges = _edges(spark, sf_dir)
    deg = out_degrees(edges)
    return aggregate_messages(
        edges, deg, to_dst=F.col("src_out_deg"),
        agg={"nbr_avg_outdeg": F.avg, "n_in": F.count},
        attach=("src",),  # message reads src_* only: skip the dead dst join
    )


# ---------------------------------------------------------------------------
# relational / windows / enrichment
# ---------------------------------------------------------------------------

def q_top2_per_group(spark, sf_dir):
    from credigraph_spark.content import top_bottom_k_per_group

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    return top_bottom_k_per_group(docs, "lang", "n_chars", k=2, tiebreak="doc_id")


def q_topk_customers(spark, sf_dir):
    from credigraph_spark.analytics import top_k_by

    return top_k_by(_t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal"),
                    "c_acctbal", k=20, tiebreak="c_custkey")


def q_order_rollup(spark, sf_dir):
    """Multi-level ROLLUP aggregate over orders: (priority, status),
    per-priority subtotals and the grand total in one pass — Spark's
    rollup() compiles to a single Expand + partial-aggregated
    HashAggregate, the cube surface a reporting layer needs. NULL group
    keys are the subtotal markers in both engines; price sums are rounded
    to 2dp (summation order differs across engines)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.rollup("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("total_price"))
    )


def q_customers_without_orders(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o.select(F.col("o_custkey").alias("c_custkey")), "c_custkey", "left_anti") \
            .select("c_custkey")


def q_binarize_users(spark, sf_dir):
    from credigraph_spark.enrich import average_binarize_labels

    ev = _t(spark, sf_dir, "events").select(F.col("user_id"), F.col("value").alias("label"))
    return average_binarize_labels(ev, key="user_id", threshold=50.0)


def q_iso_week_counts(spark, sf_dir):
    from credigraph_spark.functions import iso_week_monday_yyyymmdd

    return (
        _t(spark, sf_dir, "events")
        .select(iso_week_monday_yyyymmdd(F.col("ts")).alias("week_monday"))
        .groupBy("week_monday").agg(F.count("*").alias("n_events"))
    )


def q_degree_growth(spark, sf_dir):
    """Temporal degree evolution: per-supplier monthly edge-occurrence
    counts (order date joined from orders) with the month-over-month
    delta via LAG — the 'who is gaining links' scan of a crawl series.
    All-integer outputs; the per-vertex window is bounded by the number
    of months, never the corpus."""
    from pyspark.sql.window import Window

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(F.col("l_suppkey").alias("vid"),
                F.date_format("o_orderdate", "yyyy-MM").alias("month"))
        .groupBy("vid", "month").agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("vid").orderBy("month")
    return c.select("vid", "month", "n",
                    (F.col("n") - F.lag("n").over(w)).alias("delta"))


def q_latest_snapshot(spark, sf_dir):
    """Temporal slices: weekly per-user event counts, then the most recent
    slice row per user via the struct-max latest_snapshot (aggregation,
    not a window)."""
    from credigraph_spark.functions import iso_week_monday_yyyymmdd
    from credigraph_spark.temporal import latest_snapshot

    weekly = (
        _t(spark, sf_dir, "events")
        .groupBy(F.col("user_id").alias("vid"),
                 iso_week_monday_yyyymmdd(F.col("ts")).alias("ts"))
        .agg(F.count("*").alias("n_events"))
    )
    return latest_snapshot(weekly)


def q_snapshot_diff(spark, sf_dir):
    """Crawl-over-crawl edge churn: two deterministic lineitem-derived
    edge snapshots (l_linenumber <= 4 vs >= 2) full-outer diffed into
    added/removed/kept."""
    from credigraph_spark.graph.adjacency import clean_edges
    from credigraph_spark.temporal import snapshot_diff

    li = _t(spark, sf_dir, "lineitem")
    def snap(cond):
        return clean_edges(li.where(cond).select(
            F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst")))
    return snapshot_diff(snap(F.col("l_linenumber") <= 4),
                         snap(F.col("l_linenumber") >= 2))


def q_event_transitions(spark, sf_dir):
    """First-order Markov transition graph of the event stream: per-user
    LEAD over (ts, event_id), pair counts, int/int transition
    probabilities (exact in both engines)."""
    from credigraph_spark.temporal import event_transition_graph

    return event_transition_graph(_t(spark, sf_dir, "events"))


def q_event_window_stats(spark, sf_dir):
    """Tumbling 1-day event-time windows over the events table: count and
    mean value per (day, event_type). Spark's window() is epoch-aligned,
    so the window start equals date_trunc('day') for daily widths."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"),
             F.round(F.avg("value"), 8).alias("mean_value"))
        .select(F.date_format(F.col("w.start"), "yyyy-MM-dd").alias("day"),
                "event_type", "n_events", "mean_value")
    )


def q_json_extract(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .select(F.get_json_object("props", "$.k").cast("long").alias("k"))
        .groupBy("k").agg(F.count("*").alias("n"))
    )


def q_reverse_normalize(spark, sf_dir):
    from credigraph_spark.functions import normalize_domain, reverse_host

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.concat(F.lit("www."), F.col("source"), F.lit(".Example.COM")).alias("domain")
    )
    return docs.select(
        "doc_id",
        normalize_domain(F.col("domain")).alias("normalized"),
        reverse_host(normalize_domain(F.col("domain"))).alias("reversed"),
    )


def q_suffix_scores(spark, sf_dir):
    from credigraph_spark.enrich import longest_suffix_match

    docs = _t(spark, sf_dir, "documents").select(
        F.concat(F.col("source"), F.lit(".example.com")).alias("domain")
    )
    rated = spark.createDataFrame(
        [("example.com", 1.0), ("src1.example.com", 2.0), ("other.org", 9.0)],
        ["domain", "pc1"],
    )
    return longest_suffix_match(docs, rated).select("domain", "pc1")


# URL fixture shared by surt_hosts: deterministic per-doc URL mixing the
# interesting branches (www-strip, ccTLD, IP rejection, generic scheme,
# protocol-relative, single-label rejection).
def _url_expr_spark():
    m = F.col("doc_id") % 6
    return (
        F.when(m == 0, F.concat(F.lit("https://www."), F.col("source"), F.lit(".Example.COM/path?q=1")))
        .when(m == 1, F.concat(F.lit("http://"), F.col("source"), F.lit(".co.uk./page")))
        .when(m == 2, F.lit("http://1.2.3.4/"))
        .when(m == 3, F.concat(F.lit("ftp://files."), F.col("source"), F.lit(".org")))
        .when(m == 4, F.concat(F.lit("//cdn."), F.col("source"), F.lit(".net/x")))
        .otherwise(F.lit("localhost"))
    )


_URL_EXPR_SQL = """CASE doc_id % 6
    WHEN 0 THEN 'https://www.' || source || '.Example.COM/path?q=1'
    WHEN 1 THEN 'http://' || source || '.co.uk./page'
    WHEN 2 THEN 'http://1.2.3.4/'
    WHEN 3 THEN 'ftp://files.' || source || '.org'
    WHEN 4 THEN '//cdn.' || source || '.net/x'
    ELSE 'localhost' END"""


def q_surt_hosts(spark, sf_dir):
    from credigraph_spark.functions import get_surt_host

    docs = _t(spark, sf_dir, "documents").select("doc_id", _url_expr_spark().alias("url"))
    return docs.select("doc_id", get_surt_host(F.col("url")).alias("surt_host"))


def q_extract_domains(spark, sf_dir):
    from credigraph_spark.functions import extract_domain

    m = F.col("doc_id") % 5
    raw = (
        F.when(m == 0, F.concat(F.col("source"), F.lit(".Example.COM")))
        .when(m == 1, F.concat(F.lit("https://"), F.col("source"), F.lit(".example.com/path")))
        .when(m == 2, F.concat(F.lit('"'), F.col("source"), F.lit('.example.com"')))
        .when(m == 3, F.concat(F.col("source"), F.lit(".example.com:8080")))
        .otherwise(F.lit("not a domain"))
    )
    docs = _t(spark, sf_dir, "documents").select("doc_id", raw.alias("raw"))
    return docs.select("doc_id", extract_domain(F.col("raw")).alias("domain"))


# small exact-rule PSL subset shared by the etld1_flip query and its oracle
# (the FULL vendored PSL incl. wildcards/exceptions is pytest-covered; the
# driver check uses an explicit subset so the DuckDB side can inline it).
_FLIP_RULES = ["com", "net", "org", "uk", "co.uk", "org.uk", "au", "com.au"]


def q_etld1_flip(spark, sf_dir):
    from credigraph_spark.functions import flip_if_needed_frame, psl_rules_df

    m = F.col("doc_id") % 4
    dom = (
        F.when(m == 0, F.concat(F.col("source"), F.lit(".com")))
        .when(m == 1, F.concat(F.lit("co.uk."), F.col("source")))
        .when(m == 2, F.concat(F.lit("www."), F.col("source"), F.lit(".com.au")))
        .otherwise(F.col("source"))
    )
    docs = _t(spark, sf_dir, "documents").select("doc_id", dom.alias("domain"))
    rules = psl_rules_df(spark, _FLIP_RULES)
    return flip_if_needed_frame(docs, "domain", out_col="etld1", rules_df=rules) \
        .select("doc_id", "domain", "etld1")


def q_json_fields(spark, sf_dir):
    from credigraph_spark.extraction import extract_json_fields

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.concat(F.lit('{"meta":{"type":"'), F.col("event_type"),
                 F.lit('","uid":'), F.col("user_id").cast("string"),
                 F.lit('},"payload":'), F.col("props"), F.lit("}")).alias("j"),
    )
    return extract_json_fields(
        ev, "j",
        "meta STRUCT<type: STRING, uid: BIGINT>, payload STRUCT<k: BIGINT>",
        {"etype": "meta.type", "uid": "meta.uid", "k": "payload.k"},
    )


# ---------------------------------------------------------------------------
# training-data pipeline
# ---------------------------------------------------------------------------

def q_exact_dedup(spark, sf_dir):
    from credigraph_spark.pipeline import exact_dedup

    return exact_dedup(_t(spark, sf_dir, "documents"))


def q_minhash_signatures(spark, sf_dir):
    from credigraph_spark.pipeline import minhash_signatures

    return minhash_signatures(_t(spark, sf_dir, "documents"), num_hashes=4)


def q_lsh_pairs(spark, sf_dir):
    from credigraph_spark.pipeline import lsh_candidate_pairs

    return lsh_candidate_pairs(_t(spark, sf_dir, "documents"),
                               num_hashes=4, rows_per_band=2)


def q_dedup_canonical(spark, sf_dir):
    """End-to-end dedup: LSH pairs -> CC transitive closure -> canonical
    (= min) doc id per near-dup cluster, one row per document. Same LSH
    parameters as q_lsh_pairs so the oracle composes its CTE chain with
    the recursive hash-min flooding."""
    from credigraph_spark.pipeline import dedup_canonical

    return dedup_canonical(_t(spark, sf_dir, "documents"),
                           num_hashes=4, rows_per_band=2)


def q_jaccard_pairs(spark, sf_dir):
    from credigraph_spark.pipeline import ngram_jaccard_pairs

    return ngram_jaccard_pairs(_t(spark, sf_dir, "documents"), threshold=0.2)


def q_simhash_pairs(spark, sf_dir):
    from credigraph_spark.pipeline import simhash_near_dups

    # pigeonhole blocking detects hamming <= n_tables-1, so max_hamming=12
    # needs n_tables=16 (the operator rejects anything smaller).
    return simhash_near_dups(_t(spark, sf_dir, "documents"),
                             max_hamming=12, n_tables=16)


def q_text_quality(spark, sf_dir):
    from credigraph_spark.pipeline import text_quality

    return text_quality(_t(spark, sf_dir, "documents"))


def q_language_id(spark, sf_dir):
    from credigraph_spark.pipeline import language_id

    return language_id(_t(spark, sf_dir, "documents"))


def q_repetition_stats(spark, sf_dir):
    """Gopher-style repetition signals per document: unique-token
    fraction, top-bigram coverage, duplicated-trigram fraction — all
    per-row array expressions, zero shuffle. Both engines compute the
    identical double formulas on identical integer counts, so values
    compare exactly without rounding (same contract as text_quality)."""
    from credigraph_spark.pipeline import repetition_stats

    return repetition_stats(_t(spark, sf_dir, "documents"))


def q_char_entropy(spark, sf_dir):
    """Per-doc Shannon character entropy (bits/char) — the cheap
    perplexity proxy of corpus curation. 6dp-rounded (fold order over
    distinct chars differs across engines below that)."""
    from credigraph_spark.pipeline import char_entropy

    return char_entropy(_t(spark, sf_dir, "documents"))


def q_contamination(spark, sf_dir):
    """Benchmark-contamination screen: corpus docs (doc_id % 20 != 0)
    sharing >= 3 distinct 5-gram shingles with the simulated benchmark
    suite (doc_id % 20 == 0). The benchmark shingle set is broadcast;
    the corpus side never shuffles before the per-doc count."""
    from credigraph_spark.pipeline import benchmark_contamination

    docs = _t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 20 != 0)
    bench = docs.where(F.col("doc_id") % 20 == 0)
    return benchmark_contamination(corpus, bench, shingle_n=5, min_shared=3)


def q_fingerprints(spark, sf_dir):
    from credigraph_spark.pipeline import document_fingerprint

    return document_fingerprint(_t(spark, sf_dir, "documents")).select("doc_id", "fingerprint")


def q_cosine_topk(spark, sf_dir):
    from credigraph_spark.pipeline import cosine_topk_bruteforce

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.where(F.col("vec_id") < 5)
    out = cosine_topk_bruteforce(queries, emb, k=5)
    return out.select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))


def q_ann_lsh_topk(spark, sf_dir):
    from credigraph_spark.pipeline import lsh_bucketed_topk

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.where(F.col("vec_id") < 5)
    # md5-derived ±1 hyperplanes + 6dp rank ordering -> the bucket keys and
    # the ranking are bit-reproducible in DuckDB (full oracle, not rows-only)
    out = lsh_bucketed_topk(queries, emb, k=5, bits_per_table=4, n_tables=6,
                            seed=7, round_digits=6)
    return out.select("query_id", "neighbor_id", "rank")


def q_ann_recall(spark, sf_dir):
    """Recall@10 of the LSH-bucketed ANN vs exact brute-force cosine,
    measured in-engine (pipeline.ann_recall_at_k): per query n_exact,
    n_hits and the recall fraction. Both rankings use the rounded-cosine
    (6dp) cross-engine-stable ordering."""
    from credigraph_spark.pipeline import (ann_recall_at_k,
                                           cosine_topk_bruteforce,
                                           lsh_bucketed_topk)

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    queries = emb.where(F.col("vec_id") < 5)
    exact = cosine_topk_bruteforce(queries, emb, k=10, round_digits=6)
    approx = lsh_bucketed_topk(queries, emb, k=10, bits_per_table=4,
                               n_tables=6, seed=7, round_digits=6)
    return ann_recall_at_k(approx, exact, k=10)


def _ann_recall_sql(bits_per_table: int = 4, n_tables: int = 6,
                    seed: int = 7, k: int = 10) -> str:
    """DuckDB mirror of q_ann_recall: the exact chain (rounded-cosine
    ranking) + the _ann_lsh_sql bucket chain, intersected per query."""
    total_bits = bits_per_table * n_tables
    sign = ("(CASE WHEN (('0x' || substr(md5('" + str(seed) +
            "' || ':' || b || ':' || (i - 1)), 1, 8))::BIGINT % 2) = 0 "
            "THEN 1.0 ELSE -1.0 END)")

    def dot(x, y):
        return (f"list_sum(list_transform(generate_series(1, len({x})), "
                f"i -> {x}[i]::DOUBLE * {y}[i]::DOUBLE))")

    def nrm(x):
        return f"sqrt({dot(x, x)})"

    return f"""
WITH e AS MATERIALIZED (SELECT vec_id, embedding FROM embeddings),
q AS (SELECT vec_id AS query_id, embedding AS qv FROM e WHERE vec_id < 5),
xsc AS (
  SELECT q.query_id, c.vec_id AS neighbor_id,
         {dot('q.qv', 'c.embedding')}
           / ({nrm('q.qv')} * {nrm('c.embedding')}) AS cosine
  FROM q, e c WHERE c.vec_id <> q.query_id
),
xr AS (SELECT query_id, neighbor_id, ROW_NUMBER() OVER
  (PARTITION BY query_id ORDER BY ROUND(cosine, 6) DESC, neighbor_id ASC) AS rank
  FROM xsc),
ex AS (SELECT query_id, neighbor_id FROM xr WHERE rank <= {k}),
bits AS (
  SELECT vec_id, b,
    CASE WHEN list_sum(list_transform(generate_series(1, len(embedding)),
      i -> embedding[i]::DOUBLE * {sign})) > 0 THEN 1 ELSE 0 END AS bit
  FROM e, (SELECT unnest(generate_series(0, {total_bits - 1})) AS b)
),
keys AS (
  SELECT vec_id, b // {bits_per_table} AS table_idx,
         SUM(bit * (1::BIGINT << (b % {bits_per_table})))::BIGINT AS bucket
  FROM bits GROUP BY vec_id, b // {bits_per_table}
),
qk AS (SELECT vec_id AS query_id, table_idx, bucket FROM keys WHERE vec_id < 5),
ck AS (SELECT vec_id AS neighbor_id, table_idx, bucket FROM keys),
prs AS (
  SELECT DISTINCT query_id, neighbor_id
  FROM qk JOIN ck USING (table_idx, bucket) WHERE query_id <> neighbor_id
),
asc_ AS (
  SELECT p.query_id, p.neighbor_id,
         {dot('a.embedding', 'b2.embedding')}
           / ({nrm('a.embedding')} * {nrm('b2.embedding')}) AS cosine
  FROM prs p JOIN e a ON a.vec_id = p.query_id
  JOIN e b2 ON b2.vec_id = p.neighbor_id
),
ar AS (SELECT query_id, neighbor_id, ROW_NUMBER() OVER
  (PARTITION BY query_id ORDER BY ROUND(cosine, 6) DESC, neighbor_id ASC) AS rank
  FROM asc_),
ap AS (SELECT query_id, neighbor_id FROM ar WHERE rank <= {k}),
hits AS (SELECT ex.query_id, COUNT(*) AS n_hits
         FROM ex JOIN ap USING (query_id, neighbor_id) GROUP BY 1),
base AS (SELECT query_id, COUNT(*) AS n_exact FROM ex GROUP BY 1)
SELECT b.query_id, b.n_exact,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       ROUND(COALESCE(h.n_hits, 0) * 1.0 / b.n_exact, 8) AS recall
FROM base b LEFT JOIN hits h ON h.query_id = b.query_id
"""


def q_ppr5(spark, sf_dir):
    """Personalized PageRank from the 3 smallest vids, 5 fixed
    iterations; only the walk's reachable set carries rows."""
    from credigraph_spark.graph import personalized_pagerank

    edges = _edges(spark, sf_dir)
    seeds = (
        edges.select(F.col("src").alias("vid"))
        .unionByName(edges.select(F.col("dst").alias("vid")))
        .distinct().orderBy("vid").limit(3)
    )
    out = personalized_pagerank(edges, seeds, max_iter=5)
    return out.select("vid", F.round("rank", 8).alias("rank"))


def q_ppr_batch(spark, sf_dir):
    """Batch per-seed PPR (3 iterations, 5 seeds): every seed gets its
    own independent personalized view in ONE pass over the shared edge
    scans — state keyed (seed, vid). Returns (seed, vid, rank) for pairs
    with nonzero mass."""
    from credigraph_spark.graph import ppr_batch

    edges = _edges(spark, sf_dir)
    seeds = (
        edges.select(F.col("src").alias("vid"))
        .unionByName(edges.select(F.col("dst").alias("vid")))
        .distinct().orderBy("vid").limit(5)
    )
    out = ppr_batch(edges, seeds, max_iter=3)
    return out.select("seed", "vid", F.round("rank", 8).alias("rank"))


def q_ppr_weighted5(spark, sf_dir):
    """Weighted personalized PageRank from the 3 smallest vids: the walk
    forwards mass proportionally to summed l_quantity edge weights."""
    from credigraph_spark.graph import personalized_pagerank

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst"),
        F.col("l_quantity").cast("double").alias("w"),
    )
    edges = _edges(spark, sf_dir)
    seeds = (
        edges.select(F.col("src").alias("vid"))
        .unionByName(edges.select(F.col("dst").alias("vid")))
        .distinct().orderBy("vid").limit(3)
    )
    out = personalized_pagerank(li, seeds, max_iter=5, weight_col="w")
    return out.select("vid", F.round("rank", 8).alias("rank"))


def q_spam_mass(spark, sf_dir):
    """TrustRank + relative spam mass (Gyongyi et al. 2004/2006): 3
    PageRank iterations and 3 TrustRank iterations (teleport restricted
    to the 5 top-in-degree trusted seeds), spam_mass = (PR-TR)/PR per
    vertex. The credibility signal the reference's whole pipeline exists
    to serve, composed from the two existing rank loops — same sparse
    PPR state, same dense PR state, one vid join at the end."""
    from credigraph_spark.graph import spam_mass, top_indegree_seeds

    edges = _edges(spark, sf_dir)
    out = spam_mass(edges, top_indegree_seeds(edges, 5), max_iter=3)
    return out.select(
        "vid", F.round("pr", 8).alias("pr"), F.round("tr", 8).alias("tr"),
        F.round("spam_mass", 8).alias("spam_mass"))


def q_gopher_quality(spark, sf_dir):
    """Gopher document-quality rules over the documents table (word-count
    bounds, mean word length, alpha fraction, distinct-stopword floor) —
    stopword set adapted to the synthetic corpus vocabulary ('the','a')
    so the rule actually partitions the data. Every signal is a per-row
    array fold; ratios are single exact int/int divisions."""
    from credigraph_spark.pipeline.textstats import gopher_quality

    return gopher_quality(_t(spark, sf_dir, "documents"),
                          stopwords=("the", "a"), min_stopwords=2) \
        .withColumn("keep", F.col("keep").cast("long"))


def q_c4_line_stats(spark, sf_dir):
    """C4 line-level cleaning over a deterministically derived multi-line
    corpus (the synthetic documents are single-line; ' value ' -> '.\\n'
    inserts sentence breaks IDENTICALLY in both engines): per doc, lines
    surviving the terminal-punctuation + min-words + boilerplate rules,
    surviving word mass, and the keep decision."""
    from credigraph_spark.pipeline.textstats import c4_line_stats

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr("replace(text, ' value ', concat('.', chr(10)))").alias("text"))
    return c4_line_stats(docs, min_words_per_line=5, min_kept_lines=2) \
        .withColumn("keep", F.col("keep").cast("long"))


def q_dsir_weights(spark, sf_dir):
    """DSIR hashed-n-gram importance weights over the documents table;
    the in-domain target is the same deterministic doc_id % 20 == 0
    subset the contamination screen uses as its benchmark."""
    from credigraph_spark.pipeline.textstats import dsir_importance

    docs = _t(spark, sf_dir, "documents")
    return dsir_importance(docs, target=F.col("doc_id") % 20 == 0)


def _dsir_sql() -> str:
    """DuckDB mirror of q_dsir_weights: identical tokenizer, uni+bigram
    list, md5-hex-prefix bucketing (256 buckets), Laplace-smoothed
    log-ratio, 6dp-rounded per-doc sum."""
    return r"""
        WITH t AS (
          SELECT doc_id, doc_id % 20 = 0 AS tgt,
                 list_filter(string_split_regex(lower(text), '\s+'),
                             x -> x != '') AS w
          FROM documents),
        f AS (
          SELECT doc_id, tgt,
                 unnest(w || CASE WHEN len(w) >= 2 THEN
                   list_transform(range(1, len(w)),
                                  i -> w[i] || ' ' || w[i+1])
                   ELSE [] END) AS feat
          FROM t),
        b AS (SELECT doc_id, tgt, substring(md5(feat), 1, 2) AS b FROM f),
        c AS (SELECT b, COUNT(*) AS cnt,
                     SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS tcnt
              FROM b GROUP BY b),
        tot AS (SELECT SUM(cnt) AS rt, SUM(tcnt) AS tt FROM c),
        r AS (SELECT b, ln((tcnt + 1.0) / (tt + 256.0))
                       - ln((cnt + 1.0) / (rt + 256.0)) AS lr
              FROM c, tot),
        d AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
                     ROUND(SUM(lr), 6) AS logw
              FROM b JOIN r USING (b) GROUP BY doc_id)
        SELECT t.doc_id,
               COALESCE(d.n_feats, 0) AS n_feats,
               COALESCE(d.logw, 0.0) AS logw
        FROM t LEFT JOIN d ON t.doc_id = d.doc_id"""


def q_quantize_int8(spark, sf_dir):
    """Symmetric int8 quantization reconstruction audit over the
    embeddings table (per-row array folds, zero shuffle)."""
    from credigraph_spark.pipeline.similarity import quantize_int8_stats

    return quantize_int8_stats(_t(spark, sf_dir, "embeddings"))


def _quantize_sql() -> str:
    """DuckDB mirror of quantize_int8_stats: identical scale/round/clamp
    and error folds over the FLOAT[]→DOUBLE vector."""
    return r"""
        WITH t AS (
          SELECT vec_id, CAST(len(embedding) AS BIGINT) AS dim,
                 list_transform(embedding, v -> v::DOUBLE) AS x
          FROM embeddings),
        s AS (
          SELECT vec_id, dim, x,
                 list_max(list_transform(x, v -> abs(v))) / 127.0 AS scale
          FROM t),
        e AS (
          SELECT vec_id, dim, scale,
                 list_transform(x, v -> abs(v - CASE WHEN scale > 0
                   THEN greatest(-127.0, least(127.0, round(v / scale)))
                   ELSE 0.0 END * scale)) AS err
          FROM s)
        SELECT vec_id, dim, ROUND(scale, 8) AS scale,
               CASE WHEN dim > 0 THEN
                 ROUND(list_reduce(list_transform(err, v -> v * v),
                                   (a, b) -> a + b) / dim, 8)
               ELSE 0.0 END AS mse,
               ROUND(COALESCE(list_max(err), 0.0), 8) AS max_err
        FROM e"""


def q_simrank2_topk(spark, sf_dir):
    """Top-20 vertex pairs by 2-iteration SimRank (c=0.8), candidate-
    pruned to the top-100 s1 (cocitation) pairs — the scalable
    generate-then-refine shape (graph/simrank.py)."""
    from credigraph_spark.graph.simrank import simrank2_topk

    return simrank2_topk(_edges(spark, sf_dir), c=0.8,
                         n_candidates=100, k=20)


def _simrank_sql() -> str:
    """DuckDB mirror of simrank2_topk: cocitation s1, top-100 candidate
    cut on (s1 desc, a, b), exact s2 refinement via the in-neighbor
    cross join against the s1 table, top-20 by (s2 desc, a, b)."""
    return f"""
WITH e AS MATERIALIZED ({_E_SQL}),
inn AS MATERIALIZED (SELECT dst AS v, src AS i FROM e),
indeg AS MATERIALIZED (SELECT v, COUNT(*) AS d FROM inn GROUP BY v),
p AS MATERIALIZED (
  SELECT l.v AS a, r.v AS b, CAST(COUNT(*) AS BIGINT) AS common
  FROM inn l JOIN inn r ON l.i = r.i AND l.v < r.v
  GROUP BY 1, 2),
s1f AS MATERIALIZED (
  SELECT p.a, p.b, p.common, da.d AS da, db.d AS db,
         ROUND(0.8 * p.common / (da.d * db.d), 6) AS s1
  FROM p JOIN indeg da ON da.v = p.a JOIN indeg db ON db.v = p.b),
cand AS MATERIALIZED (
  SELECT a, b, common, da, db, s1 FROM (
    SELECT s1f.*, ROW_NUMBER() OVER (ORDER BY s1 DESC, a, b) AS rr
    FROM s1f) WHERE rr <= 100),
ij AS (
  SELECT c.a, c.b, LEAST(ia.i, ib.i) AS x, GREATEST(ia.i, ib.i) AS y
  FROM cand c JOIN inn ia ON ia.v = c.a JOIN inn ib ON ib.v = c.b
  WHERE ia.i <> ib.i),
cr AS (SELECT ij.a, ij.b, SUM(s.s1) AS crs
       FROM ij JOIN s1f s ON s.a = ij.x AND s.b = ij.y
       GROUP BY ij.a, ij.b),
o AS (
  SELECT c.a, c.b, c.common, c.s1,
         ROUND(0.8 * (c.common + COALESCE(cr.crs, 0.0))
               / (c.da * c.db), 6) AS s2
  FROM cand c LEFT JOIN cr ON cr.a = c.a AND cr.b = c.b)
SELECT a, b, common, s1, s2, rnk FROM (
  SELECT o.*, CAST(ROW_NUMBER() OVER (ORDER BY s2 DESC, a, b) AS BIGINT)
         AS rnk FROM o)
WHERE rnk <= 20"""


def q_temporal_reach(spark, sf_dir):
    """Earliest-arrival (time-respecting) reachability from the 3
    smallest vids over the order-date-stamped part->supplier edges,
    4 rounds: an edge is traversable only at ts >= current arrival.
    The temporal-graph primitive (graph/sssp.py:earliest_arrival)."""
    from credigraph_spark.graph.sssp import earliest_arrival

    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_partkey").alias("src"),
        F.col("l_suppkey").alias("dst"))
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyyMMdd").cast("long").alias("ts"))
    te = (li.join(o, li.l_orderkey == o.o_orderkey)
          .select("src", "dst", "ts"))
    seeds = (te.select(F.col("src").alias("vid"))
             .unionByName(te.select(F.col("dst").alias("vid")))
             .distinct().orderBy("vid").limit(3))
    return earliest_arrival(te, seeds, max_rounds=4, start_ts=0)


def _temporal_reach_sql(rounds: int = 4) -> str:
    """DuckDB mirror of q_temporal_reach: the min-combine relax round
    unrolled ``rounds`` times over the same stamped edge table."""
    parts = [
        """WITH e AS MATERIALIZED (
  SELECT l.l_partkey AS src, l.l_suppkey AS dst,
         CAST(strftime(o.o_orderdate, '%Y%m%d') AS BIGINT) AS ts
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)""",
        """s AS MATERIALIZED (SELECT vid FROM
  (SELECT src AS vid FROM e UNION SELECT dst FROM e)
  ORDER BY vid LIMIT 3)""",
        "r0 AS MATERIALIZED (SELECT vid, CAST(0 AS BIGINT) AS t FROM s)",
    ]
    for k in range(1, rounds + 1):
        parts.append(f"""r{k} AS MATERIALIZED (
  SELECT vid, MIN(t) AS t FROM (
    SELECT vid, t FROM r{k - 1}
    UNION ALL
    SELECT e.dst AS vid, e.ts AS t
    FROM r{k - 1} p JOIN e ON e.src = p.vid AND e.ts >= p.t)
  GROUP BY vid)""")
    return (",\n".join(parts)
            + f"\nSELECT vid, t AS t_arr FROM r{rounds}")


def q_jaccard_prefix(spark, sf_dir):
    """Exact Jaccard >= 0.7 pairs over distinct-token sets via prefix
    filtering (AllPairs/PPJoin) — the oracle brute-forces ALL pairs, so
    a green row proves the prefix filter is COMPLETE, not just fast."""
    from credigraph_spark.pipeline.dedup import jaccard_prefix_pairs

    return jaccard_prefix_pairs(_t(spark, sf_dir, "documents"),
                                threshold=0.7)


def _jaccard_prefix_sql(threshold: float = 0.7) -> str:
    """Brute-force all-pairs exact Jaccard (no prefix filter): any
    divergence from the engine's pruned join = a completeness bug."""
    return f"""
        WITH t AS MATERIALIZED (
          SELECT doc_id,
                 list_distinct(list_filter(
                   string_split_regex(lower(text), '\\s+'),
                   x -> x != '')) AS toks
          FROM documents),
        p AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(len(list_intersect(a.toks, b.toks)) AS BIGINT)
                   AS common,
                 CAST(len(a.toks) + len(b.toks)
                      - len(list_intersect(a.toks, b.toks)) AS BIGINT)
                   AS n_union
          FROM t a JOIN t b ON a.doc_id < b.doc_id)
        SELECT id_a, id_b, common, n_union,
               ROUND(common * 1.0 / n_union, 6) AS jaccard
        FROM p
        WHERE n_union > 0 AND common >= {threshold} * n_union"""


def q_ppr_sweep(spark, sf_dir):
    """ACL local-clustering conductance sweep from the 3 smallest vids:
    PPR over the symmetrized simple graph, degree-normalized ordering,
    per-prefix conductance curve over the top-100 (graph/ppr.py)."""
    from credigraph_spark.graph import ppr_sweep_cut

    edges = _edges(spark, sf_dir)
    seeds = (
        edges.select(F.col("src").alias("vid"))
        .unionByName(edges.select(F.col("dst").alias("vid")))
        .distinct().orderBy("vid").limit(3)
    )
    return ppr_sweep_cut(edges, seeds, max_iter=5, top_m=100)


def _ppr_sweep_sql(iters: int = 5, d: float = 0.85, top_m: int = 100) -> str:
    """DuckDB mirror of q_ppr_sweep: the _ppr5_sql recurrence re-rooted
    on the symmetrized canonical graph (no dangling there), then the
    sweep — rounded-key ordering, prefix volume, internal-at-rank
    cumulative count, conductance with the min-side denominator."""
    parts = [
        f"""WITH cnd AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM ({_E_SQL}))""",
        """e AS MATERIALIZED (
  SELECT a AS src, b AS dst FROM cnd
  UNION ALL SELECT b, a FROM cnd)""",
        "deg AS MATERIALIZED (SELECT src AS vid, COUNT(*) AS outdeg "
        "FROM e GROUP BY src)",
        "s AS MATERIALIZED (SELECT vid FROM (SELECT src AS vid FROM e "
        "UNION SELECT dst FROM e) ORDER BY vid LIMIT 3)",
        "ns AS (SELECT COUNT(*) AS c FROM s)",
        "r0 AS MATERIALIZED (SELECT vid, 1.0/(SELECT c FROM ns) AS rank "
        "FROM s)",
    ]
    for i in range(iters):
        parts.append(
            f"d{i} AS (SELECT COALESCE(SUM(rank), 0) AS dang FROM r{i} r "
            f"LEFT JOIN deg USING (vid) WHERE deg.outdeg IS NULL)"
        )
        parts.append(
            f"r{i+1} AS MATERIALIZED (SELECT COALESCE(c.vid, s2.vid) AS vid, "
            f"CASE WHEN s2.vid IS NOT NULL THEN (1-{d})/(SELECT c FROM ns) "
            f"+ {d} * (SELECT dang FROM d{i})/(SELECT c FROM ns) ELSE 0 END "
            f"+ {d} * COALESCE(c.contrib, 0) AS rank "
            f"FROM (SELECT e.dst AS vid, SUM(r.rank / deg.outdeg) AS contrib "
            f"FROM e JOIN r{i} r ON e.src = r.vid JOIN deg ON deg.vid = e.src "
            f"GROUP BY e.dst) c FULL JOIN s s2 ON s2.vid = c.vid)"
        )
    parts.append(f"""k AS MATERIALIZED (
  SELECT r.vid, deg.outdeg AS deg, ROUND(r.rank / deg.outdeg, 8) AS key
  FROM r{iters} r JOIN deg ON deg.vid = r.vid)""")
    parts.append(f"""top AS MATERIALIZED (
  SELECT vid, deg, key, rnk FROM (
    SELECT k.*, CAST(ROW_NUMBER() OVER (ORDER BY key DESC, vid) AS BIGINT)
           AS rnk FROM k) WHERE rnk <= {top_m})""")
    parts.append("""intl AS (
  SELECT GREATEST(ta.rnk, tb.rnk) AS rnk, COUNT(*) AS int_at
  FROM cnd JOIN top ta ON ta.vid = cnd.a JOIN top tb ON tb.vid = cnd.b
  GROUP BY 1)""")
    parts.append("m AS (SELECT COUNT(*) AS m FROM cnd)")
    parts.append("""c1 AS (
  SELECT t.rnk, t.vid,
         CAST(SUM(t.deg) OVER (ORDER BY t.rnk) AS BIGINT) AS vol,
         CAST(SUM(COALESCE(i.int_at, 0)) OVER (ORDER BY t.rnk) AS BIGINT)
           AS icum
  FROM top t LEFT JOIN intl i ON i.rnk = t.rnk)""")
    return ",\n".join(parts) + """
SELECT rnk, vid, vol, vol - 2 * icum AS cut_edges,
       CASE WHEN LEAST(vol, 2 * (SELECT m FROM m) - vol) > 0
            THEN ROUND((vol - 2 * icum) * 1.0
                       / LEAST(vol, 2 * (SELECT m FROM m) - vol), 8)
            ELSE NULL END AS conductance
FROM c1"""


def q_negative_samples(spark, sf_dir):
    """Deterministic link-prediction negatives: 3 md5-drawn non-edges
    per source (graph/linkpred.py:negative_samples)."""
    from credigraph_spark.graph import negative_samples

    return negative_samples(_edges(spark, sf_dir), k=3, seed=42,
                            oversample=3)


def _negative_samples_sql(k: int = 3, seed: int = 42,
                          oversample: int = 3) -> str:
    """DuckDB mirror of q_negative_samples: dense vid ranking, md5-mod
    draws, anti join, keep-first dedupe, re-rank."""
    n = k * oversample
    return f"""
WITH e AS MATERIALIZED ({_E_SQL}),
verts AS MATERIALIZED (
  SELECT vid, CAST(ROW_NUMBER() OVER (ORDER BY vid) - 1 AS BIGINT) AS idx
  FROM (SELECT src AS vid FROM e UNION SELECT dst FROM e)),
nv AS (SELECT COUNT(*) AS v FROM verts),
draws AS (
  SELECT s.src, i.i,
         CAST(CAST(('0x' || substr(md5('{seed}:' || s.src || ':' || i.i),
                    1, 15)) AS UBIGINT) % (SELECT v FROM nv) AS BIGINT)
           AS idx
  FROM (SELECT DISTINCT src FROM e) s, generate_series(1, {n}) i(i)),
cand AS (
  SELECT d.src, verts.vid AS neg_dst, d.i
  FROM draws d JOIN verts ON verts.idx = d.idx
  WHERE d.src <> verts.vid),
neg AS (
  SELECT c.* FROM cand c ANTI JOIN e
    ON e.src = c.src AND e.dst = c.neg_dst),
dd AS (
  SELECT src, neg_dst, i,
         ROW_NUMBER() OVER (PARTITION BY src, neg_dst ORDER BY i) AS _dd
  FROM neg),
rk AS (
  SELECT src, neg_dst,
         CAST(ROW_NUMBER() OVER (PARTITION BY src ORDER BY i) AS BIGINT)
           AS draw
  FROM dd WHERE _dd = 1)
SELECT src, neg_dst, draw FROM rk WHERE draw <= {k}"""


def q_heat_kernel(spark, sf_dir):
    """Heat-kernel diffusion (t=3, 5 Taylor terms) from the 3 smallest
    vids — the super-geometric-decay complement to PPR for local
    relevance (graph/ppr.py:heat_kernel_scores)."""
    from credigraph_spark.graph.ppr import heat_kernel_scores

    edges = _edges(spark, sf_dir)
    seeds = (
        edges.select(F.col("src").alias("vid"))
        .unionByName(edges.select(F.col("dst").alias("vid")))
        .distinct().orderBy("vid").limit(3)
    )
    out = heat_kernel_scores(edges, seeds, t=3.0, n_terms=5)
    return out.select("vid", F.round("score", 8).alias("score"))


def _heat_kernel_sql(t: float = 3.0, n_terms: int = 5) -> str:
    """DuckDB mirror of q_heat_kernel: identical driver-side Taylor
    coefficient literals, walk step m * (1.0/od) matching the engine's
    precomputed-reciprocal arithmetic, unrolled accumulator merges."""
    import math

    coefs = [math.exp(-t) * t ** k / math.factorial(k)
             for k in range(n_terms + 1)]
    parts = [
        f"WITH e AS MATERIALIZED ({_E_SQL})",
        "od AS MATERIALIZED (SELECT src, COUNT(*) AS od FROM e GROUP BY src)",
        "s AS MATERIALIZED (SELECT vid FROM (SELECT src AS vid FROM e "
        "UNION SELECT dst FROM e) ORDER BY vid LIMIT 3)",
        "ns AS (SELECT COUNT(*) AS c FROM s)",
        "v0 AS MATERIALIZED (SELECT vid, 1.0/(SELECT c FROM ns) AS m FROM s)",
        f"a0 AS MATERIALIZED (SELECT vid, {coefs[0]!r} * m AS score FROM v0)",
    ]
    for k in range(1, n_terms + 1):
        parts.append(
            f"v{k} AS MATERIALIZED (SELECT e.dst AS vid, "
            f"SUM(v.m * (1.0 / od.od)) AS m "
            f"FROM e JOIN v{k-1} v ON e.src = v.vid "
            f"JOIN od ON od.src = e.src GROUP BY e.dst)")
        parts.append(
            f"a{k} AS MATERIALIZED (SELECT vid, SUM(score) AS score FROM ("
            f"SELECT vid, score FROM a{k-1} UNION ALL "
            f"SELECT vid, {coefs[k]!r} * m FROM v{k}) GROUP BY vid)")
    return (",\n".join(parts)
            + f"\nSELECT vid, ROUND(score, 8) AS score FROM a{n_terms}")


def q_triad_census(spark, sf_dir):
    """Directed triad census over the lineitem edge graph
    (graph.triangles.directed_triad_census): total triangles, directed
    3-cycle instances, transitive-triangle instances — feed-forward vs
    feedback structure. Oracle: brute-force triple joins (the engine's
    degree-oriented plan must land on the same exact counts)."""
    from credigraph_spark.graph import directed_triad_census

    return directed_triad_census(_edges(spark, sf_dir))


def q_component_sizes(spark, sf_dir):
    """Connected-component size distribution (size -> n_components) of a
    sparsified edge subset (every-100th-order edges — the full graph is
    one giant component, the subset fragments into a real histogram);
    exercises hash-min CC + two partial-agg rollups."""
    from credigraph_spark.graph import connected_components

    li = _t(spark, sf_dir, "lineitem")
    edges = (li.where((F.col("l_partkey") != F.col("l_suppkey"))
                      & (F.col("l_orderkey") % 100 == 0))
             .select(F.col("l_partkey").alias("src"),
                     F.col("l_suppkey").alias("dst"))
             .distinct())
    labels, _ = connected_components(edges)
    return (labels.groupBy("component")
            .agg(F.count("*").alias("sz"))
            .groupBy(F.col("sz").alias("component_size"))
            .agg(F.count("*").alias("n_components")))


def _comp_sizes_sql(mod: int = 100) -> str:
    e = (f"SELECT DISTINCT l_partkey AS src, l_suppkey AS dst FROM lineitem "
         f"WHERE l_partkey <> l_suppkey AND l_orderkey % {mod} = 0")
    return f"""
WITH RECURSIVE und AS (SELECT src, dst FROM ({e})
                       UNION SELECT dst, src FROM ({e})),
verts AS (SELECT DISTINCT src AS vid FROM und),
r(vid, label) AS (
  SELECT vid, vid FROM verts
  UNION
  SELECT und.dst, r.label FROM r JOIN und ON und.src = r.vid
  WHERE r.label < und.dst
),
lab AS (SELECT vid, MIN(label) AS component FROM r GROUP BY vid)
SELECT sz AS component_size, COUNT(*) AS n_components
FROM (SELECT component, COUNT(*) AS sz FROM lab GROUP BY 1)
GROUP BY 1
"""


def q_rank_gini(spark, sf_dir):
    """Inequality profile of the 5-iteration PageRank mass
    (analytics.rank_concentration): Gini + top-1%/top-10% mass shares,
    ascending index built with the O3 range-partition construction."""
    from credigraph_spark.analytics import rank_concentration
    from credigraph_spark.graph import pagerank

    ranks, _ = pagerank(_edges(spark, sf_dir), max_iter=5, tol=0.0)
    return rank_concentration(ranks, id_col="vid", score_col="rank")


def _rank_gini_sql() -> str:
    """DuckDB mirror of q_rank_gini: the _pagerank5_parts chain + the
    same rounded-score ascending index and concentration formulas."""
    parts = _pagerank5_parts()
    parts.append(
        "sc AS MATERIALIZED (SELECT vid, ROUND(rank, 8) AS x FROM r5)")
    parts.append(
        "ix AS MATERIALIZED (SELECT x, ROW_NUMBER() OVER "
        "(ORDER BY x, vid) AS i FROM sc)")
    parts.append("nn AS (SELECT COUNT(*) AS n FROM ix)")
    parts.append(
        """ag AS (SELECT (SELECT n FROM nn) AS n, SUM(x) AS s,
               SUM(i * x) AS t,
               SUM(CASE WHEN i > (SELECT n FROM nn)
                        - ((SELECT n FROM nn) + 99) // 100
                   THEN x ELSE 0.0 END) AS m1,
               SUM(CASE WHEN i > (SELECT n FROM nn)
                        - ((SELECT n FROM nn) + 9) // 10
                   THEN x ELSE 0.0 END) AS m10
        FROM ix)""")
    return ",\n".join(parts) + """
SELECT CAST(n AS BIGINT) AS n_vertices,
       ROUND(s, 8) AS total_mass,
       ROUND(2.0 * t / (n * s) - (n + 1.0) / n, 8) AS gini,
       ROUND(m1 / s, 8) AS top1pct_mass,
       ROUND(m10 / s, 8) AS top10pct_mass
FROM ag
"""


def q_eigen_centrality(spark, sf_dir):
    """Eigenvector centrality, 3 L2-normalized power-iteration rounds
    over the symmetrized simple graph
    (graph.spreading.eigenvector_centrality)."""
    from credigraph_spark.graph import eigenvector_centrality

    return eigenvector_centrality(_edges(spark, sf_dir), max_iter=3,
                                  round_digits=8)


def _eigen_sql(rounds: int = 3) -> str:
    """DuckDB mirror of q_eigen_centrality: unrolled A·x + L2 normalize
    rounds from the all-ones start."""
    parts = [
        f"WITH und AS MATERIALIZED ({_UND_SQL})",
        "x0 AS MATERIALIZED (SELECT DISTINCT dst AS vid, 1.0 AS x FROM und)",
    ]
    for r in range(rounds):
        parts.append(
            f"s{r} AS MATERIALIZED (SELECT und.dst AS vid, SUM(p.x) AS s "
            f"FROM und JOIN x{r} p ON p.vid = und.src GROUP BY 1)")
        parts.append(f"n{r} AS (SELECT sqrt(SUM(s * s)) AS n FROM s{r})")
        parts.append(
            f"x{r+1} AS MATERIALIZED (SELECT vid, "
            f"s / (SELECT n FROM n{r}) AS x FROM s{r})")
    return ",\n".join(parts) + f"""
SELECT vid, ROUND(x, 8) AS x FROM x{rounds}
"""


def q_burstiness(spark, sf_dir):
    """Goh-Barabási burstiness per event type over per-user inter-event
    gaps in integer seconds (temporal.burstiness): exact-integer
    D = n·Σg²−(Σg)², one sqrt + one division."""
    from credigraph_spark.temporal import burstiness

    return burstiness(_t(spark, sf_dir, "events"))


_BURSTINESS_SQL = """
WITH ev AS (SELECT event_type, user_id, epoch_us(ts) AS us, event_id
            FROM events),
g AS (SELECT event_type,
             (us - LAG(us) OVER (PARTITION BY user_id, event_type
                                 ORDER BY us, event_id)) // 1000000 AS g
      FROM ev),
agg AS (SELECT event_type, COUNT(*) AS n_gaps,
               SUM(g) AS sg, SUM(g * g) AS sg2
        FROM g WHERE g IS NOT NULL GROUP BY 1)
SELECT event_type, n_gaps,
       ROUND(sg * 1.0 / n_gaps, 8) AS mean_gap_s,
       CASE WHEN n_gaps >= 2 AND (n_gaps * sg2 - sg * sg > 0 OR sg > 0)
            THEN ROUND((sqrt(n_gaps * sg2 - sg * sg) - sg)
                       / (sqrt(n_gaps * sg2 - sg * sg) + sg), 8)
            ELSE 0.0 END AS burstiness
FROM agg
"""


def q_pca_top(spark, sf_dir):
    """Top principal component of the embedding matrix after 3 power-
    iteration rounds on centered data (pipeline.pca.pca_top_component)
    — covariance-free C·v passes, deterministic all-ones init."""
    from credigraph_spark.pipeline.pca import pca_top_component

    return pca_top_component(_t(spark, sf_dir, "embeddings"),
                             n_iter=3, round_digits=8)


def _pca_parts(iters: int = 3, dim: int = 64) -> list[str]:
    """Shared CTE chain: centered power iteration ending at v{iters}."""
    parts = [
        f"""WITH x AS MATERIALIZED (
  SELECT vec_id, u.i - 1 AS idx, embedding[u.i]::DOUBLE AS val
  FROM embeddings, (SELECT unnest(generate_series(1, {dim})) AS i) u
  WHERE embedding IS NOT NULL AND len(embedding) > 0)""",
        "mu AS MATERIALIZED (SELECT idx, AVG(val) AS mu FROM x GROUP BY 1)",
        f"v0 AS MATERIALIZED (SELECT idx, 1.0/sqrt({dim}.0) AS v FROM mu)",
    ]
    for r in range(iters):
        parts.append(
            f"c{r} AS (SELECT SUM(m.mu * v.v) AS c FROM mu m "
            f"JOIN v{r} v USING (idx))")
        parts.append(
            f"t{r} AS MATERIALIZED (SELECT x.vec_id, "
            f"SUM(x.val * v.v) - (SELECT c FROM c{r}) AS t "
            f"FROM x JOIN v{r} v USING (idx) GROUP BY x.vec_id)")
        parts.append(f"st{r} AS (SELECT SUM(t) AS st FROM t{r})")
        parts.append(
            f"w{r} AS MATERIALIZED (SELECT s.idx, "
            f"s.s - (SELECT st FROM st{r}) * m.mu AS w "
            f"FROM (SELECT x.idx, SUM(x.val * t.t) AS s FROM x "
            f"JOIN t{r} t USING (vec_id) GROUP BY 1) s "
            f"JOIN mu m ON m.idx = s.idx)")
        parts.append(f"n{r} AS (SELECT sqrt(SUM(w * w)) AS n FROM w{r})")
        parts.append(
            f"v{r+1} AS MATERIALIZED (SELECT idx, "
            f"w / (SELECT n FROM n{r}) AS v FROM w{r})")
    return parts


def _pca_sql(iters: int = 3, dim: int = 64) -> str:
    """DuckDB mirror of q_pca_top: unrolled centered power-iteration
    rounds (projection, rank-1 sums, mean correction, L2 normalize)."""
    return ",\n".join(_pca_parts(iters, dim)) + f"""
SELECT CAST(idx AS BIGINT) AS dim_idx, ROUND(v, 8) AS component
FROM v{iters}
"""


def q_remove_top(spark, sf_dir):
    """All-but-the-top embedding hygiene (Mu & Viswanath 2018): per
    vector the dominant-direction projection coefficient and centered
    L2 norms before/after removal (pipeline.pca.remove_top_component,
    3 power-iteration rounds)."""
    from credigraph_spark.pipeline.pca import remove_top_component

    return remove_top_component(_t(spark, sf_dir, "embeddings"),
                                n_iter=3, round_digits=8)


def _remove_top_sql(iters: int = 3, dim: int = 64) -> str:
    """DuckDB mirror of q_remove_top: the _pca_parts chain + a per-row
    transform pass with idx-ordered list folds (matching the engine's
    sequential zip_with folds)."""
    parts = _pca_parts(iters, dim)
    parts.append(f"vv AS (SELECT list(v ORDER BY idx) AS l FROM v{iters})")
    parts.append("mm AS (SELECT list(mu ORDER BY idx) AS l FROM mu)")
    parts.append(
        f"cc AS (SELECT list_sum(list_transform(generate_series(1, {dim}), "
        f"i -> mm.l[i] * vv.l[i])) AS c FROM mm, vv)")
    parts.append(
        f"""tr AS (
  SELECT e.vec_id,
    list_sum(list_transform(generate_series(1, {dim}),
      i -> e.embedding[i]::DOUBLE * vv.l[i])) - cc.c AS t,
    list_sum(list_transform(generate_series(1, {dim}),
      i -> (e.embedding[i]::DOUBLE - mm.l[i])
           * (e.embedding[i]::DOUBLE - mm.l[i]))) AS nb2
  FROM embeddings e, vv, mm, cc
  WHERE e.embedding IS NOT NULL AND len(e.embedding) > 0)""")
    return ",\n".join(parts) + """
SELECT vec_id, ROUND(t, 8) AS proj,
       ROUND(sqrt(nb2), 8) AS norm_before,
       ROUND(sqrt(nb2 - t * t), 8) AS norm_after
FROM tr
"""


def q_assoc_rules(spark, sf_dir):
    """Market-basket association rules over (order, part) baskets:
    top-100 part pairs by lift with support and both confidences
    (analytics.association_rules), pairs co-occurring in >= 2 orders."""
    from credigraph_spark.analytics import association_rules

    baskets = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey")
    return association_rules(baskets, "l_orderkey", "l_partkey",
                             min_pair_count=2, top_k=100)


_ASSOC_SQL = """
WITH b AS (SELECT DISTINCT l_orderkey AS bid, l_partkey AS item
           FROM lineitem
           WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL),
nb AS (SELECT COUNT(DISTINCT bid) AS n FROM b),
itemn AS (SELECT item, COUNT(*) AS n_item FROM b GROUP BY 1),
pairs AS (SELECT a.item AS item_a, c.item AS item_b, COUNT(*) AS n_ab
          FROM b a JOIN b c ON a.bid = c.bid AND a.item < c.item
          GROUP BY 1, 2 HAVING COUNT(*) >= 2)
SELECT p.item_a, p.item_b,
       CAST(na.n_item AS BIGINT) AS n_a,
       CAST(nc.n_item AS BIGINT) AS n_b,
       CAST(p.n_ab AS BIGINT) AS n_ab,
       ROUND(p.n_ab * 1.0 / nb.n, 8) AS support,
       ROUND(p.n_ab * 1.0 / na.n_item, 8) AS conf_a_b,
       ROUND(p.n_ab * 1.0 / nc.n_item, 8) AS conf_b_a,
       ROUND(nb.n * p.n_ab * 1.0 / (na.n_item * nc.n_item), 8) AS lift
FROM pairs p
JOIN itemn na ON na.item = p.item_a
JOIN itemn nc ON nc.item = p.item_b
CROSS JOIN nb
ORDER BY lift DESC, p.item_a, p.item_b LIMIT 100
"""


def q_dyad_census(spark, sf_dir):
    """Dyad census over the lineitem edge graph: mutual / asymmetric /
    null dyad counts (graph.triangles.dyad_census)."""
    from credigraph_spark.graph import dyad_census

    return dyad_census(_edges(spark, sf_dir))


_DYAD_SQL = f"""
WITH e AS MATERIALIZED ({_E_SQL}),
dm AS (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b,
              SUM(CASE WHEN src < dst THEN 1 ELSE 2 END) AS m
       FROM e GROUP BY 1, 2),
nv AS (SELECT COUNT(*) AS n FROM (SELECT src AS vid FROM e
       UNION SELECT dst FROM e)),
c AS (SELECT CAST(SUM(CASE WHEN m = 3 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_mutual,
      CAST(SUM(CASE WHEN m <> 3 THEN 1 ELSE 0 END) AS BIGINT)
        AS n_asymmetric,
      COUNT(*) AS n_connected FROM dm)
SELECT CAST(nv.n AS BIGINT) AS n_vertices, c.n_mutual, c.n_asymmetric,
       CAST((nv.n * (nv.n - 1)) // 2 - c.n_connected AS BIGINT) AS n_null
FROM nv, c
"""


_TRIAD_SQL = f"""
WITH e AS MATERIALIZED ({_E_SQL}),
und2 AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS a,
                      GREATEST(src, dst) AS b FROM e),
tri AS (SELECT COUNT(*) AS n FROM und2 e1
        JOIN und2 e2 ON e2.a = e1.a AND e2.b > e1.b
        JOIN und2 e3 ON e3.a = e1.b AND e3.b = e2.b),
cyc AS (SELECT COUNT(*) // 3 AS n FROM e a
        JOIN e b ON b.src = a.dst
        JOIN e c ON c.src = b.dst AND c.dst = a.src),
tr AS (SELECT COUNT(*) AS n FROM e a
       JOIN e b ON b.src = a.dst
       JOIN e c ON c.src = a.src AND c.dst = b.dst)
SELECT CAST(tri.n AS BIGINT) AS n_triangles,
       CAST(cyc.n AS BIGINT) AS n_cyclic,
       CAST(tr.n AS BIGINT) AS n_transitive
FROM tri, cyc, tr
"""


def q_label_spreading(spark, sf_dir):
    """Zhu-Ghahramani label spreading, 3 clamped rounds: the 20 smallest
    vids carry y = vid % 2, every other vertex iteratively averages its
    symmetrized neighbors' scores (graph.spreading.label_spreading) —
    in-graph semi-supervised credibility inference."""
    from credigraph_spark.graph import label_spreading

    edges = _edges(spark, sf_dir)
    seeds = (edges.select(F.col("src").alias("vid"))
             .unionByName(edges.select(F.col("dst").alias("vid")))
             .distinct().orderBy("vid").limit(20)
             .select("vid", (F.col("vid") % 2).cast("double").alias("y")))
    return label_spreading(edges, seeds, max_iter=3, round_digits=8)


def _label_spreading_sql(rounds: int = 3, n_seeds: int = 20) -> str:
    """DuckDB mirror of q_label_spreading: unrolled clamped
    neighbor-average rounds over the symmetrized simple graph."""
    parts = [
        f"WITH und AS MATERIALIZED ({_UND_SQL})",
        "deg AS MATERIALIZED (SELECT dst AS vid, COUNT(*) AS deg "
        "FROM und GROUP BY 1)",
        f"sd AS MATERIALIZED (SELECT vid, CAST(vid % 2 AS DOUBLE) AS y "
        f"FROM (SELECT vid FROM ({_VERTS_SQL}) ORDER BY vid LIMIT {n_seeds}))",
        "f0 AS MATERIALIZED (SELECT d.vid, COALESCE(sd.y, 0.0) AS f "
        "FROM deg d LEFT JOIN sd ON sd.vid = d.vid)",
    ]
    for i in range(rounds):
        parts.append(
            f"f{i+1} AS MATERIALIZED (SELECT d.vid, "
            f"COALESCE(sd.y, m.s / d.deg) AS f "
            f"FROM deg d JOIN (SELECT und.dst AS vid, SUM(p.f) AS s "
            f"FROM und JOIN f{i} p ON p.vid = und.src GROUP BY 1) m "
            f"ON m.vid = d.vid LEFT JOIN sd ON sd.vid = d.vid)")
    return ",\n".join(parts) + f"""
SELECT f.vid, ROUND(f.f, 8) AS score, sd.vid IS NOT NULL AS is_seed
FROM f{rounds} f LEFT JOIN sd ON sd.vid = f.vid
"""


def q_spread_weighted(spark, sf_dir):
    """Weighted label spreading: neighbor averages weighted by summed
    l_quantity edge weights (graph.spreading.label_spreading,
    weight_col), 3 clamped rounds, same 20 seeds as label_spreading."""
    from credigraph_spark.graph import label_spreading

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst"),
        F.col("l_quantity").cast("double").alias("w"))
    edges = _edges(spark, sf_dir)
    seeds = (edges.select(F.col("src").alias("vid"))
             .unionByName(edges.select(F.col("dst").alias("vid")))
             .distinct().orderBy("vid").limit(20)
             .select("vid", (F.col("vid") % 2).cast("double").alias("y")))
    return label_spreading(li, seeds, max_iter=3, weight_col="w",
                           round_digits=8)


def _label_spreading_weighted_sql(rounds: int = 3, n_seeds: int = 20) -> str:
    """DuckDB mirror of q_spread_weighted: weight-summed symmetric edge
    set, strength-normalized clamped rounds."""
    base = ("SELECT l_partkey AS src, l_suppkey AS dst, "
            "CAST(l_quantity AS DOUBLE) AS w FROM lineitem "
            "WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL "
            "AND l_partkey <> l_suppkey")
    parts = [
        f"WITH raw AS MATERIALIZED ({base})",
        "und AS MATERIALIZED (SELECT src, dst, SUM(w) AS w FROM "
        "(SELECT src, dst, w FROM raw UNION ALL "
        "SELECT dst, src, w FROM raw) GROUP BY 1, 2)",
        "deg AS MATERIALIZED (SELECT dst AS vid, SUM(w) AS deg "
        "FROM und GROUP BY 1)",
        f"sd AS MATERIALIZED (SELECT vid, CAST(vid % 2 AS DOUBLE) AS y "
        f"FROM (SELECT vid FROM ({_VERTS_SQL}) ORDER BY vid LIMIT {n_seeds}))",
        "f0 AS MATERIALIZED (SELECT d.vid, COALESCE(sd.y, 0.0) AS f "
        "FROM deg d LEFT JOIN sd ON sd.vid = d.vid)",
    ]
    for i in range(rounds):
        parts.append(
            f"f{i+1} AS MATERIALIZED (SELECT d.vid, "
            f"COALESCE(sd.y, m.s / d.deg) AS f "
            f"FROM deg d JOIN (SELECT und.dst AS vid, "
            f"SUM(p.f * und.w) AS s "
            f"FROM und JOIN f{i} p ON p.vid = und.src GROUP BY 1) m "
            f"ON m.vid = d.vid LEFT JOIN sd ON sd.vid = d.vid)")
    return ",\n".join(parts) + f"""
SELECT f.vid, ROUND(f.f, 8) AS score, sd.vid IS NOT NULL AS is_seed
FROM f{rounds} f LEFT JOIN sd ON sd.vid = f.vid
"""


def q_dup_ngrams(spark, sf_dir):
    """Cross-document duplicated 5-gram profile (Lee et al. 2022
    exact-substring dedup diagnostic): per doc distinct-5-gram count,
    how many occur in other docs, and the duplicated fraction
    (pipeline.textstats.dup_ngram_profile)."""
    from credigraph_spark.pipeline.textstats import dup_ngram_profile

    return dup_ngram_profile(_t(spark, sf_dir, "documents"), shingle_n=5)


def _dup_ngrams_sql(shingle_n: int = 5) -> str:
    """DuckDB mirror of q_dup_ngrams: the _contamination_sql shingle
    construction + per-shingle doc frequency + per-doc rollup."""
    n1 = shingle_n - 1
    return f"""
WITH t AS (SELECT doc_id,
                  string_split_regex(lower(text), '\\s+') AS w
           FROM documents),
sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
         generate_series(1, greatest(len(w) - {n1}, 1)),
         i -> array_to_string(w[i:i+{n1}], ' ')))) AS sh
       FROM t),
freq AS (SELECT sh, COUNT(*) AS docfreq FROM sh GROUP BY 1)
SELECT s.doc_id, COUNT(*) AS n_ngrams,
       CAST(SUM(CASE WHEN f.docfreq >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_ngrams,
       ROUND(SUM(CASE WHEN f.docfreq >= 2 THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 8) AS dup_frac
FROM sh s JOIN freq f ON f.sh = s.sh
GROUP BY s.doc_id
"""


def q_rolling_wau(spark, sf_dir):
    """Per-day DAU / rolling-7-day WAU / stickiness over the event
    stream (temporal.rolling_active_users): bounded explode of the
    deduped (user, day) pairs, never a per-day self-join."""
    from credigraph_spark.temporal import rolling_active_users

    return rolling_active_users(_t(spark, sf_dir, "events"), window_days=7)


_ROLLING_WAU_SQL = """
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL),
days AS (SELECT DISTINCT day FROM ud),
expanded AS (SELECT user_id, day + CAST(i AS INTEGER) AS rday
             FROM ud, range(7) t(i)),
wau AS (SELECT e.rday, COUNT(DISTINCT e.user_id) AS wau
        FROM expanded e JOIN days d ON d.day = e.rday GROUP BY 1),
dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM ud GROUP BY 1)
SELECT strftime(dau.day, '%Y-%m-%d') AS day, dau, wau,
       ROUND(dau * 1.0 / wau, 8) AS stickiness
FROM dau JOIN wau ON wau.rday = dau.day
"""


def q_kmv_distinct(spark, sf_dir):
    """KMV distinct-count sketch (pipeline.sketch.kmv_distinct): per
    event_type, estimated distinct users from the 8 smallest md5-derived
    60-bit hashes vs the exact count — fixed-memory distinct counting
    with a bit-reproducible estimate."""
    from credigraph_spark.pipeline.sketch import kmv_distinct

    ev = _t(spark, sf_dir, "events").where(F.col("user_id").isNotNull())
    return kmv_distinct(ev, ["event_type"], "user_id", k=8, seed=7)


def _kmv_sql(k: int = 8, seed: int = 7) -> str:
    """DuckDB mirror of q_kmv_distinct: identical md5 60-bit hashing,
    bottom-k window, (k-1)*2^60/kth estimate."""
    a = float((k - 1) * 16 ** 15)
    return f"""
WITH pairs AS (
  SELECT DISTINCT event_type,
    ('0x' || substr(md5('{seed}:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events WHERE user_id IS NOT NULL),
ranked AS (SELECT event_type, h,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
           FROM pairs),
kmin AS (SELECT event_type, COUNT(*) AS n_min, MAX(h) AS kth
         FROM ranked WHERE rn <= {k} GROUP BY 1),
exact AS (SELECT event_type, COUNT(*) AS n_exact FROM pairs GROUP BY 1),
est AS (SELECT e.event_type, e.n_exact,
  CASE WHEN m.n_min < {k} THEN CAST(m.n_min AS DOUBLE)
       ELSE ROUND({a!r} / CAST(m.kth AS DOUBLE), 6) END AS kmv_estimate
  FROM exact e JOIN kmin m USING (event_type))
SELECT event_type, n_exact, kmv_estimate,
       ROUND(ABS(kmv_estimate - n_exact) / n_exact, 6) AS rel_err
FROM est
"""


def q_funnel_3step(spark, sf_dir):
    """Ordered view→click→purchase funnel over the event stream
    (temporal.funnel_steps): per-stage distinct-user counts with each
    stage strictly after the previous stage's first qualifying time,
    plus conversion fraction vs stage 1. One lazy plan, k co-keyed
    user_id shuffles."""
    from credigraph_spark.temporal import funnel_steps

    return funnel_steps(_t(spark, sf_dir, "events"),
                        ["view", "click", "purchase"])


_FUNNEL_SQL = """
WITH ev AS (SELECT user_id, event_type, ts FROM events
            WHERE event_type IN ('view', 'click', 'purchase')
              AND user_id IS NOT NULL AND ts IS NOT NULL),
s1 AS (SELECT user_id, MIN(ts) AS t FROM ev
       WHERE event_type = 'view' GROUP BY 1),
s2 AS (SELECT ev.user_id, MIN(ev.ts) AS t FROM ev JOIN s1 USING (user_id)
       WHERE ev.event_type = 'click' AND ev.ts > s1.t GROUP BY 1),
s3 AS (SELECT ev.user_id, MIN(ev.ts) AS t FROM ev JOIN s2 USING (user_id)
       WHERE ev.event_type = 'purchase' AND ev.ts > s2.t GROUP BY 1),
c AS (SELECT 1 AS step_idx, 'view' AS step, COUNT(*) AS n_users FROM s1
      UNION ALL
      SELECT 2, 'click', COUNT(*) FROM s2
      UNION ALL
      SELECT 3, 'purchase', COUNT(*) FROM s3)
SELECT step_idx, step, CAST(n_users AS BIGINT) AS n_users,
       CASE WHEN FIRST_VALUE(n_users) OVER (ORDER BY step_idx) > 0
            THEN ROUND(n_users * 1.0 /
                       FIRST_VALUE(n_users) OVER (ORDER BY step_idx), 8)
            ELSE 0.0 END AS frac_of_first
FROM c
"""


def q_robustness(spark, sf_dir):
    """Hub-removal attack tolerance: largest CC before/after deleting
    the 10 highest-degree vertices (analytics.hub_removal_robustness)."""
    from credigraph_spark.analytics import hub_removal_robustness

    return hub_removal_robustness(_edges(spark, sf_dir), k=10)


def _robustness_sql(k: int = 10) -> str:
    """DuckDB mirror of q_robustness: top-k hubs by (deg desc, vid),
    two hash-min CC fixpoints (full graph / hub-filtered graph) via the
    proven _cc_sql recursive chain, LCC sizes + drop fraction."""
    return f"""
WITH RECURSIVE e AS ({_E_SQL}),
und AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
deg AS (SELECT vid, COUNT(*) AS deg FROM
        (SELECT src AS vid FROM e UNION ALL SELECT dst FROM e)
        GROUP BY vid),
hubs AS (SELECT vid FROM deg ORDER BY deg DESC, vid LIMIT {k}),
rb(vid, label) AS (
  SELECT vid, vid FROM deg
  UNION
  SELECT und.dst, rb.label FROM rb JOIN und ON und.src = rb.vid
  WHERE rb.label < und.dst
),
lb AS (SELECT MAX(sz) AS lcc_before FROM (
  SELECT COUNT(*) AS sz FROM (
    SELECT vid, MIN(label) AS component FROM rb GROUP BY vid)
  GROUP BY component)),
und2 AS (SELECT * FROM und
         WHERE src NOT IN (SELECT vid FROM hubs)
           AND dst NOT IN (SELECT vid FROM hubs)),
v2 AS (SELECT DISTINCT src AS vid FROM und2),
ra(vid, label) AS (
  SELECT vid, vid FROM v2
  UNION
  SELECT und2.dst, ra.label FROM ra JOIN und2 ON und2.src = ra.vid
  WHERE ra.label < und2.dst
),
la AS (SELECT MAX(sz) AS lcc_after FROM (
  SELECT COUNT(*) AS sz FROM (
    SELECT vid, MIN(label) AS component FROM ra GROUP BY vid)
  GROUP BY component))
SELECT (SELECT COUNT(*) FROM deg) AS n_vertices,
       CAST({k} AS BIGINT) AS k_removed,
       (SELECT lcc_before FROM lb) AS lcc_before,
       (SELECT lcc_after FROM la) AS lcc_after,
       ROUND(((SELECT lcc_before FROM lb) - (SELECT lcc_after FROM la))
             * 1.0 / (SELECT lcc_before FROM lb), 8) AS lcc_drop_frac"""


def q_linkpred_topk(spark, sf_dir):
    """Top-50 absent links by Adamic-Adar over the undirected lineitem
    graph; ordering on the 6-digit-rounded score (+ (u,v) tiebreak) so
    summation-order float noise cannot reorder the tail between engines."""
    from credigraph_spark.graph import link_prediction_topk

    out = link_prediction_topk(_edges(spark, sf_dir), k=50)
    return out.select(
        "u", "v", "common_neighbors",
        F.round("jaccard", 8).alias("jaccard"),
        F.round("adamic_adar", 6).alias("adamic_adar"),
    )


def q_diameter_2approx(spark, sf_dir):
    """Double-BFS diameter estimate on the undirected lineitem graph,
    horizon 6: BFS from min vid, re-BFS from the farthest vertex (ties to
    smaller vid), report its eccentricity. All-integer, exact compare."""
    from credigraph_spark.graph import diameter_2approx

    return diameter_2approx(_edges(spark, sf_dir), max_hops=6,
                            directed=False)


def q_louvain_2round(spark, sf_dir):
    """Synchronous Louvain local-move, 2 rounds from singletons on the
    undirected lineitem graph: each vertex joins the neighbouring
    community with max modularity gain, ties to the smaller community id.
    Scores are identical double formulas in both engines, so the argmax
    replays exactly."""
    from credigraph_spark.graph import louvain_local_move

    return louvain_local_move(_edges(spark, sf_dir), rounds=2)


def q_louvain_two_level(spark, sf_dir):
    """Two-level Louvain: 2 flat local-move rounds, community
    contraction (intra mass on self-loops), 1 weighted move round on
    the coarse graph; each vertex reports its coarse community."""
    from credigraph_spark.graph import louvain_two_level

    return louvain_two_level(_edges(spark, sf_dir), rounds=2,
                             coarse_rounds=1)


def q_cocitation_topk(spark, sf_dir):
    """Top-50 co-cited vertex pairs (shared in-neighbors w: w->u AND w->v)
    over the DIRECTED lineitem graph, cosine-normalized by in-degrees;
    ordering on the 6dp-rounded cosine (+ (u,v) tiebreak)."""
    from credigraph_spark.graph import cocitation_topk

    out = cocitation_topk(_edges(spark, sf_dir), k=50)
    return out.select("u", "v", "shared",
                      F.round("cosine", 6).alias("cosine"))


def q_bib_coupling_topk(spark, sf_dir):
    """Top-50 bibliographically-coupled pairs (shared out-neighbors:
    u->w AND v->w), cosine-normalized by out-degrees; same determinism
    contract as cocitation_topk."""
    from credigraph_spark.graph import cocitation_topk

    out = cocitation_topk(_edges(spark, sf_dir), k=50, mode="coupling")
    return out.select("u", "v", "shared",
                      F.round("cosine", 6).alias("cosine"))


def q_bfs_distances(spark, sf_dir):
    """Directed BFS hop distances from the 3 smallest vids, depth 3.
    Oracle: depth-bounded recursive CTE (min over all <=3-hop paths)."""
    from credigraph_spark.graph import bfs_distances

    edges = _edges(spark, sf_dir)
    seeds = (
        edges.select(F.col("src").alias("vid"))
        .unionByName(edges.select(F.col("dst").alias("vid")))
        .distinct().orderBy("vid").limit(3)
    )
    return bfs_distances(edges, seeds, max_hops=3, directed=True)


def q_ktruss(spark, sf_dir):
    """4-truss, 2 peel rounds (deterministic fixed-round form): edges
    surviving two rounds of support->=2 filtering, canonical src < dst.
    Oracle: two unrolled support/peel rounds over the canonical
    undirected edge set."""
    from credigraph_spark.graph.triangles import k_truss

    kept, _ = k_truss(_edges(spark, sf_dir), k=4, max_rounds=2)
    return kept


def q_harmonic_centrality(spark, sf_dir):
    """Harmonic centrality (sum of 1/dist over reachable vertices) of the
    3 smallest vids within a 3-hop horizon, directed. Oracle: per-seed
    depth-bounded recursive CTE + the same per-hop-count sum."""
    from credigraph_spark.graph.nhop import harmonic_centrality

    edges = _edges(spark, sf_dir)
    seeds = (
        edges.select(F.col("src").alias("vid"))
        .unionByName(edges.select(F.col("dst").alias("vid")))
        .distinct().orderBy("vid").limit(3)
    )
    return harmonic_centrality(edges, seeds, max_hops=3, directed=True)


def q_weighted_closeness(spark, sf_dir):
    """Bounded weighted closeness (r / Σdist) from the 3 smallest vids,
    3 rounds, min-l_quantity integer weights — distance sums exact, the
    single final division compares with no rounding."""
    from credigraph_spark.graph import weighted_closeness_centrality

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst"),
        F.col("l_quantity").cast("double").alias("w"),
    ).groupBy("src", "dst").agg(F.min("w").alias("w"))
    seeds = (
        li.select(F.col("src").alias("vid"))
        .unionByName(li.select(F.col("dst").alias("vid")))
        .distinct().orderBy("vid").limit(3)
    )
    return weighted_closeness_centrality(li, seeds, max_rounds=3,
                                         weight_col="w")


def q_weighted_betweenness(spark, sf_dir):
    """Weighted seed-sampled Brandes from the 3 smallest vids (3
    relaxation rounds, min-l_quantity integer weights — the SP-DAG
    equality dist(u)+w == dist(v) is float-exact). Both Brandes phases
    run as fixpoint sweeps over the DAG; outputs 6dp-rounded."""
    from credigraph_spark.graph import weighted_betweenness_from_seeds

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst"),
        F.col("l_quantity").cast("double").alias("w"),
    ).groupBy("src", "dst").agg(F.min("w").alias("w"))
    seeds = (
        li.select(F.col("src").alias("vid"))
        .unionByName(li.select(F.col("dst").alias("vid")))
        .distinct().orderBy("vid").limit(3)
    )
    return weighted_betweenness_from_seeds(li, seeds, max_rounds=3,
                                           weight_col="w")


def q_weighted_harmonic(spark, sf_dir):
    """Bounded weighted harmonic centrality from the 3 smallest vids
    (3 relaxation rounds, min-l_quantity edge weights): Σ 1/dist over
    the per-seed Bellman-Ford state. Counts exact; the harmonic sum is
    6dp-rounded (summation order differs across engines)."""
    from credigraph_spark.graph import weighted_harmonic_centrality

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst"),
        F.col("l_quantity").cast("double").alias("w"),
    ).groupBy("src", "dst").agg(F.min("w").alias("w"))
    seeds = (
        li.select(F.col("src").alias("vid"))
        .unionByName(li.select(F.col("dst").alias("vid")))
        .distinct().orderBy("vid").limit(3)
    )
    return weighted_harmonic_centrality(li, seeds, max_rounds=3,
                                        weight_col="w")


def q_weighted_sssp(spark, sf_dir):
    """Bounded Bellman-Ford weighted SSSP from the 3 smallest vids, 3
    relaxation rounds: min over all <=3-edge paths of the sum of edge
    weights (min l_quantity per distinct pair — integer-valued doubles,
    exact path sums). Oracle: depth-bounded recursive CTE + MIN(sum)."""
    from credigraph_spark.graph.sssp import weighted_sssp

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst"),
        F.col("l_quantity").cast("double").alias("w"),
    ).groupBy("src", "dst").agg(F.min("w").alias("w"))
    seeds = (
        li.select(F.col("src").alias("vid"))
        .unionByName(li.select(F.col("dst").alias("vid")))
        .distinct().orderBy("vid").limit(3)
    )
    d = weighted_sssp(li, seeds, max_rounds=3, weight_col="w")
    return d.select("vid", F.round("dist", 8).alias("dist"))


def q_closeness_centrality(spark, sf_dir):
    """Bounded-horizon closeness (r / sum of dists over reachable
    vertices) of the 3 smallest vids within a 3-hop horizon, directed.
    Oracle: the same per-seed depth-bounded recursive CTE with an exact
    integer count + dist-sum and one final rounded division."""
    from credigraph_spark.graph.nhop import closeness_centrality

    edges = _edges(spark, sf_dir)
    seeds = (
        edges.select(F.col("src").alias("vid"))
        .unionByName(edges.select(F.col("dst").alias("vid")))
        .distinct().orderBy("vid").limit(3)
    )
    return closeness_centrality(edges, seeds, max_hops=3, directed=True)


def q_eccentricity(spark, sf_dir):
    """Bounded-horizon eccentricity (max hop distance + reach count) of
    the 3 smallest vids within 3 hops, directed. All-integer columns —
    the oracle comparison is exact with no rounding anywhere."""
    from credigraph_spark.graph.nhop import eccentricity

    edges = _edges(spark, sf_dir)
    seeds = (
        edges.select(F.col("src").alias("vid"))
        .unionByName(edges.select(F.col("dst").alias("vid")))
        .distinct().orderBy("vid").limit(3)
    )
    return eccentricity(edges, seeds, max_hops=3, directed=True)


def q_katz(spark, sf_dir):
    """Katz centrality, alpha=0.05 beta=1, 3 supersteps, unweighted
    simple graph. Oracle: the Jacobi recurrence unrolled as CTEs
    (pagerank_5iter pattern), ROUND(x, 8)."""
    from credigraph_spark.graph.katz import katz_centrality

    out, _ = katz_centrality(_edges(spark, sf_dir), alpha=0.05, beta=1.0,
                             max_iter=3)
    return out.select("vid", F.round("x", 8).alias("katz"))


def q_stratified_sample(spark, sf_dir):
    """At most 5 documents per language, selected by md5(doc_id|seed)
    order via the two-phase (salted then global) window — result is
    bit-identical to the single-window SQL oracle because the md5 order
    is total over unique doc_ids."""
    from credigraph_spark.pipeline.sampling import stratified_sample

    docs = _t(spark, sf_dir, "documents")
    return (stratified_sample(docs, "lang", k=5, key_cols=["doc_id"],
                              seed=42)
            .select("doc_id", "lang"))


def q_hash_split(spark, sf_dir):
    """Stable train/val/test assignment: first 15 hex digits of
    md5(doc_id|seed) as a 60-bit fraction — exact in a double, so the
    bucket boundaries are bit-identical in any engine with md5."""
    from credigraph_spark.pipeline.sampling import hash_split

    docs = _t(spark, sf_dir, "documents").select("doc_id")
    return hash_split(docs, ["doc_id"],
                      {"train": 0.8, "val": 0.1, "test": 0.1}, seed=7)


def q_curated_corpus(spark, sf_dir):
    """Flagship training-data curation pipeline, end to end: MinHash-LSH
    near-dup clusters -> keep one canonical doc per cluster -> stable
    hash split -> per-(split, language) document and char counts.
    Every stage is an already-oracle-checked operator (dedup_canonical,
    hash_split); the composition's outputs are all integers, so the
    oracle comparison is exact."""
    from credigraph_spark.pipeline import dedup_canonical, hash_split

    docs = _t(spark, sf_dir, "documents")
    canon = dedup_canonical(docs, num_hashes=4, rows_per_band=2)
    kept = docs.join(canon.where(F.col("is_canonical"))
                     .select("doc_id"), "doc_id")
    split = hash_split(kept, ["doc_id"],
                       {"train": 0.8, "val": 0.1, "test": 0.1}, seed=7)
    return (split.groupBy("split", "lang")
            .agg(F.count("*").alias("n_docs"),
                 F.sum("n_chars").alias("total_chars")))


def q_transitivity(spark, sf_dir):
    """Global transitivity 3T/W of the undirected simple graph — exact
    integer triangle and wedge counts, one rounded division."""
    from credigraph_spark.graph.triangles import global_transitivity

    return global_transitivity(_edges(spark, sf_dir))


def q_degree_tail_alpha(spark, sf_dir):
    """Hill power-law exponent of the total-degree tail (d_min=10):
    1 + n/Σ ln(deg/d_min). Oracle: same closed form in SQL."""
    from credigraph_spark.analytics import degree_tail_alpha

    return degree_tail_alpha(_edges(spark, sf_dir), d_min=10)


def q_modularity(spark, sf_dir):
    """Newman modularity of the LPA-3-iteration labeling over the
    undirected simple graph. Oracle: the lpa_3iter CTE chain composed
    with the closed-form community aggregation."""
    from credigraph_spark.analytics import modularity
    from credigraph_spark.graph import label_propagation

    edges = _edges(spark, sf_dir)
    labels, _ = label_propagation(edges, max_iter=3)
    return modularity(edges, labels, label_col="label")


def q_weighted_modularity(spark, sf_dir):
    """Weighted Newman modularity of the weighted-LPA 3-iteration
    labeling: Q_w with intra weight / strength / total weight over the
    summed-l_quantity undirected graph (exact bigint aggregates, one
    float expression rounded to 8)."""
    from credigraph_spark.analytics import weighted_modularity
    from credigraph_spark.graph import label_propagation

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst"),
        F.col("l_quantity").cast("double").alias("w"))
    labels, _ = label_propagation(li, max_iter=3, weight_col="w")
    wi = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst"),
        F.col("l_quantity").cast("bigint").alias("w"))
    # Hash-stable driver surface: the exact integer numerator/denominator
    # of Q_w instead of the order-dependent global double sum (bigint is
    # exact at driver/bench scales; the API keeps decimal + the float).
    return weighted_modularity(wi, labels, weight_col="w",
                               label_col="label").select(
        F.col("total_weight").cast("bigint").alias("total_weight"),
        F.col("n_communities").cast("bigint").alias("n_communities"),
        F.col("q_num").cast("bigint").alias("q_num"),
        F.col("q_den").cast("bigint").alias("q_den"))


def q_weighted_clustering(spark, sf_dir):
    """Barrat weighted local clustering coefficient over the summed-
    l_quantity undirected graph — integer weights make every corner
    credit and the strength product exact, so values compare with NO
    rounding."""
    from credigraph_spark.graph import weighted_clustering_coefficient

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst"),
        F.col("l_quantity").cast("bigint").alias("w"))
    return weighted_clustering_coefficient(li, weight_col="w")


def q_louvain_modularity(spark, sf_dir):
    """Newman modularity of the 2-round Louvain labeling — the
    community family scoring itself (X25 applied to X41). Oracle: the
    louvain CTE chain composed with the closed-form aggregation."""
    from credigraph_spark.analytics import modularity
    from credigraph_spark.graph import louvain_local_move

    edges = _edges(spark, sf_dir)
    labels = louvain_local_move(edges, rounds=2) \
        .withColumnRenamed("community", "label")
    return modularity(edges, labels, label_col="label")


def q_betweenness(spark, sf_dir):
    """Seed-sampled Brandes betweenness (3 smallest vids, 3-hop horizon,
    directed): forward σ level sweep + backward δ accumulation. Oracle:
    the same two sweeps unrolled level-by-level in SQL."""
    from credigraph_spark.graph.betweenness import betweenness_from_seeds

    edges = _edges(spark, sf_dir)
    seeds = (
        edges.select(F.col("src").alias("vid"))
        .unionByName(edges.select(F.col("dst").alias("vid")))
        .distinct().orderBy("vid").limit(3)
    )
    return betweenness_from_seeds(edges, seeds, max_hops=3)


def q_node2vec_walks(spark, sf_dir):
    """node2vec-biased deterministic walks (p=0.5 return-happy, q=2.0
    exploration-averse), 3 steps x 2 walks from the 3 smallest vids.
    The exact interval sampler (running alpha-sums in x order, md5 hex
    fraction target) replays bit-identically in the unrolled oracle."""
    from credigraph_spark.graph import node2vec_walks

    edges = _edges(spark, sf_dir)
    seeds = (
        edges.select(F.col("src").alias("vid"))
        .unionByName(edges.select(F.col("dst").alias("vid")))
        .distinct().orderBy("vid").limit(3)
    )
    return node2vec_walks(edges, seeds, walk_length=3, p=0.5, q=2.0,
                          walks_per_seed=2)


def q_walks(spark, sf_dir):
    """Deterministic uniform walks (md5-argmin next hop), 4 steps x 2
    walks from the 3 smallest vids. Oracle: per-step ROW_NUMBER over the
    same md5 ordering."""
    from credigraph_spark.graph.walks import deterministic_walks

    edges = _edges(spark, sf_dir)
    seeds = (
        edges.select(F.col("src").alias("vid"))
        .unionByName(edges.select(F.col("dst").alias("vid")))
        .distinct().orderBy("vid").limit(3)
    )
    return deterministic_walks(edges, seeds, walk_length=4,
                               walks_per_seed=2)


def q_anf_sketch(spark, sf_dir):
    """Flajolet-Martin neighborhood-function sketch, 3 hops, 4 registers:
    the per-hop rho-sum is an exact integer fingerprint of the sketch
    state, so the oracle (same md5-derived registers, BIT_OR supersteps)
    hash-matches bit-for-bit."""
    from credigraph_spark.graph.anf import anf_sketch

    per_hop, _ = anf_sketch(_edges(spark, sf_dir), max_hops=3,
                            num_registers=4, seed=7)
    return per_hop


def q_sitemap_links(spark, sf_dir):
    """F10+F9: robots.txt Sitemap extraction + URL resolution. Robots
    bodies are synthesized deterministically from (source, doc_id) — one
    absolute and one root-relative Sitemap line each — so the oracle is
    the ground-truth construction; the relative line exercises the
    stdlib-urljoin UDF path, the absolute line the JVM fast path."""
    from credigraph_spark.web import extract_sitemaps

    docs = _t(spark, sf_dir, "documents")
    robots = docs.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit("/robots.txt")).alias("url"),
        F.concat(
            F.lit("User-agent: *\nDisallow: /private\nSitemap: https://"),
            F.col("source"), F.lit("/sitemap.xml\nsitemap: /s"),
            (F.col("doc_id") % 10).cast("string"), F.lit(".xml\n"),
        ).alias("content"),
    )
    return extract_sitemaps(robots, "url", "content")


def q_redirect_edges(spark, sf_dir):
    """F10: HTTP 30x status-line filter + Location extraction, resolved
    with url_join (relative Location -> UDF path). Header blocks are
    synthesized from (source, doc_id); every doc_id % 3 == 0 row is a
    301 with a root-relative Location, the rest are 200s."""
    from credigraph_spark.web import extract_redirects

    docs = _t(spark, sf_dir, "documents")
    headers = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(F.lit("HTTP/1.1 301 Moved Permanently\r\nLocation: /new/"),
                 F.col("doc_id").cast("string"), F.lit("\r\nContent-Length: 0\r\n")),
    ).otherwise(F.lit("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"))
    pages = docs.select(
        F.concat(F.lit("https://"), F.col("source"), F.lit("/old/"),
                 F.col("doc_id").cast("string")).alias("url"),
        headers.alias("headers"),
    )
    return extract_redirects(pages, "url", "headers")


def q_ann_ivf_topk(spark, sf_dir):
    from credigraph_spark.pipeline import ivf_topk

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.where(F.col("vec_id") < 5)
    # md5-seeded coarse centroids + 6dp argmax/rank orderings -> the cell
    # assignment and the ranking are bit-reproducible in DuckDB (full oracle)
    out = ivf_topk(queries, emb, k=5, n_lists=8, nprobe=3, seed=7,
                   round_digits=6)
    return out.select("query_id", "neighbor_id", "rank")


def q_ann_pq_topk(spark, sf_dir):
    """Product-quantization ANN: md5-seeded codebooks (8 subspaces x 16
    codewords) TRAINED with one deterministic Lloyd pass (exact
    quantized-integer member means, VERDICT r4 #6), per-subspace argmin
    encoding, asymmetric-distance top-10 per query. Subspace distances
    are left-fold sums (bit-equal to DuckDB's list_reduce); assignment
    ties and the final ranking use the 6dp-rounded values, so the whole
    plan — training included — is oracle-reproducible."""
    from credigraph_spark.pipeline import pq_adc_topk

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.where(F.col("vec_id") < 5)
    return pq_adc_topk(queries, emb, k_nn=10, m=8, k=16, seed=7,
                       train_iters=1)


def q_ann_ivfpq_topk(spark, sf_dir):
    """True IVF-PQ: coarse cells prune WHICH candidates each query scans
    (nprobe=3 of 8 md5-seeded lists), PQ codes compress WHAT is scanned
    (8x16 codebooks, ADC re-rank). Both halves keep their bit-exact
    md5/6dp constructions, so the composition has a full oracle."""
    from credigraph_spark.pipeline import ivfpq_topk

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    queries = emb.where(F.col("vec_id") < 5)
    return ivfpq_topk(queries, emb, k_nn=10, n_lists=8, nprobe=3,
                      m=8, k=16, seed=7, train_iters=1)


def q_embedding_near_dups(spark, sf_dir):
    from credigraph_spark.pipeline import embedding_near_dup_pairs

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    out = embedding_near_dup_pairs(emb, threshold=0.4, method="exact")
    return out.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))


def q_neighbor_feature_mean(spark, sf_dir):
    """GraphSAGE-style mean-pool prep: for each vertex, the element-wise
    mean of its IN-neighbors' embedding vectors (vertices keyed by
    vec_id over the lineitem graph restricted to vids with embeddings).
    Long form (vid, dim_idx, nbr_mean) — posexplode keeps the plan pure
    codegen and the shuffle one partial-aggregated (vid, idx) sum; means
    rounded to 6dp (summation order differs across engines). The
    feature-smoothing half of the GNN data story next to walks +
    neighbor sampling."""
    edges = _edges(spark, sf_dir)
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("src"),
        F.col("embedding").cast("array<double>").alias("v"))
    feats = edges.join(emb, "src").select(
        F.col("dst").alias("vid"), F.posexplode("v").alias("dim_idx", "x"))
    return (
        feats.groupBy("vid", "dim_idx")
        .agg(F.round(F.avg("x"), 6).alias("nbr_mean"))
        .where(F.col("dim_idx") < 4)   # 4 dims keep the compare compact
    )


def q_sage_2hop(spark, sf_dir):
    """Two-hop GraphSAGE mean-pooling with EXACT order-independent means
    (floor(x*1e9) decimal sums, one double division per hop): the 1-hop
    `neighbor_feature_mean` rounds a float avg to 6dp — fine for one
    level, but compounding hops would drift across engines; the exact
    construction makes the 2-hop mean-of-means bit-reproducible. First 4
    dims keep the compare compact (per-dim means are independent, so
    early pruning is exact)."""
    from credigraph_spark.features import neighbor_mean_exact

    edges = _edges(spark, sf_dir)
    emb = _t(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("vid"),
        F.col("embedding").cast("array<double>").alias("v"))
    out = neighbor_mean_exact(edges, emb, id_col="vid", vec_col="v",
                              hops=2, max_dims=4)
    return out.select("vid", F.col("d").alias("dim_idx"),
                      F.col("val").alias("nbr_mean2"))


def q_mis_3round(spark, sf_dir):
    """Luby maximal independent set, 3 synchronous rounds: md5-priority
    local minima join the MIS, their neighbourhoods deactivate. The hex
    priorities compare bytewise in any engine, so every round replays
    exactly (same determinism family as walks/ANF)."""
    from credigraph_spark.graph import maximal_independent_set

    out, _ = maximal_independent_set(_edges(spark, sf_dir), rounds=3,
                                     seed=7)
    return out


def q_kmeans_assign(spark, sf_dir):
    """Deterministic k-means corpus clustering (8 cells, 2 Lloyd
    iterations): md5-seeded centroids, ORDER-INDEPENDENT quantized-
    integer member means (the floor(x*1e9) exact-sum construction from
    the trained-PQ path), 6dp-rounded cosine assignment — the whole
    clustering, training included, replays bit-identically in DuckDB."""
    from credigraph_spark.pipeline import kmeans_assign

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    return kmeans_assign(emb, k=8, iters=2, seed=7).withColumnRenamed(
        "id", "vec_id")


def q_feature_matrix(spark, sf_dir):
    """Distributed feature-matrix assembly for the ML serving store
    (VERDICT r4 #8; reference: tgrag/utils/readers.py:188-203 torch.cat
    of per-column encoder outputs + construct_relational_table.py:99-117
    domain(id, ts, x BLOB, y REAL)): min-max-normalized account balance,
    one-hot market segment (np.unique order), a zero pad and two
    deterministic-hash RNI dims, concatenated per customer; label y =
    exact-decimal total spend with the reference's -1.0 missing sentinel
    (J4), ts = latest order date as yyyymmdd. The vector is probed with
    exact scalar columns (dim, first cell, hot position, left-fold sum)
    so every element is oracle-pinned without comparing raw arrays."""
    from credigraph_spark.features import assemble_features

    cust = _t(spark, sf_dir, "customer")
    feats, names = assemble_features(
        cust, "c_custkey", norm_cols=["c_acctbal"],
        categorical_cols=["c_mktsegment"], zero_dims=1, rni_dims=2,
        rni_seed=3)
    n_classes = sum(1 for n in names if n.startswith("onehot:"))
    lab = _t(spark, sf_dir, "orders").groupBy(
        F.col("o_custkey").alias("c_custkey")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("_spend"),
        F.max(F.date_format("o_orderdate", "yyyyMMdd").cast("int"))
        .alias("_ts"))
    return (
        feats.join(lab, "c_custkey", "left")
        .select(
            F.col("c_custkey").alias("vid"),
            F.coalesce("_ts", F.lit(0)).alias("ts"),
            F.size("x").alias("x_dim"),
            F.element_at("x", 1).alias("x0"),
            F.array_position(F.slice("x", 2, n_classes), F.lit(1.0))
            .alias("hot_idx"),
            F.aggregate("x", F.lit(0.0), lambda a, v: a + v).alias("x_sum"),
            F.coalesce(F.col("_spend").cast("double"), F.lit(-1.0))
            .alias("y"),
        )
    )


def q_embedding_norms(spark, sf_dir):
    """Per-vector hygiene stats for the embedding column: dimension, L2
    norm (left-fold sum of squares — bit-equal to DuckDB's list_reduce
    — then one sqrt), max |component|, zero-component count. The scan
    every embedding ingest runs before indexing (NaN/zero/degenerate-
    norm vectors break cosine math downstream)."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"))
    sq = F.aggregate(
        F.transform(F.col("v"), lambda x: x * x),
        F.lit(0.0), lambda acc, x: acc + x)
    return emb.select(
        "vec_id",
        F.size("v").alias("dim"),
        F.sqrt(sq).alias("l2_norm"),
        F.array_max(F.transform(F.col("v"), F.abs)).alias("max_abs"),
        F.size(F.filter(F.col("v"), lambda x: x == 0.0)).alias("n_zeros"),
    )


def q_binary_metadata(spark, sf_dir):
    from credigraph_spark.pipeline.multimodal import attach_binary_metadata

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("data")
    )
    return attach_binary_metadata(docs).select("doc_id", "n_bytes", "sha256")


def q_frame_sample(spark, sf_dir):
    """Video frame-sampling plan (multimodal family): 4 evenly-spaced frame
    offsets per media row — pure generator SQL (posexplode over a transform'd
    sequence), no UDF, so DuckDB can replay it exactly. Duration is derived
    deterministically from the text length (1 char = 1 s stand-in)."""
    from credigraph_spark.pipeline.multimodal import frame_sample_plan

    media = _t(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        F.length("text").cast("double").alias("dur"),
    )
    plan = frame_sample_plan(media, id_col="media_id", n_frames=4,
                             duration_col="dur")
    return plan.select("media_id",
                       F.col("frame_idx").cast("long").alias("frame_idx"),
                       F.round("t_offset", 6).alias("t_offset"))


# ---------------------------------------------------------------------------
# oracle SQL builders (iterative algorithms unrolled)
# ---------------------------------------------------------------------------

def _pagerank5_parts() -> list[str]:
    """Shared CTE chain: 5 PageRank iterations ending at r5."""
    d, iters = 0.85, 5
    parts = [
        f"WITH e AS MATERIALIZED ({_E_SQL})",
        f"verts AS MATERIALIZED ({_VERTS_SQL})",
        "deg AS MATERIALIZED (SELECT src AS vid, COUNT(*) AS outdeg FROM e GROUP BY src)",
        "n AS (SELECT COUNT(*) AS c FROM verts)",
        "r0 AS MATERIALIZED (SELECT vid, 1.0/(SELECT c FROM n) AS rank FROM verts)",
    ]
    for i in range(iters):
        parts.append(
            f"d{i} AS (SELECT COALESCE(SUM(rank), 0) AS dang FROM r{i} r "
            f"LEFT JOIN deg USING (vid) WHERE deg.outdeg IS NULL)"
        )
        parts.append(
            f"r{i+1} AS MATERIALIZED (SELECT v.vid, (1-{d})/(SELECT c FROM n) + {d} * ("
            f"COALESCE(c.contrib, 0) + (SELECT dang FROM d{i})/(SELECT c FROM n)) AS rank "
            f"FROM verts v LEFT JOIN (SELECT e.dst AS vid, SUM(r.rank / deg.outdeg) AS contrib "
            f"FROM e JOIN r{i} r ON e.src = r.vid JOIN deg ON deg.vid = e.src "
            f"GROUP BY e.dst) c ON v.vid = c.vid)"
        )
    return parts


def _pagerank5_sql() -> str:
    return (",\n".join(_pagerank5_parts())
            + "\nSELECT vid, ROUND(rank, 8) AS rank FROM r5")


def _pagerank_incremental_sql() -> str:
    """DuckDB mirror of q_pagerank_incremental: 5 cold iterations on the
    old-snapshot edge set, then the engine's warm-start seeding (receivers
    of the full graph take their old rank, everyone else 1/N, multiply by
    scale = 1/total-mass — same multiply-by-reciprocal as the engine so
    the float path is identical) and 5 more iterations on the full graph."""
    d, iters = 0.85, 5
    e_old = (_E_SQL + " AND l_orderkey % 10 <> 0")
    parts = [
        f"WITH ea AS MATERIALIZED ({e_old})",
        "vertsa AS MATERIALIZED (SELECT src AS vid FROM ea UNION SELECT dst FROM ea)",
        "dega AS MATERIALIZED (SELECT src AS vid, COUNT(*) AS outdeg FROM ea GROUP BY src)",
        "na AS (SELECT COUNT(*) AS c FROM vertsa)",
        "a0 AS MATERIALIZED (SELECT vid, 1.0/(SELECT c FROM na) AS rank FROM vertsa)",
    ]
    for i in range(iters):
        parts.append(
            f"da{i} AS (SELECT COALESCE(SUM(rank), 0) AS dang FROM a{i} r "
            f"LEFT JOIN dega USING (vid) WHERE dega.outdeg IS NULL)")
        parts.append(
            f"a{i+1} AS MATERIALIZED (SELECT v.vid, (1-{d})/(SELECT c FROM na) + {d} * ("
            f"COALESCE(c.contrib, 0) + (SELECT dang FROM da{i})/(SELECT c FROM na)) AS rank "
            f"FROM vertsa v LEFT JOIN (SELECT ea.dst AS vid, SUM(r.rank / dega.outdeg) AS contrib "
            f"FROM ea JOIN a{i} r ON ea.src = r.vid JOIN dega ON dega.vid = ea.src "
            f"GROUP BY ea.dst) c ON v.vid = c.vid)")
    parts += [
        f"e AS MATERIALIZED ({_E_SQL})",
        f"verts AS MATERIALIZED ({_VERTS_SQL})",
        "deg AS MATERIALIZED (SELECT src AS vid, COUNT(*) AS outdeg FROM e GROUP BY src)",
        "n AS (SELECT COUNT(*) AS c FROM verts)",
        "recv AS MATERIALIZED (SELECT DISTINCT dst AS vid FROM e)",
        # engine seeding: receivers keep the old rank when present, every
        # other vertex gets 1/N; then rank * (1.0 / total) (reciprocal
        # multiply, matching pagerank.py's `scale`)
        f"seed AS MATERIALIZED (SELECT v.vid, CASE WHEN rv.vid IS NOT NULL "
        f"AND w.vid IS NOT NULL THEN w.rank ELSE 1.0/(SELECT c FROM n) END AS rank "
        f"FROM verts v LEFT JOIN recv rv ON v.vid = rv.vid "
        f"LEFT JOIN a{iters} w ON v.vid = w.vid)",
        "tot AS (SELECT SUM(rank) AS t FROM seed)",
        "r0 AS MATERIALIZED (SELECT vid, rank * (1.0 / (SELECT t FROM tot)) AS rank FROM seed)",
    ]
    for i in range(iters):
        parts.append(
            f"d{i} AS (SELECT COALESCE(SUM(rank), 0) AS dang FROM r{i} r "
            f"LEFT JOIN deg USING (vid) WHERE deg.outdeg IS NULL)")
        parts.append(
            f"r{i+1} AS MATERIALIZED (SELECT v.vid, (1-{d})/(SELECT c FROM n) + {d} * ("
            f"COALESCE(c.contrib, 0) + (SELECT dang FROM d{i})/(SELECT c FROM n)) AS rank "
            f"FROM verts v LEFT JOIN (SELECT e.dst AS vid, SUM(r.rank / deg.outdeg) AS contrib "
            f"FROM e JOIN r{i} r ON e.src = r.vid JOIN deg ON deg.vid = e.src "
            f"GROUP BY e.dst) c ON v.vid = c.vid)")
    return ",\n".join(parts) + f"\nSELECT vid, ROUND(rank, 8) AS rank FROM r{iters}"


def _pagerank_weighted5_sql(ew: str | None = None) -> str:
    """DuckDB mirror of pagerank(weight_col='w'): contribution
    rank·w/W(src), W = total outgoing weight; dangling (no out-edges)
    restarts uniformly. Vertex set and N are identical to the unweighted
    query (endpoints of the cleaned edge set). ``ew``: override the
    weighted-edge CTE (defaults to summed l_quantity per pair)."""
    d, iters = 0.85, 5
    if ew is None:
        ew = ("SELECT l_partkey AS src, l_suppkey AS dst, "
              "SUM(CAST(l_quantity AS DOUBLE)) AS w FROM lineitem "
              "WHERE l_partkey <> l_suppkey GROUP BY 1, 2")
    parts = [
        f"WITH e AS MATERIALIZED ({ew})",
        f"verts AS MATERIALIZED ({_VERTS_SQL})",
        "deg AS MATERIALIZED (SELECT src AS vid, SUM(w) AS outw FROM e GROUP BY src)",
        "n AS (SELECT COUNT(*) AS c FROM verts)",
        "r0 AS MATERIALIZED (SELECT vid, 1.0/(SELECT c FROM n) AS rank FROM verts)",
    ]
    for i in range(iters):
        parts.append(
            f"d{i} AS (SELECT COALESCE(SUM(rank), 0) AS dang FROM r{i} r "
            f"LEFT JOIN deg USING (vid) WHERE deg.outw IS NULL)"
        )
        parts.append(
            f"r{i+1} AS MATERIALIZED (SELECT v.vid, (1-{d})/(SELECT c FROM n) + {d} * ("
            f"COALESCE(c.contrib, 0) + (SELECT dang FROM d{i})/(SELECT c FROM n)) AS rank "
            f"FROM verts v LEFT JOIN (SELECT e.dst AS vid, "
            f"SUM(r.rank * e.w / deg.outw) AS contrib "
            f"FROM e JOIN r{i} r ON e.src = r.vid JOIN deg ON deg.vid = e.src "
            f"GROUP BY e.dst) c ON v.vid = c.vid)"
        )
    return ",\n".join(parts) + f"\nSELECT vid, ROUND(rank, 8) AS rank FROM r{iters}"


def _hits3_sql() -> str:
    """DuckDB mirror of graph.hits.hits (3 fixed iterations, L1-normalized
    each half-step, auth updated from hub then hub from the new auth).
    Every state CTE is MATERIALIZED: each is referenced 2-3 times, and with
    default inlining DuckDB re-evaluates per reference — exponential across
    the unrolled iterations (~186 s at sf0.01 inlined vs ~1 s materialized).
    """
    iters = 3
    parts = [
        f"WITH e AS MATERIALIZED ({_E_SQL})",
        f"verts AS MATERIALIZED ({_VERTS_SQL})",
        "n AS (SELECT COUNT(*) AS c FROM verts)",
        "s0 AS MATERIALIZED (SELECT vid, 1.0/(SELECT c FROM n) AS hub, "
        "1.0/(SELECT c FROM n) AS auth FROM verts)",
    ]
    for i in range(iters):
        parts.append(
            f"a{i}r AS MATERIALIZED (SELECT v.vid, COALESCE(c.raw, 0) AS raw FROM verts v "
            f"LEFT JOIN (SELECT e.dst AS vid, SUM(s.hub) AS raw FROM e "
            f"JOIN s{i} s ON e.src = s.vid GROUP BY e.dst) c ON v.vid = c.vid)"
        )
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT vid, raw / (SELECT SUM(raw) FROM a{i}r) AS auth FROM a{i}r)"
        )
        parts.append(
            f"h{i}r AS MATERIALIZED (SELECT v.vid, COALESCE(c.raw, 0) AS raw FROM verts v "
            f"LEFT JOIN (SELECT e.src AS vid, SUM(a.auth) AS raw FROM e "
            f"JOIN a{i} a ON e.dst = a.vid GROUP BY e.src) c ON v.vid = c.vid)"
        )
        parts.append(
            f"s{i+1} AS MATERIALIZED (SELECT h.vid, h.raw / (SELECT SUM(raw) FROM h{i}r) AS hub, "
            f"a.auth FROM h{i}r h JOIN a{i} a ON h.vid = a.vid)"
        )
    return ",\n".join(parts) + (
        f"\nSELECT vid, ROUND(hub, 8) AS hub, ROUND(auth, 8) AS auth FROM s{iters}"
    )


def _kcore3_sql(k: int = 30, rounds: int = 3) -> str:
    """DuckDB mirror of graph.kcore.k_core(k, max_rounds): unrolled peel
    rounds over the symmetrized distinct edge set."""
    parts = [f"WITH e0 AS ({_UND_SQL})"]
    for i in range(rounds):
        parts.append(
            f"v{i+1} AS (SELECT src AS vid FROM e{i} GROUP BY src "
            f"HAVING COUNT(*) >= {k})"
        )
        parts.append(
            f"e{i+1} AS (SELECT src, dst FROM e{i} "
            f"WHERE src IN (SELECT vid FROM v{i+1}) "
            f"AND dst IN (SELECT vid FROM v{i+1}))"
        )
    return ",\n".join(parts) + (
        f"\nSELECT src AS vid, COUNT(*) AS deg FROM e{rounds} GROUP BY src"
    )


def _score2_sql(s: int = 900, rounds: int = 2) -> str:
    """DuckDB mirror of graph.kcore.s_core(s, max_rounds): unrolled
    strength-peel rounds over the symmetrized weight-summed edge set
    (integer weights — exact compare)."""
    ew = ("SELECT l_partkey AS src, l_suppkey AS dst, "
          "SUM(CAST(l_quantity AS BIGINT)) AS w FROM lineitem "
          "WHERE l_partkey <> l_suppkey GROUP BY 1, 2")
    parts = [
        f"WITH ew AS MATERIALIZED ({ew})",
        "e0 AS MATERIALIZED (SELECT src, dst, SUM(w) AS w FROM "
        "(SELECT src, dst, w FROM ew UNION ALL "
        "SELECT dst, src, w FROM ew) GROUP BY 1, 2)",
    ]
    for i in range(rounds):
        parts.append(
            f"v{i+1} AS (SELECT src AS vid FROM e{i} GROUP BY src "
            f"HAVING SUM(w) >= {s})")
        parts.append(
            f"e{i+1} AS (SELECT src, dst, w FROM e{i} "
            f"WHERE src IN (SELECT vid FROM v{i+1}) "
            f"AND dst IN (SELECT vid FROM v{i+1}))")
    return ",\n".join(parts) + (
        # CAST: DuckDB types SUM(BIGINT) as HUGEINT/int128, which hashes
        # differently from Spark's int64 even when values are identical.
        f"\nSELECT src AS vid, CAST(SUM(w) AS BIGINT) AS strength "
        f"FROM e{rounds} GROUP BY src"
    )


def _linkpred_sql(k: int = 50) -> str:
    """DuckDB mirror of link_prediction_topk: wedge enumeration through
    shared neighbors, CN/Jaccard/Adamic-Adar for non-adjacent u < v,
    top-k by the 6dp-rounded AA score with (u, v) tiebreak."""
    return f"""
        WITH und AS MATERIALIZED ({_UND_SQL}),
        deg AS MATERIALIZED (SELECT src AS w, COUNT(*) AS deg FROM und GROUP BY src),
        inc AS MATERIALIZED (SELECT und.src AS w, und.dst AS n, deg.deg
                             FROM und JOIN deg ON und.src = deg.w),
        wedges AS (SELECT a.n AS u, b.n AS v, a.deg AS wdeg
                   FROM inc a JOIN inc b ON a.w = b.w AND a.n < b.n),
        scores AS (SELECT u, v, COUNT(*) AS common_neighbors,
                          SUM(1.0 / ln(wdeg)) AS aa
                   FROM wedges GROUP BY u, v),
        cand AS (SELECT s.* FROM scores s WHERE NOT EXISTS
                   (SELECT 1 FROM und WHERE und.src = s.u AND und.dst = s.v))
        SELECT c.u, c.v, c.common_neighbors,
               ROUND(c.common_neighbors::DOUBLE
                     / (du.deg + dv.deg - c.common_neighbors), 8) AS jaccard,
               ROUND(c.aa, 6) AS adamic_adar
        FROM cand c JOIN deg du ON c.u = du.w JOIN deg dv ON c.v = dv.w
        ORDER BY ROUND(c.aa, 6) DESC, c.u, c.v LIMIT {k}"""


def _diameter_sql(max_hops: int = 6) -> str:
    """DuckDB mirror of diameter_2approx: level-set BFS unrolled per hop
    (set-based — a recursive walk CTE would enumerate exponentially many
    paths at this horizon), farthest vertex by (dist DESC, vid), second
    unrolled BFS from it."""
    def bfs(tag: str, seed_cte: str) -> list[str]:
        parts = [
            f"{tag}s0 AS MATERIALIZED (SELECT vid, 0 AS dist FROM {seed_cte})"]
        prev_seen, prev_frontier = f"{tag}s0", f"{tag}s0"
        for h in range(1, max_hops + 1):
            f_cte, s_cte = f"{tag}f{h}", f"{tag}s{h}"
            parts.append(
                f"{f_cte} AS MATERIALIZED (SELECT DISTINCT und.dst AS vid, "
                f"{h} AS dist FROM und JOIN {prev_frontier} p "
                f"ON und.src = p.vid WHERE und.dst NOT IN "
                f"(SELECT vid FROM {prev_seen}))")
            parts.append(
                f"{s_cte} AS MATERIALIZED (SELECT vid, dist FROM {prev_seen} "
                f"UNION ALL SELECT vid, dist FROM {f_cte})")
            prev_seen, prev_frontier = s_cte, f_cte
        return parts

    parts = [
        f"WITH und AS MATERIALIZED ({_UND_SQL})",
        f"verts AS MATERIALIZED ({_VERTS_SQL})",
        "st AS (SELECT MIN(vid) AS vid FROM verts)",
    ]
    parts += bfs("a", "st")
    parts.append(
        f"far AS (SELECT vid, dist FROM as{max_hops} "
        f"ORDER BY dist DESC, vid LIMIT 1)")
    parts += bfs("b", "far")
    parts.append(
        f"res AS (SELECT (SELECT vid FROM st) AS start_vid, "
        f"(SELECT vid FROM far) AS far_vid, "
        f"CAST((SELECT dist FROM far) AS INTEGER) AS far_dist, "
        f"CAST((SELECT MAX(dist) FROM bs{max_hops}) AS INTEGER) "
        f"AS diameter_lb)")
    return ",\n".join(parts) + "\nSELECT * FROM res"


def _ppr_batch_sql(iters: int = 3, n_seeds: int = 5, d: float = 0.85) -> str:
    """DuckDB mirror of ppr_batch: per-iteration union of contributions,
    per-seed dangling restarts (state vertices with no out-degree) and
    teleports, summed by (seed, vid)."""
    parts = [
        f"WITH e AS MATERIALIZED ({_E_SQL})",
        f"verts AS MATERIALIZED ({_VERTS_SQL})",
        "deg AS MATERIALIZED (SELECT src AS vid, COUNT(*) AS outdeg "
        "FROM e GROUP BY src)",
        f"sd AS (SELECT vid AS seed FROM verts ORDER BY vid LIMIT {n_seeds})",
        "b0 AS MATERIALIZED (SELECT seed, seed AS vid, 1.0 AS rank FROM sd)",
    ]
    for i in range(iters):
        parts.append(
            f"b{i+1} AS MATERIALIZED (SELECT seed, vid, SUM(c) AS rank FROM ("
            f"SELECT r.seed, e.dst AS vid, {d} * r.rank / deg.outdeg AS c "
            f"FROM e JOIN b{i} r ON e.src = r.vid "
            f"JOIN deg ON deg.vid = e.src "
            f"UNION ALL "
            f"SELECT r.seed, r.seed AS vid, {d} * SUM(r.rank) AS c "
            f"FROM b{i} r LEFT JOIN deg ON r.vid = deg.vid "
            f"WHERE deg.outdeg IS NULL GROUP BY r.seed "
            f"UNION ALL "
            f"SELECT seed, seed AS vid, {1.0 - d} AS c FROM sd"
            f") GROUP BY seed, vid)")
    return ",\n".join(parts) + \
        f"\nSELECT seed, vid, ROUND(rank, 8) AS rank FROM b{iters}"


def _louvain_parts(rounds: int) -> list[str]:
    """Shared phase-1 CTE chain for the louvain oracles: per-round
    w(u,c) / Σtot(c) aggregates, full-outer candidate union with the
    current community, the identical double gain formula, argmax via
    ROW_NUMBER with the (score DESC, c ASC) tie-break."""
    parts = [
        f"WITH und AS MATERIALIZED ({_UND_SQL})",
        "deg AS MATERIALIZED (SELECT src AS vid, COUNT(*) AS deg FROM und GROUP BY src)",
        "twom AS (SELECT CAST(COUNT(*) AS DOUBLE) AS c FROM und)",
        "s0 AS MATERIALIZED (SELECT vid, vid AS community FROM deg)",
    ]
    for r in range(rounds):
        parts.append(
            f"w{r} AS MATERIALIZED (SELECT und.src AS vid, s.community AS c, "
            f"COUNT(*) AS w FROM und JOIN s{r} s ON und.dst = s.vid GROUP BY 1, 2)")
        parts.append(
            f"tot{r} AS MATERIALIZED (SELECT s.community AS c, SUM(deg.deg) AS tot "
            f"FROM s{r} s JOIN deg ON s.vid = deg.vid GROUP BY 1)")
        parts.append(
            f"cand{r} AS (SELECT COALESCE(w.vid, cur.vid) AS vid, "
            f"COALESCE(w.c, cur.c) AS c, COALESCE(w.w, 0) AS w "
            f"FROM w{r} w FULL OUTER JOIN "
            f"(SELECT vid, community AS c FROM s{r}) cur "
            f"ON w.vid = cur.vid AND w.c = cur.c)")
        parts.append(
            f"s{r+1} AS MATERIALIZED (SELECT vid, c AS community FROM ("
            f"SELECT cand.vid, cand.c, CAST(cand.w AS DOUBLE) "
            f"- CAST(deg.deg AS DOUBLE) * CAST(tot.tot - CASE WHEN "
            f"cand.c = s.community THEN deg.deg ELSE 0 END AS DOUBLE) "
            f"/ (SELECT c FROM twom) AS score "
            f"FROM cand{r} cand JOIN tot{r} tot ON cand.c = tot.c "
            f"JOIN deg ON cand.vid = deg.vid JOIN s{r} s ON cand.vid = s.vid) "
            f"QUALIFY ROW_NUMBER() OVER (PARTITION BY vid "
            f"ORDER BY score DESC, c ASC) = 1)")
    return parts


def _louvain_sql(rounds: int = 2) -> str:
    """DuckDB mirror of louvain_local_move (flat phase 1)."""
    parts = _louvain_parts(rounds)
    return ",\n".join(parts) + f"\nSELECT vid, community FROM s{rounds}"


def _louvain2_sql(rounds: int = 2, coarse_rounds: int = 1) -> str:
    """DuckDB mirror of louvain_two_level: phase-1 chain, contraction
    (edge weight = directed-symmetrized edge count between communities,
    intra mass on the self-loop row once), then the weighted local move
    with k(v) = SUM of all incident contracted weight."""
    parts = _louvain_parts(rounds)
    parts.append(
        f"ce AS MATERIALIZED (SELECT a.community AS src, b.community AS dst, "
        f"COUNT(*) AS w FROM und JOIN s{rounds} a ON und.src = a.vid "
        f"JOIN s{rounds} b ON und.dst = b.vid GROUP BY 1, 2)")
    parts += [
        "cdeg AS MATERIALIZED (SELECT src AS vid, SUM(w) AS deg FROM ce "
        "GROUP BY src)",
        "ctwom AS (SELECT CAST(SUM(deg) AS DOUBLE) AS c FROM cdeg)",
        "t0 AS MATERIALIZED (SELECT vid, vid AS community FROM cdeg)",
    ]
    for r in range(coarse_rounds):
        parts.append(
            f"cw{r} AS MATERIALIZED (SELECT ce.src AS vid, t.community AS c, "
            f"SUM(ce.w) AS w FROM ce JOIN t{r} t ON ce.dst = t.vid "
            f"WHERE ce.src <> ce.dst GROUP BY 1, 2)")
        parts.append(
            f"ct{r} AS MATERIALIZED (SELECT t.community AS c, "
            f"SUM(cdeg.deg) AS tot FROM t{r} t JOIN cdeg ON t.vid = cdeg.vid "
            f"GROUP BY 1)")
        parts.append(
            f"cc{r} AS (SELECT COALESCE(w.vid, cur.vid) AS vid, "
            f"COALESCE(w.c, cur.c) AS c, COALESCE(w.w, 0) AS w "
            f"FROM cw{r} w FULL OUTER JOIN "
            f"(SELECT vid, community AS c FROM t{r}) cur "
            f"ON w.vid = cur.vid AND w.c = cur.c)")
        parts.append(
            f"t{r+1} AS MATERIALIZED (SELECT vid, c AS community FROM ("
            f"SELECT cand.vid, cand.c, CAST(cand.w AS DOUBLE) "
            f"- CAST(cdeg.deg AS DOUBLE) * CAST(tot.tot - CASE WHEN "
            f"cand.c = t.community THEN cdeg.deg ELSE 0 END AS DOUBLE) "
            f"/ (SELECT c FROM ctwom) AS score "
            f"FROM cc{r} cand JOIN ct{r} tot ON cand.c = tot.c "
            f"JOIN cdeg ON cand.vid = cdeg.vid "
            f"JOIN t{r} t ON cand.vid = t.vid) "
            f"QUALIFY ROW_NUMBER() OVER (PARTITION BY vid "
            f"ORDER BY score DESC, c ASC) = 1)")
    return ",\n".join(parts) + (
        f"\nSELECT v.vid, t.community FROM s{rounds} v "
        f"JOIN t{coarse_rounds} t ON v.community = t.vid")


def _cocitation_sql(k: int = 50, mode: str = "cocitation") -> str:
    """DuckDB mirror of cocitation_topk: wedge self-join on the shared
    center over the directed deduped edge table, cosine normalized by the
    pair-side degree, top-k by the 6dp-rounded cosine with (u, v) tiebreak."""
    if mode == "cocitation":
        w, n = "src", "dst"
    else:  # coupling
        w, n = "dst", "src"
    return f"""
        WITH e AS MATERIALIZED ({_E_SQL}),
        pdeg AS MATERIALIZED (SELECT {n} AS n, COUNT(*) AS d FROM e GROUP BY {n}),
        pairs AS (SELECT a.{n} AS u, b.{n} AS v, COUNT(*) AS shared
                  FROM e a JOIN e b ON a.{w} = b.{w} AND a.{n} < b.{n}
                  GROUP BY a.{n}, b.{n})
        SELECT p.u, p.v, p.shared,
               ROUND(p.shared / sqrt(du.d * dv.d), 6) AS cosine
        FROM pairs p JOIN pdeg du ON p.u = du.n JOIN pdeg dv ON p.v = dv.n
        ORDER BY ROUND(p.shared / sqrt(du.d * dv.d), 6) DESC, p.u, p.v
        LIMIT {k}"""


def _coreness_sql(k_max: int = 4, rounds: int = 2) -> str:
    """DuckDB mirror of graph.kcore.coreness(k_max, rounds_per_k):
    phases k = 2..k_max over the shrinking symmetrized edge set, each
    unrolled to exactly ``rounds`` peel rounds; vertices present before
    phase k but absent after get core k-1, phase-k_max survivors k_max.
    (Extra rounds past a phase's fixpoint are no-ops, so the engine's
    early-break on convergence matches the fully unrolled SQL.)"""
    parts = [f"WITH p2r0 AS MATERIALIZED ({_UND_SQL})"]
    prev = "p2r0"
    phases = []
    for k in range(2, k_max + 1):
        before = prev
        if k > 2:
            parts.append(f"p{k}r0 AS MATERIALIZED (SELECT * FROM {prev})")
            prev = f"p{k}r0"
            before = prev
        for r in range(1, rounds + 1):
            cur = f"p{k}r{r}"
            parts.append(
                f"{cur} AS MATERIALIZED (SELECT src, dst FROM {prev} "
                f"WHERE src IN (SELECT src FROM {prev} GROUP BY src "
                f"HAVING COUNT(*) >= {k}) "
                f"AND dst IN (SELECT src FROM {prev} GROUP BY src "
                f"HAVING COUNT(*) >= {k}))"
            )
            prev = cur
        phases.append((k, before, prev))
    sels = [
        f"SELECT vid, {k - 1} AS core FROM "
        f"(SELECT DISTINCT src AS vid FROM {before}) b "
        f"WHERE vid NOT IN (SELECT src FROM {after})"
        for k, before, after in phases
    ]
    sels.append(f"SELECT DISTINCT src AS vid, {k_max} AS core FROM {prev}")
    return ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(sels)


def _ppr5_sql() -> str:
    """DuckDB mirror of graph.ppr.personalized_pagerank (5 fixed
    iterations, seeds = 3 smallest vids, dangling mass restarted to the
    seed distribution). Row set = seeds ∪ contribution receivers, same
    as the engine's sparse state."""
    d, iters = 0.85, 5
    parts = [
        f"WITH e AS MATERIALIZED ({_E_SQL})",
        f"verts AS MATERIALIZED ({_VERTS_SQL})",
        "deg AS MATERIALIZED (SELECT src AS vid, COUNT(*) AS outdeg FROM e GROUP BY src)",
        "s AS MATERIALIZED (SELECT DISTINCT vid FROM verts ORDER BY vid LIMIT 3)",
        "ns AS (SELECT COUNT(*) AS c FROM s)",
        "r0 AS MATERIALIZED (SELECT vid, 1.0/(SELECT c FROM ns) AS rank FROM s)",
    ]
    for i in range(iters):
        parts.append(
            f"d{i} AS (SELECT COALESCE(SUM(rank), 0) AS dang FROM r{i} r "
            f"LEFT JOIN deg USING (vid) WHERE deg.outdeg IS NULL)"
        )
        parts.append(
            f"r{i+1} AS MATERIALIZED (SELECT COALESCE(c.vid, s2.vid) AS vid, "
            f"CASE WHEN s2.vid IS NOT NULL THEN (1-{d})/(SELECT c FROM ns) "
            f"+ {d} * (SELECT dang FROM d{i})/(SELECT c FROM ns) ELSE 0 END "
            f"+ {d} * COALESCE(c.contrib, 0) AS rank "
            f"FROM (SELECT e.dst AS vid, SUM(r.rank / deg.outdeg) AS contrib "
            f"FROM e JOIN r{i} r ON e.src = r.vid JOIN deg ON deg.vid = e.src "
            f"GROUP BY e.dst) c FULL JOIN s s2 ON s2.vid = c.vid)"
        )
    return ",\n".join(parts) + f"\nSELECT vid, ROUND(rank, 8) AS rank FROM r{iters}"


def _ppr_weighted5_sql() -> str:
    """DuckDB mirror of personalized_pagerank(weight_col='w'): forwarded
    mass d·rank·w/W(src); weights = summed l_quantity (exact integer-
    valued doubles). Same seeds/dangling semantics as _ppr5_sql."""
    d, iters = 0.85, 5
    ew = ("SELECT l_partkey AS src, l_suppkey AS dst, "
          "SUM(CAST(l_quantity AS DOUBLE)) AS w FROM lineitem "
          "WHERE l_partkey <> l_suppkey GROUP BY 1, 2")
    parts = [
        f"WITH e AS MATERIALIZED ({ew})",
        f"verts AS MATERIALIZED ({_VERTS_SQL})",
        "deg AS MATERIALIZED (SELECT src AS vid, SUM(w) AS outw FROM e GROUP BY src)",
        "s AS MATERIALIZED (SELECT DISTINCT vid FROM verts ORDER BY vid LIMIT 3)",
        "ns AS (SELECT COUNT(*) AS c FROM s)",
        "r0 AS MATERIALIZED (SELECT vid, 1.0/(SELECT c FROM ns) AS rank FROM s)",
    ]
    for i in range(iters):
        parts.append(
            f"d{i} AS (SELECT COALESCE(SUM(rank), 0) AS dang FROM r{i} r "
            f"LEFT JOIN deg USING (vid) WHERE deg.outw IS NULL)"
        )
        parts.append(
            f"r{i+1} AS MATERIALIZED (SELECT COALESCE(c.vid, s2.vid) AS vid, "
            f"CASE WHEN s2.vid IS NOT NULL THEN (1-{d})/(SELECT c FROM ns) "
            f"+ {d} * (SELECT dang FROM d{i})/(SELECT c FROM ns) ELSE 0 END "
            f"+ COALESCE(c.contrib, 0) AS rank "
            f"FROM (SELECT e.dst AS vid, SUM({d} * r.rank / deg.outw * e.w) AS contrib "
            f"FROM e JOIN r{i} r ON e.src = r.vid JOIN deg ON deg.vid = e.src "
            f"GROUP BY e.dst) c FULL JOIN s s2 ON s2.vid = c.vid)"
        )
    return ",\n".join(parts) + f"\nSELECT vid, ROUND(rank, 8) AS rank FROM r{iters}"


def _spam_mass_sql() -> str:
    """DuckDB mirror of graph.trust.spam_mass (3 iterations): the
    _pagerank5_sql dense chain (p*) and the _ppr5_sql sparse chain (t*)
    with seeds = 5 top-in-degree vids, joined on vid; spam_mass =
    (pr - tr)/pr with tr COALESCEd to 0 outside the trust walk's
    reachable set."""
    d, iters = 0.85, 3
    parts = [
        f"WITH e AS MATERIALIZED ({_E_SQL})",
        f"verts AS MATERIALIZED ({_VERTS_SQL})",
        "deg AS MATERIALIZED (SELECT src AS vid, COUNT(*) AS outdeg FROM e GROUP BY src)",
        "n AS (SELECT COUNT(*) AS c FROM verts)",
        "p0 AS MATERIALIZED (SELECT vid, 1.0/(SELECT c FROM n) AS rank FROM verts)",
        "s AS MATERIALIZED (SELECT dst AS vid FROM e GROUP BY dst "
        "ORDER BY COUNT(*) DESC, dst LIMIT 5)",
        "ns AS (SELECT COUNT(*) AS c FROM s)",
        "t0 AS MATERIALIZED (SELECT vid, 1.0/(SELECT c FROM ns) AS rank FROM s)",
    ]
    for i in range(iters):
        parts.append(
            f"dp{i} AS (SELECT COALESCE(SUM(rank), 0) AS dang FROM p{i} r "
            f"LEFT JOIN deg USING (vid) WHERE deg.outdeg IS NULL)")
        parts.append(
            f"p{i+1} AS MATERIALIZED (SELECT v.vid, (1-{d})/(SELECT c FROM n) + {d} * ("
            f"COALESCE(c.contrib, 0) + (SELECT dang FROM dp{i})/(SELECT c FROM n)) AS rank "
            f"FROM verts v LEFT JOIN (SELECT e.dst AS vid, SUM(r.rank / deg.outdeg) AS contrib "
            f"FROM e JOIN p{i} r ON e.src = r.vid JOIN deg ON deg.vid = e.src "
            f"GROUP BY e.dst) c ON v.vid = c.vid)")
        parts.append(
            f"dt{i} AS (SELECT COALESCE(SUM(rank), 0) AS dang FROM t{i} r "
            f"LEFT JOIN deg USING (vid) WHERE deg.outdeg IS NULL)")
        parts.append(
            f"t{i+1} AS MATERIALIZED (SELECT COALESCE(c.vid, s2.vid) AS vid, "
            f"CASE WHEN s2.vid IS NOT NULL THEN (1-{d})/(SELECT c FROM ns) "
            f"+ {d} * (SELECT dang FROM dt{i})/(SELECT c FROM ns) ELSE 0 END "
            f"+ {d} * COALESCE(c.contrib, 0) AS rank "
            f"FROM (SELECT e.dst AS vid, SUM(r.rank / deg.outdeg) AS contrib "
            f"FROM e JOIN t{i} r ON e.src = r.vid JOIN deg ON deg.vid = e.src "
            f"GROUP BY e.dst) c FULL JOIN s s2 ON s2.vid = c.vid)")
    return (",\n".join(parts) +
            f"""
SELECT p.vid, ROUND(p.rank, 8) AS pr, ROUND(COALESCE(t.rank, 0), 8) AS tr,
       ROUND(CASE WHEN p.rank > 0
                  THEN (p.rank - COALESCE(t.rank, 0)) / p.rank
                  ELSE 0.0 END, 8) AS spam_mass
FROM p{iters} p LEFT JOIN t{iters} t USING (vid)""")


def _cc_sql() -> str:
    return f"""
WITH RECURSIVE und AS ({_UND_SQL}),
verts AS ({_VERTS_SQL}),
r(vid, label) AS (
  SELECT vid, vid FROM verts
  UNION
  SELECT und.dst, r.label FROM r JOIN und ON und.src = r.vid WHERE r.label < und.dst
)
SELECT vid, MIN(label) AS component FROM r GROUP BY vid
"""


_SCC_CORE_SQL = f"""e AS ({_E_SQL}),
verts AS ({_VERTS_SQL}),
reach(src, dst) AS (
  SELECT DISTINCT src, dst FROM e
  UNION
  SELECT DISTINCT r.src, e.dst FROM reach r JOIN e ON e.src = r.dst
),
scc AS (
  SELECT v.vid, GREATEST(v.vid, COALESCE(MAX(m.v), v.vid)) AS scc_id
  FROM verts v LEFT JOIN (
    SELECT a.src AS u, a.dst AS v FROM reach a
    JOIN reach b ON a.src = b.dst AND a.dst = b.src
  ) m ON m.u = v.vid
  GROUP BY v.vid
)"""


def _scc_sql() -> str:
    """scc_id = max vid of the mutual-reachability class (matches the
    coloring algorithm's root choice — see graph/scc.py docstring)."""
    return f"WITH RECURSIVE {_SCC_CORE_SQL}\nSELECT vid, scc_id FROM scc"


def _bowtie_sql() -> str:
    """Largest SCC (ties: smaller scc_id) is the core; in = reaches the
    core, out = reached from the core, other = the rest."""
    return f"""
WITH RECURSIVE {_SCC_CORE_SQL},
core AS (
  SELECT scc_id FROM scc GROUP BY scc_id
  ORDER BY COUNT(*) DESC, scc_id ASC LIMIT 1
),
cv AS (SELECT vid FROM scc WHERE scc_id = (SELECT scc_id FROM core))
SELECT s.vid,
  CASE
    WHEN s.vid IN (SELECT vid FROM cv) THEN 'core'
    WHEN EXISTS (SELECT 1 FROM reach r JOIN cv ON r.dst = cv.vid
                 WHERE r.src = s.vid) THEN 'in'
    WHEN EXISTS (SELECT 1 FROM reach r JOIN cv ON r.src = cv.vid
                 WHERE r.dst = s.vid) THEN 'out'
    ELSE 'other'
  END AS cls
FROM scc s
"""


def _lpa3_cte() -> str:
    parts = [f"WITH und AS MATERIALIZED ({_UND_SQL})", f"verts AS ({_VERTS_SQL})",
             "l0 AS MATERIALIZED (SELECT vid, vid AS label FROM verts)"]
    for i in range(3):
        parts.append(
            f"c{i} AS (SELECT und.dst AS vid, l.label, COUNT(*) AS cnt "
            f"FROM und JOIN l{i} l ON und.src = l.vid GROUP BY und.dst, l.label)"
        )
        parts.append(
            f"b{i} AS (SELECT vid, label FROM (SELECT vid, label, ROW_NUMBER() OVER "
            f"(PARTITION BY vid ORDER BY cnt DESC, label ASC) AS rn FROM c{i}) WHERE rn = 1)"
        )
        parts.append(
            f"l{i+1} AS MATERIALIZED (SELECT l.vid, COALESCE(b.label, l.label) AS label "
            f"FROM l{i} l LEFT JOIN b{i} b USING (vid))"
        )
    return ",\n".join(parts)


def _lpa3_sql() -> str:
    return _lpa3_cte() + "\nSELECT vid, label FROM l3"


def _lpa3_weighted_parts() -> list[str]:
    """Shared CTE chain for the weighted-LPA oracles: neighbor labels
    vote with the summed (both directions + parallel rows) l_quantity
    edge weight; final labeling is l3."""
    ew = ("SELECT l_partkey AS src, l_suppkey AS dst, "
          "CAST(l_quantity AS DOUBLE) AS w FROM lineitem "
          "WHERE l_partkey <> l_suppkey "
          "AND l_partkey IS NOT NULL AND l_suppkey IS NOT NULL")
    parts = [f"WITH ew0 AS ({ew})",
             "undw AS MATERIALIZED (SELECT src, dst, SUM(w) AS w FROM "
             "(SELECT src, dst, w FROM ew0 "
             "UNION ALL SELECT dst, src, w FROM ew0) GROUP BY src, dst)",
             "verts AS (SELECT DISTINCT src AS vid FROM undw)",
             "l0 AS MATERIALIZED (SELECT vid, vid AS label FROM verts)"]
    for i in range(3):
        parts.append(
            f"c{i} AS (SELECT u.dst AS vid, l.label, SUM(u.w) AS cnt "
            f"FROM undw u JOIN l{i} l ON u.src = l.vid GROUP BY u.dst, l.label)")
        parts.append(
            f"b{i} AS (SELECT vid, label FROM (SELECT vid, label, ROW_NUMBER() OVER "
            f"(PARTITION BY vid ORDER BY cnt DESC, label ASC) AS rn FROM c{i}) WHERE rn = 1)")
        parts.append(
            f"l{i+1} AS MATERIALIZED (SELECT l.vid, COALESCE(b.label, l.label) AS label "
            f"FROM l{i} l LEFT JOIN b{i} b USING (vid))")
    return parts


def _lpa3_weighted_sql() -> str:
    return ",\n".join(_lpa3_weighted_parts()) + "\nSELECT vid, label FROM l3"


def _weighted_modularity_sql() -> str:
    """Weighted-LPA labeling composed with the weighted Newman
    modularity aggregation: Q_w = Σ_c [W_c/W − (S_c/2W)²] over the
    canonical undirected weighted graph with BIGINT weights."""
    chain = ",\n".join(_lpa3_weighted_parts())
    return f"""{chain},
wew AS (SELECT LEAST(l_partkey, l_suppkey) AS a,
               GREATEST(l_partkey, l_suppkey) AS b,
               SUM(CAST(l_quantity AS BIGINT)) AS w
        FROM lineitem WHERE l_partkey <> l_suppkey GROUP BY 1, 2),
lab AS (SELECT vid, label AS c FROM l3),
st AS (SELECT vid, SUM(w) AS s FROM
       (SELECT a AS vid, w FROM wew UNION ALL SELECT b, w FROM wew)
       GROUP BY vid),
sc AS (SELECT l.c, SUM(st.s) AS sc FROM st JOIN lab l ON l.vid = st.vid
       GROUP BY l.c),
wc AS (SELECT la.c AS c, SUM(wew.w) AS wc FROM wew
       JOIN lab la ON la.vid = wew.a JOIN lab lb ON lb.vid = wew.b
       WHERE la.c = lb.c GROUP BY la.c),
tw AS (SELECT SUM(w) AS tw FROM wew)
SELECT CAST((SELECT tw FROM tw) AS BIGINT) AS total_weight,
       COUNT(*) AS n_communities,
       CAST(4 * (SELECT tw FROM tw) * SUM(COALESCE(w2.wc, 0))
            - SUM(s2.sc::DECIMAL(38,0) * s2.sc::DECIMAL(38,0))
            AS BIGINT) AS q_num,
       CAST(4 * (SELECT tw FROM tw) * (SELECT tw FROM tw)
            AS BIGINT) AS q_den
FROM sc s2 LEFT JOIN wc w2 ON w2.c = s2.c
"""


def _ktruss_sql(k: int = 4, rounds: int = 2) -> str:
    """Unrolled k-truss peel: per round, per-edge support = common
    neighbors of the endpoints in the current subgraph, keep support
    >= k-2."""
    need = k - 2
    parts = [f"WITH e AS ({_E_SQL})",
             "c0 AS (SELECT DISTINCT LEAST(src, dst) AS a, "
             "GREATEST(src, dst) AS b FROM e)"]
    for i in range(rounds):
        parts.append(f"u{i} AS (SELECT a AS u, b AS v FROM c{i} "
                     f"UNION ALL SELECT b, a FROM c{i})")
        parts.append(f"s{i} AS (SELECT c.a, c.b, COUNT(*) AS s FROM c{i} c "
                     f"JOIN u{i} n1 ON n1.u = c.a "
                     f"JOIN u{i} n2 ON n2.u = c.b AND n2.v = n1.v "
                     f"GROUP BY c.a, c.b)")
        parts.append(f"c{i + 1} AS (SELECT c.a, c.b FROM c{i} c JOIN s{i} s "
                     f"ON s.a = c.a AND s.b = c.b AND s.s >= {need})")
    return ",\n".join(parts) + f"\nSELECT a AS src, b AS dst FROM c{rounds}"


def _harmonic_sql(max_hops: int = 3) -> str:
    return f"""
WITH RECURSIVE e AS ({_E_SQL}),
verts AS ({_VERTS_SQL}),
s0 AS (SELECT DISTINCT vid FROM verts ORDER BY vid LIMIT 3),
walk(seed, vid, dist) AS (
    SELECT vid, vid, 0 FROM s0
    UNION ALL
    SELECT w.seed, e.dst, w.dist + 1 FROM walk w
    JOIN e ON e.src = w.vid WHERE w.dist < {max_hops}
),
d AS (SELECT seed, vid, MIN(dist) AS dist FROM walk GROUP BY seed, vid),
ph AS (SELECT seed, dist, COUNT(*) AS cnt FROM d WHERE dist > 0
       GROUP BY seed, dist),
agg AS (SELECT seed, ROUND(SUM(cnt * 1.0 / dist), 8) AS centrality
        FROM ph GROUP BY seed)
SELECT s0.vid AS seed, COALESCE(a.centrality, 0.0) AS centrality
FROM s0 LEFT JOIN agg a ON a.seed = s0.vid
"""


def _weighted_closeness_sql(max_rounds: int = 3) -> str:
    """DuckDB mirror of weighted_closeness_centrality: per-seed bounded
    MIN(path-sum) distances, r / Σdist — exact compare."""
    return f"""
WITH RECURSIVE ew AS (
    SELECT l_partkey AS src, l_suppkey AS dst,
           MIN(CAST(l_quantity AS DOUBLE)) AS w
    FROM lineitem GROUP BY 1, 2),
verts AS (SELECT DISTINCT vid FROM
          (SELECT src AS vid FROM ew UNION ALL SELECT dst AS vid FROM ew)),
s0 AS (SELECT vid FROM verts ORDER BY vid LIMIT 3),
walk(seed, vid, dist, hops) AS (
    SELECT vid, vid, CAST(0.0 AS DOUBLE), 0 FROM s0
    UNION ALL
    SELECT w2.seed, ew.dst, w2.dist + ew.w, w2.hops + 1 FROM walk w2
    JOIN ew ON ew.src = w2.vid WHERE w2.hops < {max_rounds}
),
d AS (SELECT seed, vid, MIN(dist) AS dist FROM walk GROUP BY 1, 2),
agg AS (SELECT seed, COUNT(*) AS n_reachable, SUM(dist) AS dsum
        FROM d WHERE dist > 0 GROUP BY seed)
SELECT s0.vid AS seed,
       COALESCE(a.n_reachable, 0) AS n_reachable,
       COALESCE(a.n_reachable / a.dsum, 0.0) AS closeness
FROM s0 LEFT JOIN agg a ON a.seed = s0.vid
"""


def _weighted_betweenness_sql(max_rounds: int = 3) -> str:
    """DuckDB mirror of weighted_betweenness_from_seeds: per-seed
    MIN(path-sum) distances, the exact-equality SP DAG, sigma/delta
    fixpoints unrolled max_rounds times each, 6dp-rounded sums."""
    r = max_rounds
    parts = [
        "WITH RECURSIVE ew AS (SELECT l_partkey AS src, l_suppkey AS dst, "
        "MIN(CAST(l_quantity AS DOUBLE)) AS w FROM lineitem GROUP BY 1, 2)",
        # NOTE: a bare `a UNION b` CTE misbehaves under WITH RECURSIVE in
        # DuckDB (duplicates survive); dedup explicitly.
        "verts AS (SELECT DISTINCT vid FROM "
        "(SELECT src AS vid FROM ew UNION ALL SELECT dst AS vid FROM ew))",
        "s0 AS (SELECT vid FROM verts ORDER BY vid LIMIT 3)",
        f"walk(seed, vid, dist, hops) AS ("
        f"SELECT vid, vid, CAST(0.0 AS DOUBLE), 0 FROM s0 "
        f"UNION ALL SELECT w2.seed, ew.dst, w2.dist + ew.w, w2.hops + 1 "
        f"FROM walk w2 JOIN ew ON ew.src = w2.vid WHERE w2.hops < {r})",
        "d AS MATERIALIZED (SELECT seed, vid, MIN(dist) AS dist FROM walk "
        "GROUP BY 1, 2)",
        "dag AS MATERIALIZED (SELECT du.seed, du.vid AS u, ew.dst AS v "
        "FROM d du JOIN ew ON ew.src = du.vid "
        "JOIN d dv ON dv.seed = du.seed AND dv.vid = ew.dst "
        "WHERE ew.w > 0 AND du.dist + ew.w = dv.dist)",
        "sig0 AS (SELECT vid AS seed, vid, CAST(1 AS BIGINT) AS sigma FROM s0)",
    ]
    for k in range(r):
        parts.append(
            f"sig{k+1} AS MATERIALIZED ("
            f"SELECT vid AS seed, vid, CAST(1 AS BIGINT) AS sigma FROM s0 "
            f"UNION ALL "
            f"SELECT g.seed, g.v AS vid, SUM(s.sigma) AS sigma "
            f"FROM dag g JOIN sig{k} s ON g.seed = s.seed AND g.u = s.vid "
            f"GROUP BY 1, 2)")
    parts.append(
        f"del0 AS (SELECT seed, vid, CAST(0.0 AS DOUBLE) AS delta "
        f"FROM sig{r})")
    for k in range(r):
        parts.append(
            f"del{k+1} AS MATERIALIZED ("
            f"SELECT s.seed, s.vid, s.sigma * rs.rsum AS delta "
            f"FROM sig{r} s JOIN ("
            f"SELECT g.seed, g.u AS vid, "
            f"SUM((1.0 + COALESCE(dl.delta, 0.0)) / sv.sigma) AS rsum "
            f"FROM dag g JOIN sig{r} sv ON g.seed = sv.seed AND g.v = sv.vid "
            f"LEFT JOIN del{k} dl ON g.seed = dl.seed AND g.v = dl.vid "
            f"GROUP BY 1, 2) rs ON s.seed = rs.seed AND s.vid = rs.vid)")
    parts.append(
        f"b AS (SELECT vid, ROUND(SUM(delta), 6) AS betweenness "
        f"FROM del{r} WHERE vid <> seed GROUP BY vid)")
    return ",\n".join(parts) + (
        "\nSELECT verts.vid, COALESCE(b.betweenness, 0.0) AS betweenness "
        "FROM verts LEFT JOIN b ON verts.vid = b.vid")


def _weighted_harmonic_sql(max_rounds: int = 3) -> str:
    """DuckDB mirror of weighted_harmonic_centrality: per-seed bounded
    path walk + MIN(sum) distances, Σ 1/dist rounded to 6dp."""
    return f"""
WITH RECURSIVE ew AS (
    SELECT l_partkey AS src, l_suppkey AS dst,
           MIN(CAST(l_quantity AS DOUBLE)) AS w
    FROM lineitem GROUP BY 1, 2),
verts AS (SELECT src AS vid FROM ew UNION SELECT dst FROM ew),
s0 AS (SELECT DISTINCT vid FROM verts ORDER BY vid LIMIT 3),
walk(seed, vid, dist, hops) AS (
    SELECT vid, vid, CAST(0.0 AS DOUBLE), 0 FROM s0
    UNION ALL
    SELECT w2.seed, ew.dst, w2.dist + ew.w, w2.hops + 1 FROM walk w2
    JOIN ew ON ew.src = w2.vid WHERE w2.hops < {max_rounds}
),
d AS (SELECT seed, vid, MIN(dist) AS dist FROM walk GROUP BY 1, 2),
agg AS (SELECT seed, COUNT(*) AS n_reachable,
               ROUND(SUM(1.0 / dist), 6) AS harmonic
        FROM d WHERE dist > 0 GROUP BY seed)
SELECT s0.vid AS seed,
       COALESCE(a.n_reachable, 0) AS n_reachable,
       COALESCE(a.harmonic, 0.0) AS harmonic
FROM s0 LEFT JOIN agg a ON a.seed = s0.vid
"""


def _weighted_sssp_sql(max_rounds: int = 3) -> str:
    return f"""
WITH RECURSIVE ew AS (
    SELECT l_partkey AS src, l_suppkey AS dst,
           MIN(CAST(l_quantity AS DOUBLE)) AS w
    FROM lineitem GROUP BY 1, 2),
verts AS (SELECT src AS vid FROM ew UNION SELECT dst FROM ew),
s0 AS (SELECT DISTINCT vid FROM verts ORDER BY vid LIMIT 3),
walk(vid, dist, hops) AS (
    SELECT vid, CAST(0.0 AS DOUBLE), 0 FROM s0
    UNION ALL
    SELECT ew.dst, w2.dist + ew.w, w2.hops + 1 FROM walk w2
    JOIN ew ON ew.src = w2.vid WHERE w2.hops < {max_rounds}
)
SELECT vid, ROUND(MIN(dist), 8) AS dist FROM walk GROUP BY vid
"""


def _closeness_sql(max_hops: int = 3) -> str:
    return f"""
WITH RECURSIVE e AS ({_E_SQL}),
verts AS ({_VERTS_SQL}),
s0 AS (SELECT DISTINCT vid FROM verts ORDER BY vid LIMIT 3),
walk(seed, vid, dist) AS (
    SELECT vid, vid, 0 FROM s0
    UNION ALL
    SELECT w.seed, e.dst, w.dist + 1 FROM walk w
    JOIN e ON e.src = w.vid WHERE w.dist < {max_hops}
),
d AS (SELECT seed, vid, MIN(dist) AS dist FROM walk GROUP BY seed, vid),
agg AS (SELECT seed, COUNT(*) AS n_reachable,
               CAST(SUM(dist) AS BIGINT) AS sum_dist
        FROM d WHERE dist > 0 GROUP BY seed)
SELECT s0.vid AS seed,
       COALESCE(a.n_reachable, 0) AS n_reachable,
       COALESCE(a.sum_dist, 0) AS sum_dist,
       CASE WHEN COALESCE(a.sum_dist, 0) > 0
            THEN ROUND(a.n_reachable * 1.0 / a.sum_dist, 8)
            ELSE 0.0 END AS closeness
FROM s0 LEFT JOIN agg a ON a.seed = s0.vid
"""


def _eccentricity_sql(max_hops: int = 3) -> str:
    return f"""
WITH RECURSIVE e AS ({_E_SQL}),
verts AS ({_VERTS_SQL}),
s0 AS (SELECT DISTINCT vid FROM verts ORDER BY vid LIMIT 3),
walk(seed, vid, dist) AS (
    SELECT vid, vid, 0 FROM s0
    UNION ALL
    SELECT w.seed, e.dst, w.dist + 1 FROM walk w
    JOIN e ON e.src = w.vid WHERE w.dist < {max_hops}
),
d AS (SELECT seed, vid, MIN(dist) AS dist FROM walk GROUP BY seed, vid),
agg AS (SELECT seed, COUNT(*) AS n_reachable,
               CAST(MAX(dist) AS INTEGER) AS ecc
        FROM d WHERE dist > 0 GROUP BY seed)
SELECT s0.vid AS seed,
       COALESCE(a.n_reachable, 0) AS n_reachable,
       COALESCE(a.ecc, 0) AS ecc
FROM s0 LEFT JOIN agg a ON a.seed = s0.vid
"""


def _katz_sql(alpha: float = 0.05, beta: float = 1.0,
              iters: int = 3) -> str:
    """Jacobi Katz recurrence unrolled (pagerank_5iter pattern):
    x0 = beta, x_{k+1} = beta + alpha * SUM incoming x_k."""
    parts = [
        f"WITH e AS MATERIALIZED ({_E_SQL})",
        f"verts AS MATERIALIZED ({_VERTS_SQL})",
        f"x0 AS MATERIALIZED (SELECT vid, CAST({beta} AS DOUBLE) AS x "
        f"FROM verts)",
    ]
    for i in range(iters):
        parts.append(
            f"x{i+1} AS MATERIALIZED (SELECT v.vid, "
            f"CAST({beta} AS DOUBLE) + CAST({alpha} AS DOUBLE) "
            f"* COALESCE(c.s, CAST(0 AS DOUBLE)) AS x "
            f"FROM verts v LEFT JOIN (SELECT e.dst AS vid, SUM(x.x) AS s "
            f"FROM e JOIN x{i} x ON e.src = x.vid GROUP BY e.dst) c "
            f"ON v.vid = c.vid)"
        )
    return ",\n".join(parts) + \
        f"\nSELECT vid, ROUND(x, 8) AS katz FROM x{iters}"


_STRATIFIED_SQL = """
WITH r AS (SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY lang
           ORDER BY md5(doc_id || '|' || '42')) AS rn FROM documents)
SELECT doc_id, lang FROM r WHERE rn <= 5
"""

_HASH_SPLIT_SQL = """
WITH f AS (SELECT doc_id,
    CAST(CAST(('0x' || substr(md5(doc_id || '|' || '7'), 1, 15))
         AS UBIGINT) AS DOUBLE) / 1152921504606846976.0 AS frac
    FROM documents)
SELECT doc_id, CASE WHEN frac < 0.8 THEN 'train'
                    WHEN frac < 0.9 THEN 'val'
                    ELSE 'test' END AS split
FROM f
"""


def _curated_corpus_sql() -> str:
    """dedup_canonical's CTE chain as a subquery, keep-canonical filter,
    hash_split's hex-fraction CASE, integer per-(split, lang) rollup."""
    return f"""
WITH canon AS (SELECT doc_id FROM ({_dedup_canonical_sql()}) t
               WHERE is_canonical),
k AS (SELECT d.doc_id, d.lang, d.n_chars FROM documents d
      JOIN canon c ON c.doc_id = d.doc_id),
f AS (SELECT lang, n_chars,
    CAST(CAST(('0x' || substr(md5(doc_id || '|' || '7'), 1, 15))
         AS UBIGINT) AS DOUBLE) / 1152921504606846976.0 AS frac
    FROM k)
SELECT CASE WHEN frac < 0.8 THEN 'train'
            WHEN frac < 0.9 THEN 'val'
            ELSE 'test' END AS split,
       lang, COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM f GROUP BY 1, 2
"""


_TRANSITIVITY_SQL = f"""
WITH cnd AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
             FROM ({_E_SQL})),
tri AS (SELECT COUNT(*) AS t FROM cnd e1
        JOIN cnd e2 ON e1.a = e2.a AND e1.b < e2.b
        JOIN cnd e3 ON e3.a = e1.b AND e3.b = e2.b),
deg AS (SELECT vid, COUNT(*) AS deg FROM
        (SELECT a AS vid FROM cnd UNION ALL SELECT b FROM cnd)
        GROUP BY vid),
w AS (SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges FROM deg)
SELECT CAST(tri.t AS BIGINT) AS n_triangles, w.n_wedges,
       CASE WHEN w.n_wedges > 0
            THEN ROUND(3.0 * tri.t / w.n_wedges, 8)
            ELSE 0.0 END AS transitivity
FROM tri, w
"""

_TAIL_ALPHA_SQL = f"""
WITH deg AS (SELECT vid, COUNT(*) AS deg FROM
    (SELECT src AS vid FROM ({_E_SQL}) UNION ALL
     SELECT dst FROM ({_E_SQL})) GROUP BY vid),
t AS (SELECT COUNT(*) AS n_tail,
             SUM(LN(deg / 10.0)) AS logsum
      FROM deg WHERE deg >= 10)
SELECT n_tail,
       CASE WHEN n_tail > 0 AND logsum > 0
            THEN ROUND(1.0 + n_tail / logsum, 8)
            ELSE 0.0 END AS alpha
FROM t
"""


def _modularity_sql() -> str:
    """lpa_3iter labeling composed with the closed-form Newman
    modularity aggregation over the canonical undirected simple graph."""
    return f"""{_lpa3_cte()},
cnd AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM ({_E_SQL})),
deg AS (SELECT vid, COUNT(*) AS deg FROM
        (SELECT a AS vid FROM cnd UNION ALL SELECT b FROM cnd)
        GROUP BY vid),
lab AS (SELECT vid, label AS c FROM l3),
dc AS (SELECT l.c, SUM(d.deg) AS dc FROM deg d JOIN lab l ON l.vid = d.vid
       GROUP BY l.c),
ec AS (SELECT la.c AS c, COUNT(*) AS ec FROM cnd
       JOIN lab la ON la.vid = cnd.a JOIN lab lb ON lb.vid = cnd.b
       WHERE la.c = lb.c GROUP BY la.c),
m AS (SELECT COUNT(*) AS m FROM cnd)
SELECT (SELECT m FROM m) AS n_edges,
       COUNT(*) AS n_communities,
       ROUND(SUM(COALESCE(e2.ec, 0) * 1.0 / (SELECT m FROM m)
                 - (d2.dc * d2.dc * 1.0)
                   / (4.0 * (SELECT m FROM m) * (SELECT m FROM m))),
             8) AS modularity
FROM dc d2 LEFT JOIN ec e2 ON e2.c = d2.c
"""


def q_community_conductance(spark, sf_dir):
    """Per-community conductance of the LPA-3-iteration labeling —
    cut / min(vol, 2m−vol) with exact integer counters."""
    from credigraph_spark.analytics import community_conductance
    from credigraph_spark.graph import label_propagation

    edges = _edges(spark, sf_dir)
    labels, _ = label_propagation(edges, max_iter=3)
    return community_conductance(edges, labels, label_col="label")


def _conductance_sql() -> str:
    """lpa_3iter labeling composed with the per-community conductance
    aggregation (volume / cut / min-side denominator) over the
    canonical undirected simple graph."""
    return f"""{_lpa3_cte()},
cnd AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM ({_E_SQL})),
deg AS (SELECT vid, COUNT(*) AS deg FROM
        (SELECT a AS vid FROM cnd UNION ALL SELECT b FROM cnd)
        GROUP BY vid),
lab AS (SELECT vid, label AS c FROM l3),
pc AS (SELECT l.c, CAST(COUNT(*) AS BIGINT) AS n_members,
              CAST(SUM(d.deg) AS BIGINT) AS volume
       FROM deg d JOIN lab l ON l.vid = d.vid GROUP BY l.c),
x AS (SELECT la.c AS ca, lb.c AS cb FROM cnd
      JOIN lab la ON la.vid = cnd.a JOIN lab lb ON lb.vid = cnd.b
      WHERE la.c <> lb.c),
cut AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS cut_edges FROM
        (SELECT ca AS c FROM x UNION ALL SELECT cb FROM x) GROUP BY c),
m AS (SELECT COUNT(*) AS m FROM cnd)
SELECT pc.c AS community, pc.n_members, pc.volume,
       COALESCE(cut.cut_edges, 0) AS cut_edges,
       CASE WHEN LEAST(pc.volume, 2 * (SELECT m FROM m) - pc.volume) > 0
            THEN ROUND(COALESCE(cut.cut_edges, 0) * 1.0
                       / LEAST(pc.volume,
                               2 * (SELECT m FROM m) - pc.volume), 8)
            ELSE 0.0 END AS conductance
FROM pc LEFT JOIN cut ON cut.c = pc.c
"""


def _weighted_clustering_sql() -> str:
    """DuckDB mirror of weighted_clustering_coefficient: canonical a<b
    weighted edges, x<y<z triangle enumeration, (w1+w2)/2 corner
    credits, c = csum / (s·(k−1)) — all exact, no rounding."""
    return """
        WITH ew AS MATERIALIZED (
          SELECT LEAST(l_partkey, l_suppkey) AS a,
                 GREATEST(l_partkey, l_suppkey) AS b,
                 SUM(CAST(l_quantity AS BIGINT)) AS w
          FROM lineitem WHERE l_partkey <> l_suppkey GROUP BY 1, 2),
        deg AS MATERIALIZED (
          SELECT vid, COUNT(*) AS k, SUM(w) AS s FROM
          (SELECT a AS vid, w FROM ew UNION ALL SELECT b, w FROM ew)
          GROUP BY vid),
        tris AS (
          SELECT e1.a AS x, e1.b AS y, e2.b AS z,
                 e1.w AS wxy, e2.w AS wxz, e3.w AS wyz
          FROM ew e1 JOIN ew e2 ON e1.a = e2.a AND e1.b < e2.b
          JOIN ew e3 ON e3.a = e1.b AND e3.b = e2.b),
        credits AS (
          SELECT x AS vid, (wxy + wxz) / 2.0 AS c FROM tris
          UNION ALL SELECT y, (wxy + wyz) / 2.0 FROM tris
          UNION ALL SELECT z, (wxz + wyz) / 2.0 FROM tris),
        cs AS (SELECT vid, SUM(c) AS csum FROM credits GROUP BY vid)
        SELECT d.vid,
               CASE WHEN d.k >= 2
                    THEN COALESCE(cs.csum, 0.0) / (d.s * (d.k - 1))
                    ELSE 0.0 END AS weighted_lcc
        FROM deg d LEFT JOIN cs ON cs.vid = d.vid"""


def _louvain_modularity_sql(rounds: int = 2) -> str:
    """Louvain phase-1 chain composed with the closed-form Newman
    modularity aggregation (the _modularity_sql tail)."""
    chain = ",\n".join(_louvain_parts(rounds))
    return f"""{chain},
cnd AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM ({_E_SQL})),
mdeg AS (SELECT vid, COUNT(*) AS deg FROM
         (SELECT a AS vid FROM cnd UNION ALL SELECT b FROM cnd)
         GROUP BY vid),
lab AS (SELECT vid, community AS c FROM s{rounds}),
dc AS (SELECT l.c, SUM(d.deg) AS dc FROM mdeg d JOIN lab l ON l.vid = d.vid
       GROUP BY l.c),
ec AS (SELECT la.c AS c, COUNT(*) AS ec FROM cnd
       JOIN lab la ON la.vid = cnd.a JOIN lab lb ON lb.vid = cnd.b
       WHERE la.c = lb.c GROUP BY la.c),
m AS (SELECT COUNT(*) AS m FROM cnd)
SELECT (SELECT m FROM m) AS n_edges,
       COUNT(*) AS n_communities,
       ROUND(SUM(COALESCE(e2.ec, 0) * 1.0 / (SELECT m FROM m)
                 - (d2.dc * d2.dc * 1.0)
                   / (4.0 * (SELECT m FROM m) * (SELECT m FROM m))),
             8) AS modularity
FROM dc d2 LEFT JOIN ec e2 ON e2.c = d2.c
"""


def _betweenness_sql(max_hops: int = 3) -> str:
    """Brandes unrolled: forward levels l1..lH with σ sums (per-seed
    anti-membership via NOT EXISTS over the seen union), backward δ
    frames dH-1..d1, B = Σ δ over interior vertices."""
    parts = [f"WITH e AS ({_E_SQL})", f"verts AS ({_VERTS_SQL})",
             "sd AS (SELECT DISTINCT vid FROM verts ORDER BY vid LIMIT 3)",
             "l0 AS (SELECT vid AS seed, vid, CAST(1 AS BIGINT) AS sigma FROM sd)",
             "seen0 AS (SELECT seed, vid FROM l0)"]
    for h in range(1, max_hops + 1):
        parts.append(
            f"l{h} AS (SELECT l.seed, e.dst AS vid, SUM(l.sigma) AS sigma "
            f"FROM l{h - 1} l JOIN e ON e.src = l.vid "
            f"WHERE NOT EXISTS (SELECT 1 FROM seen{h - 1} x "
            f"WHERE x.seed = l.seed AND x.vid = e.dst) "
            f"GROUP BY l.seed, e.dst)")
        parts.append(
            f"seen{h} AS (SELECT seed, vid FROM seen{h - 1} "
            f"UNION ALL SELECT seed, vid FROM l{h})")
    # backward: delta for level H is 0; build d{h} for h = H-1 .. 1
    for h in range(max_hops - 1, 0, -1):
        if h == max_hops - 1:
            ratio = f"(1.0 + 0.0) / w.sigma"
            djoin = ""
        else:
            ratio = "(1.0 + COALESCE(d.delta, 0.0)) / w.sigma"
            djoin = (f"LEFT JOIN d{h + 1} d ON d.seed = w.seed "
                     f"AND d.vid = w.vid ")
        parts.append(
            f"d{h} AS (SELECT l.seed, l.vid, l.sigma * SUM({ratio}) AS delta "
            f"FROM l{h} l JOIN e ON e.src = l.vid "
            f"JOIN l{h + 1} w ON w.seed = l.seed AND w.vid = e.dst "
            f"{djoin}"
            f"GROUP BY l.seed, l.vid, l.sigma)")
    unions = " UNION ALL ".join(
        f"SELECT seed, vid, delta FROM d{h}"
        for h in range(1, max_hops))
    parts.append(f"alld AS ({unions})")
    parts.append("b AS (SELECT vid, ROUND(SUM(delta), 8) AS betweenness "
                 "FROM alld WHERE vid <> seed GROUP BY vid)")
    return (",\n".join(parts) +
            "\nSELECT v.vid, COALESCE(b.betweenness, 0.0) AS betweenness "
            "FROM verts v LEFT JOIN b USING (vid)")


def _walks_sql(walk_length: int = 4, walks_per_seed: int = 2,
               seed: int = 42) -> str:
    """Unrolled deterministic walks: step h picks the out-neighbor with
    the smallest md5(seed:start:widx:h:dst) via ROW_NUMBER."""
    parts = [
        f"WITH e AS ({_E_SQL})", f"verts AS ({_VERTS_SQL})",
        "sd AS (SELECT DISTINCT vid FROM verts ORDER BY vid LIMIT 3)",
        ("w0 AS (SELECT vid AS start, CAST(widx AS BIGINT) AS widx, "
         "vid, 0 AS step FROM sd, (SELECT unnest(generate_series(0, "
         f"{walks_per_seed - 1})) AS widx))"),
    ]
    for h in range(1, walk_length + 1):
        parts.append(
            f"w{h} AS (SELECT start, widx, dst AS vid, {h} AS step FROM ("
            f"SELECT w.start, w.widx, e.dst, ROW_NUMBER() OVER ("
            f"PARTITION BY w.start, w.widx ORDER BY md5('{seed}' || ':' || "
            f"w.start || ':' || w.widx || ':' || {h} || ':' || e.dst)) AS rn "
            f"FROM w{h - 1} w JOIN e ON e.src = w.vid) WHERE rn = 1)")
    unions = " UNION ALL ".join(
        f"SELECT start, widx, step, vid FROM w{h}"
        for h in range(walk_length + 1))
    return ",\n".join(parts) + "\n" + unions


def _node2vec_sql(walk_length: int = 3, walks_per_seed: int = 2,
                  seed: int = 42, inv_p: float = 2.0,
                  inv_q: float = 0.5) -> str:
    """Unrolled node2vec walks: per-step alpha classes (return / stay-near
    / explore), running alpha-sums in x order, the md5 hex-fraction target
    and the MIN(x) pick — every float op in the same order as the engine."""
    parts = [
        f"WITH e AS MATERIALIZED ({_E_SQL})", f"verts AS ({_VERTS_SQL})",
        "sd AS (SELECT DISTINCT vid FROM verts ORDER BY vid LIMIT 3)",
        ("n0 AS (SELECT vid AS start, CAST(widx AS BIGINT) AS widx, "
         "CAST(NULL AS BIGINT) AS prev, vid, 0 AS step FROM sd, "
         f"(SELECT unnest(generate_series(0, {walks_per_seed - 1})) AS widx))"),
    ]
    for h in range(1, walk_length + 1):
        parts.append(
            f"c{h} AS (SELECT w.start, w.widx, w.prev, w.vid AS v, "
            f"e.dst AS x FROM n{h - 1} w JOIN e ON e.src = w.vid)")
        parts.append(
            f"a{h} AS (SELECT *, CASE WHEN x = prev THEN {inv_p!r} "
            f"WHEN EXISTS (SELECT 1 FROM e t WHERE t.src = c.prev "
            f"AND t.dst = c.x) THEN 1.0 ELSE {inv_q!r} END AS alpha "
            f"FROM c{h} c)")
        parts.append(
            f"s{h} AS (SELECT *, SUM(alpha) OVER (PARTITION BY start, widx "
            f"ORDER BY x ROWS UNBOUNDED PRECEDING) AS cum FROM a{h})")
        parts.append(
            f"t{h} AS (SELECT *, MAX(cum) OVER (PARTITION BY start, widx) "
            f"AS tot, CAST(CAST(('0x' || substr(md5('{seed}' || ':' || "
            f"start || ':' || widx || ':' || {h}), 1, 15)) AS UBIGINT) "
            f"AS DOUBLE) / 1152921504606846976.0 AS frac FROM s{h})")
        parts.append(
            f"n{h} AS (SELECT start, widx, v AS prev, MIN(x) AS vid, "
            f"{h} AS step FROM t{h} WHERE cum >= frac * tot "
            f"GROUP BY start, widx, v)")
    unions = " UNION ALL ".join(
        f"SELECT start, widx, step, vid FROM n{h}"
        for h in range(walk_length + 1))
    return ",\n".join(parts) + "\n" + unions


def _anf_sql(max_hops: int = 3, num_registers: int = 4, seed: int = 7,
             cap: int = 40) -> str:
    """DuckDB mirror of graph/anf.py: identical md5-derived FM registers
    (first 8 hex chars -> trailing zeros -> 2^rho mask), BIT_OR
    supersteps over successors, per-hop exact-integer rho sums."""
    parts = [
        f"WITH e AS ({_E_SQL})", f"verts AS ({_VERTS_SQL})",
        f"regs AS (SELECT unnest(generate_series(0, {num_registers - 1})) AS reg)",
        ("m0 AS (SELECT vid, reg, CAST(POWER(2, LEAST("
         "CASE WHEN h = 0 THEN 32 ELSE CAST(ROUND(LOG2(h & -h)) AS BIGINT) END, "
         f"{cap})) AS BIGINT) AS mask FROM "
         f"(SELECT vid, reg, ('0x' || substr(md5('{seed}' || ':' || reg || "
         "':' || vid), 1, 8))::BIGINT AS h FROM verts, regs))"),
    ]
    for i in range(max_hops):
        parts.append(
            f"m{i + 1} AS (SELECT vid, reg, BIT_OR(mask) AS mask FROM ("
            f"SELECT vid, reg, mask FROM m{i} "
            f"UNION ALL SELECT e.src AS vid, m.reg, m.mask "
            f"FROM e JOIN m{i} m ON m.vid = e.dst) GROUP BY vid, reg)")
    sels = [
        (f"SELECT {h} AS hop, CAST(SUM(CAST(ROUND(LOG2((mask + 1) & "
         f"-(mask + 1))) AS BIGINT)) AS BIGINT) AS sum_rho FROM m{h}")
        for h in range(1, max_hops + 1)
    ]
    return ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(sels)


def _nhop2_sql() -> str:
    parts = [f"WITH e AS ({_E_SQL})", f"verts AS ({_VERTS_SQL})",
             "s0 AS (SELECT vid FROM verts ORDER BY vid LIMIT 3)"]
    for i in range(3):  # n_hop=2 -> 3 expansion rounds (reference semantics)
        parts.append(
            f"s{i+1} AS (SELECT vid FROM s{i} UNION "
            f"SELECT src FROM e WHERE src IN (SELECT vid FROM s{i}) "
            f"OR dst IN (SELECT vid FROM s{i}) UNION "
            f"SELECT dst FROM e WHERE src IN (SELECT vid FROM s{i}) "
            f"OR dst IN (SELECT vid FROM s{i}))"
        )
    return ",\n".join(parts) + "\nSELECT vid FROM s3"


def _minhash_sql(num_hashes: int = 4) -> str:
    mins = ", ".join(
        f"MIN(md5('salt{i}:' || sh)) AS mh_{i}" for i in range(num_hashes)
    )
    return (f"WITH {_SHINGLES_SQL},\n"
            "x AS (SELECT id, unnest(sh_set) AS sh FROM sets)\n"
            f"SELECT id AS doc_id, {mins} FROM x GROUP BY id")


def _lsh_pairs_sql() -> str:
    return (f"WITH {_SHINGLES_SQL},\n"
            "x AS (SELECT id, unnest(sh_set) AS sh FROM sets),\n"
            "sigs AS (SELECT id, MIN(md5('salt0:' || sh)) AS mh_0, "
            "MIN(md5('salt1:' || sh)) AS mh_1, MIN(md5('salt2:' || sh)) AS mh_2, "
            "MIN(md5('salt3:' || sh)) AS mh_3 FROM x GROUP BY id),\n"
            "bands AS (SELECT id, md5(concat_ws('|', '0', mh_0, mh_1)) AS band_val, "
            "0 AS band_idx FROM sigs UNION ALL "
            "SELECT id, md5(concat_ws('|', '1', mh_2, mh_3)), 1 FROM sigs)\n"
            "SELECT DISTINCT a.id AS id_a, b.id AS id_b FROM bands a JOIN bands b "
            "ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.id < b.id")


def _dedup_canonical_sql() -> str:
    """_lsh_pairs_sql's CTE chain + recursive hash-min flooding over the
    pair graph + left join back to all documents."""
    return (f"WITH RECURSIVE {_SHINGLES_SQL},\n"
            "x AS (SELECT id, unnest(sh_set) AS sh FROM sets),\n"
            "sigs AS (SELECT id, MIN(md5('salt0:' || sh)) AS mh_0, "
            "MIN(md5('salt1:' || sh)) AS mh_1, MIN(md5('salt2:' || sh)) AS mh_2, "
            "MIN(md5('salt3:' || sh)) AS mh_3 FROM x GROUP BY id),\n"
            "bands AS (SELECT id, md5(concat_ws('|', '0', mh_0, mh_1)) AS band_val, "
            "0 AS band_idx FROM sigs UNION ALL "
            "SELECT id, md5(concat_ws('|', '1', mh_2, mh_3)), 1 FROM sigs),\n"
            "pairs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b FROM bands a "
            "JOIN bands b ON a.band_idx = b.band_idx AND a.band_val = b.band_val "
            "AND a.id < b.id),\n"
            "und AS (SELECT id_a AS src, id_b AS dst FROM pairs "
            "UNION SELECT id_b, id_a FROM pairs),\n"
            "r(vid, label) AS (SELECT src, src FROM und UNION "
            "SELECT und.dst, r.label FROM r JOIN und ON und.src = r.vid "
            "WHERE r.label < und.dst),\n"
            "comp AS (SELECT vid, MIN(label) AS component FROM r GROUP BY vid)\n"
            "SELECT d.doc_id, COALESCE(c.component, d.doc_id) AS canonical_id, "
            "COALESCE(c.component, d.doc_id) = d.doc_id AS is_canonical "
            "FROM documents d LEFT JOIN comp c ON d.doc_id = c.vid")


def _jaccard_sql(threshold: float = 0.2, max_shingle_df: int = 1000) -> str:
    # mirrors the engine exactly: pair DISCOVERY restricted to shingles
    # with document frequency <= cap; jaccard itself exact (inter/union of
    # the FULL shingle sets — i/(sz_a+sz_b-i) == |A∩B|/|A∪B| on the same
    # integers, so the doubles are bit-identical to Spark's
    # size(array_intersect)/size(array_union)).
    return (f"WITH {_SHINGLES_SQL},\n"
            "x AS (SELECT id, unnest(sh_set) AS sh FROM sets),\n"
            "sz AS (SELECT id, len(sh_set) AS sz FROM sets),\n"
            f"rare AS (SELECT sh FROM x GROUP BY sh HAVING COUNT(*) <= {max_shingle_df}),\n"
            "xc AS (SELECT id, sh FROM x WHERE sh IN (SELECT sh FROM rare)),\n"
            "pairs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b FROM xc a "
            "JOIN xc b ON a.sh = b.sh AND a.id < b.id),\n"
            "inter AS (SELECT a.id AS id_a, b.id AS id_b, COUNT(*) AS i FROM x a "
            "JOIN x b ON a.sh = b.sh AND a.id < b.id GROUP BY a.id, b.id)\n"
            "SELECT p.id_a, p.id_b, i / (sa.sz + sb.sz - i) AS jaccard "
            "FROM pairs p JOIN inter it ON it.id_a = p.id_a AND it.id_b = p.id_b "
            "JOIN sz sa ON sa.id = p.id_a JOIN sz sb ON sb.id = p.id_b "
            f"WHERE i / (sa.sz + sb.sz - i) >= {threshold}")


def _surt_hosts_sql() -> str:
    """DuckDB mirror of get_surt_host's ASCII path (the IDNA branch is
    pytest-covered; this fixture is ASCII by construction)."""
    ip = r"^(www\.)?\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}$"
    label = "^[a-z0-9]([a-z0-9_-]{0,61}[a-z0-9])?$"
    fast = "regexp_extract(url, '(?i)^https?://([a-z0-9_.-]{2,253})([/?#]|$)', 1)"
    return f"""
WITH urls AS (SELECT doc_id, {_URL_EXPR_SQL} AS url FROM documents),
hosts AS (SELECT doc_id,
  CASE WHEN {fast} <> '' THEN {fast}
       ELSE nullif(regexp_extract(regexp_replace(regexp_extract(url,
              '(?i)^([a-z][a-z0-9+.-]*:)?//([^/?#]*)', 2), '^[^@]*@', ''),
              '^([^:]*)', 1), '')
  END AS host FROM urls),
p AS (SELECT doc_id, host, lower(trim(host)) AS h0,
      string_split(regexp_replace(lower(trim(host)), '\\.$', ''), '.') AS labels FROM hosts),
p2 AS (SELECT doc_id, host, h0, labels,
       CASE WHEN len(labels) > 2 AND labels[1] = 'www' THEN labels[2:] ELSE labels END AS fl
       FROM p)
SELECT doc_id,
  CASE WHEN host IS NOT NULL AND len(h0) BETWEEN 1 AND 253
        AND NOT regexp_matches(h0, '{ip}')
        AND len(labels) >= 2
        AND len(list_filter(fl, x -> NOT (len(x) <= 63 AND regexp_matches(x, '{label}')))) = 0
  THEN array_to_string(list_reverse(fl), '.') END AS surt_host
FROM p2
"""


def _extract_domains_sql() -> str:
    return r"""
WITH raws AS (SELECT doc_id, CASE doc_id % 5
    WHEN 0 THEN source || '.Example.COM'
    WHEN 1 THEN 'https://' || source || '.example.com/path'
    WHEN 2 THEN '"' || source || '.example.com"'
    WHEN 3 THEN source || '.example.com:8080'
    ELSE 'not a domain' END AS raw FROM documents),
s1 AS (SELECT doc_id, replace(regexp_replace(regexp_replace(
         regexp_replace(raw, '^\s+|\s+$', '', 'g'), '^['']+|^["]+', ''),
         '['']+$|["]+$', ''), '&amp;', '&') AS s FROM raws),
s2 AS (SELECT doc_id, s,
       CASE WHEN regexp_matches(s, '^[a-zA-Z][a-zA-Z0-9+.-]*://') THEN s
            ELSE 'http://' || s END AS prepped FROM s1),
s3 AS (SELECT doc_id, s, regexp_extract(lower(regexp_extract(prepped,
         '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)), '^([^:]*)', 1) AS domain FROM s2)
SELECT doc_id, CASE WHEN len(s) > 0 AND len(domain) > 0
        AND NOT regexp_matches(domain, '\s') AND contains(domain, '.')
  THEN domain END AS domain FROM s3
"""


def _etld1_flip_sql() -> str:
    """DuckDB mirror of the pure-SQL flip_if_needed_frame plan over the
    same inlined exact-rule subset: rotations × tails, rule join,
    longest-suffix per rotation, reference tuple-max across rotations."""
    vals = ", ".join(f"('{r}')" for r in _FLIP_RULES)
    return f"""
WITH rules(rule) AS (VALUES {vals}),
doms AS (SELECT doc_id, CASE doc_id % 4
    WHEN 0 THEN source || '.com'
    WHEN 1 THEN 'co.uk.' || source
    WHEN 2 THEN 'www.' || source || '.com.au'
    ELSE source END AS domain FROM documents),
lab AS (SELECT doc_id, domain,
        list_filter(string_split(regexp_replace(lower(trim(domain)),
          '^\\.+|\\.+$', '', 'g'), '.'), x -> len(x) > 0) AS labels FROM doms),
rot AS (SELECT doc_id, labels, len(labels) AS n,
        unnest(generate_series(0, len(labels) - 1)) AS r FROM lab WHERE len(labels) > 0),
rot2 AS (SELECT doc_id, n, r,
         CASE WHEN r = 0 THEN labels ELSE labels[n-r+1:] || labels[:n-r] END AS rotl FROM rot),
tails AS (SELECT doc_id, n, r, rotl, unnest(generate_series(1, n)) AS j FROM rot2),
m AS (SELECT doc_id, n, r, rotl, j FROM tails
      JOIN rules ON array_to_string(rotl[j:], '.') = rules.rule),
-- longest match first (min j), THEN drop rotations whose winning match
-- leaves no domain label (st=1) — mirrors flip_if_needed_frame post-fix
per_rot AS (SELECT doc_id, r, any_value(n) AS n, any_value(rotl) AS rotl,
            min(j) AS st FROM m GROUP BY doc_id, r HAVING min(j) >= 2),
cand AS (SELECT doc_id, {{'sl': n - st + 1, 'dl': len(rotl[st-1]),
         'norm': rotl[st-1] || '.' || array_to_string(rotl[st:], '.')}} AS c FROM per_rot),
best AS (SELECT doc_id, max(c) AS b FROM cand GROUP BY doc_id)
SELECT d.doc_id, d.domain,
       COALESCE(struct_extract(b.b, 'norm'), array_to_string(l.labels, '.'), d.domain) AS etld1
FROM doms d LEFT JOIN lab l ON l.doc_id = d.doc_id LEFT JOIN best b ON b.doc_id = d.doc_id
"""


_JSON_FIELDS_SQL = """
WITH j AS (SELECT event_id,
  '{"meta":{"type":"' || event_type || '","uid":' || user_id || '},"payload":' || props || '}' AS js
  FROM events)
SELECT event_id, js->'meta'->>'type' AS etype,
       (js->'meta'->>'uid')::BIGINT AS uid,
       (js->'payload'->>'k')::BIGINT AS k FROM j
"""


def _simhash_pairs_sql(max_hamming: int = 12) -> str:
    """Recomputes the engine's pure-SQL simhash in DuckDB: same md5-derived
    64-bit token hash (two 32-bit hex halves), same ±1 per-bit sums, same
    sign packing — then an all-pairs hamming filter (exact; the engine's
    pigeonhole chunk blocking with n_tables=16 finds every pair at
    hamming <= 15, so the result sets are identical for max_hamming=12)."""
    accs = ", ".join(
        f"SUM(CASE WHEN (({'lo' if b < 32 else 'hi'} >> {b % 32}) & 1) = 1 "
        f"THEN 1 ELSE -1 END) AS acc_{b}"
        for b in range(64)
    )
    terms = " + ".join(
        f"CASE WHEN acc_{b} > 0 THEN "
        f"{'(-9223372036854775807 - 1)' if b == 63 else (1 << b)}::BIGINT "
        f"ELSE 0::BIGINT END"
        for b in range(64)
    )
    return f"""
WITH toks AS (
  SELECT doc_id AS id, unnest(list_distinct(list_filter(
    string_split_regex(lower(text), '\\s+'), t -> len(t) > 0))) AS tok
  FROM documents
),
hashed AS (SELECT id, ('0x' || substr(md5(tok), 1, 8))::BIGINT AS hi,
                      ('0x' || substr(md5(tok), 9, 8))::BIGINT AS lo FROM toks),
accs AS (SELECT id, {accs} FROM hashed GROUP BY id),
sig0 AS (SELECT id, {terms} AS simhash FROM accs),
sigs AS (SELECT d.doc_id AS id, COALESCE(s.simhash, 0) AS simhash
         FROM documents d LEFT JOIN sig0 s ON s.id = d.doc_id)
SELECT a.id AS id_a, b.id AS id_b, bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sigs a JOIN sigs b ON a.id < b.id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


_TOKENS_SQL = ("list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), "
               "t -> len(t) > 0)")
_EN_STOP = "['the','and','of','to','in','is','that','it','for','was']"
_FR_STOP = "['le','la','les','de','des','et','est','une','que','pour']"
_DE_STOP = "['der','die','das','und','ist','nicht','mit','ein','zu','den']"
_ES_STOP = "['el','la','los','de','que','y','es','en','un','por']"


def _repetition_sql() -> str:
    """DuckDB mirror of repetition_stats: same tokenizer regex, bigrams/
    trigrams over 1-indexed ranges (range(1, n) = i in 1..n-1, matching
    zip_with over slice(toks, 1, n-1) x slice(toks, 2, n-1)), identical
    double formulas — values compare exactly without rounding."""
    return r"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'),
                             x -> len(x) > 0) AS toks
          FROM documents),
        m AS (
          SELECT doc_id, toks, len(toks) AS n,
            CASE WHEN len(toks) >= 2 THEN list_transform(range(1, len(toks)),
              i -> toks[i] || ' ' || toks[i+1]) ELSE [] END AS bg,
            CASE WHEN len(toks) >= 3 THEN list_transform(range(1, len(toks)-1),
              i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
              ELSE [] END AS tg
          FROM t)
        SELECT doc_id, n AS n_tokens,
          CASE WHEN n > 0 THEN len(list_distinct(toks)) / n
               ELSE 0.0 END AS uniq_token_frac,
          CASE WHEN n >= 2 THEN 2.0 * list_max(list_transform(
                 list_distinct(bg), d -> len(list_filter(bg, x -> x = d)))) / n
               ELSE 0.0 END AS top_bigram_frac,
          CASE WHEN n >= 3 THEN 1.0 - len(list_distinct(tg)) / len(tg)
               ELSE 0.0 END AS dup_trigram_frac
        FROM m"""


def _char_entropy_sql() -> str:
    """DuckDB mirror of char_entropy: per-char list, distinct-char
    -Σ p·log2(p), 6dp-rounded."""
    return r"""
        WITH t AS (
          SELECT doc_id,
                 list_transform(range(1, len(text) + 1),
                                i -> substring(text, i, 1)) AS chars
          FROM documents)
        SELECT doc_id,
               len(chars) AS n_chars,
               len(list_distinct(chars)) AS n_distinct_chars,
               CASE WHEN len(chars) > 0 THEN ROUND(
                 -list_sum(list_transform(list_distinct(chars),
                   d -> (len(list_filter(chars, x -> x = d))
                         / len(chars))
                        * log2(len(list_filter(chars, x -> x = d))
                               / len(chars)))), 6)
               ELSE 0.0 END AS char_entropy
        FROM t"""


def _gopher_sql() -> str:
    """DuckDB mirror of gopher_quality(stopwords=('the','a'),
    min_stopwords=2): same whitespace tokenizer, exact integer counters,
    8dp-rounded int/int ratios, keep emitted as 0/1 BIGINT (the driver
    record has never hashed a BOOLEAN; stay in proven dtypes)."""
    return r"""
        WITH t AS (
          SELECT doc_id,
                 list_filter(string_split_regex(lower(text), '\s+'),
                             x -> x != '') AS w
          FROM documents),
        m AS (
          SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words,
                 COALESCE(list_sum(list_transform(w, x -> len(x))), 0) AS chars,
                 len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS alpha,
                 CAST(len(list_intersect(list_distinct(w), ['the', 'a']))
                      AS BIGINT) AS n_stop
          FROM t),
        r AS (
          SELECT doc_id, n_words,
                 CASE WHEN n_words > 0 THEN ROUND(chars / n_words, 8)
                      ELSE 0.0 END AS mean_word_len,
                 CASE WHEN n_words > 0 THEN ROUND(alpha / n_words, 8)
                      ELSE 0.0 END AS alpha_frac,
                 n_stop
          FROM m)
        SELECT doc_id, n_words, mean_word_len, alpha_frac, n_stop,
               CAST(n_words >= 50 AND n_words <= 100000
                    AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                    AND alpha_frac >= 0.8 AND n_stop >= 2
                    AS BIGINT) AS keep
        FROM r"""


def _c4_sql() -> str:
    """DuckDB mirror of q_c4_line_stats: identical ' value ' -> '.\\n'
    derivation, trim+drop-empty line list, keep-rule (terminal punct,
    >=5 words, no boilerplate markers), min_kept_lines=2; counters are
    BIGINT-cast, kept_frac one 8dp int/int division."""
    return r"""
        WITH d AS (
          SELECT doc_id,
                 replace(text, ' value ', '.' || chr(10)) AS text
          FROM documents),
        t AS (
          SELECT doc_id,
                 list_filter(list_transform(string_split(text, chr(10)),
                                            x -> trim(x)),
                             x -> x != '') AS lines
          FROM d),
        k AS (
          SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
                 list_filter(lines, x ->
                   regexp_matches(x, '[.!?”"'']$')
                   AND len(list_filter(string_split_regex(x, '\s+'),
                                       w -> w != '')) >= 5
                   AND NOT contains(lower(x), 'lorem ipsum')
                   AND NOT contains(x, '{')
                   AND NOT contains(lower(x), 'javascript')) AS kept
          FROM t)
        SELECT doc_id, n_lines,
               CAST(len(kept) AS BIGINT) AS kept_lines,
               CAST(COALESCE(list_sum(list_transform(kept,
                 x -> len(list_filter(string_split_regex(x, '\s+'),
                                      w -> w != '')))), 0) AS BIGINT)
                 AS kept_words,
               CASE WHEN n_lines > 0 THEN ROUND(len(kept) / n_lines, 8)
                    ELSE 0.0 END AS kept_frac,
               CAST(len(kept) >= 2 AS BIGINT) AS keep
        FROM k"""


def _contamination_sql(shingle_n: int = 5, min_shared: int = 3) -> str:
    """DuckDB mirror of q_contamination: 5-gram shingle sets (the
    _SHINGLES_SQL construction at n=5), benchmark = doc_id % 20 = 0,
    corpus docs counted by distinct shared shingles."""
    n1 = shingle_n - 1
    return f"""
        WITH t AS (SELECT doc_id,
                          string_split_regex(lower(text), '\\s+') AS w
                   FROM documents),
        sh AS (SELECT doc_id, unnest(list_distinct(list_transform(
                 generate_series(1, greatest(len(w) - {n1}, 1)),
                 i -> array_to_string(w[i:i+{n1}], ' ')))) AS sh
               FROM t),
        b AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 20 = 0),
        c AS (SELECT doc_id, sh FROM sh WHERE doc_id % 20 <> 0)
        SELECT c.doc_id, COUNT(DISTINCT c.sh) AS n_shared_ngrams
        FROM c JOIN b ON c.sh = b.sh
        GROUP BY c.doc_id
        HAVING COUNT(DISTINCT c.sh) >= {min_shared}"""


def _quality_sql() -> str:
    return f"""
WITH b AS (
  SELECT doc_id, text, {_TOKENS_SQL} AS toks,
         length(text) AS n_char,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS n_alpha,
         length(regexp_replace(text, '[^\\.,;:!\\?"''\\(\\)]', '', 'g')) AS n_punct,
         length(regexp_replace(text, '[^A-Z]', '', 'g')) AS n_upper
  FROM documents
)
SELECT doc_id,
  n_char AS n_chars,
  len(toks) AS n_tokens,
  CASE WHEN len(toks) > 0 THEN n_char / len(toks) ELSE 0.0 END AS mean_word_len,
  CASE WHEN n_char > 0 THEN n_alpha / n_char ELSE 0.0 END AS alpha_ratio,
  CASE WHEN n_char > 0 THEN n_punct / n_char ELSE 0.0 END AS punct_ratio,
  CASE WHEN n_char > 0 THEN n_upper / n_char ELSE 0.0 END AS upper_ratio,
  CASE WHEN len(toks) > 0 THEN
    len(list_filter(toks, x -> list_contains({_EN_STOP}, x))) / len(toks)
  ELSE 0.0 END AS stopword_ratio
FROM b
"""


def _langid_sql() -> str:
    scores = []
    for lang, arr in [("en", _EN_STOP), ("fr", _FR_STOP), ("de", _DE_STOP), ("es", _ES_STOP)]:
        scores.append(
            f"SELECT doc_id, '{lang}' AS lang, "
            f"len(list_filter(toks, x -> list_contains({arr}, x))) / greatest(len(toks), 1) AS score FROM b"
        )
    union = " UNION ALL ".join(scores)
    return f"""
WITH b AS (SELECT doc_id, {_TOKENS_SQL} AS toks FROM documents),
s AS ({union}),
best AS (SELECT doc_id, lang, score, ROW_NUMBER() OVER
  (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn FROM s)
SELECT doc_id, CASE WHEN score > 0 THEN lang ELSE 'und' END AS lang_pred,
       score AS lang_score
FROM best WHERE rn = 1
"""


def _cosine_topk_sql() -> str:
    dot = ("list_sum(list_transform(generate_series(1, len(q.qv)), "
           "i -> q.qv[i]::DOUBLE * c.embedding[i]::DOUBLE))")
    nq = ("sqrt(list_sum(list_transform(generate_series(1, len(q.qv)), "
          "i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE)))")
    nc = ("sqrt(list_sum(list_transform(generate_series(1, len(c.embedding)), "
          "i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)))")
    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 5),
scored AS (
  SELECT q.query_id, c.vec_id AS neighbor_id, {dot} / ({nq} * {nc}) AS cosine
  FROM q, embeddings c WHERE c.vec_id <> q.query_id
),
ranked AS (SELECT query_id, neighbor_id, cosine, ROW_NUMBER() OVER
  (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM scored)
SELECT query_id, neighbor_id, rank, ROUND(cosine, 6) AS cosine FROM ranked WHERE rank <= 5
"""


def _ann_lsh_sql(bits_per_table: int = 4, n_tables: int = 6, seed: int = 7,
                 k: int = 5) -> str:
    """DuckDB mirror of lsh_bucketed_topk with md5-derived ±1 hyperplanes
    (similarity.py::_md5_sign_planes): plane[d,b] = +1 iff the first 8 hex
    chars of md5('seed:b:d') are even; bit_b = dot(v, plane_b) > 0; table
    t's bucket key packs its bits little-endian; pairs form inside
    matching (table, bucket) cells; ranking by round(cosine, 6) then
    neighbor_id — identical to the engine's round_digits=6 ordering."""
    total_bits = bits_per_table * n_tables
    sign = ("(CASE WHEN (('0x' || substr(md5('" + str(seed) +
            "' || ':' || b || ':' || (i - 1)), 1, 8))::BIGINT % 2) = 0 "
            "THEN 1.0 ELSE -1.0 END)")
    dot = ("list_sum(list_transform(generate_series(1, len(a.embedding)), "
           "i -> a.embedding[i]::DOUBLE * b2.embedding[i]::DOUBLE))")
    na = ("sqrt(list_sum(list_transform(generate_series(1, len(a.embedding)), "
          "i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))")
    nb = ("sqrt(list_sum(list_transform(generate_series(1, len(b2.embedding)), "
          "i -> b2.embedding[i]::DOUBLE * b2.embedding[i]::DOUBLE)))")
    return f"""
WITH e AS (SELECT vec_id, embedding FROM embeddings),
bits AS (
  SELECT vec_id, b,
    CASE WHEN list_sum(list_transform(generate_series(1, len(embedding)),
      i -> embedding[i]::DOUBLE * {sign})) > 0 THEN 1 ELSE 0 END AS bit
  FROM e, (SELECT unnest(generate_series(0, {total_bits - 1})) AS b)
),
keys AS (
  SELECT vec_id, b // {bits_per_table} AS table_idx,
         SUM(bit * (1::BIGINT << (b % {bits_per_table})))::BIGINT AS bucket
  FROM bits GROUP BY vec_id, b // {bits_per_table}
),
qk AS (SELECT vec_id AS query_id, table_idx, bucket FROM keys WHERE vec_id < 5),
ck AS (SELECT vec_id AS neighbor_id, table_idx, bucket FROM keys),
pairs AS (
  SELECT DISTINCT query_id, neighbor_id
  FROM qk JOIN ck USING (table_idx, bucket) WHERE query_id <> neighbor_id
),
scored AS (
  SELECT p.query_id, p.neighbor_id, {dot} / ({na} * {nb}) AS cosine
  FROM pairs p JOIN e a ON a.vec_id = p.query_id JOIN e b2 ON b2.vec_id = p.neighbor_id
),
ranked AS (SELECT query_id, neighbor_id, ROW_NUMBER() OVER
  (PARTITION BY query_id ORDER BY ROUND(cosine, 6) DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= {k}
"""


def _mis_sql(rounds: int = 3, seed: int = 7) -> str:
    """DuckDB mirror of graph.mis.maximal_independent_set: per round a
    vertex wins when its md5 priority is strictly below every ACTIVE
    neighbour's min ('g' sentinel when none), winners' active
    neighbourhoods deactivate; unrolled CTE chain."""
    parts = [
        f"WITH und AS MATERIALIZED ({_UND_SQL})",
        f"""v AS MATERIALIZED (
          SELECT vid, md5('{seed}:' || CAST(vid AS VARCHAR)) AS p
          FROM ({_VERTS_SQL}))""",
        "a0 AS (SELECT * FROM v)",
    ]
    for i in range(1, rounds + 1):
        parts.append(f"""m{i} AS MATERIALIZED (
          SELECT a.vid FROM a{i - 1} a LEFT JOIN (
            SELECT u.src AS vid, MIN(b.p) AS mp
            FROM und u JOIN a{i - 1} b ON b.vid = u.dst GROUP BY u.src) n
          ON n.vid = a.vid
          WHERE a.p < COALESCE(n.mp, 'g'))""")
        parts.append(f"""r{i} AS MATERIALIZED (
          SELECT DISTINCT u.dst AS vid FROM und u JOIN m{i} w ON w.vid = u.src
          WHERE u.dst IN (SELECT vid FROM a{i - 1})
            AND u.dst NOT IN (SELECT vid FROM m{i}))""")
        parts.append(f"""a{i} AS MATERIALIZED (
          SELECT * FROM a{i - 1}
          WHERE vid NOT IN (SELECT vid FROM m{i})
            AND vid NOT IN (SELECT vid FROM r{i}))""")
    mis_u = " UNION ALL ".join(
        f"SELECT vid FROM m{i}" for i in range(1, rounds + 1))
    out_u = " UNION ALL ".join(
        f"SELECT vid FROM r{i}" for i in range(1, rounds + 1))
    return ",\n".join(parts) + f"""
        SELECT vid, 'mis' AS state FROM ({mis_u})
        UNION ALL SELECT vid, 'out' AS state FROM ({out_u})
        UNION ALL SELECT vid, 'active' AS state FROM a{rounds}"""


def _kmeans_sql(k: int = 8, iters: int = 2, seed: int = 7,
                dim: int = 64) -> str:
    """DuckDB mirror of pipeline.ivf.kmeans_assign: md5-seeded centroids,
    ``iters`` unrolled Lloyd rounds with the exact floor(x*1e9) integer
    means, final 6dp-cosine assignment (ties to the smaller list_id)."""
    key = f"md5('{seed}' || ':' || vec_id)"

    def dot(a, b, acol="emb", bcol="cv"):
        return (f"list_sum(list_transform(generate_series(1, len({a}.{acol})), "
                f"i -> {a}.{acol}[i]::DOUBLE * {b}.{bcol}[i]::DOUBLE))")

    def norm(t, col):
        return (f"sqrt(list_sum(list_transform(generate_series(1, len({t}.{col})), "
                f"i -> {t}.{col}[i]::DOUBLE * {t}.{col}[i]::DOUBLE)))")

    cent_cos = f"{dot('v', 'c')} / ({norm('v', 'emb')} * {norm('c', 'cv')})"
    parts = [
        """WITH v AS MATERIALIZED (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings)""",
        f"""c0 AS MATERIALIZED (
          SELECT ROW_NUMBER() OVER (ORDER BY {key}, vec_id) AS list_id,
                 emb AS cv
          FROM v ORDER BY {key}, vec_id LIMIT {k})""",
    ]
    for i in range(1, iters + 1):
        parts.append(f"""s{i} AS MATERIALIZED (
          SELECT vec_id, list_id FROM (
            SELECT v.vec_id, c.list_id,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                     ORDER BY ROUND({cent_cos}, 6) DESC, c.list_id ASC) AS rn
            FROM v, c{i - 1} c) WHERE rn = 1)""")
        parts.append(f"""mm{i} AS (
          SELECT a.list_id, dd.d,
                 CAST(SUM(CAST(FLOOR(v.emb[dd.d] * 1e9) AS BIGINT)) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE) / 1e9 AS cmp
          FROM s{i} a JOIN v USING (vec_id)
          CROSS JOIN (SELECT UNNEST(range(1, {dim + 1})) AS d) dd
          GROUP BY a.list_id, dd.d)""")
        parts.append(f"""c{i} AS MATERIALIZED (
          SELECT c.list_id, COALESCE(m.nc, c.cv) AS cv
          FROM c{i - 1} c LEFT JOIN (
            SELECT list_id, list(cmp ORDER BY d) AS nc
            FROM mm{i} GROUP BY list_id) m
          ON m.list_id = c.list_id)""")
    return ",\n".join(parts) + f"""
        SELECT vec_id, list_id FROM (
          SELECT v.vec_id, c.list_id,
                 ROW_NUMBER() OVER (PARTITION BY v.vec_id
                   ORDER BY ROUND({cent_cos}, 6) DESC, c.list_id ASC) AS rn
          FROM v, c{iters} c) WHERE rn = 1"""


def _pq_train_ctes(m: int, k: int, sd: int, train_iters: int) -> tuple[str, str]:
    """(CTE chain, final codebook name) for the md5-seeded PQ codebooks
    plus ``train_iters`` unrolled Lloyd iterations — the DuckDB replay of
    ``pq.refine_codebooks``: 6dp-rounded argmin assignment, member means
    over floor(x*1e9)-quantized inputs summed exactly as integers (one
    double division at the end — order-independent in both engines),
    empty codes keep the previous codeword."""
    parts = [
        f"""cb0 AS MATERIALIZED (
          SELECT rn // {k} AS j, rn % {k} AS code_id,
                 emb[(rn // {k}) * {sd} + 1 : (rn // {k}) * {sd} + {sd}] AS cw
          FROM seeds)"""]
    for i in range(train_iters):
        fold_i = (f"list_reduce(list_transform(range(1, {sd + 1}), "
                  f"i -> (emb[j*{sd} + i] - cw[i]) * (emb[j*{sd} + i] - cw[i])), "
                  f"(x, y) -> x + y)")
        parts.append(f"""a{i + 1} AS MATERIALIZED (
          SELECT v.vec_id, cb{i}.j, cb{i}.code_id
          FROM v CROSS JOIN cb{i}
          QUALIFY ROW_NUMBER() OVER (PARTITION BY v.vec_id, cb{i}.j
            ORDER BY ROUND({fold_i}, 6), cb{i}.code_id) = 1)""")
        parts.append(f"""m{i + 1} AS (
          SELECT a.j, a.code_id, dd.d,
                 CAST(SUM(CAST(FLOOR(v.emb[a.j*{sd} + dd.d] * 1e9) AS BIGINT))
                      AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1e9 AS cmp
          FROM a{i + 1} a JOIN v USING (vec_id)
          CROSS JOIN (SELECT UNNEST(range(1, {sd + 1})) AS d) dd
          GROUP BY a.j, a.code_id, dd.d)""")
        parts.append(f"""cb{i + 1} AS MATERIALIZED (
          SELECT cb{i}.j, cb{i}.code_id, COALESCE(mm.ncw, cb{i}.cw) AS cw
          FROM cb{i} LEFT JOIN (
            SELECT j, code_id, list(cmp ORDER BY d) AS ncw
            FROM m{i + 1} GROUP BY j, code_id) mm
          ON mm.j = cb{i}.j AND mm.code_id = cb{i}.code_id)""")
    return ",\n".join(parts), f"cb{train_iters}"


def _ann_pq_sql(m: int = 8, k: int = 16, k_nn: int = 10, seed: int = 7,
                dim: int = 64, train_iters: int = 0) -> str:
    """DuckDB mirror of pq_adc_topk: same md5 seeding + ROW_NUMBER block
    layout for the codebooks, ``train_iters`` unrolled Lloyd refinement
    passes (exact quantized-integer means), list_reduce left-fold
    subspace distances (bit-equal to the engine's F.aggregate fold),
    6dp-rounded argmin assignment, 6dp-rounded ADC totals,
    (adc, vec_id) top-k per query."""
    sd = dim // m
    fold = (f"list_reduce(list_transform(range(1, {sd + 1}), "
            f"i -> (emb[j*{sd} + i] - cw[i]) * (emb[j*{sd} + i] - cw[i])), "
            f"(x, y) -> x + y)")
    train, cb = _pq_train_ctes(m, k, sd, train_iters)
    return f"""
        WITH v AS MATERIALIZED (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
        seeds AS MATERIALIZED (
          SELECT vec_id, emb,
                 ROW_NUMBER() OVER (ORDER BY
                   md5('{seed}:' || CAST(vec_id AS VARCHAR)), vec_id) - 1 AS rn
          FROM v QUALIFY rn < {m * k}),
        {train},
        enc AS MATERIALIZED (
          SELECT v.vec_id, {cb}.j, {cb}.code_id
          FROM v CROSS JOIN {cb}
          QUALIFY ROW_NUMBER() OVER (PARTITION BY v.vec_id, {cb}.j
            ORDER BY ROUND({fold}, 6), {cb}.code_id) = 1),
        lut AS MATERIALIZED (
          SELECT v.vec_id AS qid, {cb}.j, {cb}.code_id, {fold} AS pd
          FROM v CROSS JOIN {cb} WHERE v.vec_id < 5)
        SELECT qid, vec_id, adc FROM (
          SELECT l.qid, e.vec_id, ROUND(SUM(l.pd), 6) AS adc
          FROM enc e JOIN lut l ON e.j = l.j AND e.code_id = l.code_id
          GROUP BY l.qid, e.vec_id)
        QUALIFY ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc, vec_id)
          <= {k_nn}"""


def _ann_ivfpq_sql(n_lists: int = 8, nprobe: int = 3, m: int = 8,
                   k: int = 16, k_nn: int = 10, seed: int = 7,
                   dim: int = 64, train_iters: int = 0) -> str:
    """DuckDB mirror of ivfpq_topk: the _ann_ivf_sql cell-assignment /
    probe CTEs composed with the _ann_pq_sql codebook / training /
    encoding / LUT CTEs; ADC sums restricted to probed
    (query, candidate) pairs."""
    key = f"md5('{seed}' || ':' || vec_id)"
    sd = dim // m
    fold = (f"list_reduce(list_transform(range(1, {sd + 1}), "
            f"i -> (emb[j*{sd} + i] - cw[i]) * (emb[j*{sd} + i] - cw[i])), "
            f"(x, y) -> x + y)")
    train, cb = _pq_train_ctes(m, k, sd, train_iters)

    def dot(a, b, acol="emb", bcol="cv"):
        return (f"list_sum(list_transform(generate_series(1, len({a}.{acol})), "
                f"i -> {a}.{acol}[i]::DOUBLE * {b}.{bcol}[i]::DOUBLE))")

    def norm(t, col):
        return (f"sqrt(list_sum(list_transform(generate_series(1, len({t}.{col})), "
                f"i -> {t}.{col}[i]::DOUBLE * {t}.{col}[i]::DOUBLE)))")

    cent_cos = f"{dot('v', 'c')} / ({norm('v', 'emb')} * {norm('c', 'cv')})"
    return f"""
WITH v AS MATERIALIZED (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings),
cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY {key}, vec_id) AS list_id, emb AS cv
  FROM v ORDER BY {key}, vec_id LIMIT {n_lists}),
cc AS MATERIALIZED (
  SELECT v.vec_id, c.list_id, ROUND({cent_cos}, 6) AS cs FROM v, cent c),
ca AS MATERIALIZED (
  SELECT vec_id, list_id FROM (
    SELECT vec_id, list_id, ROW_NUMBER() OVER
      (PARTITION BY vec_id ORDER BY cs DESC, list_id ASC) AS rn FROM cc)
  WHERE rn = 1),
qa AS (
  SELECT vec_id AS qid, list_id FROM (
    SELECT vec_id, list_id, ROW_NUMBER() OVER
      (PARTITION BY vec_id ORDER BY cs DESC, list_id ASC) AS rn
    FROM cc WHERE vec_id < 5)
  WHERE rn <= {nprobe}),
seeds AS MATERIALIZED (
  SELECT vec_id, emb,
         ROW_NUMBER() OVER (ORDER BY
           md5('{seed}:' || CAST(vec_id AS VARCHAR)), vec_id) - 1 AS rn
  FROM v QUALIFY rn < {m * k}),
{train},
enc AS MATERIALIZED (
  SELECT v.vec_id, {cb}.j, {cb}.code_id
  FROM v CROSS JOIN {cb}
  QUALIFY ROW_NUMBER() OVER (PARTITION BY v.vec_id, {cb}.j
    ORDER BY ROUND({fold}, 6), {cb}.code_id) = 1),
lut AS MATERIALIZED (
  SELECT v.vec_id AS qid, {cb}.j, {cb}.code_id, {fold} AS pd
  FROM v CROSS JOIN {cb} WHERE v.vec_id < 5),
pairs AS (
  SELECT qa.qid, ca.vec_id AS vid FROM qa JOIN ca USING (list_id)
  WHERE qa.qid <> ca.vec_id)
SELECT qid, vec_id, adc FROM (
  SELECT p.qid, p.vid AS vec_id, ROUND(SUM(l.pd), 6) AS adc
  FROM pairs p JOIN enc e2 ON e2.vec_id = p.vid
  JOIN lut l ON l.qid = p.qid AND l.j = e2.j AND l.code_id = e2.code_id
  GROUP BY p.qid, p.vid)
QUALIFY ROW_NUMBER() OVER (PARTITION BY qid ORDER BY adc, vec_id) <= {k_nn}"""


def _ann_ivf_sql(n_lists: int = 8, nprobe: int = 3, seed: int = 7,
                 k: int = 5) -> str:
    """DuckDB mirror of pipeline.ivf.ivf_topk: centroids are the n_lists
    vectors whose md5(seed:vec_id) sorts first (ivf.seed_centroids);
    candidates join their single argmax-cosine cell, queries probe their
    nprobe best cells; rankings order by ROUND(cosine, 6) then id —
    identical to the engine's round_digits=6 orderings, so the result is
    bit-reproducible."""
    key = f"md5('{seed}' || ':' || vec_id)"

    def dot(a: str, b: str, acol: str = "embedding", bcol: str = "cv") -> str:
        return (f"list_sum(list_transform(generate_series(1, len({a}.{acol})), "
                f"i -> {a}.{acol}[i]::DOUBLE * {b}.{bcol}[i]::DOUBLE))")

    def norm(t: str, col: str) -> str:
        return (f"sqrt(list_sum(list_transform(generate_series(1, len({t}.{col})), "
                f"i -> {t}.{col}[i]::DOUBLE * {t}.{col}[i]::DOUBLE)))")

    cent_cos = f"{dot('v', 'c')} / ({norm('v', 'embedding')} * {norm('c', 'cv')})"
    pair_cos = (f"{dot('a', 'b2', 'embedding', 'embedding')} / "
                f"({norm('a', 'embedding')} * {norm('b2', 'embedding')})")
    return f"""
WITH e AS (SELECT vec_id, embedding FROM embeddings),
cent AS (
  SELECT ROW_NUMBER() OVER (ORDER BY {key}, vec_id) AS list_id, embedding AS cv
  FROM e ORDER BY {key}, vec_id LIMIT {n_lists}
),
cc AS (
  SELECT v.vec_id, c.list_id, ROUND({cent_cos}, 6) AS cs
  FROM e v, cent c
),
ca AS (
  SELECT vec_id AS neighbor_id, list_id FROM (
    SELECT vec_id, list_id, ROW_NUMBER() OVER
      (PARTITION BY vec_id ORDER BY cs DESC, list_id ASC) AS rn FROM cc)
  WHERE rn = 1
),
qa AS (
  SELECT vec_id AS query_id, list_id FROM (
    SELECT vec_id, list_id, ROW_NUMBER() OVER
      (PARTITION BY vec_id ORDER BY cs DESC, list_id ASC) AS rn
    FROM cc WHERE vec_id < 5)
  WHERE rn <= {nprobe}
),
pairs AS (
  SELECT DISTINCT qa.query_id, ca.neighbor_id
  FROM qa JOIN ca ON qa.list_id = ca.list_id
  WHERE qa.query_id <> ca.neighbor_id
),
scored AS (
  SELECT p.query_id, p.neighbor_id, {pair_cos} AS cosine
  FROM pairs p JOIN e a ON a.vec_id = p.query_id
               JOIN e b2 ON b2.vec_id = p.neighbor_id
),
ranked AS (SELECT query_id, neighbor_id, ROW_NUMBER() OVER
  (PARTITION BY query_id ORDER BY ROUND(cosine, 6) DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# round-5 wave: temporal analytics, exact quantiles, SALSA, butterflies
# ---------------------------------------------------------------------------

def q_salsa_3iter(spark, sf_dir):
    """SALSA hub/authority scores (3 degree-normalized iterations) on the
    lineitem link graph — HITS's random-walk cousin (graph/salsa.py)."""
    from credigraph_spark.graph.salsa import salsa

    return salsa(_edges(spark, sf_dir), max_iter=3)


def _salsa3_sql(iters: int = 3) -> str:
    """DuckDB mirror of graph/salsa.py: unrolled degree-normalized
    half-step pairs; MATERIALIZED state CTEs (the _hits3_sql lesson —
    DuckDB re-inlines multiply-referenced CTEs exponentially)."""
    parts = [
        f"WITH e AS MATERIALIZED ({_E_SQL})",
        f"verts AS MATERIALIZED ({_VERTS_SQL})",
        "n AS (SELECT COUNT(*) AS c FROM verts)",
        ("ew AS MATERIALIZED (SELECT e.src, e.dst, "
         "1.0::DOUBLE / od.od AS w_fwd, 1.0::DOUBLE / idg.id_ AS w_bwd "
         "FROM e "
         "JOIN (SELECT src, COUNT(*) AS od FROM e GROUP BY 1) od "
         "ON e.src = od.src "
         "JOIN (SELECT dst, COUNT(*) AS id_ FROM e GROUP BY 1) idg "
         "ON e.dst = idg.dst)"),
        ("h0 AS MATERIALIZED (SELECT vid, 1.0::DOUBLE/(SELECT c FROM n) "
         "AS score FROM verts)"),
    ]
    for i in range(iters):
        parts.append(
            f"a{i + 1} AS MATERIALIZED (SELECT ew.dst AS vid, "
            f"SUM(h.score * ew.w_fwd) AS score FROM ew "
            f"JOIN h{i} h ON ew.src = h.vid GROUP BY 1)")
        parts.append(
            f"h{i + 1} AS MATERIALIZED (SELECT ew.src AS vid, "
            f"SUM(a.score * ew.w_bwd) AS score FROM ew "
            f"JOIN a{i + 1} a ON ew.dst = a.vid GROUP BY 1)")
    return ",\n".join(parts) + (
        f"\nSELECT v.vid, ROUND(COALESCE(h.score, 0), 8) AS hub, "
        f"ROUND(COALESCE(a.score, 0), 8) AS auth "
        f"FROM verts v LEFT JOIN h{iters} h ON v.vid = h.vid "
        f"LEFT JOIN a{iters} a ON v.vid = a.vid")


def q_butterflies(spark, sf_dir):
    """Exact butterfly (2x2 biclique) count of the link graph — the
    bipartite cohesion motif (graph/butterflies.py)."""
    from credigraph_spark.graph.butterflies import butterfly_count

    return butterfly_count(_edges(spark, sf_dir))


_BUTTERFLIES_SQL = f"""
WITH e AS ({_E_SQL}),
p AS (SELECT a.src AS s1, b.src AS s2, COUNT(*) AS c
      FROM e a JOIN e b ON a.dst = b.dst AND a.src < b.src
      GROUP BY 1, 2)
SELECT CAST(SUM(CASE WHEN c >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_wedge_pairs,
       CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS n_butterflies
FROM p"""


def q_eff_diameter_hops(spark, sf_dir):
    """Integer-exact effective-diameter hop readout off the ANF register
    curve (q=0.9, 4 hops, 4 registers) — no float anywhere."""
    from credigraph_spark.graph.anf import effective_diameter_hops

    return effective_diameter_hops(_edges(spark, sf_dir), max_hops=4,
                                   num_registers=4, seed=7)


def _eff_diameter_sql() -> str:
    return f"""
WITH curve AS MATERIALIZED ({_anf_sql(4, 4, 7)}),
fin AS (SELECT sum_rho AS final_rho FROM curve WHERE hop = 4)
SELECT CAST(hop AS BIGINT) AS eff_hop, CAST(sum_rho AS BIGINT) AS sum_rho_eff,
       CAST(final_rho AS BIGINT) AS sum_rho_final
FROM (SELECT c.hop, c.sum_rho, f.final_rho,
             ROW_NUMBER() OVER (ORDER BY c.hop) AS rn
      FROM curve c CROSS JOIN fin f
      WHERE c.sum_rho * 10 >= f.final_rho * 9)
WHERE rn = 1"""


def q_exact_quantiles(spark, sf_dir):
    """EXACT distributed order-price quantiles (percentile_disc rank
    ceil(q*n)) via the range-partition cumulative-offset plan
    (analytics.exact_quantiles) — the oracle-checkable companion to
    approx_percentile."""
    from credigraph_spark.analytics import exact_quantiles

    return exact_quantiles(_t(spark, sf_dir, "orders"), "o_totalprice",
                           num_ranges=16)


_EXACT_QUANTILES_SQL = """
WITH v AS (SELECT o_totalprice AS v FROM orders WHERE o_totalprice IS NOT NULL),
r AS (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn, COUNT(*) OVER () AS n
      FROM v)
SELECT CAST(t.q AS DOUBLE) AS q, r.v AS value
FROM r JOIN (VALUES (0.25), (0.5), (0.75), (0.9), (0.99)) t(q)
  ON r.rn = CAST(ceil(CAST(t.q AS DOUBLE) * r.n) AS BIGINT)"""


def q_sessions_30m(spark, sf_dir):
    """Gap-based sessionization of the event stream (30-min inactivity
    cutoff): one shuffle+sort per (user), integer-microsecond outputs
    (temporal.sessionize)."""
    from credigraph_spark.temporal import sessionize

    return sessionize(_t(spark, sf_dir, "events"), gap_minutes=30)


_SESSIONS_SQL = """
WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id FROM events),
f AS (SELECT user_id, ts_us, event_id,
        CASE WHEN LAG(ts_us) OVER w IS NULL
                  OR ts_us - LAG(ts_us) OVER w > 1800000000
             THEN 1 ELSE 0 END AS new_sess
      FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
s AS (SELECT user_id, ts_us,
        CAST(SUM(new_sess) OVER (PARTITION BY user_id
             ORDER BY ts_us, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        AS session_idx
      FROM f)
SELECT user_id, session_idx, COUNT(*) AS n_events,
       MIN(ts_us) AS start_us, MAX(ts_us) AS end_us,
       MAX(ts_us) - MIN(ts_us) AS duration_us
FROM s GROUP BY 1, 2"""


def q_asof_purchase(spark, sf_dir):
    """AS-OF join: every click event picks up the user's LATEST purchase
    value at-or-before it (union-marker single-shuffle formulation,
    temporal.asof_join; tie among equal-ts purchases -> largest
    event_id)."""
    from credigraph_spark.temporal import asof_join

    ev = _t(spark, sf_dir, "events")
    clicks = (ev.where(F.col("event_type") == "click")
              .select("event_id", "user_id", "ts"))
    purchases = (ev.where(F.col("event_type") == "purchase")
                 .select("user_id", "ts",
                         F.col("value").alias("pval"),
                         F.col("event_id").alias("pev")))
    out = asof_join(clicks, purchases, on="user_id", left_ts="ts",
                    right_ts="ts", right_payload=["pval"],
                    left_tiebreak="event_id", right_tiebreak="pev")
    return out.select("event_id", "user_id", "pval")


_ASOF_SQL = """
WITH clicks AS (SELECT event_id, user_id, ts FROM events
                WHERE event_type = 'click'),
purch AS (SELECT user_id, ts, value AS pval, event_id AS pev FROM events
          WHERE event_type = 'purchase')
SELECT c.event_id, c.user_id,
  (SELECT p.pval FROM purch p
   WHERE p.user_id = c.user_id AND p.ts <= c.ts
   ORDER BY p.ts DESC, p.pev DESC LIMIT 1) AS pval
FROM clicks c"""


def q_interval_counts(spark, sf_dir):
    """Range join via bin bucketing: per order, the number of lineitem
    shipments (corpus-wide) in the 30 days from the order date —
    temporal.interval_count_join (no nested-loop, one equi-shuffle)."""
    from credigraph_spark.temporal import interval_count_join

    epoch = F.to_date(F.lit("1970-01-01"))
    iv = _t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"),
        F.datediff(F.col("o_orderdate"), epoch).cast("long").alias("s"),
    ).withColumn("e", F.col("s") + 30)
    pts = _t(spark, sf_dir, "lineitem").select(
        F.datediff(F.col("l_shipdate"), epoch).cast("long").alias("d"))
    return interval_count_join(iv, pts, "okey", "s", "e", "d", bin_days=30)


_INTERVAL_COUNTS_SQL = """
WITH iv AS (SELECT o_orderkey AS okey,
                   date_diff('day', DATE '1970-01-01',
                             CAST(o_orderdate AS DATE)) AS s
            FROM orders),
pts AS (SELECT date_diff('day', DATE '1970-01-01',
                         CAST(l_shipdate AS DATE)) AS d FROM lineitem)
SELECT iv.okey, COUNT(pts.d) AS n_points
FROM iv LEFT JOIN pts ON pts.d >= iv.s AND pts.d < iv.s + 30
GROUP BY 1"""


def q_cohort_retention(spark, sf_dir):
    """Weekly cohort-retention matrix over the event stream
    (temporal.cohort_retention): three partial-aggregatable shuffles,
    string/integer outputs."""
    from credigraph_spark.temporal import cohort_retention

    return cohort_retention(_t(spark, sf_dir, "events"))


_COHORT_SQL = """
WITH ev AS (SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
            FROM events),
f AS (SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY 1)
SELECT strftime(f.cohort_week, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', f.cohort_week, ev.week) / 7 AS BIGINT)
         AS week_offset,
       COUNT(DISTINCT ev.user_id) AS n_active
FROM ev JOIN f USING (user_id) GROUP BY 1, 2"""


def q_line_dedup_stats(spark, sf_dir):
    """CCNet-style line-duplication profile of the documents table:
    per doc, how many of its distinct lines appear in >= 1 other doc
    (pipeline.textstats.line_dedup_stats — digest-keyed shuffle)."""
    from credigraph_spark.pipeline.textstats import line_dedup_stats

    return line_dedup_stats(_t(spark, sf_dir, "documents"))


_LINE_DEDUP_SQL = """
WITH lines AS (
  SELECT doc_id, trim(l) AS line
  FROM (SELECT doc_id, unnest(string_split(text, chr(10))) AS l
        FROM documents)
  WHERE length(trim(l)) > 0),
dl AS (SELECT DISTINCT doc_id, line FROM lines),
fr AS (SELECT line, COUNT(*) AS ndocs FROM dl GROUP BY 1),
pd AS (SELECT dl.doc_id, COUNT(*) AS n_lines,
              CAST(SUM(CASE WHEN fr.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_dup_lines
       FROM dl JOIN fr USING (line) GROUP BY 1)
SELECT d.doc_id, COALESCE(pd.n_lines, 0) AS n_lines,
       COALESCE(pd.n_dup_lines, 0) AS n_dup_lines,
       CASE WHEN COALESCE(pd.n_lines, 0) > 0
            THEN ROUND(pd.n_dup_lines / pd.n_lines, 8)
            ELSE 0.0 END AS dup_ratio
FROM documents d LEFT JOIN pd USING (doc_id)"""


def q_tfidf_top3(spark, sf_dir):
    """Top-3 TF-IDF terms per document (rank over ROUNDED score so a
    1-ulp ln() difference can never flip a rank across engines) —
    pipeline.textstats.tfidf_top_terms."""
    from credigraph_spark.pipeline.textstats import tfidf_top_terms

    docs = _t(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, n_docs=docs.count(), k=3)


_TFIDF_SQL = """
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks
       WHERE term <> '' GROUP BY 1, 2),
dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
sc AS (SELECT tf.doc_id, tf.term,
         ROUND(tf.tf * ln(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE)
                          / dfq.df), 6) AS tfidf
       FROM tf JOIN dfq USING (term)),
r AS (SELECT doc_id, term, tfidf,
        ROW_NUMBER() OVER (PARTITION BY doc_id
                           ORDER BY tfidf DESC, term ASC) AS rnk
      FROM sc)
SELECT doc_id, term, rnk, tfidf FROM r WHERE rnk <= 3"""


def q_weighted_sample(spark, sf_dir):
    """Deterministic Efraimidis-Spirakis weighted sample: 50 documents
    with inclusion odds proportional to n_chars, drawn from md5-derived
    uniforms so the sample is reproducible and oracle-checkable
    (pipeline.sampling.weighted_sample)."""
    from credigraph_spark.pipeline.sampling import weighted_sample

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return weighted_sample(docs, ["doc_id"], "n_chars", k=50, seed=42)


_WEIGHTED_SAMPLE_SQL = """
WITH d AS (SELECT doc_id, n_chars FROM documents
           WHERE n_chars IS NOT NULL AND n_chars > 0),
k AS (SELECT doc_id, n_chars,
        ROUND(ln((CAST(CAST(('0x' || substr(md5(doc_id || '|' || '42'), 1, 15))
                       AS UBIGINT) AS DOUBLE) + 1.0) / 1152921504606846976.0)
              / CAST(n_chars AS DOUBLE), 9) AS es_key
      FROM d)
SELECT doc_id, n_chars, es_key FROM k
ORDER BY es_key DESC, doc_id LIMIT 50"""


def q_pmi_pairs(spark, sf_dir):
    """Top-50 PMI collocations over the documents table (vocab cutoff
    100, pairs in >= 2 docs) — pipeline.textstats.pmi_top_pairs."""
    from credigraph_spark.pipeline.textstats import pmi_top_pairs

    docs = _t(spark, sf_dir, "documents")
    return pmi_top_pairs(docs, n_docs=docs.count(), vocab_k=100,
                         min_pair_docs=2, k=50)


_PMI_SQL = """
WITH toks AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
  FROM documents),
t2 AS (SELECT doc_id, term FROM toks WHERE term <> ''),
dfq AS (SELECT term, COUNT(*) AS df FROM t2 GROUP BY 1),
vocab AS (SELECT term, df FROM dfq ORDER BY df DESC, term ASC LIMIT 100),
dv AS (SELECT t2.doc_id, t2.term, vocab.df FROM t2 JOIN vocab USING (term)),
pairs AS (
  SELECT a.term AS a, b.term AS b, a.df AS ca, b.df AS cb,
         COUNT(*) AS cab
  FROM dv a JOIN dv b ON a.doc_id = b.doc_id AND a.term < b.term
  GROUP BY 1, 2, 3, 4
  HAVING COUNT(*) >= 2),
sc AS (SELECT a, b, cab,
         ROUND(ln(CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) * cab
                  / (ca * cb)), 6) AS pmi
       FROM pairs)
SELECT a, b, cab, pmi,
       CAST(ROW_NUMBER() OVER (ORDER BY pmi DESC, a ASC, b ASC) AS BIGINT)
         AS rnk
FROM sc QUALIFY rnk <= 50"""


def q_burst_days(spark, sf_dir):
    """Per-(event_type, day) burst z-scores from exact integer sums
    (variance = (n*sum_x2 - sum_x^2)/(n*(n-1)) — integer until ONE
    division) — temporal.burst_days."""
    from credigraph_spark.temporal import burst_days

    return burst_days(_t(spark, sf_dir, "events"))


_BURST_SQL = """
WITH daily AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         COUNT(*) AS n_events
  FROM events GROUP BY 1, 2),
st AS (
  SELECT event_type, COUNT(*) AS nd,
         CAST(SUM(n_events) AS BIGINT) AS sx,
         CAST(SUM(n_events * n_events) AS BIGINT) AS sx2
  FROM daily GROUP BY 1)
SELECT d.event_type, d.day, d.n_events,
       CASE WHEN st.nd > 1 AND (st.nd * st.sx2 - st.sx * st.sx) > 0
            THEN ROUND((d.n_events - st.sx / st.nd)
                       / sqrt((st.nd * st.sx2 - st.sx * st.sx)
                              / (st.nd * (st.nd - 1))), 6)
            ELSE 0.0 END AS z
FROM daily d JOIN st USING (event_type)"""


def q_mst_2round(spark, sf_dir):
    """Borůvka minimum spanning forest, 2 rounds, over the
    integer-weighted lineitem graph (w = per-edge quantity sum) —
    graph/mst.py. Struct-min (w, u, v) total order makes the picked
    forest deterministic and oracle-exact."""
    from credigraph_spark.graph.mst import boruvka_msf

    ew = (
        _t(spark, sf_dir, "lineitem")
        .where(F.col("l_partkey") != F.col("l_suppkey"))
        .groupBy(F.col("l_partkey").alias("src"),
                 F.col("l_suppkey").alias("dst"))
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("w"))
    )
    return boruvka_msf(ew, max_rounds=2)


def _mst_sql() -> str:
    """DuckDB mirror of graph/mst.py boruvka_msf(max_rounds=2): canonical
    min-weight undirected edges, per-component (w,u,v)-min pick, hash-min
    recursive contraction, second pick."""
    return """
WITH RECURSIVE
base AS (SELECT l_partkey AS src, l_suppkey AS dst,
                CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
         FROM lineitem WHERE l_partkey <> l_suppkey GROUP BY 1, 2),
canon AS MATERIALIZED (
  SELECT least(src, dst) AS u, greatest(src, dst) AS v, MIN(w) AS w
  FROM base GROUP BY 1, 2),
verts AS (SELECT u AS vid FROM canon UNION SELECT v FROM canon),
inc1 AS (SELECT u AS c, w, u, v FROM canon
         UNION ALL SELECT v AS c, w, u, v FROM canon),
sel1 AS MATERIALIZED (
  SELECT DISTINCT u, v, w FROM (
    SELECT c, u, v, w,
           ROW_NUMBER() OVER (PARTITION BY c ORDER BY w, u, v) AS rn
    FROM inc1) WHERE rn = 1),
und1 AS MATERIALIZED (SELECT u AS src, v AS dst FROM sel1
                      UNION ALL SELECT v, u FROM sel1),
r1(vid, label) AS (
  SELECT vid, vid FROM verts
  UNION
  SELECT und1.dst, r1.label FROM r1 JOIN und1 ON und1.src = r1.vid
  WHERE r1.label < und1.dst
),
c1 AS MATERIALIZED (SELECT vid, MIN(label) AS comp FROM r1 GROUP BY vid),
ce2 AS (SELECT a.comp AS cu, b.comp AS cv, canon.w, canon.u, canon.v
        FROM canon JOIN c1 a ON canon.u = a.vid
                   JOIN c1 b ON canon.v = b.vid
        WHERE a.comp <> b.comp),
inc2 AS (SELECT cu AS c, w, u, v FROM ce2
         UNION ALL SELECT cv AS c, w, u, v FROM ce2),
sel2 AS (
  SELECT DISTINCT u, v, w FROM (
    SELECT c, u, v, w,
           ROW_NUMBER() OVER (PARTITION BY c ORDER BY w, u, v) AS rn
    FROM inc2) WHERE rn = 1)
SELECT u, v, w FROM sel1 UNION ALL SELECT u, v, w FROM sel2"""


def q_cms_heavy_hitters(spark, sf_dir):
    """Count-min sketch (4x512, md5 hashing) point estimates vs exact
    counts for the corpus's top-20 terms — the sketch grid itself is
    deterministic, so BOTH the estimates and the overestimate property
    are oracle-checked (pipeline/sketch.py)."""
    from credigraph_spark.pipeline.sketch import cms_build, cms_estimate

    occ = (_t(spark, sf_dir, "documents")
           .select(F.explode(F.split(F.lower(F.col("text")), "[^a-z0-9]+"))
                   .alias("term"))
           .where(F.col("term") != ""))
    exact = occ.groupBy("term").agg(F.count("*").alias("exact_n"))
    top = exact.orderBy(F.col("exact_n").desc(), F.col("term").asc()).limit(20)
    cms = cms_build(occ, depth=4, width=512, seed=7)
    est = cms_estimate(cms, top.select("term"), depth=4, width=512, seed=7)
    return top.join(est, "term").select("term", "exact_n", "cms_n")


def _cms_sql(depth: int = 4, width: int = 512, seed: int = 7,
             k: int = 20) -> str:
    def col_expr(r: int) -> str:
        return (f"CAST(CAST(('0x' || substr(md5('{seed}:{r}:' || term), 1, 15))"
                f" AS UBIGINT) AS BIGINT) % {width}")
    build = "\n    UNION ALL ".join(
        f"SELECT {r} AS row, {col_expr(r)} AS col FROM occ"
        for r in range(depth))
    probes = "\n    UNION ALL ".join(
        f"SELECT term, {r} AS row, {col_expr(r)} AS col FROM top"
        for r in range(depth))
    return f"""
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
  FROM documents),
occ AS (SELECT term FROM toks WHERE term <> ''),
exact AS (SELECT term, COUNT(*) AS exact_n FROM occ GROUP BY 1),
top AS (SELECT term, exact_n FROM exact
        ORDER BY exact_n DESC, term ASC LIMIT {k}),
cells AS (
  SELECT row, col, COUNT(*) AS cnt FROM (
    {build}
  ) GROUP BY 1, 2),
probes AS (
    {probes}
)
SELECT p.term, t.exact_n, MIN(COALESCE(c.cnt, 0)) AS cms_n
FROM probes p
JOIN top t ON t.term = p.term
LEFT JOIN cells c ON c.row = p.row AND c.col = p.col
GROUP BY 1, 2"""


def q_coloring(spark, sf_dir):
    """Greedy Luby coloring (3 colors x 3 MIS rounds, md5 priorities) —
    every color class an independent set; color 0 = outside the budget
    (graph/coloring.py)."""
    from credigraph_spark.graph.coloring import luby_coloring

    return luby_coloring(_edges(spark, sf_dir), n_colors=3, rounds=3, seed=7)


def _coloring_sql(n_colors: int = 3, rounds: int = 3, seed: int = 7) -> str:
    """DuckDB mirror of graph/coloring.py: per color a fresh md5 priority
    draw and an unrolled Luby m/r/a chain; OUT + still-active vertices
    return to the pool for the next color."""
    parts = [
        f"WITH und AS MATERIALIZED ({_UND_SQL})",
        f"rem0 AS MATERIALIZED (SELECT src AS vid FROM und GROUP BY 1)",
    ]
    for c in range(1, n_colors + 1):
        parts.append(f"""a{c}_0 AS MATERIALIZED (
          SELECT vid, md5('{seed}:{c}:' || CAST(vid AS VARCHAR)) AS p
          FROM rem{c - 1})""")
        for i in range(1, rounds + 1):
            parts.append(f"""m{c}_{i} AS MATERIALIZED (
              SELECT a.vid FROM a{c}_{i - 1} a LEFT JOIN (
                SELECT u.src AS vid, MIN(b.p) AS mp
                FROM und u JOIN a{c}_{i - 1} b ON b.vid = u.dst
                GROUP BY u.src) n
              ON n.vid = a.vid
              WHERE a.p < COALESCE(n.mp, 'g'))""")
            parts.append(f"""r{c}_{i} AS MATERIALIZED (
              SELECT DISTINCT u.dst AS vid
              FROM und u JOIN m{c}_{i} w ON w.vid = u.src
              WHERE u.dst IN (SELECT vid FROM a{c}_{i - 1})
                AND u.dst NOT IN (SELECT vid FROM m{c}_{i}))""")
            parts.append(f"""a{c}_{i} AS MATERIALIZED (
              SELECT * FROM a{c}_{i - 1}
              WHERE vid NOT IN (SELECT vid FROM m{c}_{i})
                AND vid NOT IN (SELECT vid FROM r{c}_{i}))""")
        carry = " UNION ALL ".join(
            [f"SELECT vid FROM r{c}_{i}" for i in range(1, rounds + 1)]
            + [f"SELECT vid FROM a{c}_{rounds}"])
        parts.append(
            f"rem{c} AS MATERIALIZED (SELECT DISTINCT vid FROM ({carry}))")
    color_u = " UNION ALL ".join(
        f"SELECT vid, {c} AS color FROM m{c}_{i}"
        for c in range(1, n_colors + 1) for i in range(1, rounds + 1))
    return ",\n".join(parts) + f"""
        SELECT vid, color FROM ({color_u})
        UNION ALL SELECT vid, 0 AS color FROM rem{n_colors}"""


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full link-graph slice on sf0.001 — extract edge table from
    lineitem, run PageRank to convergence, return top-20 vertices by rank
    joined with degrees (SURVEY.md §7 M2)."""
    from credigraph_spark.analytics import top_k_by
    from credigraph_spark.graph import pagerank
    from credigraph_spark.graph.adjacency import degrees

    edges = _edges(spark, SF_SMOKE)
    ranks, _ = pagerank(edges, max_iter=30)
    enriched = ranks.join(degrees(edges), "vid", "left")
    return top_k_by(enriched, "rank", k=20, tiebreak="vid")



def q_zipf_fit(spark, sf_dir):
    """Zipf's-law fit over the corpus token-frequency head (top-1000
    ranks): alpha/intercept/r2 + corpus n_tokens/n_types — the
    vocabulary-health diagnostic of LLM corpus curation
    (pipeline.textstats.zipf_fit: one counting shuffle, bounded top-R
    cut, totals as an Observation on the same pass)."""
    from credigraph_spark.pipeline.textstats import zipf_fit

    return zipf_fit(_t(spark, sf_dir, "documents"), top_r=1000)


def _zipf_sql(top_r: int = 1000) -> str:
    """DuckDB mirror of q_zipf_fit: same tokenization, same (freq desc,
    term asc) head order, same closed-form least squares. Integer sums
    CAST to BIGINT (DuckDB SUM(BIGINT) is HUGEINT — the score_2round
    lesson)."""
    return f"""
WITH tf AS MATERIALIZED (
  SELECT term, COUNT(*) AS freq FROM (
    SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
    FROM documents)
  WHERE term <> '' GROUP BY 1),
tot AS (SELECT CAST(SUM(freq) AS BIGINT) AS n_tokens,
               COUNT(*) AS n_types FROM tf),
head AS (SELECT freq,
                ROW_NUMBER() OVER (ORDER BY freq DESC, term ASC) AS rnk
         FROM tf QUALIFY rnk <= {top_r}),
xy AS (SELECT ln(CAST(rnk AS DOUBLE)) AS x,
              ln(CAST(freq AS DOUBLE)) AS y FROM head),
fit AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, COUNT(*) AS r_fit,
               SUM(x) AS sx, SUM(y) AS sy, SUM(x*x) AS sxx,
               SUM(x*y) AS sxy, SUM(y*y) AS syy FROM xy)
SELECT tot.n_tokens, tot.n_types, fit.r_fit,
       ROUND(-((sxy - sx*sy/n) / (sxx - sx*sx/n)), 6) AS alpha,
       ROUND((sy - ((sxy - sx*sy/n) / (sxx - sx*sx/n)) * sx) / n, 6)
         AS intercept,
       ROUND((sxy - sx*sy/n) * (sxy - sx*sy/n)
             / ((sxx - sx*sx/n) * (syy - sy*sy/n)), 6) AS r2
FROM tot, fit
"""


def q_heaps_fit(spark, sf_dir):
    """Heaps'-law fit: ln(distinct types) on ln(tokens) across docs —
    vocabulary-growth exponent beta; a collapsed beta flags template/
    duplicated content before any pairwise dedup runs
    (pipeline.textstats.heaps_fit: per-row array folds + ONE agg)."""
    from credigraph_spark.pipeline.textstats import heaps_fit

    return heaps_fit(_t(spark, sf_dir, "documents"))


def _heaps_sql() -> str:
    return """
WITH per AS MATERIALIZED (
  SELECT len(toks) AS m, len(list_distinct(toks)) AS v FROM (
    SELECT list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                       t -> t <> '') AS toks FROM documents)
  WHERE len(toks) >= 2),
xy AS (SELECT ln(CAST(m AS DOUBLE)) AS x, ln(CAST(v AS DOUBLE)) AS y
       FROM per),
fit AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, COUNT(*) AS n_docs,
               SUM(x) AS sx, SUM(y) AS sy, SUM(x*x) AS sxx,
               SUM(x*y) AS sxy, SUM(y*y) AS syy FROM xy)
SELECT n_docs,
       ROUND((sxy - sx*sy/n) / (sxx - sx*sx/n), 6) AS beta,
       ROUND((sy - ((sxy - sx*sy/n) / (sxx - sx*sx/n)) * sx) / n, 6)
         AS ln_k,
       ROUND((sxy - sx*sy/n) * (sxy - sx*sy/n)
             / ((sxx - sx*sx/n) * (syy - sy*sy/n)), 6) AS r2
FROM fit
"""



def q_rfm_segments(spark, sf_dir):
    """RFM customer segmentation over orders: recency/frequency/monetary
    quartile scores under deterministic equal-size rank binning
    (analytics.rfm_segments — three O3 range-partition rankings, no
    global window; monetary rounded before ranking)."""
    from credigraph_spark.analytics import rfm_segments

    return rfm_segments(_t(spark, sf_dir, "orders"))


def _rfm_sql(n_bins: int = 4) -> str:
    """DuckDB mirror of q_rfm_segments: same rollup, same (metric,
    customer) rank order, same equal-size bin formula."""
    b = n_bins
    return f"""
WITH base AS (SELECT o_custkey AS customer, CAST(o_orderdate AS DATE) AS d,
                     CAST(o_totalprice AS DOUBLE) AS a FROM orders),
mx AS (SELECT MAX(d) AS md FROM base),
per AS MATERIALIZED (
  SELECT customer,
         CAST(date_diff('day', MAX(d), (SELECT md FROM mx)) AS INTEGER)
           AS recency_days,
         COUNT(*) AS frequency,
         ROUND(SUM(a), 2) AS monetary
  FROM base GROUP BY 1),
nn AS (SELECT COUNT(*) AS n FROM per),
rr AS (SELECT customer,
              ROW_NUMBER() OVER (ORDER BY recency_days, customer) AS r
       FROM per),
fr AS (SELECT customer,
              ROW_NUMBER() OVER (ORDER BY frequency, customer) AS r
       FROM per),
mr AS (SELECT customer,
              ROW_NUMBER() OVER (ORDER BY monetary, customer) AS r
       FROM per),
scored AS (
  SELECT p.customer, p.recency_days, p.frequency, p.monetary,
         CAST({b} + 1 - (1 + FLOOR({b} * (rr.r - 1) / nn.n)) AS INTEGER)
           AS r_score,
         CAST(1 + FLOOR({b} * (fr.r - 1) / nn.n) AS INTEGER) AS f_score,
         CAST(1 + FLOOR({b} * (mr.r - 1) / nn.n) AS INTEGER) AS m_score
  FROM per p
  JOIN rr ON rr.customer = p.customer
  JOIN fr ON fr.customer = p.customer
  JOIN mr ON mr.customer = p.customer
  CROSS JOIN nn)
SELECT customer, recency_days, frequency, monetary, r_score, f_score,
       m_score,
       CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
         || CAST(m_score AS VARCHAR) AS segment
FROM scored
"""



def q_fiedler(spark, sf_dir):
    """Approximate Fiedler vector by deflated power iteration on
    2I − L_norm (graph.spreading.fiedler_vector): 3 rounds, the global
    spectral-bisection coordinate. 8dp-rounded."""
    from credigraph_spark.graph import fiedler_vector

    return fiedler_vector(_edges(spark, sf_dir), max_iter=3,
                          round_digits=8)


def _fiedler_sql(rounds: int = 3) -> str:
    """DuckDB mirror of q_fiedler: identical deflated-power arithmetic —
    per round y = x + rs_v·Σ(x_u·rs_u), c = y·v1, x' = (y − c·v1)
    / sqrt(y·y − c²), with the same deflate-normalize applied to the
    md5-fraction init."""
    parts = [
        f"WITH und AS MATERIALIZED ({_UND_SQL})",
        "deg AS MATERIALIZED (SELECT dst AS vid, COUNT(*) AS deg "
        "FROM und GROUP BY 1)",
        "s2m AS (SELECT CAST(SUM(deg) AS DOUBLE) AS t FROM deg)",
        "vert AS MATERIALIZED (SELECT vid, 1.0 / sqrt(deg) AS rs, "
        "sqrt(deg) / sqrt((SELECT t FROM s2m)) AS v1 FROM deg)",
        "xr AS (SELECT vid, rs, v1, "
        "CAST(CAST(('0x' || substr(md5('fiedler:' || vid), 1, 15)) "
        "AS UBIGINT) AS DOUBLE) / 1152921504606846976.0 * 2.0 - 1.0 "
        "AS y FROM vert)",
        "sr AS (SELECT SUM(y * v1) AS c, SUM(y * y) AS s2 FROM xr)",
        "x0 AS MATERIALIZED (SELECT vid, rs, v1, "
        "(y - (SELECT c FROM sr) * v1) "
        "/ sqrt((SELECT s2 FROM sr) - (SELECT c FROM sr) "
        "* (SELECT c FROM sr)) AS x FROM xr)",
    ]
    for r in range(rounds):
        parts.append(
            f"m{r} AS MATERIALIZED (SELECT und.dst AS vid, "
            f"SUM(p.x * vv.rs) AS m "
            f"FROM und JOIN x{r} p ON p.vid = und.src "
            f"JOIN vert vv ON vv.vid = und.src GROUP BY 1)")
        parts.append(
            f"y{r} AS MATERIALIZED (SELECT p.vid, p.rs, p.v1, "
            f"p.x + p.rs * m.m AS y FROM x{r} p "
            f"JOIN m{r} m ON m.vid = p.vid)")
        parts.append(
            f"s{r} AS (SELECT SUM(y * v1) AS c, SUM(y * y) AS s2 "
            f"FROM y{r})")
        parts.append(
            f"x{r+1} AS MATERIALIZED (SELECT vid, rs, v1, "
            f"(y - (SELECT c FROM s{r}) * v1) "
            f"/ sqrt((SELECT s2 FROM s{r}) - (SELECT c FROM s{r}) "
            f"* (SELECT c FROM s{r})) AS x FROM y{r})")
    return ",\n".join(parts) + f"""
SELECT vid, ROUND(x, 8) AS f FROM x{rounds}
"""



def q_temporal_triangles(spark, sf_dir):
    """Paranjape-Benson-Leskovec delta-windowed triangle motifs over
    first-contact lineitem edges timestamped by l_shipdate (epoch days,
    delta = 30): cyclic vs feed-forward closes
    (graph.temporal_motifs.temporal_triangles)."""
    from credigraph_spark.graph.temporal_motifs import temporal_triangles

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst"),
        F.datediff(F.col("l_shipdate").cast("date"),
                   F.lit("1970-01-01").cast("date")).alias("ts"))
    return temporal_triangles(li, delta=30)


def _temporal_triangles_sql(delta: int = 30) -> str:
    """DuckDB mirror: same first-contact collapse, same strict-order
    delta-window joins."""
    return f"""
WITH e AS MATERIALIZED (
  SELECT l_partkey AS u, l_suppkey AS v,
         MIN(date_diff('day', DATE '1970-01-01',
                       CAST(l_shipdate AS DATE))) AS t
  FROM lineitem
  WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
    AND l_partkey <> l_suppkey
  GROUP BY 1, 2),
wedge AS MATERIALIZED (
  SELECT a.u, a.v, b.v AS w, a.t AS t1, b.t AS t2
  FROM e a JOIN e b ON b.u = a.v
  WHERE b.v <> a.u AND b.t > a.t AND b.t <= a.t + {delta}),
cyc AS (SELECT COUNT(*) AS n_cyclic FROM wedge
        JOIN e c ON c.u = wedge.w AND c.v = wedge.u
        WHERE c.t > wedge.t2 AND c.t <= wedge.t1 + {delta}),
ff AS (SELECT COUNT(*) AS n_feedforward FROM wedge
       JOIN e c ON c.u = wedge.u AND c.v = wedge.w
       WHERE c.t > wedge.t2 AND c.t <= wedge.t1 + {delta}),
nw AS (SELECT COUNT(*) AS n_wedges FROM wedge)
SELECT nw.n_wedges, cyc.n_cyclic, ff.n_feedforward FROM nw, cyc, ff
"""



def q_joint_degree_matrix(spark, sf_dir):
    """Log2-bucketed joint degree matrix: edges between (out-deg bucket,
    in-deg bucket) cells — the 2-D refinement of scalar assortativity
    (analytics.joint_degree_matrix)."""
    from credigraph_spark.analytics import joint_degree_matrix

    return joint_degree_matrix(_edges(spark, sf_dir))


_JDM_SQL = f"""
WITH e AS MATERIALIZED ({_E_SQL}),
od AS (SELECT src, COUNT(*) AS od FROM e GROUP BY 1),
idg AS (SELECT dst, COUNT(*) AS id FROM e GROUP BY 1)
SELECT CAST(FLOOR(LOG2(od.od)) AS INTEGER) AS src_bucket,
       CAST(FLOOR(LOG2(idg.id)) AS INTEGER) AS dst_bucket,
       COUNT(*) AS n_edges
FROM e JOIN od ON od.src = e.src JOIN idg ON idg.dst = e.dst
GROUP BY 1, 2
"""


def q_eigen_weighted(spark, sf_dir):
    """Weighted eigenvector centrality over l_quantity-weighted edges
    (graph.spreading.eigenvector_centrality_weighted), 3 normalize
    rounds, 8dp-rounded."""
    from credigraph_spark.graph.spreading import (
        eigenvector_centrality_weighted)

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst"),
        F.col("l_quantity").cast("double").alias("w"))
    return eigenvector_centrality_weighted(li, "w", max_iter=3,
                                           round_digits=8)


def _eigen_weighted_sql(rounds: int = 3) -> str:
    base = ("SELECT l_partkey AS src, l_suppkey AS dst, "
            "CAST(l_quantity AS DOUBLE) AS w FROM lineitem "
            "WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL "
            "AND l_partkey <> l_suppkey")
    parts = [
        f"WITH raw AS MATERIALIZED ({base})",
        "und AS MATERIALIZED (SELECT src, dst, SUM(w) AS w FROM "
        "(SELECT src, dst, w FROM raw UNION ALL "
        "SELECT dst, src, w FROM raw) GROUP BY 1, 2)",
        "x0 AS MATERIALIZED (SELECT DISTINCT dst AS vid, 1.0 AS x "
        "FROM und)",
    ]
    for r in range(rounds):
        parts.append(
            f"s{r} AS MATERIALIZED (SELECT und.dst AS vid, "
            f"SUM(p.x * und.w) AS s FROM und JOIN x{r} p "
            f"ON p.vid = und.src GROUP BY 1)")
        parts.append(f"n{r} AS (SELECT sqrt(SUM(s * s)) AS n FROM s{r})")
        parts.append(
            f"x{r+1} AS MATERIALIZED (SELECT vid, "
            f"s / (SELECT n FROM n{r}) AS x FROM s{r})")
    return ",\n".join(parts) + f"""
SELECT vid, ROUND(x, 8) AS x FROM x{rounds}
"""



def q_minhash_calibration(spark, sf_dir):
    """MinHash-vs-exact Jaccard calibration over the LSH candidate
    pairs (pipeline.dedup.minhash_calibration, k=4): the dedup
    family's quality gate — ann_recall's sibling."""
    from credigraph_spark.pipeline.dedup import minhash_calibration

    return minhash_calibration(_t(spark, sf_dir, "documents"),
                               num_hashes=4)


def _minhash_calibration_sql(k: int = 4) -> str:
    eqs = " + ".join(
        f"(CASE WHEN sa.mh_{i} = sb.mh_{i} THEN 1 ELSE 0 END)"
        for i in range(k))
    return (f"WITH {_SHINGLES_SQL},\n"
            "x AS (SELECT id, unnest(sh_set) AS sh FROM sets),\n"
            "sigs AS (SELECT id, MIN(md5('salt0:' || sh)) AS mh_0, "
            "MIN(md5('salt1:' || sh)) AS mh_1, "
            "MIN(md5('salt2:' || sh)) AS mh_2, "
            "MIN(md5('salt3:' || sh)) AS mh_3 FROM x GROUP BY id),\n"
            "bands AS (SELECT id, md5(concat_ws('|', '0', mh_0, mh_1)) "
            "AS band_val, 0 AS band_idx FROM sigs UNION ALL "
            "SELECT id, md5(concat_ws('|', '1', mh_2, mh_3)), 1 "
            "FROM sigs),\n"
            "pairs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b "
            "FROM bands a JOIN bands b ON a.band_idx = b.band_idx "
            "AND a.band_val = b.band_val AND a.id < b.id),\n"
            f"est AS (SELECT p.id_a, p.id_b, ({eqs}) / {float(k)} AS est "
            "FROM pairs p JOIN sigs sa ON sa.id = p.id_a "
            "JOIN sigs sb ON sb.id = p.id_b),\n"
            "sz AS (SELECT id, len(sh_set) AS n FROM sets),\n"
            "inter AS (SELECT p.id_a, p.id_b, COUNT(*) AS i FROM pairs p "
            "JOIN x xa ON xa.id = p.id_a "
            "JOIN x xb ON xb.id = p.id_b AND xb.sh = xa.sh GROUP BY 1, 2)\n"
            "SELECT e.id_a, e.id_b, ROUND(e.est, 6) AS est_jaccard, "
            "ROUND(CAST(COALESCE(i.i, 0) AS DOUBLE) "
            "/ (sa.n + sb.n - COALESCE(i.i, 0)), 6) AS exact_jaccard, "
            "ROUND(ABS(e.est - COALESCE(i.i, 0) "
            "/ (sa.n + sb.n - COALESCE(i.i, 0))), 6) AS abs_err "
            "FROM est e LEFT JOIN inter i "
            "ON i.id_a = e.id_a AND i.id_b = e.id_b "
            "JOIN sz sa ON sa.id = e.id_a JOIN sz sb ON sb.id = e.id_b")



def q_clustering_null(spark, sf_dir):
    """Measured transitivity vs the configuration-model expectation
    C_cm = (k2-k1)^2/(N*k1^3) + small-world ratio
    (graph.triangles.clustering_null_model)."""
    from credigraph_spark.graph.triangles import clustering_null_model

    return clustering_null_model(_edges(spark, sf_dir))


_CLUSTERING_NULL_SQL = f"""
WITH cnd AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
             FROM ({_E_SQL})),
tri AS (SELECT COUNT(*) AS t FROM cnd e1
        JOIN cnd e2 ON e1.a = e2.a AND e1.b < e2.b
        JOIN cnd e3 ON e3.a = e1.b AND e3.b = e2.b),
deg AS (SELECT vid, COUNT(*) AS deg FROM
        (SELECT a AS vid FROM cnd UNION ALL SELECT b FROM cnd)
        GROUP BY vid),
w AS (SELECT CAST(SUM(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges
      FROM deg),
tr AS (SELECT CASE WHEN w.n_wedges > 0
               THEN ROUND(3.0 * tri.t / w.n_wedges, 8)
               ELSE 0.0 END AS transitivity,
              CAST(tri.t AS BIGINT) AS n_triangles FROM tri, w),
mom AS (SELECT COUNT(*) AS n_vertices,
               CAST(SUM(deg) AS DOUBLE) / COUNT(*) AS k1,
               CAST(SUM(CAST(deg AS HUGEINT) * deg) AS DOUBLE)
                 / COUNT(*) AS k2
        FROM deg)
SELECT mom.n_vertices, tr.n_triangles, tr.transitivity,
       ROUND(mom.k1, 8) AS mean_deg,
       ROUND((mom.k2 - mom.k1) * (mom.k2 - mom.k1)
             / (mom.n_vertices * mom.k1 * mom.k1 * mom.k1), 8)
         AS c_expected,
       CASE WHEN (mom.k2 - mom.k1) * (mom.k2 - mom.k1)
                 / (mom.n_vertices * mom.k1 * mom.k1 * mom.k1) > 0
            THEN ROUND(tr.transitivity
                       / ((mom.k2 - mom.k1) * (mom.k2 - mom.k1)
                          / (mom.n_vertices * mom.k1 * mom.k1
                             * mom.k1)), 6)
            ELSE 0.0 END AS small_world_ratio
FROM mom, tr
"""



def q_chi2_terms(spark, sf_dir):
    """Top-5 language-discriminative terms by chi-square over the
    vocab-200 presence contingencies
    (pipeline.textstats.chi2_discriminative_terms)."""
    from credigraph_spark.pipeline.textstats import (
        chi2_discriminative_terms)

    return chi2_discriminative_terms(_t(spark, sf_dir, "documents"),
                                     vocab_k=200, k=5)


def _chi2_terms_sql(vocab_k: int = 200, k: int = 5) -> str:
    return f"""
WITH toks AS MATERIALIZED (
  SELECT DISTINCT doc_id, lang AS cls, term FROM (
    SELECT doc_id, lang,
           unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
    FROM documents)
  WHERE term <> ''),
dfreq AS (SELECT term, COUNT(*) AS df FROM toks GROUP BY 1),
vocab AS (SELECT term, df FROM dfreq ORDER BY df DESC, term LIMIT {vocab_k}),
tv AS (SELECT t.cls, t.term, v.df FROM toks t JOIN vocab v USING (term)),
nd AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS n FROM documents),
ncls AS (SELECT lang AS cls, COUNT(DISTINCT doc_id) AS n_cls
         FROM documents GROUP BY 1),
ct AS (SELECT tv.cls, tv.term, tv.df, COUNT(*) AS a, ncls.n_cls
       FROM tv JOIN ncls ON ncls.cls = tv.cls GROUP BY 1, 2, 3, 5),
scored AS (
  SELECT cls AS lang, term, a AS n_class_with_term,
         CASE WHEN ((CAST(a AS DOUBLE) + (df - CAST(a AS DOUBLE)))
                    * ((n_cls - CAST(a AS DOUBLE))
                       + ((SELECT n FROM nd) - df - n_cls
                          + CAST(a AS DOUBLE)))
                    * (CAST(a AS DOUBLE) + (n_cls - CAST(a AS DOUBLE)))
                    * ((df - CAST(a AS DOUBLE))
                       + ((SELECT n FROM nd) - df - n_cls
                          + CAST(a AS DOUBLE)))) > 0
              THEN ROUND((SELECT n FROM nd)
                   * (CAST(a AS DOUBLE)
                      * ((SELECT n FROM nd) - df - n_cls
                         + CAST(a AS DOUBLE))
                      - (df - CAST(a AS DOUBLE))
                        * (n_cls - CAST(a AS DOUBLE)))
                   * (CAST(a AS DOUBLE)
                      * ((SELECT n FROM nd) - df - n_cls
                         + CAST(a AS DOUBLE))
                      - (df - CAST(a AS DOUBLE))
                        * (n_cls - CAST(a AS DOUBLE)))
                   / ((CAST(a AS DOUBLE) + (df - CAST(a AS DOUBLE)))
                      * ((n_cls - CAST(a AS DOUBLE))
                         + ((SELECT n FROM nd) - df - n_cls
                            + CAST(a AS DOUBLE)))
                      * (CAST(a AS DOUBLE) + (n_cls - CAST(a AS DOUBLE)))
                      * ((df - CAST(a AS DOUBLE))
                         + ((SELECT n FROM nd) - df - n_cls
                            + CAST(a AS DOUBLE)))), 6)
              ELSE 0.0 END AS chi2
  FROM ct)
SELECT lang, term, n_class_with_term, chi2,
       ROW_NUMBER() OVER (PARTITION BY lang
                          ORDER BY chi2 DESC, term ASC) AS rnk
FROM scored QUALIFY rnk <= {k}
"""



def q_split_leakage(spark, sf_dir):
    """Near-dup candidate pairs crossing the train/val/test hash split
    (pipeline.dedup.split_leakage, k=4 LSH + the hash_split md5
    fraction): the within-corpus contamination screen."""
    from credigraph_spark.pipeline.dedup import split_leakage

    return split_leakage(_t(spark, sf_dir, "documents"),
                         {"train": 0.8, "val": 0.1, "test": 0.1},
                         num_hashes=4, seed=7)


def _split_leakage_sql() -> str:
    """_lsh_pairs_sql chain + _HASH_SPLIT_SQL's fraction CASE + the
    bounded split-pair rollup."""
    return (f"WITH {_SHINGLES_SQL},\n"
            "x AS (SELECT id, unnest(sh_set) AS sh FROM sets),\n"
            "sigs AS (SELECT id, MIN(md5('salt0:' || sh)) AS mh_0, "
            "MIN(md5('salt1:' || sh)) AS mh_1, "
            "MIN(md5('salt2:' || sh)) AS mh_2, "
            "MIN(md5('salt3:' || sh)) AS mh_3 FROM x GROUP BY id),\n"
            "bands AS (SELECT id, md5(concat_ws('|', '0', mh_0, mh_1)) "
            "AS band_val, 0 AS band_idx FROM sigs UNION ALL "
            "SELECT id, md5(concat_ws('|', '1', mh_2, mh_3)), 1 "
            "FROM sigs),\n"
            "pairs AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b "
            "FROM bands a JOIN bands b ON a.band_idx = b.band_idx "
            "AND a.band_val = b.band_val AND a.id < b.id),\n"
            "sp AS (SELECT doc_id, CASE WHEN frac < 0.8 THEN 'train' "
            "WHEN frac < 0.9 THEN 'val' ELSE 'test' END AS split FROM "
            "(SELECT doc_id, "
            "CAST(CAST(('0x' || substr(md5(doc_id || '|' || '7'), 1, 15)) "
            "AS UBIGINT) AS DOUBLE) / 1152921504606846976.0 AS frac "
            "FROM documents) f)\n"
            "SELECT LEAST(sa.split, sb.split) AS split_a, "
            "GREATEST(sa.split, sb.split) AS split_b, "
            "COUNT(*) AS n_pairs, "
            "CAST(SUM(CASE WHEN sa.split <> sb.split THEN 1 ELSE 0 END) "
            "AS BIGINT) AS n_cross "
            "FROM pairs p JOIN sp sa ON sa.doc_id = p.id_a "
            "JOIN sp sb ON sb.doc_id = p.id_b GROUP BY 1, 2")



def q_spectral_sweep(spark, sf_dir):
    """Global Fiedler sweep cut: conductance curve over the top-100
    prefix of the rounded Fiedler ordering
    (graph.spreading.spectral_sweep_cut — the shared conductance_sweep
    engine with ppr_sweep)."""
    from credigraph_spark.graph.spreading import spectral_sweep_cut

    return spectral_sweep_cut(_edges(spark, sf_dir), max_iter=3,
                              top_m=100)


def _spectral_sweep_sql(rounds: int = 3, top_m: int = 100) -> str:
    """_fiedler_sql's deflated-power chain + _ppr_sweep_sql's sweep."""
    parts = [
        f"""WITH cnd AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM ({_E_SQL}))""",
        "und AS MATERIALIZED (SELECT a AS src, b AS dst FROM cnd "
        "UNION ALL SELECT b, a FROM cnd)",
        "deg AS MATERIALIZED (SELECT dst AS vid, COUNT(*) AS deg "
        "FROM und GROUP BY 1)",
        "s2m AS (SELECT CAST(SUM(deg) AS DOUBLE) AS t FROM deg)",
        "vert AS MATERIALIZED (SELECT vid, 1.0 / sqrt(deg) AS rs, "
        "sqrt(deg) / sqrt((SELECT t FROM s2m)) AS v1 FROM deg)",
        "xr AS (SELECT vid, rs, v1, "
        "CAST(CAST(('0x' || substr(md5('fiedler:' || vid), 1, 15)) "
        "AS UBIGINT) AS DOUBLE) / 1152921504606846976.0 * 2.0 - 1.0 "
        "AS y FROM vert)",
        "sr AS (SELECT SUM(y * v1) AS c, SUM(y * y) AS s2 FROM xr)",
        "x0 AS MATERIALIZED (SELECT vid, rs, v1, "
        "(y - (SELECT c FROM sr) * v1) "
        "/ sqrt((SELECT s2 FROM sr) - (SELECT c FROM sr) "
        "* (SELECT c FROM sr)) AS x FROM xr)",
    ]
    for r in range(rounds):
        parts.append(
            f"m{r} AS MATERIALIZED (SELECT und.dst AS vid, "
            f"SUM(p.x * vv.rs) AS m "
            f"FROM und JOIN x{r} p ON p.vid = und.src "
            f"JOIN vert vv ON vv.vid = und.src GROUP BY 1)")
        parts.append(
            f"y{r} AS MATERIALIZED (SELECT p.vid, p.rs, p.v1, "
            f"p.x + p.rs * m.m AS y FROM x{r} p "
            f"JOIN m{r} m ON m.vid = p.vid)")
        parts.append(
            f"s{r} AS (SELECT SUM(y * v1) AS c, SUM(y * y) AS s2 "
            f"FROM y{r})")
        parts.append(
            f"x{r+1} AS MATERIALIZED (SELECT vid, rs, v1, "
            f"(y - (SELECT c FROM s{r}) * v1) "
            f"/ sqrt((SELECT s2 FROM s{r}) - (SELECT c FROM s{r}) "
            f"* (SELECT c FROM s{r})) AS x FROM y{r})")
    parts.append(
        f"k AS MATERIALIZED (SELECT f.vid, deg.deg, ROUND(f.x, 8) AS key "
        f"FROM x{rounds} f JOIN deg ON deg.vid = f.vid)")
    parts.append(f"""top AS MATERIALIZED (
  SELECT vid, deg, key, rnk FROM (
    SELECT k.*, CAST(ROW_NUMBER() OVER (ORDER BY key DESC, vid) AS BIGINT)
           AS rnk FROM k) WHERE rnk <= {top_m})""")
    parts.append("""intl AS (
  SELECT GREATEST(ta.rnk, tb.rnk) AS rnk, COUNT(*) AS int_at
  FROM cnd JOIN top ta ON ta.vid = cnd.a JOIN top tb ON tb.vid = cnd.b
  GROUP BY 1)""")
    parts.append("m AS (SELECT COUNT(*) AS m FROM cnd)")
    parts.append("""c1 AS (
  SELECT t.rnk, t.vid,
         CAST(SUM(t.deg) OVER (ORDER BY t.rnk) AS BIGINT) AS vol,
         CAST(SUM(COALESCE(i.int_at, 0)) OVER (ORDER BY t.rnk) AS BIGINT)
           AS icum
  FROM top t LEFT JOIN intl i ON i.rnk = t.rnk)""")
    return ",\n".join(parts) + """
SELECT rnk, vid, vol, vol - 2 * icum AS cut_edges,
       CASE WHEN LEAST(vol, 2 * (SELECT m FROM m) - vol) > 0
            THEN ROUND((vol - 2 * icum) * 1.0
                       / LEAST(vol, 2 * (SELECT m FROM m) - vol), 8)
            ELSE NULL END AS conductance
FROM c1"""



def q_rbo_pagerank_indeg(spark, sf_dir):
    """Rank-biased overlap (Webber et al. 2010) between the 5-iteration
    PageRank ranking and the plain in-degree ranking, depth 100, p=0.9
    (analytics.rank_biased_overlap): is the expensive ranking buying
    anything over the cheap one?"""
    from credigraph_spark.analytics import rank_biased_overlap
    from credigraph_spark.graph import pagerank

    edges = _edges(spark, sf_dir)
    ranks, _ = pagerank(edges, max_iter=5, tol=0.0)
    indeg = edges.groupBy(F.col("dst").alias("vid")).agg(
        F.count("*").cast("double").alias("score"))
    return rank_biased_overlap(ranks.withColumnRenamed("rank", "score"),
                               indeg, k=100, p=0.9)


def _rbo_sql(k: int = 100, p: float = 0.9) -> str:
    """_pagerank5_parts chain + in-degree side + the max-rank entry
    profile and truncated RBO_min sum."""
    parts = _pagerank5_parts()
    parts.append(
        f"lt AS MATERIALIZED (SELECT vid, rl FROM ("
        f"SELECT vid, CAST(ROW_NUMBER() OVER (ORDER BY key DESC, vid) "
        f"AS INTEGER) AS rl FROM (SELECT vid, ROUND(rank, 6) AS key "
        f"FROM r5)) WHERE rl <= {k})")
    parts.append(
        f"rt AS MATERIALIZED (SELECT vid, rr FROM ("
        f"SELECT vid, CAST(ROW_NUMBER() OVER (ORDER BY key DESC, vid) "
        f"AS INTEGER) AS rr FROM (SELECT dst AS vid, "
        f"ROUND(CAST(COUNT(*) AS DOUBLE), 6) AS key FROM e GROUP BY dst)"
        f") WHERE rr <= {k})")
    parts.append(
        "prof AS (SELECT GREATEST(lt.rl, rt.rr) AS d, COUNT(*) AS enter "
        "FROM lt JOIN rt ON rt.vid = lt.vid GROUP BY 1)")
    parts.append(
        f"curve AS (SELECT g.d, SUM(COALESCE(prof.enter, 0)) "
        f"OVER (ORDER BY g.d) AS x FROM generate_series(1, {k}) g(d) "
        f"LEFT JOIN prof ON prof.d = g.d)")
    return ",\n".join(parts) + f"""
SELECT {k} AS depth,
       ROUND(MAX(CASE WHEN d = {k} THEN x END) / {float(k)}, 6)
         AS overlap_at_k,
       ROUND({(1 - p) / p} * SUM(POWER({p}, d) * x / d), 6) AS rbo_min
FROM curve
"""



def q_readability(spark, sf_dir):
    """Flesch reading-ease + Flesch-Kincaid grade per document
    (pipeline.textstats.readability): vowel-run syllable heuristic,
    all per-row folds."""
    from credigraph_spark.pipeline.textstats import readability

    return readability(_t(spark, sf_dir, "documents"))


_READABILITY_SQL = """
WITH per AS (
  SELECT doc_id,
         len(toks) AS n_words,
         CAST(list_sum(list_transform(toks,
              w -> greatest(len(regexp_split_to_array(w, '[aeiouy]+'))
                            - 1, 1))) AS INTEGER) AS n_syllables,
         len(list_filter(regexp_split_to_array(text, '[.!?]+'),
                         s -> len(trim(s)) > 0)) AS n_sentences
  FROM (SELECT doc_id, text,
               list_filter(regexp_split_to_array(lower(text),
                                                 '[^a-z0-9]+'),
                           t -> t <> '') AS toks
        FROM documents))
SELECT doc_id, n_words, n_syllables, n_sentences,
       CASE WHEN n_words > 0 THEN
         ROUND(206.835
               - 1.015 * (CAST(n_words AS DOUBLE)
                          / greatest(n_sentences, 1))
               - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 4)
       END AS flesch,
       CASE WHEN n_words > 0 THEN
         ROUND(0.39 * (CAST(n_words AS DOUBLE) / greatest(n_sentences, 1))
               + 11.8 * (CAST(n_syllables AS DOUBLE) / n_words)
               - 15.59, 4)
       END AS fk_grade
FROM per
"""



def q_preferential_attachment(spark, sf_dir):
    """Barabasi attachment-kernel exponent: lineitem edges split at
    shipdate 1995-06-01; late-slice arrival counts per early-degree
    class, log-log fit (analytics.preferential_attachment)."""
    from credigraph_spark.analytics import preferential_attachment

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst"),
        F.col("l_shipdate").cast("date").alias("d"))
    li = li.where(F.col("src").isNotNull() & F.col("dst").isNotNull()
                  & (F.col("src") != F.col("dst")))
    cut = F.lit("1995-06-01").cast("date")
    return preferential_attachment(
        li.where(F.col("d") < cut).select("src", "dst"),
        li.where(F.col("d") >= cut).select("src", "dst"))


_PA_SQL = """
WITH li AS (SELECT l_partkey AS src, l_suppkey AS dst,
                   CAST(l_shipdate AS DATE) AS d FROM lineitem
            WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
              AND l_partkey <> l_suppkey),
deg AS (SELECT vid, COUNT(*) AS dg FROM (
          SELECT src AS vid FROM li WHERE d < DATE '1995-06-01'
          UNION ALL SELECT dst FROM li WHERE d < DATE '1995-06-01')
        GROUP BY 1),
arr AS (SELECT vid, COUNT(*) AS arrivals FROM (
          SELECT src AS vid FROM li WHERE d >= DATE '1995-06-01'
          UNION ALL SELECT dst FROM li WHERE d >= DATE '1995-06-01')
        GROUP BY 1),
pc AS (SELECT deg.dg AS d, SUM(COALESCE(arr.arrivals, 0)) AS tot,
              COUNT(*) AS nv
       FROM deg LEFT JOIN arr ON arr.vid = deg.vid
       GROUP BY 1 HAVING SUM(COALESCE(arr.arrivals, 0)) > 0),
xy AS (SELECT ln(CAST(d AS DOUBLE)) AS x,
              ln(CAST(tot AS DOUBLE) / nv) AS y FROM pc),
fit AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, COUNT(*) AS n_degrees,
               SUM(x) AS sx, SUM(y) AS sy, SUM(x*x) AS sxx,
               SUM(x*y) AS sxy, SUM(y*y) AS syy FROM xy)
SELECT n_degrees,
       ROUND((sxy - sx*sy/n) / (sxx - sx*sx/n), 6) AS pa_exponent,
       ROUND((sy - ((sxy - sx*sy/n) / (sxx - sx*sx/n)) * sx) / n, 6)
         AS ln_k,
       ROUND((sxy - sx*sy/n) * (sxy - sx*sy/n)
             / ((sxx - sx*sx/n) * (syy - sy*sy/n)), 6) AS r2
FROM fit
"""



def q_rank_normalize(spark, sf_dir):
    """Quantile/rank normalization of customer account balance +
    numeric nation key (features.rank_normalize): (rank-0.5)/n under
    the (value, id) total order."""
    from credigraph_spark.features import rank_normalize

    return rank_normalize(_t(spark, sf_dir, "customer"), "c_custkey",
                          ["c_acctbal", "c_nationkey"])


_RANK_NORM_SQL = """
WITH n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM customer),
ra AS (SELECT c_custkey,
              ROW_NUMBER() OVER (ORDER BY c_acctbal, c_custkey) AS r
       FROM customer),
rn AS (SELECT c_custkey,
              ROW_NUMBER() OVER (ORDER BY c_nationkey, c_custkey) AS r
       FROM customer)
SELECT c.c_custkey,
       ROUND((ra.r - 0.5) / (SELECT n FROM n), 9) AS c_acctbal_rank,
       ROUND((rn.r - 0.5) / (SELECT n FROM n), 9) AS c_nationkey_rank
FROM customer c
JOIN ra ON ra.c_custkey = c.c_custkey
JOIN rn ON rn.c_custkey = c.c_custkey
"""



def q_contract_graph(spark, sf_dir):
    """Super-graph induced by a deterministic 8-bucket vertex labeling
    (analytics.contract_graph): per (src_comm, dst_comm) directed edge
    counts, intra-community rows included — the coarse-grained view
    operator (LPA convergence at sf0.01 yields one giant community, so
    the driver check uses hash buckets for a non-degenerate rollup;
    real labelings plug in identically)."""
    from credigraph_spark.analytics import contract_graph

    edges = _edges(spark, sf_dir)
    labels = (edges.select(F.col("src").alias("vid"))
              .unionByName(edges.select(F.col("dst").alias("vid")))
              .distinct()
              .select("vid", (F.col("vid") % 8).alias("label")))
    return contract_graph(edges, labels, label_col="label")


def _contract_graph_sql() -> str:
    return f"""
WITH e2 AS (SELECT src, dst FROM ({_E_SQL}))
SELECT e2.src % 8 AS src_comm, e2.dst % 8 AS dst_comm,
       COUNT(*) AS n_edges
FROM e2 GROUP BY 1, 2
"""



def q_sparsify(spark, sf_dir):
    """Degree-proportional sparsifier with inverse-probability
    reweighting (graph.sampling.sparsify_edges, c=4): the md5 coin
    makes the sample itself oracle-checkable."""
    from credigraph_spark.graph.sampling import sparsify_edges

    return sparsify_edges(_edges(spark, sf_dir), c=4.0, seed=7)


_SPARSIFY_SQL = f"""
WITH e AS MATERIALIZED ({_E_SQL}),
deg AS (SELECT vid, COUNT(*) AS d FROM
        (SELECT src AS vid FROM e UNION ALL SELECT dst FROM e)
        GROUP BY 1)
SELECT e.src, e.dst,
       ROUND(1.0 / LEAST(1.0, 4.0 / sqrt(CAST(du.d AS DOUBLE) * dv.d)), 9)
         AS w
FROM e JOIN deg du ON du.vid = e.src JOIN deg dv ON dv.vid = e.dst
WHERE CAST(CAST(('0x' || substr(md5('7' || '|' || e.src || '|' || e.dst),
                                1, 15)) AS UBIGINT) AS DOUBLE)
      / 1152921504606846976.0
      < LEAST(1.0, 4.0 / sqrt(CAST(du.d AS DOUBLE) * dv.d))
"""



def q_split_drift(spark, sf_dir):
    """Per-split mean-embedding drift under the hash split
    (pipeline.similarity.split_embedding_drift): centroid cosine + L2
    between train/val/test — the covariate-shift pre-flight."""
    from credigraph_spark.pipeline.similarity import split_embedding_drift

    return split_embedding_drift(
        _t(spark, sf_dir, "embeddings"),
        {"train": 0.8, "val": 0.1, "test": 0.1}, seed=7)


_SPLIT_DRIFT_SQL = """
WITH sp AS (SELECT vec_id, embedding,
                   CASE WHEN frac < 0.8 THEN 'train'
                        WHEN frac < 0.9 THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT vec_id, embedding,
                  CAST(CAST(('0x' || substr(md5(vec_id || '|' || '7'),
                                            1, 15)) AS UBIGINT) AS DOUBLE)
                  / 1152921504606846976.0 AS frac FROM embeddings)),
comp AS (SELECT split, i, AVG(CAST(x AS DOUBLE)) AS m FROM (
           SELECT split, unnest(embedding) AS x,
                  generate_subscripts(embedding, 1) AS i FROM sp)
         GROUP BY 1, 2)
SELECT a.split AS split_a, b.split AS split_b,
       ROUND(SUM(a.m * b.m)
             / (sqrt(SUM(a.m * a.m)) * sqrt(SUM(b.m * b.m))), 6)
         AS cosine,
       ROUND(sqrt(SUM((a.m - b.m) * (a.m - b.m))), 6) AS l2_dist
FROM comp a JOIN comp b ON a.i = b.i AND a.split < b.split
GROUP BY 1, 2
"""



def q_smoothness(spark, sf_dir):
    """Rayleigh-quotient smoothness of the label_spreading output over
    the graph it was diffused on (analytics.signal_smoothness composed
    with graph.label_spreading): the diffusion sanity gate."""
    from credigraph_spark.analytics import signal_smoothness
    from credigraph_spark.graph import label_spreading

    edges = _edges(spark, sf_dir)
    seeds = (edges.select(F.col("src").alias("vid"))
             .unionByName(edges.select(F.col("dst").alias("vid")))
             .distinct().orderBy("vid").limit(20)
             .select("vid", (F.col("vid") % 2).cast("double").alias("y")))
    spread = label_spreading(edges, seeds, max_iter=3, round_digits=8)
    return signal_smoothness(edges, spread, score_col="score")


def _smoothness_sql(rounds: int = 3, n_seeds: int = 20) -> str:
    """label_spreading oracle chain (unweighted) + the Dirichlet/norm
    aggregation over the canonical pair set."""
    parts = [
        f"WITH und AS MATERIALIZED ({_UND_SQL})",
        "deg AS MATERIALIZED (SELECT dst AS vid, COUNT(*) AS deg "
        "FROM und GROUP BY 1)",
        f"sd AS MATERIALIZED (SELECT vid, CAST(vid % 2 AS DOUBLE) AS y "
        f"FROM (SELECT vid FROM ({_VERTS_SQL}) ORDER BY vid "
        f"LIMIT {n_seeds}))",
        "f0 AS MATERIALIZED (SELECT d.vid, COALESCE(sd.y, 0.0) AS f "
        "FROM deg d LEFT JOIN sd ON sd.vid = d.vid)",
    ]
    for i in range(rounds):
        parts.append(
            f"f{i+1} AS MATERIALIZED (SELECT d.vid, "
            f"COALESCE(sd.y, m.s / d.deg) AS f "
            f"FROM deg d JOIN (SELECT und.dst AS vid, SUM(p.f) AS s "
            f"FROM und JOIN f{i} p ON p.vid = und.src GROUP BY 1) m "
            f"ON m.vid = d.vid LEFT JOIN sd ON sd.vid = d.vid)")
    parts.append(
        f"sc AS MATERIALIZED (SELECT vid, ROUND(f, 8) AS x "
        f"FROM f{rounds})")
    parts.append(
        "cnd AS MATERIALIZED (SELECT src AS a, dst AS b FROM und "
        "WHERE src < dst)")
    parts.append(
        "nrm AS (SELECT SUM(deg.deg * sc.x * sc.x) AS norm_sq "
        "FROM deg JOIN sc ON sc.vid = deg.vid)")
    parts.append(
        "dr AS (SELECT COUNT(*) AS n_edges_scored, "
        "SUM((sa.x - sb.x) * (sa.x - sb.x)) AS dirichlet "
        "FROM cnd JOIN sc sa ON sa.vid = cnd.a "
        "JOIN sc sb ON sb.vid = cnd.b)")
    return ",\n".join(parts) + """
SELECT dr.n_edges_scored, ROUND(dr.dirichlet, 8) AS dirichlet,
       ROUND(nrm.norm_sq, 8) AS norm_sq,
       CASE WHEN nrm.norm_sq > 0
            THEN ROUND(dr.dirichlet / nrm.norm_sq, 8) ELSE 0.0 END
         AS smoothness
FROM dr, nrm
"""



def q_robust_scale(spark, sf_dir):
    """Median/MAD robust scaling of customer account balance
    (analytics.robust_scale): exact medians, outlier-proof
    standardization."""
    from credigraph_spark.analytics import robust_scale

    return robust_scale(_t(spark, sf_dir, "customer"), "c_custkey",
                        "c_acctbal")


_ROBUST_SCALE_SQL = """
WITH v AS (SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS x
           FROM customer),
n AS (SELECT COUNT(*) AS n FROM v),
med AS (SELECT x AS m FROM (
          SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS r FROM v)
        WHERE r = CAST(CEIL(0.5 * (SELECT n FROM n)) AS BIGINT)),
dev AS (SELECT ABS(x - (SELECT m FROM med)) AS d FROM v),
mad AS (SELECT d AS m FROM (
          SELECT d, ROW_NUMBER() OVER (ORDER BY d) AS r FROM dev)
        WHERE r = CAST(CEIL(0.5 * (SELECT n FROM n)) AS BIGINT))
SELECT c_custkey, c_acctbal AS value,
       CASE WHEN (SELECT m FROM mad) > 0
            THEN ROUND((x - (SELECT m FROM med)) / (SELECT m FROM mad), 9)
            ELSE 0.0 END AS robust
FROM v JOIN customer USING (c_custkey)
"""



def q_source_quality(spark, sf_dir):
    """Per-source curation dashboard: Gopher keep rate (corpus-adapted
    stopwords, the q_gopher_quality knobs), mean token count, and
    language-ID entropy (pipeline.textstats.source_quality_rollup)."""
    from credigraph_spark.pipeline.textstats import source_quality_rollup

    return source_quality_rollup(_t(spark, sf_dir, "documents"),
                                 stopwords=("the", "a"), min_stopwords=2)


def _source_quality_sql() -> str:
    """_gopher_sql's rule core + _langid_sql's per-doc argmax, both
    rolled up by source; entropy over the (source, lang_pred) counts."""
    scores = []
    for lang, arr in [("en", _EN_STOP), ("fr", _FR_STOP),
                      ("de", _DE_STOP), ("es", _ES_STOP)]:
        scores.append(
            f"SELECT doc_id, '{lang}' AS lang, "
            f"len(list_filter(toks, x -> list_contains({arr}, x))) "
            f"/ greatest(len(toks), 1) AS score FROM b")
    union = " UNION ALL ".join(scores)
    return rf"""
WITH t AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x != '') AS w
  FROM documents),
m AS (
  SELECT doc_id, source, CAST(len(w) AS BIGINT) AS n_words,
         COALESCE(list_sum(list_transform(w, x -> len(x))), 0) AS chars,
         len(list_filter(w, x -> regexp_matches(x, '[a-z]'))) AS alpha,
         CAST(len(list_intersect(list_distinct(w), ['the', 'a']))
              AS BIGINT) AS n_stop
  FROM t),
g AS (
  SELECT source, n_words,
         CAST(n_words >= 50 AND n_words <= 100000
              AND (CASE WHEN n_words > 0
                        THEN ROUND(chars / n_words, 8) ELSE 0.0 END)
                  BETWEEN 3.0 AND 10.0
              AND (CASE WHEN n_words > 0
                        THEN ROUND(alpha / n_words, 8) ELSE 0.0 END)
                  >= 0.8
              AND n_stop >= 2 AS INTEGER) AS k
  FROM m),
ps AS (SELECT source, COUNT(*) AS n_docs,
              ROUND(AVG(k), 6) AS gopher_keep_rate,
              ROUND(AVG(n_words), 6) AS mean_tokens
       FROM g GROUP BY 1),
b AS (SELECT doc_id, {{toks}} AS toks FROM documents),
s AS ({union}),
best AS (SELECT doc_id, lang, score, ROW_NUMBER() OVER
  (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn FROM s),
lp AS (SELECT doc_id, CASE WHEN score > 0 THEN lang ELSE 'und' END
         AS lang_pred FROM best WHERE rn = 1),
sl AS (SELECT d.source, lp.lang_pred, COUNT(*) AS c
       FROM lp JOIN documents d USING (doc_id) GROUP BY 1, 2),
tot AS (SELECT source, SUM(c) AS tt FROM sl GROUP BY 1),
ent AS (SELECT sl.source,
               ROUND(-SUM((sl.c / tot.tt) * log2(sl.c / tot.tt)), 6)
                 AS lang_entropy
        FROM sl JOIN tot ON tot.source = sl.source GROUP BY 1)
SELECT ps.source, ps.n_docs, ps.gopher_keep_rate, ps.mean_tokens,
       ent.lang_entropy
FROM ps JOIN ent ON ent.source = ps.source
""".format(toks=_TOKENS_SQL)



def q_ks_split(spark, sf_dir):
    """Exact two-sample KS statistic of document length between the
    train and test hash splits (pipeline.sampling.ks_split_drift):
    scalar-feature drift, O3 cumulative construction."""
    from credigraph_spark.pipeline.sampling import ks_split_drift

    return ks_split_drift(_t(spark, sf_dir, "documents"), ["doc_id"],
                          "n_chars", {"train": 0.8, "val": 0.1,
                                      "test": 0.1}, seed=7)


_KS_SPLIT_SQL = """
WITH sp AS (SELECT CAST(n_chars AS DOUBLE) AS v,
                   CASE WHEN frac < 0.8 THEN 'train'
                        WHEN frac < 0.9 THEN 'val'
                        ELSE 'test' END AS split
            FROM (SELECT n_chars,
                  CAST(CAST(('0x' || substr(md5(doc_id || '|' || '7'),
                                            1, 15)) AS UBIGINT) AS DOUBLE)
                  / 1152921504606846976.0 AS frac FROM documents)),
c AS (SELECT v,
             SUM(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS c1,
             SUM(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS c2
      FROM sp WHERE split IN ('train', 'test') GROUP BY 1),
n AS (SELECT CAST(SUM(c1) AS BIGINT) AS n_a,
             CAST(SUM(c2) AS BIGINT) AS n_b FROM c),
cum AS (SELECT SUM(c1) OVER (ORDER BY v) AS a,
               SUM(c2) OVER (ORDER BY v) AS b FROM c)
SELECT n.n_a, n.n_b,
       ROUND(MAX(ABS(CAST(cum.a AS DOUBLE) / n.n_a
                     - CAST(cum.b AS DOUBLE) / n.n_b)), 9) AS ks_stat
FROM cum, n GROUP BY n.n_a, n.n_b
"""



def q_weighted_assortativity(spark, sf_dir):
    """Weight-weighted strength assortativity over l_quantity edges
    (analytics.weighted_assortativity)."""
    from credigraph_spark.analytics import weighted_assortativity

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst"),
        F.col("l_quantity").cast("double").alias("w"))
    return weighted_assortativity(li)


_W_ASSORT_SQL = """
WITH raw AS (SELECT LEAST(l_partkey, l_suppkey) AS a,
                    GREATEST(l_partkey, l_suppkey) AS b,
                    CAST(l_quantity AS DOUBLE) AS w FROM lineitem
             WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
               AND l_partkey <> l_suppkey),
e AS MATERIALIZED (SELECT a, b, SUM(w) AS w FROM raw GROUP BY 1, 2),
st AS (SELECT vid, ROUND(SUM(w), 8) AS s FROM (
         SELECT a AS vid, w FROM e UNION ALL SELECT b, w FROM e)
       GROUP BY 1),
mir AS (SELECT m.a, m.b, m.w, sa.s AS sx, sb.s AS sy FROM (
          SELECT a, b, w FROM e UNION ALL SELECT b, a, w FROM e) m
        JOIN st sa ON sa.vid = m.a JOIN st sb ON sb.vid = m.b),
agg AS (SELECT COUNT(*) AS n2, SUM(w) AS tw2,
               SUM(w * sx) AS wx, SUM(w * sy) AS wy,
               SUM(w * sx * sy) AS wxy, SUM(w * sx * sx) AS wxx,
               SUM(w * sy * sy) AS wyy FROM mir)
SELECT CAST(n2 / 2 AS BIGINT) AS n_edges,
       ROUND(tw2 / 2, 6) AS total_weight,
       CASE WHEN (wxx/tw2 - (wx/tw2)*(wx/tw2)) > 0
             AND (wyy/tw2 - (wy/tw2)*(wy/tw2)) > 0
            THEN ROUND((wxy/tw2 - (wx/tw2)*(wy/tw2))
                       / (sqrt(wxx/tw2 - (wx/tw2)*(wx/tw2))
                          * sqrt(wyy/tw2 - (wy/tw2)*(wy/tw2))), 6)
            ELSE 0.0 END AS r
FROM agg
"""



def q_source_js(spark, sf_dir):
    """Pairwise Jensen-Shannon divergence between per-source unigram
    distributions over the shared top-200 vocabulary
    (pipeline.textstats.source_js_divergence)."""
    from credigraph_spark.pipeline.textstats import source_js_divergence

    return source_js_divergence(_t(spark, sf_dir, "documents"),
                                vocab_k=200)


def _source_js_sql(vocab_k: int = 200) -> str:
    return f"""
WITH toks AS MATERIALIZED (
  SELECT source AS src_key, term FROM (
    SELECT source,
           unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
    FROM documents) WHERE term <> ''),
dfreq AS (SELECT term, COUNT(*) AS cnt FROM toks GROUP BY 1),
vocab AS (SELECT term FROM dfreq
          ORDER BY cnt DESC, term ASC LIMIT {vocab_k}),
tc AS (SELECT src_key, t.term, COUNT(*) AS c
       FROM toks t JOIN vocab v ON v.term = t.term GROUP BY 1, 2),
tot AS (SELECT src_key, CAST(SUM(c) AS BIGINT) AS t FROM tc GROUP BY 1),
p AS (SELECT tc.src_key, tc.term,
             CAST(tc.c AS DOUBLE) / tot.t AS p
      FROM tc JOIN tot ON tot.src_key = tc.src_key),
pairs AS (SELECT a.src_key AS source_a, b.src_key AS source_b
          FROM tot a JOIN tot b ON a.src_key < b.src_key),
grid AS (SELECT pairs.source_a, pairs.source_b, vocab.term
         FROM pairs CROSS JOIN vocab),
pair AS (SELECT g.source_a, g.source_b,
                COALESCE(pa.p, 0.0) AS pa, COALESCE(pb.p, 0.0) AS pb
         FROM grid g
         LEFT JOIN p pa ON pa.src_key = g.source_a
                        AND pa.term = g.term
         LEFT JOIN p pb ON pb.src_key = g.source_b
                        AND pb.term = g.term)
SELECT source_a, source_b,
       ROUND(SUM(
         (CASE WHEN pa > 0
               THEN pa / 2 * log2(pa / ((pa + pb) / 2)) ELSE 0.0 END)
         + (CASE WHEN pb > 0
                 THEN pb / 2 * log2(pb / ((pa + pb) / 2)) ELSE 0.0 END)
       ), 6) AS js_bits
FROM pair GROUP BY 1, 2
"""



def q_rbo_degree_churn(spark, sf_dir):
    """Top-100 authority churn across time: RBO between the early- and
    late-slice in-degree rankings (shipdate split at 1995-06-01) —
    how stable is the hub set over time
    (analytics.rank_biased_overlap reused over temporal slices)."""
    from credigraph_spark.analytics import rank_biased_overlap

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst"),
        F.col("l_shipdate").cast("date").alias("d"))
    li = li.where(F.col("src").isNotNull() & F.col("dst").isNotNull()
                  & (F.col("src") != F.col("dst")))
    cut = F.lit("1995-06-01").cast("date")

    def indeg(part):
        return (part.groupBy(F.col("dst").alias("vid"))
                .agg(F.count("*").cast("double").alias("score")))

    return rank_biased_overlap(indeg(li.where(F.col("d") < cut)),
                               indeg(li.where(F.col("d") >= cut)),
                               k=100, p=0.9)


def _rbo_churn_sql(k: int = 100, p: float = 0.9) -> str:
    base = ("SELECT l_partkey AS src, l_suppkey AS dst, "
            "CAST(l_shipdate AS DATE) AS d FROM lineitem "
            "WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL "
            "AND l_partkey <> l_suppkey")
    return f"""
WITH li AS MATERIALIZED ({base}),
lt AS (SELECT vid, rl FROM (
  SELECT vid, CAST(ROW_NUMBER() OVER (ORDER BY key DESC, vid)
              AS INTEGER) AS rl
  FROM (SELECT dst AS vid, ROUND(CAST(COUNT(*) AS DOUBLE), 6) AS key
        FROM li WHERE d < DATE '1995-06-01' GROUP BY dst))
  WHERE rl <= {k}),
rt AS (SELECT vid, rr FROM (
  SELECT vid, CAST(ROW_NUMBER() OVER (ORDER BY key DESC, vid)
              AS INTEGER) AS rr
  FROM (SELECT dst AS vid, ROUND(CAST(COUNT(*) AS DOUBLE), 6) AS key
        FROM li WHERE d >= DATE '1995-06-01' GROUP BY dst))
  WHERE rr <= {k}),
prof AS (SELECT GREATEST(lt.rl, rt.rr) AS d, COUNT(*) AS enter
         FROM lt JOIN rt ON rt.vid = lt.vid GROUP BY 1),
curve AS (SELECT g.d, SUM(COALESCE(prof.enter, 0))
            OVER (ORDER BY g.d) AS x
          FROM generate_series(1, {k}) g(d)
          LEFT JOIN prof ON prof.d = g.d)
SELECT {k} AS depth,
       ROUND(MAX(CASE WHEN d = {k} THEN x END) / {float(k)}, 6)
         AS overlap_at_k,
       ROUND({(1 - p) / p} * SUM(POWER({p}, d) * x / d), 6) AS rbo_min
FROM curve
"""



def q_community_summary(spark, sf_dir):
    """Community-level authority summary: per deterministic 8-bucket
    community, vertex count, 5-iteration PageRank mass, and internal
    edge fraction — contract_graph's rollup composed with the rank
    chain (the coarse dashboard a 100 TB graph is monitored through)."""
    from credigraph_spark.graph import pagerank

    edges = _edges(spark, sf_dir)
    ranks, _ = pagerank(edges, max_iter=5, tol=0.0)
    lab = ranks.select("vid", (F.col("vid") % 8).alias("c"), "rank")
    per = lab.groupBy("c").agg(
        F.count("*").alias("n_vertices"),
        F.round(F.sum("rank"), 8).alias("pr_mass"))
    e = edges.select((F.col("src") % 8).alias("cs"),
                     (F.col("dst") % 8).alias("cd"))
    ec = e.groupBy("cs").agg(
        F.count("*").alias("n_out_edges"),
        F.sum(F.when(F.col("cs") == F.col("cd"), 1).otherwise(0))
        .alias("n_internal"))
    return (per.join(ec.withColumnRenamed("cs", "c"), "c", "left")
            .select(F.col("c").alias("community"), "n_vertices",
                    "pr_mass",
                    F.coalesce("n_out_edges", F.lit(0))
                    .alias("n_out_edges"),
                    F.round(F.coalesce(F.col("n_internal"), F.lit(0))
                            / F.greatest(F.col("n_out_edges"), F.lit(1)),
                            8).alias("internal_frac")))


def _community_summary_sql() -> str:
    """_pagerank5_parts chain + bucket rollups."""
    parts = _pagerank5_parts()
    parts.append(
        "per AS (SELECT vid % 8 AS community, COUNT(*) AS n_vertices, "
        "ROUND(SUM(rank), 8) AS pr_mass FROM r5 GROUP BY 1)")
    parts.append(
        "ec AS (SELECT src % 8 AS community, COUNT(*) AS n_out_edges, "
        "SUM(CASE WHEN src % 8 = dst % 8 THEN 1 ELSE 0 END) "
        "AS n_internal FROM e GROUP BY 1)")
    return ",\n".join(parts) + """
SELECT per.community, per.n_vertices, per.pr_mass,
       COALESCE(ec.n_out_edges, 0) AS n_out_edges,
       ROUND(COALESCE(ec.n_internal, 0)
             / GREATEST(COALESCE(ec.n_out_edges, 0), 1), 8)
         AS internal_frac
FROM per LEFT JOIN ec ON ec.community = per.community
"""



def q_curation_sweep(spark, sf_dir):
    """Filter-tuning curve: exact entropy-quantile thresholds vs
    corpus yield (pipeline.textstats.curation_threshold_sweep)."""
    from credigraph_spark.pipeline.textstats import (
        curation_threshold_sweep)

    return curation_threshold_sweep(_t(spark, sf_dir, "documents"))


def _curation_sweep_sql(qs=(0.1, 0.25, 0.5, 0.75, 0.9)) -> str:
    qrows = ", ".join(f"({q})" for q in qs)
    return rf"""
WITH t AS (
  SELECT doc_id, n_chars AS _sz,
         list_transform(range(1, len(text) + 1),
                        i -> substring(text, i, 1)) AS chars
  FROM documents),
sc AS MATERIALIZED (
  SELECT _sz,
         CASE WHEN len(chars) > 0 THEN ROUND(
           -list_sum(list_transform(list_distinct(chars),
             d -> (len(list_filter(chars, x -> x = d)) / len(chars))
                  * log2(len(list_filter(chars, x -> x = d))
                         / len(chars)))), 6)
         ELSE 0.0 END AS s
  FROM t),
n AS (SELECT COUNT(*) AS n FROM sc),
qt(q) AS (VALUES {qrows}),
thr AS (SELECT CAST(qt.q AS DOUBLE) AS q, r.s AS threshold FROM qt JOIN (
          SELECT s, ROW_NUMBER() OVER (ORDER BY s) AS rn FROM sc) r
        ON r.rn = CAST(CEIL(qt.q * (SELECT n FROM n)) AS BIGINT))
SELECT thr.q, thr.threshold,
       COUNT(*) AS n_kept,
       ROUND(COUNT(*) * 1.0 / (SELECT n FROM n), 6) AS kept_frac,
       ROUND(AVG(sc._sz), 6) AS mean_size
FROM sc JOIN thr ON sc.s >= thr.threshold
GROUP BY 1, 2
"""



def q_percolation(spark, sf_dir):
    """Bond-percolation robustness curve at keep fractions 0.3/0.6/0.9
    (analytics.percolation_curve): LCC vs deterministic random edge
    loss — the random-failure sibling of hub-removal robustness."""
    from credigraph_spark.analytics import percolation_curve

    return percolation_curve(_edges(spark, sf_dir))


def _percolation_sql(keep_fracs=(0.3, 0.6, 0.9), seed: int = 7) -> str:
    """Per keep fraction: the md5 coin filter + recursive hash-min CC +
    LCC rollup, UNION ALL'd (the robustness-oracle double-CC pattern,
    once per threshold)."""
    parts = []
    for p in keep_fracs:
        parts.append(f"""
SELECT CAST({p} AS DOUBLE) AS keep_frac,
       (SELECT COUNT(*) FROM k{int(p*10)}) AS n_edges_kept,
       (SELECT MAX(sz) FROM (
          SELECT COUNT(*) AS sz FROM (
            SELECT vid, MIN(label) AS component FROM r{int(p*10)}
            GROUP BY vid) GROUP BY component)) AS lcc_size,
       ROUND((SELECT MAX(sz) FROM (
          SELECT COUNT(*) AS sz FROM (
            SELECT vid, MIN(label) AS component FROM r{int(p*10)}
            GROUP BY vid) GROUP BY component))
         * 1.0 / (SELECT n FROM nv), 6) AS lcc_frac""")
    ctes = [f"WITH RECURSIVE e AS MATERIALIZED ({_E_SQL})",
            f"nv AS (SELECT COUNT(*) AS n FROM ({_VERTS_SQL}))"]
    for p in keep_fracs:
        t = int(p * 10)
        ctes.append(
            f"k{t} AS MATERIALIZED (SELECT src, dst FROM e WHERE "
            f"CAST(CAST(('0x' || substr(md5('{seed}' || '|' || src "
            f"|| '|' || dst), 1, 15)) AS UBIGINT) AS DOUBLE) "
            f"/ 1152921504606846976.0 < {p})")
        ctes.append(
            f"u{t} AS MATERIALIZED (SELECT src, dst FROM k{t} UNION "
            f"SELECT dst, src FROM k{t})")
        ctes.append(
            f"r{t}(vid, label) AS (SELECT src, src FROM u{t} UNION "
            f"SELECT u{t}.dst, r{t}.label FROM r{t} "
            f"JOIN u{t} ON u{t}.src = r{t}.vid "
            f"WHERE r{t}.label < u{t}.dst)")
    return ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(parts)



def q_dupcluster_sizes(spark, sf_dir):
    """Near-dup cluster size histogram: size → cluster count over the
    dedup_canonical closure (singletons included) — the dedup yield
    report (how much of the corpus is 2x, 3x, Nx duplicated)."""
    from credigraph_spark.pipeline.dedup import dedup_canonical

    canon = dedup_canonical(_t(spark, sf_dir, "documents"),
                            num_hashes=4, rows_per_band=2)
    return (canon.groupBy("canonical_id")
            .agg(F.count("*").alias("sz"))
            .groupBy(F.col("sz").alias("cluster_size"))
            .agg(F.count("*").alias("n_clusters")))


def _dupcluster_sizes_sql() -> str:
    return (f"WITH base AS ({_dedup_canonical_sql()})\n"
            "SELECT sz AS cluster_size, COUNT(*) AS n_clusters FROM ("
            "SELECT canonical_id, COUNT(*) AS sz FROM base GROUP BY 1) "
            "GROUP BY 1")



def q_event_stationary(spark, sf_dir):
    """5-round power-iterated stationary distribution of the event-
    transition Markov chain (temporal.transition_stationary)."""
    from credigraph_spark.temporal import transition_stationary

    return transition_stationary(_t(spark, sf_dir, "events"), rounds=5)


def _event_stationary_sql(rounds: int = 5) -> str:
    """event_transitions oracle chain + unrolled pi <- pi P rounds over
    the full state table (sinks keep their mass)."""
    parts = [
        """WITH p AS (SELECT event_type AS src_type,
              LEAD(event_type) OVER (PARTITION BY user_id
                ORDER BY ts, event_id) AS dst_type FROM events)""",
        """c AS MATERIALIZED (SELECT src_type, dst_type,
              COUNT(*) AS n FROM p WHERE dst_type IS NOT NULL
              GROUP BY 1, 2)""",
        "tt AS (SELECT src_type, SUM(n) AS tot FROM c GROUP BY 1)",
        """tr AS MATERIALIZED (SELECT c.src_type, c.dst_type,
              c.n / tt.tot AS prob FROM c
              JOIN tt ON tt.src_type = c.src_type)""",
        """st AS MATERIALIZED (SELECT src_type AS t FROM tr
              UNION SELECT dst_type FROM tr)""",
        "ns AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM st)",
        "pi0 AS (SELECT t, 1.0 / (SELECT n FROM ns) AS pi FROM st)",
    ]
    for i in range(rounds):
        parts.append(
            f"""pi{i+1} AS MATERIALIZED (
  SELECT st.t,
         COALESCE(mv.m, 0.0)
         + CASE WHEN st.t NOT IN (SELECT src_type FROM tr)
                THEN p{i}.pi ELSE 0.0 END AS pi
  FROM st
  JOIN pi{i} p{i} ON p{i}.t = st.t
  LEFT JOIN (SELECT tr.dst_type AS t, SUM(q.pi * tr.prob) AS m
             FROM tr JOIN pi{i} q ON q.t = tr.src_type
             GROUP BY 1) mv ON mv.t = st.t)""")
    return ",\n".join(parts) + f"""
SELECT t AS event_type, ROUND(pi, 8) AS pi FROM pi{rounds}
"""



def q_disparity_backbone(spark, sf_dir):
    """Serrano-Boguna disparity-filter backbone over l_quantity-
    weighted edges, alpha=0.05 (graph.sampling.disparity_backbone)."""
    from credigraph_spark.graph.sampling import disparity_backbone

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst"),
        F.col("l_quantity").cast("double").alias("w"))
    return disparity_backbone(li, alpha=0.05)


_DISPARITY_SQL = """
WITH raw AS (SELECT LEAST(l_partkey, l_suppkey) AS a,
                    GREATEST(l_partkey, l_suppkey) AS b,
                    CAST(l_quantity AS DOUBLE) AS w FROM lineitem
             WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
               AND l_partkey <> l_suppkey),
ew AS MATERIALIZED (SELECT a, b, SUM(w) AS w FROM raw GROUP BY 1, 2),
sd AS (SELECT vid, SUM(w) AS s, COUNT(*) AS k FROM (
         SELECT a AS vid, w FROM ew UNION ALL SELECT b, w FROM ew)
       GROUP BY 1),
j AS (SELECT ew.a, ew.b, ew.w,
             CASE WHEN sa.k > 1
                  THEN POWER(1.0 - ew.w / sa.s, sa.k - 1.0)
                  ELSE 0.0 END AS pa,
             CASE WHEN sb.k > 1
                  THEN POWER(1.0 - ew.w / sb.s, sb.k - 1.0)
                  ELSE 0.0 END AS pb
      FROM ew JOIN sd sa ON sa.vid = ew.a JOIN sd sb ON sb.vid = ew.b)
SELECT a AS src, b AS dst, w,
       ROUND(LEAST(pa, pb), 9) AS alpha_min
FROM j WHERE LEAST(pa, pb) < 0.05
"""



def q_vocab_coverage(spark, sf_dir):
    """Vocabulary coverage curve at 50/90/99% token mass
    (pipeline.textstats.vocab_coverage)."""
    from credigraph_spark.pipeline.textstats import vocab_coverage

    return vocab_coverage(_t(spark, sf_dir, "documents"))


_VOCAB_COVERAGE_SQL = """
WITH tf AS MATERIALIZED (
  SELECT term, COUNT(*) AS freq FROM (
    SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
    FROM documents) WHERE term <> '' GROUP BY 1),
tot AS (SELECT CAST(SUM(freq) AS DOUBLE) AS t FROM tf),
cum AS (SELECT CAST(ROW_NUMBER() OVER (ORDER BY freq DESC, term)
               AS BIGINT) AS rnk,
               CAST(SUM(freq) OVER (ORDER BY freq DESC, term)
               AS BIGINT) AS cm,
               freq
        FROM tf),
qt(q) AS (VALUES (CAST(0.5 AS DOUBLE)), (CAST(0.9 AS DOUBLE)),
                 (CAST(0.99 AS DOUBLE)))
SELECT qt.q, cum.rnk AS n_types_needed,
       ROUND(cum.cm / (SELECT t FROM tot), 6) AS coverage
FROM cum JOIN qt
  ON cum.cm - cum.freq < qt.q * (SELECT t FROM tot)
 AND qt.q * (SELECT t FROM tot) <= cum.cm
"""



def q_kmeans_silhouette(spark, sf_dir):
    """Per-cluster simplified silhouette of the deterministic k-means
    sharding (pipeline.ivf.kmeans_silhouette, same chain as
    kmeans_assign)."""
    from credigraph_spark.pipeline.ivf import kmeans_silhouette

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"))
    return kmeans_silhouette(emb, k=8, iters=2, seed=7)


def _kmeans_silhouette_sql(k: int = 8, iters: int = 2, seed: int = 7,
                           dim: int = 64) -> str:
    """_kmeans_sql's training chain + per-vector own/other centroid
    cosines + the per-cluster rollup."""
    key = f"md5('{seed}' || ':' || vec_id)"

    def dot(a, b, acol="emb", bcol="cv"):
        return (f"list_sum(list_transform(generate_series(1, "
                f"len({a}.{acol})), "
                f"i -> {a}.{acol}[i]::DOUBLE * {b}.{bcol}[i]::DOUBLE))")

    def norm(t, col):
        return (f"sqrt(list_sum(list_transform(generate_series(1, "
                f"len({t}.{col})), "
                f"i -> {t}.{col}[i]::DOUBLE * {t}.{col}[i]::DOUBLE)))")

    cent_cos = f"{dot('v', 'c')} / ({norm('v', 'emb')} * {norm('c', 'cv')})"
    parts = [
        """WITH v AS MATERIALIZED (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
          FROM embeddings)""",
        f"""c0 AS MATERIALIZED (
          SELECT ROW_NUMBER() OVER (ORDER BY {key}, vec_id) AS list_id,
                 emb AS cv
          FROM v ORDER BY {key}, vec_id LIMIT {k})""",
    ]
    for i in range(1, iters + 1):
        parts.append(f"""s{i} AS MATERIALIZED (
          SELECT vec_id, list_id FROM (
            SELECT v.vec_id, c.list_id,
                   ROW_NUMBER() OVER (PARTITION BY v.vec_id
                     ORDER BY ROUND({cent_cos}, 6) DESC,
                              c.list_id ASC) AS rn
            FROM v, c{i - 1} c) WHERE rn = 1)""")
        parts.append(f"""mm{i} AS (
          SELECT a.list_id, dd.d,
                 CAST(SUM(CAST(FLOOR(v.emb[dd.d] * 1e9) AS BIGINT))
                   AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 1e9 AS cmp
          FROM s{i} a JOIN v USING (vec_id)
          CROSS JOIN (SELECT UNNEST(range(1, {dim + 1})) AS d) dd
          GROUP BY a.list_id, dd.d)""")
        parts.append(f"""c{i} AS MATERIALIZED (
          SELECT c.list_id, COALESCE(m.nc, c.cv) AS cv
          FROM c{i - 1} c LEFT JOIN (
            SELECT list_id, list(cmp ORDER BY d) AS nc
            FROM mm{i} GROUP BY list_id) m
          ON m.list_id = c.list_id)""")
    parts.append(f"""sc AS MATERIALIZED (
          SELECT v.vec_id, c.list_id, ROUND({cent_cos}, 6) AS c
          FROM v, c{iters} c)""")
    parts.append("""asg AS (
          SELECT vec_id, list_id AS own FROM (
            SELECT vec_id, list_id,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                     ORDER BY c DESC, list_id ASC) AS rn FROM sc)
          WHERE rn = 1)""")
    parts.append("""po AS (
          SELECT sc.vec_id, asg.own,
                 MAX(CASE WHEN sc.list_id = asg.own THEN sc.c END) AS co,
                 MAX(CASE WHEN sc.list_id <> asg.own THEN sc.c END) AS cb
          FROM sc JOIN asg USING (vec_id) GROUP BY 1, 2)""")
    return ",\n".join(parts) + """
SELECT own AS list_id, COUNT(*) AS n,
       ROUND(AVG(CASE WHEN GREATEST(1.0 - co, 1.0 - cb) > 0
                      THEN (co - cb) / GREATEST(1.0 - co, 1.0 - cb)
                      ELSE 0.0 END), 6) AS mean_silhouette
FROM po GROUP BY 1
"""



def q_rank_flows(spark, sf_dir):
    """Top-50 authority flows: per edge the PageRank mass it carries,
    flow(u→v) = d·rank(u)/outdeg(u) — the per-edge attribution of the
    rank chain (which LINKS move authority, not just which pages have
    it); ranked on the rounded flow (ulp-proof)."""
    from credigraph_spark.graph import pagerank
    from credigraph_spark.graph.adjacency import out_degrees

    edges = _edges(spark, sf_dir)
    ranks, _ = pagerank(edges, max_iter=5, tol=0.0)
    od = out_degrees(edges)
    flows = (edges
             .join(ranks.withColumnRenamed("vid", "src"), "src")
             .join(od.select(F.col("vid").alias("src"), "out_deg"),
                   "src")
             .select("src", "dst",
                     F.round(F.lit(0.85) * F.col("rank")
                             / F.col("out_deg"), 10).alias("flow")))
    return (flows.orderBy(F.col("flow").desc(), "src", "dst")
            .limit(50))


def _rank_flows_sql(k: int = 50) -> str:
    parts = _pagerank5_parts()
    parts.append(
        "fl AS (SELECT e.src, e.dst, "
        "ROUND(0.85 * r.rank / deg.outdeg, 10) AS flow "
        "FROM e JOIN r5 r ON r.vid = e.src "
        "JOIN deg ON deg.vid = e.src)")
    return ",\n".join(parts) + f"""
SELECT src, dst, flow FROM fl
ORDER BY flow DESC, src, dst LIMIT {k}
"""



def q_hop_histogram(spark, sf_dir):
    """Hop-distance histogram from the 3 smallest vids, depth 3
    (bfs_distances rolled to dist → n_vertices): the reachability
    profile behind the effective-diameter readout."""
    from credigraph_spark.graph import bfs_distances

    edges = _edges(spark, sf_dir)
    seeds = (edges.select(F.col("src").alias("vid"))
             .unionByName(edges.select(F.col("dst").alias("vid")))
             .distinct().orderBy("vid").limit(3))
    return (bfs_distances(edges, seeds, max_hops=3)
            .groupBy("dist").agg(F.count("*").alias("n_vertices")))


_HOP_HISTOGRAM_SQL = f"""
WITH RECURSIVE e AS ({_E_SQL}),
verts AS ({_VERTS_SQL}),
s0 AS (SELECT DISTINCT vid FROM verts ORDER BY vid LIMIT 3),
walk(vid, dist) AS (
    SELECT vid, 0 FROM s0
    UNION ALL
    SELECT e.dst, w.dist + 1 FROM walk w
    JOIN e ON e.src = w.vid WHERE w.dist < 3
),
d AS (SELECT vid, MIN(dist) AS dist FROM walk GROUP BY vid)
SELECT dist, COUNT(*) AS n_vertices FROM d GROUP BY 1
"""


_BM25_TERMS = ["merge", "window", "batch"]


def q_bm25_topk(spark, sf_dir):
    """X151: top-20 documents by BM25 (k1=1.2, b=0.75) for a fixed
    3-term probe query — ranked retrieval for curation triage
    (pipeline.retrieval.bm25_topk). Per-term parts rounded to 8 before
    the cross-term sum, final score rounded to 6, doc-id tiebreak."""
    from credigraph_spark.pipeline.retrieval import bm25_topk

    docs = _t(spark, sf_dir, "documents")
    return bm25_topk(docs, _BM25_TERMS, n_docs=docs.count(), k=20)


def _bm25_sql(terms: list[str], k: int = 20,
              k1: float = 1.2, b: float = 0.75) -> str:
    tl = ", ".join(f"'{t}'" for t in terms)
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
  FROM documents),
tok AS (SELECT doc_id, term FROM toks WHERE term <> ''),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1),
ad AS (SELECT SUM(dl) / COUNT(*) AS avgdl FROM dl),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok
       WHERE term IN ({tl}) GROUP BY 1, 2),
dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
parts AS (
  SELECT tf.doc_id,
         CAST(ROUND(ln(1.0 + (n.n - dfq.df + 0.5) / (dfq.df + 0.5))
                    * (tf.tf * {k1 + 1.0})
                    / (tf.tf + {k1} * ({1.0 - b} + {b} * dl.dl / ad.avgdl))
                    * 1e8, 0) AS BIGINT) AS p8
  FROM tf JOIN dfq USING (term) JOIN dl USING (doc_id), ad, n)
SELECT doc_id, ROUND(CAST(SUM(p8) AS BIGINT) / 1e8, 6) AS score FROM parts
GROUP BY 1 ORDER BY score DESC, doc_id ASC LIMIT {k}
"""


def q_prefix_jaccard(spark, sf_dir):
    """X152: top-50 document pairs by exact token-set Jaccard >= 0.9,
    discovered with the LOSSLESS AllPairs/PPJoin prefix filter (index
    only each set's rarest (1-t)|set|+1 tokens under a global df order;
    any pair with J >= t must share a prefix token) — the exact
    counterpart to the df-capped ngram_jaccard_pairs path
    (pipeline.dedup.prefix_jaccard_topk)."""
    from credigraph_spark.pipeline.dedup import prefix_jaccard_topk

    return prefix_jaccard_topk(_t(spark, sf_dir, "documents"),
                               threshold=0.9, k=50)


# Oracle: plain all-pairs exact Jaccard — the prefix filter is lossless,
# so the result sets are identical by construction.
_PREFIX_JACCARD_SQL = """
WITH tok AS (
  SELECT DISTINCT doc_id, t FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t
    FROM documents) WHERE t <> ''),
sz AS (SELECT doc_id, COUNT(*) AS s FROM tok GROUP BY 1),
inter AS (
  SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS c
  FROM tok a JOIN tok b ON a.t = b.t AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
j AS (
  SELECT ia AS id_a, ib AS id_b,
         ROUND(c / CAST(sa.s + sb.s - c AS DOUBLE), 6) AS jaccard
  FROM inter JOIN sz sa ON sa.doc_id = ia JOIN sz sb ON sb.doc_id = ib)
SELECT id_a, id_b, jaccard FROM j WHERE jaccard >= 0.9
ORDER BY jaccard DESC, id_a, id_b LIMIT 50
"""


def q_containment_pairs(spark, sf_dir):
    """X153: asymmetric shingle containment C(a in b) = |A∩B|/|A| — the
    quote/boilerplate/subset detector Jaccard misses (a short doc fully
    embedded in a long one has tiny Jaccard but containment 1.0).
    Candidates from the df-capped inverted index (same blocking as
    ngram_jaccard_pairs), containment EXACT from the full shingle sets;
    ordered pairs (id_a = contained side) at >= 0.8
    (pipeline.dedup.containment_pairs)."""
    from credigraph_spark.pipeline.dedup import containment_pairs

    return containment_pairs(_t(spark, sf_dir, "documents"), threshold=0.8)


# Oracle: all-pairs exact containment, both directions. The df cap (1000)
# never binds at sf<=0.1 (500 docs), so discovery is complete and the
# result sets are identical. common/n_a is an IEEE division of exact
# integers in both engines — bit-identical doubles.
_CONTAINMENT_SQL = f"""
WITH {_SHINGLES_SQL},
x AS (SELECT id, unnest(sh_set) AS sh FROM sets),
sz AS (SELECT id, len(sh_set) AS s FROM sets),
inter AS (
  SELECT a.id AS ia, b.id AS ib, COUNT(*) AS c
  FROM x a JOIN x b ON a.sh = b.sh AND a.id < b.id GROUP BY 1, 2),
bidir AS (
  SELECT ia AS id_a, ib AS id_b, sa.s AS n_a, c AS common
  FROM inter JOIN sz sa ON sa.id = ia
  UNION ALL
  SELECT ib AS id_a, ia AS id_b, sb.s AS n_a, c AS common
  FROM inter JOIN sz sb ON sb.id = ib)
SELECT id_a, id_b, CAST(n_a AS BIGINT) AS n_a,
       CAST(common AS BIGINT) AS common,
       common / CAST(n_a AS DOUBLE) AS containment
FROM bidir WHERE common / CAST(n_a AS DOUBLE) >= 0.8
"""


def q_hamming_prefix(spark, sf_dir):
    """X154: LOSSLESS Hamming near-dup join on the lowercased 24-char
    document prefix, dist <= 2, via pigeonhole chunk blocking: split the
    prefix into dist+1 contiguous chunks — any qualifying pair agrees
    exactly on >= 1 chunk, so an equi-join on (chunk_idx, chunk_text)
    has perfect recall; verify is a JVM zip_with/aggregate, no UDF
    (pipeline.dedup.hamming_prefix_pairs)."""
    from credigraph_spark.pipeline.dedup import hamming_prefix_pairs

    return hamming_prefix_pairs(_t(spark, sf_dir, "documents"),
                                prefix_len=24, max_dist=2)


# Oracle: all-pairs Hamming over the same 24-char lowercased prefix —
# the chunk blocking is lossless, so results are identical. CAST the
# SUM to BIGINT (DuckDB types bare SUM(int) as HUGEINT — round-4 lesson).
_HAMMING_PREFIX_SQL = """
WITH p AS (
  SELECT doc_id, lower(substr(text, 1, 24)) AS pfx
  FROM documents WHERE text IS NOT NULL AND length(text) >= 24),
d AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         CAST((SELECT SUM(CASE WHEN substr(a.pfx, i, 1) <> substr(b.pfx, i, 1)
                          THEN 1 ELSE 0 END)
               FROM generate_series(1, 24) t(i)) AS BIGINT) AS dist
  FROM p a JOIN p b ON a.doc_id < b.doc_id)
SELECT id_a, id_b, dist FROM d WHERE dist <= 2
"""


def q_lm_perplexity(spark, sf_dir):
    """X155: unigram-LM cross-entropy / perplexity filter (CCNet shape,
    Wenzek et al. 2020) — corpus-trained unigram MLE, per-doc
    H = -(1/n) sum log2 p(tok), ppl = 2^H, fixed-width H bucket for the
    curation histogram (pipeline.textstats.lm_cross_entropy). ppl and
    the bucket derive from the ROUNDED H so engines can never disagree
    on the derived columns."""
    from credigraph_spark.pipeline.textstats import lm_cross_entropy

    return lm_cross_entropy(_t(spark, sf_dir, "documents"))


# Oracle: identical tokenizer (lower + split on [^a-z0-9']+), exact
# integer tf/vocab counts, the one float sum rounded to 6 (dsir logw
# contract); ppl/h_bucket computed FROM the rounded h_bits.
_LM_PPL_SQL = """
WITH toks AS (
  SELECT doc_id, t AS tok
  FROM (SELECT doc_id,
               unnest(regexp_split_to_array(lower(text), '[^a-z0-9'']+')) AS t
        FROM documents)
  WHERE t <> ''),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
vocab AS (SELECT tok, CAST(SUM(tf) AS BIGINT) AS c FROM tf GROUP BY 1),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM vocab),
lp AS (SELECT tok, log2(CAST(c AS DOUBLE) / (SELECT n FROM tot)) AS logp
       FROM vocab),
pd AS (SELECT tf.doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
              ROUND(-SUM(tf * lp.logp) / SUM(tf), 6) AS h_bits
       FROM tf JOIN lp USING (tok) GROUP BY 1)
SELECT d.doc_id,
       COALESCE(pd.n_tokens, 0) AS n_tokens,
       COALESCE(pd.h_bits, 0.0) AS h_bits,
       ROUND(POWER(2.0, COALESCE(pd.h_bits, 0.0)), 6) AS ppl,
       CAST(FLOOR(COALESCE(pd.h_bits, 0.0) / 0.5) AS BIGINT) AS h_bucket
FROM documents d LEFT JOIN pd USING (doc_id)
"""


def _pii_inject(docs):
    """Deterministic PII injection for the driver check (the synthetic
    corpus is digit-free, so without this the scrub would be vacuously
    green): docs with doc_id%7==0 get an email, %5==0 an IPv4, %3==0 a
    phone — mirrored verbatim in the oracle SQL."""
    t = F.col("text")
    t = F.when(F.col("doc_id") % 7 == 0,
               F.concat(t, F.lit(" contact user"),
                        F.col("doc_id").cast("string"),
                        F.lit("@example.com"))).otherwise(t)
    t = F.when(F.col("doc_id") % 5 == 0,
               F.concat(t, F.lit(" from 10.0."),
                        (F.col("doc_id") % 200).cast("string"),
                        F.lit(".17"))).otherwise(t)
    t = F.when(F.col("doc_id") % 3 == 0,
               F.concat(t, F.lit(" call +555 0100 "),
                        (F.col("doc_id") % 90 + 10).cast("string"))).otherwise(t)
    return docs.withColumn("text", t)


def q_pii_scrub(spark, sf_dir):
    """X156: PII screen + redaction (RefinedWeb/Dolma scrub stage) —
    email/IPv4/phone counts on the original text, fixed redaction chain,
    sha256 of the redacted text (pipeline.safety.pii_scrub). Regex
    subset chosen for java.util.regex == RE2 semantics."""
    from credigraph_spark.pipeline.safety import pii_scrub

    return pii_scrub(_pii_inject(_t(spark, sf_dir, "documents")))


_PII_SQL = r"""
WITH inj AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 7 = 0
          THEN text || ' contact user' || doc_id || '@example.com'
          ELSE text END)
    || (CASE WHEN doc_id % 5 = 0
             THEN ' from 10.0.' || (doc_id % 200) || '.17' ELSE '' END)
    || (CASE WHEN doc_id % 3 = 0
             THEN ' call +555 0100 ' || (doc_id % 90 + 10) ELSE '' END)
    AS text
  FROM documents),
pat AS (SELECT doc_id, text,
  '[a-zA-Z0-9._%+\-]+@[a-zA-Z0-9.\-]+\.[a-zA-Z]{2,}' AS em,
  '\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}' AS ip,
  '\+\d[\d\- ]{7,}\d' AS ph
  FROM inj)
SELECT doc_id,
  CAST(length(regexp_extract_all(text, em)) AS BIGINT) AS n_emails,
  CAST(length(regexp_extract_all(text, ip)) AS BIGINT) AS n_ipv4,
  CAST(length(regexp_extract_all(text, ph)) AS BIGINT) AS n_phones,
  (length(regexp_extract_all(text, em)) + length(regexp_extract_all(text, ip))
   + length(regexp_extract_all(text, ph))) > 0 AS has_pii,
  sha256(regexp_replace(regexp_replace(regexp_replace(
     text, em, '<EMAIL>', 'g'), ip, '<IP>', 'g'), ph, '<PHONE>', 'g'))
    AS redacted_sha
FROM pat
"""


def q_blocklist_screen(spark, sf_dir):
    """X157: C4-style blocklist token screen — per-doc blocked-token
    count/fraction and keep flag over a literal blocklist
    (pipeline.safety.blocklist_screen)."""
    from credigraph_spark.pipeline.safety import blocklist_screen

    return blocklist_screen(_t(spark, sf_dir, "documents"),
                            blocklist=["slow", "junk", "stale"],
                            max_frac=0.02)


_BLOCKLIST_SQL = """
WITH toks AS (
  SELECT doc_id, t AS tok
  FROM (SELECT doc_id,
               unnest(regexp_split_to_array(lower(text), '[^a-z0-9'']+')) AS t
        FROM documents)
  WHERE t <> ''),
pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN tok IN ('slow', 'junk', 'stale')
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked
       FROM toks GROUP BY 1)
SELECT d.doc_id,
  COALESCE(pd.n_tokens, 0) AS n_tokens,
  COALESCE(pd.n_blocked, 0) AS n_blocked,
  CASE WHEN COALESCE(pd.n_tokens, 0) > 0
       THEN ROUND(CAST(pd.n_blocked AS DOUBLE) / pd.n_tokens, 8)
       ELSE 0.0 END AS blocked_frac,
  CASE WHEN COALESCE(pd.n_tokens, 0) > 0
       THEN (CAST(pd.n_blocked AS DOUBLE) / pd.n_tokens) <= 0.02
       ELSE TRUE END AS keep
FROM documents d LEFT JOIN pd USING (doc_id)
"""


def q_bigram_perplexity(spark, sf_dir):
    """X158: interpolated bigram-LM cross-entropy (Jelinek-Mercer
    lam=0.7, corpus-trained) — the KenLM-filter join shape: bigram tf ->
    broadcast context-count + continuation-unigram joins -> per-doc NLL
    (pipeline.textstats.bigram_cross_entropy)."""
    from credigraph_spark.pipeline.textstats import bigram_cross_entropy

    return bigram_cross_entropy(_t(spark, sf_dir, "documents"), lam=0.7)


# Oracle: identical tokenizer; bigrams via list_zip of adjacent slices;
# p = 0.7*c_vw/c_v + (1.0-0.7)*c_w/n_bg with the SAME literal arithmetic
# shape as the Spark plan (1.0-0.7 evaluated in IEEE on both engines);
# the one float sum rounded to 6, ppl2 derived from the ROUNDED h2.
_BIGRAM_PPL_SQL = """
WITH toks AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9'']+'),
                     x -> x <> '') AS a
  FROM documents),
bg0 AS (SELECT doc_id,
               unnest(list_zip(a[1:len(a)-1], a[2:len(a)])) AS p
        FROM toks),
bg AS (SELECT doc_id, p[1] AS v, p[2] AS w FROM bg0),
tf AS (SELECT doc_id, v, w, COUNT(*) AS tf FROM bg GROUP BY 1, 2, 3),
model AS (SELECT v, w, CAST(SUM(tf) AS BIGINT) AS c_vw FROM tf GROUP BY 1, 2),
ctx AS (SELECT v, CAST(SUM(c_vw) AS BIGINT) AS c_v FROM model GROUP BY 1),
uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c_w FROM bg GROUP BY 1),
nbg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bg FROM bg),
lp AS (SELECT model.v, model.w,
              log2(0.7 * c_vw / c_v
                   + (1.0 - 0.7) * c_w / (SELECT n_bg FROM nbg)) AS logp
       FROM model JOIN ctx USING (v) JOIN uni ON uni.w = model.w),
pd AS (SELECT tf.doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
              ROUND(-SUM(tf * lp.logp) / SUM(tf), 6) AS h2_bits
       FROM tf JOIN lp ON lp.v = tf.v AND lp.w = tf.w GROUP BY 1)
SELECT d.doc_id,
       COALESCE(pd.n_bigrams, 0) AS n_bigrams,
       COALESCE(pd.h2_bits, 0.0) AS h2_bits,
       ROUND(POWER(2.0, COALESCE(pd.h2_bits, 0.0)), 6) AS ppl2
FROM documents d LEFT JOIN pd USING (doc_id)
"""


def q_clique_percolation(spark, sf_dir):
    """X159: k=3 clique-percolation communities (Palla et al. 2005) on
    an md5-coin edge sample (keep iff first md5 hex char <= '2' — the
    dense lineitem graph is one triangle blob at full density; the
    deterministic sample yields a real multi-community structure).
    Bipartite triangle<->edge incidence CC, no pairwise triangle join
    (graph/triangles.py:clique_percolation_k3)."""
    from credigraph_spark.graph.triangles import clique_percolation_k3

    e = _edges(spark, sf_dir)
    cnd = e.select(F.least("src", "dst").alias("a"),
                   F.greatest("src", "dst").alias("b")).distinct()
    kept = cnd.where(F.substring(F.md5(F.concat_ws(
        ":", F.col("a").cast("string"), F.col("b").cast("string"))),
        1, 1) <= "2")
    return clique_percolation_k3(
        kept.select(F.col("a").alias("src"), F.col("b").alias("dst")))


_CPM_SQL = f"""
WITH RECURSIVE ec AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM ({_E_SQL})),
s AS (SELECT a, b FROM ec WHERE substr(md5(a || ':' || b), 1, 1) <= '2'),
t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
      FROM s e1 JOIN s e2 ON e2.a = e1.b
      JOIN s e3 ON e3.a = e1.a AND e3.b = e2.b),
tk AS (SELECT x, y, z, 't:' || x || ':' || y || ':' || z AS tkey FROM t),
inc AS (
  SELECT tkey, 'e:' || x || ':' || y AS ekey FROM tk
  UNION ALL SELECT tkey, 'e:' || x || ':' || z FROM tk
  UNION ALL SELECT tkey, 'e:' || y || ':' || z FROM tk),
star AS (SELECT ekey, MIN(tkey) AS hub FROM inc GROUP BY 1),
g AS (SELECT i.tkey AS src, st.hub AS dst
      FROM inc i JOIN star st ON st.ekey = i.ekey WHERE i.tkey <> st.hub),
und AS (SELECT src, dst FROM g UNION SELECT dst, src FROM g),
r(vid, label) AS (
  SELECT src, src FROM und
  UNION
  SELECT und.dst, r.label FROM r JOIN und ON und.src = r.vid
  WHERE r.label < und.dst),
comp AS (SELECT vid, MIN(label) AS component FROM r GROUP BY vid),
mem AS (SELECT x AS vid, tkey FROM tk
        UNION SELECT y, tkey FROM tk
        UNION SELECT z, tkey FROM tk)
SELECT DISTINCT mem.vid, COALESCE(comp.component, mem.tkey) AS community
FROM mem LEFT JOIN comp ON comp.vid = mem.tkey
"""


def q_bpe_merges(spark, sf_dir):
    """X160: first-3 BPE tokenizer merges learned from the corpus
    word-frequency dict (Sennrich et al. 2016) — one data-sized groupBy,
    then vocab-sized merge rounds with a 1-row argmax action each
    (pipeline.textstats.bpe_learn)."""
    from credigraph_spark.pipeline.textstats import bpe_learn

    return bpe_learn(_t(spark, sf_dir, "documents"), n_merges=3)


def _bpe_sql(n_merges: int = 3) -> str:
    """Unrolled merge rounds (the IVF-oracle convention): each round a
    deterministic argmax (freq DESC, lhs, rhs) + a literal
    bracket-delimited replace on the vocab state."""
    ctes = ["""words AS (
  SELECT t AS w, COUNT(*) AS cnt
  FROM (SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9'']+')) AS t
        FROM documents)
  WHERE t <> '' GROUP BY 1)""", """v0 AS (
  SELECT cnt, '<' || array_to_string(string_split(w, ''), '><') || '>' AS state
  FROM words)"""]
    sel = []
    for i in range(1, n_merges + 1):
        prev = f"v{i - 1}"
        ctes.append(f"""p{i} AS (
  SELECT cnt, unnest(list_zip(s[1:len(s)-1], s[2:len(s)])) AS p
  FROM (SELECT cnt,
          string_split(substr(state, 2, length(state) - 2), '><') AS s
        FROM {prev})
  WHERE len(s) >= 2)""")
        ctes.append(f"""b{i} AS (
  SELECT p[1] AS lhs, p[2] AS rhs, CAST(SUM(cnt) AS BIGINT) AS freq
  FROM p{i} GROUP BY 1, 2 ORDER BY freq DESC, lhs ASC, rhs ASC LIMIT 1)""")
        ctes.append(f"""v{i} AS (
  SELECT cnt, replace(state, '<' || b.lhs || '><' || b.rhs || '>',
                      '<' || b.lhs || b.rhs || '>') AS state
  FROM {prev}, b{i} b)""")
        sel.append(f"SELECT {i} AS rank, lhs, rhs, freq FROM b{i}")
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(sel)


def q_bpe_fertility(spark, sf_dir):
    """X161: tokenizer fertility after the first-3 learned BPE merges —
    per-doc word count, subword count, subwords/word
    (pipeline.textstats.bpe_fertility). The encode is a literal-replace
    chain on the delimited word state, zero shuffle."""
    from credigraph_spark.pipeline.textstats import bpe_fertility

    return bpe_fertility(_t(spark, sf_dir, "documents"), n_merges=3)


def _bpe_fertility_sql(n_merges: int = 3) -> str:
    """Compose the bpe merge-chain CTEs with a per-doc encode: the
    replace chain is applied with b1..bN via 1-row cross joins."""
    chain = _bpe_sql(n_merges)
    ctes = chain[len("WITH "):chain.index("\nSELECT 1 AS rank")]
    expr = ("'<' || array_to_string(string_split(w, ''), '><') || '>'")
    joins = ""
    for i in range(1, n_merges + 1):
        expr = (f"replace({expr}, '<' || b{i}.lhs || '><' || b{i}.rhs || '>',"
                f" '<' || b{i}.lhs || b{i}.rhs || '>')")
        joins += f", b{i}"
    return f"""WITH {ctes},
docw AS (
  SELECT doc_id, t AS w
  FROM (SELECT doc_id,
               unnest(regexp_split_to_array(lower(text), '[^a-z0-9'']+')) AS t
        FROM documents)
  WHERE t <> ''),
enc AS (
  SELECT doc_id,
         len(string_split(substr(s, 2, length(s) - 2), '><')) AS n_sub
  FROM (SELECT doc_id, {expr} AS s FROM docw{joins})),
pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
              CAST(SUM(n_sub) AS BIGINT) AS n_subwords
       FROM enc GROUP BY 1)
SELECT d.doc_id,
       COALESCE(pd.n_words, 0) AS n_words,
       COALESCE(pd.n_subwords, 0) AS n_subwords,
       CASE WHEN COALESCE(pd.n_words, 0) > 0
            THEN ROUND(CAST(pd.n_subwords AS DOUBLE) / pd.n_words, 8)
            ELSE 0.0 END AS fertility
FROM documents d LEFT JOIN pd USING (doc_id)"""


def q_status_pivot(spark, sf_dir):
    """X162: groupBy().pivot() wide reporting table — order counts and
    total price per (priority x status), status pivoted to columns with
    an EXPLICIT value list (['F','O','P']) so Spark skips the extra
    distinct-collect pass and the schema is fixed at plan time (the
    100 TB rule for pivot: never let it scan for values). Compiles to
    ONE partial-aggregated HashAggregate — same physical shape as the
    rollup query."""
    o = _t(spark, sf_dir, "orders")
    piv = (o.groupBy("o_orderpriority")
           .pivot("o_orderstatus", ["F", "O", "P"])
           .agg(F.count(F.lit(1)).alias("n"),
                F.round(F.sum("o_totalprice"), 2).alias("total")))
    # pivot names columns F_n/F_total/...; normalize + null-fill zeros
    return piv.select(
        F.col("o_orderpriority").alias("priority"),
        *[F.coalesce(F.col(f"{s}_n"), F.lit(0).cast("long")).alias(f"n_{s.lower()}")
          for s in ("F", "O", "P")],
        *[F.coalesce(F.col(f"{s}_total"), F.lit(0.0)).alias(f"total_{s.lower()}")
          for s in ("F", "O", "P")])


_PIVOT_SQL = """
SELECT o_orderpriority AS priority,
  CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
  CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
  CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p,
  COALESCE(ROUND(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 2), 0.0) AS total_f,
  COALESCE(ROUND(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 2), 0.0) AS total_o,
  COALESCE(ROUND(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 2), 0.0) AS total_p
FROM orders GROUP BY 1
"""


def q_matching_3round(spark, sf_dir):
    """X163: greedy maximal matching, 3 synchronous min-neighbour
    proposal rounds (handshake matching — the METIS-coarsening
    primitive); round-bounded for mid-convergence determinism
    (graph/matching.py:greedy_matching)."""
    from credigraph_spark.graph.matching import greedy_matching

    return greedy_matching(_edges(spark, sf_dir), rounds=3)


def _matching_sql(rounds: int = 3) -> str:
    ctes = [f"e0 AS ({_UND_SQL})"]
    sel = []
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(f"p{i} AS (SELECT src, MIN(dst) AS prop "
                    f"FROM e{p} GROUP BY 1)")
        ctes.append(f"m{i} AS (SELECT a.src AS u, a.prop AS v FROM p{i} a "
                    f"JOIN p{i} b ON b.src = a.prop AND b.prop = a.src "
                    f"WHERE a.src < a.prop)")
        ctes.append(f"g{i} AS (SELECT u AS vid FROM m{i} "
                    f"UNION SELECT v FROM m{i})")
        ctes.append(f"e{i} AS (SELECT src, dst FROM e{p} "
                    f"WHERE src NOT IN (SELECT vid FROM g{i}) "
                    f"AND dst NOT IN (SELECT vid FROM g{i}))")
        sel.append(f"SELECT u, v FROM m{i}")
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL ".join(sel)


def q_skew_report(spark, sf_dir):
    """X164: join-key skew diagnostics on the edge table's dst (the
    salting decision input): per-key count disc-quantiles, hottest key
    + row share, exact Gini from the count-of-counts histogram — all
    integer math until the two final divisions
    (analytics.skew_report)."""
    from credigraph_spark.analytics import skew_report

    return skew_report(_edges(spark, sf_dir), "dst")


_SKEW_SQL = f"""
WITH pk AS (SELECT dst AS k, COUNT(*) AS cnt FROM ({_E_SQL}) GROUP BY 1),
hist AS (SELECT cnt, COUNT(*) AS nk FROM pk GROUP BY 1),
h AS (SELECT cnt, nk,
        COALESCE(SUM(nk) OVER (ORDER BY cnt
          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM hist),
agg AS (SELECT CAST(SUM(cnt * nk) AS BIGINT) AS n_rows,
               CAST(SUM(nk) AS BIGINT) AS n_keys,
               CAST(MAX(cnt) AS BIGINT) AS max_cnt,
               SUM(cnt * (nk * cum_before + nk * (nk + 1) / 2.0)) AS g_num
        FROM h),
top AS (SELECT CAST(k AS VARCHAR) AS top_key, cnt AS top_cnt FROM pk
        ORDER BY cnt DESC, k ASC LIMIT 1)
SELECT n_rows, n_keys, max_cnt,
  (SELECT CAST(MIN(cnt) AS BIGINT) FROM h
   WHERE cum_before + nk >= CEIL(0.5 * agg.n_keys)) AS p50_cnt,
  (SELECT CAST(MIN(cnt) AS BIGINT) FROM h
   WHERE cum_before + nk >= CEIL(0.9 * agg.n_keys)) AS p90_cnt,
  (SELECT CAST(MIN(cnt) AS BIGINT) FROM h
   WHERE cum_before + nk >= CEIL(0.99 * agg.n_keys)) AS p99_cnt,
  ROUND(2.0 * g_num / (n_keys * n_rows) - (n_keys + 1.0) / n_keys, 6)
    AS gini,
  top.top_key,
  ROUND(CAST(top.top_cnt AS DOUBLE) / n_rows, 8) AS top_frac
FROM agg, top
"""


def q_naive_bayes(spark, sf_dir):
    """X165: multinomial Naive Bayes language classifier (add-1
    smoothing, log(1+c) rewrite so unseen tokens cost an INNER join
    nothing), trained on doc_id %% 5 != 0, scored on the held-out rest
    (pipeline.classify.naive_bayes_lang). The synthetic corpus's lang
    labels are text-independent, so accuracy here is chance — this
    fixture checks the MATH cross-engine; the learnability proof is the
    separable-fixture pytest."""
    from credigraph_spark.pipeline.classify import naive_bayes_lang

    return naive_bayes_lang(_t(spark, sf_dir, "documents"))


_NB_SQL = """
WITH tf AS (
  SELECT doc_id, label, tr, tok, COUNT(*) AS tf
  FROM (SELECT doc_id, lang AS label, doc_id % 5 <> 0 AS tr,
               unnest(regexp_split_to_array(lower(text), '[^a-z0-9'']+')) AS tok
        FROM documents)
  WHERE tok <> '' GROUP BY 1, 2, 3, 4),
ct AS (SELECT label, tok, CAST(SUM(tf) AS BIGINT) AS c
       FROM tf WHERE tr GROUP BY 1, 2),
cls AS (SELECT label, CAST(SUM(tf) AS BIGINT) AS n_c
        FROM tf WHERE tr GROUP BY 1),
vv AS (SELECT COUNT(DISTINCT tok) AS v FROM ct),
ntd AS (SELECT COUNT(*) AS n FROM documents WHERE doc_id % 5 <> 0),
pri AS (SELECT d.lang AS cls,
               ln(COUNT(*) / CAST((SELECT n FROM ntd) AS DOUBLE)) AS logprior,
               ln(ANY_VALUE(cls.n_c)
                  + CAST((SELECT v FROM vv) AS DOUBLE)) AS logden
        FROM documents d JOIN cls ON cls.label = d.lang
        WHERE d.doc_id % 5 <> 0 GROUP BY 1),
seen AS (SELECT tf.doc_id, ct.label AS cls,
                SUM(tf * ln(1.0 + ct.c)) AS s_seen
         FROM tf JOIN ct USING (tok)
         WHERE NOT tf.tr GROUP BY 1, 2),
nd AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_d
       FROM tf WHERE NOT tr GROUP BY 1),
grid AS (SELECT nd.doc_id, pri.cls,
                ROUND(pri.logprior + COALESCE(seen.s_seen, 0.0)
                      - nd.n_d * pri.logden, 6) AS score
         FROM nd CROSS JOIN pri
         LEFT JOIN seen ON seen.doc_id = nd.doc_id AND seen.cls = pri.cls),
pred AS (SELECT doc_id, cls AS pred FROM (
           SELECT doc_id, cls,
                  ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, cls ASC) AS r
           FROM grid) WHERE r = 1)
SELECT d.doc_id, d.lang AS label,
       COALESCE(p.pred, '') AS pred,
       COALESCE(p.pred, '') = d.lang AS correct
FROM documents d LEFT JOIN pred p USING (doc_id)
WHERE d.doc_id % 5 = 0
"""


def q_logreg_gd(spark, sf_dir):
    """X166: binary logistic regression by QUANTIZED full-batch
    gradient descent (3 iterations, lr=0.5 — a power of two, so the
    scale step is IEEE-exact): predict lang=='en' from document length
    + source features (pipeline.classify.logistic_regression_gd).
    Gradients/betas rounded every step so the run replays
    bit-identically in the unrolled SQL oracle."""
    from credigraph_spark.pipeline.classify import logistic_regression_gd

    docs = _t(spark, sf_dir, "documents")
    return logistic_regression_gd(
        docs,
        {"x_len": F.length("text") / 1000.0,
         "x_src": (F.col("source") == "web").cast("double")},
        label=(F.col("lang") == "en"), iters=3, lr=0.5)


def _logreg_sql(iters: int = 3, lr: float = 0.5) -> str:
    ctes = ["""d AS (
  SELECT CAST(lang = 'en' AS DOUBLE) AS y,
         length(text) / 1000.0 AS x1,
         CASE WHEN source = 'web' THEN 1.0 ELSE 0.0 END AS x2
  FROM documents)""",
            "b0 AS (SELECT 0.0 AS c0, 0.0 AS c1, 0.0 AS c2)"]
    for i in range(1, iters + 1):
        p = i - 1
        q = ("CAST(SUM(CAST(FLOOR(({expr}) * 1000000000.0) "
             "AS DECIMAL(38,0))) AS DOUBLE) "
             "/ (1000000000.0 * (SELECT COUNT(*) FROM d))")
        sig = "1.0/(1.0+exp(-(b.c0 + b.c1*x1 + b.c2*x2))) - y"
        ctes.append(f"""g{i} AS (
  SELECT ROUND({q.format(expr=sig)}, 6) AS g0,
         ROUND({q.format(expr='x1 * (' + sig + ')')}, 6) AS g1,
         ROUND({q.format(expr='x2 * (' + sig + ')')}, 6) AS g2
  FROM d, b{p} b)""")
        ctes.append(f"""b{i} AS (
  SELECT ROUND(b.c0 - {lr} * g.g0, 7) AS c0,
         ROUND(b.c1 - {lr} * g.g1, 7) AS c1,
         ROUND(b.c2 - {lr} * g.g2, 7) AS c2
  FROM b{p} b, g{i} g)""")
    return ("WITH " + ",\n".join(ctes)
            + f"""\nSELECT 'intercept' AS feature, c0 AS beta FROM b{iters}
UNION ALL SELECT 'x_len', c1 FROM b{iters}
UNION ALL SELECT 'x_src', c2 FROM b{iters}""")


def q_embeddedness(spark, sf_dir):
    """X167: per-edge embeddedness / Granovetter tie strength —
    neighbourhood Jaccard per edge; common from the degree-ordered
    oriented triangle join, union exact from degrees
    (graph/triangles.py:edge_embeddedness). emb=0 rows are the
    weak-tie bridges."""
    from credigraph_spark.graph.triangles import edge_embeddedness

    return edge_embeddedness(_edges(spark, sf_dir))


_EMB_SQL = f"""
WITH ec AS (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM ({_E_SQL})),
und AS (SELECT a AS src, b AS dst FROM ec UNION ALL SELECT b, a FROM ec),
deg AS (SELECT src, COUNT(*) AS deg FROM und GROUP BY 1),
cm AS (SELECT e.a, e.b, CAST(COUNT(*) AS BIGINT) AS common
       FROM ec e JOIN und x ON x.src = e.a
       JOIN und y ON y.src = e.b AND y.dst = x.dst
       GROUP BY 1, 2)
SELECT e.a AS src, e.b AS dst,
  COALESCE(cm.common, 0) AS common,
  ROUND(COALESCE(cm.common, 0)
        / CAST(da.deg + db.deg - 2 - COALESCE(cm.common, 0) AS DOUBLE), 8)
    AS emb
FROM ec e JOIN deg da ON da.src = e.a JOIN deg db ON db.src = e.b
LEFT JOIN cm ON cm.a = e.a AND cm.b = e.b
"""


def q_hll_distinct(spark, sf_dir):
    """X168: HyperLogLog distinct users per event type (b=6, 64
    registers) next to the KMV sketch — no distinct pre-pass, max(rho)
    absorbs duplicates map-side; register sum is exact dyadic so the
    ESTIMATE oracle-checks, not just its error bound
    (pipeline.sketch.hll_distinct)."""
    from credigraph_spark.pipeline.sketch import hll_distinct

    return hll_distinct(_t(spark, sf_dir, "events"),
                        ["event_type"], "user_id", b=6)


def _hll_sql(b: int = 6, seed: int = 7) -> str:
    m = 1 << b
    alpha_m2 = repr(0.7213 / (1.0 + 1.079 / m) * m * m)
    wmod = 1 << 52
    return f"""
WITH rws AS (
  SELECT event_type,
    ('0x' || substr(md5('{seed}:' || CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM events WHERE user_id IS NOT NULL),
regs AS (SELECT event_type, h % {m} AS bucket,
  CASE WHEN (h // {m}) % {wmod} = 0 THEN 53
       ELSE 53 - length(bin((h // {m}) % {wmod})) END AS rho
  FROM rws),
mx AS (SELECT event_type, bucket, MAX(rho) AS reg FROM regs GROUP BY 1, 2),
per AS (SELECT event_type, COUNT(*) AS n_present,
               SUM(POWER(2.0, -reg)) AS s_present FROM mx GROUP BY 1),
ex AS (SELECT event_type, COUNT(DISTINCT user_id) AS n_exact
       FROM events WHERE user_id IS NOT NULL GROUP BY 1),
c AS (SELECT ex.event_type, ex.n_exact,
  CASE WHEN ({alpha_m2} / (s_present + {m} - n_present)) <= {2.5 * m}
            AND ({m} - n_present) > 0
       THEN {float(m)} * ln({float(m)} / ({m} - n_present))
       ELSE {alpha_m2} / (s_present + {m} - n_present) END AS est
  FROM ex JOIN per USING (event_type))
SELECT event_type, n_exact, ROUND(est, 6) AS hll_estimate,
       ROUND(ABS(est - n_exact) / n_exact, 6) AS rel_err
FROM c
"""


def q_dcsbm_loglik(spark, sf_dir):
    """X170: degree-corrected SBM log-likelihood (Karrer-Newman) of the
    LPA-3-iteration labeling — the resolution-limit-free community
    quality score next to lpa_modularity (analytics.dcsbm_loglik).
    Oracle: the lpa_3iter CTE chain composed with the block-pair
    aggregation; quantized decimal term sum for order independence."""
    from credigraph_spark.analytics import dcsbm_loglik
    from credigraph_spark.graph import label_propagation

    edges = _edges(spark, sf_dir)
    labels, _ = label_propagation(edges, max_iter=3)
    return dcsbm_loglik(edges, labels, label_col="label")


def _dcsbm_sql() -> str:
    """lpa_3iter labeling composed with the DC-SBM block-pair
    log-likelihood over the canonical undirected simple graph."""
    return f"""{_lpa3_cte()},
cnd AS (SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM ({_E_SQL})),
deg AS (SELECT vid, COUNT(*) AS deg FROM
        (SELECT a AS vid FROM cnd UNION ALL SELECT b FROM cnd)
        GROUP BY vid),
lab AS (SELECT vid, label AS c FROM l3),
kap AS (SELECT l.c, SUM(d.deg) AS kappa FROM deg d
        JOIN lab l ON l.vid = d.vid GROUP BY l.c),
pr AS (SELECT LEAST(la.c, lb.c) AS r, GREATEST(la.c, lb.c) AS s,
              COUNT(*) AS n
       FROM cnd JOIN lab la ON la.vid = cnd.a
       JOIN lab lb ON lb.vid = cnd.b GROUP BY 1, 2),
t AS (SELECT pr.n,
             2.0 * pr.n * (ln(CASE WHEN pr.r = pr.s THEN 2.0 * pr.n
                                   ELSE pr.n * 1.0 END)
                           - ln(kr.kappa * 1.0) - ln(ks.kappa * 1.0)) AS t
      FROM pr JOIN kap kr ON kr.c = pr.r JOIN kap ks ON ks.c = pr.s)
SELECT CAST(SUM(n) AS BIGINT) AS n_edges,
       (SELECT COUNT(*) FROM kap) AS n_blocks,
       ROUND(CAST(SUM(CAST(FLOOR(t * 1000000000.0) AS DECIMAL(38,0)))
                  AS DOUBLE) / 1000000000.0, 6) AS dcsbm_ll
FROM t
"""


def q_tri_incremental(spark, sf_dir):
    """X171: incremental triangle maintenance — new triangles created
    by the l_linenumber=1 edge batch arriving on the l_linenumber>1
    base graph, WITHOUT re-enumerating base triangles; broken down by
    how many new edges each triangle uses
    (graph.triangles.incremental_triangles)."""
    from credigraph_spark.graph.triangles import incremental_triangles

    li = _t(spark, sf_dir, "lineitem")
    base = li.where("l_linenumber > 1").select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst"))
    delta = li.where("l_linenumber = 1").select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst"))
    return incremental_triangles(base, delta)


_TRI_INC_SQL = """
WITH b0 AS (
  SELECT DISTINCT LEAST(l_partkey, l_suppkey) AS a,
                  GREATEST(l_partkey, l_suppkey) AS b
  FROM lineitem
  WHERE l_partkey <> l_suppkey AND l_partkey IS NOT NULL
    AND l_suppkey IS NOT NULL AND l_linenumber > 1),
d0 AS (
  SELECT DISTINCT LEAST(l_partkey, l_suppkey) AS a,
                  GREATEST(l_partkey, l_suppkey) AS b
  FROM lineitem
  WHERE l_partkey <> l_suppkey AND l_partkey IS NOT NULL
    AND l_suppkey IS NOT NULL AND l_linenumber = 1),
dn AS MATERIALIZED (
  SELECT a, b FROM d0
  WHERE NOT EXISTS (SELECT 1 FROM b0 WHERE b0.a = d0.a AND b0.b = d0.b)),
u AS (SELECT a, b FROM b0 UNION SELECT a, b FROM dn),
und AS (SELECT a AS s, b AS d FROM u UNION ALL SELECT b, a FROM u),
tt AS (
  SELECT DISTINCT LEAST(dn.a, x.d) AS x,
         dn.a + dn.b + x.d - LEAST(dn.a, x.d)
                           - GREATEST(dn.b, x.d) AS y,
         GREATEST(dn.b, x.d) AS z
  FROM dn JOIN und x ON x.s = dn.a
  JOIN und y ON y.s = dn.b AND y.d = x.d),
fl AS (
  SELECT
    CAST(EXISTS (SELECT 1 FROM dn WHERE dn.a = tt.x AND dn.b = tt.y)
         AS INT)
    + CAST(EXISTS (SELECT 1 FROM dn WHERE dn.a = tt.x AND dn.b = tt.z)
           AS INT)
    + CAST(EXISTS (SELECT 1 FROM dn WHERE dn.a = tt.y AND dn.b = tt.z)
           AS INT) AS n_new
  FROM tt)
SELECT (SELECT COUNT(*) FROM b0) AS n_base_edges,
       (SELECT COUNT(*) FROM dn) AS n_new_edges,
       CAST(COALESCE(SUM(CASE WHEN n_new = 1 THEN 1 END), 0) AS BIGINT)
         AS tri_1new,
       CAST(COALESCE(SUM(CASE WHEN n_new = 2 THEN 1 END), 0) AS BIGINT)
         AS tri_2new,
       CAST(COALESCE(SUM(CASE WHEN n_new = 3 THEN 1 END), 0) AS BIGINT)
         AS tri_3new,
       COUNT(*) AS new_triangles
FROM fl
"""


def q_mixture_weights(spark, sf_dir):
    """X172: temperature-sampled data-mixing weights per source
    (alpha=0.5): p_s = sqrt(n_s)/Σsqrt(n_t), expected epochs at a 1M
    token budget, and boost over proportional sampling
    (pipeline.sampling.mixture_weights). sqrt is IEEE-correctly-rounded
    on every engine, so the table oracle-checks bit-exactly."""
    from credigraph_spark.pipeline.sampling import mixture_weights

    return mixture_weights(_t(spark, sf_dir, "documents"),
                           group_col="source", budget_tokens=1_000_000)


_MIX_SQL = """
WITH per AS (
  SELECT source,
         CAST(SUM(len(list_filter(
           regexp_split_to_array(lower(text), '[^a-z0-9'']+'),
           t -> t <> ''))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1),
tot AS (
  SELECT CAST(SUM(n_tokens) AS BIGINT) AS nt,
         CAST(SUM(CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE))
                             * 1000000000.0) AS DECIMAL(38,0)))
              AS DOUBLE) / 1000000000.0 AS sw
  FROM per)
SELECT source, n_tokens,
  ROUND(sqrt(CAST(n_tokens AS DOUBLE)) / tot.sw, 8) AS p_sample,
  ROUND(1000000.0 * ROUND(sqrt(CAST(n_tokens AS DOUBLE)) / tot.sw, 8)
        / CAST(n_tokens AS DOUBLE), 6) AS epochs,
  ROUND(ROUND(sqrt(CAST(n_tokens AS DOUBLE)) / tot.sw, 8)
        * CAST(tot.nt AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS boost
FROM per, tot
ORDER BY source
"""


def q_egonet_anomaly(spark, sf_dir):
    """X173: OddBall egonet anomaly top-20 — per-vertex egonet
    (n = degree, e = degree + triangles), log-log OLS power-law fit
    with quantized moment sums, |log-residual| ranking
    (graph.triangles.egonet_anomaly). Near-cliques and star centres
    surface first."""
    from credigraph_spark.graph.triangles import egonet_anomaly

    return egonet_anomaly(_edges(spark, sf_dir), top_k=20)


_EGONET_SQL = f"""
WITH cnd AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
             FROM ({_E_SQL})),
tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM cnd e1
        JOIN cnd e2 ON e1.a = e2.a AND e1.b < e2.b
        JOIN cnd e3 ON e3.a = e1.b AND e3.b = e2.b),
pv AS (SELECT x AS vid FROM tri UNION ALL SELECT y FROM tri
       UNION ALL SELECT z FROM tri),
deg AS (SELECT vid, COUNT(*) AS n FROM
        (SELECT a AS vid FROM cnd UNION ALL SELECT b FROM cnd)
        GROUP BY vid),
ego AS (SELECT d.vid, d.n,
               CAST(d.n + COALESCE(t.cnt, 0) AS BIGINT) AS e
        FROM deg d LEFT JOIN
        (SELECT vid, COUNT(*) AS cnt FROM pv GROUP BY vid) t
        ON t.vid = d.vid),
pts AS (SELECT vid, n, e, ln(n * 1.0) AS x, ln(e * 1.0) AS y FROM ego),
mom AS (SELECT CAST(COUNT(*) AS DOUBLE) AS m,
               COUNT(DISTINCT n) AS ndist,
               CAST(SUM(CAST(FLOOR(x * 1000000000.0) AS DECIMAL(38,0)))
                    AS DOUBLE) / 1000000000.0 AS sx,
               CAST(SUM(CAST(FLOOR(y * 1000000000.0) AS DECIMAL(38,0)))
                    AS DOUBLE) / 1000000000.0 AS sy,
               CAST(SUM(CAST(FLOOR(x * y * 1000000000.0) AS DECIMAL(38,0)))
                    AS DOUBLE) / 1000000000.0 AS sxy,
               CAST(SUM(CAST(FLOOR(x * x * 1000000000.0) AS DECIMAL(38,0)))
                    AS DOUBLE) / 1000000000.0 AS sxx
        FROM pts),
fit AS (SELECT CASE WHEN ndist = 1 THEN 0.0
                    ELSE (m * sxy - sx * sy) / (m * sxx - sx * sx)
               END AS theta,
               (sy - (CASE WHEN ndist = 1 THEN 0.0
                           ELSE (m * sxy - sx * sy) / (m * sxx - sx * sx)
                      END) * sx) / m AS c
        FROM mom)
SELECT vid, n, e,
       ROUND(ABS(y - (fit.c + fit.theta * x)), 6) AS resid
FROM pts, fit
ORDER BY resid DESC, vid ASC
LIMIT 20
"""


def q_knn_graph(spark, sf_dir):
    """X174: kNN graph over the embedding corpus (k=5, LSH-bucketed
    candidates, never all-pairs) with the mutual-kNN flag — the
    semantic-clustering / SemDedup precursor
    (pipeline.similarity.knn_graph). md5 hyperplanes + 6dp rank
    ordering make edges AND mutuality bit-reproducible in SQL."""
    from credigraph_spark.pipeline.similarity import knn_graph

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    return knn_graph(emb, k=5, bits_per_table=4, n_tables=6, seed=7)


def _knn_graph_sql(bits_per_table: int = 4, n_tables: int = 6,
                   seed: int = 7, k: int = 5) -> str:
    """DuckDB mirror of knn_graph: the _ann_lsh_sql bucket/rank chain
    with every vector as a query, plus the mutual self-join."""
    total_bits = bits_per_table * n_tables
    sign = ("(CASE WHEN (('0x' || substr(md5('" + str(seed) +
            "' || ':' || b || ':' || (i - 1)), 1, 8))::BIGINT % 2) = 0 "
            "THEN 1.0 ELSE -1.0 END)")
    dot = ("list_sum(list_transform(generate_series(1, len(a.embedding)), "
           "i -> a.embedding[i]::DOUBLE * b2.embedding[i]::DOUBLE))")
    na = ("sqrt(list_sum(list_transform(generate_series(1, len(a.embedding)), "
          "i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))")
    nb = ("sqrt(list_sum(list_transform(generate_series(1, len(b2.embedding)), "
          "i -> b2.embedding[i]::DOUBLE * b2.embedding[i]::DOUBLE)))")
    return f"""
WITH e AS (SELECT vec_id, embedding FROM embeddings),
bits AS (
  SELECT vec_id, b,
    CASE WHEN list_sum(list_transform(generate_series(1, len(embedding)),
      i -> embedding[i]::DOUBLE * {sign})) > 0 THEN 1 ELSE 0 END AS bit
  FROM e, (SELECT unnest(generate_series(0, {total_bits - 1})) AS b)
),
keys AS MATERIALIZED (
  SELECT vec_id, b // {bits_per_table} AS table_idx,
         SUM(bit * (1::BIGINT << (b % {bits_per_table})))::BIGINT AS bucket
  FROM bits GROUP BY vec_id, b // {bits_per_table}
),
pairs AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id AS neighbor_id
  FROM keys q JOIN keys c USING (table_idx, bucket)
  WHERE q.vec_id <> c.vec_id
),
scored AS (
  SELECT p.query_id, p.neighbor_id, {dot} / ({na} * {nb}) AS cosine
  FROM pairs p JOIN e a ON a.vec_id = p.query_id
  JOIN e b2 ON b2.vec_id = p.neighbor_id
),
topk AS MATERIALIZED (
  SELECT query_id, neighbor_id, rank FROM (
    SELECT query_id, neighbor_id, ROW_NUMBER() OVER
      (PARTITION BY query_id
       ORDER BY ROUND(cosine, 6) DESC, neighbor_id ASC) AS rank
    FROM scored) WHERE rank <= {k})
SELECT t.query_id AS u, t.neighbor_id AS v, t.rank,
       EXISTS (SELECT 1 FROM topk r
               WHERE r.query_id = t.neighbor_id
                 AND r.neighbor_id = t.query_id) AS mutual
FROM topk t
"""


def q_semdedup(spark, sf_dir):
    """X175: SemDedup — deterministic k-means clusters (8 cells, 2
    Lloyd rounds) + within-cluster cosine pruning at 0.4 (the synthetic
    corpus's near-dup band), larger-id member of each hot pair dropped
    (pipeline.similarity.semdedup). Clusters AND keep flags replay
    bit-identically in the composed SQL oracle."""
    from credigraph_spark.pipeline.similarity import semdedup

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    return semdedup(emb, k=8, iters=2, threshold=0.4, seed=7)


def _semdedup_sql(k: int = 8, iters: int = 2, seed: int = 7,
                  threshold: float = 0.4) -> str:
    """kmeans_assign oracle chain wrapped as a CTE, composed with the
    within-cluster pair scan and the larger-id drop rule."""
    cos = ("list_sum(list_transform(generate_series(1, len(a.embedding)), "
           "i -> a.embedding[i]::DOUBLE * b2.embedding[i]::DOUBLE)) / "
           "(sqrt(list_sum(list_transform(generate_series(1, len(a.embedding)), "
           "i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE))) * "
           "sqrt(list_sum(list_transform(generate_series(1, len(b2.embedding)), "
           "i -> b2.embedding[i]::DOUBLE * b2.embedding[i]::DOUBLE))))")
    return f"""
WITH asg AS MATERIALIZED ({_kmeans_sql(k=k, iters=iters, seed=seed)}),
e AS (SELECT vec_id, embedding FROM embeddings),
p AS (SELECT a1.vec_id AS u, a2.vec_id AS w
      FROM asg a1 JOIN asg a2
      ON a1.list_id = a2.list_id AND a1.vec_id < a2.vec_id),
sc AS (SELECT p.u, p.w, ROUND({cos}, 6) AS cos
       FROM p JOIN e a ON a.vec_id = p.u JOIN e b2 ON b2.vec_id = p.w),
dropped AS (SELECT DISTINCT w AS vec_id FROM sc WHERE cos >= {threshold})
SELECT a.vec_id, a.list_id AS cluster,
       a.vec_id NOT IN (SELECT vec_id FROM dropped) AS keep
FROM asg a
"""


def q_pack_shards(spark, sf_dir):
    """X176: token-budget shard packing (concat-and-chunk): global
    token offsets in doc_id order via the O3 distributed-cumsum
    pattern, shard = offset DIV 4096 (pipeline.sampling.pack_shards).
    All integers — exact oracle."""
    from credigraph_spark.pipeline.sampling import pack_shards

    return pack_shards(_t(spark, sf_dir, "documents"), budget_tokens=4096)


_PACK_SQL = """
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(regexp_split_to_array(lower(text),
              '[^a-z0-9'']+'), x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM t)
SELECT doc_id, n_tokens, CAST(off AS BIGINT) AS offset,
       CAST(off // 4096 AS BIGINT) AS shard
FROM c
"""


def q_collective_influence(spark, sf_dir):
    """X177: collective influence CI_2 (Morone-Makse optimal
    percolation): (k_i−1)·Σ_{2-hop shell}(k_j−1) over the undirected
    simple graph (graph.spreading.collective_influence). Exact
    integers."""
    from credigraph_spark.graph.spreading import collective_influence

    return collective_influence(_edges(spark, sf_dir))


_CI_SQL = f"""
WITH und AS MATERIALIZED ({_UND_SQL}),
deg AS (SELECT src AS vid, COUNT(*) AS deg FROM und GROUP BY 1),
p2 AS (SELECT DISTINCT a.src AS u, b.dst AS w
       FROM und a JOIN und b ON b.src = a.dst
       WHERE a.src <> b.dst),
shell AS (SELECT p2.u, p2.w FROM p2
          WHERE NOT EXISTS (SELECT 1 FROM und
                            WHERE und.src = p2.u AND und.dst = p2.w)),
con AS (SELECT s.u AS vid, CAST(SUM(d.deg - 1) AS BIGINT) AS s
        FROM shell s JOIN deg d ON d.vid = s.w GROUP BY 1)
SELECT deg.vid, deg.deg,
       CAST((deg.deg - 1) * COALESCE(con.s, 0) AS BIGINT) AS ci
FROM deg LEFT JOIN con ON con.vid = deg.vid
"""


def q_winnowing_pairs(spark, sf_dir):
    """X178: winnowing (MOSS) fingerprint match pairs — per-window
    min of md5 4-gram hashes, doc-frequency-capped pair join, top-50
    by shared fingerprints (pipeline.textstats.winnowing_pairs).
    Detects LOCAL overlap runs exact dedup and MinHash miss."""
    from credigraph_spark.pipeline.textstats import winnowing_pairs

    return winnowing_pairs(_t(spark, sf_dir, "documents"),
                           k=4, w=4, max_doc_freq=10, top=50)


def _winnow_sql(k: int = 4, w: int = 4, cap: int = 10,
                top: int = 50) -> str:
    """DuckDB mirror of winnowing_pairs: same md5 k-gram hashes, same
    window minima, same doc-frequency cap and ranking."""
    return f"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9'']+'),
                     x -> x <> '') AS tk
  FROM documents),
kg AS (
  SELECT doc_id,
         CASE WHEN len(tk) >= {k}
              THEN list_transform(generate_series(1, len(tk) - {k - 1}),
                i -> ('0x' || substr(md5(array_to_string(
                        list_slice(tk, i, i + {k - 1}), ' ')), 1, 8))::BIGINT)
              ELSE CAST([] AS BIGINT[]) END AS kg
  FROM t),
mins AS (
  SELECT doc_id,
         CASE WHEN len(kg) >= {w}
              THEN list_transform(generate_series(1, len(kg) - {w - 1}),
                     j -> list_min(list_slice(kg, j, j + {w - 1})))
              WHEN len(kg) > 0 THEN [list_min(kg)]
              ELSE CAST([] AS BIGINT[]) END AS m
  FROM kg),
fps AS (SELECT DISTINCT doc_id, unnest(m) AS fp FROM mins),
rare AS (SELECT fp FROM fps GROUP BY fp HAVING COUNT(*) <= {cap}),
kept AS (SELECT f.doc_id, f.fp FROM fps f JOIN rare USING (fp)),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(COUNT(*) AS BIGINT) AS shared
  FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, shared FROM pairs
ORDER BY shared DESC, doc_a ASC, doc_b ASC
LIMIT {top}
"""


def q_hyperball_harmonic(spark, sf_dir):
    """X179: HyperBall harmonic centrality for ALL vertices (Boldi-
    Vigna) — per-vertex FM ball-size sketches, harmonic = Σ(b_h −
    b_{h−1})/h, 3 hops, 4 registers (graph.anf.hyperball_harmonic).
    Integer rho sums hash exactly; the derived float is 6dp-rounded."""
    from credigraph_spark.graph.anf import hyperball_harmonic

    return hyperball_harmonic(_edges(spark, sf_dir), max_hops=3,
                              num_registers=4, seed=7)


def _hyperball_sql(max_hops: int = 3, num_registers: int = 4,
                   seed: int = 7, cap: int = 40) -> str:
    """DuckDB mirror of hyperball_harmonic: the _anf_sql register/BIT_OR
    chain with per-VERTEX rho sums and the harmonic fold."""
    phi = "0.77351"
    parts = [
        f"WITH e AS ({_E_SQL})", f"verts AS ({_VERTS_SQL})",
        f"regs AS (SELECT unnest(generate_series(0, {num_registers - 1})) AS reg)",
        ("m0 AS (SELECT vid, reg, CAST(POWER(2, LEAST("
         "CASE WHEN h = 0 THEN 32 ELSE CAST(ROUND(LOG2(h & -h)) AS BIGINT) END, "
         f"{cap})) AS BIGINT) AS mask FROM "
         f"(SELECT vid, reg, ('0x' || substr(md5('{seed}' || ':' || reg || "
         "':' || vid), 1, 8))::BIGINT AS h FROM verts, regs))"),
    ]
    for i in range(max_hops):
        parts.append(
            f"m{i + 1} AS MATERIALIZED (SELECT vid, reg, BIT_OR(mask) AS mask FROM ("
            f"SELECT vid, reg, mask FROM m{i} "
            f"UNION ALL SELECT e.src AS vid, m.reg, m.mask "
            f"FROM e JOIN m{i} m ON m.vid = e.dst) GROUP BY vid, reg)")
    for h in range(max_hops + 1):
        parts.append(
            f"s{h} AS (SELECT vid, CAST(SUM(CAST(ROUND(LOG2((mask + 1) & "
            f"-(mask + 1))) AS BIGINT)) AS BIGINT) AS s FROM m{h} GROUP BY vid)")
    ball = ("(POWER(2.0, s{h}.s / CAST({R} AS DOUBLE)) / " + phi + ")")
    terms = " + ".join(
        "(" + ball.format(h=h, R=num_registers) + " - "
        + ball.format(h=h - 1, R=num_registers) + f") / {float(h)}"
        for h in range(1, max_hops + 1))
    joins = " ".join(f"JOIN s{h} ON s{h}.vid = s0.vid"
                     for h in range(1, max_hops + 1))
    scols = ", ".join(f"s{h}.s AS s_{h}" for h in range(1, max_hops + 1))
    return ",\n".join(parts) + f"""
SELECT s0.vid, {scols},
       ROUND({terms}, 6) AS harmonic
FROM s0 {joins}
"""


def q_wl_colors(spark, sf_dir):
    """X180: 1-WL color refinement (3 rounds) — per-vertex canonical
    structural-role color + class size, order-independent multiset
    hashing (exact decimal sum of 60-bit neighbour-color hashes, no
    sorted arrays) (graph.wl.wl_refinement)."""
    from credigraph_spark.graph.wl import wl_refinement

    return wl_refinement(_edges(spark, sf_dir), rounds=3)


def _wl_sql(rounds: int = 3) -> str:
    """DuckDB mirror of wl_refinement: same md5 60-bit hashes, exact
    decimal multiset sums, md5(old:sum:count) recolor, unrolled."""
    parts = [
        f"WITH und AS MATERIALIZED ({_UND_SQL})",
        "c0 AS (SELECT src AS vid, CAST(COUNT(*) AS VARCHAR) AS color "
        "FROM und GROUP BY src)",
    ]
    for i in range(rounds):
        parts.append(
            f"m{i} AS (SELECT und.src AS vid, "
            f"CAST(SUM(CAST(('0x' || substr(md5(c.color), 1, 15))::BIGINT "
            f"AS DECIMAL(38,0))) AS VARCHAR) AS s, "
            f"COUNT(*) AS n "
            f"FROM und JOIN c{i} c ON c.vid = und.dst GROUP BY und.src)")
        parts.append(
            f"c{i + 1} AS MATERIALIZED (SELECT c.vid, "
            f"substr(md5(c.color || ':' || m.s || ':' || m.n), 1, 16) "
            f"AS color FROM c{i} c JOIN m{i} m ON m.vid = c.vid)")
    return ",\n".join(parts) + f"""
SELECT c.vid, c.color, s.class_size
FROM c{rounds} c JOIN (SELECT color, COUNT(*) AS class_size
                       FROM c{rounds} GROUP BY color) s USING (color)
"""


def q_chain_contract(spark, sf_dir):
    """X181: chain contraction over the md5-1/16-sampled lineitem graph
    (the sample makes degree-2 chains exist — the full graph is too
    dense): maximal degree-2 paths collapse to weighted super-edges
    (graph.contraction_chain.chain_contraction). Exact integers."""
    from credigraph_spark.graph.contraction_chain import chain_contraction

    cnd = (_edges(spark, sf_dir)
           .select(F.least("src", "dst").alias("a"),
                   F.greatest("src", "dst").alias("b")).distinct()
           .where(F.substring(F.md5(F.concat_ws(
               ":", F.col("a").cast("string"),
               F.col("b").cast("string"))), 1, 1) == "0"))
    return chain_contraction(
        cnd.select(F.col("a").alias("src"), F.col("b").alias("dst")))


_CHAIN_SQL = f"""
WITH RECURSIVE c0 AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM ({_E_SQL})),
kept AS MATERIALIZED (
  SELECT a, b FROM c0 WHERE substr(md5(a || ':' || b), 1, 1) = '0'),
und AS (SELECT a AS src, b AS dst FROM kept
        UNION ALL SELECT b, a FROM kept),
deg AS (SELECT src AS vid, COUNT(*) AS deg FROM und GROUP BY 1),
cv AS MATERIALIZED (SELECT vid FROM deg WHERE deg = 2),
ce AS (SELECT a, b FROM kept
       WHERE a IN (SELECT vid FROM cv) AND b IN (SELECT vid FROM cv)),
cund AS (SELECT a AS src, b AS dst FROM ce UNION ALL SELECT b, a FROM ce),
r(vid, label) AS (
  SELECT vid, vid FROM cv
  UNION
  SELECT cund.dst, r.label FROM r JOIN cund ON cund.src = r.vid
  WHERE r.label < cund.dst
),
lab AS MATERIALIZED (SELECT vid AS cv, MIN(label) AS chain FROM r GROUP BY vid),
boundary AS (
  SELECT a AS cv, b AS term FROM kept
  WHERE a IN (SELECT vid FROM cv) AND b NOT IN (SELECT vid FROM cv)
  UNION ALL
  SELECT b AS cv, a AS term FROM kept
  WHERE b IN (SELECT vid FROM cv) AND a NOT IN (SELECT vid FROM cv)),
through AS (
  SELECT a AS src, b AS dst, CAST(1 AS BIGINT) AS length FROM kept
  WHERE a NOT IN (SELECT vid FROM cv) AND b NOT IN (SELECT vid FROM cv)),
nlen AS (SELECT chain, CAST(COUNT(*) + 1 AS BIGINT) AS length
         FROM lab GROUP BY chain),
att AS (SELECT l.chain, MIN(b.term) AS t1, MAX(b.term) AS t2,
               COUNT(*) AS n_att
        FROM boundary b JOIN lab l ON l.cv = b.cv
        GROUP BY l.chain HAVING COUNT(*) = 2),
contracted AS (
  SELECT LEAST(t1, t2) AS src, GREATEST(t1, t2) AS dst, nlen.length
  FROM att JOIN nlen USING (chain) WHERE t1 <> t2)
SELECT src, dst, MIN(length) AS length
FROM (SELECT * FROM through UNION ALL SELECT * FROM contracted)
GROUP BY src, dst
"""


def q_calibration_bins(spark, sf_dir):
    """X182: classifier reliability diagram — fixed-weight length
    model p = sigmoid((len−300)/100) predicting lang=='en', 10
    fixed-width confidence bins with count / mean confidence /
    empirical positive rate (pipeline.classify.calibration_bins)."""
    from credigraph_spark.pipeline.classify import calibration_bins

    docs = _t(spark, sf_dir, "documents")
    p = F.lit(1.0) / (F.lit(1.0)
                      + F.exp(-((F.length("text") - F.lit(300.0)) / 100.0)))
    return calibration_bins(docs, score=p, label=F.col("lang") == "en",
                            n_bins=10)


_CALIB_SQL = """
WITH s AS (
  SELECT 1.0 / (1.0 + exp(-((length(text) - 300.0) / 100.0))) AS p,
         CAST(lang = 'en' AS BIGINT) AS y
  FROM documents),
b AS (SELECT LEAST(CAST(FLOOR(p * 10) AS BIGINT), 9) AS bin, p, y FROM s)
SELECT bin, COUNT(*) AS n,
       ROUND(CAST(SUM(CAST(FLOOR(p * 1000000000.0) AS DECIMAL(38,0)))
                  AS DOUBLE) / (1000000000.0 * COUNT(*)), 6) AS avg_score,
       ROUND(SUM(y) / CAST(COUNT(*) AS DOUBLE), 6) AS frac_pos
FROM b GROUP BY bin ORDER BY bin
"""


def q_rmat_edges(spark, sf_dir):
    """X183: deterministic R-MAT generator — 5000 edges at scale 8
    (256 vertices), md5-derived quadrant walk, the Graph500-style
    power-law scale-testing source (graph.generate.rmat_edges). Pure
    per-row fold, no shuffle; same (seed, i) → same edge on any
    engine."""
    from credigraph_spark.graph.generate import rmat_edges

    return rmat_edges(spark, scale=8, n_edges=5000, seed=7)


def _rmat_sql(scale: int = 8, n_edges: int = 5000, seed: int = 7,
              a: float = 0.57, b: float = 0.19, c: float = 0.19) -> str:
    """DuckDB mirror of rmat_edges: per-(edge, level) md5 uniform,
    same thresholds, bits recombined by level weight."""
    d1, d2 = a + b, a + b + c
    two60 = repr(float(1 << 60))
    u = (f"CAST(('0x' || substr(md5('{seed}' || ':' || edge_id || ':' "
         f"|| l), 1, 15))::BIGINT AS DOUBLE) / {two60}")
    return f"""
WITH g AS (SELECT unnest(generate_series(0, {n_edges - 1})) AS edge_id),
lv AS (SELECT edge_id, unnest(generate_series(0, {scale - 1})) AS l FROM g),
q AS (SELECT edge_id, l,
        CASE WHEN {u} < {a!r} THEN 0
             WHEN {u} < {d1!r} THEN 1
             WHEN {u} < {d2!r} THEN 2 ELSE 3 END AS quad
      FROM lv)
SELECT edge_id,
       CAST(SUM((quad // 2) * (1::BIGINT << ({scale - 1} - l)))
            AS BIGINT) AS src,
       CAST(SUM((quad % 2) * (1::BIGINT << ({scale - 1} - l)))
            AS BIGINT) AS dst
FROM q GROUP BY edge_id
"""


def q_truss_decomposition(spark, sf_dir):
    """X184: truss decomposition (trussness per edge, levels 3..4, 2
    peel rounds per level — deterministic fixed-round form) over the
    md5-1/16-sampled lineitem graph
    (graph.triangles.truss_decomposition)."""
    from credigraph_spark.graph.triangles import truss_decomposition

    cnd = (_edges(spark, sf_dir)
           .select(F.least("src", "dst").alias("a"),
                   F.greatest("src", "dst").alias("b")).distinct()
           .where(F.substring(F.md5(F.concat_ws(
               ":", F.col("a").cast("string"),
               F.col("b").cast("string"))), 1, 1) == "0"))
    return truss_decomposition(
        cnd.select(F.col("a").alias("src"), F.col("b").alias("dst")),
        max_k=4, rounds_per_level=2)


def _trussdec_sql(max_k: int = 4, rounds: int = 2) -> str:
    """DuckDB mirror of truss_decomposition over the sampled graph:
    per level the unrolled support/peel rounds (the _ktruss_sql inner
    pattern), removed-at-level via NOT EXISTS."""
    parts = [f"""WITH c0 AS (
  SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
  FROM ({_E_SQL}))""",
             "t3_0 AS MATERIALIZED (SELECT a, b FROM c0 "
             "WHERE substr(md5(a || ':' || b), 1, 1) = '0')"]
    prev_start = "t3_0"
    sels = []
    for k in range(3, max_k + 1):
        need = k - 2
        if k > 3:
            parts.append(
                f"t{k}_0 AS MATERIALIZED "
                f"(SELECT a, b FROM {prev_start}_f)")
        for i in range(rounds):
            cur = f"t{k}_{i}"
            parts.append(
                f"u{k}_{i} AS (SELECT a AS u, b AS v FROM {cur} "
                f"UNION ALL SELECT b, a FROM {cur})")
            parts.append(
                f"s{k}_{i} AS (SELECT c.a, c.b, COUNT(*) AS s "
                f"FROM {cur} c "
                f"JOIN u{k}_{i} n1 ON n1.u = c.a "
                f"JOIN u{k}_{i} n2 ON n2.u = c.b AND n2.v = n1.v "
                f"GROUP BY c.a, c.b)")
            parts.append(
                f"t{k}_{i + 1} AS (SELECT c.a, c.b FROM {cur} c "
                f"JOIN s{k}_{i} s ON s.a = c.a AND s.b = c.b "
                f"AND s.s >= {need})")
        parts.append(f"{f't{k}_0'}_f AS MATERIALIZED "
                     f"(SELECT a, b FROM t{k}_{rounds})")
        sels.append(
            f"SELECT a AS src, b AS dst, CAST({k - 1} AS BIGINT) "
            f"AS trussness FROM t{k}_0 c "
            f"WHERE NOT EXISTS (SELECT 1 FROM t{k}_0_f f "
            f"WHERE f.a = c.a AND f.b = c.b)")
        prev_start = f"t{k}_0"
    sels.append(
        f"SELECT a AS src, b AS dst, CAST({max_k} AS BIGINT) "
        f"AS trussness FROM t{max_k}_0_f")
    return ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(sels)


def q_config_rewire(spark, sf_dir):
    """X185: configuration-model rewiring — a degree-preserving null
    INSTANCE graph by deterministic md5 stub pairing over the
    O3-ranked total order (graph.generate.configuration_rewire); the
    companion to clustering_null's closed-form expectation."""
    from credigraph_spark.graph.generate import configuration_rewire

    return configuration_rewire(_edges(spark, sf_dir), seed=7)


_REWIRE_SQL = f"""
WITH und AS ({_UND_SQL}),
deg AS (SELECT src AS vid, COUNT(*) AS deg FROM und GROUP BY 1),
stubs AS (SELECT vid, unnest(generate_series(1, deg)) AS i FROM deg),
keyed AS (SELECT vid, i,
                 md5('7' || ':' || vid || ':' || i) AS key FROM stubs),
ranked AS (SELECT vid,
                  ROW_NUMBER() OVER (ORDER BY key, vid, i) - 1 AS rank
           FROM keyed),
p AS (SELECT rank // 2 AS j,
             arg_min(vid, rank) AS u, arg_max(vid, rank) AS v,
             COUNT(*) AS n
      FROM ranked GROUP BY 1)
SELECT DISTINCT LEAST(u, v) AS src, GREATEST(u, v) AS dst
FROM p WHERE n = 2 AND u <> v
"""


def q_ann_multiprobe(spark, sf_dir):
    """X186: multi-probe LSH top-k (Lv et al.) — queries probe their
    bucket plus every 1-bit-flip neighbour bucket per table; recall
    rises without touching the candidate index
    (pipeline.similarity.lsh_multiprobe_topk)."""
    from credigraph_spark.pipeline.similarity import lsh_multiprobe_topk

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    queries = emb.where(F.col("vec_id") < 5)
    return lsh_multiprobe_topk(queries, emb, k=5, bits_per_table=4,
                               n_tables=6, seed=7)


def _ann_multiprobe_sql(bits_per_table: int = 4, n_tables: int = 6,
                        seed: int = 7, k: int = 5) -> str:
    """_ann_lsh_sql with the query-side 1-bit-flip bucket expansion."""
    total_bits = bits_per_table * n_tables
    sign = ("(CASE WHEN (('0x' || substr(md5('" + str(seed) +
            "' || ':' || b || ':' || (i - 1)), 1, 8))::BIGINT % 2) = 0 "
            "THEN 1.0 ELSE -1.0 END)")
    dot = ("list_sum(list_transform(generate_series(1, len(a.embedding)), "
           "i -> a.embedding[i]::DOUBLE * b2.embedding[i]::DOUBLE))")
    na = ("sqrt(list_sum(list_transform(generate_series(1, len(a.embedding)), "
          "i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))")
    nb = ("sqrt(list_sum(list_transform(generate_series(1, len(b2.embedding)), "
          "i -> b2.embedding[i]::DOUBLE * b2.embedding[i]::DOUBLE)))")
    return f"""
WITH e AS (SELECT vec_id, embedding FROM embeddings),
bits AS (
  SELECT vec_id, b,
    CASE WHEN list_sum(list_transform(generate_series(1, len(embedding)),
      i -> embedding[i]::DOUBLE * {sign})) > 0 THEN 1 ELSE 0 END AS bit
  FROM e, (SELECT unnest(generate_series(0, {total_bits - 1})) AS b)
),
keys AS MATERIALIZED (
  SELECT vec_id, b // {bits_per_table} AS table_idx,
         SUM(bit * (1::BIGINT << (b % {bits_per_table})))::BIGINT AS bucket
  FROM bits GROUP BY vec_id, b // {bits_per_table}
),
qk AS (
  SELECT vec_id AS query_id, table_idx,
         unnest(list_concat([bucket],
           list_transform(generate_series(0, {bits_per_table - 1}),
                          j -> xor(bucket, 1::BIGINT << j)))) AS bucket
  FROM keys WHERE vec_id < 5),
ck AS (SELECT vec_id AS neighbor_id, table_idx, bucket FROM keys),
pairs AS (
  SELECT DISTINCT query_id, neighbor_id
  FROM qk JOIN ck USING (table_idx, bucket)
  WHERE query_id <> neighbor_id
),
scored AS (
  SELECT p.query_id, p.neighbor_id, {dot} / ({na} * {nb}) AS cosine
  FROM pairs p JOIN e a ON a.vec_id = p.query_id
  JOIN e b2 ON b2.vec_id = p.neighbor_id
),
ranked AS (SELECT query_id, neighbor_id, ROW_NUMBER() OVER
  (PARTITION BY query_id
   ORDER BY ROUND(cosine, 6) DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, rank FROM ranked WHERE rank <= {k}
"""


def q_snm_pairs(spark, sf_dir):
    """X187: sorted-neighborhood dedup blocking (Hernandez-Stolfo) —
    global sort by the lowercased 20-char text prefix, window-6
    equi-join on rank+offset, levenshtein-scored pairs at sim >= 0.5
    (pipeline.dedup.snm_candidate_pairs)."""
    from credigraph_spark.pipeline.dedup import snm_candidate_pairs

    docs = _t(spark, sf_dir, "documents")
    return snm_candidate_pairs(
        docs, sort_key=F.lower(F.substring("text", 1, 20)),
        window=6, min_sim=0.5)


_SNM_SQL = """
WITH base AS (
  SELECT doc_id, substr(text, 1, 40) AS t,
         lower(substr(text, 1, 20)) AS k
  FROM documents),
ranked AS (SELECT doc_id, t,
                  ROW_NUMBER() OVER (ORDER BY k, doc_id) AS rank
           FROM base),
probes AS (SELECT r.doc_id AS doc_a, r.t AS ta, r.rank + o.o AS rank
           FROM ranked r,
                (SELECT unnest(generate_series(1, 5)) AS o) o),
pairs AS (SELECT p.doc_a, p.ta, r2.doc_id AS doc_b, r2.t AS tb
          FROM probes p JOIN ranked r2 ON r2.rank = p.rank)
SELECT doc_a, doc_b,
       CAST(levenshtein(ta, tb) AS BIGINT) AS dist,
       ROUND(1.0 - levenshtein(ta, tb)
             / CAST(GREATEST(length(ta), length(tb), 1) AS DOUBLE), 6)
         AS sim
FROM pairs
WHERE ROUND(1.0 - levenshtein(ta, tb)
            / CAST(GREATEST(length(ta), length(tb), 1) AS DOUBLE), 6)
      >= 0.5
"""


def q_rrf_fusion(spark, sf_dir):
    """X188: reciprocal-rank fusion of two heterogeneous rankings for
    the same probe query — TF-saturating BM25 (k1=1.2, b=0.75) fused
    with the binary-independence score (k1=0: Σ idf over matched
    terms) via rrf = Σ 1/(60+rank)
    (pipeline.retrieval.rrf_fuse). No score calibration needed —
    fusion reads only ranks."""
    from pyspark.sql.window import Window as W

    from credigraph_spark.pipeline.retrieval import bm25_topk, rrf_fuse

    docs = _t(spark, sf_dir, "documents")
    n = docs.count()

    def ranked(k1, b):
        top = bm25_topk(docs, _BM25_TERMS, n_docs=n, k=50, k1=k1, b=b)
        w = W.partitionBy(F.lit(0)).orderBy(F.desc("score"),
                                            F.asc("doc_id"))
        return top.select("doc_id", F.row_number().over(w).alias("rank"))

    return rrf_fuse([ranked(1.2, 0.75), ranked(0.0, 0.0)],
                    rrf_k=60, top=20)


def _rrf_sql(terms: list[str], rrf_k: int = 60, top: int = 20) -> str:
    """Two parametrized bm25 chains (the _bm25_sql shape) ranked and
    fused with quantized reciprocal-rank sums."""

    def chain(tag, k1, b):
        inner = _bm25_sql(terms, k=50, k1=k1, b=b).strip()
        assert inner.startswith("WITH ")
        body = inner[len("WITH "):]
        # suffix every CTE name so the two chains don't collide
        # (word-boundary regex: 'tok' must not rewrite inside 'toks')
        import re as _re
        for name in ("toks", "tok", "tf", "dfq", "dl", "ad", "n",
                     "parts"):
            body = _re.sub(rf"\b{name}\b", f"{name}_{tag}", body)
        sel_at = body.rindex("SELECT doc_id")
        ctes, final = body[:sel_at].rstrip().rstrip(","), body[sel_at:]
        return (f"{ctes},\ntop_{tag} AS ({final}),\n"
                f"r_{tag} AS (SELECT doc_id, ROW_NUMBER() OVER "
                f"(ORDER BY score DESC, doc_id ASC) AS rank "
                f"FROM top_{tag})")

    return f"""
WITH {chain('a', 1.2, 0.75)},
{chain('b', 0.0, 0.0)},
u AS (SELECT doc_id, rank FROM r_a UNION ALL
      SELECT doc_id, rank FROM r_b)
SELECT doc_id, COUNT(*) AS n_lists,
       ROUND(CAST(SUM(CAST(FLOOR(1.0 / ({rrf_k} + rank)
                                 * 1000000000.0) AS DECIMAL(38,0)))
                  AS DOUBLE) / 1000000000.0, 6) AS rrf
FROM u GROUP BY doc_id
ORDER BY rrf DESC, doc_id ASC
LIMIT {top}
"""


def q_lpa_incremental(spark, sf_dir):
    """X189: incremental LPA — 2 rounds on the l_linenumber>1 base
    graph, then 2 warm-started rounds on the FULL graph seeded from the
    base communities (label_propagation(init_labels=...), the
    pagerank_incremental / cc_incremental analog). Oracle: the whole
    chain unrolled."""
    from credigraph_spark.graph import label_propagation

    li = _t(spark, sf_dir, "lineitem")
    base = li.where("l_linenumber > 1").select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst"))
    full = li.select(F.col("l_partkey").alias("src"),
                     F.col("l_suppkey").alias("dst"))
    seed, _ = label_propagation(base, max_iter=2)
    out, _ = label_propagation(full, init_labels=seed, max_iter=2)
    return out


def _lpa_incr_sql(rounds_base: int = 2, rounds_full: int = 2) -> str:
    """Unrolled incremental-LPA chain: base-graph rounds from identity,
    full-graph rounds from the base labeling (missing vertices seed as
    themselves)."""
    be = ("SELECT DISTINCT l_partkey AS src, l_suppkey AS dst FROM "
          "lineitem WHERE l_partkey <> l_suppkey AND l_linenumber > 1 "
          "AND l_partkey IS NOT NULL AND l_suppkey IS NOT NULL")
    parts = [
        f"WITH bund AS MATERIALIZED (SELECT src, dst FROM ({be}) "
        f"UNION SELECT dst, src FROM ({be}))",
        "bverts AS (SELECT DISTINCT src AS vid FROM bund)",
        "bl0 AS MATERIALIZED (SELECT vid, vid AS label FROM bverts)",
    ]
    for i in range(rounds_base):
        parts.append(
            f"bc{i} AS (SELECT bund.dst AS vid, l.label, COUNT(*) AS cnt "
            f"FROM bund JOIN bl{i} l ON bund.src = l.vid "
            f"GROUP BY bund.dst, l.label)")
        parts.append(
            f"bb{i} AS (SELECT vid, label FROM (SELECT vid, label, "
            f"ROW_NUMBER() OVER (PARTITION BY vid ORDER BY cnt DESC, "
            f"label ASC) AS rn FROM bc{i}) WHERE rn = 1)")
        parts.append(
            f"bl{i + 1} AS MATERIALIZED (SELECT l.vid, "
            f"COALESCE(b.label, l.label) AS label "
            f"FROM bl{i} l LEFT JOIN bb{i} b USING (vid))")
    parts += [
        f"fund AS MATERIALIZED ({_UND_SQL})",
        f"fverts AS ({_VERTS_SQL})",
        f"fl0 AS MATERIALIZED (SELECT v.vid, "
        f"COALESCE(s.label, v.vid) AS label FROM fverts v "
        f"LEFT JOIN bl{rounds_base} s USING (vid))",
    ]
    for i in range(rounds_full):
        parts.append(
            f"fc{i} AS (SELECT fund.dst AS vid, l.label, COUNT(*) AS cnt "
            f"FROM fund JOIN fl{i} l ON fund.src = l.vid "
            f"GROUP BY fund.dst, l.label)")
        parts.append(
            f"fb{i} AS (SELECT vid, label FROM (SELECT vid, label, "
            f"ROW_NUMBER() OVER (PARTITION BY vid ORDER BY cnt DESC, "
            f"label ASC) AS rn FROM fc{i}) WHERE rn = 1)")
        parts.append(
            f"fl{i + 1} AS MATERIALIZED (SELECT l.vid, "
            f"COALESCE(b.label, l.label) AS label "
            f"FROM fl{i} l LEFT JOIN fb{i} b USING (vid))")
    return (",\n".join(parts)
            + f"\nSELECT vid, label FROM fl{rounds_full}")


def q_bloom_prefilter(spark, sf_dir):
    """X190: Bloom-filter semi-join prefilter — 1024-bit md5 bloom
    over the p_partkey %% 97 == 0 part set, broadcast as ONE row and
    probed per-row against the distinct lineitem partkeys; summary
    counts the exact (deterministic) false-positive set
    (pipeline.sketch.bloom_build / bloom_filter_rows)."""
    from credigraph_spark.pipeline.sketch import (bloom_build,
                                                  bloom_filter_rows)

    members = _t(spark, sf_dir, "part").where("p_partkey % 97 = 0") \
        .select(F.col("p_partkey").alias("key"))
    bloom = bloom_build(members, "key", m_bits=1024, k_hashes=3)
    keys = (_t(spark, sf_dir, "lineitem")
            .where("l_partkey IS NOT NULL")
            .select(F.col("l_partkey").alias("key")).distinct())
    passed = bloom_filter_rows(keys, "key", bloom, m_bits=1024,
                               k_hashes=3)
    mem_flag = members.distinct().withColumn("_m", F.lit(1))
    return (keys.withColumn(
        "_p", F.lit(None).cast("int"))
        .drop("_p")
        .join(passed.withColumn("_pass", F.lit(1)), "key", "left")
        .join(mem_flag, "key", "left")
        .agg(F.count("*").alias("n_keys"),
             F.sum(F.coalesce("_pass", F.lit(0))).cast("long")
             .alias("n_pass"),
             F.sum(F.when((F.col("_pass") == 1) & (F.col("_m") == 1), 1)
                   .otherwise(0)).cast("long").alias("n_member_pass"),
             F.sum(F.when((F.col("_pass") == 1) & F.col("_m").isNull(),
                          1).otherwise(0)).cast("long")
             .alias("n_false_pos")))


_BLOOM_SQL = """
WITH mem AS (SELECT DISTINCT p_partkey AS key FROM part
             WHERE p_partkey % 97 = 0),
bits AS (
  SELECT DISTINCT
    ('0x' || substr(md5('7' || ':' || j.j || ':'
                        || CAST(mem.key AS VARCHAR)), 1, 15))::BIGINT
      % 1024 AS pos
  FROM mem, (SELECT unnest(generate_series(0, 2)) AS j) j),
keys AS (SELECT DISTINCT l_partkey AS key FROM lineitem
         WHERE l_partkey IS NOT NULL),
probe AS (
  SELECT k.key,
         SUM(CASE WHEN ('0x' || substr(md5('7' || ':' || j.j || ':'
               || CAST(k.key AS VARCHAR)), 1, 15))::BIGINT % 1024
               IN (SELECT pos FROM bits) THEN 1 ELSE 0 END) AS hits
  FROM keys k, (SELECT unnest(generate_series(0, 2)) AS j) j
  GROUP BY k.key),
fl AS (SELECT p.key, p.hits = 3 AS pass,
              p.key IN (SELECT key FROM mem) AS is_mem
       FROM probe p)
SELECT COUNT(*) AS n_keys,
       CAST(COALESCE(SUM(CASE WHEN pass THEN 1 END), 0) AS BIGINT)
         AS n_pass,
       CAST(COALESCE(SUM(CASE WHEN pass AND is_mem THEN 1 END), 0)
            AS BIGINT) AS n_member_pass,
       CAST(COALESCE(SUM(CASE WHEN pass AND NOT is_mem THEN 1 END), 0)
            AS BIGINT) AS n_false_pos
FROM fl
"""


def q_zorder_keys(spark, sf_dir):
    """X191: Z-order (Morton) interleaved sort keys over the distinct
    (l_partkey, l_suppkey) pairs, 10 bits per dimension — the lakehouse
    OPTIMIZE ZORDER data-clustering primitive (store.zorder_key).
    Exact integer bucketing + bit interleave, all per-row."""
    from credigraph_spark.store import zorder_key

    e = (_t(spark, sf_dir, "lineitem")
         .where("l_partkey IS NOT NULL AND l_suppkey IS NOT NULL")
         .select(F.col("l_partkey").alias("src"),
                 F.col("l_suppkey").alias("dst")).distinct())
    return zorder_key(e, ["src", "dst"], bits=10)


_ZORDER_SQL = """
WITH e AS (SELECT DISTINCT l_partkey AS src, l_suppkey AS dst
           FROM lineitem
           WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL),
mm AS (SELECT MIN(src) AS mns, MAX(src) AS mxs,
              MIN(dst) AS mnd, MAX(dst) AS mxd FROM e),
b AS (SELECT src, dst,
             (CAST(src - mns AS BIGINT) * (1::BIGINT << 10))
               // (mxs - mns + 1) AS bs,
             (CAST(dst - mnd AS BIGINT) * (1::BIGINT << 10))
               // (mxd - mnd + 1) AS bd
      FROM e, mm)
SELECT src, dst,
       CAST(list_sum(list_transform(generate_series(0, 9), j ->
              (((bs >> j) & 1) << (j * 2 + 1))
              + (((bd >> j) & 1) << (j * 2)))) AS BIGINT) AS z
FROM b
"""


def q_filter_ablation(spark, sf_dir):
    """X192: filter-ablation ledger — kill rates and pairwise kill-set
    Jaccard for the four standing curation filters (blocklist, c4,
    gopher, pii) in one conditional-sum pass
    (pipeline.ablation.filter_ablation). Redundant filters show up as
    high off-diagonal Jaccard."""
    from credigraph_spark.pipeline.ablation import filter_ablation
    from credigraph_spark.pipeline.safety import (blocklist_screen,
                                                  pii_scrub)
    from credigraph_spark.pipeline.textstats import (c4_line_stats,
                                                     gopher_quality)

    docs = _t(spark, sf_dir, "documents")
    # same derived multi-line corpus as q_c4_line_stats (its oracle
    # mirrors this derivation)
    c4docs = docs.select(
        "doc_id",
        F.expr("replace(text, ' value ', concat('.', chr(10)))")
        .alias("text"))
    # pii runs on the injected corpus (the q_pii_scrub fixture — raw
    # synthetic docs carry no PII, so the filter would be a no-op)
    pii = pii_scrub(_pii_inject(docs)).select(
        "doc_id", (~F.col("has_pii")).alias("keep"))
    return filter_ablation({
        "blocklist": blocklist_screen(docs, ["slow", "junk", "stale"],
                                      max_frac=0.02),
        "c4": c4_line_stats(c4docs, min_words_per_line=5,
                            min_kept_lines=2),
        "gopher": gopher_quality(docs, stopwords=("the", "a"),
                                 min_stopwords=2),
        "pii": pii,
    })


def _ablation_sql() -> str:
    """The four filter oracles embedded as subqueries, one conditional
    aggregate, pairwise rows unioned in name order."""
    subs = {
        "blocklist": f"SELECT doc_id, keep FROM ({_BLOCKLIST_SQL})",
        "c4": f"SELECT doc_id, keep FROM ({_c4_sql()})",
        "gopher": f"SELECT doc_id, keep FROM ({_gopher_sql()})",
        "pii": f"SELECT doc_id, NOT has_pii AS keep FROM ({_PII_SQL})",
    }
    names = sorted(subs)
    ctes = [f"f{i} AS MATERIALIZED (SELECT doc_id, "
            f"CAST(NOT keep AS BIGINT) AS k{i} FROM ({subs[n]}))"
            for i, n in enumerate(names)]
    join = "f0" + "".join(f" JOIN f{i} USING (doc_id)"
                          for i in range(1, len(names)))
    sums = ", ".join(
        f"CAST(SUM(k{i} * k{j}) AS BIGINT) AS b_{i}_{j}"
        for i in range(len(names)) for j in range(i, len(names)))
    sels = []
    for i, a in enumerate(names):
        for j in range(i, len(names)):
            b = names[j]
            sels.append(
                f"SELECT '{a}' AS filter_a, '{b}' AS filter_b, "
                f"b_{i}_{i} AS killed_a, b_{j}_{j} AS killed_b, "
                f"b_{i}_{j} AS killed_both, "
                f"CASE WHEN b_{i}_{i} + b_{j}_{j} - b_{i}_{j} = 0 "
                f"THEN 0.0 ELSE ROUND(b_{i}_{j} * 1.0 / "
                f"(b_{i}_{i} + b_{j}_{j} - b_{i}_{j}), 6) END AS jaccard "
                f"FROM agg")
    return ("WITH " + ",\n".join(ctes)
            + f",\nagg AS (SELECT {sums} FROM {join})\n"
            + "\nUNION ALL\n".join(sels))


def q_hashed_logreg(spark, sf_dir):
    """X169: fastText-shape hashed-feature text classifier —
    unigram+bigram bag hashed into 64 buckets, binary logistic
    regression (lang=='en') trained by 2 rounds of quantized full-batch
    GD with the weight vector as a DISTRIBUTED (bucket, w) table
    (pipeline.classify.hashed_text_logreg): forward pass = features ⋈
    broadcast(w), backward pass = features ⋈ residuals groupBy bucket.
    The quantized-decimal gradient sums make the whole descent replay
    bit-identically in the unrolled SQL oracle."""
    from credigraph_spark.pipeline.classify import hashed_text_logreg

    return hashed_text_logreg(_t(spark, sf_dir, "documents"),
                              label=(F.col("lang") == "en"),
                              n_buckets=64, iters=2, lr=0.5)


def _hashed_logreg_sql(n_buckets: int = 64, iters: int = 2,
                       lr: float = 0.5) -> str:
    """DuckDB mirror of hashed_text_logreg: same md5-bucket hashing,
    same FLOOR(x*1e9) decimal gradient sums, unrolled per iteration."""
    q = ("CAST(SUM(CAST(FLOOR(({expr}) * 1000000000.0) "
         "AS DECIMAL(38,0))) AS DOUBLE)")
    ctes = [f"""toks AS (
  SELECT doc_id, CAST(lang = 'en' AS DOUBLE) AS y,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9'']+'),
                     t -> t <> '') AS tk
  FROM documents)""",
            """feats AS (
  SELECT doc_id, unnest(list_concat(tk,
    CASE WHEN len(tk) >= 2
         THEN list_transform(generate_series(1, len(tk) - 1),
                             i -> tk[i] || '_' || tk[i + 1])
         ELSE CAST([] AS VARCHAR[]) END)) AS f
  FROM toks)""",
            f"""fb AS (
  SELECT doc_id, ('0x' || substr(md5(f), 1, 8))::BIGINT % {n_buckets}
           AS bucket,
         COUNT(*) AS tf
  FROM feats GROUP BY 1, 2)""",
            "nf AS (SELECT doc_id, SUM(tf) AS nf FROM fb GROUP BY 1)",
            """x AS MATERIALIZED (
  SELECT fb.doc_id, fb.bucket, ROUND(tf / CAST(nf AS DOUBLE), 6) AS x
  FROM fb JOIN nf USING (doc_id))""",
            "ys AS (SELECT doc_id, y FROM toks)",
            "nn AS (SELECT COUNT(*) AS n FROM documents)",
            f"w0 AS (SELECT b AS bucket, 0.0 AS w "
            f"FROM generate_series(0, {n_buckets - 1}) AS t(b))",
            "ib0 AS (SELECT 0.0 AS b)"]
    for i in range(1, iters + 1):
        p = i - 1
        ctes.append(f"""s{i} AS (
  SELECT x.doc_id, {q.format(expr='x.x * w.w')} / 1000000000.0 AS s
  FROM x JOIN w{p} w USING (bucket) GROUP BY 1)""")
        ctes.append(f"""r{i} AS MATERIALIZED (
  SELECT ys.doc_id,
         1.0 / (1.0 + exp(-(ROUND((SELECT b FROM ib{p})
                                  + COALESCE(s.s, 0.0), 6)))) - ys.y AS r
  FROM ys LEFT JOIN s{i} s USING (doc_id))""")
        ctes.append(f"""gb{i} AS (
  SELECT ROUND({q.format(expr='r')}
               / (1000000000.0 * (SELECT n FROM nn)), 6) AS g
  FROM r{i})""")
        ctes.append(f"ib{i} AS (SELECT ROUND((SELECT b FROM ib{p}) "
                    f"- {lr} * (SELECT g FROM gb{i}), 7) AS b)")
        ctes.append(f"""gw{i} AS (
  SELECT x.bucket, ROUND({q.format(expr='x.x * r.r')}
               / (1000000000.0 * (SELECT n FROM nn)), 6) AS g
  FROM x JOIN r{i} r USING (doc_id) GROUP BY 1)""")
        ctes.append(f"""w{i} AS (
  SELECT w.bucket, ROUND(w.w - {lr} * COALESCE(g.g, 0.0), 7) AS w
  FROM w{p} w LEFT JOIN gw{i} g USING (bucket))""")
    return ("WITH " + ",\n".join(ctes)
            + f"""\nSELECT CAST(-1 AS BIGINT) AS bucket,
       (SELECT b FROM ib{iters}) AS w
UNION ALL SELECT bucket, w FROM w{iters}""")


def q_triad_classes(spark, sf_dir):
    """X194: directed triad CLASS census — the 7 connected-triangle
    Holland–Leinhardt classes (030T/030C/120D/120U/120C/210/300,
    networkx label convention) over the directed lineitem graph
    (graph.triads.triad_census): degree-oriented triangle enumeration
    (the proven O(sqrt E) wedge bound from G7) + three dyad-type joins
    + one CASE classify, zero UDFs."""
    from credigraph_spark.graph.triads import triad_class_census

    return triad_class_census(_edges(spark, sf_dir))


_TRIAD_CLASSES_SQL = f"""
WITH e AS ({_E_SQL}),
dy AS (SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b,
              MAX(CASE WHEN src < dst THEN 1 ELSE 0 END) AS fwd,
              MAX(CASE WHEN src > dst THEN 1 ELSE 0 END) AS rev
       FROM e GROUP BY 1, 2),
tri AS (SELECT t1.a AS a, t1.b AS b, t2.b AS c
        FROM dy t1
        JOIN dy t2 ON t2.a = t1.a AND t2.b > t1.b
        JOIN dy t3 ON t3.a = t1.b AND t3.b = t2.b),
fl AS (SELECT d1.fwd AS f_ab, d1.rev AS r_ab,
              d2.fwd AS f_bc, d2.rev AS r_bc,
              d3.fwd AS f_ac, d3.rev AS r_ac
       FROM tri
       JOIN dy d1 ON d1.a = tri.a AND d1.b = tri.b
       JOIN dy d2 ON d2.a = tri.b AND d2.b = tri.c
       JOIN dy d3 ON d3.a = tri.a AND d3.b = tri.c),
cls AS (SELECT CASE
  WHEN f_ab * r_ab + f_bc * r_bc + f_ac * r_ac = 3 THEN '300'
  WHEN f_ab * r_ab + f_bc * r_bc + f_ac * r_ac = 2 THEN '210'
  WHEN f_ab * r_ab + f_bc * r_bc + f_ac * r_ac = 1 THEN
    CASE WHEN (CASE WHEN f_ab * r_ab = 1 THEN f_ac + f_bc
                    WHEN f_bc * r_bc = 1 THEN r_ab + r_ac
                    ELSE f_ab + r_bc END) = 2 THEN '120D'
         WHEN (CASE WHEN f_ab * r_ab = 1 THEN r_ac + r_bc
                    WHEN f_bc * r_bc = 1 THEN f_ab + f_ac
                    ELSE r_ab + f_bc END) = 2 THEN '120U'
         ELSE '120C' END
  ELSE CASE WHEN (f_ab = 1 AND f_bc = 1 AND r_ac = 1)
              OR (r_ab = 1 AND r_bc = 1 AND f_ac = 1)
            THEN '030C' ELSE '030T' END
  END AS triad_class FROM fl),
cnt AS (SELECT triad_class, COUNT(*) AS n FROM cls GROUP BY 1),
allc AS (SELECT unnest(['030C','030T','120C','120D','120U','210','300'])
           AS triad_class)
SELECT allc.triad_class, CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n
FROM allc LEFT JOIN cnt USING (triad_class)
ORDER BY triad_class
"""


def q_dup_spans(spark, sf_dir):
    """X195: duplicate-substring span stats (Lee et al. 2022 exact
    substring dedup, bounded to token 5-grams) — per-doc duplicated
    window count, merged maximal spans (overlap OR adjacency), covered
    tokens and duplicated fraction (pipeline.dedup.dup_span_stats).
    One corpus-token-bounded explode + one hash groupBy + per-DOC
    island windows; no global sort, no UDFs."""
    from credigraph_spark.pipeline.dedup import dup_span_stats

    return dup_span_stats(_t(spark, sf_dir, "documents"), k=5)


_DUP_SPANS_SQL = r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'),
                     t -> t <> '') AS tk
  FROM documents),
base AS (SELECT doc_id, tk, len(tk) AS n_tokens FROM toks),
wins AS (
  SELECT doc_id, i AS s, md5(array_to_string(tk[i:i+4], ' ')) AS h
  FROM base, unnest(generate_series(1, n_tokens - 4)) AS t(i)
  WHERE n_tokens >= 5),
dups AS (SELECT h FROM wins GROUP BY h HAVING COUNT(*) >= 2),
marks AS (SELECT doc_id, s, s + 4 AS e FROM wins
          WHERE h IN (SELECT h FROM dups)),
ord AS (
  SELECT doc_id, s, e,
         MAX(e) OVER (PARTITION BY doc_id ORDER BY s
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS pm
  FROM marks),
isl AS (
  SELECT doc_id, s, e,
         SUM(CASE WHEN pm IS NULL OR s > pm + 1 THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY s
                 ROWS UNBOUNDED PRECEDING) AS g
  FROM ord),
spans AS (SELECT doc_id, g, MIN(s) AS ss, MAX(e) AS ee
          FROM isl GROUP BY 1, 2),
per AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
               CAST(SUM(ee - ss + 1) AS BIGINT) AS dup_tokens
        FROM spans GROUP BY 1),
nd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_dup_windows
       FROM marks GROUP BY 1)
SELECT b.doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       COALESCE(n_dup_windows, 0) AS n_dup_windows,
       COALESCE(n_spans, 0) AS n_spans,
       COALESCE(dup_tokens, 0) AS dup_tokens,
       ROUND(CASE WHEN n_tokens > 0
                  THEN COALESCE(dup_tokens, 0) * 1.0 / n_tokens
                  ELSE 0.0 END, 6) AS dup_frac
FROM base b
LEFT JOIN nd USING (doc_id)
LEFT JOIN per USING (doc_id)
"""


def q_dag_levels(spark, sf_dir):
    """X196: DAG longest-path layering — topological levels of the
    low->high oriented sparsified lineitem DAG (graph.dag.dag_levels):
    Bellman max-propagation, per-superstep Observation-carried changed
    count on the SAME localCheckpoint action, converges at the DAG
    depth (6 at sf0.01; the 8-round horizon in the oracle is past the
    fixpoint, so the unrolled replay is exact)."""
    from credigraph_spark.graph.dag import dag_levels

    li = _t(spark, sf_dir, "lineitem")
    edges = (li.where((F.col("l_partkey") != F.col("l_suppkey"))
                      & (F.col("l_orderkey") % 20 == 0))
             .select(F.col("l_partkey").alias("src"),
                     F.col("l_suppkey").alias("dst")))
    lvl, _ = dag_levels(edges, max_rounds=8)
    return lvl


def _dag_levels_sql(rounds: int = 8) -> str:
    ctes = ["""e AS (SELECT DISTINCT l_partkey AS src, l_suppkey AS dst
  FROM lineitem
  WHERE l_partkey <> l_suppkey AND l_orderkey % 20 = 0)""",
            """d AS (SELECT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM e GROUP BY 1, 2)""",
            """l0 AS (SELECT vid, CAST(0 AS BIGINT) AS l FROM
  (SELECT u AS vid FROM d UNION SELECT v FROM d))"""]
    for i in range(1, rounds + 1):
        p = i - 1
        ctes.append(f"""l{i} AS (
  SELECT l{p}.vid, GREATEST(l{p}.l, COALESCE(m.m, 0)) AS l
  FROM l{p} LEFT JOIN (SELECT d.v AS vid, MAX(lp.l + 1) AS m
                       FROM d JOIN l{p} lp ON lp.vid = d.u
                       GROUP BY 1) m USING (vid))""")
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT vid, l AS level FROM l{rounds}")


def q_closed_walks(spark, sf_dir):
    """X197: closed-walk census — diag(A^2/A^3/A^4) per vertex plus the
    truncated Estrada subgraph centrality sc4 = w2/2!+w3/3!+w4/4!
    (graph.walks.closed_walk_census): ONE wedge aggregation builds the
    common-neighbor table, diag(A^3) is one adjacency join over it and
    diag(A^4) one c^2 groupBy — spectral motif structure with no
    eigensolver, no iteration, no UDFs."""
    from credigraph_spark.graph.walks import closed_walk_census

    return closed_walk_census(_edges(spark, sf_dir))


_CLOSED_WALKS_SQL = f"""
WITH und AS ({_UND_SQL}),
a2 AS (SELECT e1.u, e2.v, CAST(COUNT(*) AS BIGINT) AS c
       FROM (SELECT dst AS x, src AS u FROM und) e1
       JOIN (SELECT dst AS x, src AS v FROM und) e2 USING (x)
       GROUP BY 1, 2),
w2 AS (SELECT u, c AS w2 FROM a2 WHERE u = v),
w4 AS (SELECT u, CAST(SUM(c * c) AS BIGINT) AS w4 FROM a2 GROUP BY 1),
w3 AS (SELECT a2.u, CAST(SUM(c) AS BIGINT) AS w3
       FROM a2 JOIN und ON und.src = a2.u AND und.dst = a2.v
       GROUP BY 1)
SELECT w2.u AS vid, w2.w2,
       COALESCE(w3.w3, 0) AS w3,
       COALESCE(w4.w4, 0) AS w4,
       ROUND(w2.w2 / 2.0 + COALESCE(w3.w3, 0) / 6.0
             + COALESCE(w4.w4, 0) / 24.0, 6) AS sc4
FROM w2 LEFT JOIN w3 USING (u) LEFT JOIN w4 USING (u)
"""


def q_label_assortativity(spark, sf_dir):
    """X198: categorical label assortativity (Newman 2003 mixing
    matrix) over the kNN embedding graph — does the embedding space
    keep same-label vectors adjacent? Reuses the X174 kNN graph
    (identical params), symmetrizes it, and counts the directed
    label-pair mixing matrix; the assortativity coefficient is carried
    as EXACT integer numerator/denominator (r = (T*diag - sum(row_i^2))
    / (T^2 - sum(row_i^2)) over integer counts) so the replay is
    bit-exact, with the rounded double alongside."""
    from credigraph_spark.graph.adjacency import undirected_simple
    from credigraph_spark.pipeline.similarity import knn_graph

    emb = _t(spark, sf_dir, "embeddings")
    g = knn_graph(
        emb.select("vec_id",
                   F.col("embedding").cast("array<double>")
                   .alias("embedding")),
        k=5, bits_per_table=4, n_tables=6, seed=7)
    und = undirected_simple(
        g.select(F.col("u").alias("src"), F.col("v").alias("dst")))
    lab = emb.select("vec_id", "label")
    m = (und
         .join(lab.select(F.col("vec_id").alias("src"),
                          F.col("label").alias("label_a")), "src")
         .join(lab.select(F.col("vec_id").alias("dst"),
                          F.col("label").alias("label_b")), "dst")
         .groupBy("label_a", "label_b")
         .agg(F.count("*").cast("long").alias("n"))
         # eager localCheckpoint: m feeds FOUR subplans (tot/diag/rs and
         # the output rows) and sits on top of the whole kNN pipeline —
         # without materialization each reference re-runs the graph build
         .localCheckpoint(eager=True))
    tot = m.agg(F.sum("n").cast("long").alias("t"))
    diag = m.where(F.col("label_a") == F.col("label_b")).agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("d"))
    rs = (m.groupBy("label_a").agg(F.sum("n").alias("r"))
          .agg(F.sum(F.col("r") * F.col("r")).cast("long").alias("s")))
    consts = tot.crossJoin(diag).crossJoin(rs).select(
        (F.col("t") * F.col("d") - F.col("s")).cast("long").alias("q_num"),
        (F.col("t") * F.col("t") - F.col("s")).cast("long").alias("q_den"))
    return (m.crossJoin(consts)
            .select("label_a", "label_b", "n", "q_num", "q_den",
                    F.round(F.col("q_num") / F.col("q_den"), 6)
                    .alias("assortativity")))


def _label_assort_sql() -> str:
    return f"""
WITH g AS ({_knn_graph_sql(4, 6, 7, 5)}),
e AS (SELECT u AS src, v AS dst FROM g WHERE u <> v),
und AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
m AS (SELECT la.label AS label_a, lb.label AS label_b,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM und
      JOIN embeddings la ON la.vec_id = und.src
      JOIN embeddings lb ON lb.vec_id = und.dst
      GROUP BY 1, 2),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM m),
diag AS (SELECT CAST(COALESCE(SUM(CASE WHEN label_a = label_b THEN n END),
                              0) AS BIGINT) AS d FROM m),
rs AS (SELECT CAST(SUM(r * r) AS BIGINT) AS s FROM
       (SELECT CAST(SUM(n) AS BIGINT) AS r FROM m GROUP BY label_a)),
consts AS (SELECT CAST(t * d - s AS BIGINT) AS q_num,
                  CAST(t * t - s AS BIGINT) AS q_den
           FROM tot, diag, rs)
SELECT label_a, label_b, n, q_num, q_den,
       ROUND(q_num * 1.0 / q_den, 6) AS assortativity
FROM m, consts
"""


def q_threshold_percolation(spark, sf_dir):
    """X199: weight-threshold percolation — the lineitem multiplicity
    graph pruned at weight thresholds 1/2/3, with component count /
    giant-component size / surviving vertices+edges per threshold
    (graph.components.threshold_percolation; the weight-pruning sibling
    of the keep-fraction q_percolation). One hash-min CC run per
    fixed threshold on the shrinking subset."""
    from credigraph_spark.graph.components import threshold_percolation

    li = _t(spark, sf_dir, "lineitem")
    ew = (li.where(F.col("l_partkey") != F.col("l_suppkey"))
          .select(F.least("l_partkey", "l_suppkey").alias("src"),
                  F.greatest("l_partkey", "l_suppkey").alias("dst"))
          .groupBy("src", "dst")
          .agg(F.count("*").cast("long").alias("w")))
    return threshold_percolation(ew, thresholds=(1, 2, 3))


def _percolation_curve_sql(thresholds: tuple[int, ...] = (1, 2, 3)) -> str:
    sels = []
    for t in sorted(thresholds):
        sels.append(f"""(
WITH RECURSIVE ew AS (
  SELECT LEAST(l_partkey, l_suppkey) AS a,
         GREATEST(l_partkey, l_suppkey) AS b, COUNT(*) AS w
  FROM lineitem WHERE l_partkey <> l_suppkey GROUP BY 1, 2),
sub AS (SELECT a, b FROM ew WHERE w >= {t}),
und AS (SELECT a AS src, b AS dst FROM sub
        UNION SELECT b, a FROM sub),
verts AS (SELECT DISTINCT src AS vid FROM und),
r(vid, label) AS (
  SELECT vid, vid FROM verts
  UNION
  SELECT und.dst, r.label FROM r JOIN und ON und.src = r.vid
  WHERE r.label < und.dst
),
lab AS (SELECT vid, MIN(label) AS component FROM r GROUP BY vid),
cs AS (SELECT component, COUNT(*) AS sz FROM lab GROUP BY 1)
SELECT CAST({t} AS BIGINT) AS threshold,
       CAST(COALESCE(SUM(sz), 0) AS BIGINT) AS n_vertices,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM sub) AS n_edges,
       CAST(COALESCE(COUNT(*), 0) AS BIGINT) AS n_components,
       CAST(COALESCE(MAX(sz), 0) AS BIGINT) AS giant_size
FROM cs)""")
    return "\nUNION ALL\n".join(sels)


def q_k_anonymity(spark, sf_dir):
    """X200: k-anonymity / l-diversity audit over the customer table —
    quasi-identifiers (c_nationkey, c_mktsegment), sensitive value =
    the 100-bucketed account balance; groups under k=5 rows or under
    2 distinct sensitive values are flagged for suppression
    (pipeline.safety.k_anonymity_audit). One groupBy, no UDFs."""
    from credigraph_spark.pipeline.safety import k_anonymity_audit

    cust = _t(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment",
        F.floor(F.col("c_acctbal") / 100).cast("long").alias("bal_bucket"))
    return k_anonymity_audit(cust, ["c_nationkey", "c_mktsegment"],
                             "bal_bucket", k=5)


_K_ANON_SQL = """
SELECT c_nationkey, c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS group_size,
       CAST(COUNT(DISTINCT CAST(FLOOR(c_acctbal / 100) AS BIGINT))
            AS BIGINT) AS l_diversity,
       (COUNT(*) < 5
        OR COUNT(DISTINCT CAST(FLOOR(c_acctbal / 100) AS BIGINT)) < 2)
         AS suppress
FROM customer
GROUP BY 1, 2
"""


def q_leiden_refine(spark, sf_dir):
    """X201: Leiden connectivity refinement of the 2-round Louvain
    partition (graph.louvain.leiden_connectivity_refine) — splits every
    internally-disconnected Louvain community into its connected parts
    (the Leiden guarantee Louvain lacks, Traag et al. 2019). One
    community-constrained hash-min CC run refines ALL communities at
    once; n_parts flags the communities Louvain broke."""
    from credigraph_spark.graph import louvain_local_move
    from credigraph_spark.graph.louvain import leiden_connectivity_refine

    edges = _edges(spark, sf_dir)
    labels = louvain_local_move(edges, rounds=2)
    return leiden_connectivity_refine(edges, labels)


def _leiden_refine_sql() -> str:
    return f"""
WITH RECURSIVE lv AS MATERIALIZED (SELECT * FROM ({_louvain_sql(2)}) t),
e AS ({_E_SQL}),
und AS (SELECT DISTINCT src, dst FROM
        (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e)),
intra AS MATERIALIZED (
  SELECT und.src, und.dst FROM und
  JOIN lv a ON a.vid = und.src
  JOIN lv b ON b.vid = und.dst
  WHERE a.community = b.community AND und.src < und.dst),
sym AS (SELECT DISTINCT src, dst FROM
        (SELECT src, dst FROM intra UNION ALL SELECT dst, src FROM intra)),
r(vid, label) AS (
  SELECT vid, vid FROM lv
  UNION
  SELECT sym.dst, r.label FROM r JOIN sym ON sym.src = r.vid
  WHERE r.label < sym.dst
),
comp AS (SELECT vid, MIN(label) AS component FROM r GROUP BY vid),
parts AS (SELECT lv.community,
                 CAST(COUNT(DISTINCT component) AS BIGINT) AS n_parts
          FROM lv JOIN comp USING (vid) GROUP BY 1)
SELECT lv.vid, lv.community, comp.component AS refined_community,
       parts.n_parts
FROM lv JOIN comp USING (vid) JOIN parts USING (community)
"""


def q_scd2_versions(spark, sf_dir):
    """X203: SCD Type-2 interval compaction of the event stream —
    per-user event_type change log folded into versioned validity
    intervals (temporal.scd2_compact), timestamps as epoch micros for
    hash stability (the sessionize convention). Per-user windows only;
    one shuffle, no UDFs."""
    from credigraph_spark.temporal import _epoch_us, scd2_compact

    ev = _t(spark, sf_dir, "events")
    ev = ev.select("user_id", _epoch_us(ev, "ts").alias("ts_us"),
                   "event_type", "event_id")
    return scd2_compact(ev, "user_id", "event_type", "ts_us",
                        order_col="event_id")


_SCD2_SQL = """
WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type, event_id
            FROM events),
o AS (SELECT user_id, ts_us, event_type, event_id,
             CASE WHEN LAG(event_type) OVER w IS NULL
                    OR LAG(event_type) OVER w <> event_type
                  THEN 1 ELSE 0 END AS chg
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
v AS (SELECT user_id, ts_us, event_type, chg,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                            ROWS UNBOUNDED PRECEDING) AS ver
      FROM o),
g AS (SELECT user_id, ver, MIN(event_type) AS event_type,
             MIN(ts_us) AS valid_from,
             CAST(COUNT(*) AS BIGINT) AS n_rows
      FROM v GROUP BY 1, 2)
SELECT user_id, event_type, valid_from,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY ver)
         AS valid_to,
       n_rows
FROM g
"""


def q_touch_attribution(spark, sf_dir):
    """X204: first/last-touch conversion attribution — every purchase
    gets its first and last view/click touch by the same user within a
    7-day lookback (temporal.touch_attribution): ONE per-user
    range-frame window pass, struct MIN/MAX with the (ts, id) unique
    tie-break, epoch-micro timestamps for hash stability."""
    from credigraph_spark.temporal import _epoch_us, touch_attribution

    ev = _t(spark, sf_dir, "events")
    ev = ev.select("user_id", _epoch_us(ev, "ts").alias("ts_us"),
                   "event_type", "event_id")
    return touch_attribution(ev)


_ATTRIB_SQL = """
WITH ev AS (SELECT user_id, epoch_us(ts) AS ts_us, event_type, event_id
            FROM events),
w AS (
  SELECT user_id, ts_us, event_type, event_id,
         MIN(CASE WHEN event_type IN ('view', 'click')
                  THEN ROW(ts_us, event_id, event_type) END)
           OVER lb AS f,
         MAX(CASE WHEN event_type IN ('view', 'click')
                  THEN ROW(ts_us, event_id, event_type) END)
           OVER lb AS l,
         COALESCE(SUM(CASE WHEN event_type IN ('view', 'click')
                           THEN 1 ELSE 0 END) OVER lb, 0) AS n_touches
  FROM ev
  WINDOW lb AS (PARTITION BY user_id ORDER BY ts_us
                RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING))
SELECT user_id, event_id AS conversion_id, ts_us AS conversion_ts,
       struct_extract(f, 1) AS first_ts, struct_extract(f, 2) AS first_id,
       struct_extract(f, 3) AS first_type,
       struct_extract(l, 1) AS last_ts, struct_extract(l, 2) AS last_id,
       struct_extract(l, 3) AS last_type,
       CAST(n_touches AS BIGINT) AS n_touches
FROM w WHERE event_type = 'purchase'
"""


def q_leiden_two_level(spark, sf_dir):
    """X205: full two-level Leiden (graph.louvain.leiden_two_level) —
    Louvain phase 1, connectivity REFINEMENT (parts = connected pieces
    of each community), contraction on the refined parts and ONE
    coarse weighted move CONSTRAINED to same-original-community merges
    (degrees/2m stay global, so gains are true modularity). Guarantees
    internally-connected communities, which louvain_two_level cannot."""
    from credigraph_spark.graph.louvain import leiden_two_level

    return leiden_two_level(_edges(spark, sf_dir), rounds=2,
                            coarse_rounds=1)


def _leiden2_sql(coarse_rounds: int = 1) -> str:
    parts = [
        f"WITH RECURSIVE lv AS MATERIALIZED "
        f"(SELECT * FROM ({_louvain_sql(2)}) t)",
        f"e AS ({_E_SQL})",
        "und2 AS MATERIALIZED (SELECT DISTINCT src, dst FROM "
        "(SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e))",
        "intra AS MATERIALIZED (SELECT und2.src, und2.dst FROM und2 "
        "JOIN lv a ON a.vid = und2.src JOIN lv b ON b.vid = und2.dst "
        "WHERE a.community = b.community AND und2.src < und2.dst)",
        "sym AS (SELECT DISTINCT src, dst FROM (SELECT src, dst FROM intra "
        "UNION ALL SELECT dst, src FROM intra))",
        "rr(vid, label) AS (SELECT vid, vid FROM lv UNION "
        "SELECT sym.dst, rr.label FROM rr JOIN sym ON sym.src = rr.vid "
        "WHERE rr.label < sym.dst)",
        "comp AS (SELECT vid, MIN(label) AS part FROM rr GROUP BY vid)",
        "pm AS MATERIALIZED (SELECT lv.vid, comp.part, "
        "lv.community AS orig FROM lv JOIN comp USING (vid))",
        "ce AS MATERIALIZED (SELECT a.part AS src, b.part AS dst, "
        "COUNT(*) AS w FROM und2 JOIN pm a ON und2.src = a.vid "
        "JOIN pm b ON und2.dst = b.vid GROUP BY 1, 2)",
        "pc AS MATERIALIZED (SELECT DISTINCT part, orig FROM pm)",
        "cand_e AS MATERIALIZED (SELECT ce.src, ce.dst, ce.w FROM ce "
        "JOIN pc pu ON ce.src = pu.part JOIN pc pv ON ce.dst = pv.part "
        "WHERE pu.orig = pv.orig)",
        "cdeg AS MATERIALIZED (SELECT src AS vid, SUM(w) AS deg FROM ce "
        "GROUP BY src)",
        "ctwom AS (SELECT CAST(SUM(deg) AS DOUBLE) AS c FROM cdeg)",
        "t0 AS MATERIALIZED (SELECT vid, vid AS community FROM cdeg)",
    ]
    for r in range(coarse_rounds):
        parts.append(
            f"cw{r} AS MATERIALIZED (SELECT cand_e.src AS vid, "
            f"t.community AS c, SUM(cand_e.w) AS w FROM cand_e "
            f"JOIN t{r} t ON cand_e.dst = t.vid "
            f"WHERE cand_e.src <> cand_e.dst GROUP BY 1, 2)")
        parts.append(
            f"ct{r} AS MATERIALIZED (SELECT t.community AS c, "
            f"SUM(cdeg.deg) AS tot FROM t{r} t JOIN cdeg ON t.vid = cdeg.vid "
            f"GROUP BY 1)")
        parts.append(
            f"cc{r} AS (SELECT COALESCE(w.vid, cur.vid) AS vid, "
            f"COALESCE(w.c, cur.c) AS c, COALESCE(w.w, 0) AS w "
            f"FROM cw{r} w FULL OUTER JOIN "
            f"(SELECT vid, community AS c FROM t{r}) cur "
            f"ON w.vid = cur.vid AND w.c = cur.c)")
        parts.append(
            f"t{r+1} AS MATERIALIZED (SELECT vid, c AS community FROM ("
            f"SELECT cand.vid, cand.c, CAST(cand.w AS DOUBLE) "
            f"- CAST(cdeg.deg AS DOUBLE) * CAST(tot.tot - CASE WHEN "
            f"cand.c = t.community THEN cdeg.deg ELSE 0 END AS DOUBLE) "
            f"/ (SELECT c FROM ctwom) AS score "
            f"FROM cc{r} cand JOIN ct{r} tot ON cand.c = tot.c "
            f"JOIN cdeg ON cand.vid = cdeg.vid "
            f"JOIN t{r} t ON cand.vid = t.vid) "
            f"QUALIFY ROW_NUMBER() OVER (PARTITION BY vid "
            f"ORDER BY score DESC, c ASC) = 1)")
    return ",\n".join(parts) + (
        f"\nSELECT pm.vid, pm.part, t.community FROM pm "
        f"JOIN t{coarse_rounds} t ON pm.part = t.vid")


def q_table_profile(spark, sf_dir):
    """X206: Deequ-style column profile of the customer table — one
    scan, one wide HashAggregate (Catalyst collapses all per-column
    expressions), long-form (column, n_rows, n_nulls, n_distinct,
    min/max as strings) output (pipeline.profiling.profile_table).
    Float columns are excluded from min/max stringification (engine-
    specific rendering)."""
    from credigraph_spark.pipeline.profiling import profile_table

    return profile_table(
        _t(spark, sf_dir, "customer"),
        cols=["c_custkey", "c_name", "c_nationkey", "c_mktsegment"])


def _profile_sql() -> str:
    sels = []
    for c in ["c_custkey", "c_name", "c_nationkey", "c_mktsegment"]:
        sels.append(f"""SELECT '{c}' AS column,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COALESCE(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_nulls,
       CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
       CAST(MIN({c}) AS VARCHAR) AS min_str,
       CAST(MAX({c}) AS VARCHAR) AS max_str
FROM customer""")
    return "\nUNION ALL\n".join(sels)


def q_dq_checks(spark, sf_dir):
    """X207: declarative data-quality check suite (dbt-test / Deequ
    analog, pipeline.profiling.dq_checks) over orders: primary-key
    uniqueness, completeness, totalprice range, accepted status values,
    and customer referential integrity (ONE left-anti join). One tiny
    verdict row per check."""
    from credigraph_spark.pipeline.profiling import dq_checks

    orders = _t(spark, sf_dir, "orders")
    cust = _t(spark, sf_dir, "customer")
    return dq_checks(
        orders,
        unique=["o_orderkey"],
        not_null=["o_custkey", "o_orderdate"],
        ranges={"o_totalprice": (0.0, 1_000_000.0)},
        references={"o_custkey": (cust, "c_custkey")},
        accepted={"o_orderstatus": ["O", "F", "P"]})


_DQ_SQL = """
SELECT 'not_null' AS check, 'o_custkey' AS column,
       CAST(COALESCE(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END),
                     0) AS BIGINT) AS n_violations,
       COALESCE(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END), 0)
         = 0 AS passed
FROM orders
UNION ALL
SELECT 'not_null', 'o_orderdate',
       CAST(COALESCE(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END),
                     0) AS BIGINT),
       COALESCE(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END), 0)
         = 0
FROM orders
UNION ALL
SELECT 'range', 'o_totalprice',
       CAST(COALESCE(SUM(CASE WHEN o_totalprice IS NOT NULL
                          AND (o_totalprice < 0.0
                               OR o_totalprice > 1000000.0)
                         THEN 1 ELSE 0 END), 0) AS BIGINT),
       COALESCE(SUM(CASE WHEN o_totalprice IS NOT NULL
                          AND (o_totalprice < 0.0
                               OR o_totalprice > 1000000.0)
                    THEN 1 ELSE 0 END), 0) = 0
FROM orders
UNION ALL
SELECT 'accepted_values', 'o_orderstatus',
       CAST(COALESCE(SUM(CASE WHEN o_orderstatus IS NOT NULL
                          AND o_orderstatus NOT IN ('O', 'F', 'P')
                         THEN 1 ELSE 0 END), 0) AS BIGINT),
       COALESCE(SUM(CASE WHEN o_orderstatus IS NOT NULL
                          AND o_orderstatus NOT IN ('O', 'F', 'P')
                    THEN 1 ELSE 0 END), 0) = 0
FROM orders
UNION ALL
SELECT 'unique', 'o_orderkey',
       CAST(COALESCE(SUM(n - 1), 0) AS BIGINT),
       COALESCE(SUM(n - 1), 0) = 0
FROM (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey)
UNION ALL
SELECT 'references', 'o_custkey',
       CAST(COUNT(*) AS BIGINT),
       COUNT(*) = 0
FROM orders o
WHERE o.o_custkey IS NOT NULL
  AND o.o_custkey NOT IN (SELECT c_custkey FROM customer
                          WHERE c_custkey IS NOT NULL)
"""


def q_landmark_distances(spark, sf_dir):
    """X208: landmark distance oracle (Potamias et al. 2009) — 3
    min-vid landmarks, one bounded per-seed BFS field, pairwise
    estimates est(u,v) = min_L d(u,L)+d(L,v) over the 10-smallest-vid
    sample pairs (graph.nhop.landmark_distances). Serving-time
    distance queries become pure joins against the persisted field."""
    from credigraph_spark.graph.nhop import landmark_distances

    return landmark_distances(_edges(spark, sf_dir), n_landmarks=3,
                              n_sample=10, max_hops=4, directed=False)


def _landmark_sql(n_landmarks: int = 3, n_sample: int = 10,
                  max_hops: int = 4) -> str:
    """Unrolled frontier-min BFS (each level bounded by L*|V| rows) —
    a recursive path walk explodes on dense graphs, this cannot."""
    parts = [f"""WITH e AS ({_E_SQL}),
und AS (SELECT DISTINCT src, dst FROM
        (SELECT src, dst FROM e UNION ALL SELECT dst, src FROM e)),
verts AS (SELECT DISTINCT src AS vid FROM und),
lm AS (SELECT vid FROM verts ORDER BY vid LIMIT {n_landmarks}),
l0 AS (SELECT vid AS seed, vid, 0 AS dist FROM lm)"""]
    for i in range(1, max_hops + 1):
        p = i - 1
        parts.append(f"""l{i} AS MATERIALIZED (
  SELECT seed, vid, MIN(dist) AS dist FROM (
    SELECT seed, vid, dist FROM l{p}
    UNION ALL
    SELECT l.seed, und.dst AS vid, l.dist + 1 AS dist
    FROM l{p} l JOIN und ON und.src = l.vid
  ) GROUP BY 1, 2)""")
    parts.append(f"""smp AS (SELECT vid AS u FROM verts
                            ORDER BY vid LIMIT {n_sample}),
pairs AS (SELECT a.u, b.u AS v FROM smp a JOIN smp b ON a.u < b.u),
est AS (SELECT p.u, p.v,
               CAST(MIN(du.dist + dv.dist) AS BIGINT) AS est_dist,
               CAST(COUNT(DISTINCT du.seed) AS BIGINT) AS n_covering
        FROM pairs p
        JOIN l{max_hops} du ON du.vid = p.u
        JOIN l{max_hops} dv ON dv.vid = p.v AND dv.seed = du.seed
        GROUP BY 1, 2)""")
    return (",\n".join(parts)
            + """\nSELECT p.u, p.v, est.est_dist,
       COALESCE(est.n_covering, 0) AS n_covering
FROM pairs p LEFT JOIN est USING (u, v)""")


def q_scc_condensation(spark, sf_dir):
    """X210: SCC condensation DAG — quotient edges between strongly
    connected components plus each component's longest-path LEVEL in
    the condensation (graph.dag.dag_levels with orient=False: the
    quotient is acyclic by construction, its true direction kept).
    The macro view of directed structure a bow-tie cannot give: per-SCC
    size + topological depth."""
    from credigraph_spark.graph import strongly_connected_components
    from credigraph_spark.graph.adjacency import clean_edges
    from credigraph_spark.graph.dag import dag_levels

    edges = _edges(spark, sf_dir)
    labels, _ = strongly_connected_components(edges)
    ce = clean_edges(edges)
    qe = (ce.join(labels.select(F.col("vid").alias("src"),
                                F.col("scc_id").alias("cu")), "src")
          .join(labels.select(F.col("vid").alias("dst"),
                              F.col("scc_id").alias("cv")), "dst")
          .where(F.col("cu") != F.col("cv"))
          .select(F.col("cu").alias("src"), F.col("cv").alias("dst"))
          .distinct())
    lvl, _ = dag_levels(qe, max_rounds=4, orient=False)
    sizes = labels.groupBy("scc_id").agg(
        F.count("*").cast("long").alias("size"))
    return (sizes.join(lvl.withColumnRenamed("vid", "scc_id"),
                       "scc_id", "left")
            .select("scc_id", "size",
                    F.coalesce("level", F.lit(0)).cast("long")
                    .alias("level")))


def _scc_condensation_sql(rounds: int = 4) -> str:
    parts = [f"WITH RECURSIVE {_SCC_CORE_SQL}",
             """qe AS MATERIALIZED (
  SELECT DISTINCT a.scc_id AS src, b.scc_id AS dst
  FROM e JOIN scc a ON e.src = a.vid JOIN scc b ON e.dst = b.vid
  WHERE a.scc_id <> b.scc_id)""",
             """l0 AS (SELECT vid, CAST(0 AS BIGINT) AS l FROM
  (SELECT src AS vid FROM qe UNION SELECT dst FROM qe))"""]
    for i in range(1, rounds + 1):
        p = i - 1
        parts.append(f"""l{i} AS (
  SELECT l{p}.vid, GREATEST(l{p}.l, COALESCE(m.m, 0)) AS l
  FROM l{p} LEFT JOIN (SELECT qe.dst AS vid, MAX(lp.l + 1) AS m
                       FROM qe JOIN l{p} lp ON lp.vid = qe.src
                       GROUP BY 1) m USING (vid))""")
    parts.append("""sizes AS (SELECT scc_id, CAST(COUNT(*) AS BIGINT)
  AS size FROM scc GROUP BY 1)""")
    return (",\n".join(parts)
            + f"""\nSELECT sizes.scc_id, sizes.size,
       CAST(COALESCE(lv.l, 0) AS BIGINT) AS level
FROM sizes LEFT JOIN l{rounds} lv ON lv.vid = sizes.scc_id""")


def q_target_encode(spark, sf_dir):
    """X209: smoothed target encoding (Micci-Barreca) of order
    priority against the is-finished label — per-category label mean
    shrunk toward the global prior with pseudo-count m=10
    (features.target_encode); the encoding carried as EXACT integer
    num/den plus the rounded double."""
    from credigraph_spark.features import target_encode

    orders = _t(spark, sf_dir, "orders").withColumn(
        "is_f", (F.col("o_orderstatus") == "F").cast("long"))
    return target_encode(orders, "o_orderpriority", "is_f", m=10)


_TARGET_ENC_SQL = """
WITH per AS (SELECT o_orderpriority,
                    CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1
                             ELSE 0 END) AS BIGINT) AS pos
             FROM orders GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS tot_n,
               CAST(SUM(pos) AS BIGINT) AS tot_s FROM per)
SELECT o_orderpriority, n, pos,
       CAST(pos * tot_n + 10 * tot_s AS BIGINT) AS enc_num,
       CAST(tot_n * (n + 10) AS BIGINT) AS enc_den,
       ROUND((pos * tot_n + 10 * tot_s) * 1.0 / (tot_n * (n + 10)), 6)
         AS enc
FROM per, tot
"""


def q_opic_3round(spark, sf_dir):
    """X212: OPIC (Abiteboul et al. 2003) — anytime crawl-priority
    importance: cash diffusion with uniform dangling redistribution and
    accumulated history, 3 synchronous rounds
    (graph.pagerank.opic). Same superstep shape as PageRank, no
    damping, cash conserved exactly."""
    from credigraph_spark.graph.pagerank import opic

    return opic(_edges(spark, sf_dir), rounds=3)


def _opic_sql(rounds: int = 3) -> str:
    parts = [
        f"WITH e AS MATERIALIZED ({_E_SQL})",
        f"verts AS MATERIALIZED ({_VERTS_SQL})",
        "deg AS MATERIALIZED (SELECT src AS vid, COUNT(*) AS outdeg "
        "FROM e GROUP BY src)",
        "n AS (SELECT COUNT(*) AS c FROM verts)",
        "s0 AS MATERIALIZED (SELECT vid, 1.0/(SELECT c FROM n) AS cash, "
        "0.0 AS history FROM verts)",
    ]
    for i in range(rounds):
        parts.append(
            f"d{i} AS (SELECT COALESCE(SUM(cash), 0) AS d FROM s{i} s "
            f"LEFT JOIN deg USING (vid) WHERE deg.outdeg IS NULL)")
        parts.append(
            f"s{i+1} AS MATERIALIZED (SELECT s.vid, "
            f"COALESCE(c.inflow, 0) + (SELECT d FROM d{i})/(SELECT c FROM n)"
            f" AS cash, s.history + s.cash AS history "
            f"FROM s{i} s LEFT JOIN "
            f"(SELECT e.dst AS vid, SUM(s2.cash / deg.outdeg) AS inflow "
            f"FROM e JOIN s{i} s2 ON e.src = s2.vid "
            f"JOIN deg ON deg.vid = e.src GROUP BY e.dst) c "
            f"ON s.vid = c.vid)")
    return (",\n".join(parts)
            + f"\nSELECT vid, ROUND(history, 8) AS history, "
              f"ROUND(cash, 8) AS cash FROM s{rounds}")


def q_crawl_budget(spark, sf_dir):
    """X213: largest-remainder crawl-budget apportionment — an integer
    fetch budget of 1000 split proportionally to per-vertex total
    degree (analytics.apportion_budget): all-integer Hamilton quotas
    (floor + R largest remainders, ties to smaller vid), Σalloc == B
    exactly; the remainder rank uses the O3 distributed construction,
    never a single-partition window."""
    from credigraph_spark.analytics import apportion_budget

    e = _edges(spark, sf_dir)
    deg = (e.select(F.col("src").alias("vid"))
           .unionByName(e.select(F.col("dst").alias("vid")))
           .groupBy("vid").agg(F.count("*").alias("w")))
    return apportion_budget(deg, budget=1000)


_CRAWL_BUDGET_SQL = f"""
WITH e AS ({_E_SQL}),
deg AS (SELECT vid, CAST(COUNT(*) AS BIGINT) AS w FROM
        (SELECT src AS vid FROM e UNION ALL SELECT dst FROM e)
        GROUP BY 1),
tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tot_w FROM deg),
q AS (SELECT vid, w,
             CAST((1000 * w) // tot_w AS BIGINT) AS base,
             CAST((1000 * w) % tot_w AS BIGINT) AS rem
      FROM deg, tot),
bs AS (SELECT CAST(SUM(base) AS BIGINT) AS bs FROM q),
rk AS (SELECT vid, w, base, rem,
              ROW_NUMBER() OVER (ORDER BY rem DESC, vid ASC) AS r
       FROM q)
SELECT vid, w, base,
       CAST(CASE WHEN r <= 1000 - (SELECT bs FROM bs) THEN 1 ELSE 0 END
            AS BIGINT) AS extra,
       CAST(base + CASE WHEN r <= 1000 - (SELECT bs FROM bs)
                        THEN 1 ELSE 0 END AS BIGINT) AS alloc
FROM rk
"""


def q_partition_quality(spark, sf_dir):
    """X211: partitioning-strategy audit — edge cut + load balance of
    md5-hash vs equal-width-range vertex placement at k=8
    (store.partition_quality): both placements pure per-row
    expressions (range needs one broadcast min/max row), the cut is a
    single conditional aggregate over the edge scan — no joins."""
    from credigraph_spark.store import partition_quality

    return partition_quality(_edges(spark, sf_dir), k=8)


def _partition_quality_sql(k: int = 8) -> str:
    hb = ("(('0x' || substr(md5(CAST({c} AS VARCHAR)), 1, 15))::BIGINT"
          f" % {k} + {k}) % {k}")
    rb = (f"LEAST(CAST(FLOOR(({{c}} - mn) * {k} * 1.0 / (mx - mn + 1)) "
          f"AS BIGINT), {k - 1})")
    out = []
    for strategy, b in (("hash", hb), ("range", rb)):
        out.append(f"""(
WITH e AS ({_E_SQL}),
verts AS (SELECT DISTINCT vid FROM
          (SELECT src AS vid FROM e UNION ALL SELECT dst FROM e)),
mm AS (SELECT MIN(vid) AS mn, MAX(vid) AS mx FROM verts),
cut AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
               CAST(COALESCE(SUM(CASE WHEN {b.format(c='src')} <>
                    {b.format(c='dst')} THEN 1 ELSE 0 END), 0) AS BIGINT)
                 AS n_cut
        FROM e, mm),
loads AS (SELECT CAST(MAX(l) AS BIGINT) AS max_load,
                 CAST(MIN(l) AS BIGINT) AS min_load FROM
          (SELECT COUNT(*) AS l FROM verts, mm
           GROUP BY {b.format(c='vid')})),
nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vertices FROM verts)
SELECT '{strategy}' AS strategy, CAST({k} AS BIGINT) AS k,
       nv.n_vertices, cut.n_edges, cut.n_cut,
       ROUND(cut.n_cut * 1.0 / cut.n_edges, 6) AS cut_frac,
       loads.max_load, loads.min_load
FROM cut, loads, nv)""")
    return "\nUNION ALL\n".join(out)


def q_cdc_merge(spark, sf_dir):
    """X215: CDC changelog apply (MERGE INTO / upsert semantics,
    temporal.cdc_apply) — a deterministic I/U/D changelog derived from
    orders folded onto the customer snapshot, last-writer-wins by
    (orderdate, orderkey): winning change per key from ONE struct-max
    aggregation, one full-outer join, D rows dropped. The complement of
    scd2_versions: SCD2 keeps history, CDC apply emits the new
    current."""
    from credigraph_spark.temporal import cdc_apply

    base = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment")
    o = _t(spark, sf_dir, "orders").where(F.col("o_orderkey") % 7 == 0)
    changes = o.select(
        F.when(F.col("o_orderkey") % 77 == 0,
               F.col("o_custkey") + 1000000)
        .otherwise(F.col("o_custkey")).alias("c_custkey"),
        F.when(F.col("o_orderkey") % 77 == 0, F.lit("I"))
        .when(F.col("o_orderkey") % 21 == 0, F.lit("D"))
        .otherwise(F.lit("U")).alias("op"),
        F.col("o_orderdate").alias("ts"),
        F.col("o_orderkey").alias("seq"),
        F.col("o_totalprice").alias("c_acctbal"),
        F.col("o_orderpriority").alias("c_mktsegment"))
    return cdc_apply(base, changes, "c_custkey",
                     ["c_acctbal", "c_mktsegment"], seq_col="seq")


_CDC_SQL = """
WITH ch AS (
  SELECT CASE WHEN o_orderkey % 77 = 0 THEN o_custkey + 1000000
              ELSE o_custkey END AS key,
         CASE WHEN o_orderkey % 77 = 0 THEN 'I'
              WHEN o_orderkey % 21 = 0 THEN 'D'
              ELSE 'U' END AS op,
         o_orderdate AS ts, o_orderkey AS seq,
         o_totalprice AS bal, o_orderpriority AS seg
  FROM orders WHERE o_orderkey % 7 = 0),
win AS (SELECT key, MAX(ROW(ts, seq, op, bal, seg)) AS m
        FROM ch GROUP BY key),
w2 AS (SELECT key, struct_extract(m, 3) AS op,
              struct_extract(m, 4) AS bal,
              struct_extract(m, 5) AS seg
       FROM win)
SELECT COALESCE(b.c_custkey, w2.key) AS c_custkey,
       CASE WHEN w2.op IS NOT NULL THEN w2.bal
            ELSE b.c_acctbal END AS c_acctbal,
       CASE WHEN w2.op IS NOT NULL THEN w2.seg
            ELSE b.c_mktsegment END AS c_mktsegment,
       COALESCE(w2.op, 'base') AS last_op
FROM customer b FULL OUTER JOIN w2 ON b.c_custkey = w2.key
WHERE w2.op IS NULL OR w2.op <> 'D'
"""


def q_mrl_audit(spark, sf_dir):
    """X216: Matryoshka truncation audit — recall@10 of prefix-
    truncated embeddings (d = 8/16/32 of 64) against the full-dim
    exact top-k (pipeline.similarity.mrl_truncation_audit): integer
    hit counts, round(cosine,6) stable ranking, truncation cuts the
    scanned floats (the MRL storage dial)."""
    from credigraph_spark.pipeline.similarity import mrl_truncation_audit

    return mrl_truncation_audit(_t(spark, sf_dir, "embeddings"),
                                dims=(8, 16, 32), k=10, n_queries=10)


def _mrl_sql(dims: tuple[int, ...] = (8, 16, 32), k: int = 10,
             n_queries: int = 10) -> str:
    def topk(d_expr: str, name: str) -> str:
        dot = (f"list_sum(list_transform(generate_series(1, len(q.qv)), "
               f"i -> q.qv[i]::DOUBLE * c.cv[i]::DOUBLE))")
        nq_ = (f"sqrt(list_sum(list_transform(generate_series(1, len(q.qv)),"
               f" i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE)))")
        nc_ = (f"sqrt(list_sum(list_transform(generate_series(1, len(c.cv)),"
               f" i -> c.cv[i]::DOUBLE * c.cv[i]::DOUBLE)))")
        return f"""{name} AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.vid AS query_id, c.vid AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.vid
             ORDER BY ROUND({dot} / ({nq_} * {nc_}), 6) DESC,
                      c.vid ASC) AS rnk
    FROM (SELECT vid, {d_expr} AS qv FROM base
          WHERE vid IN (SELECT vid FROM qids)) q,
         (SELECT vid, {d_expr} AS cv FROM base) c
    WHERE c.vid <> q.vid)
  WHERE rnk <= {k})"""

    parts = ["""WITH base AS (SELECT vec_id AS vid, embedding FROM
  embeddings)""",
             f"qids AS (SELECT vid FROM base ORDER BY vid "
             f"LIMIT {n_queries})",
             topk("embedding", "full_k")]
    sels = []
    for d in dims:
        parts.append(topk(f"embedding[1:{d}]", f"t{d}"))
        sels.append(f"""SELECT CAST({d} AS BIGINT) AS dim,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM qids) AS n_queries,
       CAST({k} AS BIGINT) AS k,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM t{d}
        WHERE (query_id, neighbor_id) IN
              (SELECT (query_id, neighbor_id) FROM full_k))
         AS total_hits,
       ROUND((SELECT COUNT(*) FROM t{d}
              WHERE (query_id, neighbor_id) IN
                    (SELECT (query_id, neighbor_id) FROM full_k))
             * 1.0 / ((SELECT COUNT(*) FROM qids) * {k}), 6) AS recall""")
    return ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(sels)


def q_padding_waste(spark, sf_dir):
    """X217: padding-waste audit of fixed-size batch assembly —
    arrival-order vs length-sorted batching at batch_size=8 over the
    documents corpus (pipeline.sampling.padding_waste_audit): each
    batch pads to its longest member; the audit quantifies the pad-
    token burn sorted batching recovers. O3 distributed ranks, all
    integers."""
    from credigraph_spark.pipeline.sampling import padding_waste_audit

    return padding_waste_audit(_t(spark, sf_dir, "documents"),
                               batch_size=8)


def _padding_waste_sql(batch_size: int = 8) -> str:
    toks = """t AS (
  SELECT doc_id,
         CAST(len(list_filter(regexp_split_to_array(lower(text),
              '[^a-z0-9'']+'), x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents)"""
    sels = []
    for policy, order in (("arrival", "doc_id"),
                          ("length_sorted", "n_tokens, doc_id")):
        sels.append(f"""(
WITH {toks},
r AS (SELECT doc_id, n_tokens,
             ROW_NUMBER() OVER (ORDER BY {order}) - 1 AS rk FROM t),
pb AS (SELECT rk // {batch_size} AS b, COUNT(*) AS rows_,
              MAX(n_tokens) AS mx, SUM(n_tokens) AS tok
       FROM r GROUP BY 1)
SELECT '{policy}' AS policy,
       CAST(SUM(rows_) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_batches,
       CAST(SUM(tok) AS BIGINT) AS total_tokens,
       CAST(SUM(rows_ * mx - tok) AS BIGINT) AS padded_tokens,
       ROUND(SUM(rows_ * mx - tok) * 1.0 /
             (SUM(tok) + SUM(rows_ * mx - tok)), 6) AS waste_frac
FROM pb)""")
    return "\nUNION ALL\n".join(sels)


def q_dup_flow_matrix(spark, sf_dir):
    """X218: cross-source duplicate-flow matrix — the MinHash-LSH
    candidate pairs (same params as q_lsh_pairs) joined to each doc's
    source and counted per unordered source pair: which corpora leak
    into which (the curation diagnostic behind per-source dedup
    budgets). One pair table + two broadcast-size source joins +
    one groupBy."""
    from credigraph_spark.pipeline import lsh_candidate_pairs

    docs = _t(spark, sf_dir, "documents")
    pairs = lsh_candidate_pairs(docs, num_hashes=4, rows_per_band=2)
    src = docs.select(F.col("doc_id"), F.col("source"))
    j = (pairs
         .join(src.select(F.col("doc_id").alias("id_a"),
                          F.col("source").alias("sa")), "id_a")
         .join(src.select(F.col("doc_id").alias("id_b"),
                          F.col("source").alias("sb")), "id_b"))
    return (j.select(F.least("sa", "sb").alias("source_a"),
                     F.greatest("sa", "sb").alias("source_b"))
            .groupBy("source_a", "source_b")
            .agg(F.count("*").cast("long").alias("n_dup_pairs")))


def _dup_flow_sql() -> str:
    return f"""
WITH pairs AS ({_lsh_pairs_sql()})
SELECT LEAST(a.source, b.source) AS source_a,
       GREATEST(a.source, b.source) AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_dup_pairs
FROM pairs
JOIN documents a ON a.doc_id = pairs.id_a
JOIN documents b ON b.doc_id = pairs.id_b
GROUP BY 1, 2
"""


def q_path_trigrams(spark, sf_dir):
    """X219: top-20 frequent 3-step behavior paths over the event
    stream (temporal.path_trigrams) — two LEADs share one user-keyed
    window exchange, triple count partial-aggregated, top-k with a
    lexicographic tie-break."""
    from credigraph_spark.temporal import path_trigrams

    return path_trigrams(_t(spark, sf_dir, "events"), k=20)


_PATH_TRIGRAMS_SQL = """
WITH tri AS (
  SELECT event_type AS step1,
         LEAD(event_type, 1) OVER w AS step2,
         LEAD(event_type, 2) OVER w AS step3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
cnt AS (SELECT step1, step2, step3, CAST(COUNT(*) AS BIGINT) AS n
        FROM tri WHERE step3 IS NOT NULL GROUP BY 1, 2, 3)
SELECT step1, step2, step3, n FROM cnt
ORDER BY n DESC, step1, step2, step3 LIMIT 20
"""


def q_wl_quotient(spark, sf_dir):
    """X220: WL role-quotient graph — the lineitem graph contracted on
    its 3-round 1-WL color classes (graph.wl.wl_quotient): roles as
    nodes, role-pair edge counts as weights; the summarization readout
    of X180's refinement (same contraction shape as Louvain phase 2)."""
    from credigraph_spark.graph.wl import wl_quotient

    return wl_quotient(_edges(spark, sf_dir), rounds=3)


def _wl_quotient_sql(rounds: int = 3) -> str:
    return f"""
WITH wl AS MATERIALIZED (SELECT * FROM ({_wl_sql(rounds)}) t),
e AS ({_E_SQL}),
half AS (SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst)
           AS dst FROM e),
j AS (SELECT a.color AS ca, a.class_size AS za,
             b.color AS cb, b.class_size AS zb
      FROM half
      JOIN wl a ON a.vid = half.src
      JOIN wl b ON b.vid = half.dst)
SELECT LEAST(ca, cb) AS color_a, GREATEST(ca, cb) AS color_b,
       CAST(COUNT(*) AS BIGINT) AS n_edges,
       CASE WHEN ca <= cb THEN za ELSE zb END AS size_a,
       CASE WHEN ca <= cb THEN zb ELSE za END AS size_b
FROM j
GROUP BY 1, 2, 4, 5
"""


def q_retrieval_eval(spark, sf_dir):
    """X221: retrieval-quality evaluation — hit@20 + reciprocal rank
    of each single-term BM25 ranking against the deterministic
    relevance set tf >= 3 (pipeline.retrieval.retrieval_eval); the
    lexical-retrieval analog of the ANN recall gate. Integer counts,
    6dp reciprocal of an integer rank."""
    from credigraph_spark.pipeline.retrieval import retrieval_eval

    docs = _t(spark, sf_dir, "documents")
    return retrieval_eval(docs, _BM25_TERMS, n_docs=docs.count(), k=20)


def _retrieval_eval_sql(k: int = 20, rel_min_tf: int = 3) -> str:
    sels = []
    for t in _BM25_TERMS:
        sels.append(f"""(
WITH top AS (SELECT * FROM ({_bm25_sql([t], k=k)}) b),
ranked AS (SELECT doc_id,
                  ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC)
                    AS rnk
           FROM top),
rel AS (SELECT doc_id FROM (
          SELECT doc_id, COUNT(*) AS tf FROM (
            SELECT doc_id, unnest(list_filter(
              regexp_split_to_array(lower(text), '[^a-z0-9]+'),
              x -> x <> '')) AS term
            FROM documents)
          WHERE term = '{t}' GROUP BY doc_id)
        WHERE tf >= {rel_min_tf}),
h AS (SELECT CAST(COUNT(*) AS BIGINT) AS hits_at_k,
             CAST(COALESCE(MIN(rnk), 0) AS BIGINT) AS first_rel_rank
      FROM ranked WHERE doc_id IN (SELECT doc_id FROM rel))
SELECT '{t}' AS term,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM rel) AS n_relevant,
       h.hits_at_k, h.first_rel_rank,
       CASE WHEN h.first_rel_rank > 0
            THEN ROUND(1.0 / h.first_rel_rank, 6) ELSE 0.0 END AS rr
FROM h)""")
    return "\nUNION ALL\n".join(sels)


def q_ivf_nprobe_sweep(spark, sf_dir):
    """X222: IVF nprobe tuning curve — recall@5 vs probe count
    (1/2/4/8 of 8 lists) against the exact brute-force top-k
    (pipeline.ivf.ivf_nprobe_sweep); nprobe=8 probes every list, so
    the curve must end at recall 1.0 (built-in self-check). Integer
    hits, round(cosine,6) stable orderings on both rankings."""
    from credigraph_spark.pipeline.ivf import ivf_nprobe_sweep

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"))
    return ivf_nprobe_sweep(emb.where(F.col("vec_id") < 5), emb,
                            nprobes=(1, 2, 4, 8), k=5, n_lists=8, seed=7)


def _ivf_sweep_sql(nprobes: tuple[int, ...] = (1, 2, 4, 8), k: int = 5,
                   n_lists: int = 8, seed: int = 7) -> str:
    dot = ("list_sum(list_transform(generate_series(1, len(q.qv)), "
           "i -> q.qv[i]::DOUBLE * c.embedding[i]::DOUBLE))")
    nq_ = ("sqrt(list_sum(list_transform(generate_series(1, len(q.qv)), "
           "i -> q.qv[i]::DOUBLE * q.qv[i]::DOUBLE)))")
    nc_ = ("sqrt(list_sum(list_transform(generate_series(1, "
           "len(c.embedding)), "
           "i -> c.embedding[i]::DOUBLE * c.embedding[i]::DOUBLE)))")
    exact = f"""exact AS (
  SELECT query_id, neighbor_id FROM (
    SELECT q.query_id, c.vec_id AS neighbor_id,
           ROW_NUMBER() OVER (PARTITION BY q.query_id
             ORDER BY ROUND({dot} / ({nq_} * {nc_}), 6) DESC,
                      c.vec_id ASC) AS rnk
    FROM (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
          WHERE vec_id < 5) q, embeddings c
    WHERE c.vec_id <> q.query_id)
  WHERE rnk <= {k})"""
    sels = []
    for p in nprobes:
        sels.append(f"""(
WITH {exact},
approx AS (SELECT query_id, neighbor_id FROM
  ({_ann_ivf_sql(n_lists=n_lists, nprobe=p, seed=seed, k=k)}) t)
SELECT CAST({p} AS BIGINT) AS nprobe,
       (SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) FROM embeddings
        WHERE vec_id < 5) AS n_queries,
       CAST({k} AS BIGINT) AS k,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM approx
        WHERE (query_id, neighbor_id) IN
              (SELECT (query_id, neighbor_id) FROM exact))
         AS total_hits,
       ROUND((SELECT COUNT(*) FROM approx
              WHERE (query_id, neighbor_id) IN
                    (SELECT (query_id, neighbor_id) FROM exact))
             * 1.0 /
             ((SELECT COUNT(DISTINCT vec_id) FROM embeddings
               WHERE vec_id < 5) * {k}), 6) AS recall)""")
    return "\nUNION ALL\n".join(sels)


def q_psi_drift(spark, sf_dir):
    """X223: Population Stability Index drift report — o_totalprice of
    even-keyed orders (reference) vs odd-keyed orders (current) in 10
    equal-width reference bins (analytics.psi_drift): exact integer
    bin counts, 6dp fixed-order proportions and contributions; the
    standard ML feature-monitoring screen."""
    from credigraph_spark.analytics import psi_drift

    o = _t(spark, sf_dir, "orders")
    return psi_drift(o.where(F.col("o_orderkey") % 2 == 0),
                     o.where(F.col("o_orderkey") % 2 == 1),
                     "o_totalprice", n_bins=10)


def _psi_sql(n_bins: int = 10, eps: float = 1e-6) -> str:
    def binned(pred: str, name: str) -> str:
        return f"""{name} AS (
  SELECT CAST(LEAST(GREATEST(FLOOR((o_totalprice - mn) * {n_bins}
                                   / (mx - mn)), 0), {n_bins - 1})
              AS BIGINT) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM orders, mm
  WHERE o_totalprice IS NOT NULL AND {pred}
  GROUP BY 1)"""

    return f"""
WITH mm AS (SELECT CAST(MIN(o_totalprice) AS DOUBLE) AS mn,
                   CAST(MAX(o_totalprice) AS DOUBLE) AS mx
            FROM orders WHERE o_orderkey % 2 = 0),
{binned("o_orderkey % 2 = 0", "r")},
{binned("o_orderkey % 2 = 1", "c")},
tr AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM r),
tc AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM c),
bins AS (SELECT unnest(generate_series(0, {n_bins - 1})) AS bin),
j AS (SELECT bins.bin,
             COALESCE(r.n, 0) AS n_ref, COALESCE(c.n, 0) AS n_cur,
             (SELECT t FROM tr) AS trr, (SELECT t FROM tc) AS tcc,
             mm.mn, mm.mx
      FROM bins LEFT JOIN r USING (bin) LEFT JOIN c USING (bin), mm)
SELECT CAST(bin AS BIGINT) AS bin,
       ROUND(mn + bin * (mx - mn) / {n_bins}, 6) AS lo,
       ROUND(mn + (bin + 1) * (mx - mn) / {n_bins}, 6) AS hi,
       n_ref, n_cur,
       ROUND(GREATEST(n_ref * 1.0 / trr, {eps}), 6) AS p_ref,
       ROUND(GREATEST(n_cur * 1.0 / tcc, {eps}), 6) AS p_cur,
       ROUND((GREATEST(n_cur * 1.0 / tcc, {eps})
              - GREATEST(n_ref * 1.0 / trr, {eps}))
             * ln(GREATEST(n_cur * 1.0 / tcc, {eps})
                  / GREATEST(n_ref * 1.0 / trr, {eps})), 6)
         AS psi_contrib
FROM j
"""


def q_lang_confusion(spark, sf_dir):
    """X224: language-ID confusion matrix — the labeled `lang` column
    against the stopword-heuristic predictor's `lang_pred`, counted per
    (labeled, predicted) pair with the pair's share of its labeled
    row total as an exact-integer-backed 6dp ratio. The curation QA
    screen for 'does the cheap lang-id agree with the upstream label,
    and where does it break'."""
    from credigraph_spark.pipeline import language_id

    docs = _t(spark, sf_dir, "documents")
    pred = language_id(docs).select("doc_id", "lang_pred")
    m = (docs.select("doc_id", F.col("lang").alias("lang_true"))
         .join(pred, "doc_id")
         .groupBy("lang_true", "lang_pred")
         .agg(F.count("*").cast("long").alias("n")))
    tot = m.groupBy("lang_true").agg(F.sum("n").cast("long").alias("t"))
    return (m.join(tot, "lang_true")
            .select("lang_true", "lang_pred", "n",
                    F.col("t").alias("n_labeled"),
                    F.round(F.col("n") / F.col("t"), 6).alias("frac")))


def _lang_confusion_sql() -> str:
    return f"""
WITH pred AS (SELECT doc_id, lang_pred FROM ({_langid_sql()}) p),
m AS (SELECT d.lang AS lang_true, pred.lang_pred,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM documents d JOIN pred USING (doc_id)
      GROUP BY 1, 2),
tot AS (SELECT lang_true, CAST(SUM(n) AS BIGINT) AS t FROM m GROUP BY 1)
SELECT m.lang_true, m.lang_pred, m.n, tot.t AS n_labeled,
       ROUND(m.n * 1.0 / tot.t, 6) AS frac
FROM m JOIN tot USING (lang_true)
"""


# Fellegi-Sunter compare fields over customer: (name, m, u) with the
# agreement expression given per engine below. m/u are model constants;
# the log2 weights are injected as identical Python float literals into
# BOTH engines so the per-pair sums are bit-equal.
_FS_FIELDS = [("bal_k", 0.95, 0.10), ("name_digit", 0.90, 0.10),
              ("dollar_digit", 0.85, 0.10)]


def q_fs_linkage(spark, sf_dir):
    """X225: Fellegi-Sunter probabilistic record-linkage weights —
    customers blocked on (nation, segment), compared on thousand-dollar
    balance bucket / last name digit / last whole-dollar digit; per-pair
    log2 likelihood-ratio weight, top-200 ranked clerical-review queue
    (pipeline.linkage.fs_match_weights)."""
    from credigraph_spark.pipeline.linkage import fs_match_weights

    c = _t(spark, sf_dir, "customer")
    fields = [
        ("bal_k", F.floor(F.col("c_acctbal") / 1000).cast("long"),
         _FS_FIELDS[0][1], _FS_FIELDS[0][2]),
        ("name_digit", F.substring("c_name", -1, 1),
         _FS_FIELDS[1][1], _FS_FIELDS[1][2]),
        ("dollar_digit", F.floor("c_acctbal").cast("long") % 10,
         _FS_FIELDS[2][1], _FS_FIELDS[2][2]),
    ]
    return fs_match_weights(c, "c_custkey",
                            ["c_nationkey", "c_mktsegment"], fields,
                            top_k=200)


def _fs_linkage_sql(top_k: int = 200) -> str:
    import math

    exprs = {
        "bal_k": "CAST(FLOOR({s}.c_acctbal / 1000) AS BIGINT)",
        "name_digit": "substr({s}.c_name, length({s}.c_name), 1)",
        "dollar_digit": "CAST(FLOOR({s}.c_acctbal) AS BIGINT) % 10",
    }
    agree, weight, pattern = [], [], []
    for name, m, u in _FS_FIELDS:
        # string-cast so DuckDB types the literals DOUBLE (a bare decimal
        # literal parses as DECIMAL and the whole weight sum would stay
        # DECIMAL, hashing differently from Spark's double).
        wa = f"CAST('{math.log2(m / u)!r}' AS DOUBLE)"
        wd = f"CAST('{math.log2((1.0 - m) / (1.0 - u))!r}' AS DOUBLE)"
        ea, eb = exprs[name].format(s="a"), exprs[name].format(s="b")
        ag = f"({ea} IS NOT DISTINCT FROM {eb})"
        agree.append(f"{ag} AS agree_{name}")
        weight.append(f"CASE WHEN {ag} THEN {wa} ELSE {wd} END")
        pattern.append(f"CASE WHEN {ag} THEN '1' ELSE '0' END")
    return f"""
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       {', '.join(agree)},
       {' || '.join(pattern)} AS pattern,
       ROUND(CAST(0.0 AS DOUBLE) + {' + '.join(weight)}, 6) AS weight
FROM customer a JOIN customer b
  ON a.c_custkey < b.c_custkey
 AND a.c_nationkey = b.c_nationkey
 AND a.c_mktsegment = b.c_mktsegment
ORDER BY weight DESC, id_a, id_b
LIMIT {top_k}
"""


def q_ipf_rake(spark, sf_dir):
    """X226: IPF / raking (Sinkhorn-Knopp) mixture balancing — fit
    per-(source, lang) corpus weights whose row and column sums hit
    uniform marginals, 2 full scaling sweeps (analytics.ipf_rake); the
    two-factor data-mixing counterpart of X172's temperature weights."""
    from credigraph_spark.analytics import ipf_rake

    return ipf_rake(_t(spark, sf_dir, "documents"), "source", "lang",
                    rounds=2)


def _ipf_sql(rounds: int = 2) -> str:
    parts = ["""
WITH ct AS (SELECT source AS r, lang AS c, CAST(COUNT(*) AS BIGINT) AS n
            FROM documents
            WHERE source IS NOT NULL AND lang IS NOT NULL GROUP BY 1, 2),
tt AS (SELECT CAST(SUM(n) AS DOUBLE) AS tot,
              CAST(COUNT(DISTINCT r) AS DOUBLE) AS nr,
              CAST(COUNT(DISTINCT c) AS DOUBLE) AS nc FROM ct),
w0 AS (SELECT r, c, n, CAST(n AS DOUBLE) AS w, tot, nr, nc FROM ct, tt)"""]
    i = 0
    for _ in range(rounds):
        parts.append(
            f"w{i+1} AS (SELECT r, c, n, w * (tot / nr) "
            f"/ SUM(w) OVER (PARTITION BY r) AS w, tot, nr, nc FROM w{i})")
        parts.append(
            f"w{i+2} AS (SELECT r, c, n, w * (tot / nc) "
            f"/ SUM(w) OVER (PARTITION BY c) AS w, tot, nr, nc FROM w{i+1})")
        i += 2
    return ",\n".join(parts) + (
        f"\nSELECT r AS source, c AS lang, n, ROUND(w, 8) AS w_fit FROM w{i}")


def q_ngram_novelty(spark, sf_dir):
    """X227: ingest-order n-gram novelty — per doc, the share of its
    distinct 3-word shingles whose first corpus occurrence (MIN doc_id
    over docs containing the gram) is this doc
    (pipeline.textstats.ngram_novelty); the who-was-first attribution
    complement of dup_ngrams."""
    from credigraph_spark.pipeline.textstats import ngram_novelty

    return ngram_novelty(_t(spark, sf_dir, "documents"), shingle_n=3)


def _ngram_novelty_sql() -> str:
    return f"""
WITH {_SHINGLES_SQL},
x AS (SELECT id, unnest(sh_set) AS sh FROM sets),
first AS (SELECT sh, MIN(id) AS fid FROM x GROUP BY 1)
SELECT x.id AS doc_id, COUNT(*) AS n_ngrams,
       CAST(SUM(CASE WHEN f.fid = x.id THEN 1 ELSE 0 END) AS BIGINT)
         AS n_novel,
       ROUND(SUM(CASE WHEN f.fid = x.id THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 8) AS novelty
FROM x JOIN first f USING (sh)
GROUP BY x.id
"""


def q_file_skipping(spark, sf_dir):
    """X228: zone-map file-skipping audit over orders — lay the table
    into 16 files sorted-by-o_orderkey vs z-ordered over
    (o_orderkey, o_custkey), build per-file min/max zone maps, probe
    each column with 9 equally-spaced point predicates, and report
    files pruned + rows still scanned per (layout, probe column)
    (store.file_skipping_audit). Measures the X191 claim: the
    single-column sort prunes only its own column; z-order prunes on
    both."""
    from credigraph_spark.store import file_skipping_audit

    return file_skipping_audit(
        _t(spark, sf_dir, "orders"), ["o_orderkey", "o_custkey"],
        n_files=16, bits=8, n_probes=9)


def _file_skipping_sql() -> str:
    return """
WITH src AS (SELECT CAST(o_orderkey AS BIGINT) AS c1,
                    CAST(o_custkey AS BIGINT) AS c2 FROM orders
             WHERE o_orderkey IS NOT NULL AND o_custkey IS NOT NULL),
mm AS (SELECT MIN(c1) AS mn1, MAX(c1) AS mx1,
              MIN(c2) AS mn2, MAX(c2) AS mx2 FROM src),
bz AS (SELECT c1, c2,
              (c1 - mn1) * (1::BIGINT << 8) // (mx1 - mn1 + 1) AS b1,
              (c2 - mn2) * (1::BIGINT << 8) // (mx2 - mn2 + 1) AS b2,
              mn1, mx1, mn2, mx2
       FROM src, mm),
tagged AS (
  SELECT 'sort_o_orderkey' AS layout,
         CAST((c1 - mn1) * 16 // (mx1 - mn1 + 1) AS BIGINT) AS f,
         c1, c2 FROM bz
  UNION ALL
  SELECT 'zorder',
         CAST(CAST(list_sum(list_transform(generate_series(0, 7), j ->
                (((b1 >> j) & 1) << (j * 2 + 1))
                + (((b2 >> j) & 1) << (j * 2)))) AS BIGINT)
              * 16 // 65536 AS BIGINT) AS f,
         c1, c2 FROM bz),
zone AS (SELECT layout, f, MIN(c1) AS f_mn1, MAX(c1) AS f_mx1,
                MIN(c2) AS f_mn2, MAX(c2) AS f_mx2,
                CAST(COUNT(*) AS BIGINT) AS f_rows
         FROM tagged GROUP BY 1, 2),
probes AS (
  SELECT 'o_orderkey' AS probe_col, mn1 + (mx1 - mn1) * p.p // 10 AS v
  FROM mm, (SELECT unnest(generate_series(1, 9)) AS p) p
  UNION ALL
  SELECT 'o_custkey', mn2 + (mx2 - mn2) * p.p // 10
  FROM mm, (SELECT unnest(generate_series(1, 9)) AS p) p),
aud AS (SELECT z.layout, pr.probe_col, z.f_rows,
               CASE WHEN pr.probe_col = 'o_orderkey'
                    THEN pr.v < z.f_mn1 OR pr.v > z.f_mx1
                    ELSE pr.v < z.f_mn2 OR pr.v > z.f_mx2 END AS skipped
        FROM zone z, probes pr)
SELECT layout, probe_col,
       CAST(COUNT(*) // 9 AS BIGINT) AS n_files,
       CAST(9 AS BIGINT) AS n_probes,
       CAST(COALESCE(SUM(CASE WHEN skipped THEN 1 END), 0) AS BIGINT)
         AS n_skipped,
       ROUND(COALESCE(SUM(CASE WHEN skipped THEN 1 END), 0) * 1.0
             / COUNT(*), 6) AS skip_frac,
       CAST(COALESCE(SUM(CASE WHEN NOT skipped THEN f_rows END), 0)
            AS BIGINT) AS rows_scanned,
       ROUND(COALESCE(SUM(CASE WHEN NOT skipped THEN f_rows END), 0)
             * 1.0 / SUM(f_rows), 6) AS scan_frac
FROM aud GROUP BY 1, 2
"""


def q_crawl_capacity(spark, sf_dir):
    """X229: per-fetch-slot crawl capacity plan over events (host =
    user_id, 8 slots, fetch_cost 1, host_delay 15) — which slots are
    politeness-bound vs throughput-bound (analytics.crawl_capacity).
    The fleet-sizing complement of X213's per-host quota
    apportionment."""
    from credigraph_spark.analytics import crawl_capacity

    return crawl_capacity(_t(spark, sf_dir, "events"),
                          host_col="user_id", n_slots=8,
                          fetch_cost=1, host_delay=15)


def _crawl_capacity_sql() -> str:
    return """
WITH ph AS (SELECT user_id AS host, CAST(COUNT(*) AS BIGINT) AS n
            FROM events WHERE user_id IS NOT NULL GROUP BY 1),
sl AS (SELECT ('0x' || substr(md5(CAST(host AS VARCHAR)), 1, 15))::BIGINT
                % 8 AS slot,
              n, (n - 1) * 15 + 1 AS fin FROM ph)
SELECT slot, CAST(COUNT(*) AS BIGINT) AS n_hosts,
       CAST(SUM(n) AS BIGINT) AS n_urls,
       CAST(SUM(n) * 1 AS BIGINT) AS throughput_bound,
       CAST(MAX(fin) AS BIGINT) AS politeness_bound,
       CAST(GREATEST(SUM(n) * 1, MAX(fin)) AS BIGINT) AS makespan,
       CASE WHEN MAX(fin) > SUM(n) * 1 THEN 'politeness'
            ELSE 'throughput' END AS binding
FROM sl GROUP BY 1
"""


def q_hitting_time(spark, sf_dir):
    """X230: truncated hitting time (Sarkar-Moore, cap 3) from every
    vertex to the target set {vid % 50 == 0} over the directed
    lineitem graph (graph.nhop.truncated_hitting_time) — the
    walk-expectation counterpart of bfs_distances, one AVG-contribution
    shuffle per round."""
    from credigraph_spark.graph.nhop import truncated_hitting_time

    edges = _edges(spark, sf_dir)
    targets = (edges.select(F.col("src").alias("vid"))
               .unionByName(edges.select(F.col("dst").alias("vid")))
               .distinct().where(F.col("vid") % 50 == 0))
    return truncated_hitting_time(edges, targets, rounds=3)


def _hitting_time_sql(rounds: int = 3) -> str:
    cap = float(rounds)
    parts = [f"""
WITH e AS ({_E_SQL}),
verts AS (SELECT DISTINCT vid FROM
          (SELECT src AS vid FROM e UNION ALL SELECT dst FROM e)),
tset AS (SELECT vid FROM verts WHERE vid % 50 = 0),
h0 AS (SELECT v.vid,
              CASE WHEN t.vid IS NOT NULL THEN 0.0 ELSE {cap} END AS h
       FROM verts v LEFT JOIN tset t ON v.vid = t.vid)"""]
    for r in range(1, rounds + 1):
        parts.append(f""",
nb{r} AS (SELECT e.src AS vid, AVG(p.h) AS nh
          FROM e JOIN h{r - 1} p ON e.dst = p.vid GROUP BY 1),
h{r} AS (SELECT v.vid,
                CASE WHEN t.vid IS NOT NULL THEN 0.0
                     ELSE LEAST({cap}, 1.0 + COALESCE(nb.nh, {cap}))
                END AS h
         FROM verts v LEFT JOIN tset t ON v.vid = t.vid
                      LEFT JOIN nb{r} nb ON v.vid = nb.vid)""")
    parts.append(f"\nSELECT vid, ROUND(h, 8) AS h FROM h{rounds}")
    return "".join(parts)


def q_bloom_skipping(spark, sf_dir):
    """X231: per-file Bloom-filter skipping audit on orders — files
    laid out by o_orderkey, point probes on the DECORRELATED integer
    price column where zone maps prune nothing (X228 measured that
    zero); per-file Blooms (m=65536, k=3, X190 bit formula) still skip
    absent values (store.bloom_skipping_audit). The
    parquet/iceberg bloom_filter_enabled trade as numbers."""
    from credigraph_spark.store import bloom_skipping_audit

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.floor("o_totalprice").cast("long").alias("price_i"))
    return bloom_skipping_audit(o, "o_orderkey", "price_i",
                                n_files=16, m_bits=65536,
                                k_hashes=3, n_probes=9)


def _bloom_skipping_sql() -> str:
    h = ("('0x' || substr(md5('7' || ':' || j.j || ':' "
         "|| CAST({v} AS VARCHAR)), 1, 15))::BIGINT % 65536")
    return f"""
WITH src AS (SELECT CAST(o_orderkey AS BIGINT) AS c1,
                    CAST(FLOOR(o_totalprice) AS BIGINT) AS c2
             FROM orders
             WHERE o_orderkey IS NOT NULL AND o_totalprice IS NOT NULL),
mm AS (SELECT MIN(c1) AS mn1, MAX(c1) AS mx1,
              MIN(c2) AS mn2, MAX(c2) AS mx2 FROM src),
rws AS (SELECT (c1 - mn1) * 16 // (mx1 - mn1 + 1) AS f, c2
        FROM src, mm),
zone AS (SELECT f, MIN(c2) AS f_mn, MAX(c2) AS f_mx FROM rws GROUP BY 1),
fpos AS (SELECT DISTINCT f, {h.format(v='c2')} AS pos
         FROM rws, (SELECT unnest(generate_series(0, 2)) AS j) j),
probes AS (SELECT DISTINCT mn2 + (mx2 - mn2) * p.p // 10 AS v
           FROM mm, (SELECT unnest(generate_series(1, 9)) AS p) p),
ppos AS (SELECT DISTINCT v, {h.format(v='v')} AS pos
         FROM probes, (SELECT unnest(generate_series(0, 2)) AS j) j),
preq AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS req FROM ppos GROUP BY 1),
matched AS (SELECT fpos.f, ppos.v, CAST(COUNT(*) AS BIGINT) AS hit
            FROM fpos JOIN ppos USING (pos) GROUP BY 1, 2),
cont AS (SELECT DISTINCT f, c2 AS v FROM rws
         WHERE c2 IN (SELECT v FROM probes)),
grid AS (SELECT z.f, p.v, z.f_mn, z.f_mx FROM zone z, probes p),
aud AS (SELECT g.f, g.v,
               (g.v < g.f_mn OR g.v > g.f_mx) AS zm_skip,
               COALESCE(m.hit, 0) < r.req AS bl_skip,
               CASE WHEN c.v IS NOT NULL THEN 1 ELSE 0 END AS has
        FROM grid g LEFT JOIN matched m ON m.f = g.f AND m.v = g.v
                    JOIN preq r ON r.v = g.v
                    LEFT JOIN cont c ON c.f = g.f AND c.v = g.v)
SELECT v, CAST(COUNT(*) AS BIGINT) AS n_files,
       CAST(COALESCE(SUM(CASE WHEN zm_skip THEN 1 END), 0) AS BIGINT)
         AS zm_skipped,
       CAST(COALESCE(SUM(CASE WHEN bl_skip THEN 1 END), 0) AS BIGINT)
         AS bloom_skipped,
       CAST(SUM(has) AS BIGINT) AS n_containing,
       CAST(COUNT(*) - COALESCE(SUM(CASE WHEN bl_skip THEN 1 END), 0)
            - SUM(has) AS BIGINT) AS bloom_false_pos
FROM aud GROUP BY 1
"""


def q_label_noise(spark, sf_dir):
    """X232: confident-learning label-noise screen (Northcutt et al.
    2021) over documents — class probabilities from the stopword-hit
    counts with add-1 smoothing (p_j = (hits_j+1)/(tot+4), integer-
    derived + rounded so thresholds replay cross-engine), labels =
    the upstream lang column; off-diagonal confident cells are the
    suspected label errors (pipeline.classify.label_noise_screen)."""
    from credigraph_spark.pipeline.classify import label_noise_screen
    from credigraph_spark.pipeline.textstats import _STOPWORDS, tokens

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", F.col("lang").alias("label"),
        tokens("text").alias("_toks"))
    def _hit(arr):
        return lambda x: F.array_contains(arr, x)

    hit_cols = []
    for lang, words in _STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        hit_cols.append(
            F.size(F.filter("_toks", _hit(arr))).alias(f"_h_{lang}"))
    wide = docs.select("doc_id", "label", *hit_cols)
    tot = sum(F.col(f"_h_{lang}") for lang in _STOPWORDS)
    k = len(_STOPWORDS)
    structs = [F.struct(F.lit(lang).alias("cls"),
                        F.round((F.col(f"_h_{lang}") + 1) / (tot + k), 6)
                        .alias("p")) for lang in _STOPWORDS]
    probs = (wide.select("doc_id", "label",
                         F.explode(F.array(*structs)).alias("_s"))
             .select("doc_id", "label", F.col("_s.cls").alias("cls"),
                     F.col("_s.p").alias("p")))
    return label_noise_screen(probs)


def _label_noise_sql() -> str:
    stop = {"en": _EN_STOP, "fr": _FR_STOP, "de": _DE_STOP,
            "es": _ES_STOP}
    hits = " UNION ALL ".join(
        f"SELECT doc_id, label, '{lang}' AS cls, "
        f"len(list_filter(toks, x -> list_contains({arr}, x))) AS hits "
        f"FROM b" for lang, arr in stop.items())
    return f"""
WITH b AS (SELECT doc_id, lang AS label, {_TOKENS_SQL} AS toks
           FROM documents),
h AS ({hits}),
tt AS (SELECT doc_id, SUM(hits) AS th FROM h GROUP BY 1),
p AS (SELECT h.doc_id, h.label, h.cls,
             ROUND((h.hits + 1) * 1.0 / (t.th + 4), 6) AS p
      FROM h JOIN tt t USING (doc_id)),
thr AS (SELECT cls, ROUND(AVG(p), 6) AS t FROM p
        WHERE label = cls GROUP BY 1),
pred AS (SELECT doc_id, label, cls AS pred FROM
         (SELECT p.doc_id, p.label, p.cls, p.p,
                 ROW_NUMBER() OVER (PARTITION BY p.doc_id
                                    ORDER BY p.p DESC, p.cls ASC) AS rn
          FROM p JOIN thr ON p.cls = thr.cls AND p.p >= thr.t)
         WHERE rn = 1),
m AS (SELECT label, pred, CAST(COUNT(*) AS BIGINT) AS n
      FROM pred GROUP BY 1, 2),
lt AS (SELECT label, SUM(n) AS ln FROM m GROUP BY 1)
SELECT m.label, m.pred, m.n, (m.label <> m.pred) AS suspect,
       ROUND(m.n * 1.0 / lt.ln, 6) AS share
FROM m JOIN lt USING (label)
"""


def q_jl_distortion(spark, sf_dir):
    """X233: Johnson-Lindenstrauss distortion audit — md5 ±1 sign
    projections of the 64-d embeddings to k = 8/16/32, pairwise
    squared-distance ratio stats over the vec_id < 40 sample
    (pipeline.similarity.jl_distortion_audit). The dimensionality
    dial below X216's MRL truncation, for vectors with no trained
    prefix order."""
    from credigraph_spark.pipeline.similarity import jl_distortion_audit

    return jl_distortion_audit(_t(spark, sf_dir, "embeddings"),
                               dims=(8, 16, 32))


def _jl_distortion_sql() -> str:
    return """
WITH s AS (SELECT vec_id AS id, embedding AS v FROM embeddings
           WHERE vec_id < 40),
signs AS (SELECT b.b, d.d,
                 CASE WHEN ('0x' || substr(md5('7' || ':' || b.b || ':'
                      || d.d), 1, 8))::BIGINT % 2 = 0
                      THEN 1.0 ELSE -1.0 END AS sgn
          FROM (SELECT unnest(generate_series(0, 31)) AS b) b,
               (SELECT unnest(generate_series(0, 63)) AS d) d),
comp AS (SELECT id, i.i - 1 AS d, v[i.i]::DOUBLE AS x
         FROM s, (SELECT unnest(generate_series(1, 64)) AS i) i),
proj AS (SELECT c.id, sg.b, SUM(c.x * sg.sgn) AS y
         FROM comp c JOIN signs sg ON sg.d = c.d GROUP BY 1, 2),
ks AS (SELECT unnest([8, 16, 32]) AS k),
pd AS (SELECT pa.id AS ia, pb.id AS ib, k.k,
              SUM((pa.y - pb.y) * (pa.y - pb.y)) AS d2k
       FROM proj pa JOIN proj pb ON pa.b = pb.b AND pa.id < pb.id,
            ks k
       WHERE pa.b < k.k GROUP BY 1, 2, 3),
od AS (SELECT a.id AS ia, b.id AS ib,
              list_sum(list_transform(generate_series(1, 64), i ->
                (a.v[i]::DOUBLE - b.v[i]::DOUBLE)
                * (a.v[i]::DOUBLE - b.v[i]::DOUBLE))) AS d2o
       FROM s a JOIN s b ON a.id < b.id),
r AS (SELECT pd.k, ROUND(pd.d2k / pd.k / od.d2o, 6) AS ratio
      FROM pd JOIN od ON pd.ia = od.ia AND pd.ib = od.ib)
SELECT CAST(k AS BIGINT) AS k, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(AVG(ratio), 6) AS mean_ratio,
       MIN(ratio) AS min_ratio, MAX(ratio) AS max_ratio,
       ROUND(SUM(CASE WHEN ratio >= 0.7 AND ratio <= 1.3
                      THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
         AS within_30pct
FROM r GROUP BY 1
"""


def q_gap_compression(spark, sf_dir):
    """X234: WebGraph gap+varint compression audit of the lineitem
    adjacency, bucketed by out-degree bit length
    (store.gap_compression_audit) — first-order Boldi-Vigna: where
    does THIS graph sit between 1 byte/edge and the 8-byte raw id."""
    from credigraph_spark.store import gap_compression_audit

    return gap_compression_audit(_edges(spark, sf_dir))


def _gap_compression_sql() -> str:
    vb = "CASE " + " ".join(
        f"WHEN gap < {128 ** n} THEN {n}" for n in range(1, 9)) \
        + " ELSE 9 END"
    return f"""
WITH e AS ({_E_SQL}),
d AS (SELECT src,
             dst - COALESCE(LAG(dst) OVER (PARTITION BY src
                                           ORDER BY dst), 0) AS gap,
             COUNT(*) OVER (PARTITION BY src) AS deg
      FROM e),
g AS (SELECT CAST(length(bin(deg)) AS BIGINT) AS deg_bits, src,
             CAST({vb} AS BIGINT) AS vbytes
      FROM d)
SELECT deg_bits,
       CAST(COUNT(DISTINCT src) AS BIGINT) AS n_lists,
       CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(SUM(vbytes) AS BIGINT) AS varint_bytes,
       CAST(COUNT(*) * 8 AS BIGINT) AS raw_bytes,
       ROUND(SUM(vbytes) * 1.0 / COUNT(*), 6) AS bytes_per_edge,
       ROUND(SUM(vbytes) * 1.0 / (COUNT(*) * 8), 6) AS ratio
FROM g GROUP BY 1
"""


def q_robust_outliers(spark, sf_dir):
    """X235: median/MAD modified-z outlier screen over events.value
    (analytics.robust_outlier_screen, Iglewicz-Hoaglin 3.5 threshold)
    — the 50%-breakdown-point data-quality gate; median and MAD are
    exact percentile_disc picks, so the flag set is bit-exact."""
    from credigraph_spark.analytics import robust_outlier_screen

    return robust_outlier_screen(_t(spark, sf_dir, "events"),
                                 "event_id", "value")


def _robust_outliers_sql() -> str:
    return """
WITH v AS (SELECT event_id, value AS v FROM events
           WHERE value IS NOT NULL),
m AS (SELECT v AS med FROM
      (SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn,
              COUNT(*) OVER () AS n FROM v)
      WHERE rn = CAST(CEIL(0.5 * n) AS BIGINT)),
d AS (SELECT v.event_id, v.v, m.med, ABS(v.v - m.med) AS ad
      FROM v, m),
mm AS (SELECT ad AS mad FROM
       (SELECT ad, ROW_NUMBER() OVER (ORDER BY ad) AS rn,
               COUNT(*) OVER () AS n FROM d)
       WHERE rn = CAST(CEIL(0.5 * n) AS BIGINT))
SELECT d.event_id, d.v AS value, d.med, mm.mad,
       ROUND(0.6745 * (d.v - d.med) / mm.mad, 6) AS modified_z
FROM d, mm
WHERE mm.mad > 0 AND ABS(0.6745 * (d.v - d.med) / mm.mad) > 3.5
"""


def q_ic_influence(spark, sf_dir):
    """X236: Independent-Cascade influence of the {vid % 100 == 0}
    seed set — 8 deterministic live-edge percolations (md5 coin < 0.3
    keyed by sim), 3-hop reach per sim (graph.spreading.ic_influence);
    the KKT live-edge equivalence makes the Monte-Carlo exactly
    replayable."""
    from credigraph_spark.graph.spreading import ic_influence

    edges = _edges(spark, sf_dir)
    seeds = (edges.select(F.col("src").alias("vid"))
             .unionByName(edges.select(F.col("dst").alias("vid")))
             .distinct().where(F.col("vid") % 100 == 0))
    return ic_influence(edges, seeds, n_sims=8, p=0.3, rounds=3)


def _ic_influence_sql(n_sims: int = 8, p: float = 0.3,
                      rounds: int = 3) -> str:
    coin = ("('0x' || substr(md5('7' || '|' || s.sim || '|' || e.src "
            "|| '|' || e.dst), 1, 15))::BIGINT * 1.0 "
            f"/ {16 ** 15} < {p}")
    parts = [f"""
WITH e AS ({_E_SQL}),
sims AS (SELECT unnest(generate_series(0, {n_sims - 1})) AS sim),
alive AS (SELECT s.sim, e.src, e.dst FROM e, sims s WHERE {coin}),
verts AS (SELECT DISTINCT vid FROM
          (SELECT src AS vid FROM e UNION ALL SELECT dst FROM e)),
r0 AS (SELECT s.sim, v.vid FROM verts v, sims s
       WHERE v.vid % 100 = 0)"""]
    for r in range(1, rounds + 1):
        parts.append(f""",
r{r} AS (SELECT sim, vid FROM r{r - 1} UNION
         SELECT a.sim, a.dst FROM alive a
         JOIN r{r - 1} f ON a.sim = f.sim AND a.src = f.vid)""")
    parts.append(f""",
na AS (SELECT sim, CAST(COUNT(*) AS BIGINT) AS n_alive
       FROM alive GROUP BY 1),
nr AS (SELECT sim, CAST(COUNT(*) AS BIGINT) AS n_reached
       FROM r{rounds} GROUP BY 1)
SELECT s.sim, CAST(COALESCE(na.n_alive, 0) AS BIGINT) AS n_alive,
       CAST(COALESCE(nr.n_reached, 0) AS BIGINT) AS n_reached
FROM sims s LEFT JOIN na USING (sim) LEFT JOIN nr USING (sim)""")
    return "".join(parts)


def q_coverage_select(spark, sf_dir):
    """X237: greedy max-coverage selection of 3 documents by distinct
    3-gram coverage (pipeline.sampling.greedy_coverage_select) — the
    (1-1/e)-greedy submodular data-selection primitive; one anti-join
    + count + top-1 per budget round."""
    from credigraph_spark.pipeline.sampling import greedy_coverage_select

    return greedy_coverage_select(_t(spark, sf_dir, "documents"), k=3)


def _coverage_select_sql(k: int = 3) -> str:
    parts = [f"""
WITH {_SHINGLES_SQL},
x AS (SELECT id, unnest(sh_set) AS sh FROM sets),
g1 AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS gain FROM x GROUP BY 1),
p1 AS (SELECT id, gain FROM g1 ORDER BY gain DESC, id ASC LIMIT 1),
c1 AS (SELECT DISTINCT sh FROM x WHERE id = (SELECT id FROM p1))"""]
    for r in range(2, k + 1):
        not_in = " AND ".join(
            f"id <> (SELECT id FROM p{j})" for j in range(1, r))
        parts.append(f""",
g{r} AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS gain FROM x
         WHERE sh NOT IN (SELECT sh FROM c{r - 1}) AND {not_in}
         GROUP BY 1),
p{r} AS (SELECT id, gain FROM g{r} ORDER BY gain DESC, id ASC LIMIT 1),
c{r} AS (SELECT sh FROM c{r - 1} UNION
         SELECT sh FROM x WHERE id = (SELECT id FROM p{r}))""")
    sels = [
        f"SELECT CAST({r} AS BIGINT) AS round, "
        f"CAST((SELECT id FROM p{r}) AS BIGINT) AS doc_id, "
        f"(SELECT gain FROM p{r}) AS gain, "
        f"CAST((SELECT COUNT(*) FROM c{r}) AS BIGINT) AS covered_total"
        for r in range(1, k + 1)]
    parts.append("\n" + "\nUNION ALL\n".join(sels))
    return "".join(parts)


def q_densest_subgraph(spark, sf_dir):
    """X238: distributed Charikar densest-subgraph peeling (Bahmani et
    al. 2012 form, eps=0.1, 4 rounds) over the lineitem graph
    (graph.kcore.densest_subgraph) — per-round density curve with the
    2(1+eps)-approx best round flagged; exact-integer peel decisions.
    The link-farm detector global thresholds can't be."""
    from credigraph_spark.graph.kcore import densest_subgraph

    return densest_subgraph(_edges(spark, sf_dir), eps_tenths=1,
                            max_rounds=4)


def _densest_subgraph_sql(max_rounds: int = 4,
                          eps_tenths: int = 1) -> str:
    thr = 20 + 2 * eps_tenths
    parts = [f"""
WITH e AS ({_E_SQL}),
u0 AS (SELECT src, dst FROM
       (SELECT src, dst FROM e UNION SELECT dst, src FROM e))"""]
    for r in range(max_rounds + 1):
        parts.append(f""",
d{r} AS (SELECT src AS vid, COUNT(*) AS deg FROM u{r} GROUP BY 1),
s{r} AS (SELECT CAST(COUNT(*) AS BIGINT) AS nv,
                CAST(COALESCE(SUM(deg), 0) // 2 AS BIGINT) AS ne
         FROM d{r})""")
        if r < max_rounds:
            parts.append(f""",
k{r} AS (SELECT vid FROM d{r}, s{r}
         WHERE 10 * deg * nv > {thr} * ne),
u{r + 1} AS (SELECT u.src, u.dst FROM u{r} u
             JOIN k{r} a ON u.src = a.vid
             JOIN k{r} b ON u.dst = b.vid)""")
    allr = " UNION ALL ".join(
        f"SELECT {r} AS round, nv, ne FROM s{r} WHERE nv > 0"
        for r in range(max_rounds + 1))
    parts.append(f""",
allr AS ({allr})
SELECT CAST(round AS BIGINT) AS round, nv AS n_vertices,
       ne AS n_edges, ROUND(ne * 1.0 / nv, 6) AS density,
       (ROW_NUMBER() OVER (ORDER BY ROUND(ne * 1.0 / nv, 6) DESC,
                           round ASC) = 1) AS is_best
FROM allr""")
    return "".join(parts)


def q_token_blocking(spark, sf_dir):
    """X239: token-blocking + purging audit over part names
    (pipeline.linkage.token_blocking_audit, purge_max=50) — aggregate
    vs distinct comparison counts; the ER sizing audit before the
    X189/X225 scoring passes."""
    from credigraph_spark.pipeline.linkage import token_blocking_audit

    return token_blocking_audit(_t(spark, sf_dir, "part"),
                                "p_partkey", "p_name", purge_max=50)


def _token_blocking_sql(purge_max: int = 50) -> str:
    return f"""
WITH pb AS (SELECT DISTINCT p_partkey AS id, tok AS block FROM
            (SELECT p_partkey,
                    unnest(regexp_split_to_array(lower(p_name),
                           '[^a-z0-9'']+')) AS tok FROM part)
            WHERE tok <> ''),
sizes AS (SELECT block, COUNT(*) AS n FROM pb GROUP BY 1
          HAVING COUNT(*) >= 2),
kept AS (SELECT block, n FROM sizes WHERE n <= {purge_max}),
kp AS (SELECT pb.block, pb.id FROM pb
       WHERE pb.block IN (SELECT block FROM kept)),
ndp AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM
        (SELECT DISTINCT a.id AS ia, b.id AS ib
         FROM kp a JOIN kp b ON a.block = b.block AND a.id < b.id))
SELECT 'raw' AS stage,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(COALESCE(SUM(n * (n - 1) // 2), 0) AS BIGINT)
         AS n_comparisons,
       CAST(-1 AS BIGINT) AS distinct_pairs,
       CAST(COALESCE(MAX(n), 0) AS BIGINT) AS max_block
FROM sizes
UNION ALL
SELECT 'purged', CAST(COUNT(*) AS BIGINT),
       CAST(COALESCE(SUM(n * (n - 1) // 2), 0) AS BIGINT),
       (SELECT c FROM ndp),
       CAST(COALESCE(MAX(n), 0) AS BIGINT)
FROM kept
"""


def q_influence_max(spark, sf_dir):
    """X240: greedy influence maximization on live-edge Monte-Carlo
    samples (graph.spreading.greedy_influence_max) — 8 top-out-degree
    candidates, 6 sims (md5 coin < 0.3), 2-hop reach, 3 greedy picks
    by marginal (sim, vertex) coverage; the (1-1/e) seed-picking layer
    over the X236 evaluator."""
    from credigraph_spark.graph.spreading import greedy_influence_max

    return greedy_influence_max(_edges(spark, sf_dir), k=3, n_cands=8,
                                n_sims=6, p=0.3, rounds=2)


def _influence_max_sql(k: int = 3, n_cands: int = 8, n_sims: int = 6,
                       p: float = 0.3, rounds: int = 2) -> str:
    coin = ("('0x' || substr(md5('7' || '|' || s.sim || '|' || e.src "
            "|| '|' || e.dst), 1, 15))::BIGINT * 1.0 "
            f"/ {16 ** 15} < {p}")
    parts = [f"""
WITH e AS ({_E_SQL}),
sims AS (SELECT unnest(generate_series(0, {n_sims - 1})) AS sim),
alive AS (SELECT s.sim, e.src, e.dst FROM e, sims s WHERE {coin}),
cands AS (SELECT src AS cand FROM e GROUP BY src
          ORDER BY COUNT(*) DESC, src ASC LIMIT {n_cands}),
r0 AS (SELECT s.sim, c.cand, c.cand AS vid FROM cands c, sims s)"""]
    for r in range(1, rounds + 1):
        parts.append(f""",
r{r} AS (SELECT sim, cand, vid FROM r{r - 1} UNION
         SELECT a.sim, f.cand, a.dst FROM alive a
         JOIN r{r - 1} f ON a.sim = f.sim AND a.src = f.vid)""")
    rr = f"r{rounds}"
    parts.append(f""",
g1 AS (SELECT cand, CAST(COUNT(*) AS BIGINT) AS marg FROM {rr}
       GROUP BY 1),
p1 AS (SELECT cand, marg FROM g1 ORDER BY marg DESC, cand ASC LIMIT 1),
c1 AS (SELECT DISTINCT sim, vid FROM {rr}
       WHERE cand = (SELECT cand FROM p1))""")
    for r in range(2, k + 1):
        not_in = " AND ".join(
            f"r.cand <> (SELECT cand FROM p{j})" for j in range(1, r))
        parts.append(f""",
g{r} AS (SELECT r.cand, CAST(COUNT(*) AS BIGINT) AS marg FROM {rr} r
         WHERE {not_in} AND NOT EXISTS
               (SELECT 1 FROM c{r - 1} c
                WHERE c.sim = r.sim AND c.vid = r.vid)
         GROUP BY 1),
p{r} AS (SELECT cand, marg FROM g{r}
         ORDER BY marg DESC, cand ASC LIMIT 1),
c{r} AS (SELECT sim, vid FROM c{r - 1} UNION
         SELECT sim, vid FROM {rr}
         WHERE cand = (SELECT cand FROM p{r}))""")
    sels = [
        f"SELECT CAST({r} AS BIGINT) AS round, "
        f"CAST((SELECT cand FROM p{r}) AS BIGINT) AS seed_vid, "
        f"(SELECT marg FROM p{r}) AS marginal, "
        f"CAST((SELECT COUNT(*) FROM c{r}) AS BIGINT) AS covered_total, "
        f"ROUND((SELECT COUNT(*) FROM c{r}) * 1.0 / {n_sims}, 6) "
        f"AS est_spread" for r in range(1, k + 1)]
    parts.append("\n" + "\nUNION ALL\n".join(sels))
    return "".join(parts)


def q_negative_samples(spark, sf_dir):
    """X241: degree-proportional negative sampling (word2vec/GNN
    unigram convention) for the {src % 20 == 0} positives, 2 draws
    each, accidental positives flagged not resampled
    (graph.sampling.negative_samples)."""
    from credigraph_spark.graph.sampling import negative_samples

    return negative_samples(_edges(spark, sf_dir), k=2)


def _negative_samples_sql(k: int = 2) -> str:
    return f"""
WITH e AS ({_E_SQL}),
eidx AS (SELECT ROW_NUMBER() OVER (ORDER BY src, dst) - 1 AS idx,
                dst AS neg_vid FROM e),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM e),
pos AS (SELECT src, dst FROM e WHERE src % 20 = 0),
cand AS (SELECT p.src, p.dst, CAST(j.j AS BIGINT) AS j,
                ('0x' || substr(md5('7' || '|' || p.src || '|' ||
                 p.dst || '|' || j.j), 1, 15))::BIGINT % m.m AS cidx
         FROM pos p, (SELECT unnest(generate_series(1, {k})) AS j) j,
              m),
neg AS (SELECT c.src, c.dst, c.j, ei.neg_vid
        FROM cand c JOIN eidx ei ON ei.idx = c.cidx)
SELECT n.src, n.dst, n.j, n.neg_vid,
       (n.neg_vid <> n.src AND NOT EXISTS
        (SELECT 1 FROM e WHERE e.src = n.src AND e.dst = n.neg_vid))
         AS clean
FROM neg n
"""


def q_sampler_bias(spark, sf_dir):
    """X242: graph-sampler bias audit at q=0.2 — uniform node sample
    vs edge-endpoint sample, mean true degree + degree bias vs
    population (graph.sampling.sampler_bias_audit); edge sampling's
    size-biased mean measured, not assumed."""
    from credigraph_spark.graph.sampling import sampler_bias_audit

    return sampler_bias_audit(_edges(spark, sf_dir), q_tenths=2)


def _sampler_bias_sql(q_tenths: int = 2) -> str:
    q = q_tenths / 10.0
    den = 16 ** 15
    return f"""
WITH u AS ({_UND_SQL}),
deg AS (SELECT src AS vid, CAST(COUNT(*) AS BIGINT) AS deg
        FROM u GROUP BY 1),
canon AS (SELECT src, dst FROM u WHERE src < dst),
ns AS (SELECT vid FROM deg
       WHERE ('0x' || substr(md5('7|n|' || vid), 1, 15))::BIGINT
             * 1.0 / {den} < {q}),
ce AS (SELECT src, dst FROM canon
       WHERE ('0x' || substr(md5('7|e|' || src || '|' || dst), 1,
              15))::BIGINT * 1.0 / {den} < {q}),
es AS (SELECT DISTINCT vid FROM
       (SELECT src AS vid FROM ce UNION ALL SELECT dst FROM ce)),
pop AS (SELECT CAST(COUNT(*) AS BIGINT) AS nv,
               CAST(SUM(deg) AS BIGINT) AS sd,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM canon) AS ne
        FROM deg),
nrow AS (SELECT CAST(COUNT(*) AS BIGINT) AS nv,
                CAST(COALESCE(SUM(deg), 0) AS BIGINT) AS sd,
                (SELECT CAST(COUNT(*) AS BIGINT) FROM canon c
                 WHERE c.src IN (SELECT vid FROM ns)
                   AND c.dst IN (SELECT vid FROM ns)) AS ne
         FROM deg WHERE vid IN (SELECT vid FROM ns)),
erow AS (SELECT CAST(COUNT(*) AS BIGINT) AS nv,
                CAST(COALESCE(SUM(deg), 0) AS BIGINT) AS sd,
                (SELECT CAST(COUNT(*) AS BIGINT) FROM canon c
                 WHERE c.src IN (SELECT vid FROM es)
                   AND c.dst IN (SELECT vid FROM es)) AS ne
         FROM deg WHERE vid IN (SELECT vid FROM es))
SELECT 'population' AS method, p.nv AS n_vertices,
       p.ne AS induced_edges,
       ROUND(p.sd * 1.0 / p.nv, 6) AS mean_degree,
       ROUND((p.sd * 1.0 / p.nv) / (p.sd * 1.0 / p.nv), 6)
         AS degree_bias
FROM pop p
UNION ALL
SELECT 'node', s.nv, s.ne, ROUND(s.sd * 1.0 / s.nv, 6),
       ROUND((s.sd * 1.0 / s.nv) / (p.sd * 1.0 / p.nv), 6)
FROM nrow s, pop p
UNION ALL
SELECT 'edge', s.nv, s.ne, ROUND(s.sd * 1.0 / s.nv, 6),
       ROUND((s.sd * 1.0 / s.nv) / (p.sd * 1.0 / p.nv), 6)
FROM erow s, pop p
"""


def q_rebalance(spark, sf_dir):
    """X243: rendezvous-vs-mod rebalance audit over the distinct
    order custkeys, cluster growing 8 -> 9 slots
    (store.rebalance_audit) — HRW moves ~1/9 of keys, mod-hash ~8/9;
    the resize cost measured, not quoted."""
    from credigraph_spark.store import rebalance_audit

    return rebalance_audit(_t(spark, sf_dir, "orders"), "o_custkey",
                           n_from=8, n_to=9)


def _rebalance_sql(n_from: int = 8, n_to: int = 9) -> str:
    def hrw(n, name):
        return f"""
w{name} AS (SELECT k, s.s AS s, md5('7' || '|' || s.s || '|' || k) AS h
            FROM keys,
            (SELECT unnest(generate_series(0, {n - 1})) AS s) s),
a{name} AS (SELECT k, s AS a FROM
            (SELECT k, s, ROW_NUMBER() OVER
               (PARTITION BY k ORDER BY h DESC, s DESC) AS rn
             FROM w{name}) WHERE rn = 1)"""

    return f"""
WITH keys AS (SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS k
              FROM orders WHERE o_custkey IS NOT NULL),
{hrw(n_from, 'f')[1:]},
{hrw(n_to, 't')[1:]},
hmoves AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(COALESCE(SUM(CASE WHEN af.a <> at.a THEN 1
                                ELSE 0 END), 0) AS BIGINT) AS moved
           FROM af JOIN at USING (k)),
mmoves AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(COALESCE(SUM(CASE WHEN
                        ('0x' || substr(md5(k), 1, 15))::BIGINT
                          % {n_from} <>
                        ('0x' || substr(md5(k), 1, 15))::BIGINT
                          % {n_to} THEN 1 ELSE 0 END), 0) AS BIGINT)
                    AS moved
           FROM keys)
SELECT 'hrw' AS scheme, n AS n_keys, moved,
       ROUND(moved * 1.0 / n, 6) AS moved_frac FROM hmoves
UNION ALL
SELECT 'mod', n, moved, ROUND(moved * 1.0 / n, 6) FROM mmoves
"""


def q_h_index(spark, sf_dir):
    """X244: per-vertex h-index / lobby centrality over the undirected
    lineitem graph (analytics.h_index_centrality) — coreness <= h <=
    degree (Lü et al. 2016); max(min(rank, neighbor_deg)) over each
    neighborhood."""
    from credigraph_spark.analytics import h_index_centrality

    return h_index_centrality(_edges(spark, sf_dir))


def _h_index_sql() -> str:
    return f"""
WITH u AS ({_UND_SQL}),
deg AS (SELECT src AS vid, CAST(COUNT(*) AS BIGINT) AS deg
        FROM u GROUP BY 1),
nbr AS (SELECT u.src AS vid, d.deg AS ndeg
        FROM u JOIN deg d ON u.dst = d.vid),
rk AS (SELECT vid, ndeg,
              ROW_NUMBER() OVER (PARTITION BY vid
                                 ORDER BY ndeg DESC) AS r
       FROM nbr),
h AS (SELECT vid, CAST(MAX(LEAST(r, ndeg)) AS BIGINT) AS h
      FROM rk GROUP BY 1)
SELECT d.vid, d.deg, h.h FROM deg d JOIN h USING (vid)
"""


def q_encoding_health(spark, sf_dir):
    """X245: encoding-health / mojibake screen over documents
    (pipeline.textstats.encoding_health) — U+FFFD / C0-control /
    non-ASCII counts per doc, replacement-or-control flags; the
    decode-sanity gate before any text statistic."""
    from credigraph_spark.pipeline.textstats import encoding_health

    return encoding_health(_t(spark, sf_dir, "documents"))


def _encoding_health_sql() -> str:
    return """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(length(text) - length(regexp_replace(text, '\\x{FFFD}',
            '', 'g')) AS BIGINT) AS n_replacement,
       CAST(length(text) - length(regexp_replace(text,
            '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]', '', 'g')) AS BIGINT)
         AS n_control,
       CAST(length(text) - length(regexp_replace(text,
            '[^\\x00-\\x7F]', '', 'g')) AS BIGINT) AS n_non_ascii,
       (length(text) - length(regexp_replace(text, '\\x{FFFD}', '',
        'g')) > 0 OR
        length(text) - length(regexp_replace(text,
        '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]', '', 'g')) > 0)
         AS flagged
FROM documents
"""


def q_url_spam(spark, sf_dir):
    """X246: host-shape spam/DGA screen (web.url_spam_screen) over a
    deterministic host mix synthesized from documents — digit-heavy /
    hyphen-chain / deep-nesting / disposable-TLD signals scored
    per-row; the pre-fetch frontier gate feeding X213's budget."""
    from credigraph_spark.web import url_spam_screen

    m = F.col("doc_id") % 5
    host = (F.when(m == 0, F.concat(F.lit("www."), F.col("source"),
                                    F.lit(".example.com")))
            .when(m == 1, F.concat(F.lit("x"), F.col("doc_id"),
                                   F.lit("-promo-win-"),
                                   F.col("source"),
                                   F.lit(".example.tk")))
            .when(m == 2, F.concat(F.lit("a.b.c."), F.col("source"),
                                   F.lit(".example.xyz")))
            .when(m == 3, F.concat(F.lit("cdn"),
                                   F.col("doc_id") * 7919,
                                   F.lit("."), F.col("source"),
                                   F.lit(".net")))
            .otherwise(F.concat(F.col("source"), F.lit(".org"))))
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", host.alias("host"))
    return url_spam_screen(docs)


def _url_spam_sql() -> str:
    host = """CASE doc_id % 5
  WHEN 0 THEN 'www.' || source || '.example.com'
  WHEN 1 THEN 'x' || doc_id || '-promo-win-' || source || '.example.tk'
  WHEN 2 THEN 'a.b.c.' || source || '.example.xyz'
  WHEN 3 THEN 'cdn' || doc_id * 7919 || '.' || source || '.net'
  ELSE source || '.org' END"""
    tlds = ", ".join(f"'{t}'" for t in
                     ("tk", "top", "xyz", "zip", "click", "gq", "ml",
                      "cf"))
    return f"""
WITH d AS (SELECT doc_id, lower({host}) AS h FROM documents),
m AS (SELECT doc_id, h AS host,
             CAST(length(h) - length(regexp_replace(h, '[0-9]', '',
                  'g')) AS BIGINT) AS n_digits,
             CAST(length(h) - length(regexp_replace(h, '-', '', 'g'))
                  AS BIGINT) AS n_hyphens,
             CAST(length(h) - length(regexp_replace(h, '\\.', '',
                  'g')) AS BIGINT) AS depth,
             CAST(length(h) AS BIGINT) AS host_len,
             regexp_extract(h, '[^.]*$') IN ({tlds}) AS bad_tld
      FROM d)
SELECT doc_id, host, n_digits, n_hyphens, depth, host_len, bad_tld,
       CAST((CASE WHEN 10 * n_digits > 3 * host_len THEN 1 ELSE 0 END
             + CASE WHEN n_hyphens >= 2 THEN 1 ELSE 0 END
             + CASE WHEN depth >= 4 THEN 1 ELSE 0 END
             + CASE WHEN host_len >= 30 THEN 1 ELSE 0 END
             + CASE WHEN bad_tld THEN 2 ELSE 0 END) AS BIGINT)
         AS spam_score,
       (CASE WHEN 10 * n_digits > 3 * host_len THEN 1 ELSE 0 END
        + CASE WHEN n_hyphens >= 2 THEN 1 ELSE 0 END
        + CASE WHEN depth >= 4 THEN 1 ELSE 0 END
        + CASE WHEN host_len >= 30 THEN 1 ELSE 0 END
        + CASE WHEN bad_tld THEN 2 ELSE 0 END) >= 2 AS flagged
FROM m
"""


def q_source_boilerplate(spark, sf_dir):
    """X247: per-source template/boilerplate profile — share of each
    doc's distinct 3-gram shingles appearing in >= 50% of its own
    source's docs (pipeline.textstats.source_boilerplate); the
    site-template complement of corpus-global line dedup."""
    from credigraph_spark.pipeline.textstats import source_boilerplate

    return source_boilerplate(_t(spark, sf_dir, "documents"))


def _source_boilerplate_sql(t_tenths: int = 5) -> str:
    return f"""
WITH {_SHINGLES_SQL},
src AS (SELECT doc_id AS id, source FROM documents),
x AS (SELECT s.id, c.source, unnest(s.sh_set) AS sh
      FROM sets s JOIN src c ON s.id = c.id),
nd AS (SELECT source, CAST(COUNT(DISTINCT id) AS BIGINT) AS nd
       FROM x GROUP BY 1),
dfq AS (SELECT source, sh, CAST(COUNT(DISTINCT id) AS BIGINT) AS df_
        FROM x GROUP BY 1, 2),
boiler AS (SELECT d.source, d.sh FROM dfq d JOIN nd USING (source)
           WHERE nd.nd >= 2 AND 10 * d.df_ >= {t_tenths} * nd.nd)
SELECT x.id AS doc_id, x.source,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(COALESCE(SUM(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0
            END), 0) AS BIGINT) AS n_boiler,
       ROUND(COALESCE(SUM(CASE WHEN b.sh IS NOT NULL THEN 1 ELSE 0
             END), 0) * 1.0 / COUNT(*), 6) AS boiler_frac
FROM x LEFT JOIN boiler b ON x.source = b.source AND x.sh = b.sh
GROUP BY 1, 2
"""


def q_threshold_sweep(spark, sf_dir):
    """X248: operating-point sweep for the en-stopword-rate weak
    classifier against the upstream lang=='en' label — TP/FP/FN,
    precision/recall/F1 per 1/20 threshold, F1-argmax flagged
    (pipeline.classify.threshold_sweep); the cutoff-picking step
    after X182's calibration audit."""
    from credigraph_spark.pipeline.classify import threshold_sweep
    from credigraph_spark.pipeline.textstats import _STOPWORDS, tokens

    arr = F.array(*[F.lit(wd) for wd in _STOPWORDS["en"]])
    toks = tokens("text")
    score = (F.size(F.filter(toks,
                             lambda x: F.array_contains(arr, x)))
             / F.greatest(F.size(toks), F.lit(1)))
    docs = _t(spark, sf_dir, "documents").select(
        (F.col("lang") == "en").alias("y"), score.alias("s"))
    return threshold_sweep(docs, "y", "s", bins=20)


def _threshold_sweep_sql(bins: int = 20) -> str:
    return f"""
WITH b AS (SELECT doc_id, lang, {_TOKENS_SQL} AS toks FROM documents),
sc AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
              len(list_filter(toks, x -> list_contains({_EN_STOP}, x)))
                * 1.0 / greatest(len(toks), 1) AS s
       FROM b),
pb AS (SELECT LEAST(CAST(FLOOR(s * {bins}) AS BIGINT), {bins - 1})
                AS bn,
              COUNT(*) AS n, SUM(y) AS pos
       FROM sc GROUP BY 1),
cum AS (SELECT bn,
               CAST(SUM(pos) OVER (ORDER BY bn DESC) AS BIGINT) AS tp,
               CAST(SUM(n) OVER (ORDER BY bn DESC)
                    - SUM(pos) OVER (ORDER BY bn DESC) AS BIGINT)
                 AS fp,
               CAST(SUM(pos) OVER () - SUM(pos) OVER (ORDER BY bn
                    DESC) AS BIGINT) AS fn
        FROM pb),
m AS (SELECT ROUND(bn * 1.0 / {bins}, 6) AS thr, tp, fp, fn,
             ROUND(tp * 1.0 / (tp + fp), 6) AS precision,
             ROUND(tp * 1.0 / (tp + fn), 6) AS recall,
             ROUND(2.0 * tp / (2 * tp + fp + fn), 6) AS f1
      FROM cum)
SELECT thr, tp, fp, fn, precision, recall, f1,
       ROW_NUMBER() OVER (ORDER BY f1 DESC, thr ASC) = 1 AS is_best
FROM m
"""


def q_km_churn(spark, sf_dir):
    """X249: Kaplan-Meier churn curve over events — per-user lifetime
    in HOURS (first->last activity), 24-hour end-censoring, survival at
    every churn duration (temporal.km_churn); the estimator that
    doesn't bias lifetimes low by counting the still-alive as
    churned."""
    from credigraph_spark.temporal import km_churn

    return km_churn(_t(spark, sf_dir, "events"), time_unit_s=3600,
                    censor_margin_units=24)


def _km_churn_sql(margin: int = 24, unit: int = 3600) -> str:
    return f"""
WITH days AS (SELECT user_id AS u,
                     CAST(epoch(ts) AS BIGINT) // {unit} AS d
              FROM events
              WHERE user_id IS NOT NULL AND ts IS NOT NULL),
u AS (SELECT u, MIN(d) AS fd, MAX(d) AS ld FROM days GROUP BY 1),
c AS (SELECT MAX(ld) AS cd FROM u),
t AS (SELECT ld - fd AS dur, (ld < cd - {margin}) AS churn FROM u, c),
g AS (SELECT dur, CAST(COUNT(*) AS BIGINT) AS n_total,
             CAST(COALESCE(SUM(CASE WHEN churn THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS n_events
      FROM t GROUP BY 1),
r AS (SELECT g.dur, g.n_events,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM t
              WHERE t.dur >= g.dur) AS n_risk
      FROM g),
k AS (SELECT dur, n_risk, n_events,
             product(1.0 - n_events * 1.0 / n_risk)
               OVER (ORDER BY dur) AS s
      FROM r WHERE n_events > 0)
SELECT CAST(dur AS BIGINT) AS duration, n_risk, n_events,
       ROUND(s, 6) AS survival
FROM k
"""


def q_ring_balance(spark, sf_dir):
    """X250: consistent-hash ring balance at 1 vs 16 vnodes per slot
    over the distinct order custkeys (store.ring_balance_audit) — the
    Dynamo-style placement smoothness dial next to X243's HRW
    movement audit."""
    from credigraph_spark.store import ring_balance_audit

    return ring_balance_audit(_t(spark, sf_dir, "orders"),
                              "o_custkey", n_slots=8, vnodes=(1, 16))


def _ring_balance_sql(n_slots: int = 8,
                      vnodes: tuple[int, ...] = (1, 16)) -> str:
    parts = ["""
WITH keys AS (SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS k
              FROM orders WHERE o_custkey IS NOT NULL),
kp AS (SELECT k, ('0x' || substr(md5(k), 1, 15))::BIGINT AS p
       FROM keys),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM keys)"""]
    sels = []
    for v in vnodes:
        parts.append(f""",
ring{v} AS (SELECT s.s AS slot,
                   ('0x' || substr(md5('7|' || s.s || '|' || i.i),
                    1, 15))::BIGINT AS pos
            FROM (SELECT unnest(generate_series(0, {n_slots - 1}))
                  AS s) s,
                 (SELECT unnest(generate_series(0, {v - 1})) AS i) i),
a{v} AS (SELECT kp.k,
                COALESCE((SELECT r.slot FROM ring{v} r
                          WHERE r.pos >= kp.p
                          ORDER BY r.pos, r.slot LIMIT 1),
                         (SELECT r.slot FROM ring{v} r
                          ORDER BY r.pos, r.slot LIMIT 1)) AS slot
         FROM kp)""")
        sels.append(f"""
SELECT CAST({v} AS BIGINT) AS vnodes, CAST(slot AS BIGINT) AS slot,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       ROUND(COUNT(*) * 1.0 / tot.n, 6) AS share
FROM a{v}, tot GROUP BY 1, 2, tot.n""")
    parts.append("\nUNION ALL\n".join(sels))
    return "".join(parts)


def q_woe_iv(spark, sf_dir):
    """X251: WOE / information-value binning of o_totalprice against
    the o_orderstatus=='F' label (pipeline.classify.woe_iv) — the
    is-this-feature-worth-anything gate; continuous-feature sibling
    of X209's target encoding."""
    from credigraph_spark.pipeline.classify import woe_iv

    o = _t(spark, sf_dir, "orders").select(
        (F.col("o_orderstatus") == "F").alias("y"), "o_totalprice")
    return woe_iv(o, "y", "o_totalprice", bins=10)


def _woe_iv_sql(bins: int = 10) -> str:
    sm = 0.5 * bins
    return f"""
WITH src AS (SELECT o_totalprice AS v,
                    CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END
                      AS y
             FROM orders WHERE o_totalprice IS NOT NULL),
mm AS (SELECT MIN(v) AS mn, MAX(v) AS mx FROM src),
per AS (SELECT LEAST(CAST(FLOOR((v - mn) * {bins}
                     / (mx - mn + 1e-9)) AS BIGINT), {bins - 1})
                 AS bin,
               CAST(SUM(y) AS BIGINT) AS n_pos,
               CAST(COUNT(*) - SUM(y) AS BIGINT) AS n_neg
        FROM src, mm GROUP BY 1),
tot AS (SELECT CAST(SUM(n_pos) AS BIGINT) AS tp,
               CAST(SUM(n_neg) AS BIGINT) AS tn FROM per),
t AS (SELECT bin, n_pos, n_neg,
             (n_pos + 0.5) / (tp + {sm}) AS ps,
             (n_neg + 0.5) / (tn + {sm}) AS ns
      FROM per, tot)
SELECT bin, n_pos, n_neg, ROUND(ln(ps / ns), 6) AS woe,
       ROUND((ps - ns) * ln(ps / ns), 6) AS iv_term,
       (SELECT ROUND(SUM((ps - ns) * ln(ps / ns)), 6) FROM t) AS iv
FROM t
"""


def q_assort_significance(spark, sf_dir):
    """X252: degree-assortativity significance — the observed Pearson
    next to the SAME statistic on the X185 degree-preserving
    configuration-rewired instance (degrees fixed, wiring random, so
    the delta is structure, not the degree sequence); the null-model
    discipline X137 applies to clustering, applied to mixing."""
    from credigraph_spark.analytics import degree_assortativity
    from credigraph_spark.graph.generate import configuration_rewire

    e = _edges(spark, sf_dir)
    obs = degree_assortativity(e).select(
        F.lit("observed").alias("graph"), "n_ends", "assortativity")
    nul = degree_assortativity(configuration_rewire(e)).select(
        F.lit("null").alias("graph"), "n_ends", "assortativity")
    return obs.unionByName(nul)


def _assort_significance_sql() -> str:
    def block(label, und_src):
        return f"""(
WITH und AS ({und_src}),
deg AS (SELECT src AS vid, COUNT(*) AS deg FROM und GROUP BY src),
p AS (SELECT dx.deg AS dx, dy.deg AS dy FROM und
      JOIN deg dx ON und.src = dx.vid
      JOIN deg dy ON und.dst = dy.vid),
m AS (SELECT COUNT(*) AS n, SUM(dx) AS sx, SUM(dy) AS sy,
             SUM(dx*dy) AS sxy, SUM(dx*dx) AS sxx, SUM(dy*dy) AS syy
      FROM p)
SELECT '{label}' AS graph, n AS n_ends,
       ROUND((n*sxy - sx*sy)::DOUBLE /
             (sqrt((n*sxx - sx*sx)::DOUBLE)
              * sqrt((n*syy - sy*sy)::DOUBLE)), 8) AS assortativity
FROM m)"""

    null_und = (f"SELECT src, dst FROM ({_REWIRE_SQL}) "
                f"UNION SELECT dst, src FROM ({_REWIRE_SQL})")
    return (block("observed", _UND_SQL) + "\nUNION ALL\n"
            + block("null", null_und))


def q_language_purity(spark, sf_dir):
    """X253: chunk-level lang-id voting — majority chunk language and
    purity per doc at 20-token windows
    (pipeline.textstats.language_purity); the code-switching screen a
    doc-level lang-id cannot be."""
    from credigraph_spark.pipeline.textstats import language_purity

    return language_purity(_t(spark, sf_dir, "documents"), window=20)


def _language_purity_sql(window: int = 20) -> str:
    stop = {"en": _EN_STOP, "fr": _FR_STOP, "de": _DE_STOP,
            "es": _ES_STOP}
    structs = ", ".join(
        f"{{'h': len(list_filter(tks[c * {window} + 1 : "
        f"c * {window} + {window}], x -> list_contains({arr}, x))), "
        f"'l': '{lang}'}}" for lang, arr in stop.items())
    labels = "', '".join(sorted(list(stop) + ["und"]))
    counts = (f"list_transform(['{labels}'], L -> {{'n': "
              f"len(list_filter(cl, x -> x = L)), 'l': L}})")
    return f"""
WITH b AS (SELECT doc_id, {_TOKENS_SQL} AS tks FROM documents),
c2 AS (SELECT doc_id,
              list_transform(generate_series(0,
                CAST(greatest(ceil(len(tks) / {window}.0), 1) AS INT)
                - 1), c ->
                CASE WHEN list_max([{structs}]).h = 0 THEN 'und'
                     ELSE list_max([{structs}]).l END) AS cl
       FROM b)
SELECT doc_id, CAST(len(cl) AS BIGINT) AS n_chunks,
       list_max({counts}).l AS majority_lang,
       CAST(list_max({counts}).n AS BIGINT) AS majority_chunks,
       ROUND(list_max({counts}).n * 1.0 / len(cl), 6) AS purity
FROM c2
"""


def q_salting(spark, sf_dir):
    """X254: salting effectiveness audit on the genuinely skewed
    events.event_type key (a handful of types x 16 reducers) —
    reducer max/mean loads + straggler ratio for plain vs salted
    placement (store.salting_audit); the measurement behind the
    engine's own hot_threshold salting."""
    from credigraph_spark.store import salting_audit

    return salting_audit(_t(spark, sf_dir, "events"), "event_type",
                         "event_id", n_reducers=16, n_salts=8)


def _salting_sql(n_reducers: int = 16, n_salts: int = 8) -> str:
    h = "('0x' || substr(md5({x}), 1, 15))::BIGINT % {m}"
    salt = h.format(x="'7' || '|' || rid", m=n_salts)
    return f"""
WITH rows_ AS (SELECT CAST(event_type AS VARCHAR) AS k,
                      CAST(event_id AS VARCHAR) AS rid FROM events
               WHERE event_type IS NOT NULL),
pl AS (SELECT {h.format(x='k', m=n_reducers)} AS r FROM rows_),
sl AS (SELECT {h.format(
    x="k || '#' || CAST(" + salt + " AS VARCHAR)",
    m=n_reducers)} AS r FROM rows_),
lp AS (SELECT CAST(SUM(l) AS BIGINT) AS n_rows,
              CAST(MAX(l) AS BIGINT) AS max_load,
              SUM(l) * 1.0 / {n_reducers} AS mean FROM
       (SELECT COUNT(*) AS l FROM pl GROUP BY r)),
ls AS (SELECT CAST(SUM(l) AS BIGINT) AS n_rows,
              CAST(MAX(l) AS BIGINT) AS max_load,
              SUM(l) * 1.0 / {n_reducers} AS mean FROM
       (SELECT COUNT(*) AS l FROM sl GROUP BY r))
SELECT 'plain' AS scheme, CAST({n_reducers} AS BIGINT) AS n_reducers,
       n_rows, max_load, ROUND(mean, 6) AS mean_load,
       ROUND(max_load / mean, 6) AS straggler_ratio FROM lp
UNION ALL
SELECT 'salted', CAST({n_reducers} AS BIGINT), n_rows, max_load,
       ROUND(mean, 6), ROUND(max_load / mean, 6) FROM ls
"""


def q_code_shape(spark, sf_dir):
    """X255: source-file shape metrics over a deterministic code-ish
    rendering of documents (comment header / indented braces / raw by
    doc_id mod 3) — line counts, comment fraction, line lengths,
    indent depth, brace balance (pipeline.textstats.code_shape); the
    structural pre-parser screen for a code corpus."""
    from credigraph_spark.pipeline.textstats import code_shape

    m = F.col("doc_id") % 3
    code = (F.when(m == 0, F.concat(F.lit("# header\n"),
                                    F.regexp_replace("text", " ",
                                                     "\n")))
            .when(m == 1, F.concat(F.lit("    if x {\n"),
                                   F.col("text"), F.lit("\n}")))
            .otherwise(F.col("text")))
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", code.alias("text"))
    return code_shape(docs)


def _code_shape_sql() -> str:
    code = """CASE doc_id % 3
  WHEN 0 THEN '# header' || chr(10)
              || regexp_replace(text, ' ', chr(10), 'g')
  WHEN 1 THEN '    if x {' || chr(10) || text || chr(10) || '}'
  ELSE text END"""
    return f"""
WITH d AS (SELECT doc_id, {code} AS t FROM documents),
m AS (SELECT doc_id, t, string_split(t, chr(10)) AS ls FROM d)
SELECT doc_id,
       CAST(len(ls) AS BIGINT) AS n_lines,
       ROUND(len(list_filter(ls, x -> ltrim(x) LIKE '#%'
             OR ltrim(x) LIKE '//%' OR ltrim(x) LIKE '/*%'
             OR ltrim(x) LIKE '* %')) * 1.0 / len(ls), 6)
         AS comment_frac,
       ROUND(list_sum(list_transform(ls, x -> length(x))) * 1.0
             / len(ls), 6) AS avg_line_len,
       CAST(list_max(list_transform(ls, x -> length(x))) AS BIGINT)
         AS max_line_len,
       CAST(list_max(list_transform(ls, x ->
            length(x) - length(ltrim(x)))) AS BIGINT) AS max_indent,
       CAST((length(t) - length(regexp_replace(t, '\\{{', '', 'g')))
            - (length(t) - length(regexp_replace(t, '\\}}', '', 'g')))
            AS BIGINT) AS brace_balance
FROM m
"""


def q_subsample_ci(spark, sf_dir):
    """X256: deterministic subsampling CI for mean n_chars over
    documents — 32 md5-coin .632 resamples, 2.5/97.5% resample
    quantiles (analytics.subsample_ci); the error bar every corpus
    point-estimate should ship with."""
    from credigraph_spark.analytics import subsample_ci

    return subsample_ci(_t(spark, sf_dir, "documents"), "n_chars",
                        n_resamples=32, key_cols=["doc_id"])


def _subsample_ci_sql(n_b: int = 32, keep: float = 0.632) -> str:
    return f"""
WITH rows_ AS (SELECT doc_id, n_chars FROM documents
               WHERE n_chars IS NOT NULL),
sims AS (SELECT unnest(generate_series(0, {n_b - 1})) AS b),
mm AS (SELECT b, ROUND(AVG(n_chars), 6) AS m
       FROM rows_, sims
       WHERE ('0x' || substr(md5('7' || '|' || b || '|' || doc_id),
              1, 15))::BIGINT * 1.0 / {16 ** 15} < {keep}
       GROUP BY b),
ranked AS (SELECT m, ROW_NUMBER() OVER (ORDER BY m) AS rn,
                  COUNT(*) OVER () AS nb FROM mm),
pt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              ROUND(AVG(n_chars), 6) AS m FROM rows_)
SELECT (SELECT CAST(MAX(nb) AS BIGINT) FROM ranked) AS n_resamples,
       pt.n AS n_rows, pt.m AS point_mean,
       (SELECT m FROM ranked
        WHERE rn = GREATEST(CAST(CEIL(0.025 * nb) AS BIGINT), 1))
         AS lo95,
       (SELECT m FROM ranked
        WHERE rn = LEAST(CAST(CEIL(0.975 * nb) AS BIGINT), nb))
         AS hi95
FROM pt
"""


def q_reclist_quality(spark, sf_dir):
    """X257: recommendation-list quality — catalog coverage / top-10
    concentration / intra-list diversity of the exact top-5 lists for
    the vec_id < 30 queries (pipeline.similarity.reclist_quality);
    the beyond-accuracy health check for any ANN/embedding change."""
    from credigraph_spark.pipeline.similarity import reclist_quality

    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("embedding"))
    return reclist_quality(emb.where(F.col("vec_id") < 30), emb, k=5)


def _reclist_quality_sql(k: int = 5, nq: int = 30) -> str:
    def cos(av, bv):
        dot = (f"list_sum(list_transform(generate_series(1, len({av})),"
               f" i -> {av}[i]::DOUBLE * {bv}[i]::DOUBLE))")
        na = (f"sqrt(list_sum(list_transform(generate_series(1, "
              f"len({av})), i -> {av}[i]::DOUBLE * {av}[i]::DOUBLE)))")
        nb = (f"sqrt(list_sum(list_transform(generate_series(1, "
              f"len({bv})), i -> {bv}[i]::DOUBLE * {bv}[i]::DOUBLE)))")
        return f"{dot} / ({na} * {nb})"

    return f"""
WITH q AS (SELECT vec_id AS query_id, embedding AS qv
           FROM embeddings WHERE vec_id < {nq}),
sc AS (SELECT q.query_id, c.vec_id AS neighbor_id,
              {cos('q.qv', 'c.embedding')} AS cosine
       FROM q, embeddings c WHERE c.vec_id <> q.query_id),
top AS (SELECT query_id, neighbor_id FROM
        (SELECT query_id, neighbor_id,
                ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY ROUND(cosine, 6) DESC, neighbor_id ASC)
                  AS rk
         FROM sc) WHERE rk <= {k}),
nqr AS (SELECT CAST(COUNT(DISTINCT query_id) AS BIGINT) AS nq
        FROM top),
cat AS (SELECT CAST(COUNT(DISTINCT vec_id) AS BIGINT) AS c
        FROM embeddings),
pi AS (SELECT neighbor_id, COUNT(*) AS n FROM top GROUP BY 1),
cov AS (SELECT CAST(COUNT(*) AS BIGINT) AS cv FROM pi),
t10 AS (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS s FROM
        (SELECT n, neighbor_id FROM pi
         ORDER BY n DESC, neighbor_id ASC LIMIT 10)),
pr AS (SELECT {cos('ea.embedding', 'eb.embedding')} AS c
       FROM top a JOIN top b
         ON a.query_id = b.query_id AND a.neighbor_id < b.neighbor_id
       JOIN embeddings ea ON ea.vec_id = a.neighbor_id
       JOIN embeddings eb ON eb.vec_id = b.neighbor_id),
ild AS (SELECT ROUND(1.0 - AVG(c), 6) AS v FROM pr)
SELECT nqr.nq AS n_queries, CAST({k} AS BIGINT) AS k,
       cat.c AS catalog_size,
       ROUND(cov.cv * 1.0 / cat.c, 6) AS coverage,
       ROUND(t10.s * 1.0 / (nqr.nq * {k}), 6) AS top10_share,
       ild.v AS mean_ild
FROM nqr, cat, cov, t10, ild
"""


def q_markov_eval(spark, sf_dir):
    """X258: next-event Markov prediction accuracy — first-order model
    trained on user % 5 != 0, argmax-transition prediction evaluated
    per source type on the held-out users, with the
    majority-next-type baseline (temporal.markov_next_event_eval);
    is the click-path graph predictive or just the marginal mix?"""
    from credigraph_spark.temporal import markov_next_event_eval

    return markov_next_event_eval(_t(spark, sf_dir, "events"))


def _markov_eval_sql() -> str:
    return """
WITH bigr AS (SELECT user_id AS u, event_type AS cur,
                     LEAD(event_type) OVER (PARTITION BY user_id
                       ORDER BY ts, event_id) AS nxt
              FROM events),
b2 AS (SELECT * FROM bigr WHERE nxt IS NOT NULL),
train AS (SELECT * FROM b2 WHERE u % 5 <> 0),
test AS (SELECT * FROM b2 WHERE u % 5 = 0),
cnt AS (SELECT cur, nxt, COUNT(*) AS n FROM train GROUP BY 1, 2),
model AS (SELECT cur, nxt AS pred FROM
          (SELECT cur, nxt, ROW_NUMBER() OVER (PARTITION BY cur
             ORDER BY n DESC, nxt ASC) AS rn FROM cnt)
          WHERE rn = 1),
bl AS (SELECT nxt AS b FROM
       (SELECT nxt, COUNT(*) AS n FROM train GROUP BY 1
        ORDER BY n DESC, nxt ASC LIMIT 1))
SELECT t.cur AS src_type, COALESCE(m.pred, '') AS pred,
       CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(COALESCE(SUM(CASE WHEN t.nxt = m.pred THEN 1 ELSE 0 END),
            0) AS BIGINT) AS n_correct,
       ROUND(COALESCE(SUM(CASE WHEN t.nxt = m.pred THEN 1 ELSE 0
             END), 0) * 1.0 / COUNT(*), 6) AS accuracy,
       (SELECT b FROM bl) AS baseline_pred,
       CAST(SUM(CASE WHEN t.nxt = (SELECT b FROM bl) THEN 1 ELSE 0
            END) AS BIGINT) AS n_baseline_correct,
       ROUND(SUM(CASE WHEN t.nxt = (SELECT b FROM bl) THEN 1 ELSE 0
             END) * 1.0 / COUNT(*), 6) AS baseline_accuracy
FROM test t LEFT JOIN model m ON t.cur = m.cur
GROUP BY 1, 2
"""


def q_hash_collisions(spark, sf_dir):
    """X259: feature-hashing collision sweep over the documents
    unigram+bigram vocabulary at 64/256/1024/4096 buckets
    (pipeline.classify.hash_collision_sweep) — the measured damage of
    the X169 hashing trick; pick k from the curve, not folklore."""
    from credigraph_spark.pipeline.classify import hash_collision_sweep

    return hash_collision_sweep(_t(spark, sf_dir, "documents"))


def _hash_collisions_sql(
        buckets: tuple[int, ...] = (64, 256, 1024, 4096)) -> str:
    sels = []
    for k in buckets:
        sels.append(f"""(
WITH b AS (SELECT {_TOKENS_SQL} AS toks FROM documents),
feats AS (
  SELECT DISTINCT f FROM (
    SELECT unnest(toks) AS f FROM b
    UNION ALL
    SELECT unnest(list_transform(generate_series(1, len(toks) - 1),
           i -> toks[i] || ' ' || toks[i + 1])) AS f FROM b)),
nf AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM feats),
per AS (SELECT ('0x' || substr(md5('7' || '|' || f), 1, 15))::BIGINT
                 % {k} AS bk,
               COUNT(*) AS n
        FROM feats GROUP BY 1)
SELECT CAST({k} AS BIGINT) AS n_buckets, nf.n AS n_features,
       CAST(COUNT(*) AS BIGINT) AS buckets_hit,
       CAST(COALESCE(SUM(CASE WHEN per.n >= 2 THEN per.n ELSE 0 END),
            0) AS BIGINT) AS colliding_features,
       ROUND(COALESCE(SUM(CASE WHEN per.n >= 2 THEN per.n ELSE 0
             END), 0) * 1.0 / nf.n, 6) AS collision_frac
FROM per, nf GROUP BY nf.n)""")
    return "\nUNION ALL\n".join(sels)


def q_join_cardinality(spark, sf_dir):
    """X260: join-cardinality estimation audit on the SKEWED lineitem
    l_partkey self-join — System-R independence vs overlap-aware
    uniform vs the exact Σ cntA·cntB
    (analytics.join_cardinality_audit); puts a number on where
    uniformity underestimates (the AQE-skew-join trigger)."""
    from credigraph_spark.analytics import join_cardinality_audit

    li = _t(spark, sf_dir, "lineitem")
    return join_cardinality_audit(li, "l_partkey", li, "l_partkey")


def _join_cardinality_sql() -> str:
    return """
WITH ca AS (SELECT l_partkey AS k, COUNT(*) AS n FROM lineitem
            WHERE l_partkey IS NOT NULL GROUP BY 1),
sa AS (SELECT CAST(SUM(n) AS BIGINT) AS n,
              CAST(COUNT(*) AS BIGINT) AS d FROM ca),
jx AS (SELECT CAST(COUNT(*) AS BIGINT) AS common,
              CAST(SUM(a.n * b.n) AS BIGINT) AS actual
       FROM ca a JOIN ca b USING (k))
SELECT 'exact' AS method, CAST(actual AS DOUBLE) AS estimate,
       actual, 1.0 AS err_ratio FROM jx
UNION ALL
SELECT 'sysr_independence',
       ROUND(sa.n * sa.n * 1.0 / sa.d, 6), jx.actual,
       ROUND((sa.n * sa.n * 1.0 / sa.d) / jx.actual, 6)
FROM sa, jx
UNION ALL
SELECT 'overlap_uniform',
       ROUND((sa.n * 1.0 / sa.d) * (sa.n * 1.0 / sa.d) * jx.common,
             6),
       jx.actual,
       ROUND((sa.n * 1.0 / sa.d) * (sa.n * 1.0 / sa.d) * jx.common
             / jx.actual, 6)
FROM sa, jx
"""


def q_robust_means(spark, sf_dir):
    """X261: trimmed + winsorized means of events.value at the exact
    p5/p95 percentile_disc cuts (analytics.robust_means) — the
    robust-location companions of X235's MAD screen; the mean-vs-
    trimmed gap IS the outlier-influence diagnostic."""
    from credigraph_spark.analytics import robust_means

    return robust_means(_t(spark, sf_dir, "events"), "value",
                        trim_pct=5)


def _robust_means_sql(trim_pct: int = 5) -> str:
    lo_q, hi_q = trim_pct / 100.0, 1 - trim_pct / 100.0
    return f"""
WITH v AS (SELECT value AS x FROM events WHERE value IS NOT NULL),
r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY x) AS rn,
             COUNT(*) OVER () AS n FROM v),
lo AS (SELECT x AS c FROM r
       WHERE rn = CAST(CEIL({lo_q} * n) AS BIGINT)),
hi AS (SELECT x AS c FROM r
       WHERE rn = CAST(CEIL({hi_q} * n) AS BIGINT))
SELECT CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(x), 6) AS mean,
       ROUND(AVG(CASE WHEN x >= lo.c AND x <= hi.c THEN x END), 6)
         AS trimmed_mean,
       ROUND(AVG(LEAST(GREATEST(x, lo.c), hi.c)), 6)
         AS winsorized_mean,
       CAST(lo.c AS DOUBLE) AS lo_cut, CAST(hi.c AS DOUBLE) AS hi_cut,
       CAST(COALESCE(SUM(CASE WHEN x < lo.c OR x > hi.c THEN 1 END),
            0) AS BIGINT) AS n_trimmed
FROM v, lo, hi GROUP BY lo.c, hi.c
"""


def q_snapshot_similarity(spark, sf_dir):
    """X262: DeltaCon-lite snapshot similarity between the odd-month
    and even-month crawl slices of the lineitem graph — vertex/edge
    Jaccard + degree-distribution total-variation
    (temporal.graph_snapshot_similarity); the one-row 'did the
    webgraph shift?' gate before anything re-trains."""
    from credigraph_spark.temporal import graph_snapshot_similarity

    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    j = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        F.col("l_partkey").alias("src"),
        F.col("l_suppkey").alias("dst"),
        F.month(F.to_date("o_orderdate")).alias("m"))
    return graph_snapshot_similarity(j.where(F.col("m") % 2 == 1),
                                     j.where(F.col("m") % 2 == 0))


def _snapshot_similarity_sql() -> str:
    def slc(name, par):
        return f"""
e{name} AS (SELECT DISTINCT l.l_partkey AS src, l.l_suppkey AS dst
            FROM lineitem l JOIN orders o
              ON l.l_orderkey = o.o_orderkey
            WHERE l.l_partkey <> l.l_suppkey
              AND month(CAST(o.o_orderdate AS DATE)) % 2 = {par}),
v{name} AS (SELECT DISTINCT vid FROM
            (SELECT src AS vid FROM e{name}
             UNION ALL SELECT dst FROM e{name})),
h{name} AS (SELECT d, COUNT(*) AS c FROM
            (SELECT vid, COUNT(*) AS d FROM
             (SELECT src AS vid FROM e{name}
              UNION ALL SELECT dst FROM e{name}) GROUP BY 1)
            GROUP BY 1)"""

    return f"""
WITH {slc('o', 1)[1:]},
{slc('n', 0)[1:]},
sz AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM vo) AS nvo,
              (SELECT CAST(COUNT(*) AS BIGINT) FROM vn) AS nvn,
              (SELECT CAST(COUNT(*) AS BIGINT) FROM eo) AS neo,
              (SELECT CAST(COUNT(*) AS BIGINT) FROM en) AS nen,
              (SELECT CAST(COUNT(*) AS BIGINT) FROM
               (SELECT src, dst FROM eo INTERSECT
                SELECT src, dst FROM en)) AS ec,
              (SELECT CAST(COUNT(*) AS BIGINT) FROM
               (SELECT vid FROM vo INTERSECT
                SELECT vid FROM vn)) AS vc),
tv AS (SELECT SUM(ABS(COALESCE(ho.c, 0) * 1.0 / sz.nvo
                      - COALESCE(hn.c, 0) * 1.0 / sz.nvn)) / 2 AS t
       FROM ho FULL JOIN hn USING (d), sz)
SELECT sz.nvo AS v_old, sz.nvn AS v_new,
       ROUND(sz.vc * 1.0 / (sz.nvo + sz.nvn - sz.vc), 6)
         AS vertex_jaccard,
       sz.neo AS e_old, sz.nen AS e_new,
       ROUND(sz.ec * 1.0 / (sz.neo + sz.nen - sz.ec), 6)
         AS edge_jaccard,
       ROUND(tv.t, 6) AS degree_tv
FROM sz, tv
"""


def q_table_fingerprint(spark, sf_dir):
    """X263: order-invariant table fingerprints (bit_xor of per-row
    md5 int64s) for region / nation / supplier's integer+string
    columns (store.table_fingerprint) — the compare-two-hashes
    integrity primitive for migrations/replicas; float columns
    excluded (string rendering is engine-specific, by design the
    fingerprint only covers render-stable types)."""
    from credigraph_spark.store import table_fingerprint

    r = table_fingerprint(_t(spark, sf_dir, "region")
                          .select("r_regionkey", "r_name"), None,
                          "region")
    n = table_fingerprint(_t(spark, sf_dir, "nation")
                          .select("n_nationkey", "n_name",
                                  "n_regionkey"), None, "nation")
    s = table_fingerprint(_t(spark, sf_dir, "supplier")
                          .select("s_suppkey", "s_name",
                                  "s_nationkey"), None, "supplier")
    return r.unionByName(n).unionByName(s)


def _table_fingerprint_sql() -> str:
    def one(label, table, cols):
        cat = " || '|' || ".join(
            f"COALESCE(CAST({c} AS VARCHAR), '<null>')" for c in cols)
        return (f"SELECT '{label}' AS label, "
                f"CAST(COUNT(*) AS BIGINT) AS n_rows, "
                f"CAST(COALESCE(bit_xor(('0x' || substr(md5({cat}), "
                f"1, 15))::BIGINT), 0) AS BIGINT) AS fingerprint "
                f"FROM {table}")

    return "\nUNION ALL\n".join([
        one("region", "region", ["r_regionkey", "r_name"]),
        one("nation", "nation",
            ["n_nationkey", "n_name", "n_regionkey"]),
        one("supplier", "supplier",
            ["s_suppkey", "s_name", "s_nationkey"]),
    ])


def q_quantile_map(spark, sf_dir):
    """X264: cross-source quantile-mapping normalization of n_chars
    over documents (pipeline.sampling.quantile_map_normalize) — each
    doc's length mapped to the GLOBAL value at its within-source
    quantile; all-integer rank mapping, no interpolation."""
    from credigraph_spark.pipeline.sampling import quantile_map_normalize

    return quantile_map_normalize(_t(spark, sf_dir, "documents"),
                                  "source", "n_chars", "doc_id")


def _quantile_map_sql() -> str:
    return """
WITH rows_ AS (SELECT doc_id AS id, source AS grp, n_chars AS v
               FROM documents WHERE n_chars IS NOT NULL),
nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rows_),
ranked AS (SELECT id, grp, v,
                  ROW_NUMBER() OVER (PARTITION BY grp
                                     ORDER BY v, id) AS r,
                  COUNT(*) OVER (PARTITION BY grp) AS n
           FROM rows_),
target AS (SELECT id, grp, v,
                  CAST(CEIL(ranked.r * nt.n / CAST(ranked.n AS DOUBLE)) AS BIGINT)
                    AS k
           FROM ranked, nt),
cum AS (SELECT v AS norm_value, cnt,
               SUM(cnt) OVER (ORDER BY v) AS cum
        FROM (SELECT v, COUNT(*) AS cnt FROM rows_ GROUP BY 1))
SELECT t.id AS doc_id, t.grp AS source, t.v AS n_chars, c.norm_value
FROM target t JOIN cum c
  ON c.cum - c.cnt < t.k AND t.k <= c.cum
"""


def q_incremental_dedup(spark, sf_dir):
    """X265: incremental crawl-batch dedup screen — NEW docs
    (doc_id % 3 == 0) LSH-screened against the BASE corpus (the
    rest), asymmetric new-x-base band join, q_lsh_pairs' parameters
    (pipeline.dedup.incremental_dedup_screen)."""
    from credigraph_spark.pipeline.dedup import incremental_dedup_screen

    return incremental_dedup_screen(
        _t(spark, sf_dir, "documents"), F.col("doc_id") % 3 != 0,
        num_hashes=4, rows_per_band=2)


def _incremental_dedup_sql() -> str:
    return (f"WITH {_SHINGLES_SQL},\n"
            "x AS (SELECT id, unnest(sh_set) AS sh FROM sets),\n"
            "sigs AS (SELECT id, MIN(md5('salt0:' || sh)) AS mh_0, "
            "MIN(md5('salt1:' || sh)) AS mh_1, "
            "MIN(md5('salt2:' || sh)) AS mh_2, "
            "MIN(md5('salt3:' || sh)) AS mh_3 FROM x GROUP BY id),\n"
            "bands AS (SELECT id, md5(concat_ws('|', '0', mh_0, mh_1))"
            " AS band_val, 0 AS band_idx FROM sigs UNION ALL "
            "SELECT id, md5(concat_ws('|', '1', mh_2, mh_3)), 1 "
            "FROM sigs),\n"
            "bb AS (SELECT id AS base_id, band_idx, band_val "
            "FROM bands WHERE id % 3 <> 0),\n"
            "nb AS (SELECT id, band_idx, band_val FROM bands "
            "WHERE id % 3 = 0),\n"
            "m AS (SELECT nb.id, CAST(COUNT(DISTINCT bb.base_id) AS "
            "BIGINT) AS n FROM nb JOIN bb ON nb.band_idx = bb.band_idx"
            " AND nb.band_val = bb.band_val GROUP BY 1)\n"
            "SELECT d.doc_id, CAST(COALESCE(m.n, 0) AS BIGINT) AS "
            "n_base_matches, COALESCE(m.n, 0) > 0 AS is_dup "
            "FROM (SELECT DISTINCT doc_id FROM documents "
            "WHERE doc_id % 3 = 0) d LEFT JOIN m ON d.doc_id = m.id")


def q_cheirank(spark, sf_dir):
    """X266: CheiRank (Zhirov-Shepelyansky) — PageRank of the REVERSED
    graph, 5 iterations: communicativity (how much a node ORIGINATES)
    next to PageRank's popularity; the (PageRank, CheiRank) plane is
    the standard two-axis webgraph portrait. Pure reuse of the
    audited G1 engine on swapped endpoints."""
    from credigraph_spark.graph import pagerank

    rev = _edges(spark, sf_dir).select(
        F.col("dst").alias("src"), F.col("src").alias("dst"))
    ranks, _ = pagerank(rev, max_iter=5, tol=0.0)
    return ranks.select("vid", F.round("rank", 8).alias("rank"))


def _cheirank_sql() -> str:
    rev = (f"SELECT dst AS src, src AS dst FROM ({_E_SQL})")
    return _pagerank5_sql().replace(
        f"WITH e AS MATERIALIZED ({_E_SQL})",
        f"WITH e AS MATERIALIZED ({rev})", 1)


def q_source_datasheet(spark, sf_dir):
    """X267: per-source corpus datasheet (Gebru et al.) — doc count,
    mean length, en share, near-dup doc fraction, mean boilerplate
    (pipeline.textstats.source_datasheet); a pure composition of five
    audited operators into the data-card rollup."""
    from credigraph_spark.pipeline.textstats import source_datasheet

    return source_datasheet(_t(spark, sf_dir, "documents"))


def _source_datasheet_sql() -> str:
    return f"""
WITH base AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                     ROUND(AVG(length(text)), 6) AS mean_chars
              FROM documents GROUP BY 1),
lng AS (SELECT d.source,
               ROUND(AVG(CASE WHEN p.lang_pred = 'en' THEN 1
                         ELSE 0 END), 6) AS en_share
        FROM ({_langid_sql()}) p
        JOIN documents d USING (doc_id) GROUP BY 1),
dup0 AS (SELECT id_a, id_b FROM ({_lsh_pairs_sql()})),
dupids AS (SELECT DISTINCT id FROM
           (SELECT id_a AS id FROM dup0
            UNION ALL SELECT id_b FROM dup0)),
dup AS (SELECT d.source,
               ROUND(AVG(CASE WHEN d.doc_id IN
                         (SELECT id FROM dupids) THEN 1 ELSE 0 END),
                     6) AS dup_doc_frac
        FROM documents d GROUP BY 1),
boil AS (SELECT source, ROUND(AVG(boiler_frac), 6) AS mean_boiler
         FROM ({_source_boilerplate_sql(5)}) GROUP BY 1)
SELECT base.source, base.n_docs, base.mean_chars, lng.en_share,
       dup.dup_doc_frac, boil.mean_boiler
FROM base JOIN lng USING (source) JOIN dup USING (source)
     JOIN boil USING (source)
"""


def q_ldp_features(spark, sf_dir):
    """X268: Local Degree Profile structural features (Cai-Wang) —
    deg + neighbor-degree min/max/sum/mean per vertex
    (features.ldp_features); the zero-training feature block for the
    X62 assembly."""
    from credigraph_spark.features import ldp_features

    return ldp_features(_edges(spark, sf_dir))


def _ldp_features_sql() -> str:
    return f"""
WITH u AS ({_UND_SQL}),
deg AS (SELECT src AS vid, CAST(COUNT(*) AS BIGINT) AS deg
        FROM u GROUP BY 1),
nbr AS (SELECT u.src AS vid, d.deg AS nd
        FROM u JOIN deg d ON u.dst = d.vid),
prof AS (SELECT vid, CAST(MIN(nd) AS BIGINT) AS nd_min,
                CAST(MAX(nd) AS BIGINT) AS nd_max,
                CAST(SUM(nd) AS BIGINT) AS nd_sum,
                COUNT(*) AS n
         FROM nbr GROUP BY 1)
SELECT d.vid, d.deg, p.nd_min, p.nd_max, p.nd_sum,
       ROUND(p.nd_sum * 1.0 / p.n, 6) AS nd_mean
FROM deg d JOIN prof p USING (vid)
"""


def q_er_edges(spark, sf_dir):
    """X269: deterministic Erdős–Rényi G(n, m) instance — 5000 draws
    over 256 vertices via md5 coins (graph.generate.er_edges); the
    uniform null floor next to X184's R-MAT and X185's rewire."""
    from credigraph_spark.graph.generate import er_edges

    return er_edges(spark, n_vertices=256, n_draws=5000)


def _er_edges_sql(n_vertices: int = 256, n_draws: int = 5000,
                  seed: int = 7) -> str:
    def coin(tag):
        return (f"('0x' || substr(md5('{seed}' || ':' || '{tag}' || "
                f"':' || i.i), 1, 15))::BIGINT % {n_vertices}")

    return f"""
SELECT CAST(i.i AS BIGINT) AS edge_id,
       CAST({coin('s')} AS BIGINT) AS src,
       CAST({coin('d')} AS BIGINT) AS dst
FROM (SELECT unnest(generate_series(0, {n_draws - 1})) AS i) i
"""


def q_ws_edges(spark, sf_dir):
    """X270: Watts-Strogatz small-world instance — 128-vertex ring
    lattice (k/2 = 3) with beta = 0.2 md5 rewiring
    (graph.generate.ws_edges); the clustering-plus-shortcuts null
    completing the ER / R-MAT / rewire generator family."""
    from credigraph_spark.graph.generate import ws_edges

    return ws_edges(spark, n_vertices=128, k_half=3, beta_tenths=2)


def _ws_edges_sql(n: int = 128, k: int = 3, beta: int = 2,
                  seed: int = 7) -> str:
    r = f"('0x' || substr(md5('{seed}' || ':r:' || i.i), 1, 15))::BIGINT % 10 < {beta}"
    d = f"('0x' || substr(md5('{seed}' || ':d:' || i.i), 1, 15))::BIGINT % {n}"
    return f"""
SELECT CAST(i.i // {k} AS BIGINT) AS src,
       CAST(CASE WHEN {r} THEN {d}
                 ELSE (i.i // {k} + i.i % {k} + 1) % {n} END
            AS BIGINT) AS dst,
       {r} AS rewired
FROM (SELECT unnest(generate_series(0, {n * k - 1})) AS i) i
"""


def q_otsu(spark, sf_dir):
    """X271: Otsu adaptive threshold curve over events.value
    (pipeline.classify.otsu_threshold, 32 bins) — the unsupervised
    cutoff picker (max between-class variance) next to X248's
    supervised sweep; a flat curve = the score is not bimodal."""
    from credigraph_spark.pipeline.classify import otsu_threshold

    return otsu_threshold(_t(spark, sf_dir, "events"), "value",
                          bins=32)


def _otsu_sql(bins: int = 32) -> str:
    return f"""
WITH src AS (SELECT CAST(value AS DOUBLE) AS v FROM events
             WHERE value IS NOT NULL),
mm AS (SELECT MIN(v) AS mn, MAX(v) AS mx FROM src),
per AS (SELECT LEAST(CAST(FLOOR((v - mn) * {bins}
                     / (mx - mn + 1e-9)) AS BIGINT), {bins - 1})
                 AS bin,
               COUNT(*) AS n, SUM(v) AS s
        FROM src, mm GROUP BY 1),
cum AS (SELECT bin,
               SUM(n) OVER (ORDER BY bin) AS c_n,
               SUM(s) OVER (ORDER BY bin) AS c_s,
               SUM(n) OVER () AS t_n, SUM(s) OVER () AS t_s
        FROM per),
f AS (SELECT * FROM cum WHERE c_n > 0 AND t_n - c_n > 0),
m AS (SELECT bin, c_n, t_n,
             (c_s / c_n) AS mu0,
             ((t_s - c_s) / (t_n - c_n)) AS mu1,
             (c_n * 1.0 / t_n) AS w0 FROM f),
curve AS (SELECT ROUND(mm.mn + (mm.mx - mm.mn + 1e-9)
                       * (bin + 1) / {bins}, 6) AS thr,
                 CAST(c_n AS BIGINT) AS n_below,
                 CAST(t_n - c_n AS BIGINT) AS n_above,
                 ROUND(w0 * (1.0 - w0) * (mu0 - mu1) * (mu0 - mu1),
                       6) AS between_var
          FROM m, mm)
SELECT thr, n_below, n_above, between_var,
       ROW_NUMBER() OVER (ORDER BY between_var DESC, thr ASC) = 1
         AS is_best
FROM curve
"""


def q_circuit_rank(spark, sf_dir):
    """X272: circuit rank |E|-|V|+C of the undirected lineitem graph
    (analytics.circuit_rank) — independent-cycle count; the
    structural-churn scalar cheaper than any motif census."""
    from credigraph_spark.analytics import circuit_rank

    return circuit_rank(_edges(spark, sf_dir))


def _circuit_rank_sql() -> str:
    return f"""
WITH RECURSIVE u AS (SELECT DISTINCT src, dst FROM
                     (SELECT src, dst FROM ({_E_SQL})
                      UNION ALL
                      SELECT dst AS src, src AS dst
                      FROM ({_E_SQL}))),
canon AS (SELECT src, dst FROM u WHERE src < dst),
verts AS (SELECT DISTINCT src AS vid FROM u),
r(vid, label) AS (
  SELECT vid, vid FROM verts
  UNION
  SELECT u.dst, r.label FROM r JOIN u ON u.src = r.vid
  WHERE r.label < u.dst),
lab AS (SELECT vid, MIN(label) AS component FROM r GROUP BY vid),
s AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM verts) AS nv,
             (SELECT CAST(COUNT(*) AS BIGINT) FROM canon) AS ne,
             (SELECT CAST(COUNT(DISTINCT component) AS BIGINT)
              FROM lab) AS nc)
SELECT nv AS n_vertices, ne AS n_edges, nc AS n_components,
       CAST(ne - nv + nc AS BIGINT) AS circuit_rank,
       (ne - nv + nc) = 0 AS is_forest
FROM s
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Dict ORDER is load-bearing: the driver's CORRECTNESS gate samples the
    # FIRST 50 entries only. Round-5 window = new queries + the two
    # round-4 hash-mismatch fixes + the 20 entries never driver-checked +
    # r1-r3-green entries to fill; the round-4-green block sits at the
    # end (already on the driver record).
    # ROUND 6: rotate the window again — the continuation-wave entries
    # appended at the END of this dict (spread_weighted .. rank_normalize,
    # after the '-- r5 later waves --' marker) have never been
    # driver-sampled; move them (plus anything else missing a driver-green
    # row across CORRECTNESS_r01..r05) into the first 50 slots.
    return {
        # -- new in round 5 --
        "feature_matrix": q_feature_matrix,
        "mis_3round": q_mis_3round,
        "kmeans_assign": q_kmeans_assign,
        "sage_2hop": q_sage_2hop,
        "salsa_3iter": q_salsa_3iter,
        "butterflies": q_butterflies,
        "eff_diameter_hops": q_eff_diameter_hops,
        "exact_quantiles": q_exact_quantiles,
        "sessions_30m": q_sessions_30m,
        "asof_purchase": q_asof_purchase,
        "interval_counts": q_interval_counts,
        "cohort_retention": q_cohort_retention,
        "line_dedup_stats": q_line_dedup_stats,
        "tfidf_top3": q_tfidf_top3,
        "weighted_sample": q_weighted_sample,
        "pmi_pairs": q_pmi_pairs,
        "burst_days": q_burst_days,
        "mst_2round": q_mst_2round,
        "cms_heavy_hitters": q_cms_heavy_hitters,
        "coloring": q_coloring,
        "gopher_quality": q_gopher_quality,
        "c4_line_stats": q_c4_line_stats,
        "dsir_weights": q_dsir_weights,
        "community_conductance": q_community_conductance,
        "quantize_int8": q_quantize_int8,
        "simrank2_topk": q_simrank2_topk,
        "temporal_reach": q_temporal_reach,
        # -- round-4 hash-mismatch fixes (oracle dtype), re-check first --
        "score_2round": q_score_2round,
        "weighted_modularity": q_weighted_modularity,
        # -- never driver-checked before round 5 --
        "louvain_modularity": q_louvain_modularity,
        "linkpred_topk": q_linkpred_topk,
        "louvain_2round": q_louvain_2round,
        "louvain_two_level": q_louvain_two_level,
        "diameter_2approx": q_diameter_2approx,
        "cocitation_topk": q_cocitation_topk,
        "bib_coupling_topk": q_bib_coupling_topk,
        "order_rollup": q_order_rollup,
        "degree_growth": q_degree_growth,
        "snapshot_diff": q_snapshot_diff,
        "event_window_stats": q_event_window_stats,
        "event_transitions": q_event_transitions,
        "dedup_canonical": q_dedup_canonical,
        "repetition_stats": q_repetition_stats,
        "char_entropy": q_char_entropy,
        "contamination": q_contamination,
        "ann_pq_topk": q_ann_pq_topk,
        "ann_ivfpq_topk": q_ann_ivfpq_topk,
        "embedding_norms": q_embedding_norms,
        "neighbor_feature_mean": q_neighbor_feature_mean,
        "spam_mass_3iter": q_spam_mass,
        # -- r1-r3-green, not re-sampled since (fill the 50-slot window) --
        "sample_neighbors": q_sample_neighbors,
        "neighbor_avg_outdeg": q_neighbor_avg_outdeg,
        "suffix_scores": q_suffix_scores,
        "surt_hosts": q_surt_hosts,
        "extract_domains": q_extract_domains,
        "etld1_flip": q_etld1_flip,
        "json_fields": q_json_fields,
        "json_extract": q_json_extract,
        "reverse_normalize": q_reverse_normalize,
        "exact_dedup": q_exact_dedup,
        "minhash_signatures": q_minhash_signatures,
        "lsh_candidate_pairs": q_lsh_pairs,
        "ngram_jaccard_pairs": q_jaccard_pairs,
        "simhash_pairs": q_simhash_pairs,
        "text_quality": q_text_quality,
        "language_id": q_language_id,
        "fingerprints": q_fingerprints,
        "cosine_topk": q_cosine_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "sitemap_links": q_sitemap_links,
        "redirect_edges": q_redirect_edges,
        "embedding_near_dups": q_embedding_near_dups,
        "binary_metadata": q_binary_metadata,
        "frame_sample": q_frame_sample,
        "top2_per_group": q_top2_per_group,
        "topk_customers": q_topk_customers,
        "customers_without_orders": q_customers_without_orders,
        "binarize_users": q_binarize_users,
        "iso_week_counts": q_iso_week_counts,
        "latest_snapshot": q_latest_snapshot,
        # -- round-4 driver-green block (rows+schema+hash in r04 record) --
        "degree_counts": q_degree_counts,
        "in_out_degrees": q_in_out_degrees,
        "density": q_density,
        "degree_filter": q_degree_filter,
        "triangles_per_vertex": q_triangles,
        "clustering_coeff": q_clustering_coeff,
        "weighted_clustering": q_weighted_clustering,
        "reciprocity": q_reciprocity,
        "rich_club": q_rich_club,
        "avg_neighbor_degree": q_avg_neighbor_degree,
        "degree_histogram": q_degree_histogram,
        "assortativity": q_assortativity,
        "hits_3iter": q_hits3,
        "kcore_3round": q_kcore3,
        "coreness": q_coreness,
        "pagerank_5iter": q_pagerank5,
        "pagerank_incremental": q_pagerank_incremental,
        "pagerank_weighted_5iter": q_pagerank_weighted5,
        "pagerank_timedecay": q_pagerank_timedecay,
        "ppr_5iter": q_ppr5,
        "ppr_batch_3iter": q_ppr_batch,
        "ppr_weighted_5iter": q_ppr_weighted5,
        "connected_components": q_connected_components,
        "scc": q_scc,
        "bowtie": q_bowtie,
        "lpa_3iter": q_lpa3,
        "lpa_weighted_3iter": q_lpa_weighted3,
        "nhop2_vertices": q_nhop2,
        "bfs_distances": q_bfs_distances,
        "ktruss_2round": q_ktruss,
        "anf_sketch": q_anf_sketch,
        "betweenness_seeded": q_betweenness,
        "walks_4step": q_walks,
        "node2vec_3step": q_node2vec_walks,
        "harmonic_centrality": q_harmonic_centrality,
        "closeness_centrality": q_closeness_centrality,
        "weighted_sssp": q_weighted_sssp,
        "weighted_harmonic": q_weighted_harmonic,
        "weighted_betweenness": q_weighted_betweenness,
        "weighted_closeness": q_weighted_closeness,
        "eccentricity_seeded": q_eccentricity,
        "katz_3iter": q_katz,
        "stratified_sample": q_stratified_sample,
        "hash_split": q_hash_split,
        "transitivity": q_transitivity,
        "degree_tail_alpha": q_degree_tail_alpha,
        "curated_corpus": q_curated_corpus,
        "lpa_modularity": q_modularity,
        # -- past the 50-entry driver window; r6 reorder picks these up --
        "jaccard_prefix": q_jaccard_prefix,
        "ppr_sweep": q_ppr_sweep,
        "cc_incremental": q_cc_incremental,
        "negative_samples": q_negative_samples,
        "heat_kernel": q_heat_kernel,
        "robustness": q_robustness,
        "funnel_3step": q_funnel_3step,
        "ann_recall": q_ann_recall,
        "kmv_distinct": q_kmv_distinct,
        "rolling_wau": q_rolling_wau,
        "dup_ngrams": q_dup_ngrams,
        "label_spreading": q_label_spreading,
        "triad_census": q_triad_census,
        "dyad_census": q_dyad_census,
        "assoc_rules": q_assoc_rules,
        "pca_top": q_pca_top,
        "remove_top": q_remove_top,
        "burstiness": q_burstiness,
        "eigen_centrality": q_eigen_centrality,
        "rank_gini": q_rank_gini,
        "component_sizes": q_component_sizes,
        "spread_weighted": q_spread_weighted,
        "zipf_fit": q_zipf_fit,
        "heaps_fit": q_heaps_fit,
        "rfm_segments": q_rfm_segments,
        "fiedler": q_fiedler,
        "temporal_triangles": q_temporal_triangles,
        "joint_degree_matrix": q_joint_degree_matrix,
        "eigen_weighted": q_eigen_weighted,
        "minhash_calibration": q_minhash_calibration,
        "clustering_null": q_clustering_null,
        "chi2_terms": q_chi2_terms,
        "split_leakage": q_split_leakage,
        "spectral_sweep": q_spectral_sweep,
        "rbo_pagerank_indeg": q_rbo_pagerank_indeg,
        "readability": q_readability,
        "pref_attachment": q_preferential_attachment,
        "rank_normalize": q_rank_normalize,
        "contract_graph": q_contract_graph,
        "sparsify": q_sparsify,
        "split_drift": q_split_drift,
        "smoothness": q_smoothness,
        "robust_scale": q_robust_scale,
        "source_quality": q_source_quality,
        "ks_split": q_ks_split,
        "weighted_assortativity": q_weighted_assortativity,
        "source_js": q_source_js,
        "rbo_degree_churn": q_rbo_degree_churn,
        "community_summary": q_community_summary,
        "curation_sweep": q_curation_sweep,
        "percolation": q_percolation,
        "dupcluster_sizes": q_dupcluster_sizes,
        "event_stationary": q_event_stationary,
        "disparity_backbone": q_disparity_backbone,
        "vocab_coverage": q_vocab_coverage,
        "kmeans_silhouette": q_kmeans_silhouette,
        "rank_flows": q_rank_flows,
        "hop_histogram": q_hop_histogram,
        "bm25_topk": q_bm25_topk,
        "prefix_jaccard": q_prefix_jaccard,
        "containment_pairs": q_containment_pairs,
        "hamming_prefix": q_hamming_prefix,
        "lm_perplexity": q_lm_perplexity,
        "pii_scrub": q_pii_scrub,
        "blocklist_screen": q_blocklist_screen,        "bigram_perplexity": q_bigram_perplexity,        "clique_percolation": q_clique_percolation,        "bpe_merges": q_bpe_merges,        "bpe_fertility": q_bpe_fertility,        "status_pivot": q_status_pivot,        "matching_3round": q_matching_3round,        "skew_report": q_skew_report,        "naive_bayes": q_naive_bayes,        "logreg_gd": q_logreg_gd,        "embeddedness": q_embeddedness,        "hll_distinct": q_hll_distinct,        "hashed_logreg": q_hashed_logreg,        "dcsbm_loglik": q_dcsbm_loglik,        "tri_incremental": q_tri_incremental,        "mixture_weights": q_mixture_weights,        "egonet_anomaly": q_egonet_anomaly,        "knn_graph": q_knn_graph,        "semdedup": q_semdedup,        "pack_shards": q_pack_shards,        "collective_influence": q_collective_influence,        "winnowing_pairs": q_winnowing_pairs,        "hyperball_harmonic": q_hyperball_harmonic,        "wl_colors": q_wl_colors,        "chain_contract": q_chain_contract,        "calibration_bins": q_calibration_bins,        "rmat_edges": q_rmat_edges,        "truss_decomposition": q_truss_decomposition,        "config_rewire": q_config_rewire,        "ann_multiprobe": q_ann_multiprobe,        "snm_pairs": q_snm_pairs,        "rrf_fusion": q_rrf_fusion,        "lpa_incremental": q_lpa_incremental,        "bloom_prefilter": q_bloom_prefilter,        "zorder_keys": q_zorder_keys,        "filter_ablation": q_filter_ablation,        "triad_classes": q_triad_classes,        "dup_spans": q_dup_spans,        "dag_levels": q_dag_levels,        "closed_walks": q_closed_walks,        "label_assortativity": q_label_assortativity,        "threshold_percolation": q_threshold_percolation,        "k_anonymity": q_k_anonymity,        "leiden_refine": q_leiden_refine,        "scd2_versions": q_scd2_versions,        "touch_attribution": q_touch_attribution,        "leiden_two_level": q_leiden_two_level,        "table_profile": q_table_profile,        "dq_checks": q_dq_checks,        "landmark_distances": q_landmark_distances,        "scc_condensation": q_scc_condensation,        "target_encode": q_target_encode,        "opic_3round": q_opic_3round,        "crawl_budget": q_crawl_budget,        "partition_quality": q_partition_quality,        "cdc_merge": q_cdc_merge,        "mrl_audit": q_mrl_audit,        "padding_waste": q_padding_waste,        "dup_flow_matrix": q_dup_flow_matrix,        "path_trigrams": q_path_trigrams,        "wl_quotient": q_wl_quotient,        "retrieval_eval": q_retrieval_eval,        "ivf_nprobe_sweep": q_ivf_nprobe_sweep,        "psi_drift": q_psi_drift,        "lang_confusion": q_lang_confusion,
        "fs_linkage": q_fs_linkage,
        "ipf_rake": q_ipf_rake,
        "ngram_novelty": q_ngram_novelty,
        "file_skipping": q_file_skipping,
        "crawl_capacity": q_crawl_capacity,
        "hitting_time": q_hitting_time,
        "bloom_skipping": q_bloom_skipping,
        "label_noise": q_label_noise,
        "jl_distortion": q_jl_distortion,
        "gap_compression": q_gap_compression,
        "robust_outliers": q_robust_outliers,
        "ic_influence": q_ic_influence,
        "coverage_select": q_coverage_select,
        "densest_subgraph": q_densest_subgraph,
        "token_blocking": q_token_blocking,
        "influence_max": q_influence_max,
        "negative_samples": q_negative_samples,
        "sampler_bias": q_sampler_bias,
        "rebalance": q_rebalance,
        "h_index": q_h_index,
        "encoding_health": q_encoding_health,
        "url_spam": q_url_spam,
        "source_boilerplate": q_source_boilerplate,
        "threshold_sweep": q_threshold_sweep,
        "km_churn": q_km_churn,
        "ring_balance": q_ring_balance,
        "woe_iv": q_woe_iv,
        "assort_significance": q_assort_significance,
        "language_purity": q_language_purity,
        "salting": q_salting,
        "code_shape": q_code_shape,
        "subsample_ci": q_subsample_ci,
        "reclist_quality": q_reclist_quality,
        "markov_eval": q_markov_eval,
        "hash_collisions": q_hash_collisions,
        "join_cardinality": q_join_cardinality,
        "robust_means": q_robust_means,
        "snapshot_similarity": q_snapshot_similarity,
        "table_fingerprint": q_table_fingerprint,
        "quantile_map": q_quantile_map,
        "incremental_dedup": q_incremental_dedup,
        "cheirank": q_cheirank,
        "source_datasheet": q_source_datasheet,
        "ldp_features": q_ldp_features,
        "er_edges": q_er_edges,
        "ws_edges": q_ws_edges,
        "otsu": q_otsu,
        "circuit_rank": q_circuit_rank,
    }


def oracle_sql() -> dict[str, str]:
    ends = f"SELECT src AS vid FROM ({_E_SQL}) UNION ALL SELECT dst FROM ({_E_SQL})"
    return {
        "degree_counts": f"SELECT vid, COUNT(*) AS deg FROM ({ends}) GROUP BY vid",
        "in_out_degrees": f"""
            WITH e AS ({_E_SQL}),
            o AS (SELECT src AS vid, COUNT(*) AS out_deg FROM e GROUP BY src),
            i AS (SELECT dst AS vid, COUNT(*) AS in_deg FROM e GROUP BY dst)
            SELECT COALESCE(o.vid, i.vid) AS vid,
                   COALESCE(in_deg, 0) AS in_deg, COALESCE(out_deg, 0) AS out_deg
            FROM o FULL OUTER JOIN i ON o.vid = i.vid""",
        "density": f"""
            WITH e AS ({_E_SQL}), verts AS ({_VERTS_SQL})
            SELECT (SELECT COUNT(*) FROM e) AS n_edges,
                   (SELECT COUNT(*) FROM verts) AS n_vertices,
                   (SELECT COUNT(*) FROM e)::DOUBLE /
                   ((SELECT COUNT(*) FROM verts) * ((SELECT COUNT(*) FROM verts) - 1)) AS density""",
        "degree_filter": f"""
            WITH e AS ({_E_SQL}),
            deg AS (SELECT vid, COUNT(*) AS deg FROM ({ends}) GROUP BY vid),
            kept AS (SELECT vid FROM deg WHERE deg > 25)
            SELECT src, dst FROM e WHERE src IN (SELECT vid FROM kept)
                                     AND dst IN (SELECT vid FROM kept)""",
        "triangles_per_vertex": f"""
            WITH cnd AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
                         FROM ({_E_SQL})),
            tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM cnd e1
                    JOIN cnd e2 ON e1.a = e2.a AND e1.b < e2.b
                    JOIN cnd e3 ON e3.a = e1.b AND e3.b = e2.b),
            pv AS (SELECT x AS vid FROM tri UNION ALL SELECT y FROM tri
                   UNION ALL SELECT z FROM tri),
            verts AS (SELECT a AS vid FROM cnd UNION SELECT b FROM cnd)
            SELECT v.vid, COALESCE(c.cnt, 0) AS triangles FROM verts v
            LEFT JOIN (SELECT vid, COUNT(*) AS cnt FROM pv GROUP BY vid) c ON v.vid = c.vid""",
        "weighted_clustering": _weighted_clustering_sql(),
        "clustering_coeff": f"""
            WITH cnd AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
                         FROM ({_E_SQL})),
            tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM cnd e1
                    JOIN cnd e2 ON e1.a = e2.a AND e1.b < e2.b
                    JOIN cnd e3 ON e3.a = e1.b AND e3.b = e2.b),
            pv AS (SELECT x AS vid FROM tri UNION ALL SELECT y FROM tri
                   UNION ALL SELECT z FROM tri),
            deg AS (SELECT vid, COUNT(*) AS deg FROM
                    (SELECT a AS vid FROM cnd UNION ALL SELECT b FROM cnd)
                    GROUP BY vid),
            tc AS (SELECT d.vid, COALESCE(c.cnt, 0) AS triangles, d.deg FROM deg d
                   LEFT JOIN (SELECT vid, COUNT(*) AS cnt FROM pv GROUP BY vid) c
                   ON d.vid = c.vid)
            SELECT vid, deg,
                   CASE WHEN deg >= 2
                        THEN ROUND(2.0 * triangles / (deg * (deg - 1)), 8)
                        ELSE 0.0 END AS lcc
            FROM tc""",
        "avg_neighbor_degree": f"""
            WITH und AS ({_UND_SQL}),
            deg AS (SELECT src AS vid, COUNT(*) AS deg FROM und
                    GROUP BY src),
            nbr AS (SELECT und.src AS vid, SUM(d.deg) AS nsum,
                           COUNT(*) AS ncnt
                    FROM und JOIN deg d ON und.dst = d.vid
                    GROUP BY und.src)
            SELECT deg.vid, deg.deg, nbr.nsum / nbr.ncnt AS avg_nbr_deg
            FROM deg JOIN nbr ON deg.vid = nbr.vid""",
        "degree_histogram": f"""
            WITH und AS ({_UND_SQL}),
            deg AS (SELECT src AS vid, COUNT(*) AS deg FROM und
                    GROUP BY src)
            SELECT CAST(FLOOR(log2(deg)) AS INTEGER) AS bucket,
                   CAST(POWER(2.0, FLOOR(log2(deg))) AS BIGINT) AS lo,
                   COUNT(*) AS n_vertices
            FROM deg GROUP BY 1, 2""",
        "rich_club": f"""
            WITH cnd AS (SELECT DISTINCT LEAST(src, dst) AS a,
                                GREATEST(src, dst) AS b FROM ({_E_SQL})),
            deg AS (SELECT vid, COUNT(*) AS deg FROM
                    (SELECT a AS vid FROM cnd UNION ALL SELECT b FROM cnd)
                    GROUP BY vid),
            rich AS (SELECT vid FROM deg WHERE deg > 40),
            er AS (SELECT COUNT(*) AS e_rich FROM cnd
                   WHERE a IN (SELECT vid FROM rich)
                     AND b IN (SELECT vid FROM rich)),
            nr AS (SELECT COUNT(*) AS n_rich FROM rich)
            SELECT 40 AS k, nr.n_rich, er.e_rich,
                   CASE WHEN nr.n_rich >= 2
                        THEN 2.0 * er.e_rich
                             / (nr.n_rich * (nr.n_rich - 1))
                        ELSE 0.0 END AS phi
            FROM nr, er""",
        "reciprocity": f"""
            WITH e AS ({_E_SQL})
            SELECT (SELECT COUNT(*) FROM e) AS n_edges,
                   (SELECT COUNT(*) FROM e x WHERE EXISTS
                      (SELECT 1 FROM e y WHERE y.src = x.dst AND y.dst = x.src))
                   AS n_reciprocal,
                   (SELECT COUNT(*) FROM e x WHERE EXISTS
                      (SELECT 1 FROM e y WHERE y.src = x.dst AND y.dst = x.src))::DOUBLE
                   / (SELECT COUNT(*) FROM e) AS reciprocity""",
        "assortativity": f"""
            WITH und AS ({_UND_SQL}),
            deg AS (SELECT src AS vid, COUNT(*) AS deg FROM und GROUP BY src),
            p AS (SELECT dx.deg AS dx, dy.deg AS dy FROM und
                  JOIN deg dx ON und.src = dx.vid
                  JOIN deg dy ON und.dst = dy.vid),
            m AS (SELECT COUNT(*) AS n, SUM(dx) AS sx, SUM(dy) AS sy,
                         SUM(dx*dy) AS sxy, SUM(dx*dx) AS sxx, SUM(dy*dy) AS syy
                  FROM p)
            SELECT n AS n_ends,
                   ROUND((n*sxy - sx*sy)::DOUBLE /
                         (sqrt((n*sxx - sx*sx)::DOUBLE) * sqrt((n*syy - sy*sy)::DOUBLE)),
                         8) AS assortativity
            FROM m""",
        "hits_3iter": _hits3_sql(),
        "kcore_3round": _kcore3_sql(),
        "score_2round": _score2_sql(),
        "coreness": _coreness_sql(),
        "pagerank_5iter": _pagerank5_sql(),
        "pagerank_incremental": _pagerank_incremental_sql(),
        "pagerank_weighted_5iter": _pagerank_weighted5_sql(),
        "pagerank_timedecay": _pagerank_weighted5_sql(ew=(
            "SELECT l_partkey AS src, l_suppkey AS dst, "
            "SUM(1.0 / (1.0 + date_diff('day', CAST(o_orderdate AS DATE), "
            "(SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders)))) AS w "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "WHERE l_partkey <> l_suppkey GROUP BY 1, 2")),
        "ppr_5iter": _ppr5_sql(),
        "ppr_batch_3iter": _ppr_batch_sql(iters=3, n_seeds=5),
        "ppr_weighted_5iter": _ppr_weighted5_sql(),
        "connected_components": _cc_sql(),
        "scc": _scc_sql(),
        "bowtie": _bowtie_sql(),
        "lpa_3iter": _lpa3_sql(),
        "lpa_weighted_3iter": _lpa3_weighted_sql(),
        "weighted_modularity": _weighted_modularity_sql(),
        "ktruss_2round": _ktruss_sql(4, 2),
        "anf_sketch": _anf_sql(3, 4, 7),
        "betweenness_seeded": _betweenness_sql(3),
        "walks_4step": _walks_sql(4, 2, 42),
        "node2vec_3step": _node2vec_sql(3, 2, 42),
        "harmonic_centrality": _harmonic_sql(3),
        "closeness_centrality": _closeness_sql(3),
        "weighted_sssp": _weighted_sssp_sql(3),
        "weighted_harmonic": _weighted_harmonic_sql(3),
        "weighted_betweenness": _weighted_betweenness_sql(3),
        "weighted_closeness": _weighted_closeness_sql(3),
        "eccentricity_seeded": _eccentricity_sql(3),
        "katz_3iter": _katz_sql(0.05, 1.0, 3),
        "stratified_sample": _STRATIFIED_SQL,
        "hash_split": _HASH_SPLIT_SQL,
        "transitivity": _TRANSITIVITY_SQL,
        "degree_tail_alpha": _TAIL_ALPHA_SQL,
        "curated_corpus": _curated_corpus_sql(),
        "lpa_modularity": _modularity_sql(),
        "louvain_modularity": _louvain_modularity_sql(rounds=2),
        "nhop2_vertices": _nhop2_sql(),
        "linkpred_topk": _linkpred_sql(),
        "louvain_2round": _louvain_sql(rounds=2),
        "louvain_two_level": _louvain2_sql(rounds=2, coarse_rounds=1),
        "diameter_2approx": _diameter_sql(max_hops=6),
        "cocitation_topk": _cocitation_sql(),
        "bib_coupling_topk": _cocitation_sql(mode="coupling"),
        "bfs_distances": f"""
            WITH RECURSIVE e AS ({_E_SQL}),
            verts AS ({_VERTS_SQL}),
            -- explicit DISTINCT: inside WITH RECURSIVE, DuckDB 1.0 loses
            -- the UNION dedup of the verts CTE when inlining it here
            s0 AS (SELECT DISTINCT vid FROM verts ORDER BY vid LIMIT 3),
            walk(vid, dist) AS (
                SELECT vid, 0 FROM s0
                UNION ALL
                SELECT e.dst, w.dist + 1 FROM walk w
                JOIN e ON e.src = w.vid WHERE w.dist < 3
            )
            SELECT vid, MIN(dist) AS dist FROM walk GROUP BY vid""",
        "sample_neighbors": f"""
            WITH e AS ({_E_SQL}),
            r AS (SELECT src, dst, ROW_NUMBER() OVER (PARTITION BY src
                  ORDER BY md5(src || '|' || dst || '|' || '42')) AS rn FROM e)
            SELECT src, dst FROM r WHERE rn <= 3""",
        "neighbor_avg_outdeg": f"""
            WITH e AS ({_E_SQL}),
            deg AS (SELECT src AS vid, COUNT(*) AS out_deg FROM e GROUP BY src)
            SELECT e.dst AS vid, AVG(d.out_deg) AS nbr_avg_outdeg,
                   COUNT(*) AS n_in
            FROM e JOIN deg d ON d.vid = e.src GROUP BY e.dst""",
        "top2_per_group": """
            WITH d AS (SELECT doc_id, lang, n_chars FROM documents),
            t AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                  ORDER BY n_chars DESC, doc_id ASC) AS rn FROM d),
            b AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                  ORDER BY n_chars ASC, doc_id ASC) AS rn FROM d)
            SELECT DISTINCT doc_id, lang, n_chars FROM
            (SELECT doc_id, lang, n_chars FROM t WHERE rn <= 2
             UNION ALL SELECT doc_id, lang, n_chars FROM b WHERE rn <= 2)""",
        "topk_customers": ("SELECT c_custkey, c_acctbal FROM customer "
                           "ORDER BY c_acctbal DESC, c_custkey ASC LIMIT 20"),
        "order_rollup": (
            "SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders, "
            "ROUND(SUM(o_totalprice), 2) AS total_price FROM orders "
            "GROUP BY ROLLUP (o_orderpriority, o_orderstatus)"),
        "customers_without_orders": ("SELECT c_custkey FROM customer WHERE c_custkey NOT IN "
                                     "(SELECT o_custkey FROM orders)"),
        "binarize_users": ("SELECT user_id, CASE WHEN AVG(value) >= 50 THEN 1 ELSE 0 END "
                           "AS label FROM events GROUP BY user_id"),
        "iso_week_counts": ("SELECT strftime(date_trunc('week', ts), '%Y%m%d') AS week_monday, "
                            "COUNT(*) AS n_events FROM events GROUP BY 1"),
        "degree_growth": """
            WITH c AS (SELECT l_suppkey AS vid,
                              strftime(CAST(o_orderdate AS DATE), '%Y-%m')
                                AS month,
                              COUNT(*) AS n
                       FROM lineitem JOIN orders
                         ON l_orderkey = o_orderkey
                       GROUP BY 1, 2)
            SELECT vid, month, n,
                   n - LAG(n) OVER (PARTITION BY vid ORDER BY month) AS delta
            FROM c""",
        "latest_snapshot": """
            WITH w AS (SELECT user_id AS vid,
                              strftime(date_trunc('week', ts), '%Y%m%d') AS ts,
                              COUNT(*) AS n_events
                       FROM events GROUP BY 1, 2)
            SELECT vid, ts, n_events FROM
            (SELECT *, ROW_NUMBER() OVER (PARTITION BY vid ORDER BY ts DESC) AS rn
             FROM w) WHERE rn = 1""",
        "snapshot_diff": """
            WITH o AS (SELECT DISTINCT l_partkey AS src, l_suppkey AS dst
                       FROM lineitem WHERE l_partkey <> l_suppkey AND l_linenumber <= 4),
            n AS (SELECT DISTINCT l_partkey AS src, l_suppkey AS dst
                  FROM lineitem WHERE l_partkey <> l_suppkey AND l_linenumber >= 2)
            SELECT COALESCE(o.src, n.src) AS src, COALESCE(o.dst, n.dst) AS dst,
                   CASE WHEN o.src IS NULL THEN 'added'
                        WHEN n.src IS NULL THEN 'removed'
                        ELSE 'kept' END AS status
            FROM o FULL OUTER JOIN n ON o.src = n.src AND o.dst = n.dst""",
        "event_transitions": """
            WITH p AS (SELECT event_type AS src_type,
                              LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS dst_type
                       FROM events),
            c AS (SELECT src_type, dst_type, COUNT(*) AS n_transitions
                  FROM p WHERE dst_type IS NOT NULL
                  GROUP BY src_type, dst_type),
            t AS (SELECT src_type, SUM(n_transitions) AS tot FROM c
                  GROUP BY src_type)
            SELECT c.src_type, c.dst_type, c.n_transitions,
                   c.n_transitions / t.tot AS prob
            FROM c JOIN t ON c.src_type = t.src_type""",
        "event_window_stats": """
            SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   event_type, COUNT(*) AS n_events,
                   ROUND(AVG(value), 8) AS mean_value
            FROM events GROUP BY 1, 2""",
        "json_extract": ("SELECT (props->>'k')::BIGINT AS k, COUNT(*) AS n "
                         "FROM events GROUP BY 1"),
        "reverse_normalize": """
            WITH d AS (SELECT doc_id,
              regexp_replace(lower(trim('www.' || source || '.Example.COM')),
                             '^www\\.', '') AS normalized FROM documents)
            SELECT doc_id, normalized,
                   array_to_string(list_reverse(string_split(normalized, '.')), '.') AS reversed
            FROM d""",
        "suffix_scores": """
            SELECT source || '.example.com' AS domain,
                   CASE WHEN source = 'src1' THEN 2.0::DOUBLE ELSE 1.0::DOUBLE END AS pc1
            FROM documents""",
        "surt_hosts": _surt_hosts_sql(),
        "extract_domains": _extract_domains_sql(),
        "etld1_flip": _etld1_flip_sql(),
        "json_fields": _JSON_FIELDS_SQL,
        "exact_dedup": ("SELECT sha256(text) AS content_sha256, MIN(doc_id) AS keep_id, "
                        "COUNT(*) AS dup_count FROM documents GROUP BY 1"),
        "minhash_signatures": _minhash_sql(4),
        "lsh_candidate_pairs": _lsh_pairs_sql(),
        "dedup_canonical": _dedup_canonical_sql(),
        "ngram_jaccard_pairs": _jaccard_sql(0.2),
        "simhash_pairs": _simhash_pairs_sql(12),
        "text_quality": _quality_sql(),
        "language_id": _langid_sql(),
        "repetition_stats": _repetition_sql(),
        "char_entropy": _char_entropy_sql(),
        "contamination": _contamination_sql(),
        "fingerprints": ("SELECT doc_id, md5(trim(regexp_replace(regexp_replace(lower(text), "
                         "'[^a-z0-9\\s]', '', 'g'), '\\s+', ' ', 'g'))) AS fingerprint "
                         "FROM documents"),
        "cosine_topk": _cosine_topk_sql(),
        # ann_lsh_topk is approximate vs brute force (pytest recall@k >= 0.8
        # gate), but the algorithm itself is deterministic: md5-derived ±1
        # hyperplanes make the bucket keys — and therefore the full result —
        # bit-reproducible in DuckDB.
        "ann_lsh_topk": _ann_lsh_sql(bits_per_table=4, n_tables=6, seed=7, k=5),
        "ann_ivf_topk": _ann_ivf_sql(n_lists=8, nprobe=3, seed=7, k=5),
        "ann_pq_topk": _ann_pq_sql(m=8, k=16, k_nn=10, seed=7, train_iters=1),
        "ann_ivfpq_topk": _ann_ivfpq_sql(n_lists=8, nprobe=3, m=8, k=16,
                                         train_iters=1,
                                         k_nn=10, seed=7),
        # ground-truth constructions (the Spark side regex-extracts and
        # url-resolves synthetic robots/header blocks built from the same
        # columns; the oracle states what must come out)
        "sitemap_links": """
            SELECT 'https://' || source || '/robots.txt' AS src,
                   'https://' || source || '/sitemap.xml' AS sitemap
            FROM documents
            UNION ALL
            SELECT 'https://' || source || '/robots.txt' AS src,
                   'https://' || source || '/s' || (doc_id % 10) || '.xml' AS sitemap
            FROM documents""",
        "redirect_edges": """
            SELECT 'https://' || source || '/old/' || doc_id AS src,
                   'https://' || source || '/new/' || doc_id AS dst
            FROM documents WHERE doc_id % 3 = 0""",
        "neighbor_feature_mean": f"""
            WITH e AS ({_E_SQL}),
            f AS (SELECT e.dst AS vid, idx.i - 1 AS dim_idx, m.v[idx.i] AS x
                  FROM e JOIN (SELECT vec_id,
                                      CAST(embedding AS DOUBLE[]) AS v
                               FROM embeddings) m ON e.src = m.vec_id,
                  (SELECT unnest(generate_series(1, 4)) AS i) idx)
            SELECT vid, dim_idx, ROUND(AVG(x), 6) AS nbr_mean
            FROM f GROUP BY vid, dim_idx""",
        "spam_mass_3iter": _spam_mass_sql(),
        "mis_3round": _mis_sql(rounds=3, seed=7),
        "kmeans_assign": _kmeans_sql(k=8, iters=2, seed=7),
        "salsa_3iter": _salsa3_sql(3),
        "butterflies": _BUTTERFLIES_SQL,
        "eff_diameter_hops": _eff_diameter_sql(),
        "exact_quantiles": _EXACT_QUANTILES_SQL,
        "sessions_30m": _SESSIONS_SQL,
        "asof_purchase": _ASOF_SQL,
        "interval_counts": _INTERVAL_COUNTS_SQL,
        "cohort_retention": _COHORT_SQL,
        "line_dedup_stats": _LINE_DEDUP_SQL,
        "tfidf_top3": _TFIDF_SQL,
        "weighted_sample": _WEIGHTED_SAMPLE_SQL,
        "pmi_pairs": _PMI_SQL,
        "burst_days": _BURST_SQL,
        "mst_2round": _mst_sql(),
        "cms_heavy_hitters": _cms_sql(),
        "coloring": _coloring_sql(),
        "gopher_quality": _gopher_sql(),
        "c4_line_stats": _c4_sql(),
        "dsir_weights": _dsir_sql(),
        "community_conductance": _conductance_sql(),
        "quantize_int8": _quantize_sql(),
        "simrank2_topk": _simrank_sql(),
        "temporal_reach": _temporal_reach_sql(rounds=4),
        # sage_2hop: exact quantized-integer mean-of-means; DuckDB d is
        # 1-based (emb[d]) vs posexplode's 0-based, hence d-1
        "sage_2hop": f"""
            WITH e AS ({_E_SQL}),
            f0 AS (
              SELECT v.vec_id AS vid, dd.d, v.emb[dd.d] AS val
              FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb
                    FROM embeddings) v
              CROSS JOIN (SELECT UNNEST(range(1, 5)) AS d) dd),
            f1 AS (
              SELECT e.dst AS vid, f.d,
                     CAST(SUM(CAST(FLOOR(f.val * 1e9) AS BIGINT)) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE) / 1e9 AS val
              FROM e JOIN f0 f ON f.vid = e.src GROUP BY e.dst, f.d),
            f2 AS (
              SELECT e.dst AS vid, f.d,
                     CAST(SUM(CAST(FLOOR(f.val * 1e9) AS BIGINT)) AS DOUBLE)
                       / CAST(COUNT(*) AS DOUBLE) / 1e9 AS val
              FROM e JOIN f1 f ON f.vid = e.src GROUP BY e.dst, f.d)
            SELECT vid, CAST(d - 1 AS INTEGER) AS dim_idx,
                   val AS nbr_mean2 FROM f2
        """,
        # feature_matrix: exact replay of assemble_features — global
        # min-max norm, np.unique-ordered one-hot position, the Knuth-hash
        # RNI tail, the left-fold sum with explicit associativity (0.0
        # one-hot cells are no-ops under IEEE +), decimal-exact y.
        "feature_matrix": """
            WITH stats AS (
              SELECT MIN(c_acctbal) AS mn, MAX(c_acctbal) AS mx FROM customer),
            segs AS (
              SELECT seg, ROW_NUMBER() OVER (ORDER BY seg) AS rk
              FROM (SELECT DISTINCT c_mktsegment AS seg FROM customer
                    WHERE c_mktsegment IS NOT NULL)),
            nseg AS (SELECT COUNT(*) AS n FROM segs),
            lab AS (
              SELECT o_custkey,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                       AS spend,
                     MAX(CAST(strftime(o_orderdate, '%Y%m%d') AS INTEGER))
                       AS ts
              FROM orders GROUP BY o_custkey)
            SELECT c.c_custkey AS vid,
                   COALESCE(l.ts, 0) AS ts,
                   CAST(1 + (SELECT n FROM nseg) + 3 AS INTEGER) AS x_dim,
                   CASE WHEN s.mx = s.mn THEN 0.0
                        ELSE (c.c_acctbal - s.mn) / (s.mx - s.mn) END AS x0,
                   CAST(COALESCE(g.rk, 0) AS BIGINT) AS hot_idx,
                   (((CASE WHEN s.mx = s.mn THEN 0.0
                           ELSE (c.c_acctbal - s.mn) / (s.mx - s.mn) END
                      + CASE WHEN g.rk IS NULL THEN 0.0 ELSE 1.0 END)
                     + (((c.c_custkey * 2654435761 + 3) % 16777216
                         + 16777216) % 16777216) / 16777216.0)
                    + (((c.c_custkey * 2654435761 + 40506) % 16777216
                        + 16777216) % 16777216) / 16777216.0) AS x_sum,
                   COALESCE(l.spend, -1.0) AS y
            FROM customer c
            CROSS JOIN stats s
            LEFT JOIN segs g ON g.seg = c.c_mktsegment
            LEFT JOIN lab l ON l.o_custkey = c.c_custkey
        """,
        "embedding_norms": """
            SELECT vec_id, len(v) AS dim,
                   sqrt(list_reduce(list_transform(v, x -> x * x),
                                    (a, b) -> a + b)) AS l2_norm,
                   list_max(list_transform(v, x -> abs(x))) AS max_abs,
                   len(list_filter(v, x -> x = 0.0)) AS n_zeros
            FROM (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                  FROM embeddings)""",
        "embedding_near_dups": """
WITH e AS (SELECT vec_id, embedding FROM embeddings),
p AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
    list_sum(list_transform(generate_series(1, len(a.embedding)),
      i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)) /
    (sqrt(list_sum(list_transform(generate_series(1, len(a.embedding)),
      i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE))) *
     sqrt(list_sum(list_transform(generate_series(1, len(b.embedding)),
      i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)))) AS cosine
  FROM e a JOIN e b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, ROUND(cosine, 6) AS cosine FROM p WHERE cosine >= 0.4
""",
        "binary_metadata": ("SELECT doc_id, octet_length(encode(text)) AS n_bytes, "
                            "sha256(text) AS sha256 FROM documents"),
        "frame_sample": """
SELECT doc_id AS media_id, i AS frame_idx,
       ROUND(i * (length(text)::DOUBLE) / 4, 6) AS t_offset
FROM documents, range(4) t(i)
""",
        "jaccard_prefix": _jaccard_prefix_sql(threshold=0.7),
        "ppr_sweep": _ppr_sweep_sql(),
        "cc_incremental": _cc_sql(),  # full recompute IS the oracle
        "negative_samples": _negative_samples_sql(),
        "heat_kernel": _heat_kernel_sql(),
        "robustness": _robustness_sql(k=10),
        "funnel_3step": _FUNNEL_SQL,
        "ann_recall": _ann_recall_sql(),
        "kmv_distinct": _kmv_sql(),
        "rolling_wau": _ROLLING_WAU_SQL,
        "dup_ngrams": _dup_ngrams_sql(),
        "label_spreading": _label_spreading_sql(),
        "triad_census": _TRIAD_SQL,
        "dyad_census": _DYAD_SQL,
        "assoc_rules": _ASSOC_SQL,
        "pca_top": _pca_sql(),
        "remove_top": _remove_top_sql(),
        "burstiness": _BURSTINESS_SQL,
        "eigen_centrality": _eigen_sql(),
        "rank_gini": _rank_gini_sql(),
        "component_sizes": _comp_sizes_sql(),
        "spread_weighted": _label_spreading_weighted_sql(),
        "zipf_fit": _zipf_sql(),
        "heaps_fit": _heaps_sql(),
        "rfm_segments": _rfm_sql(),
        "fiedler": _fiedler_sql(),
        "temporal_triangles": _temporal_triangles_sql(),
        "joint_degree_matrix": _JDM_SQL,
        "eigen_weighted": _eigen_weighted_sql(),
        "minhash_calibration": _minhash_calibration_sql(),
        "clustering_null": _CLUSTERING_NULL_SQL,
        "chi2_terms": _chi2_terms_sql(),
        "split_leakage": _split_leakage_sql(),
        "spectral_sweep": _spectral_sweep_sql(),
        "rbo_pagerank_indeg": _rbo_sql(),
        "readability": _READABILITY_SQL,
        "pref_attachment": _PA_SQL,
        "rank_normalize": _RANK_NORM_SQL,
        "contract_graph": _contract_graph_sql(),
        "sparsify": _SPARSIFY_SQL,
        "split_drift": _SPLIT_DRIFT_SQL,
        "smoothness": _smoothness_sql(),
        "robust_scale": _ROBUST_SCALE_SQL,
        "source_quality": _source_quality_sql(),
        "ks_split": _KS_SPLIT_SQL,
        "weighted_assortativity": _W_ASSORT_SQL,
        "source_js": _source_js_sql(),
        "rbo_degree_churn": _rbo_churn_sql(),
        "community_summary": _community_summary_sql(),
        "curation_sweep": _curation_sweep_sql(),
        "percolation": _percolation_sql(),
        "dupcluster_sizes": _dupcluster_sizes_sql(),
        "event_stationary": _event_stationary_sql(),
        "disparity_backbone": _DISPARITY_SQL,
        "vocab_coverage": _VOCAB_COVERAGE_SQL,
        "kmeans_silhouette": _kmeans_silhouette_sql(),
        "rank_flows": _rank_flows_sql(),
        "hop_histogram": _HOP_HISTOGRAM_SQL,
        "bm25_topk": _bm25_sql(_BM25_TERMS),
        "prefix_jaccard": _PREFIX_JACCARD_SQL,
        "containment_pairs": _CONTAINMENT_SQL,
        "hamming_prefix": _HAMMING_PREFIX_SQL,
        "lm_perplexity": _LM_PPL_SQL,
        "pii_scrub": _PII_SQL,
        "blocklist_screen": _BLOCKLIST_SQL,        "bigram_perplexity": _BIGRAM_PPL_SQL,        "clique_percolation": _CPM_SQL,        "bpe_merges": _bpe_sql(3),        "bpe_fertility": _bpe_fertility_sql(3),        "status_pivot": _PIVOT_SQL,        "matching_3round": _matching_sql(3),        "skew_report": _SKEW_SQL,        "naive_bayes": _NB_SQL,        "logreg_gd": _logreg_sql(3, 0.5),        "embeddedness": _EMB_SQL,        "hll_distinct": _hll_sql(6, 7),        "hashed_logreg": _hashed_logreg_sql(64, 2, 0.5),        "dcsbm_loglik": _dcsbm_sql(),        "tri_incremental": _TRI_INC_SQL,        "mixture_weights": _MIX_SQL,        "egonet_anomaly": _EGONET_SQL,        "knn_graph": _knn_graph_sql(4, 6, 7, 5),        "semdedup": _semdedup_sql(8, 2, 7, 0.4),        "pack_shards": _PACK_SQL,        "collective_influence": _CI_SQL,        "winnowing_pairs": _winnow_sql(4, 4, 10, 50),        "hyperball_harmonic": _hyperball_sql(3, 4, 7),        "wl_colors": _wl_sql(3),        "chain_contract": _CHAIN_SQL,        "calibration_bins": _CALIB_SQL,        "rmat_edges": _rmat_sql(8, 5000, 7),        "truss_decomposition": _trussdec_sql(4, 2),        "config_rewire": _REWIRE_SQL,        "ann_multiprobe": _ann_multiprobe_sql(4, 6, 7, 5),        "snm_pairs": _SNM_SQL,        "rrf_fusion": _rrf_sql(_BM25_TERMS),        "lpa_incremental": _lpa_incr_sql(2, 2),        "bloom_prefilter": _BLOOM_SQL,        "zorder_keys": _ZORDER_SQL,        "filter_ablation": _ablation_sql(),        "triad_classes": _TRIAD_CLASSES_SQL,        "dup_spans": _DUP_SPANS_SQL,        "dag_levels": _dag_levels_sql(8),        "closed_walks": _CLOSED_WALKS_SQL,        "label_assortativity": _label_assort_sql(),        "threshold_percolation": _percolation_curve_sql(),        "k_anonymity": _K_ANON_SQL,        "leiden_refine": _leiden_refine_sql(),        "scd2_versions": _SCD2_SQL,        "touch_attribution": _ATTRIB_SQL,        "leiden_two_level": _leiden2_sql(1),        "table_profile": _profile_sql(),        "dq_checks": _DQ_SQL,        "landmark_distances": _landmark_sql(),        "scc_condensation": _scc_condensation_sql(4),        "target_encode": _TARGET_ENC_SQL,        "opic_3round": _opic_sql(3),        "crawl_budget": _CRAWL_BUDGET_SQL,        "partition_quality": _partition_quality_sql(8),        "cdc_merge": _CDC_SQL,        "mrl_audit": _mrl_sql(),        "padding_waste": _padding_waste_sql(8),        "dup_flow_matrix": _dup_flow_sql(),        "path_trigrams": _PATH_TRIGRAMS_SQL,        "wl_quotient": _wl_quotient_sql(3),        "retrieval_eval": _retrieval_eval_sql(),        "ivf_nprobe_sweep": _ivf_sweep_sql(),        "psi_drift": _psi_sql(),        "lang_confusion": _lang_confusion_sql(),
        "fs_linkage": _fs_linkage_sql(),
        "ipf_rake": _ipf_sql(),
        "ngram_novelty": _ngram_novelty_sql(),
        "file_skipping": _file_skipping_sql(),
        "crawl_capacity": _crawl_capacity_sql(),
        "hitting_time": _hitting_time_sql(3),
        "bloom_skipping": _bloom_skipping_sql(),
        "label_noise": _label_noise_sql(),
        "jl_distortion": _jl_distortion_sql(),
        "gap_compression": _gap_compression_sql(),
        "robust_outliers": _robust_outliers_sql(),
        "ic_influence": _ic_influence_sql(),
        "coverage_select": _coverage_select_sql(3),
        "densest_subgraph": _densest_subgraph_sql(4, 1),
        "token_blocking": _token_blocking_sql(50),
        "influence_max": _influence_max_sql(),
        "negative_samples": _negative_samples_sql(2),
        "sampler_bias": _sampler_bias_sql(2),
        "rebalance": _rebalance_sql(8, 9),
        "h_index": _h_index_sql(),
        "encoding_health": _encoding_health_sql(),
        "url_spam": _url_spam_sql(),
        "source_boilerplate": _source_boilerplate_sql(5),
        "threshold_sweep": _threshold_sweep_sql(20),
        "km_churn": _km_churn_sql(24, 3600),
        "ring_balance": _ring_balance_sql(8, (1, 16)),
        "woe_iv": _woe_iv_sql(10),
        "assort_significance": _assort_significance_sql(),
        "language_purity": _language_purity_sql(20),
        "salting": _salting_sql(16, 8),
        "code_shape": _code_shape_sql(),
        "subsample_ci": _subsample_ci_sql(32, 0.632),
        "reclist_quality": _reclist_quality_sql(5, 30),
        "markov_eval": _markov_eval_sql(),
        "hash_collisions": _hash_collisions_sql(),
        "join_cardinality": _join_cardinality_sql(),
        "robust_means": _robust_means_sql(5),
        "snapshot_similarity": _snapshot_similarity_sql(),
        "table_fingerprint": _table_fingerprint_sql(),
        "quantile_map": _quantile_map_sql(),
        "incremental_dedup": _incremental_dedup_sql(),
        "cheirank": _cheirank_sql(),
        "source_datasheet": _source_datasheet_sql(),
        "ldp_features": _ldp_features_sql(),
        "er_edges": _er_edges_sql(),
        "ws_edges": _ws_edges_sql(),
        "otsu": _otsu_sql(32),
        "circuit_rank": _circuit_rank_sql(),
    }
