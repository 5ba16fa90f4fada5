"""Capture .explain("formatted") for the bench queries touched in the
round-6 optimization pass, against an arbitrary repo checkout.

Usage:
    REPO=/tmp/r6start  python scripts_local/r06_plans.py out_suffix [names...]
    REPO=/root/repo    python scripts_local/r06_plans.py after [names...]

Writes /root/repo/plans/r06/<query>_<suffix>.txt. Uses sf0.01 so plan
capture is fast; plan SHAPE (Exchange count, join strategy, eval nodes)
is scale-independent. Queries that end in a driver-side loop are
captured as the plan of their RESULT DataFrame (what the loop's output
looks like) — per-superstep plans are noted inline where relevant.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

REPO = os.environ.get("REPO", "/root/repo")
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from credigraph_spark.session import get_spark  # noqa: E402

OUT = "/root/repo/plans/r06"
SF = os.environ.get("PLAN_SF", "/root/testdata/sf0.01")


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def main():
    suffix = sys.argv[1]
    only = set(sys.argv[2:]) or None
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("r06-plans", master="local[8]", shuffle_partitions=8)

    from credigraph_spark.graph.adjacency import clean_edges

    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    edges = clean_edges(
        lineitem.select(F.col("l_partkey").alias("src"),
                        F.col("l_suppkey").alias("dst"))).persist()
    edges.count()
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))

    builders = {}

    def reg(name, fn):
        builders[name] = fn

    # --- iterative graph operators: capture the result-frame plan ---
    from credigraph_spark.graph import (
        connected_components, hits, label_propagation, pagerank,
    )
    reg("pagerank_converge",
        lambda: pagerank(edges, tol=1e-6, max_iter=3, salt_buckets=32,
                         mode="auto")[0])
    reg("cc_converge", lambda: connected_components(edges)[0])
    reg("lpa_5iter", lambda: label_propagation(edges, max_iter=5)[0])
    reg("hits_3iter", lambda: hits(edges, max_iter=3))

    from credigraph_spark.graph import katz_centrality, weighted_sssp
    reg("katz_5iter", lambda: katz_centrality(edges, alpha=0.05,
                                              max_iter=5)[0])
    wedges = edges.select(
        "src", "dst",
        (F.pmod(F.xxhash64("src", "dst"), F.lit(9)) + 1)
        .cast("double").alias("w"))
    sseeds = (edges.select(F.col("src").alias("vid")).distinct()
              .orderBy("vid").limit(10))
    reg("sssp_8round", lambda: weighted_sssp(wedges, sseeds, max_rounds=3))

    from credigraph_spark.graph import strongly_connected_components
    reg("scc_converge", lambda: strongly_connected_components(edges)[0])

    from credigraph_spark.graph.salsa import salsa
    reg("salsa_3iter", lambda: salsa(edges, max_iter=3))

    from credigraph_spark.graph import louvain_local_move
    from credigraph_spark.graph.louvain import leiden_two_level
    reg("louvain_2round", lambda: louvain_local_move(edges, rounds=2))
    reg("leiden_two_level",
        lambda: leiden_two_level(edges, rounds=1, coarse_rounds=1))

    from credigraph_spark.graph.wl import wl_refinement
    reg("wl_colors", lambda: wl_refinement(edges, rounds=2))

    from credigraph_spark.graph.matching import greedy_matching
    reg("matching_5round", lambda: greedy_matching(edges, rounds=2))

    from credigraph_spark.graph.triangles import (clique_percolation_k3,
                                                  incremental_triangles)
    cnd = (edges.select(F.least("src", "dst").alias("a"),
                        F.greatest("src", "dst").alias("b")).distinct())
    kept = cnd.where(F.substring(F.md5(F.concat_ws(
        ":", F.col("a").cast("string"), F.col("b").cast("string"))),
        1, 1) <= "2")
    reg("cpm_sampled", lambda: clique_percolation_k3(
        kept.select(F.col("a").alias("src"), F.col("b").alias("dst"))))

    base = lineitem.where("l_linenumber > 1").select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst"))
    delta = lineitem.where("l_linenumber = 1").select(
        F.col("l_partkey").alias("src"), F.col("l_suppkey").alias("dst"))
    reg("tri_incremental", lambda: incremental_triangles(base, delta))

    from credigraph_spark.graph import fiedler_vector, label_spreading
    lseeds = (edges.select(F.col("src").alias("vid")).distinct()
              .orderBy("vid").limit(100)
              .select("vid", (F.col("vid") % 2).cast("double").alias("y")))
    reg("label_spreading_3", lambda: label_spreading(edges, lseeds,
                                                     max_iter=2))
    reg("fiedler_3", lambda: fiedler_vector(edges, max_iter=2))

    from credigraph_spark.graph.kcore import densest_subgraph
    reg("densest_peel", lambda: densest_subgraph(edges, max_rounds=2))

    from credigraph_spark.graph.simrank import simrank2_topk
    reg("simrank2", lambda: simrank2_topk(edges, k=20))

    from credigraph_spark.graph.anf import anf_sketch, hyperball_harmonic
    reg("anf_3hop", lambda: anf_sketch(edges, max_hops=2,
                                       num_registers=8)[0])
    reg("hyperball_harmonic", lambda: hyperball_harmonic(
        edges, max_hops=2, num_registers=4))

    from credigraph_spark.graph.spreading import ic_influence
    iseeds = (edges.select(F.col("src").alias("vid"))
              .unionByName(edges.select(F.col("dst").alias("vid")))
              .distinct().where(F.col("vid") % 100 == 0))
    reg("ic_influence", lambda: ic_influence(edges, iseeds, n_sims=4,
                                             p=0.3, rounds=2))

    # --- pipeline operators ---
    from credigraph_spark.pipeline import lsh_candidate_pairs
    reg("minhash_lsh_dedup", lambda: lsh_candidate_pairs(
        docs, num_hashes=8, rows_per_band=2))

    from credigraph_spark.pipeline.similarity import semdedup
    reg("semdedup", lambda: semdedup(emb, k=8, iters=2, threshold=0.4))

    from credigraph_spark.pipeline.textstats import dup_ngram_profile
    reg("dup_ngrams", lambda: dup_ngram_profile(docs, shingle_n=5))

    from credigraph_spark.analytics import dcsbm_loglik
    labels3 = label_propagation(edges, max_iter=3)[0]
    reg("dcsbm_loglik", lambda: dcsbm_loglik(edges, labels3))

    from credigraph_spark.pipeline import pq_adc_topk
    reg("ann_pq_trained", lambda: pq_adc_topk(
        emb.where(F.col("vec_id") < 20), emb, k_nn=10, train_iters=1))

    from credigraph_spark.extraction import build_graph
    from credigraph_spark import corpus
    import tempfile
    cp = tempfile.mkdtemp(prefix="r06plans_") + "/repos"
    corpus.repos_df(spark, seed=42, n_repos=500,
                    files_per_repo=3, partitions=8).write.parquet(cp)
    repos = spark.read.parquet(cp)
    reg("extract_graph", lambda: build_graph(repos, num_ranges=8)[1])

    for name, fn in builders.items():
        if only and name not in only:
            continue
        try:
            df = fn()
            with open(f"{OUT}/{name}_{suffix}.txt", "w") as fh:
                fh.write(plan_of(df))
            print("ok", name)
        except Exception as exc:  # noqa: BLE001
            print("FAIL", name, repr(exc)[:200])
    extra(spark, only, suffix)
    spark.stop()



# --- intermediate-stage captures (the checkpointed final frames above
# collapse to LogicalRDD scans; these show the claimed expression/plan
# changes where they live) ---

def extra(spark, only, suffix):
    import tempfile
    from credigraph_spark.pipeline.dedup import minhash_signatures
    from credigraph_spark.pipeline.similarity import (
        cosine_topk_bruteforce, embedding_near_dup_pairs)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    builders = {
        "minhash_signatures": lambda: minhash_signatures(docs, num_hashes=8),
        "cosine_pairs": lambda: cosine_topk_bruteforce(
            emb.where(F.col("vec_id") < 20), emb, k=10),
        "near_dup_pairs": lambda: embedding_near_dup_pairs(
            emb, threshold=0.8, method="lsh"),
    }
    for name, fn in builders.items():
        if only and name not in only:
            continue
        try:
            with open(f"{OUT}/{name}_{suffix}.txt", "w") as fh:
                fh.write(plan_of(fn()))
            print("ok", name)
        except Exception as exc:  # noqa: BLE001
            print("FAIL", name, repr(exc)[:200])

if __name__ == "__main__":
    main()
