"""BM25 ranked retrieval over a document corpus.

The curation loop constantly asks "which documents best match this probe
query" (contamination triage, topic mining, eval-set assembly); TF-IDF
(textstats.tfidf_top_terms) gives per-doc keywords, BM25 gives the
corpus-wide ranking for a fixed query. Same tokenizer, same exact-integer
tf/df core, same rounded-score ranking discipline.

Scale shape: one (doc, term) tf aggregation and one term df aggregation
(both partial-aggregatable map-side), the query-term filter applied
BEFORE the df join (so only |q| terms flow into scoring), avgdl as a
1-row broadcast join, a per-doc sum, and a global top-k (TakeOrdered —
no full sort materialization). No UDFs, no windows, no driver loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bm25_topk(df: DataFrame, query_terms: list[str], n_docs: int,
              k: int = 20, k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text",
              round_digits: int = 6) -> DataFrame:
    """Top-k documents by BM25 for ``query_terms``.

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))   (Robertson-Sparck Jones)
    score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))

    tf, df, dl are exact integers; avgdl is the exact mean document
    length. The float score is computed in one fixed operation order and
    ROUNDED before ranking, with a doc-id tiebreak, so a 1-ulp ln()
    difference across engines can never flip the top-k.

    df(t) counts documents containing t in the FULL corpus (computed on
    the term-filtered tf table — identical, since only docs containing t
    contribute rows for t). dl counts ALL tokens of a doc, not just query
    matches. Returns (doc_id, score) — docs with zero query-term matches
    are excluded (their score is 0).
    """
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"))
        .alias("term"),
    ).where(F.col("term") != "")
    dl = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    # exact mean doc length as a 1-row broadcast
    avgdl = dl.agg((F.sum("dl") / F.count("*")).alias("avgdl"))

    q = [t.lower() for t in query_terms]
    tf = (toks.where(F.col("term").isin(q))
          .groupBy("doc_id", "term").agg(F.count("*").alias("tf")))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))

    n = float(n_docs)
    scored = (tf.join(dfreq, "term")
              .join(dl, "doc_id")
              .join(F.broadcast(avgdl))
              .select(
                  "doc_id",
                  (F.log(F.lit(1.0)
                         + (F.lit(n) - F.col("df") + F.lit(0.5))
                         / (F.col("df") + F.lit(0.5)))
                   * (F.col("tf") * F.lit(k1 + 1.0))
                   / (F.col("tf")
                      + F.lit(k1) * (F.lit(1.0 - b)
                                     + F.lit(b) * F.col("dl")
                                     / F.col("avgdl")))).alias("raw")))
    # per-term parts are scaled to 1e-8-granularity INTEGERS before the
    # cross-term sum: float addition is order-dependent and Spark's task
    # scheduling does not fix an order, so a boundary-sitting rounded sum
    # could flip its last digit run-to-run. Integer accumulation is exact
    # and order-free; the final divide+round is then deterministic.
    scored = scored.select(
        "doc_id", F.round(F.col("raw") * 1e8, 0).cast("long").alias("p8"))
    return (scored.groupBy("doc_id")
            .agg(F.round(F.sum("p8") / 1e8, round_digits).alias("score"))
            .orderBy(F.col("score").desc(), F.col("doc_id").asc())
            .limit(k))


def rrf_fuse(rankings: list[DataFrame], rrf_k: int = 60, top: int = 20,
             id_col: str = "doc_id",
             round_digits: int = 6) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) — the
    retrieval-standard way to combine heterogeneous rankings (BM25 +
    dense, multiple probes) without score calibration:

        rrf(d) = Σ_lists 1 / (rrf_k + rank_list(d))

    Documents absent from a list contribute nothing for it. The per-list
    terms are FLOOR(·1e9)-quantized decimal-summed (order-independent
    under any partitioning), the fused score rounded, ties broken on
    doc id — bit-stable across engines.

    Inputs are (doc_id, rank) frames (1-based ranks). Scale shape: one
    union of k-row-per-query lists + one groupBy + ONE
    TakeOrderedAndProject. Returns (doc_id, n_lists, rrf) top rows."""
    u = None
    for r in rankings:
        part = r.select(F.col(id_col).alias("doc_id"),
                        F.col("rank").cast("long").alias("rank"))
        u = part if u is None else u.unionByName(part)
    term = F.lit(1.0) / (F.lit(float(rrf_k)) + F.col("rank"))
    return (u.groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_lists"),
                 F.round(
                     F.sum(F.floor(term * F.lit(1e9))
                           .cast("decimal(38,0)")).cast("double")
                     / F.lit(1e9), round_digits).alias("rrf"))
            .orderBy(F.desc("rrf"), F.asc("doc_id"))
            .limit(top))


def retrieval_eval(df: DataFrame, query_terms: list[str], n_docs: int,
                   k: int = 20, rel_min_tf: int = 3,
                   id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Retrieval-quality evaluation (X221) — hit@k and reciprocal rank
    of the BM25 ranking against a DETERMINISTIC relevance set (docs
    whose term frequency >= ``rel_min_tf``), the FAISS-recall analog
    for the lexical-retrieval family: per single-term query, how many
    relevant docs the top-k surfaces and how early the first one lands
    (mean of ``rr`` across rows = MRR).

    Returns one row per query term: (term, n_relevant, hits_at_k,
    first_rel_rank, rr) with first_rel_rank = 0 / rr = 0.0 when no
    relevant doc reaches the top-k. Integer counts + a 6dp reciprocal
    of an integer rank — exact replay.

    Scale shape: one bm25_topk per term (the proven chain), relevance
    from the same tf table, and the rank window runs on the k-row
    top-k result only — never the corpus.
    """
    from pyspark.sql.window import Window as W

    rows = None
    for t in query_terms:
        top = bm25_topk(df, [t], n_docs, k=k, id_col=id_col,
                        text_col=text_col)
        ranked = top.withColumn(
            "rank", F.row_number().over(
                W.partitionBy(F.lit(0))
                .orderBy(F.desc("score"), F.col("doc_id"))))
        rel = (df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"))
            .alias("term"))
            .where(F.col("term") == t)
            .groupBy("doc_id").agg(F.count("*").alias("tf"))
            .where(F.col("tf") >= rel_min_tf)
            .select("doc_id"))
        n_rel = rel.agg(F.count("*").cast("long").alias("n_relevant"))
        hits = (ranked.join(rel, "doc_id", "left_semi")
                .agg(F.count("*").cast("long").alias("hits_at_k"),
                     F.coalesce(F.min("rank"), F.lit(0)).cast("long")
                     .alias("first_rel_rank")))
        row = (n_rel.crossJoin(hits)
               .select(F.lit(t).alias("term"), "n_relevant", "hits_at_k",
                       "first_rel_rank",
                       F.when(F.col("first_rel_rank") > 0,
                              F.round(F.lit(1.0)
                                      / F.col("first_rel_rank"), 6))
                       .otherwise(F.lit(0.0)).alias("rr")))
        rows = row if rows is None else rows.unionByName(row)
    return rows
