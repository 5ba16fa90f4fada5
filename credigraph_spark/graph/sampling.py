"""Neighbor sampling (SURVEY.md §2.6 O6).

Reference: tgrag/dataset/sampler.py:57-66 — per-seed `ORDER BY RANDOM()
LIMIT k` against SQLite. Spark-first rewrite: one ranked window per source
vertex. The "random" key is a HASH of (src, dst, seed) rather than rand():
deterministic across runs, partitionings and engines — reproducible
sampling is what a training pipeline actually wants, and it makes the
operator oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def sample_neighbors(edges: DataFrame, k: int, seed: int = 42) -> DataFrame:
    """Keep at most k out-neighbors per src, chosen by md5(src|dst|seed)
    order (uniform, deterministic). Returns (src, dst)."""
    key = F.md5(F.concat_ws("|", F.col("src"), F.col("dst"), F.lit(str(seed))))
    w = Window.partitionBy("src").orderBy(key)
    return (
        edges.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("src", "dst")
    )


def sparsify_edges(edges: DataFrame, c: float = 4.0,
                   seed: int = 7, round_digits: int = 9) -> DataFrame:
    """(src, dst, w) — degree-proportional edge sparsification: keep
    edge (u,v) with probability p = min(1, c/sqrt(d_u·d_v)) and weight
    survivors by 1/p, the inverse-probability reweighting that keeps
    cut/volume estimates unbiased (the practical effective-resistance
    surrogate: Spielman-Srivastava sample by resistance, and
    1/sqrt(du·dv) is its standard cheap proxy). Low-degree edges —
    which carry connectivity — always survive (p=1); hub-hub bulk is
    thinned hardest. Run the expensive operator on the sparsified
    weighted graph, not the full one.

    The coin is an md5 fraction of (seed, u, v) — deterministic per
    edge across reruns/retries and bit-identical in any engine with
    md5, so the SAMPLE ITSELF is oracle-checkable (the engine's
    weighted_sample/hash_split discipline). Degrees come from the
    cleaned simple graph; one degree agg + two joins + a per-row
    filter, no shuffle beyond them."""
    from credigraph_spark.graph.adjacency import clean_edges

    e = clean_edges(edges)
    deg = (e.select(F.explode(F.array("src", "dst")).alias("vid"))
           .groupBy("vid").agg(F.count("*").alias("d")))
    frac = (F.conv(F.substring(
        F.md5(F.concat_ws("|", F.lit(str(seed)),
                          F.col("src").cast("string"),
                          F.col("dst").cast("string"))),
        1, 15), 16, 10).cast("double") / F.lit(float(16 ** 15)))
    p = F.least(F.lit(1.0),
                F.lit(float(c)) / F.sqrt(F.col("du").cast("double")
                                         * F.col("dv")))
    return (e.join(deg.select(F.col("vid").alias("src"),
                              F.col("d").alias("du")), "src")
            .join(deg.select(F.col("vid").alias("dst"),
                             F.col("d").alias("dv")), "dst")
            .where(frac < p)
            .select("src", "dst",
                    F.round(F.lit(1.0) / p, round_digits).alias("w")))


def disparity_backbone(edges: DataFrame, weight_col: str = "w",
                       alpha: float = 0.05,
                       round_digits: int = 9) -> DataFrame:
    """(src, dst, w, alpha_min) — the Serrano-Boguñá multiscale
    backbone: keep an undirected weighted edge when EITHER endpoint
    finds it statistically significant against the uniform-split null,
    alpha_uv = (1 − w/s_u)^(k_u − 1) < alpha (k=1 endpoints are their
    edge's whole strength — conventionally kept). Unlike a global
    weight threshold, this preserves the multiscale structure: a weak
    edge at a weak vertex survives if it dominates ITS neighborhood.
    The principled backbone next to the degree-proportional sparsifier
    (that one is unbiased sampling; this one is significance testing).

    Per vertex one strength/degree agg; per edge two closed-form
    p-values; alpha_min (the better of the two endpoint p-values,
    rounded) is emitted so callers can re-threshold without rerunning."""
    ew = (edges.select("src", "dst",
                       F.col(weight_col).cast("double").alias("w"))
          .where(F.col("src").isNotNull() & F.col("dst").isNotNull()
                 & (F.col("src") != F.col("dst")))
          .select(F.least("src", "dst").alias("a"),
                  F.greatest("src", "dst").alias("b"), "w")
          .groupBy("a", "b").agg(F.sum("w").alias("w")))
    sd = (ew.select(F.col("a").alias("vid"), "w")
          .unionByName(ew.select(F.col("b").alias("vid"), "w"))
          .groupBy("vid").agg(F.sum("w").alias("s"),
                              F.count("*").alias("k")))

    def pval(s, k):
        return F.when(k > 1,
                      F.pow(F.lit(1.0) - F.col("w") / s,
                            k - F.lit(1.0))).otherwise(F.lit(0.0))

    j = (ew.join(sd.select(F.col("vid").alias("a"), F.col("s").alias("sa"),
                           F.col("k").cast("double").alias("ka")), "a")
         .join(sd.select(F.col("vid").alias("b"), F.col("s").alias("sb"),
                         F.col("k").cast("double").alias("kb")), "b"))
    amin = F.least(pval(F.col("sa"), F.col("ka")),
                   pval(F.col("sb"), F.col("kb")))
    return (j.where(amin < F.lit(float(alpha)))
            .select(F.col("a").alias("src"), F.col("b").alias("dst"), "w",
                    F.round(amin, round_digits).alias("alpha_min")))


def negative_samples(edges: DataFrame, k: int = 2, pos_pred=None,
                     seed: int = 7, num_ranges: int = 32) -> DataFrame:
    """Degree-proportional negative sampling for link-prediction
    training (X241; the word2vec/GNN unigram convention): for each
    positive edge, draw ``k`` negatives by indexing a deterministic
    md5 value into the DENSE (src, dst)-sorted edge list and taking
    that edge's destination — sampling destinations proportional to
    their in-degree, which matches the positive-class destination
    distribution (uniform-over-vertices negatives are trivially
    separable by popularity alone; degree-matched ones are the ones a
    ranking model actually has to work for). Accidental positives and
    self-pairs are FLAGGED, not silently resampled, so the draw
    replays bit-exactly and the training loader decides the policy
    (drop / keep as soft negatives).

    Returns (src, dst, j, neg_vid, clean) — one row per positive per
    draw j; ``clean`` = neg is neither the source itself nor an
    actual out-neighbor of src.

    Scale shape: the dense edge index is the O3 range-partition rank
    construction (extraction.py discipline — no single-partition
    window); the draw is one broadcast-offset join + one equi-join on
    the index; the clean flag is one left join back to the edge set
    on (src, neg_vid). No rejection loops, no RNG state.
    """
    from credigraph_spark.graph.adjacency import clean_edges

    e = clean_edges(edges)
    if pos_pred is None:
        pos_pred = F.col("src") % 20 == 0
    parts = (e.repartitionByRange(num_ranges, "src", "dst")
             .withColumn("_pid", F.spark_partition_id()))
    local = parts.withColumn(
        "_rank", F.row_number().over(
            Window.partitionBy("_pid").orderBy("src", "dst")))
    counts = local.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    w = (Window.partitionBy(F.lit(0)).orderBy("_pid")
         .rowsBetween(Window.unboundedPreceding, -1))
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(w), F.lit(0)))
    eidx = (local.join(F.broadcast(offsets.select("_pid", "_off")),
                       "_pid")
            .select((F.col("_off") + F.col("_rank") - 1).cast("long")
                    .alias("_idx"), F.col("dst").alias("neg_vid")))
    m = e.count()
    pos = e.where(pos_pred)
    draws = pos.select(
        "src", "dst",
        F.explode(F.expr(
            f"sequence(1, {k})")).alias("j"))
    cand = draws.withColumn(
        "_idx",
        F.pmod(F.conv(F.substring(
            F.md5(F.concat_ws("|", F.lit(str(seed)), F.col("src"),
                              F.col("dst"), F.col("j"))),
            1, 15), 16, 10).cast("long"), F.lit(int(m))))
    neg = cand.join(eidx, "_idx").select("src", "dst",
                                         F.col("j").cast("long")
                                         .alias("j"), "neg_vid")
    is_edge = (e.select("src", F.col("dst").alias("neg_vid"))
               .withColumn("_e", F.lit(1)).distinct())
    return (neg.join(is_edge, ["src", "neg_vid"], "left")
            .select("src", "dst", "j", "neg_vid",
                    ((F.col("neg_vid") != F.col("src"))
                     & F.col("_e").isNull()).alias("clean")))


def sampler_bias_audit(edges: DataFrame, q_tenths: int = 2,
                       seed: int = 7,
                       round_digits: int = 6) -> DataFrame:
    """Graph-sampler bias audit (X242; the Leskovec-Faloutsos
    'sampling from large graphs' caveat measured on the actual graph):
    compare a uniform NODE sample against an EDGE-endpoint sample at
    the same rate q — edge sampling observes vertices
    degree-proportionally, so its sample's mean true degree
    concentrates near the size-biased mean E[d²]/E[d] instead of the
    population mean E[d]; any estimate built on such a sample inherits
    that inflation. Both coins are deterministic md5 fractions, so
    the sample — and therefore the audit — replays bit-exactly.

    Returns three rows: (method, n_vertices, induced_edges,
    mean_degree, degree_bias) for population / node / edge —
    mean_degree = mean TRUE (undirected simple) degree of the
    sampled vertices, degree_bias = ratio to the population mean.

    Scale shape: one degree aggregation; each sample is a pure
    per-row coin; induced-edge counts are two semi-joins; every
    rollup is a scalar aggregate. Integer sums to rounded divisions.
    """
    from credigraph_spark.graph.adjacency import undirected_simple

    q = q_tenths / 10.0
    und = undirected_simple(edges).persist()
    deg = und.groupBy(F.col("src").alias("vid")).agg(
        F.count("*").cast("long").alias("deg"))

    def frac(tag, *cols):
        return (F.conv(F.substring(
            F.md5(F.concat_ws("|", F.lit(str(seed)), F.lit(tag),
                              *[F.col(c).cast("string") for c in cols])),
            1, 15), 16, 10).cast("double") / F.lit(float(16 ** 15)))

    node_s = deg.where(frac("n", "vid") < q).select("vid")
    edge_s = (und.where((F.col("src") < F.col("dst"))
                        & (frac("e", "src", "dst") < q))
              .select(F.explode(F.array("src", "dst")).alias("vid"))
              .distinct())

    def _row(method, sample):
        if sample is None:
            sub = deg
            ind = und.where(F.col("src") < F.col("dst"))
        else:
            sub = deg.join(sample, "vid", "left_semi")
            ind = (und.where(F.col("src") < F.col("dst"))
                   .join(sample.withColumnRenamed("vid", "src"),
                         "src", "left_semi")
                   .join(sample.withColumnRenamed("vid", "dst"),
                         "dst", "left_semi"))
        st = sub.agg(F.count("*").alias("nv"),
                     F.sum("deg").alias("sd")).collect()[0]
        ne = ind.count()
        nv, sd = int(st["nv"] or 0), int(st["sd"] or 0)
        mean = sd / nv if nv else 0.0
        return method, nv, ne, mean

    pop = _row("population", None)
    rows_raw = [pop, _row("node", node_s), _row("edge", edge_s)]
    und.unpersist()
    pop_mean = pop[3]
    rows = [(m, nv, ne, round(mean, round_digits),
             round(mean / pop_mean, round_digits) if pop_mean else 0.0)
            for (m, nv, ne, mean) in rows_raw]
    return edges.sparkSession.createDataFrame(
        rows, "method STRING, n_vertices LONG, induced_edges LONG, "
              "mean_degree DOUBLE, degree_bias DOUBLE")
