"""Probabilistic record linkage: Fellegi–Sunter match weights (X225).

The classic probabilistic record-linkage model (Fellegi & Sunter 1969):
candidate pairs from blocking, a per-field agreement pattern, and a
log-likelihood match weight

    W(a, b) = sum_f  log2(m_f / u_f)             if field f agrees
              sum_f  log2((1-m_f) / (1-u_f))     otherwise

where m_f = P(agree | match) and u_f = P(agree | non-match).  Pairs above
a threshold are links, below a second threshold non-links, between them
clerical review — here we emit the top-k weights with their agreement
patterns, which is the ranked clerical-review queue.

This is the scoring layer the reference's SNM blocking
(sorted-neighborhood dedup, pipeline/dedup.py) feeds in a real entity-
resolution pipeline; the reference repo itself resolves hosts by exact
eTLD+1 match only (tgrag/utils/target_generation.py), so the FS model is
the principled generalization.

Scale shape: ONE self-join on the blocking key (each block is small by
construction — the blocking key's job), per-pair arithmetic is pure
column expressions, and the top-k is a TakeOrderedAndProject, never a
global sort materialization.  The log-weights are injected as Python
float literals so Spark and any SQL oracle sum the exact same doubles.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from credigraph_spark.pipeline.textstats import tokens


def fs_weights(m: float, u: float) -> tuple[float, float]:
    """(agreement, disagreement) log2 weights for one field."""
    return (math.log2(m / u), math.log2((1.0 - m) / (1.0 - u)))


def fs_match_weights(
    df: DataFrame,
    id_col: str,
    block_cols: list[str],
    fields: list[tuple[str, Column, float, float]],
    top_k: int = 200,
) -> DataFrame:
    """Fellegi–Sunter match weights over blocked candidate pairs.

    ``fields`` is a list of (name, column expression, m, u); agreement is
    null-safe equality of the expression between the two pair members.
    Returns the ``top_k`` pairs by weight (ties broken by (id_a, id_b)):
    (id_a, id_b, agree_<name>..., pattern, weight) with weight rounded to
    6dp.
    """
    if not fields:
        raise ValueError("fs_match_weights needs at least one compare field")
    proj = df.select(
        F.col(id_col).alias("_id"),
        *[F.col(c).alias(f"_b_{c}") for c in block_cols],
        *[expr.alias(f"_f_{name}") for name, expr, _, _ in fields],
    )
    a, b = proj.alias("a"), proj.alias("b")
    cond = F.col(f"a._id") < F.col(f"b._id")
    for c in block_cols:
        cond = cond & (F.col(f"a._b_{c}") == F.col(f"b._b_{c}"))
    pairs = a.join(b, cond)

    agree_cols = []
    weight = F.lit(0.0)
    pattern = F.lit("")
    for name, _, m, u in fields:
        wa, wd = fs_weights(m, u)
        ag = F.col(f"a._f_{name}").eqNullSafe(F.col(f"b._f_{name}"))
        agree_cols.append(ag.alias(f"agree_{name}"))
        weight = weight + F.when(ag, F.lit(wa)).otherwise(F.lit(wd))
        pattern = F.concat(pattern, F.when(ag, F.lit("1")).otherwise(F.lit("0")))

    out = pairs.select(
        F.col("a._id").alias("id_a"),
        F.col("b._id").alias("id_b"),
        *agree_cols,
        pattern.alias("pattern"),
        F.round(weight, 6).alias("weight"),
    )
    return out.orderBy(F.desc("weight"), "id_a", "id_b").limit(top_k)


def token_blocking_audit(df: DataFrame, id_col: str, text_col: str,
                         purge_max: int = 50) -> DataFrame:
    """Token-blocking + block-purging audit (X239; the Papadakis et al.
    meta-blocking workhorse): every token of ``text_col`` is a block,
    entities sharing a block are candidate comparisons — the standard
    entity-resolution blocking baseline whose failure mode is a few
    huge stop-word blocks owning a quadratic share of the comparisons.
    Reports, for the raw blocking and after purging blocks larger than
    ``purge_max``: block count, aggregate comparisons Σ n(n-1)/2, the
    largest block, and (purged stage only) the DISTINCT candidate
    pairs — aggregate minus distinct is the redundancy meta-blocking
    graphs exist to exploit. This is the sizing audit run BEFORE the
    X189 sorted-neighborhood or X225 Fellegi-Sunter scoring passes.

    Returns two rows: (stage, n_blocks, n_comparisons, distinct_pairs,
    max_block). ``distinct_pairs`` is -1 for the raw stage BY DESIGN:
    materializing pairs of unpurged blocks is the quadratic blowup the
    purge exists to prevent, so the audit never pays it (the
    LSH-hot-bucket-cap discipline).

    Scale shape: one explode + distinct to (entity, block), one
    bounded groupBy for sizes; only the PURGED blocks (every one
    ≤ purge_max entities) are self-joined for distinct pairs. ALL
    integer arithmetic.
    """
    pairs = (df.select(F.col(id_col).alias("id"),
                       F.explode(tokens(text_col)).alias("block"))
             .distinct())
    sizes = (pairs.groupBy("block")
             .agg(F.count("*").alias("n"))
             .where(F.col("n") >= 2).persist())

    def _stats(sz):
        return sz.agg(
            F.count("*").cast("long").alias("n_blocks"),
            F.sum(F.col("n") * (F.col("n") - 1) / 2).cast("long")
            .alias("n_comparisons"),
            F.max("n").cast("long").alias("max_block"))

    kept = sizes.where(F.col("n") <= purge_max)
    kp = pairs.join(kept.select("block"), "block", "left_semi")
    a = kp.select("block", F.col("id").alias("ia"))
    b = kp.select("block", F.col("id").alias("ib"))
    ndp = (a.join(b, "block").where(F.col("ia") < F.col("ib"))
           .select("ia", "ib").distinct().count())
    raw = _stats(sizes).collect()[0]
    pur = _stats(kept).collect()[0]
    sizes.unpersist()
    rows = [("raw", int(raw["n_blocks"] or 0),
             int(raw["n_comparisons"] or 0), -1,
             int(raw["max_block"] or 0)),
            ("purged", int(pur["n_blocks"] or 0),
             int(pur["n_comparisons"] or 0), int(ndp),
             int(pur["max_block"] or 0))]
    return df.sparkSession.createDataFrame(
        rows, "stage STRING, n_blocks LONG, n_comparisons LONG, "
              "distinct_pairs LONG, max_block LONG")
