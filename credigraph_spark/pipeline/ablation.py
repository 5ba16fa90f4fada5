"""Filter-ablation ledger: the curation diagnostic every multi-filter
pipeline needs before shipping — per-filter kill rates AND the pairwise
overlap of kill sets (two filters with Jaccard ~1 are redundant; a
filter whose kills nothing else catches is carrying unique signal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def filter_ablation(flags: dict[str, DataFrame], id_col: str = "doc_id",
                    keep_col: str = "keep",
                    round_digits: int = 6) -> DataFrame:
    """``flags``: filter name → per-doc frame carrying (id_col,
    keep_col) with a boolean/0-1 keep flag over the SAME document
    universe. Returns the tidy pairwise matrix (filter_a, filter_b,
    killed_a, killed_b, killed_both, jaccard) for a <= b in name order
    — diagonal rows read as per-filter kill counts, jaccard of a kill
    set with itself is 1 (or 0.0 when the filter kills nothing).

    Scale shape: the flags join on doc id (co-keyed equi-joins), then
    ONE aggregation computes every pairwise co-kill count in a single
    pass (conditional sums — no per-pair scans); the output is
    |filters|² rows built from that 1-row aggregate."""
    names = sorted(flags)
    joined = None
    for i, name in enumerate(names):
        f = flags[name].select(
            F.col(id_col).alias("doc_id"),
            (~F.col(keep_col).cast("boolean")).cast("long")
            .alias(f"_k{i}"))
        joined = f if joined is None else joined.join(f, "doc_id")
    aggs = []
    for i in range(len(names)):
        for j in range(i, len(names)):
            aggs.append(F.sum(F.col(f"_k{i}") * F.col(f"_k{j}"))
                        .cast("long").alias(f"b_{i}_{j}"))
    row = joined.agg(*aggs).collect()[0]
    out = []
    for i, a in enumerate(names):
        for j in range(i, len(names)):
            ka, kb = row[f"b_{i}_{i}"], row[f"b_{j}_{j}"]
            both = row[f"b_{i}_{j}"]
            union = ka + kb - both
            jac = round(both / union, round_digits) if union else 0.0
            out.append((a, names[j], ka, kb, both, jac))
    spark = joined.sparkSession
    return spark.createDataFrame(
        out, "filter_a STRING, filter_b STRING, killed_a LONG, "
             "killed_b LONG, killed_both LONG, jaccard DOUBLE")
