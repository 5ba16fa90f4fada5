"""Enrichment joins: rating/label attachment, score joins, suffix matching.

SURVEY.md §2.3 J4-J8 and §2.4 A14-A15. The reference does these with SQLite
point lookups (txt_to_csv_sqlite.py:161-275), a driver-side trie
(merge_dqr_ratings_trie_filter.py:23-171) and pandas maps; here each is a
broadcast/equi join so Catalyst picks the physical strategy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def attach_scores(vertices: DataFrame, scores: DataFrame, key: str = "domain",
                  score_cols: tuple[str, ...] = ("pr_val", "hc_val"),
                  missing: float = -1.0) -> DataFrame:
    """J4: left join + missing -> -1.0 sentinel (txt_to_csv_sqlite.py:193-196).
    The score dim is broadcast — it is always << the vertex table."""
    out = vertices.join(F.broadcast(scores), key, "left")
    for c in score_cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(missing)))
    return out


def attach_edge_scores(edges: DataFrame, node_scores: DataFrame,
                       missing: float = -1.0) -> DataFrame:
    """J5: enrich edges with both endpoints' (pr,hc)
    (txt_to_csv_sqlite.py:206-275) — two broadcast left joins."""
    s = node_scores.select(
        F.col("domain").alias("src"),
        F.col("pr_val").alias("pr_val_src"), F.col("hc_val").alias("hc_val_src"),
    )
    d = node_scores.select(
        F.col("domain").alias("dst"),
        F.col("pr_val").alias("pr_val_dst"), F.col("hc_val").alias("hc_val_dst"),
    )
    out = edges.join(F.broadcast(s), "src", "left").join(F.broadcast(d), "dst", "left")
    for c in ("pr_val_src", "hc_val_src", "pr_val_dst", "hc_val_dst"):
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(missing)))
    return out


def longest_suffix_match(nodes: DataFrame, rated: DataFrame,
                         node_col: str = "domain", rated_col: str = "domain",
                         value_col: str = "pc1", missing: float = -1.0,
                         max_labels: int = 10) -> DataFrame:
    """J6: longest dot-boundary suffix match, deepest match wins, -1.0 on
    miss (merge_dqr_ratings_trie_filter.py:23-119).

    The reference builds a driver-side trie over reversed domains and scans
    per node in a process pool. Spark-first rewrite (pure SQL, no trie, no
    UDF): explode each node domain into its candidate suffixes
    (`a.b.c` -> [`a.b.c`, `b.c`, `c`]), equi-join against the rated table,
    keep the deepest (longest-label) hit per node via max_by. The explode
    factor is bounded by label count (<= max_labels), and the rated side is
    the small dim — Catalyst broadcasts it.
    """
    parts = F.split(F.col(node_col), r"\.")
    n = F.size(parts)
    idx = F.sequence(F.lit(0), F.least(F.lit(max_labels - 1), n - 1))
    suffixes = F.transform(idx, lambda i: F.array_join(F.slice(parts, i + 1, n), "."))
    exploded = nodes.withColumn("_suffix", F.explode(suffixes)).withColumn(
        "_depth", F.size(F.split(F.col("_suffix"), r"\."))
    )
    hits = exploded.join(
        F.broadcast(rated.select(F.col(rated_col).alias("_suffix"),
                                 F.col(value_col).alias("_val"))),
        "_suffix", "inner",
    )
    best = hits.groupBy(node_col).agg(
        F.max_by(F.col("_val"), F.col("_depth")).alias("_best")
    )
    return (
        nodes.join(best, node_col, "left")
        .withColumn(value_col, F.coalesce(F.col("_best"), F.lit(missing)))
        .drop("_best")
    )


def average_binarize_labels(labels: DataFrame, key: str = "domain",
                            label_col: str = "label",
                            threshold: float = 0.5) -> DataFrame:
    """A14: mean(label) >= threshold -> 1 else 0 per key
    (writers.py:230-258, readers.py:471-499)."""
    return labels.groupBy(key).agg(
        F.when(F.avg(label_col) >= threshold, 1).otherwise(0).alias("label")
    )


def overlap_count(a: DataFrame, b: DataFrame, key: str = "domain") -> int:
    """J11/U4: |A ∩ B| via left-semi join (checkers.py:13-37)."""
    return a.select(key).distinct().join(b.select(key).distinct(), key, "left_semi").count()
