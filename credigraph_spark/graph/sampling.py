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
