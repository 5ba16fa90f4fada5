"""Similarity search over embedding columns (array<float/double>).

* ``cosine_topk_bruteforce`` — exact top-k: query×candidate join with the
  dot product expressed as ``zip_with`` + ``aggregate`` (JVM-side, no
  Python). The query side is small by construction and is broadcast, so
  the "cross join" is really a broadcast nested loop that streams the
  candidate table once — the right baseline shape at any scale.
* ``lsh_bucketed_topk`` — the scale path: random-hyperplane LSH bucket
  keys (sign bits of dot(v, plane_j)), computed by a vectorized numpy
  pandas UDF; queries only compare against same-bucket candidates across
  ``n_tables`` independent tables (approximate, tunable recall).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import ArrayType, LongType
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, v: acc + v))


def cosine_similarity(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk_bruteforce(queries: DataFrame, candidates: DataFrame, k: int = 5,
                           id_col: str = "vec_id", vec_col: str = "embedding",
                           exclude_self: bool = True) -> DataFrame:
    """(query_id, neighbor_id, cosine) — exact top-k per query.
    Ties broken by smallest neighbor id for determinism."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = candidates.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = F.broadcast(q).crossJoin(c).select(
        "query_id", "neighbor_id",
        cosine_similarity(F.col("qv"), F.col("cv")).alias("cosine"),
    )
    if exclude_self:
        scored = scored.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def _hyperplane_bits_udf(dim: int, bits_per_table: int, n_tables: int, seed: int):
    """Vectorized bucket-key UDF: one matrix multiply per Arrow batch
    against deterministic N(0,1) hyperplanes (seeded), sign bits packed to
    one int per table."""
    total_bits = bits_per_table * n_tables

    @F.pandas_udf(ArrayType(LongType()))
    def _buckets(vecs: pd.Series) -> pd.Series:
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((dim, total_bits))
        mat = np.stack(vecs.to_numpy())            # (batch, dim)
        signs = (mat @ planes) > 0                 # (batch, total_bits)
        weights = (1 << np.arange(bits_per_table, dtype=np.int64))
        out = []
        for row in signs:
            keys = [
                int((row[t * bits_per_table:(t + 1) * bits_per_table] * weights).sum())
                for t in range(n_tables)
            ]
            out.append(keys)
        return pd.Series(out)

    return _buckets


def lsh_bucketed_topk(queries: DataFrame, candidates: DataFrame, k: int = 5,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      dim: int | None = None, bits_per_table: int = 8,
                      n_tables: int = 4, seed: int = 7,
                      exclude_self: bool = True) -> DataFrame:
    """Approximate top-k: compare only within matching (table, bucket)
    pairs. Recall grows with n_tables; cost shrinks ~2^bits_per_table×
    vs brute force."""
    if dim is None:
        dim = len(candidates.select(vec_col).first()[0])
    udf = _hyperplane_bits_udf(dim, bits_per_table, n_tables, seed)

    def with_buckets(df, id_alias, vec_alias):
        return (
            df.select(F.col(id_col).alias(id_alias), F.col(vec_col).alias(vec_alias),
                      udf(F.col(vec_col)).alias("bk"))
            .select(id_alias, vec_alias, F.posexplode("bk").alias("table_idx", "bucket"))
        )

    q = with_buckets(queries, "query_id", "qv")
    c = with_buckets(candidates, "neighbor_id", "cv")
    scored = (
        q.join(c, ["table_idx", "bucket"])
        .select("query_id", "neighbor_id",
                cosine_similarity(F.col("qv"), F.col("cv")).alias("cosine"))
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    if exclude_self:
        scored = scored.where(F.col("query_id") != F.col("neighbor_id"))
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )
