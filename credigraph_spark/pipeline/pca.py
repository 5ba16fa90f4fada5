"""Distributed PCA by power iteration — the top principal component of
an embedding matrix without ever materializing the d×d covariance:
C·v = (1/n) Σ (x−μ)((x−μ)·v) needs only one data pass per round,
each row contributing a scalar projection t = x·v − μ·v and a rank-1
update t·x. The standard first step of embedding hygiene (dominant
direction removal, whitening diagnostics) for training-data pipelines.

Engine shape: per round ONE scan computing t via a zip_with dot fold
(JVM codegen, no UDF) + ONE posexplode partial-agg sum per dimension;
the d-vector (d = embedding width, tiny) collects to the driver for the
L2 normalization — the same per-superstep-scalar driver-loop shape as
pagerank's dangling mass. μ is computed once the same way.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def _dot_lit(vec_col, vals: list[float]):
    """dot(vec_col, literal vals) as a zip_with fold."""
    lit = F.array(*[F.lit(float(v)) for v in vals])
    return F.aggregate(
        F.zip_with(vec_col, lit, lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x)


def pca_top_component(df: DataFrame, vec_col: str = "embedding",
                      n_iter: int = 3,
                      round_digits: int | None = None) -> DataFrame:
    """(dim_idx, component) — the top principal component after
    ``n_iter`` power-iteration rounds on the CENTERED data, starting
    from the normalized all-ones vector (deterministic sign). Returns
    one row per dimension.

    Doubles: sums are order-dependent across engines — callers needing
    hash-stable output pass ``round_digits`` (pagerank precedent)."""
    x = df.select(F.col(vec_col).cast("array<double>").alias("x")) \
          .where(F.col("x").isNotNull() & (F.size("x") > 0))
    exploded = x.select(F.posexplode("x").alias("idx", "val"))
    mu_rows = (exploded.groupBy("idx").agg(F.avg("val").alias("mu"))
               .orderBy("idx").collect())
    mu = [r.mu for r in mu_rows]
    d = len(mu)
    v = [1.0 / math.sqrt(d)] * d
    for _ in range(n_iter):
        c = sum(m * vv for m, vv in zip(mu, v))
        t = x.select("x", (_dot_lit(F.col("x"), v) - F.lit(c)).alias("t"))
        sums = (t.select(F.posexplode("x").alias("idx", "val"), "t")
                .groupBy("idx")
                .agg(F.sum(F.col("val") * F.col("t")).alias("s"),
                     F.sum("t").alias("st"))
                .orderBy("idx").collect())
        st_total = None
        # st is identical per idx (Σt over all rows); one global value
        w = []
        for r in sums:
            if st_total is None:
                st_total = r.st
            w.append(r.s - st_total * mu[r.idx])
        nrm = math.sqrt(sum(wi * wi for wi in w))
        v = [wi / nrm for wi in w]
    spark = df.sparkSession
    rows = [(i, round(vi, round_digits) if round_digits is not None else vi)
            for i, vi in enumerate(v)]
    return spark.createDataFrame(rows, "dim_idx BIGINT, component DOUBLE")
