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


def _power_iterate(x: DataFrame, n_iter: int) -> tuple[list, list]:
    """(mu, v) after ``n_iter`` centered power-iteration rounds over the
    cleaned vector column ``x``; both as driver-side Python lists."""
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
    return mu, v


def _clean_vecs(df: DataFrame, vec_col: str, extra=()):
    return df.select(*extra,
                     F.col(vec_col).cast("array<double>").alias("x")) \
             .where(F.col("x").isNotNull() & (F.size("x") > 0))


def pca_top_component(df: DataFrame, vec_col: str = "embedding",
                      n_iter: int = 3,
                      round_digits: int | None = None) -> DataFrame:
    """(dim_idx, component) — the top principal component after
    ``n_iter`` power-iteration rounds on the CENTERED data, starting
    from the normalized all-ones vector (deterministic sign). Returns
    one row per dimension.

    Doubles: sums are order-dependent across engines — callers needing
    hash-stable output pass ``round_digits`` (pagerank precedent)."""
    _, v = _power_iterate(_clean_vecs(df, vec_col), n_iter)
    spark = df.sparkSession
    rows = [(i, round(vi, round_digits) if round_digits is not None else vi)
            for i, vi in enumerate(v)]
    return spark.createDataFrame(rows, "dim_idx BIGINT, component DOUBLE")


def remove_top_component(df: DataFrame, id_col: str = "vec_id",
                         vec_col: str = "embedding", n_iter: int = 3,
                         round_digits: int | None = None) -> DataFrame:
    """All-but-the-top embedding post-processing (Mu & Viswanath 2018):
    center every vector and remove its projection on the dominant
    principal direction — the standard hygiene step that strips the
    common "frequency" direction from embedding spaces. Returns per
    vector (id, proj, norm_before, norm_after): the projection
    coefficient t = (x−μ)·v and the L2 norms of the centered vector
    before/after removal (norm_after = sqrt(nb² − t²), exact since v is
    unit-norm).

    Scale shape: the component fits the driver (d doubles); the
    transform pass is ONE scan of per-row zip_with folds — broadcastable
    constants, zero shuffle beyond the power iteration itself."""
    x = _clean_vecs(df, vec_col, extra=(id_col,))
    mu, v = _power_iterate(x.select("x"), n_iter)
    c = sum(m * vv for m, vv in zip(mu, v))
    mu_lit = F.array(*[F.lit(float(m)) for m in mu])
    cx = F.zip_with(F.col("x"), mu_lit, lambda a, b: a - b)
    t = _dot_lit(F.col("x"), v) - F.lit(c)
    nb2 = F.aggregate(cx, F.lit(0.0), lambda acc, e: acc + e * e)
    out = x.select(
        F.col(id_col),
        t.alias("proj"),
        F.sqrt(nb2).alias("norm_before"),
        F.sqrt(nb2 - t * t).alias("norm_after"))
    if round_digits is not None:
        out = out.select(
            id_col, F.round("proj", round_digits).alias("proj"),
            F.round("norm_before", round_digits).alias("norm_before"),
            F.round("norm_after", round_digits).alias("norm_after"))
    return out
