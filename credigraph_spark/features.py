"""Distributed feature-matrix assembly for the ML serving store.

Reference parity: ekmpa/CrediGraph assembles per-node feature vectors on a
single machine — pandas column → encoder → torch tensor → ``torch.cat(xs,
dim=-1)`` (``tgrag/utils/readers.py:188-203``) — with an encoder suite of
min-max normalization (``tgrag/encoders/norm_encoding.py:9-18``), one-hot
over the sorted unique classes (``categorical_encoder.py:9-20``), raw
timestamp passthrough (``time_encoder.py:8-13``), zeros
(``zero_encoder.py:7-12``) and uniform random (``rni_encoding.py:7-12``),
and stores the packed vectors as ``domain(id, ts, x BLOB, y REAL)``
(``construct_relational_database/construct_relational_table.py:99-117``).

This module re-expresses that assembly as ONE distributed DataFrame
program (VERDICT r4 #8):

* **norm** — global min/max for every numeric column come from a single
  1-row aggregate broadcast back over the table (two scans total, no
  shuffle of the big side); the per-row expression is pure column math.
* **categorical** — the vocabulary (sorted distinct values = np.unique
  order) is collected ONCE at plan-build time (tiny-dimension-table
  semantics, same shape as the IVF centroid collect) and unrolled into a
  one-hot array expression; no join touches the big table.
* **time** — raw value passthrough cast to double (dates → epoch days,
  timestamps → epoch seconds), exactly TimeStampEncoder's
  ``torch.tensor(series.values)``.
* **zero / rni** — constant-width tails. RNI is a DETERMINISTIC
  Knuth-multiplicative hash of (id, dim) scaled to [0, 1) rather than
  ``torch.rand`` (which is irreproducible anyway): exact integer ops,
  replayable in any SQL engine, so the whole feature matrix has a
  DuckDB oracle.

Every encoder is a JVM column expression — no Python in the per-row
path; the only Python is ``pack_float32`` (Arrow-batched) on the
serving-export edge where the BLOB format itself demands numpy.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql import types as T

from credigraph_spark.session import eager_checkpoint

# Knuth's multiplicative hash constant (2^32 / golden ratio), modulus 2^24:
# exact in int64 and in IEEE double, so the RNI tail is bit-reproducible
# in Spark, DuckDB and plain Python alike.
_RNI_MULT = 2654435761
_RNI_STEP = 40503
_RNI_MOD = 1 << 24


def _rni_cell(id_col: Column, j: int, seed: int) -> Column:
    h = F.pmod(id_col.cast("bigint") * F.lit(_RNI_MULT)
               + F.lit(int(j) * _RNI_STEP + seed), F.lit(_RNI_MOD))
    return h.cast("double") / F.lit(float(_RNI_MOD))


def _time_cell(df: DataFrame, col: str) -> Column:
    dt = df.schema[col].dataType
    if isinstance(dt, T.DateType):
        return F.datediff(F.col(col), F.lit("1970-01-01")).cast("double")
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.unix_timestamp(F.col(col)).cast("double")
    return F.col(col).cast("double")


def categorical_vocabulary(df: DataFrame, col: str,
                           max_classes: int = 10_000) -> list:
    """Sorted distinct values of ``col`` (np.unique order —
    ``categorical_encoder.py:13-14``). One distinct aggregation, then a
    driver collect of the (small) vocabulary; raises when the column is
    not actually categorical so a high-cardinality mistake cannot
    silently build a million-wide one-hot."""
    rows = (df.select(col).where(F.col(col).isNotNull()).distinct()
            .orderBy(col).limit(max_classes + 1).collect())
    if len(rows) > max_classes:
        raise ValueError(
            f"categorical column {col!r} has more than {max_classes} "
            f"classes — not one-hot material; bucket or embed it instead")
    return [r[0] for r in rows]


def assemble_features(
    df: DataFrame,
    id_col: str,
    norm_cols: Sequence[str] = (),
    categorical_cols: Sequence[str] = (),
    time_cols: Sequence[str] = (),
    zero_dims: int = 0,
    rni_dims: int = 0,
    rni_seed: int = 0,
) -> tuple[DataFrame, list[str]]:
    """(id, x array<double>) plus the feature-name list, concatenated in
    the reference's ``torch.cat(xs, dim=-1)`` order: norm columns, then
    per-categorical one-hot blocks, then raw time columns, then the
    zero and RNI tails.

    Degenerate norm columns (max == min, where the reference divides by
    zero into NaN) emit 0.0 instead — documented deviation, keeps the
    vector finite."""
    names: list[str] = []
    cells: list[Column] = []

    if norm_cols:
        aggs = []
        for c in norm_cols:
            aggs += [F.min(F.col(c).cast("double")).alias(f"_mn_{c}"),
                     F.max(F.col(c).cast("double")).alias(f"_mx_{c}")]
        stats = df.agg(*aggs)
        df = df.crossJoin(F.broadcast(stats))
        for c in norm_cols:
            mn, mx = F.col(f"_mn_{c}"), F.col(f"_mx_{c}")
            cells.append(
                F.when(mx == mn, F.lit(0.0))
                .otherwise((F.col(c).cast("double") - mn) / (mx - mn)))
            names.append(f"norm:{c}")

    vocabs = {c: categorical_vocabulary(df, c) for c in categorical_cols}

    onehots: list[Column] = []
    for c in categorical_cols:
        onehots.append(F.array(*[
            F.when(F.col(c) == F.lit(v), F.lit(1.0)).otherwise(F.lit(0.0))
            for v in vocabs[c]]))
        names += [f"onehot:{c}={v}" for v in vocabs[c]]

    for c in time_cols:
        cells.append(_time_cell(df, c))
        names.append(f"time:{c}")

    tail: list[Column] = []
    tail += [F.lit(0.0)] * zero_dims
    names += [f"zero:{j}" for j in range(zero_dims)]
    tail += [_rni_cell(F.col(id_col), j, rni_seed) for j in range(rni_dims)]
    names += [f"rni:{j}" for j in range(rni_dims)]

    # reference order: encoder outputs concatenated dim=-1; we emit
    # norm block, one-hot blocks, time block, zero/rni tail
    n_norm = len([n for n in names if n.startswith("norm:")])
    parts: list[Column] = []
    if n_norm:
        parts.append(F.array(*cells[:n_norm]))
    parts += onehots
    rest = cells[n_norm:] + tail
    if rest:
        parts.append(F.array(*rest))
    x = parts[0] if len(parts) == 1 else F.concat(*parts)
    out = df.select(F.col(id_col), x.alias("x"))
    return out, names


def neighbor_mean_exact(edges: DataFrame, feats: DataFrame,
                        id_col: str = "vid", vec_col: str = "v",
                        hops: int = 1, max_dims: int | None = None
                        ) -> DataFrame:
    """GraphSAGE-style mean-pooling of IN-neighbour feature vectors,
    ``hops`` levels deep, with ORDER-INDEPENDENT means: each hop sums
    ``floor(x·1e9)``-quantized inputs exactly as decimals and divides
    once — so a 2-hop mean-of-means is bit-reproducible under any
    partitioning and in any SQL engine, where a float-avg version
    compounds rounding per hop and cannot be oracle-compared beyond one
    level.

    Long-form output (id, d, val): d is the 0-based dimension index;
    per hop the plan is one src-keyed join of the edge table with the
    |V|·dims feature rows plus one partial-aggregatable
    groupBy(dst, d). ``max_dims`` prunes dimensions BEFORE the first
    join (per-dimension means are independent, so early pruning is
    exact); vertices without in-neighbours drop out at each hop (mean
    of an empty set is undefined, matching the reference's semantics).
    Feature state is eager-localCheckpointed between hops (it feeds the
    next hop's join — the iterative-state lesson)."""
    long = feats.select(
        F.col(id_col).alias("_vid"),
        F.posexplode(F.col(vec_col)).alias("d", "val"))
    if max_dims is not None:
        long = long.where(F.col("d") < max_dims)
    for i in range(hops):
        long = (
            edges.join(long.withColumnRenamed("_vid", "src"), "src")
            .groupBy(F.col("dst").alias("_vid"), "d")
            .agg((F.sum(F.floor(F.col("val") * 1e9).cast("decimal(38,0)"))
                  .cast("double")
                  / F.count(F.lit(1)).cast("double") / F.lit(1e9))
                 .alias("val"))
        )
        if i + 1 < hops:
            long = long.transform(eager_checkpoint)
    return long.withColumnRenamed("_vid", id_col)


@F.pandas_udf(T.BinaryType())
def pack_float32(x: pd.Series) -> pd.Series:
    """array<double> → little-endian float32 bytes — the reference's
    ``x BLOB`` cell format (numpy ``tobytes``). Arrow-batched; only used
    on the serving-export edge."""
    return pd.Series([
        None if v is None else np.asarray(v, dtype="<f4").tobytes()
        for v in x])


def unpack_float32(blob: bytes) -> np.ndarray:
    """Driver/test-side inverse of :func:`pack_float32`."""
    return np.frombuffer(blob, dtype="<f4")


def rank_normalize(df: DataFrame, id_col: str, cols: Sequence[str],
                   round_digits: int = 9) -> DataFrame:
    """(id, <col>_rank ...) — quantile/rank normalization for feature
    encoding: value → (rank − 0.5) / n under the (value, id) total
    order, the distribution-free scaling that survives outliers where
    min-max (assemble_features' norm encoder) does not — the standard
    rank-gauss front half. Duplicated values get distinct consecutive
    ranks (id tiebreak), so the output is deterministic and
    cross-engine-reproducible rather than average-tied.

    Each column costs one O3 range-partition ranking
    (analytics._global_ascending_ranks — never a single-partition
    window); the joins back are id-keyed."""
    from credigraph_spark.analytics import _global_ascending_ranks

    n = df.count()
    out = df.select(F.col(id_col))
    for c in cols:
        r = _global_ascending_ranks(
            df.select(id_col, F.col(c).alias("_v")), "_v", id_col,
            f"_r_{c}")
        out = out.join(
            r.select(id_col,
                     F.round((F.col(f"_r_{c}") - 0.5) / F.lit(float(n)),
                             round_digits).alias(f"{c}_rank")),
            id_col)
    return out


def target_encode(df: DataFrame, cat_col: str, label_col,
                  m: int = 10) -> DataFrame:
    """Smoothed target encoding (X209; Micci-Barreca 2001) — the
    standard categorical feature for tree/linear models: each category
    maps to its label mean shrunk toward the global prior with
    pseudo-count ``m``:  enc(c) = (s_c + m*S/N) / (n_c + m). With a
    binary label the encoding is exactly rational, so the operator
    carries EXACT integer numerator/denominator (num = s_c*N + m*S,
    den = N*(n_c + m)) alongside the rounded double — bit-reproducible
    in any engine.

    Returns (cat_col, n, pos, enc_num, enc_den, enc).

    Scale shape: ONE map-side-combinable groupBy for the per-category
    (n, s), one 1-row global aggregate broadcast-cross-joined back.
    No windows, no UDFs.
    """
    lab = (F.col(label_col) if not isinstance(label_col, str)
           else F.col(label_col)).cast("long")
    per = df.groupBy(cat_col).agg(
        F.count("*").cast("long").alias("n"),
        F.sum(lab).cast("long").alias("pos"))
    tot = per.agg(F.sum("n").cast("long").alias("tot_n"),
                  F.sum("pos").cast("long").alias("tot_s"))
    num = F.col("pos") * F.col("tot_n") + F.lit(int(m)) * F.col("tot_s")
    den = F.col("tot_n") * (F.col("n") + F.lit(int(m)))
    return (per.crossJoin(F.broadcast(tot))
            .select(cat_col, "n", "pos",
                    num.cast("long").alias("enc_num"),
                    den.cast("long").alias("enc_den"),
                    F.round(num / den, 6).alias("enc")))


def ldp_features(edges, round_digits: int = 6):
    """Local Degree Profile features (X268; Cai & Wang 2018 — the
    'simple yet effective' baseline every GNN paper benchmarks
    against): per vertex, its undirected degree plus the min / max /
    mean / sum of its NEIGHBORS' degrees — five structural features
    that need no training and already separate hubs, leaves,
    periphery-of-hub and core vertices. Feeds the X62 feature-matrix
    assembly as the zero-cost structural block next to the
    time/categorical encoders.

    Returns (vid, deg, nd_min, nd_max, nd_sum, nd_mean).

    Scale shape: one degree aggregation + one join decorating each
    edge endpoint with its neighbor's degree + one per-vertex
    aggregation — the h-index (X244) cost class, all integer until
    the final rounded mean.
    """
    from pyspark.sql import functions as F

    from credigraph_spark.graph.adjacency import undirected_simple

    und = undirected_simple(edges)
    deg = und.groupBy(F.col("src").alias("vid")).agg(
        F.count("*").cast("long").alias("deg"))
    nbr = (und.join(deg.select(F.col("vid").alias("dst"),
                               F.col("deg").alias("nd")), "dst")
           .select(F.col("src").alias("vid"), "nd"))
    prof = (nbr.groupBy("vid")
            .agg(F.min("nd").cast("long").alias("nd_min"),
                 F.max("nd").cast("long").alias("nd_max"),
                 F.sum("nd").cast("long").alias("nd_sum"),
                 F.count("*").alias("_n")))
    return (deg.join(prof, "vid")
            .select("vid", "deg", "nd_min", "nd_max", "nd_sum",
                    F.round(F.col("nd_sum") / F.col("_n"),
                            round_digits).alias("nd_mean")))
