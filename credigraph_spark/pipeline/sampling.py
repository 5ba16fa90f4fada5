"""Dataset curation sampling — deterministic, skew-immune, oracle-exact.

Two ops every large-scale training-data pipeline needs and the reference
does per-seed / single-node only (tgrag/dataset/sampler.py uses SQLite
`ORDER BY RANDOM() LIMIT k`):

* stratified_sample — at most k rows per stratum (e.g. per language),
  chosen by md5 order: uniform-ish, deterministic across runs,
  partitionings and engines, so the exact sample is reproducible and
  SQL-oracle-checkable.
* hash_split — stable train/val/test assignment by hashing the row key
  into [0,1): a document keeps its split forever as the corpus grows,
  the property that matters for dedup-safe eval sets.

Scale design for stratified_sample: a single global window per stratum
ranks EVERY row of the biggest stratum in one task (a 100 TB corpus that
is 40% English puts 40% of rows in one partition). Instead: phase 1
ranks within (stratum, salt) — 64-way parallel, keeps ≤ k per salt —
then phase 2 ranks the ≤ 64k survivors per stratum. Identical output to
the single window (the md5 order is total when the key columns are
unique), shuffle bounded by O(k·salts) rows per stratum in phase 2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

N_SALTS = 64


def _md5_key(cols: list[str], seed: int) -> Column:
    return F.md5(F.concat_ws("|", *[F.col(c) for c in cols],
                             F.lit(str(seed))))


def stratified_sample(df: DataFrame, group_col: str, k: int,
                      key_cols: list[str], seed: int = 42,
                      n_salts: int = N_SALTS) -> DataFrame:
    """At most ``k`` rows per ``group_col`` value, selected and returned
    in md5(key_cols|seed) order. ``key_cols`` must identify rows uniquely
    (the md5 total order is what makes the two-phase plan exact)."""
    key = _md5_key(key_cols, seed)
    salted = df.withColumn("_k", key).withColumn(
        "_salt", F.pmod(F.xxhash64(*key_cols, F.lit(seed)),
                        F.lit(n_salts)))
    w1 = Window.partitionBy(group_col, "_salt").orderBy("_k")
    survivors = (salted.withColumn("_rn", F.row_number().over(w1))
                 .where(F.col("_rn") <= k).drop("_rn", "_salt"))
    w2 = Window.partitionBy(group_col).orderBy("_k")
    return (survivors.withColumn("_rn", F.row_number().over(w2))
            .where(F.col("_rn") <= k).drop("_rn", "_k"))


def hash_split(df: DataFrame, key_cols: list[str],
               weights: dict[str, float], seed: int = 42) -> DataFrame:
    """Append a ``split`` column assigning each row to a named split with
    probability ~ its weight, by the first 15 hex digits of
    md5(key|seed) read as a fraction of 16^15 — exact in a double
    (60 bits) and bit-identical in any engine with md5. Weights must sum
    to 1 (validated); boundaries are cumulative-sum half-open buckets,
    deterministic per key regardless of corpus growth."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights sum to {total}, expected 1.0")
    frac = (F.conv(F.substring(_md5_key(key_cols, seed), 1, 15), 16, 10)
            .cast("double") / F.lit(float(16 ** 15)))
    expr = None
    acc = 0.0
    names = list(weights)
    for name in names[:-1]:
        acc += weights[name]
        cond = frac < F.lit(acc)
        expr = F.when(cond, F.lit(name)) if expr is None else \
            expr.when(cond, F.lit(name))
    expr = (F.lit(names[0]) if expr is None
            else expr.otherwise(F.lit(names[-1])))
    return df.withColumn("split", expr)


def weighted_sample(df: DataFrame, key_cols: list[str], weight_col: str,
                    k: int, seed: int = 42,
                    round_digits: int = 9) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k rows with inclusion odds
    proportional to ``weight_col`` — Efraimidis-Spirakis A-ES: each row
    draws u in (0,1] and the top-k by u^(1/w) win. We rank by the
    monotone-equivalent ln(u)/w (DESC) to avoid pow(), and u comes from
    the first 15 hex digits of md5(key|seed) (exact in a double, the
    hash_split trick) so the \"randomness\" is deterministic and
    bit-identical in any engine with md5 — which is what makes the draw
    oracle-checkable AND reproducible across reruns/retries at 100 TB.

    Rows with NULL or non-positive weight never win (weight 0 = excluded,
    matching A-ES in the limit). The selection ranks the ROUNDED key with
    a key_cols tiebreak, so a 1-ulp cross-engine ln() difference cannot
    flip membership. Scale shape: per-row expressions + one global
    top-k (TakeOrdered — no full sort, no single-partition window)."""
    u = ((F.conv(F.substring(_md5_key(key_cols, seed), 1, 15), 16, 10)
          .cast("double") + F.lit(1.0)) / F.lit(float(16 ** 15)))
    w = F.col(weight_col).cast("double")
    key = F.round(F.log(u) / w, round_digits)
    return (
        df.where(w.isNotNull() & (w > 0))
        .withColumn("es_key", key)
        .orderBy(F.col("es_key").desc(), *[F.col(c) for c in key_cols])
        .limit(k)
    )
