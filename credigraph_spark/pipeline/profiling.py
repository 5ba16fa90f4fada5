"""Data-quality profiling and validation (X206/X207).

Not in the reference (its quality control is per-row content filters);
this is the table-level layer every production pipeline runs before
training — the Deequ / Great Expectations / dbt-test niche re-expressed
as Spark aggregations: one profiling pass per column (null rate, exact
distinct count, min/max) and a declarative check suite (uniqueness,
completeness, referential integrity, range) whose result is a tiny
per-check verdict table.

Physical design: column profiles are ONE wide aggregate per column over
a single scan (Catalyst collapses the per-column expressions into one
HashAggregate — no per-column job), unioned into the long-form result;
checks are each a single aggregate or anti-join count. Nothing leaves
the JVM; numeric min/max are stringified through CAST for a uniform
schema (documented caveat: float columns stringify engine-specifically,
so keep them out of profiled min/max or pre-round them).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Long-form column profile: one row per column with
    (column, n_rows, n_nulls, n_distinct, min_str, max_str).

    ``n_distinct`` is EXACT (count_distinct, null excluded); min/max are
    cast to string so heterogeneous columns share one schema.
    """
    cols = cols or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count("*").alias(f"{c}__rows"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__distinct"),
            F.min(c).cast("string").alias(f"{c}__min"),
            F.max(c).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    rows = None
    for c in cols:
        row = wide.select(
            F.lit(c).alias("column"),
            F.col(f"{c}__rows").cast("long").alias("n_rows"),
            F.coalesce(F.col(f"{c}__nulls"), F.lit(0)).cast("long")
            .alias("n_nulls"),
            F.col(f"{c}__distinct").cast("long").alias("n_distinct"),
            F.col(f"{c}__min").alias("min_str"),
            F.col(f"{c}__max").alias("max_str"),
        )
        rows = row if rows is None else rows.unionByName(row)
    return rows


def dq_checks(df: DataFrame,
              unique: list[str] | None = None,
              not_null: list[str] | None = None,
              ranges: dict[str, tuple[float, float]] | None = None,
              references: dict[str, tuple[DataFrame, str]] | None = None,
              accepted: dict[str, list[str]] | None = None) -> DataFrame:
    """Declarative data-quality check suite. Returns one row per check:
    (check, column, n_violations, passed).

    - ``unique``: columns that must hold no duplicated value;
      n_violations = rows beyond the first per duplicated key.
    - ``not_null``: columns that must be fully populated.
    - ``ranges``: column -> (lo, hi) inclusive bounds.
    - ``references``: fk column -> (parent df, pk column); violations =
      child rows whose non-null fk has no parent (one LEFT ANTI join).
    - ``accepted``: column -> allowed value list.
    """
    out = []

    def verdict(check: str, column: str, viol: Column) -> DataFrame:
        return df.agg(viol.cast("long").alias("_v")).select(
            F.lit(check).alias("check"), F.lit(column).alias("column"),
            F.coalesce(F.col("_v"), F.lit(0)).alias("n_violations"),
            (F.coalesce(F.col("_v"), F.lit(0)) == 0).alias("passed"))

    for c in (not_null or []):
        out.append(verdict("not_null", c, F.sum(F.col(c).isNull()
                                                .cast("long"))))
    for c, (lo, hi) in (ranges or {}).items():
        bad = (F.col(c).isNotNull()
               & ((F.col(c) < lo) | (F.col(c) > hi))).cast("long")
        out.append(verdict("range", c, F.sum(bad)))
    for c, vals in (accepted or {}).items():
        bad = (F.col(c).isNotNull()
               & ~F.col(c).isin(*vals)).cast("long")
        out.append(verdict("accepted_values", c, F.sum(bad)))
    for c in (unique or []):
        dup = (df.groupBy(c).agg(F.count("*").alias("_n"))
               .agg(F.sum(F.col("_n") - 1).cast("long").alias("_v"))
               .select(F.lit("unique").alias("check"),
                       F.lit(c).alias("column"),
                       F.coalesce(F.col("_v"), F.lit(0))
                       .alias("n_violations"),
                       (F.coalesce(F.col("_v"), F.lit(0)) == 0)
                       .alias("passed")))
        out.append(dup)
    for c, (parent, pk) in (references or {}).items():
        orphans = (df.where(F.col(c).isNotNull())
                   .join(parent.select(F.col(pk).alias(c)).distinct(),
                         c, "left_anti")
                   .agg(F.count("*").cast("long").alias("_v"))
                   .select(F.lit("references").alias("check"),
                           F.lit(c).alias("column"),
                           F.col("_v").alias("n_violations"),
                           (F.col("_v") == 0).alias("passed")))
        out.append(orphans)

    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res
