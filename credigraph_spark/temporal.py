"""Temporal (snapshot-versioned) graph utilities.

The reference's "temporal" model is monthly crawl snapshots, not event
time (SURVEY.md §1.1.4): vertices ``domain,ts,in_deg,out_deg``
(tgrag/utils/writers.py:114), edges ``src,dst,ts``
(tgrag/construct_graph_scripts/process.py:214-217), where ``ts`` is the
``YYYYMMDD`` of the ISO-week Monday of the crawl slice
(tgrag/utils/temporal_utils.py:6-24). Multi-month graphs are unions of
per-slice tables deduped across months (tgrag/utils/mergers.py:27-124).
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, functions as F


def crawl_slice_ts(crawl_id: str) -> str:
    """``CC-MAIN-YYYY-WW`` -> Monday of that ISO week as ``YYYYMMDD``
    (temporal_utils.py:6-24). Plan-time Python — the slice id is a scalar."""
    parts = crawl_id.split("-")
    year, week = int(parts[-2]), int(parts[-1])
    monday = datetime.date.fromisocalendar(year, week, 1)
    return monday.strftime("%Y%m%d")


def stamp_ts(df: DataFrame, crawl_id: str) -> DataFrame:
    """Attach the slice timestamp column (process.py:212-217)."""
    return df.withColumn("ts", F.lit(crawl_slice_ts(crawl_id)))


def merge_edge_slices(slices: list[DataFrame], dedup_within_ts: bool = True) -> DataFrame:
    """U5: union per-slice edge tables ``(src,dst,ts)``; dedupe (src,dst,ts)
    (mergers.py:27-124 semantics — an edge may recur across months, never
    within one)."""
    out = slices[0]
    for s in slices[1:]:
        out = out.unionByName(s)
    if dedup_within_ts:
        out = out.dropDuplicates(["src", "dst", "ts"])
    return out


def merge_vertex_slices(slices: list[DataFrame]) -> DataFrame:
    """Union per-slice vertex tables ``(vid, ts, in_deg, out_deg)`` keyed
    by (vid, ts) — keep-FIRST-slice deterministically on duplicates.

    ``dropDuplicates`` keeps an arbitrary row, so conflicting rows for the
    same key would survive nondeterministically across runs/partitionings;
    instead each slice is stamped with its argument position and the min
    struct (slice_idx, values...) is kept — a plain partial-aggregatable
    aggregation, and fully deterministic (within-slice duplicates tie-break
    by value)."""
    key = slices[0].columns[0]
    value_cols = [c for c in slices[0].columns if c not in (key, "ts")]
    out = slices[0].withColumn("_slice", F.lit(0))
    for i, s in enumerate(slices[1:], start=1):
        out = out.unionByName(s.withColumn("_slice", F.lit(i)))
    packed = out.groupBy(key, "ts").agg(
        F.min(F.struct("_slice", *[F.col(c) for c in value_cols])).alias("m")
    )
    return packed.select(
        *[F.col(f"m.{c}").alias(c) if c in value_cols else F.col(c)
          for c in slices[0].columns]
    )


def snapshot_diff(old: DataFrame, new: DataFrame,
                  keys: tuple[str, ...] = ("src", "dst")) -> DataFrame:
    """Keyed diff of two snapshots: one row per key present in either,
    with status 'added' (new only), 'removed' (old only) or 'kept'
    (both). The incremental-refresh primitive for monthly crawl slices —
    a crawl-over-crawl edge churn report is one full-outer join, hash-
    partitioned on the key columns (co-partitioned with the dedup shuffle
    the slices already have at scale)."""
    o = old.select(*keys).dropDuplicates(list(keys)).withColumn("_o", F.lit(True))
    n = new.select(*keys).dropDuplicates(list(keys)).withColumn("_n", F.lit(True))
    joined = o.join(n, list(keys), "full")
    status = (
        F.when(F.col("_o").isNull(), F.lit("added"))
        .when(F.col("_n").isNull(), F.lit("removed"))
        .otherwise(F.lit("kept"))
    )
    return joined.select(*keys, status.alias("status"))


def latest_snapshot(df: DataFrame, key: str = "vid") -> DataFrame:
    """Most recent slice row per key (max ts), via max_by-style struct max
    (aggregation, not a window — partial-aggregatable)."""
    value_cols = [c for c in df.columns if c not in (key, "ts")]
    packed = df.groupBy(key).agg(
        F.max(F.struct(F.col("ts"), *[F.col(c) for c in value_cols])).alias("m")
    )
    return packed.select(key, F.col("m.ts").alias("ts"),
                         *[F.col(f"m.{c}").alias(c) for c in value_cols])

def event_transition_graph(events: DataFrame, user_col: str = "user_id",
                           ts_col: str = "ts", type_col: str = "event_type",
                           order_tiebreak: str = "event_id") -> DataFrame:
    """(src_type, dst_type, n_transitions, prob) — the first-order Markov
    transition graph of an event stream: per user, events ordered by
    (ts, tiebreak) yield consecutive (type -> next type) pairs, counted
    across all users; ``prob`` normalizes each source type's outgoing
    row. The standard sessionized click-path -> graph step of a behavior
    pipeline (and another producer for the engine's graph operators).

    Scale shape: ONE window partitioned by user (bounded by a user's
    event count, never the corpus) for the LEAD, then a partial-
    aggregatable pair count; the probability join is against the tiny
    per-source-type totals (broadcast). Counts are integers, prob is one
    int/int division — both engines agree bit-exactly."""
    from pyspark.sql import Window

    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    pairs = (
        events.select(
            F.col(type_col).alias("src_type"),
            F.lead(type_col).over(w).alias("dst_type"))
        .where(F.col("dst_type").isNotNull())
        .groupBy("src_type", "dst_type")
        .agg(F.count("*").alias("n_transitions"))
    )
    totals = pairs.groupBy("src_type").agg(
        F.sum("n_transitions").alias("tot"))
    return (
        pairs.join(F.broadcast(totals), "src_type")
        .select("src_type", "dst_type", "n_transitions",
                (F.col("n_transitions") / F.col("tot")).alias("prob"))
    )
