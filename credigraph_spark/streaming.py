"""Incremental edge ingestion via Structured Streaming.

The reference has NO streaming (SURVEY.md §2.11) — new monthly crawl slices
are merged in batch (tgrag/utils/mergers.py:27-124, union + dedupe). This
module is the Spark-native upgrade of that workflow: new repo-corpus files
landing in a directory are discovered by a parquet file stream, run through
the SAME extraction plan (pandas-UDF reference extraction + explode), and
appended to the edge table exactly once per input file — the stream
checkpoint replaces the reference's ``indices.json`` resume bookkeeping
(construction/pipeline.sh:38-89).

``trigger(availableNow=True)`` makes each invocation drain whatever is new
and stop, which is exactly the monthly-slice cadence; on a live cluster the
same query runs continuously with a processing-time trigger.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
    TimestampType,
)

from credigraph_spark.extraction import extract_edges_named

REPOS_SCHEMA = StructType([
    StructField("repo", StringType()),
    StructField("path", StringType()),
    StructField("commit", StringType()),
    StructField("lang", StringType()),
    StructField("content", StringType()),
])


def stream_extract_edges(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    langs: list[str] | None = None,
    await_termination: bool = True,
):
    """Drain new repo parquet files from ``input_dir`` into the named-edge
    table at ``output_dir``. Per-file exactly-once via the stream
    checkpoint; re-running after a crash resumes where it stopped.

    Note: within one micro-batch, edges are deduped by the extraction plan;
    ACROSS batches the named-edge table may contain duplicates (exactly
    like the reference's per-slice files) — graph build dedupes globally
    (edges_to_ids), so semantics match the batch path.
    """
    stream = spark.readStream.schema(REPOS_SCHEMA).parquet(input_dir)
    edges = extract_edges_named(stream, langs=langs, dedup=False)
    q = (
        edges.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


DOCS_STREAM_SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("text", StringType()),
])


def stream_dedup_docs(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
    ts_col: str = "ts",
    text_col: str = "text",
    await_termination: bool = True,
):
    """Streaming exact dedup with BOUNDED state: new document files are
    content-hashed JVM-side (``sha2``, no UDF) and first-seen-wins deduped
    via ``dropDuplicatesWithinWatermark`` — a duplicate arriving within the
    watermark horizon of its first copy is dropped, while state for hashes
    older than the horizon is evicted. State size therefore tracks the
    dedup horizon, not the corpus: the streaming-scale answer (a plain
    streaming ``dropDuplicates`` keys state on every hash ever seen —
    unbounded at 100 TB). Full-history dedup remains the batch
    ``pipeline.exact_dedup``; this operator keeps the LIVE ingest clean
    between batch compactions. Per-file exactly-once via the stream
    checkpoint, same contract as ``stream_extract_edges``."""
    from pyspark.sql import functions as F

    stream = spark.readStream.schema(DOCS_STREAM_SCHEMA).parquet(input_dir)
    deduped = (
        stream.withColumn("content_sha", F.sha2(F.col(text_col), 256))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_sha"])
    )
    q = (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def windowed_event_counts(events, window: str = "10 minutes",
                          watermark: str = "30 minutes",
                          key_col: str = "event_type", ts_col: str = "ts"):
    """Watermarked tumbling-window counts over a (possibly streaming)
    events table: late rows beyond ``watermark`` are dropped, and in
    append mode a window only emits once the watermark passes its end —
    the standard Structured-Streaming late-data contract. Returns the
    (streaming) DataFrame; caller picks sink/trigger.

    Works identically on a batch DataFrame (watermark is a no-op there),
    so the same plan serves backfill and live ingest."""
    from pyspark.sql import functions as F

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n_events"))
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                key_col, "n_events")
    )


def sessionize_events(events, gap_minutes: int = 30,
                      user_col: str = "user_id", ts_col: str = "ts",
                      close_on_timeout: bool = False):
    """Custom stateful operator via ``applyInPandasWithState``: groups each
    user's events into sessions separated by > ``gap_minutes`` of
    inactivity, emitting (user_id, session_start, session_end, n_events)
    rows as sessions CLOSE (a later event arrives past the gap).

    ``close_on_timeout=True`` additionally closes idle sessions via a
    processing-time timeout — for CONTINUOUS queries only: with
    ``trigger(availableNow=True)`` a pending timeout makes the drain spin
    in state-cleanup batches until wall-clock expiry, so batch-style
    drains keep the default (open sessions simply persist in state until
    the next drain's data closes them).

    This is the engine's demonstration of arbitrary stateful streaming —
    the shape Spark's built-in windowed aggregates can't express (state =
    open session per user, transition on gap). Pandas-batched per group;
    no per-row Python outside the Arrow batch."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap = pd.Timedelta(minutes=gap_minutes)

    def fn(key, pdf_iter, state):
        user = key[0]
        if state.hasTimedOut:
            start, end, n = state.get
            state.remove()
            yield pd.DataFrame({"user_id": [user],
                                "session_start": [pd.Timestamp(start, unit="us")],
                                "session_end": [pd.Timestamp(end, unit="us")],
                                "n_events": [n]})
            return
        ts = pd.concat([pdf[ts_col] for pdf in pdf_iter]).sort_values()
        closed = []
        if state.exists:
            start, end, n = state.get
            start = pd.Timestamp(start, unit="us")
            end = pd.Timestamp(end, unit="us")
        else:
            start = end = ts.iloc[0]
            n = 0
            ts = ts.iloc[0:]
        for t in ts:
            if t - end > gap:
                closed.append((start, end, n))
                start, end, n = t, t, 1
            else:
                end = max(end, t)
                n += 1
        state.update((start.value // 1000, end.value // 1000, int(n)))
        if close_on_timeout:
            state.setTimeoutDuration(gap_minutes * 60 * 1000)
        if closed:
            yield pd.DataFrame({
                "user_id": [user] * len(closed),
                "session_start": [c[0] for c in closed],
                "session_end": [c[1] for c in closed],
                "n_events": [c[2] for c in closed],
            })

    return events.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=("user_id long, session_start timestamp, "
                          "session_end timestamp, n_events long"),
        stateStructType="start long, end long, n long",
        outputMode="append",
        timeoutConf=(GroupStateTimeout.ProcessingTimeTimeout if close_on_timeout
                     else GroupStateTimeout.NoTimeout),
    )


def funnel_events(events, steps: list[str], user_col: str = "user_id",
                  type_col: str = "event_type", ts_col: str = "ts"):
    """Streaming ordered funnel via ``applyInPandasWithState``: per user
    the state is (frontier stage, its timestamp); an arriving event
    advances the frontier when it matches the NEXT step strictly after
    the current stage's time, emitting one (user, step_idx, step,
    stage_ts) progress row per advance. The streaming counterpart of
    temporal.funnel_steps with monotone-advance semantics (events
    arriving out of order across micro-batches cannot retroactively
    improve an earlier stage's time — the standard windowFunnel-style
    streaming approximation; the batch operator is the exact oracle).

    State per user is TWO integers — bounded regardless of stream
    length. Pandas-batched per group; no per-row Python outside the
    Arrow batch."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdf_iter, state):
        user = key[0]
        if state.exists:
            stage, stage_us = state.get
        else:
            stage, stage_us = 0, -1
        pdf = pd.concat(list(pdf_iter)).sort_values(ts_col, kind="stable")
        advances = []
        for etype, ts in zip(pdf[type_col], pdf[ts_col]):
            if stage >= len(steps):
                break
            ts_us = pd.Timestamp(ts).value // 1000
            if etype == steps[stage] and (stage == 0 or ts_us > stage_us):
                stage += 1
                stage_us = ts_us
                advances.append((stage, steps[stage - 1], ts_us))
        state.update((int(stage), int(stage_us)))
        if advances:
            yield pd.DataFrame({
                "user_id": [user] * len(advances),
                "step_idx": [a[0] for a in advances],
                "step": [a[1] for a in advances],
                "stage_ts": [pd.Timestamp(a[2], unit="us")
                             for a in advances],
            })

    return events.groupBy(user_col).applyInPandasWithState(
        fn,
        outputStructType=("user_id long, step_idx long, step string, "
                          "stage_ts timestamp"),
        stateStructType="stage long, ts long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cms_stream(occurrences, term_col: str = "term", depth: int = 4,
               width: int = 512, seed: int = 7):
    """Streaming count-min sketch: the batch grid construction
    (pipeline.sketch.cms_build) run as a NATIVE streaming aggregation —
    depth per-row (row, col) projections unioned, then an incremental
    groupBy count. No custom stateful operator needed: the sketch IS a
    bounded aggregation, so Structured Streaming's state store holds at
    most depth × width keys regardless of stream length or term-universe
    size — the count-min guarantee expressed as a state bound. Hashes
    are the same md5-derived columns as the batch builder, so a drained
    grid is bit-identical to cms_build over the same prefix (the batch
    operator is the exact oracle; cms_estimate reads either grid).

    Emit with outputMode update/complete (it is an aggregation)."""
    from pyspark.sql import functions as F

    from credigraph_spark.pipeline.sketch import _cms_col

    term = F.col(term_col)
    parts = None
    for r in range(depth):
        p = occurrences.select(
            F.lit(r).alias("row"),
            _cms_col(term, r, width, seed).alias("col"))
        parts = p if parts is None else parts.unionByName(p)
    return parts.groupBy("row", "col").agg(F.count("*").alias("cnt"))


def kmv_stream(events, group_col: str = "event_type",
               value_col: str = "user_id", k: int = 8, seed: int = 7):
    """Streaming KMV distinct-count sketch via
    ``applyInPandasWithState``: per group the state is the k smallest
    md5-60-bit hashes of the values seen so far — bounded at k longs
    per group regardless of stream length (the Theta-sketch memory
    guarantee as a state bound). Every micro-batch emits the group's
    refreshed (n_min, kth, kmv_estimate) row in update mode; the hash
    is IDENTICAL to the batch operator (pipeline.sketch.kmv_distinct),
    so a drained estimate over a prefix equals the batch estimate over
    that prefix — the batch operator is the exact oracle.

    Emits in APPEND mode: each micro-batch appends one snapshot row per
    group seen in that batch; n_min and the estimate are monotone
    non-decreasing in the prefix, so the latest snapshot per group is
    simply its max (no per-sink update support needed — parquet sinks
    work). The estimate is exact (=n_min) below k distinct values, else
    (k−1)·2^60 / kth."""
    import hashlib

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    hmax = float(16 ** 15)

    def fn(key, pdf_iter, state):
        grp = key[0]
        minima = list(state.get[0]) if state.exists else []
        have = set(minima)
        for pdf in pdf_iter:
            for v in pdf[value_col]:
                h = int(hashlib.md5(
                    f"{seed}:{v}".encode()).hexdigest()[:15], 16)
                if h not in have:
                    have.add(h)
                    minima.append(h)
        minima = sorted(have)[:k]
        state.update((minima,))
        n_min = len(minima)
        est = (float(n_min) if n_min < k
               else round((k - 1) * hmax / minima[-1], 6))
        yield pd.DataFrame({group_col: [grp], "n_min": [n_min],
                            "kth": [minima[-1] if minima else None],
                            "kmv_estimate": [est]})

    return events.groupBy(group_col).applyInPandasWithState(
        fn,
        outputStructType=(f"{group_col} string, n_min long, kth long, "
                          "kmv_estimate double"),
        stateStructType="minima array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def space_saving_stream(events, group_col: str = "event_type",
                        value_col: str = "user_id", m: int = 4):
    """Streaming space-saving heavy hitters (Metwally et al. 2005) via
    ``applyInPandasWithState`` (X202): per group the state is at most
    ``m`` (item, count, err) counters regardless of stream length — the
    classic bounded-memory top-k guarantee (every item with true
    frequency > N/m is tracked, and count overestimates truth by at
    most err). Arrival order within a micro-batch is the pandas
    iterator order; evictions pick the (count, item) lexicographic
    minimum so a same-order replay is bit-identical — the pytest oracle
    is a pure-Python replay of the same rule.

    Emits in APPEND mode: each micro-batch appends the group's full
    refreshed counter table plus the monotone n_seen prefix size, so
    the latest snapshot per group is the max-n_seen batch (parquet
    sinks work; no update-mode sink needed).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdf_iter, state):
        grp = key[0]
        if state.exists:
            items, counts, errs, n_seen = state.get
            table = {i: [c, e] for i, c, e in zip(items, counts, errs)}
            n_seen = int(n_seen)
        else:
            table, n_seen = {}, 0
        for pdf in pdf_iter:
            for v in pdf[value_col]:
                x = str(v)
                n_seen += 1
                if x in table:
                    table[x][0] += 1
                elif len(table) < m:
                    table[x] = [1, 0]
                else:
                    victim = min(table, key=lambda i: (table[i][0], i))
                    c_min = table.pop(victim)[0]
                    table[x] = [c_min + 1, c_min]
        items = sorted(table)
        state.update((items,
                      [table[i][0] for i in items],
                      [table[i][1] for i in items],
                      n_seen))
        yield pd.DataFrame({
            group_col: [grp] * len(items),
            "item": items,
            "count": [table[i][0] for i in items],
            "err": [table[i][1] for i in items],
            "n_seen": [n_seen] * len(items),
        })

    return events.groupBy(group_col).applyInPandasWithState(
        fn,
        outputStructType=(f"{group_col} string, item string, count long, "
                          "err long, n_seen long"),
        stateStructType=("items array<string>, counts array<long>, "
                         "errs array<long>, n_seen long"),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


EVENTS_STREAM_SCHEMA = StructType([
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("user_id", LongType()),
    StructField("event_type", StringType()),
    StructField("value", DoubleType()),
])


def stream_enrich_events(
    spark: SparkSession,
    input_dir: str,
    scores,
    output_dir: str,
    checkpoint_dir: str,
    await_termination: bool = True,
):
    """Stream-static enrichment — the serving-path pattern: a stream of
    event files joined against a STATIC dimension (per-user scores, a
    PageRank snapshot, a blocklist) with a broadcast hash join, so the
    stream side never shuffles. Missing users carry the −1.0 sentinel
    (the J4 score-join convention). Per-file exactly-once via the
    stream checkpoint; the static side is pinned at query start — to
    roll a new snapshot, restart the query (the standard stream-static
    contract, vs a stream-stream join's watermark machinery).

    ``scores``: static DataFrame (user_id, score). Output columns:
    event_id, user_id, event_type, ts, score."""
    from pyspark.sql import functions as F

    stream = spark.readStream.schema(EVENTS_STREAM_SCHEMA).parquet(input_dir)
    enriched = (
        stream.join(F.broadcast(scores.select("user_id", "score")),
                    "user_id", "left")
        .select("event_id", "user_id", "event_type", "ts",
                F.coalesce("score", F.lit(-1.0)).alias("score"))
    )
    q = (
        enriched.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    if await_termination:
        q.awaitTermination()
    return q


def stream_stream_interval_join(clicks, purchases, key_col: str = "user_id",
                                window_minutes: int = 30,
                                watermark: str = "2 hours"):
    """Stream-STREAM interval join with watermarks (X214) — the second
    half of the Structured-Streaming join surface (X193 covered
    stream-static): each purchase joins the same user's clicks from the
    preceding ``window_minutes``. Both sides carry event-time
    watermarks, which is what lets Spark BOUND the join state — click
    state older than the watermark minus the interval is dropped, so
    state never grows with stream length (the stream-stream analog of
    the bounded-state sketches).

    Inner join ⇒ results equal the batch interval join over the same
    prefix once drained (availableNow) — the batch operator is the
    exact oracle in pytest.

    Returns (user, click_id, click_ts, purchase_id, purchase_ts).
    """
    from pyspark.sql import functions as F

    c = (clicks.withWatermark("ts", watermark)
         .select(F.col(key_col).alias("user"),
                 F.col("event_id").alias("click_id"),
                 F.col("ts").alias("click_ts")))
    p = (purchases.withWatermark("ts", watermark)
         .select(F.col(key_col).alias("p_user"),
                 F.col("event_id").alias("purchase_id"),
                 F.col("ts").alias("purchase_ts")))
    cond = (
        (c["user"] == p["p_user"])
        & (p["purchase_ts"] >= c["click_ts"])
        & (p["purchase_ts"] <= c["click_ts"]
           + F.expr(f"INTERVAL {int(window_minutes)} MINUTES"))
    )
    return (c.join(p, cond, "inner")
            .select("user", "click_id", "click_ts", "purchase_id",
                    "purchase_ts"))
