"""Incremental streaming ingest: per-file exactly-once + resume."""

from __future__ import annotations

import pytest

from credigraph_spark import corpus
from credigraph_spark.streaming import stream_extract_edges


def test_stream_extract_exactly_once(spark, tmp_path):
    inp = str(tmp_path / "repos_in")
    out = str(tmp_path / "edges_out")
    ckpt = str(tmp_path / "ckpt")

    # slice 1 lands
    pdf1 = corpus.repos_pdf(seed=1, n_repos=20, files_per_repo=1)
    spark.createDataFrame(pdf1).coalesce(1).write.mode("append").parquet(inp)
    stream_extract_edges(spark, inp, out, ckpt)
    n1 = spark.read.parquet(out).count()
    expect1 = sum(len(corpus._targets_for(1, i, 0, 20)) for i in range(20))
    assert n1 == expect1

    # re-run with nothing new: checkpoint prevents reprocessing
    stream_extract_edges(spark, inp, out, ckpt)
    assert spark.read.parquet(out).count() == n1

    # slice 2 lands (different seed -> different rows); only the delta is read
    pdf2 = corpus.repos_pdf(seed=2, n_repos=20, files_per_repo=1)
    spark.createDataFrame(pdf2).coalesce(1).write.mode("append").parquet(inp)
    stream_extract_edges(spark, inp, out, ckpt)
    n2 = spark.read.parquet(out).count()
    expect2 = sum(len(corpus._targets_for(2, i, 0, 20)) for i in range(20))
    assert n2 == expect1 + expect2


def test_stream_dedup_docs_bounded_state(spark, tmp_path):
    """First-seen-wins within the watermark horizon; duplicates across
    files AND across drains are dropped; per-file exactly-once holds."""
    import datetime as dt

    from credigraph_spark.streaming import stream_dedup_docs

    inp = str(tmp_path / "docs_in")
    out = str(tmp_path / "docs_out")
    ckpt = str(tmp_path / "sckpt")
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)

    def write_slice(rows):
        spark.createDataFrame(rows, "doc_id long, ts timestamp, text string") \
             .coalesce(1).write.mode("append").parquet(inp)

    # slice 1: 3 uniques, one in-file duplicate
    write_slice([(1, t0, "alpha"), (2, t0, "beta"),
                 (3, t0, "alpha"), (4, t0, "gamma")])
    stream_dedup_docs(spark, inp, out, ckpt, watermark="1 hour")
    got = spark.read.parquet(out)
    assert got.count() == 3
    assert {r["text"] for r in got.collect()} == {"alpha", "beta", "gamma"}

    # slice 2: one cross-drain duplicate (within horizon) + one new doc
    write_slice([(5, t0 + dt.timedelta(minutes=10), "beta"),
                 (6, t0 + dt.timedelta(minutes=10), "delta")])
    stream_dedup_docs(spark, inp, out, ckpt, watermark="1 hour")
    got = {r["text"] for r in spark.read.parquet(out).collect()}
    assert got == {"alpha", "beta", "gamma", "delta"}

    # re-drain with nothing new: exactly-once
    stream_dedup_docs(spark, inp, out, ckpt, watermark="1 hour")
    assert spark.read.parquet(out).count() == 4


def test_windowed_event_counts_batch_and_late_drop(spark, tmp_path):
    """Watermarked tumbling windows: batch semantics match a hand count;
    in streaming, a row later than the watermark is DROPPED while an
    in-order row is counted."""
    import datetime as dt

    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType, TimestampType)

    from credigraph_spark.streaming import windowed_event_counts

    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)

    def ev(minute, etype="click", uid=1):
        return (uid, etype, t0 + dt.timedelta(minutes=minute))

    schema = StructType([
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("ts", TimestampType()),
    ])

    # batch path: same plan, watermark a no-op
    batch = spark.createDataFrame([ev(1), ev(2), ev(11), ev(1, "view")], schema)
    got = {(r["window_start"].minute, r["event_type"]): r["n_events"]
           for r in windowed_event_counts(batch, window="10 minutes").collect()}
    assert got == {(0, "click"): 2, (0, "view"): 1, (10, "click"): 1}

    # streaming path: two drains sharing one checkpoint — the watermark
    # survives the restart (it is committed with the offsets), so drain 1
    # (max ts 120min - 30min = 90min) makes drain 2 drop the 10min-old
    # straggler while keeping the late-but-allowed 95min row.
    inp, out, ckpt = (str(tmp_path / d) for d in ("ev_in", "ev_out", "ev_ck"))

    def drain():
        stream = spark.readStream.schema(schema).parquet(inp)
        q = (windowed_event_counts(stream, window="10 minutes", watermark="30 minutes")
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()

    spark.createDataFrame([ev(1), ev(2), ev(120)], schema) \
        .coalesce(1).write.mode("append").parquet(inp)
    drain()
    spark.createDataFrame([ev(10), ev(95), ev(240)], schema) \
        .coalesce(1).write.mode("append").parquet(inp)
    drain()
    rows = {(r["window_start"].hour, r["window_start"].minute): r["n_events"]
            for r in spark.read.parquet(out).collect()}
    # flushed windows (end <= final watermark 240-30=210min): 9:00 window
    # has ONLY the 2 in-order clicks — the minute-10 straggler arrived
    # after the watermark passed and was dropped; the 95-minute row was
    # late-but-allowed and counted.
    assert rows[(9, 0)] == 2
    assert rows[(10, 30)] == 1       # minute-95 row
    assert rows[(11, 0)] == 1        # minute-120 row
    assert (9, 10) not in rows       # straggler window never materialized


def test_sessionize_events_stateful(spark, tmp_path):
    """applyInPandasWithState sessionizer: a >gap inactivity break closes
    a session and emits it; the trailing open session stays in state."""
    import datetime as dt

    from pyspark.sql.types import (LongType, StructField, StructType,
                                   TimestampType)

    from credigraph_spark.streaming import sessionize_events

    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)
    schema = StructType([
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
    ])
    rows = [
        (1, t0), (1, t0 + dt.timedelta(minutes=5)),                 # session A
        (1, t0 + dt.timedelta(hours=2)),                            # session B (open)
        (2, t0), (2, t0 + dt.timedelta(minutes=10)),
        (2, t0 + dt.timedelta(hours=3)),                            # closes user-2 A
    ]
    inp, out, ckpt = (str(tmp_path / d) for d in ("s_in", "s_out", "s_ck"))
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(inp)

    stream = spark.readStream.schema(schema).parquet(inp)
    q = (sessionize_events(stream, gap_minutes=30)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r["user_id"], r["session_start"].hour, r["n_events"])
           for r in spark.read.parquet(out).collect()}
    # closed sessions only: user 1 (2 events, 9:00-9:05), user 2 (2 events)
    assert got == {(1, 9, 2), (2, 9, 2)}


def test_funnel_events_stateful(spark, tmp_path):
    """Streaming funnel: advances emit progress rows across micro-batches;
    an out-of-order earlier stage can't fire after the frontier passed,
    and state survives between drains (two input files, two drains)."""
    import datetime as dt

    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType, TimestampType)

    from credigraph_spark.streaming import funnel_events

    t0 = dt.datetime(2024, 1, 1, 9, 0, 0)
    schema = StructType([
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("ts", TimestampType()),
    ])
    inp, out, ckpt = (str(tmp_path / d) for d in ("f_in", "f_out", "f_ck"))
    steps = ["view", "click", "purchase"]

    # drain 1: u1 view+click; u2 click only (no view yet -> no advance)
    rows1 = [(1, "view", t0), (1, "click", t0 + dt.timedelta(minutes=1)),
             (2, "click", t0)]
    spark.createDataFrame(rows1, schema).coalesce(1) \
         .write.mode("append").parquet(inp)

    def drain():
        stream = spark.readStream.schema(schema).parquet(inp)
        q = (funnel_events(stream, steps)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        return {(r["user_id"], r["step_idx"], r["step"])
                for r in spark.read.parquet(out).collect()}

    got = drain()
    assert got == {(1, 1, "view"), (1, 2, "click")}

    # drain 2: u1 purchases (advance to 3); u2's LATE view is before its
    # already-seen click, but the frontier only moves forward — the view
    # advances stage 1, the old click does NOT retroactively count
    rows2 = [(1, "purchase", t0 + dt.timedelta(minutes=5)),
             (2, "view", t0 + dt.timedelta(minutes=2))]
    spark.createDataFrame(rows2, schema).coalesce(1) \
         .write.mode("append").parquet(inp)
    got = drain()
    assert got == {(1, 1, "view"), (1, 2, "click"), (1, 3, "purchase"),
                   (2, 1, "view")}


def test_cms_stream_matches_batch_grid(spark, tmp_path):
    """Streaming CMS: the drained grid is bit-identical to the batch
    cms_build over the full prefix after EVERY drain (state carries
    across micro-batches; at most depth*width state keys)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StringType, StructField, StructType

    from credigraph_spark.pipeline.sketch import cms_build, cms_estimate
    from credigraph_spark.streaming import cms_stream

    schema = StructType([StructField("term", StringType())])
    inp, ckpt = (str(tmp_path / d) for d in ("c_in", "c_ck"))
    depth, width = 3, 16

    seen: list[list] = []

    def drain():
        stream = spark.readStream.schema(schema).parquet(inp)
        q = (cms_stream(stream, depth=depth, width=width)
             .writeStream.format("memory").queryName("cmsgrid")
             .option("checkpointLocation", ckpt)
             .outputMode("complete").trigger(availableNow=True).start())
        q.awaitTermination()
        got = {(r.row, r.col): r.cnt
               for r in spark.sql("SELECT * FROM cmsgrid").collect()}
        batch = spark.createDataFrame([(t,) for t in seen], schema)
        want = {(r.row, r.col): r.cnt
                for r in cms_build(batch, depth=depth,
                                   width=width).collect()}
        assert got == want
        return got

    rows1 = ["a", "b", "a", "c", "a"]
    seen.extend(rows1)
    spark.createDataFrame([(t,) for t in rows1], schema).coalesce(1) \
         .write.mode("append").parquet(inp)
    drain()

    rows2 = ["b", "a", "d"] * 4
    seen.extend(rows2)
    spark.createDataFrame([(t,) for t in rows2], schema).coalesce(1) \
         .write.mode("append").parquet(inp)
    grid = drain()
    assert len(grid) <= depth * width  # the state bound
    # the drained grid serves point estimates through the batch reader
    est = {r.term: r.cms_n for r in cms_estimate(
        spark.createDataFrame(grid.items(), "k struct<row:long,col:long>, cnt long")
        .select(F.col("k.row").alias("row"), F.col("k.col").alias("col"),
                "cnt"),
        spark.createDataFrame([("a",), ("d",), ("zz",)], schema),
        depth=depth, width=width).collect()}
    assert est["a"] >= 6 and est["d"] >= 4 and est["zz"] >= 0


def test_kmv_stream_matches_batch(spark, tmp_path):
    """Streaming KMV: after every drain the per-group estimate equals
    the batch kmv_distinct over the full prefix; state is bounded at k
    hashes per group and survives across drains."""
    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    from credigraph_spark.pipeline.sketch import kmv_distinct
    from credigraph_spark.streaming import kmv_stream

    schema = StructType([StructField("event_type", StringType()),
                         StructField("user_id", LongType())])
    inp, ckpt = (str(tmp_path / d) for d in ("k_in", "k_ck"))
    k = 4
    seen: list[tuple] = []

    out = str(tmp_path / "k_out")

    def drain():
        stream = spark.readStream.schema(schema).parquet(inp)
        q = (kmv_stream(stream, k=k)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        got: dict = {}
        for r in spark.read.parquet(out).collect():
            cur = got.get(r.event_type)
            cand = (r.n_min, r.kmv_estimate)
            if cur is None or cand > cur:
                got[r.event_type] = cand  # snapshots are monotone
        batch = {r.event_type: (r.kmv_estimate,) for r in kmv_distinct(
            spark.createDataFrame(seen, schema), ["event_type"],
            "user_id", k=k).collect()}
        for g, (n_min, est) in got.items():
            assert n_min <= k
            assert est == pytest.approx(batch[g][0], abs=1e-6), g
        return got

    rows1 = [("click", i) for i in (1, 2, 3)] + [("view", 1)]
    seen.extend(rows1)
    spark.createDataFrame(rows1, schema).coalesce(1) \
         .write.mode("append").parquet(inp)
    g1 = drain()
    assert g1["click"][0] == 3  # exact below k

    # second drain pushes 'click' past k distinct users (estimate path)
    rows2 = [("click", i) for i in range(10, 40)] + [("view", 2)]
    seen.extend(rows2)
    spark.createDataFrame(rows2, schema).coalesce(1) \
         .write.mode("append").parquet(inp)
    g2 = drain()
    assert g2["click"][0] == k  # state bound


def test_stream_enrich_events_broadcast_static(spark, tmp_path):
    import datetime as dt

    from credigraph_spark.streaming import stream_enrich_events

    inp = str(tmp_path / "events_in")
    out = str(tmp_path / "enriched_out")
    ckpt = str(tmp_path / "ckpt_enrich")
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [(i, t0, i % 4, "view", 1.0) for i in range(20)]
    spark.createDataFrame(
        rows, "event_id LONG, ts TIMESTAMP, user_id LONG, "
              "event_type STRING, value DOUBLE") \
        .coalesce(1).write.mode("append").parquet(inp)
    scores = spark.createDataFrame(
        [(0, 0.25), (1, 0.5), (2, 0.75)], "user_id LONG, score DOUBLE")

    stream_enrich_events(spark, inp, scores, out, ckpt)
    got = {r.event_id: r.score for r in spark.read.parquet(out).collect()}
    assert len(got) == 20
    for eid, score in got.items():
        uid = eid % 4
        assert score == {0: 0.25, 1: 0.5, 2: 0.75}.get(uid, -1.0)

    # exactly-once: a re-run with no new files appends nothing
    stream_enrich_events(spark, inp, scores, out, ckpt)
    assert spark.read.parquet(out).count() == 20

    # a second slice drains only the delta
    rows2 = [(100 + i, t0, 3, "buy", 2.0) for i in range(5)]
    spark.createDataFrame(
        rows2, "event_id LONG, ts TIMESTAMP, user_id LONG, "
               "event_type STRING, value DOUBLE") \
        .coalesce(1).write.mode("append").parquet(inp)
    stream_enrich_events(spark, inp, scores, out, ckpt)
    df = spark.read.parquet(out)
    assert df.count() == 25
    # all delta rows carry the missing-user sentinel
    assert df.where("event_id >= 100").where("score != -1.0").count() == 0


def test_space_saving_stream_matches_python_replay(spark, tmp_path):
    """Streaming space-saving: bounded m-counter state; after each
    drain the latest snapshot equals a pure-Python replay of the same
    (count, item)-min eviction rule over the same arrival order, and
    state carries across drains."""
    from pyspark.sql.types import StringType, StructField, StructType

    from credigraph_spark.streaming import space_saving_stream

    schema = StructType([StructField("event_type", StringType()),
                         StructField("user_id", StringType())])
    inp, ckpt, out = (str(tmp_path / d) for d in ("s_in", "s_ck", "s_out"))
    m = 3

    def replay(rows, table, n_seen):
        for x in rows:
            n_seen += 1
            if x in table:
                table[x][0] += 1
            elif len(table) < m:
                table[x] = [1, 0]
            else:
                victim = min(table, key=lambda i: (table[i][0], i))
                c_min = table.pop(victim)[0]
                table[x] = [c_min + 1, c_min]
        return table, n_seen

    def drain():
        stream = spark.readStream.schema(schema).parquet(inp)
        q = (space_saving_stream(stream, m=m)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        rows = spark.read.parquet(out).collect()
        latest = max(r.n_seen for r in rows)
        return {r.item: (r["count"], r.err) for r in rows
                if r.n_seen == latest}

    batch1 = ["a", "a", "b", "c", "a", "d", "d"]  # d evicts the min
    spark.createDataFrame([("g", x) for x in batch1], schema) \
        .coalesce(1).write.mode("append").parquet(inp)
    table, n = replay(batch1, {}, 0)
    got = drain()
    assert got == {i: tuple(v) for i, v in table.items()}
    assert len(got) <= m

    batch2 = ["e", "e", "e", "a"]  # state persists across drains
    spark.createDataFrame([("g", x) for x in batch2], schema) \
        .coalesce(1).write.mode("append").parquet(inp)
    table, n = replay(batch2, table, n)
    got = drain()
    assert got == {i: tuple(v) for i, v in table.items()}
    assert len(got) <= m


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    """Stream-stream interval join with watermarks: after an
    availableNow drain the inner-join results equal the batch interval
    join over the same prefix; a second drain joins ACROSS drains
    (click from drain 1, purchase from drain 2)."""
    import datetime as dt

    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType, TimestampType)

    from credigraph_spark.streaming import stream_stream_interval_join

    schema = StructType([StructField("user_id", LongType()),
                         StructField("ts", TimestampType()),
                         StructField("event_id", LongType()),
                         StructField("event_type", StringType())])
    cin, pin, ckpt, out = (str(tmp_path / d)
                           for d in ("c_in", "p_in", "ss_ck", "ss_out"))

    def t(minute):
        return dt.datetime(2024, 3, 1, 10, minute)

    clicks1 = [(1, t(0), 101, "click"), (1, t(5), 102, "click"),
               (2, t(0), 103, "click")]
    purch1 = [(1, t(20), 201, "purchase"),   # joins 101 and 102
              (2, t(45), 202, "purchase")]   # 45m > 30m window: no join
    spark.createDataFrame(clicks1, schema).coalesce(1) \
        .write.mode("append").parquet(cin)
    spark.createDataFrame(purch1, schema).coalesce(1) \
        .write.mode("append").parquet(pin)

    def drain():
        cs = spark.readStream.schema(schema).parquet(cin)
        ps = spark.readStream.schema(schema).parquet(pin)
        q = (stream_stream_interval_join(cs, ps, window_minutes=30)
             .writeStream.format("parquet").option("path", out)
             .option("checkpointLocation", ckpt)
             .outputMode("append").trigger(availableNow=True).start())
        q.awaitTermination()
        return {(r.user, r.click_id, r.purchase_id)
                for r in spark.read.parquet(out).collect()}

    got = drain()
    assert got == {(1, 101, 201), (1, 102, 201)}

    # drain 2: purchase arriving later joins a drain-1 click
    purch2 = [(2, t(25), 203, "purchase")]   # joins click 103 (25m)
    spark.createDataFrame(purch2, schema).coalesce(1) \
        .write.mode("append").parquet(pin)
    got = drain()
    assert (2, 103, 203) in got
    assert got == {(1, 101, 201), (1, 102, 201), (2, 103, 203)}
