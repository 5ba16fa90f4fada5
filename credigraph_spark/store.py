"""Bucketed edge store: pay the partitioning shuffle ONCE at write time.

At 100 TB every analytics run over a snapshot's edge table starts by
hash-partitioning ~|E| rows. When the same snapshot is queried repeatedly
(degree analytics, triangles, ad-hoc SQL, repeated algorithm runs), that
shuffle is pure waste: bucketing the table by ``src`` at write time bakes
``HashPartitioning(src, n)`` into the files, and every later
``groupBy("src")`` / src-keyed join / src-src self-join reads it
exchange-free (Catalyst sees the bucketed scan's output partitioning and
drops the Exchange — verified in tests and PLANS.md).

The iterative algorithms keep their own per-run cached repartition (their
supersteps reuse it dozens of times, so one exchange amortizes); the
store layer serves everything that reads the snapshot cold.

Tables are written as EXTERNAL bucketed parquet (explicit ``path``), so
no Hive metastore or warehouse dir is involved — the in-memory catalog
carries the bucket spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_edges(edges: DataFrame, name: str, path: str,
                         buckets: int = 32) -> None:
    """Write (src, dst) edges as a bucketed+sorted external parquet table.
    ``buckets`` should match the analytics session's
    ``spark.sql.shuffle.partitions`` so downstream aggregations align."""
    spark = edges.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        edges.select("src", "dst")
        .write.bucketBy(buckets, "src").sortBy("src", "dst")
        .option("path", path)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(name)
    )


def read_edges(spark: SparkSession, name: str) -> DataFrame:
    """Bucketed scan: output partitioning is HashPartitioning(src, n)."""
    return spark.table(name)


def zorder_key(df, cols: list[str], bits: int = 10,
               out_col: str = "z"):
    """Z-order (Morton) interleaved sort key over ``cols`` — the
    multi-dimensional data-clustering primitive behind lakehouse
    OPTIMIZE ZORDER: writing files in z order makes min/max file stats
    selective on EVERY keyed column at once, so point/range predicates
    on any of them skip files (a single-column sort only skips on that
    column).

    Each column is min/max-scaled to a 2^bits integer bucket with exact
    integer arithmetic (bucket = (x − min)·2^bits DIV (max − min + 1)),
    then the buckets' bits are interleaved column-major (col 0 owns the
    highest bit of each group). Pure per-row expressions over ONE
    broadcast 1-row min/max aggregate — no shuffle; compose with
    repartitionByRange(out_col) + sortWithinPartitions(out_col) at
    write time.

    Returns df with ``out_col`` appended."""
    from pyspark.sql import functions as F

    n = len(cols)
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"_mn_{c}"), F.max(c).alias(f"_mx_{c}")]
    mm = df.agg(*aggs)
    out = df.crossJoin(F.broadcast(mm))
    z = F.lit(0).cast("long")
    for idx, c in enumerate(cols):
        bucket = (f"(cast(({c} - _mn_{c}) as long) "
                  f"* shiftleft(1L, {bits})) DIV "
                  f"(cast(_mx_{c} as long) - cast(_mn_{c} as long) + 1)")
        # bit j of this column lands at position j*n + (n-1-idx)
        z = z + F.expr(
            f"aggregate(sequence(0, {bits - 1}), 0L, (acc, j) -> "
            f"acc + shiftleft((({bucket}) >> j) & 1L, "
            f"cast(j * {n} + {n - 1 - idx} as int)))")
    drops = [f"_mn_{c}" for c in cols] + [f"_mx_{c}" for c in cols]
    return out.withColumn(out_col, z).drop(*drops)


def partition_quality(edges: DataFrame, k: int = 8) -> DataFrame:
    """Partitioning-strategy quality report (X211) — the infra audit
    behind every 'partition the graph across 1000 executors' decision:
    for hash (md5 mod k) and equal-width range placement of vertices,
    report the EDGE CUT (fraction of edges whose endpoints land on
    different partitions — each cut edge is cross-node traffic in every
    superstep) and the load balance (max/min vertices per partition).
    Hash placement balances load but cuts ~ (k-1)/k of edges; range
    placement preserves id locality — this operator quantifies that
    trade-off on the actual graph instead of folklore.

    Returns one row per strategy: (strategy, k, n_vertices, n_edges,
    n_cut, cut_frac, max_load, min_load).

    Scale shape: both placements are PURE per-row expressions of the
    vid (hash needs nothing; range needs a broadcast 1-row min/max), so
    the cut count is a single conditional aggregate over the edge scan
    — no joins, no shuffle beyond the tiny rollups.
    """
    from pyspark.sql import functions as F

    from credigraph_spark.graph.adjacency import clean_edges

    e = clean_edges(edges).persist()
    verts = (e.select(F.col("src").alias("vid"))
             .unionByName(e.select(F.col("dst").alias("vid")))
             .distinct())

    def hash_bucket(c):
        return F.pmod(
            F.conv(F.substring(F.md5(F.col(c).cast("string")), 1, 15),
                   16, 10).cast("long"), F.lit(k))

    mm = verts.agg(F.min("vid").alias("mn"), F.max("vid").alias("mx"))

    def range_bucket(c):
        return F.least(
            F.floor((F.col(c) - F.col("mn")) * k
                    / (F.col("mx") - F.col("mn") + 1)).cast("long"),
            F.lit(k - 1))

    rows = None
    for strategy in ("hash", "range"):
        if strategy == "hash":
            ec = e
            vc = verts
            b = hash_bucket
        else:
            ec = e.crossJoin(F.broadcast(mm))
            vc = verts.crossJoin(F.broadcast(mm))
            b = range_bucket
        cut = ec.agg(
            F.count("*").cast("long").alias("n_edges"),
            F.sum((b("src") != b("dst")).cast("long")).cast("long")
            .alias("n_cut"))
        loads = (vc.groupBy(b("vid").alias("_b"))
                 .agg(F.count("*").alias("_l"))
                 .agg(F.count("*").cast("long").alias("_nb"),
                      F.max("_l").cast("long").alias("max_load"),
                      F.min("_l").cast("long").alias("min_load")))
        nv = verts.agg(F.count("*").cast("long").alias("n_vertices"))
        row = (cut.crossJoin(loads).crossJoin(nv)
               .select(F.lit(strategy).alias("strategy"),
                       F.lit(int(k)).cast("long").alias("k"),
                       "n_vertices", "n_edges", "n_cut",
                       F.round(F.col("n_cut") / F.col("n_edges"), 6)
                       .alias("cut_frac"),
                       "max_load", "min_load"))
        rows = row if rows is None else rows.unionByName(row)
    return rows


def file_skipping_audit(df: DataFrame, cols: list[str], n_files: int = 16,
                        bits: int = 8, n_probes: int = 9,
                        round_digits: int = 6) -> DataFrame:
    """File-skipping effectiveness audit (X228) — MEASURES the zone-map
    claim X191's zorder_key makes: lay the table out into ``n_files``
    files two ways (sorted by ``cols[0]``; z-ordered over both), build
    per-file min/max zone maps, then probe each column with
    ``n_probes`` equally-spaced point predicates and report how many
    file reads the zone maps prune and what fraction of ROWS a scan
    still touches. A single-column sort prunes only its own column;
    z-order prunes on both — this returns the actual numbers for the
    actual data instead of the folklore.

    Returns one row per (layout, probe_col): (layout, probe_col,
    n_files, n_probes, n_skipped, skip_frac, rows_scanned, scan_frac).

    Scale shape: file placement is a pure per-row expression over ONE
    broadcast min/max row (equal-width on the layout key — what a
    range-partitioned write produces); the zone maps are one
    map-side-combinable groupBy down to ≤ 2·n_files rows, and the
    probe evaluation runs on that tiny table crossed with 2·n_probes
    literal probes. Integer arithmetic end-to-end; the two fractions
    are final rounded divisions.
    """
    from pyspark.sql import functions as F

    c1, c2 = cols
    mm = df.agg(F.min(c1).alias("_mn1"), F.max(c1).alias("_mx1"),
                F.min(c2).alias("_mn2"), F.max(c2).alias("_mx2"))
    base = (df.select(F.col(c1).cast("long").alias("_c1"),
                      F.col(c2).cast("long").alias("_c2"))
            .where("_c1 IS NOT NULL AND _c2 IS NOT NULL")
            .crossJoin(F.broadcast(mm)))

    sort_file = F.expr(
        f"(_c1 - _mn1) * {n_files} DIV (_mx1 - _mn1 + 1)")
    b1 = f"((_c1 - _mn1) * shiftleft(1L, {bits}) DIV (_mx1 - _mn1 + 1))"
    b2 = f"((_c2 - _mn2) * shiftleft(1L, {bits}) DIV (_mx2 - _mn2 + 1))"
    z = F.expr(
        f"aggregate(sequence(0, {bits - 1}), 0L, (acc, j) -> acc"
        f" + shiftleft((({b1}) >> j) & 1L, cast(j * 2 + 1 as int))"
        f" + shiftleft((({b2}) >> j) & 1L, cast(j * 2 as int)))")
    z_file = (z * n_files / F.lit(int(1) << (2 * bits))).cast("long")

    tagged = None
    for layout, fexpr in (("sort_" + c1, sort_file), ("zorder", z_file)):
        part = base.select(F.lit(layout).alias("layout"),
                           fexpr.alias("file"), "_c1", "_c2")
        tagged = part if tagged is None else tagged.unionByName(part)
    zone = (tagged.groupBy("layout", "file")
            .agg(F.min("_c1").alias("f_mn1"), F.max("_c1").alias("f_mx1"),
                 F.min("_c2").alias("f_mn2"), F.max("_c2").alias("f_mx2"),
                 F.count("*").cast("long").alias("f_rows")))

    probe_structs = []
    for idx, c in enumerate((c1, c2), start=1):
        for p in range(1, n_probes + 1):
            probe_structs.append(
                f"named_struct('probe_col', '{c}', 'v', "
                f"_mn{idx} + (_mx{idx} - _mn{idx}) * {p}L "
                f"DIV {n_probes + 1})")
    probes = mm.select(F.explode(
        F.expr("array(" + ", ".join(probe_structs) + ")")).alias("p")) \
        .select(F.col("p.probe_col").alias("probe_col"),
                F.col("p.v").alias("v"))

    aud = zone.crossJoin(F.broadcast(probes))
    skipped = F.when(
        F.col("probe_col") == F.lit(c1),
        (F.col("v") < F.col("f_mn1")) | (F.col("v") > F.col("f_mx1"))
    ).otherwise(
        (F.col("v") < F.col("f_mn2")) | (F.col("v") > F.col("f_mx2")))
    return (aud.groupBy("layout", "probe_col")
            .agg((F.count("*") / n_probes).cast("long").alias("n_files"),
                 F.lit(int(n_probes)).cast("long").alias("n_probes"),
                 F.sum(skipped.cast("long")).cast("long")
                 .alias("n_skipped"),
                 F.round(F.sum(skipped.cast("long")) / F.count("*"),
                         round_digits).alias("skip_frac"),
                 F.sum(F.when(~skipped, F.col("f_rows")).otherwise(0))
                 .cast("long").alias("rows_scanned"),
                 F.round(F.sum(F.when(~skipped, F.col("f_rows"))
                               .otherwise(0))
                         / F.sum("f_rows"), round_digits)
                 .alias("scan_frac")))


def bloom_skipping_audit(df: DataFrame, sort_col: str, probe_col: str,
                         n_files: int = 16, m_bits: int = 65536,
                         k_hashes: int = 3, n_probes: int = 9,
                         seed: int = 7) -> DataFrame:
    """Per-file Bloom-filter skipping audit (X231) — the point-lookup
    complement of X228: when the probe column is DECORRELATED from the
    sort key, min/max zone maps prune nothing (X228 measures exactly
    that zero), but a per-file Bloom filter over the probe column still
    skips every file that provably lacks the value (the
    Parquet/Iceberg bloom_filter_enabled trade: m_bits/8 bytes per
    file per column buys point-predicate skipping that no sort order
    can). Probes each of ``n_probes`` equally-spaced point values and
    reports, per probe: files skipped by zone maps, files skipped by
    the Bloom filters, files actually containing the value, and the
    Bloom false passes. Bit positions use the engine's X190 formula
    (pos_j = md5(seed:j:key) mod m), so the audit — including WHICH
    false positives occur — replays bit-exactly in any engine.

    Returns one row per probe: (v, n_files, zm_skipped, bloom_skipped,
    n_containing, bloom_false_pos). ALL integer.

    Scale shape: file placement is the X228 per-row expression; the
    per-file position sets are one explode + distinct bounded by
    n_files x min(m_bits, k x keys-per-file); everything downstream
    runs on that bounded table crossed with n_probes literal probes.
    """
    from pyspark.sql import functions as F

    mm = df.agg(F.min(sort_col).alias("_mn1"), F.max(sort_col).alias("_mx1"),
                F.min(probe_col).alias("_mn2"), F.max(probe_col).alias("_mx2"))
    base = (df.select(F.col(sort_col).cast("long").alias("_c1"),
                      F.col(probe_col).cast("long").alias("_c2"))
            .where("_c1 IS NOT NULL AND _c2 IS NOT NULL")
            .crossJoin(F.broadcast(mm)))
    rows = base.select(
        F.expr(f"(_c1 - _mn1) * {n_files} DIV (_mx1 - _mn1 + 1)")
        .alias("file"), "_c2")

    zone = rows.groupBy("file").agg(F.min("_c2").alias("f_mn"),
                                    F.max("_c2").alias("f_mx"))
    pos_expr = (f"transform(sequence(0, {k_hashes - 1}), j -> "
                f"cast(conv(substring(md5(concat('{seed}', ':', j, ':', "
                f"cast({{v}} as string))), 1, 15), 16, 10) as long) "
                f"% {m_bits})")
    fpos = (rows.select("file", F.explode(
        F.expr(pos_expr.format(v="_c2"))).alias("pos")).distinct())

    probe_structs = [
        f"named_struct('v', _mn2 + (_mx2 - _mn2) * {p}L "
        f"DIV {n_probes + 1})" for p in range(1, n_probes + 1)]
    probes = (mm.select(F.explode(F.expr(
        "array(" + ", ".join(probe_structs) + ")")).alias("p"))
        .select(F.col("p.v").alias("v")).distinct())
    ppos = probes.select("v", F.explode(
        F.expr(pos_expr.format(v="v"))).alias("pos")).distinct()
    preq = ppos.groupBy("v").agg(F.count("*").cast("long").alias("req"))

    grid = zone.crossJoin(F.broadcast(probes))
    matched = (fpos.join(ppos, "pos")
               .groupBy("file", "v")
               .agg(F.count("*").cast("long").alias("hit")))
    contains = (rows.select("file", F.col("_c2").alias("v")).distinct()
                .join(probes, "v")
                .withColumn("has", F.lit(1)))
    aud = (grid.join(matched, ["file", "v"], "left")
           .join(F.broadcast(preq), "v")
           .join(contains, ["file", "v"], "left"))
    zm_skip = (F.col("v") < F.col("f_mn")) | (F.col("v") > F.col("f_mx"))
    bl_skip = F.coalesce("hit", F.lit(0)) < F.col("req")
    return (aud.groupBy("v")
            .agg(F.count("*").cast("long").alias("n_files"),
                 F.sum(zm_skip.cast("long")).cast("long")
                 .alias("zm_skipped"),
                 F.sum(bl_skip.cast("long")).cast("long")
                 .alias("bloom_skipped"),
                 F.sum(F.coalesce("has", F.lit(0))).cast("long")
                 .alias("n_containing"))
            .withColumn("bloom_false_pos",
                        (F.col("n_files") - F.col("bloom_skipped")
                         - F.col("n_containing")).cast("long")))


def gap_compression_audit(edges: DataFrame,
                          round_digits: int = 6) -> DataFrame:
    """WebGraph-style gap-compression audit (X234; the first-order
    Boldi-Vigna estimate): store each vertex's sorted out-neighbor
    list as deltas (first dst absolute, then dst_i - dst_{i-1}) and
    count the varint (LEB128) bytes that encoding costs, bucketed by
    the out-degree's bit length — the storage audit behind 'can the
    edge table live in RAM per executor': dense high-degree adjacency
    compresses toward 1 byte/edge while singleton lists pay the
    absolute-id price, and THIS measures where the actual graph sits
    vs the 8-byte raw id. (Full BV adds reference lists + intervals;
    the gap+varint layer is where most of the win is and is exactly
    reproducible in SQL.)

    Returns one row per degree bucket: (deg_bits, n_lists, n_edges,
    varint_bytes, raw_bytes, bytes_per_edge, ratio) — deg_bits =
    bit length of the list's out-degree, ratio = varint/raw.

    Scale shape: ONE src-hash exchange + in-partition sort serves both
    the LAG gap and the degree count (two window functions, same
    window exchange); the varint size is a pure integer CASE per row;
    the rollup is a bounded groupBy (≤ 64 buckets). All integer until
    the two final rounded divisions.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from credigraph_spark.graph.adjacency import clean_edges

    e = clean_edges(edges)
    w = Window.partitionBy("src").orderBy("dst")
    wd = Window.partitionBy("src")
    g = e.select(
        "src",
        (F.col("dst") - F.coalesce(F.lag("dst").over(w), F.lit(0)))
        .alias("gap"),
        F.count("*").over(wd).alias("deg"))
    vb = F.lit(9)   # int64 ids never need 10 LEB128 groups
    for nbytes in range(8, 0, -1):
        vb = F.when(F.col("gap") < F.lit(128 ** nbytes), nbytes) \
            .otherwise(vb)
    bits = F.length(F.conv(F.col("deg").cast("string"), 10, 2))
    return (g.select(bits.cast("long").alias("deg_bits"), "src",
                     vb.cast("long").alias("vbytes"))
            .groupBy("deg_bits")
            .agg(F.countDistinct("src").cast("long").alias("n_lists"),
                 F.count("*").cast("long").alias("n_edges"),
                 F.sum("vbytes").cast("long").alias("varint_bytes"),
                 (F.count("*") * 8).cast("long").alias("raw_bytes"))
            .withColumn("bytes_per_edge",
                        F.round(F.col("varint_bytes") / F.col("n_edges"),
                                round_digits))
            .withColumn("ratio",
                        F.round(F.col("varint_bytes")
                                / F.col("raw_bytes"), round_digits)))


def rebalance_audit(df: DataFrame, key_col: str, n_from: int = 8,
                    n_to: int = 9, seed: int = 7,
                    round_digits: int = 6) -> DataFrame:
    """Rendezvous-vs-mod rebalance audit (X243): when a cluster grows
    from ``n_from`` to ``n_to`` slots, how many keys MOVE under
    highest-random-weight placement (HRW / rendezvous hashing:
    assign key to argmax_slot md5(seed|slot|key)) vs plain mod-hash
    (md5(key) mod n)? HRW moves only the ~1/n_to of keys the new slot
    wins; mod-hash reshuffles almost everything (~(n_to-1)/n_to) — the
    shuffle-service / bucket-store resize cost, measured on the
    actual key set instead of quoted from folklore. The md5 weights
    make both placements bit-replayable in any engine (argmax by hex
    weight string, ties impossible in practice and broken by slot).

    Returns one row per scheme: (scheme, n_keys, moved, moved_frac).

    Scale shape: both placements are pure per-row expressions (HRW =
    an array-max over n_to literal-salted md5s — no join, no shuffle);
    the audit is one scalar aggregate per scheme over the distinct-key
    scan.
    """
    from pyspark.sql import functions as F

    keys = (df.select(F.col(key_col).cast("string").alias("k"))
            .where(F.col("k").isNotNull()).distinct())

    def hrw(n):
        return F.expr(
            f"array_max(transform(sequence(0, {n - 1}), s -> "
            f"struct(md5(concat('{seed}', '|', s, '|', k)) AS h, "
            f"s AS s))).s")

    def modh(n):
        return F.pmod(
            F.conv(F.substring(F.md5(F.col("k")), 1, 15), 16, 10)
            .cast("long"), F.lit(n))

    tagged = keys.select(
        (hrw(n_from) != hrw(n_to)).cast("long").alias("hrw_moved"),
        (modh(n_from) != modh(n_to)).cast("long").alias("mod_moved"))
    st = tagged.agg(F.count("*").alias("n"),
                    F.sum("hrw_moved").alias("hm"),
                    F.sum("mod_moved").alias("mm")).collect()[0]
    n, hm, mm = int(st["n"]), int(st["hm"] or 0), int(st["mm"] or 0)
    rows = [("hrw", n, hm, round(hm / n, round_digits) if n else 0.0),
            ("mod", n, mm, round(mm / n, round_digits) if n else 0.0)]
    return df.sparkSession.createDataFrame(
        rows, "scheme STRING, n_keys LONG, moved LONG, "
              "moved_frac DOUBLE")


def ring_balance_audit(df: DataFrame, key_col: str, n_slots: int = 8,
                       vnodes: tuple[int, ...] = (1, 16),
                       seed: int = 7,
                       round_digits: int = 6) -> DataFrame:
    """Consistent-hash ring balance audit (X250; the Karger ring +
    virtual nodes, the Dynamo/Cassandra placement): keys and vnode
    markers hash onto one md5 ring; a key belongs to the next marker
    clockwise. With ONE vnode per slot the arc lengths — and so the
    loads — are wildly uneven; virtual nodes average the arcs out.
    This measures the per-slot loads at each vnode count on the
    actual key set: the placement-smoothness dial X243's HRW audit
    doesn't expose (HRW is perfectly smooth but needs n hashes per
    key; the ring pays one hash + a search, and THIS is the price).

    Returns one row per (vnode count, slot): (vnodes, slot, n_keys,
    share). Ring positions are md5 values, so the audit replays
    bit-exactly in any engine.

    Scale shape: the ring (n_slots x max vnodes rows) embeds in the
    per-row expression as a sorted literal array — the clockwise
    successor search is a per-key array fold, no join, no shuffle;
    one bounded groupBy per vnode count.
    """
    import hashlib

    from pyspark.sql import functions as F

    keys = (df.select(F.col(key_col).cast("string").alias("k"))
            .where(F.col("k").isNotNull()).distinct())

    out = None
    total = keys.count()
    for v in vnodes:
        ring = sorted(
            (int(hashlib.md5(f"{seed}|{s}|{i}".encode())
                 .hexdigest()[:15], 16), s)
            for s in range(n_slots) for i in range(v))
        arr = ", ".join(f"named_struct('p', {p}L, 's', {s})"
                        for p, s in ring)
        # clockwise successor: first marker at/after the key's ring
        # position, wrapping to the smallest marker
        assign = F.expr(
            f"coalesce(try_element_at(filter(array({arr}), "
            f"x -> x.p >= cast(conv(substring(md5(k), 1, 15), 16, 10)"
            f" as bigint)), 1).s, {ring[0][1]})")
        part = (keys.select(assign.cast("long").alias("slot"))
                .groupBy("slot")
                .agg(F.count("*").cast("long").alias("n_keys"))
                .select(F.lit(int(v)).cast("long").alias("vnodes"),
                        "slot", "n_keys",
                        F.round(F.col("n_keys") / total,
                                round_digits).alias("share")))
        out = part if out is None else out.unionByName(part)
    return out


def salting_audit(df: DataFrame, key_col: str, row_col: str,
                  n_reducers: int = 16, n_salts: int = 8,
                  seed: int = 7, round_digits: int = 6) -> DataFrame:
    """Salting effectiveness audit (X254): how the reducer loads of a
    skewed-key shuffle change when the key is salted — plain placement
    sends every row of a hot key to ONE reducer (hash(key) mod R, the
    straggler that stalls the stage); salting spreads each key over
    ``n_salts`` reducers (hash(key, salt) mod R) at the price of a
    second combine. Reports, per scheme, the reducer-load distribution
    the stage scheduler actually sees: max / mean load and the
    straggler ratio (max/mean — wall-clock inflation of the stage).
    The measurement behind the engine's own hot_threshold salting in
    PageRank (graph/pagerank.py) — run it on a key before deciding.

    Returns one row per scheme: (scheme, n_reducers, n_rows, max_load,
    mean_load, straggler_ratio).

    Scale shape: both placements are per-row md5 expressions; loads
    are ONE groupBy to <= n_reducers rows per scheme. The salt is
    derived from ``row_col`` (a per-row id), NOT from a random — rows
    of the same key fan out over n_salts reducers and the audit
    replays deterministically in any engine.
    """
    from pyspark.sql import functions as F

    rows = (df.select(F.col(key_col).cast("string").alias("k"),
                      F.col(row_col).cast("string").alias("rid"))
            .where(F.col("k").isNotNull()))

    def h(expr):
        return F.pmod(
            F.conv(F.substring(F.md5(expr), 1, 15), 16, 10)
            .cast("long"), F.lit(n_reducers))

    salt = F.pmod(
        F.conv(F.substring(
            F.md5(F.concat_ws("|", F.lit(str(seed)), F.col("rid"))),
            1, 15), 16, 10).cast("long"), F.lit(n_salts))
    plain = rows.select(h(F.col("k")).alias("r"))
    salted = rows.select(
        h(F.concat_ws("#", F.col("k"), salt.cast("string")))
        .alias("r"))
    out = None
    for scheme, placed in (("plain", plain), ("salted", salted)):
        loads = (placed.groupBy("r")
                 .agg(F.count("*").cast("long").alias("l"))
                 .agg(F.sum("l").cast("long").alias("n_rows"),
                      F.max("l").cast("long").alias("max_load"),
                      (F.sum("l") / n_reducers).alias("mean")))
        row = loads.select(
            F.lit(scheme).alias("scheme"),
            F.lit(int(n_reducers)).cast("long").alias("n_reducers"),
            "n_rows", "max_load",
            F.round(F.col("mean"), round_digits).alias("mean_load"),
            F.round(F.col("max_load") / F.col("mean"), round_digits)
            .alias("straggler_ratio"))
        out = row if out is None else out.unionByName(row)
    return out


def table_fingerprint(df: DataFrame, cols: list[str] | None = None,
                      label: str = "table") -> DataFrame:
    """Order-invariant table fingerprint (X263): ONE row-content hash
    for a whole table -- bit_xor of per-row md5 int64s over a canonical
    column serialization -- that any engine recomputes identically on
    any partitioning/ordering (XOR is commutative, associative and
    overflow-free, so shuffle order cannot change it). The integrity
    primitive behind "did the migration/replica/rewrite keep every
    row": compare two fingerprints instead of sorting two tables.
    Caveat by construction: XOR cancels DUPLICATE pairs -- a table
    where duplicate multiplicity matters should fingerprint with a
    count column included (make the row unique) -- so n_rows rides
    along and must ALSO match. Null cells serialize as a sentinel
    distinct from the empty string.

    Returns ONE row: (label, n_rows, fingerprint).

    Scale shape: a per-row md5 + ONE map-side-combinable bit_xor/count
    aggregate -- the cheapest full-table integrity pass possible.
    """
    from pyspark.sql import functions as F

    if cols is None:
        cols = list(df.columns)
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("<null>"))
             for c in cols]
    h = F.conv(F.substring(
        F.md5(F.concat_ws("|", *parts)), 1, 15), 16, 10).cast("long")
    return df.agg(
        F.lit(label).alias("label"),
        F.count("*").cast("long").alias("n_rows"),
        F.coalesce(F.bit_xor(h), F.lit(0)).cast("long")
        .alias("fingerprint"))
