"""Deterministic R-MAT graph generator (Chakrabarti, Zhan & Faloutsos
2004) — synthetic power-law graphs at ANY scale, generated
distributively with zero driver state.

The scale-testing workhorse: every Graph500-style benchmark seeds from
R-MAT because it reproduces the heavy-tailed degree skew real web
graphs have — exactly the skew the engine's salting/broadcast paths
exist for. Generating 10^11 edges is `spark.range(m)` plus per-row
column expressions: each edge walks ``scale`` recursion levels, picking
a quadrant per level with probabilities (a, b, c, d) from an
md5-derived uniform — so the SAME (seed, i) always yields the same
edge on any engine, and the whole generator is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

TWO60 = float(1 << 60)


def rmat_edges(spark: SparkSession, scale: int = 8, n_edges: int = 5000,
               seed: int = 7, a: float = 0.57, b: float = 0.19,
               c: float = 0.19,
               partitions: int | None = None) -> DataFrame:
    """Returns (edge_id, src, dst) with src/dst in [0, 2^scale).

    Per edge i and level l: u = md5(seed:i:l) first 15 hex / 2^60 (a
    uniform in [0,1)); quadrant thresholds a, a+b, a+b+c split u into
    the four R-MAT quadrants; the quadrant's high bit goes to src, low
    bit to dst. Self-loops and duplicates are left in (the reference
    R-MAT behavior) — compose with clean_edges / undirected_simple as
    needed.

    Scale shape: spark.range(n_edges) + ONE per-row fold over ``scale``
    levels (aggregate over a sequence literal — whole-stage codegen, no
    shuffle, no UDF, no driver state). 10^11 edges = 10^11 range rows
    split across `partitions`."""
    d1 = a + b
    d2 = a + b + c
    rng = spark.range(0, n_edges,
                      numPartitions=partitions).withColumnRenamed(
        "id", "edge_id")
    u = (f"cast(conv(substring(md5(concat('{seed}', ':', "
         f"cast(edge_id as string), ':', cast(l as string))), 1, 15), "
         f"16, 10) as double) / {TWO60!r}")
    quad = (f"(case when {u} < {a!r} then 0 "
            f"when {u} < {d1!r} then 1 "
            f"when {u} < {d2!r} then 2 else 3 end)")
    fold = (f"aggregate(sequence(0, {scale - 1}), "
            f"named_struct('s', 0L, 'd', 0L), "
            f"(acc, l) -> named_struct("
            f"'s', acc.s * 2L + cast({quad} div 2 as long), "
            f"'d', acc.d * 2L + cast({quad} % 2 as long)), "
            f"acc -> acc)")
    return rng.select(
        "edge_id",
        F.expr(fold + ".s").alias("src"),
        F.expr(fold + ".d").alias("dst"))


def configuration_rewire(edges: DataFrame, seed: int = 7,
                         num_ranges: int | None = None) -> DataFrame:
    """Configuration-model rewiring: a DEGREE-PRESERVING null graph —
    every vertex emits deg(v) half-edge stubs, stubs are paired in a
    deterministic md5 total order, self-pairs and duplicate pairs drop
    (the standard simple-graph projection). The null model clustering /
    assortativity / modularity significance tests compare against —
    clustering_null_model gives the closed-form EXPECTATION; this gives
    an actual INSTANCE graph any operator can run on.

    Scale shape: stubs = one posexplode of sequence(1, deg) (2|E| rows);
    the global pairing order uses the O3 distributed rank (range-
    partition by the md5 key, per-partition row_number, ONE broadcast
    of the O(num_ranges) offsets — never a single-partition window);
    pairing is rank DIV 2 → one groupBy. Deterministic: same (seed,
    graph) → same rewiring on any engine.

    Returns canonical rewired edges (src, dst), src < dst."""
    from pyspark.sql.window import Window

    from credigraph_spark.graph.adjacency import undirected_simple

    spark = edges.sparkSession
    und = undirected_simple(edges)
    deg = und.groupBy(F.col("src").alias("vid")) \
             .agg(F.count("*").alias("deg"))
    stubs = deg.select(
        "vid", F.explode(F.expr("sequence(1, deg)")).alias("i"))
    stubs = stubs.withColumn(
        "key", F.md5(F.concat_ws(":", F.lit(str(seed)),
                                 F.col("vid").cast("string"),
                                 F.col("i").cast("string"))))
    if num_ranges is None:
        num_ranges = max(
            32, int(spark.conf.get("spark.sql.shuffle.partitions")))
    parts = (stubs.repartitionByRange(num_ranges, "key", "vid", "i")
             .withColumn("_pid", F.spark_partition_id()))
    wl = Window.partitionBy("_pid").orderBy("key", "vid", "i")
    local = parts.withColumn("_r", F.row_number().over(wl))
    counts = parts.groupBy("_pid").agg(F.count("*").alias("_cnt"))
    wo = (Window.partitionBy(F.lit(0)).orderBy("_pid")
          .rowsBetween(Window.unboundedPreceding, -1))
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_cnt").over(wo), F.lit(0)))
    ranked = (local.join(F.broadcast(offsets.select("_pid", "_off")),
                         "_pid")
              .select("vid",
                      (F.col("_off") + F.col("_r") - 1).alias("rank")))
    pairs = (ranked.groupBy(F.expr("rank DIV 2").alias("j"))
             .agg(F.min(F.struct("rank", "vid")).alias("_a"),
                  F.max(F.struct("rank", "vid")).alias("_b"),
                  F.count("*").alias("_n"))
             .where(F.col("_n") == 2)    # odd stub total: last unpaired
             .select(F.col("_a.vid").alias("u"),
                     F.col("_b.vid").alias("v")))
    return (pairs.where(F.col("u") != F.col("v"))
            .select(F.least("u", "v").alias("src"),
                    F.greatest("u", "v").alias("dst"))
            .distinct())


def er_edges(spark: SparkSession, n_vertices: int = 256,
             n_draws: int = 5000, seed: int = 7,
             partitions: int | None = None) -> DataFrame:
    """Deterministic Erdős–Rényi G(n, m)-style instance (X269): the
    uniform null every structured generator (X184's R-MAT, X185's
    configuration rewire) is compared against — ``n_draws`` edge
    slots, each drawing (src, dst) uniformly from [0, n)² via two md5
    coins, self-loops and duplicate draws left in (the R-MAT
    convention; compose clean_edges / undirected_simple as needed).
    Where R-MAT plants skew and communities, ER has neither — the
    'is that structure real?' floor for any graph statistic.

    Returns (edge_id, src, dst), bit-identical in any engine.

    Scale shape: one spark.range over the draw ids + two per-row md5
    expressions — embarrassingly parallel, no shuffle.
    """
    from pyspark.sql import functions as F

    if partitions is None:
        partitions = max(
            8, int(spark.conf.get("spark.sql.shuffle.partitions")))

    def coin(tag):
        return F.pmod(
            F.conv(F.substring(
                F.md5(F.concat_ws(":", F.lit(str(seed)), F.lit(tag),
                                  F.col("edge_id").cast("string"))),
                1, 15), 16, 10).cast("long"), F.lit(n_vertices))

    return (spark.range(0, n_draws, 1, partitions)
            .select(F.col("id").alias("edge_id"))
            .select("edge_id", coin("s").alias("src"),
                    coin("d").alias("dst")))


def ws_edges(spark: SparkSession, n_vertices: int = 128,
             k_half: int = 3, beta_tenths: int = 2, seed: int = 7,
             partitions: int | None = None) -> DataFrame:
    """Deterministic Watts–Strogatz small-world instance (X270): the
    third canonical null next to ER (X269: no structure) and R-MAT
    (X184: skew) — a ring lattice (each vertex wired to its k_half
    clockwise neighbors) whose edges rewire with probability
    beta_tenths/10 to an md5-drawn uniform endpoint. beta=0 is pure
    lattice (high clustering, long paths), beta=1 is ER-like; the
    sweet spot keeps lattice clustering while shortcuts collapse the
    diameter — the small-world regime webgraph folklore lives in.

    Returns (src, dst, rewired); self-loops from a rewire draw are
    left in (compose clean_edges), bit-identical in any engine.

    Scale shape: one spark.range over (vertex x offset) slots + three
    per-row md5/arithmetic expressions — no shuffle.
    """
    from pyspark.sql import functions as F

    if partitions is None:
        partitions = max(
            8, int(spark.conf.get("spark.sql.shuffle.partitions")))
    n_slots = n_vertices * k_half
    base = (spark.range(0, n_slots, 1, partitions)
            .select((F.col("id") / k_half).cast("long").alias("src"),
                    (F.col("id") % k_half + 1).alias("off"),
                    F.col("id").alias("slot")))

    def h(tag):
        return F.conv(F.substring(
            F.md5(F.concat_ws(":", F.lit(str(seed)), F.lit(tag),
                              F.col("slot").cast("string"))),
            1, 15), 16, 10).cast("long")

    rewire = F.pmod(h("r"), F.lit(10)) < beta_tenths
    lattice_dst = F.pmod(F.col("src") + F.col("off"),
                         F.lit(n_vertices))
    random_dst = F.pmod(h("d"), F.lit(n_vertices))
    return base.select(
        "src",
        F.when(rewire, random_dst).otherwise(lattice_dst)
        .cast("long").alias("dst"),
        rewire.alias("rewired"))
