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

from credigraph_spark.session import eager_checkpoint

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


def ks_split_drift(df: DataFrame, key_cols: list[str], value_col: str,
                   weights: dict[str, float], split_a: str = "train",
                   split_b: str = "test", seed: int = 42,
                   num_ranges: int | None = None,
                   round_digits: int = 9) -> DataFrame:
    """One row (n_a, n_b, ks_stat) — the EXACT two-sample
    Kolmogorov-Smirnov statistic between two splits of the engine's
    deterministic hash split: max over values of |F_a(x) − F_b(x)|.
    The scalar-feature drift check next to split_embedding_drift's
    centroid version — a skewed split on doc length/quality score
    biases every threshold tuned on train.

    Exact at scale with NO global window: per-distinct-value split
    counts (one partial-agg shuffle), then the O3 construction —
    repartitionByRange on value, per-partition cumulative sums keyed by
    spark_partition_id, tiny per-partition totals broadcast back as
    offsets — gives both CDFs in one pass; the KS max is a 1-row agg."""
    from pyspark.sql import Window

    sp = hash_split(df.select(*key_cols,
                              F.col(value_col).cast("double").alias("_v")),
                    key_cols, weights, seed)
    two = sp.where(F.col("split").isin([split_a, split_b]))
    counts = (two.groupBy("_v")
              .agg(F.sum(F.when(F.col("split") == split_a, 1)
                         .otherwise(0)).alias("c1"),
                   F.sum(F.when(F.col("split") == split_b, 1)
                         .otherwise(0)).alias("c2")))
    if num_ranges is None:
        num_ranges = max(32, df.rdd.getNumPartitions())
    parts = (counts.repartitionByRange(num_ranges, "_v")
             .withColumn("_pid", F.spark_partition_id()))
    wloc = (Window.partitionBy("_pid").orderBy("_v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = (parts.withColumn("_l1", F.sum("c1").over(wloc))
             .withColumn("_l2", F.sum("c2").over(wloc)))
    totals = local.groupBy("_pid").agg(F.sum("c1").alias("_t1"),
                                       F.sum("c2").alias("_t2"))
    woff = (Window.partitionBy(F.lit(0)).orderBy("_pid")
            .rowsBetween(Window.unboundedPreceding, -1))
    offs = (totals
            .withColumn("_o1", F.coalesce(F.sum("_t1").over(woff),
                                          F.lit(0)))
            .withColumn("_o2", F.coalesce(F.sum("_t2").over(woff),
                                          F.lit(0))))
    cum = (local.join(F.broadcast(offs.select("_pid", "_o1", "_o2")),
                      "_pid")
           .select((F.col("_o1") + F.col("_l1")).alias("a"),
                   (F.col("_o2") + F.col("_l2")).alias("b")))
    ns = counts.agg(F.sum("c1").alias("n_a"), F.sum("c2").alias("n_b"))
    return (cum.crossJoin(F.broadcast(ns))
            .agg(F.first("n_a").alias("n_a"),
                 F.first("n_b").alias("n_b"),
                 F.round(F.max(F.abs(
                     F.col("a").cast("double") / F.col("n_a")
                     - F.col("b").cast("double") / F.col("n_b"))),
                     round_digits).alias("ks_stat")))


def mixture_weights(df: DataFrame, group_col: str = "source",
                    text_col: str = "text", budget_tokens: int = 1_000_000,
                    round_digits: int = 6) -> DataFrame:
    """Temperature-sampled data-mixing weights per corpus source — the
    multilingual/multi-source sampling-proportions table every LLM
    pretraining mix starts from (alpha-scaled sampling, here the
    alpha = 0.5 temperature):

        p_s = sqrt(n_s) / Σ_t sqrt(n_t)

    plus, for a given token budget B, the expected epochs each source
    is consumed (B·p_s / n_s) and its boost over proportional sampling
    (p_s·N / n_s > 1 means up-sampled). alpha is pinned to 0.5 because
    IEEE sqrt is correctly rounded on every engine — the one exponent
    whose power is bit-identical cross-engine, so the whole table
    oracle-checks exactly; the denominator is a FLOOR(·1e9)-quantized
    decimal sum (order-independent under any partitioning).

    Scale shape: ONE map-side-combinable groupBy over sources (token
    counts are per-row expressions, no explode), then a broadcast of
    the 1-row total back onto the |sources|-row table. Returns
    (source, n_tokens, p_sample, epochs, boost) sorted by source."""
    from credigraph_spark.pipeline.textstats import token_count

    per = (df.select(F.col(group_col).alias("source"),
                     token_count(text_col).alias("_tc"))
           .groupBy("source")
           .agg(F.sum("_tc").cast("long").alias("n_tokens")))
    w = F.sqrt(F.col("n_tokens").cast("double"))
    tot = per.agg(
        F.sum("n_tokens").cast("long").alias("_nt"),
        (F.sum(F.floor(w * F.lit(1e9)).cast("decimal(38,0)"))
         .cast("double") / F.lit(1e9)).alias("_sw"))
    p = F.round(w / F.col("_sw"), round_digits + 2)
    return (per.crossJoin(F.broadcast(tot))
            .select("source", "n_tokens",
                    p.alias("p_sample"),
                    F.round(F.lit(float(budget_tokens)) * p
                            / F.col("n_tokens").cast("double"),
                            round_digits).alias("epochs"),
                    F.round(p * F.col("_nt").cast("double")
                            / F.col("n_tokens").cast("double"),
                            round_digits).alias("boost"))
            .orderBy("source"))


def pack_shards(df: DataFrame, budget_tokens: int,
                id_col: str = "doc_id", text_col: str = "text",
                num_ranges: int | None = None) -> DataFrame:
    """Token-budget shard packing — the concat-and-chunk sharding every
    LLM pretraining loader does: documents in deterministic id order,
    each assigned its global token OFFSET (tokens of all earlier docs)
    and the training shard floor(offset / budget) it starts in.

    Scale shape: the O3 distributed-cumsum construction (the ranked-ID
    pattern from extraction.assign_ids) — range-partition by id,
    per-partition running sums, then ONE broadcast of the O(num_ranges)
    per-partition token totals to lift local sums to global offsets.
    Never a window over the data in a single partition. All integers —
    the oracle compares exactly.

    Returns (doc_id, n_tokens, offset, shard)."""
    from credigraph_spark.pipeline.textstats import token_count

    base = df.select(F.col(id_col).alias("doc_id"),
                     token_count(text_col).cast("long").alias("n_tokens"))
    if num_ranges is None:
        num_ranges = max(32, base.rdd.getNumPartitions())
    parts = (base.repartitionByRange(num_ranges, "doc_id")
             .withColumn("_pid", F.spark_partition_id()))
    wl = (Window.partitionBy("_pid").orderBy("doc_id")
          .rowsBetween(Window.unboundedPreceding, -1))
    local = parts.withColumn(
        "_run", F.coalesce(F.sum("n_tokens").over(wl), F.lit(0)))
    totals = parts.groupBy("_pid").agg(F.sum("n_tokens").alias("_tot"))
    wo = (Window.partitionBy(F.lit(0)).orderBy("_pid")
          .rowsBetween(Window.unboundedPreceding, -1))
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(wo), F.lit(0)))
    return (local.join(F.broadcast(offsets.select("_pid", "_off")), "_pid")
            .select("doc_id", "n_tokens",
                    (F.col("_off") + F.col("_run")).cast("long")
                    .alias("offset"),
                    F.expr(f"(_off + _run) DIV {int(budget_tokens)}")
                    .cast("long").alias("shard")))


def padding_waste_audit(df: DataFrame, batch_size: int = 8,
                        id_col: str = "doc_id", text_col: str = "text",
                        num_ranges: int | None = None) -> DataFrame:
    """Padding-waste audit of fixed-size batch assembly (X217) — the
    question every padded-batch training loader asks: how many pad
    tokens does arrival-order batching burn, and how much does
    length-sorted batching recover? For both policies documents are
    ranked deterministically (arrival = id order; sorted =
    (token_count, id) order), grouped into batches of ``batch_size``,
    and each batch pads to its longest member:
    waste = Σ_batches (batch_rows·max_len − Σ len).

    Returns one row per policy: (policy, n_docs, n_batches,
    total_tokens, padded_tokens, waste_frac) — ALL integers except the
    6dp ratio, so the replay is exact.

    Scale shape: each policy's rank uses the O3 distributed
    construction (range-partition + per-partition row_number +
    broadcast offsets — never a global single-partition window), then
    ONE groupBy(batch) rollup. The final row is a two-element union.
    """
    from credigraph_spark.pipeline.textstats import token_count

    base = df.select(F.col(id_col).alias("doc_id"),
                     token_count(text_col).cast("long").alias("n_tokens"))
    if num_ranges is None:
        num_ranges = max(8, base.rdd.getNumPartitions())

    def ranked(order_cols):
        parts = (base.repartitionByRange(num_ranges, *order_cols)
                 .withColumn("_pid", F.spark_partition_id()))
        wl = Window.partitionBy("_pid").orderBy(*order_cols)
        local = parts.withColumn("_r", F.row_number().over(wl))
        counts = parts.groupBy("_pid").agg(F.count("*").alias("_cnt"))
        wo = (Window.partitionBy(F.lit(0)).orderBy("_pid")
              .rowsBetween(Window.unboundedPreceding, -1))
        offs = counts.withColumn(
            "_off", F.coalesce(F.sum("_cnt").over(wo), F.lit(0)))
        return (local.join(F.broadcast(offs.select("_pid", "_off")),
                           "_pid")
                .select("doc_id", "n_tokens",
                        (F.col("_off") + F.col("_r") - 1).alias("_rk")))

    out = None
    for policy, order_cols in (
            ("arrival", [F.col("doc_id")]),
            ("length_sorted", [F.col("n_tokens"), F.col("doc_id")])):
        r = ranked(order_cols)
        per_batch = (r.withColumn("_b", F.floor(F.col("_rk") / batch_size))
                     .groupBy("_b")
                     .agg(F.count("*").alias("rows"),
                          F.max("n_tokens").alias("mx"),
                          F.sum("n_tokens").alias("tok")))
        row = per_batch.agg(
            F.sum("rows").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_batches"),
            F.sum("tok").cast("long").alias("total_tokens"),
            F.sum(F.col("rows") * F.col("mx") - F.col("tok"))
            .cast("long").alias("padded_tokens")).select(
            F.lit(policy).alias("policy"), "n_docs", "n_batches",
            "total_tokens", "padded_tokens",
            F.round(F.col("padded_tokens")
                    / (F.col("total_tokens") + F.col("padded_tokens")),
                    6).alias("waste_frac"))
        out = row if out is None else out.unionByName(row)
    return out


def greedy_coverage_select(df: DataFrame, k: int = 3,
                           id_col: str = "doc_id",
                           text_col: str = "text",
                           shingle_n: int = 3) -> DataFrame:
    """Greedy max-coverage corpus selection (X237): pick ``k``
    documents that together cover the most distinct word n-grams —
    the classic submodular data-selection primitive (facility-location
    /coverage objective; the greedy is (1-1/e)-optimal, Nemhauser et
    al. 1978) behind 'pick the most informative subset to curate or
    to seed a mixture with'. Each round takes the document with the
    largest count of NOT-yet-covered shingles (ties to the smaller
    id), then retires its shingles.

    Returns one row per pick: (round, doc_id, gain, covered_total) —
    gain = newly covered shingles, covered_total = cumulative
    coverage after the pick. Stops early (fewer than k rows) once no
    document adds anything new — a zero-gain pick is not a pick.

    Scale shape: the (doc, shingle-digest) pair table is built ONCE
    (sha2 digests shuffle 32 bytes a row, never shingle text) and
    persisted; each of the k rounds is one anti-join against the
    covered set + one map-side-combinable count + a TakeOrdered top-1
    (the engine's one-small-action-per-round convention, as in the
    seeded-betweenness loop). k is the budget, not the data size.
    """
    from credigraph_spark.pipeline.dedup import shingles

    pairs = (df.select(F.col(id_col).alias("id"),
                       F.explode(shingles(text_col, shingle_n))
                       .alias("sh"))
             .select("id", F.sha2("sh", 256).alias("h"))
             .persist())
    spark = df.sparkSession
    covered = spark.createDataFrame([], "h STRING") \
        .transform(eager_checkpoint)
    picked: list[int] = []
    rows = []
    total = 0
    for r in range(1, k + 1):
        remaining = pairs.join(covered, "h", "left_anti")
        if picked:
            remaining = remaining.where(~F.col("id").isin(picked))
        top = (remaining.groupBy("id")
               .agg(F.count("*").cast("long").alias("gain"))
               .orderBy(F.desc("gain"), F.asc("id")).limit(1).collect())
        if not top:
            break
        doc, gain = top[0]["id"], int(top[0]["gain"])
        picked.append(doc)
        total += gain
        rows.append((r, doc, gain, total))
        covered = (covered.unionByName(
            pairs.where(F.col("id") == doc).select("h"))
            .distinct().transform(eager_checkpoint))
    pairs.unpersist()
    return spark.createDataFrame(
        rows, "round LONG, doc_id LONG, gain LONG, covered_total LONG")


def quantile_map_normalize(df: DataFrame, group_col: str,
                           value_col: str, id_col: str,
                           round_digits: int = 6) -> DataFrame:
    """Cross-source quantile-mapping normalization (X264; the
    batch-effect correction genomics calls quantile normalization):
    replace each row's value by the GLOBAL value at the same
    within-source quantile — afterwards every source has (up to ties)
    the same score distribution, so a threshold or a mixing policy
    applied to the normalized score treats sources fairly even when
    one source's raw scale is inflated. Ranks are percentile_disc
    style: within-source rank r of n maps to the global value at rank
    ceil(r * N / n) — all INTEGER arithmetic, so the mapping replays
    bit-exactly (no interpolation).

    Returns (id, group, value, norm_value).

    Scale shape: one within-source window (bounded per source), one
    cumulative table over the DISTINCT-value histogram (bounded by
    the score's distinct cardinality — quantize continuous scores
    first at scale, or swap in the X69 range-partition construction
    when distinct values are corpus-sized), and one range-condition
    join of target ranks into that table's (cum-cnt, cum] buckets.
    """
    rows = (df.select(F.col(id_col).alias("id"),
                      F.col(group_col).alias("grp"),
                      F.col(value_col).alias("v"))
            .where(F.col("v").isNotNull()))
    wg = Window.partitionBy("grp").orderBy("v", "id")
    ng = Window.partitionBy("grp")
    ranked = rows.select(
        "id", "grp", "v",
        F.row_number().over(wg).alias("r"),
        F.count("*").over(ng).alias("n"))
    n_total = rows.count()
    target = ranked.withColumn(
        "k", F.expr(f"cast(ceil(r * {n_total} / cast(n as double)) "
                    f"as bigint)"))
    counts = rows.groupBy("v").agg(F.count("*").alias("cnt"))
    wv = (Window.partitionBy(F.lit(0)).orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = counts.withColumn("cum", F.sum("cnt").over(wv))
    return (target.join(
        cum.select(F.col("v").alias("norm_value"), "cnt", "cum"),
        (F.col("cum") - F.col("cnt") < F.col("k"))
        & (F.col("k") <= F.col("cum")))
        .select(F.col("id").alias(id_col),
                F.col("grp").alias(group_col),
                F.col("v").alias(value_col), "norm_value"))
