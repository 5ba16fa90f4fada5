"""Distributed text classifiers in pure DataFrame algebra — the
fastText-style curation-classifier slot (quality / language routing)
without MLlib: models are count tables + broadcast joins, so training
is a handful of map-side-combinable aggregations and scoring is one
broadcast join + per-doc partial-agg sum. Everything is exact integer
counting up to the final log-sum, which follows the engine's
cross-engine float contract (per-doc sum rounded to 6; argmax taken
over the ROUNDED scores with a lexicographic tie-break, so a 1-ulp
log() difference can never flip a prediction across engines).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from credigraph_spark.pipeline.textstats import tokens

from credigraph_spark.session import eager_checkpoint


def naive_bayes_lang(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", label_col: str = "lang",
                     train_pred=None,
                     round_digits: int = 6) -> DataFrame:
    """Multinomial Naive Bayes with add-1 smoothing, trained on the
    ``train_pred`` subset (default: doc_id % 5 != 0) and scored on the
    held-out rest. Per class c:

        score(d, c) = log p(c) + sum_t tf_t * log((c(t,c)+1)/(N_c+V))
                    = log p(c) + sum_t tf_t * log(1 + c(t,c))
                      - n_d * log(N_c + V)

    The rewrite matters at scale: a token UNSEEN in class c contributes
    log(1+0) = 0, so scoring is an INNER join of test tf against the
    class-token count table (missing rows contribute nothing) plus a
    per-class closed-form correction — never a (test-token x class)
    dense grid. Returns (doc_id, label, pred, correct) for every test
    doc.

    Scale shape: training = two bounded groupBys (class-token counts,
    class totals); scoring = one broadcast join of the class-token
    table onto test tf + a per-(doc, class) partial-agg sum; the argmax
    is a size-|classes| window per doc over ROUNDED scores."""
    if train_pred is None:
        train_pred = F.col(id_col) % 5 != 0
    base = df.select(F.col(id_col).alias("doc_id"),
                     F.col(label_col).alias("label"),
                     train_pred.alias("_train"),
                     tokens(text_col).alias("_toks"))
    tf = (base.select("doc_id", "label", "_train",
                      F.explode("_toks").alias("tok"))
          .groupBy("doc_id", "label", "_train", "tok")
          .agg(F.count("*").alias("tf")))
    train = tf.where("_train")
    ct = (train.groupBy("label", "tok")
          .agg(F.sum("tf").alias("c")))           # class-token counts
    cls = (train.groupBy("label")
           .agg(F.sum("tf").alias("n_c")))        # tokens per class
    v = ct.select("tok").distinct().count()       # train vocab size
    n_train_docs = base.where("_train").count()
    priors = (base.where("_train").groupBy("label")
              .agg(F.count("*").alias("nd"))
              .join(cls, "label")
              .select(F.col("label").alias("cls"),
                      F.log(F.col("nd") / F.lit(float(n_train_docs)))
                      .alias("logprior"),
                      F.log(F.col("n_c") + F.lit(float(v)))
                      .alias("logden")))
    test = tf.where(~F.col("_train"))
    # inner-join part: sum tf * log(1 + c(t,c)) over seen (tok, class)
    seen = (test.select("doc_id", "tok", "tf")
            .join(F.broadcast(ct), "tok")
            .groupBy("doc_id", F.col("label").alias("cls"))
            .agg(F.sum(F.col("tf") * F.log(F.lit(1.0) + F.col("c")))
                 .alias("s_seen")))
    nd = test.groupBy("doc_id").agg(F.sum("tf").alias("n_d"))
    grid = (nd.crossJoin(F.broadcast(priors))
            .join(seen, ["doc_id", "cls"], "left")
            .select("doc_id", "cls",
                    F.round(F.col("logprior")
                            + F.coalesce("s_seen", F.lit(0.0))
                            - F.col("n_d") * F.col("logden"),
                            round_digits).alias("score")))
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("cls"))
    pred = (grid.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") == 1)
            .select("doc_id", F.col("cls").alias("pred")))
    truth = base.where(~F.col("_train")).select("doc_id", "label")
    return (truth.join(pred, "doc_id", "left")
            .select("doc_id", "label",
                    F.coalesce("pred", F.lit("")).alias("pred"),
                    (F.coalesce("pred", F.lit("")) == F.col("label"))
                    .alias("correct")))


def hashed_text_logreg(df: DataFrame, label, id_col: str = "doc_id",
                       text_col: str = "text", n_buckets: int = 64,
                       iters: int = 2, lr: float = 0.5,
                       round_digits: int = 6) -> DataFrame:
    """fastText-shape binary text classifier: unigram + bigram bag
    hashed into ``n_buckets`` feature buckets (the hashing trick), a
    linear model trained by quantized full-batch gradient descent.

    Unlike :func:`logistic_regression_gd` (a handful of dense features,
    betas held as driver literals), the weight vector here is a
    DISTRIBUTED (bucket, w) TABLE — the shape that still works when the
    hashed vocabulary is 2M buckets wide: per iteration the forward
    pass is features ⋈ broadcast(w) → per-doc partial-agg sum, and the
    backward pass is features ⋈ residuals → per-bucket partial-agg
    gradient. Exactly ONE driver action per iteration (the 1-float
    intercept gradient, the engine's convergence-scalar convention);
    the weight table is localCheckpointed each step so plan depth stays
    constant in ``iters``.

    Determinism contract (the X166 convention): per-doc scores and all
    gradient sums are FLOOR(x·1e9)-quantized decimal sums (order-
    independent under any partitioning), rounded to ``round_digits``;
    weight updates round at one more digit so lr=0.5 lands on the
    decimal grid. The run therefore replays bit-identically in the
    unrolled SQL oracle. Feature values are tf/n_feats rounded to 6dp.

    Returns (bucket, w): ``n_buckets`` weight rows plus bucket = -1 for
    the intercept."""
    spark = df.sparkSession
    toks = tokens(text_col)
    bigrams = F.when(
        F.size(toks) >= 2,
        F.zip_with(F.slice(toks, 1, F.size(toks) - 1),
                   F.slice(toks, 2, F.size(toks) - 1),
                   lambda a, b: F.concat(a, F.lit("_"), b)),
    ).otherwise(F.array().cast("array<string>"))
    base = df.select(F.col(id_col).alias("doc_id"),
                     label.cast("double").alias("_y"),
                     F.concat(toks, bigrams).alias("_feats"))
    n = base.count()
    # hashed tf, L1-normalized per doc: x = round(tf / n_feats, 6)
    fb = (base.select("doc_id", F.explode("_feats").alias("_f"))
          .select("doc_id",
                  (F.conv(F.substring(F.md5("_f"), 1, 8), 16, 10)
                   .cast("long") % n_buckets).alias("bucket"))
          .groupBy("doc_id", "bucket").agg(F.count("*").alias("_tf")))
    nf = fb.groupBy("doc_id").agg(F.sum("_tf").alias("_nf"))
    x = (fb.join(nf, "doc_id")
         .select("doc_id", "bucket",
                 F.round(F.col("_tf") / F.col("_nf").cast("double"), 6)
                 .alias("x"))
         .persist())
    ys = base.select("doc_id", "_y")

    def _qsum(c, denom):
        return (F.sum(F.floor(c * F.lit(1e9)).cast("decimal(38,0)"))
                .cast("double") / F.lit(1e9 * denom))

    w = spark.range(n_buckets).select(F.col("id").alias("bucket"),
                                      F.lit(0.0).alias("w"))
    b = 0.0
    for _ in range(iters):
        s = (x.join(F.broadcast(w), "bucket")
             .groupBy("doc_id")
             .agg(_qsum(F.col("x") * F.col("w"), 1.0).alias("_s")))
        r = (ys.join(s, "doc_id", "left")
             .select("doc_id",
                     (F.lit(1.0) / (F.lit(1.0) + F.exp(
                         -F.round(F.lit(b) + F.coalesce("_s", F.lit(0.0)),
                                  round_digits)))
                      - F.col("_y")).alias("r"))
             .persist())
        gb = r.agg(F.round(_qsum(F.col("r"), n),
                           round_digits).alias("g")).collect()[0]["g"]
        gw = (x.join(r, "doc_id")
              .groupBy("bucket")
              .agg(F.round(_qsum(F.col("x") * F.col("r"), n),
                           round_digits).alias("g")))
        w = (w.join(gw, "bucket", "left")
             .select("bucket",
                     F.round(F.col("w") - F.lit(lr)
                             * F.coalesce("g", F.lit(0.0)),
                             round_digits + 1).alias("w"))
             .transform(eager_checkpoint))
        b = round(b - lr * gb, round_digits + 1)
        r.unpersist()
    x.unpersist()
    intercept = spark.createDataFrame([(-1, b)], "bucket LONG, w DOUBLE")
    return intercept.unionByName(w)


def logistic_regression_gd(df: DataFrame, features: dict[str, "F.Column"],
                           label, iters: int = 3, lr: float = 0.5,
                           round_digits: int = 6) -> DataFrame:
    """Binary logistic regression by full-batch gradient descent in
    pure DataFrame algebra — the quality-classifier slot without MLlib.
    Each iteration is ONE aggregation action computing every gradient
    component (map-side-combinable sums over the data), then a k+1-float
    driver update; the model is always a handful of literals embedded
    in the next plan, never a shuffled table.

        p = sigmoid(b0 + sum_j b_j x_j)
        grad_j = round(sum_i x_ij (p_i - y_i) / n, round_digits)
        b_j   <- round(b_j - lr * grad_j, round_digits)

    QUANTIZED GD (the IVF Lloyd convention): gradients and betas are
    rounded every step, so a 1-ulp exp() difference between engines can
    never compound across iterations — the run replays bit-identically
    in the unrolled SQL oracle. Returns (feature, beta) rows, intercept
    first."""
    names = list(features)
    cols = [features[n] for n in names]
    base = df.select(label.cast("double").alias("_y"),
                     *[c.cast("double").alias(f"_x{j}")
                       for j, c in enumerate(cols)])
    n = base.count()
    beta = [0.0] * (len(names) + 1)
    for _ in range(iters):
        z = F.lit(beta[0])
        for j in range(len(names)):
            z = z + F.lit(beta[j + 1]) * F.col(f"_x{j}")
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))

        def _qsum(c):
            # gradient sums are quantized to 1e-9 and summed EXACTLY as
            # decimal (the refine_codebooks convention): order-
            # independent under any partitioning, replayable in SQL —
            # a raw float sum's partial-sum order can land a gradient
            # on a 6dp rounding boundary differently per engine
            # (observed: 1e-6 intercept drift at sf0.01)
            return (F.sum(F.floor(c * F.lit(1e9)).cast("decimal(38,0)"))
                    .cast("double") / F.lit(1e9 * n))

        aggs = [F.round(_qsum(p - F.col("_y")),
                        round_digits).alias("g0")]
        aggs += [F.round(_qsum(F.col(f"_x{j}") * (p - F.col("_y"))),
                         round_digits).alias(f"g{j + 1}")
                 for j in range(len(names))]
        g = base.agg(*aggs).collect()[0]
        # betas round at ONE MORE digit than the gradients: lr=0.5 on a
        # 6dp gradient yields an EXACT 7dp decimal, so rounding at 6
        # would sit exactly on the half boundary every other step (and
        # Python/DuckDB/Java disagree there); at 7dp the value is on
        # the grid, never near a midpoint
        beta = [round(beta[j] - lr * g[j], round_digits + 1)
                for j in range(len(beta))]
    spark = df.sparkSession
    return spark.createDataFrame(
        [("intercept", beta[0])]
        + [(names[j], beta[j + 1]) for j in range(len(names))],
        "feature STRING, beta DOUBLE")


def calibration_bins(df: DataFrame, score, label, n_bins: int = 10,
                     round_digits: int = 6) -> DataFrame:
    """Classifier reliability diagram as a relational operator: bin a
    [0,1] confidence score into ``n_bins`` fixed-width bins and report
    per bin the count, mean confidence and empirical positive rate —
    the calibration audit (|avg_p − frac_pos| folded over bins is ECE)
    every quality-classifier-driven curation pipeline needs before its
    scores gate data.

    ``score``: a Column producing the model confidence in [0, 1]
    (scores exactly 1.0 land in the top bin); ``label``: a boolean
    Column with the true outcome. Means are FLOOR(·1e9)-quantized
    decimal sums — order-independent, bit-stable cross-engine.

    Scale shape: per-row expressions + ONE bounded groupBy over
    n_bins keys. Returns (bin, n, avg_score, frac_pos) sorted by bin."""
    b = F.least(F.floor(score * n_bins).cast("long"),
                F.lit(n_bins - 1)).alias("bin")
    base = df.select(b, score.cast("double").alias("_p"),
                     label.cast("long").alias("_y"))

    def _qavg(c):
        return (F.sum(F.floor(c * F.lit(1e9)).cast("decimal(38,0)"))
                .cast("double") / (F.lit(1e9) * F.count("*")))

    return (base.groupBy("bin")
            .agg(F.count("*").alias("n"),
                 F.round(_qavg(F.col("_p")), round_digits)
                 .alias("avg_score"),
                 F.round(F.sum("_y") / F.count("*").cast("double"),
                         round_digits).alias("frac_pos"))
            .orderBy("bin"))


def label_noise_screen(probs: DataFrame, id_col: str = "doc_id",
                       label_col: str = "label", class_col: str = "cls",
                       p_col: str = "p",
                       round_digits: int = 6) -> DataFrame:
    """Confident-learning label-noise screen (X232; Northcutt, Jiang &
    Chuang 2021 — the Cleanlab estimator): given per-example class
    probabilities in LONG form (id, label, cls, p), estimate which
    (given-label -> true-label) cells of the joint are label ERRORS.
    Per class j the self-confidence threshold t_j = mean p_j over
    examples LABELED j; an example is confidently class j if p_j >=
    t_j, its confident prediction is the argmax-p among classes above
    threshold (ties to the smaller class id), and examples confident
    in a class OTHER than their given label are the suspected noise.
    Classes with no self-labeled examples have no threshold and are
    never predicted (the Cleanlab convention); examples confident in
    nothing are excluded from the matrix.

    Returns the confident count matrix: (label, pred, n, suspect,
    share) — ``suspect`` marks off-diagonal cells, ``share`` = n over
    the label's row total (the per-class estimated noise rates).

    Scale shape: thresholds are ONE bounded groupBy over the
    self-labeled slice (|classes| rows, broadcast back); the confident
    argmax is a size-|classes| window per example; the matrix is a
    final bounded groupBy. Probabilities should arrive pre-rounded
    (integer-derived + round_digits) so the >= threshold comparisons
    replay identically in any engine.
    """
    th = (probs.where(F.col(label_col) == F.col(class_col))
          .groupBy(class_col)
          .agg(F.round(F.avg(p_col), round_digits).alias("_t")))
    cand = (probs.join(F.broadcast(th), class_col)
            .where(F.col(p_col) >= F.col("_t")))
    w = Window.partitionBy(id_col).orderBy(F.desc(p_col),
                                           F.asc(class_col))
    pred = (cand.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") == 1)
            .select(id_col, label_col, F.col(class_col).alias("pred")))
    m = (pred.groupBy(label_col, "pred")
         .agg(F.count("*").cast("long").alias("n")))
    lt = m.groupBy(label_col).agg(F.sum("n").alias("_ln"))
    return (m.join(lt, label_col)
            .select(label_col, "pred", "n",
                    (F.col(label_col) != F.col("pred")).alias("suspect"),
                    F.round(F.col("n") / F.col("_ln"), round_digits)
                    .alias("share")))


def threshold_sweep(scored: DataFrame, label_col: str,
                    score_col: str, bins: int = 20,
                    round_digits: int = 6) -> DataFrame:
    """Operating-point sweep (X248): quantize scores into ``bins``
    candidate thresholds and report the full confusion trade-off —
    TP/FP/FN, precision, recall, F1 — at every "predict positive when
    score >= b/bins" cut, with the F1-argmax flagged (ties to the
    LOWER threshold: recall is cheaper to give up later). The
    pick-the-cutoff step between X182's calibration audit and actually
    gating data with a classifier score.

    Returns one row per occupied bin: (thr, tp, fp, fn, precision,
    recall, f1, is_best).

    Scale shape: ONE map-side-combinable groupBy collapses the corpus
    to <= bins rows; the cumulative TP/FP window and the argmax run on
    that bounded table (dummy-partitioned, never the data). Counts
    are exact integers; the three fractions are final rounded
    divisions.
    """
    b = F.least(F.floor(F.col(score_col) * bins).cast("long"),
                F.lit(bins - 1))
    per_bin = (scored.select(b.alias("b"),
                             F.col(label_col).cast("long").alias("y"))
               .groupBy("b")
               .agg(F.count("*").alias("n"), F.sum("y").alias("pos")))
    w = (Window.partitionBy(F.lit(0)).orderBy(F.desc("b"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wt = Window.partitionBy(F.lit(0))
    cum = (per_bin
           .withColumn("tp", F.sum("pos").over(w).cast("long"))
           .withColumn("fp", (F.sum("n").over(w)
                              - F.sum("pos").over(w)).cast("long"))
           .withColumn("fn", (F.sum("pos").over(wt)
                              - F.sum("pos").over(w)).cast("long")))
    prec = F.col("tp") / (F.col("tp") + F.col("fp"))
    rec = F.col("tp") / (F.col("tp") + F.col("fn"))
    f1 = 2 * F.col("tp") / (2 * F.col("tp") + F.col("fp")
                            + F.col("fn"))
    out = cum.select(
        F.round(F.col("b") / bins, round_digits).alias("thr"),
        "tp", "fp", "fn",
        F.round(prec, round_digits).alias("precision"),
        F.round(rec, round_digits).alias("recall"),
        F.round(f1, round_digits).alias("f1"))
    wb = (Window.partitionBy(F.lit(0))
          .orderBy(F.desc("f1"), F.asc("thr")))
    return (out.withColumn("is_best",
                           F.row_number().over(wb) == 1))


def woe_iv(df: DataFrame, label_col: str, value_col: str,
           bins: int = 10, round_digits: int = 6) -> DataFrame:
    """Weight-of-evidence / information-value binning (X251; the
    credit-scoring feature screen): equal-width bins over the feature,
    per bin WOE = ln(share-of-positives / share-of-negatives) with
    +0.5 Laplace cell smoothing (empty cells stay finite), and the
    feature's total IV = sum (p_share - n_share) x WOE — the standard
    'is this feature worth anything' gate (<0.02 useless, >0.3
    strong) run before training; the continuous-feature sibling of
    X209's smoothed target encoding.

    Returns one row per bin: (bin, n_pos, n_neg, woe, iv_term, iv) —
    ``iv`` repeats the feature total on every row (the driver-compare
    convention for scalars carried on a bounded table).

    Scale shape: one broadcast min/max row, one map-side-combinable
    groupBy to <= bins rows; WOE/IV arithmetic runs on that bounded
    table from exact integer counts.
    """
    mm = df.agg(F.min(value_col).alias("_mn"),
                F.max(value_col).alias("_mx"))
    b = F.least(
        F.floor((F.col(value_col) - F.col("_mn")) * bins
                / (F.col("_mx") - F.col("_mn") + 1e-9)).cast("long"),
        F.lit(bins - 1))
    per = (df.where(F.col(value_col).isNotNull())
           .crossJoin(F.broadcast(mm))
           .select(b.alias("bin"),
                   F.col(label_col).cast("long").alias("y"))
           .groupBy("bin")
           .agg(F.count("*").alias("n"), F.sum("y").alias("pos"))
           .select("bin", F.col("pos").cast("long").alias("n_pos"),
                   (F.col("n") - F.col("pos")).cast("long")
                   .alias("n_neg")))
    tot = per.agg(F.sum("n_pos").alias("tp"),
                  F.sum("n_neg").alias("tn"))
    ps = (F.col("n_pos") + 0.5) / (F.col("tp") + 0.5 * bins)
    ns = (F.col("n_neg") + 0.5) / (F.col("tn") + 0.5 * bins)
    woe = F.log(ps / ns)
    terms = (per.crossJoin(F.broadcast(tot))
             .select("bin", "n_pos", "n_neg",
                     F.round(woe, round_digits).alias("woe"),
                     F.round((ps - ns) * woe, round_digits)
                     .alias("iv_term"),
                     ((ps - ns) * woe).alias("_t")))
    iv = terms.agg(F.round(F.sum("_t"), round_digits).alias("iv"))
    return terms.drop("_t").crossJoin(F.broadcast(iv))


def hash_collision_sweep(df: DataFrame, text_col: str = "text",
                         buckets: tuple[int, ...] = (64, 256, 1024,
                                                     4096),
                         seed: int = 7,
                         round_digits: int = 6) -> DataFrame:
    """Feature-hashing collision sweep (X259): the hashing trick
    (X169's classifier) buys a fixed-width weight table by letting
    features collide — this measures the actual damage on the actual
    vocabulary: for each candidate bucket count, how many distinct
    unigram+bigram features land in shared buckets (their gradients
    blend) and how many buckets are even touched. Pick the smallest k
    whose collision fraction is tolerable instead of folklore's
    'use 2^18'.

    Returns one row per bucket count: (n_buckets, n_features,
    buckets_hit, colliding_features, collision_frac).

    Scale shape: ONE distinct-feature table (tokens explode +
    distinct), then per k a map-side-combinable bucket groupBy over
    it; the sweep costs |buckets| bounded aggregations over the
    vocabulary, never the corpus. ALL integer.
    """
    from credigraph_spark.pipeline.textstats import tokens

    base = df.select(tokens(text_col).alias("tks"))
    n = F.size("tks")
    uni = base.select(F.explode("tks").alias("f"))
    bg = F.when(n >= 2, F.zip_with(
        F.slice("tks", 1, n - 1), F.slice("tks", 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b))
    ).otherwise(F.array().cast("array<string>"))
    big = base.select(F.explode(bg).alias("f"))
    feats = uni.unionByName(big).distinct().persist()
    n_feats = feats.count()
    out = None
    for k in buckets:
        h = F.pmod(
            F.conv(F.substring(
                F.md5(F.concat_ws("|", F.lit(str(seed)),
                                  F.col("f"))), 1, 15), 16, 10)
            .cast("long"), F.lit(int(k)))
        per = (feats.groupBy(h.alias("b"))
               .agg(F.count("*").alias("n")))
        st = per.agg(
            F.count("*").cast("long").alias("hit"),
            F.sum(F.when(F.col("n") >= 2, F.col("n")).otherwise(0))
            .cast("long").alias("coll")).collect()[0]
        row = (int(k), int(n_feats), int(st["hit"] or 0),
               int(st["coll"] or 0),
               round(int(st["coll"] or 0) / n_feats, round_digits))
        out = (out or []) + [row]
    feats.unpersist()
    return df.sparkSession.createDataFrame(
        out, "n_buckets LONG, n_features LONG, buckets_hit LONG, "
             "colliding_features LONG, collision_frac DOUBLE")


def otsu_threshold(df: DataFrame, value_col: str, bins: int = 32,
                   round_digits: int = 6) -> DataFrame:
    """Otsu adaptive threshold (X271; Otsu 1979, the image-binarization
    classic applied to score distributions): pick the histogram cut
    maximizing the between-class variance w0·w1·(mu0−mu1)² — the
    UNSUPERVISED way to split a bimodal quality/spam/length score into
    low/high when no labels exist for X248's supervised sweep. Emits
    the full criterion curve, best bin flagged (ties to the lower
    cut), so a flat curve is visible as exactly that — a warning the
    score is NOT bimodal and no threshold is meaningful.

    Returns one row per interior bin boundary: (thr, n_below, n_above,
    between_var, is_best) — thr is the boundary value (min + bin
    width x k), between_var from exact integer bin sums.

    Scale shape: one broadcast min/max row + ONE map-side-combinable
    groupBy to <= bins rows; the criterion curve and argmax run on
    that bounded table (dummy-partitioned windows). Integer counts
    and value sums throughout; between_var is the only float.
    """
    mm = df.agg(F.min(value_col).alias("_mn"),
                F.max(value_col).alias("_mx"))
    b = F.least(
        F.floor((F.col(value_col) - F.col("_mn")) * bins
                / (F.col("_mx") - F.col("_mn") + 1e-9)).cast("long"),
        F.lit(bins - 1))
    per = (df.where(F.col(value_col).isNotNull())
           .crossJoin(F.broadcast(mm))
           .select(b.alias("bin"),
                   F.col(value_col).cast("double").alias("v"),
                   "_mn", "_mx")
           .groupBy("bin")
           .agg(F.count("*").alias("n"), F.sum("v").alias("s"),
                F.first("_mn").alias("_mn"),
                F.first("_mx").alias("_mx")))
    w = (Window.partitionBy(F.lit(0)).orderBy("bin")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wt = Window.partitionBy(F.lit(0))
    cum = (per
           .withColumn("c_n", F.sum("n").over(w))
           .withColumn("c_s", F.sum("s").over(w))
           .withColumn("t_n", F.sum("n").over(wt))
           .withColumn("t_s", F.sum("s").over(wt))
           .where(F.col("c_n") > 0)
           .where(F.col("t_n") - F.col("c_n") > 0))
    mu0 = F.col("c_s") / F.col("c_n")
    mu1 = (F.col("t_s") - F.col("c_s")) / (F.col("t_n") - F.col("c_n"))
    w0 = F.col("c_n") / F.col("t_n")
    w1 = 1.0 - w0
    bv = w0 * w1 * (mu0 - mu1) * (mu0 - mu1)
    curve = cum.select(
        F.round(F.col("_mn") + (F.col("_mx") - F.col("_mn") + 1e-9)
                * (F.col("bin") + 1) / bins, round_digits).alias("thr"),
        F.col("c_n").cast("long").alias("n_below"),
        (F.col("t_n") - F.col("c_n")).cast("long").alias("n_above"),
        F.round(bv, round_digits).alias("between_var"))
    wb = (Window.partitionBy(F.lit(0))
          .orderBy(F.desc("between_var"), F.asc("thr")))
    return curve.withColumn("is_best",
                            F.row_number().over(wb) == 1)
