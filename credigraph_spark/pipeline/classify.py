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
