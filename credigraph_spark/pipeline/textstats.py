"""Text analysis for training-data curation: quality scoring, language ID,
token counting, document fingerprinting. All pure-SQL column expressions
(whole-stage codegen) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from credigraph_spark.session import eager_checkpoint

# minimal stopword sets for the n-gram/stopword-ratio language heuristic
_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "was"],
    "fr": ["le", "la", "les", "de", "des", "et", "est", "une", "que", "pour"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "den"],
    "es": ["el", "la", "los", "de", "que", "y", "es", "en", "un", "por"],
}


def tokens(col: str | Column) -> Column:
    """Whitespace+punctuation tokenization (BPE-ish regex split)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.filter(F.split(F.lower(c), r"[^a-z0-9']+"), lambda t: F.length(t) > 0)


def token_count(col: str | Column) -> Column:
    return F.size(tokens(col))


def text_quality(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc quality features: length, token count, mean word length,
    punctuation/alpha ratios, stopword ratio, uppercase ratio — the usual
    pre-training heuristics, each a codegen'd expression."""
    t = F.col(text_col)
    toks = tokens(text_col)
    n_tok = F.size(toks)
    n_char = F.length(t)
    n_alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    n_punct = F.length(F.regexp_replace(t, r"[^\.,;:!\?\"'\(\)]", ""))
    n_upper = F.length(F.regexp_replace(t, r"[^A-Z]", ""))
    en_stop = F.array(*[F.lit(w) for w in _STOPWORDS["en"]])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(en_stop, x)))
    return df.select(
        F.col(id_col),
        n_char.alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.when(n_tok > 0, n_char / n_tok).otherwise(0.0).alias("mean_word_len"),
        F.when(n_char > 0, n_alpha / n_char).otherwise(0.0).alias("alpha_ratio"),
        F.when(n_char > 0, n_punct / n_char).otherwise(0.0).alias("punct_ratio"),
        F.when(n_char > 0, n_upper / n_char).otherwise(0.0).alias("upper_ratio"),
        F.when(n_tok > 0, n_stop / n_tok).otherwise(0.0).alias("stopword_ratio"),
    )


def language_id(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Heuristic language ID: per-language stopword hit-rate, argmax wins
    (ties/zero hits -> 'und'). Arg-max as a struct max aggregation over a
    generated (lang, score) array — no UDF, no shuffle."""
    toks = tokens(text_col)
    n_tok = F.greatest(F.size(toks), F.lit(1))
    scores = []
    for lang, words in _STOPWORDS.items():
        arr = F.array(*[F.lit(w) for w in words])
        hits = F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))
        scores.append(F.struct((hits / n_tok).alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return df.select(
        F.col(id_col),
        F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und")).alias("lang_pred"),
        best["score"].alias("lang_score"),
    )


def repetition_stats(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     max_tokens: int | None = None) -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021 §A1.1
    adapted to token n-grams): unique-token fraction, coverage of the most
    frequent bigram, duplicated-trigram fraction. Boilerplate and
    looping-generator text scores high; the usual curation filter drops
    docs past thresholds.

    All metrics are per-ROW array expressions (split + higher-order
    functions) — zero shuffle, zero Python; a corpus scan at 100 TB is
    embarrassingly parallel. The most-frequent-bigram scan is O(distinct ·
    total) per doc, so ``max_tokens`` truncates pathological documents
    (set it at scale; the signal saturates long before 10k tokens).
    """
    toks = tokens(text_col)
    if max_tokens is not None:
        toks = F.slice(toks, 1, max_tokens)
    n = F.size(toks)
    uniq = F.size(F.array_distinct(toks))
    bg = F.when(n >= 2, F.zip_with(
        F.slice(toks, 1, n - 1), F.slice(toks, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )).otherwise(F.array().cast("array<string>"))
    tg = F.when(n >= 3, F.zip_with(
        F.slice(bg, 1, n - 2), F.slice(toks, 3, n - 2),
        lambda a, b: F.concat_ws(" ", a, b),
    )).otherwise(F.array().cast("array<string>"))
    top_bg = F.array_max(F.transform(
        F.array_distinct(bg),
        lambda d: F.size(F.filter(bg, lambda x: x == d)),
    ))
    return df.select(
        F.col(id_col),
        n.alias("n_tokens"),
        F.when(n > 0, uniq / n).otherwise(0.0).alias("uniq_token_frac"),
        F.when(n >= 2, 2.0 * top_bg / n).otherwise(0.0).alias("top_bigram_frac"),
        F.when(n >= 3,
               1.0 - F.size(F.array_distinct(tg)) / F.size(tg))
        .otherwise(0.0).alias("dup_trigram_frac"),
    )


def char_entropy(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 round_digits: int = 6) -> DataFrame:
    """Per-document Shannon entropy over characters (bits/char) — the
    cheap perplexity proxy of corpus curation: machine-generated or
    truncated-binary junk sits at the entropy extremes. Pure per-row
    array expressions like repetition_stats (zero shuffle); the
    Σ −p·log2(p) is a fixed-order fold over the distinct characters in
    first-appearance order, and log2 agrees across engines to the final
    rounding (same contract as Adamic-Adar's ln)."""
    chars = F.split(F.col(text_col), "")
    chars = F.filter(chars, lambda c: F.length(c) > 0)
    n = F.size(chars)
    ent = F.aggregate(
        F.array_distinct(chars),
        F.lit(0.0),
        lambda acc, d: acc - (
            F.size(F.filter(chars, lambda x: x == d)) / n
        ) * F.log2(F.size(F.filter(chars, lambda x: x == d)) / n),
    )
    return df.select(
        F.col(id_col),
        n.alias("n_chars"),
        F.size(F.array_distinct(chars)).alias("n_distinct_chars"),
        F.when(n > 0, F.round(ent, round_digits)).otherwise(0.0)
        .alias("char_entropy"),
    )


def benchmark_contamination(corpus: DataFrame, benchmark: DataFrame,
                            id_col: str = "doc_id", text_col: str = "text",
                            shingle_n: int = 5,
                            min_shared: int = 1) -> DataFrame:
    """Benchmark-contamination screen: corpus docs sharing ≥ ``min_shared``
    distinct word ``shingle_n``-grams with ANY benchmark document (the
    standard pre-training decontamination test, e.g. GPT-3 appendix C /
    PaLM §7). Returns (doc_id, n_shared_ngrams) for flagged docs.

    Scale shape: both sides explode to distinct shingles; the benchmark
    side is an eval suite — thousands of docs, not billions — so its
    shingle set is BROADCAST and the corpus side never shuffles: the scan
    stays map-side at 100 TB. Counting distinct shared shingles per doc is
    the only aggregation.
    """
    from credigraph_spark.pipeline.dedup import shingles

    c = corpus.select(
        F.col(id_col), F.explode(shingles(text_col, shingle_n)).alias("sh"))
    b = (benchmark
         .select(F.explode(shingles(text_col, shingle_n)).alias("sh"))
         .distinct())
    return (
        c.join(F.broadcast(b), "sh")
        .groupBy(id_col)
        .agg(F.count_distinct("sh").alias("n_shared_ngrams"))
        .where(F.col("n_shared_ngrams") >= min_shared)
    )


def document_fingerprint(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Normalization-robust fingerprint: md5 over lowercased,
    whitespace-collapsed, punctuation-stripped text (+ a 64-bit xxhash for
    cheap joins). Rolling/content-defined chunking is deliberately NOT
    used at this layer — fingerprints must be stable under re-partitioning."""
    norm = F.trim(F.regexp_replace(
        F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9\s]", ""), r"\s+", " "
    ))
    return df.select(
        F.col(id_col),
        F.md5(norm).alias("fingerprint"),
        F.xxhash64(norm).alias("fingerprint64"),
    )


def line_dedup_stats(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     round_digits: int = 8) -> DataFrame:
    """CCNet-style line-level duplication profile: split each document
    into trimmed non-empty lines, then per document report how many of
    its DISTINCT lines also appear in at least one OTHER document —
    (doc_id, n_lines, n_dup_lines, dup_ratio). The standard pre-filter
    before paragraph dedup (boilerplate lines — nav bars, footers —
    dominate web corpora).

    Scale shape: lines are keyed by sha2(line) so the corpus-frequency
    shuffle moves 32-byte digests instead of raw line text; the per-line
    doc-frequency is a partial-aggregatable count over the (doc, line)
    DISTINCT set, then one co-partitioned join back. No windows, no
    Python. Counts are integers; the ratio is one int/int division,
    rounded — exact in any engine."""
    lines = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.col(text_col), "\n")).alias("line"),
    ).select("doc_id", F.trim("line").alias("line")).where(F.length("line") > 0)
    doc_lines = lines.select(
        "doc_id", F.sha2("line", 256).alias("lh")).distinct()
    freq = doc_lines.groupBy("lh").agg(F.count("*").alias("ndocs"))
    per_doc = (
        doc_lines.join(freq, "lh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_lines"),
             F.sum(F.when(F.col("ndocs") > 1, 1).otherwise(0))
             .cast("long").alias("n_dup_lines"))
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_lines", F.lit(0)).alias("n_lines"),
            F.coalesce("n_dup_lines", F.lit(0)).alias("n_dup_lines"),
            F.when(F.coalesce("n_lines", F.lit(0)) > 0,
                   F.round(F.col("n_dup_lines") / F.col("n_lines"),
                           round_digits)).otherwise(0.0).alias("dup_ratio"))
    )


def tfidf_top_terms(df: DataFrame, n_docs: int, id_col: str = "doc_id",
                    text_col: str = "text", k: int = 3,
                    round_digits: int = 6) -> DataFrame:
    """Top-k TF-IDF terms per document: lowercase, split on runs of
    non-alphanumerics, score tf·ln(N/df), rank per doc by (score desc,
    term asc) — (doc_id, term, rnk, tfidf). The classic keyword/topic
    signal of corpus curation.

    ``n_docs`` is passed in (one upstream count) so N is a plan literal.
    Scale shape: one (doc, term) tf aggregation, one term df aggregation
    (both partial-aggregatable), a term-keyed join, then a PER-DOC window
    (bounded by a document's vocabulary, never the corpus). tf and df
    are exact integers; the only float is tf·ln(N/df) computed in the
    identical operation order on both engines. Ranking is over the
    ROUNDED score (desc) with a term-asc tiebreak: a 1-ulp cross-engine
    difference in ln() can never flip a rank unless two rounded scores
    collide — and then the string tiebreak is total."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"))
        .alias("term"),
    ).where(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(dfreq, "term").select(
        "doc_id", "term",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")),
                round_digits).alias("tfidf"),
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
        .select("doc_id", "term", "rnk", "tfidf")
    )


def pmi_top_pairs(df: DataFrame, n_docs: int, id_col: str = "doc_id",
                  text_col: str = "text", vocab_k: int = 100,
                  min_pair_docs: int = 2, k: int = 50,
                  round_digits: int = 6) -> DataFrame:
    """Top-k term pairs by document-level PMI — the classic collocation /
    topic-coherence signal: pmi(a,b) = ln(N * c(a,b) / (c(a) * c(b)))
    over DISTINCT-per-document term presence.

    The all-pairs explosion is controlled the way production PMI always
    is: a VOCABULARY CUTOFF. Only the global top ``vocab_k`` terms by
    (doc frequency desc, term asc — total order) form pairs, so the pair
    space is bounded by C(vocab_k, 2) regardless of corpus size, the
    vocab broadcasts, and the per-doc pair fan-out is at most
    C(min(|doc vocab|, vocab_k), 2). Counts are exact integers; the only
    float is the final ln(), rounded before the (pmi desc, a, b) ranking
    so cross-engine ulp drift cannot reorder."""
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"))
        .alias("term"),
    ).where(F.col("term") != "").distinct()
    dfreq = toks.groupBy("term").agg(F.count("*").alias("df"))
    vocab = (dfreq.orderBy(F.col("df").desc(), F.col("term").asc())
             .limit(vocab_k))
    dv = toks.join(F.broadcast(vocab), "term").select("doc_id", "term", "df")
    a = dv.select("doc_id", F.col("term").alias("a"), F.col("df").alias("ca"))
    b = dv.select("doc_id", F.col("term").alias("b"), F.col("df").alias("cb"))
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b", "ca", "cb")
        .agg(F.count("*").alias("cab"))
        .where(F.col("cab") >= min_pair_docs)
    )
    scored = pairs.select(
        "a", "b", "cab",
        F.round(F.log(F.lit(float(n_docs)) * F.col("cab")
                      / (F.col("ca") * F.col("cb"))),
                round_digits).alias("pmi"),
    )
    w = Window.partitionBy(F.lit(0)).orderBy(
        F.col("pmi").desc(), F.col("a").asc(), F.col("b").asc())
    # bounded input: <= C(vocab_k, 2) rows reach this window
    return (scored.withColumn("rnk", F.row_number().over(w).cast("long"))
            .where(F.col("rnk") <= k).select("a", "b", "cab", "pmi", "rnk"))


def gopher_quality(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_frac: float = 0.8,
    stopwords: tuple[str, ...] = ("the", "be", "to", "of", "and",
                                  "that", "have", "with"),
    min_stopwords: int = 2,
    round_digits: int = 8,
) -> DataFrame:
    """Gopher document-quality rules (Rae et al. 2021, Appendix A1.1):
    per document (doc_id, n_words, mean_word_len, alpha_frac, n_stop,
    keep) where keep ANDs the standard thresholds — word-count bounds,
    mean word length in [3,10], >=80% of words containing an alphabetic
    character, and at least ``min_stopwords`` DISTINCT stopwords from
    the canonical 8-word set (parameterized for non-English corpora).

    Scale shape: every signal is a per-row array fold over the
    whitespace token list (zero shuffle, whole-stage codegen — same
    family as text_quality/repetition_stats). mean_word_len and
    alpha_frac are single int/int divisions of exact counters, so the
    rounded doubles are bit-identical in any engine."""
    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != F.lit(""))
    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(words).cast("long").alias("n_words"),
        F.aggregate(words, F.lit(0).cast("long"),
                    lambda acc, w: acc + F.length(w)).alias("_chars"),
        F.size(F.filter(words, lambda w: w.rlike("[a-z]")))
        .cast("long").alias("_alpha"),
        F.size(F.array_intersect(
            F.array_distinct(words),
            F.array(*[F.lit(s) for s in stopwords])))
        .cast("long").alias("n_stop"),
    )
    d = d.select(
        "doc_id", "n_words",
        F.when(F.col("n_words") > 0,
               F.round(F.col("_chars") / F.col("n_words"), round_digits))
        .otherwise(0.0).alias("mean_word_len"),
        F.when(F.col("n_words") > 0,
               F.round(F.col("_alpha") / F.col("n_words"), round_digits))
        .otherwise(0.0).alias("alpha_frac"),
        "n_stop",
    )
    return d.select(
        "doc_id", "n_words", "mean_word_len", "alpha_frac", "n_stop",
        (
            (F.col("n_words") >= min_words)
            & (F.col("n_words") <= max_words)
            & (F.col("mean_word_len") >= min_mean_word_len)
            & (F.col("mean_word_len") <= max_mean_word_len)
            & (F.col("alpha_frac") >= min_alpha_frac)
            & (F.col("n_stop") >= min_stopwords)
        ).alias("keep"),
    )


def c4_line_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_kept_lines: int = 3,
    round_digits: int = 8,
) -> DataFrame:
    """C4 line-level cleaning (Raffel et al. 2020 §2.2): keep a line only
    if it (a) ends in terminal punctuation (. ! ? or a closing quote),
    (b) has at least ``min_words_per_line`` words, and (c) contains none
    of the boilerplate markers (curly brace, 'lorem ipsum',
    'javascript'); a document survives when at least ``min_kept_lines``
    lines survive. Returns (doc_id, n_lines, kept_lines, kept_words,
    kept_frac, keep).

    Scale shape: lines live in a per-row array; every rule is an array
    filter/fold — zero shuffle, codegen, no Python. kept_frac is one
    int/int division (engine-exact)."""
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda x: F.trim(x)),
        lambda x: x != F.lit(""))
    kept = F.filter(
        lines,
        lambda x: (
            x.rlike('[.!?”"\']$')
            & (F.size(F.filter(F.split(x, r"\s+"),
                               lambda w: w != F.lit(""))) >= min_words_per_line)
            & ~F.lower(x).contains("lorem ipsum")
            & ~x.contains("{")
            & ~F.lower(x).contains("javascript")
        ),
    )
    d = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("kept_lines"),
        F.aggregate(
            kept, F.lit(0).cast("long"),
            lambda acc, x: acc + F.size(
                F.filter(F.split(x, r"\s+"), lambda w: w != F.lit("")))
        ).alias("kept_words"),
    )
    return d.select(
        "doc_id", "n_lines", "kept_lines", "kept_words",
        F.when(F.col("n_lines") > 0,
               F.round(F.col("kept_lines") / F.col("n_lines"), round_digits))
        .otherwise(0.0).alias("kept_frac"),
        (F.col("kept_lines") >= min_kept_lines).alias("keep"),
    )


def dsir_importance(
    df: DataFrame,
    target: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_hex: int = 2,
    smoothing: float = 1.0,
    round_digits: int = 6,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): hash each document's
    word uni+bigrams into 16**bucket_hex buckets, estimate the target
    and raw (whole-corpus) bucket distributions with add-``smoothing``
    Laplace smoothing, and score every document by the summed
    log-likelihood ratio of its features:

        logw(d) = sum_{f in d} [ ln p_target(b(f)) - ln p_raw(b(f)) ]

    ``target`` is a boolean Column over ``df`` marking the in-domain
    subset. Returns (doc_id, n_feats, logw) for EVERY input doc
    (feature-less docs score 0.0). Buckets are the first ``bucket_hex``
    chars of md5(feature) — engine-portable (md5 is bit-identical
    everywhere), so the DuckDB oracle reproduces the exact bucketing.

    Scale shape: explode -> ONE map-side-combinable groupBy over at most
    16**bucket_hex bucket keys (256 by default — a bounded-size agg no
    matter the corpus), a crossJoin with a 1-row total, then a broadcast
    join of the tiny log-ratio table back onto the exploded features and
    a per-doc partial-agg sum. No driver collect, no window over data-
    sized input; the hot path is hash-agg + broadcast-hash-join."""
    words = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda w: w != F.lit(""))
    bigrams = F.when(
        F.size(words) >= 2,
        F.zip_with(F.slice(words, 1, F.size(words) - 1),
                   F.slice(words, 2, F.size(words) - 1),
                   lambda a, b: F.concat(a, F.lit(" "), b)),
    ).otherwise(F.array().cast("array<string>"))
    base = df.select(
        F.col(id_col).alias("doc_id"), target.alias("_tgt"),
        F.concat(words, bigrams).alias("_feats"))
    n_buckets = float(16 ** bucket_hex)
    feats = base.select(
        "doc_id", "_tgt",
        F.explode_outer("_feats").alias("_f")).withColumn(
        "_b", F.substring(F.md5(F.col("_f")), 1, bucket_hex))
    counts = (feats.where(F.col("_f").isNotNull())
              .groupBy("_b")
              .agg(F.count("*").alias("_cnt"),
                   F.sum(F.col("_tgt").cast("long")).alias("_tcnt")))
    totals = counts.agg(F.sum("_cnt").alias("_rt"), F.sum("_tcnt").alias("_tt"))
    ratio = counts.crossJoin(F.broadcast(totals)).select(
        "_b",
        (F.log((F.col("_tcnt") + smoothing) / (F.col("_tt") + smoothing * n_buckets))
         - F.log((F.col("_cnt") + smoothing) / (F.col("_rt") + smoothing * n_buckets))
         ).alias("_lr"))
    per_doc = (feats.where(F.col("_f").isNotNull())
               .join(F.broadcast(ratio), "_b")
               .groupBy("doc_id")
               .agg(F.count("*").cast("long").alias("n_feats"),
                    F.round(F.sum("_lr"), round_digits).alias("logw")))
    return (base.select("doc_id").join(per_doc, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_feats", F.lit(0).cast("long")).alias("n_feats"),
                    F.coalesce("logw", F.lit(0.0)).alias("logw")))


def dup_ngram_profile(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", shingle_n: int = 5,
                      round_digits: int = 8) -> DataFrame:
    """Cross-document duplicated n-gram profile: per document, how many
    of its DISTINCT word ``shingle_n``-grams also occur in at least one
    OTHER document — (doc_id, n_ngrams, n_dup_ngrams, dup_frac). The
    corpus-level near-duplicate diagnostic behind exact-substring
    training-data dedup (Lee et al. 2022, "Deduplicating Training Data
    Makes Language Models Better"): a high dup_frac flags boilerplate
    and templated spam before any pair-level dedup runs.

    Scale shape: the doc-frequency shuffle moves sha2 digests of the
    shingles, not shingle text (the line_dedup_stats trick — 32 bytes a
    row); the per-shingle document frequency is one partial-aggregatable
    count over per-doc-DISTINCT shingles, then one co-partitioned join
    back. Integers end-to-end; the fraction is a single rounded
    division."""
    from credigraph_spark.pipeline.dedup import shingles
    from credigraph_spark.session import eager_checkpoint

    spark = df.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # ONE hash(h) exchange serves both consumers (guide-style exchange
    # reuse): the digest stream is repartitioned by h and materialized
    # once; the doc-frequency groupBy(h) and the join-back on h then both
    # run exchange-free on that layout, instead of re-computing the
    # explode+sha2 stream twice and shuffling it twice.
    pairs = df.select(
        F.col(id_col),
        F.explode(shingles(text_col, shingle_n)).alias("sh"),
    ).select(F.col(id_col), F.sha2("sh", 256).alias("h"))
    pairs = pairs.repartition(shuffle_n, "h").transform(eager_checkpoint)
    freq = pairs.groupBy("h").agg(F.count("*").alias("docfreq"))
    return (pairs.join(freq, "h")
            .groupBy(id_col)
            .agg(F.count("*").alias("n_ngrams"),
                 F.sum(F.when(F.col("docfreq") >= 2, 1).otherwise(0))
                 .cast("long").alias("n_dup_ngrams"))
            .withColumn("dup_frac",
                        F.round(F.col("n_dup_ngrams") / F.col("n_ngrams"),
                                round_digits)))


def zipf_fit(df: DataFrame, text_col: str = "text", top_r: int = 1000,
             round_digits: int = 6) -> DataFrame:
    """One-row Zipf's-law fit over the corpus token-frequency spectrum:
    least-squares slope of ln(freq) on ln(rank) for the TOP ``top_r``
    ranks — alpha = -slope is the Zipf exponent, the standard vocabulary
    diagnostic for a training corpus (a healthy natural-language mix
    sits near alpha ~ 1; boilerplate/code-heavy corpora drift off it).

    Fitting the head is the production convention (the hapax tail
    deviates from the power law and would otherwise need every type
    ranked); it is also what makes this scale-free: term counting is one
    partial-aggregatable shuffle, the cut is a distributed
    TakeOrderedAndProject under the (freq desc, term asc) total order,
    and the row_number window sees only the bounded top_r rows (the
    pmi_top_pairs precedent). Corpus-wide n_tokens/n_types ride along as
    an Observation on the counts stream the top-R cut scans anyway —
    ONE pass, no persist (the pagerank dangling-mass trick). ln() is
    the only float; the regression sums run over <= top_r values and
    the outputs are rounded, so cross-engine ulp drift cannot surface.

    Output: (n_tokens, n_types, r_fit, alpha, intercept, r2). Eager:
    the operator runs its single action internally and returns the
    1-row result frame.
    """
    from pyspark.sql import Observation, Window

    tf = (df.select(
            F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"))
            .alias("term"))
          .where(F.col("term") != "")
          .groupBy("term").agg(F.count("*").alias("freq")))
    obs = Observation("zipf_totals")
    tf_obs = tf.observe(obs, F.sum("freq").alias("n_tokens"),
                        F.count(F.lit(1)).alias("n_types"))
    head = (tf_obs.orderBy(F.col("freq").desc(), F.col("term").asc())
            .limit(top_r))
    w = Window.partitionBy(F.lit(0)).orderBy(
        F.col("freq").desc(), F.col("term").asc())
    # bounded input: <= top_r rows reach this window
    xy = (head.withColumn("rnk", F.row_number().over(w))
          .select(F.log(F.col("rnk").cast("double")).alias("x"),
                  F.log(F.col("freq").cast("double")).alias("y")))
    fit = xy.agg(
        F.count("*").alias("r_fit"), F.sum("x").alias("sx"),
        F.sum("y").alias("sy"), F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy")).collect()[0]
    tot = obs.get
    n = float(fit.r_fit)
    cov = fit.sxy - fit.sx * fit.sy / n
    varx = fit.sxx - fit.sx * fit.sx / n
    vary = fit.syy - fit.sy * fit.sy / n
    slope = cov / varx
    return df.sparkSession.createDataFrame(
        [(int(tot["n_tokens"]), int(tot["n_types"]), int(fit.r_fit),
          round(-slope, round_digits),
          round((fit.sy - slope * fit.sx) / n, round_digits),
          round(cov * cov / (varx * vary), round_digits))],
        "n_tokens LONG, n_types LONG, r_fit LONG, alpha DOUBLE, "
        "intercept DOUBLE, r2 DOUBLE")


def heaps_fit(df: DataFrame, text_col: str = "text",
              round_digits: int = 6) -> DataFrame:
    """One-row Heaps'-law fit: per document, (n distinct types) vs
    (n tokens), least squares of ln(types) on ln(tokens) across the
    corpus — types ~ K * tokens^beta (beta ~ 0.4-0.6 for natural text;
    a collapsed beta flags template/duplicated content before any
    pairwise dedup runs).

    Per-document token and distinct-type counts are per-ROW array folds
    (zero shuffle, codegen); the whole fit is then ONE partial-
    aggregatable agg over the doc stream. Docs with < 2 tokens are
    excluded (a 1-token doc pins ln(tokens)=0 and says nothing about
    vocabulary growth).

    Output: (n_docs, beta, ln_k, r2).
    """
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                    lambda t: t != F.lit(""))
    per_doc = (df.select(F.size(toks).alias("m"),
                         F.size(F.array_distinct(toks)).alias("v"))
               .where(F.col("m") >= 2))
    xy = per_doc.select(F.log(F.col("m").cast("double")).alias("x"),
                        F.log(F.col("v").cast("double")).alias("y"))
    fit = xy.agg(
        F.count("*").alias("n_docs"), F.sum("x").alias("sx"),
        F.sum("y").alias("sy"), F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"))
    n = F.col("n_docs").cast("double")
    cov = F.col("sxy") - F.col("sx") * F.col("sy") / n
    varx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    vary = F.col("syy") - F.col("sy") * F.col("sy") / n
    slope = cov / varx
    return fit.select(
        "n_docs",
        F.round(slope, round_digits).alias("beta"),
        F.round((F.col("sy") - slope * F.col("sx")) / n,
                round_digits).alias("ln_k"),
        F.round(cov * cov / (varx * vary), round_digits).alias("r2"))


def chi2_discriminative_terms(df: DataFrame, class_col: str = "lang",
                              id_col: str = "doc_id",
                              text_col: str = "text",
                              vocab_k: int = 200, k: int = 5,
                              round_digits: int = 6) -> DataFrame:
    """Top-k class-discriminative terms by chi-square (the classic
    feature-selection statistic a quality/domain classifier is built
    on): for each (term, class) 2×2 presence contingency
    (a = docs of the class containing the term, b = other-class docs
    containing it, c/d their complements), χ² = N(ad−bc)²
    / ((a+b)(c+d)(a+c)(b+d)), ranked per class on the ROUNDED score
    (ulp-proof ordering, the pmi/tfidf discipline).

    Explosion control is the pmi_top_pairs convention: only the global
    top ``vocab_k`` terms by doc frequency (broadcast, (df desc, term)
    total order) enter the contingency — the per-class window is then
    bounded by vocab_k rows. Counts are exact integers; χ² is the one
    float. Output: (class, term, n_class_with_term, chi2, rnk)."""
    from pyspark.sql import Window

    toks = (df.select(
        F.col(id_col).alias("doc_id"), F.col(class_col).alias("cls"),
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"))
        .alias("term"))
        .where(F.col("term") != "").distinct())
    dfreq = toks.groupBy("term").agg(F.count("*").alias("df"))
    vocab = (dfreq.orderBy(F.col("df").desc(), F.col("term").asc())
             .limit(vocab_k))
    tv = toks.join(F.broadcast(vocab), "term")
    n_docs = df.select(F.col(id_col)).distinct().count()
    ncls = (df.select(F.col(id_col).alias("doc_id"),
                      F.col(class_col).alias("cls")).distinct()
            .groupBy("cls").agg(F.count("*").alias("n_cls")))
    a = (tv.groupBy("cls", "term", "df")
         .agg(F.count("*").alias("a"))
         .join(F.broadcast(ncls), "cls"))
    N = F.lit(float(n_docs))
    av = F.col("a").cast("double")
    b = F.col("df").cast("double") - av
    c = F.col("n_cls").cast("double") - av
    d = N - F.col("df") - F.col("n_cls") + av
    num = N * (av * d - b * c) * (av * d - b * c)
    den = ((av + b) * (c + d) * (av + c) * (b + d))
    scored = a.select(
        F.col("cls").alias(class_col), "term",
        F.col("a").alias("n_class_with_term"),
        F.when(den > 0, F.round(num / den, round_digits))
        .otherwise(F.lit(0.0)).alias("chi2"))
    w = Window.partitionBy(class_col).orderBy(
        F.col("chi2").desc(), F.col("term").asc())
    # bounded: <= vocab_k rows per class reach this window
    return (scored.withColumn("rnk", F.row_number().over(w).cast("long"))
            .where(F.col("rnk") <= k))


def readability(df: DataFrame, id_col: str = "doc_id",
                text_col: str = "text",
                round_digits: int = 4) -> DataFrame:
    """Per-doc Flesch reading-ease and Flesch-Kincaid grade from the
    classic vowel-group syllable heuristic: syllables(word) =
    max(1, count of [aeiouy]+ runs), sentences = non-empty [.!?]+
    segments, words = the engine's standard token split. The cheap
    readability gate of corpus curation (C4-era pipelines bucket on
    exactly this family).

    flesch = 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)
    fk_grade = 0.39·(words/sentences) + 11.8·(syllables/words) − 15.59

    Every signal is a per-row array fold (split + transform + aggregate
    — zero shuffle, codegen); the two ratios are the only floats,
    outputs rounded. Docs with no words emit NULLs (nothing to read)."""
    toks = F.filter(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                    lambda t: t != F.lit(""))
    n_words = F.size(toks)
    syl = F.aggregate(
        toks, F.lit(0),
        lambda acc, w: acc + F.greatest(
            F.size(F.split(w, "[aeiouy]+")) - 1, F.lit(1)))
    n_sent = F.size(F.filter(
        F.split(F.col(text_col), r"[.!?]+"),
        lambda s: F.length(F.trim(s)) > 0))
    n_sent_eff = F.greatest(n_sent, F.lit(1))
    wps = n_words.cast("double") / n_sent_eff
    spw = syl.cast("double") / n_words
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        syl.alias("n_syllables"),
        n_sent.alias("n_sentences"),
        F.when(n_words > 0,
               F.round(F.lit(206.835) - F.lit(1.015) * wps
                       - F.lit(84.6) * spw, round_digits))
        .otherwise(F.lit(None).cast("double")).alias("flesch"),
        F.when(n_words > 0,
               F.round(F.lit(0.39) * wps + F.lit(11.8) * spw
                       - F.lit(15.59), round_digits))
        .otherwise(F.lit(None).cast("double")).alias("fk_grade"))


def source_quality_rollup(df: DataFrame, source_col: str = "source",
                          text_col: str = "text",
                          stopwords: tuple[str, ...] | None = None,
                          min_stopwords: int = 2,
                          round_digits: int = 6) -> DataFrame:
    """(source, n_docs, gopher_keep_rate, mean_tokens, lang_entropy) —
    the per-source curation dashboard: which ingestion source is
    producing junk BEFORE per-document filtering throws it away
    one doc at a time. gopher keep rate reuses the X83 rules verbatim;
    lang_entropy is the Shannon entropy of the language_id distribution
    within the source (0 = monolingual, high = mixed/suspicious).

    One pass over the corpus (the gopher/lang signals are per-row
    folds) + two partial-agg rollups; the entropy's inner (source,
    lang) table is bounded at sources × languages."""
    gk = {} if stopwords is None else {
        "stopwords": stopwords, "min_stopwords": min_stopwords}
    g = gopher_quality(df, id_col=source_col, text_col=text_col, **gk) \
        .withColumnRenamed("doc_id", "source")
    lid = language_id(df, id_col=source_col, text_col=text_col) \
        .withColumnRenamed("doc_id", "source")
    base = g.select("source", "n_words",
                    F.col("keep").cast("int").alias("k"))
    per_source = base.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("k"), round_digits).alias("gopher_keep_rate"),
        F.round(F.avg("n_words"), round_digits).alias("mean_tokens"))
    sl = (lid.groupBy("source", "lang_pred")
          .agg(F.count("*").alias("c")))
    tot = sl.groupBy("source").agg(F.sum("c").alias("t"))
    # negate AFTER rounding: a monolingual source's sum of p*log2(p)
    # terms is exactly 0.0 and the oracle's ROUND(-SUM(..)) carries the
    # IEEE sign through as -0.0; round-then-negate reproduces that bit
    # (and is identical for every nonzero value — both engines round
    # half away from zero, which is sign-symmetric).
    ent = (sl.join(tot, "source")
           .groupBy("source")
           .agg((-F.round(
               F.sum((F.col("c") / F.col("t"))
                     * F.log2(F.col("c") / F.col("t"))),
               round_digits)).alias("lang_entropy")))
    return per_source.join(ent, "source")


def source_js_divergence(df: DataFrame, source_col: str = "source",
                         text_col: str = "text", vocab_k: int = 200,
                         round_digits: int = 6) -> DataFrame:
    """(source_a, source_b, js_bits) — Jensen-Shannon divergence
    between per-source unigram distributions over the shared top
    ``vocab_k`` vocabulary: the symmetric, bounded-[0,1] "how different
    is this source's language" matrix that drives mixture reweighting
    (DSIR's importance weights are the per-document view; this is the
    source-pair view).

    JS(P,Q) = Σ p/2·log2(p/m) + q/2·log2(q/m), m=(p+q)/2, with 0-count
    terms contributing their defined limit (0 for p=0 side). The vocab
    cutoff (df desc, term — the pmi discipline) bounds the distribution
    support, so the pair matrix costs sources² × vocab_k; token
    counting is the one corpus-wide shuffle. Distributions are exact
    integer ratios; log2 is the only float, output rounded."""
    toks = (df.select(
        F.col(source_col).alias("src_key"),
        F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"))
        .alias("term"))
        .where(F.col("term") != ""))
    dfreq = toks.groupBy("term").agg(F.count("*").alias("cnt"))
    vocab = (dfreq.orderBy(F.col("cnt").desc(), F.col("term").asc())
             .limit(vocab_k).select("term"))
    tc = (toks.join(F.broadcast(vocab), "term")
          .groupBy("src_key", "term").agg(F.count("*").alias("c")))
    tot = tc.groupBy("src_key").agg(F.sum("c").alias("t"))
    p = (tc.join(tot, "src_key")
         .select("src_key", "term",
                 (F.col("c").cast("double") / F.col("t")).alias("p")))
    # explicit bounded (pair x vocab) grid: a term absent from one
    # side must still contribute the present side's p/2*log2(2) mass —
    # a term-keyed join would silently drop those zero-side rows
    srcs = tot.select(F.col("src_key"))
    pairs = (srcs.select(F.col("src_key").alias("source_a"))
             .crossJoin(srcs.select(F.col("src_key").alias("source_b")))
             .where(F.col("source_a") < F.col("source_b")))
    grid = pairs.crossJoin(F.broadcast(vocab))
    pair = (grid
            .join(p.select(F.col("src_key").alias("source_a"), "term",
                           F.col("p").alias("pa")),
                  ["source_a", "term"], "left")
            .join(p.select(F.col("src_key").alias("source_b"), "term",
                           F.col("p").alias("pb")),
                  ["source_b", "term"], "left"))
    pa = F.coalesce("pa", F.lit(0.0))
    pb = F.coalesce("pb", F.lit(0.0))
    m = (pa + pb) / 2
    contrib = (F.when(pa > 0, pa / 2 * F.log2(pa / m)).otherwise(0.0)
               + F.when(pb > 0, pb / 2 * F.log2(pb / m)).otherwise(0.0))
    return (pair.groupBy("source_a", "source_b")
            .agg(F.round(F.sum(contrib), round_digits).alias("js_bits")))


def curation_threshold_sweep(df: DataFrame, id_col: str = "doc_id",
                             text_col: str = "text",
                             size_col: str = "n_chars",
                             qs: tuple[float, ...] = (0.1, 0.25, 0.5,
                                                      0.75, 0.9),
                             round_digits: int = 6) -> DataFrame:
    """(q, threshold, n_kept, kept_frac, mean_size) — the filter-tuning
    curve: for each exact quantile threshold of the char-entropy score,
    how many documents survive a "keep if entropy ≥ t" filter and how
    big they are. THE table you look at before committing a quality
    cutoff — per-doc scores tell you nothing about corpus-level yield.

    Thresholds are EXACT quantiles (analytics.exact_quantiles — bit-
    checkable, no sketch); the sweep is one broadcast cross join of the
    |qs|-row threshold table against the scored stream, partial-agg'd
    per q (|qs| passes' worth of rows in ONE scan). Scores are the
    6dp-rounded entropy, so threshold comparisons are cross-engine
    stable."""
    from credigraph_spark.analytics import exact_quantiles

    scored = (char_entropy(df, id_col=id_col, text_col=text_col)
              .join(df.select(F.col(id_col),
                              F.col(size_col).alias("_sz")), id_col)
              .select(F.col("char_entropy").alias("s"), "_sz"))
    scored = scored.transform(eager_checkpoint)  # feeds quantiles + sweep
    n = scored.count()
    thr = exact_quantiles(scored, "s", qs=qs)
    return (scored.crossJoin(F.broadcast(thr))
            .where(F.col("s") >= F.col("value"))
            .groupBy("q", "value")
            .agg(F.count("*").alias("n_kept"),
                 F.round(F.count("*") / F.lit(float(n)),
                         round_digits).alias("kept_frac"),
                 F.round(F.avg("_sz"), round_digits).alias("mean_size"))
            .withColumnRenamed("value", "threshold"))


def vocab_coverage(df: DataFrame, text_col: str = "text",
                   qs: tuple[float, ...] = (0.5, 0.9, 0.99),
                   num_ranges: int | None = None,
                   round_digits: int = 6) -> DataFrame:
    """(q, n_types_needed, coverage) — how many top-frequency types
    cover q of the corpus token mass: THE tokenizer/vocab-sizing table
    (a 32k vocab covering 99% of mass vs 90% is a different model).
    For each q, the smallest prefix of the (freq desc, term) ranking
    whose cumulative mass reaches q·total, with the coverage actually
    attained at that prefix.

    Scale shape: term counting is one partial-agg shuffle; the global
    cumulative (rank, mass) pair comes from the O3 construction over
    (−freq, term) range partitioning — both running totals in the same
    pass, NO single-partition window; threshold pick is one broadcast
    band join (the exact_quantiles trick)."""
    from pyspark.sql import Window

    tf = (df.select(
            F.explode(F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"))
            .alias("term"))
          .where(F.col("term") != "")
          .groupBy("term").agg(F.count("*").alias("freq")))
    if num_ranges is None:
        num_ranges = max(32, df.rdd.getNumPartitions())
    parts = (tf.withColumn("_nf", -F.col("freq"))
             .repartitionByRange(num_ranges, "_nf", "term")
             .withColumn("_pid", F.spark_partition_id()))
    wloc = (Window.partitionBy("_pid").orderBy("_nf", "term")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = (parts.withColumn("_lc", F.count("*").over(wloc))
             .withColumn("_lm", F.sum("freq").over(wloc)))
    totals = local.groupBy("_pid").agg(F.count("*").alias("_tc"),
                                       F.sum("freq").alias("_tm"))
    woff = (Window.partitionBy(F.lit(0)).orderBy("_pid")
            .rowsBetween(Window.unboundedPreceding, -1))
    offs = (totals
            .withColumn("_oc", F.coalesce(F.sum("_tc").over(woff),
                                          F.lit(0)))
            .withColumn("_om", F.coalesce(F.sum("_tm").over(woff),
                                          F.lit(0))))
    cum = (local.join(F.broadcast(offs.select("_pid", "_oc", "_om")),
                      "_pid")
           .select((F.col("_oc") + F.col("_lc")).alias("rnk"),
                   (F.col("_om") + F.col("_lm")).alias("cm"),
                   "freq"))
    total = tf.agg(F.sum("freq")).collect()[0][0]
    spark = df.sparkSession
    thr = spark.createDataFrame(
        [(float(q), float(q) * float(total)) for q in qs],
        "q DOUBLE, t DOUBLE")
    return (cum.join(F.broadcast(thr),
                     (F.col("cm") - F.col("freq") < F.col("t"))
                     & (F.col("t") <= F.col("cm")))
            .select("q", F.col("rnk").alias("n_types_needed"),
                    F.round(F.col("cm") / F.lit(float(total)),
                            round_digits).alias("coverage")))


def lm_cross_entropy(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     round_digits: int = 6,
                     bucket_width: float = 0.5) -> DataFrame:
    """Unigram-LM cross-entropy / perplexity per document — the CCNet
    perplexity-filter shape (Wenzek et al. 2020) with the corpus's own
    unigram MLE standing in for the external KenLM model:

        H(d) = -(1/n_d) * sum_t log2 p(token_t),   ppl(d) = 2^H(d)

    plus a fixed-width histogram bucket (floor(H / bucket_width)) so a
    curation pipeline can threshold on the H distribution directly.
    Documents whose tokens the corpus model finds surprising (rare-token
    soup, binary junk) land in the high-H buckets; boilerplate lands low.

    Scale shape: tf = ONE map-side-combinable groupBy(doc, token); the
    model is a second bounded groupBy over the vocab + a crossJoin with
    the 1-row total; scoring is a broadcast join of the (vocab-sized)
    logprob table onto tf and a per-doc partial-agg sum. No window over
    data-sized input, no driver collect. At 100 TB you would cap the
    vocab by min-count and route the tail through one OOV bucket; here
    every token is in-vocab by construction (model == corpus). The
    per-doc float sum is rounded to ``round_digits`` (same cross-engine
    contract as dsir_importance's logw); ppl and the bucket are derived
    from the ROUNDED H so they can never disagree across engines."""
    base = df.select(F.col(id_col).alias("doc_id"),
                     tokens(text_col).alias("_toks"))
    tf = (base.select("doc_id", F.explode("_toks").alias("tok"))
          .groupBy("doc_id", "tok").agg(F.count("*").alias("tf")))
    vocab = tf.groupBy("tok").agg(F.sum("tf").alias("c"))
    total = vocab.agg(F.sum("c").alias("n"))
    logp = (vocab.crossJoin(F.broadcast(total))
            .select("tok", F.log2(F.col("c").cast("double")
                                  / F.col("n")).alias("logp")))
    h = F.round(-F.sum(F.col("tf") * F.col("logp")) / F.sum("tf"),
                round_digits)
    pd_ = (tf.join(F.broadcast(logp), "tok")
           .groupBy("doc_id")
           .agg(F.sum("tf").cast("long").alias("n_tokens"),
                h.alias("h_bits")))
    return (base.select("doc_id").join(pd_, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("n_tokens", F.lit(0).cast("long")).alias("n_tokens"),
                F.coalesce("h_bits", F.lit(0.0)).alias("h_bits"),
                F.round(F.pow(F.lit(2.0),
                              F.coalesce("h_bits", F.lit(0.0))),
                        round_digits).alias("ppl"),
                F.floor(F.coalesce("h_bits", F.lit(0.0))
                        / F.lit(bucket_width)).cast("long").alias("h_bucket")))


def bigram_cross_entropy(df: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text",
                         lam: float = 0.7,
                         round_digits: int = 6) -> DataFrame:
    """Interpolated bigram-LM cross-entropy per document — one rung up
    from lm_cross_entropy toward the KenLM n-gram filter: Jelinek-Mercer
    smoothing  p(w|v) = lam * c(vw)/c(v.) + (1-lam) * c(w)/N  with the
    corpus as its own training set. H counts the n-1 bigram transitions
    (the unigram start token is scored by lm_cross_entropy; splitting
    the two keeps each oracle a single model).

    Scale shape: bigrams via zip_with on the token array (per-row, no
    shuffle), ONE groupBy(doc, v, w) tf agg, a bounded groupBy for the
    bigram model, a broadcast context-count join, a broadcast unigram
    join, then the per-doc partial-agg sum rounded to ``round_digits``
    (dsir contract). c(v.) is derived as the sum of c(vw) over w — the
    continuation-context count — so the model is closed under its own
    counts (no separate pass)."""
    base = df.select(F.col(id_col).alias("doc_id"),
                     tokens(text_col).alias("_toks"))
    toks = base.withColumn("_n", F.size("_toks"))
    bg = toks.where(F.col("_n") >= 2).select(
        "doc_id",
        F.explode(F.zip_with(
            F.slice("_toks", 1, F.col("_n") - 1),
            F.slice("_toks", 2, F.col("_n") - 1),
            lambda a, b: F.struct(a.alias("v"), b.alias("w")),
        )).alias("_p")).select("doc_id", "_p.v", "_p.w")
    tf = bg.groupBy("doc_id", "v", "w").agg(F.count("*").alias("tf"))
    model = tf.groupBy("v", "w").agg(F.sum("tf").alias("c_vw"))
    ctx = model.groupBy("v").agg(F.sum("c_vw").alias("c_v"))
    uni = (bg.groupBy("w").agg(F.count("*").alias("c_w"))
           .crossJoin(F.broadcast(
               bg.agg(F.count("*").alias("n_bg")))))
    logp = (model.join(F.broadcast(ctx), "v")
            .join(F.broadcast(uni), "w")
            .select("v", "w",
                    F.log2(F.lit(lam) * F.col("c_vw") / F.col("c_v")
                           + F.lit(1.0 - lam) * F.col("c_w") / F.col("n_bg")
                           ).alias("logp")))
    pd_ = (tf.join(F.broadcast(logp), ["v", "w"])
           .groupBy("doc_id")
           .agg(F.sum("tf").cast("long").alias("n_bigrams"),
                F.round(-F.sum(F.col("tf") * F.col("logp")) / F.sum("tf"),
                        round_digits).alias("h2_bits")))
    return (base.select("doc_id").join(pd_, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_bigrams",
                               F.lit(0).cast("long")).alias("n_bigrams"),
                    F.coalesce("h2_bits", F.lit(0.0)).alias("h2_bits"),
                    F.round(F.pow(F.lit(2.0),
                                  F.coalesce("h2_bits", F.lit(0.0))),
                            round_digits).alias("ppl2")))


def bpe_learn(df: DataFrame, n_merges: int = 3,
              text_col: str = "text") -> DataFrame:
    """Learn the first ``n_merges`` BPE merges (Sennrich et al. 2016)
    from the corpus. Classic shape: train on the WORD-FREQUENCY DICT,
    not the raw text — one map-side-combinable groupBy(word) is the only
    data-sized shuffle; every merge round then runs over the distinct
    vocabulary (a few GB at 100 TB corpus scale), with the argmax pair a
    1-row driver action per round (the engine's driver-loop convention).

    Symbol state per word is a fully-delimited string '<k><e><y>' so
    merge application is ONE literal replace('<a><b>', '<ab>') — every
    symbol is bracket-delimited, so a symbol that is a suffix/prefix of
    another can never false-match, and adjacent matches share no
    characters, so replace-all handles chains ('<a><b><a><b>' ->
    '<ab><ab>') in one pass. '<'/'>' cannot collide: the tokenizer
    alphabet is [a-z0-9'].

    Ties broken (freq DESC, lhs ASC, rhs ASC). Returns one row per
    learned merge: (rank, lhs, rhs, freq)."""
    spark = df.sparkSession
    words = (df.select(F.explode(tokens(text_col)).alias("w"))
             .groupBy("w").agg(F.count("*").alias("cnt")))
    vocab = words.select(
        "cnt",
        F.concat(F.lit("<"),
                 F.array_join(F.filter(F.split(F.col("w"), ""),
                                       lambda c: F.length(c) > 0), "><"),
                 F.lit(">")).alias("state")).transform(eager_checkpoint)
    out = []
    for rank in range(1, n_merges + 1):
        syms = F.split(
            F.substring(F.col("state"), 2, F.length("state") - 2), "><")
        pairs = vocab.select(
            "cnt",
            F.explode(F.zip_with(
                F.slice(syms, 1, F.size(syms) - 1),
                F.slice(syms, 2, F.size(syms) - 1),
                lambda a, b: F.struct(a.alias("lhs"), b.alias("rhs")),
            )).alias("p")).where(F.size(syms) >= 2)
        best = (pairs.groupBy("p.lhs", "p.rhs")
                .agg(F.sum("cnt").alias("freq"))
                .orderBy(F.desc("freq"), F.asc("lhs"), F.asc("rhs"))
                .limit(1).collect())
        if not best:
            break
        lhs, rhs, freq = best[0].lhs, best[0].rhs, int(best[0].freq)
        out.append((rank, lhs, rhs, freq))
        vocab = vocab.select(
            "cnt",
            F.replace(F.col("state"),
                      F.lit(f"<{lhs}><{rhs}>"),
                      F.lit(f"<{lhs}{rhs}>")).alias("state")
        ).transform(eager_checkpoint)
    return spark.createDataFrame(
        out, "rank INT, lhs STRING, rhs STRING, freq BIGINT")


def bpe_fertility(df: DataFrame, n_merges: int = 3,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Apply the first ``n_merges`` learned BPE merges (bpe_learn) to
    every document and report tokenizer-fertility stats: word count,
    subword count after merging, fertility = subwords/word — the metric
    tokenizer teams track per language/source slice. Encoding is a
    chain of ``n_merges`` LITERAL replaces on the bracket-delimited
    word state (JVM, zero shuffle, zero Python); the merge list itself
    is vocab-sized and driver-held."""
    merges = bpe_learn(df, n_merges=n_merges, text_col=text_col).collect()
    base = df.select(F.col(id_col).alias("doc_id"),
                     tokens(text_col).alias("_toks"))
    w = base.select("doc_id", F.explode("_toks").alias("w"))
    state = F.concat(
        F.lit("<"),
        F.array_join(F.filter(F.split(F.col("w"), ""),
                              lambda c: F.length(c) > 0), "><"),
        F.lit(">"))
    for m in merges:
        state = F.replace(state, F.lit(f"<{m.lhs}><{m.rhs}>"),
                          F.lit(f"<{m.lhs}{m.rhs}>"))
    syms = F.split(F.substring(state, 2, F.length(state) - 2), "><")
    per_doc = (w.select("doc_id", F.size(syms).alias("n_sub"))
               .groupBy("doc_id")
               .agg(F.count("*").cast("long").alias("n_words"),
                    F.sum("n_sub").cast("long").alias("n_subwords")))
    return (base.select("doc_id").join(per_doc, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("n_words", F.lit(0).cast("long")).alias("n_words"),
                F.coalesce("n_subwords",
                           F.lit(0).cast("long")).alias("n_subwords"),
                F.when(F.col("n_words") > 0,
                       F.round(F.col("n_subwords").cast("double")
                               / F.col("n_words"), 8))
                .otherwise(0.0).alias("fertility")))


def winnowing_pairs(df: DataFrame, k: int = 4, w: int = 4,
                    max_doc_freq: int = 10, top: int = 50,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    2003 — the MOSS algorithm) + cross-doc match pairs: hash every
    token k-gram, slide a window of ``w`` hashes and keep each window's
    MINIMUM — a position-robust sample guaranteeing any shared run of
    >= w+k-1 tokens shares a fingerprint. Pairs of docs are ranked by
    shared fingerprint count: the local-overlap detector exact dedup
    and MinHash both miss (they are whole-doc global).

    Everything up to the pair join is per-row ARRAY expressions
    (transform/slice/array_min — zero shuffle, stays in codegen);
    fingerprints shared by more than ``max_doc_freq`` docs are dropped
    before pairing (the rare-shingle cap that keeps the join
    sub-quadratic — boilerplate n-grams pair everything with
    everything). md5-derived hashes make the whole table
    bit-reproducible in SQL.

    Returns top ``top`` (doc_a, doc_b, shared) by shared desc with an
    id tie-break."""
    toks = tokens(text_col)
    kg = F.when(
        F.size("_toks") >= k,
        F.expr(
            f"transform(sequence(1, size(_toks) - {k - 1}), i -> "
            f"cast(conv(substring(md5(concat_ws(' ', "
            f"slice(_toks, i, {k}))), 1, 8), 16, 10) as bigint))"),
    ).otherwise(F.array().cast("array<bigint>"))
    base = df.select(F.col(id_col).alias("doc_id"), toks.alias("_toks")) \
             .select("doc_id", kg.alias("_kg"))
    mins = F.when(
        F.size("_kg") >= w,
        F.expr(f"transform(sequence(1, size(_kg) - {w - 1}), j -> "
               f"array_min(slice(_kg, j, {w})))"),
    ).otherwise(F.when(F.size("_kg") > 0,
                       F.array(F.array_min("_kg")))
                .otherwise(F.array().cast("array<bigint>")))
    fps = (base.select("doc_id",
                       F.explode(F.array_distinct(mins)).alias("fp"))
           .distinct())
    rare = (fps.groupBy("fp").agg(F.count("*").alias("_df"))
            .where(F.col("_df") <= max_doc_freq))
    kept = fps.join(rare.select("fp"), "fp")
    pairs = (kept.select("fp", F.col("doc_id").alias("doc_a"))
             .join(kept.select("fp", F.col("doc_id").alias("doc_b")),
                   "fp")
             .where(F.col("doc_a") < F.col("doc_b"))
             .groupBy("doc_a", "doc_b")
             .agg(F.count("*").cast("long").alias("shared")))
    return (pairs.orderBy(F.desc("shared"), F.asc("doc_a"),
                          F.asc("doc_b")).limit(top))


def ngram_novelty(df: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text", shingle_n: int = 3,
                  round_digits: int = 8) -> DataFrame:
    """Per-document n-gram novelty (X227): the share of a document's
    DISTINCT word n-grams whose FIRST corpus occurrence (minimum id over
    all documents containing the gram) is this document. Ingest-order
    novelty is the standard redundancy-growth curve for a training
    corpus: as a crawl accumulates, per-doc novelty decays, and docs
    under a novelty floor are candidates for dropping before pair-level
    dedup even runs (the attribution complement of dup_ngram_profile,
    which says "duplicated somewhere" without saying who was first).

    Returns (id, n_ngrams, n_novel, novelty) per document.

    Scale shape: same as dup_ngram_profile — the shuffle moves sha2
    digests of the shingles (32 bytes a row, never shingle text); the
    per-gram first-occurrence is ONE map-side-combinable MIN aggregate,
    then one co-partitioned join back on the digest. Integers
    end-to-end; the fraction is a single rounded division.
    """
    from credigraph_spark.pipeline.dedup import shingles

    pairs = df.select(
        F.col(id_col),
        F.explode(shingles(text_col, shingle_n)).alias("sh"),
    ).select(F.col(id_col), F.sha2("sh", 256).alias("h"))
    first = pairs.groupBy("h").agg(F.min(id_col).alias("first_id"))
    return (pairs.join(first, "h")
            .groupBy(id_col)
            .agg(F.count("*").cast("long").alias("n_ngrams"),
                 F.sum(F.when(F.col("first_id") == F.col(id_col), 1)
                       .otherwise(0)).cast("long").alias("n_novel"))
            .withColumn("novelty",
                        F.round(F.col("n_novel") / F.col("n_ngrams"),
                                round_digits)))


def encoding_health(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Encoding-health / mojibake screen (X245): per-document counts of
    U+FFFD replacement characters (the scar a lossy decode leaves),
    C0 control characters other than tab/newline/CR (binary junk
    masquerading as text), and non-ASCII characters (context for the
    other two — high non-ASCII alone is just non-English text, NOT a
    flag). Docs with any replacement or control characters are
    flagged — the decode-sanity gate a crawl pipeline runs before any
    text statistic can be trusted.

    Returns (id, n_chars, n_replacement, n_control, n_non_ascii,
    flagged).

    Scale shape: four per-row length/regexp expressions — zero
    shuffle, zero Python, whole-stage codegen; the 100 TB cost is the
    scan itself.
    """
    t = F.col(text_col)

    def nmatch(pattern):
        return (F.length(t)
                - F.length(F.regexp_replace(t, pattern, ""))
                ).cast("long")

    return df.select(
        F.col(id_col),
        F.length(t).cast("long").alias("n_chars"),
        nmatch("�").alias("n_replacement"),
        nmatch(r"[\x00-\x08\x0B\x0C\x0E-\x1F]").alias("n_control"),
        nmatch(r"[^\x00-\x7F]").alias("n_non_ascii"),
    ).withColumn(
        "flagged",
        (F.col("n_replacement") > 0) | (F.col("n_control") > 0))


def source_boilerplate(df: DataFrame, id_col: str = "doc_id",
                       source_col: str = "source",
                       text_col: str = "text", shingle_n: int = 3,
                       df_threshold_tenths: int = 5,
                       round_digits: int = 6) -> DataFrame:
    """Per-source template/boilerplate profile (X247): a shingle is
    BOILERPLATE for a source when it appears in at least
    df_threshold_tenths/10 of that source's documents (site headers,
    footers, nav chrome — the text that repeats across one site but
    not the web); each document reports what fraction of its distinct
    shingles are its own source's boilerplate. The site-template
    complement of X74's corpus-global line dedup: a doc can be 100%
    unique corpus-wide and still be 80% template. Sources with a
    single document have no boilerplate by definition (a threshold
    over one doc is meaningless).

    Returns (id, source, n_shingles, n_boiler, boiler_frac).

    Scale shape: shingles shuffle as sha2 digests; the doc-frequency
    is ONE map-side-combinable count per (source, digest); the
    threshold test is exact integer (10*df >= t*n_docs); one
    co-partitioned join back. Per-source, so the hot keys are sites,
    not the corpus.
    """
    from credigraph_spark.pipeline.dedup import shingles

    pairs = (df.select(F.col(id_col), F.col(source_col).alias("source"),
                       F.explode(shingles(text_col, shingle_n))
                       .alias("sh"))
             .select(F.col(id_col), "source",
                     F.sha2("sh", 256).alias("h")))
    ndocs = (df.groupBy(F.col(source_col).alias("source"))
             .agg(F.countDistinct(id_col).alias("nd")))
    dfreq = (pairs.groupBy("source", "h")
             .agg(F.countDistinct(id_col).alias("df_")))
    boiler = (dfreq.join(F.broadcast(ndocs), "source")
              .where((F.col("nd") >= 2)
                     & (10 * F.col("df_")
                        >= df_threshold_tenths * F.col("nd")))
              .select("source", "h", F.lit(1).alias("_b")))
    return (pairs.join(boiler, ["source", "h"], "left")
            .groupBy(id_col, "source")
            .agg(F.count("*").cast("long").alias("n_shingles"),
                 F.sum(F.coalesce("_b", F.lit(0))).cast("long")
                 .alias("n_boiler"))
            .withColumn("boiler_frac",
                        F.round(F.col("n_boiler") / F.col("n_shingles"),
                                round_digits)))


def language_purity(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", window: int = 20,
                    round_digits: int = 6) -> DataFrame:
    """Mixed-language / code-switching screen (X253): run the stopword
    lang-id per ``window``-token CHUNK instead of per document, then
    report each doc's majority chunk language and its purity (majority
    chunk share). A doc-level lang-id happily labels a half-English
    half-French page 'en'; chunk-level voting exposes it — mixed docs
    poison monolingual training mixes and LID-conditioned filters
    (purity is the gate). Chunk argmax ties break to the
    lexicographically LARGER language, zero hits to 'und' — the X21
    lang-id convention.

    Returns (id, n_chunks, majority_lang, majority_chunks, purity).

    Scale shape: everything is ONE per-row expression — token split,
    chunk slicing, per-chunk stopword votes and the majority count are
    nested array transforms inside codegen; zero shuffle, zero Python.
    """
    structs = ", ".join(
        "named_struct('h', size(filter(slice(tks, c * {w} + 1, {w}), "
        "x -> array_contains(array({words}), x))), 'l', '{lang}')"
        .format(w=window, lang=lang,
                words=", ".join(f"'{w}'" for w in words))
        for lang, words in _STOPWORDS.items())
    chunk_langs = (
        f"transform(sequence(0, cast(greatest(ceil(size(tks) / "
        f"cast({window} as double)), 1) as int) - 1, 1), c -> "
        f"CASE WHEN array_max(array({structs})).h = 0 THEN 'und' "
        f"ELSE array_max(array({structs})).l END)")
    labels = "', '".join(sorted(list(_STOPWORDS) + ["und"]))
    counts = (f"transform(array('{labels}'), L -> named_struct('n', "
              f"size(filter(cl, x -> x = L)), 'l', L))")
    out = (df.select(F.col(id_col), tokens(text_col).alias("tks"))
           .select(F.col(id_col), F.expr(chunk_langs).alias("cl"))
           .select(F.col(id_col),
                   F.size("cl").cast("long").alias("n_chunks"),
                   F.expr(f"array_max({counts}).l")
                   .alias("majority_lang"),
                   F.expr(f"array_max({counts}).n").cast("long")
                   .alias("majority_chunks")))
    return out.withColumn(
        "purity", F.round(F.col("majority_chunks") / F.col("n_chunks"),
                          round_digits))


def code_shape(df: DataFrame, id_col: str = "doc_id",
               text_col: str = "text",
               round_digits: int = 6) -> DataFrame:
    """Source-file shape metrics (X255): the cheap structural screen a
    code-corpus pipeline runs before any parser — line count, comment
    line fraction (#, //, /* and * continuation prefixes), average and
    maximum line length, maximum indent depth (leading spaces), and
    the brace balance ({ minus } — nonzero means truncation or
    minified/not-code). Minified bundles show one huge line; generated
    code shows extreme indents; data files show zero comments — the
    code siblings of the Gopher text rules (X83).

    Returns (id, n_lines, comment_frac, avg_line_len, max_line_len,
    max_indent, brace_balance).

    Scale shape: one split + a handful of array folds per row — zero
    shuffle, zero Python, codegen; the corpus scan is the cost.
    """
    lines = F.split(F.col(text_col), "\n")
    n = F.size(lines)
    trimmed = F.transform(lines, lambda x: F.ltrim(x))
    is_comment = F.size(F.filter(
        trimmed, lambda x: x.startswith("#") | x.startswith("//")
        | x.startswith("/*") | x.startswith("* ")))
    lens = F.transform(lines, lambda x: F.length(x))
    tot_len = F.aggregate(lens, F.lit(0).cast("long"),
                          lambda a, b: a + b)
    indents = F.transform(
        lines, lambda x: F.length(x) - F.length(F.ltrim(x)))
    braces = (F.length(F.col(text_col))
              - F.length(F.regexp_replace(text_col, r"\{", "")))
    closes = (F.length(F.col(text_col))
              - F.length(F.regexp_replace(text_col, r"\}", "")))
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_lines"),
        F.round(is_comment / n, round_digits).alias("comment_frac"),
        F.round(tot_len / n, round_digits).alias("avg_line_len"),
        F.array_max(lens).cast("long").alias("max_line_len"),
        F.array_max(indents).cast("long").alias("max_indent"),
        (braces - closes).cast("long").alias("brace_balance"))


def source_datasheet(df: DataFrame, id_col: str = "doc_id",
                     source_col: str = "source",
                     text_col: str = "text",
                     round_digits: int = 6) -> DataFrame:
    """Per-source corpus datasheet (X267; 'Datasheets for Datasets',
    Gebru et al.): ONE row per source with the curation numbers a
    data card actually prints — doc count, mean length, the share the
    stopword lang-id calls English, the near-duplicate doc fraction
    (docs in >= 1 LSH candidate pair, q_lsh_pairs' parameters), and
    the mean within-source boilerplate fraction (X247). A pure
    COMPOSITION of audited operators — the rollup every mixing/
    licensing/reporting conversation starts from.

    Returns (source, n_docs, mean_chars, en_share, dup_doc_frac,
    mean_boiler).

    Scale shape: each ingredient keeps its own audited shape; the
    datasheet adds only per-source groupBys and a |sources|-row
    four-way join.
    """
    from credigraph_spark.pipeline.dedup import lsh_candidate_pairs

    docs = df.select(F.col(id_col).alias("id"),
                     F.col(source_col).alias("source"),
                     F.col(text_col).alias("text"))
    base = (docs.groupBy("source")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.round(F.avg(F.length("text")), round_digits)
                 .alias("mean_chars")))
    lang = (language_id(docs, "id", "text")
            .join(docs.select("id", "source"), "id")
            .groupBy("source")
            .agg(F.round(F.avg((F.col("lang_pred") == "en")
                               .cast("long")), round_digits)
                 .alias("en_share")))
    pairs = lsh_candidate_pairs(docs, "id", "text", num_hashes=4,
                                rows_per_band=2)
    dup_ids = (pairs.select(F.col("id_a").alias("id"))
               .unionByName(pairs.select(F.col("id_b").alias("id")))
               .distinct().withColumn("_d", F.lit(1)))
    dup = (docs.select("id", "source").join(dup_ids, "id", "left")
           .groupBy("source")
           .agg(F.round(F.avg(F.coalesce("_d", F.lit(0))),
                        round_digits).alias("dup_doc_frac")))
    boil = (source_boilerplate(docs, "id", "source", "text")
            .groupBy("source")
            .agg(F.round(F.avg("boiler_frac"), round_digits)
                 .alias("mean_boiler")))
    return (base.join(lang, "source").join(dup, "source")
            .join(boil, "source"))
