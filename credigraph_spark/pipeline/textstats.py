"""Text analysis for training-data curation: quality scoring, language ID,
token counting, document fingerprinting. All pure-SQL column expressions
(whole-stage codegen) — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

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
