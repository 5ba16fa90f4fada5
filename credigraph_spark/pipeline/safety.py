"""Content-safety screens for pretraining corpora: PII detection /
redaction (RefinedWeb/Dolma-style regex scrub) and a C4-style blocklist
token screen. All JVM-side regex/array expressions — zero Python in the
hot path, zero shuffle for the per-row stage (the blocklist join is a
broadcast semi-pattern over an exploded token table).

The regexes are deliberately restricted to a syntax subset with
identical semantics in java.util.regex (Spark) and RE2 (DuckDB oracle):
greedy quantifiers, character classes, {m,} — no backrefs, no
lookaround (RE2 has neither), no alternation whose leftmost-first vs
leftmost-longest semantics could diverge, and no \\b (DuckDB string
literals turn \\b into a BACKSPACE char even though \\d passes through,
so word-boundary patterns silently break in the oracle).
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Shared engine-portable patterns (single source of truth; the entry
# oracle embeds the same strings).
EMAIL_RE = r"[a-zA-Z0-9._%+\-]+@[a-zA-Z0-9.\-]+\.[a-zA-Z]{2,}"
IPV4_RE = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
PHONE_RE = r"\+\d[\d\- ]{7,}\d"


def pii_scrub(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Per-document PII screen: count emails / IPv4s / phone numbers on
    the ORIGINAL text, then redact in a fixed chain (email -> ipv4 ->
    phone, placeholders <EMAIL>/<IP>/<PHONE>) and emit sha256 of the
    redacted text — the same invariant convention as the extraction
    sha-equality check, so downstream stages can verify the scrub
    happened without shipping the text. Pure per-row regexp_count /
    regexp_replace: zero shuffle, whole-stage codegen, ~100 TB shape is
    embarrassingly parallel."""
    t = F.col(text_col)
    n_em = F.regexp_count(t, F.lit(EMAIL_RE))
    n_ip = F.regexp_count(t, F.lit(IPV4_RE))
    n_ph = F.regexp_count(t, F.lit(PHONE_RE))
    red = F.regexp_replace(t, EMAIL_RE, "<EMAIL>")
    red = F.regexp_replace(red, IPV4_RE, "<IP>")
    red = F.regexp_replace(red, PHONE_RE, "<PHONE>")
    return df.select(
        F.col(id_col),
        n_em.cast("long").alias("n_emails"),
        n_ip.cast("long").alias("n_ipv4"),
        n_ph.cast("long").alias("n_phones"),
        ((n_em + n_ip + n_ph) > 0).alias("has_pii"),
        F.sha2(red, 256).alias("redacted_sha"))


def blocklist_screen(df: DataFrame, blocklist: list[str],
                     id_col: str = "doc_id",
                     text_col: str = "text",
                     max_frac: float = 0.0) -> DataFrame:
    """C4-style badword screen: per-document count of blocklisted
    tokens (exact lowercase token match, same tokenizer as textstats)
    and a keep flag (blocked fraction <= max_frac; the C4 default is
    drop-on-any-hit, max_frac=0). The blocklist is a literal array in
    the plan (real lists are ~10k terms — still a broadcast-sized
    array_contains or a broadcast semi-join at 100 TB); counting is a
    per-row array filter, zero shuffle."""
    from credigraph_spark.pipeline.textstats import tokens

    toks = tokens(text_col)
    bl = F.array(*[F.lit(w.lower()) for w in blocklist])
    n = F.size(toks)
    n_bad = F.size(F.filter(toks, lambda w: F.array_contains(bl, w)))
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        n_bad.cast("long").alias("n_blocked"),
        F.when(n > 0, F.round(n_bad.cast("double") / n, 8))
        .otherwise(0.0).alias("blocked_frac"),
        F.when(n > 0, (n_bad.cast("double") / n) <= max_frac)
        .otherwise(F.lit(True)).alias("keep"))


def k_anonymity_audit(df: DataFrame, quasi_cols: list[str],
                      sensitive_col: str, k: int = 5) -> DataFrame:
    """k-anonymity / l-diversity audit (X200) — the release-safety
    screen a training-data pipeline runs before publishing per-user
    aggregates: every quasi-identifier combination must describe at
    least k rows (k-anonymity, Sweeney 2002) and carry at least 2
    distinct sensitive values (distinct-l-diversity, Machanavajjhala
    2007) or the group must be suppressed/generalized.

    Returns one row per quasi-identifier group: (*quasi_cols,
    group_size, l_diversity, suppress) with suppress = size < k OR
    l_diversity < 2.

    Scale shape: ONE map-side-combinable groupBy on the quasi columns
    (count + exact distinct of the sensitive value via a two-level
    agg — count_distinct is partial-aggregatable in Spark's
    HashAggregate with a dedup expand, still a single shuffle); no
    row explosion, no UDFs.
    """
    return (df.groupBy(*quasi_cols)
            .agg(F.count("*").cast("long").alias("group_size"),
                 F.countDistinct(sensitive_col).cast("long")
                 .alias("l_diversity"))
            .withColumn("suppress",
                        (F.col("group_size") < k)
                        | (F.col("l_diversity") < 2)))
