"""Scalar functions (SURVEY.md §2.8) — pure-SQL first, pandas UDF only
where a Python library is genuinely required (IDNA).

Each returns a Column so it composes inside whole-stage codegen.
"""

from __future__ import annotations

import pandas as pd  # module-level: pandas_udf type hints resolve against module globals
from pyspark.sql import Column, DataFrame, functions as F


def reverse_host(col) -> Column:
    """F2: label-order flip `example.com` -> `com.example`
    (hostlinks_to_graph.py:70-74) — pure SQL, no UDF."""
    return F.array_join(F.reverse(F.split(col, r"\.")), ".")


def normalize_domain(col) -> Column:
    """F5: lower, trim, strip leading `www.` (domain_handler.py:10-24)."""
    return F.regexp_replace(F.lower(F.trim(col)), r"^www\.", "")


def first_label(col) -> Column:
    """First label of a reversed host (= TLD), for F3 validity joins
    (hostlinks_to_graph.py:76-88)."""
    return F.split(col, r"\.")[0]


def is_valid_reversed_host(df: DataFrame, host_col: str, tld_df: DataFrame,
                           tld_col: str = "tld") -> DataFrame:
    """F3/P4: keep rows whose reversed-host TLD is in the (broadcast) IANA
    table — the reference's UDF whitelist check becomes a broadcast semi
    join, keeping the filter JVM-side."""
    keys = tld_df.select(F.col(tld_col).alias("_tld")).distinct()
    return (
        df.withColumn("_tld", first_label(F.col(host_col)))
        .join(F.broadcast(keys), "_tld", "left_semi")
        .drop("_tld")
    )


def sigmoid(col) -> Column:
    """F12 (tgrag/utils/prob.py:8-19)."""
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col(col) if isinstance(col, str) else -col))


def edge_importance(pr_s, hc_s, pr_d, hc_d) -> Column:
    """F12/A15: (|pr_s*hc_s| + |pr_d*hc_d|) / 2
    (merge_dqr_ratings_trie_filter.py:195-207, prob.py:47-67)."""
    return (F.abs(F.col(pr_s) * F.col(hc_s)) + F.abs(F.col(pr_d) * F.col(hc_d))) / F.lit(2.0)


def iso_week_monday_yyyymmdd(ts_col) -> Column:
    """F11: timestamp -> `YYYYMMDD` of the ISO-week Monday
    (temporal_utils.py:6-24). date_trunc('week') is ISO-Monday in Spark."""
    return F.date_format(F.date_trunc("week", ts_col), "yyyyMMdd")


def content_sha256(col) -> Column:
    """F18: per-row content hash invariant — codegen'd, no UDF."""
    return F.sha2(col if isinstance(col, Column) else F.col(col), 256)


# Minimal public-suffix list for eTLD+1 rotation (F6/F7). The reference
# uses the full PSL via tldextract (domain_handler.py:27-73); that library
# is not in this container, so the engine embeds the common suffixes and
# accepts a custom list for production use.
_MINI_PSL = {
    "com", "org", "net", "edu", "gov", "mil", "int", "io", "co", "ai",
    "de", "fr", "uk", "jp", "cn", "ru", "br", "in", "it", "nl", "es",
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "com.br", "co.jp",
    "com.cn", "co.in", "com.mx", "co.nz",
}


def _etld1(domain: str, psl: frozenset) -> str | None:
    """eTLD+1 of a well-ordered domain, or None if no suffix matches."""
    labels = domain.split(".")
    for k in (2, 1):  # prefer the longer (two-label) public suffix
        if len(labels) >= k + 1 and ".".join(labels[-k:]) in psl:
            return ".".join(labels[-(k + 1):])
    return None


def flip_if_needed_udf(psl: set[str] | None = None):
    """F6 (domain_handler.py:27-73): try all label rotations of a
    (possibly reversed/mangled) domain and return the rotation whose
    eTLD+1 is valid; None when no rotation validates. Vectorized pandas
    UDF — the PSL lookup is a per-row set probe, no network."""
    from pyspark.sql.types import StringType

    table = frozenset(psl or _MINI_PSL)

    @F.pandas_udf(StringType())
    def _flip(domains: pd.Series) -> pd.Series:
        def one(d):
            if not d:
                return None
            labels = d.lower().strip().split(".")
            for i in range(len(labels)):
                rot = ".".join(labels[i:] + labels[:i])
                if _etld1(rot, table) is not None:
                    return rot
            return None

        return domains.map(one)

    return _flip


def strict_etld1_match_udf(rated: set[str], psl: set[str] | None = None):
    """F7 (target_generation.py:17-51): a rotation matches iff it EQUALS
    its own eTLD+1 and that eTLD+1 is in the rated set; returns the match
    or None."""
    from pyspark.sql.types import StringType

    table = frozenset(psl or _MINI_PSL)
    rated_set = frozenset(rated)

    @F.pandas_udf(StringType())
    def _match(domains: pd.Series) -> pd.Series:
        def one(d):
            if not d:
                return None
            labels = d.lower().strip().split(".")
            for i in range(len(labels)):
                rot = ".".join(labels[i:] + labels[:i])
                e = _etld1(rot, table)
                if e is not None and rot == e and rot in rated_set:
                    return rot
            return None

        return domains.map(one)

    return _match


def idna_normalize_udf():
    """F4: IDNA-encode non-ASCII labels of a reversed host, None when the
    encoding fails (hostlinks_to_graph.py:90-110). The one function that
    needs a Python library — Arrow-vectorized pandas UDF, never row-Python.
    Pure-ASCII fast path avoids the codec entirely."""
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def _norm(hosts: pd.Series) -> pd.Series:
        def one(h):
            if h is None:
                return None
            if h.isascii():
                return h
            try:
                return ".".join(
                    p if p.isascii() else p.encode("idna").decode("ascii")
                    for p in h.split(".")
                )
            except (UnicodeError, UnicodeDecodeError):
                return None

        return hosts.map(one)

    return _norm
