"""Web-link resolution and header/robots extraction (survey F9/F10).

Reference parity:
* F9 — relative-link resolution: `wat_extract_links.py:215-217` calls
  stdlib ``urljoin(base_url, link)`` per link and SKIPS links that raise
  ``ValueError``.
* F10 — byte-regex extraction over HTTP headers / robots.txt:
  `wat_extract_links.py:36-41` (redirect status line ``30[12378]``,
  ``Location:`` header, ``Sitemap:`` lines), consumed by
  `wat_extract_links.py:139-167` (redirects) and ``:616-640``
  (robots.txt sitemaps).

Spark-first shape: the regex family (F10) is pure ``regexp_extract`` /
``regexp_extract_all`` — whole-stage codegen, zero Python. URL joining
(F9) is hybrid: the two cases that dominate real link corpora (absolute
``scheme:...`` links and protocol-relative ``//host/...``) are resolved
JVM-side with string expressions; only genuinely relative paths (which
need RFC 3986 merge + dot-segment removal) fall through to an
Arrow-batched pandas UDF around stdlib ``urljoin`` — same semantics as
the reference including the ValueError→drop behavior (we return NULL and
let the caller filter, which composes better than swallowing rows).
"""

from __future__ import annotations

from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import StringType

# mirror of wat_extract_links.py:36-41 (as str regexes; payload is text here)
HTTP_REDIRECT_PATTERN = r"^HTTP\s*/\s*1\.[01]\s*30[12378]\b"
HTTP_SUCCESS_PATTERN = r"^HTTP\s*/\s*1\.[01]\s*200\b"
LOCATION_PATTERN = r"(?mi)^Location:\s*(\S+)"
SITEMAP_PATTERN = r"(?mi)^Sitemap:\s*(\S+)"
_ABS_SCHEME = r"^[A-Za-z][A-Za-z0-9+.\-]*:"


@F.pandas_udf(StringType())
def _urljoin_udf(base: pd.Series, link: pd.Series) -> pd.Series:
    def _join(b, l):
        if b is None or l is None:
            return None
        try:
            return urljoin(b, l)
        except ValueError:  # reference skips these links (wat_extract_links.py:218)
            return None

    return pd.Series([_join(b, l) for b, l in zip(base, link)])


def url_join(base: Column | str, link: Column | str) -> Column:
    """RFC 3986 resolution of ``link`` against ``base``. Absolute and
    protocol-relative links (the bulk of a web corpus) stay JVM-side;
    only relative paths pay the Arrow UDF. NULL on unresolvable input."""
    b = F.col(base) if isinstance(base, str) else base
    l = F.col(link) if isinstance(link, str) else link
    scheme = F.regexp_extract(b, r"^([A-Za-z][A-Za-z0-9+.\-]*):", 1)
    return (
        F.when(l.rlike(_ABS_SCHEME), l)
        .when(l.rlike(r"^//") & (scheme != ""), F.concat(scheme, F.lit(":"), l))
        .otherwise(_urljoin_udf(b, l))
    )


def is_redirect(headers: Column | str) -> Column:
    h = F.col(headers) if isinstance(headers, str) else headers
    return h.rlike(HTTP_REDIRECT_PATTERN)


def is_success(headers: Column | str) -> Column:
    h = F.col(headers) if isinstance(headers, str) else headers
    return h.rlike(HTTP_SUCCESS_PATTERN)


def extract_redirects(df: DataFrame, url_col: str = "url",
                      headers_col: str = "headers") -> DataFrame:
    """(src, dst) redirect edges: rows whose header block is an HTTP
    30[12378] response, dst = resolved Location target. Mirrors
    `wat_extract_links.py:139-167` (process_redirect + yield_redirect's
    src != target filter). Pure codegen except the relative-Location
    minority."""
    loc = F.regexp_extract(F.col(headers_col), LOCATION_PATTERN, 1)
    return (
        df.where(is_redirect(headers_col))
        .select(F.col(url_col).alias("src"),
                url_join(F.col(url_col), loc).alias("dst"))
        .where(F.col("dst").isNotNull() & (F.col("dst") != "")
               & (F.col("src") != F.col("dst")))
    )


def extract_sitemaps(df: DataFrame, url_col: str = "url",
                     robots_col: str = "content") -> DataFrame:
    """(src, sitemap) pairs from robots.txt bodies: every ``Sitemap:``
    line, resolved absolute. Mirrors `wat_extract_links.py:616-640`.
    ``regexp_extract_all`` + explode — one pass, no Python for absolute
    sitemap URLs (the norm)."""
    links = F.regexp_extract_all(F.col(robots_col), F.lit(SITEMAP_PATTERN), 1)
    return (
        df.select(F.col(url_col).alias("src"), F.explode(links).alias("raw"))
        .select("src", url_join(F.col("src"), F.col("raw")).alias("sitemap"))
        .where(F.col("sitemap").isNotNull() & (F.col("sitemap") != ""))
    )
