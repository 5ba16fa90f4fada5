"""URL -> host family (F1/F8) + full-PSL eTLD+1 rotation (F3/F6/F7).

Goldens: reference test/test_utils/test_domain_handler.py (ported
verbatim) plus cases derived from wat_extract_links.py:404-457 semantics
(IP rejection, single-label rejection, www-strip, IDNA, reversal) and
PSL wildcard/exception rules.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from credigraph_spark.functions import (
    extract_domain,
    flip_if_needed_frame,
    flip_if_needed_py,
    flip_if_needed_udf,
    get_surt_host,
    is_valid_reversed_host,
    psl_rules_df,
    strict_etld1_match_py,
    strict_etld1_match_udf,
)
from credigraph_spark.psl import load_iana_tlds, load_psl


def _run_col(spark, values, col_fn):
    df = spark.createDataFrame([(v,) for v in values], ["x"])
    return [r["y"] for r in df.select(col_fn(F.col("x")).alias("y")).collect()]


# ---------------------------------------------------------------------------
# get_surt_host (F1)
# ---------------------------------------------------------------------------

SURT_CASES = [
    ("https://www.Example.COM/page", "com.example"),        # www-strip + lower + reverse
    ("http://www.com/x", "com.www"),                        # www kept at 2 labels
    ("https://sub.example.co.uk/", "uk.co.example.sub"),
    ("HTTP://EXAMPLE.COM/A", "com.example"),                # case-insensitive scheme
    ("ftp://files.example.org", "org.example.files"),       # generic-parse fallback
    ("//cdn.example.net/x", "net.example.cdn"),             # protocol-relative
    ("http://example.com.", "com.example"),                 # trailing dot stripped
    ("https://a_b.example.com/", "com.example.a_b"),        # underscore allowed
    ("http://1.2.3.4/", None),                              # IP rejected
    ("http://www.1.2.3.4/", None),                          # IP behind www rejected
    ("http://localhost/", None),                            # single label rejected
    ("http://-bad-.example.com/", None),                    # invalid label chars
    ("http://" + "a" * 64 + ".example.com/", None),         # label > 63
    ("not a url", None),
    ("", None),
    (None, None),
]


def test_get_surt_host_goldens(spark):
    got = _run_col(spark, [c[0] for c in SURT_CASES], get_surt_host)
    for (url, expect), g in zip(SURT_CASES, got):
        assert g == expect, url


def test_get_surt_host_idna(spark):
    got = _run_col(spark, ["http://münchen.de/seite"], get_surt_host)
    assert got == ["de.xn--mnchen-3ya"]


# ---------------------------------------------------------------------------
# extract_domain (F8) — goldens ported from test_domain_handler.py
# ---------------------------------------------------------------------------

EXTRACT_VALID = [
    ("example.com", "example.com"),
    ("http://example.com", "example.com"),
    ("https://example.com/path", "example.com"),
    ("EXAMPLE.COM", "example.com"),
    ("example.com:8080", "example.com"),
    ("'example.com'", "example.com"),
    ('"example.com"', "example.com"),
    ("example.com&amp;", "example.com&"),
]
EXTRACT_INVALID = ["", None, "http:///nohost", "not a domain"]


def test_extract_domain_goldens(spark):
    vals = [c[0] for c in EXTRACT_VALID] + EXTRACT_INVALID
    got = _run_col(spark, vals, extract_domain)
    expect = [c[1] for c in EXTRACT_VALID] + [None] * len(EXTRACT_INVALID)
    for v, g, e in zip(vals, got, expect):
        assert g == e, v


# ---------------------------------------------------------------------------
# flip_if_needed (F6) — reference rotations + full-PSL ccTLD cases
# ---------------------------------------------------------------------------

FLIP_CASES = [
    # ported from test_domain_handler.py::test_flip_if_needed_rotations
    ("theregister.co.uk", "theregister.co.uk"),
    ("co.uk.theregister", "theregister.co.uk"),
    ("news.bbc.co.uk", "bbc.co.uk"),          # subdomain dropped
    ("co.uk.news.bbc", "bbc.co.uk"),
    ("localhost", "localhost"),                # fallback: no rotation validates
    ("", ""),
    # ccTLD cases the old mini-PSL could not resolve
    ("foo.com.au", "foo.com.au"),
    ("com.au.foo", "foo.com.au"),
    ("co.jp.rakuten", "rakuten.co.jp"),
    ("org.uk.wikimedia", "wikimedia.org.uk"),
    # PSL private section (reference uses include_psl_private_domains=True)
    ("myblog.blogspot.com", "myblog.blogspot.com"),
    # wildcard *.ck and exception !www.ck
    ("bar.foo.ck", "bar.foo.ck"),
    ("foo.www.ck", "www.ck"),
    # inputs that are THEMSELVES multi-label public suffixes: the identity
    # rotation's longest match leaves an empty domain and must be skipped
    # as a whole (not fall back to a shorter suffix on the same rotation);
    # a different rotation may still validate with a shorter suffix
    ("act.edu.au", "act.edu"),
    ("pvt.k12.ma.us", "k12.ma"),
]


def test_flip_if_needed_python_core():
    rules = load_psl()
    for raw, expect in FLIP_CASES:
        assert flip_if_needed_py(raw, rules) == expect, raw


def test_flip_if_needed_udf_matches(spark):
    got = _run_col(spark, [c[0] for c in FLIP_CASES], lambda c: flip_if_needed_udf()(c))
    for (raw, expect), g in zip(FLIP_CASES, got):
        assert g == expect, raw


def test_flip_if_needed_frame_matches_udf(spark):
    """The pure-SQL (zero-UDF) plan and the pandas UDF agree on every
    fixture domain, full PSL."""
    df = spark.createDataFrame([(c[0],) for c in FLIP_CASES if c[0]], ["domain"])
    frame = {
        r["domain"]: r["etld1"]
        for r in flip_if_needed_frame(df, "domain").collect()
    }
    for raw, expect in FLIP_CASES:
        if raw:
            assert frame[raw] == expect, raw


# ---------------------------------------------------------------------------
# strict eTLD+1 match (F7) — target_generation.py:17-51 semantics
# ---------------------------------------------------------------------------

def test_strict_etld1_match(spark):
    rated = {"theregister.co.uk", "bbc.co.uk", "news.cn"}
    rules = load_psl()
    cases = [
        ("news.cn", "news.cn"),
        ("co.uk.theregister", "theregister.co.uk"),
        ("news.bbc.co.uk", None),   # subdomain present -> strict reject
        ("bbc.co.uk", "bbc.co.uk"),
        ("missing.com", None),      # valid eTLD+1 but unrated
        ("", None),
    ]
    for raw, expect in cases:
        assert strict_etld1_match_py(raw, rules, frozenset(rated)) == expect, raw
    got = _run_col(spark, [c[0] for c in cases],
                   lambda c: strict_etld1_match_udf(rated)(c))
    assert got == [c[1] for c in cases]


# ---------------------------------------------------------------------------
# lookup integration (test_domain_handler.py::test_flip_and_lookup_integration)
# ---------------------------------------------------------------------------

def test_flip_and_lookup_integration(spark):
    rules = load_psl()
    dqr = {"theregister.co.uk": 1.0, "example.com": 2.0, "bbc.co.uk": 0.5}
    assert dqr.get(flip_if_needed_py("co.uk.theregister", rules)) == 1.0
    assert dqr.get(flip_if_needed_py("example.com", rules)) == 2.0
    assert dqr.get(flip_if_needed_py("news.bbc.co.uk", rules)) == 0.5
    assert dqr.get(flip_if_needed_py("missing.com", rules)) is None


# ---------------------------------------------------------------------------
# IANA TLD whitelist (F3)
# ---------------------------------------------------------------------------

def test_iana_tld_whitelist(spark):
    tlds = load_iana_tlds()
    assert {"com", "uk", "museum"} <= tlds
    assert any(t.startswith("xn--") for t in tlds)
    df = spark.createDataFrame(
        [("com.example",), ("uk.co.bbc",), ("invalid.site",), ("localhost",)],
        ["rhost"],
    )
    kept = {r["rhost"] for r in is_valid_reversed_host(df, "rhost").collect()}
    assert kept == {"com.example", "uk.co.bbc"}  # 'invalid'/'localhost' not TLDs


def test_url_spam_screen_signals(spark):
    from credigraph_spark.web import url_spam_screen

    rows = [
        (1, "www.example.com"),                      # benign
        (2, "x9-promo-win-free.example.tk"),         # hyphens + spam tld
        (3, "a.b.c.d.example.xyz"),                  # deep + spam tld
        (4, "cdn867530942424299887766554433.net"),   # digit-heavy + long
        (5, "short.org"),                            # benign
        (6, "one-hyphen.example.com"),               # 1 benign trait only
    ]
    df = spark.createDataFrame(rows, "id INT, host STRING")
    out = {r.id: r for r in url_spam_screen(df).collect()}
    assert not out[1].flagged and out[1].spam_score == 0
    assert out[2].flagged and out[2].bad_tld
    assert out[2].n_hyphens == 3
    assert out[3].flagged and out[3].depth == 5
    # digit ratio (1 pt) + length >= 30 (1 pt) -> flagged; either
    # alone would score 1 and pass
    assert out[4].flagged and out[4].spam_score == 2
    assert out[4].n_digits == 27
    assert not out[5].flagged
    # a single benign trait never flags (score 1 < 2)
    assert not out[6].flagged and out[6].spam_score <= 1
