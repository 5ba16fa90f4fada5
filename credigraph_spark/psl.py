"""Public Suffix List + IANA TLD data and matching.

The reference resolves eTLD+1 via ``tldextract`` with the full Mozilla
Public Suffix List including the private-domains section
(/root/reference/tgrag/utils/domain_handler.py:27-33) and validates TLDs
against the IANA list (/root/reference/tgrag/cc-scripts/iana_tld.py).
Both datasets are public; this package vendors them under
``credigraph_spark/data/`` (PSL from publicsuffix.org, IANA list from
data.iana.org) and implements the PSL algorithm from scratch:

* rules: exact (``co.uk``), wildcard (``*.ck`` — matches one extra
  label), exception (``!www.ck`` — punches through a wildcard; the
  public suffix is the rule minus its first label);
* the LONGEST matching rule wins (by label count, exceptions count as
  their effective suffix length + 1 so they beat the wildcard they
  override);
* a name whose tail matches no rule has NO public suffix (tldextract
  semantics: the implicit ``*`` catch-all of the PSL spec is NOT
  applied, so unknown TLDs never validate).

Two consumers: the vectorized pandas UDFs in ``functions.py`` (per-batch
Python set probes against these frozen structures) and the pure-SQL
DataFrame matcher (``rules_df``/broadcast join) in ``enrich.py``-style
plans.
"""

from __future__ import annotations

import os
from functools import lru_cache

_DATA_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


class PSLRules:
    """Parsed PSL: three frozen sets keyed by the rule's label tuple
    rendered as a dotted string (lowercase)."""

    __slots__ = ("exact", "wildcard", "exception")

    def __init__(self, exact: frozenset, wildcard: frozenset, exception: frozenset):
        self.exact = exact
        self.wildcard = wildcard      # stored WITHOUT the leading '*.' (the tail)
        self.exception = exception    # stored without the leading '!'

    def suffix_split(self, labels: list[str]) -> int | None:
        """Index i such that labels[i:] is the public suffix (longest
        match), or None when no rule matches. i may be 0 (the whole name
        is a public suffix)."""
        n = len(labels)
        best: int | None = None
        for i in range(n):
            tail = ".".join(labels[i:])
            # PSL spec: an exception rule takes priority over EVERY other
            # matching rule (not longest-match) — '!www.ck' makes 'ck' the
            # suffix of www.ck even though '*.ck' would claim 'www.ck'.
            if tail in self.exception:
                return i + 1  # suffix = rule minus its first label
            if tail in self.exact:
                cand = i
            elif i >= 1 and tail in self.wildcard:
                # labels[i:] == T means labels[i-1:] matches '*.T'
                cand = i - 1
            else:
                continue
            if best is None or cand < best:
                best = cand
        return best

    def etld1(self, labels: list[str]) -> tuple[str, str] | None:
        """(domain_label, suffix) of a well-ordered name, or None when no
        suffix matches or no domain label remains."""
        i = self.suffix_split(labels)
        if i is None or i == 0:
            return None
        return labels[i - 1], ".".join(labels[i:])


def _simple_rules(suffixes) -> PSLRules:
    """Build exact-only rules from a plain iterable of suffix strings
    (tests / user-supplied lists)."""
    return PSLRules(frozenset(suffixes), frozenset(), frozenset())


@lru_cache(maxsize=1)
def load_psl(include_private: bool = True) -> PSLRules:
    """Parse the vendored public_suffix_list.dat."""
    exact, wildcard, exception = set(), set(), set()
    in_private = False
    with open(os.path.join(_DATA_DIR, "public_suffix_list.dat"), encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("//"):
                if "===BEGIN PRIVATE DOMAINS===" in line:
                    in_private = True
                continue
            if in_private and not include_private:
                continue
            rule = line.split()[0].lower()
            if rule.startswith("!"):
                exception.add(rule[1:])
            elif rule.startswith("*."):
                wildcard.add(rule[2:])
            else:
                exact.add(rule)
    return PSLRules(frozenset(exact), frozenset(wildcard), frozenset(exception))


@lru_cache(maxsize=1)
def load_iana_tlds() -> frozenset:
    """The vendored IANA TLD list (lowercase, includes xn-- punycode)."""
    out = set()
    with open(os.path.join(_DATA_DIR, "iana_tlds.txt"), encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                out.add(line)
    return frozenset(out)


def rules_rows() -> list[tuple[str, str, int]]:
    """The full PSL as (rule_tail, kind, suffix_labels_from_here) rows for
    a broadcast DataFrame: kind ∈ {exact, wildcard, exception}. Used by
    the pure-SQL eTLD+1 matcher (no UDF)."""
    psl = load_psl()
    rows = []
    for r in psl.exact:
        rows.append((r, "exact", r.count(".") + 1))
    for r in psl.wildcard:
        # '*.tail' matches one extra label: suffix length = tail labels + 1
        rows.append((r, "wildcard", r.count(".") + 2))
    for r in psl.exception:
        # '!rule': the suffix is rule minus its first label
        rows.append((r, "exception", r.count(".")))
    return rows
