"""Count-min sketch: fixed-memory frequency estimation (Cormode &
Muthukrishnan 2005) — the vocabulary/heavy-hitter primitive of corpus
curation when the true term universe (URLs, shingles, n-grams) is too
large to count exactly.

The sketch is a depth × width integer grid; every occurrence increments
one cell per row (col = hash_r(term) mod width) and a point estimate is
the MIN over the term's depth cells — an overestimate with classical
(ε, δ) bounds, never an underestimate.

Engine shape: the grid is a (row, col, cnt) DataFrame with at most
depth·width rows — it BROADCASTS no matter how large the corpus is, and
building it is one union of depth per-row projections + one
partial-aggregatable groupBy: hub terms combine map-side, the shuffle
moves at most depth·width cells per map task. Hashes are md5-derived
(first 15 hex digits, the hash_split/weighted_sample trick) so the grid
is deterministic and bit-identical in any engine with md5 — which makes
the sketch itself oracle-checkable, not just its error bound. Counts are
exact integers end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _cms_col(term: Column, row: int, width: int, seed: int) -> Column:
    h = F.conv(F.substring(
        F.md5(F.concat_ws(":", F.lit(str(seed)), F.lit(str(row)), term)),
        1, 15), 16, 10).cast("long")
    return F.pmod(h, F.lit(width))


def cms_build(occurrences: DataFrame, term_col: str = "term",
              depth: int = 4, width: int = 512,
              seed: int = 7) -> DataFrame:
    """Build the sketch grid (row, col, cnt) from one DataFrame row per
    term OCCURRENCE (pre-exploded). Missing cells are implicit zeros."""
    term = F.col(term_col)
    parts = None
    for r in range(depth):
        p = occurrences.select(
            F.lit(r).alias("row"),
            _cms_col(term, r, width, seed).alias("col"))
        parts = p if parts is None else parts.unionByName(p)
    return parts.groupBy("row", "col").agg(F.count("*").alias("cnt"))


def cms_estimate(cms: DataFrame, terms: DataFrame, term_col: str = "term",
                 depth: int = 4, width: int = 512,
                 seed: int = 7) -> DataFrame:
    """Point estimates (term, cms_n) for each distinct term in ``terms``:
    MIN over the term's depth cells. The sketch side broadcasts
    (<= depth*width rows); absent cells count 0 (term never seen)."""
    term = F.col(term_col)
    probes = None
    for r in range(depth):
        p = terms.select(term.alias("term"), F.lit(r).alias("row"),
                         _cms_col(term, r, width, seed).alias("col"))
        probes = p if probes is None else probes.unionByName(p)
    return (
        probes.join(F.broadcast(cms), ["row", "col"], "left")
        .groupBy("term")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("cms_n"))
    )
