"""Deterministic synthetic source-repo corpus (engine input table).

BASELINE.json ``input_hint``: the engine's only external input is an
Iceberg-shaped table ``repos(repo, path, commit, lang, content)``.  This
module synthesizes that table with a seeded, *pure-function* generator so the
ground-truth cross-repo reference graph is known by construction (FIXTURES.md
F1), including:

  (a) dangling repos (no outgoing refs)      — exercises the dangling-mass
      term of PageRank (reference: tgrag/algorithms/pagerank.py:119-121);
  (b) hub repos referenced by a large share  — exercises salting / AQE skew;
  (c) duplicate refs within one file         — exercises distinct-successor
      out-degree (tgrag/utils/pagerank_utils.py:178-181);
  (d) self-references                        — dropped at graph build
      (pagerank_utils.py:141-144);
  (e) >=2 disconnected components and >=1 triangle.

Generation is a pure function of (seed, repo_index, file_index), so the same
corpus can be produced driver-side (tests, oracles) or distributed via
``spark.range`` + ``mapInPandas`` (bench scale) with identical bytes —
which is what makes the per-row sha256 invariant testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

LANGS = ["py", "js", "go", "rs", "java"]

# Reference syntax the extractor looks for (one per line inside content).
REF_KEYWORDS = ["import", "require", "use"]


def _rng64(*parts: int) -> int:
    """Deterministic 64-bit stream from integer parts (splitmix64-style)."""
    x = 0x9E3779B97F4A7C15
    for p in parts:
        x = (x ^ (p + 0x9E3779B97F4A7C15)) * 0xBF58476D1CE4E5B9 % (1 << 64)
        x = (x ^ (x >> 27)) * 0x94D049BB133111EB % (1 << 64)
        x ^= x >> 31
    return x


def repo_name(i: int) -> str:
    return f"org{i % 997:04d}/lib{i:06d}"


def _component_bounds(n_repos: int) -> list[tuple[int, int]]:
    """Two disconnected components: [0, nA) and [nA, n)."""
    n_a = max(6, int(n_repos * 0.8))
    n_a = min(n_a, n_repos - 3) if n_repos >= 9 else n_repos
    if n_a >= n_repos:
        return [(0, n_repos)]
    return [(0, n_a), (n_a, n_repos)]


def _targets_for(seed: int, i: int, f: int, n_repos: int) -> list[int]:
    """Repo indices referenced by file f of repo i (may contain dups/self)."""
    comps = _component_bounds(n_repos)
    lo, hi = next((c for c in comps if c[0] <= i < c[1]), comps[0])
    span = hi - lo
    targets: list[int] = []
    # (a) dangling: last 10% of each component emit nothing.
    if i >= hi - max(1, span // 10):
        return targets
    # (b) hubs: first two repos of the component are heavily referenced.
    h = _rng64(seed, i, f, 1)
    if span >= 4:
        if h % 100 < 60:
            targets.append(lo)
        if (h >> 8) % 100 < 35:
            targets.append(lo + 1)
    # (e) a guaranteed undirected triangle on lo+2, lo+3, lo+4.
    if span >= 6 and f == 0:
        if i == lo + 2:
            targets += [lo + 3, lo + 4]
        elif i == lo + 3:
            targets.append(lo + 4)
    # random intra-component refs
    k = _rng64(seed, i, f, 2) % 3
    for j in range(k):
        targets.append(lo + _rng64(seed, i, f, 3 + j) % span)
    # (d) self-reference
    if i % 7 == 0 and f == 0:
        targets.append(i)
    # (c) duplicate reference within one file
    if i % 5 == 0 and targets:
        targets.append(targets[0])
    return targets


def _content_for(seed: int, i: int, f: int, n_repos: int) -> str:
    targets = _targets_for(seed, i, f, n_repos)
    lines = [f"// module {repo_name(i)} file {f}"]
    for t_idx, t in enumerate(targets):
        kw = REF_KEYWORDS[_rng64(seed, i, f, 100 + t_idx) % len(REF_KEYWORDS)]
        lines.append(f"{kw} {repo_name(t)}")
    # filler body so content sizes vary deterministically
    body = _rng64(seed, i, f, 999) % 40
    lines += [f"fn body_{i}_{f}_{j}() {{ return {j}; }}" for j in range(body)]
    return "\n".join(lines)


def _row(seed: int, i: int, f: int, n_repos: int) -> dict:
    content = _content_for(seed, i, f, n_repos)
    commit = hashlib.sha1(f"{seed}:{i}:{f}".encode()).hexdigest()
    return {
        "repo": repo_name(i),
        "path": f"src/mod{f:03d}.{LANGS[i % len(LANGS)]}",
        "commit": commit,
        "lang": LANGS[i % len(LANGS)],
        "content": content,
    }


def repos_pdf(seed: int = 42, n_repos: int = 60, files_per_repo: int = 3) -> pd.DataFrame:
    """Driver-side corpus (tests / oracles)."""
    rows = [
        _row(seed, i, f, n_repos)
        for i in range(n_repos)
        for f in range(files_per_repo)
    ]
    return pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])


def expected_edges(seed: int = 42, n_repos: int = 60, files_per_repo: int = 3) -> set[tuple[str, str]]:
    """Ground-truth DISTINCT (src, dst) named edge set (self-loops included;
    graph build removes them downstream, pagerank_utils.py:141-144 semantics)."""
    out: set[tuple[str, str]] = set()
    for i in range(n_repos):
        for f in range(files_per_repo):
            for t in _targets_for(seed, i, f, n_repos):
                out.add((repo_name(i), repo_name(t)))
    return out


def repos_df(spark, seed: int = 42, n_repos: int = 60, files_per_repo: int = 3,
             partitions: int | None = None):
    """Distributed corpus: same bytes as ``repos_pdf`` but generated on
    executors from ``spark.range`` via Arrow-batched mapInPandas (no data
    ever funnels through the driver — this is the 100 TB-shaped path)."""
    from pyspark.sql.types import StructType, StructField, StringType

    schema = StructType([
        StructField("repo", StringType()),
        StructField("path", StringType()),
        StructField("commit", StringType()),
        StructField("lang", StringType()),
        StructField("content", StringType()),
    ])
    total = n_repos * files_per_repo
    base = spark.range(0, total, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids = b["id"].to_numpy()
            rows = [_row(seed, int(x) // files_per_repo, int(x) % files_per_repo, n_repos)
                    for x in ids]
            yield pd.DataFrame(rows, columns=["repo", "path", "commit", "lang", "content"])

    return base.mapInPandas(gen, schema=schema)
