"""Single-process PageRank oracle with the reference's exact semantics.

Re-implemented from scratch to the behavior documented in SURVEY.md §2.9 G1
(reference: tgrag/algorithms/pagerank.py:79-157 and
tgrag/utils/pagerank_utils.py:83-216 — NOT copied; this file is the
differential-test ground truth the Spark implementation must match to
allclose(atol=1e-6) per BASELINE.json):

* preprocessing: drop self-loops, dedupe edges, vertex set = given ∪
  endpoints (pagerank_utils.py:83-153);
* out-degree = number of DISTINCT successors (pagerank_utils.py:178-181);
* init 1/N; new[v] = (1-d)/N + d*(Σ_{u→v} rank[u]/out_deg[u] + dangling/N)
  where dangling = Σ rank over out_deg==0 (pagerank.py:89-121);
* stop when Σ|new-old| < tol or max_iter (pagerank_utils.py:208-216).
"""

from __future__ import annotations

from collections.abc import Iterable


def pagerank_oracle(
    edges: Iterable[tuple[int, int]],
    vertices: Iterable[int] | None = None,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
) -> tuple[dict[int, float], int, bool]:
    """Returns (rank_by_vid, iterations, converged)."""
    edge_set: set[tuple[int, int]] = set()
    verts: set[int] = set(vertices) if vertices is not None else set()
    for s, t in edges:
        verts.add(s)
        verts.add(t)
        if s != t:
            edge_set.add((s, t))

    out_nbrs: dict[int, set[int]] = {}
    in_nbrs: dict[int, list[int]] = {}
    for s, t in edge_set:
        out_nbrs.setdefault(s, set()).add(t)
        in_nbrs.setdefault(t, []).append(s)

    n = len(verts)
    if n == 0:
        return {}, 0, True
    out_deg = {v: len(out_nbrs.get(v, ())) for v in verts}
    rank = {v: 1.0 / n for v in verts}

    converged = False
    it = 0
    while it < max_iter and not converged:
        dangling = sum(rank[v] for v in verts if out_deg[v] == 0)
        new = {}
        base = (1.0 - damping) / n
        for v in verts:
            contrib = sum(rank[u] / out_deg[u] for u in in_nbrs.get(v, ()))
            new[v] = base + damping * (contrib + dangling / n)
        l1 = sum(abs(new[v] - rank[v]) for v in verts)
        rank = new
        it += 1
        converged = l1 < tol
    return rank, it, converged


def validate_pagerank(rank: dict[int, float], in_deg: dict[int, int]) -> dict[str, bool]:
    """The reference's four runtime invariants (pagerank.py:139-147,
    pagerank_utils.py:10-26,219-297): score sum ≈ 1, positive ranks,
    rank↔in-degree correlation > 0.1, top-decile mean > bottom-decile mean."""
    import numpy as np

    vids = sorted(rank)
    r = np.array([rank[v] for v in vids])
    d = np.array([in_deg.get(v, 0) for v in vids], dtype=float)
    checks = {
        "sum_close_to_one": bool(abs(r.sum() - 1.0) < 1e-3),
        "all_positive": bool((r > 0).all()),
    }
    if len(vids) >= 10 and d.std() > 0 and r.std() > 0:
        corr = float(np.corrcoef(d, r)[0, 1])
        checks["degree_corr_positive"] = corr > 0.1
        k = max(1, len(r) // 10)
        order = np.argsort(r)
        checks["decile_ordering"] = float(r[order[-k:]].mean()) > float(r[order[:k]].mean())
    return checks
