"""Pure-Python graph oracles for CC / LPA / triangle counting.

These algorithms do not exist in the reference (SURVEY.md §2.9 G5-G7);
semantics are pinned by the north rule and these oracles are the exact
ground truth the Spark implementations must match.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterable


def _undirected_adj(edges: Iterable[tuple[int, int]]) -> dict[int, set[int]]:
    adj: dict[int, set[int]] = {}
    for s, t in edges:
        if s == t:
            adj.setdefault(s, set())
            continue
        adj.setdefault(s, set()).add(t)
        adj.setdefault(t, set()).add(s)
    return adj


def cc_oracle(edges: Iterable[tuple[int, int]],
              vertices: Iterable[int] | None = None) -> dict[int, int]:
    """component(v) = min vid of v's connected component (union-find)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    verts = set(vertices) if vertices is not None else set()
    pairs = []
    for s, t in edges:
        verts.add(s)
        verts.add(t)
        if s != t:
            pairs.append((s, t))
    for v in verts:
        parent[v] = v
    for s, t in pairs:
        union(s, t)
    return {v: find(v) for v in verts}


def lpa_oracle(edges: Iterable[tuple[int, int]],
               vertices: Iterable[int] | None = None,
               max_iter: int = 10) -> dict[int, int]:
    """Synchronous LPA, label⁰=vid, mode of neighbor labels, ties → smallest
    label, isolated vertices keep their own; stops early on stability."""
    adj = _undirected_adj(edges)
    verts = set(adj)
    if vertices is not None:
        verts |= set(vertices)
    labels = {v: v for v in verts}
    for _ in range(max_iter):
        new = {}
        for v in verts:
            nbrs = adj.get(v, ())
            if not nbrs:
                new[v] = labels[v]
                continue
            counts = Counter(labels[u] for u in nbrs)
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        if new == labels:
            break
        labels = new
    return labels


def triangles_oracle(edges: Iterable[tuple[int, int]]) -> tuple[dict[int, int], int]:
    """Per-vertex triangle counts + global total over the undirected,
    deduped, self-loop-free graph."""
    adj = _undirected_adj(edges)
    per_v = {v: 0 for v in adj}
    total = 0
    for v in adj:
        for u in adj[v]:
            if u <= v:
                continue
            common = adj[v] & adj[u]
            for w in common:
                if w > u:
                    total += 1
                    per_v[v] += 1
                    per_v[u] += 1
                    per_v[w] += 1
    return per_v, total
