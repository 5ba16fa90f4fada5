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


def scc_oracle(edges: Iterable[tuple[int, int]]) -> dict[int, int]:
    """Strongly connected components via iterative Tarjan; scc_id = max
    vid in the component (the label the distributed coloring algorithm
    converges to — graph/scc.py). Dedup/self-loop handling mirrors
    clean_edges."""
    adj: dict[int, list[int]] = {}
    verts: set[int] = set()
    for s, d in edges:
        if s is None or d is None:
            continue
        verts.add(s)
        verts.add(d)
        if s != d:
            adj.setdefault(s, [])
            if d not in adj[s]:
                adj[s].append(d)
    idx: dict[int, int] = {}
    low: dict[int, int] = {}
    on: set[int] = set()
    stack: list[int] = []
    out: dict[int, int] = {}
    counter = [0]

    for root in sorted(verts):
        if root in idx:
            continue
        work = [(root, 0)]
        while work:
            v, i = work.pop()
            if i == 0:
                idx[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on.add(v)
            descended = False
            for j in range(i, len(adj.get(v, []))):
                w = adj[v][j]
                if w not in idx:
                    work.append((v, j + 1))
                    work.append((w, 0))
                    descended = True
                    break
                if w in on:
                    low[v] = min(low[v], idx[w])
            if descended:
                continue
            if low[v] == idx[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = max(comp)
                for w in comp:
                    out[w] = m
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[v])
    return out


def bowtie_oracle(edges: Iterable[tuple[int, int]]) -> dict[int, str]:
    """Bow-tie classes relative to the largest SCC (ties by smaller
    scc_id): core / in (reaches core) / out (reached from core) /
    other."""
    scc = scc_oracle(edges)
    if not scc:
        return {}
    sizes = Counter(scc.values())
    core_id = max(sizes, key=lambda k: (sizes[k], -k))
    core = {v for v, c in scc.items() if c == core_id}

    fwd_adj: dict[int, set[int]] = {}
    bwd_adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s is None or d is None or s == d:
            continue
        fwd_adj.setdefault(s, set()).add(d)
        bwd_adj.setdefault(d, set()).add(s)

    def reach(seeds: set[int], adj: dict[int, set[int]]) -> set[int]:
        seen = set(seeds)
        frontier = list(seeds)
        while frontier:
            nxt = []
            for v in frontier:
                for u in adj.get(v, ()):
                    if u not in seen:
                        seen.add(u)
                        nxt.append(u)
            frontier = nxt
        return seen

    from_core = reach(core, fwd_adj)
    to_core = reach(core, bwd_adj)
    out = {}
    for v in scc:
        if v in core:
            out[v] = "core"
        elif v in to_core:
            out[v] = "in"
        elif v in from_core:
            out[v] = "out"
        else:
            out[v] = "other"
    return out
