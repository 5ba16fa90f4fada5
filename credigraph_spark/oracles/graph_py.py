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


def ktruss_oracle(edges: Iterable[tuple[int, int]], k: int,
                  max_rounds: int | None = None) -> set[tuple[int, int]]:
    """Canonical (a<b) edges surviving the k-truss peel (support >= k-2
    within the current subgraph), optionally stopped after max_rounds."""
    cur = {(min(s, d), max(s, d)) for s, d in edges
           if s is not None and d is not None and s != d}
    need = k - 2
    rounds = 0
    while cur and (max_rounds is None or rounds < max_rounds):
        adj: dict[int, set[int]] = {}
        for a, b in cur:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        nxt = {(a, b) for a, b in cur if len(adj[a] & adj[b]) >= need}
        rounds += 1
        if nxt == cur:
            break
        cur = nxt
    return cur


def harmonic_oracle(edges: Iterable[tuple[int, int]], seeds: Iterable[int],
                    max_hops: int, directed: bool = True) -> dict[int, float]:
    """Per-seed harmonic centrality within the hop horizon, rounded to 8."""
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s is None or d is None or s == d:
            continue
        adj.setdefault(s, set()).add(d)
        if not directed:
            adj.setdefault(d, set()).add(s)
    out = {}
    for seed in set(seeds):
        dist = {seed: 0}
        frontier = [seed]
        for h in range(1, max_hops + 1):
            nxt = []
            for v in frontier:
                for u in adj.get(v, ()):
                    if u not in dist:
                        dist[u] = h
                        nxt.append(u)
            frontier = nxt
        out[seed] = round(sum(1.0 / d for v, d in dist.items() if d > 0), 8)
    return out


def closeness_oracle(edges: Iterable[tuple[int, int]], seeds: Iterable[int],
                     max_hops: int, directed: bool = True
                     ) -> dict[int, tuple[int, int, float]]:
    """Per-seed bounded closeness: (n_reachable, sum_dist, r/sum_dist
    rounded to 8; 0.0 when nothing reachable)."""
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s is None or d is None or s == d:
            continue
        adj.setdefault(s, set()).add(d)
        if not directed:
            adj.setdefault(d, set()).add(s)
    out = {}
    for seed in set(seeds):
        dist = {seed: 0}
        frontier = [seed]
        for h in range(1, max_hops + 1):
            nxt = []
            for v in frontier:
                for u in adj.get(v, ()):
                    if u not in dist:
                        dist[u] = h
                        nxt.append(u)
            frontier = nxt
        r = sum(1 for d in dist.values() if d > 0)
        sd = sum(d for d in dist.values() if d > 0)
        out[seed] = (r, sd, round(r / sd, 8) if sd > 0 else 0.0)
    return out


def eccentricity_oracle(edges: Iterable[tuple[int, int]],
                        seeds: Iterable[int], max_hops: int,
                        directed: bool = True) -> dict[int, tuple[int, int]]:
    """Per-seed bounded (n_reachable, max hop distance); (0, 0) when
    nothing is reachable."""
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s is None or d is None or s == d:
            continue
        adj.setdefault(s, set()).add(d)
        if not directed:
            adj.setdefault(d, set()).add(s)
    out = {}
    for seed in set(seeds):
        dist = {seed: 0}
        frontier = [seed]
        for h in range(1, max_hops + 1):
            nxt = []
            for v in frontier:
                for u in adj.get(v, ()):
                    if u not in dist:
                        dist[u] = h
                        nxt.append(u)
            frontier = nxt
        reach = [d for d in dist.values() if d > 0]
        out[seed] = (len(reach), max(reach) if reach else 0)
    return out


def katz_oracle(edges: Iterable[tuple[int, int]], alpha: float, beta: float,
                iters: int,
                weights: dict[tuple[int, int], float] | None = None
                ) -> dict[int, float]:
    """Jacobi Katz on the simple graph: x_{k+1}(v) = beta +
    alpha * sum_{u->v} w * x_k(u), x_0 = beta, over all endpoints."""
    simple = sorted({(s, d) for s, d in edges
                     if s is not None and d is not None and s != d})
    verts = {v for e in simple for v in e}
    x = {v: beta for v in verts}
    for _ in range(iters):
        nxt = {v: beta for v in verts}
        for s, d in simple:
            w = weights.get((s, d), 1.0) if weights else 1.0
            nxt[d] += alpha * w * x[s]
        x = nxt
    return x


def sssp_oracle(edges: Iterable[tuple[int, int, float]],
                seeds: Iterable[int], max_rounds: int,
                directed: bool = True) -> dict[int, float]:
    """Bounded Bellman-Ford: min weighted dist over <=max_rounds-edge
    paths from the seed set; unreachable vertices absent."""
    rel = list(edges)
    if not directed:
        rel += [(d, s, w) for s, d, w in rel]
    dist = {s: 0.0 for s in set(seeds)}
    for _ in range(max_rounds):
        cur = dict(dist)
        for s, d, w in rel:
            if s in cur and cur[s] + w < dist.get(d, float("inf")):
                dist[d] = cur[s] + w
    return dist


def modularity_oracle(edges: Iterable[tuple[int, int]],
                      labels: dict[int, int]) -> float:
    """Newman modularity of the labeling over the undirected simple
    graph, rounded to 8."""
    und = {(min(s, d), max(s, d)) for s, d in edges
           if s is not None and d is not None and s != d}
    m = len(und)
    if m == 0:
        return 0.0
    deg: dict[int, int] = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    dc: dict[int, int] = {}
    ec: dict[int, int] = {}
    for v, d in deg.items():
        c = labels[v]
        dc[c] = dc.get(c, 0) + d
    for a, b in und:
        if labels[a] == labels[b]:
            c = labels[a]
            ec[c] = ec.get(c, 0) + 1
    q = sum(ec.get(c, 0) / m - (dcv / (2 * m)) ** 2 for c, dcv in dc.items())
    return round(q, 8)


def lpa_weighted_oracle(edges: Iterable[tuple[int, int, float]],
                        max_iter: int) -> dict[int, int]:
    """Weighted synchronous LPA: votes weighted by the undirected edge
    weight (both directions + parallel rows summed); tie-break (weight
    desc, label asc); isolated semantics as lpa_oracle."""
    w: dict[tuple[int, int], float] = {}
    for s, d, x in edges:
        if s is None or d is None or s == d:
            continue
        w[(s, d)] = w.get((s, d), 0.0) + x
        w[(d, s)] = w.get((d, s), 0.0) + x
    verts = {v for pair in w for v in pair}
    labels = {v: v for v in verts}
    for _ in range(max_iter):
        votes: dict[int, dict[int, float]] = {v: {} for v in verts}
        for (s, d), x in w.items():
            lbl = labels[s]
            votes[d][lbl] = votes[d].get(lbl, 0.0) + x
        new = {}
        for v in verts:
            if not votes[v]:
                new[v] = labels[v]
                continue
            best = max(votes[v].items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        if new == labels:
            break
        labels = new
    return labels


def anf_oracle(edges: Iterable[tuple[int, int]], max_hops: int,
               num_registers: int, seed: int = 7,
               cap: int = 40) -> dict[int, int]:
    """Exact FM-sketch simulation (same md5-derived registers as
    graph/anf.py): hop -> Σ_v Σ_r trailing-ones(mask)."""
    import hashlib

    adj: dict[int, set[int]] = {}
    verts: set[int] = set()
    for s, d in edges:
        if s is None or d is None:
            continue
        verts.add(s)
        verts.add(d)
        if s != d:
            adj.setdefault(s, set()).add(d)

    def rho(j: int, v: int) -> int:
        h = int(hashlib.md5(f"{seed}:{j}:{v}".encode()).hexdigest()[:8], 16)
        if h == 0:
            return min(32, cap)
        t = 0
        while h & 1 == 0:
            h >>= 1
            t += 1
        return min(t, cap)

    masks = {v: [1 << rho(j, v) for j in range(num_registers)] for v in verts}
    out = {}
    for h in range(1, max_hops + 1):
        new = {}
        for v in verts:
            m = list(masks[v])
            for u in adj.get(v, ()):
                for j in range(num_registers):
                    m[j] |= masks[u][j]
            new[v] = m
        masks = new
        total = 0
        for v in verts:
            for j in range(num_registers):
                x = masks[v][j]
                t = 0
                while x & 1:
                    x >>= 1
                    t += 1
                total += t
        out[h] = total
    return out


def betweenness_oracle(edges: Iterable[tuple[int, int]],
                       seeds: Iterable[int], max_hops: int,
                       directed: bool = True) -> dict[int, float]:
    """Horizon-bounded seed-sampled Brandes: B(v) = Σ_seeds δ_seed(v),
    v ≠ seed, shortest paths of length ≤ max_hops; rounded to 8."""
    adj: dict[int, list[int]] = {}
    verts: set[int] = set()
    for s, d in edges:
        if s is None or d is None:
            continue
        verts.add(s)
        verts.add(d)
        if s == d:
            continue
        adj.setdefault(s, []).append(d)
        if not directed:
            adj.setdefault(d, []).append(s)
    # dedup parallel edges like clean_edges
    adj = {v: sorted(set(us)) for v, us in adj.items()}
    b = {v: 0.0 for v in verts}
    for s in set(seeds):
        dist = {s: 0}
        sigma = {s: 1}
        levels = [[s]]
        for h in range(1, max_hops + 1):
            nxt: dict[int, int] = {}
            for v in levels[-1]:
                for u in adj.get(v, ()):
                    if u in dist and dist[u] < h:
                        continue
                    nxt[u] = nxt.get(u, 0) + sigma[v]
            nxt = {u: c for u, c in nxt.items() if u not in dist}
            if not nxt:
                break
            for u, c in nxt.items():
                dist[u] = h
                sigma[u] = c
            levels.append(sorted(nxt))
        delta = {v: 0.0 for v in dist}
        for h in range(len(levels) - 1, 0, -1):
            for u in levels[h - 1]:
                for w in adj.get(u, ()):
                    if dist.get(w) == h:
                        delta[u] += sigma[u] / sigma[w] * (1 + delta[w])
            # (delta for level h is final before we read it at h-1 since
            # sweeps go deepest-first)
        for v, d in delta.items():
            if v != s:
                b[v] += d
    return {v: round(x, 8) for v, x in b.items()}
