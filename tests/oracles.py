"""Single-node reference implementations (oracles) for the graph
algorithms — dense power iteration, union-find, synchronous LPA, and
brute-force triangle enumeration.  The distributed engine must match
these: PageRank allclose(atol=1e-6), components/labels/triangles exact
(north rule)."""

from __future__ import annotations

import itertools

import numpy as np


def pagerank_oracle(
    edges: list[tuple[int, int]],
    damping: float = 0.85,
    tol: float = 1e-6,
    max_steps: int = 100,
) -> dict[int, float]:
    """Dense synchronous power iteration with dangling redistribution,
    identical update rule to PageRankProgram:
    r' = (1-d)/n + d * (A^T (r/deg) + dangling(r)/n), stop at L∞ < tol."""
    ids = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    if n == 0:
        return {}
    deg = np.zeros(n)
    for s, d in edges:
        deg[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(max_steps):
        contrib = np.where(deg > 0, r / np.maximum(deg, 1), 0.0)
        sums = np.zeros(n)
        for s, d in edges:
            sums[idx[d]] += contrib[idx[s]]
        dangling = r[deg == 0].sum()
        new = (1.0 - damping) / n + damping * (sums + dangling / n)
        delta = np.max(np.abs(new - r))
        r = new
        if delta < tol:
            break
    return {v: r[idx[v]] for v in ids}


def components_oracle(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Union-find; label = min vertex id in the (weakly) connected comp."""
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for e in edges:
        for v in e:
            parent.setdefault(v, v)
    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    return {v: find(v) for v in parent}


def lpa_oracle(edges: list[tuple[int, int]], max_steps: int = 20) -> dict[int, int]:
    """Synchronous LPA, same spec as LabelPropagationProgram: adopt the
    most frequent neighbour label (undirected), ties -> smaller label,
    isolated vertices keep their label; stop at stability or max_steps."""
    ids = sorted({v for e in edges for v in e})
    nbrs: dict[int, list[int]] = {v: [] for v in ids}
    for s, d in edges:
        nbrs[s].append(d)
        nbrs[d].append(s)
    label = {v: v for v in ids}
    for _ in range(max_steps):
        new = {}
        for v in ids:
            if not nbrs[v]:
                new[v] = label[v]
                continue
            counts: dict[int, int] = {}
            for u in nbrs[v]:
                counts[label[u]] = counts.get(label[u], 0) + 1
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            new[v] = best
        if new == label:
            break
        label = new
    return label


def triangles_oracle(edges: list[tuple[int, int]]) -> int:
    """Brute-force: count unordered vertex triples pairwise connected in
    the undirected simple graph (self-loops and duplicates ignored)."""
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    count = 0
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            count += 1
    return count


def ppr_oracle(
    edges: list[tuple[int, int]],
    seeds: list[int],
    damping: float = 0.85,
    tol: float = 1e-6,
    max_steps: int = 100,
) -> dict[int, float]:
    """Dense personalized PageRank, same update rule as
    PersonalizedPageRankProgram: r' = (1-d)*pref + d*(A^T(r/deg)
    + dangling(r)*pref), pref = 1/|S| on seeds, 0 elsewhere."""
    ids = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    if n == 0:
        return {}
    deg = np.zeros(n)
    for s, d in edges:
        deg[idx[s]] += 1
    pref = np.zeros(n)
    for s in seeds:
        pref[idx[s]] = 1.0 / len(seeds)
    r = pref.copy()
    for _ in range(max_steps):
        contrib = np.where(deg > 0, r / np.maximum(deg, 1), 0.0)
        sums = np.zeros(n)
        for s, d in edges:
            sums[idx[d]] += contrib[idx[s]]
        dangling = r[deg == 0].sum()
        new = (1.0 - damping) * pref + damping * (sums + dangling * pref)
        delta = np.max(np.abs(new - r))
        r = new
        if delta < tol:
            break
    return {v: r[idx[v]] for v in ids}


def bfs_oracle(
    edges: list[tuple[int, int]], seeds: list[int]
) -> dict[int, int | None]:
    """Multi-source BFS hop distance over the symmetrized graph;
    unreached vertices map to None."""
    ids = sorted({v for e in edges for v in e})
    nbrs: dict[int, set[int]] = {v: set() for v in ids}
    for s, d in edges:
        nbrs[s].add(d)
        nbrs[d].add(s)
    dist: dict[int, int | None] = {v: None for v in ids}
    frontier = [s for s in seeds if s in dist]
    for s in frontier:
        dist[s] = 0
    depth = 0
    while frontier:
        depth += 1
        nxt = []
        for v in frontier:
            for u in nbrs[v]:
                if dist[u] is None:
                    dist[u] = depth
                    nxt.append(u)
        frontier = nxt
    return dist


def kcore_oracle(edges: list[tuple[int, int]], k: int) -> dict[int, bool]:
    """Iterative k-core peel with MULTISET symmetrized degree (each
    directed input edge contributes 1 to both endpoints; a self-loop
    contributes 2 to its vertex) — matching prepare()'s undirected
    UNION ALL doubling in KCoreProgram."""
    ids = sorted({v for e in edges for v in e})
    sym: list[tuple[int, int]] = []
    for s, d in edges:
        sym.append((s, d))
        sym.append((d, s))
    alive = {v: True for v in ids}
    while True:
        deg = {v: 0 for v in ids}
        for s, d in sym:
            if alive[s] and alive[d]:
                deg[s] += 1
        doomed = [v for v in ids if alive[v] and deg[v] < k]
        if not doomed:
            return alive
        for v in doomed:
            alive[v] = False


def vertex_triangles_oracle(
    edges: list[tuple[int, int]]
) -> dict[int, tuple[int, int]]:
    """Brute-force per-vertex (triangle count, simple degree) over the
    undirected simple graph (self-loops and duplicates ignored) — every
    vertex with simple degree > 0 appears; each triangle credits all
    three corners."""
    und = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = {v: 0 for v in adj}
    for a, b, c in itertools.combinations(sorted(adj), 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    return {v: (tri[v], len(adj[v])) for v in adj}


def ball_distances_oracle(
    edges: list[tuple[int, int]]
) -> dict[int, dict[int, int]]:
    """All-pairs hop distances over the symmetrized view of ``edges``
    (self-loops kept as vertices; duplicates irrelevant): BFS from every
    endpoint vertex.  d[u][u] == 0."""
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    out: dict[int, dict[int, int]] = {}
    for src in adj:
        dist = {src: 0}
        frontier = [src]
        t = 0
        while frontier:
            t += 1
            nxt = []
            for u in frontier:
                for v in adj[u]:
                    if v not in dist:
                        dist[v] = t
                        nxt.append(v)
            frontier = nxt
        out[src] = dist
    return out


def neighborhood_function_oracle(edges: list[tuple[int, int]]) -> list[int]:
    """Exact N(t) for t = 0..diameter: ordered pairs (u, v) with
    d(u, v) <= t, self-pairs included at t = 0."""
    dists = ball_distances_oracle(edges)
    alld = [d for m in dists.values() for d in m.values()]
    if not alld:
        return []
    diam = max(alld)
    return [sum(1 for d in alld if d <= t) for t in range(diam + 1)]


def harmonic_centrality_oracle(edges: list[tuple[int, int]]) -> dict[int, float]:
    """HC(v) = sum over reachable u != v of 1/d(v, u), folding the
    per-hop terms c_t/t in ascending-t order (the engine's IEEE fold)."""
    dists = ball_distances_oracle(edges)
    out = {}
    for v, m in dists.items():
        per_hop: dict[int, int] = {}
        for u, d in m.items():
            if d > 0:
                per_hop[d] = per_hop.get(d, 0) + 1
        acc = 0.0
        for t in sorted(per_hop):
            acc += per_hop[t] / t
        out[v] = acc
    return out


def closeness_oracle(edges: list[tuple[int, int]]) -> dict[int, float]:
    """C(v) = (r - 1) / sum of distances to reachable vertices (r =
    reachable incl. self); 0 when v reaches nothing beyond itself."""
    dists = ball_distances_oracle(edges)
    out = {}
    for v, m in dists.items():
        sd = sum(m.values())
        out[v] = (len(m) - 1.0) / sd if sd > 0 else 0.0
    return out


def hits_oracle(
    edges: list[tuple[int, int]], n_iter: int = 50
) -> dict[int, tuple[float, float]]:
    """Simultaneous HITS (power iteration on [[0, E], [E^T, 0]]) with
    lazy L1 normalization, matching HITSProgram on the doubled graph:
    h0 = 1 on vertices with out-edges, a0 = 1 on vertices with
    in-edges; per step a' = E^T(h/||h||_1), h' = E(a/||a||_1) from the
    SAME previous iterate.  Returns v -> (hub, auth), each side
    L1-normalized at the end."""
    verts = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    si = np.array([idx[s] for s, _ in edges], dtype=np.int64)
    di = np.array([idx[d] for _, d in edges], dtype=np.int64)
    h = (np.bincount(si, minlength=n) > 0).astype(np.float64)
    a = (np.bincount(di, minlength=n) > 0).astype(np.float64)
    for _ in range(n_iter):
        hs, asum = h.sum(), a.sum()
        hn = h / hs if hs > 0 else h
        an = a / asum if asum > 0 else a
        new_a = np.bincount(di, weights=hn[si], minlength=n)
        new_h = np.bincount(si, weights=an[di], minlength=n)
        h, a = new_h, new_a
    hs, asum = h.sum(), a.sum()
    hub = h / hs if hs > 0 else h
    auth = a / asum if asum > 0 else a
    return {v: (float(hub[i]), float(auth[i])) for v, i in idx.items()}


def scc_oracle(edges: list[tuple[int, int]]) -> dict[int, int]:
    """Strongly connected components (iterative Tarjan): v -> min
    vertex id in its SCC, over edge-endpoint vertices."""
    adj: dict[int, list[int]] = {}
    verts = sorted({v for e in edges for v in e})
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    onstack: set[int] = set()
    stack: list[int] = []
    out: dict[int, int] = {}
    counter = [0]
    for root in verts:
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                onstack.add(v)
            recurse = False
            nbrs = adj.get(v, [])
            for i in range(pi, len(nbrs)):
                w = nbrs[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if w in onstack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    onstack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
            work.pop()
            if work:
                p, _ = work[-1]
                low[p] = min(low[p], low[v])
    return out


def brandes_oracle(
    edges: list[tuple[int, int]], sources: list[int] | None = None
) -> dict[int, float]:
    """Brandes dependency sums over the UNDIRECTED simple view of the
    edge multiset (self-loops ignored): v -> sum over the given sources
    s of delta_s(v), excluding each source's own lane.  With sources =
    all vertices this is 2x the classic undirected betweenness."""
    verts = sorted({v for e in edges for v in e})
    adj: dict[int, set[int]] = {v: set() for v in verts}
    for s, d in edges:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    if sources is None:
        sources = verts
    dep = {v: 0.0 for v in verts}
    for s in sources:
        # BFS with path counting
        dist = {s: 0}
        sigma = {v: 0.0 for v in verts}
        sigma[s] = 1.0
        order = [s]
        q = [s]
        while q:
            nq = []
            for v in q:
                for w in adj[v]:
                    if w not in dist:
                        dist[w] = dist[v] + 1
                        nq.append(w)
                        order.append(w)
            for v in q:
                for w in adj[v]:
                    if dist.get(w) == dist[v] + 1:
                        sigma[w] += sigma[v]
            q = nq
        delta = {v: 0.0 for v in verts}
        for w in reversed(order):
            for v in adj[w]:
                if dist.get(v) == dist[w] - 1:
                    delta[v] += sigma[v] / sigma[w] * (1.0 + delta[w])
            if w != s:
                dep[w] += delta[w]
    return dep


def mis_oracle(edges: list[tuple[int, int]]) -> dict[int, bool]:
    """Greedy-priority MIS over the simple undirected view (self-loops
    dropped), priority = vertex id: v -> True iff v is in the MIS.
    Equals the fixed-priority Luby rounds' fixpoint."""
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    out: dict[int, bool] = {}
    for v in sorted(adj):
        # greedy by ascending priority: v joins iff no smaller neighbor
        # already joined
        out[v] = not any(out.get(u, False) for u in adj[v] if u < v)
    return out


def eigenvector_oracle(
    edges: list[tuple[int, int]], n_iter: int = 50
) -> dict[int, float]:
    """Power iteration on the simple undirected adjacency with lazy L1
    normalization, matching EigenvectorProgram: simple graph = distinct
    (min, max) pairs, self-loops dropped; x0 = 1 on endpoint vertices;
    per step x' = A (x / ||x||_1).  Returns v -> score, L1-normalized
    at the end."""
    simple = sorted({(min(s, d), max(s, d)) for s, d in edges if s != d})
    verts = sorted({v for e in simple for v in e})
    if not verts:
        return {}
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    si = np.array([idx[a] for a, _ in simple], dtype=np.int64)
    di = np.array([idx[b] for _, b in simple], dtype=np.int64)
    x = np.ones(n, dtype=np.float64)
    for _ in range(n_iter):
        xs = x.sum()
        xn = x / xs if xs > 0 else x
        x = np.bincount(di, weights=xn[si], minlength=n) + np.bincount(
            si, weights=xn[di], minlength=n
        )
    s = x.sum()
    out = x / s if s > 0 else x
    return {v: float(out[i]) for v, i in idx.items()}


def katz_oracle(
    edges: list[tuple[int, int]], alpha: float = 0.05, n_iter: int = 30
) -> dict[int, float]:
    """Directed Katz x' = alpha*A^T x + 1 from x0 = 1, matching
    KatzProgram; L1-normalized at the end."""
    verts = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    si = np.array([idx[s] for s, _ in edges], dtype=np.int64)
    di = np.array([idx[d] for _, d in edges], dtype=np.int64)
    x = np.ones(n, dtype=np.float64)
    for _ in range(n_iter):
        x = alpha * np.bincount(di, weights=x[si], minlength=n) + 1.0
    s = x.sum()
    out = x / s if s > 0 else x
    return {v: float(out[i]) for v, i in idx.items()}
