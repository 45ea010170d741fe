"""k-truss peel vs a set-based brute-force oracle on micro/random
graphs, distributed-vs-local parity, and the unrolled-SQL driver oracle
convergence contract (SURVEY.md §5 strategy: exact oracles, both
execution paths, invariance to partitioning)."""

from __future__ import annotations

import numpy as np
import pytest

from neo4j_webgraph_ray.pipelines.ktruss import (
    edge_supports_local,
    ktruss_edges,
    ktruss_local,
)
from tests.test_algorithms import GRAPHS, edges_ds, seeded_graph


def _canon(pairs):
    """Canonical distinct simple edges as a sorted set of tuples."""
    out = set()
    for u, v in pairs:
        if u != v:
            out.add((min(u, v), max(u, v)))
    return sorted(out)


def _supports_oracle(edges):
    und = {}
    for a, b in edges:
        und.setdefault(a, set()).add(b)
        und.setdefault(b, set()).add(a)
    return [len(und[a] & und[b]) for a, b in edges]


def _ktruss_oracle(pairs, k):
    edges = set(_canon(pairs))
    rounds = 0
    while True:
        rounds += 1
        sup = dict(zip(sorted(edges), _supports_oracle(sorted(edges))))
        drop = {e for e in edges if sup[e] < k - 2}
        if not drop:
            return edges, rounds
        edges -= drop
        if not edges:
            return edges, rounds


@pytest.mark.parametrize("gname", sorted(GRAPHS))
def test_edge_supports_match_oracle(gname):
    edges = _canon(GRAPHS[gname])
    if not edges:
        return
    a = np.array([e[0] for e in edges], np.int64)
    b = np.array([e[1] for e in edges], np.int64)
    assert edge_supports_local(a, b).tolist() == _supports_oracle(edges)


def test_edge_supports_random():
    edges = _canon(seeded_graph(n=30, m=180, seed=11))
    a = np.array([e[0] for e in edges], np.int64)
    b = np.array([e[1] for e in edges], np.int64)
    assert edge_supports_local(a, b).tolist() == _supports_oracle(edges)


@pytest.mark.parametrize("k", [3, 4, 5])
def test_ktruss_local_matches_oracle(k):
    pairs = seeded_graph(n=25, m=120, seed=7)
    edges = _canon(pairs)
    a = np.array([e[0] for e in edges], np.int64)
    b = np.array([e[1] for e in edges], np.int64)
    keep, rounds = ktruss_local(a, b, k)
    got = set(zip(a[keep].tolist(), b[keep].tolist()))
    want, want_rounds = _ktruss_oracle(pairs, k)
    assert got == want
    assert rounds == want_rounds


def test_ktruss_known_values():
    # K5 is a 5-truss (every edge in 3 triangles); drops entirely at k=6
    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    kept, _ = ktruss_edges(edges_ds(k5), k=5, num_buckets=2)
    assert kept.count() == 10
    kept, _ = ktruss_edges(edges_ds(k5), k=6, num_buckets=2)
    assert kept.count() == 0
    # triangle + pendant edge: 3-truss keeps the triangle only
    g = [(0, 1), (1, 2), (0, 2), (2, 3)]
    kept, _ = ktruss_edges(edges_ds(g), k=3, num_buckets=2)
    assert sorted(map(tuple, kept.to_pandas().values.tolist())) == [
        (0, 1), (0, 2), (1, 2)
    ]
    # two triangles sharing an edge: 4-truss is empty AFTER iterating
    # (each outer edge has support 1, the shared edge 2 — round 1 drops
    # the outer edges, round 2 the now-unsupported shared edge); a
    # single-round support filter would wrongly keep the shared edge
    bowtie = [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3)]
    kept, rounds = ktruss_edges(edges_ds(bowtie), k=4, num_buckets=2)
    assert kept.count() == 0
    assert rounds >= 2


@pytest.mark.parametrize("k", [3, 5])
def test_ktruss_distributed_matches_local(monkeypatch, k):
    import neo4j_webgraph_ray.pipelines.ktruss as kt

    pairs = seeded_graph(n=40, m=220, seed=3)
    want, _ = _ktruss_oracle(pairs, k)
    kept_local, _ = kt.ktruss_edges(edges_ds(pairs), k, num_buckets=4)
    got_local = set(map(tuple, kept_local.to_pandas().values.tolist()))
    assert got_local == want
    monkeypatch.setattr(kt, "LOCAL_TRIANGLE_EDGE_LIMIT", 0)
    kept_dist, _ = kt.ktruss_edges(
        edges_ds(pairs), k, num_buckets=4, local_edge_limit=0
    )
    got_dist = set(map(tuple, kept_dist.to_pandas().values.tolist()))
    assert got_dist == want


def test_ktruss_large_ids_exact():
    """Vertex ids above 2^53 must survive both paths exactly (same
    float64-boundary hazard as the triangle tests)."""
    base = (1 << 53) + 1
    pairs = [(base + a, base + b) for a, b in seeded_graph(n=20, m=80, seed=5)]
    want, _ = _ktruss_oracle(pairs, 4)
    assert want  # non-vacuous
    kept, _ = ktruss_edges(edges_ds(pairs), 4, num_buckets=3)
    assert set(map(tuple, kept.to_pandas().values.tolist())) == want
    kept_d, _ = ktruss_edges(edges_ds(pairs), 4, num_buckets=3, local_edge_limit=0)
    assert set(map(tuple, kept_d.to_pandas().values.tolist())) == want


def test_ktruss_query_converges_within_oracle_unroll(sf_smoke):
    """The driver oracle unrolls KTRUSS_ORACLE_ROUNDS support rounds;
    the engine must reach its fixpoint within that on the driver's
    own input (under-unroll would self-report as a hash mismatch, but
    catch it here first)."""
    from neo4j_webgraph_ray.queries import (
        KTRUSS_K,
        KTRUSS_ORACLE_ROUNDS,
        q_ktruss,
    )
    from neo4j_webgraph_ray.pipelines.ktruss import ktruss_edges as _kt
    import neo4j_webgraph_ray.queries as q
    import pandas as pd
    import ray.data

    rounds_seen = []
    orig = _kt

    def spy(edges, k, **kw):
        ds, rounds = orig(edges, k, **kw)
        rounds_seen.append(rounds)
        return ds, rounds

    import neo4j_webgraph_ray.pipelines.ktruss as ktmod

    old = ktmod.ktruss_edges
    ktmod.ktruss_edges = spy
    try:
        out = q_ktruss(sf_smoke)
    finally:
        ktmod.ktruss_edges = old
    assert len(out) > 0
    assert list(out.columns) == ["a", "b"]
    assert rounds_seen and rounds_seen[0] <= KTRUSS_ORACLE_ROUNDS
    assert KTRUSS_K >= 3  # peel threshold is at least one triangle
