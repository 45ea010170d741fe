"""Triangle count vs brute-force oracle on micro-graphs and a seeded
random graph (exact match per the north rule)."""

from __future__ import annotations

import pytest

from neo4j_webgraph_ray.pipelines.triangles import triangle_count
from tests.oracles import triangles_oracle
from tests.test_algorithms import GRAPHS, edges_ds, seeded_graph


@pytest.mark.parametrize("gname", sorted(GRAPHS))
def test_triangle_count_matches_oracle(gname):
    pairs = GRAPHS[gname]
    assert triangle_count(edges_ds(pairs), num_buckets=4) == triangles_oracle(pairs)


def test_triangle_known_values():
    assert triangle_count(edges_ds(GRAPHS["g_cycle"]), num_buckets=2) == 1
    assert triangle_count(edges_ds(GRAPHS["g_two_islands"]), num_buckets=2) == 2
    assert triangle_count(edges_ds(GRAPHS["g_chain"]), num_buckets=2) == 0
    # complete graph K5: C(5,3) = 10 triangles
    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    assert triangle_count(edges_ds(k5), num_buckets=3) == 10


def test_triangle_denser_random():
    pairs = seeded_graph(n=30, m=180, seed=11)
    assert triangle_count(edges_ds(pairs), num_buckets=5) == triangles_oracle(pairs)


def test_triangles_exact_above_2_53(monkeypatch):
    """Vertex ids above 2^53 (the float64 integer-exactness boundary —
    real hash-range ids live there) must count exactly on BOTH paths:
    the degree-attach join used .map(dict) until round 4, which rounds
    such ids through a float64 intermediate on any miss (VERDICT r3
    #4; mirrors test_cogroup_verify_large_ids_exact)."""
    import neo4j_webgraph_ray.pipelines.triangles as tri

    base = (1 << 53) + 1  # consecutive ids here collide in float64
    pairs = [(base + a, base + b) for a, b in seeded_graph(n=30, m=150, seed=5)]
    expected = triangles_oracle(pairs)
    assert expected > 0
    assert tri.triangle_count(edges_ds(pairs), num_buckets=4) == expected
    monkeypatch.setattr(tri, "LOCAL_TRIANGLE_EDGE_LIMIT", 0)
    assert tri.triangle_count(edges_ds(pairs), num_buckets=4) == expected


def test_distributed_path_matches_local(monkeypatch):
    """Force the partitioned wedge/co-group path and compare with the
    local fast path + oracle."""
    import neo4j_webgraph_ray.pipelines.triangles as tri

    pairs = seeded_graph(n=40, m=200, seed=3)
    expected = triangles_oracle(pairs)
    monkeypatch.setattr(tri, "LOCAL_TRIANGLE_EDGE_LIMIT", 0)
    assert tri.triangle_count(edges_ds(pairs), num_buckets=4) == expected
    monkeypatch.undo()
    assert tri.triangle_count(edges_ds(pairs), num_buckets=4) == expected


def _vt_dict(ds):
    df = ds.to_pandas()
    return {int(r.v): (int(r.tri), int(r.deg)) for r in df.itertuples()}


@pytest.mark.parametrize("gname", sorted(GRAPHS))
def test_vertex_triangles_matches_oracle(gname):
    from neo4j_webgraph_ray.pipelines.triangles import vertex_triangles
    from tests.oracles import vertex_triangles_oracle

    pairs = GRAPHS[gname]
    assert _vt_dict(vertex_triangles(edges_ds(pairs), num_buckets=4)) == (
        vertex_triangles_oracle(pairs)
    )


def test_vertex_triangles_distributed_matches_local(monkeypatch):
    """Force the wedge/co-group path and compare with the local fast
    path + brute-force oracle, including ids above 2^53."""
    import neo4j_webgraph_ray.pipelines.triangles as tri
    from tests.oracles import vertex_triangles_oracle

    base = (1 << 53) + 1
    pairs = [(base + a, base + b) for a, b in seeded_graph(n=40, m=200, seed=3)]
    expected = vertex_triangles_oracle(pairs)
    assert any(t for t, _ in expected.values())
    assert _vt_dict(tri.vertex_triangles(edges_ds(pairs), num_buckets=4)) == expected
    monkeypatch.setattr(tri, "LOCAL_TRIANGLE_EDGE_LIMIT", 0)
    assert _vt_dict(tri.vertex_triangles(edges_ds(pairs), num_buckets=4)) == expected


def test_vertex_triangles_self_loops_and_duplicates():
    from neo4j_webgraph_ray.pipelines.triangles import vertex_triangles
    from tests.oracles import vertex_triangles_oracle

    # triangle + a pendant, with duplicate and self-loop noise
    pairs = [(1, 2), (2, 1), (2, 3), (1, 3), (3, 3), (3, 4), (4, 3)]
    got = _vt_dict(vertex_triangles(edges_ds(pairs), num_buckets=2))
    assert got == vertex_triangles_oracle(pairs)
    assert got[1] == (1, 2) and got[4] == (0, 1)


def test_undirected_with_degrees_and_assortativity():
    """Degree attach matches brute force, and the exact-integer-sum
    assortativity formula equals np.corrcoef over the doubled edge
    list (Newman 2002)."""
    import numpy as np

    from neo4j_webgraph_ray.pipelines.triangles import undirected_with_degrees

    pairs = seeded_graph(n=25, m=90, seed=13)
    und_deg, deg = undirected_with_degrees(edges_ds(pairs), num_buckets=4)
    df = und_deg.to_pandas()
    # brute-force degrees over the simple undirected projection
    und = {(min(s, d), max(s, d)) for s, d in pairs if s != d}
    bd: dict[int, int] = {}
    for a, b in und:
        bd[a] = bd.get(a, 0) + 1
        bd[b] = bd.get(b, 0) + 1
    assert set(zip(df["a"], df["b"])) == und
    assert all(bd[a] == da and bd[b] == dbv
               for a, b, da, dbv in zip(df["a"], df["b"], df["deg_a"], df["deg_b"]))
    assert dict(zip(deg.to_pandas()["v"], deg.to_pandas()["c"])) == bd

    x = df["deg_a"].to_numpy()
    y = df["deg_b"].to_numpy()
    n2 = float(2 * len(df))
    sx = float((x + y).sum())
    sxx = float((x * x + y * y).sum())
    sxy = float((2 * x * y).sum())
    r = (n2 * sxy - sx * sx) / (n2 * sxx - sx * sx)
    ref = np.corrcoef(np.r_[x, y], np.r_[y, x])[0, 1]
    assert abs(r - ref) < 1e-12
