"""Minimum-spanning-forest conformance: the distributed Borůvka rounds
vs a single-node Kruskal with the same (w, a, b) lexicographic
tie-break (unique forest), on micro graphs with deliberate weight ties,
a seeded random weighted graph, and across partitioning changes."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from neo4j_webgraph_ray.pipelines.msf import minimum_spanning_forest


def kruskal(edges: list[tuple[int, int, int]]) -> set[tuple[int, int, int]]:
    """Exact single-node oracle; edges canonical (a<b, w), tie-break
    (w, a, b)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for a, b, w in sorted(edges, key=lambda e: (e[2], e[0], e[1])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.add((a, b, w))
    return out


def _ds(edges: list[tuple[int, int, int]]) -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.table(
            {"a": pa.array([e[0] for e in edges], pa.int64()),
             "b": pa.array([e[1] for e in edges], pa.int64()),
             "w": pa.array([e[2] for e in edges], pa.int64())}
        )
    )


def _verts(edges, extra=()) -> ray.data.Dataset:
    vs = sorted({v for e in edges for v in e[:2]} | set(extra))
    return ray.data.from_pandas(pd.DataFrame({"v": pd.array(vs, dtype="int64")}))


def _run(edges, tmp_path, extra_verts=(), **kw) -> set[tuple[int, int, int]]:
    out = minimum_spanning_forest(
        _ds(edges), _verts(edges, extra_verts), str(tmp_path),
        num_partitions=3, **kw,
    ).to_pandas()
    return set(zip(out["a"].astype(int), out["b"].astype(int),
                   out["w"].astype(int)))


MICRO = {
    "chain": [(0, 1, 5), (1, 2, 3), (2, 3, 4)],
    # all weights tied: the forest is decided purely by (a, b) order
    "tied_cycle": [(0, 1, 1), (1, 2, 1), (0, 2, 1)],
    "two_islands": [(0, 1, 2), (1, 2, 9), (0, 2, 4),
                    (10, 11, 1), (11, 12, 1), (10, 12, 1)],
    "star_ties": [(0, 1, 7), (0, 2, 7), (0, 3, 7), (1, 2, 7), (2, 3, 7)],
    "parallel_light": [(0, 1, 1), (1, 2, 10), (0, 2, 2), (2, 3, 1),
                       (1, 3, 2)],
}


@pytest.mark.parametrize("gname", sorted(MICRO))
def test_msf_matches_kruskal_micro(gname, tmp_path, ray_session):
    edges = MICRO[gname]
    assert _run(edges, tmp_path) == kruskal(edges), gname


def test_msf_random_graph(tmp_path, ray_session):
    rng = np.random.default_rng(19)
    seen = set()
    edges = []
    while len(edges) < 150:
        a, b = sorted(rng.integers(0, 50, size=2))
        if a == b or (a, b) in seen:
            continue
        seen.add((a, b))
        edges.append((int(a), int(b), int(rng.integers(1, 6))))  # heavy ties
    assert _run(edges, tmp_path) == kruskal(edges)


def test_msf_partitioning_invariance(tmp_path, ray_session):
    edges = MICRO["two_islands"] + MICRO["parallel_light"]
    a = _run(edges, tmp_path / "a", num_buckets=2)
    b = _run(edges, tmp_path / "b", num_buckets=7)
    assert a == b == kruskal(edges)


def test_msf_isolated_vertices_and_empty(tmp_path, ray_session):
    assert _run(MICRO["chain"], tmp_path, extra_verts=(99, 100)) == kruskal(
        MICRO["chain"]
    )
    out = minimum_spanning_forest(
        _ds([]), _verts([], extra=(1, 2)), str(tmp_path / "e"),
        num_partitions=2,
    )
    # Ray's to_pandas drops columns on an empty dataset; the schema
    # carries them
    assert out.count() == 0 and set(out.schema().names) == {"a", "b", "w"}


def test_msf_distributed_contraction_matches_local(tmp_path, ray_session):
    """cc_broadcast_limit=0 forces the superstep-CC contraction path;
    it must produce exactly the size-gated local path's forest."""
    edges = MICRO["two_islands"] + MICRO["star_ties"]
    fast = _run(edges, tmp_path / "f")
    slow = _run(edges, tmp_path / "s", cc_broadcast_limit=0)
    assert fast == slow == kruskal(edges)
