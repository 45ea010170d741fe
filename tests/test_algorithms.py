"""Algorithm conformance: distributed results vs single-node oracles on
the FIXTURES.md F4 micro-graphs plus a seeded random graph and the
sf0.001 transcript-derived graph.  PageRank allclose(atol=1e-6);
components / labels exact."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from neo4j_webgraph_ray.pipelines.algorithms import (
    connected_components,
    label_propagation,
    pagerank,
)
from tests.oracles import components_oracle, lpa_oracle, pagerank_oracle

# FIXTURES.md F4 micro-graphs
GRAPHS = {
    "g_chain": [(0, 1), (1, 2), (2, 3)],
    "g_star": [(1, 0), (2, 0), (3, 0), (4, 0), (5, 0)],
    "g_two_islands": [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)],
    "g_cycle": [(0, 1), (1, 2), (2, 0)],
    "g_dangling": [(0, 1), (1, 2)],
    "g_self_loop": [(0, 0), (0, 1), (1, 2)],
}


def seeded_graph(n=60, m=220, seed=7):
    rng = np.random.default_rng(seed)
    edges = set()
    while len(edges) < m:
        s, d = rng.integers(0, n, size=2)
        edges.add((int(s), int(d)))
    return sorted(edges)


GRAPHS["g_random"] = seeded_graph()


def edges_ds(pairs) -> ray.data.Dataset:
    t = pa.table(
        {
            "src": pa.array([s for s, _ in pairs], type=pa.int64()),
            "dst": pa.array([d for _, d in pairs], type=pa.int64()),
        }
    )
    return ray.data.from_arrow(t)


@pytest.mark.parametrize("gname", sorted(GRAPHS))
def test_pagerank_matches_oracle(gname, tmp_path):
    pairs = GRAPHS[gname]
    res = pagerank(edges_ds(pairs), str(tmp_path / "pr"), num_partitions=4).to_pandas()
    oracle = pagerank_oracle(pairs)
    assert len(res) == len(oracle)
    got = dict(zip(res["id"], res["rank"]))
    for v, r in oracle.items():
        assert abs(got[v] - r) < 1e-6, f"{gname}: vertex {v} {got[v]} vs {r}"
    # ranks sum to ~1
    assert abs(res["rank"].sum() - 1.0) < 1e-6


@pytest.mark.parametrize("gname", sorted(GRAPHS))
def test_components_match_oracle(gname, tmp_path):
    pairs = GRAPHS[gname]
    res = connected_components(
        edges_ds(pairs), str(tmp_path / "cc"), num_partitions=4
    ).to_pandas()
    oracle = components_oracle(pairs)
    got = dict(zip(res["id"], res["label"]))
    assert got == oracle, f"{gname}"


@pytest.mark.parametrize("gname", ["g_chain", "g_two_islands", "g_star", "g_random"])
def test_lpa_matches_oracle(gname, tmp_path):
    pairs = GRAPHS[gname]
    res = label_propagation(
        edges_ds(pairs), str(tmp_path / "lpa"), num_partitions=4
    ).to_pandas()
    oracle = lpa_oracle(pairs)
    got = dict(zip(res["id"], res["label"]))
    assert got == oracle, f"{gname}"


def test_two_islands_components_exact(tmp_path):
    res = connected_components(
        edges_ds(GRAPHS["g_two_islands"]), str(tmp_path / "cc2"), num_partitions=3
    ).to_pandas()
    labels = set(res["label"])
    assert labels == {0, 10}


def test_cycle_pagerank_uniform(tmp_path):
    res = pagerank(
        edges_ds(GRAPHS["g_cycle"]), str(tmp_path / "pr3"), num_partitions=2
    ).to_pandas()
    assert np.allclose(res["rank"], 1.0 / 3, atol=1e-6)


def test_pagerank_partitioning_invariance(tmp_path):
    """Result does not depend on the partition count (within 1e-6)."""
    pairs = GRAPHS["g_random"]
    a = pagerank(edges_ds(pairs), str(tmp_path / "a"), num_partitions=2).to_pandas()
    b = pagerank(edges_ds(pairs), str(tmp_path / "b"), num_partitions=7).to_pandas()
    am = dict(zip(a["id"], a["rank"]))
    bm = dict(zip(b["id"], b["rank"]))
    assert set(am) == set(bm)
    for v in am:
        assert abs(am[v] - bm[v]) < 1e-6


def test_pagerank_on_transcript_graph(sf_smoke, tmp_path):
    """End-to-end: derived sf0.001 graph, engine vs oracle."""
    from neo4j_webgraph_ray.queries import graph

    edges, _ = graph(sf_smoke)
    pairs = [
        (int(s), int(d))
        for s, d in zip(*(edges.to_pandas()[c] for c in ("src", "dst")))
    ]
    res = pagerank(edges, str(tmp_path / "pr_sf"), num_partitions=8).to_pandas()
    oracle = pagerank_oracle(pairs)
    got = dict(zip(res["id"], res["rank"]))
    assert len(got) == len(oracle)
    for v, r in oracle.items():
        assert abs(got[v] - r) < 1e-6


def test_prepare_and_run_on_empty_edges(tmp_path):
    """A zero-edge input must produce a valid EMPTY graph (manifest
    with 0/0, trivially converged run) — the groupby over nothing
    yields a columnless frame that used to KeyError in prepare."""
    import pyarrow as pa
    import ray.data

    from neo4j_webgraph_ray.pipelines.algorithms import PageRankProgram
    from neo4j_webgraph_ray.state.checkpoint import load_manifest
    from neo4j_webgraph_ray.state.superstep import SuperstepEngine

    empty = ray.data.from_arrow(
        pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    )
    eng = SuperstepEngine(str(tmp_path / "wd"), PageRankProgram(), num_partitions=4)
    m = eng.prepare(empty)
    assert m.steps[0]["n_edges"] == 0 and m.steps[0]["n_vertices"] == 0
    out = eng.run()
    assert out.count() == 0
    assert load_manifest(str(tmp_path / "wd")).status in ("converged", "max_steps")


# -- seeded analytics: PPR, BFS distance, k-core -----------------------------

from neo4j_webgraph_ray.pipelines.algorithms import (  # noqa: E402
    BFS_UNREACHED,
    bfs_distances,
    kcore,
    personalized_pagerank,
)
from tests.oracles import bfs_oracle, kcore_oracle, ppr_oracle  # noqa: E402


def _seeds_for(pairs, n=2):
    """Deterministic seed choice: the n smallest vertex ids."""
    return sorted({v for e in pairs for v in e})[:n]


@pytest.mark.parametrize("gname", sorted(GRAPHS))
def test_ppr_matches_oracle(gname, tmp_path):
    pairs = GRAPHS[gname]
    seeds = _seeds_for(pairs)
    res = personalized_pagerank(
        edges_ds(pairs), str(tmp_path / "ppr"), np.array(seeds), num_partitions=4
    ).to_pandas()
    oracle = ppr_oracle(pairs, seeds)
    assert len(res) == len(oracle)
    got = dict(zip(res["id"], res["rank"]))
    for v, r in oracle.items():
        assert abs(got[v] - r) < 1e-6, f"{gname}: vertex {v} {got[v]} vs {r}"
    # PPR iterate stays a probability distribution (dangling mass
    # redistributed to seeds)
    assert abs(res["rank"].sum() - 1.0) < 1e-6


def test_ppr_mass_concentrates_near_seeds(tmp_path):
    """On two islands with seeds on one island, the other island gets
    exactly zero mass."""
    pairs = GRAPHS["g_two_islands"]
    res = personalized_pagerank(
        edges_ds(pairs), str(tmp_path / "ppr2"), np.array([0]), num_partitions=3
    ).to_pandas()
    got = dict(zip(res["id"], res["rank"]))
    assert all(got[v] == 0.0 for v in (10, 11, 12))
    assert all(got[v] > 0.0 for v in (0, 1, 2))


@pytest.mark.parametrize("gname", sorted(GRAPHS))
def test_bfs_matches_oracle(gname, tmp_path):
    pairs = GRAPHS[gname]
    seeds = _seeds_for(pairs, n=1)
    res = bfs_distances(
        edges_ds(pairs), str(tmp_path / "bfs"), np.array(seeds), num_partitions=4
    ).to_pandas()
    oracle = bfs_oracle(pairs, seeds)
    got = dict(zip(res["id"], res["dist"]))
    assert set(got) == set(oracle)
    for v, d in oracle.items():
        want = int(BFS_UNREACHED) if d is None else d
        assert got[v] == want, f"{gname}: vertex {v} {got[v]} vs {want}"


def _sssp_oracle(pairs, weights, seeds):
    """Single-node Bellman–Ford over the symmetrized weighted multiset."""
    adj: dict[int, list[tuple[int, int]]] = {}
    verts = set()
    for (s, d), w in zip(pairs, weights):
        adj.setdefault(s, []).append((d, w))
        adj.setdefault(d, []).append((s, w))
        verts.update((s, d))
    dist = {v: None for v in verts}
    for s in seeds:
        dist[s] = 0
    changed = True
    while changed:
        changed = False
        for v in verts:
            if dist[v] is None:
                continue
            for d, w in adj.get(v, []):
                nd = dist[v] + w
                if dist[d] is None or nd < dist[d]:
                    dist[d] = nd
                    changed = True
    return dist


@pytest.mark.parametrize("gname", sorted(GRAPHS))
@pytest.mark.parametrize("backend", ["actors", "dataset"])
def test_weighted_sssp_matches_oracle(gname, backend, tmp_path):
    """Min-plus SSSP (integer weights, deterministic per-edge) on both
    backends vs a single-node Bellman–Ford."""
    from neo4j_webgraph_ray.pipelines.algorithms import weighted_sssp

    pairs = GRAPHS[gname]
    weights = [1 + ((s * 7 + d * 13) % 5) for s, d in pairs]
    t = pa.table(
        {
            "src": pa.array([s for s, _ in pairs], type=pa.int64()),
            "dst": pa.array([d for _, d in pairs], type=pa.int64()),
            "weight": pa.array([float(w) for w in weights], type=pa.float64()),
        }
    )
    seeds = _seeds_for(pairs, n=1)
    res = weighted_sssp(
        ray.data.from_arrow(t), str(tmp_path / f"sssp_{backend}"),
        np.array(seeds), num_partitions=4, backend=backend,
    ).to_pandas()
    oracle = _sssp_oracle(pairs, weights, seeds)
    got = dict(zip(res["id"], res["dist"]))
    assert set(got) == set(oracle)
    for v, d in oracle.items():
        want = int(BFS_UNREACHED) if d is None else d
        assert got[v] == want, f"{gname}/{backend}: vertex {v} {got[v]} vs {want}"


def test_bfs_multi_source(tmp_path):
    """Two seeds on separate islands reach everything at island-local
    depth."""
    pairs = GRAPHS["g_two_islands"]
    res = bfs_distances(
        edges_ds(pairs), str(tmp_path / "bfs2"), np.array([0, 10]), num_partitions=3
    ).to_pandas()
    oracle = bfs_oracle(pairs, [0, 10])
    got = dict(zip(res["id"], res["dist"]))
    assert got == {v: d for v, d in oracle.items()}


@pytest.mark.parametrize("gname", sorted(GRAPHS))
@pytest.mark.parametrize("k", [2, 3])
def test_kcore_matches_oracle(gname, k, tmp_path):
    pairs = GRAPHS[gname]
    res = kcore(
        edges_ds(pairs), str(tmp_path / "kc"), k=k, num_partitions=4
    ).to_pandas()
    oracle = kcore_oracle(pairs, k)
    got = dict(zip(res["id"], res["alive"]))
    assert got == oracle, f"{gname} k={k}"


def test_kcore_peels_tail(tmp_path):
    """A triangle with a pendant chain: the 2-core is exactly the
    triangle; the chain peels off over successive rounds."""
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5)]
    res = kcore(
        edges_ds(pairs), str(tmp_path / "kc2"), k=2, num_partitions=2
    ).to_pandas()
    got = dict(zip(res["id"], res["alive"]))
    assert got == {0: True, 1: True, 2: True, 3: False, 4: False, 5: False}


# -- HITS --------------------------------------------------------------------


def doubled_ds(pairs) -> ray.data.Dataset:
    """Bipartite doubling over small non-negative test ids (the query
    layer dense-ranks first; here 2u/2u+1 is already overflow-safe)."""
    t = pa.table(
        {
            "src": pa.array(
                [2 * s for s, _ in pairs] + [2 * d + 1 for _, d in pairs],
                type=pa.int64(),
            ),
            "dst": pa.array(
                [2 * d + 1 for _, d in pairs] + [2 * s for s, _ in pairs],
                type=pa.int64(),
            ),
        }
    )
    return ray.data.from_arrow(t)


def _hits_result(pairs, workdir, **kw) -> dict[int, tuple[float, float]]:
    from neo4j_webgraph_ray.pipelines.algorithms import hits

    res = hits(doubled_ds(pairs), workdir, max_steps=50, **kw).to_pandas()
    ids = res["id"].to_numpy()
    vals = res["val"].to_numpy()
    odd = (ids & 1).astype(bool)
    hs, asum = vals[~odd].sum(), vals[odd].sum()
    out: dict[int, list[float]] = {}
    for i, v in zip(ids, vals):
        e = out.setdefault(int(i) >> 1, [0.0, 0.0])
        if i & 1:
            e[1] = v / asum if asum > 0 else v
        else:
            e[0] = v / hs if hs > 0 else v
    return {k: (h, a) for k, (h, a) in out.items()}


@pytest.mark.parametrize("gname", sorted(GRAPHS))
def test_hits_matches_oracle(gname, tmp_path):
    from tests.oracles import hits_oracle

    pairs = GRAPHS[gname]
    got = _hits_result(pairs, str(tmp_path / "hits"), num_partitions=4)
    oracle = hits_oracle(pairs)
    assert set(got) == set(oracle), gname
    for v, (h, a) in oracle.items():
        gh, ga = got[v]
        assert abs(gh - h) < 1e-9, f"{gname}: hub {v} {gh} vs {h}"
        assert abs(ga - a) < 1e-9, f"{gname}: auth {v} {ga} vs {a}"


def test_hits_backends_and_partitioning_agree(tmp_path):
    """Dataset vs actors backend, 2 vs 7 partitions — same scores."""
    pairs = GRAPHS["g_random"]
    a = _hits_result(pairs, str(tmp_path / "a"), num_partitions=2,
                     backend="dataset")
    b = _hits_result(pairs, str(tmp_path / "b"), num_partitions=7,
                     backend="actors")
    assert set(a) == set(b)
    for v in a:
        assert abs(a[v][0] - b[v][0]) < 1e-12
        assert abs(a[v][1] - b[v][1]) < 1e-12


def test_hits_star_concentrates_authority(tmp_path):
    """In the in-star every leaf points at the hub vertex 0: vertex 0
    takes ALL the authority mass, the leaves split hub mass evenly."""
    got = _hits_result(GRAPHS["g_star"], str(tmp_path / "s"), num_partitions=2)
    assert abs(got[0][1] - 1.0) < 1e-12
    for leaf in (1, 2, 3, 4, 5):
        assert abs(got[leaf][0] - 0.2) < 1e-12
        assert got[leaf][1] == 0.0


def test_reciprocity_matches_bruteforce(sf_smoke):
    """q_reciprocity == independent brute force over the same edge
    table (mutual non-loop directed edges / non-loop directed edges)."""
    from neo4j_webgraph_ray.queries import graph, q_reciprocity

    edges, _ = graph(sf_smoke)
    e = edges.select_columns(["src", "dst"]).to_pandas()
    es = {(s, d) for s, d in zip(e["src"], e["dst"]) if s != d}
    nrec = sum(1 for s, d in es if (d, s) in es)
    out = q_reciprocity(sf_smoke)
    assert int(out["n_edges"].iloc[0]) == len(es)
    assert int(out["n_reciprocal"].iloc[0]) == nrec
    assert out["reciprocity"].iloc[0] == round(nrec / len(es), 6)


# -- SCC ----------------------------------------------------------------------

SCC_GRAPHS = dict(GRAPHS)
SCC_GRAPHS["g_two_cycles_bridge"] = [
    (0, 1), (1, 2), (2, 0),        # SCC {0,1,2}
    (2, 10), (10, 11), (11, 10),   # bridge into SCC {10,11}
    (11, 20),                      # DAG tail (singleton)
]
SCC_GRAPHS["g_nested"] = [
    (0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (3, 4), (4, 1),  # {0..4} one SCC
    (4, 9),
]
SCC_GRAPHS["g_desc_chain"] = [(5, 4), (4, 3), (3, 2), (2, 1)]  # all singletons


def _scc_grouping(labels: dict[int, int]) -> set[frozenset[int]]:
    groups: dict[int, set[int]] = {}
    for v, l in labels.items():
        groups.setdefault(l, set()).add(v)
    return {frozenset(g) for g in groups.values()}


@pytest.mark.parametrize("gname", sorted(SCC_GRAPHS))
def test_scc_matches_tarjan(gname, tmp_path):
    from neo4j_webgraph_ray.queries import scc_labels
    from tests.oracles import scc_oracle

    pairs = SCC_GRAPHS[gname]
    res = scc_labels(
        edges_ds(pairs), str(tmp_path / "scc"), num_partitions=3, num_buckets=4
    ).to_pandas()
    got = dict(zip(res["id"], res["label"]))
    # contract: vertices never assigned (all their edges peeled away)
    # are singleton SCCs — q_scc's keep_unmatched join supplies them
    for v in {x for e in pairs for x in e}:
        got.setdefault(v, v)
    oracle = scc_oracle(pairs)
    assert set(got) == set(oracle), gname
    # labels are roots (some SCC member), oracle labels are min ids —
    # compare the PARTITIONS, which are canonical
    assert _scc_grouping(got) == _scc_grouping(oracle), gname


def test_scc_partitioning_invariance(tmp_path):
    from neo4j_webgraph_ray.queries import scc_labels
    pairs = SCC_GRAPHS["g_nested"] + SCC_GRAPHS["g_two_islands"]
    a = scc_labels(edges_ds(pairs), str(tmp_path / "a"),
                   num_partitions=2, num_buckets=2).to_pandas()
    b = scc_labels(edges_ds(pairs), str(tmp_path / "b"),
                   num_partitions=5, num_buckets=7).to_pandas()
    verts = {x for e in pairs for x in e}
    da = dict(zip(a["id"], a["label"]))
    db = dict(zip(b["id"], b["label"]))
    for v in verts:
        da.setdefault(v, v)
        db.setdefault(v, v)
    assert _scc_grouping(da) == _scc_grouping(db)


# -- Brandes betweenness -------------------------------------------------------


@pytest.mark.parametrize("gname", sorted(GRAPHS))
def test_betweenness_all_sources_exact(gname, tmp_path):
    """Seeds = ALL vertices: dependency sums equal the exact Brandes
    oracle on every micro-graph (self-loops/reciprocal edges collapse
    to the simple undirected view)."""
    from neo4j_webgraph_ray.pipelines.algorithms import betweenness_dependencies
    from tests.oracles import brandes_oracle

    pairs = GRAPHS[gname]
    verts = sorted({v for e in pairs for v in e})
    res = betweenness_dependencies(
        edges_ds(pairs), str(tmp_path / "bc"), np.asarray(verts),
        num_partitions=3,
    ).to_pandas()
    got = dict(zip(res["id"], res["dep"]))
    oracle = brandes_oracle(pairs)
    for v in verts:
        assert abs(got.get(v, 0.0) - oracle[v]) < 1e-9, f"{gname}: {v}"


def test_betweenness_chain_closed_form(tmp_path):
    """Path 0-1-2-3, all sources: dep = 2x betweenness -> inner
    vertices 1,2 have betweenness 2 (pairs (0,2)/(0,3) resp (1,3)...),
    i.e. dep 4; endpoints 0."""
    from neo4j_webgraph_ray.pipelines.algorithms import betweenness_dependencies

    res = betweenness_dependencies(
        edges_ds(GRAPHS["g_chain"]), str(tmp_path / "bc"),
        np.asarray([0, 1, 2, 3]), num_partitions=2,
    ).to_pandas()
    got = dict(zip(res["id"], res["dep"]))
    assert got == {0: 0.0, 1: 4.0, 2: 4.0, 3: 0.0}


def test_betweenness_sampled_subset_and_partitioning(tmp_path):
    """A 3-source sample matches the oracle restricted to the same
    sources, independently of partition count."""
    from neo4j_webgraph_ray.pipelines.algorithms import betweenness_dependencies
    from tests.oracles import brandes_oracle

    pairs = GRAPHS["g_random"]
    srcs = [1, 7, 13]
    oracle = brandes_oracle(pairs, sources=srcs)
    for i, parts in enumerate((2, 7)):
        res = betweenness_dependencies(
            edges_ds(pairs), str(tmp_path / f"bc{i}"), np.asarray(srcs),
            num_partitions=parts,
        ).to_pandas()
        got = dict(zip(res["id"], res["dep"]))
        for v, x in oracle.items():
            assert abs(got.get(v, 0.0) - x) < 1e-9, (parts, v)


def test_q_betweenness_matches_reference_brandes(sf_smoke):
    """The contract entry equals the reference Brandes restricted to
    the SAME deterministic source sample, scaled (n/k)/2 — the
    rows-only driver entry's pytest oracle."""
    from neo4j_webgraph_ray.ids import vertex_id
    from neo4j_webgraph_ray.queries import (
        BETWEENNESS_SOURCES,
        _min_vkeys,
        graph,
        q_betweenness,
    )
    from tests.oracles import brandes_oracle

    got = q_betweenness(sf_smoke)
    edges, vertices = graph(sf_smoke)
    e = edges.select_columns(["src", "dst"]).to_pandas()
    pairs = list(zip(e["src"].astype(int), e["dst"].astype(int)))
    seeds_df = _min_vkeys(sf_smoke, BETWEENNESS_SOURCES)
    srcs = [
        int(x)
        for x in vertex_id(
            seeds_df["kind"].to_numpy(), seeds_df["key"].to_numpy()
        )
    ]
    dep = brandes_oracle(pairs, sources=srcs)
    v = vertices.to_pandas()
    vk = dict(zip(v["id"].astype(int), v["kind"] + ":" + v["key"]))
    n, k = len(dep), len(srcs)
    want = {vk[i]: round(d * (n / k) / 2.0, 6) for i, d in dep.items()}
    gotmap = dict(zip(got["vkey"], got["bc"]))
    assert gotmap == want
    assert any(x > 0 for x in gotmap.values())


def test_graph_summary_local_and_distributed_paths_agree(sf_smoke, monkeypatch):
    """The single-task gate and the bucketed-join path produce the
    identical 6-dp summary row (same int64 partials, same float ops)."""
    import neo4j_webgraph_ray.pipelines.triangles as tri
    from neo4j_webgraph_ray.queries import q_graph_summary

    local = q_graph_summary(sf_smoke)
    monkeypatch.setattr(tri, "LOCAL_TRIANGLE_EDGE_LIMIT", 0)
    dist = q_graph_summary(sf_smoke)
    pd.testing.assert_frame_equal(local, dist)


# -- MIS -----------------------------------------------------------------------


@pytest.mark.parametrize("gname", sorted(GRAPHS))
def test_mis_matches_greedy_oracle(gname, tmp_path):
    """Fixed-priority Luby rounds == sequential greedy by priority, and
    the result is independent and maximal."""
    from neo4j_webgraph_ray.pipelines.algorithms import mis
    from tests.oracles import mis_oracle

    pairs = GRAPHS[gname]
    simple = sorted(
        {(min(s, d), max(s, d)) for s, d in pairs if s != d}
    )
    if not simple:
        pytest.skip("no simple edges")
    res = mis(edges_ds(simple), str(tmp_path / "mis"), num_partitions=3).to_pandas()
    got = dict(zip(res["id"], res["status"]))
    assert set(got.values()) <= {1, 2}, gname  # converged: nobody active
    oracle = mis_oracle(pairs)
    assert {v: s == 1 for v, s in got.items()} == oracle, gname
    # independence + maximality, first principles
    in_mis = {v for v, s in got.items() if s == 1}
    adj = {}
    for s, d in simple:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    for v in in_mis:
        assert not (adj[v] & in_mis), f"{gname}: not independent at {v}"
    for v, s in got.items():
        if s != 1:
            assert adj[v] & in_mis, f"{gname}: not maximal at {v}"


# -- weighted PageRank ---------------------------------------------------------


def weighted_edges_ds(triples) -> ray.data.Dataset:
    t = pa.table(
        {
            "src": pa.array([s for s, _, _ in triples], type=pa.int64()),
            "dst": pa.array([d for _, d, _ in triples], type=pa.int64()),
            "weight": pa.array([w for _, _, w in triples], type=pa.float64()),
        }
    )
    return ray.data.from_arrow(t)


def wpagerank_oracle(triples, n_iter=100, d=0.85):
    """Dense weighted power iteration with dangling redistribution."""
    verts = sorted({v for s, t, _ in triples for v in (s, t)})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    W = np.zeros(n)
    for s, _, w in triples:
        W[idx[s]] += w
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dang = r[W == 0].sum()
        new = np.full(n, (1 - d) / n) + d * dang / n
        for s, t, w in triples:
            new[idx[t]] += d * (r[idx[s]] / W[idx[s]]) * w
        r = new
    return {v: r[i] for v, i in idx.items()}


@pytest.mark.parametrize("backend", ["actors", "dataset"])
def test_weighted_pagerank_matches_oracle(backend, tmp_path):
    from neo4j_webgraph_ray.pipelines.algorithms import weighted_pagerank

    triples = [
        (0, 1, 3.0), (0, 2, 1.0), (1, 2, 2.0), (2, 0, 1.0),
        (3, 0, 5.0), (3, 1, 0.5), (4, 4, 1.0), (2, 5, 4.0),
    ]
    res = weighted_pagerank(
        weighted_edges_ds(triples), str(tmp_path / f"wpr_{backend}"),
        num_partitions=3, tol=0.0, max_steps=100, backend=backend,
    ).to_pandas()
    oracle = wpagerank_oracle(triples)
    got = dict(zip(res["id"], res["rank"]))
    assert set(got) == set(oracle)
    for v, r in oracle.items():
        assert abs(got[v] - r) < 1e-9, (backend, v, got[v], r)
    assert abs(res["rank"].sum() - 1.0) < 1e-9


def test_weighted_pagerank_unit_weights_equal_unweighted(tmp_path):
    """weight=1 everywhere must reproduce plain PageRank exactly (the
    weighted path is a strict generalization)."""
    from neo4j_webgraph_ray.pipelines.algorithms import weighted_pagerank

    pairs = GRAPHS["g_random"]
    plain = pagerank(
        edges_ds(pairs), str(tmp_path / "p"), num_partitions=4,
        tol=0.0, max_steps=60,
    ).to_pandas()
    w = weighted_pagerank(
        weighted_edges_ds([(s, d, 1.0) for s, d in pairs]),
        str(tmp_path / "w"), num_partitions=4, tol=0.0, max_steps=60,
    ).to_pandas()
    pm = dict(zip(plain["id"], plain["rank"]))
    wm = dict(zip(w["id"], w["rank"]))
    assert set(pm) == set(wm)
    for v in pm:
        assert abs(pm[v] - wm[v]) < 1e-12, v


def _simple_ds(pairs) -> ray.data.Dataset:
    simple = sorted({(min(s, d), max(s, d)) for s, d in pairs if s != d})
    t = pa.table(
        {
            "src": pa.array([a for a, _ in simple], type=pa.int64()),
            "dst": pa.array([b for _, b in simple], type=pa.int64()),
        }
    )
    return ray.data.from_arrow(t)


def _eigen_result(pairs, workdir, **kw) -> dict[int, float]:
    from neo4j_webgraph_ray.pipelines.algorithms import eigenvector

    res = eigenvector(_simple_ds(pairs), workdir, max_steps=50, **kw).to_pandas()
    vals = res["val"].to_numpy()
    s = vals.sum()
    vals = vals / s if s > 0 else vals
    return {int(i): float(v) for i, v in zip(res["id"].to_numpy(), vals)}


@pytest.mark.parametrize("gname", sorted(GRAPHS))
def test_eigenvector_matches_oracle(gname, tmp_path):
    from tests.oracles import eigenvector_oracle

    pairs = GRAPHS[gname]
    got = _eigen_result(pairs, str(tmp_path / "ev"), num_partitions=4)
    oracle = eigenvector_oracle(pairs)
    assert set(got) == set(oracle), gname
    for v, x in oracle.items():
        assert abs(got[v] - x) < 1e-9, f"{gname}: {v} {got[v]} vs {x}"


def test_eigenvector_backends_and_partitioning_agree(tmp_path):
    pairs = GRAPHS["g_random"]
    a = _eigen_result(pairs, str(tmp_path / "a"), num_partitions=2,
                      backend="dataset")
    b = _eigen_result(pairs, str(tmp_path / "b"), num_partitions=7,
                      backend="actors")
    assert set(a) == set(b)
    for v in a:
        assert abs(a[v] - b[v]) < 1e-12


def test_eigenvector_triangle_pendant_ordering(tmp_path):
    """On a triangle with a pendant (non-bipartite, so the iteration
    converges to the principal eigenvector): the attachment vertex is
    the most central, the symmetric pair are equal, the pendant is the
    least central, and the closed-form eigen-equation holds: the
    pendant's score is attachment/λ with λ the principal eigenvalue
    (scores are eigenvector ratios, normalization-independent)."""
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3)]
    got = _eigen_result(pairs, str(tmp_path / "tp"), num_partitions=2)
    assert got[2] > got[0] > got[3] > 0
    assert got[0] == pytest.approx(got[1], abs=1e-12)
    # λ from the symmetric pair: A·x at vertex 0 = x1 + x2 = λ·x0
    lam = (got[1] + got[2]) / got[0]
    assert got[3] == pytest.approx(got[2] / lam, abs=1e-9)


def _katz_result(pairs, workdir, **kw) -> dict[int, float]:
    from neo4j_webgraph_ray.pipelines.algorithms import katz

    res = katz(edges_ds(pairs), workdir, alpha=0.05, max_steps=30,
               **kw).to_pandas()
    vals = res["val"].to_numpy()
    s = vals.sum()
    vals = vals / s if s > 0 else vals
    return {int(i): float(v) for i, v in zip(res["id"].to_numpy(), vals)}


@pytest.mark.parametrize("gname", sorted(GRAPHS))
def test_katz_matches_oracle(gname, tmp_path):
    from tests.oracles import katz_oracle

    pairs = GRAPHS[gname]
    got = _katz_result(pairs, str(tmp_path / "kz"), num_partitions=4)
    oracle = katz_oracle(pairs)
    assert set(got) == set(oracle), gname
    for v, x in oracle.items():
        assert abs(got[v] - x) < 1e-9, f"{gname}: {v} {got[v]} vs {x}"


def test_katz_backends_and_partitioning_agree(tmp_path):
    pairs = GRAPHS["g_random"]
    a = _katz_result(pairs, str(tmp_path / "a"), num_partitions=2,
                     backend="dataset")
    b = _katz_result(pairs, str(tmp_path / "b"), num_partitions=7,
                     backend="actors")
    assert set(a) == set(b)
    for v in a:
        assert abs(a[v] - b[v]) < 1e-12


def test_katz_chain_closed_form(tmp_path):
    """On the 3-edge chain 0->1->2->3, the fixpoint is the geometric
    walk sum: x(0)=1, x(k)=1+alpha*x(k-1) (30 affine steps converge far
    past 1e-12 at alpha=0.05)."""
    pairs = [(0, 1), (1, 2), (2, 3)]
    got = _katz_result(pairs, str(tmp_path / "chain"), num_partitions=2)
    a = 0.05
    raw = [1.0, 1 + a, 1 + a * (1 + a), 1 + a * (1 + a * (1 + a))]
    s = sum(raw)
    for v in range(4):
        assert abs(got[v] - raw[v] / s) < 1e-9


def _parity_conflicts(pairs, workdir) -> int:
    """Mirror of the q_bipartite_check composition on raw int edges:
    CC min-label seeds -> one multi-source BFS -> count simple
    undirected edges whose endpoints share hop parity."""
    simple = {(min(s, d), max(s, d)) for s, d in pairs if s != d}
    eds = edges_ds(sorted(simple))
    labels = connected_components(
        eds, f"{workdir}/cc", num_partitions=3
    ).to_pandas()
    seeds = np.sort(labels["label"].unique()).astype(np.int64)
    state = bfs_distances(
        eds, f"{workdir}/bfs", seeds, num_partitions=3
    ).to_pandas()
    side = dict(zip(state["id"].astype(int), state["dist"].astype(int) % 2))
    return sum(1 for a, b in simple if side[a] == side[b])


def test_bipartite_parity_even_cycle(tmp_path):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0)]
    assert _parity_conflicts(pairs, str(tmp_path)) == 0


def test_bipartite_parity_odd_cycle(tmp_path):
    pairs = [(0, 1), (1, 2), (2, 0)]
    assert _parity_conflicts(pairs, str(tmp_path)) == 1


def test_bipartite_parity_two_components(tmp_path):
    """One bipartite island (path) + one odd-cycle island: exactly the
    odd cycle's conflict, found with a single multi-seed BFS."""
    pairs = [(0, 1), (1, 2), (10, 11), (11, 12), (12, 10)]
    assert _parity_conflicts(pairs, str(tmp_path)) == 1
