"""Neighborhood function / HyperBall family vs brute-force BFS oracles.

Exact path: bit-for-bit vs the BFS oracle (including the ascending-hop
harmonic fold).  HyperBall path: registers after convergence must equal
the elementwise max of the single-element registers over the EXACT ball
members (propagation correctness, independent of estimator accuracy),
plus an estimator accuracy bound vs the exact series.
"""

from __future__ import annotations

import numpy as np
import pytest

from neo4j_webgraph_ray.pipelines.neighborhood import (
    ExactBallProgram,
    ball_profile,
    hll_estimate,
    hll_init_registers,
)
from tests.oracles import (
    ball_distances_oracle,
    harmonic_centrality_oracle,
    neighborhood_function_oracle,
)
from tests.test_algorithms import GRAPHS, edges_ds, seeded_graph


def _exact_ids(pairs) -> np.ndarray:
    ids = sorted({x for e in pairs for x in e})
    return np.asarray(ids, dtype=np.int64)


def _run_exact(pairs, workdir, parts=4):
    hops, state = ball_profile(
        edges_ds(pairs), workdir, exact_ids=_exact_ids(pairs),
        num_partitions=parts,
    )
    return hops, state.to_pandas().sort_values("id").reset_index(drop=True)


@pytest.mark.parametrize("gname", sorted(GRAPHS))
def test_exact_nf_matches_oracle(gname, tmp_path):
    pairs = GRAPHS[gname]
    hops, state = _run_exact(pairs, str(tmp_path / "nf"))
    want = neighborhood_function_oracle(pairs)
    assert hops["hop"].tolist() == list(range(len(want)))
    assert hops["nf"].tolist() == [float(x) for x in want]
    # per-vertex final ball size == n of the vertex's component
    dists = ball_distances_oracle(pairs)
    got_cnt = dict(zip(state["id"], state["cnt"]))
    assert got_cnt == {v: float(len(m)) for v, m in dists.items()}


@pytest.mark.parametrize("gname", sorted(GRAPHS))
def test_exact_hc_matches_oracle(gname, tmp_path):
    pairs = GRAPHS[gname]
    _, state = _run_exact(pairs, str(tmp_path / "hc"))
    want = harmonic_centrality_oracle(pairs)
    got = dict(zip(state["id"], state["hc"]))
    assert set(got) == set(want)
    for v in want:  # identical ascending-hop IEEE fold -> exact equality
        assert got[v] == want[v], (v, got[v], want[v])


def test_exact_partitioning_invariance_and_large_ids(tmp_path):
    """Results identical at different partition counts, with ids above
    2^53 (hash-range ids; any float64 intermediate would round them)."""
    base = (1 << 53) + 1
    pairs = [(base + a, base + b) for a, b in seeded_graph(n=40, m=140, seed=9)]
    h2, s2 = _run_exact(pairs, str(tmp_path / "p2"), parts=2)
    h5, s5 = _run_exact(pairs, str(tmp_path / "p5"), parts=5)
    assert h2.equals(h5)
    assert s2.equals(s5)
    assert h2["nf"].tolist() == [float(x) for x in neighborhood_function_oracle(pairs)]


def test_exact_empty_graph(tmp_path):
    hops, state = ball_profile(
        edges_ds([]), str(tmp_path / "e"),
        exact_ids=np.empty(0, dtype=np.int64), num_partitions=2,
    )
    assert len(hops) == 0 and state.count() == 0


def test_hyperball_registers_match_exact_ball_max(tmp_path):
    """Propagation correctness: after convergence each vertex's HLL
    registers must equal the elementwise max of the single-element
    registers over its EXACT ball — and hence the per-vertex estimate
    is bit-identical to the estimator applied to that max."""
    pairs = seeded_graph(n=50, m=160, seed=21)
    log2m = 5
    _, state_ds = ball_profile(
        edges_ds(pairs), str(tmp_path / "hb"), log2m=log2m, num_partitions=3,
    )
    state = state_ds.to_pandas().sort_values("id").reset_index(drop=True)
    dists = ball_distances_oracle(pairs)
    ids = state["id"].to_numpy()
    init = hll_init_registers(ids, log2m)
    pos = {int(v): i for i, v in enumerate(ids)}
    want_regs = np.stack(
        [init[[pos[u] for u in dists[int(v)]]].max(axis=0) for v in ids]
    )
    want_cnt = hll_estimate(want_regs)
    np.testing.assert_array_equal(state["cnt"].to_numpy(), want_cnt)


def test_hyperball_nf_accuracy_and_shape(tmp_path):
    """m = 128 registers -> ~9% per-ball sigma; the summed series must
    track the exact neighborhood function within a lenient 5-sigma."""
    pairs = seeded_graph(n=60, m=220, seed=7)
    hops, _ = ball_profile(
        edges_ds(pairs), str(tmp_path / "hb"), log2m=7, num_partitions=4,
    )
    want = neighborhood_function_oracle(pairs)
    assert hops["hop"].tolist() == list(range(len(want)))
    rel = np.abs(hops["nf"].to_numpy() - np.asarray(want, dtype=float)) / np.asarray(
        want, dtype=float
    )
    assert rel.max() < 0.45  # 5 sigma at m=128

    # determinism: a re-run at the same partition count is bit-identical
    hops2, _ = ball_profile(
        edges_ds(pairs), str(tmp_path / "hb2"), log2m=7, num_partitions=4,
    )
    assert hops.equals(hops2)
    # across partition counts only the float fold order of the nf_sum
    # partials differs (registers are partitioning-independent — see
    # test_hyperball_registers_match_exact_ball_max)
    hops3, _ = ball_profile(
        edges_ds(pairs), str(tmp_path / "hb3"), log2m=7, num_partitions=2,
    )
    np.testing.assert_allclose(hops3["nf"], hops["nf"], rtol=1e-12)


def test_exact_program_rejected_by_actor_backend(tmp_path):
    from neo4j_webgraph_ray.state.superstep_actors import ActorSuperstepEngine

    with pytest.raises(NotImplementedError, match="Dataset backend"):
        ActorSuperstepEngine(
            str(tmp_path / "x"),
            ExactBallProgram(np.asarray([1, 2], dtype=np.int64)),
            num_partitions=2,
        )


def test_exact_step_count_below_shared_cap(tmp_path):
    """The engine converges at diameter+1 supersteps — far below the
    NF_ORACLE_CAP the SQL oracle unrolls to (shared-cap contract)."""
    from neo4j_webgraph_ray.queries import NF_ORACLE_CAP
    from neo4j_webgraph_ray.state.checkpoint import load_manifest

    pairs = GRAPHS["g_chain"]
    wd = str(tmp_path / "cap")
    _run_exact(pairs, wd)
    manifest = load_manifest(wd)
    assert manifest.status == "converged"
    assert manifest.steps[-1]["step"] < NF_ORACLE_CAP
    # chain 0-1-2-3: diameter 3 -> 3 productive steps + 1 confirming
    assert manifest.steps[-1]["step"] == 4


@pytest.mark.parametrize("gname", sorted(GRAPHS))
def test_exact_closeness_matches_oracle(gname, tmp_path):
    from tests.oracles import closeness_oracle

    pairs = GRAPHS[gname]
    _, state = _run_exact(pairs, str(tmp_path / "clo"))
    want = closeness_oracle(pairs)
    sd = state["sd"].to_numpy()
    cnt = state["cnt"].to_numpy()
    got = dict(
        zip(state["id"], np.where(sd > 0, (cnt - 1.0) / np.where(sd > 0, sd, 1.0), 0.0))
    )
    assert set(got) == set(want)
    for v in want:  # single float division over exact ints -> exact
        assert got[v] == want[v], (v, got[v], want[v])


def test_effective_diameter_interpolation_chain(tmp_path):
    """4-vertex chain (undirected): nf = [4, 10, 14, 16]; thr = 14.4,
    first hop >= thr is 3, eff = 2 + (14.4-14)/(16-14) = 2.2."""
    hops, _ = _run_exact(GRAPHS["g_chain"], str(tmp_path / "ed"))
    nf = hops.sort_values("hop")["nf"].to_numpy().astype(np.float64)
    assert list(nf) == [4.0, 10.0, 14.0, 16.0]
    thr = 0.9 * nf[-1]
    t = int(np.searchsorted(nf, thr))
    eff = (t - 1) + (thr - nf[t - 1]) / (nf[t] - nf[t - 1])
    assert abs(eff - 2.2) < 1e-12
    # the query-layer expression is identical (kept in lockstep by the
    # effective_diameter SQL-oracle parity test at sf scale)


def test_approx_distinct_users_within_hll_error(sf_smoke):
    """The sketch entry must land within the HLL error envelope of the
    exact per-type distinct counts (~2.3% std error at 2^11 registers;
    assert 5 sigma) and agree exactly on the type set."""
    import duckdb

    from neo4j_webgraph_ray.queries import (
        APPROX_DISTINCT_LOG2M,
        DISTINCT_USERS_SQL,
        q_approx_distinct_users,
    )

    approx = q_approx_distinct_users(sf_smoke)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_smoke}/events.parquet'"
    )
    exact = con.sql(DISTINCT_USERS_SQL).df().sort_values("event_type")
    assert list(approx["event_type"]) == list(exact["event_type"])
    m = 1 << APPROX_DISTINCT_LOG2M
    rel = 5 * 1.04 / np.sqrt(m)  # 5 sigma of the HLL std error
    a = approx["approx_users"].to_numpy().astype(float)
    e = exact["n_users"].to_numpy().astype(float)
    assert np.all(np.abs(a - e) <= np.maximum(rel * e, 3.0)), (a, e)
