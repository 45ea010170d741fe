"""Actor (CSR-in-memory) superstep backend: equal results to the
Dataset backend (1e-6 / exact), same checkpoint protocol, cross-backend
resume, and checkpoint_every sparsification."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from neo4j_webgraph_ray.pipelines.algorithms import (
    ConnectedComponentsProgram,
    LabelPropagationProgram,
    PageRankProgram,
    connected_components,
    label_propagation,
    pagerank,
)
from neo4j_webgraph_ray.state.checkpoint import load_manifest
from neo4j_webgraph_ray.state.superstep import SuperstepEngine
from neo4j_webgraph_ray.state.superstep_actors import ActorSuperstepEngine
from tests.test_algorithms import GRAPHS, edges_ds


def fdf(ds):
    return ds.to_pandas().sort_values("id").reset_index(drop=True)


@pytest.mark.parametrize("gname", ["g_random", "g_two_islands", "g_dangling", "g_self_loop"])
def test_backends_agree_pagerank(gname, tmp_path):
    pairs = GRAPHS[gname]
    a = fdf(pagerank(edges_ds(pairs), str(tmp_path / "d"), num_partitions=4, backend="dataset"))
    b = fdf(pagerank(edges_ds(pairs), str(tmp_path / "a"), num_partitions=4, backend="actors"))
    assert (a["id"] == b["id"]).all()
    assert np.allclose(a["rank"], b["rank"], atol=1e-9)


@pytest.mark.parametrize("gname", ["g_random", "g_two_islands"])
def test_backends_agree_cc_lpa(gname, tmp_path):
    pairs = GRAPHS[gname]
    a = fdf(connected_components(edges_ds(pairs), str(tmp_path / "d"), num_partitions=4, backend="dataset"))
    b = fdf(connected_components(edges_ds(pairs), str(tmp_path / "a"), num_partitions=4, backend="actors"))
    pd.testing.assert_frame_equal(a, b)
    c = fdf(label_propagation(edges_ds(pairs), str(tmp_path / "ld"), num_partitions=4, backend="dataset"))
    d = fdf(label_propagation(edges_ds(pairs), str(tmp_path / "la"), num_partitions=4, backend="actors"))
    pd.testing.assert_frame_equal(c, d)


def test_actor_resume_identical(tmp_path):
    pairs = GRAPHS["g_random"]
    truth = fdf(pagerank(edges_ds(pairs), str(tmp_path / "f"), num_partitions=4, backend="actors"))
    wd = str(tmp_path / "r")
    eng = ActorSuperstepEngine(wd, PageRankProgram(), num_partitions=4, max_steps=3)
    eng.prepare(edges_ds(pairs))
    eng.run()
    assert load_manifest(wd).status == "max_steps"
    resumed = fdf(
        ActorSuperstepEngine(wd, PageRankProgram(), num_partitions=4, max_steps=100).run(
            resume=True
        )
    )
    pd.testing.assert_frame_equal(truth, resumed)


def test_cross_backend_resume(tmp_path):
    """A run interrupted under the Dataset backend resumes under the
    actor backend (same checkpoint protocol) and vice versa."""
    pairs = GRAPHS["g_random"]
    truth = fdf(pagerank(edges_ds(pairs), str(tmp_path / "f"), num_partitions=4, backend="dataset"))

    wd = str(tmp_path / "x")
    e1 = SuperstepEngine(wd, PageRankProgram(), num_partitions=4, max_steps=3)
    e1.prepare(edges_ds(pairs))
    e1.run()
    resumed = fdf(
        ActorSuperstepEngine(wd, PageRankProgram(), num_partitions=4, max_steps=100).run(
            resume=True
        )
    )
    assert np.allclose(truth["rank"], resumed["rank"], atol=1e-9)

    wd2 = str(tmp_path / "y")
    e2 = ActorSuperstepEngine(wd2, PageRankProgram(), num_partitions=4, max_steps=3)
    e2.prepare(edges_ds(pairs))
    e2.run()
    resumed2 = fdf(
        SuperstepEngine(wd2, PageRankProgram(), num_partitions=4, max_steps=100).run(
            resume=True
        )
    )
    assert np.allclose(truth["rank"], resumed2["rank"], atol=1e-9)


def test_checkpoint_every_sparsifies_but_final_state_written(tmp_path):
    pairs = GRAPHS["g_random"]
    wd = str(tmp_path / "ck")
    eng = ActorSuperstepEngine(
        wd, PageRankProgram(), num_partitions=4, checkpoint_every=5
    )
    eng.prepare(edges_ds(pairs))
    res = fdf(eng.run())
    m = load_manifest(wd)
    assert m.status == "converged"
    ckpts = [s for s in m.steps[1:] if s.get("checkpointed")]
    assert len(ckpts) < len(m.steps) - 1  # sparsified
    # final step durably on disk and loadable
    truth = fdf(
        pagerank(edges_ds(pairs), str(tmp_path / "t"), num_partitions=4, backend="actors")
    )
    assert np.allclose(res["rank"], truth["rank"], atol=1e-9)


@pytest.mark.parametrize("algo_fn,col", [
    (pagerank, "rank"), (connected_components, "label"), (label_propagation, "label"),
])
def test_fewer_workers_than_partitions(algo_fn, col, tmp_path):
    """W < P: shard workers own several source partitions; duplicate
    destination ids inside a bundle slice must still accumulate
    (regression for the fancy-indexing += bug)."""
    pairs = GRAPHS["g_random"]
    truth = fdf(algo_fn(edges_ds(pairs), str(tmp_path / "t"), num_partitions=6,
                        backend="dataset"))
    wd = str(tmp_path / "w")
    from neo4j_webgraph_ray.pipelines.algorithms import (
        ConnectedComponentsProgram, LabelPropagationProgram, PageRankProgram,
    )
    prog = {
        pagerank: PageRankProgram(),
        connected_components: ConnectedComponentsProgram(),
        label_propagation: LabelPropagationProgram(),
    }[algo_fn]
    if algo_fn is label_propagation:
        eng = ActorSuperstepEngine(wd, prog, num_partitions=6, max_steps=20,
                                   num_workers=2)
    else:
        eng = ActorSuperstepEngine(wd, prog, num_partitions=6, num_workers=2)
    eng.prepare(edges_ds(pairs))
    got = fdf(eng.run())
    if col == "rank":
        assert np.allclose(truth[col], got[col], atol=1e-9)
    else:
        assert (truth[col] == got[col]).all()
