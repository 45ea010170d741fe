"""Checkpoint/resume semantics (FIXTURES.md F6): a run interrupted after
superstep K and resumed must produce exactly the same final state as an
uninterrupted run, with manifest lineage continuity; resuming with a
different algorithm config must fail loudly."""

from __future__ import annotations

import json
import os

import pandas as pd
import pytest

from neo4j_webgraph_ray.pipelines.algorithms import PageRankProgram
from neo4j_webgraph_ray.state.checkpoint import load_manifest
from neo4j_webgraph_ray.state.superstep import SuperstepEngine
from tests.test_algorithms import GRAPHS, edges_ds


def final_df(ds):
    return ds.to_pandas().sort_values("id").reset_index(drop=True)


def test_resume_identical_to_uninterrupted(tmp_path):
    pairs = GRAPHS["g_random"]

    # uninterrupted truth
    full = SuperstepEngine(str(tmp_path / "full"), PageRankProgram(), num_partitions=4)
    full.prepare(edges_ds(pairs))
    truth = final_df(full.run())
    full_manifest = load_manifest(str(tmp_path / "full"))
    assert full_manifest.status == "converged"
    n_steps = len(full_manifest.steps)
    assert n_steps > 4  # enough supersteps to interrupt meaningfully

    # interrupted at 3 supersteps ("crash"), then resumed
    wd = str(tmp_path / "resumed")
    eng = SuperstepEngine(wd, PageRankProgram(), num_partitions=4, max_steps=3)
    eng.prepare(edges_ds(pairs))
    eng.run()
    m = load_manifest(wd)
    assert m.status == "max_steps"
    assert m.steps[-1]["step"] == 3

    eng2 = SuperstepEngine(wd, PageRankProgram(), num_partitions=4, max_steps=100)
    resumed = final_df(eng2.run(resume=True))
    pd.testing.assert_frame_equal(truth, resumed)  # exact, including floats

    # manifest lineage continuity: fingerprints identical, steps contiguous
    m2 = load_manifest(wd)
    assert m2.status == "converged"
    assert m2.input_fingerprint == full_manifest.input_fingerprint
    assert [s["step"] for s in m2.steps] == list(range(len(m2.steps)))
    # resumed run reused the first 3 checkpointed supersteps (same
    # metrics, modulo wall-clock timings)
    def strip_timing(d):
        return {k: v for k, v in d.items() if k not in ("wall_sec", "edges_per_sec")}

    for a, b in zip(full_manifest.steps[:4], m2.steps[:4]):
        assert strip_timing(a) == strip_timing(b)


def test_resume_refuses_changed_config(tmp_path):
    pairs = GRAPHS["g_chain"]
    wd = str(tmp_path / "wd")
    eng = SuperstepEngine(wd, PageRankProgram(damping=0.85), num_partitions=2, max_steps=2)
    eng.prepare(edges_ds(pairs))
    eng.run()
    eng2 = SuperstepEngine(wd, PageRankProgram(damping=0.5), num_partitions=2)
    with pytest.raises(RuntimeError, match="refusing to resume"):
        eng2.run(resume=True)


def test_resume_noop_when_converged(tmp_path):
    pairs = GRAPHS["g_cycle"]
    wd = str(tmp_path / "wd")
    eng = SuperstepEngine(wd, PageRankProgram(), num_partitions=2)
    eng.prepare(edges_ds(pairs))
    a = final_df(eng.run())
    steps_before = len(load_manifest(wd).steps)
    b = final_df(SuperstepEngine(wd, PageRankProgram(), num_partitions=2).run(resume=True))
    pd.testing.assert_frame_equal(a, b)
    assert len(load_manifest(wd).steps) == steps_before  # no extra supersteps


def test_manifest_metrics_recorded(tmp_path):
    pairs = GRAPHS["g_star"]
    wd = str(tmp_path / "wd")
    eng = SuperstepEngine(wd, PageRankProgram(), num_partitions=2)
    eng.prepare(edges_ds(pairs))
    eng.run()
    m = load_manifest(wd)
    assert m.input_fingerprint["n_edges"] == len(pairs)
    assert m.lineage and any("supersteps" in ln for ln in m.lineage)
    for s in m.steps[1:]:
        assert "n_msgs" in s and "max_delta" in s and "edges_per_sec" in s


def test_actor_resume_anchors_on_complete_checkpoint(tmp_path):
    """Async checkpoint writes can leave the manifest one step ahead of
    disk after a crash; resume must anchor on the newest COMPLETE state
    dir and truncate the manifest, then still converge identically."""
    import shutil

    from neo4j_webgraph_ray.state.superstep_actors import ActorSuperstepEngine

    pairs = GRAPHS["g_random"]
    truth = None
    wd = str(tmp_path / "wd")
    eng = SuperstepEngine(wd, PageRankProgram(), num_partitions=4)
    eng.prepare(_edges_of(pairs))
    truth = eng.run().to_pandas().sort_values("id").reset_index(drop=True)

    wd2 = str(tmp_path / "wd2")
    e2 = ActorSuperstepEngine(wd2, PageRankProgram(), num_partitions=4, max_steps=5)
    e2.prepare(_edges_of(pairs))
    e2.run()
    # simulate torn write: last checkpointed step loses one part file
    m = load_manifest(wd2)
    last = m.steps[-1]["step"]
    from neo4j_webgraph_ray.state.checkpoint import state_dir

    os.remove(os.path.join(state_dir(wd2, last), "part=2.parquet"))
    resumed = (
        ActorSuperstepEngine(wd2, PageRankProgram(), num_partitions=4, max_steps=100)
        .run(resume=True)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    m2 = load_manifest(wd2)
    assert m2.status == "converged"
    import numpy as np

    assert np.allclose(truth["rank"], resumed["rank"], atol=1e-9)


def _edges_of(pairs):
    from tests.test_algorithms import edges_ds

    return edges_ds(pairs)


def test_dataset_backend_resume_anchors_on_torn_checkpoint(tmp_path):
    """The Dataset backend must anchor on the last complete checkpoint
    too (shared protocol with the actor backend's async writes)."""
    from neo4j_webgraph_ray.state.checkpoint import state_dir

    pairs = GRAPHS["g_random"]
    wd = str(tmp_path / "wd")
    eng = SuperstepEngine(wd, PageRankProgram(), num_partitions=4, max_steps=5)
    eng.prepare(_edges_of(pairs))
    eng.run()
    m = load_manifest(wd)
    last = m.steps[-1]["step"]
    os.remove(os.path.join(state_dir(wd, last), "part=1.parquet"))
    out = (
        SuperstepEngine(wd, PageRankProgram(), num_partitions=4, max_steps=100)
        .run(resume=True)
        .to_pandas()
    )
    truth = (
        SuperstepEngine(str(tmp_path / "t"), PageRankProgram(), num_partitions=4)
    )
    truth.prepare(_edges_of(pairs))
    tdf = truth.run().to_pandas()
    import numpy as np

    a = out.sort_values("id")["rank"].to_numpy()
    b = tdf.sort_values("id")["rank"].to_numpy()
    assert np.allclose(a, b, atol=1e-9)


def test_cross_backend_resume_preserves_history(tmp_path):
    """dataset→actors resume must anchor on the dataset backend's last
    completed superstep, not restart from step 0 (review finding)."""
    from neo4j_webgraph_ray.state.superstep_actors import ActorSuperstepEngine

    pairs = GRAPHS["g_random"]
    wd = str(tmp_path / "wd")
    e1 = SuperstepEngine(wd, PageRankProgram(), num_partitions=4, max_steps=5)
    e1.prepare(_edges_of(pairs))
    e1.run()
    steps_before = len(load_manifest(wd).steps)
    assert steps_before == 6  # init + 5
    ActorSuperstepEngine(wd, PageRankProgram(), num_partitions=4, max_steps=100).run(
        resume=True
    )
    m = load_manifest(wd)
    # history preserved: resumed run continued after step 5
    assert [s["step"] for s in m.steps[:steps_before]] == list(range(steps_before))
    assert len(m.steps) > steps_before and m.status == "converged"


def test_prepare_clears_stale_workdir(tmp_path):
    """Re-preparing a workdir with a different input must not merge the
    old graph's partitions in (review finding)."""
    wd = str(tmp_path / "wd")
    big = GRAPHS["g_random"]
    eng = SuperstepEngine(wd, PageRankProgram(), num_partitions=4)
    eng.prepare(_edges_of(big))
    small = GRAPHS["g_chain"]
    eng2 = SuperstepEngine(wd, PageRankProgram(), num_partitions=4)
    eng2.prepare(_edges_of(small))
    out = eng2.run().to_pandas()
    assert len(out) == 4  # only chain vertices, nothing from the old graph


def test_hits_resume_identical_both_backends(tmp_path):
    """HITS carries its per-side L1 norms through ctx (Dataset backend:
    update_ctx replay of step metrics; actors backend: payload stats
    recomputed from state each wave) — a run interrupted mid-iteration
    and resumed must equal the uninterrupted fixed-step run EXACTLY on
    both backends, and on the cross-backend path."""
    import numpy as np

    from neo4j_webgraph_ray.pipelines.algorithms import HITSProgram
    from neo4j_webgraph_ray.state.superstep_actors import ActorSuperstepEngine

    pairs = GRAPHS["g_random"]
    doubled = [(2 * s, 2 * d + 1) for s, d in pairs] + [
        (2 * d + 1, 2 * s) for s, d in pairs
    ]
    STEPS = 12

    full = SuperstepEngine(
        str(tmp_path / "full"), HITSProgram(tol=0.0), num_partitions=4,
        max_steps=STEPS,
    )
    full.prepare(edges_ds(doubled))
    truth = final_df(full.run())

    for name, eng_cls in (("ds", SuperstepEngine), ("act", ActorSuperstepEngine)):
        wd = str(tmp_path / f"res_{name}")
        eng = eng_cls(wd, HITSProgram(tol=0.0), num_partitions=4, max_steps=5)
        eng.prepare(edges_ds(doubled))
        eng.run()
        assert load_manifest(wd).status == "max_steps"
        # resume on the OTHER backend for the actors case (cross-backend)
        resume_cls = SuperstepEngine if name == "act" else eng_cls
        eng2 = resume_cls(
            wd, HITSProgram(tol=0.0), num_partitions=4, max_steps=STEPS
        )
        resumed = final_df(eng2.run(resume=True))
        pd.testing.assert_frame_equal(truth, resumed), name
        vals = resumed["val"].to_numpy()
        assert np.isfinite(vals).all() and (vals >= 0).all()
