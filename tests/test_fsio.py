"""Cluster-real workdir storage (VERDICT r3 #1): every superstep
artifact — edge partitions, state checkpoints, manifests — must flow
through ``pyarrow.fs`` so a workdir can live on a store all workers
reach (URI or explicit filesystem), not just the driver's local disk.

Exercised here with a non-default ``pyarrow.fs`` (``SubTreeFileSystem``
threaded explicitly through both engine backends) and with ``file://``
URIs; results must be bit-identical to a plain local-path run, and
resume must work unchanged through the abstraction."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pytest
from pyarrow import fs as pafs

from neo4j_webgraph_ray.pipelines.algorithms import PageRankProgram, pagerank
from neo4j_webgraph_ray.state import fsio
from neo4j_webgraph_ray.state.checkpoint import load_manifest
from neo4j_webgraph_ray.state.superstep import SuperstepEngine
from neo4j_webgraph_ray.state.superstep_actors import ActorSuperstepEngine
from tests.test_algorithms import GRAPHS, edges_ds


def final_df(ds):
    return ds.to_pandas().sort_values("id").reset_index(drop=True)


# -- fsio unit behavior -------------------------------------------------------


def test_fsio_roundtrip_on_subtree_fs(tmp_path):
    fs = pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())
    fsio.makedirs("a/b", fs=fs)
    assert fsio.isdir("a/b", fs=fs)
    assert not fsio.exists("a/b/x.parquet", fs=fs)
    t = pa.table({"x": pa.array([1, 2, 3], type=pa.int64())})
    fsio.write_table_atomic(t, "a/b/x.parquet", fs=fs)
    assert fsio.exists("a/b/x.parquet", fs=fs)
    # atomic: no .tmp litter after the rename
    assert sorted(fsio.listdir("a/b", fs=fs)) == ["x.parquet"]
    back = fsio.read_table("a/b/x.parquet", fs=fs)
    assert back.equals(t)
    fsio.write_json_atomic({"k": [1, 2]}, "a/b/m.json", fs=fs)
    assert fsio.read_json("a/b/m.json", fs=fs) == {"k": [1, 2]}
    fsio.rmtree("a", fs=fs)
    assert not fsio.exists("a", fs=fs)
    fsio.rmtree("a", fs=fs)  # idempotent on missing


def test_fsio_uri_resolution(tmp_path):
    uri = f"file://{tmp_path}/wd"
    fsio.makedirs(fsio.join(uri, "sub"))
    assert fsio.isdir(fsio.join(uri, "sub"))
    assert (tmp_path / "wd" / "sub").is_dir()  # actually landed locally
    assert fsio.listdir(uri) == ["sub"]
    assert fsio.listdir(fsio.join(uri, "nonexistent")) == []


def test_fsio_object_store_direct_write(tmp_path, monkeypatch):
    """On a filesystem without atomic rename the write goes DIRECT (the
    object PUT is the atomic primitive): force that branch and assert
    the written parquet/json are complete and readable with no .tmp
    litter."""
    mock = pafs._MockFileSystem()
    assert fsio._rename_is_atomic(mock)  # mock renames fine
    # the decision only depends on the base filesystem under wrappers
    sub = pafs.SubTreeFileSystem("/", pafs.LocalFileSystem())
    assert fsio._rename_is_atomic(sub)

    monkeypatch.setattr(fsio, "_rename_is_atomic", lambda f: False)
    fs = pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())
    t = pa.table({"x": pa.array([1, 2], type=pa.int64())})
    fsio.write_table_atomic(t, "direct.parquet", fs=fs)
    fsio.write_json_atomic({"a": 1}, "direct.json", fs=fs)
    assert fsio.read_table("direct.parquet", fs=fs).equals(t)
    assert fsio.read_json("direct.json", fs=fs) == {"a": 1}
    assert sorted(fsio.listdir("", fs=fs)) == ["direct.json", "direct.parquet"]


def test_fsio_delete_helpers_only_swallow_missing(tmp_path):
    """remove/rmtree ignore ONLY missing targets; real failures (e.g. a
    file where a directory is expected) propagate instead of letting
    stale data silently survive a 'successful' clear."""
    f = tmp_path / "afile"
    f.write_text("x")
    with pytest.raises(NotADirectoryError):
        fsio.rmtree(str(f / "child"))
    fsio.remove(str(f))
    assert not f.exists()
    fsio.remove(str(f))  # missing: fine


# -- engines over a non-default filesystem ------------------------------------


@pytest.mark.parametrize("backend", ["dataset", "actors"])
def test_pagerank_on_subtree_filesystem_matches_local(tmp_path, backend):
    pairs = GRAPHS["g_two_islands"]
    cls = SuperstepEngine if backend == "dataset" else ActorSuperstepEngine

    local = cls(str(tmp_path / "local"), PageRankProgram(), num_partitions=4)
    local.prepare(edges_ds(pairs))
    truth = final_df(local.run())

    fs = pafs.SubTreeFileSystem(str(tmp_path / "remote"), pafs.LocalFileSystem())
    (tmp_path / "remote").mkdir()
    eng = cls(
        "wd", PageRankProgram(), num_partitions=4, filesystem=fs
    )
    eng.prepare(edges_ds(pairs))
    got = final_df(eng.run())
    pd.testing.assert_frame_equal(truth, got)

    # the workdir really lives under the subtree root, manifest included
    assert (tmp_path / "remote" / "wd" / "manifest.json").exists()
    m = load_manifest("wd", fs=fs)
    assert m is not None and m.status == "converged"
    # and NOT at a driver-local ./wd
    import os

    assert not os.path.exists("wd")


def test_pagerank_uri_workdir(tmp_path):
    pairs = GRAPHS["g_star"]
    local = ActorSuperstepEngine(
        str(tmp_path / "plain"), PageRankProgram(), num_partitions=2
    )
    local.prepare(edges_ds(pairs))
    truth = final_df(local.run())

    uri = f"file://{tmp_path}/via-uri"
    got = final_df(
        pagerank(edges_ds(pairs), uri, num_partitions=2)
    )
    pd.testing.assert_frame_equal(truth, got)
    assert (tmp_path / "via-uri" / "manifest.json").exists()


def test_resume_through_explicit_filesystem(tmp_path):
    """Interrupt at 3 supersteps, resume through the same explicit
    filesystem: identical final state to an uninterrupted run (the
    whole checkpoint/anchor/resume path goes through fsio)."""
    pairs = GRAPHS["g_random"] if "g_random" in GRAPHS else GRAPHS["g_two_islands"]
    fs = pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())

    full = ActorSuperstepEngine("full", PageRankProgram(), num_partitions=4,
                                filesystem=fs)
    full.prepare(edges_ds(pairs))
    truth = final_df(full.run())

    eng = ActorSuperstepEngine("wd", PageRankProgram(), num_partitions=4,
                               max_steps=3, filesystem=fs)
    eng.prepare(edges_ds(pairs))
    eng.run()
    assert load_manifest("wd", fs=fs).status == "max_steps"

    eng2 = ActorSuperstepEngine("wd", PageRankProgram(), num_partitions=4,
                                max_steps=100, filesystem=fs)
    resumed = final_df(eng2.run(resume=True))
    pd.testing.assert_frame_equal(truth, resumed)
    assert load_manifest("wd", fs=fs).status == "converged"


def test_partitioned_sink_on_subtree_filesystem(tmp_path):
    """The resumable partitioned sink works against a non-default
    pyarrow.fs: parts + manifest land under the subtree root, and a
    resume skips completed partitions through the same filesystem."""
    import ray.data

    from neo4j_webgraph_ray.sources.io import write_partitioned

    fs = pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())
    t = pa.table(
        {"k": pa.array(list(range(100)), type=pa.int64()),
         "v": pa.array([f"v{i}" for i in range(100)])}
    )
    stats = write_partitioned(
        ray.data.from_arrow(t), "out", ["k"], num_partitions=8, filesystem=fs
    )
    assert stats["total_rows"] == 100
    assert (tmp_path / "out" / "_manifest.json").exists()
    n_parts = len(list((tmp_path / "out").glob("part=*.parquet")))
    assert n_parts == stats["written_partitions"]

    # resume through the same fs: everything already complete
    stats2 = write_partitioned(
        ray.data.from_arrow(t), "out", ["k"], num_partitions=8, filesystem=fs
    )
    assert stats2["written_partitions"] == 0
    assert stats2["total_rows"] == 100
