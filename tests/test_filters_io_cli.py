"""Filters + rejects routing (F5 rules), resumable partitioned sink,
and the CLI surface."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from neo4j_webgraph_ray.sources.io import read_table_auto, write_partitioned, write_rejects
from neo4j_webgraph_ray.stages.filters import (
    allow_deny_filter,
    clean_transcripts,
    regex_filter,
)


def raw_transcripts():
    df = pd.DataFrame(
        {
            "conv_id": ["a", "a", "", "b", "  ", "c"],
            "turn_idx": pd.array([0, 1, 0, -1, 0, 0], dtype="int32"),
            "role": ["User", "assistant ", "user", "user", "user", ""],
            "text": ["t0", "t1", "t2", "t3", "t4", "t5"],
            "tool": [None, "search ", None, None, "   ", None],
            "ts": pd.Timestamp("2025-01-01"),
        }
    )
    return ray.data.from_pandas(df)


def test_clean_transcripts_splits_and_normalizes():
    clean, rejects = clean_transcripts(raw_transcripts())
    c = clean.to_pandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    r = rejects.to_pandas()
    # rows kept: (a,0) (a,1); dropped: empty conv ×2, negative turn, empty role
    assert list(c["conv_id"]) == ["a", "a"]
    assert list(c["role"]) == ["user", "assistant"]  # trimmed + lowercased
    assert c["tool"].tolist() == [None, "search"]  # trimmed, null kept
    assert sorted(r["error_type"]) == [
        "empty_conv_id", "empty_conv_id", "empty_role", "negative_turn_idx",
    ]


def test_regex_and_allow_deny_filters():
    ds = ray.data.from_pandas(
        pd.DataFrame({"key": ["page.html", "img.png", "style.css", "doc.pdf"]})
    )
    out = regex_filter(ds, "key", r"\.(png|css)$").to_pandas()
    assert sorted(out["key"]) == ["doc.pdf", "page.html"]
    out2 = allow_deny_filter(
        ds, "key", allow=["page.html", "img.png"], deny=["img.png"]
    ).to_pandas()
    assert list(out2["key"]) == ["page.html"]


def test_write_partitioned_resume(tmp_path):
    df = pd.DataFrame({"k": range(100), "v": range(100)})
    ds = ray.data.from_pandas(df)
    out = str(tmp_path / "out")
    s1 = write_partitioned(ds, out, ["k"], num_partitions=8)
    assert s1["written_partitions"] == 8 and s1["total_rows"] == 100
    # rerun: everything skipped
    s2 = write_partitioned(ds, out, ["k"], num_partitions=8)
    assert s2["written_partitions"] == 0 and s2["skipped_partitions"] == 8
    back = read_table_auto(out).to_pandas()
    assert sorted(back["k"]) == list(range(100))
    # simulate a failed partition: remove one file + its manifest entry
    mp = os.path.join(out, "_manifest.json")
    m = json.load(open(mp))
    victim = sorted(m["partitions"])[0]
    del m["partitions"][victim]
    json.dump(m, open(mp, "w"))
    os.remove(os.path.join(out, f"part={victim}.parquet"))
    s3 = write_partitioned(ds, out, ["k"], num_partitions=8)
    assert s3["written_partitions"] == 1  # only the failed partition redone
    assert sorted(read_table_auto(out).to_pandas()["k"]) == list(range(100))


def test_write_partitioned_refuses_layout_mismatch(tmp_path):
    """Resume under a changed partition count or key must fail loudly —
    skipping 'completed' buckets from a different layout silently merges
    stale and new data (ADVICE r1)."""
    df = pd.DataFrame({"k": range(20), "v": range(20)})
    out = str(tmp_path / "out")
    write_partitioned(ray.data.from_pandas(df), out, ["k"], num_partitions=8)
    with pytest.raises(ValueError, match="layout mismatch"):
        write_partitioned(ray.data.from_pandas(df), out, ["k"], num_partitions=4)
    with pytest.raises(ValueError, match="layout mismatch"):
        write_partitioned(ray.data.from_pandas(df), out, ["v"], num_partitions=8)
    # non-resume run owns the dir: clears and rewrites under the new layout
    s = write_partitioned(
        ray.data.from_pandas(df), out, ["k"], num_partitions=4, resume=False
    )
    assert s["written_partitions"] == 4
    import json as _json

    m = _json.load(open(os.path.join(out, "_manifest.json")))
    assert m["num_partitions"] == 4


def test_write_partitioned_resume_without_manifest_clears_dir(tmp_path):
    """resume=True on a dir with part files but NO manifest (a run that
    crashed before any bookkeeping): the dir is unowned — stale parts
    are cleared, never silently merged under a new layout (ADVICE r2)."""
    df = pd.DataFrame({"k": range(40), "v": range(40)})
    out = str(tmp_path / "out")
    write_partitioned(ray.data.from_pandas(df), out, ["k"], num_partitions=8)
    os.remove(os.path.join(out, "_manifest.json"))  # simulate the crash
    # rerun RESUMING under a SMALLER partition count: parts 4..7 from
    # the dead run must not survive next to the new parts 0..3
    s = write_partitioned(
        ray.data.from_pandas(df), out, ["k"], num_partitions=4, resume=True
    )
    assert s["written_partitions"] == 4
    parts = sorted(n for n in os.listdir(out) if n.endswith(".parquet"))
    assert parts == [f"part={i}.parquet" for i in range(4)]
    assert sorted(read_table_auto(out).to_pandas()["k"]) == list(range(40))


def test_write_rejects_no_error_column_total_only(tmp_path):
    """A rejects table with no recognized error column gets a
    total-only summary — never one entry per distinct value of an
    arbitrary high-cardinality column (ADVICE r2)."""
    from neo4j_webgraph_ray.sources.io import write_rejects

    df = pd.DataFrame({"conv_id": [f"c{i}" for i in range(30)],
                       "detail": range(30)})
    n = write_rejects(ray.data.from_pandas(df), str(tmp_path / "rej"))
    assert n == 30
    summary = json.load(open(tmp_path / "rej" / "_summary.json"))
    assert summary == {"total": 30}


def test_cli_warns_on_unknown_config_keys(tmp_path):
    """A typo'd config key warns on stderr instead of being silently
    ignored (ADVICE r2)."""
    cfg = tmp_path / "cfg.json"
    cfg.write_text(json.dumps({"num_partitons": 4}))  # typo'd key
    ddir = tmp_path / "docs"
    ddir.mkdir()
    pd.DataFrame({"doc_id": pd.array([0, 1], dtype="int64"),
                  "text": ["a b", "a b"]}).to_parquet(ddir / "p.parquet")
    argv = [sys.executable, "-m", "neo4j_webgraph_ray", "--num-cpus", "2",
            "--config", str(cfg), "dedup", "--input", str(ddir),
            "--out", str(tmp_path / "o"), "--method", "exact"]
    proc = subprocess.run(argv, capture_output=True, text=True, timeout=300,
                          cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "num_partitons" in proc.stderr
    assert "matched no argument" in proc.stderr


def test_cli_dedup_exact_and_minhash(tmp_path):
    """Job-surface dedup over a documents table: exact survivors and
    MinHash near-dup pairs, both through the resumable sink."""
    docs = pd.DataFrame(
        {
            "doc_id": pd.array([0, 1, 2, 3], dtype="int64"),
            "text": [
                "the quick brown fox jumps over the lazy dog today",
                "the quick brown fox jumps over the lazy dog today",  # dup of 0
                "the quick brown fox jumps over the lazy cat today",  # near dup
                "completely different content about engines",
            ],
        }
    )
    ddir = str(tmp_path / "docs")
    os.makedirs(ddir)
    docs.to_parquet(os.path.join(ddir, "part-0.parquet"))
    for method, checker in (
        ("exact", lambda df: sorted(df["doc_id"]) == [0, 2, 3]),
        ("minhash", lambda df: (1 in set(df["b"]))),
    ):
        out = str(tmp_path / f"out-{method}")
        argv = [sys.executable, "-m", "neo4j_webgraph_ray", "--num-cpus", "4",
                "dedup", "--input", ddir, "--out", out, "--method", method,
                "--tau", "0.5", "--num-partitions", "2"]
        proc = subprocess.run(argv, capture_output=True, text=True, timeout=300,
                              cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        assert proc.returncode == 0, proc.stderr[-2000:]
        res = json.loads(proc.stdout.strip().splitlines()[-1])
        assert res["method"] == method
        back = pd.concat(
            [pd.read_parquet(os.path.join(out, f))
             for f in os.listdir(out) if f.endswith(".parquet")]
        )
        assert checker(back), (method, back)


def test_write_rejects_summary(tmp_path):
    _, rejects = clean_transcripts(raw_transcripts())
    n = write_rejects(rejects, str(tmp_path / "rej"))
    assert n == 4
    summary = json.load(open(tmp_path / "rej" / "_summary.json"))
    assert summary["empty_conv_id"] == 2


def test_auto_buckets_size_scaling(tmp_path):
    """Bucket heuristic: floor for tiny files, growing with size,
    clamped at the ceiling; missing file falls back to the ceiling."""
    from neo4j_webgraph_ray.sources.transcripts import auto_buckets

    small = tmp_path / "small.bin"
    small.write_bytes(b"x" * 1024)
    assert auto_buckets(str(small)) == 16
    assert auto_buckets(str(small), lo=8) == 8
    big = tmp_path / "big.bin"
    big.write_bytes(b"x" * (200 << 20))
    assert auto_buckets(str(big)) == 26  # 200MB // 8MB + 1
    assert auto_buckets(str(tmp_path / "missing")) == 64  # ceiling fallback


def test_read_table_auto_json(tmp_path):
    p = str(tmp_path / "t.json")
    pd.DataFrame({"a": [1, 2]}).to_json(p, orient="records", lines=True)
    assert sorted(read_table_auto(p).to_pandas()["a"]) == [1, 2]


@pytest.mark.parametrize("cmd", [["pagerank"], ["triangles"]])
def test_cli_end_to_end(tmp_path, cmd):
    """CLI in a fresh process (its own Ray session), transcripts input."""
    from neo4j_webgraph_ray.sources.transcripts import generate_synthetic_transcripts

    tdir = str(tmp_path / "tr")
    generate_synthetic_transcripts(tdir, n_convs=50, seed=1)
    argv = [sys.executable, "-m", "neo4j_webgraph_ray", "--num-cpus", "4",
            *cmd, "--input", tdir, "--num-partitions", "4"]
    if cmd[0] == "pagerank":
        argv += ["--workdir", str(tmp_path / "wd")]
    proc = subprocess.run(
        argv, capture_output=True, text=True, timeout=300,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    if cmd[0] == "pagerank":
        assert out["status"] == "converged" and out["state_rows"] > 0
    else:
        assert out["n_triangles"] >= 0


def test_cli_build_graph_and_enrich(tmp_path):
    """build-graph writes resumable edges/vertices/rejects; enrich runs
    the stub stage over a keyed table."""
    from neo4j_webgraph_ray.sources.transcripts import generate_synthetic_transcripts

    tdir = str(tmp_path / "tr")
    generate_synthetic_transcripts(tdir, n_convs=40, seed=2)
    out = str(tmp_path / "graph")
    argv = [sys.executable, "-m", "neo4j_webgraph_ray", "--num-cpus", "4",
            "build-graph", "--input", tdir, "--out", out, "--num-partitions", "4"]
    proc = subprocess.run(argv, capture_output=True, text=True, timeout=300,
                          cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-2000:]
    res = json.loads(proc.stdout.strip().splitlines()[-1])
    assert res["edges"]["total_rows"] > 0 and res["vertices"]["total_rows"] > 0
    assert os.path.exists(os.path.join(out, "edges", "_manifest.json"))
    assert os.path.exists(os.path.join(out, "rejects", "_summary.json"))
    # auxiliary category index emitted beside the graph tables
    assert res["kind_index"]["total_rows"] >= 2
    assert os.path.exists(os.path.join(out, "kind_index", "_manifest.json"))

    # enrich the vertices output by key
    eout = str(tmp_path / "enriched")
    argv = [sys.executable, "-m", "neo4j_webgraph_ray", "--num-cpus", "4",
            "enrich", "--input", os.path.join(out, "vertices"), "--out", eout,
            "--num-partitions", "4", "--key-column", "key"]
    proc = subprocess.run(argv, capture_output=True, text=True, timeout=300,
                          cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-2000:]
    res = json.loads(proc.stdout.strip().splitlines()[-1])
    assert res["enriched"]["total_rows"] > 0
    import pandas as pd
    back = pd.concat(
        [pd.read_parquet(os.path.join(eout, "enriched", f))
         for f in os.listdir(os.path.join(eout, "enriched")) if f.endswith(".parquet")]
    )
    assert "social_count" in back.columns and back["social_count"].notna().any()


def test_cli_config_file_layering(tmp_path):
    """S6 parity: a properties file supplies --input/--workdir/--tol,
    an explicit flag overrides the file, and the run-metadata block
    lands in the workdir manifest."""
    from neo4j_webgraph_ray.sources.transcripts import generate_synthetic_transcripts

    tdir = str(tmp_path / "tr")
    generate_synthetic_transcripts(tdir, n_convs=40, seed=3)
    wd = str(tmp_path / "wd")
    cfgp = tmp_path / "run.properties"
    cfgp.write_text(
        "# layered config (reference config.properties analog)\n"
        f"input={tdir}\n"
        f"workdir={tmp_path / 'ignored-wd'}\n"
        "num-partitions=4\n"
        "tol=1e-4\n"
    )
    # explicit --workdir beats the file's workdir; input/tol come from file
    argv = [sys.executable, "-m", "neo4j_webgraph_ray", "--num-cpus", "4",
            "--config", str(cfgp), "pagerank", "--workdir", wd]
    proc = subprocess.run(argv, capture_output=True, text=True, timeout=300,
                          cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = json.loads(proc.stdout.strip().splitlines()[-1])
    assert out["status"] == "converged" and out["workdir"] == wd
    assert not os.path.exists(str(tmp_path / "ignored-wd"))
    manifest = json.load(open(os.path.join(wd, "manifest.json")))
    assert manifest["config"]["tol"] == 1e-4  # file value reached the engine
    assert manifest["run_metadata"]["command"] == "pagerank"
    assert manifest["run_metadata"]["root_input"] == tdir


def test_cli_rejects_invalid_args():
    """Config/CLI validation analog (reference AppTest): bad invocations
    exit non-zero without starting a run."""
    for argv in (
        ["bogus-command", "--input", "/tmp/x"],
        ["pagerank", "--input", "/tmp/x"],  # missing --workdir
        [],
    ):
        proc = subprocess.run(
            [sys.executable, "-m", "neo4j_webgraph_ray", *argv],
            capture_output=True, text=True, timeout=60,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        assert proc.returncode != 0
