"""128-bit id path (VERDICT r4 #3): hash independence, dense-id
bijection (including simulated half-collisions), equivalence with the
string-keyed derivation, and the env-flag plumbing."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from neo4j_webgraph_ray.ids import hash64, hash128, vertex_id_wide
from neo4j_webgraph_ray.stages.wide_ids import (
    dense_ids_from_wide,
    derive_edge_ids_collision_free,
)


def test_hash128_deterministic_and_independent():
    keys = [f"k{i}" for i in range(2000)]
    hi1, lo1 = hash128(keys)
    hi2, lo2 = hash128(keys)
    assert (hi1 == hi2).all() and (lo1 == lo2).all()
    # hi is the engine's classic 64-bit hash: 64-bit and wide mode agree
    # on the first half, so a wide run is auditable against a 64-bit run
    assert (hi1 == hash64(keys)).all()
    # the second key gives an INDEPENDENT stream (this is the whole
    # point: a pair collision needs both halves to collide)
    assert (hi1 != lo1).all()
    assert len(np.unique(np.stack([hi1, lo1], axis=1), axis=0)) == len(keys)


def wide_edges_frame():
    """Hand-built wide edge list with two endpoints that SHARE hi
    (a simulated 64-bit collision) but differ in lo."""
    rows = [
        # (src_hi, src_lo, dst_hi, dst_lo)
        (7, 100, 9, 200),
        (7, 101, 9, 200),   # src collides with row 0 in hi only
        (9, 200, 11, 300),
        (11, 300, 7, 100),
        (13, -5, 7, 101),
    ]
    return pd.DataFrame(
        {
            "src_hi": np.array([r[0] for r in rows], dtype=np.int64),
            "src_lo": np.array([r[1] for r in rows], dtype=np.int64),
            "dst_hi": np.array([r[2] for r in rows], dtype=np.int64),
            "dst_lo": np.array([r[3] for r in rows], dtype=np.int64),
        }
    )


def test_dense_ids_bijective_and_collision_safe():
    df = wide_edges_frame()
    ds = ray.data.from_pandas(df)
    edges, mapping = dense_ids_from_wide(ds, num_buckets=4)
    mp = mapping.to_pandas()
    # bijection: one dense id per distinct pair, ids are 0..V-1
    pairs = set(zip(mp["hi"], mp["lo"]))
    expect_pairs = set(
        zip(
            np.r_[df["src_hi"], df["dst_hi"]],
            np.r_[df["src_lo"], df["dst_lo"]],
        )
    )
    assert pairs == expect_pairs
    assert sorted(mp["id"]) == list(range(len(expect_pairs)))
    # the hi-collision endpoints (7,100) vs (7,101) get DISTINCT ids —
    # the exact failure mode of the 64-bit scheme
    lut = {(h, l): i for h, l, i in zip(mp["hi"], mp["lo"], mp["id"])}
    assert lut[(7, 100)] != lut[(7, 101)]
    # edges remapped consistently
    got = sorted(zip(*[edges.to_pandas()[c] for c in ("src", "dst")]))
    exp = sorted(
        (lut[(a, b)], lut[(c, d)])
        for a, b, c, d in df.itertuples(index=False)
    )
    assert got == exp


def test_dense_ids_cogroup_path_matches_broadcast():
    df = wide_edges_frame()
    ds = ray.data.from_pandas(df)
    e_b, m_b = dense_ids_from_wide(ds, num_buckets=4, broadcast_limit=10**6)
    e_c, m_c = dense_ids_from_wide(ds, num_buckets=4, broadcast_limit=0)
    pd.testing.assert_frame_equal(
        m_b.to_pandas().sort_values(["hi", "lo"]).reset_index(drop=True),
        m_c.to_pandas().sort_values(["hi", "lo"]).reset_index(drop=True),
    )
    assert sorted(zip(*[e_b.to_pandas()[c] for c in ("src", "dst")])) == sorted(
        zip(*[e_c.to_pandas()[c] for c in ("src", "dst")])
    )


def test_wide_derivation_matches_string_path(sf_smoke):
    """The collision-free pipeline must produce the edge set of the
    string-keyed derivation (which never hashes and is immune by
    construction), endpoint-for-endpoint through the id map."""
    from neo4j_webgraph_ray.sources.transcripts import transcripts_from_events
    from neo4j_webgraph_ray.stages.core import exact_distinct
    from neo4j_webgraph_ray.stages.derive import derive_edges

    full = derive_edges(
        transcripts_from_events(sf_smoke), num_buckets=8
    ).to_pandas()
    edges_ds, mapping = derive_edge_ids_collision_free(
        transcripts_from_events(sf_smoke), num_buckets=8
    )
    lean = exact_distinct(edges_ds, ["src", "dst"], num_buckets=8).to_pandas()

    mp = mapping.to_pandas()
    lut = {(h, l): i for h, l, i in zip(mp["hi"], mp["lo"], mp["id"])}
    sh, sl = vertex_id_wide(
        full["src_kind"].to_numpy(), full["src_key"].to_numpy()
    )
    dh, dl = vertex_id_wide(
        full["dst_kind"].to_numpy(), full["dst_key"].to_numpy()
    )
    exp = {
        (lut[(a, b)], lut[(c, d)]) for a, b, c, d in zip(sh, sl, dh, dl)
    }
    got = set(zip(lean["src"], lean["dst"]))
    assert got == exp


def test_env_flag_selects_wide_path(monkeypatch):
    """NWR_WIDE_IDS=1 routes derive_edge_ids through the dense-id
    pipeline: same edge-set semantics, ids become dense 0..V-1 instead
    of hash-range."""
    from neo4j_webgraph_ray.stages.derive import derive_edge_ids

    rows = pd.DataFrame(
        {
            "conv_id": ["x"] * 4 + ["y"] * 3,
            "turn_idx": pd.array([0, 1, 2, 3, 0, 1, 2], dtype="int32"),
            "role": ["user", "assistant", "user", "tool_r", "user",
                     "assistant", "user"],
            "text": [f"t{i}" for i in range(7)],
            "tool": [None, "hammer", None, None, "saw", None, None],
            "ts": pd.Timestamp("2025-01-01"),
        }
    )
    ds = ray.data.from_pandas(rows)
    narrow = derive_edge_ids(ds, num_buckets=4).to_pandas()
    assert np.abs(np.r_[narrow["src"], narrow["dst"]]).max() > 2**32

    monkeypatch.setenv("NWR_WIDE_IDS", "1")
    wide = derive_edge_ids(ds, num_buckets=4).to_pandas()
    ids = np.unique(np.r_[wide["src"], wide["dst"]])
    assert ids.min() == 0 and ids.max() == len(ids) - 1  # dense
    # same graph shape: edge count and degree multiset agree
    def canon(df):
        e = df.drop_duplicates(["src", "dst"])
        return sorted(
            np.unique(np.r_[e["src"], e["dst"]], return_counts=True)[1]
        )

    assert canon(wide) == canon(narrow)
