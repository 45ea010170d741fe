"""Contract suite over the engine's public Dataset API on tiny
deterministic in-memory tables — the new-engine equivalent of the
reference's shared ``GraphImporterTestBase`` semantics
(``src/test/java/.../importer/GraphImporterTestBase.java``):
dedup, degree counts, merge rules, edge dedup, stable turn ordering.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data

from neo4j_webgraph_ray.ids import validate_no_collisions, vertex_id
from neo4j_webgraph_ray.pipelines.graph_tables import build_graph
from neo4j_webgraph_ray.stages.derive import (
    derive_conv_tool_edges,
    derive_role_adjacency_edges,
)


def make_transcripts(rows: list[tuple]) -> ray.data.Dataset:
    """rows: (conv_id, turn_idx, role, text, tool)"""
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role", "text", "tool"])
    df["turn_idx"] = df["turn_idx"].astype("int32")
    df["ts"] = pd.Timestamp("2025-01-01") + pd.to_timedelta(df["turn_idx"], unit="s")
    return ray.data.from_pandas(df)


def graph_of(rows, num_buckets=4):
    ds = make_transcripts(rows)
    edges, vertices = build_graph(ds, num_buckets=num_buckets)
    e = edges.to_pandas().sort_values(["src_kind", "src_key", "dst_kind", "dst_key"])
    v = vertices.to_pandas().set_index(["kind", "key"]).sort_index()
    return e.reset_index(drop=True), v


def test_conv_tool_edges_skip_null_tool():
    rows = [
        ("a", 0, "user", "t0", None),
        ("a", 1, "assistant", "t1", "search"),
        ("a", 2, "user", "t2", None),
    ]
    ds = make_transcripts(rows)
    e = derive_conv_tool_edges(ds).to_pandas()
    assert len(e) == 1
    assert e.loc[0, "src_key"] == "a" and e.loc[0, "dst_key"] == "search"
    assert e.loc[0, "turn_idx"] == 1


def test_role_adjacency_stable_order():
    # Turns given OUT of order; pairing must follow turn_idx, not row order.
    rows = [
        ("a", 2, "user", "t2", None),
        ("a", 0, "user", "t0", None),
        ("a", 1, "assistant", "t1", None),
        ("b", 0, "system", "s0", None),
        ("b", 1, "user", "s1", None),
    ]
    ds = make_transcripts(rows)
    e = derive_role_adjacency_edges(ds, num_buckets=2).to_pandas()
    pairs = sorted(zip(e["src_key"], e["dst_key"], e["conv_id"], e["turn_idx"]))
    assert pairs == [
        ("assistant", "user", "a", 1),
        ("system", "user", "b", 0),
        ("user", "assistant", "a", 0),
    ]


def test_edge_dedup_and_degree_count_once():
    # Same conv→tool edge emitted 3×: dedup keeps 1, degrees count it once
    # (reference: "re-adding a link ... shouldn't change anything",
    # GraphImporterTestBase.java:156-166).
    rows = [
        ("a", 0, "user", "t0", "search"),
        ("a", 1, "user", "t1", "search"),
        ("a", 2, "user", "t2", "search"),
    ]
    e, v = graph_of(rows)
    ct = e[e["dst_kind"] == "tool"]
    assert len(ct) == 1
    assert ct.iloc[0]["turn_idx"] == 0  # earliest witness provenance
    assert v.loc[("tool", "search"), "in_deg"] == 1
    assert v.loc[("conv", "a"), "out_deg"] == 1


def test_vertex_dedup_and_content_merge():
    # Vertex seen many times -> one row; content = earliest text in stable
    # turn order (merge rule M9 / A4).
    rows = [
        ("a", 1, "user", "later text", None),
        ("a", 0, "user", "first text", None),
        ("b", 0, "user", "b text", "search"),
    ]
    _, v = graph_of(rows)
    assert v.loc[("conv", "a"), "content"] == "first text"
    assert v.loc[("conv", "b"), "content"] == "b text"
    # tool vertex exists via edge target only, with null content (placeholder)
    assert v.loc[("tool", "search"), "content"] is None or pd.isna(
        v.loc[("tool", "search"), "content"]
    )


def test_degrees_small_fixture():
    # conv a uses tools x,y; conv b uses x. role chain u->a1->u in conv a.
    rows = [
        ("a", 0, "user", "t0", "x"),
        ("a", 1, "assistant", "t1", "y"),
        ("a", 2, "user", "t2", None),
        ("b", 0, "user", "s0", "x"),
    ]
    e, v = graph_of(rows)
    assert v.loc[("tool", "x"), "in_deg"] == 2
    assert v.loc[("tool", "y"), "in_deg"] == 1
    assert v.loc[("conv", "a"), "out_deg"] == 2
    assert v.loc[("conv", "b"), "out_deg"] == 1
    # role edges in conv a: user->assistant, assistant->user
    assert v.loc[("role", "user"), "out_deg"] == 1
    assert v.loc[("role", "assistant"), "out_deg"] == 1
    assert v.loc[("role", "assistant"), "in_deg"] == 1
    # conv with no tool rows still yields conv vertex? (b has tool; add c)
    rows.append(("c", 0, "user", "only turn", None))
    _, v2 = graph_of(rows)
    assert ("conv", "c") in v2.index
    assert v2.loc[("conv", "c"), "out_deg"] == 0


def test_reimport_idempotent():
    # Processing the same transcripts twice (union of input with itself)
    # changes nothing — order-insensitivity by construction
    # (GraphImporterTestBase.java:156-184).
    rows = [
        ("a", 0, "user", "t0", "x"),
        ("a", 1, "assistant", "t1", None),
    ]
    ds1 = make_transcripts(rows)
    ds2 = make_transcripts(rows + rows)  # duplicated rows
    e1, v1 = build_graph(ds1, num_buckets=4)
    e2, v2 = build_graph(ds2, num_buckets=4)
    c1 = e1.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    c2 = e2.to_pandas().sort_values(["src", "dst"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(c1, c2)
    w1 = v1.to_pandas().sort_values(["kind", "key"]).reset_index(drop=True)
    w2 = v2.to_pandas().sort_values(["kind", "key"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(w1, w2)


def test_vertex_id_stable_and_collision_free():
    ids1 = vertex_id("conv", np.array(["a", "b", "c"], dtype=object))
    ids2 = vertex_id("conv", np.array(["a", "b", "c"], dtype=object))
    assert (ids1 == ids2).all()
    assert len(set(ids1)) == 3
    # kind participates in the id: conv:a != tool:a
    assert vertex_id("conv", "a")[0] != vertex_id("tool", "a")[0]
    kinds = ["conv"] * 1000 + ["tool"] * 1000
    keys = [f"k{i}" for i in range(1000)] * 2
    validate_no_collisions(kinds, keys)


def test_derive_edge_ids_same_edge_set():
    """Lean id-only derivation yields the same deduped edge set as the
    full derivation."""
    from neo4j_webgraph_ray.sources.transcripts import transcripts_from_events
    from neo4j_webgraph_ray.stages.core import exact_distinct
    from neo4j_webgraph_ray.stages.derive import derive_edge_ids, derive_edges

    sf = "/root/testdata/sf0.001"
    full = derive_edges(transcripts_from_events(sf), num_buckets=8).to_pandas()
    lean = exact_distinct(
        derive_edge_ids(transcripts_from_events(sf), num_buckets=8),
        ["src", "dst"],
        num_buckets=8,
    ).to_pandas()
    a = set(zip(full["src"], full["dst"]))
    b = set(zip(lean["src"], lean["dst"]))
    assert a == b


def test_build_graph_fused_matches_classic():
    """The single-pass fused build must produce the identical edge and
    vertex tables as the classic derive_edges + build_vertices path."""
    from neo4j_webgraph_ray.pipelines.graph_tables import (
        build_graph_fused,
        build_vertices,
    )
    from neo4j_webgraph_ray.sources.transcripts import transcripts_from_events
    from neo4j_webgraph_ray.stages.derive import derive_edges

    sf = "/root/testdata/sf0.001"
    e_f, v_f = build_graph_fused(transcripts_from_events(sf), num_buckets=8)
    e_c = derive_edges(transcripts_from_events(sf), num_buckets=8)
    v_c = build_vertices(transcripts_from_events(sf), e_c, num_buckets=8)

    def norm(ds, cols):
        df = ds.to_pandas()[cols]
        return df.sort_values(cols).reset_index(drop=True).astype(str)

    ecols = ["src", "dst", "src_kind", "src_key", "dst_kind", "dst_key",
             "conv_id", "turn_idx"]
    vcols = ["id", "kind", "key", "content", "in_deg", "out_deg"]
    import pandas as pd

    pd.testing.assert_frame_equal(norm(e_f, ecols), norm(e_c, ecols))
    pd.testing.assert_frame_equal(norm(v_f, vcols), norm(v_c, vcols))


def test_derive_edge_ids_cross_batch_boundaries():
    """Batch-local adjacency resolution must recover pairs whose turns
    land in different blocks — contiguous splits AND interleaved
    (odd/even turns in different blocks) layouts."""
    import pandas as pd
    import ray.data

    from neo4j_webgraph_ray.stages.core import exact_distinct
    from neo4j_webgraph_ray.stages.derive import derive_edge_ids, derive_edges

    roles = ["user", "assistant", "tool", "system"]

    def tdf(rows):
        return pd.DataFrame(
            {
                "conv_id": [r[0] for r in rows],
                "turn_idx": pd.array([r[1] for r in rows], dtype="int32"),
                "role": [r[2] for r in rows],
                "text": [f"{r[0]}:{r[1]}" for r in rows],
                "tool": [None] * len(rows),
                "ts": pd.Timestamp("2025-01-01"),
            }
        )

    # conv x: turns 0-5; conv y: turns 0-3. Split: block A = x[0:3]+y even
    # turns, block B = x[3:6]+y odd turns (interleaved!).
    xa = [("x", i, roles[i % 4]) for i in range(3)]
    xb = [("x", i, roles[i % 4]) for i in range(3, 6)]
    ya = [("y", i, roles[(i + 1) % 4]) for i in (0, 2)]
    yb = [("y", i, roles[(i + 1) % 4]) for i in (1, 3)]
    split = ray.data.from_pandas([tdf(xa + ya), tdf(xb + yb)])
    whole = ray.data.from_pandas(tdf(sorted(xa + xb + ya + yb, key=lambda r: (r[0], r[1]))))

    def edge_set(ds):
        out = exact_distinct(
            derive_edge_ids(ds, num_buckets=4), ["src", "dst"], num_buckets=4
        ).to_pandas()
        return set(zip(out["src"], out["dst"]))

    expected = derive_edges(whole, num_buckets=4).to_pandas()
    exp = set(zip(expected["src"], expected["dst"]))
    assert edge_set(split) == exp
    assert edge_set(whole) == exp


def test_content_merge_skips_null_text_across_partitions():
    """M9 algebraic merge: null-content rows must not anchor the
    content_order min — the earliest NON-NULL text wins regardless of
    how rows split across blocks (review finding)."""
    rows = [
        ("a", 0, "user", None, None),       # placeholder turn, null text
        ("a", 3, "user", "late text", None),
        ("a", 1, "user", "real text", None),
    ]
    # num_buckets=1 and =4 must agree
    for nb in (1, 4):
        _, v = graph_of(rows, num_buckets=nb)
        assert v.loc[("conv", "a"), "content"] == "real text", nb


def test_derive_edge_ids_empty_blocks():
    """Code-review r5: an empty block (over-split read, upstream
    filter) must produce zero rows, not an IndexError from the
    boundary-mask construction — both the 64-bit and wide paths."""
    import pandas as pd
    import ray.data

    from neo4j_webgraph_ray.stages.core import exact_distinct
    from neo4j_webgraph_ray.stages.derive import derive_edge_ids
    from neo4j_webgraph_ray.stages.wide_ids import derive_edge_ids_collision_free

    rows = pd.DataFrame(
        {
            "conv_id": ["c1", "c1", "c2"],
            "turn_idx": pd.array([0, 1, 0], dtype="int32"),
            "role": ["user", "assistant", "user"],
            "text": ["a", "b", "c"],
            "tool": [None, "search", None],
            "ts": pd.Timestamp("2025-01-01"),
        }
    )
    # 3 rows into 10 partitions -> at least 7 empty blocks
    split = ray.data.from_pandas(rows).repartition(10)
    whole = ray.data.from_pandas(rows)

    def edge_set(ds):
        df = exact_distinct(
            derive_edge_ids(ds, num_buckets=4), ["src", "dst"], num_buckets=4
        ).to_pandas()
        return set(zip(df["src"], df["dst"]))

    assert edge_set(split) == edge_set(whole)
    assert len(edge_set(whole)) > 0

    e_w, _ = derive_edge_ids_collision_free(split, num_buckets=4)
    e_n, _ = derive_edge_ids_collision_free(whole, num_buckets=4)
    sw = set(map(tuple, e_w.to_pandas()[["src", "dst"]].values))
    sn = set(map(tuple, e_n.to_pandas()[["src", "dst"]].values))
    assert len(sn) > 0
    # dense-rank ids are a pure function of the pair set, so the edge
    # sets are identical regardless of input partitioning
    assert sw == sn
