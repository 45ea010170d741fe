"""Build the `vertices` and `edges` tables from a transcripts Dataset.

Reference semantics carried over (SURVEY.md §1.4, §2):

- **Vertex dedup / get-or-create (A4)**: at most one vertex per
  (kind, key) no matter how often it is seen as a subject or an edge
  target (``TransactionalGraphImporter.java:206-220``).  Implemented as
  one bucketed hash shuffle with vectorized local pre-aggregation.
- **Content merge (M9)**: a placeholder (null content) never clobbers
  real content; the surviving content is the earliest non-null text in
  stable turn order (``AbstractObservableGraphImporter.java:95-105``).
- **Degree counters (A1)**: the reference maintains
  ``incomingLinks``/``outgoingLinks`` incrementally per insert
  (``PageNode.java:215-227``); here they are groupby-counts over the
  deduplicated edge table folded into the same vertex shuffle — same
  values, computed wide (asserted by tests/test_graph_tables.py).

Vertex schema (FIXTURES.md F3):
``id:int64, kind:string, key:string, content:string?, in_deg:int64, out_deg:int64``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from neo4j_webgraph_ray.ids import KIND_CONV, vertex_id
from neo4j_webgraph_ray.stages.core import bucketed_groupby
from neo4j_webgraph_ray.stages.derive import derive_edges

VERTEX_COLUMNS = ["id", "kind", "key", "content", "in_deg", "out_deg"]


def _conv_candidates(batch: pa.Table) -> pd.DataFrame:
    n = batch.num_rows
    content = batch["text"].to_numpy(zero_copy_only=False).astype(object)
    order = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.float64)
    # content_order must be null wherever content is null, or the
    # partial-combine min would anchor on a placeholder row and make the
    # merge batch-boundary-dependent (M9 must be algebraic)
    null_content = np.array([c is None for c in content])
    order = np.where(null_content, np.nan, order)
    return pd.DataFrame(
        {
            "kind": np.full(n, KIND_CONV, dtype=object),
            "key": batch["conv_id"].to_numpy(zero_copy_only=False).astype(object),
            "content": content,
            "content_order": order,
            "out_c": np.zeros(n, dtype=np.int64),
            "in_c": np.zeros(n, dtype=np.int64),
        }
    )


def _endpoint_candidates(batch: pa.Table) -> pd.DataFrame:
    n = batch.num_rows
    src = pd.DataFrame(
        {
            "kind": batch["src_kind"].to_numpy(zero_copy_only=False).astype(object),
            "key": batch["src_key"].to_numpy(zero_copy_only=False).astype(object),
            "content": np.full(n, None, dtype=object),
            "content_order": np.full(n, np.nan),
            "out_c": np.ones(n, dtype=np.int64),
            "in_c": np.zeros(n, dtype=np.int64),
        }
    )
    dst = pd.DataFrame(
        {
            "kind": batch["dst_kind"].to_numpy(zero_copy_only=False).astype(object),
            "key": batch["dst_key"].to_numpy(zero_copy_only=False).astype(object),
            "content": np.full(n, None, dtype=object),
            "content_order": np.full(n, np.nan),
            "out_c": np.zeros(n, dtype=np.int64),
            "in_c": np.ones(n, dtype=np.int64),
        }
    )
    return pd.concat([src, dst], ignore_index=True)


def _vertex_combine(df: pd.DataFrame) -> pd.DataFrame:
    # Stable sort puts the earliest non-null content first (NaN orders
    # sort last); groupby.first skips nulls -> merge rule M9.
    df = df.sort_values(["kind", "key", "content_order"], kind="stable")
    return df.groupby(["kind", "key"], as_index=False, sort=False).agg(
        content=("content", "first"),
        content_order=("content_order", "min"),
        out_c=("out_c", "sum"),
        in_c=("in_c", "sum"),
    )


def _finalize_vertices(df: pd.DataFrame) -> pd.DataFrame:
    out = pd.DataFrame(
        {
            "id": vertex_id(df["kind"].to_numpy(), df["key"].to_numpy()),
            "kind": df["kind"],
            "key": df["key"],
            "content": df["content"],
            "in_deg": df["in_c"].astype(np.int64),
            "out_deg": df["out_c"].astype(np.int64),
        }
    )
    return out


def build_vertices(
    transcripts: ray.data.Dataset,
    edges: ray.data.Dataset,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """vertices = dedup(union(conv subjects, edge endpoints)) + degrees.

    One bucketed shuffle keyed by (kind, key); local combine collapses
    each batch to ≤1 row per vertex before the exchange.
    """
    conv_rows = transcripts.map_batches(
        _conv_candidates, batch_format="pyarrow", zero_copy_batch=True
    )
    endpoint_rows = edges.map_batches(
        _endpoint_candidates, batch_format="pyarrow", zero_copy_batch=True
    )
    candidates = conv_rows.union(endpoint_rows)
    combined = bucketed_groupby(
        candidates, ["kind", "key"], _vertex_combine, num_buckets=num_buckets
    )
    return combined.map_batches(_finalize_vertices, batch_format="pandas")


def build_graph_fused(
    transcripts: ray.data.Dataset, num_buckets: int = 64
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """(edges, vertices) with the transcripts consumed EXACTLY ONCE.

    The fused stream (``derive.fused_graph_stream``) carries conv→tool
    edges, role-adjacency partials AND per-conversation content rows
    through one bucketed exchange; edges come out of families 0/1,
    and the vertex build unions the already-combined family-2 content
    rows with the edge-endpoint candidates — no second (or third) pass
    over the input, no re-execution of the events adapter's shuffle.
    Returns (edges materialized, vertices lazy); semantics are
    byte-identical to ``derive_edges`` + ``build_vertices`` (asserted
    by the oracle suite and the fused-vs-classic pytest)."""
    from neo4j_webgraph_ray.stages.derive import edges_from_fused, fused_graph_stream

    fused = fused_graph_stream(
        transcripts, num_buckets, content_fns=(_conv_candidates, _vertex_combine)
    )
    edges = edges_from_fused(fused).materialize()

    def conv_rows(df: pd.DataFrame) -> pd.DataFrame:
        from neo4j_webgraph_ray.stages.derive import coerce_candidate_cols

        cc = coerce_candidate_cols(
            df[df["_t"] == 2]
            .rename(columns={"src_kind": "kind", "src_key": "key"})
            .copy(deep=False)
        )
        return cc[["kind", "key", "content", "content_order", "out_c", "in_c"]]

    candidates = fused.map_batches(conv_rows, batch_format="pandas").union(
        edges.map_batches(
            _endpoint_candidates, batch_format="pyarrow", zero_copy_batch=True
        )
    )
    combined = bucketed_groupby(
        candidates, ["kind", "key"], _vertex_combine, num_buckets=num_buckets
    )
    vertices = combined.map_batches(_finalize_vertices, batch_format="pandas")
    return edges, vertices


def kind_index(vertices: ray.data.Dataset, num_buckets: int = 16) -> ray.data.Dataset:
    """Auxiliary category index emitted beside the graph tables — the
    ``GraphImporter.getCategoryIndex`` extension hook
    (``importer/GraphImporter.java:20``,
    ``TransactionalGraphImporter.java:230-232``): per vertex kind, the
    member count and key range.  A stage producing a second Dataset from
    the same build, queryable and sink-able independently."""

    def local(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("kind", as_index=False, sort=False).agg(
            n=("key", "size"), min_key=("key", "min"), max_key=("key", "max")
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("kind", as_index=False, sort=False).agg(
            n=("n", "sum"), min_key=("min_key", "min"), max_key=("max_key", "max")
        )

    projected = vertices.map_batches(
        lambda df: local(df[["kind", "key"]]), batch_format="pandas"
    )
    return bucketed_groupby(projected, ["kind"], combine, num_buckets=num_buckets)


def build_graph(
    transcripts: ray.data.Dataset, num_buckets: int = 64
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """(edges, vertices) from a transcripts Dataset — the engine's core
    build, replacing the reference's crawl-and-import lifecycle
    (``App.java:50-79``)."""
    edges = derive_edges(transcripts, num_buckets=num_buckets)
    vertices = build_vertices(transcripts, edges, num_buckets=num_buckets)
    return edges, vertices
