"""Relational query surface over the graph tables (reference README Cypher).

The reference documents its query surface as Cypher over the imported
graph (``README.md:72-166`` in /root/reference): top-k pages by incoming
links, degree-threshold filters, counts by type/domain, content regex
matches, uninitialized-property scans, point lookups, and a cross-domain
high-degree pattern (SURVEY.md §2.6 Q1-Q7).  Each is re-expressed here
as a Ray Data pipeline over the `vertices`/`edges` Datasets, with an
exactly-equivalent DuckDB SQL oracle built on the shared CTE prelude.

Query outputs expose readable string keys (kind/key), not the internal
int64 hashed vertex ids, so the SQL oracles can reproduce them without
replicating the hash function.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from neo4j_webgraph_ray.ids import vertex_id
from neo4j_webgraph_ray.pipelines.algorithms import (
    BFS_UNREACHED,
    betweenness_dependencies,
    bfs_distances,
    weighted_sssp,
    connected_components,
    directed_bfs,
    directed_min_labels,
    eigenvector,
    hits,
    katz,
    kcore,
    mis,
    weighted_pagerank,
    label_propagation,
    pagerank,
    personalized_pagerank,
)
from neo4j_webgraph_ray.pipelines.neighborhood import ball_profile
from neo4j_webgraph_ray.pipelines.triangles import triangle_count, vertex_triangles
from neo4j_webgraph_ray.sources.transcripts import (
    TRANSCRIPTS_FROM_EVENTS_SQL,
    transcripts_from_events,
)
from neo4j_webgraph_ray.stages.core import (
    BUCKET_COL,
    add_bucket_column,
    bucketed_groupby,
    exact_distinct,
    pair_indices_within_groups,
)

# ---------------------------------------------------------------------------
# Shared SQL prelude: transcripts -> edges -> vertices, mirroring
# build_graph() semantics exactly (dedup provenance = per-column min;
# conv content = earliest text in stable turn order).
# ---------------------------------------------------------------------------

GRAPH_SQL_PRELUDE = f"""
WITH transcripts AS ({TRANSCRIPTS_FROM_EVENTS_SQL}),
edges_raw AS (
    SELECT 'conv' AS src_kind, conv_id AS src_key,
           'tool' AS dst_kind, tool AS dst_key, conv_id, turn_idx
    FROM transcripts WHERE tool IS NOT NULL
    UNION ALL
    SELECT 'role', a.role, 'role', b.role, a.conv_id, a.turn_idx
    FROM transcripts a
    JOIN transcripts b ON a.conv_id = b.conv_id AND b.turn_idx = a.turn_idx + 1
),
edges AS (
    SELECT src_kind, src_key, dst_kind, dst_key,
           min(conv_id) AS conv_id, min(turn_idx) AS turn_idx
    FROM edges_raw GROUP BY src_kind, src_key, dst_kind, dst_key
),
vert_keys AS (
    -- UNION ALL + DISTINCT rather than chained UNION: under the WITH
    -- RECURSIVE variant of this prelude (_RECURSIVE_PRELUDE) DuckDB
    -- mis-executes a multi-branch bare UNION in a non-recursive CTE
    -- (branches past the first skip dedup), which silently duplicated
    -- vertices 34x here.  The wrapped form is semantically identical
    -- and immune.
    SELECT DISTINCT kind, vkey FROM (
        SELECT src_kind AS kind, src_key AS vkey FROM edges
        UNION ALL
        SELECT dst_kind, dst_key FROM edges
        UNION ALL
        SELECT 'conv', conv_id FROM transcripts
    )
),
conv_content AS (
    SELECT conv_id AS vkey, arg_min(text, turn_idx) AS content
    FROM transcripts GROUP BY conv_id
),
out_deg_t AS (
    SELECT src_kind AS kind, src_key AS vkey, count(*) AS out_deg
    FROM edges GROUP BY src_kind, src_key
),
in_deg_t AS (
    SELECT dst_kind AS kind, dst_key AS vkey, count(*) AS in_deg
    FROM edges GROUP BY dst_kind, dst_key
),
vertices AS (
    SELECT v.kind AS kind, v.vkey AS key,
           CASE WHEN v.kind = 'conv' THEN c.content ELSE NULL END AS content,
           coalesce(i.in_deg, 0) AS in_deg,
           coalesce(o.out_deg, 0) AS out_deg
    FROM vert_keys v
    LEFT JOIN conv_content c ON v.kind = 'conv' AND v.vkey = c.vkey
    LEFT JOIN out_deg_t o ON v.kind = o.kind AND v.vkey = o.vkey
    LEFT JOIN in_deg_t i ON v.kind = i.kind AND v.vkey = i.vkey
)
"""

EDGE_OUT_COLS = ["src_kind", "src_key", "dst_kind", "dst_key", "conv_id", "turn_idx"]
VERTEX_OUT_COLS = ["kind", "key", "content", "in_deg", "out_deg"]


# graph() cache: keyed by sf_dir AND an input-file signature, so an
# events.parquet regenerated at the same path invalidates the cached
# tables (VERDICT r4 #7 — same staleness class the PQ codes manifest
# guards).  Bounded like the old lru_cache(maxsize=4).
_GRAPH_CACHE: "dict[str, tuple[tuple, tuple]]" = {}
_GRAPH_CACHE_MAX = 4


def _events_signature(sf_dir: str) -> tuple:
    """(size, mtime_ns) of the input events file via pyarrow.fs — cheap
    staleness fingerprint (mirrors similarity._input_signature)."""
    from neo4j_webgraph_ray.state import fsio

    p = os.path.join(sf_dir, "events.parquet")
    fsys, rel = fsio.resolve(p)
    info = fsys.get_file_info(rel)
    return (int(info.size or 0), int(info.mtime_ns or 0))


def graph(sf_dir: str) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """(edges, vertices) for a testdata dir; materialized once per
    (dir, input signature).

    The graph tables are aggregates (much smaller than the input), so
    pinning them in the object store for reuse across queries is the
    broadcast-small-side pattern, not a full-input materialization.
    """
    from neo4j_webgraph_ray.pipelines.graph_tables import build_graph_fused
    from neo4j_webgraph_ray.sources.transcripts import auto_buckets

    sig = _events_signature(sf_dir)
    hit = _GRAPH_CACHE.get(sf_dir)
    if hit is not None and hit[0] == sig:
        return hit[1]
    B = auto_buckets(os.path.join(sf_dir, "events.parquet"))
    transcripts = transcripts_from_events(sf_dir, num_buckets=B)
    # single-pass fused build: transcripts (and the events adapter's
    # shuffle) execute exactly once for edges AND vertices
    edges, vertices = build_graph_fused(transcripts, num_buckets=B)
    tables = (edges, vertices.materialize())
    if len(_GRAPH_CACHE) >= _GRAPH_CACHE_MAX and sf_dir not in _GRAPH_CACHE:
        _GRAPH_CACHE.pop(next(iter(_GRAPH_CACHE)))
    _GRAPH_CACHE[sf_dir] = (sig, tables)
    return tables


# --- queries ---------------------------------------------------------------


def q_transcripts(sf_dir: str) -> ray.data.Dataset:
    """The derived transcripts table itself (source adapter parity)."""
    return transcripts_from_events(sf_dir)


def q_edges(sf_dir: str) -> ray.data.Dataset:
    """Deduplicated edge table (J2/J3 semantics) with readable keys."""
    edges, _ = graph(sf_dir)
    return edges.select_columns(EDGE_OUT_COLS)


def q_vertices(sf_dir: str) -> ray.data.Dataset:
    """Vertex table with merged content and degree counters (A1/A4/M9)."""
    _, vertices = graph(sf_dir)
    return vertices.select_columns(VERTEX_OUT_COLS)


def q_incremental_edges(sf_dir: str) -> ray.data.Dataset:
    """Incremental re-import of the edge table: derive edges from the
    even-user half of the corpus, then fold in the odd-user half's
    DELTA without re-deriving the old half — the reference's idempotent
    re-import lifecycle (``BatchGraphImporter.java:173-197`` re-runs
    merge the same URLs without duplication) as a first-class batch
    operator.  The merge is the SAME algebra the per-batch dedup uses
    (group by the 4-key edge identity, per-column min provenance), so
    incremental == full build — the oracle is the ordinary full-build
    edges SQL and the driver's hash compare IS the equivalence proof.

    At scale this is the daily-crawl path: yesterday's deduped edge
    table (already partitioned) + today's delta derivation, one
    bucketed merge; nothing re-reads yesterday's transcripts."""
    from neo4j_webgraph_ray.stages.derive import derive_edges

    t = transcripts_from_events(sf_dir).materialize()

    def half(parity: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            u = (
                df["conv_id"].str.slice(1).astype("int64").to_numpy() % 2
                == parity
            )
            return df.loc[u]

        return f

    t_old = t.map_batches(half(0), batch_format="pandas")
    t_new = t.map_batches(half(1), batch_format="pandas")
    e_old = derive_edges(t_old, num_buckets=16).select_columns(EDGE_OUT_COLS)
    e_new = derive_edges(t_new, num_buckets=16).select_columns(EDGE_OUT_COLS)

    def remerge(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(
            ["src_kind", "src_key", "dst_kind", "dst_key"], as_index=False
        ).agg(conv_id=("conv_id", "min"), turn_idx=("turn_idx", "min"))

    return bucketed_groupby(
        e_old.union(e_new),
        ["src_kind", "src_key", "dst_kind", "dst_key"],
        remerge,
        num_buckets=16,
    ).select_columns(EDGE_OUT_COLS)


def q_top_in_degree(sf_dir: str, k: int = 50) -> pd.DataFrame:
    """Q1: top-k vertices by in-degree (``README.md:107-112`` order-by
    nrOflinks desc limit); total order (in_deg desc, kind, key) so the
    cutoff is deterministic."""
    _, vertices = graph(sf_dir)
    out = vertices.select_columns(["kind", "key", "in_deg"]).sort(
        ["in_deg", "kind", "key"], descending=[True, False, False]
    )
    return out.limit(k).to_pandas()


def q_degree_threshold(sf_dir: str, threshold: int = 5) -> ray.data.Dataset:
    """Q2: vertices with in_deg >= threshold (``README.md:92-97``)."""
    _, vertices = graph(sf_dir)
    return vertices.filter(
        expr=f"in_deg >= {threshold}"
    ).select_columns(["kind", "key", "in_deg"])


def q_count_by_kind(sf_dir: str) -> pd.DataFrame:
    """Q3/A3: vertex counts by kind (home-page/domain counts,
    ``TransactionalGraphImporter.java:371-379``)."""
    _, vertices = graph(sf_dir)
    out = vertices.groupby("kind").count().to_pandas()
    return out.rename(columns={"count()": "n"})


def q_degree_histogram(sf_dir: str) -> pd.DataFrame:
    """Log2-binned degree distribution per direction — THE first-look
    webgraph analytic (power-law degree plots): for each direction and
    bin b = floor(log2(deg + 1)), how many vertices fall in it (bin 0
    = degree 0, bin 1 = degrees 1..2, bin 2 = 3..6, ...).

    Scale shape: pure per-batch bincount partials over the vertex
    table into a ≤ 2×64-bin key space; no shuffle, driver merges
    #blocks × #bins rows.  Bins use float64 ``log2`` of exact small
    integers in both engines (identical libm results; exact at powers
    of two)."""
    _, vertices = graph(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for direction, col in (("in", "in_deg"), ("out", "out_deg")):
            d = df[col].to_numpy().astype(np.int64)
            if not len(d):
                continue
            b = np.floor(np.log2(d + 1.0)).astype(np.int64)
            u, c = np.unique(b, return_counts=True)
            outs.append(
                pd.DataFrame(
                    {"direction": direction, "deg_bin": u,
                     "n_vertices": c.astype(np.int64)}
                )
            )
        if not outs:
            return pd.DataFrame(
                {"direction": pd.Series([], dtype=object),
                 "deg_bin": pd.Series([], dtype=np.int64),
                 "n_vertices": pd.Series([], dtype=np.int64)}
            )
        return pd.concat(outs, ignore_index=True)

    rows = vertices.map_batches(partial, batch_format="pandas").to_pandas()
    if not len(rows):
        return pd.DataFrame(
            {"direction": pd.Series([], dtype=object),
             "deg_bin": pd.Series([], dtype=np.int64),
             "n_vertices": pd.Series([], dtype=np.int64)}
        )
    return rows.groupby(
        ["direction", "deg_bin"], as_index=False, sort=True
    )["n_vertices"].sum()


DEGREE_HISTOGRAM_SQL_TAIL = """,
db AS (
  SELECT 'in' AS direction,
         CAST(floor(log2(in_deg + 1)) AS BIGINT) AS deg_bin FROM vertices
  UNION ALL
  SELECT 'out', CAST(floor(log2(out_deg + 1)) AS BIGINT) FROM vertices
)
SELECT direction, deg_bin, CAST(count(*) AS BIGINT) AS n_vertices
FROM db GROUP BY 1, 2 ORDER BY 1, 2
"""


def q_content_regex_count(sf_dir: str, pattern: str = ":error$") -> pd.DataFrame:
    """Q4: count vertices whose content matches a regex (Cypher ``=~``,
    ``README.md:152-156``) — vectorized pc.match_substring_regex."""
    _, vertices = graph(sf_dir)

    def count_matches(batch: pa.Table) -> pa.Table:
        content = pc.cast(batch["content"], pa.string())
        m = pc.match_substring_regex(content, pattern)
        n = pc.sum(pc.cast(pc.fill_null(m, False), pa.int64())).as_py() or 0
        return pa.table({"n_match": pa.array([n], type=pa.int64())})

    parts = vertices.map_batches(count_matches, batch_format="pyarrow")
    total = int(parts.to_pandas()["n_match"].sum())
    return pd.DataFrame({"n_match": pd.array([total], dtype="int64")})


def q_null_tool_scan(sf_dir: str) -> pd.DataFrame:
    """Q5: uninitialized-property scan (``not has(p.facebookTotalCount)``,
    ``README.md:158-166``) — turns with no tool call, counted by role."""
    ds = transcripts_from_events(sf_dir)

    def per_batch(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_null(batch["tool"]))
        return pa.table({"role": t["role"]})

    out = (
        ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("role")
        .count()
    )
    return out.to_pandas().rename(columns={"count()": "n"})


def q_point_lookup(sf_dir: str, keys: tuple[str, ...] = ("c1", "c7", "c11")) -> ray.data.Dataset:
    """Q6: point selection by key (Cypher ``start p=node(152,...)``,
    ``README.md:72-79``; index lookup J1) — predicate pushdown filter."""
    _, vertices = graph(sf_dir)
    key_set = pa.array(list(keys), type=pa.string())

    def lookup(batch: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.equal(batch["kind"], "conv"),
            pc.is_in(batch["key"], value_set=key_set),
        )
        return batch.filter(pc.fill_null(m, False)).select(VERTEX_OUT_COLS)

    return vertices.map_batches(lookup, batch_format="pyarrow", zero_copy_batch=True)


def _sorted_member(sorted_keys: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Vectorized membership of ``x`` in a SORTED key array — the
    searchsorted probe used by every broadcast in this module (flat
    arrays read zero-copy-ish from plasma; a Python set would be
    re-deserialized element-by-element per task)."""
    if len(sorted_keys) == 0 or len(x) == 0:
        return np.zeros(len(x), bool)
    idx = np.searchsorted(sorted_keys, x)
    idx = np.minimum(idx, len(sorted_keys) - 1)
    return sorted_keys[idx] == x


def q_cross_kind_pattern(
    sf_dir: str, min_in_deg: int = 8, min_out_deg: int = 9,
    broadcast_limit: int = 200_000,
) -> pd.DataFrame:
    """Q7: cross-domain high-degree pattern (``README.md:144-150``):
    conv vertices with out_deg >= t1 linking to tool vertices with
    in_deg >= t2 — an edges⋈vertices semi-join.

    Size-gated like verify_jaccard (VERDICT r2 #6): when the filtered
    key sets are small they are broadcast (``ray.put`` once, read per
    task); above ``broadcast_limit`` combined keys — a low threshold
    on a huge graph — the scale path is two bucketed co-group
    semi-joins, with nothing collected on the driver."""
    edges, vertices = graph(sf_dir)
    hot = vertices.filter(
        expr=f"kind == 'tool' and in_deg >= {min_in_deg}"
    ).select_columns(["key"]).materialize()
    busy = vertices.filter(
        expr=f"kind == 'conv' and out_deg >= {min_out_deg}"
    ).select_columns(["key"]).materialize()

    if hot.count() + busy.count() <= broadcast_limit:
        # flat SORTED arrays + searchsorted membership — the engine's
        # broadcast rule (r3: never ship a pickled Python set, which is
        # re-deserialized object-by-object in every task; arrays are a
        # single contiguous read, same as _collect_lookup_arrays)
        hot_ref = ray.put(np.sort(hot.to_pandas()["key"].to_numpy()))
        busy_ref = ray.put(np.sort(busy.to_pandas()["key"].to_numpy()))

        def semi_join(batch: pa.Table) -> pa.Table:
            hkeys = ray.get(hot_ref)
            bkeys = ray.get(busy_ref)
            df = batch.select(
                ["src_kind", "src_key", "dst_kind", "dst_key"]
            ).to_pandas()
            m = (
                (df["src_kind"] == "conv") & (df["dst_kind"] == "tool")
            ).to_numpy()
            m &= _sorted_member(bkeys, df["src_key"].to_numpy())
            m &= _sorted_member(hkeys, df["dst_key"].to_numpy())
            out = df.loc[m, ["src_key", "dst_key"]]
            return pa.Table.from_pandas(
                out.rename(columns={"src_key": "conv_key", "dst_key": "tool_key"}),
                preserve_index=False,
            )

        out = edges.map_batches(semi_join, batch_format="pyarrow").to_pandas()
    else:
        out = _cross_kind_cogroup(edges, hot, busy).to_pandas()
    return out.sort_values(["conv_key", "tool_key"]).reset_index(drop=True)


def _cross_kind_cogroup(
    edges: ray.data.Dataset,
    hot: ray.data.Dataset,
    busy: ray.data.Dataset,
    num_buckets: int = 64,
) -> ray.data.Dataset:
    """Distributed Q7 scale path: conv→tool edges semi-joined against
    the busy-conv key set (bucketed by conv key), then against the
    hot-tool key set (bucketed by tool key).  Both union sides carry
    the full (conv_key, tool_key, _t) schema with typed defaults."""

    def conv_tool(batch: pa.Table) -> pd.DataFrame:
        df = batch.select(["src_kind", "src_key", "dst_kind", "dst_key"]).to_pandas()
        m = (df["src_kind"] == "conv") & (df["dst_kind"] == "tool")
        out = df.loc[m, ["src_key", "dst_key"]].rename(
            columns={"src_key": "conv_key", "dst_key": "tool_key"}
        )
        out["_t"] = np.int8(0)
        return out

    def keys_frame(df: pd.DataFrame, col: str) -> pd.DataFrame:
        out = pd.DataFrame({"conv_key": "", "tool_key": "",
                            "_t": np.full(len(df), 1, np.int8)})
        out[col] = df["key"].to_numpy()
        return out[["conv_key", "tool_key", "_t"]]

    def semi(df: pd.DataFrame, on: str) -> pd.DataFrame:
        is_k = df["_t"].to_numpy() == 1
        keys = df.loc[is_k, [on]].drop_duplicates()
        return df[~is_k].merge(keys, on=on, how="inner")[
            ["conv_key", "tool_key", "_t"]
        ]

    ct = edges.map_batches(conv_tool, batch_format="pyarrow")
    s1 = bucketed_groupby(
        ct.union(busy.map_batches(
            lambda df: keys_frame(df, "conv_key"), batch_format="pandas")),
        ["conv_key"], lambda df: semi(df, "conv_key"),
        num_buckets=num_buckets, local_combine=False,
    )
    s2 = bucketed_groupby(
        s1.union(hot.map_batches(
            lambda df: keys_frame(df, "tool_key"), batch_format="pandas")),
        ["tool_key"], lambda df: semi(df, "tool_key"),
        num_buckets=num_buckets, local_combine=False,
    )
    return s2.map_batches(
        lambda df: df[["conv_key", "tool_key"]], batch_format="pandas"
    )


# shared with SAMPLE_ORACLE_SQL below so the engine and its oracle can
# never silently diverge on the sampling rate (ADVICE r1)
SAMPLE_RATE_DENOM = 20


def q_transcript_sample(sf_dir: str, rate_denom: int = SAMPLE_RATE_DENOM) -> ray.data.Dataset:
    """Deterministic systematic sample of turns (SURVEY §2.6: sampling
    is absent in the reference; the engine provides a seeded/systematic
    variant for fixtures and downsampling pipelines).  Keyed on the
    stable (conv_id, turn_idx) identity so the sample is identical
    across engines and partitionings."""
    ds = transcripts_from_events(sf_dir)

    def pick(batch: pa.Table) -> pa.Table:
        turn = pc.cast(batch["turn_idx"], pa.int64())
        key = pc.add(
            pc.multiply(pc.utf8_length(batch["conv_id"]), pa.scalar(7, pa.int64())),
            turn,
        )
        keep = pc.equal(pc.subtract(key, pc.multiply(
            pc.divide(key, pa.scalar(rate_denom, pa.int64())),
            pa.scalar(rate_denom, pa.int64()))), pa.scalar(0, pa.int64()))
        return batch.filter(keep)

    return ds.map_batches(pick, batch_format="pyarrow", zero_copy_batch=True)


def q_turns_per_hour(sf_dir: str) -> ray.data.Dataset:
    """Temporal aggregation (§2.8 temporal functions): turns bucketed by
    hour of ``ts``, with per-hour tool-call counts — vectorized Arrow
    ``floor_temporal`` + a bucketed count (local combine, tiny final
    merge)."""
    ds = transcripts_from_events(sf_dir)

    def per_batch(batch: pa.Table) -> pd.DataFrame:
        hour = pc.floor_temporal(batch["ts"], unit="hour")
        tool_called = pc.cast(pc.is_valid(batch["tool"]), pa.int64())
        df = pd.DataFrame(
            {"hour": hour.to_numpy(zero_copy_only=False),
             "tc": tool_called.to_numpy(zero_copy_only=False)}
        )
        return df.groupby("hour", as_index=False).agg(
            n_turns=("tc", "size"), n_tool_calls=("tc", "sum")
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("hour", as_index=False).agg(
            n_turns=("n_turns", "sum"), n_tool_calls=("n_tool_calls", "sum")
        )

    from neo4j_webgraph_ray.stages.core import bucketed_groupby

    parts = ds.map_batches(per_batch, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_groupby(parts, ["hour"], combine, num_buckets=8)


TURNS_PER_HOUR_SQL = f"""
WITH transcripts AS ({TRANSCRIPTS_FROM_EVENTS_SQL})
SELECT date_trunc('hour', ts) AS hour,
       count(*) AS n_turns,
       count(tool) AS n_tool_calls
FROM transcripts GROUP BY hour
"""


def q_role_transitions(sf_dir: str) -> pd.DataFrame:
    """Role-transition matrix over stable turn order (the Markov-chain
    view of the transcripts): for each consecutive turn pair within a
    conversation — consecutive BY ORDER, the same gap semantics as the
    edge derivation (§2.9) — count (role_a, role_b) transitions and the
    row-normalized probability p = n / Σ_b n, rounded to 6 dp in both
    engines.  The weighted companion of the deduped role-to-role edge
    table (the reference keeps only the link's existence; this keeps
    the multiplicity a Markov analysis needs).

    Scale shape: conversations are re-bucketed by conv hash so each
    group holds whole conversations, ONE stable sort + shifted compare
    per group, per-group partial counts, and a #roles²-row driver
    merge — the transcript table never leaves the cluster."""
    ds = transcripts_from_events(sf_dir).select_columns(
        ["conv_id", "turn_idx", "role"]
    )
    nb = 8

    def transitions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="stable")
        c = df["conv_id"].to_numpy()
        r = df["role"].to_numpy()
        if len(df) < 2:
            return pd.DataFrame(
                {"role_a": pd.Series([], dtype=object),
                 "role_b": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype="int64")}
            )
        same = c[1:] == c[:-1]
        out = pd.DataFrame({"role_a": r[:-1][same], "role_b": r[1:][same]})
        return out.groupby(["role_a", "role_b"], as_index=False).size().rename(
            columns={"size": "n"}
        )

    staged = ds.map_batches(
        lambda df: add_bucket_column(df, ["conv_id"], nb),
        batch_format="pandas",
    )
    parts = (
        staged.groupby(BUCKET_COL)
        .map_groups(
            lambda df: transitions(df.drop(columns=[BUCKET_COL])),
            batch_format="pandas",
        )
        .to_pandas()
    )
    cnt = parts.groupby(["role_a", "role_b"], as_index=False)["n"].sum()
    tot = cnt.groupby("role_a")["n"].transform("sum").to_numpy()
    cnt["n"] = cnt["n"].astype("int64")
    cnt["p"] = np.round(cnt["n"].to_numpy().astype(np.float64) / tot, 6)
    return cnt.sort_values(["role_a", "role_b"]).reset_index(drop=True)


ROLE_TRANSITIONS_SQL = f"""
WITH transcripts AS ({TRANSCRIPTS_FROM_EVENTS_SQL}),
nx AS (SELECT role AS role_a,
              lead(role) OVER (PARTITION BY conv_id ORDER BY turn_idx)
                  AS role_b
       FROM transcripts),
cnt AS (SELECT role_a, role_b, count(*) AS n FROM nx
        WHERE role_b IS NOT NULL GROUP BY role_a, role_b),
tot AS (SELECT role_a, sum(n) AS t FROM cnt GROUP BY role_a)
SELECT c.role_a, c.role_b, CAST(c.n AS BIGINT) AS n,
       round(CAST(c.n AS DOUBLE) / t.t, 6) AS p
FROM cnt c JOIN tot t USING (role_a)
ORDER BY role_a, role_b
"""


SAMPLE_ORACLE_SQL = f"""
WITH transcripts AS ({TRANSCRIPTS_FROM_EVENTS_SQL})
SELECT * FROM transcripts
WHERE (length(conv_id) * 7 + turn_idx) % {SAMPLE_RATE_DENOM} = 0
"""


# shared engine/oracle constant (the ADVICE-r1 rule: parameters that
# appear in both implementations live in ONE place)
SESSION_GAP_MINUTES = 30


def _events_user_bucketed(
    sf_dir: str, columns: list[str], keep_types: tuple[str, ...] | None = None
) -> ray.data.Dataset:
    """The ONE shuffle every event-stream operator here shares: prune
    columns (and optionally event types) at the read/map, then key each
    row by ``user_id % B`` so all rows of a user co-locate.  Every
    downstream per-bucket kernel (sessionization, as-of join, range
    join, rolling window, funnel) relies on exactly this partitioning
    assumption and nothing more."""
    from neo4j_webgraph_ray.sources.transcripts import auto_buckets

    path = os.path.join(sf_dir, "events.parquet")
    B = auto_buckets(path)
    small = os.path.exists(path) and os.path.getsize(path) < (512 << 20)
    ds = ray.data.read_parquet(
        path, columns=columns,
        override_num_blocks=B if small else None,
    )
    vset = (
        pa.array(list(keep_types), pa.string())
        if keep_types is not None
        else None
    )

    def add_bucket(batch: pa.Table) -> pa.Table:
        if vset is not None:
            # prune at the map: only relevant event types shuffle
            batch = batch.filter(pc.is_in(batch["event_type"], value_set=vset))
        b = pa.array((batch["user_id"].to_numpy() % B).astype(np.int32))
        return batch.append_column("bucket", b)

    return ds.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    )


def q_user_sessions(
    sf_dir: str, gap_minutes: int = SESSION_GAP_MINUTES
) -> ray.data.Dataset:
    """Sessionization — the windowed aggregate a training-data pipeline
    runs over interaction logs: each user's event stream splits into
    sessions at inactivity gaps > ``gap_minutes``; one output row per
    session (user_id, session_idx, n_events, start_ts, end_ts).

    Scale shape: ONE shuffle keyed by ``user_id % B`` (the same
    bucketed per-key pattern as the transcripts adapter — a session can
    only span rows of one user, so per-bucket work is global for its
    users), then a fully vectorized gaps-and-islands pass per bucket:
    sort, boundary mask (user change OR gap), run-length aggregate via
    ``np.flatnonzero`` starts.  No window function materializes per-row
    state; output is one row per session."""
    staged = _events_user_bucketed(sf_dir, ["user_id", "ts"])
    gap_us = np.int64(gap_minutes) * 60 * 1_000_000

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["user_id", "ts"], kind="stable")
        uid = df["user_id"].to_numpy()
        ts = df["ts"].to_numpy().astype("datetime64[us]")
        t = ts.view(np.int64)
        if len(uid) == 0:
            return pd.DataFrame(
                {"user_id": np.empty(0, np.int64),
                 "session_idx": np.empty(0, np.int64),
                 "n_events": np.empty(0, np.int64),
                 "start_ts": ts, "end_ts": ts}
            )
        new_user = np.r_[True, uid[1:] != uid[:-1]]
        brk = new_user | np.r_[True, (t[1:] - t[:-1]) > gap_us]
        g = np.cumsum(brk)  # global session ordinal (1-based)
        first_g = g[new_user]  # first session ordinal of each user
        user_ord = np.cumsum(new_user) - 1
        sidx = g - first_g[user_ord] + 1  # per-user 1-based session idx
        starts = np.flatnonzero(brk)
        ends = np.r_[starts[1:], len(uid)]
        return pd.DataFrame(
            {
                "user_id": uid[starts],
                "session_idx": sidx[starts].astype(np.int64),
                "n_events": (ends - starts).astype(np.int64),
                "start_ts": ts[starts],  # sorted by ts => first = min
                "end_ts": ts[ends - 1],
            }
        )

    return staged.groupby("bucket").map_groups(sessions, batch_format="pandas")


USER_SESSIONS_SQL = f"""
WITH x AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
              OR ts - lag(ts) OVER w > INTERVAL {SESSION_GAP_MINUTES} MINUTE
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts,
         CAST(sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_idx
  FROM x
)
SELECT user_id, session_idx, CAST(count(*) AS BIGINT) AS n_events,
       min(ts) AS start_ts, max(ts) AS end_ts
FROM s GROUP BY user_id, session_idx
"""


# structured (user, ts) key: numpy compares field-by-field, so ONE
# searchsorted resolves "latest row of the same user at ts <= probe"
_UT_DT = np.dtype([("u", np.int64), ("t", np.int64)])


def q_purchase_asof_click(sf_dir: str) -> ray.data.Dataset:
    """As-of join (a custom operator Ray Data lacks): for every
    ``purchase`` event, the most recent ``click`` by the SAME user at
    ``ts <= purchase ts`` — inner semantics (purchases with no prior
    click drop, the ASOF JOIN default).  Output: (user_id,
    purchase_event_id, purchase_ts, click_ts).

    Partitioning assumption (documented per the custom-operator rule):
    all rows of a user must co-locate — ONE shuffle keyed by
    ``user_id % B`` guarantees it, then each bucket resolves its
    purchases with a single vectorized searchsorted over the bucket's
    clicks on a structured (user, ts) key (no per-user loop, no
    windowed row state)."""
    staged = _events_user_bucketed(
        sf_dir, ["user_id", "ts", "event_id", "event_type"],
        keep_types=("click", "purchase"),
    )

    def asof(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].to_numpy()
        uid = df["user_id"].to_numpy()
        ts = df["ts"].to_numpy().astype("datetime64[us]")
        t = ts.view(np.int64)
        is_p = et == "purchase"
        is_c = et == "click"
        empty = pd.DataFrame(
            {"user_id": np.empty(0, np.int64),
             "purchase_event_id": np.empty(0, np.int64),
             "purchase_ts": ts[:0], "click_ts": ts[:0]}
        )
        if not is_p.any() or not is_c.any():
            return empty
        c = np.empty(int(is_c.sum()), dtype=_UT_DT)
        c["u"], c["t"] = uid[is_c], t[is_c]
        c.sort()
        q = np.empty(int(is_p.sum()), dtype=_UT_DT)
        q["u"], q["t"] = uid[is_p], t[is_p]
        idx = np.searchsorted(c, q, side="right") - 1
        ok = idx >= 0
        ok &= c["u"][np.maximum(idx, 0)] == q["u"]
        return pd.DataFrame(
            {
                "user_id": uid[is_p][ok],
                "purchase_event_id": df["event_id"].to_numpy()[is_p][ok],
                "purchase_ts": ts[is_p][ok],
                "click_ts": c["t"][idx[ok]].astype("datetime64[us]"),
            }
        )

    return staged.groupby("bucket").map_groups(asof, batch_format="pandas")


PURCHASE_ASOF_CLICK_SQL = """
WITH p AS (SELECT user_id, event_id, ts FROM events
           WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
SELECT p.user_id, p.event_id AS purchase_event_id, p.ts AS purchase_ts,
       max(c.ts) AS click_ts
FROM p JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts
GROUP BY 1, 2, 3
"""


def q_latest_event_per_user(sf_dir: str) -> ray.data.Dataset:
    """Log-compaction snapshot: each user's LATEST event (argmax by ts,
    ties to the larger event_id), carrying the event's other columns —
    the per-key last-value compaction a state-store ingest runs over an
    append log.

    Scale shape: argmax-with-carry is algebraic, so the SAME vectorized
    reduction runs twice — once per batch BEFORE the shuffle (cutting
    exchange volume from #events to ≤ #users-per-batch rows) and once
    per user-keyed bucket after it.  One sort + run-boundary mask per
    stage; no window function, no per-row state."""
    staged = _events_user_bucketed(
        sf_dir, ["user_id", "ts", "event_id", "event_type"]
    )

    def latest(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = df["user_id"].to_numpy()
        last = np.r_[uid[1:] != uid[:-1], True]
        return df.iloc[np.flatnonzero(last)]

    pre = staged.map_batches(latest, batch_format="pandas")
    return pre.groupby("bucket").map_groups(
        latest, batch_format="pandas"
    ).map_batches(
        lambda df: df[["user_id", "event_id", "ts", "event_type"]],
        batch_format="pandas",
    )


LATEST_EVENT_PER_USER_SQL = """
SELECT user_id, event_id, ts, event_type FROM (
  SELECT user_id, event_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events) WHERE rn = 1
"""


_DAY_US = np.int64(86_400_000_000)


def q_user_retention(sf_dir: str) -> pd.DataFrame:
    """Cohort retention — the activation/retention matrix a product or
    data-curation team computes over interaction logs: users cohorted
    by their FIRST active day; for every (cohort_day, day_offset), the
    number of cohort users active ``day_offset`` days after joining.

    Scale shape: the classic two-phase plan (per-user first day, then
    join back and re-aggregate) collapses into ONE shuffle because
    both phases key on ``user_id`` — after the single
    ``user_id % B`` bucketing (same exchange as sessions / as-of), a
    user's entire history is bucket-local, so each bucket derives its
    users' distinct active days, first days and offsets with pure
    numpy (one structured-dtype ``np.unique``) and emits
    pre-aggregated (cohort_day, offset) partial counts.  Only
    B × |days| × |offsets| partial rows reach the final fold (days
    and offsets are calendar-bounded — ~365² rows/bucket after years
    of data), never per-user rows.  Days are us-epoch floor-division
    (events are post-1970 by schema; pre-epoch rows would need
    ``floor_divide`` semantics matching SQL ``date_trunc``)."""
    staged = _events_user_bucketed(sf_dir, ["user_id", "ts"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy()
        empty = pd.DataFrame(
            {"cohort_day": np.empty(0, "datetime64[us]"),
             "day_offset": np.empty(0, np.int64),
             "n_users": np.empty(0, np.int64)}
        )
        if len(uid) == 0:
            return empty
        t = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        arr = np.empty(len(uid), dtype=_UT_DT)
        arr["u"], arr["t"] = uid, t // _DAY_US
        arr = np.unique(arr)  # distinct (user, day), sorted by (u, t)
        u, d = arr["u"], arr["t"]
        new_user = np.r_[True, u[1:] != u[:-1]]
        first = d[new_user]  # sorted within user => first = min day
        uord = np.cumsum(new_user) - 1
        ck = np.empty(len(u), dtype=_UT_DT)
        ck["u"], ck["t"] = first[uord], d - first[uord]
        keys, counts = np.unique(ck, return_counts=True)
        return pd.DataFrame(
            {
                "cohort_day": (keys["u"] * _DAY_US).astype("datetime64[us]"),
                "day_offset": keys["t"].astype(np.int64),
                "n_users": counts.astype(np.int64),
            }
        )

    rows = staged.groupby("bucket").map_groups(
        per_bucket, batch_format="pandas"
    ).to_pandas()
    if not len(rows):
        return pd.DataFrame(
            {"cohort_day": np.empty(0, "datetime64[us]"),
             "day_offset": np.empty(0, np.int64),
             "n_users": np.empty(0, np.int64)}
        )
    return (
        rows.groupby(["cohort_day", "day_offset"], as_index=False, sort=True)[
            "n_users"
        ]
        .sum()
        .reset_index(drop=True)
    )


USER_RETENTION_SQL = """
WITH ud AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events),
f AS (SELECT user_id, min(day) AS cohort_day FROM ud GROUP BY user_id)
SELECT f.cohort_day AS cohort_day,
       CAST(date_diff('day', f.cohort_day, ud.day) AS BIGINT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM ud JOIN f ON ud.user_id = f.user_id
GROUP BY 1, 2
"""


def q_daily_new_users(sf_dir: str) -> pd.DataFrame:
    """User-growth curve: per calendar day, the number of FIRST-seen
    users and the cumulative user count — the acquisition plot next to
    the retention matrix.

    Scale shape: phase 1 of :func:`q_user_retention` (per-user first
    day inside the single user-keyed exchange, emitted as per-bucket
    partial counts per first-day — ≤ #days rows per bucket); the
    cumulative sum is a driver-side scan over the ≤ #days merged rows,
    which is the right place for an inherently sequential prefix over
    a calendar-bounded axis."""
    staged = _events_user_bucketed(sf_dir, ["user_id", "ts"])

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy()
        if len(uid) == 0:
            return pd.DataFrame(
                {"day_i": pd.Series([], dtype=np.int64),
                 "n_new_users": pd.Series([], dtype=np.int64)}
            )
        t = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        arr = np.empty(len(uid), dtype=_UT_DT)
        arr["u"], arr["t"] = uid, t // _DAY_US
        arr = np.unique(arr)
        new_user = np.r_[True, arr["u"][1:] != arr["u"][:-1]]
        first = arr["t"][new_user]  # first day per user in this bucket
        u, c = np.unique(first, return_counts=True)
        return pd.DataFrame(
            {"day_i": u.astype(np.int64), "n_new_users": c.astype(np.int64)}
        )

    rows = staged.groupby("bucket").map_groups(
        per_bucket, batch_format="pandas"
    ).to_pandas()
    if not len(rows):
        return pd.DataFrame(
            {"day": np.empty(0, "datetime64[us]"),
             "n_new_users": pd.Series([], dtype=np.int64),
             "cum_users": pd.Series([], dtype=np.int64)}
        )
    g = rows.groupby("day_i", as_index=False, sort=True)["n_new_users"].sum()
    n = g["n_new_users"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "day": (g["day_i"].to_numpy(np.int64) * _DAY_US).astype(
                "datetime64[us]"
            ),
            "n_new_users": n,
            "cum_users": np.cumsum(n),
        }
    )


DAILY_NEW_USERS_SQL = """
WITH f AS (SELECT user_id, min(date_trunc('day', ts)) AS day FROM events
           GROUP BY user_id),
d AS (SELECT day, CAST(count(*) AS BIGINT) AS n_new_users FROM f GROUP BY day)
SELECT day, n_new_users,
       CAST(sum(n_new_users) OVER (ORDER BY day
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_users
FROM d
"""


ERROR_CONTEXT_MINUTES = 240


def q_error_context(sf_dir: str) -> ray.data.Dataset:
    """Range (interval) join — the third custom temporal operator Ray
    Data lacks natively: for every ``error`` event, ALL events by the
    same user in the preceding ``ERROR_CONTEXT_MINUTES`` window
    (``ctx_ts in [error_ts - W, error_ts)``, strictly before — ties and
    the error row itself are excluded).  One output row per
    (error, context-event) pair.

    Partitioning assumption: user co-location (the shared
    ``_events_user_bucketed`` shuffle).  Per bucket: ONE argsort on the
    structured (user, ts) key, two searchsorted probes per error for
    the window bounds, then a fully vectorized repeat/offset expansion
    of the [lo, hi) ranges — no per-pair Python work.  Output volume is
    inherently quadratic in per-user event density within W (range-join
    semantics); W bounds it."""
    staged = _events_user_bucketed(
        sf_dir, ["user_id", "ts", "event_id", "event_type"]
    )
    w_us = np.int64(ERROR_CONTEXT_MINUTES) * 60 * 1_000_000

    def ctx(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy()
        ts = df["ts"].to_numpy().astype("datetime64[us]")
        t = ts.view(np.int64)
        et = df["event_type"].to_numpy()
        eid = df["event_id"].to_numpy()
        empty = pd.DataFrame(
            {"error_event_id": np.empty(0, np.int64),
             "user_id": np.empty(0, np.int64),
             "error_ts": ts[:0],
             "ctx_event_id": np.empty(0, np.int64),
             "ctx_type": np.empty(0, object),
             "ctx_ts": ts[:0]}
        )
        if len(uid) == 0:
            return empty
        arr = np.empty(len(uid), dtype=_UT_DT)
        arr["u"], arr["t"] = uid, t
        order = np.argsort(arr, kind="stable")
        s = arr[order]
        is_e = et == "error"
        if not is_e.any():
            return empty
        probe_hi = arr[is_e]
        probe_lo = probe_hi.copy()
        probe_lo["t"] = probe_hi["t"] - w_us
        lo = np.searchsorted(s, probe_lo, side="left")
        hi = np.searchsorted(s, probe_hi, side="left")  # strict <
        counts = hi - lo
        tot = int(counts.sum())
        if tot == 0:
            return empty
        # vectorized [lo, hi) range expansion
        starts = np.repeat(lo, counts)
        offs = np.arange(tot) - np.repeat(np.cumsum(counts) - counts, counts)
        ctx_orig = order[starts + offs]
        err_idx = np.repeat(np.flatnonzero(is_e), counts)
        return pd.DataFrame(
            {
                "error_event_id": eid[err_idx],
                "user_id": uid[err_idx],
                "error_ts": ts[err_idx],
                "ctx_event_id": eid[ctx_orig],
                "ctx_type": et[ctx_orig],
                "ctx_ts": ts[ctx_orig],
            }
        )

    return staged.groupby("bucket").map_groups(ctx, batch_format="pandas")


ERROR_CONTEXT_SQL = f"""
SELECT e.event_id AS error_event_id, e.user_id, e.ts AS error_ts,
       c.event_id AS ctx_event_id, c.event_type AS ctx_type, c.ts AS ctx_ts
FROM events e JOIN events c
  ON c.user_id = e.user_id
 AND c.ts >= e.ts - INTERVAL {ERROR_CONTEXT_MINUTES} MINUTE
 AND c.ts < e.ts
WHERE e.event_type = 'error'
"""


ROLLING_WINDOW_MINUTES = 60


def q_rolling_user_activity(sf_dir: str) -> ray.data.Dataset:
    """Sliding-window aggregate: for EVERY event, the number of events
    by the same user with ``ts in [ts - 60min, ts]`` (inclusive both
    ends, so timestamp peers count — the semantics of SQL's ``RANGE
    BETWEEN INTERVAL 60 MINUTE PRECEDING AND CURRENT ROW``, which the
    oracle uses verbatim).  One output row per event; the count is
    order-free (pure interval membership), so ties need no tiebreak.

    Same user-bucket shuffle; per bucket ONE argsort plus two
    searchsorted probes per row — no windowed row state, no per-user
    loop."""
    staged = _events_user_bucketed(sf_dir, ["user_id", "ts", "event_id"])
    w_us = np.int64(ROLLING_WINDOW_MINUTES) * 60 * 1_000_000

    def rolling(df: pd.DataFrame) -> pd.DataFrame:
        uid = df["user_id"].to_numpy()
        ts = df["ts"].to_numpy().astype("datetime64[us]")
        t = ts.view(np.int64)
        eid = df["event_id"].to_numpy()
        if len(uid) == 0:
            return pd.DataFrame(
                {"event_id": np.empty(0, np.int64),
                 "user_id": np.empty(0, np.int64),
                 "ts": ts,
                 "n_last_hour": np.empty(0, np.int64)}
            )
        arr = np.empty(len(uid), dtype=_UT_DT)
        arr["u"], arr["t"] = uid, t
        s = np.sort(arr)
        hi = np.searchsorted(s, arr, side="right")  # <= ts (peers count)
        qlo = arr.copy()
        qlo["t"] = arr["t"] - w_us
        lo = np.searchsorted(s, qlo, side="left")  # >= ts - W
        return pd.DataFrame(
            {
                "event_id": eid,
                "user_id": uid,
                "ts": ts,
                "n_last_hour": (hi - lo).astype(np.int64),
            }
        )

    return staged.groupby("bucket").map_groups(rolling, batch_format="pandas")


ROLLING_USER_ACTIVITY_SQL = f"""
SELECT event_id, user_id, ts,
       CAST(count(*) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL {ROLLING_WINDOW_MINUTES} MINUTE PRECEDING
               AND CURRENT ROW) AS BIGINT) AS n_last_hour
FROM events
"""


FUNNEL_STAGES = ("view", "click", "purchase")


def q_conversion_funnel(sf_dir: str) -> pd.DataFrame:
    """Sequential-pattern (funnel) aggregate: how many users performed
    view -> click -> purchase in strictly increasing ts order (first
    view, then the EARLIEST click after it, then any purchase after
    that click).  Output: one row per stage with the user count that
    reached it.

    Per bucket (users co-located): three sorted structured (user, ts)
    arrays, first-view per user via a boundary mask, then each stage
    advance is ONE searchsorted (first next-stage row strictly after
    the current timestamp).  Greedy-earliest is optimal for
    reachability, which is exactly the min-ts chaining the SQL oracle
    does.  Partials are 3 rows per bucket; the driver folds
    buckets x 3 rows."""
    staged = _events_user_bucketed(
        sf_dir, ["user_id", "ts", "event_type"], keep_types=FUNNEL_STAGES
    )

    def advance(cur: np.ndarray, nxt: np.ndarray) -> np.ndarray:
        """cur: (u, t) per user; returns (u, t') with t' = first ts in
        nxt for the same user strictly after t (users with none drop)."""
        if len(cur) == 0 or len(nxt) == 0:
            return cur[:0]
        pos = np.searchsorted(nxt, cur, side="right")
        ok = pos < len(nxt)
        pos_c = np.minimum(pos, len(nxt) - 1)
        ok &= nxt["u"][pos_c] == cur["u"]
        out = np.empty(int(ok.sum()), dtype=_UT_DT)
        out["u"] = cur["u"][ok]
        out["t"] = nxt["t"][pos_c[ok]]
        return out

    def funnel(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:  # zero-row groupby guard (columnless frame)
            return pd.DataFrame(
                {"stage": np.empty(0, object),
                 "n_users": np.empty(0, np.int64)}
            )
        uid = df["user_id"].to_numpy()
        t = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        et = df["event_type"].to_numpy()

        def sorted_struct(mask: np.ndarray) -> np.ndarray:
            a = np.empty(int(mask.sum()), dtype=_UT_DT)
            a["u"], a["t"] = uid[mask], t[mask]
            a.sort()
            return a

        v, c, p = (sorted_struct(et == s) for s in FUNNEL_STAGES)
        first = (
            np.r_[True, v["u"][1:] != v["u"][:-1]]
            if len(v)
            else np.empty(0, bool)
        )
        cur = v[first]  # (user, first view ts)
        cur2 = advance(cur, c)
        cur3 = advance(cur2, p)
        return pd.DataFrame(
            {
                "stage": np.array(FUNNEL_STAGES, object),
                "n_users": np.array(
                    [len(cur), len(cur2), len(cur3)], np.int64
                ),
            }
        )

    parts = (
        staged.groupby("bucket")
        .map_groups(funnel, batch_format="pandas")
        .to_pandas()
    )
    agg = (
        parts.groupby("stage")["n_users"].sum()
        if len(parts)
        else {}
    )
    return pd.DataFrame(
        {
            "stage": list(FUNNEL_STAGES),
            "n_users": np.array(
                [int(agg.get(s, 0)) for s in FUNNEL_STAGES], np.int64
            ),
        }
    )


CONVERSION_FUNNEL_SQL = """
WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY 1),
c AS (SELECT v.user_id, min(e.ts) AS t2 FROM v JOIN events e
      ON e.user_id = v.user_id AND e.event_type = 'click'
      AND e.ts > v.t1 GROUP BY 1),
p AS (SELECT c.user_id, min(e.ts) AS t3 FROM c JOIN events e
      ON e.user_id = c.user_id AND e.event_type = 'purchase'
      AND e.ts > c.t2 GROUP BY 1)
SELECT 'view' AS stage, CAST(count(*) AS BIGINT) AS n_users FROM v
UNION ALL
SELECT 'click', CAST(count(*) AS BIGINT) FROM c
UNION ALL
SELECT 'purchase', CAST(count(*) AS BIGINT) FROM p
"""


def q_event_props_stats(sf_dir: str) -> pd.DataFrame:
    """Semi-structured payload stats: per event type, count plus
    6-dp-rounded means of the numeric ``value`` column and of the
    integer extracted from the ``props`` JSON payload (the same
    regex-scalar path the events→transcripts adapter uses,
    ``sources/transcripts.py:52,71`` — here surfaced as a first-class
    query).  Pure partial aggregation: per-batch local groupby emits
    (type, n, sum, sum_k) rows, the driver merges #blocks x #types
    tiny rows in type-major order; nothing shuffles.  Reference
    analog: the per-type index counts of A3
    (``importer/TransactionalGraphImporter.java:371-379``) widened
    from count to count+moments."""
    path = os.path.join(sf_dir, "events.parquet")
    ds = ray.data.read_parquet(path, columns=["event_type", "value", "props"])

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        k = df["props"].str.extract(r"([0-9]+)", expand=False).astype("int64")
        g = df.assign(k=k).groupby("event_type", sort=False).agg(
            n_events=("value", "size"), sv=("value", "sum"), sk=("k", "sum")
        )
        return g.reset_index()

    parts = ds.map_batches(partials, batch_format="pandas").to_pandas()
    # (type, sv) merge order -> float reduction independent of block
    # arrival order (equal keys commute exactly)
    parts = parts.sort_values(["event_type", "sv"], kind="stable")
    agg = parts.groupby("event_type", sort=True).agg(
        n_events=("n_events", "sum"), sv=("sv", "sum"), sk=("sk", "sum")
    )
    return pd.DataFrame(
        {
            "event_type": agg.index,
            "n_events": agg["n_events"].astype("int64").to_numpy(),
            "mean_value": np.round(
                agg["sv"].to_numpy() / agg["n_events"].to_numpy(), 6
            ),
            "mean_k": np.round(
                agg["sk"].to_numpy() / agg["n_events"].to_numpy(), 6
            ),
        }
    ).reset_index(drop=True)


EVENT_PROPS_STATS_SQL = """
SELECT event_type, count(*) AS n_events,
       round(sum(value) / count(*), 6) AS mean_value,
       round(sum(CAST(regexp_extract(props, '[0-9]+') AS BIGINT)) / count(*), 6) AS mean_k
FROM events GROUP BY event_type
"""


def q_distinct_users(sf_dir: str) -> ray.data.Dataset:
    """Exact distinct-user count per event type — the audience-size
    aggregate (reference analog: A3's per-type index counts widened to
    COUNT DISTINCT).  Scale shape: per-batch distinct (type, user)
    pairs feed ONE bucketed exact-distinct shuffle keyed on the pair
    hash (each pair survives exactly once, so the per-type count is a
    pure sum of per-batch partials afterward) — the classic two-phase
    distinct that never concentrates a hot event type on one task.
    Companion: :func:`q_approx_distinct_users` computes the same
    numbers from mergeable HLL sketches in one narrow pass."""
    from neo4j_webgraph_ray.stages.core import bucketed_groupby, exact_distinct

    path = os.path.join(sf_dir, "events.parquet")
    ds = ray.data.read_parquet(path, columns=["event_type", "user_id"])
    pairs = exact_distinct(ds, ["event_type", "user_id"], num_buckets=16)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("event_type", as_index=False, sort=False).agg(
            n_users=("user_id", "size")
        )

    def combine(d: pd.DataFrame) -> pd.DataFrame:
        return d.groupby("event_type", as_index=False, sort=False)[
            "n_users"
        ].sum()

    return bucketed_groupby(
        pairs.map_batches(partial, batch_format="pandas"),
        ["event_type"], combine, num_buckets=4,
    )


DISTINCT_USERS_SQL = """
SELECT event_type, count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
"""


BLOOM_SEGMENT = "BUILDING"


def q_bloom_semijoin(sf_dir: str) -> ray.data.Dataset:
    """Per-user event counts for users who are customers of ONE market
    segment — the selective fact⋉dim semi-join, run the runtime-filter
    way: a Bloom filter of the segment's customer keys broadcast once,
    a map-only prefilter over the event stream, and ONE bucketed exact
    verify over the survivors (:mod:`neo4j_webgraph_ray.stages.bloom`).
    Non-matching events never shuffle; the result is EXACT (Bloom has
    no false negatives; the verify removes its false positives), so
    the plain ``IN``-subquery SQL is a full oracle."""
    from neo4j_webgraph_ray.stages.bloom import bloom_semijoin
    from neo4j_webgraph_ray.stages.core import bucketed_groupby

    fact = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["user_id"]
    )
    dim = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    ).filter(expr=f"c_mktsegment == '{BLOOM_SEGMENT}'")

    kept = bloom_semijoin(fact, "user_id", dim, "c_custkey", num_buckets=16)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("user_id", as_index=False, sort=False).agg(
            n_events=("user_id", "size")
        )

    def combine(d: pd.DataFrame) -> pd.DataFrame:
        return d.groupby("user_id", as_index=False, sort=False)["n_events"].sum()

    return bucketed_groupby(
        kept.map_batches(partial, batch_format="pandas"),
        ["user_id"], combine, num_buckets=4,
    )


BLOOM_SEMIJOIN_SQL = f"""
SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
FROM events
WHERE user_id IN (SELECT c_custkey FROM customer
                  WHERE c_mktsegment = '{BLOOM_SEGMENT}')
GROUP BY user_id ORDER BY user_id
"""


# revenue is summed in 1e-4 currency units (cents x discount-cents) so
# engine and SQL are bit-identical regardless of summation order; ONE
# final division converts back
REVENUE_SCALE = 10_000.0


def q_revenue_by_nation(sf_dir: str) -> pd.DataFrame:
    """Star-schema revenue rollup — the multi-way equi-join a
    relational user of the reference's query surface reaches for
    first: lineitem ⨝ orders ⨝ customer ⨝ nation, revenue and item
    count per nation (TPC-H Q5 shape without the date/region filters).

    Scale shape, fact-first: the fact table is COMPRESSED before any
    join (per-batch exact int64 partials keyed on ``l_orderkey`` via
    argsort + ``add.reduceat`` — ~one row per order per block), both
    key joins are the engine's size-gated :func:`_lookup_join`
    (broadcast under ``broadcast_limit``, the side-tagged bucketed
    co-group beyond — orders at 10^9 rows never collects on the
    driver), the ≤25-row nation dimension is a driver dict by
    definition of the schema, and the final rollup is a pure partial
    aggregation (≤ #blocks × #nations rows leave the workers).  At
    sandbox scale both joins take the broadcast path so the whole
    query fuses into ONE streaming pass over lineitem.

    Revenue is EXACT integer arithmetic: prices and discounts are
    2-dp by construction, so ``cents(price) * (100 - cents(discount))``
    is an exact int64 in 1e-4 units (headroom: ~9.2e18 / ~1e9 per row
    ≈ 9e9 lineitems per partial-tree path before overflow) and the
    single final division is the same op in both engines — the oracle
    hash cannot be broken by float summation order."""
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount"],
    )

    def li_partial(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(ok):
            return pa.table(
                {"okey": pa.array([], pa.int64()),
                 "rev4": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        # np.rint (half-to-even) == SQL ROUND (half-away) here: the
        # doubles sit within 1e-9 of an integer number of cents, so
        # no value is ever at an exact .5 boundary
        cents = np.rint(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        dc = np.rint(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        rev4 = cents * (100 - dc)
        order = np.argsort(ok, kind="stable")
        ok = ok[order]
        rev4 = rev4[order]
        bound = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        return pa.table(
            {
                "okey": pa.array(ok[bound], pa.int64()),
                "rev4": pa.array(np.add.reduceat(rev4, bound), pa.int64()),
                "n": pa.array(
                    np.diff(np.r_[bound, len(ok)]).astype(np.int64)
                ),
            }
        )

    partials = li.map_batches(
        li_partial, batch_format="pyarrow", zero_copy_batch=True
    )

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"],
    )
    with_cust = _lookup_join(
        partials, "okey", orders, "o_orderkey", "o_custkey",
        out_col="custkey", carry_cols=["rev4", "n"],
    )
    customer = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    )
    with_nat = _lookup_join(
        with_cust, "custkey", customer, "c_custkey", "c_nationkey",
        out_col="nationkey", carry_cols=["rev4", "n"],
    )

    def nat_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("nationkey", as_index=False, sort=False).agg(
            rev4=("rev4", "sum"), n=("n", "sum")
        )

    rows = with_nat.map_batches(nat_partial, batch_format="pandas").to_pandas()
    if not len(rows):
        return pd.DataFrame(
            {"n_name": pd.Series([], dtype=object),
             "n_items": pd.Series([], dtype=np.int64),
             "revenue": pd.Series([], dtype=np.float64)}
        )
    out = rows.groupby("nationkey", as_index=False, sort=False).agg(
        rev4=("rev4", "sum"), n=("n", "sum")
    )
    # nation: <= 25 rows at ANY scale — a driver lookup by schema design
    nat = ray.data.read_parquet(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_name"],
    ).to_pandas()
    key_arr = nat["n_nationkey"].to_numpy(np.int64)
    name_arr = nat["n_name"].to_numpy()
    o = np.argsort(key_arr)
    idx = np.searchsorted(key_arr[o], out["nationkey"].to_numpy(np.int64))
    return pd.DataFrame(
        {
            "n_name": name_arr[o][idx],
            "n_items": out["n"].to_numpy(np.int64),
            "revenue": out["rev4"].to_numpy(np.int64) / REVENUE_SCALE,
        }
    ).sort_values("n_name").reset_index(drop=True)


REVENUE_BY_NATION_SQL = """
SELECT n_name,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)))
            AS DOUBLE) / 10000.0 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""


PRICING_CUTOFF = "1998-09-02"


def q_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H-Q1-shaped pricing summary: the canonical full-scan
    multi-aggregate report — per (returnflag, linestatus), sums of
    quantity / base price / discounted price / charged amount, the
    three averages, and the row count, over lineitems shipped on or
    before ``PRICING_CUTOFF``.

    Scale shape: the ideal streaming aggregate — column-pruned read
    (7 of 11 columns), per-batch vectorized filter + exact-integer
    partials into a SIX-row key space (per-batch pandas groupby), so
    only #blocks × 6 tiny rows ever leave the workers; no shuffle at
    all.  Arithmetic is exact int64 per partial (prices/discounts/
    taxes are 2-dp by construction, quantities integral):
    ``disc4 = cents·(100-dc)`` (1e-4 units) and
    ``charge6 = disc4·(100+tx)`` (1e-6 units, ≤ ~1.1e11/row — a
    partial path overflows int64 only past ~8e7 rows per BLOCK, far
    above any block size).  The driver's final fold runs on Python
    object ints (arbitrary precision, ≤ #blocks × 6 rows), matching
    DuckDB's HUGEINT sum exactly at any corpus size; each output
    double is ONE division of identical quantities in both engines,
    so the oracle hash cannot be broken by float summation order."""
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_shipdate",
        ],
    )
    cutoff = np.datetime64(PRICING_CUTOFF, "us").view(np.int64)

    def partial(t: pa.Table) -> pd.DataFrame:
        ship = (
            t["l_shipdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").view(np.int64)
        )
        m = ship <= cutoff
        if not m.any():
            return pd.DataFrame(
                {
                    "l_returnflag": pd.Series([], dtype=object),
                    "l_linestatus": pd.Series([], dtype=object),
                    **{
                        c: pd.Series([], dtype=np.int64)
                        for c in ("qty100", "cents", "dc", "disc4",
                                  "charge6", "n")
                    },
                }
            )
        qty100 = np.rint(
            t["l_quantity"].to_numpy(zero_copy_only=False)[m] * 100.0
        ).astype(np.int64)
        cents = np.rint(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)[m] * 100.0
        ).astype(np.int64)
        dc = np.rint(
            t["l_discount"].to_numpy(zero_copy_only=False)[m] * 100.0
        ).astype(np.int64)
        tx = np.rint(
            t["l_tax"].to_numpy(zero_copy_only=False)[m] * 100.0
        ).astype(np.int64)
        disc4 = cents * (100 - dc)
        df = pd.DataFrame(
            {
                "l_returnflag": t["l_returnflag"].to_numpy(
                    zero_copy_only=False
                )[m],
                "l_linestatus": t["l_linestatus"].to_numpy(
                    zero_copy_only=False
                )[m],
                "qty100": qty100,
                "cents": cents,
                "dc": dc,
                "disc4": disc4,
                "charge6": disc4 * (100 + tx),
                "n": np.ones(len(qty100), np.int64),
            }
        )
        return df.groupby(
            ["l_returnflag", "l_linestatus"], as_index=False, sort=False
        ).sum()

    rows = li.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    if not len(rows):
        return pd.DataFrame(
            {
                "l_returnflag": pd.Series([], dtype=object),
                "l_linestatus": pd.Series([], dtype=object),
                "sum_qty": pd.Series([], dtype=np.float64),
                "sum_base_price": pd.Series([], dtype=np.float64),
                "sum_disc_price": pd.Series([], dtype=np.float64),
                "sum_charge": pd.Series([], dtype=np.float64),
                "avg_qty": pd.Series([], dtype=np.float64),
                "avg_price": pd.Series([], dtype=np.float64),
                "avg_disc": pd.Series([], dtype=np.float64),
                "count_order": pd.Series([], dtype=np.int64),
            }
        )
    # object-int fold: exact at ANY row count (int64 partials are safe
    # per block; the global sums are what could overflow)
    for c in ("qty100", "cents", "dc", "disc4", "charge6", "n"):
        rows[c] = rows[c].map(int)
    g = rows.groupby(
        ["l_returnflag", "l_linestatus"], as_index=False, sort=True
    ).sum()
    n = g["n"].map(float).to_numpy(np.float64)
    return pd.DataFrame(
        {
            "l_returnflag": g["l_returnflag"],
            "l_linestatus": g["l_linestatus"],
            "sum_qty": g["qty100"].map(float).to_numpy() / 100.0,
            "sum_base_price": g["cents"].map(float).to_numpy() / 100.0,
            "sum_disc_price": g["disc4"].map(float).to_numpy() / 10000.0,
            "sum_charge": g["charge6"].map(float).to_numpy() / 1000000.0,
            "avg_qty": g["qty100"].map(float).to_numpy() / (100.0 * n),
            "avg_price": g["cents"].map(float).to_numpy() / (100.0 * n),
            "avg_disc": g["dc"].map(float).to_numpy() / (100.0 * n),
            "count_order": g["n"].to_numpy(np.int64),
        }
    )


PRICING_SUMMARY_SQL = f"""
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS DOUBLE)/100.0
    AS sum_qty,
  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0
    AS sum_base_price,
  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS DOUBLE)
    / 10000.0 AS sum_disc_price,
  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
           * (100 - CAST(ROUND(l_discount*100) AS BIGINT))
           * (100 + CAST(ROUND(l_tax*100) AS BIGINT))) AS DOUBLE)
    / 1000000.0 AS sum_charge,
  CAST(SUM(CAST(ROUND(l_quantity*100) AS BIGINT)) AS DOUBLE)
    / (100.0 * count(*)) AS avg_qty,
  CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)) AS DOUBLE)
    / (100.0 * count(*)) AS avg_price,
  CAST(SUM(CAST(ROUND(l_discount*100) AS BIGINT)) AS DOUBLE)
    / (100.0 * count(*)) AS avg_disc,
  CAST(count(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{PRICING_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_orders_by_priority(sf_dir: str) -> pd.DataFrame:
    """Temporal rollup over the orders table directly (previously only
    reached through joins): per (order year, priority), the order count
    and exact-cents total value.

    Scale shape: a pure streaming aggregate — column-pruned scan,
    per-batch exact-int partials into a ≤ #years × 5 key space, no
    shuffle; driver folds #blocks × keys rows on Python object ints
    (exact at any corpus size, matching DuckDB's HUGEINT)."""
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderdate", "o_orderpriority", "o_totalprice"],
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        if t.num_rows == 0:
            return pd.DataFrame(
                {"o_year": pd.Series([], dtype=np.int64),
                 "o_orderpriority": pd.Series([], dtype=object),
                 "cents": pd.Series([], dtype=np.int64),
                 "n": pd.Series([], dtype=np.int64)}
            )
        od = t["o_orderdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[Y]"
        )
        year = od.astype(np.int64) + 1970
        cents = np.rint(
            t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "o_year": year,
                "o_orderpriority": t["o_orderpriority"].to_numpy(
                    zero_copy_only=False
                ),
                "cents": cents,
                "n": np.ones(len(year), np.int64),
            }
        ).groupby(["o_year", "o_orderpriority"], as_index=False, sort=False).sum()

    rows = orders.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    if not len(rows):
        return pd.DataFrame(
            {"o_year": pd.Series([], dtype=np.int64),
             "o_orderpriority": pd.Series([], dtype=object),
             "n_orders": pd.Series([], dtype=np.int64),
             "total_price": pd.Series([], dtype=np.float64)}
        )
    for c in ("cents", "n"):
        rows[c] = rows[c].map(int)
    g = rows.groupby(
        ["o_year", "o_orderpriority"], as_index=False, sort=True
    ).sum()
    return pd.DataFrame(
        {
            "o_year": g["o_year"].to_numpy(np.int64),
            "o_orderpriority": g["o_orderpriority"],
            "n_orders": g["n"].to_numpy(np.int64),
            "total_price": g["cents"].map(float).to_numpy() / 100.0,
        }
    )


ORDERS_BY_PRIORITY_SQL = """
SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS DOUBLE) / 100.0
         AS total_price
FROM orders
GROUP BY 1, 2
ORDER BY 1, 2
"""


SHIP_SEGMENT = "BUILDING"
SHIP_CUTOFF = "1998-06-30"
SHIP_TOPN = 10


def q_shipping_priority(
    sf_dir: str, broadcast_limit: int = 500_000
) -> pd.DataFrame:
    """TPC-H-Q3-shaped shipping priority: the ``SHIP_TOPN`` unshipped
    orders of ``SHIP_SEGMENT`` customers (ordered before, not fully
    shipped by ``SHIP_CUTOFF``) with the highest outstanding revenue.

    Scale shape, fact-first like :func:`q_revenue_by_nation`: lineitem
    is filtered at the scan (``l_shipdate > cutoff``) and COMPRESSED to
    per-batch exact-int partials per order before any join; orders is
    date-filtered at its scan and semi-joined to the segment's
    customers via the size-gated :func:`_lookup_join` (broadcast at
    sandbox scale, bucketed co-group beyond); the order-date attach is
    a second size-gated join.  The only shuffle is ONE bucketed
    groupby that completes the per-order revenue sums — the top-N cut
    happens per OUTPUT batch (each row there already carries its
    complete sum, so a per-batch cut can never drop a global top-N
    row; cutting inside the local combine WOULD — a batch's partial
    sum can be small for an order whose total is large), and the
    driver merges ≤ #blocks × N candidate rows."""
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_shipdate"],
    )
    cutoff = np.datetime64(SHIP_CUTOFF, "us").view(np.int64)

    def li_partial(t: pa.Table) -> pa.Table:
        ship = (
            t["l_shipdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").view(np.int64)
        )
        m = ship > cutoff
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)[m]
        if not len(ok):
            return pa.table(
                {"okey": pa.array([], pa.int64()),
                 "rev4": pa.array([], pa.int64())}
            )
        cents = np.rint(
            t["l_extendedprice"].to_numpy(zero_copy_only=False)[m] * 100.0
        ).astype(np.int64)
        dc = np.rint(
            t["l_discount"].to_numpy(zero_copy_only=False)[m] * 100.0
        ).astype(np.int64)
        rev4 = cents * (100 - dc)
        order = np.argsort(ok, kind="stable")
        ok, rev4 = ok[order], rev4[order]
        bound = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        return pa.table(
            {"okey": pa.array(ok[bound], pa.int64()),
             "rev4": pa.array(np.add.reduceat(rev4, bound), pa.int64())}
        )

    partials = li.map_batches(
        li_partial, batch_format="pyarrow", zero_copy_batch=True
    )

    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )

    def ord_filter(t: pa.Table) -> pa.Table:
        od = (
            t["o_orderdate"].to_numpy(zero_copy_only=False)
            .astype("datetime64[us]").view(np.int64)
        )
        return t.filter(pa.array(od < cutoff))

    orders_f = orders.map_batches(
        ord_filter, batch_format="pyarrow", zero_copy_batch=True
    )
    customer = ray.data.read_parquet(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    )
    with_seg = _lookup_join(
        orders_f, "o_custkey", customer, "c_custkey", "c_mktsegment",
        out_col="seg", carry_cols=["o_orderkey", "o_orderdate"],
        val_default="", broadcast_limit=broadcast_limit,
    )
    bld = with_seg.map_batches(
        lambda df: df.loc[
            df["seg"] == SHIP_SEGMENT, ["o_orderkey", "o_orderdate"]
        ],
        batch_format="pandas",
    )
    joined = _lookup_join(
        partials, "okey", bld, "o_orderkey", "o_orderdate",
        out_col="o_orderdate", carry_cols=["rev4"],
        val_default=np.datetime64(0, "us"), keep_key=True,
        broadcast_limit=broadcast_limit,
    )
    summed = bucketed_groupby(
        joined, ["okey"],
        lambda df: df.groupby(
            ["okey", "o_orderdate"], as_index=False, sort=False
        )["rev4"].sum(),
    )

    def cut(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["rev4", "okey"], ascending=[False, True], kind="stable"
        ).head(SHIP_TOPN)

    cand = summed.map_batches(cut, batch_format="pandas").to_pandas()
    if not len(cand):
        return pd.DataFrame(
            {"l_orderkey": pd.Series([], dtype=np.int64),
             "o_orderdate": pd.Series([], dtype="datetime64[us]"),
             "revenue": pd.Series([], dtype=np.float64)}
        )
    out = cand.sort_values(
        ["rev4", "okey"], ascending=[False, True], kind="stable"
    ).head(SHIP_TOPN)
    return pd.DataFrame(
        {
            "l_orderkey": out["okey"].to_numpy(np.int64),
            # the co-group join path concats through pandas (ns
            # resolution); normalize so the contract dtype is
            # gate-path-invariant
            "o_orderdate": out["o_orderdate"].to_numpy().astype(
                "datetime64[us]"
            ),
            "revenue": out["rev4"].to_numpy(np.int64) / 10000.0,
        }
    ).reset_index(drop=True)


SHIPPING_PRIORITY_SQL = f"""
SELECT l_orderkey, o_orderdate,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS DOUBLE)
         / 10000.0 AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{SHIP_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{SHIP_CUTOFF} 00:00:00'
  AND l_shipdate > TIMESTAMP '{SHIP_CUTOFF} 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) DESC,
         l_orderkey
LIMIT {SHIP_TOPN}
"""


def q_revenue_by_brand(sf_dir: str) -> pd.DataFrame:
    """Part-dimension revenue rollup: lineitem ⨝ part, revenue and item
    count per ``p_brand`` — the product-dimension cut beside the
    customer-dimension :func:`q_revenue_by_nation`.

    Same fact-first shape: per-batch exact-int partials keyed on
    ``l_partkey`` compress lineitem before the size-gated part join,
    then a pure partial aggregation into the ~25-brand key space
    (≤ #blocks × #brands rows reach the driver; no shuffle at sandbox
    scale where the part side broadcasts)."""
    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_partkey", "l_extendedprice", "l_discount"],
    )

    def li_partial(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(pk):
            return pa.table(
                {"pkey": pa.array([], pa.int64()),
                 "rev4": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        cents = np.rint(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        dc = np.rint(
            t["l_discount"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        rev4 = cents * (100 - dc)
        order = np.argsort(pk, kind="stable")
        pk, rev4 = pk[order], rev4[order]
        bound = np.flatnonzero(np.r_[True, pk[1:] != pk[:-1]])
        return pa.table(
            {
                "pkey": pa.array(pk[bound], pa.int64()),
                "rev4": pa.array(np.add.reduceat(rev4, bound), pa.int64()),
                "n": pa.array(np.diff(np.r_[bound, len(pk)]).astype(np.int64)),
            }
        )

    partials = li.map_batches(
        li_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    part = ray.data.read_parquet(
        os.path.join(sf_dir, "part.parquet"),
        columns=["p_partkey", "p_brand"],
    )
    joined = _lookup_join(
        partials, "pkey", part, "p_partkey", "p_brand",
        out_col="p_brand", carry_cols=["rev4", "n"], val_default="",
    )

    def brand_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("p_brand", as_index=False, sort=False).agg(
            rev4=("rev4", "sum"), n=("n", "sum")
        )

    rows = joined.map_batches(brand_partial, batch_format="pandas").to_pandas()
    if not len(rows):
        return pd.DataFrame(
            {"p_brand": pd.Series([], dtype=object),
             "n_items": pd.Series([], dtype=np.int64),
             "revenue": pd.Series([], dtype=np.float64)}
        )
    g = rows.groupby("p_brand", as_index=False, sort=True).agg(
        rev4=("rev4", "sum"), n=("n", "sum")
    )
    return pd.DataFrame(
        {
            "p_brand": g["p_brand"],
            "n_items": g["n"].to_numpy(np.int64),
            "revenue": g["rev4"].to_numpy(np.int64) / 10000.0,
        }
    )


REVENUE_BY_BRAND_SQL = """
SELECT p_brand,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(SUM(CAST(ROUND(l_extendedprice*100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount*100) AS BIGINT))) AS DOUBLE)
         / 10000.0 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY p_brand
"""


def q_supplier_balance_by_region(sf_dir: str) -> pd.DataFrame:
    """Supplier account-balance rollup by region: supplier ⨝ nation ⨝
    region, (count, exact-cents total, average) per region name.

    Nation (≤25 rows) and region (≤5 rows) are driver lookups BY
    SCHEMA DESIGN — composing their two searchsorted maps turns the
    two dimension joins into one vectorized gather inside the scan, so
    the supplier table streams exactly once with per-batch partials
    into a five-row key space.  Balances are 2-dp by construction →
    exact int64 cents; the averages are one division of identical
    quantities in both engines."""
    nat = ray.data.read_parquet(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_regionkey"],
    ).to_pandas()
    reg = ray.data.read_parquet(
        os.path.join(sf_dir, "region.parquet"),
        columns=["r_regionkey", "r_name"],
    ).to_pandas()
    rk = reg["r_regionkey"].to_numpy(np.int64)
    rn = reg["r_name"].to_numpy()
    ro = np.argsort(rk)
    nk = nat["n_nationkey"].to_numpy(np.int64)
    # nation key -> region NAME, composed once on the driver
    nreg = rn[ro][np.searchsorted(rk[ro], nat["n_regionkey"].to_numpy(np.int64))]
    no = np.argsort(nk)
    nk_sorted, nreg_sorted = nk[no], nreg[no]

    sup = ray.data.read_parquet(
        os.path.join(sf_dir, "supplier.parquet"),
        columns=["s_nationkey", "s_acctbal"],
    )

    def partial(t: pa.Table) -> pd.DataFrame:
        snk = t["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if not len(snk):
            return pd.DataFrame(
                {"r_name": pd.Series([], dtype=object),
                 "bal_cents": pd.Series([], dtype=np.int64),
                 "n": pd.Series([], dtype=np.int64)}
            )
        cents = np.rint(
            t["s_acctbal"].to_numpy(zero_copy_only=False) * 100.0
        ).astype(np.int64)
        region = nreg_sorted[np.searchsorted(nk_sorted, snk)]
        return pd.DataFrame(
            {"r_name": region, "bal_cents": cents,
             "n": np.ones(len(snk), np.int64)}
        ).groupby("r_name", as_index=False, sort=False).sum()

    rows = sup.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    if not len(rows):
        return pd.DataFrame(
            {"r_name": pd.Series([], dtype=object),
             "n_suppliers": pd.Series([], dtype=np.int64),
             "total_acctbal": pd.Series([], dtype=np.float64),
             "avg_acctbal": pd.Series([], dtype=np.float64)}
        )
    g = rows.groupby("r_name", as_index=False, sort=True).sum()
    n = g["n"].to_numpy(np.int64)
    cents = g["bal_cents"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "r_name": g["r_name"],
            "n_suppliers": n,
            "total_acctbal": cents / 100.0,
            "avg_acctbal": cents.astype(np.float64) / (100.0 * n),
        }
    )


SUPPLIER_BALANCE_BY_REGION_SQL = """
SELECT r_name,
       CAST(count(*) AS BIGINT) AS n_suppliers,
       CAST(SUM(CAST(ROUND(s_acctbal*100) AS BIGINT)) AS DOUBLE) / 100.0
         AS total_acctbal,
       CAST(SUM(CAST(ROUND(s_acctbal*100) AS BIGINT)) AS DOUBLE)
         / (100.0 * count(*)) AS avg_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY r_name
"""


def q_events_rollup(sf_dir: str) -> pd.DataFrame:
    """OLAP rollup over the event stream: (event_type, hour-of-day) →
    (event_type) → grand total, each level with row count and
    6-dp-rounded value sum — the ``GROUP BY ROLLUP`` cube walk,
    expressed the distributed way: ONE partial aggregation at the
    finest grain (per-batch local groupby, ≤ #types × 24 rows per
    batch) and the coarser levels FOLDED from the finest partials
    (sums are algebraic), so the input streams exactly once and no
    shuffle is needed at all.  Rolled-up dimensions are NULL, matching
    the SQL convention (hod arrives as float64-with-NaN on both
    engines).  Reference analog: A3's per-type counts
    (``TransactionalGraphImporter.java:371-379``) widened to a
    multi-level cube."""
    path = os.path.join(sf_dir, "events.parquet")
    ds = ray.data.read_parquet(path, columns=["event_type", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.assign(hod=df["ts"].dt.hour.astype(np.int64))
            .groupby(["event_type", "hod"], sort=False)
            .agg(n=("value", "size"), sv=("value", "sum"))
        )
        return g.reset_index()

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    # deterministic float fold: sort partials so equal keys merge in a
    # block-arrival-independent order (same rule as event_props_stats)
    parts = parts.sort_values(["event_type", "hod", "sv"], kind="stable")
    fine = parts.groupby(["event_type", "hod"], sort=True, as_index=False).agg(
        n=("n", "sum"), sv=("sv", "sum")
    )
    mid = fine.groupby("event_type", sort=True, as_index=False).agg(
        n=("n", "sum"), sv=("sv", "sum")
    )
    mid["hod"] = np.nan
    total = pd.DataFrame(
        [{"event_type": None, "hod": np.nan,
          "n": mid["n"].sum(), "sv": mid["sv"].sum()}]
    )
    out = pd.concat(
        [fine[["event_type", "hod", "n", "sv"]], mid[["event_type", "hod", "n", "sv"]], total],
        ignore_index=True,
    )
    return pd.DataFrame(
        {
            "event_type": out["event_type"].to_numpy(),
            "hod": out["hod"].to_numpy(np.float64),
            "n_events": out["n"].to_numpy(np.int64),
            "sum_value": np.round(out["sv"].to_numpy(np.float64), 6),
        }
    )


EVENTS_ROLLUP_SQL = """
SELECT event_type,
       CAST(extract(hour FROM ts) AS DOUBLE) AS hod,
       count(*) AS n_events,
       round(sum(value), 6) AS sum_value
FROM events
GROUP BY ROLLUP(event_type, extract(hour FROM ts))
"""

#: value histogram: fixed-width bins shared with the SQL mirror
HIST_BIN_W = 50.0
HIST_NBINS = 10


def q_value_histogram(sf_dir: str) -> pd.DataFrame:
    """Fixed-width histogram of the numeric ``value`` column per event
    type (bin = clamp(floor(value / 50), 0, 9)) — the profiling
    primitive behind any quality-budget or outlier screen.  Per-batch
    bincount partials (≤ #types × 10 rows each) merged driver-side;
    the input streams once, nothing shuffles, and bin edges are
    compile-time constants shared verbatim with the oracle."""
    path = os.path.join(sf_dir, "events.parquet")
    ds = ray.data.read_parquet(path, columns=["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = np.clip(
            np.floor(df["value"].to_numpy() / HIST_BIN_W).astype(np.int64),
            0, HIST_NBINS - 1,
        )
        g = (
            df.assign(bin=b)
            .groupby(["event_type", "bin"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return g

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby(["event_type", "bin"], sort=True, as_index=False)[
        "n"
    ].sum()
    return pd.DataFrame(
        {
            "event_type": out["event_type"].to_numpy(),
            "bin": out["bin"].to_numpy(np.int64),
            "n": out["n"].to_numpy(np.int64),
        }
    )


VALUE_HISTOGRAM_SQL = f"""
SELECT event_type,
       least(greatest(CAST(floor(value / {HIST_BIN_W}) AS BIGINT), 0),
             {HIST_NBINS - 1}) AS bin,
       count(*) AS n
FROM events
GROUP BY event_type, bin
ORDER BY event_type, bin
"""


#: bottom-k sample size (the driver-visible sampling entry)
BOTTOMK_SAMPLE_K = 500
#: sample size backing the quantile sketch (DKW rank error at k=4096:
#: sqrt(ln(2/0.001)/(2*4096)) ~ 3.0% with probability 99.9%)
QSKETCH_K = 4096
QSKETCH_PS = (0.05, 0.25, 0.5, 0.75, 0.95)


def q_bottomk_sample(sf_dir: str) -> ray.data.Dataset:
    """Min-wise bottom-k uniform sample of events (exact size k,
    without replacement): the k rows whose splitmix64(event_id) is
    smallest.  Contrast with `q_transcript_sample`'s systematic
    Bernoulli pick (a RATE); this is an exact SIZE, is mergeable
    (bottom-k of per-block bottom-k partials == global bottom-k) and
    partition-invariant (splitmix64 is a 64-bit bijection over unique
    ids, so the sample is one fixed collision-free set), and min-wise
    keys coordinate samples across streams.  Scale shape: the stream
    never shuffles — only <= #blocks x k candidate rows move.  Fully
    oracled: the SQL mirror computes the identical splitmix64 in
    HUGEINT arithmetic (bit-equality asserted in pytest)."""
    from neo4j_webgraph_ray.stages.sketches import bottomk_sample

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "value"]
    )
    return bottomk_sample(ds, "event_id", BOTTOMK_SAMPLE_K).drop_columns(
        ["skey"]
    )


def q_value_quantile_sketch(sf_dir: str) -> pd.DataFrame:
    """Mergeable QUANTILE sketch of ``events.value`` — quantiles read
    off the min-wise bottom-k sample (k=4096).  Completes the summary
    family (Misra-Gries heavy hitters / HLL distincts / count-min
    frequencies): by the DKW inequality the sampled quantile's RANK
    error is <= sqrt(ln(2/d)/2k) w.p. 1-d (~3% at k=4096, d=0.001;
    asserted vs exact full-data quantiles in pytest), while the exact
    grouped-quantile path (`q_token_quantiles_by_lang`) needs a
    histogram over the value universe.  Deterministic AND fully
    oracled — the sample is a fixed set, so DuckDB's quantile_cont
    over the same bottom-k subquery reproduces it bit for bit."""
    from neo4j_webgraph_ray.stages.sketches import bottomk_sample

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "value"]
    )
    samp = bottomk_sample(ds, "event_id", QSKETCH_K).to_pandas()
    vals = samp["value"].to_numpy(np.float64)
    qs = np.quantile(vals, QSKETCH_PS, method="linear")
    out = {"sample_n": np.array([len(vals)], np.int64)}
    for p, v in zip(QSKETCH_PS, qs):
        out[f"p{int(p * 100):02d}"] = np.array([round(float(v), 6)])
    return pd.DataFrame(out)


def _bottomk_sql_parts() -> tuple[str, str]:
    from neo4j_webgraph_ray.stages.sketches import splitmix64_cte

    return (
        splitmix64_cte("events", "event_id", "event_id, value"),
        "SELECT event_id, value FROM mixd ORDER BY skey",
    )


def _bottomk_sample_sql() -> str:
    cte, sel = _bottomk_sql_parts()
    return f"WITH {cte} {sel} LIMIT {BOTTOMK_SAMPLE_K}"


def _value_quantile_sketch_sql() -> str:
    cte, sel = _bottomk_sql_parts()
    cols = ", ".join(
        f"round(quantile_cont(value, {p}), 6) AS p{int(p * 100):02d}"
        for p in QSKETCH_PS
    )
    return (
        f"WITH {cte}, samp AS ({sel} LIMIT {QSKETCH_K}) "
        f"SELECT count(*) AS sample_n, {cols} FROM samp"
    )


def q_value_exact_quantiles(sf_dir: str) -> pd.DataFrame:
    """EXACT global quantiles of ``events.value`` (``quantile_disc``
    semantics: the data element at 1-based rank ``ceil(p*n)``) — the
    exactness rung above `q_value_quantile_sketch`'s ~3%-rank-error
    bottom-k sample, without the distributed sort an exact global
    order statistic naively needs.

    Scale shape (see :mod:`..stages.selection`): iterative histogram
    refinement — all five quantiles narrow simultaneously, each pass is
    ONE streaming scan of the column-pruned value column plus a shuffle
    of only sparse (quantile, bucket, count) partials; each pass
    shrinks every window 4096x, so real data resolves in 1-2 passes and
    the driver only ever collects the <= 65536 values of a final
    bucket.  Bit-exact oracled: the answer is a data element, so there
    is no interpolation arithmetic to diverge on."""
    from neo4j_webgraph_ray.stages.selection import exact_quantiles

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["value"]
    )
    res, n = exact_quantiles(ds, "value", QSKETCH_PS)
    out: dict[str, np.ndarray] = {"n": np.array([n], np.int64)}
    for p in QSKETCH_PS:
        out[f"p{int(p * 100):02d}"] = np.array([res[p]], np.float64)
    return pd.DataFrame(out)


VALUE_EXACT_QUANTILES_SQL = (
    "SELECT CAST(count(value) AS BIGINT) AS n, "
    + ", ".join(
        f"quantile_disc(value, {p}) AS p{int(p * 100):02d}"
        for p in QSKETCH_PS
    )
    + " FROM events"
)


def q_value_cont_quantiles(sf_dir: str) -> pd.DataFrame:
    """EXACT interpolated (``quantile_cont``) global quantiles of
    ``events.value`` — the PERCENTILE_CONT semantics next to
    `q_value_exact_quantiles`'s discrete element rule.

    Each quantile needs the two neighboring order statistics at
    0-based ranks ``floor((n-1)p)`` and ``+1``; both come from ONE run
    of the rank-general histogram-refinement core
    (:func:`~neo4j_webgraph_ray.stages.selection.exact_order_stats` —
    all 2×|ps| ranks narrow simultaneously, no sort, no driver
    materialization), then the lerp ``v_lo + ((n-1)p - lo) ·
    (v_hi - v_lo)`` reproduces DuckDB's double arithmetic bit for bit
    (pinned empirically in the docstring test of the fold)."""
    from neo4j_webgraph_ray.stages.selection import exact_order_stats

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["value"]
    )

    def ranks(n: int) -> list[int]:
        ks = []
        for p in QSKETCH_PS:
            lo = int(np.floor((n - 1) * p))
            ks.extend([lo + 1, min(lo + 2, n)])  # 1-based neighbors
        return ks

    res, n = exact_order_stats(ds, "value", ranks)
    out: dict[str, np.ndarray] = {"n": np.array([n], np.int64)}
    for i, p in enumerate(QSKETCH_PS):
        if n == 0:
            v = float("nan")
        else:
            h = (n - 1) * p
            lo = int(np.floor(h))
            vlo, vhi = res[2 * i], res[2 * i + 1]
            v = vlo + (h - lo) * (vhi - vlo)
        out[f"p{int(p * 100):02d}"] = np.array([v], np.float64)
    return pd.DataFrame(out)


VALUE_CONT_QUANTILES_SQL = (
    "SELECT CAST(count(value) AS BIGINT) AS n, "
    + ", ".join(
        f"quantile_cont(value, {p}) AS p{int(p * 100):02d}"
        for p in QSKETCH_PS
    )
    + " FROM events"
)


#: winsorization bounds: corpus-wide exact quantiles
WINSOR_PS = (0.01, 0.99)


def q_winsorized_value_stats(sf_dir: str) -> pd.DataFrame:
    """Winsorized value statistics per event type: clamp every value to
    the corpus-wide exact [p01, p99] quantiles, then per-type count /
    clamped sum / clamped mean — the outlier-robust aggregate a metrics
    pipeline runs before alerting.

    Scale shape: TWO streaming passes — the bounds come from
    :func:`exact_quantiles` (iterative histogram refinement: no sort,
    no driver materialization), then one column-pruned pass of
    per-batch partials into the #types key space.  Values are 2-dp by
    construction, so the clamp and the sums run in EXACT int64 cents
    (the quantile bounds are data elements, hence also 2-dp); each
    output double is one division of identical quantities in both
    engines — no float-summation-order hazard."""
    from neo4j_webgraph_ray.stages.selection import exact_quantiles

    path = os.path.join(sf_dir, "events.parquet")
    res, _n = exact_quantiles(
        ray.data.read_parquet(path, columns=["value"]), "value", WINSOR_PS
    )
    lo_c = np.int64(np.rint(res[WINSOR_PS[0]] * 100.0))
    hi_c = np.int64(np.rint(res[WINSOR_PS[1]] * 100.0))

    def partial(t: pa.Table) -> pd.DataFrame:
        v = t["value"].to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)  # count(value) semantics: nulls excluded
        if not ok.any():
            return pd.DataFrame(
                {"event_type": pd.Series([], dtype=object),
                 "c": pd.Series([], dtype=np.int64),
                 "n": pd.Series([], dtype=np.int64)}
            )
        cents = np.rint(v[ok] * 100.0).astype(np.int64)
        return pd.DataFrame(
            {"event_type": et[ok], "c": np.clip(cents, lo_c, hi_c),
             "n": np.ones(int(ok.sum()), np.int64)}
        ).groupby("event_type", as_index=False, sort=False).sum()

    rows = ray.data.read_parquet(
        path, columns=["event_type", "value"]
    ).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    if not len(rows):
        return pd.DataFrame(
            {"event_type": pd.Series([], dtype=object),
             "n_events": pd.Series([], dtype=np.int64),
             "win_sum": pd.Series([], dtype=np.float64),
             "win_avg": pd.Series([], dtype=np.float64)}
        )
    g = rows.groupby("event_type", as_index=False, sort=True).sum()
    n = g["n"].to_numpy(np.int64)
    c = g["c"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "event_type": g["event_type"],
            "n_events": n,
            "win_sum": c / 100.0,
            "win_avg": c.astype(np.float64) / (100.0 * n),
        }
    )


WINSORIZED_VALUE_STATS_SQL = f"""
WITH b AS (
  SELECT CAST(ROUND(quantile_disc(value, {WINSOR_PS[0]})*100) AS BIGINT) AS lo,
         CAST(ROUND(quantile_disc(value, {WINSOR_PS[1]})*100) AS BIGINT) AS hi
  FROM events)
SELECT event_type,
  CAST(count(value) AS BIGINT) AS n_events,
  CAST(SUM(greatest(least(CAST(ROUND(value*100) AS BIGINT), b.hi), b.lo))
       AS DOUBLE) / 100.0 AS win_sum,
  CAST(SUM(greatest(least(CAST(ROUND(value*100) AS BIGINT), b.hi), b.lo))
       AS DOUBLE) / (100.0 * count(value)) AS win_avg
FROM events, b
GROUP BY event_type
ORDER BY event_type
"""


#: weighted-sample size (Efraimidis–Spirakis exact-size-k)
WSAMPLE_K = 300


def q_weighted_sample(sf_dir: str) -> ray.data.Dataset:
    """Weighted sample without replacement of events, inclusion
    probability ∝ ``value`` (Efraimidis–Spirakis exponential-race
    keys; the exact-size-k counterpart of `q_mixture_sample`'s
    rate-based reweighting).  Deterministic, partition-invariant, and
    FULLY oracled — the SQL mirror reproduces the identical
    splitmix64→uniform→-ln(u)/w key and picks the same k rows."""
    from neo4j_webgraph_ray.stages.sketches import aes_weighted_sample

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "events.parquet"), columns=["event_id", "value"]
    )
    return aes_weighted_sample(ds, "event_id", "value", WSAMPLE_K).drop_columns(
        ["ekey"]
    )


def _weighted_sample_sql() -> str:
    from neo4j_webgraph_ray.stages.sketches import splitmix64_cte

    cte = splitmix64_cte(
        "(SELECT event_id, value FROM events WHERE value > 0)",
        "event_id",
        "event_id, value",
    )
    return (
        f"WITH {cte} SELECT event_id, value FROM mixd "
        f"ORDER BY -ln((CAST(skey AS DOUBLE) + 1) * pow(2.0, -64)) / value "
        f"LIMIT {WSAMPLE_K}"
    )


def _user_hour_set_op(sf_dir: str, keep_b: bool) -> ray.data.Dataset:
    """Shared INTERSECT / EXCEPT machinery over (user, hour-of-day)
    activity sets: one bucketed groupby on the pair hash where each
    whole (user, hod) group resolves its (clicked, purchased)
    membership locally.  The reference has no set operators at all
    (SURVEY §2.7 notes the absence); these are the missing algebra,
    built the shuffle way — a key's rows co-locate by hash, so
    membership is a bucket-local boolean, and only qualifying keys
    leave the bucket."""
    from neo4j_webgraph_ray.stages.core import bucketed_groupby

    path = os.path.join(sf_dir, "events.parquet")
    ds = ray.data.read_parquet(path, columns=["event_type", "user_id", "ts"])

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"].isin(["click", "purchase"])]
        out = pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(),
                "hod": df["ts"].dt.hour.to_numpy(np.int64),
                "event_type": df["event_type"].to_numpy(),
            }
        )
        return out.drop_duplicates()

    def combine(d: pd.DataFrame) -> pd.DataFrame:
        isb = d["event_type"].to_numpy() == "purchase"
        g = (
            pd.DataFrame(
                {"user_id": d["user_id"].to_numpy(),
                 "hod": d["hod"].to_numpy(), "b": isb, "a": ~isb}
            )
            .groupby(["user_id", "hod"])
            .agg(has_a=("a", "any"), has_b=("b", "any"))
        )
        keep = (g["has_a"] & g["has_b"]) if keep_b else (g["has_a"] & ~g["has_b"])
        kept = g.index[keep.to_numpy()]
        return pd.DataFrame(
            {
                "user_id": kept.get_level_values(0).to_numpy(np.int64),
                "hod": kept.get_level_values(1).to_numpy(np.int64),
            }
        )

    return bucketed_groupby(
        ds.map_batches(pre, batch_format="pandas"),
        ["user_id", "hod"], combine, num_buckets=16, local_combine=False,
    )


def q_user_hours_click_and_purchase(sf_dir: str) -> ray.data.Dataset:
    """INTERSECT of the click and purchase (user, hour-of-day) activity
    sets (§2.7 gap: the reference has union/dedup only)."""
    return _user_hour_set_op(sf_dir, keep_b=True)


def q_user_hours_click_no_purchase(sf_dir: str) -> ray.data.Dataset:
    """EXCEPT: (user, hour-of-day) slots with a click but no purchase —
    the churn/funnel anti-join, same bucket-local membership
    pipeline."""
    return _user_hour_set_op(sf_dir, keep_b=False)


USERS_INTERSECT_SQL = """
SELECT user_id, CAST(extract(hour FROM ts) AS BIGINT) AS hod
FROM events WHERE event_type = 'click'
INTERSECT
SELECT user_id, CAST(extract(hour FROM ts) AS BIGINT)
FROM events WHERE event_type = 'purchase'
"""

USERS_EXCEPT_SQL = """
SELECT user_id, CAST(extract(hour FROM ts) AS BIGINT) AS hod
FROM events WHERE event_type = 'click'
EXCEPT
SELECT user_id, CAST(extract(hour FROM ts) AS BIGINT)
FROM events WHERE event_type = 'purchase'
"""

def q_anomalous_users(sf_dir: str) -> ray.data.Dataset:
    """Per-user activity anomaly screen — the z-score outlier flag an
    abuse/quality pipeline runs over account event counts: (user_id,
    n_events, z rounded 6 dp, is_anomalous at |n−μ| > 2σ), with μ/σ
    the population moments of the per-user counts.

    Scale shape: ONE bucketed sum produces the per-user counts; the
    global moments fold from exact int64 (count, Σn, Σn²) partials
    (one row per batch), and the flag pass broadcasts two scalars.
    Both engines compute σ with the identical expression
    ``sqrt(S2/N − μ²)`` so the 6-dp z can't diverge on estimator
    choice."""
    from neo4j_webgraph_ray.stages.core import bucketed_groupby

    path = os.path.join(sf_dir, "events.parquet")
    ds = ray.data.read_parquet(path, columns=["user_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("user_id", as_index=False).agg(
            n=("user_id", "size")
        )

    def combine(d: pd.DataFrame) -> pd.DataFrame:
        return d.groupby("user_id", as_index=False)["n"].sum()

    counts = bucketed_groupby(
        ds.map_batches(partial, batch_format="pandas"),
        ["user_id"], combine, num_buckets=16,
    ).materialize()  # feeds the moment fold AND the flag pass

    def moments(d: pd.DataFrame) -> pd.DataFrame:
        n = d["n"].to_numpy(np.int64)
        return pd.DataFrame(
            [{"cnt": np.int64(len(n)), "s1": n.sum(), "s2": (n * n).sum()}]
        )

    parts = counts.map_batches(moments, batch_format="pandas").to_pandas()
    cnt = int(parts["cnt"].sum())
    if cnt == 0:
        return ray.data.from_pandas(
            pd.DataFrame(
                {"user_id": pd.Series([], dtype=np.int64),
                 "n_events": pd.Series([], dtype=np.int64),
                 "z": pd.Series([], dtype=np.float64),
                 "is_anomalous": pd.Series([], dtype=np.int64)}
            )
        )
    mu = float(parts["s1"].sum()) / cnt
    sd = float(np.sqrt(float(parts["s2"].sum()) / cnt - mu * mu))

    def flag(d: pd.DataFrame) -> pd.DataFrame:
        n = d["n"].to_numpy(np.int64)
        z = np.zeros(len(n)) if sd == 0 else np.round((n - mu) / sd, 6)
        an = np.zeros(len(n), np.int64) if sd == 0 else (
            np.abs(n - mu) > 2 * sd
        ).astype(np.int64)
        return pd.DataFrame(
            {"user_id": d["user_id"].to_numpy(np.int64),
             "n_events": n, "z": z, "is_anomalous": an}
        )

    return counts.map_batches(flag, batch_format="pandas")


ANOMALOUS_USERS_SQL = """
WITH c AS (SELECT user_id, count(*) AS n FROM events GROUP BY user_id),
m AS (SELECT count(*) AS cnt, sum(n) AS s1, sum(n * n) AS s2 FROM c),
p AS (SELECT CAST(s1 AS DOUBLE) / cnt AS mu,
             sqrt(CAST(s2 AS DOUBLE) / cnt
                  - (CAST(s1 AS DOUBLE) / cnt) * (CAST(s1 AS DOUBLE) / cnt))
                 AS sd
      FROM m)
SELECT c.user_id, CAST(c.n AS BIGINT) AS n_events,
       CASE WHEN p.sd = 0 THEN 0.0
            ELSE round((c.n - p.mu) / p.sd, 6) END AS z,
       CAST(CASE WHEN p.sd = 0 THEN FALSE
                 ELSE abs(c.n - p.mu) > 2 * p.sd END AS BIGINT)
           AS is_anomalous
FROM c, p ORDER BY c.user_id
"""


#: fixed pivot column set (sorted event types of the synthetic schema)
PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_event_type_pivot(sf_dir: str) -> pd.DataFrame:
    """Pivot: hour-of-day rows × event-type count columns (n_click …
    n_view) — the wide-table reshape every dashboard export needs.
    Distributed as per-batch crosstab partials (≤24 rows × 5 columns
    each) summed driver-side; the column set is a compile-time
    constant shared with the CASE-WHEN mirror, so the pivot is one
    streaming pass, not a shuffle."""
    path = os.path.join(sf_dir, "events.parquet")
    ds = ray.data.read_parquet(path, columns=["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        hod = df["ts"].dt.hour.astype(np.int64)
        ct = pd.crosstab(hod, df["event_type"])
        ct = ct.reindex(columns=list(PIVOT_TYPES), fill_value=0)
        ct.columns = [f"n_{c}" for c in ct.columns]
        return ct.rename_axis("hod").reset_index()

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("hod", sort=True, as_index=False).sum()
    for c in out.columns:
        out[c] = out[c].astype(np.int64)
    return out


EVENT_TYPE_PIVOT_SQL = (
    "SELECT CAST(extract(hour FROM ts) AS BIGINT) AS hod,\n"
    + ",\n".join(
        f"       sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS n_{t}"
        for t in PIVOT_TYPES
    )
    + "\nFROM events GROUP BY hod ORDER BY hod"
)

#: HLL register count for the sketch-aggregate entry: 2^11 registers
#: => ~2.3% standard error, 2 KB per (group) sketch.
APPROX_DISTINCT_LOG2M = 11


def q_approx_distinct_users(sf_dir: str) -> pd.DataFrame:
    """Approximate distinct users per event type via mergeable
    HyperLogLog sketches — the sketch the exact two-phase distinct
    (:func:`q_distinct_users`) trades against at scale: ONE narrow
    pass builds per-(batch, type) register blocks (vectorized
    max-scatter over the splitmix64 stream the HyperBall pipeline
    already uses), then a bucketed max-merge moves only
    #types × 2^:data:`APPROX_DISTINCT_LOG2M` bytes — no (type, user)
    pair ever shuffles, which is the entire point at 10^12 events.
    Deterministic (fixed hash constants) but sketch-valued, hence
    rows-only for the driver; pytest bounds it against the exact
    counts within the m-derived error."""
    from neo4j_webgraph_ray.pipelines.neighborhood import (
        _unpack_regs,
        hll_estimate,
        hll_init_registers,
    )
    from neo4j_webgraph_ray.stages.core import bucketed_groupby

    log2m = APPROX_DISTINCT_LOG2M
    m = 1 << log2m
    path = os.path.join(sf_dir, "events.parquet")
    ds = ray.data.read_parquet(path, columns=["event_type", "user_id"])

    def sketch(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].to_numpy()
        order = np.argsort(et, kind="stable")
        et = et[order]
        regs = hll_init_registers(df["user_id"].to_numpy()[order], log2m)
        starts = np.flatnonzero(np.r_[True, et[1:] != et[:-1]])
        merged = np.maximum.reduceat(regs, starts, axis=0)
        return pd.DataFrame(
            {"event_type": et[starts],
             "regs": [r.tobytes() for r in merged]}
        )

    def merge(d: pd.DataFrame) -> pd.DataFrame:
        out_t, out_r = [], []
        for t, grp in d.groupby("event_type", sort=False):
            r = _unpack_regs(grp["regs"].tolist(), m).max(axis=0)
            out_t.append(t)
            out_r.append(r.tobytes())
        return pd.DataFrame({"event_type": out_t, "regs": out_r})

    merged = bucketed_groupby(
        ds.map_batches(sketch, batch_format="pandas"),
        ["event_type"], merge, num_buckets=4,
    ).to_pandas()
    regs = _unpack_regs(merged["regs"].tolist(), m)
    est = hll_estimate(regs)
    return (
        pd.DataFrame(
            {"event_type": merged["event_type"].to_numpy(),
             "approx_users": np.round(est).astype(np.int64)}
        )
        .sort_values("event_type")
        .reset_index(drop=True)
    )


# --- graph analytics (PageRank / CC / LPA / triangles) ---------------------


def _scale_cap(floor: int = 64) -> int:
    """Upper clip for size-derived parallelism on the query surface:
    grows with the cluster (2x total CPUs, never below the
    sandbox-tuned 64) instead of pinning at a constant — on a 256-node
    cluster the contract queries would otherwise run 64-wide
    regardless of resources (VERDICT r4 #6).  The library API takes
    explicit counts; this only shapes the ``queries()`` surface."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 0))
    except Exception:
        cpus = 0
    return max(floor, 2 * cpus)


def _algo_parts(edges: ray.data.Dataset) -> int:
    """Size-aware superstep partition count (edges are materialized, so
    count() is metadata): at testdata scale per-partition actor-dispatch
    overhead dominates a 100-superstep run, so graphs under ~50 K edges
    run at the actor-backend minimum of 2 partitions; at real scale the
    count grows with the edge table, capped by cluster resources."""
    n = edges.count()
    if n < 50_000:
        return 2  # actor backend minimum
    return int(np.clip(n // 100_000 + 4, 4, _scale_cap()))


def _query_checkpoint_every(default: int = 25) -> int:
    """Checkpoint cadence for query-entry workdirs.  Query runs never
    resume, so intermediate checkpoints are pure writeback; VERDICT r4
    #4 measured that their async flushes smeared recorded bench
    timings ~2x vs quiet-host runs.  ``NWR_QUERY_CHECKPOINT_EVERY=0``
    disables intermediates entirely (the engine still writes the final
    state unconditionally — see superstep_actors.run's final-step
    fixup); any positive value overrides the per-query default."""
    v = os.environ.get("NWR_QUERY_CHECKPOINT_EVERY")
    if v is None:
        return default
    n = int(v)
    return 10**9 if n <= 0 else n


def _workdir(sf_dir: str, algo: str, fresh: bool = True) -> str:
    """Scratch dir for a query run, keyed by (algo, input dir).
    Defaults to the local temp dir (correct on this single-node
    sandbox); on a multi-node cluster set ``NWR_QUERY_WORKDIR_BASE``
    to a URI every worker can reach (``s3://bucket/scratch`` — the
    whole workdir stack is ``pyarrow.fs``-routed, VERDICT r3 #1).

    ``fresh`` (default) clears the dir so queries are self-contained;
    ``fresh=False`` keeps prior contents for intentionally-persistent
    derived state (e.g. the PQ codes index)."""
    import hashlib
    import tempfile

    from neo4j_webgraph_ray.state import fsio

    base = os.environ.get("NWR_QUERY_WORKDIR_BASE") or tempfile.gettempdir()
    tag = hashlib.sha1(sf_dir.encode()).hexdigest()[:8]
    d = fsio.join(base, "nwr_queries", f"{algo}-{tag}")
    if fresh:
        fsio.rmtree(d)
    fsio.makedirs(d)
    return d


# sentinel for "vertex had no state row" (isolated vertex): keeps the
# int64 value columns non-null through the shuffle — nullable int64
# materializes as float64 in pandas frames and would silently round
# hash-range values above 2^53 (same rule as dedup's co-group verify)
UNMATCHED_SENTINEL = np.iinfo(np.int64).min


def attach_vkeys(
    state: ray.data.Dataset,
    vertices: ray.data.Dataset,
    value_cols: list[str],
    num_buckets: int = 64,
    keep_unmatched_vertices: bool = False,
    broadcast_limit: int = 500_000,
) -> ray.data.Dataset:
    """(id → "kind:key") attachment of algorithm state to the vertex
    table, size-gated like every join on this surface: a vertex table
    at or below ``broadcast_limit`` rows is broadcast once (``ray.put``
    of a bounded dict — round 3 measured the co-group shuffle at ~2.7 s
    of pure orchestration on a 1.5 K-vertex testdata graph); above the
    limit it is a bucketed co-group join, with the vertex table never
    collected on the driver (at 10^12 turns that dict IS the
    scale-killer; the query RESULT is per-vertex and materializes by
    driver contract, the lookup need not).

    Output columns: vkey + value_cols.  With
    ``keep_unmatched_vertices`` vertices without a state row are
    emitted with their value columns set to :data:`UNMATCHED_SENTINEL`
    (typed, never null — see the sentinel note above).  Value columns
    are filled with typed zeros on the vertex side for the same reason;
    the combine is a vectorized pandas merge, no per-row Python dict."""
    if vertices.count() <= broadcast_limit:
        composed = vertices.select_columns(["id", "kind", "key"]).map_batches(
            lambda df: pd.DataFrame(
                {"id": df["id"].to_numpy(),
                 "vkey": (df["kind"] + ":" + df["key"]).to_numpy()}
            ),
            batch_format="pandas",
        )
        keys, vals = _collect_lookup_arrays(composed, "id", "vkey")
        ref = ray.put((keys, vals))

        def attach_bc(df: pd.DataFrame) -> pd.DataFrame:
            k_, v_ = ray.get(ref)
            x = df["id"].to_numpy()
            idx = np.searchsorted(k_, x)
            idx = np.minimum(idx, max(0, len(k_) - 1))
            found = (k_[idx] == x) if len(k_) else np.zeros(len(x), bool)
            out = df[value_cols].copy(deep=False)
            # same semantics as the co-group path's left merge: a state
            # id absent from the vertex table keeps a null vkey
            vk = np.full(len(x), None, dtype=object)
            vk[found] = v_[idx[found]]
            out["vkey"] = vk
            return out[["vkey", *value_cols]]

        out = state.map_batches(attach_bc, batch_format="pandas")
        if keep_unmatched_vertices:
            # state ids are bounded by the vertex count, itself under
            # the gate — collect them (typed numpy, one searchsorted
            # membership pass; no Python set over int64 ids) to emit
            # sentinel rows for isolated vertices
            seen_l = [
                b["id"].to_numpy(zero_copy_only=False)
                for b in state.select_columns(["id"]).iter_batches(
                    batch_size=65536, batch_format="pyarrow"
                )
            ]
            seen = np.sort(np.concatenate(seen_l)) if seen_l else np.empty(0, np.int64)
            if len(seen):
                pos = np.minimum(np.searchsorted(seen, keys), len(seen) - 1)
                miss_mask = seen[pos] != keys
            else:
                miss_mask = np.ones(len(keys), dtype=bool)
            if miss_mask.any():
                extra = pd.DataFrame({"vkey": vals[miss_mask]})
                for c in value_cols:
                    extra[c] = np.full(int(miss_mask.sum()), UNMATCHED_SENTINEL)
                out = out.union(ray.data.from_pandas(extra[["vkey", *value_cols]]))
        return out

    def tag_state(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["id", *value_cols]].copy(deep=False)
        out["vkey"] = ""
        out["_t"] = np.int8(0)
        return out

    def tag_vertices(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"id": df["id"].to_numpy()})
        for c in value_cols:
            out[c] = np.zeros(len(df), dtype=np.int64)
        out["vkey"] = (df["kind"] + ":" + df["key"]).to_numpy()
        out["_t"] = np.int8(1)
        return out

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        is_v = df["_t"].to_numpy() == 1
        vside = df.loc[is_v, ["id", "vkey"]]
        st = df.loc[~is_v, ["id", *value_cols]]
        out = st.merge(vside, on="id", how="left")[["vkey", *value_cols]]
        if keep_unmatched_vertices:
            lone = vside.merge(
                st[["id"]], on="id", how="left", indicator=True
            )
            lone = lone[lone["_merge"] == "left_only"]
            if len(lone):
                extra = pd.DataFrame({"vkey": lone["vkey"].to_numpy()})
                for c in value_cols:
                    extra[c] = np.full(len(lone), UNMATCHED_SENTINEL)
                out = pd.concat([out, extra], ignore_index=True)
        return out

    both = state.map_batches(tag_state, batch_format="pandas").union(
        vertices.select_columns(["id", "kind", "key"]).map_batches(
            tag_vertices, batch_format="pandas"
        )
    )
    return bucketed_groupby(
        both, ["id"], combine, num_buckets=num_buckets, local_combine=False
    )


def dense_rank_vkeys(
    vertices: ray.data.Dataset, num_buckets: int = 32
) -> ray.data.Dataset:
    """Distributed dense rank of the composite "kind:key" string over
    the vertex table: returns (id, rank, vkey) with rank = position in
    global lexicographic vkey order (0-based, contiguous).

    VERDICT r2 #1/#3: replaces the driver-side rank dict.  Exact
    two-pass range partitioning — the driver only ever holds
    ``num_buckets - 1`` boundary strings and ``num_buckets`` counts:

    1. sample vkeys, cut into ordered range buckets (sample quality
       affects only balance, never correctness);
    2. count rows per bucket (tiny groupby), prefix-sum on the driver;
    3. per bucket: local sort + offset → globally dense, ordered ranks.
    """

    def project(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "id": df["id"].to_numpy(),
                "vkey": (df["kind"] + ":" + df["key"]).to_numpy(),
            }
        )

    keyed = vertices.select_columns(["id", "kind", "key"]).map_batches(
        project, batch_format="pandas"
    )
    n = vertices.count()
    sample_frac = min(1.0, 20_000 / max(1, n))
    sample = np.sort(
        keyed.random_sample(sample_frac, seed=7)
        .select_columns(["vkey"])
        .to_pandas()["vkey"]
        .to_numpy()
    )
    # num_buckets-1 ordered cut points (deduped; fewer for tiny tables)
    cuts = np.unique(
        sample[np.linspace(0, max(0, len(sample) - 1), num_buckets + 1).astype(int)][1:-1]
    ) if len(sample) else np.array([], dtype=object)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["_rb"] = np.searchsorted(cuts, df["vkey"].to_numpy()).astype(np.int32)
        return df

    assigned = keyed.map_batches(assign, batch_format="pandas").materialize()
    counts = (
        assigned.groupby("_rb").count().to_pandas()
    )  # <= num_buckets rows on the driver — bounded by construction
    counts = counts.sort_values("_rb")
    offsets = dict(
        zip(
            counts["_rb"].to_numpy(),
            np.concatenate([[0], np.cumsum(counts["count()"].to_numpy())[:-1]]),
        )
    )

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("vkey", kind="stable")
        base = offsets[int(df["_rb"].iloc[0])]
        return pd.DataFrame(
            {
                "id": df["id"].to_numpy(),
                "rank": base + np.arange(len(df), dtype=np.int64),
                "vkey": df["vkey"].to_numpy(),
            }
        )

    return (
        assigned.groupby("_rb")
        .map_groups(rank_bucket, batch_format="pandas")
        .materialize()
    )


def _collect_lookup_arrays(
    lookup: ray.data.Dataset, lookup_key: str, lookup_val: str
) -> tuple[np.ndarray, np.ndarray]:
    """(sorted key array, aligned value array) for a broadcast lookup —
    typed numpy end to end (int64 keys stay int64, string values stay
    object), so lookups can never round hash-range ids."""
    ks, vs = [], []
    for b in lookup.select_columns([lookup_key, lookup_val]).iter_batches(
        batch_size=65536, batch_format="pandas"
    ):
        ks.append(b[lookup_key].to_numpy())
        vs.append(b[lookup_val].to_numpy())
    keys = np.concatenate(ks) if ks else np.empty(0, np.int64)
    vals = np.concatenate(vs) if vs else np.empty(0, object)
    order = np.argsort(keys, kind="stable")
    return keys[order], vals[order]


def _lookup_join(
    ds: ray.data.Dataset,
    key_col: str,
    lookup: ray.data.Dataset,
    lookup_key: str,
    lookup_val: str,
    out_col: str,
    carry_cols: list[str],
    num_buckets: int = 64,
    val_default=np.int64(0),
    carry_defaults: dict | None = None,
    broadcast_limit: int = 500_000,
    prebuilt_arrays: tuple[np.ndarray, np.ndarray] | None = None,
    keep_unmatched: bool = False,
    unmatched_value=UNMATCHED_SENTINEL,
    keep_key: bool = False,
) -> ray.data.Dataset:
    """Equi-join: attach ``lookup_val`` (renamed ``out_col``) to each
    ``ds`` row by ``key_col``; emit carry_cols + out_col (+ ``key_col``
    with ``keep_key`` — the key must NOT be listed in carry_cols, where
    the co-group path's rename would duplicate it; asserted below).
    Inner by default; with ``keep_unmatched`` data rows without a
    lookup match are kept with ``out_col = unmatched_value`` — a TYPED
    sentinel (never null: a nullable int64 materializes as float64 in
    pandas frames and silently rounds hash-range ids above 2^53, the
    same rule as attach_vkeys' UNMATCHED_SENTINEL).

    Size-gated like the engine's other joins: a lookup table at or
    below ``broadcast_limit`` rows is collected once into a broadcast
    dict (bounded driver memory by the gate itself) and the join is a
    plain vectorized ``map`` inside ``map_batches`` — chained joins
    then fuse into ONE streaming execution instead of one shuffle
    each.  Above the limit it is the side-tagged bucketed co-group of
    attach_vkeys: BOTH union sides carry the full column set with
    typed defaults (``val_default`` for ``_v`` on the data side,
    ``carry_defaults`` for carry columns on the lookup side) so a
    partial pandas concat can never coerce an absent int64 id column
    to float64 (the hash-id rounding hazard)."""
    if key_col in carry_cols:
        raise ValueError(
            f"_lookup_join: key_col {key_col!r} must not appear in "
            "carry_cols (use keep_key=True) — the co-group path's rename "
            "would duplicate the column"
        )
    cdef = carry_defaults or {}
    if prebuilt_arrays is not None or lookup.count() <= broadcast_limit:
        # prebuilt_arrays lets a caller that issues several joins
        # against the SAME lookup collect + ray.put it once
        keys, vals = prebuilt_arrays or _collect_lookup_arrays(
            lookup, lookup_key, lookup_val
        )
        if keep_unmatched:
            # the sentinel column's dtype comes from the LOOKUP values
            # (an empty lookup yields its collected dtype, never dtype
            # inference from the int sentinel — ADVICE r4: a string
            # out_col must not silently become int64).  Validate the
            # sentinel round-trips in that dtype up front.
            try:
                probe = np.full(1, unmatched_value, dtype=vals.dtype)
                ok = probe[0] == unmatched_value
            except (OverflowError, ValueError, TypeError):
                ok = False
            if not ok:
                raise ValueError(
                    f"_lookup_join: unmatched_value {unmatched_value!r} is "
                    f"not representable in lookup value dtype {vals.dtype}"
                )
        ref = ray.put((keys, vals))

        def attach_bc(df: pd.DataFrame) -> pd.DataFrame:
            k_, v_ = ray.get(ref)
            # numpy searchsorted lookup, NEVER pandas .map(dict): a
            # map with any missing key materializes a float64
            # intermediate that silently rounds int64 values above
            # 2^53 (the hash-id corruption hazard)
            x = df[key_col].to_numpy()
            idx = np.searchsorted(k_, x)
            idx = np.minimum(idx, max(0, len(k_) - 1))
            found = (k_[idx] == x) if len(k_) else np.zeros(len(x), bool)
            if keep_unmatched:
                out = df[carry_cols].copy(deep=False)
                # dtype always from the lookup values — an empty lookup
                # keeps its collected dtype (validated driver-side)
                vals = np.full(len(x), unmatched_value, dtype=v_.dtype)
                vals[found] = v_[idx[found]]
                out[out_col] = vals
                if keep_key:
                    out[key_col] = x
                return out
            out = df.loc[found, carry_cols].copy(deep=False)
            out[out_col] = v_[idx[found]]  # exact dtype, no NaN path
            if keep_key:
                out[key_col] = x[found]
            return out

        return ds.map_batches(attach_bc, batch_format="pandas")

    def tag_lookup(df: pd.DataFrame) -> pd.DataFrame:
        out = df.rename(columns={lookup_key: "_k", lookup_val: "_v"})
        for c in carry_cols:
            out[c] = cdef.get(c, np.int64(0))
        out["_t"] = np.int8(1)
        return out[["_k", *carry_cols, "_v", "_t"]]

    probe = lookup.select_columns([lookup_key, lookup_val]).map_batches(
        tag_lookup, batch_format="pandas"
    )

    def tag_data(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[key_col, *carry_cols]].rename(columns={key_col: "_k"})
        out["_v"] = val_default
        out["_t"] = np.int8(0)
        return out[["_k", *carry_cols, "_v", "_t"]]

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        is_l = df["_t"].to_numpy() == 1
        lk = df.loc[is_l, ["_k", "_v"]]
        dt = df.loc[~is_l, ["_k", *carry_cols]]
        out = dt.merge(lk, on="_k", how="inner")
        if keep_unmatched:
            # indicator anti-join + concat of fully-typed frames —
            # never a left merge whose NaN fill coerces to float64
            lone = dt.merge(lk[["_k"]], on="_k", how="left", indicator=True)
            lone = lone.loc[lone["_merge"] == "left_only", ["_k", *carry_cols]]
            if len(lone):
                lone = lone.copy()
                lone["_v"] = unmatched_value
                out = pd.concat([out, lone], ignore_index=True)
        keep = [*carry_cols, out_col] + ([key_col] if keep_key else [])
        return out.rename(columns={"_v": out_col, "_k": key_col})[keep]

    both = ds.map_batches(tag_data, batch_format="pandas").union(probe)
    return bucketed_groupby(
        both, ["_k"], combine, num_buckets=num_buckets, local_combine=False
    )


'''Engine and oracle run EXACTLY this many power-iteration steps (one
shared constant so they can never diverge).  Parity note (ADVICE r2):
two independently *converged* solvers only agree to the convergence
gap (~5e-12), which makes a 6-dp value-hash probabilistically flaky at
~1e-5 per vertex.  Two solvers computing the SAME k-th iterate differ
only by float64 summation-order noise (~1e-15 relative), pushing the
rounding-boundary flake probability to ~1e-10 per vertex — safe at any
testdata scale.  100 steps also puts the iterate within d^100 ≈ 9e-8
of the true fixpoint, so the ranks remain semantically converged.'''
PAGERANK_FIXED_STEPS = 100


def q_pagerank(sf_dir: str) -> pd.DataFrame:
    """Damped PageRank on the transcript graph (superstep harness);
    output (vkey, rank) rounded to 6 dp.

    Runs exactly :data:`PAGERANK_FIXED_STEPS` synchronous supersteps
    (tol=0 disables early convergence; an exact-0 delta is a fixpoint,
    where stopping early is identity-preserving), matching the oracle's
    unrolled iteration count step for step — see the constant's note.
    The north rule's allclose(1e-6) parity vs the single-node NumPy
    oracle is separately asserted in pytest."""
    edges, vertices = graph(sf_dir)
    state = pagerank(
        edges, _workdir(sf_dir, "pagerank"), num_partitions=_algo_parts(edges),
        tol=0.0, max_steps=PAGERANK_FIXED_STEPS,
        checkpoint_every=_query_checkpoint_every(),
    )
    # readable keys via distributed co-group (no driver-side dict over
    # the full vertex table); the result materializes by driver contract
    out = attach_vkeys(state, vertices, ["rank"]).to_pandas()
    out["rank"] = out["rank"].astype("float64").round(6)
    return out[["vkey", "rank"]].sort_values("vkey").reset_index(drop=True)


def _weighted_edges(sf_dir: str, nb: int = 8) -> ray.data.Dataset:
    """(src, dst, weight) — the PRE-dedup edge multiset's
    multiplicities over the same derivation semantics as the deduped
    edge table (one conv→tool row per tool-calling TURN; role→role per
    consecutive turn pair): weight(conv→tool) = calls of that tool in
    that conv, weight(role→role) = transition count.  Conv-bucketed
    whole-conversation groups, per-group partial counts, bucketed sum,
    hash ids last — the multiset itself never materializes."""
    t = transcripts_from_events(sf_dir).select_columns(
        ["conv_id", "turn_idx", "role", "tool"]
    )

    def per_group(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["conv_id", "turn_idx"], kind="stable")
        conv = df["conv_id"].to_numpy()
        role = df["role"].to_numpy()
        tool = df["tool"].to_numpy()
        m = pd.notna(tool)
        e1 = pd.DataFrame(
            {"sk": "conv", "s": conv[m], "dk": "tool", "d": tool[m]}
        )
        same = conv[1:] == conv[:-1] if len(conv) > 1 else np.zeros(0, bool)
        e2 = pd.DataFrame(
            {"sk": "role", "s": role[:-1][same], "dk": "role",
             "d": role[1:][same]}
        )
        e = pd.concat([e1, e2], ignore_index=True)
        if not len(e):
            return pd.DataFrame(
                {"sk": pd.Series([], dtype=object),
                 "s": pd.Series([], dtype=object),
                 "dk": pd.Series([], dtype=object),
                 "d": pd.Series([], dtype=object),
                 "weight": pd.Series([], dtype="int64")}
            )
        return e.groupby(["sk", "s", "dk", "d"], as_index=False).size().rename(
            columns={"size": "weight"}
        )

    staged = t.map_batches(
        lambda df: add_bucket_column(df, ["conv_id"], nb),
        batch_format="pandas",
    )
    parts = staged.groupby(BUCKET_COL).map_groups(
        lambda df: per_group(df.drop(columns=[BUCKET_COL])),
        batch_format="pandas",
    )
    summed = bucketed_groupby(
        parts,
        ["sk", "s", "dk", "d"],
        lambda df: df.groupby(["sk", "s", "dk", "d"], as_index=False)[
            "weight"
        ].sum(),
        num_buckets=nb,
    )

    def to_ids(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": vertex_id(df["sk"].to_numpy(), df["s"].to_numpy()),
                "dst": vertex_id(df["dk"].to_numpy(), df["d"].to_numpy()),
                "weight": df["weight"].to_numpy().astype(np.float64),
            }
        )

    return summed.map_batches(to_ids, batch_format="pandas")


def q_weighted_pagerank(sf_dir: str) -> pd.DataFrame:
    """Edge-weighted PageRank over the transcript graph's edge
    MULTIPLICITIES (conv→tool weight = per-conv call count, role→role
    weight = transition count — the multiset the deduped edge table
    collapses): rank mass splits along out-edges proportionally to
    weight; (vkey, rank) rounded to 6 dp, exactly
    :data:`PAGERANK_FIXED_STEPS` supersteps matching the unrolled
    oracle.  Exercises the engine's weighted-edge support end to end
    (weight column through prepare, weighted sum-mode scatter,
    out-weight dangling)."""
    wedges = _weighted_edges(sf_dir).materialize()
    _, vertices = graph(sf_dir)
    state = weighted_pagerank(
        wedges, _workdir(sf_dir, "wpagerank"),
        num_partitions=_algo_parts(wedges), tol=0.0,
        max_steps=PAGERANK_FIXED_STEPS,
        checkpoint_every=_query_checkpoint_every(),
    )
    out = attach_vkeys(state, vertices, ["rank"]).to_pandas()
    out["rank"] = out["rank"].astype("float64").round(6)
    return out[["vkey", "rank"]].sort_values("vkey").reset_index(drop=True)


def q_connected_components(sf_dir: str) -> pd.DataFrame:
    """Connected components; per vertex the canonical component key =
    min "kind:key" string in its component (SQL-checkable via a
    recursive min-label CTE).  Isolated vertices are their own
    component."""
    edges, vertices = graph(sf_dir)
    state = connected_components(
        edges, _workdir(sf_dir, "cc"), num_partitions=_algo_parts(edges),
        checkpoint_every=_query_checkpoint_every()
    )
    # distributed vkey attachment; keep_unmatched emits isolated
    # vertices (absent from superstep state) with the typed sentinel
    df = attach_vkeys(
        state, vertices, ["label"], keep_unmatched_vertices=True
    ).to_pandas()
    # canonicalize ON THE CONTRACT-MATERIALIZED RESULT: component
    # representative = min composite string per label; isolated
    # vertices (sentinel label) are their own component
    isolated = df["label"].to_numpy() == UNMATCHED_SENTINEL
    rep = df[~isolated].groupby("label")["vkey"].min().to_dict()
    df["component"] = np.where(isolated, df["vkey"], df["label"].map(rep))
    out = df[["vkey", "component"]]
    return out.sort_values("vkey").reset_index(drop=True)


def q_component_sizes(sf_dir: str) -> pd.DataFrame:
    """Component-size distribution: (component_size, n_components) over
    the undirected transcript graph — the giant-component profile a
    webgraph analyst reads before anything else.

    Scale shape: reuses the converged CC superstep state (same workdir
    as :func:`q_connected_components`, so back-to-back contract runs
    resume instead of re-iterating), aggregates label sizes with ONE
    bucketed groupby, then histograms the sizes via per-batch partials
    (the distinct-size space is tiny).  Isolated vertices — present in
    the vertex table but absent from edge-endpoint state — are size-1
    components counted by a pure row-count difference; per-vertex rows
    never reach the driver."""
    edges, vertices = graph(sf_dir)
    state = connected_components(
        edges, _workdir(sf_dir, "cc"), num_partitions=_algo_parts(edges),
        checkpoint_every=_query_checkpoint_every()
    )
    sizes = bucketed_groupby(
        state.map_batches(
            lambda df: pd.DataFrame(
                {"label": df["label"].to_numpy(),
                 "sz": np.ones(len(df), np.int64)}
            ),
            batch_format="pandas",
        ),
        ["label"],
        lambda df: df.groupby("label", as_index=False)["sz"].sum(),
    )
    parts = sizes.map_batches(
        # valid partial: each label appears exactly once globally after
        # the bucketed sum, so per-batch size counts add up
        lambda df: df.groupby("sz", as_index=False).agg(
            n_components=("label", "count")
        ),
        batch_format="pandas",
    ).to_pandas()
    n_isolated = int(vertices.count()) - int(state.count())
    if n_isolated:
        parts = pd.concat(
            [parts, pd.DataFrame({"sz": [np.int64(1)],
                                  "n_components": [np.int64(n_isolated)]})],
            ignore_index=True,
        )
    if not len(parts):
        return pd.DataFrame(
            {"component_size": pd.Series([], dtype=np.int64),
             "n_components": pd.Series([], dtype=np.int64)}
        )
    g = parts.groupby("sz", as_index=False, sort=True)["n_components"].sum()
    return pd.DataFrame(
        {"component_size": g["sz"].to_numpy(np.int64),
         "n_components": g["n_components"].to_numpy(np.int64)}
    )


def scc_labels(
    edges: ray.data.Dataset,
    workdir: str,
    num_partitions: int = 2,
    num_buckets: int = 8,
    max_rounds: int = 1000,
) -> ray.data.Dataset:
    """Strongly connected components by FW-BW coloring
    (Fleischer–Hendrickson–Pinar; Orzan's Pregel formulation):
    Dataset(id, label) where label is SOME member id of the SCC (the
    coloring root — callers canonicalize per group).

    Each round over the still-unassigned subgraph:

    1. *color*: forward min-label fixpoint — color(v) = min id that
       forward-reaches v.  Every color class is forward-closed, and
       the root r (color(r) = r) has its whole SCC inside class r: for
       w in SCC(r), color(w) <= r since r reaches w, and any u < r
       reaching w would also reach r (w -> r within the SCC),
       contradicting color(r) = r.
    2. *sweep*: multi-source DIRECTED BFS from all roots over the
       REVERSED same-color subgraph.  Reached vertices are backward-
       reachable from their own class root through in-class paths;
       combined with the class's forward-closure this is exactly
       SCC(root) for every root simultaneously (classes are disjoint,
       paths cannot cross classes).
    3. assign those vertices, drop every edge touching them, repeat.

    SCCs are always assigned whole (step 2 emits complete SCCs), so
    edges among unassigned vertices never lose mutual structure — a
    vertex left with no active edges is a singleton SCC and is handled
    by the caller's final unmatched join.  At least one root exists
    per round (the minimum active id), so the loop terminates in at
    most #SCC rounds; skew note: pathological chains of singleton SCCs
    peel one root per round — real webgraphs resolve in a handful of
    rounds (the giant SCC and the DAG periphery).  Root seeds are
    driver-collected (one per color class; the manifest stores a
    fingerprint, not the list)."""
    from neo4j_webgraph_ray.state import fsio

    active = edges.select_columns(["src", "dst"]).materialize()
    assigned: list[ray.data.Dataset] = []
    rnd = 0
    while active.count() > 0:
        if rnd >= max_rounds:
            raise RuntimeError(
                f"scc_labels: {max_rounds} rounds without convergence "
                f"({active.count()} edges still active)"
            )
        wd = fsio.join(workdir, f"round{rnd}")
        colors = directed_min_labels(
            active, fsio.join(wd, "fwd"), num_partitions=num_partitions,
            max_steps=10_000,
        ).materialize()
        roots = np.sort(
            colors.map_batches(
                lambda df: df.loc[
                    df["id"].to_numpy() == df["label"].to_numpy(), ["id"]
                ],
                batch_format="pandas",
            )
            .to_pandas()["id"]
            .to_numpy()
            .astype(np.int64)
        )
        # reversed same-color subgraph (color equality makes the sweep
        # class-local; reversal makes forward scatter = backward reach)
        e1 = _lookup_join(
            active, "src", colors, "id", "label", "src_c",
            carry_cols=["dst"], num_buckets=num_buckets, keep_key=True,
        )
        e2 = _lookup_join(
            e1, "dst", colors, "id", "label", "dst_c",
            carry_cols=["src", "src_c"], num_buckets=num_buckets,
            keep_key=True,
        )

        def rev_same_color(df: pd.DataFrame) -> pd.DataFrame:
            m = df["src_c"].to_numpy() == df["dst_c"].to_numpy()
            return pd.DataFrame(
                {
                    "src": df["dst"].to_numpy()[m],
                    "dst": df["src"].to_numpy()[m],
                }
            )

        rev = e2.map_batches(rev_same_color, batch_format="pandas").materialize()
        roots_ds = ray.data.from_pandas(
            pd.DataFrame({"id": roots, "label": roots})
        )
        if rev.count() > 0:
            dists = directed_bfs(
                rev, fsio.join(wd, "bwd"), roots,
                num_partitions=num_partitions, max_steps=10_000,
            )
            members = dists.map_batches(
                lambda df: df.loc[
                    df["dist"].to_numpy() < BFS_UNREACHED, ["id"]
                ],
                batch_format="pandas",
            )
            mem = _lookup_join(
                members, "id", colors, "id", "label", "label",
                carry_cols=[], num_buckets=num_buckets, keep_key=True,
            )
            # roots double as BFS seeds (dist 0): keep them only in
            # roots_ds so the union stays duplicate-free
            rref = ray.put(roots)

            def drop_roots(df: pd.DataFrame) -> pd.DataFrame:
                r = ray.get(rref)
                ids = df["id"].to_numpy()
                pos = np.minimum(np.searchsorted(r, ids), max(0, len(r) - 1))
                is_root = (
                    (r[pos] == ids) if len(r) else np.zeros(len(ids), bool)
                )
                return df.loc[~is_root]

            newly = (
                mem.map_batches(drop_roots, batch_format="pandas")
                .union(roots_ds)
                .materialize()
            )
        else:
            newly = roots_ds.materialize()
        assigned.append(newly)
        # keep only edges with BOTH endpoints still unassigned
        a1 = _lookup_join(
            active, "src", newly, "id", "label", "src_a",
            carry_cols=["dst"], keep_key=True, keep_unmatched=True,
            num_buckets=num_buckets,
        )
        a2 = _lookup_join(
            a1, "dst", newly, "id", "label", "dst_a",
            carry_cols=["src", "src_a"], keep_key=True,
            keep_unmatched=True, num_buckets=num_buckets,
        )

        def still_active(df: pd.DataFrame) -> pd.DataFrame:
            m = (df["src_a"].to_numpy() == UNMATCHED_SENTINEL) & (
                df["dst_a"].to_numpy() == UNMATCHED_SENTINEL
            )
            return pd.DataFrame(
                {
                    "src": df["src"].to_numpy()[m],
                    "dst": df["dst"].to_numpy()[m],
                }
            )

        active = a2.map_batches(still_active, batch_format="pandas").materialize()
        rnd += 1
    if assigned:
        out = assigned[0]
        for d in assigned[1:]:
            out = out.union(d)
        return out.materialize()
    return ray.data.from_pandas(
        pd.DataFrame(
            {
                "id": pd.array([], dtype="int64"),
                "label": pd.array([], dtype="int64"),
            }
        )
    )


def q_scc(sf_dir: str) -> pd.DataFrame:
    """Strongly connected components of the DIRECTED transcript graph;
    per vertex the canonical component key = min "kind:key" string in
    its SCC (mutual-reachability classes — SQL-checkable via a
    recursive reachability CTE).  Vertices not on any edge, and
    vertices whose every edge is one-directional, are their own SCC.
    The directed companion of ``connected_components`` (same output
    shape and canonicalization)."""
    edges, vertices = graph(sf_dir)
    labels = scc_labels(
        edges, _workdir(sf_dir, "scc"), num_partitions=_algo_parts(edges)
    )
    df = attach_vkeys(
        labels, vertices, ["label"], keep_unmatched_vertices=True
    ).to_pandas()
    isolated = df["label"].to_numpy() == UNMATCHED_SENTINEL
    rep = df[~isolated].groupby("label")["vkey"].min().to_dict()
    df["scc"] = np.where(isolated, df["vkey"], df["label"].map(rep))
    out = df[["vkey", "scc"]]
    return out.sort_values("vkey").reset_index(drop=True)


def _rank_remap(sf_dir: str):
    """Dense-rank remap of the edge endpoints (rank = lexicographic
    vkey position — an order an external SQL oracle can reproduce with
    plain string comparison).  Returns (edges, vertices, ranks, redges,
    jb, rb, id2rank, rank2vkey); the prebuilt lookup arrays are None
    above the broadcast gate."""
    edges, vertices = graph(sf_dir)
    # size-aware shuffle widths: at testdata scale 64-bucket co-groups
    # are pure task-orchestration overhead (the auto_buckets lesson);
    # at real scale both grow with the tables, capped by cluster size
    cap = _scale_cap()
    jb = int(np.clip(edges.count() // 100_000 + 4, 4, cap))
    rb = int(np.clip(vertices.count() // 100_000 + 4, 4, cap))
    ranks = dense_rank_vkeys(vertices, num_buckets=rb)
    # in the broadcast regime, collect each lookup direction ONCE and
    # share it across the paired joins (id->rank for both endpoints,
    # rank->vkey for vertex and community)
    small = ranks.count() <= 500_000
    id2rank = _collect_lookup_arrays(ranks, "id", "rank") if small else None
    rank2vkey = _collect_lookup_arrays(ranks, "rank", "vkey") if small else None
    # remap both endpoints rank-by-rank (two joins): (src,dst) ->
    # (dst, src_r) -> (src_r, dst_r)
    r1 = _lookup_join(
        edges.select_columns(["src", "dst"]), "src", ranks, "id", "rank",
        "src_r", carry_cols=["dst"], num_buckets=jb, prebuilt_arrays=id2rank,
    )
    r2 = _lookup_join(r1, "dst", ranks, "id", "rank", "dst_r",
                      carry_cols=["src_r"], num_buckets=jb,
                      prebuilt_arrays=id2rank)
    # pin: downstream consumes the remapped edges more than once — a
    # lazy redges would re-execute the whole remap per consumption
    redges = r2.map_batches(
        lambda df: df.rename(columns={"src_r": "src", "dst_r": "dst"}),
        batch_format="pandas",
    ).materialize()
    return edges, vertices, ranks, redges, jb, rb, id2rank, rank2vkey


def _lpa_rank_state(sf_dir: str, algo: str):
    """Shared LPA machinery for the community queries: dense-rank remap
    of edge endpoints + the converged label state, all in rank space.
    Returns (ranks, redges, state, jb, rb, id2rank, rank2vkey)."""
    edges, _, ranks, redges, jb, rb, id2rank, rank2vkey = _rank_remap(sf_dir)
    state = label_propagation(
        redges, _workdir(sf_dir, algo), num_partitions=_algo_parts(edges),
        checkpoint_every=_query_checkpoint_every()
    )
    return ranks, redges, state, jb, rb, id2rank, rank2vkey


def q_label_propagation(sf_dir: str) -> pd.DataFrame:
    """Synchronous LPA communities (vkey, community key).

    The engine tie-breaks on "min int64 label"; with hashed vertex ids
    that order is opaque to an external oracle, so this query entry
    remaps ids to the dense rank of the composite "kind:key" string —
    then min-label order IS lexicographic vkey order, which the DuckDB
    oracle reproduces with plain string comparison.

    The remap is fully distributed (VERDICT r2 #3): ranks come from
    :func:`dense_rank_vkeys` (two-pass exact range partitioning — the
    driver holds only bucket boundaries and counts), edge endpoints and
    the output labels are attached via bucketed co-group joins.  No
    ``to_pandas``/dict over the vertex table anywhere in the path; the
    final ``to_pandas`` materializes only the per-vertex RESULT, which
    the driver contract requires."""
    ranks, redges, state, jb, rb, id2rank, rank2vkey = _lpa_rank_state(
        sf_dir, "lpa"
    )
    # readable keys for vertex and community: two more rank->vkey joins
    named = _lookup_join(
        state, "id", ranks, "rank", "vkey", "vkey", carry_cols=["label"],
        val_default="", num_buckets=rb, prebuilt_arrays=rank2vkey,
    )
    out = _lookup_join(
        named, "label", ranks, "rank", "vkey", "community",
        carry_cols=["vkey"], val_default="", carry_defaults={"vkey": ""},
        num_buckets=rb, prebuilt_arrays=rank2vkey,
    ).to_pandas()
    return out[["vkey", "community"]].sort_values("vkey").reset_index(drop=True)


def q_community_graph(sf_dir: str) -> pd.DataFrame:
    """Community quotient graph: contract every vertex to its LPA
    community and count the directed edge multiset between community
    pairs (unordered; intra-community edges appear as comm_a ==
    comm_b) — the supergraph a webgraph analyst renders after
    community detection.

    Scale shape: labels attach to edge endpoints via the same
    size-gated rank joins LPA itself uses, the pair key canonicalizes
    IN RANK SPACE (dense ranks order exactly like vkey strings, so
    min/max on rank ints equals SQL least/greatest on the label
    strings), and ONE bucketed groupby sums per-batch pair partials;
    community names attach to the ≤ #communities² result, never to
    edges.  The quotient is tiny relative to the graph by
    construction."""
    from neo4j_webgraph_ray.stages.core import bucketed_groupby

    ranks, redges, state, jb, rb, id2rank, rank2vkey = _lpa_rank_state(
        sf_dir, "community_graph"
    )
    if redges.count() == 0:
        return pd.DataFrame(
            {"comm_a": pd.Series([], dtype=object),
             "comm_b": pd.Series([], dtype=object),
             "n_edges": pd.Series([], dtype=np.int64)}
        )
    lab2 = _collect_lookup_arrays(state, "id", "label") \
        if state.count() <= 500_000 else None
    j1 = _lookup_join(
        redges, "src", state, "id", "label", "sl", carry_cols=["dst"],
        num_buckets=jb, prebuilt_arrays=lab2,
    )
    j2 = _lookup_join(
        j1, "dst", state, "id", "label", "dl", carry_cols=["sl"],
        num_buckets=jb, prebuilt_arrays=lab2,
    )

    def pair_partial(df: pd.DataFrame) -> pd.DataFrame:
        sl = df["sl"].to_numpy()
        dl = df["dl"].to_numpy()
        return pd.DataFrame(
            {"ca": np.minimum(sl, dl), "cb": np.maximum(sl, dl),
             "n_edges": np.ones(len(sl), np.int64)}
        ).groupby(["ca", "cb"], as_index=False, sort=False).sum()

    pairs = bucketed_groupby(
        j2.map_batches(pair_partial, batch_format="pandas"),
        ["ca", "cb"],
        lambda df: df.groupby(["ca", "cb"], as_index=False, sort=False)[
            "n_edges"
        ].sum(),
        num_buckets=rb,
    )
    k1 = _lookup_join(
        pairs, "ca", ranks, "rank", "vkey", "comm_a",
        carry_cols=["cb", "n_edges"], val_default="",
        num_buckets=rb, prebuilt_arrays=rank2vkey,
    )
    out = _lookup_join(
        k1, "cb", ranks, "rank", "vkey", "comm_b",
        carry_cols=["comm_a", "n_edges"], val_default="",
        carry_defaults={"comm_a": ""},
        num_buckets=rb, prebuilt_arrays=rank2vkey,
    ).to_pandas()
    return out[["comm_a", "comm_b", "n_edges"]].sort_values(
        ["comm_a", "comm_b"]
    ).reset_index(drop=True)


def q_modularity(sf_dir: str) -> pd.DataFrame:
    """Newman modularity of the LPA community partition (one row:
    n_communities, modularity) — the community-quality score over the
    symmetrized edge multiset the LPA itself propagates on:
    ``Q = within_sym/m2 − Σ_c (deg_c/m2)²`` with ``m2 = 2·|edges|``
    and ``deg_c`` the symmetrized degree mass of community c.  Scoring
    the partition closes the loop on the ``label_propagation`` entry
    (communities without a quality number are unactionable).

    Scale shape: labels attach to edge endpoints via the same
    size-gated rank joins LPA already uses; the within-count folds as
    per-batch partials (one row per batch) and the per-community degree
    masses are ONE bucketed groupby over per-batch partial sums —
    driver sees #batches + #buckets rows, never an edge or vertex
    table."""
    from neo4j_webgraph_ray.stages.core import bucketed_groupby

    ranks, redges, state, jb, rb, id2rank, rank2vkey = _lpa_rank_state(
        sf_dir, "modularity"
    )
    m = redges.count()
    if m == 0:
        return pd.DataFrame(
            [{"n_communities": np.int64(0), "modularity": 0.0}]
        )
    lab2 = _collect_lookup_arrays(state, "id", "label") \
        if state.count() <= 500_000 else None
    j1 = _lookup_join(
        redges, "src", state, "id", "label", "sl", carry_cols=["dst"],
        num_buckets=jb, prebuilt_arrays=lab2,
    )
    j2 = _lookup_join(
        j1, "dst", state, "id", "label", "dl", carry_cols=["sl"],
        num_buckets=jb, prebuilt_arrays=lab2,
    )

    def within_partial(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            [{"w": np.int64((df["sl"].to_numpy() == df["dl"].to_numpy()).sum())}]
        )

    w_dir = int(
        j2.map_batches(within_partial, batch_format="pandas")
        .to_pandas()["w"].sum()
    )

    # symmetrized degree of v = #endpoint appearances in the directed
    # edge multiset; per-batch bincount partials -> bucketed sum by rank
    def deg_partial(df: pd.DataFrame) -> pd.DataFrame:
        ids = np.concatenate([df["src"].to_numpy(), df["dst"].to_numpy()])
        u, c = np.unique(ids, return_counts=True)
        return pd.DataFrame({"id": u, "deg": c.astype(np.int64)})

    def deg_combine(d: pd.DataFrame) -> pd.DataFrame:
        return d.groupby("id", as_index=False, sort=False)["deg"].sum()

    deg = bucketed_groupby(
        redges.map_batches(deg_partial, batch_format="pandas"),
        ["id"], deg_combine, num_buckets=rb,
    )
    labeled = _lookup_join(
        deg, "id", state, "id", "label", "lab", carry_cols=["deg"],
        num_buckets=rb, prebuilt_arrays=lab2,
    )

    def dc_combine(d: pd.DataFrame) -> pd.DataFrame:
        return d.groupby("lab", as_index=False, sort=False)["deg"].sum()

    dc = bucketed_groupby(labeled, ["lab"], dc_combine, num_buckets=rb)
    m2 = float(2 * m)

    def dc_partial(d: pd.DataFrame) -> pd.DataFrame:
        x = d["deg"].to_numpy().astype(np.float64) / m2
        return pd.DataFrame(
            [{"nc": np.int64(len(d)), "sq": float((x * x).sum())}]
        )

    parts = dc.map_batches(dc_partial, batch_format="pandas").to_pandas()
    n_comm = int(parts["nc"].sum()) if len(parts) else 0
    sq = float(parts["sq"].sum()) if len(parts) else 0.0
    q = (2.0 * w_dir) / m2 - sq
    return pd.DataFrame(
        [{"n_communities": np.int64(n_comm), "modularity": round(q, 6)}]
    )


def _modularity_oracle_sql(n_iter: int = 20) -> str:
    """LPA unroll (same as :func:`_lpa_oracle_sql`) + the modularity
    fold over the final labels."""
    base = _lpa_oracle_sql(n_iter)
    head, sep, _ = base.rpartition("\nSELECT ")
    assert sep and f"lp{n_iter}" in head  # final SELECT stripped, CTEs kept
    return (
        head
        + f""",
labs AS (SELECT v, lab FROM lp{n_iter}),
deg AS (SELECT s AS v, count(*) AS deg FROM sym GROUP BY s),
m2t AS (SELECT count(*) AS m2 FROM sym),
w AS (SELECT count(*) AS w FROM und
      JOIN labs a ON a.v = und.s JOIN labs b ON b.v = und.d
      WHERE a.lab = b.lab),
dc AS (SELECT lab, sum(deg) AS dc
       FROM labs JOIN deg ON deg.v = labs.v GROUP BY lab)
SELECT CAST((SELECT count(*) FROM dc) AS BIGINT) AS n_communities,
       round(2.0 * w.w / m2t.m2
             - (SELECT sum(power(CAST(dc AS DOUBLE) / mm.m2, 2))
                FROM dc, m2t AS mm), 6) AS modularity
FROM w, m2t
"""
    )


#: fixed HITS iteration budget shared engine <-> oracle (same parity
#: pattern as PAGERANK_FIXED_STEPS; 50 simultaneous block-power steps
#: is far past 6-dp convergence on the transcript graph)
HITS_FIXED_STEPS = 50


def q_hits(sf_dir: str) -> pd.DataFrame:
    """HITS hubs & authorities over the directed transcript graph:
    (vkey, hub, auth), each side L1-normalized, rounded to 6 dp.

    The superstep engine scatters in one direction, so the query runs
    :class:`~neo4j_webgraph_ray.pipelines.algorithms.HITSProgram` on the
    bipartite DOUBLED graph — per edge (u, v): (2u, 2v+1) and
    (2v+1, 2u) over DENSE vkey ranks (LPA's distributed
    ``dense_rank_vkeys`` remap; doubling raw int64 hash ids would
    overflow).  One superstep = one simultaneous HITS update (power
    iteration on [[0, E], [E^T, 0]]), run for exactly
    :data:`HITS_FIXED_STEPS` steps to match the oracle's unroll.
    Output rows = edge-endpoint vertices (PageRank's contract); a
    vertex with no out-edges has hub 0, no in-edges auth 0.

    Reference parity: the reference ranks pages by raw incoming-link
    count only (``/root/reference/README.md:103-131``); HITS is the
    canonical webgraph refinement of that surface."""
    edges, vertices = graph(sf_dir)
    cap = _scale_cap()
    jb = int(np.clip(edges.count() // 100_000 + 4, 4, cap))
    rb = int(np.clip(vertices.count() // 100_000 + 4, 4, cap))
    ranks = dense_rank_vkeys(vertices, num_buckets=rb)
    small = ranks.count() <= 500_000
    id2rank = _collect_lookup_arrays(ranks, "id", "rank") if small else None
    rank2vkey = _collect_lookup_arrays(ranks, "rank", "vkey") if small else None
    r1 = _lookup_join(
        edges.select_columns(["src", "dst"]), "src", ranks, "id", "rank",
        "src_r", carry_cols=["dst"], num_buckets=jb, prebuilt_arrays=id2rank,
    )
    r2 = _lookup_join(r1, "dst", ranks, "id", "rank", "dst_r",
                      carry_cols=["src_r"], num_buckets=jb,
                      prebuilt_arrays=id2rank)

    def double(df: pd.DataFrame) -> pd.DataFrame:
        s = df["src_r"].to_numpy().astype(np.int64)
        d = df["dst_r"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "src": np.concatenate([2 * s, 2 * d + 1]),
                "dst": np.concatenate([2 * d + 1, 2 * s]),
            }
        )

    # pin: prepare() consumes its edge input more than once
    doubled = r2.map_batches(double, batch_format="pandas").materialize()
    state = hits(
        doubled, _workdir(sf_dir, "hits"), num_partitions=_algo_parts(edges),
        tol=0.0, max_steps=HITS_FIXED_STEPS,
        checkpoint_every=_query_checkpoint_every(),
    )

    def unsplit(df: pd.DataFrame) -> pd.DataFrame:
        i = df["id"].to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                "rank": i >> 1,
                "side": (i & 1).astype(np.int8),
                "val": df["val"].to_numpy(),
            }
        )

    sided = state.map_batches(unsplit, batch_format="pandas")
    named = _lookup_join(
        sided, "rank", ranks, "rank", "vkey", "vkey",
        carry_cols=["side", "val"], val_default="", num_buckets=rb,
        prebuilt_arrays=rank2vkey,
    ).to_pandas()
    # side pivot ON THE CONTRACT-MATERIALIZED RESULT (<= 2 rows/vertex)
    hub = named.loc[named["side"] == 0].set_index("vkey")["val"]
    auth = named.loc[named["side"] == 1].set_index("vkey")["val"]
    allv = np.sort(named["vkey"].unique())
    h = hub.reindex(allv).fillna(0.0).to_numpy()
    a = auth.reindex(allv).fillna(0.0).to_numpy()
    hs, asum = float(h.sum()), float(a.sum())
    out = pd.DataFrame(
        {
            "vkey": allv,
            "hub": np.round(h / hs if hs > 0 else h, 6),
            "auth": np.round(a / asum if asum > 0 else a, 6),
        }
    )
    return out.sort_values("vkey").reset_index(drop=True)


#: fixed eigenvector-centrality iteration budget shared engine <->
#: oracle (same parity pattern as HITS_FIXED_STEPS)
EIGEN_FIXED_STEPS = 50


def q_eigenvector(sf_dir: str) -> pd.DataFrame:
    """Eigenvector centrality over the simple undirected transcript
    graph: (vkey, score), L1-normalized and rounded to 6 dp — the
    classic recursive importance measure (a vertex is central if its
    neighbors are central; the undirected ancestor of the PageRank
    entry).

    Runs :class:`~neo4j_webgraph_ray.pipelines.algorithms.
    EigenvectorProgram` (power iteration with lazy L1 normalization
    through the metrics channel) on ``undirected_simple`` edges for
    exactly :data:`EIGEN_FIXED_STEPS` steps to match the oracle's
    unroll.  Output rows = simple-graph endpoint vertices (self-loop-
    only and isolated vertices excluded, as in the oracle's edge-built
    vertex set)."""
    from neo4j_webgraph_ray.pipelines.triangles import undirected_simple

    edges, vertices = graph(sf_dir)

    def rename(df: pd.DataFrame) -> pd.DataFrame:
        return df.rename(columns={"a": "src", "b": "dst"})

    simple = (
        undirected_simple(edges, num_buckets=16)
        .map_batches(rename, batch_format="pandas")
        .materialize()  # prepare() consumes its edge input more than once
    )
    state = eigenvector(
        simple, _workdir(sf_dir, "eigenvector"),
        num_partitions=_algo_parts(edges), tol=0.0,
        max_steps=EIGEN_FIXED_STEPS,
        checkpoint_every=_query_checkpoint_every(),
    )
    named = attach_vkeys(state, vertices, ["val"]).to_pandas()
    x = named["val"].to_numpy(np.float64)
    s = float(x.sum())
    out = pd.DataFrame(
        {"vkey": named["vkey"], "score": np.round(x / s if s > 0 else x, 6)}
    )
    return out.sort_values("vkey").reset_index(drop=True)


def _eigenvector_oracle_sql(n_iter: int = EIGEN_FIXED_STEPS) -> str:
    """Fixed-iteration power iteration unrolled as chained MATERIALIZED
    CTEs, mirroring :class:`EigenvectorProgram` exactly: per step
    x' = A (x / ||x||_1) over the SIMPLE undirected graph (distinct
    least/greatest pairs, self-loops dropped, then symmetrized), with
    the L1 norm applied lazily at use.  x0 = 1 on every endpoint
    vertex; the final output normalizes by the last iterate's L1 sum.
    Both engines run the same step count, so values differ only by fp
    summation order inside the shared 6-dp rounding."""
    parts = [
        "und AS MATERIALIZED (SELECT src_kind || ':' || src_key AS s, "
        "dst_kind || ':' || dst_key AS d FROM edges)",
        "simp AS MATERIALIZED (SELECT DISTINCT least(s, d) AS a, "
        "greatest(s, d) AS b FROM und WHERE s <> d)",
        "sym AS MATERIALIZED (SELECT a AS s, b AS d FROM simp "
        "UNION ALL SELECT b, a FROM simp)",
        "x0 AS MATERIALIZED (SELECT DISTINCT s AS v, 1.0 AS x FROM sym)",
    ]
    for k in range(n_iter):
        parts.append(
            f"x{k + 1} AS MATERIALIZED (\n"
            f"  SELECT p.v, coalesce(w.m, 0.0) AS x\n"
            f"  FROM x{k} p\n"
            f"  LEFT JOIN (SELECT sym.d AS v, sum(p2.x / n.s) AS m\n"
            f"             FROM x{k} p2 JOIN sym ON sym.s = p2.v\n"
            f"             CROSS JOIN (SELECT sum(x) AS s FROM x{k}) n\n"
            f"             GROUP BY sym.d) w ON w.v = p.v)"
        )
    return (
        GRAPH_SQL_PRELUDE
        + ",\n"
        + ",\n".join(parts)
        + f"\nSELECT v AS vkey,\n"
        f"       round(coalesce(x / nullif((SELECT sum(x) FROM x{n_iter}), 0),"
        f" 0.0), 6) AS score\n"
        f"FROM x{n_iter} ORDER BY vkey"
    )


#: Katz damping + fixed iteration budget shared engine <-> oracle
#: (30 affine steps is past 6-dp convergence at α·λmax < 1, and the
#: final L1 normalization keeps the rounding robust regardless)
KATZ_ALPHA = 0.05
KATZ_FIXED_STEPS = 30


def q_katz(sf_dir: str) -> pd.DataFrame:
    """Katz centrality over the directed transcript graph: (vkey,
    score), L1-normalized and rounded to 6 dp — the damped all-walk
    in-link centrality (x' = α·Aᵀx + 1; α = :data:`KATZ_ALPHA`, run for
    exactly :data:`KATZ_FIXED_STEPS` steps to match the oracle's
    unroll).  Output rows = edge-endpoint vertices, the PageRank
    contract."""
    edges, vertices = graph(sf_dir)
    state = katz(
        edges.select_columns(["src", "dst"]),
        _workdir(sf_dir, "katz"), num_partitions=_algo_parts(edges),
        alpha=KATZ_ALPHA, tol=0.0, max_steps=KATZ_FIXED_STEPS,
        checkpoint_every=_query_checkpoint_every(),
    )
    named = attach_vkeys(state, vertices, ["val"]).to_pandas()
    x = named["val"].to_numpy(np.float64)
    s = float(x.sum())
    out = pd.DataFrame(
        {"vkey": named["vkey"], "score": np.round(x / s if s > 0 else x, 6)}
    )
    return out.sort_values("vkey").reset_index(drop=True)


def _katz_oracle_sql(
    n_iter: int = KATZ_FIXED_STEPS, alpha: float = KATZ_ALPHA
) -> str:
    """Fixed-iteration Katz unrolled as chained MATERIALIZED CTEs,
    mirroring :class:`KatzProgram` exactly: per step x' = α·Aᵀx + 1
    over the directed deduped edge table, x0 = 1 on every endpoint
    vertex, final output L1-normalized."""
    parts = [
        "und AS MATERIALIZED (SELECT src_kind || ':' || src_key AS s, "
        "dst_kind || ':' || dst_key AS d FROM edges)",
        "x0 AS MATERIALIZED (SELECT v, 1.0 AS x FROM "
        "(SELECT s AS v FROM und UNION SELECT d FROM und))",
    ]
    for k in range(n_iter):
        parts.append(
            f"x{k + 1} AS MATERIALIZED (\n"
            f"  SELECT p.v, CAST({alpha} AS DOUBLE) * coalesce(w.m, 0.0)"
            f" + 1.0 AS x\n"
            f"  FROM x{k} p\n"
            f"  LEFT JOIN (SELECT und.d AS v, sum(p2.x) AS m\n"
            f"             FROM x{k} p2 JOIN und ON und.s = p2.v\n"
            f"             GROUP BY und.d) w ON w.v = p.v)"
        )
    return (
        GRAPH_SQL_PRELUDE
        + ",\n"
        + ",\n".join(parts)
        + f"\nSELECT v AS vkey,\n"
        f"       round(coalesce(x / nullif((SELECT sum(x) FROM x{n_iter}), 0),"
        f" 0.0), 6) AS score\n"
        f"FROM x{n_iter} ORDER BY vkey"
    )


def q_mis(sf_dir: str) -> pd.DataFrame:
    """Maximal independent set of the simple undirected transcript
    graph (greedy-priority Luby rounds): (vkey, in_mis 0/1) for every
    simple-graph endpoint vertex.  Priorities are dense lexicographic
    vkey ranks (LPA's distributed remap), so "lower priority" IS plain
    string comparison and the DuckDB oracle reproduces the exact greedy
    rounds; production graphs should rank by hash instead (adversarial
    lexicographic chains cost O(n) rounds — see
    :class:`~neo4j_webgraph_ray.pipelines.algorithms.MISProgram`)."""
    from neo4j_webgraph_ray.pipelines.triangles import undirected_simple

    edges, vertices = graph(sf_dir)
    cap = _scale_cap()
    jb = int(np.clip(edges.count() // 100_000 + 4, 4, cap))
    rb = int(np.clip(vertices.count() // 100_000 + 4, 4, cap))
    ranks = dense_rank_vkeys(vertices, num_buckets=rb)
    small = ranks.count() <= 500_000
    id2rank = _collect_lookup_arrays(ranks, "id", "rank") if small else None
    rank2vkey = _collect_lookup_arrays(ranks, "rank", "vkey") if small else None
    simple = undirected_simple(edges, num_buckets=16)
    r1 = _lookup_join(
        simple, "a", ranks, "id", "rank", "src", carry_cols=["b"],
        num_buckets=jb, prebuilt_arrays=id2rank,
    )
    r2 = _lookup_join(r1, "b", ranks, "id", "rank", "dst",
                      carry_cols=["src"], num_buckets=jb,
                      prebuilt_arrays=id2rank)
    redges = r2.materialize()  # prepare() consumes it more than once
    state = mis(
        redges, _workdir(sf_dir, "mis"), num_partitions=_algo_parts(edges),
        checkpoint_every=_query_checkpoint_every(),
    )
    named = _lookup_join(
        state, "id", ranks, "rank", "vkey", "vkey", carry_cols=["status"],
        val_default="", num_buckets=rb, prebuilt_arrays=rank2vkey,
    ).to_pandas()
    named["in_mis"] = (named["status"].to_numpy() == 1).astype(np.int64)
    return named[["vkey", "in_mis"]].sort_values("vkey").reset_index(drop=True)


def q_triangle_count(sf_dir: str) -> pd.DataFrame:
    """Global triangle count of the undirected transcript graph."""
    edges, _ = graph(sf_dir)
    n = triangle_count(edges, num_buckets=16)
    return pd.DataFrame({"n_triangles": pd.array([n], dtype="int64")})


def q_clustering_coefficient(sf_dir: str) -> pd.DataFrame:
    """Local clustering coefficient over the undirected simple
    transcript graph: (vkey, tri, deg, cc) for every vertex — tri =
    triangles containing it, deg = simple degree, cc = 2·tri /
    (deg·(deg−1)) for deg ≥ 2 else 0, rounded to 6 dp like the other
    float-valued analytics.  Reference parity: per-node
    triangle/clustering metrics are the standard companion of the
    reference's degree counters (WebGraphStats-style reporting); here
    they ride the same oriented wedge/co-group pipeline as
    ``triangle_count``, so the wide steps stay bucketed hash shuffles.
    Isolated and self-loop-only vertices report (0, 0, 0)."""
    edges, vertices = graph(sf_dir)
    stats = vertex_triangles(edges, num_buckets=16).map_batches(
        lambda df: df.rename(columns={"v": "id"}), batch_format="pandas"
    )
    df = attach_vkeys(
        stats, vertices, ["tri", "deg"], keep_unmatched_vertices=True
    ).to_pandas()
    tri = df["tri"].to_numpy().astype(np.int64)
    deg = df["deg"].to_numpy().astype(np.int64)
    tri = np.where(tri == UNMATCHED_SENTINEL, np.int64(0), tri)
    deg = np.where(deg == UNMATCHED_SENTINEL, np.int64(0), deg)
    cc = np.zeros(len(df), np.float64)
    m = deg >= 2
    # identical IEEE op order to the oracle's 2.0 * tri / (deg * (deg - 1.0))
    cc[m] = 2.0 * tri[m] / (deg[m] * (deg[m] - 1.0))
    out = pd.DataFrame(
        {"vkey": df["vkey"], "tri": tri, "deg": deg, "cc": np.round(cc, 6)}
    )
    return out.sort_values("vkey").reset_index(drop=True)


#: vertex-similarity entry: result budget and the "stop-word center"
#: degree bound — common neighbors with degree above it carry almost no
#: similarity signal (a tool shared by 1 400 conversations says nothing
#: about any two of them) but cost deg² wedges each: at sf0.1 the
#: unbounded wedge count is already 10.9 M (one 1 478-degree hub alone
#: contributes 1.09 M), i.e. 10^9+ at sf1.  Both the engine and the SQL
#: oracle restrict neighborhoods to members with degree <= the bound.
VERTEX_SIM_TOP_K = 50
VERTEX_SIM_MAX_CENTER_DEG = 64


def q_vertex_similarity(sf_dir: str) -> pd.DataFrame:
    """Top-k most similar vertex pairs by common-neighbor Jaccard over
    the simple undirected transcript graph (the classic link-prediction
    scorer), with neighborhoods restricted to informative members:
    N'(v) = {u in N(v) : deg(u) <= :data:`VERTEX_SIM_MAX_CENTER_DEG`},
    jaccard = |N'(a)∩N'(b)| / (|N'(a)| + |N'(b)| - |N'(a)∩N'(b)|).
    Output the :data:`VERTEX_SIM_TOP_K` best (vkey_a, vkey_b, inter,
    jaccard), ranked by (6-dp-rounded jaccard DESC, vkey_a, vkey_b) —
    rounding BEFORE ranking in both engines so ties are identical; the
    stop-word bound is part of the operator's definition and the SQL
    oracle applies the same filter.

    Scale shape: wedge pairs are generated per center inside
    center-bucketed groups (the triangle pipeline's pattern) with every
    center's degree <= the bound by construction (so wedges <=
    bound·|E|), counted by a bucketed (x, y) groupby, filtered degrees
    attached via the size-gated lookup join, and the top-k is a
    per-block partial head-k merged driver-side (blocks×k rows — the
    pair space never materializes)."""
    from neo4j_webgraph_ray.pipelines.triangles import undirected_simple

    edges, vertices = graph(sf_dir)
    nb = 16
    und = undirected_simple(edges, num_buckets=nb)

    def adj_rows(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy()
        b = df["b"].to_numpy()
        return pd.DataFrame({"c": np.r_[a, b], "n": np.r_[b, a]})

    # consumed twice (degree table + center filter): pin
    adj = und.map_batches(adj_rows, batch_format="pandas").materialize()
    deg = bucketed_groupby(
        adj.map_batches(
            lambda df: df.assign(deg=np.int64(1)), batch_format="pandas"
        ),
        ["c"],
        lambda df: df.groupby("c", as_index=False)["deg"].sum(),
        num_buckets=nb,
    )
    # (c, n) rows whose CENTER side c is informative (deg <= bound);
    # consumed twice (filtered-degree table + wedge stage): pin
    adj2 = (
        _lookup_join(adj, "c", deg, "c", "deg", "deg_c", carry_cols=["n"],
                     num_buckets=nb, keep_key=True)
        .map_batches(
            lambda df: df.loc[
                df["deg_c"].to_numpy() <= VERTEX_SIM_MAX_CENTER_DEG,
                ["c", "n"],
            ],
            batch_format="pandas",
        )
        .materialize()
    )
    # |N'(v)| = number of v's neighbors that survived the center filter
    degp = bucketed_groupby(
        adj2.map_batches(
            lambda df: pd.DataFrame(
                {"c": df["n"].to_numpy(), "deg": np.ones(len(df), np.int64)}
            ),
            batch_format="pandas",
        ),
        ["c"],
        lambda df: df.groupby("c", as_index=False)["deg"].sum(),
        num_buckets=nb,
    )

    def wedge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["c", "n"], kind="stable")
        c = df["c"].to_numpy()
        nn = df["n"].to_numpy()
        ai, bi = pair_indices_within_groups(c)
        return pd.DataFrame(
            {"x": nn[ai], "y": nn[bi], "inter": np.ones(len(ai), np.int64)}
        )

    staged = adj2.map_batches(
        lambda df: add_bucket_column(df, ["c"], nb), batch_format="pandas"
    )
    wedges = staged.groupby(BUCKET_COL).map_groups(wedge, batch_format="pandas")
    inter = bucketed_groupby(
        wedges,
        ["x", "y"],
        lambda df: df.groupby(["x", "y"], as_index=False)["inter"].sum(),
        num_buckets=nb,
    )
    j1 = _lookup_join(inter, "x", degp, "c", "deg", "deg_x",
                      carry_cols=["y", "inter"], num_buckets=nb, keep_key=True)
    j2 = _lookup_join(j1, "y", degp, "c", "deg", "deg_y",
                      carry_cols=["x", "inter", "deg_x"], num_buckets=nb,
                      keep_key=True)
    vk = vertices.map_batches(
        lambda df: pd.DataFrame(
            {
                "id": df["id"].to_numpy(),
                "vkey": (df["kind"].astype(str) + ":" + df["key"].astype(str)),
            }
        ),
        batch_format="pandas",
    )
    j3 = _lookup_join(j2, "x", vk, "id", "vkey", "vkx",
                      carry_cols=["y", "inter", "deg_x", "deg_y"],
                      val_default="", num_buckets=nb)
    j4 = _lookup_join(j3, "y", vk, "id", "vkey", "vky",
                      carry_cols=["inter", "deg_x", "deg_y", "vkx"],
                      val_default="", num_buckets=nb)

    def score_topk(df: pd.DataFrame) -> pd.DataFrame:
        it = df["inter"].to_numpy()
        u = df["deg_x"].to_numpy() + df["deg_y"].to_numpy() - it
        jac = np.round(it.astype(np.float64) / u, 6)
        a = np.minimum(df["vkx"].to_numpy(), df["vky"].to_numpy())
        b = np.maximum(df["vkx"].to_numpy(), df["vky"].to_numpy())
        out = pd.DataFrame(
            {"vkey_a": a, "vkey_b": b, "inter": it, "jaccard": jac}
        )
        out = out.sort_values(
            ["jaccard", "vkey_a", "vkey_b"],
            ascending=[False, True, True], kind="stable",
        )
        return out.head(VERTEX_SIM_TOP_K)

    parts = j4.map_batches(score_topk, batch_format="pandas").to_pandas()
    out = parts.sort_values(
        ["jaccard", "vkey_a", "vkey_b"], ascending=[False, True, True],
        kind="stable",
    ).head(VERTEX_SIM_TOP_K)
    return out.reset_index(drop=True)


#: Adamic–Adar weights in integer micro-units: each wedge contributes
#: round(1e6 / ln(deg_center)) so the per-pair SUM is exact int64 in
#: both engines (float summation order can't break the oracle hash);
#: ln() of the same small-integer degrees is computed by libm on both
#: sides and the rounding boundary .5 is never hit for integer degrees.
AA_SCALE = 1_000_000.0


def q_adamic_adar(sf_dir: str) -> pd.DataFrame:
    """Adamic–Adar link-prediction scores over the simple undirected
    transcript graph — the frequency-weighted twin of
    :func:`q_vertex_similarity`: for every vertex pair sharing at
    least one (informative) common neighbor, AA(a, b) = Σ_{c ∈
    N(a)∩N(b)} 1/ln(deg(c)), with the same stop-word center bound
    (deg ≤ :data:`VERTEX_SIM_MAX_CENTER_DEG`) as part of the operator
    definition.  Output the :data:`VERTEX_SIM_TOP_K` best pairs
    (vkey_a, vkey_b, inter, aa) ranked by (exact integer aa DESC,
    vkey_a, vkey_b).

    Scale shape: identical to the Jaccard scorer — per-center wedge
    expansion inside center-bucketed groups (wedges ≤ bound·|E| by the
    filter), ONE bucketed (x, y) groupby summing the integer wedge
    weights, vkey attach via size-gated lookup joins, per-block
    partial top-k merged driver-side (blocks×k rows)."""
    from neo4j_webgraph_ray.pipelines.triangles import undirected_simple

    edges, vertices = graph(sf_dir)
    nb = 16
    und = undirected_simple(edges, num_buckets=nb)

    def adj_rows(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy()
        b = df["b"].to_numpy()
        return pd.DataFrame({"c": np.r_[a, b], "n": np.r_[b, a]})

    adj = und.map_batches(adj_rows, batch_format="pandas")
    deg = bucketed_groupby(
        adj.map_batches(
            lambda df: df.assign(deg=np.int64(1)), batch_format="pandas"
        ),
        ["c"],
        lambda df: df.groupby("c", as_index=False)["deg"].sum(),
        num_buckets=nb,
    )
    # centers carry their FULL degree (the AA weight basis) through
    # the informative-center filter
    adj2 = _lookup_join(
        adj, "c", deg, "c", "deg", "deg_c", carry_cols=["n"],
        num_buckets=nb, keep_key=True,
    ).map_batches(
        lambda df: df.loc[
            df["deg_c"].to_numpy() <= VERTEX_SIM_MAX_CENTER_DEG,
            ["c", "n", "deg_c"],
        ],
        batch_format="pandas",
    )

    def wedge(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["c", "n"], kind="stable")
        c = df["c"].to_numpy()
        nn = df["n"].to_numpy()
        # a wedge's center has deg >= 2 by construction (it pairs two
        # neighbors), so ln(deg) > 0 always
        w = np.rint(AA_SCALE / np.log(df["deg_c"].to_numpy())).astype(
            np.int64
        )
        ai, bi = pair_indices_within_groups(c)
        return pd.DataFrame(
            {"x": nn[ai], "y": nn[bi], "aa_u6": w[ai],
             "inter": np.ones(len(ai), np.int64)}
        )

    staged = adj2.map_batches(
        lambda df: add_bucket_column(df, ["c"], nb), batch_format="pandas"
    )
    wedges = staged.groupby(BUCKET_COL).map_groups(wedge, batch_format="pandas")
    aa = bucketed_groupby(
        wedges,
        ["x", "y"],
        lambda df: df.groupby(["x", "y"], as_index=False).agg(
            aa_u6=("aa_u6", "sum"), inter=("inter", "sum")
        ),
        num_buckets=nb,
    )
    vk = vertices.map_batches(
        lambda df: pd.DataFrame(
            {
                "id": df["id"].to_numpy(),
                "vkey": (df["kind"].astype(str) + ":" + df["key"].astype(str)),
            }
        ),
        batch_format="pandas",
    )
    j3 = _lookup_join(aa, "x", vk, "id", "vkey", "vkx",
                      carry_cols=["y", "aa_u6", "inter"],
                      val_default="", num_buckets=nb)
    j4 = _lookup_join(j3, "y", vk, "id", "vkey", "vky",
                      carry_cols=["aa_u6", "inter", "vkx"],
                      val_default="", num_buckets=nb)

    def score_topk(df: pd.DataFrame) -> pd.DataFrame:
        a = np.minimum(df["vkx"].to_numpy(), df["vky"].to_numpy())
        b = np.maximum(df["vkx"].to_numpy(), df["vky"].to_numpy())
        out = pd.DataFrame(
            {"vkey_a": a, "vkey_b": b,
             "inter": df["inter"].to_numpy(np.int64),
             "aa_u6": df["aa_u6"].to_numpy(np.int64)}
        )
        out = out.sort_values(
            ["aa_u6", "vkey_a", "vkey_b"],
            ascending=[False, True, True], kind="stable",
        )
        return out.head(VERTEX_SIM_TOP_K)

    parts = j4.map_batches(score_topk, batch_format="pandas").to_pandas()
    out = parts.sort_values(
        ["aa_u6", "vkey_a", "vkey_b"], ascending=[False, True, True],
        kind="stable",
    ).head(VERTEX_SIM_TOP_K)
    out["aa"] = out["aa_u6"].to_numpy(np.int64) / AA_SCALE
    return out[["vkey_a", "vkey_b", "inter", "aa"]].reset_index(drop=True)


#: exact-bitset neighborhood-function gate: below this many vertices the
#: exact path runs (vec_width ≤ 1 KB, pre-aggregated exchange ≤
#: P·n·vec_width ≈ 128 MB/superstep at the gate); beyond it the
#: HyperBall HLL sketch is THE path (state O(n·m), the 10^9 regime).
EXACT_NF_VERTEX_LIMIT = 8192
#: step cap shared engine <-> oracle (far above any real diameter here;
#: asserted in tests) — both sides agree even on graphs deeper than it.
NF_ORACLE_CAP = 64


def _endpoint_ids(edges: ray.data.Dataset) -> np.ndarray:
    """Sorted unique edge-endpoint vertex ids, collected driver-side.
    Callers gate on the vertex count FIRST (EXACT_NF_VERTEX_LIMIT), so
    the collect is bounded."""
    parts = []
    for b in edges.select_columns(["src", "dst"]).iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ):
        parts.append(np.unique(np.r_[b["src"].to_numpy(), b["dst"].to_numpy()]))
    if not parts:
        return np.empty(0, dtype=np.int64)
    return np.unique(np.concatenate(parts))


def q_neighborhood_function(sf_dir: str) -> pd.DataFrame:
    """Neighborhood function over the undirected transcript graph:
    (hop, nf) for hop 0..diameter, nf = number of ordered vertex pairs
    within that many hops (self-pairs included at hop 0) — the
    HyperBall-family distance-distribution analytic (Boldi–Vigna).
    Exact bitset path below EXACT_NF_VERTEX_LIMIT vertices (always, at
    driver scales); the HyperBall HLL sketch beyond."""
    edges, vertices = graph(sf_dir)
    exact_ids = (
        _endpoint_ids(edges) if vertices.count() <= EXACT_NF_VERTEX_LIMIT else None
    )
    hops, _ = ball_profile(
        edges, _workdir(sf_dir, "nf"), exact_ids=exact_ids,
        num_partitions=_algo_parts(edges), max_steps=NF_ORACLE_CAP,
    )
    if exact_ids is not None:
        hops["nf"] = hops["nf"].astype(np.int64)  # exact counts < 2^53 at the gate
    else:
        hops["nf"] = hops["nf"].round(6)
    return hops.sort_values("hop").reset_index(drop=True)


def q_effective_diameter(sf_dir: str) -> pd.DataFrame:
    """Diameter and 90% effective diameter of the undirected transcript
    graph (one row) — the HyperBall headline statistic (Boldi–Vigna,
    "Four Degrees of Separation"): the interpolated hop count t at
    which the neighborhood function reaches 90% of its final value,

        eff = (t - 1) + (0.9·nf(D) - nf(t-1)) / (nf(t) - nf(t-1)),

    t = first hop with nf(t) >= 0.9·nf(D), eff = 0 when t = 0.  Rides
    the same ``ball_profile`` superstep pipeline as
    ``neighborhood_function`` (exact bitset path at driver scales, the
    HyperBall HLL sketch beyond); the oracle mirrors the interpolation
    expression exactly, so the 6-dp values agree bit-for-bit."""
    edges, vertices = graph(sf_dir)
    exact_ids = (
        _endpoint_ids(edges) if vertices.count() <= EXACT_NF_VERTEX_LIMIT else None
    )
    hops, _ = ball_profile(
        edges, _workdir(sf_dir, "effdiam"), exact_ids=exact_ids,
        num_partitions=_algo_parts(edges), max_steps=NF_ORACLE_CAP,
    )
    hops = hops.sort_values("hop")
    nf = hops["nf"].to_numpy().astype(np.float64)
    hop = hops["hop"].to_numpy().astype(np.int64)
    diam = int(hop[-1])
    thr = 0.9 * nf[-1]
    t = int(np.searchsorted(nf, thr))  # first hop with nf >= thr
    if t == 0:
        eff = 0.0
    else:
        eff = (t - 1) + (thr - nf[t - 1]) / (nf[t] - nf[t - 1])
    return pd.DataFrame(
        [
            {
                "diameter": np.int64(diam),
                "effective_diameter": round(eff, 6),
            }
        ]
    )


def q_harmonic_centrality(sf_dir: str) -> pd.DataFrame:
    """Harmonic centrality HC(v) = Σ_{u≠v reachable} 1/d(u,v) over the
    undirected transcript graph, exact (bitset ball profile) at driver
    scales; (vkey, hc) rounded to 6 dp, isolated vertices 0.  Both the
    engine and the oracle fold the per-hop terms c_t/t in ascending-t
    order, so the float sums agree bit-for-bit."""
    edges, vertices = graph(sf_dir)
    exact_ids = (
        _endpoint_ids(edges) if vertices.count() <= EXACT_NF_VERTEX_LIMIT else None
    )
    _, state = ball_profile(
        edges, _workdir(sf_dir, "hc"), exact_ids=exact_ids,
        num_partitions=_algo_parts(edges), max_steps=NF_ORACLE_CAP,
    )
    df = attach_vkeys(
        state, vertices, ["hc"], keep_unmatched_vertices=True
    ).to_pandas()
    v = df["hc"].to_numpy().astype(np.float64)
    df["hc"] = np.round(np.where(v == float(UNMATCHED_SENTINEL), 0.0, v), 6)
    return df[["vkey", "hc"]].sort_values("vkey").reset_index(drop=True)


def q_closeness_centrality(sf_dir: str) -> pd.DataFrame:
    """Closeness centrality C(v) = (r−1) / Σ_u d(v,u) over the
    undirected transcript graph (r = reachable vertices incl. v; 0 when
    v reaches nothing), exact at driver scales via the bitset ball
    profile's sum-of-distances accumulator; (vkey, closeness) rounded
    to 6 dp, isolated vertices 0.  Both sides compute ONE float
    division over exact integer terms, so the values agree
    bit-for-bit."""
    edges, vertices = graph(sf_dir)
    exact_ids = (
        _endpoint_ids(edges) if vertices.count() <= EXACT_NF_VERTEX_LIMIT else None
    )
    _, state = ball_profile(
        edges, _workdir(sf_dir, "clo"), exact_ids=exact_ids,
        num_partitions=_algo_parts(edges), max_steps=NF_ORACLE_CAP,
    )
    mapped = state.map_batches(
        lambda df: pd.DataFrame(
            {
                "id": df["id"].to_numpy(),
                "closeness": np.where(
                    df["sd"].to_numpy() > 0,
                    (df["cnt"].to_numpy() - 1.0)
                    / np.where(df["sd"].to_numpy() > 0, df["sd"].to_numpy(), 1.0),
                    0.0,
                ),
            }
        ),
        batch_format="pandas",
    )
    df = attach_vkeys(
        mapped, vertices, ["closeness"], keep_unmatched_vertices=True
    ).to_pandas()
    v = df["closeness"].to_numpy().astype(np.float64)
    df["closeness"] = np.round(np.where(v == float(UNMATCHED_SENTINEL), 0.0, v), 6)
    return df[["vkey", "closeness"]].sort_values("vkey").reset_index(drop=True)


def q_hyperball_nf(sf_dir: str) -> pd.DataFrame:
    """HyperBall estimate of the neighborhood function — the scale path
    exercised unconditionally (128 HLL registers/vertex, ~9% per-ball
    error): (hop, nf) with nf rounded to 6 dp.  Deterministic (fixed
    splitmix64 element hash) but sketch-valued, hence rows-only for the
    driver; pytest holds it to the exact series within error bounds."""
    edges, _ = graph(sf_dir)
    hops, _ = ball_profile(
        edges, _workdir(sf_dir, "hbnf"), exact_ids=None, log2m=7,
        num_partitions=_algo_parts(edges), max_steps=NF_ORACLE_CAP,
    )
    hops["nf"] = hops["nf"].round(6)
    return hops.sort_values("hop").reset_index(drop=True)


def q_graph_summary(sf_dir: str) -> pd.DataFrame:
    """One-row whole-graph statistics over the undirected simple view:
    endpoint vertex count, simple edge count, average degree, and
    degree assortativity (Pearson correlation of endpoint degrees over
    the symmetrically-doubled edge list, Newman 2002) — the
    WebGraphStats-style reporting companion of the reference's degree
    counters.  All sums are exact int64 partials (order-independent);
    the two final float expressions mirror the oracle's op order, so
    the 6-dp values agree bit-for-bit.  int64 partials bound the exact
    range to Σdeg² < 2^63 — beyond that (10^12-edge hubs) switch the
    partials to float and drop the bit-exactness claim."""
    from neo4j_webgraph_ray.pipelines.triangles import (
        LOCAL_TRIANGLE_EDGE_LIMIT,
        undirected_with_degrees,
    )

    edges, _ = graph(sf_dir)
    # same size gate as triangle_count: below the single-worker edge
    # limit the three bucketed shuffles (simple-view dedup + two degree
    # joins) are pure fixed overhead — compute the summary in one
    # vectorized pass with IDENTICAL int64 partials + float op order
    if edges.limit(LOCAL_TRIANGLE_EDGE_LIMIT + 1).count() <= LOCAL_TRIANGLE_EDGE_LIMIT:
        src_l, dst_l = [], []
        for b in edges.select_columns(["src", "dst"]).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        ):
            src_l.append(b["src"].to_numpy())
            dst_l.append(b["dst"].to_numpy())
        src = np.concatenate(src_l) if src_l else np.empty(0, np.int64)
        dst = np.concatenate(dst_l) if dst_l else np.empty(0, np.int64)
        keep = src != dst
        a = np.minimum(src[keep], dst[keep])
        b_ = np.maximum(src[keep], dst[keep])
        und = (
            np.unique(np.stack([a, b_], axis=1), axis=0)
            if len(a)
            else np.empty((0, 2), np.int64)
        )
        verts, inv = np.unique(und.ravel(), return_inverse=True)
        degc = np.bincount(inv, minlength=len(verts)).astype(np.int64)
        e = inv.reshape(-1, 2)
        x = degc[e[:, 0]]
        y = degc[e[:, 1]]
        n_v = len(verts)
        m = len(und)
        sx = (x + y).sum(dtype=np.int64)
        sxx = (x * x + y * y).sum(dtype=np.int64)
        sxy = (2 * x * y).sum(dtype=np.int64)
        n2 = float(2 * m)
        den = n2 * float(sxx) - float(sx) * float(sx)
        assort = (n2 * float(sxy) - float(sx) * float(sx)) / den if den != 0.0 else 0.0
        avg_deg = n2 / n_v if n_v else 0.0
        return pd.DataFrame(
            [
                {
                    "n_vertices": np.int64(n_v),
                    "n_edges": np.int64(m),
                    "avg_degree": round(avg_deg, 6),
                    "assortativity": round(assort, 6),
                }
            ]
        )
    und_deg, deg = undirected_with_degrees(edges, num_buckets=16)

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        x = df["deg_a"].to_numpy()
        y = df["deg_b"].to_numpy()
        return pd.DataFrame(
            [
                {
                    "m": np.int64(len(df)),
                    "sx": (x + y).sum(dtype=np.int64),
                    "sxx": (x * x + y * y).sum(dtype=np.int64),
                    "sxy": (2 * x * y).sum(dtype=np.int64),
                }
            ]
        )

    s = und_deg.map_batches(partials, batch_format="pandas").to_pandas()
    n_v = int(deg.count())
    m = int(s["m"].sum())
    sx, sxx, sxy = (float(s[c].sum()) for c in ("sx", "sxx", "sxy"))
    n2 = float(2 * m)
    den = n2 * sxx - sx * sx
    assort = (n2 * sxy - sx * sx) / den if den != 0.0 else 0.0
    avg_deg = n2 / n_v if n_v else 0.0
    return pd.DataFrame(
        [
            {
                "n_vertices": np.int64(n_v),
                "n_edges": np.int64(m),
                "avg_degree": round(avg_deg, 6),
                "assortativity": round(assort, 6),
            }
        ]
    )


def q_reciprocity(sf_dir: str) -> pd.DataFrame:
    """Edge reciprocity of the directed transcript graph (one row:
    n_edges, n_reciprocal, reciprocity) — the classic directed-graph
    statistic: the fraction of non-loop directed edges whose reverse
    edge also exists (a mutual edge counts both of its directions in
    the numerator).  Companion of ``graph_summary``'s undirected stats
    on the reference's link model (the reference counts incoming links
    only, ``README.md:103-131``).

    Scale shape: edges are bucketed by an unordered-pair hash (the
    reverse edge lands in the SAME bucket by construction), so the
    direction match is bucket-local; each bucket emits ONE partial row
    and the driver folds #buckets rows.  Self-loops are excluded from
    both numerator and denominator."""
    edges, _ = graph(sf_dir)
    nb = int(np.clip(edges.count() // 500_000 + 4, 4, _scale_cap()))

    def stage(df: pd.DataFrame) -> pd.DataFrame:
        s = df["src"].to_numpy()
        d = df["dst"].to_numpy()
        keep = s != d
        s, d = s[keep], d[keep]
        a = np.minimum(s, d)
        b = np.maximum(s, d)
        # unordered-pair bucket (wrapping int64 mix is fine for routing)
        with np.errstate(over="ignore"):
            h = (a * np.int64(-7046029254386353131)) ^ b
        return pd.DataFrame(
            {
                "a": a,
                "b": b,
                "fwd": (s < d),
                BUCKET_COL: (h.view(np.uint64) % np.uint64(nb)).astype(np.int32),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy()
        b = df["b"].to_numpy()
        fwd = df["fwd"].to_numpy()
        order = np.lexsort((b, a))
        a, b, fwd = a[order], b[order], fwd[order]
        newg = np.r_[True, (a[1:] != a[:-1]) | (b[1:] != b[:-1])]
        starts = np.flatnonzero(newg)
        # edges are deduped upstream (J3), so each (pair, direction)
        # appears at most once: cf/cr are 0/1 per pair
        cf = np.add.reduceat(fwd.astype(np.int64), starts)
        cr = np.add.reduceat((~fwd).astype(np.int64), starts)
        both = (cf > 0) & (cr > 0)
        nrec = int((cf[both] + cr[both]).sum())
        return pd.DataFrame([{"ne": np.int64(len(a)), "nrec": np.int64(nrec)}])

    parts = (
        edges.select_columns(["src", "dst"])
        .map_batches(stage, batch_format="pandas")
        .groupby(BUCKET_COL)
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    ne = int(parts["ne"].sum()) if len(parts) else 0
    nrec = int(parts["nrec"].sum()) if len(parts) else 0
    return pd.DataFrame(
        [
            {
                "n_edges": np.int64(ne),
                "n_reciprocal": np.int64(nrec),
                "reciprocity": round(nrec / ne if ne > 0 else 0.0, 6),
            }
        ]
    )


def q_assortativity(sf_dir: str) -> pd.DataFrame:
    """Degree assortativity of the directed transcript graph (one row:
    n_edges, r_out_in, r_in_out, r_out_out, r_in_in) — the Pearson
    correlation of endpoint degrees across edges (Newman's mixing
    coefficient) in all four directed flavors: do high-degree vertices
    link to high-degree vertices?  Companion moment to ``reciprocity``
    and ``graph_summary`` over the reference's per-page degree counters
    (``README.md:103-131``, ``PageNode.java:215-227``).

    Scale shape: each vertex's (in_deg, out_deg) pair is PACKED into
    one int64 (degrees bounded by 2^31 — asserted per batch), so both
    endpoint attachments reuse the size-gated :func:`_lookup_join`
    (broadcast at ≤500 K vertices, bucketed co-group beyond); the four
    correlations then fold from per-batch moment partials (ONE row per
    batch — only the #batches-row partial frame reaches the driver).
    Moment sums accumulate in float64 (exact at int degree products
    below 2^53; the 6-dp rounding both engines apply absorbs the tail).
    Zero-variance flavors are defined as r = 0.0, mirroring the
    oracle's ``coalesce(corr(..), 0.0)``."""
    edges, vertices = graph(sf_dir)
    _LO32 = np.uint64(0xFFFFFFFF)

    def pack(df: pd.DataFrame) -> pd.DataFrame:
        i = df["in_deg"].to_numpy().astype(np.int64)
        o = df["out_deg"].to_numpy().astype(np.int64)
        assert int(i.max(initial=0)) < 2**31 and int(o.max(initial=0)) < 2**31
        packed = ((o.astype(np.uint64) << np.uint64(32))
                  | i.astype(np.uint64)).view(np.int64)
        return pd.DataFrame({"id": df["id"].to_numpy(), "packed": packed})

    deg = vertices.select_columns(["id", "in_deg", "out_deg"]).map_batches(
        pack, batch_format="pandas"
    )
    e1 = _lookup_join(
        edges.select_columns(["src", "dst"]), "src", deg, "id", "packed",
        "ps", carry_cols=["dst"],
    )
    e2 = _lookup_join(e1, "dst", deg, "id", "packed", "pd_", carry_cols=["ps"])

    FLAVORS = ("oi", "io", "oo", "ii")

    def moments(df: pd.DataFrame) -> pd.DataFrame:
        ps = df["ps"].to_numpy().view(np.uint64)
        pdn = df["pd_"].to_numpy().view(np.uint64)
        so = (ps >> np.uint64(32)).astype(np.float64)
        si = (ps & _LO32).astype(np.float64)
        do_ = (pdn >> np.uint64(32)).astype(np.float64)
        di = (pdn & _LO32).astype(np.float64)
        out = {"n": np.int64(len(df))}
        for name, x, y in (
            ("oi", so, di), ("io", si, do_), ("oo", so, do_), ("ii", si, di)
        ):
            out[f"sx_{name}"] = x.sum()
            out[f"sy_{name}"] = y.sum()
            out[f"sxx_{name}"] = (x * x).sum()
            out[f"syy_{name}"] = (y * y).sum()
            out[f"sxy_{name}"] = (x * y).sum()
        return pd.DataFrame([out])

    parts = e2.map_batches(moments, batch_format="pandas").to_pandas()
    n = int(parts["n"].sum()) if len(parts) else 0
    row: dict = {"n_edges": np.int64(n)}
    for f in FLAVORS:
        if n == 0:
            r = 0.0
        else:
            sx = float(parts[f"sx_{f}"].sum())
            sy = float(parts[f"sy_{f}"].sum())
            sxx = float(parts[f"sxx_{f}"].sum())
            syy = float(parts[f"syy_{f}"].sum())
            sxy = float(parts[f"sxy_{f}"].sum())
            vx = n * sxx - sx * sx
            vy = n * syy - sy * sy
            r = (n * sxy - sx * sy) / np.sqrt(vx * vy) if vx > 0 and vy > 0 else 0.0
        row[{"oi": "r_out_in", "io": "r_in_out",
             "oo": "r_out_out", "ii": "r_in_in"}[f]] = round(float(r), 6)
    return pd.DataFrame([row])


ASSORTATIVITY_SQL = (
    GRAPH_SQL_PRELUDE
    + """,
e AS (SELECT src_kind || ':' || src_key AS s, dst_kind || ':' || dst_key AS d
      FROM edges),
v AS (SELECT kind || ':' || key AS vk, in_deg, out_deg FROM vertices),
j AS (SELECT vs.out_deg AS so, vs.in_deg AS si,
             vd.out_deg AS dout, vd.in_deg AS di
      FROM e JOIN v vs ON e.s = vs.vk JOIN v vd ON e.d = vd.vk)
SELECT CAST(count(*) AS BIGINT) AS n_edges,
       round(coalesce(corr(CAST(so AS DOUBLE), CAST(di AS DOUBLE)), 0.0), 6)
           AS r_out_in,
       round(coalesce(corr(CAST(si AS DOUBLE), CAST(dout AS DOUBLE)), 0.0), 6)
           AS r_in_out,
       round(coalesce(corr(CAST(so AS DOUBLE), CAST(dout AS DOUBLE)), 0.0), 6)
           AS r_out_out,
       round(coalesce(corr(CAST(si AS DOUBLE), CAST(di AS DOUBLE)), 0.0), 6)
           AS r_in_in
FROM j
"""
)


#: random-walk generation: number of steps (unrolled join depth in the
#: oracle — keep small) and the two mixing constants of the per-(walk,
#: step) multiplicative hash, shared verbatim by the SQL mirror.
WALK_STEPS = 3
_WALK_A = 2654435761  # Knuth multiplicative constant
_WALK_B = 40503


def _walk_h(walk_id: np.ndarray, step: int) -> np.ndarray:
    """Deterministic per-(walk, step) uniform: the SQL-expressible
    multiplicative mix ``((walk_id % 2^31) * A + step * B) % 2^32`` —
    exact in BIGINT (max product < 2^63) and in uint64."""
    w = walk_id.astype(np.uint64) % np.uint64(2**31)
    return (
        w * np.uint64(_WALK_A) + np.uint64(step * _WALK_B)
    ) % np.uint64(2**32)


def q_random_walks(sf_dir: str, broadcast_limit: int = 500_000) -> pd.DataFrame:
    """Deterministic random walks over the UNDIRECTED transcript graph
    — the DeepWalk/node2vec corpus-generation primitive (walks are
    conventionally taken on the symmetrized view so they don't die at
    sink vertices like tools): one walk per conv vertex with out-edges,
    :data:`WALK_STEPS` steps, where the step-t successor of the current
    vertex is its distinct neighbor at rank ``h(walk, t) mod deg``
    under lexicographic vkey neighbor order.  Output (walk_id, step,
    vkey) including step 0 (the seed); an isolated vertex ends its
    walk.  Fully deterministic (no RNG), so SQL-mirrored exactly by
    :data:`WALK_STEPS` unrolled rank joins.

    Scale shape: the walk runs entirely in DENSE-RANK space (LPA's
    distributed ``dense_rank_vkeys`` remap — rank order IS
    lexicographic vkey order, so the neighbor ordering needs no string
    columns).  The direction-doubled int-pair adjacency is shuffled
    into sorted, deduped bucket blocks EXACTLY ONCE (the CSR-analog);
    each step is then one broadcast-frontier MAP PASS over those
    pinned blocks — the frontier (#walks rows, ``ray.put`` under the
    500 K gate, searchsorted per block) is all that moves between
    steps, so L steps cost 1 shuffle + L scans instead of L shuffles.
    Above the gate the frontier itself is bucket-hashed and resolved
    via a per-step co-group (the walk population at 10^9 convs is
    vertex-scale; that path shuffles #walks rows, never the
    adjacency).  The final rank→vkey attachment is the size-gated
    lookup join."""
    from neo4j_webgraph_ray.stages.core import add_bucket_column

    edges, vertices, ranks, redges, jb, rb, id2rank, rank2vkey = _rank_remap(
        sf_dir
    )
    nb = _algo_parts(edges)

    def symmetrize(df: pd.DataFrame) -> pd.DataFrame:
        s = df["src"].to_numpy()
        d = df["dst"].to_numpy()
        out = pd.DataFrame(
            {"src": np.concatenate([s, d]), "dst": np.concatenate([d, s])}
        )
        return add_bucket_column(out, ["src"], nb)

    def sort_bucket(df: pd.DataFrame) -> pd.DataFrame:
        src = df["src"].to_numpy()
        dst = df["dst"].to_numpy()
        order = np.lexsort((dst, src))
        src, dst = src[order], dst[order]
        # reciprocal directed edges collapse to ONE undirected
        # neighbor: drop consecutive duplicates (bucket-local is
        # global — all rows of a src share its bucket); dst-rank
        # order == lexicographic vkey order by the dense remap
        uniq = np.r_[True, (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])]
        src, dst = src[uniq], dst[uniq]
        # annotate every row with its neighbor rank + the src degree,
        # so a later block split can NEVER corrupt resolution (each
        # row is self-describing; contiguity is only an optimization)
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        counts = np.diff(np.r_[starts, len(src)])
        grp = np.cumsum(np.r_[False, src[1:] != src[:-1]])
        rnk = np.arange(len(src), dtype=np.int64) - starts[grp]
        return pd.DataFrame(
            {"src": src, "dst": dst, "rnk": rnk,
             "deg": counts[grp].astype(np.int64)}
        )

    # CSR-analog: ONE shuffle pins the adjacency as sorted, deduped,
    # src-complete bucket blocks; every step scans them in place
    adj_sorted = (
        redges.map_batches(symmetrize, batch_format="pandas")
        .groupby(BUCKET_COL)
        .map_groups(
            lambda df: sort_bucket(df.drop(columns=[BUCKET_COL])),
            batch_format="pandas",
        )
        .materialize()
    )

    def seed_batch(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["kind"] == "conv") & (df["out_deg"].to_numpy() > 0)]
        return pd.DataFrame(
            {
                "walk_id": df["key"].str.slice(1).to_numpy(np.int64)
                if len(df) else np.empty(0, np.int64),
                "id": df["id"].to_numpy(),
            }
        )

    seeds = vertices.select_columns(["id", "kind", "key", "out_deg"]).map_batches(
        seed_batch, batch_format="pandas"
    )
    frontier = _lookup_join(
        seeds, "id", ranks, "id", "rank", "cur", carry_cols=["walk_id"],
        num_buckets=rb, prebuilt_arrays=id2rank,
    )

    def resolve_against(
        batch: pd.DataFrame, cur: np.ndarray, wid: np.ndarray, step: int
    ) -> pd.DataFrame:
        """Resolve the walkers whose step-target row lives in this
        (src, rnk)-sorted adjacency slice.  Rows are self-describing
        (rnk, deg), so a slice holding only part of a src's run emits
        exactly the walkers whose TARGET rank falls inside it — blocks
        can split a run without corrupting resolution."""
        src = batch["src"].to_numpy()
        dst = batch["dst"].to_numpy()
        rnk = batch["rnk"].to_numpy()
        deg = batch["deg"].to_numpy()
        if not len(src) or not len(cur):
            return pd.DataFrame(
                {"walk_id": pd.Series([], dtype=np.int64),
                 "cur": pd.Series([], dtype=np.int64)}
            )
        pos = np.searchsorted(src, cur)
        pos = np.minimum(pos, len(src) - 1)
        found = src[pos] == cur
        pos, w, c = pos[found], wid[found], cur[found]
        target = (_walk_h(w, step) % deg[pos].astype(np.uint64)).astype(np.int64)
        # rows of c in this slice start at pos with rank rnk[pos]
        idx = pos + (target - rnk[pos])
        ok = (idx >= 0) & (idx < len(src))
        idx_c = np.clip(idx, 0, len(src) - 1)
        ok &= (src[idx_c] == c) & (rnk[idx_c] == target)
        return pd.DataFrame(
            {"walk_id": w[ok], "cur": dst[idx_c[ok]]}
        )

    outputs = [
        frontier.map_batches(
            lambda df: pd.DataFrame(
                {"rank": df["cur"].to_numpy(),
                 "walk_id": df["walk_id"].to_numpy(),
                 "step": np.zeros(len(df), np.int64)}
            ),
            batch_format="pandas",
        )
    ]
    small = frontier.count() <= broadcast_limit
    fr = frontier.to_pandas() if small else None
    for t in range(1, WALK_STEPS + 1):
        if small:
            # broadcast regime: the frontier rides to every adjacency
            # block; blocks emit only their resolved walkers
            ref = ray.put(
                (fr["cur"].to_numpy(np.int64), fr["walk_id"].to_numpy(np.int64))
            )

            def step_map(batch: pd.DataFrame, step: int = t, r=ref) -> pd.DataFrame:
                cur, wid = ray.get(r)
                return resolve_against(batch, cur, wid, step)

            fr = adj_sorted.map_batches(step_map, batch_format="pandas").to_pandas()
            out_t = pd.DataFrame(
                {"rank": fr["cur"].to_numpy(np.int64),
                 "walk_id": fr["walk_id"].to_numpy(np.int64),
                 "step": np.full(len(fr), t, np.int64)}
            )
            outputs.append(ray.data.from_pandas(out_t))
            if not len(fr):
                break
        else:
            # co-group regime: hash ONLY the frontier to the adjacency
            # buckets and resolve bucket-locally; the annotated rows
            # make the in-bucket re-sort a plain (src, rnk) lexsort

            def resolve_group(df: pd.DataFrame, step: int = t) -> pd.DataFrame:
                is_adj = df["_t"].to_numpy() == 1
                a = df.loc[is_adj]
                f = df.loc[~is_adj]
                order = np.lexsort((a["rnk"].to_numpy(), a["src"].to_numpy()))
                blk = pd.DataFrame(
                    {
                        "src": a["src"].to_numpy()[order],
                        "dst": a["dst"].to_numpy()[order],
                        "rnk": a["rnk"].to_numpy()[order],
                        "deg": a["deg"].to_numpy()[order],
                    }
                )
                return resolve_against(
                    blk, f["src"].to_numpy(), f["walk_id"].to_numpy(), step
                )

            def tag_adj(df: pd.DataFrame) -> pd.DataFrame:
                out = df[["src", "dst", "rnk", "deg"]].copy(deep=False)
                out["walk_id"] = np.int64(0)
                out["_t"] = np.int8(1)
                return add_bucket_column(out, ["src"], nb)

            def tag_f2(df: pd.DataFrame) -> pd.DataFrame:
                out = pd.DataFrame(
                    {
                        "src": df["cur"].to_numpy(),
                        "dst": np.int64(0),
                        "rnk": np.int64(0),
                        "deg": np.int64(0),
                        "walk_id": df["walk_id"].to_numpy(),
                    }
                )
                out["_t"] = np.int8(0)
                return add_bucket_column(out, ["src"], nb)

            both = frontier.map_batches(tag_f2, batch_format="pandas").union(
                adj_sorted.map_batches(tag_adj, batch_format="pandas")
            )
            frontier = (
                both.groupby(BUCKET_COL)
                .map_groups(
                    lambda df, step=t: resolve_group(
                        df.drop(columns=[BUCKET_COL]), step
                    ),
                    batch_format="pandas",
                )
                .materialize()
            )
            outputs.append(
                frontier.map_batches(
                    lambda df, step=t: pd.DataFrame(
                        {"rank": df["cur"].to_numpy(),
                         "walk_id": df["walk_id"].to_numpy(),
                         "step": np.full(len(df), step, np.int64)}
                    ),
                    batch_format="pandas",
                )
            )

    walks = outputs[0]
    for o in outputs[1:]:
        walks = walks.union(o)
    out = _lookup_join(
        walks, "rank", ranks, "rank", "vkey", "vkey",
        carry_cols=["walk_id", "step"], val_default="",
        num_buckets=rb, prebuilt_arrays=rank2vkey,
    ).to_pandas()
    return (
        out[["walk_id", "step", "vkey"]]
        .sort_values(["walk_id", "step"])
        .reset_index(drop=True)
    )


def _walks_sql() -> str:
    """Unrolled rank-join mirror of :func:`q_random_walks`."""
    steps = []
    prev = "seeds"
    for t in range(1, WALK_STEPS + 1):
        steps.append(
            f"s{t} AS (SELECT w.walk_id, a.d AS cur\n"
            f"    FROM {prev} w JOIN adj a ON a.s = w.cur AND a.rnk =\n"
            f"      ((w.walk_id % 2147483648) * {_WALK_A} + {t} * {_WALK_B})\n"
            f"        % 4294967296 % a.deg)"
        )
        prev = f"s{t}"
    emits = ["SELECT walk_id, 0 AS step, cur AS vkey FROM seeds"] + [
        f"SELECT walk_id, {t}, cur FROM s{t}" for t in range(1, WALK_STEPS + 1)
    ]
    return (
        GRAPH_SQL_PRELUDE
        + """,
sym AS (SELECT DISTINCT s, d FROM (
    SELECT src_kind || ':' || src_key AS s,
           dst_kind || ':' || dst_key AS d FROM edges
    UNION ALL
    SELECT dst_kind || ':' || dst_key, src_kind || ':' || src_key FROM edges)),
adj AS (SELECT s, d,
               row_number() OVER (PARTITION BY s ORDER BY d) - 1 AS rnk,
               count(*) OVER (PARTITION BY s) AS deg
        FROM sym),
seeds AS (SELECT CAST(substr(key, 2) AS BIGINT) AS walk_id,
                 'conv:' || key AS cur
          FROM vertices WHERE kind = 'conv' AND out_deg > 0),
"""
        + ",\n".join(steps)
        + "\n"
        + "\nUNION ALL ".join(emits)
        + "\nORDER BY walk_id, step"
    )


def _seed_vkeys(sf_dir: str) -> pd.DataFrame:
    """Deterministic seed vertices for the seeded analytics entries:
    the lexicographically smallest key per kind among edge-endpoint
    (degree > 0) vertices.  Per-batch partial min + a #kinds-row driver
    merge — the vertex table itself never leaves the cluster."""
    _, vertices = graph(sf_dir)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["in_deg"].to_numpy() + df["out_deg"].to_numpy()) > 0]
        if not len(df):
            return pd.DataFrame(
                {"kind": pd.Series([], dtype=object),
                 "key": pd.Series([], dtype=object)}
            )
        return df.groupby("kind", as_index=False)["key"].min()

    parts = vertices.map_batches(part, batch_format="pandas").to_pandas()
    return parts.groupby("kind", as_index=False)["key"].min()


def q_personalized_pagerank(sf_dir: str) -> pd.DataFrame:
    """Personalized PageRank: teleport to the per-kind min-key seed
    vertices (3 seeds), :data:`PAGERANK_FIXED_STEPS` synchronous
    supersteps matching the unrolled oracle step for step; output
    (vkey, rank) rounded to 6 dp."""
    seeds = _seed_vkeys(sf_dir)
    seed_ids = vertex_id(seeds["kind"].to_numpy(), seeds["key"].to_numpy())
    edges, vertices = graph(sf_dir)
    state = personalized_pagerank(
        edges, _workdir(sf_dir, "ppr"), seed_ids,
        num_partitions=_algo_parts(edges), tol=0.0,
        max_steps=PAGERANK_FIXED_STEPS,
        checkpoint_every=_query_checkpoint_every(),
    )
    out = attach_vkeys(state, vertices, ["rank"]).to_pandas()
    out["rank"] = out["rank"].astype("float64").round(6)
    return out[["vkey", "rank"]].sort_values("vkey").reset_index(drop=True)


#: sampled-betweenness source count for the contract entry (one vecsum
#: lane per source — ONE forward + ONE backward superstep run total)
BETWEENNESS_SOURCES = 8


def _min_vkeys(sf_dir: str, k: int) -> pd.DataFrame:
    """The k lexicographically smallest "kind:key" vertices among
    edge-endpoint (degree > 0) vertices — deterministic source sample
    for the betweenness entry.  Per-batch partial top-k + a k×#blocks-
    row driver merge; the vertex table never leaves the cluster."""
    _, vertices = graph(sf_dir)

    def part(df: pd.DataFrame) -> pd.DataFrame:
        df = df[(df["in_deg"].to_numpy() + df["out_deg"].to_numpy()) > 0]
        if not len(df):
            return pd.DataFrame(
                {"kind": pd.Series([], dtype=object),
                 "key": pd.Series([], dtype=object)}
            )
        vk = (df["kind"].astype(str) + ":" + df["key"].astype(str)).to_numpy()
        return df.iloc[np.argsort(vk)[:k]][["kind", "key"]]

    parts = vertices.map_batches(part, batch_format="pandas").to_pandas()
    vk = (parts["kind"] + ":" + parts["key"]).to_numpy()
    return parts.iloc[np.argsort(vk)[:k]].reset_index(drop=True)


def q_betweenness(sf_dir: str) -> pd.DataFrame:
    """Sampled betweenness centrality (Brandes 2001 / Brandes–Pich
    estimator) over the simple undirected transcript graph: (vkey, bc)
    with bc = (n/k)·Σ_s δ_s(v) / 2 over k =
    :data:`BETWEENNESS_SOURCES` deterministic sources (the k smallest
    vkeys with degree > 0), rounded to 6 dp.

    All k sources run as float64 vecsum lanes in ONE forward
    (σ-counting BFS) + ONE backward (level-synchronized δ fold)
    superstep run — the edge set is partitioned twice total, never per
    source.  No SQL oracle (per-source dependency accumulation is not
    expressible in the driver's single-statement DuckDB harness); the
    pytest oracle asserts exact equality against a reference Brandes
    on the same sampled sources, and exactness when seeds = all
    vertices."""
    seeds_df = _min_vkeys(sf_dir, BETWEENNESS_SOURCES)
    seed_ids = vertex_id(
        seeds_df["kind"].to_numpy(), seeds_df["key"].to_numpy()
    )
    edges, vertices = graph(sf_dir)
    deps = betweenness_dependencies(
        edges, _workdir(sf_dir, "betweenness"), seed_ids,
        num_partitions=_algo_parts(edges),
    )
    out = attach_vkeys(deps, vertices, ["dep"]).to_pandas()
    n, k = len(out), max(1, len(seed_ids))
    out["bc"] = np.round(
        out["dep"].to_numpy().astype(np.float64) * (n / k) / 2.0, 6
    )
    return out[["vkey", "bc"]].sort_values("vkey").reset_index(drop=True)


def q_bfs_distance(sf_dir: str) -> pd.DataFrame:
    """Single-source undirected hop distance from the global min-vkey
    edge-endpoint seed; unreachable and isolated vertices report -1.
    The engine converges at the graph's eccentricity from the seed;
    the oracle is an exact recursive-CTE BFS with the same step cap."""
    edges, vertices = graph(sf_dir)
    seeds = _seed_vkeys(sf_dir)
    comp = (seeds["kind"] + ":" + seeds["key"]).to_numpy()
    i = int(np.argmin(comp))
    seed_ids = vertex_id(
        str(seeds["kind"].iloc[i]), str(seeds["key"].iloc[i])
    )
    state = bfs_distances(
        edges, _workdir(sf_dir, "bfs"), seed_ids,
        num_partitions=_algo_parts(edges), max_steps=BFS_ORACLE_CAP,
        checkpoint_every=_query_checkpoint_every(),
    )
    df = attach_vkeys(
        state, vertices, ["dist"], keep_unmatched_vertices=True
    ).to_pandas()
    d = df["dist"].to_numpy().astype(np.int64)
    df["dist"] = np.where(
        (d == UNMATCHED_SENTINEL) | (d >= int(BFS_UNREACHED)),
        np.int64(-1), d,
    )
    return df[["vkey", "dist"]].sort_values("vkey").reset_index(drop=True)


def _bipartite_parity(sf_dir: str):
    """Shared pipeline of the two bipartiteness entries: rank-relabel
    the simple undirected graph (dense vkey ranks, so component minima
    are SQL-comparable min vkeys), run superstep CC to find each
    component's min-rank vertex, then ONE multi-source BFS from all
    component minima at once — side = hop parity.  Two superstep runs
    total regardless of component count.

    Returns (redges, ranks, rb, state(id=rank, dist)).  The seed fold
    collects one row per COMPONENT on the driver (bounded by the
    component count, not the vertex count — the same driver-residency
    class as PPR's per-kind seed table; a 10^12-edge crawl graph has
    few giant components, and a pathological all-isolated-pairs input
    degrades to the vertex count only when the answer itself is that
    large)."""
    from neo4j_webgraph_ray.pipelines.triangles import undirected_simple

    edges, vertices = graph(sf_dir)
    cap = _scale_cap()
    jb = int(np.clip(edges.count() // 100_000 + 4, 4, cap))
    rb = int(np.clip(vertices.count() // 100_000 + 4, 4, cap))
    ranks = dense_rank_vkeys(vertices, num_buckets=rb)
    small = ranks.count() <= 500_000
    id2rank = _collect_lookup_arrays(ranks, "id", "rank") if small else None
    simple = undirected_simple(edges, num_buckets=16)
    r1 = _lookup_join(
        simple, "a", ranks, "id", "rank", "src", carry_cols=["b"],
        num_buckets=jb, prebuilt_arrays=id2rank,
    )
    r2 = _lookup_join(r1, "b", ranks, "id", "rank", "dst",
                      carry_cols=["src"], num_buckets=jb,
                      prebuilt_arrays=id2rank)
    redges = r2.materialize()  # prepare() consumes it more than once
    labels = connected_components(
        redges, _workdir(sf_dir, "bip_cc"),
        num_partitions=_algo_parts(edges),
        checkpoint_every=_query_checkpoint_every(),
    )
    seeds = np.sort(
        labels.map_batches(
            lambda df: df[["label"]].drop_duplicates(), batch_format="pandas"
        ).to_pandas()["label"].unique()
    ).astype(np.int64)
    state = bfs_distances(
        redges, _workdir(sf_dir, "bip_bfs"), seeds,
        num_partitions=_algo_parts(edges), max_steps=BFS_ORACLE_CAP,
        checkpoint_every=_query_checkpoint_every(),
    )
    return redges, ranks, rb, state


def _parity_sides(state: ray.data.Dataset) -> ray.data.Dataset:
    def par(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"rank": df["id"].to_numpy().astype(np.int64),
             "side": df["dist"].to_numpy().astype(np.int64) % 2}
        )

    return state.map_batches(par, batch_format="pandas")


def q_bipartite_sides(sf_dir: str) -> pd.DataFrame:
    """Two-coloring attempt of the simple undirected transcript graph:
    (vkey, side) with side = parity of the hop distance from the
    vertex's component minimum (min vkey — the deterministic seed both
    engines share).  On a bipartite component the two sides ARE the
    bipartition; `bipartite_check` counts the same-side edges that
    certify non-bipartiteness.  The conv→tool / role-role transcript
    graph is bipartite-ish by construction, making this the natural
    structural check of the reference's two-kind data model
    (`/root/reference/README.md:60-69`)."""
    _, ranks, rb, state = _bipartite_parity(sf_dir)
    small = ranks.count() <= 500_000
    rank2vkey = _collect_lookup_arrays(ranks, "rank", "vkey") if small else None
    named = _lookup_join(
        _parity_sides(state), "rank", ranks, "rank", "vkey", "vkey",
        carry_cols=["side"], val_default="", num_buckets=rb,
        prebuilt_arrays=rank2vkey,
    ).to_pandas()
    return (
        named[["vkey", "side"]].sort_values("vkey").reset_index(drop=True)
    )


def q_bipartite_check(sf_dir: str) -> pd.DataFrame:
    """Bipartiteness certificate over the simple undirected transcript
    graph: one row (n_conflicts, is_bipartite) — n_conflicts = simple
    edges whose endpoints land on the SAME parity side (each unordered
    edge counted once), is_bipartite = 1 iff none do.  Conflict
    counting is a per-block partial after two size-gated side
    attachments; only one int per block reaches the driver."""
    redges, _, _, state = _bipartite_parity(sf_dir)
    sided = _parity_sides(state)
    j1 = _lookup_join(
        redges, "src", sided, "rank", "side", "side_a", carry_cols=["dst"]
    )
    j2 = _lookup_join(
        j1, "dst", sided, "rank", "side", "side_b", carry_cols=["side_a"]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = int((df["side_a"].to_numpy() == df["side_b"].to_numpy()).sum())
        return pd.DataFrame({"c": pd.array([c], dtype="int64")})

    n = int(
        j2.map_batches(partial, batch_format="pandas").to_pandas()["c"].sum()
    )
    return pd.DataFrame(
        {
            "n_conflicts": pd.array([n], dtype="int64"),
            "is_bipartite": pd.array([1 if n == 0 else 0], dtype="int64"),
        }
    )


#: Borůvka round budget shared by the engine loop and the unrolled SQL
#: oracle: components at least halve per round, so 12 covers 2^12
#: vertices per component — far beyond the correctness-scale graphs
#: (the engine raises if an input ever needs more; extra SQL rounds are
#: fixpoint no-ops)
MSF_ORACLE_ROUNDS = 12


def q_min_spanning_forest(sf_dir: str) -> pd.DataFrame:
    """Minimum spanning forest of the weighted transcript graph
    (weights = PRE-dedup edge multiplicities summed over both
    directions — the same multiset ``weighted_pagerank``/``weighted_sssp``
    use), as (vkey_a, vkey_b, weight) rows with vkey_a < vkey_b.

    Runs distributed Borůvka (:mod:`neo4j_webgraph_ray.pipelines.msf`)
    in dense-rank space so the ``(w, a, b)`` tie-break order equals the
    oracle's ``(w, vkey_a, vkey_b)`` string order — with ties perturbed
    into a total order the forest is UNIQUE, which is what makes an
    edge-for-edge SQL comparison meaningful.  Each round: O(E) relabel
    joins, one algebraic argmin shuffle, and a superstep CC contraction
    of a merge graph that at least halves every round."""
    from neo4j_webgraph_ray.pipelines.msf import minimum_spanning_forest

    edges, vertices = graph(sf_dir)
    cap = _scale_cap()
    rb = int(np.clip(vertices.count() // 100_000 + 4, 4, cap))
    ranks = dense_rank_vkeys(vertices, num_buckets=rb)
    small = ranks.count() <= 500_000
    id2rank = _collect_lookup_arrays(ranks, "id", "rank") if small else None
    w = _weighted_edges(sf_dir)
    j1 = _lookup_join(
        w, "src", ranks, "id", "rank", out_col="ra",
        carry_cols=["dst", "weight"], num_buckets=rb,
        prebuilt_arrays=id2rank,
    )
    j2 = _lookup_join(
        j1, "dst", ranks, "id", "rank", out_col="rb",
        carry_cols=["ra", "weight"], num_buckets=rb,
        prebuilt_arrays=id2rank,
    )

    def canon(df: pd.DataFrame) -> pd.DataFrame:
        ra = df["ra"].to_numpy(np.int64)
        rbv = df["rb"].to_numpy(np.int64)
        m = ra != rbv
        return pd.DataFrame(
            {
                "a": np.minimum(ra[m], rbv[m]),
                "b": np.maximum(ra[m], rbv[m]),
                # multiplicity counts: float64-exact far past any corpus
                "w": np.rint(df["weight"].to_numpy()[m]).astype(np.int64),
            }
        )

    base = bucketed_groupby(
        j2.map_batches(canon, batch_format="pandas"),
        ["a", "b"],
        lambda df: df.groupby(["a", "b"], as_index=False, sort=False)["w"].sum(),
        num_buckets=rb,
    )
    verts = ranks.map_batches(
        lambda df: pd.DataFrame({"v": df["rank"].to_numpy(np.int64)}),
        batch_format="pandas",
    )
    forest = minimum_spanning_forest(
        base, verts, _workdir(sf_dir, "msf"),
        num_partitions=_algo_parts(edges), max_rounds=MSF_ORACLE_ROUNDS,
        num_buckets=rb, checkpoint_every=_query_checkpoint_every(),
    )
    rank2vkey = _collect_lookup_arrays(ranks, "rank", "vkey") if small else None
    n1 = _lookup_join(
        forest, "a", ranks, "rank", "vkey", out_col="vkey_a",
        carry_cols=["b", "w"], val_default="", num_buckets=rb,
        prebuilt_arrays=rank2vkey,
    )
    n2 = _lookup_join(
        n1, "b", ranks, "rank", "vkey", out_col="vkey_b",
        carry_cols=["vkey_a", "w"], val_default="", num_buckets=rb,
        prebuilt_arrays=rank2vkey,
    ).to_pandas()
    if not len(n2):
        return pd.DataFrame(
            {"vkey_a": pd.array([], dtype=object),
             "vkey_b": pd.array([], dtype=object),
             "weight": pd.array([], dtype="int64")}
        )
    return (
        pd.DataFrame(
            {
                "vkey_a": n2["vkey_a"].to_numpy(),
                "vkey_b": n2["vkey_b"].to_numpy(),
                "weight": n2["w"].to_numpy(np.int64),
            }
        )
        .sort_values(["vkey_a", "vkey_b"])
        .reset_index(drop=True)
    )


def _msf_oracle_sql(rounds: int = MSF_ORACLE_ROUNDS) -> str:
    """Borůvka unrolled as chained MATERIALIZED CTEs over the canonical
    weighted simple undirected graph (weights = edges_raw multiplicities
    summed over both directions, matching :func:`_weighted_edges`): per
    round, a per-component window argmin under (w, a, b), then a
    recursive min-label closure over the selected merge graph to
    contract.  Rounds past convergence are fixpoint no-ops (empty
    selections), mirroring the engine's early exit."""
    parts = [
        "w0 AS MATERIALIZED (SELECT src_kind || ':' || src_key AS s, "
        "dst_kind || ':' || dst_key AS d, count(*) AS w "
        "FROM edges_raw GROUP BY 1, 2)",
        "base AS MATERIALIZED (SELECT least(s, d) AS a, greatest(s, d) AS b, "
        "SUM(w) AS w FROM w0 WHERE s <> d GROUP BY 1, 2)",
        "lab0 AS MATERIALIZED (SELECT v, v AS l FROM "
        "(SELECT DISTINCT a AS v FROM base UNION SELECT b FROM base))",
    ]
    for r in range(rounds):
        parts.append(
            f"er{r} AS MATERIALIZED (SELECT la.l AS ca, lb.l AS cb, "
            f"e.w, e.a, e.b FROM base e "
            f"JOIN lab{r} la ON la.v = e.a JOIN lab{r} lb ON lb.v = e.b "
            f"WHERE la.l <> lb.l)"
        )
        parts.append(
            f"cand{r} AS (SELECT ca AS c, w, a, b, ca, cb FROM er{r} "
            f"UNION ALL SELECT cb AS c, w, a, b, ca, cb FROM er{r})"
        )
        parts.append(
            f"sel{r} AS MATERIALIZED (SELECT DISTINCT w, a, b, ca, cb FROM ("
            f"SELECT c, w, a, b, ca, cb, row_number() OVER ("
            f"PARTITION BY c ORDER BY w, a, b) AS rn FROM cand{r}) "
            f"WHERE rn = 1)"
        )
        parts.append(
            f"symc{r} AS MATERIALIZED (SELECT ca AS x, cb AS y FROM sel{r} "
            f"UNION SELECT cb, ca FROM sel{r})"
        )
        parts.append(
            f"cn{r} AS MATERIALIZED (SELECT DISTINCT x AS c FROM symc{r})"
        )
        parts.append(
            f"cl{r}(c, l) AS (SELECT c, c FROM cn{r} "
            f"UNION SELECT s.y, cl{r}.l FROM cl{r} "
            f"JOIN symc{r} s ON s.x = cl{r}.c)"
        )
        parts.append(
            f"nl{r} AS MATERIALIZED (SELECT c, min(l) AS l FROM cl{r} "
            f"GROUP BY c)"
        )
        parts.append(
            f"lab{r + 1} AS MATERIALIZED (SELECT t.v, coalesce(n.l, t.l) AS l "
            f"FROM lab{r} t LEFT JOIN nl{r} n ON n.c = t.l)"
        )
    union = " UNION ALL ".join(
        f"SELECT a, b, w FROM sel{r}" for r in range(rounds)
    )
    return (
        _RECURSIVE_PRELUDE
        + ",\n"
        + ",\n".join(parts)
        + f"""
SELECT a AS vkey_a, b AS vkey_b, CAST(w AS BIGINT) AS weight
FROM ({union})
ORDER BY vkey_a, vkey_b
"""
    )


#: unrolled Bellman–Ford rounds in the SSSP oracle; the engine
#: converges at the hop count of the longest weighted shortest path
#: (asserted ≤ this by the parity hash itself — extra oracle rounds
#: are fixpoint no-ops)
SSSP_ORACLE_ROUNDS = 24


def q_weighted_sssp(sf_dir: str) -> pd.DataFrame:
    """Weighted single-source shortest paths from the global min-vkey
    seed — min-plus Bellman–Ford on the superstep engine over the
    PRE-dedup edge multiplicities (conv→tool call counts, role→role
    transition counts — the same weights ``weighted_pagerank`` uses),
    symmetrized.  (vkey, dist); unreachable and isolated vertices
    report -1.  The oracle is :data:`SSSP_ORACLE_ROUNDS` unrolled
    relaxation rounds over the identical weighted multiset."""
    edges, vertices = graph(sf_dir)
    wedges = _weighted_edges(sf_dir).materialize()
    seeds = _seed_vkeys(sf_dir)
    comp = (seeds["kind"] + ":" + seeds["key"]).to_numpy()
    i = int(np.argmin(comp))
    seed_ids = vertex_id(
        str(seeds["kind"].iloc[i]), str(seeds["key"].iloc[i])
    )
    state = weighted_sssp(
        wedges, _workdir(sf_dir, "sssp"), seed_ids,
        num_partitions=_algo_parts(edges), max_steps=SSSP_ORACLE_ROUNDS,
        checkpoint_every=_query_checkpoint_every(),
    )
    df = attach_vkeys(
        state, vertices, ["dist"], keep_unmatched_vertices=True
    ).to_pandas()
    d = df["dist"].to_numpy().astype(np.int64)
    df["dist"] = np.where(
        (d == UNMATCHED_SENTINEL) | (d >= int(BFS_UNREACHED)),
        np.int64(-1), d,
    )
    return df[["vkey", "dist"]].sort_values("vkey").reset_index(drop=True)


def _sssp_oracle_sql(n_rounds: int = SSSP_ORACLE_ROUNDS) -> str:
    """Bellman–Ford unrolled as chained MATERIALIZED CTEs over the
    symmetrized weighted edge multiset (weights = edges_raw
    multiplicities, matching :func:`_weighted_edges` and prepare's
    undirected UNION ALL doubling)."""
    sent = int(BFS_UNREACHED)
    parts = [
        "w0 AS MATERIALIZED (SELECT src_kind || ':' || src_key AS s, "
        "dst_kind || ':' || dst_key AS d, count(*) AS w "
        "FROM edges_raw GROUP BY 1, 2)",
        "symw AS MATERIALIZED (SELECT s, d, w FROM w0 "
        "UNION ALL SELECT d, s, w FROM w0)",
        "sverts AS MATERIALIZED (SELECT DISTINCT s AS v FROM symw)",
        "seedv AS MATERIALIZED (SELECT min(v) AS v FROM sverts)",
        f"d0 AS MATERIALIZED (SELECT v, CASE WHEN v = (SELECT v FROM seedv) "
        f"THEN 0 ELSE {sent} END AS dist FROM sverts)",
    ]
    for i in range(n_rounds):
        parts.append(
            f"d{i + 1} AS MATERIALIZED (\n"
            f"  SELECT p.v, least(p.dist, coalesce(m.md, p.dist)) AS dist\n"
            f"  FROM d{i} p LEFT JOIN (\n"
            f"    SELECT symw.d AS v, min(q.dist + symw.w) AS md\n"
            f"    FROM d{i} q JOIN symw ON symw.s = q.v\n"
            f"    GROUP BY symw.d) m ON m.v = p.v)"
        )
    return (
        GRAPH_SQL_PRELUDE
        + ",\n"
        + ",\n".join(parts)
        + f"""
SELECT vx.kind || ':' || vx."key" AS vkey,
       CAST(CASE WHEN b.dist IS NULL OR b.dist >= {sent} THEN -1
                 ELSE b.dist END AS BIGINT) AS dist
FROM vertices vx
LEFT JOIN d{n_rounds} b ON b.v = vx.kind || ':' || vx."key"
ORDER BY vkey
"""
    )


KCORE_K = 2
# unrolled peel rounds in the oracle; the engine's actual round count is
# asserted <= this in tests (extra rounds are fixpoint no-ops)
KCORE_ORACLE_ROUNDS = 40


def q_kcore(sf_dir: str) -> pd.DataFrame:
    """k-core membership (k=2) by distributed iterative peeling;
    (vkey, in_core 0/1) over the full vertex table — vertices outside
    the core (including isolated ones) report 0."""
    edges, vertices = graph(sf_dir)
    state = kcore(
        edges, _workdir(sf_dir, "kcore"), k=KCORE_K,
        num_partitions=_algo_parts(edges),
        checkpoint_every=_query_checkpoint_every(),
    )
    mapped = state.map_batches(
        lambda df: pd.DataFrame(
            {"id": df["id"].to_numpy(),
             "in_core": df["alive"].to_numpy().astype(np.int64)}
        ),
        batch_format="pandas",
    )
    df = attach_vkeys(
        mapped, vertices, ["in_core"], keep_unmatched_vertices=True
    ).to_pandas()
    v = df["in_core"].to_numpy().astype(np.int64)
    df["in_core"] = np.where(v == UNMATCHED_SENTINEL, np.int64(0), v)
    return df[["vkey", "in_core"]].sort_values("vkey").reset_index(drop=True)


def q_tool_cooccurrence(sf_dir: str) -> ray.data.Dataset:
    """Derived co-occurrence graph: tools used within the same
    conversation (distinct unordered pairs) — the J4 'linking pages'
    semi-join analog over the bipartite conv→tool edges."""
    edges, _ = graph(sf_dir)

    def conv_tools(t: pa.Table) -> pd.DataFrame:
        df = t.select(["src_key", "dst_kind", "dst_key"]).to_pandas()
        df = df[df["dst_kind"] == "tool"]
        return df.rename(columns={"src_key": "conv_id", "dst_key": "tool"})[
            ["conv_id", "tool"]
        ]

    ct = edges.map_batches(conv_tools, batch_format="pyarrow")

    def pairs_per_conv(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]).drop_duplicates().sort_values(
            ["conv_id", "tool"], kind="stable"
        )
        tools = df["tool"].to_numpy()
        ai, bi = pair_indices_within_groups(df["conv_id"].to_numpy())
        if not len(ai):
            return pd.DataFrame({"tool_a": [], "tool_b": []}, dtype=object)
        return pd.DataFrame({"tool_a": tools[ai], "tool_b": tools[bi]})

    staged = ct.map_batches(
        lambda df: add_bucket_column(df, ["conv_id"], 16), batch_format="pandas"
    )
    pairs = staged.groupby(BUCKET_COL).map_groups(pairs_per_conv, batch_format="pandas")
    return exact_distinct(pairs, ["tool_a", "tool_b"], num_buckets=16)


def q_conversation_export(sf_dir: str) -> ray.data.Dataset:
    """Transcript → training-example assembly: each conversation's
    turns concatenated in STABLE turn order as ``role: text`` lines —
    the grouped ordered-aggregation (secondary sort) every
    chat-fine-tuning pipeline runs as its last step.  Output (conv_id,
    example, n_turns).

    Scale shape: ONE conv-hash bucketed groupby (a conversation never
    splits); per bucket a single lexsort by (conv, turn_idx), line
    construction as one vectorized string add, and per-conv assembly
    via offsets + Arrow ``binary_join`` — no per-conversation Python.
    §2.9 stable-turn-order semantics are load-bearing here and the
    ``string_agg(... ORDER BY turn_idx)`` oracle asserts them
    end-to-end."""
    from neo4j_webgraph_ray.stages.core import bucketed_groupby

    ts = transcripts_from_events(sf_dir)

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        return df[["conv_id", "turn_idx", "role", "text"]]

    def combine(d: pd.DataFrame) -> pd.DataFrame:
        conv = d["conv_id"].to_numpy()
        order = np.lexsort((d["turn_idx"].to_numpy(), conv))
        conv = conv[order]
        lines = (d["role"].to_numpy()[order].astype(object) + ": "
                 + d["text"].to_numpy()[order].astype(object))
        starts = np.flatnonzero(np.r_[True, conv[1:] != conv[:-1]])
        counts = np.diff(np.r_[starts, len(conv)])
        offs = np.r_[0, np.cumsum(counts)].astype(np.int32)
        lst = pa.ListArray.from_arrays(
            pa.array(offs, type=pa.int32()), pa.array(lines, type=pa.string())
        )
        import pyarrow.compute as pc

        return pd.DataFrame(
            {
                "conv_id": conv[starts],
                "example": pc.binary_join(lst, "\n").to_numpy(
                    zero_copy_only=False
                ),
                "n_turns": counts.astype(np.int64),
            }
        )

    return bucketed_groupby(
        ts.map_batches(pre, batch_format="pandas"),
        ["conv_id"], combine, num_buckets=16, local_combine=False,
    )


CONVERSATION_EXPORT_SQL = f"""
WITH transcripts AS ({TRANSCRIPTS_FROM_EVENTS_SQL})
SELECT conv_id,
       string_agg(role || ': ' || text, chr(10) ORDER BY turn_idx) AS example,
       count(*) AS n_turns
FROM transcripts GROUP BY conv_id ORDER BY conv_id
"""


def q_butterfly_count(sf_dir: str) -> pd.DataFrame:
    """Butterfly (bipartite 4-cycle) count of the conv→tool graph —
    the bipartite analog of the triangle count (Sanei-Mehri et al.):
    #butterflies = Σ over tool pairs C(w, 2) where w = #conversations
    using both tools.  The standard cohesion statistic for bipartite
    webgraphs, which the unipartite triangle entry cannot see (a
    bipartite graph has none).

    Scale shape: same conv-bucketed wedge generation as
    ``tool_cooccurrence`` (pairs materialize per conversation,
    C(k, 2) per conv — the inherent butterfly-counting cost), then ONE
    bucketed count per tool pair and a per-batch C(w, 2) partial fold;
    the driver sees #batches rows."""
    from neo4j_webgraph_ray.stages.core import bucketed_groupby

    edges, _ = graph(sf_dir)

    def conv_tools(t: pa.Table) -> pd.DataFrame:
        df = t.select(["src_key", "dst_kind", "dst_key"]).to_pandas()
        df = df[df["dst_kind"] == "tool"]
        return df.rename(columns={"src_key": "conv_id", "dst_key": "tool"})[
            ["conv_id", "tool"]
        ]

    ct = edges.map_batches(conv_tools, batch_format="pyarrow")

    def pairs_per_conv(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]).drop_duplicates().sort_values(
            ["conv_id", "tool"], kind="stable"
        )
        tools = df["tool"].to_numpy()
        ai, bi = pair_indices_within_groups(df["conv_id"].to_numpy())
        if not len(ai):
            return pd.DataFrame(
                {"tool_a": pd.Series([], dtype=object),
                 "tool_b": pd.Series([], dtype=object),
                 "c": pd.Series([], dtype=np.int64)}
            )
        out = pd.DataFrame({"tool_a": tools[ai], "tool_b": tools[bi]})
        out["c"] = np.int64(1)
        return out

    staged = ct.map_batches(
        lambda df: add_bucket_column(df, ["conv_id"], 16), batch_format="pandas"
    )
    wedges = staged.groupby(BUCKET_COL).map_groups(
        pairs_per_conv, batch_format="pandas"
    )

    def count_combine(d: pd.DataFrame) -> pd.DataFrame:
        return d.groupby(["tool_a", "tool_b"], as_index=False, sort=False)[
            "c"
        ].sum()

    counts = bucketed_groupby(
        wedges, ["tool_a", "tool_b"], count_combine, num_buckets=16
    )

    def bf_partial(d: pd.DataFrame) -> pd.DataFrame:
        c = d["c"].to_numpy().astype(np.int64)
        return pd.DataFrame([{"bf": np.int64((c * (c - 1) // 2).sum())}])

    parts = counts.map_batches(bf_partial, batch_format="pandas").to_pandas()
    n = int(parts["bf"].sum()) if len(parts) else 0
    return pd.DataFrame({"n_butterflies": pd.array([n], dtype="int64")})


BUTTERFLY_SQL = f"""
WITH transcripts AS ({TRANSCRIPTS_FROM_EVENTS_SQL}),
ct AS (SELECT DISTINCT conv_id, tool FROM transcripts WHERE tool IS NOT NULL),
w AS (SELECT a.tool AS ta, b.tool AS tb, count(*) AS c
      FROM ct a JOIN ct b ON a.conv_id = b.conv_id AND a.tool < b.tool
      GROUP BY a.tool, b.tool)
SELECT CAST(coalesce(sum((c * (c - 1)) // 2), 0) AS BIGINT) AS n_butterflies
FROM w
"""


KTRUSS_K = 4
# the engine peels to the fixpoint in data-dependent rounds; the oracle
# unrolls this many support rounds.  An under-unroll self-reports via
# the driver's hash compare, and pytest asserts the engine converged
# within the unroll on the test inputs (same protocol as MIS/SSSP).
KTRUSS_ORACLE_ROUNDS = 8
# even-partkey restriction: the FULL co-purchase graph is dense enough
# that the k<=5 peel barely bites (382 of 115 729 edges at sf0.01) while
# its support oracle joins ~13 M intermediate rows per round; halving
# the part universe quarters the edges and yields a far richer peel
# (1 277 of 28 889 edges over 5 rounds at sf0.01)
KTRUSS_PART_MOD = 2


def q_ktruss(sf_dir: str) -> pd.DataFrame:
    """k-truss (k=4) of the even-part co-purchase graph — the iterative
    per-edge triangle-support peel (Cohen 2008), the cohesion
    refinement between the degree peel (``kcore``) and the clique.
    Input graph: parts appearing in the same order (distinct canonical
    pairs from ``lineitem``), a market-basket graph with real truss
    structure (the transcript co-occurrence graph is near-complete at
    every sf, so the peel would be vacuous there).

    Scale shape: per-order pair generation is ONE order-hash bucketed
    groupby (an order's parts co-locate; C(parts_per_order, 2) wedges
    are the inherent co-occurrence cost), edge dedup is a bucketed
    distinct, and the peel itself is
    :func:`neo4j_webgraph_ray.pipelines.ktruss.ktruss_edges` —
    single-task vectorized below the edge gate, bucketed wedge /
    co-group support rounds beyond."""
    from neo4j_webgraph_ray.pipelines.ktruss import ktruss_edges
    from neo4j_webgraph_ray.stages.core import exact_distinct

    def even_parts(t: pa.Table) -> pa.Table:
        keys = t["l_partkey"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(keys % KTRUSS_PART_MOD == 0))

    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    ).map_batches(even_parts, batch_format="pyarrow", zero_copy_batch=True)

    def co_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]).drop_duplicates().sort_values(
            ["l_orderkey", "l_partkey"], kind="stable"
        )
        parts = df["l_partkey"].to_numpy()
        ai, bi = pair_indices_within_groups(df["l_orderkey"].to_numpy())
        if not len(ai):
            return pd.DataFrame(
                {"src": np.empty(0, np.int64), "dst": np.empty(0, np.int64)}
            )
        # within-order sort is ascending, so src < dst: canonical already
        return pd.DataFrame({"src": parts[ai], "dst": parts[bi]})

    staged = li.map_batches(
        lambda df: add_bucket_column(df, ["l_orderkey"], 16),
        batch_format="pandas",
    )
    pairs = staged.groupby(BUCKET_COL).map_groups(co_pairs, batch_format="pandas")
    edges = exact_distinct(pairs, ["src", "dst"], num_buckets=16)
    kept, _rounds = ktruss_edges(edges, KTRUSS_K, num_buckets=16)
    out = kept.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    return out.astype({"a": "int64", "b": "int64"})


def _ktruss_oracle_sql(
    k: int = KTRUSS_K, n_rounds: int = KTRUSS_ORACLE_ROUNDS
) -> str:
    """Unrolled support-peel rounds as chained MATERIALIZED CTEs (the
    default CTE inlining re-expands each round's five references
    exponentially — thousands of parquet re-opens by round 6)."""
    thr = k - 2
    parts = [
        "lp AS MATERIALIZED (SELECT DISTINCT l_orderkey AS o, l_partkey AS p"
        f" FROM lineitem WHERE l_partkey % {KTRUSS_PART_MOD} = 0)",
        "e0 AS MATERIALIZED (SELECT DISTINCT x.p AS a, y.p AS b FROM lp x"
        " JOIN lp y ON x.o = y.o AND x.p < y.p)",
    ]
    prev = "e0"
    for r in range(n_rounds):
        parts.append(
            f"und{r} AS MATERIALIZED (SELECT a AS x, b AS y FROM {prev} "
            f"UNION ALL SELECT b, a FROM {prev})"
        )
        parts.append(
            f"s{r} AS MATERIALIZED (SELECT e.a, e.b, count(*) AS c "
            f"FROM {prev} e JOIN und{r} u1 ON u1.x = e.a "
            f"JOIN und{r} u2 ON u2.x = e.b AND u2.y = u1.y "
            f"GROUP BY e.a, e.b)"
        )
        parts.append(
            f"e{r + 1} AS MATERIALIZED (SELECT s.a, s.b FROM s{r} s "
            f"WHERE s.c >= {thr})"
        )
        prev = f"e{r + 1}"
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT a, b FROM {prev} ORDER BY a, b"
    )


KTRUSS_ORACLE_SQL = _ktruss_oracle_sql()


def q_inter_event_gaps(sf_dir: str) -> pd.DataFrame:
    """Per-event-type inter-arrival statistics — the LAG-window family:
    for consecutive same-user, same-type events, the gap in
    microseconds; output (event_type, n_gaps, mean_gap_us rounded 6 dp,
    max_gap_us).  Scale shape: ONE user-hash bucketed groupby; each
    whole user group sorts locally and diffs per (user, type) run
    (the multiset of consecutive diffs is invariant under equal-ts
    reordering, so no tie-break is needed); per-bucket partials are
    (type, n, sum, max) rows — exact int64 algebra — and the driver
    merges #buckets × #types rows."""
    from neo4j_webgraph_ray.stages.core import bucketed_groupby

    path = os.path.join(sf_dir, "events.parquet")
    ds = ray.data.read_parquet(path, columns=["user_id", "event_type", "ts"])

    def pre(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": df["user_id"].to_numpy(),
                "event_type": df["event_type"].to_numpy(),
                "ts_us": df["ts"].astype("int64").to_numpy(),
            }
        )

    def combine(d: pd.DataFrame) -> pd.DataFrame:
        u = d["user_id"].to_numpy()
        et = d["event_type"].to_numpy()
        ts = d["ts_us"].to_numpy()
        order = np.lexsort((ts, et, u))
        u, et, ts = u[order], et[order], ts[order]
        same = np.r_[False, (u[1:] == u[:-1]) & (et[1:] == et[:-1])]
        gaps = np.diff(ts)[same[1:]]
        gt = et[1:][same[1:]]
        if not len(gaps):
            return pd.DataFrame(
                {"event_type": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype=np.int64),
                 "s": pd.Series([], dtype=np.int64),
                 "m": pd.Series([], dtype=np.int64)}
            )
        g = pd.DataFrame({"event_type": gt, "gap": gaps}).groupby(
            "event_type", as_index=False, sort=False
        ).agg(n=("gap", "size"), s=("gap", "sum"), m=("gap", "max"))
        return g

    parts = bucketed_groupby(
        ds.map_batches(pre, batch_format="pandas"),
        ["user_id"], combine, num_buckets=16, local_combine=False,
    ).to_pandas()
    agg = parts.groupby("event_type", sort=True).agg(
        n=("n", "sum"), s=("s", "sum"), m=("m", "max")
    )
    # mean in SECONDS: at ~1e9 us magnitudes the double ulp (~1.2e-7)
    # sits at the 6-dp rounding boundary; seconds keep 6 dp far above
    # ulp.  Same op order as the SQL: exact int64 sum -> double -> /n
    # -> /1e6 -> round
    return pd.DataFrame(
        {
            "event_type": agg.index,
            "n_gaps": agg["n"].to_numpy(np.int64),
            "mean_gap_s": np.round(
                agg["s"].to_numpy(np.float64)
                / agg["n"].to_numpy(np.float64) / 1e6, 6
            ),
            "max_gap_us": agg["m"].to_numpy(np.int64),
        }
    ).reset_index(drop=True)


INTER_EVENT_GAPS_SQL = """
SELECT event_type,
       count(*) AS n_gaps,
       round(CAST(sum(gap) AS DOUBLE) / count(*) / 1000000.0, 6) AS mean_gap_s,
       max(gap) AS max_gap_us
FROM (
    SELECT event_type,
           epoch_us(ts) - lag(epoch_us(ts)) OVER (
               PARTITION BY user_id, event_type ORDER BY ts) AS gap
    FROM events
)
WHERE gap IS NOT NULL
GROUP BY event_type
"""


def q_tool_cooccurrence_triangles(sf_dir: str) -> pd.DataFrame:
    """Triangle count of the tool co-occurrence graph."""
    pairs = q_tool_cooccurrence(sf_dir)

    def to_ids(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "src": vertex_id("tool", df["tool_a"].to_numpy()),
                "dst": vertex_id("tool", df["tool_b"].to_numpy()),
            }
        )

    id_edges = pairs.map_batches(to_ids, batch_format="pandas")
    n = triangle_count(id_edges, num_buckets=8)
    return pd.DataFrame({"n_triangles": pd.array([n], dtype="int64")})


def q_enrich_social(sf_dir: str) -> pd.DataFrame:
    """Stub social-count enrichment over the vertex table — the
    GraphObserver/actor-pool stage (T1): deterministic count written per
    vertex, deterministic permanent failures left null (property-absent
    analog) and routed to rejects."""
    from neo4j_webgraph_ray.stages.enrich import StubSocialCountStage, enrich

    _, vertices = graph(sf_dir)
    out = enrich(
        vertices.select_columns(["kind", "key"]),
        StubSocialCountStage,
        concurrency=2,
        batch_size=2048,
    )
    df = out.to_pandas()[["kind", "key", "social_count"]]
    # float64/NaN (not nullable Int64/pd.NA): the DuckDB oracle's nullable
    # int column materializes as float64 in pandas, and the driver's
    # value-hash distinguishes the two representations (VERDICT r1 #1).
    df["social_count"] = df["social_count"].astype("float64")
    return df.sort_values(["kind", "key"]).reset_index(drop=True)


def q_kind_index(sf_dir: str) -> pd.DataFrame:
    """Auxiliary category index (GraphImporter.getCategoryIndex hook):
    per-kind member count and key range, emitted as a second Dataset
    beside the graph tables."""
    from neo4j_webgraph_ray.pipelines.graph_tables import kind_index

    _, vertices = graph(sf_dir)
    out = kind_index(vertices).to_pandas()
    out["n"] = out["n"].astype("int64")
    return out.sort_values("kind").reset_index(drop=True)


KIND_INDEX_ORACLE_SQL = (
    GRAPH_SQL_PRELUDE
    + """
SELECT kind, count(*) AS n, min("key") AS min_key, max("key") AS max_key
FROM vertices GROUP BY kind ORDER BY kind
"""
)


def q_enrich_multi(sf_dir: str) -> pd.DataFrame:
    """Multi-output enrichment: ONE stage writing two columns from two
    clients (FacebookAndTwitterEventHandler analog,
    ``customhandlers/FacebookAndTwitterEventHandler.java:46-91``).  Each
    service has its own deterministic failure rule, so rows can be
    half-enriched — the per-column nulls are part of the oracle check."""
    from neo4j_webgraph_ray.stages.enrich import StubMultiSocialStage, enrich

    _, vertices = graph(sf_dir)
    out = enrich(
        vertices.select_columns(["kind", "key"]),
        StubMultiSocialStage,
        concurrency=2,
        batch_size=2048,
    )
    df = out.to_pandas()[["kind", "key", "facebook_count", "twitter_count"]]
    for c in ("facebook_count", "twitter_count"):
        df[c] = df[c].astype("float64")  # oracle's nullable-int representation
    return df.sort_values(["kind", "key"]).reset_index(drop=True)


ENRICH_MULTI_ORACLE_SQL = (
    GRAPH_SQL_PRELUDE
    + """
SELECT kind, "key",
       CASE WHEN ascii(substr("key", length("key"), 1)) % 9 = 0 THEN NULL
            ELSE 7 * length("key") + ascii(substr("key", 1, 1)) % 10
       END AS facebook_count,
       CASE WHEN ascii(substr("key", length("key"), 1)) % 11 = 0 THEN NULL
            ELSE 3 * length("key") + ascii(substr("key", length("key"), 1)) % 7
       END AS twitter_count
FROM vertices
ORDER BY kind, "key"
"""
)


ENRICH_ORACLE_SQL = (
    GRAPH_SQL_PRELUDE
    + """
SELECT kind, "key",
       CASE WHEN ascii(substr("key", length("key"), 1)) % 9 = 0 THEN NULL
            ELSE 7 * length("key") + ascii(substr("key", 1, 1)) % 10
       END AS social_count
FROM vertices
ORDER BY kind, "key"
"""
)

def _pagerank_oracle_sql(
    n_iter: int = PAGERANK_FIXED_STEPS, damping: float = 0.85
) -> str:
    """Fixed-iteration damped power iteration with dangling-mass
    redistribution, unrolled as chained MATERIALIZED CTEs (DuckDB's
    recursive CTEs mis-evaluate aggregates over the working table).
    The engine runs EXACTLY the same number of steps (shared
    :data:`PAGERANK_FIXED_STEPS`), so both sides compute the same k-th
    iterate and differ only by fp summation order (~1e-15), far inside
    the shared 6-dp rounding.  Mirrors PageRankProgram.gather_update
    exactly: rank' = (1-d)/n + d*(sum_in + dangling/n)."""
    d = damping
    parts = [
        "und AS MATERIALIZED (SELECT src_kind || ':' || src_key AS s, "
        "dst_kind || ':' || dst_key AS d FROM edges)",
        "od AS MATERIALIZED (SELECT s AS v, count(*) AS deg FROM und GROUP BY s)",
        "verts AS MATERIALIZED (SELECT vv.v, coalesce(od.deg, 0) AS deg "
        "FROM (SELECT s AS v FROM und UNION SELECT d FROM und) vv "
        "LEFT JOIN od USING(v))",
        "cnt AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts)",
        "r0 AS MATERIALIZED (SELECT v, deg, 1.0/cnt.n AS rank "
        "FROM verts CROSS JOIN cnt)",
    ]
    for k in range(n_iter):
        parts.append(
            f"r{k + 1} AS MATERIALIZED (\n"
            f"  SELECT p.v, p.deg,\n"
            f"         (1-{d})/cnt.n + {d}*(coalesce(s.m, 0.0) + dang.dm/cnt.n) AS rank\n"
            f"  FROM r{k} p\n"
            f"  LEFT JOIN (SELECT und.d AS v, sum(p2.rank/p2.deg) AS m\n"
            f"             FROM r{k} p2 JOIN und ON und.s = p2.v\n"
            f"             WHERE p2.deg > 0 GROUP BY und.d) s ON s.v = p.v\n"
            f"  CROSS JOIN (SELECT coalesce(sum(rank) FILTER (WHERE deg = 0), 0.0)"
            f" AS dm FROM r{k}) dang\n"
            f"  CROSS JOIN cnt)"
        )
    return (
        GRAPH_SQL_PRELUDE
        + ",\n"
        + ",\n".join(parts)
        + f'\nSELECT v AS vkey, round(rank, 6) AS "rank" FROM r{n_iter} ORDER BY vkey'
    )


#: MIS oracle unroll depth — rounds beyond convergence are no-ops on an
#: empty active set, and an UNDER-unroll self-reports: vertices the
#: engine resolves in later rounds would disagree with the oracle's
#: still-active state, failing the hash compare.
MIS_ORACLE_ROUNDS = 32


def _mis_oracle_sql(n_rounds: int = MIS_ORACLE_ROUNDS) -> str:
    """Greedy-priority MIS rounds unrolled as chained MATERIALIZED CTEs,
    priorities = plain string order on "kind:key" (mirroring the
    engine's dense-rank remap exactly): per round, an active vertex
    with no smaller ACTIVE neighbor joins; it and its neighbors leave
    the active set."""
    parts = [
        "und AS MATERIALIZED (SELECT DISTINCT least(u, v) AS a, "
        "greatest(u, v) AS b FROM (SELECT src_kind || ':' || src_key AS u, "
        "dst_kind || ':' || dst_key AS v FROM edges) WHERE u <> v)",
        "sym AS MATERIALIZED (SELECT a AS s, b AS d FROM und "
        "UNION ALL SELECT b, a FROM und)",
        "a0 AS MATERIALIZED (SELECT DISTINCT s AS v FROM sym)",
    ]
    for k in range(n_rounds):
        parts.append(
            f"m{k} AS MATERIALIZED (SELECT a.v FROM a{k} a "
            f"WHERE NOT EXISTS (SELECT 1 FROM sym JOIN a{k} b ON b.v = sym.d "
            f"WHERE sym.s = a.v AND sym.d < a.v))"
        )
        parts.append(
            f"a{k + 1} AS MATERIALIZED (SELECT v FROM a{k} "
            f"WHERE v NOT IN (SELECT v FROM m{k}) "
            f"AND v NOT IN (SELECT sym.d FROM sym JOIN m{k} mm ON mm.v = sym.s))"
        )
    union = " UNION ALL ".join(f"SELECT v FROM m{k}" for k in range(n_rounds))
    return (
        GRAPH_SQL_PRELUDE
        + ",\n"
        + ",\n".join(parts)
        + f",\nmis AS ({union})\n"
        "SELECT av.v AS vkey,\n"
        "       CAST(CASE WHEN mis.v IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)"
        " AS in_mis\n"
        "FROM a0 av LEFT JOIN mis ON mis.v = av.v\n"
        "ORDER BY vkey"
    )


def _wpagerank_oracle_sql(
    n_iter: int = PAGERANK_FIXED_STEPS, damping: float = 0.85
) -> str:
    """Edge-weighted power iteration unrolled like
    :func:`_pagerank_oracle_sql`, over the PRE-dedup multiset's
    multiplicities (``edges_raw`` counts): contribution =
    rank/wsum*w — the engine's exact fp op order (scatter divides by
    the out-weight, the per-edge multiply happens at message build) —
    and dangling = zero-out-weight vertices."""
    d = damping
    parts = [
        "und AS MATERIALIZED (SELECT src_kind || ':' || src_key AS s, "
        "dst_kind || ':' || dst_key AS d, CAST(count(*) AS DOUBLE) AS w "
        "FROM edges_raw GROUP BY 1, 2)",
        "od AS MATERIALIZED (SELECT s AS v, sum(w) AS wsum FROM und GROUP BY s)",
        "verts AS MATERIALIZED (SELECT vv.v, coalesce(od.wsum, 0.0) AS wsum "
        "FROM (SELECT s AS v FROM und UNION SELECT d FROM und) vv "
        "LEFT JOIN od USING(v))",
        "cnt AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM verts)",
        "r0 AS MATERIALIZED (SELECT v, wsum, 1.0/cnt.n AS rank "
        "FROM verts CROSS JOIN cnt)",
    ]
    for k in range(n_iter):
        parts.append(
            f"r{k + 1} AS MATERIALIZED (\n"
            f"  SELECT p.v, p.wsum,\n"
            f"         (1-{d})/cnt.n + {d}*(coalesce(s.m, 0.0) + dang.dm/cnt.n) AS rank\n"
            f"  FROM r{k} p\n"
            f"  LEFT JOIN (SELECT und.d AS v, sum(p2.rank/p2.wsum*und.w) AS m\n"
            f"             FROM r{k} p2 JOIN und ON und.s = p2.v\n"
            f"             WHERE p2.wsum > 0 GROUP BY und.d) s ON s.v = p.v\n"
            f"  CROSS JOIN (SELECT coalesce(sum(rank) FILTER (WHERE wsum = 0),"
            f" 0.0) AS dm FROM r{k}) dang\n"
            f"  CROSS JOIN cnt)"
        )
    return (
        GRAPH_SQL_PRELUDE
        + ",\n"
        + ",\n".join(parts)
        + f'\nSELECT v AS vkey, round(rank, 6) AS "rank" FROM r{n_iter} ORDER BY vkey'
    )


def _hits_oracle_sql(n_iter: int = HITS_FIXED_STEPS) -> str:
    """Fixed-iteration simultaneous HITS unrolled as chained
    MATERIALIZED CTEs, mirroring :class:`HITSProgram` on the doubled
    graph exactly: per step, a' = E^T (h / ||h||_1) and
    b' = E (a / ||a||_1) computed from the SAME previous iterate, with
    the L1 norms applied lazily (divide at use, like the engine's
    gather-time normalization — the stored iterate stays "raw").
    h0 = 1 on vertices with out-edges, a0 = 1 on vertices with
    in-edges — exactly the doubled-graph node set (a hub node exists
    iff outdeg > 0).  Final output normalizes each side by its L1 sum;
    both engines run the same step count, so values differ only by fp
    summation order inside the shared 6-dp rounding."""
    parts = [
        "und AS MATERIALIZED (SELECT src_kind || ':' || src_key AS s, "
        "dst_kind || ':' || dst_key AS d FROM edges)",
        "verts AS MATERIALIZED (SELECT v, max(ho) AS ho, max(hi) AS hi "
        "FROM (SELECT s AS v, 1 AS ho, 0 AS hi FROM und "
        "UNION ALL SELECT d, 0, 1 FROM und) GROUP BY v)",
        "h0 AS MATERIALIZED (SELECT v, CAST(ho AS DOUBLE) AS h, "
        "CAST(hi AS DOUBLE) AS a FROM verts)",
    ]
    for k in range(n_iter):
        parts.append(
            f"h{k + 1} AS MATERIALIZED (\n"
            f"  SELECT p.v, coalesce(hw.m, 0.0) AS h, coalesce(aw.m, 0.0) AS a\n"
            f"  FROM h{k} p\n"
            f"  LEFT JOIN (SELECT und.s AS v, sum(p2.a / n.asum) AS m\n"
            f"             FROM h{k} p2 JOIN und ON und.d = p2.v\n"
            f"             CROSS JOIN (SELECT sum(a) AS asum FROM h{k}) n\n"
            f"             GROUP BY und.s) hw ON hw.v = p.v\n"
            f"  LEFT JOIN (SELECT und.d AS v, sum(p2.h / n.hsum) AS m\n"
            f"             FROM h{k} p2 JOIN und ON und.s = p2.v\n"
            f"             CROSS JOIN (SELECT sum(h) AS hsum FROM h{k}) n\n"
            f"             GROUP BY und.d) aw ON aw.v = p.v)"
        )
    return (
        GRAPH_SQL_PRELUDE
        + ",\n"
        + ",\n".join(parts)
        + f"\nSELECT v AS vkey,\n"
        f"       round(coalesce(h / nullif((SELECT sum(h) FROM h{n_iter}), 0),"
        f" 0.0), 6) AS hub,\n"
        f"       round(coalesce(a / nullif((SELECT sum(a) FROM h{n_iter}), 0),"
        f" 0.0), 6) AS auth\n"
        f"FROM h{n_iter} ORDER BY vkey"
    )


def _lpa_oracle_sql(n_iter: int = 20) -> str:
    """Synchronous label propagation unrolled for the engine's step cap
    (label_propagation default max_steps=20; a converged run is a
    fixpoint, so extra unrolled steps are no-ops and any converged step
    count <= n_iter yields identical labels).  Neighbor multiset =
    symmetrized directed edges WITHOUT dedup (UNION ALL both ways),
    matching SuperstepEngine.prepare's undirected doubling; per vertex:
    max neighbor-label weight, ties to the smaller label string."""
    parts = [
        "und AS MATERIALIZED (SELECT src_kind || ':' || src_key AS s, "
        "dst_kind || ':' || dst_key AS d FROM edges)",
        "sym AS MATERIALIZED (SELECT s, d FROM und UNION ALL SELECT d, s FROM und)",
        "verts AS MATERIALIZED (SELECT DISTINCT s AS v FROM sym)",
        "lp0 AS MATERIALIZED (SELECT v, v AS lab FROM verts)",
    ]
    for k in range(n_iter):
        parts.append(
            f"lp{k + 1} AS MATERIALIZED (\n"
            f"  SELECT p.v, coalesce(w.best, p.lab) AS lab\n"
            f"  FROM lp{k} p\n"
            f"  LEFT JOIN (\n"
            f"    SELECT v, lab AS best FROM (\n"
            f"      SELECT sym.d AS v, p2.lab AS lab,\n"
            f"             row_number() OVER (PARTITION BY sym.d\n"
            f"                 ORDER BY count(*) DESC, p2.lab) AS rn\n"
            f"      FROM lp{k} p2 JOIN sym ON sym.s = p2.v\n"
            f"      GROUP BY sym.d, p2.lab\n"
            f"    ) WHERE rn = 1\n"
            f"  ) w ON w.v = p.v)"
        )
    return (
        GRAPH_SQL_PRELUDE
        + ",\n"
        + ",\n".join(parts)
        + f"\nSELECT v AS vkey, lab AS community FROM lp{n_iter} ORDER BY vkey"
    )


def _community_graph_sql(n_iter: int = 20) -> str:
    """Quotient-graph tail over the same unrolled LPA fixpoint: map
    each directed edge's endpoints to their community label and count
    the unordered community pairs."""
    base = _lpa_oracle_sql(n_iter)
    tail = f"SELECT v AS vkey, lab AS community FROM lp{n_iter} ORDER BY vkey"
    assert base.endswith(tail)
    return base[: -len(tail)] + f"""
, lab AS (SELECT v, lab FROM lp{n_iter}),
qe AS (SELECT la.lab AS ca, lb.lab AS cb
       FROM und JOIN lab la ON la.v = und.s
                JOIN lab lb ON lb.v = und.d)
SELECT least(ca, cb) AS comm_a, greatest(ca, cb) AS comm_b,
       CAST(count(*) AS BIGINT) AS n_edges
FROM qe GROUP BY 1, 2 ORDER BY 1, 2
"""


_RECURSIVE_PRELUDE = GRAPH_SQL_PRELUDE.replace("WITH ", "WITH RECURSIVE ", 1)


def _ppr_oracle_sql(
    n_iter: int = PAGERANK_FIXED_STEPS, damping: float = 0.85
) -> str:
    """Personalized PageRank unrolled like :func:`_pagerank_oracle_sql`,
    with teleport mass on the per-kind min-vkey seeds (matching
    :func:`_seed_vkeys` over degree>0 vertices) instead of uniform:
    rank' = (1-d)*pref + d*(sum_in + dangling*pref).  Mirrors
    PersonalizedPageRankProgram.gather_update exactly."""
    d = damping
    parts = [
        "und AS MATERIALIZED (SELECT src_kind || ':' || src_key AS s, "
        "dst_kind || ':' || dst_key AS d FROM edges)",
        "od AS MATERIALIZED (SELECT s AS v, count(*) AS deg FROM und GROUP BY s)",
        "verts0 AS MATERIALIZED (SELECT vv.v, coalesce(od.deg, 0) AS deg "
        "FROM (SELECT s AS v FROM und UNION SELECT d FROM und) vv "
        "LEFT JOIN od USING(v))",
        # seeds: min composite per kind over edge-endpoint vertices —
        # identical to the engine's _seed_vkeys selection
        "seeds AS MATERIALIZED (SELECT min(v) AS v FROM verts0 "
        "GROUP BY split_part(v, ':', 1))",
        "ns AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM seeds)",
        "verts AS MATERIALIZED (SELECT verts0.v, verts0.deg, "
        "CASE WHEN seeds.v IS NOT NULL THEN 1.0/ns.n ELSE 0.0 END AS pref "
        "FROM verts0 LEFT JOIN seeds ON seeds.v = verts0.v CROSS JOIN ns)",
        "r0 AS MATERIALIZED (SELECT v, deg, pref, pref AS rank FROM verts)",
    ]
    for k in range(n_iter):
        parts.append(
            f"r{k + 1} AS MATERIALIZED (\n"
            f"  SELECT p.v, p.deg, p.pref,\n"
            f"         (1-{d})*p.pref + {d}*(coalesce(s.m, 0.0)"
            f" + dang.dm*p.pref) AS rank\n"
            f"  FROM r{k} p\n"
            f"  LEFT JOIN (SELECT und.d AS v, sum(p2.rank/p2.deg) AS m\n"
            f"             FROM r{k} p2 JOIN und ON und.s = p2.v\n"
            f"             WHERE p2.deg > 0 GROUP BY und.d) s ON s.v = p.v\n"
            f"  CROSS JOIN (SELECT coalesce(sum(rank) FILTER (WHERE deg = 0), 0.0)"
            f" AS dm FROM r{k}) dang)"
        )
    return (
        GRAPH_SQL_PRELUDE
        + ",\n"
        + ",\n".join(parts)
        + f'\nSELECT v AS vkey, round(rank, 6) AS "rank" FROM r{n_iter} ORDER BY vkey'
    )


#: BFS step cap, shared engine <-> oracle: the engine runs at most this
#: many supersteps, the recursive oracle relaxes to the same depth —
#: both sides therefore agree even on (pathological) graphs deeper than
#: the cap.  Far above any real eccentricity here (asserted in tests).
BFS_ORACLE_CAP = 300

BFS_ORACLE_SQL = (
    _RECURSIVE_PRELUDE
    + f""",
und AS (SELECT src_kind || ':' || src_key AS s,
               dst_kind || ':' || dst_key AS d FROM edges),
sym AS (SELECT s, d FROM und UNION SELECT d, s FROM und),
sverts AS (SELECT DISTINCT s AS v FROM sym),
seed AS (SELECT min(v) AS v FROM sverts),
reach(v, dist) AS (
    SELECT v, 0 FROM seed
    UNION
    SELECT sym.d, reach.dist + 1 FROM reach JOIN sym ON sym.s = reach.v
    WHERE reach.dist < {BFS_ORACLE_CAP}
),
best AS (SELECT v, min(dist) AS dist FROM reach GROUP BY v)
SELECT vx.kind || ':' || vx."key" AS vkey,
       CAST(coalesce(best.dist, -1) AS BIGINT) AS dist
FROM vertices vx LEFT JOIN best ON best.v = vx.kind || ':' || vx."key"
ORDER BY vkey
"""
)

_BIPARTITE_CORE = """,
und AS (SELECT src_kind || ':' || src_key AS s,
               dst_kind || ':' || dst_key AS d FROM edges
        WHERE src_kind || ':' || src_key <> dst_kind || ':' || dst_key),
sym AS (SELECT s, d FROM und UNION SELECT d, s FROM und),
sverts AS (SELECT DISTINCT s AS v FROM sym),
comp(v, l) AS (
    SELECT v, v FROM sverts
    UNION
    SELECT sym.d, comp.l FROM comp JOIN sym ON sym.s = comp.v
),
lab AS (SELECT v, min(l) AS l FROM comp GROUP BY v),
seeds AS (SELECT DISTINCT l AS v FROM lab),
reach(v, dist) AS (
    SELECT v, 0 FROM seeds
    UNION
    SELECT sym.d, reach.dist + 1 FROM reach JOIN sym ON sym.s = reach.v
    WHERE reach.dist < {cap}
),
best AS (SELECT v, min(dist) AS dist FROM reach GROUP BY v)"""

BIPARTITE_SIDES_SQL = (
    _RECURSIVE_PRELUDE
    + _BIPARTITE_CORE.format(cap=BFS_ORACLE_CAP)
    + """
SELECT v AS vkey, CAST(dist % 2 AS BIGINT) AS side FROM best ORDER BY vkey
"""
)

BIPARTITE_CHECK_SQL = (
    _RECURSIVE_PRELUDE
    + _BIPARTITE_CORE.format(cap=BFS_ORACLE_CAP)
    + """,
simp AS (SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b FROM und),
conf AS (SELECT count(*) AS c FROM simp
         JOIN best sa ON sa.v = simp.a
         JOIN best sb ON sb.v = simp.b
         WHERE sa.dist % 2 = sb.dist % 2)
SELECT CAST(c AS BIGINT) AS n_conflicts,
       CAST(CASE WHEN c = 0 THEN 1 ELSE 0 END AS BIGINT) AS is_bipartite
FROM conf
"""
)


def _kcore_oracle_sql(
    k: int = KCORE_K, n_rounds: int = KCORE_ORACLE_ROUNDS
) -> str:
    """Iterative k-core peel unrolled as chained MATERIALIZED CTEs:
    a_{i+1} = vertices of a_i with >= k (multiset, matching prepare's
    undirected UNION ALL doubling) edges into a_i.  The engine peels to
    fixpoint; extra unrolled rounds are no-ops, and the engine's actual
    round count is asserted <= n_rounds in tests."""
    parts = [
        "und AS MATERIALIZED (SELECT src_kind || ':' || src_key AS s, "
        "dst_kind || ':' || dst_key AS d FROM edges)",
        "sym AS MATERIALIZED (SELECT s, d FROM und "
        "UNION ALL SELECT d, s FROM und)",
        "a0 AS MATERIALIZED (SELECT DISTINCT s AS v FROM sym)",
    ]
    for i in range(n_rounds):
        parts.append(
            f"a{i + 1} AS MATERIALIZED (SELECT sym.s AS v FROM sym "
            f"JOIN a{i} x ON x.v = sym.s JOIN a{i} y ON y.v = sym.d "
            f"GROUP BY sym.s HAVING count(*) >= {k})"
        )
    return (
        GRAPH_SQL_PRELUDE
        + ",\n"
        + ",\n".join(parts)
        + f"""
SELECT vx.kind || ':' || vx."key" AS vkey,
       CAST(CASE WHEN a.v IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS in_core
FROM vertices vx LEFT JOIN a{n_rounds} a ON a.v = vx.kind || ':' || vx."key"
ORDER BY vkey"""
    )


PAGERANK_ORACLE_SQL = _pagerank_oracle_sql()
LPA_ORACLE_SQL = _lpa_oracle_sql()
PPR_ORACLE_SQL = _ppr_oracle_sql()
HITS_ORACLE_SQL = _hits_oracle_sql()
EIGENVECTOR_ORACLE_SQL = _eigenvector_oracle_sql()
KATZ_ORACLE_SQL = _katz_oracle_sql()
MIS_ORACLE_SQL = _mis_oracle_sql()
WPAGERANK_ORACLE_SQL = _wpagerank_oracle_sql()
KCORE_ORACLE_SQL = _kcore_oracle_sql()

CC_ORACLE_SQL = (
    _RECURSIVE_PRELUDE
    + """,
und AS (
    SELECT src_kind || ':' || src_key AS u, dst_kind || ':' || dst_key AS v
    FROM edges WHERE src_kind || ':' || src_key <> dst_kind || ':' || dst_key
),
sym AS (SELECT u, v FROM und UNION SELECT v, u FROM und),
vk AS (SELECT kind || ':' || "key" AS v FROM vertices),
reach(v, l) AS (
    SELECT v, v FROM vk
    UNION
    SELECT s.v, r.l FROM reach r JOIN sym s ON s.u = r.v
)
SELECT v AS vkey, min(l) AS component FROM reach GROUP BY v ORDER BY vkey
"""
)

COMPONENT_SIZES_SQL = (
    _RECURSIVE_PRELUDE
    + """,
und AS (
    SELECT src_kind || ':' || src_key AS u, dst_kind || ':' || dst_key AS v
    FROM edges WHERE src_kind || ':' || src_key <> dst_kind || ':' || dst_key
),
sym AS (SELECT u, v FROM und UNION SELECT v, u FROM und),
vk AS (SELECT kind || ':' || "key" AS v FROM vertices),
reach(v, l) AS (
    SELECT v, v FROM vk
    UNION
    SELECT s.v, r.l FROM reach r JOIN sym s ON s.u = r.v
),
lab AS (SELECT v, min(l) AS comp FROM reach GROUP BY v),
szs AS (SELECT comp, count(*) AS sz FROM lab GROUP BY comp)
SELECT CAST(sz AS BIGINT) AS component_size,
       CAST(count(*) AS BIGINT) AS n_components
FROM szs GROUP BY sz ORDER BY component_size
"""
)

TRIANGLE_ORACLE_SQL = (
    GRAPH_SQL_PRELUDE
    + """,
und AS (
    SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
    FROM (SELECT src_kind || ':' || src_key AS u,
                 dst_kind || ':' || dst_key AS v FROM edges)
    WHERE u <> v
)
SELECT count(*) AS n_triangles
FROM und e1 JOIN und e2 ON e2.a = e1.b
JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
"""
)

CLUSTERING_ORACLE_SQL = (
    GRAPH_SQL_PRELUDE
    + """,
und AS (
    SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
    FROM (SELECT src_kind || ':' || src_key AS u,
                 dst_kind || ':' || dst_key AS v FROM edges)
    WHERE u <> v
),
sdeg AS (
    SELECT v, count(*) AS deg
    FROM (SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und)
    GROUP BY v
),
tris AS (
    SELECT e1.a AS x, e1.b AS y, e2.b AS z
    FROM und e1 JOIN und e2 ON e2.a = e1.b
    JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
),
corner AS (
    SELECT x AS v FROM tris
    UNION ALL SELECT y AS v FROM tris
    UNION ALL SELECT z AS v FROM tris
),
tcnt AS (SELECT v, count(*) AS tri FROM corner GROUP BY v)
SELECT vx.kind || ':' || vx."key" AS vkey,
       CAST(coalesce(t.tri, 0) AS BIGINT) AS tri,
       CAST(coalesce(d.deg, 0) AS BIGINT) AS deg,
       CASE WHEN coalesce(d.deg, 0) >= 2
            THEN round(2.0 * coalesce(t.tri, 0) / (d.deg * (d.deg - 1.0)), 6)
            ELSE 0.0 END AS cc
FROM vertices vx
LEFT JOIN sdeg d ON d.v = vx.kind || ':' || vx."key"
LEFT JOIN tcnt t ON t.v = vx.kind || ':' || vx."key"
ORDER BY vkey
"""
)

#: shared skeleton for the exact all-pairs-distance oracles: recursive
#: CTE over the symmetrized edge view, relaxed to the SAME step cap the
#: engine runs under (NF_ORACLE_CAP), min-dist per ordered pair.
_ALLPAIRS_DIST_SQL = f""",
und AS (SELECT src_kind || ':' || src_key AS s,
               dst_kind || ':' || dst_key AS d FROM edges),
sym AS (SELECT s, d FROM und UNION SELECT d, s FROM und),
sverts AS (SELECT DISTINCT s AS v FROM sym),
reach(src, v, dist) AS (
    SELECT v, v, 0 FROM sverts
    UNION
    SELECT reach.src, sym.d, reach.dist + 1 FROM reach JOIN sym ON sym.s = reach.v
    WHERE reach.dist < {NF_ORACLE_CAP}
),
best AS (SELECT src, v, min(dist) AS dist FROM reach GROUP BY src, v)
"""

NF_ORACLE_SQL = (
    _RECURSIVE_PRELUDE
    + _ALLPAIRS_DIST_SQL
    + """,
hops AS (SELECT DISTINCT dist AS hop FROM best)
-- every hop 0..diameter is realized: a shortest path of length D
-- contains pairs at every distance 1..D, and self-pairs give 0
SELECT CAST(hop AS BIGINT) AS hop,
       CAST((SELECT count(*) FROM best WHERE best.dist <= hops.hop)
            AS BIGINT) AS nf
FROM hops ORDER BY hop
"""
)

VERTEX_SIM_SQL = (
    GRAPH_SQL_PRELUDE
    + f""",
und AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
        FROM (SELECT src_kind || ':' || src_key AS u,
                     dst_kind || ':' || dst_key AS v FROM edges)
        WHERE u <> v),
adj AS (SELECT a AS c, b AS n FROM und UNION ALL SELECT b, a FROM und),
degf AS (SELECT c, count(*) AS deg FROM adj GROUP BY c),
adj2 AS (SELECT adj.c, adj.n FROM adj JOIN degf ON degf.c = adj.c
         WHERE degf.deg <= {VERTEX_SIM_MAX_CENTER_DEG}),
degp AS (SELECT n AS c, count(*) AS deg FROM adj2 GROUP BY n),
pairs AS (SELECT l.n AS x, r.n AS y, count(*) AS inter
          FROM adj2 l JOIN adj2 r ON l.c = r.c AND l.n < r.n
          GROUP BY l.n, r.n),
scored AS (SELECT p.x AS vkey_a, p.y AS vkey_b,
                  CAST(p.inter AS BIGINT) AS inter,
                  round(CAST(p.inter AS DOUBLE)
                        / (dx.deg + dy.deg - p.inter), 6) AS jaccard
           FROM pairs p
           JOIN degp dx ON dx.c = p.x
           JOIN degp dy ON dy.c = p.y)
SELECT * FROM scored
ORDER BY jaccard DESC, vkey_a, vkey_b
LIMIT {VERTEX_SIM_TOP_K}
"""
)

ADAMIC_ADAR_SQL = (
    GRAPH_SQL_PRELUDE
    + f""",
und AS (SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
        FROM (SELECT src_kind || ':' || src_key AS u,
                     dst_kind || ':' || dst_key AS v FROM edges)
        WHERE u <> v),
adj AS (SELECT a AS c, b AS n FROM und UNION ALL SELECT b, a FROM und),
degf AS (SELECT c, count(*) AS deg FROM adj GROUP BY c),
adj2 AS (SELECT adj.c, adj.n, degf.deg FROM adj JOIN degf ON degf.c = adj.c
         WHERE degf.deg <= {VERTEX_SIM_MAX_CENTER_DEG}),
pairs AS (SELECT l.n AS x, r.n AS y,
                 SUM(CAST(ROUND({AA_SCALE} / ln(l.deg)) AS BIGINT)) AS aa_u6,
                 count(*) AS inter
          FROM adj2 l JOIN adj2 r ON l.c = r.c AND l.n < r.n
          GROUP BY l.n, r.n)
SELECT x AS vkey_a, y AS vkey_b, CAST(inter AS BIGINT) AS inter,
       CAST(aa_u6 AS DOUBLE) / {AA_SCALE} AS aa
FROM pairs
ORDER BY aa_u6 DESC, vkey_a, vkey_b
LIMIT {VERTEX_SIM_TOP_K}
"""
)

SCC_ORACLE_SQL = (
    _RECURSIVE_PRELUDE
    + """,
e AS (SELECT src_kind || ':' || src_key AS s,
             dst_kind || ':' || dst_key AS d FROM edges),
ev AS (SELECT DISTINCT v FROM
       (SELECT s AS v FROM e UNION SELECT d FROM e)),
reach(src, v) AS (
    SELECT v, v FROM ev
    UNION
    SELECT reach.src, e.d FROM reach JOIN e ON e.s = reach.v
),
mutual AS (SELECT a.src AS u, a.v
           FROM reach a JOIN reach b ON b.src = a.v AND b.v = a.src),
lab AS (SELECT v, min(u) AS scc FROM mutual GROUP BY v)
SELECT vx.kind || ':' || vx."key" AS vkey,
       coalesce(lab.scc, vx.kind || ':' || vx."key") AS scc
FROM vertices vx
LEFT JOIN lab ON lab.v = vx.kind || ':' || vx."key"
ORDER BY vkey
"""
)

EFFDIAM_ORACLE_SQL = (
    _RECURSIVE_PRELUDE
    + _ALLPAIRS_DIST_SQL
    + """,
hops AS (SELECT DISTINCT dist AS hop FROM best),
nfs AS (SELECT hop,
               CAST((SELECT count(*) FROM best WHERE best.dist <= hops.hop)
                    AS DOUBLE) AS nf
        FROM hops),
mx AS (SELECT max(hop) AS diam, 0.9 * max(nf) AS thr FROM nfs),
tt AS (SELECT min(nfs.hop) AS t FROM nfs, mx WHERE nfs.nf >= mx.thr)
SELECT CAST(mx.diam AS BIGINT) AS diameter,
       round(CASE WHEN tt.t = 0 THEN 0.0
                  ELSE (tt.t - 1) + (mx.thr - p.nf) / (c.nf - p.nf)
             END, 6) AS effective_diameter
FROM mx, tt
LEFT JOIN nfs c ON c.hop = tt.t
LEFT JOIN nfs p ON p.hop = tt.t - 1
"""
)

CLOSENESS_ORACLE_SQL = (
    _RECURSIVE_PRELUDE
    + _ALLPAIRS_DIST_SQL
    + """,
agg AS (SELECT src,
               count(*) AS r,
               sum(dist) AS sd
        FROM best GROUP BY src),
clo AS (SELECT src,
               CASE WHEN sd > 0
                    THEN (CAST(r AS DOUBLE) - 1.0) / sd
                    ELSE 0.0 END AS closeness
        FROM agg)
SELECT vx.kind || ':' || vx."key" AS vkey,
       round(coalesce(clo.closeness, 0.0), 6) AS closeness
FROM vertices vx
LEFT JOIN clo ON clo.src = vx.kind || ':' || vx."key"
ORDER BY vkey
"""
)

HC_ORACLE_SQL = (
    _RECURSIVE_PRELUDE
    + _ALLPAIRS_DIST_SQL
    + """,
perhop AS (SELECT src, dist, count(*) AS c FROM best
           WHERE dist > 0 GROUP BY src, dist),
hcv AS (SELECT src,
               list_sum(list(CAST(c AS DOUBLE) / dist ORDER BY dist)) AS hc
        FROM perhop GROUP BY src)
SELECT vx.kind || ':' || vx."key" AS vkey,
       round(coalesce(hcv.hc, 0.0), 6) AS hc
FROM vertices vx
LEFT JOIN hcv ON hcv.src = vx.kind || ':' || vx."key"
ORDER BY vkey
"""
)

GRAPH_SUMMARY_SQL = (
    GRAPH_SQL_PRELUDE
    + """,
und AS (
    SELECT DISTINCT least(u, v) AS a, greatest(u, v) AS b
    FROM (SELECT src_kind || ':' || src_key AS u,
                 dst_kind || ':' || dst_key AS v FROM edges)
    WHERE u <> v
),
deg AS (
    SELECT v, count(*) AS c
    FROM (SELECT a AS v FROM und UNION ALL SELECT b AS v FROM und)
    GROUP BY v
),
j AS (SELECT da.c AS x, db.c AS y
      FROM und JOIN deg da ON da.v = und.a JOIN deg db ON db.v = und.b),
s AS (SELECT count(*) AS m,
             coalesce(sum(x + y), 0) AS sx,
             coalesce(sum(x * x + y * y), 0) AS sxx,
             coalesce(sum(2 * x * y), 0) AS sxy
      FROM j),
nv AS (SELECT count(*) AS n FROM deg)
SELECT CAST(nv.n AS BIGINT) AS n_vertices,
       CAST(s.m AS BIGINT) AS n_edges,
       round(CASE WHEN nv.n > 0
                  THEN CAST(2 * s.m AS DOUBLE) / nv.n ELSE 0.0 END,
             6) AS avg_degree,
       round(CASE WHEN CAST(2 * s.m AS DOUBLE) * CAST(s.sxx AS DOUBLE)
                       - CAST(s.sx AS DOUBLE) * CAST(s.sx AS DOUBLE) <> 0
                  THEN (CAST(2 * s.m AS DOUBLE) * CAST(s.sxy AS DOUBLE)
                        - CAST(s.sx AS DOUBLE) * CAST(s.sx AS DOUBLE))
                       / (CAST(2 * s.m AS DOUBLE) * CAST(s.sxx AS DOUBLE)
                          - CAST(s.sx AS DOUBLE) * CAST(s.sx AS DOUBLE))
                  ELSE 0.0 END,
             6) AS assortativity
FROM s, nv
"""
)

RECIPROCITY_SQL = (
    GRAPH_SQL_PRELUDE
    + """,
e AS (SELECT src_kind || ':' || src_key AS s, dst_kind || ':' || dst_key AS d
      FROM edges
      WHERE src_kind || ':' || src_key <> dst_kind || ':' || dst_key),
t AS (SELECT count(*) AS ne FROM e),
r AS (SELECT count(*) AS nrec FROM e a JOIN e b ON a.s = b.d AND a.d = b.s)
SELECT CAST(t.ne AS BIGINT) AS n_edges,
       CAST(r.nrec AS BIGINT) AS n_reciprocal,
       round(CASE WHEN t.ne > 0
                  THEN CAST(r.nrec AS DOUBLE) / t.ne ELSE 0.0 END,
             6) AS reciprocity
FROM t, r
"""
)

TOOL_COOC_SQL = f"""
WITH transcripts AS ({TRANSCRIPTS_FROM_EVENTS_SQL}),
ct AS (SELECT DISTINCT conv_id, tool FROM transcripts WHERE tool IS NOT NULL)
SELECT DISTINCT a.tool AS tool_a, b.tool AS tool_b
FROM ct a JOIN ct b ON a.conv_id = b.conv_id AND a.tool < b.tool
"""

TOOL_COOC_TRIANGLES_SQL = f"""
WITH transcripts AS ({TRANSCRIPTS_FROM_EVENTS_SQL}),
ct AS (SELECT DISTINCT conv_id, tool FROM transcripts WHERE tool IS NOT NULL),
pairs AS (
    SELECT DISTINCT a.tool AS a, b.tool AS b
    FROM ct a JOIN ct b ON a.conv_id = b.conv_id AND a.tool < b.tool
)
SELECT count(*) AS n_triangles
FROM pairs e1 JOIN pairs e2 ON e2.a = e1.b
JOIN pairs e3 ON e3.a = e1.a AND e3.b = e2.b
"""


# --- registry --------------------------------------------------------------

GRAPH_ANALYTICS_QUERIES: dict[str, Callable[[str], object]] = {
    "pagerank": q_pagerank,
    "personalized_pagerank": q_personalized_pagerank,
    "weighted_pagerank": q_weighted_pagerank,
    "hits": q_hits,
    "eigenvector": q_eigenvector,
    "katz": q_katz,
    "connected_components": q_connected_components,
    "component_sizes": q_component_sizes,
    "scc": q_scc,
    "label_propagation": q_label_propagation,
    "community_graph": q_community_graph,
    "modularity": q_modularity,
    "bfs_distance": q_bfs_distance,
    "bipartite_sides": q_bipartite_sides,
    "bipartite_check": q_bipartite_check,
    "min_spanning_forest": q_min_spanning_forest,
    "weighted_sssp": q_weighted_sssp,
    "kcore": q_kcore,
    # betweenness: per-source dependency folds are not single-statement
    # SQL-expressible — rows-only for the driver; exact Brandes pytest
    "betweenness": q_betweenness,
    "triangle_count": q_triangle_count,
    "clustering_coefficient": q_clustering_coefficient,
    "vertex_similarity": q_vertex_similarity,
    "adamic_adar": q_adamic_adar,
    "mis": q_mis,
    "neighborhood_function": q_neighborhood_function,
    "effective_diameter": q_effective_diameter,
    "harmonic_centrality": q_harmonic_centrality,
    "closeness_centrality": q_closeness_centrality,
    "hyperball_nf": q_hyperball_nf,
    "graph_summary": q_graph_summary,
    "reciprocity": q_reciprocity,
    "assortativity": q_assortativity,
    "random_walks": q_random_walks,
    "tool_cooccurrence": q_tool_cooccurrence,
    "conversation_export": q_conversation_export,
    "butterfly_count": q_butterfly_count,
    "ktruss": q_ktruss,
    "inter_event_gaps": q_inter_event_gaps,
    "tool_cooccurrence_triangles": q_tool_cooccurrence_triangles,
    "enrich_social": q_enrich_social,
    "enrich_multi": q_enrich_multi,
    "kind_index": q_kind_index,
}

GRAPH_ANALYTICS_ORACLES: dict[str, str] = {
    "pagerank": PAGERANK_ORACLE_SQL,
    "personalized_pagerank": PPR_ORACLE_SQL,
    "weighted_pagerank": WPAGERANK_ORACLE_SQL,
    "hits": HITS_ORACLE_SQL,
    "eigenvector": EIGENVECTOR_ORACLE_SQL,
    "katz": KATZ_ORACLE_SQL,
    "label_propagation": LPA_ORACLE_SQL,
    "community_graph": _community_graph_sql(),
    "modularity": _modularity_oracle_sql(),
    "connected_components": CC_ORACLE_SQL,
    "component_sizes": COMPONENT_SIZES_SQL,
    "scc": SCC_ORACLE_SQL,
    "bfs_distance": BFS_ORACLE_SQL,
    "bipartite_sides": BIPARTITE_SIDES_SQL,
    "bipartite_check": BIPARTITE_CHECK_SQL,
    "min_spanning_forest": _msf_oracle_sql(),
    "weighted_sssp": _sssp_oracle_sql(),
    "kcore": KCORE_ORACLE_SQL,
    "triangle_count": TRIANGLE_ORACLE_SQL,
    "clustering_coefficient": CLUSTERING_ORACLE_SQL,
    "vertex_similarity": VERTEX_SIM_SQL,
    "adamic_adar": ADAMIC_ADAR_SQL,
    "mis": MIS_ORACLE_SQL,
    "neighborhood_function": NF_ORACLE_SQL,
    "effective_diameter": EFFDIAM_ORACLE_SQL,
    "harmonic_centrality": HC_ORACLE_SQL,
    "closeness_centrality": CLOSENESS_ORACLE_SQL,
    "graph_summary": GRAPH_SUMMARY_SQL,
    "reciprocity": RECIPROCITY_SQL,
    "conversation_export": CONVERSATION_EXPORT_SQL,
    "butterfly_count": BUTTERFLY_SQL,
    "ktruss": KTRUSS_ORACLE_SQL,
    "inter_event_gaps": INTER_EVENT_GAPS_SQL,
    "assortativity": ASSORTATIVITY_SQL,
    "random_walks": _walks_sql(),
    # hyperball_nf: sketch-valued (rows-only) — pytest holds it to the
    # exact series within HLL error bounds
    "tool_cooccurrence": TOOL_COOC_SQL,
    "tool_cooccurrence_triangles": TOOL_COOC_TRIANGLES_SQL,
    "enrich_social": ENRICH_ORACLE_SQL,
    "enrich_multi": ENRICH_MULTI_ORACLE_SQL,
    "kind_index": KIND_INDEX_ORACLE_SQL,
}

RELATIONAL_QUERIES: dict[str, Callable[[str], object]] = {
    "transcripts": q_transcripts,
    "edges": q_edges,
    "incremental_edges": q_incremental_edges,
    "vertices": q_vertices,
    "top_in_degree": q_top_in_degree,
    "degree_threshold": q_degree_threshold,
    "count_by_kind": q_count_by_kind,
    "degree_histogram": q_degree_histogram,
    "content_regex_count": q_content_regex_count,
    "null_tool_scan": q_null_tool_scan,
    "point_lookup": q_point_lookup,
    "cross_kind_pattern": q_cross_kind_pattern,
    "transcript_sample": q_transcript_sample,
    "turns_per_hour": q_turns_per_hour,
    "role_transitions": q_role_transitions,
    "user_sessions": q_user_sessions,
    "user_retention": q_user_retention,
    "latest_event_per_user": q_latest_event_per_user,
    "daily_new_users": q_daily_new_users,
    "orders_by_priority": q_orders_by_priority,
    "purchase_asof_click": q_purchase_asof_click,
    "error_context": q_error_context,
    "rolling_user_activity": q_rolling_user_activity,
    "conversion_funnel": q_conversion_funnel,
    "event_props_stats": q_event_props_stats,
    "distinct_users": q_distinct_users,
    "bloom_semijoin": q_bloom_semijoin,
    "revenue_by_nation": q_revenue_by_nation,
    "revenue_by_brand": q_revenue_by_brand,
    "shipping_priority": q_shipping_priority,
    "supplier_balance_by_region": q_supplier_balance_by_region,
    "pricing_summary": q_pricing_summary,
    # approx_distinct_users: sketch-valued (deterministic HLL), not
    # SQL-expressible — rows-only; pytest bounds it against the exact
    "approx_distinct_users": q_approx_distinct_users,
    "events_rollup": q_events_rollup,
    "value_histogram": q_value_histogram,
    "bottomk_sample": q_bottomk_sample,
    "value_quantile_sketch": q_value_quantile_sketch,
    "value_exact_quantiles": q_value_exact_quantiles,
    "value_cont_quantiles": q_value_cont_quantiles,
    "winsorized_value_stats": q_winsorized_value_stats,
    "weighted_sample": q_weighted_sample,
    "user_hours_click_and_purchase": q_user_hours_click_and_purchase,
    "user_hours_click_no_purchase": q_user_hours_click_no_purchase,
    "event_type_pivot": q_event_type_pivot,
    "anomalous_users": q_anomalous_users,
}

RELATIONAL_ORACLES: dict[str, str] = {
    "transcripts": f"WITH transcripts AS ({TRANSCRIPTS_FROM_EVENTS_SQL}) SELECT * FROM transcripts",
    "edges": GRAPH_SQL_PRELUDE + "SELECT * FROM edges",
    # incremental == full build: the FULL-build SQL is the oracle, the
    # hash compare is the idempotent-re-import equivalence proof
    "incremental_edges": GRAPH_SQL_PRELUDE
    + f"SELECT {', '.join(EDGE_OUT_COLS)} FROM edges",
    "vertices": GRAPH_SQL_PRELUDE + 'SELECT kind, "key", content, in_deg, out_deg FROM vertices',
    "top_in_degree": GRAPH_SQL_PRELUDE
    + 'SELECT kind, "key", in_deg FROM vertices ORDER BY in_deg DESC, kind, "key" LIMIT 50',
    "degree_threshold": GRAPH_SQL_PRELUDE
    + 'SELECT kind, "key", in_deg FROM vertices WHERE in_deg >= 5',
    "count_by_kind": GRAPH_SQL_PRELUDE
    + "SELECT kind, count(*) AS n FROM vertices GROUP BY kind",
    "degree_histogram": GRAPH_SQL_PRELUDE + DEGREE_HISTOGRAM_SQL_TAIL,
    "content_regex_count": GRAPH_SQL_PRELUDE
    + "SELECT count(*) AS n_match FROM vertices WHERE regexp_matches(content, ':error$')",
    "null_tool_scan": f"WITH transcripts AS ({TRANSCRIPTS_FROM_EVENTS_SQL}) "
    "SELECT role, count(*) AS n FROM transcripts WHERE tool IS NULL GROUP BY role",
    "point_lookup": GRAPH_SQL_PRELUDE
    + 'SELECT kind, "key", content, in_deg, out_deg FROM vertices '
    "WHERE kind = 'conv' AND \"key\" IN ('c1', 'c7', 'c11')",
    "transcript_sample": SAMPLE_ORACLE_SQL,
    "turns_per_hour": TURNS_PER_HOUR_SQL,
    "role_transitions": ROLE_TRANSITIONS_SQL,
    "user_sessions": USER_SESSIONS_SQL,
    "user_retention": USER_RETENTION_SQL,
    "latest_event_per_user": LATEST_EVENT_PER_USER_SQL,
    "daily_new_users": DAILY_NEW_USERS_SQL,
    "orders_by_priority": ORDERS_BY_PRIORITY_SQL,
    "purchase_asof_click": PURCHASE_ASOF_CLICK_SQL,
    "error_context": ERROR_CONTEXT_SQL,
    "rolling_user_activity": ROLLING_USER_ACTIVITY_SQL,
    "conversion_funnel": CONVERSION_FUNNEL_SQL,
    "event_props_stats": EVENT_PROPS_STATS_SQL,
    "distinct_users": DISTINCT_USERS_SQL,
    "bloom_semijoin": BLOOM_SEMIJOIN_SQL,
    "revenue_by_nation": REVENUE_BY_NATION_SQL,
    "revenue_by_brand": REVENUE_BY_BRAND_SQL,
    "shipping_priority": SHIPPING_PRIORITY_SQL,
    "supplier_balance_by_region": SUPPLIER_BALANCE_BY_REGION_SQL,
    "pricing_summary": PRICING_SUMMARY_SQL,
    "events_rollup": EVENTS_ROLLUP_SQL,
    "value_histogram": VALUE_HISTOGRAM_SQL,
    "bottomk_sample": _bottomk_sample_sql(),
    "value_quantile_sketch": _value_quantile_sketch_sql(),
    "value_exact_quantiles": VALUE_EXACT_QUANTILES_SQL,
    "value_cont_quantiles": VALUE_CONT_QUANTILES_SQL,
    "winsorized_value_stats": WINSORIZED_VALUE_STATS_SQL,
    "weighted_sample": _weighted_sample_sql(),
    "user_hours_click_and_purchase": USERS_INTERSECT_SQL,
    "user_hours_click_no_purchase": USERS_EXCEPT_SQL,
    "event_type_pivot": EVENT_TYPE_PIVOT_SQL,
    "anomalous_users": ANOMALOUS_USERS_SQL,
    "cross_kind_pattern": GRAPH_SQL_PRELUDE
    + """
    SELECT e.src_key AS conv_key, e.dst_key AS tool_key
    FROM edges e
    JOIN vertices vc ON vc.kind = 'conv' AND vc."key" = e.src_key
    JOIN vertices vt ON vt.kind = 'tool' AND vt."key" = e.dst_key
    WHERE e.src_kind = 'conv' AND e.dst_kind = 'tool'
      AND vt.in_deg >= 8 AND vc.out_deg >= 9
    ORDER BY conv_key, tool_key
    """,
}
