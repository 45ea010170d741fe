"""Edge derivation from transcripts (replaces the reference's crawler source).

The reference extracts one node per fetched page plus ``LINKS_TO`` edges
to each out-link (``importer/HtmlOnlyCrawler.java:147-197`` →
``importer/TransactionalGraphImporter.java:255-343``).  Here the graph
is derived from the transcript table (SURVEY.md §7.2):

- **conv→tool**: each row with non-null ``tool`` yields an edge
  ``v(conv:conv_id) → v(tool:tool)`` — a stateless vectorized
  ``map_batches`` over zero-copy Arrow batches, no shuffle.
- **role adjacency**: within each ``conv_id``, sort turns by
  ``turn_idx`` (stable) and pair consecutive turns:
  ``v(role:role[i]) → v(role:role[i+1])`` — requires co-locating each
  conversation, done with the bounded-bucket shuffle keyed by
  ``hash(conv_id) % num_buckets`` and a vectorized per-bucket pairing
  (no per-conversation Python call).

Edge schema (FIXTURES.md F2): ``src:int64, dst:int64`` hashed vertex
ids, plus readable endpoint keys (``src_kind, src_key, dst_kind,
dst_key``) and provenance (``conv_id, turn_idx``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from neo4j_webgraph_ray.ids import KIND_CONV, KIND_ROLE, KIND_TOOL, hash64, vertex_id
from neo4j_webgraph_ray.stages.core import BUCKET_COL, add_bucket_column, bucketed_groupby

EDGE_COLUMNS = [
    "src", "dst", "src_kind", "src_key", "dst_kind", "dst_key", "conv_id", "turn_idx",
]


def _edge_table(
    src_kind: str,
    src_key: np.ndarray,
    dst_kind: str,
    dst_key: np.ndarray,
    conv_id: np.ndarray,
    turn_idx: np.ndarray,
) -> pa.Table:
    return pa.table(
        {
            "src": pa.array(vertex_id(src_kind, src_key), type=pa.int64()),
            "dst": pa.array(vertex_id(dst_kind, dst_key), type=pa.int64()),
            "src_kind": pa.array(np.full(len(src_key), src_kind, dtype=object), type=pa.string()),
            "src_key": pa.array(src_key, type=pa.string()),
            "dst_kind": pa.array(np.full(len(dst_key), dst_kind, dtype=object), type=pa.string()),
            "dst_key": pa.array(dst_key, type=pa.string()),
            "conv_id": pa.array(conv_id, type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
        }
    )


def conv_tool_edge_batch(batch: pa.Table) -> pa.Table:
    """Arrow batch -> conv→tool edge rows (stateless, vectorized)."""
    t = batch.filter(pc.is_valid(batch["tool"]))
    conv = t["conv_id"].to_numpy(zero_copy_only=False).astype(object)
    tool = t["tool"].to_numpy(zero_copy_only=False).astype(object)
    return _edge_table(
        KIND_CONV,
        conv,
        KIND_TOOL,
        tool,
        conv,
        t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int32),
    )


def derive_conv_tool_edges(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    return transcripts.map_batches(
        conv_tool_edge_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def _dedup_turns(df: pd.DataFrame) -> pd.DataFrame:
    """At most one row per (conv_id, turn_idx) — the transcript analog of
    the reference's get-or-create ("re-adding a page doesn't change
    anything", ``GraphImporterTestBase.java:156-184``).  Witness choice
    is deterministic (min role) so results never depend on block order.
    """
    df = df.sort_values(["conv_id", "turn_idx", "role"], kind="stable")
    return df.drop_duplicates(["conv_id", "turn_idx"], keep="first")


def role_adjacency_group(df: pd.DataFrame) -> pd.DataFrame:
    """Vectorized pairing over a bucket of whole conversations.

    Stable sort by (conv_id, turn_idx) then pair row i with row i+1
    where both belong to the same conversation AND the turn indices are
    consecutive (delta exactly 1) — the semantics the SQL oracle's
    ``b.turn_idx = a.turn_idx + 1`` join and the lean
    ``derive_edge_ids`` path implement; a gap in turn_idx (e.g. a
    rejected malformed turn) asserts no adjacency.  Never relies on
    block order.
    """
    df = _dedup_turns(df)
    conv = df["conv_id"].to_numpy().astype(object)
    role = df["role"].to_numpy().astype(object)
    turn = df["turn_idx"].to_numpy().astype(np.int32)
    if len(df) < 2:
        same = np.zeros(0, dtype=bool)
    else:
        same = (conv[:-1] == conv[1:]) & (turn[1:] == turn[:-1] + 1)
    src_role = role[:-1][same]
    dst_role = role[1:][same]
    out_conv = conv[:-1][same]
    out_turn = turn[:-1][same]
    return _edge_table(
        KIND_ROLE, src_role, KIND_ROLE, dst_role, out_conv, out_turn
    ).to_pandas()


def derive_role_adjacency_edges(
    transcripts: ray.data.Dataset, num_buckets: int = 64
) -> ray.data.Dataset:
    """Role-to-role turn-adjacency edges, one bounded shuffle on conv_id."""

    def local(df: pd.DataFrame) -> pd.DataFrame:
        # Pre-dedup within the batch (same deterministic witness rule as
        # the final pass — algebraic) to shrink the shuffle.
        deduped = _dedup_turns(df[["conv_id", "turn_idx", "role"]])
        return add_bucket_column(deduped, ["conv_id"], num_buckets)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return role_adjacency_group(df.drop(columns=[BUCKET_COL]))

    staged = transcripts.map_batches(local, batch_format="pandas")
    return staged.groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pandas")


def _dedup_edges_combine(df: pd.DataFrame) -> pd.DataFrame:
    """Keep one row per (src, dst); provenance = earliest witness
    (min conv_id, min turn_idx per column — deterministic, algebraic).

    Mirrors reference edge dedup: "re-adding a link ... shouldn't change
    anything" (``AbstractObservableGraphImporter.java:107-136``,
    ``GraphImporterTestBase.java:156-166``).
    """
    return (
        df.groupby(
            ["src", "dst", "src_kind", "src_key", "dst_kind", "dst_key"],
            as_index=False,
            sort=False,
        )
        .agg(conv_id=("conv_id", "min"), turn_idx=("turn_idx", "min"))
    )


def dedup_edges(edges: ray.data.Dataset, num_buckets: int = 64) -> ray.data.Dataset:
    return bucketed_groupby(
        edges, ["src", "dst"], _dedup_edges_combine, num_buckets=num_buckets
    )


_FUSED_COLUMNS = [*EDGE_COLUMNS, "content", "content_order", "out_c", "in_c", "_t"]


def coerce_candidate_cols(df: pd.DataFrame) -> pd.DataFrame:
    """Re-coerce the numeric vertex-candidate columns after the fused
    exchange: the union of all row families into one schema can
    object-ify them (single place for this invariant — used by the
    in-exchange combine and by graph_tables' family-2 selector)."""
    df["content_order"] = pd.to_numeric(df["content_order"])
    df["out_c"] = pd.to_numeric(df["out_c"]).astype(np.int64)
    df["in_c"] = pd.to_numeric(df["in_c"]).astype(np.int64)
    return df


def fused_graph_stream(
    transcripts: ray.data.Dataset,
    num_buckets: int = 64,
    content_fns: tuple | None = None,
) -> ray.data.Dataset:
    """ONE pass over the transcripts producing every graph-build row
    family through a single bucketed exchange (the former per-family
    branches each re-executed the read and the events adapter's own
    shuffle):

    - family 0: conv→tool edges — locally pre-deduped, routed by
      ``src`` hash, so the in-bucket merge IS the global merge;
    - family 1: role-adjacency partials — turn rows locally
      turn-deduped, routed by ``conv_id`` hash, paired per co-located
      conversation; only these tiny partials (role domain² rows per
      bucket) need a later global provenance-min merge;
    - family 2 (when ``content_fns`` is given): per-conversation content
      candidates — locally combined to one row per conv per batch,
      routed by ``conv_id`` hash, so the in-bucket content merge is
      global too.  ``content_fns = (candidates_fn, combine_fn)`` is
      injected by graph_tables (avoids a module cycle).

    The result is pinned (``materialize``): it is the deduplicated
    aggregate — far smaller than the input — and is consumed by several
    downstream family selectors."""

    def _normalize(frame: pd.DataFrame) -> pd.DataFrame:
        """Fill missing fused-schema columns with TYPED defaults —
        pd.concat of partial frames would coerce absent int64 id
        columns to float64, silently corrupting hash ids above 2^53."""
        n = len(frame)
        defaults = {
            "src": np.zeros(n, dtype=np.int64),
            "dst": np.zeros(n, dtype=np.int64),
            "src_kind": None, "src_key": None, "dst_kind": None,
            "dst_key": None, "conv_id": None,
            "turn_idx": np.zeros(n, dtype=np.int32),
            "content": None,
            "content_order": np.full(n, np.nan),
            "out_c": np.zeros(n, dtype=np.int64),
            "in_c": np.zeros(n, dtype=np.int64),
        }
        out = frame.copy(deep=False)
        for col in _FUSED_COLUMNS:
            if col not in out.columns:
                out[col] = defaults.get(col)
        cols = (
            [*_FUSED_COLUMNS, BUCKET_COL]
            if BUCKET_COL in out.columns
            else list(_FUSED_COLUMNS)
        )
        return out[cols]

    def local(df: pd.DataFrame) -> pd.DataFrame:
        ct = conv_tool_edge_batch(
            pa.Table.from_pandas(df, preserve_index=False)
        ).to_pandas()
        ct = _dedup_edges_combine(ct)
        ct["_t"] = np.int8(0)
        ct[BUCKET_COL] = (
            ct["src"].to_numpy().view(np.uint64) % np.uint64(num_buckets)
        ).astype(np.int32)
        turns = _dedup_turns(df[["conv_id", "turn_idx", "role"]]).copy(deep=False)
        turns = turns.rename(columns={"role": "src_key"})  # role rides src_key
        turns["_t"] = np.int8(1)
        turns[BUCKET_COL] = (
            hash64(turns["conv_id"].to_numpy().astype(object)).view(np.uint64)
            % np.uint64(num_buckets)
        ).astype(np.int32)
        frames = [_normalize(ct), _normalize(turns)]
        if content_fns is not None:
            candidates_fn, combine_fn = content_fns
            cc = combine_fn(candidates_fn(pa.Table.from_pandas(df, preserve_index=False)))
            cc = cc.rename(columns={"kind": "src_kind", "key": "src_key"})
            cc["_t"] = np.int8(2)
            cc[BUCKET_COL] = (
                hash64(cc["src_key"].to_numpy().astype(object)).view(np.uint64)
                % np.uint64(num_buckets)
            ).astype(np.int32)
            frames.append(_normalize(cc))
        return pd.concat(frames, ignore_index=True)

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        fam = df["_t"].to_numpy()
        ct = _dedup_edges_combine(df.loc[fam == 0, EDGE_COLUMNS])
        ct["_t"] = np.int8(0)
        turns = df.loc[fam == 1, ["conv_id", "turn_idx", "src_key"]].rename(
            columns={"src_key": "role"}
        )
        ra = role_adjacency_group(turns)
        ra = _dedup_edges_combine(ra) if len(ra) else ra
        ra["_t"] = np.int8(1)
        frames = [_normalize(ct), _normalize(ra)]
        if content_fns is not None:
            candidates_fn, combine_fn = content_fns
            cc = coerce_candidate_cols(
                df.loc[fam == 2]
                .rename(columns={"src_kind": "kind", "src_key": "key"})
                .copy(deep=False)
            )
            cc = combine_fn(
                cc[["kind", "key", "content", "content_order", "out_c", "in_c"]]
            )
            cc = cc.rename(columns={"kind": "src_kind", "key": "src_key"})
            cc["_t"] = np.int8(2)
            frames.append(_normalize(cc))
        return pd.concat(frames, ignore_index=True)

    staged = transcripts.map_batches(local, batch_format="pandas")
    return staged.groupby(BUCKET_COL).map_groups(
        per_bucket, batch_format="pandas"
    ).materialize()


def edges_from_fused(
    fused: ray.data.Dataset, num_buckets: int = 8
) -> ray.data.Dataset:
    """conv→tool (already global-deduped) ∪ globally-merged role
    partials, normalized to Arrow blocks (a union of mixed pandas/arrow
    block types breaks downstream concat)."""

    def take_family(which: int):
        def fn(t: pa.Table) -> pa.Table:
            kept = t.filter(pc.equal(t["_t"], which))
            return kept.select(EDGE_COLUMNS)

        return fn

    ct_final = fused.map_batches(take_family(0), batch_format="pyarrow")
    ra_final = dedup_edges(
        fused.map_batches(take_family(1), batch_format="pyarrow"),
        num_buckets=num_buckets,
    ).map_batches(
        lambda df: pa.Table.from_pandas(df[EDGE_COLUMNS], preserve_index=False),
        batch_format="pandas",
    )
    return ct_final.union(ra_final)


def derive_edges(
    transcripts: ray.data.Dataset, num_buckets: int = 64
) -> ray.data.Dataset:
    """Full deduplicated edge table: conv→tool ∪ role-adjacency, one
    fused input pass (see :func:`fused_graph_stream`)."""
    return edges_from_fused(fused_graph_stream(transcripts, num_buckets))


# -- lean id-only derivation (algorithm/bench path) -------------------------


def conv_tool_edge_ids_batch(batch: pa.Table) -> pa.Table:
    """conv→tool edges as pure int64 (src, dst) — no key/provenance
    columns, ~10× less shuffle volume than the full edge table.
    Batch-local exact dedup (repeat tool calls within a conversation
    collapse here; the global dedup downstream sees far fewer rows)."""
    t = batch.filter(pc.is_valid(batch["tool"]))
    conv = t["conv_id"].to_numpy(zero_copy_only=False).astype(object)
    tool = t["tool"].to_numpy(zero_copy_only=False).astype(object)
    pairs = np.stack(
        [vertex_id(KIND_CONV, conv), vertex_id(KIND_TOOL, tool)], axis=1
    )
    if len(pairs):
        pairs = np.unique(pairs, axis=0)
    return pa.table(
        {
            "src": pa.array(pairs[:, 0] if len(pairs) else np.empty(0, np.int64),
                            type=pa.int64()),
            "dst": pa.array(pairs[:, 1] if len(pairs) else np.empty(0, np.int64),
                            type=pa.int64()),
        }
    )


def derive_edge_ids(
    transcripts: ray.data.Dataset, num_buckets: int = 128,
    wide_ids: bool | None = None,
) -> ray.data.Dataset:
    """Raw (pre-dedup) int64 edge list for the iterative-algorithm path:
    conv→tool ∪ role-adjacency, all string work done batch-locally so
    the role-adjacency shuffle moves only three int columns
    (hash(conv_id), turn_idx, role-vertex id) and sorts on ints.

    Same edge SET as :func:`derive_edges` (dedup happens downstream,
    e.g. fused into ``SuperstepEngine.prepare(dedup=True)``); the
    duplicate-turn witness rule differs (min role-id instead of min
    role-string) — irrelevant for inputs with unique (conv_id,
    turn_idx), which the clean stage guarantees.

    Collision note (see also ids.py): in the default 64-bit mode, turn
    dedup and adjacency key on ``hash64(conv_id)``, so a 64-bit
    collision between two conv_ids would silently merge their turn
    sequences and fabricate adjacency edges in THIS lean path only (the
    string-keyed ``derive_edges`` path is immune).  Expected collisions
    ~n²/2^65: negligible below ~10^8 conversations.  BEYOND that scale
    pass ``wide_ids=True`` (or set ``NWR_WIDE_IDS=1``): the derivation
    runs on independent 128-bit (hi, lo) hash pairs and assigns
    collision-free dense int64 engine ids by distributed rank
    (``stages/wide_ids.py``) — same output contract (int64 src/dst,
    usable by ``prepare()`` unchanged), one extra endpoint-dedup
    shuffle + id join as the price of collision-freedom."""
    if wide_ids is None:
        from neo4j_webgraph_ray.ids import wide_ids_enabled

        wide_ids = wide_ids_enabled()
    if wide_ids:
        from neo4j_webgraph_ray.stages.wide_ids import (
            derive_edge_ids_collision_free,
        )

        edges, _ = derive_edge_ids_collision_free(
            transcripts, num_buckets=num_buckets
        )
        return edges

    def local(batch: pa.Table) -> pa.Table:
        """ONE pass over the input: conv→tool edges and role adjacency
        both resolved batch-locally; only undecidable rows shuffle.

        - conv→tool: computed and deduped in-batch, emitted as resolved
          pair rows routed by src hash (same (src, dst) always lands in
          one bucket, so the per-bucket dedup is global — prepare's own
          dedup then sees an already-distinct stream).
        - role adjacency: after a local (cid, turn, rid) sort +
          in-batch duplicate-turn dedup (min-rid witness), consecutive
          rows with the same conv and turn delta 1 are REAL edges (turn
          uniqueness per conv is guaranteed by the clean stage) — they
          collapse to a handful of distinct pairs per batch.  Only
          *boundary* turns (missing their predecessor or successor in
          the batch) cross the shuffle: ~2 rows per conversation for
          contiguous layouts instead of every turn.  Both endpoints of
          any cross-batch adjacency are boundary rows by construction,
          so the per-bucket pass recovers exactly the missing pairs.

        Fusing both derivations into one map means the input is read
        and string-hashed ONCE (the previous two-branch union executed
        the read twice)."""
        conv = batch["conv_id"].to_numpy(zero_copy_only=False).astype(object)
        role = batch["role"].to_numpy(zero_copy_only=False).astype(object)
        cid = hash64(conv)
        rid = vertex_id(KIND_ROLE, role)
        t = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        # conv→tool pairs, deduped in-batch
        tool_valid = pc.is_valid(batch["tool"]).to_numpy(zero_copy_only=False)
        if tool_valid.any():
            tl = batch["tool"].to_numpy(zero_copy_only=False)[tool_valid].astype(object)
            ct_pairs = np.unique(
                np.stack(
                    [vertex_id(KIND_CONV, conv[tool_valid]), vertex_id(KIND_TOOL, tl)],
                    axis=1,
                ),
                axis=0,
            )
        else:
            ct_pairs = np.empty((0, 2), dtype=np.int64)
        # role adjacency
        order = np.lexsort((rid, t, cid))
        cid, t, rid = cid[order], t[order], rid[order]
        if len(cid):
            dup = np.r_[False, (cid[1:] == cid[:-1]) & (t[1:] == t[:-1])]
            cid, t, rid = cid[~dup], t[~dup], rid[~dup]
        adj = (cid[1:] == cid[:-1]) & (t[1:] == t[:-1] + 1)
        ra_pairs = (
            np.unique(np.stack([rid[:-1][adj], rid[1:][adj]], axis=1), axis=0)
            if adj.any()
            else np.empty((0, 2), dtype=np.int64)
        )
        if len(cid):
            has_succ = np.r_[adj, False]
            has_pred = np.r_[False, adj]
            bnd = ~(has_succ & has_pred)
        else:
            # np.r_[empty, False] is length 1, which a boolean index
            # against the length-0 arrays would reject — empty batches
            # (over-split reads, upstream filters) emit zero rows
            bnd = np.zeros(0, dtype=bool)
        pair = np.concatenate([ct_pairs, ra_pairs])
        n_b, n_p = int(bnd.sum()), len(pair)
        return pa.table(
            {
                "cid": pa.array(
                    np.r_[cid[bnd], np.zeros(n_p, dtype=np.int64)], type=pa.int64()
                ),
                "turn_idx": pa.array(
                    np.r_[t[bnd], np.full(n_p, -1, dtype=np.int64)].astype(np.int32)
                ),
                "rid": pa.array(
                    np.r_[rid[bnd], pair[:, 0]], type=pa.int64()
                ),
                "rid2": pa.array(
                    np.r_[np.full(n_b, -1, dtype=np.int64), pair[:, 1]],
                    type=pa.int64(),
                ),
                BUCKET_COL: pa.array(
                    (
                        np.r_[cid[bnd], pair[:, 0]].view(np.uint64)
                        % np.uint64(num_buckets)
                    ).astype(np.int32)
                ),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        is_pair = df["rid2"].to_numpy() != -1
        resolved = pd.DataFrame(
            {"src": df["rid"].to_numpy()[is_pair], "dst": df["rid2"].to_numpy()[is_pair]}
        )
        b = df[~is_pair].sort_values(["cid", "turn_idx", "rid"], kind="stable")
        b = b.drop_duplicates(["cid", "turn_idx"], keep="first")
        cid = b["cid"].to_numpy()
        t = b["turn_idx"].to_numpy()
        rid = b["rid"].to_numpy()
        if len(b) < 2:
            adj = np.zeros(0, dtype=bool)
        else:
            adj = (cid[1:] == cid[:-1]) & (t[1:] == t[:-1] + 1)
        bridged = pd.DataFrame({"src": rid[:-1][adj], "dst": rid[1:][adj]})
        return pd.concat([resolved, bridged], ignore_index=True).drop_duplicates()

    staged = transcripts.map_batches(
        local, batch_format="pyarrow", zero_copy_batch=True
    )
    return staged.groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pandas")
