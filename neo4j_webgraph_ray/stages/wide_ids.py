"""128-bit vertex-id pipeline (the >10^8-key upgrade path, VERDICT r4 #3).

The 64-bit lean derivation (``derive.derive_edge_ids``) keys turn-dedup
and adjacency on ``hash64(conv_id)`` and emits ``hash64`` vertex ids —
collision odds ~n^2/2^65: negligible below ~10^8 keys, near-certain at
the 10^10-key regime this engine targets, and a collision there is a
SILENT wrong answer (two conversations' turn sequences merge; two
vertices alias).  The reference is collision-free by construction — its
Lucene get-or-create index assigns each distinct URL its own node
(``importer/BatchGraphImporter.java:173-197``).

This module is the distributed equivalent:

1. :func:`derive_edge_ids_wide` — the SAME fused one-pass derivation
   (batch-local adjacency, boundary-only shuffle, int-only exchange),
   with every key widened to an independent two-key hash pair
   ``(hi, lo)`` (``ids.hash128``).  A pair collision needs both
   independent 64-bit halves to collide: ~n^2/2^129, ~1e-20 at 10^10
   keys.
2. :func:`dense_ids_from_wide` — assigns each distinct endpoint pair a
   DENSE int64 engine id by distributed rank (hash-bucketed dedup, per
   bucket sort + prefix-sum offsets; the driver holds one count per
   bucket).  Dense ids are collision-free GIVEN pair distinctness and
   feed the existing superstep/CSR machinery unchanged — no engine
   internals widen.
3. :func:`derive_edge_ids_collision_free` — the composition; selected
   by ``NWR_WIDE_IDS=1`` (or ``wide_ids=True``) on
   ``derive.derive_edge_ids``.

Scale shape: step 1 shuffles only boundary turns (ints, now 5 columns
instead of 3); step 2 is one extra endpoint-dedup shuffle + an id
lookup join (size-gated broadcast vs bucketed co-group) — the price of
collision-freedom, paid only when the flag is on.  The string-keyed
``derive_edges`` path needs none of this (it never hashes, so it is
immune by construction; VERDICT r4 "What's missing" #1).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from neo4j_webgraph_ray.ids import KIND_CONV, KIND_ROLE, KIND_TOOL, hash128, vertex_id_wide
from neo4j_webgraph_ray.stages.core import BUCKET_COL

# structured dtype for (hi, lo) pair sort/searchsorted — numpy compares
# structured values field-by-field, so sort + searchsorted agree
PAIR_DT = np.dtype([("hi", np.int64), ("lo", np.int64)])


def _pairs_struct(hi: np.ndarray, lo: np.ndarray) -> np.ndarray:
    s = np.empty(len(hi), dtype=PAIR_DT)
    s["hi"] = hi
    s["lo"] = lo
    return s


def pair_lookup(
    sorted_pairs: np.ndarray, ids: np.ndarray, hi: np.ndarray, lo: np.ndarray
) -> np.ndarray:
    """ids[i] for each query (hi, lo) against a LEXSORTED pair array;
    raises on any miss (endpoint maps are total by construction — a
    miss means corrupted inputs, never a legitimate null)."""
    if len(hi) == 0:
        return np.empty(0, dtype=np.int64)
    q = _pairs_struct(hi, lo)
    idx = np.searchsorted(sorted_pairs, q)
    idx = np.minimum(idx, max(0, len(sorted_pairs) - 1))
    if len(sorted_pairs) == 0 or not (sorted_pairs[idx] == q).all():
        raise KeyError("pair_lookup: endpoint pair missing from id map")
    return ids[idx]


def derive_edge_ids_wide(
    transcripts: ray.data.Dataset, num_buckets: int = 128
) -> ray.data.Dataset:
    """Wide (hi, lo) edge list: conv→tool ∪ role-adjacency with ALL
    keying on independent 128-bit hash pairs — turn-dedup, adjacency
    and the boundary shuffle key on the pair, lifting
    ``derive_edge_ids``'s documented conv-hash collision caveat
    (``derive.py`` collision note).  Output columns:
    ``src_hi, src_lo, dst_hi, dst_lo`` (pre-dedup, like the 64-bit
    path; dedup happens downstream)."""

    def local(batch: pa.Table) -> pa.Table:
        # mirrors derive.derive_edge_ids.local — same fused one-pass
        # shape, every int64 key widened to its (hi, lo) pair
        conv = batch["conv_id"].to_numpy(zero_copy_only=False).astype(object)
        role = batch["role"].to_numpy(zero_copy_only=False).astype(object)
        cid_hi, cid_lo = hash128(conv)
        rid_hi, rid_lo = vertex_id_wide(KIND_ROLE, role)
        t = batch["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        tool_valid = pc.is_valid(batch["tool"]).to_numpy(zero_copy_only=False)
        if tool_valid.any():
            tl = batch["tool"].to_numpy(zero_copy_only=False)[tool_valid].astype(object)
            c_hi, c_lo = vertex_id_wide(KIND_CONV, conv[tool_valid])
            t_hi, t_lo = vertex_id_wide(KIND_TOOL, tl)
            ct_pairs = np.unique(np.stack([c_hi, c_lo, t_hi, t_lo], axis=1), axis=0)
        else:
            ct_pairs = np.empty((0, 4), dtype=np.int64)
        # role adjacency: sort by (conv pair, turn, role pair), drop
        # duplicate turns (min role-pair witness), link turn-delta-1 rows
        order = np.lexsort((rid_lo, rid_hi, t, cid_lo, cid_hi))
        cid_hi, cid_lo = cid_hi[order], cid_lo[order]
        t, rid_hi, rid_lo = t[order], rid_hi[order], rid_lo[order]
        if len(cid_hi):
            same_conv = (cid_hi[1:] == cid_hi[:-1]) & (cid_lo[1:] == cid_lo[:-1])
            dup = np.r_[False, same_conv & (t[1:] == t[:-1])]
            keep = ~dup
            cid_hi, cid_lo = cid_hi[keep], cid_lo[keep]
            t, rid_hi, rid_lo = t[keep], rid_hi[keep], rid_lo[keep]
        same_conv = (cid_hi[1:] == cid_hi[:-1]) & (cid_lo[1:] == cid_lo[:-1])
        adj = same_conv & (t[1:] == t[:-1] + 1)
        ra_pairs = (
            np.unique(
                np.stack(
                    [rid_hi[:-1][adj], rid_lo[:-1][adj], rid_hi[1:][adj], rid_lo[1:][adj]],
                    axis=1,
                ),
                axis=0,
            )
            if adj.any()
            else np.empty((0, 4), dtype=np.int64)
        )
        if len(cid_hi):
            has_succ = np.r_[adj, False]
            has_pred = np.r_[False, adj]
            bnd = ~(has_succ & has_pred)
        else:
            # empty batch: np.r_[empty, False] is length 1 and would
            # fail as a boolean index on the length-0 key arrays
            bnd = np.zeros(0, dtype=bool)
        pair = np.concatenate([ct_pairs, ra_pairs])
        n_b, n_p = int(bnd.sum()), len(pair)
        z = np.zeros(n_p, dtype=np.int64)
        return pa.table(
            {
                "cid_hi": pa.array(np.r_[cid_hi[bnd], z], type=pa.int64()),
                "cid_lo": pa.array(np.r_[cid_lo[bnd], z], type=pa.int64()),
                "turn_idx": pa.array(
                    np.r_[t[bnd], np.full(n_p, -1, dtype=np.int64)].astype(np.int32)
                ),
                "a_hi": pa.array(np.r_[rid_hi[bnd], pair[:, 0]], type=pa.int64()),
                "a_lo": pa.array(np.r_[rid_lo[bnd], pair[:, 1]], type=pa.int64()),
                "b_hi": pa.array(np.r_[np.zeros(n_b, np.int64), pair[:, 2]], type=pa.int64()),
                "b_lo": pa.array(np.r_[np.zeros(n_b, np.int64), pair[:, 3]], type=pa.int64()),
                # explicit marker — NEVER a sentinel id value (any int64
                # is a legitimate hash half in the wide space)
                "is_pair": pa.array(
                    np.r_[np.zeros(n_b, np.int8), np.ones(n_p, np.int8)]
                ),
                BUCKET_COL: pa.array(
                    (
                        np.r_[cid_hi[bnd], pair[:, 0]].view(np.uint64)
                        % np.uint64(num_buckets)
                    ).astype(np.int32)
                ),
            }
        )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        is_pair = df["is_pair"].to_numpy() == 1
        resolved = pd.DataFrame(
            {
                "src_hi": df["a_hi"].to_numpy()[is_pair],
                "src_lo": df["a_lo"].to_numpy()[is_pair],
                "dst_hi": df["b_hi"].to_numpy()[is_pair],
                "dst_lo": df["b_lo"].to_numpy()[is_pair],
            }
        )
        b = df[~is_pair].sort_values(
            ["cid_hi", "cid_lo", "turn_idx", "a_hi", "a_lo"], kind="stable"
        )
        b = b.drop_duplicates(["cid_hi", "cid_lo", "turn_idx"], keep="first")
        chi = b["cid_hi"].to_numpy()
        clo = b["cid_lo"].to_numpy()
        t = b["turn_idx"].to_numpy()
        rhi = b["a_hi"].to_numpy()
        rlo = b["a_lo"].to_numpy()
        if len(b) < 2:
            adj = np.zeros(0, dtype=bool)
        else:
            adj = (
                (chi[1:] == chi[:-1]) & (clo[1:] == clo[:-1]) & (t[1:] == t[:-1] + 1)
            )
        bridged = pd.DataFrame(
            {
                "src_hi": rhi[:-1][adj],
                "src_lo": rlo[:-1][adj],
                "dst_hi": rhi[1:][adj],
                "dst_lo": rlo[1:][adj],
            }
        )
        return pd.concat([resolved, bridged], ignore_index=True).drop_duplicates()

    staged = transcripts.map_batches(
        local, batch_format="pyarrow", zero_copy_batch=True
    )
    return staged.groupby(BUCKET_COL).map_groups(per_bucket, batch_format="pandas")


def dense_ids_from_wide(
    wide_edges: ray.data.Dataset,
    num_buckets: int = 32,
    broadcast_limit: int = 2_000_000,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """(edges with dense int64 ``src``/``dst``, mapping Dataset
    ``(hi, lo, id)``): distributed get-or-create over 128-bit endpoint
    pairs.

    Dense-rank assignment (the ``dense_rank_vkeys`` pattern): distinct
    endpoints dedup into hash buckets (same pair → same bucket, so
    per-bucket dedup is global), the driver holds ONE count per bucket
    for the prefix-sum offsets, and each bucket sorts locally — ids are
    0..V-1, bijective with distinct pairs, i.e. collision-free given
    128-bit distinctness.  The id map joins back onto both endpoints
    size-gated: lexsorted flat arrays broadcast under
    ``broadcast_limit`` distinct vertices, bucketed co-group beyond
    (two merges keyed by ``hi`` buckets — nothing driver-side)."""
    wide_edges = wide_edges.materialize()  # feeds dedup AND both joins

    def endpoints(t: pa.Table) -> pa.Table:
        hi = np.r_[t["src_hi"].to_numpy(), t["dst_hi"].to_numpy()]
        lo = np.r_[t["src_lo"].to_numpy(), t["dst_lo"].to_numpy()]
        u = np.unique(np.stack([hi, lo], axis=1), axis=0) if len(hi) else np.empty((0, 2), np.int64)
        return pa.table(
            {
                "hi": pa.array(u[:, 0], type=pa.int64()),
                "lo": pa.array(u[:, 1], type=pa.int64()),
                BUCKET_COL: pa.array(
                    (u[:, 0].view(np.uint64) % np.uint64(num_buckets)).astype(np.int32)
                ),
            }
        )

    def dedup_bucket(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["hi", "lo"])[[BUCKET_COL, "hi", "lo"]]

    distinct = (
        wide_edges.map_batches(endpoints, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(BUCKET_COL)
        .map_groups(dedup_bucket, batch_format="pandas")
        .materialize()
    )
    counts = distinct.groupby(BUCKET_COL).count().to_pandas()
    counts = counts.sort_values(BUCKET_COL)
    # <= num_buckets rows on the driver — bounded by construction
    offsets = dict(
        zip(
            counts[BUCKET_COL].to_numpy(),
            np.concatenate([[0], np.cumsum(counts["count()"].to_numpy())[:-1]]),
        )
    )

    def rank_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["hi", "lo"], kind="stable")
        base = int(offsets[int(df[BUCKET_COL].iloc[0])])
        return pd.DataFrame(
            {
                "hi": df["hi"].to_numpy(),
                "lo": df["lo"].to_numpy(),
                "id": base + np.arange(len(df), dtype=np.int64),
            }
        )

    mapping = (
        distinct.groupby(BUCKET_COL)
        .map_groups(rank_bucket, batch_format="pandas")
        .materialize()
    )
    n_vertices = mapping.count()

    if n_vertices <= broadcast_limit:
        ks, vs = [], []
        for b in mapping.iter_batches(batch_size=65536, batch_format="pyarrow"):
            ks.append(_pairs_struct(b["hi"].to_numpy(), b["lo"].to_numpy()))
            vs.append(b["id"].to_numpy(zero_copy_only=False))
        pairs = np.concatenate(ks) if ks else np.empty(0, dtype=PAIR_DT)
        ids = np.concatenate(vs) if vs else np.empty(0, dtype=np.int64)
        order = np.argsort(pairs, kind="stable")
        ref = ray.put((pairs[order], ids[order]))

        def attach(t: pa.Table) -> pa.Table:
            p_, i_ = ray.get(ref)
            src = pair_lookup(p_, i_, t["src_hi"].to_numpy(), t["src_lo"].to_numpy())
            dst = pair_lookup(p_, i_, t["dst_hi"].to_numpy(), t["dst_lo"].to_numpy())
            return pa.table(
                {"src": pa.array(src, type=pa.int64()),
                 "dst": pa.array(dst, type=pa.int64())}
            )

        edges = wide_edges.map_batches(
            attach, batch_format="pyarrow", zero_copy_batch=True
        )
        return edges, mapping

    # scale path: two bucketed co-group joins keyed by hi buckets
    edges = _attach_endpoint(
        wide_edges, mapping, "src", carry_cols=["dst_hi", "dst_lo"],
        num_buckets=num_buckets,
    )
    edges = _attach_endpoint(
        edges, mapping, "dst", carry_cols=["src"], num_buckets=num_buckets
    )
    return edges.select_columns(["src", "dst"]), mapping


def _attach_endpoint(
    edges: ray.data.Dataset,
    mapping: ray.data.Dataset,
    which: str,
    carry_cols: list[str],
    num_buckets: int,
) -> ray.data.Dataset:
    """Co-group join of the id map onto ONE endpoint: both sides bucket
    by ``hi % B`` (same pair, same bucket), each bucket merges on the
    full (hi, lo) pair.  ``carry_cols`` are the edge side's remaining
    int64 columns; the map side carries typed zero defaults so the
    union's partial concats can never coerce dtypes (the same
    side-tagged discipline as ``_lookup_join``'s scale path)."""
    hi_col, lo_col = f"{which}_hi", f"{which}_lo"
    cols = [hi_col, lo_col, *carry_cols, "id", "_t", BUCKET_COL]

    def tag_edges(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[hi_col, lo_col, *carry_cols]].copy(deep=False)
        out["id"] = np.int64(0)
        out["_t"] = np.int8(0)
        out[BUCKET_COL] = (
            df[hi_col].to_numpy().view(np.uint64) % np.uint64(num_buckets)
        ).astype(np.int32)
        return out[cols]

    def tag_map(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {hi_col: df["hi"].to_numpy(), lo_col: df["lo"].to_numpy()}
        )
        for c in carry_cols:
            out[c] = np.zeros(len(df), dtype=np.int64)
        out["id"] = df["id"].to_numpy()
        out["_t"] = np.int8(1)
        out[BUCKET_COL] = (
            df["hi"].to_numpy().view(np.uint64) % np.uint64(num_buckets)
        ).astype(np.int32)
        return out[cols]

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        is_m = df["_t"].to_numpy() == 1
        mp = df.loc[is_m, [hi_col, lo_col, "id"]]
        dt = df.loc[~is_m, [hi_col, lo_col, *carry_cols]]
        out = dt.merge(mp, on=[hi_col, lo_col], how="inner")
        if len(out) != len(dt):
            raise KeyError(
                f"dense_ids_from_wide: {which} endpoint missing from id map"
            )
        return out.rename(columns={"id": which})[[*carry_cols, which]]

    both = edges.map_batches(tag_edges, batch_format="pandas").union(
        mapping.map_batches(tag_map, batch_format="pandas")
    )
    return both.groupby(BUCKET_COL).map_groups(combine, batch_format="pandas")


def derive_edge_ids_collision_free(
    transcripts: ray.data.Dataset,
    num_buckets: int = 128,
    id_map_buckets: int = 32,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Wide derivation + dense id assignment: (edges with collision-free
    dense int64 ``src``/``dst``, mapping ``(hi, lo, id)``).  The edge
    Dataset feeds ``SuperstepEngine.prepare`` unchanged."""
    wide = derive_edge_ids_wide(transcripts, num_buckets=num_buckets)
    return dense_ids_from_wide(wide, num_buckets=id_map_buckets)
