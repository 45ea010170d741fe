"""Triangle counting — degree-ordered orientation + wedge/edge semi-join.

The one genuinely join-heavy algorithm (SURVEY.md §7.5): count unordered
vertex triples pairwise connected in the undirected simple graph
(self-loops and duplicate edges ignored — FIXTURES.md F4 policy).

Scale design: orienting every edge from its lower-(degree, id) endpoint
to the higher bounds each vertex's oriented out-degree by O(sqrt(m)), so
wedge generation is sum over u of C(out(u), 2) — the standard
compact-forward bound — instead of sum of deg².  All wide steps are
bucketed hash shuffles (no broadcast of the edge set), so the pipeline
holds at edge tables that do not fit one node:

  1. undirected simple edges   — distinct (min,max) pairs   [shuffle (a,b)]
  2. degrees                   — sum per endpoint           [shuffle v]
  3. attach degrees to ends    — two co-grouped hash joins  [shuffle a; b]
  4. orient + wedge pairs      — per-src neighbor pairing   [shuffle lo]
  5. candidate ∩ edge          — co-group candidates+edges  [shuffle (x,y)]
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from neo4j_webgraph_ray.stages.core import (
    BUCKET_COL,
    add_bucket_column,
    bucketed_groupby,
    pair_indices_within_groups,
)


def _cogroup(ds: ray.data.Dataset, keys, combine, num_buckets: int) -> ray.data.Dataset:
    """Bucketed co-group WITHOUT local pre-combine (the combine is a
    join of tagged row groups, not an algebraic aggregate)."""
    return bucketed_groupby(ds, keys, combine, num_buckets=num_buckets, local_combine=False)


def undirected_simple(edges: ray.data.Dataset, num_buckets: int = 64) -> ray.data.Dataset:
    """Distinct (a=min(src,dst), b=max) pairs, self-loops dropped."""

    def canon(t: pa.Table) -> pa.Table:
        src = t["src"].to_numpy()
        dst = t["dst"].to_numpy()
        m = src != dst
        src, dst = src[m], dst[m]
        a = np.minimum(src, dst)
        b = np.maximum(src, dst)
        return pa.table({"a": pa.array(a, type=pa.int64()), "b": pa.array(b, type=pa.int64())})

    canoned = edges.map_batches(canon, batch_format="pyarrow", zero_copy_batch=True)
    return bucketed_groupby(
        canoned, ["a", "b"], lambda df: df.drop_duplicates(["a", "b"]), num_buckets=num_buckets
    )


def _attach_degree(
    und_like: ray.data.Dataset,
    deg: ray.data.Dataset,
    key_col: str,
    carry_cols: list[str],
    out_col: str,
    num_buckets: int,
) -> ray.data.Dataset:
    """Hash-join degree onto one endpoint.  Both sides are mapped to a
    unified schema (k, carry..., c, _t) so the union has one schema."""

    def tag_edges(df: pd.DataFrame) -> pd.DataFrame:
        out = df.rename(columns={key_col: "k"})[["k", *carry_cols]].copy(deep=False)
        out["c"] = np.int64(0)
        out["_t"] = np.int8(0)
        return out

    def tag_deg(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"k": df["v"].to_numpy()})
        for col in carry_cols:
            out[col] = np.int64(0)
        out["c"] = df["c"].to_numpy().astype(np.int64)
        out["_t"] = np.int8(1)
        return out

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        dd = df[df["_t"] == 1]
        ee = df[df["_t"] == 0]
        # typed searchsorted lookup, NEVER pandas .map(dict): a map
        # with any missing key materializes a float64 intermediate that
        # silently rounds int64 ids above 2^53 (queries.py:_lookup_join
        # rule; VERDICT r3 #4).  Every endpoint has a degree row by
        # construction — asserted, not assumed.
        keys = dd["k"].to_numpy()
        order = np.argsort(keys, kind="stable")
        keys = keys[order]
        vals = dd["c"].to_numpy().astype(np.int64)[order]
        x = ee["k"].to_numpy()
        idx = np.searchsorted(keys, x)
        idx = np.minimum(idx, max(0, len(keys) - 1))
        # explicit raise, not `assert` (stripped under python -O): a
        # miss here would otherwise gather a NEIGHBOR key's degree
        if not len(keys) or not (keys[idx] == x).all():
            raise RuntimeError("edge endpoint missing a degree row")
        out = ee[["k", *carry_cols]].copy(deep=False)
        out[out_col] = vals[idx]
        return out.rename(columns={"k": key_col})

    both = und_like.map_batches(tag_edges, batch_format="pandas").union(
        deg.map_batches(tag_deg, batch_format="pandas")
    )
    return _cogroup(both, ["k"], combine, num_buckets)


def undirected_with_degrees(
    edges: ray.data.Dataset, num_buckets: int = 64
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """((a, b, deg_a, deg_b), (v, c)) — the undirected simple edge list
    with both endpoint simple degrees attached (two bucketed hash
    joins), plus the degree table itself.  Shared by the degree-ordered
    orientation and the graph-summary statistics."""
    und = undirected_simple(edges, num_buckets)

    def deg_rows(t: pa.Table) -> pa.Table:
        ids = np.r_[t["a"].to_numpy(), t["b"].to_numpy()]
        u, c = np.unique(ids, return_counts=True)
        return pa.table({"v": pa.array(u, type=pa.int64()), "c": pa.array(c.astype(np.int64))})

    deg = bucketed_groupby(
        und.map_batches(deg_rows, batch_format="pyarrow", zero_copy_batch=True),
        ["v"],
        lambda df: df.groupby("v", as_index=False, sort=False)["c"].sum(),
        num_buckets=num_buckets,
    )

    with_da = _attach_degree(und, deg, "a", ["b"], "deg_a", num_buckets)
    with_db = _attach_degree(with_da, deg, "b", ["a", "deg_a"], "deg_b", num_buckets)
    return with_db, deg


def oriented_edges(edges: ray.data.Dataset, num_buckets: int = 64) -> ray.data.Dataset:
    """Degree-ordered orientation: each undirected simple edge directed
    from its lower-(deg, id) endpoint ``lo`` to ``hi``."""
    with_db, _ = undirected_with_degrees(edges, num_buckets)

    def orient(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy()
        b = df["b"].to_numpy()
        da = df["deg_a"].to_numpy()
        db = df["deg_b"].to_numpy()
        a_first = (da < db) | ((da == db) & (a < b))
        return pd.DataFrame(
            {
                "lo": np.where(a_first, a, b),
                "hi": np.where(a_first, b, a),
                "hi_deg": np.where(a_first, db, da),
            }
        )

    return with_db.map_batches(orient, batch_format="pandas")


def _triangle_stats_local(
    src: np.ndarray, dst: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Single-task vectorized per-vertex triangle stats — the broadcast
    path for graphs whose edge list fits one worker (SURVEY.md §7.5).
    Returns (verts, tri, deg): for each vertex of the undirected simple
    projection, the number of triangles containing it and its simple
    degree.  Same orientation semantics as the distributed pipeline."""
    m = src != dst
    a = np.minimum(src[m], dst[m])
    b = np.maximum(src[m], dst[m])
    und = np.unique(np.stack([a, b], axis=1), axis=0)
    if len(und) == 0:
        z = np.empty(0, np.int64)
        return z, z.copy(), z.copy()
    # compact vertex indices so an edge packs into one int64 key
    verts, inv = np.unique(und.ravel(), return_inverse=True)
    n = len(verts)
    e = inv.reshape(-1, 2)
    deg = np.bincount(e.ravel(), minlength=n)
    # orient from lower (deg, id) endpoint
    a_first = (deg[e[:, 0]] < deg[e[:, 1]]) | (
        (deg[e[:, 0]] == deg[e[:, 1]]) & (e[:, 0] < e[:, 1])
    )
    lo = np.where(a_first, e[:, 0], e[:, 1])
    hi = np.where(a_first, e[:, 1], e[:, 0])
    edge_keys = np.sort(lo.astype(np.int64) * n + hi)
    # group oriented neighbors by lo; generate wedge pairs with the
    # shifted-overlap trick (k-th neighbor vs (k+j)-th within a group)
    order = np.lexsort((hi, lo))
    lo_s, hi_s = lo[order], hi[order]
    group_change = np.r_[True, lo_s[1:] != lo_s[:-1]]
    group_id = np.cumsum(group_change) - 1
    counts = np.bincount(group_id)
    tri = np.zeros(n, np.int64)
    max_c = int(counts.max()) if len(counts) else 0
    for k in range(1, max_c):
        idx = np.arange(len(lo_s) - k)
        mask = group_id[idx] == group_id[idx + k]
        if not mask.any():
            break
        w = lo_s[idx[mask]]
        x = hi_s[idx[mask]]
        y = hi_s[idx[mask] + k]
        # candidate must be keyed in the same (deg, id) orientation as
        # the oriented edge set
        x_first = (deg[x] < deg[y]) | ((deg[x] == deg[y]) & (x < y))
        xi = np.where(x_first, x, y).astype(np.int64)
        yi = np.where(x_first, y, x).astype(np.int64)
        cand = xi * n + yi
        pos = np.searchsorted(edge_keys, cand)
        pos = np.clip(pos, 0, len(edge_keys) - 1)
        hit = edge_keys[pos] == cand
        if hit.any():
            # each matched wedge (w; x, y) closes one triangle {w, x, y}
            closed = np.r_[w[hit], x[hit], y[hit]]
            tri += np.bincount(closed, minlength=n)
    return verts, tri, deg.astype(np.int64)


def triangle_count_local(src: np.ndarray, dst: np.ndarray) -> int:
    """Global triangle count on one worker: every triangle contributes
    one per-vertex hit at each of its 3 corners."""
    _, tri, _ = _triangle_stats_local(src, dst)
    return int(tri.sum()) // 3


# a graph whose canonical edge list fits comfortably in one task's heap
LOCAL_TRIANGLE_EDGE_LIMIT = 5_000_000


def triangle_count(edges: ray.data.Dataset, num_buckets: int = 64) -> int:
    """Global triangle count of the undirected simple projection of
    ``edges`` (int64 ``src``/``dst`` columns).  Small graphs take the
    single-task vectorized path; larger ones the partitioned
    wedge/co-group pipeline below."""
    limit_probe = edges.limit(LOCAL_TRIANGLE_EDGE_LIMIT + 1).count()
    if limit_probe <= LOCAL_TRIANGLE_EDGE_LIMIT:
        src_l, dst_l = [], []
        for b in edges.select_columns(["src", "dst"]).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        ):
            src_l.append(b["src"].to_numpy())
            dst_l.append(b["dst"].to_numpy())
        if not src_l:
            return 0
        return triangle_count_local(np.concatenate(src_l), np.concatenate(dst_l))
    # oriented feeds both the wedge generator and the edge side of the
    # final co-group: pin it so the 4-shuffle orientation pipeline
    # executes once
    oriented = oriented_edges(edges, num_buckets).materialize()

    # 4. wedge candidates: ordered neighbor pairs per lo-vertex, ordered
    # by (deg, id) so each candidate can match at most one oriented edge
    def wedge_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]).sort_values(
            ["lo", "hi_deg", "hi"], kind="stable"
        )
        h = df["hi"].to_numpy()
        ai, bi = pair_indices_within_groups(df["lo"].to_numpy())
        if not len(ai):
            return pd.DataFrame(
                {"x": np.empty(0, np.int64), "y": np.empty(0, np.int64)}
            )
        # within-group order is (hi_deg, hi) ascending, so (x, y) keeps
        # the (deg, id) orientation each candidate needs to match at
        # most one oriented edge
        return pd.DataFrame({"x": h[ai], "y": h[bi]})

    staged = oriented.map_batches(
        lambda df: add_bucket_column(df, ["lo"], num_buckets), batch_format="pandas"
    )
    candidates = staged.groupby(BUCKET_COL).map_groups(wedge_pairs, batch_format="pandas")

    # 5. count candidates that exist as oriented edges
    def tag_cand(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["x", "y"]].copy(deep=False)
        out["_t"] = np.int8(0)
        return out

    def tag_edge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.rename(columns={"lo": "x", "hi": "y"})[["x", "y"]].copy(deep=False)
        out["_t"] = np.int8(1)
        return out

    def count_matches(df: pd.DataFrame) -> pd.DataFrame:
        es = df[df["_t"] == 1]
        cs = df[df["_t"] == 0]
        if not len(es) or not len(cs):
            return pd.DataFrame({"n": [0]})
        merged = cs.merge(es[["x", "y"]], on=["x", "y"], how="inner")
        return pd.DataFrame({"n": [len(merged)]})

    both = candidates.map_batches(tag_cand, batch_format="pandas").union(
        oriented.map_batches(tag_edge, batch_format="pandas")
    )
    counts = _cogroup(both, ["x", "y"], count_matches, num_buckets)
    return int(counts.to_pandas()["n"].sum())


def vertex_triangles(edges: ray.data.Dataset, num_buckets: int = 64) -> ray.data.Dataset:
    """Per-vertex triangle participation over the undirected simple
    projection of ``edges``: Dataset(v, tri, deg) — for every vertex
    with simple degree > 0, the number of triangles containing it and
    its simple degree (the two inputs of the local clustering
    coefficient).  Small graphs take the single-task vectorized path;
    larger ones re-use the oriented wedge/co-group pipeline of
    :func:`triangle_count` with the wedge center carried through, so
    each matched candidate credits all three corners."""
    limit_probe = edges.limit(LOCAL_TRIANGLE_EDGE_LIMIT + 1).count()
    if limit_probe <= LOCAL_TRIANGLE_EDGE_LIMIT:
        src_l, dst_l = [], []
        for b in edges.select_columns(["src", "dst"]).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        ):
            src_l.append(b["src"].to_numpy())
            dst_l.append(b["dst"].to_numpy())
        if src_l:
            verts, tri, deg = _triangle_stats_local(
                np.concatenate(src_l), np.concatenate(dst_l)
            )
        else:
            verts = tri = deg = np.empty(0, np.int64)
        return ray.data.from_arrow(
            pa.table(
                {
                    "v": pa.array(verts, type=pa.int64()),
                    "tri": pa.array(tri, type=pa.int64()),
                    "deg": pa.array(deg, type=pa.int64()),
                }
            )
        )

    oriented = oriented_edges(edges, num_buckets).materialize()

    # simple degree: each oriented edge contributes one to both ends
    def deg_partials(t: pa.Table) -> pa.Table:
        ids = np.r_[t["lo"].to_numpy(), t["hi"].to_numpy()]
        u, c = np.unique(ids, return_counts=True)
        return pa.table(
            {"v": pa.array(u, type=pa.int64()), "deg": pa.array(c.astype(np.int64))}
        )

    deg = bucketed_groupby(
        oriented.map_batches(deg_partials, batch_format="pyarrow", zero_copy_batch=True),
        ["v"],
        lambda df: df.groupby("v", as_index=False, sort=False)["deg"].sum(),
        num_buckets=num_buckets,
    )

    # wedge candidates with the center w carried (same ordering rules
    # as triangle_count's wedge_pairs)
    def wedge_triples(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]).sort_values(
            ["lo", "hi_deg", "hi"], kind="stable"
        )
        h = df["hi"].to_numpy()
        lo = df["lo"].to_numpy()
        ai, bi = pair_indices_within_groups(lo)
        if not len(ai):
            return pd.DataFrame(
                {
                    "w": np.empty(0, np.int64),
                    "x": np.empty(0, np.int64),
                    "y": np.empty(0, np.int64),
                }
            )
        return pd.DataFrame({"w": lo[ai], "x": h[ai], "y": h[bi]})

    staged = oriented.map_batches(
        lambda df: add_bucket_column(df, ["lo"], num_buckets), batch_format="pandas"
    )
    candidates = staged.groupby(BUCKET_COL).map_groups(
        wedge_triples, batch_format="pandas"
    )

    def tag_cand(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["w", "x", "y"]].copy(deep=False)
        out["_t"] = np.int8(0)
        return out

    def tag_edge(df: pd.DataFrame) -> pd.DataFrame:
        out = df.rename(columns={"lo": "x", "hi": "y"})[["x", "y"]].copy(deep=False)
        out.insert(0, "w", np.int64(0))
        out["_t"] = np.int8(1)
        return out

    # each matched wedge closes one triangle {w, x, y}: credit all
    # three corners with a bucket-local partial count
    def tri_partials(df: pd.DataFrame) -> pd.DataFrame:
        es = df[df["_t"] == 1]
        cs = df[df["_t"] == 0]
        if not len(es) or not len(cs):
            return pd.DataFrame(
                {"v": np.empty(0, np.int64), "tri": np.empty(0, np.int64)}
            )
        merged = cs.merge(es[["x", "y"]], on=["x", "y"], how="inner")
        ids = np.r_[
            merged["w"].to_numpy(), merged["x"].to_numpy(), merged["y"].to_numpy()
        ]
        u, c = np.unique(ids, return_counts=True)
        return pd.DataFrame({"v": u, "tri": c.astype(np.int64)})

    both = candidates.map_batches(tag_cand, batch_format="pandas").union(
        oriented.map_batches(tag_edge, batch_format="pandas")
    )
    tri = _cogroup(both, ["x", "y"], tri_partials, num_buckets)
    tri = bucketed_groupby(
        tri,
        ["v"],
        lambda df: df.groupby("v", as_index=False, sort=False)["tri"].sum(),
        num_buckets=num_buckets,
    )

    # left-join triangle counts onto the degree table (vertices in no
    # triangle get 0) — tagged union + co-group, no broadcast
    def tag_deg2(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["v", "deg"]].copy(deep=False)
        out["tri"] = np.int64(0)
        out["_t"] = np.int8(0)
        return out

    def tag_tri2(df: pd.DataFrame) -> pd.DataFrame:
        out = df[["v", "tri"]].copy(deep=False)
        out.insert(1, "deg", np.int64(0))
        out["_t"] = np.int8(1)
        return out

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("v", as_index=False, sort=False)[["deg", "tri"]].sum()
        return g[["v", "tri", "deg"]]

    joined = deg.map_batches(tag_deg2, batch_format="pandas").union(
        tri.map_batches(tag_tri2, batch_format="pandas")
    )
    return bucketed_groupby(joined, ["v"], fold, num_buckets=num_buckets, local_combine=False)
