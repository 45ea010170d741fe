"""k-truss decomposition — iterative per-edge triangle-support peel.

The k-truss of an undirected simple graph is the maximal subgraph in
which every edge participates in at least ``k - 2`` triangles *within
the subgraph* (Cohen 2008) — the standard cohesion refinement between
the k-core (degree peel, ``queries.q_kcore``) and the clique: removing
an edge can destroy triangles that supported other edges, so the peel
iterates to a fixpoint.

Reference parity: the reference engine exposes no truss operator; this
is an engine addition in the same family as its triangle/cohesion
analytics (`/root/reference/README.md:72-166` query surface).

Scale design (mirrors :mod:`neo4j_webgraph_ray.pipelines.triangles`):

- Below ``LOCAL_TRIANGLE_EDGE_LIMIT`` canonical edges, the whole peel
  runs in one vectorized task — per-round support from the same
  degree-ordered orientation + shifted-overlap wedge kernel as
  ``_triangle_stats_local``, credited to edges instead of corners.
- Beyond the gate, each round is the bucketed wedge/co-group pipeline
  of ``vertex_triangles`` with the wedge CENTER carried, so a matched
  candidate credits all THREE canonical edges of its triangle; support
  rows shuffle once per round (hash on the edge pair), the filtered
  edge set feeds the next round.  Every wide step is a bucketed hash
  shuffle — no broadcast of the edge set — so a round holds at edge
  tables that do not fit one node.  Rounds are data-dependent but
  small in practice (the peel converges once no edge drops).
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
from neo4j_webgraph_ray.pipelines.triangles import (
    LOCAL_TRIANGLE_EDGE_LIMIT,
    _cogroup,
    oriented_edges,
    undirected_simple,
)


def edge_supports_local(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Per-edge triangle support of the CANONICAL simple edge list
    (``a < b``, no duplicates): ``out[i]`` = number of triangles the
    edge ``(a[i], b[i])`` participates in.  Same degree-ordered
    orientation + shifted-overlap wedge kernel as
    ``triangles._triangle_stats_local``; each closed wedge
    ``(w; x, y)`` credits its three edges."""
    m = len(a)
    out = np.zeros(m, np.int64)
    if m == 0:
        return out
    verts, inv = np.unique(np.r_[a, b], return_inverse=True)
    n = len(verts)
    ea, eb = inv[:m].astype(np.int64), inv[m:].astype(np.int64)
    deg = np.bincount(np.r_[ea, eb], minlength=n)
    a_first = (deg[ea] < deg[eb]) | ((deg[ea] == deg[eb]) & (ea < eb))
    lo = np.where(a_first, ea, eb)
    hi = np.where(a_first, eb, ea)
    # canonical (min, max) packed key per input edge, for support lookup
    ckeys = np.minimum(ea, eb) * n + np.maximum(ea, eb)
    order_c = np.argsort(ckeys)
    ckeys_sorted = ckeys[order_c]
    # oriented edge keys for wedge-closure membership
    okeys = np.sort(lo * n + hi)
    order = np.lexsort((hi, lo))
    lo_s, hi_s = lo[order], hi[order]
    group_id = np.cumsum(np.r_[True, lo_s[1:] != lo_s[:-1]]) - 1
    counts = np.bincount(group_id) if len(group_id) else np.empty(0, np.int64)
    max_c = int(counts.max()) if len(counts) else 0
    for k in range(1, max_c):
        idx = np.arange(len(lo_s) - k)
        mask = group_id[idx] == group_id[idx + k]
        if not mask.any():
            break
        w = lo_s[idx[mask]]
        x = hi_s[idx[mask]]
        y = hi_s[idx[mask] + k]
        x_first = (deg[x] < deg[y]) | ((deg[x] == deg[y]) & (x < y))
        xi = np.where(x_first, x, y)
        yi = np.where(x_first, y, x)
        cand = xi * n + yi
        pos = np.clip(np.searchsorted(okeys, cand), 0, len(okeys) - 1)
        hit = okeys[pos] == cand
        if not hit.any():
            continue
        wh, xh, yh = w[hit], x[hit], y[hit]
        # credit the three canonical edges of each closed triangle
        tri_keys = np.r_[
            np.minimum(wh, xh) * n + np.maximum(wh, xh),
            np.minimum(wh, yh) * n + np.maximum(wh, yh),
            np.minimum(xh, yh) * n + np.maximum(xh, yh),
        ]
        epos = np.searchsorted(ckeys_sorted, tri_keys)
        np.add.at(out, order_c[epos], 1)
    return out


def ktruss_local(
    a: np.ndarray, b: np.ndarray, k: int
) -> tuple[np.ndarray, int]:
    """Single-task peel to the k-truss fixpoint over canonical simple
    edges.  Returns (keep_mask over the input edges, rounds) where
    rounds counts support evaluations INCLUDING the converging one."""
    thr = k - 2
    keep = np.ones(len(a), bool)
    rounds = 0
    while True:
        rounds += 1
        sup = edge_supports_local(a[keep], b[keep])
        drop = sup < thr
        if not drop.any():
            return keep, rounds
        alive = np.flatnonzero(keep)
        keep[alive[drop]] = False
        if not keep.any():
            return keep, rounds


def _edge_supports_distributed(
    edges: ray.data.Dataset, num_buckets: int
) -> ray.data.Dataset:
    """Dataset(a, b, sup) for the current canonical edge Dataset —
    ONE round of the oriented wedge/co-group pipeline with per-edge
    credit.  Edges absent from the output have support 0."""
    renamed = edges.map_batches(
        lambda t: pa.table({"src": t["a"], "dst": t["b"]}),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    oriented = oriented_edges(renamed, num_buckets).materialize()

    def wedge_triples(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]).sort_values(
            ["lo", "hi_deg", "hi"], kind="stable"
        )
        h = df["hi"].to_numpy()
        lo = df["lo"].to_numpy()
        ai, bi = pair_indices_within_groups(lo)
        if not len(ai):
            return pd.DataFrame(
                {"w": np.empty(0, np.int64), "x": np.empty(0, np.int64),
                 "y": np.empty(0, np.int64)}
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

    # matched wedge (w; x, y) closes triangle {w, x, y}: one support
    # partial per CANONICAL edge of the triangle, combined bucket-locally
    def sup_partials(df: pd.DataFrame) -> pd.DataFrame:
        es = df[df["_t"] == 1]
        cs = df[df["_t"] == 0]
        if not len(es) or not len(cs):
            return pd.DataFrame(
                {"a": np.empty(0, np.int64), "b": np.empty(0, np.int64),
                 "sup": np.empty(0, np.int64)}
            )
        mg = cs.merge(es[["x", "y"]], on=["x", "y"], how="inner")
        w = mg["w"].to_numpy()
        x = mg["x"].to_numpy()
        y = mg["y"].to_numpy()
        ea = np.r_[np.minimum(w, x), np.minimum(w, y), np.minimum(x, y)]
        eb = np.r_[np.maximum(w, x), np.maximum(w, y), np.maximum(x, y)]
        g = pd.DataFrame({"a": ea, "b": eb}).groupby(
            ["a", "b"], as_index=False, sort=False
        ).size()
        return g.rename(columns={"size": "sup"}).astype(
            {"sup": np.int64}
        )

    both = candidates.map_batches(tag_cand, batch_format="pandas").union(
        oriented.map_batches(tag_edge, batch_format="pandas")
    )
    partials = _cogroup(both, ["x", "y"], sup_partials, num_buckets)
    return bucketed_groupby(
        partials,
        ["a", "b"],
        lambda df: df.groupby(["a", "b"], as_index=False, sort=False)["sup"].sum(),
        num_buckets=num_buckets,
    )


def ktruss_edges(
    edges: ray.data.Dataset,
    k: int,
    num_buckets: int = 64,
    local_edge_limit: int = LOCAL_TRIANGLE_EDGE_LIMIT,
    max_rounds: int = 64,
) -> tuple[ray.data.Dataset, int]:
    """k-truss of the undirected simple projection of ``edges``
    (int64 ``src``/``dst``).  Returns (Dataset(a, b) of surviving
    canonical edges, peel rounds to the fixpoint).  Small graphs take
    the single-task vectorized peel; larger ones iterate the bucketed
    wedge/co-group support round until no edge drops."""
    if k < 3:
        raise ValueError("k-truss requires k >= 3")
    thr = k - 2
    simple = undirected_simple(edges, num_buckets)
    limit_probe = simple.limit(local_edge_limit + 1).count()
    if limit_probe <= local_edge_limit:
        aa, bb = [], []
        for t in simple.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            aa.append(t["a"].to_numpy())
            bb.append(t["b"].to_numpy())
        if not aa:
            return ray.data.from_arrow(
                pa.table({"a": pa.array([], pa.int64()),
                          "b": pa.array([], pa.int64())})
            ), 1
        a = np.concatenate(aa)
        b = np.concatenate(bb)
        keep, rounds = ktruss_local(a, b, k)
        return ray.data.from_arrow(
            pa.table({"a": pa.array(a[keep], type=pa.int64()),
                      "b": pa.array(b[keep], type=pa.int64())})
        ), rounds

    cur = simple.materialize()
    n_cur = cur.count()
    rounds = 0
    while rounds < max_rounds:
        rounds += 1
        sup = _edge_supports_distributed(cur, num_buckets)

        # keep edges whose support row meets the threshold; edges with
        # no support row (0 triangles) drop for every k >= 3
        def tag_sup(df: pd.DataFrame) -> pd.DataFrame:
            out = df[["a", "b", "sup"]].copy(deep=False)
            return out

        def tag_e(df: pd.DataFrame) -> pd.DataFrame:
            out = df[["a", "b"]].copy(deep=False)
            out["sup"] = np.int64(-1)  # membership marker
            return out

        def fold(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(["a", "b"], as_index=False, sort=False)["sup"].agg(
                ["min", "max"]
            )
            # present in edge set (min == -1) AND support >= thr
            keep = (g["min"] == -1) & (g["max"] >= thr)
            return g.loc[keep, ["a", "b"]]

        # repartition before materializing: without it each round
        # multiplies block count ~7× (union + map_groups emit one block
        # per input block per stage), and by round 3 a 29-row edge set
        # spread over 343 blocks costs 50 s/round in pure per-block
        # overhead (measured) — the peel must keep block count bounded
        # by num_buckets, not by round depth
        nxt = _cogroup(
            cur.map_batches(tag_e, batch_format="pandas").union(
                sup.map_batches(tag_sup, batch_format="pandas")
            ),
            ["a", "b"],
            fold,
            num_buckets,
        ).repartition(num_buckets).materialize()
        n_nxt = nxt.count()
        if n_nxt == n_cur:
            return nxt, rounds
        cur, n_cur = nxt, n_nxt
        if n_cur == 0:
            return cur, rounds
    return cur, rounds
