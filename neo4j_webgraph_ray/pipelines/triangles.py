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

from neo4j_webgraph_ray.stages.core import BUCKET_COL, add_bucket_column, bucketed_groupby


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
        lookup = dict(zip(dd["k"], dd["c"]))
        out = ee[["k", *carry_cols]].copy(deep=False)
        out[out_col] = ee["k"].map(lookup).astype(np.int64)
        return out.rename(columns={"k": key_col})

    both = und_like.map_batches(tag_edges, batch_format="pandas").union(
        deg.map_batches(tag_deg, batch_format="pandas")
    )
    return _cogroup(both, ["k"], combine, num_buckets)


def oriented_edges(edges: ray.data.Dataset, num_buckets: int = 64) -> ray.data.Dataset:
    """Degree-ordered orientation: each undirected simple edge directed
    from its lower-(deg, id) endpoint ``lo`` to ``hi``."""
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


def triangle_count(edges: ray.data.Dataset, num_buckets: int = 64) -> int:
    """Global triangle count of the undirected simple projection of
    ``edges`` (int64 ``src``/``dst`` columns)."""
    oriented = oriented_edges(edges, num_buckets)

    # 4. wedge candidates: ordered neighbor pairs per lo-vertex, ordered
    # by (deg, id) so each candidate can match at most one oriented edge
    def wedge_pairs(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]).sort_values(
            ["lo", "hi_deg", "hi"], kind="stable"
        )
        xs: list[np.ndarray] = []
        ys: list[np.ndarray] = []
        for _, g in df.groupby("lo", sort=False):
            h = g["hi"].to_numpy()
            if len(h) < 2:
                continue
            iu, ju = np.triu_indices(len(h), k=1)
            xs.append(h[iu])
            ys.append(h[ju])
        if not xs:
            return pd.DataFrame(
                {"x": np.empty(0, np.int64), "y": np.empty(0, np.int64)}
            )
        return pd.DataFrame({"x": np.concatenate(xs), "y": np.concatenate(ys)})

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
