"""Exact distributed quantiles — iterative histogram refinement.

The missing exactness rung of the engine's quantile ladder: the
bottom-k QUANTILE sketch (`sketches.bottomk_sample` →
`q_value_quantile_sketch`) answers with ~3% rank error from one pass,
and the grouped exact path (`q_token_quantiles_by_lang`) co-locates
whole groups.  A GLOBAL exact quantile can't co-locate (the group is
the whole table) and a distributed sort of 100 TB just to read one
rank is the canonical anti-pattern — so this implements distributed
selection (the classic iterative refinement of Blum-style selection to
the map/aggregate model):

repeat:  one vectorized pass histograms every still-active quantile's
current [lo, hi] window into ``num_buckets`` equal-width buckets (plus
an exact below-window count); per-block partials are sparse
(qi, bucket, count) rows pre-aggregated through ``bucketed_groupby``,
so the driver only ever sees <= n_quantiles x (num_buckets+1)
aggregated rows; the driver picks the bucket containing the target
rank and recurses into it.  A bucket whose population fits
``collect_limit`` is resolved exactly in ONE final gather of just
those values.  Each pass shrinks the window ~num_buckets x, so
uniform-ish data resolves in 1 pass and 3-4 passes bound any double
distribution (the window width falls below one ulp and degenerates to
a single value first).

Consistency discipline: bucket assignment uses
``np.searchsorted(edges, v, side="right")`` against the SAME edge
floats the driver recurses on, so a value can never straddle the
assignment and the recursion boundary; windows are half-open
[edges[j], edges[j+1]) except the last bucket which inherits the
window's inclusive top — the collected population is then exactly the
histogram count that passed the limit check.

Rank semantics: value at 1-based rank ceil(p*n) over non-null,
non-NaN values — ANSI ``percentile_disc`` / DuckDB ``quantile_disc``,
so the oracle is bit-exact (the answer IS a data element; no
interpolation arithmetic to diverge on).

Scale shape per pass: one streaming scan of the (column-pruned,
pinned) value column, a shuffle of only the tiny partial rows, and an
O(n_quantiles x num_buckets) driver step.  Nothing row-shaped ever
reaches the driver except the final <= collect_limit-value gather per
quantile.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

HIST_BUCKETS = 4096
COLLECT_LIMIT = 65536
MAX_PASSES = 12


def _clean(t: pa.Table, col: str) -> np.ndarray:
    import pyarrow.compute as pc

    v = pc.drop_null(t[col]).to_numpy(zero_copy_only=False)
    v = np.asarray(v, np.float64)
    if len(v) and np.isnan(v).any():
        v = v[~np.isnan(v)]
    return v


def exact_quantiles(
    ds: ray.data.Dataset,
    col: str,
    ps: tuple[float, ...],
    num_buckets: int = HIST_BUCKETS,
    collect_limit: int = COLLECT_LIMIT,
    max_passes: int = MAX_PASSES,
) -> tuple[dict[float, float], int]:
    """Exact ``quantile_disc``-semantics quantiles of ``ds[col]``.

    Returns ``({p: value}, n_nonnull)``; NaN values count as null.
    All quantiles narrow simultaneously — each refinement pass costs
    ONE scan regardless of ``len(ps)``.
    """
    vals_list, n = exact_order_stats(
        ds, col,
        lambda n: [min(n, max(1, int(np.ceil(p * n)))) for p in ps],
        num_buckets=num_buckets, collect_limit=collect_limit,
        max_passes=max_passes,
    )
    if n == 0:
        return {p: float("nan") for p in ps}, 0
    return {p: vals_list[i] for i, p in enumerate(ps)}, n


def exact_order_stats(
    ds: ray.data.Dataset,
    col: str,
    ranks_for,
    num_buckets: int = HIST_BUCKETS,
    collect_limit: int = COLLECT_LIMIT,
    max_passes: int = MAX_PASSES,
) -> tuple[list[float], int]:
    """Exact order statistics of ``ds[col]`` at caller-chosen 1-based
    ranks: ``ranks_for(n_nonnull) -> list[int]`` is called once the
    count is known (ranks clipped into [1, n]).  Returns
    ``(values_in_rank_arg_order, n_nonnull)`` — the rank-general core
    the ``quantile_disc`` wrapper and the interpolated
    ``quantile_cont`` entry both ride; same iterative histogram
    refinement, all ranks narrowing simultaneously (one scan per pass
    regardless of how many ranks)."""
    from neo4j_webgraph_ray.stages.core import bucketed_groupby

    # pin: every pass re-scans this column; prune + materialize once so
    # refinement reads object-store blocks, not parquet decode again
    vals = ds.select_columns([col]).materialize()

    def cmm(t: pa.Table) -> pa.Table:
        v = _clean(t, col)
        if not len(v):
            return pa.table(
                {"n": pa.array([], pa.int64()),
                 "lo": pa.array([], pa.float64()),
                 "hi": pa.array([], pa.float64())}
            )
        return pa.table(
            {"n": pa.array([len(v)], pa.int64()),
             "lo": pa.array([float(v.min())], pa.float64()),
             "hi": pa.array([float(v.max())], pa.float64())}
        )

    parts = vals.map_batches(
        cmm, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    n = int(parts["n"].sum()) if len(parts) else 0
    if n == 0:
        return [], 0
    ks = [min(n, max(1, int(k))) for k in ranks_for(n)]
    glo = float(parts["lo"].min())
    ghi = float(parts["hi"].max())

    # state per rank: window [lo, hi], hi_closed (window top
    # inclusive?), global target rank k (1-based), and — once the
    # window population fits collect_limit — rank_in, the rank of the
    # answer within the collected window
    state = [
        {"lo": glo, "hi": ghi, "hi_closed": True, "done": False,
         "k": k, "val": None, "rank_in": None, "collect": False}
        for k in ks
    ]

    for _pass in range(max_passes):
        act = [i for i, s in enumerate(state)
               if not s["done"] and not s["collect"]]
        if not act:
            break
        los = np.array([state[i]["lo"] for i in act])
        his = np.array([state[i]["hi"] for i in act])
        closed = np.array([state[i]["hi_closed"] for i in act])
        edges = [np.linspace(lo, hi, num_buckets + 1)
                 for lo, hi in zip(los, his)]

        def hist_partial(
            t: pa.Table, _e=edges, _lo=los, _hi=his, _cl=closed
        ) -> pd.DataFrame:
            v = _clean(t, col)
            qi, bk, ct = [], [], []
            for j in range(len(_lo)):
                below = int((v < _lo[j]).sum())
                if below:
                    qi.append(j)
                    bk.append(-1)
                    ct.append(below)
                top = (v <= _hi[j]) if _cl[j] else (v < _hi[j])
                inw = v[(v >= _lo[j]) & top]
                if len(inw):
                    idx = np.clip(
                        np.searchsorted(_e[j], inw, side="right") - 1,
                        0, num_buckets - 1,
                    )
                    h = np.bincount(idx, minlength=num_buckets)
                    nz = np.flatnonzero(h)
                    qi.extend([j] * len(nz))
                    bk.extend(nz.tolist())
                    ct.extend(h[nz].tolist())
            return pd.DataFrame(
                {"qi": np.array(qi, np.int64),
                 "b": np.array(bk, np.int64),
                 "cnt": np.array(ct, np.int64)}
            )

        def comb(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby(["qi", "b"], as_index=False, sort=False)[
                "cnt"
            ].sum()

        agg = bucketed_groupby(
            vals.map_batches(
                hist_partial, batch_format="pyarrow", zero_copy_batch=True
            ),
            ["qi", "b"], comb, num_buckets=8,
        ).to_pandas()

        for jj, i in enumerate(act):
            s = state[i]
            sub = agg[agg["qi"] == jj]
            below = int(sub.loc[sub["b"] == -1, "cnt"].sum())
            hist = np.zeros(num_buckets, np.int64)
            hb = sub[sub["b"] >= 0]
            hist[hb["b"].to_numpy()] = hb["cnt"].to_numpy()
            cum = below + np.cumsum(hist)
            k = s["k"]
            j = int(np.searchsorted(cum, k, side="left"))
            if j >= num_buckets:  # defensive; invariant says unreachable
                raise RuntimeError(
                    f"exact_quantiles: rank {k} not covered by window "
                    f"[{s['lo']}, {s['hi']}] (cum max {cum[-1]})"
                )
            e = edges[jj]
            new_lo, new_hi = float(e[j]), float(e[j + 1])
            last = j == num_buckets - 1
            if new_lo == new_hi:
                # window narrower than one ulp x num_buckets collapsed:
                # every value assigned here equals the edge
                s["val"] = new_lo
                s["done"] = True
                continue
            s["lo"], s["hi"] = new_lo, new_hi
            # half-open unless this bucket inherited the window's
            # inclusive top (clip sends v == hi to the last bucket)
            s["hi_closed"] = bool(last and s["hi_closed"])
            s["rank_in"] = int(k - (cum[j] - hist[j]))
            if int(hist[j]) <= collect_limit:
                s["collect"] = True

    pend = [i for i, s in enumerate(state) if not s["done"]]
    if pend:
        # one gather for every still-open window (max_passes exhaustion
        # falls through here too: the window may exceed collect_limit
        # then, but 12 passes x 4096 buckets out-resolves any float64)
        wins = [(jj, state[i]["lo"], state[i]["hi"], state[i]["hi_closed"])
                for jj, i in enumerate(pend)]

        def gather(t: pa.Table, _w=wins) -> pd.DataFrame:
            v = _clean(t, col)
            qi, vv = [], []
            for j, lo, hi, cl in _w:
                inw = v[(v >= lo) & ((v <= hi) if cl else (v < hi))]
                if len(inw):
                    qi.extend([j] * len(inw))
                    vv.extend(inw.tolist())
            return pd.DataFrame(
                {"qi": np.array(qi, np.int64),
                 "v": np.array(vv, np.float64)}
            )

        got = vals.map_batches(
            gather, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()
        for jj, i in enumerate(pend):
            s = state[i]
            w = np.sort(got.loc[got["qi"] == jj, "v"].to_numpy(np.float64))
            s["val"] = float(w[s["rank_in"] - 1])
            s["done"] = True

    return [s_["val"] for s_ in state], n
