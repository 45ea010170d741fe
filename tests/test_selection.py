"""Exact distributed quantiles (stages/selection.py): refinement-path
exercises the iterative narrowing that sandbox-scale data never
triggers (a 4096-bucket first pass resolves 10K rows immediately)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data

from neo4j_webgraph_ray.stages.selection import exact_quantiles

PS = (0.05, 0.25, 0.5, 0.75, 0.95)


def _np_disc(v: np.ndarray, p: float) -> float:
    """quantile_disc oracle: value at 1-based rank ceil(p*n)."""
    s = np.sort(v)
    k = min(len(s), max(1, int(np.ceil(p * len(s)))))
    return float(s[k - 1])


def _check(v_clean: np.ndarray, got: dict, ps=PS):
    for p in ps:
        assert got[p] == _np_disc(v_clean, p), p


def test_exact_quantiles_multipass_with_dupes_nulls_nan():
    """Tiny buckets + tiny collect limit force several refinement
    passes; nulls and NaN must be excluded from n and from ranks."""
    rng = np.random.default_rng(7)
    v = np.round(rng.lognormal(3.0, 1.5, size=5000), 2)
    v[::7] = 42.0  # heavy ties
    col = v.astype(np.float64)
    # NaN is NOT an arrow null — selection must drop it itself (true
    # nulls are covered by test_exact_quantiles_empty_and_all_null)
    col[::13] = np.nan
    col[1] = np.nan
    keep = ~np.isnan(col)
    vals = v[keep]
    ds = ray.data.from_pandas(pd.DataFrame({"value": col})).repartition(8)
    got, n = exact_quantiles(
        ds, "value", PS, num_buckets=4, collect_limit=8, max_passes=40
    )
    assert n == len(vals)
    _check(vals, got)


def test_exact_quantiles_adversarial_narrow_range():
    """Values packed into a ~1e-6-wide band around 1e9: equal-width
    histogramming must keep narrowing (several passes) and stay exact;
    also covers the degenerate all-equal tail where the window
    collapses below one ulp."""
    rng = np.random.default_rng(11)
    v = 1e9 + rng.integers(0, 1000, size=3000) * 1e-9
    ds = ray.data.from_pandas(pd.DataFrame({"value": v})).repartition(6)
    got, n = exact_quantiles(
        ds, "value", PS, num_buckets=4, collect_limit=4, max_passes=60
    )
    assert n == len(v)
    _check(v, got)


def test_exact_quantiles_all_equal_and_tiny():
    v = np.full(500, 3.25)
    ds = ray.data.from_pandas(pd.DataFrame({"value": v})).repartition(4)
    got, n = exact_quantiles(ds, "value", PS, num_buckets=8, collect_limit=1)
    assert n == 500 and all(got[p] == 3.25 for p in PS)

    one = ray.data.from_pandas(pd.DataFrame({"value": [7.5]}))
    got1, n1 = exact_quantiles(one, "value", (0.5,))
    assert (n1, got1[0.5]) == (1, 7.5)


def test_exact_quantiles_empty_and_all_null():
    empty = ray.data.from_pandas(
        pd.DataFrame({"value": pd.Series([], dtype=np.float64)})
    )
    got, n = exact_quantiles(empty, "value", (0.5,))
    assert n == 0 and np.isnan(got[0.5])

    nulls = ray.data.from_pandas(
        pd.DataFrame({"value": pd.Series([None, None], dtype=object)})
    )
    got2, n2 = exact_quantiles(nulls, "value", (0.5,))
    assert n2 == 0 and np.isnan(got2[0.5])


def test_exact_quantiles_partition_invariance():
    """The answer is a pure order statistic — any partitioning of the
    same multiset must give the identical result."""
    rng = np.random.default_rng(3)
    v = np.round(rng.exponential(50.0, size=2000), 2)
    a = exact_quantiles(
        ray.data.from_pandas(pd.DataFrame({"value": v})).repartition(1),
        "value", PS, num_buckets=16, collect_limit=32, max_passes=40,
    )
    b = exact_quantiles(
        ray.data.from_pandas(pd.DataFrame({"value": v})).repartition(13),
        "value", PS, num_buckets=16, collect_limit=32, max_passes=40,
    )
    assert a == b
    _check(v, a[0])


@pytest.mark.parametrize("p", [0.0001, 0.5, 0.9999, 1.0])
def test_exact_quantiles_extreme_ranks(p):
    rng = np.random.default_rng(5)
    v = rng.normal(0, 1, size=1111)
    ds = ray.data.from_pandas(pd.DataFrame({"value": v})).repartition(5)
    got, _ = exact_quantiles(
        ds, "value", (p,), num_buckets=8, collect_limit=16, max_passes=40
    )
    assert got[p] == _np_disc(v, p)


def test_exact_order_stats_matches_numpy_linear_lerp():
    """The rank-general core + the quantile_cont lerp reproduce
    np.quantile(method='linear') exactly on tie-heavy 2-dp data — the
    same formula DuckDB's quantile_cont uses (pinned in the query
    docstring)."""
    from neo4j_webgraph_ray.stages.selection import exact_order_stats

    rng = np.random.default_rng(23)
    v = np.round(rng.exponential(20.0, size=2345), 2)  # heavy 2-dp ties
    ds = ray.data.from_pandas(pd.DataFrame({"value": v})).repartition(7)
    ps = (0.1, 0.25, 0.5, 0.75, 0.9, 0.0, 1.0)

    def ranks(n):
        ks = []
        for p in ps:
            lo = int(np.floor((n - 1) * p))
            ks.extend([lo + 1, min(lo + 2, n)])
        return ks

    res, n = exact_order_stats(
        ds, "value", ranks, num_buckets=16, collect_limit=32, max_passes=40
    )
    assert n == len(v)
    for i, p in enumerate(ps):
        h = (n - 1) * p
        lo = int(np.floor(h))
        got = res[2 * i] + (h - lo) * (res[2 * i + 1] - res[2 * i])
        assert got == np.quantile(v, p, method="linear"), p


def test_exact_order_stats_empty():
    from neo4j_webgraph_ray.stages.selection import exact_order_stats

    ds = ray.data.from_pandas(pd.DataFrame({"value": np.array([], np.float64)}))
    res, n = exact_order_stats(ds, "value", lambda n: [1])
    assert res == [] and n == 0
