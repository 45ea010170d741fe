"""Invariant tests for the second relational panel (queries_rel2) —
SQL parity is covered by test_oracle_parity's parametrized sweep; these
check the semantics the SQL mirror can't distinguish (brute-force range
join, exact running sums, threshold/monotonicity invariants)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE


def test_clicks_before_purchase_bruteforce():
    """The bucketed searchsorted window count must equal a per-row
    brute force over the raw events, including zero-click purchases."""
    import pyarrow.parquet as pq

    from neo4j_webgraph_ray.queries_rel2 import (
        CLICK_WINDOW_US,
        q_clicks_before_purchase,
    )

    got = (
        q_clicks_before_purchase(SF_SMOKE)
        .to_pandas()
        .sort_values("purchase_event_id")
        .reset_index(drop=True)
    )
    ev = pq.read_table(
        f"{SF_SMOKE}/events.parquet",
        columns=["user_id", "ts", "event_id", "event_type"],
    ).to_pandas()
    t = ev["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
    p = ev[ev["event_type"] == "purchase"]
    c = ev[ev["event_type"] == "click"]
    ct = t[c.index.to_numpy()]
    cu = c["user_id"].to_numpy()
    rows = []
    for uid, eid, pt in zip(
        p["user_id"].to_numpy(), p["event_id"].to_numpy(),
        t[p.index.to_numpy()],
    ):
        m = (cu == uid) & (ct <= pt) & (ct > pt - CLICK_WINDOW_US)
        rows.append((uid, eid, int(m.sum())))
    want = pd.DataFrame(
        rows, columns=["user_id", "purchase_event_id", "n_clicks"]
    ).sort_values("purchase_event_id").reset_index(drop=True)
    assert (got["n_clicks"] == 0).any(), "zero-click purchases must be kept"
    pd.testing.assert_frame_equal(
        got.astype({"n_clicks": np.int64}), want.astype({"n_clicks": np.int64})
    )


def test_cumulative_spend_final_equals_total():
    """Each customer's last running value must equal their exact total
    (cents arithmetic — bit-exact, not approx)."""
    import pyarrow.parquet as pq

    from neo4j_webgraph_ray.queries_rel2 import q_cumulative_customer_spend

    got = q_cumulative_customer_spend(SF_SMOKE).to_pandas()
    assert len(got)
    last = (
        got.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
        .groupby("o_custkey")
        .tail(1)
    )
    orders = pq.read_table(
        f"{SF_SMOKE}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).to_pandas()
    cents = np.rint(orders["o_totalprice"].to_numpy() * 100.0).astype(np.int64)
    want = (
        pd.DataFrame({"o_custkey": orders["o_custkey"], "c": cents})
        .groupby("o_custkey")["c"]
        .sum()
    )
    for ck, cum in zip(last["o_custkey"], last["cum_spend"]):
        assert np.rint(cum * 100.0).astype(np.int64) == want[ck]
    # running sums are non-decreasing within a customer (prices > 0)
    s = got.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    d = s.groupby("o_custkey")["cum_spend"].diff().dropna()
    assert (d > 0).all()


def test_rich_club_monotone_and_bounded():
    from neo4j_webgraph_ray.queries_rel2 import q_rich_club

    rc = q_rich_club(SF_SMOKE)
    assert list(rc["k"]) == [2, 4, 8, 16]
    # vertex and edge counts shrink as the club tightens
    assert (np.diff(rc["n_k"].to_numpy()) <= 0).all()
    assert (np.diff(rc["e_k"].to_numpy()) <= 0).all()
    assert ((rc["density"] >= 0) & (rc["density"] <= 1)).all()
    # a club edge needs two club members
    assert (rc.loc[rc["n_k"] < 2, "e_k"] == 0).all()


def test_large_volume_orders_threshold():
    from neo4j_webgraph_ray.queries_rel2 import (
        LARGE_ORDER_MIN_QTY,
        q_large_volume_orders,
    )

    got = q_large_volume_orders(SF_SMOKE)
    assert len(got)
    assert (got["total_qty"] >= LARGE_ORDER_MIN_QTY).all()
    assert got["o_orderkey"].is_unique


def test_promo_revenue_share_bounds():
    from neo4j_webgraph_ray.queries_rel2 import q_promo_revenue

    got = q_promo_revenue(SF_SMOKE)
    assert len(got) == 1
    row = got.iloc[0]
    assert 0.0 <= row["promo_revenue"] <= row["total_revenue"]
    assert 0.0 <= row["promo_pct"] <= 100.0


def test_above_avg_customers_sane():
    """Strictly-above-average count is always < group size (and > 0
    for any nation with unequal balances)."""
    from neo4j_webgraph_ray.queries_rel2 import q_above_avg_customers

    got = q_above_avg_customers(SF_SMOKE)
    assert len(got)
    assert (got["n_above"] < got["n_customers"]).all()
    assert got["n_above"].sum() > 0


@pytest.mark.parametrize("name", ["returnflag_priority_counts"])
def test_cogroup_path_matches_broadcast_rel2(name, monkeypatch):
    """The size-gated joins must produce identical results on the
    distributed co-group path (broadcast_limit=0)."""
    import neo4j_webgraph_ray.queries as Qm
    from neo4j_webgraph_ray.queries_rel2 import q_returnflag_priority_counts

    bc = q_returnflag_priority_counts(SF_SMOKE)
    orig = Qm._lookup_join

    def no_broadcast(*args, **kwargs):
        kwargs["broadcast_limit"] = 0
        return orig(*args, **kwargs)

    monkeypatch.setattr(Qm, "_lookup_join", no_broadcast)
    # queries_rel2 binds the name at import; patch its reference too
    import neo4j_webgraph_ray.queries_rel2 as R2

    monkeypatch.setattr(R2, "_lookup_join", no_broadcast)
    cg = q_returnflag_priority_counts(SF_SMOKE)
    pd.testing.assert_frame_equal(
        bc.reset_index(drop=True), cg.reset_index(drop=True)
    )
