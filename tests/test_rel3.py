"""Invariant tests for the third relational panel (queries_rel3) —
SQL parity is covered by test_oracle_parity's parametrized sweep; these
check the semantics the SQL mirror can't distinguish (the Q13 zero
class on a corpus where it is actually populated, the Q22 anti-join on
the same corpus, the Q10 top-N partial-cut argument, and the Q17
exact-rational threshold against a float brute force)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_SMOKE


@pytest.fixture()
def cust_orders_dir(tmp_path):
    """A customer/orders pair where some customers have NO orders at
    all and some have none after IDLE_SINCE — the classes the real
    testdata leaves empty."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    n_cust = 40
    cust = pa.table(
        {
            "c_custkey": pa.array(np.arange(n_cust, dtype=np.int64)),
            "c_acctbal": pa.array(
                np.round(rng.uniform(-500, 5000, n_cust), 2)
            ),
            "c_mktsegment": pa.array(
                [["AUTOMOBILE", "BUILDING", "MACHINERY"][i % 3]
                 for i in range(n_cust)]
            ),
        }
    )
    # customers 0..9 place no orders; 10..19 only old orders;
    # 20..39 place recent orders (1-3 each)
    ck, od = [], []
    for c in range(10, 20):
        for _ in range(int(rng.integers(1, 4))):
            ck.append(c)
            od.append(np.datetime64("1998-05-01", "us"))
    for c in range(20, 40):
        for _ in range(int(rng.integers(1, 4))):
            ck.append(c)
            od.append(np.datetime64("2000-07-01", "us"))
    orders = pa.table(
        {
            "o_orderkey": pa.array(np.arange(len(ck), dtype=np.int64)),
            "o_custkey": pa.array(np.array(ck, dtype=np.int64)),
            "o_orderdate": pa.array(od, type=pa.timestamp("us")),
        }
    )
    pq.write_table(cust, tmp_path / "customer.parquet")
    pq.write_table(orders, tmp_path / "orders.parquet")
    return str(tmp_path), cust.to_pandas(), orders.to_pandas()


def test_customer_order_counts_zero_class(cust_orders_dir):
    """The zero class must be populated (LEFT-join semantics) and the
    distribution must conserve the customer count."""
    from neo4j_webgraph_ray.queries_rel3 import q_customer_order_counts

    sf, cust, orders = cust_orders_dir
    got = q_customer_order_counts(sf)
    assert int(got["custdist"].sum()) == len(cust)
    zero = got.loc[got["c_count"] == 0, "custdist"]
    assert len(zero) == 1 and int(zero.iloc[0]) == 10
    want = (
        orders.groupby("o_custkey").size().reindex(
            cust["c_custkey"], fill_value=0
        ).value_counts()
    )
    for cc, n in want.items():
        assert int(got.loc[got["c_count"] == cc, "custdist"].iloc[0]) == n


def test_idle_customer_balance_antijoin(cust_orders_dir):
    """Customers with only PRE-cutoff orders count as idle; the
    above-average filter uses the positive-balance average."""
    from neo4j_webgraph_ray.queries_rel3 import (
        IDLE_SINCE,
        q_idle_customer_balance,
    )

    sf, cust, orders = cust_orders_dir
    got = q_idle_customer_balance(sf)
    cents = np.rint(cust["c_acctbal"].to_numpy() * 100).astype(np.int64)
    pos = cents[cents > 0]
    recent = set(
        orders.loc[
            orders["o_orderdate"] >= pd.Timestamp(IDLE_SINCE), "o_custkey"
        ]
    )
    m = (
        ~cust["c_custkey"].isin(recent).to_numpy()
        & (cents * len(pos) > pos.sum())
    )
    want = (
        pd.DataFrame(
            {"seg": cust["c_mktsegment"].to_numpy()[m], "bal": cents[m]}
        )
        .groupby("seg")
        .agg(n=("bal", "size"), bal=("bal", "sum"))
    )
    assert int(got["n_custs"].sum()) == int(m.sum()) > 0
    for seg, row in want.iterrows():
        g = got.loc[got["c_mktsegment"] == seg]
        assert int(g["n_custs"].iloc[0]) == row["n"]
        assert np.rint(g["total_acctbal"].iloc[0] * 100) == row["bal"]


def test_returned_item_revenue_topn_bruteforce():
    """The per-block top-N candidate cut must reproduce the exact
    global top-N (revenue desc, custkey asc) of a pandas brute force."""
    import pyarrow.parquet as pq

    from neo4j_webgraph_ray.queries_rel3 import (
        RETURNED_HI,
        RETURNED_LO,
        RETURNED_TOP_N,
        q_returned_item_revenue,
    )

    got = q_returned_item_revenue(SF_SMOKE)
    li = pq.read_table(
        f"{SF_SMOKE}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).to_pandas()
    orders = pq.read_table(
        f"{SF_SMOKE}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).to_pandas()
    orders = orders[
        (orders["o_orderdate"] >= pd.Timestamp(RETURNED_LO))
        & (orders["o_orderdate"] < pd.Timestamp(RETURNED_HI))
    ]
    li = li[li["l_returnflag"] == "R"]
    rev4 = (
        np.rint(li["l_extendedprice"].to_numpy() * 100).astype(np.int64)
        * (100 - np.rint(li["l_discount"].to_numpy() * 100).astype(np.int64))
    )
    j = pd.DataFrame({"okey": li["l_orderkey"].to_numpy(), "rev4": rev4}).merge(
        orders, left_on="okey", right_on="o_orderkey"
    )
    per = j.groupby("o_custkey")["rev4"].sum().reset_index()
    per = per.sort_values(
        ["rev4", "o_custkey"], ascending=[False, True], kind="stable"
    ).head(RETURNED_TOP_N)
    assert len(got) == len(per)
    assert got["c_custkey"].tolist() == per["o_custkey"].tolist()
    np.testing.assert_allclose(
        got["revenue"].to_numpy(), per["rev4"].to_numpy() / 10_000.0
    )


def test_small_qty_revenue_exact_threshold():
    """The engine's rational q100*5*n < sq comparison must equal the
    float 0.2*avg brute force on data where quantities are 2-dp (no
    boundary ties possible at 2 dp with these domains)."""
    import pyarrow.parquet as pq

    from neo4j_webgraph_ray.queries_rel3 import (
        SMALL_QTY_PART_TYPE,
        q_small_qty_revenue,
    )

    got = float(q_small_qty_revenue(SF_SMOKE)["avg_yearly"].iloc[0])
    li = pq.read_table(
        f"{SF_SMOKE}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    ).to_pandas()
    part = pq.read_table(
        f"{SF_SMOKE}/part.parquet", columns=["p_partkey", "p_type"]
    ).to_pandas()
    small = set(part.loc[part["p_type"] == SMALL_QTY_PART_TYPE, "p_partkey"])
    li = li[li["l_partkey"].isin(small)]
    q100 = np.rint(li["l_quantity"].to_numpy() * 100).astype(np.int64)
    g = pd.DataFrame({"pk": li["l_partkey"].to_numpy(), "q": q100})
    agg = g.groupby("pk")["q"].agg(["sum", "size"])
    sq = agg["sum"].reindex(li["l_partkey"]).to_numpy()
    n = agg["size"].reindex(li["l_partkey"]).to_numpy()
    m = q100 * 5 * n < sq
    cents = np.rint(li["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    want = float(cents[m].sum()) / 100.0 / 7.0
    assert m.any(), "threshold must select some rows at smoke scale"
    assert got == want


def test_sum_by_keys_matches_pandas():
    rng = np.random.default_rng(3)
    a = rng.integers(0, 7, 500).astype(np.int64)
    b = rng.integers(0, 5, 500).astype(np.int64)
    v = rng.integers(-100, 100, 500).astype(np.int64)
    from neo4j_webgraph_ray.queries_rel3 import _sum_by_keys

    ka, kb, s = _sum_by_keys((a, b), v)
    want = (
        pd.DataFrame({"a": a, "b": b, "v": v})
        .groupby(["a", "b"], as_index=False, sort=True)["v"]
        .sum()
    )
    np.testing.assert_array_equal(ka, want["a"].to_numpy())
    np.testing.assert_array_equal(kb, want["b"].to_numpy())
    np.testing.assert_array_equal(s, want["v"].to_numpy())
