"""Invariant tests for the fifth relational panel (queries_rel5) — SQL
parity is covered by test_oracle_parity's parametrized sweep; these
check the semantics the SQL mirror can't distinguish: per-key state
split across block boundaries (Q21's max-shipdate, Q20's pair volume),
strict-inequality boundaries (Q11's threshold, Q20's dominance share),
the Q15 return-ALL-ties rule, and the Q2 region/type gates excluding a
better-balance out-of-selection supplier."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from neo4j_webgraph_ray.queries_rel5 import (
    q_dominant_suppliers,
    q_important_parts,
    q_preferred_supplier_per_part,
    q_top_revenue_supplier,
    q_waiting_orders_suppliers,
)


def _write(tmp_path, name: str, cols: dict, split: int = 1) -> None:
    t = pa.table(cols)
    pq.write_table(
        t, tmp_path / f"{name}.parquet",
        row_group_size=max(1, t.num_rows // split),
    )


def _ts(dates: list[str]) -> pa.Array:
    return pa.array(np.array(dates, dtype="datetime64[us]"))


def _lineitem(tmp_path, rows: list[tuple], split: int = 1) -> None:
    """rows: (orderkey, partkey, suppkey, qty, extprice, disc, shipdate)"""
    _write(
        tmp_path, "lineitem",
        {
            "l_orderkey": pa.array([r[0] for r in rows], pa.int64()),
            "l_partkey": pa.array([r[1] for r in rows], pa.int64()),
            "l_suppkey": pa.array([r[2] for r in rows], pa.int64()),
            "l_quantity": pa.array([float(r[3]) for r in rows], pa.float64()),
            "l_extendedprice": pa.array([float(r[4]) for r in rows], pa.float64()),
            "l_discount": pa.array([float(r[5]) for r in rows], pa.float64()),
            "l_shipdate": _ts([r[6] for r in rows]),
        },
        split=split,
    )


def _supplier(tmp_path, rows: list[tuple]) -> None:
    """rows: (suppkey, name, acctbal, nationkey)"""
    _write(
        tmp_path, "supplier",
        {
            "s_suppkey": pa.array([r[0] for r in rows], pa.int64()),
            "s_name": pa.array([r[1] for r in rows]),
            "s_acctbal": pa.array([float(r[2]) for r in rows], pa.float64()),
            "s_nationkey": pa.array([r[3] for r in rows], pa.int64()),
        },
    )


def test_preferred_supplier_gates_and_ties(tmp_path, ray_session):
    """Region gate beats balance; suppkey breaks exact-cent ties; the
    type gate drops a part entirely; duplicate (part, supplier) pairs
    split across row groups don't perturb the argmax."""
    _write(tmp_path, "region",
           {"r_regionkey": pa.array([0, 1], pa.int64()),
            "r_name": pa.array(["EUROPE", "AMERICA"])})
    _write(tmp_path, "nation",
           {"n_nationkey": pa.array([0, 1], pa.int64()),
            "n_name": pa.array(["FRANCE", "BRAZIL"]),
            "n_regionkey": pa.array([0, 1], pa.int64())})
    _supplier(tmp_path, [
        (1, "EU low bal", 10.00, 0),
        (2, "US high bal", 99.99, 1),   # out of region: must lose
        (3, "EU tied bal", 10.00, 0),   # tie -> suppkey 1 wins
    ])
    _write(tmp_path, "part",
           {"p_partkey": pa.array([7, 8], pa.int64()),
            "p_type": pa.array(["STANDARD", "ECONOMY"])})
    # every pair twice, split across row groups
    rows = [(1, 7, 1, 1, 1.0, 0.0, "1997-01-01"),
            (1, 7, 2, 1, 1.0, 0.0, "1997-01-01"),
            (1, 7, 3, 1, 1.0, 0.0, "1997-01-01"),
            (2, 8, 2, 1, 1.0, 0.0, "1997-01-01")]
    _lineitem(tmp_path, rows + rows, split=4)
    out = q_preferred_supplier_per_part(str(tmp_path))
    assert out.to_dict("records") == [
        {"p_partkey": 7, "s_suppkey": 1, "s_name": "EU low bal",
         "s_acctbal": 10.0, "n_name": "FRANCE"}
    ]


def test_important_parts_threshold_is_strict(tmp_path, ray_session):
    """rev == 1.3x mean exactly -> excluded; one cent above -> included
    (9 parts at 0.29 + one at 0.39 puts the tenth EXACTLY on the
    13/10-mean boundary)."""
    def build(xprice: float):
        rows = [(i, i, 1, 1, 0.29, 0.0, "1997-01-01") for i in range(9)]
        rows.append((9, 9, 1, 1, xprice, 0.0, "1997-01-01"))
        _lineitem(tmp_path, rows, split=3)

    build(0.39)  # 39*100*10*10 == (9*2900+3900)*13 exactly
    assert len(q_important_parts(str(tmp_path))) == 0
    build(0.40)
    out = q_important_parts(str(tmp_path))
    assert out.to_dict("records") == [{"p_partkey": 9, "value": 0.40}]


def test_top_revenue_supplier_returns_all_ties(tmp_path, ray_session):
    """Two suppliers at the same exact rev4 inside the quarter both
    return; out-of-window revenue is invisible."""
    _supplier(tmp_path, [(1, "a", 0.0, 0), (2, "b", 0.0, 0), (3, "c", 0.0, 0)])
    rows = [
        (1, 1, 1, 1, 5.00, 0.0, "1997-02-01"),
        (2, 1, 2, 1, 5.00, 0.0, "1997-03-31"),
        (3, 1, 3, 1, 4.00, 0.0, "1997-02-01"),
        (4, 1, 3, 1, 100.00, 0.0, "1997-04-01"),  # outside [lo, hi)
    ]
    _lineitem(tmp_path, rows, split=2)
    out = q_top_revenue_supplier(str(tmp_path))
    assert out["s_suppkey"].tolist() == [1, 2]
    assert out["total_revenue"].tolist() == [5.0, 5.0]


def test_dominant_suppliers_sums_across_blocks(tmp_path, ray_session):
    """A pair's quantity split across row groups must sum globally
    before the share test: 20/100 is NOT > 1/5 (strict), 25/100 is;
    a non-matching part name never counts."""
    _supplier(tmp_path, [(1, "s1", 0.0, 0), (2, "s2", 0.0, 0)])
    _write(tmp_path, "part",
           {"p_partkey": pa.array([1, 2, 3], pa.int64()),
            "p_name": pa.array(["red widget", "blue widget", "red bolt"])})
    rows = [
        # part 1: s1 ships 20 (split 15+5), s2 ships 80 -> only s2
        (1, 1, 1, 15, 1.0, 0.0, "1997-01-01"),
        (2, 1, 1, 5, 1.0, 0.0, "1997-01-01"),
        (3, 1, 2, 80, 1.0, 0.0, "1997-01-01"),
        # part 2: s1 ships 25 (split 10+15), s2 ships 75 -> both
        (4, 2, 1, 10, 1.0, 0.0, "1997-01-01"),
        (5, 2, 1, 15, 1.0, 0.0, "1997-01-01"),
        (6, 2, 2, 75, 1.0, 0.0, "1997-01-01"),
        # part 3 (bolt): s1 ships 100% but the suffix gate drops it
        (7, 3, 1, 50, 1.0, 0.0, "1997-01-01"),
    ]
    _lineitem(tmp_path, rows, split=7)
    out = q_dominant_suppliers(str(tmp_path))
    assert out.to_dict("records") == [
        {"s_suppkey": 2, "s_name": "s2", "n_parts": 2},
        {"s_suppkey": 1, "s_name": "s1", "n_parts": 1},
    ]


def test_waiting_orders_sole_late_across_blocks(tmp_path, ray_session):
    """The late flag is max-shipdate-based and must survive a pair's
    lineitems splitting across row groups; two-late orders and
    single-supplier orders are excluded; only status-'F' orders
    count."""
    _supplier(tmp_path, [(1, "s1", 0.0, 0), (2, "s2", 0.0, 0)])
    _write(tmp_path, "orders",
           {"o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_orderdate": _ts(["1997-01-01"] * 4),
            "o_orderstatus": pa.array(["F", "F", "F", "O"])})
    rows = [
        # order 1: s1 ships early AND late (split rows), s2 early
        #   -> s1 is the sole late supplier
        (1, 1, 1, 1, 1.0, 0.0, "1997-01-15"),
        (1, 1, 1, 1, 1.0, 0.0, "1997-06-01"),
        (1, 1, 2, 1, 1.0, 0.0, "1997-01-20"),
        # order 2: both late -> excluded
        (2, 1, 1, 1, 1.0, 0.0, "1997-06-01"),
        (2, 1, 2, 1, 1.0, 0.0, "1997-06-01"),
        # order 3: single supplier late -> excluded
        (3, 1, 1, 1, 1.0, 0.0, "1997-06-01"),
        # order 4: would qualify but status 'O' -> excluded
        (4, 1, 1, 1, 1.0, 0.0, "1997-06-01"),
        (4, 1, 2, 1, 1.0, 0.0, "1997-01-20"),
    ]
    _lineitem(tmp_path, rows, split=8)
    out = q_waiting_orders_suppliers(str(tmp_path))
    assert out.to_dict("records") == [
        {"s_suppkey": 1, "s_name": "s1", "numwait": 1}
    ]


def test_waiting_orders_90_day_boundary(tmp_path, ray_session):
    """ship == orderdate + 90 days exactly is NOT late (strict >);
    one day later is."""
    _supplier(tmp_path, [(1, "s1", 0.0, 0), (2, "s2", 0.0, 0)])
    _write(tmp_path, "orders",
           {"o_orderkey": pa.array([1, 2], pa.int64()),
            "o_orderdate": _ts(["1997-01-01", "1997-01-01"]),
            "o_orderstatus": pa.array(["F", "F"])})
    rows = [
        (1, 1, 1, 1, 1.0, 0.0, "1997-04-01"),  # exactly +90d: on time
        (1, 1, 2, 1, 1.0, 0.0, "1997-01-02"),
        (2, 1, 1, 1, 1.0, 0.0, "1997-04-02"),  # +91d: late
        (2, 1, 2, 1, 1.0, 0.0, "1997-01-02"),
    ]
    _lineitem(tmp_path, rows, split=2)
    out = q_waiting_orders_suppliers(str(tmp_path))
    assert out.to_dict("records") == [
        {"s_suppkey": 1, "s_name": "s1", "numwait": 1}
    ]


def test_dominant_and_waiting_empty_results(tmp_path, ray_session):
    """Zero qualifying rows must return typed empty frames (a corpus
    with no dominant shares / no waiting orders is legal input)."""
    _supplier(tmp_path, [(1, "s1", 0.0, 0), (2, "s2", 0.0, 0)])
    _write(tmp_path, "part",
           {"p_partkey": pa.array([1], pa.int64()),
            "p_name": pa.array(["red bolt"])})  # suffix gate drops all
    _write(tmp_path, "orders",
           {"o_orderkey": pa.array([1], pa.int64()),
            "o_orderdate": _ts(["1997-01-01"]),
            "o_orderstatus": pa.array(["F"])})
    _lineitem(tmp_path, [
        (1, 1, 1, 10, 1.0, 0.0, "1997-01-02"),
        (1, 1, 2, 10, 1.0, 0.0, "1997-01-03"),
    ])
    d = q_dominant_suppliers(str(tmp_path))
    assert len(d) == 0 and list(d.columns) == ["s_suppkey", "s_name", "n_parts"]
    w = q_waiting_orders_suppliers(str(tmp_path))
    assert len(w) == 0 and list(w.columns) == ["s_suppkey", "s_name", "numwait"]
