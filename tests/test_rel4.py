"""Invariant tests for the fourth relational panel (queries_rel4) —
SQL parity is covered by test_oracle_parity's parametrized sweep; these
check the semantics the SQL mirror can't distinguish: the Q16 distinct
count across block boundaries (local pair dedup must not double-count a
pair that appears in several blocks), the Q6 inclusive discount-band
edges, the Q8 share's numerator⊆denominator bound, and the Q9
compression identity (Σ(retail·qty) = retail·Σqty per part group)
against a row-at-a-time brute force."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF_SMOKE


def _write(tmp_path, name: str, table: pa.Table, parts: int = 1) -> None:
    if parts == 1:
        pq.write_table(table, tmp_path / f"{name}.parquet")
        return
    # several row groups in one file: the read splits them into blocks,
    # so per-batch local dedup sees the pair set SPLIT across blocks
    pq.write_table(
        table, tmp_path / f"{name}.parquet",
        row_group_size=max(1, table.num_rows // parts),
    )


@pytest.fixture()
def q16_dir(tmp_path):
    """A lineitem where every (partkey, suppkey) pair repeats across
    row groups, over a part dim exercising every predicate branch."""
    rng = np.random.default_rng(11)
    n_parts, n_supp = 30, 12
    pk = np.arange(n_parts, dtype=np.int64)
    part = pa.table(
        {
            "p_partkey": pa.array(pk),
            "p_brand": pa.array(
                [f"Brand#{13 if i % 5 == 0 else (i % 4) + 1}" for i in range(n_parts)]
            ),
            "p_type": pa.array(
                [["ECONOMY", "PROMO", "SMALL"][i % 3] for i in range(n_parts)]
            ),
            "p_size": pa.array(
                np.array([(1, 9, 14, 7)[i % 4] for i in range(n_parts)], np.int64),
                type=pa.int32(),
            ),
        }
    )
    # each pair appears 3x, shuffled so repeats straddle row groups
    lp = np.repeat(rng.integers(0, n_parts, 200), 3).astype(np.int64)
    ls = np.repeat(rng.integers(0, n_supp, 200), 3).astype(np.int64)
    order = rng.permutation(len(lp))
    li = pa.table(
        {"l_partkey": pa.array(lp[order]), "l_suppkey": pa.array(ls[order])}
    )
    _write(tmp_path, "part", part)
    _write(tmp_path, "lineitem", li, parts=6)
    return str(tmp_path), part.to_pandas(), pd.DataFrame(
        {"l_partkey": lp, "l_suppkey": ls}
    )


def test_supplier_count_cross_block_dedup(q16_dir):
    from neo4j_webgraph_ray.queries_rel4 import (
        PARTCNT_EXCL_BRAND,
        PARTCNT_EXCL_TYPE,
        PARTCNT_SIZES,
        q_supplier_count_by_part,
    )

    sf_dir, part, li = q16_dir
    got = q_supplier_count_by_part(sf_dir)

    j = li.merge(part, left_on="l_partkey", right_on="p_partkey")
    j = j[
        (j["p_brand"] != PARTCNT_EXCL_BRAND)
        & (j["p_type"] != PARTCNT_EXCL_TYPE)
        & j["p_size"].isin(PARTCNT_SIZES)
    ]
    want = (
        j.groupby(["p_brand", "p_type", "p_size"])["l_suppkey"]
        .nunique()
        .reset_index(name="supplier_cnt")
    )
    g = got.sort_values(["p_brand", "p_type", "p_size"]).reset_index(drop=True)
    w = want.sort_values(["p_brand", "p_type", "p_size"]).reset_index(drop=True)
    assert len(g) == len(w) > 0
    assert (g["supplier_cnt"].to_numpy() == w["supplier_cnt"].to_numpy()).all()
    assert list(g["p_brand"]) == list(w["p_brand"])
    # the repeats would have tripled a naive count
    assert (g["supplier_cnt"].to_numpy() <= 12).all()


def test_forecast_revenue_band_edges(tmp_path):
    """Discounts exactly at 0.05 and 0.07 are IN the band; 0.04/0.08
    and out-of-window / high-quantity rows are out."""
    from neo4j_webgraph_ray.queries_rel4 import q_forecast_revenue

    ep = np.array([100.0, 100.0, 100.0, 100.0, 100.0, 100.0])
    disc = np.array([0.05, 0.07, 0.04, 0.08, 0.06, 0.06])
    qty = np.array([1.0, 1.0, 1.0, 1.0, 24.0, 1.0])
    ship = np.array(
        ["1997-06-01"] * 5 + ["1998-06-01"], dtype="datetime64[us]"
    )
    li = pa.table(
        {
            "l_quantity": pa.array(qty),
            "l_extendedprice": pa.array(ep),
            "l_discount": pa.array(disc),
            "l_shipdate": pa.array(ship, type=pa.timestamp("us")),
        }
    )
    pq.write_table(li, tmp_path / "lineitem.parquet")
    got = q_forecast_revenue(str(tmp_path))
    # rows 0 and 1 qualify: 100*0.05 + 100*0.07
    assert got["revenue"].iloc[0] == pytest.approx(12.0, abs=1e-12)


def test_nation_market_share_bounds():
    from neo4j_webgraph_ray.queries_rel4 import q_nation_market_share

    got = q_nation_market_share(SF_SMOKE)
    assert len(got) >= 1
    s = got["mkt_share"].to_numpy()
    assert ((s >= 0.0) & (s <= 1.0)).all()
    assert set(got["o_year"]) <= {1996, 1997}


def test_margin_compression_identity(tmp_path):
    """The per-(part,supp,year) compression must equal the
    row-at-a-time margin sum: Σ(rev) − retail·Σ(qty) per group."""
    from neo4j_webgraph_ray.queries_rel4 import q_margin_by_nation_year

    rng = np.random.default_rng(3)
    n = 400
    pk = rng.integers(0, 12, n).astype(np.int64)
    sk = rng.integers(0, 5, n).astype(np.int64)
    qty = np.round(rng.uniform(1, 50, n), 2)
    ep = np.round(rng.uniform(10, 2000, n), 2)
    disc = np.round(rng.uniform(0, 0.1, n), 2)
    ship = np.array(["1996-03-01", "1997-09-09"], dtype="datetime64[us]")[
        rng.integers(0, 2, n)
    ]
    li = pa.table(
        {
            "l_partkey": pa.array(pk),
            "l_suppkey": pa.array(sk),
            "l_quantity": pa.array(qty),
            "l_extendedprice": pa.array(ep),
            "l_discount": pa.array(disc),
            "l_shipdate": pa.array(ship, type=pa.timestamp("us")),
        }
    )
    retail = np.round(rng.uniform(50, 1500, 12), 2)
    part = pa.table(
        {"p_partkey": pa.array(np.arange(12, dtype=np.int64)),
         "p_retailprice": pa.array(retail)}
    )
    supplier = pa.table(
        {"s_suppkey": pa.array(np.arange(5, dtype=np.int64)),
         "s_nationkey": pa.array(np.array([0, 1, 0, 2, 1], np.int32))}
    )
    nation = pa.table(
        {"n_nationkey": pa.array(np.arange(3, dtype=np.int32)),
         "n_name": pa.array(["NATION_A", "NATION_B", "NATION_C"])}
    )
    for name, t in [("lineitem", li), ("part", part),
                    ("supplier", supplier), ("nation", nation)]:
        pq.write_table(t, tmp_path / f"{name}.parquet")

    got = q_margin_by_nation_year(str(tmp_path))

    rev4 = np.rint(ep * 100).astype(np.int64) * (
        100 - np.rint(disc * 100).astype(np.int64)
    )
    cost4 = np.rint(retail[pk] * 100).astype(np.int64) * np.rint(
        qty * 100
    ).astype(np.int64)
    yr = ship.astype("datetime64[Y]").astype(np.int64) + 1970
    nname = np.array(["NATION_A", "NATION_B", "NATION_C"])[
        np.array([0, 1, 0, 2, 1])[sk]
    ]
    want = (
        pd.DataFrame({"n_name": nname, "o_year": yr, "m4": rev4 - cost4})
        .groupby(["n_name", "o_year"], as_index=False)["m4"]
        .sum()
    )
    want["margin"] = want["m4"] / 10_000.0
    g = got.sort_values(["n_name", "o_year"]).reset_index(drop=True)
    w = want.sort_values(["n_name", "o_year"]).reset_index(drop=True)
    assert len(g) == len(w)
    assert (g["margin"].to_numpy() == w["margin"].to_numpy()).all()
