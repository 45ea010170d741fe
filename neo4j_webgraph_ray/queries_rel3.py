"""Third relational/analytics query panel: the remaining classic
warehouse join shapes on this schema — TPC-H Q5 (local-supplier
volume), Q7 (nation-pair volume by year), Q10 (returned-item revenue
top-N), Q13 (customer order-count distribution with the zero class),
Q17 (small-quantity revenue vs a per-part average), Q19 (OR-of-ANDs
dimension predicate revenue), and Q22 (idle high-balance customers via
an anti-join against recent orders).

Same conventions as :mod:`neo4j_webgraph_ray.queries_rel2` (the
reference's query surface is Cypher over the imported graph plus the
relational reports its operators feed — ``WebGraphQueries.java``):
exact integer arithmetic end to end (2-dp doubles by construction →
cent/centi-unit int64 partials, so the oracle hash cannot be broken by
float summation order), per-batch fact compression BEFORE any join
(``_sum_by_key`` / ``_sum_by_keys`` reduceat folds), the engine's
size-gated :func:`~neo4j_webgraph_ray.queries._lookup_join` for every
equi-join (broadcast under the gate so chained joins fuse into one
streaming pass; side-tagged bucketed co-group beyond — nothing
collects on the driver), and only counts / bounded top-N candidate
sets ever leaving the workers.  Dimension names (25-row nation, 5-row
region) attach driver-side by schema design, mirroring
``q_top_supplier_per_nation``.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from neo4j_webgraph_ray.queries import _lookup_join
from neo4j_webgraph_ray.queries_rel2 import _cents, _read, _sum_by_key
from neo4j_webgraph_ray.stages.core import bucketed_groupby


def _sum_by_keys(keys: tuple[np.ndarray, ...], *vals: np.ndarray):
    """Multi-key per-batch combiner: (sorted distinct key tuples,
    per-tuple sums) via ONE lexsort + reduceat — the n-key analogue of
    :func:`~neo4j_webgraph_ray.queries_rel2._sum_by_key`."""
    n = len(keys[0])
    if n == 0:
        return tuple(list(keys) + [v for v in vals])
    order = np.lexsort(keys[::-1])
    ks = [k[order] for k in keys]
    neq = np.zeros(n, dtype=bool)
    neq[0] = True
    for k in ks:
        neq[1:] |= k[1:] != k[:-1]
    bound = np.flatnonzero(neq)
    out = [k[bound] for k in ks]
    for v in vals:
        out.append(np.add.reduceat(v[order], bound))
    return tuple(out)


def _ts_us(col) -> np.ndarray:
    return (
        col.to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
    )


def _nation_names(sf_dir: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(sorted n_nationkey, n_name, r_name) — the 25-row / 5-row
    dimension pair is a driver lookup by schema design."""
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    rk = reg["r_regionkey"].to_numpy(np.int64)
    rn = reg["r_name"].to_numpy()
    ro = np.argsort(rk)
    nk = nat["n_nationkey"].to_numpy(np.int64)
    o = np.argsort(nk)
    rname = rn[ro][np.searchsorted(rk[ro], nat["n_regionkey"].to_numpy(np.int64))]
    return nk[o], nat["n_name"].to_numpy()[o], rname[o]


def _orders_window(sf_dir: str, lo: str, hi: str) -> ray.data.Dataset:
    """(o_orderkey, o_custkey) for orders with o_orderdate in [lo, hi) —
    the windowed probe side of the Q5/Q7/Q10 join chains."""
    lo_us = np.datetime64(lo, "us").view("int64")
    hi_us = np.datetime64(hi, "us").view("int64")
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def keep(t: pa.Table) -> pa.Table:
        od = _ts_us(t["o_orderdate"])
        m = (od >= lo_us) & (od < hi_us)
        return pa.table(
            {
                "o_orderkey": t["o_orderkey"].filter(pa.array(m)),
                "o_custkey": t["o_custkey"].filter(pa.array(m)),
            }
        )

    return orders.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


# ----------------------------------------------------------------- Q5


#: order window for the local-supplier / nation-pair volume reports
VOLUME_LO, VOLUME_HI = "1996-01-01", "1998-01-01"


def q_local_supplier_volume(sf_dir: str) -> pd.DataFrame:
    """Local-supplier volume (TPC-H Q5 shape): revenue from lineitems
    whose ordering customer and supplier sit in the SAME nation, for
    orders placed within [VOLUME_LO, VOLUME_HI), per nation with its
    region.

    Scale shape: lineitem compresses per batch to one row per distinct
    (orderkey, suppkey) pair in exact rev4 integer units BEFORE the
    three chained size-gated lookup joins (order→custkey,
    cust→nationkey, supp→nationkey; under the gate all three broadcast
    and the whole chain fuses into one streaming pass over the
    compressed partials).  The same-nation filter and the ≤ 25-row
    per-nation revenue fold run per block; the driver only merges
    #blocks × ≤ 25 partial rows and attaches the 25/5-row name
    dimensions."""
    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"okey": pa.array([], pa.int64()),
             "skey": pa.array([], pa.int64()),
             "rev4": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev4 = _cents(t["l_extendedprice"]) * (100 - _cents(t["l_discount"]))
        ok, sk, rev4 = _sum_by_keys((ok, sk), rev4)
        return pa.table(
            {"okey": pa.array(ok, pa.int64()),
             "skey": pa.array(sk, pa.int64()),
             "rev4": pa.array(rev4, pa.int64())}
        )

    partials = li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    j1 = _lookup_join(
        partials, "okey", _orders_window(sf_dir, VOLUME_LO, VOLUME_HI),
        "o_orderkey", "o_custkey", out_col="ckey", carry_cols=["skey", "rev4"],
    )
    customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j2 = _lookup_join(
        j1, "ckey", customer, "c_custkey", "c_nationkey", out_col="cnat",
        carry_cols=["skey", "rev4"],
    )
    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    j3 = _lookup_join(
        j2, "skey", supplier, "s_suppkey", "s_nationkey", out_col="snat",
        carry_cols=["rev4", "cnat"],
    )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        m = df["cnat"].to_numpy() == df["snat"].to_numpy()
        g = pd.DataFrame(
            {"nk": df["cnat"].to_numpy(np.int64)[m],
             "rev4": df["rev4"].to_numpy(np.int64)[m]}
        )
        return g.groupby("nk", as_index=False, sort=False)["rev4"].sum()

    parts = j3.map_batches(fold, batch_format="pandas").to_pandas()
    agg = parts.groupby("nk", as_index=False, sort=True)["rev4"].sum()
    nk, names, rnames = _nation_names(sf_dir)
    idx = np.searchsorted(nk, agg["nk"].to_numpy(np.int64))
    return (
        pd.DataFrame(
            {
                "r_name": rnames[idx],
                "n_name": names[idx],
                "revenue": agg["rev4"].to_numpy(np.int64) / 10_000.0,
            }
        )
        .sort_values("n_name")
        .reset_index(drop=True)
    )


LOCAL_SUPPLIER_VOLUME_SQL = f"""
WITH w AS (
  SELECT c_nationkey AS nk,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
         * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev4
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE c_nationkey = s_nationkey
    AND o_orderdate >= TIMESTAMP '{VOLUME_LO}'
    AND o_orderdate < TIMESTAMP '{VOLUME_HI}')
SELECT r_name, n_name,
       CAST(SUM(rev4) AS DOUBLE) / 10000.0 AS revenue
FROM w
JOIN nation ON nk = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
ORDER BY n_name
"""


# ----------------------------------------------------------------- Q7


def q_nation_pair_volume(sf_dir: str) -> pd.DataFrame:
    """Volume shipping between nation pairs (TPC-H Q7 shape): revenue
    per (supplier nation, customer nation, ship year) for lineitems
    shipped within [VOLUME_LO, VOLUME_HI) across DIFFERENT nations.

    Scale shape: identical join chain to Q5 but compressed per batch by
    (orderkey, suppkey, ship-year) — the year is part of the combiner
    key, so the extra output dimension costs no extra rows through the
    joins beyond the year multiplicity.  The final fold is ≤ 25×24×2
    rows per block."""
    lo = np.datetime64(VOLUME_LO, "us").view("int64")
    hi = np.datetime64(VOLUME_HI, "us").view("int64")
    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount",
         "l_shipdate"],
    )

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"okey": pa.array([], pa.int64()),
             "skey": pa.array([], pa.int64()),
             "yr": pa.array([], pa.int64()),
             "rev4": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        sd = _ts_us(t["l_shipdate"])
        m = (sd >= lo) & (sd < hi)
        if not m.any():
            return empty
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)[m].astype(np.int64)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)[m].astype(np.int64)
        yr = (
            sd[m].view("datetime64[us]").astype("datetime64[Y]").astype(np.int64)
            + 1970
        )
        rev4 = _cents(t["l_extendedprice"])[m] * (100 - _cents(t["l_discount"])[m])
        ok, sk, yr, rev4 = _sum_by_keys((ok, sk, yr), rev4)
        return pa.table(
            {"okey": pa.array(ok, pa.int64()),
             "skey": pa.array(sk, pa.int64()),
             "yr": pa.array(yr, pa.int64()),
             "rev4": pa.array(rev4, pa.int64())}
        )

    partials = li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    j1 = _lookup_join(
        partials, "okey", _orders_window(sf_dir, VOLUME_LO, VOLUME_HI),
        "o_orderkey", "o_custkey", out_col="ckey",
        carry_cols=["skey", "yr", "rev4"],
    )
    customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j2 = _lookup_join(
        j1, "ckey", customer, "c_custkey", "c_nationkey", out_col="cnat",
        carry_cols=["skey", "yr", "rev4"],
    )
    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    j3 = _lookup_join(
        j2, "skey", supplier, "s_suppkey", "s_nationkey", out_col="snat",
        carry_cols=["yr", "rev4", "cnat"],
    )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        m = df["cnat"].to_numpy() != df["snat"].to_numpy()
        g = pd.DataFrame(
            {"snat": df["snat"].to_numpy(np.int64)[m],
             "cnat": df["cnat"].to_numpy(np.int64)[m],
             "yr": df["yr"].to_numpy(np.int64)[m],
             "rev4": df["rev4"].to_numpy(np.int64)[m]}
        )
        return g.groupby(["snat", "cnat", "yr"], as_index=False, sort=False)[
            "rev4"
        ].sum()

    parts = j3.map_batches(fold, batch_format="pandas").to_pandas()
    agg = parts.groupby(["snat", "cnat", "yr"], as_index=False, sort=True)[
        "rev4"
    ].sum()
    nk, names, _ = _nation_names(sf_dir)
    si = np.searchsorted(nk, agg["snat"].to_numpy(np.int64))
    ci = np.searchsorted(nk, agg["cnat"].to_numpy(np.int64))
    return (
        pd.DataFrame(
            {
                "supp_nation": names[si],
                "cust_nation": names[ci],
                "l_year": agg["yr"].to_numpy(np.int64),
                "revenue": agg["rev4"].to_numpy(np.int64) / 10_000.0,
            }
        )
        .sort_values(["supp_nation", "cust_nation", "l_year"])
        .reset_index(drop=True)
    )


NATION_PAIR_VOLUME_SQL = f"""
WITH w AS (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
         * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev4
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  WHERE c_nationkey <> s_nationkey
    AND l_shipdate >= TIMESTAMP '{VOLUME_LO}'
    AND l_shipdate < TIMESTAMP '{VOLUME_HI}'
    AND o_orderdate >= TIMESTAMP '{VOLUME_LO}'
    AND o_orderdate < TIMESTAMP '{VOLUME_HI}')
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(rev4) AS DOUBLE) / 10000.0 AS revenue
FROM w GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


# ---------------------------------------------------------------- Q10


RETURNED_LO, RETURNED_HI = "1999-01-01", "1999-10-01"
RETURNED_TOP_N = 20


def q_returned_item_revenue(sf_dir: str) -> pd.DataFrame:
    """Returned-item revenue (TPC-H Q10 shape): the top
    :data:`RETURNED_TOP_N` customers by revenue on return-flagged
    lineitems of orders placed within [RETURNED_LO, RETURNED_HI).

    Scale shape: lineitem filters + compresses per batch to per-order
    rev4, the windowed orders join attaches custkey (inner → the
    window is the selective step), ONE custkey-bucketed fold produces
    per-customer totals, and the top-N cut is pushed down: every
    output block emits at most its own top N candidates (a superset of
    the global top N by the partial-cut argument of
    ``q_top_tokens``), so the driver merges ≤ #blocks × N rows and
    the name/nation attaches run over N rows only."""
    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {"okey": pa.array([], pa.int64()),
             "rev4": pa.array([], pa.int64())}
        )
        if t.num_rows == 0:
            return empty
        m = pc.equal(t["l_returnflag"], "R").to_numpy(zero_copy_only=False)
        if not m.any():
            return empty
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)[m].astype(np.int64)
        rev4 = _cents(t["l_extendedprice"])[m] * (100 - _cents(t["l_discount"])[m])
        ok, rev4 = _sum_by_key(ok, rev4)
        return pa.table(
            {"okey": pa.array(ok, pa.int64()),
             "rev4": pa.array(rev4, pa.int64())}
        )

    partials = li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    j1 = _lookup_join(
        partials, "okey", _orders_window(sf_dir, RETURNED_LO, RETURNED_HI),
        "o_orderkey", "o_custkey", out_col="ckey", carry_cols=["rev4"],
    )
    per_cust = bucketed_groupby(
        j1, ["ckey"],
        lambda df: df.groupby("ckey", as_index=False, sort=False)["rev4"].sum(),
    )

    def topn(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        df = df.sort_values(
            ["rev4", "ckey"], ascending=[False, True], kind="stable"
        )
        return df.head(RETURNED_TOP_N)

    cand = per_cust.map_batches(topn, batch_format="pandas").to_pandas()
    top = topn(cand).reset_index(drop=True)
    top_ds = ray.data.from_pandas(
        top if len(top) else pd.DataFrame(
            {"ckey": pd.Series([], dtype=np.int64),
             "rev4": pd.Series([], dtype=np.int64)}
        )
    )
    customer = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])
    named = _lookup_join(
        top_ds, "ckey", customer, "c_custkey", "c_name", out_col="c_name",
        carry_cols=["rev4"], keep_key=True,
    )
    with_nat = _lookup_join(
        named, "ckey", customer, "c_custkey", "c_nationkey", out_col="cnat",
        carry_cols=["rev4", "c_name"], keep_key=True,
    ).to_pandas()
    if not len(with_nat):
        return pd.DataFrame(
            {"c_custkey": pd.Series([], dtype=np.int64),
             "c_name": pd.Series([], dtype=object),
             "n_name": pd.Series([], dtype=object),
             "revenue": pd.Series([], dtype=np.float64)}
        )
    nk, names, _ = _nation_names(sf_dir)
    idx = np.searchsorted(nk, with_nat["cnat"].to_numpy(np.int64))
    out = pd.DataFrame(
        {
            "c_custkey": with_nat["ckey"].to_numpy(np.int64),
            "c_name": with_nat["c_name"].to_numpy(),
            "n_name": names[idx],
            "revenue": with_nat["rev4"].to_numpy(np.int64) / 10_000.0,
            "_rev4": with_nat["rev4"].to_numpy(np.int64),
        }
    ).sort_values(["_rev4", "c_custkey"], ascending=[False, True], kind="stable")
    return out.drop(columns=["_rev4"]).reset_index(drop=True)


RETURNED_ITEM_REVENUE_SQL = f"""
WITH r AS (
  SELECT o_custkey AS ckey,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS rev4
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '{RETURNED_LO}'
    AND o_orderdate < TIMESTAMP '{RETURNED_HI}'
  GROUP BY 1)
SELECT ckey AS c_custkey, c_name, n_name,
       CAST(rev4 AS DOUBLE) / 10000.0 AS revenue
FROM r
JOIN customer ON ckey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
ORDER BY rev4 DESC, ckey ASC
LIMIT {RETURNED_TOP_N}
"""


# ---------------------------------------------------------------- Q13


def q_customer_order_counts(sf_dir: str) -> pd.DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape): for each
    order count c_count — INCLUDING the zero class — how many
    customers placed exactly that many orders.

    Scale shape: orders compresses per batch to per-custkey counts,
    ONE custkey-bucketed fold, then customer streams through the
    size-gated LEFT lookup join (``keep_unmatched`` with a typed 0 —
    the zero class never needs an anti-join) and each block emits a
    ≤ #distinct-counts histogram partial."""
    orders = _read(sf_dir, "orders", ["o_custkey"])

    def cnt_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"ckey": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        ck = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ck, n = _sum_by_key(ck, np.ones(len(ck), dtype=np.int64))
        return pa.table(
            {"ckey": pa.array(ck, pa.int64()), "n": pa.array(n, pa.int64())}
        )

    counts = bucketed_groupby(
        orders.map_batches(cnt_partial, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["ckey"],
        lambda df: df.groupby("ckey", as_index=False, sort=False)["n"].sum(),
    )
    customer = _read(sf_dir, "customer", ["c_custkey"])
    joined = _lookup_join(
        customer, "c_custkey", counts, "ckey", "n", out_col="c_count",
        carry_cols=[], keep_unmatched=True, unmatched_value=np.int64(0),
    )

    def hist_partial(df: pd.DataFrame) -> pd.DataFrame:
        v = df["c_count"].value_counts()
        return pd.DataFrame(
            {"c_count": v.index.to_numpy(np.int64),
             "custdist": v.to_numpy(np.int64)}
        )

    parts = joined.map_batches(hist_partial, batch_format="pandas").to_pandas()
    out = parts.groupby("c_count", as_index=False, sort=False)["custdist"].sum()
    out["c_count"] = out["c_count"].astype(np.int64)
    out["custdist"] = out["custdist"].astype(np.int64)
    return (
        out.sort_values(["custdist", "c_count"], ascending=[False, False])
        .reset_index(drop=True)
    )


CUSTOMER_ORDER_COUNTS_SQL = """
SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders ON o_custkey = c_custkey
  GROUP BY 1)
GROUP BY 1 ORDER BY custdist DESC, c_count DESC
"""


# ---------------------------------------------------------------- Q17


SMALL_QTY_PART_TYPE = "SMALL"


def q_small_qty_revenue(sf_dir: str) -> pd.DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 shape): the average
    yearly revenue lost if orders for ``SMALL``-type parts below 20%
    of that part's average order quantity were no longer taken.

    Scale shape: pass A folds per-part (sum_q100, n) from per-batch
    reduceat partials (restricted to the part type via an inner
    size-gated join on the COMPRESSED per-part rows, never per
    lineitem), pass B streams lineitem once more with the two per-part
    aggregates attached and emits one int64 price-cents counter per
    block.  The 20%-of-average comparison is exact rational
    arithmetic — ``q100 * 5 * n < sum_q100`` — identical in the
    oracle, so no float average exists to disagree on."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])

    def qty_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"pk": pa.array([], pa.int64()),
                 "sq": pa.array([], pa.int64()),
                 "n": pa.array([], pa.int64())}
            )
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk, sq, n = _sum_by_key(
            pk, _cents(t["l_quantity"]), np.ones(len(pk), dtype=np.int64)
        )
        return pa.table(
            {"pk": pa.array(pk, pa.int64()), "sq": pa.array(sq, pa.int64()),
             "n": pa.array(n, pa.int64())}
        )

    per_part = bucketed_groupby(
        li.map_batches(qty_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["pk"],
        lambda df: df.groupby("pk", as_index=False, sort=False)[["sq", "n"]].sum(),
    )
    part = _read(sf_dir, "part", ["p_partkey", "p_type"])
    typed = _lookup_join(
        per_part, "pk", part, "p_partkey", "p_type", out_col="ptype",
        carry_cols=["sq", "n"], keep_key=True,
    ).map_batches(
        lambda df: df.loc[df["ptype"].to_numpy() == SMALL_QTY_PART_TYPE,
                          ["pk", "sq", "n"]],
        batch_format="pandas",
        # materialized: the compact per-part table is the lookup side of
        # TWO chained joins below — without this the whole pass-A
        # pipeline would execute once per join
    ).materialize()

    li2 = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"])
    with_sq = _lookup_join(
        li2, "l_partkey", typed, "pk", "sq", out_col="sq",
        carry_cols=["l_quantity", "l_extendedprice"], keep_key=True,
    )
    with_n = _lookup_join(
        with_sq, "l_partkey", typed, "pk", "n", out_col="n",
        carry_cols=["l_quantity", "l_extendedprice", "sq"],
    )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        q100 = _cents(df["l_quantity"].to_numpy())
        m = q100 * 5 * df["n"].to_numpy(np.int64) < df["sq"].to_numpy(np.int64)
        price = _cents(df["l_extendedprice"].to_numpy())[m]
        return pd.DataFrame({"p": [np.int64(price.sum())]})

    parts = with_n.map_batches(fold, batch_format="pandas").to_pandas()
    total_cents = np.int64(parts["p"].sum())
    # same IEEE op order as the oracle: cents → DOUBLE, /100, /7
    return pd.DataFrame({"avg_yearly": [float(total_cents) / 100.0 / 7.0]})


SMALL_QTY_REVENUE_SQL = f"""
WITH pa AS (
  SELECT l_partkey AS pk,
         SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS sq,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_type = '{SMALL_QTY_PART_TYPE}'
  GROUP BY 1)
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
       / 100.0 / 7.0 AS avg_yearly
FROM lineitem JOIN pa ON l_partkey = pk
WHERE CAST(ROUND(l_quantity * 100) AS BIGINT) * 5 * n < sq
"""


# ---------------------------------------------------------------- Q19


#: (brand, max p_size, qty-lo, qty-hi) OR-branches — the classic
#: Q19 three-way OR of conjunctive dimension predicates, adapted to
#: this schema's brand/size/quantity domains
DISCOUNT_BRANCHES = (
    ("Brand#12", 10, 1, 11),
    ("Brand#23", 20, 10, 20),
    ("Brand#34", 30, 20, 30),
)


def q_special_discount_revenue(sf_dir: str) -> pd.DataFrame:
    """Discounted-revenue report (TPC-H Q19 shape): total revenue from
    lineitems matching ANY of the three (brand, size-range,
    quantity-range) conjunctions in :data:`DISCOUNT_BRANCHES`.

    Scale shape: lineitem compresses per batch by (partkey,
    exact-quantity) — the predicate depends on nothing else — so the
    two dimension attaches (brand, size) run over ≤ #parts × 50
    distinct rows per block, not per lineitem; the OR-of-ANDs mask is
    one vectorized numpy expression and a single int64 counter leaves
    each block."""
    li = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"pk": pa.array([], pa.int64()),
                 "q100": pa.array([], pa.int64()),
                 "rev4": pa.array([], pa.int64())}
            )
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        q100 = _cents(t["l_quantity"])
        rev4 = _cents(t["l_extendedprice"]) * (100 - _cents(t["l_discount"]))
        pk, q100, rev4 = _sum_by_keys((pk, q100), rev4)
        return pa.table(
            {"pk": pa.array(pk, pa.int64()),
             "q100": pa.array(q100, pa.int64()),
             "rev4": pa.array(rev4, pa.int64())}
        )

    partials = li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"])
    with_brand = _lookup_join(
        partials, "pk", part, "p_partkey", "p_brand", out_col="brand",
        carry_cols=["q100", "rev4"], keep_key=True,
    )
    with_size = _lookup_join(
        with_brand, "pk", part, "p_partkey", "p_size", out_col="psize",
        carry_cols=["q100", "rev4", "brand"],
    )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        brand = df["brand"].to_numpy()
        size = df["psize"].to_numpy(np.int64)
        q100 = df["q100"].to_numpy(np.int64)
        m = np.zeros(len(df), dtype=bool)
        for b, smax, qlo, qhi in DISCOUNT_BRANCHES:
            m |= (
                (brand == b)
                & (size >= 1) & (size <= smax)
                & (q100 >= qlo * 100) & (q100 <= qhi * 100)
            )
        return pd.DataFrame(
            {"rev4": [np.int64(df["rev4"].to_numpy(np.int64)[m].sum())]}
        )

    parts = with_size.map_batches(fold, batch_format="pandas").to_pandas()
    rev4 = np.int64(parts["rev4"].sum())
    return pd.DataFrame({"revenue": [rev4 / 10_000.0]})


_Q19_BRANCH_SQL = " OR ".join(
    f"(p_brand = '{b}' AND p_size BETWEEN 1 AND {smax} "
    f"AND CAST(ROUND(l_quantity * 100) AS BIGINT) "
    f"BETWEEN {qlo} * 100 AND {qhi} * 100)"
    for b, smax, qlo, qhi in DISCOUNT_BRANCHES
)

SPECIAL_DISCOUNT_REVENUE_SQL = f"""
SELECT CAST(COALESCE(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))), 0)
            AS DOUBLE) / 10000.0 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE {_Q19_BRANCH_SQL}
"""


# ---------------------------------------------------------------- Q22


IDLE_SINCE = "2000-01-01"


def q_idle_customer_balance(sf_dir: str) -> pd.DataFrame:
    """Idle high-balance customers (TPC-H Q22 shape): per market
    segment, the count and total balance of customers whose balance
    exceeds the average POSITIVE balance and who placed no order since
    :data:`IDLE_SINCE` (the NOT EXISTS anti-join).

    Scale shape: the global (sum, count) of positive balances is a
    two-int64 fold; recent-order custkeys compress per batch and
    dedupe in ONE bucketed fold; customer then streams through the
    size-gated LEFT lookup join and the anti-join is
    ``keep_unmatched`` + a typed-0 filter — no shuffle of the customer
    table, no driver set.  The above-average comparison is exact
    rational arithmetic (``cents * n_pos > sum_pos``), identical in
    the oracle."""
    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal", "c_mktsegment"])

    def pos_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = _cents(df["c_acctbal"].to_numpy())
        pos = c[c > 0]
        return pd.DataFrame(
            {"s": [np.int64(pos.sum())], "n": [np.int64(len(pos))]}
        )

    pos = cust.map_batches(pos_partial, batch_format="pandas").to_pandas()
    sum_pos = np.int64(pos["s"].sum())
    n_pos = np.int64(pos["n"].sum())

    since = np.datetime64(IDLE_SINCE, "us").view("int64")
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

    def recent_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"ckey": pa.array([], pa.int64())})
        od = _ts_us(t["o_orderdate"])
        ck = np.unique(
            t["o_custkey"].to_numpy(zero_copy_only=False)[od >= since]
        ).astype(np.int64)
        return pa.table({"ckey": pa.array(ck, pa.int64())})

    recent = bucketed_groupby(
        orders.map_batches(recent_partial, batch_format="pyarrow",
                           zero_copy_batch=True),
        ["ckey"],
        lambda df: df.drop_duplicates("ckey"),
    ).map_batches(
        lambda df: df.assign(one=np.ones(len(df), dtype=np.int64)),
        batch_format="pandas",
    )

    joined = _lookup_join(
        cust, "c_custkey", recent, "ckey", "one", out_col="has_recent",
        carry_cols=["c_acctbal", "c_mktsegment"],
        keep_unmatched=True, unmatched_value=np.int64(0),
    )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        c = _cents(df["c_acctbal"].to_numpy())
        m = (df["has_recent"].to_numpy(np.int64) == 0) & (c * n_pos > sum_pos)
        g = pd.DataFrame(
            {"c_mktsegment": df["c_mktsegment"].to_numpy()[m],
             "n_custs": np.ones(int(m.sum()), dtype=np.int64),
             "bal": c[m]}
        )
        return g.groupby("c_mktsegment", as_index=False, sort=False).sum()

    parts = joined.map_batches(fold, batch_format="pandas").to_pandas()
    if not len(parts):
        return pd.DataFrame(
            {"c_mktsegment": pd.Series([], dtype=object),
             "n_custs": pd.Series([], dtype=np.int64),
             "total_acctbal": pd.Series([], dtype=np.float64)}
        )
    out = parts.groupby("c_mktsegment", as_index=False, sort=True).sum()
    return pd.DataFrame(
        {
            "c_mktsegment": out["c_mktsegment"].to_numpy(),
            "n_custs": out["n_custs"].to_numpy(np.int64),
            "total_acctbal": out["bal"].to_numpy(np.int64) / 100.0,
        }
    ).reset_index(drop=True)


IDLE_CUSTOMER_BALANCE_SQL = f"""
WITH pos AS (
  SELECT SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM customer WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) > 0)
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_custs,
       CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS total_acctbal
FROM customer, pos
WHERE CAST(ROUND(c_acctbal * 100) AS BIGINT) * pos.n > pos.s
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '{IDLE_SINCE}')
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


REL3_QUERIES: dict[str, Callable[[str], object]] = {
    "local_supplier_volume": q_local_supplier_volume,
    "nation_pair_volume": q_nation_pair_volume,
    "returned_item_revenue": q_returned_item_revenue,
    "customer_order_counts": q_customer_order_counts,
    "small_qty_revenue": q_small_qty_revenue,
    "special_discount_revenue": q_special_discount_revenue,
    "idle_customer_balance": q_idle_customer_balance,
}

REL3_ORACLES: dict[str, str] = {
    "local_supplier_volume": LOCAL_SUPPLIER_VOLUME_SQL,
    "nation_pair_volume": NATION_PAIR_VOLUME_SQL,
    "returned_item_revenue": RETURNED_ITEM_REVENUE_SQL,
    "customer_order_counts": CUSTOMER_ORDER_COUNTS_SQL,
    "small_qty_revenue": SMALL_QTY_REVENUE_SQL,
    "special_discount_revenue": SPECIAL_DISCOUNT_REVENUE_SQL,
    "idle_customer_balance": IDLE_CUSTOMER_BALANCE_SQL,
}
