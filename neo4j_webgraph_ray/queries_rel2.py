"""Second relational/analytics query panel: classic warehouse shapes
(TPC-H Q4/Q12/Q14/Q18 analogs, argmax-per-group, correlated-subquery
rewrite, window running sum), a bounded range join over the event
stream, a day-of-week rollup, and the rich-club coefficient over the
transcript graph.

Same conventions as :mod:`neo4j_webgraph_ray.queries` (the reference's
query surface is Cypher over the imported graph plus the relational
reports its operators feed — e.g. ``WebGraphQueries.java`` point/rollup
reads): exact integer arithmetic end to end (prices/quantities/values
are 2-dp doubles by construction, so cent/centi-unit int64 sums are
exact and the oracle hash cannot be broken by float summation order),
fact-first per-batch compression before any join, the engine's
size-gated :func:`~neo4j_webgraph_ray.queries._lookup_join` for every
equi-join (broadcast under the gate, side-tagged bucketed co-group
beyond — nothing collects on the driver), and only counts / partials
ever leaving the workers.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from neo4j_webgraph_ray.queries import (
    GRAPH_SQL_PRELUDE,
    _DAY_US,
    _UT_DT,
    _events_user_bucketed,
    _lookup_join,
    graph,
)
from neo4j_webgraph_ray.stages.core import bucketed_groupby


def _read(sf_dir: str, table: str, columns: list[str]) -> ray.data.Dataset:
    return ray.data.read_parquet(
        os.path.join(sf_dir, f"{table}.parquet"), columns=columns
    )


def _cents(col: pa.ChunkedArray | np.ndarray) -> np.ndarray:
    """Exact 2-dp double → int64 cents (np.rint is safe: values sit
    within 1e-9 of integer cents, never at a .5 boundary)."""
    v = col if isinstance(col, np.ndarray) else col.to_numpy(zero_copy_only=False)
    return np.rint(v * 100.0).astype(np.int64)


def _sum_by_key(ok: np.ndarray, *vals: np.ndarray) -> tuple[np.ndarray, ...]:
    """Per-batch combiner: (sorted distinct keys, per-key sums of each
    value array) via ONE argsort + add.reduceat — the local
    pre-aggregation that keeps shuffle volume at ≤ #distinct-keys per
    block instead of #rows."""
    order = np.argsort(ok, kind="stable")
    ok = ok[order]
    bound = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
    out = [ok[bound]]
    for v in vals:
        out.append(np.add.reduceat(v[order], bound))
    return tuple(out)


# ---------------------------------------------------------------- Q14


#: promo-share window (TPC-H Q14 uses one month; two here so the
#: sf0.001 sample keeps a few hundred rows)
PROMO_LO, PROMO_HI = "1997-01-01", "1997-03-01"


def q_promo_revenue(sf_dir: str) -> pd.DataFrame:
    """Promotion-revenue share (TPC-H Q14 shape): of the revenue from
    lineitems shipped within [PROMO_LO, PROMO_HI), the percentage on
    parts of type ``PROMO``.

    Scale shape: row-group/column-pruned read, per-batch exact-int
    revenue partials compressed to one row per distinct partkey per
    block BEFORE the part join (p_type depends only on partkey), the
    size-gated lookup join for the dimension attach, and two int64
    counters per block reaching the driver.  The single float division
    is the same IEEE expression as the oracle's."""
    lo = np.datetime64(PROMO_LO, "us").view("int64")
    hi = np.datetime64(PROMO_HI, "us").view("int64")
    li = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(t: pa.Table) -> pa.Table:
        sd = t["l_shipdate"].to_numpy(zero_copy_only=False)
        sd = sd.astype("datetime64[us]").view(np.int64)
        m = (sd >= lo) & (sd < hi)
        empty = pa.table(
            {"pkey": pa.array([], pa.int64()),
             "rev4": pa.array([], pa.int64())}
        )
        if not m.any():
            return empty
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)[m].astype(np.int64)
        rev4 = _cents(t["l_extendedprice"])[m] * (
            100 - _cents(t["l_discount"])[m]
        )
        pk, rev4 = _sum_by_key(pk, rev4)
        return pa.table(
            {"pkey": pa.array(pk, pa.int64()),
             "rev4": pa.array(rev4, pa.int64())}
        )

    partials = li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
    part = _read(sf_dir, "part", ["p_partkey", "p_type"])
    typed = _lookup_join(
        partials, "pkey", part, "p_partkey", "p_type", out_col="ptype",
        carry_cols=["rev4"],
    )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        rev4 = df["rev4"].to_numpy()
        promo = rev4[df["ptype"].to_numpy() == "PROMO"]
        return pd.DataFrame(
            {"promo4": [np.int64(promo.sum())],
             "total4": [np.int64(rev4.sum())]}
        )

    agg = typed.map_batches(fold, batch_format="pandas").to_pandas()
    promo4 = np.int64(agg["promo4"].sum())
    total4 = np.int64(agg["total4"].sum())
    # same IEEE op order as the oracle: (100.0 * promo) / total
    pct = (100.0 * float(promo4)) / float(total4)
    return pd.DataFrame(
        {
            "promo_revenue": [promo4 / 10_000.0],
            "total_revenue": [total4 / 10_000.0],
            "promo_pct": [pct],
        }
    )


PROMO_REVENUE_SQL = f"""
WITH w AS (
  SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT)
         * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev4,
         p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '{PROMO_LO}'
    AND l_shipdate < TIMESTAMP '{PROMO_HI}')
SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev4 ELSE 0 END)
            AS DOUBLE) / 10000.0 AS promo_revenue,
       CAST(SUM(rev4) AS DOUBLE) / 10000.0 AS total_revenue,
       100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev4 ELSE 0 END)
                    AS DOUBLE)
             / CAST(SUM(rev4) AS DOUBLE) AS promo_pct
FROM w
"""


# ----------------------------------------------------------------- Q4


#: an order is "late-shipped" when some lineitem ships more than this
#: many days after the order date
LATE_SHIP_DAYS = 90


def q_late_shipment_priority(sf_dir: str) -> pd.DataFrame:
    """Order-priority checking (TPC-H Q4 shape): per order priority,
    the number of orders where at least one lineitem shipped more than
    :data:`LATE_SHIP_DAYS` days after the order date (the EXISTS
    semi-join rewritten as a per-order max — exists(shipdate > cutoff)
    ⇔ max(shipdate) > cutoff, an algebraic reduction).

    Scale shape: per-batch per-order max-shipdate partials
    (argsort + ``maximum.reduceat``), ONE orderkey-bucketed fold to the
    global per-order max (≤ #orders rows shuffle), then orders streams
    through the size-gated lookup join against that compact max table
    and only ≤ 5-row count partials leave each block."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

    def max_partial(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pa.table(
            {"okey": pa.array([], pa.int64()),
             "ms": pa.array([], pa.int64())}
        )
        if not len(ok):
            return empty
        sd = t["l_shipdate"].to_numpy(zero_copy_only=False)
        sd = sd.astype("datetime64[us]").view(np.int64)
        order = np.argsort(ok, kind="stable")
        ok = ok[order]
        bound = np.flatnonzero(np.r_[True, ok[1:] != ok[:-1]])
        return pa.table(
            {"okey": pa.array(ok[bound], pa.int64()),
             "ms": pa.array(np.maximum.reduceat(sd[order], bound), pa.int64())}
        )

    ms = bucketed_groupby(
        li.map_batches(max_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["okey"],
        lambda df: df.groupby("okey", as_index=False, sort=False)["ms"].max(),
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])
    joined = _lookup_join(
        orders, "o_orderkey", ms, "okey", "ms", out_col="ms",
        carry_cols=["o_orderdate", "o_orderpriority"],
    )
    cutoff = np.int64(LATE_SHIP_DAYS) * _DAY_US

    def count_partial(df: pd.DataFrame) -> pd.DataFrame:
        od = df["o_orderdate"].to_numpy().astype("datetime64[us]").view(np.int64)
        late = df.loc[df["ms"].to_numpy() > od + cutoff, "o_orderpriority"]
        return late.value_counts().rename_axis("o_orderpriority").reset_index(
            name="n_late_orders"
        )

    parts = joined.map_batches(count_partial, batch_format="pandas").to_pandas()
    out = (
        parts.groupby("o_orderpriority", as_index=False, sort=True)[
            "n_late_orders"
        ].sum()
    )
    out["n_late_orders"] = out["n_late_orders"].astype(np.int64)
    return out.reset_index(drop=True)


LATE_SHIPMENT_PRIORITY_SQL = f"""
WITH m AS (SELECT l_orderkey, max(l_shipdate) AS ms FROM lineitem GROUP BY 1)
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late_orders
FROM orders JOIN m ON o_orderkey = l_orderkey
WHERE ms > o_orderdate + INTERVAL {LATE_SHIP_DAYS} DAY
GROUP BY 1 ORDER BY 1
"""


# ----------------------------------------------------------------- Q12


HIGH_PRIORITIES = ("1-URGENT", "2-HIGH")


def q_returnflag_priority_counts(sf_dir: str) -> pd.DataFrame:
    """Shipping-priority matrix (TPC-H Q12 shape): per return flag, the
    number of lineitems belonging to high-priority orders
    (:data:`HIGH_PRIORITIES`) vs all others.

    Scale shape: lineitem is the stream; the priority attach is the
    size-gated lookup join (broadcast under the gate — the whole query
    then fuses into one pass over lineitem; co-group beyond), and each
    block emits ≤ 3-row (flag, high, low) partials."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    joined = _lookup_join(
        li, "l_orderkey", orders, "o_orderkey", "o_orderpriority",
        out_col="prio", carry_cols=["l_returnflag"],
    )
    high = frozenset(HIGH_PRIORITIES)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        h = df["prio"].isin(high).to_numpy()
        g = pd.DataFrame(
            {"l_returnflag": df["l_returnflag"].to_numpy(),
             "high_count": h.astype(np.int64),
             "low_count": (~h).astype(np.int64)}
        )
        return g.groupby("l_returnflag", as_index=False, sort=False).sum()

    parts = joined.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby("l_returnflag", as_index=False, sort=True).sum()
    out["high_count"] = out["high_count"].astype(np.int64)
    out["low_count"] = out["low_count"].astype(np.int64)
    return out.reset_index(drop=True)


RETURNFLAG_PRIORITY_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY 1
"""


# ----------------------------------------------------------------- Q18


#: minimum total quantity (in quantity units) for an order to qualify
LARGE_ORDER_MIN_QTY = 200


def q_large_volume_orders(sf_dir: str) -> pd.DataFrame:
    """Large-volume customers (TPC-H Q18 shape): orders whose total
    lineitem quantity is at least :data:`LARGE_ORDER_MIN_QTY`, with the
    ordering customer's name.

    Scale shape: per-batch per-order quantity partials in exact
    centi-units, ONE orderkey-bucketed fold, the threshold filter (the
    selective step — ~6% of orders survive at this cutoff), then the
    SURVIVORS are the lookup side for a streaming orders join (orders
    never collects) and the customer-name attach is a second size-gated
    join.  o_totalprice passes through untouched (no arithmetic → no
    float hazard)."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def qty_partial(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pa.table(
            {"okey": pa.array([], pa.int64()),
             "q100": pa.array([], pa.int64())}
        )
        if not len(ok):
            return empty
        ok, q100 = _sum_by_key(ok, _cents(t["l_quantity"]))
        return pa.table(
            {"okey": pa.array(ok, pa.int64()),
             "q100": pa.array(q100, pa.int64())}
        )

    thresh = np.int64(LARGE_ORDER_MIN_QTY) * 100
    qty = bucketed_groupby(
        li.map_batches(qty_partial, batch_format="pyarrow", zero_copy_batch=True),
        ["okey"],
        lambda df: df.groupby("okey", as_index=False, sort=False)["q100"].sum(),
    ).map_batches(
        lambda df: df.loc[df["q100"].to_numpy() >= thresh],
        batch_format="pandas",
    )

    orders = _read(
        sf_dir, "orders",
        ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    with_qty = _lookup_join(
        orders, "o_orderkey", qty, "okey", "q100", out_col="q100",
        carry_cols=["o_custkey", "o_orderdate", "o_totalprice"],
        keep_key=True,
    )
    customer = _read(sf_dir, "customer", ["c_custkey", "c_name"])
    named = _lookup_join(
        with_qty, "o_custkey", customer, "c_custkey", "c_name",
        out_col="c_name",
        carry_cols=["o_orderkey", "o_orderdate", "o_totalprice", "q100"],
        keep_key=True,
    )
    df = named.to_pandas()
    if not len(df):
        return pd.DataFrame(
            {"c_name": pd.Series([], dtype=object),
             "o_custkey": pd.Series([], dtype=np.int64),
             "o_orderkey": pd.Series([], dtype=np.int64),
             "o_orderdate": pd.Series([], dtype="datetime64[us]"),
             "o_totalprice": pd.Series([], dtype=np.float64),
             "total_qty": pd.Series([], dtype=np.float64)}
        )
    return pd.DataFrame(
        {
            "c_name": df["c_name"].to_numpy(),
            "o_custkey": df["o_custkey"].to_numpy(np.int64),
            "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
            "o_orderdate": df["o_orderdate"].to_numpy().astype("datetime64[us]"),
            "o_totalprice": df["o_totalprice"].to_numpy(np.float64),
            "total_qty": df["q100"].to_numpy(np.int64) / 100.0,
        }
    ).sort_values("o_orderkey").reset_index(drop=True)


LARGE_VOLUME_ORDERS_SQL = f"""
WITH q AS (
  SELECT l_orderkey, SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS q100
  FROM lineitem GROUP BY 1
  HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT))
         >= {LARGE_ORDER_MIN_QTY} * 100)
SELECT c_name, o_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(q100 AS DOUBLE) / 100.0 AS total_qty
FROM orders
JOIN q ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_orderkey
"""


# ----------------------------------------------- argmax per group


def q_top_supplier_per_nation(sf_dir: str) -> pd.DataFrame:
    """Per-nation top supplier by account balance (argmax-with-carry,
    ties to the smaller suppkey) — the TPC-H Q2 'min-cost supplier'
    selection shape on this schema.

    Scale shape: argmax is algebraic, so the same vectorized rule runs
    per batch first (≤ 25 rows leave each block) and once more on the
    driver over #blocks × 25 partials; the ≤ 25-row nation dimension is
    a driver lookup by schema design.  Balances compare as exact cents
    (float ties at 2 dp are real; the suppkey tiebreak is shared with
    the oracle)."""
    sup = _read(
        sf_dir, "supplier", ["s_suppkey", "s_name", "s_acctbal", "s_nationkey"]
    )

    def best(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        df = df.assign(_bal=_cents(df["s_acctbal"].to_numpy()))
        df = df.sort_values(
            ["s_nationkey", "_bal", "s_suppkey"],
            ascending=[True, False, True], kind="stable",
        )
        nk = df["s_nationkey"].to_numpy()
        first = np.r_[True, nk[1:] != nk[:-1]]
        return df.iloc[np.flatnonzero(first)]

    parts = sup.map_batches(best, batch_format="pandas").to_pandas()
    top = best(parts).drop(columns=["_bal"])
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    key = nat["n_nationkey"].to_numpy(np.int64)
    name = nat["n_name"].to_numpy()
    o = np.argsort(key)
    idx = np.searchsorted(key[o], top["s_nationkey"].to_numpy(np.int64))
    return pd.DataFrame(
        {
            "n_name": name[o][idx],
            "s_suppkey": top["s_suppkey"].to_numpy(np.int64),
            "s_name": top["s_name"].to_numpy(),
            "s_acctbal": top["s_acctbal"].to_numpy(np.float64),
        }
    ).sort_values("n_name").reset_index(drop=True)


TOP_SUPPLIER_PER_NATION_SQL = """
SELECT n_name, s_suppkey, s_name, s_acctbal FROM (
  SELECT n_name, s_suppkey, s_name, s_acctbal,
         row_number() OVER (
           PARTITION BY s_nationkey
           ORDER BY CAST(ROUND(s_acctbal * 100) AS BIGINT) DESC,
                    s_suppkey ASC) AS rn
  FROM supplier JOIN nation ON s_nationkey = n_nationkey)
WHERE rn = 1 ORDER BY n_name
"""


# ------------------------------------- correlated-subquery rewrite


def q_above_avg_customers(sf_dir: str) -> pd.DataFrame:
    """Customers above their nation's average balance — the classic
    correlated subquery (``c_acctbal > (SELECT AVG(...) WHERE same
    nation)``) rewritten as the two-pass broadcast plan every
    distributed engine uses: a ≤ 25-row per-nation (sum, count) fold,
    then a second streaming pass comparing each row against its
    nation's aggregate.  The comparison is exact rational arithmetic —
    ``cents * n > sum_cents`` — identical in the oracle, so no float
    average ever exists to disagree on."""
    cust = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

    def agg_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = _cents(df["c_acctbal"].to_numpy())
        g = pd.DataFrame({"nk": df["c_nationkey"].to_numpy(np.int64), "s": c})
        out = g.groupby("nk", as_index=False, sort=False).agg(
            s=("s", "sum"), n=("s", "size")
        )
        return out

    parts = cust.map_batches(agg_partial, batch_format="pandas").to_pandas()
    agg = parts.groupby("nk", as_index=False, sort=True).sum()
    nk_arr = agg["nk"].to_numpy(np.int64)
    s_arr = agg["s"].to_numpy(np.int64)
    n_arr = agg["n"].to_numpy(np.int64)

    def above_partial(df: pd.DataFrame) -> pd.DataFrame:
        c = _cents(df["c_acctbal"].to_numpy())
        nk = df["c_nationkey"].to_numpy(np.int64)
        idx = np.searchsorted(nk_arr, nk)
        above = (c * n_arr[idx]) > s_arr[idx]
        g = pd.DataFrame({"nk": nk, "n_above": above.astype(np.int64)})
        return g.groupby("nk", as_index=False, sort=False)["n_above"].sum()

    aparts = cust.map_batches(above_partial, batch_format="pandas").to_pandas()
    above = aparts.groupby("nk", as_index=False, sort=True)["n_above"].sum()
    merged = agg.merge(above, on="nk", how="left").fillna({"n_above": 0})

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    key = nat["n_nationkey"].to_numpy(np.int64)
    name = nat["n_name"].to_numpy()
    o = np.argsort(key)
    idx = np.searchsorted(key[o], merged["nk"].to_numpy(np.int64))
    return pd.DataFrame(
        {
            "n_name": name[o][idx],
            "n_customers": merged["n"].to_numpy(np.int64),
            "n_above": merged["n_above"].to_numpy(np.int64),
        }
    ).sort_values("n_name").reset_index(drop=True)


ABOVE_AVG_CUSTOMERS_SQL = """
WITH a AS (
  SELECT c_nationkey,
         SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS s,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM customer GROUP BY 1)
SELECT n_name,
       a.n AS n_customers,
       CAST(SUM(CASE WHEN CAST(ROUND(c_acctbal * 100) AS BIGINT) * a.n > a.s
                THEN 1 ELSE 0 END) AS BIGINT) AS n_above
FROM customer
JOIN a ON customer.c_nationkey = a.c_nationkey
JOIN nation ON n_nationkey = customer.c_nationkey
GROUP BY n_name, a.n
ORDER BY n_name
"""


# --------------------------------------------- window running sum


def q_cumulative_customer_spend(sf_dir: str) -> ray.data.Dataset:
    """Running total of each customer's order spend in order-date order
    (ties by orderkey) — the unbounded-preceding window sum, the shape
    behind lifetime-value and burn-down reports.

    Partitioning assumption (custom-operator rule): all orders of a
    customer co-locate — ONE shuffle keyed ``o_custkey % B``; each
    bucket then sorts once and computes every customer's cumsum with a
    single segmented-cumsum (global cumsum minus per-run base), no
    window state, no per-customer loop.  Cents in, so the running sums
    are exact int64."""
    from neo4j_webgraph_ray.sources.transcripts import auto_buckets

    path = os.path.join(sf_dir, "orders.parquet")
    B = auto_buckets(path)
    small = os.path.exists(path) and os.path.getsize(path) < (512 << 20)
    orders = ray.data.read_parquet(
        path,
        columns=["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"],
        override_num_blocks=B if small else None,
    )

    def add_bucket(t: pa.Table) -> pa.Table:
        b = pa.array(
            (t["o_custkey"].to_numpy(zero_copy_only=False) % B).astype(np.int32)
        )
        return t.append_column("bucket", b)

    staged = orders.map_batches(
        add_bucket, batch_format="pyarrow", zero_copy_batch=True
    )

    def running(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"o_custkey": np.empty(0, np.int64),
             "o_orderkey": np.empty(0, np.int64),
             "o_orderdate": np.empty(0, "datetime64[us]"),
             "cum_spend": np.empty(0, np.float64)}
        )
        if not len(df):
            return empty
        df = df.sort_values(
            ["o_custkey", "o_orderdate", "o_orderkey"], kind="stable"
        )
        ck = df["o_custkey"].to_numpy(np.int64)
        cents = _cents(df["o_totalprice"].to_numpy())
        cs = np.cumsum(cents)
        new = np.r_[True, ck[1:] != ck[:-1]]
        starts = np.flatnonzero(new)
        base = (cs[starts] - cents[starts])[np.cumsum(new) - 1]
        return pd.DataFrame(
            {
                "o_custkey": ck,
                "o_orderkey": df["o_orderkey"].to_numpy(np.int64),
                "o_orderdate": df["o_orderdate"].to_numpy().astype(
                    "datetime64[us]"
                ),
                "cum_spend": (cs - base) / 100.0,
            }
        )

    return staged.groupby("bucket").map_groups(running, batch_format="pandas")


CUMULATIVE_CUSTOMER_SPEND_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
            OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate, o_orderkey
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) / 100.0 AS cum_spend
FROM orders
"""


# --------------------------------------------- bounded range join


#: look-back window for the click→purchase range join
CLICK_WINDOW_US = np.int64(3_600_000_000)  # 1 hour


def q_clicks_before_purchase(sf_dir: str) -> ray.data.Dataset:
    """Bounded range join (a custom operator Ray Data lacks): for every
    ``purchase`` event, the number of ``click`` events by the SAME user
    in the hour up to and including the purchase — attribution's
    look-back window, with zero-click purchases kept (LEFT JOIN
    semantics).

    Partitioning assumption: same as the as-of join — one
    ``user_id % B`` shuffle co-locates each user's history; per bucket
    the window counts are two vectorized ``searchsorted`` calls over a
    structured (user, ts) sort key (no per-row loop, no interval
    index)."""
    staged = _events_user_bucketed(
        sf_dir, ["user_id", "ts", "event_id", "event_type"],
        keep_types=("click", "purchase"),
    )

    def window_count(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].to_numpy()
        uid = df["user_id"].to_numpy()
        t = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        is_p = et == "purchase"
        empty = pd.DataFrame(
            {"user_id": np.empty(0, np.int64),
             "purchase_event_id": np.empty(0, np.int64),
             "n_clicks": np.empty(0, np.int64)}
        )
        if not is_p.any():
            return empty
        is_c = et == "click"
        c = np.empty(int(is_c.sum()), dtype=_UT_DT)
        c["u"], c["t"] = uid[is_c], t[is_c]
        c.sort()
        q = np.empty(int(is_p.sum()), dtype=_UT_DT)
        q["u"], q["t"] = uid[is_p], t[is_p]
        hi = np.searchsorted(c, q, side="right")
        q["t"] = q["t"] - CLICK_WINDOW_US
        lo = np.searchsorted(c, q, side="right")
        return pd.DataFrame(
            {
                "user_id": uid[is_p],
                "purchase_event_id": df["event_id"].to_numpy()[is_p],
                "n_clicks": (hi - lo).astype(np.int64),
            }
        )

    return staged.groupby("bucket").map_groups(
        window_count, batch_format="pandas"
    )


CLICKS_BEFORE_PURCHASE_SQL = """
WITH p AS (SELECT user_id, event_id, ts FROM events
           WHERE event_type = 'purchase'),
c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
SELECT p.user_id, p.event_id AS purchase_event_id,
       CAST(count(c.ts) AS BIGINT) AS n_clicks
FROM p LEFT JOIN c
  ON c.user_id = p.user_id AND c.ts <= p.ts
 AND c.ts > p.ts - INTERVAL 1 HOUR
GROUP BY 1, 2
"""


# ------------------------------------------------- temporal rollup


def q_value_by_dayofweek(sf_dir: str) -> pd.DataFrame:
    """Per (event_type, day-of-week) event count and exact value sum —
    the seasonality profile.  Day-of-week matches SQL ``dayofweek``
    (Sunday = 0): epoch-day + 4 mod 7 (1970-01-01 was a Thursday).
    Pure streaming aggregate: ≤ #types × 7 partial rows per block,
    value summed in exact cents."""
    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        dow = ((t // _DAY_US) + 4) % 7
        g = pd.DataFrame(
            {"event_type": df["event_type"].to_numpy(),
             "dow": dow.astype(np.int64),
             "v": _cents(df["value"].to_numpy()),
             "n": np.int64(1)}
        )
        return g.groupby(["event_type", "dow"], as_index=False, sort=False).sum()

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out = parts.groupby(["event_type", "dow"], as_index=False, sort=True).sum()
    return pd.DataFrame(
        {
            "event_type": out["event_type"].to_numpy(),
            "dow": out["dow"].to_numpy(np.int64),
            "n_events": out["n"].to_numpy(np.int64),
            "total_value": out["v"].to_numpy(np.int64) / 100.0,
        }
    )


VALUE_BY_DAYOFWEEK_SQL = """
SELECT event_type, CAST(dayofweek(ts) AS BIGINT) AS dow,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS total_value
FROM events
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ------------------------------------------------------ rich club


RICH_CLUB_KS = (2, 4, 8, 16)


def q_rich_club(sf_dir: str) -> pd.DataFrame:
    """Rich-club coefficient of the undirected simple transcript graph:
    for each degree threshold k in :data:`RICH_CLUB_KS`, the number of
    vertices with degree ≥ k, the number of edges between two such
    vertices, and the density 2·e/(n·(n−1)) — do the hubs link to each
    other more than chance (Colizza et al. 2006)?

    Scale shape: degrees via the engine's standard adjacency fold, both
    endpoint-degree attaches via the size-gated lookup join, and only
    |KS|-row count partials per block reach the driver; the density
    division is the one shared float expression."""
    edges, _ = graph(sf_dir)
    from neo4j_webgraph_ray.pipelines.triangles import undirected_simple

    nb = 16
    und = undirected_simple(edges, num_buckets=nb)

    def adj_rows(df: pd.DataFrame) -> pd.DataFrame:
        a = df["a"].to_numpy()
        b = df["b"].to_numpy()
        return pd.DataFrame(
            {"v": np.r_[a, b], "deg": np.ones(2 * len(a), np.int64)}
        )

    deg = bucketed_groupby(
        und.map_batches(adj_rows, batch_format="pandas"),
        ["v"],
        lambda df: df.groupby("v", as_index=False)["deg"].sum(),
        num_buckets=nb,
    )
    ks = np.asarray(RICH_CLUB_KS, np.int64)

    def n_partial(df: pd.DataFrame) -> pd.DataFrame:
        d = df["deg"].to_numpy()
        return pd.DataFrame(
            {"k": ks, "n_k": (d[None, :] >= ks[:, None]).sum(axis=1)}
        )

    n_parts = deg.map_batches(n_partial, batch_format="pandas").to_pandas()
    n_k = n_parts.groupby("k", sort=True)["n_k"].sum().to_numpy(np.int64)

    da = _lookup_join(
        und, "a", deg, "v", "deg", out_col="deg_a", carry_cols=["b"],
        num_buckets=nb,
    )
    dab = _lookup_join(
        da, "b", deg, "v", "deg", out_col="deg_b", carry_cols=["deg_a"],
        num_buckets=nb,
    )

    def e_partial(df: pd.DataFrame) -> pd.DataFrame:
        m = np.minimum(df["deg_a"].to_numpy(), df["deg_b"].to_numpy())
        return pd.DataFrame(
            {"k": ks, "e_k": (m[None, :] >= ks[:, None]).sum(axis=1)}
        )

    e_parts = dab.map_batches(e_partial, batch_format="pandas").to_pandas()
    e_k = e_parts.groupby("k", sort=True)["e_k"].sum().to_numpy(np.int64)

    dens = np.zeros(len(ks), np.float64)
    ok = n_k >= 2
    dens[ok] = (2.0 * e_k[ok]) / (n_k[ok].astype(np.float64) * (n_k[ok] - 1))
    return pd.DataFrame(
        {"k": ks, "n_k": n_k, "e_k": e_k, "density": dens}
    )


RICH_CLUB_SQL = (
    GRAPH_SQL_PRELUDE
    + """,
sym0 AS (
    SELECT src_kind || ':' || src_key AS s,
           dst_kind || ':' || dst_key AS d FROM edges),
und AS (
    SELECT DISTINCT least(s, d) AS a, greatest(s, d) AS b
    FROM sym0 WHERE s <> d),
dg AS (
    SELECT v, CAST(count(*) AS BIGINT) AS deg
    FROM (SELECT a AS v FROM und UNION ALL SELECT b FROM und)
    GROUP BY v),
ks AS (SELECT CAST(k AS BIGINT) AS k
       FROM (VALUES (2), (4), (8), (16)) t(k)),
nk AS (SELECT k, CAST(count(*) AS BIGINT) AS n_k
       FROM ks JOIN dg ON deg >= k GROUP BY k),
ek AS (SELECT k, CAST(count(*) AS BIGINT) AS e_k
       FROM ks JOIN und ON TRUE
       JOIN dg da ON da.v = a JOIN dg db ON db.v = b
       WHERE da.deg >= k AND db.deg >= k GROUP BY k)
SELECT ks.k AS k, coalesce(n_k, 0) AS n_k, coalesce(e_k, 0) AS e_k,
       CASE WHEN coalesce(n_k, 0) >= 2
            THEN 2.0 * coalesce(e_k, 0)
                 / (CAST(n_k AS DOUBLE) * (n_k - 1))
            ELSE 0.0 END AS density
FROM ks LEFT JOIN nk ON nk.k = ks.k LEFT JOIN ek ON ek.k = ks.k
ORDER BY ks.k
"""
)


REL2_QUERIES: dict[str, Callable[[str], object]] = {
    "promo_revenue": q_promo_revenue,
    "late_shipment_priority": q_late_shipment_priority,
    "returnflag_priority_counts": q_returnflag_priority_counts,
    "large_volume_orders": q_large_volume_orders,
    "top_supplier_per_nation": q_top_supplier_per_nation,
    "above_avg_customers": q_above_avg_customers,
    "cumulative_customer_spend": q_cumulative_customer_spend,
    "clicks_before_purchase": q_clicks_before_purchase,
    "value_by_dayofweek": q_value_by_dayofweek,
    "rich_club": q_rich_club,
}

REL2_ORACLES: dict[str, str] = {
    "promo_revenue": PROMO_REVENUE_SQL,
    "late_shipment_priority": LATE_SHIPMENT_PRIORITY_SQL,
    "returnflag_priority_counts": RETURNFLAG_PRIORITY_SQL,
    "large_volume_orders": LARGE_VOLUME_ORDERS_SQL,
    "top_supplier_per_nation": TOP_SUPPLIER_PER_NATION_SQL,
    "above_avg_customers": ABOVE_AVG_CUSTOMERS_SQL,
    "cumulative_customer_spend": CUMULATIVE_CUSTOMER_SPEND_SQL,
    "clicks_before_purchase": CLICKS_BEFORE_PURCHASE_SQL,
    "value_by_dayofweek": VALUE_BY_DAYOFWEEK_SQL,
    "rich_club": RICH_CLUB_SQL,
}
