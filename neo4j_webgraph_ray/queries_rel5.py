"""Fifth relational/analytics query panel: the TPC-H shapes built on
correlated / decorated subqueries — Q2 (best supplier per part), Q11
(important stock), Q15 (top supplier), Q20 (dominant-volume suppliers)
and Q21 (suppliers who kept orders waiting) — re-expressed on this
schema (no partsupp / commitdate, so supply cost becomes account
balance, available stock becomes shipped volume, and the receipt-lag
wait becomes the ship-vs-order lag).

Same conventions as :mod:`neo4j_webgraph_ray.queries_rel2` .. ``rel4``
(the reference's query surface is Cypher over the imported graph plus
the relational reports its operators feed — ``WebGraphQueries.java``):
exact integer arithmetic end to end (2-dp doubles by construction →
cent / centi-unit int64 partials, so the oracle hash cannot be broken
by float summation order), per-batch fact compression BEFORE any join
or shuffle, the engine's size-gated
:func:`~neo4j_webgraph_ray.queries._lookup_join` for every equi-join,
:func:`~neo4j_webgraph_ray.stages.core.bucketed_groupby` for the wide
group steps (algebraic local combine first, so shuffle volume is
≤ #distinct-keys per block, never #rows), and only counts / bounded
dimension-cardinality partials ever leaving the workers.  The two
decidedly non-algebraic verdicts (Q20 dominance, Q21 sole-late-supplier)
run as a second, ``local_combine=False`` bucketed pass over the already
pair-compressed rows, so every key group is examined whole exactly
once.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from neo4j_webgraph_ray.queries import _lookup_join
from neo4j_webgraph_ray.queries_rel2 import _cents, _read, _sum_by_key
from neo4j_webgraph_ray.queries_rel3 import _nation_names, _sum_by_keys, _ts_us
from neo4j_webgraph_ray.stages.core import bucketed_groupby


def _max_by_keys(keys: tuple[np.ndarray, ...], val: np.ndarray):
    """Multi-key per-batch MAX combiner (the max analogue of
    :func:`~neo4j_webgraph_ray.queries_rel3._sum_by_keys`)."""
    n = len(keys[0])
    if n == 0:
        return tuple(list(keys) + [val])
    order = np.lexsort(keys[::-1])
    ks = [k[order] for k in keys]
    neq = np.zeros(n, dtype=bool)
    neq[0] = True
    for k in ks:
        neq[1:] |= k[1:] != k[:-1]
    bound = np.flatnonzero(neq)
    out = [k[bound] for k in ks]
    out.append(np.maximum.reduceat(val[order], bound))
    return tuple(out)


# ------------------------------------------------------------------ Q2


#: Q2 analog selection: parts of this type, suppliers in this region
PREF_REGION = "EUROPE"
PREF_TYPE = "STANDARD"


def q_preferred_supplier_per_part(sf_dir: str) -> pd.DataFrame:
    """Best supplier per part (TPC-H Q2 shape on this schema): for each
    ``PREF_TYPE`` part, among the ``PREF_REGION`` suppliers that have
    actually shipped it, the one with the highest account balance
    (exact cents; ties to the smaller suppkey — the rule the oracle
    shares).

    Scale shape: lineitem compresses per batch to distinct
    (partkey, suppkey) pairs; the part-type semi-join and the
    balance attach are size-gated lookup joins (the region filter is
    folded into the supplier side, so non-region suppliers vanish at
    the inner join); the per-part argmax is algebraic, so it runs per
    block first and once more inside a bucketed shuffle — the driver
    only ever sees the ≤ #selected-parts contract result."""
    nk, nnames, rnames = _nation_names(sf_dir)
    region_keys = nk[rnames == PREF_REGION]

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def pairs(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        pk, sk = _sum_by_keys((pk, sk))
        return pa.table(
            {"pk": pa.array(pk, pa.int64()), "sk": pa.array(sk, pa.int64())}
        )

    part = _read(sf_dir, "part", ["p_partkey", "p_type"])

    def part_marks(df: pd.DataFrame) -> pd.DataFrame:
        keep = df.loc[df["p_type"].to_numpy() == PREF_TYPE, ["p_partkey"]]
        return keep.assign(pmark=keep["p_partkey"].to_numpy(np.int64))

    sup = _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal", "s_nationkey"])

    def sup_bal(df: pd.DataFrame) -> pd.DataFrame:
        m = np.isin(df["s_nationkey"].to_numpy(np.int64), region_keys)
        return pd.DataFrame(
            {
                "s_suppkey": df["s_suppkey"].to_numpy(np.int64)[m],
                "bal_c": _cents(df["s_acctbal"].to_numpy()[m]),
            }
        )

    j1 = _lookup_join(
        li.map_batches(pairs, batch_format="pyarrow", zero_copy_batch=True),
        "pk", part.map_batches(part_marks, batch_format="pandas"),
        "p_partkey", "pmark", out_col="_pm", carry_cols=["sk"], keep_key=True,
    )
    j2 = _lookup_join(
        j1, "sk", sup.map_batches(sup_bal, batch_format="pandas"),
        "s_suppkey", "bal_c", out_col="bal", carry_cols=["pk"], keep_key=True,
    )

    def best(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df[["pk", "sk", "bal"]]
        df = df[["pk", "sk", "bal"]].sort_values(
            ["pk", "bal", "sk"], ascending=[True, False, True], kind="stable"
        )
        pk = df["pk"].to_numpy()
        return df.iloc[np.flatnonzero(np.r_[True, pk[1:] != pk[:-1]])]

    top = bucketed_groupby(j2, ["pk"], best)
    named = _lookup_join(
        top, "sk", _read(sf_dir, "supplier", ["s_suppkey", "s_name"]),
        "s_suppkey", "s_name", out_col="s_name",
        carry_cols=["pk", "bal"], keep_key=True, val_default="",
    )
    withnat = _lookup_join(
        named, "sk", sup, "s_suppkey", "s_nationkey", out_col="snat",
        carry_cols=["pk", "bal", "s_name"], keep_key=True,
    ).to_pandas()
    nidx = np.searchsorted(nk, withnat["snat"].to_numpy(np.int64))
    return (
        pd.DataFrame(
            {
                "p_partkey": withnat["pk"].to_numpy(np.int64),
                "s_suppkey": withnat["sk"].to_numpy(np.int64),
                "s_name": withnat["s_name"].to_numpy(),
                "s_acctbal": withnat["bal"].to_numpy(np.int64) / 100.0,
                "n_name": nnames[nidx],
            }
        )
        .sort_values(["s_acctbal", "p_partkey"], ascending=[False, True])
        .reset_index(drop=True)
    )


PREFERRED_SUPPLIER_SQL = f"""
SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name FROM (
  SELECT d.pk AS p_partkey, s_suppkey, s_name, s_acctbal, n_name,
         row_number() OVER (
           PARTITION BY d.pk
           ORDER BY CAST(ROUND(s_acctbal * 100) AS BIGINT) DESC,
                    s_suppkey ASC) AS rn
  FROM (SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem) d
  JOIN part ON d.pk = p_partkey AND p_type = '{PREF_TYPE}'
  JOIN supplier ON d.sk = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey AND r_name = '{PREF_REGION}')
WHERE rn = 1
ORDER BY s_acctbal DESC, p_partkey
"""


# ----------------------------------------------------------------- Q11


#: a part is "important" when its revenue exceeds this multiple of the
#: MEAN per-part revenue (13/10 = 1.3x) — mean-relative so the entry is
#: non-vacuous at every scale factor, unlike Q11's fixed fraction
IMPORTANT_MULT_NUM, IMPORTANT_MULT_DEN = 13, 10


def q_important_parts(sf_dir: str) -> pd.DataFrame:
    """Important parts (TPC-H Q11 shape): parts whose total discounted
    revenue exceeds 1.3x the mean per-part revenue.

    Scale shape: one streaming pass folds lineitem into per-batch
    (partkey, rev4) int64 partials; a bucketed algebraic sum makes them
    global; the corpus total and part count reach the driver as ONE
    (sum, count) pair per block and fold in arbitrary-precision Python
    ints, so the global threshold is exact at any corpus size; the
    filter itself is an integer compare pushed back into the blocks
    (``rev4 >= floor(total*13 / (10*n)) + 1`` ⇔ ``rev4*10*n >
    total*13`` for integer rev4)."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        if pk.size:
            rev4 = _cents(t["l_extendedprice"]) * (100 - _cents(t["l_discount"]))
            pk, rev4 = _sum_by_key(pk, rev4)
        else:
            rev4 = pk
        return pa.table(
            {"pk": pa.array(pk, pa.int64()), "rev4": pa.array(rev4, pa.int64())}
        )

    def resum(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("pk", as_index=False, sort=False)["rev4"].sum()

    per_part = bucketed_groupby(
        li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["pk"], resum,
    ).materialize()  # consumed twice: total fold + filtered output

    totals = per_part.map_batches(
        lambda df: pd.DataFrame(
            {"s": pd.array([int(df["rev4"].sum())], dtype="int64"),
             "n": pd.array([len(df)], dtype="int64")}
        ),
        batch_format="pandas",
    ).to_pandas()
    total = sum(int(v) for v in totals["s"])  # python ints: no overflow
    nparts = sum(int(v) for v in totals["n"])
    if nparts == 0:
        return pd.DataFrame({"p_partkey": pd.array([], dtype="int64"),
                             "value": pd.array([], dtype="float64")})
    thr = (total * IMPORTANT_MULT_NUM) // (IMPORTANT_MULT_DEN * nparts) + 1

    def keep(df: pd.DataFrame) -> pd.DataFrame:
        m = df["rev4"].to_numpy(np.int64) >= thr
        return pd.DataFrame(
            {"p_partkey": df["pk"].to_numpy(np.int64)[m],
             "value": df["rev4"].to_numpy(np.int64)[m] / 10_000.0}
        )

    out = per_part.map_batches(keep, batch_format="pandas").to_pandas()
    if not len(out):  # zero qualifying rows arrive schema-less
        return pd.DataFrame({"p_partkey": pd.array([], dtype="int64"),
                             "value": pd.array([], dtype="float64")})
    return (
        out.sort_values(["value", "p_partkey"], ascending=[False, True])
        .reset_index(drop=True)
    )


IMPORTANT_PARTS_SQL = f"""
WITH pr AS (
  SELECT l_partkey AS pk,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS rev4
  FROM lineitem GROUP BY 1),
tot AS (SELECT SUM(CAST(rev4 AS HUGEINT)) AS s, COUNT(*) AS n FROM pr)
SELECT pk AS p_partkey, rev4 / 10000.0 AS value
FROM pr, tot
WHERE CAST(rev4 AS HUGEINT) * {IMPORTANT_MULT_DEN} * n
      > s * {IMPORTANT_MULT_NUM}
ORDER BY value DESC, p_partkey
"""


# ----------------------------------------------------------------- Q15


#: Q15 window: one quarter of shipments
TOPSUPP_LO, TOPSUPP_HI = "1997-01-01", "1997-04-01"


def q_top_revenue_supplier(sf_dir: str) -> pd.DataFrame:
    """Top revenue supplier (TPC-H Q15): the supplier(s) with maximum
    discounted revenue over one ship-date quarter — ALL of them on a
    tie, like the reference query's ``= max`` subselect.

    Scale shape: the quarter filter and the per-supplier int64 fold run
    per batch; a bucketed algebraic sum makes the per-supplier totals
    global; the global max reaches the driver as one int per block; the
    equality filter is pushed back into the blocks.  Only the winners
    (almost always one row) are collected and name-joined."""
    lo = np.datetime64(TOPSUPP_LO, "us").view("int64")
    hi = np.datetime64(TOPSUPP_HI, "us").view("int64")
    li = _read(
        sf_dir, "lineitem",
        ["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(t: pa.Table) -> pa.Table:
        sd = _ts_us(t["l_shipdate"])
        m = (sd >= lo) & (sd < hi)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)[m]
        if sk.size:
            rev4 = (_cents(t["l_extendedprice"])
                    * (100 - _cents(t["l_discount"])))[m]
            sk, rev4 = _sum_by_key(sk, rev4)
        else:
            rev4 = sk
        return pa.table(
            {"sk": pa.array(sk, pa.int64()), "rev4": pa.array(rev4, pa.int64())}
        )

    def resum(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("sk", as_index=False, sort=False)["rev4"].sum()

    per_supp = bucketed_groupby(
        li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["sk"], resum,
    ).materialize()  # consumed twice: max fold + winner filter

    maxes = per_supp.map_batches(
        lambda df: pd.DataFrame(
            {"m": pd.array([int(df["rev4"].max()) if len(df) else np.iinfo(np.int64).min],
                           dtype="int64")}
        ),
        batch_format="pandas",
    ).to_pandas()
    if not len(maxes):
        return pd.DataFrame(
            {"s_suppkey": pd.array([], dtype="int64"),
             "s_name": pd.array([], dtype=object),
             "total_revenue": pd.array([], dtype="float64")}
        )
    best = int(maxes["m"].max())

    def winners(df: pd.DataFrame) -> pd.DataFrame:
        m = df["rev4"].to_numpy(np.int64) == best
        return df.loc[m, ["sk", "rev4"]]

    named = _lookup_join(
        per_supp.map_batches(winners, batch_format="pandas"),
        "sk", _read(sf_dir, "supplier", ["s_suppkey", "s_name"]),
        "s_suppkey", "s_name", out_col="s_name", carry_cols=["rev4"],
        keep_key=True, val_default="",
    ).to_pandas()
    return (
        pd.DataFrame(
            {
                "s_suppkey": named["sk"].to_numpy(np.int64),
                "s_name": named["s_name"].to_numpy(),
                "total_revenue": named["rev4"].to_numpy(np.int64) / 10_000.0,
            }
        )
        .sort_values("s_suppkey")
        .reset_index(drop=True)
    )


TOP_REVENUE_SUPPLIER_SQL = f"""
WITH sr AS (
  SELECT l_suppkey AS sk,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))) AS rev4
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '{TOPSUPP_LO}'
    AND l_shipdate < TIMESTAMP '{TOPSUPP_HI}'
  GROUP BY 1)
SELECT s_suppkey, s_name, rev4 / 10000.0 AS total_revenue
FROM sr JOIN supplier ON sk = s_suppkey
WHERE rev4 = (SELECT max(rev4) FROM sr)
ORDER BY s_suppkey
"""


# ----------------------------------------------------------------- Q20


#: Q20 analog: a supplier "dominates" a part when it shipped more than
#: 1/DOMINANT_DEN of the part's total quantity (strict >)
DOMINANT_DEN = 5
DOMINANT_SUFFIX = "widget"


def q_dominant_suppliers(sf_dir: str) -> pd.DataFrame:
    """Dominant-volume suppliers (TPC-H Q20 shape): per supplier, how
    many ``*{suffix}`` parts it shipped more than a 1/5 share of —
    shipped volume standing in for available stock on this schema.

    Scale shape: lineitem folds per batch to (partkey, suppkey,
    qty-int64) partials; a part-suffix semi-join gates them; a bucketed
    algebraic sum makes the pair volumes global; the NON-algebraic
    dominance verdict (share vs the part total) runs as a second
    ``local_combine=False`` bucketed pass so each part group is
    examined whole exactly once; per-supplier counts leave each block
    as ≤ #suppliers int partials."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        qty = np.rint(
            t["l_quantity"].to_numpy(zero_copy_only=False)
        ).astype(np.int64)
        pk, sk, qty = _sum_by_keys((pk, sk), qty)
        return pa.table(
            {"pk": pa.array(pk, pa.int64()), "sk": pa.array(sk, pa.int64()),
             "qty": pa.array(qty, pa.int64())}
        )

    part = _read(sf_dir, "part", ["p_partkey", "p_name"])

    def part_marks(df: pd.DataFrame) -> pd.DataFrame:
        keep = df.loc[
            df["p_name"].str.endswith(DOMINANT_SUFFIX).to_numpy(), ["p_partkey"]
        ]
        return keep.assign(pmark=keep["p_partkey"].to_numpy(np.int64))

    gated = _lookup_join(
        li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "pk", part.map_batches(part_marks, batch_format="pandas"),
        "p_partkey", "pmark", out_col="_pm", carry_cols=["sk", "qty"],
        keep_key=True,
    )

    def resum(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["pk", "sk"], as_index=False, sort=False)["qty"].sum()

    pair_qty = bucketed_groupby(gated, ["pk"], resum)

    def verdict(df: pd.DataFrame) -> pd.DataFrame:
        # whole pk groups per call (local_combine=False second pass)
        qty = df["qty"].to_numpy(np.int64)
        tot = df.groupby("pk")["qty"].transform("sum").to_numpy(np.int64)
        m = DOMINANT_DEN * qty > tot
        return df.loc[m, ["pk", "sk"]]

    dominant = bucketed_groupby(
        pair_qty, ["pk"], verdict, local_combine=False
    )

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):  # a bucket where the verdict filtered every row
            return pd.DataFrame({"sk": pd.array([], dtype="int64"),
                                 "n_parts": pd.array([], dtype="int64")})
        sk, n = _sum_by_key(
            df["sk"].to_numpy(np.int64), np.ones(len(df), np.int64)
        )
        return pd.DataFrame({"sk": sk, "n_parts": n})

    partials = dominant.map_batches(counts, batch_format="pandas").to_pandas()
    if not len(partials):  # zero qualifying rows arrive schema-less
        return pd.DataFrame(
            {"s_suppkey": pd.array([], dtype="int64"),
             "s_name": pd.array([], dtype=object),
             "n_parts": pd.array([], dtype="int64")}
        )
    agg = partials.groupby("sk", as_index=False, sort=True)["n_parts"].sum()
    named = _lookup_join(
        ray.data.from_pandas(agg),
        "sk", _read(sf_dir, "supplier", ["s_suppkey", "s_name"]),
        "s_suppkey", "s_name", out_col="s_name", carry_cols=["n_parts"],
        keep_key=True, val_default="",
    ).to_pandas()
    return (
        pd.DataFrame(
            {
                "s_suppkey": named["sk"].to_numpy(np.int64),
                "s_name": named["s_name"].to_numpy(),
                "n_parts": named["n_parts"].to_numpy(np.int64),
            }
        )
        .sort_values(["n_parts", "s_suppkey"], ascending=[False, True])
        .reset_index(drop=True)
    )


DOMINANT_SUPPLIERS_SQL = f"""
WITH q AS (
  SELECT l_partkey AS pk, l_suppkey AS sk,
         SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_name LIKE '%{DOMINANT_SUFFIX}'
  GROUP BY 1, 2),
tot AS (SELECT pk, SUM(qty) AS t FROM q GROUP BY 1)
SELECT sk AS s_suppkey, s_name, CAST(count(*) AS BIGINT) AS n_parts
FROM q JOIN tot USING (pk) JOIN supplier ON sk = s_suppkey
WHERE {DOMINANT_DEN} * qty > t
GROUP BY sk, s_name
ORDER BY n_parts DESC, s_suppkey
"""


# ----------------------------------------------------------------- Q21


#: Q21 analog: a supplier kept an order waiting when its LAST shipment
#: for the order trailed the order date by more than this many days
WAIT_DAYS = 90
WAIT_STATUS = "F"
_WAIT_US = WAIT_DAYS * 86_400 * 1_000_000


def q_waiting_orders_suppliers(sf_dir: str) -> pd.DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21 shape): per
    supplier, the count of finished multi-supplier orders where it was
    the ONLY supplier whose last shipment trailed the order date by
    more than {WAIT_DAYS} days (ship-vs-order lag standing in for the
    receipt-vs-commit lag this schema lacks).

    Scale shape: lineitem folds per batch to (orderkey, suppkey,
    max-shipdate) — max is algebraic, so the late flag needs only one
    µs-integer compare after the status-filtered order-date lookup
    join (inner, so non-'F' orders vanish at the join); a bucketed
    algebraic max makes the pair flags global; the NON-algebraic
    sole-late verdict runs as a second ``local_combine=False`` bucketed
    pass over whole order groups; per-supplier counts leave each block
    as ≤ #suppliers int partials."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"])

    def partial(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ms = _ts_us(t["l_shipdate"])
        ok, sk, ms = _max_by_keys((ok, sk), ms)
        return pa.table(
            {"ok": pa.array(ok, pa.int64()), "sk": pa.array(sk, pa.int64()),
             "ms": pa.array(ms, pa.int64())}
        )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderstatus"])

    def fin_orders(df: pd.DataFrame) -> pd.DataFrame:
        m = df["o_orderstatus"].to_numpy() == WAIT_STATUS
        return pd.DataFrame(
            {
                "o_orderkey": df["o_orderkey"].to_numpy(np.int64)[m],
                "odate": df["o_orderdate"][m]
                .to_numpy()
                .astype("datetime64[us]")
                .view(np.int64),
            }
        )

    j = _lookup_join(
        li.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        "ok", orders.map_batches(fin_orders, batch_format="pandas"),
        "o_orderkey", "odate", out_col="odate", carry_cols=["sk", "ms"],
        keep_key=True,
    )

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        late = (
            df["ms"].to_numpy(np.int64) - df["odate"].to_numpy(np.int64)
            > _WAIT_US
        ).astype(np.int64)
        return pd.DataFrame(
            {"ok": df["ok"].to_numpy(np.int64),
             "sk": df["sk"].to_numpy(np.int64), "late": late}
        )

    def remax(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby(["ok", "sk"], as_index=False, sort=False)["late"].max()

    pair_late = bucketed_groupby(
        j.map_batches(flag, batch_format="pandas"), ["ok"], remax
    )

    def verdict(df: pd.DataFrame) -> pd.DataFrame:
        # whole ok groups per call (local_combine=False second pass)
        g = df.groupby("ok")["late"]
        nsupp = g.transform("size").to_numpy(np.int64)
        nlate = g.transform("sum").to_numpy(np.int64)
        m = (nsupp >= 2) & (nlate == 1) & (df["late"].to_numpy(np.int64) == 1)
        return df.loc[m, ["ok", "sk"]]

    sole_late = bucketed_groupby(pair_late, ["ok"], verdict, local_combine=False)

    def counts(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):  # a bucket where the verdict filtered every row
            return pd.DataFrame({"sk": pd.array([], dtype="int64"),
                                 "numwait": pd.array([], dtype="int64")})
        sk, n = _sum_by_key(
            df["sk"].to_numpy(np.int64), np.ones(len(df), np.int64)
        )
        return pd.DataFrame({"sk": sk, "numwait": n})

    partials = sole_late.map_batches(counts, batch_format="pandas").to_pandas()
    if not len(partials):  # zero qualifying rows arrive schema-less
        return pd.DataFrame(
            {"s_suppkey": pd.array([], dtype="int64"),
             "s_name": pd.array([], dtype=object),
             "numwait": pd.array([], dtype="int64")}
        )
    agg = partials.groupby("sk", as_index=False, sort=True)["numwait"].sum()
    named = _lookup_join(
        ray.data.from_pandas(agg),
        "sk", _read(sf_dir, "supplier", ["s_suppkey", "s_name"]),
        "s_suppkey", "s_name", out_col="s_name", carry_cols=["numwait"],
        keep_key=True, val_default="",
    ).to_pandas()
    return (
        pd.DataFrame(
            {
                "s_suppkey": named["sk"].to_numpy(np.int64),
                "s_name": named["s_name"].to_numpy(),
                "numwait": named["numwait"].to_numpy(np.int64),
            }
        )
        .sort_values(["numwait", "s_suppkey"], ascending=[False, True])
        .reset_index(drop=True)
    )


WAITING_ORDERS_SQL = f"""
WITH ls AS (
  SELECT l_orderkey AS ok, l_suppkey AS sk, max(l_shipdate) AS ms
  FROM lineitem GROUP BY 1, 2),
j AS (
  SELECT ok, sk,
         CASE WHEN ms > o_orderdate + INTERVAL {WAIT_DAYS} DAY
              THEN 1 ELSE 0 END AS late
  FROM ls JOIN orders ON ok = o_orderkey
  WHERE o_orderstatus = '{WAIT_STATUS}'),
g AS (SELECT ok, count(*) AS ns, sum(late) AS nl FROM j GROUP BY 1)
SELECT sk AS s_suppkey, s_name, CAST(count(*) AS BIGINT) AS numwait
FROM j JOIN g USING (ok) JOIN supplier ON sk = s_suppkey
WHERE ns >= 2 AND nl = 1 AND late = 1
GROUP BY sk, s_name
ORDER BY numwait DESC, s_suppkey
"""




# ---------------------------------------------------------------- CUBE


def q_events_cube(sf_dir: str) -> pd.DataFrame:
    """Full CUBE over (event_type, day-of-week): all four grouping sets
    — (type, dow), (type), (dow), () — with event count and exact-cent
    value sum; rolled-up dimensions report the 'ALL' / -1 sentinels
    (the GROUPING() convention, shared with the oracle).  Completes the
    OLAP family next to ``events_rollup``'s ROLLUP walk.

    Scale shape: ONE streaming pass folds to per-batch partials at the
    finest grain (≤ #types × 7 rows per block); every coarser grouping
    set is FOLDED from the finest aggregate on the driver (sums are
    algebraic; the finest table is bounded by the dimension product,
    never the corpus)."""
    from neo4j_webgraph_ray.queries import _DAY_US

    ds = _read(sf_dir, "events", ["ts", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        t = df["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        dow = ((t // _DAY_US) + 4) % 7  # SQL dayofweek: Sunday = 0
        g = pd.DataFrame(
            {"event_type": df["event_type"].to_numpy(),
             "dow": dow.astype(np.int64),
             "v": _cents(df["value"].to_numpy()),
             "n": np.int64(1)}
        )
        return g.groupby(["event_type", "dow"], as_index=False, sort=False).sum()

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    fine = parts.groupby(["event_type", "dow"], as_index=False, sort=True).sum()
    by_type = fine.groupby("event_type", as_index=False, sort=True)[["v", "n"]].sum()
    by_type["dow"] = np.int64(-1)
    by_dow = fine.groupby("dow", as_index=False, sort=True)[["v", "n"]].sum()
    by_dow["event_type"] = "ALL"
    total = pd.DataFrame(
        [{"event_type": "ALL", "dow": np.int64(-1),
          "v": fine["v"].sum(), "n": fine["n"].sum()}]
    )
    out = pd.concat(
        [fine, by_type, by_dow, total], ignore_index=True
    )[["event_type", "dow", "v", "n"]]
    return pd.DataFrame(
        {
            "event_type": out["event_type"].to_numpy(),
            "dow": out["dow"].to_numpy(np.int64),
            "n_events": out["n"].to_numpy(np.int64),
            "total_value": out["v"].to_numpy(np.int64) / 100.0,
        }
    ).sort_values(["event_type", "dow"]).reset_index(drop=True)


EVENTS_CUBE_SQL = """
SELECT CASE WHEN GROUPING(event_type) = 1 THEN 'ALL' ELSE event_type END
         AS event_type,
       CAST(CASE WHEN GROUPING(dow) = 1 THEN -1 ELSE dow END AS BIGINT)
         AS dow,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0
         AS total_value
FROM (SELECT event_type, dayofweek(ts) AS dow, value FROM events)
GROUP BY CUBE(event_type, dow)
ORDER BY event_type, dow
"""


REL5_QUERIES: dict[str, Callable[[str], object]] = {
    "preferred_supplier_per_part": q_preferred_supplier_per_part,
    "important_parts": q_important_parts,
    "top_revenue_supplier": q_top_revenue_supplier,
    "dominant_suppliers": q_dominant_suppliers,
    "waiting_orders_suppliers": q_waiting_orders_suppliers,
    "events_cube": q_events_cube,
}

REL5_ORACLES: dict[str, str] = {
    "preferred_supplier_per_part": PREFERRED_SUPPLIER_SQL,
    "important_parts": IMPORTANT_PARTS_SQL,
    "top_revenue_supplier": TOP_REVENUE_SUPPLIER_SQL,
    "dominant_suppliers": DOMINANT_SUPPLIERS_SQL,
    "waiting_orders_suppliers": WAITING_ORDERS_SQL,
    "events_cube": EVENTS_CUBE_SQL,
}
