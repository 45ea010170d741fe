"""Fourth relational/analytics query panel: the last classic warehouse
shapes expressible on this schema without a partsupp table — TPC-H Q6
(predicate-band forecast revenue), Q8 (nation market share within a
region's market, by order year), Q9 (product margin by supplier nation
and ship year, with ``p_retailprice`` as the cost basis since the
schema has no ``ps_supplycost``), and Q16 (distinct-supplier counts by
part attributes, with the classic exclusion predicates).

Same conventions as :mod:`neo4j_webgraph_ray.queries_rel2` /
:mod:`neo4j_webgraph_ray.queries_rel3` (the reference's query surface
is Cypher over the imported graph plus the relational reports its
operators feed — ``WebGraphQueries.java``): exact integer arithmetic
end to end (2-dp doubles by construction → cent/centi-unit int64
partials, so the oracle hash cannot be broken by float summation
order), per-batch fact compression BEFORE any join, the engine's
size-gated :func:`~neo4j_webgraph_ray.queries._lookup_join` for every
equi-join (broadcast under the gate so chained joins fuse into one
streaming pass; side-tagged bucketed co-group beyond), and only
counts / bounded dimension-cardinality partials ever leaving the
workers.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from neo4j_webgraph_ray.queries import _lookup_join
from neo4j_webgraph_ray.queries_rel2 import _cents, _read, _sum_by_key
from neo4j_webgraph_ray.queries_rel3 import _sum_by_keys, _ts_us
from neo4j_webgraph_ray.stages.core import BUCKET_COL, add_bucket_column


# ----------------------------------------------------------------- Q6


#: Q6 predicate band: ship year, discount band (cents), quantity bound
FORECAST_LO, FORECAST_HI = "1997-01-01", "1998-01-01"
FORECAST_DISC_LO_C, FORECAST_DISC_HI_C = 5, 7
FORECAST_QTY_LT = 24.0


def q_forecast_revenue(sf_dir: str) -> pd.DataFrame:
    """Forecast-revenue change (TPC-H Q6 shape): the revenue that would
    be lost by eliminating discounts in [0.05, 0.07] on low-quantity
    lineitems shipped within one year — ``SUM(l_extendedprice *
    l_discount)`` under the band predicates.

    Scale shape: ONE column-pruned streaming pass; each batch reduces
    to a single exact int64 partial (cents × cents = 1e-4 units), so
    the driver merges #blocks scalars.  No join, no shuffle."""
    lo = np.datetime64(FORECAST_LO, "us").view("int64")
    hi = np.datetime64(FORECAST_HI, "us").view("int64")
    li = _read(
        sf_dir, "lineitem",
        ["l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def partial(t: pa.Table) -> pa.Table:
        sd = _ts_us(t["l_shipdate"])
        disc_c = _cents(t["l_discount"])
        m = (
            (sd >= lo)
            & (sd < hi)
            & (disc_c >= FORECAST_DISC_LO_C)
            & (disc_c <= FORECAST_DISC_HI_C)
            & (t["l_quantity"].to_numpy(zero_copy_only=False) < FORECAST_QTY_LT)
        )
        rev4 = int((_cents(t["l_extendedprice"])[m] * disc_c[m]).sum())
        return pa.table({"rev4": pa.array([rev4], pa.int64())})

    total = sum(
        b["rev4"].to_numpy()[0]
        for b in li.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).iter_batches(batch_size=None, batch_format="pyarrow")
        if b.num_rows
    )
    return pd.DataFrame({"revenue": [total / 10_000.0]})


FORECAST_REVENUE_SQL = f"""
SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                * CAST(ROUND(l_discount * 100) AS BIGINT)) AS DOUBLE)
       / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{FORECAST_LO}'
  AND l_shipdate < TIMESTAMP '{FORECAST_HI}'
  AND CAST(ROUND(l_discount * 100) AS BIGINT)
      BETWEEN {FORECAST_DISC_LO_C} AND {FORECAST_DISC_HI_C}
  AND l_quantity < {FORECAST_QTY_LT}
"""


# ----------------------------------------------------------------- Q8


#: Q8 market: the region whose market is measured, the supplier nation
#: whose share is reported, the part type, and the order-date window.
MKT_REGION = "ASIA"
MKT_NATION = "NATION_2"
MKT_TYPE = "ECONOMY"
MKT_LO, MKT_HI = "1996-01-01", "1998-01-01"
_MKT_LO_YEAR = 1996


def _region_key(sf_dir: str, r_name: str) -> int:
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    return int(reg.loc[reg["r_name"] == r_name, "r_regionkey"].iloc[0])


def _nation_key(sf_dir: str, n_name: str) -> int:
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    return int(nat.loc[nat["n_name"] == n_name, "n_nationkey"].iloc[0])


def q_nation_market_share(sf_dir: str) -> pd.DataFrame:
    """Nation market share (TPC-H Q8 shape): for orders placed within
    [MKT_LO, MKT_HI) by customers in MKT_REGION, on parts of type
    MKT_TYPE, the fraction of revenue supplied by MKT_NATION per order
    year.

    Scale shape: the part-type restriction is the FIRST join (inner
    lookup join on partkey drops ~5/6 of the fact partials before the
    orders/customer/supplier attaches), the orders attach packs
    (custkey, year-offset) into one int64 so one join carries both, the
    nation/region dimension filters resolve to integer keys driver-side
    (25/5-row tables by schema design), and each block folds to ≤ 2
    rows (year × [nation_rev4, total_rev4]).  The share division is the
    same two-int-to-double IEEE expression as the oracle's."""
    lo = np.datetime64(MKT_LO, "us").view("int64")
    hi = np.datetime64(MKT_HI, "us").view("int64")
    rkey = _region_key(sf_dir, MKT_REGION)
    nkey = _nation_key(sf_dir, MKT_NATION)

    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )

    def li_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"pkey": pa.array([], pa.int64()),
                 "okey": pa.array([], pa.int64()),
                 "skey": pa.array([], pa.int64()),
                 "rev4": pa.array([], pa.int64())}
            )
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        rev4 = _cents(t["l_extendedprice"]) * (100 - _cents(t["l_discount"]))
        pk, ok, sk, rev4 = _sum_by_keys((pk, ok, sk), rev4)
        return pa.table(
            {"pkey": pa.array(pk, pa.int64()),
             "okey": pa.array(ok, pa.int64()),
             "skey": pa.array(sk, pa.int64()),
             "rev4": pa.array(rev4, pa.int64())}
        )

    partials = li.map_batches(
        li_partial, batch_format="pyarrow", zero_copy_batch=True
    )

    part = _read(sf_dir, "part", ["p_partkey", "p_type"])

    def type_parts(t: pa.Table) -> pa.Table:
        m = pc.equal(t["p_type"], MKT_TYPE)
        kept = t["p_partkey"].filter(m)
        return pa.table(
            {"p_partkey": kept,
             "one": pa.array(np.ones(len(kept), np.int64))}
        )

    typed = part.map_batches(type_parts, batch_format="pyarrow", zero_copy_batch=True)
    j0 = _lookup_join(
        partials, "pkey", typed, "p_partkey", "one", out_col="one",
        carry_cols=["okey", "skey", "rev4"],
    )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

    def windowed(t: pa.Table) -> pa.Table:
        od = _ts_us(t["o_orderdate"])
        m = (od >= lo) & (od < hi)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)[m].astype(np.int64)
        yoff = (
            od[m].astype("datetime64[us]").astype("datetime64[Y]").astype(np.int64)
            + 1970
            - _MKT_LO_YEAR
        )
        return pa.table(
            {"o_orderkey": t["o_orderkey"].filter(pa.array(m)),
             "packed": pa.array(ck * 4 + yoff, pa.int64())}
        )

    j1 = _lookup_join(
        j0, "okey", orders.map_batches(windowed, batch_format="pyarrow",
                                       zero_copy_batch=True),
        "o_orderkey", "packed", out_col="packed", carry_cols=["skey", "rev4"],
    )

    def unpack(df: pd.DataFrame) -> pd.DataFrame:
        packed = df["packed"].to_numpy(np.int64)
        return pd.DataFrame(
            {"ckey": packed // 4, "yoff": packed % 4,
             "skey": df["skey"].to_numpy(np.int64),
             "rev4": df["rev4"].to_numpy(np.int64)}
        )

    j1 = j1.map_batches(unpack, batch_format="pandas")
    customer = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
    j2 = _lookup_join(
        j1, "ckey", customer, "c_custkey", "c_nationkey", out_col="cnat",
        carry_cols=["skey", "rev4", "yoff"],
    )
    nation = _read(sf_dir, "nation", ["n_nationkey", "n_regionkey"])
    j3 = _lookup_join(
        j2, "cnat", nation, "n_nationkey", "n_regionkey", out_col="creg",
        carry_cols=["skey", "rev4", "yoff"],
    )
    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    j4 = _lookup_join(
        j3, "skey", supplier, "s_suppkey", "s_nationkey", out_col="snat",
        carry_cols=["rev4", "yoff", "creg"],
    )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        m = df["creg"].to_numpy() == rkey
        if not m.any():
            return pd.DataFrame(
                {"yoff": np.empty(0, np.int64), "num4": np.empty(0, np.int64),
                 "tot4": np.empty(0, np.int64)}
            )
        yoff = df["yoff"].to_numpy(np.int64)[m]
        rev4 = df["rev4"].to_numpy(np.int64)[m]
        nat = df["snat"].to_numpy()[m] == nkey
        y, tot = _sum_by_key(yoff, rev4)
        _, num = _sum_by_key(yoff, np.where(nat, rev4, 0))
        return pd.DataFrame({"yoff": y, "num4": num, "tot4": tot})

    parts = j4.map_batches(fold, batch_format="pandas").to_pandas()
    agg = parts.groupby("yoff", as_index=False, sort=True)[["num4", "tot4"]].sum()
    return pd.DataFrame(
        {
            "o_year": agg["yoff"].to_numpy(np.int64) + _MKT_LO_YEAR,
            "mkt_share": agg["num4"].to_numpy(np.float64)
            / agg["tot4"].to_numpy(np.float64),
        }
    )


NATION_MARKET_SHARE_SQL = f"""
WITH w AS (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
         * (100 - CAST(ROUND(l_discount * 100) AS BIGINT)) AS rev4,
         s_nationkey
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation cn ON c_nationkey = cn.n_nationkey
  JOIN region ON cn.n_regionkey = r_regionkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE p_type = '{MKT_TYPE}'
    AND r_name = '{MKT_REGION}'
    AND o_orderdate >= TIMESTAMP '{MKT_LO}'
    AND o_orderdate < TIMESTAMP '{MKT_HI}')
SELECT o_year,
       CAST(SUM(CASE WHEN n_name = '{MKT_NATION}' THEN rev4 ELSE 0 END)
            AS DOUBLE)
       / CAST(SUM(rev4) AS DOUBLE) AS mkt_share
FROM w
JOIN nation ON s_nationkey = n_nationkey
GROUP BY o_year
ORDER BY o_year
"""


# ----------------------------------------------------------------- Q9


def q_margin_by_nation_year(sf_dir: str) -> pd.DataFrame:
    """Product margin by supplier nation and ship year (TPC-H Q9
    shape).  The schema has no partsupp/supplycost, so the cost basis
    is the part's retail price: ``margin = SUM(l_extendedprice *
    (1 - l_discount) - p_retailprice * l_quantity)`` — negative where
    discounted sale prices undercut retail, exactly as the oracle
    computes it.

    Scale shape: lineitem compresses per batch to one row per distinct
    (partkey, suppkey, year) with exact rev4 / qty2 integer partial
    sums; the retail attach multiplies AFTER compression (retail
    depends only on partkey, so Σ(retail·qty) = retail·Σqty per group);
    supplier nation attaches by the same fused broadcast join chain;
    each block folds to ≤ 25 × #years rows."""
    li = _read(
        sf_dir, "lineitem",
        ["l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
         "l_discount", "l_shipdate"],
    )

    def li_partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"pkey": pa.array([], pa.int64()),
                 "skey": pa.array([], pa.int64()),
                 "yr": pa.array([], pa.int64()),
                 "rev4": pa.array([], pa.int64()),
                 "qty2": pa.array([], pa.int64())}
            )
        pk = t["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        yr = (
            _ts_us(t["l_shipdate"]).astype("datetime64[us]")
            .astype("datetime64[Y]").astype(np.int64) + 1970
        )
        rev4 = _cents(t["l_extendedprice"]) * (100 - _cents(t["l_discount"]))
        qty2 = _cents(t["l_quantity"])
        pk, sk, yr, rev4, qty2 = _sum_by_keys((pk, sk, yr), rev4, qty2)
        return pa.table(
            {"pkey": pa.array(pk, pa.int64()),
             "skey": pa.array(sk, pa.int64()),
             "yr": pa.array(yr, pa.int64()),
             "rev4": pa.array(rev4, pa.int64()),
             "qty2": pa.array(qty2, pa.int64())}
        )

    partials = li.map_batches(
        li_partial, batch_format="pyarrow", zero_copy_batch=True
    )
    part = _read(sf_dir, "part", ["p_partkey", "p_retailprice"])

    def retail_cents(t: pa.Table) -> pa.Table:
        return pa.table(
            {"p_partkey": t["p_partkey"],
             "retail_c": pa.array(_cents(t["p_retailprice"]), pa.int64())}
        )

    j0 = _lookup_join(
        partials, "pkey",
        part.map_batches(retail_cents, batch_format="pyarrow",
                         zero_copy_batch=True),
        "p_partkey", "retail_c", out_col="retail_c",
        carry_cols=["skey", "yr", "rev4", "qty2"],
    )
    supplier = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
    j1 = _lookup_join(
        j0, "skey", supplier, "s_suppkey", "s_nationkey", out_col="snat",
        carry_cols=["yr", "rev4", "qty2", "retail_c"],
    )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        margin4 = (
            df["rev4"].to_numpy(np.int64)
            - df["retail_c"].to_numpy(np.int64) * df["qty2"].to_numpy(np.int64)
        )
        keys = (df["snat"].to_numpy(np.int64), df["yr"].to_numpy(np.int64))
        nk, yk, m4 = _sum_by_keys(keys, margin4)
        return pd.DataFrame({"nk": nk, "yr": yk, "margin4": m4})

    parts = j1.map_batches(fold, batch_format="pandas").to_pandas()
    agg = parts.groupby(["nk", "yr"], as_index=False, sort=True)["margin4"].sum()
    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
    nkk = nat["n_nationkey"].to_numpy(np.int64)
    o = np.argsort(nkk)
    names = nat["n_name"].to_numpy()[o][
        np.searchsorted(nkk[o], agg["nk"].to_numpy(np.int64))
    ]
    return (
        pd.DataFrame(
            {
                "n_name": names,
                "o_year": agg["yr"].to_numpy(np.int64),
                "margin": agg["margin4"].to_numpy(np.int64) / 10_000.0,
            }
        )
        .sort_values(["n_name", "o_year"])
        .reset_index(drop=True)
    )


MARGIN_BY_NATION_YEAR_SQL = """
WITH w AS (
  SELECT s_nationkey,
         CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS o_year,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
         * (100 - CAST(ROUND(l_discount * 100) AS BIGINT))
         - CAST(ROUND(p_retailprice * 100) AS BIGINT)
           * CAST(ROUND(l_quantity * 100) AS BIGINT) AS margin4
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey)
SELECT n_name, o_year,
       CAST(SUM(margin4) AS DOUBLE) / 10000.0 AS margin
FROM w
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name, o_year
ORDER BY n_name, o_year
"""


# ---------------------------------------------------------------- Q16


#: Q16 exclusion predicates + size list (classic shape on this dim)
PARTCNT_EXCL_BRAND = "Brand#13"
PARTCNT_EXCL_TYPE = "PROMO"
PARTCNT_SIZES = (1, 9, 14, 19, 23, 36, 45, 49)


def q_supplier_count_by_part(sf_dir: str) -> pd.DataFrame:
    """Distinct-supplier counts by part attributes (TPC-H Q16 shape):
    for parts NOT of the excluded brand/type and with a size in the
    classic 8-value list, how many distinct suppliers ship each
    (brand, type, size) combination.

    Scale shape: lineitem pre-dedups (partkey, suppkey) per batch (the
    only columns read), the part dimension packs (brand#, type index,
    size) into ONE int64 so the inner attach both filters and carries
    every group attribute, and the distinct count is ONE bucketed
    exchange keyed on the packed attribute — local pair dedup bounds
    shuffle volume at distinct pairs per block, and each bucket group
    holds whole packed-key groups so the global dedup + count is
    final.  The driver receives ≤ |brand|×|type|×|size| count rows and
    decodes the packed attributes back to strings."""
    # the type dictionary is a bounded dimension attribute: fold the
    # ≤ handful of distinct strings per block, union driver-side
    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"])
    type_parts = part.map_batches(
        lambda t: pa.table({"p_type": t["p_type"].unique()}),
        batch_format="pyarrow", zero_copy_batch=True,
    ).to_pandas()
    types = sorted(type_parts["p_type"].unique())
    type_idx = {s: i for i, s in enumerate(types)}
    sizes = np.array(sorted(PARTCNT_SIZES), dtype=np.int64)

    def packed_parts(t: pa.Table) -> pa.Table:
        brand = t["p_brand"].to_pandas().to_numpy()
        ptype = t["p_type"].to_pandas().to_numpy()
        size = t["p_size"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (
            (brand != PARTCNT_EXCL_BRAND)
            & (ptype != PARTCNT_EXCL_TYPE)
            & np.isin(size, sizes)
        )
        brand_num = np.array(
            [int(b.rsplit("#", 1)[1]) for b in brand[keep]], dtype=np.int64
        )
        tix = np.array([type_idx[s] for s in ptype[keep]], dtype=np.int64)
        packed = brand_num * 100_000 + tix * 1_000 + size[keep]
        return pa.table(
            {"p_partkey": t["p_partkey"].filter(pa.array(keep)),
             "packed": pa.array(packed, pa.int64())}
        )

    packed_dim = part.map_batches(
        packed_parts, batch_format="pyarrow", zero_copy_batch=True
    )

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def pair_dedup(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"pkey": df["l_partkey"].to_numpy(np.int64),
             "skey": df["l_suppkey"].to_numpy(np.int64)}
        ).drop_duplicates()

    pairs = li.map_batches(pair_dedup, batch_format="pandas")
    attached = _lookup_join(
        pairs, "pkey", packed_dim, "p_partkey", "packed", out_col="packed",
        carry_cols=["skey"],
    )

    # ONE bucketed exchange keyed on packed: local pair dedup bounds the
    # shuffle, the bucket group sees whole packed groups → global dedup
    # then count is exact (the bucketed_groupby combine contract can't
    # express dedup-then-count, so the two phases are explicit here)
    def local(df: pd.DataFrame) -> pd.DataFrame:
        return add_bucket_column(
            df[["packed", "skey"]].drop_duplicates(), ["packed"], 64
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop(columns=[BUCKET_COL]).drop_duplicates()
        return d.groupby("packed", as_index=False, sort=False).agg(
            supplier_cnt=("skey", "size")
        )

    counts = (
        attached.map_batches(local, batch_format="pandas")
        .groupby(BUCKET_COL)
        .map_groups(final, batch_format="pandas")
        .to_pandas()
    )
    packed = counts["packed"].to_numpy(np.int64)
    return (
        pd.DataFrame(
            {
                "p_brand": [f"Brand#{v}" for v in packed // 100_000],
                "p_type": [types[v] for v in (packed // 1_000) % 100],
                "p_size": packed % 1_000,
                "supplier_cnt": counts["supplier_cnt"].to_numpy(np.int64),
            }
        )
        .sort_values(
            ["supplier_cnt", "p_brand", "p_type", "p_size"],
            ascending=[False, True, True, True],
        )
        .reset_index(drop=True)
    )


SUPPLIER_COUNT_BY_PART_SQL = f"""
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_brand <> '{PARTCNT_EXCL_BRAND}'
  AND p_type <> '{PARTCNT_EXCL_TYPE}'
  AND p_size IN ({', '.join(str(s) for s in PARTCNT_SIZES)})
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""


REL4_QUERIES: dict[str, Callable[[str], object]] = {
    "forecast_revenue": q_forecast_revenue,
    "nation_market_share": q_nation_market_share,
    "margin_by_nation_year": q_margin_by_nation_year,
    "supplier_count_by_part": q_supplier_count_by_part,
}

REL4_ORACLES: dict[str, str] = {
    "forecast_revenue": FORECAST_REVENUE_SQL,
    "nation_market_share": NATION_MARKET_SHARE_SQL,
    "margin_by_nation_year": MARGIN_BY_NATION_YEAR_SQL,
    "supplier_count_by_part": SUPPLIER_COUNT_BY_PART_SQL,
}
