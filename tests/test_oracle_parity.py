"""Driver-style oracle parity: every queries() entry with an oracle_sql()
entry must match DuckDB on the same parquet tables (order-insensitive)."""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

import __ray_entry__ as entrymod
from tests.conftest import SF_SMOKE
from tests.util import assert_result_equal

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_every_oracle_has_query():
    missing = set(ORACLES) - set(QUERIES)
    assert not missing, f"oracles without queries: {missing}"


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_parity(name):
    con = _con(SF_SMOKE)
    oracle = con.sql(ORACLES[name]).df()
    mine = QUERIES[name](SF_SMOKE)
    assert_result_equal(mine, oracle, name=name)


def test_entry_smoke():
    res = entrymod.entry()
    from tests.util import to_pandas

    df = to_pandas(res)
    assert len(df) >= 0
    assert list(df.columns)


def test_cross_kind_cogroup_path_matches_broadcast():
    """The size-gated distributed semi-join (broadcast_limit=0) must
    produce exactly the broadcast path's rows."""
    import pandas as pd

    from neo4j_webgraph_ray.queries import q_cross_kind_pattern

    bc = q_cross_kind_pattern(SF_SMOKE)
    cg = q_cross_kind_pattern(SF_SMOKE, broadcast_limit=0)
    pd.testing.assert_frame_equal(
        bc.reset_index(drop=True), cg.reset_index(drop=True)
    )
    assert len(bc) > 0


def test_dense_rank_vkeys_exact():
    """Distributed dense rank == lexicographic position, contiguous
    from 0, regardless of bucket boundaries (forced tiny buckets)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from neo4j_webgraph_ray.queries import dense_rank_vkeys

    rng = np.random.default_rng(3)
    keys = [f"k{int(x):06d}" for x in rng.permutation(500)]
    vertices = ray.data.from_pandas(pd.DataFrame({
        "id": np.arange(500, dtype=np.int64) + 2**60,
        "kind": ["conv"] * 500,
        "key": keys,
    }))
    out = dense_rank_vkeys(vertices, num_buckets=7).to_pandas()
    out = out.sort_values("vkey").reset_index(drop=True)
    assert list(out["rank"]) == list(range(500))
    assert list(out["vkey"]) == sorted("conv:" + k for k in keys)
    # id fidelity above 2^53
    byid = dict(zip(out["vkey"], out["id"]))
    assert byid["conv:" + keys[0]] == 2**60


def test_attach_vkeys_large_ids_and_unmatched():
    """The distributed vkey join must keep int64 ids above 2^53 exact
    (typed columns, no nulls) and emit unmatched vertices with the
    typed sentinel."""
    import numpy as np
    import pandas as pd
    import ray.data

    from neo4j_webgraph_ray.queries import UNMATCHED_SENTINEL, attach_vkeys

    big = 2**61
    state = ray.data.from_pandas(pd.DataFrame({
        "id": np.array([big + 1, big + 2], dtype=np.int64),
        "label": np.array([big + 7, big + 9], dtype=np.int64),
    }))
    vertices = ray.data.from_pandas(pd.DataFrame({
        "id": np.array([big + 1, big + 2, big + 3], dtype=np.int64),
        "kind": ["conv", "tool", "role"],
        "key": ["a", "b", "c"],
    }))
    out = attach_vkeys(
        state, vertices, ["label"], keep_unmatched_vertices=True
    ).to_pandas().sort_values("vkey").reset_index(drop=True)
    assert list(out["vkey"]) == ["conv:a", "role:c", "tool:b"]
    got = dict(zip(out["vkey"], out["label"]))
    assert got["conv:a"] == big + 7 and got["tool:b"] == big + 9  # bit-exact
    assert got["role:c"] == UNMATCHED_SENTINEL
