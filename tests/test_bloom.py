"""Bloom-filter build/probe properties and the exactness of the
bloom_semijoin (prefilter + verify ≡ plain semi-join), incl.
partitioning invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from neo4j_webgraph_ray.stages.bloom import (
    DEFAULT_N_BITS,
    DEFAULT_N_HASHES,
    bloom_build,
    bloom_contains,
    bloom_semijoin,
)


def _ds(df: pd.DataFrame, parallelism: int = 4) -> ray.data.Dataset:
    return ray.data.from_pandas(df).repartition(parallelism)


def test_no_false_negatives():
    """Every inserted key tests positive — the load-bearing property
    (a false negative would silently drop a matching fact row)."""
    rng = np.random.default_rng(42)
    keys = rng.integers(-(1 << 62), 1 << 62, size=5000, dtype=np.int64)
    dim = _ds(pd.DataFrame({"k": keys}))
    words = bloom_build(dim, "k", n_bits=1 << 16, n_hashes=4)
    assert bloom_contains(words, keys, 1 << 16, 4).all()


def test_false_positive_rate_reasonable():
    rng = np.random.default_rng(7)
    present = rng.integers(0, 1 << 40, size=10_000, dtype=np.int64)
    absent = rng.integers(-(1 << 40), 0, size=50_000, dtype=np.int64)
    words = bloom_build(
        _ds(pd.DataFrame({"k": present})), "k",
        n_bits=DEFAULT_N_BITS, n_hashes=DEFAULT_N_HASHES,
    )
    fp = bloom_contains(words, absent, DEFAULT_N_BITS, DEFAULT_N_HASHES).mean()
    # modeled fp at n=1e4, m=2^23, h=4 is ~2e-12; allow generous slack
    assert fp < 1e-3


def test_build_is_partitioning_invariant():
    keys = np.arange(1000, dtype=np.int64) * 7919
    df = pd.DataFrame({"k": keys})
    w1 = bloom_build(_ds(df, 1), "k", n_bits=1 << 14, n_hashes=3)
    w8 = bloom_build(_ds(df, 8), "k", n_bits=1 << 14, n_hashes=3)
    assert (w1 == w8).all()


@pytest.mark.parametrize("parallelism", [1, 6])
def test_semijoin_exact(parallelism):
    """bloom_semijoin ≡ the plain semi-join, including rows whose keys
    collide into the filter as false positives (tiny n_bits forces
    them) — the verify stage must remove every one."""
    rng = np.random.default_rng(3)
    dim_keys = rng.choice(10_000, size=300, replace=False).astype(np.int64)
    fact = pd.DataFrame(
        {
            "user": rng.integers(0, 10_000, size=20_000).astype(np.int64),
            "v": rng.normal(size=20_000),
        }
    )
    want = fact[np.isin(fact["user"].to_numpy(), dim_keys)]
    got = bloom_semijoin(
        _ds(fact, parallelism), "user",
        _ds(pd.DataFrame({"k": dim_keys}), parallelism), "k",
        n_bits=1 << 10, n_hashes=2, num_buckets=4,  # fp-heavy on purpose
    ).to_pandas()
    assert len(got) == len(want)
    a = got.sort_values(["user", "v"]).reset_index(drop=True)
    b = want.sort_values(["user", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[["user", "v"]], b[["user", "v"]])


def test_semijoin_empty_dim():
    fact = pd.DataFrame({"user": np.arange(100, dtype=np.int64)})
    dim = pd.DataFrame({"k": np.empty(0, np.int64)})
    got = bloom_semijoin(
        _ds(fact), "user", ray.data.from_pandas(dim), "k", num_buckets=2
    )
    assert got.count() == 0


def test_bloom_semijoin_query_oracle(sf_smoke):
    """Driver-entry parity at sf0.001 against the IN-subquery SQL."""
    import duckdb

    from neo4j_webgraph_ray.queries import BLOOM_SEMIJOIN_SQL, q_bloom_semijoin

    got = (
        q_bloom_semijoin(sf_smoke).to_pandas()
        .sort_values("user_id").reset_index(drop=True)
    )
    con = duckdb.connect()
    for t in ("events", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_smoke}/{t}.parquet'"
        )
    want = con.sql(BLOOM_SEMIJOIN_SQL).df()
    assert len(got) == len(want) > 0  # non-vacuous at sf0.001
    assert got["user_id"].tolist() == want["user_id"].tolist()
    assert got["n_events"].astype("int64").tolist() == want[
        "n_events"
    ].astype("int64").tolist()
