"""Count-min sketch guarantees: never underestimates, the e/w·N bound,
exact linear mergeability (partition-invariant sketches — the property
that distinguishes CMS from the Misra–Gries summary), and the driver
entry's parity against exact counts."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
import ray.data

from neo4j_webgraph_ray.stages.sketches import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_build,
    cms_estimate,
    cms_hash_tokens,
    cms_partial,
    cms_positions,
)


def _zipf_stream(n_keys=2000, n=100_000, seed=11):
    rng = np.random.default_rng(seed)
    keys = rng.zipf(1.3, size=n).astype(np.int64) % n_keys
    return keys


def test_never_underestimates_and_bound():
    keys = _zipf_stream()
    uniq, true = np.unique(keys, return_counts=True)
    h = cms_hash_tokens(uniq.astype(str))
    sk = cms_partial(h, true.astype(np.int64), CMS_DEPTH, CMS_WIDTH)
    est = cms_estimate(sk, h)
    assert (est >= true).all()
    # e/w·N bound holds per key w.p. 1 - e^-d; with d=4 over 2000 keys
    # expect ~2% violations of the PER-ROW bound but the MIN estimate
    # violating e/w·N for many keys would signal a broken hash
    n_total = len(keys)
    bound = np.e / CMS_WIDTH * n_total
    frac_over = ((est - true) > bound).mean()
    assert frac_over < 0.05


def test_linearity_exact_merge():
    """sketch(A + B) == sketch(A) + sketch(B) elementwise — the linear
    property that makes per-block partials exact."""
    keys = _zipf_stream(n=20_000, seed=3)
    h = cms_hash_tokens(keys.astype(str))
    ones = np.ones(len(h), np.int64)
    whole = cms_partial(h, ones, CMS_DEPTH, CMS_WIDTH)
    half = len(h) // 2
    a = cms_partial(h[:half], ones[:half], CMS_DEPTH, CMS_WIDTH)
    b = cms_partial(h[half:], ones[half:], CMS_DEPTH, CMS_WIDTH)
    assert (whole == a + b).all()


def test_build_partition_invariant():
    df = pd.DataFrame({"k": _zipf_stream(n=30_000, seed=5).astype(str)})

    def keys_of_batch(t):
        items, counts = np.unique(
            t["k"].to_numpy(zero_copy_only=False), return_counts=True
        )
        return cms_hash_tokens(items), counts.astype(np.int64)

    sketches = [
        cms_build(
            ray.data.from_pandas(df).repartition(p), keys_of_batch,
            depth=3, width=1024,
        )
        for p in (1, 7)
    ]
    assert (sketches[0] == sketches[1]).all()


def test_positions_deterministic_and_spread():
    keys = cms_hash_tokens(np.array([f"tok{i}" for i in range(500)], object))
    p1 = cms_positions(keys, CMS_DEPTH, CMS_WIDTH)
    p2 = cms_positions(keys, CMS_DEPTH, CMS_WIDTH)
    assert (p1 == p2).all()
    # rows use different hash mixes: identical row-position vectors
    # would mean the depth dimension adds nothing
    assert not (p1[:, 0] == p1[:, 1]).all()


def test_cms_query_vs_exact(sf_smoke):
    """Driver entry: every stopword-probe estimate >= its exact corpus
    count, within the e/w·N overestimate budget."""
    import duckdb

    from neo4j_webgraph_ray.queries_docs import q_cms_token_counts

    from neo4j_webgraph_ray.queries_docs import CMS_PROBE_TOKENS

    got = q_cms_token_counts(sf_smoke)
    assert (got["est_count"] >= 0).all()
    assert len(got) == len(CMS_PROBE_TOKENS)
    # non-vacuous: the generator-vocabulary probes must actually occur
    assert (got["est_count"] > 0).sum() >= 5
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf_smoke}/documents.parquet'"
    )
    # same tokenization SQL as the TOP_TOKENS oracle (engine tokenizer
    # = ws_token_lists = split on runs of whitespace, drop empties)
    exact = con.sql(r"""
        WITH toks AS (
          SELECT unnest(list_filter(string_split_regex(trim(text), '\s+'),
                        x -> x <> '')) AS tok
          FROM documents
        )
        SELECT tok, count(*) AS n FROM toks GROUP BY tok
    """).df().set_index("tok")["n"]
    n_total = int(exact.sum())
    from neo4j_webgraph_ray.stages.sketches import CMS_WIDTH as W

    bound = np.e / W * n_total
    for tok, est in zip(got["token"], got["est_count"]):
        true = int(exact.get(tok, 0))
        assert est >= true, (tok, est, true)
        assert est <= true + max(bound, 1) * 3, (tok, est, true, bound)


# ---------------------------------------------------------------------------
# Min-wise bottom-k sample + sample-quantile sketch
# ---------------------------------------------------------------------------


def test_splitmix_sql_mirror_bit_identical():
    """The DuckDB HUGEINT splitmix64 (the oracle mirror) matches the
    engine _mix64 BIT FOR BIT — the contract both bottom-k oracles
    stand on."""
    import duckdb

    from neo4j_webgraph_ray.pipelines.neighborhood import _mix64
    from neo4j_webgraph_ray.stages.sketches import splitmix64_cte

    rng = np.random.default_rng(7)
    ids = np.concatenate(
        [
            rng.integers(-(2**63), 2**63, size=500, dtype=np.int64),
            np.array([0, 1, -1, 2**63 - 1, -(2**63)], np.int64),
        ]
    )
    eng = _mix64(ids)
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(int(i),) for i in ids])
    sql = f"WITH {splitmix64_cte('t', 'x', 'x')} SELECT x, skey FROM mixd"
    got = {r[0]: int(r[1]) for r in con.sql(sql).fetchall()}
    assert all(got[int(i)] == int(e) for i, e in zip(ids, eng))


def test_bottomk_partition_invariant_and_exact_size():
    """bottom-k is one fixed set: identical ids across any partitioning
    (mergeability of min-wise samples), exact size k, no duplicates."""
    from neo4j_webgraph_ray.stages.sketches import bottomk_sample

    df = pd.DataFrame(
        {"event_id": np.arange(5000, dtype=np.int64), "value": np.arange(5000.0)}
    )
    picks = []
    for p in (1, 9):
        out = bottomk_sample(
            ray.data.from_pandas(df).repartition(p), "event_id", 200
        ).to_pandas()
        assert len(out) == 200
        assert out["event_id"].is_unique
        picks.append(np.sort(out["event_id"].to_numpy()))
    assert (picks[0] == picks[1]).all()
    # min-wise: the picked keys ARE the global minimum keys
    from neo4j_webgraph_ray.pipelines.neighborhood import _mix64

    allk = _mix64(df["event_id"].to_numpy(np.int64))
    expect = df["event_id"].to_numpy()[np.argsort(allk)[:200]]
    assert (picks[0] == np.sort(expect)).all()


def test_quantile_sketch_dkw_bound(sf_smoke):
    """Sampled quantiles sit within the DKW rank-error window of the
    exact full-data quantiles: |F(est) - p| <= sqrt(ln(2/d)/2k) with
    d=0.001 — the guarantee the sketch trades exactness for."""
    import pyarrow.parquet as pq

    from neo4j_webgraph_ray.queries import (
        QSKETCH_K,
        QSKETCH_PS,
        q_value_quantile_sketch,
    )

    got = q_value_quantile_sketch(sf_smoke)
    vals = np.sort(
        pq.read_table(f"{sf_smoke}/events.parquet", columns=["value"])[
            "value"
        ].to_numpy(zero_copy_only=False)
    )
    n = len(vals)
    k = int(got["sample_n"].iloc[0])
    assert k == min(n, QSKETCH_K)
    eps = np.sqrt(np.log(2 / 0.001) / (2 * k))
    for p in QSKETCH_PS:
        est = float(got[f"p{int(p * 100):02d}"].iloc[0])
        rank = np.searchsorted(vals, est, side="right") / n
        assert abs(rank - p) <= eps + 1.0 / n, (p, est, rank, eps)


def test_weighted_sample_props():
    """A-ES: exact size k, no duplicates, zero-weight rows never drawn,
    partition-invariant, and inclusion tracks weight (the top-weight
    decile is over-represented vs the bottom decile)."""
    from neo4j_webgraph_ray.stages.sketches import aes_weighted_sample

    n = 20_000
    w = np.concatenate([np.full(n // 2, 0.1), np.full(n // 2, 10.0)])
    w[:100] = 0.0  # never drawn
    df = pd.DataFrame({"event_id": np.arange(n, dtype=np.int64), "value": w})
    picks = []
    for p in (1, 8):
        out = aes_weighted_sample(
            ray.data.from_pandas(df).repartition(p), "event_id", "value", 1000
        ).to_pandas()
        assert len(out) == 1000 and out["event_id"].is_unique
        assert (out["value"] > 0).all()
        picks.append(np.sort(out["event_id"].to_numpy()))
    assert (picks[0] == picks[1]).all()
    heavy = (picks[0] >= n // 2).mean()
    assert heavy > 0.9  # 100x weight ratio -> heavy half dominates
