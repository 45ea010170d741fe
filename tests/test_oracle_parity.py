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


def test_random_walks_cogroup_path_matches_broadcast():
    """The above-gate co-group walk resolution (broadcast_limit=0)
    must produce exactly the broadcast path's walks."""
    import pandas as pd

    from neo4j_webgraph_ray.queries import q_random_walks

    bc = q_random_walks(SF_SMOKE)
    cg = q_random_walks(SF_SMOKE, broadcast_limit=0)
    pd.testing.assert_frame_equal(
        bc.sort_values(["walk_id", "step", "vkey"]).reset_index(drop=True),
        cg.sort_values(["walk_id", "step", "vkey"]).reset_index(drop=True),
    )
    # walks traverse the full length on the symmetrized view
    from neo4j_webgraph_ray.queries import WALK_STEPS

    assert set(bc["step"]) == set(range(WALK_STEPS + 1))


def test_shipping_priority_cogroup_path_matches_broadcast():
    """The Q3-shaped pipeline's two size-gated joins (string segment
    AND datetime order-date lookup values) must produce identical
    top-N rows on the bucketed co-group path (broadcast_limit=0)."""
    import pandas as pd

    from neo4j_webgraph_ray.queries import q_shipping_priority

    bc = q_shipping_priority(SF_SMOKE)
    cg = q_shipping_priority(SF_SMOKE, broadcast_limit=0)
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


def test_lookup_join_broadcast_large_ids_with_misses():
    """The broadcast lookup must keep int64 values above 2^53 exact
    even when some keys MISS (a pandas .map(dict) with any miss
    materializes a float64 intermediate that rounds hash-range ids —
    the corruption mechanism found in the round-3 review)."""
    import numpy as np
    import pandas as pd
    import ray.data

    from neo4j_webgraph_ray.queries import _lookup_join

    big = 2**60
    ds = ray.data.from_pandas(pd.DataFrame({
        "k": np.array([1, 2, 3], dtype=np.int64),  # 3 misses the lookup
        "payload": np.array([10, 20, 30], dtype=np.int64),
    }))
    lookup = ray.data.from_pandas(pd.DataFrame({
        "id": np.array([1, 2], dtype=np.int64),
        "val": np.array([big + 1, big + 3], dtype=np.int64),
    }))
    out = _lookup_join(
        ds, "k", lookup, "id", "val", "v", carry_cols=["payload"]
    ).to_pandas().sort_values("payload").reset_index(drop=True)
    assert list(out["payload"]) == [10, 20]  # inner join drops the miss
    assert list(out["v"]) == [big + 1, big + 3]  # bit-exact
    assert out["v"].dtype == np.int64


def test_neardup_clusters_oracle_and_singletons(sf_smoke):
    """Cluster reps: every doc appears once, pairs collapse to the min
    doc_id, singletons self-represent, dtype stays int64 end to end."""
    import numpy as np

    from neo4j_webgraph_ray.queries_docs import q_neardup_clusters

    out = q_neardup_clusters(sf_smoke)
    assert out["doc_id"].is_unique
    assert out["cluster"].dtype == np.int64
    assert (out["cluster"] <= out["doc_id"]).all()  # rep = min id
    # each referenced cluster rep is its own rep (closure reached)
    reps = dict(zip(out["doc_id"], out["cluster"]))
    assert all(reps[c] == c for c in set(out["cluster"]))


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


def test_lookup_join_keep_key_cogroup_matches_broadcast():
    """keep_key through BOTH join paths (the tfidf join carries the
    token key in its output; broadcast_limit=0 forces the co-group
    path the small oracle corpus never reaches)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data

    from neo4j_webgraph_ray.queries import _lookup_join

    rng = np.random.default_rng(2)
    data = ray.data.from_arrow(
        pa.table(
            {
                "tok": pa.array([f"t{i % 37}" for i in range(500)]),
                "doc_id": pa.array(np.arange(500, dtype=np.int64)),
                "tf": pa.array(rng.integers(1, 9, 500).astype(np.int64)),
            }
        )
    )
    lookup = ray.data.from_arrow(
        pa.table(
            {
                "tok": pa.array([f"t{i}" for i in range(37)]),
                "df": pa.array(np.arange(1, 38, dtype=np.int64)),
            }
        )
    )

    def run(limit):
        out = _lookup_join(
            data, "tok", lookup, "tok", "df", "df",
            carry_cols=["doc_id", "tf"], keep_key=True,
            broadcast_limit=limit, num_buckets=4,
        ).to_pandas()
        return out.sort_values("doc_id").reset_index(drop=True)[
            ["doc_id", "tf", "df", "tok"]
        ]

    pd.testing.assert_frame_equal(run(500_000), run(0))

    import pytest

    with pytest.raises(ValueError, match="carry_cols"):
        _lookup_join(data, "tok", lookup, "tok", "df", "df",
                     carry_cols=["tok", "doc_id"])


def test_lookup_join_empty_lookup_keeps_value_dtype():
    """ADVICE r4: with an EMPTY lookup + keep_unmatched, the sentinel
    column's dtype must come from the collected lookup values (object),
    never be inferred from the int sentinel; an unrepresentable
    sentinel must raise instead of silently coercing."""
    import numpy as np
    import pandas as pd
    import pytest
    import ray.data

    from neo4j_webgraph_ray.queries import UNMATCHED_SENTINEL, _lookup_join

    ds = ray.data.from_pandas(pd.DataFrame({
        "k": np.array([1, 2], dtype=np.int64),
        "payload": np.array([10, 20], dtype=np.int64),
    }))
    empty = ray.data.from_pandas(pd.DataFrame({
        "id": np.array([], dtype=np.int64),
        "val": pd.array([], dtype=object),
    }))
    out = _lookup_join(
        ds, "k", empty, "id", "val", "v", carry_cols=["payload"],
        keep_unmatched=True,
    ).to_pandas().sort_values("payload").reset_index(drop=True)
    assert out["v"].dtype == object  # lookup dtype, not int64 inference
    assert list(out["v"]) == [UNMATCHED_SENTINEL, UNMATCHED_SENTINEL]

    # a sentinel the value dtype can't represent fails LOUDLY
    narrow = (np.array([1], dtype=np.int64), np.array([5], dtype=np.int8))
    with pytest.raises(ValueError, match="not representable"):
        _lookup_join(
            ds, "k", empty, "id", "val", "v", carry_cols=["payload"],
            keep_unmatched=True, prebuilt_arrays=narrow,
        ).to_pandas()


def test_graph_cache_invalidated_on_input_rewrite(tmp_path):
    """VERDICT r4 #7: graph() keys its cache on the input signature —
    a regenerated events.parquet at the SAME path must yield fresh
    tables, not the cached ones."""
    import os

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neo4j_webgraph_ray.queries import graph

    d = str(tmp_path)

    def write(n_users):
        ids = np.arange(n_users * 2, dtype=np.int64)
        t = pa.table({
            "event_id": pa.array(ids),
            "ts": pa.array(ids * 1000, type=pa.timestamp("us")),
            "user_id": pa.array(ids % n_users),
            "event_type": pa.array(
                ["click" if i % 2 else "view" for i in ids]
            ),
            "value": pa.array(np.zeros(len(ids))),
            "props": pa.array([f"k={i}" for i in ids]),
        })
        pq.write_table(t, os.path.join(d, "events.parquet"))

    write(3)
    _, v1 = graph(d)
    n1 = v1.count()
    assert graph(d)[1] is v1  # unchanged input => cache hit
    write(7)
    # force a distinct mtime_ns even on coarse filesystems
    os.utime(os.path.join(d, "events.parquet"), ns=(1, 10**15))
    _, v2 = graph(d)
    assert v2 is not v1
    assert v2.count() != n1


def _events_dir(tmp_path, rows):
    """rows: (event_id, ts_us, user_id, event_type)"""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pa.table({
        "event_id": pa.array(np.array([r[0] for r in rows], dtype=np.int64)),
        "ts": pa.array(
            np.array([r[1] for r in rows], dtype=np.int64),
        ).cast(pa.timestamp("us")),
        "user_id": pa.array(np.array([r[2] for r in rows], dtype=np.int64)),
        "event_type": pa.array([r[3] for r in rows]),
        "value": pa.array(np.zeros(len(rows))),
        "props": pa.array([f"k={r[0]}" for r in rows]),
    })
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(t, str(d / "events.parquet"))
    return str(d)


def _vs_duckdb(sf_dir, engine_df, sql):
    import duckdb

    from tests.util import assert_result_equal

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    assert_result_equal(engine_df, con.sql(sql).df(), name="crafted")


def test_user_sessions_gap_semantics(tmp_path):
    """Sessionization edge cases: an EXACT 30-min gap does not split
    (strict >), one microsecond beyond does, tie timestamps stay in one
    session, users never merge — engine vs DuckDB on crafted data."""
    from neo4j_webgraph_ray.queries import USER_SESSIONS_SQL, q_user_sessions

    M = 60_000_000  # one minute in us
    rows = [
        (1, 0 * M, 1, "view"),
        (2, 30 * M, 1, "view"),        # exactly 30 min after -> same session
        (3, 60 * M + 1, 1, "view"),    # 30 min + 1 us -> NEW session
        (4, 60 * M + 1, 1, "click"),   # tie ts -> same session
        (5, 0 * M, 2, "view"),         # other user: own session numbering
        (6, 200 * M, 2, "view"),
    ]
    sf = _events_dir(tmp_path, rows)
    got = q_user_sessions(sf).to_pandas()
    # sanity before the hash compare: u1 = [2 events, 2 events], u2 = [1, 1]
    by = got.sort_values(["user_id", "session_idx"])
    assert list(by["n_events"]) == [2, 2, 1, 1]
    _vs_duckdb(sf, got, USER_SESSIONS_SQL)


def test_purchase_asof_click_semantics(tmp_path):
    """As-of join edge cases: same-ts click counts (<=), later clicks
    don't, purchases with no prior click drop (inner), users isolated —
    engine vs DuckDB on crafted data."""
    from neo4j_webgraph_ray.queries import (
        PURCHASE_ASOF_CLICK_SQL,
        q_purchase_asof_click,
    )

    rows = [
        (1, 100, 1, "click"),
        (2, 200, 1, "click"),
        (3, 200, 1, "purchase"),   # ties with click 2 -> click_ts = 200
        (4, 150, 1, "purchase"),   # between clicks -> click_ts = 100
        (5, 50, 2, "purchase"),    # user 2 has no prior click -> dropped
        (6, 500, 2, "click"),
        (7, 600, 2, "purchase"),   # -> 500; must not see user 1's clicks
        (8, 700, 3, "view"),       # irrelevant type
    ]
    sf = _events_dir(tmp_path, rows)
    import numpy as np

    got = q_purchase_asof_click(sf).to_pandas()
    lut = dict(zip(got["purchase_event_id"], got["click_ts"].astype(np.int64)))
    assert set(lut) == {3, 4, 7}
    assert lut[3] == 200 and lut[4] == 100 and lut[7] == 500
    _vs_duckdb(sf, got, PURCHASE_ASOF_CLICK_SQL)


def test_error_context_range_semantics(tmp_path):
    """Range-join edge cases: a context event at EXACTLY error_ts - W
    is included (>=), one tied with the error is excluded (strict <),
    the error never pairs with itself, other errors DO count as
    context, errors with no context drop (inner), users isolated."""
    import numpy as np

    from neo4j_webgraph_ray.queries import (
        ERROR_CONTEXT_MINUTES,
        ERROR_CONTEXT_SQL,
        q_error_context,
    )

    W = ERROR_CONTEXT_MINUTES * 60_000_000  # window in us
    rows = [
        (1, 0, 1, "view"),          # exactly error_ts - W for e3 -> IN
        (2, W, 1, "click"),         # ties with error e3 -> OUT
        (3, W, 1, "error"),         # ctx = {e1, e5}
        (5, W - 10, 1, "error"),    # ctx of e3 AND itself an error probe
        (4, W + 1, 1, "view"),      # after e3 -> OUT
        (6, 0, 2, "purchase"),      # outside user-2 error's window
        (7, 2 * W, 2, "error"),     # no context -> dropped entirely
    ]
    sf = _events_dir(tmp_path, rows)
    got = q_error_context(sf).to_pandas()
    pairs = set(zip(got["error_event_id"], got["ctx_event_id"]))
    assert pairs == {(3, 1), (3, 5), (5, 1)}
    _vs_duckdb(sf, got, ERROR_CONTEXT_SQL)


def test_rolling_activity_window_semantics(tmp_path):
    """Sliding-window edge cases: the event itself counts, an event at
    EXACTLY ts - 60min counts (closed lower bound), one microsecond
    older doesn't, timestamp peers count each other (RANGE semantics),
    users isolated."""
    import numpy as np

    from neo4j_webgraph_ray.queries import (
        ROLLING_USER_ACTIVITY_SQL,
        q_rolling_user_activity,
    )

    H = 3_600_000_000  # 60 min in us
    rows = [
        (1, 0, 1, "view"),       # window [-H, 0]: {e1} -> 1
        (2, H, 1, "view"),       # window [0, H]: {e1, e2} -> 2
        (3, H + 1, 1, "view"),   # window [1, H+1]: {e2, e3, e4} -> 3
        (4, H + 1, 1, "click"),  # peer of e3 -> also 3
        (5, H, 2, "view"),       # other user -> 1
    ]
    sf = _events_dir(tmp_path, rows)
    got = q_rolling_user_activity(sf).to_pandas()
    lut = dict(zip(got["event_id"], got["n_last_hour"]))
    assert lut == {1: 1, 2: 2, 3: 3, 4: 3, 5: 1}
    _vs_duckdb(sf, got, ROLLING_USER_ACTIVITY_SQL)


def test_conversion_funnel_order_semantics(tmp_path):
    """Funnel edge cases: stages must be in STRICTLY increasing ts
    order (ties don't advance), a purchase before the click doesn't
    count, a click before the first view doesn't, users isolated."""
    import numpy as np

    from neo4j_webgraph_ray.queries import (
        CONVERSION_FUNNEL_SQL,
        q_conversion_funnel,
    )

    rows = [
        (1, 100, 1, "view"), (2, 200, 1, "click"), (3, 300, 1, "purchase"),
        # u2: purchase BEFORE its click -> reaches click only
        (4, 100, 2, "view"), (5, 50, 2, "purchase"), (6, 200, 2, "click"),
        (7, 150, 2, "purchase"),
        # u3: click before first view -> view stage only
        (8, 100, 3, "click"), (9, 200, 3, "view"),
        # u4: click TIES the view -> strict > -> view stage only
        (10, 100, 4, "view"), (11, 100, 4, "click"),
        # u5: purchase ties the click -> no purchase stage
        (12, 100, 5, "view"), (13, 150, 5, "click"), (14, 150, 5, "purchase"),
    ]
    sf = _events_dir(tmp_path, rows)
    got = q_conversion_funnel(sf)
    lut = dict(zip(got["stage"], got["n_users"]))
    assert lut == {"view": 5, "click": 3, "purchase": 1}
    _vs_duckdb(sf, got, CONVERSION_FUNNEL_SQL)


def test_token_quantiles_interpolation(tmp_path):
    """Grouped exact-quantile edge cases: linear interpolation between
    histogram values (p25 of [1,2,3,10] = 1.75, p90 = 7.9), a
    single-doc group returns its value for every quantile, groups
    isolated — engine vs DuckDB on crafted documents."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from neo4j_webgraph_ray.queries_docs import (
        TOKEN_QUANTILES_SQL,
        q_token_quantiles_by_lang,
    )

    def doc(k):  # text with exactly k whitespace tokens
        return " ".join(["w"] * k)

    t = pa.table({
        "doc_id": pa.array(np.arange(5, dtype=np.int64)),
        "text": pa.array([doc(1), doc(2), doc(3), doc(10), doc(5)]),
        "lang": pa.array(["aa", "aa", "aa", "aa", "bb"]),
        "source": pa.array(["s"] * 5),
        "n_chars": pa.array(np.zeros(5, dtype=np.int64)),
    })
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(t, str(d / "documents.parquet"))

    got = q_token_quantiles_by_lang(str(d))
    lut = {r.lang: (r.p25, r.p50, r.p90) for r in got.itertuples()}
    assert lut["aa"] == (1.75, 2.5, 7.9)
    assert lut["bb"] == (5.0, 5.0, 5.0)

    import duckdb

    from tests.util import assert_result_equal

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'"
    )
    assert_result_equal(got, con.sql(TOKEN_QUANTILES_SQL).df(), name="tq")


def _write_docs(tmp_path, texts, ids=None):
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = len(texts)
    ids = np.arange(n, dtype=np.int64) if ids is None else np.asarray(ids)
    t = pa.table({
        "doc_id": pa.array(ids),
        "text": pa.array(list(texts)),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["s"] * n),
        "n_chars": pa.array(np.zeros(n, dtype=np.int64)),
    })
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


def test_pack_sequences_boundaries(tmp_path):
    """Greedy contiguous packing semantics on crafted token counts
    (capacity 10): a doc is assigned the bin its FIRST token lands in,
    so a doc straddling a boundary stays in the earlier bin and the
    next doc starts past it.  Forced multi-bucket so the distributed
    prefix-scan (per-bucket totals -> driver exclusive prefix ->
    broadcast offsets) is exercised, not the single-bucket fast case."""
    import duckdb

    from neo4j_webgraph_ray.queries_docs import PACK_SQL, q_pack_sequences
    from tests.util import assert_result_equal

    # token counts: 4, 4, 4 (straddles 10 at cum 8..12 -> bin 0), 7, 1
    counts = [4, 4, 4, 7, 1]
    d = _write_docs(tmp_path, [" ".join(["w"] * k) for k in counts])
    got = q_pack_sequences(d, capacity=10, nbuckets=3).to_pandas()
    lut = dict(zip(got["doc_id"], got["bin"]))
    # cum_before: 0, 4, 8, 12, 19 -> bins 0, 0, 0, 1, 1
    assert lut == {0: 0, 1: 0, 2: 0, 3: 1, 4: 1}

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{d}/documents.parquet'")
    oracle = con.sql(PACK_SQL.replace("/ 2048", "/ 10")).df()
    assert_result_equal(got, oracle, name="pack")


def test_pack_sequences_sparse_ids_multibucket(tmp_path):
    """Sparse / unordered doc_ids across forced range buckets: the
    driver prefix must skip empty buckets and the per-bucket cumsum
    must follow doc_id order, not file order."""
    import numpy as np

    from neo4j_webgraph_ray.queries_docs import q_pack_sequences

    ids = np.array([90, 5, 40, 7, 88], dtype=np.int64)
    counts = [3, 5, 6, 2, 4]  # by file order above
    d = _write_docs(tmp_path, [" ".join(["w"] * k) for k in counts], ids=ids)
    got = q_pack_sequences(d, capacity=8, nbuckets=4).to_pandas()
    lut = dict(zip(got["doc_id"], got["bin"]))
    # doc_id order: 5(n=5), 7(n=2), 40(n=6), 88(n=4), 90(n=3)
    # cum_before:   0,      5,      7,       13,      17
    assert lut == {5: 0, 7: 0, 40: 0, 88: 1, 90: 2}


def test_benchmark_contamination_semantics(tmp_path):
    """A training doc sharing one exact word 4-gram with a benchmark
    doc (doc_id % 20 == 0) is flagged; reordered or 3-token overlaps
    are not; benchmark docs are excluded from the output."""
    from neo4j_webgraph_ray.queries_docs import q_benchmark_contamination

    bench = "alpha beta gamma delta epsilon"
    texts = [
        bench,                                   # id 0 -> benchmark
        "x alpha beta gamma delta y",            # id 1 -> shares 4-gram
        "beta alpha gamma delta epsilon zeta",   # id 2 -> reordered, no 4-gram
        "alpha beta gamma q delta epsilon",      # id 3 -> only 3-gram runs
        "totally unrelated text here now",       # id 4 -> clean
    ]
    d = _write_docs(tmp_path, texts)
    got = q_benchmark_contamination(d).to_pandas()
    lut = dict(zip(got["doc_id"], got["contaminated"]))
    assert 0 not in lut
    assert lut == {1: True, 2: False, 3: False, 4: False}


def test_repetition_metrics_semantics(tmp_path):
    """Crafted repetition: 'a b a b a b' has top bigram ('a b') 3 of 5
    bigrams and every trigram duplicated (4 occurrences of 2 distinct
    trigrams, each appearing twice -> dup fraction 1.0); an
    all-distinct doc scores (1/n_bigrams, 0.0); a 2-token doc (no
    trigram) is dropped."""
    import numpy as np

    from neo4j_webgraph_ray.queries_docs import q_repetition_metrics

    d = _write_docs(tmp_path, ["a b a b a b", "p q r s t", "u v"])
    got = q_repetition_metrics(d).to_pandas().set_index("doc_id")
    assert set(got.index) == {0, 1}
    assert np.isclose(got.loc[0, "top_bigram_frac"], 0.6)
    assert np.isclose(got.loc[0, "dup_trigram_frac"], 1.0)
    assert np.isclose(got.loc[1, "top_bigram_frac"], 0.25)
    assert got.loc[1, "dup_trigram_frac"] == 0.0


def test_revenue_by_nation_cogroup_path_matches_broadcast(monkeypatch):
    """The star join's two size-gated lookup joins on the co-group path
    (broadcast_limit=0: orders and customer both shuffle-joined) must
    produce exactly the broadcast path's frame — the at-scale
    configuration where orders is 10^9 rows and never collects."""
    import functools

    import pandas as pd

    import neo4j_webgraph_ray.queries as Q

    bc = Q.q_revenue_by_nation(SF_SMOKE)
    monkeypatch.setattr(
        Q, "_lookup_join", functools.partial(Q._lookup_join, broadcast_limit=0)
    )
    cg = Q.q_revenue_by_nation(SF_SMOKE)
    pd.testing.assert_frame_equal(bc, cg)
    assert len(bc) == 25  # every nation reached through the FK chain


def test_revenue_by_nation_exact_arithmetic(tmp_path):
    """Crafted 2-dp prices/discounts: revenue must be the exact decimal
    value (int64 path), not a float-accumulation approximation, and
    multi-lineitem orders must aggregate through the per-batch
    combiner."""
    import numpy as np
    import pandas as pd
    import ray.data

    import neo4j_webgraph_ray.queries as Q

    sf = tmp_path / "sf"
    sf.mkdir()
    pd.DataFrame(
        {
            "l_orderkey": [1, 1, 2, 3],
            "l_extendedprice": [10.01, 0.03, 99.99, 5.00],
            "l_discount": [0.05, 0.00, 0.10, 0.07],
        }
    ).to_parquet(sf / "lineitem.parquet")
    pd.DataFrame(
        {"o_orderkey": [1, 2, 3], "o_custkey": [7, 8, 7]}
    ).to_parquet(sf / "orders.parquet")
    pd.DataFrame(
        {"c_custkey": [7, 8], "c_nationkey": [0, 1]}
    ).to_parquet(sf / "customer.parquet")
    pd.DataFrame(
        {"n_nationkey": [0, 1], "n_name": ["ALPHA", "BETA"]}
    ).to_parquet(sf / "nation.parquet")

    got = Q.q_revenue_by_nation(str(sf)).set_index("n_name")
    # ALPHA: order 1 (10.01*0.95 + 0.03*1.00) + order 3 (5.00*0.93)
    #      = 9.5095 + 0.03 + 4.65 = 14.1895 exactly
    assert got.loc["ALPHA", "revenue"] == 14.1895
    assert got.loc["ALPHA", "n_items"] == 3
    # BETA: 99.99 * 0.90 = 89.991 exactly
    assert got.loc["BETA", "revenue"] == 89.991
    assert got.loc["BETA", "n_items"] == 1
