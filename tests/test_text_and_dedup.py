"""Text-analysis functions + dedup family vs brute-force oracles."""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from neo4j_webgraph_ray.functions.text import (
    doc_fingerprint,
    fingerprint_batch,
    lang_id,
    quality_metrics,
    word_token_count,
    ws_token_count,
)
from neo4j_webgraph_ray.stages.dedup import (
    _shingle_hashes,
    exact_text_dedup,
    minhash_neardup_pairs,
    simhash64,
    simhash_neardup_pairs,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog again and again today"),
    (1, "the quick brown fox jumps over the lazy dog again and again today"),  # exact dup of 0
    (2, "the quick brown fox jumps over the lazy cat again and again today"),  # near dup of 0
    (3, "completely different content about database engines and shuffles"),
    (4, "unrelated text mentioning gardens flowers and bees everywhere"),
    (5, "completely different content about database engines and sharding"),  # near dup of 3
]


def docs_ds():
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([d[0] for d in DOCS], type=pa.int64()),
                "text": pa.array([d[1] for d in DOCS]),
            }
        )
    )


def brute_jaccard(a: str, b: str, k=3, char=False) -> float:
    sa = set(np.unique(_shingle_hashes(a, k, char)))
    sb = set(np.unique(_shingle_hashes(b, k, char)))
    if not sa and not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def test_batch_signatures_match_scalar():
    """The batch-vectorized shingle/minhash/simhash paths (the hot
    stages at 10^9 docs) are value-identical to the scalar reference
    implementations, including unicode, empty, short and padded docs."""
    from neo4j_webgraph_ray.stages.dedup import (
        _minhash_params,
        batch_shingle_hashes,
        minhash_from_flat,
        minhash_signature,
        simhash_batch,
    )

    texts = [
        "hello world foo bar baz", "", "ab", "one two",
        "  spaced   out  text ", "héllo wörld ünïcode tokens here",
        "a b c d e f g h i j", "hello world foo bar baz", "x",
        "tab\tsep\nnewline mix", "short", "",
        "日本語 テキスト の トークン", "repeat repeat repeat repeat",
    ]
    a, b = _minhash_params(64)
    for k in (2, 3, 5):
        for char in (False, True):
            flat, offs = batch_shingle_hashes(texts, k, char)
            sig = minhash_from_flat(flat, offs, a, b)
            for i, t in enumerate(texts):
                ref = _shingle_hashes(t, k, char)
                assert np.array_equal(ref, flat[offs[i] : offs[i + 1]])
                assert np.array_equal(minhash_signature(ref, a, b), sig[i])
    sh = simhash_batch(texts)
    for i, t in enumerate(texts):
        assert simhash64(t) == sh[i]


def test_segment_jaccard_matches_intersect1d():
    from neo4j_webgraph_ray.stages.dedup import (
        _segment_jaccard,
        _unique_per_segment,
    )

    rng = np.random.default_rng(0)
    docs = [
        np.sort(
            rng.choice(50, size=rng.integers(0, 30), replace=False)
        ).astype(np.uint64)
        for _ in range(20)
    ]
    flat = np.concatenate(docs)
    offs = np.concatenate([[0], np.cumsum([len(d) for d in docs])])
    uflat, uofs = _unique_per_segment(flat, offs)
    assert np.array_equal(uflat, flat) and np.array_equal(uofs, offs)
    ai = rng.integers(0, 20, size=50)
    bi = rng.integers(0, 20, size=50)

    def gather(idx):
        lens = np.array([len(docs[i]) for i in idx], np.int64)
        vals = (
            np.concatenate([docs[i] for i in idx])
            if lens.sum()
            else np.empty(0, np.uint64)
        )
        return vals, np.repeat(np.arange(len(idx)), lens), lens

    va, ga, la = gather(ai)
    vb, gb, lb = gather(bi)
    jac = _segment_jaccard(
        np.concatenate([va, vb]), np.concatenate([ga, gb]), la + lb, 50
    )
    from neo4j_webgraph_ray.stages.dedup import _sorted_pair_jaccard

    jac2 = _sorted_pair_jaccard(va, ga, la, vb, gb, lb, 50)
    for i in range(50):
        sa, sb = docs[ai[i]], docs[bi[i]]
        inter = len(np.intersect1d(sa, sb, assume_unique=True))
        union = len(sa) + len(sb) - inter
        ref = inter / union if union else 0.0
        assert jac[i] == ref
        assert jac2[i] == ref  # sorted-merge fast path, identical values


def test_token_counts_match_python():
    texts = pa.array(["a b  c", "  x ", "one,two three!", ""])
    assert list(ws_token_count(texts)) == [3, 1, 2, 1]  # split on \s+ after trim
    assert list(word_token_count(texts)) == [3, 1, 3, 0]


def test_quality_metrics():
    t = pa.table({"doc_id": pa.array([1], pa.int64()),
                  "text": pa.array(["the cat, and the dog sat."])})
    q = quality_metrics(t).to_pandas().iloc[0]
    assert q["n_ws_tokens"] == 6
    assert q["n_punct"] == 2  # ',' and '.'
    assert q["n_stop_en"] == 3  # the, and, the
    assert q["stop_ratio"] == 3 / 6


def test_lang_id_heuristic():
    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "the cat and the dog of to is",
                    "der hund und die katze ist",
                    "el gato y los perros que es",
                    "zzz qqq www",
                ]
            ),
        }
    )
    out = lang_id(t).to_pandas()
    assert list(out["lang_pred"]) == ["en", "de", "es", "unknown"]


def test_fingerprint_properties():
    a = "the quick brown fox jumps over the lazy dog"
    assert doc_fingerprint(a) == doc_fingerprint(a)
    assert doc_fingerprint(a) != doc_fingerprint("some other text entirely different")
    t = pa.table({"doc_id": pa.array([0, 1], pa.int64()), "text": pa.array([a, a])})
    fps = fingerprint_batch(t).to_pandas()
    assert fps["fingerprint"].iloc[0] == fps["fingerprint"].iloc[1]


def test_fingerprint_batch_matches_scalar():
    """VERDICT r3 #2: the batch path must be bit-identical to the
    per-doc scalar oracle — sweep covering empty, shorter-than-k (the
    Horner branch), exactly-k, long, repeated-token and unicode docs,
    mixed in one batch so the segment offsets are exercised."""
    import numpy as np

    rng = np.random.default_rng(3)
    vocab = ["alpha", "beta", "gamma", "δelta", "x", "tool:search", "42"]
    texts = ["", " ", "one", "one two", "a b c", "a a a a a"]
    texts += [
        " ".join(rng.choice(vocab, size=int(m)))
        for m in rng.integers(1, 40, size=60)
    ]
    texts.append(None)
    t = pa.table(
        {"doc_id": pa.array(range(len(texts)), pa.int64()),
         "text": pa.array(texts, pa.string())}
    )
    for k in (2, 3, 5):
        got = fingerprint_batch(t, k=k).to_pandas()["fingerprint"].to_numpy()
        want = np.array(
            [doc_fingerprint(x or "", k=k) for x in texts], dtype=np.uint64
        ).view(np.int64)
        assert (got == want).all(), f"k={k}"


def test_exact_text_dedup():
    out = exact_text_dedup(docs_ds(), num_buckets=4).to_pandas()
    assert sorted(out["doc_id"]) == [0, 2, 3, 4, 5]  # doc 1 deduped into 0


def test_minhash_neardup_matches_brute_force():
    tau = 0.5
    expected = sorted(
        (a, b)
        for (a, ta), (b, tb) in itertools.combinations(DOCS, 2)
        if brute_jaccard(ta, tb) >= tau
    )
    got = minhash_neardup_pairs(docs_ds(), tau=tau).to_pandas()
    got_pairs = sorted(zip(got["a"], got["b"]))
    assert got_pairs == expected
    # jaccard values are the exact brute-force values
    for _, row in got.iterrows():
        assert row["jaccard"] == pytest.approx(
            brute_jaccard(DOCS[int(row["a"])][1], DOCS[int(row["b"])][1])
        )


def test_minhash_carry_shingles_paths_identical():
    """The carried-shingle (single tokenize pass) and re-shingling
    verify paths must emit identical pairs and jaccards — the auto
    gate switches between them on corpus size, so they must never
    diverge."""
    a = minhash_neardup_pairs(docs_ds(), tau=0.5, carry_shingles=True).to_pandas()
    b = minhash_neardup_pairs(docs_ds(), tau=0.5, carry_shingles=False).to_pandas()
    key = ["a", "b", "jaccard"]
    pd.testing.assert_frame_equal(
        a[key].sort_values(["a", "b"]).reset_index(drop=True),
        b[key].sort_values(["a", "b"]).reset_index(drop=True),
    )


def test_char_ngram_jaccard_variant():
    tau = 0.6
    expected = sorted(
        (a, b)
        for (a, ta), (b, tb) in itertools.combinations(DOCS, 2)
        if brute_jaccard(ta, tb, k=3, char=True) >= tau
    )
    got = minhash_neardup_pairs(docs_ds(), tau=tau, char=True).to_pandas()
    assert sorted(zip(got["a"], got["b"])) == expected


def test_simhash_neardup():
    # identical docs -> hamming 0; near dups -> small hamming
    assert simhash64(DOCS[0][1]) == simhash64(DOCS[1][1])
    got = simhash_neardup_pairs(docs_ds(), max_hamming=6).to_pandas()
    pairs = set(zip(got["a"], got["b"]))
    assert (0, 1) in pairs  # exact dup always caught
    # verify against brute-force hamming
    sigs = {i: simhash64(t) for i, t in DOCS}
    brute = {
        (a, b)
        for a, b in itertools.combinations(sorted(sigs), 2)
        if bin(sigs[a] ^ sigs[b]).count("1") <= 6
    }
    # band blocking guarantees recall for hamming<=3; for <=6 it is a
    # candidate filter — every returned pair must be a true pair
    assert pairs <= brute
    assert {(a, b) for a, b in brute if bin(sigs[a] ^ sigs[b]).count("1") <= 3} <= pairs


def test_minhash_neardup_cogroup_path_matches_broadcast():
    """Force the co-group verify fallback (broadcast_limit=0) — same
    pairs and identical exact-Jaccard values as the broadcast path."""
    tau = 0.5
    via_broadcast = minhash_neardup_pairs(docs_ds(), tau=tau).to_pandas()
    via_cogroup = minhash_neardup_pairs(
        docs_ds(), tau=tau, verify_broadcast_limit=0
    ).to_pandas()
    a = via_broadcast.sort_values(["a", "b"]).reset_index(drop=True)
    b = via_cogroup.sort_values(["a", "b"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert len(a) > 0


def test_cogroup_verify_large_ids_exact():
    """Doc ids above 2^53 must survive the co-group path bit-exactly
    (nullable int64 -> float64 round-trips corrupt hash-range ids —
    the id columns are kept non-null with a marker instead)."""
    base = 2**60
    ids = [base + 1, base + 2, base + 3, base + 4]
    t = pa.table(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "text": pa.array([
                DOCS[0][1], DOCS[0][1],  # exact dups
                DOCS[2][1], DOCS[3][1],
            ]),
        }
    )
    ds = ray.data.from_arrow(t)
    got = minhash_neardup_pairs(ds, tau=0.5, verify_broadcast_limit=0).to_pandas()
    pairs = set(zip(got["a"], got["b"]))
    assert (base + 1, base + 2) in pairs
    for a, b in pairs:
        assert a in ids and b in ids  # bit-exact ids, no float rounding


def test_cogroup_verify_duplicated_pairs_no_false_positive():
    """A duplicated candidate pair must not pair a doc's shingles with
    themselves (false Jaccard 1.0): sides are tagged explicitly."""
    from neo4j_webgraph_ray.stages.dedup import verify_jaccard

    # docs 3 and 4 are clearly below tau=0.5
    pairs = ray.data.from_arrow(
        pa.table({"a": pa.array([3, 3], pa.int64()), "b": pa.array([4, 4], pa.int64())})
    )
    out = verify_jaccard(pairs, docs_ds(), tau=0.5, broadcast_limit=0).to_pandas()
    assert len(out) == 0
    # and a genuinely similar duplicated pair still verifies once per row-group
    pairs2 = ray.data.from_arrow(
        pa.table({"a": pa.array([0, 0], pa.int64()), "b": pa.array([1, 1], pa.int64())})
    )
    out2 = verify_jaccard(pairs2, docs_ds(), tau=0.5, broadcast_limit=0).to_pandas()
    assert set(zip(out2["a"], out2["b"])) == {(0, 1)}
    assert (out2["jaccard"] == 1.0).all()


def test_role_adjacency_gap_semantics():
    """A turn_idx gap asserts NO adjacency — both derivation paths and
    the SQL oracle agree on delta-1 semantics."""
    import pandas as pd

    from neo4j_webgraph_ray.stages.derive import derive_edges

    df = pd.DataFrame(
        {
            "conv_id": ["g", "g", "g"],
            "turn_idx": pd.array([0, 2, 3], dtype="int32"),  # gap: no turn 1
            "role": ["user", "assistant", "tool"],
            "text": ["a", "b", "c"],
            "tool": [None, None, None],
            "ts": pd.Timestamp("2025-01-01"),
        }
    )
    out = derive_edges(ray.data.from_pandas(df), num_buckets=4).to_pandas()
    got = set(zip(out["src_key"], out["dst_key"]))
    assert got == {("assistant", "tool")}  # only the contiguous 2->3 pair


def test_minhash_vs_bruteforce_on_testdata(sf_smoke):
    """On the 500-doc testdata: exact-verify gives 100% precision; LSH
    recall must be complete for clearly-similar pairs (the rows-only
    driver check can't see quality — this brute-force oracle does)."""
    import itertools as it

    import duckdb

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_smoke}/documents.parquet'"
    ).df()
    texts = dict(zip(docs["doc_id"], docs["text"]))
    tau = 0.5
    sh = {d: set(np.unique(_shingle_hashes(t, 3, False))) for d, t in texts.items()}

    def jac(a, b):
        u = len(sh[a] | sh[b])
        return len(sh[a] & sh[b]) / u if u else 0.0

    brute = {
        (a, b): jac(a, b)
        for a, b in it.combinations(sorted(texts), 2)
        if jac(a, b) >= tau
    }
    got = minhash_neardup_pairs(docs_ds_from(docs), tau=tau).to_pandas()
    got_pairs = set(zip(got["a"], got["b"]))
    assert got_pairs <= set(brute)  # precision 1.0 (exact verify)
    strong = {p for p, j in brute.items() if j >= 0.7}
    assert strong <= got_pairs  # full recall on clear duplicates
    for _, row in got.iterrows():
        assert row["jaccard"] == pytest.approx(brute[(row["a"], row["b"])])


def docs_ds_from(df):
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array(df["doc_id"].to_numpy(), type=pa.int64()),
            "text": pa.array(df["text"].astype(str)),
        }
    )
    return ray.data.from_arrow(t)


def test_lsh_banding_recall_at_tau_boundary():
    """VERDICT r3 #7: measure 16-band LSH recall ON the tau boundary.

    The driver oracle's completeness argument rests on "every true pair
    on this corpus sits far above tau, where banding recall is ~1" —
    this test quantifies both halves.  MinHash theory: a pair at
    Jaccard J shares a band with prob J^r (r = num_perm/bands = 4), so
    16-band recall is 1-(1-J^4)^16 — ≈0.64 at J=0.50, ≈0.79 at J=0.55,
    ≈0.997 at J=0.80 and ≈1-3e-11 at J=0.90.  Measured here on ~200
    generated boundary pairs: empirical recall must match the model
    within sampling noise at the boundary, and clear duplicates
    (J >= 0.9, where all the testdata's true pairs live) must recall
    completely."""
    from neo4j_webgraph_ray.stages.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    rng = np.random.default_rng(17)
    vocab = np.array([f"w{i}" for i in range(5000)])
    texts: list[str] = []
    target_pairs: list[tuple[int, int, float]] = []  # (a, b, true J)

    def add_pair(c: int, u: int):
        """Two docs sharing a c-token prefix with u unique suffix tokens
        each — token windows give a controlled shingle Jaccard."""
        common = list(rng.choice(vocab, size=c))
        a_txt = " ".join(common + list(rng.choice(vocab, size=u)))
        b_txt = " ".join(common + list(rng.choice(vocab, size=u)))
        ia, ib = len(texts), len(texts) + 1
        texts.extend([a_txt, b_txt])
        target_pairs.append((ia, ib, brute_jaccard(a_txt, b_txt)))

    for _ in range(150):
        # shingle Jaccard ≈ (c-4)/(c+2u): solve u for a target J drawn
        # across the boundary band, then keep the MEASURED J
        c = int(rng.integers(40, 80))
        jt = float(rng.uniform(0.42, 0.62))
        u = max(1, round(((c - 4) / jt - c) / 2))
        add_pair(c=c, u=u)
    for _ in range(60):  # the clear-duplicate regime (J >= 0.9)
        add_pair(c=int(rng.integers(80, 160)), u=int(rng.integers(0, 3)))

    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                "text": pa.array(texts),
            }
        )
    )
    sigs = minhash_signatures(ds, num_perm=64, shingle_k=3)
    cand = lsh_candidate_pairs(sigs, bands=16, num_buckets=16).to_pandas()
    got = set(zip(cand["a"], cand["b"]))

    boundary = [(a, b, j) for a, b, j in target_pairs if 0.45 <= j <= 0.60]
    clear = [(a, b, j) for a, b, j in target_pairs if j >= 0.90]
    assert len(boundary) >= 60, f"fixture drift: {len(boundary)} boundary pairs"
    assert len(clear) >= 40

    hits = sum((a, b) in got for a, b, _ in boundary)
    emp = hits / len(boundary)
    model = float(np.mean([1 - (1 - j**4) ** 16 for _, _, j in boundary]))
    # binomial noise at n~100 is ~0.05 sigma; 0.15 is a 3-sigma band
    assert abs(emp - model) <= 0.15, f"boundary recall {emp:.3f} vs model {model:.3f}"

    clear_hits = sum((a, b) in got for a, b, _ in clear)
    assert clear_hits == len(clear), "clear duplicates (J>=0.9) must fully recall"


def _max_minlabel_eccentricity(pairs: pd.DataFrame) -> int:
    """Max BFS distance from each component's min-id member — the
    number of min-label propagation steps an unrolled oracle needs."""
    import collections

    adj: dict[int, set] = collections.defaultdict(set)
    for a, b in zip(pairs["a"], pairs["b"]):
        adj[int(a)].add(int(b))
        adj[int(b)].add(int(a))
    seen: set = set()
    max_ecc = 0
    for v in sorted(adj):
        if v in seen:
            continue
        comp = {v}
        stack = [v]
        while stack:
            x = stack.pop()
            for y in adj[x]:
                if y not in comp:
                    comp.add(y)
                    stack.append(y)
        seen |= comp
        root = min(comp)  # the min-label every member must reach
        dist = {root: 0}
        q = collections.deque([root])
        while q:
            x = q.popleft()
            for y in adj[x]:
                if y not in dist:
                    dist[y] = dist[x] + 1
                    q.append(y)
        max_ecc = max(max_ecc, max(dist.values()))
    return max_ecc


def test_neardup_cluster_diameter_within_oracle_unroll(sf_correct):
    """ADVICE r3: the *_clusters DuckDB oracles unroll 8 min-label
    propagation steps; the engine computes the full CC fixpoint.  The
    parity check is only sound while every cluster's min-label
    eccentricity is within the unroll depth — asserted here for BOTH
    pair graphs (document shingle Jaccard and embedding cosine) on the
    driver's correctness corpus, so a future testdata change fails
    THIS test instead of producing a spurious driver mismatch."""
    import duckdb

    from neo4j_webgraph_ray.queries_docs import (
        _NEARDUP_CLUSTERS_UNROLL,
        NEARDUP_TAU,
    )
    from neo4j_webgraph_ray.stages.similarity import embedding_neardup_pairs

    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf_correct}/documents.parquet'"
    ).df()
    doc_pairs = minhash_neardup_pairs(docs_ds_from(docs), tau=0.5).to_pandas()
    ecc_docs = _max_minlabel_eccentricity(doc_pairs)

    emb = ray.data.read_parquet(f"{sf_correct}/embeddings.parquet")
    emb_pairs = embedding_neardup_pairs(emb, tau=NEARDUP_TAU)
    ecc_emb = _max_minlabel_eccentricity(emb_pairs)

    for name, ecc in (("documents", ecc_docs), ("embeddings", ecc_emb)):
        assert ecc <= _NEARDUP_CLUSTERS_UNROLL, (
            f"{name} cluster min-label eccentricity {ecc} exceeds the "
            f"oracle's {_NEARDUP_CLUSTERS_UNROLL}-step unroll — regenerate"
        )


def test_tfidf_null_text_is_zero_tokens(tmp_path):
    """ADVICE r4: a null text row must behave as zero tokens (matching
    the DuckDB oracle and q_top_tokens' list_flatten null-skipping),
    not crash np.repeat via NaN-widened lengths."""
    import pyarrow.parquet as pq

    from neo4j_webgraph_ray.queries_docs import q_tfidf_top_terms

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                "text": pa.array(["alpha beta beta", None, "alpha gamma"]),
            }
        ),
        str(d / "documents.parquet"),
    )
    out = q_tfidf_top_terms(str(d))
    # the null doc contributes no rows; the others rank normally
    assert set(out["doc_id"]) == {0, 2}
    top0 = out[out["doc_id"] == 0].sort_values("score", ascending=False)
    assert top0.iloc[0]["tok"] == "beta"  # tf=2, df=1


def test_redact_text_crafted_pii(tmp_path):
    """The synthetic corpus contains no emails/long numbers, so the
    driver oracle only exercises the deny-list pattern; this test
    drives the full payload on crafted rows AND cross-checks the
    engine against the same DuckDB SQL on the crafted table."""
    import duckdb
    import pyarrow.parquet as pq

    from neo4j_webgraph_ray.queries_docs import REDACT_SQL, q_redact_text
    from tests.util import assert_result_equal

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
                "text": pa.array(
                    [
                        "mail me at jo.doe+x@exa-mple.org or a@b.io thanks",
                        "acct 123456789 pin 42 customer secret code",
                        None,
                        "no pii here",
                    ]
                ),
            }
        ),
        str(d / "documents.parquet"),
    )
    out = q_redact_text(str(d)).to_pandas()
    r0 = out[out["doc_id"] == 0].iloc[0]
    assert r0["n_email"] == 2 and "<EMAIL>" in r0["clean_text"]
    assert "@" not in r0["clean_text"]
    r1 = out[out["doc_id"] == 1].iloc[0]
    assert r1["n_num"] == 1 and r1["n_term"] == 2
    assert r1["clean_text"] == "acct <NUM> pin 42 <TERM> <TERM> code"
    assert out[out["doc_id"] == 2]["clean_text"].isna().all()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{d / 'documents.parquet'}'"
    )
    assert_result_equal(out, con.sql(REDACT_SQL).df(), name="redact_crafted")


def test_quality_budget_invariants(sf_smoke):
    """quality_budget: the selected set is exactly the global
    score-descending prefix whose cumulative tokens fit the budget —
    verified against a single-machine reference — and is invariant to
    the range-bucket count (ties share a bucket by construction, so
    bucket boundaries cannot cut the prefix)."""
    import numpy as np
    import pyarrow.parquet as pq

    from neo4j_webgraph_ray.functions.text import quality_metrics
    from neo4j_webgraph_ray.queries_docs import QBUDGET_FRAC, q_quality_budget

    t = pq.read_table(
        f"{sf_smoke}/documents.parquet", columns=["doc_id", "text"]
    )
    q = quality_metrics(t)
    ids = q["doc_id"].to_numpy()
    s = q["stop_ratio"].to_numpy()
    n = q["n_word_tokens"].to_numpy()
    budget = int(np.floor(n.sum() * QBUDGET_FRAC))
    order = np.lexsort((ids, -s))
    cum = np.cumsum(n[order])
    ref = np.sort(ids[order[cum <= budget]])

    got = q_quality_budget(sf_smoke, nbuckets=11).to_pandas()
    assert np.array_equal(np.sort(got["doc_id"].to_numpy()), ref)
    assert 0 < len(got) < len(ids)  # non-vacuous selection
    assert int(got["n_word_tokens"].sum()) <= budget

    alt = q_quality_budget(sf_smoke, nbuckets=3).to_pandas()
    assert np.array_equal(np.sort(alt["doc_id"].to_numpy()), ref)


def test_source_report_invariants(sf_smoke):
    """source_report: partial-merge result is partitioning-invariant
    and non-vacuous (the quality gate discriminates within sources)."""
    import numpy as np
    import ray.data

    from neo4j_webgraph_ray.queries_docs import q_source_report

    got = q_source_report(sf_smoke)
    assert (got["n_docs"] > 0).all()
    assert (got["n_quality_pass"] <= got["n_docs"]).all()
    assert (got["n_quality_pass"] < got["n_docs"]).any()  # gate bites
    assert int(got["n_quality_pass"].sum()) > 0  # and passes something

    # partitioning invariance: the (source, sr_sum)-ordered float merge
    # makes the result exactly equal under a different block count
    alt = q_source_report(sf_smoke, num_blocks=7)
    import pandas as pd

    pd.testing.assert_frame_equal(
        alt.reset_index(drop=True), got.reset_index(drop=True)
    )


def test_null_text_zero_tokens_everywhere(tmp_path):
    """Code-review r5: ws_token_count / word counts on a NULL text row
    must yield ZERO, not NaN->INT64_MIN — the silent-corruption class
    that would poison token_quantiles' histogram, pack_sequences'
    prefix sum, and train_split's totals."""
    import numpy as np
    import pyarrow.parquet as pq

    from neo4j_webgraph_ray.functions.text import (
        quality_metrics,
        ws_token_count,
    )
    from neo4j_webgraph_ray.queries_docs import (
        q_pack_sequences,
        q_train_split,
    )

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "text": pa.array(["alpha beta", None, "gamma", "d e f g"]),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["s0"] * 4),
            "n_chars": pa.array([10, 0, 5, 7], type=pa.int64()),
        }
    )
    n = ws_token_count(t["text"]).astype(np.int64)
    assert n.tolist() == [2, 0, 1, 4]
    q = quality_metrics(t)
    assert q["n_ws_tokens"].to_pylist() == [2, 0, 1, 4]
    assert q["n_chars"].to_pylist()[1] == 0

    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    packed = q_pack_sequences(str(d), capacity=4).to_pandas()
    packed = packed.sort_values("doc_id")
    # cumulative word-token prefix: 0,2,2,3 -> bins 0,0,0,0 at cap 4;
    # the null doc contributes zero, nothing goes negative
    assert (packed["bin"] >= 0).all()
    assert len(packed) == 4
    split = q_train_split(str(d))
    assert int(split["total_tokens"].sum()) == 7  # 2+0+1+4


def test_mixture_sample_weights_and_determinism(sf_smoke):
    """mixture_sample: per-source keep rates track the weight rule
    (0.75 even-suffix / 0.25 odd), the sample is deterministic, and
    repartitioning cannot change it (pure per-row hash decision)."""
    import numpy as np

    from neo4j_webgraph_ray.queries_docs import q_mixture_sample

    a = q_mixture_sample(sf_smoke).to_pandas().sort_values("doc_id")
    b = q_mixture_sample(sf_smoke).to_pandas().sort_values("doc_id")
    assert np.array_equal(a["doc_id"].to_numpy(), b["doc_id"].to_numpy())
    assert 0 < len(a)
    even = a["source"].str[-1].astype(int) % 2 == 0
    # both weight classes present and ordered correctly in aggregate
    n_even_kept = int(even.sum())
    n_odd_kept = int((~even).sum())
    assert n_even_kept > n_odd_kept > 0


def test_heavy_hitters_guarantee(sf_smoke):
    """Misra–Gries guarantee: every token with true frequency >
    N/(K+1) is reported, and reported counts are underestimates by at
    most N/(K+1)."""
    import duckdb

    from neo4j_webgraph_ray.queries_docs import HH_K, q_heavy_hitters

    got = q_heavy_hitters(sf_smoke)
    con = duckdb.connect()
    exact = con.sql(f"""
        WITH toks AS (SELECT list_filter(string_split_regex(trim(text),
                      '\\s+'), x -> x <> '') AS t
                      FROM '{sf_smoke}/documents.parquet')
        SELECT tok, count(*) AS c
        FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY tok
    """).df()
    true_c = dict(zip(exact["tok"], exact["c"]))
    N = int(exact["c"].sum())
    thresh = N / (HH_K + 1)
    reported = dict(zip(got["token"], got["min_count"]))
    for tok, c in true_c.items():
        if c > thresh:
            assert tok in reported, f"{tok} ({c} > {thresh}) missing"
    for tok, mc in reported.items():
        assert mc <= true_c[tok], f"{tok} overestimated"
        assert true_c[tok] - mc <= thresh + 1e-9, f"{tok} error too large"
    assert len(got) <= HH_K
