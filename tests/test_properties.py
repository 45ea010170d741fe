"""Hypothesis property tests for the pure numpy shuffle/dedup
primitives — the kernels every wide operator leans on.  These run
WITHOUT Ray (pure functions), so they cover the input space far more
densely than the pipeline tests can.

Properties asserted:
- pair generation == brute-force itertools on arbitrary key runs;
- per-segment unique == per-doc np.unique on arbitrary offset layouts;
- packed-key Jaccard == python set Jaccard on arbitrary sorted-unique
  segments (both the fast path and the lexsort fallback);
- batch fingerprints/signatures stay bit-identical to the scalar
  reference on arbitrary unicode documents;
- grouped head-k (the sample_stratified combine) is ALGEBRAIC: head-k
  of merged per-part head-k's equals the global head-k for any split.
"""

from __future__ import annotations

import itertools

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from neo4j_webgraph_ray.stages.core import pair_indices_within_groups
from neo4j_webgraph_ray.stages.dedup import (
    _shingle_hashes,
    _sorted_pair_jaccard,
    _unique_per_segment,
    batch_shingle_hashes,
)

# documents: whitespace-separated tokens over a tiny alphabet so that
# shared shingles are common; includes empty and whitespace-only docs
_doc = st.text(alphabet="ab λ\t", max_size=40)


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(0, 5), max_size=60))
def test_pair_indices_match_itertools(keys):
    ks = np.sort(np.asarray(keys, dtype=np.int64))
    ai, bi = pair_indices_within_groups(ks)
    got = sorted(zip(ai.tolist(), bi.tolist()))
    want = sorted(
        (i, j)
        for i, j in itertools.combinations(range(len(ks)), 2)
        if ks[i] == ks[j]
    )
    assert got == want


@settings(max_examples=100, deadline=None)
@given(st.lists(st.lists(st.integers(0, 30), max_size=15), max_size=12))
def test_unique_per_segment_matches_np_unique(docs):
    flat = np.asarray(
        [x for d in docs for x in d], dtype=np.uint64
    )
    offs = np.concatenate([[0], np.cumsum([len(d) for d in docs])]).astype(np.int64)
    uflat, uofs = _unique_per_segment(flat, offs)
    assert len(uofs) == len(offs)
    for i, d in enumerate(docs):
        seg = uflat[uofs[i]: uofs[i + 1]]
        assert np.array_equal(seg, np.unique(np.asarray(d, dtype=np.uint64)))


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.sets(st.integers(0, 50), max_size=12), min_size=1, max_size=10),
    st.data(),
)
def test_sorted_pair_jaccard_matches_sets(segments, data):
    """Both sides' per-pair segments are sorted-unique (the module
    invariant); jaccard must equal the python-set value exactly."""
    n_pairs = data.draw(st.integers(1, 6))
    ai = data.draw(st.lists(st.integers(0, len(segments) - 1),
                            min_size=n_pairs, max_size=n_pairs))
    bi = data.draw(st.lists(st.integers(0, len(segments) - 1),
                            min_size=n_pairs, max_size=n_pairs))

    def gather(idx):
        segs = [np.asarray(sorted(segments[i]), dtype=np.uint64) for i in idx]
        lens = np.asarray([len(s) for s in segs], dtype=np.int64)
        vals = np.concatenate(segs) if lens.sum() else np.empty(0, np.uint64)
        return vals, np.repeat(np.arange(len(idx)), lens), lens

    va, ga, la = gather(ai)
    vb, gb, lb = gather(bi)
    jac = _sorted_pair_jaccard(va, ga, la, vb, gb, lb, n_pairs)
    for p in range(n_pairs):
        sa, sb = set(segments[ai[p]]), set(segments[bi[p]])
        u = len(sa | sb)
        want = len(sa & sb) / u if u else 0.0
        assert jac[p] == want


@settings(max_examples=60, deadline=None)
@given(st.lists(_doc, max_size=8), st.sampled_from([2, 3, 5]),
       st.booleans())
def test_batch_shingles_bit_identical_to_scalar(texts, k, char):
    flat, offs = batch_shingle_hashes(texts, k, char)
    for i, t in enumerate(texts):
        ref = _shingle_hashes(t, k, char)
        assert np.array_equal(ref, flat[offs[i]: offs[i + 1]]), (t, k, char)


@settings(max_examples=80, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 96), st.integers(0, 10**6)),
        max_size=40,
    ),
    st.integers(1, 4),
    st.integers(1, 5),
)
def test_grouped_headk_is_algebraic(rows, n_parts, k):
    """sample_stratified's combine: head-k under (skey, doc_id) per
    group must commute with any partitioning of the rows — partial
    head-k then merged head-k == global head-k."""
    df = pd.DataFrame(rows, columns=["lang", "skey", "doc_id"]).drop_duplicates(
        ["lang", "doc_id"]
    )

    def headk(d: pd.DataFrame) -> pd.DataFrame:
        return (
            d.sort_values(["skey", "doc_id"], kind="stable")
            .groupby("lang", sort=False)
            .head(k)
        )

    want = headk(df).sort_values(["lang", "doc_id"]).reset_index(drop=True)
    parts = [df.iloc[i::n_parts] for i in range(n_parts)]
    merged = pd.concat([headk(p) for p in parts], ignore_index=True)
    got = headk(merged).sort_values(["lang", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(want, got)


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.integers(0, 2**63 - 1), min_size=0, max_size=80, unique=True
    ),
    st.integers(1, 13),
    st.integers(1, 9),
)
def test_shuffle_rank_is_permutation_and_bucket_invariant(ids, nbuckets, n_shards):
    """The shuffle_shards rank kernel: the multiplicative-hash key is
    deterministic (uint64 wrap == HUGEINT product mod 2^32 for any
    int64 doc_id), the per-bucket (offset + local sort) rank is a
    permutation of 0..n-1, and the result is independent of the bucket
    count — for arbitrary ids including > 2^32 (where skey collides
    and the doc_id tiebreak decides)."""
    from neo4j_webgraph_ray.queries_docs import SHUFFLE_MULT

    ids = np.asarray(sorted(ids), dtype=np.int64)
    n = len(ids)
    skey = (
        ids.astype(np.uint64) * np.uint64(SHUFFLE_MULT)
    ) % np.uint64(2**32)

    def rank_with(nb: int) -> np.ndarray:
        width = np.uint64(2**32 // nb + 1)
        rb = (skey // width).astype(np.int64)
        counts = np.bincount(rb, minlength=nb) if n else np.zeros(nb, int)
        offsets = np.concatenate([[0], np.cumsum(counts)[:-1]])
        rnk = np.empty(n, dtype=np.int64)
        for b in np.unique(rb):
            sel = np.flatnonzero(rb == b)
            order = np.lexsort((ids[sel], skey[sel]))
            rnk[sel[order]] = offsets[b] + np.arange(len(sel))
        return rnk

    rnk = rank_with(nbuckets)
    # permutation property
    assert np.array_equal(np.sort(rnk), np.arange(n))
    # global-order property: rank order == lexicographic (skey, id)
    order = np.lexsort((ids, skey))
    assert np.array_equal(rnk[order], np.arange(n))
    # bucket-count invariance
    assert np.array_equal(rnk, rank_with(1))
    # shard deal is balanced
    if n:
        sizes = np.bincount(rnk % n_shards, minlength=n_shards)
        assert sizes.max() - sizes.min() <= 1


@settings(max_examples=120, deadline=None)
@given(
    st.lists(st.tuples(st.integers(0, 9), st.integers(0, 50)), max_size=60),
    st.integers(1, 10),
)
def test_bucket_prefix_offsets_reference(pairs, nbuckets):
    """_bucket_prefix_offsets' driver math: for any (bucket, weight)
    multiset, offsets[b] == total weight of all buckets < b, and the
    grand total is the plain sum — the exclusive-prefix contract the
    pack/shard/budget operators rely on."""
    rb = np.asarray([p[0] % nbuckets for p in pairs], dtype=np.int64)
    w = np.asarray([p[1] for p in pairs], dtype=np.int64)
    # pure-numpy mirror of the driver merge in _bucket_prefix_offsets
    offsets = np.zeros(nbuckets, dtype=np.int64)
    if len(rb):
        totals = pd.Series(w).groupby(rb).sum().sort_index()
        idx = totals.index.to_numpy()
        offsets[idx] = np.concatenate(
            [[0], np.cumsum(totals.to_numpy())[:-1]]
        )
    # exact exclusive-prefix for every PRESENT bucket (absent buckets
    # keep offset 0 and are never visited by the per-bucket finisher)
    for b in np.unique(rb):
        assert offsets[b] == w[rb < b].sum()
