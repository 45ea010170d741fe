"""ANN similarity search vs brute-force numpy oracle; multimodal stage
plumbing with the deterministic fake codec."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from neo4j_webgraph_ray.stages.multimodal import (
    DecodeStage,
    decode_features,
    sample_frames,
    synthesize_binary_items,
)
from neo4j_webgraph_ray.stages.similarity import (
    ann_topk_bruteforce,
    ann_topk_lsh,
    embedding_neardup_pairs,
)


def emb_ds(n=200, dim=16, seed=3, with_dups=True):
    rng = np.random.default_rng(seed)
    m = rng.standard_normal((n, dim))
    if with_dups:
        m[1] = m[0] + 1e-4 * rng.standard_normal(dim)  # near-dup pair (0,1)
        m[7] = m[5]  # exact dup (5,7)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.astype(np.float32).ravel()), dim
            ),
        }
    )
    return ray.data.from_arrow(t), m


def brute_topk(m, qids, k):
    mm = m / np.linalg.norm(m, axis=1, keepdims=True)
    out = {}
    for q in qids:
        cos = np.round(mm[q] @ mm.T, 6).astype(np.float64)
        order = sorted(
            (i for i in range(len(m)) if i != q), key=lambda i: (-cos[i], i)
        )
        out[q] = order[:k]
    return out


def test_ann_bruteforce_matches_numpy_oracle():
    ds, m = emb_ds()
    m64 = m.astype(np.float32).astype(np.float64)  # match stored precision
    qids = [0, 3, 11]
    got = ann_topk_bruteforce(ds, qids, k=5)
    oracle = brute_topk(m64, qids, 5)
    for q in qids:
        mine = got[got["query_id"] == q].sort_values("rank")["neighbor_id"].tolist()
        assert mine == oracle[q], f"query {q}"


def test_embedding_neardup():
    ds, _ = emb_ds()
    pairs = embedding_neardup_pairs(ds, tau=0.99)
    got = set(zip(pairs["a"], pairs["b"]))
    assert (0, 1) in got and (5, 7) in got
    # random 16-dim vectors essentially never reach cos >= 0.99
    assert got == {(0, 1), (5, 7)}


def clustered_ds(n_clusters=20, per_cluster=20, dim=16, seed=5):
    """Planted clusters — the regime LSH is for (random gaussian data
    has near-uniform cosines and no LSH can beat scan-fraction there)."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)) * 3
    m = np.repeat(centers, per_cluster, axis=0) + 0.3 * rng.standard_normal(
        (n_clusters * per_cluster, dim)
    )
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(m), dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.astype(np.float32).ravel()), dim
            ),
        }
    )
    return ray.data.from_arrow(t), m


def test_ann_lsh_recall():
    ds, m = clustered_ds()
    m64 = m.astype(np.float32).astype(np.float64)
    qids = [0, 25, 111, 342]
    oracle = brute_topk(m64, qids, 10)
    got = ann_topk_lsh(ds, qids, k=10, n_planes=10)
    recalls = []
    for q in qids:
        mine = set(got[got["query_id"] == q]["neighbor_id"])
        recalls.append(len(mine & set(oracle[q])) / 10)
    assert np.mean(recalls) >= 0.6, recalls


def test_ann_ivf_recall():
    """IVF coarse-quantizer path: high recall on clustered data (the
    regime inverted lists are for), exact lexsort tie-break cut."""
    from neo4j_webgraph_ray.stages.similarity import ann_topk_ivf

    ds, m = clustered_ds()
    m64 = m.astype(np.float32).astype(np.float64)
    qids = [0, 25, 111, 342]
    oracle = brute_topk(m64, qids, 10)
    got = ann_topk_ivf(ds, qids, k=10, n_centroids=32, n_probe=6)
    recalls = []
    for q in qids:
        mine = set(got[got["query_id"] == q]["neighbor_id"])
        recalls.append(len(mine & set(oracle[q])) / 10)
    assert np.mean(recalls) >= 0.8, recalls


def test_ann_pq_recall_with_rerank():
    """PQ codes + exact shortlist re-rank: full recall on the
    clustered fixture (raw ADC ranking alone measured ~0.55 — the
    refine step is what makes the compressed scan usable)."""
    from neo4j_webgraph_ray.stages.similarity import ann_topk_pq

    ds, m = clustered_ds()
    m64 = m.astype(np.float32).astype(np.float64)
    qids = [0, 25, 111, 342]
    oracle = brute_topk(m64, qids, 10)
    got = ann_topk_pq(ds, qids, k=10, n_subspaces=4, n_centroids=32)
    recalls = []
    for q in qids:
        mine = set(got[got["query_id"] == q]["neighbor_id"])
        recalls.append(len(mine & set(oracle[q])) / 10)
    assert np.mean(recalls) >= 0.9, recalls


def test_embedding_neardup_lsh_vs_bruteforce():
    """Scale-path parity: the LSH-bucketed variant must report ONLY true
    pairs (precision 1 — cosines are computed exactly within buckets)
    and find the planted tight dups; recall vs brute force is bounded
    below (seed-deterministic)."""
    ds, _ = clustered_ds()
    tau = 0.9
    exact = embedding_neardup_pairs(ds, tau=tau, method="bruteforce")
    approx = embedding_neardup_pairs(ds, tau=tau, method="lsh", n_planes=8)
    exact_set = set(zip(exact["a"], exact["b"]))
    approx_set = set(zip(approx["a"], approx["b"]))
    assert len(exact_set) > 0  # fixture discriminates
    assert approx_set <= exact_set  # no false positives, canonical a<b
    assert len(approx_set) / len(exact_set) >= 0.8, (
        len(approx_set), len(exact_set))
    # cos values riding along must agree with the exact path
    merged = approx.merge(exact, on=["a", "b"], suffixes=("_l", "_e"))
    assert np.array_equal(merged["cos_l"].to_numpy(), merged["cos_e"].to_numpy())


def test_embedding_neardup_lsh_tight_dups_full_recall():
    """Near-identical vectors share sign patterns under the fixed seed:
    the planted (0,1) and (5,7) dup pairs must always surface."""
    ds, _ = emb_ds()
    pairs = embedding_neardup_pairs(ds, tau=0.99, method="lsh", n_planes=8)
    got = set(zip(pairs["a"], pairs["b"]))
    assert (0, 1) in got and (5, 7) in got


def test_embedding_neardup_lsh_recall_sweep_at_tau_boundary():
    """VERDICT r2 #7: recall vs brute force on the real testdata
    embeddings at NEARDUP_TAU and ±0.02.  The multi-table OR-amplified
    scheme must hold its designed recall (the old 1-flip replication
    measured 0.36 here); precision must be exact (pairs are verified
    by exact within-bucket cosine)."""
    import ray.data

    from neo4j_webgraph_ray.queries_docs import NEARDUP_TAU

    ds = ray.data.read_parquet("/root/testdata/sf0.01/embeddings.parquet")
    hits = tot = 0
    for tau in (NEARDUP_TAU - 0.02, NEARDUP_TAU, NEARDUP_TAU + 0.02):
        exact = embedding_neardup_pairs(ds, tau=tau, method="bruteforce")
        approx = embedding_neardup_pairs(ds, tau=tau, method="lsh", n_planes=8)
        es = set(zip(exact["a"], exact["b"]))
        As = set(zip(approx["a"], approx["b"]))
        assert As <= es, f"false positives at tau={tau}"
        assert len(es) > 0  # the sweep discriminates at every tau
        rec = len(As & es) / len(es)
        assert rec >= 0.95, (tau, rec, len(es))
        hits += len(As & es)
        tot += len(es)
    assert hits / tot >= 0.97, (hits, tot)


def test_lsh_tables_for_model():
    """Parameter selection follows the sign-LSH collision model: higher
    tau → fewer tables; the table count satisfies the target recall."""
    import numpy as np

    from neo4j_webgraph_ray.stages.similarity import lsh_tables_for

    b_low, L_low = lsh_tables_for(0.45, 0.98, 8, 32)
    b_hi, L_hi = lsh_tables_for(0.9, 0.98, 8, 32)
    assert L_hi < L_low  # high-tau pairs are easier
    for tau, (b, L) in [(0.45, (b_low, L_low)), (0.9, (b_hi, L_hi))]:
        p = 1 - np.arccos(tau) / np.pi
        assert 1 - (1 - p**b) ** L >= 0.98
        assert L <= 32


def test_ann_lsh_tied_cosines_deterministic():
    """Exact-duplicate vectors produce tied cosines straddling the k
    boundary; the per-batch cut must keep the smallest ids (same
    lexsort tie-break as the brute-force path)."""
    rng = np.random.default_rng(11)
    dim = 16
    base = rng.standard_normal(dim)
    m = np.vstack([base] * 8 + list(rng.standard_normal((40, dim))))
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(m), dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.astype(np.float32).ravel()), dim
            ),
        }
    )
    ds = ray.data.from_arrow(t)
    got = ann_topk_lsh(ds, [0], k=4, n_planes=6)
    # rows 1..7 all tie at cos=1.0; k=4 must pick ids 1,2,3,4
    assert got.sort_values("rank")["neighbor_id"].tolist() == [1, 2, 3, 4]


def test_multimodal_decode_plumbing():
    items = ray.data.from_arrow(synthesize_binary_items(32))
    out = decode_features(items, resize_to=(8, 8), concurrency=2, batch_size=8).to_pandas()
    assert len(out) == 32
    assert (out["out_width"] == 8).all() and (out["out_height"] == 8).all()
    assert out["mean_color"].map(len).eq(3).all()
    # deterministic: same payload -> same features
    out2 = decode_features(
        ray.data.from_arrow(synthesize_binary_items(32)), resize_to=(8, 8)
    ).to_pandas()
    a = np.stack(out.sort_values("item_id")["mean_color"].to_numpy())
    b = np.stack(out2.sort_values("item_id")["mean_color"].to_numpy())
    assert np.array_equal(a, b)


def test_multimodal_real_codec_stubbed():
    with pytest.raises(NotImplementedError, match="image library"):
        DecodeStage(codec="pil")


def test_frame_sampling():
    items = ray.data.from_arrow(synthesize_binary_items(8, seed=1))
    frames = sample_frames(items, frame_bytes=128, stride=2).to_pandas()
    assert (frames["frame_idx"] % 2 == 0).all()
    assert frames["frame"].map(len).le(128).all()
    assert set(frames["item_id"]) == set(range(8))


def test_ann_pq_persisted_codes(tmp_path):
    """VERDICT r3 #8: ``codes_dir`` persists the PQ codes; a second
    query run must REUSE them (no re-encode — file mtimes unchanged),
    return rank-identical results, and keep the recall bar.  A changed
    geometry must re-encode instead of silently reusing stale codes."""
    import glob
    import json
    import os

    import pandas as pd

    from neo4j_webgraph_ray.stages.similarity import ann_topk_pq

    ds, m = clustered_ds()
    m64 = m.astype(np.float32).astype(np.float64)
    qids = [0, 25, 111, 342]
    cd = str(tmp_path / "codes")

    got1 = ann_topk_pq(ds, qids, k=10, n_subspaces=4, n_centroids=32,
                       codes_dir=cd)
    assert os.path.exists(os.path.join(cd, "manifest.json"))
    files = sorted(glob.glob(os.path.join(cd, "codes", "*")))
    assert files
    mtimes = [os.path.getmtime(f) for f in files]

    got2 = ann_topk_pq(ds, qids, k=10, n_subspaces=4, n_centroids=32,
                       codes_dir=cd)
    pd.testing.assert_frame_equal(
        got1.reset_index(drop=True), got2.reset_index(drop=True)
    )
    assert mtimes == [os.path.getmtime(f) for f in files], "warm run re-encoded"

    oracle = brute_topk(m64, qids, 10)
    recalls = []
    for q in qids:
        mine = set(got1[got1["query_id"] == q]["neighbor_id"])
        recalls.append(len(mine & set(oracle[q])) / 10)
    assert np.mean(recalls) >= 0.9, recalls

    # geometry change must invalidate: manifest rewritten, codes rebuilt
    ann_topk_pq(ds, qids, k=10, n_subspaces=8, n_centroids=32, codes_dir=cd)
    with open(os.path.join(cd, "manifest.json")) as f:
        assert json.load(f)["n_subspaces"] == 8


def test_threshold_pairs_blocked_matches_unblocked():
    """The blocked in-bucket comparison (VERDICT r4 #1) must be
    bit-identical to the naive full-matrix computation — rounding
    happens on independent dot products, so the block boundary cannot
    change which pairs pass."""
    from neo4j_webgraph_ray.stages.similarity import threshold_pairs_blocked

    rng = np.random.default_rng(11)
    n, dim = 300, 12
    m = rng.standard_normal((n, dim))
    m[40] = m[12] + 1e-5 * rng.standard_normal(dim)
    m[77] = m[13]
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    ids = rng.permutation(np.arange(1000, 1000 + n)).astype(np.int64)
    tau = 0.4

    cos = np.round(m @ m.T, 6)
    iu, ju = np.nonzero(np.triu(cos >= tau, k=1))
    a, b = ids[iu], ids[ju]
    swap = a > b
    naive = sorted(zip(np.where(swap, b, a), np.where(swap, a, b),
                       cos[iu, ju]))

    # tiny budget => block_rows = max(1, 2400*8 // (8*300)) = 8 rows,
    # forcing ~38 blocks through the boundary logic
    for budget in (8 * n * 8, 3 * n * 8, 1 << 30):
        ga, gb, gc = threshold_pairs_blocked(ids, m, tau, block_bytes=budget)
        assert sorted(zip(ga, gb, gc)) == naive, f"budget={budget}"

    # degenerate inputs
    for k in (0, 1):
        ga, gb, gc = threshold_pairs_blocked(ids[:k], m[:k], tau)
        assert len(ga) == len(gb) == len(gc) == 0


def test_embedding_neardup_lsh_one_hot_bucket():
    """Every vector in ONE bucket (the degenerate boilerplate-corpus
    case the blocking exists for): all pairs must still come back, via
    the Dataset-returning scale path with no driver materialization
    inside the engine."""
    import ray.data as rd

    from neo4j_webgraph_ray.stages.similarity import (
        embedding_neardup_pairs_ds,
    )

    rng = np.random.default_rng(4)
    n, dim = 120, 16
    base = rng.standard_normal(dim)
    m = base[None, :] + 1e-6 * rng.standard_normal((n, dim))
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.astype(np.float32).ravel()), dim
            ),
        }
    )
    ds = embedding_neardup_pairs_ds(
        rd.from_arrow(t), tau=0.99, method="lsh", n_planes=8
    )
    assert isinstance(ds, rd.Dataset)
    out = ds.to_pandas()
    got = set(zip(out["a"], out["b"]))
    assert got == {(a, b) for a in range(n) for b in range(a + 1, n)}


def test_embedding_neardup_ds_matches_frame_wrapper():
    ds, _ = emb_ds()
    import ray.data as rd

    from neo4j_webgraph_ray.stages.similarity import (
        embedding_neardup_pairs_ds,
    )

    d = embedding_neardup_pairs_ds(ds, tau=0.99, method="bruteforce")
    assert isinstance(d, rd.Dataset)
    frame = embedding_neardup_pairs(ds, tau=0.99, method="bruteforce")
    via_ds = d.to_pandas().sort_values(["a", "b"]).reset_index(drop=True)
    assert via_ds[["a", "b"]].values.tolist() == frame[["a", "b"]].values.tolist()


def test_lsh_tables_for_fallback_warns():
    """The unreachable-recall fallback must be a capturable warning,
    not a bare stderr print (ADVICE r4)."""
    from neo4j_webgraph_ray.stages.similarity import lsh_tables_for

    with pytest.warns(RuntimeWarning, match="falling back"):
        b, L = lsh_tables_for(0.05, 0.98, 8, 4)
    assert (b, L) == (1, 4)


# -- clustering / semantic dedup ---------------------------------------------


def _kmeans_reference(ids, mat, k, n_iters):
    """Pure-numpy single-machine reference implementing EXACTLY the
    distributed algorithm's determinism contract (smallest-id init,
    9-dp centroid rounding, 6-dp cosine rounding, first-max ties,
    empty clusters keep their centroid)."""
    import numpy as np

    from neo4j_webgraph_ray.stages.similarity import _normalize

    order = np.argsort(ids, kind="stable")
    c = np.round(_normalize(mat[order[:k]].astype(np.float64)), 9)
    for _ in range(n_iters):
        m = _normalize(mat.astype(np.float64))
        sim = np.round(m @ c.T, 6)
        assign = np.argmax(sim, axis=1)
        new = c.copy()
        for j in range(len(c)):
            sel = assign == j
            if sel.any():
                new[j] = _normalize(m[sel].sum(axis=0)[None, :])[0]
        new = np.round(new, 9)
        if np.array_equal(new, c):  # same fixed-point rule as the engine
            break
        c = new
    m = _normalize(mat.astype(np.float64))
    sim = np.round(m @ c.T, 6)
    return np.argmax(sim, axis=1), c


def _load_emb(sf_dir):
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in
                    t["embedding"].to_numpy(zero_copy_only=False)])
    return ids, mat


def test_kmeans_assign_matches_reference(sf_smoke):
    """Distributed Lloyd's (partial-sum merge + broadcast) must equal
    the single-machine reference EXACTLY — the rounding contract makes
    partial-summation order invisible."""
    import numpy as np
    import ray.data

    from neo4j_webgraph_ray.stages.clustering import kmeans_assign

    ids, mat = _load_emb(sf_smoke)
    ref_assign, _ = _kmeans_reference(ids, mat, k=10, n_iters=10)
    got = (
        kmeans_assign(
            ray.data.read_parquet(f"{sf_smoke}/embeddings.parquet"), k=10
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    order = np.argsort(ids, kind="stable")
    assert np.array_equal(got["cluster"].to_numpy(), ref_assign[order])


def test_kmeans_improves_objective(sf_smoke):
    """Lloyd's must improve the spherical objective (mean cosine to the
    assigned centroid) over the smallest-id init, and every cluster
    must be non-empty on this data.  (The synthetic labels are only
    weakly geometric — purity ~0.17 vs 0.1 chance — so the objective,
    not label recovery, is the meaningful invariant.)"""
    import numpy as np
    import ray.data

    from neo4j_webgraph_ray.queries_docs import q_kmeans_clusters
    from neo4j_webgraph_ray.stages.similarity import _normalize

    got = q_kmeans_clusters(sf_smoke)
    assert got["cluster"].nunique() == 10

    ids, mat = _load_emb(sf_smoke)
    m = _normalize(mat)
    order = np.argsort(ids, kind="stable")
    c0 = np.round(_normalize(mat[order[:10]].astype(np.float64)), 9)
    obj_init = np.round(m @ c0.T, 6).max(axis=1).mean()
    obj_final = got.sort_values("vec_id")["cos"].mean()
    assert obj_final > obj_init


def test_semantic_dedup_matches_bruteforce(sf_smoke):
    """Distributed SemDeDup equals the brute-force same-rule oracle:
    drop iff some smaller-id SAME-CLUSTER vector has 6-dp-rounded
    cosine >= tau."""
    import numpy as np
    import ray.data

    from neo4j_webgraph_ray.stages.clustering import semantic_dedup_flags
    from neo4j_webgraph_ray.stages.similarity import _normalize

    tau = 0.45
    ids, mat = _load_emb(sf_smoke)
    ref_assign, _ = _kmeans_reference(ids, mat, k=10, n_iters=10)
    m = _normalize(mat)
    cos = np.round(m @ m.T, 6)
    same = ref_assign[:, None] == ref_assign[None, :]
    smaller = ids[None, :] < ids[:, None]
    ref_keep = ~((cos >= tau) & same & smaller).any(axis=1)

    got = (
        semantic_dedup_flags(
            ray.data.read_parquet(f"{sf_smoke}/embeddings.parquet"),
            tau=tau, k=10,
        )
        .to_pandas()
        .sort_values("vec_id")
    )
    order = np.argsort(ids, kind="stable")
    assert np.array_equal(got["keep"].to_numpy(), ref_keep[order])
    assert np.array_equal(got["cluster"].to_numpy(), ref_assign[order])
    assert (~ref_keep).sum() >= 0  # non-vacuity checked at sf0.01 below


def test_semantic_dedup_nonvacuous_sf001():
    """At sf0.01 and tau=0.45 the prune must actually drop something
    (guards against a vacuous always-keep result)."""
    import ray.data

    from neo4j_webgraph_ray.stages.clustering import semantic_dedup_flags

    got = semantic_dedup_flags(
        ray.data.read_parquet("/root/testdata/sf0.01/embeddings.parquet"),
        tau=0.45, k=10,
    ).to_pandas()
    assert (~got["keep"]).sum() > 0
    assert got["keep"].sum() > 0


def test_kmeans_resume_bit_identical(tmp_path, sf_smoke, monkeypatch):
    """An interrupted run (4-iteration budget) resumed under the full
    budget must produce BIT-IDENTICAL centroids to an uninterrupted
    run, must skip the init on resume, and a regenerated input at the
    same path must invalidate the checkpoint."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    import neo4j_webgraph_ray.stages.clustering as cl

    src = f"{sf_smoke}/embeddings.parquet"
    wd = str(tmp_path / "wd")

    def emb():
        return ray.data.read_parquet(src)

    direct = cl.kmeans_centroids(emb(), k=10, n_iters=10)
    part = cl.kmeans_centroids(emb(), k=10, n_iters=4, workdir=wd)
    assert not np.array_equal(part, direct)

    # resume must not re-run the init (budget-independent identity)
    def boom(*a, **k):
        raise AssertionError("init re-ran on resume")

    monkeypatch.setattr(cl, "_init_centroids", boom)
    resumed = cl.kmeans_centroids(emb(), k=10, n_iters=10, workdir=wd)
    monkeypatch.undo()
    assert np.array_equal(resumed, direct)

    # re-invoking at the full budget is a pure checkpoint read
    monkeypatch.setattr(cl, "_init_centroids", boom)
    again = cl.kmeans_centroids(emb(), k=10, n_iters=10, workdir=wd)
    monkeypatch.undo()
    assert np.array_equal(again, direct)

    # staleness: a DIFFERENT input at a new path with the same workdir
    # params but mismatched signature must retrain from scratch
    t = pq.read_table(src)
    perm = np.random.default_rng(0).permutation(t.num_rows)
    t2 = t.take(pa.array(perm[: t.num_rows // 2]))
    src2 = str(tmp_path / "embeddings.parquet")
    pq.write_table(t2, src2)
    fresh = cl.kmeans_centroids(
        ray.data.read_parquet(src2), k=10, n_iters=10, workdir=wd
    )
    assert not np.array_equal(fresh, direct)


def test_label_noise_matches_reference_and_partitioning(sf_smoke):
    """Distributed nearest-class-centroid label noise must equal the
    single-machine numpy reference exactly, and be invariant to input
    partitioning (the <= L-row partial merge is label-major, so block
    boundaries are invisible)."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from neo4j_webgraph_ray.stages.clustering import label_centroid_noise

    t = pq.read_table(f"{sf_smoke}/embeddings.parquet")
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    labels = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in
                    t["embedding"].to_numpy(zero_copy_only=False)])
    labs = np.unique(labels)
    cent = np.stack([mat[labels == l].mean(axis=0) for l in labs])
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cn = cent / np.linalg.norm(cent, axis=1, keepdims=True)
    pred = labs[np.argmax(np.round(mn @ cn.T, 9), axis=1)]

    ds = ray.data.read_parquet(f"{sf_smoke}/embeddings.parquet")
    got = label_centroid_noise(ds).to_pandas().sort_values("vec_id")
    order = np.argsort(ids, kind="stable")
    assert np.array_equal(got["pred_label"].to_numpy(), pred[order])
    assert np.array_equal(
        got["mislabeled"].to_numpy(), (pred != labels).astype(np.int64)[order]
    )
    # non-vacuous on the testdata: some but not all rows flagged
    n_mis = int(got["mislabeled"].sum())
    assert 0 < n_mis < len(got)

    rep = label_centroid_noise(ds.repartition(7)).to_pandas().sort_values("vec_id")
    assert np.array_equal(
        rep["pred_label"].to_numpy(), got["pred_label"].to_numpy()
    )


def test_shuffle_shards_invariants(sf_smoke):
    """shuffle_shards: exact permutation (each doc once), balanced
    shards (size spread <= 1), contiguous 0..n-1 positions per shard,
    and bucket-count invariance (the range-bucketed rank cannot depend
    on how many buckets split the key space)."""
    import numpy as np

    from neo4j_webgraph_ray.queries_docs import q_shuffle_shards

    got = q_shuffle_shards(sf_smoke, nbuckets=13).to_pandas()
    n = len(got)
    assert got["doc_id"].is_unique
    sizes = got.groupby("shard").size()
    assert sizes.max() - sizes.min() <= 1
    for _, g in got.groupby("shard"):
        assert np.array_equal(
            np.sort(g["pos"].to_numpy()), np.arange(len(g))
        )
    # rank = shard-major recomposition must be a permutation of 0..n-1
    rnk = got["pos"].to_numpy() * len(sizes) + got["shard"].to_numpy()
    assert np.array_equal(np.sort(rnk), np.arange(n))

    alt = (
        q_shuffle_shards(sf_smoke, nbuckets=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert alt.equals(got.sort_values("doc_id").reset_index(drop=True))


def test_embedding_outliers_matches_reference_and_partitioning(sf_smoke):
    """centroid_outliers must equal the single-machine reference and be
    partitioning-invariant (lexicographically ordered partial merge)."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from neo4j_webgraph_ray.queries_docs import OUTLIER_TAU
    from neo4j_webgraph_ray.stages.clustering import centroid_outliers

    ids, mat = _load_emb(sf_smoke)
    c = mat.mean(axis=0)
    cn = c / np.linalg.norm(c)
    mn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    cos = np.round(mn @ cn, 9)

    ds = ray.data.read_parquet(f"{sf_smoke}/embeddings.parquet")
    got = centroid_outliers(ds, threshold=OUTLIER_TAU).to_pandas().sort_values("vec_id")
    order = np.argsort(ids, kind="stable")
    assert np.array_equal(got["cos_centroid"].to_numpy(), cos[order])
    n_out = int(got["is_outlier"].sum())
    assert 0 < n_out < len(got)  # threshold discriminates

    rep = (
        centroid_outliers(ds.repartition(7), threshold=OUTLIER_TAU)
        .to_pandas()
        .sort_values("vec_id")
    )
    assert np.array_equal(
        rep["cos_centroid"].to_numpy(), got["cos_centroid"].to_numpy()
    )


def test_kmeans_checkpoint_torn_pair_rejected(tmp_path, sf_smoke):
    """Code-review r5: centroids.parquet and kmeans_meta.json are two
    separate atomic writes; a crash between them leaves newer centroids
    under older meta.  The meta's centroid fingerprint must detect the
    torn pair and force a cold retrain (preserving the bit-identical
    guarantee) instead of silently resuming from mismatched state."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    import neo4j_webgraph_ray.stages.clustering as cl

    src = f"{sf_smoke}/embeddings.parquet"
    wd = str(tmp_path / "km")

    def emb():
        return ray.data.read_parquet(src)

    direct = cl.kmeans_centroids(emb(), k=10, n_iters=10)
    cl.kmeans_centroids(emb(), k=10, n_iters=4, workdir=wd)

    # simulate the torn window: centroids advanced, meta not yet
    t = pq.read_table(f"{wd}/centroids.parquet")
    c = np.stack([np.asarray(v) for v in t["c"].to_numpy(zero_copy_only=False)])
    torn = np.round(c + 0.25, 9)
    pq.write_table(
        pa.table(
            {
                "cluster": t["cluster"],
                "c": pa.FixedSizeListArray.from_arrays(
                    pa.array(torn.ravel(), type=pa.float64()), c.shape[1]
                ),
            }
        ),
        f"{wd}/centroids.parquet",
    )
    from neo4j_webgraph_ray.stages.similarity import _input_signature

    loaded, start, fixed = cl._load_kmeans_checkpoint(
        wd,
        {"k": 10, "id_col": "vec_id", "vec_col": "embedding",
         "round_dp": cl.CENTROID_ROUND_DP, "cos_dp": cl.COS_ROUND_DP},
        _input_signature(emb()),
    )
    assert loaded is None and start == 0  # torn pair rejected

    # end-to-end: a full-budget run on the torn workdir retrains and
    # still reaches the uninterrupted result exactly
    again = cl.kmeans_centroids(emb(), k=10, n_iters=10, workdir=wd)
    assert np.array_equal(again, direct)


def test_pca_projection_matches_numpy(sf_smoke):
    """Distributed PCA == single-node numpy PCA under the same
    determinism contract (population covariance, descending eigenvalue,
    largest-|coord|-positive sign fix), allclose 1e-6."""
    import numpy as np
    import pyarrow.parquet as pq

    from neo4j_webgraph_ray.stages.clustering import pca_projection
    import ray.data

    t = pq.read_table(f"{sf_smoke}/embeddings.parquet")
    got = (
        pca_projection(ray.data.read_parquet(f"{sf_smoke}/embeddings.parquet"))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    m = np.stack([np.asarray(v, np.float64) for v in t["embedding"].to_pylist()])
    mu = m.mean(axis=0)
    cov = (m.T @ m) / len(m) - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)
    idx = np.argsort(-evals, kind="stable")[:2]
    comps = evecs[:, idx].T
    for r in range(2):
        j = int(np.argmax(np.abs(comps[r])))
        if comps[r, j] < 0:
            comps[r] = -comps[r]
    want = (m - mu) @ comps.T
    order = np.argsort(t["vec_id"].to_numpy())
    assert np.allclose(
        got[["pc1", "pc2"]].to_numpy(), np.round(want, 6)[order], atol=1e-6
    )
    # the projection is centered and the components capture variance
    assert abs(got["pc1"].mean()) < 1e-3
    assert got["pc1"].std() >= got["pc2"].std() - 1e-9
