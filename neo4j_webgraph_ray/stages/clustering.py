"""Distributed embedding clustering + semantic dedup (SemDeDup-style).

The reference has no clustering surface (its grouping is the Lucene
get-or-create index, ``importer/BatchGraphImporter.java:173-197``); this
module is the embedding-curation layer a training-data pipeline runs
between ANN indexing and dedup: full-corpus spherical k-means
(:func:`kmeans_assign`) and within-cluster cosine pruning
(:func:`semantic_dedup_flags`, the SemDeDup recipe: cluster first so the
O(n^2) comparison only ever happens inside a cluster).

Scale shape (100-TB reasoning):

- k-means is Lloyd's over ``map_batches`` PARTIALS: each batch emits at
  most k rows (cluster, count, sum-vector); the driver merges
  ``k x #blocks`` tiny rows per iteration and broadcasts the k x d
  centroid matrix back via ``ray.put``.  The corpus itself never
  shuffles and is read once per iteration (streaming, no
  materialization).
- Determinism across partitionings: per-batch sums are float64, merged
  sums are re-rounded to 9 dp after normalization each iteration, and
  batch cosines are rounded to 6 dp before the argmax (first-max ->
  lowest cluster index on ties) — so a 1-ulp difference in partial-sum
  order cannot flip an assignment.  The seed-free init (the k vectors
  with the SMALLEST ids) is partitioning-independent by construction.
- semantic dedup shuffles only (id, cluster, vec) triples, bucketed by
  cluster; the in-cluster comparison reuses the blocked threshold
  kernel (peak allocation bounded by PAIR_BLOCK_BYTES), with a logged
  membership cap mirroring the LSH bucket protocol.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from neo4j_webgraph_ray.stages.similarity import (
    _matrix,
    _normalize,
    threshold_pairs_blocked,
)

logger = logging.getLogger(__name__)

KMEANS_ITERS = 10
CENTROID_ROUND_DP = 9  # kills partial-sum-order float drift
COS_ROUND_DP = 6  # same rounding the pair kernels use


def _init_centroids(
    embeddings: ray.data.Dataset, k: int, id_col: str, vec_col: str
) -> np.ndarray:
    """Deterministic, partitioning-independent init: the (normalized)
    vectors of the k SMALLEST ids.  Per-batch partial top-k keeps the
    driver transfer at k rows per block."""

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.select([id_col, vec_col])
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        take = np.argsort(ids, kind="stable")[:k]
        return batch.select([id_col, vec_col]).take(pa.array(take))

    rows = embeddings.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    rows = rows.sort_values(id_col, kind="stable").head(k)
    mat = np.stack(
        [np.asarray(v, dtype=np.float64) for v in rows[vec_col].to_numpy()]
    )
    return np.round(_normalize(mat), CENTROID_ROUND_DP)


def _assign_batch(m: np.ndarray, centroids: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(cluster, cosine) per row: 6-dp-rounded spherical similarity,
    ties -> lowest cluster index (np.argmax takes the first max)."""
    sim = np.round(m @ centroids.T, COS_ROUND_DP)
    assign = np.argmax(sim, axis=1)
    return assign, sim[np.arange(len(m)), assign]


def _load_kmeans_checkpoint(
    workdir: str, params: dict, sig: list | None
) -> tuple[np.ndarray | None, int, bool]:
    """(centroids, iters_done, fixed_point) from a matching checkpoint,
    or (None, 0, False).  Reuse requires the SAME params AND a non-None
    matching input signature — the PQ-codes staleness protocol
    (similarity.py): a regenerated corpus at the same path must
    invalidate, and an unverifiable input is never trusted."""
    from neo4j_webgraph_ray.state import fsio

    meta_path = fsio.join(workdir, "kmeans_meta.json")
    if sig is None or not fsio.exists(meta_path):
        return None, 0, False
    meta = fsio.read_json(meta_path)
    if meta.get("params") != params or meta.get("signature") != sig:
        return None, 0, False
    t = fsio.read_table(fsio.join(workdir, "centroids.parquet"))
    order = np.argsort(t["cluster"].to_numpy(zero_copy_only=False))
    c = np.stack(
        [
            np.asarray(v, dtype=np.float64)
            for v in t["c"].to_numpy(zero_copy_only=False)[order]
        ]
    )
    # torn-pair guard: centroids and meta are two separate atomic
    # writes, so a crash between them can leave NEWER centroids under
    # OLDER meta — resuming that pair re-runs iterations from the
    # wrong state and silently breaks the bit-identical-resume
    # contract.  The meta (written LAST, the commit point) carries a
    # fingerprint of the centroids it describes; mismatch -> the
    # checkpoint is torn -> retrain from scratch.
    if meta.get("centroids_fp") != _centroids_fp(c):
        return None, 0, False
    return c, int(meta["iters_done"]), bool(meta.get("fixed_point"))


def _centroids_fp(centroids: np.ndarray) -> str:
    """Content fingerprint binding kmeans_meta.json to the exact
    centroids.parquet it was written with (rounded values are already
    deterministic, so hashing the bytes is stable)."""
    import hashlib

    return hashlib.sha256(
        np.ascontiguousarray(centroids, dtype=np.float64).tobytes()
    ).hexdigest()[:32]


def _write_kmeans_checkpoint(
    workdir: str, params: dict, sig: list, centroids: np.ndarray,
    iters_done: int, fixed_point: bool,
) -> None:
    from neo4j_webgraph_ray.state import fsio

    fsio.makedirs(workdir)
    dim = centroids.shape[1]
    fsio.write_table_atomic(
        pa.table(
            {
                "cluster": pa.array(
                    np.arange(len(centroids), dtype=np.int64)
                ),
                "c": pa.FixedSizeListArray.from_arrays(
                    pa.array(centroids.ravel(), type=pa.float64()), dim
                ),
            }
        ),
        fsio.join(workdir, "centroids.parquet"),
    )
    fsio.write_json_atomic(
        {
            "params": params,
            "signature": sig,
            "iters_done": iters_done,
            "fixed_point": fixed_point,
            # written LAST: binds this meta to the centroid file above,
            # so a crash between the two writes is detectable on load
            "centroids_fp": _centroids_fp(centroids),
        },
        fsio.join(workdir, "kmeans_meta.json"),
    )


def kmeans_centroids(
    embeddings: ray.data.Dataset, k: int = 10, n_iters: int = KMEANS_ITERS,
    id_col: str = "vec_id", vec_col: str = "embedding",
    workdir: str | None = None, checkpoint_every: int = 1,
) -> np.ndarray:
    """Full-corpus spherical Lloyd's: per-iteration partials (<= k rows
    per block) -> driver merge -> broadcast.  Empty clusters keep their
    previous centroid (deterministic; no resample at full-corpus
    scale).  Stops early at a FIXED POINT — when the 9-dp-rounded
    centroids repeat, every later iteration reproduces them exactly, so
    the early stop is assignment-identical to running all ``n_iters``
    (the pure-numpy reference test mirrors the same rule).  Returns the
    (k, d) normalized, 9-dp-rounded centroids.

    ``workdir`` (optional, pyarrow.fs path/URI) makes the loop
    RESUMABLE: centroids are checkpointed every ``checkpoint_every``
    iterations (atomic write + JSON meta carrying params, input
    signature, iteration count, fixed-point flag), and a matching
    checkpoint restarts the loop mid-algorithm — at the 10^9-vector
    regime each Lloyd iteration is a full corpus pass, so losing 30
    iterations to a preemption is real money.  Because every
    iteration's math is rounded, a resumed run is bit-identical to an
    uninterrupted one (asserted in pytest)."""
    from neo4j_webgraph_ray.stages.similarity import _input_signature

    # n_iters is deliberately NOT identity: centroids after iteration i
    # are budget-independent, so an interrupted 4-iteration run resumes
    # cleanly under a 10-iteration budget
    params = {
        "k": k, "id_col": id_col, "vec_col": vec_col,
        "round_dp": CENTROID_ROUND_DP, "cos_dp": COS_ROUND_DP,
    }
    sig = _input_signature(embeddings) if workdir else None
    start_iter = 0
    centroids = None
    if workdir:
        centroids, start_iter, fixed = _load_kmeans_checkpoint(
            workdir, params, sig
        )
        if centroids is not None and (fixed or start_iter >= n_iters):
            return centroids
    if centroids is None:
        centroids = _init_centroids(embeddings, k, id_col, vec_col)
        start_iter = 0
    kk = len(centroids)
    for it in range(start_iter, n_iters):
        cref = ray.put(centroids)

        def partial(batch: pa.Table) -> pa.Table:
            c = ray.get(cref)
            dim = c.shape[1]
            if batch.num_rows == 0:
                return pa.table(
                    {
                        "cluster": pa.array([], pa.int64()),
                        "cnt": pa.array([], pa.int64()),
                        "vsum": pa.array([], pa.list_(pa.float64(), dim)),
                    }
                )
            m = _normalize(_matrix(batch, vec_col))
            assign, _ = _assign_batch(m, c)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, m)
            cnt = np.bincount(assign, minlength=len(c))
            nz = np.flatnonzero(cnt)
            return pa.table(
                {
                    "cluster": pa.array(nz.astype(np.int64)),
                    "cnt": pa.array(cnt[nz].astype(np.int64)),
                    "vsum": pa.FixedSizeListArray.from_arrays(
                        pa.array(sums[nz].ravel(), type=pa.float64()), dim
                    ),
                }
            )

        parts = embeddings.map_batches(
            partial, batch_format="pyarrow", zero_copy_batch=True
        ).to_pandas()  # <= k rows per block, tiny by construction
        sums = np.zeros_like(centroids)
        counts = np.zeros(kk, dtype=np.int64)
        if len(parts):
            cl = parts["cluster"].to_numpy().astype(np.int64)
            vs = np.stack(
                [np.asarray(v, dtype=np.float64) for v in parts["vsum"].to_numpy()]
            )
            # merge in cluster-major order so the reduction order is
            # independent of block arrival order
            order = np.argsort(cl, kind="stable")
            np.add.at(sums, cl[order], vs[order])
            np.add.at(counts, cl, parts["cnt"].to_numpy().astype(np.int64))
        nonempty = counts > 0
        new = centroids.copy()
        new[nonempty] = _normalize(sums[nonempty])
        new = np.round(new, CENTROID_ROUND_DP)
        fixed = np.array_equal(new, centroids)  # fixed point: converged
        if workdir and sig is not None and (
            fixed or it == n_iters - 1 or (it + 1) % checkpoint_every == 0
        ):
            _write_kmeans_checkpoint(workdir, params, sig, new, it + 1, fixed)
        if fixed:
            return new
        centroids = new
    return centroids


def kmeans_assign(
    embeddings: ray.data.Dataset, k: int = 10, n_iters: int = KMEANS_ITERS,
    id_col: str = "vec_id", vec_col: str = "embedding",
    emit_vectors: bool = False, workdir: str | None = None,
) -> ray.data.Dataset:
    """(id, cluster, cos) per vector — the final assignment pass over
    the trained centroids.  ``emit_vectors`` additionally carries the
    normalized vector (consumed by :func:`semantic_dedup_flags` so the
    dedup shuffle doesn't re-read + re-normalize the corpus);
    ``workdir`` enables mid-training resume (see
    :func:`kmeans_centroids`)."""
    centroids = kmeans_centroids(
        embeddings, k, n_iters, id_col, vec_col, workdir=workdir
    )
    cref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        c = ray.get(cref)
        dim = c.shape[1]
        if batch.num_rows == 0:
            cols = {
                id_col: pa.array([], pa.int64()),
                "cluster": pa.array([], pa.int64()),
                "cos": pa.array([], pa.float64()),
            }
            if emit_vectors:
                cols["vec"] = pa.array([], pa.list_(pa.float64(), dim))
            return pa.table(cols)
        m = _normalize(_matrix(batch, vec_col))
        a, cos = _assign_batch(m, c)
        cols = {
            id_col: batch[id_col],
            "cluster": pa.array(a.astype(np.int64)),
            "cos": pa.array(cos),
        }
        if emit_vectors:
            cols["vec"] = pa.FixedSizeListArray.from_arrays(
                pa.array(m.ravel(), type=pa.float64()), dim
            )
        return pa.table(cols)

    return embeddings.map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )


def semantic_dedup_flags(
    embeddings: ray.data.Dataset, tau: float, k: int = 10,
    n_iters: int = KMEANS_ITERS, id_col: str = "vec_id",
    vec_col: str = "embedding", num_buckets: int = 64,
    max_cluster: int = 20_000,
) -> ray.data.Dataset:
    """SemDeDup: keep a vector unless SOME SMALLER-id vector in its
    k-means cluster has cosine >= tau with it (min-id representative
    per near-dup neighborhood — deterministic, order-free, no
    sequential greedy pass).  Returns (id, cluster, keep).

    The cluster groupby shuffles only (id, cluster, vec) triples; the
    in-cluster comparison is the blocked threshold kernel (peak
    allocation bounded), and clusters beyond ``max_cluster`` members
    are truncated with a logged drop — the same honest-degradation
    protocol as the LSH bucket cap (excess members are KEPT, never
    silently dropped from the output)."""
    assigned = kmeans_assign(
        embeddings, k, n_iters, id_col, vec_col, emit_vectors=True
    )

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        out_ids, out_cl, out_keep = [], [], []
        for cl, g in df.groupby("cluster", sort=False):
            ids = g[id_col].to_numpy()
            keep = np.ones(len(ids), dtype=bool)
            if len(ids) > max_cluster:
                logger.warning(
                    "semantic_dedup: cluster %s has %d members; only the "
                    "%d smallest-id members are compared (excess kept)",
                    cl, len(ids), max_cluster,
                )
                order = np.argsort(ids, kind="stable")[:max_cluster]
            else:
                order = np.arange(len(ids))
            sub_ids = ids[order]
            m = np.stack(
                [np.asarray(v, dtype=np.float64) for v in g["vec"].to_numpy()[order]]
            )
            _, b, _ = threshold_pairs_blocked(sub_ids, m, tau)
            if len(b):
                removed = np.unique(b)  # b is always the LARGER id
                keep[order] = ~np.isin(sub_ids, removed)
            out_ids.append(ids)
            out_cl.append(np.full(len(ids), cl, dtype=np.int64))
            out_keep.append(keep)
        if not out_ids:
            return pd.DataFrame(
                {id_col: np.empty(0, np.int64),
                 "cluster": np.empty(0, np.int64),
                 "keep": np.empty(0, bool)}
            )
        return pd.DataFrame(
            {
                id_col: np.concatenate(out_ids),
                "cluster": np.concatenate(out_cl),
                "keep": np.concatenate(out_keep),
            }
        )

    from neo4j_webgraph_ray.stages.core import bucketed_groupby

    return bucketed_groupby(
        assigned, ["cluster"], prune,
        num_buckets=num_buckets, local_combine=False,
    )


LABEL_COS_ROUND_DP = 9  # matches the oracle's round(list_cosine_similarity, 9)


def centroid_outliers(
    embeddings: ray.data.Dataset, threshold: float,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Global-centroid outlier scoring: cosine of every vector against
    the corpus mean vector (9-dp rounded), flagged ``is_outlier`` when
    below ``threshold`` — the cheap embedding-space anomaly screen a
    curation pipeline runs before the per-class / per-cluster passes.
    Two streaming passes, no shuffle: per-block (count, sum-vector)
    partials (one row per block), driver mean, broadcast dot pass —
    the degenerate L=1 case of :func:`label_centroid_noise`'s shape."""

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"cnt": pa.array([], pa.int64()),
                 "vsum": pa.array([], pa.list_(pa.float64()))}
            )
        m = _matrix(batch, vec_col)
        s = m.sum(axis=0)
        # variable-length list on BOTH branches: an empty batch can't
        # know dim, and mixing list<->fixed_size_list across blocks
        # makes Ray warn about inconsistent schemas
        return pa.table(
            {
                "cnt": pa.array([batch.num_rows], pa.int64()),
                "vsum": pa.array([s], type=pa.list_(pa.float64())),
            }
        )

    parts = embeddings.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()  # one row per block
    if not len(parts):
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cos_centroid": pa.array([], pa.float64()),
                    "is_outlier": pa.array([], pa.int64()),
                }
            )
        )
    vs = np.stack([np.asarray(v, dtype=np.float64) for v in parts["vsum"].to_numpy()])
    # lexicographic partial order -> reduction independent of block
    # arrival order (same discipline as the kmeans label-major merge)
    vs = vs[np.lexsort(tuple(vs.T[::-1]))]
    centroid = vs.sum(axis=0) / int(parts["cnt"].sum())
    cn = centroid / np.linalg.norm(centroid)
    ref = ray.put(cn)

    def score(batch: pa.Table) -> pa.Table:
        c = ray.get(ref)
        if batch.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "cos_centroid": pa.array([], pa.float64()),
                    "is_outlier": pa.array([], pa.int64()),
                }
            )
        m = _normalize(_matrix(batch, vec_col))
        cos = np.round(m @ c, LABEL_COS_ROUND_DP)
        return pa.table(
            {
                id_col: batch[id_col],
                "cos_centroid": pa.array(cos),
                "is_outlier": pa.array((cos < threshold).astype(np.int64)),
            }
        )

    return embeddings.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


def label_centroid_noise(
    embeddings: ray.data.Dataset, id_col: str = "vec_id",
    vec_col: str = "embedding", label_col: str = "label",
) -> ray.data.Dataset:
    """Label-noise detection by nearest-class-centroid (the
    Confident-Learning-style first pass a curation pipeline runs over a
    labeled embedding table): each class's centroid is the mean of its
    RAW vectors, every vector is scored against every centroid by
    cosine, and a row is flagged ``mislabeled`` when its own label is
    not the argmax (9-dp-rounded cosine, ties -> smallest label).
    Returns (id, label, pred_label, mislabeled) — label columns int64.

    Scale shape (same partial/broadcast discipline as
    :func:`kmeans_centroids`): the centroid pass streams the corpus
    once, each block emitting <= L rows of (label, count, float64
    sum-vector) partials; the driver merges L x #blocks tiny rows in
    label-major order (reduction order independent of block arrival)
    and broadcasts the L x d centroid matrix via ``ray.put``; the
    scoring pass streams the corpus a second time — one matmul per
    batch, nothing shuffles.  L is the number of distinct labels
    (~10-10^4 for any real label space), so driver state is bounded.

    The reference has no model-quality surface; this generalizes its
    per-type aggregate counters (``importer/TransactionalGraphImporter
    .java:371-379``) from count-per-class to mean-vector-per-class."""

    def partial(batch: pa.Table) -> pa.Table:
        labels = batch[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if batch.num_rows == 0:
            return pa.table(
                {
                    "label": pa.array([], pa.int64()),
                    "cnt": pa.array([], pa.int64()),
                    "vsum": pa.array([], pa.list_(pa.float64())),
                }
            )
        m = _matrix(batch, vec_col)  # raw float64, NOT normalized
        u, inv = np.unique(labels, return_inverse=True)
        sums = np.zeros((len(u), m.shape[1]))
        np.add.at(sums, inv, m)
        cnt = np.bincount(inv, minlength=len(u)).astype(np.int64)
        # variable-length list on BOTH branches (empty batches can't
        # know dim; mixed list/fixed_size_list schemas make Ray warn)
        return pa.table(
            {
                "label": pa.array(u),
                "cnt": pa.array(cnt),
                "vsum": pa.array(list(sums), type=pa.list_(pa.float64())),
            }
        )

    parts = embeddings.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()  # <= L rows per block — tiny by construction
    if not len(parts):
        return ray.data.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "label": pa.array([], pa.int64()),
                    "pred_label": pa.array([], pa.int64()),
                    "mislabeled": pa.array([], pa.int64()),
                }
            )
        )
    pl = parts["label"].to_numpy().astype(np.int64)
    labs = np.unique(pl)
    pos = np.searchsorted(labs, pl)
    vs = np.stack([np.asarray(v, dtype=np.float64) for v in parts["vsum"].to_numpy()])
    sums = np.zeros((len(labs), vs.shape[1]))
    counts = np.zeros(len(labs), dtype=np.int64)
    # (label, vsum-lexicographic) merge order -> reduction independent
    # of block arrival: label alone leaves same-label partials in
    # arrival order, which is nondeterministic under Ray's unordered
    # block collection
    order = np.lexsort((*vs.T[::-1], pos))
    np.add.at(sums, pos[order], vs[order])
    np.add.at(counts, pos, parts["cnt"].to_numpy().astype(np.int64))
    centroids = sums / counts[:, None]
    cn = _normalize(centroids)
    ref = ray.put((labs, cn))

    def score(batch: pa.Table) -> pa.Table:
        labs_, cn_ = ray.get(ref)
        if batch.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "label": pa.array([], pa.int64()),
                    "pred_label": pa.array([], pa.int64()),
                    "mislabeled": pa.array([], pa.int64()),
                }
            )
        m = _normalize(_matrix(batch, vec_col))
        cos = np.round(m @ cn_.T, LABEL_COS_ROUND_DP)
        # argmax takes the FIRST max and labs_ is ascending -> ties
        # resolve to the smallest label, matching the oracle's
        # ORDER BY cos DESC, clabel
        pred = labs_[np.argmax(cos, axis=1)]
        own = batch[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                id_col: batch[id_col],
                "label": pa.array(own),
                "pred_label": pa.array(pred),
                "mislabeled": pa.array((own != pred).astype(np.int64)),
            }
        )

    return embeddings.map_batches(
        score, batch_format="pyarrow", zero_copy_batch=True
    )


def pca_projection(
    embeddings: ray.data.Dataset, n_components: int = 2,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Distributed PCA projection — the dimensionality-reduction pass a
    curation pipeline runs for visualization / clustering features:
    per-block exact float64 moment partials (count, sum-vector,
    flattened sum-outer — ONE row per block, so the corpus never
    shuffles), a d×d eigendecomposition on the driver, and a broadcast
    projection pass.  Deterministic: partials merge in lexicographic
    order (block-arrival independent up to float addition of
    identically-ordered terms), eigenpairs sort by descending
    eigenvalue with index tie-break, and each component's sign is
    fixed so its largest-|coordinate| entry is positive.  Output
    (id, pc1..pck) rounded to 6 dp.

    Scale judgment: moments are d² per block (64-dim → 32 KB); the
    driver work is O(d³) regardless of corpus size — the classic
    tall-skinny regime.  For d in the thousands, switch to randomized
    sketching; this path covers the embedding-table widths the
    testdata models."""

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {"cnt": pa.array([], pa.int64()),
                 "vsum": pa.array([], pa.list_(pa.float64())),
                 "outer": pa.array([], pa.list_(pa.float64()))}
            )
        m = _matrix(batch, vec_col)
        s = m.sum(axis=0)
        o = (m.T @ m).ravel()
        return pa.table(
            {
                "cnt": pa.array([batch.num_rows], pa.int64()),
                "vsum": pa.array([s], type=pa.list_(pa.float64())),
                "outer": pa.array([o], type=pa.list_(pa.float64())),
            }
        )

    parts = embeddings.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    cols = [id_col] + [f"pc{i + 1}" for i in range(n_components)]
    if not len(parts):
        return ray.data.from_arrow(
            pa.table({c: pa.array([], pa.float64() if c != id_col else pa.int64())
                      for c in cols})
        )
    vs = np.stack([np.asarray(v, np.float64) for v in parts["vsum"].to_numpy()])
    os_ = np.stack([np.asarray(v, np.float64) for v in parts["outer"].to_numpy()])
    order = np.lexsort(tuple(os_.T[::-1]))
    vs, os_ = vs[order], os_[order]
    n = int(parts["cnt"].sum())
    d = vs.shape[1]
    mu = vs.sum(axis=0) / n
    cov = os_.sum(axis=0).reshape(d, d) / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    idx = np.argsort(-evals, kind="stable")[:n_components]
    comps = evecs[:, idx].T  # (k, d)
    # sign fix: largest-|coordinate| entry positive (first on tie)
    for r in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[r])))
        if comps[r, j] < 0:
            comps[r] = -comps[r]
    ref = ray.put((mu, comps))

    def project(batch: pa.Table) -> pa.Table:
        mu_, c_ = ray.get(ref)
        if batch.num_rows == 0:
            return pa.table(
                {c: pa.array([], pa.float64() if c != id_col else pa.int64())
                 for c in cols}
            )
        m = _matrix(batch, vec_col)
        p = np.round((m - mu_) @ c_.T, 6)
        out = {id_col: batch[id_col]}
        for i in range(c_.shape[0]):
            out[f"pc{i + 1}"] = pa.array(p[:, i])
        return pa.table(out)

    return embeddings.map_batches(
        project, batch_format="pyarrow", zero_copy_batch=True
    )
