"""Count-min sketch — the LINEAR mergeable frequency sketch.

Completes the engine's mergeable-summary family: Misra–Gries
(`queries_docs.q_heavy_hitters`, deterministic underestimates,
partition-DEPENDENT summary), HyperLogLog (`q_approx_distinct_users`,
distinct counts), and now count-min (Cormode & Muthukrishnan 2005):
a d×w counter matrix where each key increments one counter per row
(row-specific hash) and a key's estimate is the MIN over its d cells.

Why it earns a place next to MG: the CM sketch is a *linear transform*
of the frequency vector, so per-block partial sketches sum ELEMENTWISE
into exactly the sketch a single pass would build — estimates are
partition-INVARIANT bit for bit (asserted in pytest), which MG cannot
offer, and deletions/decays stay representable.  Guarantees (fixed
seeds, deterministic): estimate >= true count always (counters only
ever over-count via collisions), and estimate <= true + e/w · N with
probability 1 - e^-d per key (N = total stream length).

Scale shape: each block contributes ONE d×w int64 partial (a fixed
8·d·w bytes regardless of row count — defaults 256 KiB); the driver
sums #blocks small matrices.  Nothing about the key universe ever
moves: the sketch replaces the vocabulary shuffle when the vocabulary
itself is the scale problem.  Hashing is the fixed-key engine hash
(`ids.hash64`) widened to d rows by the splitmix64 double-hash, so
sketches are reproducible across runs, machines and partitionings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from neo4j_webgraph_ray.ids import hash64
from neo4j_webgraph_ray.pipelines.neighborhood import _mix64

CMS_DEPTH = 4
CMS_WIDTH = 8192


def cms_positions(
    keys64: np.ndarray, depth: int, width: int
) -> np.ndarray:
    """(n, depth) int64 column indices — Kirsch–Mitzenmacher double
    hashing over two independent splitmix64 streams of the already-
    hashed keys."""
    h1 = _mix64(keys64)
    with np.errstate(over="ignore"):
        h2 = _mix64(keys64 ^ np.int64(0x5DEECE66D)) | np.uint64(1)
        i = np.arange(depth, dtype=np.uint64)[None, :]
        return ((h1[:, None] + i * h2[:, None]) % np.uint64(width)).astype(
            np.int64
        )


def cms_partial(
    keys64: np.ndarray, counts: np.ndarray, depth: int, width: int
) -> np.ndarray:
    """One block's d×w partial sketch from (hashed key, count) pairs."""
    sk = np.zeros((depth, width), np.int64)
    if len(keys64):
        pos = cms_positions(keys64, depth, width)
        rows = np.broadcast_to(np.arange(depth)[None, :], pos.shape)
        np.add.at(sk, (rows.ravel(), pos.ravel()),
                  np.repeat(counts, depth))
    return sk


def cms_build(
    ds: ray.data.Dataset,
    keys_of_batch,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> np.ndarray:
    """Sketch a Dataset: ``keys_of_batch(pa.Table) -> (keys64,
    counts)`` extracts each block's hashed keys and multiplicities; one
    fixed-size partial per BLOCK streams back and sums on the driver
    (linearity makes the result identical to a single-pass sketch)."""

    def partial(t: pa.Table) -> pa.Table:
        keys64, counts = keys_of_batch(t)
        sk = cms_partial(keys64, counts, depth, width)
        return pa.table({"sk": pa.array([sk.tobytes()], pa.binary())})

    out = np.zeros((depth, width), np.int64)
    for b in ds.map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).iter_batches(batch_size=64, batch_format="pyarrow"):
        for buf in b["sk"]:
            out += np.frombuffer(buf.as_py(), dtype=np.int64).reshape(
                depth, width
            )
    return out


def cms_estimate(
    sketch: np.ndarray, keys64: np.ndarray
) -> np.ndarray:
    """Point estimates: min over the d cells of each key.  Never
    underestimates; overestimates by at most e/w·N w.h.p."""
    depth, width = sketch.shape
    if not len(keys64):
        return np.zeros(0, np.int64)
    pos = cms_positions(keys64, depth, width)
    cells = sketch[np.arange(depth)[None, :], pos]  # (n, d)
    return cells.min(axis=1)


def cms_hash_tokens(tokens) -> np.ndarray:
    """Engine token hash for sketch keys (fixed-key, string-stable)."""
    return hash64(tokens)
