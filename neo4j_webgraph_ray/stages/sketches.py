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


# ---------------------------------------------------------------------------
# Min-wise bottom-k sample — the coordinated-sampling sketch.
#
# The k rows whose splitmix64(id) is smallest form an exact-size-k
# uniform sample WITHOUT replacement (ids are unique and the splitmix64
# finalizer is a 64-bit BIJECTION, so keys are collision-free and the
# sample is one fixed set — partition-INVARIANT and mergeable: the
# bottom-k of per-block bottom-k partials IS the global bottom-k).
# Distinct from `q_transcript_sample`'s systematic Bernoulli pick: that
# yields a rate, this yields an exact size; and min-wise keys make
# samples of two streams COORDINATED (shared ids pick the same rows),
# the property behind bottom-k Jaccard estimators.  Doubles as a
# mergeable QUANTILE sketch via the DKW inequality: quantiles read off
# a uniform k-sample have rank error <= sqrt(ln(2/d)/2k) w.p. 1-d.
# ---------------------------------------------------------------------------

_T64 = "18446744073709551616::HUGEINT"  # 2^64
_T32 = "4294967296::HUGEINT"  # 2^32
_SPLITMIX_GAMMA_I = 0x9E3779B97F4A7C15
_SPLITMIX_M1_I = 0xBF58476D1CE4E5B9
_SPLITMIX_M2_I = 0x94D049BB133111EB


def _sql_mulmod64(z_expr: str, m_const: int) -> str:
    """(z * m) mod 2^64 in DuckDB HUGEINT without INT128 overflow:
    split z into 32-bit halves so every product stays below 2^96."""
    return (
        f"(((({z_expr}) // {_T32}) * {m_const}::HUGEINT % {_T64}) * {_T32}"
        f" + (({z_expr}) % {_T32}) * {m_const}::HUGEINT) % {_T64}"
    )


def splitmix64_cte(table: str, id_col: str, carry_cols: str) -> str:
    """WITH-clause body computing ``skey`` = splitmix64(``id_col``)
    over ``table`` — the oracle-side mirror of
    :func:`neo4j_webgraph_ray.pipelines.neighborhood._mix64`, verified
    BIT-IDENTICAL in ``tests/test_sketches.py``.  The final CTE is
    named ``mixd`` and carries ``carry_cols`` plus ``skey``."""
    return f"""s0 AS (
  SELECT {carry_cols},
         ((CASE WHEN {id_col} < 0 THEN {id_col}::HUGEINT + {_T64}
                ELSE {id_col}::HUGEINT END)
          + {_SPLITMIX_GAMMA_I}::HUGEINT) % {_T64} AS z0
  FROM {table}
), s1 AS (
  SELECT {carry_cols},
         {_sql_mulmod64("xor(z0, z0 // 1073741824::HUGEINT)", _SPLITMIX_M1_I)} AS z1
  FROM s0
), s2 AS (
  SELECT {carry_cols},
         {_sql_mulmod64("xor(z1, z1 // 134217728::HUGEINT)", _SPLITMIX_M2_I)} AS z2
  FROM s1
), mixd AS (
  SELECT {carry_cols}, xor(z2, z2 // 2147483648::HUGEINT) AS skey FROM s2
)"""


def bottomk_sample(
    ds: ray.data.Dataset, id_col: str, k: int
) -> ray.data.Dataset:
    """The k rows with the smallest splitmix64(``id_col``) — per-block
    partial bottom-k (argpartition, no sort of the block), then ONE
    tiny exchange over <= #blocks x k partial rows (sort + limit).
    The full stream never shuffles; only candidate rows move."""
    from neo4j_webgraph_ray.pipelines.neighborhood import _mix64

    def partial(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        keys = _mix64(np.asarray(ids, np.int64))
        if len(keys) > k:
            idx = np.argpartition(keys, k)[:k]
            t = t.take(pa.array(idx, pa.int64()))
            keys = keys[idx]
        return t.append_column("skey", pa.array(keys, pa.uint64()))

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .sort("skey")
        .limit(k)
    )


def aes_weighted_sample(
    ds: ray.data.Dataset, id_col: str, weight_col: str, k: int
) -> ray.data.Dataset:
    """Efraimidis–Spirakis weighted sample WITHOUT replacement
    (exponential-race form): each row gets ekey = -ln(u)/w with
    u = (splitmix64(id)+1)·2⁻⁶⁴, and the k SMALLEST ekeys win —
    inclusion probability proportional to weight, exact size k,
    deterministic and partition-invariant (u is a pure function of the
    unique id).  Rows with weight <= 0 are excluded (zero weight is
    never drawn).  Same scale shape as :func:`bottomk_sample`: only
    <= #blocks x k candidate rows move.  The oracle mirrors the
    identical arithmetic (HUGEINT splitmix64 → DOUBLE → ln)."""
    from neo4j_webgraph_ray.pipelines.neighborhood import _mix64

    def partial(t: pa.Table) -> pa.Table:
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        keep = w > 0
        if not keep.all():
            t = t.filter(pa.array(keep))
            w = w[keep]
        ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False), np.int64)
        u = (_mix64(ids).astype(np.float64) + 1.0) * 2.0**-64
        ekey = -np.log(u) / w
        if len(ekey) > k:
            idx = np.argpartition(ekey, k)[:k]
            t = t.take(pa.array(idx, pa.int64()))
            ekey = ekey[idx]
        return t.append_column("ekey", pa.array(ekey, pa.float64()))

    return (
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .sort("ekey")
        .limit(k)
    )
