"""Neighborhood function, ball profiles and harmonic centrality — the
HyperBall family (Boldi–Vigna, "In-Core Computation of Geometric
Centralities with HyperBall", 2013; the signature WebGraph analytics).

For every vertex v the *ball* B(v, t) is the set of vertices within t
undirected hops.  One superstep grows every ball by one hop — a ball at
t+1 is the union of the neighbor balls at t — so the whole family runs
on the existing superstep harness with a set-union message instead of a
scalar:

- **Exact path** (``ExactBallProgram``, mode ``vecor``): each ball is a
  bitset over the global vertex order, messages combine by bitwise OR.
  Exact counts, state O(n²/8) total — the small-graph path, size-gated
  by the caller.
- **Scale path** (``HyperBallProgram``, mode ``vecmax``): each ball is
  an m-register HyperLogLog sketch (uint8 registers), messages combine
  by elementwise max.  State O(n·m) with m = 128 default (~9% relative
  error per ball) — the 10^9-vertex regime, where exact bitsets are
  impossible.  Fully deterministic: registers are a pure function of
  the fixed splitmix64 element hash, so results are
  partitioning-independent.

Both programs accumulate, per vertex, the running ball size and the
harmonic-centrality fold HC(v) = Σ_t |B(v,t) \\ B(v,t-1)| / t (floats
added in ascending-t order — the oracle mirrors the same fold order).
The per-hop neighborhood function N(t) = Σ_v |B(v,t)| comes out of the
superstep manifest metrics, one row per hop, so no extra pass is needed.

Reference contrast: the reference computes no distance statistics (its
query surface is one-shot Cypher scans, ``/root/reference/README.md:
72-166``); the neighborhood function is the canonical whole-graph
analytics its WebGraph namesake is known for.

State columns: ``id`` (int64), ``regs`` (binary — bitset or HLL
registers), ``cnt`` (float64 current ball size; exact path stores exact
integers in it), ``hc`` (float64 harmonic accumulator).  Registers are
(un)packed with ``np.frombuffer``/``tobytes`` — the one per-row Python
cost is the ``bytes`` repack on gather (O(changed rows)); the 10^9-
vertex upgrade path is a FixedSizeBinary Arrow state column, noted here
for when state no longer fits pandas comfortably.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from neo4j_webgraph_ray.state import fsio
from neo4j_webgraph_ray.state.checkpoint import load_manifest, state_dir
from neo4j_webgraph_ray.state.superstep import SuperstepEngine, VertexProgram

# -- register helpers --------------------------------------------------------

#: popcount lookup for exact bitset ball sizes (vectorized byte LUT)
_POPCOUNT = np.unpackbits(
    np.arange(256, dtype=np.uint8).reshape(-1, 1), axis=1
).sum(axis=1).astype(np.int64)

_SPLITMIX_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SPLITMIX_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SPLITMIX_M2 = np.uint64(0x94D049BB133111EB)


def _mix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer: int64 vertex ids -> uniform
    uint64 stream (fixed constants => deterministic across runs)."""
    with np.errstate(over="ignore"):
        z = x.astype(np.int64).view(np.uint64) + _SPLITMIX_GAMMA
        z = (z ^ (z >> np.uint64(30))) * _SPLITMIX_M1
        z = (z ^ (z >> np.uint64(27))) * _SPLITMIX_M2
        return z ^ (z >> np.uint64(31))


def _unpack_regs(col, width: int) -> np.ndarray:
    """binary state column -> (n, width) uint8 (one vectorized join)."""
    vals = list(col) if not isinstance(col, list) else col
    if not vals:
        return np.empty((0, width), dtype=np.uint8)
    return np.frombuffer(b"".join(vals), dtype=np.uint8).reshape(len(vals), width)


def _pack_regs(arr: np.ndarray) -> list[bytes]:
    return [r.tobytes() for r in arr]


def hll_init_registers(ids: np.ndarray, log2m: int) -> np.ndarray:
    """(n, m) uint8 HLL registers for single-element sketches {id}.

    Standard HLL add: low log2m hash bits pick the register, rho = #
    leading zeros + 1 of the next 52 bits (52 so the float64 frexp
    bit-length trick is exact; max register value 53 fits uint8)."""
    m = 1 << log2m
    h = _mix64(np.asarray(ids, dtype=np.int64))
    idx = (h & np.uint64(m - 1)).astype(np.int64)
    w = ((h >> np.uint64(log2m)) & np.uint64((1 << 52) - 1)).astype(np.float64)
    # frexp exponent == bit_length for integer-valued floats < 2^53
    bitlen = np.frexp(w)[1]
    rho = (52 - bitlen + 1).astype(np.uint8)  # w == 0 -> rho 53
    regs = np.zeros((len(h), m), dtype=np.uint8)
    regs[np.arange(len(h)), idx] = rho
    return regs


def hll_estimate(regs: np.ndarray) -> np.ndarray:
    """Row-wise HLL cardinality estimates for an (n, m) register block
    (classic Flajolet et al. estimator + linear-counting small-range
    correction; no large-range correction needed in a 64-bit space)."""
    n, m = regs.shape
    if n == 0:
        return np.empty(0, dtype=np.float64)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    inv_sum = np.power(2.0, -regs.astype(np.float64)).sum(axis=1)
    est = alpha * m * m / inv_sum
    zeros = (regs == 0).sum(axis=1)
    small = (est <= 2.5 * m) & (zeros > 0)
    if small.any():
        est[small] = m * np.log(m / zeros[small].astype(np.float64))
    return est


# -- vertex programs ---------------------------------------------------------


class _BallProgram(VertexProgram):
    """Shared gather logic: merge incoming ball vectors, re-count,
    accumulate the harmonic fold, report n_changed + nf_sum."""

    undirected = True  # distance semantics over the symmetrized graph

    def _counts(self, regs: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def _init_regs(self, ids: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def init_state(self, ids, out_deg, ctx):
        regs = self._init_regs(ids.astype(np.int64))
        return pd.DataFrame(
            {
                "id": ids.astype(np.int64),
                "regs": _pack_regs(regs),
                "cnt": self._counts(regs),
                "hc": np.zeros(len(ids), dtype=np.float64),
                "sd": np.zeros(len(ids), dtype=np.float64),
            }
        )

    def init_metrics(self, state):
        return {"nf_sum": float(state["cnt"].sum())}

    def scatter_values(self, state):
        return _unpack_regs(state["regs"], self.vec_width)

    def gather_update(self, state, reduced, ctx):
        regs = _unpack_regs(state["regs"], self.vec_width)
        combine = np.maximum if self.mode == "vecmax" else np.bitwise_or
        n_changed = 0
        if len(reduced):
            sids = state["id"].to_numpy()
            idx = np.searchsorted(sids, reduced["id"].to_numpy())
            inc = reduced.attrs["vec"]
            merged = combine(regs[idx], inc)
            changed = (merged != regs[idx]).any(axis=1)
            n_changed = int(changed.sum())
            if n_changed:
                regs = regs.copy()
                regs[idx[changed]] = merged[changed]
        new_cnt = self._counts(regs)
        old_cnt = state["cnt"].to_numpy()
        # registers only grow, so exact counts are monotone; clamp the
        # HLL estimator's correction-switch jitter to keep hc monotone
        delta = np.maximum(new_cnt - old_cnt, 0.0)
        t = float(ctx["step"] + 1)  # hop distance this superstep closes
        out = pd.DataFrame(
            {
                "id": state["id"].to_numpy(),
                "regs": _pack_regs(regs),
                "cnt": new_cnt,
                "hc": state["hc"].to_numpy() + delta / t,
                # sum of distances to the |delta| vertices first reached
                # at hop t (exact ints in float64 on the bitset path)
                "sd": state["sd"].to_numpy() + delta * t,
            }
        )
        return out, {"n_changed": float(n_changed), "nf_sum": float(new_cnt.sum())}

    def converged(self, m):
        return m.get("n_changed", 1) == 0


class ExactBallProgram(_BallProgram):
    """Exact neighborhood function by bitset union (mode ``vecor``).

    ``sorted_ids`` is the GLOBAL sorted array of edge-endpoint vertex
    ids — bit j stands for sorted_ids[j].  O(n/8) bytes per vertex, so
    the caller size-gates this path (``EXACT_NF_VERTEX_LIMIT`` in
    queries.py); the pre-aggregated exchange is ≤ P·n·vec_width bytes
    per superstep."""

    name = "exact_ball"
    mode = "vecor"

    def __init__(self, sorted_ids: np.ndarray):
        self.sorted_ids = np.asarray(sorted_ids, dtype=np.int64)
        self.vec_width = max(1, (len(self.sorted_ids) + 7) // 8)

    def config(self):
        # cheap identity for resume-refusal: size + endpoints fingerprint
        fp = int(np.bitwise_xor.reduce(self.sorted_ids)) if len(self.sorted_ids) else 0
        return {"kind": "exact", "n_ids": int(len(self.sorted_ids)), "ids_xor": fp}

    def _init_regs(self, ids):
        pos = np.searchsorted(self.sorted_ids, ids)
        regs = np.zeros((len(ids), self.vec_width), dtype=np.uint8)
        regs[np.arange(len(ids)), pos >> 3] = np.uint8(1) << (pos & 7).astype(np.uint8)
        return regs

    def _counts(self, regs):
        return _POPCOUNT[regs].sum(axis=1).astype(np.float64)


class HyperBallProgram(_BallProgram):
    """HyperBall: approximate neighborhood function by HLL-register max
    (mode ``vecmax``).  m = 2^log2m uint8 registers per vertex — the
    only state that scales is O(n·m), so this is the 100-TB path."""

    name = "hyperball"
    mode = "vecmax"

    def __init__(self, log2m: int = 7):
        self.log2m = log2m
        self.vec_width = 1 << log2m

    def config(self):
        return {"kind": "hll", "log2m": self.log2m}

    def _init_regs(self, ids):
        return hll_init_registers(ids, self.log2m)

    def _counts(self, regs):
        return hll_estimate(regs)


# -- public API ---------------------------------------------------------------


def ball_profile(
    edges: ray.data.Dataset,
    workdir: str,
    *,
    exact_ids: np.ndarray | None = None,
    log2m: int = 7,
    num_partitions: int = 16,
    max_steps: int = 64,
    run_metadata: dict | None = None,
    filesystem=None,
) -> tuple[pd.DataFrame, ray.data.Dataset]:
    """Run a ball program to convergence over the undirected simple
    view of ``edges`` (int64 ``src``/``dst``).

    Returns ``(hops, state)``:

    - ``hops``: DataFrame (hop, nf) — the neighborhood function N(t) =
      number of ordered vertex pairs within t hops (including the n
      self-pairs at hop 0), one row per hop 0..diameter.  Read straight
      from the superstep manifest metrics: hop 0 is the init row, hop t
      the t-th superstep's ``nf_sum``; converged-confirming steps (no
      register changed) are trimmed so the series ends at the diameter.
    - ``state``: Dataset (id, cnt, hc, sd) — final ball size, harmonic
      centrality and sum-of-distances (the closeness denominator) per
      edge-endpoint vertex (column-pruned read; the register column
      never leaves the workdir).

    ``exact_ids`` (the global sorted endpoint-id array) selects the
    exact bitset program; otherwise the HyperBall sketch program with
    ``2^log2m`` registers runs.  Vector programs are Dataset-backend
    only (the CSR actor backend refuses them with a clear error)."""
    program: _BallProgram = (
        ExactBallProgram(exact_ids) if exact_ids is not None else HyperBallProgram(log2m)
    )
    engine = SuperstepEngine(
        workdir, program, num_partitions=num_partitions, max_steps=max_steps,
        run_metadata=run_metadata, filesystem=filesystem,
    )
    engine.prepare(edges)
    engine.run()
    manifest = load_manifest(workdir, fs=filesystem)
    # an empty graph has no pairs at any hop: emit an empty series
    # (matching the SQL oracle's empty all-pairs table)
    rows = (
        [(0, manifest.steps[0].get("nf_sum", 0.0))]
        if manifest.steps[0]["n_vertices"]
        else []
    )
    for s in manifest.steps[1:]:
        if s.get("n_changed", 0) > 0:
            rows.append((s["step"], s["nf_sum"]))
    hops = pd.DataFrame(rows, columns=["hop", "nf"])
    hops["hop"] = hops["hop"].astype(np.int64)
    last_step = manifest.steps[-1]["step"]
    state = fsio.ray_read_parquet(
        state_dir(workdir, last_step),
        fs=filesystem,
        columns=["id", "cnt", "hc", "sd"],
    )
    return hops, state
