"""Graph algorithms as vertex programs on the superstep harness.

All four analytics the north rule requires — PageRank, connected
components, label propagation, triangle counting (triangles live in
``pipelines/triangles.py`` as a non-iterative join pipeline) — built
from scratch as groupby-aggregate shuffles.  The reference offers no
iterative analytics (its query surface is one-shot Cypher,
``README.md:72-166``); these are the new engine's core capability over
the same graph model.

Determinism notes (SURVEY.md §7.5):
- PageRank float summation order varies with partitioning; the 1e-6
  convergence tolerance absorbs re-association (validated against a
  dense NumPy power iteration with ``allclose(atol=1e-6)``).
- CC labels are exact min vertex-ids — order-insensitive.
- LPA tie-breaks deterministically by smaller label; synchronous
  updates, so results are partitioning-independent (exact-match vs the
  single-node oracle).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from neo4j_webgraph_ray.state.superstep import SuperstepEngine, VertexProgram


def _aligned_agg(
    state: pd.DataFrame, reduced: pd.DataFrame, default
) -> np.ndarray:
    """Positional left-join of reduced messages onto state: state is
    sorted by id and reduced ids are a (usually small) subset, so a
    searchsorted scatter beats a pandas merge by orders of magnitude on
    large partitions."""
    sids = state["id"].to_numpy()
    out = np.full(len(sids), default, dtype=np.asarray(default).dtype)
    if len(reduced):
        idx = np.searchsorted(sids, reduced["id"].to_numpy())
        out[idx] = reduced["agg"].to_numpy()
    return out


class PageRankProgram(VertexProgram):
    """Standard damped PageRank with dangling-mass redistribution.

    rank' = (1-d)/n + d * (sum_in + dangling/n); stop at L∞ delta < tol.
    Dangling mass is carried between supersteps through the manifest
    metrics (``update_ctx``), so a resumed run continues exactly.
    """

    name = "pagerank"
    undirected = False
    mode = "sum"

    def __init__(self, damping: float = 0.85, tol: float = 1e-6):
        self.damping = damping
        self.tol = tol

    def config(self):
        return {"damping": self.damping, "tol": self.tol}

    def init_state(self, ids, out_deg, ctx):
        n = max(ctx["n"], 1)
        return pd.DataFrame(
            {
                "id": ids.astype(np.int64),
                "out_deg": out_deg.astype(np.int64),
                "rank": np.full(len(ids), 1.0 / n, dtype=np.float64),
            }
        )

    def init_metrics(self, state):
        dangling = float(state.loc[state["out_deg"] == 0, "rank"].sum())
        return {"dangling": dangling}

    def payload_stats(self, state):
        return {"dangling": float(state.loc[state["out_deg"] == 0, "rank"].sum())}

    def scatter_values(self, state):
        out_deg = state["out_deg"].to_numpy().astype(np.float64)
        rank = state["rank"].to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            v = np.where(out_deg > 0, rank / out_deg, 0.0)
        return v

    def gather_update(self, state, reduced, ctx):
        n = max(ctx["n"], 1)
        d = self.damping
        dangling_in = ctx.get("dangling", 0.0)
        sums = _aligned_agg(state, reduced, np.float64(0.0))
        old = state["rank"].to_numpy()
        new = (1.0 - d) / n + d * (sums + dangling_in / n)
        out = state.copy(deep=False)
        out["rank"] = new
        delta = float(np.max(np.abs(new - old))) if len(new) else 0.0
        dangling_out = float(new[state["out_deg"].to_numpy() == 0].sum())
        return out, {"max_delta": delta, "dangling": dangling_out}

    def converged(self, m):
        return m.get("max_delta", np.inf) < self.tol

    def update_ctx(self, ctx, step_metrics):
        if "dangling" in step_metrics:
            ctx["dangling"] = step_metrics["dangling"]


class WeightedPageRankProgram(PageRankProgram):
    """PageRank over edge-weighted graphs: rank mass splits along
    out-edges in proportion to edge weight —
    rank' = (1-d)/n + d·(Σ_in w_uv·rank_u/W_u + dangling/n), W_u = out-
    weight sum.  Relies on the engine's weighted-edge support: prepare
    carries the input's ``weight`` column into the partition files,
    sum-mode scatter multiplies each message by its edge weight, and
    ``out_deg`` arrives as the float64 out-WEIGHT sum (kept as float —
    the parent's int64 cast would truncate fractional weights).
    Dangling = vertices with zero out-weight, redistributed uniformly
    (the parent's recurrence, carried through the same ctx channel)."""

    name = "weighted_pagerank"

    def init_state(self, ids, out_deg, ctx):
        n = max(ctx["n"], 1)
        return pd.DataFrame(
            {
                "id": ids.astype(np.int64),
                "out_deg": np.asarray(out_deg, dtype=np.float64),
                "rank": np.full(len(ids), 1.0 / n, dtype=np.float64),
            }
        )

    def scatter_values(self, state):
        out_w = state["out_deg"].to_numpy()
        rank = state["rank"].to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            # per-vertex value; the engine multiplies by each edge's w
            return np.where(out_w > 0, rank / out_w, 0.0)


class ConnectedComponentsProgram(VertexProgram):
    """Min-label propagation to fixpoint over the undirected graph.
    Labels are vertex ids; the final label of each vertex is the
    minimum vertex id in its (weakly) connected component — exact."""

    name = "connected_components"
    undirected = True
    mode = "min"

    def config(self):
        return {}

    def init_state(self, ids, out_deg, ctx):
        return pd.DataFrame(
            {"id": ids.astype(np.int64), "label": ids.astype(np.int64)}
        )

    def scatter_values(self, state):
        return state["label"].to_numpy()

    def gather_update(self, state, reduced, ctx):
        incoming = _aligned_agg(
            state, reduced, np.int64(np.iinfo(np.int64).max)
        ).astype(np.int64)
        old = state["label"].to_numpy()
        new = np.minimum(old, incoming)
        out = state.copy(deep=False)
        out["label"] = new
        return out, {"n_changed": int((new != old).sum())}

    def converged(self, m):
        return m.get("n_changed", 1) == 0


class LabelPropagationProgram(VertexProgram):
    """Synchronous label propagation (community detection).

    Each vertex adopts the most frequent label among its neighbours
    (undirected), ties broken by the smaller label; isolated vertices
    keep their label.  Deterministic and partitioning-independent by
    construction; runs to label-stability or max_steps (synchronous LPA
    can oscillate on bipartite structures — the step cap is part of the
    algorithm spec, mirrored by the oracle)."""

    name = "label_propagation"
    undirected = True
    mode = "mode"

    def config(self):
        return {}

    def init_state(self, ids, out_deg, ctx):
        return pd.DataFrame(
            {"id": ids.astype(np.int64), "label": ids.astype(np.int64)}
        )

    def scatter_values(self, state):
        return state["label"].to_numpy()

    def gather_update(self, state, reduced, ctx):
        # reduced: (id, lab, wt) — pick per id: max wt, tie -> min lab
        old = state["label"].to_numpy()
        if len(reduced):
            r = reduced.sort_values(
                ["id", "wt", "lab"], ascending=[True, False, True], kind="stable"
            ).drop_duplicates("id", keep="first")
            new = old.copy()
            idx = np.searchsorted(
                state["id"].to_numpy(), r["id"].to_numpy()
            )
            new[idx] = r["lab"].to_numpy().astype(np.int64)
        else:
            new = old
        out = state.copy(deep=False)
        out["label"] = new
        return out, {"n_changed": int((new != old).sum())}

    def converged(self, m):
        return m.get("n_changed", 1) == 0


class PersonalizedPageRankProgram(VertexProgram):
    """Personalized PageRank: teleport mass goes to a seed distribution
    instead of uniformly to all vertices.

    rank' = (1-d)*pref(v) + d*(sum_in + dangling*pref(v)), where pref is
    1/|S| on the seed set and 0 elsewhere — the standard PPR recurrence
    with dangling mass redistributed to the seeds (so total mass is
    conserved and the iterate stays a distribution).  Seeds ship as a
    sorted int64 id array inside the program (a few ids — not a
    broadcast concern); membership per partition is one searchsorted.
    """

    name = "ppr"
    undirected = False
    mode = "sum"

    def __init__(self, seed_ids: np.ndarray, damping: float = 0.85,
                 tol: float = 1e-6):
        self.seed_ids = np.sort(np.asarray(seed_ids, dtype=np.int64))
        if len(self.seed_ids) == 0:
            raise ValueError("personalized pagerank needs >= 1 seed id")
        self.damping = damping
        self.tol = tol

    def config(self):
        return {
            "damping": self.damping, "tol": self.tol,
            "seeds": [int(s) for s in self.seed_ids],
        }

    def _pref(self, ids: np.ndarray) -> np.ndarray:
        s = self.seed_ids
        pos = np.minimum(np.searchsorted(s, ids), len(s) - 1)
        is_seed = s[pos] == ids
        return np.where(is_seed, 1.0 / len(s), 0.0)

    def init_state(self, ids, out_deg, ctx):
        pref = self._pref(ids.astype(np.int64))
        return pd.DataFrame(
            {
                "id": ids.astype(np.int64),
                "out_deg": out_deg.astype(np.int64),
                "pref": pref,
                "rank": pref.copy(),
            }
        )

    def init_metrics(self, state):
        return {"dangling": float(
            state.loc[state["out_deg"] == 0, "rank"].sum())}

    def payload_stats(self, state):
        return {"dangling": float(
            state.loc[state["out_deg"] == 0, "rank"].sum())}

    def scatter_values(self, state):
        out_deg = state["out_deg"].to_numpy().astype(np.float64)
        rank = state["rank"].to_numpy()
        with np.errstate(divide="ignore", invalid="ignore"):
            return np.where(out_deg > 0, rank / out_deg, 0.0)

    def gather_update(self, state, reduced, ctx):
        d = self.damping
        dangling_in = ctx.get("dangling", 0.0)
        sums = _aligned_agg(state, reduced, np.float64(0.0))
        pref = state["pref"].to_numpy()
        old = state["rank"].to_numpy()
        new = (1.0 - d) * pref + d * (sums + dangling_in * pref)
        out = state.copy(deep=False)
        out["rank"] = new
        delta = float(np.max(np.abs(new - old))) if len(new) else 0.0
        dangling_out = float(new[state["out_deg"].to_numpy() == 0].sum())
        return out, {"max_delta": delta, "dangling": dangling_out}

    def converged(self, m):
        return m.get("max_delta", np.inf) < self.tol

    def update_ctx(self, ctx, step_metrics):
        if "dangling" in step_metrics:
            ctx["dangling"] = step_metrics["dangling"]


#: "not reached yet" distance sentinel — far above any real hop count,
#: far below int64 max so min_in + 1 can never wrap.
BFS_UNREACHED = np.int64(1) << 62


class BFSDistanceProgram(VertexProgram):
    """Single-source hop distance over the undirected graph (min-mode
    frontier relaxation): dist' = min(dist, min_in + 1).  Vertices never
    reached keep :data:`BFS_UNREACHED`; converges when no distance
    changes (<= diameter+1 supersteps)."""

    name = "bfs"
    undirected = True
    mode = "min"

    def __init__(self, seed_ids: np.ndarray):
        self.seed_ids = np.sort(np.asarray(seed_ids, dtype=np.int64))
        if len(self.seed_ids) == 0:
            raise ValueError("bfs needs >= 1 seed id")

    def config(self):
        return {"seeds": [int(s) for s in self.seed_ids]}

    def init_state(self, ids, out_deg, ctx):
        ids64 = ids.astype(np.int64)
        s = self.seed_ids
        pos = np.minimum(np.searchsorted(s, ids64), len(s) - 1)
        is_seed = s[pos] == ids64
        return pd.DataFrame(
            {
                "id": ids64,
                "dist": np.where(is_seed, np.int64(0), BFS_UNREACHED),
            }
        )

    def scatter_values(self, state):
        return state["dist"].to_numpy()

    def gather_update(self, state, reduced, ctx):
        incoming = _aligned_agg(state, reduced, BFS_UNREACHED).astype(np.int64)
        old = state["dist"].to_numpy()
        new = np.minimum(old, np.minimum(incoming + 1, BFS_UNREACHED))
        out = state.copy(deep=False)
        out["dist"] = new
        return out, {"n_changed": int((new != old).sum())}

    def converged(self, m):
        return m.get("n_changed", 1) == 0


class WeightedSSSPProgram(BFSDistanceProgram):
    """Single-source shortest path over INTEGER edge weights — the
    min-plus semiring on the superstep engine (distributed
    Bellman–Ford relaxation): the scatter message is dist + w(edge)
    (``weighted_min`` — the engine adds the edge weight per edge
    before the min pre-aggregation), gather takes the plain min (no
    +1).  Unreached vertices keep :data:`BFS_UNREACHED`; converges
    when no distance changes (≤ #hops of the longest shortest path
    supersteps).  Float weights are truncated to int64 by engine
    contract so both backends stay bit-identical."""

    name = "sssp"
    undirected = True
    mode = "min"
    weighted_min = True

    def gather_update(self, state, reduced, ctx):
        incoming = _aligned_agg(state, reduced, BFS_UNREACHED).astype(np.int64)
        old = state["dist"].to_numpy()
        new = np.minimum(old, np.minimum(incoming, BFS_UNREACHED))
        out = state.copy(deep=False)
        out["dist"] = new
        return out, {"n_changed": int((new != old).sum())}


class DirectedMinLabelProgram(ConnectedComponentsProgram):
    """Min-label propagation along edge DIRECTION to fixpoint:
    label(v) = min vertex id that forward-reaches v (including v).
    This is the forward "coloring" phase of FW-BW-coloring SCC
    (Fleischer–Hendrickson–Pinar / Orzan): every color class is closed
    under forward reachability from its root, and the root's SCC is
    entirely inside its own class (proof in q_scc's docstring)."""

    name = "dmin"
    undirected = False


class DirectedBFSProgram(BFSDistanceProgram):
    """Multi-source hop distance along edge DIRECTION (the backward
    phase of FW-BW-coloring SCC runs this over the REVERSED same-color
    subgraph, so "reached" = backward-reachable from a color root
    within its class)."""

    name = "dbfs"
    undirected = False

    def config(self):
        # SCC seeds one root per color class — the set can be O(n);
        # store a fingerprint so the manifest stays O(1) (the parent
        # class embeds the full seed list, fine for its few-seed uses)
        import hashlib

        return {
            "n_seeds": int(len(self.seed_ids)),
            "seeds_sha": hashlib.sha1(self.seed_ids.tobytes()).hexdigest()[:16],
        }


class HITSProgram(VertexProgram):
    """HITS hubs & authorities (Kleinberg) as power iteration on the
    bipartite DOUBLED graph.

    The superstep engine scatters in one fixed edge direction per run,
    but each HITS iteration needs both directions (auth gathers hub
    scores over in-edges, hub gathers auth scores over out-edges).
    Instead of a second reversed CSR, callers feed the doubled graph:
    every original edge (u, v) becomes

        2u   -> 2v+1   (hub side of u feeds the auth side of v)
        2v+1 -> 2u     (auth side of v feeds the hub side of u)

    over DENSE vertex ranks (so 2r+1 cannot overflow int64 — the query
    layer reuses LPA's distributed dense_rank_vkeys remap).  One
    superstep on the doubled graph is then exactly one simultaneous
    HITS update — power iteration on the block matrix [[0, E], [E^T, 0]]:

        a_{t+1}(v) = sum_{u->v} h_t(u) / ||h_t||_1
        h_{t+1}(u) = sum_{u->v} a_t(v) / ||a_t||_1

    with L1 normalization applied lazily at gather time: the per-side
    sums ride the manifest-metrics channel exactly like PageRank's
    dangling mass (``payload-free``: gather emits the side sums of the
    NEW values as step metrics, the engine sums them across partitions,
    ``update_ctx`` makes them the next step's divisors).  Values stay
    non-negative, and every doubled node has in-degree >= 1 by
    construction, so the side sums stay strictly positive on any graph
    with >= 1 edge (divisors still guarded).

    Reference contrast: the reference's Cypher surface ranks pages by
    raw in-degree only (``/root/reference/README.md:72-166``); HITS is
    the canonical webgraph refinement of that query.  Run with
    ``tol=0.0`` + a fixed step budget for oracle-parity (same pattern
    as the fixed-step PageRank entry)."""

    name = "hits"
    undirected = False
    mode = "sum"

    def __init__(self, tol: float = 0.0):
        self.tol = tol

    def config(self):
        return {"tol": self.tol}

    @staticmethod
    def _side_sums(ids: np.ndarray, vals: np.ndarray) -> dict[str, float]:
        odd = (ids & 1).astype(bool)
        return {
            "hub_sum": float(vals[~odd].sum()),
            "auth_sum": float(vals[odd].sum()),
        }

    def init_state(self, ids, out_deg, ctx):
        # a hub node 2u exists iff u has an out-edge, an auth node 2v+1
        # iff v has an in-edge — so val=1 on present nodes IS the
        # "h0=1 where outdeg>0, a0=1 where indeg>0" init the oracle uses
        return pd.DataFrame(
            {
                "id": ids.astype(np.int64),
                "val": np.ones(len(ids), dtype=np.float64),
            }
        )

    def init_metrics(self, state):
        return self._side_sums(state["id"].to_numpy(), state["val"].to_numpy())

    def payload_stats(self, state):
        # actors backend: gather ctx = payload stats of the CURRENT
        # state summed over the wave's bundles (the dangling-mass
        # channel); Dataset backend reaches the same values through
        # update_ctx replay of the previous step's gather metrics
        return self._side_sums(state["id"].to_numpy(), state["val"].to_numpy())

    def scatter_values(self, state):
        return state["val"].to_numpy()

    def gather_update(self, state, reduced, ctx):
        ids = state["id"].to_numpy()
        sums = _aligned_agg(state, reduced, np.float64(0.0))
        hsum = ctx.get("hub_sum", 0.0)
        asum = ctx.get("auth_sum", 0.0)
        odd = (ids & 1).astype(bool)
        # messages INTO an auth node are hub values (divide by the hub
        # L1 norm); messages into a hub node are auth values
        denom = np.where(odd, hsum, asum)
        with np.errstate(divide="ignore", invalid="ignore"):
            new = np.where(denom > 0, sums / denom, 0.0)
        old = state["val"].to_numpy()
        out = state.copy(deep=False)
        out["val"] = new
        delta = float(np.max(np.abs(new - old))) if len(new) else 0.0
        return out, {"max_delta": delta, **self._side_sums(ids, new)}

    def converged(self, m):
        return m.get("max_delta", np.inf) < self.tol

    def update_ctx(self, ctx, step_metrics):
        if "hub_sum" in step_metrics:
            ctx["hub_sum"] = step_metrics["hub_sum"]
            ctx["auth_sum"] = step_metrics["auth_sum"]


class EigenvectorProgram(VertexProgram):
    """Eigenvector centrality: power iteration on the simple undirected
    adjacency matrix, x' = A (x / ||x||_1), with the L1 norm applied
    lazily at gather time exactly like :class:`HITSProgram` — the
    stored iterate stays "raw" and the norm of the CURRENT state rides
    the manifest-metrics channel (``payload_stats`` on the actors
    backend, ``update_ctx`` replay on the Dataset backend).  Dividing
    by Σx_t instead of re-normalizing in place keeps x_t ∝ A^t·1 with
    the scale tracked by the running norm, so the iteration is
    numerically stable and the final driver-side L1 normalization
    recovers the centrality vector.

    Callers feed the SIMPLE undirected graph (each unordered edge once,
    self-loops dropped — ``triangles.undirected_simple``); the engine's
    ``undirected=True`` doubling turns each pair into both directions,
    so one superstep is exactly one symmetric-matrix multiply.  Every
    simple-graph endpoint has degree >= 1, so x stays strictly positive
    and the norm guard never fires on a non-empty graph.

    Run with ``tol=0.0`` + a fixed step budget for oracle-parity (the
    unrolled-SQL pattern of HITS/PageRank), or a positive tol for the
    production L∞ stop.

    Reference contrast: the reference's Cypher surface ranks pages by
    raw in-degree only (``/root/reference/README.md:103-131``);
    eigenvector centrality is the classic recursive refinement of that
    query (a page is important if important pages link to it) and the
    direct ancestor of the PageRank entry this engine's north rule
    names."""

    name = "eigenvector"
    undirected = True
    mode = "sum"

    def __init__(self, tol: float = 0.0):
        self.tol = tol

    def config(self):
        return {"tol": self.tol}

    def init_state(self, ids, out_deg, ctx):
        return pd.DataFrame(
            {
                "id": ids.astype(np.int64),
                "val": np.ones(len(ids), dtype=np.float64),
            }
        )

    def init_metrics(self, state):
        return {"x_sum": float(state["val"].to_numpy().sum())}

    def payload_stats(self, state):
        return {"x_sum": float(state["val"].to_numpy().sum())}

    def scatter_values(self, state):
        return state["val"].to_numpy()

    def gather_update(self, state, reduced, ctx):
        sums = _aligned_agg(state, reduced, np.float64(0.0))
        xs = ctx.get("x_sum", 0.0)
        new = sums / xs if xs > 0 else sums
        old = state["val"].to_numpy()
        out = state.copy(deep=False)
        out["val"] = new
        delta = float(np.max(np.abs(new - old))) if len(new) else 0.0
        return out, {"max_delta": delta, "x_sum": float(new.sum())}

    def converged(self, m):
        return m.get("max_delta", np.inf) < self.tol

    def update_ctx(self, ctx, step_metrics):
        if "x_sum" in step_metrics:
            ctx["x_sum"] = step_metrics["x_sum"]


class KatzProgram(VertexProgram):
    """Katz centrality on the DIRECTED graph: x' = α·Aᵀx + 1, i.e.
    x(v) counts walks arriving at v, each damped by α per hop —
    x = Σ_k α^k (Aᵀ)^k·1 at convergence (α below 1/λmax).  The classic
    in-link centrality between raw in-degree (α→0) and eigenvector
    centrality (α→1/λmax); like those entries it runs a fixed step
    budget for oracle parity, and the contract query L1-normalizes the
    final iterate so the 6-dp rounding is robust to fp summation order
    even when α is above the spectral bound for some input.

    No normalization channel is needed (the +1 offset anchors the
    scale), so the program is pure sum-mode gather with a constant
    affine update — the simplest member of the power-iteration family
    here.

    Reference contrast: the reference ranks pages by raw in-degree
    (``/root/reference/README.md:103-131``); Katz is the damped
    all-walk generalization of exactly that count."""

    name = "katz"
    undirected = False
    mode = "sum"

    def __init__(self, alpha: float = 0.05, tol: float = 0.0):
        self.alpha = float(alpha)
        self.tol = tol

    def config(self):
        return {"alpha": self.alpha, "tol": self.tol}

    def init_state(self, ids, out_deg, ctx):
        return pd.DataFrame(
            {
                "id": ids.astype(np.int64),
                "val": np.ones(len(ids), dtype=np.float64),
            }
        )

    def scatter_values(self, state):
        return state["val"].to_numpy()

    def gather_update(self, state, reduced, ctx):
        sums = _aligned_agg(state, reduced, np.float64(0.0))
        new = self.alpha * sums + 1.0
        old = state["val"].to_numpy()
        out = state.copy(deep=False)
        out["val"] = new
        delta = float(np.max(np.abs(new - old))) if len(new) else 0.0
        return out, {"max_delta": delta}

    def converged(self, m):
        return m.get("max_delta", np.inf) < self.tol


def _aligned_vec(
    state: pd.DataFrame, reduced: pd.DataFrame, lanes: int
) -> np.ndarray:
    """(n, lanes) float64 scatter of vecsum-reduced messages onto the
    id-sorted state (zeros where no message arrived)."""
    sids = state["id"].to_numpy()
    out = np.zeros((len(sids), lanes), np.float64)
    if len(reduced):
        idx = np.searchsorted(sids, reduced["id"].to_numpy())
        out[idx] = reduced.attrs["vec"]
    return out


class BrandesForwardProgram(VertexProgram):
    """Brandes betweenness, forward phase: synchronous multi-source BFS
    with shortest-path counting, ALL k sources at once as vecsum lanes
    (one float64 lane per source — a single run replaces k per-source
    runs, so the edge set is partitioned once and every superstep ships
    one k-lane message per (partition, dst)).

    Per lane j: dist d_j, path count s_j (σ), and the precomputed next
    scatter e_j (σ of just-discovered vertices — scatter_values has no
    step context, so the gather at step t writes the frontier the step
    t+1 scatter must send).  σ is exact in float64 up to 2^53 paths
    (the standard Brandes implementation choice; beyond that the counts
    degrade gracefully to floats).

    Reference contrast: the reference's Cypher surface has no path
    analytics at all (``/root/reference/README.md:72-166``)."""

    name = "brandes_fwd"
    undirected = True
    mode = "vecsum"

    def __init__(self, seed_ids: np.ndarray):
        self.seed_ids = np.sort(np.asarray(seed_ids, dtype=np.int64))
        if not len(self.seed_ids):
            raise ValueError("brandes needs >= 1 source")
        if len(self.seed_ids) > 64:
            raise ValueError("brandes lanes capped at 64 per run — batch "
                             "larger samples across runs")
        self.k = len(self.seed_ids)
        self.vec_width = 8 * self.k

    def config(self):
        import hashlib

        return {
            "k": self.k,
            "seeds_sha": hashlib.sha1(self.seed_ids.tobytes()).hexdigest()[:16],
        }

    def init_state(self, ids, out_deg, ctx):
        ids64 = ids.astype(np.int64)
        cols = {"id": ids64}
        for j, s in enumerate(self.seed_ids):
            is_s = ids64 == s
            cols[f"d{j}"] = np.where(is_s, np.int64(0), BFS_UNREACHED)
            sig = is_s.astype(np.float64)
            cols[f"s{j}"] = sig
            cols[f"e{j}"] = sig.copy()
        return pd.DataFrame(cols)

    def scatter_values(self, state):
        return np.ascontiguousarray(
            np.column_stack([state[f"e{j}"].to_numpy() for j in range(self.k)])
        )

    def gather_update(self, state, reduced, ctx):
        step = ctx["step"]
        sums = _aligned_vec(state, reduced, self.k)
        out = state.copy(deep=False)
        n_changed = 0
        for j in range(self.k):
            d = state[f"d{j}"].to_numpy()
            newly = (d == BFS_UNREACHED) & (sums[:, j] > 0)
            out[f"d{j}"] = np.where(newly, np.int64(step + 1), d)
            out[f"s{j}"] = np.where(newly, sums[:, j], state[f"s{j}"].to_numpy())
            out[f"e{j}"] = np.where(newly, sums[:, j], 0.0)
            n_changed += int(newly.sum())
        return out, {"n_changed": n_changed}

    def converged(self, m):
        return m.get("n_changed", 1) == 0


class BrandesBackwardProgram(VertexProgram):
    """Brandes betweenness, backward phase: level-synchronized
    dependency accumulation over the same k vecsum lanes.

    Lane j replays its BFS levels top-down — at superstep t the senders
    are the vertices at level Lmax_j - t, emitting (1 + δ)/σ; receivers
    one level up accept (in an unweighted graph every edge between
    consecutive BFS levels is a shortest-path-DAG edge) and fold
    δ += σ·Σ_in.  Runs exactly max(Lmax) supersteps.  Initial state is
    the forward run's final state, read per partition from its workdir
    (same id-hash partitioning, asserted on load)."""

    name = "brandes_bwd"
    undirected = True
    mode = "vecsum"

    def __init__(
        self,
        seed_ids: np.ndarray,
        fwd_workdir: str,
        fwd_step: int,
        lmax: np.ndarray,
        num_partitions: int,
        filesystem=None,
    ):
        self.seed_ids = np.sort(np.asarray(seed_ids, dtype=np.int64))
        self.k = len(self.seed_ids)
        self.vec_width = 8 * self.k
        self.fwd_workdir = fwd_workdir
        self.fwd_step = int(fwd_step)
        self.lmax = np.asarray(lmax, dtype=np.int64)
        self.num_partitions = int(num_partitions)
        self.fs = filesystem

    def config(self):
        import hashlib

        return {
            "k": self.k,
            "seeds_sha": hashlib.sha1(self.seed_ids.tobytes()).hexdigest()[:16],
            "fwd_step": self.fwd_step,
            "lmax": [int(x) for x in self.lmax],
        }

    def init_state(self, ids, out_deg, ctx):
        from neo4j_webgraph_ray.state import fsio
        from neo4j_webgraph_ray.state.checkpoint import state_dir

        ids64 = ids.astype(np.int64)
        part = int(ids64[0] % self.num_partitions)
        path = fsio.join(
            state_dir(self.fwd_workdir, self.fwd_step), f"part={part}.parquet"
        )
        fwd = fsio.read_table(path, fs=self.fs).to_pandas()
        if not np.array_equal(fwd["id"].to_numpy(), ids64):
            raise RuntimeError(
                "brandes backward: forward state partitioning mismatch "
                f"(part {part})"
            )
        cols = {"id": ids64}
        for j in range(self.k):
            d = fwd[f"d{j}"].to_numpy()
            s = fwd[f"s{j}"].to_numpy()
            cols[f"d{j}"] = d
            cols[f"s{j}"] = s
            cols[f"delta{j}"] = np.zeros(len(ids64), np.float64)
            top = (d == self.lmax[j]) & (s > 0)
            with np.errstate(divide="ignore", invalid="ignore"):
                cols[f"e{j}"] = np.where(top, 1.0 / np.where(s > 0, s, 1.0), 0.0)
        return pd.DataFrame(cols)

    def scatter_values(self, state):
        return np.ascontiguousarray(
            np.column_stack([state[f"e{j}"].to_numpy() for j in range(self.k)])
        )

    def gather_update(self, state, reduced, ctx):
        step = ctx["step"]
        sums = _aligned_vec(state, reduced, self.k)
        out = state.copy(deep=False)
        for j in range(self.k):
            rec = self.lmax[j] - step - 1
            if rec < 0:
                out[f"e{j}"] = np.zeros(len(state), np.float64)
                continue
            d = state[f"d{j}"].to_numpy()
            s = state[f"s{j}"].to_numpy()
            delta = state[f"delta{j}"].to_numpy()
            upd = d == rec
            new_delta = np.where(upd, delta + s * sums[:, j], delta)
            out[f"delta{j}"] = new_delta
            with np.errstate(divide="ignore", invalid="ignore"):
                out[f"e{j}"] = np.where(
                    upd & (s > 0), (1.0 + new_delta) / np.where(s > 0, s, 1.0),
                    0.0,
                )
        return out, {"n_changed": 0}

    def converged(self, m):
        return False  # runs exactly max(Lmax) steps (engine max_steps)


#: "no message" sentinel for MIS phases (min-mode identity)
MIS_MSG_NONE = np.int64(np.iinfo(np.int64).max)


class MISProgram(VertexProgram):
    """Maximal independent set by greedy priority rounds (the
    deterministic-priority variant of Luby's algorithm).

    Vertex priority = its id (callers remap ids to the priority order
    they want — the query entry uses dense lexicographic vkey ranks so
    the SQL oracle can compare plain strings; production graphs should
    remap to hash ranks instead, since adversarial priority orders cost
    O(n) rounds while pseudo-random ones converge in O(log n) w.h.p.).
    Input must be the SIMPLE graph without self-loops (a self-looped
    vertex would deadlock phase A; loop semantics are excluded by the
    operator's definition, matching the oracle's simple view).

    One round = two min-mode supersteps, phase by step parity:
      A (even): active vertices exchange priorities; an active vertex
        strictly below every active neighbor joins the MIS.
      B (odd): new MIS members announce; active neighbors become
        covered.
    The globally minimal active vertex always joins in phase A, so the
    loop terminates; converged when no vertex is active.  Scatter
    payloads for the NEXT phase are precomputed in gather (the engine's
    scatter has no step context — same pattern as the Brandes lanes)."""

    name = "mis"
    undirected = True
    mode = "min"

    def config(self):
        return {}

    def init_state(self, ids, out_deg, ctx):
        ids64 = ids.astype(np.int64)
        return pd.DataFrame(
            {
                "id": ids64,
                "status": np.zeros(len(ids64), np.int8),  # 0 active
                "emit": ids64.copy(),  # phase A: priorities
            }
        )

    def init_metrics(self, state):
        return {"n_active": float((state["status"].to_numpy() == 0).sum())}

    def scatter_values(self, state):
        return state["emit"].to_numpy()

    def gather_update(self, state, reduced, ctx):
        step = ctx["step"]
        min_in = _aligned_agg(state, reduced, MIS_MSG_NONE).astype(np.int64)
        ids = state["id"].to_numpy()
        status = state["status"].to_numpy().copy()
        out = state.copy(deep=False)
        if step % 2 == 0:  # phase A: join decisions
            join = (status == 0) & (ids < min_in)
            status[join] = 1
            emit = np.where(status == 1, ids, MIS_MSG_NONE)
        else:  # phase B: cover neighbors of new MIS members
            covered = (status == 0) & (min_in < MIS_MSG_NONE)
            status[covered] = 2
            emit = np.where(status == 0, ids, MIS_MSG_NONE)
        out["status"] = status
        out["emit"] = emit
        return out, {"n_active": float((status == 0).sum())}

    def converged(self, m):
        return m.get("n_active", 1.0) == 0.0


class KCoreProgram(VertexProgram):
    """k-core membership by distributed iterative peeling.

    State per vertex: residual degree within the surviving subgraph and
    an alive flag.  Each superstep, vertices that died in the previous
    step scatter a unit "I left" message along their (undirected,
    multiset — matching prepare's undirected doubling) edges; gather
    subtracts the incoming count from the residual degree and kills any
    survivor that drops below k.  Fixpoint = no deaths; survivors are
    exactly the k-core (maximal subgraph with min degree >= k)."""

    name = "kcore"
    undirected = True
    mode = "sum"

    def __init__(self, k: int = 2):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)

    def config(self):
        return {"k": self.k}

    def init_state(self, ids, out_deg, ctx):
        deg = out_deg.astype(np.int64)  # symmetrized degree (undirected)
        alive = deg >= self.k
        return pd.DataFrame(
            {
                "id": ids.astype(np.int64),
                "deg": deg,
                "alive": alive,
                # the initial sub-k vertices die at step 0 and announce
                # their departure in the first scatter
                "died_now": ~alive,
            }
        )

    def scatter_values(self, state):
        return state["died_now"].to_numpy().astype(np.float64)

    def gather_update(self, state, reduced, ctx):
        loss = _aligned_agg(state, reduced, np.float64(0.0))
        deg = state["deg"].to_numpy() - loss.astype(np.int64)
        alive = state["alive"].to_numpy()
        newly_dead = alive & (deg < self.k)
        out = state.copy(deep=False)
        out["deg"] = deg
        out["alive"] = alive & ~newly_dead
        out["died_now"] = newly_dead
        return out, {"n_changed": int(newly_dead.sum())}

    def converged(self, m):
        return m.get("n_changed", 1) == 0


# -- public API -------------------------------------------------------------


def _make_engine(
    workdir: str,
    program: VertexProgram,
    num_partitions: int,
    max_steps: int,
    backend: str,
    checkpoint_every: int = 1,
    run_metadata: dict | None = None,
    filesystem=None,
) -> SuperstepEngine:
    if backend == "actors":
        from neo4j_webgraph_ray.state.superstep_actors import ActorSuperstepEngine

        return ActorSuperstepEngine(
            workdir, program, num_partitions, max_steps, checkpoint_every,
            run_metadata=run_metadata, filesystem=filesystem,
        )
    if backend == "dataset":
        return SuperstepEngine(
            workdir, program, num_partitions, max_steps,
            run_metadata=run_metadata, filesystem=filesystem,
        )
    raise ValueError(f"unknown backend {backend!r}")


def pagerank(
    edges: ray.data.Dataset,
    workdir: str,
    num_partitions: int = 16,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_steps: int = 100,
    resume: bool = False,
    backend: str = "actors",
    checkpoint_every: int = 1,
    run_metadata: dict | None = None,
    filesystem=None,
) -> ray.data.Dataset:
    """Per-vertex PageRank scores: Dataset(id, out_deg, rank)."""
    engine = _make_engine(
        workdir, PageRankProgram(damping, tol), num_partitions, max_steps,
        backend, checkpoint_every, run_metadata, filesystem,
    )
    if not resume:
        engine.prepare(edges)
    return engine.run(resume=resume)


def weighted_pagerank(
    edges: ray.data.Dataset,
    workdir: str,
    num_partitions: int = 16,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_steps: int = 100,
    resume: bool = False,
    backend: str = "actors",
    checkpoint_every: int = 1,
    run_metadata: dict | None = None,
    filesystem=None,
) -> ray.data.Dataset:
    """Edge-weighted PageRank: Dataset(id, out_deg=out-weight, rank);
    ``edges`` needs int64 src/dst plus a numeric ``weight`` column
    (without one the program degenerates to uniform PageRank)."""
    engine = _make_engine(
        workdir, WeightedPageRankProgram(damping, tol), num_partitions,
        max_steps, backend, checkpoint_every, run_metadata, filesystem,
    )
    if not resume:
        engine.prepare(edges)
    return engine.run(resume=resume)


def connected_components(
    edges: ray.data.Dataset,
    workdir: str,
    num_partitions: int = 16,
    max_steps: int = 200,
    resume: bool = False,
    backend: str = "actors",
    checkpoint_every: int = 1,
    run_metadata: dict | None = None,
    filesystem=None,
) -> ray.data.Dataset:
    """Weakly connected components: Dataset(id, label=min id in comp)."""
    engine = _make_engine(
        workdir, ConnectedComponentsProgram(), num_partitions, max_steps,
        backend, checkpoint_every, run_metadata, filesystem,
    )
    if not resume:
        engine.prepare(edges)
    return engine.run(resume=resume)


def personalized_pagerank(
    edges: ray.data.Dataset,
    workdir: str,
    seed_ids: np.ndarray,
    num_partitions: int = 16,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_steps: int = 100,
    resume: bool = False,
    backend: str = "actors",
    checkpoint_every: int = 1,
    run_metadata: dict | None = None,
    filesystem=None,
) -> ray.data.Dataset:
    """Seed-teleport PageRank: Dataset(id, out_deg, pref, rank)."""
    engine = _make_engine(
        workdir, PersonalizedPageRankProgram(seed_ids, damping, tol),
        num_partitions, max_steps, backend, checkpoint_every,
        run_metadata, filesystem,
    )
    if not resume:
        engine.prepare(edges)
    return engine.run(resume=resume)


def bfs_distances(
    edges: ray.data.Dataset,
    workdir: str,
    seed_ids: np.ndarray,
    num_partitions: int = 16,
    max_steps: int = 300,
    resume: bool = False,
    backend: str = "actors",
    checkpoint_every: int = 1,
    run_metadata: dict | None = None,
    filesystem=None,
) -> ray.data.Dataset:
    """Undirected hop distances from a seed set: Dataset(id, dist);
    unreached vertices carry :data:`BFS_UNREACHED`."""
    engine = _make_engine(
        workdir, BFSDistanceProgram(seed_ids), num_partitions, max_steps,
        backend, checkpoint_every, run_metadata, filesystem,
    )
    if not resume:
        engine.prepare(edges)
    return engine.run(resume=resume)


def weighted_sssp(
    edges: ray.data.Dataset,
    workdir: str,
    seed_ids: np.ndarray,
    num_partitions: int = 16,
    max_steps: int = 300,
    resume: bool = False,
    backend: str = "actors",
    checkpoint_every: int = 1,
    run_metadata: dict | None = None,
    filesystem=None,
) -> ray.data.Dataset:
    """Undirected weighted shortest-path distances from a seed set
    (min-plus Bellman–Ford; integer ``weight`` column required on the
    edge input): Dataset(id, dist); unreached carry
    :data:`BFS_UNREACHED`."""
    engine = _make_engine(
        workdir, WeightedSSSPProgram(seed_ids), num_partitions, max_steps,
        backend, checkpoint_every, run_metadata, filesystem,
    )
    if not resume:
        engine.prepare(edges)
    return engine.run(resume=resume)


def kcore(
    edges: ray.data.Dataset,
    workdir: str,
    k: int = 2,
    num_partitions: int = 16,
    max_steps: int = 200,
    resume: bool = False,
    backend: str = "actors",
    checkpoint_every: int = 1,
    run_metadata: dict | None = None,
    filesystem=None,
) -> ray.data.Dataset:
    """k-core membership: Dataset(id, deg, alive, died_now); ``alive``
    marks the surviving k-core, ``deg`` its within-core degree."""
    engine = _make_engine(
        workdir, KCoreProgram(k), num_partitions, max_steps,
        backend, checkpoint_every, run_metadata, filesystem,
    )
    if not resume:
        engine.prepare(edges)
    return engine.run(resume=resume)


def directed_min_labels(
    edges: ray.data.Dataset,
    workdir: str,
    num_partitions: int = 16,
    max_steps: int = 300,
    backend: str = "actors",
    checkpoint_every: int = 1,
    filesystem=None,
) -> ray.data.Dataset:
    """Forward min-label fixpoint (SCC coloring phase):
    Dataset(id, label = min id forward-reaching it)."""
    engine = _make_engine(
        workdir, DirectedMinLabelProgram(), num_partitions, max_steps,
        backend, checkpoint_every, None, filesystem,
    )
    engine.prepare(edges)
    return engine.run()


def directed_bfs(
    edges: ray.data.Dataset,
    workdir: str,
    seed_ids: np.ndarray,
    num_partitions: int = 16,
    max_steps: int = 300,
    backend: str = "actors",
    checkpoint_every: int = 1,
    filesystem=None,
) -> ray.data.Dataset:
    """Multi-source DIRECTED hop distances: Dataset(id, dist) over the
    edge set as given (callers reverse the edges for backward sweeps);
    unreached vertices carry :data:`BFS_UNREACHED`."""
    engine = _make_engine(
        workdir, DirectedBFSProgram(seed_ids), num_partitions, max_steps,
        backend, checkpoint_every, None, filesystem,
    )
    engine.prepare(edges)
    return engine.run()


def betweenness_dependencies(
    edges: ray.data.Dataset,
    workdir: str,
    seed_ids: np.ndarray,
    num_partitions: int = 16,
    filesystem=None,
) -> ray.data.Dataset:
    """Brandes betweenness dependencies over the undirected graph:
    Dataset(id, dep) with dep(v) = Σ over the k seed sources s of
    δ_s(v) (source lanes zeroed at their own source).  Exact
    betweenness when seeds = all vertices (then bc = dep/2 for the
    undirected double-count); the standard sampled estimator otherwise
    (scale by n/k — callers own the normalization).

    ONE forward run (multi-source σ-counting BFS) + ONE backward run
    (level-synchronized δ accumulation), both with k float64 vecsum
    lanes — the edge set is partitioned twice total, never per source.
    Dataset backend (vector modes live there)."""
    from neo4j_webgraph_ray.pipelines.triangles import undirected_simple
    from neo4j_webgraph_ray.state import fsio
    from neo4j_webgraph_ray.state.checkpoint import load_manifest

    seeds = np.sort(np.asarray(seed_ids, dtype=np.int64))
    k = len(seeds)
    # betweenness is defined on the SIMPLE undirected graph: reciprocal
    # or duplicate directed edges must not double σ — canonicalize to
    # distinct (min, max) pairs; prepare's undirected doubling then
    # yields exactly one CSR entry per direction.  Pinned: both engine
    # prepares consume it.
    simple = (
        undirected_simple(edges)
        .map_batches(
            lambda df: df.rename(columns={"a": "src", "b": "dst"}),
            batch_format="pandas",
        )
        .materialize()
    )
    fwd_dir = fsio.join(workdir, "fwd")
    fwd = SuperstepEngine(
        fwd_dir, BrandesForwardProgram(seeds), num_partitions,
        max_steps=10_000, filesystem=filesystem,
    )
    fwd.prepare(simple)
    fstate = fwd.run()

    def lane_max(df: pd.DataFrame) -> pd.DataFrame:
        row = {}
        for j in range(k):
            d = df[f"d{j}"].to_numpy()
            fin = d[d < BFS_UNREACHED]
            row[f"m{j}"] = np.int64(fin.max()) if len(fin) else np.int64(0)
        return pd.DataFrame([row])

    mx = fstate.map_batches(lane_max, batch_format="pandas").to_pandas()
    lmax = np.array([int(mx[f"m{j}"].max()) for j in range(k)], np.int64)
    fwd_step = load_manifest(fwd_dir, fs=filesystem).steps[-1]["step"]
    bwd = SuperstepEngine(
        fsio.join(workdir, "bwd"),
        BrandesBackwardProgram(
            seeds, fwd_dir, fwd_step, lmax, num_partitions, filesystem
        ),
        num_partitions, max_steps=int(lmax.max()), filesystem=filesystem,
    )
    bwd.prepare(simple)
    bstate = bwd.run()
    seeds_arr = seeds  # closure constant (tiny)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["id"].to_numpy()
        dep = np.zeros(len(df), np.float64)
        for j in range(k):
            lane = df[f"delta{j}"].to_numpy()
            dep += np.where(ids == seeds_arr[j], 0.0, lane)
        return pd.DataFrame({"id": ids, "dep": dep})

    return bstate.map_batches(finalize, batch_format="pandas")


def hits(
    doubled_edges: ray.data.Dataset,
    workdir: str,
    num_partitions: int = 16,
    tol: float = 0.0,
    max_steps: int = 50,
    resume: bool = False,
    backend: str = "actors",
    checkpoint_every: int = 1,
    run_metadata: dict | None = None,
    filesystem=None,
) -> ray.data.Dataset:
    """HITS hub/authority scores: Dataset(id, val) over the DOUBLED
    bipartite graph (see :class:`HITSProgram` — callers must pass edges
    already doubled over dense ranks: (2u, 2v+1) and (2v+1, 2u) per
    original edge (u, v)).  Even ids carry hub values, odd ids carry
    authority values; both sides are L1-normalized one step behind
    (normalize driver-side per side for the final contract result)."""
    engine = _make_engine(
        workdir, HITSProgram(tol), num_partitions, max_steps,
        backend, checkpoint_every, run_metadata, filesystem,
    )
    if not resume:
        engine.prepare(doubled_edges)
    return engine.run(resume=resume)


def eigenvector(
    simple_edges: ray.data.Dataset,
    workdir: str,
    num_partitions: int = 16,
    tol: float = 0.0,
    max_steps: int = 50,
    resume: bool = False,
    backend: str = "actors",
    checkpoint_every: int = 1,
    run_metadata: dict | None = None,
    filesystem=None,
) -> ray.data.Dataset:
    """Eigenvector centrality: Dataset(id, val) over the SIMPLE
    undirected graph (callers pass each unordered edge once, self-loops
    dropped — ``triangles.undirected_simple``; see
    :class:`EigenvectorProgram`).  ``val`` is the raw final iterate —
    L1-normalize driver-side for the contract result."""
    engine = _make_engine(
        workdir, EigenvectorProgram(tol), num_partitions, max_steps,
        backend, checkpoint_every, run_metadata, filesystem,
    )
    if not resume:
        engine.prepare(simple_edges)
    return engine.run(resume=resume)


def katz(
    edges: ray.data.Dataset,
    workdir: str,
    num_partitions: int = 16,
    alpha: float = 0.05,
    tol: float = 0.0,
    max_steps: int = 30,
    resume: bool = False,
    backend: str = "actors",
    checkpoint_every: int = 1,
    run_metadata: dict | None = None,
    filesystem=None,
) -> ray.data.Dataset:
    """Katz centrality: Dataset(id, val) over the DIRECTED edge table
    (see :class:`KatzProgram`; ``val`` is the raw final iterate —
    normalize driver-side if a scale-free contract result is wanted)."""
    engine = _make_engine(
        workdir, KatzProgram(alpha, tol), num_partitions, max_steps,
        backend, checkpoint_every, run_metadata, filesystem,
    )
    if not resume:
        engine.prepare(edges)
    return engine.run(resume=resume)


def mis(
    simple_edges: ray.data.Dataset,
    workdir: str,
    num_partitions: int = 16,
    max_steps: int = 10_000,
    resume: bool = False,
    backend: str = "actors",
    checkpoint_every: int = 1,
    run_metadata: dict | None = None,
    filesystem=None,
) -> ray.data.Dataset:
    """Maximal independent set: Dataset(id, status, emit) — status 1 =
    in the MIS, 2 = covered (0 never survives convergence).  Input must
    be the SIMPLE graph without self-loops; vertex ids double as the
    greedy priorities (see :class:`MISProgram`)."""
    engine = _make_engine(
        workdir, MISProgram(), num_partitions, max_steps,
        backend, checkpoint_every, run_metadata, filesystem,
    )
    if not resume:
        engine.prepare(simple_edges)
    return engine.run(resume=resume)


def label_propagation(
    edges: ray.data.Dataset,
    workdir: str,
    num_partitions: int = 16,
    max_steps: int = 20,
    resume: bool = False,
    backend: str = "actors",
    checkpoint_every: int = 1,
    run_metadata: dict | None = None,
    filesystem=None,
) -> ray.data.Dataset:
    """Synchronous LPA communities: Dataset(id, label)."""
    engine = _make_engine(
        workdir, LabelPropagationProgram(), num_partitions, max_steps,
        backend, checkpoint_every, run_metadata, filesystem,
    )
    if not resume:
        engine.prepare(edges)
    return engine.run(resume=resume)
