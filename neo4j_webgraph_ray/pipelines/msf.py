"""Minimum spanning forest via distributed Borůvka rounds.

Each round is built entirely from the engine's existing distributed
primitives — no driver-side graph state ever exists:

1. relabel every base edge by its endpoints' current component labels
   (two size-gated lookup joins) and drop intra-component edges;
2. per component, pick the minimum incident edge under the TOTAL order
   ``(w, a, b)`` — an algebraic argmin, so it folds per batch first and
   once more inside one bucketed shuffle;
3. the selected edges (deduplicated — both endpoints' components may
   pick the same edge) join the forest and define a merge graph over
   component ids; contracting it is exactly a connected-components run,
   so the round reuses :func:`~neo4j_webgraph_ray.pipelines.algorithms.
   connected_components` (superstep engine, min-label semantics);
4. every vertex label re-points through the contraction (one lookup
   join with keep-old fallback).

Because the per-component choice uses the lexicographic ``(w, a, b)``
total order, parallel ties are broken deterministically and the forest
is UNIQUE (the classic distinct-weight perturbation argument), which is
what lets a DuckDB oracle running the same unrolled rounds reproduce it
edge for edge.  Components at least halve each round, so the loop runs
at most ``ceil(log2 V)`` rounds; each round's work is O(E) relabel +
one argmin shuffle + a CC on a graph that halves every round.

Reference parity: the reference has no MSF, but its weighted edge
multiset (call/transition counts — ``WebGraphQueries.java`` degree
semantics) is the natural weight domain; this closes the classic
algorithm family next to PageRank/CC/LPA/SSSP/k-core.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data

from neo4j_webgraph_ray.pipelines.algorithms import connected_components
from neo4j_webgraph_ray.stages.core import bucketed_groupby


def _argmin_per_comp(df: pd.DataFrame) -> pd.DataFrame:
    """Algebraic per-component lex-min over (w, a, b): first row of
    each ``c`` run after a stable sort."""
    if not len(df):
        return df[["c", "w", "a", "b", "ca", "cb"]]
    df = df[["c", "w", "a", "b", "ca", "cb"]].sort_values(
        ["c", "w", "a", "b"], kind="stable"
    )
    c = df["c"].to_numpy()
    return df.iloc[np.flatnonzero(np.r_[True, c[1:] != c[:-1]])]


def _dedup_edges(df: pd.DataFrame) -> pd.DataFrame:
    """Rows with equal (a, b) are identical by construction; keep one."""
    return df.drop_duplicates(subset=["a", "b"])


def _minlabel_cc_local(ca: np.ndarray, cb: np.ndarray) -> pd.DataFrame:
    """Single-node min-label CC over a small merge graph (the size-gated
    fast path): path-halving union-find, then per-set min label — the
    same (id, label=min id in comp) contract as the superstep CC."""
    nodes, inv = np.unique(np.concatenate([ca, cb]), return_inverse=True)
    parent = np.arange(len(nodes), dtype=np.int64)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ia, ib = inv[: len(ca)], inv[len(ca):]
    for x, y in zip(ia, ib):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            parent[rx] = ry
    roots = np.fromiter((find(int(i)) for i in range(len(nodes))),
                        np.int64, len(nodes))
    # min original label per root
    order = np.argsort(roots, kind="stable")
    rs = roots[order]
    bound = np.flatnonzero(np.r_[True, rs[1:] != rs[:-1]])
    minlab = np.minimum.reduceat(nodes[order], bound)
    lab = np.empty(len(nodes), np.int64)
    lab[order] = np.repeat(minlab, np.diff(np.r_[bound, len(nodes)]))
    return pd.DataFrame({"id": nodes, "label": lab})


def minimum_spanning_forest(
    base: ray.data.Dataset,
    vertex_ids: ray.data.Dataset,
    workdir: str,
    num_partitions: int = 16,
    max_rounds: int = 12,
    num_buckets: int = 32,
    checkpoint_every: int = 25,
    cc_broadcast_limit: int = 200_000,
) -> ray.data.Dataset:
    """Borůvka MSF over ``base`` = canonical weighted simple undirected
    edges ``(a, b, w)`` with ``a < b`` (int64 node ids, int64 weights,
    no parallel edges, no self loops) and ``vertex_ids`` = one ``v``
    int64 column covering every node id (extra isolated ids are
    harmless singletons).  Returns the forest as a Dataset with the
    same ``(a, b, w)`` columns.

    Deterministic: ties in ``w`` break on ``(a, b)``, making the
    forest unique — callers that need SQL-order parity should pass ids
    whose numeric order equals the oracle's string order (dense vkey
    ranks)."""
    from neo4j_webgraph_ray.queries import (  # circular-safe
        UNMATCHED_SENTINEL,
        _lookup_join,
    )

    labels = vertex_ids.map_batches(
        lambda df: pd.DataFrame(
            {"v": df["v"].to_numpy(np.int64), "l": df["v"].to_numpy(np.int64)}
        ),
        batch_format="pandas",
    ).materialize()
    base = base.materialize()  # re-joined every round

    forest_rounds: list[ray.data.Dataset] = []
    for r in range(max_rounds + 1):
        j1 = _lookup_join(
            base, "a", labels, "v", "l", out_col="ca",
            carry_cols=["b", "w"], keep_key=True,
        )
        j2 = _lookup_join(
            j1, "b", labels, "v", "l", out_col="cb",
            carry_cols=["a", "w", "ca"], keep_key=True,
        )

        def cands(df: pd.DataFrame) -> pd.DataFrame:
            m = df["ca"].to_numpy() != df["cb"].to_numpy()
            df = df.loc[m, ["a", "b", "w", "ca", "cb"]]
            two = pd.concat([df, df], ignore_index=True)
            two["c"] = np.concatenate(
                [df["ca"].to_numpy(np.int64), df["cb"].to_numpy(np.int64)]
            )
            return _argmin_per_comp(two)

        picked = bucketed_groupby(
            j2.map_batches(cands, batch_format="pandas"),
            ["c"], _argmin_per_comp, num_buckets=num_buckets,
        )
        sel = bucketed_groupby(
            picked.map_batches(
                lambda df: df[["a", "b", "w", "ca", "cb"]],
                batch_format="pandas",
            ),
            ["a", "b"], _dedup_edges, num_buckets=num_buckets,
        ).materialize()  # three consumers: count, forest, merge graph
        n_sel = sel.count()
        if n_sel == 0:
            break
        if r == max_rounds:
            raise RuntimeError(
                f"Borůvka did not converge in {max_rounds} rounds — "
                "components must at least halve per round; check the "
                "input for non-canonical edges"
            )
        forest_rounds.append(
            sel.map_batches(
                lambda df: df[["a", "b", "w"]], batch_format="pandas"
            )
        )
        if n_sel <= cc_broadcast_limit:
            # size-gated fast path: merge graphs at least halve every
            # round, so beyond round 1 this is almost always tiny —
            # contract on the driver (bounded by the gate) instead of
            # spinning up a superstep engine per round
            pairs = sel.select_columns(["ca", "cb"]).to_pandas()
            cc = ray.data.from_pandas(
                _minlabel_cc_local(
                    pairs["ca"].to_numpy(np.int64),
                    pairs["cb"].to_numpy(np.int64),
                )
            )
        else:
            merge = sel.map_batches(
                lambda df: pd.DataFrame(
                    {"src": df["ca"].to_numpy(np.int64),
                     "dst": df["cb"].to_numpy(np.int64)}
                ),
                batch_format="pandas",
            )
            cc = connected_components(
                merge, f"{workdir}/cc{r}", num_partitions=num_partitions,
                checkpoint_every=checkpoint_every,
            )
        relab = _lookup_join(
            labels, "l", cc, "id", "label", out_col="ln",
            carry_cols=["v"], keep_key=True, keep_unmatched=True,
        )

        def repoint(df: pd.DataFrame) -> pd.DataFrame:
            ln = df["ln"].to_numpy(np.int64)
            old = df["l"].to_numpy(np.int64)
            return pd.DataFrame(
                {"v": df["v"].to_numpy(np.int64),
                 "l": np.where(ln == UNMATCHED_SENTINEL, old, ln)}
            )

        labels = relab.map_batches(
            repoint, batch_format="pandas"
        ).materialize()

    if not forest_rounds:
        import pyarrow as pa

        return ray.data.from_arrow(
            pa.table(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "w": pa.array([], pa.int64())}
            )
        )
    out = forest_rounds[0]
    for ds in forest_rounds[1:]:
        out = out.union(ds)
    return out
