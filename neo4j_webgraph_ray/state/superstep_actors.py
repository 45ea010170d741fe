"""Actor-pool superstep backend: per-partition CSR blocks held in memory,
one-bundle-per-worker message exchange through the object store.

The Dataset backend (``superstep.py``) re-reads the partitioned edge
Parquet every superstep — correct and fully streaming, but each
superstep pays a fresh Ray Data pipeline.  This backend implements the
north-star fast path: P partition workers (Ray actors) each build their
CSR block ONCE (edge src→state index mapping, dst run boundaries), keep
vertex state in memory, and per superstep exchange pre-aggregated
messages as ONE plasma object per worker — concatenated arrays plus a
P+1 offsets vector, destination-partition-ordered.  The driver runs two
task waves per superstep (scatter, then gather with the P scatter refs
as direct arguments), so coordination is O(P) dispatches and message
payloads never pass through the driver; on one node every gather maps
the same shared-memory buffers zero-copy, and on a multi-node cluster
each node pulls each remote bundle once.

Earlier designs measured here: driver-routed ``num_returns=P`` slices
(P² refs → ~70 ms/superstep serial floor) and actor-to-actor pushes
(P² RPCs → ~100 ms floor, worse with more CPUs since single-node task
dispatch serializes).  The bundle design cuts the floor to ~2P
dispatches ≈ 10-15 ms at P=32.

Global per-superstep scalars the gather needs (e.g. PageRank's dangling
mass) ride inside every bundle as per-partition stats; each gatherer
sums them over the P bundles, so no driver round-trip sits between
scatter and gather.

Checkpoint/resume protocol is IDENTICAL to the Dataset backend — same
``prepare()`` layout, same manifest, same per-superstep state Parquet —
so a run can be prepared once, interrupted under one backend and
resumed under the other (tests/test_actor_backend.py asserts equality).

Partition→actor affinity is exact by construction: worker p owns edge
partition p (src % P) and state partition p (id % P) for the whole run
(SURVEY.md §7.5 "actor-held CSR" hard part).
"""

from __future__ import annotations

import os
import time
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from neo4j_webgraph_ray.state.checkpoint import (
    atomic_write_parquet,
    edges_dir,
    load_manifest,
    save_manifest,
    state_dir,
)
from neo4j_webgraph_ray.state.superstep import SuperstepEngine, VertexProgram, part_of

_INT64_MAX = np.iinfo(np.int64).max


@ray.remote
class PartitionWorker:
    """Owns one partition: CSR edge block + vertex state."""

    def __init__(
        self,
        workdir: str,
        part: int,
        num_partitions: int,
        program: VertexProgram,
        start_step: int,
        static_ctx: dict,
    ):
        self.workdir = workdir
        self.part = part
        self.P = num_partitions
        self.program = program
        self.static_ctx = static_ctx

        epath = os.path.join(edges_dir(workdir), f"part={part}.parquet")
        if os.path.exists(epath):
            et = pq.read_table(epath, columns=["src", "dst"])
            src = et["src"].to_numpy()
            dst = et["dst"].to_numpy()  # dst-sorted at prepare time
        else:
            src = dst = np.empty(0, dtype=np.int64)
        self.state = pq.read_table(
            os.path.join(state_dir(workdir, start_step), f"part={part}.parquet")
        ).to_pandas()
        state_ids = self.state["id"].to_numpy()
        self.state_ids = state_ids

        # CSR block, built once:
        self.edge_src_idx = np.searchsorted(state_ids, src) if len(src) else src
        starts = (
            np.flatnonzero(np.r_[True, dst[1:] != dst[:-1]])
            if len(dst)
            else np.empty(0, dtype=np.int64)
        )
        self.run_starts = starts
        self.dst_unique = dst[starts] if len(dst) else dst
        dst_parts = part_of(self.dst_unique, self.P)
        order = np.argsort(dst_parts, kind="stable")
        self.dst_order = order  # destination-partition-ordered view
        sorted_parts = dst_parts[order]
        self.slice_offsets = np.r_[
            np.searchsorted(sorted_parts, np.arange(self.P)), len(sorted_parts)
        ].astype(np.int64)
        self.n_edges = len(src)

    # -- scatter: ONE bundle = (offsets, ids, col arrays..., stats) -------

    def scatter(self, step: int) -> tuple:
        prog = self.program
        stats = prog.payload_stats(self.state)
        if not self.n_edges:
            z = np.zeros(self.P + 1, dtype=np.int64)
            e = np.empty(0, dtype=np.int64)
            if prog.mode == "sum":
                return (z, e, np.empty(0, np.float64), stats)
            if prog.mode == "min":
                return (z, e, e, stats)
            return (z, e, e, e, stats)
        svals = prog.scatter_values(self.state)
        evals = svals[self.edge_src_idx]
        if prog.mode in ("sum", "min"):
            if prog.mode == "sum":
                agg = np.add.reduceat(evals, self.run_starts)
            else:
                agg = np.minimum.reduceat(evals.astype(np.int64), self.run_starts)
            ids = self.dst_unique[self.dst_order]
            vals = agg[self.dst_order]
            return (self.slice_offsets, ids, vals, stats)
        # mode aggregation: (dst, label) pair weights
        dst_rep = np.repeat(
            np.arange(len(self.run_starts)),
            np.diff(np.r_[self.run_starts, self.n_edges]),
        )
        df = pd.DataFrame({"r": dst_rep, "lab": evals.astype(np.int64)})
        cnt = df.groupby(["r", "lab"], sort=True, as_index=False).size()
        ids = self.dst_unique[cnt["r"].to_numpy()]
        labs = cnt["lab"].to_numpy()
        wts = cnt["size"].to_numpy().astype(np.int64)
        parts = part_of(ids, self.P)
        order = np.argsort(parts, kind="stable")
        ids, labs, wts, parts = ids[order], labs[order], wts[order], parts[order]
        offsets = np.r_[
            np.searchsorted(parts, np.arange(self.P)), len(parts)
        ].astype(np.int64)
        return (offsets, ids, labs, wts, stats)

    # -- gather -----------------------------------------------------------

    def gather(self, step: int, do_ckpt: bool, *bundles) -> dict:
        prog = self.program
        state = self.state
        sids = self.state_ids
        n = len(sids)
        q = self.part
        ctx = dict(self.static_ctx)
        ctx["step"] = step
        stat_sum: dict[str, float] = {}
        for b in bundles:
            for k, v in b[-1].items():
                stat_sum[k] = stat_sum.get(k, 0.0) + v
        ctx.update(stat_sum)

        def my_slice(b, col):
            off = b[0]
            return b[col][off[q]: off[q + 1]]

        n_msgs = 0
        if prog.mode == "sum":
            buf = np.zeros(n, dtype=np.float64)
            got = np.zeros(n, dtype=bool)
            for b in bundles:
                ids = my_slice(b, 1)
                if len(ids):
                    vals = my_slice(b, 2)
                    idx = np.searchsorted(sids, ids)
                    buf[idx] += vals
                    got[idx] = True
                    n_msgs += len(ids)
            reduced = pd.DataFrame({"id": sids[got], "agg": buf[got]})
        elif prog.mode == "min":
            buf = np.full(n, _INT64_MAX, dtype=np.int64)
            got = np.zeros(n, dtype=bool)
            for b in bundles:
                ids = my_slice(b, 1)
                if len(ids):
                    vals = my_slice(b, 2)
                    idx = np.searchsorted(sids, ids)
                    np.minimum.at(buf, idx, vals)
                    got[idx] = True
                    n_msgs += len(ids)
            reduced = pd.DataFrame({"id": sids[got], "agg": buf[got]})
        else:
            frames = []
            for b in bundles:
                ids = my_slice(b, 1)
                if len(ids):
                    frames.append(
                        pd.DataFrame(
                            {"id": ids, "lab": my_slice(b, 2), "wt": my_slice(b, 3)}
                        )
                    )
                    n_msgs += len(ids)
            if frames:
                allm = pd.concat(frames, ignore_index=True)
                reduced = allm.groupby(["id", "lab"], sort=True, as_index=False)["wt"].sum()
            else:
                reduced = pd.DataFrame(
                    {"id": np.empty(0, np.int64), "lab": np.empty(0, np.int64),
                     "wt": np.empty(0, np.int64)}
                )
        new_state, metrics = prog.gather_update(state, reduced, ctx)
        self.state = new_state
        if do_ckpt:
            out = os.path.join(
                state_dir(self.workdir, step + 1), f"part={self.part}.parquet"
            )
            atomic_write_parquet(
                pa.Table.from_pandas(new_state, preserve_index=False), out
            )
        row = {"part": self.part, "n_msgs": n_msgs}
        row.update(metrics)
        return row

    def advance(self, step: int, do_ckpt: bool, *bundles) -> tuple:
        """Pipelined superstep: gather step ``step`` from the P scatter
        bundles (updating state to step+1), then immediately scatter for
        step+1.  Returns (next_bundle, metrics) as two objects so the
        driver fetches only the tiny metrics dict."""
        metrics = self.gather(step, do_ckpt, *bundles)
        return self.scatter(step + 1), metrics

    def checkpoint_now(self, step: int) -> int:
        out = os.path.join(state_dir(self.workdir, step), f"part={self.part}.parquet")
        atomic_write_parquet(
            pa.Table.from_pandas(self.state, preserve_index=False), out
        )
        return self.part


class ActorSuperstepEngine(SuperstepEngine):
    """Superstep engine on persistent partition actors.

    Same prepare()/manifest/checkpoint protocol as the Dataset backend;
    only the superstep loop differs.  ``checkpoint_every`` trades
    durability for speed (a crash replays at most that many supersteps
    from the last checkpoint); the final state is always written.
    """

    def __init__(
        self,
        workdir: str,
        program: VertexProgram,
        num_partitions: int = 16,
        max_steps: int = 100,
        checkpoint_every: int = 1,
        actor_cpus: float | None = None,
    ):
        if num_partitions < 2:
            raise ValueError("actor backend needs num_partitions >= 2")
        super().__init__(workdir, program, num_partitions, max_steps)
        self.checkpoint_every = checkpoint_every
        self.actor_cpus = actor_cpus

    def run(self, resume: bool = False) -> "ray.data.Dataset":
        manifest = load_manifest(self.workdir)
        if manifest is None:
            raise RuntimeError(f"no manifest in {self.workdir}; call prepare() first")
        if resume:
            want = self.program.config()
            if manifest.config != want or manifest.algo != self.program.name:
                raise RuntimeError(
                    f"refusing to resume: manifest config {manifest.config} "
                    f"(algo {manifest.algo}) != requested {want} ({self.program.name})"
                )
        P = manifest.num_partitions
        program = self.program
        n_vertices = manifest.steps[0]["n_vertices"]
        n_edges = manifest.steps[0]["n_edges"]
        step = manifest.steps[-1]["step"]

        last_metrics = manifest.steps[-1]
        if last_metrics.get("kind") != "init" and program.converged(last_metrics):
            manifest.status = "converged"
            save_manifest(self.workdir, manifest)
            return self.final_state(step)

        cpus = ray.cluster_resources().get("CPU", P)
        frac = self.actor_cpus if self.actor_cpus is not None else max(
            0.01, round(min(1.0, cpus / P), 2)
        )
        static_ctx = {"n": n_vertices}
        workers = [
            PartitionWorker.options(num_cpus=frac).remote(
                self.workdir, p, P, program, step, static_ctx
            )
            for p in range(P)
        ]
        # Pipelined superstep waves: wave k = advance(k) on every worker
        # (gather step k -> state k+1, then scatter for k+1).  Per-actor
        # task ordering + bundle refs as arguments give Ray the full
        # dependency graph, so up to `depth` waves stream without a
        # driver barrier; the driver consumes metrics `depth` waves
        # behind and stops submitting once converged (the ≤depth
        # speculative waves beyond convergence are discarded — their
        # checkpoints are just unused files).  Sparse checkpointing
        # (checkpoint_every > 1) forces depth 1 so the final state can
        # be flushed from actor memory.
        depth = 4 if self.checkpoint_every == 1 else 1
        try:
            last_ckpt = step
            bundles = [w.scatter.remote(step) for w in workers]
            inflight: list[tuple[int, list, bool]] = []
            next_wave = step
            stopped = False
            t_prev = time.perf_counter()
            while True:
                while (
                    not stopped
                    and len(inflight) < depth
                    and next_wave < self.max_steps
                ):
                    k = next_wave
                    do_ckpt = (k + 1 - last_ckpt) >= self.checkpoint_every
                    if do_ckpt:
                        os.makedirs(state_dir(self.workdir, k + 1), exist_ok=True)
                        last_ckpt = k + 1
                    rets = [
                        w.advance.options(num_returns=2).remote(k, do_ckpt, *bundles)
                        for w in workers
                    ]
                    bundles = [r[0] for r in rets]
                    inflight.append((k, [r[1] for r in rets], do_ckpt))
                    next_wave += 1
                if not inflight:
                    if not stopped:
                        manifest.status = "max_steps"
                    break
                k, mrefs, do_ckpt = inflight.pop(0)
                rows = ray.get(mrefs)
                now = time.perf_counter()
                wall = now - t_prev
                t_prev = now
                mdf = pd.DataFrame(rows)
                step_metrics: dict[str, Any] = {
                    "step": k + 1,
                    "n_msgs": int(mdf["n_msgs"].sum()),
                    "wall_sec": round(wall, 4),
                    "edges_per_sec": round(n_edges / wall, 1) if wall > 0 else 0.0,
                    "checkpointed": bool(do_ckpt),
                }
                for col in mdf.columns:
                    if col in ("part", "n_msgs"):
                        continue
                    if col.startswith("max_"):
                        step_metrics[col] = float(mdf[col].max())
                    else:
                        step_metrics[col] = float(mdf[col].sum())
                manifest.steps.append(step_metrics)
                program.update_ctx(self.ctx, step_metrics)
                if do_ckpt:
                    save_manifest(self.workdir, manifest)
                step = k + 1
                if program.converged(step_metrics):
                    manifest.status = "converged"
                    stopped = True
                    inflight.clear()  # discard speculative waves
                    break
                if step >= self.max_steps and not inflight:
                    manifest.status = "max_steps"
                    break

            final_step = manifest.steps[-1]["step"]
            if not manifest.steps[-1].get("checkpointed", True):
                # only reachable at depth 1 (sparse checkpointing), where
                # actor state is exactly final_step
                os.makedirs(state_dir(self.workdir, final_step), exist_ok=True)
                ray.get([w.checkpoint_now.remote(final_step) for w in workers])
                manifest.steps[-1]["checkpointed"] = True
            save_manifest(self.workdir, manifest)
        finally:
            for w in workers:
                ray.kill(w)
        return self.final_state(manifest.steps[-1]["step"])
