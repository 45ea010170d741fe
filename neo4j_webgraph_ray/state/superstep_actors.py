"""Actor-pool superstep backend: CSR partition shards held in memory,
one-bundle-per-worker message exchange through the object store.

The Dataset backend (``superstep.py``) re-reads the partitioned edge
Parquet every superstep — correct and fully streaming, but each
superstep pays a fresh Ray Data pipeline.  This backend implements the
north-star fast path with an explicit separation between

- **partitions** (P, fixed by ``prepare()`` — the data layout:
  edges by ``src % P``, state by ``id % P``), and
- **workers** (W shard actors, ``num_cpus=1`` each, worker w owning
  partitions ``{p : p % W == w}``) — the execution parallelism, i.e.
  the stand-in for cluster nodes.  Scaling N→4N = same P, 4× workers.

Each worker builds the CSR blocks for its partitions ONCE (edge
src→state index mapping, dst run boundaries), keeps vertex state in
memory, and per superstep emits ONE plasma bundle: concatenated
pre-aggregated message arrays plus a P+1 offsets vector in
destination-partition order.  The driver runs pipelined ``advance``
waves (gather step k, then scatter k+1) with the W bundle refs passed
as direct task arguments — coordination is O(W) dispatches per
superstep, payloads never route through the driver, and on one node
every gather maps the same shared-memory buffers zero-copy.

Whole-CPU workers matter for honest scaling measurements: fractional
``num_cpus`` actors oversubscribe the physical cores, letting an
"8 CPU" run silently use all of them.

Global per-superstep scalars the gather needs (e.g. PageRank's dangling
mass) ride inside every bundle as additive stats; each gatherer sums
them over the W bundles, so no driver round-trip sits between scatter
and gather.

Checkpoint/resume protocol is IDENTICAL to the Dataset backend — same
``prepare()`` layout, same manifest, same per-superstep state Parquet —
so a run can be prepared once, interrupted under one backend (or worker
count) and resumed under another (tests/test_actor_backend.py).
"""

from __future__ import annotations

import os
import time
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from neo4j_webgraph_ray.state import fsio
from neo4j_webgraph_ray.state.checkpoint import (
    atomic_write_parquet,
    edges_dir,
    load_manifest,
    save_manifest,
    state_dir,
)
from neo4j_webgraph_ray.state.superstep import SuperstepEngine, VertexProgram, part_of

_INT64_MAX = np.iinfo(np.int64).max


class _PartBlock:
    """CSR block + state for one partition, built once."""

    def __init__(self, workdir: str, part: int, P: int, start_step: int, fs=None):
        epath = fsio.join(edges_dir(workdir), f"part={part}.parquet")
        self.edge_w = None
        if fsio.exists(epath, fs=fs):
            et = fsio.read_table(epath, fs=fs)
            src = et["src"].to_numpy()
            dst = et["dst"].to_numpy()  # dst-sorted at prepare time
            if "weight" in et.column_names:
                self.edge_w = et["weight"].to_numpy()
        else:
            src = dst = np.empty(0, dtype=np.int64)
        self.state = fsio.read_table(
            fsio.join(state_dir(workdir, start_step), f"part={part}.parquet"), fs=fs
        ).to_pandas()
        self.state_ids = self.state["id"].to_numpy()
        self.edge_src_idx = (
            np.searchsorted(self.state_ids, src) if len(src) else src
        )
        starts = (
            np.flatnonzero(np.r_[True, dst[1:] != dst[:-1]])
            if len(dst)
            else np.empty(0, dtype=np.int64)
        )
        self.run_starts = starts
        self.dst_unique = dst[starts] if len(dst) else dst
        self.dst_part = part_of(self.dst_unique, P)
        self.n_edges = len(src)


@ray.remote(num_cpus=1)
class ShardWorker:
    """Owns a set of partitions: their CSR blocks + vertex state."""

    def __init__(
        self,
        workdir: str,
        parts: list[int],
        num_partitions: int,
        program: VertexProgram,
        start_step: int,
        static_ctx: dict,
        num_threads: int = 1,
        fs=None,
    ):
        self.workdir = workdir
        self.fs = fs
        self.parts = list(parts)
        self.P = num_partitions
        self.program = program
        self.static_ctx = static_ctx
        # optional intra-worker thread pool: per-partition kernels are
        # numpy (GIL-released), so threads scale a worker across cores —
        # the per-node-parallelism analog (a real 4N-node cluster also
        # multiplies cores without multiplying driver dispatch work)
        if num_threads > 1:
            from concurrent.futures import ThreadPoolExecutor

            self.pool = ThreadPoolExecutor(max_workers=num_threads)
        else:
            self.pool = None
        self.blocks = {
            p: _PartBlock(workdir, p, num_partitions, start_step, fs=fs)
            for p in self.parts
        }
        # rolling references to the last few per-partition states (state
        # frames are replaced, never mutated, so this is zero-copy) —
        # lets the driver flush the EXACT converged step even when
        # pipelined waves have speculatively advanced past it
        self._history: dict[int, dict[int, pd.DataFrame]] = {p: {} for p in self.parts}
        self._keep_states = 16
        # async checkpoint writer threads, one pending per partition —
        # parquet encoding releases the GIL, so the write overlaps the
        # next superstep's compute instead of sitting on its critical
        # path; joined before the next write of the same partition and
        # at final flush
        self._pending: dict[int, Any] = {}

    def _ckpt_async(self, p: int, state: pd.DataFrame, step: int) -> None:
        import threading

        prev = self._pending.pop(p, None)
        if prev is not None:
            prev.join()
        path = fsio.join(state_dir(self.workdir, step), f"part={p}.parquet")
        table = pa.Table.from_pandas(state, preserve_index=False)
        t = threading.Thread(
            target=atomic_write_parquet, args=(table, path), kwargs={"fs": self.fs}
        )
        t.start()
        self._pending[p] = t

    def flush(self) -> int:
        for t in self._pending.values():
            t.join()
        self._pending.clear()
        return len(self.parts)

    # -- scatter: ONE bundle = (offsets, ids, col arrays..., stats) -------

    def _scatter_part(self, p: int):
        prog = self.program
        mode = prog.mode
        blk = self.blocks[p]
        stats = prog.payload_stats(blk.state)
        if not blk.n_edges:
            return None, None, None, None, stats
        svals = prog.scatter_values(blk.state)
        evals = svals[blk.edge_src_idx]
        if blk.edge_w is not None and mode == "sum":
            # weighted sum-mode message = scatter value × edge weight
            evals = evals * blk.edge_w
        elif blk.edge_w is not None and mode == "min" and getattr(
            prog, "weighted_min", False
        ):
            # min-plus semiring (weighted SSSP) — int64 end to end,
            # mirroring the Dataset backend exactly
            evals = evals.astype(np.int64) + blk.edge_w.astype(np.int64)
        if mode in ("sum", "min"):
            if mode == "sum":
                agg = np.add.reduceat(evals, blk.run_starts)
            else:
                agg = np.minimum.reduceat(evals.astype(np.int64), blk.run_starts)
            return blk.dst_unique, agg, None, blk.dst_part, stats
        dst_rep = np.repeat(
            np.arange(len(blk.run_starts)),
            np.diff(np.r_[blk.run_starts, blk.n_edges]),
        )
        df = pd.DataFrame({"r": dst_rep, "lab": evals.astype(np.int64)})
        cnt = df.groupby(["r", "lab"], sort=True, as_index=False).size()
        return (
            blk.dst_unique[cnt["r"].to_numpy()],
            cnt["lab"].to_numpy(),
            cnt["size"].to_numpy().astype(np.int64),
            part_of(blk.dst_unique[cnt["r"].to_numpy()], self.P),
            stats,
        )

    def scatter(self, step: int) -> tuple:
        prog = self.program
        mode = prog.mode
        stats: dict[str, float] = {}
        ids_l, c1_l, c2_l, dp_l = [], [], [], []
        if self.pool is not None:
            results = list(self.pool.map(self._scatter_part, self.parts))
        else:
            results = [self._scatter_part(p) for p in self.parts]
        for ids_p, c1_p, c2_p, dp_p, stats_p in results:
            for k, v in stats_p.items():
                stats[k] = stats.get(k, 0.0) + v
            if ids_p is None:
                continue
            ids_l.append(ids_p)
            c1_l.append(c1_p)
            if c2_p is not None:
                c2_l.append(c2_p)
            dp_l.append(dp_p)

        if not ids_l:
            z = np.zeros(self.P + 1, dtype=np.int64)
            e = np.empty(0, dtype=np.int64)
            if mode == "sum":
                return (z, e, np.empty(0, np.float64), stats)
            if mode == "min":
                return (z, e, e, stats)
            return (z, e, e, e, stats)

        ids = np.concatenate(ids_l)
        dp = np.concatenate(dp_l)
        c1 = np.concatenate(c1_l)
        if mode in ("sum", "min"):
            # combine duplicate destinations across this worker's owned
            # source partitions (same id may appear once per part) —
            # shrinks the bundle AND keeps gather's indexed updates safe
            order = np.lexsort((ids, dp))
            ids, dp, c1 = ids[order], dp[order], c1[order]
            runs = np.flatnonzero(
                np.r_[True, (ids[1:] != ids[:-1]) | (dp[1:] != dp[:-1])]
            )
            if mode == "sum":
                c1 = np.add.reduceat(c1, runs)
            else:
                c1 = np.minimum.reduceat(c1, runs)
            ids, dp = ids[runs], dp[runs]
            offsets = np.r_[
                np.searchsorted(dp, np.arange(self.P)), len(dp)
            ].astype(np.int64)
            return (offsets, ids, c1, stats)
        # mode aggregation: duplicates of (dst, lab) across owned parts
        # are summed by the gather-side groupby
        order = np.argsort(dp, kind="stable")
        ids, dp = ids[order], dp[order]
        c1 = c1[order]
        c2 = np.concatenate(c2_l)[order]
        offsets = np.r_[
            np.searchsorted(dp, np.arange(self.P)), len(dp)
        ].astype(np.int64)
        return (offsets, ids, c1, c2, stats)

    # -- gather -----------------------------------------------------------

    def gather(self, step: int, do_ckpt: bool, bundle_refs: list) -> dict:
        # refs arrive as a plain list (ONE task arg): resolving W bundles
        # with a single batched ray.get inside the actor is far cheaper
        # than W per-task argument dependencies resolved at dispatch
        bundles = ray.get(list(bundle_refs))
        prog = self.program
        mode = prog.mode
        ctx = dict(self.static_ctx)
        ctx["step"] = step
        stat_sum: dict[str, float] = {}
        for b in bundles:
            for k, v in b[-1].items():
                stat_sum[k] = stat_sum.get(k, 0.0) + v
        ctx.update(stat_sum)

        if self.pool is not None:
            results = list(
                self.pool.map(
                    lambda p: self._gather_part(p, bundles, ctx), self.parts
                )
            )
        else:
            results = [self._gather_part(p, bundles, ctx) for p in self.parts]

        n_msgs = 0
        out_metrics: dict[str, float] = {}
        for p, (part_msgs, metrics, new_state) in zip(self.parts, results):
            n_msgs += part_msgs
            hist = self._history[p]
            hist[step + 1] = new_state
            for old in [k for k in hist if k <= step + 1 - self._keep_states]:
                del hist[old]
            if do_ckpt:
                self._ckpt_async(p, new_state, step + 1)
            for k, v in metrics.items():
                if k.startswith("max_"):
                    out_metrics[k] = max(out_metrics.get(k, float("-inf")), v)
                else:
                    out_metrics[k] = out_metrics.get(k, 0.0) + v

        row = {"n_msgs": n_msgs}
        row.update(out_metrics)
        return row

    def _gather_part(self, p: int, bundles: list, ctx: dict):
        prog = self.program
        mode = prog.mode
        if True:
            blk = self.blocks[p]
            sids = blk.state_ids
            n = len(sids)
            n_msgs = 0
            if mode in ("sum", "min"):
                # concatenate all W slices for this part, then ONE
                # indexed reduction — cost is O(n + msgs) per part,
                # independent of the worker count (a per-bundle buffer
                # pass would redo O(n) work W times)
                ids_l2, vals_l2 = [], []
                for b in bundles:
                    off = b[0]
                    if off[p + 1] > off[p]:
                        ids_l2.append(b[1][off[p]: off[p + 1]])
                        vals_l2.append(b[2][off[p]: off[p + 1]])
                if ids_l2:
                    ids = np.concatenate(ids_l2)
                    vals = np.concatenate(vals_l2)
                    n_msgs += len(ids)
                    # combine duplicate destinations (once per sender)
                    # in O(msgs log msgs) — no O(n_vertices) buffers
                    order = np.argsort(ids, kind="stable")
                    ids_s = ids[order]
                    vals_s = vals[order]
                    runs = np.flatnonzero(np.r_[True, ids_s[1:] != ids_s[:-1]])
                    if mode == "sum":
                        agg = np.add.reduceat(vals_s, runs)
                    else:
                        agg = np.minimum.reduceat(vals_s, runs)
                    reduced = pd.DataFrame({"id": ids_s[runs], "agg": agg})
                else:
                    reduced = pd.DataFrame(
                        {"id": np.empty(0, np.int64), "agg": np.empty(0, np.float64)}
                    )
            else:
                frames = []
                for b in bundles:
                    off = b[0]
                    sl = slice(off[p], off[p + 1])
                    if off[p + 1] > off[p]:
                        frames.append(
                            pd.DataFrame(
                                {"id": b[1][sl], "lab": b[2][sl], "wt": b[3][sl]}
                            )
                        )
                        n_msgs += off[p + 1] - off[p]
                if frames:
                    allm = pd.concat(frames, ignore_index=True)
                    reduced = allm.groupby(
                        ["id", "lab"], sort=True, as_index=False
                    )["wt"].sum()
                else:
                    reduced = pd.DataFrame(
                        {"id": np.empty(0, np.int64), "lab": np.empty(0, np.int64),
                         "wt": np.empty(0, np.int64)}
                    )
            new_state, metrics = prog.gather_update(blk.state, reduced, ctx)
            blk.state = new_state
            blk.state_ids = new_state["id"].to_numpy()
            return n_msgs, metrics, new_state

    def advance(self, step: int, do_ckpt: bool, bundle_refs: list) -> tuple:
        """Pipelined superstep: gather step ``step`` from the W scatter
        bundles (updating state to step+1), then immediately scatter for
        step+1.  Returns (next_bundle, metrics) as two objects so the
        driver fetches only the tiny metrics dict."""
        t0 = time.perf_counter()
        metrics = self.gather(step, do_ckpt, bundle_refs)
        t1 = time.perf_counter()
        out = self.scatter(step + 1)
        t2 = time.perf_counter()
        metrics["gather_sec"] = round(t1 - t0, 5)
        metrics["scatter_sec"] = round(t2 - t1, 5)
        metrics["max_worker_busy_sec"] = round(t2 - t0, 5)
        return out, metrics

    def checkpoint_at(self, step: int) -> list[int]:
        """Durably write the state AT ``step`` from the rolling history
        (exact even when pipelined waves ran past it)."""
        self.flush()
        for p in self.parts:
            state = self._history[p].get(step)
            if state is None:
                raise RuntimeError(
                    f"state for step {step} no longer in history (part {p})"
                )
            atomic_write_parquet(
                pa.Table.from_pandas(state, preserve_index=False),
                fsio.join(state_dir(self.workdir, step), f"part={p}.parquet"),
                fs=self.fs,
            )
        return self.parts


class ActorSuperstepEngine(SuperstepEngine):
    """Superstep engine on persistent shard workers.

    Same prepare()/manifest/checkpoint protocol as the Dataset backend;
    only the superstep loop differs.  ``num_workers`` defaults to
    min(cluster CPUs, P) whole-CPU actors.  ``checkpoint_every`` trades
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
        num_workers: int | None = None,
        worker_threads: int | None = None,
        run_metadata: dict | None = None,
        filesystem=None,
    ):
        if num_partitions < 2:
            raise ValueError("actor backend needs num_partitions >= 2")
        if program.mode in ("vecmax", "vecor", "vecsum"):
            raise NotImplementedError(
                "vector-message programs (HyperBall family, multi-lane "
                "Brandes) run on the Dataset backend only — pass "
                "backend='dataset'"
            )
        super().__init__(
            workdir, program, num_partitions, max_steps,
            run_metadata=run_metadata, filesystem=filesystem,
        )
        self.checkpoint_every = checkpoint_every
        self.num_workers = num_workers
        self.worker_threads = worker_threads

    def run(self, resume: bool = False) -> "ray.data.Dataset":
        manifest = load_manifest(self.workdir, fs=self.fs)
        if manifest is None:
            raise RuntimeError(f"no manifest in {self.workdir}; call prepare() first")
        if resume:
            want = self.program.config()
            if manifest.config != want or manifest.algo != self.program.name:
                raise RuntimeError(
                    f"refusing to resume: manifest config {manifest.config} "
                    f"(algo {manifest.algo}) != requested {want} ({self.program.name})"
                )
            # checkpoint writes are async: anchor on the newest step whose
            # state dir is complete on disk and truncate any manifest
            # entries that outran their files
            self._anchor_resume(manifest)
        P = manifest.num_partitions
        program = self.program
        n_vertices = manifest.steps[0]["n_vertices"]
        n_edges = manifest.steps[0]["n_edges"]
        step = manifest.steps[-1]["step"]

        last_metrics = manifest.steps[-1]
        if last_metrics.get("kind") != "init" and program.converged(last_metrics):
            manifest.status = "converged"
            save_manifest(self.workdir, manifest, fs=self.fs)
            return self.final_state(step)

        cpus = int(ray.cluster_resources().get("CPU", P))
        # default single-threaded workers: measured on this box, intra-
        # worker threads don't pay (GIL on the small per-part ops +
        # shared memory bus); whole-CPU workers keep the parallelism
        # accounting honest
        threads = self.worker_threads or int(os.environ.get("NWR_WORKER_THREADS", "0")) or 1
        # worker count must leave room for num_cpus=threads per actor or
        # part of the pool never schedules and the first wave hangs
        W = self.num_workers or int(os.environ.get("NWR_NUM_WORKERS", "0")) or max(
            1, min(cpus // threads, P)
        )
        static_ctx = {"n": n_vertices}
        workers = [
            ShardWorker.options(num_cpus=threads).remote(
                self.workdir, list(range(w, P, W)), P, program, step, static_ctx,
                threads, self.fs,
            )
            for w in range(W)
        ]
        # Pipelined superstep waves: wave k = advance(k) on every worker
        # (gather step k -> state k+1, then scatter for k+1).  Per-actor
        # task ordering + bundle refs as arguments give Ray the full
        # dependency graph, so up to `depth` waves stream without a
        # driver barrier; the driver consumes metrics `depth` waves
        # behind and stops submitting once converged (the ≤depth
        # speculative waves beyond convergence are discarded — their
        # checkpoints are just unused files).  The exact converged state
        # is flushed from the workers' rolling state history even when
        # speculative waves ran past it.
        depth = int(os.environ.get("NWR_PIPELINE_DEPTH", "8"))
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
                        fsio.makedirs(state_dir(self.workdir, k + 1), fs=self.fs)
                        last_ckpt = k + 1
                    rets = [
                        w.advance.options(num_returns=2).remote(k, do_ckpt, list(bundles))
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
                    if col == "n_msgs":
                        continue
                    if col.startswith("max_"):
                        step_metrics[col] = float(mdf[col].max())
                    else:
                        step_metrics[col] = float(mdf[col].sum())
                manifest.steps.append(step_metrics)
                program.update_ctx(self.ctx, step_metrics)
                if do_ckpt:
                    save_manifest(self.workdir, manifest, fs=self.fs)
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
                fsio.makedirs(state_dir(self.workdir, final_step), fs=self.fs)
                ray.get([w.checkpoint_at.remote(final_step) for w in workers])
                manifest.steps[-1]["checkpointed"] = True
            else:
                # drain async checkpoint writers before workers die
                ray.get([w.flush.remote() for w in workers])
            save_manifest(self.workdir, manifest, fs=self.fs)
        finally:
            for w in workers:
                ray.kill(w)
        return self.final_state(manifest.steps[-1]["step"])
