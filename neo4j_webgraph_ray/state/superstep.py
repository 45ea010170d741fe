"""Superstep harness: iterative vertex programs as Ray Data pipelines.

The engine core (SURVEY.md §7.3 step 4).  A graph algorithm is a
:class:`VertexProgram`; one superstep is

    scatter  — P tasks, one per source partition: load that partition's
               CSR edge block + vertex-state Parquet, propagate each
               vertex's scatter value along its out-edges and
               PRE-AGGREGATE messages by destination inside the
               partition (numpy reduceat — the salted/partial-combine
               step, so a hub destination receives at most P partial
               rows instead of one per in-edge);
    shuffle  — hash partition messages on destination-vertex id
               (``dst % P``) — the one all-to-all exchange per superstep;
    gather   — per destination partition: final-combine messages
               (sum/min/mode), apply the program's update against the
               old state, write ``state/step=K+1/part=p.parquet``
               atomically, emit a metrics row.

State never materializes globally: each superstep reads partitioned
Parquet and writes partitioned Parquet, so lineage stays one superstep
deep and every superstep is a checkpoint (resume = continue from the
last manifest entry).  Partitioning key is the hashed vertex id on both
sides: edges by ``src % P`` (scatter locality), state by ``id % P``
(gather ownership) — one partitioning scheme reused across all stages.

Reference contrast: the reference has no iterative analytics (its README
queries are one-shot Cypher scans); its closest mechanism is the
incremental degree counters (``PageNode.java:215-227``), which here are
a special case of a one-superstep sum program.
"""

from __future__ import annotations

import time
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from neo4j_webgraph_ray.state import fsio
from neo4j_webgraph_ray.state.checkpoint import (
    Manifest,
    atomic_write_parquet,
    edges_dir,
    load_manifest,
    save_manifest,
    state_dir,
)

SENTINEL_DST = np.iinfo(np.int64).min  # marker rows so every partition gathers


def part_of(ids: np.ndarray, num_partitions: int) -> np.ndarray:
    return np.mod(ids, num_partitions).astype(np.int32)


class VertexProgram:
    """Base vertex program.  Subclasses set ``name``, ``undirected``,
    ``mode`` ('sum' | 'min' | 'mode' | 'vecmax' | 'vecor') and implement
    the four hooks.  State DataFrames are always sorted by ``id``
    within a partition.

    Vector modes (HyperBall-family sketches, multi-lane Brandes):
    ``scatter_values`` returns a contiguous 2-D array of shape
    (n_vertices, vec_width) ``uint8`` — or (n_vertices, vec_width/8)
    ``float64`` for vecsum; messages are elementwise-``max`` (vecmax —
    HLL registers), bitwise-``or`` (vecor — exact bitsets), or
    elementwise float64 ``sum`` (vecsum — per-lane numeric
    accumulation, e.g. one shortest-path-count lane per sampled
    betweenness source) combined, shipped as
    ``fixed_size_binary(vec_width)`` (vec_width is always BYTES; a
    vecsum program sets vec_width = 8 × lanes).  ``gather_update``
    receives ``reduced`` as a DataFrame with column ``id`` plus the
    combined (k, vec_width) uint8 — or (k, lanes) float64 — matrix in
    ``reduced.attrs["vec"]`` (aligned row-for-row with ``id``).
    Vector programs run on the Dataset backend only.
    """

    name: str = "base"
    undirected: bool = False
    mode: str = "sum"
    vec_width: int = 0  # bytes per message vector (vecmax/vecor only)

    def config(self) -> dict[str, Any]:
        return {}

    def init_state(self, ids: np.ndarray, out_deg: np.ndarray, ctx: dict) -> pd.DataFrame:
        raise NotImplementedError

    def scatter_values(self, state: pd.DataFrame) -> np.ndarray:
        raise NotImplementedError

    def gather_update(
        self, state: pd.DataFrame, reduced: pd.DataFrame, ctx: dict
    ) -> tuple[pd.DataFrame, dict[str, float]]:
        """reduced: DataFrame (id, agg) — one row per destination vertex
        that received messages; for mode-aggregation (id, lab, wt) rows."""
        raise NotImplementedError

    def init_metrics(self, state: pd.DataFrame) -> dict[str, float]:
        return {}

    def payload_stats(self, state: pd.DataFrame) -> dict[str, float]:
        """Per-partition scalars attached to every scatter payload; the
        gatherer sums them over its P inboxes to recover global values
        (e.g. PageRank dangling mass) without a driver round-trip."""
        return {}

    def converged(self, step_metrics: dict[str, float]) -> bool:
        raise NotImplementedError

    def update_ctx(self, ctx: dict, step_metrics: dict[str, float]) -> None:
        pass


# --------------------------------------------------------------------------
# scatter / gather task bodies (module-level => cheaply picklable)
# --------------------------------------------------------------------------


def _load_state(workdir: str, step: int, part: int, fs=None) -> pd.DataFrame:
    path = fsio.join(state_dir(workdir, step), f"part={part}.parquet")
    return fsio.read_table(path, fs=fs).to_pandas()


def _scatter_batch(
    batch: pa.Table,
    *,
    workdir: str,
    step: int,
    num_partitions: int,
    program: VertexProgram,
    fs=None,
) -> pa.Table:
    outs: list[pa.Table] = []
    for part in batch["id"].to_pylist():
        epath = fsio.join(edges_dir(workdir), f"part={part}.parquet")
        ew = None
        if fsio.exists(epath, fs=fs):
            et = fsio.read_table(epath, fs=fs)
            src = et["src"].to_numpy()
            dst = et["dst"].to_numpy()  # sorted by dst at prepare time
            if "weight" in et.column_names:
                ew = et["weight"].to_numpy()
        else:
            src = dst = np.empty(0, dtype=np.int64)
        state = _load_state(workdir, step, part, fs=fs)
        state_ids = state["id"].to_numpy()
        if len(src):
            svals = program.scatter_values(state)
            eidx = np.searchsorted(state_ids, src)
            evals = svals[eidx]
            if ew is not None and program.mode == "sum":
                # weighted sum-mode message = scatter value × edge weight
                evals = evals * ew
            elif ew is not None and program.mode == "min" and getattr(
                program, "weighted_min", False
            ):
                # min-plus semiring (weighted SSSP): message = value +
                # integer edge weight — pure int64 so both backends are
                # bit-identical (float weights are truncated by contract)
                evals = evals.astype(np.int64) + ew.astype(np.int64)
            # run-boundary pre-aggregation by dst (dst is sorted)
            starts = np.flatnonzero(np.r_[True, dst[1:] != dst[:-1]])
            dst_u = dst[starts]
            if program.mode == "sum":
                agg = np.add.reduceat(evals, starts)
                t = pa.table(
                    {
                        "dst": pa.array(dst_u, type=pa.int64()),
                        "fval": pa.array(agg.astype(np.float64)),
                        "dst_part": pa.array(part_of(dst_u, num_partitions)),
                    }
                )
            elif program.mode == "min":
                agg = np.minimum.reduceat(evals, starts)
                t = pa.table(
                    {
                        "dst": pa.array(dst_u, type=pa.int64()),
                        "lab": pa.array(agg.astype(np.int64)),
                        "dst_part": pa.array(part_of(dst_u, num_partitions)),
                    }
                )
            elif program.mode in ("vecmax", "vecor", "vecsum"):
                # evals is (E, vec_width) uint8 — or (E, vec_width/8)
                # float64 for vecsum; run-boundary combine along axis 0
                # keeps the exchange one pre-aggregated vector per
                # (partition, dst)
                op = {
                    "vecmax": np.maximum,
                    "vecor": np.bitwise_or,
                    "vecsum": np.add,
                }[program.mode]
                agg = np.ascontiguousarray(op.reduceat(evals, starts, axis=0))
                if program.mode == "vecsum":
                    agg = agg.astype(np.float64, copy=False)
                vec = pa.Array.from_buffers(
                    pa.binary(program.vec_width),
                    len(dst_u),
                    [None, pa.py_buffer(agg.tobytes())],
                )
                t = pa.table(
                    {
                        "dst": pa.array(dst_u, type=pa.int64()),
                        "vec": vec,
                        "dst_part": pa.array(part_of(dst_u, num_partitions)),
                    }
                )
            else:  # mode-aggregation: pre-sum weights per (dst, label)
                pairs = pd.DataFrame({"dst": dst, "lab": evals.astype(np.int64)})
                cnt = pairs.groupby(["dst", "lab"], sort=False).size().reset_index(name="wt")
                t = pa.table(
                    {
                        "dst": pa.array(cnt["dst"].to_numpy(), type=pa.int64()),
                        "lab": pa.array(cnt["lab"].to_numpy(), type=pa.int64()),
                        "wt": pa.array(cnt["wt"].to_numpy(), type=pa.int64()),
                        "dst_part": pa.array(
                            part_of(cnt["dst"].to_numpy(), num_partitions)
                        ),
                    }
                )
            outs.append(t)
    if not outs:
        return _marker_table(
            np.empty(0, dtype=np.int32), program.mode, program.vec_width
        )
    return pa.concat_tables(outs)


def _marker_table(parts: np.ndarray, mode: str, vec_width: int = 0) -> pa.Table:
    n = len(parts)
    cols = {
        "dst": pa.array(np.full(n, SENTINEL_DST, dtype=np.int64)),
    }
    if mode == "sum":
        cols["fval"] = pa.array(np.zeros(n, dtype=np.float64))
    elif mode in ("vecmax", "vecor", "vecsum"):
        # zero bytes are the identity for max, or, AND float64 sum
        cols["vec"] = pa.Array.from_buffers(
            pa.binary(vec_width), n, [None, pa.py_buffer(bytes(n * vec_width))]
        )
    else:
        cols["lab"] = pa.array(np.zeros(n, dtype=np.int64))
        if mode == "mode":
            cols["wt"] = pa.array(np.zeros(n, dtype=np.int64))
    cols["dst_part"] = pa.array(parts.astype(np.int32))
    return pa.table(cols)


def _gather_group(
    df: pd.DataFrame,
    *,
    workdir: str,
    step: int,
    program: VertexProgram,
    ctx: dict,
    fs=None,
) -> pd.DataFrame:
    part = int(df["dst_part"].iloc[0])
    df = df[df["dst"] != SENTINEL_DST]
    n_msgs = len(df)
    if program.mode == "sum":
        reduced = df.groupby("dst", sort=True, as_index=False)["fval"].sum()
        reduced = reduced.rename(columns={"dst": "id", "fval": "agg"})
    elif program.mode in ("vecmax", "vecor", "vecsum"):
        m_w = program.vec_width
        vdt = np.float64 if program.mode == "vecsum" else np.uint8
        lanes = m_w // 8 if program.mode == "vecsum" else m_w
        dsts = df["dst"].to_numpy()
        if len(dsts):
            vecs = np.frombuffer(
                b"".join(df["vec"].tolist()), dtype=vdt
            ).reshape(len(dsts), lanes)
            order = np.argsort(dsts, kind="stable")
            dsts = dsts[order]
            vecs = vecs[order]
            starts = np.flatnonzero(np.r_[True, dsts[1:] != dsts[:-1]])
            op = {
                "vecmax": np.maximum,
                "vecor": np.bitwise_or,
                "vecsum": np.add,
            }[program.mode]
            agg = op.reduceat(vecs, starts, axis=0)
            reduced = pd.DataFrame({"id": dsts[starts]})
        else:
            agg = np.empty((0, lanes), dtype=vdt)
            reduced = pd.DataFrame({"id": np.empty(0, dtype=np.int64)})
        reduced.attrs["vec"] = agg
    elif program.mode == "min":
        reduced = df.groupby("dst", sort=True, as_index=False)["lab"].min()
        reduced = reduced.rename(columns={"dst": "id", "lab": "agg"})
    else:
        reduced = (
            df.groupby(["dst", "lab"], sort=True, as_index=False)["wt"].sum()
            .rename(columns={"dst": "id"})
        )
    state = _load_state(workdir, step, part, fs=fs)
    new_state, metrics = program.gather_update(state, reduced, ctx)
    out_path = fsio.join(state_dir(workdir, step + 1), f"part={part}.parquet")
    atomic_write_parquet(
        pa.Table.from_pandas(new_state, preserve_index=False), out_path, fs=fs
    )
    row = {"part": part, "n_msgs": n_msgs}
    row.update(metrics)
    return pd.DataFrame([row])


# --------------------------------------------------------------------------


class SuperstepEngine:
    """Drives a VertexProgram over a partitioned edge table with
    per-superstep checkpoints and resume."""

    def __init__(
        self,
        workdir: str,
        program: VertexProgram,
        num_partitions: int = 16,
        max_steps: int = 100,
        run_metadata: dict[str, Any] | None = None,
        filesystem=None,
    ):
        """``workdir`` may be a local path, a filesystem URI
        (``file://``/``s3://`` — every worker resolves it independently
        via ``pyarrow.fs``), or a path inside an explicit
        ``filesystem`` (any picklable ``pyarrow.fs.FileSystem``).  On a
        multi-node cluster the workdir MUST be a store all workers can
        reach (VERDICT r3 #1); a driver-local path only works when all
        workers share that filesystem."""
        self.workdir = workdir
        self.program = program
        self.num_partitions = num_partitions
        self.max_steps = max_steps
        self.run_metadata = dict(run_metadata or {})
        self.fs = filesystem
        self.ctx: dict[str, Any] = {}

    # -- prepare ----------------------------------------------------------

    def prepare(self, edges: ray.data.Dataset, dedup: bool = False) -> Manifest:
        """Partition edges by src, build initial vertex state, write
        manifest step 0.  ``edges`` needs int64 ``src``/``dst`` columns.

        ``dedup=True`` folds exact (src, dst) dedup into the partition
        write — every src key is owned by exactly one partition, so
        per-partition dedup IS global dedup.  This saves a full shuffle
        when the input is a raw (pre-dedup) edge derivation; it is only
        valid for directed programs (for undirected the doubling happens
        before partitioning, which would merge genuine multi-edges).
        Input already deduplicated → leave the default.

        The vertex/degree pass reads the freshly written partition files
        back instead of re-executing the upstream derivation, so the
        input pipeline executes exactly once end-to-end."""
        if dedup and self.program.undirected:
            raise ValueError("dedup-in-prepare is only supported for directed programs")
        P = self.num_partitions
        workdir = self.workdir
        fs = self.fs
        # a fresh prepare owns the workdir: stale partition/state files
        # from a previous run (different input or partition count) must
        # not silently merge into the new graph
        for sub in ("edges", "state", "vertices"):
            fsio.rmtree(fsio.join(workdir, sub), fs=fs)
        fsio.makedirs(edges_dir(workdir), fs=fs)
        fsio.makedirs(state_dir(workdir, 0), fs=fs)
        undirected = self.program.undirected

        # optional per-edge weights: a float64/int "weight" column on the
        # input flows into the partition files; sum-mode scatter then
        # multiplies each message by its edge weight and out_deg becomes
        # the OUT-WEIGHT sum (weighted programs read it as float).
        # min/mode/vector modes ignore weights.  Detected PER BATCH, not
        # via Dataset.schema(): schema() on a lazy Dataset executes the
        # upstream plan nearly in full to fetch metadata (measured: 18/20
        # blocks of a 20-block map ran for one schema() call), which
        # doubled the edge-derivation cost of every prepare().  A
        # Dataset's schema is uniform across batches, so the per-batch
        # check is equivalent.
        def add_part(t: pa.Table) -> pa.Table:
            src = t["src"].to_numpy()
            dst = t["dst"].to_numpy()
            cols = {}
            if "weight" in t.column_names:
                w = t["weight"].to_numpy().astype(np.float64)
                if undirected:
                    w = np.r_[w, w]
                cols["weight"] = pa.array(w, type=pa.float64())
            if undirected:
                src, dst = np.r_[src, dst], np.r_[dst, src]
            return pa.table(
                {
                    "src": pa.array(src, type=pa.int64()),
                    "dst": pa.array(dst, type=pa.int64()),
                    **cols,
                    "part": pa.array(part_of(src, P)),
                }
            )

        def write_edge_part(df: pd.DataFrame) -> pd.DataFrame:
            part = int(df["part"].iloc[0])
            if dedup:
                df = df.drop_duplicates(["src", "dst"])
            df = df.sort_values("dst", kind="stable")  # dst-sorted => reduceat runs
            cols = {
                "src": pa.array(df["src"].to_numpy(), type=pa.int64()),
                "dst": pa.array(df["dst"].to_numpy(), type=pa.int64()),
            }
            if "weight" in df.columns:
                cols["weight"] = pa.array(
                    df["weight"].to_numpy(), type=pa.float64()
                )
            t = pa.table(cols)
            atomic_write_parquet(
                t, fsio.join(edges_dir(workdir), f"part={part}.parquet"), fs=fs
            )
            # cheap content fingerprint per partition (order-insensitive)
            fp = int(
                np.bitwise_xor.reduce(
                    (df["src"].to_numpy() * np.int64(31)) ^ df["dst"].to_numpy()
                )
            ) if len(df) else 0
            return pd.DataFrame([{"part": part, "n_edges": len(df), "fp": fp}])

        edge_parts = (
            edges.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("part")
            .map_groups(write_edge_part, batch_format="pandas")
        ).to_pandas()
        # a zero-edge input yields a columnless empty frame (groupby on
        # nothing): prepare must still produce a valid empty graph
        n_edges = int(edge_parts["n_edges"].sum()) if len(edge_parts) else 0
        fingerprint = {
            "n_edges": n_edges,
            "xor": int(np.bitwise_xor.reduce(edge_parts["fp"].to_numpy()))
            if len(edge_parts)
            else 0,
        }

        # vertex set + out-degree over the written partition files (the
        # on-disk table is already doubled for undirected programs and
        # deduped when requested — the upstream pipeline never re-runs)
        def endpoints(t: pa.Table) -> pa.Table:
            # reads the on-disk partition files, which carry the weight
            # column iff the input did — same per-batch detection
            weighted = "weight" in t.column_names
            src = t["src"].to_numpy()
            dst = t["dst"].to_numpy()
            ids = np.r_[src, dst]
            if weighted:
                # weighted graphs: out_deg becomes the OUT-WEIGHT sum
                w = t["weight"].to_numpy().astype(np.float64)
                out_c = np.r_[w, np.zeros(len(dst), dtype=np.float64)]
            else:
                out_c = np.r_[
                    np.ones(len(src), dtype=np.int64),
                    np.zeros(len(dst), dtype=np.int64),
                ]
            # local combine
            u, inv = np.unique(ids, return_inverse=True)
            deg = np.bincount(inv, weights=out_c)
            if not weighted:
                deg = deg.astype(np.int64)
            return pa.table(
                {
                    "id": pa.array(u, type=pa.int64()),
                    "out_c": pa.array(deg),
                    "part": pa.array(part_of(u, P)),
                }
            )

        program = self.program
        vdir = fsio.join(workdir, "vertices")
        fsio.makedirs(vdir, fs=fs)

        def write_vertex_part(df: pd.DataFrame) -> pd.DataFrame:
            part = int(df["part"].iloc[0])
            g = df.groupby("id", sort=True, as_index=False)["out_c"].sum()
            # endpoints() emitted out_c as float64 iff weighted; the
            # pandas sum preserves that dtype, so out_deg inherits it
            deg = g["out_c"].to_numpy()
            t = pa.table(
                {
                    "id": pa.array(g["id"].to_numpy(), type=pa.int64()),
                    "out_deg": pa.array(deg),
                }
            )
            atomic_write_parquet(t, fsio.join(vdir, f"part={part}.parquet"), fs=fs)
            return pd.DataFrame([{"part": part, "n_vertices": len(g)}])

        if n_edges:
            edges_on_disk = fsio.ray_read_parquet(edges_dir(workdir), fs=fs)
            vparts = (
                edges_on_disk.map_batches(
                    endpoints, batch_format="pyarrow", zero_copy_batch=True
                )
                .groupby("part")
                .map_groups(write_vertex_part, batch_format="pandas")
            ).to_pandas()
            n_vertices = int(vparts["n_vertices"].sum())
        else:
            n_vertices = 0  # no edge files to read back; empty graph

        # second pass, distributed: init state per part now that n is known
        self.ctx = {"n": n_vertices, "step": 0}
        ctx0 = dict(self.ctx)
        sdir0 = state_dir(workdir, 0)

        def init_part(batch: pa.Table) -> pa.Table:
            rows = []
            for part in batch["id"].to_pylist():
                vpath = fsio.join(vdir, f"part={part}.parquet")
                if fsio.exists(vpath, fs=fs):
                    vt = fsio.read_table(vpath, fs=fs)
                    ids = vt["id"].to_numpy()
                    out_deg = vt["out_deg"].to_numpy()
                else:
                    ids = np.empty(0, dtype=np.int64)
                    out_deg = np.empty(0, dtype=np.int64)
                st = program.init_state(ids, out_deg, ctx0)
                atomic_write_parquet(
                    pa.Table.from_pandas(st, preserve_index=False),
                    fsio.join(sdir0, f"part={part}.parquet"),
                    fs=fs,
                )
                rows.append({"part": part, **program.init_metrics(st)})
            return pa.Table.from_pylist(rows)

        init_df = (
            ray.data.range(P, override_num_blocks=P)
            .map_batches(init_part, batch_format="pyarrow")
            .to_pandas()
        )
        init_metrics = {
            col: float(init_df[col].sum()) for col in init_df.columns if col != "part"
        }

        manifest = Manifest(
            algo=program.name,
            num_partitions=P,
            config=program.config(),
            input_fingerprint=fingerprint,
            run_metadata=self.run_metadata,
            lineage=[
                "dedup_edges(src,dst)",
                f"partition(src % {P})" + (" [undirected-doubled]" if undirected else ""),
                f"{program.name} supersteps (scatter → shuffle(dst % {P}) → gather)",
            ],
            steps=[
                {
                    "step": 0,
                    "kind": "init",
                    "n_vertices": n_vertices,
                    "n_edges": n_edges,
                    **init_metrics,
                }
            ],
        )
        save_manifest(workdir, manifest, fs=fs)
        self._n_edges = n_edges
        return manifest

    # -- run --------------------------------------------------------------

    def run(self, resume: bool = False) -> ray.data.Dataset:
        """Iterate to convergence (or max_steps); returns final state.

        ``resume=True`` continues from the last checkpointed superstep;
        it refuses to resume if the manifest's config does not match
        (input fingerprint is bound at prepare time, so a changed input
        under the same workdir is caught by re-running prepare into a
        fresh workdir — or detected here via the stored fingerprint)."""
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
            # a crash can leave the manifest ahead of the (async) state
            # writes: anchor on the newest step fully present on disk
            self._anchor_resume(manifest)
        P = manifest.num_partitions
        program = self.program
        n_vertices = manifest.steps[0]["n_vertices"]
        n_edges = manifest.steps[0]["n_edges"]
        self.ctx = {"n": n_vertices}
        # replay ctx evolution over completed steps (e.g. dangling mass)
        for sm in manifest.steps:
            program.update_ctx(self.ctx, sm)
        step = manifest.steps[-1]["step"]
        while True:
            last_metrics = manifest.steps[-1]
            if last_metrics.get("kind") != "init" and program.converged(last_metrics):
                manifest.status = "converged"
                save_manifest(self.workdir, manifest, fs=self.fs)
                return self.final_state(step)
            if step >= self.max_steps:
                manifest.status = "max_steps"
                save_manifest(self.workdir, manifest, fs=self.fs)
                return self.final_state(step)
            t0 = time.perf_counter()
            self.ctx["step"] = step
            parts_ds = ray.data.range(P, override_num_blocks=P)
            workdir = self.workdir
            mode = program.mode
            msgs = parts_ds.map_batches(
                _scatter_batch,
                batch_format="pyarrow",
                fn_kwargs={
                    "workdir": workdir,
                    "step": step,
                    "num_partitions": P,
                    "program": program,
                    "fs": self.fs,
                },
            )
            markers = ray.data.from_arrow(
                _marker_table(np.arange(P, dtype=np.int32), mode, program.vec_width)
            )
            fsio.makedirs(state_dir(workdir, step + 1), fs=self.fs)
            ctx_snapshot = dict(self.ctx)
            metrics_df = (
                msgs.union(markers)
                .groupby("dst_part")
                .map_groups(
                    _gather_group,
                    batch_format="pandas",
                    fn_kwargs={
                        "workdir": workdir,
                        "step": step,
                        "program": program,
                        "ctx": ctx_snapshot,
                        "fs": self.fs,
                    },
                )
                .to_pandas()
            )
            wall = time.perf_counter() - t0
            # fixed summation order for float metric partials: map_groups
            # output order is not guaranteed, and a varying fold order
            # would make float metrics (nf_sum, dangling) run-dependent
            metrics_df = metrics_df.sort_values("part")
            step_metrics: dict[str, Any] = {
                "step": step + 1,
                "n_msgs": int(metrics_df["n_msgs"].sum()),
                "wall_sec": round(wall, 4),
                "edges_per_sec": round(n_edges / wall, 1) if wall > 0 else 0.0,
            }
            for col in metrics_df.columns:
                if col in ("part", "n_msgs"):
                    continue
                if col.startswith("max_"):
                    step_metrics[col] = float(metrics_df[col].max())
                else:
                    step_metrics[col] = float(metrics_df[col].sum())
            manifest.steps.append(step_metrics)
            program.update_ctx(self.ctx, step_metrics)
            save_manifest(self.workdir, manifest, fs=self.fs)
            step += 1

    def final_state(self, step: int | None = None) -> ray.data.Dataset:
        if step is None:
            manifest = load_manifest(self.workdir, fs=self.fs)
            step = manifest.steps[-1]["step"]
        return fsio.ray_read_parquet(state_dir(self.workdir, step), fs=self.fs)

    def _anchor_resume(self, manifest: Manifest) -> None:
        """Anchor resume on the newest step whose state dir is complete
        on disk; truncate manifest entries that outran their files (an
        interrupted async checkpoint can leave the manifest one step
        ahead).  Steps without a 'checkpointed' flag (Dataset backend)
        are durably written, hence candidates."""
        P = manifest.num_partitions
        for i in range(len(manifest.steps) - 1, -1, -1):
            s = manifest.steps[i]
            if s.get("kind") != "init" and not s.get("checkpointed", True):
                continue
            d = state_dir(self.workdir, s["step"])
            if fsio.isdir(d, fs=self.fs) and (
                sum(1 for f in fsio.listdir(d, fs=self.fs) if f.endswith(".parquet"))
                >= P
            ):
                if i < len(manifest.steps) - 1:
                    del manifest.steps[i + 1:]
                    manifest.status = "running"
                    save_manifest(self.workdir, manifest, fs=self.fs)
                return
        raise RuntimeError(f"no complete checkpoint found in {self.workdir}")
