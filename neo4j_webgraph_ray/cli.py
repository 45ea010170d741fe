"""CLI entry point — the ``ray job submit`` surface.

Reference lifecycle analog: ``Main.main`` → ``App.run`` parses CLI +
properties, runs the crawl-import, reports results
(``importer/Main.java:4-6``, ``importer/App.java:50-135``).  Here:

    ray job submit -- python -m neo4j_webgraph_ray build-graph \
        --input /data/transcripts --out /data/graph
    ray job submit -- python -m neo4j_webgraph_ray pagerank \
        --input /data/transcripts --workdir /data/pr [--resume]

Owns its Ray session (guarded init — under ``ray job submit`` the
cluster connection already exists)."""

from __future__ import annotations

import argparse
import json
import sys
import time


def _load_config_file(path: str) -> dict:
    """Layered config source (S6): JSON or ``key=value`` properties, the
    ``config.properties``-under-CLI-flags layering of the reference
    (``importer/ApplicationConfiguration.java:89-183``).  Keys use the
    CLI flag spelling (dashes or dots map to underscores)."""
    with open(path) as f:
        text = f.read()
    try:
        loaded = json.loads(text)
        if not isinstance(loaded, dict):
            raise ValueError(f"config file {path} must hold a JSON object")
        return {str(k).replace("-", "_").replace(".", "_"): v for k, v in loaded.items()}
    except json.JSONDecodeError:
        out: dict = {}
        for line in text.splitlines():
            line = line.strip()
            if not line or line.startswith(("#", "!")):
                continue
            k, sep, v = line.partition("=")
            if not sep:
                raise ValueError(f"bad properties line in {path}: {line!r}")
            out[k.strip().replace("-", "_").replace(".", "_")] = v.strip()
        return out


def _apply_config_defaults(parsers: list[argparse.ArgumentParser], cfg: dict) -> None:
    """Set file-config values as parser defaults so explicit CLI flags
    still win (flag > file > built-in default); a ``required`` arg
    satisfied by the file stops being required.

    This is the one place that touches argparse internals (``_actions``
    is stable-but-private; there is no public API for enumerating
    arguments).  Keys that match no argument on ANY subcommand warn
    loudly (ADVICE r2): a typo'd config key must not be silently
    ignored when the same typo as a CLI flag would error."""
    applied: set[str] = set()
    for p in parsers:
        for action in p._actions:
            if action.dest not in cfg:
                continue
            applied.add(action.dest)
            raw = cfg[action.dest]
            if isinstance(action, (argparse._StoreTrueAction, argparse._StoreFalseAction)):
                val = str(raw).strip().lower() in ("1", "true", "yes", "on")
            elif action.type is not None and isinstance(raw, str):
                val = action.type(raw)
            else:
                val = raw
            p.set_defaults(**{action.dest: val})
            action.required = False
    unknown = sorted(set(cfg) - applied)
    if unknown:
        print(
            f"warning: config keys matched no argument and were ignored: "
            f"{', '.join(unknown)}",
            file=sys.stderr,
        )


def _ray_session(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(include_dashboard=False, logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False


def _load_transcripts(path: str):
    from neo4j_webgraph_ray.sources.io import read_table_auto

    return read_table_auto(path)


def _edges_for_algo(args):
    """transcripts input -> cleaned -> derived+deduped edges; an edge
    parquet input (src/dst columns) is used as-is."""
    ds = _load_transcripts(args.input)
    cols = set(ds.schema().names)
    if {"src", "dst"} <= cols:
        return ds, None
    from neo4j_webgraph_ray.stages.derive import derive_edges
    from neo4j_webgraph_ray.stages.filters import clean_transcripts

    clean, rejects = clean_transcripts(ds)
    return derive_edges(clean, num_buckets=args.num_partitions), rejects


def cmd_build_graph(args) -> dict:
    from neo4j_webgraph_ray.pipelines.graph_tables import build_graph_fused, kind_index
    from neo4j_webgraph_ray.sources.io import write_partitioned, write_rejects
    from neo4j_webgraph_ray.stages.filters import clean_transcripts

    clean, rejects = clean_transcripts(_load_transcripts(args.input))
    # single-pass fused build (edges materialized inside); vertices fan
    # out to the vertex sink AND the auxiliary category index, so pin
    edges, vertices = build_graph_fused(clean, num_buckets=args.num_partitions)
    vertices = vertices.materialize()
    run_meta = {"entry": "cli", "command": "build-graph", "root_input": args.input}
    stats_e = write_partitioned(
        edges, f"{args.out}/edges", ["src", "dst"], args.num_partitions,
        resume=args.resume, run_metadata=run_meta,
    )
    stats_v = write_partitioned(
        vertices, f"{args.out}/vertices", ["id"], args.num_partitions,
        resume=args.resume, run_metadata=run_meta,
    )
    # category-index extension hook: auxiliary per-kind index dataset
    stats_k = write_partitioned(
        kind_index(vertices), f"{args.out}/kind_index", ["kind"], 4,
        resume=args.resume, run_metadata=run_meta,
    )
    n_rejects = write_rejects(rejects, f"{args.out}/rejects", resume=args.resume)
    return {"edges": stats_e, "vertices": stats_v, "kind_index": stats_k,
            "rejects": n_rejects}


def _run_algo(args, fn_name: str) -> dict:
    from neo4j_webgraph_ray.pipelines import algorithms
    from neo4j_webgraph_ray.state.checkpoint import load_manifest

    edges, _ = _edges_for_algo(args)
    fn = getattr(algorithms, fn_name)
    kwargs = dict(
        workdir=args.workdir,
        num_partitions=args.num_partitions,
        resume=args.resume,
        backend=args.backend,
        checkpoint_every=args.checkpoint_every,
        # ROOT_PAGE_REFERENCE analog: which entry point produced this
        # workdir, from which root input
        run_metadata={"entry": "cli", "command": fn_name, "root_input": args.input},
    )
    if fn_name == "pagerank":
        kwargs.update(damping=args.damping, tol=args.tol)
    t0 = time.perf_counter()
    state = fn(edges, **kwargs)
    manifest = load_manifest(args.workdir)
    sup = [s for s in manifest.steps if s.get("kind") != "init"]
    return {
        "algo": manifest.algo,
        "status": manifest.status,
        "n_vertices": manifest.steps[0]["n_vertices"],
        "n_edges": manifest.steps[0]["n_edges"],
        "supersteps": len(sup),
        "wall_sec": round(time.perf_counter() - t0, 3),
        "state_rows": state.count(),
        "workdir": args.workdir,
    }


def cmd_triangles(args) -> dict:
    from neo4j_webgraph_ray.pipelines.triangles import triangle_count

    edges, _ = _edges_for_algo(args)
    t0 = time.perf_counter()
    n = triangle_count(edges, num_buckets=args.num_partitions)
    return {"n_triangles": n, "wall_sec": round(time.perf_counter() - t0, 3)}


def cmd_enrich(args) -> dict:
    from neo4j_webgraph_ray.sources.io import write_partitioned, write_rejects
    from neo4j_webgraph_ray.stages.enrich import enrich, split_rejects

    ds = _load_transcripts(args.input)
    # materialize at the fan-out: split_rejects is consumed twice below
    # (enriched sink + rejects sink); without pinning, the actor-pool
    # enrichment — external calls, politeness throttle — runs twice.
    out = enrich(ds, args.stage, json.loads(args.stage_config),
                 concurrency=args.concurrency).materialize()
    clean, rejects = split_rejects(out)
    stats = write_partitioned(clean, f"{args.out}/enriched", [args.key_column],
                              args.num_partitions, resume=args.resume)
    n_rej = write_rejects(rejects, f"{args.out}/rejects", resume=args.resume)
    return {"enriched": stats, "rejects": n_rej}


def cmd_dedup(args) -> dict:
    """Training-data dedup from the job surface: exact / MinHash /
    n-gram-Jaccard / SimHash over a documents table, written through the
    resumable partitioned sink."""
    from neo4j_webgraph_ray.sources.io import read_table_auto, write_partitioned
    from neo4j_webgraph_ray.stages import dedup as dd

    docs = read_table_auto(args.input, columns=[args.id_column, args.text_column])
    kw = dict(text_col=args.text_column, id_col=args.id_column)
    if args.method == "exact":
        out = dd.exact_text_dedup(docs, num_buckets=args.num_partitions, **kw)
        key_cols = [args.id_column]
    elif args.method in ("minhash", "ngram"):
        out = dd.minhash_neardup_pairs(
            docs, tau=args.tau, char=(args.method == "ngram"),
            num_buckets=args.num_partitions, **kw,
        )
        key_cols = ["a", "b"]
    elif args.method == "simhash":
        out = dd.simhash_neardup_pairs(
            docs, max_hamming=args.max_hamming,
            num_buckets=args.num_partitions, **kw,
        )
        key_cols = ["a", "b"]
    else:  # pragma: no cover — argparse choices guard
        raise SystemExit(2)
    stats = write_partitioned(
        out, args.out, key_cols, args.num_partitions, resume=args.resume,
        run_metadata={"entry": "cli", "command": f"dedup:{args.method}",
                      "root_input": args.input},
    )
    return {"method": args.method, **stats}


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="neo4j_webgraph_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    p.add_argument("--config", default=None,
                   help="JSON or key=value properties file layered UNDER "
                        "explicit CLI flags (flag > file > default)")
    sub = p.add_subparsers(dest="cmd", required=True)
    all_parsers: list[argparse.ArgumentParser] = [p]

    def common(sp, workdir=False):
        all_parsers.append(sp)
        sp.add_argument("--input", required=True)
        sp.add_argument("--num-partitions", type=int, default=16)
        sp.add_argument("--resume", action="store_true")
        if workdir:
            sp.add_argument(
                "--workdir", required=True,
                help="superstep scratch/checkpoint dir — a local path or a "
                     "pyarrow.fs URI (file://, s3://); on a multi-node "
                     "cluster use a store all workers reach",
            )
            sp.add_argument("--backend", choices=["actors", "dataset"], default="actors")
            sp.add_argument("--checkpoint-every", type=int, default=1)

    sp = sub.add_parser("build-graph")
    common(sp)
    sp.add_argument("--out", required=True)

    sp = sub.add_parser("pagerank")
    common(sp, workdir=True)
    sp.add_argument("--damping", type=float, default=0.85)
    sp.add_argument("--tol", type=float, default=1e-6)

    for name in ("components", "labelprop"):
        common(sub.add_parser(name), workdir=True)

    sp = sub.add_parser("triangles")
    common(sp)

    sp = sub.add_parser("dedup")
    common(sp)
    sp.add_argument("--out", required=True)
    sp.add_argument("--method", choices=["exact", "minhash", "ngram", "simhash"],
                    default="exact")
    sp.add_argument("--tau", type=float, default=0.7)
    sp.add_argument("--max-hamming", type=int, default=3)
    sp.add_argument("--id-column", default="doc_id")
    sp.add_argument("--text-column", default="text")

    sp = sub.add_parser("enrich")
    common(sp)
    sp.add_argument("--out", required=True)
    sp.add_argument("--stage", default="neo4j_webgraph_ray.stages.enrich.StubSocialCountStage")
    sp.add_argument("--stage-config", default="{}")
    sp.add_argument("--key-column", default="key")
    sp.add_argument("--concurrency", type=int, default=4)

    # pre-scan for --config so its values become defaults BEFORE the
    # real parse — explicit flags then override them naturally
    pre = argparse.ArgumentParser(add_help=False)
    pre.add_argument("--config", default=None)
    pre_args, _ = pre.parse_known_args(argv)
    if pre_args.config:
        _apply_config_defaults(all_parsers, _load_config_file(pre_args.config))

    args = p.parse_args(argv)
    _ray_session(args.num_cpus)
    try:
        if args.cmd == "build-graph":
            out = cmd_build_graph(args)
        elif args.cmd == "pagerank":
            out = _run_algo(args, "pagerank")
        elif args.cmd == "components":
            out = _run_algo(args, "connected_components")
        elif args.cmd == "labelprop":
            out = _run_algo(args, "label_propagation")
        elif args.cmd == "triangles":
            out = cmd_triangles(args)
        elif args.cmd == "dedup":
            out = cmd_dedup(args)
        elif args.cmd == "enrich":
            out = cmd_enrich(args)
        else:  # pragma: no cover
            raise SystemExit(2)
        print(json.dumps(out))
        return 0
    finally:
        import ray

        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
