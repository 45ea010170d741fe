"""Filesystem-agnostic I/O for superstep workdirs (VERDICT r3 #1).

Every superstep artifact — edge partitions, per-step vertex-state
Parquet, the JSON manifest — historically went through plain ``os`` /
local-file calls, which silently assumes the driver and every shard
worker share one filesystem.  True on a single node; false on the
fixed-size multi-node cluster this engine targets (the reference's
analogous single-writer store-dir assumption is
``importer/BatchGraphImporter.java:90-125`` — exactly what the engine
exists to outgrow).

This module routes every workdir access through ``pyarrow.fs`` so a
workdir can be

- a plain local path (``/tmp/wd`` — the default, bit-identical
  behavior to the old code),
- a filesystem URI (``file:///…``, ``s3://bucket/wd`` — resolved per
  access with ``FileSystem.from_uri``; workers resolve independently,
  so nothing node-local is captured in task closures), or
- an explicit ``pyarrow.fs.FileSystem`` instance threaded through the
  engine (e.g. a ``SubTreeFileSystem`` in tests, or an ``S3FileSystem``
  with credentials) paired with a path inside it.

Atomicity: on filesystems with atomic rename (local and wrappers over
it) writes go temp-file + ``move`` as before.  Object stores have no
rename but their object PUT is already all-or-nothing (a reader never
sees a torn object), so there the write goes direct — same crash
contract either way: a killed writer never leaves a torn visible file.
"""

from __future__ import annotations

import json
import posixpath
from typing import Any

from pyarrow import fs as pafs


def resolve(path: str, fs: pafs.FileSystem | None = None) -> tuple[pafs.FileSystem, str]:
    """(filesystem, in-filesystem path) for a workdir path.

    ``fs`` given → used as-is (``path`` is relative to it).  Otherwise
    a ``scheme://`` path resolves via ``FileSystem.from_uri`` and a
    plain path is local.  Resolution is per-call and stateless, so task
    bodies on remote nodes resolve identically from the same string."""
    if fs is not None:
        return fs, path
    if "://" in str(path):
        return pafs.FileSystem.from_uri(path)
    return pafs.LocalFileSystem(), str(path)


def join(base: str, *parts: str) -> str:
    """Path join that works for local paths, URIs, and fs-relative
    paths alike (all are '/'-separated on every backend we target)."""
    return posixpath.join(base, *parts)


def exists(path: str, fs: pafs.FileSystem | None = None) -> bool:
    f, p = resolve(path, fs)
    return f.get_file_info(p).type != pafs.FileType.NotFound


def isdir(path: str, fs: pafs.FileSystem | None = None) -> bool:
    f, p = resolve(path, fs)
    return f.get_file_info(p).type == pafs.FileType.Directory


def listdir(path: str, fs: pafs.FileSystem | None = None) -> list[str]:
    """Base names of the direct children of ``path`` (empty if the
    directory does not exist)."""
    f, p = resolve(path, fs)
    try:
        infos = f.get_file_info(pafs.FileSelector(p, recursive=False))
    except FileNotFoundError:
        return []
    return [info.base_name for info in infos]


def makedirs(path: str, fs: pafs.FileSystem | None = None) -> None:
    f, p = resolve(path, fs)
    f.create_dir(p, recursive=True)


def remove(path: str, fs: pafs.FileSystem | None = None) -> None:
    """Delete one file, ignoring ONLY a missing target.  Any other
    failure (permissions, I/O) propagates: callers delete stale data
    before writing fresh data, and a swallowed failure there would let
    stale partitions silently merge into later directory reads."""
    f, p = resolve(path, fs)
    try:
        f.delete_file(p)
    except FileNotFoundError:
        pass


def rmtree(path: str, fs: pafs.FileSystem | None = None) -> None:
    """Recursive delete, ignoring ONLY a missing target (see
    :func:`remove` for why other errors must propagate)."""
    f, p = resolve(path, fs)
    try:
        f.delete_dir(p)
    except FileNotFoundError:
        pass


def _rename_is_atomic(f: pafs.FileSystem) -> bool:
    """Whether ``move`` on this filesystem is an atomic rename.  Local
    (and wrappers that delegate to it) rename atomically; object stores
    emulate move as copy+delete, where a direct write is the atomic
    primitive instead."""
    while isinstance(f, pafs.SubTreeFileSystem):
        f = f.base_fs
    return f.type_name in ("local", "mock")


def write_table_atomic(table, path: str, fs: pafs.FileSystem | None = None) -> None:
    """Write Parquet with never-torn visibility — temp + rename where
    rename is atomic, direct PUT where the object write itself is.
    Idempotent under Ray task retries (same write → same file).
    Column stats are skipped: checkpoint files are always read whole."""
    import pyarrow.parquet as pq

    f, p = resolve(path, fs)
    if _rename_is_atomic(f):
        tmp = p + ".tmp"
        with f.open_output_stream(tmp) as out:
            pq.write_table(table, out, write_statistics=False)
        f.move(tmp, p)
    else:
        with f.open_output_stream(p) as out:
            pq.write_table(table, out, write_statistics=False)


def read_table(path: str, columns: list[str] | None = None,
               fs: pafs.FileSystem | None = None):
    import pyarrow.parquet as pq

    f, p = resolve(path, fs)
    return pq.read_table(p, columns=columns, filesystem=f)


def write_json_atomic(obj: Any, path: str, fs: pafs.FileSystem | None = None) -> None:
    f, p = resolve(path, fs)
    data = json.dumps(obj, indent=1).encode("utf-8")
    if _rename_is_atomic(f):
        tmp = p + ".tmp"
        with f.open_output_stream(tmp) as out:
            out.write(data)
        f.move(tmp, p)
    else:
        with f.open_output_stream(p) as out:
            out.write(data)


def read_json(path: str, fs: pafs.FileSystem | None = None) -> Any:
    f, p = resolve(path, fs)
    with f.open_input_stream(p) as inp:
        return json.loads(inp.read().decode("utf-8"))


def ray_read_parquet(path: str, fs: pafs.FileSystem | None = None, **kwargs):
    """``ray.data.read_parquet`` over a workdir path: URIs pass through
    natively; an explicit filesystem is forwarded."""
    import ray.data

    if fs is not None:
        return ray.data.read_parquet(path, filesystem=fs, **kwargs)
    return ray.data.read_parquet(path, **kwargs)
