"""Transcript table sources.

The reference's only ingest path is an HTTP crawl
(``importer/App.java:259-283`` + ``importer/HtmlOnlyCrawler.java:147-176``);
this engine ingests Parquet multi-turn transcript tables with schema

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string (nullable), ts:timestamp[us]

Three sources:

- :func:`read_transcripts` — read an existing transcripts Parquet
  directory/file (the production path; prunes columns at the read).
- :func:`transcripts_from_events` — deterministic adapter deriving a
  transcripts table from the driver testdata ``events`` table, with an
  exactly-matching SQL definition (:data:`TRANSCRIPTS_FROM_EVENTS_SQL`)
  so every downstream operator can be oracle-checked in DuckDB.
- :func:`generate_synthetic_transcripts` — seeded generator (FIXTURES.md
  F1) with Zipf-distributed tool popularity to exercise hub-vertex skew;
  used by the benchmark and scale tests.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

# Event types that are considered tool invocations by the adapter.
_TOOL_EVENT_TYPES = ("click", "purchase", "error")
_N_ADAPTER_TOOLS = 10

# SQL definition of the adapter, verbatim-equal semantics to
# `transcripts_from_events`. Embedded as a CTE by oracle queries.
TRANSCRIPTS_FROM_EVENTS_SQL = f"""
    SELECT
        'c' || CAST(user_id AS VARCHAR) AS conv_id,
        CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
             AS INTEGER) AS turn_idx,
        event_type AS role,
        'c' || CAST(user_id AS VARCHAR) || ':'
            || CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1
                    AS VARCHAR)
            || ':' || event_type AS text,
        CASE WHEN event_type IN {_TOOL_EVENT_TYPES!r}
             THEN 'tool_' || CAST(CAST(regexp_extract(props, '[0-9]+') AS INTEGER)
                                  % {_N_ADAPTER_TOOLS} AS VARCHAR)
             ELSE NULL END AS tool,
        ts
    FROM events
"""


def read_transcripts(path: str, columns: list[str] | None = None) -> ray.data.Dataset:
    """Read a transcripts Parquet table, pruning to the needed columns."""
    return ray.data.read_parquet(path, columns=columns or TRANSCRIPT_COLUMNS)


def _events_group_to_transcripts(g: pd.DataFrame) -> pd.DataFrame:
    """Vectorized per-bucket derivation (each bucket holds many users)."""
    g = g.sort_values(["user_id", "ts", "event_id"], kind="stable")
    conv_id = "c" + g["user_id"].astype(str)
    turn_idx = g.groupby("user_id", sort=False).cumcount().astype("int32")
    role = g["event_type"]
    k = g["props"].str.extract(r"([0-9]+)", expand=False).astype("int64")
    is_tool = g["event_type"].isin(_TOOL_EVENT_TYPES)
    tool = ("tool_" + (k % _N_ADAPTER_TOOLS).astype(str)).where(is_tool, other=None)
    text = conv_id + ":" + turn_idx.astype(str) + ":" + role
    return pd.DataFrame(
        {
            "conv_id": conv_id,
            "turn_idx": turn_idx,
            "role": role,
            "text": text,
            "tool": tool,
            "ts": g["ts"],
        }
    )


def auto_buckets(
    path: str, lo: int = 16, hi: int = 64, bytes_per_bucket: int = 8 << 20
) -> int:
    """Size-aware shuffle-bucket count: ~one bucket per 8 MB of input,
    clamped to [lo, hi].  At small scale the wall time of a bucketed
    groupby is dominated by per-task orchestration, not data (measured:
    64 buckets over a 2 MB events file spends 8 s orchestrating 0.6 s
    of work); at large scale callers pass explicit counts anyway."""
    try:
        size = os.path.getsize(path)
    except OSError:
        return hi
    return int(max(lo, min(hi, size // bytes_per_bucket + 1)))


def transcripts_from_events(
    sf_dir: str, num_buckets: int | None = None
) -> ray.data.Dataset:
    """Derive the transcripts table from ``{sf_dir}/events.parquet``.

    conv_id = 'c'||user_id; turn_idx = 0-based rank of (ts, event_id)
    within the user; role = event_type; tool = 'tool_'||(props.k % 10)
    for tool-invoking event types else null; text is a deterministic
    per-turn string so "per-turn text equality under stable turn
    ordering" is checkable exactly.

    turn_idx needs per-user ordering, i.e. a shuffle keyed by user.  To
    keep group count bounded (and the per-group work vectorized) users
    are bucketed by ``user_id % num_buckets`` and each bucket is
    processed with a stable pandas sort — the scalable bucketed
    ``map_groups`` pattern used throughout this engine.
    """
    path = os.path.join(sf_dir, "events.parquet")
    if num_buckets is None:
        num_buckets = auto_buckets(path)
    # small files: cap the read block count too, or the downstream sort
    # shuffle pays 64 tasks' overhead to move a few MB
    small = os.path.getsize(path) < (512 << 20) if os.path.exists(path) else False
    ds = ray.data.read_parquet(
        path,
        columns=["event_id", "ts", "user_id", "event_type", "props"],
        override_num_blocks=num_buckets if small else None,
    )
    nb = num_buckets

    def add_bucket(batch: pa.Table) -> pa.Table:
        bucket = pa.array(batch["user_id"].to_numpy() % nb, type=pa.int32())
        return batch.append_column("bucket", bucket)

    ds = ds.map_batches(add_bucket, batch_format="pyarrow", zero_copy_batch=True)
    out = ds.groupby("bucket").map_groups(
        _events_group_to_transcripts, batch_format="pandas"
    )
    return out


def generate_synthetic_transcripts(
    out_dir: str,
    n_convs: int = 1000,
    seed: int = 42,
    n_tools: int = 50,
    zipf_alpha: float = 1.2,
    max_turns: int = 24,
    rows_per_file: int = 250_000,
) -> str:
    """Seeded deterministic transcript generator (FIXTURES.md F1).

    Tool popularity is Zipf(alpha) so a few hub tools receive a large
    in-degree — exercises the salted-aggregation skew path.  Writes one
    Parquet file per ``rows_per_file`` chunk so Ray can read in
    parallel.  Idempotent: if ``out_dir`` already holds a manifest for
    the same parameters it is reused.
    """
    os.makedirs(out_dir, exist_ok=True)
    manifest = os.path.join(out_dir, "_GEN_MANIFEST")
    stamp = (
        f"v1 n_convs={n_convs} seed={seed} n_tools={n_tools} a={zipf_alpha} "
        f"mt={max_turns} rpf={rows_per_file}"
    )
    if os.path.exists(manifest):
        with open(manifest) as f:
            if f.read() == stamp and any(
                n.endswith(".parquet") for n in os.listdir(out_dir)
            ):
                return out_dir
        for n in os.listdir(out_dir):
            if n.endswith(".parquet"):
                os.remove(os.path.join(out_dir, n))

    roles = np.array(["user", "assistant", "tool", "system"])
    # Zipf tool weights over ranked tool ids — a few hub tools.
    w = 1.0 / np.arange(1, n_tools + 1) ** zipf_alpha
    w /= w.sum()
    base = np.datetime64("2025-01-01T00:00:00", "us")

    # Chunked by conversation so multi-GB scales stream to disk; each
    # chunk is seeded independently (seed + chunk index) => the output
    # is deterministic for fixed (n_convs, seed, chunk size).
    convs_per_chunk = max(1, rows_per_file // ((2 + max_turns) // 2))
    file_i = 0
    for chunk_i, c0 in enumerate(range(0, n_convs, convs_per_chunk)):
        nc = min(convs_per_chunk, n_convs - c0)
        rng = np.random.default_rng(seed + 7919 * chunk_i)
        n_turns = rng.integers(2, max_turns + 1, size=nc)
        total = int(n_turns.sum())
        conv_rep = np.repeat(np.arange(c0, c0 + nc), n_turns)
        turn_idx = (
            np.arange(total) - np.repeat(np.cumsum(n_turns) - n_turns, n_turns)
        ).astype(np.int32)
        role_sel = roles[(conv_rep + turn_idx) % len(roles)]
        has_tool = rng.random(total) < 0.4
        tool_ids = rng.choice(n_tools, size=total, p=w)
        conv_ids = np.char.add("conv", conv_rep.astype(np.str_))
        tools_np = np.char.add("tool", tool_ids.astype(np.str_))
        h = (conv_rep * 1_000_003 + turn_idx * 7919) % 99_991
        texts = np.char.add(
            np.char.add(conv_ids, ":"),
            np.char.add(
                np.char.add(turn_idx.astype(np.str_), ":"), h.astype(np.str_)
            ),
        )
        ts = base + (
            conv_rep.astype("int64") * 3_600_000_000 + turn_idx * 30_000_000
        ).astype("timedelta64[us]")
        tool_arr = pa.Array.from_pandas(
            pd.Series(tools_np).where(pd.Series(has_tool), other=None),
            type=pa.string(),
        )
        table = pa.table(
            {
                "conv_id": pa.array(conv_ids, type=pa.string()),
                "turn_idx": pa.array(turn_idx, type=pa.int32()),
                "role": pa.array(role_sel, type=pa.string()),
                "text": pa.array(texts, type=pa.string()),
                "tool": tool_arr,
                "ts": pa.array(ts, type=pa.timestamp("us")),
            }
        )
        pq.write_table(table, os.path.join(out_dir, f"part-{file_i:05d}.parquet"))
        file_i += 1
    with open(manifest, "w") as f:
        f.write(stamp)
    return out_dir
