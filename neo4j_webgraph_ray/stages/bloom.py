"""Bloom-filter semi-join — broadcast prefilter + exact verify.

The straightforward way to keep only fact rows whose key appears in a
dimension key set is a shuffle semi-join: hash BOTH sides on the key
and match per bucket — every fact row moves, even when almost none
survive.  The engine's existing broadcast joins
(``queries._collect_lookup_arrays``) avoid the shuffle by shipping the
dim keys as a sorted array, but that is exact-size: at 10^9 dim keys
the array itself is 8 GB per worker.

The Bloom filter is the classic middle path (Bloom 1970; the Spark /
Impala "runtime filter"): an m-bit array with h hashed probes per key.

- **build**: one pass over the dim keys; each block emits its own
  partial BIT ARRAY (m/8 bytes, independent of block row count) and
  the driver OR-folds #blocks small arrays — build cost never scales
  with key count, only with m.
- **probe**: ``ray.put`` the bits ONCE; every fact batch tests
  membership vectorized (gather words, AND the probe masks).  False
  positive rate ~ (1 - e^{-hn/m})^h; with the defaults (m = 2^23,
  h = 4) a 10^5-key dim side sits at ~1e-5.
- **exact verify**: Bloom has NO false negatives, so no surviving row
  is ever lost; the (tiny) false-positive overhang is removed by ONE
  bucketed co-group of the *survivors* against the dim keys.  Shuffle
  volume = survivors only — the result is exactly the semi-join, at a
  fraction of its movement cost.

All hashing is the fixed-constant splitmix64 finalizer (shared with
the HyperBall sketches), so filters are deterministic across runs and
partitionings.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from neo4j_webgraph_ray.pipelines.neighborhood import _mix64

DEFAULT_N_BITS = 1 << 23
DEFAULT_N_HASHES = 4


def _probe_positions(
    keys: np.ndarray, n_bits: int, n_hashes: int
) -> np.ndarray:
    """(n, h) uint64 bit positions via double hashing: two independent
    splitmix64 streams h1, h2; position_i = (h1 + i*h2) mod m.  The
    standard Kirsch–Mitzenmacher construction — h independent probes
    from two hashes."""
    u = keys.astype(np.int64, copy=False)
    h1 = _mix64(u)
    with np.errstate(over="ignore"):
        h2 = _mix64(u ^ np.int64(-0x61C8864680B583EB)) | np.uint64(1)
        i = np.arange(n_hashes, dtype=np.uint64)[None, :]
        return (h1[:, None] + i * h2[:, None]) % np.uint64(n_bits)


def _set_bits(words: np.ndarray, pos: np.ndarray) -> None:
    """Set flat bit positions in the uint64 word array in place."""
    flat = pos.reshape(-1)
    np.bitwise_or.at(
        words, (flat >> np.uint64(6)).astype(np.int64),
        np.uint64(1) << (flat & np.uint64(63)),
    )


def bloom_build(
    dim: ray.data.Dataset,
    key_col: str,
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
) -> np.ndarray:
    """Bloom filter of ``dim[key_col]`` (int64 keys) as a uint64 word
    array of n_bits/64 words.  Per-BLOCK partial bit arrays (each
    m/8 bytes regardless of row count) OR-fold on the driver — at 256
    nodes that is #blocks × m/8 bytes through the object store, never
    the key set itself."""
    if n_bits % 64:
        raise ValueError("n_bits must be a multiple of 64")
    n_words = n_bits // 64

    def partial(t: pa.Table) -> pa.Table:
        words = np.zeros(n_words, np.uint64)
        keys = t[key_col].to_numpy(zero_copy_only=False)
        if len(keys):
            _set_bits(words, _probe_positions(keys, n_bits, n_hashes))
        return pa.table({"bits": pa.array([words.tobytes()], pa.binary())})

    out = np.zeros(n_words, np.uint64)
    # batch_size=None: one partial PER BLOCK (the default batch size
    # would emit one m/8-byte array per few thousand rows — the whole
    # point is one per block)
    for b in dim.select_columns([key_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=None, zero_copy_batch=True
    ).iter_batches(batch_size=64, batch_format="pyarrow"):
        for buf in b["bits"]:
            out |= np.frombuffer(buf.as_py(), dtype=np.uint64)
    return out


def bloom_contains(
    words: np.ndarray, keys: np.ndarray, n_bits: int, n_hashes: int
) -> np.ndarray:
    """Vectorized membership test: True where ALL h probe bits are set
    (definitely-absent keys are always False; present keys always
    True — false positives only)."""
    if not len(keys):
        return np.zeros(0, bool)
    pos = _probe_positions(keys, n_bits, n_hashes)
    w = words[(pos >> np.uint64(6)).astype(np.int64)]
    bit = (w >> (pos & np.uint64(63))) & np.uint64(1)
    return bit.all(axis=1)


def bloom_semijoin(
    fact: ray.data.Dataset,
    fact_key: str,
    dim: ray.data.Dataset,
    dim_key: str,
    n_bits: int = DEFAULT_N_BITS,
    n_hashes: int = DEFAULT_N_HASHES,
    num_buckets: int = 32,
) -> ray.data.Dataset:
    """EXACT semi-join: fact rows whose ``fact_key`` appears in
    ``dim[dim_key]``, with the Bloom filter as a broadcast prefilter
    and one bucketed co-group of the SURVIVORS as the exact verify.

    Scale contract: the fact table streams map-only through the probe
    (no shuffle of non-matching rows); the verify shuffle moves only
    Bloom survivors (true matches + ~fp-rate of the rest); the filter
    itself is m/8 bytes broadcast once via ``ray.put``."""
    from neo4j_webgraph_ray.stages.core import (
        BUCKET_COL,
        add_bucket_column,
        bucketed_groupby,
    )

    words = bloom_build(dim, dim_key, n_bits, n_hashes)
    wref = ray.put(words)

    def prefilter(t: pa.Table) -> pa.Table:
        keys = t[fact_key].to_numpy(zero_copy_only=False)
        mask = bloom_contains(ray.get(wref), keys, n_bits, n_hashes)
        return t.filter(pa.array(mask))

    survivors = fact.map_batches(
        prefilter, batch_format="pyarrow", zero_copy_batch=True
    )

    # dtype template for padding the dim side to the FACT schema: a
    # tagged union of mismatched schemas concatenates with NaN fill,
    # which silently coerces int64 fact columns to float64 (corrupting
    # ids above 2^53) — both sides must ship identical typed columns.
    # Probed via limit(1), not Dataset.schema(): schema() on a lazy
    # mapped fact executes nearly the whole upstream plan, which the
    # semi-join would then re-execute (a raw read_parquet fact is
    # metadata-only either way, but the operator must stay cheap for
    # mapped inputs too).  Empty fact → schema() fallback (the double
    # pass is then of a zero-row plan).
    try:
        _p = fact.limit(1).take_batch(1, batch_format="pyarrow")
        dtypes = {n: np.dtype(_p.schema.field(n).type.to_pandas_dtype())
                  for n in _p.column_names}
    except Exception:
        schema = fact.schema()
        base = getattr(schema, "base_schema", schema)
        if isinstance(base, pa.Schema):
            dtypes = {n: np.dtype(base.field(n).type.to_pandas_dtype())
                      for n in base.names}
        else:  # PandasBlockSchema
            dtypes = dict(zip(base.names, base.types))
    fact_cols = list(dtypes)

    def _pad(n: int, dt) -> np.ndarray:
        if dt == np.dtype(object):
            return np.full(n, None, dtype=object)
        return np.zeros(n, dtype=dt)

    def tag_fact(df: pd.DataFrame) -> pd.DataFrame:
        out = df.copy(deep=False)
        out["_k"] = out[fact_key]
        out["_t"] = np.int8(0)
        return out

    def tag_dim(df: pd.DataFrame) -> pd.DataFrame:
        k = df[[dim_key]].drop_duplicates()[dim_key].to_numpy()
        out = pd.DataFrame({c: _pad(len(k), dt) for c, dt in dtypes.items()})
        out["_k"] = k
        out["_t"] = np.int8(1)
        return out

    def verify(df: pd.DataFrame) -> pd.DataFrame:
        present = np.unique(df.loc[df["_t"] == 1, "_k"].to_numpy())
        rows = df[df["_t"] == 0]
        if not len(rows) or not len(present):
            return rows.iloc[0:0][fact_cols]
        # flat-array membership (sorted + searchsorted-equivalent), not
        # a Python set — the engine's broadcast/join rule
        keep = np.isin(rows["_k"].to_numpy(), present)
        return rows.loc[keep, fact_cols]

    tagged = survivors.map_batches(tag_fact, batch_format="pandas").union(
        dim.select_columns([dim_key]).map_batches(tag_dim, batch_format="pandas")
    )
    return bucketed_groupby(
        tagged, ["_k"], verify, num_buckets=num_buckets, local_combine=False
    )
