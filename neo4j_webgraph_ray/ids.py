"""Stable 64-bit vertex ids.

The reference resolves every URL to a Neo4j node id through a Lucene
index lookup under a lock (get-or-create,
reference ``importer/TransactionalGraphImporter.java:206-220`` and
``importer/BatchGraphImporter.java:173-197``).  At 10^12-edge scale a
shared lookup index is the bottleneck, so this engine instead derives a
vertex id deterministically as a 64-bit hash of the vertex key string
``"{kind}:{key}"`` — the url→id join (SURVEY.md J2) disappears into a
pure function evaluated independently in every task.

Hash choice: ``pandas.util.hash_array`` (vectorized C siphash-1-3 with a
fixed key), deterministic across processes and runs.  Collision risk at
n keys is ~n^2/2^65; a one-time validation pass (`validate_no_collisions`)
is run by the tests at small scale, and the 128-bit upgrade path is to
hash with two distinct fixed keys and widen to a (hi, lo) pair.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

# Fixed key => deterministic across runs/processes (pandas' documented default).
_HASH_KEY = "0123456789123456"

KIND_CONV = "conv"
KIND_TOOL = "tool"
KIND_ROLE = "role"


def hash64(keys) -> np.ndarray:
    """Vectorized stable hash of a string array -> int64 ndarray.

    Accepts a pyarrow (Chunked)Array, pandas Series, numpy array or list.
    """
    if isinstance(keys, (pa.Array, pa.ChunkedArray)):
        keys = keys.to_numpy(zero_copy_only=False)
    arr = np.asarray(keys, dtype=object)
    return pd.util.hash_array(arr, hash_key=_HASH_KEY, categorize=True).view(np.int64)


def vertex_id(kind, key) -> np.ndarray:
    """id = hash64(kind + ":" + key); kind/key are arrays or scalars."""
    if isinstance(kind, str):
        if isinstance(key, str):
            return hash64(np.array([f"{kind}:{key}"], dtype=object))
        key_np = (
            key.to_numpy(zero_copy_only=False)
            if isinstance(key, (pa.Array, pa.ChunkedArray))
            else np.asarray(key, dtype=object)
        )
        composite = np.char.add(f"{kind}:", key_np.astype(str)).astype(object)
        return hash64(composite)
    kind_np = (
        kind.to_numpy(zero_copy_only=False)
        if isinstance(kind, (pa.Array, pa.ChunkedArray))
        else np.asarray(kind, dtype=object)
    )
    key_np = (
        key.to_numpy(zero_copy_only=False)
        if isinstance(key, (pa.Array, pa.ChunkedArray))
        else np.asarray(key, dtype=object)
    )
    composite = np.char.add(np.char.add(kind_np.astype(str), ":"), key_np.astype(str))
    return hash64(composite.astype(object))


def validate_no_collisions(kinds, keys) -> None:
    """One-time small-scale check that distinct (kind,key) -> distinct ids."""
    df = pd.DataFrame({"kind": np.asarray(kinds), "key": np.asarray(keys)})
    df = df.drop_duplicates()
    ids = vertex_id(df["kind"].to_numpy(), df["key"].to_numpy())
    if len(np.unique(ids)) != len(df):
        raise AssertionError("hash64 collision detected among vertex keys")
