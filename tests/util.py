"""Test helpers: result normalization + order-insensitive comparison,
mimicking the driver's compare (sort columns by name, sort rows, compare
values)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def to_pandas(result) -> pd.DataFrame:
    import ray.data

    if isinstance(result, ray.data.Dataset):
        result = result.to_pandas()
    elif isinstance(result, pa.Table):
        result = result.to_pandas()
    return result


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith(("int", "Int", "uint")):
            if df[c].isna().any():
                df[c] = df[c].astype("float64")
            else:
                df[c] = df[c].astype("int64")
        elif str(df[c].dtype).startswith("float"):
            df[c] = df[c].round(9)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def assert_result_equal(mine, oracle, name: str = "") -> None:
    a = normalize(to_pandas(mine))
    b = normalize(to_pandas(oracle))
    assert list(a.columns) == list(b.columns), (
        f"{name}: column mismatch {list(a.columns)} vs {list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=False, rtol=1e-9)
