"""Row filters, normalizers, and rejects routing for the transcript
source — the reference's crawl-side filter stack re-expressed.

Reference semantics (SURVEY.md §2.2):

- M1 media/asset regex filter (``importer/HtmlOnlyCrawler.java:22-24,
  81-120``) → :func:`regex_filter` — vectorized drop-by-pattern.
- M2 domain allow/deny (``ApplicationConfiguration.java:397-424``) →
  :func:`allow_deny_filter` against broadcast allow/deny lists.
- M3 bad-row routing to FailedUrls (``HtmlOnlyCrawler.java:126-139``,
  ``importer/FailedUrls.java``) → :func:`clean_transcripts` splits
  malformed rows into a typed ``rejects`` Dataset
  (error_type, conv_id, turn_idx, message) instead of the graph.
- M4/M5 key normalization (host/domain extraction + ``www.`` strip,
  ``util/UrlUtil.java:16-59``) → trim/casefold of ``tool`` and ``role``
  keys inside the same pass.
- M7 malformed-input drop-with-warning
  (``TransactionalGraphImporter.java:159-162``) → reject rules below.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

REJECT_SCHEMA = pa.schema(
    [
        ("error_type", pa.string()),
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("message", pa.string()),
    ]
)


def regex_filter(
    ds: ray.data.Dataset, column: str, deny_pattern: str
) -> ray.data.Dataset:
    """Drop rows whose ``column`` matches ``deny_pattern`` (M1)."""

    def f(batch: pa.Table) -> pa.Table:
        col = pc.cast(batch[column], pa.string())
        m = pc.match_substring_regex(col, deny_pattern)
        return batch.filter(pc.invert(pc.fill_null(m, False)))

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def allow_deny_filter(
    ds: ray.data.Dataset,
    column: str,
    allow: list[str] | None = None,
    deny: list[str] | None = None,
) -> ray.data.Dataset:
    """Keep rows whose value is in ``allow`` (if given) and not in
    ``deny`` (M2).  The lists are broadcast once as Arrow value sets."""
    allow_arr = pa.array(allow, type=pa.string()) if allow is not None else None
    deny_arr = pa.array(deny, type=pa.string()) if deny is not None else None

    def f(batch: pa.Table) -> pa.Table:
        col = pc.cast(batch[column], pa.string())
        mask = pa.array(np.ones(batch.num_rows, dtype=bool))
        if allow_arr is not None:
            mask = pc.and_(mask, pc.fill_null(pc.is_in(col, value_set=allow_arr), False))
        if deny_arr is not None:
            mask = pc.and_(mask, pc.invert(pc.fill_null(pc.is_in(col, value_set=deny_arr), False)))
        return batch.filter(mask)

    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _clean_batch(batch: pa.Table) -> tuple[pa.Table, pa.Table]:
    """(clean rows with normalized keys, reject rows)."""
    conv = pc.cast(batch["conv_id"], pa.string())
    role = pc.cast(batch["role"], pa.string())
    tool = pc.cast(batch["tool"], pa.string())
    turn = batch["turn_idx"]

    conv_trim = pc.utf8_trim_whitespace(pc.fill_null(conv, ""))
    role_norm = pc.utf8_lower(pc.utf8_trim_whitespace(pc.fill_null(role, "")))
    tool_trim = pc.utf8_trim_whitespace(tool)  # keeps nulls null

    bad_conv = pc.fill_null(pc.equal(conv_trim, ""), True)
    bad_role = pc.fill_null(pc.equal(role_norm, ""), True)
    bad_turn = pc.fill_null(pc.less(turn, 0), True)
    # a tool that is present but whitespace-only is malformed (F5 rule)
    bad_tool = pc.fill_null(
        pc.and_(pc.is_valid(tool), pc.equal(tool_trim, "")), False
    )

    reasons = [
        ("empty_conv_id", bad_conv),
        ("empty_role", bad_role),
        ("negative_turn_idx", bad_turn),
        ("blank_tool", bad_tool),
    ]
    any_bad = bad_conv
    for _, m in reasons[1:]:
        any_bad = pc.or_(any_bad, m)

    # normalized clean rows: whitespace-trimmed keys, lowercased role;
    # blank tool (only reachable on clean rows as null) stays null
    cleaned = pa.table(
        {
            "conv_id": conv_trim,
            "turn_idx": pc.cast(turn, pa.int32()),
            "role": role_norm,
            "text": pc.cast(batch["text"], pa.string()),
            "tool": tool_trim,
            "ts": batch["ts"],
        }
    )
    good = cleaned.filter(pc.invert(any_bad))

    # typed reject rows, first matching reason wins
    reason_arr = np.full(batch.num_rows, None, dtype=object)
    for name, m in reversed(reasons):
        mask = m.to_numpy(zero_copy_only=False)
        reason_arr[mask] = name
    bad_np = any_bad.to_numpy(zero_copy_only=False)
    idx = np.flatnonzero(bad_np)
    rejects = pa.table(
        {
            "error_type": pa.array(reason_arr[idx], type=pa.string()),
            "conv_id": pc.cast(conv, pa.string()).take(pa.array(idx)),
            "turn_idx": pc.cast(turn, pa.int32()).take(pa.array(idx)),
            "message": pa.array(
                [f"rejected: {r}" for r in reason_arr[idx]], type=pa.string()
            ),
        }
    )
    return good, rejects


def clean_transcripts(
    ds: ray.data.Dataset,
) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """Split a transcripts Dataset into (clean+normalized, rejects).

    Two filtered passes over the same lazy input (Ray Data has no
    native multi-output map); each pass is a cheap vectorized scan."""

    def keep_good(batch: pa.Table) -> pa.Table:
        good, _ = _clean_batch(batch)
        return good

    def keep_bad(batch: pa.Table) -> pa.Table:
        _, bad = _clean_batch(batch)
        return bad

    return (
        ds.map_batches(keep_good, batch_format="pyarrow", zero_copy_batch=True),
        ds.map_batches(keep_bad, batch_format="pyarrow", zero_copy_batch=True),
    )
