"""Enrichment stage API — the reference's GraphObserver plugin surface
re-expressed as actor-pool ``map_batches`` stages.

Reference semantics carried over (SURVEY.md §2.3, §2.10):

- ``GraphObserver`` template (configure / shouldIgnore / updatePage /
  counters, ``importer/GraphObserver.java:20-246``) → :class:`EnrichStage`
  protocol; concrete stages are loaded by dotted import path from
  config, mirroring the reflective ``customEventHandlerClasses`` loading
  (``importer/App.java:228-254``).
- per-handler HTTP client with pooled connections + response cache and
  hit/miss/update counters (``util/SimpleHttpClient.java:41-158``) →
  :class:`ThrottledRetryingClient` held in actor state, one per actor.
- politeness throttle (min interval between external calls,
  ``customhandlers/AbstractSocialMediaClient.java:57-69``) → per-actor
  token-interval limiter; pool-wide rate = per-actor rate × pool size.
- retry-on-unavailable ×10 with sleep
  (``AbstractSocialMediaClient.java:31-55``) → in-client retry loop
  (distinct from Ray's task-level max_retries, which covers worker
  death).
- failure handling: a failed enrichment leaves the property ABSENT
  (null; reference encodes missing counts by property absence,
  ``PageNode.java:160-211``) and records the key in the rejects side
  channel (FailedUrls analog, ``importer/FailedUrls.java:15-92``).
- idempotence: ``should_ignore`` masks already-enriched rows so re-runs
  are cheap no-ops (``customhandlers/FacebookEventHandler.java:35-37``).

Scale shape: the stage is a callable CLASS passed to
``map_batches(..., concurrency=(lo, hi), batch_size=B)`` — client/state
constructed once per actor, batches in/out Arrow.
"""

from __future__ import annotations

import importlib
import threading
import time
from collections import OrderedDict
from typing import Any, Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


class ServiceUnavailable(Exception):
    """Transient failure — retried (reference ServiceUnavailableException)."""


class EnrichmentFailed(Exception):
    """Permanent failure — row routed to rejects, property left null."""


class ThrottledRetryingClient:
    """Per-actor client wrapper: LRU response cache + politeness
    throttle + bounded retry on transient failures."""

    def __init__(
        self,
        fetch: Callable[[str], Any],
        min_interval_sec: float = 0.0,
        max_retries: int = 10,
        retry_sleep_sec: float = 1.0,
        max_cache_entries: int = 0,
    ):
        self.fetch = fetch
        self.min_interval = min_interval_sec
        self.max_retries = max_retries
        self.retry_sleep = retry_sleep_sec
        self.cache_cap = max_cache_entries
        self.cache: OrderedDict[str, Any] = OrderedDict()
        self.lock = threading.Lock()
        self.last_fetch = 0.0
        self.cache_hits = 0
        self.cache_misses = 0
        self.retries = 0

    def _wait_politely(self) -> None:
        if self.min_interval <= 0:
            return
        with self.lock:
            now = time.monotonic()
            delta = now - self.last_fetch
            if delta < self.min_interval:
                time.sleep(self.min_interval - delta)
            self.last_fetch = time.monotonic()

    def get(self, key: str) -> Any:
        if self.cache_cap:
            if key in self.cache:
                self.cache_hits += 1
                self.cache.move_to_end(key)
                return self.cache[key]
            self.cache_misses += 1
        attempt = 0
        while True:
            self._wait_politely()
            try:
                val = self.fetch(key)
                break
            except ServiceUnavailable:
                attempt += 1
                self.retries += 1
                if attempt > self.max_retries:
                    raise EnrichmentFailed(f"unavailable after {self.max_retries} retries")
                time.sleep(self.retry_sleep)
        if self.cache_cap:
            self.cache[key] = val
            if len(self.cache) > self.cache_cap:
                self.cache.popitem(last=False)
        return val

    def metrics(self) -> dict[str, int]:
        return {
            "cache_hits": self.cache_hits,
            "cache_misses": self.cache_misses,
            "retries": self.retries,
        }


class EnrichStage:
    """Stage protocol (GraphObserver analog).  Subclass and implement."""

    name: str = "base"
    output_columns: dict[str, pa.DataType] = {}

    def configure(self, cfg: dict[str, Any]) -> None:
        pass

    def should_ignore(self, batch: pa.Table) -> np.ndarray:
        """Bool mask of rows to skip (already enriched) — idempotence."""
        return np.zeros(batch.num_rows, dtype=bool)

    def update(self, batch: pa.Table) -> tuple[dict[str, np.ndarray], list[str | None]]:
        """Enrich the (non-ignored) rows.  Returns (values per output
        column — np object arrays with None for failures, errors — one
        message per row or None)."""
        raise NotImplementedError

    def metrics(self) -> dict[str, int]:
        return {}


ERROR_COL = "enrich_error"


def resolve_stage(path_or_cls) -> EnrichStage:
    """Instantiate a stage from an instance, class, or dotted import
    path string — config-name-driven loading like the reference's
    reflective handler registration (``App.java:228-254``)."""
    if isinstance(path_or_cls, EnrichStage):
        return path_or_cls
    if isinstance(path_or_cls, type):
        return path_or_cls()
    mod, _, cls = str(path_or_cls).rpartition(".")
    return getattr(importlib.import_module(mod), cls)()


class EnrichmentActor:
    """map_batches callable class wrapping an EnrichStage: stage + client
    constructed once per actor (__init__), vectorized merge per batch."""

    def __init__(self, stage, cfg: dict[str, Any] | None = None):
        self.stage = resolve_stage(stage)
        self.stage.configure(cfg or {})
        self.received = 0
        self.updated = 0
        self.ignored = 0
        self.failed = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        self.received += n
        ignore = self.stage.should_ignore(batch)
        todo_idx = np.flatnonzero(~ignore)
        self.ignored += int(ignore.sum())
        out_cols = dict(self.stage.output_columns)

        # start from existing values (or null) for every output column
        merged: dict[str, np.ndarray] = {}
        for col in out_cols:
            if col in batch.column_names:
                merged[col] = batch[col].to_numpy(zero_copy_only=False).astype(object)
            else:
                merged[col] = np.full(n, None, dtype=object)
        errors = np.full(n, None, dtype=object)

        if len(todo_idx):
            todo = batch.take(pa.array(todo_idx))
            values, errs = self.stage.update(todo)
            for col, vals in values.items():
                merged[col][todo_idx] = vals
            errors[todo_idx] = np.array(errs, dtype=object)
            n_fail = sum(e is not None for e in errs)
            self.failed += n_fail
            self.updated += len(todo_idx) - n_fail

        out = batch
        for col, typ in out_cols.items():
            arr = pa.array(merged[col], type=typ)
            if col in out.column_names:
                out = out.set_column(out.column_names.index(col), col, arr)
            else:
                out = out.append_column(col, arr)
        err_arr = pa.array(errors, type=pa.string())
        if ERROR_COL in out.column_names:
            out = out.set_column(out.column_names.index(ERROR_COL), ERROR_COL, err_arr)
        else:
            out = out.append_column(ERROR_COL, err_arr)
        return out

    def metrics(self) -> dict[str, int]:
        m = {
            "received": self.received,
            "updated": self.updated,
            "ignored": self.ignored,
            "failed": self.failed,
        }
        m.update(self.stage.metrics())
        return m


def enrich(
    ds: ray.data.Dataset,
    stage,
    cfg: dict[str, Any] | None = None,
    concurrency: int | tuple[int, int] = 2,
    batch_size: int = 4096,
    num_cpus: float = 0.5,
) -> ray.data.Dataset:
    """Run an enrichment stage as an actor pool over the Dataset.
    Output rows carry the enriched columns plus ``enrich_error``
    (null = ok); use :func:`split_rejects` for the side channel.

    ``num_cpus`` defaults to 0.5: enrichment clients are IO-bound, and a
    pool that reserves every CPU starves the upstream read / downstream
    write stages (the pipeline then deadlocks on a small cluster)."""
    return ds.map_batches(
        EnrichmentActor,
        fn_constructor_args=(stage, cfg),
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=num_cpus,
    )


def split_rejects(ds: ray.data.Dataset) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """(clean rows, rejects) — the FailedUrls side table as a Dataset
    (write rejects beside the main output: ``rejects/`` Parquet)."""

    def keep_clean(batch: pa.Table) -> pa.Table:
        return batch.filter(pc_is_null(batch[ERROR_COL]))

    def keep_rejects(batch: pa.Table) -> pa.Table:
        return batch.filter(pa.compute.invert(pc_is_null(batch[ERROR_COL])))

    return (
        ds.map_batches(keep_clean, batch_format="pyarrow", zero_copy_batch=True),
        ds.map_batches(keep_rejects, batch_format="pyarrow", zero_copy_batch=True),
    )


def pc_is_null(arr):
    import pyarrow.compute as pc

    return pc.is_null(pc.cast(arr, pa.string()))


# -- stub social-count stage (reference handler tests without network) ------


def stub_social_count(key: str) -> int:
    """Deterministic 'social count' — SQL-expressible so the driver can
    oracle-check the whole enrichment pipeline:
    count = 7 * length(key) + ascii(first_char) % 10."""
    return 7 * len(key) + ord(key[0]) % 10


def stub_fails_permanently(key: str) -> bool:
    """Deterministic permanent-failure rule: ascii(last char) % 9 == 0."""
    return ord(key[-1]) % 9 == 0


class StubSocialCountStage(EnrichStage):
    """Deterministic stand-in for the Facebook/Twitter handlers
    (``customhandlers/FacebookEventHandler.java:29-49``): enriches each
    vertex with ``social_count = f(key)``; rows matching the
    deterministic failure rule behave like a permanently unavailable
    API (count left null, key recorded in rejects)."""

    name = "stub_social_count"
    output_columns = {"social_count": pa.int64()}

    def configure(self, cfg: dict[str, Any]) -> None:
        self.key_col = cfg.get("key_column", "key")
        self.transient_failures = int(cfg.get("transient_failures", 0))
        self._transient_seen: dict[str, int] = {}
        self.client = ThrottledRetryingClient(
            self._fetch,
            min_interval_sec=float(cfg.get("min_interval_sec", 0.0)),
            max_retries=int(cfg.get("max_retries", 10)),
            retry_sleep_sec=float(cfg.get("retry_sleep_sec", 0.0)),
            max_cache_entries=int(cfg.get("max_cache_entries", 1000)),
        )

    def _fetch(self, key: str) -> int:
        if stub_fails_permanently(key):
            raise EnrichmentFailed(f"permanent failure for {key!r}")
        seen = self._transient_seen.get(key, 0)
        if seen < self.transient_failures:
            self._transient_seen[key] = seen + 1
            raise ServiceUnavailable(key)
        return stub_social_count(key)

    def should_ignore(self, batch: pa.Table) -> np.ndarray:
        if "social_count" not in batch.column_names:
            return np.zeros(batch.num_rows, dtype=bool)
        import pyarrow.compute as pc

        return pc.is_valid(batch["social_count"]).to_numpy(zero_copy_only=False)

    def update(self, batch: pa.Table):
        keys = batch[self.key_col].to_numpy(zero_copy_only=False)
        vals = np.full(len(keys), None, dtype=object)
        errs: list[str | None] = []
        for i, k in enumerate(keys):
            try:
                vals[i] = self.client.get(str(k))
                errs.append(None)
            except EnrichmentFailed as e:
                errs.append(str(e))
        return {"social_count": vals}, errs

    def metrics(self) -> dict[str, int]:
        return self.client.metrics()


def stub_twitter_count(key: str) -> int:
    """Second deterministic service — SQL: 3*length + ascii(last) % 7."""
    return 3 * len(key) + ord(key[-1]) % 7


class StubMultiSocialStage(EnrichStage):
    """ONE handler writing TWO properties from two clients — the
    ``customhandlers/FacebookAndTwitterEventHandler.java:46-91`` shape
    (facebookClient + twitterClient in one observer).  Each service has
    its own deterministic permanent-failure rule, so a row can carry one
    enriched column and one null: the multi-column output protocol is
    exercised for real, not as two stacked single-output stages."""

    name = "stub_multi_social"
    output_columns = {"facebook_count": pa.int64(), "twitter_count": pa.int64()}

    def configure(self, cfg: dict[str, Any]) -> None:
        self.key_col = cfg.get("key_column", "key")
        common = dict(
            min_interval_sec=float(cfg.get("min_interval_sec", 0.0)),
            max_retries=int(cfg.get("max_retries", 10)),
            retry_sleep_sec=float(cfg.get("retry_sleep_sec", 0.0)),
            max_cache_entries=int(cfg.get("max_cache_entries", 1000)),
        )
        self.fb_client = ThrottledRetryingClient(self._fetch_fb, **common)
        self.tw_client = ThrottledRetryingClient(self._fetch_tw, **common)

    def _fetch_fb(self, key: str) -> int:
        if stub_fails_permanently(key):  # ascii(last) % 9 == 0
            raise EnrichmentFailed(f"facebook permanent failure for {key!r}")
        return stub_social_count(key)

    def _fetch_tw(self, key: str) -> int:
        if ord(key[-1]) % 11 == 0:
            raise EnrichmentFailed(f"twitter permanent failure for {key!r}")
        return stub_twitter_count(key)

    def should_ignore(self, batch: pa.Table) -> np.ndarray:
        cols = batch.column_names
        if "facebook_count" not in cols or "twitter_count" not in cols:
            return np.zeros(batch.num_rows, dtype=bool)
        import pyarrow.compute as pc

        both = pc.and_(
            pc.is_valid(batch["facebook_count"]),
            pc.is_valid(batch["twitter_count"]),
        )
        return both.to_numpy(zero_copy_only=False)

    def update(self, batch: pa.Table):
        keys = batch[self.key_col].to_numpy(zero_copy_only=False)
        fb = np.full(len(keys), None, dtype=object)
        tw = np.full(len(keys), None, dtype=object)
        errs: list[str | None] = []
        for i, k in enumerate(keys):
            msgs = []
            try:
                fb[i] = self.fb_client.get(str(k))
            except EnrichmentFailed as e:
                msgs.append(str(e))
            try:
                tw[i] = self.tw_client.get(str(k))
            except EnrichmentFailed as e:
                msgs.append(str(e))
            errs.append("; ".join(msgs) if msgs else None)
        return {"facebook_count": fb, "twitter_count": tw}, errs

    def metrics(self) -> dict[str, int]:
        fb = self.fb_client.metrics()
        tw = self.tw_client.metrics()
        return {f"fb_{k}": v for k, v in fb.items()} | {
            f"tw_{k}": v for k, v in tw.items()
        }
