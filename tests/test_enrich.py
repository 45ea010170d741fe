"""Enrichment stage tests mirroring the reference's handler tests with
stubbed clients (``customhandlers/FacebookEventHandlerTest.java:33-47``,
``SocialMediaClientStub.java``): count written, failure leaves property
null + rejects row, idempotent re-run via should_ignore, retry
semantics, cache counters, plugin loading by dotted path."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from neo4j_webgraph_ray.stages.enrich import (
    ERROR_COL,
    EnrichmentActor,
    EnrichmentFailed,
    ServiceUnavailable,
    StubSocialCountStage,
    ThrottledRetryingClient,
    enrich,
    resolve_stage,
    split_rejects,
    stub_fails_permanently,
    stub_social_count,
)


def vertex_ds(keys):
    return ray.data.from_arrow(
        pa.table({"kind": pa.array(["conv"] * len(keys)), "key": pa.array(keys)})
    )


def test_enrich_writes_count_and_rejects():
    keys = ["alpha", "beta", "l"]  # ord("l")=108, 108 % 9 == 0 -> permanent failure
    assert stub_fails_permanently("l") and not stub_fails_permanently("alpha")
    out = enrich(vertex_ds(keys), StubSocialCountStage, concurrency=1).to_pandas()
    out = out.set_index("key")
    assert out.loc["alpha", "social_count"] == stub_social_count("alpha")
    assert out.loc["beta", "social_count"] == stub_social_count("beta")
    assert pd.isna(out.loc["l", "social_count"])  # property left absent
    assert out.loc["l", ERROR_COL] is not None
    assert out.loc["alpha", ERROR_COL] is None


def test_split_rejects():
    keys = ["alpha", "l", "r"]  # ord("r")=114, 114%9=6 ok
    ds = enrich(vertex_ds(keys), StubSocialCountStage, concurrency=1)
    clean, rejects = split_rejects(ds)
    c = clean.to_pandas()
    r = rejects.to_pandas()
    assert sorted(c["key"]) == ["alpha", "r"]
    assert list(r["key"]) == ["l"]
    assert "permanent failure" in r[ERROR_COL].iloc[0]


def test_idempotent_rerun_ignores_enriched():
    actor = EnrichmentActor(StubSocialCountStage, {})
    batch = pa.table({"key": pa.array(["alpha", "beta"])})
    out1 = actor(batch)
    m1 = actor.metrics()
    assert m1["updated"] == 2 and m1["ignored"] == 0
    # second pass over already-enriched rows: no-op via should_ignore
    out2 = actor(out1)
    m2 = actor.metrics()
    assert m2["ignored"] == 2
    assert m2["updated"] == 2  # unchanged
    assert out2["social_count"].to_pylist() == out1["social_count"].to_pylist()


def test_retry_then_success_and_exhaustion():
    calls = {"n": 0}

    def flaky(key):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise ServiceUnavailable(key)
        return 42

    c = ThrottledRetryingClient(flaky, max_retries=10, retry_sleep_sec=0.0)
    assert c.get("k") == 42
    assert c.retries == 2

    def always_down(key):
        raise ServiceUnavailable(key)

    c2 = ThrottledRetryingClient(always_down, max_retries=3, retry_sleep_sec=0.0)
    with pytest.raises(EnrichmentFailed, match="after 3 retries"):
        c2.get("k")
    assert c2.retries == 3 + 1  # attempts counted like the reference (maxRetries+1 calls)


def test_cache_counters():
    c = ThrottledRetryingClient(lambda k: len(k), max_cache_entries=10)
    c.get("aa"), c.get("aa"), c.get("bb")
    m = c.metrics()
    assert m["cache_hits"] == 1 and m["cache_misses"] == 2


def test_transient_failures_retried_in_pipeline():
    out = enrich(
        vertex_ds(["alpha", "beta"]),
        StubSocialCountStage,
        cfg={"transient_failures": 2, "retry_sleep_sec": 0.0},
        concurrency=1,
    ).to_pandas()
    assert (out[ERROR_COL].isna()).all()
    assert out.set_index("key").loc["alpha", "social_count"] == stub_social_count("alpha")


def test_resolve_stage_by_dotted_path():
    stage = resolve_stage("neo4j_webgraph_ray.stages.enrich.StubSocialCountStage")
    assert isinstance(stage, StubSocialCountStage)


def test_multi_output_stage_partial_failures():
    """One handler, two properties, independent failure rules — a row
    can be half-enriched (FacebookAndTwitterEventHandler analog)."""
    from neo4j_webgraph_ray.stages.enrich import (
        StubMultiSocialStage,
        stub_twitter_count,
    )

    # ord("l")=108: fb fails (108%9==0), tw ok (108%11=9)
    # ord("x")=120: fb ok (120%9=3), tw ok (120%11=10)
    # ord("y")=121: fb ok (121%9=4), tw fails (121%11==0)
    keys = ["hello-l", "x", "y"]
    out = enrich(vertex_ds(keys), StubMultiSocialStage, concurrency=1).to_pandas()
    out = out.set_index("key")
    assert pd.isna(out.loc["hello-l", "facebook_count"])
    assert out.loc["hello-l", "twitter_count"] == stub_twitter_count("hello-l")
    assert out.loc["x", "facebook_count"] == stub_social_count("x")
    assert out.loc["x", "twitter_count"] == stub_twitter_count("x")
    assert pd.isna(out.loc["y", "twitter_count"])
    assert out.loc["y", "facebook_count"] == stub_social_count("y")
    assert "facebook" in out.loc["hello-l", ERROR_COL]
    assert "twitter" in out.loc["y", ERROR_COL]
    assert out.loc["x", ERROR_COL] is None


def test_stage_composition_two_enrichments():
    """Two stages chained over one Dataset: the second stage sees (and
    preserves) the first's output columns — the category-index /
    multi-observer extension point exercised end-to-end."""
    from neo4j_webgraph_ray.stages.enrich import StubMultiSocialStage

    ds = vertex_ds(["alpha", "beta", "x"])
    step1 = enrich(ds, StubSocialCountStage, concurrency=1)
    step2 = enrich(step1, StubMultiSocialStage, concurrency=1)
    out = step2.to_pandas().set_index("key")
    for k in ("alpha", "beta", "x"):
        assert out.loc[k, "social_count"] == stub_social_count(k)
        assert out.loc[k, "facebook_count"] == stub_social_count(k)


def test_politeness_throttle():
    import time

    c = ThrottledRetryingClient(lambda k: 1, min_interval_sec=0.05)
    t0 = time.monotonic()
    c.get("a"), c.get("b"), c.get("c")
    assert time.monotonic() - t0 >= 0.09  # ≥2 enforced intervals
