"""E3 contextual enrichment + E5 retry/backoff classification
(reference src/utils.py:227-325 and :56-131)."""

from __future__ import annotations

import pytest

from mcp_crawl4ai_rag_spark.functions.embedding import (
    is_critical_error,
    retry_with_backoff,
    with_contextual_text,
)


def test_contextual_disabled_falls_back_to_chunk(spark, monkeypatch):
    monkeypatch.delenv("MODEL_CHOICE", raising=False)
    df = spark.createDataFrame(
        [("full doc text here", "the chunk")], "markdown string, content string"
    )
    out = with_contextual_text(df).head()
    assert out["contextual_content"] == "the chunk"


def test_contextual_enabled_prepends_context(spark):
    df = spark.createDataFrame(
        [("Full document body identifying the doc. " * 10, "the chunk")],
        "markdown string, content string",
    )
    out = with_contextual_text(df, enabled=True).head()
    ctx, sep, chunk = out["contextual_content"].partition("\n---\n")
    assert sep and chunk == "the chunk"
    assert ctx.startswith("Context: Full document body")


def test_retry_retries_transient_then_succeeds():
    calls = {"n": 0}
    sleeps = []

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("429 rate limit")
        return "ok"

    assert retry_with_backoff(flaky, sleep=sleeps.append) == "ok"
    assert calls["n"] == 3
    assert len(sleeps) == 2 and sleeps[1] > sleeps[0]  # exponential


def test_retry_gives_up_after_max():
    def always():
        raise RuntimeError("503 unavailable")

    with pytest.raises(RuntimeError):
        retry_with_backoff(always, sleep=lambda _t: None)


def test_critical_errors_fail_fast():
    calls = {"n": 0}

    def auth():
        calls["n"] += 1
        raise RuntimeError("401 invalid_api_key")

    with pytest.raises(RuntimeError):
        retry_with_backoff(auth, sleep=lambda _t: None)
    assert calls["n"] == 1  # never retried
    assert is_critical_error(RuntimeError("model_not_found: gpt-x"))
    assert not is_critical_error(RuntimeError("429 too many requests"))
