"""Telemetry store, progress emitter, JSON logging, providers/registries."""
import json
import logging

import numpy as np
import pytest

from mobius_rag_tpu.observability import (JsonFormatter, ProgressEmitter,
                                          TelemetryStore, classify_severity)
from mobius_rag_tpu.providers import (HashProvider, LLMConfig, LLMConfigRegistry,
                                      PromptRegistry, get_embedding_provider)


def test_telemetry_search_events_roundtrip(tmp_path):
    t = TelemetryStore(str(tmp_path / "t.sqlite"))
    sid = t.record_search_event(query="q1", mode="corpus",
                                timings={"device": 1.2}, arms={"vector": 3},
                                expansion=["d:x"], results=[{"chunk_id": "c1"}])
    t.flush()
    events = t.recent_search_events()
    assert events and events[0]["search_id"] == sid
    assert events[0]["timings"]["device"] == 1.2
    t.close()


def test_telemetry_errors_and_severity(tmp_path):
    t = TelemetryStore(str(tmp_path / "t.sqlite"))
    t.record_error("worker", TimeoutError("connection timeout"), {"job": "j1"})
    t.record_error("worker", ValueError("bad shape"))
    t.flush()
    errs = t.recent_errors()
    assert len(errs) == 2
    assert classify_severity(TimeoutError("connection timeout")) == "warning"
    assert classify_severity(ValueError("bad shape")) == "error"
    assert classify_severity(AssertionError("integrity violated")) == "critical"
    warn = t.recent_errors(severity="warning")
    assert len(warn) == 1 and "timeout" in warn[0]["message"]
    t.close()


def test_progress_emitter_ordering_and_subscribe():
    p = ProgressEmitter()
    seen = []
    p.subscribe("c1", seen.append)
    p.emit("c1", "extract", pages=3)
    p.emit("c1", "embed", done=10)
    p.emit("other", "x")
    events = p.events("c1")
    assert [e["stage"] for e in events] == ["extract", "embed"]
    assert [e["seq"] for e in events] == [0, 1]
    assert len(seen) == 2
    assert p.events("c1", since_seq=0)[0]["stage"] == "embed"


def test_json_formatter_includes_ids():
    fmt = JsonFormatter("svc")
    rec = logging.LogRecord("lg", logging.INFO, "f.py", 1, "hello %s", ("x",), None)
    rec.search_id = "s123"
    out = json.loads(fmt.format(rec))
    assert out["msg"] == "hello x" and out["service"] == "svc"
    assert out["search_id"] == "s123"


def test_embedding_provider_registry(monkeypatch):
    p = get_embedding_provider("hash")
    v = p.embed(["hello"])
    assert isinstance(p, HashProvider) and v.shape[1] == p.dim
    monkeypatch.setenv("MRAG_EMBED_PROVIDER", "hash")
    assert get_embedding_provider().name == "hash"
    with pytest.raises(ValueError, match="unknown embedding provider"):
        get_embedding_provider("nope")


def test_llm_config_redaction():
    reg = LLMConfigRegistry()
    reg.upsert(LLMConfig(name="prod", provider="http", model="m1",
                         params={"api_key_header": "k", "temp": 0.1},
                         secrets={"api_key": "raw"}))
    red = reg.list_redacted()[0]
    assert red["secrets"]["api_key"] == "***"
    assert red["params"]["api_key_header"] == "***"
    assert red["params"]["temp"] == 0.1


def test_prompt_registry_versions_and_sha():
    reg = PromptRegistry()
    v1 = reg.put("extraction", "v1", "old prompt")
    v2 = reg.put("extraction", "v2", "new prompt")
    assert reg.get("extraction").version == "v2"
    assert reg.get("extraction", "v1").text == "old prompt"
    assert reg.by_sha(v1.sha).text == "old prompt"
    assert {p["version"] for p in reg.list_all()} == {"v1", "v2"}
    assert v1.sha != v2.sha
