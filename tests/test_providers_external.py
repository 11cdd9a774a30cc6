"""Contract tests for the concrete OpenAI/Vertex wire adapters
(providers_external.py) against local fake servers speaking each wire
format — the offline stand-in for the real endpoints (reference
embedding_provider.py:24-149, llm_provider.py:38-202)."""
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from mobius_rag_tpu.clients import LLMHTTPError, get_llm_client
from mobius_rag_tpu.providers import get_embedding_provider
from mobius_rag_tpu.providers_external import (OpenAIEmbeddingProvider,
                                               OpenAILLMClient,
                                               VertexEmbeddingProvider,
                                               VertexLLMClient)


def _server(handler_cls):
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler_cls)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_port}"


def _json_handler(state, route):
    """Handler recording (path, auth, body) and answering via route(path,
    body) → (status, payload)."""

    class H(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n) or b"{}")
            state["requests"].append({
                "path": self.path, "body": body,
                "auth": self.headers.get("Authorization", "")})
            status, payload = route(self.path, body, state)
            data = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    return H


# ------------------------------------------------------------- OpenAI


def _openai_route(path, body, state):
    if path == "/v1/embeddings":
        dim = int(body.get("dimensions", 8))
        return 200, {"data": [
            # reversed order: the client must re-sort by index
            {"index": i, "embedding": [float(i + 1)] * dim}
            for i in reversed(range(len(body["input"])))
        ]}
    if path == "/v1/chat/completions":
        if state.get("fail_first") and len(state["requests"]) == 1:
            return 500, {"error": "transient"}
        user = [m for m in body["messages"] if m["role"] == "user"]
        return 200, {"choices": [{"message": {
            "role": "assistant",
            "content": f"echo:{user[0]['content']}"}}]}
    return 404, {"error": "no route"}


def test_openai_embeddings_contract(monkeypatch):
    state = {"requests": []}
    srv, url = _server(_json_handler(state, _openai_route))
    try:
        p = OpenAIEmbeddingProvider(base_url=url, api_key="sk-test",
                                    model="text-embedding-3-small", dim=8,
                                    batch_size=2)
        out = p.embed(["a", "b", "c"])
        assert out.shape == (3, 8)
        # index-keyed reassembly despite reversed response order
        np.testing.assert_allclose(out[0], np.full(8, 1.0))
        np.testing.assert_allclose(out[1], np.full(8, 2.0))
        # batching: 3 texts at batch 2 → 2 requests
        assert len(state["requests"]) == 2
        r = state["requests"][0]
        assert r["path"] == "/v1/embeddings"
        assert r["auth"] == "Bearer sk-test"
        assert r["body"]["model"] == "text-embedding-3-small"
        assert r["body"]["input"] == ["a", "b"]
    finally:
        srv.shutdown()


def test_openai_llm_contract_with_retry(monkeypatch):
    state = {"requests": [], "fail_first": True}
    srv, url = _server(_json_handler(state, _openai_route))
    try:
        c = OpenAILLMClient(base_url=url, api_key="sk-test", model="gpt-x")
        c.timeout_s = 5
        # transient 500 then success — the retry ladder must absorb it
        import mobius_rag_tpu.providers_external as pe
        monkeypatch.setattr(pe.time, "sleep", lambda s: None)
        out = c.generate("hello", system="sys", stage="synthesis")
        assert out == "echo:hello"
        assert len(state["requests"]) == 2
        body = state["requests"][-1]["body"]
        assert body["messages"][0] == {"role": "system", "content": "sys"}
        assert body["metadata"] == {"stage": "synthesis"}
    finally:
        srv.shutdown()


def test_openai_env_selection(monkeypatch):
    state = {"requests": []}
    srv, url = _server(_json_handler(state, _openai_route))
    try:
        monkeypatch.setenv("MRAG_OPENAI_BASE_URL", url)
        monkeypatch.setenv("MRAG_OPENAI_API_KEY", "sk-env")
        monkeypatch.setenv("MRAG_EMBED_PROVIDER", "openai")
        p = get_embedding_provider()
        assert p.name == "openai"
        monkeypatch.setenv("MRAG_LLM_PROVIDER", "openai")
        c = get_llm_client()
        assert isinstance(c, OpenAILLMClient)
        assert c.generate("x") == "echo:x"
    finally:
        srv.shutdown()


def test_openai_requires_key(monkeypatch):
    monkeypatch.delenv("MRAG_OPENAI_API_KEY", raising=False)
    with pytest.raises(ValueError):
        OpenAIEmbeddingProvider()


# ------------------------------------------------------------- Vertex


def _vertex_route(path, body, state):
    if path.endswith(":predict"):
        dim = int(body["parameters"]["outputDimensionality"])
        return 200, {"predictions": [
            {"embeddings": {"values": [float(len(inst["content"]))] * dim}}
            for inst in body["instances"]
        ]}
    if path.endswith(":generateContent"):
        txt = body["contents"][0]["parts"][0]["text"]
        return 200, {"candidates": [{"content": {"parts": [
            {"text": "v:"}, {"text": txt}]}}]}
    return 404, {"error": "no route"}


def test_vertex_embeddings_contract():
    state = {"requests": []}
    srv, url = _server(_json_handler(state, _vertex_route))
    try:
        p = VertexEmbeddingProvider(base_url=url, project="proj-1",
                                    location="us-central1", token="tok",
                                    model="gemini-embedding-001", dim=4)
        out = p.embed(["ab", "xyz"])
        assert out.shape == (2, 4)
        np.testing.assert_allclose(out[0], np.full(4, 2.0))
        np.testing.assert_allclose(out[1], np.full(4, 3.0))
        # batch_size=1 wire parity: one instance per request
        # (embedding_provider.py:89)
        assert len(state["requests"]) == 2
        r = state["requests"][0]
        assert r["path"] == ("/v1/projects/proj-1/locations/us-central1/"
                             "publishers/google/models/"
                             "gemini-embedding-001:predict")
        assert r["auth"] == "Bearer tok"
        assert r["body"]["instances"][0]["task_type"] == "RETRIEVAL_DOCUMENT"
    finally:
        srv.shutdown()


def test_vertex_llm_contract(monkeypatch):
    state = {"requests": []}
    srv, url = _server(_json_handler(state, _vertex_route))
    try:
        monkeypatch.setenv("MRAG_VERTEX_BASE_URL", url)
        monkeypatch.setenv("MRAG_VERTEX_PROJECT", "proj-1")
        monkeypatch.setenv("MRAG_VERTEX_TOKEN", "tok")
        monkeypatch.setenv("MRAG_LLM_PROVIDER", "vertex")
        c = get_llm_client()
        assert isinstance(c, VertexLLMClient)
        out = c.generate("question", system="rules", max_tokens=64)
        assert out == "v:question"
        body = state["requests"][-1]["body"]
        assert body["systemInstruction"] == {"parts": [{"text": "rules"}]}
        assert body["generationConfig"]["maxOutputTokens"] == 64
    finally:
        srv.shutdown()


def test_vertex_requires_project_and_token(monkeypatch):
    monkeypatch.delenv("MRAG_VERTEX_PROJECT", raising=False)
    monkeypatch.delenv("MRAG_VERTEX_TOKEN", raising=False)
    with pytest.raises(ValueError):
        VertexEmbeddingProvider()


def test_malformed_response_raises():
    def bad_route(path, body, state):
        return 200, {"unexpected": True}

    state = {"requests": []}
    srv, url = _server(_json_handler(state, bad_route))
    try:
        c = OpenAILLMClient(base_url=url, api_key="k")
        with pytest.raises(LLMHTTPError):
            c.generate("x")
    finally:
        srv.shutdown()
