"""HTTP LLM adapter, durable blob store, snapshot version ladder."""
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np
import pytest

from mobius_rag_tpu.clients import (HTTPLLMClient, LLMHTTPError,
                                    OfflineLLMStub, get_llm_client)


def _llm_server(script):
    """script: list of (status, body_dict) responses, served in order."""
    state = {"i": 0, "requests": []}

    class H(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            state["requests"].append(json.loads(self.rfile.read(n)))
            status, body = script[min(state["i"], len(script) - 1)]
            state["i"] += 1
            data = json.dumps(body).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_port}/llm", state


def test_http_llm_client_generates_and_sends_stage():
    srv, url, state = _llm_server([(200, {"text": "the answer"})])
    try:
        out = HTTPLLMClient(url).generate("q?", stage="synthesis",
                                          max_tokens=64)
        assert out == "the answer"
        assert state["requests"][0]["stage"] == "synthesis"
        assert state["requests"][0]["max_tokens"] == 64
    finally:
        srv.shutdown()


def test_http_llm_client_retries_transient_5xx():
    srv, url, state = _llm_server([(500, {}), (200, {"completion": "ok"})])
    try:
        out = HTTPLLMClient(url, backoff_s=0.01).generate("q")
        assert out == "ok" and state["i"] == 2
    finally:
        srv.shutdown()


def test_http_llm_client_4xx_raises_immediately():
    srv, url, state = _llm_server([(400, {"error": "bad"})])
    try:
        with pytest.raises(LLMHTTPError, match="400"):
            HTTPLLMClient(url, backoff_s=0.01).generate("q")
        assert state["i"] == 1  # no retries on 4xx
    finally:
        srv.shutdown()


def test_get_llm_client_env_selection(monkeypatch):
    monkeypatch.delenv("MRAG_LLM_URL", raising=False)
    assert isinstance(get_llm_client(), OfflineLLMStub)
    assert isinstance(get_llm_client("http://x/llm"), HTTPLLMClient)


def test_file_document_store_survives_restart(tmp_path):
    from mobius_rag_tpu.ingest.worker import DocumentBlob, FileDocumentStore

    root = str(tmp_path / "docs")
    store = FileDocumentStore(root)
    store.put(DocumentBlob(doc_id="manual", filename="m.txt",
                           data=b"hello claims", payer="sunshine_health",
                           state="FL", authority_level=3))
    # a second process (fresh instance) sees the blob + metadata
    store2 = FileDocumentStore(root)
    blob = store2.get("manual")
    assert blob is not None and blob.data == b"hello claims"
    assert blob.payer == "sunshine_health" and blob.authority_level == 3


def test_snapshot_version_ladder(tmp_path, rng):
    import json as _json

    from mobius_rag_tpu.config import get_config
    from mobius_rag_tpu.index.store import ChunkRecord, ChunkStore

    cfg = get_config()
    store = ChunkStore()
    store.add_chunks([ChunkRecord(
        chunk_id="a-c0", doc_id="a", text="x" * 100,
        embedding=rng.standard_normal(cfg.embed_dim).astype(np.float32))])
    snap = str(tmp_path / "snap")
    store.snapshot(snap)
    meta_path = f"{snap}/store.json"
    state = _json.load(open(meta_path))

    # v0 (pre-versioned) upgrades in place
    state.pop("version")
    _json.dump(state, open(meta_path, "w"))
    assert ChunkStore.restore(snap).size == 1

    # a FUTURE version refuses with a clear error
    state["version"] = 99
    _json.dump(state, open(meta_path, "w"))
    with pytest.raises(ValueError, match="newer than this build"):
        ChunkStore.restore(snap)
