"""GCS blob-store contract (blobstore.GCSDocumentStore) against a local
fake GCS JSON-API server, plus the OAuth device-flow bootstrap
(drive.oauth_device_flow) against a fake token service."""
import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from mobius_rag_tpu.blobstore import (GCSDocumentStore, get_document_store)
from mobius_rag_tpu.drive import oauth_device_flow
from mobius_rag_tpu.ingest.worker import DocumentBlob, FileDocumentStore


def _server(handler_cls):
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler_cls)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_port}"


def _gcs_stub(state):
    """Minimal GCS JSON API: media upload, alt=media download, metadata
    GET, DELETE — object names URL-encoded in the path."""

    class H(BaseHTTPRequestHandler):
        def _name_from(self, prefix):
            raw = self.path[len(prefix):]
            return urllib.parse.unquote(raw.split("?")[0])

        def do_POST(self):
            q = urllib.parse.parse_qs(urllib.parse.urlparse(self.path).query)
            name = q["name"][0]
            n = int(self.headers.get("Content-Length", 0))
            state["objects"][name] = self.rfile.read(n)
            state["auths"].append(self.headers.get("Authorization", ""))
            data = json.dumps({"name": name}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            name = self._name_from(f"/storage/v1/b/{state['bucket']}/o/")
            if name not in state["objects"]:
                self.send_response(404)
                self.end_headers()
                return
            if "alt=media" in self.path:
                data = state["objects"][name]
            else:
                data = json.dumps(
                    {"updated": "2026-08-20T10:00:00.000Z",
                     "size": str(len(state["objects"][name]))}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_DELETE(self):
            name = self._name_from(f"/storage/v1/b/{state['bucket']}/o/")
            if state["objects"].pop(name, None) is None:
                self.send_response(404)
            else:
                self.send_response(204)
            self.end_headers()

        def log_message(self, *a):
            pass

    return H


def test_gcs_put_get_delete_roundtrip():
    state = {"objects": {}, "auths": [], "bucket": "bkt"}
    srv, url = _server(_gcs_stub(state))
    try:
        store = GCSDocumentStore("bkt", api_base=url, token="tok-1")
        blob = DocumentBlob(doc_id="doc-1", filename="a.pdf",
                            data=b"%PDF-bytes", payer="aetna", state="FL",
                            authority_level=2, summary="manual")
        store.put(blob)
        assert "documents/doc-1.bin" in state["objects"]
        assert state["auths"][0] == "Bearer tok-1"
        meta = json.loads(state["objects"]["documents/doc-1.meta.json"])
        assert meta["payer"] == "aetna" and meta["authority_level"] == 2

        # fresh store (cold cache) reads through from the bucket
        store2 = GCSDocumentStore("bkt", api_base=url, token="tok-1")
        got = store2.get("doc-1")
        assert got is not None and got.data == b"%PDF-bytes"
        assert got.payer == "aetna" and got.filename == "a.pdf"
        assert store2.mtime("doc-1") is not None

        assert store2.delete("doc-1") is True
        assert state["objects"] == {}
        store3 = GCSDocumentStore("bkt", api_base=url, token="tok-1")
        assert store3.get("doc-1") is None
        assert store3.delete("doc-1") is False
        assert store3.mtime("doc-1") is None
    finally:
        srv.shutdown()


def test_gcs_requires_bucket(monkeypatch):
    monkeypatch.delenv("MRAG_GCS_BUCKET", raising=False)
    with pytest.raises(ValueError):
        GCSDocumentStore()


def test_env_selected_store(monkeypatch):
    monkeypatch.setenv("MRAG_BLOB_STORE", "fs")
    assert isinstance(get_document_store(), FileDocumentStore)
    monkeypatch.setenv("MRAG_BLOB_STORE", "gcs")
    monkeypatch.setenv("MRAG_GCS_BUCKET", "bkt")
    monkeypatch.setenv("MRAG_GCS_TOKEN", "t")
    assert isinstance(get_document_store(), GCSDocumentStore)


# ---------------------------------------------------------- device flow


def _device_stub(state):
    class H(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            form = urllib.parse.parse_qs(self.rfile.read(n).decode())
            state["posts"].append({"path": self.path, "form": form})
            if self.path == "/device/code":
                payload, status = {
                    "device_code": "dc-1", "user_code": "ABCD-EFGH",
                    "verification_url": "https://example/device",
                    "interval": 0, "expires_in": 600}, 200
            else:  # token endpoint: pending twice, then grant
                state["polls"] += 1
                if state["polls"] < 3:
                    payload, status = {"error": "authorization_pending"}, 428
                else:
                    payload, status = {
                        "access_token": "at-9", "refresh_token": "rt-9",
                        "expires_in": 3600}, 200
            data = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    return H


def test_device_flow_polls_until_grant():
    state = {"posts": [], "polls": 0}
    srv, url = _server(_device_stub(state))
    prompts = []
    try:
        tok = oauth_device_flow(
            client_id="cid", client_secret="cs",
            device_url=f"{url}/device/code", token_url=f"{url}/token",
            prompt=prompts.append, sleep=lambda s: None)
        assert tok["refresh_token"] == "rt-9"
        assert state["polls"] == 3
        assert "ABCD-EFGH" in prompts[0]
        grant = state["posts"][-1]["form"]
        assert grant["grant_type"] == [
            "urn:ietf:params:oauth:grant-type:device_code"]
        assert grant["device_code"] == ["dc-1"]
    finally:
        srv.shutdown()


def test_device_flow_terminal_error():
    class H(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path == "/device/code":
                payload = {"device_code": "dc", "user_code": "X",
                           "verification_url": "u", "interval": 0,
                           "expires_in": 600}
                status = 200
            else:
                payload, status = {"error": "access_denied"}, 403
            data = json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    srv, url = _server(H)
    try:
        with pytest.raises(RuntimeError, match="access_denied"):
            oauth_device_flow(client_id="cid",
                              device_url=f"{url}/device/code",
                              token_url=f"{url}/token",
                              prompt=lambda *_: None, sleep=lambda s: None)
    finally:
        srv.shutdown()
