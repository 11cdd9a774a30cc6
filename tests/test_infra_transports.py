"""HTTP transports that are env-gated in production: the k8s infra
scaler (infra.py) and the Drive REST client (drive.HTTPDrive), both
exercised against local stub servers (this image has no egress)."""
import json
import threading
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from mobius_rag_tpu import infra
from mobius_rag_tpu.drive import HTTPDrive, InMemoryDrive, import_folder


def _server(handler_cls):
    srv = ThreadingHTTPServer(("127.0.0.1", 0), handler_cls)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_port}"


# ---------------------------------------------------------------- infra


def _k8s_stub(state):
    class H(BaseHTTPRequestHandler):
        def do_PATCH(self):
            n = int(self.headers.get("Content-Length", 0))
            state["calls"].append({
                "path": self.path,
                "body": json.loads(self.rfile.read(n)),
                "auth": self.headers.get("Authorization", ""),
                "ctype": self.headers.get("Content-Type", ""),
            })
            data = b'{"spec": {"replicas": 4}}'
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    return H


def test_infra_unconfigured_is_noop(monkeypatch):
    monkeypatch.delenv("MRAG_K8S_API", raising=False)
    monkeypatch.delenv("KUBERNETES_SERVICE_HOST", raising=False)
    assert not infra.configured()
    assert "no-op" in infra.scale("up")


def test_infra_scales_via_k8s_scale_subresource(monkeypatch):
    state = {"calls": []}
    srv, base = _server(_k8s_stub(state))
    try:
        monkeypatch.setenv("MRAG_K8S_API", base)
        monkeypatch.setenv("MRAG_K8S_TOKEN", "sekrit")
        monkeypatch.setenv("MRAG_K8S_NAMESPACE", "mrag")
        monkeypatch.setenv("MRAG_NIGHTLY_EMBED_WORKERS", "6")
        out = infra.scale("up")
        assert "worker=6" in out
        call = state["calls"][0]
        assert call["path"] == ("/apis/apps/v1/namespaces/mrag/deployments/"
                                "mrag-embedding-worker/scale")
        assert call["body"] == {"spec": {"replicas": 6}}
        assert call["auth"] == "Bearer sekrit"
        assert call["ctype"] == "application/merge-patch+json"
        # freeze + down revert to the floor
        out = infra.scale("down")
        assert "worker=1" in out
        assert state["calls"][-1]["body"] == {"spec": {"replicas": 1}}
    finally:
        srv.shutdown()


def test_infra_scale_is_best_effort(monkeypatch):
    # a dead endpoint must produce an err summary, never an exception
    monkeypatch.setenv("MRAG_K8S_API", "http://127.0.0.1:1")
    monkeypatch.setenv("MRAG_K8S_TOKEN", "t")
    out = infra.scale("up")
    assert "err(" in out


def test_nightly_uses_infra_hooks_by_default(monkeypatch):
    monkeypatch.delenv("MRAG_K8S_API", raising=False)
    monkeypatch.delenv("KUBERNETES_SERVICE_HOST", raising=False)
    from mobius_rag_tpu.nightly import NightlyOrchestrator

    orch = NightlyOrchestrator(ctx=None)
    assert "no-op" in orch.infra_up()["infra"]
    assert "no-op" in orch.infra_down()["infra"]


# ---------------------------------------------------------------- drive


def _drive_stub(state):
    files = [
        {"id": "f1", "name": "FL_Sunshine_Provider_Manual.pdf",
         "mimeType": "application/pdf", "size": "120"},
        {"id": "f2", "name": "notes.gdoc",
         "mimeType": "application/vnd.google-apps.document"},
    ]

    class H(BaseHTTPRequestHandler):
        def do_POST(self):  # token endpoint
            n = int(self.headers.get("Content-Length", 0))
            form = urllib.parse.parse_qs(self.rfile.read(n).decode())
            state["token_requests"].append(form)
            data = json.dumps(
                {"access_token": "at-123", "expires_in": 3600}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            state["gets"].append(
                {"path": self.path,
                 "auth": self.headers.get("Authorization", "")})
            parsed = urllib.parse.urlparse(self.path)
            if parsed.path == "/files":
                q = urllib.parse.parse_qs(parsed.query)
                # two pages to exercise pagination
                if "pageToken" in q:
                    body = {"files": files[1:]}
                else:
                    body = {"files": files[:1], "nextPageToken": "p2"}
                data = json.dumps(body).encode()
            elif parsed.path == "/files/f2/export":
                data = b"exported text"
            elif parsed.path == "/files/f1":
                data = b"%PDF-raw-bytes"
            else:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    return H


def test_httpdrive_oauth_list_and_download():
    state = {"token_requests": [], "gets": []}
    srv, base = _server(_drive_stub(state))
    try:
        client = HTTPDrive(api_base=base, token_url=base + "/token",
                           client_id="cid", client_secret="cs",
                           refresh_token="rt")
        files = client.list_folder("folder-1")
        assert [f["file_id"] for f in files] == ["f1", "f2"]
        assert files[0]["size"] == 120
        # refresh-token grant happened exactly once (token is cached)
        assert len(state["token_requests"]) == 1
        assert state["token_requests"][0]["grant_type"] == ["refresh_token"]
        assert all(g["auth"] == "Bearer at-123" for g in state["gets"])
        # binary files via alt=media; google-native docs via /export
        assert client.download("f1") == b"%PDF-raw-bytes"
        assert client.download(
            "f2", mime="application/vnd.google-apps.document") == b"exported text"
        assert any("alt=media" in g["path"] for g in state["gets"])
        assert any("/files/f2/export" in g["path"] for g in state["gets"])
    finally:
        srv.shutdown()


def test_httpdrive_static_token_skips_oauth():
    state = {"token_requests": [], "gets": []}
    srv, base = _server(_drive_stub(state))
    try:
        client = HTTPDrive(api_base=base, access_token="static-tok")
        client.list_folder("folder-1")
        assert not state["token_requests"]
        assert state["gets"][0]["auth"] == "Bearer static-tok"
    finally:
        srv.shutdown()


def test_httpdrive_without_credentials_raises():
    client = HTTPDrive(api_base="http://127.0.0.1:1")
    with pytest.raises(RuntimeError, match="no access token"):
        client.list_folder("f")
