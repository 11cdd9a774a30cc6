"""Web-search transports (providers_external.py: Google CSE JSON API,
DuckDuckGo HTML, fallback chain) contract-tested against local fake
servers speaking each wire format — reference parity for strategy d's
Google→DDG search stack (corpus_search_strategy_d.py:461-534)."""
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

from mobius_rag_tpu.providers_external import (DDGHTMLWebClient,
                                               FallbackWebClient,
                                               GoogleCSEWebClient,
                                               get_web_client)


def _get_server(route):
    state = {"requests": []}

    class H(BaseHTTPRequestHandler):
        def do_GET(self):
            state["requests"].append(self.path)
            status, ctype, body = route(self.path, state)
            data = body if isinstance(body, bytes) else body.encode()
            self.send_response(status)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_port}", state


def test_google_cse_contract():
    def route(path, state):
        u = urlparse(path)
        assert u.path == "/customsearch/v1"
        q = parse_qs(u.query)
        assert q["key"] == ["k123"] and q["cx"] == ["cx9"]
        assert q["q"] == ["timely filing florida medicaid"]
        return 200, "application/json", json.dumps({"items": [
            {"title": "AHCA timely filing", "link": "https://ahca.example/tf",
             "snippet": "Claims must be filed within 180 days."},
            {"title": "Payer manual", "link": "https://payer.example/m",
             "snippet": "See section 4."},
        ]})

    srv, base, state = _get_server(route)
    try:
        c = GoogleCSEWebClient(base_url=base, key="k123", cx="cx9")
        out = c.search("timely filing florida medicaid", max_results=2)
        assert out == [
            {"title": "AHCA timely filing", "url": "https://ahca.example/tf",
             "snippet": "Claims must be filed within 180 days."},
            {"title": "Payer manual", "url": "https://payer.example/m",
             "snippet": "See section 4."},
        ]
    finally:
        srv.shutdown()


def test_google_cse_requires_creds(monkeypatch):
    monkeypatch.delenv("MRAG_GOOGLE_CSE_KEY", raising=False)
    monkeypatch.delenv("MRAG_GOOGLE_CSE_CX", raising=False)
    with pytest.raises(ValueError):
        GoogleCSEWebClient()


DDG_PAGE = """
<html><body>
<div class="result">
  <a rel="nofollow" class="result__a"
     href="//duckduckgo.com/l/?uddg=https%3A%2F%2Fahca.example%2Ftf&amp;rut=x">
     AHCA <b>timely</b> filing</a>
  <a class="result__snippet" href="#">Claims must be filed within
  <b>180 days</b> of service.</a>
</div>
<div class="result">
  <a rel="nofollow" class="result__a" href="https://payer.example/manual">
     Payer manual</a>
  <a class="result__snippet" href="#">Section 4 covers claims.</a>
</div>
</body></html>
"""


def test_ddg_html_contract():
    def route(path, state):
        u = urlparse(path)
        assert u.path == "/html/"
        assert parse_qs(u.query)["q"] == ["timely filing"]
        return 200, "text/html", DDG_PAGE

    srv, base, state = _get_server(route)
    try:
        c = DDGHTMLWebClient(base_url=base)
        out = c.search("timely filing", max_results=5)
        assert out[0]["url"] == "https://ahca.example/tf"  # uddg unwrapped
        assert out[0]["title"] == "AHCA timely filing"
        assert "180 days" in out[0]["snippet"]
        assert out[1]["url"] == "https://payer.example/manual"
    finally:
        srv.shutdown()


def test_fallback_chain_on_error_and_empty():
    class Boom:
        def search(self, q, *, max_results=5):
            raise RuntimeError("google down")

        def fetch(self, url, *, timeout_s=8.0):
            raise RuntimeError("google down")

    class Empty:
        def search(self, q, *, max_results=5):
            return []

        def fetch(self, url, *, timeout_s=8.0):
            return ""

    class Ok:
        def search(self, q, *, max_results=5):
            return [{"title": "t", "url": "u", "snippet": "s"}]

        def fetch(self, url, *, timeout_s=8.0):
            return "page"

    assert FallbackWebClient(Boom(), Ok()).search("q")[0]["url"] == "u"
    assert FallbackWebClient(Empty(), Ok()).search("q")[0]["url"] == "u"
    assert FallbackWebClient(Boom(), Ok()).fetch("u") == "page"


def test_env_selection(monkeypatch):
    monkeypatch.delenv("MRAG_WEB_PROVIDER", raising=False)
    assert get_web_client() is None
    monkeypatch.setenv("MRAG_WEB_PROVIDER", "ddg")
    assert isinstance(get_web_client(), DDGHTMLWebClient)
    monkeypatch.setenv("MRAG_GOOGLE_CSE_KEY", "k")
    monkeypatch.setenv("MRAG_GOOGLE_CSE_CX", "c")
    monkeypatch.setenv("MRAG_WEB_PROVIDER", "google")
    assert isinstance(get_web_client(), GoogleCSEWebClient)
    monkeypatch.setenv("MRAG_WEB_PROVIDER", "google+ddg")
    assert isinstance(get_web_client(), FallbackWebClient)
    monkeypatch.setenv("MRAG_WEB_PROVIDER", "bogus")
    with pytest.raises(ValueError):
        get_web_client()


def test_strategy_d_through_ddg_fake_server():
    """End-to-end: strategy d drives the concrete DDG transport against
    a fake server serving both the SERP and the result pages — the
    round-4 seeded-web calibration pattern, now through the real
    adapter (VERDICT r4 item 8)."""
    PAGE = ("<html><body><h1>Timely filing</h1><p>Claims must be "
            "submitted within 180 days of the date of service per "
            "AHCA rule.</p></body></html>")

    def route(path, state):
        u = urlparse(path)
        if u.path == "/html/":
            serp = DDG_PAGE.replace("https%3A%2F%2Fahca.example%2Ftf",
                                    "@@BASE@@/page").replace(
                "https://payer.example/manual", "@@BASE@@/page2")
            return 200, "text/html", serp.replace("@@BASE@@", state["base"])
        return 200, "text/html", PAGE

    srv, base, state = _get_server(route)
    state["base"] = base
    try:
        from mobius_rag_tpu.query.engine import QueryRequest
        from mobius_rag_tpu.query.strategies import run_strategy_d

        class CitingLLM:  # canned synthesis with the required citations
            def generate(self, prompt, **kw):
                assert "[passage 0]" in prompt  # fetched pages reached it
                return ("Claims must be submitted within 180 days "
                        "[passage 0].")

        req = QueryRequest(query="timely filing deadline", state="FL")
        out = run_strategy_d(None, req, 5, CitingLLM(),
                             DDGHTMLWebClient(base_url=base))
        assert out.success, out.detail
        assert out.hits, "strategy d returned no external hits"
        assert all(h.metadata["source_type"] == "external" for h in out.hits)
        assert any("180 days" in h.text for h in out.hits)
        assert "[passage" in out.answer
    finally:
        srv.shutdown()
