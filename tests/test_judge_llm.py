"""The rubric judge's LLM path (eval_harness/judge.py) exercised
through the CONCRETE OpenAI chat/completions adapter against a local
fake server — the judge scores a bank end-to-end via the wire format,
not the offline overlap matcher (reference parity: eval/judge.py:376
scores via the LLM manager; bands at :10-14 stay deterministic)."""
import json
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from mobius_rag_tpu.eval_harness.judge import get_judge_llm, judge_answer
from mobius_rag_tpu.providers_external import OpenAILLMClient


def _fake_chat_server(verdict_fn):
    """chat/completions fake whose 'model' actually reads the numbered
    facts and answers per-fact booleans via verdict_fn(answer, facts)."""
    state = {"requests": []}

    class H(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n) or b"{}")
            state["requests"].append({"path": self.path, "body": body})
            prompt = body["messages"][-1]["content"]
            answer = re.search(r"ANSWER:\n(.*?)\n\nFACTS:", prompt, re.S)
            facts = re.findall(r"^\d+\. \[(\w+)\] (.*)$", prompt, re.M)
            flags = verdict_fn(answer.group(1) if answer else "", facts)
            payload = {"choices": [{"message": {
                "content": json.dumps(flags)}}]}
            data = json.dumps(payload).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def log_message(self, *a):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), H)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    return srv, f"http://127.0.0.1:{srv.server_port}", state


def _semantic_stub(answer, facts):
    # crude 'semantic' containment: fact counted asserted when most of
    # its content words appear in the answer — deterministic canned
    # verdicts that differ from the repo's overlap matcher thresholds
    out = []
    for _, fact in facts:
        words = [w for w in re.findall(r"[a-z0-9]+", fact.lower())
                 if len(w) > 3]
        hit = sum(w in answer.lower() for w in words)
        out.append(bool(words) and hit / len(words) >= 0.6)
    return out


def test_judge_llm_path_via_openai_adapter(monkeypatch):
    srv, base, state = _fake_chat_server(_semantic_stub)
    try:
        llm = OpenAILLMClient(base_url=base, api_key="test-key")
        jr = judge_answer(
            "For Florida Medicaid, the timely filing deadline is 180 days "
            "from the date of service; late claims are rejected.",
            must_facts=["timely filing deadline is 180 days",
                        "claims are denied after the deadline"],
            bonus_facts=["applies to Florida Medicaid"],
            forbidden_facts=["prior authorization is required first"],
            llm=llm)
        assert jr.method == "llm"
        assert jr.verdicts.must == [True, False]
        assert jr.verdicts.bonus == [True]
        assert jr.verdicts.forbidden == [False]
        assert 0.0 < jr.score < 0.85  # one of two must-facts → partial band
        assert jr.verdict == "partial"
        # the adapter really spoke chat/completions
        req = state["requests"][0]
        assert req["path"].endswith("/v1/chat/completions")
        assert req["body"]["messages"][-1]["role"] == "user"
    finally:
        srv.shutdown()


def test_judge_llm_scores_bank_end_to_end(monkeypatch):
    """run_eval with judge_llm through the adapter: every result's judge
    method is 'llm' and the canned verdicts drive the verdict bands."""
    from mobius_rag_tpu.eval_harness.run import run_eval
    from mobius_rag_tpu.index.store import ChunkStore
    from mobius_rag_tpu.query.agent import CorpusSearchAgent
    from mobius_rag_tpu.query.engine import SearchEngine
    from mobius_rag_tpu.testing import hash_embed, sample_lexicon, toy_corpus

    srv, base, state = _fake_chat_server(_semantic_stub)
    try:
        lex = sample_lexicon()
        store = ChunkStore()
        store.add_chunks(toy_corpus(lex, pad_docs=20))
        agent = CorpusSearchAgent(SearchEngine(store, lex,
                                               embed_fn=hash_embed))
        llm = OpenAILLMClient(base_url=base, api_key="test-key")
        out = run_eval(agent, "toy", k=5, judge_llm=llm)
        assert out.results, "empty eval run"
        assert all(r["judge_method"] == "llm" for r in out.results), [
            r["judge_method"] for r in out.results]
        assert state["requests"], "judge never reached the fake endpoint"
        assert 0.0 <= out.aggregates["accuracy"] <= 1.0
    finally:
        srv.shutdown()


def test_get_judge_llm_env_selection(monkeypatch):
    monkeypatch.delenv("MRAG_JUDGE_PROVIDER", raising=False)
    assert get_judge_llm() is None
    monkeypatch.setenv("MRAG_JUDGE_PROVIDER", "openai")
    monkeypatch.setenv("MRAG_OPENAI_API_KEY", "k")
    assert isinstance(get_judge_llm(), OpenAILLMClient)
    monkeypatch.setenv("MRAG_JUDGE_PROVIDER", "proxy")
    monkeypatch.setenv("MRAG_JUDGE_URL", "http://127.0.0.1:1/llm")
    from mobius_rag_tpu.clients import HTTPLLMClient

    assert isinstance(get_judge_llm(), HTTPLLMClient)
    monkeypatch.setenv("MRAG_JUDGE_PROVIDER", "nope")
    with pytest.raises(ValueError):
        get_judge_llm()


def test_malformed_llm_reply_falls_back_to_overlap():
    class Garbage:
        def generate(self, prompt, **kw):
            return "I cannot answer in JSON."

    jr = judge_answer("some answer about filing deadlines",
                      must_facts=["filing deadlines"], llm=Garbage())
    assert jr.method == "overlap"  # graceful degradation, not a crash
