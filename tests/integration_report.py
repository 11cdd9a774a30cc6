"""End-to-end integration script (NOT pytest — run directly), mirroring
the reference's tests/integration_chunking_test.py: push a small
document fixture through the ENTIRE system — upload → chunk → Path B →
embed → publish → hybrid query → agent → eval → telemetry — then
inspect every store and write a human-readable report.

    PYTHONPATH="$PYTHONPATH:." python tests/integration_report.py
      → tests/integration_test_report.txt
"""
from __future__ import annotations

import io
import os
import sys
import time

FIXTURE = b"""SUNSHINE HEALTH PROVIDER MANUAL

TIMELY FILING
Participating providers must submit initial claims within 180 days
from the date of service. Non-participating providers have 365 days.
Claim disputes are due within 90 days of the EOP.

PRIOR AUTHORIZATION
Residential substance use treatment under H0019 requires prior
authorization from Sunshine Health. Durable medical equipment over
$500 also requires prior authorization. Use form CMS-1500 routinely;
submit CMS-1500 forms through the provider portal.

ELIGIBILITY
Verify member eligibility before each visit via the provider portal.
"""


def main() -> int:
    out = io.StringIO()

    def section(title):
        out.write(f"\n{'=' * 64}\n{title}\n{'=' * 64}\n")

    def line(label, value, ok=None):
        mark = "" if ok is None else ("  [OK]" if ok else "  [FAIL]")
        out.write(f"  {label:<44} {value}{mark}\n")

    failures = []

    def check(label, value, ok):
        line(label, value, ok)
        if not ok:
            failures.append(label)

    import jax

    from mobius_rag_tpu.api.server import AppContext
    from mobius_rag_tpu.eval_harness.run import run_eval
    from mobius_rag_tpu.query.agent import AgentRequest
    from mobius_rag_tpu.query.engine import QueryRequest
    from mobius_rag_tpu.testing import hash_embed, sample_lexicon

    section("environment")
    line("backend", jax.default_backend())
    line("devices", str(jax.devices()))

    t_start = time.perf_counter()
    ctx = AppContext.build(embed_fn=hash_embed, lexicon=sample_lexicon())

    section("1. upload → instant pipeline")
    up = ctx.pipeline.upload(FIXTURE, "sunshine_manual.txt",
                             payer="Sunshine Health", state="Florida",
                             program="MMA", authority_level=4, instant=True)
    check("sha-deduped upload accepted", up.doc_id, not up.deduped)
    check("instant pipeline ran", up.instant,
          bool(up.instant and up.instant["embedding_jobs"] >= 1))
    check("chunks published", ctx.store.size, ctx.store.size >= 3)
    events = ctx.pipeline.queue.events(up.chunking_job)
    check("chunking event trail", [e["stage"] for e in events],
          events and events[-1]["stage"] == "done")

    section("2. device index state")
    import numpy as np

    valid = np.asarray(ctx.store.index.valid)
    check("valid rows == host records", int(valid.sum()),
          int(valid.sum()) == ctx.store.size)
    rec0 = next(r for r in ctx.store.records if r is not None)
    check("Path-B tags on chunks", {"j": rec0.j_tags, "d": rec0.d_tags},
          bool(rec0.j_tags or rec0.d_tags))
    check("metadata canonicalized", rec0.payer, rec0.payer == "sunshine_health")

    section("3. hybrid query")
    res = ctx.engine.search(QueryRequest(
        query="timely filing deadline for sunshine health claims"), k=3)[0]
    check("top hit text", res.hits[0].text[:40] if res.hits else None,
          bool(res.hits and "180 days" in res.hits[0].text))
    check("confidence", res.confidence_label,
          res.confidence_label in ("high", "medium"))
    check("lexicon expansion", res.expansion.matched_codes,
          "d:claims.timely_filing" in res.expansion.matched_codes)
    # at k=1 the sibling chunks are NOT hits, so neighbor expansion
    # must attach them (at k=3 all 3 chunks are hits → dedup → none)
    res1 = ctx.engine.search(QueryRequest(
        query="timely filing deadline for sunshine health claims"), k=1)[0]
    check("neighbors attached at k=1",
          len(res1.hits[0].neighbors) if res1.hits else 0,
          bool(res1.hits and res1.hits[0].neighbors))

    section("4. agent")
    ares = ctx.agent.run(AgentRequest(
        query="Does Sunshine Health require prior authorization for H0019?"))
    check("strategy chain", ares.strategy_chain, bool(ares.strategy_chain))
    check("answer grounded", ares.answer[:60],
          "prior authorization" in ares.answer.lower())
    refused = ctx.agent.run(AgentRequest(query="best lasagna recipe"))
    check("off-domain refusal", refused.gate["contour"], refused.refused)

    section("5. eval harness")
    # the toy bank's golden citations target the toy_corpus documents —
    # load them so citation checks exercise the real matching path
    from mobius_rag_tpu.testing import toy_corpus

    ctx.store.add_chunks(toy_corpus(ctx.engine.lexicon))
    line("corpus widened for eval bank", ctx.store.size)
    ev = run_eval(ctx.agent, "toy", db=ctx.eval_db)
    check("bank queries scored", ev.aggregates["n"], ev.aggregates["n"] == 5)
    check("citation rate", ev.aggregates["citation_rate"],
          ev.aggregates["citation_rate"] >= 0.5)

    section("6. observability")
    ctx.telemetry.flush()
    check("search events persisted", len(ctx.telemetry.recent_search_events()),
          len(ctx.telemetry.recent_search_events()) > 0)
    check("decisions persisted", len(ctx.telemetry.recent_decisions()),
          len(ctx.telemetry.recent_decisions()) >= 2)
    trace = ctx.telemetry.trace(ares.agent_id)
    check("full trace retrievable", bool(trace), trace is not None)

    section("7. integrity")
    from mobius_rag_tpu.integrity import integrity_report

    rep = integrity_report(ctx)
    check("host↔device integrity", rep["counts"], rep["ok"])

    section("summary")
    line("wall time", f"{time.perf_counter() - t_start:.1f}s")
    line("failures", failures or "none")
    verdict = "PASS" if not failures else f"FAIL ({len(failures)})"
    out.write(f"\nVERDICT: {verdict}\n")

    report = out.getvalue()
    path = os.path.join(os.path.dirname(__file__), "integration_test_report.txt")
    with open(path, "w") as f:
        f.write(report)
    print(report)
    print(f"report written to {path}")
    return 0 if not failures else 1


if __name__ == "__main__":
    sys.exit(main())
