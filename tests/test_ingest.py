"""Ingest pipeline tests: extraction, chunking (incl. code-list gluing),
paths A/B, queue semantics (claims, leases, zombies, idempotency), and
the end-to-end upload → chunk → embed → publish → query slice."""
import json
import time

import numpy as np
import pytest

from mobius_rag_tpu.index.store import ChunkStore
from mobius_rag_tpu.ingest.chunking import (chunk_pages, is_code_list_fragment,
                                            page_to_markdown,
                                            split_paragraphs_from_markdown)
from mobius_rag_tpu.ingest.extract import extract_text_from_bytes
from mobius_rag_tpu.ingest.metadata import canonicalize_metadata
from mobius_rag_tpu.ingest.paths import (aggregate_document_tags, find_fact_span,
                                         run_path_a, run_path_b)
from mobius_rag_tpu.ingest.pipeline import IngestPipeline
from mobius_rag_tpu.ingest.queue import JobQueue
from mobius_rag_tpu.query.engine import QueryRequest, SearchEngine
from mobius_rag_tpu.testing import hash_embed, sample_lexicon

# ---------------------------------------------------------------------------
# extraction
# ---------------------------------------------------------------------------


def test_extract_txt_pages():
    doc = extract_text_from_bytes(b"page one text\fpage two text", "doc.txt")
    assert [p.number for p in doc.pages] == [1, 2]
    assert doc.pages[1].text == "page two text"


def test_extract_html_sections():
    html = b"""<html><body>
    <h1>Provider Manual</h1><p>Intro paragraph.</p>
    <h2>Timely Filing</h2><p>Claims are due within 180 days.</p>
    <script>ignore()</script>
    </body></html>"""
    doc = extract_text_from_bytes(html, "manual.html")
    assert doc.kind == "html"
    assert len(doc.pages) == 2
    # heading-chain section path (html_extractor.py section shaping)
    assert doc.pages[1].section == "Provider Manual > Timely Filing"
    assert "180 days" in doc.pages[1].text
    assert "ignore()" not in doc.pages[0].text + doc.pages[1].text


def test_extract_pdf_unparseable_reports_errors():
    # garbage PDF bytes: the builtin extractor reports per-page/empty
    # errors instead of raising (no PyMuPDF gate anymore)
    doc = extract_text_from_bytes(b"%PDF-1.4 fake", "doc.pdf")
    assert doc.kind == "pdf"
    assert not any(p.text for p in doc.pages)


# ---------------------------------------------------------------------------
# chunking
# ---------------------------------------------------------------------------


def test_page_to_markdown_headers():
    md = page_to_markdown("TIMELY FILING\nClaims must be filed timely.\n\n"
                          "Provider Enrollment\nmore text here.")
    assert "# TIMELY FILING" in md
    assert "## Provider Enrollment" in md


def test_split_paragraphs_section_paths():
    md = "# Claims\n\nFirst paragraph text.\n\n## Appeals\n\nSecond paragraph."
    paras = split_paragraphs_from_markdown(md)
    assert len(paras) == 2
    assert paras[0].section_path == "Claims"
    assert paras[1].section_path == "Claims / Appeals"
    assert paras[1].paragraph_index == 1


def test_code_list_fragment_detection():
    assert is_code_list_fragment("and G0659.")
    assert is_code_list_fragment("(Genemarkers): 81418")
    assert is_code_list_fragment("Added HCPCS code [Q5129].  04.17.23")
    assert not is_code_list_fragment("Deny CON #10715.")  # uppercase start
    assert not is_code_list_fragment("This is a long paragraph that happens to "
                                     "mention G0659 but is not a fragment.")


def test_code_fragments_glued():
    md = ("# Lab Codes\n\nCovered genetic tests include 81410, 81415,\n\n"
          "and G0659.\n\nSeparate paragraph about something else entirely.")
    paras = split_paragraphs_from_markdown(md)
    assert len(paras) == 2
    assert "G0659" in paras[0].text
    assert paras[0].text.startswith("Covered genetic")


def test_chunk_pages_multi_page():
    paras = chunk_pages([(1, "INTRO\nfirst page para."), (2, "second page para.")])
    assert [p.page for p in paras] == [1, 2]
    assert paras[1].paragraph_index == 1


# ---------------------------------------------------------------------------
# paths
# ---------------------------------------------------------------------------


class FakeLLM:
    """Scripted extraction/critique client (SURVEY §4 tier-2 style)."""

    def __init__(self, first_score=0.4):
        self.calls = []
        self.first_score = first_score
        self._critiques = 0

    def generate(self, prompt, *, system="", max_tokens=1024, temperature=0.0,
                 stage=""):
        self.calls.append(stage)
        if stage in ("extraction", "extraction_retry"):
            return json.dumps([{"text": "PA is required for H0019",
                                "category": "authorization"}])
        if stage == "critique":
            self._critiques += 1
            return str(self.first_score if self._critiques == 1 else 0.9)
        return ""


def test_path_a_retry_below_threshold():
    llm = FakeLLM(first_score=0.4)
    facts = run_path_a("Prior authorization is required for H0019.", llm)
    assert facts and facts[0].retried
    assert facts[0].critique_score == 0.9
    assert "extraction_retry" in llm.calls


def test_path_a_no_retry_above_threshold():
    llm = FakeLLM(first_score=0.95)
    facts = run_path_a("Prior authorization is required for H0019.", llm)
    assert facts and not facts[0].retried
    assert "extraction_retry" not in llm.calls


def test_find_fact_span():
    para = "Prior  authorization\nis required for H0019."
    span = find_fact_span("prior authorization is required", para)
    assert span is not None and span[0] == 0
    assert find_fact_span("totally absent", para) is None


def test_path_b_lines_and_tags():
    lex = sample_lexicon()
    r = run_path_b("Prior authorization is required for DME over $500; "
                   "submit via the portal. Sunshine Health reviews within 14 days.",
                   lex)
    assert len(r.lines) >= 2
    assert r.paragraph_tags["d"], "expected domain tags (prior auth / dme)"
    assert r.paragraph_tags["j"], "expected payor tag (sunshine)"
    # candidates mined but lexicon-known phrases excluded
    assert all(c["phrase"] not in lex.phrase_ids for c in r.candidates)


def test_aggregate_document_tags_threshold():
    per_para = [{"j": [1], "d": [2]}, {"j": [1], "d": [3]}, {"j": [1], "d": [2]}]
    doc = aggregate_document_tags(per_para)
    assert doc["j"] == [1]
    assert doc["d"] == [2]  # d=3 appears once → dropped


def test_metadata_canonicalization():
    m = canonicalize_metadata(payer="Sunshine Health Florida", state="florida",
                              program="MMA")
    assert m == {"payer": "sunshine_health", "state": "FL", "program": "medicaid"}


# ---------------------------------------------------------------------------
# queue
# ---------------------------------------------------------------------------


def test_queue_claim_complete(tmp_path):
    q = JobQueue(str(tmp_path / "q.sqlite"))
    jid = q.enqueue("chunking", {"doc_id": "d1"}, dedupe_key="d1")
    assert q.enqueue("chunking", {"doc_id": "d1"}, dedupe_key="d1") is None  # idempotent
    job = q.claim("chunking", "w1")
    assert job.job_id == jid and job.attempts == 1
    assert q.claim("chunking", "w2") is None  # leased
    q.complete(jid, {"ok": True})
    assert q.job(jid)["status"] == "done"
    stages = [e["stage"] for e in q.events(jid)]
    assert stages == ["enqueued", "claimed", "done"]


def test_queue_zombie_recovery(tmp_path):
    q = JobQueue(str(tmp_path / "q.sqlite"), lease_seconds=0.05)
    q.enqueue("chunking", {"doc_id": "d1"})
    j1 = q.claim("chunking", "w1")
    time.sleep(0.1)  # lease expires → zombie
    j2 = q.claim("chunking", "w2")
    assert j2 is not None and j2.job_id == j1.job_id and j2.attempts == 2


def test_queue_retry_ladder_then_park(tmp_path):
    q = JobQueue(str(tmp_path / "q.sqlite"))
    jid = q.enqueue("chunking", {"doc_id": "d1"}, max_attempts=2)
    for expected in ("queued", "failed"):
        job = q.claim("chunking", "w1")
        q.fail(job.job_id, "boom")
        assert q.job(jid)["status"] == expected
    assert q.claim("chunking", "w1") is None
    assert q.depths()["chunking"]["failed"] == 1


# ---------------------------------------------------------------------------
# end-to-end slice
# ---------------------------------------------------------------------------

_MANUAL = b"""SUNSHINE HEALTH PROVIDER MANUAL

TIMELY FILING
Participating providers must submit initial claims within 180 days
from the date of service. Non-participating providers have 365 days.

PRIOR AUTHORIZATION
Residential substance use treatment under H0019 requires prior
authorization from Sunshine Health. Durable medical equipment over
$500 also requires prior authorization.
"""


def test_chunking_resume_skips_done_paragraphs(tmp_path):
    """A chunking job that dies mid-document resumes from its persisted
    partials instead of re-running Path A (coordinator.py:235-239)."""
    from mobius_rag_tpu.ingest.worker import ChunkingWorker, DocumentBlob, DocumentStore

    class FlakyLLM(FakeLLM):
        def __init__(self):
            super().__init__(first_score=0.9)
            self.extractions = 0

        def generate(self, prompt, **kw):
            if kw.get("stage") == "extraction":
                self.extractions += 1
                if self.extractions == 3:  # die during the 3rd paragraph
                    raise TimeoutError("llm connection timeout")
            return super().generate(prompt, **kw)

    q = JobQueue(str(tmp_path / "q.sqlite"))
    docs = DocumentStore()
    doc = b"P1 first paragraph text here.\n\nP2 second paragraph text.\n\nP3 third paragraph text.\n\nP4 fourth paragraph text."
    docs.put(DocumentBlob(doc_id="d1", filename="d1.txt", data=doc))
    llm = FlakyLLM()
    worker = ChunkingWorker(q, docs, sample_lexicon(), llm=llm,
                            extraction_enabled=True)
    jid = q.enqueue("chunking", {"doc_id": "d1"})
    # run_loop counts only successes: attempt 1 dies at paragraph 3, the
    # retry ladder requeues, the loop re-claims and RESUMES, then succeeds
    worker.run_loop(max_jobs=1)
    assert q.job(jid)["status"] == "done"
    events = [e["stage"] for e in q.events(jid)]
    assert "requeued" in events and "resumed" in events
    # 4 paragraphs: p1, p2, p3(raise) on attempt 1; resume re-runs ONLY
    # p3 + p4 → 5 extraction calls total (7 would mean no resume)
    assert llm.extractions == 5, llm.extractions
    assert q.partials(jid) == {}  # cleaned after success


def test_upload_to_query_end_to_end(tmp_path):
    lex = sample_lexicon()
    store = ChunkStore()
    pipe = IngestPipeline(store, lex, hash_embed,
                          queue=JobQueue(str(tmp_path / "q.sqlite")))
    up = pipe.upload(_MANUAL, "sunshine_manual.txt", payer="Sunshine Health",
                     state="Florida", program="medicaid", authority_level=4)
    assert not up.deduped
    assert up.instant  # small doc → instant pipeline ran
    assert store.size >= 2

    # re-upload dedupes on sha
    again = pipe.upload(_MANUAL, "sunshine_manual.txt")
    assert again.deduped and again.doc_id == up.doc_id

    # published chunks are queryable with payer filter + tags
    engine = SearchEngine(store, lex, embed_fn=hash_embed)
    res = engine.search(QueryRequest(
        query="timely filing deadline for sunshine health claims",
        payer="sunshine_health"), k=3)[0]
    assert res.hits and "180 days" in res.hits[0].text
    assert res.hits[0].metadata["payer"] == "sunshine_health"

    # incremental resume: re-enqueue the same doc → no duplicate rows
    size_before = store.size
    pipe.queue.enqueue("embedding", {
        "doc_id": up.doc_id,
        "units": [  # same source ids
            {"source_id": f"{up.doc_id}-p{i}", "kind": "paragraph",
             "text": "ignored", "j_tags": [], "d_tags": [], "p_tags": []}
            for i in range(store.size)
        ],
        "meta": {}}, dedupe_key="resume-test")
    pipe.embedding_worker.run_loop(max_jobs=1)
    assert store.size == size_before


def test_pdf_builtin_roundtrip():
    """The built-in PDF extractor reads back what our own PDF writer
    emits (FlateDecode streams + Tj operators) — the PDF path runs with
    no native deps in this image."""
    from mobius_rag_tpu.export_pdf import markdown_to_pdf
    from mobius_rag_tpu.ingest.extract import extract_text_from_bytes

    md = ("# Timely Filing\n\nParticipating providers must submit initial "
          "claims within 180 days from the date of service.\n\n"
          "## Disputes\n\nReconsiderations are due within 90 days of the EOP.")
    pdf = markdown_to_pdf(md, title="Test Manual")
    doc = extract_text_from_bytes(pdf, "manual.pdf")
    assert doc.kind == "pdf"
    all_text = " ".join("\n".join(p.text for p in doc.pages).split())
    assert "180 days from the date of service" in all_text
    assert "90 days of the EOP" in all_text


def test_pdf_builtin_through_pipeline(tmp_path):
    """A PDF upload flows end-to-end: extract → chunk → Path-B → embed →
    publish → searchable."""
    from mobius_rag_tpu.export_pdf import markdown_to_pdf
    from mobius_rag_tpu.index.store import ChunkStore
    from mobius_rag_tpu.ingest.pipeline import IngestPipeline
    from mobius_rag_tpu.ingest.queue import JobQueue
    from mobius_rag_tpu.query.engine import QueryRequest, SearchEngine
    from mobius_rag_tpu.testing import hash_embed, sample_lexicon

    lex = sample_lexicon()
    store = ChunkStore()
    pipeline = IngestPipeline(store, lex, hash_embed,
                              queue=JobQueue(str(tmp_path / "jobs.sqlite")))
    pdf = markdown_to_pdf(
        "# Zebra Plan Filing\n\nZebra Plan timely filing deadline is 222 "
        "days from the date of service for participating providers.")
    res = pipeline.upload(pdf, "Zebra Plan Manual.pdf", payer="zebra")
    assert store.size > 0, res
    eng = SearchEngine(store, lex, embed_fn=hash_embed)
    out = eng.search(QueryRequest(query="zebra plan timely filing deadline"),
                     k=3)[0]
    assert out.hits and "222" in out.hits[0].text


def test_html_heading_chain_sections():
    from mobius_rag_tpu.ingest.extract import extract_text_from_bytes

    html = b"""<html><body>
    <h1>Claims</h1><p>Intro text about claims.</p>
    <h2>Timely Filing</h2><p>180 days window.</p>
    <h3>Exceptions</h3><p>COB claims differ.</p>
    <h2>Appeals</h2><p>90 day appeals window.</p>
    </body></html>"""
    doc = extract_text_from_bytes(html, "manual.html")
    sections = [p.section for p in doc.pages]
    assert "Claims" in sections[0]
    assert "Claims > Timely Filing" in sections
    assert "Claims > Timely Filing > Exceptions" in sections
    assert "Claims > Appeals" in sections  # h3 popped when h2 changed
