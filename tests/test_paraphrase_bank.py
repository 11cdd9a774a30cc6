"""The paraphrase bank's construction contract (VERDICT r4 item 5):
queries must share NO lexicon phrase with the corpus — the lexical/tag
arms get nothing, so these queries isolate the vector arm — and every
must_fact must exist in the fixture corpus so recall misses are
retrieval failures, not authoring bugs."""
import os

import pytest
import yaml

from mobius_rag_tpu.eval_harness.bank import load_bank
from mobius_rag_tpu.query.lexicon import Lexicon

_DATA = os.path.join(os.path.dirname(__file__), "..", "mobius_rag_tpu", "data")


@pytest.fixture(scope="module")
def full_lexicon():
    return Lexicon.from_yaml(os.path.join(_DATA, "lexicon_full.yaml"))


@pytest.fixture(scope="module")
def bank():
    return load_bank("cmhc_paraphrase")


def test_queries_trigger_no_selective_lexicon_expansion(full_lexicon, bank):
    """Geography/program j-tags (j:state.*, j:program.*) are allowed —
    they match dozens of documents each (selectivity ~0) and a Texas
    question can hardly avoid saying Texas. Payer tags and d/p TOPIC
    phrases — the selective signals the lexical/tag arms actually rank
    by — must not fire."""
    assert len(bank.queries) >= 40
    allowed = ("j:state.", "j:program.")
    offenders = {}
    for q in bank.queries:
        exp = full_lexicon.expand(q.query)
        bad = [c for c in exp.matched_codes
               if not c.startswith(allowed)]
        if bad:
            offenders[q.id] = bad
    assert not offenders, f"paraphrase queries hit lexicon phrases: {offenders}"


def test_must_facts_exist_in_corpus(bank):
    corpus_dir = os.path.join(_DATA, "corpus_cmhc")
    text = ""
    for fn in os.listdir(corpus_dir):
        if fn.endswith(".md"):
            with open(os.path.join(corpus_dir, fn)) as f:
                text += f.read().lower() + "\n"
    import re

    def toks(s):
        return [t for t in re.findall(r"[a-z0-9*]+", s.lower())]

    missing = []
    for q in bank.queries:
        for fact in q.must_facts:
            # every distinctive token of the fact appears in the corpus
            # (numbers + rare words; common glue words skipped)
            need = [t for t in toks(fact)
                    if t.isdigit() or len(t) >= 5 or "*" in t]
            if not all(t in text for t in need):
                missing.append((q.id, fact,
                                [t for t in need if t not in text]))
    assert not missing, missing


def test_golden_citations_resolve(bank):
    corpus_dir = os.path.join(_DATA, "corpus_cmhc")
    files = set(os.listdir(corpus_dir))
    for q in bank.queries:
        doc = (q.expected.get("golden_citation") or {}).get("document")
        if doc is None and q.expected.get("expected_contour"):
            continue  # gate-contour probes have no target document
        assert doc in files, f"{q.id}: {doc} not in fixture corpus"
