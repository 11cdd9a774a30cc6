"""Device lexical arm vs the exact host BM25 oracle: hashing + the fixed
reference length must not meaningfully reorder top results."""
import numpy as np
import pytest

from mobius_rag_tpu.eval_harness.lexical_oracle import BM25Oracle
from mobius_rag_tpu.index.store import ChunkStore
from mobius_rag_tpu.query.engine import QueryRequest, SearchEngine
from mobius_rag_tpu.testing import hash_embed, sample_lexicon, toy_corpus


@pytest.fixture(scope="module")
def setup():
    lex = sample_lexicon()
    store = ChunkStore()
    store.add_chunks(toy_corpus(lex, pad_docs=40))
    return store, lex, SearchEngine(store, lex, embed_fn=hash_embed), BM25Oracle(store)


QUERIES = [
    "timely filing deadline for claims",
    "prior authorization for durable medical equipment",
    "payer id for electronic claims clearinghouse",
    "eligibility verification provider portal",
]


def test_lexical_arm_overlaps_exact_bm25(setup):
    store, lex, engine, oracle = setup
    overlaps = []
    for q in QUERIES:
        exp = lex.expand(q)
        want = {row for row, _ in oracle.search(q, exp.expansion_phrases, k=5)}
        res = engine.search(QueryRequest(query=q, tag_mode="none"), k=5)[0]
        got = {h["row"] for h in res.telemetry["arms"]["lexical"][:5]}
        if want:
            overlaps.append(len(want & got) / len(want))
    assert overlaps, "oracle returned nothing for any query"
    assert np.mean(overlaps) >= 0.7, overlaps


def test_oracle_idf_monotone(setup):
    _, _, _, oracle = setup
    # a term in every doc scores lower idf than a rare one
    rare = oracle.idf("zzznever")
    common_term = max(oracle.df, key=oracle.df.get)
    assert oracle.idf(common_term) < rare
