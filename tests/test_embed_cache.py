"""Query-embedding LRU cache (corpus_search.py:434 parity)."""
import numpy as np

from mobius_rag_tpu.index.store import ChunkStore
from mobius_rag_tpu.query.engine import QueryRequest, SearchEngine
from mobius_rag_tpu.testing import hash_embed, sample_lexicon, toy_corpus


class CountingEmbed:
    def __init__(self):
        self.calls = 0
        self.texts = 0

    def __call__(self, texts):
        self.calls += 1
        self.texts += len(texts)
        return hash_embed(texts)


def test_embed_cache_hits_and_lru():
    lex = sample_lexicon()
    store = ChunkStore()
    store.add_chunks(toy_corpus(lex))
    embed = CountingEmbed()
    engine = SearchEngine(store, lex, embed_fn=embed)

    r1 = engine.search(QueryRequest(query="timely filing deadline"), k=3)[0]
    assert embed.texts == 1
    # same query (case/space-insensitive) → cache hit, no re-encode
    r2 = engine.search(QueryRequest(query="  Timely Filing Deadline "), k=3)[0]
    assert embed.texts == 1
    assert [h.chunk_id for h in r1.hits] == [h.chunk_id for h in r2.hits]

    # new query encodes; provided embeddings never touch the cache
    engine.search(QueryRequest(query="prior authorization"), k=3)
    assert embed.texts == 2
    engine.search(QueryRequest(query="anything", embedding=hash_embed(["x"])[0]), k=3)
    assert embed.texts == 2

    # LRU eviction is bounded
    engine._embed_cache_max = 4
    for i in range(10):
        engine.search(QueryRequest(query=f"unique query number {i}"), k=1)
    assert len(engine._embed_cache) <= 4
