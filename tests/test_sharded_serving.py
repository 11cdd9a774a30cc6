"""Full-stack sharded serving: the agent runs wholesale over a sharded
engine (compiled stage on the 8-device mesh) and answers match the
single-chip stack."""
import pytest

from mobius_rag_tpu.index.store import ChunkStore
from mobius_rag_tpu.parallel.mesh import make_mesh
from mobius_rag_tpu.parallel.sharded import ShardedEngine
from mobius_rag_tpu.query.agent import AgentRequest, CorpusSearchAgent
from mobius_rag_tpu.query.engine import QueryRequest, SearchEngine
from mobius_rag_tpu.testing import hash_embed, sample_lexicon, toy_corpus


@pytest.fixture(scope="module")
def stacks():
    lex = sample_lexicon()
    store = ChunkStore()
    store.add_chunks(toy_corpus(lex, pad_docs=100))
    mono = SearchEngine(store, lex, embed_fn=hash_embed)
    sharded = SearchEngine(store, lex, embed_fn=hash_embed,
                           sharded=ShardedEngine(store, mesh=make_mesh(8)))
    return (CorpusSearchAgent(mono), CorpusSearchAgent(sharded))


def test_agent_over_sharded_engine_matches_single(stacks):
    mono_agent, sharded_agent = stacks
    queries = [
        "What is the timely filing deadline for Sunshine Health FL Medicaid claims?",
        "Does Sunshine Health require prior authorization for H0019?",
        "molina eligibility verification",
    ]
    for q in queries:
        a = mono_agent.run(AgentRequest(query=q))
        b = sharded_agent.run(AgentRequest(query=q))
        assert [h.chunk_id for h in a.chunks] == [h.chunk_id for h in b.chunks], q
        assert a.confidence_label == b.confidence_label
        assert a.strategy_chain == b.strategy_chain


def test_sharded_engine_neighbors_and_floor(stacks):
    _, sharded_agent = stacks
    res = sharded_agent.engine.search(QueryRequest(
        query="timely filing deadline for sunshine health claims"), k=1)[0]
    assert res.hits and res.hits[0].neighbors
    # sharded telemetry marks arm traces as unavailable, not wrong
    assert res.telemetry["arms"]["vector"] == []
    assert res.telemetry["strict_count"] == -1
