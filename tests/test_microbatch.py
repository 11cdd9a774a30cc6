"""Adaptive micro-batching (query/microbatch.py): concurrent arrivals
fold into batched engine calls; low-load requests run immediately;
results route back to their callers with per-caller k."""
import asyncio
import time

import pytest

from mobius_rag_tpu.query.engine import QueryRequest
from mobius_rag_tpu.query.microbatch import MicroBatcher, make_batcher


class FakeResult:
    def __init__(self, query, hits):
        self.query = query
        self.hits = hits


class FakeEngine:
    """Records batch sizes; sleeps to simulate device time so arrivals
    during execution accumulate."""

    def __init__(self, delay_s=0.03):
        self.batches = []
        self.delay_s = delay_s

    def search(self, reqs, k=10):
        self.batches.append(len(reqs))
        time.sleep(self.delay_s)
        return [FakeResult(r.query, list(range(k))) for r in reqs]


def _run(coro):
    return asyncio.new_event_loop().run_until_complete(coro)


def test_single_request_runs_immediately():
    eng = FakeEngine(delay_s=0.0)
    b = MicroBatcher(eng)

    async def go():
        res = await b.search_one(QueryRequest(query="q0"), 5)
        assert res.query == "q0" and len(res.hits) == 5

    _run(go())
    assert eng.batches == [1]


def test_concurrent_arrivals_batch_up():
    eng = FakeEngine(delay_s=0.05)
    b = MicroBatcher(eng)

    async def go():
        tasks = [asyncio.ensure_future(
            b.search_one(QueryRequest(query=f"q{i}"), 10))
            for i in range(9)]
        # tiny stagger so the first launches alone and the rest queue
        # behind its in-flight batch
        await asyncio.sleep(0.01)
        tasks += [asyncio.ensure_future(
            b.search_one(QueryRequest(query=f"q{9 + i}"), 10))
            for i in range(7)]
        res = await asyncio.gather(*tasks)
        assert [r.query for r in res] == [f"q{i}" for i in range(16)]

    _run(go())
    # first flush takes whatever queued during loop startup; the rest
    # accumulate behind it → far fewer engine calls than queries
    assert sum(eng.batches) >= 16  # padding counts
    assert len(eng.batches) <= 4
    assert b.stats["queries"] == 16
    assert b.stats["max_batch_seen"] >= 7


def test_bucket_padding():
    eng = FakeEngine(delay_s=0.05)
    b = MicroBatcher(eng)

    async def go():
        t1 = asyncio.ensure_future(b.search_one(QueryRequest(query="a"), 10))
        await asyncio.sleep(0.01)
        rest = [asyncio.ensure_future(
            b.search_one(QueryRequest(query=f"b{i}"), 10)) for i in range(5)]
        await asyncio.gather(t1, *rest)

    _run(go())
    # 5 queued requests pad to the 8-bucket (compile-shape reuse)
    assert eng.batches[0] == 1
    assert all(n in (1, 2, 4, 8, 16, 32) for n in eng.batches)


def test_mixed_k_cuts_per_caller():
    eng = FakeEngine(delay_s=0.05)
    b = MicroBatcher(eng)

    async def go():
        t1 = asyncio.ensure_future(b.search_one(QueryRequest(query="x"), 10))
        await asyncio.sleep(0.01)
        t2 = asyncio.ensure_future(b.search_one(QueryRequest(query="k3"), 3))
        t3 = asyncio.ensure_future(b.search_one(QueryRequest(query="k7"), 7))
        r1, r2, r3 = await asyncio.gather(t1, t2, t3)
        assert len(r1.hits) == 10
        assert len(r2.hits) == 3
        assert len(r3.hits) == 7

    _run(go())


def test_engine_error_propagates_to_all_waiters():
    class Boom(FakeEngine):
        def search(self, reqs, k=10):
            raise ValueError("tag_mode bogus")

    b = MicroBatcher(Boom())

    async def go():
        t1 = asyncio.ensure_future(b.search_one(QueryRequest(query="x"), 5))
        t2 = asyncio.ensure_future(b.search_one(QueryRequest(query="y"), 5))
        for t in (t1, t2):
            with pytest.raises(ValueError, match="bogus"):
                await t

    _run(go())
    # batcher recovers: a later request still works
    b.engine = FakeEngine(delay_s=0.0)

    async def again():
        res = await b.search_one(QueryRequest(query="z"), 2)
        assert len(res.hits) == 2

    _run(again())


def test_env_gate(monkeypatch):
    monkeypatch.setenv("MRAG_MICROBATCH", "0")
    assert make_batcher(object()) is None
    monkeypatch.setenv("MRAG_MICROBATCH", "1")
    assert isinstance(make_batcher(object()), MicroBatcher)


def test_real_engine_through_batcher():
    """End-to-end with the real engine on the toy corpus."""
    from mobius_rag_tpu.index.store import ChunkStore
    from mobius_rag_tpu.query.engine import SearchEngine
    from mobius_rag_tpu.testing import hash_embed, sample_lexicon, toy_corpus

    lex = sample_lexicon()
    store = ChunkStore()
    store.add_chunks(toy_corpus(lex, pad_docs=20))
    eng = SearchEngine(store, lex, embed_fn=hash_embed)
    b = MicroBatcher(eng)

    async def go():
        tasks = [asyncio.ensure_future(b.search_one(QueryRequest(
            query="timely filing deadline for sunshine health claims"), 5))
            for _ in range(4)]
        res = await asyncio.gather(*tasks)
        assert all(r.hits for r in res)
        rows = [tuple(h.row for h in r.hits) for r in res]
        assert len(set(rows)) == 1  # identical queries, identical results

    _run(go())


def test_overload_sheds_with_bounded_queue():
    """Beyond max_queue waiting requests the batcher raises
    OverloadedError (the server maps it to 503) instead of queueing
    without bound — and already-queued requests still complete."""
    from mobius_rag_tpu.query.microbatch import OverloadedError

    class SlowEngine:
        def search(self, reqs, k=10):
            import time as _t
            _t.sleep(0.05)
            return [FakeResult(r.query, list(range(k))) for r in reqs]

    b = MicroBatcher(SlowEngine(), max_batch=2, max_queue=3)

    async def go():
        tasks = []
        shed = 0
        for i in range(10):
            try:
                tasks.append(asyncio.ensure_future(
                    b.search_one(QueryRequest(query=f"q{i}"), 5)))
            except OverloadedError:
                shed += 1
            # the coroutine itself raises before awaiting when full
            await asyncio.sleep(0)
        done = await asyncio.gather(*tasks, return_exceptions=True)
        shed += sum(isinstance(r, OverloadedError) for r in done)
        ok = [r for r in done if not isinstance(r, Exception)]
        assert shed > 0, "no request was shed at queue depth 3"
        assert ok, "queued requests must still complete"
        assert b.stats["shed"] == shed

    _run(go())


def test_deep_queue_drains_through_pipelined_path():
    """Queue depth beyond one batch must drain via search_pipelined
    (device/host overlap — the 1M served ceiling fix), with every
    caller's result routed correctly."""
    calls = {"sync": 0, "pipelined": []}

    class Eng:
        def search(self, reqs, k=10):
            calls["sync"] += 1
            return [FakeResult(r.query, list(range(k))) for r in reqs]

        def search_pipelined(self, batches, k=10):
            calls["pipelined"].append([len(b) for b in batches])
            time.sleep(0.01)
            return [[FakeResult(r.query, list(range(k))) for r in b]
                    for b in batches]

    b = MicroBatcher(Eng(), max_batch=4)

    async def go():
        # stuff 12 requests in one tick: first drains solo (queue was
        # empty at first arrival), the backlog drains as pipelined groups
        tasks = [asyncio.ensure_future(
            b.search_one(QueryRequest(query=f"q{i}"), 5))
            for i in range(12)]
        res = await asyncio.gather(*tasks)
        assert [r.query for r in res] == [f"q{i}" for i in range(12)]
        assert all(len(r.hits) == 5 for r in res)
        assert calls["pipelined"], "backlog never used the pipelined path"
        assert b.stats["queries"] == 12

    _run(go())


def test_real_engine_pipelined_drain_matches_sync():
    """Through the real engine: deep-queue (pipelined drain) results
    must equal per-request sync results."""
    from mobius_rag_tpu.index.store import ChunkStore
    from mobius_rag_tpu.query.engine import SearchEngine
    from mobius_rag_tpu.testing import hash_embed, sample_lexicon, toy_corpus

    lex = sample_lexicon()
    store = ChunkStore()
    store.add_chunks(toy_corpus(lex, pad_docs=20))
    eng = SearchEngine(store, lex, embed_fn=hash_embed)
    b = MicroBatcher(eng, max_batch=2)
    queries = [f"timely filing deadline {i % 3}" for i in range(8)]

    async def go():
        tasks = [asyncio.ensure_future(
            b.search_one(QueryRequest(query=q), 5)) for q in queries]
        return await asyncio.gather(*tasks)

    res = _run(go())
    for q, r in zip(queries, res):
        want = eng.search(QueryRequest(query=q), k=5)[0]
        assert [h.row for h in r.hits] == [h.row for h in want.hits], q
