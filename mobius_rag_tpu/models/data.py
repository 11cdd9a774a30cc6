"""Training-pair mining from the published corpus.

The encoder fine-tunes on in-domain (query, chunk) pairs without any
labeling: the Inverse Cloze Task (ICT) — a sentence sampled from a
paragraph is the pseudo-query, the paragraph (with or without that
sentence) is the positive — plus section-title → paragraph pairs. This
is the native replacement for 'better embeddings' where the reference
could only swap API models."""
from __future__ import annotations

import re

import numpy as np

from mobius_rag_tpu.index.store import ChunkStore

_SENT_RE = re.compile(r"(?<=[.!?;])\s+")


def mine_ict_pairs(store: ChunkStore, *, max_pairs: int = 10000,
                   seed: int = 0, drop_sentence: bool = True
                   ) -> list[tuple[str, str]]:
    rng = np.random.default_rng(seed)
    pairs: list[tuple[str, str]] = []
    for rec in store.records:
        if rec is None or len(rec.text) < 80:
            continue
        sents = [s.strip() for s in _SENT_RE.split(rec.text) if len(s.strip()) > 20]
        if not sents:
            continue
        i = int(rng.integers(0, len(sents)))
        query = sents[i]
        if drop_sentence and len(sents) > 1:
            doc = " ".join(sents[:i] + sents[i + 1:])
        else:
            doc = rec.text
        pairs.append((query, doc))
        if rec.section_path:
            pairs.append((f"{rec.payer} {rec.section_path}".strip(), rec.text))
        if len(pairs) >= max_pairs:
            break
    return pairs[:max_pairs]


def batches(pairs: list[tuple[str, str]], tokenizer, batch_size: int,
            *, seed: int = 0):
    """Shuffled (q_tokens, d_tokens) batches, dropping the ragged tail
    (static shapes under jit)."""
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(pairs))
    for off in range(0, len(pairs) - batch_size + 1, batch_size):
        idx = order[off:off + batch_size]
        qs = tokenizer.encode_batch([pairs[i][0] for i in idx])
        ds = tokenizer.encode_batch([pairs[i][1] for i in idx])
        yield qs, ds
