"""Rebuild the trained encoder checkpoint (fresh-VM recovery).

Same recipe as scripts/quality_loop.py step 6: fixture stack + 1200
distractor docs, 200 ICT steps at batch 64 on the real chip, saved to
~/.mobius_rag_tpu/encoder_r2 (the path scripts/ann_recall_curve.py
expects). See .claude/skills/verify 'Fresh-VM recovery'.

Usage: PYTHONPATH="$PYTHONPATH:/root/repo" python scripts/train_encoder.py \
           [--steps 200] [--batch 64] [--distractors 1200] [--out PATH]
"""
import argparse
import os
import sys
import time


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--distractors", type=int, default=1200)
    ap.add_argument("--out", default=os.path.expanduser(
        "~/.mobius_rag_tpu/encoder_r2"))
    args = ap.parse_args()

    import jax

    from mobius_rag_tpu.config import get_config
    from mobius_rag_tpu.eval_harness.fixture_corpus import (
        build_fixture_stack, distractor_corpus)
    from mobius_rag_tpu.models.checkpoint import save_encoder
    from mobius_rag_tpu.models.encoder import EncoderConfig
    from mobius_rag_tpu.models.train import train_encoder_on_corpus
    from mobius_rag_tpu.parallel.mesh import make_train_mesh

    cfg = get_config()
    log(f"backend={jax.default_backend()} {jax.devices()}")
    agent, engine, store, pipeline, info = build_fixture_stack()
    lexicon = engine.lexicon
    log(f"fixture stack: {store.size} chunks")
    recs = distractor_corpus(args.distractors, lexicon, cfg)
    store.add_chunks(recs)
    log(f"with distractors: {store.size} chunks")

    enc_cfg = EncoderConfig(
        vocab_size=16384, num_layers=4, num_heads=8, model_dim=512,
        mlp_dim=2048, max_seq=128, out_dim=cfg.embed_dim)
    mesh = make_train_mesh(dp=1, tp=1)
    t0 = time.perf_counter()
    params, history = train_encoder_on_corpus(
        store, cfg=enc_cfg, steps=args.steps, batch=args.batch, mesh=mesh)
    log(f"train done in {time.perf_counter() - t0:.0f}s: {history[-1]}")
    save_encoder(args.out, jax.device_get(params), enc_cfg)
    log(f"saved to {args.out}")


if __name__ == "__main__":
    main()
