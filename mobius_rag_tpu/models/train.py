"""Contrastive training of the encoder on (query, chunk) pairs, sharded
over a ("dp", "tp") mesh.

The reference has no trainer (it rents embeddings from APIs); this is
the framework's native replacement for "improve retrieval quality":
fine-tune the encoder on in-domain pairs mined from the corpus (e.g.
query-bank fingerprints, Path-A fact ↔ chunk pairs). Symmetric InfoNCE
with in-batch negatives.

Sharding: params follow models.encoder.param_specs (megatron TP over the
``tp`` axis), the batch shards over ``dp``. Everything is a plain jit
with NamedSharding constraints — XLA inserts the all-reduces (psum over
tp for activations, gradient all-reduce over dp).
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from mobius_rag_tpu.models.encoder import EncoderConfig, encode, init_params, param_specs


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    learning_rate: float = 1e-4
    weight_decay: float = 0.01
    temperature: float = 20.0  # logit scale (1 / 0.05)
    grad_clip: float = 1.0


def make_optimizer(tc: TrainConfig):
    return optax.chain(
        optax.clip_by_global_norm(tc.grad_clip),
        optax.adamw(tc.learning_rate, weight_decay=tc.weight_decay),
    )


def contrastive_loss(params, q_tokens, d_tokens, cfg: EncoderConfig, temperature: float):
    """Symmetric InfoNCE over in-batch negatives."""
    qe = encode(params, q_tokens, cfg)  # [B, D] normalized
    de = encode(params, d_tokens, cfg)
    logits = (qe @ de.T) * temperature  # [B, B]
    labels = jnp.arange(logits.shape[0])
    loss_qd = optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()
    loss_dq = optax.softmax_cross_entropy_with_integer_labels(logits.T, labels).mean()
    acc = (jnp.argmax(logits, axis=1) == labels).mean()
    return 0.5 * (loss_qd + loss_dq), acc


def make_train_step(cfg: EncoderConfig, tc: TrainConfig, mesh: Mesh):
    """Returns (train_step, shard_params, shard_batch, init_opt_state)."""
    opt = make_optimizer(tc)
    specs = param_specs(cfg)
    p_shard = jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec), specs,
        is_leaf=lambda x: isinstance(x, P),
    )
    batch_shard = NamedSharding(mesh, P("dp", None))
    repl = NamedSharding(mesh, P())

    def shard_params(params):
        return jax.tree_util.tree_map(jax.device_put, params, p_shard)

    def shard_batch(tokens):
        return jax.device_put(tokens, batch_shard)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, q_tokens, d_tokens):
        (loss, acc), grads = jax.value_and_grad(
            lambda p: contrastive_loss(p, q_tokens, d_tokens, cfg, tc.temperature),
            has_aux=True,
        )(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        # keep params on their TP sharding after the update
        params = jax.lax.with_sharding_constraint(params, p_shard)
        return params, opt_state, {"loss": loss, "accuracy": acc}

    def init_opt_state(params):
        return opt.init(params)

    return train_step, shard_params, shard_batch, init_opt_state


def train_encoder_on_corpus(
    store,
    *,
    cfg: EncoderConfig | None = None,
    params: dict | None = None,
    steps: int = 100,
    batch: int = 32,
    mesh: Mesh | None = None,
    tc: TrainConfig | None = None,
    seed: int = 0,
    log_every: int = 10,
    lexicon=None,
    augment: float = 0.0,
):
    """Fine-tune the encoder on ICT pairs mined from a ChunkStore.
    Returns (params, history). The end-to-end 'improve retrieval on MY
    corpus' loop: mine → train (dp×tp) → re-embed via the workers.

    ``augment`` > 0 adds that multiple of paraphrase-augmented pairs
    (lexicon alias swaps + colloquial synonym swaps + word dropout,
    models/data.py augment_pairs) so the encoder learns surface-form
    variation ICT alone cannot teach — the round-4 trained checkpoint
    lost to the hash baseline on lexicon-free paraphrases exactly for
    this reason (EVAL_r4 encoder_real_text)."""
    from mobius_rag_tpu.models.data import mine_ict_pairs
    from mobius_rag_tpu.models.encoder import init_params
    from mobius_rag_tpu.models.tokenizer import HashTokenizer
    from mobius_rag_tpu.parallel.mesh import make_train_mesh

    cfg = cfg or EncoderConfig.from_env()
    if mesh is None:
        n = len(jax.devices())
        tp = 2 if n % 2 == 0 and n > 1 else 1
        mesh = make_train_mesh(dp=n // tp, tp=tp)
    tc = tc or TrainConfig()
    tokenizer = HashTokenizer(cfg.vocab_size, cfg.max_seq)
    pairs = mine_ict_pairs(store, max_pairs=steps * batch * 2, seed=seed)
    if len(pairs) < batch:
        raise ValueError(f"corpus too small to mine {batch}-pair batches "
                         f"({len(pairs)} pairs)")
    if augment > 0:
        from mobius_rag_tpu.models.data import augment_pairs

        pairs = augment_pairs(pairs, lexicon=lexicon, factor=augment,
                              seed=seed)

    step_fn, shard_params, shard_batch, init_opt = make_train_step(cfg, tc, mesh)
    params = shard_params(params if params is not None
                          else init_params(cfg, jax.random.PRNGKey(seed)))
    opt_state = init_opt(params)
    history = []
    from mobius_rag_tpu.models.data import pretokenized_batches

    for done, (qs, ds) in enumerate(
            pretokenized_batches(pairs, tokenizer, batch, steps=steps,
                                 seed=seed), start=1):
        params, opt_state, metrics = step_fn(
            params, opt_state, shard_batch(jnp.asarray(qs)),
            shard_batch(jnp.asarray(ds)))
        if done % log_every == 0 or done == steps:
            m = jax.device_get(metrics)
            history.append({"step": done,
                            **{k: float(v) for k, v in m.items()}})
    return params, history


def train_demo(num_steps: int = 3, mesh: Mesh | None = None,
               cfg: EncoderConfig | None = None, batch: int = 16, seed: int = 0):
    """Tiny smoke-train used by tests and the multichip dryrun: random
    token pairs, asserts the loss moves. Returns the metrics history."""
    from mobius_rag_tpu.parallel.mesh import make_train_mesh

    cfg = cfg or EncoderConfig.tiny()
    if mesh is None:
        n = len(jax.devices())
        tp = 2 if n % 2 == 0 and n > 1 else 1
        mesh = make_train_mesh(dp=n // tp, tp=tp)
    tc = TrainConfig()
    step, shard_params, shard_batch, init_opt = make_train_step(cfg, tc, mesh)

    key = jax.random.PRNGKey(seed)
    params = shard_params(init_params(cfg, key))
    opt_state = init_opt(params)
    kq, kd = jax.random.split(jax.random.PRNGKey(seed + 1))
    # paired q/d share a prefix so the task is learnable
    base = jax.random.randint(kq, (batch, cfg.max_seq), 2, cfg.vocab_size)
    noise = jax.random.randint(kd, (batch, cfg.max_seq), 2, cfg.vocab_size)
    q_tokens = shard_batch(base)
    d_tokens = shard_batch(jnp.where(jnp.arange(cfg.max_seq)[None, :] < cfg.max_seq // 2,
                                     base, noise))
    history = []
    for _ in range(num_steps):
        params, opt_state, metrics = step(params, opt_state, q_tokens, d_tokens)
        history.append(jax.device_get(metrics))
    return history
