"""Train-step tests: loss decreases on a repeated batch, only the trainable
subset updates, accumulation defers updates, and the pjit step runs on the
8-device mesh with TP-sharded frozen weights."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import optax

from blim_tpu.core.config import tiny_model_config
from blim_tpu.core.mesh import make_mesh
from blim_tpu.data.collate import collate_train_batch
from blim_tpu.data.prompts import make_tvg_layout, make_vtg_layout
from blim_tpu.engine import train as train_lib
from blim_tpu.models import videochat_flash as vcf

B, NVID = 4, 4


@pytest.fixture(scope="module")
def setup(tokenizer):
    cfg = tiny_model_config(vocab_size=152064, num_clips=4)
    params = vcf.init_params(cfg, jax.random.key(0))
    vtg_l = make_vtg_layout(tokenizer, "MSRVTT", cfg.video_tokens_vtg, max_caption_tokens=32)
    tvg_l = make_tvg_layout(tokenizer, cfg.num_clips, max_caption_tokens=32)
    feats = np.asarray(
        jax.random.normal(jax.random.key(1), (NVID, cfg.num_clips, cfg.tokens_per_clip, cfg.mm_hidden_size))
    ).astype(np.float32) * 0.5
    captions = ["a cat sits", "a man runs", "kids play ball", "a chef cooks"]
    batch = collate_train_batch(
        captions, feats, np.arange(B), tokenizer, "MSRVTT", vtg_l, tvg_l
    )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    vocab = jnp.asarray(vcf.make_video_vocab(feats))
    return cfg, params, vtg_l, tvg_l, batch, vocab


def _make(setup, accum=1, mesh=None):
    cfg, params, vtg_l, tvg_l, batch, vocab = setup
    tcfg = train_lib.TrainConfig(lr=1e-2, warmup_epochs=0.0, epochs=5, accum_iter=accum,
                                 weight_decay=0.0)
    tx = train_lib.make_optimizer(tcfg, steps_per_epoch=10)
    trainable = train_lib.init_trainable(
        jax.random.key(2), cfg, tcfg, visual_head=jnp.zeros((cfg.llm.hidden_size, cfg.mm_hidden_size)) + 0.02
    )
    state = train_lib.TrainState(jnp.asarray(0), trainable, tx.init(trainable))
    step = train_lib.make_train_step(cfg, tcfg, tx, vtg_l, tvg_l, mesh=mesh)
    return state, step, params, batch, vocab


def test_loss_decreases_on_repeated_batch(setup):
    state, step, params, batch, vocab = _make(setup)
    rng = jax.random.key(3)
    losses = []
    for i in range(8):
        state, metrics = step(state, params, batch, vocab, jax.random.fold_in(rng, i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses
    assert np.isfinite(losses).all()


def test_accumulation_defers_updates(setup):
    state, step, params, batch, vocab = _make(setup, accum=4)
    t0 = jax.tree_util.tree_map(np.asarray, state.trainable)  # snapshot (state is donated)
    state, _ = step(state, params, batch, vocab, jax.random.key(0))
    # after 1 of 4 accumulation micro-steps the trainable params are unchanged
    cur = jax.tree_util.tree_map(np.asarray, state.trainable)
    diff = jax.tree_util.tree_map(lambda a, b: float(np.abs(a - b).max()), t0, cur)
    assert max(jax.tree_util.tree_leaves(diff)) == 0.0
    for i in range(3):
        state, _ = step(state, params, batch, vocab, jax.random.key(i + 1))
    cur = jax.tree_util.tree_map(np.asarray, state.trainable)
    diff = jax.tree_util.tree_map(lambda a, b: float(np.abs(a - b).max()), t0, cur)
    assert max(jax.tree_util.tree_leaves(diff)) > 0.0


def test_pjit_train_step_on_8dev_mesh_with_tp(setup):
    cfg, params, vtg_l, tvg_l, batch, vocab = setup
    mesh = make_mesh(data=2, model=4)
    shardings = train_lib.param_shardings(cfg, mesh)
    frozen = jax.device_put(params, shardings)
    state, step, _, _, _ = _make(setup, mesh=mesh)
    state, metrics = step(state, frozen, batch, vocab, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))


def test_cosine_lr_schedule_matches_reference_formula():
    import math

    tcfg = train_lib.TrainConfig(lr=2e-4, min_lr=0.0, warmup_epochs=1.0, epochs=5)
    # warmup: linear
    assert float(train_lib.cosine_lr(jnp.asarray(0.5), tcfg)) == pytest.approx(1e-4)
    # post-warmup half-cosine (reference: util/lr_sched.py:9-21)
    e = 3.0
    expect = 0.0 + (2e-4 - 0.0) * 0.5 * (1 + math.cos(math.pi * (e - 1) / (5 - 1)))
    assert float(train_lib.cosine_lr(jnp.asarray(e), tcfg)) == pytest.approx(expect, rel=1e-6)