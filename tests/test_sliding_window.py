"""Sliding-window attention (reference: modeling_qwen2_flash.py:390-412,
522-523): config-gated, per-layer (only layers below max_window_layers),
active only when the sequence exceeds the window. Dormant in BLiM configs —
these tests pin the semantics for checkpoint parity."""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from blim_tpu.core.config import tiny_model_config
from blim_tpu.kernels.attention import multi_head_attention
from blim_tpu.models import qwen2


def _numpy_windowed_attention(q, k, v, window, scale):
    """Independent numpy oracle: causal GQA attention with a sliding window
    (query i sees key j iff 0 <= i - j <= window)."""
    b, s, hq, d = q.shape
    hkv = k.shape[2]
    groups = hq // hkv
    out = np.zeros_like(q, dtype=np.float32)
    for bi in range(b):
        for h in range(hq):
            kh = h // groups
            scores = (q[bi, :, h].astype(np.float64) @
                      k[bi, :, kh].astype(np.float64).T) * scale
            for i in range(s):
                for j in range(s):
                    if j > i or i - j > window:
                        scores[i, j] = -np.inf
            p = np.exp(scores - scores.max(axis=-1, keepdims=True))
            p /= p.sum(axis=-1, keepdims=True)
            out[bi, :, h] = p @ v[bi, :, kh].astype(np.float64)
    return out


def test_window_mask_matches_numpy_oracle():
    rng = np.random.default_rng(0)
    b, s, hq, hkv, d = 2, 10, 4, 2, 8
    q = rng.standard_normal((b, s, hq, d)).astype(np.float32)
    k = rng.standard_normal((b, s, hkv, d)).astype(np.float32)
    v = rng.standard_normal((b, s, hkv, d)).astype(np.float32)
    for w in (1, 3, 7):
        got = np.asarray(multi_head_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            causal=True, scale=d ** -0.5, use_pallas=False,
            window=jnp.int32(w),
        ))
        want = _numpy_windowed_attention(q, k, v, w, d ** -0.5)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def _cfg(**kw):
    base = tiny_model_config(vocab_size=256).llm
    return dataclasses.replace(base, **kw)


def test_sliding_window_off_by_default_unchanged():
    """A window larger than the sequence (or the flag off) is a no-op."""
    cfg_off = _cfg()
    cfg_wide = _cfg(use_sliding_window=True, sliding_window=64, max_window_layers=2)
    params = qwen2.init_params(cfg_off, jax.random.key(0))
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 256, (2, 12)), jnp.int32)
    base = qwen2.forward_logits(params, cfg_off, ids, use_pallas=False)
    wide = qwen2.forward_logits(params, cfg_wide, ids, use_pallas=False)
    np.testing.assert_allclose(np.asarray(base), np.asarray(wide), rtol=1e-6)


def test_sliding_window_single_layer_equals_truncated_context():
    """With ONE layer, the last position of a windowed forward equals a full
    forward over just the last window+1 tokens (at preserved positions) —
    an exact semantic oracle for the window mask."""
    w = 4
    cfg = _cfg(num_hidden_layers=1, use_sliding_window=True,
               sliding_window=w, max_window_layers=1)
    params = qwen2.init_params(cfg, jax.random.key(2))
    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, 256, (1, 12)), jnp.int32)
    full = qwen2.forward_hidden(
        params, cfg, qwen2.embed_tokens(params, ids), use_pallas=False)
    tail_ids = ids[:, -(w + 1):]
    pos = jnp.arange(12 - (w + 1), 12)[None]
    tail = qwen2.forward_hidden(
        params, cfg, qwen2.embed_tokens(params, tail_ids),
        position_ids=pos, use_pallas=False)
    np.testing.assert_allclose(
        np.asarray(full[:, -1]), np.asarray(tail[:, -1]), rtol=2e-5, atol=2e-5)


def test_max_window_layers_gates_deeper_layers():
    """max_window_layers=0 disables the window entirely (all layers full);
    enabling it on layer 0 changes the output."""
    kw = dict(use_sliding_window=True, sliding_window=3)
    cfg_none = _cfg(max_window_layers=0, **kw)
    cfg_all = _cfg(max_window_layers=2, **kw)
    cfg_off = _cfg()
    params = qwen2.init_params(cfg_off, jax.random.key(4))
    ids = jnp.asarray(np.random.default_rng(5).integers(0, 256, (1, 10)), jnp.int32)
    base = np.asarray(qwen2.forward_logits(params, cfg_off, ids, use_pallas=False))
    gated = np.asarray(qwen2.forward_logits(params, cfg_none, ids, use_pallas=False))
    windowed = np.asarray(qwen2.forward_logits(params, cfg_all, ids, use_pallas=False))
    np.testing.assert_allclose(gated, base, rtol=1e-6)
    assert np.abs(windowed - base).max() > 1e-3


def test_sliding_window_collect_kv_path():
    """forward_collect_kv honors the window (prefix-KV producer parity)."""
    w = 3
    cfg = _cfg(use_sliding_window=True, sliding_window=w, max_window_layers=2)
    params = qwen2.init_params(cfg, jax.random.key(6))
    ids = jnp.asarray(np.random.default_rng(7).integers(0, 256, (2, 9)), jnp.int32)
    emb = qwen2.embed_tokens(params, ids)
    hidden_a = qwen2.forward_hidden(params, cfg, emb, use_pallas=False)
    hidden_b, kv = qwen2.forward_collect_kv(params, cfg, emb, use_pallas=False)
    np.testing.assert_allclose(
        np.asarray(hidden_a), np.asarray(hidden_b), rtol=2e-5, atol=2e-5)
    assert kv["k"].shape[0] == cfg.num_hidden_layers
