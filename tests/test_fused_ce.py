"""Chunked-vocab fused CE must match the materialized-logits CE exactly
(same fp32 math, flash-style accumulation), including the LoRA delta."""

import numpy as np
import jax
import jax.numpy as jnp

from blim_tpu.core.constants import IGNORE_INDEX
from blim_tpu.scoring import criteria


def test_ce_from_hidden_matches_dense(rng):
    B, W, D, V = 3, 7, 16, 1000  # V not a multiple of chunk
    hidden = jnp.asarray(rng.standard_normal((B, W, D)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((D, V)), jnp.float32) * 0.3
    labels = rng.integers(0, V, (B, W)).astype(np.int32)
    labels[:, 5:] = IGNORE_INDEX
    labels[0, 0] = V - 1  # last vocab entry (chunk-boundary edge)

    logits = jnp.dot(hidden, kernel)
    ce_dense, valid_dense = criteria.token_ce_from_logits(logits, jnp.asarray(labels))
    ce_fused, valid_fused = criteria.ce_from_hidden(hidden, kernel, jnp.asarray(labels), chunk=256)
    np.testing.assert_array_equal(np.asarray(valid_dense), np.asarray(valid_fused))
    np.testing.assert_allclose(np.asarray(ce_fused), np.asarray(ce_dense), rtol=1e-5, atol=1e-6)


def test_ce_from_hidden_with_lora(rng):
    B, W, D, V, r = 2, 5, 8, 300, 4
    hidden = jnp.asarray(rng.standard_normal((B, W, D)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((D, V)), jnp.float32) * 0.3
    a = jnp.asarray(rng.standard_normal((D, r)), jnp.float32) * 0.2
    b = jnp.asarray(rng.standard_normal((r, V)), jnp.float32) * 0.2
    labels = jnp.asarray(rng.integers(0, V, (B, W)).astype(np.int32))
    scale = 2.0

    logits = hidden @ kernel + (hidden @ a) @ b * scale
    ce_dense, _ = criteria.token_ce_from_logits(logits, labels)
    ce_fused, _ = criteria.ce_from_hidden(hidden, kernel, labels, a, b, scale, chunk=128)
    np.testing.assert_allclose(np.asarray(ce_fused), np.asarray(ce_dense), rtol=1e-5, atol=1e-6)


def test_vtg_likelihood_from_hidden_matches_logit_path(rng):
    B, W, D, V = 4, 6, 12, 500
    hidden = jnp.asarray(rng.standard_normal((B, W, D)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((D, V)), jnp.float32) * 0.3
    labels = rng.integers(0, V, (B, W)).astype(np.int32)
    labels[:, 4:] = IGNORE_INDEX
    expect = criteria.vtg_likelihood(jnp.dot(hidden, kernel), jnp.asarray(labels))
    got = criteria.vtg_likelihood_from_hidden(hidden, kernel, jnp.asarray(labels))
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect), rtol=1e-5, atol=1e-6)


def test_ce_from_hidden_is_differentiable(rng):
    B, W, D, V = 2, 4, 8, 64
    hidden = jnp.asarray(rng.standard_normal((B, W, D)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((D, V)), jnp.float32) * 0.3
    labels = jnp.asarray(rng.integers(0, V, (B, W)).astype(np.int32))

    def f_fused(h):
        ce, valid = criteria.ce_from_hidden(h, kernel, labels, chunk=16)
        return ce.sum()

    def f_dense(h):
        ce, valid = criteria.token_ce_from_logits(jnp.dot(h, kernel), labels)
        return ce.sum()

    g1 = jax.grad(f_fused)(hidden)
    g2 = jax.grad(f_dense)(hidden)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4, atol=1e-5)
