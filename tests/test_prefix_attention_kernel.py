"""Grouped prefix-attention kernel parity (interpret mode on CPU) vs the XLA
formulation, including prefix/suffix masks and CPN-style masked queries.

The fused-K kernel stacks all K suffixes of a group into one q tile and holds
the whole prefix KV in VMEM; shapes must be big enough to pass its MXU
occupancy gate (K*W >= 128) or it falls back to XLA by design.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from blim_tpu.kernels.prefix_attention import _xla_reference, prefix_attention


def make_case(rng, G, K, W, Hq, Hkv, hd, P):
    q = jnp.asarray(rng.standard_normal((G, K, W, Hq, hd)), jnp.float32) * 0.3
    ks = jnp.asarray(rng.standard_normal((G, K, W, Hkv, hd)), jnp.float32) * 0.3
    vs = jnp.asarray(rng.standard_normal((G, K, W, Hkv, hd)), jnp.float32) * 0.3
    kp = jnp.asarray(rng.standard_normal((G, P, Hkv, hd)), jnp.float32) * 0.3
    vp = jnp.asarray(rng.standard_normal((G, P, Hkv, hd)), jnp.float32) * 0.3
    sm = np.ones((G, K, W), np.int32)
    sm[:, :, W - 3:] = 0          # right-padded captions
    sm[0, 0, 0] = 0               # CPN-masked suffix query
    pm = np.ones((G, P), np.int32)
    pm[:, P - 11:] = 0            # alignment pads
    pm[min(1, G - 1), :20] = 0    # left padding
    return q, ks, vs, kp, vp, jnp.asarray(sm), jnp.asarray(pm)


@pytest.mark.slow
@pytest.mark.parametrize("shape", [
    # (G, K, W, Hq, Hkv, hd, P) — gate needs K*W >= 128, hd % 128 == 0
    (2, 32, 8, 4, 2, 128, 256),    # aligned P
    (1, 32, 16, 4, 2, 128, 341),   # the rerank shape class: unaligned P pads
    (1, 16, 24, 4, 2, 128, 120),   # W=24 (bucket), P unaligned to 16
    (1, 40, 96, 2, 1, 128, 48),    # K*W over the per-program cap: K chunks
                                   # (kc=34, nc=2, K pads 40->68 zero-masked)
])
def test_fused_kernel_matches_xla_interpret(rng, shape):
    G, K, W, Hq, Hkv, hd, P = shape
    q, ks, vs, kp, vp, sm, pm = make_case(rng, G, K, W, Hq, Hkv, hd, P)
    scale = hd ** -0.5

    ref = _xla_reference(q, ks, vs, kp, vp, sm, pm, scale)
    out = prefix_attention(q, ks, vs, kp, vp, sm, pm, scale,
                           use_pallas=True, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_small_shapes_fall_back_to_xla(rng):
    """Below the occupancy gate the wrapper must return the XLA result."""
    q, ks, vs, kp, vp, sm, pm = make_case(rng, 2, 3, 8, 4, 2, 128, 64)
    scale = 128 ** -0.5
    out = prefix_attention(q, ks, vs, kp, vp, sm, pm, scale, use_pallas=True)
    ref = _xla_reference(q, ks, vs, kp, vp, sm, pm, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
