"""Grouped prefix-attention kernel parity (interpret mode on CPU) vs the XLA
formulation, including prefix/suffix masks and CPN-style masked queries."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from blim_tpu.kernels.prefix_attention import _xla_reference, prefix_attention


def test_kernel_matches_xla_interpret(rng):
    from jax.experimental.pallas import tpu as pltpu

    G, K, W, Hq, Hkv, hd, P = 2, 3, 8, 4, 2, 128, 256
    q = jnp.asarray(rng.standard_normal((G, K, W, Hq, hd)), jnp.float32)
    ks = jnp.asarray(rng.standard_normal((G, K, W, Hkv, hd)), jnp.float32)
    vs = jnp.asarray(rng.standard_normal((G, K, W, Hkv, hd)), jnp.float32)
    kp = jnp.asarray(rng.standard_normal((G, P, Hkv, hd)), jnp.float32)
    vp = jnp.asarray(rng.standard_normal((G, P, Hkv, hd)), jnp.float32)
    sm = np.ones((G, K, W), np.int32)
    sm[:, :, 6:] = 0
    sm[0, 0, 0] = 0  # CPN-masked suffix query
    pm = np.ones((G, P), np.int32)
    pm[:, 200:] = 0  # alignment pads
    pm[1, :20] = 0   # left padding
    scale = hd ** -0.5

    ref = _xla_reference(q, ks, vs, kp, vp, jnp.asarray(sm), jnp.asarray(pm), scale)
    with pltpu.force_tpu_interpret_mode():
        out = prefix_attention(
            q, ks, vs, kp, vp, jnp.asarray(sm), jnp.asarray(pm), scale, use_pallas=True
        )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-4, atol=2e-5
    )
