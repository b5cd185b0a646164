"""Attention dispatch policy: which shapes engage the Pallas kernels.

A d % 128 gate once silently kicked the ViT (head dim 64) off its 3.6x
dense kernel — no throughput test runs on CPU, so the only tractable guard
is structural: trace the dispatch and assert the pallas_call primitive is
(or is not) in the jaxpr for the shapes that matter.
"""

import jax
import jax.numpy as jnp
import pytest

from blim_tpu.kernels import flash_attention as fa


def _has_pallas_call(jaxpr) -> bool:
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "pallas_call":
            return True
        for v in eqn.params.values():
            inner = getattr(v, "jaxpr", None)
            if inner is not None and _has_pallas_call(inner):
                return True
            if isinstance(v, (list, tuple)):
                for item in v:
                    inner = getattr(item, "jaxpr", None)
                    if inner is not None and _has_pallas_call(inner):
                        return True
    return False


def _zeros(b, s, hq, hkv, d):
    q = jnp.zeros((b, s, hq, d), jnp.float32)
    k = jnp.zeros((b, s, hkv, d), jnp.float32)
    v = jnp.zeros((b, s, hkv, d), jnp.float32)
    return q, k, v


def test_vit_dense_shape_engages_kernel():
    """UMT ViT-L attention: S=3136 (res448), 16 heads, d=64, non-causal."""
    q, k, v = _zeros(1, 3136, 16, 16, 64)
    jaxpr = jax.make_jaxpr(
        lambda q, k, v: fa.flash_attention(q, k, v, causal=False)
    )(q, k, v)
    assert _has_pallas_call(jaxpr.jaxpr), "ViT dense shape fell back to XLA"


def _find_pallas_eqn(jaxpr):
    for eqn in jaxpr.eqns:
        if eqn.primitive.name == "pallas_call":
            return eqn
        for v in eqn.params.values():
            inner = getattr(v, "jaxpr", None)
            if inner is not None:
                found = _find_pallas_eqn(inner)
                if found is not None:
                    return found
    return None


def test_vit_dense_shape_unrolls_kv_chunks():
    """The dense non-causal dispatch must pick the statically unrolled
    KV-chunk body (straight-line MXU/VPU overlap, r4): the kernel jaxpr
    carries one QK^T + one PV dot per chunk and NO loop primitive — a
    fori_loop body would show exactly 2 dots inside a scan/while."""
    q, k, v = _zeros(1, 3136, 16, 16, 64)
    jaxpr = jax.make_jaxpr(
        lambda q, k, v: fa.flash_attention(q, k, v, causal=False)
    )(q, k, v)
    eqn = _find_pallas_eqn(jaxpr.jaxpr)
    assert eqn is not None, "ViT dense shape fell back to XLA"
    kernel = eqn.params["jaxpr"]
    prims = {e.primitive.name for e in kernel.eqns}
    assert not ({"while", "scan"} & prims), "KV loop was not unrolled"
    n_dots = sum(1 for e in kernel.eqns if e.primitive.name == "dot_general")
    assert n_dots >= 4, f"expected unrolled per-chunk dots, got {n_dots}"


def test_llm_masked_causal_shape_engages_kernel():
    """The 7B GQA shape (d=128) with padding masks, causal."""
    q, k, v = _zeros(2, 341, 28, 4, 128)
    km = jnp.ones((2, 341), jnp.int32)
    jaxpr = jax.make_jaxpr(
        lambda q, k, v: fa.flash_attention(q, k, v, key_mask=km, query_mask=km)
    )(q, k, v)
    assert _has_pallas_call(jaxpr.jaxpr), "LLM masked shape fell back to XLA"


def test_llm_backward_engages_fused_kernels():
    """grad through flash_attention must hit the fused Pallas backward
    (the dq + dkv pallas_calls), not an XLA recompute VJP."""
    q, k, v = _zeros(1, 512, 16, 4, 128)

    def loss(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v) ** 2)

    jaxpr = jax.make_jaxpr(jax.grad(loss, argnums=(0, 1, 2)))(q, k, v)
    assert _has_pallas_call(jaxpr.jaxpr), "backward fell back to XLA"


@pytest.mark.parametrize("shape", [
    (2, 8, 4, 2, 128),     # s * hq < 4096: launch overhead beats any win
    (1, 1024, 8, 4, 32),   # s*hq passes the size gate; d=32 hits the d gate
])
def test_small_or_narrow_shapes_fall_back(shape):
    q, k, v = _zeros(*shape)
    jaxpr = jax.make_jaxpr(lambda q, k, v: fa.flash_attention(q, k, v))(q, k, v)
    assert not _has_pallas_call(jaxpr.jaxpr), "tiny shape should use XLA"
