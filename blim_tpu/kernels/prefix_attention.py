"""Pallas kernel: suffix attention over a shared prefix KV.

The shared-prefix rerank path attends K short caption suffixes to one video
prefix per group. The XLA formulation materializes fp32 score tensors
(G,K,H,W,P) in HBM — at 7B scale that is ~1.3 GB written+read per layer and
dominates the step time. This kernel streams prefix KV blocks through VMEM
with online-softmax accumulation (flash attention with a two-source KV:
[prefix blocks | own suffix]), so scores never touch HBM.

Semantics (must match qwen2._grouped_prefix_attention):
  * prefix keys gated by prefix_mask (padding / CPN priors);
  * suffix keys causal within the suffix + gated by suffix_mask;
  * masked suffix queries emit zero output (varlen re-pad semantics);
  * softmax in fp32, PV matmuls in the value dtype.

Backward: custom VJP through the XLA formulation (identical math).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30


def _kernel(
    q_ref,        # (1, 1, 1, W, hd)
    kp_ref,       # (1, 1, P, hd)
    vp_ref,       # (1, 1, P, hd)
    ks_ref,       # (1, 1, 1, W, hd)
    vs_ref,       # (1, 1, 1, W, hd)
    pmask_ref,    # (1, 1, P)
    smask_ref,    # (1, 1, 1, W)
    o_ref,        # (1, 1, 1, W, hd)
    *,
    blk_p: int,
    prefix_len: int,
    w: int,
    scale: float,
):
    q = q_ref[0, 0, 0, :, :].astype(jnp.float32) * scale        # (W, hd)
    hd = q.shape[-1]

    n_blocks = prefix_len // blk_p

    def body(pi, carry):
        acc, m_prev, l_prev = carry
        k_blk = kp_ref[0, 0, pl.ds(pi * blk_p, blk_p), :].astype(jnp.float32)
        v_blk = vp_ref[0, 0, pl.ds(pi * blk_p, blk_p), :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (W, blk_p)
        pm = pmask_ref[0, 0, pl.ds(pi * blk_p, blk_p)].reshape(1, blk_p)
        s = jnp.where(pm > 0, s, NEG_INF)

        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((w, hd), jnp.float32)
    m0 = jnp.full((w, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((w, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, n_blocks, body, (acc0, m0, l0))

    # suffix block: causal + key mask
    ks = ks_ref[0, 0, 0, :, :].astype(jnp.float32)               # (W, hd)
    vs = vs_ref[0, 0, 0, :, :]
    s = jax.lax.dot_general(
        q, ks, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (W, W)
    sm = smask_ref[0, 0, 0, :].reshape(1, w)
    qpos = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
    visible = jnp.logical_and(qpos >= kpos, sm > 0)
    s = jnp.where(visible, s, NEG_INF)

    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m, m_cur)
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m - m_new)
    l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc = acc * alpha + jax.lax.dot_general(
        p.astype(vs.dtype), vs, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    out = acc / jnp.maximum(l, 1e-30)
    qm = smask_ref[0, 0, 0, :].reshape(w, 1).astype(jnp.float32)
    o_ref[0, 0, 0, :, :] = (out * qm).astype(o_ref.dtype)


def _pallas_forward(q, k_suf, v_suf, k_pre, v_pre, suffix_mask, prefix_mask, scale, blk_p):
    g, kk, w, hq, hd = q.shape
    hkv = k_pre.shape[2]
    group = hq // hkv
    p_len = k_pre.shape[1]

    grid = (g, hq, kk)
    kernel = functools.partial(
        _kernel, blk_p=blk_p, prefix_len=p_len, w=w, scale=scale
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, 1, w, hd), lambda gi, hi, ki: (gi, ki, hi, 0, 0)),
            pl.BlockSpec((1, 1, p_len, hd), lambda gi, hi, ki: (gi, hi // group, 0, 0)),
            pl.BlockSpec((1, 1, p_len, hd), lambda gi, hi, ki: (gi, hi // group, 0, 0)),
            pl.BlockSpec((1, 1, 1, w, hd), lambda gi, hi, ki: (gi, ki, hi // group, 0, 0)),
            pl.BlockSpec((1, 1, 1, w, hd), lambda gi, hi, ki: (gi, ki, hi // group, 0, 0)),
            pl.BlockSpec((1, 1, p_len), lambda gi, hi, ki: (gi, 0, 0)),
            pl.BlockSpec((1, 1, 1, w), lambda gi, hi, ki: (gi, ki, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 1, w, hd), lambda gi, hi, ki: (gi, ki, hi, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((g, kk, hq, w, hd), q.dtype),
    )(
        q.transpose(0, 1, 3, 2, 4),        # (G, K, Hq, W, hd)
        k_pre.transpose(0, 2, 1, 3),       # (G, Hkv, P, hd)
        v_pre.transpose(0, 2, 1, 3),
        k_suf.transpose(0, 1, 3, 2, 4),    # (G, K, Hkv, W, hd)
        v_suf.transpose(0, 1, 3, 2, 4),
        prefix_mask[:, None, :],
        suffix_mask[:, :, None, :],
    )
    return out.transpose(0, 1, 3, 2, 4)    # back to (G, K, W, Hq, hd)


def _xla_reference(q, k_suf, v_suf, k_pre, v_pre, suffix_mask, prefix_mask, scale):
    from blim_tpu.models.qwen2 import _grouped_prefix_attention

    return _grouped_prefix_attention(
        q, k_suf, v_suf, k_pre, v_pre, suffix_mask, scale, prefix_mask=prefix_mask
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def _prefix_attention(q, k_suf, v_suf, k_pre, v_pre, suffix_mask, prefix_mask, scale, blk_p):
    return _pallas_forward(q, k_suf, v_suf, k_pre, v_pre, suffix_mask, prefix_mask, scale, blk_p)


def _fwd(q, k_suf, v_suf, k_pre, v_pre, suffix_mask, prefix_mask, scale, blk_p):
    out = _pallas_forward(q, k_suf, v_suf, k_pre, v_pre, suffix_mask, prefix_mask, scale, blk_p)
    return out, (q, k_suf, v_suf, k_pre, v_pre, suffix_mask, prefix_mask)


def _bwd(scale, blk_p, res, grad):
    q, k_suf, v_suf, k_pre, v_pre, suffix_mask, prefix_mask = res
    _, vjp = jax.vjp(
        lambda q_, ks_, vs_, kp_, vp_: _xla_reference(
            q_, ks_, vs_, kp_, vp_, suffix_mask, prefix_mask, scale
        ),
        q, k_suf, v_suf, k_pre, v_pre,
    )
    dq, dks, dvs, dkp, dvp = vjp(grad)
    return dq, dks, dvs, dkp, dvp, None, None


_prefix_attention.defvjp(_fwd, _bwd)


def prefix_attention(
    q: jax.Array,               # (G, K, W, Hq, hd)
    k_suf: jax.Array,           # (G, K, W, Hkv, hd)
    v_suf: jax.Array,
    k_pre: jax.Array,           # (G, P, Hkv, hd)
    v_pre: jax.Array,
    suffix_mask: jax.Array,     # (G, K, W)
    prefix_mask: Optional[jax.Array],   # (G, P) or None (all visible)
    scale: float,
    use_pallas: Optional[bool] = None,
    blk_p: int = 128,
) -> jax.Array:
    g, kk, w, hq, hd = q.shape
    p_len = k_pre.shape[1]
    if prefix_mask is None:
        prefix_mask = jnp.ones((g, p_len), jnp.int32)
    prefix_mask = prefix_mask.astype(jnp.int32)
    suffix_mask = suffix_mask.astype(jnp.int32)
    if use_pallas is None:
        # Measured on v5e: at rerank sizes (W~40, P~384, G~2) the XLA
        # formulation is ~2x faster than this kernel — per-program work is
        # tiny (one q tile) and occupancy dominates. The kernel wins only for
        # long prefixes where the materialized (W, P) scores stop fitting in
        # cache-friendly tiles; callers opt in explicitly.
        use_pallas = False
    # shape constraints for the TPU lowering
    if use_pallas and (p_len % blk_p == 0 and hd % 128 == 0 and w % 8 == 0):
        return _prefix_attention(
            q, k_suf, v_suf, k_pre, v_pre, suffix_mask, prefix_mask, scale, blk_p
        )
    return _xla_reference(q, k_suf, v_suf, k_pre, v_pre, suffix_mask, prefix_mask, scale)
