"""Pallas kernel: suffix attention over a shared prefix KV (fused-K design).

The shared-prefix rerank path attends K short caption suffixes to one video
prefix per group. The XLA formulation materializes fp32 score tensors
(G,K,H,W,P) in HBM; this kernel keeps them in VMEM.

Round-1 design (one suffix per program) lost 2x to XLA: each program did one
(W<=40, hd) q tile — terrible MXU occupancy — and re-streamed the prefix KV
K times per head. This round fuses a group's K suffixes into one program:

  * grid (G, Hq) — per program, the q tile is all K suffixes stacked,
    (K*W, hd): 512 MXU rows at K=32, W=16 instead of 16;
  * the whole prefix KV for the head's GQA group loads once into VMEM
    (P~350 x 128 bf16 = 88KB) — no K-fold re-streaming, no streaming loop;
  * prefix scores (K*W, P) live only in VMEM; two-source online-softmax
    merge with the per-suffix causal block (K, W, W) batched matmul;
  * P and W pad to sublane multiples inside the wrapper (masked), so exact
    rerank shapes (P=341, W=16/24/99) engage without layout changes.

Semantics (must match qwen2._grouped_prefix_attention):
  * prefix keys gated by prefix_mask (padding / CPN priors);
  * suffix keys causal within the suffix + gated by suffix_mask;
  * masked suffix queries emit zero output (varlen re-pad semantics);
  * softmax in fp32, PV matmuls in the value dtype.

Backward: custom VJP through the XLA formulation — exact, and scoring (the
only consumer) never differentiates through this path; training runs full
sequences through flash_attention's fused backward instead.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

NEG_INF = -1e30


def _fused_kernel(
    q_ref,        # (1, 1, K, W, hd)
    kp_ref,       # (1, 1, P, hd)
    vp_ref,       # (1, 1, P, hd)
    ks_ref,       # (1, 1, K, W, hd)
    vs_ref,       # (1, 1, K, W, hd)
    pmask_ref,    # (1, 1, P) int32
    smask_ref,    # (1, 1, K, W) int32
    o_ref,        # (1, 1, K, W, hd)
    *,
    scale: float,
):
    kk, w, hd = q_ref.shape[2], q_ref.shape[3], q_ref.shape[4]
    p_len = kp_ref.shape[2]

    q = q_ref[0, 0].astype(jnp.float32) * scale            # (K, W, hd)
    qf = q.reshape(kk * w, hd)

    # -- prefix source: one (K*W, P) score tile, whole prefix KV in VMEM
    kp = kp_ref[0, 0].astype(jnp.float32)                  # (P, hd)
    vp = vp_ref[0, 0]                                      # (P, hd)
    s1 = jax.lax.dot_general(
        qf, kp, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                                      # (K*W, P)
    pm = pmask_ref[0, 0].reshape(1, p_len)
    s1 = jnp.where(pm > 0, s1, NEG_INF)
    m1 = jnp.max(s1, axis=-1, keepdims=True)
    p1 = jnp.exp(s1 - m1)
    l1 = jnp.sum(p1, axis=-1, keepdims=True)
    acc1 = jax.lax.dot_general(
        p1.astype(vp.dtype), vp, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                                      # (K*W, hd)

    # -- suffix source: per-suffix causal block, batched over K
    ks = ks_ref[0, 0].astype(jnp.float32)                  # (K, W, hd)
    vs = vs_ref[0, 0]
    s2 = jax.lax.dot_general(
        q, ks, (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32
    )                                                      # (K, W, W)
    sm = smask_ref[0, 0].reshape(kk, 1, w)
    qpos = jax.lax.broadcasted_iota(jnp.int32, (kk, w, w), 1)
    kpos = jax.lax.broadcasted_iota(jnp.int32, (kk, w, w), 2)
    visible = jnp.logical_and(qpos >= kpos, sm > 0)
    s2 = jnp.where(visible, s2, NEG_INF)
    m2 = jnp.max(s2, axis=-1, keepdims=True)               # (K, W, 1)
    p2 = jnp.exp(s2 - m2)
    l2 = jnp.sum(p2, axis=-1, keepdims=True)
    acc2 = jax.lax.dot_general(
        p2.astype(vs.dtype), vs, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )                                                      # (K, W, hd)

    # -- two-source online-softmax merge
    m1r = m1.reshape(kk, w, 1)
    l1r = l1.reshape(kk, w, 1)
    acc1r = acc1.reshape(kk, w, hd)
    m = jnp.maximum(m1r, m2)
    a1 = jnp.exp(m1r - m)
    a2 = jnp.exp(m2 - m)
    l = l1r * a1 + l2 * a2
    acc = acc1r * a1 + acc2 * a2
    out = acc / jnp.maximum(l, 1e-30)

    qm = smask_ref[0, 0].reshape(kk, w, 1).astype(jnp.float32)
    o_ref[0, 0] = (out * qm).astype(o_ref.dtype)


def _pallas_forward(q, k_suf, v_suf, k_pre, v_pre, suffix_mask, prefix_mask, scale):
    g, kk, w, hq, hd = q.shape
    hkv = k_pre.shape[2]
    group = hq // hkv
    p_len = k_pre.shape[1]

    # pad P and W to sublane multiples (masked-off, so semantics-free)
    def pad_to(x, mult, axis):
        pad = (-x.shape[axis]) % mult
        if pad == 0:
            return x
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, pad)
        return jnp.pad(x, widths)

    k_pre = pad_to(k_pre, 16, 1)
    v_pre = pad_to(v_pre, 16, 1)
    prefix_mask = pad_to(prefix_mask, 16, 1)
    q = pad_to(q, 8, 2)
    k_suf = pad_to(k_suf, 8, 2)
    v_suf = pad_to(v_suf, 8, 2)
    suffix_mask = pad_to(suffix_mask, 8, 2)
    p_pad = k_pre.shape[1]
    w_pad = q.shape[2]

    # chunk the suffix axis so one program's VMEM stays bounded. Limits are
    # anchored on the largest shape validated on v5e (K=32, W=104, P=352:
    # compiles and wins 2.15x over XLA): the q/kv/acc io+fp32 term caps
    # K_c*W at 32*104, the fp32 score/prob term caps K_c*W*(P+W) at
    # 32*104*456 entries. An unchunked K=64 x W=104 prior batch blew the
    # 16MB scoped-VMEM limit by 0.6MB.
    kc = max(1, min(kk, 3328 // w_pad, 1_517_568 // (w_pad * (p_pad + w_pad))))
    nc = -(-kk // kc)
    if nc > 1 and kk % kc:
        pad_k = nc * kc - kk
        q = pad_to(q, nc * kc, 1)
        k_suf = pad_to(k_suf, nc * kc, 1)
        v_suf = pad_to(v_suf, nc * kc, 1)
        suffix_mask = pad_to(suffix_mask, nc * kc, 1)  # zero mask => zero output
        del pad_k
    kk_pad = q.shape[1]

    grid = (g, hq, nc)
    out = pl.pallas_call(
        functools.partial(_fused_kernel, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, kc, w_pad, hd), lambda gi, hi, ci: (gi, hi, ci, 0, 0)),
            pl.BlockSpec((1, 1, p_pad, hd), lambda gi, hi, ci: (gi, hi // group, 0, 0)),
            pl.BlockSpec((1, 1, p_pad, hd), lambda gi, hi, ci: (gi, hi // group, 0, 0)),
            pl.BlockSpec((1, 1, kc, w_pad, hd), lambda gi, hi, ci: (gi, hi // group, ci, 0, 0)),
            pl.BlockSpec((1, 1, kc, w_pad, hd), lambda gi, hi, ci: (gi, hi // group, ci, 0, 0)),
            pl.BlockSpec((1, 1, p_pad), lambda gi, hi, ci: (gi, 0, 0)),
            pl.BlockSpec((1, 1, kc, w_pad), lambda gi, hi, ci: (gi, 0, ci, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, kc, w_pad, hd), lambda gi, hi, ci: (gi, hi, ci, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((g, hq, kk_pad, w_pad, hd), q.dtype),
    )(
        q.transpose(0, 3, 1, 2, 4),        # (G, Hq, K, W, hd)
        k_pre.transpose(0, 2, 1, 3),       # (G, Hkv, P, hd)
        v_pre.transpose(0, 2, 1, 3),
        k_suf.transpose(0, 3, 1, 2, 4),    # (G, Hkv, K, W, hd)
        v_suf.transpose(0, 3, 1, 2, 4),
        prefix_mask[:, None, :],
        suffix_mask[:, None, :, :].transpose(0, 1, 2, 3),
    )
    out = out.transpose(0, 2, 3, 1, 4)     # (G, K_pad, W_pad, Hq, hd)
    return out[:, :kk, :w]


def _xla_reference(q, k_suf, v_suf, k_pre, v_pre, suffix_mask, prefix_mask, scale):
    from blim_tpu.models.qwen2 import _grouped_prefix_attention

    return _grouped_prefix_attention(
        q, k_suf, v_suf, k_pre, v_pre, suffix_mask, scale, prefix_mask=prefix_mask
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _prefix_attention(q, k_suf, v_suf, k_pre, v_pre, suffix_mask, prefix_mask, scale):
    return _pallas_forward(q, k_suf, v_suf, k_pre, v_pre, suffix_mask, prefix_mask, scale)


def _fwd(q, k_suf, v_suf, k_pre, v_pre, suffix_mask, prefix_mask, scale):
    out = _pallas_forward(q, k_suf, v_suf, k_pre, v_pre, suffix_mask, prefix_mask, scale)
    return out, (q, k_suf, v_suf, k_pre, v_pre, suffix_mask, prefix_mask)


def _bwd(scale, res, grad):
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
    interpret: bool = False,
) -> jax.Array:
    g, kk, w, hq, hd = q.shape
    p_len = k_pre.shape[1]
    if prefix_mask is None:
        prefix_mask = jnp.ones((g, p_len), jnp.int32)
    prefix_mask = prefix_mask.astype(jnp.int32)
    suffix_mask = suffix_mask.astype(jnp.int32)
    if prefix_mask.ndim == 3:
        # per-candidate prefix visibility (packed-TVG segments): XLA only —
        # the fused-K kernel loads one (P, hd) prefix tile per program and
        # has no per-suffix key gating.
        return _xla_reference(q, k_suf, v_suf, k_pre, v_pre, suffix_mask, prefix_mask, scale)
    if use_pallas is None:
        # Default decided by on-device measurement (see CLAUDE.md scoreboard).
        # Per-op (scripts/abench_prefix.py, chained-op timing) the fused-K
        # kernel beats XLA at every VTG rerank shape on v5e — 1.06x (G=2
        # W=16) to 2.15x (full-width) — but END-TO-END it is a wash on the
        # zero-shot flow (suffix attention is ~10% of step time and
        # pallas_call is a fusion barrier) and a 45% LOSS on the fine-tuned
        # flow (TVG's W=7 suffixes sit at the kernel's per-call floor). XLA
        # stays the default; callers with wide-suffix-heavy workloads can
        # opt in.
        use_pallas = False
    # the fused q tile needs enough rows to feed the MXU, and hd must be a
    # full lane tile. K chunks inside the wrapper, but W and P are per-program
    # invariants, so even a single-suffix chunk must satisfy the VMEM bounds
    # the chunker enforces (3328 q rows; 1.52M fp32 score entries) — shapes
    # that cannot fall back to XLA here instead of failing to compile.
    w_pad = -(-w // 8) * 8
    p_pad = -(-p_len // 16) * 16
    fits = (
        hd % 128 == 0
        and kk * w >= 128
        and w_pad <= 3328
        and w_pad * (p_pad + w_pad) <= 1_517_568
        and p_len * hd * 4 <= 2 * 2**20
    )
    if use_pallas and fits:
        if interpret:
            from jax.experimental.pallas import tpu as pltpu

            with pltpu.force_tpu_interpret_mode():
                return _prefix_attention(
                    q, k_suf, v_suf, k_pre, v_pre, suffix_mask, prefix_mask, scale
                )
        return _prefix_attention(
            q, k_suf, v_suf, k_pre, v_pre, suffix_mask, prefix_mask, scale
        )
    return _xla_reference(q, k_suf, v_suf, k_pre, v_pre, suffix_mask, prefix_mask, scale)
