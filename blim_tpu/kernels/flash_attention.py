"""Pallas TPU flash attention (causal + masked, GQA) with a fused backward.

TPU-native replacement for the reference's FlashAttention-2 CUDA kernels
(reference: modeling_qwen2_flash.py:52-53,528-628 `flash_attn_varlen_func`;
vision_tower_builder.py:26,109 `flash_attn_qkvpacked_func`):

  * online-softmax over KV blocks (running max/sum), fp32 accumulators;
  * GQA: query heads map onto their KV group via the BlockSpec index map —
    no repeat_kv materialization;
  * padding/CPN masks via a per-token key-visibility vector (the TPU
    equivalent of varlen's unpad: masked keys contribute -inf logits) and
    query-output zeroing (varlen re-pads masked queries' outputs as zeros);
  * causal blocks above the diagonal are skipped entirely;
  * non-causal mode covers the ViT's packed-QKV attention;
  * arbitrary sequence lengths: inputs pad to the block size with masked
    keys/queries, so the kernel engages at the production rerank/train
    shapes (S=341/440) instead of silently falling back to XLA;
  * fused backward (FA2 structure, reference capability: flash-attn 2.7.4's
    fused bwd, setup.sh:7): the forward saves O and the logsumexp rows; dq
    runs on a (batch, q-head, q-block) grid looping KV blocks, dk/dv on a
    (batch, kv-head, kv-block) grid looping the GQA group and q blocks —
    scores are recomputed in VMEM and never touch HBM in either direction.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(
    q_ref,        # (1, 1, blk_q, D)
    k_ref,        # (1, 1, S, D)
    v_ref,        # (1, 1, S, D)
    kmask_ref,    # (1, 1, S) int32 — or None (dense variant)
    qmask_ref,    # (1, 1, S) int32 — or None
    o_ref,        # (1, 1, blk_q, D)
    lse_ref,      # (1, 1, blk_q) f32 — or None (inference-only call)
    *,
    blk_q: int,
    blk_k: int,
    seq_len: int,
    causal: bool,
    scale: float,
    unroll: bool = False,
):
    qi = pl.program_id(2)
    q = q_ref[0, 0, :, :].astype(jnp.float32) * scale
    d = q.shape[-1]

    if causal:
        # process kv blocks only up to the diagonal of this q block
        num_kv = (qi * blk_q + blk_q + blk_k - 1) // blk_k
    else:
        num_kv = seq_len // blk_k

    q_pos = qi * blk_q + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 0)

    def body(ki, carry):
        acc, m_prev, l_prev = carry
        k_blk = k_ref[0, 0, pl.ds(ki * blk_k, blk_k), :].astype(jnp.float32)
        v_blk = v_ref[0, 0, pl.ds(ki * blk_k, blk_k), :]
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (blk_q, blk_k)

        visible = None
        if kmask_ref is not None:
            # reshape int32 before comparing: Mosaic can't minor-expand i1 vectors
            km = kmask_ref[0, 0, pl.ds(ki * blk_k, blk_k)].reshape(1, blk_k)
            visible = km > 0
        if causal:
            k_pos = ki * blk_k + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 1)
            c = q_pos >= k_pos
            visible = c if visible is None else jnp.logical_and(visible, c)
        if visible is not None:
            s = jnp.where(visible, s, NEG_INF)

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

    acc = jnp.zeros((blk_q, d), jnp.float32)
    m0 = jnp.full((blk_q, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((blk_q, 1), jnp.float32)
    if unroll and not causal:
        # static Python unroll: straight-line code lets Mosaic's scheduler
        # overlap chunk i+1's QK^T (MXU) with chunk i's softmax (VPU) — the
        # fori_loop body is a serial MXU->VPU->MXU chain per iteration
        carry = (acc, m0, l0)
        for ki in range(seq_len // blk_k):
            carry = body(ki, carry)
        acc, m, l = carry
    else:
        acc, m, l = jax.lax.fori_loop(0, num_kv, body, (acc, m0, l0))

    l_safe = jnp.maximum(l, 1e-30)
    out = acc / l_safe
    if qmask_ref is not None:
        qm = qmask_ref[0, 0, pl.ds(qi * blk_q, blk_q)].reshape(blk_q, 1).astype(jnp.float32)
        out = out * qm
    o_ref[0, 0, :, :] = out.astype(o_ref.dtype)
    if lse_ref is not None:
        # (1, 1, blk_q, 1): the trailing singleton keeps the block's last two
        # dims Mosaic-legal ((blk_q, 1) vs a (1, 1, blk_q) row vector, whose
        # sublane dim of 1 the TPU lowering rejects for H > 1 arrays)
        lse_ref[0, 0, :, 0] = (m + jnp.log(l_safe)).reshape(blk_q)


def _flash_forward(q, k, v, key_mask, query_mask, causal, scale, blk_q, blk_k,
                   with_lse: bool, interpret: bool = False, unroll: bool = False):
    b, s, hq, d = q.shape
    hkv = k.shape[2]
    group = hq // hkv

    qt = q.transpose(0, 2, 1, 3)              # (B, Hq, S, D)
    kt = k.transpose(0, 2, 1, 3)              # (B, Hkv, S, D)
    vt = v.transpose(0, 2, 1, 3)
    nq = s // blk_q

    grid = (b, hq, nq)
    dense = key_mask is None and query_mask is None
    if dense:
        def kernel(qr, kr, vr, outr, *maybe_lse, **kw):
            lse = maybe_lse[0] if maybe_lse else None
            return _fwd_kernel(qr, kr, vr, None, None, outr, lse, **kw)
    else:
        if with_lse:
            kernel = _fwd_kernel
        else:
            def kernel(qr, kr, vr, kmr, qmr, outr, **kw):
                return _fwd_kernel(qr, kr, vr, kmr, qmr, outr, None, **kw)
        if key_mask is None:
            key_mask = jnp.ones((b, s), jnp.int32)
        if query_mask is None:
            query_mask = jnp.ones((b, s), jnp.int32)
    kernel = functools.partial(
        kernel, blk_q=blk_q, blk_k=blk_k, seq_len=s, causal=causal, scale=scale,
        unroll=unroll,
    )
    in_specs = [
        pl.BlockSpec((1, 1, blk_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
        pl.BlockSpec((1, 1, s, d), lambda bi, hi, qi: (bi, hi // group, 0, 0)),
        pl.BlockSpec((1, 1, s, d), lambda bi, hi, qi: (bi, hi // group, 0, 0)),
    ]
    operands = [qt, kt, vt]
    if not dense:
        in_specs += [
            pl.BlockSpec((1, 1, s), lambda bi, hi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, 1, s), lambda bi, hi, qi: (bi, 0, 0)),
        ]
        operands += [key_mask[:, None, :], query_mask[:, None, :]]
    out_specs = [pl.BlockSpec((1, 1, blk_q, d), lambda bi, hi, qi: (bi, hi, qi, 0))]
    out_shape = [jax.ShapeDtypeStruct((b, hq, s, d), q.dtype)]
    if with_lse:
        out_specs.append(
            pl.BlockSpec((1, 1, blk_q, 1), lambda bi, hi, qi: (bi, hi, qi, 0))
        )
        out_shape.append(jax.ShapeDtypeStruct((b, hq, s, 1), jnp.float32))
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*operands)
    if with_lse:
        return outs[0].transpose(0, 2, 1, 3), outs[1][..., 0]
    return outs[0].transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# backward (FA2 structure)
# ---------------------------------------------------------------------------

def _dq_kernel(
    q_ref,       # (1, 1, blk_q, D)
    k_ref,       # (1, 1, S, D)
    v_ref,       # (1, 1, S, D)
    do_ref,      # (1, 1, blk_q, D)  (already query-mask-scaled)
    lse_ref,     # (1, 1, blk_q, 1) f32
    delta_ref,   # (1, 1, blk_q, 1) f32 — rowsum(dO * O)
    kmask_ref,   # (1, 1, S) int32 or None
    dq_ref,      # (1, 1, blk_q, D)
    *,
    blk_q: int,
    blk_k: int,
    seq_len: int,
    causal: bool,
    scale: float,
):
    qi = pl.program_id(2)
    q = q_ref[0, 0, :, :].astype(jnp.float32) * scale
    do = do_ref[0, 0, :, :].astype(jnp.float32)
    lse = lse_ref[0, 0, :, :].reshape(blk_q, 1)
    delta = delta_ref[0, 0, :, :].reshape(blk_q, 1)
    d = q.shape[-1]

    num_kv = ((qi * blk_q + blk_q + blk_k - 1) // blk_k) if causal else seq_len // blk_k
    q_pos = qi * blk_q + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 0)

    def body(ki, dq):
        k_blk = k_ref[0, 0, pl.ds(ki * blk_k, blk_k), :].astype(jnp.float32)
        v_blk = v_ref[0, 0, pl.ds(ki * blk_k, blk_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        visible = None
        if kmask_ref is not None:
            km = kmask_ref[0, 0, pl.ds(ki * blk_k, blk_k)].reshape(1, blk_k)
            visible = km > 0
        if causal:
            k_pos = ki * blk_k + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 1)
            c = q_pos >= k_pos
            visible = c if visible is None else jnp.logical_and(visible, c)
        if visible is not None:
            s = jnp.where(visible, s, NEG_INF)
        p = jnp.exp(s - lse)                                     # (blk_q, blk_k)
        dp = jax.lax.dot_general(
            do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        ds = p * (dp - delta)
        if visible is not None:
            ds = jnp.where(visible, ds, 0.0)
        return dq + jax.lax.dot_general(
            ds, k_blk, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    dq = jax.lax.fori_loop(0, num_kv, body, jnp.zeros((blk_q, d), jnp.float32))
    dq_ref[0, 0, :, :] = (dq * scale).astype(dq_ref.dtype)


def _dkv_kernel(
    q_ref,       # (1, 1, G*NQ, blk_q, D) — this kv head's query group, q-blocked
    k_ref,       # (1, 1, blk_k, D)
    v_ref,       # (1, 1, blk_k, D)
    do_ref,      # (1, 1, G*NQ, blk_q, D)
    lse_ref,     # (1, 1, G*NQ, 1, blk_q) f32
    delta_ref,   # (1, 1, G*NQ, 1, blk_q) f32
    kmask_ref,   # (1, 1, blk_k) int32 or None
    dk_ref,      # (1, 1, blk_k, D)
    dv_ref,      # (1, 1, blk_k, D)
    *,
    blk_q: int,
    blk_k: int,
    seq_len: int,
    group: int,
    causal: bool,
    scale: float,
):
    # q/do/lse/delta carry the q-block axis as a leading UNTILED dim: Mosaic
    # rejects dynamic loads at unaligned sublane offsets (the group index) or
    # dynamic lane offsets (qi*blk_q), so all dynamic indexing happens on
    # dim 2 and the tiled last-two dims are read whole.
    ki = pl.program_id(2)
    d = k_ref.shape[-1]
    k_blk = k_ref[0, 0, :, :].astype(jnp.float32)
    v_blk = v_ref[0, 0, :, :].astype(jnp.float32)

    km = None
    if kmask_ref is not None:
        km = kmask_ref[0, 0, :].reshape(1, blk_k) > 0

    nq = seq_len // blk_q
    # causal: q blocks strictly above this kv block's diagonal contribute 0
    q_start = (ki * blk_k) // blk_q if causal else 0
    k_pos = ki * blk_k + jax.lax.broadcasted_iota(jnp.int32, (blk_q, blk_k), 1)

    def outer(gi, carry):
        dk, dv = carry

        def inner(qi, carry2):
            dk2, dv2 = carry2
            idx = gi * nq + qi
            q = q_ref[0, 0, idx, :, :].astype(jnp.float32) * scale
            do = do_ref[0, 0, idx, :, :].astype(jnp.float32)
            lse = lse_ref[0, 0, idx, 0, :].reshape(blk_q, 1)
            delta = delta_ref[0, 0, idx, 0, :].reshape(blk_q, 1)
            s = jax.lax.dot_general(
                q, k_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            visible = km
            if causal:
                q_pos = qi * blk_q + jax.lax.broadcasted_iota(
                    jnp.int32, (blk_q, blk_k), 0
                )
                c = q_pos >= k_pos
                visible = c if visible is None else jnp.logical_and(visible, c)
            if visible is not None:
                s = jnp.where(visible, s, NEG_INF)
            p = jnp.exp(s - lse)
            dv2 = dv2 + jax.lax.dot_general(
                p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            dp = jax.lax.dot_general(
                do, v_blk, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )
            ds = p * (dp - delta)
            if visible is not None:
                ds = jnp.where(visible, ds, 0.0)
            dk2 = dk2 + jax.lax.dot_general(
                ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )
            return dk2, dv2

        return jax.lax.fori_loop(q_start, nq, inner, (dk, dv))

    dk = jnp.zeros((blk_k, d), jnp.float32)
    dv = jnp.zeros((blk_k, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, group, outer, (dk, dv))
    dk_ref[0, 0, :, :] = dk.astype(dk_ref.dtype)  # dk already includes `scale` via q
    dv_ref[0, 0, :, :] = dv.astype(dv_ref.dtype)


def _flash_backward(q, k, v, key_mask, query_mask, out, lse, g,
                    causal, scale, blk_q, blk_k, interpret: bool = False):
    b, s, hq, d = q.shape
    hkv = k.shape[2]
    group = hq // hkv

    if query_mask is not None:
        g = g * query_mask[:, :, None, None].astype(g.dtype)
    # delta = rowsum(dO * O) — cheap elementwise, fused by XLA
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # (B,S,Hq)

    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    gt = g.transpose(0, 2, 1, 3)
    dt = delta.transpose(0, 2, 1)             # (B, Hq, S)

    masked = key_mask is not None
    km_ops = [key_mask[:, None, :]] if masked else []
    km_spec3 = [pl.BlockSpec((1, 1, s), lambda bi, hi, qi: (bi, 0, 0))] if masked else []

    nq = s // blk_q
    if masked:
        dq_kernel = _dq_kernel
    else:
        def dq_kernel(qr, kr, vr, dor, lser, deltar, dqr, **kw):
            return _dq_kernel(qr, kr, vr, dor, lser, deltar, None, dqr, **kw)
    dq = pl.pallas_call(
        functools.partial(dq_kernel, blk_q=blk_q, blk_k=blk_k, seq_len=s,
                          causal=causal, scale=scale),
        grid=(b, hq, nq),
        in_specs=[
            pl.BlockSpec((1, 1, blk_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, s, d), lambda bi, hi, qi: (bi, hi // group, 0, 0)),
            pl.BlockSpec((1, 1, s, d), lambda bi, hi, qi: (bi, hi // group, 0, 0)),
            pl.BlockSpec((1, 1, blk_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, blk_q, 1), lambda bi, hi, qi: (bi, hi, qi, 0)),
            pl.BlockSpec((1, 1, blk_q, 1), lambda bi, hi, qi: (bi, hi, qi, 0)),
        ] + km_spec3,
        out_specs=pl.BlockSpec((1, 1, blk_q, d), lambda bi, hi, qi: (bi, hi, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hq, s, d), q.dtype),
        interpret=interpret,
    )(qt, kt, vt, gt, lse[..., None], dt[..., None], *km_ops).transpose(0, 2, 1, 3)

    nk = s // blk_k
    if masked:
        dkv_kernel = _dkv_kernel
    else:
        def dkv_kernel(qr, kr, vr, dor, lser, deltar, dkr, dvr, **kw):
            return _dkv_kernel(qr, kr, vr, dor, lser, deltar, None, dkr, dvr, **kw)
    # group the q-head axis by kv head and pre-chunk the q axis into blocks
    # so the kernel's dynamic indexing stays on untiled dims (see _dkv_kernel)
    nqb = s // blk_q
    qg = qt.reshape(b, hkv, group * nqb, blk_q, d)
    gg = gt.reshape(b, hkv, group * nqb, blk_q, d)
    lg = lse.reshape(b, hkv, group * nqb, 1, blk_q)
    dg = dt.reshape(b, hkv, group * nqb, 1, blk_q)
    dk, dv = pl.pallas_call(
        functools.partial(dkv_kernel, blk_q=blk_q, blk_k=blk_k, seq_len=s,
                          group=group, causal=causal, scale=scale),
        grid=(b, hkv, nk),
        in_specs=[
            pl.BlockSpec((1, 1, group * nqb, blk_q, d), lambda bi, hi, ki: (bi, hi, 0, 0, 0)),
            pl.BlockSpec((1, 1, blk_k, d), lambda bi, hi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, blk_k, d), lambda bi, hi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, group * nqb, blk_q, d), lambda bi, hi, ki: (bi, hi, 0, 0, 0)),
            pl.BlockSpec((1, 1, group * nqb, 1, blk_q), lambda bi, hi, ki: (bi, hi, 0, 0, 0)),
            pl.BlockSpec((1, 1, group * nqb, 1, blk_q), lambda bi, hi, ki: (bi, hi, 0, 0, 0)),
        ] + ([pl.BlockSpec((1, 1, blk_k), lambda bi, hi, ki: (bi, 0, ki))] if masked else []),
        out_specs=[
            pl.BlockSpec((1, 1, blk_k, d), lambda bi, hi, ki: (bi, hi, ki, 0)),
            pl.BlockSpec((1, 1, blk_k, d), lambda bi, hi, ki: (bi, hi, ki, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, s, d), k.dtype),
            jax.ShapeDtypeStruct((b, hkv, s, d), v.dtype),
        ],
        interpret=interpret,
    )(qg, kt, vt, gg, lg, dg, *km_ops)
    return dq, dk.transpose(0, 2, 1, 3), dv.transpose(0, 2, 1, 3)


# ---------------------------------------------------------------------------
# custom-VJP plumbing
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _flash_attention(q, k, v, key_mask, query_mask, causal, scale, blk_q, blk_k,
                     interpret, unroll):
    return _flash_forward(q, k, v, key_mask, query_mask, causal, scale,
                          blk_q, blk_k, with_lse=False, interpret=interpret,
                          unroll=unroll)


def _xla_reference(q, k, v, key_mask, query_mask, causal, scale):
    from blim_tpu.kernels.attention import _xla_attention

    return _xla_attention(q, k, v, key_mask, query_mask, causal, scale)


def _vjp_fwd(q, k, v, key_mask, query_mask, causal, scale, blk_q, blk_k,
             interpret, unroll):
    out, lse = _flash_forward(q, k, v, key_mask, query_mask, causal, scale,
                              blk_q, blk_k, with_lse=True, interpret=interpret,
                              unroll=unroll)
    return out, (q, k, v, key_mask, query_mask, out, lse)


def _vjp_bwd(causal, scale, blk_q, blk_k, interpret, unroll, res, g):
    q, k, v, key_mask, query_mask, out, lse = res
    dq, dk, dv = _flash_backward(q, k, v, key_mask, query_mask, out, lse, g,
                                 causal, scale, blk_q, blk_k, interpret=interpret)
    return dq, dk, dv, None, None


_flash_attention.defvjp(_vjp_fwd, _vjp_bwd)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def _pad_to_block(q, k, v, key_mask, query_mask, blk):
    """Right-pad the sequence axis to a block multiple. Padded keys are masked
    invisible; padded queries emit zeros (sliced off by the caller)."""
    b, s = q.shape[:2]
    s_pad = -(-s // blk) * blk
    pad = s_pad - s
    if pad == 0:
        return q, k, v, key_mask, query_mask, s
    zeros4 = ((0, 0), (0, pad), (0, 0), (0, 0))
    q = jnp.pad(q, zeros4)
    k = jnp.pad(k, zeros4)
    v = jnp.pad(v, zeros4)
    if key_mask is None:
        key_mask = jnp.ones((b, s), jnp.int32)
    if query_mask is None:
        query_mask = jnp.ones((b, s), jnp.int32)
    key_mask = jnp.pad(key_mask, ((0, 0), (0, pad)))
    query_mask = jnp.pad(query_mask, ((0, 0), (0, pad)))
    return q, k, v, key_mask, query_mask, s


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    key_mask: Optional[jax.Array] = None,
    query_mask: Optional[jax.Array] = None,
    causal: bool = True,
    scale: Optional[float] = None,
    blk_q: int = 128,
    blk_k: int = 128,
    interpret: bool = False,
    unroll: Optional[bool] = None,
) -> jax.Array:
    """q (B,S,Hq,D); k,v (B,S,Hkv,D); masks (B,S) -> (B,S,Hq,D).

    Sequences pad to the block size automatically (masked pads), so the
    kernel runs at arbitrary S; very small problems fall back to XLA."""
    b, s, hq, d = q.shape
    if scale is None:
        scale = d ** -0.5
    dense = key_mask is None and query_mask is None
    if not causal and dense and s * d * 4 <= 4 * 2**20 and s % 64 == 0:
        # non-causal dense (the ViT): whole-K/V stays in VMEM; iterate it in
        # static chunks, Python-unrolled, so Mosaic can overlap chunk i+1's
        # QK^T (MXU) with chunk i's softmax (VPU) — the whole-KV single block
        # serializes that chain (see scripts/abench_vit_attn.py for the A/B).
        if blk_k == 128 and blk_q == 128:  # caller left defaults
            blk_q = next((c for c in range(512, 7, -8) if s % c == 0), blk_q)
            blk_k = next(
                (c for c in range(448, s + 1, 8) if s % c == 0), s
            )
            if unroll is None:
                unroll = True
    unroll = bool(unroll) and not causal
    # small problems: kernel launch + padding overhead beats any win. Head-dim
    # gate: blocks span the full d, which Mosaic accepts for any d, but
    # sub-64 lanes waste the MXU — d=64 (the ViT) and d=128 (the LLM) pass.
    # NOTE: a d % 128 gate here once silently kicked the ViT (d=64) off its
    # 2x dense kernel — extraction regressed without any test noticing.
    if s * hq < 4096 or d % 64 != 0:
        from blim_tpu.kernels.attention import _xla_attention

        return _xla_attention(q, k, v, key_mask, query_mask, causal, scale)
    if key_mask is not None:
        key_mask = key_mask.astype(jnp.int32)
    if query_mask is not None:
        query_mask = query_mask.astype(jnp.int32)
    blk = max(blk_q, blk_k)
    if blk % min(blk_q, blk_k):
        # pad to a common multiple: both KV loops iterate range(s // blk_k),
        # so a blk_k that doesn't divide the padded length would silently
        # drop the tail KV chunk (r4 advice). The internal dense branch always
        # picks divisors; this guards external callers with custom blocks.
        import math

        blk = blk_q * blk_k // math.gcd(blk_q, blk_k)
    q, k, v, key_mask, query_mask, s_orig = _pad_to_block(
        q, k, v, key_mask, query_mask, blk
    )
    s_run = q.shape[1]
    blk_q = min(blk_q, s_run)
    blk_k = min(blk_k, s_run)
    out = _flash_attention(q, k, v, key_mask, query_mask, causal, scale,
                           blk_q, blk_k, interpret, unroll)
    return out[:, :s_orig] if s_run != s_orig else out
