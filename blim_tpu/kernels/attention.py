"""Attention dispatch: Pallas flash attention on TPU, XLA reference elsewhere.

The reference's performance-critical attention is FlashAttention-2 CUDA
(`flash_attn_varlen_func` with unpad/repad, reference:
modeling_qwen2_flash.py:52-53,528-628; `flash_attn_qkvpacked_func` for the
non-causal ViT, vision_tower_builder.py:26,109). The TPU equivalents here:

  * `multi_head_attention` — GQA attention with a key-visibility mask and
    flash-attn-varlen *output semantics*: masked query positions produce a
    zero attention output (varlen unpads them away and re-pads with zeros).
    This is what makes the CPN prior pass bit-faithful: CPN-masked tokens
    neither see nor are seen, but still ride the residual stream.
  * non-causal packed attention for the vision tower (same entry point,
    causal=False).

Numerics: softmax in float32, output in the compute dtype — matching the
reference's fp16-with-fp32-softmax (modeling_qwen2_flash.py:308).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = -1e30  # finite: fully-masked rows softmax to uniform garbage that
                  # is then zeroed by the query mask, instead of NaN.


def _xla_attention(
    q: jax.Array,              # (B, S, Hq, D)
    k: jax.Array,              # (B, S, Hkv, D)
    v: jax.Array,              # (B, S, Hkv, D)
    key_mask: Optional[jax.Array],   # (B, S) 1 = visible as key
    query_mask: Optional[jax.Array], # (B, S) 1 = emit output (varlen semantics)
    causal: bool,
    scale: float,
    window: Optional[jax.Array] = None,  # scalar: query i sees key j iff i-j <= window
) -> jax.Array:
    b, s, hq, d = q.shape
    hkv = k.shape[2]
    assert hq % hkv == 0, (hq, hkv)
    groups = hq // hkv

    qf = q.astype(jnp.float32) * scale
    # (B, Hkv, G, Sq, Sk)
    qg = qf.reshape(b, s, hkv, groups, d)
    scores = jnp.einsum("bqhgd,bkhd->bhgqk", qg, k.astype(jnp.float32))

    mask = None
    if causal:
        idx = jnp.arange(s)
        mask = idx[:, None] >= idx[None, :]          # (Sq, Sk)
        mask = mask[None, None, None]
    if window is not None:
        # sliding window (flash-attn window_size=(w, w) + causal semantics,
        # reference: modeling_qwen2_flash.py:560): key j visible to query i
        # iff i - j <= w
        idx = jnp.arange(s)
        wmask = (idx[:, None] - idx[None, :]) <= window
        wmask = wmask[None, None, None]
        mask = wmask if mask is None else jnp.logical_and(mask, wmask)
    if key_mask is not None:
        km = key_mask.astype(bool)[:, None, None, None, :]  # (B,1,1,1,Sk)
        mask = km if mask is None else jnp.logical_and(mask, km)
    if mask is not None:
        scores = jnp.where(mask, scores, _NEG_INF)

    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, v)
    out = out.reshape(b, s, hq, d)
    if query_mask is not None:
        out = out * query_mask[:, :, None, None].astype(out.dtype)
    return out


def multi_head_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    key_mask: Optional[jax.Array] = None,
    query_mask: Optional[jax.Array] = None,
    causal: bool = True,
    scale: Optional[float] = None,
    use_pallas: Optional[bool] = None,
    window: Optional[jax.Array] = None,
) -> jax.Array:
    """GQA attention. Shapes: q (B,S,Hq,D); k,v (B,S,Hkv,D) -> (B,S,Hq,D).
    `window` (scalar, may be traced): sliding-window bound — query i attends
    to key j iff i - j <= window; forces the XLA path (the flash kernel has
    no window support; sliding window is dormant in BLiM configs)."""
    if scale is None:
        scale = q.shape[-1] ** -0.5
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if window is not None:
        use_pallas = False
    if use_pallas:
        from blim_tpu.kernels.flash_attention import flash_attention

        return flash_attention(
            q, k, v, key_mask=key_mask, query_mask=query_mask, causal=causal, scale=scale
        )
    return _xla_attention(q, k, v, key_mask, query_mask, causal, scale, window)
