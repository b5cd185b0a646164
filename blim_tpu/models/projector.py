"""ToMe token-compression projector (tome16_mlp_hd64).

Re-implementation of the reference projector
(reference: videochat_flash/mm_projector_builder.py:6-175): bipartite soft
matching merges vision tokens down to 16/frame, then a 2-layer GELU MLP maps
into the LLM embedding space. Two MLPs exist: `mlp` (VTG path) and `tvg_mlp`
(TVG path, deep-copied + LoRA'd at train setup, reference: main.py:100-102).

TPU notes: the merge schedule is a function of *static* shapes, so the
while-loop over rounds unrolls at trace time; each round is argsort +
gathers + one batched scatter-add — all static-shape XLA ops. Sorting uses
jnp.argsort on the negated keys (stable), matching torch's descending sort
on distinct float scores.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


def merge_schedule(num_tokens: int, target: int) -> List[int]:
    """Tokens removed per ToMe round (reference: mm_projector_builder.py:106-115).

    Halve until within one round of the target, then remove the remainder.
    """
    assert num_tokens > target, f"{num_tokens} should be greater than {target}"
    r_list: List[int] = []
    t = num_tokens
    while t != target:
        if t - target <= t // 2:
            r_list.append(t - target)
            break
        r_list.append(t // 2)
        t = t - t // 2
    return r_list


def _bipartite_merge_indices(metric: jax.Array, r: int) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Compute ToMe merge indices for one round.

    metric: (B, T, C). Returns (unm_idx (B, Ta-r), src_idx (B, r), dst_idx (B, r))
    where a = even-position tokens, b = odd-position tokens, and src tokens
    (from a) merge into dst tokens (in b).
    """
    t = metric.shape[1]
    r = min(r, t // 2)
    assert r > 0, r

    metric = metric / (jnp.linalg.norm(metric, axis=-1, keepdims=True) + 1e-12)
    a, b = metric[:, ::2, :], metric[:, 1::2, :]
    scores = jnp.einsum("bic,bjc->bij", a, b)  # (B, Ta, Tb)

    node_max = jnp.max(scores, axis=-1)
    node_idx = jnp.argmax(scores, axis=-1)
    edge_idx = jnp.argsort(-node_max, axis=-1)  # descending similarity

    src_idx = edge_idx[:, :r]
    unm_idx = edge_idx[:, r:]
    dst_idx = jnp.take_along_axis(node_idx, src_idx, axis=-1)
    return unm_idx, src_idx, dst_idx


def _merge_sum(x: jax.Array, unm_idx: jax.Array, src_idx: jax.Array, dst_idx: jax.Array) -> jax.Array:
    """Apply one merge round with sum reduction. x: (B, T, C)."""
    src_all, dst_all = x[:, ::2, :], x[:, 1::2, :]

    def one(src, dst, unm_i, src_i, dst_i):
        unm = src[unm_i]
        moved = src[src_i]
        dst = dst.at[dst_i].add(moved)
        return jnp.concatenate([unm, dst], axis=0)

    return jax.vmap(one)(src_all, dst_all, unm_idx, src_idx, dst_idx)


def merge_tokens(x: jax.Array, target_num_token: int, num_attention_heads: int) -> jax.Array:
    """ToMe-compress (B, T, C) to (B, target, C) with size-weighted averaging
    (reference: merge_wavg, mm_projector_builder.py:62-76; merge_tokens :99-130)."""
    b, t, c = x.shape
    size = jnp.ones((b, t, 1), x.dtype)
    head_dim = c // num_attention_heads

    for r in merge_schedule(t, target_num_token):
        metric = x.reshape(b, x.shape[1], num_attention_heads, head_dim).mean(axis=2)
        unm_idx, src_idx, dst_idx = _bipartite_merge_indices(metric, r)
        x = _merge_sum(x * size, unm_idx, src_idx, dst_idx)
        size = _merge_sum(size, unm_idx, src_idx, dst_idx)
        x = x / size
    return x


# ---------------------------------------------------------------------------
# Projector module (ToMe + MLPs)
# ---------------------------------------------------------------------------

def init_params(key: jax.Array, mm_hidden: int, hidden: int, dtype=jnp.float32) -> Params:
    k1, k2, k3, k4 = jax.random.split(key, 4)

    def lin(k, din, dout):
        scale = (2.0 / (din + dout)) ** 0.5
        return {
            "kernel": (jax.random.normal(k, (din, dout), jnp.float32) * scale).astype(dtype),
            "bias": jnp.zeros((dout,), dtype),
        }

    return {
        "mlp": {"fc1": lin(k1, mm_hidden, hidden), "fc2": lin(k2, hidden, hidden)},
        "tvg_mlp": {"fc1": lin(k3, mm_hidden, hidden), "fc2": lin(k4, hidden, hidden)},
    }


def mlp_apply(p: Params, x: jax.Array, lora: Optional[Params] = None, dropout_rng=None, lora_scale: float = 0.0, lora_dropout: float = 0.0) -> jax.Array:
    """Linear -> exact GELU -> Linear (reference: mm_projector_builder.py:88-93),
    with optional LoRA deltas on both Linears (reference LoRA targets modules
    "0" and "2" of the Sequential, main.py:100)."""
    from blim_tpu.adapters.lora import apply_dense  # local import to avoid cycle

    x = apply_dense(p["fc1"], x, lora=None if lora is None else lora.get("fc1"),
                    scale=lora_scale, dropout=lora_dropout, rng=dropout_rng)
    x = jax.nn.gelu(x, approximate=False)
    x = apply_dense(p["fc2"], x, lora=None if lora is None else lora.get("fc2"),
                    scale=lora_scale, dropout=lora_dropout, rng=dropout_rng)
    return x


def compress_image_tokens(
    image_features: jax.Array,    # (B, patches, C) single-image ViT features
    num_attention_heads: int,
    target: int = 64,
) -> jax.Array:
    """Single-image ToMe path: 64 tokens per image (the `compress=False`
    image branch, reference: mm_projector_builder.py:149-152)."""
    return merge_tokens(image_features, target, num_attention_heads)


def compress_clip_tokens(
    clip_features: jax.Array,     # (clips, local_frames * patches, C) raw ViT features
    tokens_per_frame: int,
    local_num_frames: int,
    num_attention_heads: int,
) -> jax.Array:
    """Vision-tower output -> ToMe-compressed cached features
    (the `return_video_feature=True` path that extract.py caches;
    reference: mm_projector_builder.py:134-154)."""
    target = tokens_per_frame * local_num_frames
    return merge_tokens(clip_features, target, num_attention_heads)


def project_vtg(params: Params, feats: jax.Array, lora: Optional[Params] = None, **kw) -> jax.Array:
    """Cached features (..., clips, T, mm) -> VTG embeddings (..., clips*T, D)
    (projector `mlp` + flatten, reference: modeling_videochat_flash.py:243 else-branch)."""
    out = mlp_apply(params["mlp"], feats, lora=None if lora is None else lora.get("mlp"), **kw)
    return out.reshape(*out.shape[:-3], out.shape[-3] * out.shape[-2], out.shape[-1])


def project_tvg(params: Params, feats: jax.Array, lora: Optional[Params] = None, **kw) -> jax.Array:
    """Cached features (..., clips, T, mm) -> TVG embeddings (..., clips, D):
    `tvg_mlp` then mean over the token axis (reference:
    modeling_videochat_flash.py:243 tvg-branch — mean AFTER the MLP)."""
    out = mlp_apply(params["tvg_mlp"], feats, lora=None if lora is None else lora.get("tvg_mlp"), **kw)
    return out.mean(axis=-2)
