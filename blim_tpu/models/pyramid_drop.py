"""PyramidDrop: in-LLM video-token pruning, TPU-native (static shapes).

The reference's PyramidDrop (reference: modeling_qwen2_flash.py:1081-1357
`video_level_compress`) drops low-attention video tokens at configured
layers: rank the video-token span by the attention the last instruction
token pays it (computed with the NEXT layer's q/k projections), keep a
ratio, and repack the sequence. It is config-gated OFF in every BLiM config
(reference: modeling_videochat_flash.py:340-353 sets an empty layer list)
but is part of the model family's capability surface.

TPU redesign — the reference repacks ragged per-example sequences; here every
shape is static because the splice layout is static:

  * the video block sits at a static [video_start, video_start + n_video)
    window and per-stage keep lengths int(n_video * ratio) are static, so
    each stage's output length is a compile-time constant;
  * the layer stack runs as per-segment lax.scan over sliced stacked layers;
    between segments one static-shape gather drops tokens;
  * ranking follows the reference exactly: layer `rank_layer`'s
    input_layernorm + q/k projections, RoPE at the current positions, mean
    softmax attention from the query position(s) over the video window
    (training uses the tokens before each answer span; our layouts make that
    a static position);
  * after each drop, positions renumber 0..len-1 like the reference's repack
    (right-padded layouts only, same restriction as the reference).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from blim_tpu.core.config import Qwen2Config
from blim_tpu.models.qwen2 import _layer, apply_rope, rms_norm, rope_cos_sin

Params = dict


def _slice_layers(layers: Params, lo: int, hi: int) -> Params:
    return jax.tree_util.tree_map(lambda x: x[lo:hi], layers)


def _run_segment(
    params_layers: Params,
    config: Qwen2Config,
    hidden: jax.Array,
    attention_mask: Optional[jax.Array],
    position_ids: jax.Array,
    lora_layers: Optional[Params],
    lora_scale: float,
    use_pallas: Optional[bool],
    remat: bool,
) -> jax.Array:
    cos, sin = rope_cos_sin(position_ids, config.head_dim, config.rope_theta)

    # statics closed over, never traced positionally through jax.checkpoint
    def layer_fn(lp, h, ll=None):
        return _layer(config, lp, h, cos, sin, attention_mask, attention_mask,
                      use_pallas, ll, lora_scale)

    if remat:
        layer_fn = jax.checkpoint(layer_fn)

    if lora_layers is None:
        def body(h, lp):
            return layer_fn(lp, h), None

        hidden, _ = jax.lax.scan(body, hidden, params_layers)
    else:
        def body(h, xs):
            lp, ll = xs
            return layer_fn(lp, h, ll), None

        hidden, _ = jax.lax.scan(body, hidden, (params_layers, lora_layers))
    return hidden


def rank_video_tokens(
    layer_params: Params,          # rank layer's params (unstacked)
    config: Qwen2Config,
    hidden: jax.Array,             # (B, S, D) — pre-layernorm residual stream
    attention_mask: Optional[jax.Array],   # (B, S)
    position_ids: jax.Array,       # (B, S)
    query_pos: int,                # static: the last instruction token
    video_start: int,
    n_video: int,
) -> jax.Array:
    """Mean-head attention the query token pays each video token -> (B, n_video)
    (reference: modeling_qwen2_flash.py:1199-1287 'attention' ranking)."""
    c = config
    B, S, D = hidden.shape
    H, Kh, hd = c.num_attention_heads, c.num_key_value_heads, c.head_dim
    x = rms_norm(hidden, layer_params["input_layernorm"]["scale"], c.rms_norm_eps)
    q = (x @ layer_params["q_proj"]["kernel"] + layer_params["q_proj"]["bias"])
    k = (x @ layer_params["k_proj"]["kernel"] + layer_params["k_proj"]["bias"])
    q = q.reshape(B, S, H, hd)
    k = k.reshape(B, S, Kh, hd)
    cos, sin = rope_cos_sin(position_ids, hd, c.rope_theta)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    qt = q[:, query_pos]                       # (B, H, hd)
    group = H // Kh
    qt = qt.reshape(B, Kh, group, hd).astype(jnp.float32) * (hd ** -0.5)
    scores = jnp.einsum("bhgd,bshd->bhgs", qt, k.astype(jnp.float32))  # (B,Kh,G,S)

    causal = jnp.arange(S)[None] <= query_pos  # the query attends causally
    visible = causal
    if attention_mask is not None:
        visible = jnp.logical_and(visible, attention_mask > 0)
    scores = jnp.where(visible[:, None, None, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    mean_heads = probs.reshape(B, H, S).mean(axis=1)        # (B, S)
    return jax.lax.dynamic_slice_in_dim(mean_heads, video_start, n_video, axis=1)


def pdrop_forward_hidden(
    params: Params,
    config: Qwen2Config,
    inputs_embeds: jax.Array,      # (B, S, D), right-padded static layout
    attention_mask: Optional[jax.Array],
    video_start: int,
    n_video: int,
    query_pos: int,                # last instruction token (static in our layouts)
    layer_list: Sequence[int],     # 1-based rank layers (reference semantics)
    ratio_list: Sequence[float],   # len == len(layer_list) + 1, leading 1.0
    compress_type: str = "attention",   # attention | uniform | uniform0_attention
    lora: Optional[Params] = None,
    lora_scale: float = 0.0,
    use_pallas: Optional[bool] = None,
    remat: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Decoder stack with staged video-token dropping.

    Returns (post-norm hidden (B, S_final, D), kept token index map
    (B, S_final) into the ORIGINAL sequence — the static-shape analogue of
    the reference's repacked labels/masks)."""
    assert len(ratio_list) == len(layer_list) + 1, (layer_list, ratio_list)
    c = config
    B, S, D = inputs_embeds.shape
    hidden = inputs_embeds
    position_ids = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    index_map = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    mask = attention_mask
    lora_layers = None if lora is None else lora["layers"]

    def seg_lora(lo, hi):
        return None if lora_layers is None else _slice_layers(lora_layers, lo, hi)

    cur_video = n_video
    cur_vstart = video_start
    cur_qpos = query_pos
    prev = 0
    for stage, rank_layer in enumerate(layer_list):
        # run layers [prev, rank_layer) — the reference compresses after
        # layer rank_layer-1 completes, ranking with layers[rank_layer]
        hidden = _run_segment(
            _slice_layers(params["layers"], prev, rank_layer), c, hidden, mask,
            position_ids, seg_lora(prev, rank_layer), lora_scale, use_pallas, remat,
        )
        prev = rank_layer

        keep = int(n_video * ratio_list[stage + 1])
        if keep >= cur_video:
            continue
        stage_type = compress_type
        if compress_type == "uniform0_attention":
            stage_type = "uniform" if stage == 0 else "attention"

        if stage_type == "attention":
            rank_params = jax.tree_util.tree_map(lambda x: x[rank_layer], params["layers"])
            weights = rank_video_tokens(
                rank_params, c, hidden, mask, position_ids,
                cur_qpos, cur_vstart, cur_video,
            )                                           # (B, cur_video)
            _, top = jax.lax.top_k(weights, keep)
            top = jnp.sort(top, axis=-1)                # (B, keep), original order
        elif stage_type == "uniform":
            lin = jnp.linspace(0, cur_video - 1, keep).astype(jnp.int32)
            top = jnp.broadcast_to(lin[None], (B, keep))
        else:
            raise NotImplementedError(stage_type)

        # static-shape repack: [prefix | kept video | suffix]
        gather = jnp.concatenate(
            [
                jnp.broadcast_to(jnp.arange(cur_vstart)[None], (B, cur_vstart)),
                top + cur_vstart,
                jnp.broadcast_to(
                    jnp.arange(cur_vstart + cur_video, hidden.shape[1])[None],
                    (B, hidden.shape[1] - cur_vstart - cur_video),
                ),
            ],
            axis=1,
        )                                               # (B, S_new)
        hidden = jnp.take_along_axis(hidden, gather[..., None], axis=1)
        index_map = jnp.take_along_axis(index_map, gather, axis=1)
        if mask is not None:
            mask = jnp.take_along_axis(mask, gather, axis=1)
        s_new = gather.shape[1]
        # repacked positions restart at 0 like the reference (right padding)
        position_ids = jnp.broadcast_to(jnp.arange(s_new)[None], (B, s_new))
        dropped = cur_video - keep
        cur_qpos -= dropped
        cur_video = keep

    hidden = _run_segment(
        _slice_layers(params["layers"], prev, c.num_hidden_layers), c, hidden,
        mask, position_ids, seg_lora(prev, c.num_hidden_layers), lora_scale,
        use_pallas, remat,
    )
    return rms_norm(hidden, params["norm"]["scale"], c.rms_norm_eps), index_map
