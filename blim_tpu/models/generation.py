"""Autoregressive generation with a KV cache (the `generate`/`chat` path).

Re-design of the reference's interactive path (reference:
modeling_videochat_flash.py:632-729 `generate`/`chat`, mm_utils.py:828-851
`KeywordsStoppingCriteria`): HF's dynamic-cache generate loop becomes a
static-shape `lax.while_loop` over a preallocated KV cache — prefill uses
`forward_collect_kv`, each decode step appends one token's K/V per layer and
attends over the masked cache. Greedy and temperature sampling.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from blim_tpu.adapters.lora import apply_dense
from blim_tpu.core.config import Qwen2Config
from blim_tpu.models import qwen2

Params = Dict[str, Any]


def _decode_layer(
    c: Qwen2Config,
    lp: Params,
    hidden: jax.Array,          # (B, 1, D)
    cache_k: jax.Array,         # (B, Smax, Kh, hd)
    cache_v: jax.Array,
    cur_len: jax.Array,         # scalar int32: tokens already in cache
    base_mask: jax.Array,       # (B, Smax) 1 = usable key slot (prompt pads = 0)
    cos: jax.Array,
    sin: jax.Array,
    ll: Optional[Params] = None,   # per-layer LoRA factors (q/k/v/o_proj)
    lora_scale: float = 0.0,
):
    B = hidden.shape[0]
    H, Kh, hd = c.num_attention_heads, c.num_key_value_heads, c.head_dim

    def lo(name):
        return None if ll is None else ll.get(name)

    x = qwen2.rms_norm(hidden, lp["input_layernorm"]["scale"], c.rms_norm_eps)
    q = apply_dense(lp["q_proj"], x, lo("q_proj"), lora_scale).reshape(B, 1, H, hd)
    k = apply_dense(lp["k_proj"], x, lo("k_proj"), lora_scale).reshape(B, 1, Kh, hd)
    v = apply_dense(lp["v_proj"], x, lo("v_proj"), lora_scale).reshape(B, 1, Kh, hd)
    q = qwen2.apply_rope(q, cos, sin)
    k = qwen2.apply_rope(k, cos, sin)

    cache_k = jax.lax.dynamic_update_slice(cache_k, k.astype(cache_k.dtype), (0, cur_len, 0, 0))
    cache_v = jax.lax.dynamic_update_slice(cache_v, v.astype(cache_v.dtype), (0, cur_len, 0, 0))

    smax = cache_k.shape[1]
    visible = jnp.logical_and(jnp.arange(smax)[None, :] <= cur_len, base_mask > 0)
    groups = H // Kh
    qf = q.astype(jnp.float32).reshape(B, Kh, groups, hd) * (hd ** -0.5)
    scores = jnp.einsum("bhgd,bshd->bhgs", qf, cache_k.astype(jnp.float32))
    scores = jnp.where(visible[:, None, None, :], scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1).astype(cache_v.dtype)
    out = jnp.einsum("bhgs,bshd->bhgd", probs, cache_v).reshape(B, 1, H * hd)
    hidden = hidden + apply_dense(lp["o_proj"], out, lo("o_proj"), lora_scale)

    x = qwen2.rms_norm(hidden, lp["post_attention_layernorm"]["scale"], c.rms_norm_eps)
    gate = jax.nn.silu(x @ lp["gate_proj"]["kernel"])
    up = x @ lp["up_proj"]["kernel"]
    hidden = hidden + (gate * up) @ lp["down_proj"]["kernel"]
    return hidden, cache_k, cache_v


def decode_one(
    params: Params,
    config: Qwen2Config,
    token_embed: jax.Array,     # (B, 1, D)
    cache: Dict[str, jax.Array],  # k/v (L, B, Smax, Kh, hd)
    cur_len: jax.Array,
    base_mask: jax.Array,       # (B, Smax)
    position: jax.Array,        # (B, 1) RoPE position of this token
    lora: Optional[Params] = None,
    lora_scale: float = 0.0,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """One decode step across all layers; returns (hidden (B,1,D), new cache)."""
    cos, sin = qwen2.rope_cos_sin(position, config.head_dim, config.rope_theta)

    if lora is None:
        def body(hidden, xs):
            lp, ck, cv = xs
            hidden, ck, cv = _decode_layer(config, lp, hidden, ck, cv, cur_len, base_mask, cos, sin)
            return hidden, (ck, cv)

        xs = (params["layers"], cache["k"], cache["v"])
    else:
        def body(hidden, xs):
            lp, ll, ck, cv = xs
            hidden, ck, cv = _decode_layer(
                config, lp, hidden, ck, cv, cur_len, base_mask, cos, sin, ll, lora_scale
            )
            return hidden, (ck, cv)

        xs = (params["layers"], lora["layers"], cache["k"], cache["v"])

    hidden, (ks, vs) = jax.lax.scan(body, token_embed, xs)
    hidden = qwen2.rms_norm(hidden, params["norm"]["scale"], config.rms_norm_eps)
    return hidden, {"k": ks, "v": vs}


def generate_tokens(
    params: Params,
    config: Qwen2Config,
    inputs_embeds: jax.Array,        # (B, P, D) prompt embeddings (video spliced)
    attention_mask: jax.Array,       # (B, P)
    max_new_tokens: int,
    eos_token_ids: Sequence[int],
    temperature: float = 0.0,
    rng: Optional[jax.Array] = None,
    lora: Optional[Params] = None,
    lora_scale: float = 0.0,
) -> jax.Array:
    """Prefill + greedy/sampled decode. Returns (B, max_new_tokens) int32
    (positions after an EOS are padded with the EOS id).

    A fine-tuned model generates through its adapters: LoRA factors apply in
    prefill, every decode step, and the lm_head (the reference always
    generates through the peft-wrapped model, main.py:100-105 +
    modeling_videochat_flash.py:632-654)."""
    B, P, D = inputs_embeds.shape
    c = config
    smax = P + max_new_tokens

    hidden, kv = qwen2.forward_collect_kv(
        params, c, inputs_embeds, attention_mask, lora=lora, lora_scale=lora_scale
    )
    pad_tail = lambda x: jnp.pad(x, ((0, 0), (0, 0), (0, max_new_tokens), (0, 0), (0, 0)))
    cache = {"k": pad_tail(kv["k"]), "v": pad_tail(kv["v"])}
    base_mask = jnp.concatenate(
        [attention_mask.astype(jnp.int32), jnp.ones((B, max_new_tokens), jnp.int32)], axis=1
    )

    eos = jnp.asarray(list(eos_token_ids), jnp.int32)
    last_hidden = hidden[:, -1:]
    logits0 = qwen2.lm_logits(params, last_hidden, c, lora, lora_scale)[:, 0]
    if rng is None:
        rng = jax.random.key(0)

    def select(logits, key):
        if temperature <= 0.0:
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
        return jax.random.categorical(key, logits / temperature, axis=-1).astype(jnp.int32)

    tok0 = select(logits0, jax.random.fold_in(rng, 0))
    tokens0 = jnp.full((B, max_new_tokens), eos[0], jnp.int32)
    tokens0 = tokens0.at[:, 0].set(tok0)
    done0 = jnp.isin(tok0, eos)

    def cond(state):
        step, _, _, done, _ = state
        return jnp.logical_and(step < max_new_tokens - 1, ~jnp.all(done))

    def body(state):
        step, tokens, cache, done, key = state
        cur = tokens[:, step]
        emb = qwen2.embed_tokens(params, cur[:, None])
        pos = (P + step) * jnp.ones((B, 1), jnp.int32)
        hidden, cache = decode_one(
            params, c, emb, cache, P + step, base_mask, pos, lora, lora_scale
        )
        logits = qwen2.lm_logits(params, hidden, c, lora, lora_scale)[:, 0]
        nxt = select(logits, jax.random.fold_in(key, step + 1))
        nxt = jnp.where(done, eos[0], nxt)
        tokens = tokens.at[:, step + 1].set(nxt)
        done = jnp.logical_or(done, jnp.isin(nxt, eos))
        return step + 1, tokens, cache, done, key

    _, tokens, _, _, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(0), tokens0, cache, done0, rng)
    )
    return tokens


class KeywordsStoppingCriteria:
    """Host-side keyword stop check for decoded text (the reference stops HF
    generate on decoded keywords, mm_utils.py:828-851). Our device loop stops
    on EOS ids; this class covers non-token-aligned keywords when trimming."""

    def __init__(self, keywords: List[str], tokenizer):
        self.keywords = keywords
        self.tokenizer = tokenizer

    def trim(self, text: str) -> str:
        for kw in self.keywords:
            idx = text.find(kw)
            if idx >= 0:
                text = text[:idx]
        return text.strip()
