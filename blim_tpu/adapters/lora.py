"""LoRA adapters as pure pytree transforms (replaces peft).

The reference installs peft LoRA (r=8, alpha=32, dropout=0.05) on the LLM's
q/k/v/o_proj + lm_head and on the projector MLP Linears
(reference: main.py:100-105). Here a LoRA adapter is just a parallel pytree
of {a: (in, r), b: (r, out)} factors; dense layers apply
    y = x @ W + b  +  (alpha/r) * dropout(x) @ A @ B
A is Kaiming-uniform initialized, B zeros (so the adapter starts as a no-op),
matching standard LoRA initialization.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LoraConfig:
    r: int = 8
    alpha: int = 32
    dropout: float = 0.05

    @property
    def scale(self) -> float:
        return self.alpha / self.r


def init_lora_factors(key: jax.Array, din: int, dout: int, r: int, dtype=jnp.float32, stack: int = 0) -> Params:
    """A ~ Kaiming-uniform(fan_in=din), B = 0."""
    bound = 1.0 / math.sqrt(din)
    a_shape = (stack, din, r) if stack else (din, r)
    b_shape = (stack, r, dout) if stack else (r, dout)
    return {
        "a": jax.random.uniform(key, a_shape, jnp.float32, -bound, bound).astype(dtype),
        "b": jnp.zeros(b_shape, dtype),
    }


def apply_dense(
    p: Params,
    x: jax.Array,
    lora: Optional[Params] = None,
    scale: float = 0.0,
    dropout: float = 0.0,
    rng: Optional[jax.Array] = None,
) -> jax.Array:
    """y = x @ kernel (+ bias) (+ scaled LoRA delta)."""
    y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    if lora is not None:
        xd = x
        if dropout > 0.0 and rng is not None:
            keep = jax.random.bernoulli(rng, 1.0 - dropout, x.shape)
            xd = jnp.where(keep, x / (1.0 - dropout), 0.0).astype(x.dtype)
        # LoRA math in the factors' (fp32) precision, result in the base dtype
        # so bf16 activations don't get promoted through the whole stack
        y = y + (((xd @ lora["a"]) @ lora["b"]) * scale).astype(y.dtype)
    return y


def lora_delta(lora: Params, x: jax.Array, scale: float, dropout: float = 0.0, rng=None) -> jax.Array:
    """Just the LoRA delta (for call sites that fuse the base matmul themselves)."""
    xd = x
    if dropout > 0.0 and rng is not None:
        keep = jax.random.bernoulli(rng, 1.0 - dropout, x.shape)
        xd = jnp.where(keep, x / (1.0 - dropout), 0.0).astype(x.dtype)
    return ((xd @ lora["a"]) @ lora["b"]) * scale


def init_llm_lora(key: jax.Array, config, lora_cfg: LoraConfig, dtype=jnp.float32) -> Params:
    """LoRA factors for the Qwen2 targets: q/k/v/o_proj (stacked per layer)
    and lm_head (reference: main.py:104)."""
    c = config
    L, D = c.num_hidden_layers, c.hidden_size
    H, K, hd = c.num_attention_heads, c.num_key_value_heads, c.head_dim
    keys = jax.random.split(key, 5)
    return {
        "layers": {
            "q_proj": init_lora_factors(keys[0], D, H * hd, lora_cfg.r, dtype, stack=L),
            "k_proj": init_lora_factors(keys[1], D, K * hd, lora_cfg.r, dtype, stack=L),
            "v_proj": init_lora_factors(keys[2], D, K * hd, lora_cfg.r, dtype, stack=L),
            "o_proj": init_lora_factors(keys[3], H * hd, D, lora_cfg.r, dtype, stack=L),
        },
        "lm_head": init_lora_factors(keys[4], D, c.vocab_size, lora_cfg.r, dtype),
    }


def init_projector_lora(key: jax.Array, mm_hidden: int, hidden: int, lora_cfg: LoraConfig, dtype=jnp.float32) -> Params:
    """LoRA for the projector MLPs. The reference LoRA's `mlp` then deep-copies
    it into `tvg_mlp` (main.py:100-102), so both start from the same factors."""
    k1, k2 = jax.random.split(key)
    mlp = {
        "fc1": init_lora_factors(k1, mm_hidden, hidden, lora_cfg.r, dtype),
        "fc2": init_lora_factors(k2, hidden, hidden, lora_cfg.r, dtype),
    }
    tvg = jax.tree_util.tree_map(lambda x: x.copy(), mlp)
    return {"mlp": mlp, "tvg_mlp": tvg}


def merge_lora_into_dense(dense: Params, lora: Params, scale: float) -> Params:
    """Fold a LoRA adapter into the base kernel (for export/serving)."""
    delta = jnp.einsum("...dr,...ro->...do", lora["a"].astype(jnp.float32), lora["b"].astype(jnp.float32)) * scale
    out = dict(dense)
    out["kernel"] = (dense["kernel"].astype(jnp.float32) + delta).astype(dense["kernel"].dtype)
    return out
