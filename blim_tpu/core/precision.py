"""Precision policy for TPU.

The reference runs fp16 autocast with a CUDA GradScaler (reference:
training_utils.py:57, util/misc.py:232-273) and fp32 logits
(modeling_qwen2_flash.py:1453). On TPU the native fast dtype is bfloat16:
same exponent range as fp32, so no loss scaling is required. Policy:

  * parameters + activations: bfloat16
  * attention softmax, RMSNorm statistics, logits, CE: float32
  * `visual_head` and score math: float32 (reference keeps visual_head fp32,
    main.py:108-111)
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    param_dtype: jnp.dtype = jnp.bfloat16
    compute_dtype: jnp.dtype = jnp.bfloat16
    accum_dtype: jnp.dtype = jnp.float32


DEFAULT = Policy()
FP32 = Policy(param_dtype=jnp.float32, compute_dtype=jnp.float32)


def cast_pytree(tree, dtype):
    """Cast all inexact leaves of a pytree to `dtype` (ints left untouched)."""
    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(cast, tree)
