"""Layer-wise learning-rate decay (BEiT-style).

Parity with the reference's util/lr_decay.py:15-76 (present but unused by its
main.py — kept for capability parity): parameters of deeper layers get larger
learning rates, scale = decay^(num_layers + 1 - layer_id). With stacked-layer
pytrees the scale is a per-layer vector broadcast along the stacking axis.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax


def layer_scale_vector(num_layers: int, layer_decay: float) -> jnp.ndarray:
    """scale[i] = decay^(L + 1 - (i + 1)) for stacked layer index i (the
    reference assigns transformer block b to layer_id b+1)."""
    return jnp.asarray(
        [layer_decay ** (num_layers + 1 - (i + 1)) for i in range(num_layers)],
        jnp.float32,
    )


def stacked_tree_scales(tree: Any, num_layers: int, layer_decay: float) -> Any:
    """Per-leaf multiplier arrays for a pytree whose leaves are stacked along
    a leading layer axis of size `num_layers` (e.g. the LLM LoRA factors).
    Leaves without that leading axis get the head scale (1.0)."""
    vec = layer_scale_vector(num_layers, layer_decay)

    def leaf_scale(x):
        if x.ndim >= 1 and x.shape[0] == num_layers:
            return vec.reshape((num_layers,) + (1,) * (x.ndim - 1))
        return jnp.asarray(1.0, jnp.float32)

    return jax.tree_util.tree_map(leaf_scale, tree)


def scale_updates_by(scales: Any) -> optax.GradientTransformation:
    """optax transform multiplying updates elementwise by `scales` — chain it
    before the lr scaling to apply layer-wise decay."""

    def init(params):
        return optax.EmptyState()

    def update(updates, state, params=None):
        return jax.tree_util.tree_map(lambda u, s: u * s, updates, scales), state

    return optax.GradientTransformation(init, update)
