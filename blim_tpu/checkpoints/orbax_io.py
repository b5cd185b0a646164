"""Checkpoint save/load via Orbax.

Parity with the reference's checkpointing (reference: util/misc.py:276-311,
main.py:125-128,164-183): trainable-params-only state (LoRA adapters +
visual_head) + optimizer state + epoch + run args, best-checkpoint selection,
and a strict parameter-count check on resume.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _count_params(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def save_checkpoint(
    output_dir: str,
    name: str,
    trainable: Any,
    opt_state: Any,
    epoch: int,
    args: Optional[Dict[str, Any]] = None,
) -> str:
    """Write {output_dir}/{name} with the trainable subtree + opt state.

    Rank-0-only like the reference (util/misc.py:276-300)."""
    from blim_tpu.utils.distributed import is_main_process

    path = os.path.abspath(os.path.join(output_dir, name))
    if not is_main_process():
        return path

    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    state = {
        "model": jax.tree_util.tree_map(np.asarray, trainable),
        "opt_state": jax.tree_util.tree_map(np.asarray, opt_state),
    }
    ckptr.save(path, state, force=True)
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(
            {
                "epoch": int(epoch),
                "n_trainable": _count_params(trainable),
                "args": args or {},
            },
            f,
        )
    return path


def load_checkpoint(path: str, expected_trainable: Any = None):
    """Returns (trainable, opt_state, epoch). With `expected_trainable`,
    asserts the exact trainable parameter count like the reference's resume
    check (main.py:128)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    state = ckptr.restore(os.path.abspath(path))
    meta_path = os.path.join(path, "meta.json")
    epoch = 0
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            epoch = json.load(f).get("epoch", 0)
    trainable = state["model"]
    if expected_trainable is not None:
        got, want = _count_params(trainable), _count_params(expected_trainable)
        assert got == want, f"trainable param count mismatch: ckpt {got} != model {want}"
    return trainable, state.get("opt_state"), epoch
