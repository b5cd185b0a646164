"""Multi-host runtime helpers.

The reference bootstraps NCCL process groups from env/SLURM/OMPI vars and
monkey-patches print to rank 0 (reference: util/misc.py:153-229). The JAX
equivalent: `jax.distributed.initialize()` (auto-discovers the coordinator on
TPU pods) and `jax.process_index()` / `jax.process_count()`.
"""

from __future__ import annotations

import builtins
import datetime
import functools
import os


def init_distributed_mode(force_master_print: bool = False) -> None:
    """Initialize multi-host JAX if running under a multi-process launcher.

    On Cloud TPU pods, `jax.distributed.initialize()` discovers peers from
    the metadata service; elsewhere it uses JAX_COORDINATOR_ADDRESS etc.
    Single-process runs skip initialization entirely.
    """
    import jax

    if any(k in os.environ for k in ("JAX_COORDINATOR_ADDRESS", "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES")):
        try:
            jax.distributed.initialize()
        except Exception as e:  # already initialized or single host
            print(f"jax.distributed.initialize skipped: {e}")
    setup_for_distributed(is_main_process() or force_master_print)


def get_rank() -> int:
    import jax

    return jax.process_index()


def get_world_size() -> int:
    import jax

    return jax.process_count()


def is_main_process() -> bool:
    return get_rank() == 0


def setup_for_distributed(is_master: bool) -> None:
    """Rank-0-only printing with timestamps (reference: util/misc.py:153-167)."""
    builtin_print = builtins.print

    @functools.wraps(builtin_print)
    def tprint(*args, **kwargs):
        force = kwargs.pop("force", False)
        if is_master or force:
            now = datetime.datetime.now().strftime("%Y-%m-%d %H:%M:%S")
            builtin_print(f"[{now}]", *args, **kwargs)

    builtins.print = tprint


def barrier() -> None:
    """Cross-host sync point (the reference's dist.barrier)."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("blim_tpu_barrier")


def all_reduce_mean(x: float) -> float:
    """Mean of a host-local scalar across processes (reference:
    util/misc.py:314-322 — used for the per-iteration reduced loss).
    Single-process runs return the value unchanged."""
    import jax

    ws = jax.process_count()
    if ws <= 1:
        return float(x)
    import numpy as np
    from jax.experimental import multihost_utils

    vals = multihost_utils.process_allgather(np.asarray([x], np.float64))
    return float(np.asarray(vals).sum() / ws)
