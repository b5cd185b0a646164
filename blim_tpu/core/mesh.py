"""Device mesh + sharding helpers.

The reference scales with NCCL/DDP (reference: util/misc.py:199-229, main.py:141-143).
The TPU-native equivalent is a `jax.sharding.Mesh` with named axes; XLA inserts
the collectives (psum/all_gather over ICI) from sharding annotations.

Axes:
  data  — batch/data parallelism (train batches; rerank query-grid rows)
  model — tensor parallelism over attention heads / MLP hidden (optional, for
          HBM budgets where a 7B does not fit on one chip)
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a 2-D (data, model) mesh over the available devices.

    With `data=None`, uses all devices not consumed by the model axis.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, f"mesh {data}x{model} != {n} devices"
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def data_sharded(mesh: Mesh, rank: int = 1) -> NamedSharding:
    """Shard the leading axis over the data axis; replicate the rest."""
    return NamedSharding(mesh, P(DATA_AXIS, *([None] * (rank - 1))))


def local_mesh() -> Mesh:
    """Single-process mesh over all local devices, data-parallel only."""
    return make_mesh()


def process_shard_bounds(n: int, num_shards: int, shard: int) -> tuple[int, int]:
    """Contiguous [start, end) row range for `shard` of `num_shards`.

    Same arithmetic as the reference's rank sharding of the rerank grid
    (reference: retrieval_utils.py:213-215): step = n // num_shards + 1.
    """
    step = n // num_shards + 1
    start = min(shard * step, n)
    end = min(n, start + step)
    return start, max(start, end)
