"""Multi-host seams, exercised without a multi-host cluster.

These paths all guard on process_count() > 1 and never run in the
single-process 8-virtual-device sim; VERDICT r1 flagged them as relying on
never being run. Here the shard arithmetic is checked against the reference's
rank sharding (reference: retrieval_utils.py:213-215), and the allgather
merges are driven through mocked process_count/process_allgather.
"""

import numpy as np
import pytest
import jax

from blim_tpu.core.mesh import make_mesh, process_shard_bounds
from blim_tpu.engine.rerank import RerankEngine


def reference_rank_rows(n: int, ws: int, rank: int):
    """The reference's loop bounds: step = n // ws + 1,
    rows [rank*step, min(n, (rank+1)*step)) (retrieval_utils.py:213-215)."""
    step = n // ws + 1
    return list(range(rank * step, min(n, (rank + 1) * step)))


@pytest.mark.parametrize("n,ws", [
    (1000, 8),      # the north-star shape
    (17, 8),        # n % ws != 0
    (5, 8),         # n < ws: late ranks get empty shards
    (8, 8),
    (0, 8),         # empty set
    (9, 2),
    (1, 1),
])
def test_process_shard_bounds_matches_reference(n, ws):
    seen = []
    for rank in range(ws):
        lo, hi = process_shard_bounds(n, ws, rank)
        assert 0 <= lo <= hi <= n
        rows = list(range(lo, hi))
        assert rows == reference_rank_rows(n, ws, rank), (n, ws, rank)
        seen.extend(rows)
    # disjoint cover of [0, n)
    assert seen == list(range(n))


def _mock_multihost(monkeypatch, world_size, gathered):
    """process_count -> world_size; process_allgather collects `gathered`."""
    from jax.experimental import multihost_utils

    monkeypatch.setattr(jax, "process_count", lambda: world_size)

    def fake_allgather(arr):
        gathered.append(np.asarray(arr))
        if len(gathered) < world_size:
            return np.stack([gathered[0]] * world_size)  # not used by caller yet
        return np.stack(gathered)

    monkeypatch.setattr(multihost_utils, "process_allgather", fake_allgather)


def test_allreduce_scores_merges_disjoint_shards(monkeypatch):
    """Each host fills its shard and contributes zeros elsewhere; the merge
    must reassemble the full vector (replaces the reference's -100-offset
    all_reduce trick, retrieval_utils.py:252-262)."""
    ws = 4
    n = 10
    rng = np.random.default_rng(0)
    full = rng.standard_normal(n).astype(np.float32)

    shards = []
    for rank in range(ws):
        lo, hi = process_shard_bounds(n, ws, rank)
        part = np.zeros(n, np.float32)
        part[lo:hi] = full[lo:hi]
        shards.append(part)

    from jax.experimental import multihost_utils

    monkeypatch.setattr(jax, "process_count", lambda: ws)
    monkeypatch.setattr(multihost_utils, "process_allgather",
                        lambda arr: np.stack(shards))
    merged = RerankEngine._allreduce_scores(shards[2])
    np.testing.assert_allclose(merged, full)


def test_engine_process_shard_uses_reference_arithmetic(monkeypatch):
    eng = RerankEngine.__new__(RerankEngine)  # only _process_shard is needed
    monkeypatch.setattr(jax, "process_count", lambda: 3)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    lo, hi = RerankEngine._process_shard(eng, 10)
    step = 10 // 3 + 1
    assert (lo, hi) == (step, min(10, 2 * step))

    monkeypatch.setattr(jax, "process_count", lambda: 1)
    assert RerankEngine._process_shard(eng, 10) == (0, 10)


def test_smoothed_value_multihost_sync(monkeypatch):
    """SmoothedValue totals must sum across hosts like the reference's
    dist.all_reduce of [count, total] (util/misc.py:48-59)."""
    from jax.experimental import multihost_utils

    from blim_tpu.utils.logging import SmoothedValue

    v = SmoothedValue()
    v.update(2.0)
    v.update(4.0)
    # pretend 3 hosts, each contributing the same (count=2, total=6)
    monkeypatch.setattr(jax, "process_count", lambda: 3)
    monkeypatch.setattr(multihost_utils, "process_allgather",
                        lambda arr: np.stack([np.asarray(arr)] * 3))
    v.synchronize_between_processes()
    assert v.count == 6
    assert v.total == 18.0
    assert v.global_avg == pytest.approx(3.0)


@pytest.mark.parametrize("n,ws", [(10, 4), (3, 4), (8, 4), (12, 5)])
def test_trainloader_shard_padding_matches_distributed_sampler(n, ws):
    """TrainLoader's epoch sharding must reproduce DistributedSampler
    semantics (reference: dataloader/__init__.py:13): every rank gets
    ceil(n/ws) items, the union covers the dataset, and padding repeats
    from the front of the permutation."""
    from blim_tpu.data.datasets import TrainLoader

    class FakeDS:
        def __len__(self):
            return n

    loaders = [TrainLoader(FakeDS(), batch_size=2, seed=7, num_shards=ws, shard=r)
               for r in range(ws)]
    per_rank = [ld.epoch_indices(epoch=1) for ld in loaders]
    size = -(-n // ws)
    assert all(len(p) == size for p in per_rank)
    union = np.concatenate(per_rank)
    # full cover
    assert set(union.tolist()) == set(range(n))
    # interleaved round-robin over one shared permutation => reconstructible
    order = np.empty(size * ws, np.int64)
    for r, p in enumerate(per_rank):
        order[r::ws] = p
    # padded tail repeats the head of the permutation (DistributedSampler)
    assert list(order[n:]) == list(order[: size * ws - n])
    # deterministic per (seed, epoch): same loader, same epoch -> same shard
    np.testing.assert_array_equal(per_rank[0], loaders[0].epoch_indices(1))


def test_all_reduce_mean_matches_reference(monkeypatch):
    """all_reduce_mean must average a host-local scalar across processes
    (reference: util/misc.py:314-322 divides the all_reduced sum by ws)."""
    from jax.experimental import multihost_utils

    from blim_tpu.utils import distributed

    assert distributed.all_reduce_mean(3.5) == 3.5  # single process: identity

    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(
        multihost_utils, "process_allgather",
        lambda arr: np.stack([np.asarray(arr) + i for i in range(4)]),
    )
    # hosts contribute 2.0, 3.0, 4.0, 5.0 -> mean 3.5
    assert distributed.all_reduce_mean(2.0) == pytest.approx(3.5)
