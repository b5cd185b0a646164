"""Run presets + TrainLoader sharding semantics."""

import argparse

import numpy as np

from blim_tpu.data.datasets import RetrievalDataset, TrainLoader
from blim_tpu.data.features import FeatureStore
from blim_tpu.pipelines.configs import TRAIN_PRESETS, ZEROSHOT_PRESETS, apply_preset


def _args(dataset):
    ns = argparse.Namespace(dataset=dataset, batch_size=0, epochs=0, lr=0.0,
                            accum_iter=0, topk=0, cpn=False, alpha=None, c=None,
                            batch_size_eval=0, warmup_epochs=0, weight_decay=0.0)
    return ns


def test_train_presets_match_reference_readme():
    a = apply_preset(_args("MSRVTT"))
    assert (a.batch_size, a.epochs, a.lr, a.accum_iter) == (4, 3, 1e-4, 16)
    assert a.alpha == [0.0, 0.9] and a.c == [1.0, 0.6, 0.8, 0.4]
    a = apply_preset(_args("LSMDC"))
    assert a.accum_iter == 8 and a.alpha == [0.2, 1.0]


def test_zeroshot_presets():
    a = apply_preset(_args("DiDeMo"), zeroshot=True)
    assert a.alpha == [0.0, 0.9] and a.c == [1.0, 0.0, 0.9, 0.9]
    assert set(ZEROSHOT_PRESETS) == set(TRAIN_PRESETS)


def _dataset(n=10):
    return RetrievalDataset(
        name="MSRVTT", split="train",
        vids=[f"v{i}" for i in range(n)], captions=[f"c{i}" for i in range(n)],
        store=FeatureStore("/nonexistent", shape=(1, 1, 1)),
        vocab_vids=[f"v{i}" for i in range(n)],
        item_video_idx=np.arange(n),
    )


def test_loader_shards_partition_and_pad():
    ds = _dataset(10)
    a = TrainLoader(ds, batch_size=4, num_shards=2, shard=0)
    b = TrainLoader(ds, batch_size=4, num_shards=2, shard=1)
    ia = np.concatenate(list(a.batches(0)))
    ib = np.concatenate(list(b.batches(0)))
    # together they cover everything (with DistributedSampler-style padding)
    assert set(ia) | set(ib) == set(range(10))
    # fixed batch size always
    for chunk in a.batches(0):
        assert len(chunk) == 4


def test_loader_epoch_reshuffles_deterministically():
    ds = _dataset(16)
    l = TrainLoader(ds, batch_size=16)
    e0 = list(l.batches(0))[0]
    e1 = list(l.batches(1))[0]
    assert not np.array_equal(e0, e1)
    assert np.array_equal(e0, list(l.batches(0))[0])  # same epoch = same order
