"""Dataset adapters + full CLI pipeline smoke test on synthetic data.

Builds a synthetic MSRVTT-shaped data directory (annotations, cached
features, InternVideo2 scores) and runs the eval and train CLI paths with a
tiny random model — the integration surface the reference exercises with
`python main.py` (reference: README.md:114-171)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from blim_tpu.data.datasets import load_dataset, load_iv2_scores
from blim_tpu.data.features import FeatureStore

N = 6
SHAPE = (4, 64, 32)  # tiny mm_hidden


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    ds = root / "MSRVTT"
    (ds / "features").mkdir(parents=True)
    rng = np.random.default_rng(0)
    annos = []
    for i in range(N):
        vid = f"video{i}"
        annos.append({"video": f"{vid}.mp4", "caption": f"caption number {i} about a scene "})
        if i != N - 1:  # one missing video -> zero-fallback on test split
            np.save(ds / "features" / f"{vid}.npy", rng.standard_normal(SHAPE).astype(np.float16))
    for split in ("train", "test"):
        with open(ds / f"msrvtt_ret_{split}.json", "w") as f:
            json.dump(annos, f)
    scores = root / "scores"
    scores.mkdir()
    for stem in ("msrvtt", "msrvtt_zeroshot"):
        m = rng.standard_normal((N, N)).astype(np.float32) + 0.05
        np.savez(scores / f"{stem}.npz", t2v=m, v2t=m.T)
    return root


def test_load_dataset_train_filters_missing(data_root):
    ds = load_dataset("MSRVTT", str(data_root), "train", feature_shape=SHAPE)
    assert len(ds) == N - 1          # missing-feature item dropped from train
    test_ds = load_dataset("MSRVTT", str(data_root), "test", feature_shape=SHAPE)
    assert len(test_ds) == N         # test keeps all
    feats = test_ds.load_features()
    assert feats.shape == (N, *SHAPE)
    missing = test_ds.vocab_vids.index(f"video{N-1}")
    assert (feats[missing] == 0).all()   # zero fallback (reference: base_dataset.py:27-28)
    assert test_ds.captions[0] == f"caption number 0 about a scene"  # .strip()


def test_video_vocab_shape(data_root):
    ds = load_dataset("MSRVTT", str(data_root), "test", feature_shape=SHAPE)
    vocab = ds.video_vocab()
    assert vocab.shape == (N, SHAPE[0], SHAPE[2])


def test_feature_pack_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((3, *SHAPE)).astype(np.float32)
    vids = ["a", "b", "c"]
    FeatureStore.write_pack(str(tmp_path), vids, feats)
    store = FeatureStore(str(tmp_path), shape=SHAPE)
    np.testing.assert_allclose(store.load("b"), feats[1], rtol=1e-3, atol=1e-3)
    assert store.available("c") and not store.available("zz")


def test_load_iv2_scores(data_root):
    s = load_iv2_scores(str(data_root / "scores"), "MSRVTT", zeroshot=True)
    assert s["t2v"].shape == (N, N) and s["v2t"].shape == (N, N)


def _run_cli(data_root, tmp_path, extra):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # 4 virtual devices (not the suite's 8): the XLA CPU collective
    # rendezvous aborts after 40s if its per-device threads starve, and 8
    # threads on this 1-core host flake under any concurrent load
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    cmd = [
        sys.executable, "-m", "blim_tpu.pipelines.main",
        "--tiny", "--dataset", "MSRVTT",
        "--data_root", str(data_root),
        "--scores_dir", str(data_root / "scores"),
        "--output_dir", str(tmp_path / "out"),
        "--model_path", str(tmp_path / "nonexistent"),
        "--topk", "3", "--batch_size_eval", "4",
        "--max_caption_tokens", "48",
    ] + extra
    # force CPU inside the subprocess (axon ignores JAX_PLATFORMS env)
    code = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import runpy, sys; sys.argv = " + repr(["main.py"] + cmd[3:]) + ";"
        "runpy.run_module('blim_tpu.pipelines.main', run_name='__main__')"
    )
    for attempt in (0, 1):
        r = subprocess.run(
            [sys.executable, "-c", code], env=env, capture_output=True, text=True,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            timeout=900,
        )
        # known infra flake, not a product bug: the XLA CPU collective
        # rendezvous SIGABRTs when its device threads starve for 40s on
        # this 1-core host — retry once on that exact signature
        if r.returncode == 0 or "rendezvous" not in r.stderr.lower():
            return r
    return r


@pytest.mark.slow
def test_cli_eval_zeroshot(data_root, tmp_path):
    r = _run_cli(data_root, tmp_path, ["--eval", "--cpn", "--alpha", "0", "0.8",
                                       "--c", "1", "0", "0.8", "0.6"])
    assert r.returncode == 0, r.stderr[-3000:]
    assert "blim" in r.stdout
    assert (tmp_path / "out" / "log.txt").exists()


@pytest.mark.slow
def test_cli_train_one_epoch(data_root, tmp_path):
    r = _run_cli(
        data_root, tmp_path,
        ["--epochs", "1", "--batch_size", "2", "--lr", "1e-3", "--cpn",
         "--alpha", "0.2", "0.8", "--c", "1", "0.4", "0.9", "0.8"],
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "Training time" in r.stdout
    out = tmp_path / "out"
    assert (out / "epoch0").exists()
    assert (out / "log.txt").exists()
