"""User-journey integration test: the reference README's workflow end to end
on synthetic media — extract features from real mp4 files, then run the
zero-shot rerank evaluation CLI against the features the extractor wrote.

This pins the cross-stage contract (feature file layout, shapes, vid naming)
that the per-stage tests each assume: `pipelines.extract` must produce
exactly what `pipelines.main --eval` consumes (reference: extract.py ->
main.py via data/{ds}/features/*.npy, README.md:49-70)."""

import json
import os

import numpy as np
import pytest


@pytest.mark.slow
def test_extract_then_eval(tmp_path, monkeypatch):
    import cv2

    from blim_tpu.core.config import tiny_model_config
    from blim_tpu.pipelines import extract as ex
    from test_datasets_pipeline import _run_cli

    data_root = tmp_path / "data"
    vids = data_root / "MSRVTT" / "videos"
    os.makedirs(vids)
    n = 6
    rng = np.random.default_rng(0)
    for i in range(n):
        p = str(vids / f"video{i}.mp4")
        w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 30, (40, 40))
        assert w.isOpened()
        base = rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        for t in range(20):
            w.write(np.roll(base, 3 * t, axis=1))
        w.release()

    # stage 1: extraction with the tiny tower (random weights smoke mode);
    # 16 frames -> 4 clips x 4 local frames, features (4, 64, 32)
    cfg = tiny_model_config(image_size=128)
    import blim_tpu.core.config as core_config

    monkeypatch.setattr(core_config, "ModelConfig", lambda: cfg)
    args = ex.get_args_parser().parse_args([
        "--dataset", "MSRVTT", "--data_root", str(data_root),
        "--model_path", str(tmp_path / "nonexistent"),
        "--num_frames", "16", "--batch_size", "2",
    ])
    ex.main(args)
    feats = sorted(os.listdir(data_root / "MSRVTT" / "features"))
    assert feats == [f"video{i}.npy" for i in range(n)]
    a = np.load(data_root / "MSRVTT" / "features" / "video0.npy")
    assert a.shape == (cfg.num_clips, cfg.tokens_per_clip, cfg.mm_hidden_size)

    # stage 2: annotations + IV2 first-stage scores for the rerank CLI
    annos = [{"video": f"video{i}.mp4", "caption": f"caption number {i} "}
             for i in range(n)]
    for split in ("train", "test"):
        with open(data_root / "MSRVTT" / f"msrvtt_ret_{split}.json", "w") as f:
            json.dump(annos, f)
    scores = data_root / "scores"
    scores.mkdir()
    m = rng.standard_normal((n, n)).astype(np.float32) + 0.05
    np.savez(scores / "msrvtt_zeroshot.npz", t2v=m, v2t=m.T)

    # stage 3: zero-shot evaluation over the EXTRACTED features
    r = _run_cli(data_root, tmp_path, ["--eval", "--cpn", "--alpha", "0", "0.8",
                                       "--c", "1", "0", "0.8", "0.6"])
    assert r.returncode == 0, r.stderr[-3000:]
    assert "blim" in r.stdout
    assert (tmp_path / "out" / "log.txt").exists()
