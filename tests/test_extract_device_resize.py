"""Raw-upload extraction: the TPU-side PIL-semantics bicubic resize
(pil_resize_matrix), the ship-raw-when-smaller rule (resize_for_upload),
and shape-bucketed batching in run_extraction.

Reference counterpart: the host-side HF `resize(...,
PILImageResampling.BICUBIC)` preprocessing (vision_tower_builder.py:441-477)
— here the resize moves onto the device whenever the raw decoded frames are
no larger than the tower resolution, because the host→device wire is the
end-to-end extraction bound (docs/PERF_NOTES_R4.md)."""

import numpy as np
import pytest


def _two_pass_resize(img, h, w):
    """Host oracle of the device resize: horizontal pass, uint8 quantise,
    vertical pass (the exact op order inside make_featurizer)."""
    from blim_tpu.models.umt_vit import pil_resize_matrix

    mh = pil_resize_matrix(img.shape[0], h)
    mw = pil_resize_matrix(img.shape[1], w)
    t = np.einsum("ow,hwc->hoc", mw, img.astype(np.float64))
    t = np.clip(np.rint(t), 0, 255)
    t = np.einsum("oh,hwc->owc", mh, t)
    return np.clip(np.rint(t), 0, 255).astype(np.uint8)


@pytest.mark.parametrize("shape_in,shape_out", [
    ((24, 30), (48, 48)),    # upscale (the production raw-ship case)
    ((70, 50), (32, 32)),    # downscale (antialias filter widening)
    ((40, 40), (32, 48)),    # mixed
    ((48, 48), (48, 48)),    # identity
])
def test_pil_resize_matrix_matches_pil(shape_in, shape_out):
    from PIL import Image

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (*shape_in, 3), dtype=np.uint8)
    h, w = shape_out
    ref = np.asarray(Image.fromarray(img).resize((w, h), Image.BICUBIC)).astype(int)
    got = _two_pass_resize(img, h, w).astype(int)
    d = np.abs(got - ref)
    # fixed-point tie rounding inside PIL: at most ±1 grey level, rarely
    assert d.max() <= 1 and (d > 0).mean() < 1e-2, (d.max(), (d > 0).mean())


def test_resize_frames_fallback_matches_pil(monkeypatch):
    """The no-PIL numpy fallback inside UMTImageProcessor reproduces PIL."""
    import sys

    from PIL import Image

    from blim_tpu.models.umt_vit import UMTImageProcessor

    rng = np.random.default_rng(3)
    frames = rng.integers(0, 256, (2, 26, 34, 3), dtype=np.uint8)
    ref = np.stack([
        np.asarray(Image.fromarray(f).resize((16, 20), Image.BICUBIC))
        for f in frames
    ]).astype(int)
    monkeypatch.setitem(sys.modules, "PIL", None)  # force the fallback
    got = UMTImageProcessor(size=(20, 16)).resize_frames(frames).astype(int)
    d = np.abs(got - ref)
    assert d.max() <= 1 and (d > 0).mean() < 1e-2


def test_resize_for_upload_rule():
    from blim_tpu.models.umt_vit import UMTImageProcessor
    from blim_tpu.pipelines.extract import resize_for_upload

    proc = UMTImageProcessor(size=(32, 32))
    rng = np.random.default_rng(0)
    small = rng.integers(0, 256, (2, 20, 24, 3), dtype=np.uint8)
    assert resize_for_upload(small, proc, (32, 32)) is small  # raw ships
    big = rng.integers(0, 256, (2, 80, 60, 3), dtype=np.uint8)
    out = resize_for_upload(big, proc, (32, 32))
    assert out.shape == (2, 32, 32, 3)  # host-resized: shrinks the wire


def test_featurizer_device_resize_matches_host_resize():
    """featurize(raw frames) == featurize(host-resized frames) through the
    full tower: the device resize is upload-layout only, not a model
    change."""
    import jax
    import jax.numpy as jnp

    from blim_tpu.core.config import tiny_model_config
    from blim_tpu.models import umt_vit
    from blim_tpu.pipelines.extract import make_featurizer

    cfg = tiny_model_config(image_size=128)  # >target tokens for ToMe
    params = umt_vit.init_params(cfg.vision, jax.random.key(0), jnp.float32)
    feat = make_featurizer(params, cfg, device_preprocess=True)
    rng = np.random.default_rng(1)
    raw = rng.integers(
        0, 256,
        (1, cfg.num_clips, cfg.mm_local_num_frames, 40, 52, 3),
        dtype=np.uint8)
    proc = umt_vit.UMTImageProcessor(size=(128, 128))
    host = proc.resize_frames(raw.reshape(-1, 40, 52, 3)).reshape(
        1, cfg.num_clips, cfg.mm_local_num_frames, 128, 128, 3)
    a = np.asarray(feat(jnp.asarray(raw)), np.float32)
    b = np.asarray(feat(jnp.asarray(host)), np.float32)
    # inputs differ by <=1 grey level on <0.1% pixels (rint ties); the
    # feature delta through the tiny f32 tower stays far below its scale
    scale = float(np.abs(b).mean())
    assert np.abs(a - b).max() <= 0.05 * max(scale, 1e-3), (
        np.abs(a - b).max(), scale)


def test_run_extraction_buckets_mixed_shapes():
    """Videos of different decoded resolutions batch separately (one
    executable per source shape) and all land in the consumer."""
    from blim_tpu.pipelines.extract import run_extraction

    shapes = {"a": (4, 8, 10, 3), "b": (4, 6, 6, 3)}
    order = ["a0", "b0", "a1", "a2", "b1", "a3", "b2"]

    def decode(p):
        rng = np.random.default_rng(abs(hash(p)) % 2**31)
        return rng.integers(0, 256, shapes[p[0]], dtype=np.uint8)

    seen_batches = []

    def featurize(dev):
        seen_batches.append(tuple(dev.shape))
        return np.zeros((dev.shape[0], 1))

    consumed = []

    def on_features(paths, feats):
        consumed.extend(paths)
        assert feats.shape[0] == len(paths)

    n_ok, _ = run_extraction(
        order, decode, featurize, on_features,
        batch_size=2, clips=2, local_frames=2,
        decode_workers=2, save_iter=100, log=lambda *a: None)
    assert n_ok == len(order)
    assert sorted(consumed) == sorted(order)
    # every dispatched batch is shape-homogeneous and within batch_size
    for b in seen_batches:
        assert b[0] <= 2 and b[3:] in ((8, 10, 3), (6, 6, 3))
    # 4 a-videos -> two full batches; 3 b-videos -> one full + one tail
    assert len(seen_batches) == 4


def test_read_frames_cv2_grab_sampling(tmp_path):
    """The grab/retrieve cv2 reader returns the same sampled frames as a
    full sequential read."""
    import cv2

    from blim_tpu.pipelines.extract import read_frames

    p = str(tmp_path / "v.mp4")
    w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 30, (32, 32))
    assert w.isOpened()
    for t in range(24):
        w.write(np.full((32, 32, 3), t * 10, np.uint8))
    w.release()
    out = read_frames(p, 8)
    assert out.shape == (8, 32, 32, 3) and out.dtype == np.uint8
    idx = np.linspace(0, 24 - 2, 8).astype(int)
    for k, i in enumerate(idx):
        # lossy codec: constant frames round-trip within a few levels
        assert abs(int(out[k, 16, 16, 0]) - i * 10) <= 4, (k, i)


def test_read_frames_cv2_short_video(tmp_path):
    """Videos shorter than num_frames repeat sampled frames exactly like the
    pre-grab full-read path (duplicate linspace indices)."""
    import cv2

    from blim_tpu.pipelines.extract import read_frames

    p = str(tmp_path / "short.mp4")
    w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 30, (32, 32))
    assert w.isOpened()
    for t in range(3):
        w.write(np.full((32, 32, 3), 40 + t * 60, np.uint8))
    w.release()
    out = read_frames(p, 8)
    assert out.shape == (8, 32, 32, 3)
    idx = np.linspace(0, 3 - 2, 8).astype(int)
    for k, i in enumerate(idx):
        assert abs(int(out[k, 16, 16, 0]) - (40 + i * 60)) <= 4
