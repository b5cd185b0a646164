"""Extraction pipeline: gif / frame-directory readers (reference:
mm_utils.py:157-207,259-363), the 'middle' sampling oracle, the threaded
decode prefetcher, and an end-to-end mini extraction over mixed inputs."""

import os

import numpy as np
import pytest


def _reference_middle_indices(num_frames, vlen):
    """Literal transcription of the reference's sampling arithmetic
    (mm_utils.py:86-110, sample='middle') as the oracle."""
    acc_samples = min(num_frames, vlen)
    intervals = np.linspace(start=0, stop=vlen, num=acc_samples + 1).astype(int)
    ranges = []
    for idx, interv in enumerate(intervals[:-1]):
        ranges.append((interv, intervals[idx + 1] - 1))
    frame_indices = [(x[0] + x[1]) // 2 for x in ranges]
    if len(frame_indices) < num_frames:
        padded = [frame_indices[-1]] * num_frames
        padded[: len(frame_indices)] = frame_indices
        frame_indices = padded
    return frame_indices


@pytest.mark.parametrize("vlen", [1, 3, 8, 16, 17, 40, 353])
@pytest.mark.parametrize("num_frames", [8, 16])
def test_middle_sampling_matches_reference(vlen, num_frames):
    from blim_tpu.pipelines.extract import middle_frame_indices

    got = middle_frame_indices(num_frames, vlen).tolist()
    want = _reference_middle_indices(num_frames, vlen)
    assert got == want


def _make_gif(path, n_frames, size=(24, 20)):
    import imageio

    rng = np.random.default_rng(0)
    frames = [
        (rng.integers(0, 255, (*size, 3))).astype(np.uint8) * 0 + i * 5
        for i in range(n_frames)
    ]
    imageio.mimsave(path, frames, duration=0.1)
    return frames


def test_read_frames_gif(tmp_path):
    from blim_tpu.pipelines.extract import middle_frame_indices, read_frames_gif

    path = str(tmp_path / "clip.gif")
    _make_gif(path, 12)
    out = read_frames_gif(path, 8)
    assert out.shape == (8, 24, 20, 3) and out.dtype == np.uint8
    # each sampled frame is the constant-value frame at the sampled index
    idx = middle_frame_indices(8, 12)
    for k, i in enumerate(idx):
        assert int(out[k, 0, 0, 0]) == i * 5, (k, i)


def test_read_frames_gif_short_pads(tmp_path):
    from blim_tpu.pipelines.extract import read_frames_gif

    path = str(tmp_path / "short.gif")
    _make_gif(path, 3)
    out = read_frames_gif(path, 8)
    assert out.shape[0] == 8
    # padded tail repeats the last frame (reference: mm_utils.py:107-110)
    assert (out[-1] == out[2 + (8 - 3) - (8 - 3)]).all()


def _make_frame_dir(root, n, numbered=True):
    import cv2

    os.makedirs(root, exist_ok=True)
    for i in range(n):
        img = np.full((16, 18, 3), i * 7, np.uint8)
        name = f"frame_{i:04d}.jpg" if numbered else f"{chr(97 + i)}.png"
        # jpg is lossy but constant images round-trip exactly
        cv2.imwrite(os.path.join(root, name), img)


def test_read_frames_img_numbered(tmp_path):
    from blim_tpu.pipelines.extract import middle_frame_indices, read_frames_img

    root = str(tmp_path / "vid_frames")
    _make_frame_dir(root, 10)
    out = read_frames_img(root, 4)
    assert out.shape == (4, 16, 18, 3)
    idx = middle_frame_indices(4, 10)
    for k, i in enumerate(idx):
        assert int(out[k, 0, 0, 0]) == i * 7


def test_read_frames_dispatch(tmp_path):
    """read_frames routes directories and .gif files to the new readers."""
    from blim_tpu.pipelines.extract import read_frames

    root = str(tmp_path / "dirvid")
    _make_frame_dir(root, 6)
    assert read_frames(root, 4).shape[0] == 4
    gif = str(tmp_path / "v.gif")
    _make_gif(gif, 6)
    assert read_frames(gif, 4).shape[0] == 4


def test_decode_prefetcher_order_and_errors():
    import time

    from blim_tpu.pipelines.extract import DecodePrefetcher

    def decode(p):
        time.sleep(0.01 * (int(p) % 3))
        if p == "4":
            raise ValueError("corrupt")
        return int(p) * 10

    paths = [str(i) for i in range(9)]
    got = list(DecodePrefetcher(paths, decode, workers=3, depth=4))
    assert [p for p, _, _ in got] == paths   # submission order preserved
    for p, val, err in got:
        if p == "4":
            assert err is not None and val is None
        else:
            assert err is None and val == int(p) * 10


def test_extract_end_to_end_mixed_inputs(tmp_path, monkeypatch):
    """Mini extraction over a gif + a frame dir with the tiny tower: features
    land in the store and the bench line prints."""
    import jax

    from blim_tpu.core.config import tiny_model_config
    from blim_tpu.pipelines import extract as ex

    data_root = tmp_path / "data"
    vids = data_root / "MSRVTT" / "videos"
    os.makedirs(vids)
    _make_gif(str(vids / "a.gif"), 20)
    _make_frame_dir(str(vids / "b"), 9)

    # image 128 -> 256 patch tokens/clip, compressible to the 64-token ToMe
    # target (the default tiny 64px config lands exactly ON the target)
    cfg = tiny_model_config(image_size=128)
    # main() imports ModelConfig from core.config at call time
    import blim_tpu.core.config as core_config

    monkeypatch.setattr(core_config, "ModelConfig", lambda: cfg)
    args = ex.get_args_parser().parse_args([
        "--dataset", "MSRVTT", "--data_root", str(data_root),
        "--model_path", str(tmp_path / "nonexistent"),
        "--num_frames", "8", "--batch_size", "2", "--bench",
    ])
    ex.main(args)
    feats = sorted(os.listdir(data_root / "MSRVTT" / "features"))
    assert feats == ["a.npy", "b.npy"]
    a = np.load(data_root / "MSRVTT" / "features" / "a.npy")
    assert a.shape[0] == 8 // cfg.mm_local_num_frames  # clips
    assert np.isfinite(a.astype(np.float32)).all()
