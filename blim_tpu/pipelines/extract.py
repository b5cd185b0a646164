"""Offline video feature extraction — the TPU counterpart of extract.py.

Reference behavior (reference: extract.py:1-110): glob the dataset's videos,
statically chunk the sorted list over independent workers
(--num_chunk/--chunk_idx), decode 16 uniformly-sampled frames per video
(DiDeMo capped at 30s), preprocess to res448, run the vision tower + ToMe
compression (`return_video_feature=True`, pre-MLP), and cache per-video
features.

TPU redesign: decode stays host-side (decord/PyAV/OpenCV, whichever is
installed); featurization runs as one jitted tower+ToMe step at a fixed clip
batch so XLA compiles once; features are written as .npy per video plus an
optional packed single-file cache (see data/features.py).

Usage:
    python -m blim_tpu.pipelines.extract --dataset MSRVTT --num_chunk 4 --chunk_idx 0
"""

from __future__ import annotations

import argparse
import functools
import glob
import os
from typing import List, Optional

import numpy as np


def read_frames(video_path: str, num_frames: int, max_duration: Optional[float] = None):
    """Decode `num_frames` uniformly-sampled frames -> (T, H, W, 3) uint8.

    Tries decord, then PyAV, then OpenCV (the reference's reader stack,
    mm_utils.py:128-363). DiDeMo passes max_duration=30 (extract.py:52-55)."""
    try:
        from decord import VideoReader

        vr = VideoReader(video_path, num_threads=1)
        vlen = len(vr)
        fps = vr.get_avg_fps()
        duration = vlen / float(fps)
        if max_duration and duration > max_duration:
            vlen = int(max_duration * fps)
        idx = np.linspace(0, vlen - 2, num_frames).astype(int)
        return vr.get_batch(idx).asnumpy()
    except ImportError:
        pass
    try:
        import av

        container = av.open(video_path)
        frames = [f.to_ndarray(format="rgb24") for f in container.decode(video=0)]
        container.close()
        fps = 30.0
        if max_duration:
            frames = frames[: int(max_duration * fps)]
        idx = np.linspace(0, len(frames) - 2, num_frames).astype(int)
        return np.stack([frames[i] for i in idx])
    except ImportError:
        pass
    try:
        import cv2

        cap = cv2.VideoCapture(video_path)
        frames = []
        ok, frame = cap.read()
        while ok:
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            ok, frame = cap.read()
        cap.release()
        idx = np.linspace(0, len(frames) - 2, num_frames).astype(int)
        return np.stack([frames[i] for i in idx])
    except ImportError as e:
        raise RuntimeError(
            "no video decoder available (need decord, av, or cv2)"
        ) from e


def chunk_list(items: List[str], num_chunk: int, chunk_idx: int) -> List[str]:
    """Static chunking over independent workers (reference: extract.py:84-93)."""
    chunk_size = len(items) // num_chunk
    start = chunk_size * chunk_idx
    end = len(items) if chunk_idx == num_chunk - 1 else min(chunk_size * (chunk_idx + 1), len(items))
    return items[start:end]


def make_featurizer(vit_params, config, use_pallas=None):
    """Jitted (B, clips, local_frames, 3, H, W) pixels -> (B, clips, tokens, mm)
    cached features: tower + ToMe, pre-MLP (`return_video_feature=True`)."""
    import jax
    import jax.numpy as jnp

    from blim_tpu.models import projector as projector_lib
    from blim_tpu.models import umt_vit

    vcfg = config.vision
    pos_video, _ = umt_vit.build_pos_tables(vcfg)
    pos = jnp.asarray(pos_video, jnp.float32)

    @jax.jit
    def featurize(params, pixels):
        b, clips, lf, ch, h, w = pixels.shape
        flat = pixels.reshape(b * clips, lf, ch, h, w)
        feats = umt_vit.encode_clips(params, flat, pos, vcfg, use_pallas=use_pallas)
        compressed = projector_lib.compress_clip_tokens(
            feats, config.tokens_per_frame, config.mm_local_num_frames,
            vcfg.num_attention_heads,
        )
        t = compressed.shape[-2]
        return compressed.reshape(b, clips, t, compressed.shape[-1])

    return functools.partial(featurize, vit_params)


def main(args):
    import jax
    import jax.numpy as jnp

    from blim_tpu.core.config import ModelConfig, load_model_config
    from blim_tpu.checkpoints.convert import convert_vision_tower, load_hf_state_dict
    from blim_tpu.data.features import FeatureStore
    from blim_tpu.models import umt_vit

    if args.dataset == "LSMDC":
        video_list = glob.glob(f"{args.data_root}/{args.dataset}/videos/*/*")
    else:
        video_list = glob.glob(f"{args.data_root}/{args.dataset}/videos/*")
    video_list.sort()
    print(f"Number of videos: {len(video_list)}")
    video_list = chunk_list(video_list, args.num_chunk, args.chunk_idx)
    print(f"{args.chunk_idx}-th of {args.num_chunk} chunks: {len(video_list)} videos")

    have_ckpt = os.path.isdir(args.model_path) and os.path.exists(
        os.path.join(args.model_path, "config.json")
    )
    if have_ckpt:
        config = load_model_config(args.model_path)
        sd = load_hf_state_dict(args.model_path)
        vit_params = convert_vision_tower(sd, config.vision)
        vit_params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.bfloat16), vit_params)
    else:
        print(f"WARNING: no checkpoint at {args.model_path}; random tower (smoke mode)")
        config = ModelConfig()
        vit_params = umt_vit.init_params(config.vision, jax.random.key(0), jnp.bfloat16)

    processor = umt_vit.UMTImageProcessor(size=(config.vision.image_size,) * 2)
    featurize = make_featurizer(vit_params, config)
    out_dir = f"{args.data_root}/{args.dataset}/features"
    os.makedirs(out_dir, exist_ok=True)
    store = FeatureStore(out_dir)

    max_dur = 30.0 if args.dataset == "DiDeMo" else None
    lf = config.mm_local_num_frames
    clips = args.num_frames // lf
    batch_paths: List[str] = []
    batch_pixels: List[np.ndarray] = []

    def flush():
        if not batch_paths:
            return
        pixels = np.stack(batch_pixels)  # (B, T, 3, H, W)
        b, t = pixels.shape[:2]
        pixels = pixels.reshape(b, clips, lf, *pixels.shape[2:])
        feats = np.asarray(featurize(jnp.asarray(pixels, jnp.bfloat16)), np.float16)
        for path, feat in zip(batch_paths, feats):
            vid = os.path.basename(path)
            vid = vid[: vid.rfind(".")] if "." in vid else vid
            store.save(vid, feat)
        batch_paths.clear()
        batch_pixels.clear()

    for i, path in enumerate(video_list):
        try:
            frames = read_frames(path, args.num_frames, max_dur)
        except Exception as e:  # corrupt video -> skip (reference: extract.py:70-74)
            print(f"Error loading video {path}: {e}")
            continue
        batch_pixels.append(processor.preprocess(frames))
        batch_paths.append(path)
        if len(batch_paths) == args.batch_size:
            flush()
        if i % args.save_iter == 0:
            print(f"[{i}/{len(video_list)}]")
    flush()

    if args.pack and args.num_chunk == 1:
        # consolidate into the mmap-able single-file cache (native reader)
        import glob as _glob

        npys = sorted(_glob.glob(os.path.join(out_dir, "*.npy")))
        if npys:
            vids = [os.path.splitext(os.path.basename(p))[0] for p in npys]
            feats = np.stack([np.load(p) for p in npys]).astype(np.float16)
            FeatureStore.write_pack(out_dir, vids, feats)
            print(f"packed {len(vids)} videos into features.pack")
    print("done")


def get_args_parser():
    p = argparse.ArgumentParser("blim_tpu feature extractor")
    p.add_argument("--dataset", default="DiDeMo",
                   choices=["DiDeMo", "ActivityNet", "LSMDC", "MSRVTT"])
    p.add_argument("--data_root", default="./data")
    p.add_argument("--model_path", default="./pretrained/VideoChat-Flash-Qwen2-7B_res448")
    p.add_argument("--num_frames", type=int, default=16)
    p.add_argument("--num_chunk", type=int, default=1)
    p.add_argument("--chunk_idx", type=int, default=0)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--save_iter", type=int, default=10)
    p.add_argument("--pack", action="store_true",
                   help="after extraction, consolidate per-video .npy files "
                        "into the single-file packed cache (features.pack)")
    return p


if __name__ == "__main__":
    main(get_args_parser().parse_args())
