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
from typing import List, Optional, Tuple

import numpy as np


def middle_frame_indices(num_frames: int, vlen: int) -> np.ndarray:
    """The reference's 'middle' sampling (mm_utils.py:86-110): split
    [0, vlen) into num_frames intervals and take each interval's midpoint;
    videos shorter than num_frames pad by repeating the last index."""
    acc = max(1, min(num_frames, vlen))
    intervals = np.linspace(0, vlen, acc + 1).astype(int)
    idx = [
        (intervals[i] + max(intervals[i + 1] - 1, intervals[i])) // 2
        for i in range(acc)
    ]
    if len(idx) < num_frames:
        idx = idx + [idx[-1]] * (num_frames - len(idx))
    return np.asarray(idx, int)


def read_frames_gif(video_path: str, num_frames: int) -> np.ndarray:
    """Animated-gif reader -> (T, H, W, 3) uint8 (reference:
    mm_utils.py:157-207): imageio frame iteration, 'middle' sampling at an
    assumed 1 fps, alpha dropped, and — when frames vary in size — all
    sampled frames cropped to the common min height/width."""
    import imageio

    gif = imageio.get_reader(video_path)
    try:
        vlen = len(gif)
    except TypeError:
        vlen = sum(1 for _ in gif)
    order = middle_frame_indices(num_frames, vlen)
    wanted = set(order.tolist())
    frames = {}
    for i, frame in enumerate(gif):
        if i in wanted:
            f = np.asarray(frame)
            if f.ndim == 2:
                f = np.stack([f] * 3, axis=-1)
            elif f.shape[-1] == 4:
                f = f[..., :3]  # RGBA -> RGB (cv2.COLOR_RGBA2RGB drops alpha)
            frames[i] = f.astype(np.uint8)
    out = [frames[i] for i in order]
    if len({f.shape for f in out}) > 1:
        mh = min(f.shape[0] for f in out)
        mw = min(f.shape[1] for f in out)
        out = [f[:mh, :mw] for f in out]
    return np.stack(out)


def read_frames_img(video_path: str, num_frames: int) -> np.ndarray:
    """Frame-directory reader -> (T, H, W, 3) uint8 (reference:
    mm_utils.py:259-363): files sorted by the numeric tail of their name
    (``..._NNN.jpg``, falling back to plain name order when no number),
    'middle' sampling, decoded to RGB."""
    import re

    names = [
        n for n in os.listdir(video_path)
        if n.lower().endswith((".jpg", ".jpeg", ".png"))
    ]
    if not names:
        raise RuntimeError(f"no frame images in {video_path}")

    def frame_number(name: str) -> int:
        m = re.search(r"_(\d+)\.(?:jpg|jpeg|png)$", name, re.IGNORECASE)
        return int(m.group(1)) if m else -1

    if any(frame_number(n) >= 0 for n in names):
        names.sort(key=frame_number)
    else:
        names.sort()
    order = middle_frame_indices(num_frames, len(names))
    imgs = []
    try:
        import cv2

        for i in order:
            img = cv2.imread(os.path.join(video_path, names[i]), cv2.IMREAD_COLOR)
            imgs.append(cv2.cvtColor(img, cv2.COLOR_BGR2RGB))
    except ImportError:
        from PIL import Image

        for i in order:
            with Image.open(os.path.join(video_path, names[i])) as im:
                imgs.append(np.asarray(im.convert("RGB")))
    return np.stack(imgs).astype(np.uint8)


def read_frames(video_path: str, num_frames: int, max_duration: Optional[float] = None):
    """Decode `num_frames` sampled frames -> (T, H, W, 3) uint8.

    Dispatch mirrors the reference's VIDEO_READER_FUNCS (mm_utils.py:357-363):
    a directory -> the frame-image reader, .gif -> the gif reader, otherwise
    the video stack (decord, then PyAV, then OpenCV, mm_utils.py:128-363).
    DiDeMo passes max_duration=30 (extract.py:52-55)."""
    if os.path.isdir(video_path):
        return read_frames_img(video_path, num_frames)
    if video_path.lower().endswith(".gif"):
        return read_frames_gif(video_path, num_frames)
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
        vlen = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        fps = cap.get(cv2.CAP_PROP_FPS) or 30.0
        if max_duration and vlen > 0 and vlen / fps > max_duration:
            vlen = int(max_duration * fps)
        if vlen > 1:
            # grab() decodes without the retrieve+BGR2RGB conversion — only
            # the sampled frames pay the memcpy/cvtColor (~30% faster than
            # converting every frame, and O(num_frames) memory)
            idx = np.linspace(0, vlen - 2, num_frames).astype(int)
            pos = {u: j for j, u in enumerate(sorted(set(idx.tolist())))}
            frames = []
            for i in range(vlen):
                if not cap.grab():
                    break
                if i in pos:
                    ok, frame = cap.retrieve()
                    if ok:
                        frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            cap.release()
            if len(frames) == len(pos):
                return np.stack([frames[pos[i]] for i in idx])
            cap = cv2.VideoCapture(video_path)  # unreliable header: full read
        frames = []
        ok, frame = cap.read()
        while ok:
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            ok, frame = cap.read()
        cap.release()
        if max_duration and len(frames) / fps > max_duration:
            frames = frames[: max(int(max_duration * fps), 2)]
        idx = np.linspace(0, len(frames) - 2, num_frames).astype(int)
        return np.stack([frames[i] for i in idx])
    except ImportError as e:
        raise RuntimeError(
            "no video decoder available (need decord, av, or cv2)"
        ) from e


class DecodePrefetcher:
    """Threaded host-decode pipeline — the TPU counterpart of the reference's
    ``DataLoader(..., num_workers=4)`` (reference: extract.py:100): worker
    threads decode+preprocess upcoming videos while the TPU featurizes the
    current batch, so the end-to-end rate approaches the compute-only rate
    instead of decode+compute in series. Results come back in submission
    order; `depth` bounds in-flight decodes (16 raw frames at res448 are
    ~10MB per video)."""

    def __init__(self, paths: List[str], decode_fn, workers: int = 4, depth: int = 8):
        self.paths = paths
        self.decode_fn = decode_fn
        self.workers = max(1, workers)
        self.depth = max(depth, self.workers)

    def __iter__(self):
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=self.workers)
        pending = deque()
        it = iter(self.paths)
        try:
            while True:
                while len(pending) < self.depth:
                    try:
                        p = next(it)
                    except StopIteration:
                        break
                    pending.append((p, pool.submit(self.decode_fn, p)))
                if not pending:
                    break
                path, fut = pending.popleft()
                try:
                    yield path, fut.result(), None
                except Exception as e:   # corrupt video -> reported, skipped
                    yield path, None, e
        finally:
            pool.shutdown(wait=False, cancel_futures=True)


def chunk_list(items: List[str], num_chunk: int, chunk_idx: int) -> List[str]:
    """Static chunking over independent workers (reference: extract.py:84-93)."""
    chunk_size = len(items) // num_chunk
    start = chunk_size * chunk_idx
    end = len(items) if chunk_idx == num_chunk - 1 else min(chunk_size * (chunk_idx + 1), len(items))
    return items[start:end]


def make_featurizer(vit_params, config, use_pallas=None, device_preprocess=False):
    """Jitted (B, clips, local_frames, 3, H, W) pixels -> (B, clips, tokens, mm)
    cached features: tower + ToMe, pre-MLP (`return_video_feature=True`).

    With ``device_preprocess=True`` the jitted fn instead takes
    (B, clips, local_frames, H, W, 3) **uint8** frames (channels-last, as
    decoded) and performs rescale + ImageNet-normalize + channels-first on
    the TPU — XLA fuses all of it into the patch-embed convolution, and the
    host sheds the fp32 normalize that otherwise costs ~5x the decode
    (see UMTImageProcessor.resize_frames). Uploads also halve (uint8 vs
    bf16). If (H, W) differs from the tower's image_size the frames are
    ALSO bicubic-resized on the TPU (two small matmuls against
    pil_resize_matrix constants, quantising to the uint8 image domain
    between passes — ±1 grey level vs the host PIL resize) — the host
    then ships the raw decoded
    bytes instead of the resized ones, which is what matters when the
    host→device wire is the end-to-end extraction bound (e.g. 320×240
    MSRVTT frames are 2.6× fewer bytes than res448). One executable per
    distinct source resolution (shape-keyed retrace)."""
    import jax
    import jax.numpy as jnp

    from blim_tpu.models import projector as projector_lib
    from blim_tpu.models import umt_vit

    vcfg = config.vision
    pos_video, _ = umt_vit.build_pos_tables(vcfg)
    # trace-time constants stay HOST-side (numpy): a jnp.asarray here places
    # them on the device, and jit lowering then FETCHES them back over the
    # device->host tunnel (~25MB/s, and subject to multi-minute stalls) just
    # to embed them as MLIR constants. numpy constants embed with zero wire
    # traffic (2026-08-20: the pos-table fetch wedged bench_featurizer >13min).
    pos = np.asarray(pos_video, np.float32)
    dtype = jax.tree_util.tree_leaves(vit_params)[0].dtype
    mean = np.asarray(umt_vit.IMAGENET_MEAN, np.float32)
    std = np.asarray(umt_vit.IMAGENET_STD, np.float32)

    @jax.jit
    def featurize(params, pixels):
        if device_preprocess:
            x = pixels.astype(jnp.float32)
            tgt = vcfg.image_size
            h_in, w_in = pixels.shape[3], pixels.shape[4]
            if (h_in, w_in) != (tgt, tgt):
                # trace-time constants: pixels.shape is static per executable.
                # PIL pass order — horizontal first, quantising to the uint8
                # image domain between passes — matches the host
                # UMTImageProcessor.resize_frames to ±1 grey level
                # (pil_resize_matrix docstring).
                # numpy (not jnp): see the constants note above — device-
                # placed trace constants cost a device->host fetch at lowering
                mh = np.asarray(umt_vit.pil_resize_matrix(h_in, tgt), np.float32)
                mw = np.asarray(umt_vit.pil_resize_matrix(w_in, tgt), np.float32)
                hp = jax.lax.Precision.HIGHEST
                x = jnp.einsum("ow,bcfhwx->bcfhox", mw, x, precision=hp)
                x = jnp.clip(jnp.rint(x), 0.0, 255.0)
                x = jnp.einsum("oh,bcfhwx->bcfowx", mh, x, precision=hp)
                x = jnp.clip(jnp.rint(x), 0.0, 255.0)
            x = x / 255.0
            x = (x - mean) / std
            pixels = x.transpose(0, 1, 2, 5, 3, 4).astype(dtype)
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


def resize_for_upload(frames: np.ndarray, proc, target_hw: Tuple[int, int]) -> np.ndarray:
    """Host-resize only when it SHRINKS the upload.

    (T, H, W, 3) uint8 decoded frames: if the raw frames carry no more
    pixels than the tower resolution, ship them as-is and let the
    device_preprocess featurizer bicubic-resize on the TPU — the
    host→device wire (~40MB/s through the axon tunnel; PCIe otherwise) is
    the end-to-end extraction bound, not the resize FLOPs. Larger-than-
    target frames (e.g. 1080p sources) still get the host resize, which
    shrinks the wire bytes. Mirrors the reference's host-side
    vision_tower_builder.py:441-477 preprocessing split."""
    h, w = target_hw
    if frames.shape[1] * frames.shape[2] <= h * w:
        return frames
    return proc.resize_frames(frames, (h, w))


def run_extraction(video_list, decode_fn, featurize, on_features, *,
                   batch_size: int, clips: int, local_frames: int,
                   decode_workers: int = 4, save_iter: int = 10, log=print):
    """The decode -> featurize -> consume pipeline, reusable by main() and
    bench.py's end-to-end line: threaded host decode (DecodePrefetcher) feeds
    fixed-size batches to the jitted featurizer; device results are consumed
    with a lag-2 in-flight window so the TPU runs ahead of host-side saves
    (the counterpart of the reference's DataLoader(num_workers=4) overlap,
    reference: extract.py:100). Returns (n_ok, elapsed_seconds)."""
    import time

    import jax.numpy as jnp

    # batches accumulate per decoded shape: with raw-upload decoding
    # (resize_for_upload) different source resolutions need different
    # featurize executables, so same-shape videos batch together. A single-
    # resolution dataset (the common case) uses exactly one bucket.
    buckets: dict = {}
    in_flight: List = []

    def consume(paths, feats):
        # drop the tail-pad rows (flush pads partial batches to batch_size)
        on_features(paths, feats[: len(paths)])

    def flush(key):
        batch_paths, batch_pixels = buckets.pop(key)
        # pad tail batches to batch_size by repeating the last video: each
        # distinct (residual size, source shape) would otherwise compile a
        # fresh featurize executable mid-pipeline — a multi-second remote-
        # compile stall inside the production run. `consume` slices the
        # features back to len(batch_paths), so padded rows never reach
        # the consumer.
        if len(batch_pixels) < batch_size:
            batch_pixels = batch_pixels + [batch_pixels[-1]] * (
                batch_size - len(batch_pixels))
        pixels = np.stack(batch_pixels)  # (B, T, 3, H, W) f32 or (B, T, H, W, 3) u8
        b = pixels.shape[0]
        pixels = pixels.reshape(b, clips, local_frames, *pixels.shape[2:])
        # uint8 stays uint8: the device_preprocess featurizer normalizes on
        # the TPU and the upload is half the bf16 size
        dev = jnp.asarray(pixels) if pixels.dtype == np.uint8 else jnp.asarray(
            pixels, jnp.bfloat16)
        # async dispatch: featurize returns immediately; the transfer+save of
        # the PREVIOUS batch happens while this one runs on the TPU
        in_flight.append((batch_paths, featurize(dev)))
        while len(in_flight) > 2:
            consume(*in_flight.pop(0))

    t0 = time.perf_counter()
    n_ok = 0
    prefetch = DecodePrefetcher(video_list, decode_fn, workers=decode_workers)
    for i, (path, pix, err) in enumerate(prefetch):
        if err is not None:  # corrupt video -> skip (reference: extract.py:70-74)
            log(f"Error loading video {path}: {err}")
            continue
        key = pix.shape
        paths_pixels = buckets.setdefault(key, ([], []))
        paths_pixels[0].append(path)
        paths_pixels[1].append(pix)
        n_ok += 1
        if len(paths_pixels[0]) == batch_size:
            flush(key)
        if i % save_iter == 0:
            log(f"[{i}/{len(video_list)}]")
    for key in list(buckets):
        flush(key)
    while in_flight:
        consume(*in_flight.pop(0))
    return n_ok, time.perf_counter() - t0


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
    featurize = make_featurizer(vit_params, config, device_preprocess=True)
    out_dir = f"{args.data_root}/{args.dataset}/features"
    os.makedirs(out_dir, exist_ok=True)
    store = FeatureStore(out_dir)

    max_dur = 30.0 if args.dataset == "DiDeMo" else None
    lf = config.mm_local_num_frames
    clips = args.num_frames // lf

    def consume(paths, feats_dev):
        feats = np.asarray(feats_dev, np.float16)
        for path, feat in zip(paths, feats):
            vid = os.path.basename(path)
            vid = vid[: vid.rfind(".")] if "." in vid else vid
            store.save(vid, feat)

    def decode(path):
        frames = read_frames(path, args.num_frames, max_dur)
        return resize_for_upload(frames, processor, processor.size)

    n_ok, elapsed = run_extraction(
        video_list, decode, featurize, consume,
        batch_size=args.batch_size, clips=clips, local_frames=lf,
        decode_workers=args.decode_workers, save_iter=args.save_iter,
    )
    if args.bench and n_ok:
        import json

        print(json.dumps({
            "metric": "extract_videos_per_sec_e2e",
            "value": round(n_ok / elapsed, 3),
            "unit": f"videos/s end-to-end (decode + preprocess + featurize, "
                    f"{args.decode_workers} decode threads, batch {args.batch_size})",
        }))

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
    p.add_argument("--decode-workers", type=int, default=4,
                   help="host decode threads overlapping TPU featurization "
                        "(the reference's DataLoader num_workers, extract.py:100)")
    p.add_argument("--bench", action="store_true",
                   help="print an end-to-end videos/s JSON line at the end")
    return p


if __name__ == "__main__":
    main(get_args_parser().parse_args())
