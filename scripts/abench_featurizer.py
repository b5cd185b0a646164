#!/usr/bin/env python
"""Featurizer push-or-prove: batch sweep + tower-vs-ToMe decomposition.

The bench's featurizer line (tower + ToMe, no host decode) sat at MFU 0.334
at batch 2 in round 3 with no decomposition. This script:
  1. sweeps the batch size standalone (no resident 7B — the extraction
     pipeline runs the ViT alone, reference: extract.py:96-110);
  2. times tower-only vs tower+ToMe at each batch to split compute between
     the MXU-bound ViT and the argsort/gather/scatter-bound ToMe merge.

Timing per CLAUDE.md: np.asarray forces the sync, fresh inputs per trial
dodge the tunnel result cache, best-of-N.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="1,2,4,8")
    ap.add_argument("--trials", type=int, default=4)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument(
        "--decompose", action="store_true",
        help="time attention variants (pallas/xla/none) to split tower time "
        "between attention and the matmul/elementwise rest",
    )
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    if not args.tiny:
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)

    from bench import vit_forward_flops
    from blim_tpu.core.config import ModelConfig, tiny_model_config
    from blim_tpu.models import projector as projector_lib
    from blim_tpu.models import umt_vit
    from blim_tpu.utils.flops import peak_flops_per_chip

    cfg = tiny_model_config(vocab_size=1000, image_size=128) if args.tiny else ModelConfig()
    dtype = jnp.float32 if args.tiny else jnp.bfloat16
    vcfg = cfg.vision
    vit = jax.jit(lambda k: umt_vit.init_params(vcfg, k, dtype))(jax.random.key(3))
    jax.block_until_ready(vit)
    pos_video, _ = umt_vit.build_pos_tables(vcfg)
    pos = jnp.asarray(pos_video, jnp.float32)
    peak = peak_flops_per_chip(jax.devices()[0]) or float("nan")

    def tower_only(params, pixels, use_pallas=None):
        b, clips, lf, ch, h, w = pixels.shape
        flat = pixels.reshape(b * clips, lf, ch, h, w)
        return umt_vit.encode_clips(params, flat, pos, vcfg, use_pallas=use_pallas)

    def tower_tome(params, pixels):
        feats = tower_only(params, pixels)
        compressed = projector_lib.compress_clip_tokens(
            feats, cfg.tokens_per_frame, cfg.mm_local_num_frames,
            vcfg.num_attention_heads,
        )
        b = pixels.shape[0]
        t = compressed.shape[-2]
        return compressed.reshape(b, cfg.num_clips, t, compressed.shape[-1])

    # device-side mean: the tower-only output is ~51MB at B=2 (25MB/s tunnel
    # -> ~2s transfer, 6x the compute) — reduce on device, fetch a scalar
    jits = {
        "tower": jax.jit(lambda p, x: tower_only(p, x).mean()),
        "tower+tome": jax.jit(lambda p, x: tower_tome(p, x).mean()),
    }
    if args.decompose:
        from blim_tpu.kernels import attention as attn_lib

        real_mha = attn_lib.multi_head_attention

        def no_attn(q, k, v, **kw):
            # identity "attention": softmax/score work removed, QKV/proj/MLP
            # matmuls kept — isolates the attention kernel's share of time
            return v

        def tower_noattn(p, x):
            umt_vit.multi_head_attention = no_attn
            try:
                return tower_only(p, x).mean()
            finally:
                umt_vit.multi_head_attention = real_mha

        jits = {
            "tower": jits["tower"],
            "tower-xla-attn": jax.jit(lambda p, x: tower_only(p, x, use_pallas=False).mean()),
            "tower-no-attn": jax.jit(tower_noattn),
            "tower+tome": jits["tower+tome"],
        }

    rng = np.random.default_rng(1)
    for B in (int(b) for b in args.batches.split(",")):
        # distinct buffers per trial: the tunnel result-caches identical
        # (executable, inputs) pairs
        pix = [
            jnp.asarray(rng.standard_normal(
                (B, cfg.num_clips, cfg.mm_local_num_frames, 3,
                 vcfg.image_size, vcfg.image_size)) * 0.1, dtype)
            for _ in range(max(args.trials, 2))
        ]
        row = {}
        for name, fn in jits.items():
            try:
                np.asarray(fn(vit, pix[0]))  # compile
            except Exception as e:
                print(f"B={B} {name}: FAILED {type(e).__name__}: {e}", flush=True)
                row[name] = float("nan")
                continue
            # pipelined: enqueue all trials (distinct buffers — a second
            # pass over the same ones would hit the tunnel result cache),
            # drain once; per-batch steady-state rate, matching the
            # extraction pipeline's lag-2 overlap
            t0 = time.perf_counter()
            outs = [fn(vit, pix[t]) for t in range(args.trials)]
            np.asarray(outs[-1])
            row[name] = (time.perf_counter() - t0) / args.trials
        fl = vit_forward_flops(vcfg, B * cfg.num_clips)
        tome_ms = (row["tower+tome"] - row["tower"]) * 1e3
        parts = [f"{name} {t*1e3:7.1f} ms" for name, t in row.items()]
        print(
            f"B={B}: " + "  ".join(parts) + "  "
            f"(tome +{tome_ms:6.1f} ms, {tome_ms/ (row['tower+tome']*1e3):5.1%})  "
            f"videos/s {B/row['tower+tome']:6.2f}  "
            f"mfu {fl/row['tower+tome']/peak:.3f}  "
            f"tower-mfu {fl/row['tower']/peak:.3f}",
            flush=True,
        )
        if "tower-no-attn" in row:
            attn_s = row["tower"] - row["tower-no-attn"]
            # analytic split of the same fl: score+PV term vs matmul term
            s = vcfg.num_frames * (vcfg.image_size // vcfg.patch_size) ** 2
            layers = vcfg.num_hidden_layers + vcfg.return_idx + 1
            attn_fl = B * cfg.num_clips * s * layers * 4.0 * s * vcfg.hidden_size
            print(
                f"      attn share {attn_s/row['tower']:5.1%} of time "
                f"({attn_fl/fl:5.1%} of flops)  "
                f"attn-mfu {attn_fl/attn_s/peak:.3f}  "
                f"rest-mfu {(fl-attn_fl)/row['tower-no-attn']/peak:.3f}  "
                f"pallas-vs-xla {row['tower-xla-attn']/row['tower']:.2f}x",
                flush=True,
            )


if __name__ == "__main__":
    main()
