#!/usr/bin/env python
"""On-device A/B: 7B LoRA train step, XLA attention vs Pallas flash fwd+bwd.

Round-1 baseline: 817 ms/step at batch 4 (caption budget 32). This measures
the same step at the production budget (default 96) with use_pallas False vs
True — the Pallas path now engages at unaligned lengths (masked padding) and
runs the fused FA2-style backward instead of an XLA recompute VJP.

Timing per CLAUDE.md: np.asarray on a scalar metric to synchronize, varied
batches to dodge the tunnel result cache, best-of-N.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--caption-tokens", type=int, default=96)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--modes", default="xla,pallas")
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    try:
        import os

        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
        os.makedirs(cache_dir, exist_ok=True)
        if not args.tiny:
            jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception:
        pass

    from blim_tpu.core.config import ModelConfig, tiny_model_config
    from blim_tpu.core.mesh import make_mesh
    from blim_tpu.data.collate import collate_train_batch
    from blim_tpu.data.prompts import make_tvg_layout, make_vtg_layout
    from blim_tpu.data.tokenization import ByteFallbackTokenizer
    from blim_tpu.engine import train as train_lib
    from blim_tpu.models import videochat_flash as vcf
    from blim_tpu.utils.flops import (
        full_forward_flops, peak_flops_per_chip, tvg_head_flops,
    )

    cfg = tiny_model_config(vocab_size=152064) if args.tiny else ModelConfig()
    dtype = jnp.float32 if args.tiny else jnp.bfloat16
    tok = ByteFallbackTokenizer()
    vtg_l = make_vtg_layout(tok, "MSRVTT", cfg.video_tokens_vtg, args.caption_tokens)
    tvg_l = make_tvg_layout(tok, cfg.num_clips, args.caption_tokens)
    print(f"devices: {jax.devices()}  vtg seq {len(vtg_l.pre_ids) + cfg.video_tokens_vtg}+: "
          f"T={vtg_l.caption_start + vtg_l.max_caption_tokens + len(vtg_l.terminator_ids)}")

    params = jax.jit(lambda k: vcf.init_params(cfg, k, dtype))(jax.random.key(0))
    jax.block_until_ready(params)

    B = args.batch
    rng = np.random.default_rng(0)
    words = ["man", "dog", "runs", "park", "sings", "car", "cooks", "kitchen"]
    batches = []
    for i in range(3):
        caps = [" ".join(rng.choice(words, size=3)) for _ in range(B)]
        feats = rng.standard_normal(
            (B, cfg.num_clips, cfg.tokens_per_clip, cfg.mm_hidden_size)
        ).astype(np.float32)
        batch = collate_train_batch(caps, feats, np.arange(B) % 4, tok, "MSRVTT", vtg_l, tvg_l)
        batches.append({k: jnp.asarray(v) for k, v in batch.items()})
    vocab = jnp.asarray(rng.standard_normal((64, cfg.num_clips, cfg.mm_hidden_size)), jnp.float32)

    tcfg = train_lib.TrainConfig(lr=1e-4, warmup_epochs=0.0, epochs=1)
    mesh = make_mesh()

    # analytic train FLOPs (fwd + bwd ~= 2x fwd for LoRA-frozen weights + remat fwd)
    T_vtg = vtg_l.caption_start + vtg_l.max_caption_tokens + len(vtg_l.terminator_ids)
    T_tvg = tvg_l.seq_len
    wl = vtg_l.label_window[1]
    fwd = (full_forward_flops(cfg.llm, B, T_vtg, lm_positions=wl)
           + full_forward_flops(cfg.llm, B, T_tvg)
           + tvg_head_flops(cfg, B * cfg.num_clips, 64))
    train_flops = 4.0 * fwd  # fwd + remat fwd + dx bwd (~2x fwd matmuls)
    peak = peak_flops_per_chip(jax.devices()[0])

    for mode in args.modes.split(","):
        use_pallas = mode == "pallas"
        tx = train_lib.make_optimizer(tcfg, steps_per_epoch=100)
        trainable = train_lib.init_trainable(
            jax.random.key(1), cfg, tcfg,
            visual_head=jnp.zeros((cfg.llm.hidden_size, cfg.mm_hidden_size)) + 0.02,
        )
        state = train_lib.TrainState(jnp.asarray(0), trainable, tx.init(trainable))
        step = train_lib.make_train_step(cfg, tcfg, tx, vtg_l, tvg_l, mesh=mesh,
                                         use_pallas=use_pallas)
        for i in range(2):
            state, m = step(state, params, batches[i % 3], vocab, jax.random.key(i))
            np.asarray(m["loss"])
        best = float("inf")
        for i in range(args.iters):
            t0 = time.perf_counter()
            state, m = step(state, params, batches[i % 3], vocab, jax.random.key(10 + i))
            np.asarray(m["loss"])
            best = min(best, time.perf_counter() - t0)
        mfu = train_flops / best / peak if peak else float("nan")
        print(f"{mode:7s}: {best*1e3:8.1f} ms/step  (batch {B}, budget "
              f"{args.caption_tokens}, est. MFU {mfu:.3f}, loss {float(m['loss']):.3f})")


if __name__ == "__main__":
    main()
