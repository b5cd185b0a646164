#!/usr/bin/env python
"""Benchmark: MSRVTT-style zero-shot rerank throughput (queries/sec/chip).

North-star (BASELINE.md): 1k queries x topk-16 P(t|v) rerank with the 7B
model in <= 5 min on a v5e-8 => 3.333 q/s on 8 chips => 0.4167 q/s/chip.
This bench runs the t2v VTG grid (P(query caption | candidate video)) with
synthetic captions/features and random-initialized 7B bf16 weights on all
visible devices, and reports queries/sec/chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Note: identical repeated inputs can be result-cached by the axon tunnel, so
every pair in the grid uses distinct caption/video data.
"""

import argparse
import json
import sys
import time

import numpy as np


BASELINE_QPS_PER_CHIP = 1000.0 / 300.0 / 8.0  # 0.4167 q/s/chip


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="tiny model on CPU (smoke test)")
    ap.add_argument("--queries", type=int, default=128)
    ap.add_argument("--topk", type=int, default=16)
    ap.add_argument("--batch", type=int, default=16, help="pairs per chip per step")
    ap.add_argument("--caption-tokens", type=int, default=32)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    from blim_tpu.core.config import ModelConfig, tiny_model_config
    from blim_tpu.core.mesh import make_mesh
    from blim_tpu.data.prompts import make_vtg_layout
    from blim_tpu.data.tokenization import ByteFallbackTokenizer
    from blim_tpu.engine.rerank import CaptionBank, RerankEngine, topk_pairs
    from blim_tpu.models import videochat_flash as vcf

    cfg = tiny_model_config(vocab_size=152064) if args.tiny else ModelConfig()
    tok = ByteFallbackTokenizer()
    dataset = "MSRVTT"
    layout = make_vtg_layout(tok, dataset, cfg.video_tokens_vtg, max_caption_tokens=args.caption_tokens)

    n = args.queries
    rng = np.random.default_rng(args.seed)
    words = ["man", "woman", "dog", "cat", "runs", "jumps", "sings", "cooks",
             "dances", "rides", "park", "kitchen", "stage", "street", "ball", "car"]
    captions = [" ".join(rng.choice(words, size=rng.integers(4, 8))) for _ in range(n)]

    dtype = jnp.float32 if args.tiny else jnp.bfloat16
    params = jax.jit(lambda k: vcf.init_params(cfg, k, dtype))(jax.random.key(args.seed))
    jax.block_until_ready(params)

    feats = np.asarray(
        rng.standard_normal((n, cfg.num_clips, cfg.tokens_per_clip, cfg.mm_hidden_size)),
        np.float32,
    ) * 0.5
    iv2 = rng.standard_normal((n, n)).astype(np.float32) + 0.01

    mesh = make_mesh()
    n_chips = len(jax.devices())
    engine = RerankEngine(params, cfg, layout, None, mesh, batch_size=args.batch)
    bank = CaptionBank.build_vtg(captions, tok, dataset, layout)
    banks = engine.upload(bank, feats)

    rows, cols = topk_pairs(iv2, args.topk)

    # warmup / compile on a slice
    engine.score_grid_vtg(
        banks, rows[: engine.batch_size], cols[: engine.batch_size],
        cap_idx=rows[: engine.batch_size], vid_idx=cols[: engine.batch_size],
        out_shape=(n, n), with_prior=False,
    )

    t0 = time.perf_counter()
    mat, _ = engine.score_grid_vtg(
        banks, rows, cols, cap_idx=rows, vid_idx=cols,
        out_shape=(n, n), with_prior=False,
    )
    elapsed = time.perf_counter() - t0

    assert np.isfinite(mat[rows, cols]).all(), "non-finite scores"
    qps = n / elapsed
    qps_per_chip = qps / n_chips
    result = {
        "metric": "msrvtt_zeroshot_rerank_queries_per_sec_per_chip",
        "value": round(qps_per_chip, 4),
        "unit": "queries/s/chip (topk=16, 7B, P(t|v))" if not args.tiny else "queries/s/chip (tiny smoke)",
        "vs_baseline": round(qps_per_chip / BASELINE_QPS_PER_CHIP, 3),
    }
    print(json.dumps(result))
    print(
        f"# {n} queries x top{args.topk} = {len(rows)} pairs in {elapsed:.1f}s "
        f"on {n_chips} chip(s); {len(rows)/elapsed:.1f} pairs/s",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
