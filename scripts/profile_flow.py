#!/usr/bin/env python
"""Stage-level wall-time profile of the fine-tuned evaluation flow at the
bench shape: where do the non-scoring seconds go? (bank build, uploads,
tvg projection, topk, scoring passes, scatter)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--topk", type=int, default=16)
    ap.add_argument("--caption-tokens", type=int, default=96)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--no-lora", action="store_true", help="A/B: measure the adapter tax")
    ap.add_argument("--flow", action="store_true",
                    help="profile the REAL overlapped evaluation() via its "
                         "timing marks instead of sequential stages")
    ap.add_argument("--zeroshot", action="store_true",
                    help="with --flow: no TVG direction (zero-shot gating)")
    ap.add_argument("--seed", type=int, default=11,
                    help="trial data seed stream: vary across invocations — "
                         "identical (executable, inputs) pairs can be served "
                         "by the tunnel's result cache")
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    else:
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    import jax.numpy as jnp

    from bench import make_captions
    from blim_tpu.adapters.lora import LoraConfig, init_llm_lora, init_projector_lora
    from blim_tpu.core.config import ModelConfig, tiny_model_config
    from blim_tpu.core.mesh import make_mesh
    from blim_tpu.data.prompts import make_tvg_layout, make_vtg_layout
    from blim_tpu.data.tokenization import ByteFallbackTokenizer
    from blim_tpu.engine.rerank import CaptionBank, RerankEngine, topk_pairs, unique_pairs
    from blim_tpu.models import videochat_flash as vcf

    cfg = tiny_model_config(vocab_size=152064) if args.tiny else ModelConfig()
    tok = ByteFallbackTokenizer()
    layout = make_vtg_layout(tok, "MSRVTT", cfg.video_tokens_vtg, args.caption_tokens)
    tvg_layout = make_tvg_layout(tok, cfg.num_clips, args.caption_tokens)
    dtype = jnp.float32 if args.tiny else jnp.bfloat16

    n = args.queries
    rng = np.random.default_rng(0)
    captions = make_captions(n, rng, args.caption_tokens)
    feats = rng.standard_normal(
        (n, cfg.num_clips, cfg.tokens_per_clip, cfg.mm_hidden_size)
    ).astype(np.float32) * 0.5

    params = jax.jit(lambda k: vcf.init_params(cfg, k, dtype))(jax.random.key(0))
    jax.block_until_ready(params)
    lcfg = LoraConfig()
    lora = {
        "llm": init_llm_lora(jax.random.key(7), cfg.llm, lcfg, dtype),
        "projector": init_projector_lora(
            jax.random.key(8), cfg.mm_hidden_size, cfg.llm.hidden_size, lcfg, dtype
        ),
    }
    mesh = make_mesh()
    feat_bytes = n * cfg.num_clips * cfg.tokens_per_clip * cfg.mm_hidden_size * 2
    budget = 0 if (not args.tiny and feat_bytes > 256 * 2**20) else None
    if args.no_lora:
        lora = None
    engine = RerankEngine(
        params, cfg, layout, tvg_layout, mesh, batch_size=16,
        lora=lora, lora_scale=lcfg.scale if lora else 0.0,
        max_device_feature_bytes=budget,
    )

    iv2_a = rng.standard_normal((n, n)).astype(np.float32)
    iv2_b = rng.standard_normal((n, n)).astype(np.float32)

    def stage(name, fn, out):
        t0 = time.perf_counter()
        r = fn()
        dt = time.perf_counter() - t0
        out.append((name, dt))
        return r

    if args.flow:
        import gc

        from bench import _drain_device
        from blim_tpu.engine.evaluation import EvalInputs, evaluation

        def make_inputs(seed):
            r = np.random.default_rng((args.seed,) + tuple(seed) if isinstance(seed, tuple) else seed)
            return EvalInputs(
                captions=make_captions(n, r, args.caption_tokens),
                item_video_idx=np.arange(n),
                features=r.standard_normal(feats.shape).astype(np.float32) * 0.5,
                t2v_iv2=r.standard_normal((n, n)).astype(np.float32) + 0.01,
                v2t_iv2=r.standard_normal((n, n)).astype(np.float32) + 0.01,
            )

        def run(inputs, marks=None):
            # bench.py's discipline: compile-500s and HBM exhaustion next to
            # the resident 7B are transient (deferred deallocs in flight) —
            # settle and retry instead of dying
            for attempt in range(3):
                try:
                    return evaluation(
                        engine, inputs, tok, "MSRVTT", topk=args.topk,
                        cpn=True, has_tvg=not args.zeroshot, verbose=False,
                        timings=marks)
                except Exception as e:
                    transient = ("RESOURCE_EXHAUSTED" in repr(e)
                                 or "remote_compile" in repr(e)
                                 or "HTTP 500" in repr(e))
                    if not transient or attempt == 2:
                        raise
                    print(f"# transient failure (attempt {attempt + 1}); "
                          "settling and retrying", flush=True)
                    gc.collect()
                    _drain_device()
                    time.sleep(10)

        # warmup at the EXACT trial shape (bank shape is part of the compile
        # key — see bench.py measure()); different data than the trials
        run(make_inputs((11, 999)))
        best = None
        for trial in range(args.trials):
            gc.collect()
            _drain_device()
            time.sleep(3)
            inputs = make_inputs((11, trial))
            marks = {}
            t0 = time.perf_counter()
            run(inputs, marks)
            total = time.perf_counter() - t0
            print(f"--- trial {trial}: {total:.2f}s ---", flush=True)
            prev = 0.0
            for name, t in marks.items():
                print(f"{name:16s} @{t:7.2f}s  (+{t - prev:6.2f}s)")
                prev = t
            if best is None or total < best[0]:
                best = (total, marks)
        return

    best = None
    for trial in range(args.trials):
        import gc

        gc.collect()
        time.sleep(2)
        ts = []
        t_all = time.perf_counter()
        vtg_bank = stage("build_vtg(tokenize)", lambda: CaptionBank.build_vtg(
            captions, tok, "MSRVTT", layout), ts)
        vtg_banks = stage("upload_vtg", lambda: engine.upload(vtg_bank, feats), ts)
        tvg_bank = stage("build_tvg(tokenize)", lambda: CaptionBank.build_tvg(
            captions, tok, tvg_layout), ts)
        tvg_banks = stage("upload_tvg(+proj)", lambda: engine.upload(
            tvg_bank, feats, shared_feats=vtg_banks), ts)
        vocab = stage("video_vocab", lambda: jnp.asarray(
            vcf.make_video_vocab(feats), jnp.float32), ts)
        vr_vc = stage("topk", lambda: (topk_pairs(iv2_b, args.topk),
                                       topk_pairs(iv2_a, args.topk)), ts)
        (v_rows, v_cols), (t_rows, t_cols) = vr_vc
        all_caps = np.concatenate([v_cols, t_rows])
        all_vids = np.concatenate([np.arange(n)[v_rows], np.arange(n)[t_cols]])
        u_cap, u_vid, inv = unique_pairs(all_caps, all_vids)
        tvg_out = stage("tvg_score+prior", lambda: engine.score_pairs_tvg_packed(
            tvg_banks, vocab, u_cap, u_vid, with_prior=True), ts)
        stage("vtg_priors", lambda: engine.compute_vtg_priors_packed(vtg_banks), ts)
        stage("vtg_packed", lambda: engine.score_pairs_vtg_packed(
            vtg_banks, u_cap, u_vid), ts)
        total = time.perf_counter() - t_all
        ts.append(("TOTAL", total))
        print(f"--- trial {trial} ---")
        for name, dt in ts:
            print(f"{name:22s} {dt:7.2f}s")
        if best is None or total < best[0]:
            best = (total, ts)
    print("--- best ---")
    for name, dt in best[1]:
        print(f"{name:22s} {dt:7.2f}s")


if __name__ == "__main__":
    main()
