#!/usr/bin/env python
"""On-device A/B for the fine-tuned flow's components: time the packed VTG
pass, the packed-TVG score pass, and the packed-TVG prior pass separately at
the production shape (7B + LoRA), with tunable TVG pack classes and the
per-step token budget.

Timing per CLAUDE.md: np.asarray forces the sync, varied data dodges the
tunnel result cache, best-of-N on a quiet host.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--topk", type=int, default=16)
    ap.add_argument("--caption-tokens", type=int, default=96)
    ap.add_argument("--trials", type=int, default=2)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--classes", default="",
                    help="override TVG pack classes, e.g. '128:160,256:96,512:160'")
    ap.add_argument("--sizes", default="",
                    help="override VTG pack sizes, e.g. '128,256,384,512,640,768'")
    ap.add_argument("--ab", type=int, default=0,
                    help="alternate default knobs (A) vs the --sizes/--classes/"
                         "--no-qbuckets/--no-dedup overrides (B) this many "
                         "times per part, same engine, fresh pairs per round "
                         "(phase-noise-proof A/B)")
    ap.add_argument("--no-qbuckets", action="store_true",
                    help="B arm: coupled class-table classification")
    ap.add_argument("--no-dedup", action="store_true",
                    help="B arm: disable the (length, video) TVG prior dedup")
    ap.add_argument("--budget", type=int, default=0,
                    help="override the per-step token budget (default keeps "
                         "the engine's 2200)")
    ap.add_argument("--parts", default="vtg,tvg,prior",
                    help="comma list of parts to time")
    ap.add_argument("--prior-geom", default="",
                    help="A/B the prior-pass step geometry: 'Atok:Acap,Btok:Bcap' "
                         "(e.g. '2200:8,4096:32' = r4 geometry vs r5 default); "
                         "sets (prior_pack_tokens, prior_g_cap) per arm")
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    if not args.tiny:
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)

    from bench import make_captions
    from blim_tpu.adapters.lora import LoraConfig, init_llm_lora, init_projector_lora
    from blim_tpu.core.config import ModelConfig, tiny_model_config
    from blim_tpu.core.mesh import make_mesh
    from blim_tpu.data.prompts import make_tvg_layout, make_vtg_layout
    from blim_tpu.data.tokenization import ByteFallbackTokenizer
    from blim_tpu.engine.rerank import CaptionBank, RerankEngine, topk_pairs, unique_pairs
    from blim_tpu.models import videochat_flash as vcf
    from blim_tpu.utils.flops import peak_flops_per_chip

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
    engine = RerankEngine(
        params, cfg, layout, tvg_layout, mesh, batch_size=16,
        lora=lora, lora_scale=lcfg.scale, max_device_feature_bytes=budget,
    )
    if args.budget:
        engine.pack_token_budget = args.budget
        print(f"# pack_token_budget override: {args.budget}")
    def set_knobs(k):
        (engine.pack_sizes, engine.tvg_pack_classes,
         engine.tvg_q_buckets, engine.tvg_prior_dedup,
         engine.prior_pack_tokens, engine.prior_g_cap) = k

    knobs_a = (engine.pack_sizes, engine.tvg_pack_classes,
               engine.tvg_q_buckets, engine.tvg_prior_dedup,
               engine.prior_pack_tokens, engine.prior_g_cap)
    knobs_b = knobs_a
    if args.prior_geom:
        (atok, acap), (btok, bcap) = (
            tuple(int(x) for x in arm.split(":"))
            for arm in args.prior_geom.split(","))
        knobs_a = knobs_a[:4] + (atok, acap)
        knobs_b = knobs_b[:4] + (btok, bcap)
        print(f"# prior geometry A=({atok},{acap}) B=({btok},{bcap})")
    if args.classes:
        cls = tuple(
            tuple(int(x) for x in c.split(":")) for c in args.classes.split(",")
        )
        knobs_b = (knobs_b[0], cls, knobs_b[2], knobs_b[3])
        print(f"# classes override: {cls}")
    if args.sizes:
        sizes = tuple(int(x) for x in args.sizes.split(","))
        knobs_b = (sizes, knobs_b[1], knobs_b[2], knobs_b[3])
        print(f"# sizes override: {sizes}")
    if args.no_qbuckets:
        knobs_b = (knobs_b[0], knobs_b[1], None, knobs_b[3])
        print("# B arm: coupled classification (no q_buckets)")
    if args.no_dedup:
        knobs_b = (knobs_b[0], knobs_b[1], knobs_b[2], False)
        print("# B arm: prior dedup OFF")
    if not args.ab:
        set_knobs(knobs_b)

    vtg_bank = CaptionBank.build_vtg(captions, tok, "MSRVTT", layout)
    vtg_banks = engine.upload(vtg_bank, feats)
    tvg_bank = CaptionBank.build_tvg(captions, tok, tvg_layout)
    tvg_banks = engine.upload(tvg_bank, feats, shared_feats=vtg_banks)
    vocab = jnp.asarray(vcf.make_video_vocab(feats), jnp.float32)

    def make_pairs(seed):
        prng = np.random.default_rng(seed)
        iv2_a = prng.standard_normal((n, n)).astype(np.float32)
        iv2_b = prng.standard_normal((n, n)).astype(np.float32)
        v_rows, v_cols = topk_pairs(iv2_b, args.topk)
        t_rows, t_cols = topk_pairs(iv2_a, args.topk)
        all_caps = np.concatenate([v_cols, t_rows])
        all_vids = np.concatenate([np.arange(n)[v_rows], np.arange(n)[t_cols]])
        return unique_pairs(all_caps, all_vids)[:2]

    u_cap, u_vid = make_pairs(0)
    print(f"# union pairs: {len(u_cap)}")

    peak = peak_flops_per_chip(jax.devices()[0]) or float("nan")

    def run_part(name, fn):
        fn()  # warmup/compile
        best = float("inf")
        best_fl = 0.0
        for _ in range(args.trials):
            engine.reset_flops()
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            if dt < best:
                best, best_fl = dt, engine.flops
        mfu = best_fl / best / peak
        print(f"{name:12s} {best:7.2f}s  {best_fl/1e12:8.1f} TF  mfu={mfu:.3f}")
        return best

    fns = {
        "vtg": ("vtg packed", lambda uc, uv: engine.score_pairs_vtg_packed(
            vtg_banks, uc, uv)),
        "vtgprior": ("vtg priors", lambda uc, uv: engine.compute_vtg_priors_packed(
            vtg_banks)),
        "tvg": ("tvg score", lambda uc, uv: engine.score_pairs_tvg_packed(
            tvg_banks, vocab, uc, uv, with_prior=False)),
        "prior": ("tvg s+prior", lambda uc, uv: engine.score_pairs_tvg_packed(
            tvg_banks, vocab, uc, uv, with_prior=True)),
    }
    if args.ab:
        # alternate A (default knobs) and B (overrides) on the SAME engine,
        # fresh pairs each round: phase drift hits both arms equally
        for part in args.parts.split(","):
            name, fn = fns[part]
            for label, knobs in (("A", knobs_a), ("B", knobs_b)):
                set_knobs(knobs)
                fn(u_cap, u_vid)  # warmup/compile this arm's variants
            times = {"A": [], "B": []}
            for r in range(args.ab):
                uc, uv = make_pairs(1000 + r)
                for label, knobs in (("A", knobs_a), ("B", knobs_b)):
                    set_knobs(knobs)
                    engine.reset_flops()
                    t0 = time.perf_counter()
                    fn(uc, uv)
                    dt = time.perf_counter() - t0
                    mfu = engine.flops / dt / peak
                    times[label].append(dt)
                    print(f"{name:12s} round {r} {label}: {dt:7.2f}s  "
                          f"{engine.flops / 1e12:8.1f} TF  mfu={mfu:.3f}",
                          flush=True)
            ma, mb = (sum(times[k]) / len(times[k]) for k in ("A", "B"))
            print(f"{name:12s} A mean {ma:.2f}s  B mean {mb:.2f}s  "
                  f"B/A {mb / ma:.3f}")
        return

    for part in args.parts.split(","):   # run in the GIVEN order
        name, fn = fns[part]
        run_part(name, lambda fn=fn: fn(u_cap, u_vid))


if __name__ == "__main__":
    main()
