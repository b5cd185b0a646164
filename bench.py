#!/usr/bin/env python
"""Benchmark: MSRVTT rerank throughput (queries/sec/chip) + MFU.

North-star (BASELINE.md): MSRVTT-1k zero-shot rerank (1k queries x topk-16,
P(t|v) only) with the 7B model in <= 5 min on a v5e-8 => 3.333 q/s on 8 chips
=> 0.4167 q/s/chip. This bench runs the COMPLETE zero-shot evaluation flow —
v2t candidate-likelihood grid, v2t CPN prior, t2v query-likelihood grid
(reference: retrieval_utils.py:206-262 gated zero-shot) — at the TRUE
north-star shape: 1000 queries, topk 16, the production caption budget of 96
tokens (pipelines/main.py cap_budget), and a realistic caption token-length
distribution (lognormal, median ~12 tokens, tail into the 30s — the Qwen2-BPE
length profile of real MSRVTT captions).

It prints TWO JSON lines:
  1. the zero-shot flow (primary metric, comparable across rounds);
  2. the fine-tuned 6-matrix flow (VTG+TVG both directions + priors, LoRA
     adapters active; reference: retrieval_utils.py:218-250) on a reduced
     query count so TVG shared-prefix regressions are visible per round.

MFU: the rerank engine counts dispatched forward FLOPs analytically
(blim_tpu/utils/flops.py documents the model: 2*matmul params per token +
4*dh*nh*sum(q*kv) attention + lm_head on scored positions); MFU = counted
FLOPs / elapsed / (chips x peak bf16 FLOP/s for the device kind).

Default path uses prefix-KV sharing (one video-prefix forward per group of
topk candidates; CPN prior once per caption); --naive scores every pair with
a full-sequence forward like the reference does.

Note: identical repeated inputs can be result-cached by the axon tunnel, so
every pair uses distinct caption/video data.
"""

import argparse
import json
import os
import sys
import time

import numpy as np


BASELINE_QPS_PER_CHIP = 1000.0 / 300.0 / 8.0  # 0.4167 q/s/chip

WORDS = ["man", "woman", "dog", "cat", "runs", "jumps", "sings", "cooks",
         "dances", "rides", "park", "kitchen", "stage", "street", "ball", "car",
         "talks", "plays", "guitar", "soccer", "child", "group", "slowly", "red"]


def make_captions(n, rng, budget):
    """Synthetic captions with a realistic token-length profile.

    The byte-fallback tokenizer yields ~1 token/char; real MSRVTT captions
    under the Qwen2 BPE average ~12 tokens (median 12, 97.5% <= ~24, rare
    tails to ~40). Sample target lengths from lognormal(ln 12, 0.35) clipped
    to [5, budget-2] and build captions of that many characters.
    """
    lens = np.clip(np.rint(rng.lognormal(np.log(12.0), 0.35, size=n)), 5, budget - 2)
    caps = []
    for L in lens.astype(int):
        words = []
        total = 0
        while total < L:
            w = WORDS[rng.integers(len(WORDS))]
            words.append(w)
            total += len(w) + (1 if total else 0)
        caps.append(" ".join(words)[:L].strip())
    return caps


def _drain_device():
    """Synchronous tiny device roundtrip: the tunnel processes RPCs in order,
    so this returning means every pending dealloc/dispatch has landed."""
    import jax
    import jax.numpy as jnp

    np.asarray(jax.jit(lambda x: x + 1)(jnp.zeros((), jnp.int32)))


def run_flow(engine, inputs_fn, tok, dataset, topk, cpn, finetuned, naive, trials):
    """Time the full evaluation flow; returns (elapsed_s, flops, t2v, v2t).

    `inputs_fn(trial)` builds that trial's EvalInputs. Each trial gets FRESH
    data as a guard against the tunnel's (executable, inputs) result cache:
    a repeated trial on the same captions/features re-dispatches
    byte-identical steps, which a value-keyed cache could serve without
    recompute, inflating best-of-N. (Measured 2026-08-18: reused vs fresh
    trials were EQUAL at the current step granularity — the guard is
    defensive, priced at ~0, and keeps future schedules with fewer/larger
    steps honest.)"""
    import gc

    from blim_tpu.engine.evaluation import evaluation

    elapsed, flops, useful = float("inf"), 0.0, 0.0
    t2v = v2t = None
    for t in range(max(trials, 1)):
        inputs = inputs_fn(t)
        if t:
            # each trial re-uploads the banks; deallocation through the
            # tunnel is deferred, so let the previous trial's frees land
            # before allocating the next copy next to the 7B. The tiny
            # device roundtrip is a FIFO drain barrier: without it the
            # dealloc RPCs land under the NEXT trial's upload (+4-14s
            # of upload wall measured at 256 videos)
            gc.collect()
            _drain_device()
            time.sleep(3)
        for attempt in (0, 1):
            try:
                # inside the retry: a failed attempt's partial flops must not
                # inflate the successful retry's MFU
                engine.reset_flops()
                t0 = time.perf_counter()
                t2v, v2t = evaluation(
                    engine, inputs, tok, dataset, topk=topk, cpn=cpn,
                    has_tvg=finetuned, verbose=False, shared_prefix=not naive,
                )
                dt = time.perf_counter() - t0
                break
            except Exception as e:
                if "RESOURCE_EXHAUSTED" not in repr(e) or attempt:
                    raise
                print("# trial hit RESOURCE_EXHAUSTED; settling and retrying",
                      file=sys.stderr)
                gc.collect()
                time.sleep(10)
        print(f"# trial {t}: {dt:.1f}s", file=sys.stderr)
        if dt < elapsed:
            elapsed, flops, useful = dt, engine.flops, engine.useful_flops
    return elapsed, flops, useful, t2v, v2t



def vit_forward_flops(vcfg, n_clips: int) -> float:
    """Analytic UMT-ViT forward FLOPs per `n_clips` clips (matmuls + attn)."""
    h = vcfg.hidden_size
    s = vcfg.num_frames * (vcfg.image_size // vcfg.patch_size) ** 2
    layers = vcfg.num_hidden_layers + vcfg.return_idx + 1
    per_token = layers * (8.0 * h * h + 2.0 * vcfg.mlp_ratio * h * h * 2)
    attn = layers * 4.0 * s * h  # score+PV per token
    return n_clips * s * (per_token + attn)


def synth_videos(root, n, size=256, frames=48):
    """cv2-encoded mp4s with per-video pseudo-motion content (noise rolls
    horizontally — motion keeps the codec/decoder honest); cached on disk so
    repeated bench runs skip the encode. Returns the sorted path list."""
    import os

    import cv2

    vdir = os.path.join(root, "videos")
    os.makedirs(vdir, exist_ok=True)
    paths = []
    for i in range(n):
        p = os.path.join(vdir, f"synth{i:03d}_{size}x{frames}.mp4")
        if not os.path.exists(p):
            rng = np.random.default_rng(1000 + i)
            base = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
            w = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), 30, (size, size))
            assert w.isOpened(), "cv2 VideoWriter failed to open"
            for t in range(frames):
                w.write(np.roll(base, t * 5, axis=1))
            w.release()
        paths.append(p)
    return paths


def bench_featurizer(args, cfg, dtype, n_chips, peak):
    """Featurizer throughput line (tower + ToMe, no host decode): guards the
    attention-dispatch regression class (a d%128 gate once silently cost 3.6x
    on this exact path — commit 4025935). Followed by the END-TO-END
    extraction line (host decode + preprocess + featurize) over synthesized
    mp4s — the counterpart of the reference's extract.py DataLoader pipeline
    (reference: extract.py:100) — sharing the same resident ViT."""
    import jax
    import jax.numpy as jnp

    from blim_tpu.models import umt_vit
    from blim_tpu.pipelines.extract import make_featurizer

    vit = jax.jit(lambda k: umt_vit.init_params(cfg.vision, k, dtype))(jax.random.key(3))
    jax.block_until_ready(vit)
    feat = make_featurizer(vit, cfg)
    # B=16 measured best on v5e (7.42 videos/s vs 6.90 at B=2, same-session
    # sweep, scripts/abench_featurizer.py / docs/PERF_NOTES_R4.md)
    B = 2 if args.tiny else 16
    rng = np.random.default_rng(1)
    iters = 2 if args.tiny else 5
    # distinct buffers per trial: the tunnel result-caches identical
    # (executable, inputs) pairs
    pix = [
        jnp.asarray(rng.standard_normal(
            (B, cfg.num_clips, cfg.mm_local_num_frames, 3,
             cfg.vision.image_size, cfg.vision.image_size)) * 0.1, dtype)
        for _ in range(iters + 1)
    ]
    np.asarray(feat(pix.pop()))  # compile + warm on its own buffer
    # pipelined: enqueue all trials, drain once — the steady-state rate the
    # production extraction pipeline sees (lag-2 overlap), not a serial
    # round-trip per batch
    t0 = time.perf_counter()
    outs = [feat(p) for p in pix]
    np.asarray(outs[-1])
    best = (time.perf_counter() - t0) / iters
    vps = B / best / n_chips
    line = {
        "metric": "featurizer_videos_per_sec_per_chip",
        "value": round(vps, 3),
        "unit": f"videos/s/chip (UMT-ViT tower + ToMe, batch {B}, "
                f"{cfg.num_clips} clips x {cfg.mm_local_num_frames} frames, no host decode)",
        # baseline: the XLA-attention featurizer measured 2.99 videos/s/chip
        # on v5e (CLAUDE.md scoreboard) — this line catches kernel-dispatch
        # regressions on the d=64 dense flash path
        "vs_baseline": round(vps / 2.99, 3),
        # r4 switched from best-of-serial-round-trips to a pipelined average
        # (enqueue all trials, drain once — the production pipeline's
        # steady-state rate); recorded so round-over-round comparisons don't
        # conflate the methodology change with real speedups (r4 advice)
        "timing": "pipelined_avg",
    }
    if peak:
        fl = vit_forward_flops(cfg.vision, B * cfg.num_clips)
        line["mfu"] = round(fl / best / (n_chips * peak), 4)
    print(json.dumps(line))
    print(f"# featurizer: {best*1e3:.1f} ms/batch", file=sys.stderr)

    # e2e keeps batch 2: 32 videos / B=16 would be two dispatches, all
    # startup; the compute rate barely differs (6.90 vs 7.42 videos/s), so
    # vps at B=16 stays the (slightly strict) compute-only denominator
    bench_extract_e2e(args, cfg, vit, 2, n_chips, vps)

    del vit, feat
    import gc

    gc.collect()


def bench_extract_e2e(args, cfg, vit, B, n_chips, compute_vps):
    """End-to-end extraction: decode (cv2 threads) + uint8 resize +
    featurize-with-device-preprocess, through the production run_extraction
    pipeline (lag-2 in-flight window, DecodePrefetcher). Host-side
    normalize measured ~5x the decode cost on the 1-core host
    (docs/PERF_NOTES_R4.md §2) — production runs it on the TPU."""
    import jax.numpy as jnp

    from blim_tpu.models.umt_vit import UMTImageProcessor
    from blim_tpu.pipelines.extract import (
        make_featurizer, read_frames, resize_for_upload, run_extraction)

    n_vid = 8 if args.tiny else 32
    try:
        paths = synth_videos("/tmp/blim_bench_videos", n_vid)
    except Exception as e:  # no cv2 encoder in this image: skip, don't fail
        print(f"# extract e2e skipped: {e!r}", file=sys.stderr)
        return
    proc = UMTImageProcessor(size=(cfg.vision.image_size,) * 2)
    n_frames = cfg.num_clips * cfg.mm_local_num_frames
    feat = make_featurizer(vit, cfg, device_preprocess=True)

    def decode(p):
        # production rule: raw decoded frames ship when they carry no more
        # pixels than res-{image_size} — the host->device wire (~40MB/s
        # through the tunnel) is the e2e bound, and the featurizer
        # bicubic-resizes on the TPU (resize_for_upload docstring)
        return resize_for_upload(read_frames(p, n_frames), proc, proc.size)

    def on_features(_paths, dev):
        np.asarray(dev, np.float16)  # force the device->host transfer

    # pre-compile the featurize executable at the e2e batch + RAW-SHIP shape
    # (synth videos decode below image_size, so the pipeline uploads raw and
    # resizes on device); compile time must not land inside the timed
    # pipeline. One warm pass of decode is NOT taken: e2e includes cold
    # decode by design.
    probe = decode(paths[0])
    np.asarray(feat(jnp.zeros(
        (B, cfg.num_clips, cfg.mm_local_num_frames, *probe.shape[1:]),
        jnp.uint8)))
    n_ok, elapsed = run_extraction(
        paths, decode, feat, on_features, batch_size=B,
        clips=cfg.num_clips, local_frames=cfg.mm_local_num_frames,
        decode_workers=4, save_iter=10**9, log=lambda *a: None,
    )
    e2e = n_ok / elapsed / n_chips
    line = {
        "metric": "extract_videos_per_sec_e2e",
        "value": round(e2e, 3),
        "unit": f"videos/s/chip end-to-end (cv2 decode + raw-uint8 upload + "
                f"device-side resize/normalize + featurize, {n_ok} synthesized "
                f"mp4s, 4 decode threads, batch {B})",
        # baseline: the XLA compute-only featurizer rate (2.99 videos/s/chip)
        # — an e2e rate above it means decode fully hides behind compute
        "vs_baseline": round(e2e / 2.99, 3),
        "compute_only_vps": round(compute_vps, 3),
        # the round-3 verdict's criterion: e2e >= 0.8x compute-only, else
        # the pipeline is decode-bound on this host
        "e2e_over_compute": round(e2e / compute_vps, 3) if compute_vps else None,
    }
    print(json.dumps(line))
    print(f"# extract e2e: {n_ok} videos in {elapsed:.1f}s", file=sys.stderr)


def bench_train_step(args, cfg, params, tok, n_chips, peak):
    """7B LoRA train-step line (VTG+TVG losses, fused fwd+bwd)."""
    import jax
    import jax.numpy as jnp

    from blim_tpu.core.mesh import make_mesh
    from blim_tpu.data.collate import collate_train_batch
    from blim_tpu.data.prompts import make_tvg_layout, make_vtg_layout
    from blim_tpu.engine import train as train_lib
    from blim_tpu.utils.flops import (
        full_forward_flops, train_step_executed_flops, tvg_head_flops,
    )

    tok_budget = args.caption_tokens
    vtg_l = make_vtg_layout(tok, "MSRVTT", cfg.video_tokens_vtg, tok_budget)
    tvg_l = make_tvg_layout(tok, cfg.num_clips, tok_budget)
    B = 4
    rng = np.random.default_rng(2)
    batches = []
    for _ in range(3):
        caps = make_captions(B, rng, tok_budget)
        feats = rng.standard_normal(
            (B, cfg.num_clips, cfg.tokens_per_clip, cfg.mm_hidden_size)
        ).astype(np.float32)
        b = collate_train_batch(caps, feats, np.arange(B) % 4, tok, "MSRVTT", vtg_l, tvg_l)
        batches.append({k: jnp.asarray(v) for k, v in b.items()})
    vocab = jnp.asarray(
        rng.standard_normal((64, cfg.num_clips, cfg.mm_hidden_size)), jnp.float32
    )
    tcfg = train_lib.TrainConfig(lr=1e-4, warmup_epochs=0.0, epochs=1)
    mesh = make_mesh()
    tx = train_lib.make_optimizer(tcfg, steps_per_epoch=100)
    trainable = train_lib.init_trainable(
        jax.random.key(1), cfg, tcfg,
        visual_head=jnp.zeros((cfg.llm.hidden_size, cfg.mm_hidden_size)) + 0.02,
    )
    state = train_lib.TrainState(jnp.asarray(0), trainable, tx.init(trainable))
    step = train_lib.make_train_step(cfg, tcfg, tx, vtg_l, tvg_l, mesh=mesh)
    for i in range(2):
        state, m = step(state, params, batches[i % 3], vocab, jax.random.key(i))
        np.asarray(m["loss"])
    best = float("inf")
    iters = 2 if args.tiny else 5
    for i in range(iters):
        t0 = time.perf_counter()
        state, m = step(state, params, batches[i % 3], vocab, jax.random.key(10 + i))
        np.asarray(m["loss"])
        best = min(best, time.perf_counter() - t0)
    T_vtg = vtg_l.caption_start + vtg_l.max_caption_tokens + len(vtg_l.terminator_ids)
    wl = vtg_l.label_window[1]
    # legacy 4x-fwd rule, kept for round-over-round continuity only: it bills
    # a dW per base matmul that the frozen-base LoRA backward never executes
    fwd = (full_forward_flops(cfg.llm, B, T_vtg, lm_positions=wl)
           + full_forward_flops(cfg.llm, B, tvg_l.seq_len)
           + tvg_head_flops(cfg, B * cfg.num_clips, 64))
    # honest executed work: 3x base matmuls + 4x attention + LoRA/head/vh
    # terms — the formula lives in utils/flops.train_step_executed_flops
    executed = train_step_executed_flops(
        cfg, B, T_vtg, wl, tvg_l.seq_len, vocab_videos=64,
        lora_r=tcfg.lora.r,
        vtg_video_tokens=cfg.num_clips * cfg.tokens_per_clip,
        tvg_video_tokens=cfg.num_clips * cfg.tokens_per_clip,
    )["executed"]
    line = {
        "metric": "train_step_ms",
        "value": round(best * 1e3, 1),
        "unit": f"ms/step (7B LoRA train step, batch {B}, caption budget "
                f"{tok_budget}, VTG+TVG losses; lower is better)",
        # baseline: round-1 measured 817 ms at this batch (budget 32)
        "vs_baseline": round(817.0 / (best * 1e3), 3),
    }
    if peak:
        line["mfu"] = round(executed / best / (n_chips * peak), 4)
        line["mfu_4x_rule"] = round(4.0 * fwd / best / (n_chips * peak), 4)
    print(json.dumps(line))
    print(f"# train: {best*1e3:.1f} ms/step, loss {float(m['loss']):.3f}", file=sys.stderr)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true", help="tiny model on CPU (smoke test)")
    ap.add_argument("--queries", type=int, default=1000)
    ap.add_argument("--topk", type=int, default=16)
    ap.add_argument("--batch", type=int, default=16, help="pairs per chip per step (naive path)")
    ap.add_argument("--groups", type=int, default=2, help="prefix groups per chip per step")
    ap.add_argument("--prior-batch", type=int, default=64)
    ap.add_argument("--caption-tokens", type=int, default=96,
                    help="caption token budget (96 = the production MSRVTT default)")
    ap.add_argument("--naive", action="store_true", help="disable prefix-KV sharing")
    ap.add_argument("--no-cpn", action="store_true", help="skip the CPN prior pass")
    ap.add_argument("--finetuned", action="store_true",
                    help="make the fine-tuned 6-matrix eval the PRIMARY metric")
    ap.add_argument("--skip-finetuned-line", action="store_true",
                    help="suppress the secondary fine-tuned JSON line")
    ap.add_argument("--feature-budget", type=int, default=-1,
                    help="max_device_feature_bytes (-1 = auto: resident bank "
                         "if it fits 256MB, else host-streamed)")
    ap.add_argument("--finetuned-queries", type=int, default=256,
                    help="query count for the secondary fine-tuned line")
    ap.add_argument("--reuse-trial-data", action="store_true",
                    help="legacy: reuse identical inputs across trials "
                         "(vulnerable to tunnel result-cache inflation)")
    ap.add_argument("--trials", type=int, default=1,
                    help="measured trials; best is reported. Default 1: the "
                         "tunnel's fast/slow phases are multi-minute, so "
                         "back-to-back trials share a phase and best-of-2 "
                         "mostly re-buys one trial's wall time (use the "
                         "interleaved ratio for round-over-round comparisons)")
    ap.add_argument("--interleave-queries", type=int, default=32,
                    help="query count for the phase-immune A-B-A-B interleave "
                         "of HEAD vs --naive (speedup_vs_naive_interleaved); "
                         "0 disables. Per-query naive cost is shape-"
                         "independent while the shared flow pays an O(1) "
                         "ramp, so small-query ratios UNDERSTATE the "
                         "headline-shape speedup (docs/PERF_NOTES_R5.md)")
    ap.add_argument("--interleave-rounds", type=int, default=1)
    ap.add_argument("--skip-aux-lines", action="store_true",
                    help="suppress the featurizer and train-step JSON lines")
    ap.add_argument("--aux-only", action="store_true",
                    help="internal: run ONLY the featurizer + e2e-extract "
                         "section and exit (the parent bench spawns this in "
                         "a subprocess with a timeout so an environment "
                         "wedge can't eat the headline lines)")
    ap.add_argument("--budget", type=float,
                    default=float(os.environ.get("BLIM_BENCH_BUDGET_S", 860)),
                    help="wall-clock budget (s). The four headline metric "
                         "lines always run (lean); the expensive extras "
                         "(naive-interleave ratio sessions) are skipped when "
                         "the remaining budget can't fit them — a driver "
                         "timeout must never eat a headline line again "
                         "(BENCH_r04 rc=124)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    t_bench0 = time.monotonic()

    def remaining() -> float:
        return args.budget - (time.monotonic() - t_bench0)

    def mark(label: str) -> None:
        # section timestamps: the driver kills at an unknown wall budget, so
        # the stderr trail must show where the seconds went (BENCH_r04 rc=124)
        print(f"# t={time.monotonic() - t_bench0:.0f}s {label}", file=sys.stderr)

    if args.tiny:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp

    # persistent compile cache: repeated bench runs (driver rounds) skip the
    # multi-minute remote compiles. TPU runs only — caching CPU AOT results
    # across heterogeneous hosts risks SIGILL (machine-feature mismatch).
    if not args.tiny:
        try:
            cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
            os.makedirs(cache_dir, exist_ok=True)
            jax.config.update("jax_compilation_cache_dir", cache_dir)
        except Exception:
            pass

    from blim_tpu.core.config import ModelConfig, tiny_model_config
    from blim_tpu.core.mesh import make_mesh
    from blim_tpu.data.prompts import make_tvg_layout, make_vtg_layout
    from blim_tpu.data.tokenization import ByteFallbackTokenizer
    from blim_tpu.engine.evaluation import EvalInputs, evaluation, warm_session
    from blim_tpu.engine.rerank import RerankEngine
    from blim_tpu.models import videochat_flash as vcf
    from blim_tpu.utils.flops import peak_flops_per_chip

    # tiny image 128 (not the 64 default): 256 patch tokens/clip compress to
    # the 64-token ToMe target; 64px lands exactly ON the target and asserts
    cfg = (tiny_model_config(vocab_size=152064, image_size=128)
           if args.tiny else ModelConfig())
    tok = ByteFallbackTokenizer()
    dataset = "MSRVTT"
    layout = make_vtg_layout(tok, dataset, cfg.video_tokens_vtg, max_caption_tokens=args.caption_tokens)
    tvg_layout = make_tvg_layout(tok, cfg.num_clips, max_caption_tokens=args.caption_tokens)

    n = args.queries

    dtype = jnp.float32 if args.tiny else jnp.bfloat16
    n_chips = len(jax.devices())
    peak = peak_flops_per_chip(jax.devices()[0])

    if args.aux_only:
        # child mode (see the aux-subprocess block below): ONLY the
        # featurizer + e2e-extract lines, in a process of their own — a
        # tunnel wedge here is killed by the parent's timeout instead of
        # eating the headline rerank/train lines (2026-08-20: a device->host
        # stall wedged bench_featurizer >13min twice in a row)
        mark("featurizer section start (aux child)")
        bench_featurizer(args, cfg, dtype, n_chips, peak)
        mark("featurizer+extract sections done (aux child)")
        return

    def init_7b():
        p = jax.jit(lambda k: vcf.init_params(cfg, k, dtype))(
            jax.random.key(args.seed))
        jax.block_until_ready(p)
        return p

    params = init_7b()
    mark("7B params initialized")

    def make_inputs(m, trial=0):
        # fresh data per (size, trial): result-cache guard, see run_flow
        r = np.random.default_rng((args.seed, m, trial))
        if args.reuse_trial_data:
            r = np.random.default_rng((args.seed, m))
        return EvalInputs(
            captions=make_captions(m, r, args.caption_tokens),
            item_video_idx=np.arange(m),
            features=np.asarray(r.standard_normal(
                (m, cfg.num_clips, cfg.tokens_per_clip, cfg.mm_hidden_size)),
                np.float32) * 0.5,
            t2v_iv2=r.standard_normal((m, m)).astype(np.float32) + 0.01,
            v2t_iv2=r.standard_normal((m, m)).astype(np.float32) + 0.01,
        )

    mesh = make_mesh()
    n_chips = len(jax.devices())
    peak = peak_flops_per_chip(jax.devices()[0])

    # fine-tuned serving includes the LoRA adapters (reference: a fine-tuned
    # eval always runs the peft-wrapped model, main.py:105)
    from blim_tpu.adapters.lora import LoraConfig, init_llm_lora, init_projector_lora

    lcfg = LoraConfig()
    lora = {
        "llm": init_llm_lora(jax.random.key(7), cfg.llm, lcfg, dtype),
        "projector": init_projector_lora(
            jax.random.key(8), cfg.mm_hidden_size, cfg.llm.hidden_size, lcfg, dtype
        ),
    }

    def build_engine(finetuned, m):
        # feature residency must match between the warmup (small upload) and
        # the measured run (m videos), else the warmup compiles the wrong
        # step variant: pin the engine to the mode the big run will use
        feat_bytes = m * cfg.num_clips * cfg.tokens_per_clip * cfg.mm_hidden_size * 2
        auto_budget = float("inf") if args.tiny else 256 * 2**20
        if args.feature_budget >= 0:
            budget = args.feature_budget
        else:
            budget = 0 if feat_bytes > auto_budget else None
        return RerankEngine(
            params, cfg, layout, tvg_layout if finetuned else None, mesh,
            batch_size=args.batch, groups_per_step=args.groups,
            prior_batch=args.prior_batch,
            lora=lora if finetuned else None,
            lora_scale=lcfg.scale if finetuned else 0.0,
            max_device_feature_bytes=budget,
        )

    def warmup_with_retry(fn, attempts=4):
        """The remote compile helper intermittently 500s (TPU_WORKER_HOSTNAMES
        race); compiles are cached, so retrying is cheap."""
        for i in range(attempts):
            try:
                return fn()
            except Exception as e:
                transient = ("remote_compile" in repr(e) or "HTTP 500" in repr(e)
                             or "RESOURCE_EXHAUSTED" in repr(e))
                if not transient or i == attempts - 1:
                    raise
                print(f"# transient compile failure (attempt {i + 1}): retrying",
                      file=sys.stderr)
                import gc

                gc.collect()  # free any engine freed only by cycle collection
                time.sleep(10)

    def make_warm_inputs(m, salt=7919):
        # DIFFERENT data than the trials (separate rng stream) — the tunnel
        # result-caches identical (executable, inputs) pairs
        wrng = np.random.default_rng(args.seed + salt)
        return EvalInputs(
            captions=make_captions(m, wrng, args.caption_tokens),
            item_video_idx=np.arange(m),
            features=np.asarray(wrng.standard_normal(
                (m, cfg.num_clips, cfg.tokens_per_clip, cfg.mm_hidden_size)),
                np.float32) * 0.5,
            t2v_iv2=wrng.standard_normal((m, m)).astype(np.float32) + 0.01,
            v2t_iv2=wrng.standard_normal((m, m)).astype(np.float32) + 0.01,
        )

    warm_workers = int(os.environ.get("BLIM_WARM_WORKERS", "8"))

    def measure(finetuned, m, trials):
        mark(f"building {'finetuned' if finetuned else 'zero-shot'} engine (m={m})")
        engine = build_engine(finetuned, m)
        # warm at the trial's EXACT item count: the packed steps take whole
        # bank arrays (feats (V,...), first_ids/tvg_embeds (n_caps,...)) as
        # jit inputs, so bank shape is part of the compile key and a warmup
        # at a different size compiles executables the trial can never reuse
        # (2026-08-18: a 192-item warmup before a 256-query fine-tuned trial
        # left EVERY step to remote-compile in the measured trial: 131.9s vs
        # 46.2s cache-warm). warm_session loads every reachable executable
        # (exhaustive combo enumeration + a real same-shape upload) WITHOUT
        # the full warm evaluation's redundant O(N^2) scoring sweep, which
        # cost 80-160s at 1000 queries in the r4 bench.
        from blim_tpu.engine import aot_cache

        aot0 = aot_cache.stats()
        t_w0 = time.perf_counter()
        n_exec = warmup_with_retry(lambda: warm_session(
            engine, make_warm_inputs(m), tok, dataset,
            has_tvg=finetuned, cpn=not args.no_cpn,
            naive_batches=1 if args.naive else 0, packed=not args.naive,
            workers=warm_workers))
        warm_total_s = time.perf_counter() - t_w0
        warmup_s = engine.last_warmup_s
        aot1 = aot_cache.stats()
        aot = {k: aot1[k] - aot0[k] for k in aot1}
        print(f"# warm: {n_exec} packed executables in {warmup_s:.1f}s "
              f"(session warm total {warm_total_s:.1f}s, AOT trace cache: "
              f"{aot['loaded']} loaded / {aot['exported']} exported / "
              f"{aot['native']} fallback)", file=sys.stderr)
        # drop + drain the warmup's banks so their deallocs don't land
        # under trial 0's upload (see run_flow's trial-boundary barrier)
        import gc

        gc.collect()
        _drain_device()
        elapsed, flops, useful, t2v, v2t = run_flow(
            engine, lambda t: make_inputs(m, t), tok, dataset, args.topk,
            not args.no_cpn, finetuned, args.naive, trials,
        )
        key = "candidate_likelihood" if finetuned else "query_likelihood"
        for name, mat in [("t2v", t2v[key]), ("v2t", v2t["candidate_likelihood"])]:
            cells = mat[mat > -100.0]
            assert len(cells) and np.isfinite(cells).all(), f"bad scores in {name}"
        qps = m / elapsed / n_chips
        mfu = flops / elapsed / (n_chips * peak) if peak else None
        useful_mfu = useful / elapsed / (n_chips * peak) if peak else None
        useful_frac = useful / flops if flops else None
        # release the engine's device state NOW: the next measure() builds a
        # second engine next to the resident 7B (the engine holds no cycles,
        # so `del` frees; close() guards against stray references)
        engine.close()
        del engine
        return (qps, mfu, flops, elapsed, useful_mfu, useful_frac,
                warmup_s, warm_total_s, aot)

    def interleaved_naive_ratio(finetuned, mi, rounds):
        """Phase-immune speedup over the reference-style flow: alternate
        HEAD's schedule with the pinned --naive full-sequence path within ONE
        session (A-B-A-B, fresh inputs each run). The tunnel drifts between
        multi-minute fast/slow phases (±30%, ROUND3.md §8), so absolute q/s
        across bench runs is phase-hostage — adjacent alternation cancels the
        phase and makes the ratio comparable round-over-round."""
        engine = build_engine(finetuned, mi)

        def one(shared, t):
            inputs = make_inputs(mi, trial=1000 + t)
            t0 = time.perf_counter()
            evaluation(engine, inputs, tok, dataset, topk=args.topk,
                       cpn=not args.no_cpn, has_tvg=finetuned, verbose=False,
                       shared_prefix=shared)
            return time.perf_counter() - t0

        # compile both variants at this bank shape (excluded from timing):
        # warm_session loads the packed set for the shared runs AND touches
        # the naive step executables directly — the old warm (a full shared
        # eval + a full naive eval) re-paid an entire naive round (~60s at
        # 32 queries) just to compile 2-4 step shapes
        warmup_with_retry(lambda: warm_session(
            engine, make_warm_inputs(mi, salt=4211), tok, dataset,
            has_tvg=finetuned, cpn=not args.no_cpn, naive_batches=1,
            workers=warm_workers))
        mark(f"interleave warm done (finetuned={finetuned}, "
             f"warmup {engine.last_warmup_s:.1f}s)")
        t_shared = t_naive = 0.0
        for r in range(rounds):
            t_shared += one(True, 2 + 2 * r)
            t_naive += one(False, 3 + 2 * r)
        engine.close()
        del engine
        print(f"# interleaved A/B at {mi} queries: shared {t_shared:.1f}s "
              f"vs naive {t_naive:.1f}s", file=sys.stderr)
        return t_naive / t_shared

    def flow_line(finetuned, m, meas, trials):
        (qps, mfu, flops, elapsed, useful_mfu, useful_frac,
         warmup_s, warm_total_s, aot) = meas
        mode = "finetuned 6-matrix" if finetuned else "full zero-shot"
        model = "7B+LoRA" if finetuned else "7B"
        line = {
            "metric": ("msrvtt_finetuned_rerank_queries_per_sec_per_chip"
                       if finetuned else
                       "msrvtt_zeroshot_rerank_queries_per_sec_per_chip"),
            "value": round(qps, 4),
            "unit": f"queries/s/chip ({mode} flow, topk={args.topk}, {model}, "
                    f"{m} queries, caption budget {args.caption_tokens})"
                    if not args.tiny else "queries/s/chip (tiny smoke)",
            "vs_baseline": round(qps / BASELINE_QPS_PER_CHIP, 3),
            # timed region: fresh-input full flows, best of `trials`;
            # warmup (executable loads) is untimed steady-state-serving
            # convention but REPORTED — a one-shot cold eval pays it in full
            "timing": f"best_of_{trials}_fresh_input_trials",
            "warmup_s": round(warmup_s, 1),
            "warm_total_s": round(warm_total_s, 1),
            # disk AOT trace cache (engine/aot_cache.py): combos whose
            # trace+lowering was skipped via a jax.export blob vs traced
            # fresh this process (blobs persist at BLIM_AOT_CACHE_DIR)
            "aot_loaded": aot["loaded"],
            "aot_exported": aot["exported"],
        }
        if mfu is not None:
            line["mfu"] = round(mfu, 4)
            line["model_tflops"] = round(flops / 1e12, 1)
            # useful-token MFU: the request's zero-waste oracle over elapsed
            # time. mfu (dispatched) says how busy the MXU was; useful_mfu
            # says how much of that was the workload — padding regressions
            # show up ONLY here.
            line["useful_mfu"] = round(useful_mfu, 4)
            line["useful_fraction"] = round(useful_frac, 4)
        return line, elapsed

    # ---- the four headline metric lines run FIRST, lean (the driver's
    # timeout must never eat one again: BENCH_r04 died at rc=124 with the
    # fine-tuned and train lines unprinted). Expensive extras come after,
    # budget-gated, and re-emit enriched lines (the driver parses the LAST
    # JSON line; the primary flow line is re-emitted at the very end).
    primary_finetuned = args.finetuned
    result, elapsed = flow_line(
        primary_finetuned, n, measure(primary_finetuned, n, args.trials),
        args.trials)
    print(json.dumps(result))
    print(f"# primary: {n} queries in {elapsed:.1f}s on {n_chips} chip(s), "
          f"cpn={not args.no_cpn}, shared_prefix={not args.naive}, "
          f"budget left {remaining():.0f}s", file=sys.stderr)

    line2 = None
    if not primary_finetuned and not args.skip_finetuned_line and not args.tiny:
        m2 = min(args.finetuned_queries, n)
        line2, elapsed2 = flow_line(True, m2, measure(True, m2, args.trials),
                                    args.trials)
        print(json.dumps(line2))
        print(f"# finetuned: {m2} queries in {elapsed2:.1f}s, "
              f"budget left {remaining():.0f}s", file=sys.stderr)

    if not args.skip_aux_lines:
        mark("train section start")
        bench_train_step(args, cfg, params, tok, n_chips, peak)
        mark("train section done")
        if args.tiny:  # CPU smoke: inline, no subprocess machinery
            bench_featurizer(args, cfg, dtype, n_chips, peak)

    # ---- aux lines (featurizer + e2e extract) AFTER the headline rerank +
    # train lines, in a SUBPROCESS with a wall timeout: the primary metrics
    # can no longer be eaten by either the driver's external kill
    # (BENCH_r04 rc=124) or an environment wedge inside the aux section
    # (2026-08-20: a wedged device->host transfer froze bench_featurizer
    # >13min twice; the whole-process kill was the only recovery). The ViT
    # (~0.6GB) doesn't fit next to a resident 7B on one v5e, so the parent
    # drops its params and re-inits them (on-device, deterministic same key)
    # once the child exits.
    if not args.skip_aux_lines and not args.tiny:
        aux_timeout = min(540.0, remaining() - 120.0)
        if aux_timeout < 180.0:
            print(f"# skipping featurizer/extract aux child: "
                  f"{remaining():.0f}s left", file=sys.stderr)
        else:
            import gc
            import subprocess

            params = None  # free the 7B's HBM for the child's ViT
            gc.collect()
            _drain_device()
            mark(f"aux child start (timeout {aux_timeout:.0f}s)")
            try:
                # stdout/stderr inherited: the child's JSON lines land on OUR
                # stdout in order (the parent prints nothing while it runs)
                subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--aux-only",
                     "--seed", str(args.seed)],
                    timeout=aux_timeout, check=False)
            except subprocess.TimeoutExpired:
                print("# aux child timed out (tunnel wedge?); featurizer/"
                      "extract lines skipped this run", file=sys.stderr)
            mark("aux child done")
            params = init_7b()
            mark("7B params re-initialized")

    # ---- extras: phase-immune interleaved naive ratios (each rebuilds an
    # engine at the interleave shape and pays one naive round — the largest
    # optional cost in the bench; see --interleave-queries help for why a
    # 32-query ratio is a fair-but-conservative stand-in for the headline
    # shape)
    if args.interleave_queries > 0 and not args.naive:
        mi = min(args.interleave_queries, 8) if args.tiny else args.interleave_queries
        ri = 1 if args.tiny else args.interleave_rounds

        def fit_mi(m, per32):
            # conservative wall estimate (s): warm session + naive rounds.
            # Budget-adaptive: halve the query count (ratio stays valid —
            # small shapes only UNDERSTATE the speedup, PERF_NOTES_R5 §1)
            # rather than skip, down to 8 queries.
            if args.tiny:
                return m
            while m >= 8:
                if remaining() > 70 + (per32 * m / 32) * ri + 40:
                    return m
                m //= 2
            return 0

        mz = fit_mi(mi, 70)
        if mz:
            ratio = interleaved_naive_ratio(primary_finetuned, mz, ri)
            result["speedup_vs_naive_interleaved"] = round(ratio, 2)
            result["interleave_queries"] = mz
        else:
            print(f"# skipping zero-shot interleave: {remaining():.0f}s left",
                  file=sys.stderr)
        if line2 is not None:
            mf = fit_mi(mi, 140)
            if mf:
                ratio2 = interleaved_naive_ratio(True, mf, ri)
                line2["speedup_vs_naive_interleaved"] = round(ratio2, 2)
                line2["interleave_queries"] = mf
            else:
                print(f"# skipping finetuned interleave: {remaining():.0f}s "
                      f"left", file=sys.stderr)

    # final re-emission: enriched lines, primary LAST (the driver records the
    # last JSON line as the round's parsed headline)
    if line2 is not None:
        print(json.dumps(line2))
    print(json.dumps(result))
    print(f"# done in {time.monotonic() - t_bench0:.0f}s of "
          f"{args.budget:.0f}s budget", file=sys.stderr)


if __name__ == "__main__":
    main()
