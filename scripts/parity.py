#!/usr/bin/env python
"""Executable accuracy-parity harness — PARITY.md's 5-step protocol.

Runs every step that its artifacts allow and prints PASS / FAIL / SKIP per
step; exit code 1 iff any step FAILs. Ground truth is the PyTorch reference
(reference: dataloader/base_dataset.py:60-105 tokenization,
retrieval_utils.py:170-281 + training_utils.py:106-221 eval output).

With real artifacts:

    python scripts/parity.py \
        --model_path ./pretrained/VideoChat-Flash-Qwen2-7B_res448 \
        --data_root ./data --scores_dir ./scores --dataset MSRVTT \
        [--reference /root/reference] [--videos_dir ./videos] \
        [--expected expected.json] [--train_steps 8]

  expected.json (from a reference run's log.txt) looks like
  {"blim": {"t2v_r1": 57.2, "t2v_r5": ..., "v2t_r1": ..., "v2t_r5": ...}}.

Self-test without artifacts (tiny model, synthetic data, CPU):

    python scripts/parity.py --synthetic

Steps:
  1 tokenizer goldens — build_vtg_example/build_tvg_example vs the
    reference's get_vtg_id/get_tvg_id run in-process from --reference.
  2 logit parity     — converted checkpoint vs torch (HF Qwen2, eager
    attention) on text-only inputs; truncatable via --logit_layers to
    bound host memory for the 7B.
  3 feature parity   — our extractor vs cached reference .pth features
    (cos-sim > 0.999) on --videos_dir videos.
  4 score parity     — full zero-shot rerank with the published preset
    fusion weights; R@1/R@5 within 0.2 of --expected.
  5 train trajectory — preset fine-tune steps; losses must be finite and
    trend down; compares per-step losses to --expected "train_losses"
    when present.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import types

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULTS = []


def report(step: str, status: str, detail: str = ""):
    RESULTS.append((step, status, detail))
    print(f"[{status:4s}] {step}" + (f" — {detail}" if detail else ""), flush=True)


# ---------------------------------------------------------------------------
# step 1: tokenizer goldens
# ---------------------------------------------------------------------------

def step_tokenizer_goldens(args, tokenizer, captions):
    name = "1 tokenizer goldens"
    try:
        sys.path.insert(0, args.reference)
        from dataloader.base_dataset import BaseDataset  # noqa: reference code
    except Exception as e:  # pragma: no cover - depends on env
        report(name, "SKIP", f"reference not importable from {args.reference}: {e}")
        return
    finally:
        if args.reference in sys.path:
            sys.path.remove(args.reference)

    from blim_tpu.data.prompts import build_tvg_example, build_vtg_example

    ref = BaseDataset.__new__(BaseDataset)
    ref.args = types.SimpleNamespace(dataset=args.dataset)
    ref.tokenizer = tokenizer
    ref.tvg_prefix_length = ref.get_tvg_prefix_length(
        "Generate a video given the caption."
    )

    from blim_tpu.data.prompts import get_tvg_prefix_length

    mismatches = []
    if ref.tvg_prefix_length != get_tvg_prefix_length(tokenizer):
        mismatches.append("tvg_prefix_length")
    for cap in captions:
        item = {"text": cap}
        r_ids, r_labels, r_mask = ref.get_vtg_id(item)
        ours = build_vtg_example(cap, args.dataset, tokenizer)
        if (not np.array_equal(ours["input_ids"], r_ids.numpy())
                or not np.array_equal(ours["labels"], r_labels.numpy())
                or not np.array_equal(ours["attention_mask"], r_mask.numpy())):
            mismatches.append(f"vtg:{cap[:40]!r}")
        r_ids, r_labels, r_mask = ref.get_tvg_id(item)
        ours = build_tvg_example(cap, tokenizer)
        if (not np.array_equal(ours["input_ids"], r_ids.numpy())
                or not np.array_equal(ours["labels"], r_labels.numpy())
                or not np.array_equal(ours["attention_mask"], r_mask.numpy())):
            mismatches.append(f"tvg:{cap[:40]!r}")
    if mismatches:
        report(name, "FAIL", f"{len(mismatches)} mismatches, first: {mismatches[0]}")
    else:
        report(name, "PASS", f"{len(captions)} captions, vtg+tvg ids/labels/masks exact")


# ---------------------------------------------------------------------------
# step 2: logit parity vs torch
# ---------------------------------------------------------------------------

def step_logit_parity(args, state_dict, config):
    name = "2 logit parity"
    try:
        import jax.numpy as jnp
        import torch
        from transformers import Qwen2Config as HFConfig
        from transformers.models.qwen2 import Qwen2ForCausalLM

        from blim_tpu.checkpoints.convert import convert_qwen2
        from blim_tpu.models import qwen2

        L = min(args.logit_layers or config.llm.num_hidden_layers,
                config.llm.num_hidden_layers)
        import dataclasses

        llm_cfg = dataclasses.replace(config.llm, num_hidden_layers=L)
        hf_cfg = HFConfig(
            vocab_size=llm_cfg.vocab_size, hidden_size=llm_cfg.hidden_size,
            intermediate_size=llm_cfg.intermediate_size, num_hidden_layers=L,
            num_attention_heads=llm_cfg.num_attention_heads,
            num_key_value_heads=llm_cfg.num_key_value_heads,
            rope_theta=llm_cfg.rope_theta, rms_norm_eps=llm_cfg.rms_norm_eps,
            max_position_embeddings=llm_cfg.max_position_embeddings,
            tie_word_embeddings=llm_cfg.tie_word_embeddings,
            attn_implementation="eager",
        )
        hf = Qwen2ForCausalLM(hf_cfg).eval()
        wanted = set(hf.state_dict().keys())
        sub = {k: torch.tensor(np.asarray(v, np.float32))
               for k, v in state_dict.items() if k in wanted}
        missing = wanted - set(sub.keys())
        if missing:
            report(name, "SKIP", f"checkpoint lacks {sorted(missing)[:3]}...")
            return
        hf.load_state_dict(sub)

        params = convert_qwen2(
            {k: np.asarray(v, np.float32) for k, v in state_dict.items()
             if k.startswith("model.") or k == "lm_head.weight"},
            llm_cfg,
        )
        rng = np.random.default_rng(0)
        ids = rng.integers(0, min(llm_cfg.vocab_size, 50000), size=(2, 24))
        del state_dict  # free the fp32 torch copy before the jax forward
        with torch.no_grad():
            ref = hf(torch.tensor(ids)).logits.numpy()
        ours = np.asarray(qwen2.forward_logits(params, llm_cfg, jnp.asarray(ids)))
        delta = float(np.abs(ours - ref).max())
        scale = float(np.abs(ref).max())
        if delta <= max(1e-2 * scale, args.logit_tol):
            report(name, "PASS", f"{L} layers, max |d logit| = {delta:.2e} (scale {scale:.1f})")
        else:
            report(name, "FAIL", f"max |d logit| = {delta:.2e} exceeds tolerance")
    except Exception as e:
        report(name, "FAIL", f"crashed: {e!r}")


# ---------------------------------------------------------------------------
# step 3: feature parity
# ---------------------------------------------------------------------------

def step_feature_parity(args, params, config):
    name = "3 feature parity"
    if not args.videos_dir or not os.path.isdir(args.videos_dir):
        report(name, "SKIP", "no --videos_dir with raw videos")
        return
    if "vision_tower" not in params:
        report(name, "SKIP", "checkpoint has no vision tower weights")
        return
    feat_dir = os.path.join(args.data_root, args.dataset, "features")
    try:
        import glob

        import jax.numpy as jnp
        import torch

        from blim_tpu.models.umt_vit import UMTImageProcessor
        from blim_tpu.pipelines.extract import make_featurizer, read_frames

        featurize = make_featurizer(params["vision_tower"], config)
        proc = UMTImageProcessor(config.vision.image_size)
        vids = sorted(glob.glob(os.path.join(args.videos_dir, "*")))[: args.feature_videos]
        worst = 1.0
        checked = 0
        for vp in vids:
            vid = os.path.splitext(os.path.basename(vp))[0]
            ref_path = os.path.join(feat_dir, f"{vid}.pth")
            if not os.path.exists(ref_path):
                continue
            frames = read_frames(vp, num_frames=config.num_clips * config.mm_local_num_frames)
            pixels = proc.preprocess(frames)
            lf = config.mm_local_num_frames
            clips = len(pixels) // lf
            pix = jnp.asarray(pixels[: clips * lf].reshape(1, clips, lf, *pixels.shape[1:]))
            ours = np.asarray(featurize(pix))[0]
            ref = torch.load(ref_path, map_location="cpu", weights_only=True).float().numpy()
            a = ours.reshape(-1, ours.shape[-1]).astype(np.float64)
            b = ref.reshape(-1, ref.shape[-1]).astype(np.float64)
            cos = (a * b).sum(-1) / (np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1) + 1e-9)
            worst = min(worst, float(cos.min()))
            checked += 1
        if not checked:
            report(name, "SKIP", "no videos with matching reference features")
        elif worst > 0.999:
            report(name, "PASS", f"{checked} videos, min token cos-sim {worst:.5f}")
        else:
            report(name, "FAIL", f"min token cos-sim {worst:.5f} <= 0.999")
    except Exception as e:
        report(name, "FAIL", f"crashed: {e!r}")


# ---------------------------------------------------------------------------
# step 4: score parity (zero-shot rerank with preset fusion)
# ---------------------------------------------------------------------------

def step_score_parity(args, params, config, tokenizer, expected):
    name = "4 score parity (zero-shot)"
    try:
        from blim_tpu.core.mesh import make_mesh
        from blim_tpu.data.datasets import load_dataset, load_iv2_scores
        from blim_tpu.data.prompts import make_vtg_layout
        from blim_tpu.engine import loop as loop_lib
        from blim_tpu.engine.rerank import RerankEngine
        from blim_tpu.pipelines.configs import ZEROSHOT_PRESETS

        preset = ZEROSHOT_PRESETS[args.dataset]
        feature_shape = (config.num_clips, config.tokens_per_clip, config.mm_hidden_size)
        ds = load_dataset(args.dataset, args.data_root, "test", feature_shape)
        iv2 = load_iv2_scores(args.scores_dir, args.dataset, zeroshot=True)
        cap_budget = {"MSRVTT": 96, "LSMDC": 96, "DiDeMo": 160, "ActivityNet": 256}[args.dataset]
        layout = make_vtg_layout(tokenizer, args.dataset, config.video_tokens_vtg, cap_budget)
        engine = RerankEngine(params, config, layout, None, make_mesh(),
                              batch_size=args.batch_size_eval)
        results = loop_lib.val_one_epoch(
            engine, ds, iv2, tokenizer, preset["topk"], preset["cpn"],
            tuple(preset["alpha"]), tuple(preset["c"]), has_tvg=False,
        )
        blim = results["blim"]
        line = ", ".join(f"{k}={blim[k]:.1f}" for k in
                         ("t2v_r1", "t2v_r5", "v2t_r1", "v2t_r5") if k in blim)
        if not expected or "blim" not in expected:
            report(name, "SKIP", f"computed ({line}) but no --expected to compare "
                                 "(run the torch reference and pass its numbers)")
            return
        bad = [k for k, v in expected["blim"].items()
               if k in blim and abs(blim[k] - v) > args.recall_tol]
        if bad:
            deltas = {k: round(blim[k] - expected["blim"][k], 2) for k in bad}
            report(name, "FAIL", f"outside ±{args.recall_tol}: {deltas} ({line})")
        else:
            report(name, "PASS", f"within ±{args.recall_tol} of reference ({line})")
    except Exception as e:
        report(name, "FAIL", f"crashed: {e!r}")


# ---------------------------------------------------------------------------
# step 5: training trajectory
# ---------------------------------------------------------------------------

def step_train_trajectory(args, params, config, tokenizer, expected):
    name = "5 train trajectory"
    try:
        import jax
        import jax.numpy as jnp

        from blim_tpu.core.mesh import make_mesh
        from blim_tpu.data.collate import collate_train_batch
        from blim_tpu.data.datasets import TrainLoader, load_dataset
        from blim_tpu.data.prompts import make_tvg_layout, make_vtg_layout
        from blim_tpu.engine import train as train_lib
        from blim_tpu.models import videochat_flash as vcf
        from blim_tpu.pipelines.configs import TRAIN_PRESETS

        preset = TRAIN_PRESETS[args.dataset]
        feature_shape = (config.num_clips, config.tokens_per_clip, config.mm_hidden_size)
        ds = load_dataset(args.dataset, args.data_root, "train", feature_shape)
        cap_budget = {"MSRVTT": 96, "LSMDC": 96, "DiDeMo": 160, "ActivityNet": 256}[args.dataset]
        vtg_l = make_vtg_layout(tokenizer, args.dataset, config.video_tokens_vtg, cap_budget)
        tvg_l = make_tvg_layout(tokenizer, config.num_clips, cap_budget)
        tcfg = train_lib.TrainConfig(
            lr=preset["lr"], weight_decay=preset["weight_decay"],
            warmup_epochs=preset["warmup_epochs"], epochs=preset["epochs"],
            accum_iter=1,
        )
        B = preset["batch_size"]
        steps = max(len(ds) // B, 1)
        tx = train_lib.make_optimizer(tcfg, steps_per_epoch=steps)
        trainable = train_lib.init_trainable(
            jax.random.key(1), config, tcfg,
            visual_head=params["visual_head"]["kernel"].astype(jnp.float32),
        )
        state = train_lib.TrainState(jnp.asarray(0), trainable, tx.init(trainable))
        # the data axis must divide the preset batch (e.g. 8 virtual devices
        # from the test env vs MSRVTT's batch 4): use the largest compatible
        # device prefix rather than assuming batch % n_devices == 0
        import math

        dp = math.gcd(B, len(jax.devices()))
        mesh = make_mesh(data=dp, devices=jax.devices()[:dp])
        step_fn = train_lib.make_train_step(config, tcfg, tx, vtg_l, tvg_l, mesh=mesh)
        feats = ds.load_features()
        vocab = jnp.asarray(ds.video_vocab(), jnp.float32)
        loader = TrainLoader(ds, B, seed=0)
        losses = []
        for i, idx in enumerate(loader.batches(0)):
            if i >= args.train_steps:
                break
            batch = collate_train_batch(
                [ds.captions[j] for j in idx], feats[ds.item_video_idx[idx]],
                ds.item_video_idx[idx], tokenizer, args.dataset, vtg_l, tvg_l,
            )
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics = step_fn(state, params, batch, vocab, jax.random.key(i))
            losses.append(float(metrics["loss"]))
        ok = all(np.isfinite(losses))
        half = max(len(losses) // 2, 1)
        trend_down = np.mean(losses[:half]) > np.mean(losses[-half:])
        detail = f"{len(losses)} steps, loss {losses[0]:.3f} -> {losses[-1]:.3f}"
        if expected and "train_losses" in expected:
            ref = np.asarray(expected["train_losses"][: len(losses)])
            d = float(np.abs(np.asarray(losses[: len(ref)]) - ref).max())
            detail += f", max |d loss| vs reference = {d:.3f}"
            ok = ok and d < args.loss_tol
        # the trend check needs enough steps to clear the lr warmup ramp
        if ok and (trend_down or len(losses) < 20):
            report(name, "PASS", detail)
        elif ok:
            report(name, "FAIL", detail + " (no downward trend)")
        else:
            report(name, "FAIL", detail + " (non-finite or off-reference)")
    except Exception as e:
        report(name, "FAIL", f"crashed: {e!r}")


# ---------------------------------------------------------------------------
# synthetic self-test fixtures
# ---------------------------------------------------------------------------

def make_synthetic(args, tmp):
    """Tiny checkpoint + dataset + scores so every step executes on CPU."""
    import torch

    from blim_tpu.core.config import tiny_model_config

    # full Qwen2 vocab: the byte tokenizer emits real special-token ids
    # (151645 <|im_end|> etc.); a truncated vocab would overflow embed/CE
    config = tiny_model_config(vocab_size=152064)
    rng = np.random.default_rng(0)

    # checkpoint dir: torch-format state dict our converter understands
    model_path = os.path.join(tmp, "ckpt")
    os.makedirs(model_path)
    h, i, L = config.llm.hidden_size, config.llm.intermediate_size, config.llm.num_hidden_layers
    nh, nkv, hd = (config.llm.num_attention_heads, config.llm.num_key_value_heads,
                   config.llm.head_dim)
    mm = config.mm_hidden_size
    sd = {}

    def t(*shape):
        return torch.tensor(rng.standard_normal(shape).astype(np.float32) * 0.02)

    sd["model.embed_tokens.weight"] = t(config.llm.vocab_size, h)
    sd["lm_head.weight"] = t(config.llm.vocab_size, h)
    sd["model.norm.weight"] = torch.ones(h)
    for l in range(L):
        p = f"model.layers.{l}."
        sd[p + "input_layernorm.weight"] = torch.ones(h)
        sd[p + "post_attention_layernorm.weight"] = torch.ones(h)
        sd[p + "self_attn.q_proj.weight"] = t(nh * hd, h)
        sd[p + "self_attn.q_proj.bias"] = t(nh * hd)
        sd[p + "self_attn.k_proj.weight"] = t(nkv * hd, h)
        sd[p + "self_attn.k_proj.bias"] = t(nkv * hd)
        sd[p + "self_attn.v_proj.weight"] = t(nkv * hd, h)
        sd[p + "self_attn.v_proj.bias"] = t(nkv * hd)
        sd[p + "self_attn.o_proj.weight"] = t(h, nh * hd)
        sd[p + "mlp.gate_proj.weight"] = t(i, h)
        sd[p + "mlp.up_proj.weight"] = t(i, h)
        sd[p + "mlp.down_proj.weight"] = t(h, i)
    for mlp in ("mlp", "tvg_mlp"):
        sd[f"model.mm_projector.{mlp}.0.weight"] = t(h, mm)
        sd[f"model.mm_projector.{mlp}.0.bias"] = t(h)
        sd[f"model.mm_projector.{mlp}.2.weight"] = t(h, h)
        sd[f"model.mm_projector.{mlp}.2.bias"] = t(h)
    sd["visual_head.weight"] = t(mm, h)
    torch.save(sd, os.path.join(model_path, "pytorch_model.bin"))

    # dataset: annotations + features + iv2 scores
    n = 12
    data_root = os.path.join(tmp, "data")
    ds_dir = os.path.join(data_root, args.dataset)
    feat_dir = os.path.join(ds_dir, "features")
    os.makedirs(feat_dir)
    from blim_tpu.data.datasets import ANNOTATION_FILES

    words = ["man", "dog", "runs", "park", "sings", "car", "cooks", "kitchen"]
    annos = []
    for k in range(n):
        vid = f"video{k}"
        annos.append({"video": f"{vid}.mp4",
                      "caption": " ".join(rng.choice(words, size=3))})
        np.save(os.path.join(feat_dir, f"{vid}.npy"),
                rng.standard_normal(
                    (config.num_clips, config.tokens_per_clip, mm)
                ).astype(np.float16))
    for split in ("train", "test"):
        with open(os.path.join(ds_dir, ANNOTATION_FILES[args.dataset][split]), "w") as f:
            json.dump(annos, f)

    scores_dir = os.path.join(tmp, "scores")
    os.makedirs(scores_dir)
    iv2 = rng.standard_normal((n, n)).astype(np.float32)
    np.savez(os.path.join(scores_dir, f"{args.dataset.lower()}_zeroshot.npz"),
             t2v=iv2, v2t=iv2.T.copy())
    np.savez(os.path.join(scores_dir, f"{args.dataset.lower()}.npz"),
             t2v=iv2, v2t=iv2.T.copy())

    args.model_path = model_path
    args.data_root = data_root
    args.scores_dir = scores_dir
    return config


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", default="./pretrained/VideoChat-Flash-Qwen2-7B_res448")
    ap.add_argument("--data_root", default="./data")
    ap.add_argument("--scores_dir", default="./scores")
    ap.add_argument("--dataset", default="MSRVTT",
                    choices=["MSRVTT", "DiDeMo", "ActivityNet", "LSMDC"])
    ap.add_argument("--reference", default="/root/reference",
                    help="path to the PyTorch reference repo (step 1 oracle)")
    ap.add_argument("--videos_dir", default="", help="raw videos for step 3")
    ap.add_argument("--expected", default="", help="json with reference numbers")
    ap.add_argument("--captions", type=int, default=100, help="step-1 sample size")
    ap.add_argument("--logit_layers", type=int, default=4,
                    help="decoder layers compared in step 2 (bounds host RAM); 0 = all")
    ap.add_argument("--logit_tol", type=float, default=5e-2)
    ap.add_argument("--feature_videos", type=int, default=4)
    ap.add_argument("--batch_size_eval", type=int, default=16)
    ap.add_argument("--recall_tol", type=float, default=0.2)
    ap.add_argument("--loss_tol", type=float, default=0.05)
    ap.add_argument("--train_steps", type=int, default=8)
    ap.add_argument("--synthetic", action="store_true",
                    help="self-test: tiny model + synthetic artifacts on CPU")
    ap.add_argument("--steps", default="12345", help="subset of steps to run")
    args = ap.parse_args()

    import jax

    if args.synthetic:
        jax.config.update("jax_platforms", "cpu")

    from blim_tpu.checkpoints.convert import convert_videochat_flash, load_hf_state_dict
    from blim_tpu.core.config import load_model_config
    from blim_tpu.data.tokenization import load_tokenizer

    tmp_ctx = tempfile.TemporaryDirectory() if args.synthetic else None
    config = None
    if args.synthetic:
        config = make_synthetic(args, tmp_ctx.name)

    tokenizer = load_tokenizer(args.model_path)
    expected = json.load(open(args.expected)) if args.expected else None

    have_ckpt = os.path.isdir(args.model_path)
    state_dict = params = None
    if have_ckpt:
        try:
            state_dict = load_hf_state_dict(args.model_path)
            if config is None:
                config = load_model_config(args.model_path)
            params = convert_videochat_flash(state_dict, config)
            if not args.synthetic:
                # the 7B must run bf16 on a v5e (main.py does the same cast)
                import jax.numpy as jnp

                params = jax.tree_util.tree_map(
                    lambda x: jnp.asarray(x, jnp.bfloat16), params
                )
                params["visual_head"]["kernel"] = params["visual_head"]["kernel"].astype(
                    jnp.float32
                )
        except Exception as e:
            report("checkpoint load", "SKIP", f"{e!r}")
            have_ckpt = False

    # step-1 captions: real annotations when available, else synthetic
    captions = None
    try:
        from blim_tpu.data.datasets import load_dataset

        if config is not None:
            fs = (config.num_clips, config.tokens_per_clip, config.mm_hidden_size)
            ds = load_dataset(args.dataset, args.data_root, "test", fs)
            captions = ds.captions[: args.captions]
    except Exception:
        pass
    if captions is None:
        rng = np.random.default_rng(1)
        words = ["a", "man", "sings", "on", "stage", "dog", "park", "cooking"]
        captions = [" ".join(rng.choice(words, size=rng.integers(3, 8)))
                    for _ in range(min(args.captions, 25))]

    if "1" in args.steps:
        step_tokenizer_goldens(args, tokenizer, captions)
    if "2" in args.steps:
        if state_dict is not None:
            step_logit_parity(args, state_dict, config)
        else:
            report("2 logit parity", "SKIP", f"no checkpoint at {args.model_path}")
    if "3" in args.steps:
        if params is not None:
            step_feature_parity(args, params, config)
        else:
            report("3 feature parity", "SKIP", "no checkpoint")
    if "4" in args.steps:
        if params is not None:
            step_score_parity(args, params, config, tokenizer, expected)
        else:
            report("4 score parity (zero-shot)", "SKIP", "no checkpoint")
    if "5" in args.steps:
        if params is not None:
            step_train_trajectory(args, params, config, tokenizer, expected)
        else:
            report("5 train trajectory", "SKIP", "no checkpoint")

    print("\n== parity summary ==")
    for step, status, detail in RESULTS:
        print(f"  {status:4s}  {step}")
    if tmp_ctx:
        tmp_ctx.cleanup()
    sys.exit(1 if any(s == "FAIL" for _, s, _ in RESULTS) else 0)


if __name__ == "__main__":
    main()
