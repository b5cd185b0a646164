"""Train / eval CLI — the TPU-native counterpart of the reference's main.py.

Same flag surface (reference: main.py:31-75) and run flow (main.py:78-197):
build model + tokenizer, install LoRA, train epochs with per-epoch eval and
best-checkpoint selection on t2v_r1 + v2t_r1, or run eval-only with the
alpha/c fusion weights.

Usage (fine-tuned eval, reference README.md:118-143 weights):
    python -m blim_tpu.pipelines.main --dataset MSRVTT --eval --resume ckpt \
        --topk 16 --cpn --alpha 0.0 0.9 --c 1.0 0.6 0.8 0.4

Without a real checkpoint directory (`--model_path` missing), the model is
random-initialized at the flagship config — useful for pipeline smoke tests;
accuracy is meaningless in that mode and a warning is printed.
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import time

import numpy as np


def get_args_parser():
    parser = argparse.ArgumentParser("BLiM-TPU", add_help=False)
    parser.add_argument("--batch_size", default=4, type=int, help="train batch per process")
    parser.add_argument("--batch_size_eval", default=16, type=int, help="rerank pairs per chip per step")
    parser.add_argument("--epochs", default=5, type=int)
    parser.add_argument("--accum_iter", default=1, type=int)
    parser.add_argument("--model_path", default="./pretrained/VideoChat-Flash-Qwen2-7B_res448", type=str)

    parser.add_argument("--weight_decay", type=float, default=1.0)
    parser.add_argument("--lr", type=float, default=2e-4)
    parser.add_argument("--min_lr", type=float, default=0.0)
    parser.add_argument("--warmup_epochs", type=float, default=1)

    parser.add_argument("--dataset", default="DiDeMo", type=str,
                        choices=["DiDeMo", "ActivityNet", "LSMDC", "MSRVTT"])
    parser.add_argument("--data_root", default="./data", type=str)
    parser.add_argument("--scores_dir", default="./scores", type=str)
    parser.add_argument("--output_dir", default="./checkpoint")
    parser.add_argument("--num_clips", default=4, type=int)
    parser.add_argument("--seed", default=0, type=int)
    parser.add_argument("--resume", default="", help="resume from checkpoint")
    parser.add_argument("--start_epoch", default=0, type=int)
    parser.add_argument("--max_caption_tokens", default=0, type=int,
                        help="caption token budget; 0 = per-dataset default "
                             "(MSRVTT/LSMDC 96, DiDeMo 160, ActivityNet 256 — "
                             "paragraph captions need headroom)")

    parser.add_argument("--lora_r", type=int, default=8)
    parser.add_argument("--lora_alpha", type=int, default=32)
    parser.add_argument("--lora_drop", type=float, default=0.05)

    parser.add_argument("--eval", action="store_true")
    parser.add_argument("--topk", type=int, default=10)
    parser.add_argument("--cpn", action="store_true")
    parser.add_argument("--alpha", nargs="+", type=float, default=[0.0, 0.0])
    parser.add_argument("--c", nargs="+", type=float, default=[0.0, 0.0, 0.0, 0.0])

    parser.add_argument("--preset", action="store_true",
                        help="apply the dataset's published hyperparameters "
                             "(reference README configs)")
    parser.add_argument("--mesh_model", type=int, default=1, help="tensor-parallel axis size")
    parser.add_argument("--tiny", action="store_true", help="tiny random model (smoke tests)")
    parser.add_argument("--profile_dir", default=None, help="jax.profiler trace dir")
    return parser


def main(args):
    import jax
    import jax.numpy as jnp

    from blim_tpu.adapters.lora import LoraConfig
    from blim_tpu.checkpoints import orbax_io
    from blim_tpu.checkpoints.convert import convert_videochat_flash, load_hf_state_dict
    from blim_tpu.core.config import ModelConfig, load_model_config, tiny_model_config
    from blim_tpu.core.mesh import make_mesh
    from blim_tpu.data.datasets import TrainLoader, load_dataset, load_iv2_scores
    from blim_tpu.data.prompts import make_tvg_layout, make_vtg_layout
    from blim_tpu.data.tokenization import load_tokenizer
    from blim_tpu.engine import loop as loop_lib
    from blim_tpu.engine import train as train_lib
    from blim_tpu.engine.rerank import RerankEngine
    from blim_tpu.models import videochat_flash as vcf
    from blim_tpu.utils import distributed as dist
    from blim_tpu.utils.profiling import trace

    if getattr(args, "preset", False):
        from blim_tpu.pipelines.configs import apply_preset

        apply_preset(args, zeroshot=args.eval and not args.resume)

    dist.init_distributed_mode()
    print(f"job dir: {os.path.dirname(os.path.realpath(__file__))}")
    print(str(args).replace(", ", ",\n"))

    seed = args.seed + dist.get_rank()
    np.random.seed(seed)

    # ---- model + tokenizer --------------------------------------------------
    tokenizer = load_tokenizer(args.model_path)
    have_ckpt = os.path.isdir(args.model_path) and os.path.exists(
        os.path.join(args.model_path, "config.json")
    )
    if args.tiny:
        config = tiny_model_config(vocab_size=152064)
        params = vcf.init_params(config, jax.random.key(args.seed))
    elif have_ckpt:
        config = load_model_config(args.model_path)
        state_dict = load_hf_state_dict(args.model_path)
        params = convert_videochat_flash(state_dict, config)
        params = jax.tree_util.tree_map(lambda x: jnp.asarray(x, jnp.bfloat16), params)
        params["visual_head"]["kernel"] = params["visual_head"]["kernel"].astype(jnp.float32)
    else:
        print(f"WARNING: no checkpoint at {args.model_path}; random 7B weights "
              "(pipeline smoke mode, accuracy is meaningless)")
        config = ModelConfig()
        params = jax.jit(lambda k: vcf.init_params(config, k, jnp.bfloat16))(jax.random.key(args.seed))

    lora_cfg = LoraConfig(r=args.lora_r, alpha=args.lora_alpha, dropout=args.lora_drop)
    train_cfg = train_lib.TrainConfig(
        lr=args.lr, min_lr=args.min_lr, weight_decay=args.weight_decay,
        warmup_epochs=args.warmup_epochs, epochs=args.epochs,
        accum_iter=args.accum_iter, lora=lora_cfg,
    )
    trainable = train_lib.init_trainable(
        jax.random.key(args.seed + 1), config, train_cfg,
        visual_head=params["visual_head"]["kernel"],
    )
    n_trainable = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(trainable))
    n_total = sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))
    print("*" * 80)
    print(f"Total params: {n_total:,}")
    print(f"Trainable params: {n_trainable:,}")
    print("*" * 80)

    # ---- data ----------------------------------------------------------------
    feature_shape = (config.num_clips, config.tokens_per_clip, config.mm_hidden_size)
    dataset_val = load_dataset(args.dataset, args.data_root, "test", feature_shape)
    if not args.eval:
        dataset_train = load_dataset(args.dataset, args.data_root, "train", feature_shape)

    cap_budget = args.max_caption_tokens or {
        "MSRVTT": 96, "LSMDC": 96, "DiDeMo": 160, "ActivityNet": 256
    }[args.dataset]
    vtg_layout = make_vtg_layout(
        tokenizer, args.dataset, config.video_tokens_vtg, cap_budget
    )
    tvg_layout = make_tvg_layout(tokenizer, config.num_clips, cap_budget)

    mesh = make_mesh(model=args.mesh_model)

    # ---- optimizer + resume ----------------------------------------------------
    # args.batch_size is per-chip (like the reference's per-GPU batch);
    # the global static batch spans the mesh data axis.
    n_data = len(jax.devices()) // args.mesh_model
    global_batch = args.batch_size * max(n_data, 1)
    if not args.eval:
        steps_per_epoch = max(len(dataset_train) // (global_batch * dist.get_world_size()), 1)
    else:
        steps_per_epoch = 1
    tx = train_lib.make_optimizer(train_cfg, steps_per_epoch)
    opt_state = tx.init(trainable)
    if args.resume:
        trainable, opt_restored, epoch0 = orbax_io.load_checkpoint(args.resume, trainable)
        if opt_restored is not None and not args.eval:
            opt_state = jax.tree_util.tree_map(
                lambda t, r: jnp.asarray(r, t.dtype) if hasattr(t, "dtype") else r,
                opt_state, opt_restored,
            )
        if not args.eval:
            args.start_epoch = epoch0 + 1
        print(f"resumed from {args.resume} (epoch {epoch0})")

    has_tvg = args.resume != "" or not args.eval

    def lora_tree():
        return trainable["lora"]

    def eval_params():
        p = dict(params)
        p["visual_head"] = {"kernel": trainable["visual_head"]["kernel"]}
        return p

    # the engine (and its compiled steps) is built ONCE; per-epoch evals swap
    # the LoRA pytree and visual_head in place — both are traced arguments,
    # so no recompilation across epochs
    engine = RerankEngine(
        eval_params(), config, vtg_layout, tvg_layout, mesh,
        batch_size=args.batch_size_eval,
        lora=lora_tree() if has_tvg or args.resume else None,
        lora_scale=lora_cfg.scale,
    )

    def run_eval():
        if has_tvg or args.resume:
            engine.lora = jax.device_put(lora_tree(), engine._replicated)
        engine.params["visual_head"] = {
            "kernel": jax.device_put(trainable["visual_head"]["kernel"], engine._replicated)
        }
        iv2 = load_iv2_scores(args.scores_dir, args.dataset, zeroshot=not has_tvg)
        return loop_lib.val_one_epoch(
            engine, dataset_val, iv2, tokenizer, args.topk, args.cpn,
            tuple(args.alpha), tuple(args.c), has_tvg,
        )

    start_time = time.time()
    if args.eval:
        with trace(args.profile_dir):
            results = loop_lib.results_table(run_eval())
        if args.output_dir and dist.is_main_process():
            with open(os.path.join(args.output_dir, "log.txt"), "a", encoding="utf-8") as f:
                f.write("\n\n" + results)
        print("\n" + results)
        return

    # ---- training ---------------------------------------------------------------
    state = train_lib.TrainState(jnp.asarray(args.start_epoch * steps_per_epoch), trainable, opt_state)
    step_fn = train_lib.make_train_step(config, train_cfg, tx, vtg_layout, tvg_layout, mesh=mesh)
    frozen = params
    features_train = dataset_train.load_features()
    video_vocab = jnp.asarray(dataset_train.video_vocab(), jnp.float32)
    loader = TrainLoader(
        dataset_train, global_batch, seed=args.seed,
        num_shards=dist.get_world_size(), shard=dist.get_rank(),
    )
    lr_fn = lambda e: float(train_lib.cosine_lr(jnp.asarray(e), train_cfg))

    best_r1 = 0.0
    print(f"Start training for {args.epochs} epochs")
    for epoch in range(args.start_epoch, args.epochs):
        state, train_stats = loop_lib.train_one_epoch(
            state, step_fn, frozen, dataset_train, loader, features_train,
            video_vocab, tokenizer, vtg_layout, tvg_layout, epoch,
            jax.random.key(seed * 1000 + epoch), lr_fn=lr_fn,
        )
        trainable = state.trainable
        if dist.is_main_process() and args.output_dir:
            orbax_io.save_checkpoint(
                args.output_dir, f"epoch{epoch}", trainable, state.opt_state, epoch, vars(args)
            )

        results = run_eval()
        if dist.is_main_process():
            cur_r1 = results["blim"]["t2v_r1"] + results["blim"]["v2t_r1"]
            if args.output_dir and best_r1 < cur_r1:
                best_r1 = cur_r1
                orbax_io.save_checkpoint(
                    args.output_dir, "checkpoint_best", trainable, state.opt_state, epoch, vars(args)
                )
            log_stats = {
                "epoch": epoch,
                **{f"train_{k}": v for k, v in train_stats.items()},
                **{f"val_{k}": v for k, v in results.items()},
            }
            if args.output_dir:
                with open(os.path.join(args.output_dir, "log.txt"), "a", encoding="utf-8") as f:
                    f.write(json.dumps(log_stats) + "\n")
                    f.write(loop_lib.results_table(results) + "\n")
            print("\n" + loop_lib.results_table(results))

    total = str(datetime.timedelta(seconds=int(time.time() - start_time)))
    print(f"Training time {total}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser("BLiM-TPU", parents=[get_args_parser()])
    args = parser.parse_args()
    if args.output_dir:
        os.makedirs(args.output_dir, exist_ok=True)
    main(args)
