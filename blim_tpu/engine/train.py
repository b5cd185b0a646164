"""Training engine: LoRA fine-tuning under pjit.

Re-design of the reference loop (reference: main.py:141-164,
training_utils.py:39-104, util/misc.py:232-273, util/lr_sched.py:9-21):

  * trainable subset = LoRA adapters (LLM q/k/v/o + lm_head, projector MLPs)
    + fp32 `visual_head` — exactly the reference's peft setup (main.py:100-111);
  * AdamW betas (0.9, 0.95) with timm-style weight-decay masking (no decay on
    1-D params) and the per-iteration half-cosine warmup schedule;
  * gradient accumulation via optax.MultiSteps (reference: accum_iter loop);
  * bf16 activations, fp32 optimizer/adapter math — no loss scaler needed on
    TPU (the reference's fp16 GradScaler is a CUDA artifact);
  * DDP is replaced by sharding the batch over the mesh `data` axis and (for
    HBM-constrained configs) model weights over the `model` axis; XLA emits
    the gradient/activation collectives.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from blim_tpu.adapters import lora as lora_lib
from blim_tpu.core.config import ModelConfig
from blim_tpu.core.mesh import DATA_AXIS, MODEL_AXIS
from blim_tpu.data.prompts import TVGLayout, VTGLayout
from blim_tpu.models import videochat_flash as vcf
from blim_tpu.scoring import criteria

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 2e-4
    min_lr: float = 0.0
    weight_decay: float = 1.0
    warmup_epochs: float = 1.0
    epochs: int = 5
    accum_iter: int = 1
    lora: lora_lib.LoraConfig = dataclasses.field(default_factory=lora_lib.LoraConfig)


def cosine_lr(epoch_frac: jax.Array, cfg: TrainConfig) -> jax.Array:
    """Per-iteration linear warmup -> half-cosine decay on fractional epochs
    (reference: util/lr_sched.py:9-21)."""
    warm = cfg.lr * epoch_frac / max(cfg.warmup_epochs, 1e-8)
    denom = max(cfg.epochs - cfg.warmup_epochs, 1e-8)
    cos = cfg.min_lr + (cfg.lr - cfg.min_lr) * 0.5 * (
        1.0 + jnp.cos(jnp.pi * (epoch_frac - cfg.warmup_epochs) / denom)
    )
    return jnp.where(epoch_frac < cfg.warmup_epochs, warm, cos)


def init_trainable(key: jax.Array, config: ModelConfig, cfg: TrainConfig, visual_head: jax.Array) -> Params:
    """The trainable pytree: LoRA factors + visual_head (fp32)."""
    k1, k2 = jax.random.split(key)
    return {
        "lora": {
            "llm": lora_lib.init_llm_lora(k1, config.llm, cfg.lora),
            "projector": lora_lib.init_projector_lora(
                k2, config.mm_hidden_size, config.llm.hidden_size, cfg.lora
            ),
        },
        "visual_head": {"kernel": visual_head.astype(jnp.float32)},
    }


def _decay_mask(params: Params) -> Params:
    """timm param_groups_weight_decay: no decay for 1-D params/biases
    (reference: main.py:146)."""
    return jax.tree_util.tree_map(lambda p: p.ndim > 1, params)


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    def schedule(step):
        epoch_frac = step / max(steps_per_epoch, 1)
        return cosine_lr(epoch_frac, cfg)

    tx = optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.95),
        optax.add_decayed_weights(cfg.weight_decay, mask=_decay_mask),
        optax.scale_by_learning_rate(schedule),
    )
    if cfg.accum_iter > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.accum_iter)
    return tx


class TrainState(NamedTuple):
    step: jax.Array
    trainable: Params
    opt_state: Any


def loss_fn(
    trainable: Params,
    frozen: Params,
    config: ModelConfig,
    batch: Dict[str, jax.Array],
    video_vocab: jax.Array,
    vtg_geom: Tuple[int, int, int],   # (video_start, window_start, window_len)
    tvg_geom: Tuple[int, int],        # (video_start, gather_start)
    lora_scale: float,
    dropout_rng: Optional[jax.Array] = None,
    lora_dropout: float = 0.0,
    use_pallas: Optional[bool] = None,
) -> Tuple[jax.Array, Dict[str, jax.Array]]:
    """vtg CE + tvg clip CE (reference: training_utils.py:66-81)."""
    params = dict(frozen)
    params["visual_head"] = trainable["visual_head"]
    lora = trainable["lora"]

    v_start, w_start, w_len = vtg_geom
    hidden = vcf.vtg_hidden(
        params, config, batch["vtg_input_ids"], batch["vtg_attention_mask"],
        batch["video"], v_start, lora=lora, lora_scale=lora_scale,
        dropout_rng=dropout_rng, lora_dropout=lora_dropout, remat=True,
        use_pallas=use_pallas,
    )
    logits = vcf.vtg_window_logits(params, config, hidden, w_start, w_len, lora, lora_scale)
    vtg_loss = criteria.vtg_train_loss(logits, batch["vtg_window_labels"])

    t_start, g_start = tvg_geom
    hidden = vcf.tvg_hidden(
        params, config, batch["tvg_input_ids"], batch["tvg_attention_mask"],
        batch["video"], t_start, lora=lora, lora_scale=lora_scale,
        dropout_rng=dropout_rng, lora_dropout=lora_dropout, remat=True,
        use_pallas=use_pallas,
    )
    clip_hidden = jax.lax.dynamic_slice_in_dim(hidden, g_start, config.num_clips, axis=1)
    clip_logits = criteria.tvg_clip_logits(
        clip_hidden, trainable["visual_head"]["kernel"], video_vocab
    )
    tvg_loss = criteria.tvg_train_loss(clip_logits, batch["video_label"])

    loss = vtg_loss + tvg_loss
    return loss, {"loss": loss, "vtg_loss": vtg_loss, "tvg_loss": tvg_loss}


def make_train_step(
    config: ModelConfig,
    train_cfg: TrainConfig,
    tx: optax.GradientTransformation,
    vtg_layout: VTGLayout,
    tvg_layout: TVGLayout,
    mesh: Optional[Mesh] = None,
    use_pallas: Optional[bool] = None,
):
    """Returns a jitted (state, frozen, batch, vocab, rng) -> (state, metrics).

    With a mesh, the batch is sharded over `data` and params replicated
    (pure DP, like the reference's DDP); model-axis sharding of the frozen
    weights is applied by the caller via device_put with param_shardings().
    """
    ws, wl = vtg_layout.label_window
    vtg_geom = (vtg_layout.video_start, ws, wl)
    tvg_geom = (tvg_layout.video_start, int(tvg_layout.gather_positions[0]))
    scale = train_cfg.lora.scale

    def step(state: TrainState, frozen: Params, batch, video_vocab, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(
            state.trainable, frozen, config, batch, video_vocab,
            vtg_geom, tvg_geom, scale, rng, train_cfg.lora.dropout,
            use_pallas,
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.trainable)
        trainable = optax.apply_updates(state.trainable, updates)
        gnorm = optax.global_norm(grads)
        metrics = dict(metrics, grad_norm=gnorm)
        return TrainState(state.step + 1, trainable, opt_state), metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    batch_sharding = {
        k: data
        for k in [
            "vtg_input_ids", "vtg_attention_mask", "vtg_window_labels",
            "tvg_input_ids", "tvg_attention_mask", "video", "video_label",
        ]
    }
    return jax.jit(
        step,
        in_shardings=(repl, None, batch_sharding, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def param_shardings(config: ModelConfig, mesh: Mesh) -> Params:
    """Tensor-parallel shardings for the frozen 7B over the `model` axis:
    attention heads and MLP hidden are split; embeddings/vocab sharded on the
    vocab axis. Equivalent capability class to Megatron TP, expressed as
    sharding annotations for XLA to lower onto ICI collectives."""
    mp = MODEL_AXIS

    def ns(*spec):
        return NamedSharding(mesh, P(*spec))

    layers = {
        "input_layernorm": {"scale": ns(None, None)},
        "post_attention_layernorm": {"scale": ns(None, None)},
        "q_proj": {"kernel": ns(None, None, mp), "bias": ns(None, mp)},
        "k_proj": {"kernel": ns(None, None, mp), "bias": ns(None, mp)},
        "v_proj": {"kernel": ns(None, None, mp), "bias": ns(None, mp)},
        "o_proj": {"kernel": ns(None, mp, None)},
        "gate_proj": {"kernel": ns(None, None, mp)},
        "up_proj": {"kernel": ns(None, None, mp)},
        "down_proj": {"kernel": ns(None, mp, None)},
    }
    llm = {
        "embed_tokens": {"embedding": ns(mp, None)},
        "layers": layers,
        "norm": {"scale": ns(None)},
        "lm_head": {"kernel": ns(None, mp)},
    }
    return {
        "llm": llm,
        "projector": jax.tree_util.tree_map(
            lambda _: ns(), {"mlp": {"fc1": {"kernel": 0, "bias": 0}, "fc2": {"kernel": 0, "bias": 0}},
                             "tvg_mlp": {"fc1": {"kernel": 0, "bias": 0}, "fc2": {"kernel": 0, "bias": 0}}}
        ),
        "visual_head": {"kernel": ns()},
    }
