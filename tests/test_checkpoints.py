"""Checkpoint tests: orbax roundtrip with param-count assert, full multimodal
HF state_dict conversion, LoRA merge, layer-wise lr scales."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from blim_tpu.adapters import lora as lora_lib
from blim_tpu.checkpoints import orbax_io
from blim_tpu.checkpoints.convert import convert_videochat_flash
from blim_tpu.core.config import tiny_model_config
from blim_tpu.engine import train as train_lib
from blim_tpu.utils import lr_decay


def test_orbax_roundtrip_and_count_check(tmp_path):
    cfg = tiny_model_config()
    tcfg = train_lib.TrainConfig()
    trainable = train_lib.init_trainable(
        jax.random.key(0), cfg, tcfg,
        visual_head=jnp.zeros((cfg.llm.hidden_size, cfg.mm_hidden_size)),
    )
    opt_state = {"count": jnp.asarray(7)}
    path = orbax_io.save_checkpoint(str(tmp_path), "epoch0", trainable, opt_state, epoch=3,
                                    args={"lr": 1e-4})
    restored, opt, epoch = orbax_io.load_checkpoint(path, trainable)
    assert epoch == 3
    assert int(opt["count"]) == 7
    a = jax.tree_util.tree_leaves(trainable)
    b = jax.tree_util.tree_leaves(restored)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # param-count mismatch must raise (reference: main.py:128)
    bad = dict(trainable)
    bad["visual_head"] = {"kernel": jnp.zeros((2, 2))}
    with pytest.raises(AssertionError):
        orbax_io.load_checkpoint(path, bad)


def test_full_videochat_state_dict_conversion():
    """A synthetic torch state_dict with the reference checkpoint's key names
    (LLM + projector + visual_head + vision tower) converts completely."""
    import torch

    cfg = tiny_model_config()
    L, D, I = cfg.llm.num_hidden_layers, cfg.llm.hidden_size, cfg.llm.intermediate_size
    H, K, hd = cfg.llm.num_attention_heads, cfg.llm.num_key_value_heads, cfg.llm.head_dim
    mm, vd = cfg.mm_hidden_size, cfg.vision.hidden_size
    VL = cfg.vision.depth
    vi = int(vd * cfg.vision.mlp_ratio)

    sd = {"model.embed_tokens.weight": torch.randn(cfg.llm.vocab_size, D),
          "model.norm.weight": torch.ones(D),
          "lm_head.weight": torch.randn(cfg.llm.vocab_size, D),
          "visual_head.weight": torch.randn(mm, D)}
    for i in range(L):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = torch.ones(D)
        sd[p + "post_attention_layernorm.weight"] = torch.ones(D)
        sd[p + "self_attn.q_proj.weight"] = torch.randn(H * hd, D)
        sd[p + "self_attn.q_proj.bias"] = torch.randn(H * hd)
        sd[p + "self_attn.k_proj.weight"] = torch.randn(K * hd, D)
        sd[p + "self_attn.k_proj.bias"] = torch.randn(K * hd)
        sd[p + "self_attn.v_proj.weight"] = torch.randn(K * hd, D)
        sd[p + "self_attn.v_proj.bias"] = torch.randn(K * hd)
        sd[p + "self_attn.o_proj.weight"] = torch.randn(D, H * hd)
        sd[p + "mlp.gate_proj.weight"] = torch.randn(I, D)
        sd[p + "mlp.up_proj.weight"] = torch.randn(I, D)
        sd[p + "mlp.down_proj.weight"] = torch.randn(D, I)
    for name in ("mlp", "tvg_mlp"):
        sd[f"model.mm_projector.{name}.0.weight"] = torch.randn(D, mm)
        sd[f"model.mm_projector.{name}.0.bias"] = torch.randn(D)
        sd[f"model.mm_projector.{name}.2.weight"] = torch.randn(D, D)
        sd[f"model.mm_projector.{name}.2.bias"] = torch.randn(D)
    vt = "model.vision_tower.vision_tower.encoder."
    sd[vt + "patch_embed.proj.weight"] = torch.randn(vd, 3, 1, 16, 16)
    sd[vt + "patch_embed.proj.bias"] = torch.randn(vd)
    sd[vt + "vision_layernorm.weight"] = torch.ones(vd)
    sd[vt + "vision_layernorm.bias"] = torch.zeros(vd)
    for i in range(VL):
        b = vt + f"blocks.{i}."
        sd[b + "norm1.weight"] = torch.ones(vd)
        sd[b + "norm1.bias"] = torch.zeros(vd)
        sd[b + "norm2.weight"] = torch.ones(vd)
        sd[b + "norm2.bias"] = torch.zeros(vd)
        sd[b + "attn.qkv.weight"] = torch.randn(3 * vd, vd)
        sd[b + "attn.q_bias"] = torch.randn(vd)
        sd[b + "attn.v_bias"] = torch.randn(vd)
        sd[b + "attn.proj.weight"] = torch.randn(vd, vd)
        sd[b + "attn.proj.bias"] = torch.randn(vd)
        sd[b + "mlp.fc1.weight"] = torch.randn(vi, vd)
        sd[b + "mlp.fc1.bias"] = torch.randn(vi)
        sd[b + "mlp.fc2.weight"] = torch.randn(vd, vi)
        sd[b + "mlp.fc2.bias"] = torch.randn(vd)

    params = convert_videochat_flash(sd, cfg)
    assert params["llm"]["layers"]["q_proj"]["kernel"].shape == (L, D, H * hd)
    assert params["visual_head"]["kernel"].shape == (D, mm)
    assert params["projector"]["tvg_mlp"]["fc1"]["kernel"].shape == (mm, D)
    assert params["vision_tower"]["blocks"]["qkv"]["kernel"].shape == (VL, vd, 3 * vd)
    assert params["vision_tower"]["patch_embed"]["kernel"].shape == (1, 16, 16, 3, vd)
    # spot-check a transpose
    np.testing.assert_allclose(
        params["llm"]["layers"]["o_proj"]["kernel"][0],
        sd["model.layers.0.self_attn.o_proj.weight"].numpy().T,
    )


def test_lora_merge_is_noop_at_init():
    cfg = tiny_model_config()
    lcfg = lora_lib.LoraConfig(r=4, alpha=8)
    dense = {"kernel": jnp.asarray(np.random.default_rng(0).standard_normal((8, 6)), jnp.float32)}
    factors = lora_lib.init_lora_factors(jax.random.key(0), 8, 6, 4)
    merged = lora_lib.merge_lora_into_dense(dense, factors, lcfg.scale)
    np.testing.assert_allclose(np.asarray(merged["kernel"]), np.asarray(dense["kernel"]))


def test_layer_wise_lr_scales():
    vec = np.asarray(lr_decay.layer_scale_vector(4, 0.5))
    np.testing.assert_allclose(vec, [0.5**4, 0.5**3, 0.5**2, 0.5])
    tree = {"a": jnp.zeros((4, 3, 2)), "b": jnp.zeros((7,))}
    scales = lr_decay.stacked_tree_scales(tree, 4, 0.5)
    assert scales["a"].shape == (4, 1, 1)
    assert float(scales["b"]) == 1.0
    tx = lr_decay.scale_updates_by(scales)
    upd, _ = tx.update({"a": jnp.ones((4, 3, 2)), "b": jnp.ones((7,))}, tx.init(tree))
    np.testing.assert_allclose(np.asarray(upd["a"][0]), 0.5**4)
