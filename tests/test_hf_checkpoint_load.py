"""End-to-end HF checkpoint directory loading: config.json + safetensors ->
ModelConfig + converted pytree (the `from_pretrained` path, reference:
main.py:96-97)."""

import json

import numpy as np
import pytest


def _tiny_hf_dir(tmp_path):
    import torch
    from safetensors.torch import save_file

    cfg = {
        "vocab_size": 512, "hidden_size": 64, "intermediate_size": 128,
        "num_hidden_layers": 2, "num_attention_heads": 4,
        "num_key_value_heads": 2, "rope_theta": 1e6, "rms_norm_eps": 1e-6,
        "max_position_embeddings": 2048, "tie_word_embeddings": False,
        "mm_hidden_size": 32, "mm_local_num_frames": 4,
        "mm_vision_tower": "umt-hd-large", "mm_projector_type": "tome16_mlp_hd64",
        "vision_encode_type": "video_image", "tokenizer_padding_side": "left",
    }
    with open(tmp_path / "config.json", "w") as f:
        json.dump(cfg, f)

    torch.manual_seed(0)
    D, I, mm = 64, 128, 32
    sd = {
        "model.embed_tokens.weight": torch.randn(512, D),
        "model.norm.weight": torch.ones(D),
        "lm_head.weight": torch.randn(512, D),
        "visual_head.weight": torch.randn(mm, D),
    }
    for i in range(2):
        p = f"model.layers.{i}."
        sd[p + "input_layernorm.weight"] = torch.ones(D)
        sd[p + "post_attention_layernorm.weight"] = torch.ones(D)
        sd[p + "self_attn.q_proj.weight"] = torch.randn(D, D)
        sd[p + "self_attn.q_proj.bias"] = torch.randn(D)
        sd[p + "self_attn.k_proj.weight"] = torch.randn(D // 2, D)
        sd[p + "self_attn.k_proj.bias"] = torch.randn(D // 2)
        sd[p + "self_attn.v_proj.weight"] = torch.randn(D // 2, D)
        sd[p + "self_attn.v_proj.bias"] = torch.randn(D // 2)
        sd[p + "self_attn.o_proj.weight"] = torch.randn(D, D)
        sd[p + "mlp.gate_proj.weight"] = torch.randn(I, D)
        sd[p + "mlp.up_proj.weight"] = torch.randn(I, D)
        sd[p + "mlp.down_proj.weight"] = torch.randn(D, I)
    for name in ("mlp", "tvg_mlp"):
        sd[f"model.mm_projector.{name}.0.weight"] = torch.randn(D, mm)
        sd[f"model.mm_projector.{name}.0.bias"] = torch.randn(D)
        sd[f"model.mm_projector.{name}.2.weight"] = torch.randn(D, D)
        sd[f"model.mm_projector.{name}.2.bias"] = torch.randn(D)
    save_file(sd, str(tmp_path / "model.safetensors"))
    return sd


def test_checkpoint_dir_roundtrip(tmp_path):
    pytest.importorskip("safetensors")
    from blim_tpu.checkpoints.convert import convert_videochat_flash, load_hf_state_dict
    from blim_tpu.core.config import load_model_config

    sd = _tiny_hf_dir(tmp_path)
    config = load_model_config(str(tmp_path))
    assert config.llm.hidden_size == 64
    assert config.llm.num_key_value_heads == 2
    assert config.mm_hidden_size == 32
    assert config.vision.image_size == 448  # "umt-hd" => res448

    loaded = load_hf_state_dict(str(tmp_path))
    assert set(loaded) == set(sd)
    params = convert_videochat_flash(loaded, config)
    np.testing.assert_allclose(
        params["llm"]["embed_tokens"]["embedding"],
        sd["model.embed_tokens.weight"].numpy(),
        rtol=1e-6,
    )
    assert params["llm"]["layers"]["q_proj"]["kernel"].shape == (2, 64, 64)
    assert "vision_tower" not in params  # no tower keys in this checkpoint


def test_forward_from_loaded_checkpoint(tmp_path):
    """Loaded weights must drive a real forward (logits finite, right shape)."""
    pytest.importorskip("safetensors")
    import jax.numpy as jnp

    from blim_tpu.checkpoints.convert import convert_videochat_flash, load_hf_state_dict
    from blim_tpu.core.config import load_model_config
    from blim_tpu.models import qwen2

    _tiny_hf_dir(tmp_path)
    config = load_model_config(str(tmp_path))
    params = convert_videochat_flash(load_hf_state_dict(str(tmp_path)), config)
    params = {"llm": params["llm"]}
    import jax

    params = jax.tree_util.tree_map(jnp.asarray, params)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 512, (1, 8)))
    logits = qwen2.forward_logits(params["llm"], config.llm, ids)
    assert logits.shape == (1, 8, 512)
    assert np.isfinite(np.asarray(logits)).all()
