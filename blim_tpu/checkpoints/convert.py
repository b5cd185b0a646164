"""HF (torch) checkpoint -> JAX pytree conversion.

The reference loads the VideoChat-Flash-Qwen2-7B HF checkpoint with
`from_pretrained` (reference: main.py:97). Here, the torch `state_dict`
(or safetensors shards) is mapped into the stacked-layer pytrees used by
blim_tpu's functional models. torch Linear stores (out, in); JAX kernels are
(in, out), so weights are transposed on the way in.
"""

from __future__ import annotations

import glob
import os
from typing import Any, Callable, Dict, Mapping

import numpy as np

from blim_tpu.core.config import ModelConfig, Qwen2Config, VisionConfig


def _to_np(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    # torch tensor (possibly bf16) without importing torch at module scope
    try:
        import torch

        if isinstance(x, torch.Tensor):
            return x.detach().to(torch.float32).cpu().numpy()
    except ImportError:
        pass
    return np.asarray(x)


class _SD:
    """Accessor over a flat name->tensor mapping with prefix handling."""

    def __init__(self, sd: Mapping[str, Any], prefix: str = ""):
        self.sd = sd
        self.prefix = prefix

    def __call__(self, name: str) -> np.ndarray:
        return _to_np(self.sd[self.prefix + name])

    def has(self, name: str) -> bool:
        return (self.prefix + name) in self.sd

    def sub(self, prefix: str) -> "_SD":
        return _SD(self.sd, self.prefix + prefix)


def _stack(getter: Callable[[int], np.ndarray], n: int) -> np.ndarray:
    return np.stack([getter(i) for i in range(n)], axis=0)


def _linear(sd: _SD, name: str, bias: bool):
    out: Dict[str, np.ndarray] = {"kernel": sd(f"{name}.weight").T}
    if bias:
        out["bias"] = sd(f"{name}.bias")
    return out


def convert_qwen2(
    state_dict: Mapping[str, Any],
    config: Qwen2Config,
    prefix: str = "model.",
    lm_head_key: str = "lm_head.weight",
) -> Dict[str, Any]:
    """Map an HF Qwen2 state_dict to the stacked-layer pytree of models/qwen2.py."""
    sd = _SD(state_dict, prefix)
    L = config.num_hidden_layers

    def lk(i: int, name: str) -> np.ndarray:
        return sd(f"layers.{i}.{name}")

    layers = {
        "input_layernorm": {"scale": _stack(lambda i: lk(i, "input_layernorm.weight"), L)},
        "post_attention_layernorm": {
            "scale": _stack(lambda i: lk(i, "post_attention_layernorm.weight"), L)
        },
        "q_proj": {
            "kernel": _stack(lambda i: lk(i, "self_attn.q_proj.weight").T, L),
            "bias": _stack(lambda i: lk(i, "self_attn.q_proj.bias"), L),
        },
        "k_proj": {
            "kernel": _stack(lambda i: lk(i, "self_attn.k_proj.weight").T, L),
            "bias": _stack(lambda i: lk(i, "self_attn.k_proj.bias"), L),
        },
        "v_proj": {
            "kernel": _stack(lambda i: lk(i, "self_attn.v_proj.weight").T, L),
            "bias": _stack(lambda i: lk(i, "self_attn.v_proj.bias"), L),
        },
        "o_proj": {"kernel": _stack(lambda i: lk(i, "self_attn.o_proj.weight").T, L)},
        "gate_proj": {"kernel": _stack(lambda i: lk(i, "mlp.gate_proj.weight").T, L)},
        "up_proj": {"kernel": _stack(lambda i: lk(i, "mlp.up_proj.weight").T, L)},
        "down_proj": {"kernel": _stack(lambda i: lk(i, "mlp.down_proj.weight").T, L)},
    }
    params = {
        "embed_tokens": {"embedding": sd("embed_tokens.weight")},
        "layers": layers,
        "norm": {"scale": sd("norm.weight")},
    }
    if config.tie_word_embeddings or lm_head_key not in state_dict:
        params["lm_head"] = {"kernel": None}
    else:
        params["lm_head"] = {"kernel": _to_np(state_dict[lm_head_key]).T}
    return params


def convert_mlp_seq(sd: _SD, name: str) -> Dict[str, Any]:
    """nn.Sequential(Linear, GELU, Linear) -> {'fc1','fc2'} (projector MLPs,
    reference: mm_projector_builder.py:88-93)."""
    return {
        "fc1": _linear(sd, f"{name}.0", bias=True),
        "fc2": _linear(sd, f"{name}.2", bias=True),
    }


def convert_projector(state_dict: Mapping[str, Any], prefix: str = "model.mm_projector.") -> Dict[str, Any]:
    sd = _SD(state_dict, prefix)
    return {"mlp": convert_mlp_seq(sd, "mlp"), "tvg_mlp": convert_mlp_seq(sd, "tvg_mlp")}


def convert_vision_tower(
    state_dict: Mapping[str, Any],
    config: VisionConfig,
    prefix: str = "model.vision_tower.vision_tower.encoder.",
) -> Dict[str, Any]:
    """UMT ViT (reference: vision_tower_builder.py:272-433) -> stacked pytree."""
    sd = _SD(state_dict, prefix)
    L = config.depth

    def blk(i: int, name: str) -> np.ndarray:
        return sd(f"blocks.{i}.{name}")

    layers: Dict[str, Any] = {
        "norm1": {
            "scale": _stack(lambda i: blk(i, "norm1.weight"), L),
            "bias": _stack(lambda i: blk(i, "norm1.bias"), L),
        },
        "norm2": {
            "scale": _stack(lambda i: blk(i, "norm2.weight"), L),
            "bias": _stack(lambda i: blk(i, "norm2.bias"), L),
        },
        # qkv is one packed Linear(dim, 3*dim, bias=False) with separate
        # q/v bias parameters and an implicit zero k bias
        # (reference: vision_tower_builder.py:78-84,101-105).
        "qkv": {"kernel": _stack(lambda i: blk(i, "attn.qkv.weight").T, L)},
        "proj": {
            "kernel": _stack(lambda i: blk(i, "attn.proj.weight").T, L),
            "bias": _stack(lambda i: blk(i, "attn.proj.bias"), L),
        },
        "fc1": {
            "kernel": _stack(lambda i: blk(i, "mlp.fc1.weight").T, L),
            "bias": _stack(lambda i: blk(i, "mlp.fc1.bias"), L),
        },
        "fc2": {
            "kernel": _stack(lambda i: blk(i, "mlp.fc2.weight").T, L),
            "bias": _stack(lambda i: blk(i, "mlp.fc2.bias"), L),
        },
    }
    if sd.has("blocks.0.attn.q_bias"):
        layers["q_bias"] = _stack(lambda i: blk(i, "attn.q_bias"), L)
        layers["v_bias"] = _stack(lambda i: blk(i, "attn.v_bias"), L)
    params = {
        "patch_embed": {
            # Conv3d weight (out, in, t, h, w) -> (t, h, w, in, out)
            "kernel": sd("patch_embed.proj.weight").transpose(2, 3, 4, 1, 0),
            "bias": sd("patch_embed.proj.bias"),
        },
        "blocks": layers,
        "final_norm": {
            "scale": sd("vision_layernorm.weight"),
            "bias": sd("vision_layernorm.bias"),
        },
    }
    return params


def convert_videochat_flash(state_dict: Mapping[str, Any], config: ModelConfig) -> Dict[str, Any]:
    """Full VideoChat-Flash checkpoint -> blim_tpu multimodal param tree."""
    params: Dict[str, Any] = {
        "llm": convert_qwen2(state_dict, config.llm, prefix="model."),
        "projector": convert_projector(state_dict),
        "visual_head": {"kernel": _to_np(state_dict["visual_head.weight"]).T},
    }
    if any(k.startswith("model.vision_tower.") for k in state_dict):
        params["vision_tower"] = convert_vision_tower(state_dict, config.vision)
    return params


def load_hf_state_dict(model_path: str) -> Dict[str, np.ndarray]:
    """Load all tensors from an HF checkpoint dir (safetensors preferred)."""
    out: Dict[str, np.ndarray] = {}
    st_files = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
    if st_files:
        from safetensors import safe_open

        for path in st_files:
            with safe_open(path, framework="np") as f:
                for name in f.keys():
                    t = f.get_tensor(name)
                    if t.dtype == np.dtype("V2"):  # raw bf16 — reload via torch
                        t = None
                    if t is None:
                        import torch
                        from safetensors.torch import load_file

                        return {
                            k: _to_np(v)
                            for p in st_files
                            for k, v in load_file(p).items()
                        }
                    out[name] = t
        return out
    bin_files = sorted(glob.glob(os.path.join(model_path, "pytorch_model*.bin")))
    if not bin_files:
        raise FileNotFoundError(f"no checkpoint shards under {model_path}")
    import torch

    for path in bin_files:
        sd = torch.load(path, map_location="cpu", weights_only=True)
        out.update({k: _to_np(v) for k, v in sd.items()})
    return out
