"""Numerical parity of the functional Qwen2 decoder vs HuggingFace transformers.

The reference LLM is a fork of HF Qwen2 (reference:
videochat_flash/modeling_qwen2_flash.py); HF transformers (baked into this
image) is therefore the ground-truth oracle for logits, including GQA, RoPE,
RMSNorm and left-padding behavior.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from blim_tpu.checkpoints.convert import convert_qwen2
from blim_tpu.core.config import Qwen2Config
from blim_tpu.models import qwen2


@pytest.fixture(scope="module")
def tiny():
    import torch
    from transformers import Qwen2Config as HFConfig
    from transformers.models.qwen2 import Qwen2ForCausalLM

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        rope_theta=1_000_000.0,
        rms_norm_eps=1e-6,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    hf_model = Qwen2ForCausalLM(hf_cfg).eval()
    cfg = Qwen2Config(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        rope_theta=1_000_000.0,
        max_position_embeddings=512,
    )
    params = convert_qwen2(hf_model.state_dict(), cfg)
    params = {k: v for k, v in params.items()}
    return hf_model, cfg, params


def _hf_logits(hf_model, ids, mask):
    import torch

    with torch.no_grad():
        out = hf_model(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
        )
    return out.logits.float().numpy()


def test_logits_parity_dense(tiny, rng):
    hf_model, cfg, params = tiny
    ids = rng.integers(0, 256, size=(2, 24))
    mask = np.ones_like(ids)
    ours = np.asarray(qwen2.forward_logits(params, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    theirs = _hf_logits(hf_model, ids, mask)
    np.testing.assert_allclose(ours, theirs, rtol=2e-4, atol=2e-4)


def test_logits_parity_left_padded(tiny, rng):
    hf_model, cfg, params = tiny
    ids = rng.integers(0, 256, size=(2, 24))
    mask = np.ones_like(ids)
    mask[0, :7] = 0  # left padding on row 0
    mask[1, :3] = 0
    ours = np.asarray(qwen2.forward_logits(params, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    theirs = _hf_logits(hf_model, ids, mask)
    # compare only at real positions (HF's masked positions differ freely)
    for b in range(2):
        real = mask[b] == 1
        np.testing.assert_allclose(ours[b][real], theirs[b][real], rtol=2e-4, atol=2e-4)


def test_cpn_style_interior_mask_zero_rows_are_isolated(tiny, rng):
    """With an interior mask hole, visible-position logits must equal the
    logits of the sequence with the hole's tokens excluded from attention —
    the flash-attn-varlen semantics the CPN prior depends on."""
    hf_model, cfg, params = tiny
    ids = rng.integers(0, 256, size=(1, 16))
    mask = np.ones_like(ids)
    mask[0, 5:9] = 0  # interior hole, like a CPN-masked video block

    ours = np.asarray(qwen2.forward_logits(params, cfg, jnp.asarray(ids), jnp.asarray(mask)))

    # oracle: physically remove the hole, with position ids preserved
    keep = np.nonzero(mask[0])[0]
    import torch

    with torch.no_grad():
        out = hf_model(
            input_ids=torch.tensor(ids[:, keep]),
            position_ids=torch.tensor(keep[None]),
        )
    theirs = out.logits.float().numpy()
    np.testing.assert_allclose(ours[0][keep], theirs[0], rtol=2e-4, atol=2e-4)


def test_left_pad_translation_invariance(tiny):
    """Left padding with plain arange positions must produce the same logits
    at real positions as the unpadded sequence — RoPE causal attention is
    translation-invariant, which is why the reference can use arange positions
    on left-padded eval batches (modeling_qwen2_flash.py:998-1003)."""
    _, cfg, params = tiny
    ids = np.array([[7, 7, 5, 6, 9]])
    mask_padded = np.array([[0, 0, 1, 1, 1]])
    ours_padded = np.asarray(
        qwen2.forward_logits(params, cfg, jnp.asarray(ids), jnp.asarray(mask_padded))
    )
    ours_dense = np.asarray(
        qwen2.forward_logits(params, cfg, jnp.asarray(ids[:, 2:]), jnp.asarray(mask_padded[:, 2:]))
    )
    np.testing.assert_allclose(ours_padded[0, 2:], ours_dense[0], rtol=2e-4, atol=2e-4)
