"""Train-step executed-FLOP accounting (honest MFU numerator).

The 7B base is frozen (grads only wrt LoRA + visual_head, engine/train.py),
so the classic 4x-fwd rule overstates the executed backward by ~1/3 —
VERDICT r3 weak #2. These tests pin the honest formula's structure.
"""

import numpy as np

from blim_tpu.core.config import ModelConfig
from blim_tpu.utils.flops import (
    attention_flops,
    causal_self_attn_terms,
    decoder_matmul_flops_per_token,
    full_forward_flops,
    lm_head_flops,
    train_step_executed_flops,
    tvg_head_flops,
)


def _bench_shape(cfg):
    # the bench.py train-step shape: batch 4, budget 96
    B, wl = 4, 96 + 2
    T_vtg, T_tvg = 280, 200
    return B, T_vtg, wl, T_tvg


def test_executed_is_about_three_quarters_of_4x_rule():
    cfg = ModelConfig()
    B, T_vtg, wl, T_tvg = _bench_shape(cfg)
    out = train_step_executed_flops(
        cfg, B, T_vtg, wl, T_tvg, vocab_videos=64, lora_r=8,
        vtg_video_tokens=cfg.num_clips * cfg.tokens_per_clip,
        tvg_video_tokens=cfg.num_clips * cfg.tokens_per_clip,
    )
    fwd_4x = 4.0 * (
        full_forward_flops(cfg.llm, B, T_vtg, lm_positions=wl)
        + full_forward_flops(cfg.llm, B, T_tvg)
        + tvg_head_flops(cfg, B * cfg.num_clips, 64)
    )
    ratio = out["executed"] / fwd_4x
    # frozen base: no dW on any base matmul -> ~3x decoder matmuls instead
    # of 4x; attention stays 4x but is a minor term at these seq lens
    assert 0.70 < ratio < 0.82, ratio


def test_executed_bounded_by_fwd_multiples():
    cfg = ModelConfig()
    B, T_vtg, wl, T_tvg = _bench_shape(cfg)
    out = train_step_executed_flops(
        cfg, B, T_vtg, wl, T_tvg, vocab_videos=64, lora_r=8,
    )
    # every component multiplier is in [2, 4]
    assert 2.0 * out["fwd"] < out["executed"] < 4.0 * out["fwd"]


def test_component_decomposition_matches_primitives():
    """Rebuild the formula from the documented primitives and match exactly."""
    cfg = ModelConfig()
    B, T_vtg, wl, T_tvg = 2, 128, 32, 96
    llm = cfg.llm
    out = train_step_executed_flops(cfg, B, T_vtg, wl, T_tvg,
                                    vocab_videos=7, lora_r=8)
    tokens = B * (T_vtg + T_tvg)
    m_dec = tokens * decoder_matmul_flops_per_token(llm)
    attn = attention_flops(
        llm, B * (causal_self_attn_terms(T_vtg) + causal_self_attn_terms(T_tvg)))
    head = lm_head_flops(llm, B * wl)
    d, r = llm.hidden_size, 8
    nh = llm.num_attention_heads * llm.head_dim
    nkv = llm.num_key_value_heads * llm.head_dim
    lora_dec = tokens * llm.num_hidden_layers * 2.0 * (
        (d * r + r * nh) + 2.0 * (d * r + r * nkv) + (nh * r + r * d))
    lora_head = B * wl * 2.0 * (d * r + r * llm.vocab_size)
    clips = B * cfg.num_clips
    vh = clips * 2.0 * d * cfg.mm_hidden_size
    bmm = clips * 2.0 * cfg.mm_hidden_size * 7
    expect = (3 * m_dec + 4 * attn + 2 * head + 4 * (lora_dec + lora_head)
              + 3 * vh + 2 * bmm)
    np.testing.assert_allclose(out["executed"], expect, rtol=1e-12)
