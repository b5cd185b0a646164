"""PyramidDrop (in-LLM video-token pruning) — TPU static-shape redesign of
the reference's video_level_compress (reference:
modeling_qwen2_flash.py:1081-1357).

Oracles:
  * keep-all ratios == the plain decoder forward exactly;
  * uniform drop == manually re-splicing the kept tokens and running the
    plain decoder on the shorter sequence (positions renumber like the
    reference's repack);
  * attention ranking keeps exactly the indices an independent numpy
    replication of the reference's rank math selects.
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from blim_tpu.core.config import from_hf_config_dict, tiny_model_config
from blim_tpu.models import qwen2
from blim_tpu.models.pyramid_drop import pdrop_forward_hidden, rank_video_tokens

B, S, NV, VSTART = 2, 40, 16, 6       # 6 prefix | 16 video | 18 suffix
QPOS = VSTART + NV + 3                # "last instruction token"


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_model_config(vocab_size=128).llm
    params = qwen2.init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    emb = jnp.asarray(rng.standard_normal((B, S, cfg.hidden_size)), jnp.float32) * 0.3
    mask = np.ones((B, S), np.int32)
    mask[0, -4:] = 0                  # right padding
    return cfg, params, emb, jnp.asarray(mask)


def test_keep_all_matches_plain_forward(setup):
    cfg, params, emb, mask = setup
    out, idx = pdrop_forward_hidden(
        params, cfg, emb, mask, VSTART, NV, QPOS,
        layer_list=[1], ratio_list=[1.0, 1.0], compress_type="uniform",
    )
    ref = qwen2.forward_hidden(params, cfg, emb, mask)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(idx), np.broadcast_to(np.arange(S), (B, S)))


def test_uniform_drop_matches_manual_resplice(setup):
    """Dropping uniformly at layer 1 == running layer 0 on the full sequence,
    gathering the kept tokens, and running the remaining layers on the short
    sequence with renumbered positions."""
    cfg, params, emb, mask = setup
    keep = int(NV * 0.5)
    out, idx = pdrop_forward_hidden(
        params, cfg, emb, mask, VSTART, NV, QPOS,
        layer_list=[1], ratio_list=[1.0, 0.5], compress_type="uniform",
    )
    lin = np.linspace(0, NV - 1, keep).astype(np.int64)
    kept = np.concatenate([np.arange(VSTART), lin + VSTART, np.arange(VSTART + NV, S)])
    assert out.shape == (B, len(kept), cfg.hidden_size)
    np.testing.assert_array_equal(np.asarray(idx), np.broadcast_to(kept, (B, len(kept))))

    # manual: layer 0 full-length, gather, layers 1.. on the short sequence
    from blim_tpu.models.pyramid_drop import _run_segment, _slice_layers

    h = _run_segment(
        _slice_layers(params["layers"], 0, 1), cfg, emb, mask,
        jnp.broadcast_to(jnp.arange(S)[None], (B, S)), None, 0.0, None, False,
    )
    h = h[:, kept]
    m = mask[:, kept]
    s2 = len(kept)
    h = _run_segment(
        _slice_layers(params["layers"], 1, cfg.num_hidden_layers), cfg, h, m,
        jnp.broadcast_to(jnp.arange(s2)[None], (B, s2)), None, 0.0, None, False,
    )
    ref = qwen2.rms_norm(h, params["norm"]["scale"], cfg.rms_norm_eps)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_attention_ranking_matches_numpy_oracle(setup):
    """rank_video_tokens == an independent numpy replication of the
    reference's mean-head attention ranking (modeling_qwen2_flash.py:1199-1287)."""
    cfg, params, emb, mask = setup
    pos = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    rank_params = jax.tree_util.tree_map(lambda x: x[1], params["layers"])
    got = np.asarray(rank_video_tokens(rank_params, cfg, emb, mask, pos, QPOS, VSTART, NV))

    # numpy oracle
    x = np.asarray(qwen2.rms_norm(emb, rank_params["input_layernorm"]["scale"], cfg.rms_norm_eps))
    q = x @ np.asarray(rank_params["q_proj"]["kernel"]) + np.asarray(rank_params["q_proj"]["bias"])
    k = x @ np.asarray(rank_params["k_proj"]["kernel"]) + np.asarray(rank_params["k_proj"]["bias"])
    H, Kh, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    cos, sin = qwen2.rope_cos_sin(pos, hd, cfg.rope_theta)
    q = np.asarray(qwen2.apply_rope(jnp.asarray(q.reshape(B, S, H, hd)), cos, sin))
    k = np.asarray(qwen2.apply_rope(jnp.asarray(k.reshape(B, S, Kh, hd)), cos, sin))
    k_rep = np.repeat(k, H // Kh, axis=2)                      # repeat_kv
    scores = np.einsum("bhd,bshd->bhs", q[:, QPOS], k_rep) / np.sqrt(hd)
    visible = (np.arange(S)[None] <= QPOS) & (np.asarray(mask) > 0)
    scores = np.where(visible[:, None, :], scores, -1e30)
    e = np.exp(scores - scores.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    expect = probs.mean(axis=1)[:, VSTART : VSTART + NV]
    np.testing.assert_allclose(got, expect, rtol=1e-4, atol=1e-6)

    # and the staged forward keeps exactly the top-k of that ranking
    keep = 4
    out, idx = pdrop_forward_hidden(
        params, cfg, emb, mask, VSTART, NV, QPOS,
        layer_list=[1], ratio_list=[1.0, keep / NV], compress_type="attention",
    )
    kept_video = np.asarray(idx)[:, VSTART : VSTART + keep] - VSTART
    for b in range(B):
        expect_idx = np.sort(np.argsort(-expect[b])[:keep])
        np.testing.assert_array_equal(kept_video[b], expect_idx)


def test_multi_stage_shapes_and_uniform0_attention(setup):
    cfg, params, emb, mask = setup
    out, idx = pdrop_forward_hidden(
        params, cfg, emb, mask, VSTART, NV, QPOS,
        layer_list=[1, 2], ratio_list=[1.0, 0.5, 0.25],
        compress_type="uniform0_attention",
    )
    final = int(NV * 0.25)
    assert out.shape == (B, S - (NV - final), cfg.hidden_size)
    # prefix and suffix survive verbatim
    np.testing.assert_array_equal(np.asarray(idx)[:, :VSTART],
                                  np.broadcast_to(np.arange(VSTART), (B, VSTART)))
    tail = np.asarray(idx)[:, VSTART + final:]
    np.testing.assert_array_equal(
        tail, np.broadcast_to(np.arange(VSTART + NV, S), (B, S - VSTART - NV))
    )


def test_config_plumbing_and_vcf_entry(setup):
    d = {"mm_llm_compress": True, "llm_compress_layer_list": [8, 16, 24],
         "llm_image_token_ratio_list": [1.0, 0.5, 0.25, 0.125]}
    mc = from_hf_config_dict(d)
    assert mc.mm_llm_compress and mc.llm_compress_layer_list == (8, 16, 24)

    from blim_tpu.models import videochat_flash as vcf

    tiny = tiny_model_config(vocab_size=152064)
    tiny = dataclasses.replace(
        tiny, mm_llm_compress=True, llm_compress_layer_list=(1,),
        llm_image_token_ratio_list=(1.0, 0.5), llm_compress_type="uniform",
    )
    assert vcf.pdrop_total_dropped(tiny) == tiny.video_tokens_vtg // 2
    params = vcf.init_params(tiny, jax.random.key(0))
    Bv, T = 2, 300
    rng = np.random.default_rng(1)
    ids = jnp.asarray(rng.integers(0, 1000, (Bv, T)))
    m = jnp.ones((Bv, T), jnp.int32)
    video = jnp.asarray(rng.standard_normal(
        (Bv, tiny.num_clips, tiny.tokens_per_clip, tiny.mm_hidden_size)), jnp.float32)
    hidden, idx = vcf.vtg_hidden_pdrop(
        params, tiny, ids, m, video, video_start=4,
        query_pos=4 + tiny.video_tokens_vtg + 2,
    )
    assert hidden.shape == (Bv, T - vcf.pdrop_total_dropped(tiny), tiny.llm.hidden_size)
    assert np.isfinite(np.asarray(hidden)).all()
