"""Generation parity: greedy KV-cache decode must match HF transformers'
greedy generate on the same tiny Qwen2 weights, and must equal our own
no-cache argmax rollout."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from blim_tpu.checkpoints.convert import convert_qwen2
from blim_tpu.core.config import Qwen2Config
from blim_tpu.models import generation, qwen2


@pytest.fixture(scope="module")
def tiny():
    import torch
    from transformers import Qwen2Config as HFConfig
    from transformers.models.qwen2 import Qwen2ForCausalLM

    torch.manual_seed(1)
    hf_cfg = HFConfig(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=256, rope_theta=1e6, tie_word_embeddings=False,
        attn_implementation="eager",
    )
    hf = Qwen2ForCausalLM(hf_cfg).eval()
    cfg = Qwen2Config(
        vocab_size=128, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, rope_theta=1e6, max_position_embeddings=256,
    )
    params = convert_qwen2(hf.state_dict(), cfg)
    return hf, cfg, params


def test_greedy_matches_hf_generate(tiny, rng):
    import torch

    hf, cfg, params = tiny
    ids = rng.integers(0, 128, size=(1, 10))
    with torch.no_grad():
        out = hf.generate(
            torch.tensor(ids), max_new_tokens=8, do_sample=False,
            eos_token_id=999, pad_token_id=0,  # eos id outside vocab: never stops
        )
    expect = out[0, 10:].numpy()

    emb = qwen2.embed_tokens(params, jnp.asarray(ids))
    tokens = generation.generate_tokens(
        params, cfg, emb, jnp.ones_like(jnp.asarray(ids)), 8, eos_token_ids=[999],
    )
    np.testing.assert_array_equal(np.asarray(tokens[0]), expect)


def test_greedy_matches_no_cache_rollout(tiny, rng):
    """The KV-cache loop must produce the same tokens as recomputing the full
    sequence each step (cache correctness)."""
    _, cfg, params = tiny
    ids = list(rng.integers(0, 128, size=6))
    rollout = []
    cur = list(ids)
    for _ in range(6):
        logits = qwen2.forward_logits(params, cfg, jnp.asarray([cur]))
        nxt = int(jnp.argmax(logits[0, -1]))
        rollout.append(nxt)
        cur.append(nxt)

    emb = qwen2.embed_tokens(params, jnp.asarray([ids]))
    tokens = generation.generate_tokens(
        params, cfg, emb, jnp.ones((1, len(ids)), jnp.int32), 6, eos_token_ids=[999],
    )
    assert list(np.asarray(tokens[0])) == rollout


def test_eos_stops_and_pads(tiny, rng):
    _, cfg, params = tiny
    ids = rng.integers(0, 128, size=(1, 5))
    emb = qwen2.embed_tokens(params, jnp.asarray(ids))
    # every token is "eos": generation stops after the first
    all_eos = list(range(128))
    tokens = np.asarray(generation.generate_tokens(
        params, cfg, emb, jnp.ones((1, 5), jnp.int32), 6, eos_token_ids=all_eos,
    ))
    # remaining positions are padded with eos[0] = 0
    assert (tokens[0, 1:] == all_eos[0]).all()


def test_left_padded_prompt(tiny, rng):
    """Left-padded prompts must generate the same tokens as unpadded ones."""
    _, cfg, params = tiny
    ids = rng.integers(1, 128, size=(1, 6))
    emb = qwen2.embed_tokens(params, jnp.asarray(ids))
    t_dense = np.asarray(generation.generate_tokens(
        params, cfg, emb, jnp.ones((1, 6), jnp.int32), 4, eos_token_ids=[999]))

    padded = np.concatenate([np.zeros((1, 3), np.int64), ids], axis=1)
    mask = np.concatenate([np.zeros((1, 3), np.int64), np.ones((1, 6), np.int64)], axis=1)
    emb_p = qwen2.embed_tokens(params, jnp.asarray(padded))
    t_pad = np.asarray(generation.generate_tokens(
        params, cfg, emb_p, jnp.asarray(mask), 4, eos_token_ids=[999]))
    np.testing.assert_array_equal(t_pad, t_dense)


def test_lora_threads_through_generation(tiny, rng):
    """A fine-tuned model must generate through its adapters (VERDICT r1 #3:
    generation silently dropped LoRA). scale-0 LoRA == base greedy output;
    nonzero LoRA must match a full-sequence LoRA'd argmax rollout exactly."""
    from blim_tpu.adapters.lora import LoraConfig, init_llm_lora

    _, cfg, params = tiny
    lcfg = LoraConfig(r=4, alpha=8)
    lora = init_llm_lora(jax.random.key(3), cfg, lcfg)
    # B starts at zero => make the adapter a real perturbation
    lora = jax.tree_util.tree_map(
        lambda x: x + 0.05 * jax.random.normal(jax.random.key(4), x.shape), lora
    )

    ids = list(rng.integers(0, 128, size=6))
    emb = qwen2.embed_tokens(params, jnp.asarray([ids]))
    mask = jnp.ones((1, len(ids)), jnp.int32)

    base = np.asarray(generation.generate_tokens(
        params, cfg, emb, mask, 5, eos_token_ids=[999]))
    zero_scale = np.asarray(generation.generate_tokens(
        params, cfg, emb, mask, 5, eos_token_ids=[999], lora=lora, lora_scale=0.0))
    np.testing.assert_array_equal(zero_scale, base)

    # full-sequence LoRA'd rollout = ground truth for the KV-cache loop
    scale = lcfg.scale
    rollout = []
    cur = list(ids)
    for _ in range(5):
        logits = qwen2.forward_logits(
            params, cfg, jnp.asarray([cur]), lora=lora, lora_scale=scale)
        nxt = int(jnp.argmax(logits[0, -1]))
        rollout.append(nxt)
        cur.append(nxt)

    with_lora = np.asarray(generation.generate_tokens(
        params, cfg, emb, mask, 5, eos_token_ids=[999], lora=lora, lora_scale=scale))
    assert list(with_lora[0]) == rollout
    assert list(with_lora[0]) != list(base[0]), "LoRA perturbation must change the output"


def test_keywords_trim():
    crit = generation.KeywordsStoppingCriteria(["<|im_end|>"], None)
    assert crit.trim("hello world<|im_end|>\nextra") == "hello world"
    assert crit.trim("no keyword here") == "no keyword here"
