"""TVG shared-prefix parity: per-caption prefix-KV scoring (likelihood AND
CPN prior) must equal the naive full-sequence TVG path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from blim_tpu.core.config import tiny_model_config
from blim_tpu.core.mesh import make_mesh
from blim_tpu.data.prompts import make_tvg_layout, make_vtg_layout
from blim_tpu.engine.rerank import CaptionBank, RerankEngine, topk_pairs
from blim_tpu.models import videochat_flash as vcf

N = 6
TOPK = 3

CAPTIONS = [
    "a cat sits on a mat",
    "a man rides a horse",
    "children play soccer",
    "a chef cooks pasta",
    "a dog catches a frisbee",
    "two people dance",
]


@pytest.fixture(scope="module")
def setup(tokenizer):
    cfg = tiny_model_config(vocab_size=152064, num_clips=4)
    params = vcf.init_params(cfg, jax.random.key(0))
    feats = np.asarray(
        jax.random.normal(jax.random.key(1), (N, cfg.num_clips, cfg.tokens_per_clip, cfg.mm_hidden_size))
    ).astype(np.float32) * 0.5
    vtg_l = make_vtg_layout(tokenizer, "MSRVTT", cfg.video_tokens_vtg, max_caption_tokens=24)
    tvg_l = make_tvg_layout(tokenizer, cfg.num_clips, max_caption_tokens=24)
    mesh = make_mesh(devices=jax.devices()[:2])
    engine = RerankEngine(params, cfg, vtg_l, tvg_l, mesh, batch_size=3)
    bank = CaptionBank.build_tvg(CAPTIONS, tokenizer, tvg_l)
    banks = engine.upload(bank, feats)
    vocab = jnp.asarray(vcf.make_video_vocab(feats), jnp.float32)
    sims = np.random.default_rng(2).standard_normal((N, N)).astype(np.float32)
    rows, cols = topk_pairs(sims, TOPK)
    return engine, banks, vocab, rows, cols


def test_tvg_shared_matches_naive(setup):
    engine, banks, vocab, rows, cols = setup
    # t2v-style: caption = row (group key), video = col
    naive, naive_prior = engine.score_grid_tvg(
        banks, vocab, rows, cols, cap_idx=rows, vid_idx=cols,
        out_shape=(N, N), with_prior=True,
    )
    shared, shared_prior = engine.score_grid_tvg_shared(
        banks, vocab, rows, cols, cap_idx=rows, vid_idx=cols,
        out_shape=(N, N), with_prior=True, topk=TOPK,
    )
    mask = naive > -100.0
    assert (shared > -100.0).sum() == mask.sum()
    np.testing.assert_allclose(shared[mask], naive[mask], rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(shared_prior[mask], naive_prior[mask], rtol=3e-4, atol=3e-4)


def test_tvg_shared_v2t_direction(setup):
    engine, banks, vocab, rows, cols = setup
    # v2t-style: caption = col (group key), video = row
    naive, _ = engine.score_grid_tvg(
        banks, vocab, rows, cols, cap_idx=cols, vid_idx=rows,
        out_shape=(N, N), with_prior=False,
    )
    shared, _ = engine.score_grid_tvg_shared(
        banks, vocab, rows, cols, cap_idx=cols, vid_idx=rows,
        out_shape=(N, N), with_prior=False, topk=TOPK,
    )
    mask = naive > -100.0
    np.testing.assert_allclose(shared[mask], naive[mask], rtol=3e-4, atol=3e-4)
