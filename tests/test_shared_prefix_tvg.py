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


def test_tvg_packed_matches_naive(setup):
    """The packed-prefix schedule (varlen prefixes, head-only prior packs,
    clips-wide suffixes) must reproduce the naive full-sequence scores."""
    engine, banks, vocab, rows, cols = setup
    naive, naive_prior = engine.score_grid_tvg(
        banks, vocab, rows, cols, cap_idx=rows, vid_idx=cols,
        out_shape=(N, N), with_prior=True,
    )
    scores, priors = engine.score_pairs_tvg_packed(
        banks, vocab, cap_idx=rows, vid_idx=cols, with_prior=True,
    )
    packed = np.full((N, N), -100.0, np.float32)
    packed[rows, cols] = scores
    packed_prior = np.full((N, N), -100.0, np.float32)
    packed_prior[rows, cols] = priors
    mask = naive > -100.0
    assert (packed > -100.0).sum() == mask.sum()
    np.testing.assert_allclose(packed[mask], naive[mask], rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(packed_prior[mask], naive_prior[mask], rtol=3e-4, atol=3e-4)


def test_tvg_packed_v2t_direction(setup):
    engine, banks, vocab, rows, cols = setup
    naive, _ = engine.score_grid_tvg(
        banks, vocab, rows, cols, cap_idx=cols, vid_idx=rows,
        out_shape=(N, N), with_prior=False,
    )
    scores, _ = engine.score_pairs_tvg_packed(
        banks, vocab, cap_idx=cols, vid_idx=rows, with_prior=False,
    )
    packed = np.full((N, N), -100.0, np.float32)
    packed[rows, cols] = scores
    mask = naive > -100.0
    np.testing.assert_allclose(packed[mask], naive[mask], rtol=3e-4, atol=3e-4)


def test_tvg_pack_builder_budgets():
    """Every pack respects its class's token and query budgets; every pair
    lands in exactly one query slot; oversize candidate lists split."""
    from blim_tpu.engine.rerank import build_tvg_packs

    rng = np.random.default_rng(0)
    n_caps = 40
    seg_lens = rng.integers(60, 250, size=n_caps).astype(np.int32)
    caps, vids = [], []
    for c in range(n_caps):
        k = int(rng.integers(1, 50))
        caps += [c] * k
        vids += list(rng.integers(0, 100, size=k))
    caps, vids = np.asarray(caps), np.asarray(vids)
    classes = ((128, 160), (256, 96), (512, 160))
    seen = np.zeros(len(caps), np.int32)
    for size, qn, packs in build_tvg_packs(caps, vids, seg_lens, classes):
        assert (size, qn) in classes
        for segs in packs:
            load = sum(int(seg_lens[c]) for c, _, _ in segs)
            tot_q = sum(len(v) for _, v, _ in segs)
            assert load <= size, (load, size)
            assert tot_q <= qn, (tot_q, qn)
            for c, v, pps in segs:
                assert len(v) == len(pps)
                np.testing.assert_array_equal(caps[pps], c)
                np.testing.assert_array_equal(vids[pps], v)
                seen[pps] += 1
    np.testing.assert_array_equal(seen, 1)

def test_tvg_prior_dedup_toggle_identical(setup):
    """prior(c, v) == prior(len(c), v): the (length, video) dedup must return
    bit-identical priors to the undeduped pass (CAPTIONS has same-length
    pairs, so the dedup genuinely merges here)."""
    engine, banks, vocab, rows, cols = setup
    lens = banks["prefix_len_host"]
    assert len(np.unique(lens)) < N, "fixture must contain length collisions"
    assert engine.tvg_prior_dedup
    _, pri_dedup = engine.score_pairs_tvg_packed(
        banks, vocab, cap_idx=rows, vid_idx=cols, with_prior=True,
    )
    engine.tvg_prior_dedup = False
    try:
        _, pri_full = engine.score_pairs_tvg_packed(
            banks, vocab, cap_idx=rows, vid_idx=cols, with_prior=True,
        )
    finally:
        engine.tvg_prior_dedup = True
    np.testing.assert_array_equal(pri_dedup, pri_full)
