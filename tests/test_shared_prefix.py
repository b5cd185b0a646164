"""Shared-prefix (prefix-KV reuse) scoring must be numerically equivalent to
the naive full-sequence path — likelihoods AND the CPN prior (the prior is
video-independent, so the per-caption computation must match the reference's
per-pair computation)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from blim_tpu.core.config import tiny_model_config
from blim_tpu.core.mesh import make_mesh
from blim_tpu.data.prompts import make_vtg_layout
from blim_tpu.engine.rerank import CaptionBank, RerankEngine, group_pairs_by_video, topk_pairs
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
    layout = make_vtg_layout(tokenizer, "MSRVTT", cfg.video_tokens_vtg, max_caption_tokens=24)
    mesh = make_mesh(devices=jax.devices()[:2])
    engine = RerankEngine(params, cfg, layout, None, mesh, batch_size=3)
    bank = CaptionBank.build_vtg(CAPTIONS, tokenizer, "MSRVTT", layout)
    banks = engine.upload(bank, feats)
    sims = np.random.default_rng(2).standard_normal((N, N)).astype(np.float32)
    rows, cols = topk_pairs(sims, TOPK)
    return engine, banks, rows, cols


def test_group_pairs_by_video_covers_all_pairs():
    rng = np.random.default_rng(0)
    rows = np.repeat(np.arange(10), 4)
    cols = np.concatenate([rng.permutation(10)[:4] for _ in range(10)])  # unique (r,c)
    vid = rng.integers(0, 5, 40)
    g_vid, g_cap, g_rows, g_cols = group_pairs_by_video(rows, cols, vid, cols, k=4)
    # every original pair appears
    got = set(zip(g_rows.reshape(-1), g_cols.reshape(-1)))
    assert set(zip(rows, cols)) <= got
    # each group's pairs share the video
    for m in range(len(g_vid)):
        pair_positions = [np.where((rows == r) & (cols == c))[0] for r, c in zip(g_rows[m], g_cols[m])]
        for pp in pair_positions:
            assert (vid[pp] == g_vid[m]).all()


def test_shared_prefix_matches_naive_likelihood(setup):
    engine, banks, rows, cols = setup
    vid_idx = rows.copy()  # v2t: video of pair = row item (1:1)
    naive, naive_prior = engine.score_grid_vtg(
        banks, rows, cols, cap_idx=cols, vid_idx=vid_idx,
        out_shape=(N, N), with_prior=True,
    )
    shared, shared_prior = engine.score_grid_vtg_shared(
        banks, rows, cols, cap_idx=cols, vid_idx=vid_idx,
        out_shape=(N, N), with_prior=True, topk=TOPK,
    )
    mask = naive > -100.0
    assert (shared > -100.0).sum() == mask.sum()
    np.testing.assert_allclose(shared[mask], naive[mask], rtol=3e-4, atol=3e-4)
    # the prior: per-caption shared computation == per-pair naive computation
    np.testing.assert_allclose(shared_prior[mask], naive_prior[mask], rtol=3e-4, atol=3e-4)


def test_shared_prefix_t2v_direction(setup):
    engine, banks, rows, cols = setup
    # t2v: caption = row, video = col item
    naive, _ = engine.score_grid_vtg(
        banks, rows, cols, cap_idx=rows, vid_idx=cols,
        out_shape=(N, N), with_prior=False,
    )
    shared, _ = engine.score_grid_vtg_shared(
        banks, rows, cols, cap_idx=rows, vid_idx=cols,
        out_shape=(N, N), with_prior=False, topk=TOPK,
    )
    mask = naive > -100.0
    np.testing.assert_allclose(shared[mask], naive[mask], rtol=3e-4, atol=3e-4)


def test_group_pairs_bucketed_covers_all_pairs_with_small_remainders():
    from blim_tpu.engine.rerank import group_pairs_bucketed

    rng = np.random.default_rng(0)
    # 20 videos with 1..70 pairs each (the union grid averages ~2*topk=32)
    key_idx, pay_idx = [], []
    counts = {}
    for v in range(20):
        c = int(rng.integers(1, 70))
        counts[v] = c
        key_idx += [v] * c
        pay_idx += list(rng.integers(0, 1000, c))
    key_idx = np.asarray(key_idx)
    pay_idx = np.asarray(pay_idx)

    buckets = group_pairs_bucketed(key_idx, pay_idx, 32, rem_buckets=(16, 8, 4))
    seen_pos = set()
    for k, g_key, g_pay, g_pos in buckets:
        assert g_pay.shape == g_pos.shape == (len(g_key), k)
        for row in range(len(g_key)):
            # every slot's position belongs to this group's key
            assert (key_idx[g_pos[row]] == g_key[row]).all()
            # padded slots repeat a real position (idempotent scatter)
            seen_pos.update(g_pos[row].tolist())
    assert seen_pos == set(range(len(key_idx)))   # full coverage

    # padding waste is bounded by the bucket granularity: total slots
    # <= pairs + (#groups * largest remainder bucket)
    total_slots = sum(len(g_key) * k for k, g_key, _, _ in buckets)
    n_groups = sum(len(g_key) for _, g_key, _, _ in buckets)
    assert total_slots <= len(key_idx) + n_groups * 16
    # and is far below plain k_main chunking for this distribution
    plain_groups = sum(-(-c // 32) for c in counts.values())
    assert total_slots < plain_groups * 32


def test_build_packs_covers_all_pairs_without_mixing_keys():
    from blim_tpu.engine.rerank import build_packs

    rng = np.random.default_rng(0)
    key_idx, cap_idx = [], []
    for v in range(15):
        c = int(rng.integers(1, 60))
        key_idx += [v] * c
        cap_idx += list(rng.integers(0, 200, c))
    key_idx, cap_idx = np.asarray(key_idx), np.asarray(cap_idx)
    seg_lens = rng.integers(5, 30, 200)

    seen = set()
    for size, packs in build_packs(key_idx, cap_idx, seg_lens, (64, 128, 256)):
        for key, caps, positions in packs:
            assert len(caps) == len(positions) <= size // 4
            load = sum(int(seg_lens[c]) for c in caps)
            assert load <= size
            for c, p in zip(caps, positions):
                assert key_idx[p] == key and cap_idx[p] == c
                seen.add(p)
    assert seen == set(range(len(key_idx)))   # every pair exactly once


def test_packed_matches_naive_likelihood_and_prior(setup):
    """The varlen pack schedule must reproduce the rectangle schedule AND the
    naive full-sequence scores exactly (same math, different batching)."""
    engine, banks, rows, cols = setup
    vid_idx = rows.copy()
    naive, naive_prior = engine.score_grid_vtg(
        banks, rows, cols, cap_idx=cols, vid_idx=vid_idx,
        out_shape=(N, N), with_prior=True,
    )
    packed = engine.score_pairs_vtg_packed(banks, np.asarray(cols), vid_idx)
    mat = np.full((N, N), -100.0, np.float32)
    mat[rows, cols] = packed
    mask = naive > -100.0
    np.testing.assert_allclose(mat[mask], naive[mask], rtol=3e-4, atol=3e-4)

    prior = engine.compute_vtg_priors_packed(banks)
    pmat = np.full((N, N), -100.0, np.float32)
    pmat[rows, cols] = prior[cols]
    np.testing.assert_allclose(pmat[mask], naive_prior[mask], rtol=3e-4, atol=3e-4)


def test_packed_t2v_direction(setup):
    engine, banks, rows, cols = setup
    naive, _ = engine.score_grid_vtg(
        banks, rows, cols, cap_idx=rows, vid_idx=cols,
        out_shape=(N, N), with_prior=False,
    )
    packed = engine.score_pairs_vtg_packed(banks, np.asarray(rows), np.asarray(cols))
    mat = np.full((N, N), -100.0, np.float32)
    mat[rows, cols] = packed
    mask = naive > -100.0
    np.testing.assert_allclose(mat[mask], naive[mask], rtol=3e-4, atol=3e-4)
