"""Deferred feature-bank transfer + the one-device fast upload path.

The tunnel to a real TPU is one FIFO wire, so upload() can defer the big
feature put (`defer_feats=True`) while the feature-independent CPN prior
pass dispatches first; flush_feats() then triggers the transfer. These tests
pin the contract: deferral never changes scores, flushing is idempotent and
automatic at every scoring entry, and the one-device fast-put path yields
replicated NamedSharding arrays identical to the plain path.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from blim_tpu.core.config import tiny_model_config
from blim_tpu.core.mesh import make_mesh
from blim_tpu.data.prompts import make_vtg_layout
from blim_tpu.engine.rerank import CaptionBank, RerankEngine, topk_pairs, unique_pairs
from blim_tpu.models import videochat_flash as vcf

N = 5

CAPTIONS = [
    "a cat sits on a mat",
    "a man rides a horse",
    "children play soccer at the park",
    "a chef cooks",
    "two people dance slowly",
]


@pytest.fixture(scope="module")
def setup(tokenizer):
    cfg = tiny_model_config(vocab_size=152064, num_clips=4)
    params = vcf.init_params(cfg, jax.random.key(0))
    feats = np.asarray(
        jax.random.normal(
            jax.random.key(1), (N, cfg.num_clips, cfg.tokens_per_clip, cfg.mm_hidden_size)
        )
    ).astype(np.float32) * 0.5
    layout = make_vtg_layout(tokenizer, "MSRVTT", cfg.video_tokens_vtg, max_caption_tokens=24)
    bank = CaptionBank.build_vtg(CAPTIONS, tokenizer, "MSRVTT", layout)
    return cfg, params, feats, layout, bank


def _pairs():
    sims = np.random.default_rng(3).standard_normal((N, N)).astype(np.float32)
    rows, cols = topk_pairs(sims, 2)
    return unique_pairs(cols, rows)[:2]


def test_deferred_feats_scores_match_eager(setup, tokenizer):
    cfg, params, feats, layout, bank = setup
    mesh = make_mesh(devices=jax.devices()[:2])
    engine = RerankEngine(params, cfg, layout, None, mesh, batch_size=3)
    cap_idx, vid_idx = _pairs()

    eager = engine.upload(bank, feats)
    assert "feats" in eager and "feats_pending_host" not in eager
    ref = engine.score_pairs_vtg_packed(eager, cap_idx, vid_idx)

    deferred = engine.upload(bank, feats, defer_feats=True)
    assert "feats" not in deferred and "feats_pending_host" in deferred
    # scoring entries auto-flush: no explicit flush_feats() required
    got = engine.score_pairs_vtg_packed(deferred, cap_idx, vid_idx)
    assert "feats" in deferred and "feats_pending_host" not in deferred
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_flush_feats_idempotent_and_noop_without_pending(setup):
    cfg, params, feats, layout, bank = setup
    mesh = make_mesh(devices=jax.devices()[:2])
    engine = RerankEngine(params, cfg, layout, None, mesh, batch_size=3)
    banks = engine.upload(bank, feats, defer_feats=True)
    engine.flush_feats(banks)
    first = banks["feats"]
    engine.flush_feats(banks)  # idempotent: second flush keeps the array
    assert banks["feats"] is first
    # host-streamed banks never have anything to flush
    stream_engine = RerankEngine(
        params, cfg, layout, None, mesh, batch_size=3, max_device_feature_bytes=0
    )
    sbanks = stream_engine.upload(bank, feats, defer_feats=True)
    assert "feats" not in sbanks and "feats_pending_host" not in sbanks
    stream_engine.flush_feats(sbanks)  # no-op
    assert "feats_host" in sbanks


def test_chunked_big_put_matches_direct(setup):
    """Arrays above big_put_chunk_bytes ship as row chunks (each under the
    tunnel's host-blocking flow-control threshold) and are concatenated on
    device; contents and sharding must match the unchunked path."""
    cfg, params, feats, layout, bank = setup
    mesh = make_mesh(devices=jax.devices()[:1])
    engine = RerankEngine(params, cfg, layout, None, mesh, batch_size=3)
    direct = np.asarray(engine._put_replicated(feats, big=True))
    engine.big_put_chunk_bytes = feats.nbytes // 3  # force ~4 chunks
    chunked_arr = engine._put_replicated(feats, big=True)
    assert set(chunked_arr.sharding.device_set) == {mesh.devices.flat[0]}
    np.testing.assert_array_equal(np.asarray(chunked_arr), direct)
    # ragged tail: rows not divisible by the chunk row count
    odd = feats[: feats.shape[0] - 1]
    np.testing.assert_array_equal(
        np.asarray(engine._put_replicated(odd, big=True)), direct[: odd.shape[0]]
    )


def test_deferred_priors_match_immediate(setup):
    cfg, params, feats, layout, bank = setup
    mesh = make_mesh(devices=jax.devices()[:2])
    engine = RerankEngine(params, cfg, layout, None, mesh, batch_size=3)
    banks = engine.upload(bank, feats)
    ref = engine.compute_vtg_priors_packed(banks)
    fin = engine.compute_vtg_priors_packed(banks, deferred=True)
    assert callable(fin)
    np.testing.assert_allclose(fin(), ref, rtol=1e-6)


def test_one_device_fast_put_replicates(setup):
    """On a 1-device mesh the big put routes Device-target + identity-jit
    reshard; the result must still be a replicated-NamedSharding array with
    the same contents as the plain path."""
    cfg, params, feats, layout, bank = setup
    mesh = make_mesh(devices=jax.devices()[:1])
    engine = RerankEngine(params, cfg, layout, None, mesh, batch_size=3)
    assert engine._one_device is not None
    banks = engine.upload(bank, feats)
    arr = banks["feats"]
    assert set(arr.sharding.device_set) == {mesh.devices.flat[0]}
    np.testing.assert_allclose(
        np.asarray(arr, np.float32), feats.astype(np.float32), rtol=1e-2, atol=1e-2
    )
    # and scoring over it works end to end
    cap_idx, vid_idx = _pairs()
    scores = engine.score_pairs_vtg_packed(banks, cap_idx, vid_idx)
    assert np.isfinite(scores).all()
