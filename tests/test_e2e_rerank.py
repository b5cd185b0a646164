"""End-to-end mini rerank on the simulated 8-device CPU mesh.

Synthetic features + random tiny model: checks grid assembly, fill sentinels,
cross-direction consistency (the same (caption, video) pair must score
identically wherever it appears), and 8-device vs 1-device equivalence —
the TPU-world substitute for the reference's torchrun multi-GPU eval
(reference: retrieval_utils.py:206-262)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from blim_tpu.core.config import tiny_model_config
from blim_tpu.core.mesh import make_mesh
from blim_tpu.data.prompts import make_tvg_layout, make_vtg_layout
from blim_tpu.engine.evaluation import EvalInputs, evaluation
from blim_tpu.engine.rerank import CaptionBank, RerankEngine, topk_pairs
from blim_tpu.models import videochat_flash as vcf
from blim_tpu.scoring import fusion

N = 8     # items (1:1 caption-video)
TOPK = 4

CAPTIONS = [
    "a cat sits on a mat",
    "a man rides a horse through a field",
    "children play soccer in the park",
    "a chef cooks pasta in a kitchen",
    "a dog catches a frisbee",
    "two people dance under the lights",
    "a train crosses a long bridge",
    "waves crash against the rocks",
]


@pytest.fixture(scope="module")
def setup(tokenizer):
    cfg = tiny_model_config(vocab_size=152064, num_clips=4)
    params = vcf.init_params(cfg, jax.random.key(0))
    feats = np.asarray(
        jax.random.normal(jax.random.key(1), (N, cfg.num_clips, cfg.tokens_per_clip, cfg.mm_hidden_size))
    ) * 0.5
    rng = np.random.default_rng(0)
    iv2_t2v = rng.standard_normal((N, N)).astype(np.float32) + 0.1
    iv2_v2t = rng.standard_normal((N, N)).astype(np.float32) + 0.1
    inputs = EvalInputs(
        captions=CAPTIONS,
        item_video_idx=np.arange(N),
        features=feats,
        t2v_iv2=iv2_t2v,
        v2t_iv2=iv2_v2t,
    )
    vtg_l = make_vtg_layout(tokenizer, "MSRVTT", cfg.video_tokens_vtg, max_caption_tokens=48)
    tvg_l = make_tvg_layout(tokenizer, cfg.num_clips, max_caption_tokens=48)
    return cfg, params, inputs, vtg_l, tvg_l


def _run(setup, tokenizer, n_devices, cpn=True, has_tvg=True, batch=2):
    cfg, params, inputs, vtg_l, tvg_l = setup
    mesh = make_mesh(devices=jax.devices()[:n_devices])
    engine = RerankEngine(params, cfg, vtg_l, tvg_l, mesh, batch_size=batch)
    return evaluation(
        engine, inputs, tokenizer, "MSRVTT", topk=TOPK, cpn=cpn, has_tvg=has_tvg, verbose=False
    )


def test_topk_pairs_matches_numpy_topk():
    rng = np.random.default_rng(3)
    sims = rng.standard_normal((5, 9))
    rows, cols = topk_pairs(sims, 4)
    assert rows.shape == cols.shape == (20,)
    for r in range(5):
        got = set(cols[rows == r])
        expect = set(np.argsort(-sims[r])[:4])
        assert got == expect


def test_e2e_matrices_and_consistency(setup, tokenizer):
    t2v, v2t = _run(setup, tokenizer, n_devices=1)

    # shape + fill sentinel outside topk
    for name in ["candidate_likelihood", "query_likelihood", "candidate_prior"]:
        assert v2t[name].shape == (N, N)
    rows, cols = topk_pairs(np.asarray(setup[2].v2t_iv2), TOPK)
    mask = np.full((N, N), False)
    mask[rows, cols] = True
    assert (v2t["candidate_likelihood"][~mask] == -100.0).all()
    assert (v2t["candidate_likelihood"][mask] > -100.0).all()

    # cross-direction consistency: P(caption j | video i) is the same number
    # in the v2t candidate grid and the t2v query grid wherever both sampled it
    t_rows, t_cols = topk_pairs(np.asarray(setup[2].t2v_iv2), TOPK)
    t_mask = np.full((N, N), False)
    t_mask[t_rows, t_cols] = True
    both = mask & t_mask.T  # (video i, caption j) scored in both grids
    assert both.sum() > 0
    np.testing.assert_allclose(
        v2t["candidate_likelihood"][both], t2v["query_likelihood"].T[both], rtol=2e-3, atol=2e-4
    )

    # CPN prior must differ from the likelihood on scored cells
    assert not np.allclose(
        v2t["candidate_likelihood"][mask], v2t["candidate_prior"][mask]
    )


def test_e2e_8dev_matches_1dev(setup, tokenizer):
    t2v_1, v2t_1 = _run(setup, tokenizer, n_devices=1)
    t2v_8, v2t_8 = _run(setup, tokenizer, n_devices=8)
    for k in v2t_1:
        np.testing.assert_allclose(v2t_8[k], v2t_1[k], rtol=2e-4, atol=2e-4, err_msg=k)
    for k in t2v_1:
        np.testing.assert_allclose(t2v_8[k], t2v_1[k], rtol=2e-4, atol=2e-4, err_msg=k)


def test_e2e_zeroshot_gating(setup, tokenizer):
    t2v, v2t = _run(setup, tokenizer, n_devices=2, cpn=True, has_tvg=False)
    assert "candidate_likelihood" not in t2v
    assert "query_likelihood" not in v2t
    assert "candidate_prior" in v2t          # v2t prior still computed
    assert "candidate_prior" not in t2v
    # the fusion layer consumes this gated dict without KeyErrors
    ids = {i: i for i in range(N)}
    res = fusion.all_scoring_results(
        t2v, v2t, ids, ids, alpha=(0.0, 0.8), c=(1.0, 0.0, 0.8, 0.6), cpn=True, has_tvg=False
    )
    assert set(res) == {"internvideo2", "candidate_likelihood", "query_likelihood",
                        "cpn_candidate_likelihood", "blim"}


def test_e2e_host_streamed_features_match_resident(setup, tokenizer):
    """When the feature bank exceeds the device budget it stays on host
    (fp16) and streams per step; scores must match the device-resident path
    to fp16-quantization tolerance. (v5e-1: 7B weights leave ~500MB HBM, a
    1000-video bank is 524MB — this is the production single-chip mode.)"""
    cfg, params, inputs, vtg_l, tvg_l = setup
    mesh = make_mesh(devices=jax.devices()[:2])

    resident = RerankEngine(params, cfg, vtg_l, None, mesh, batch_size=2)
    streamed = RerankEngine(params, cfg, vtg_l, None, mesh, batch_size=2,
                            max_device_feature_bytes=0)
    t2v_r, v2t_r = evaluation(resident, inputs, tokenizer, "MSRVTT",
                              topk=TOPK, cpn=True, has_tvg=False, verbose=False)
    t2v_s, v2t_s = evaluation(streamed, inputs, tokenizer, "MSRVTT",
                              topk=TOPK, cpn=True, has_tvg=False, verbose=False)
    for k in v2t_r:
        np.testing.assert_allclose(v2t_s[k], v2t_r[k], rtol=2e-3, atol=5e-3, err_msg=k)
    for k in t2v_r:
        np.testing.assert_allclose(t2v_s[k], t2v_r[k], rtol=2e-3, atol=5e-3, err_msg=k)
    assert streamed.flops > 0 and abs(streamed.flops - resident.flops) < 1e-6 * resident.flops


def test_e2e_tvg_works_with_streamed_feature_bank(setup, tokenizer):
    """The shared-prefix TVG path gathers precomputed (V, clips, D)
    embeddings (~28KB/video, always resident), so a host-streamed raw
    feature bank no longer blocks the fine-tuned eval — results must match
    the device-resident run. The naive TVG grid still needs the raw bank."""
    cfg, params, inputs, vtg_l, tvg_l = setup
    mesh = make_mesh(devices=jax.devices()[:1])
    engine = RerankEngine(params, cfg, vtg_l, tvg_l, mesh, batch_size=2,
                          max_device_feature_bytes=0)
    t2v_s, v2t_s = evaluation(engine, inputs, tokenizer, "MSRVTT",
                              topk=TOPK, cpn=False, has_tvg=True, verbose=False)
    resident = RerankEngine(params, cfg, vtg_l, tvg_l, mesh, batch_size=2)
    t2v_r, v2t_r = evaluation(resident, inputs, tokenizer, "MSRVTT",
                              topk=TOPK, cpn=False, has_tvg=True, verbose=False)
    # fp16 tolerance: the streamed path ships tvg_embeds' projection chunks
    # as fp16 (features are cached fp16 on disk, so production loses nothing;
    # fp32 chunks doubled the upload and stalled the flow's first steps)
    for key in ("candidate_likelihood", "query_likelihood"):
        np.testing.assert_allclose(t2v_s[key], t2v_r[key], rtol=2e-3, atol=5e-3)
        np.testing.assert_allclose(v2t_s[key], v2t_r[key], rtol=2e-3, atol=5e-3)

    banks = engine.upload(
        CaptionBank.build_vtg(inputs.captions, tokenizer, "MSRVTT", vtg_l),
        inputs.features,
    )
    with pytest.raises(RuntimeError, match="device-resident feature bank"):
        engine._require_device_feats(banks, "naive TVG scoring")
