"""Strongest equivalence check: the COMPLETE evaluation flow (grids + CPN +
fusion + recall) must produce identical recall tables with and without every
TPU optimization (shared prefixes, cross-grid dedup, width bucketing)."""

import numpy as np
import pytest
import jax

from blim_tpu.core.config import tiny_model_config
from blim_tpu.core.mesh import make_mesh
from blim_tpu.data.prompts import make_tvg_layout, make_vtg_layout
from blim_tpu.engine.evaluation import EvalInputs, evaluation
from blim_tpu.engine.rerank import RerankEngine
from blim_tpu.models import videochat_flash as vcf
from blim_tpu.scoring import fusion

N = 6
TOPK = 3

CAPTIONS = [
    "a cat sits",
    "a man rides a horse through a field of yellow flowers",  # crosses buckets
    "kids play",
    "a chef cooks pasta in a busy restaurant kitchen at night",
    "a dog runs",
    "two people dance",
]


@pytest.mark.slow
def test_optimized_eval_equals_naive_recalls(tokenizer):
    cfg = tiny_model_config(vocab_size=152064, num_clips=4)
    params = vcf.init_params(cfg, jax.random.key(0))
    feats = np.asarray(
        jax.random.normal(jax.random.key(1), (N, cfg.num_clips, cfg.tokens_per_clip, cfg.mm_hidden_size))
    ).astype(np.float32) * 0.5
    rng = np.random.default_rng(0)
    inputs = EvalInputs(
        captions=CAPTIONS,
        item_video_idx=np.arange(N),
        features=feats,
        t2v_iv2=rng.standard_normal((N, N)).astype(np.float32) + 0.1,
        v2t_iv2=rng.standard_normal((N, N)).astype(np.float32) + 0.1,
    )
    vtg_l = make_vtg_layout(tokenizer, "MSRVTT", cfg.video_tokens_vtg, max_caption_tokens=64)
    tvg_l = make_tvg_layout(tokenizer, cfg.num_clips, max_caption_tokens=64)
    mesh = make_mesh(devices=jax.devices()[:2])
    engine = RerankEngine(params, cfg, vtg_l, tvg_l, mesh, batch_size=3)

    results = {}
    for mode in (True, False):
        t2v, v2t = evaluation(
            engine, inputs, tokenizer, "MSRVTT", topk=TOPK, cpn=True,
            has_tvg=True, verbose=False, shared_prefix=mode,
        )
        ids = {i: i for i in range(N)}
        results[mode] = fusion.all_scoring_results(
            t2v, v2t, ids, ids, alpha=(0.2, 0.8), c=(1.0, 0.4, 0.9, 0.8),
            cpn=True, has_tvg=True,
        )
    # recall tables must be IDENTICAL (rank-stable under <=3e-4 score noise)
    for name in results[True]:
        assert results[True][name] == results[False][name], (
            name, results[True][name], results[False][name]
        )
