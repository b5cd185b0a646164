"""Rerank engine with tensor-parallel params: a dp=2 x tp=4 mesh must produce
the same score matrices as single-device (the TP path exists for checkpoints
larger than one chip's HBM)."""

import numpy as np
import pytest
import jax

from blim_tpu.core.config import tiny_model_config
from blim_tpu.core.mesh import make_mesh
from blim_tpu.data.prompts import make_vtg_layout
from blim_tpu.engine.rerank import CaptionBank, RerankEngine, topk_pairs
from blim_tpu.models import videochat_flash as vcf

N, TOPK = 4, 2
CAPTIONS = ["a cat sits", "a man runs", "kids play ball", "a chef cooks"]


@pytest.mark.slow
def test_tp_engine_matches_single_device(tokenizer):
    cfg = tiny_model_config(vocab_size=152064, num_clips=4)
    params = vcf.init_params(cfg, jax.random.key(0))
    feats = np.asarray(
        jax.random.normal(jax.random.key(1), (N, cfg.num_clips, cfg.tokens_per_clip, cfg.mm_hidden_size))
    ).astype(np.float32) * 0.5
    layout = make_vtg_layout(tokenizer, "MSRVTT", cfg.video_tokens_vtg, max_caption_tokens=24)
    sims = np.random.default_rng(2).standard_normal((N, N)).astype(np.float32)
    rows, cols = topk_pairs(sims, TOPK)
    bank = CaptionBank.build_vtg(CAPTIONS, tokenizer, "MSRVTT", layout)

    def run(mesh):
        engine = RerankEngine(params, cfg, layout, None, mesh, batch_size=2)
        banks = engine.upload(bank, feats)
        mat, _ = engine.score_grid_vtg(
            banks, rows, cols, cap_idx=cols, vid_idx=rows,
            out_shape=(N, N), with_prior=False,
        )
        return mat

    single = run(make_mesh(devices=jax.devices()[:1]))
    tp = run(make_mesh(data=2, model=4))
    mask = single > -100.0
    np.testing.assert_allclose(tp[mask], single[mask], rtol=3e-4, atol=3e-4)
