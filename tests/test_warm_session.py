"""warm_session loads every executable an evaluation dispatches — the bench's
steady-state warm pass (engine/evaluation.py). Pins the r5 properties:

1. after warm_session, a FRESH-data evaluation at the same bank shapes
   compiles/loads no new step executable (the jit trace-cache sizes of every
   shared step wrapper are unchanged) — the condition the r4 verdict asked
   tests to pin;
2. step wrappers are process-wide (rerank.step_jit): a second engine with the
   same config/layout reuses the first engine's wrappers, so its warm is free;
3. warmup wall time is recorded in engine.last_warmup_s.

Reference behavior being replaced: the CUDA reference has no analogue — torch
eager has no per-shape executable load; through the remote-compile tunnel each
first call costs 0.3-0.5s on the dispatch path (PERF_NOTES_R4 §1).
"""

import numpy as np
import pytest
import jax

from blim_tpu.core.config import tiny_model_config
from blim_tpu.core.mesh import make_mesh
from blim_tpu.data.prompts import make_tvg_layout, make_vtg_layout
from blim_tpu.engine import rerank as rr
from blim_tpu.engine.evaluation import EvalInputs, evaluation, warm_session
from blim_tpu.engine.rerank import RerankEngine
from blim_tpu.models import videochat_flash as vcf

N = 6


@pytest.fixture(scope="module")
def setup(tokenizer):
    cfg = tiny_model_config(vocab_size=152064)
    params = vcf.init_params(cfg, jax.random.key(0))
    vtg_l = make_vtg_layout(tokenizer, "MSRVTT", cfg.video_tokens_vtg,
                            max_caption_tokens=48)
    tvg_l = make_tvg_layout(tokenizer, cfg.num_clips, max_caption_tokens=48)
    return cfg, params, vtg_l, tvg_l


def _small_engine(cfg, params, vtg_l, tvg_l, mesh):
    engine = RerankEngine(params, cfg, vtg_l, tvg_l, mesh, batch_size=2)
    # shrink the schedule grids so the exhaustive warm stays CPU-friendly,
    # KEEPING the contracts: a VTG pack size must fit one full-budget caption
    # suffix; the TVG top class must fit one full-budget caption prefix
    engine.pack_sizes = (128,)
    engine.tvg_pack_classes = engine.tvg_pack_classes[-1:]
    engine.tvg_q_buckets = (engine.tvg_pack_classes[0][1],)
    return engine


def _inputs(cfg, seed):
    rng = np.random.default_rng(seed)
    caps = [f"somebody does thing number {i} outdoors" for i in range(N)]
    feats = rng.standard_normal(
        (N, cfg.num_clips, cfg.tokens_per_clip, cfg.mm_hidden_size)
    ).astype(np.float32) * 0.5
    return EvalInputs(
        captions=caps, item_video_idx=np.arange(N), features=feats,
        t2v_iv2=rng.standard_normal((N, N)).astype(np.float32) + 0.01,
        v2t_iv2=rng.standard_normal((N, N)).astype(np.float32) + 0.01,
    )


def _step_cache_sizes():
    # jax.jit exposes the trace/executable cache size per wrapper; the shared
    # wrappers live in rerank._STEP_JITS
    return {k: f._cache_size() for k, f in rr._STEP_JITS.items()}


def test_warm_covers_fresh_eval_and_shares_across_engines(setup, tokenizer):
    cfg, params, vtg_l, tvg_l = setup
    mesh = make_mesh()
    engine = _small_engine(cfg, params, vtg_l, tvg_l, mesh)

    n_exec = warm_session(engine, _inputs(cfg, 11), tokenizer, "MSRVTT",
                          has_tvg=True, cpn=True, naive_batches=0, workers=4)
    assert n_exec > 0
    assert engine.last_warmup_s > 0.0
    warm_sizes = _step_cache_sizes()

    # FRESH data (different captions/lengths/features/pair lists) at the same
    # bank shape: every packed step the eval dispatches must already be warm
    fresh = _inputs(cfg, 23)
    fresh = EvalInputs(
        captions=[f"a person and a dog do activity {i}" for i in range(N)],
        item_video_idx=fresh.item_video_idx, features=fresh.features,
        t2v_iv2=fresh.t2v_iv2, v2t_iv2=fresh.v2t_iv2,
    )
    t2v, v2t = evaluation(engine, fresh, tokenizer, "MSRVTT", topk=3,
                          cpn=True, has_tvg=True, verbose=False)
    for k, m in list(t2v.items()) + list(v2t.items()):
        assert np.isfinite(m[m > -100.0]).all(), k

    packed_keys = [k for k in warm_sizes if "packed" in k[0]]
    assert packed_keys, "no packed step wrappers were created"
    after = _step_cache_sizes()
    cold = {k: (warm_sizes[k], after[k]) for k in packed_keys
            if after[k] != warm_sizes[k]}
    assert not cold, f"evaluation hit cold packed executables: {cold}"

    # a second engine with the same config/layouts shares the wrappers: its
    # warm loads nothing new
    engine2 = _small_engine(cfg, params, vtg_l, tvg_l, mesh)
    for name in ("_vtg_packed_step", "_tvg_packed_step", "_vtg_step"):
        assert getattr(engine2, name) is getattr(engine, name)
    warm_session(engine2, _inputs(cfg, 37), tokenizer, "MSRVTT",
                 has_tvg=True, cpn=True, naive_batches=0, workers=4)
    again = _step_cache_sizes()
    grown = {k: (after[k], again[k]) for k in packed_keys if again[k] != after[k]}
    assert not grown, f"second engine re-traced shared steps: {grown}"

    engine.close()
    engine2.close()
