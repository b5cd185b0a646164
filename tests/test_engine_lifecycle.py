"""RerankEngine lifecycle: a dead engine frees its buffers WITHOUT gc.

Round-3 verdict weak #6: the jitted step partials were bound methods, cycling
engine -> jit wrapper -> bound method -> engine, so `del engine` left the
whole object graph (device banks, compiled executables) to the cycle
collector — bench.py had to run a `del engine; gc.collect()` ritual to avoid
OOM next to the 7B. The impls are now staticmethods with config bound via
functools.partial; these tests pin that the cycle is gone and that close()
drops device state deterministically.
"""

import gc
import weakref

import jax
import numpy as np
import pytest

from blim_tpu.core.config import tiny_model_config
from blim_tpu.core.mesh import make_mesh
from blim_tpu.data.prompts import make_tvg_layout, make_vtg_layout
from blim_tpu.engine.evaluation import EvalInputs, evaluation
from blim_tpu.engine.rerank import RerankEngine
from blim_tpu.models import videochat_flash as vcf


@pytest.fixture(scope="module")
def setup(tokenizer):
    cfg = tiny_model_config(vocab_size=152064, num_clips=4)
    params = vcf.init_params(cfg, jax.random.key(0))
    vtg_l = make_vtg_layout(tokenizer, "MSRVTT", cfg.video_tokens_vtg, max_caption_tokens=32)
    tvg_l = make_tvg_layout(tokenizer, cfg.num_clips, max_caption_tokens=32)
    return cfg, params, vtg_l, tvg_l


def _build(setup):
    cfg, params, vtg_l, tvg_l = setup
    mesh = make_mesh(devices=jax.devices()[:1])
    return RerankEngine(params, cfg, vtg_l, tvg_l, mesh, batch_size=2)


def _exercise(engine, setup, tokenizer):
    cfg = setup[0]
    n = 4
    rng = np.random.default_rng(0)
    inputs = EvalInputs(
        captions=["a cat sits", "a man runs far", "kids play ball", "a chef cooks"],
        item_video_idx=np.arange(n),
        features=rng.standard_normal(
            (n, cfg.num_clips, cfg.tokens_per_clip, cfg.mm_hidden_size)
        ).astype(np.float32) * 0.5,
        t2v_iv2=rng.standard_normal((n, n)).astype(np.float32) + 0.1,
        v2t_iv2=rng.standard_normal((n, n)).astype(np.float32) + 0.1,
    )
    return evaluation(engine, inputs, tokenizer, "MSRVTT", topk=2,
                      cpn=True, has_tvg=True, verbose=False)


def test_del_engine_frees_without_gc(setup, tokenizer):
    """Refcounting alone must collect a used engine: no reference cycles."""
    engine = _build(setup)
    _exercise(engine, setup, tokenizer)
    ref = weakref.ref(engine)
    gc.collect()          # clear unrelated garbage first
    gc.disable()
    try:
        del engine
        assert ref() is None, (
            "engine survived `del` — a jitted partial (or other attribute) "
            "holds a reference cycle back to the engine"
        )
    finally:
        gc.enable()


def test_engine_buffers_freed_without_gc(setup, tokenizer):
    """The engine-created device arrays die with the engine (no gc pass)."""
    engine = _build(setup)
    _exercise(engine, setup, tokenizer)
    # an engine-owned device buffer: the text-prior KV it computed
    kv, mask = engine.compute_prior_kv(engine.vtg_layout)
    engine._held = (kv, mask)  # owned solely by the engine
    leaf = jax.tree_util.tree_leaves(kv)[0]
    ref = weakref.ref(leaf)
    del kv, mask, leaf
    gc.collect()
    gc.disable()
    try:
        del engine
        assert ref() is None
    finally:
        gc.enable()


def test_back_to_back_engines_without_gc(setup, tokenizer):
    """Two engines in sequence (the bench `measure()` pattern): building the
    second must not require a gc pass to reclaim the first."""
    gc.collect()
    gc.disable()
    try:
        first = _build(setup)
        _exercise(first, setup, tokenizer)
        ref = weakref.ref(first)
        first.close()
        del first
        assert ref() is None
        second = _build(setup)
        t2v, v2t = _exercise(second, setup, tokenizer)
        assert np.isfinite(t2v["query_likelihood"]).any()
    finally:
        gc.enable()


def test_close_is_idempotent_and_drops_state(setup):
    engine = _build(setup)
    assert hasattr(engine, "params")
    engine.close()
    assert not hasattr(engine, "params")
    assert not hasattr(engine, "_vtg_step")
    assert engine._closed
    engine.close()  # idempotent
