"""engine/aot_cache.py — the on-disk jax.export trace cache for packed steps.

Pins the properties the warmup-wall fix depends on (PERF_NOTES_R5 §8):

1. build path and load path produce bit-identical results (both execute
   jax.jit(exported.call) over the same StableHLO bytes);
2. a second wrapper (fresh process stand-in) LOADS the blob instead of
   re-tracing — the underlying jit is never traced on the load path;
3. combos are keyed by avals + statics + treedef + mesh: a different
   shape, static value, or None-vs-array arg builds a separate entry;
4. BLIM_AOT_CACHE=0 bypasses the cache entirely (plain jit dispatch);
5. export failures fall back to the plain jit (sentinel-cached), never
   propagate.

Reference: no analogue — torch eager pays no per-shape trace; through the
remote-compile tunnel each combo costs ~1.05s of GIL-serial trace+lowering
(PERF_NOTES_R5 §2), which these blobs amortize across processes.
"""

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blim_tpu.engine import aot_cache
from blim_tpu.engine.aot_cache import AOTStep


def _impl(params, ids, labels, *, n_segments, scale):
    x = params["w"][ids] * scale
    y = x.sum(-1) if labels is None else x.sum(-1) + labels
    return y[:, :n_segments]


def _wrapper(tmpdir, monkeypatch, name="_impl_test"):
    monkeypatch.setenv("BLIM_AOT_CACHE_DIR", str(tmpdir))
    jit_fn = jax.jit(functools.partial(_impl, scale=0.5),
                     static_argnames=("n_segments",))
    return AOTStep(jit_fn, name, {"scale": 0.5}, ("n_segments",))


@pytest.fixture()
def args():
    rng = np.random.default_rng(3)
    params = {"w": jnp.asarray(rng.standard_normal((50, 16), np.float32))}
    ids = jnp.asarray(rng.integers(0, 50, (4, 8)), dtype=jnp.int32)
    return params, ids


def test_roundtrip_bitexact_and_loads(tmp_path, monkeypatch, args):
    params, ids = args
    step = _wrapper(tmp_path, monkeypatch)
    out1 = np.asarray(step(params, ids, None, n_segments=4))
    assert step._cache_size() == 1
    blobs = [f for f in os.listdir(tmp_path) if f.endswith(".bin")]
    assert len(blobs) == 1

    # fresh wrapper = fresh process stand-in: must LOAD, not re-trace
    before = aot_cache.stats()
    step2 = _wrapper(tmp_path, monkeypatch)
    out2 = np.asarray(step2(params, ids, None, n_segments=4))
    after = aot_cache.stats()
    assert after["loaded"] == before["loaded"] + 1
    assert after["exported"] == before["exported"]
    assert step2._jit._cache_size() == 0  # the plain jit never traced
    np.testing.assert_array_equal(out1, out2)

    # matches the plain-jit reference exactly
    ref = np.asarray(jax.jit(functools.partial(_impl, scale=0.5),
                             static_argnames=("n_segments",))(
                                 params, ids, None, n_segments=4))
    np.testing.assert_array_equal(out1, ref)


def test_key_separates_shapes_statics_and_treedefs(tmp_path, monkeypatch, args):
    params, ids = args
    step = _wrapper(tmp_path, monkeypatch, name="_impl_keys")
    step(params, ids, None, n_segments=4)
    step(params, ids, None, n_segments=2)                  # static differs
    step(params, ids[:2], None, n_segments=4)              # shape differs
    lab = jnp.zeros(ids.shape, jnp.float32)
    step(params, ids, lab, n_segments=4)                   # treedef differs
    assert step._cache_size() == 4
    assert len([f for f in os.listdir(tmp_path) if f.endswith(".bin")]) == 4
    # repeat calls hit the in-memory table — no growth
    step(params, ids, None, n_segments=4)
    assert step._cache_size() == 4


def test_traced_kwarg_shares_one_executable(tmp_path, monkeypatch, args):
    """cpn-style traced python-bool kwargs: both values run through ONE
    export (the r5 traced-cpn merge must survive the AOT path)."""
    params, ids = args

    def impl(params, ids, *, flag, scale):
        return jnp.where(flag, params["w"][ids].sum(-1), 0.0) * scale

    monkeypatch.setenv("BLIM_AOT_CACHE_DIR", str(tmp_path))
    step = AOTStep(jax.jit(functools.partial(impl, scale=2.0)),
                   "_impl_flag", {"scale": 2.0}, ())
    a = np.asarray(step(params, ids, flag=True))
    b = np.asarray(step(params, ids, flag=False))
    assert step._cache_size() == 1
    assert a.any() and not b.any()


def test_disabled_env_bypasses(tmp_path, monkeypatch, args):
    params, ids = args
    step = _wrapper(tmp_path, monkeypatch, name="_impl_off")
    monkeypatch.setenv("BLIM_AOT_CACHE", "0")
    out = np.asarray(step(params, ids, None, n_segments=4))
    assert np.isfinite(out).all()
    assert len(step._execs) == 0          # AOT table untouched
    assert step._jit._cache_size() == 1   # plain jit served the call
    assert not any(f.endswith(".bin") for f in os.listdir(tmp_path))


def test_export_failure_falls_back(tmp_path, monkeypatch, args):
    params, ids = args
    step = _wrapper(tmp_path, monkeypatch, name="_impl_fail")

    def boom(*a, **k):
        raise RuntimeError("export exploded")

    monkeypatch.setattr(jax.export, "export", boom)
    with pytest.warns(UserWarning, match="AOT export cache disabled"):
        out = np.asarray(step(params, ids, None, n_segments=4))
    assert np.isfinite(out).all()
    # sentinel-cached: the second call goes straight to the plain jit
    # without retrying the export (and without warning again)
    out2 = np.asarray(step(params, ids, None, n_segments=4))
    np.testing.assert_array_equal(out, out2)


def test_engine_packed_steps_are_aot_wrapped():
    """Wiring pin: the warm-dominating packed steps (and the prior-KV step)
    dispatch through AOTStep; the rectangle/naive baselines stay plain jit.
    A d%128-style silent unwiring (see the ViT kernel gate incident,
    CLAUDE.md) must fail a test, not a profile."""
    from blim_tpu.engine import rerank as rr

    assert rr._AOT_IMPLS == {
        "_vtg_packed_step_impl", "_vtg_prior_packed_step_impl",
        "_tvg_packed_step_impl", "_text_prefix_kv_impl"}
    for impl in rr._AOT_IMPLS:
        assert isinstance(
            rr.step_jit(impl, {"config": None, "lora_scale": 0.0,
                               "use_pallas": False}, ()),
            AOTStep), impl
    assert not isinstance(
        rr.step_jit("_vtg_step_impl",
                    {"config": None, "lora_scale": 0.0, "use_pallas": False,
                     "video_start": 0, "window_start": 0, "window_len": 1},
                    ("with_prior",)), AOTStep)


def test_clear_cache_resets(tmp_path, monkeypatch, args):
    params, ids = args
    step = _wrapper(tmp_path, monkeypatch, name="_impl_clear")
    step(params, ids, None, n_segments=4)
    assert step._cache_size() == 1
    step.clear_cache()
    assert step._cache_size() == 0
    # reloads from disk after clear
    before = aot_cache.stats()
    step(params, ids, None, n_segments=4)
    assert aot_cache.stats()["loaded"] == before["loaded"] + 1
