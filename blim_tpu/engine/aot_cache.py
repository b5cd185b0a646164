"""On-disk AOT trace cache for the packed rerank steps (jax.export).

Why this exists: the warmup wall is TRACE+LOWERING-bound. With the compiled
binaries already in the persistent compilation cache, warming the packed
executable set still costs ~1.05 s PER (size, qn, g) COMBO on the 1-core
host — tracing + lowering the 7B step graph in Python, GIL-serial, so
threads don't help (PERF_NOTES_R5 §2). The reference has no analogue: torch
eager never pays a per-shape trace. This module serializes the traced+
lowered StableHLO per combo with `jax.export` so every LATER process skips
the Python trace entirely: deserialize (~2 ms) + a tiny wrapper trace
(~20 ms) + a compilation-cache load (wire-bound, thread-pipelinable)
replace the ~1.05 s trace — measured ~20x on the trace component.

Design constraints honored:

- The hot path stays identical in compiled code: BOTH the build path and
  the load path execute `jax.jit(exported.call)`, so the XLA module (and
  its compilation-cache key) is the same bytes either way, and the
  equivalence suites (shared == naive) cover the AOT path directly.
- Per-call overhead is one treedef flatten + shape-tuple key (~25 us,
  measured) against packed steps of ~100 ms device time.
- Blobs are keyed by a hash of EVERY .py source in blim_tpu plus the jax
  version, platform, device kind, mesh layout, bound statics, and arg
  avals — any source change invalidates the whole cache (conservative but
  safe: a stale blob can never silently serve old model code).
- Any failure in export/serialize/deserialize falls back to the plain
  shared-jit path for that combo (sentinel-cached, warned once).

Env knobs: BLIM_AOT_CACHE=0 disables; BLIM_AOT_CACHE_DIR moves the
directory (default /tmp/blim_aot).
"""

from __future__ import annotations

import functools
import hashlib
import os
import threading
import warnings
from typing import Any, Dict, Tuple

import jax
import jax.tree_util as jtu

__all__ = ["AOTStep", "aot_enabled", "aot_cache_dir", "stats"]

_NATIVE = object()  # sentinel: export failed for this key; use the plain jit

# process-wide counters: how many combos were traced+exported fresh, loaded
# from a disk blob (the fast path), or fell back to the plain jit. The bench
# reports these next to warmup_s so the cold/warm split is visible.
_STATS = {"exported": 0, "loaded": 0, "native": 0}


def stats() -> dict:
    return dict(_STATS)


def aot_enabled() -> bool:
    return os.environ.get("BLIM_AOT_CACHE", "1") not in ("0", "false", "off")


def aot_cache_dir() -> str:
    return os.environ.get("BLIM_AOT_CACHE_DIR", "/tmp/blim_aot")


@functools.lru_cache(maxsize=1)
def _source_fingerprint() -> str:
    """Hash of every .py file in the blim_tpu package. Any source change
    invalidates every blob — a stale export must never serve old code."""
    import blim_tpu

    root = os.path.dirname(os.path.abspath(blim_tpu.__file__))
    h = hashlib.sha256()
    for dirpath, dirnames, filenames in sorted(os.walk(root)):
        dirnames.sort()
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                p = os.path.join(dirpath, fn)
                h.update(p[len(root):].encode())
                with open(p, "rb") as f:
                    h.update(f.read())
    h.update(jax.__version__.encode())
    return h.hexdigest()[:16]


def _leaf_sig(leaf: Any) -> tuple:
    shape = getattr(leaf, "shape", None)
    if shape is not None:
        return (tuple(shape), str(getattr(leaf, "dtype", "?")))
    return ("py", type(leaf).__name__)


def _mesh_sig(leaves) -> str:
    """Mesh layout fingerprint from the first sharded arg (axis names and
    sizes matter for the exported HloShardings; device ids don't)."""
    for leaf in leaves:
        sh = getattr(leaf, "sharding", None)
        mesh = getattr(sh, "mesh", None)
        if mesh is not None:
            return repr(mesh.shape) + repr(tuple(mesh.axis_names))
    return "unsharded"


class AOTStep:
    """Shape-dispatching wrapper over a shared jitted step impl.

    Callable exactly like the jit it wraps (positional traced args, traced
    kwargs, static kwargs). Maintains one executable per (avals, statics)
    combo, built from a disk jax.export blob when one exists.
    """

    def __init__(self, jit_fn, impl_name: str, static_kv: dict,
                 static_argnames: Tuple[str, ...]):
        self._jit = jit_fn
        self._impl_name = impl_name
        self._static_repr = repr(sorted(static_kv.items(), key=lambda kv: kv[0]))
        self._static_argnames = frozenset(static_argnames)
        self._execs: Dict[tuple, Any] = {}
        self._key_locks: Dict[tuple, threading.Lock] = {}
        self._locks_guard = threading.Lock()
        self._warned = False

    # --- introspection used by tests/benches (mirrors jax.jit's surface) ---
    def _cache_size(self) -> int:
        return len(self._execs) + self._jit._cache_size()

    def clear_cache(self) -> None:
        self._execs.clear()
        self._jit.clear_cache()

    def __call__(self, *args, **kwargs):
        if not aot_enabled():
            return self._jit(*args, **kwargs)
        traced_kw = {k: v for k, v in kwargs.items()
                     if k not in self._static_argnames}
        statics = tuple(sorted(
            (k, v) for k, v in kwargs.items() if k in self._static_argnames))
        leaves, treedef = jtu.tree_flatten((args, traced_kw))
        # the mesh is part of the key: an export records its device-assignment
        # layout, and calling it with args committed to a different mesh
        # raises (engines in one process may use different meshes)
        key = (tuple(_leaf_sig(l) for l in leaves), treedef, statics,
               _mesh_sig(leaves))
        fn = self._execs.get(key)
        if fn is None:
            fn = self._build(key, leaves, args, kwargs, statics)
        if fn is _NATIVE:
            return self._jit(*args, **kwargs)
        return fn(*args, **traced_kw)

    # --- build/load ---
    def _blob_path(self, key, leaves) -> str:
        h = hashlib.sha256()
        for part in (
            self._impl_name, self._static_repr, repr(key[0]), str(key[1]),
            repr(key[2]), _mesh_sig(leaves), jax.default_backend(),
            jax.devices()[0].device_kind, _source_fingerprint(),
        ):
            h.update(part.encode())
            h.update(b"\x00")
        return os.path.join(
            aot_cache_dir(), f"{self._impl_name}-{h.hexdigest()[:24]}.bin")

    def _build(self, key, leaves, args, kwargs, statics):
        with self._locks_guard:
            lock = self._key_locks.setdefault(key, threading.Lock())
        with lock:
            fn = self._execs.get(key)
            if fn is not None:
                return fn
            try:
                from jax import export as jexport

                path = self._blob_path(key, leaves)
                if os.path.exists(path):
                    with open(path, "rb") as f:
                        exp = jexport.deserialize(bytearray(f.read()))
                    _STATS["loaded"] += 1
                else:
                    # one real trace (the same cost the plain jit would pay),
                    # then the blob makes every later process skip it
                    exp = jexport.export(
                        self._jit,
                        disabled_checks=[jexport.DisabledSafetyCheck.custom_call(
                            "tpu_custom_call")],
                    )(*args, **kwargs)
                    blob = exp.serialize()
                    os.makedirs(aot_cache_dir(), exist_ok=True)
                    tmp = f"{path}.tmp.{os.getpid()}.{threading.get_ident()}"
                    with open(tmp, "wb") as f:
                        f.write(blob)
                    os.replace(tmp, path)  # atomic: concurrent processes race safely
                    _STATS["exported"] += 1
                fn = jax.jit(exp.call)
            except Exception as e:  # pragma: no cover - environment-dependent
                if not self._warned:
                    self._warned = True
                    warnings.warn(
                        f"AOT export cache disabled for {self._impl_name}: {e!r}")
                _STATS["native"] += 1
                fn = _NATIVE
            self._execs[key] = fn
            return fn
