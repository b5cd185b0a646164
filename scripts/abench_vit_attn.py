#!/usr/bin/env python
"""ViT attention kernel A/B: whole-KV single block vs static-unrolled chunks.

The featurizer decomposition (scripts/abench_featurizer.py --decompose) showed
the dense non-causal flash attention at the ViT shape (S=3136, d=64) runs at
MFU 0.26-0.29 — matching a roofline where the per-program QK^T (MXU, half
filled at d=64) -> softmax (VPU fp32 exp) -> PV (MXU) chain is fully serial.
This sweeps the in-kernel KV chunk size with the loop Python-unrolled so the
Mosaic scheduler may overlap one chunk's exp with the next chunk's dot.

Timing per CLAUDE.md: fresh inputs per trial (tunnel result cache), pipelined
dispatch, np.asarray drains.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4, help="B*clips sequences")
    ap.add_argument("--seq", type=int, default=3136)
    ap.add_argument("--heads", type=int, default=16)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--layers", type=int, default=23,
                    help="chain this many attention calls per timed step")
    ap.add_argument("--trials", type=int, default=4)
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    import jax

    if args.tiny:
        jax.config.update("jax_platforms", "cpu")
        args.batch, args.seq, args.layers = 2, 256, 3
    import jax.numpy as jnp

    if not args.tiny:
        cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)

    from blim_tpu.kernels.attention import _xla_attention
    from blim_tpu.kernels.flash_attention import flash_attention
    from blim_tpu.utils.flops import peak_flops_per_chip

    B, S, H, D = args.batch, args.seq, args.heads, args.dim
    dtype = jnp.float32 if args.tiny else jnp.bfloat16
    peak = peak_flops_per_chip(jax.devices()[0]) or float("nan")
    scale = D ** -0.5

    def chain(attn_fn):
        # chained calls with a cheap mixing matmul so XLA can't fuse/skip;
        # mirrors the tower's 23 attention sites
        def f(q, k, v, w):
            out = q
            for _ in range(args.layers):
                out = attn_fn(out, k, v)
                out = jnp.einsum("bshd,de->bshe", out, w)
            return out.mean()

        return jax.jit(f)

    variants = {
        "xla": chain(lambda q, k, v: _xla_attention(
            q, k, v, None, None, False, scale)),
        "whole-kv": chain(lambda q, k, v: flash_attention(
            q, k, v, causal=False, scale=scale, blk_q=448, blk_k=S, unroll=False, interpret=args.tiny)),
    }
    for blk in (1568, 784, 448, 224):
        if S % blk == 0 or args.tiny:
            b = blk if S % blk == 0 else S
            variants[f"unroll-{blk}"] = chain(lambda q, k, v, _b=b: flash_attention(
                q, k, v, causal=False, scale=scale, blk_q=448 if S % 448 == 0 else 128,
                blk_k=_b, unroll=True, interpret=args.tiny))
    variants["default"] = chain(lambda q, k, v: flash_attention(
        q, k, v, causal=False, scale=scale, interpret=args.tiny))

    rng = np.random.default_rng(7)
    # attention flops per step: layers * (QK^T + PV) = layers * 4*S^2*D per head
    fl = args.layers * B * H * 4.0 * S * S * D

    inputs = []
    for _ in range(max(args.trials, 2)):
        q = jnp.asarray(rng.standard_normal((B, S, H, D)) * 0.3, dtype)
        k = jnp.asarray(rng.standard_normal((B, S, H, D)) * 0.3, dtype)
        v = jnp.asarray(rng.standard_normal((B, S, H, D)) * 0.3, dtype)
        w = jnp.asarray(np.eye(D) + rng.standard_normal((D, D)) * 0.01, dtype)
        inputs.append((q, k, v, w))

    # correctness cross-check at the bench shape (vs XLA reference)
    ref = np.asarray(variants["xla"](*inputs[0]), np.float64)
    for name, fn in variants.items():
        got = np.asarray(fn(*inputs[0]), np.float64)
        assert abs(got - ref) < 5e-3 + 5e-3 * abs(ref), (name, got, ref)

    for name, fn in variants.items():
        np.asarray(fn(*inputs[0]))  # compile + warm
        t0 = time.perf_counter()
        outs = [fn(*inputs[t]) for t in range(args.trials)]
        np.asarray(outs[-1])
        dt = (time.perf_counter() - t0) / args.trials
        print(f"{name:12s} {dt*1e3:8.2f} ms  attn-mfu {fl/dt/peak:.3f}", flush=True)


if __name__ == "__main__":
    main()
