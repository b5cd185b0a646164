#!/usr/bin/env python
"""On-device A/B: Pallas flash attention vs XLA attention, fwd and fwd+bwd.

Shapes mirror the production paths:
  * rerank prefix forward: (B=2, S=341, Hq=28, Hkv=4, D=128) — fwd only
  * 7B train forward/backward: (B=4, S=440) — VTG at caption budget 96
  * ViT dense non-causal: (B=8, S=3136, H=16, D=64) — sanity (known 2x win)

Timing honors CLAUDE.md: np.asarray() to synchronize, varied inputs to dodge
the tunnel result cache, best-of-N.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench(fn, args_list, warmup=2, iters=6):
    for i in range(warmup):
        np.asarray(fn(*args_list[i % len(args_list)])[0, 0, 0, :1])
    best = float("inf")
    for i in range(iters):
        a = args_list[i % len(args_list)]
        t0 = time.perf_counter()
        out = fn(*a)
        np.asarray(out[0, 0, 0, :1])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--loop", type=int, default=16,
                    help="dependent op calls chained inside one jit")
    ap.add_argument("--cases", default="prefix,train,vit")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from blim_tpu.kernels.attention import _xla_attention
    from blim_tpu.kernels.flash_attention import flash_attention

    print(f"devices: {jax.devices()}")

    def run_case(name, b, s, hq, hkv, d, causal, masked, with_bwd, dtype=jnp.bfloat16):
        rng = np.random.default_rng(0)
        variants = []
        for i in range(3):
            q = jnp.asarray(rng.standard_normal((b, s, hq, d)), dtype) * 0.3
            k = jnp.asarray(rng.standard_normal((b, s, hkv, d)), dtype) * 0.3
            v = jnp.asarray(rng.standard_normal((b, s, hkv, d)), dtype) * 0.3
            if masked:
                km = jnp.asarray((rng.random((b, s)) > 0.1).astype(np.int32))
                qm = km
            else:
                km = qm = None
            variants.append((q, k, v, km, qm))

        scale = d ** -0.5

        def xla_f(q, k, v, km, qm):
            return _xla_attention(q, k, v, km, qm, causal, scale)

        def pallas_f(q, k, v, km, qm):
            return flash_attention(q, k, v, key_mask=km, query_mask=qm,
                                   causal=causal, scale=scale)

        if with_bwd:
            def wrap(f):
                def g(q, k, v, km, qm):
                    def loss(q, k, v):
                        return jnp.sum(f(q, k, v, km, qm).astype(jnp.float32) ** 2)
                    return jax.grad(loss, argnums=0)(q, k, v)
                return g
            xla_run, pallas_run = wrap(xla_f), wrap(pallas_f)
        else:
            xla_run, pallas_run = xla_f, pallas_f

        # single calls through the tunnel sit at a ~27ms dispatch floor;
        # chain LOOP dependent calls inside one jit so per-op time resolves
        LOOP = args.loop

        def chained(run):
            def many(q, k, v, km, qm):
                def body(qc, _):
                    out = run(qc, k, v, km, qm)
                    return qc + 0.001 * out.astype(qc.dtype), ()
                qc, _ = jax.lax.scan(body, q, None, length=LOOP)
                return qc
            return jax.jit(many)

        xla_j = chained(xla_run)
        pallas_j = chained(pallas_run)
        t_x = bench(xla_j, variants, iters=args.iters) / LOOP
        t_p = bench(pallas_j, variants, iters=args.iters) / LOOP
        tag = "fwd+bwd" if with_bwd else "fwd"
        print(f"{name:28s} {tag:7s} XLA {t_x*1e3:8.3f} ms   Pallas {t_p*1e3:8.3f} ms  "
              f"({t_x/t_p:.2f}x {'win' if t_p < t_x else 'LOSS'})", flush=True)

    cases = args.cases.split(",")
    if "prefix" in cases:
        run_case("rerank prefix (2,341,28/4)", 2, 341, 28, 4, 128, True, True, False)
        run_case("rerank prefix G=4", 4, 341, 28, 4, 128, True, True, False)
    if "train" in cases:
        run_case("train VTG (4,440,28/4)", 4, 440, 28, 4, 128, True, True, False)
        run_case("train VTG (4,440,28/4)", 4, 440, 28, 4, 128, True, True, True)
    if "vit" in cases:
        run_case("ViT dense (8,3136,16,64)", 8, 3136, 16, 16, 64, False, False, False)


if __name__ == "__main__":
    main()
