#!/usr/bin/env python
"""On-device A/B: fused-K prefix-attention kernel vs the XLA formulation,
at the exact rerank suffix-scoring shapes (per decoder layer):

  G groups x K=2*topk suffixes x W in {16, 24, 99} tokens,
  prefix P=341 (MSRVTT budget-96 layout), Hq=28/Hkv=4, hd=128, bf16.

Timing per CLAUDE.md: np.asarray to sync, varied inputs, best-of-N.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--loop", type=int, default=24,
                    help="dependent op calls chained inside one jit")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from blim_tpu.kernels.prefix_attention import _xla_reference, prefix_attention

    print(f"devices: {jax.devices()}")
    rng = np.random.default_rng(0)

    def bench(fn, variants):
        for i in range(2):
            np.asarray(fn(*variants[i % len(variants)])[0, 0, 0, 0, :1])
        best = float("inf")
        for i in range(args.iters):
            a = variants[i % len(variants)]
            t0 = time.perf_counter()
            out = fn(*a)
            np.asarray(out[0, 0, 0, 0, :1])
            best = min(best, time.perf_counter() - t0)
        return best

    def case(G, K, W, P, Hq=28, Hkv=4, hd=128):
        variants = []
        for i in range(3):
            q = jnp.asarray(rng.standard_normal((G, K, W, Hq, hd)), jnp.bfloat16) * 0.3
            ks = jnp.asarray(rng.standard_normal((G, K, W, Hkv, hd)), jnp.bfloat16) * 0.3
            vs = jnp.asarray(rng.standard_normal((G, K, W, Hkv, hd)), jnp.bfloat16) * 0.3
            kp = jnp.asarray(rng.standard_normal((G, P, Hkv, hd)), jnp.bfloat16) * 0.3
            vp = jnp.asarray(rng.standard_normal((G, P, Hkv, hd)), jnp.bfloat16) * 0.3
            sm = np.ones((G, K, W), np.int32)
            sm[:, :, W - 2:] = 0
            pm = np.ones((G, P), np.int32)
            variants.append((q, ks, vs, kp, vp, jnp.asarray(sm), jnp.asarray(pm)))
        scale = hd ** -0.5

        # single calls through the tunnel are ~30ms dispatch-dominated; chain
        # LOOP dependent calls inside one jit so the per-op time resolves
        LOOP = args.loop

        def chained(attn):
            def run(q, ks, vs, kp, vp, sm, pm):
                def body(qc, _):
                    out = attn(qc, ks, vs, kp, vp, sm, pm)
                    return qc + 0.001 * out, ()
                qc, _ = jax.lax.scan(body, q, None, length=LOOP)
                return qc
            return jax.jit(run)

        xla_j = chained(lambda *a: _xla_reference(*a, scale))
        pal_j = chained(lambda *a: prefix_attention(*a, scale, use_pallas=True))
        t_x = bench(xla_j, variants) / LOOP
        t_p = bench(pal_j, variants) / LOOP
        print(f"G={G} K={K} W={W:3d} P={P}:  XLA {t_x*1e3:7.3f} ms   "
              f"Pallas {t_p*1e3:7.3f} ms   ({t_x/t_p:.2f}x {'win' if t_p < t_x else 'LOSS'})",
              flush=True)

    for W in (16, 24, 99):
        case(2, 32, W, 341)
    case(4, 32, 16, 341)
    case(8, 32, 16, 341)


if __name__ == "__main__":
    main()
