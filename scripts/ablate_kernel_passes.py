"""Kernel pass ablations for the speed-of-light memo (fetch-forced
chained protocol, flagship shapes, bq=256).

Forward: full vs skip_stage2 (stage-1 + diag only).
Backward: full vs skip_c (A+B) vs skip_b (A only — the kernel returns
before BOTH B and C, so the two skip_b variants are identical; measured
2.61/2.65 ms confirms).  Marginals: A 2.65, B 3.48, C 3.62 ms.
"""

import os
import sys
import time
import functools

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

from focus_tpu.ops.pallas import trajectory_block as tb

B, h, S, F, C = 8, 12, 1568, 8, 768
scale = (C // h) ** -0.5
N = S // F
CHAIN = 24
BQ = 256


def timed(label, f, *args):
    fj = jax.jit(f)
    out = fj(*args)
    float(np.asarray(out[1]))
    iters = 4
    t0 = time.perf_counter()
    cur = args
    for _ in range(iters):
        out = fj(*cur)
        cur = (out[0], *args[1:])
    float(np.asarray(out[1]))
    dt = (time.perf_counter() - t0) / iters / CHAIN * 1000
    print(f"{label}: {dt:.3f} ms/call", flush=True)


def main():
    rs = np.random.RandomState(0)
    bf = jnp.bfloat16
    x = jnp.asarray(rs.randn(B, S, C) * 0.02, bf)
    kf = jnp.asarray(rs.randn(B, F, N, C) * 0.02, bf)
    vf = jnp.asarray(rs.randn(B, F, N, C) * 0.02, bf)
    w_cc = jnp.asarray(rs.randn(C, C) * 0.02, bf)
    b_c = jnp.asarray(rs.randn(C) * 0.01, bf)

    for label, kw in [
        ("fwd full", {}),
        ("fwd stage1+diag only", {"skip_stage2": True}),
    ]:
        def chain(q, kf, vf, kw=kw):
            for _ in range(CHAIN):
                q = tb._fused_fwd_pallas_v4(
                    q, kf, vf, w_cc, b_c, w_cc, b_c, scale, h,
                    block_q=BQ, **kw,
                )
            return q, q.mean()

        timed(label, chain, x, kf, vf)

    dout = jnp.asarray(rs.randn(B, S, C) * 0.02, bf)
    for label, kw in [
        ("bwd full (A+B+C)", {}),
        ("bwd A only (skip_b)", {"skip_b": True}),
        ("bwd skip_c (A+B)", {"skip_c": True}),
        ("bwd A only (both skips)", {"skip_b": True, "skip_c": True}),
    ]:
        def chain_b(dq, kf, vf, kw=kw):
            for _ in range(CHAIN // 4):
                grads = tb._fused_bwd_pallas(
                    dq, kf, vf, w_cc, b_c, w_cc, dout, scale, h,
                    block_q=BQ, **kw,
                )
                dq = grads[0].astype(bf) * 0.1 + dq * 0.9
            return dq, dq.mean()

        fj = jax.jit(chain_b)
        out = fj(x, kf, vf)
        float(np.asarray(out[1]))
        iters = 4
        t0 = time.perf_counter()
        cur = (x, kf, vf)
        for _ in range(iters):
            out = fj(*cur)
            cur = (out[0], kf, vf)
        float(np.asarray(out[1]))
        dt = (time.perf_counter() - t0) / iters / (CHAIN // 4) * 1000
        print(f"{label}: {dt:.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()
