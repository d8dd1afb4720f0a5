"""A/B the v4 stage-1 evaluation modes on the real chip (round-4 perf
track: the verdict's "change the WORK" exit for the stage-1 VPU floor).

Modes: f32 (shipped), mxu_sum (MXU-side normaliser sums from the
PV-dtype weights), bf16 (multiply+exp2 at bf16 — labeled variant).

Fetch-forced chained protocol (BENCH_NOTES round 3): CHAIN calls per
jit, iterations chained through a data dependence, one host fetch.

Usage: python scripts/profile_stage1.py [mode ...]
"""

import json
import os
import sys
import time

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


def main():
    modes = sys.argv[1:] or ["f32", "mxu_sum", "bf16", "v7"]
    rs = np.random.RandomState(0)
    bf = jnp.bfloat16
    x = jnp.asarray(rs.randn(B, S, C) * 0.02, bf)
    kf = jnp.asarray(rs.randn(B, F, N, C) * 0.02, bf)
    vf = jnp.asarray(rs.randn(B, F, N, C) * 0.02, bf)
    w_cc = jnp.asarray(rs.randn(C, C) * 0.02, bf)
    b_c = jnp.asarray(rs.randn(C) * 0.01, bf)

    results = {}
    for mode in modes:
        def chain(q, kf, vf, mode=mode):
            for _ in range(CHAIN):
                if mode == "v7":
                    q = tb._fused_fwd_pallas_v7(
                        q, kf, vf, w_cc, b_c, w_cc, b_c, scale, h,
                        block_q=BQ,
                    )
                elif mode == "dense":
                    q = tb._fused_fwd_pallas_v4(
                        q, kf, vf, w_cc, b_c, w_cc, b_c, scale, h,
                        block_q=BQ, dense_kv=True,
                    )
                else:
                    q = tb._fused_fwd_pallas_v4(
                        q, kf, vf, w_cc, b_c, w_cc, b_c, scale, h,
                        block_q=BQ, stage1=mode,
                    )
            return q, q.mean()

        fj = jax.jit(chain)
        out = fj(x, kf, vf)
        float(np.asarray(out[1]))
        iters = 4
        t0 = time.perf_counter()
        cur = (x, kf, vf)
        for _ in range(iters):
            out = fj(*cur)
            cur = (out[0], kf, vf)
        float(np.asarray(out[1]))
        dt = (time.perf_counter() - t0) / iters / CHAIN * 1000
        results[mode] = round(dt, 3)
        print(f"stage1={mode}: {dt:.3f} ms/call", flush=True)

    print(json.dumps({"ms_per_call": results}), flush=True)


if __name__ == "__main__":
    main()
