"""A/B kernel v4 vs v5 on the real chip.

Chained-48 whole-jit protocol with a FETCH-forced finish: the axon
relay's block_until_ready does not actually wait (round-3 diagnostics),
so the jit returns a scalar reduction and the timing loop chains runs
through a data dependence, fetching once per repetition."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from focus_tpu.ops.pallas import trajectory_block as tb

B, h, S, F, C = 8, 12, 1568, 8, 768
scale = (C // h) ** -0.5
N = S // F
CHAIN = 48


def main():
    bqs = [int(a) for a in sys.argv[1:]] or [256]
    rs = np.random.RandomState(0)
    bf = jnp.bfloat16
    x = jnp.asarray(rs.randn(B, S, C) * 0.02, bf)
    kf = jnp.asarray(rs.randn(B, F, N, C) * 0.02, bf)
    vf = jnp.asarray(rs.randn(B, F, N, C) * 0.02, bf)
    w_cc = jnp.asarray(rs.randn(C, C) * 0.02, bf)
    b_c = jnp.zeros((C,), bf)

    import functools as ft

    impls = {
        "v4": tb._fused_fwd_pallas_v4,
        "v4ps": ft.partial(tb._fused_fwd_pallas_v4, prescale_q=True),
        "v5": tb._fused_fwd_pallas_v5,
        "v6": tb._fused_fwd_pallas_v6,
    }
    for bq in bqs:
        for name, impl in impls.items():
            def chain(q, kf, vf, impl=impl, bq=bq):
                for _ in range(CHAIN):
                    q = impl(q, kf, vf, w_cc, b_c, w_cc, b_c, scale, h,
                             block_q=bq)
                return q, q.mean()

            f = jax.jit(chain)
            q, m = f(x, kf, vf)
            float(np.asarray(m))  # fetch-forced warmup
            iters = 6
            t0 = time.perf_counter()
            for _ in range(iters):
                q, m = f(q, kf, vf)  # chained: q feeds the next call
            mh = float(np.asarray(m))
            dt = (time.perf_counter() - t0) / iters / CHAIN * 1000
            print(f"bq={bq} {name}: {dt:.3f} ms/call (mean {mh:.5f})",
                  flush=True)


if __name__ == "__main__":
    main()
