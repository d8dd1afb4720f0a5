"""A/B the fused-kernel feature flags on the real chip.

Usage: python scripts/profile_kernel_variants.py [bq ...]
Chains 48 kernel calls in one jit per variant (reliable under the relay).
"""

import itertools
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

    combos = [
        dict(nomax=True),
        dict(nomax=True, diag_frame=True),
        dict(nomax=True, fouter=True),
        dict(nomax=True, diag_frame=True, fouter=True),
    ]
    for bq in bqs:
        for flags in combos:
            def chain(q, kf, vf, flags=flags, bq=bq):
                for _ in range(CHAIN):
                    q = tb._fused_fwd_pallas(
                        q, kf, vf, w_cc, b_c, w_cc, b_c, scale, h,
                        block_q=bq, flags=flags,
                    )
                return q

            f = jax.jit(chain)
            out = jax.block_until_ready(f(x, kf, vf))
            iters = 8
            t0 = time.perf_counter()
            for _ in range(iters):
                out = jax.block_until_ready(f(x, kf, vf))
            dt = (time.perf_counter() - t0) / iters / CHAIN * 1000
            print(f"bq={bq} {flags}: {dt:.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()
