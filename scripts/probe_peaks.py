"""Empirical machine peaks on the attached TPU (fetch-forced chained
protocol): bf16 matmul TFLOP/s, f32 VPU exp2/elementwise throughput,
HBM stream bandwidth.  These ground the speed-of-light memo
(BENCH_NOTES round 3) in measured ceilings instead of datasheet
numbers.
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

CHAIN = 16


def timed(label, make_chain, *args, unit_work=1.0, unit="GFLOP"):
    f = jax.jit(make_chain)
    out = f(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[-1]))
    iters = 4
    t0 = time.perf_counter()
    cur = args
    for _ in range(iters):
        out = f(*cur)
        cur = (out[0], *args[1:])
    float(np.asarray(jax.tree_util.tree_leaves(out)[-1]))
    dt = (time.perf_counter() - t0) / iters / CHAIN
    rate = unit_work / dt
    print(f"{label}: {dt * 1000:.3f} ms/unit -> {rate / 1e12:.2f} T{unit}/s",
          flush=True)


def main():
    rs = np.random.RandomState(0)

    # MXU peak: big square bf16 matmul, f32 accumulate
    N = 4096
    a = jnp.asarray(rs.randn(N, N) * 0.02, jnp.bfloat16)
    b = jnp.asarray(rs.randn(N, N) * 0.02, jnp.bfloat16)

    def mm_chain(a, b):
        x = a
        for _ in range(CHAIN):
            # preferred bf16: MXU converts on output — no separate
            # epilogue pass (the earlier f32-accum + astype + rescale
            # chain measured 116 TFLOP/s where the in-model fc1 fusion
            # runs at 174 — the epilogue was the gap)
            x = jax.lax.dot_general(
                x, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16,
            )
        return x, x.mean()

    timed("bf16 matmul 4096^3 (no epilogue)", mm_chain, a, b,
          unit_work=2.0 * N * N * N, unit="FLOP")

    # model-shaped matmul (the MLP fc1 shape)
    M, K, Nn = 12552, 768, 3072
    am = jnp.asarray(rs.randn(M, K) * 0.02, jnp.bfloat16)
    bm = jnp.asarray(rs.randn(K, Nn) * 0.02, jnp.bfloat16)
    bm2 = jnp.asarray(rs.randn(Nn, K) * 0.02, jnp.bfloat16)

    def mm2_chain(am, bm, bm2):
        x = am
        for _ in range(CHAIN):
            h = jax.lax.dot_general(
                x, bm, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16,
            )
            x = jax.lax.dot_general(
                h, bm2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16,
            )
        return x, x.mean()

    timed("bf16 matmul mlp-shape pair", mm2_chain, am, bm, bm2,
          unit_work=2.0 * M * K * Nn * 2, unit="FLOP")

    # VPU exp2 throughput, f32 (the stage-1 softmax primitive).
    # NB: use a big array — at [8,2048,768] the per-op overhead dominated
    # (fma "cost" 5x its HBM floor); [16,4096,768] amortises it.
    S = (16, 4096, 768)
    xv = jnp.asarray(rs.randn(*S), jnp.float32)

    def exp_chain(xv):
        x = xv
        for _ in range(CHAIN):
            x = jnp.exp2(jnp.minimum(x, 8.0)) * 1e-3
        return x, x.mean()

    n = float(np.prod(S))
    timed("f32 exp2 (VPU)", exp_chain, xv, unit_work=n, unit="exp2")

    # VPU fused mul-add throughput f32
    def fma_chain(xv):
        x = xv
        for _ in range(CHAIN):
            x = x * 1.0001 + 0.0001
        return x, x.mean()

    timed("f32 fma (VPU)", fma_chain, xv, unit_work=n, unit="FMA")

    # f32 tanh (hardware transcendental)
    def tanh_chain(xv):
        x = xv
        for _ in range(CHAIN):
            x = jnp.tanh(x) + 0.001
        return x, x.mean()

    timed("f32 tanh (VPU)", tanh_chain, xv, unit_work=n, unit="tanh")

    # f32 erf (XLA software path) for comparison
    def erf_chain(xv):
        x = xv
        for _ in range(CHAIN):
            x = jax.lax.erf(x) + 0.001
        return x, x.mean()

    timed("f32 erf (VPU, software)", erf_chain, xv, unit_work=n, unit="erf")

    # HBM stream: bf16 triad x = x*s + y  (2 reads + 1 write per elem)
    Sh = (64, 2048, 768)
    xh = jnp.asarray(rs.randn(*Sh) * 0.1, jnp.bfloat16)
    yh = jnp.asarray(rs.randn(*Sh) * 0.1, jnp.bfloat16)

    def triad_chain(xh, yh):
        x = xh
        for _ in range(CHAIN):
            x = x * 0.999 + yh
        return x, x.mean()

    nbytes = float(np.prod(Sh)) * 2 * 3
    timed("bf16 triad (HBM)", triad_chain, xh, yh,
          unit_work=nbytes, unit="B")


if __name__ == "__main__":
    main()
