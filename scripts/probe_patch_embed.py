"""On-chip A/B: Pallas fused patch embed vs the XLA reshape+matmul path
at the flagship shape (chained, fetch-forced protocol)."""

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

from focus_tpu.ops.pallas.patch_embed import patch_embed_3d

B, T, H, W, C = 8, 16, 224, 224, 3
KT, KH, KW = 2, 16, 16
DIM = 768
CHAIN = 24


def xla_path(x, w, b):
    t_, h_, w_ = T // KT, H // KH, W // KW
    patches = x.reshape(B, t_, KT, h_, KH, w_, KW, C).transpose(
        0, 1, 3, 5, 2, 4, 6, 7
    ).reshape(B, t_ * h_ * w_, KT * KH * KW * C)
    return patches @ w.reshape(-1, DIM) + b


def pallas_path(x, w, b):
    out, _ = patch_embed_3d(x, w, b, (KT, KH, KW))
    return out


def main():
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(B, T, H, W, C) * 0.5, jnp.bfloat16)
    w = jnp.asarray(rs.randn(KT, KH, KW, C, DIM) * 0.02, jnp.bfloat16)
    b = jnp.asarray(rs.randn(DIM) * 0.01, jnp.bfloat16)

    # numeric parity on chip first
    ref = np.asarray(jax.jit(xla_path)(x, w, b), np.float32)
    out = np.asarray(jax.jit(pallas_path)(x, w, b), np.float32)
    d = np.abs(ref - out).max()
    print(f"max |pallas - xla| on chip: {d:.2e}", flush=True)

    for name, fn in [("xla", xla_path), ("pallas", pallas_path)]:
        def chain(x, w, b, fn=fn):
            s = jnp.float32(0.0)
            for i in range(CHAIN):
                o = fn(x + s.astype(x.dtype) * 1e-3, w, b)
                s = o.mean().astype(jnp.float32)
            return s

        f = jax.jit(chain)
        m = f(x, w, b)
        float(np.asarray(m))
        iters = 6
        t0 = time.perf_counter()
        sal = 0.0
        for i in range(iters):
            # python float salt is weak-typed: x stays bf16 (np.float32
            # would promote the whole chain to f32 and retrace)
            m = f(x + sal, w, b)
            sal = float(np.asarray(m)) * 1e-6
        dt = (time.perf_counter() - t0) / iters / CHAIN * 1000
        print(f"{name}: {dt:.3f} ms/call", flush=True)


if __name__ == "__main__":
    main()
