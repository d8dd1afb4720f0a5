"""Attribute time inside the trajectory block with chained whole-jit
variants (reliable on the axon relay, unlike micro-benchmarks).

Usage: python scripts/profile_block.py [variant ...]
Variants: full, no_stage2, no_mlp, no_stage1, stage1_only
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from flax import linen as nn

from focus_tpu.models.motionformer import Mlp, SlicedDense, trunc_normal_02
from focus_tpu.ops import attention as attn_ops
from focus_tpu.ops.pallas.trajectory_attention import space_stage_fused

B, h, S, F, C = 8, 12, 1568, 8, 768
hd = C // h
scale = hd ** -0.5


class BlockVariant(nn.Module):
    variant: str = "full"
    dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        v = self.variant
        dense = lambda feat, name: nn.Dense(
            feat, use_bias=True, kernel_init=trunc_normal_02,
            dtype=self.dtype, name=name,
        )
        y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        qkv = dense(3 * C, "qkv")(y)
        q, k, vv = jnp.split(qkv, 3, axis=-1)
        split = lambda t: t.reshape(B, S, h, hd).transpose(0, 2, 1, 3).reshape(
            B * h, S, hd
        )
        q, k, vv = map(split, (q, k, vv))
        if v == "no_stage1":
            xs = jnp.broadcast_to(
                q.reshape(B, h, S, 1, hd), (B, h, S, F, hd)
            ).transpose(0, 2, 3, 1, 4).reshape(B, S, F, C)
        else:
            xs = space_stage_fused(
                q, k.reshape(B * h, F, S // F, hd),
                vv.reshape(B * h, F, S // F, hd), scale, False,
            )
            xs = xs.reshape(B, h, S, F, hd).transpose(0, 2, 3, 1, 4).reshape(
                B, S, F, C
            )
        if v == "stage1_only":
            out = xs.mean(axis=2)
        elif v == "no_stage2":
            out = xs[:, :, 0]
        else:
            x_diag = attn_ops.take_diagonal(xs, F)
            q2 = dense(C, "proj_q")(x_diag)
            k2 = SlicedDense(2 * C, C, True, dtype=self.dtype, name="proj_kv")(xs)
            out = attn_ops.temporal_stage(q2, k2, None, xs, F, scale, h, True)
        out = dense(C, "proj")(out)
        x = x + out
        if v != "no_mlp":
            y = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
            x = x + Mlp(4 * C, dtype=self.dtype, name="mlp")(y)
        return x


def main():
    variants = sys.argv[1:] or ["full"]
    rs = np.random.RandomState(0)
    x0 = jnp.asarray(rs.randn(B, S, C) * 0.02, jnp.bfloat16)
    for v in variants:
        mod = BlockVariant(variant=v)
        shapes = jax.eval_shape(lambda m=mod: m.init(jax.random.PRNGKey(0), x0))
        params = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes
        )
        f = jax.jit(lambda t, m=mod, p=params: m.apply(p, t))
        x = f(x0)
        jax.block_until_ready(x)
        iters = 15
        t0 = time.perf_counter()
        for _ in range(iters):
            x = f(x)
        jax.block_until_ready(x)
        print(f"{v}: {(time.perf_counter() - t0) / iters * 1000:.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
