"""Attribute flagship-block time by chaining each part N times in ONE jit
program (per-dispatch overhead on the axon relay is ~3 ms and identical
repeated calls can be memoised, so we chain data-dependent calls inside a
single program and divide).

Fetch-forced protocol (round-3 diagnostics): the relay's
block_until_ready does not actually wait, so timing loops chain the
dispatches through a data dependence (each iteration feeds the previous
output back in) and finish with ONE host fetch that forces the whole
chain.

Usage: python scripts/profile_parts.py [part ...]
Parts: kernel qkv proj mlp ln block orvit_extra
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, h, S, F, C = 8, 12, 1568, 8, 768
hd = C // h
scale = hd ** -0.5
N = S // F
CHAIN = 48


def _fetch(t):
    return np.asarray(t if t.ndim < 3 else t[0, 0, :8])


def _timed(fn, *args, iters=8, label=""):
    """fn's first arg and return value must share a shape: iterations are
    chained through it (distinct args defeat relay memoisation; the final
    fetch forces the dependent chain)."""
    f = jax.jit(fn)
    out = f(*args)
    _fetch(out)  # compile + warmup
    rest = args[1:]
    t0 = time.perf_counter()
    cur = out
    for _ in range(iters):
        cur = f(cur, *rest)
    _fetch(cur)
    dt = (time.perf_counter() - t0) / iters
    print(f"{label}: {dt / CHAIN * 1000:.3f} ms/unit  ({dt * 1000:.1f} ms "
          f"for {CHAIN} chained)", flush=True)


def main():
    parts = sys.argv[1:] or ["noop", "kernel", "qkv", "proj", "mlp", "ln"]
    rs = np.random.RandomState(0)
    bf = jnp.bfloat16
    x = jnp.asarray(rs.randn(B, S, C) * 0.02, bf)
    kf = jnp.asarray(rs.randn(B, F, N, C) * 0.02, bf)
    vf = jnp.asarray(rs.randn(B, F, N, C) * 0.02, bf)
    w_cc = jnp.asarray(rs.randn(C, C) * 0.02, bf)
    b_c = jnp.zeros((C,), bf)
    w3 = jnp.asarray(rs.randn(C, 3 * C) * 0.02, bf)
    w4 = jnp.asarray(rs.randn(C, 4 * C) * 0.02, bf)
    w4b = jnp.asarray(rs.randn(4 * C, C) * 0.02, bf)

    if "noop" in parts:
        # dispatch-overhead floor: per-call cost of an (almost) empty
        # program through the relay, subtract from every row below
        def tiny(t):
            return t * 2.0 + 1.0

        f = jax.jit(tiny)
        s = x[0, 0, :8]
        _fetch(f(s))
        t0 = time.perf_counter()
        cur = s
        for _ in range(8):
            cur = f(cur)  # chained, fetched per-iter: measures round trip
            _fetch(cur)
        dt = (time.perf_counter() - t0) / 8
        print(f"noop (per-dispatch fetch round trip): {dt * 1000:.1f} ms",
              flush=True)

    if "kernel" in parts:
        from focus_tpu.ops.pallas.trajectory_block import fused_trajectory_core

        def chain_kernel(q, kf, vf):
            for _ in range(CHAIN):
                q = fused_trajectory_core(
                    q, kf, vf, w_cc, b_c, w_cc, b_c, scale, h
                )
            return q

        _timed(chain_kernel, x, kf, vf, label="fused kernel")

    if "kernel_bwd" in parts:
        from focus_tpu.ops.pallas.trajectory_block import fused_trajectory_core

        def chain_kernel_bwd(q, kf, vf):
            def loss(q):
                t = q
                for _ in range(max(CHAIN // 8, 2)):
                    t = fused_trajectory_core(
                        t, kf, vf, w_cc, b_c, w_cc, b_c, scale, h
                    )
                return jnp.sum(t.astype(jnp.float32))

            return jax.grad(loss)(q)

        n = max(CHAIN // 8, 2)
        f = jax.jit(chain_kernel_bwd)
        out = f(x, kf, vf)
        _fetch(out)
        t0 = time.perf_counter()
        for _ in range(4):
            out = f(out, kf, vf)  # chained through dq (same shape as q)
        _fetch(out)
        dt = (time.perf_counter() - t0) / 4 / n * 1000
        print(f"fused kernel fwd+bwd (custom_vjp XLA recompute): "
              f"{dt:.3f} ms/unit", flush=True)

    if "qkv" in parts:
        def chain_qkv(t):
            for _ in range(CHAIN):
                y = t @ w3
                t = y[:, :, :C] + y[:, :, C:2 * C] * 0.5 + y[:, :, 2 * C:] * 0.25
            return t

        _timed(chain_qkv, x, label="qkv dense (C->3C)")

    if "proj" in parts:
        def chain_proj(t):
            for _ in range(CHAIN):
                t = t @ w_cc + b_c
            return t

        _timed(chain_proj, x, label="proj dense (C->C)")

    if "mlp" in parts:
        def chain_mlp(t):
            for _ in range(CHAIN):
                t = jax.nn.gelu(t @ w4, approximate=False) @ w4b
            return t

        _timed(chain_mlp, x, label="mlp (C->4C->C + gelu)")

    if "mlp_fast" in parts:
        def chain_mlp_fast(t):
            for _ in range(CHAIN):
                t = jax.nn.gelu(t @ w4, approximate=True) @ w4b
            return t

        _timed(chain_mlp_fast, x, label="mlp tanh-gelu")

    if "orvit" in parts:
        from focus_tpu.config import get_cfg
        from focus_tpu.models.build import build_model
        from focus_tpu.models.orvit import ORViTBlock
        from focus_tpu.config.node import StaticCfg

        cfg = get_cfg()
        cfg.TPU.COMPUTE_DTYPE = "bfloat16"
        cfg.ORVIT.O = 4
        cfg.DATA.TRAIN_CROP_SIZE = 224
        cfg.MF.TEMPORAL_RESOLUTION = F
        scfg = StaticCfg(cfg)
        blk = ORViTBlock(cfg=scfg, dim=C, num_heads=h, qkv_bias=True,
                         nb_frames=F, dtype=bf)
        xc = jnp.concatenate([x[:, :1], x], axis=1)  # +CLS
        boxes = jnp.asarray(rs.rand(B, F, 4, 4) * 0.5 + 0.25, bf)
        meta = {"orvit_bboxes": boxes}
        shapes = jax.eval_shape(
            lambda: blk.init(jax.random.PRNGKey(0), xc, meta, (F, 14, 14))
        )
        from bench import random_params_like

        params = random_params_like(shapes)

        n_ch = max(CHAIN // 8, 3)

        def chain_orvit(t):
            for _ in range(n_ch):
                t, _ = blk.apply(params, t, meta, (F, 14, 14))
            return t

        f_ov = jax.jit(chain_orvit)
        out = f_ov(xc)
        _fetch(out)
        t0 = time.perf_counter()
        for _ in range(6):
            out = f_ov(out)
        _fetch(out)
        dt = (time.perf_counter() - t0) / 6 / n_ch * 1000
        print(f"ORViT block (full): {dt:.3f} ms/unit", flush=True)

    if "ln" in parts:
        def chain_ln(t):
            for _ in range(CHAIN):
                m = t.mean(-1, keepdims=True)
                v = ((t - m) ** 2).mean(-1, keepdims=True)
                t = (t - m) * jax.lax.rsqrt(v + 1e-6)
            return t

        _timed(chain_ln, x, label="layernorm")

    if "block" in parts:
        from focus_tpu.models.motionformer import ScannedTrajBlocks

        mod = ScannedTrajBlocks(
            length=CHAIN, dim=C, num_heads=h, mlp_ratio=4.0, qkv_bias=True,
            dpr=tuple([0.0] * CHAIN), use_pallas=True, dtype=bf,
        )
        shapes = jax.eval_shape(
            lambda: mod.init(jax.random.PRNGKey(0), x, None, (F, 14, 14))
        )
        params = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes
        )

        def run_block(t):
            out, _ = mod.apply(params, t, None, (F, 14, 14))
            return out

        _timed(run_block, x, label="full traj block (scan x12)")


if __name__ == "__main__":
    main()
