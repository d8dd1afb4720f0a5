"""STEVE autoregressive slot-rollout throughput under the fetch-forced
protocol (the round-2 111 fps was measured with per-dispatch
block_until_ready, which the relay does not honor).

Shape: movi_e/base defaults — 64 px (gen_len 256), B=8, T=4, bf16.
Usage: python scripts/bench_steve_rollout.py [kv|full ...] [B=n]

B=n overrides the video batch (rollout batch = 4n): the AR scan is
latency-bound per step, so fps scales with batch until the per-step
matmuls saturate the MXU — the serving lever the SOL note quantifies.
"""

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

from focus_tpu.config import get_cfg
from focus_tpu.models.build import build_model, init_model
from bench import random_params_like

B, T = 8, 4


def main():
    global B
    parts = [a for a in sys.argv[1:] if not a.startswith("B=")] or ["kv"]
    for a in sys.argv[1:]:
        if a.startswith("B="):
            B = int(a[2:])
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "STEVE"
    cfg.MODEL.CNN_NAME = "base"
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    model = build_model(cfg)
    rs = np.random.RandomState(0)
    video = jnp.asarray(
        rs.rand(B, T, cfg.SLOTS.IMG_SIZE, cfg.SLOTS.IMG_SIZE, 3), jnp.float32
    )
    shapes = jax.eval_shape(
        lambda: init_model(model, cfg, (video, 1.0, True))
    )
    variables = random_params_like(shapes)

    # variables are explicit jit ARGUMENTS (not closed-over constants):
    # captured weights bloat the lowered program by the full 2+ GB param
    # bytes through the relay and invite constant folding (round-2
    # verdict #2 hygiene, same as bench.py)
    def encode(variables, video):
        return model.apply(
            variables, video, method="encode",
            rngs={"slots": jax.random.PRNGKey(1)},
        )

    slots, _, _ = jax.jit(encode)(variables, video)
    slots = slots.reshape(B * T, *slots.shape[2:])
    np.asarray(slots[0, 0, :2])

    for name in parts:
        kv = name in ("kv", "kvint8")
        # kvint8: the W8A16 fused-AR labeled variant (weight stream
        # halved; INT8_SERVING class) — numerics pinned by
        # tests/test_steve_fused_ar.py
        cfg.TPU.INT8_SERVING = name == "kvint8"
        model = build_model(cfg)

        def roll(variables, slots, kv=kv):
            out = model.apply(
                variables, slots, method="decode", use_kv_cache=kv,
            )
            return out, slots + out.mean().astype(slots.dtype) * 1e-3

        jf = jax.jit(roll)
        f = lambda s: jf(variables, s)
        out, s = f(slots)
        np.asarray(out[0, 0, 0, :2])
        iters = 4
        t0 = time.perf_counter()
        for _ in range(iters):
            out, s = f(s)
        np.asarray(out[0, 0, 0, :2])
        dt = (time.perf_counter() - t0) / iters
        frames = B * T
        print(
            f"{name}: {dt * 1000:.1f} ms/rollout-batch = "
            f"{frames / dt:.1f} fps",
            flush=True,
        )
        if kv and B == 8:  # the tracked companion keeps the protocol shape
            from bench import record_companion

            comp = (
                "steve_rollout_kv_fps" if name == "kv"
                else "steve_rollout_kv_int8_fps"
            )
            record_companion(
                comp, frames / dt, "frames/s",
                f"scripts/bench_steve_rollout.py {name}",
                extra={"shape": f"movi_e/base 64px gen_len 256 B={B} T={T}"},
            )


if __name__ == "__main__":
    main()
