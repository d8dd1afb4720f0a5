"""Training-step throughput study on the real chip.

Usage: python scripts/profile_train.py [variant ...]
Variants: pallas (fused fwd + XLA-recompute bwd, the default),
          pallas_b16 / pallas_b32 (bigger train batch),
          fastgelu (pallas + tanh gelu),
          xla (no pallas anywhere; vjp keeps residuals),
          xla_remat (no pallas, jax.checkpoint(dots_saveable) over blocks)
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

import __graft_entry__ as ge
from focus_tpu.models import losses as losses_lib
from focus_tpu.models.build import build_model
from focus_tpu.engine.trainer import (
    build_supervised_state,
    make_supervised_train_step,
)
from focus_tpu.parallel import mesh as mesh_lib

B = 8


def run_variant(name):
    global B
    cfg = ge._flagship_cfg()
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    if name in ("xla", "xla_remat"):
        cfg.TPU.USE_PALLAS = False
    if name == "xla_remat":
        cfg.TPU.REMAT = True
    if name == "fastgelu":
        cfg.TPU.FAST_GELU = True
    if name == "bwd_bf16":
        # labeled variant (round-4 verdict #8): backward pass-A
        # recompute sweeps multiply+exp2 at bf16
        from focus_tpu.ops.pallas import trajectory_block as tb

        tb.BWD_STAGE1 = "bf16"
    if name == "pallas_b16r":
        B = 16
        cfg.TPU.REMAT = True
    elif name.endswith("_b16"):
        B = 16
    elif name.endswith("_b32"):
        B = 32
    else:
        B = 8
    mesh = mesh_lib.build_mesh(cfg)
    model = build_model(cfg)
    rs = np.random.RandomState(0)
    video = np.asarray(rs.rand(B, 16, 224, 224, 3), np.float32)
    boxes = np.asarray(rs.rand(B, 8, 4, 4) * 0.5 + 0.25, np.float32)
    labels = rs.randint(0, cfg.MODEL.NUM_CLASSES, (B,)).astype(np.int32)
    meta = {"orvit_bboxes": boxes}
    batch = (video, labels, np.arange(B, dtype=np.int32), meta)
    state = build_supervised_state(cfg, model, mesh, batch, 100)
    loss_fn = losses_lib.get_loss_func(cfg)
    step = make_supervised_train_step(model, cfg, mesh, loss_fn)
    rng = jax.random.PRNGKey(0)
    v, l, m = jnp.asarray(video), jnp.asarray(labels), {
        "orvit_bboxes": jnp.asarray(boxes)
    }
    state, stats = step(state, v, l, m, rng)
    jax.block_until_ready(stats["loss"])

    def force(st):
        # materialise a value that depends on the whole update chain (the
        # relay can report not-yet-executed buffers as ready)
        leaf = jax.tree_util.tree_leaves(st.params)[0]
        return float(jax.device_get(jnp.sum(leaf.astype(jnp.float32))))

    force(state)
    iters = 6
    t0 = time.perf_counter()
    for _ in range(iters):
        state, stats = step(state, v, l, m, rng)
    force(state)
    dt = (time.perf_counter() - t0) / iters
    print(
        f"{name}: {dt * 1000:.1f} ms/step = {B / dt:.2f} clips/s (train)",
        flush=True,
    )
    if name == "pallas":
        from bench import record_companion

        record_companion(
            "train_b8_clips_per_sec", B / dt, "clips/s",
            "scripts/profile_train.py pallas",
        )


def main():
    for name in sys.argv[1:] or ["pallas", "xla"]:
        run_variant(name)


if __name__ == "__main__":
    main()
