"""Capture a jax.profiler device trace of the flagship train step and
summarise per-op device time.

Usage: python scripts/trace_train.py [outdir]
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import __graft_entry__ as ge
from focus_tpu.models import losses as losses_lib
from focus_tpu.models.build import build_model
from focus_tpu.engine.trainer import (
    build_supervised_state,
    make_supervised_train_step,
)
from focus_tpu.parallel import mesh as mesh_lib

B = 8


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/focus_trace_train"
    cfg = ge._flagship_cfg()
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    mesh = mesh_lib.build_mesh(cfg)
    model = build_model(cfg)
    rs = np.random.RandomState(0)
    video = np.asarray(rs.rand(B, 16, 224, 224, 3), np.float32)
    boxes = np.asarray(rs.rand(B, 8, 4, 4) * 0.5 + 0.25, np.float32)
    labels = rs.randint(0, cfg.MODEL.NUM_CLASSES, (B,)).astype(np.int32)
    batch = (video, labels, np.arange(B, dtype=np.int32),
             {"orvit_bboxes": boxes})
    state = build_supervised_state(cfg, model, mesh, batch, 100)
    loss_fn = losses_lib.get_loss_func(cfg)
    step = make_supervised_train_step(model, cfg, mesh, loss_fn)
    rng = jax.random.PRNGKey(0)
    v, l, m = jnp.asarray(video), jnp.asarray(labels), {
        "orvit_bboxes": jnp.asarray(boxes)
    }
    state, stats = step(state, v, l, m, rng)
    jax.block_until_ready(stats["loss"])
    state, stats = step(state, v, l, m, rng)
    jax.block_until_ready(stats["loss"])

    os.makedirs(out, exist_ok=True)
    jax.profiler.start_trace(out)
    for _ in range(2):
        state, stats = step(state, v, l, m, rng)
    jax.block_until_ready(stats["loss"])
    jax.profiler.stop_trace()
    print("trace written to", out)


if __name__ == "__main__":
    main()
