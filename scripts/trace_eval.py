"""Capture a jax.profiler device trace of the flagship eval step and
summarise per-op device time from the xplane.

Usage: python scripts/trace_eval.py [outdir]
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


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/focus_trace"
    from focus_tpu.models.build import build_model
    import __graft_entry__ as ge

    cfg = ge._flagship_cfg()
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.FAST_GELU = True
    model = build_model(cfg)

    B = 8
    rs = np.random.RandomState(0)
    video = jnp.asarray(rs.rand(B, 16, 224, 224, 3), jnp.float32)
    boxes = jnp.asarray(rs.rand(B, 8, 4, 4) * 0.5 + 0.25, jnp.float32)
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            video, {"orvit_bboxes": boxes},
        )
    )
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes
    )

    @jax.jit
    def eval_step(video, boxes):
        return model.apply(variables, video, {"orvit_bboxes": boxes})

    eval_step(video, boxes).block_until_ready()
    eval_step(video, boxes).block_until_ready()

    os.makedirs(out, exist_ok=True)
    jax.profiler.start_trace(out)
    for _ in range(3):
        eval_step(video, boxes).block_until_ready()
    jax.profiler.stop_trace()
    print("trace written to", out)

    # summarise
    import glob

    pbs = glob.glob(os.path.join(out, "**", "*.xplane.pb"), recursive=True)
    print("xplanes:", pbs)


if __name__ == "__main__":
    main()
