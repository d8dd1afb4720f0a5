"""Capture a jax.profiler device trace of the flagship eval step and
summarise per-op device time from the xplane.

Honest protocol (round 3): random weights passed as jit arguments,
exact-erf gelu (the headline numerics), and chained data-dependent
dispatches finished by a host fetch — the relay memoises repeated
identical dispatches and its block_until_ready does not wait, so the
trace would otherwise capture zero real executions.

Usage: python scripts/trace_eval.py [outdir] [fast_gelu]
"""

import os
import sys

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
    fast_gelu = len(sys.argv) > 2 and sys.argv[2] == "fast_gelu"
    from focus_tpu.models.build import build_model
    from bench import random_params_like
    import __graft_entry__ as ge

    cfg = ge._flagship_cfg()
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    cfg.TPU.FAST_GELU = fast_gelu
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
    variables = random_params_like(shapes)

    @jax.jit
    def eval_step(variables, video, boxes):
        o = model.apply(variables, video, {"orvit_bboxes": boxes})
        return o, video + o.mean().astype(video.dtype) * 1e-3

    o, v = eval_step(variables, video, boxes)
    np.asarray(o)  # fetch-forced warmup (compile)
    o, _ = eval_step(variables, v, boxes)
    np.asarray(o)

    os.makedirs(out, exist_ok=True)
    v = video + 0.5e-6
    jax.profiler.start_trace(out)
    for _ in range(3):
        o, v = eval_step(variables, v, boxes)
    np.asarray(o)  # forces the chain inside the trace window
    jax.profiler.stop_trace()
    print("trace written to", out)

    # summarise
    import glob

    pbs = glob.glob(os.path.join(out, "**", "*.xplane.pb"), recursive=True)
    print("xplanes:", pbs)


if __name__ == "__main__":
    main()
