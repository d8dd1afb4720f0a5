"""Dump the optimized HLO of the flagship eval step (compile comes from
the persistent cache after a bench run) for layout/fusion forensics.

Usage: python scripts/dump_eval_hlo.py [out.txt] [fast_gelu]
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
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/eval_hlo.txt"
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
        out = model.apply(variables, video, {"orvit_bboxes": boxes})
        return out, video + out.mean().astype(video.dtype) * 1e-3

    txt = eval_step.lower(variables, video, boxes).compile().as_text()
    with open(out_path, "w") as fh:
        fh.write(txt)
    print(f"wrote {len(txt)} bytes to {out_path}")


if __name__ == "__main__":
    main()
