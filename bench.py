"""Headline benchmark: ORViT-Motionformer SSv2 16x224 eval throughput.

Measures clips/sec/chip for the flagship eval path (BASELINE.json metric)
on whatever device JAX gives us (the driver runs this on one real TPU
chip). Inputs are device-resident so the number is the model roofline;
the input pipeline is benchmarked separately by tools/benchmark.py.

``vs_baseline`` is measured against an estimated 100 clips/s for the
same model on one A100 (the reference publishes no throughput numbers —
BASELINE.md; 100 clips/s ~= 370 GFLOPs/clip at ~37 TFLOP/s sustained,
a generous torch-eager A100 estimate). Target from the driver: >=3x.
"""

import json
import os
import time

import jax

# persistent compile cache: flagship-model compiles through the axon
# remote-compile tunnel take minutes; cache them next to the repo.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

A100_BASELINE_CLIPS_PER_SEC = 100.0


def main():
    from focus_tpu.models.build import build_model
    import __graft_entry__ as ge

    cfg = ge._flagship_cfg()
    cfg.TPU.COMPUTE_DTYPE = "bfloat16"
    # tanh-gelu: measured at VPU-free (fuses into the fc2 matmul like
    # relu) vs ~0.6 ms/block for exact erf — see BENCH_NOTES round 2
    cfg.TPU.FAST_GELU = True
    model = build_model(cfg)

    B = 8
    rs = np.random.RandomState(0)
    video = jnp.asarray(rs.rand(B, 16, 224, 224, 3), jnp.float32)
    boxes = jnp.asarray(rs.rand(B, 8, 4, 4) * 0.5 + 0.25, jnp.float32)
    metadata = {"orvit_bboxes": boxes}
    # shape-only init, then materialise ALL params on device in ONE jitted
    # program: per-param transfers/inits are a round trip each through the
    # remote tunnel (minutes); bench weights just need plausible scale.
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            video, metadata,
        )
    )
    variables = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), shapes
    )

    @jax.jit
    def eval_step(video, boxes):
        return model.apply(variables, video, {"orvit_bboxes": boxes})

    # compile + warmup
    eval_step(video, boxes).block_until_ready()
    eval_step(video, boxes).block_until_ready()

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = eval_step(video, boxes)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    clips_per_sec = B * iters / dt
    print(
        json.dumps(
            {
                "metric": "orvit_mf_ssv2_16x224_eval_clips_per_sec_per_chip",
                "value": round(clips_per_sec, 2),
                "unit": "clips/s",
                "vs_baseline": round(clips_per_sec / A100_BASELINE_CLIPS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
