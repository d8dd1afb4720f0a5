"""Full-model A/B of the v4 dense-operand kernel mode (V4_DENSE_KV):
the per-layer HBM pad+copy of the kernel's k/v operands (~5-7 ms/step
in the round-4 trace ledger) vs the VMEM-scratch padded build.

The kernel-chain microbench CANNOT see this: its kf/vf are loop
constants, so XLA hoists the pads once. Only the full model — where
k/v are per-layer activations — pays them per layer.

Usage: python scripts/bench_dense_kv.py
"""

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    import __graft_entry__ as ge
    from bench import measure
    from focus_tpu.ops.pallas import trajectory_block as tb

    B = 8
    rs = np.random.RandomState(0)
    video = jnp.asarray(rs.rand(B, 16, 224, 224, 3), jnp.float32)
    boxes = jnp.asarray(rs.rand(B, 8, 4, 4) * 0.5 + 0.25, jnp.float32)

    results = {}
    for dense in (False, True):
        tb.V4_DENSE_KV = dense
        cfg = ge._flagship_cfg()
        cfg.TPU.COMPUTE_DTYPE = "bfloat16"
        cfg.TPU.FAST_GELU = False
        results["dense" if dense else "padded"] = round(
            measure(cfg, video, boxes)[0], 2
        )
    print(json.dumps({"erf_clips_per_sec": results}), flush=True)


if __name__ == "__main__":
    main()
