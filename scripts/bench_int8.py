"""A/B the TPU.INT8_SERVING eval path against bf16 on the flagship
model, under the fetch-forced chained protocol (bench.py).

Run on the real chip:  python scripts/bench_int8.py [B]
Expected lever (SOL.md): the non-kernel matmul mass (~20 ms of the
67 ms B=8 step) runs on the int8 MXU at ~2x the bf16 peak; the
trajectory kernel itself stays bf16 (VPU softmax-bound).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (reuses the watchdog + protocol)
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def main():
    import __graft_entry__ as ge

    bench._require_devices()
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rs = np.random.RandomState(0)
    video = jnp.asarray(rs.rand(B, 16, 224, 224, 3), jnp.float32)
    boxes = jnp.asarray(rs.rand(B, 8, 4, 4) * 0.5 + 0.25, jnp.float32)

    results = {}
    for name, int8 in (("bf16", False), ("int8", True)):
        cfg = ge._flagship_cfg()
        cfg.TPU.COMPUTE_DTYPE = "bfloat16"
        cfg.TPU.FAST_GELU = False
        cfg.TPU.INT8_SERVING = int8
        results[name] = round(bench.measure(cfg, video, boxes)[0], 2)
        print(f"{name}: {results[name]} clips/s", flush=True)

    print(json.dumps({"batch": B, **results,
                      "speedup": round(results["int8"] / results["bf16"], 3)}))


if __name__ == "__main__":
    main()
