"""Serving-variant matrix on the flagship eval path, fetch-forced
protocol (bench.py): {erf, fast_gelu} x {bf16, int8} at a given batch.

The headline stays bf16/erf (parity numerics); these are the labeled
serving variants a deployment can pick from, each with its measured
numerics delta (tests/test_int8_serving.py, tests/test_hw_gelu.py).

Run on the real chip:  python scripts/bench_serving_matrix.py [B]
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
    for name, fast_gelu, int8 in (
        ("erf_bf16", False, False),
        ("erf_int8", False, True),
        ("fastgelu_bf16", True, False),
        ("fastgelu_int8", True, True),
    ):
        cfg = ge._flagship_cfg()
        cfg.TPU.COMPUTE_DTYPE = "bfloat16"
        cfg.TPU.FAST_GELU = fast_gelu
        cfg.TPU.INT8_SERVING = int8
        results[name] = round(bench.measure(cfg, video, boxes)[0], 2)
        print(f"{name}: {results[name]} clips/s", flush=True)

    print(json.dumps({"batch": B, **results}))


if __name__ == "__main__":
    main()
