"""Companion metrics under the fetch-forced protocol (BENCH_NOTES):
B=1 per-clip latency and the HR-336 EpicKitchens stress shape.

Usage: python scripts/bench_companions.py [b1] [hr336]
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def main():
    parts = sys.argv[1:] or ["b1", "hr336"]
    import jax.numpy as jnp
    from bench import measure, record_companion
    import __graft_entry__ as ge

    rs = np.random.RandomState(0)
    if "b1" in parts:
        video = jnp.asarray(rs.rand(1, 16, 224, 224, 3), jnp.float32)
        boxes = jnp.asarray(rs.rand(1, 8, 4, 4) * 0.5 + 0.25, jnp.float32)
        cfg = ge._flagship_cfg()
        cfg.TPU.COMPUTE_DTYPE = "bfloat16"
        rate, _ = measure(cfg, video, boxes, iters=20)
        print(f"B=1 latency: {1000 / rate:.1f} ms/clip", flush=True)
        record_companion(
            "b1_latency_ms_per_clip", 1000 / rate, "ms",
            "scripts/bench_companions.py b1",
        )

    if "hr336" in parts:
        # EK high-res stress: 336px crop -> 441-token frames
        cfg = ge._flagship_cfg()
        cfg.TPU.COMPUTE_DTYPE = "bfloat16"
        cfg.DATA.TRAIN_CROP_SIZE = 336
        cfg.DATA.TEST_CROP_SIZE = 336
        B = 4
        video = jnp.asarray(rs.rand(B, 16, 336, 336, 3), jnp.float32)
        boxes = jnp.asarray(rs.rand(B, 8, 4, 4) * 0.5 + 0.25, jnp.float32)
        rate, _ = measure(cfg, video, boxes, iters=8)
        print(f"HR-336 B={B}: {rate:.2f} clips/s", flush=True)
        record_companion(
            "hr336_ek_b4_clips_per_sec", rate, "clips/s",
            "scripts/bench_companions.py hr336",
        )


if __name__ == "__main__":
    main()
