"""Batch-size scaling of the flagship eval bench (erf headline
numerics), reusing bench.measure's fetch-forced protocol.

Usage: python scripts/bench_batch.py [B ...]   (default: 8 16)
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def main():
    bs = [int(a) for a in sys.argv[1:]] or [8, 16]
    import jax.numpy as jnp
    from bench import measure
    import __graft_entry__ as ge

    rs = np.random.RandomState(0)
    for B in bs:
        video = jnp.asarray(rs.rand(B, 16, 224, 224, 3), jnp.float32)
        boxes = jnp.asarray(rs.rand(B, 8, 4, 4) * 0.5 + 0.25, jnp.float32)
        cfg = ge._flagship_cfg()
        cfg.TPU.COMPUTE_DTYPE = "bfloat16"
        cfg.TPU.FAST_GELU = False
        rate, _ = measure(cfg, video, boxes)
        print(f"B={B}: {rate:.2f} clips/s  ({B * 1000 / rate:.1f} ms/step)",
              flush=True)


if __name__ == "__main__":
    main()
