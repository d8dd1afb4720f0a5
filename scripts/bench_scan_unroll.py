"""A/B: TPU.SCAN_LAYERS (lax.scan over stacked block params) vs a fully
unrolled block stack, flagship eval shape.

Why this might matter: the scanned stack dynamic-slices each layer's
weights out of the stacked [L, ...] leaves every iteration (an HBM
read+write copy of ~14 MB/layer at MF-B scale) and pins one fixed
schedule for the block body; unrolling lets XLA schedule across block
boundaries and address each layer's weights in place, at the cost of a
longer compile and a program body ~12x larger. Never measured before
round 3 (BENCH_NOTES has no SCAN_LAYERS entry) — this script settles it
under the fetch-forced protocol.

Usage: python scripts/bench_scan_unroll.py [B]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

import bench as bench_mod
import __graft_entry__ as ge


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    bench_mod._require_devices()
    rs = np.random.RandomState(0)
    video = jnp.asarray(rs.rand(B, 16, 224, 224, 3), jnp.float32)
    boxes = jnp.asarray(rs.rand(B, 8, 4, 4) * 0.5 + 0.25, jnp.float32)

    results = {}
    for scan in (True, False):
        cfg = ge._flagship_cfg()
        cfg.TPU.COMPUTE_DTYPE = "bfloat16"
        cfg.TPU.FAST_GELU = False
        # Pin REMAT explicitly: ScannedTrajBlocks consumes TPU.REMAT but
        # the unrolled TrajectoryAttentionBlock path does not, so the A/B
        # is only scan-vs-unroll when remat is off on both sides.
        cfg.TPU.REMAT = False
        cfg.TPU.SCAN_LAYERS = scan
        clips, _ = bench_mod.measure(cfg, video, boxes)
        results["scan" if scan else "unroll"] = clips
        print(f"SCAN_LAYERS={scan}: {clips:.2f} clips/s", flush=True)

    ratio = results["unroll"] / results["scan"]
    print(f"unroll/scan speedup: {ratio:.3f}x", flush=True)
    print(
        json.dumps(
            {
                "scan_clips_per_sec": round(results["scan"], 2),
                "unroll_clips_per_sec": round(results["unroll"], 2),
                "unroll_over_scan": round(ratio, 3),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
