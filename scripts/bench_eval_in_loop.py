"""Loader-in-the-loop flagship eval (round-2 verdict #6): measure what
the EVAL pipeline sustains end-to-end — on-disk JPEG SSv2 -> native
decode -> transforms -> sharded prefetch -> jitted ORViT-MF eval step on
the real chip — instead of extrapolating from loader-only numbers.

On this 1-core host the loader is the bottleneck by construction; the
script therefore reports (a) measured end-to-end clips/s, (b) the
loader's CPU-seconds/clip, and (c) the projected end-to-end rate on a
real multi-core TPU host via min(device_rate, vcpus / cpu_sec_per_clip).

Usage: python scripts/bench_eval_in_loop.py [n_videos] [frames_per_video]
       [mode]

mode: "u8" (default; TPU.DEVICE_PREPROCESS uint8 pipeline — host does
decode+resize+crop only, the jitted step normalises on device, H2D
ships uint8) or "f32" (round-3 host-normalised float pipeline), or
"u8dct" (u8 + DCT-scaled decode, labeled variant).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", ".jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

BASE = "/tmp/focus_tpu_eval_loop"


def make_flagship_ssv2(root, n_videos=32, n_frames=48, size=288):
    """Flagship-scale synthetic SSv2 JPEG tree (224-crop sources)."""
    import json

    from PIL import Image

    done = os.path.join(root, f".done_{n_videos}_{n_frames}_{size}")
    os.makedirs(f"{root}/sm/annotations", exist_ok=True)
    os.makedirs(f"{root}/json_files", exist_ok=True)
    rs = np.random.RandomState(0)
    labels = {f"Doing thing {i}": str(i) for i in range(4)}
    json.dump(
        labels,
        open(f"{root}/sm/annotations/something-something-v2-labels.json", "w"),
    )
    entries = []
    for v in range(n_videos):
        vid = str(10000 + v)
        entries.append(
            {"id": vid, "template": f"Doing [thing {v % 4}]"}
        )
        fdir = f"{root}/frames/{vid}"
        bdir = f"{root}/detected_boxes/{vid}"
        os.makedirs(fdir, exist_ok=True)
        os.makedirs(bdir, exist_ok=True)
        if os.path.exists(done):
            continue
        frame = rs.randint(0, 255, (size, size, 3), np.uint8)
        for t in range(n_frames):
            frame = np.roll(frame, 5, axis=1)
            Image.fromarray(frame).save(
                f"{fdir}/{t + 1:04d}.jpg", quality=80
            )
            boxes = {
                "boxes": rs.rand(4, 4).astype(np.float32) * size / 2,
                "pred_classes": np.array([0, 1, 1, 0]),
            }
            boxes["boxes"][:, 2:] += boxes["boxes"][:, :2]
            np.save(f"{bdir}/{t + 1:04d}.npy", boxes, allow_pickle=True)
    for split in ("train", "validation"):
        json.dump(
            entries,
            open(f"{root}/json_files/something-something-v2-{split}.json", "w"),
        )
    open(done, "w").close()
    return root


def main():
    n_videos = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 48
    mode = sys.argv[3] if len(sys.argv) > 3 else "u8"
    root = make_flagship_ssv2(BASE, n_videos, n_frames)

    import __graft_entry__ as ge

    from focus_tpu.datasets.loader import construct_loader
    from focus_tpu.models.build import build_model

    cfg = ge._flagship_cfg()
    cfg.MODEL.ARCH = "slow"  # single-pathway packing (the SSv2 recipe)
    # bf16 on TPU; the CPU smoke path lacks bf16 dot support
    on_tpu = jax.default_backend() in ("tpu", "axon")
    cfg.TPU.COMPUTE_DTYPE = "bfloat16" if on_tpu else "float32"
    if not on_tpu:
        cfg.TPU.USE_PALLAS = False
    cfg.TEST.BATCH_SIZE = 8
    cfg.TEST.DATASET = "ssv2"
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 1
    cfg.TEST.NUM_SPATIAL_CROPS = 1
    cfg.SSV2.DATA_ROOT = root
    cfg.SSV2.SPLITS_ROOT = root
    cfg.SSV2.SPLIT = "standard"
    cfg.SSV2.BOXES_FORMAT = "detectron2"
    cfg.DATA_LOADER.NUM_WORKERS = 8
    cfg.TPU.DEVICE_PREPROCESS = mode in ("u8", "u8dct")
    cfg.TPU.DECODE_DCT_SCALE = mode == "u8dct"

    model = build_model(cfg)
    loader = construct_loader(cfg, "test")
    print(f"test loader: {len(loader)} batches", flush=True)

    # flagship params on device (random, plausible scale — bench.py method)
    from bench import random_params_like

    sample = next(iter(loader))
    video0 = jnp.asarray(sample[0])
    meta0 = {"orvit_bboxes": jnp.asarray(sample[3]["orvit_bboxes"])}
    shapes = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            video0, meta0,
        )
    )
    variables = random_params_like(shapes)

    from focus_tpu.ops.preprocess import device_normalize

    @jax.jit
    def eval_step(variables, video, boxes):
        video = device_normalize(video, cfg)
        return model.apply(variables, video, {"orvit_bboxes": boxes})

    eval_step(variables, video0, meta0["orvit_bboxes"]).block_until_ready()

    stats = loader.collect_stats()
    n_clips = 0
    h2d_cpu = 0.0
    t0 = time.perf_counter()
    cpu0 = time.process_time()
    out = None
    for batch in loader:
        th0 = time.process_time()
        video = jnp.asarray(batch[0])
        boxes = jnp.asarray(batch[3]["orvit_bboxes"])
        h2d_cpu += time.process_time() - th0
        out = eval_step(variables, video, boxes)
        n_clips += batch[1].shape[0]
    np.asarray(out)  # host fetch: the relay's block_until_ready may not wait
    dt = time.perf_counter() - t0
    cpu_dt = time.process_time() - cpu0
    cpu_per_clip = cpu_dt / n_clips
    # bucket table (round-5 verdict #6): where the host CPU ms/clip goes
    n = max(stats["samples"], 1)
    other = cpu_dt - stats["fetch_s"] - stats["collate_s"] - h2d_cpu
    print(
        "host-time buckets (process_time ms/clip): "
        f"dataset fetch {1000 * stats['fetch_s'] / n:.1f} | "
        f"collate {1000 * stats['collate_s'] / n:.1f} | "
        f"H2D/serialize {1000 * h2d_cpu / n_clips:.1f} | "
        f"other(dispatch+fetch) {1000 * other / n_clips:.1f}",
        flush=True,
    )
    device_rate = 132.0  # device-resident erf-gelu bench (BENCH_NOTES r4)
    for vcpus in (1, 8, 100, 200):
        proj = min(device_rate, vcpus / cpu_per_clip)
        print(
            f"projected end-to-end @ {vcpus:>3} vCPU: {proj:7.1f} clips/s",
            flush=True,
        )
    h2d_mb = np.asarray(sample[0]).nbytes / sample[1].shape[0] / 1e6
    print(
        f"loader-in-the-loop eval [{mode}]: {n_clips / dt:.2f} clips/s "
        f"over {n_clips} clips ({cpu_per_clip * 1000:.1f} ms CPU/clip, "
        f"{h2d_mb:.1f} MB H2D/clip, batch dtype "
        f"{np.asarray(sample[0]).dtype}; this host has {os.cpu_count()} "
        f"vCPU)", flush=True,
    )


if __name__ == "__main__":
    main()
