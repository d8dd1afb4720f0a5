"""Input-pipeline proof (round-1 VERDICT missing #6, second half).

1. Selective-decode scaling: per-sample Kinetics decode time must be
   independent of source-video length (whole-file decode is linear).
2. Loader throughput vs the compute budget: the threaded loader over a
   synthetic Kinetics tree must sustain more clips/s than the flagship
   eval bench consumes (~95 clips/s/chip), i.e. the input pipeline can
   keep the chip busy.

Runs host-side only (decode + aug; no device transfers).
Usage: python scripts/bench_input_pipeline.py [workers]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BASE = "/tmp/focus_tpu_input_bench"


def make_videos(root, n_videos, n_frames, size=256, fps=30):
    import cv2

    os.makedirs(root, exist_ok=True)
    done = os.path.join(root, f".done_{n_videos}_{n_frames}_{size}")
    rows = []
    rs = np.random.RandomState(0)
    for v in range(n_videos):
        path = os.path.join(root, f"vid{v}.mp4")
        rows.append(f"{path} {v % 4}")
        if os.path.exists(done):
            continue
        w = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), fps, (size, size)
        )
        frame = rs.randint(0, 255, (size, size, 3), np.uint8)
        for _ in range(n_frames):
            # cheap temporal variation keeps the codec honest
            frame = np.roll(frame, 3, axis=1)
            w.write(frame)
        w.release()
    with open(os.path.join(root, "train.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")
    open(done, "w").close()
    return root


def decode_scaling():
    from focus_tpu.datasets import decoder

    print("== selective-decode scaling (8 frames x rate 8) ==", flush=True)
    for n_frames in (150, 300, 600):
        root = make_videos(
            os.path.join(BASE, f"len{n_frames}"), 2, n_frames
        )
        path = os.path.join(root, "vid0.mp4")
        for selective in (True, False):
            t0 = time.perf_counter()
            reps = 5
            for r in range(reps):
                out = decoder.decode(
                    path, 8, 8, clip_idx=r % 3, num_clips=10,
                    selective=selective,
                )
            dt = (time.perf_counter() - t0) / reps * 1000
            assert out.shape[0] == 8
            print(
                f"  {n_frames}-frame video, selective={selective}: "
                f"{dt:.1f} ms/clip", flush=True,
            )


def loader_throughput(workers):
    from focus_tpu.config import get_cfg
    from focus_tpu.datasets.loader import construct_loader

    root = make_videos(os.path.join(BASE, "len300"), 48, 300)
    cfg = get_cfg()
    cfg.TRAIN.DATASET = "kinetics"
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.DATA.PATH_TO_DATA_DIR = root
    cfg.DATA.NUM_FRAMES = 16
    cfg.DATA.SAMPLING_RATE = 4
    cfg.DATA.TRAIN_JITTER_SCALES = [256, 320]
    cfg.DATA.TRAIN_CROP_SIZE = 224
    cfg.MODEL.ARCH = "slow"
    cfg.DATA_LOADER.NUM_WORKERS = workers
    loader = construct_loader(cfg, "train")
    n_clips = 0
    # warm one batch (thread pool spin-up)
    it = iter(loader)
    next(it)
    t0 = time.perf_counter()
    for batch in it:
        n_clips += batch[1].shape[0]
    for batch in loader:  # second epoch, warm page cache
        n_clips += batch[1].shape[0]
    dt = time.perf_counter() - t0
    print(
        f"== loader throughput ({workers} workers): "
        f"{n_clips / dt:.1f} clips/s over {n_clips} clips "
        f"(flagship eval consumes ~95 clips/s/chip) ==", flush=True,
    )


if __name__ == "__main__":
    decode_scaling()
    loader_throughput(int(sys.argv[1]) if len(sys.argv) > 1 else 16)
