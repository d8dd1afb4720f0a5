#!/usr/bin/env python3
"""MOVi-E episode downloader (counterpart of reference
``slowfast/datasets/download_movi.py``).

Streams the Kubric ``movi_<level>`` TFDS dataset from GCS and writes the
PNG layout our ``Movi_e`` / ``Movi_e_with_masks`` datasets read:
``<out>/data/<ep>/<t:08d>_image.png`` and
``<out>/masks/<ep>/<t:08d>_mask_<n:02d>.png``.

Requires network access and tensorflow_datasets (neither present in this
build environment — the script degrades with a clear message; everything
after download is plain PIL, no torch).

Usage:
  python tools/download_movi.py --out_path /data/movi_e --level e \
      --split train --image_size 128 --dwn_opt i+m
"""

import argparse
import os
import sys

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--out_path", required=True)
    p.add_argument("--level", default="e")
    p.add_argument("--split", default="train")
    p.add_argument("--version", default="1.0.0")
    p.add_argument("--image_size", type=int, default=128)
    p.add_argument("--dwn_opt", default="i+m", choices=["i", "m", "i+m"])
    p.add_argument("--max_num_objs", type=int, default=25)
    p.add_argument("--max_episodes", type=int, default=0,
                   help="stop after N episodes (0 = all)")
    return p.parse_args()


def save_episode(record, b, args):
    from PIL import Image

    name = f"{b:08d}"
    if "i" in args.dwn_opt:
        video = np.asarray(record["video"])  # [T, H, W, 3] uint8
        vid_dir = os.path.join(args.out_path, "data", name)
        os.makedirs(vid_dir, exist_ok=True)
        for t in range(video.shape[0]):
            Image.fromarray(video[t]).save(
                os.path.join(vid_dir, f"{t:08d}_image.png")
            )
    if "m" in args.dwn_opt:
        masks = np.asarray(record["segmentations"])  # [T, H, W, 1]
        mask_dir = os.path.join(args.out_path, "masks", name)
        os.makedirs(mask_dir, exist_ok=True)
        for t in range(masks.shape[0]):
            for n in range(args.max_num_objs):
                m = (masks[t, :, :, 0] == n).astype(np.uint8) * 255
                Image.fromarray(m).save(
                    os.path.join(mask_dir, f"{t:08d}_mask_{n:02d}.png")
                )


def main():
    args = parse_args()
    try:
        import tensorflow_datasets as tfds
    except ImportError:
        sys.exit(
            "tensorflow_datasets is required to stream MOVi from GCS "
            "(pip install tensorflow_datasets tensorflow; needs network)."
        )
    ds, _ = tfds.load(
        f"movi_{args.level}/{args.image_size}x{args.image_size}:"
        f"{args.version}",
        data_dir="gs://kubric-public/tfds",
        with_info=True,
    )
    for b, record in enumerate(tfds.as_numpy(ds[args.split])):
        print(f"episode {b:08d}")
        save_episode(record, b, args)
        if args.max_episodes and b + 1 >= args.max_episodes:
            break


if __name__ == "__main__":
    main()
