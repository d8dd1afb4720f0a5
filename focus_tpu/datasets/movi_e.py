"""MOVi-E episode datasets (reference ``slowfast/datasets/movi_e.py``).

Episodes are directories of PNG frames chunked into clips of
``SLOTS.NUM_ITERS`` frames (the reference's quirky episode length,
movi_e.py:32). Returns float32 NHWC video in [0, 1]; the masks variant
additionally returns [T, NUM_SEGS, H, W, 1] binary masks.
"""

import glob
import os
from pathlib import Path

import numpy as np
from PIL import Image, ImageFile

from focus_tpu.datasets.build import DATASET_REGISTRY

ImageFile.LOAD_TRUNCATED_IMAGES = True


def _load_frame(path, size):
    img = Image.open(path).convert("RGB").resize((size, size))
    return np.asarray(img, np.float32) / 255.0  # HWC in [0,1]


@DATASET_REGISTRY.register()
class Movi_e:
    def __init__(self, cfg, mode="train"):
        self.img_size = cfg.DATA.TRAIN_CROP_SIZE
        self.ep_len = cfg.SLOTS.NUM_ITERS
        total_dirs = sorted(glob.glob(cfg.DATA.PATH_TO_DATA_DIR))
        if mode == "train":
            total_dirs = total_dirs[: int(len(total_dirs) * 0.7)]
        elif mode == "val":
            total_dirs = total_dirs[
                int(len(total_dirs) * 0.7) : int(len(total_dirs) * 0.85)
            ]
        elif mode == "test":
            total_dirs = total_dirs[int(len(total_dirs) * 0.85) :]
        self.episodes = []
        for d in total_dirs:
            paths = sorted(glob.glob(os.path.join(d, cfg.DATA.GLOB_EXP)))
            for i in range(0, len(paths) - self.ep_len + 1, self.ep_len):
                self.episodes.append(paths[i : i + self.ep_len])

    def __len__(self):
        return len(self.episodes)

    def __getitem__(self, idx):
        frames = [_load_frame(p, self.img_size) for p in self.episodes[idx]]
        return np.stack(frames)  # [T, H, W, C]


@DATASET_REGISTRY.register()
class Movi_e_with_masks:
    """(reference movi_e.py:72-137); mask paths are derived by swapping
    'frames' -> 'masks' in the directory."""

    def __init__(self, cfg, mode="train"):
        self.img_size = cfg.DATA.TRAIN_CROP_SIZE
        self.ep_len = cfg.SLOTS.NUM_ITERS
        self.num_segs = cfg.DATA.NUM_SEGS
        total_dirs = sorted(glob.glob(cfg.DATA.PATH_TO_DATA_DIR))
        self.episodes_rgb = []
        self.episodes_mask = []
        for d in total_dirs:
            paths = sorted(glob.glob(os.path.join(d, cfg.DATA.GLOB_EXP)))
            buf_rgb, buf_mask = [], []
            for image_path in paths:
                p = Path(image_path)
                buf_rgb.append(image_path)
                parent = str(p.parent).replace("frames", "masks")
                buf_mask.append(
                    [
                        os.path.join(
                            parent, f"{p.stem.split('_')[0]}_mask_{n:02}.png"
                        )
                        for n in range(self.num_segs)
                    ]
                )
                if len(buf_rgb) == self.ep_len:
                    self.episodes_rgb.append(buf_rgb)
                    self.episodes_mask.append(buf_mask)
                    buf_rgb, buf_mask = [], []

    def __len__(self):
        return len(self.episodes_rgb)

    def __getitem__(self, idx):
        video = np.stack(
            [_load_frame(p, self.img_size) for p in self.episodes_rgb[idx]]
        )
        masks = []
        for frame_masks in self.episodes_mask[idx]:
            ms = []
            for mp in frame_masks:
                img = Image.open(mp).convert("1").resize((self.img_size, self.img_size))
                ms.append(np.asarray(img, np.float32)[..., None])
            masks.append(np.stack(ms))
        return video, np.stack(masks)  # [T,H,W,C], [T,S,H,W,1]
