"""Spatial transforms on host numpy video [T, H, W, C]
(counterpart of reference ``slowfast/datasets/transform.py``; box
co-transform variants carry boxes through the same geometry).
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np
from PIL import Image


def _resize_frames(frames: np.ndarray, new_h: int, new_w: int,
                   interp=Image.BILINEAR) -> np.ndarray:
    dtype = frames.dtype
    scaled = frames
    if scaled.dtype != np.uint8:
        # PIL resize wants uint8 or float32 single-channel; go via float32
        out = np.empty((frames.shape[0], new_h, new_w, frames.shape[3]),
                       np.float32)
        for t in range(frames.shape[0]):
            im = Image.fromarray(
                np.clip(frames[t] * 255.0 if frames[t].max() <= 1.5 else frames[t],
                        0, 255).astype(np.uint8)
            )
            out[t] = np.asarray(im.resize((new_w, new_h), interp), np.float32)
        if frames.max() <= 1.5:
            out /= 255.0
        return out.astype(dtype)
    out = np.empty((frames.shape[0], new_h, new_w, frames.shape[3]), np.uint8)
    for t in range(frames.shape[0]):
        out[t] = np.asarray(
            Image.fromarray(frames[t]).resize((new_w, new_h), interp)
        )
    return out


def random_short_side_scale_jitter(
    frames, min_size, max_size, rng, inverse_uniform_sampling=False, boxes=None
):
    """(reference transform.py:29-80)"""
    if inverse_uniform_sampling:
        size = int(round(1.0 / rng.uniform(1.0 / max_size, 1.0 / min_size)))
    else:
        size = int(round(rng.uniform(min_size, max_size)))
    t, h, w, c = frames.shape
    if (w <= h and w == size) or (h <= w and h == size):
        return frames if boxes is None else (frames, boxes)
    if w < h:
        new_w, new_h = size, int(math.floor(h / w * size))
        scale = size / w
    else:
        new_w, new_h = int(math.floor(w / h * size)), size
        scale = size / h
    frames = _resize_frames(frames, new_h, new_w)
    if boxes is not None:
        return frames, boxes * scale
    return frames


def random_crop(frames, size, rng, boxes=None):
    """(reference transform.py:120-152)"""
    t, h, w, c = frames.shape
    y = rng.randint(0, h - size + 1) if h > size else 0
    x = rng.randint(0, w - size + 1) if w > size else 0
    out = frames[:, y : y + size, x : x + size]
    if boxes is not None:
        boxes = boxes.copy()
        boxes[..., [0, 2]] -= x
        boxes[..., [1, 3]] -= y
        return out, boxes
    return out


def uniform_crop(frames, size, spatial_idx, boxes=None):
    """Three-crop protocol (reference transform.py:190-244)."""
    assert spatial_idx in (0, 1, 2)
    t, h, w, c = frames.shape
    y = int(math.ceil((h - size) / 2))
    x = int(math.ceil((w - size) / 2))
    if h > w:
        y = 0 if spatial_idx == 0 else (h - size if spatial_idx == 2 else y)
    else:
        x = 0 if spatial_idx == 0 else (w - size if spatial_idx == 2 else x)
    out = frames[:, y : y + size, x : x + size]
    if boxes is not None:
        boxes = boxes.copy()
        boxes[..., [0, 2]] -= x
        boxes[..., [1, 3]] -= y
        return out, boxes
    return out


def horizontal_flip(frames, prob, rng, boxes=None):
    """(reference transform.py:155-187)"""
    if rng.uniform() < prob:
        frames = frames[:, :, ::-1].copy()
        if boxes is not None:
            w = frames.shape[2]
            boxes = boxes.copy()
            x0 = boxes[..., 0].copy()
            boxes[..., 0] = w - boxes[..., 2] - 1
            boxes[..., 2] = w - x0 - 1
    if boxes is not None:
        return frames, boxes
    return frames


def clip_boxes_to_image(boxes, height, width):
    boxes = boxes.copy()
    boxes[..., [0, 2]] = np.clip(boxes[..., [0, 2]], 0, width - 1)
    boxes[..., [1, 3]] = np.clip(boxes[..., [1, 3]], 0, height - 1)
    return boxes


def random_resized_crop(
    frames, target_height, target_width, rng,
    scale=(0.08, 1.0), ratio=(3.0 / 4.0, 4.0 / 3.0), boxes=None,
):
    """Inception-style crop (reference transform.py:539-601)."""
    t, h, w, c = frames.shape
    area = h * w
    for _ in range(10):
        target_area = area * rng.uniform(*scale)
        log_ratio = (math.log(ratio[0]), math.log(ratio[1]))
        aspect = math.exp(rng.uniform(*log_ratio))
        cw = int(round(math.sqrt(target_area * aspect)))
        ch = int(round(math.sqrt(target_area / aspect)))
        if 0 < cw <= w and 0 < ch <= h:
            x = rng.randint(0, w - cw + 1)
            y = rng.randint(0, h - ch + 1)
            break
    else:
        # fallback: center crop at image aspect
        cw, ch = min(w, h), min(w, h)
        x, y = (w - cw) // 2, (h - ch) // 2
    cropped = frames[:, y : y + ch, x : x + cw]
    out = _resize_frames(cropped, target_height, target_width, Image.BICUBIC)
    if boxes is not None:
        boxes = boxes.copy()
        boxes[..., [0, 2]] = (boxes[..., [0, 2]] - x) * target_width / cw
        boxes[..., [1, 3]] = (boxes[..., [1, 3]] - y) * target_height / ch
        return out, boxes
    return out
