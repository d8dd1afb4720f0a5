"""Box coordinate utilities (counterpart of reference
``slowfast/utils/box_ops.py``). jnp-based so they fuse into jitted graphs;
all accept [..., 4] arrays."""

import jax.numpy as jnp
import numpy as np


def box_cxcywh_to_xyxy(b):
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(b):
    x0, y0, x1, y1 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1
    )


def box_xywh_to_xyxy(b):
    x0, y0, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([x0, y0, x0 + w, y0 + h], axis=-1)


def box_area(b):
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


def box_iou(boxes1, boxes2):
    """Pairwise IoU of [N,4] x [M,4] xyxy boxes -> ([N,M] iou, [N,M] union)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[:, None, :2], boxes2[None, :, :2])
    rb = jnp.minimum(boxes1[:, None, 2:], boxes2[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[:, None] + area2[None, :] - inter
    return inter / jnp.maximum(union, 1e-9), union


def zero_empty_boxes_np(boxes: np.ndarray, fmt: str = "cxcywh") -> np.ndarray:
    """Zero out degenerate boxes (reference box_ops.py:108-122). Host-side
    numpy (used in data pipelines)."""
    if fmt == "cxcywh":
        empty = (boxes[..., 2] <= 0) | (boxes[..., 3] <= 0)
    elif fmt == "xyxy":
        empty = (boxes[..., 2] - boxes[..., 0] <= 0) | (
            boxes[..., 3] - boxes[..., 1] <= 0
        )
    else:
        raise ValueError(fmt)
    out = boxes.copy()
    out[empty] = 0.0
    return out
