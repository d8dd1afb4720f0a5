"""Box-layout splat: paint per-object vectors into their box regions.

TPU-native replacement for the reference's ``boxes_to_layout`` /
``box2spatial_layout`` (reference ``slowfast/models/ORViT/layout.py:28-63``,
``ORViT/utils.py:8-28``), which loops over (batch, frame) in Python and
calls ``F.grid_sample`` on an 8x8 constant image per object.

Because the sampled image is *constant* per object, grid_sample reduces to
a closed-form separable coverage weight: sampling a constant-1 8x8 image
(align_corners=True, zero padding) at normalised coordinate u gives

    cov(u) = clip(1 - max(|u| - 1, 0) * 3.5, 0, 1)      (3.5 = (8-1)/2)

so layout[b,t,i,j] = sum_o v[b,t,o] * cov(gx(o,j)) * cov(gy(o,i)) — one
fused elementwise expression over [B,T,O,H,W], no gather, no loop.

Quirk replicated for checkpoint parity: the reference feeds *xyxy* boxes
into a grid builder that expects [x0, y0, w, h] (``layout.py:110-120``), so
the effective divisor is x1 (= x0 + w), not the width. ``sg2im_correct``
switches to the mathematically-intended width divisor.
"""

import jax.numpy as jnp

from focus_tpu.utils.box_ops import box_cxcywh_to_xyxy

_SRC_RES = 8  # the reference's constant source image is 8x8


def _coverage(u):
    """Bilinear coverage of an align_corners constant image at coord u
    (u in grid_sample's [-1, 1] space)."""
    ramp = (_SRC_RES - 1) / 2.0
    return jnp.clip(1.0 - jnp.maximum(jnp.abs(u) - 1.0, 0.0) * ramp, 0.0, 1.0)


def boxes_to_layout(vecs, boxes_cxcywh, H: int, W: int,
                    sg2im_correct: bool = False):
    """vecs: [..., O, D]; boxes_cxcywh: [..., O, 4] normalised cxcywh.
    Returns [..., H, W, D] — the sum over objects of their splatted vectors.

    All-zero boxes are removed in the reference; here they contribute zero
    weight (guarded against the 0/0 in the grid math).
    """
    xyxy = box_cxcywh_to_xyxy(boxes_cxcywh)
    legal = jnp.any(boxes_cxcywh != 0, axis=-1)  # [..., O]
    x0, y0, x1, y1 = (xyxy[..., i] for i in range(4))
    dx = (x1 - x0) if sg2im_correct else x1  # reference divides by x1/y1
    dy = (y1 - y0) if sg2im_correct else y1
    dx = jnp.where(dx == 0, 1.0, dx)
    dy = jnp.where(dy == 0, 1.0, dy)

    xs = jnp.linspace(0.0, 1.0, W, dtype=vecs.dtype)  # output pixel coords
    ys = jnp.linspace(0.0, 1.0, H, dtype=vecs.dtype)
    gx = (xs - x0[..., None]) / dx[..., None] * 2.0 - 1.0  # [..., O, W]
    gy = (ys - y0[..., None]) / dy[..., None] * 2.0 - 1.0  # [..., O, H]
    wx = _coverage(gx) * legal[..., None]
    wy = _coverage(gy)
    # out[..., i, j, d] = sum_o wy[..., o, i] wx[..., o, j] v[..., o, d]
    return jnp.einsum(
        "...oi,...oj,...od->...ijd", wy, wx, vecs,
        preferred_element_type=jnp.float32,
    ).astype(vecs.dtype)


def box2spatial_layout(boxes_cxcywh, action_map, H: int, W: int):
    """Vectorised counterpart of reference ORViT/utils.py:8-28.

    boxes_cxcywh: [BS, T, O, 4]; action_map: [BS, T, O, d]
    Returns [BS, T, H, W, d] (the reference returns NCTHW; we stay
    channels-last)."""
    return boxes_to_layout(action_map, boxes_cxcywh, H, W)
