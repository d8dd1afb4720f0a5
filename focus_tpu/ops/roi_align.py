"""RoIAlign as separable bilinear-weight matmuls — gather-free, MXU-native.

TPU-native replacement for ``torchvision.ops.roi_align`` (called by the
reference at ``slowfast/models/ORViT/utils.py:64-71``) and
``detectron2.layers.ROIAlign`` (``slowfast/models/head_helper.py:75-81``).

Key observation: RoIAlign's sampling grid is axis-separable — every output
bin (i, j) averages bilinear samples whose y-positions depend only on i and
x-positions only on j. So the whole op factors into two small dense weight
matrices per box,

    out[o, i, j, c] = sum_{y, x}  Wy[o, i, y] * Wx[o, j, x] * feat[y, x, c],

computed with two einsums that XLA maps straight onto the MXU. No gathers,
no dynamic shapes: empty/degenerate boxes produce all-zero weight rows.

Semantics match torchvision with ``aligned=True`` and
``sampling_ratio=-1`` (adaptive ceil(bin_size) samples per bin, emulated
with a static max-sample count and masking) including the boundary rules
(positions < -1 or > size are dropped; otherwise clamped to [0, size-1]).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def _axis_weights(start, roi_size, n_out: int, n_in: int, sampling_ratio: int,
                  max_samples: int):
    """Per-box interpolation matrix for one axis.

    start: [O] roi start coordinate (already scaled/offset, feature coords)
    roi_size: [O] roi extent in feature coords
    Returns W: [O, n_out, n_in].
    """
    bin_size = roi_size / n_out  # [O]
    if sampling_ratio > 0:
        count = jnp.full_like(bin_size, sampling_ratio)
    else:
        count = jnp.ceil(bin_size)
        count = jnp.clip(count, 1, max_samples)

    i = jnp.arange(n_out, dtype=start.dtype)  # output bin index
    s = jnp.arange(max_samples, dtype=start.dtype)  # sample index within bin
    # pos[o, i, s] = start + i*bin + (s + .5) * bin / count
    pos = (
        start[:, None, None]
        + i[None, :, None] * bin_size[:, None, None]
        + (s[None, None, :] + 0.5) * bin_size[:, None, None] / count[:, None, None]
    )
    valid_s = s[None, None, :] < count[:, None, None]
    # torchvision boundary rule: drop if pos < -1 or pos > n_in, else clamp
    in_range = (pos >= -1.0) & (pos <= n_in)
    pos_c = jnp.clip(pos, 0.0, n_in - 1)
    y = jnp.arange(n_in, dtype=start.dtype)
    w = jnp.maximum(0.0, 1.0 - jnp.abs(pos_c[..., None] - y))  # [O, n_out, S, n_in]
    w = jnp.where((valid_s & in_range)[..., None], w, 0.0)
    return w.sum(axis=2) / count[:, None, None]  # [O, n_out, n_in]


@partial(jax.jit, static_argnames=("output_size", "spatial_scale",
                                   "sampling_ratio", "aligned"))
def roi_align(features, boxes, output_size, spatial_scale: float,
              sampling_ratio: int = -1, aligned: bool = True):
    """RoIAlign over a batch of feature maps, NHWC.

    features: [N, H, W, C]
    boxes: [N, O, 4] xyxy in *input-image* coordinates (one fixed set of O
        boxes per feature map — the static-shape analogue of torchvision's
        per-image box lists).
    Returns [N, O, out_h, out_w, C].
    """
    n_out_h, n_out_w = output_size
    N, H, W, C = features.shape
    dtype = jnp.promote_types(features.dtype, jnp.float32)
    boxes = boxes.astype(dtype)

    offset = 0.5 if aligned else 0.0
    x0 = boxes[..., 0] * spatial_scale - offset
    y0 = boxes[..., 1] * spatial_scale - offset
    x1 = boxes[..., 2] * spatial_scale - offset
    y1 = boxes[..., 3] * spatial_scale - offset
    roi_w = x1 - x0
    roi_h = y1 - y0
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)

    max_s_h = max(1, math.ceil(H / n_out_h) + 1)
    max_s_w = max(1, math.ceil(W / n_out_w) + 1)

    flat = lambda a: a.reshape(-1)
    wy = _axis_weights(flat(y0), flat(roi_h), n_out_h, H, sampling_ratio, max_s_h)
    wx = _axis_weights(flat(x0), flat(roi_w), n_out_w, W, sampling_ratio, max_s_w)
    O = boxes.shape[1]
    wy = wy.reshape(N, O, n_out_h, H)
    wx = wx.reshape(N, O, n_out_w, W)

    f = features.astype(dtype)
    # two-stage contraction: rows then columns (keeps peak memory low)
    tmp = jnp.einsum("noiy,nywc->noiwc", wy, f, preferred_element_type=jnp.float32)
    out = jnp.einsum(
        "nojw,noiwc->noijc", wx, tmp, preferred_element_type=jnp.float32
    )
    return out.astype(features.dtype)
