"""Numerics tests for the ORViT op rebuild: RoIAlign, layout splat,
trajectory attention — each validated against a naive implementation of
the reference semantics (torchvision is unavailable, so the references
are transcribed here from the documented algorithms)."""

import jax.numpy as jnp
import numpy as np
import pytest


# ---- naive torchvision roi_align (aligned=True) ---------------------------

def naive_roi_align(feat, boxes, out_h, out_w, spatial_scale, sampling_ratio,
                    aligned=True):
    """feat: [H, W, C]; boxes: [O, 4] xyxy image coords -> [O, out_h, out_w, C]."""
    H, W, C = feat.shape
    out = np.zeros((len(boxes), out_h, out_w, C), np.float64)

    def bilinear(y, x):
        if y < -1.0 or y > H or x < -1.0 or x > W:
            return np.zeros(C)
        y = min(max(y, 0.0), H - 1)
        x = min(max(x, 0.0), W - 1)
        y0, x0 = int(y), int(x)
        y1, x1 = min(y0 + 1, H - 1), min(x0 + 1, W - 1)
        ly, lx = y - y0, x - x0
        return (
            feat[y0, x0] * (1 - ly) * (1 - lx)
            + feat[y0, x1] * (1 - ly) * lx
            + feat[y1, x0] * ly * (1 - lx)
            + feat[y1, x1] * ly * lx
        )

    off = 0.5 if aligned else 0.0
    for o, (bx0, by0, bx1, by1) in enumerate(boxes):
        x0 = bx0 * spatial_scale - off
        y0 = by0 * spatial_scale - off
        roi_w = bx1 * spatial_scale - off - x0
        roi_h = by1 * spatial_scale - off - y0
        if not aligned:
            roi_w, roi_h = max(roi_w, 1.0), max(roi_h, 1.0)
        bin_h, bin_w = roi_h / out_h, roi_w / out_w
        gh = sampling_ratio if sampling_ratio > 0 else int(np.ceil(max(bin_h, 1e-9)))
        gw = sampling_ratio if sampling_ratio > 0 else int(np.ceil(max(bin_w, 1e-9)))
        gh, gw = max(gh, 1), max(gw, 1)
        for i in range(out_h):
            for j in range(out_w):
                acc = np.zeros(C)
                for sy in range(gh):
                    for sx in range(gw):
                        y = y0 + i * bin_h + (sy + 0.5) * bin_h / gh
                        x = x0 + j * bin_w + (sx + 0.5) * bin_w / gw
                        acc += bilinear(y, x)
                out[o, i, j] = acc / (gh * gw)
    return out


@pytest.mark.parametrize("sampling_ratio", [-1, 1, 2])
def test_roi_align_matches_naive(sampling_ratio):
    from focus_tpu.ops.roi_align import roi_align

    rs = np.random.RandomState(0)
    H = W = 14
    feat = rs.randn(1, H, W, 5).astype(np.float32)
    boxes = np.array(
        [
            [10.0, 20.0, 150.0, 200.0],
            [0.0, 0.0, 224.0, 224.0],
            [50.0, 60.0, 70.0, 100.0],
            [0.0, 0.0, 0.0, 0.0],  # empty box
            [-10.0, -10.0, 30.0, 30.0],  # out of bounds
        ],
        np.float32,
    )[None]
    ours = np.asarray(
        roi_align(jnp.asarray(feat), jnp.asarray(boxes), (H, W),
                  spatial_scale=H / 224.0, sampling_ratio=sampling_ratio)
    )
    ref = naive_roi_align(
        feat[0].astype(np.float64), boxes[0], H, W, H / 224.0, sampling_ratio
    )
    np.testing.assert_allclose(ours[0], ref, atol=1e-4)


def test_roi_align_detection_head_shape():
    """AVA head config: 7x7 output from a 14x14 map, scale 1/16."""
    from focus_tpu.ops.roi_align import roi_align

    rs = np.random.RandomState(1)
    feat = rs.randn(2, 14, 14, 8).astype(np.float32)
    boxes = rs.rand(2, 3, 4).astype(np.float32) * 100
    boxes[..., 2:] += boxes[..., :2]  # ensure x1>x0, y1>y0
    out = roi_align(jnp.asarray(feat), jnp.asarray(boxes), (7, 7), 1 / 16.0)
    assert out.shape == (2, 3, 7, 7, 8)
    ref = naive_roi_align(feat[0].astype(np.float64), boxes[0], 7, 7, 1 / 16.0, -1)
    np.testing.assert_allclose(np.asarray(out)[0], ref, atol=1e-4)


# ---- layout splat vs reference grid_sample path ---------------------------

def torch_reference_layout(vecs, boxes_cxcywh, H, W):
    """Direct transcription of reference box2spatial_layout + boxes_to_layout
    (ORViT/utils.py:8-28, layout.py:28-63) using torch.grid_sample."""
    import torch
    import torch.nn.functional as F

    BS, T, O, d = vecs.shape
    out = np.zeros((BS, T, H, W, d), np.float32)
    for b in range(BS):
        for t in range(T):
            cxcywh = boxes_cxcywh[b, t]
            xyxy = np.concatenate(
                [
                    cxcywh[:, :2] - cxcywh[:, 2:] / 2,
                    cxcywh[:, :2] + cxcywh[:, 2:] / 2,
                ],
                axis=1,
            )
            legal = (xyxy != 0).any(axis=1)
            bx = torch.from_numpy(xyxy[legal])
            v = torch.from_numpy(vecs[b, t][legal])
            if len(bx) == 0:
                continue
            Ol = len(bx)
            x0, y0 = bx[:, 0].view(-1, 1, 1), bx[:, 1].view(-1, 1, 1)
            # reference quirk: ww/hh are taken from xyxy slots 2/3 (= x1/y1)
            ww, hh = bx[:, 2].view(-1, 1, 1), bx[:, 3].view(-1, 1, 1)
            X = torch.linspace(0, 1, W).view(1, 1, W)
            Y = torch.linspace(0, 1, H).view(1, H, 1)
            Xg = ((X - x0) / ww).expand(Ol, H, W)
            Yg = ((Y - y0) / hh).expand(Ol, H, W)
            grid = torch.stack([Xg, Yg], dim=3) * 2 - 1
            img = v.view(Ol, d, 1, 1).expand(Ol, d, 8, 8)
            sampled = F.grid_sample(img.float(), grid.float(), align_corners=True)
            out[b, t] = sampled.sum(0).permute(1, 2, 0).numpy()
    return out


def test_layout_matches_reference_grid_sample():
    pytest.importorskip("torch")
    from focus_tpu.ops.layout import box2spatial_layout

    rs = np.random.RandomState(0)
    BS, T, O, d, H, W = 2, 3, 4, 6, 14, 14
    vecs = rs.randn(BS, T, O, d).astype(np.float32)
    boxes = rs.rand(BS, T, O, 4).astype(np.float32) * 0.5 + 0.1
    boxes[0, 0, 2] = 0.0  # an empty box
    ref = torch_reference_layout(vecs, boxes, H, W)
    ours = np.asarray(box2spatial_layout(jnp.asarray(boxes), jnp.asarray(vecs), H, W))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


# ---- trajectory attention vs numpy transcription --------------------------

def numpy_trajectory_attention(x, wqkv, bqkv, wq2, bq2, wkv2, bkv2, wp, bp,
                               F_, h, use_original_code=True):
    """Transcription of reference attention.py:499-557 in numpy."""

    def softmax(a, axis):
        a = a - a.max(axis=axis, keepdims=True)
        e = np.exp(a)
        return e / e.sum(axis=axis, keepdims=True)

    B, N, C = x.shape
    hd = C // h
    scale = hd ** -0.5
    qkv = x @ wqkv + bqkv
    q, k, v = np.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(B, -1, h, hd).transpose(0, 2, 1, 3).reshape(B * h, -1, hd)

    q, k, v = map(heads, (q, k, v))
    cls_q, q_ = q[:, :1], q[:, 1:]
    k_, v_ = k[:, 1:], v[:, 1:]
    # CLS attends to all
    sim = (cls_q * scale) @ k.transpose(0, 2, 1)
    cls_out = softmax(sim, -1) @ v
    cls_out = cls_out.reshape(B, h, 1, hd).transpose(0, 2, 1, 3).reshape(B, 1, C)

    S = q_.shape[1]
    P = S // F_
    qk = q_ @ k_.transpose(0, 2, 1)
    qk = qk.reshape(B * h, S, F_, P)
    attn = softmax(qk * scale, -1)
    vf = v_.reshape(B * h, F_, P, hd)
    xs = np.einsum("bqfn,bfnd->bqfd", attn, vf)
    xs = xs.reshape(B, h, S, F_, hd).transpose(0, 2, 3, 1, 4).reshape(B, S, F_, C)

    xg = xs.reshape(B, F_, P, F_, C)
    x_diag = np.stack([xg[:, g, :, g] for g in range(F_)], axis=1).reshape(B, S, C)
    q2 = x_diag @ wq2 + bq2
    kv2 = xs @ wkv2 + bkv2
    k2, v2 = np.split(kv2, 2, axis=-1)
    q2h = q2.reshape(B, S, h, hd) * scale
    k2h = k2.reshape(B, S, F_, h, hd)
    a2 = softmax(np.einsum("bshd,bsfhd->bhsf", q2h, k2h), -1)
    src = xs if use_original_code else v2
    srch = src.reshape(B, S, F_, h, hd)
    out = np.einsum("bhsf,bsfhd->bshd", a2, srch).reshape(B, S, C)
    out = np.concatenate([cls_out, out], axis=1)
    return out @ wp + bp


@pytest.mark.parametrize("use_original_code", [True, False])
def test_trajectory_attention_matches_numpy(use_original_code):
    import jax

    from focus_tpu.models.motionformer import TrajectoryAttention

    rs = np.random.RandomState(0)
    B, F_, P, C, h = 2, 3, 4, 16, 4
    N = 1 + F_ * P
    x = rs.randn(B, N, C).astype(np.float32)
    mod = TrajectoryAttention(C, h, qkv_bias=True,
                              use_original_code=use_original_code)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), (F_, P, 1))
    p = variables["params"]
    out, _ = mod.apply(variables, jnp.asarray(x), (F_, P, 1))

    g = lambda n: np.asarray(p[n]["kernel"]),
    ref = numpy_trajectory_attention(
        x,
        np.asarray(p["qkv"]["kernel"]), np.asarray(p["qkv"]["bias"]),
        np.asarray(p["proj_q"]["kernel"]), np.asarray(p["proj_q"]["bias"]),
        np.asarray(p["proj_kv"]["kernel"]), np.asarray(p["proj_kv"]["bias"]),
        np.asarray(p["proj"]["kernel"]), np.asarray(p["proj"]["bias"]),
        F_, h, use_original_code,
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)
