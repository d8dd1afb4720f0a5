"""FULL-model parity for the conv families against fixtures generated
from the EXECUTED reference models (scripts/make_golden_fixtures.py
gen_conv_full): SlowFast (+fusion, +dot-product nonlocal), the AVA
detection variant (res5 stride-1/dilation-2 + RoI head, reference
video_model_builder.py:159-420 + head_helper.py:11-129), X3D
(SE/swish stages, :619-761) and single-pathway slow-R50 with a softmax
nonlocal (:424-616). Weights AND randomized BN running stats flow
through the production torch importer, so stem/stage/nonlocal/head
naming, the NCDHW->NDHWC conv layout transform, and the batch_stats
mapping are all pinned by one artifact per family."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from focus_tpu.config import get_cfg  # noqa: E402

FIXDIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def load(name):
    path = os.path.join(FIXDIR, f"{name}.npz")
    if not os.path.exists(path):
        pytest.skip(f"fixture {name} missing — run scripts/make_golden_fixtures.py")
    data = dict(np.load(path))
    sd = {k[3:]: v for k, v in data.items() if k.startswith("sd/")}
    rest = {k: v for k, v in data.items() if not k.startswith("sd/")}
    return rest, sd


def slowfast_cfg(detection=False):
    """Mirror of scripts/make_golden_fixtures._slowfast_cfg."""
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "SlowFast"
    cfg.MODEL.ARCH = "slowfast"
    cfg.MODEL.NUM_CLASSES = 9
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.TRAIN_CROP_SIZE = 64
    cfg.DATA.INPUT_CHANNEL_NUM = [3, 3]
    cfg.RESNET.DEPTH = 50
    cfg.RESNET.NUM_GROUPS = 1
    cfg.RESNET.WIDTH_PER_GROUP = 8
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[3, 3], [4, 4], [6, 6], [3, 3]]
    cfg.RESNET.SPATIAL_STRIDES = [[1, 1], [2, 2], [2, 2], [2, 2]]
    cfg.RESNET.SPATIAL_DILATIONS = [[1, 1], [1, 1], [1, 1], [1, 1]]
    cfg.SLOWFAST.ALPHA = 4
    cfg.SLOWFAST.BETA_INV = 8
    cfg.SLOWFAST.FUSION_CONV_CHANNEL_RATIO = 2
    cfg.SLOWFAST.FUSION_KERNEL_SZ = 5
    cfg.NONLOCAL.LOCATION = [[[], []], [[], []], [[1], []], [[], []]]
    cfg.NONLOCAL.GROUP = [[1, 1], [1, 1], [1, 1], [1, 1]]
    cfg.NONLOCAL.INSTANTIATION = "dot_product"
    if detection:
        cfg.DETECTION.ENABLE = True
        cfg.DETECTION.ALIGNED = True
        cfg.DETECTION.ROI_XFORM_RESOLUTION = 7
        cfg.DETECTION.SPATIAL_SCALE_FACTOR = 16
        cfg.RESNET.SPATIAL_STRIDES = [[1, 1], [2, 2], [2, 2], [1, 1]]
        cfg.RESNET.SPATIAL_DILATIONS = [[1, 1], [1, 1], [1, 1], [2, 2]]
        cfg.MODEL.HEAD_ACT = "sigmoid"
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def x3d_cfg():
    """Mirror of scripts/make_golden_fixtures._x3d_cfg."""
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "X3D"
    cfg.MODEL.ARCH = "x3d"
    cfg.MODEL.NUM_CLASSES = 9
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 64
    cfg.DATA.INPUT_CHANNEL_NUM = [3]
    cfg.RESNET.DEPTH = 50
    cfg.RESNET.NUM_GROUPS = 1
    cfg.RESNET.WIDTH_PER_GROUP = 8
    cfg.RESNET.TRANS_FUNC = "x3d_transform"
    cfg.RESNET.STRIDE_1X1 = False
    cfg.RESNET.SPATIAL_DILATIONS = [[1], [1], [1], [1]]
    cfg.NONLOCAL.LOCATION = [[[]], [[]], [[]], [[]]]
    cfg.NONLOCAL.GROUP = [[1], [1], [1], [1]]
    cfg.X3D.DIM_C1 = 12
    cfg.X3D.WIDTH_FACTOR = 1.5
    cfg.X3D.DEPTH_FACTOR = 1.0
    cfg.X3D.BOTTLENECK_FACTOR = 2.25
    cfg.X3D.CHANNELWISE_3x3x3 = True
    cfg.X3D.SCALE_RES2 = False
    cfg.X3D.DIM_C5 = 64
    cfg.X3D.BN_LIN5 = False
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def slow_cfg():
    """Mirror of scripts/make_golden_fixtures._slow_cfg."""
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "slow"
    cfg.MODEL.NUM_CLASSES = 9
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 64
    cfg.DATA.INPUT_CHANNEL_NUM = [3]
    cfg.RESNET.DEPTH = 50
    cfg.RESNET.NUM_GROUPS = 1
    cfg.RESNET.WIDTH_PER_GROUP = 8
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[3], [4], [6], [3]]
    cfg.RESNET.SPATIAL_STRIDES = [[1], [2], [2], [2]]
    cfg.RESNET.SPATIAL_DILATIONS = [[1], [1], [1], [1]]
    cfg.NONLOCAL.LOCATION = [[[]], [[1]], [[]], [[]]]
    cfg.NONLOCAL.GROUP = [[1], [1], [1], [1]]
    cfg.NONLOCAL.INSTANTIATION = "softmax"
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def _import_and_apply(cfg, sd, xs, bboxes=None, atol=5e-5):
    from focus_tpu.models.build import build_model, init_model
    from focus_tpu.utils.torch_import import (
        import_torch_batch_stats,
        import_torch_params,
    )

    model = build_model(cfg)
    sample = (xs, None, bboxes) if bboxes is not None else (xs, None)
    variables = init_model(model, cfg, sample, train=False)
    params, report = import_torch_params(
        sd, variables["params"], allow_missing=False
    )
    assert not report["missing"], report["missing"]
    stats = import_torch_batch_stats(sd, variables["batch_stats"])
    # every BN leaf must have found its torch running stat — the
    # randomized buffers make a silently-unmapped leaf a loud mismatch
    args = (xs, None, bboxes) if bboxes is not None else (xs, None)
    return model.apply(
        {"params": params, "batch_stats": stats}, *args, train=False
    )


def _pathways(video_bcthw, alpha=None):
    v = video_bcthw.transpose(0, 2, 3, 4, 1)  # -> [B,T,H,W,C]
    if alpha is None:
        return [jnp.asarray(v)]
    return [jnp.asarray(v[:, ::alpha]), jnp.asarray(v)]


def test_slowfast_full_golden():
    d, sd = load("slowfast_full")
    out = _import_and_apply(slowfast_cfg(), sd, _pathways(d["video"], 4))
    np.testing.assert_allclose(np.asarray(out), d["out"], atol=5e-5)


def test_slowfast_detection_full_golden():
    d, sd = load("slowfast_det_full")
    out = _import_and_apply(
        slowfast_cfg(detection=True), sd, _pathways(d["video"], 4),
        bboxes=jnp.asarray(d["boxes"]),
    )
    np.testing.assert_allclose(
        np.asarray(out).reshape(d["out"].shape), d["out"], atol=5e-5
    )


def test_x3d_full_golden():
    d, sd = load("x3d_full")
    out = _import_and_apply(x3d_cfg(), sd, _pathways(d["video"]))
    np.testing.assert_allclose(np.asarray(out), d["out"], atol=5e-5)


def test_slow_full_golden():
    d, sd = load("slow_full")
    out = _import_and_apply(slow_cfg(), sd, _pathways(d["video"]))
    np.testing.assert_allclose(np.asarray(out), d["out"], atol=5e-5)
