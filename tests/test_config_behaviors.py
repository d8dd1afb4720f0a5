"""Config keys wired by the round-3 config-surface audit: behaviors the
reference honors that were previously accepted-but-ignored here."""

import math

import jax
import numpy as np

from focus_tpu.config import get_cfg
from focus_tpu.datasets.decoder import get_start_end_idx


def test_use_offset_sampling_matches_reference_formula():
    """reference decoder.py:53-68: center the single test clip; space
    num_clips inclusively across the full span."""
    video, clip = 300, 64.0
    delta = video - clip
    # single view: centered
    s, e = get_start_end_idx(video, clip, 0, 1, use_offset=True)
    assert s == math.floor(delta / 2)
    # multi view: inclusive spacing touches the end of the span
    n = 5
    starts = [
        get_start_end_idx(video, clip, i, n, use_offset=True)[0]
        for i in range(n)
    ]
    assert starts[0] == 0
    assert starts[-1] == (n - 1) * math.floor(delta / (n - 1))
    # default path unchanged
    s0, _ = get_start_end_idx(video, clip, 0, n)
    assert s0 == 0.0
    s_last, _ = get_start_end_idx(video, clip, n - 1, n)
    assert s_last == delta * (n - 1) / n


def _resnet_cfg(zero_final):
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "slow"
    cfg.MODEL.NUM_CLASSES = 7
    cfg.RESNET.ZERO_INIT_FINAL_BN = zero_final
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def test_zero_init_final_bn():
    """RESNET.ZERO_INIT_FINAL_BN zeroes the residual transforms' last BN
    scale (reference weight_init_helper.py transform_final_bn) so every
    block starts as identity; other BN scales stay at one."""
    from focus_tpu.models.build import build_model, init_model

    video = np.zeros((1, 4, 32, 32, 3), np.float32)
    for flag in (True, False):
        cfg = _resnet_cfg(flag)
        model = build_model(cfg)
        variables = init_model(model, cfg, (video, {}))
        finals, others = [], []
        for path, leaf in jax.tree_util.tree_leaves_with_path(
            variables["params"]
        ):
            name = jax.tree_util.keystr(path)
            if name.endswith("['scale']") and "bn" in name:
                (finals if ("c_bn" in name or
                            ("b_bn" in name and "branch2" not in name))
                 else others).append(float(np.abs(np.asarray(leaf)).max()))
        assert finals, "no final-BN scales found"
        if flag:
            assert max(finals) == 0.0, max(finals)
        else:
            assert min(finals) == 1.0
        assert others and min(others) == 1.0


def test_zero_init_orvit_add_layers():
    """ORVIT.ZERO_INIT_ORVIT zeroes the residually-added ORViT blocks
    (MViT ADD_LAYERS; reference build.py:66-68) so the model starts as
    the plain backbone."""
    from focus_tpu.models.build import build_model, init_model, \
        maybe_zero_init_orvit

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "MViT"
    cfg.MODEL.ARCH = "mvit"
    cfg.MODEL.NUM_CLASSES = 7
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.MVIT.EMBED_DIM = 24
    cfg.MVIT.NUM_HEADS = 2
    cfg.MVIT.DEPTH = 2
    cfg.MVIT.PATCH_PADDING = [1, 3, 3]
    cfg.ORVIT.ENABLE = True
    cfg.ORVIT.LAYERS = []
    cfg.ORVIT.ADD_LAYERS = [1]
    cfg.ORVIT.O = 2
    cfg.ORVIT.ZERO_INIT_ORVIT = True
    cfg.TPU.COMPUTE_DTYPE = "float32"
    model = build_model(cfg)
    video = np.zeros((1, 4, 32, 32, 3), np.float32)
    boxes = np.zeros((1, 4, 2, 4), np.float32)
    variables = init_model(model, cfg, (video, {"orvit_bboxes": boxes}))
    params = maybe_zero_init_orvit(cfg, variables["params"])
    orvit_leaves, other_nonzero = 0, 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = jax.tree_util.keystr(path)
        arr = np.asarray(leaf)
        if "orvit_blocks_" in name:
            orvit_leaves += 1
            assert np.abs(arr).max() == 0.0, name
        elif np.abs(arr).max() > 0:
            other_nonzero += 1
    assert orvit_leaves > 0 and other_nonzero > 0


def test_mvit_zero_decay_pos_cls_gate():
    from focus_tpu.engine.trainer import _no_wd_paths

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "MViT"
    cfg.MVIT.ZERO_DECAY_POS_CLS = False
    assert _no_wd_paths(cfg) == ()
    cfg.MVIT.ZERO_DECAY_POS_CLS = True
    assert "pos_embed" in _no_wd_paths(cfg)
    cfg.MODEL.MODEL_NAME = "Motionformer"
    cfg.MVIT.ZERO_DECAY_POS_CLS = False  # MF exclusion is unconditional
    assert "pos_embed" in _no_wd_paths(cfg)
