"""Motionformer model tests: plain, with ORViT layers, EK dual head."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focus_tpu.config import get_cfg


def mf_cfg(orvit_layers=(), dataset="ssv2"):
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "Motionformer"
    cfg.MODEL.NUM_CLASSES = 10
    cfg.TRAIN.DATASET = dataset
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.MF.PATCH_SIZE = 8
    cfg.MF.PATCH_SIZE_TEMP = 2
    cfg.MF.EMBED_DIM = 24
    cfg.MF.DEPTH = 3
    cfg.MF.NUM_HEADS = 2
    cfg.MF.TEMPORAL_RESOLUTION = 2
    cfg.MF.USE_MLP = True
    cfg.ORVIT.LAYERS = list(orvit_layers)
    cfg.ORVIT.O = 3
    cfg.ORVIT.ENABLE = bool(orvit_layers)
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def make_inputs(cfg, with_boxes=False):
    rs = np.random.RandomState(0)
    T = cfg.MF.TEMPORAL_RESOLUTION * cfg.MF.PATCH_SIZE_TEMP
    x = jnp.asarray(rs.rand(2, T, 32, 32, 3), jnp.float32)
    metadata = {}
    if with_boxes:
        boxes = rs.rand(2, cfg.MF.TEMPORAL_RESOLUTION, cfg.ORVIT.O, 4) * 0.4 + 0.2
        metadata["orvit_bboxes"] = jnp.asarray(boxes, jnp.float32)
    return x, metadata


def test_motionformer_forward():
    from focus_tpu.models.build import build_model, init_model

    cfg = mf_cfg()
    model = build_model(cfg)
    x, metadata = make_inputs(cfg)
    variables = init_model(model, cfg, (x, metadata))
    logits = model.apply(variables, x, metadata)
    assert logits.shape == (2, 10)
    # eval-time softmax
    np.testing.assert_allclose(np.asarray(logits.sum(-1)), 1.0, rtol=1e-4)
    # train mode returns raw logits
    logits_t = model.apply(
        variables, x, metadata, train=True,
        rngs={"dropout": jax.random.PRNGKey(0)},
    )
    assert not np.allclose(np.asarray(logits_t.sum(-1)), 1.0)


def test_motionformer_with_orvit():
    from focus_tpu.models.build import build_model, init_model

    cfg = mf_cfg(orvit_layers=[1])
    model = build_model(cfg)
    x, metadata = make_inputs(cfg, with_boxes=True)
    variables = init_model(model, cfg, (x, metadata))
    logits = model.apply(variables, x, metadata)
    assert logits.shape == (2, 10)
    assert np.isfinite(np.asarray(logits)).all()
    # ORViT params present in block 1
    assert "box_categories" in variables["params"]["blocks_1"]
    assert "motion_stream" in variables["params"]["blocks_1"]


def test_motionformer_ek_dual_head():
    from focus_tpu.models.build import build_model, init_model

    cfg = mf_cfg(dataset="epickitchens")
    model = build_model(cfg)
    x, metadata = make_inputs(cfg)
    variables = init_model(model, cfg, (x, metadata))
    first, both = model.apply(variables, x, metadata)
    assert first.shape == (2, 97)
    assert both["verb"].shape == (2, 97) and both["noun"].shape == (2, 300)


def test_pos_embed_interpolation():
    """Non-224 crops resize the spatial pos-embed (reference :1285-1300)."""
    from focus_tpu.models.motionformer import interpolate_pos_embed

    pe = jnp.asarray(np.random.RandomState(0).randn(1, 197, 8), jnp.float32)
    out = interpolate_pos_embed(pe, 49)  # 14x14 -> 7x7
    assert out.shape == (1, 50, 8)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(pe[:, 0]))
