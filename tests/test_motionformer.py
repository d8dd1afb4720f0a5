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


def test_cls_attention_dense_matches_head_split():
    """Native-layout CLS attention (block-diagonal contractions, no
    head-split transposes of k/v) must match the head-split form."""
    import jax.numpy as jnp
    from focus_tpu.ops import attention as attn_ops

    B, N, C, h = 2, 37, 32, 4
    hd = C // h
    scale = hd ** -0.5
    rs = np.random.RandomState(3)
    q = jnp.asarray(rs.randn(B, N, C) * 0.5, jnp.float32)
    k = jnp.asarray(rs.randn(B, N, C) * 0.5, jnp.float32)
    v = jnp.asarray(rs.randn(B, N, C) * 0.5, jnp.float32)

    split = lambda t: t.reshape(B, N, h, hd).transpose(0, 2, 1, 3).reshape(
        B * h, N, hd
    )
    qh, kh, vh = map(split, (q, k, v))
    ref = attn_ops.cls_attention(qh[:, :1], kh, vh, scale)
    ref = ref.reshape(B, h, 1, hd).transpose(0, 2, 1, 3).reshape(B, 1, C)

    out = attn_ops.cls_attention_dense(q[:, :1], k, v, scale, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_motionformer_fused_path_matches_unfused(monkeypatch):
    """Execute the model's FUSED branch on CPU (backend monkeypatched,
    kernel in interpret mode) and compare against the unfused XLA
    branch — covers the fused wiring itself: cls_attention_dense on
    native-layout q/k/v, the [B,S,C] kernel operands, and the
    cls/patch concat."""
    from focus_tpu.models.build import build_model, init_model
    from focus_tpu.ops.pallas import trajectory_block as tb

    cfg = mf_cfg()
    cfg.TPU.USE_PALLAS = True
    model = build_model(cfg)
    x, metadata = make_inputs(cfg)
    variables = init_model(model, cfg, (x, metadata))
    ref = model.apply(variables, x, metadata)  # cpu backend -> unfused

    orig_core = tb.fused_trajectory_core
    monkeypatch.setattr(
        tb, "fused_trajectory_core",
        lambda q, kf, vf, wq2, bq2, wk2, bk2, scale, heads, interpret=False:
        orig_core(q, kf, vf, wq2, bq2, wk2, bk2, scale, heads, True),
    )
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    fused = model.apply(variables, x, metadata)
    np.testing.assert_allclose(
        np.asarray(fused), np.asarray(ref), atol=2e-5
    )
