"""Forward-shape tests for the conv backbones (SlowFast/ResNet/X3D/MViT)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focus_tpu.config import get_cfg


def base_cfg():
    cfg = get_cfg()
    cfg.MODEL.NUM_CLASSES = 11
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.TRAIN_CROP_SIZE = 64
    cfg.DATA.TEST_CROP_SIZE = 64
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def run_model(cfg, inputs, metadata=None):
    from focus_tpu.models.build import build_model, init_model

    model = build_model(cfg)
    variables = init_model(model, cfg, (inputs, metadata))
    out = model.apply(variables, inputs, metadata)
    return out, variables


def test_slowfast_forward():
    cfg = base_cfg()
    cfg.MODEL.MODEL_NAME = "SlowFast"
    cfg.MODEL.ARCH = "slowfast"
    cfg.RESNET.NUM_BLOCK_TEMP_KERNEL = [[3, 3], [4, 4], [6, 6], [3, 3]]
    cfg.RESNET.SPATIAL_STRIDES = [[1, 1], [2, 2], [2, 2], [2, 2]]
    cfg.RESNET.SPATIAL_DILATIONS = [[1, 1], [1, 1], [1, 1], [1, 1]]
    cfg.NONLOCAL.LOCATION = [[[], []], [[], []], [[], []], [[], []]]
    cfg.NONLOCAL.GROUP = [[1, 1], [1, 1], [1, 1], [1, 1]]
    cfg.NONLOCAL.POOL = [
        [[1, 2, 2], [1, 2, 2]], [[1, 2, 2], [1, 2, 2]],
        [[1, 2, 2], [1, 2, 2]], [[1, 2, 2], [1, 2, 2]],
    ]
    rs = np.random.RandomState(0)
    slow = jnp.asarray(rs.rand(2, 1, 64, 64, 3), jnp.float32)
    fast = jnp.asarray(rs.rand(2, 8, 64, 64, 3), jnp.float32)
    out, _ = run_model(cfg, [slow, fast])
    assert out.shape == (2, 11)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, rtol=1e-4)


def test_resnet_slow_forward():
    cfg = base_cfg()
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "slow"
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, 4, 64, 64, 3), jnp.float32)
    cfg.DATA.NUM_FRAMES = 4
    out, _ = run_model(cfg, [x])
    assert out.shape == (2, 11)


def test_resnet_i3d_nonlocal_forward():
    cfg = base_cfg()
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "i3d"
    cfg.DATA.NUM_FRAMES = 8
    cfg.NONLOCAL.LOCATION = [[[]], [[1]], [[]], [[]]]
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, 8, 64, 64, 3), jnp.float32)
    out, variables = run_model(cfg, [x])
    assert out.shape == (2, 11)
    assert "pathway0_nonlocal1" in variables["params"]["s3"]


def test_x3d_forward():
    cfg = base_cfg()
    cfg.MODEL.MODEL_NAME = "X3D"
    cfg.MODEL.ARCH = "x3d"
    cfg.RESNET.TRANS_FUNC = "x3d_transform"
    cfg.DATA.NUM_FRAMES = 4
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, 4, 64, 64, 3), jnp.float32)
    out, _ = run_model(cfg, [x])
    assert out.shape == (2, 11)


def test_mvit_forward():
    cfg = base_cfg()
    cfg.MODEL.MODEL_NAME = "MViT"
    cfg.MODEL.ARCH = "mvit"
    cfg.DATA.NUM_FRAMES = 4
    cfg.MVIT.EMBED_DIM = 24
    cfg.MVIT.NUM_HEADS = 2
    cfg.MVIT.DEPTH = 4
    cfg.MVIT.DIM_MUL = [[1, 2.0]]
    cfg.MVIT.HEAD_MUL = [[1, 2.0]]
    cfg.MVIT.POOL_Q_STRIDE = [[1, 1, 2, 2]]
    cfg.MVIT.POOL_KVQ_KERNEL = [3, 3, 3]
    cfg.MVIT.POOL_KV_STRIDE_ADAPTIVE = [1, 4, 4]
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(2, 4, 64, 64, 3), jnp.float32)
    out, _ = run_model(cfg, x)
    assert out.shape == (2, 11)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, rtol=1e-4)


def test_subbn_and_sync_bn_modes():
    from focus_tpu.models.norms import SubBatchNorm

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(8, 2, 4, 4, 6), jnp.float32)
    m = SubBatchNorm(num_splits=2)
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    y, new_vars = m.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    assert y.shape == x.shape
    # eval path with aggregated stats
    merged = {"params": variables["params"], **new_vars}
    y_eval = m.apply(merged, x, train=False)
    assert np.isfinite(np.asarray(y_eval)).all()


def test_pack_pathway_output():
    from focus_tpu.datasets.utils import pack_pathway_output

    cfg = base_cfg()
    cfg.MODEL.ARCH = "slowfast"
    frames = np.random.RandomState(0).rand(8, 16, 16, 3).astype(np.float32)
    slow, fast = pack_pathway_output(cfg, frames)
    assert fast.shape == (8, 16, 16, 3)
    assert slow.shape == (1, 16, 16, 3)
    cfg.MODEL.ARCH = "slow"
    (single,) = pack_pathway_output(cfg, frames)
    assert single.shape == frames.shape
