"""Trainer feature tests: device mixup, precise BN, supervised train with
ResNet (BN stats update), multigrid schedule generation."""

import jax
import jax.numpy as jnp
import numpy as np

from focus_tpu.config import get_cfg


def test_device_mixup_soft_labels():
    from focus_tpu.engine.trainer import _device_mixup

    cfg = get_cfg()
    cfg.NUM_GPUS = 8  # use the full 8-device virtual CPU mesh
    cfg.MODEL.NUM_CLASSES = 5
    cfg.MIXUP.ALPHA = 0.8
    cfg.MIXUP.CUTMIX_ALPHA = 1.0
    cfg.MIXUP.PROB = 1.0
    video = jnp.asarray(np.random.RandomState(0).rand(4, 2, 8, 8, 3), jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3], jnp.int32)
    out_video, soft = _device_mixup(jax.random.PRNGKey(0), video, labels, cfg)
    assert out_video.shape == video.shape
    assert soft.shape == (4, 5)
    np.testing.assert_allclose(np.asarray(soft.sum(-1)), 1.0, rtol=1e-5)


def test_multigrid_schedule():
    from focus_tpu.utils.multigrid import MultigridSchedule, get_current_long_cycle_shape

    cfg = get_cfg()
    cfg.NUM_GPUS = 8  # use the full 8-device virtual CPU mesh
    cfg.MULTIGRID.LONG_CYCLE = True
    cfg.SOLVER.STEPS = [0, 16, 24]
    cfg.SOLVER.LRS = [1, 0.1, 0.01]
    cfg.SOLVER.MAX_EPOCH = 32
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.DATA.NUM_FRAMES = 8
    cfg.DATA.TRAIN_CROP_SIZE = 64
    mg = MultigridSchedule()
    cfg = mg.init_multigrid(cfg)
    assert mg.schedule is not None and len(mg.schedule) > 4
    # shapes shrink early, return to full size at the end
    first = get_current_long_cycle_shape(mg.schedule, 0)
    last = mg.schedule[-1][1]
    assert first[1] < 8 or first[2] < 64
    assert last[1] == 8 and last[2] == 64
    cfg2, changed = mg.update_long_cycle(cfg, 0)
    assert changed
    assert cfg2.DATA.NUM_FRAMES == first[1]


def test_precise_bn_on_resnet(tmp_path):
    from focus_tpu.engine.precise_bn import compute_precise_bn_stats
    from focus_tpu.engine.trainer import _split_batch, build_supervised_state
    from focus_tpu.models.build import build_model
    from focus_tpu.parallel import mesh as mesh_lib

    cfg = get_cfg()
    cfg.NUM_GPUS = 8  # use the full 8-device virtual CPU mesh
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "slow"
    cfg.MODEL.NUM_CLASSES = 4
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.RESNET.DEPTH = 50
    cfg.TPU.COMPUTE_DTYPE = "float32"
    mesh = mesh_lib.build_mesh(cfg)
    model = build_model(cfg)
    rs = np.random.RandomState(0)

    def batches():
        for i in range(3):
            video = [rs.rand(8, 2, 32, 32, 3).astype(np.float32)]
            labels = (np.arange(8) % 4).astype(np.int32)
            yield (video, labels, np.arange(8, dtype=np.int32), {})

    sample = next(batches())
    state = build_supervised_state(cfg, model, mesh, sample, 3)
    before = jax.tree_util.tree_leaves(state.batch_stats)[0]
    state2 = compute_precise_bn_stats(model, state, batches(), 3, _split_batch)
    after = jax.tree_util.tree_leaves(state2.batch_stats)[0]
    assert not np.allclose(np.asarray(before), np.asarray(after))
    assert np.isfinite(
        np.concatenate([np.ravel(x) for x in jax.tree_util.tree_leaves(state2.batch_stats)])
    ).all()
