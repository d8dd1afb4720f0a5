"""End-to-end slot training on synthetic data over an 8-device CPU mesh."""

import numpy as np
import pytest

from focus_tpu.config import get_cfg


def tiny_steve_cfg(tmp_path):
    cfg = get_cfg()
    cfg.NUM_GPUS = 8  # use the full 8-device virtual CPU mesh
    cfg.MODEL.MODEL_NAME = "STEVE"
    cfg.MODEL.CNN_NAME = "base"
    cfg.TRAIN.METHOD = "slots"
    cfg.TRAIN.DATASET = "synthetic_video"
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TRAIN.AUTO_RESUME = False
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.SLOTS.IMG_SIZE = 32
    cfg.SLOTS.NUM_SLOTS = 3
    cfg.SLOTS.NUM_ITERS = 2
    cfg.SLOTS.SIZE = 16
    cfg.SLOTS.DIM = 16
    cfg.SLOTS.MLP_HID_SIZE = 16
    cfg.SLOTS.CNN_HID_SIZE = 8
    cfg.SLOTS.VOCAB_SIZE = 32
    cfg.SLOTS.NUM_PREDICTOR_BLOCKS = 1
    cfg.SLOTS.NUM_PREDICTOR_HEADS = 2
    cfg.SLOTS.DECODER.NUM_BLOCKS = 1
    cfg.SLOTS.DECODER.NUM_HEADS = 2
    cfg.SLOTS.DECODER.DIM = 16
    cfg.SOLVER.MAX_EPOCH = 1
    cfg.LOG_PERIOD = 2
    cfg.TENSORBOARD.ENABLE = False
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.EXP.PATH = str(tmp_path)
    cfg.DATA_LOADER.NUM_WORKERS = 2
    return cfg


def test_slot_train_one_epoch(tmp_path):
    import jax

    assert len(jax.devices()) == 8  # virtual CPU mesh
    from focus_tpu.engine.slot_trainer import slot_train

    cfg = tiny_steve_cfg(tmp_path)
    state = slot_train(cfg)
    assert int(state.step) == 64 // 8  # one epoch of synthetic train split
    # checkpoints got written
    files = list((tmp_path / "checkpoints").iterdir())
    assert any("best_model" in f.name for f in files)


def test_slot_train_loss_decreases(tmp_path):
    """Sanity: a few steps on a fixed batch reduce the loss."""
    import jax
    import jax.numpy as jnp

    from focus_tpu.engine.slot_trainer import (
        build_slot_state,
        make_train_step,
    )
    from focus_tpu.models.build import build_model
    from focus_tpu.parallel import mesh as mesh_lib

    cfg = tiny_steve_cfg(tmp_path)
    mesh = mesh_lib.build_mesh(cfg)
    model = build_model(cfg)
    video = jnp.asarray(
        np.random.RandomState(0).rand(8, 2, 32, 32, 3), jnp.float32
    )
    state = build_slot_state(cfg, model, mesh, video)
    step = make_train_step(model, cfg, mesh)
    rng = jax.random.PRNGKey(0)
    video_sh = mesh_lib.shard_batch(mesh, video)
    losses = []
    for _ in range(8):
        state, stats = step(state, video_sh, rng)
        losses.append(float(stats["loss"]))
    assert losses[-1] < losses[0], losses
