"""AVA-style detection path: SlowFast + RoI head train/eval on synthetic
padded-box batches over the CPU mesh."""

import jax
import numpy as np

from focus_tpu.config import get_cfg


def detection_cfg():
    cfg = get_cfg()
    cfg.NUM_GPUS = 8  # use the full 8-device virtual CPU mesh
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "slow"
    cfg.MODEL.NUM_CLASSES = 6
    cfg.MODEL.LOSS_FUNC = "bce"
    cfg.MODEL.HEAD_ACT = "sigmoid"
    cfg.DETECTION.ENABLE = True
    cfg.DETECTION.SPATIAL_SCALE_FACTOR = 16
    cfg.DETECTION.ROI_XFORM_RESOLUTION = 7
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 64
    cfg.TPU.COMPUTE_DTYPE = "float32"
    return cfg


def make_batch(B=8, O=5, num_classes=6):
    rs = np.random.RandomState(0)
    video = [rs.rand(B, 4, 64, 64, 3).astype(np.float32)]
    boxes = rs.rand(B, O, 4).astype(np.float32) * 32
    boxes[..., 2:] += boxes[..., :2]
    labels = (rs.rand(B, O, num_classes) > 0.7).astype(np.int32)
    mask = np.ones((B, O), np.float32)
    mask[:, -1] = 0.0  # padded slot
    metadata = {
        "boxes": boxes,
        "boxes_mask": mask,
        "ori_boxes": boxes / 64.0,
        "video_idx": np.zeros(B, np.int32),
        "sec": np.zeros(B, np.int32),
    }
    return (video, labels, np.arange(B, dtype=np.int32), metadata)


def test_detection_train_and_eval_step():
    from focus_tpu.engine.trainer import (
        build_supervised_state,
        make_supervised_eval_step,
        make_supervised_train_step,
    )
    from focus_tpu.models import losses as losses_lib
    from focus_tpu.parallel import mesh as mesh_lib
    from focus_tpu.models.build import build_model

    cfg = detection_cfg()
    mesh = mesh_lib.build_mesh(cfg)
    model = build_model(cfg)
    batch = make_batch(num_classes=cfg.MODEL.NUM_CLASSES)
    state = build_supervised_state(cfg, model, mesh, batch, 2)
    train_step = make_supervised_train_step(
        model, cfg, mesh, losses_lib.get_loss_func(cfg)
    )
    video, labels, _, metadata = batch
    sharded = mesh_lib.shard_batch(mesh, (video, labels, metadata))
    losses = []
    for _ in range(3):
        state, stats = train_step(
            state, sharded[0], sharded[1], sharded[2], jax.random.PRNGKey(0)
        )
        losses.append(float(stats["loss"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]

    eval_step = make_supervised_eval_step(model, cfg, mesh)
    preds = eval_step(state, sharded[0], sharded[2])
    assert preds.shape == (8, 5, cfg.MODEL.NUM_CLASSES)
    p = np.asarray(jax.device_get(preds))
    assert (p >= 0).all() and (p <= 1).all()  # sigmoid head

    # feed the AVA meter end to end
    from focus_tpu.utils.meters import AVAMeter

    meter = AVAMeter(1, cfg, "test")
    keys = [f"vid0,{i}" for i in range(8)]
    meter.update_stats(
        p, metadata["ori_boxes"], metadata["boxes_mask"], keys, labels
    )
    result = meter.finalize_metrics()
    assert 0.0 <= result["map"] <= 1.0
