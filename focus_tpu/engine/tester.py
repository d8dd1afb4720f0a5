"""Multi-view testing (counterpart of reference ``tools/test_net.py``).

Datasets replicate each video NUM_ENSEMBLE_VIEWS x NUM_SPATIAL_CROPS
times; per-clip softmax scores are ensembled per video by the TestMeter
(sum or max). No cross-process gather is needed: each process's clips
carry their global video index and the meter is reduced at the end via
process_allgather when multi-host.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from focus_tpu.datasets import loader as data_loader
from focus_tpu.engine.trainer import build_supervised_state, make_supervised_eval_step
from focus_tpu.models.build import build_model
from focus_tpu.parallel import mesh as mesh_lib
from focus_tpu.utils import checkpoint as cu
from focus_tpu.utils import logging
from focus_tpu.utils.meters import TestMeter

logger = logging.get_logger(__name__)


def _split_test_batch(batch):
    if isinstance(batch, (tuple, list)):
        if len(batch) >= 4:
            return batch[0], batch[1], batch[2], batch[3]
        if len(batch) == 3:
            return batch[0], batch[1], batch[2], {}
        return batch[0], batch[1], None, {}
    raise ValueError("test dataset must yield (video, label, index[, meta])")


def _to_host(array):
    """Fetch a (possibly multi-host-sharded) eval array to every host
    (replaces the reference's du.all_gather at test_net.py:114-117)."""
    if jax.process_count() == 1:
        return np.asarray(jax.device_get(array))
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(array, tiled=True))


def run_detection_eval(loader, state, eval_step, meter, cur_epoch=None):
    """Shared AVA detection eval loop (reference test_net.py:57-79 /
    train_net.py:330-380): buffer per-keyframe box scores + original-
    frame normalised boxes, frame-mAP under the official protocol at
    the end. Used by both the trainer's val epoch and the tester.

    Final-batch pad duplicates (the loader's index==-1 sentinel) are
    dropped before buffering — a duplicated detection of a matched box
    counts as a false positive in the greedy matcher, so without the
    filter the reported mAP would depend on batch size."""
    from focus_tpu.utils.ava_eval import make_image_key

    names = meter.video_idx_to_name or []
    for cur_iter, batch in enumerate(loader):
        video, labels, sample_idx, metadata = _split_test_batch(batch)
        meter.iter_tic()
        preds = eval_step(state, video, metadata)
        preds = preds[0] if isinstance(preds, tuple) else preds
        preds_h = _to_host(preds)
        masks_h = _to_host(metadata["boxes_mask"])
        ori_h = _to_host(metadata["ori_boxes"])
        vidx_h = _to_host(metadata["video_idx"])
        sec_h = _to_host(metadata["sec"])
        labels_h = _to_host(labels)
        if sample_idx is not None:
            keep = _to_host(sample_idx) >= 0
            preds_h, masks_h, ori_h = preds_h[keep], masks_h[keep], ori_h[keep]
            vidx_h, sec_h, labels_h = vidx_h[keep], sec_h[keep], labels_h[keep]
        keys = [
            make_image_key(
                names[int(v)] if int(v) < len(names) else str(int(v)),
                int(s),
            )
            for v, s in zip(vidx_h, sec_h)
        ]
        meter.update_stats(preds_h, ori_h, masks_h, keys, labels_h)
        meter.iter_toc()
        meter.log_iter_stats(cur_epoch, cur_iter)
    return meter.finalize_metrics()


def perform_test_detection(test_loader, state, eval_step, test_meter, cfg):
    """AVA detection testing: the shared loop above."""
    return run_detection_eval(test_loader, state, eval_step, test_meter)


def perform_test(test_loader, state, eval_step, test_meter, cfg):
    for cur_iter, batch in enumerate(test_loader):
        video, labels, video_idx, metadata = _split_test_batch(batch)
        test_meter.iter_tic()
        preds = eval_step(state, video, metadata)
        logits = preds[0] if isinstance(preds, tuple) else preds
        test_meter.update_stats(
            _to_host(logits), _to_host(labels), _to_host(video_idx)
        )
        test_meter.iter_toc()
        test_meter.log_iter_stats(cur_iter, cfg.LOG_PERIOD)
    return test_meter.finalize_metrics()


def test(cfg):
    """(reference test_net.py:160-232)"""
    mesh_lib.init_distributed(cfg)
    np.random.seed(cfg.RNG_SEED)
    logging.setup_logging(cfg.OUTPUT_DIR)
    logger.info("Test with config:")
    logger.info(cfg.dump())

    mesh = mesh_lib.build_mesh(cfg)
    model = build_model(cfg)
    data_sh = mesh_lib.batch_sharded(mesh)
    test_loader = data_loader.construct_loader(cfg, "test", sharding=data_sh)
    logger.info(f"Testing model for {len(test_loader)} iterations")

    sample = next(iter(test_loader))
    state = build_supervised_state(cfg, model, mesh, sample, 1)
    state = cu.load_test_checkpoint(cfg, state)
    state = jax.device_put(state, mesh_lib.replicated(mesh))

    eval_step = make_supervised_eval_step(model, cfg, mesh)

    if cfg.DETECTION.ENABLE:
        from focus_tpu.utils.meters import AVAMeter

        names = getattr(test_loader.dataset, "_video_idx_to_name", None)
        test_meter = AVAMeter(
            len(test_loader), cfg, "test", video_idx_to_name=names
        )
        return perform_test_detection(
            test_loader, state, eval_step, test_meter, cfg
        )

    num_clips = cfg.TEST.NUM_ENSEMBLE_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
    num_videos = len(test_loader.dataset) // num_clips
    assert len(test_loader.dataset) % num_clips == 0, (
        len(test_loader.dataset), num_clips,
    )
    if cfg.TEST.DATASET == "epickitchens":
        from focus_tpu.utils.meters import EPICTestMeter

        test_meter = EPICTestMeter(
            num_videos, num_clips, (97, 300), len(test_loader),
            cfg.DATA.ENSEMBLE_METHOD,
        )
        return perform_test_ek(test_loader, state, eval_step, test_meter, cfg)
    test_meter = TestMeter(
        num_videos,
        num_clips,
        cfg.MODEL.NUM_CLASSES,
        len(test_loader),
        cfg.DATA.MULTI_LABEL,
        cfg.DATA.ENSEMBLE_METHOD,
    )
    stats = perform_test(test_loader, state, eval_step, test_meter, cfg)
    if jax.process_index() == 0 and cfg.TENSORBOARD.ENABLE:
        # eval panels over the ensembled per-video scores (reference
        # test_net.py:139-151)
        from focus_tpu.visualization.tensorboard_vis import TensorboardWriter

        writer = TensorboardWriter(cfg)
        writer.plot_eval(test_meter.video_preds, test_meter.video_labels)
        writer.close()
    if jax.process_index() == 0 and cfg.TEST.SAVE_RESULTS_PATH:
        # (reference test_net.py:145-153): pickle of [preds, labels]
        import pickle

        save_path = os.path.join(cfg.OUTPUT_DIR, cfg.TEST.SAVE_RESULTS_PATH)
        with open(save_path, "wb") as f:
            pickle.dump(
                [np.asarray(test_meter.video_preds),
                 np.asarray(test_meter.video_labels)], f,
            )
        logger.info(f"Successfully saved prediction results to {save_path}")
    return stats


def perform_test_ek(test_loader, state, eval_step, test_meter, cfg):
    for cur_iter, batch in enumerate(test_loader):
        video, labels, video_idx, metadata = _split_test_batch(batch)
        test_meter.iter_tic()
        _, both = eval_step(state, video, metadata)
        test_meter.update_stats(
            (
                np.asarray(jax.device_get(both["verb"])),
                np.asarray(jax.device_get(both["noun"])),
            ),
            {
                "verb": np.asarray(jax.device_get(labels["verb"])),
                "noun": np.asarray(jax.device_get(labels["noun"])),
            },
            np.asarray(jax.device_get(video_idx)),
        )
        test_meter.iter_toc()
        test_meter.log_iter_stats(cur_iter, cfg.LOG_PERIOD)
    return test_meter.finalize_metrics()
