"""Model visualisation entry (counterpart of reference
``tools/visualization.py``): Grad-CAM overlays, weight histograms, and
input videos written to TensorBoard.
"""

from __future__ import annotations

import jax
import numpy as np

from focus_tpu.datasets import loader as data_loader
from focus_tpu.engine.trainer import _split_batch, build_supervised_state
from focus_tpu.models.build import build_model
from focus_tpu.parallel import mesh as mesh_lib
from focus_tpu.utils import checkpoint as cu
from focus_tpu.utils import logging
from focus_tpu.visualization.tensorboard_vis import TensorboardWriter

logger = logging.get_logger(__name__)


def visualize(cfg):
    """(reference tools/visualization.py:250-345)"""
    if not (cfg.TENSORBOARD.ENABLE and cfg.TENSORBOARD.MODEL_VIS.ENABLE):
        return
    logging.setup_logging(cfg.OUTPUT_DIR)
    mesh = mesh_lib.build_mesh(cfg)
    model = build_model(cfg)
    loader = data_loader.construct_loader(cfg, "test")
    sample = next(iter(loader))
    state = build_supervised_state(cfg, model, mesh, sample, 1)
    state = cu.load_test_checkpoint(cfg, state)
    writer = TensorboardWriter(cfg)

    if cfg.TENSORBOARD.MODEL_VIS.MODEL_WEIGHTS:
        import torch

        flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
        for path, leaf in flat[:200]:
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            if writer.writer is not None:
                writer.writer.add_histogram(
                    f"weights/{name}", torch.from_numpy(np.asarray(leaf))
                )

    if cfg.TENSORBOARD.MODEL_VIS.INPUT_VIDEO:
        video, _, _ = _split_batch(sample)
        vid = np.asarray(video if not isinstance(video, tuple) else video[-1])
        writer.add_video(
            np.clip(vid.transpose(0, 1, 4, 2, 3), 0, 1), tag="input_video"
        )

    if (
        cfg.TENSORBOARD.MODEL_VIS.GRAD_CAM.ENABLE
        and cfg.MODEL.MODEL_NAME == "Motionformer"
    ):
        from focus_tpu.visualization.gradcam import gradcam_motionformer

        video, labels, metadata = _split_batch(sample)
        variables = {"params": state.params}
        if state.batch_stats is not None:
            variables["batch_stats"] = state.batch_stats
        layer = cfg.MF.DEPTH - 1
        cams = gradcam_motionformer(
            model, variables, video, metadata, layer,
            labels=labels,
            use_labels=cfg.TENSORBOARD.MODEL_VIS.GRAD_CAM.USE_TRUE_LABEL,
        )
        cams = np.asarray(cams)  # [B, T', h, w]
        # upsample to video frames and overlay as red channel
        writer.add_video(cams[:, :, None].repeat(3, axis=2), tag="gradcam")

    writer.close()
    logger.info("Visualization done.")
