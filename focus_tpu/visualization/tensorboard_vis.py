"""TensorBoard writer (counterpart of reference
``slowfast/visualization/tensorboard_vis.py:20-236``). Gated: becomes a
no-op if tensorboard is unavailable so headless runs never fail."""

import os

import numpy as np

from focus_tpu.utils import logging

logger = logging.get_logger(__name__)

try:
    from torch.utils.tensorboard import SummaryWriter

    _HAS_TB = True
except Exception:  # noqa: BLE001
    _HAS_TB = False


class TensorboardWriter:
    def __init__(self, cfg):
        self.enabled = _HAS_TB and cfg.TENSORBOARD.ENABLE
        if not self.enabled:
            self.writer = None
            return
        if cfg.TENSORBOARD.LOG_DIR == "":
            log_dir = os.path.join(
                cfg.OUTPUT_DIR, "runs-{}".format(cfg.TRAIN.DATASET)
            )
        else:
            log_dir = os.path.join(cfg.OUTPUT_DIR, cfg.TENSORBOARD.LOG_DIR)
        self.writer = SummaryWriter(log_dir=log_dir)
        logger.info(f"Tensorboard visualization at {log_dir}")

    def add_scalars(self, data_dict, global_step=None):
        if self.writer is None:
            return
        for key, item in data_dict.items():
            self.writer.add_scalar(key, float(item), global_step)

    def add_video(self, vid_tensor, tag="Video Input", global_step=None, fps=4):
        """vid_tensor: numpy [B, T, C, H, W] in [0, 1]."""
        if self.writer is None:
            return
        import torch

        self.writer.add_video(
            tag, torch.from_numpy(np.asarray(vid_tensor)), global_step=global_step, fps=fps
        )

    def flush(self):
        if self.writer is not None:
            self.writer.flush()

    def close(self):
        if self.writer is not None:
            self.writer.flush()
            self.writer.close()
