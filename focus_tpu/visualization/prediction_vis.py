"""Wrong-prediction visualisation (counterpart of reference
``slowfast/visualization/prediction_vis.py:16``): collects misclassified
clips during eval and writes them to TensorBoard grouped by true label.
"""

from __future__ import annotations

import numpy as np

from focus_tpu.utils import logging

logger = logging.get_logger(__name__)


class WrongPredictionVis:
    def __init__(self, cfg, writer, subset=None, max_videos: int = 16):
        self.cfg = cfg
        self.writer = writer
        self.subset = set(subset) if subset else None
        self.max_videos = max_videos
        self.count = 0

    def visualize_vid(self, video, preds, labels, batch_idx: int = 0):
        """video: [B, T, H, W, C] in model-input space; preds: [B, C];
        labels: [B]."""
        if self.writer is None or self.count >= self.max_videos:
            return
        preds = np.asarray(preds)
        labels = np.asarray(labels)
        video = np.asarray(video)
        pred_ids = preds.argmax(-1)
        for i in np.nonzero(pred_ids != labels)[0]:
            if self.subset is not None and int(labels[i]) not in self.subset:
                continue
            if self.count >= self.max_videos:
                break
            vid = video[i]
            vid = (vid - vid.min()) / max(vid.max() - vid.min(), 1e-6)
            tag = (
                f"{self.cfg.TENSORBOARD.WRONG_PRED_VIS.TAG}/"
                f"true_{int(labels[i])}_pred_{int(pred_ids[i])}"
            )
            self.writer.add_video(
                vid[None].transpose(0, 1, 4, 2, 3), tag=tag,
                global_step=batch_idx,
            )
            self.count += 1

    def clean(self):
        logger.info(f"WrongPredictionVis wrote {self.count} videos")
