"""Wrong-prediction visualisation (counterpart of reference
``slowfast/visualization/prediction_vis.py:16-120``): collects
misclassified clips during an eval sweep and writes them to TensorBoard
with the predicted label drawn on the frames.
"""

from __future__ import annotations

import numpy as np

from focus_tpu.datasets import utils as data_utils
from focus_tpu.utils import logging
from focus_tpu.visualization.video_visualizer import (
    VideoVisualizer,
    get_class_names,
)

logger = logging.get_logger(__name__)


class WrongPredictionVis:
    """Mirrors the reference class: an optional true-label subset
    (``WRONG_PRED_VIS.SUBSET_PATH``), a running set of class ids the
    model got wrong, and per-video TB panels tagged
    ``{TAG}/Video {i}, Pathway {p}: {true class name}`` with the
    predicted label overlaid via ``VideoVisualizer``
    (reference prediction_vis.py:46-120)."""

    def __init__(self, cfg, writer, max_videos: int = 32):
        self.cfg = cfg
        self.writer = writer
        self.max_videos = max_videos
        names, _, subset = get_class_names(
            cfg.TENSORBOARD.CLASS_NAMES_PATH,
            subset_path=cfg.TENSORBOARD.WRONG_PRED_VIS.SUBSET_PATH,
        )
        self.class_names = names or [
            str(i) for i in range(cfg.MODEL.NUM_CLASSES)
        ]
        self.subset = set(subset) if subset else None
        self.video_vis = VideoVisualizer(
            cfg.MODEL.NUM_CLASSES,
            cfg.TENSORBOARD.CLASS_NAMES_PATH,
            1,
            cfg.TENSORBOARD.MODEL_VIS.COLORMAP,
        )
        self.tag = cfg.TENSORBOARD.WRONG_PRED_VIS.TAG
        self.model_incorrect_classes = set()
        self.count = 0

    def _pick_wrong_preds(self, labels, preds):
        """Boolean mask of wrong predictions restricted to the subset;
        also accumulates ``model_incorrect_classes``
        (reference prediction_vis.py:46-70)."""
        pred_ids = preds.argmax(-1)
        mask = pred_ids != labels
        if self.subset is not None:
            mask &= np.asarray(
                [int(l) in self.subset for l in labels], bool
            )
        for lbl in labels[mask]:
            self.model_incorrect_classes.add(int(lbl))
        return mask

    def visualize_vid(self, video, preds, labels, batch_idx: int = 0):
        """video: [B, T, H, W, C] model-input tensor (or a per-pathway
        list of them); preds: [B, num_classes]; labels: [B]."""
        preds = np.asarray(preds)
        labels = np.asarray(labels)
        pathways = video if isinstance(video, (list, tuple)) else [video]
        pathways = [np.asarray(v) for v in pathways]
        mask = self._pick_wrong_preds(labels, preds)
        if self.writer is None:
            return
        for i in np.nonzero(mask)[0]:
            if self.count >= self.max_videos:
                break
            cur_idx = batch_idx * len(pathways[0]) + int(i)
            for p, vid_batch in enumerate(pathways):
                vid = data_utils.revert_tensor_normalize(
                    vid_batch[i], self.cfg.DATA.MEAN, self.cfg.DATA.STD
                )
                vid = (np.clip(vid, 0.0, 1.0) * 255).astype(np.uint8)
                drawn = self.video_vis.draw_clip_range(
                    vid, preds[i], draw_range=[0, len(vid) - 1]
                )
                drawn = np.stack(
                    [np.asarray(f) for f in drawn]
                ).astype(np.float32) / 255.0
                tag = (
                    f"{self.tag}/Video {cur_idx}, Pathway {p}: "
                    f"{self.class_names[int(labels[i])]}"
                )
                self.writer.add_video(
                    drawn[None].transpose(0, 1, 4, 2, 3), tag=tag,
                    global_step=batch_idx,
                )
            self.count += 1

    def clean(self):
        logger.info(
            "Class indices with wrong predictions: %s",
            sorted(self.model_incorrect_classes),
        )
        logger.info("WrongPredictionVis wrote %d videos", self.count)
