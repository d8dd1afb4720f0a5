"""Regression tests for the round-2 detection-eval review findings:
ori_boxes coordinate space, pad-duplicate filtering, multi-label
confusion matrix."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import synthetic_data as synth  # noqa: E402


def _ava_cfg(root, crop):
    from focus_tpu.config import get_cfg

    cfg = get_cfg()
    cfg.DETECTION.ENABLE = True
    cfg.AVA.FRAME_DIR = os.path.join(root, "frames")
    cfg.AVA.FRAME_LIST_DIR = os.path.join(root, "frame_lists")
    cfg.AVA.ANNOTATION_DIR = os.path.join(root, "annotations")
    cfg.AVA.TRAIN_GT_BOX_LISTS = ["gt_train.csv"]
    cfg.AVA.TRAIN_PREDICT_BOX_LISTS = ["person_box_train.csv"]
    cfg.AVA.TEST_PREDICT_BOX_LISTS = ["person_box_val.csv"]
    cfg.AVA.DETECTION_SCORE_THRESH = 0.5
    cfg.MODEL.NUM_CLASSES = 4
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TEST_CROP_SIZE = crop
    cfg.DATA.TRAIN_JITTER_SCALES = [crop, crop]
    cfg.DATA.TRAIN_CROP_SIZE = crop
    return cfg


def test_ava_ori_boxes_are_original_frame_coords(tmp_path):
    """ori_boxes must stay in the official CSV's original-frame
    normalised coordinates even when the eval pipeline rescales and
    center-crops the frames (crop 48 of a 64px source would shift every
    coordinate if ori_boxes were taken post-crop)."""
    from focus_tpu.datasets.ava_dataset import Ava

    root = str(tmp_path / "ava")
    synth.make_ava_tree(root, num_videos=1, num_frames=70, size=64,
                        num_classes=4)
    cfg = _ava_cfg(root, crop=48)
    ds = Ava(cfg, "test")
    _, _, _, meta = ds[0]
    csv_box = None
    import csv

    with open(os.path.join(root, "annotations", "person_box_val.csv")) as f:
        for row in csv.reader(f):
            if row[0] == "vid0" and int(row[1]) == 902:
                csv_box = [float(v) for v in row[2:6]]
                break
    assert csv_box is not None
    got = meta["ori_boxes"][meta["boxes_mask"] > 0][0]
    np.testing.assert_allclose(got, csv_box, atol=1e-5)


def test_detection_eval_skips_pad_duplicates():
    """run_detection_eval must drop loader pad rows (index == -1) so
    each keyframe's boxes are buffered exactly once."""
    from focus_tpu.engine.tester import run_detection_eval

    class Meter:
        video_idx_to_name = ["vid0"]

        def __init__(self):
            self.keys = []

        def iter_tic(self):
            pass

        def iter_toc(self):
            pass

        def log_iter_stats(self, *a):
            pass

        def update_stats(self, preds, ori, masks, keys, labels):
            self.keys.extend(keys)

        def finalize_metrics(self):
            return None

    B, O, C = 4, 2, 4
    meta = {
        "boxes_mask": np.ones((B, O), np.float32),
        "ori_boxes": np.zeros((B, O, 4), np.float32),
        "video_idx": np.zeros((B,), np.int32),
        "sec": np.arange(902, 902 + B, dtype=np.int32),
    }
    # final batch: last two rows are pad duplicates of row 1
    sample_idx = np.array([0, 1, -1, -1], np.int32)
    batch = (np.zeros((B, 2, 8, 8, 3), np.float32),
             np.zeros((B, O, C), np.int32), sample_idx, meta)
    meter = Meter()
    run_detection_eval(
        [batch], state=None,
        eval_step=lambda s, v, m: np.zeros((B, O, C), np.float32),
        meter=meter,
    )
    assert len(meter.keys) == 2  # pads dropped


def test_confusion_matrix_multilabel():
    from focus_tpu.visualization.tensorboard_vis import get_confusion_matrix

    preds = np.array([[0.9, 0.1, 0.0], [0.1, 0.8, 0.1]])
    labels = np.array([[1, 0, 1], [0, 1, 0]])  # multi-hot
    cm = get_confusion_matrix(preds, labels, 3)
    # sample 0 predicted class 0; true classes 0 and 2 each get a count
    assert cm[0, 0] == 1.0 and cm[2, 0] == 1.0
    assert cm[1, 1] == 1.0
