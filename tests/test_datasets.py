"""Dataset tests: SSv2 with synthetic on-disk tree, transforms, randaug."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from focus_tpu.config import get_cfg


from synthetic_data import make_ssv2_tree  # noqa: E402 — shared fixture generators


@pytest.fixture()
def ssv2_cfg(tmp_path):
    root = str(tmp_path / "ssv2")
    make_ssv2_tree(root)
    cfg = get_cfg()
    cfg.SSV2.DATA_ROOT = root
    cfg.SSV2.SPLITS_ROOT = root
    cfg.SSV2.SPLIT = "standard"
    cfg.MODEL.ARCH = "mvit"  # single pathway
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_JITTER_SCALES = [40, 56]
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.ORVIT.ENABLE = True
    cfg.ORVIT.O = 4
    cfg.AUG.ENABLE = False
    return cfg


def test_ssv2_train_item(ssv2_cfg):
    from focus_tpu.datasets.build import build_dataset

    ds = build_dataset("ssv2", ssv2_cfg, "train")
    assert len(ds) == 3
    video, label, idx, meta = ds[0]
    assert video.shape == (4, 32, 32, 3)
    boxes = meta["orvit_bboxes"]
    assert boxes.shape == (4, 4, 4)
    assert boxes.min() >= 0.0 and boxes.max() <= 1.0
    # slot 1 (second hand) is empty: only 1 hand detected -> zeroed
    assert np.all(boxes[:, 1] == 0)


def test_ssv2_test_views(ssv2_cfg):
    from focus_tpu.datasets.build import build_dataset

    ssv2_cfg.TEST.NUM_ENSEMBLE_VIEWS = 2
    ssv2_cfg.TEST.NUM_SPATIAL_CROPS = 3
    ds = build_dataset("ssv2", ssv2_cfg, "test")
    assert len(ds) == 3 * 6
    v0 = ds[0]
    assert v0[0].shape == (4, 32, 32, 3)


def test_ssv2_with_randaug(ssv2_cfg):
    from focus_tpu.datasets.build import build_dataset

    ssv2_cfg.AUG.ENABLE = True
    ssv2_cfg.AUG.AA_TYPE = "rand-m7-n4-mstd0.5-inc1"
    ssv2_cfg.AUG.DIFFERENT_AUG_PER_FRAME = True
    ds = build_dataset("ssv2", ssv2_cfg, "train")
    video, label, idx, meta = ds[1]
    assert video.shape == (4, 32, 32, 3)
    assert np.isfinite(video).all()
    assert meta["orvit_bboxes"].shape == (4, 4, 4)


def test_randaug_box_geometry():
    """Translate moves boxes with the image content."""
    from focus_tpu.datasets.rand_augment import _OPS

    img = Image.fromarray(np.zeros((64, 64, 3), np.uint8))
    boxes = np.array([[10.0, 10.0, 20.0, 20.0]])
    out_img, out_boxes = _OPS["TranslateXRel"](img, 0.25, boxes)
    np.testing.assert_allclose(out_boxes[0], [10 - 16, 10, 20 - 16, 20])
    out_img, out_boxes = _OPS["ShearX"](img, 0.0, boxes)
    np.testing.assert_allclose(out_boxes[0], boxes[0])


def test_uniform_crop_positions():
    from focus_tpu.datasets.transform import uniform_crop

    frames = np.arange(1 * 8 * 16 * 1, dtype=np.float32).reshape(1, 8, 16, 1)
    left = uniform_crop(frames, 8, 0)
    center = uniform_crop(frames, 8, 1)
    right = uniform_crop(frames, 8, 2)
    assert left.shape == center.shape == right.shape == (1, 8, 8, 1)
    assert left[0, 0, 0, 0] == frames[0, 0, 0, 0]
    assert right[0, 0, -1, 0] == frames[0, 0, -1, 0]


def test_kinetics_with_synthetic_video(tmp_path):
    cv2 = pytest.importorskip("cv2")
    root = tmp_path / "k400"
    root.mkdir()
    # write a tiny mp4
    path = str(root / "vid0.mp4")
    w = cv2.VideoWriter(
        path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (32, 32)
    )
    rs = np.random.RandomState(0)
    for _ in range(30):
        w.write(rs.randint(0, 255, (32, 32, 3), np.uint8))
    w.release()
    (root / "train.csv").write_text(f"{path} 3\n")

    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(root)
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_JITTER_SCALES = [36, 44]
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.MODEL.ARCH = "slow"
    from focus_tpu.datasets.build import build_dataset

    ds = build_dataset("kinetics", cfg, "train")
    video, label, idx, meta = ds[0]
    assert video.shape == (4, 32, 32, 3)
    assert label == 3
