"""Round-trip tests for offline box-link cache generation: synthetic
detections -> SORT linking -> h5/pickle caches -> the dataset read paths
(EKBoxes, Ava ORViT boxes)."""

import os

import numpy as np
import pytest

from focus_tpu.utils.linkboxes import generate as gen


def _moving_box(t, x0=0.1, y0=0.1, dx=0.02, w=0.2):
    x = x0 + dx * t
    return [x, y0, x + w, y0 + w]


def test_link_video_boxes_tracks_are_stable():
    frames = {
        t: [_moving_box(t) + [0.9], _moving_box(t, 0.6, 0.6, -0.01) + [0.8]]
        for t in range(10)
    }
    linked = gen.link_video_boxes(frames)
    # after min_hits warmup every frame emits both tracks with stable ids
    ids_per_frame = [set(linked[t][:, 4].astype(int)) for t in range(3, 10)]
    assert all(ids == ids_per_frame[0] for ids in ids_per_frame)
    assert len(ids_per_frame[0]) == 2


def test_link_video_boxes_reserves_pinned_ids():
    frames = {t: [_moving_box(t) + [0.9]] for t in range(8)}
    linked = gen.link_video_boxes(frames, n_pinned=2)
    for t in range(3, 8):
        assert linked[t].shape[0] == 1
        assert linked[t][0, 4] >= 3  # ids 0-2 clear of the pinned slots

    hands = {t: np.array([[0.0, 0.0, 0.05, 0.05, 0.9],
                          [0.9, 0.9, 0.95, 0.95, 0.8]]) for t in range(8)}
    linked = gen.link_video_boxes(frames, pinned=hands, n_pinned=2)
    for t in range(3, 8):
        assert linked[t].shape[0] == 3
        assert list(linked[t][:2, 4]) == [0.0, 1.0]


def test_ek_round_trip_through_ekboxes(tmp_path):
    pytest.importorskip("h5py")
    from focus_tpu.config import get_cfg
    from focus_tpu.datasets.epickitchens import EKBoxes

    T = 8
    dboxes = {
        "P01_01": {t: [_moving_box(t) + [0.9]] for t in range(T)}
    }
    dhands = {
        "P01_01": {
            t: np.array([[0.05, 0.05, 0.15, 0.15, 0.9],
                         [0.7, 0.7, 0.8, 0.8, 0.85]])
            for t in range(T)
        }
    }
    out = gen.gen_ek_caches(dboxes, dhands, str(tmp_path / "ekcache"))
    assert os.path.exists(os.path.join(out, "boxes.h5"))
    assert os.path.exists(os.path.join(out, "hand_boxes.h5"))

    cfg = get_cfg()
    cfg.EPICKITCHENS.VISUAL_DATA_DIR = out
    cfg.ORVIT.O = 4
    reader = EKBoxes(cfg)
    boxes = reader.get_boxes("P01_01", list(range(T)))  # [O, T, 4]
    assert boxes.shape == (4, T, 4)
    # hands pinned to slots 0-1 on every frame
    np.testing.assert_allclose(boxes[0, 0], [0.05, 0.05, 0.15, 0.15])
    np.testing.assert_allclose(boxes[1, 0], [0.7, 0.7, 0.8, 0.8])
    # the object track lands in slot 2 once SORT warms up
    assert np.any(boxes[2, 3:] != 0)
    # slot 3 stays empty
    assert np.all(boxes[3] == 0)


def test_ava_csv_link_round_trip(tmp_path):
    csv = tmp_path / "detect_boxes.csv"
    rows = []
    for sec in range(902, 912):
        t = sec - 902
        x = 0.2 + 0.01 * t
        rows.append(f"vidA,{sec},{x:.3f},0.30,{x + 0.2:.3f},0.60,12,0.95")
    csv.write_text("\n".join(rows) + "\n")

    linked = gen.get_ava_boxes(
        [str(csv)], cache_dir=str(tmp_path / "cache"), is_gt=False
    )
    assert "vidA" in linked
    fid = (905 - 900) * 30
    assert linked["vidA"][fid].shape[1] == 5
    # cache reload path returns the identical dict
    again = gen.get_ava_boxes(
        [str(csv)], cache_dir=str(tmp_path / "cache"), is_gt=False
    )
    np.testing.assert_allclose(linked["vidA"][fid], again["vidA"][fid])
    # an edited CSV must regenerate, not reuse the stale cache
    rows = [r.replace("0.30", "0.35") for r in rows]
    csv.write_text("\n".join(rows) + "\n")
    os.utime(csv, ns=(1, 1))
    fresh = gen.get_ava_boxes(
        [str(csv)], cache_dir=str(tmp_path / "cache"), is_gt=False
    )
    assert not np.allclose(fresh["vidA"][fid], linked["vidA"][fid])


def test_ava_dataset_emits_orvit_boxes(tmp_path):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from synthetic_data import make_ava_tree

    from focus_tpu.config import get_cfg
    from focus_tpu.datasets.build import build_dataset

    root = make_ava_tree(str(tmp_path / "ava"))
    cfg = get_cfg()
    cfg.AVA.FRAME_DIR = os.path.join(root, "frames")
    cfg.AVA.FRAME_LIST_DIR = os.path.join(root, "frame_lists")
    cfg.AVA.ANNOTATION_DIR = os.path.join(root, "annotations")
    cfg.AVA.TRAIN_LISTS = ["train.csv"]
    cfg.AVA.TRAIN_GT_BOX_LISTS = ["gt_train.csv"]
    cfg.AVA.TRAIN_PREDICT_BOX_LISTS = []
    cfg.MODEL.NUM_CLASSES = 4
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_JITTER_SCALES = [64, 80]
    cfg.DATA.TRAIN_CROP_SIZE = 56
    cfg.ORVIT.ENABLE = True
    cfg.ORVIT.O = 4

    ds = build_dataset("ava", cfg, "train")
    video, labels, idx, meta = ds[0]
    ob = meta["orvit_bboxes"]
    assert ob.shape == (4, 4, 4)  # [T, O, 4] cxcywh
    assert np.isfinite(ob).all()
    assert (ob >= 0).all() and (ob <= 1.5).all()
    # at least one real track present
    assert np.any(ob != 0)


def test_ava_orvit_boxes_clamp_to_keyframe_range(tmp_path):
    """Frames near the video start snap to key 0, which is absent from
    the linked dict — the reference round_frame clamps to [60, 26940]
    (ava_dataset.py:541-548) so they reuse the first real keyframe."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from synthetic_data import make_ava_tree

    from focus_tpu.config import get_cfg
    from focus_tpu.datasets.build import build_dataset

    root = make_ava_tree(str(tmp_path / "ava"))
    cfg = get_cfg()
    cfg.AVA.FRAME_DIR = os.path.join(root, "frames")
    cfg.AVA.FRAME_LIST_DIR = os.path.join(root, "frame_lists")
    cfg.AVA.ANNOTATION_DIR = os.path.join(root, "annotations")
    cfg.AVA.TRAIN_LISTS = ["train.csv"]
    cfg.AVA.TRAIN_GT_BOX_LISTS = ["gt_train.csv"]
    cfg.AVA.TRAIN_PREDICT_BOX_LISTS = []
    cfg.MODEL.NUM_CLASSES = 4
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.ORVIT.ENABLE = True
    cfg.ORVIT.O = 4

    ds = build_dataset("ava", cfg, "train")
    # seq entirely before the first keyframe second (frame 60)
    out = ds._get_orvit_boxes(0, [0, 1, 2, 3])
    assert out.shape == (4, 4, 4)
    # clamped to key 60 (sec 902), which has a linked track
    assert np.any(out != 0)
