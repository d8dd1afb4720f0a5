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


def _write_indexed_video(path, n_frames, size=32, fps=30):
    """Each frame is a solid gray level encoding its index (survives the
    lossy mp4 round trip to within a few levels)."""
    import cv2

    w = cv2.VideoWriter(
        str(path), cv2.VideoWriter_fourcc(*"mp4v"), fps, (size, size)
    )
    for i in range(n_frames):
        level = 20 + (i * 2) % 200
        w.write(np.full((size, size, 3), level, np.uint8))
    w.release()


def test_selective_decode_matches_whole_decode(tmp_path):
    pytest.importorskip("cv2")
    from focus_tpu.datasets import decoder

    path = str(tmp_path / "long.mp4")
    _write_indexed_video(path, 240)

    for clip_idx in range(3):
        sel = decoder.decode(
            path, sampling_rate=2, num_frames=8, clip_idx=clip_idx,
            num_clips=10, selective=True,
        )
        whole = decoder.decode(
            path, sampling_rate=2, num_frames=8, clip_idx=clip_idx,
            num_clips=10, selective=False,
        )
        assert sel.shape == whole.shape == (8, 32, 32, 3)
        # identical frame selection (codec noise aside, the frames are the
        # same decoded pixels so they match exactly)
        np.testing.assert_array_equal(sel, whole)


def test_selective_decode_reads_only_the_window(tmp_path):
    pytest.importorskip("cv2")
    from focus_tpu.datasets import decoder

    path = str(tmp_path / "long2.mp4")
    _write_indexed_video(path, 240)

    meta = decoder.probe_video_cv2(path)
    assert meta is not None and meta[0] == 240

    win = decoder.decode_window_cv2(path, 100, 131)
    assert win.shape == (32, 32, 32, 3)
    # frame 100 encodes gray level 20 + 200 % 200 = 20; frame 131 -> 20+62
    assert abs(int(win[0, 0, 0, 0]) - (20 + (100 * 2) % 200)) < 8
    assert abs(int(win[-1, 0, 0, 0]) - (20 + (131 * 2) % 200)) < 8


def test_selective_decode_train_mode_window(tmp_path):
    pytest.importorskip("cv2")
    from focus_tpu.datasets import decoder

    path = str(tmp_path / "long3.mp4")
    _write_indexed_video(path, 240)
    rng = np.random.RandomState(7)
    out = decoder.decode(
        path, sampling_rate=4, num_frames=8, clip_idx=-1, rng=rng,
    )
    assert out.shape == (8, 32, 32, 3)


def test_kinetics_aug_recipe_path(tmp_path):
    """AUG.ENABLE: RandAugment + relative-scale (motion-shift) crop +
    RandomErasing + repeated aug (reference kinetics.py:286-409)."""
    pytest.importorskip("cv2")
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from synthetic_data import make_kinetics_tree

    root = str(tmp_path / "k400aug")
    make_kinetics_tree(root, num_videos=2, num_frames=40, size=48)

    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = root
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TRAIN_JITTER_SCALES = [48, 56]
    cfg.DATA.TRAIN_CROP_SIZE = 32
    cfg.DATA.TRAIN_JITTER_SCALES_RELATIVE = [0.2, 1.0]
    cfg.DATA.TRAIN_JITTER_ASPECT_RELATIVE = [0.75, 1.3333]
    cfg.DATA.TRAIN_JITTER_MOTION_SHIFT = True
    cfg.MODEL.ARCH = "slow"
    cfg.AUG.ENABLE = True
    cfg.AUG.AA_TYPE = "rand-m7-n2"
    cfg.AUG.RE_PROB = 0.5
    cfg.AUG.NUM_SAMPLE = 2
    from focus_tpu.datasets.build import build_dataset

    ds = build_dataset("kinetics", cfg, "train")
    video, label, idx, meta = ds[0]
    # repeated aug comes back stacked on a leading axis
    assert video.shape == (2, 4, 32, 32, 3)
    assert label.shape == (2,) and idx.shape == (2,)
    assert np.isfinite(video).all()
    # the two views differ (independent aug draws)
    assert not np.allclose(video[0], video[1])

    # loader flattens the repeated axis into the batch
    from focus_tpu.datasets.loader import construct_loader

    cfg.TRAIN.DATASET = "kinetics"
    cfg.TRAIN.BATCH_SIZE = 2
    cfg.DATA_LOADER.NUM_WORKERS = 1
    loader = construct_loader(cfg, "train")
    batch = next(iter(loader))
    assert batch[0].shape == (4, 4, 32, 32, 3)
    assert batch[1].shape == (4,)


def test_broken_dataset_module_fails_loudly(tmp_path, monkeypatch):
    """An ImportError raised from inside a focus_tpu dataset module (a
    genuine bug, e.g. a syntax error in a transitively imported module)
    must propagate, not silently drop the dataset from the registry."""
    import importlib

    import pytest as _pytest

    from focus_tpu.datasets import registry_imports as ri

    real_import = importlib.import_module

    def fake_import(name, *a, **k):
        if name.endswith(".broken_ds"):
            # simulates ssv2.py importing a broken focus_tpu module
            raise ImportError(
                "cannot import name 'x'", name="focus_tpu.datasets.utils"
            )
        if name.endswith(".needs_h5py"):
            raise ImportError("No module named 'h5py'", name="h5py")
        return real_import(name, *a, **k)

    monkeypatch.setattr(importlib, "import_module", fake_import)
    # optional third-party dep -> warn and continue
    ri.import_dataset_modules(("needs_h5py",))
    # our own module broken -> raise
    with _pytest.raises(ImportError):
        ri.import_dataset_modules(("broken_ds",))


def test_ssv2_device_preprocess_parity(ssv2_cfg):
    """uint8 eval fast path + device-side normalize must reproduce the
    f32 host-normalised path up to the half-ULP uint8 rounding the
    native resize performs (|du8| <= 0.5/255/std)."""
    from focus_tpu import native
    from focus_tpu.datasets.build import build_dataset
    from focus_tpu.ops.preprocess import device_normalize

    if not native.available():
        pytest.skip("native decode unavailable")
    cfg_f32 = ssv2_cfg.clone()
    cfg_f32.TPU.DEVICE_PREPROCESS = False
    cfg_u8 = ssv2_cfg.clone()
    cfg_u8.TPU.DEVICE_PREPROCESS = True

    ds_f32 = build_dataset("ssv2", cfg_f32, "test")
    ds_u8 = build_dataset("ssv2", cfg_u8, "test")
    v_f32, _, _, meta_f32 = ds_f32[0]
    v_u8, _, _, meta_u8 = ds_u8[0]
    assert v_u8.dtype == np.uint8
    assert v_f32.dtype == np.float32
    assert v_u8.shape == v_f32.shape
    normed = np.asarray(device_normalize(v_u8[None], cfg_u8))[0]
    tol = 0.51 / 255.0 / min(cfg_u8.DATA.STD)
    np.testing.assert_allclose(normed, v_f32, atol=tol)
    np.testing.assert_allclose(
        meta_u8["orvit_bboxes"], meta_f32["orvit_bboxes"], atol=1e-6
    )


def test_device_normalize_passthrough_and_tuple(ssv2_cfg):
    from focus_tpu.ops.preprocess import device_normalize

    f32 = np.zeros((1, 2, 4, 4, 3), np.float32)
    out = device_normalize(f32, ssv2_cfg)
    assert out.dtype == np.float32 and np.all(np.asarray(out) == 0)
    u8 = np.full((1, 2, 4, 4, 3), 255, np.uint8)
    slow, fast = device_normalize((u8, u8), ssv2_cfg)
    exp = (1.0 - np.asarray(ssv2_cfg.DATA.MEAN)) / np.asarray(
        ssv2_cfg.DATA.STD
    )
    np.testing.assert_allclose(np.asarray(fast)[0, 0, 0, 0], exp, rtol=1e-6)


def _u8_tol(cfg, ulps=1.01):
    # uint8 resize quantisation: cv2 fixed-point round-to-nearest is
    # within ~1 byte LSB of the float bilinear result
    return ulps / 255.0 / min(cfg.DATA.STD)


def test_kinetics_device_preprocess_parity(tmp_path):
    """Kinetics eval under TPU.DEVICE_PREPROCESS: uint8 end-to-end on
    host, device normalize reproduces the f32 host-normalised path up
    to the uint8 resize rounding."""
    cv2 = pytest.importorskip("cv2")
    from focus_tpu.datasets.build import build_dataset
    from focus_tpu.ops.preprocess import device_normalize

    root = tmp_path / "k400"
    root.mkdir()
    path = str(root / "vid0.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (48, 40))
    rs = np.random.RandomState(0)
    for _ in range(40):
        w.write(rs.randint(0, 255, (40, 48, 3), np.uint8))
    w.release()
    (root / "test.csv").write_text(f"{path} 3\n")

    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = str(root)
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.SAMPLING_RATE = 2
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 1
    cfg.TEST.NUM_SPATIAL_CROPS = 1
    cfg.MODEL.ARCH = "mvit"

    cfg_f32 = cfg.clone()
    cfg_f32.TPU.DEVICE_PREPROCESS = False
    cfg_u8 = cfg.clone()
    cfg_u8.TPU.DEVICE_PREPROCESS = True
    v_f32 = build_dataset("kinetics", cfg_f32, "test")[0][0]
    v_u8 = build_dataset("kinetics", cfg_u8, "test")[0][0]
    assert v_u8.dtype == np.uint8 and v_f32.dtype == np.float32
    assert v_u8.shape == v_f32.shape
    normed = np.asarray(device_normalize(v_u8[None], cfg_u8))[0]
    np.testing.assert_allclose(normed, v_f32, atol=_u8_tol(cfg_u8))


def _charades_tree(root, num_frames=10, size=48):
    os.makedirs(root, exist_ok=True)
    from PIL import Image as PILImage

    rs = np.random.RandomState(1)
    rows = ["original_video_id video_id frame_id path labels"]
    for t in range(num_frames):
        p = os.path.join(root, f"v0_{t:06d}.jpg")
        PILImage.fromarray(
            rs.randint(0, 255, (size, size, 3), np.uint8)
        ).save(p, quality=95)
        rows.append(f'v0 0 {t} {p} "{t % 3}"')
    with open(os.path.join(root, "val.csv"), "w") as f:
        f.write("\n".join(rows) + "\n")


def test_charades_device_preprocess_parity(tmp_path):
    """Charades (frame CSV) under TPU.DEVICE_PREPROCESS: same parity
    contract as SSv2/Kinetics."""
    pytest.importorskip("cv2")
    from focus_tpu.datasets.build import build_dataset
    from focus_tpu.ops.preprocess import device_normalize

    root = str(tmp_path / "charades")
    _charades_tree(root)
    cfg = get_cfg()
    cfg.DATA.PATH_TO_DATA_DIR = root
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TEST_CROP_SIZE = 32
    cfg.TEST.NUM_ENSEMBLE_VIEWS = 1
    cfg.TEST.NUM_SPATIAL_CROPS = 1
    cfg.MODEL.ARCH = "mvit"
    cfg.MODEL.NUM_CLASSES = 5

    cfg_f32 = cfg.clone()
    cfg_f32.TPU.DEVICE_PREPROCESS = False
    cfg_u8 = cfg.clone()
    cfg_u8.TPU.DEVICE_PREPROCESS = True
    v_f32, lab_f32, _, _ = build_dataset("charades", cfg_f32, "test")[0]
    v_u8, lab_u8, _, _ = build_dataset("charades", cfg_u8, "test")[0]
    assert v_u8.dtype == np.uint8 and v_f32.dtype == np.float32
    np.testing.assert_array_equal(lab_u8, lab_f32)
    normed = np.asarray(device_normalize(v_u8[None], cfg_u8))[0]
    np.testing.assert_allclose(normed, v_f32, atol=_u8_tol(cfg_u8))


def test_spatial_sampling_commutes_with_normalize_u8():
    """The geometric transform stack on uint8 + device normalize must
    equal host-normalize + the same transforms, up to the uint8 resize
    rounding — the contract that makes the TRAIN path's uint8 shipping
    valid (crops/flips are byte slices; only resizes quantise)."""
    pytest.importorskip("cv2")
    from focus_tpu.datasets import utils as data_utils
    from focus_tpu.ops.preprocess import device_normalize

    cfg = get_cfg()
    cfg.DATA.TRAIN_CROP_SIZE = 32
    rs = np.random.RandomState(7)
    frames = rs.randint(0, 255, (4, 40, 48, 3), np.uint8)

    f32 = data_utils.tensor_normalize(frames, cfg.DATA.MEAN, cfg.DATA.STD)
    out_f32 = data_utils.spatial_sampling(
        f32, spatial_idx=-1, min_scale=36, max_scale=36, crop_size=32,
        rng=np.random.RandomState(3),
    )
    out_u8 = data_utils.spatial_sampling(
        frames, spatial_idx=-1, min_scale=36, max_scale=36, crop_size=32,
        rng=np.random.RandomState(3),
    )
    assert out_u8.dtype == np.uint8
    normed = np.asarray(device_normalize(out_u8[None], cfg))[0]
    np.testing.assert_allclose(normed, out_f32, atol=_u8_tol(cfg))


def test_random_erasing_uint8():
    """RandomErasing on uint8 clips: 'const' fills the mean pixel (0 in
    normalized units); 'pixel' fills de-normalised clipped noise; the
    un-erased region is untouched."""
    from focus_tpu.datasets.random_erasing import RandomErasing

    cfg = get_cfg()
    rs = np.random.RandomState(5)
    frames = rs.randint(0, 255, (2, 24, 24, 3), np.uint8)

    erase = RandomErasing(1.0, mode="const", mean=cfg.DATA.MEAN,
                          std=cfg.DATA.STD)
    out = erase(frames, rng=np.random.RandomState(2))
    assert out.dtype == np.uint8
    changed = out != frames
    assert changed.any()
    mean_px = np.rint(np.asarray(cfg.DATA.MEAN) * 255).astype(np.uint8)
    t, y, x, _ = np.nonzero(changed)
    np.testing.assert_array_equal(
        out[t[0], y[0], x[0]], mean_px
    )

    # same rng draws => same erase box as the normalized-f32 call
    from focus_tpu.datasets import utils as data_utils

    f32 = data_utils.tensor_normalize(frames, cfg.DATA.MEAN, cfg.DATA.STD)
    out_f32 = erase(f32, rng=np.random.RandomState(2))
    changed_f32 = out_f32 != f32
    np.testing.assert_array_equal(changed_f32.any(axis=-1).nonzero()[1:2],
                                  changed.any(axis=-1).nonzero()[1:2])

    erase_px = RandomErasing(1.0, mode="pixel", mean=cfg.DATA.MEAN,
                             std=cfg.DATA.STD)
    out_px = erase_px(frames, rng=np.random.RandomState(2))
    assert out_px.dtype == np.uint8


def test_ssv2_train_path_ships_uint8(ssv2_cfg):
    """SSv2 TRAIN path under DEVICE_PREPROCESS: randaug + geometric
    transforms run on uint8 and the item ships uint8."""
    from focus_tpu.datasets.build import build_dataset

    cfg = ssv2_cfg.clone()
    cfg.TPU.DEVICE_PREPROCESS = True
    cfg.AUG.ENABLE = True
    cfg.AUG.AA_TYPE = "rand-m7-n4-mstd0.5-inc1"
    ds = build_dataset("ssv2", cfg, "train")
    v, _, _, _ = ds[0]
    assert v.dtype == np.uint8
    assert v.shape[-1] == 3
