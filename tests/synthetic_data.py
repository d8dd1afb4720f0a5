"""On-disk synthetic dataset trees for end-to-end tests.

Each generator lays out files exactly the way the corresponding dataset
class expects them (same layouts the reference datasets read), so real
reference YAMLs can run unchanged with only path/size overrides.
"""

import csv
import json
import os

import numpy as np
from PIL import Image


def make_ssv2_tree(root, num_videos=3, num_frames=12, size=48):
    """SSv2 frame-JPEG tree + label/split jsons + detectron2 .npy boxes."""
    rs = np.random.RandomState(0)
    os.makedirs(f"{root}/sm/annotations", exist_ok=True)
    os.makedirs(f"{root}/json_files", exist_ok=True)
    labels = {"Doing thing 1": "0", "Doing thing 2": "1"}
    json.dump(
        labels,
        open(f"{root}/sm/annotations/something-something-v2-labels.json", "w"),
    )
    for split in ("train", "validation"):
        entries = []
        for v in range(num_videos):
            vid = str(10000 + v)
            entries.append({"id": vid, "template": f"Doing [thing {v % 2 + 1}]"})
            fdir = f"{root}/frames/{vid}"
            os.makedirs(fdir, exist_ok=True)
            bdir = f"{root}/detected_boxes/{vid}"
            os.makedirs(bdir, exist_ok=True)
            for t in range(num_frames):
                Image.fromarray(
                    rs.randint(0, 255, (size, size, 3), np.uint8)
                ).save(f"{fdir}/{t + 1:04d}.jpg")
                boxes = {
                    "boxes": rs.rand(3, 4).astype(np.float32) * size / 2,
                    "pred_classes": np.array([0, 1, 1]),
                }
                boxes["boxes"][:, 2:] += boxes["boxes"][:, :2]
                np.save(f"{bdir}/{t + 1:04d}.npy", boxes, allow_pickle=True)
        json.dump(
            entries,
            open(f"{root}/json_files/something-something-v2-{split}.json", "w"),
        )


def make_kinetics_tree(root, num_videos=4, num_frames=48, size=64,
                       num_classes=4):
    """Kinetics video files + {train,val,test}.csv lists."""
    import cv2

    os.makedirs(root, exist_ok=True)
    rs = np.random.RandomState(0)
    rows = []
    for v in range(num_videos):
        path = os.path.join(root, f"vid{v}.mp4")
        w = cv2.VideoWriter(
            path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (size, size)
        )
        for _ in range(num_frames):
            w.write(rs.randint(0, 255, (size, size, 3), np.uint8))
        w.release()
        rows.append(f"{path} {v % num_classes}")
    for split in ("train", "val", "test"):
        with open(os.path.join(root, f"{split}.csv"), "w") as f:
            f.write("\n".join(rows) + "\n")


def make_movi_tree(root, num_dirs=10, frames_per_dir=4, size=64,
                   num_segs=25, with_masks=True):
    """MOVi-E episode dirs of PNGs (+ mask PNGs), reference movi_e.py
    layout: frames/<ep>/<%08d>_image.png, masks/<ep>/<%08d>_mask_<%02d>.png."""
    rs = np.random.RandomState(0)
    for d in range(num_dirs):
        fdir = os.path.join(root, "frames", f"ep{d:03d}")
        os.makedirs(fdir, exist_ok=True)
        if with_masks:
            mdir = os.path.join(root, "masks", f"ep{d:03d}")
            os.makedirs(mdir, exist_ok=True)
        for t in range(frames_per_dir):
            Image.fromarray(
                rs.randint(0, 255, (size, size, 3), np.uint8)
            ).save(os.path.join(fdir, f"{t:08d}_image.png"))
            if with_masks:
                seg_id = rs.randint(0, num_segs, (size, size))
                for s in range(num_segs):
                    Image.fromarray(
                        ((seg_id == s) * 255).astype(np.uint8)
                    ).save(os.path.join(mdir, f"{t:08d}_mask_{s:02d}.png"))
    return os.path.join(root, "frames", "*")


def make_ava_tree(root, num_videos=2, num_frames=70, size=64, fps=30,
                  secs=(902, 903), num_classes=4):
    """AVA frame lists + frame JPEGs + detection/GT csvs (reference
    ava_helper.py layout). Keyframe seconds must fall in AVA_VALID_FRAMES
    (902..1798); frame index for sec s is (s-900)*fps."""
    rs = np.random.RandomState(0)
    frames_dir = os.path.join(root, "frames")
    lists_dir = os.path.join(root, "frame_lists")
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(lists_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)
    video_names = [f"vid{v}" for v in range(num_videos)]
    for split in ("train", "val"):
        with open(os.path.join(lists_dir, f"{split}.csv"), "w") as f:
            writer = csv.writer(f, delimiter=" ")
            writer.writerow(
                ["original_vido_id", "video_id", "frame_id", "path", "labels"]
            )
            for vi, name in enumerate(video_names):
                vdir = os.path.join(frames_dir, name)
                os.makedirs(vdir, exist_ok=True)
                for t in range(num_frames):
                    rel = os.path.join(name, f"{name}_{t + 1:06d}.jpg")
                    img_path = os.path.join(frames_dir, rel)
                    if not os.path.exists(img_path):
                        Image.fromarray(
                            rs.randint(0, 255, (size, size, 3), np.uint8)
                        ).save(img_path)
                    writer.writerow([name, vi, t, rel, '""'])
    def _rand_box():
        x1, y1 = rs.rand(2) * 0.4 + 0.05
        return x1, y1, x1 + 0.3, y1 + 0.3

    for fname, score in (("person_box_train.csv", 0.95),
                         ("person_box_val.csv", 0.95)):
        with open(os.path.join(ann_dir, fname), "w") as f:
            writer = csv.writer(f)
            for name in video_names:
                for sec in secs:
                    x1, y1, x2, y2 = _rand_box()
                    writer.writerow(
                        [name, sec, f"{x1:.3f}", f"{y1:.3f}",
                         f"{x2:.3f}", f"{y2:.3f}", "", f"{score:.6f}"]
                    )
    for fname in ("gt_train.csv", "gt_val.csv"):
        with open(os.path.join(ann_dir, fname), "w") as f:
            writer = csv.writer(f)
            for name in video_names:
                for sec in secs:
                    x1, y1, x2, y2 = _rand_box()
                    writer.writerow(
                        [name, sec, f"{x1:.3f}", f"{y1:.3f}",
                         f"{x2:.3f}", f"{y2:.3f}",
                         rs.randint(1, num_classes + 1), 1]
                    )
    # labelmap (pbtxt) whitelisting every class, and one excluded timestamp
    with open(os.path.join(ann_dir, "labelmap.pbtxt"), "w") as f:
        for c in range(1, num_classes + 1):
            f.write(f'item {{\n  name: "action_{c}"\n  id: {c}\n}}\n')
    with open(os.path.join(ann_dir, "excluded.csv"), "w") as f:
        f.write(f"{video_names[0]},{secs[-1]}\n")
    return root
