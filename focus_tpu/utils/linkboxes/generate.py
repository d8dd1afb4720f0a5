"""Offline box-link cache generation: detections -> SORT tracks -> caches.

TPU-side counterpart of the reference generation scripts
(``slowfast/utils/LinkBoxes/epickitchens.py:130-199`` and
``LinkBoxes/ava.py:20-90``): raw per-frame detections are linked into
tracks with the SORT tracker and written to the cache formats the
datasets consume — h5 files for EpicKitchens (read by
``focus_tpu.datasets.epickitchens.EKBoxes``) and a pickle of per-video
``{frame: [n, 5] xyxy+track_id}`` dicts for AVA.

Everything here is host-side numpy (offline preprocessing, not a TPU
workload) and has no external-library dependency beyond h5py.
"""

from __future__ import annotations

import os
import pickle
from typing import Dict, Iterable, List, Optional, Sequence

import numpy as np

from focus_tpu.utils import logging
from focus_tpu.utils.linkboxes.sort import Sort

logger = logging.get_logger(__name__)

# AVA keyframe protocol constants (reference LinkBoxes/ava.py:13-19)
AVA_FPS = 30
AVA_START_SEC = 900
AVA_END_SEC = 1799
AVA_FRAMES_RANGE = range(AVA_FPS, (AVA_END_SEC - AVA_START_SEC) * AVA_FPS,
                         AVA_FPS)


def _filter_small(boxes: np.ndarray, eps: float = 0.01) -> np.ndarray:
    """Drop degenerate detections (reference epickitchens.py:98-100)."""
    if len(boxes) == 0:
        return np.empty((0, 5))
    boxes = np.asarray(boxes, np.float64).reshape(-1, 5)
    keep = ((boxes[:, 2] - boxes[:, 0]) > eps) & (
        (boxes[:, 3] - boxes[:, 1]) > eps
    )
    return boxes[keep]


def link_video_boxes(
    frame_boxes: Dict[int, list],
    frame_ids: Optional[Iterable[int]] = None,
    pinned: Optional[Dict[int, np.ndarray]] = None,
    n_pinned: int = 0,
    small_eps: float = 0.01,
) -> Dict[int, np.ndarray]:
    """Link one video's detections into tracks
    (reference epickitchens.py:101-123 ``get_vid_boxes_linked``).

    frame_boxes: {frame_id: [[x0,y0,x1,y1,score], ...]}.
    pinned: optional {frame_id: [n_pinned, 5]} rows (e.g. hands) that are
    prepended with fixed track ids 0..n_pinned-1. ``n_pinned`` also
    reserves the low ids when ``pinned`` is None (SORT emits id+1, so
    tracks take ids > n_pinned and never collide with pinned slots).
    Returns {frame_id: [m, 5] xyxy+track_id}.
    """
    tracker = Sort(trackers_count_start=n_pinned)
    out: Dict[int, np.ndarray] = {}
    ids = sorted(frame_boxes.keys()) if frame_ids is None else list(frame_ids)
    for fid in ids:
        boxes = _filter_small(frame_boxes.get(fid, []), small_eps)
        linked = tracker.update(boxes)
        if n_pinned > 0 and pinned is not None:
            rows = np.asarray(
                pinned.get(fid, np.zeros((n_pinned, 5))), np.float64
            ).reshape(n_pinned, 5)
            pin = np.concatenate(
                [rows[:, :4], np.arange(n_pinned, dtype=np.float64)[:, None]],
                axis=1,
            )
            linked = np.concatenate([pin, linked], axis=0)
        out[fid] = linked
    return out


# ------------------------------------------------------------------ EK


def link_ek_boxes(
    dboxes: Dict[str, Dict[int, list]],
    dhands: Optional[Dict[str, Dict[int, np.ndarray]]] = None,
) -> Dict[str, Dict[int, np.ndarray]]:
    """All videos' detections -> linked tracks, hands pinned to slots 0-1
    (reference epickitchens.py:74-123)."""
    out = {}
    n_pinned = 2 if dhands is not None else 0
    for i, vid in enumerate(dboxes):
        if i % 10 == 0:
            logger.info(f"linking boxes: {vid} ({i}/{len(dboxes)})")
        out[vid] = link_video_boxes(
            dboxes[vid],
            pinned=(dhands or {}).get(vid),
            n_pinned=n_pinned,
        )
    return out


def dict2h5(d: dict, out_path: str) -> None:
    """Flatten a nested {key: {key: ndarray}} dict into an h5 file
    (reference epickitchens.py:130-156)."""
    import h5py

    flat = {}

    def _rec(dd, prefix):
        for k, v in dd.items():
            if isinstance(v, dict):
                _rec(v, f"{prefix}{k}/")
            else:
                flat[prefix + str(k)] = np.asarray(v)

    _rec(d, "")
    with h5py.File(out_path, "w") as f:
        for k, v in flat.items():
            f[k] = v


def gen_ek_caches(
    dboxes: Dict[str, Dict[int, list]],
    dhands: Optional[Dict[str, Dict[int, np.ndarray]]],
    out_dir: str,
) -> str:
    """Generate the ``boxes.h5`` / ``hand_boxes.h5`` caches that
    ``EKBoxes`` reads (reference epickitchens.py:157-199 writes one merged
    cache; the split layout keeps the hand rows' fixed slots explicit).

    dboxes: {video_id: {frame_id: [[x0,y0,x1,y1,score], ...]}} with
    normalised coordinates; dhands: {video_id: {frame_id: [2, 5]}} rows
    (right, left) or None. Returns out_dir."""
    os.makedirs(out_dir, exist_ok=True)
    # reserve ids 0-1 for the hand slots even though hands live in their
    # own cache: EKBoxes pins saved_indices=[0,1] at read time, so object
    # track ids must stay clear of them
    linked = {
        vid: link_video_boxes(frames, n_pinned=2 if dhands else 0)
        for vid, frames in dboxes.items()
    }
    dict2h5(linked, os.path.join(out_dir, "boxes.h5"))
    if dhands is not None:
        hands = {}
        for vid, frames in dhands.items():
            hands[vid] = {}
            for fid, rows in frames.items():
                rows = np.asarray(rows, np.float64).reshape(-1, 5)
                ids = np.arange(len(rows), dtype=np.float64)[:, None]
                hands[vid][fid] = np.concatenate([rows[:, :4], ids], axis=1)
        dict2h5(hands, os.path.join(out_dir, "hand_boxes.h5"))
    return out_dir


# ----------------------------------------------------------------- AVA


def gen_ava_boxes_dict(
    csv_paths: Sequence[str], is_gt: bool
) -> Dict[str, Dict[int, list]]:
    """Parse AVA box CSVs into {video: {frame: [[x,y,x,y,score]]}}
    (reference ava.py:28-46; sec -> (sec-900)*30 frame index)."""
    dboxes: Dict[str, Dict[int, list]] = {}
    if isinstance(csv_paths, str):
        csv_paths = [csv_paths]
    for path in csv_paths:
        with open(path) as f:
            rows = f.read().split("\n")
        for line in rows:
            if not line:
                continue
            parts = line.split(",")
            vid, sec = parts[0], parts[1]
            x1, y1, x2, y2 = map(float, parts[2:6])
            score = 1.0 if is_gt else float(parts[7])
            fid = (int(sec) - AVA_START_SEC) * AVA_FPS
            dboxes.setdefault(vid, {}).setdefault(fid, []).append(
                [x1, y1, x2, y2, score]
            )
    return dboxes


def get_ava_boxes(
    csv_paths: Sequence[str],
    cache_dir: str = "run_files/linked_boxes",
    is_gt: bool = True,
) -> Dict[str, Dict[int, np.ndarray]]:
    """Link AVA person boxes over the keyframe grid and cache the result
    (reference ava.py:80-97).

    ``is_gt`` must come from the caller (which cfg list the paths came
    from) — GT rows carry person_id in column 7, detections a score.
    The cache key includes each CSV's mtime+size, so edited inputs
    regenerate instead of silently reusing a stale cache."""
    import hashlib

    if isinstance(csv_paths, str):
        csv_paths = [csv_paths]
    fp = hashlib.sha1()
    for p in sorted(csv_paths):
        st = os.stat(p)
        fp.update(f"{p}:{st.st_mtime_ns}:{st.st_size}:{is_gt}".encode())
    name = (
        "_".join(os.path.basename(p) for p in sorted(csv_paths))
        + "." + fp.hexdigest()[:12]
    )
    os.makedirs(cache_dir, exist_ok=True)
    out_path = os.path.join(cache_dir, name)
    if not os.path.exists(out_path):
        logger.info(f"generating linked AVA boxes -> {out_path}")
        dboxes = gen_ava_boxes_dict(csv_paths, is_gt)
        linked = {
            vid: link_video_boxes(
                frames, frame_ids=AVA_FRAMES_RANGE, small_eps=0.0
            )
            for vid, frames in dboxes.items()
        }
        with open(out_path, "wb") as f:
            pickle.dump(linked, f)
    with open(out_path, "rb") as f:
        return pickle.load(f)
