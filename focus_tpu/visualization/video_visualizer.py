"""Prediction drawing on video frames (counterpart of reference
``slowfast/visualization/video_visualizer.py:45-349``).

The reference draws through detectron2's matplotlib Visualizer; this is a
cv2 renderer with the same surface: per-class colormap colors, "top-k" /
"thres" label-selection modes (with a lower threshold for uncommon
classes), box drawing, and label text with filled backgrounds, drawn at
the box's top edge for predictions and bottom edge for ground truth.
"""

from __future__ import annotations

import json
from typing import Optional

import numpy as np

from focus_tpu.utils import logging

logger = logging.get_logger(__name__)


def get_class_names(path, parent_path=None, subset_path=None):
    """Load class-name metadata (reference utils/misc.py:316-384
    get_class_names). ``path`` is a {classname: id} json map;
    ``parent_path`` a {parent: [child names]} json map (children are
    resolved to ids); ``subset_path`` a newline-separated text file of
    class names (a json list of ids is also accepted). Returns
    (class_names, parents, subset_ids)."""
    class_names, mapping, parents, subset = None, None, None, None
    if path:
        with open(path) as f:
            loaded = json.load(f)
        if isinstance(loaded, list):  # plain ordered name list
            mapping = {name: i for i, name in enumerate(loaded)}
            class_names = list(loaded)
        else:
            mapping = loaded
            class_names = [None] * (max(mapping.values(), default=-1) + 1)
            for name, idx in mapping.items():
                class_names[idx] = name
    if parent_path:
        with open(parent_path) as f:
            d_parent = json.load(f)
        parents = {
            parent: [
                mapping[c] for c in children
                if mapping and mapping.get(c) is not None
            ]
            for parent, children in d_parent.items()
        }
    if subset_path:
        with open(subset_path) as f:
            raw = f.read()
        try:
            subset = [int(i) for i in json.loads(raw)]
        except (json.JSONDecodeError, TypeError, ValueError):
            subset = [
                mapping[name] for name in raw.split("\n")
                if mapping and mapping.get(name) is not None
            ]
    return class_names, parents, subset


class VideoVisualizer:
    def __init__(self, num_classes, class_names_path="", top_k=1,
                 colormap="rainbow", thres=0.7, lower_thres=0.3,
                 common_class_names=None, mode="top-k"):
        assert mode in ("top-k", "thres"), f"Mode {mode} is not supported."
        self.mode = mode
        self.num_classes = num_classes
        names, _, _ = get_class_names(class_names_path)
        self.class_names = names or [str(i) for i in range(num_classes)]
        self.top_k = top_k
        self.thres = thres
        self.lower_thres = lower_thres
        if mode == "thres":
            # per-class thresholds: `thres` for common classes, the lower
            # threshold elsewhere (reference :471-489)
            if common_class_names:
                common = set(common_class_names)
                self.thres_array = np.array([
                    thres if name in common else lower_thres
                    for name in self.class_names
                ])
            else:
                self.thres_array = np.full((num_classes,), thres)
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        self.color_map = plt.get_cmap(colormap)

    def _get_color(self, class_id):
        """RGB in [0, 255] for a class id (reference :396-402)."""
        rgb = self.color_map(class_id / self.num_classes)[:3]
        return tuple(int(c * 255) for c in rgb)

    def _pick(self, scores):
        """Label selection per mode: (ids, scores)."""
        scores = np.asarray(scores, np.float32)
        if self.mode == "top-k":
            ids = np.argsort(-scores)[: self.top_k]
        else:
            ids = np.nonzero(scores >= self.thres_array)[0]
        return ids, scores[ids]

    def draw_one_frame(self, frame, preds, bboxes=None, alpha=0.5,
                       text_alpha=0.7, ground_truth=False):
        """frame: [H, W, C] uint8 RGB; preds: [num_boxes, num_classes] (or
        [num_classes] without boxes; true-label int lists when
        ground_truth). Returns the drawn frame (reference :404-470)."""
        import cv2

        out = np.ascontiguousarray(np.asarray(frame, np.uint8))
        H, W = out.shape[:2]
        font = cv2.FONT_HERSHEY_SIMPLEX
        fscale = max(H, W) / 800.0
        thick = max(int(round(fscale * 2)), 1)

        def label_texts(scores_or_ids):
            if ground_truth:
                ids = np.atleast_1d(np.asarray(scores_or_ids, int))
                return ids, [f"[{self.class_names[i]}]" for i in ids]
            ids, scores = self._pick(scores_or_ids)
            return ids, [
                f"[{s:.2f}] {self.class_names[i]}"
                for i, s in zip(ids, scores)
            ]

        def draw_texts(ids, texts, x, y, upward):
            for i, (cid, text) in enumerate(zip(ids, texts)):
                (tw, th), base = cv2.getTextSize(text, font, fscale, thick)
                ty = y - i * (th + 6) if upward else y + (i + 1) * (th + 6)
                ty = int(np.clip(ty, th + 2, H - 2))
                color = self._get_color(int(cid))
                overlay = out.copy()
                cv2.rectangle(
                    overlay, (x, ty - th - 2), (x + tw + 2, ty + base),
                    (0, 0, 0), -1,
                )
                cv2.addWeighted(overlay, text_alpha, out, 1 - text_alpha,
                                0, out)
                cv2.putText(out, text, (x + 1, ty), font, fscale, color,
                            thick, cv2.LINE_AA)

        if bboxes is None:
            ids, texts = label_texts(preds)
            draw_texts(ids, texts, 2, H - 6 if ground_truth else 2,
                       upward=ground_truth)
            return out

        bboxes = np.asarray(bboxes).reshape(-1, 4)
        preds = np.asarray(preds)
        for b, box in enumerate(bboxes):
            x0, y0, x1, y1 = [int(round(v)) for v in box]
            if x1 <= x0 or y1 <= y0:
                continue
            ids, texts = label_texts(preds[b])
            box_color = self._get_color(int(ids[0])) if len(ids) else (
                255, 255, 255
            )
            overlay = out.copy()
            cv2.rectangle(overlay, (x0, y0), (x1, y1), box_color, thick)
            cv2.addWeighted(overlay, alpha, out, 1 - alpha, 0, out)
            draw_texts(
                ids, texts, x0, y1 if ground_truth else y0,
                upward=not ground_truth,
            )
        return out

    def draw_clip_range(self, frames, preds, bboxes=None, text_alpha=0.5,
                        ground_truth=False, keyframe_idx=None,
                        draw_range=None, repeat_frame=1):
        """Draw on a sub-range of a clip around the keyframe (reference
        :491-560). frames: [T, H, W, C] uint8; returns a list of frames
        with the range drawn and repeated ``repeat_frame`` times."""
        T = len(frames)
        if keyframe_idx is None:
            keyframe_idx = T // 2
        if draw_range is None:
            draw_range = [T // 2, T - 1]
        lo, hi = max(draw_range[0], 0), min(draw_range[1], T - 1)
        out = []
        for t in range(T):
            if lo <= t <= hi:
                drawn = self.draw_one_frame(
                    frames[t], preds, bboxes=bboxes, text_alpha=text_alpha,
                    ground_truth=ground_truth,
                )
                out.extend([drawn] * repeat_frame)
            else:
                out.append(np.asarray(frames[t], np.uint8))
        return out
