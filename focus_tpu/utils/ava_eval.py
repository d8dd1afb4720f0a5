"""AVA frame-level mAP evaluation.

Clean-room replacement for the reference's vendored TF object-detection
evaluator (reference ``slowfast/utils/ava_evaluation/`` ~3100 LoC +
``ava_eval_helper.py``): PASCAL-VOC-style average precision per action
class at IoU 0.5 between predicted and ground-truth person boxes, averaged
over classes present in the ground truth. Pure numpy.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Tuple

import numpy as np


def _iou(box, boxes):
    x1 = np.maximum(box[0], boxes[:, 0])
    y1 = np.maximum(box[1], boxes[:, 1])
    x2 = np.minimum(box[2], boxes[:, 2])
    y2 = np.minimum(box[3], boxes[:, 3])
    inter = np.maximum(x2 - x1, 0) * np.maximum(y2 - y1, 0)
    a1 = (box[2] - box[0]) * (box[3] - box[1])
    a2 = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / np.maximum(a1 + a2 - inter, 1e-10)


def _voc_ap(rec, prec):
    """All-points interpolated AP (VOC 2010+ / COCO style)."""
    mrec = np.concatenate([[0.0], rec, [1.0]])
    mpre = np.concatenate([[0.0], prec, [0.0]])
    for i in range(len(mpre) - 2, -1, -1):
        mpre[i] = max(mpre[i], mpre[i + 1])
    idx = np.where(mrec[1:] != mrec[:-1])[0]
    return float(np.sum((mrec[idx + 1] - mrec[idx]) * mpre[idx + 1]))


def evaluate_ava_map(
    detections: List[Tuple[str, np.ndarray, np.ndarray, np.ndarray]],
    groundtruth: List[Tuple[str, np.ndarray, np.ndarray]],
    num_classes: int,
    iou_thresh: float = 0.5,
) -> Dict[str, float]:
    """detections: list of (image_key, boxes [N,4], scores [N,C] or
    per-class, labels implicit as columns); here each det entry is
    (key, boxes, class_ids, scores) with flat per-(box,class) rows.
    groundtruth: (key, boxes, class_ids).
    Returns {'map': value, 'ap_per_class': dict}."""
    gt_by_class: Dict[int, Dict[str, np.ndarray]] = defaultdict(dict)
    npos = defaultdict(int)
    for key, boxes, classes in groundtruth:
        for c in np.unique(classes):
            sel = boxes[classes == c]
            gt_by_class[int(c)][key] = sel
            npos[int(c)] += len(sel)

    det_by_class: Dict[int, List] = defaultdict(list)
    for key, boxes, classes, scores in detections:
        for b, c, s in zip(boxes, classes, scores):
            det_by_class[int(c)].append((key, float(s), b))

    aps = {}
    for c, n_gt in npos.items():
        if n_gt == 0:
            continue
        dets = sorted(det_by_class.get(c, []), key=lambda r: -r[1])
        tp = np.zeros(len(dets))
        fp = np.zeros(len(dets))
        used: Dict[str, np.ndarray] = {}
        for i, (key, score, box) in enumerate(dets):
            gts = gt_by_class[c].get(key)
            if gts is None or len(gts) == 0:
                fp[i] = 1
                continue
            if key not in used:
                used[key] = np.zeros(len(gts), bool)
            ious = _iou(np.asarray(box), gts)
            j = int(np.argmax(ious))
            if ious[j] >= iou_thresh and not used[key][j]:
                tp[i] = 1
                used[key][j] = True
            else:
                fp[i] = 1
        rec = np.cumsum(tp) / n_gt
        prec = np.cumsum(tp) / np.maximum(np.cumsum(tp) + np.cumsum(fp), 1e-10)
        aps[c] = _voc_ap(rec, prec)

    mean_ap = float(np.mean(list(aps.values()))) if aps else 0.0
    return {"map": mean_ap, "ap_per_class": aps}


def run_evaluation_from_buffers(
    all_preds, all_ori_boxes, all_masks, all_keys, num_classes,
    score_thresh: float = 0.0, groundtruth=None,
):
    """Convert buffered eval batches ([B,O,C] scores, [B,O,4] boxes,
    [B,O] masks, [B] keys) into detection rows and score against
    groundtruth (same row format)."""
    detections = []
    for preds, boxes, mask, key in zip(
        all_preds, all_ori_boxes, all_masks, all_keys
    ):
        valid = mask > 0
        b = boxes[valid]
        p = preds[valid]
        rows_boxes, rows_cls, rows_scores = [], [], []
        for bi in range(len(b)):
            for c in range(num_classes):
                if p[bi, c] > score_thresh:
                    rows_boxes.append(b[bi])
                    rows_cls.append(c + 1)
                    rows_scores.append(p[bi, c])
        if rows_boxes:
            detections.append(
                (key, np.asarray(rows_boxes), np.asarray(rows_cls),
                 np.asarray(rows_scores))
            )
    return evaluate_ava_map(detections, groundtruth or [], num_classes)
