"""TensorBoard writer (counterpart of reference
``slowfast/visualization/tensorboard_vis.py:20-236``). Gated: becomes a
no-op if tensorboard is unavailable so headless runs never fail."""

import os

import numpy as np

from focus_tpu.utils import logging

logger = logging.get_logger(__name__)

try:
    from torch.utils.tensorboard import SummaryWriter

    _HAS_TB = True
except Exception:  # noqa: BLE001
    _HAS_TB = False


def get_confusion_matrix(preds, labels, num_classes):
    """Row-normalised confusion matrix from prediction scores
    (reference visualization/utils.py get_confusion_matrix).

    preds: [N, num_classes] scores; labels: [N] ints, or [N, num_classes]
    multi-hot (Charades-style MULTI_LABEL datasets — each positive class
    contributes one row count). Returns [num_classes, num_classes] with
    rows summing to 1 (or 0)."""
    preds = np.asarray(preds)
    labels = np.asarray(labels)
    top = preds.argmax(axis=-1)
    cmtx = np.zeros((num_classes, num_classes), np.float64)
    if labels.ndim == 2:
        rows, cols = np.nonzero(labels)
        np.add.at(cmtx, (cols, top[rows]), 1.0)
    else:
        np.add.at(cmtx, (labels.astype(int), top), 1.0)
    row = cmtx.sum(axis=1, keepdims=True)
    return np.divide(cmtx, row, out=np.zeros_like(cmtx), where=row > 0)


def plot_confusion_matrix(cmtx, class_names=None, figsize=None):
    """Render a confusion matrix to a matplotlib figure (reference
    visualization/utils.py plot_confusion_matrix)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = cmtx.shape[0]
    if class_names is None:
        class_names = [str(i) for i in range(n)]
    fig = plt.figure(figsize=figsize or (6.4, 4.8))
    plt.imshow(cmtx, interpolation="nearest", cmap=plt.cm.Blues)
    plt.title("Confusion matrix")
    plt.colorbar()
    marks = np.arange(n)
    plt.xticks(marks, class_names, rotation=45, fontsize=6)
    plt.yticks(marks, class_names, fontsize=6)
    thresh = cmtx.max() / 2.0 if cmtx.size else 0.5
    if n <= 32:  # annotate only when readable
        for i in range(n):
            for j in range(n):
                plt.text(
                    j, i, f"{cmtx[i, j]:.2f}", fontsize=5,
                    horizontalalignment="center",
                    color="white" if cmtx[i, j] > thresh else "black",
                )
    plt.ylabel("True label")
    plt.xlabel("Predicted label")
    plt.tight_layout()
    return fig


def plot_topk_histogram(class_name, counts, k, class_names, figsize=None):
    """Histogram of the top-k most-predicted classes for one true class
    (reference visualization/utils.py plot_topk_histogram)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    counts = np.asarray(counts)
    k = min(k, len(counts))
    top_idx = np.argsort(-counts)[:k]
    fig = plt.figure(figsize=figsize or (6.4, 4.8))
    plt.bar(range(k), counts[top_idx], color="royalblue")
    plt.xticks(
        range(k), [str(class_names[i]) for i in top_idx],
        rotation=45, fontsize=7,
    )
    plt.title(f"Top-{k} predictions for true class {class_name}")
    plt.ylabel("frequency")
    plt.tight_layout()
    return fig


def _class_metadata(tb):
    """Resolve CLASS_NAMES/CATEGORIES/SUBSET paths to (names, parent_map,
    cm_subset_ids, hist_subset_ids) via the reference's get_class_names
    semantics (reference tensorboard_vis.py:64-91, utils/misc.py:316)."""
    from focus_tpu.visualization.video_visualizer import get_class_names

    names, parents, cm_subset = get_class_names(
        tb.CLASS_NAMES_PATH, tb.CATEGORIES_PATH,
        tb.CONFUSION_MATRIX.SUBSET_PATH,
    )
    hist_subset = None
    if tb.HISTOGRAM.SUBSET_PATH:
        _, _, hist_subset = get_class_names(
            tb.CLASS_NAMES_PATH, None, tb.HISTOGRAM.SUBSET_PATH
        )
    return names, parents, cm_subset, hist_subset


class TensorboardWriter:
    def __init__(self, cfg):
        self.cfg = cfg
        self.enabled = _HAS_TB and cfg.TENSORBOARD.ENABLE
        if not self.enabled:
            self.writer = None
            return
        if cfg.TENSORBOARD.LOG_DIR == "":
            log_dir = os.path.join(
                cfg.OUTPUT_DIR, "runs-{}".format(cfg.TRAIN.DATASET)
            )
        else:
            log_dir = os.path.join(cfg.OUTPUT_DIR, cfg.TENSORBOARD.LOG_DIR)
        self.writer = SummaryWriter(log_dir=log_dir)
        # class-name / subset metadata for eval plots (reference
        # tensorboard_vis.py:40-91)
        tb = cfg.TENSORBOARD
        (self.class_names, self.parent_map, self.cm_subset,
         self.hist_subset) = _class_metadata(tb)
        logger.info(f"Tensorboard visualization at {log_dir}")

    def add_scalars(self, data_dict, global_step=None):
        if self.writer is None:
            return
        for key, item in data_dict.items():
            self.writer.add_scalar(key, float(item), global_step)

    def add_video(self, vid_tensor, tag="Video Input", global_step=None, fps=4):
        """vid_tensor: numpy [B, T, C, H, W] in [0, 1]."""
        if self.writer is None:
            return
        import torch

        self.writer.add_video(
            tag, torch.from_numpy(np.asarray(vid_tensor)), global_step=global_step, fps=fps
        )

    def plot_eval(self, preds, labels, global_step=None):
        """Confusion-matrix and top-k histogram panels for an eval pass
        (reference tensorboard_vis.py:106-172)."""
        if self.writer is None or self.cfg.DETECTION.ENABLE:
            return
        tb = self.cfg.TENSORBOARD
        if not (tb.CONFUSION_MATRIX.ENABLE or tb.HISTOGRAM.ENABLE):
            return
        num_classes = self.cfg.MODEL.NUM_CLASSES
        cmtx = get_confusion_matrix(preds, labels, num_classes)
        names = self.class_names or [str(i) for i in range(num_classes)]
        # class-metadata files may cover a different label space than the
        # current head (e.g. a full-taxonomy names json with a fine-tuned
        # NUM_CLASSES); ids beyond the confusion matrix are dropped, and
        # missing trailing names fall back to the numeric id
        if len(names) < num_classes:
            names = names + [str(i) for i in range(len(names), num_classes)]
        in_range = lambda ids: [j for j in ids if 0 <= j < num_classes]
        if tb.CONFUSION_MATRIX.ENABLE:
            fig = plot_confusion_matrix(
                cmtx, names[:num_classes],
                figsize=tb.CONFUSION_MATRIX.FIGSIZE,
            )
            self.writer.add_figure("Confusion Matrix", fig, global_step)
            cm_subset = in_range(self.cm_subset or [])
            if cm_subset:
                sub = cmtx[cm_subset][:, cm_subset]
                fig = plot_confusion_matrix(
                    sub, [names[j] for j in cm_subset],
                    figsize=tb.CONFUSION_MATRIX.FIGSIZE,
                )
                self.writer.add_figure(
                    "Confusion Matrix Subset", fig, global_step
                )
            # per-parent-category confusion matrices (reference
            # tensorboard_vis.py:139-160)
            for parent, children in (self.parent_map or {}).items():
                children = in_range(children)
                if not children:
                    continue
                sub = cmtx[children][:, children]
                fig = plot_confusion_matrix(
                    sub, [names[j] for j in children],
                    figsize=tb.CONFUSION_MATRIX.FIGSIZE,
                )
                self.writer.add_figure(
                    "Confusion Matrices Grouped by Parent Classes/"
                    + parent,
                    fig, global_step,
                )
        if tb.HISTOGRAM.ENABLE:
            ids = in_range(self.hist_subset) if self.hist_subset else range(
                num_classes)
            for i in ids:
                fig = plot_topk_histogram(
                    names[i], cmtx[i], tb.HISTOGRAM.TOPK,
                    names[:num_classes], figsize=tb.HISTOGRAM.FIGSIZE,
                )
                self.writer.add_figure(
                    f"Top {tb.HISTOGRAM.TOPK} predictions by classes/"
                    f"{names[i]}",
                    fig, global_step,
                )

    def plot_weights_and_activations(self, tensors_dict, tag="",
                                     normalize=False, global_step=None,
                                     heat_map=True):
        """Log weight/activation arrays as images/histograms (reference
        tensorboard_vis.py:174-213)."""
        if self.writer is None:
            return
        import torch

        for name, array in tensors_dict.items():
            arr = np.asarray(array, np.float32)
            self.writer.add_histogram(tag + name, torch.from_numpy(arr),
                                      global_step)
            if heat_map and arr.ndim >= 2:
                img = arr.reshape(-1, arr.shape[-1])[:512]
                lo, hi = img.min(), img.max()
                if normalize or hi > 1.0 or lo < 0.0:
                    img = (img - lo) / (hi - lo + 1e-8)
                self.writer.add_image(
                    tag + name + "/heatmap",
                    torch.from_numpy(img[None]), global_step,
                )

    def flush(self):
        if self.writer is not None:
            self.writer.flush()

    def close(self):
        if self.writer is not None:
            self.writer.flush()
            self.writer.close()
