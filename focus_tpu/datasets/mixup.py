"""MixUp / CutMix (counterpart of reference ``slowfast/datasets/mixup.py``,
a timm port). Host-side numpy, applied to batches before device transfer —
returns mixed clips and soft labels.
"""

from __future__ import annotations

import numpy as np


def one_hot(labels, num_classes, on_value=1.0, off_value=0.0):
    out = np.full((len(labels), num_classes), off_value, np.float32)
    out[np.arange(len(labels)), labels] = on_value
    return out


def mixup_target(labels, num_classes, lam, smoothing):
    on = 1.0 - smoothing + smoothing / num_classes
    off = smoothing / num_classes
    y1 = one_hot(labels, num_classes, on, off)
    y2 = one_hot(labels[::-1], num_classes, on, off)
    return y1 * lam + y2 * (1.0 - lam)


def rand_bbox(shape, lam, rng):
    """Cut region for cutmix. shape: (H, W)."""
    H, W = shape
    ratio = np.sqrt(1.0 - lam)
    cut_h, cut_w = int(H * ratio), int(W * ratio)
    cy = rng.randint(H)
    cx = rng.randint(W)
    y1, y2 = np.clip(cy - cut_h // 2, 0, H), np.clip(cy + cut_h // 2, 0, H)
    x1, x2 = np.clip(cx - cut_w // 2, 0, W), np.clip(cx + cut_w // 2, 0, W)
    return y1, y2, x1, x2


class MixUp:
    """(reference mixup.py:109-192). __call__(clips [B,T,H,W,C], labels [B])
    -> (mixed clips, soft labels [B, num_classes])."""

    def __init__(
        self,
        mixup_alpha=1.0,
        cutmix_alpha=0.0,
        mix_prob=1.0,
        switch_prob=0.5,
        label_smoothing=0.1,
        num_classes=1000,
        seed=0,
    ):
        self.mixup_alpha = mixup_alpha
        self.cutmix_alpha = cutmix_alpha
        self.mix_prob = mix_prob
        self.switch_prob = switch_prob
        self.label_smoothing = label_smoothing
        self.num_classes = num_classes
        self.rng = np.random.RandomState(seed)

    def _params(self):
        lam = 1.0
        use_cutmix = False
        if self.rng.rand() < self.mix_prob:
            if self.mixup_alpha > 0.0 and self.cutmix_alpha > 0.0:
                use_cutmix = self.rng.rand() < self.switch_prob
            elif self.cutmix_alpha > 0.0:
                use_cutmix = True
            alpha = self.cutmix_alpha if use_cutmix else self.mixup_alpha
            lam = float(self.rng.beta(alpha, alpha))
        return lam, use_cutmix

    def __call__(self, clips: np.ndarray, labels: np.ndarray):
        lam, use_cutmix = self._params()
        clips = np.asarray(clips)
        if lam != 1.0:
            flipped = clips[::-1]
            if use_cutmix:
                y1, y2, x1, x2 = rand_bbox(clips.shape[-3:-1], lam, self.rng)
                clips = clips.copy()
                clips[..., y1:y2, x1:x2, :] = flipped[..., y1:y2, x1:x2, :]
                lam = 1.0 - (
                    (y2 - y1) * (x2 - x1)
                    / (clips.shape[-3] * clips.shape[-2])
                )
            else:
                clips = clips * lam + flipped * (1.0 - lam)
        targets = mixup_target(
            labels, self.num_classes, lam, self.label_smoothing
        )
        return clips.astype(np.float32), targets
