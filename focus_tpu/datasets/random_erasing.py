"""Random erasing (counterpart of reference ``slowfast/datasets/random_erasing.py``,
a timm port). Host-side numpy on [T, H, W, C] clips."""

from __future__ import annotations

import math

import numpy as np


class RandomErasing:
    """(reference random_erasing.py; modes: 'const', 'rand', 'pixel')."""

    def __init__(
        self,
        probability=0.5,
        min_area=0.02,
        max_area=1 / 3,
        min_aspect=0.3,
        max_aspect=None,
        mode="const",
        min_count=1,
        max_count=None,
        num_splits=0,
        cube=True,
    ):
        self.probability = probability
        self.min_area = min_area
        self.max_area = max_area
        max_aspect = max_aspect or 1 / min_aspect
        self.log_aspect_ratio = (math.log(min_aspect), math.log(max_aspect))
        self.min_count = min_count
        self.max_count = max_count or min_count
        self.mode = mode
        self.cube = cube

    def _get_pixels(self, shape, dtype, rng):
        if self.mode == "pixel":
            return rng.randn(*shape).astype(dtype)
        if self.mode == "rand":
            return rng.randn(1, 1, shape[-1]).astype(dtype)
        return np.zeros(shape, dtype)

    def __call__(self, frames: np.ndarray, rng=None) -> np.ndarray:
        """frames: [T, H, W, C] float."""
        rng = rng or np.random.RandomState()
        if rng.rand() > self.probability:
            return frames
        frames = frames.copy()
        T, H, W, C = frames.shape
        area = H * W
        count = rng.randint(self.min_count, self.max_count + 1)
        for _ in range(count):
            for _attempt in range(10):
                target_area = rng.uniform(self.min_area, self.max_area) * area / count
                aspect = math.exp(rng.uniform(*self.log_aspect_ratio))
                h = int(round(math.sqrt(target_area * aspect)))
                w = int(round(math.sqrt(target_area / aspect)))
                if w < W and h < H:
                    top = rng.randint(0, H - h)
                    left = rng.randint(0, W - w)
                    patch = self._get_pixels((h, w, C), frames.dtype, rng)
                    if self.cube:
                        frames[:, top : top + h, left : left + w] = patch
                    else:
                        t = rng.randint(0, T)
                        frames[t, top : top + h, left : left + w] = patch
                    break
        return frames
