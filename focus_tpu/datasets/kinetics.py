"""Kinetics video dataset (reference ``slowfast/datasets/kinetics.py``).

CSV rows of ``path label``; decode with retry + random-replacement on
failure (reference kinetics.py:234-285); train picks a random clip, test
enumerates NUM_ENSEMBLE_VIEWS temporal x NUM_SPATIAL_CROPS spatial views.
"""

from __future__ import annotations

import os

import numpy as np

from focus_tpu.datasets import decoder, transform as xf, utils as data_utils
from focus_tpu.datasets.build import DATASET_REGISTRY
from focus_tpu.utils import logging

logger = logging.get_logger(__name__)


@DATASET_REGISTRY.register()
class Kinetics:
    def __init__(self, cfg, mode, num_retries=10):
        assert mode in ["train", "val", "test"]
        self.cfg = cfg
        self.mode = mode
        self._num_retries = num_retries
        self._num_clips = (
            1 if mode in ["train", "val"]
            else cfg.TEST.NUM_ENSEMBLE_VIEWS * cfg.TEST.NUM_SPATIAL_CROPS
        )
        # MViT-style training recipe (reference kinetics.py:60-66)
        self.aug = mode == "train" and cfg.AUG.ENABLE
        self.rand_erase = self.aug and cfg.AUG.RE_PROB > 0
        self._construct_loader()

    def _construct_loader(self):
        csv_name = {"train": "train", "val": "val", "test": "test"}[self.mode]
        path_to_file = os.path.join(
            self.cfg.DATA.PATH_TO_DATA_DIR, f"{csv_name}.csv"
        )
        assert os.path.exists(path_to_file), f"{path_to_file} not found"
        self._path_to_videos, self._labels, self._spatial_temporal_idx = [], [], []
        with open(path_to_file) as f:
            for clip_idx, line in enumerate(f.read().splitlines()):
                path, label = line.split(
                    self.cfg.DATA.PATH_LABEL_SEPARATOR
                )
                for idx in range(self._num_clips):
                    self._path_to_videos.append(
                        os.path.join(self.cfg.DATA.PATH_PREFIX, path)
                    )
                    self._labels.append(int(label))
                    self._spatial_temporal_idx.append(idx)
        logger.info(
            f"Kinetics {self.mode}: {len(self._path_to_videos)} clips "
            f"from {path_to_file}"
        )

    def __len__(self):
        return len(self._path_to_videos)

    def __getitem__(self, index):
        cfg = self.cfg
        rng = np.random.RandomState(None if self.mode == "train" else index)
        if self.mode in ["train", "val"]:
            temporal_idx = -1
            spatial_idx = -1
            min_scale, max_scale = cfg.DATA.TRAIN_JITTER_SCALES
            crop_size = cfg.DATA.TRAIN_CROP_SIZE
        else:
            temporal_idx = (
                self._spatial_temporal_idx[index] // cfg.TEST.NUM_SPATIAL_CROPS
            )
            spatial_idx = (
                self._spatial_temporal_idx[index] % cfg.TEST.NUM_SPATIAL_CROPS
            )
            min_scale, max_scale, crop_size = (
                [cfg.DATA.TEST_CROP_SIZE] * 3
                if cfg.DATA.TEST_CROP_SIZE == 256
                else [cfg.DATA.TRAIN_JITTER_SCALES[0]] * 2 + [cfg.DATA.TEST_CROP_SIZE]
            )

        # decode with retry and random replacement (reference :234-285)
        frames = None
        for r in range(self._num_retries):
            frames = decoder.decode(
                self._path_to_videos[index],
                data_utils.get_random_sampling_rate(
                    cfg.MULTIGRID.LONG_CYCLE_SAMPLING_RATE,
                    cfg.DATA.SAMPLING_RATE,
                    rng,
                ),
                cfg.DATA.NUM_FRAMES,
                clip_idx=temporal_idx,
                num_clips=cfg.TEST.NUM_ENSEMBLE_VIEWS,
                target_fps=cfg.DATA.TARGET_FPS,
                rng=rng,
                use_offset=bool(cfg.DATA.USE_OFFSET_SAMPLING),
            )
            if frames is not None:
                break
            logger.warning(
                f"Failed to decode {self._path_to_videos[index]}, retry {r}"
            )
            if r >= 2:
                index = rng.randint(len(self))
        if frames is None:
            raise RuntimeError("Failed to fetch video after retries")

        label = np.int32(self._labels[index])
        if self.aug:
            # MViT recipe: RandAugment + relative-scale crop (+motion
            # shift) + RandomErasing (reference kinetics.py:286-409);
            # AUG.NUM_SAMPLE repeated augmentations come back stacked on a
            # leading axis and are flattened into the batch by the loader
            samples = []
            for _ in range(max(cfg.AUG.NUM_SAMPLE, 1)):
                f = self._aug_frame(
                    frames, spatial_idx, min_scale, max_scale, crop_size, rng
                )
                pathways = data_utils.pack_pathway_output(cfg, f)
                samples.append(
                    pathways[0] if len(pathways) == 1 else tuple(pathways)
                )
            if cfg.AUG.NUM_SAMPLE > 1:
                videos = (
                    np.stack(samples)
                    if not isinstance(samples[0], tuple)
                    else tuple(
                        np.stack([s[i] for s in samples])
                        for i in range(len(samples[0]))
                    )
                )
                n = cfg.AUG.NUM_SAMPLE
                return (
                    videos,
                    np.full((n,), label, np.int32),
                    np.full((n,), index, np.int32),
                    {},
                )
            videos = samples[0]
            return videos, label, np.int32(index), {}

        frames = data_utils.maybe_normalize(frames, cfg)
        frames = data_utils.spatial_sampling(
            frames,
            spatial_idx=spatial_idx,
            min_scale=min_scale,
            max_scale=max_scale,
            crop_size=crop_size,
            random_horizontal_flip=cfg.DATA.RANDOM_FLIP,
            inverse_uniform_sampling=cfg.DATA.INV_UNIFORM_SAMPLE,
            rng=rng,
        )
        pathways = data_utils.pack_pathway_output(cfg, frames)
        videos = pathways[0] if len(pathways) == 1 else tuple(pathways)
        return videos, label, np.int32(index), {}

    def _aug_frame(self, frames, spatial_idx, min_scale, max_scale,
                   crop_size, rng):
        """One augmented view (reference kinetics.py:346-409): RandAugment
        on uint8 frames, normalize, relative-scale/aspect Inception crop
        (motion-shifted when DATA.TRAIN_JITTER_MOTION_SHIFT), random
        erasing."""
        cfg = self.cfg
        from focus_tpu.datasets.rand_augment import rand_augment_video

        if cfg.AUG.AA_TYPE:
            f, _ = rand_augment_video(
                frames, None, cfg.AUG.AA_TYPE, rng=rng,
                interpolation=cfg.AUG.INTERPOLATION,
            )
        else:
            f = frames
        f = data_utils.maybe_normalize(f, cfg)
        scl = list(cfg.DATA.TRAIN_JITTER_SCALES_RELATIVE)
        asp = list(cfg.DATA.TRAIN_JITTER_ASPECT_RELATIVE)
        f = data_utils.spatial_sampling(
            f,
            spatial_idx=spatial_idx,
            min_scale=min_scale,
            max_scale=max_scale,
            crop_size=crop_size,
            random_horizontal_flip=cfg.DATA.RANDOM_FLIP,
            inverse_uniform_sampling=cfg.DATA.INV_UNIFORM_SAMPLE,
            aspect_ratio=asp if asp else None,
            scale=scl if scl else None,
            motion_shift=cfg.DATA.TRAIN_JITTER_MOTION_SHIFT,
            rng=rng,
        )
        if self.rand_erase:
            from focus_tpu.datasets.random_erasing import RandomErasing

            erase = RandomErasing(
                cfg.AUG.RE_PROB, mode=cfg.AUG.RE_MODE,
                max_count=cfg.AUG.RE_COUNT, num_splits=cfg.AUG.RE_COUNT,
                mean=cfg.DATA.MEAN, std=cfg.DATA.STD,
            )
            f = erase(f, rng=rng)
        return f
