"""DATA_LOADER.WORKER_BACKEND: "process" (spawn-context worker pool,
GIL-free) must produce the same batches as the default thread pool for a
deterministic dataset, across epochs and with last-batch padding. The
class below is module-level because spawn workers unpickle the dataset
by importing its defining module."""

import jax
import numpy as np

from focus_tpu.config import get_cfg
from focus_tpu.datasets.build import DATASET_REGISTRY
from focus_tpu.datasets.loader import construct_loader

if "Rng_probe_ds" not in DATASET_REGISTRY:

    @DATASET_REGISTRY.register()
    class Rng_probe_ds:
        def __init__(self, cfg, mode="train"):
            pass

        def __len__(self):
            return 8

        def __getitem__(self, idx):
            # deliberately uses the GLOBAL rng (like rand_augment)
            return np.random.rand(3).astype(np.float32), int(idx)


def _cfg(backend):
    cfg = get_cfg()
    cfg.MODEL.NUM_CLASSES = 5
    cfg.TRAIN.DATASET = "synthetic_classification"
    cfg.TEST.DATASET = "synthetic_classification"
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TEST.BATCH_SIZE = 6  # 16 % 6 != 0 -> exercises pad_last
    cfg.DATA.NUM_FRAMES = 2
    cfg.DATA.TRAIN_CROP_SIZE = 16
    cfg.DATA.TEST_CROP_SIZE = 16
    cfg.DATA_LOADER.NUM_WORKERS = 2
    cfg.DATA_LOADER.WORKER_BACKEND = backend
    return cfg


def test_process_backend_matches_thread_backend():
    loader_p = construct_loader(_cfg("process"), "train")
    try:
        # one cached pool serves all epochs (spawn startup paid once)
        for split, epoch in (("train", 0), ("train", 3), ("test", 0)):
            if split == "train":
                loader_b = loader_p
            else:
                loader_b = construct_loader(_cfg("process"), "test")
            loader_a = construct_loader(_cfg("thread"), split)
            loader_a.set_epoch(epoch)
            loader_b.set_epoch(epoch)
            a = [jax.tree_util.tree_map(np.asarray, b) for b in loader_a]
            b = [jax.tree_util.tree_map(np.asarray, b) for b in loader_b]
            assert len(a) == len(b) and len(a) > 0
            for ba, bb in zip(a, b):
                la = jax.tree_util.tree_leaves(ba)
                lb = jax.tree_util.tree_leaves(bb)
                assert len(la) == len(lb)
                for x, y in zip(la, lb):
                    np.testing.assert_array_equal(x, y)
            if split == "test":
                loader_b.close()
    finally:
        loader_p.close()


def test_process_backend_seeds_augmentation_deterministically():
    """Two iterations of the same epoch with the process backend give
    identical batches even for a dataset that uses the global numpy RNG
    (the per-item reseed in _proc_get)."""
    cfg = _cfg("process")
    cfg.TRAIN.DATASET = "rng_probe_ds"
    cfg.TRAIN.BATCH_SIZE = 4
    loader = construct_loader(cfg, "train")
    try:
        a = [np.asarray(b[0]) for b in loader]
        b = [np.asarray(b[0]) for b in loader]
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
    finally:
        loader.close()
