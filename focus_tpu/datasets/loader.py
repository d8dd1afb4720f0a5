"""Host-side data loader feeding sharded device arrays.

TPU-native replacement for the reference's torch DataLoader +
DistributedSampler stack (reference ``slowfast/datasets/loader.py:85-172``):

* datasets expose ``__len__`` / ``__getitem__ -> numpy pytree`` (decode and
  per-sample augmentation stay on host CPU);
* a thread pool decodes samples concurrently (JPEG/PNG decode releases the
  GIL inside PIL, so threads scale without torch's process workers);
* batches are assembled and ``jax.device_put`` with a batch-sharded
  ``NamedSharding``, double-buffered so H2D transfer and TPU compute
  overlap — the jitted step always finds its next input resident.

Each JAX process loads only its shard of every global batch (the same
rank-sliced protocol the reference gets from DistributedSampler).
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Iterator, Optional

import jax
import numpy as np

from focus_tpu.datasets.build import build_dataset
from focus_tpu.utils import logging

logger = logging.get_logger(__name__)


_PROC_DATASET = None


def _proc_init(dataset):
    """Process-pool worker bootstrap (spawn context): the dataset is
    pickled into each worker ONCE at pool start, then reused for every
    sample. Spawned workers are fresh interpreters — no inherited jax
    threads, locks, or signal handlers (a fork-based pool deadlocks
    here: the parent holds 20+ XLA/runtime threads whose locks a forked
    child can inherit mid-held, and the preemption SIGTERM flag-handler
    would neutralise Pool.terminate)."""
    global _PROC_DATASET
    _PROC_DATASET = dataset


def _proc_get(job):
    """Fetch one sample in a worker process. ``job`` is (item, seed):
    the global numpy RNG is reseeded per item so augmentation draws are
    deterministic in (RNG_SEED, epoch, index) — the thread backend's
    draws depend on pool interleaving, and worker-persistent RNG state
    would depend on job scheduling the same way."""
    item, seed = job
    np.random.seed(seed)
    return _PROC_DATASET[item]


def _stack_tree(samples):
    """Stack a list of sample pytrees into one batched pytree."""
    first = samples[0]
    if isinstance(first, (tuple, list)):
        return type(first)(
            _stack_tree([s[i] for s in samples]) for i in range(len(first))
        )
    if isinstance(first, dict):
        return {k: _stack_tree([s[k] for s in samples]) for k in first}
    if np.isscalar(first) or (isinstance(first, np.ndarray) and first.ndim == 0):
        return np.asarray(samples)
    return np.stack(samples)


def _mark_padded(batch, pad_mask):
    """Set the sample-index leaf to -1 for batch-padding duplicates.

    pad_last repeats leading samples to keep the final batch full (static
    shapes); the reference instead evaluates each clip exactly once, so
    meters must be able to skip the duplicates. Samples follow the
    (video, label, index, metadata) convention — the index leaf of padded
    rows becomes the sentinel -1, and TestMeter/eval_epoch drop those rows.
    """
    if not pad_mask.any():
        return batch
    if isinstance(batch, (tuple, list)) and len(batch) >= 3:
        idx = batch[2]
        if (
            isinstance(idx, np.ndarray)
            and idx.ndim == 1
            and np.issubdtype(idx.dtype, np.integer)
        ):
            idx = np.where(pad_mask, -1, idx)
            return type(batch)(
                idx if i == 2 else leaf for i, leaf in enumerate(batch)
            )
    return batch


class DataLoader:
    """Batched iterator over a map-style dataset with device prefetch."""

    def __init__(
        self,
        dataset,
        global_batch_size: int,
        shuffle: bool,
        drop_last: bool,
        num_workers: int = 8,
        seed: int = 0,
        sharding: Optional[jax.sharding.Sharding] = None,
        prefetch: int = 2,
        pad_last: bool = False,
        short_cycle_factors=None,
        flatten_samples: int = 1,
        worker_backend: str = "thread",
    ):
        assert worker_backend in ("thread", "process"), worker_backend
        self.worker_backend = worker_backend
        self.dataset = dataset
        self.global_batch_size = global_batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.sharding = sharding
        self.prefetch = prefetch
        self.pad_last = pad_last
        self.short_cycle_factors = short_cycle_factors
        # repeated-augmentation factor: samples come back stacked on a
        # leading axis and are flattened into the batch (the reference's
        # multiple_samples_collate, loader.py:20-42)
        self.flatten_samples = flatten_samples
        self._proc_pool = None
        # host-time bucket accounting (BENCH_NOTES round-5, loader
        # decomposition): process_time seconds spent in (a) dataset
        # fetch (decode+transform across worker threads; for the
        # process backend this counts only the main process's share),
        # (b) collate (_stack_tree + padding + flatten), (c) device_put
        # (H2D; on the axon relay this includes per-batch
        # serialization). Enable with collect_stats(); read loader.stats.
        self.stats = None
        self.epoch = 0
        self.process_index = jax.process_index()
        self.process_count = jax.process_count()
        assert global_batch_size % self.process_count == 0, (
            f"global batch {global_batch_size} not divisible by "
            f"{self.process_count} processes"
        )
        self.local_batch_size = global_batch_size // self.process_count

    def collect_stats(self) -> dict:
        """Start accumulating host-time buckets; returns the live dict
        (fetch_s / collate_s / device_put_s process-time seconds and a
        sample counter)."""
        self.stats = {
            "fetch_s": 0.0, "collate_s": 0.0, "device_put_s": 0.0,
            "samples": 0,
        }
        return self.stats

    def set_epoch(self, epoch: int) -> None:
        """Reseed the shuffle (reference loader.shuffle_dataset)."""
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.global_batch_size
        return (n + self.global_batch_size - 1) // self.global_batch_size

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            order = rng.permutation(n)
        else:
            order = np.arange(n)
        if self.drop_last:
            order = order[: (n // self.global_batch_size) * self.global_batch_size]
        return order

    def _local_batches(self) -> Iterator[tuple]:
        order = self._epoch_indices()
        if self.short_cycle_factors:
            for local in self._short_cycle_batches(order):
                yield local, np.zeros(len(local), bool)
            return
        gb = self.global_batch_size
        for start in range(0, len(order), gb):
            batch_idx = order[start : start + gb]
            n_real = len(batch_idx)
            if self.pad_last and n_real < gb:
                batch_idx = np.concatenate(
                    [batch_idx, batch_idx[: gb - n_real]]
                )
            pad = np.arange(len(batch_idx)) >= n_real
            # contiguous slice per process so device_put sees its shard
            split = np.array_split(np.arange(len(batch_idx)), self.process_count)
            pos = split[self.process_index]
            if len(pos):
                yield batch_idx[pos], pad[pos]

    def _short_cycle_batches(self, order) -> Iterator:
        """Multigrid short cycle (reference datasets/multigrid_helper.py:19):
        batch sizes cycle [B/f0^2, B/f1^2, B] with crop factors [f0, f1, 1];
        each yielded index carries its cycle phase so the dataset crops
        accordingly (shapes repeat every 3 batches -> 3 compiled steps)."""
        f0, f1 = self.short_cycle_factors
        sizes = [
            int(round(self.global_batch_size / (f0 * f0))),
            int(round(self.global_batch_size / (f1 * f1))),
            self.global_batch_size,
        ]
        pos = 0
        phase = 0
        n = len(order)
        while pos + sizes[phase] <= n:
            gb = sizes[phase]
            batch_idx = order[pos : pos + gb]
            pos += gb
            local = np.array_split(batch_idx, self.process_count)[
                self.process_index
            ]
            if len(local):
                yield [(int(i), phase) for i in local]
            phase = (phase + 1) % 3

    def _get_process_pool(self):
        """Spawn-context ProcessPoolExecutor, created lazily and cached
        for the loader's lifetime (workers persist across epochs — the
        per-worker interpreter boot + dataset unpickle is paid once).
        The dataset must be picklable (same constraint as any spawn
        loader); a crashed worker surfaces as BrokenProcessPool on the
        next batch instead of hanging the pool."""
        if self._proc_pool is None:
            import multiprocessing as mp
            from concurrent.futures import ProcessPoolExecutor

            self._proc_pool = ProcessPoolExecutor(
                self.num_workers,
                mp_context=mp.get_context("spawn"),
                initializer=_proc_init,
                initargs=(self.dataset,),
            )
        return self._proc_pool

    def close(self) -> None:
        """Shut down the worker pool (idempotent; also ran by __del__)."""
        if self._proc_pool is not None:
            self._proc_pool.shutdown(wait=False, cancel_futures=True)
            self._proc_pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:  # noqa: BLE001 — interpreter teardown
            pass

    def _seed_for(self, item) -> int:
        i = item[0] if isinstance(item, tuple) else item
        return (
            self.seed * 1_000_003 + self.epoch * 10_007 + int(i)
        ) & 0x7FFFFFFF

    def __iter__(self) -> Iterator[Any]:
        batches = self._local_batches()
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        proc_pool = (
            self._get_process_pool()
            if self.worker_backend == "process"
            else None
        )

        def run(fetch):
            st = self.stats
            clock = time.process_time
            for idx, pad_mask in batches:
                if stop.is_set():
                    break
                t0 = clock() if st is not None else 0.0
                samples = fetch(idx)
                t1 = clock() if st is not None else 0.0
                batch = _stack_tree(samples)
                batch = _mark_padded(batch, pad_mask)
                if self.flatten_samples > 1:
                    batch = jax.tree_util.tree_map(
                        lambda a: a.reshape(-1, *a.shape[2:]), batch
                    )
                t2 = clock() if st is not None else 0.0
                if self.sharding is not None:
                    batch = jax.tree_util.tree_map(
                        lambda x: _put_global(x, self.sharding), batch
                    )
                if st is not None:
                    t3 = clock()
                    st["fetch_s"] += t1 - t0
                    st["collate_s"] += t2 - t1
                    st["device_put_s"] += t3 - t2
                    st["samples"] += len(idx)
                out_q.put(batch)

        def produce():
            try:
                if proc_pool is not None:
                    run(lambda idx: list(proc_pool.map(
                        _proc_get,
                        [(i if isinstance(i, tuple) else int(i),
                          self._seed_for(i)) for i in idx],
                    )))
                else:
                    with ThreadPoolExecutor(self.num_workers) as pool:
                        run(lambda idx: list(
                            pool.map(self.dataset.__getitem__, idx)
                        ))
            except Exception as e:  # noqa: BLE001
                out_q.put(e)
            finally:
                out_q.put(None)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()  # pool persists across epochs; close() tears down


def _put_global(local_array: np.ndarray, sharding: jax.sharding.Sharding):
    """Assemble a globally-sharded jax.Array from this process's shard."""
    if jax.process_count() == 1:
        return jax.device_put(local_array, sharding)
    global_shape = (local_array.shape[0] * jax.process_count(),) + local_array.shape[1:]
    return jax.make_array_from_process_local_data(sharding, local_array, global_shape)


def construct_loader(cfg, split: str, sharding=None, is_precise_bn: bool = False):
    """Split -> (dataset, batch, shuffle, drop_last) table mirroring the
    reference (loader.py:85-129)."""
    assert split in ["train", "val", "test"]
    if split == "train":
        dataset_name = cfg.TRAIN.DATASET
        batch_size = cfg.TRAIN.BATCH_SIZE
        shuffle, drop_last = True, True
    elif split == "val":
        dataset_name = cfg.TRAIN.DATASET
        batch_size = cfg.TRAIN.BATCH_SIZE
        shuffle, drop_last = False, False
    else:
        dataset_name = cfg.TEST.DATASET
        batch_size = cfg.TEST.BATCH_SIZE
        shuffle, drop_last = False, False
    dataset = build_dataset(dataset_name, cfg, split)
    flatten = (
        cfg.AUG.NUM_SAMPLE
        if split == "train" and cfg.AUG.ENABLE and cfg.AUG.NUM_SAMPLE > 1
        and not is_precise_bn
        else 1
    )
    short_cycle = None
    if (
        split == "train"
        and cfg.MULTIGRID.SHORT_CYCLE
        and not is_precise_bn
    ):
        short_cycle = tuple(cfg.MULTIGRID.SHORT_CYCLE_FACTORS)
    # static shapes: pad/ensemble-friendly eval keeps full batches
    return DataLoader(
        dataset,
        global_batch_size=batch_size,
        shuffle=shuffle,
        drop_last=drop_last,
        num_workers=cfg.DATA_LOADER.NUM_WORKERS,
        seed=cfg.RNG_SEED,
        sharding=sharding,
        prefetch=cfg.TPU.PREFETCH,
        pad_last=not drop_last,
        short_cycle_factors=short_cycle,
        flatten_samples=flatten,
        worker_backend=getattr(
            cfg.DATA_LOADER, "WORKER_BACKEND", "thread"
        ) or "thread",
    )


def shuffle_dataset(loader: DataLoader, cur_epoch: int) -> None:
    loader.set_epoch(cur_epoch)
