"""Device mesh construction and sharding helpers.

TPU-native replacement for the reference's process-group machinery
(reference ``slowfast/utils/distributed.py``, ``multiprocessing.py``): one
process per host, a ``Mesh`` over all chips with a ``data`` axis (DP) and
an optional ``model`` axis for TPU-only model sharding. Gradient psum is
inserted by XLA from the sharding annotations — there is no DDP wrapper.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from focus_tpu.utils import logging

logger = logging.get_logger(__name__)

DATA_AXIS = "data"
MODEL_AXIS = "model"


def init_distributed(cfg) -> None:
    """Multi-host init (reference mpu.run/init_process_group). On a single
    host this is a no-op; on pods, call before any jax usage."""
    if cfg.NUM_SHARDS > 1 and jax.process_count() == 1:
        import jax.distributed

        jax.distributed.initialize()


def build_mesh(cfg=None, devices=None) -> Mesh:
    """Mesh with ('data', 'model') axes.

    Device selection follows the reference's NUM_GPUS semantics
    (reference multiprocessing.py:45-57 spawns exactly NUM_GPUS
    processes per machine): on a single host, a config asking for fewer
    devices than are attached uses only that many; asking for more than
    exist falls back to all local devices (the common case when running
    an 8-GPU YAML on a 1-chip host). Multi-host runs always use the full
    global device set — per-host counts are fixed by the slice topology.
    """
    if devices is None:
        if cfg is not None and jax.process_count() == 1:
            local = jax.local_devices()
            want = int(cfg.NUM_GPUS)
            if 0 < want < len(local):
                devices = local[:want]
            else:
                if want > len(local):
                    logger.warning(
                        f"NUM_GPUS={want} > {len(local)} local devices; "
                        f"using all {len(local)}"
                    )
                devices = local
        else:
            devices = jax.devices()
    devices = np.asarray(devices)
    model = 1
    if cfg is not None:
        model = max(int(cfg.TPU.MESH.MODEL), 1)
    n = devices.size
    assert n % model == 0, f"{n} devices not divisible by model axis {model}"
    grid = devices.reshape(n // model, model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh) -> NamedSharding:
    """Leading axis split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_batch(mesh: Mesh, tree):
    """Device-put a host batch with the batch axis sharded."""
    sh = batch_sharded(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
