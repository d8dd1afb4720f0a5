"""Checkpointing: save/load pytree train state + torch-checkpoint import.

Counterpart of reference ``slowfast/utils/checkpoint.py``. Native format is
flax msgpack (fast, dependency-free); ``load_torch_checkpoint`` ingests the
reference's ``.pyth``/``.pt`` torch pickles and maps them onto our pytrees
(see focus_tpu/utils/torch_import.py for the name/layout mapping).
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Optional

import jax
from flax import serialization

from focus_tpu.utils import logging

logger = logging.get_logger(__name__)

CKPT_DIR = "checkpoints"


def make_checkpoint_dir(path_to_job: str, exp_name: Optional[str] = None) -> str:
    d = get_checkpoint_dir(path_to_job, exp_name)
    if jax.process_index() == 0:
        os.makedirs(d, exist_ok=True)
    return d


def get_checkpoint_dir(path_to_job: str, exp_name: Optional[str] = None) -> str:
    if exp_name:
        return os.path.join(path_to_job, exp_name, CKPT_DIR)
    return os.path.join(path_to_job, CKPT_DIR)


def get_path_to_checkpoint(path_to_job: str, epoch: int, fmt: str = ".pyth") -> str:
    name = "checkpoint_epoch_{:05d}{}".format(epoch, fmt)
    return os.path.join(get_checkpoint_dir(path_to_job), name)


def get_last_checkpoint(path_to_job: str) -> Optional[str]:
    d = get_checkpoint_dir(path_to_job)
    names = (
        [f for f in os.listdir(d) if f.startswith("checkpoint_epoch_")]
        if os.path.exists(d)
        else []
    )
    if not names:
        return None
    return os.path.join(d, sorted(names)[-1])


def has_checkpoint(path_to_job: str) -> bool:
    return get_last_checkpoint(path_to_job) is not None


def is_checkpoint_epoch(cfg, cur_epoch: int, multigrid_schedule=None) -> bool:
    """(reference checkpoint.py:76-98)"""
    if cur_epoch + 1 == cfg.SOLVER.MAX_EPOCH:
        return True
    if multigrid_schedule is not None:
        prev_epoch = 0
        for s in multigrid_schedule:
            if cur_epoch < s[-1]:
                period = max(
                    (s[-1] - prev_epoch) // cfg.MULTIGRID.EVAL_FREQ + 1, 1
                )
                return (s[-1] - 1 - cur_epoch) % period == 0
            prev_epoch = s[-1]
    return (cur_epoch + 1) % cfg.TRAIN.CHECKPOINT_PERIOD == 0


_PENDING_SAVES: list = []


def save_checkpoint(
    path_to_job: str,
    state: Any,
    epoch: int,
    cfg,
    name: Optional[str] = None,
    fmt: str = ".pyth",
    async_write: Optional[bool] = None,
) -> Optional[str]:
    """Serialise a train-state pytree. Only process 0 writes.

    With ``async_write`` (default ``cfg.TPU.ASYNC_CHECKPOINT``) the
    device fetch is synchronous — a consistent snapshot before the next
    step mutates donated buffers — but msgpack serialisation and disk IO
    run on a background thread, overlapping the next training steps.
    Writes stay ordered (one writer thread chain) and atomic
    (.tmp + rename); call :func:`wait_for_saves` before reading a
    checkpoint back in-process or exiting."""
    # leaves sharded across hosts (tensor/pipeline/expert axes spanning
    # processes, or TPU.ZERO1 moments over a multi-host data axis) are
    # not addressable from process 0 alone — gather them collectively
    # BEFORE the proc-0 gate (every process must join the collective).
    # One batched process_allgather over all such leaves: checkpoint
    # latency scales with bytes, not with the leaf count.
    leaves, treedef = jax.tree_util.tree_flatten(state)
    remote_ix = [
        i for i, x in enumerate(leaves)
        if isinstance(x, jax.Array) and not x.is_fully_addressable
    ]
    if remote_ix:
        from jax.experimental import multihost_utils

        gathered = multihost_utils.process_allgather(
            [leaves[i] for i in remote_ix]
        )
        for i, g in zip(remote_ix, gathered):
            leaves[i] = g
        state = jax.tree_util.tree_unflatten(treedef, leaves)
    if jax.process_index() != 0:
        return None
    if async_write is None:
        async_write = bool(getattr(cfg.TPU, "ASYNC_CHECKPOINT", False))
    d = get_checkpoint_dir(path_to_job)
    os.makedirs(d, exist_ok=True)
    if name is not None:
        path = os.path.join(d, name + fmt)
    else:
        path = get_path_to_checkpoint(path_to_job, epoch, fmt)
    state = jax.device_get(state)
    cfg_dump = cfg.dump() if hasattr(cfg, "dump") else None

    def _write():
        payload = {
            "state": serialization.to_bytes(state),
            "epoch": epoch,
            "cfg": cfg_dump,
        }
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f, protocol=4)
        os.replace(tmp, path)
        logger.info(f"Saved checkpoint to {path}")

    if async_write:
        import threading

        prev = _PENDING_SAVES[-1] if _PENDING_SAVES else None

        def _chained():
            if prev is not None:
                prev.join()
            _write()

        t = threading.Thread(target=_chained, daemon=False)
        t.start()
        _PENDING_SAVES.append(t)
        # prune landed writers (keep the tail — it anchors the chain)
        while len(_PENDING_SAVES) > 1 and not _PENDING_SAVES[0].is_alive():
            _PENDING_SAVES.pop(0)
        return path
    _write()
    return path


def wait_for_saves() -> None:
    """Block until every async checkpoint write has landed."""
    while _PENDING_SAVES:
        _PENDING_SAVES.pop().join()


def load_checkpoint(path: str, state_template: Any):
    """Restore a pytree saved by save_checkpoint. Returns (state, epoch).

    Checkpoints saved under one block-stack layout (scanned [L,...] vs
    pipeline-parallel [stages, L/stages, ...], see parallel/pipeline.py)
    restore into a template using the other: on a structural mismatch the
    raw tree is re-laid-out to match the template before binding."""
    wait_for_saves()  # in-process read-after-async-write ordering
    with open(path, "rb") as f:
        payload = pickle.load(f)
    try:
        state = serialization.from_bytes(state_template, payload["state"])
    except (ValueError, KeyError):
        from focus_tpu.parallel import pipeline as pipe_lib

        raw = serialization.msgpack_restore(payload["state"])
        tmpl = serialization.to_state_dict(state_template)
        raw = pipe_lib.convert_state_dict_layout(raw, tmpl)
        state = serialization.from_state_dict(state_template, raw)
        logger.info("Converted checkpoint block-stack layout to match the "
                    "current parallelism config")
    logger.info(f"Loaded checkpoint from {path} (epoch {payload['epoch']})")
    return state, payload["epoch"]


def load_train_checkpoint(cfg, state_template):
    """Auto-resume precedence (reference checkpoint.py:544-584):
    last checkpoint in OUTPUT_DIR if AUTO_RESUME, else TRAIN.CHECKPOINT_FILE_PATH.
    Returns (state, start_epoch)."""
    if cfg.TRAIN.AUTO_RESUME and has_checkpoint(cfg.OUTPUT_DIR):
        last = get_last_checkpoint(cfg.OUTPUT_DIR)
        state, epoch = load_checkpoint(last, state_template)
        return state, epoch
    if cfg.TRAIN.CHECKPOINT_FILE_PATH:
        path = cfg.TRAIN.CHECKPOINT_FILE_PATH
        if cfg.TRAIN.CHECKPOINT_TYPE == "caffe2":
            from focus_tpu.utils import torch_import
            from focus_tpu.utils.c2_import import load_c2_state_dict

            state = torch_import.load_into_state(
                path, state_template, cfg,
                state_dict=load_c2_state_dict(path),
            )
            return state, 0
        if path.endswith((".pt", ".pt.tar", ".pyth")) and _is_torch_pickle(path):
            from focus_tpu.utils import torch_import

            state = torch_import.load_into_state(path, state_template, cfg)
            return state, 0
        state, epoch = load_checkpoint(path, state_template)
        if cfg.TRAIN.CHECKPOINT_EPOCH_RESET:
            epoch = 0
        return state, epoch
    return state_template, 0


def load_test_checkpoint(cfg, state_template):
    """Fallback chain (reference checkpoint.py:499-541): numbered epoch
    (TEST.TEST_EPOCH_NUM) -> TEST path -> last ckpt in OUTPUT_DIR ->
    TRAIN path."""
    exp_path = cfg.EXP.PATH if hasattr(cfg, "EXP") else ""
    if int(getattr(cfg.TEST, "TEST_EPOCH_NUM", 0) or 0) > 0:
        # test a SPECIFIC training epoch (reference checkpoint.py:503-506);
        # slot runs checkpoint under EXP.PATH (OUTPUT_DIR/<exp_name>)
        n = int(cfg.TEST.TEST_EPOCH_NUM)
        candidates = [
            get_path_to_checkpoint(base, n)
            for base in (cfg.OUTPUT_DIR, exp_path)
            if base
        ]
        path = next((c for c in candidates if os.path.exists(c)), None)
        if path is None:
            raise FileNotFoundError(
                f"TEST.TEST_EPOCH_NUM={n}: none of {candidates} exist"
            )
    elif cfg.TEST.CHECKPOINT_FILE_PATH:
        path = cfg.TEST.CHECKPOINT_FILE_PATH
    elif has_checkpoint(cfg.OUTPUT_DIR):
        path = get_last_checkpoint(cfg.OUTPUT_DIR)
    elif exp_path and has_checkpoint(exp_path):
        path = get_last_checkpoint(exp_path)
    elif cfg.TRAIN.CHECKPOINT_FILE_PATH:
        path = cfg.TRAIN.CHECKPOINT_FILE_PATH
    else:
        logger.info("Testing with random initialization. Only for debugging.")
        return state_template
    if cfg.TEST.CHECKPOINT_TYPE == "caffe2":
        from focus_tpu.utils import torch_import
        from focus_tpu.utils.c2_import import load_c2_state_dict

        return torch_import.load_into_state(
            path, state_template, cfg, state_dict=load_c2_state_dict(path)
        )
    if _is_torch_pickle(path):
        from focus_tpu.utils import torch_import

        return torch_import.load_into_state(path, state_template, cfg)
    state, _ = load_checkpoint(path, state_template)
    return state


def _is_torch_pickle(path: str) -> bool:
    """Sniff whether a file is a torch zipfile/legacy pickle rather than
    our msgpack payload."""
    try:
        with open(path, "rb") as f:
            magic = f.read(4)
        # torch >=1.6 saves a zip ("PK\x03\x04"); our format is a pickle
        # whose first byte is the pickle PROTO opcode \x80.
        if magic[:2] == b"PK":
            return True
        if magic[:1] == b"\x80":
            # could be either; try our loader first
            with open(path, "rb") as f:
                try:
                    payload = pickle.load(f)
                    return not (
                        isinstance(payload, dict) and "state" in payload
                    )
                except Exception:  # noqa: BLE001
                    return True
        return False
    except OSError:
        return False
