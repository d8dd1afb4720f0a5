"""Preemption-aware checkpointing (TPU extension; no reference
equivalent — the reference relies on cluster requeue plus epoch-boundary
AUTO_RESUME, /root/reference/tools/train_net.py:590-607).

TPU slices get preempted routinely (spot capacity, defragmentation,
maintenance), usually with a SIGTERM and a grace window. The handler
here only sets a host-local flag; the train loops poll it at a fixed
step period through a multi-host *sync point* — every process evaluates
the same all-gather at the same iteration, so all hosts agree before
entering the collective checkpoint save — then save a mid-run
checkpoint for the current (in-progress) epoch and exit cleanly with
status 0 so the scheduler requeues. ``TRAIN.AUTO_RESUME`` then replays
the interrupted epoch: the same epoch-granularity resume semantics the
reference has, minus the lost work.

The saved ``epoch`` field is the in-progress epoch (= completed-epoch
count), matching the ``save_checkpoint(..., cur_epoch + 1)`` convention
of the end-of-epoch path. ``state.step`` carries the mid-epoch step
count, so step-driven LR schedules continue exactly; the replayed
epoch's data order is re-drawn from the epoch seed as usual.
"""

from __future__ import annotations

import signal
import threading

import numpy as np

from focus_tpu.utils import logging

logger = logging.get_logger(__name__)

_FLAG = threading.Event()
_INSTALLED = False


def request_preemption() -> None:
    """Mark this host as preempted (signal handler / test hook)."""
    _FLAG.set()


def preemption_requested() -> bool:
    return _FLAG.is_set()


def clear_preemption() -> None:
    """Reset the host-local flag (tests; between independent runs)."""
    _FLAG.clear()


def _handler(signum, frame):
    logger.info(
        f"Received signal {signum}: checkpoint-and-exit at the next "
        "preemption sync point"
    )
    _FLAG.set()


def install_signal_handlers(signals=(signal.SIGTERM,)) -> bool:
    """Install flag-setting handlers (idempotent). Returns False when not
    on the main thread, where CPython forbids signal.signal — the guard
    then still works through :func:`request_preemption`."""
    global _INSTALLED
    if _INSTALLED:
        return True
    try:
        for s in signals:
            signal.signal(s, _handler)
    except ValueError:  # not the main thread
        return False
    _INSTALLED = True
    return True


class PreemptionSignaled(Exception):
    """Raised out of a train epoch at an agreed preemption sync point.
    Carries the in-progress epoch and the latest train state (the
    epoch-loop local would otherwise be lost to the raise)."""

    def __init__(self, epoch: int, state):
        super().__init__(f"preempted during epoch {epoch}")
        self.epoch = epoch
        self.state = state


class PreemptionGuard:
    """Polls the preemption flag at a fixed iteration period, with
    multi-host agreement. ``poll(cur_iter)`` is cheap off the sync
    period (a host-side modulo); on the period it is an is_set() check
    single-host, or one tiny all-gather multi-host — every process must
    call it at the same iteration (the train loops do)."""

    def __init__(self, cfg):
        self.enabled = bool(getattr(cfg.TPU, "PREEMPTION_SAVE", True))
        self.period = max(
            int(getattr(cfg.TPU, "PREEMPT_SYNC_PERIOD", 10) or 10), 1
        )
        if self.enabled:
            install_signal_handlers()

    def poll(self, cur_iter: int) -> bool:
        if not self.enabled or (cur_iter + 1) % self.period:
            return False
        import jax

        local = preemption_requested()
        if jax.process_count() == 1:
            return local
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            np.asarray([local], np.int32)
        )
        return bool(np.asarray(flags).any())
