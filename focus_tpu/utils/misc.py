"""Misc utilities (counterpart of reference ``slowfast/utils/misc.py``)."""

from __future__ import annotations

import math

import numpy as np

from focus_tpu.utils import logging

logger = logging.get_logger(__name__)


def check_nan_losses(loss) -> None:
    """(reference misc.py:26-33)"""
    if not math.isfinite(float(loss)):
        raise RuntimeError(f"ERROR: Got NaN losses {float(loss)}")


def params_count(params) -> int:
    import jax

    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(params))


def flop_count(fn, *args) -> float:
    """Analytical FLOP count of a jitted callable via XLA cost analysis
    (replaces fvcore's tracing counters, reference misc.py:78-198)."""
    import jax

    compiled = jax.jit(fn).lower(*args).compile()
    analysis = compiled.cost_analysis()
    if isinstance(analysis, list):
        analysis = analysis[0]
    return float(analysis.get("flops", 0.0))


def log_model_info(model_name: str, params, fn=None, args=None) -> None:
    """(reference misc.py:164-198)"""
    n = params_count(params)
    logger.info(f"Model: {model_name}")
    logger.info(f"Params: {n / 1e6:.2f}M")
    if fn is not None and args is not None:
        try:
            gflops = flop_count(fn, *args) / 1e9
            logger.info(f"FLOPs: {gflops:.2f} G")
        except Exception as e:  # noqa: BLE001
            logger.warning(f"FLOP count unavailable: {e}")


def is_eval_epoch(cfg, cur_epoch, multigrid_schedule=None) -> bool:
    """(reference misc.py:230-253)"""
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
    return (cur_epoch + 1) % cfg.TRAIN.EVAL_PERIOD == 0


def get_num_classes(cfg):
    """EK special-case (reference misc.py:417-424)."""
    if cfg.TRAIN.DATASET == "epickitchens":
        return {"verb": 97, "noun": 300}
    return cfg.MODEL.NUM_CLASSES
