"""Optimizer construction (optax).

Design: instead of the reference's per-iteration ``set_lr`` mutation
(reference ``slowfast/models/optimizer.py:186-222``), every group's LR is a
pure function of the optax step count. Because the reference itself sets
lr from the fractional epoch ``cur_epoch + cur_iter/data_size`` each
iteration, an LR-of-step schedule reproduces it exactly — and keeps the
whole update on-device with zero recompiles.

Groups:
* supervised (reference optimizer.py:48-172): {main, zero-wd-1d} x
  {backbone, orvit} — NOTE the reference's ``is_bn`` check
  (``isinstance(p, _NormBase)`` on a *Parameter*) is always False, so BN
  params never get BN.WEIGHT_DECAY there; we reproduce that grouping.
* slots (reference optimizer.py:13-45 + set_slot_lr :213-222): three Adam
  groups (dvae / steve_encoder / steve_decoder) with constant, resp.
  warmup x exponential-half-life schedules.
"""

import math
from typing import Any, Callable, Dict

import jax
import optax

from focus_tpu.utils import lr_policy


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


def _label_tree(params, label_fn: Callable[[str, Any], str]):
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: label_fn(_path_str(path).lower(), leaf), params
    )


# ---------------------------------------------------------------------------
# STEVE / slot optimizer
# ---------------------------------------------------------------------------

def slot_lr_schedules(cfg) -> Dict[str, Callable]:
    """The three slot-group LR schedules as functions of global step."""
    so = cfg.SLOTS_OPTIM

    def dvae(step):
        return so.DVAE

    def _warm_decay(base):
        def f(step):
            decay = jax.numpy.exp(step / so.HALF_LIFE * math.log(0.5))
            warm = lr_policy.linear_warmup_jnp(step, 0.0, 1.0, 0, so.WARMUP_STEPS)
            return decay * warm * base

        return f

    return {"dvae": dvae, "enc": _warm_decay(so.ENC), "dec": _warm_decay(so.DEC)}


def construct_optimizer_slot(params, cfg) -> optax.GradientTransformation:
    """Global-norm clip + per-group Adam (reference construct_optimizer_slot)."""
    schedules = slot_lr_schedules(cfg)

    def label_fn(path: str, leaf) -> str:
        if path.startswith("dvae"):
            return "dvae"
        if path.startswith("steve_encoder"):
            return "enc"
        if path.startswith("steve_decoder"):
            return "dec"
        return "dvae"  # reference puts unknowns nowhere; group 0 is harmless

    labels = _label_tree(params, label_fn)
    groups = {
        name: optax.adam(learning_rate=sched) for name, sched in schedules.items()
    }
    tx = optax.multi_transform(groups, labels)
    clip = cfg.SOLVER.CLIP_GRAD_L2NORM
    if cfg.SOLVER.CLIP_GRAD_VAL:
        return optax.chain(optax.clip(cfg.SOLVER.CLIP_GRAD_VAL), tx)
    if clip:
        return optax.chain(optax.clip_by_global_norm(clip), tx)
    return tx


# ---------------------------------------------------------------------------
# Supervised optimizer
# ---------------------------------------------------------------------------

def _epoch_lr_schedule(cfg, steps_per_epoch: int, which: str,
                       epoch_offset: float = 0.0,
                       step_offset: int = 0) -> Callable:
    """LR(step) = reference get_epoch_lr(step / steps_per_epoch).

    ``epoch_offset``/``step_offset`` continue the schedule across a
    multigrid long-cycle rebuild, where the batch size (and therefore
    steps-per-epoch) changes mid-run: epoch(step) = epoch_offset +
    (step - step_offset) / new_steps_per_epoch."""

    def sched(step):
        # Host-side python math is fine: optax calls schedules with traced
        # steps, so express via jnp-compatible ops.
        import jax.numpy as jnp

        epoch = epoch_offset + (step - step_offset) / steps_per_epoch
        if cfg.SOLVER.LR_POLICY == "cosine":
            base = (
                cfg.SOLVER.ORVIT_BASE_LR if which == "orvit_lr" else cfg.SOLVER.BASE_LR
            )
            offset = (
                cfg.SOLVER.WARMUP_EPOCHS if cfg.SOLVER.COSINE_AFTER_WARMUP else 0.0
            )
            lr = (
                cfg.SOLVER.COSINE_END_LR
                + (base - cfg.SOLVER.COSINE_END_LR)
                * (jnp.cos(jnp.pi * (epoch - offset) / (cfg.SOLVER.MAX_EPOCH - offset)) + 1.0)
                * 0.5
            )
        elif cfg.SOLVER.LR_POLICY == "steps_with_relative_lrs":
            base = (
                cfg.SOLVER.ORVIT_BASE_LR if which == "orvit_lr" else cfg.SOLVER.BASE_LR
            )
            steps = jnp.array(list(cfg.SOLVER.STEPS) + [cfg.SOLVER.MAX_EPOCH])
            lrs = jnp.array(cfg.SOLVER.LRS)
            ind = jnp.clip(jnp.sum(epoch >= steps) - 1, 0, len(cfg.SOLVER.LRS) - 1)
            lr = lrs[ind] * base
        else:
            raise NotImplementedError(cfg.SOLVER.LR_POLICY)
        # linear warmup overrides
        if cfg.SOLVER.WARMUP_EPOCHS > 0:
            lr_start = cfg.SOLVER.WARMUP_START_LR
            lr_end = lr_policy.get_lr_func(cfg.SOLVER.LR_POLICY)(
                cfg, cfg.SOLVER.WARMUP_EPOCHS
            )
            alpha = (lr_end - lr_start) / cfg.SOLVER.WARMUP_EPOCHS
            warm = epoch * alpha + lr_start
            lr = jnp.where(epoch < cfg.SOLVER.WARMUP_EPOCHS, warm, lr)
        return lr

    return sched


def _base_transform(cfg, lr_sched: Callable, weight_decay: float):
    method = cfg.SOLVER.OPTIMIZING_METHOD
    if method == "sgd":
        parts = []
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(
            optax.sgd(
                learning_rate=lr_sched,
                momentum=cfg.SOLVER.MOMENTUM,
                nesterov=cfg.SOLVER.NESTEROV,
            )
        )
        return optax.chain(*parts)
    if method == "adam":
        parts = []
        if weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))
        parts.append(optax.adam(learning_rate=lr_sched))
        return optax.chain(*parts)
    if method == "adamw":
        return optax.adamw(
            learning_rate=lr_sched, eps=1e-8, weight_decay=weight_decay
        )
    raise NotImplementedError(f"Unsupported optimizer: {method}")


def construct_optimizer(
    params, cfg, steps_per_epoch: int, no_weight_decay_paths=(),
    epoch_offset: float = 0.0, step_offset: int = 0,
) -> optax.GradientTransformation:
    """Supervised optimizer with the reference's group structure."""
    zero_wd_1d = cfg.SOLVER.ZERO_WD_1D_PARAM
    use_orvit_lr = cfg.SOLVER.ORVIT_BASE_LR > 0

    def label_fn(path: str, leaf) -> str:
        orvit = "orvit" in path and use_orvit_lr
        zero = any(s in path for s in no_weight_decay_paths) or (
            zero_wd_1d and leaf.ndim <= 1
        )
        kind = "zero" if zero else "main"
        return f"orvit_{kind}" if orvit else kind

    labels = _label_tree(params, label_fn)
    main_sched = _epoch_lr_schedule(
        cfg, steps_per_epoch, "lr", epoch_offset, step_offset
    )
    groups = {
        "main": _base_transform(cfg, main_sched, cfg.SOLVER.WEIGHT_DECAY),
        "zero": _base_transform(cfg, main_sched, 0.0),
    }
    if use_orvit_lr:
        orvit_sched = _epoch_lr_schedule(
            cfg, steps_per_epoch, "orvit_lr", epoch_offset, step_offset
        )
        groups["orvit_main"] = _base_transform(cfg, orvit_sched, cfg.SOLVER.WEIGHT_DECAY)
        groups["orvit_zero"] = _base_transform(cfg, orvit_sched, 0.0)
    tx = optax.multi_transform(groups, labels)

    if cfg.SOLVER.CLIP_GRAD_VAL:
        return optax.chain(optax.clip(cfg.SOLVER.CLIP_GRAD_VAL), tx)
    if cfg.SOLVER.CLIP_GRAD_L2NORM:
        return optax.chain(optax.clip_by_global_norm(cfg.SOLVER.CLIP_GRAD_L2NORM), tx)
    return tx
