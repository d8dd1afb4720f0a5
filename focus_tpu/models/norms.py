"""Normalisation layers (counterpart of reference
``slowfast/models/batchnorm_helper.py``).

On TPU under jit with a batch-sharded mesh, flax BatchNorm statistics are
computed with *global-batch* semantics (XLA inserts the cross-device
reduction), so `batchnorm` and `sync_batchnorm` coincide — the reference's
NaiveSyncBatchNorm3d + GroupGather machinery (batchnorm_helper.py:112-218)
is replaced by the sharding annotation itself. `sub_batchnorm` keeps the
reference's per-split statistics (batchnorm_helper.py:37-109) by folding
the split index into the channel axis.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class BatchNorm(nn.Module):
    """Plain BN over the trailing channel axis of [..., C]."""

    momentum: float = 0.9  # flax momentum = 1 - torch momentum(0.1)
    epsilon: float = 1e-5
    scale_init: Any = nn.initializers.ones
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train, momentum=self.momentum,
            epsilon=self.epsilon, scale_init=self.scale_init,
            dtype=self.dtype, name="bn",
        )(x)


class _SubBNCore(nn.Module):
    """Core of SubBatchNorm, named "bn" so the param/stat tree is
    byte-identical to BatchNorm's."""

    num_splits: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    scale_init: Any = nn.initializers.ones
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = x.shape[-1]
        scale = self.param("scale", self.scale_init, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((C,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((C,), jnp.float32)
        )
        dtype = self.dtype or x.dtype
        if train:
            B, s = x.shape[0], self.num_splits
            assert B % s == 0, (B, s)
            # strided split grouping: split j = samples {i*s+j}, matching
            # the reference's view(B//s, s*C)
            xs = x.reshape((B // s, s) + x.shape[1:]).astype(jnp.float32)
            axes = (0,) + tuple(range(2, xs.ndim - 1))
            mean_s = xs.mean(axes)  # [s, C]
            var_s = ((xs - mean_s.reshape(
                (1, s) + (1,) * (xs.ndim - 3) + (C,)
            )) ** 2).mean(axes)
            x_hat = (xs - mean_s.reshape(
                (1, s) + (1,) * (xs.ndim - 3) + (C,)
            )) / jnp.sqrt(var_s.reshape(
                (1, s) + (1,) * (xs.ndim - 3) + (C,)
            ) + self.epsilon)
            x = x_hat.reshape((B,) + x.shape[1:]).astype(dtype)
            # running buffer tracks the split MIXTURE — the quantity the
            # reference's aggregate_sub_bn_stats() computes from its
            # per-split buffers before every eval/checkpoint
            mean = mean_s.mean(0)
            var = var_s.mean(0) + (mean_s ** 2).mean(0) - mean ** 2
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var
        else:
            x = (x.astype(jnp.float32) - ra_mean.value) / jnp.sqrt(
                ra_var.value + self.epsilon
            )
            x = x.astype(dtype)
        return x * scale.astype(dtype) + bias.astype(dtype)


class SubBatchNorm(nn.Module):
    """Per-split train-time statistics (reference
    batchnorm_helper.py:37-109), TPU redesign: train-mode BN uses batch
    statistics only, so per-split behaviour needs just the on-the-fly
    split stats; ONE aggregated [C] running buffer is updated with the
    split mixture each step instead of keeping [s*C] per-split buffers.
    The variable tree is therefore identical to BatchNorm, which lets
    multigrid long cycles retarget NORM_TYPE/NUM_SPLITS across shape
    changes with no state migration (reference rebuilds the trainer and
    reloads the checkpoint instead, tools/train_net.py:653-675)."""

    num_splits: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    scale_init: Any = nn.initializers.ones
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return _SubBNCore(
            num_splits=self.num_splits, momentum=self.momentum,
            epsilon=self.epsilon, scale_init=self.scale_init,
            dtype=self.dtype, name="bn",
        )(x, train=train)


def get_norm(cfg):
    """Dispatch by cfg.BN.NORM_TYPE (reference batchnorm_helper.py:15-34).

    ``final=True`` marks the last BN of a residual transform: with
    cfg.RESNET.ZERO_INIT_FINAL_BN its scale starts at zero so every
    residual block begins as identity (reference
    weight_init_helper.py:39-66 transform_final_bn)."""
    kind = cfg.BN.NORM_TYPE
    zero_final = bool(getattr(cfg.RESNET, "ZERO_INIT_FINAL_BN", False))

    def scale_init(final):
        if final and zero_final:
            return nn.initializers.zeros
        return nn.initializers.ones

    if kind in ("batchnorm", "sync_batchnorm"):
        return lambda name=None, dtype=None, final=False: BatchNorm(
            scale_init=scale_init(final), dtype=dtype, name=name
        )
    if kind == "sub_batchnorm":
        return lambda name=None, dtype=None, final=False: SubBatchNorm(
            num_splits=cfg.BN.NUM_SPLITS, scale_init=scale_init(final),
            dtype=dtype, name=name,
        )
    raise NotImplementedError(f"Norm type {kind}")
