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
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(
            use_running_average=not train, momentum=self.momentum,
            epsilon=self.epsilon, dtype=self.dtype, name="bn",
        )(x)


class SubBatchNorm(nn.Module):
    """Per-split training statistics; aggregated stats for eval
    (reference batchnorm_helper.py:37-109). The affine transform is shared
    across splits, applied after the split BN (like the reference, which
    disables affine on the inner BNs)."""

    num_splits: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        if train and self.num_splits > 1:
            B = x.shape[0]
            s = self.num_splits
            assert B % s == 0, (B, s)
            xs = x.reshape((B // s, s) + x.shape[1:])
            xs = jnp.moveaxis(xs, 1, -2)  # [B/s, ..., s, C]
            xs = xs.reshape(xs.shape[:-2] + (s * C,))
            xs = nn.BatchNorm(
                use_running_average=False, momentum=self.momentum,
                epsilon=self.epsilon, use_bias=False, use_scale=False,
                dtype=self.dtype, name="split_bn",
            )(xs)
            xs = xs.reshape(xs.shape[:-1] + (s, C))
            xs = jnp.moveaxis(xs, -2, 1)
            x = xs.reshape((B,) + x.shape[1:])
        else:
            # eval: aggregate split stats on the fly
            bn = self.variables.get("batch_stats", {}).get("split_bn")
            if bn is not None and self.num_splits > 1:
                mean = bn["mean"].reshape(self.num_splits, C).mean(0)
                var_split = bn["var"].reshape(self.num_splits, C)
                mean_split = bn["mean"].reshape(self.num_splits, C)
                # var of mixture
                var = (
                    var_split.mean(0)
                    + (mean_split ** 2).mean(0)
                    - mean ** 2
                )
                x = (x - mean) / jnp.sqrt(var + self.epsilon)
            else:
                x = nn.BatchNorm(
                    use_running_average=True, momentum=self.momentum,
                    epsilon=self.epsilon, use_bias=False, use_scale=False,
                    dtype=self.dtype, name="split_bn_eval",
                )(x)
        return x * scale + bias


def get_norm(cfg):
    """Dispatch by cfg.BN.NORM_TYPE (reference batchnorm_helper.py:15-34)."""
    kind = cfg.BN.NORM_TYPE
    if kind in ("batchnorm", "sync_batchnorm"):
        return lambda name=None, dtype=None: BatchNorm(dtype=dtype, name=name)
    if kind == "sub_batchnorm":
        return lambda name=None, dtype=None: SubBatchNorm(
            num_splits=cfg.BN.NUM_SPLITS, dtype=dtype, name=name
        )
    raise NotImplementedError(f"Norm type {kind}")
