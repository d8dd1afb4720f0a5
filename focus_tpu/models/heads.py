"""Classification / detection heads (counterpart of reference
``slowfast/models/head_helper.py``). Feature volumes are channels-last
[B, T, H, W, C]; detection boxes are [B, O, 4] xyxy in input-image pixels
(static per-sample box count, padded; empty boxes produce zero features).
"""

from typing import Any, List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from focus_tpu.models.motionformer import trunc_normal_02
from focus_tpu.ops.roi_align import roi_align

_fc_init = nn.initializers.normal(stddev=0.01)


def _act(name: str):
    if name == "softmax":
        return lambda x: jax.nn.softmax(x, axis=-1)
    if name == "sigmoid":
        return jax.nn.sigmoid
    if name == "none":
        return lambda x: x
    raise NotImplementedError(name)


class ResNetRoIHead(nn.Module):
    """Detection head: temporal avg-pool -> RoIAlign -> spatial max-pool ->
    FC (reference head_helper.py:11-130). Uses the gather-free RoIAlign
    with sampling_ratio=0 semantics (adaptive = ceil, same as -1 here)."""

    num_classes: int
    pool_size: Sequence[Tuple[int, int, int]]
    resolution: Sequence[Tuple[int, int]]
    scale_factor: Sequence[int]
    dropout_rate: float = 0.0
    act_func: str = "softmax"
    aligned: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs: List[jnp.ndarray], bboxes, train: bool = False):
        assert len(inputs) == len(self.pool_size)
        pool_out = []
        for p, volume in enumerate(inputs):
            # temporal average pool to a single frame
            feat = volume.mean(axis=1)  # [B, H, W, C]
            out = roi_align(
                feat, bboxes, tuple(self.resolution[p]),
                spatial_scale=1.0 / self.scale_factor[p],
                sampling_ratio=-1, aligned=self.aligned,
            )  # [B, O, h, w, C]
            pool_out.append(out.max(axis=(2, 3)))  # spatial max pool
        x = jnp.concatenate(pool_out, axis=-1)  # [B, O, sum C]
        if self.dropout_rate > 0.0 and train:
            x = nn.Dropout(self.dropout_rate, deterministic=False)(x)
        x = nn.Dense(self.num_classes, kernel_init=_fc_init, dtype=self.dtype,
                     name="projection")(x)
        return _act(self.act_func)(x)  # [B, O, classes]


class ResNetBasicHead(nn.Module):
    """(reference head_helper.py:133-220)"""

    num_classes: int
    pool_size: Sequence  # entries may be None (global average)
    dropout_rate: float = 0.0
    act_func: str = "softmax"
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs: List[jnp.ndarray], train: bool = False):
        pool_out = []
        for p, volume in enumerate(inputs):
            ps = self.pool_size[p]
            if ps is None:
                pooled = volume.mean(axis=(1, 2, 3), keepdims=True)
            else:
                pooled = jax.lax.reduce_window(
                    volume, 0.0, jax.lax.add,
                    (1,) + tuple(ps) + (1,), (1, 1, 1, 1, 1),
                    "VALID",
                ) / float(ps[0] * ps[1] * ps[2])
            pool_out.append(pooled)
        x = jnp.concatenate(pool_out, axis=-1)  # [B, t, h, w, sumC]
        if self.dropout_rate > 0.0 and train:
            x = nn.Dropout(self.dropout_rate, deterministic=False)(x)
        x = nn.Dense(self.num_classes, kernel_init=_fc_init, dtype=self.dtype,
                     name="projection")(x)
        if not train:
            x = _act(self.act_func)(x)
            x = x.mean(axis=(1, 2, 3))
        return x.reshape(x.shape[0], -1)


class X3DHead(nn.Module):
    """(reference head_helper.py:223-361)"""

    dim_inner: int
    dim_out: int
    num_classes: int
    pool_size: Any
    dropout_rate: float = 0.0
    act_func: str = "softmax"
    bn_lin5_on: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs: List[jnp.ndarray], train: bool = False):
        x = inputs[0]
        x = nn.Conv(self.dim_inner, (1, 1, 1), use_bias=False,
                    dtype=self.dtype, name="conv_5")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype, name="conv_5_bn")(x)
        x = nn.relu(x)
        if self.pool_size is None:
            x = x.mean(axis=(1, 2, 3), keepdims=True)
        else:
            ps = tuple(self.pool_size)
            x = jax.lax.reduce_window(
                x, 0.0, jax.lax.add, (1,) + ps + (1,), (1, 1, 1, 1, 1), "VALID"
            ) / float(ps[0] * ps[1] * ps[2])
        x = nn.Conv(self.dim_out, (1, 1, 1), use_bias=False, dtype=self.dtype,
                    name="lin_5")(x)
        if self.bn_lin5_on:
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype, name="lin_5_bn")(x)
        x = nn.relu(x)
        if self.dropout_rate > 0.0 and train:
            x = nn.Dropout(self.dropout_rate, deterministic=False)(x)
        x = nn.Dense(self.num_classes, kernel_init=_fc_init, dtype=self.dtype,
                     name="projection")(x)
        if not train:
            x = _act(self.act_func)(x)
            x = x.mean(axis=(1, 2, 3))
        return x.reshape(x.shape[0], -1)
