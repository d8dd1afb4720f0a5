"""3D-ResNet machinery: stems, residual transforms, stages, non-local.

Counterpart of reference ``slowfast/models/resnet_helper.py``,
``stem_helper.py``, ``nonlocal_helper.py``, ``operators.py``, rebuilt as
flax modules over channels-last [B, T, H, W, C] volumes (TPU conv layout).
"""

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def conv3d(features, kernel, stride=(1, 1, 1), padding=(0, 0, 0), groups=1,
           dilation=(1, 1, 1), bias=False, dtype=None, name=None):
    return nn.Conv(
        features, tuple(kernel), strides=tuple(stride),
        padding=tuple((p, p) for p in padding),
        feature_group_count=groups, use_bias=bias,
        kernel_dilation=tuple(dilation),
        kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
        dtype=dtype, name=name,
    )


def max_pool3d(x, kernel, stride, padding=(0, 0, 0)):
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max,
        (1,) + tuple(kernel) + (1,), (1,) + tuple(stride) + (1,),
        ((0, 0),) + tuple((p, p) for p in padding) + ((0, 0),),
    )


class Swish(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x * jax.nn.sigmoid(x)


class SE(nn.Module):
    """Squeeze-excitation (reference operators.py:42-73)."""

    ratio: float
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        # reference SE._round_width: min 8, divisible by 8, with a +8
        # bump when rounding lost >10% (operators.py:46-66) — checkpoint
        # shapes depend on this exactly
        dim_fc = max(8, int(C * self.ratio + 4) // 8 * 8)
        if dim_fc < 0.9 * C * self.ratio:
            dim_fc += 8
        s = x.mean(axis=(1, 2, 3), keepdims=True)
        s = nn.Conv(dim_fc, (1, 1, 1), use_bias=True, dtype=self.dtype,
                    name="fc1")(s)
        s = nn.relu(s)
        s = nn.Conv(C, (1, 1, 1), use_bias=True, dtype=self.dtype, name="fc2")(s)
        return x * jax.nn.sigmoid(s)


class ResNetBasicStem(nn.Module):
    """conv -> BN -> ReLU -> 1x3x3/1x2x2 max-pool (reference stem_helper.py:125-201)."""

    dim_out: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    padding: Tuple[int, int, int]
    norm: Callable
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3d(self.dim_out, self.kernel, self.stride, self.padding,
                   dtype=self.dtype, name="conv")(x)
        x = self.norm(name="bn", dtype=self.dtype)(x, train=train)
        x = nn.relu(x)
        return max_pool3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))


class X3DStem(nn.Module):
    """spatial conv then depthwise temporal conv (reference stem_helper.py:204-289)."""

    dim_out: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int]
    padding: Tuple[int, int, int]
    norm: Callable
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3d(self.dim_out, (1, self.kernel[1], self.kernel[2]),
                   (1, self.stride[1], self.stride[2]),
                   (0, self.padding[1], self.padding[2]),
                   dtype=self.dtype, name="conv_xy")(x)
        x = conv3d(self.dim_out, (self.kernel[0], 1, 1),
                   (self.stride[0], 1, 1), (self.padding[0], 0, 0),
                   groups=self.dim_out, dtype=self.dtype, name="conv")(x)
        x = self.norm(name="bn", dtype=self.dtype)(x, train=train)
        return nn.relu(x)


class VideoModelStem(nn.Module):
    """Per-pathway stems (reference stem_helper.py:20-122)."""

    dim_out: Sequence[int]
    kernel: Sequence
    stride: Sequence
    padding: Sequence
    norm: Callable
    stem_func_name: str = "basic_stem"
    dtype: Any = None

    @nn.compact
    def __call__(self, xs, train: bool = False):
        stem_cls = {"basic_stem": ResNetBasicStem, "x3d_stem": X3DStem}[
            self.stem_func_name
        ]
        out = []
        for p, x in enumerate(xs):
            out.append(
                stem_cls(
                    self.dim_out[p], tuple(self.kernel[p]),
                    tuple(self.stride[p]), tuple(self.padding[p]),
                    self.norm, dtype=self.dtype, name=f"pathway{p}_stem",
                )(x, train=train)
            )
        return out


class BasicTransform(nn.Module):
    """Tx3x3 -> 1x3x3 (reference resnet_helper.py:29-113)."""

    dim_out: int
    temp_kernel_size: int
    stride: int
    dim_inner: Optional[int]
    num_groups: int
    norm: Callable
    stride_1x1: bool = False
    dilation: int = 1
    block_idx: int = 0
    se_ratio: float = 0.0
    swish_inner: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        k = self.temp_kernel_size
        x = conv3d(self.dim_out, (k, 3, 3), (1, self.stride, self.stride),
                   (k // 2, 1, 1), dtype=self.dtype, name="a")(x)
        x = self.norm(name="a_bn", dtype=self.dtype)(x, train=train)
        x = nn.relu(x)
        x = conv3d(self.dim_out, (1, 3, 3), (1, 1, 1), (0, 1, 1),
                   dtype=self.dtype, name="b")(x)
        return self.norm(name="b_bn", dtype=self.dtype, final=True)(x, train=train)


class BottleneckTransform(nn.Module):
    """Tx1x1 -> 1x3x3 -> 1x1x1 (reference resnet_helper.py:256-381)."""

    dim_out: int
    temp_kernel_size: int
    stride: int
    dim_inner: int
    num_groups: int
    norm: Callable
    stride_1x1: bool = False
    dilation: int = 1
    block_idx: int = 0
    se_ratio: float = 0.0
    swish_inner: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        str1, str3 = (self.stride, 1) if self.stride_1x1 else (1, self.stride)
        k = self.temp_kernel_size
        d = self.dilation
        x = conv3d(self.dim_inner, (k, 1, 1), (1, str1, str1), (k // 2, 0, 0),
                   dtype=self.dtype, name="a")(x)
        x = self.norm(name="a_bn", dtype=self.dtype)(x, train=train)
        x = nn.relu(x)
        x = conv3d(self.dim_inner, (1, 3, 3), (1, str3, str3), (0, d, d),
                   groups=self.num_groups, dilation=(1, d, d),
                   dtype=self.dtype, name="b")(x)
        x = self.norm(name="b_bn", dtype=self.dtype)(x, train=train)
        x = nn.relu(x)
        x = conv3d(self.dim_out, (1, 1, 1), dtype=self.dtype, name="c")(x)
        return self.norm(name="c_bn", dtype=self.dtype, final=True)(x, train=train)


class X3DTransform(nn.Module):
    """1x1x1 -> Tx3x3 depthwise (+SE, swish) -> 1x1x1
    (reference resnet_helper.py:116-253)."""

    dim_out: int
    temp_kernel_size: int
    stride: int
    dim_inner: int
    num_groups: int
    norm: Callable
    stride_1x1: bool = False
    dilation: int = 1
    block_idx: int = 0
    se_ratio: float = 0.0625
    swish_inner: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        str1, str3 = (self.stride, 1) if self.stride_1x1 else (1, self.stride)
        k = self.temp_kernel_size
        d = self.dilation
        x = conv3d(self.dim_inner, (1, 1, 1), (1, str1, str1),
                   dtype=self.dtype, name="a")(x)
        x = self.norm(name="a_bn", dtype=self.dtype)(x, train=train)
        x = nn.relu(x)
        x = conv3d(self.dim_inner, (k, 3, 3), (1, str3, str3),
                   (k // 2, d, d), groups=self.num_groups,
                   dilation=(1, d, d), dtype=self.dtype, name="b")(x)
        x = self.norm(name="b_bn", dtype=self.dtype)(x, train=train)
        if self.se_ratio > 0.0 and (self.block_idx + 1) % 2:
            x = SE(self.se_ratio, dtype=self.dtype, name="se")(x)
        x = x * jax.nn.sigmoid(x) if self.swish_inner else nn.relu(x)
        x = conv3d(self.dim_out, (1, 1, 1), dtype=self.dtype, name="c")(x)
        return self.norm(name="c_bn", dtype=self.dtype, final=True)(x, train=train)


_TRANS = {
    "basic_transform": BasicTransform,
    "bottleneck_transform": BottleneckTransform,
    "x3d_transform": X3DTransform,
}


class ResBlock(nn.Module):
    """(reference resnet_helper.py:384-517)"""

    dim_in: int
    dim_out: int
    temp_kernel_size: int
    stride: int
    trans_func_name: str
    dim_inner: int
    num_groups: int
    norm: Callable
    stride_1x1: bool = False
    dilation: int = 1
    block_idx: int = 0
    drop_connect_rate: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        f_x = _TRANS[self.trans_func_name](
            dim_out=self.dim_out, temp_kernel_size=self.temp_kernel_size,
            stride=self.stride, dim_inner=self.dim_inner,
            num_groups=self.num_groups, norm=self.norm,
            stride_1x1=self.stride_1x1, dilation=self.dilation,
            block_idx=self.block_idx, dtype=self.dtype, name="branch2",
        )(x, train=train)
        if train and self.drop_connect_rate > 0.0:
            from focus_tpu.models.motionformer import drop_path

            f_x = drop_path(self.make_rng("dropout"), f_x,
                            self.drop_connect_rate)
        if self.dim_in != self.dim_out or self.stride != 1:
            sc = conv3d(self.dim_out, (1, 1, 1), (1, self.stride, self.stride),
                        dtype=self.dtype, name="branch1")(x)
            sc = self.norm(name="branch1_bn", dtype=self.dtype)(sc, train=train)
            x = sc + f_x
        else:
            x = x + f_x
        return nn.relu(x)


class Nonlocal(nn.Module):
    """(reference nonlocal_helper.py:10-148)"""

    dim_inner: int
    pool_size: Optional[Tuple[int, int, int]]
    instantiation: str
    norm: Callable
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        identity = x
        B, T, H, W, C = x.shape
        theta = nn.Conv(self.dim_inner, (1, 1, 1), dtype=self.dtype,
                        name="conv_theta")(x)
        xp = x
        if self.pool_size is not None and math.prod(self.pool_size) > 1:
            xp = max_pool3d(x, self.pool_size, self.pool_size)
        phi = nn.Conv(self.dim_inner, (1, 1, 1), dtype=self.dtype,
                      name="conv_phi")(xp)
        g = nn.Conv(self.dim_inner, (1, 1, 1), dtype=self.dtype, name="conv_g")(xp)

        th = theta.reshape(B, -1, self.dim_inner)
        ph = phi.reshape(B, -1, self.dim_inner)
        gg = g.reshape(B, -1, self.dim_inner)
        aff = jnp.einsum("btc,bpc->btp", th, ph,
                         preferred_element_type=jnp.float32)
        if self.instantiation == "softmax":
            aff = jax.nn.softmax(aff * self.dim_inner ** -0.5, axis=2)
        elif self.instantiation == "dot_product":
            aff = aff / aff.shape[2]
        else:
            raise NotImplementedError(self.instantiation)
        out = jnp.einsum("btp,bpc->btc", aff.astype(gg.dtype), gg,
                         preferred_element_type=jnp.float32).astype(x.dtype)
        out = out.reshape(B, T, H, W, self.dim_inner)
        out = nn.Conv(C, (1, 1, 1), dtype=self.dtype, name="conv_out")(out)
        out = self.norm(name="bn", dtype=self.dtype)(out, train=train)
        return identity + out


class ResStage(nn.Module):
    """Stage over p pathways (reference resnet_helper.py:519-726)."""

    dim_in: Sequence[int]
    dim_out: Sequence[int]
    stride: Sequence[int]
    temp_kernel_sizes: Sequence
    num_blocks: Sequence[int]
    dim_inner: Sequence[int]
    num_groups: Sequence[int]
    num_block_temp_kernel: Sequence[int]
    nonlocal_inds: Sequence
    nonlocal_group: Sequence[int]
    nonlocal_pool: Sequence
    dilation: Sequence[int]
    instantiation: str
    trans_func_name: str
    norm: Callable
    stride_1x1: bool = False
    drop_connect_rate: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, inputs, train: bool = False):
        temp_kernels = [
            (list(self.temp_kernel_sizes[i]) * self.num_blocks[i])[
                : self.num_block_temp_kernel[i]
            ]
            + [1] * (self.num_blocks[i] - self.num_block_temp_kernel[i])
            for i in range(len(self.temp_kernel_sizes))
        ]
        out = []
        for p, x in enumerate(inputs):
            for i in range(self.num_blocks[p]):
                x = ResBlock(
                    dim_in=self.dim_in[p] if i == 0 else self.dim_out[p],
                    dim_out=self.dim_out[p],
                    temp_kernel_size=temp_kernels[p][i],
                    stride=self.stride[p] if i == 0 else 1,
                    trans_func_name=self.trans_func_name,
                    dim_inner=self.dim_inner[p],
                    num_groups=self.num_groups[p],
                    norm=self.norm,
                    stride_1x1=self.stride_1x1,
                    dilation=self.dilation[p],
                    block_idx=i,
                    drop_connect_rate=self.drop_connect_rate,
                    dtype=self.dtype,
                    name=f"pathway{p}_res{i}",
                )(x, train=train)
                if i in self.nonlocal_inds[p]:
                    x = Nonlocal(
                        self.dim_out[p] // 2,
                        tuple(self.nonlocal_pool[p]),
                        self.instantiation,
                        self.norm,
                        dtype=self.dtype,
                        name=f"pathway{p}_nonlocal{i}",
                    )(x, train=train)
            out.append(x)
        return out
