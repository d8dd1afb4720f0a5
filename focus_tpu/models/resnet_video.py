"""ResNet-family video models: SlowFast, ResNet (C2D/I3D/Slow), X3D.

Counterpart of reference ``slowfast/models/video_model_builder.py:27-763``.
Inputs are lists of pathway tensors [B, T, H, W, C] (slow/fast split done
by the data layer's ``pack_pathway_output``).
"""

import math
from typing import Any, List

import jax.numpy as jnp
from flax import linen as nn

from focus_tpu.models.build import MODEL_REGISTRY
from focus_tpu.models.heads import ResNetBasicHead, ResNetRoIHead, X3DHead
from focus_tpu.models.mvit import round_width
from focus_tpu.models.norms import get_norm
from focus_tpu.models.resnet_helper import (
    ResStage,
    VideoModelStem,
    conv3d,
    max_pool3d,
)

_MODEL_STAGE_DEPTH = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}

_TEMPORAL_KERNEL_BASIS = {
    "2d": [[[1]], [[1]], [[1]], [[1]], [[1]]],
    "c2d": [[[1]], [[1]], [[1]], [[1]], [[1]]],
    "c2d_nopool": [[[1]], [[1]], [[1]], [[1]], [[1]]],
    "i3d": [[[5]], [[3]], [[3, 1]], [[3, 1]], [[1, 3]]],
    "i3d_nopool": [[[5]], [[3]], [[3, 1]], [[3, 1]], [[1, 3]]],
    "slow": [[[1]], [[1]], [[1]], [[3]], [[3]]],
    "slowfast": [
        [[1], [5]], [[1], [3]], [[1], [3]], [[3], [3]], [[3], [3]],
    ],
    "x3d": [[[5]], [[3]], [[3]], [[3]], [[3]]],
}

_POOL1 = {
    "2d": [[1, 1, 1]],
    "c2d": [[2, 1, 1]],
    "c2d_nopool": [[1, 1, 1]],
    "i3d": [[2, 1, 1]],
    "i3d_nopool": [[1, 1, 1]],
    "slow": [[1, 1, 1]],
    "slowfast": [[1, 1, 1], [1, 1, 1]],
    "x3d": [[1, 1, 1]],
}


class FuseFastToSlow(nn.Module):
    """(reference video_model_builder.py:98-155)"""

    dim_in: int
    fusion_conv_channel_ratio: int
    fusion_kernel: int
    alpha: int
    norm: Any
    dtype: Any = None

    @nn.compact
    def __call__(self, xs, train: bool = False):
        x_s, x_f = xs
        fuse = conv3d(
            self.dim_in * self.fusion_conv_channel_ratio,
            (self.fusion_kernel, 1, 1), (self.alpha, 1, 1),
            (self.fusion_kernel // 2, 0, 0), dtype=self.dtype, name="conv_f2s",
        )(x_f)
        fuse = self.norm(name="bn", dtype=self.dtype)(fuse, train=train)
        fuse = nn.relu(fuse)
        return [jnp.concatenate([x_s, fuse], axis=-1), x_f]


def _stage_kwargs(cfg, idx, norm, dtype):
    return dict(
        temp_kernel_sizes=_TEMPORAL_KERNEL_BASIS[cfg.MODEL.ARCH][idx + 1],
        stride=list(cfg.RESNET.SPATIAL_STRIDES[idx]),
        num_block_temp_kernel=list(cfg.RESNET.NUM_BLOCK_TEMP_KERNEL[idx]),
        nonlocal_inds=list(cfg.NONLOCAL.LOCATION[idx]),
        nonlocal_group=list(cfg.NONLOCAL.GROUP[idx]),
        nonlocal_pool=list(cfg.NONLOCAL.POOL[idx]),
        dilation=list(cfg.RESNET.SPATIAL_DILATIONS[idx]),
        instantiation=cfg.NONLOCAL.INSTANTIATION,
        trans_func_name=cfg.RESNET.TRANS_FUNC,
        stride_1x1=cfg.RESNET.STRIDE_1X1,
        norm=norm,
        dtype=dtype,
    )


@MODEL_REGISTRY.register()
class SlowFast(nn.Module):
    """(reference video_model_builder.py:158-420)"""

    cfg: Any
    dtype: Any = None

    @nn.compact
    def __call__(self, xs: List, metadata=None, bboxes=None, train: bool = False):
        # single-pathway datasets yield a raw [B,T,H,W,C] array rather
        # than a 1-list (datasets/*: pathways[0] when len==1)
        if not isinstance(xs, (list, tuple)):
            xs = [xs]
        c = self.cfg
        norm = get_norm(c)
        pool_size = _POOL1[c.MODEL.ARCH]
        d2, d3, d4, d5 = _MODEL_STAGE_DEPTH[c.RESNET.DEPTH]
        ng = c.RESNET.NUM_GROUPS
        w = c.RESNET.WIDTH_PER_GROUP
        dim_inner = ng * w
        beta = c.SLOWFAST.BETA_INV
        ratio = beta // c.SLOWFAST.FUSION_CONV_CHANNEL_RATIO
        tk = _TEMPORAL_KERNEL_BASIS[c.MODEL.ARCH]

        fuse = lambda dim, name: FuseFastToSlow(
            dim, c.SLOWFAST.FUSION_CONV_CHANNEL_RATIO,
            c.SLOWFAST.FUSION_KERNEL_SZ, c.SLOWFAST.ALPHA, norm,
            dtype=self.dtype, name=name,
        )

        x = VideoModelStem(
            dim_out=[w, w // beta],
            kernel=[tk[0][0] + [7, 7], tk[0][1] + [7, 7]],
            stride=[[1, 2, 2]] * 2,
            padding=[[tk[0][0][0] // 2, 3, 3], [tk[0][1][0] // 2, 3, 3]],
            norm=norm, dtype=self.dtype, name="s1",
        )(xs, train=train)
        x = fuse(w // beta, "s1_fuse")(x, train=train)
        x = ResStage(
            dim_in=[w + w // ratio, w // beta],
            dim_out=[w * 4, w * 4 // beta],
            dim_inner=[dim_inner, dim_inner // beta],
            num_blocks=[d2] * 2, num_groups=[ng] * 2,
            **_stage_kwargs(c, 0, norm, self.dtype), name="s2",
        )(x, train=train)
        x = fuse(w * 4 // beta, "s2_fuse")(x, train=train)
        x = [
            max_pool3d(xp, pool_size[p], pool_size[p])
            for p, xp in enumerate(x)
        ]
        x = ResStage(
            dim_in=[w * 4 + w * 4 // ratio, w * 4 // beta],
            dim_out=[w * 8, w * 8 // beta],
            dim_inner=[dim_inner * 2, dim_inner * 2 // beta],
            num_blocks=[d3] * 2, num_groups=[ng] * 2,
            **_stage_kwargs(c, 1, norm, self.dtype), name="s3",
        )(x, train=train)
        x = fuse(w * 8 // beta, "s3_fuse")(x, train=train)
        x = ResStage(
            dim_in=[w * 8 + w * 8 // ratio, w * 8 // beta],
            dim_out=[w * 16, w * 16 // beta],
            dim_inner=[dim_inner * 4, dim_inner * 4 // beta],
            num_blocks=[d4] * 2, num_groups=[ng] * 2,
            **_stage_kwargs(c, 2, norm, self.dtype), name="s4",
        )(x, train=train)
        x = fuse(w * 16 // beta, "s4_fuse")(x, train=train)
        x = ResStage(
            dim_in=[w * 16 + w * 16 // ratio, w * 16 // beta],
            dim_out=[w * 32, w * 32 // beta],
            dim_inner=[dim_inner * 8, dim_inner * 8 // beta],
            num_blocks=[d5] * 2, num_groups=[ng] * 2,
            **_stage_kwargs(c, 3, norm, self.dtype), name="s5",
        )(x, train=train)

        if c.DETECTION.ENABLE:
            return ResNetRoIHead(
                num_classes=c.MODEL.NUM_CLASSES,
                pool_size=[
                    (c.DATA.NUM_FRAMES // c.SLOWFAST.ALPHA // pool_size[0][0], 1, 1),
                    (c.DATA.NUM_FRAMES // pool_size[1][0], 1, 1),
                ],
                resolution=[(c.DETECTION.ROI_XFORM_RESOLUTION,) * 2] * 2,
                scale_factor=[c.DETECTION.SPATIAL_SCALE_FACTOR] * 2,
                dropout_rate=c.MODEL.DROPOUT_RATE,
                act_func=c.MODEL.HEAD_ACT,
                aligned=c.DETECTION.ALIGNED,
                dtype=self.dtype, name="head",
            )(x, bboxes, train=train)
        return ResNetBasicHead(
            num_classes=c.MODEL.NUM_CLASSES,
            pool_size=[None, None]
            if c.MULTIGRID.SHORT_CYCLE
            else [
                (
                    c.DATA.NUM_FRAMES // c.SLOWFAST.ALPHA // pool_size[0][0],
                    c.DATA.TRAIN_CROP_SIZE // 32 // pool_size[0][1],
                    c.DATA.TRAIN_CROP_SIZE // 32 // pool_size[0][2],
                ),
                (
                    c.DATA.NUM_FRAMES // pool_size[1][0],
                    c.DATA.TRAIN_CROP_SIZE // 32 // pool_size[1][1],
                    c.DATA.TRAIN_CROP_SIZE // 32 // pool_size[1][2],
                ),
            ],
            dropout_rate=c.MODEL.DROPOUT_RATE,
            act_func=c.MODEL.HEAD_ACT,
            dtype=self.dtype, name="head",
        )(x, train=train)


@MODEL_REGISTRY.register()
class ResNet(nn.Module):
    """Single-pathway C2D/I3D/Slow (reference video_model_builder.py:423-615)."""

    cfg: Any
    dtype: Any = None

    @nn.compact
    def __call__(self, xs: List, metadata=None, bboxes=None, train: bool = False):
        # single-pathway datasets yield a raw [B,T,H,W,C] array rather
        # than a 1-list (datasets/*: pathways[0] when len==1)
        if not isinstance(xs, (list, tuple)):
            xs = [xs]
        c = self.cfg
        norm = get_norm(c)
        pool_size = _POOL1[c.MODEL.ARCH]
        d2, d3, d4, d5 = _MODEL_STAGE_DEPTH[c.RESNET.DEPTH]
        ng = c.RESNET.NUM_GROUPS
        w = c.RESNET.WIDTH_PER_GROUP
        dim_inner = ng * w
        tk = _TEMPORAL_KERNEL_BASIS[c.MODEL.ARCH]

        x = VideoModelStem(
            dim_out=[w], kernel=[tk[0][0] + [7, 7]], stride=[[1, 2, 2]],
            padding=[[tk[0][0][0] // 2, 3, 3]], norm=norm, dtype=self.dtype,
            name="s1",
        )(xs, train=train)
        dims = [(w, w * 4, dim_inner, d2), (w * 4, w * 8, dim_inner * 2, d3),
                (w * 8, w * 16, dim_inner * 4, d4),
                (w * 16, w * 32, dim_inner * 8, d5)]
        for i, (din, dout, dinner, nb) in enumerate(dims):
            x = ResStage(
                dim_in=[din], dim_out=[dout], dim_inner=[dinner],
                num_blocks=[nb], num_groups=[ng],
                **_stage_kwargs(c, i, norm, self.dtype), name=f"s{i + 2}",
            )(x, train=train)
            if i == 0:
                x = [max_pool3d(x[0], pool_size[0], pool_size[0])]

        if c.DETECTION.ENABLE:
            return ResNetRoIHead(
                num_classes=c.MODEL.NUM_CLASSES,
                pool_size=[(c.DATA.NUM_FRAMES // pool_size[0][0], 1, 1)],
                resolution=[(c.DETECTION.ROI_XFORM_RESOLUTION,) * 2],
                scale_factor=[c.DETECTION.SPATIAL_SCALE_FACTOR],
                dropout_rate=c.MODEL.DROPOUT_RATE,
                act_func=c.MODEL.HEAD_ACT,
                aligned=c.DETECTION.ALIGNED,
                dtype=self.dtype, name="head",
            )(x, bboxes, train=train)
        return ResNetBasicHead(
            num_classes=c.MODEL.NUM_CLASSES,
            pool_size=[None]
            if c.MULTIGRID.SHORT_CYCLE
            else [
                (
                    c.DATA.NUM_FRAMES // pool_size[0][0],
                    c.DATA.TRAIN_CROP_SIZE // 32 // pool_size[0][1],
                    c.DATA.TRAIN_CROP_SIZE // 32 // pool_size[0][2],
                )
            ],
            dropout_rate=c.MODEL.DROPOUT_RATE,
            act_func=c.MODEL.HEAD_ACT,
            dtype=self.dtype, name="head",
        )(x, train=train)


@MODEL_REGISTRY.register()
class X3D(nn.Module):
    """(reference video_model_builder.py:618-761)"""

    cfg: Any
    dtype: Any = None

    @nn.compact
    def __call__(self, xs: List, metadata=None, bboxes=None, train: bool = False):
        # single-pathway datasets yield a raw [B,T,H,W,C] array rather
        # than a 1-list (datasets/*: pathways[0] when len==1)
        if not isinstance(xs, (list, tuple)):
            xs = [xs]
        c = self.cfg
        norm = get_norm(c)
        ng = c.RESNET.NUM_GROUPS
        w = c.RESNET.WIDTH_PER_GROUP
        dim_inner = ng * w
        w_mul, d_mul = c.X3D.WIDTH_FACTOR, c.X3D.DEPTH_FACTOR
        dim_c1 = c.X3D.DIM_C1
        exp_stage = 2.0
        dim_res2 = (
            round_width(dim_c1, exp_stage, divisor=8)
            if c.X3D.SCALE_RES2 else dim_c1
        )
        dim_res3 = round_width(dim_res2, exp_stage, divisor=8)
        dim_res4 = round_width(dim_res3, exp_stage, divisor=8)
        dim_res5 = round_width(dim_res4, exp_stage, divisor=8)
        block_basis = [
            (1, dim_res2, 2), (2, dim_res3, 2), (5, dim_res4, 2),
            (3, dim_res5, 2),
        ]
        tk = _TEMPORAL_KERNEL_BASIS[c.MODEL.ARCH]
        dim_res1 = round_width(dim_c1, w_mul)

        x = VideoModelStem(
            dim_out=[dim_res1], kernel=[tk[0][0] + [3, 3]],
            stride=[[1, 2, 2]], padding=[[tk[0][0][0] // 2, 1, 1]],
            norm=norm, stem_func_name="x3d_stem", dtype=self.dtype, name="s1",
        )(xs, train=train)

        dim_in = dim_res1
        dim_out = dim_in
        for stage, (blocks, dim_base, stride) in enumerate(block_basis):
            dim_out = round_width(dim_base, w_mul)
            dim_inner_s = int(c.X3D.BOTTLENECK_FACTOR * dim_out)
            n_rep = int(math.ceil(d_mul * blocks)) if d_mul else blocks
            x = ResStage(
                dim_in=[dim_in], dim_out=[dim_out], dim_inner=[dim_inner_s],
                temp_kernel_sizes=tk[1],
                stride=[stride], num_blocks=[n_rep],
                num_groups=[dim_inner_s] if c.X3D.CHANNELWISE_3x3x3 else [ng],
                num_block_temp_kernel=[n_rep],
                nonlocal_inds=list(c.NONLOCAL.LOCATION[0]),
                nonlocal_group=list(c.NONLOCAL.GROUP[0]),
                nonlocal_pool=list(c.NONLOCAL.POOL[0]),
                dilation=list(c.RESNET.SPATIAL_DILATIONS[stage]),
                instantiation=c.NONLOCAL.INSTANTIATION,
                trans_func_name=c.RESNET.TRANS_FUNC,
                stride_1x1=c.RESNET.STRIDE_1X1,
                norm=norm,
                drop_connect_rate=c.MODEL.DROPCONNECT_RATE
                * (stage + 2) / (len(block_basis) + 1),
                dtype=self.dtype, name=f"s{stage + 2}",
            )(x, train=train)
            dim_in = dim_out

        spat_sz = int(math.ceil(c.DATA.TRAIN_CROP_SIZE / 32.0))
        dim_inner_head = int(c.X3D.BOTTLENECK_FACTOR * dim_out)
        return X3DHead(
            dim_inner=dim_inner_head, dim_out=c.X3D.DIM_C5,
            num_classes=c.MODEL.NUM_CLASSES,
            pool_size=(c.DATA.NUM_FRAMES, spat_sz, spat_sz),
            dropout_rate=c.MODEL.DROPOUT_RATE,
            act_func=c.MODEL.HEAD_ACT,
            bn_lin5_on=c.X3D.BN_LIN5,
            dtype=self.dtype, name="head",
        )(x, train=train)
