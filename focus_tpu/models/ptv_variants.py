"""CSN and R(2+1)D video backbones, native flax.

The reference exposes these model families only through its
pytorchvideo wrappers (``slowfast/models/ptv_model_builder.py:516-600``
PTVCSN, ``:601-700`` PTVR2plus1D); the library itself is an optional
torch dependency. Here they are first-class native models on the same
channels-last [B, T, H, W, C] conv machinery as the rest of the zoo,
registered under the reference's PTV names so the shipped
``configs/Kinetics/pytorchvideo/*.yaml`` build unchanged. The remaining
PTV names (PTVResNet / PTVSlowFast / PTVX3D / PTVMViT) resolve to the
native implementations of the same architectures.

Architecture semantics follow the pytorchvideo builders the reference
instantiates (create_csn / create_r2plus1d with the argument sets at
``ptv_model_builder.py:550-585`` and ``:631-686``):

- CSN (ir-CSN): ResNet bottleneck whose 3x3x3 ``conv_b`` is depthwise
  (``stage_conv_b_width_per_group=1``) and carries the full
  (temporal, spatial, spatial) stage stride; stem 3x7x7/(1,2,2) with a
  1x3x3/(1,2,2) max pool; stage strides spatial (1,2,2,2), temporal
  (1,2,2,2).
- R(2+1)D: bottleneck whose ``conv_b`` factorizes into a 1x3x3 spatial
  conv (carrying the spatial stride) -> BN -> ReLU -> 3x1x1 temporal
  conv (carrying the temporal stride); stem 1x7x7/(1,2,2), no pool;
  stage strides spatial (2,2,2,2), temporal (1,1,2,2).
"""

from typing import Any, List, Tuple

from flax import linen as nn

from focus_tpu.models.build import MODEL_REGISTRY
from focus_tpu.models.heads import ResNetBasicHead
from focus_tpu.models.norms import get_norm
from focus_tpu.models.resnet_helper import conv3d, max_pool3d

_STAGE_DEPTH = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


class CSNBottleneck(nn.Module):
    """1x1x1 -> depthwise 3x3x3 (full stride) -> 1x1x1."""

    dim_out: int
    dim_inner: int
    stride: Tuple[int, int, int]  # (t, s, s) on conv_b
    norm: Any
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = conv3d(self.dim_inner, (1, 1, 1), dtype=self.dtype, name="a")(x)
        x = self.norm(name="a_bn", dtype=self.dtype)(x, train=train)
        x = nn.relu(x)
        x = conv3d(self.dim_inner, (3, 3, 3), self.stride, (1, 1, 1),
                   groups=self.dim_inner, dtype=self.dtype, name="b")(x)
        x = self.norm(name="b_bn", dtype=self.dtype)(x, train=train)
        x = nn.relu(x)
        x = conv3d(self.dim_out, (1, 1, 1), dtype=self.dtype, name="c")(x)
        return self.norm(name="c_bn", dtype=self.dtype)(x, train=train)


class R2Plus1DBottleneck(nn.Module):
    """1x1x1 -> [1x3x3 spatial -> BN -> ReLU -> 3x1x1 temporal] -> 1x1x1.

    The factorized pair replaces pytorchvideo's ``Conv2plus1d`` (spatial
    conv first with the spatial stride, then the temporal conv with the
    temporal stride, BN+ReLU between — create_2plus1d_bottleneck_block).
    """

    dim_out: int
    dim_inner: int
    stride: Tuple[int, int, int]
    norm: Any
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        t, s = self.stride[0], self.stride[1]
        x = conv3d(self.dim_inner, (1, 1, 1), dtype=self.dtype, name="a")(x)
        x = self.norm(name="a_bn", dtype=self.dtype)(x, train=train)
        x = nn.relu(x)
        x = conv3d(self.dim_inner, (1, 3, 3), (1, s, s), (0, 1, 1),
                   dtype=self.dtype, name="b_xy")(x)
        x = self.norm(name="b_xy_bn", dtype=self.dtype)(x, train=train)
        x = nn.relu(x)
        x = conv3d(self.dim_inner, (3, 1, 1), (t, 1, 1), (1, 0, 0),
                   dtype=self.dtype, name="b_t")(x)
        x = self.norm(name="b_t_bn", dtype=self.dtype)(x, train=train)
        x = nn.relu(x)
        x = conv3d(self.dim_out, (1, 1, 1), dtype=self.dtype, name="c")(x)
        return self.norm(name="c_bn", dtype=self.dtype)(x, train=train)


_PTV_TRANS = {"csn": CSNBottleneck, "r2plus1d": R2Plus1DBottleneck}


class PTVResBlock(nn.Module):
    """Residual block with a (t, s, s)-strided shortcut (pytorchvideo
    ResBlock: add then ReLU; shortcut conv+BN when dim or stride
    changes)."""

    dim_in: int
    dim_out: int
    dim_inner: int
    stride: Tuple[int, int, int]
    trans: str
    norm: Any
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        f_x = _PTV_TRANS[self.trans](
            dim_out=self.dim_out, dim_inner=self.dim_inner,
            stride=self.stride, norm=self.norm, dtype=self.dtype,
            name="branch2",
        )(x, train=train)
        if self.dim_in != self.dim_out or any(s != 1 for s in self.stride):
            sc = conv3d(self.dim_out, (1, 1, 1), self.stride,
                        dtype=self.dtype, name="branch1")(x)
            sc = self.norm(name="branch1_bn", dtype=self.dtype)(sc, train=train)
            x = sc + f_x
        else:
            x = x + f_x
        return nn.relu(x)


class _PTVStages(nn.Module):
    """Four ResNet stages; block 0 of each stage carries the stride."""

    width: int
    depths: Tuple[int, int, int, int]
    spatial_stride: Tuple[int, int, int, int]
    temporal_stride: Tuple[int, int, int, int]
    trans: str
    norm: Any
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        dim_in = self.width
        for i, blocks in enumerate(self.depths):
            dim_out = self.width * 4 * 2 ** i
            dim_inner = dim_out // 4
            for j in range(blocks):
                stride = (
                    (self.temporal_stride[i], self.spatial_stride[i],
                     self.spatial_stride[i]) if j == 0 else (1, 1, 1)
                )
                x = PTVResBlock(
                    dim_in=dim_in if j == 0 else dim_out, dim_out=dim_out,
                    dim_inner=dim_inner, stride=stride, trans=self.trans,
                    norm=self.norm, dtype=self.dtype, name=f"s{i + 2}_res{j}",
                )(x, train=train)
            dim_in = dim_out
        return x


def _single_pathway(xs):
    # single-pathway datasets yield a raw [B,T,H,W,C] array rather than
    # a 1-list (datasets/*: pathways[0] when len==1)
    return xs[0] if isinstance(xs, (list, tuple)) else xs


@MODEL_REGISTRY.register()
class PTVCSN(nn.Module):
    """ir-CSN (reference ``ptv_model_builder.py:516-600``)."""

    cfg: Any
    dtype: Any = None

    @nn.compact
    def __call__(self, xs: List, metadata=None, bboxes=None,
                 train: bool = False):
        c = self.cfg
        norm = get_norm(c)
        w = c.RESNET.WIDTH_PER_GROUP
        x = _single_pathway(xs)
        x = conv3d(w, (3, 7, 7), (1, 2, 2), (1, 3, 3), dtype=self.dtype,
                   name="stem_conv")(x)
        x = norm(name="stem_bn", dtype=self.dtype)(x, train=train)
        x = nn.relu(x)
        x = max_pool3d(x, (1, 3, 3), (1, 2, 2), (0, 1, 1))
        x = _PTVStages(
            width=w, depths=_STAGE_DEPTH[c.RESNET.DEPTH],
            spatial_stride=(1, 2, 2, 2), temporal_stride=(1, 2, 2, 2),
            trans="csn", norm=norm, dtype=self.dtype, name="stages",
        )(x, train=train)
        return ResNetBasicHead(
            num_classes=c.MODEL.NUM_CLASSES,
            pool_size=[(c.DATA.NUM_FRAMES // 8,
                        c.DATA.TRAIN_CROP_SIZE // 32,
                        c.DATA.TRAIN_CROP_SIZE // 32)],
            dropout_rate=c.MODEL.DROPOUT_RATE,
            act_func=c.MODEL.HEAD_ACT,
            dtype=self.dtype, name="head",
        )([x], train=train)


@MODEL_REGISTRY.register()
class PTVR2plus1D(nn.Module):
    """R(2+1)D (reference ``ptv_model_builder.py:601-700``)."""

    cfg: Any
    dtype: Any = None

    @nn.compact
    def __call__(self, xs: List, metadata=None, bboxes=None,
                 train: bool = False):
        c = self.cfg
        norm = get_norm(c)
        w = c.RESNET.WIDTH_PER_GROUP
        x = _single_pathway(xs)
        x = conv3d(w, (1, 7, 7), (1, 2, 2), (0, 3, 3), dtype=self.dtype,
                   name="stem_conv")(x)
        x = norm(name="stem_bn", dtype=self.dtype)(x, train=train)
        x = nn.relu(x)
        x = _PTVStages(
            width=w, depths=_STAGE_DEPTH[c.RESNET.DEPTH],
            spatial_stride=(2, 2, 2, 2), temporal_stride=(1, 1, 2, 2),
            trans="r2plus1d", norm=norm, dtype=self.dtype, name="stages",
        )(x, train=train)
        return ResNetBasicHead(
            num_classes=c.MODEL.NUM_CLASSES,
            pool_size=[(c.DATA.NUM_FRAMES // 4,
                        c.DATA.TRAIN_CROP_SIZE // 32,
                        c.DATA.TRAIN_CROP_SIZE // 32)],
            dropout_rate=c.MODEL.DROPOUT_RATE,
            act_func=c.MODEL.HEAD_ACT,
            dtype=self.dtype, name="head",
        )([x], train=train)


def _register_aliases():
    """The reference's remaining PTV wrappers delegate to pytorchvideo
    builders of architectures the native zoo already implements
    (``ptv_model_builder.py:57-514,702``); resolve those MODEL_NAMEs to
    the native models so the pytorchvideo config folder builds."""
    from focus_tpu.models.mvit import MViT
    from focus_tpu.models.resnet_video import ResNet, SlowFast, X3D

    MODEL_REGISTRY.register(ResNet, name="PTVResNet")
    MODEL_REGISTRY.register(SlowFast, name="PTVSlowFast")
    MODEL_REGISTRY.register(X3D, name="PTVX3D")
    MODEL_REGISTRY.register(MViT, name="PTVMViT")


_register_aliases()
