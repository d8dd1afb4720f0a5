"""ORViT: object-region attention block.

Rebuild of the reference block (reference ``slowfast/models/ORViT/orvit.py``)
as flax modules over NHWC features:

1. object crops via the gather-free separable-matmul RoIAlign
   (focus_tpu/ops/roi_align.py, replacing torchvision.ops.roi_align at
   reference ORViT/utils.py:64-71);
2. object descriptors: MLP + spatial amax-pool + learned [T, O, d]
   box-category embedding + 4->d coordinate MLP (orvit.py:135-143);
3. patch+object tokens concatenated per frame and run through trajectory
   attention over T x (H·W + O) tokens (orvit.py:145-152);
4. object-token outputs discarded; optional MotionStream (box-only joint
   attention splatted back to the patch grid via the vectorised
   boxes_to_layout) added to patch tokens (orvit.py:160-163);
5. residual + MLP (orvit.py:169-170).
"""

from typing import Any, Optional

import jax.numpy as jnp
from flax import linen as nn

from focus_tpu.models.motionformer import (
    DropPath,
    Mlp,
    SelfAttentionBlock,
    TrajectoryAttention,
    trunc_normal_02,
)
from focus_tpu.ops.layout import box2spatial_layout
from focus_tpu.ops.roi_align import roi_align
from focus_tpu.utils.box_ops import box_cxcywh_to_xyxy


class ObjectsCrops(nn.Module):
    """(reference ORViT/utils.py:30-76). features: [BS, T, H, W, d],
    boxes: [BS, T, O, 4] normalised cxcywh -> [BS, T, O, H, W, d]."""

    cfg: Any

    @nn.compact
    def __call__(self, features, boxes):
        BS, T, H, W, d = features.shape
        crop = self.cfg.DATA.TRAIN_CROP_SIZE
        xyxy = box_cxcywh_to_xyxy(boxes)
        # unnormalise to input-image pixels (reference utils.py:62-63)
        scale = jnp.asarray([crop, crop, crop, crop], xyxy.dtype)
        xyxy = xyxy * scale
        feats = features.reshape(BS * T, H, W, d)
        bx = xyxy.reshape(BS * T, -1, 4)
        out = roi_align(
            feats, bx, (H, W), spatial_scale=H / crop,
            sampling_ratio=-1, aligned=True,
        )  # [BS*T, O, H, W, d]
        O = boxes.shape[2]
        return out.reshape(BS, T, O, H, W, d)


class TwoLayerReluMlp(nn.Module):
    """linear(no bias)/relu/linear(no bias)/relu (reference orvit.py:59-72)."""

    hidden: int
    out: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, use_bias=False, kernel_init=trunc_normal_02,
                     dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.out, use_bias=False, kernel_init=trunc_normal_02,
                     dtype=self.dtype, name="fc2")(x)
        return nn.relu(x)


class MotionStream(nn.Module):
    """Box-coordinate-only stream (reference orvit.py:204-269)."""

    cfg: Any
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    nb_frames: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, box_tensors, H: int, W: int, deterministic: bool = True):
        c = self.cfg
        in_dim = c.ORVIT.MOTION_STREAM_DIM if c.ORVIT.MOTION_STREAM_DIM > 0 else self.dim
        O = c.ORVIT.O
        BS, T = box_tensors.shape[:2]

        box_emb = TwoLayerReluMlp(in_dim // 2, in_dim, dtype=self.dtype,
                                  name="c_coord_to_feature")(box_tensors)
        if c.ORVIT.MOTION_STREAM_SEP_POS_EMB:
            cat_t = self.param("box_categories_T", nn.initializers.zeros,
                               (self.nb_frames, 1, in_dim))
            cat_o = self.param("box_categories_O", nn.initializers.zeros,
                               (1, O, in_dim))
            box_categories = cat_t + cat_o
        else:
            box_categories = self.param(
                "box_categories", nn.initializers.zeros,
                (self.nb_frames, O, in_dim),
            )
        box_emb = box_categories[None].astype(box_emb.dtype) + box_emb  # [BS,T,O,d]

        flat = box_emb.reshape(BS, T * O, in_dim)
        # the reference passes the ORViT block's num_heads through
        # (orvit.py:93,237-239); ORVIT.MOTION_STREAM_N_HEADS exists in its
        # config but is never consumed
        flat, _ = SelfAttentionBlock(
            dim=in_dim, num_heads=self.num_heads,
            mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
            drop_rate=self.attn_drop,
            fast_gelu=bool(getattr(self.cfg.TPU, "FAST_GELU", False)),
            int8_dense=bool(getattr(self.cfg.TPU, "INT8_SERVING", False)),
            dtype=self.dtype, name="attn",
        )(flat, deterministic=deterministic)
        box_emb = flat.reshape(BS, T, O, in_dim)

        # splat object vectors into their boxes ('layout' mode,
        # reference orvit.py:182-190) with temporal average pooling
        ret = box2spatial_layout(box_tensors, box_emb, H, W)  # [BS,T,H,W,d]
        Tratio = T // self.cfg.MF.TEMPORAL_RESOLUTION
        if Tratio > 1:
            ret = ret.reshape(BS, -1, Tratio, H, W, in_dim).mean(axis=2)
        return ret.reshape(BS, -1, in_dim)  # [BS, T*H*W, d]


class ORViTBlock(nn.Module):
    """(reference orvit.py:39-172)"""

    cfg: Any
    dim: int = 768
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path_rate: float = 0.0
    nb_frames: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, x, metadata, thw, deterministic: bool = True):
        c = self.cfg
        box_tensors = metadata["orvit_bboxes"]
        assert box_tensors is not None

        cls_token, patch_tokens = x[:, :1], x[:, 1:]
        BS, _, d = x.shape
        T, H, W = thw
        patch_grid = patch_tokens.reshape(BS, T, H, W, d)

        Tratio = box_tensors.shape[1] // T
        box_tensors = box_tensors[:, ::Tratio]  # [BS, T, O, 4]
        O = box_tensors.shape[-2]
        box_tensors = box_tensors.astype(patch_tokens.dtype)

        # object tokens: crop -> MLP -> spatial amax (reference :135-139)
        obj = ObjectsCrops(c, name="crop_layer")(patch_grid, box_tensors)
        obj = TwoLayerReluMlp(self.dim // 2, self.dim, dtype=self.dtype,
                              name="patch_to_d")(obj)
        obj = jnp.max(obj, axis=(3, 4))  # [BS, T, O, d]

        box_categories = self.param(
            "box_categories", nn.initializers.zeros, (self.nb_frames, c.ORVIT.O, d)
        )
        box_emb = TwoLayerReluMlp(d // 2, d, dtype=self.dtype,
                                  name="c_coord_to_feature")(box_tensors)
        obj = obj + box_categories[None].astype(obj.dtype) + box_emb

        all_tokens = jnp.concatenate(
            [patch_grid.reshape(BS, T, H * W, d), obj], axis=2
        ).reshape(BS, T * (H * W + O), d)
        all_tokens = jnp.concatenate([cls_token, all_tokens], axis=1)

        all_tokens, _ = TrajectoryAttention(
            self.dim, self.num_heads, self.qkv_bias, self.attn_drop,
            self.drop, use_original_code=True,
            use_pallas=bool(c.TPU.USE_PALLAS)
            and not int(getattr(c.TPU.MESH, "SEQ", 1)) > 1,
            int8_dense=bool(getattr(c.TPU, "INT8_SERVING", False)),
            dtype=self.dtype, name="attn",
        )(
            nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(all_tokens),
            (T, H * W + O, 1),
            deterministic=deterministic,
        )

        cls_token_out, rest = all_tokens[:, :1], all_tokens[:, 1:]
        patch_out = rest.reshape(BS, T, H * W + O, d)[:, :, : H * W].reshape(
            BS, T * H * W, d
        )

        if c.ORVIT.USE_MOTION_STREAM:
            motion = MotionStream(
                cfg=c, dim=self.dim, num_heads=self.num_heads,
                mlp_ratio=self.mlp_ratio, qkv_bias=self.qkv_bias,
                drop=self.drop, attn_drop=self.attn_drop,
                nb_frames=self.nb_frames, dtype=self.dtype,
                name="motion_stream",
            )(box_tensors, H, W, deterministic=deterministic)
            motion = Mlp(
                int(self.dim * self.mlp_ratio), out_features=self.dim,
                drop=self.drop,
                fast_gelu=bool(getattr(c.TPU, "FAST_GELU", False)),
                int8_dense=bool(getattr(c.TPU, "INT8_SERVING", False)),
                dtype=self.dtype, name="motion_mlp",
            )(motion, deterministic=deterministic)
            patch_out = patch_out + motion

        patch_out = jnp.concatenate([cls_token_out, patch_out], axis=1)

        dp = DropPath(self.drop_path_rate, name="drop_path")
        x = x + dp(patch_out, deterministic=deterministic)
        y = Mlp(int(self.dim * self.mlp_ratio), drop=self.drop,
                fast_gelu=bool(getattr(c.TPU, "FAST_GELU", False)),
                int8_dense=bool(getattr(c.TPU, "INT8_SERVING", False)),
                dtype=self.dtype, name="mlp")(
            nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x),
            deterministic=deterministic,
        )
        x = x + dp(y, deterministic=deterministic)
        return x, thw
