"""MViT: Multiscale Vision Transformer with pooled q/kv attention.

Rebuild of the reference (reference
``slowfast/models/video_model_builder.py:764-1100``,
``slowfast/models/attention.py:16-350``) as flax modules, channels-last.
Pooling operates on [B*heads, T, H, W, head_dim] volumes; the 'conv' mode
is a depthwise 3D conv (feature_group_count = head_dim). ORViT blocks can
replace (ORVIT.LAYERS) or be residually added to (ORVIT.ADD_LAYERS)
backbone blocks, as in the reference forward (:1077-1082).
"""

import math
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from focus_tpu.models.build import MODEL_REGISTRY
from focus_tpu.models.motionformer import (
    DropPath,
    Mlp,
    int8_or_dense,
    trunc_normal_02,
)
from focus_tpu.ops.attention import joint_attention


def round_width(width, multiplier, min_width=1, divisor=1):
    """(reference models/utils.py:31-44)"""
    if not multiplier:
        return width
    width *= multiplier
    min_width = min_width or divisor
    width_out = max(min_width, int(width + divisor / 2) // divisor * divisor)
    if width_out < 0.9 * width:
        width_out += divisor
    return int(width_out)


def _pool3d(x, kind: str, kernel, stride, padding):
    """x: [N, T, H, W, C]; torch-style ceil_mode=False pooling."""
    dims = (1,) + tuple(kernel) + (1,)
    strides = (1,) + tuple(stride) + (1,)
    pads = ((0, 0),) + tuple((p, p) for p in padding) + ((0, 0),)
    if kind == "max":
        return jax.lax.reduce_window(
            x, -jnp.inf, jax.lax.max, dims, strides, pads
        )
    summed = jax.lax.reduce_window(x, 0.0, jax.lax.add, dims, strides, pads)
    counts = jax.lax.reduce_window(
        jnp.ones_like(x), 0.0, jax.lax.add, dims, strides, pads
    )
    return summed / counts


class AttentionPool(nn.Module):
    """One pooling operator (conv/max/avg) applied per head
    (reference attention.py:16-50 attention_pool + the pool modules)."""

    head_dim: int
    kernel: Tuple[int, ...]
    stride: Tuple[int, ...]
    mode: str
    with_norm: bool
    dtype: Any = None

    @nn.compact
    def __call__(self, x, thw, has_cls: bool):
        """x: [B, heads, L, head_dim] -> pooled x, new thw."""
        if not self.kernel:
            return x, thw
        B, H_, L, C = x.shape
        cls_tok = None
        if has_cls:
            cls_tok, x = x[:, :, :1], x[:, :, 1:]
        T, Hh, Ww = thw
        vol = x.reshape(B * H_, T, Hh, Ww, C)
        padding = tuple(int(k // 2) for k in self.kernel)
        if self.mode == "conv":
            vol = nn.Conv(
                C, self.kernel, strides=self.stride,
                padding=tuple((p, p) for p in padding),
                feature_group_count=C, use_bias=False,
                kernel_init=trunc_normal_02, dtype=self.dtype, name="pool",
            )(vol)
        else:
            vol = _pool3d(vol, self.mode, self.kernel, self.stride, padding)
        new_thw = vol.shape[1:4]
        x = vol.reshape(B, H_, -1, C)
        if has_cls:
            x = jnp.concatenate([cls_tok, x], axis=2)
        if self.with_norm:
            x = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        return x, tuple(new_thw)


class MultiScaleAttention(nn.Module):
    """(reference attention.py:52-262)"""

    dim: int
    num_heads: int
    qkv_bias: bool = False
    drop_rate: float = 0.0
    kernel_q: Tuple[int, ...] = ()
    kernel_kv: Tuple[int, ...] = ()
    stride_q: Tuple[int, ...] = ()
    stride_kv: Tuple[int, ...] = ()
    has_cls_embed: bool = True
    mode: str = "conv"
    pool_first: bool = False
    int8_dense: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, thw, deterministic: bool = True):
        B, N, C = x.shape
        h = self.num_heads
        hd = C // h
        scale = hd ** -0.5
        quant = self.int8_dense and deterministic
        dense = lambda name: lambda inp: int8_or_dense(
            C, name, self.qkv_bias, inp, quant, self.dtype
        )
        to_heads = lambda t: t.reshape(B, -1, h, hd).transpose(0, 2, 1, 3)
        from_heads = lambda t: t.transpose(0, 2, 1, 3).reshape(B, -1, C)

        if self.pool_first:
            q = k = v = to_heads(x.reshape(B, N, h, hd).reshape(B, N, C))
            q = k = v = x.reshape(B, N, h, hd).transpose(0, 2, 1, 3)
        else:
            q = to_heads(dense("q")(x))
            k = to_heads(dense("k")(x))
            v = to_heads(dense("v")(x))

        conv_norm = self.mode == "conv"
        q, q_thw = AttentionPool(
            hd, tuple(self.kernel_q), tuple(self.stride_q), self.mode,
            conv_norm, dtype=self.dtype, name="pool_q",
        )(q, thw, self.has_cls_embed) if self.kernel_q else (q, thw)
        if self.kernel_kv:
            k, _ = AttentionPool(
                hd, tuple(self.kernel_kv), tuple(self.stride_kv), self.mode,
                conv_norm, dtype=self.dtype, name="pool_k",
            )(k, thw, self.has_cls_embed)
            v, _ = AttentionPool(
                hd, tuple(self.kernel_kv), tuple(self.stride_kv), self.mode,
                conv_norm, dtype=self.dtype, name="pool_v",
            )(v, thw, self.has_cls_embed)

        if self.pool_first:
            q = to_heads(dense("q")(from_heads(q)))
            k = to_heads(dense("k")(from_heads(k)))
            v = to_heads(dense("v")(from_heads(v)))

        out = joint_attention(q, k, v, scale)
        out = from_heads(out)
        out = int8_or_dense(C, "proj", True, out, quant, self.dtype)
        if self.drop_rate > 0.0 and not deterministic:
            out = nn.Dropout(self.drop_rate, deterministic=False)(out)
        return out, q_thw


class MultiScaleBlock(nn.Module):
    """(reference attention.py:264-350)"""

    dim: int
    dim_out: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = False
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    kernel_q: Tuple[int, ...] = ()
    kernel_kv: Tuple[int, ...] = ()
    stride_q: Tuple[int, ...] = ()
    stride_kv: Tuple[int, ...] = ()
    mode: str = "conv"
    has_cls_embed: bool = True
    fast_gelu: bool = False
    pool_first: bool = False
    int8_dense: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, metadata, thw, deterministic: bool = True):
        y, new_thw = MultiScaleAttention(
            self.dim, self.num_heads, self.qkv_bias, self.drop_rate,
            tuple(self.kernel_q), tuple(self.kernel_kv),
            tuple(self.stride_q), tuple(self.stride_kv),
            self.has_cls_embed, self.mode, self.pool_first,
            int8_dense=self.int8_dense, dtype=self.dtype, name="attn",
        )(
            nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x),
            thw, deterministic=deterministic,
        )
        # pooled residual skip (max pool with kernel s+1)
        if self.stride_q and int(np.prod(self.stride_q)) > 1:
            kernel_skip = tuple(s + 1 if s > 1 else s for s in self.stride_q)
            B, N, C = x.shape
            cls_tok = None
            xr = x
            if self.has_cls_embed:
                cls_tok, xr = x[:, :1], x[:, 1:]
            T, Hh, Ww = thw
            vol = xr.reshape(B, T, Hh, Ww, C)
            vol = _pool3d(
                vol, "max", kernel_skip, tuple(self.stride_q),
                tuple(int(k // 2) for k in kernel_skip),
            )
            xr = vol.reshape(B, -1, C)
            x_res = (
                jnp.concatenate([cls_tok, xr], axis=1)
                if self.has_cls_embed else xr
            )
        else:
            x_res = x
        dp = DropPath(self.drop_path_rate, name="drop_path")
        x = x_res + dp(y, deterministic=deterministic)
        x_norm = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        x_mlp = Mlp(
            int(self.dim * self.mlp_ratio), out_features=self.dim_out,
            drop=self.drop_rate, fast_gelu=self.fast_gelu,
            int8_dense=self.int8_dense, dtype=self.dtype, name="mlp",
        )(x_norm, deterministic=deterministic)
        if self.dim != self.dim_out:
            x = nn.Dense(self.dim_out, kernel_init=trunc_normal_02,
                         dtype=self.dtype, name="proj")(x_norm)
        x = x + dp(x_mlp, deterministic=deterministic)
        return x, new_thw


class TransformerBasicHead(nn.Module):
    """(reference head_helper.py:363-419)"""

    num_classes: Any
    dropout_rate: float = 0.0
    act_func: str = "softmax"
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.dropout_rate > 0.0 and train:
            x = nn.Dropout(self.dropout_rate, deterministic=False)(x)
        act = jax.nn.softmax if self.act_func == "softmax" else jax.nn.sigmoid
        if isinstance(self.num_classes, dict):
            preds = {
                k: nn.Dense(n, kernel_init=trunc_normal_02,
                            name=f"projection_{k}")(x)
                for k, n in self.num_classes.items()
            }
            if not train:
                preds = {k: act(v) for k, v in preds.items()}
            return jnp.zeros((1,), x.dtype), preds
        logits = nn.Dense(self.num_classes, kernel_init=trunc_normal_02,
                          name="projection")(x)
        if not train:
            logits = act(logits)
        return logits


@MODEL_REGISTRY.register()
class MViT(nn.Module):
    """(reference video_model_builder.py:764-1100)"""

    cfg: Any
    dtype: Any = None

    @nn.compact
    def __call__(self, x, metadata=None, bboxes=None, train: bool = False):
        c = self.cfg
        use_2d = c.MVIT.PATCH_2D
        patch_stride = list(c.MVIT.PATCH_STRIDE)
        if use_2d:
            patch_stride = [1] + patch_stride
        embed_dim = c.MVIT.EMBED_DIM
        depth = c.MVIT.DEPTH
        num_heads = c.MVIT.NUM_HEADS
        cls_on = c.MVIT.CLS_EMBED_ON
        num_classes = c.MODEL.NUM_CLASSES
        if c.TRAIN.DATASET == "epickitchens":
            num_classes = {"verb": 97, "noun": 300}

        # patch embed: conv3d with padding
        pads = tuple(
            (p, p) for p in c.MVIT.PATCH_PADDING
        )
        tokens = nn.Conv(
            embed_dim, tuple(c.MVIT.PATCH_KERNEL),
            strides=tuple(c.MVIT.PATCH_STRIDE), padding=pads,
            kernel_init=nn.initializers.xavier_uniform(), dtype=self.dtype,
            name="patch_embed_proj",
        )(x)
        B = tokens.shape[0]
        T, Hh, Ww = tokens.shape[1:4]
        tokens = tokens.reshape(B, -1, embed_dim)
        patch_dims = [T, Hh, Ww]
        num_patches = T * Hh * Ww

        if cls_on:
            cls_token = self.param("cls_token", trunc_normal_02,
                                   (1, 1, embed_dim))
            tokens = jnp.concatenate(
                [jnp.broadcast_to(cls_token.astype(tokens.dtype),
                                  (B, 1, embed_dim)), tokens],
                axis=1,
            )
        if c.MVIT.SEP_POS_EMBED:
            pe_s = self.param("pos_embed_spatial", trunc_normal_02,
                              (1, Hh * Ww, embed_dim))
            pe_t = self.param("pos_embed_temporal", trunc_normal_02,
                              (1, T, embed_dim))
            pe = jnp.tile(pe_s, (1, T, 1)) + jnp.repeat(pe_t, Hh * Ww, axis=1)
            if cls_on:
                pe_c = self.param("pos_embed_class", trunc_normal_02,
                                  (1, 1, embed_dim))
                pe = jnp.concatenate([pe_c, pe], axis=1)
        else:
            pe = self.param(
                "pos_embed", trunc_normal_02,
                (1, num_patches + (1 if cls_on else 0), embed_dim),
            )
        tokens = tokens + pe.astype(tokens.dtype)
        if c.MVIT.DROPOUT_RATE > 0.0 and train:
            tokens = nn.Dropout(c.MVIT.DROPOUT_RATE, deterministic=False)(tokens)
        if c.MVIT.NORM != "layernorm":
            # reference video_model_builder.py:802-805 supports only
            # layernorm; fail the same way instead of silently using LN
            raise NotImplementedError(
                f"MVIT.NORM={c.MVIT.NORM!r}: only 'layernorm' is supported"
            )
        if c.MVIT.NORM_STEM:
            tokens = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype,
                                  name="norm_stem")(tokens)

        # per-layer dim/head/pool schedules (reference :854-900)
        dim_mul = np.ones(depth + 1)
        head_mul = np.ones(depth + 1)
        for i, m in c.MVIT.DIM_MUL or []:
            dim_mul[int(i)] = m
        for i, m in c.MVIT.HEAD_MUL or []:
            head_mul[int(i)] = m
        pool_q = [[] for _ in range(depth)]
        pool_kv = [[] for _ in range(depth)]
        stride_q = [[] for _ in range(depth)]
        stride_kv = [[] for _ in range(depth)]
        for entry in c.MVIT.POOL_Q_STRIDE or []:
            i = int(entry[0])
            stride_q[i] = list(entry[1:])
            pool_q[i] = (
                list(c.MVIT.POOL_KVQ_KERNEL)
                if c.MVIT.POOL_KVQ_KERNEL is not None
                else [s + 1 if s > 1 else s for s in entry[1:]]
            )
        kv_strides = c.MVIT.POOL_KV_STRIDE
        if c.MVIT.POOL_KV_STRIDE_ADAPTIVE is not None:
            _skv = list(c.MVIT.POOL_KV_STRIDE_ADAPTIVE)
            kv_strides = []
            for i in range(depth):
                if stride_q[i]:
                    _skv = [max(_skv[d] // stride_q[i][d], 1) for d in range(3)]
                kv_strides.append([i] + _skv)
        for entry in kv_strides or []:
            i = int(entry[0])
            stride_kv[i] = list(entry[1:])
            pool_kv[i] = (
                list(c.MVIT.POOL_KVQ_KERNEL)
                if c.MVIT.POOL_KVQ_KERNEL is not None
                else [s + 1 if s > 1 else s for s in entry[1:]]
            )
            if c.MVIT.POOL_KV_IGNORE_111_KERNEL and tuple(entry[1:]) == (1, 1, 1):
                pool_kv[i] = []

        import numpy as _np

        dpr = [float(r) for r in _np.linspace(0, c.MVIT.DROPPATH_RATE, depth)]
        thw = tuple(patch_dims)
        i_num_frames = c.DATA.NUM_FRAMES // (1 if use_2d else patch_stride[0])

        for i in range(depth):
            num_heads = round_width(num_heads, head_mul[i])
            embed_dim = round_width(embed_dim, dim_mul[i], divisor=num_heads)
            dim_out = round_width(
                embed_dim, dim_mul[i + 1],
                divisor=round_width(num_heads, head_mul[i + 1]),
            )
            x_prev, thw_prev = tokens, thw
            if i in c.ORVIT.LAYERS:
                from focus_tpu.models.orvit import ORViTBlock

                tokens, thw = ORViTBlock(
                    cfg=c, dim=embed_dim, num_heads=num_heads,
                    mlp_ratio=c.MVIT.MLP_RATIO, qkv_bias=c.MVIT.QKV_BIAS,
                    drop=c.MVIT.DROPOUT_RATE, attn_drop=c.MVIT.DROPOUT_RATE,
                    drop_path_rate=dpr[i], nb_frames=i_num_frames,
                    dtype=self.dtype, name=f"blocks_{i}",
                )(x_prev, metadata, thw_prev, deterministic=not train)
            else:
                tokens, thw = MultiScaleBlock(
                    dim=embed_dim, dim_out=dim_out, num_heads=num_heads,
                    mlp_ratio=c.MVIT.MLP_RATIO, qkv_bias=c.MVIT.QKV_BIAS,
                    drop_rate=c.MVIT.DROPOUT_RATE, drop_path_rate=dpr[i],
                    kernel_q=tuple(pool_q[i]), kernel_kv=tuple(pool_kv[i]),
                    stride_q=tuple(stride_q[i]), stride_kv=tuple(stride_kv[i]),
                    mode=c.MVIT.MODE, has_cls_embed=cls_on,
                    pool_first=c.MVIT.POOL_FIRST,
                    fast_gelu=bool(getattr(c.TPU, "FAST_GELU", False)),
                    int8_dense=bool(getattr(c.TPU, "INT8_SERVING", False)),
                    dtype=self.dtype,
                    name=f"blocks_{i}",
                )(x_prev, metadata, thw_prev, deterministic=not train)
            if i in c.ORVIT.ADD_LAYERS:
                from focus_tpu.models.orvit import ORViTBlock

                x_orvit, _ = ORViTBlock(
                    cfg=c, dim=embed_dim, num_heads=num_heads,
                    mlp_ratio=c.MVIT.MLP_RATIO, qkv_bias=c.MVIT.QKV_BIAS,
                    drop=c.MVIT.DROPOUT_RATE, attn_drop=c.MVIT.DROPOUT_RATE,
                    drop_path_rate=dpr[i], nb_frames=i_num_frames,
                    dtype=self.dtype, name=f"orvit_blocks_{i}",
                )(x_prev, metadata, thw_prev, deterministic=not train)
                tokens = tokens + x_orvit
            tstride = stride_q[i][0] if stride_q[i] else 1
            i_num_frames //= tstride
            final_dim = dim_out

        tokens = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(tokens)
        if c.DETECTION.ENABLE:
            from focus_tpu.models.heads import ResNetRoIHead

            feats = tokens[:, 1:] if cls_on else tokens
            B, _, C = feats.shape
            vol = feats.reshape(B, thw[0], thw[1], thw[2], C)
            return ResNetRoIHead(
                num_classes=num_classes,
                pool_size=[(c.DATA.NUM_FRAMES // patch_stride[0], 1, 1)],
                resolution=[(c.DETECTION.ROI_XFORM_RESOLUTION,) * 2],
                scale_factor=[c.DETECTION.SPATIAL_SCALE_FACTOR],
                dropout_rate=c.MODEL.DROPOUT_RATE,
                act_func=c.MODEL.HEAD_ACT,
                aligned=c.DETECTION.ALIGNED,
                dtype=self.dtype,
                name="head",
            )([vol], bboxes, train=train)
        pooled = tokens[:, 0] if cls_on else tokens.mean(axis=1)
        return TransformerBasicHead(
            num_classes, c.MODEL.DROPOUT_RATE, c.MODEL.HEAD_ACT,
            dtype=self.dtype, name="head",
        )(pooled, train=train)
