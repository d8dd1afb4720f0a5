"""Torch replica of the reference Motionformer/ORViT forward pass.

Test fixture ONLY: transcribes the reference model's behaviour
(reference slowfast/models/video_model_builder.py:1103-1353,
attention.py:434-557, ORViT/orvit.py) so our flax rebuild can be checked
logit-for-logit without the (unavailable) upstream dependencies.
torchvision.ops.roi_align is replaced by the naive numpy implementation
from test_orvit_ops (validated separately).
"""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F
from einops import rearrange


def qkv_attn(q, k, v):
    sim = torch.einsum("bid,bjd->bij", q, k)
    attn = sim.softmax(dim=-1)
    return torch.einsum("bij,bjd->bid", attn, v)


class TrajectoryAttention(nn.Module):
    def __init__(self, dim, num_heads, qkv_bias=False, use_original_code=True):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.proj_q = nn.Linear(dim, dim, bias=qkv_bias)
        self.proj_kv = nn.Linear(dim, dim * 2, bias=qkv_bias)
        self.proj = nn.Linear(dim, dim)
        self.use_original_code = use_original_code

    def forward(self, x, thw_prev, with_cls_token=True):
        B, N, C = x.shape
        P, Fr, h = thw_prev[1] * thw_prev[2], thw_prev[0], self.num_heads
        q, k, v = self.qkv(x).chunk(3, dim=-1)
        q, k, v = map(
            lambda t: rearrange(t, "b n (h d) -> (b h) n d", h=h), (q, k, v)
        )
        if with_cls_token:
            (cls_q, q_), (cls_k, k_), (cls_v, v_) = map(
                lambda t: (t[:, 0:1], t[:, 1:]), (q, k, v)
            )
            cls_out = qkv_attn(cls_q * self.scale, k, v)
            cls_out = rearrange(cls_out, "(b h) f d -> b f (h d)", f=1, h=h)
        else:
            q_, k_, v_ = q, k, v
        q_dot_k = q_ @ k_.transpose(-2, -1)
        q_dot_k = rearrange(q_dot_k, "b q (f n) -> b q f n", f=Fr)
        space_attn = (self.scale * q_dot_k).softmax(dim=-1)
        v_ = rearrange(v_, "b (f n) d -> b f n d", f=Fr, n=P)
        x = torch.einsum("bqfn,bfnd->bqfd", space_attn, v_)
        x = rearrange(x, "(b h) s f d -> b s f (h d)", b=B)
        x_diag = rearrange(x, "b (g n) f d -> b g n f d", g=Fr)
        x_diag = torch.diagonal(x_diag, dim1=-4, dim2=-2)
        x_diag = rearrange(x_diag, "b n d f -> b (f n) d", f=Fr)
        q2 = self.proj_q(x_diag)
        k2, v2 = self.proj_kv(x).chunk(2, dim=-1)
        q2 = rearrange(q2, "b s (h d) -> b h s d", h=h) * self.scale
        k2, v2 = map(
            lambda t: rearrange(t, "b s f (h d) -> b h s f d", f=Fr, h=h),
            (k2, v2),
        )
        attn = torch.einsum("bhsd,bhsfd->bhsf", q2, k2).softmax(dim=-1)
        if self.use_original_code:
            x = rearrange(x, "b s f (h d) -> b h s f d", f=Fr, h=h)
            x = torch.einsum("bhsf,bhsfd->bhsd", attn, x)
        else:
            x = torch.einsum("bhsf,bhsfd->bhsd", attn, v2)
        x = rearrange(x, "b h s d -> b s (h d)")
        if with_cls_token:
            x = torch.cat((cls_out, x), dim=1)
        return self.proj(x), thw_prev


class Mlp(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class TrajectoryAttentionBlock(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio=4.0, qkv_bias=False):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TrajectoryAttention(dim, num_heads, qkv_bias)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def forward(self, x, metadata, thw):
        x = x + self.attn(self.norm1(x), thw)[0]
        x = x + self.mlp(self.norm2(x))
        return x, thw


class SelfAttention(nn.Module):
    def __init__(self, dim, num_heads, qkv_bias=False):
        super().__init__()
        self.num_heads = num_heads
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape
        h = self.num_heads
        qkv = self.qkv(x).reshape(B, N, 3, h, C // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        attn = ((q @ k.transpose(-2, -1)) * (C // h) ** -0.5).softmax(dim=-1)
        x = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(x)


class SelfAttentionBlock(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio=4.0, qkv_bias=False):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim)
        self.attn = SelfAttention(dim, num_heads, qkv_bias)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        x = x + self.mlp(self.norm2(x))
        return x


class SeqMlp(nn.Module):
    """linear/relu/linear/relu with Sequential naming (0, 2)."""

    def __init__(self, din, hidden, dout):
        super().__init__()
        self.seq = nn.Sequential(
            nn.Linear(din, hidden, bias=False),
            nn.ReLU(),
            nn.Linear(hidden, dout, bias=False),
            nn.ReLU(),
        )

    def forward(self, x):
        return self.seq(x)


def _naive_roi_align_torch(feat_nchw, boxes_xyxy, out_hw, spatial_scale):
    """torchvision-compatible roi_align via the validated numpy naive impl."""
    from tests.test_orvit_ops import naive_roi_align

    outs = []
    f = feat_nchw.detach().numpy().transpose(0, 2, 3, 1)  # NHWC
    for n in range(f.shape[0]):
        o = naive_roi_align(
            f[n].astype(np.float64),
            boxes_xyxy[n].detach().numpy(),
            out_hw[0], out_hw[1], spatial_scale, -1,
        )
        outs.append(o.transpose(0, 3, 1, 2))  # [O, C, h, w]
    return torch.from_numpy(np.stack(outs).astype(np.float32))


class MotionStream(nn.Module):
    def __init__(self, cfg, dim, num_heads, nb_frames, mlp_ratio=4.0,
                 qkv_bias=False):
        super().__init__()
        O = cfg.ORVIT.O
        self.nb_frames = nb_frames
        self.temporal_resolution = cfg.MF.TEMPORAL_RESOLUTION
        self.box_categories = nn.Parameter(torch.zeros(nb_frames, O, dim))
        self.c_coord_to_feature = SeqMlp(4, dim // 2, dim)
        self.attn = SelfAttentionBlock(dim, cfg.ORVIT.MOTION_STREAM_N_HEADS,
                                       mlp_ratio, qkv_bias)

    def forward(self, box_tensors, H, W):
        BS, T = box_tensors.shape[:2]
        box_emb = self.c_coord_to_feature(box_tensors)
        box_emb = self.box_categories.unsqueeze(0) + box_emb
        oshape = box_emb.shape
        box_emb = self.attn(box_emb.flatten(1, 2)).reshape(oshape)
        # layout splat (reference Object2Spatial 'layout')
        from tests.test_orvit_ops import torch_reference_layout

        # convert: reference feeds cxcywh into box2spatial_layout
        ret = torch_reference_layout(
            box_emb.detach().numpy(), box_tensors.detach().numpy(), H, W
        )  # [BS, T, H, W, d]
        ret = torch.from_numpy(ret)
        Tratio = T // self.temporal_resolution
        if Tratio > 1:
            ret = ret.reshape(BS, -1, Tratio, H, W, ret.shape[-1]).mean(2)
        return ret.flatten(1, 3)


class ORViT(nn.Module):
    def __init__(self, cfg, dim, num_heads, nb_frames, mlp_ratio=4.0,
                 qkv_bias=False):
        super().__init__()
        self.cfg = cfg
        self.nb_frames = nb_frames
        self.crop_size = cfg.DATA.TRAIN_CROP_SIZE
        self.patch_to_d = SeqMlp(dim, dim // 2, dim)
        self.box_categories = nn.Parameter(
            torch.zeros(nb_frames, cfg.ORVIT.O, dim)
        )
        self.c_coord_to_feature = SeqMlp(4, dim // 2, dim)
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = Mlp(dim, int(dim * mlp_ratio))
        self.attn = TrajectoryAttention(dim, num_heads, qkv_bias)
        self.motion_stream = MotionStream(cfg, dim, num_heads, nb_frames,
                                          mlp_ratio, qkv_bias)
        self.motion_mlp = Mlp(dim, int(dim * mlp_ratio))

    def forward(self, x, metadata, thw):
        box_tensors = metadata["orvit_bboxes"]
        cls_token, patch_tokens = x[:, [0]], x[:, 1:]
        BS, _, d = x.shape
        T, H, W = thw
        patch_tokens = patch_tokens.permute(0, 2, 1).reshape(BS, -1, T, H, W)
        Tratio = box_tensors.shape[1] // T
        box_tensors = box_tensors[:, ::Tratio]
        O = box_tensors.shape[-2]

        # ObjectsCrops: cxcywh -> xyxy, unnormalise, roi_align
        cxcywh = box_tensors
        xyxy = torch.cat(
            [cxcywh[..., :2] - cxcywh[..., 2:] / 2,
             cxcywh[..., :2] + cxcywh[..., 2:] / 2], dim=-1
        ).clone()
        xyxy = xyxy * self.crop_size
        feats = patch_tokens.permute(0, 2, 1, 3, 4).flatten(0, 1)  # [BS*T,d,H,W]
        crops = _naive_roi_align_torch(
            feats, xyxy.flatten(0, 1), (H, W), H / self.crop_size
        )  # [BS*T, O, d, H, W]
        crops = crops.reshape(BS, T, O, d, H, W).permute(0, 2, 1, 3, 4, 5)

        obj = crops.permute(0, 1, 2, 4, 5, 3)  # [BS,O,T,H,W,d]
        obj = self.patch_to_d(obj)
        obj = torch.amax(obj, dim=(-3, -2))  # [BS,O,T,d]
        obj = obj.permute(0, 2, 1, 3)  # [BS,T,O,d]
        box_emb = self.c_coord_to_feature(box_tensors)
        obj = obj + self.box_categories.unsqueeze(0) + box_emb

        all_tokens = torch.cat(
            [patch_tokens.permute(0, 2, 3, 4, 1).reshape(BS, T, H * W, d), obj],
            dim=2,
        ).flatten(1, 2)
        all_tokens = torch.cat([cls_token, all_tokens], dim=1)
        all_tokens, _ = self.attn(self.norm1(all_tokens), [T, H * W + O, 1])
        cls_token2, all_tokens = all_tokens[:, [0]], all_tokens[:, 1:]
        patch_out = all_tokens.reshape(BS, T, H * W + O, d)[:, :, : H * W]
        patch_out = patch_out.reshape(BS, T * H * W, d)

        motion = self.motion_stream(box_tensors, H, W)
        patch_out = patch_out + self.motion_mlp(motion)

        patch_out = torch.cat([cls_token2, patch_out], dim=1)
        x = x + patch_out
        x = x + self.mlp(self.norm2(x))
        return x, thw


class Motionformer(nn.Module):
    """Eval-mode replica of reference video_model_builder.py:1103-1353."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        dim = cfg.MF.EMBED_DIM
        self.embed_dim = dim
        self.temporal_resolution = cfg.MF.TEMPORAL_RESOLUTION
        patch = cfg.MF.PATCH_SIZE
        self.proj = nn.Conv3d(
            3, dim, (cfg.MF.PATCH_SIZE_TEMP, patch, patch),
            stride=(cfg.MF.PATCH_SIZE_TEMP, patch, patch),
        )
        self.num_patches = (224 // patch) ** 2
        self.cls_token = nn.Parameter(torch.zeros(1, 1, dim))
        self.pos_embed = nn.Parameter(torch.zeros(1, self.num_patches + 1, dim))
        self.temp_embed = nn.Parameter(
            torch.zeros(1, self.temporal_resolution, dim)
        )
        blocks = []
        for i in range(cfg.MF.DEPTH):
            if i in cfg.ORVIT.LAYERS:
                blocks.append(
                    ORViT(cfg, dim, cfg.MF.NUM_HEADS, self.temporal_resolution,
                          cfg.MF.MLP_RATIO, cfg.MF.QKV_BIAS)
                )
            else:
                blocks.append(
                    TrajectoryAttentionBlock(
                        dim, cfg.MF.NUM_HEADS, cfg.MF.MLP_RATIO, cfg.MF.QKV_BIAS
                    )
                )
        self.blocks = nn.ModuleList(blocks)
        self.norm = nn.LayerNorm(dim, eps=1e-6)
        self.pre_logits = nn.Sequential()
        if cfg.MF.USE_MLP:
            self.pre_logits.add_module("fc", nn.Linear(dim, dim))
        self.head = nn.Linear(dim, cfg.MODEL.NUM_CLASSES)

    def forward(self, x, metadata):
        # x: [B, C, T, H, W]
        B = x.shape[0]
        x = self.proj(x)  # [B, d, T', H', W']
        npatch = x.shape[3] * x.shape[4]
        x = x.flatten(2).transpose(1, 2)  # [B, N, d]
        cls = self.cls_token.expand(B, -1, -1)
        x = torch.cat((cls, x), dim=1)

        pos_embed = self.pos_embed
        if npatch != self.num_patches:
            N = self.num_patches
            class_emb = pos_embed[:, 0]
            pe = pos_embed[:, 1:]
            dim = x.shape[-1]
            pe = F.interpolate(
                pe.reshape(1, int(math.sqrt(N)), int(math.sqrt(N)), dim)
                .permute(0, 3, 1, 2),
                scale_factor=math.sqrt(npatch / N),
                mode="bicubic",
            )
            pe = pe.permute(0, 2, 3, 1).view(1, -1, dim)
            pos_embed = torch.cat((class_emb.unsqueeze(0), pe), dim=1)

        cls_embed = self.pos_embed[:, 0, :].unsqueeze(1)
        tile_pos = pos_embed[:, 1:, :].repeat(1, self.temporal_resolution, 1)
        tile_temp = self.temp_embed.repeat_interleave(npatch, 1)
        total = torch.cat([cls_embed, tile_pos + tile_temp], dim=1)
        x = x + total

        thw = [
            self.temporal_resolution, int(npatch ** 0.5), int(npatch ** 0.5)
        ]
        for blk in self.blocks:
            x, _ = blk(x, metadata, thw)
        x = self.norm(x)[:, 0]
        if len(self.pre_logits) > 0:
            x = torch.tanh(self.pre_logits.fc(x))
        x = self.head(x)
        return F.softmax(x, dim=-1)
