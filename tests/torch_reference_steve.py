"""Torch replica of the reference STEVE forward (eval semantics, no
gumbel noise — tau/hard handled by taking softmax/argmax deterministically
for parity testing). Test fixture only.

Transcribed from reference slowfast/models/STEVE/{steve,dvae,transformer}.py.
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def linear(i, o, bias=True):
    return nn.Linear(i, o, bias)


class Conv2dBlock(nn.Module):
    def __init__(self, i, o, k, s=1, p=0):
        super().__init__()
        self.m = nn.Conv2d(i, o, k, s, p)

    def forward(self, x):
        return F.relu(self.m(x))


class DVAE(nn.Module):
    def __init__(self, vocab, channels):
        super().__init__()
        self.encoder = nn.Sequential(
            Conv2dBlock(channels, 64, 4, 4), Conv2dBlock(64, 64, 1, 1),
            Conv2dBlock(64, 64, 1, 1), Conv2dBlock(64, 64, 1, 1),
            Conv2dBlock(64, 64, 1, 1), Conv2dBlock(64, 64, 1, 1),
            Conv2dBlock(64, 64, 1, 1), nn.Conv2d(64, vocab, 1),
        )
        self.decoder = nn.Sequential(
            Conv2dBlock(vocab, 64, 1), Conv2dBlock(64, 64, 3, 1, 1),
            Conv2dBlock(64, 64, 1, 1), Conv2dBlock(64, 64, 1, 1),
            Conv2dBlock(64, 64 * 4, 1), nn.PixelShuffle(2),
            Conv2dBlock(64, 64, 3, 1, 1), Conv2dBlock(64, 64, 1, 1),
            Conv2dBlock(64, 64, 1, 1), Conv2dBlock(64, 64 * 4, 1),
            nn.PixelShuffle(2), nn.Conv2d(64, channels, 1),
        )


class MultiHeadAttention(nn.Module):
    def __init__(self, d, h):
        super().__init__()
        self.h = h
        self.proj_q = linear(d, d, False)
        self.proj_k = linear(d, d, False)
        self.proj_v = linear(d, d, False)
        self.proj_o = linear(d, d, False)

    def forward(self, q, k, v, attn_mask=None):
        B, T, d = q.shape
        S = k.shape[1]
        q = self.proj_q(q).view(B, T, self.h, -1).transpose(1, 2)
        k = self.proj_k(k).view(B, S, self.h, -1).transpose(1, 2)
        v = self.proj_v(v).view(B, S, self.h, -1).transpose(1, 2)
        q = q * (q.shape[-1] ** -0.5)
        attn = q @ k.transpose(-1, -2)
        if attn_mask is not None:
            attn = attn.masked_fill(attn_mask, float("-inf"))
        attn = attn.softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(B, T, -1)
        return self.proj_o(out)


class FFN(nn.Module):
    def __init__(self, d):
        super().__init__()
        self.fc1 = linear(d, 4 * d)
        self.fc2 = linear(4 * d, d)

    def forward(self, x):
        return self.fc2(F.relu(self.fc1(x)))


class TransformerEncoderBlock(nn.Module):
    def __init__(self, d, h, is_first):
        super().__init__()
        self.is_first = is_first
        self.attn_layer_norm = nn.LayerNorm(d)
        self.attn = MultiHeadAttention(d, h)
        self.ffn_layer_norm = nn.LayerNorm(d)
        self.ffn = FFN(d)

    def forward(self, x):
        if self.is_first:
            x = self.attn_layer_norm(x)
            x = x + self.attn(x, x, x)
        else:
            y = self.attn_layer_norm(x)
            x = x + self.attn(y, y, y)
        return x + self.ffn(self.ffn_layer_norm(x))


class TransformerEncoder(nn.Module):
    def __init__(self, n, d, h):
        super().__init__()
        self.blocks = nn.ModuleList(
            [TransformerEncoderBlock(d, h, i == 0) for i in range(n)]
        )
        self.layer_norm = nn.LayerNorm(d)

    def forward(self, x):
        for b in self.blocks:
            x = b(x)
        return self.layer_norm(x)


class TransformerDecoderBlock(nn.Module):
    def __init__(self, d, h, max_len, is_first):
        super().__init__()
        self.is_first = is_first
        self.self_attn_layer_norm = nn.LayerNorm(d)
        self.self_attn = MultiHeadAttention(d, h)
        mask = torch.triu(torch.ones((max_len, max_len), dtype=torch.bool), 1)
        self.register_buffer("mask", mask)
        self.encoder_decoder_attn_layer_norm = nn.LayerNorm(d)
        self.encoder_decoder_attn = MultiHeadAttention(d, h)
        self.ffn_layer_norm = nn.LayerNorm(d)
        self.ffn = FFN(d)

    def forward(self, x, enc):
        T = x.shape[1]
        if self.is_first:
            x = self.self_attn_layer_norm(x)
            x = x + self.self_attn(x, x, x, self.mask[:T, :T])
        else:
            y = self.self_attn_layer_norm(x)
            x = x + self.self_attn(y, y, y, self.mask[:T, :T])
        y = self.encoder_decoder_attn_layer_norm(x)
        x = x + self.encoder_decoder_attn(y, enc, enc)
        return x + self.ffn(self.ffn_layer_norm(x))


class TransformerDecoder(nn.Module):
    def __init__(self, n, max_len, d, h):
        super().__init__()
        self.blocks = nn.ModuleList(
            [TransformerDecoderBlock(d, h, max_len, i == 0) for i in range(n)]
        )
        self.layer_norm = nn.LayerNorm(d)

    def forward(self, x, enc):
        for b in self.blocks:
            x = b(x, enc)
        return self.layer_norm(x)


class SlotAttentionVideo(nn.Module):
    def __init__(self, num_iters, num_slots, input_size, slot_size, mlp_hid,
                 pred_blocks, pred_heads):
        super().__init__()
        self.num_iterations = num_iters
        self.num_slots = num_slots
        self.slot_size = slot_size
        self.slot_mu = nn.Parameter(torch.zeros(1, 1, slot_size))
        self.slot_log_sigma = nn.Parameter(torch.zeros(1, 1, slot_size))
        self.norm_inputs = nn.LayerNorm(input_size)
        self.norm_slots = nn.LayerNorm(slot_size)
        self.norm_mlp = nn.LayerNorm(slot_size)
        self.project_q = linear(slot_size, slot_size, False)
        self.project_k = linear(input_size, slot_size, False)
        self.project_v = linear(input_size, slot_size, False)
        self.gru = nn.GRUCell(slot_size, slot_size)
        self.mlp = nn.Sequential(
            linear(slot_size, mlp_hid), nn.ReLU(), linear(mlp_hid, slot_size)
        )
        self.predictor = TransformerEncoder(pred_blocks, slot_size, pred_heads)

    def forward(self, inputs, slots_init):
        B, T, N, D = inputs.shape
        slots = slots_init
        inputs = self.norm_inputs(inputs)
        k = self.project_k(inputs) * self.slot_size ** -0.5
        v = self.project_v(inputs)
        attns_collect, slots_collect = [], []
        for t in range(T):
            for i in range(self.num_iterations):
                slots_prev = slots
                slots_n = self.norm_slots(slots)
                q = self.project_q(slots_n)
                attn_logits = torch.bmm(k[:, t], q.transpose(-1, -2))
                attn_vis = F.softmax(attn_logits, dim=-1)
                attn = attn_vis + 1e-8
                attn = attn / attn.sum(-2, keepdim=True)
                updates = torch.bmm(attn.transpose(-1, -2), v[:, t])
                slots = self.gru(
                    updates.reshape(-1, self.slot_size),
                    slots_prev.reshape(-1, self.slot_size),
                ).view(B, self.num_slots, self.slot_size)
                if i < self.num_iterations - 1:
                    slots = slots + self.mlp(self.norm_mlp(slots))
            attns_collect.append(attn_vis)
            slots_collect.append(slots)
            slots = self.predictor(slots)
        return torch.stack(slots_collect, 1), torch.stack(attns_collect, 1)
