"""Shared model building blocks (flax.linen).

These mirror the behavioural surface of the reference's building blocks
(reference ``slowfast/models/STEVE/utils.py``, ``transformer.py``) but are
designed JAX-first: NHWC layout, functional RNG, static shapes. Parameter
structures are chosen so torch checkpoints map mechanically (e.g. the GRU
keeps torch's fused [3H, D] gate layout).
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

# Initializers matching the reference's torch init calls:
#   nn.init.xavier_uniform_  -> variance_scaling(1, fan_avg, uniform)
#   nn.init.kaiming_uniform_(nonlinearity='relu') -> variance_scaling(2, fan_in, uniform)
xavier_uniform = nn.initializers.xavier_uniform()
kaiming_uniform = nn.initializers.variance_scaling(2.0, "fan_in", "uniform")
orthogonal = nn.initializers.orthogonal()
zeros_init = nn.initializers.zeros
trunc_normal = nn.initializers.truncated_normal(stddev=1.0, lower=-2.0, upper=2.0)


def scaled_xavier_uniform(gain: float):
    """torch ``xavier_uniform_(w, gain)``: uniform(±gain·sqrt(6/(fi+fo)))."""
    return nn.initializers.variance_scaling(gain ** 2, "fan_avg", "uniform")


class Dense(nn.Module):
    """Linear layer with reference-compatible initialisation."""

    features: int
    use_bias: bool = True
    weight_init: str = "xavier"
    gain: float = 1.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        if self.weight_init == "kaiming":
            kinit = kaiming_uniform
        else:
            kinit = scaled_xavier_uniform(self.gain) if self.gain != 1.0 else xavier_uniform
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=kinit,
            bias_init=zeros_init,
            dtype=self.dtype,
            name="linear",
        )(x)


class Conv2dBlock(nn.Module):
    """Conv2d (kaiming init) + ReLU, NHWC."""

    features: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding=self.padding,
            kernel_init=kaiming_uniform,
            bias_init=zeros_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        return nn.relu(x)


def conv2d(
    features: int,
    kernel_size: int,
    stride: int = 1,
    padding: int = 0,
    weight_init: str = "xavier",
    dtype: Any = None,
    name: Optional[str] = None,
):
    """Plain conv2d with reference init (no activation)."""
    return nn.Conv(
        features,
        (kernel_size, kernel_size),
        strides=(stride, stride),
        padding=padding,
        kernel_init=kaiming_uniform if weight_init == "kaiming" else xavier_uniform,
        bias_init=zeros_init,
        dtype=dtype,
        name=name,
    )


class GRUCell(nn.Module):
    """Functional GRU cell with torch's fused gate layout.

    Gates are ordered (reset, update, new) in a single [3H] block, exactly
    like ``torch.nn.GRUCell`` — so a checkpoint import is a transpose, and
    the whole-matrix xavier/orthogonal init matches the reference
    (reference STEVE/utils.py:107-118).
    """

    hidden_size: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, h):
        H = self.hidden_size
        w_ih = self.param("weight_ih", xavier_uniform, (x.shape[-1], 3 * H))
        w_hh = self.param("weight_hh", orthogonal, (h.shape[-1], 3 * H))
        b_ih = self.param("bias_ih", zeros_init, (3 * H,))
        b_hh = self.param("bias_hh", zeros_init, (3 * H,))
        dtype = self.dtype or jnp.promote_types(x.dtype, h.dtype)
        x = x.astype(dtype)
        h = h.astype(dtype)
        w_ih, w_hh, b_ih, b_hh = (
            t.astype(dtype) for t in (w_ih, w_hh, b_ih, b_hh)
        )
        gi = x @ w_ih + b_ih
        gh = h @ w_hh + b_hh
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1.0 - z) * n + z * h


class MultiHeadAttention(nn.Module):
    """Pre-projection MHA used by the STEVE transformer
    (reference STEVE/transformer.py:4-49). One fused attention; the causal
    mask is applied additively. Supports incremental decoding through a
    'cache' variable collection for autoregressive slot rollout."""

    d_model: int
    num_heads: int
    dropout: float = 0.0
    gain: float = 1.0
    dtype: Any = None

    @nn.compact
    def __call__(self, q, k, v, causal: bool = False, valid_len=None,
                 deterministic: bool = True, cache=None,
                 precomputed_kv=None, project_kv_only: bool = False):
        h = self.num_heads
        hd = self.d_model // h
        proj = lambda name, gain: Dense(
            self.d_model, use_bias=False, gain=gain, dtype=self.dtype, name=name
        )
        if project_kv_only:
            # hoisted cross-attention K/V: callers with a rollout-constant
            # key set (the slots during AR decode) project it ONCE and
            # feed the result back per step via ``precomputed_kv`` — the
            # per-step math is unchanged, the 2 matmuls leave the scan
            kh = proj("proj_k", 1.0)(k).reshape(k.shape[0], k.shape[1], h, hd)
            vh = proj("proj_v", 1.0)(v).reshape(v.shape[0], v.shape[1], h, hd)
            return kh, vh
        B, T, _ = q.shape
        qh = proj("proj_q", 1.0)(q).reshape(B, T, h, hd)
        if precomputed_kv is not None:
            kh, vh = precomputed_kv
        else:
            kh = proj("proj_k", 1.0)(k).reshape(B, k.shape[1], h, hd)
            vh = proj("proj_v", 1.0)(v).reshape(B, v.shape[1], h, hd)

        if cache is not None:
            # incremental decode: q/k/v are the single token at traced
            # position t; attend over the updated cache rows <= t
            k_cache, v_cache, t = cache
            k_cache = jax.lax.dynamic_update_slice_in_dim(
                k_cache, kh.astype(k_cache.dtype), t, axis=1
            )
            v_cache = jax.lax.dynamic_update_slice_in_dim(
                v_cache, vh.astype(v_cache.dtype), t, axis=1
            )
            S = k_cache.shape[1]
            scale = hd ** -0.5
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", qh * scale, k_cache,
                preferred_element_type=jnp.float32,
            )
            mask = jnp.arange(S)[None, None, None, :] <= t
            logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
            attn = jax.nn.softmax(logits, axis=-1).astype(qh.dtype)
            out = jnp.einsum("bhqk,bkhd->bqhd", attn, v_cache).reshape(
                B, T, self.d_model
            )
            return proj("proj_o", self.gain)(out), (k_cache, v_cache)

        mask = None
        if causal:
            S = kh.shape[1]
            mask = jnp.tril(jnp.ones((T, S), bool))[None, None]
            if valid_len is not None:
                # fixed-shape autoregressive decoding: only the first
                # `valid_len` key positions are populated.
                mask = mask & (jnp.arange(S)[None, None, None, :] < valid_len)

        scale = hd ** -0.5
        logits = jnp.einsum("bqhd,bkhd->bhqk", qh * scale, kh,
                            preferred_element_type=jnp.float32)
        if mask is not None:
            logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
        attn = jax.nn.softmax(logits, axis=-1).astype(qh.dtype)
        if self.dropout > 0.0 and not deterministic:
            attn = nn.Dropout(self.dropout, deterministic=False, name="attn_drop")(attn)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, vh).reshape(B, T, self.d_model)
        out = proj("proj_o", self.gain)(out)
        if self.dropout > 0.0 and not deterministic:
            out = nn.Dropout(self.dropout, deterministic=False, name="out_drop")(out)
        return out


class FFN(nn.Module):
    """Transformer feed-forward: linear(kaiming)/relu/linear(gain)."""

    d_model: int
    dropout: float = 0.0
    gain: float = 1.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        x = Dense(4 * self.d_model, weight_init="kaiming", dtype=self.dtype, name="fc1")(x)
        x = nn.relu(x)
        x = Dense(self.d_model, gain=self.gain, dtype=self.dtype, name="fc2")(x)
        if self.dropout > 0.0 and not deterministic:
            x = nn.Dropout(self.dropout, deterministic=False)(x)
        return x


class TransformerEncoderBlock(nn.Module):
    """Pre-LN encoder block with the reference's ``is_first`` quirk: the
    first block's residual stream starts from the *normed* input
    (reference STEVE/transformer.py:75-82)."""

    d_model: int
    num_heads: int
    dropout: float = 0.0
    gain: float = 1.0
    is_first: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        attn = MultiHeadAttention(
            self.d_model, self.num_heads, self.dropout, self.gain,
            dtype=self.dtype, name="attn",
        )
        ln_attn = nn.LayerNorm(dtype=self.dtype, name="attn_layer_norm")
        if self.is_first:
            x = ln_attn(x)
            x = x + attn(x, x, x, deterministic=deterministic)
        else:
            y = ln_attn(x)
            x = x + attn(y, y, y, deterministic=deterministic)
        y = nn.LayerNorm(dtype=self.dtype, name="ffn_layer_norm")(x)
        y = FFN(self.d_model, self.dropout, self.gain, dtype=self.dtype, name="ffn")(
            y, deterministic=deterministic
        )
        return x + y


class TransformerEncoder(nn.Module):
    """Stack of encoder blocks + final LayerNorm, 1/sqrt(2N) output gain
    (reference STEVE/transformer.py:89-114)."""

    num_blocks: int
    d_model: int
    num_heads: int
    dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        gain = (2 * self.num_blocks) ** -0.5 if self.num_blocks > 0 else 1.0
        for i in range(self.num_blocks):
            x = TransformerEncoderBlock(
                self.d_model, self.num_heads, self.dropout, gain,
                is_first=(i == 0), dtype=self.dtype, name=f"blocks_{i}",
            )(x, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="layer_norm")(x)


class TransformerDecoderBlock(nn.Module):
    """Causal self-attention + cross-attention to the encoder output
    (reference STEVE/transformer.py:117-164)."""

    d_model: int
    num_heads: int
    dropout: float = 0.0
    gain: float = 1.0
    is_first: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, x, enc_out, valid_len=None, deterministic: bool = True,
                 cache=None, cross_kv=None, project_kv_only: bool = False):
        cross_attn = MultiHeadAttention(
            self.d_model, self.num_heads, self.dropout, self.gain,
            dtype=self.dtype, name="encoder_decoder_attn",
        )
        if project_kv_only:
            return cross_attn(enc_out, enc_out, enc_out,
                              project_kv_only=True)
        self_attn = MultiHeadAttention(
            self.d_model, self.num_heads, self.dropout, self.gain,
            dtype=self.dtype, name="self_attn",
        )
        ln_self = nn.LayerNorm(dtype=self.dtype, name="self_attn_layer_norm")
        new_cache = None
        if cache is not None:
            if self.is_first:
                x = ln_self(x)
                a, new_cache = self_attn(x, x, x, cache=cache,
                                         deterministic=deterministic)
                x = x + a
            else:
                y = ln_self(x)
                a, new_cache = self_attn(y, y, y, cache=cache,
                                         deterministic=deterministic)
                x = x + a
        elif self.is_first:
            x = ln_self(x)
            x = x + self_attn(x, x, x, causal=True, valid_len=valid_len,
                              deterministic=deterministic)
        else:
            y = ln_self(x)
            x = x + self_attn(y, y, y, causal=True, valid_len=valid_len,
                              deterministic=deterministic)
        y = nn.LayerNorm(dtype=self.dtype, name="encoder_decoder_attn_layer_norm")(x)
        x = x + cross_attn(y, enc_out, enc_out, deterministic=deterministic,
                           precomputed_kv=cross_kv)
        y = nn.LayerNorm(dtype=self.dtype, name="ffn_layer_norm")(x)
        y = FFN(self.d_model, self.dropout, self.gain, dtype=self.dtype, name="ffn")(
            y, deterministic=deterministic
        )
        if cache is not None:
            return x + y, new_cache
        return x + y


class TransformerDecoder(nn.Module):
    """Stack of decoder blocks + final LayerNorm, 1/sqrt(3N) gain
    (reference STEVE/transformer.py:167-193)."""

    num_blocks: int
    d_model: int
    num_heads: int
    dropout: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, enc_out, valid_len=None, deterministic: bool = True,
                 caches=None, t=None, cross_kvs=None,
                 project_kv_only: bool = False):
        gain = (3 * self.num_blocks) ** -0.5 if self.num_blocks > 0 else 1.0
        new_caches = []
        outs = []
        for i in range(self.num_blocks):
            blk = TransformerDecoderBlock(
                self.d_model, self.num_heads, self.dropout, gain,
                is_first=(i == 0), dtype=self.dtype, name=f"blocks_{i}",
            )
            if project_kv_only:
                outs.append(blk(x, enc_out, project_kv_only=True))
            elif caches is not None:
                k_c, v_c = caches[i]
                x, nc = blk(x, enc_out, deterministic=deterministic,
                            cache=(k_c, v_c, t),
                            cross_kv=None if cross_kvs is None
                            else cross_kvs[i])
                new_caches.append(nc)
            else:
                x = blk(x, enc_out, valid_len=valid_len,
                        deterministic=deterministic)
        if project_kv_only:
            return tuple(outs)
        out = nn.LayerNorm(dtype=self.dtype, name="layer_norm")(x)
        if caches is not None:
            return out, tuple(new_caches)
        return out


def gumbel_softmax(rng, logits, tau: float, hard: bool, axis: int = -1):
    """Gumbel-softmax with optional straight-through hard sampling
    (reference STEVE/utils.py:44-58)."""
    eps = jnp.finfo(logits.dtype).tiny
    gumbels = -jnp.log(jax.random.exponential(rng, logits.shape, logits.dtype) + eps)
    y_soft = jax.nn.softmax((logits + gumbels) / tau, axis=axis)
    if not hard:
        return y_soft
    index = jnp.argmax(y_soft, axis=axis)
    y_hard = jax.nn.one_hot(index, logits.shape[axis], axis=axis, dtype=logits.dtype)
    return y_hard - jax.lax.stop_gradient(y_soft) + y_soft
