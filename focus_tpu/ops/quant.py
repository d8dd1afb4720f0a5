"""Dynamic int8 dense for serving (``TPU.INT8_SERVING``).

A TPU-native serving extension beyond the reference (which serves in
fp16/fp32 CUDA): the big transformer dense layers (qkv, proj, fc1, fc2)
run as int8 x int8 -> int32 matmuls on the MXU, which on v5e-class parts
has ~2x the bf16 peak (394 vs 197 TOPS). Quantization is dynamic and
symmetric — per-output-channel weight scales, per-token activation
scales — so there is no calibration step and the checkpoint/param tree
is unchanged (weights stay f32/bf16; the int8 cast happens inside the
step and fuses into the surrounding elementwise work).

Numerics: W8A8 symmetric dynamic quantization of LayerNormed ViT
activations typically costs well under half a point of top-1; the delta
on the golden-fixture models is measured in
``tests/test_int8_serving.py``. This is a labeled serving mode — the
parity-tested path stays the exact-erf bf16/f32 model.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_weight(kernel, eps: float = 1e-8):
    """Per-output-channel symmetric int8 quantization of a [K, N] (or
    [..., K, N] stacked) dense kernel. Returns (int8 kernel, f32 scales
    broadcastable against the matmul output)."""
    k32 = kernel.astype(jnp.float32)
    s = jnp.max(jnp.abs(k32), axis=-2, keepdims=True) / 127.0
    s = jnp.maximum(s, eps)
    q = jnp.clip(jnp.round(k32 / s), -127, 127).astype(jnp.int8)
    return q, s


def quantize_acts(x, eps: float = 1e-8):
    """Per-token (last-dim) symmetric int8 quantization of activations."""
    x32 = x.astype(jnp.float32)
    s = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, eps)
    q = jnp.clip(jnp.round(x32 / s), -127, 127).astype(jnp.int8)
    return q, s


def quantized_dense(x, kernel, bias=None):
    """y = dequant(int8(x) @ int8(kernel)) + bias, accumulated in int32
    on the MXU. x: [..., K]; kernel: [K, N]; returns x.dtype."""
    wq, s_w = quantize_weight(kernel)
    xq, s_x = quantize_acts(x)
    y = jax.lax.dot_general(
        xq, wq,
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * (s_x * s_w)  # s_w: [1, N] broadcasts
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    return y.astype(x.dtype)
