"""Discrete VAE for STEVE (reference ``slowfast/models/STEVE/dvae.py``).

NHWC throughout. The decoder's 2x PixelShuffle upsampling is expressed as
a reshape/transpose (``pixel_shuffle``) which XLA fuses into the
surrounding convs — no gather, no native op needed.
"""

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from focus_tpu.models.common import Conv2dBlock, conv2d


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """NHWC depth-to-space with torch.nn.PixelShuffle channel ordering:
    input channel c*r*r + i*r + j feeds output pixel offset (i, j) of
    channel c."""
    b, h, w, c = x.shape
    co = c // (r * r)
    x = x.reshape(b, h, w, co, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # b, h, i, w, j, co
    return x.reshape(b, h * r, w * r, co)


class DVAEEncoder(nn.Module):
    """4x4/s4 stem + six 1x1 conv-relu blocks + 1x1 head to vocab logits
    (reference dvae.py:8-17)."""

    vocab_size: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        x = Conv2dBlock(64, 4, 4, 0, dtype=self.dtype, name="stem")(x)
        for i in range(6):
            x = Conv2dBlock(64, 1, 1, 0, dtype=self.dtype, name=f"block_{i}")(x)
        return conv2d(self.vocab_size, 1, dtype=self.dtype, name="head")(x)


class DVAEDecoder(nn.Module):
    """Two PixelShuffle(2) upsampling stages back to pixels
    (reference dvae.py:19-32)."""

    img_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, z):
        x = Conv2dBlock(64, 1, dtype=self.dtype, name="in_block")(z)
        x = Conv2dBlock(64, 3, 1, 1, dtype=self.dtype, name="block_0")(x)
        x = Conv2dBlock(64, 1, 1, dtype=self.dtype, name="block_1")(x)
        x = Conv2dBlock(64, 1, 1, dtype=self.dtype, name="block_2")(x)
        x = Conv2dBlock(64 * 4, 1, dtype=self.dtype, name="up_proj_0")(x)
        x = pixel_shuffle(x, 2)
        x = Conv2dBlock(64, 3, 1, 1, dtype=self.dtype, name="block_3")(x)
        x = Conv2dBlock(64, 1, 1, dtype=self.dtype, name="block_4")(x)
        x = Conv2dBlock(64, 1, 1, dtype=self.dtype, name="block_5")(x)
        x = Conv2dBlock(64 * 4, 1, dtype=self.dtype, name="up_proj_1")(x)
        x = pixel_shuffle(x, 2)
        return conv2d(self.img_channels, 1, dtype=self.dtype, name="head")(x)


class DVAE(nn.Module):
    vocab_size: int
    img_channels: int
    dtype: Any = None

    def setup(self):
        self.encoder = DVAEEncoder(self.vocab_size, dtype=self.dtype)
        self.decoder = DVAEDecoder(self.img_channels, dtype=self.dtype)

    def __call__(self, x):
        return self.decoder(self.encoder(x))
