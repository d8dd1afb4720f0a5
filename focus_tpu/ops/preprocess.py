"""Device-resident input preprocessing.

The north-star data path ships raw uint8 pixels to the chip (4x
smaller H2D than float32) and runs normalisation on device, where XLA
fuses the (x/255 - mean)/std sweep into the first consumer (the
patch-embed / stem matmul's input pipeline). Host-side the eval
pipeline then only decodes + resizes + crops uint8 — the float
conversion, normalise math and float copies that dominated the
host cost (BENCH_NOTES round 3: 189.5 ms CPU/clip through the f32
stack) disappear from the CPU budget entirely.

Replaces the host-side normalize of reference
``slowfast/datasets/utils.py:319-337`` for pipelines that opt in via
``cfg.TPU.DEVICE_PREPROCESS``; the contract with the engine is carried
by dtype — any uint8 pathway reaching a jitted step is normalised on
device, float pathways pass through untouched.
"""

from __future__ import annotations

import jax.numpy as jnp


def device_normalize(video, cfg):
    """Normalise uint8 pathway tensors on device (inside jit).

    ``video``: one array or a tuple/list of pathway arrays, [B, T, H,
    W, C]-like, either float (already normalised on host — returned
    unchanged) or uint8 raw pixels. mean/std come from cfg.DATA (python
    floats, folded as jit constants).
    """
    mean = jnp.asarray(cfg.DATA.MEAN, jnp.float32)
    std = jnp.asarray(cfg.DATA.STD, jnp.float32)
    inv_std = 1.0 / std

    def _norm(x):
        if x.dtype != jnp.uint8:
            return x
        xf = x.astype(jnp.float32) * (1.0 / 255.0)
        return (xf - mean) * inv_std

    if isinstance(video, (tuple, list)):
        return type(video)(_norm(v) for v in video)
    return _norm(video)
