"""Grad-CAM for video models (counterpart of reference
``slowfast/visualization/gradcam_utils.py:12-178``).

The reference hooks forward/backward on named torch layers. In JAX the
same is one ``jax.grad``: the model forward is split at the target block
(``stage1`` produces the activations, ``stage2`` maps activations to
logits), and the class-score gradient w.r.t. the activations weights the
activation map.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gradcam_motionformer(model, variables, video, metadata, layer_idx: int,
                         labels=None, use_labels: bool = False):
    """Grad-CAM heatmaps for a Motionformer block's output tokens.

    Returns [B, T', H', W'] heatmaps in [0, 1] over the token grid.
    """

    def stage1(mdl, v, md):
        tokens, thw = mdl.tokenize(v)
        for blk in mdl.blocks[: layer_idx + 1]:
            tokens, _ = blk(tokens, md, thw)
        return tokens, thw

    def stage2(mdl, tokens, md, thw):
        for blk in mdl.blocks[layer_idx + 1 :]:
            tokens, _ = blk(tokens, md, thw)
        feat = mdl.norm(tokens)[:, 0]
        if mdl.cfg.MF.USE_MLP:
            feat = mdl.head_act(mdl.pre_logits_fc(feat))
        return mdl.head(feat)

    acts, thw = model.apply(variables, video, metadata, method=stage1)

    def score(a):
        logits = model.apply(variables, a, metadata, thw, method=stage2)
        idx = labels if (use_labels and labels is not None) else jnp.argmax(
            logits, axis=-1
        )
        return jnp.take_along_axis(logits, idx[:, None], axis=-1).sum()

    grads = jax.grad(score)(acts)  # [B, N, C]
    # channel weights = mean grad over tokens (exclude CLS)
    g = grads[:, 1:]
    a = acts[:, 1:]
    weights = g.mean(axis=1, keepdims=True)
    cam = jnp.maximum((weights * a).sum(-1), 0.0)  # [B, N-1]
    B = cam.shape[0]
    cam = cam.reshape(B, thw[0], thw[1], thw[2])
    mins = cam.min(axis=(1, 2, 3), keepdims=True)
    maxs = cam.max(axis=(1, 2, 3), keepdims=True)
    return (cam - mins) / jnp.maximum(maxs - mins, 1e-8)
