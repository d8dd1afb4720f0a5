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
import numpy as np


def model_gradcam(model, variables, video, metadata, layer_names,
                  labels=None, use_labels: bool = False):
    """Grad-CAM at arbitrary NAMED layers of any registered model.

    The reference hooks forward/backward on layers looked up by name
    (``gradcam_utils.py:12-110``); here the same taps are installed with
    ``nn.intercept_methods``: the target modules' ``__call__`` outputs
    are captured (activations) and perturbed by a traced zero whose
    gradient is exactly the backward-hook gradient.

    Args:
      video: [B, T, H, W, C] array or per-pathway list of them.
      layer_names: one "/"-joined module path per pathway (e.g.
        ``"s5/pathway0_res2"``), mirroring the reference's
        ``GRAD_CAM.LAYER_LIST`` (one per pathway).
    Returns:
      (cams, logits): cams is a list (one per layer) of [B, T, H, W]
      heatmaps in [0, 1], trilinearly upsampled to each pathway's input
      video shape and min-max normalised per clip — reference
      ``_calculate_localization_map``.
    """
    import flax.linen as nn

    targets = list(layer_names)
    video_list = video if isinstance(video, (list, tuple)) else [video]
    video_list = [jnp.asarray(v) for v in video_list]
    model_in = video_list if isinstance(video, (list, tuple)) else video_list[0]

    def _path(context):
        return "/".join(p for p in context.module.path)

    # pass 1: capture target activations (for tap shapes)
    shapes = {}

    def capture(next_fun, args, kwargs, context):
        out = next_fun(*args, **kwargs)
        p = _path(context)
        if context.method_name == "__call__" and p in targets:
            leaves = [out] if hasattr(out, "shape") else [
                o for o in jax.tree_util.tree_leaves(out)
                if hasattr(o, "shape")
            ]
            shapes[p] = [
                jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves
            ]
        return out

    with nn.intercept_methods(capture):
        jax.eval_shape(lambda v: model.apply(variables, v, metadata),
                       model_in)
    missing = [t for t in targets if t not in shapes]
    if missing:
        raise ValueError(
            f"Grad-CAM target layers not found in the model: {missing}"
        )

    taps0 = {
        p: [jnp.zeros(s.shape, s.dtype) for s in ss]
        for p, ss in shapes.items()
    }

    def score_fn(taps):
        acts = {}

        def tap(next_fun, args, kwargs, context):
            out = next_fun(*args, **kwargs)
            p = _path(context)
            if context.method_name == "__call__" and p in taps:
                if hasattr(out, "shape"):
                    out = out + taps[p][0]
                    acts[p] = [out]
                else:
                    leaves, treedef = jax.tree_util.tree_flatten(out)
                    new, ai = [], 0
                    for l in leaves:
                        if hasattr(l, "shape"):
                            l = l + taps[p][ai]
                            ai += 1
                        new.append(l)
                    out = jax.tree_util.tree_unflatten(treedef, new)
                    acts[p] = [
                        l for l in new if hasattr(l, "shape")
                    ]
            return out

        with nn.intercept_methods(tap):
            logits = model.apply(variables, model_in, metadata)
        idx = (
            jnp.asarray(labels)
            if (use_labels and labels is not None)
            else jnp.argmax(logits, axis=-1)
        )
        score = jnp.take_along_axis(logits, idx[:, None], axis=-1).sum()
        return score, (logits, acts)

    grads, (logits, acts) = jax.grad(score_fn, has_aux=True)(taps0)

    cams = []
    for li, name in enumerate(targets):
        # a multi-leaf target (e.g. a whole ResStage returning one array
        # per pathway) yields one cam per leaf, mapped to pathway = leaf
        # index; a single-leaf target maps to pathway = target index
        n_leaves = len(acts[name])
        for j in range(n_leaves):
            g = grads[name][j].astype(jnp.float32)  # [B, T', H', W', C]
            a = acts[name][j].astype(jnp.float32)
            # channel weights = spatial mean of the gradient per frame
            # (reference gradcam_utils.py:100-106)
            w = g.mean(axis=(2, 3), keepdims=True)
            cam = jnp.maximum((w * a).sum(-1), 0.0)  # [B, T', H', W']
            pw = j if n_leaves > 1 else li
            tgt = video_list[min(pw, len(video_list) - 1)].shape[1:4]
            cam = jax.image.resize(
                cam, (cam.shape[0],) + tuple(tgt), method="trilinear"
            )
            mins = cam.min(axis=(1, 2, 3), keepdims=True)
            maxs = cam.max(axis=(1, 2, 3), keepdims=True)
            cams.append((cam - mins) / jnp.maximum(maxs - mins, 1e-6))
    return cams, logits


def overlay_heatmap(cam, video, data_mean, data_std, colormap="viridis",
                    alpha: float = 0.5):
    """Colormap the Grad-CAM heatmap over the (de-normalised) input
    frames (reference gradcam_utils.py:155-170): result =
    ``alpha * colormap(cam)[..., :3] + (1 - alpha) * input``.

    cam: [B, T, H, W] in [0, 1]; video: [B, T, H, W, C] normalised
    model-input frames. Returns float32 [B, T, H, W, 3] in [0, 1].
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from focus_tpu.datasets.utils import revert_tensor_normalize

    cmap = plt.get_cmap(colormap)
    heat = cmap(np.asarray(cam))[..., :3]
    frames = revert_tensor_normalize(
        np.asarray(video), data_mean, data_std
    )
    frames = np.clip(frames, 0.0, 1.0)
    return np.clip(
        alpha * heat + (1.0 - alpha) * frames, 0.0, 1.0
    ).astype(np.float32)


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
