"""timm-style image-ViT -> video-model pretrained import.

numpy replication of reference ``slowfast/models/utils.py:48-210``
(``load_state_dict`` + ``_conv_filter`` + ``load_pretrained``): strips
DDP/EMA prefixes, splits fused qkv, converts the patchify linear to a
conv kernel, adapts mismatched input channels, drops a mismatched
classifier, nearest-resizes positional/temporal embeddings, inflates
the 2D patch kernel to 3D, and splits pos_embed into the class +
spatial parts under the video model's names. URL download is
network-gated in this environment — only local files are read; the
transformations themselves are available for any timm-format file.
"""

from __future__ import annotations

import math
from typing import Dict

import numpy as np

from focus_tpu.utils import logging

logger = logging.get_logger(__name__)


def _nearest_1d(x: np.ndarray, size: int, axis: int) -> np.ndarray:
    """F.interpolate(mode='nearest') along one axis: index floor(i*n/size)."""
    n = x.shape[axis]
    idx = np.floor(np.arange(size) * n / size).astype(np.int64)
    return np.take(x, idx, axis=axis)


def load_timm_state_dict(path: str, use_ema: bool = False):
    """(reference models/utils.py:48-76)"""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    sd = payload
    if isinstance(payload, dict):
        if use_ema and "state_dict_ema" in payload:
            sd = payload["state_dict_ema"]
        elif "state_dict" in payload:
            sd = payload["state_dict"]
        elif "model_state" in payload:
            sd = payload["model_state"]
        elif "model" in payload:
            sd = payload["model"]
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        elif k.startswith("model."):
            k = k[len("model."):]
        out[k] = v.detach().cpu().numpy()
    return out


def conv_filter(sd: Dict[str, np.ndarray], patch_size: int = 16):
    """(reference _conv_filter, models/utils.py:78-100): patchify-linear
    -> conv kernel, head -> head.projection, fused qkv split."""
    out = {}
    for k, v in sd.items():
        if "patch_embed.proj.weight" in k:
            if v.ndim == 2:  # [O, 3*p*p] linear form
                v = v.reshape(v.shape[0], 3, patch_size, patch_size)
            k = "patch_embed.proj.weight"
        elif k == "head.weight":
            k = "head.projection.weight"
        elif k == "head.bias":
            k = "head.projection.bias"
        elif "qkv" in k:
            for name, chunk in zip("qkv", np.split(v, 3, axis=0)):
                out[k.replace("qkv", name)] = chunk
            continue
        out[k] = v
    return out


def timm_to_video_state(
    sd: Dict[str, np.ndarray],
    *,
    num_classes: int,
    num_patches: int,
    target_patch_kernel,
    num_frames: int = 0,
    in_chans: int = 3,
    first_conv: str = "patch_embed.proj",
    classifier: str = "head.projection",
    pretrained_num_classes: int = 1000,
    apply_conv_filter: bool = True,
):
    """(reference load_pretrained, models/utils.py:102-210). Returns a
    torch-name state dict ready for torch_import.import_torch_params."""
    if apply_conv_filter:
        sd = conv_filter(sd)
    else:
        sd = dict(sd)

    cw = first_conv + ".weight"
    if in_chans == 1 and cw in sd:
        w = sd[cw].astype(np.float64)
        o, i = w.shape[:2]
        if i > 3:
            assert i % 3 == 0
            w = w.reshape(o, i // 3, 3, *w.shape[2:]).sum(axis=2)
        else:
            w = w.sum(axis=1, keepdims=True)
        sd[cw] = w.astype(sd[cw].dtype)
    elif in_chans != 3 and cw in sd:
        w = sd[cw].astype(np.float64)
        if w.shape[1] != 3:
            logger.warning(f"Deleting first conv {first_conv}: shape mismatch")
            del sd[cw]
        else:
            repeat = int(math.ceil(in_chans / 3))
            w = np.tile(w, (1, repeat) + (1,) * (w.ndim - 2))[:, :in_chans]
            w = w * (3.0 / float(in_chans))
            sd[cw] = w.astype(sd[cw].dtype)

    cls_w = classifier + ".weight"
    if cls_w in sd:
        if num_classes == 1000 and pretrained_num_classes == 1001:
            sd[cls_w] = sd[cls_w][1:]
            sd[classifier + ".bias"] = sd[classifier + ".bias"][1:]
        elif num_classes != sd[cls_w].shape[0]:
            logger.info("Dropping mismatched classifier from pretrained")
            del sd[cls_w]
            sd.pop(classifier + ".bias", None)

    if "pos_embed" in sd and num_patches + 1 != sd["pos_embed"].shape[1]:
        pe = sd["pos_embed"]
        cls_pe, other = pe[:, :1], pe[:, 1:]
        other = _nearest_1d(other, num_patches, axis=1)
        sd["pos_embed"] = np.concatenate([cls_pe, other], axis=1)

    if "time_embed" in sd and num_frames and (
        num_frames != sd["time_embed"].shape[1]
    ):
        sd["time_embed"] = _nearest_1d(sd["time_embed"], num_frames, axis=1)

    if cw in sd and target_patch_kernel is not None:
        kt, kh, kw = target_patch_kernel
        w = sd[cw]
        if w.ndim == 4:  # [O, I, H, W] image kernel
            w = _nearest_1d(_nearest_1d(w, kh, axis=2), kw, axis=3)
            # temporal inflation by broadcast (reference expands without
            # the 1/kT rescale)
            w = np.broadcast_to(w[:, :, None], w.shape[:2] + (kt,) + w.shape[2:])
            sd[cw] = np.ascontiguousarray(w)

    # MViT naming: class + spatial pos embeds (reference :196-205)
    if "pos_embed" in sd:
        sd["pos_embed_class"] = sd["pos_embed"][:, :1]
        sd["pos_embed_spatial"] = sd["pos_embed"][:, 1:]
        del sd["pos_embed"]
    return sd


def load_into_state(cfg, state):
    """Apply MODEL.LOAD_IN_PRETRAIN (a LOCAL timm-format file; URLs are
    network-gated here) onto a supervised TrainState's params."""
    path = cfg.MODEL.LOAD_IN_PRETRAIN
    import os

    if path.startswith("http"):
        # try a direct download into a local cache (the reference pulls
        # timm URLs through torch.hub); a failure is a hard error — a
        # requested pretrained init must never silently degrade to
        # training from random weights
        cache = os.path.join(
            os.path.expanduser("~"), ".cache", "focus_tpu", "pretrained"
        )
        os.makedirs(cache, exist_ok=True)
        local = os.path.join(cache, os.path.basename(path.split("?")[0]))
        if not os.path.isfile(local):
            import urllib.request

            try:
                logger.info(f"Downloading LOAD_IN_PRETRAIN: {path}")
                urllib.request.urlretrieve(path, local + ".tmp")
                os.replace(local + ".tmp", local)
            except Exception as e:
                raise RuntimeError(
                    f"MODEL.LOAD_IN_PRETRAIN download failed ({e}); "
                    f"download the file manually and point "
                    f"LOAD_IN_PRETRAIN at it"
                ) from e
        path = local
    if not os.path.isfile(path):
        raise FileNotFoundError(
            f"MODEL.LOAD_IN_PRETRAIN file not found: {path} — a requested "
            f"pretrained init must not silently fall back to random "
            f"weights; clear LOAD_IN_PRETRAIN to train from scratch"
        )
    from focus_tpu.utils.torch_import import import_torch_params

    sd = load_timm_state_dict(path)
    stride = cfg.MVIT.PATCH_STRIDE
    num_patches = (cfg.DATA.TRAIN_CROP_SIZE // stride[-1]) * (
        cfg.DATA.TRAIN_CROP_SIZE // stride[-2]
    )
    sd = timm_to_video_state(
        sd,
        num_classes=cfg.MODEL.NUM_CLASSES,
        num_patches=num_patches,
        target_patch_kernel=tuple(cfg.MVIT.PATCH_KERNEL),
        num_frames=cfg.DATA.NUM_FRAMES,
    )
    # import against the scanned view when the model is pipeline-parallel
    # (same dance as torch_import.load_into_state)
    from focus_tpu.parallel import pipeline as pipe_lib

    pipe_stages = pipe_lib.pipelined_stages(state.params)
    template_params = (
        pipe_lib.from_pipelined(state.params) if pipe_stages else state.params
    )
    new_params, report = import_torch_params(
        sd, template_params, allow_missing=True
    )
    if pipe_stages:
        new_params = pipe_lib.to_pipelined(new_params, pipe_stages)
    logger.info(
        f"timm pretrained: {len(report['loaded'])} loaded, "
        f"{len(report['missing'])} missing, {len(report['unused'])} unused"
    )
    return state.replace(params=new_params)
