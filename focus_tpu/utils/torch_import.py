"""Torch checkpoint -> flax pytree importer.

Ingests the reference's ``.pyth``/``.pt`` torch pickles (reference
``slowfast/utils/checkpoint.py:201-394``: checkpoints carry a
``model_state`` dict of dotted torch names) and maps them onto our flax
parameter trees.

The mapping is generated from the *flax* side: every flax leaf path is
translated to its expected torch name by deterministic rules (module
renames + kernel/weight transposition), so unmapped or shape-mismatched
entries are reported explicitly instead of silently skipped (shape-matched
partial load like the reference's :364-382 is available via
``allow_missing``).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np

from focus_tpu.utils import logging

logger = logging.get_logger(__name__)

# flax module-path component -> torch name component
_RENAMES = {
    "pre_logits_fc": "pre_logits.fc",
    "dict_emb": "dict.dictionary",
    "dict": "dict.dictionary",
    "patch_embed_proj": "patch_embed.proj",
    # STEVE encoder MLPs are torch Sequentials (steve.py:224-227, 234)
    "mlp_fc1": "mlp.0",
    "mlp_fc2": "mlp.2",
}
# two adjacent flax components that collapse to one torch component
# (wrapper modules: our BatchNorm wraps nn.BatchNorm named 'bn'; MViT's
# AttentionPool holds conv 'pool' + 'norm' which torch names pool_X /
# norm_X on the attention module directly)
_PAIR_RENAMES = {
    ("bn", "bn"): "bn",
    ("a_bn", "bn"): "a_bn",
    ("b_bn", "bn"): "b_bn",
    ("c_bn", "bn"): "c_bn",
    ("branch1_bn", "bn"): "branch1_bn",
    ("pool_q", "pool"): "pool_q",
    ("pool_k", "pool"): "pool_k",
    ("pool_v", "pool"): "pool_v",
    ("pool_q", "norm"): "norm_q",
    ("pool_k", "norm"): "norm_k",
    ("pool_v", "norm"): "norm_v",
    # STEVE transformer FFNs are torch Sequentials (transformer.py)
    ("ffn", "fc1"): "ffn.0",
    ("ffn", "fc2"): "ffn.2",
}
# two-layer no-bias MLPs stored as torch Sequential (fc1->0, fc2->2)
_SEQ_MLPS = ("patch_to_d", "c_coord_to_feature")

# STEVE dVAE/BaseCNN sequential indices (reference STEVE/dvae.py and
# steve.py:162-173): flax names each stage; torch numbers the
# nn.Sequential slots (gaps are PixelShuffle/activation slots). The
# inner Conv2dBlock conv is torch attribute 'm'.
_DVAE_ENC = {"stem": "0", "head": "7",
             **{f"block_{i}": str(i + 1) for i in range(6)}}
_DVAE_DEC = {"in_block": "0", "block_0": "1", "block_1": "2",
             "block_2": "3", "up_proj_0": "4", "block_3": "6",
             "block_4": "7", "block_5": "8", "up_proj_1": "9",
             "head": "11"}
_BASECNN = {"block_0": "fenc.0", "block_1": "fenc.1", "block_2": "fenc.2",
            "head": "fenc.3"}
# stages whose inner flax 'conv' is the torch Conv2dBlock attribute 'm'
_CONV_BLOCK_STAGES = frozenset(
    k for k in (*_DVAE_ENC, *_DVAE_DEC, *_BASECNN) if k != "head"
)


def _flatten(tree, prefix=()) -> Dict[Tuple[str, ...], Any]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat: Dict[Tuple[str, ...], Any]):
    tree: Dict[str, Any] = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def flax_path_to_torch(path: Tuple[str, ...]) -> Tuple[str, str]:
    """Translate a flax param path to (torch_name, kind).

    kind in {linear, conv, ln_scale, bias, raw, embed} controls the
    layout transform applied to the torch tensor.
    """
    parts: List[str] = []
    leaf = path[-1]
    mods = path[:-1]
    steve_side = mods[:1] and mods[0] in ("dvae", "steve_encoder",
                                          "steve_decoder")
    for i, m in enumerate(mods):
        prev = parts[-1].split(".")[-1] if parts else None
        # STEVE sequential-stage names (context-dependent, see tables)
        if steve_side:
            if i == 2 and mods[0] == "dvae" and mods[1] in (
                "encoder", "decoder"
            ):
                table = _DVAE_ENC if mods[1] == "encoder" else _DVAE_DEC
                if m in table:
                    parts.append(table[m])
                    continue
            if i == 2 and mods[1] == "cnn" and m in _BASECNN:
                parts.append(_BASECNN[m])
                continue
            if m == "conv" and i >= 1 and mods[i - 1] in _CONV_BLOCK_STAGES:
                parts.append("m")
                continue
            if m == "linear":
                # STEVE's linear() wrapper module — no torch counterpart
                continue
        if prev is not None and (prev, m) in _PAIR_RENAMES:
            parts[-1] = ".".join(
                parts[-1].split(".")[:-1] + [_PAIR_RENAMES[(prev, m)]]
            )
        elif m.startswith("blocks_"):
            parts.append("blocks." + m[len("blocks_"):])
        elif m.startswith("orvit_blocks_"):
            parts.append("orvit_blocks." + m[len("orvit_blocks_"):])
        elif m in _RENAMES:
            parts.append(_RENAMES[m])
        elif m == "fc1" and prev in _SEQ_MLPS:
            parts.append("0")
        elif m == "fc2" and prev in _SEQ_MLPS:
            parts.append("2")
        else:
            parts.append(m)
    base = ".".join(parts)

    if leaf == "kernel":
        return base + ".weight", "linear"
    if leaf == "scale":
        return base + ".weight", "ln_scale"
    if leaf == "bias":
        return base + ".bias", "bias"
    if leaf == "embedding":
        return base + ".weight", "embed"
    if leaf in ("weight_ih", "weight_hh"):
        # torch GRUCell stores [3H, in]; ours [in, 3H]
        return base + "." + leaf, "linear"
    # bare parameters (cls_token, pos_embed, box_categories, ...)
    return ".".join(parts + [leaf]), "raw"


def _convert(tensor: np.ndarray, kind: str, target_shape) -> np.ndarray:
    t = np.asarray(tensor)
    if kind == "linear":
        if t.ndim == 2:
            t = t.T
        elif t.ndim == 5:  # conv3d [O, I, kT, kH, kW] -> [kT, kH, kW, I, O]
            t = t.transpose(2, 3, 4, 1, 0)
        elif t.ndim == 4:  # conv2d [O, I, kH, kW] -> [kH, kW, I, O]
            t = t.transpose(2, 3, 1, 0)
    if tuple(t.shape) != tuple(target_shape):
        raise ValueError(f"shape {t.shape} vs target {tuple(target_shape)}")
    return t


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(payload, dict):
        for key in ("model_state", "state_dict", "model"):
            if key in payload:
                payload = payload[key]
                break
    return {
        k.replace("module.", "", 1) if k.startswith("module.") else k:
            v.numpy() if hasattr(v, "numpy") else np.asarray(v)
        for k, v in payload.items()
    }


def apply_name_patterns(sd: Dict[str, np.ndarray], clear_patterns=(),
                        replace_patterns=()) -> Dict[str, np.ndarray]:
    """TRAIN.CHECKPOINT_CLEAR_NAME_PATTERN / REPLACE_NAME_PATTERN support
    (reference checkpoint.py:327-355)."""
    out = {}
    for k, v in sd.items():
        for pat in clear_patterns:
            k = k.replace(pat, "")
        for pat in replace_patterns:
            src, dst = pat
            k = k.replace(src, dst)
        out[k] = v
    return out


def inflate_2d_to_3d(sd: Dict[str, np.ndarray], params) -> Dict[str, np.ndarray]:
    """2D->3D conv inflation (reference checkpoint.py:162-198): a [O,I,kh,kw]
    conv kernel destined for a 3D conv is tiled along time and divided by
    the temporal extent."""
    flat = _flatten(params)
    want = {}
    for path, leaf in flat.items():
        tname, kind = flax_path_to_torch(path)
        if kind == "linear" and np.ndim(leaf) == 5:
            want[tname] = leaf.shape  # flax [kt,kh,kw,I,O]
    out = dict(sd)
    for tname, tgt in want.items():
        if tname in sd and np.ndim(sd[tname]) == 4:
            w2d = sd[tname]  # [O, I, kh, kw]
            kt = tgt[0]
            w3d = np.repeat(w2d[:, :, None], kt, axis=2) / float(kt)
            out[tname] = w3d
    return out


def import_torch_params(
    state_dict: Dict[str, np.ndarray],
    params,
    split_qkv: bool = False,
    orvit_attn_from_backbone: bool = False,
    allow_missing: bool = True,
):
    """Map a torch state_dict onto a flax params tree.

    Returns (new_params, report) where report lists loaded / missing /
    unused names.
    """
    sd = dict(state_dict)
    if split_qkv:
        sd = _merge_split_qkv(sd)
    if orvit_attn_from_backbone:
        sd = _copy_backbone_attn_to_orvit(sd, params)

    flat = _flatten(params)
    new_flat = {}
    loaded, missing = [], []
    used = set()
    seg_re = re.compile(r"^blocks_(\d+)_(\d+)$")
    for path, leaf in flat.items():
        # scanned layer stacks: blocks_{a}_{b}/body/<suffix> with a leading
        # layer axis -> stack torch blocks.{a+j}.<suffix>
        m = seg_re.match(path[0]) if path else None
        if m is not None:
            a = int(m.group(1))
            L = leaf.shape[0]
            sub = tuple(p for p in path[1:] if p != "body")
            _, kind = flax_path_to_torch(("blocks_0",) + sub)
            suffix = flax_path_to_torch(("blocks_0",) + sub)[0][len("blocks.0."):]
            names = [f"blocks.{a + j}.{suffix}" for j in range(L)]
            if all(n in sd for n in names):
                try:
                    stacked = np.stack(
                        [
                            _convert(sd[n], kind, leaf.shape[1:])
                            for n in names
                        ]
                    ).astype(np.asarray(leaf).dtype)
                    new_flat[path] = stacked
                    loaded.extend(names)
                    used.update(names)
                    continue
                except ValueError as e:
                    logger.warning(f"Shape mismatch for {names[0]}: {e}")
            missing.append(".".join(path))
            new_flat[path] = leaf
            continue
        tname, kind = flax_path_to_torch(path)
        if tname in sd:
            try:
                new_flat[path] = _convert(sd[tname], kind, leaf.shape).astype(
                    np.asarray(leaf).dtype
                )
                loaded.append(tname)
                used.add(tname)
                continue
            except ValueError as e:
                logger.warning(f"Shape mismatch for {tname}: {e}")
        missing.append(".".join(path))
        new_flat[path] = leaf
    unused = [k for k in sd if k not in used]
    report = {"loaded": loaded, "missing": missing, "unused": unused}
    if missing:
        msg = f"{len(missing)} params not found in checkpoint: {missing[:8]}..."
        if allow_missing:
            logger.warning(msg)
        else:
            raise KeyError(msg)
    logger.info(
        f"torch import: {len(loaded)} loaded, {len(missing)} missing, "
        f"{len(unused)} unused"
    )
    return _unflatten(new_flat), report


def _merge_split_qkv(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Reference SPLIT_QKV_CHECKPOINT support (checkpoint.py:586-596):
    checkpoints that store q/k/v separately are fused back to qkv."""
    out = dict(sd)
    for k in list(sd):
        if k.endswith(".q.weight"):
            base = k[: -len(".q.weight")]
            qkv = np.concatenate(
                [sd[f"{base}.{x}.weight"] for x in "qkv"], axis=0
            )
            out[base + ".qkv.weight"] = qkv
            if f"{base}.q.bias" in sd:
                out[base + ".qkv.bias"] = np.concatenate(
                    [sd[f"{base}.{x}.bias"] for x in "qkv"], axis=0
                )
    return out


def _copy_backbone_attn_to_orvit(sd, params) -> Dict[str, np.ndarray]:
    """Reference ORVIT.LOAD_ORVIT_ATTN_LAYERS_FROM_BB (checkpoint.py:356-363):
    every backbone ``blocks.*qkv*`` key is additionally offered under the
    ``orvit_`` prefix, so residually-added ORViT blocks (ADD_LAYERS ->
    flax ``orvit_blocks_{i}`` -> torch name ``orvit_blocks.{i}.…``) get
    their attention seeded from the backbone block at the same depth.
    Replacement-style ORViT blocks (ORVIT.LAYERS) keep the plain
    ``blocks.{i}`` names and load by name identity."""
    del params  # reference matches against model names; ours map by prefix
    out = dict(sd)
    for k, v in sd.items():
        if k.startswith("blocks") and "qkv" in k:
            out.setdefault(f"orvit_{k}", v)
    return out


def load_into_state(path: str, state_template, cfg, state_dict=None):
    """Load a torch checkpoint into a TrainState (params only).

    ``state_dict`` overrides file loading (e.g. Caffe2 blobs renamed by
    focus_tpu.utils.c2_import)."""
    sd = state_dict if state_dict is not None else load_torch_state_dict(path)
    sd = apply_name_patterns(
        sd,
        clear_patterns=tuple(cfg.TRAIN.CHECKPOINT_CLEAR_NAME_PATTERN or ()),
        replace_patterns=tuple(cfg.TRAIN.CHECKPOINT_REPLACE_NAME_PATTERN or ()),
    )
    # torch name maps target the scanned [L, ...] stack layout; when the
    # template is pipeline-parallel ([stages, L/stages, ...] under
    # 'ticks', parallel/pipeline.py), import against the scanned view
    # and re-split afterwards
    from focus_tpu.parallel import pipeline as pipe_lib

    pipe_stages = pipe_lib.pipelined_stages(state_template.params)
    template_params = (
        pipe_lib.from_pipelined(state_template.params)
        if pipe_stages
        else state_template.params
    )
    if cfg.TRAIN.CHECKPOINT_INFLATE:
        sd = inflate_2d_to_3d(sd, template_params)
    new_params, _ = import_torch_params(
        sd,
        template_params,
        split_qkv=bool(getattr(cfg, "SPLIT_QKV_CHECKPOINT", False)),
        orvit_attn_from_backbone=bool(cfg.ORVIT.LOAD_ORVIT_ATTN_LAYERS_FROM_BB)
        if cfg.ORVIT.ENABLE
        else False,
    )
    import jax.numpy as jnp

    new_params = _unflatten(
        {p: jnp.asarray(v) for p, v in _flatten(new_params).items()}
    )
    if pipe_stages:
        new_params = pipe_lib.to_pipelined(new_params, pipe_stages)
    new_state = state_template.replace(params=new_params)
    if state_template.batch_stats is not None:
        new_state = new_state.replace(
            batch_stats=import_torch_batch_stats(
                sd, state_template.batch_stats
            )
        )
    return new_state


def import_torch_batch_stats(sd: Dict[str, np.ndarray], batch_stats):
    """Map BN running_mean/running_var into the batch_stats collection."""
    flat = _flatten(batch_stats)
    out = {}
    loaded = 0
    for path, leaf in flat.items():
        leaf_name = path[-1]  # 'mean' or 'var'
        tname, _ = flax_path_to_torch(path[:-1] + ("bias",))
        tname = tname[: -len(".bias")] + ".running_" + leaf_name
        if tname in sd and tuple(sd[tname].shape) == tuple(leaf.shape):
            import jax.numpy as jnp

            out[path] = jnp.asarray(sd[tname], np.asarray(leaf).dtype)
            loaded += 1
        else:
            out[path] = leaf
    logger.info(f"torch import: {loaded}/{len(flat)} batch-stat leaves")
    return _unflatten(out)
