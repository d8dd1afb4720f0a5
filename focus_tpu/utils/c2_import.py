"""Caffe2 checkpoint ingestion (reference ``slowfast/utils/
c2_model_loading.py`` + the caffe2 branch of ``checkpoint.py:241-300``).

Caffe2 zoo pickles store a flat ``{"blobs": {name: ndarray}}`` dict with
layer names like ``res4_1_branch2a_w`` / ``t_pool1_subsample_bn_s``. This
module renames them to the reference's PyTorch state-dict names (the
name grammar IS the compat surface, so the rewrite rules must agree rule
for rule) and hands the result to ``torch_import`` — after that the
normal torch→flax mapping applies unchanged.
"""

from __future__ import annotations

import pickle
import re
from typing import Dict

import numpy as np

from focus_tpu.utils import logging

logger = logging.get_logger(__name__)

# rewrite rules applied IN ORDER; each is re.sub over the running name
# (reference c2_model_loading.py:16-124)
_RULES = [
    # non-local blocks: theta/phi/g/out convs + their BN
    (r"^nonlocal_conv([0-9]+)_([0-9]+)_(.*)", r"s\1.pathway0_nonlocal\2_\3"),
    (r"^(.*)_nonlocal([0-9]+)_(theta|g|phi|out)(.*)",
     r"\1_nonlocal\2.conv_\3\4"),
    (r"^(.*)_nonlocal([0-9]+)_(bn)_(.*)", r"\1_nonlocal\2.\3.\4"),
    # SlowFast fuse convs (t_ prefix = fast pathway)
    (r"^t_pool1_subsample_bn_(.*)", r"s1_fuse.bn.\1"),
    (r"^t_pool1_subsample_(.*)", r"s1_fuse.conv_f2s.\1"),
    (r"^t_res([0-9]+)_([0-9]+)_branch2c_bn_subsample_bn_(.*)",
     r"s\1_fuse.bn.\3"),
    (r"^t_res([0-9]+)_([0-9]+)_branch2c_bn_subsample_(.*)",
     r"s\1_fuse.conv_f2s.\3"),
    # slow pathway residual stages / stem
    (r"^res([0-9]+)_([0-9]+)_branch([0-9]+)([a-z])_(.*)",
     r"s\1.pathway0_res\2.branch\3.\4_\5"),
    (r"^res_conv1_bn_(.*)", r"s1.pathway0_stem.bn.\1"),
    (r"^conv1_xy(.*)", r"s1.pathway0_stem.conv_xy\1"),
    (r"^conv1_(.*)", r"s1.pathway0_stem.conv.\1"),
    (r"^res([0-9]+)_([0-9]+)_branch([0-9]+)_(.*)",
     r"s\1.pathway0_res\2.branch\3_\4"),
    (r"^res_conv1_(.*)", r"s1.pathway0_stem.conv.\1"),
    # fast pathway mirrors
    (r"^t_res([0-9]+)_([0-9]+)_branch([0-9]+)([a-z])_(.*)",
     r"s\1.pathway1_res\2.branch\3.\4_\5"),
    (r"^t_res_conv1_bn_(.*)", r"s1.pathway1_stem.bn.\1"),
    (r"^t_conv1_(.*)", r"s1.pathway1_stem.conv.\1"),
    (r"^t_res([0-9]+)_([0-9]+)_branch([0-9]+)_(.*)",
     r"s\1.pathway1_res\2.branch\3_\4"),
    (r"^t_res_conv1_(.*)", r"s1.pathway1_stem.conv.\1"),
    # head / SE
    (r"pred_(.*)", r"head.projection.\1"),
    (r"(.*)b_bn_fc(.*)", r"\1se.fc\2"),
    (r"conv_5(.*)", r"head.conv_5\1"),
    (r"lin_5(.*)", r"head.lin_5\1"),
    # parameter-kind suffixes
    (r"(.*)bn.b\Z", r"\1bn.bias"),
    (r"(.*)bn.s\Z", r"\1bn.weight"),
    (r"(.*)bn.rm\Z", r"\1bn.running_mean"),
    (r"(.*)bn.riv\Z", r"\1bn.running_var"),
    (r"(.*)[\._]b\Z", r"\1.bias"),
    (r"(.*)[\._]w\Z", r"\1.weight"),
]

_SKIP = re.compile(r"(_momentum|_lr|_iter|_riv_s|model_iter|__)$")


def c2_name_to_torch(name: str) -> str:
    """Caffe2 blob name -> reference PyTorch state-dict name."""
    for src, dst in _RULES:
        name = re.sub(src, dst, name)
    return name


def load_c2_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a Caffe2 pickle and return a torch-named numpy state dict.

    Optimizer/bookkeeping blobs are dropped; everything else is renamed
    through the rule table (shape handling — 1->3D expansion, sub-BN
    stat tiling, conv layout — happens later in torch_import's
    per-parameter conversion)."""
    with open(path, "rb") as f:
        ckpt = pickle.load(f, encoding="latin1")
    blobs = ckpt["blobs"] if "blobs" in ckpt else ckpt
    out = {}
    for key, value in blobs.items():
        if _SKIP.search(key) or not isinstance(value, np.ndarray):
            continue
        out[c2_name_to_torch(key)] = np.asarray(value)
    logger.info(f"Converted {len(out)} caffe2 blobs from {path}")
    return out
