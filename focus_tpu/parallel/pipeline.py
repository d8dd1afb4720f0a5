"""Pipeline-parallel parameter-layout conversion.

``ScannedTrajBlocks`` stores a contiguous transformer stack as
``blocks_i_j/body/...`` leaves with a leading ``[L, ...]`` layer axis;
``PipelinedTrajBlocks`` (models/motionformer.py) stores the same weights
as ``blocks_i_j/ticks/pipe_stages/layers/...`` leaves shaped
``[stages, L/stages, ...]``. The mapping is a pure reshape — stage ``s``
holds layers ``s*L/stages .. (s+1)*L/stages - 1`` — so checkpoints
trained under either layout interchange losslessly.

These converters let a DP/TP-trained checkpoint (or a torch import,
utils/torch_import.py, which produces the scanned layout) serve or
fine-tune under pipeline parallelism and vice versa. They apply to any
param-like tree (params, adamw mu/nu share the structure).
"""

from __future__ import annotations

import jax


def _reshape_tree(tree, fn):
    return jax.tree_util.tree_map(fn, tree)


def to_pipelined(params, stages: int):
    """Scanned layout -> pipelined layout with ``stages`` stages.

    Rewrites every ``<blocks_*>/body`` subtree (leaves ``[L, ...]``) to
    ``<blocks_*>/ticks/pipe_stages/layers`` (leaves
    ``[stages, L/stages, ...]``). Non-block entries pass through.
    """

    def walk(node, parent_key=""):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if (
                k == "body"
                and parent_key.startswith("blocks_")
                and isinstance(v, dict)
            ):
                out["ticks"] = {
                    "pipe_stages": {
                        "layers": _reshape_tree(v, _split_leaf(stages))
                    }
                }
            else:
                out[k] = walk(v, k)
        return out

    return walk(params)


def pipelined_stages(params) -> int:
    """Stage count of the first pipelined block stack in ``params``, or
    0 when the tree uses the scanned/flat layout."""
    if not isinstance(params, dict):
        return 0
    for k, v in params.items():
        if (
            k == "ticks"
            and isinstance(v, dict)
            and "pipe_stages" in v
        ):
            leaves = jax.tree_util.tree_leaves(v)
            if leaves:
                return int(leaves[0].shape[0])
        if isinstance(v, dict):
            found = pipelined_stages(v)
            if found:
                return found
    return 0


def _split_leaf(stages):
    def split(leaf):
        n_layers = leaf.shape[0]
        if n_layers % stages:
            raise ValueError(
                f"stack of {n_layers} layers not divisible by "
                f"{stages} pipeline stages"
            )
        return leaf.reshape((stages, n_layers // stages) + leaf.shape[1:])

    return split


def _merge_leaf(leaf):
    return leaf.reshape((leaf.shape[0] * leaf.shape[1],) + leaf.shape[2:])


def convert_state_dict_layout(raw, template):
    """Rewrite a restored state dict so its block-stack layout matches
    ``template`` (both plain nested dicts, flax ``to_state_dict`` form).

    Wherever the template holds a pipelined stack (``ticks/pipe_stages/
    layers``) but ``raw`` holds the scanned one (``body``), the subtree is
    reshaped in place — and vice versa — so checkpoints trained under
    either parallelism layout restore into the other
    (utils/checkpoint.py load_checkpoint). Everything else passes
    through untouched.
    """

    def walk(r, t):
        if not isinstance(r, dict) or not isinstance(t, dict):
            return r
        out = {}
        for k, v in r.items():
            if (
                k == "body"
                and "ticks" in t
                and "body" not in t
                and isinstance(v, dict)
            ):
                tmpl_leaves = jax.tree_util.tree_leaves(t["ticks"])
                if tmpl_leaves:
                    converted = _reshape_tree(
                        v, _split_leaf(int(tmpl_leaves[0].shape[0]))
                    )
                else:
                    # leafless mirror of the param structure (e.g. optax
                    # MaskedNode subtrees) — re-nest without reshaping
                    converted = v
                out["ticks"] = {"pipe_stages": {"layers": converted}}
            elif (
                k == "ticks"
                and "body" in t
                and "ticks" not in t
                and isinstance(v, dict)
                and "pipe_stages" in v
            ):
                out["body"] = _reshape_tree(
                    v["pipe_stages"]["layers"], _merge_leaf
                )
            else:
                out[k] = walk(v, t.get(k, None))
        return out

    return walk(raw, template)


def from_pipelined(params):
    """Pipelined layout -> scanned layout (inverse of ``to_pipelined``)."""

    def walk(node, parent_key=""):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if (
                k == "ticks"
                and parent_key.startswith("blocks_")
                and isinstance(v, dict)
                and "pipe_stages" in v
            ):
                sub = v["pipe_stages"]["layers"]
                out["body"] = _reshape_tree(sub, _merge_leaf)
            else:
                out[k] = walk(v, k)
        return out

    return walk(params)
