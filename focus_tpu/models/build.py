"""Model registry and builder.

Counterpart of the reference's ``slowfast/models/build.py:9-87``, redesigned
for JAX: ``build_model`` returns a flax Module (pure; no device placement,
no DDP wrap — replication/sharding happens in the train step via pjit).
"""

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp

from focus_tpu.utils.registry import Registry

MODEL_REGISTRY = Registry("MODEL")


def compute_dtype(cfg) -> Any:
    name = cfg.TPU.COMPUTE_DTYPE
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


def build_model(cfg):
    """Construct the flax module named by ``cfg.MODEL.MODEL_NAME``."""
    # import for registration side effects
    import focus_tpu.models.registry_imports  # noqa: F401

    from focus_tpu.config.node import CfgNode, StaticCfg

    name = cfg.MODEL.MODEL_NAME
    model_cls = MODEL_REGISTRY.get(name)
    if isinstance(cfg, CfgNode):
        cfg = StaticCfg(cfg)
    return model_cls(cfg=cfg, dtype=compute_dtype(cfg))


def maybe_zero_init_orvit(cfg, params):
    """With ORVIT.ZERO_INIT_ORVIT, zero every parameter of the
    residually-ADDED ORViT blocks (the MViT ADD_LAYERS variant, named
    ``orvit_blocks_*``) so the model starts as the plain backbone —
    reference build.py:66-68 + misc.module_0_init (which targets
    ``model.orvit_blocks``, a module list only that variant has)."""
    if not (cfg.ORVIT.ENABLE and getattr(cfg.ORVIT, "ZERO_INIT_ORVIT", False)):
        return params

    def walk(node):
        if not isinstance(node, dict):
            return node
        return {
            k: (
                jax.tree_util.tree_map(jnp.zeros_like, v)
                if k.startswith("orvit_blocks_")
                else walk(v)
            )
            for k, v in node.items()
        }

    return walk(params)


def init_model(model, cfg, sample_inputs: Tuple, rng: Optional[jax.Array] = None,
               **apply_kwargs):
    """Initialise model variables with a sample batch (jitted: eager
    per-op execution is a round trip per op on the remote TPU path)."""
    if rng is None:
        rng = jax.random.PRNGKey(cfg.RNG_SEED)
    k_params, k_slots, k_gumbel, k_drop = jax.random.split(rng, 4)
    rngs = {"params": k_params, "slots": k_slots, "gumbel": k_gumbel,
            "dropout": k_drop}
    # python-level flags (e.g. STEVE's `hard`) must stay static under jit
    static_idx = tuple(
        i + 1
        for i, a in enumerate(sample_inputs)
        if isinstance(a, (bool, str)) or a is None
    )
    init_fn = jax.jit(
        lambda r, *a: model.init(r, *a, **apply_kwargs),
        static_argnums=static_idx,
    )
    return init_fn(rngs, *sample_inputs)
