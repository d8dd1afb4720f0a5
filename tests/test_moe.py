"""Mixture-of-Experts block MLPs + expert parallelism (models/moe.py,
mesh 'expert' axis) — a TPU scaling extension beyond the reference
(which has no MoE; the dense MLP it replaces is reference
slowfast/models/ORViT/utils.py:79-98).

The routing math (Switch top-1, capacity-bounded einsum dispatch) is
mesh-independent, so exactness vs a per-token reference runs on one
device; expert-parallel placement and dp x ep loss parity run on the
virtual 8-device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focus_tpu.engine.trainer import (
    build_supervised_state,
    make_supervised_train_step,
)
from focus_tpu.models import losses as losses_lib
from focus_tpu.models.build import build_model
from focus_tpu.models.moe import MoEMlp
from focus_tpu.parallel import mesh as mesh_lib

needs8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _moe_cfg(experts=2, expert_axis=1, pipe=1, depth=4):
    import __graft_entry__ as ge

    cfg = ge._flagship_cfg(tiny=True)
    cfg.ORVIT.ENABLE = False
    cfg.ORVIT.LAYERS = []
    cfg.MF.DEPTH = depth
    cfg.TPU.MOE.NUM_EXPERTS = experts
    cfg.TPU.MESH.EXPERT = expert_axis
    cfg.TPU.MESH.PIPE = pipe
    return cfg


def test_moe_matches_per_token_reference():
    """Ample capacity: MoE output == per-token dense evaluation of the
    argmax expert, weighted by its gate probability."""
    b, n, d, h, e = 2, 8, 4, 8, 2
    rs = np.random.RandomState(0)
    x = rs.randn(b, n, d).astype(np.float32)
    moe = MoEMlp(hidden_features=h, num_experts=e, capacity_factor=float(e))
    variables = moe.init({"params": jax.random.PRNGKey(0)}, x)
    y = moe.apply(variables, x)

    p = jax.device_get(variables["params"])
    rk, rb = p["router"]["kernel"], p["router"]["bias"]
    k1, b1 = p["experts"]["kernel1"], p["experts"]["bias1"]
    k2, b2 = p["experts"]["kernel2"], p["experts"]["bias2"]
    want = np.zeros_like(x)
    for bi in range(b):
        for t in range(n):
            logits = x[bi, t] @ rk + rb
            probs = np.asarray(jax.nn.softmax(jnp.asarray(logits)))
            ei = int(np.argmax(probs))
            hdn = np.asarray(
                jax.nn.gelu(jnp.asarray(x[bi, t] @ k1[ei] + b1[ei]),
                            approximate=False)
            )
            want[bi, t] = probs[ei] * (hdn @ k2[ei] + b2[ei])
    np.testing.assert_allclose(np.asarray(y), want, atol=2e-5)


def test_moe_capacity_drops_overflow_tokens():
    """cap=1: only the first token routed to each expert contributes;
    the rest get exactly zero (the residual carries them — Switch)."""
    b, n, d, h, e = 1, 6, 4, 8, 2
    rs = np.random.RandomState(1)
    x = np.tile(rs.randn(1, 1, d).astype(np.float32), (b, n, 1))
    # identical tokens -> all route to one expert; cap = ceil(6/2*1/3)=1
    moe = MoEMlp(hidden_features=h, num_experts=e, capacity_factor=1 / 3)
    variables = moe.init({"params": jax.random.PRNGKey(0)}, x)
    y = np.asarray(moe.apply(variables, x))
    assert np.any(np.abs(y[0, 0]) > 0)
    np.testing.assert_array_equal(y[0, 1:], np.zeros_like(y[0, 1:]))


def test_moe_model_sows_aux_loss():
    """The full Motionformer with MoE blocks exposes one load-balance
    scalar per layer through the 'moe' collection."""
    cfg = _moe_cfg(experts=2, depth=4)
    model = build_model(cfg)
    video = np.random.RandomState(0).rand(2, 4, 32, 32, 3).astype(np.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        video, {},
    )
    out, mods = model.apply(
        variables, video, {}, train=True,
        rngs={"dropout": jax.random.PRNGKey(2)}, mutable=["moe"],
    )
    # sown as (aux * w, w) pairs; every layer contributes weight 1 here
    leaves = jax.tree_util.tree_leaves(mods["moe"])
    num = sum(float(jnp.sum(leaf[..., 0])) for leaf in leaves)
    den = sum(float(jnp.sum(leaf[..., 1])) for leaf in leaves)
    assert den == cfg.MF.DEPTH
    # Switch aux is >= 1 (== 1 at perfect balance) per layer
    assert num / den >= 0.99


def _one_moe_step(expert_axis, pipe=1, B=8):
    cfg = _moe_cfg(experts=2, expert_axis=expert_axis, pipe=pipe)
    mesh = mesh_lib.build_mesh(cfg, devices=jax.devices()[:8])
    model = build_model(cfg)
    video = np.random.RandomState(0).rand(B, 4, 32, 32, 3).astype(np.float32)
    labels = (np.arange(B) % cfg.MODEL.NUM_CLASSES).astype(np.int32)
    state = build_supervised_state(
        cfg, model, mesh, (video, labels, None, {}), 10
    )
    # identical weights across layouts: one fixed-seed scanned init,
    # converted for the pipelined runs
    cfg_s = _moe_cfg(experts=2, expert_axis=1, pipe=1)
    vs = build_model(cfg_s).init(
        {"params": jax.random.PRNGKey(7), "dropout": jax.random.PRNGKey(8)},
        video[:1], {},
    )
    params = vs["params"]
    if pipe > 1:
        from focus_tpu.parallel import pipeline as pipe_lib

        params = pipe_lib.to_pipelined(params, stages=pipe)
    state = state.replace(params=params)
    state = jax.device_put(state, mesh_lib.state_shardings(mesh, state))
    step = make_supervised_train_step(
        model, cfg, mesh, losses_lib.get_loss_func(cfg),
        state_sharding=mesh_lib.state_shardings(mesh, state),
    )
    sharded = mesh_lib.shard_batch(mesh, (video, labels, {}))
    state, stats = step(
        state, sharded[0], sharded[1], sharded[2], jax.random.PRNGKey(0)
    )
    return state, float(jax.device_get(stats["loss"]))


@needs8
def test_expert_param_placement():
    cfg = _moe_cfg(experts=2, expert_axis=2)
    mesh = mesh_lib.build_mesh(cfg, devices=jax.devices()[:8])
    assert mesh_lib.has_expert_axis(mesh)
    model = build_model(cfg)
    video = np.random.RandomState(0).rand(8, 4, 32, 32, 3).astype(np.float32)
    state = build_supervised_state(
        cfg, model, mesh, (video, np.zeros(8, np.int32), None, {}), 10
    )
    shard_tree = mesh_lib.state_shardings(mesh, state)
    found = []
    for path, sh in jax.tree_util.tree_leaves_with_path(shard_tree):
        name = jax.tree_util.keystr(path)
        if "experts" in name and "kernel" in name:
            found.append(tuple(sh.spec))
    assert found and all(
        len(spec) >= 3 and spec[-3] == "expert" for spec in found
    ), found


@needs8
def test_ep_train_matches_dp_loss():
    """Expert-parallel placement is resharding only: dp=4 x ep=2
    computes the dp-only loss exactly (identical fixed-seed init)."""
    _, loss_dp = _one_moe_step(expert_axis=1)
    _, loss_ep = _one_moe_step(expert_axis=2)
    np.testing.assert_allclose(loss_ep, loss_dp, rtol=2e-3)


@needs8
def test_ep_composes_with_pipeline():
    """dp=2 x pipe=2 x ep=2: MoE blocks inside the circular pipeline."""
    _, loss_dp = _one_moe_step(expert_axis=1, pipe=1)
    _, loss_ppep = _one_moe_step(expert_axis=2, pipe=2)
    np.testing.assert_allclose(loss_ppep, loss_dp, rtol=2e-3)
