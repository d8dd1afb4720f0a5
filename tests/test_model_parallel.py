"""Tensor-parallel (model-axis) sharding on a virtual 8-device mesh.

A TPU extension beyond the reference's DDP-only parallelism: the
transformer dense layers are Megatron-style sharded over the mesh's
``model`` axis via GSPMD annotations (focus_tpu/parallel/mesh.py
``state_shardings``); XLA inserts the collectives. These tests check
(a) the specs land on the right leaves, (b) a dp x tp train step runs
and matches the pure-DP loss.
"""

import jax
import numpy as np
import pytest

from focus_tpu.engine.trainer import (
    build_supervised_state,
    make_supervised_train_step,
)
from focus_tpu.models import losses as losses_lib
from focus_tpu.models.build import build_model
from focus_tpu.parallel import mesh as mesh_lib


def _tiny_cfg(model_axis):
    import __graft_entry__ as ge

    cfg = ge._flagship_cfg(tiny=True)
    cfg.TPU.MESH.MODEL = model_axis
    return cfg


def _one_step(model_axis, B=8):
    cfg = _tiny_cfg(model_axis)
    mesh = mesh_lib.build_mesh(cfg, devices=jax.devices()[:8])
    model = build_model(cfg)
    rs = np.random.RandomState(0)
    video = rs.rand(B, 4, 32, 32, 3).astype(np.float32)
    labels = (np.arange(B) % cfg.MODEL.NUM_CLASSES).astype(np.int32)
    boxes = (rs.rand(B, 2, 4, 4) * 0.5 + 0.25).astype(np.float32)
    batch = (video, labels, np.arange(B, dtype=np.int32),
             {"orvit_bboxes": boxes})
    state = build_supervised_state(cfg, model, mesh, batch, 10)
    step = make_supervised_train_step(
        model, cfg, mesh, losses_lib.get_loss_func(cfg),
        state_sharding=mesh_lib.state_shardings(mesh, state),
    )
    sharded = mesh_lib.shard_batch(
        mesh, (video, labels, {"orvit_bboxes": boxes})
    )
    state, stats = step(
        state, sharded[0], sharded[1], sharded[2], jax.random.PRNGKey(0)
    )
    return state, float(jax.device_get(stats["loss"]))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_tp_specs_land_on_dense_layers():
    cfg = _tiny_cfg(2)
    mesh = mesh_lib.build_mesh(cfg, devices=jax.devices()[:8])
    assert mesh.shape["model"] == 2 and mesh.shape["data"] == 4
    state, _ = _one_step(2)
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    specs = {
        "/".join(str(getattr(p, "key", p)) for p in path): leaf.sharding.spec
        for path, leaf in flat
    }
    col = [s for n, s in specs.items()
           if ("qkv" in n or "fc1" in n) and n.endswith("kernel")]
    row = [s for n, s in specs.items()
           if ("attn/proj/" in n or "fc2" in n) and n.endswith("kernel")]
    # P('model', None) normalises its trailing None away
    assert col and all(len(s) and s[len(s) - 1] == "model" for s in col), col[:3]
    assert row and all(len(s) and s[0] == "model" for s in row), row[:3]
    # trajectory-kernel inputs stay replicated
    tk = [s for n, s in specs.items() if "proj_q" in n or "proj_kv" in n]
    assert tk and all(all(a is None for a in s) for s in tk)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_tp_matches_dp_loss():
    _, loss_dp = _one_step(1)
    _, loss_tp = _one_step(2)
    np.testing.assert_allclose(loss_tp, loss_dp, rtol=2e-3)
