"""Sequence-parallel (seq-axis) sharding on a virtual 8-device mesh.

A TPU extension beyond the reference's DDP-only parallelism (listed as
the stretch extension in SURVEY.md §5 "Long-context / sequence
parallelism"): transformer token activations are sharded over the
mesh's ``seq`` axis via shard_tokens constraints at block boundaries;
GSPMD partitions LN/MLP/projections token-wise and inserts the k/v
all-gathers trajectory attention needs. The Pallas kernels are
single-device programs, so sp runs the XLA attention path (the
``use_pallas`` flags fold in ``not seq_shard``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from focus_tpu.engine.trainer import (
    build_supervised_state,
    make_supervised_eval_step,
    make_supervised_train_step,
)
from focus_tpu.models import losses as losses_lib
from focus_tpu.models.build import build_model
from focus_tpu.parallel import mesh as mesh_lib

needs8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _tiny_cfg(model_axis=1, seq_axis=1):
    import __graft_entry__ as ge

    cfg = ge._flagship_cfg(tiny=True)
    cfg.TPU.MESH.MODEL = model_axis
    cfg.TPU.MESH.SEQ = seq_axis
    return cfg


def _one_step(model_axis, seq_axis, B=8):
    cfg = _tiny_cfg(model_axis, seq_axis)
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


@needs8
def test_shard_tokens_places_seq_axis():
    cfg = _tiny_cfg(seq_axis=2)
    mesh = mesh_lib.build_mesh(cfg, devices=jax.devices()[:8])
    assert dict(mesh.shape) == {
        "data": 4, "pipe": 1, "seq": 2, "model": 1, "expert": 1,
    }
    assert mesh_lib.has_seq_axis(mesh)
    f = mesh_lib.mesh_context(jax.jit(mesh_lib.shard_tokens), mesh)
    y = f(jnp.zeros((4, 32, 8)))
    spec = y.sharding.spec
    assert tuple(spec)[:2] == ("data", "seq"), spec


@needs8
def test_sp_matches_dp_loss():
    _, loss_dp = _one_step(1, 1)
    _, loss_sp = _one_step(1, 2)
    np.testing.assert_allclose(loss_sp, loss_dp, rtol=2e-3)


@needs8
def test_sp_tp_matches_dp_loss():
    """Full dp=2 x seq=2 x tp=2 three-axis mesh."""
    _, loss_dp = _one_step(1, 1)
    _, loss_sptp = _one_step(2, 2)
    np.testing.assert_allclose(loss_sptp, loss_dp, rtol=2e-3)


@needs8
def test_sp_eval_matches_dp():
    def run_eval(seq_axis):
        cfg = _tiny_cfg(1, seq_axis)
        mesh = mesh_lib.build_mesh(cfg, devices=jax.devices()[:8])
        model = build_model(cfg)
        rs = np.random.RandomState(0)
        B = 8
        video = rs.rand(B, 4, 32, 32, 3).astype(np.float32)
        labels = (np.arange(B) % cfg.MODEL.NUM_CLASSES).astype(np.int32)
        boxes = (rs.rand(B, 2, 4, 4) * 0.5 + 0.25).astype(np.float32)
        batch = (video, labels, np.arange(B, dtype=np.int32),
                 {"orvit_bboxes": boxes})
        state = build_supervised_state(cfg, model, mesh, batch, 10)
        step = make_supervised_eval_step(model, cfg, mesh)
        sharded = mesh_lib.shard_batch(mesh, (video, {"orvit_bboxes": boxes}))
        return np.asarray(jax.device_get(step(state, *sharded)))

    out_dp = run_eval(1)
    out_sp = run_eval(2)
    np.testing.assert_allclose(out_sp, out_dp, atol=2e-5)
