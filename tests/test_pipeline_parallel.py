"""Pipeline parallelism (pipe-axis) — a TPU scaling extension beyond the
reference's DDP-only parallelism (reference slowfast/utils/distributed.py).

PipelinedTrajBlocks runs a homogeneous trajectory-block stack as a GSPMD
circular pipeline: params/activations carry a leading [stages, ...] axis
sharded over the mesh 'pipe' axis; the ring rotation (jnp.roll on the
sharded axis) lowers to a collective-permute. The math is
mesh-independent, so exactness vs the scanned stack is tested on one
device and the distributed losses on the virtual 8-device mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from focus_tpu.engine.trainer import (
    build_supervised_state,
    make_supervised_eval_step,
    make_supervised_train_step,
)
from focus_tpu.models import losses as losses_lib
from focus_tpu.models.build import build_model
from focus_tpu.parallel import mesh as mesh_lib
from focus_tpu.parallel import pipeline as pipe_lib

needs8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _plain_mf_cfg(pipe=1, model_axis=1, microbatches=0, depth=4):
    """Tiny plain Motionformer (no ORViT — pipe needs a homogeneous
    stack) with depth divisible by the stage count."""
    import __graft_entry__ as ge

    cfg = ge._flagship_cfg(tiny=True)
    cfg.ORVIT.ENABLE = False
    cfg.ORVIT.LAYERS = []
    cfg.MF.DEPTH = depth
    cfg.TPU.MESH.PIPE = pipe
    cfg.TPU.MESH.PIPE_MICROBATCHES = microbatches
    cfg.TPU.MESH.MODEL = model_axis
    return cfg


def _video(B=4, seed=0):
    rs = np.random.RandomState(seed)
    return rs.rand(B, 4, 32, 32, 3).astype(np.float32)


def test_pipeline_forward_matches_scanned():
    """Identical weights -> identical logits: the ring feed/rotate/collect
    schedule reproduces the sequential stack exactly."""
    video = _video(B=4)
    cfg_s = _plain_mf_cfg(pipe=1)
    model_s = build_model(cfg_s)
    variables = model_s.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        video, {},
    )
    out_s = model_s.apply(variables, video, {})

    cfg_p = _plain_mf_cfg(pipe=2, microbatches=2)
    model_p = build_model(cfg_p)
    params_p = pipe_lib.to_pipelined(variables["params"], stages=2)
    out_p = model_p.apply({"params": params_p}, video, {})
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_s), atol=1e-5
    )


def test_pipeline_forward_matches_scanned_more_microbatches():
    """M > stages (smaller bubble fraction) reproduces the same logits."""
    video = _video(B=4)
    cfg_s = _plain_mf_cfg(pipe=1)
    model_s = build_model(cfg_s)
    variables = model_s.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        video, {},
    )
    out_s = model_s.apply(variables, video, {})

    cfg_p = _plain_mf_cfg(pipe=2, microbatches=4)
    model_p = build_model(cfg_p)
    params_p = pipe_lib.to_pipelined(variables["params"], stages=2)
    out_p = model_p.apply({"params": params_p}, video, {})
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_s), atol=1e-5
    )


def test_pipeline_layout_roundtrip():
    video = _video(B=4)
    cfg = _plain_mf_cfg(pipe=1)
    model = build_model(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        video, {},
    )
    back = pipe_lib.from_pipelined(
        pipe_lib.to_pipelined(variables["params"], stages=2)
    )
    flat_a = jax.tree_util.tree_leaves_with_path(variables["params"])
    flat_b = {
        jax.tree_util.keystr(p): l
        for p, l in jax.tree_util.tree_leaves_with_path(back)
    }
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        other = flat_b[jax.tree_util.keystr(path)]
        assert leaf.shape == other.shape
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(other))


def _orvit_mf_cfg(pipe=1, model_axis=1, microbatches=0, depth=6):
    """Tiny ORViT-MF: ORViT at layer 1 -> traj segments [0] and [2..5];
    the 4-layer segment pipelines over 2 stages (segmented pipelining,
    round 5) while the ORViT block runs replicated between segments."""
    cfg = _plain_mf_cfg(
        pipe=pipe, model_axis=model_axis, microbatches=microbatches,
        depth=depth,
    )
    cfg.ORVIT.ENABLE = True
    cfg.ORVIT.LAYERS = [1]
    return cfg


def _boxes(B):
    rs = np.random.RandomState(3)
    return (rs.rand(B, 2, 4, 4) * 0.5 + 0.25).astype(np.float32)


def test_pipeline_orvit_segment_matches_scanned():
    """Segmented pipelining with an ORViT interleave: identical weights
    -> identical logits vs the non-pp stack (the flagship's pp path,
    round-4 verdict #5)."""
    video = _video(B=4)
    meta = {"orvit_bboxes": _boxes(4)}
    cfg_s = _orvit_mf_cfg(pipe=1)
    model_s = build_model(cfg_s)
    variables = model_s.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        video, meta,
    )
    out_s = model_s.apply(variables, video, meta)

    cfg_p = _orvit_mf_cfg(pipe=2, microbatches=2)
    model_p = build_model(cfg_p)
    params_p = pipe_lib.to_pipelined(variables["params"], stages=2)
    out_p = model_p.apply({"params": params_p}, video, meta)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_s), atol=1e-5
    )


def test_pipeline_short_segments_fall_back():
    """Segments shorter than the stage count (and ORViT blocks) run
    unpipelined — the build must not error and params must hold exactly
    one pipelined stack for the 4-layer segment."""
    cfg = _orvit_mf_cfg(pipe=2)
    model = build_model(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        _video(B=2), {"orvit_bboxes": _boxes(2)},
    )
    params = variables["params"]["encoder"] if "encoder" in variables[
        "params"] else variables["params"]
    names = set(params)
    assert "blocks_2_5" in names  # the pipelined segment
    assert pipe_lib.pipelined_stages(variables["params"]) == 2


def _scanned_init_params(video):
    """One fixed-seed init of the scanned layout, shared by every run so
    dp / pp / pp+tp all step from identical weights."""
    cfg = _plain_mf_cfg(pipe=1)
    model = build_model(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(7), "dropout": jax.random.PRNGKey(8)},
        video[:1], {},
    )
    return variables["params"]


def _with_params(state, params, mesh):
    state = state.replace(params=params)
    return jax.device_put(state, mesh_lib.state_shardings(mesh, state))


def _one_step(pipe, model_axis, B=8):
    cfg = _plain_mf_cfg(pipe=pipe, model_axis=model_axis)
    mesh = mesh_lib.build_mesh(cfg, devices=jax.devices()[:8])
    model = build_model(cfg)
    video = _video(B)
    labels = (np.arange(B) % cfg.MODEL.NUM_CLASSES).astype(np.int32)
    batch = (video, labels, np.arange(B, dtype=np.int32), {})
    state = build_supervised_state(cfg, model, mesh, batch, 10)
    params = _scanned_init_params(video)
    if pipe > 1:
        params = pipe_lib.to_pipelined(params, stages=pipe)
    state = _with_params(state, params, mesh)
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
def test_pipeline_param_placement():
    """Pipelined stack leaves are sharded over 'pipe' on the stage axis;
    everything else stays replicated over pipe."""
    cfg = _plain_mf_cfg(pipe=2)
    mesh = mesh_lib.build_mesh(cfg, devices=jax.devices()[:8])
    assert dict(mesh.shape)["pipe"] == 2 and mesh_lib.has_pipe_axis(mesh)
    model = build_model(cfg)
    video = _video(B=8)
    labels = np.zeros(8, np.int32)
    state = build_supervised_state(
        cfg, model, mesh, (video, labels, None, {}), 10
    )
    shard_tree = mesh_lib.state_shardings(mesh, state)
    found = []
    for path, sh in jax.tree_util.tree_leaves_with_path(shard_tree):
        name = jax.tree_util.keystr(path)
        if "pipe_stages" in name and name.endswith("kernel']"):
            found.append(tuple(sh.spec))
    assert found and all(spec and spec[0] == "pipe" for spec in found), found


@needs8
def test_checkpoint_cross_layout(tmp_path):
    """A checkpoint saved under the scanned layout restores into a
    pipelined model (and back) via the layout converter in
    utils/checkpoint.load_checkpoint."""
    from focus_tpu.utils import checkpoint as ckpt

    video, labels = _video(B=4), np.zeros(4, np.int32)

    cfg_s = _plain_mf_cfg(pipe=1)
    mesh_s = mesh_lib.build_mesh(cfg_s, devices=jax.devices()[:1])
    state_s = build_supervised_state(
        cfg_s, build_model(cfg_s), mesh_s, (video, labels, None, {}), 10
    )
    path = ckpt.save_checkpoint(str(tmp_path), state_s, 0, cfg_s)

    cfg_p = _plain_mf_cfg(pipe=2)
    mesh_p = mesh_lib.build_mesh(cfg_p, devices=jax.devices()[:2])
    state_p = build_supervised_state(
        cfg_p, build_model(cfg_p), mesh_p, (video, labels, None, {}), 10
    )
    restored, epoch = ckpt.load_checkpoint(path, state_p)
    assert epoch == 0
    want = pipe_lib.to_pipelined(jax.device_get(state_s.params), stages=2)
    got = jax.device_get(restored.params)
    for (pa, la), (pb, lb) in zip(
        jax.tree_util.tree_leaves_with_path(want),
        jax.tree_util.tree_leaves_with_path(got),
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))

    # and back: pipelined checkpoint -> scanned template
    path_p = ckpt.save_checkpoint(str(tmp_path), restored, 1, cfg_p,
                                  name="pp_ckpt")
    restored_s, _ = ckpt.load_checkpoint(path_p, state_s)
    for (pa, la), (pb, lb) in zip(
        jax.tree_util.tree_leaves_with_path(jax.device_get(state_s.params)),
        jax.tree_util.tree_leaves_with_path(
            jax.device_get(restored_s.params)
        ),
    ):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


@needs8
def test_pp_train_matches_dp_loss():
    """dp=4 x pipe=2: the pipelined step computes the same loss."""
    _, loss_dp = _one_step(1, 1)
    _, loss_pp = _one_step(2, 1)
    np.testing.assert_allclose(loss_pp, loss_dp, rtol=2e-3)


@needs8
def test_pp_train_with_remat():
    """Rematerialised stage bodies (cfg.TPU.REMAT) compose with the
    circular pipeline: the train step compiles and the loss matches."""
    _, loss_dp = _one_step(1, 1)
    cfg = _plain_mf_cfg(pipe=2)
    cfg.TPU.REMAT = True
    mesh = mesh_lib.build_mesh(cfg, devices=jax.devices()[:8])
    model = build_model(cfg)
    video = _video(8)
    labels = (np.arange(8) % cfg.MODEL.NUM_CLASSES).astype(np.int32)
    state = build_supervised_state(
        cfg, model, mesh, (video, labels, np.arange(8, dtype=np.int32), {}),
        10
    )
    params = pipe_lib.to_pipelined(_scanned_init_params(video), stages=2)
    state = _with_params(state, params, mesh)
    step = make_supervised_train_step(
        model, cfg, mesh, losses_lib.get_loss_func(cfg),
        state_sharding=mesh_lib.state_shardings(mesh, state),
    )
    sharded = mesh_lib.shard_batch(mesh, (video, labels, {}))
    _, stats = step(
        state, sharded[0], sharded[1], sharded[2], jax.random.PRNGKey(0)
    )
    np.testing.assert_allclose(
        float(jax.device_get(stats["loss"])), loss_dp, rtol=2e-3
    )


@needs8
def test_pp_tp_matches_dp_loss():
    """Full dp=2 x pipe=2 x tp=2 mesh."""
    _, loss_dp = _one_step(1, 1)
    _, loss_pptp = _one_step(2, 2)
    np.testing.assert_allclose(loss_pptp, loss_dp, rtol=2e-3)


@needs8
def test_tpu_example_yamls_build_their_meshes():
    """The shipped configs/TPU examples produce the documented meshes."""
    import os

    from focus_tpu.config import assert_and_infer_cfg, get_cfg

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "configs", "TPU",
    )
    for fname, want in [
        ("SSv2_ORViT-MF_224_16x4_dp_sp_tp.yaml",
         {"data": 2, "pipe": 1, "seq": 2, "model": 2, "expert": 1}),
        ("SSv2_MF_224_16x4_pp_moe.yaml",
         {"data": 2, "pipe": 2, "seq": 1, "model": 1, "expert": 2}),
    ]:
        cfg = get_cfg()
        cfg.merge_from_file(os.path.join(root, fname))
        assert_and_infer_cfg(cfg)
        mesh = mesh_lib.build_mesh(cfg, devices=jax.devices()[:8])
        assert dict(mesh.shape) == want, (fname, dict(mesh.shape))


@needs8
def test_pp_eval_matches_dp():
    def run_eval(pipe):
        cfg = _plain_mf_cfg(pipe=pipe)
        mesh = mesh_lib.build_mesh(cfg, devices=jax.devices()[:8])
        model = build_model(cfg)
        video = _video(B=8)
        labels = np.zeros(8, np.int32)
        state = build_supervised_state(
            cfg, model, mesh, (video, labels, None, {}), 10
        )
        params = _scanned_init_params(video)
        if pipe > 1:
            params = pipe_lib.to_pipelined(params, stages=pipe)
        state = _with_params(state, params, mesh)
        step = make_supervised_eval_step(model, cfg, mesh)
        sharded = mesh_lib.shard_batch(mesh, (video, {}))
        return np.asarray(jax.device_get(step(state, *sharded)))

    out_dp = run_eval(1)
    out_pp = run_eval(2)
    np.testing.assert_allclose(out_pp, out_dp, atol=2e-5)
