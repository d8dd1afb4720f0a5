"""Fixed-seed short-training equivalence vs the EXECUTED reference
trainer semantics (round-2 verdict #7): identical init (through the
torch importer), identical data, N optimizer steps — the loss
trajectories must agree within fp tolerance. This exercises the
optimizer grouping (zero-wd-1d, orvit groups), the LR-of-step schedule
vs the reference's per-iteration set_lr, and the loss composition —
the strongest trainability-parity proxy available without datasets."""

import importlib.util
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from focus_tpu.config import get_cfg  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STEPS = 6
DATA_SIZE = 4  # iters per "epoch" for the LR schedule


def _load_reference():
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference tree unavailable")
    spec = importlib.util.spec_from_file_location(
        "make_golden_fixtures",
        os.path.join(REPO, "scripts", "make_golden_fixtures.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod._install_stubs()


def _train_cfg(orvit_layers=()):
    from tests.test_full_model_golden import mf_full_cfg

    cfg = mf_full_cfg(orvit_layers=orvit_layers)
    cfg.MODEL.LOSS_FUNC = "cross_entropy"
    cfg.NUM_GPUS = 1
    cfg.SOLVER.OPTIMIZING_METHOD = "sgd"
    cfg.SOLVER.BASE_LR = 0.05
    cfg.SOLVER.LR_POLICY = "cosine"
    cfg.SOLVER.MAX_EPOCH = 2
    cfg.SOLVER.MOMENTUM = 0.9
    cfg.SOLVER.WEIGHT_DECAY = 1e-3
    cfg.SOLVER.ZERO_WD_1D_PARAM = True
    cfg.SOLVER.WARMUP_EPOCHS = 0.5
    cfg.SOLVER.WARMUP_START_LR = 0.005
    cfg.SOLVER.COSINE_AFTER_WARMUP = False
    return cfg


def _make_batches(cfg, with_boxes):
    rs = np.random.RandomState(42)
    vids, labels, boxes = [], [], []
    for _ in range(STEPS):
        vids.append(rs.rand(2, 4, 224, 224, 3).astype(np.float32))
        labels.append(rs.randint(0, cfg.MODEL.NUM_CLASSES, size=(2,)))
        boxes.append((rs.rand(2, 2, 3, 4) * 0.4 + 0.2).astype(np.float32))
    return vids, labels, boxes


def _torch_losses(cfg, vids, labels, boxes, with_boxes):
    from slowfast.models import optimizer as ref_optim
    from slowfast.models.video_model_builder import Motionformer

    torch.manual_seed(3)
    tmodel = Motionformer(cfg)
    with torch.no_grad():
        for p in tmodel.parameters():
            if p.is_floating_point():
                p.copy_(torch.randn_like(p) * 0.05)
    # .numpy() returns a VIEW of live torch storage — copy, or the
    # in-place optimizer updates below would leak into the snapshot
    sd = {
        k: v.detach().numpy().copy() for k, v in tmodel.state_dict().items()
    }
    tmodel.train()

    optimizer = ref_optim.construct_optimizer(tmodel, cfg)
    ce = torch.nn.CrossEntropyLoss()
    losses = []
    for step in range(STEPS):
        epoch_f = step / DATA_SIZE
        ref_optim.set_lr(optimizer, ref_optim.get_epoch_lr(epoch_f, cfg))
        optimizer.zero_grad()
        meta = (
            {"orvit_bboxes": torch.from_numpy(boxes[step])}
            if with_boxes else {}
        )
        x = torch.from_numpy(vids[step].transpose(0, 4, 1, 2, 3))
        logits = tmodel([x], meta)
        loss = ce(logits, torch.from_numpy(labels[step]))
        loss.backward()
        # reference train_net.py:110-116 clips before the step
        if cfg.SOLVER.CLIP_GRAD_VAL:
            torch.nn.utils.clip_grad_value_(
                tmodel.parameters(), cfg.SOLVER.CLIP_GRAD_VAL
            )
        elif cfg.SOLVER.CLIP_GRAD_L2NORM:
            torch.nn.utils.clip_grad_norm_(
                tmodel.parameters(), cfg.SOLVER.CLIP_GRAD_L2NORM
            )
        optimizer.step()
        losses.append(float(loss))
    return sd, losses


@pytest.mark.parametrize("orvit_layers", [(), (1,)])
def test_short_training_equivalence(orvit_layers):
    _load_reference()
    cfg = _train_cfg(orvit_layers)
    with_boxes = bool(orvit_layers)
    vids, labels, boxes = _make_batches(cfg, with_boxes)
    sd, ref_losses = _torch_losses(cfg, vids, labels, boxes, with_boxes)

    from focus_tpu.engine.trainer import make_supervised_train_step
    from focus_tpu.models import losses as losses_lib
    from focus_tpu.models import optimizer as optim
    from focus_tpu.models.build import build_model, init_model
    from focus_tpu.parallel import mesh as mesh_lib
    from focus_tpu.parallel.train_state import TrainState
    from focus_tpu.utils.torch_import import import_torch_params

    mesh = mesh_lib.build_mesh(cfg)
    model = build_model(cfg)
    meta0 = (
        {"orvit_bboxes": jnp.asarray(boxes[0])} if with_boxes else {}
    )
    variables = init_model(model, cfg, (jnp.asarray(vids[0]), meta0))
    params, report = import_torch_params(
        sd, variables["params"], allow_missing=False
    )
    assert not report["missing"], report["missing"]

    no_wd = ("pos_embed", "cls_token", "temp_embed", "st_embed")
    tx = optim.construct_optimizer(
        params, cfg, DATA_SIZE, no_weight_decay_paths=no_wd
    )
    state = TrainState.create(params, tx)
    train_step = make_supervised_train_step(
        model, cfg, mesh, losses_lib.get_loss_func(cfg)
    )
    rng = jax.random.PRNGKey(0)
    ours = []
    for step in range(STEPS):
        meta = (
            {"orvit_bboxes": jnp.asarray(boxes[step])} if with_boxes else {}
        )
        state, stats = train_step(
            state, jnp.asarray(vids[step]), jnp.asarray(labels[step]),
            meta, rng,
        )
        ours.append(float(stats["loss"]))

    np.testing.assert_allclose(ours, ref_losses, rtol=2e-4, atol=2e-4)


def _slowfast_train_cfg():
    from tests.test_conv_full_golden import slowfast_cfg

    cfg = slowfast_cfg()
    cfg.MODEL.LOSS_FUNC = "cross_entropy"
    cfg.MODEL.DROPOUT_RATE = 0.0
    cfg.NUM_GPUS = 1
    cfg.SOLVER.OPTIMIZING_METHOD = "sgd"
    cfg.SOLVER.BASE_LR = 0.05
    cfg.SOLVER.LR_POLICY = "cosine"
    cfg.SOLVER.MAX_EPOCH = 2
    cfg.SOLVER.MOMENTUM = 0.9
    cfg.SOLVER.WEIGHT_DECAY = 1e-3
    cfg.SOLVER.ZERO_WD_1D_PARAM = True  # BN scale/bias land here
    cfg.SOLVER.WARMUP_EPOCHS = 0.5
    cfg.SOLVER.WARMUP_START_LR = 0.005
    cfg.SOLVER.COSINE_AFTER_WARMUP = False
    return cfg


def test_slowfast_bn_short_training_equivalence():
    """Conv/BN-family trainability parity vs the executed reference:
    identical init, identical data, 6 SGD steps of the skinny SlowFast
    (fusion + nonlocal) — loss trajectories AND the BN running-stat EMAs
    must agree. Pins train-mode BN semantics (batch-stat normalisation,
    0.1-momentum EMA updates through the train step), SGD
    momentum/weight-decay on convs, and the zero-wd-1d grouping that BN
    parameters fall into (the reference is_bn quirk)."""
    _load_reference()
    cfg = _slowfast_train_cfg()
    alpha = cfg.SLOWFAST.ALPHA

    rs = np.random.RandomState(7)
    vids, labels = [], []
    for _ in range(STEPS):
        vids.append(rs.rand(2, 8, 64, 64, 3).astype(np.float32))
        labels.append(rs.randint(0, cfg.MODEL.NUM_CLASSES, size=(2,)))

    # ---- reference trajectory
    from slowfast.models import optimizer as ref_optim
    from slowfast.models.video_model_builder import SlowFast

    torch.manual_seed(11)
    tmodel = SlowFast(cfg)
    with torch.no_grad():
        for p in tmodel.parameters():
            if p.is_floating_point():
                p.copy_(torch.randn_like(p) * 0.05)
    sd = {
        k: v.detach().numpy().copy() for k, v in tmodel.state_dict().items()
    }
    tmodel.train()
    optimizer = ref_optim.construct_optimizer(tmodel, cfg)
    ce = torch.nn.CrossEntropyLoss()
    ref_losses = []
    for step in range(STEPS):
        ref_optim.set_lr(
            optimizer, ref_optim.get_epoch_lr(step / DATA_SIZE, cfg)
        )
        optimizer.zero_grad()
        x = torch.from_numpy(vids[step].transpose(0, 4, 1, 2, 3))
        logits = tmodel([x[:, :, ::alpha], x])
        loss = ce(logits, torch.from_numpy(labels[step]))
        loss.backward()
        # reference train_net.py:110-116 clips before the step (the
        # default SOLVER.CLIP_GRAD_L2NORM=0.05 is ACTIVE for conv nets)
        if cfg.SOLVER.CLIP_GRAD_VAL:
            torch.nn.utils.clip_grad_value_(
                tmodel.parameters(), cfg.SOLVER.CLIP_GRAD_VAL
            )
        elif cfg.SOLVER.CLIP_GRAD_L2NORM:
            torch.nn.utils.clip_grad_norm_(
                tmodel.parameters(), cfg.SOLVER.CLIP_GRAD_L2NORM
            )
        optimizer.step()
        ref_losses.append(float(loss.detach()))
        if step == 0:
            # snapshot after ONE step: EMA semantics before any weight
            # divergence can compound through the deep stages
            ref_stats = {
                k: v.detach().numpy().copy()
                for k, v in tmodel.state_dict().items()
                if k.endswith(("running_mean", "running_var"))
            }

    # ---- ours, through the production state builder + train step
    from focus_tpu.engine.trainer import (
        build_supervised_state,
        make_supervised_train_step,
    )
    from focus_tpu.models import losses as losses_lib
    from focus_tpu.models.build import build_model
    from focus_tpu.parallel import mesh as mesh_lib
    from focus_tpu.utils.torch_import import import_torch_params

    mesh = mesh_lib.build_mesh(cfg)
    model = build_model(cfg)
    pathways = lambda v: [jnp.asarray(v[:, ::alpha]), jnp.asarray(v)]
    state = build_supervised_state(
        cfg, model, mesh, (pathways(vids[0]), labels[0], None, {}),
        steps_per_epoch=DATA_SIZE,
    )
    params, report = import_torch_params(
        sd, state.params, allow_missing=False
    )
    assert not report["missing"], report["missing"]
    state = state.replace(params=params)
    train_step = make_supervised_train_step(
        model, cfg, mesh, losses_lib.get_loss_func(cfg)
    )
    rng = jax.random.PRNGKey(0)
    ours = []
    stats1 = None
    for step in range(STEPS):
        state, stats = train_step(
            state, pathways(vids[step]), jnp.asarray(labels[step]), {}, rng
        )
        ours.append(float(stats["loss"]))
        if step == 0:
            # materialize: the next donated step invalidates the buffers
            stats1 = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    # conv/BN at batch 2 with the active global-norm clip amplifies fp
    # reassociation ~8x per step (the clip scale divides by a norm over
    # millions of f32 entries); early steps pin semantics tightly, the
    # tail only bounds the chaotic growth
    np.testing.assert_allclose(ours[:4], ref_losses[:4], rtol=6e-4)
    np.testing.assert_allclose(ours, ref_losses, rtol=1e-2)

    # BN running-stat EMAs agree leaf-for-leaf with torch's buffers
    # after one identical-weights step: pins the 0.1-momentum EMA and
    # the unbiased-variance update exactly, chaos-free
    from focus_tpu.utils.torch_import import flax_path_to_torch

    flat = jax.tree_util.tree_flatten_with_path(stats1)[0]
    checked = 0
    for path, leaf in flat:
        tup = tuple(
            str(getattr(k, "key", getattr(k, "idx", k))) for k in path
        )
        tname, _ = flax_path_to_torch(tup[:-1] + ("bias",))
        tname = tname[: -len(".bias")] + ".running_" + tup[-1]
        assert tname in ref_stats, tname
        np.testing.assert_allclose(
            np.asarray(leaf), ref_stats[tname], rtol=2e-4, atol=2e-6,
            err_msg=tname,
        )
        checked += 1
    assert checked > 50  # every BN in stems/stages/fusions/nonlocal


def test_slowfast_detection_short_training_equivalence():
    """AVA-style detection trainability parity: 6 SGD steps of the
    skinny SlowFast detection variant (RoI head, sigmoid, BCE) must
    reproduce the reference trajectory — with one box slot PADDED on our
    side (boxes_mask=0) while the reference sees only the real boxes, so
    the masked detection loss and its zero-gradient padding are pinned
    against the reference's variable-box-count protocol."""
    _load_reference()
    from tests.test_conv_full_golden import slowfast_cfg

    cfg = slowfast_cfg(detection=True)
    cfg.MODEL.LOSS_FUNC = "bce"
    cfg.MODEL.DROPOUT_RATE = 0.0
    cfg.NUM_GPUS = 1
    cfg.SOLVER.OPTIMIZING_METHOD = "sgd"
    cfg.SOLVER.BASE_LR = 0.05
    cfg.SOLVER.LR_POLICY = "cosine"
    cfg.SOLVER.MAX_EPOCH = 2
    cfg.SOLVER.MOMENTUM = 0.9
    cfg.SOLVER.WEIGHT_DECAY = 1e-3
    cfg.SOLVER.ZERO_WD_1D_PARAM = True
    cfg.SOLVER.WARMUP_EPOCHS = 0.5
    cfg.SOLVER.WARMUP_START_LR = 0.005
    cfg.SOLVER.COSINE_AFTER_WARMUP = False
    alpha = cfg.SLOWFAST.ALPHA
    C = cfg.MODEL.NUM_CLASSES
    B, O = 2, 3  # our padded layout; sample (1, 2) is the pad slot

    rs = np.random.RandomState(17)
    vids, labels, boxes = [], [], []
    mask = np.ones((B, O), np.float32)
    mask[1, 2] = 0.0
    for _ in range(STEPS):
        vids.append(rs.rand(B, 8, 64, 64, 3).astype(np.float32))
        labels.append((rs.rand(B, O, C) > 0.7).astype(np.float32))
        lo = rs.rand(B, O, 2).astype(np.float32) * 30.0
        hi = lo + 8.0 + rs.rand(B, O, 2).astype(np.float32) * 20.0
        boxes.append(np.concatenate(
            [lo[..., :1], lo[..., 1:], hi[..., :1], hi[..., 1:]], axis=-1
        ))

    # ---- reference trajectory on the REAL boxes only
    from slowfast.models import optimizer as ref_optim
    from slowfast.models.video_model_builder import SlowFast

    torch.manual_seed(23)
    tmodel = SlowFast(cfg)
    with torch.no_grad():
        for p in tmodel.parameters():
            if p.is_floating_point():
                p.copy_(torch.randn_like(p) * 0.05)
    sd = {
        k: v.detach().numpy().copy() for k, v in tmodel.state_dict().items()
    }
    tmodel.train()
    optimizer = ref_optim.construct_optimizer(tmodel, cfg)
    bce = torch.nn.BCELoss()
    real = mask.reshape(-1).astype(bool)
    ref_losses = []
    for step in range(STEPS):
        ref_optim.set_lr(
            optimizer, ref_optim.get_epoch_lr(step / DATA_SIZE, cfg)
        )
        optimizer.zero_grad()
        x = torch.from_numpy(vids[step].transpose(0, 4, 1, 2, 3))
        rois = torch.cat(
            [
                torch.cat(
                    [
                        torch.full((O, 1), float(b)),
                        torch.from_numpy(boxes[step][b]),
                    ],
                    dim=1,
                )
                for b in range(B)
            ],
            dim=0,
        )[real]
        preds = tmodel([x[:, :, ::alpha], x], bboxes=rois)
        loss = bce(
            preds, torch.from_numpy(labels[step].reshape(-1, C)[real])
        )
        loss.backward()
        if cfg.SOLVER.CLIP_GRAD_VAL:
            torch.nn.utils.clip_grad_value_(
                tmodel.parameters(), cfg.SOLVER.CLIP_GRAD_VAL
            )
        elif cfg.SOLVER.CLIP_GRAD_L2NORM:
            torch.nn.utils.clip_grad_norm_(
                tmodel.parameters(), cfg.SOLVER.CLIP_GRAD_L2NORM
            )
        optimizer.step()
        ref_losses.append(float(loss.detach()))

    # ---- ours on the PADDED layout through the production train step
    from focus_tpu.engine.trainer import (
        build_supervised_state,
        make_supervised_train_step,
    )
    from focus_tpu.models import losses as losses_lib
    from focus_tpu.models.build import build_model
    from focus_tpu.parallel import mesh as mesh_lib
    from focus_tpu.utils.torch_import import import_torch_params

    mesh = mesh_lib.build_mesh(cfg)
    model = build_model(cfg)
    pathways = lambda v: [jnp.asarray(v[:, ::alpha]), jnp.asarray(v)]
    meta = lambda step: {
        "boxes": jnp.asarray(boxes[step]),
        "boxes_mask": jnp.asarray(mask),
    }
    state = build_supervised_state(
        cfg, model, mesh,
        (pathways(vids[0]), labels[0], None, meta(0)),
        steps_per_epoch=DATA_SIZE,
    )
    params, report = import_torch_params(
        sd, state.params, allow_missing=False
    )
    assert not report["missing"], report["missing"]
    state = state.replace(params=params)
    train_step = make_supervised_train_step(
        model, cfg, mesh, losses_lib.get_loss_func(cfg)
    )
    rng = jax.random.PRNGKey(0)
    ours = []
    for step in range(STEPS):
        state, stats = train_step(
            state, pathways(vids[step]), jnp.asarray(labels[step]),
            meta(step), rng,
        )
        ours.append(float(stats["loss"]))
    np.testing.assert_allclose(ours[:4], ref_losses[:4], rtol=6e-4)
    np.testing.assert_allclose(ours, ref_losses, rtol=1e-2)
