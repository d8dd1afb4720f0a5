"""Multigrid: differential schedule test vs the EXECUTED reference
module, and the long-cycle epoch-loop wiring (round-2 verdict #3/#8)."""

import importlib.util
import os
import sys

import numpy as np
import pytest

from focus_tpu.config import get_cfg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_reference_multigrid():
    """Import /root/reference/slowfast/utils/multigrid.py with the same
    dependency stubs the golden-fixture generator uses."""
    if not os.path.isdir("/root/reference"):
        pytest.skip("reference tree unavailable")
    spec = importlib.util.spec_from_file_location(
        "make_golden_fixtures",
        os.path.join(REPO, "scripts", "make_golden_fixtures.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod._install_stubs()
    from slowfast.utils import multigrid as ref_mg  # noqa: E402

    return ref_mg


def _mg_cfg(short_cycle, steps, lrs, max_epoch, bs=16, t=8, s=224,
            epoch_factor=1.5):
    cfg = get_cfg()
    cfg.MULTIGRID.LONG_CYCLE = True
    cfg.MULTIGRID.SHORT_CYCLE = short_cycle
    cfg.MULTIGRID.EPOCH_FACTOR = epoch_factor
    cfg.TRAIN.BATCH_SIZE = bs
    cfg.DATA.NUM_FRAMES = t
    cfg.DATA.TRAIN_CROP_SIZE = s
    cfg.DATA.SAMPLING_RATE = 8
    cfg.SOLVER.LR_POLICY = "steps_with_relative_lrs"
    cfg.SOLVER.STEPS = list(steps)
    cfg.SOLVER.LRS = list(lrs)
    cfg.SOLVER.MAX_EPOCH = max_epoch
    cfg.NUM_GPUS = 8
    return cfg


# short_cycle is always True here: the reference's own
# get_long_cycle_schedule crashes with LONG_CYCLE and no SHORT_CYCLE
# (multigrid.py:196 indexes all_shapes[-1][2], which only exists with
# the 3-shape short-cycle list) — every shipped reference multigrid
# config enables both. Our implementation generalises to that case.
CASES = [
    # (short_cycle, steps, lrs, max_epoch, t, s)
    (True, [0, 94, 154, 196], [1, 0.1, 0.01, 0.001], 239, 8, 224),
    (True, [0, 20, 30], [1, 0.1, 0.01], 40, 16, 224),
    (True, [0, 41, 49], [1, 0.1, 0.01], 57, 64, 224),
    (True, [0, 10, 15, 20], [1, 0.5, 0.1, 0.01], 25, 32, 112),
]


@pytest.mark.parametrize("short,steps,lrs,max_epoch,t,s", CASES)
def test_long_cycle_schedule_matches_reference(short, steps, lrs, max_epoch,
                                               t, s):
    ref_mg = _load_reference_multigrid()
    from focus_tpu.utils.multigrid import MultigridSchedule

    ours_cfg = _mg_cfg(short, steps, lrs, max_epoch, t=t, s=s)
    ref_cfg = _mg_cfg(short, steps, lrs, max_epoch, t=t, s=s)

    ours = MultigridSchedule()
    ours_cfg = ours.init_multigrid(ours_cfg)
    ref = ref_mg.MultigridSchedule()
    ref_cfg = ref.init_multigrid(ref_cfg)

    # identical schedules: (lr index, [b, t, s], end epoch)
    assert len(ours.schedule) == len(ref.schedule)
    for a, b in zip(ours.schedule, ref.schedule):
        assert a[0] == b[0]
        assert list(a[1]) == list(b[1])
        assert a[2] == b[2]
    # identical SOLVER rewrites
    assert list(ours_cfg.SOLVER.STEPS) == list(ref_cfg.SOLVER.STEPS)
    np.testing.assert_allclose(ours_cfg.SOLVER.LRS, ref_cfg.SOLVER.LRS)
    assert ours_cfg.SOLVER.MAX_EPOCH == ref_cfg.SOLVER.MAX_EPOCH

    # identical per-epoch shape decisions + cfg mutations across the run
    for epoch in range(ours_cfg.SOLVER.MAX_EPOCH):
        ours_cfg, ch_a = ours.update_long_cycle(ours_cfg, epoch)
        ref_cfg, ch_b = ref.update_long_cycle(ref_cfg, epoch)
        assert ch_a == ch_b, epoch
        for key in ("DATA.NUM_FRAMES", "DATA.TRAIN_CROP_SIZE",
                    "TRAIN.BATCH_SIZE", "BN.NORM_TYPE", "BN.NUM_SPLITS",
                    "MULTIGRID.LONG_CYCLE_SAMPLING_RATE"):
            sec, name = key.split(".")
            assert getattr(getattr(ours_cfg, sec), name) == getattr(
                getattr(ref_cfg, sec), name
            ), (epoch, key)


def test_long_cycle_epoch_loop_wiring(tmp_path, monkeypatch):
    """A toy long-cycle run must actually CYCLE: the per-epoch batch
    shapes seen by the train step change per the schedule, and the LR
    follows the rewritten steps (round-2 verdict: the schedule was
    previously applied only at epoch 0)."""
    from focus_tpu.engine import trainer as trainer_mod

    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "slow"
    cfg.MODEL.NUM_CLASSES = 6
    cfg.TRAIN.DATASET = "synthetic_classification"
    cfg.TEST.DATASET = "synthetic_classification"
    cfg.TRAIN.BATCH_SIZE = 8
    cfg.TEST.BATCH_SIZE = 8
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 64
    cfg.DATA.TEST_CROP_SIZE = 64
    cfg.DATA.SAMPLING_RATE = 2
    cfg.SOLVER.LR_POLICY = "steps_with_relative_lrs"
    cfg.SOLVER.STEPS = [0, 2, 4]
    cfg.SOLVER.LRS = [1, 0.1, 0.01]
    cfg.SOLVER.MAX_EPOCH = 6
    cfg.SOLVER.BASE_LR = 0.1
    cfg.SOLVER.WARMUP_EPOCHS = 0
    cfg.MULTIGRID.LONG_CYCLE = True
    cfg.MULTIGRID.EPOCH_FACTOR = 1.0
    cfg.MULTIGRID.LONG_CYCLE_FACTORS = [[0.5, 0.5], [1.0, 1.0]]
    cfg.MULTIGRID.BN_BASE_SIZE = 1
    cfg.TRAIN.EVAL_PERIOD = 1  # eval every epoch: exercises the val
    # loader/meter rebuild across long-cycle shape changes
    cfg.TRAIN.CHECKPOINT_PERIOD = 100
    cfg.TRAIN.AUTO_RESUME = False
    cfg.BN.USE_PRECISE_STATS = False
    cfg.LOG_PERIOD = 1
    cfg.NUM_GPUS = 8
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.TPU.COMPUTE_DTYPE = "float32"

    seen = []  # (epoch, B, T, S) per epoch as the train step sees them
    real_train_epoch = trainer_mod.train_epoch

    def spy_train_epoch(train_loader, state, train_step, train_meter,
                       cur_epoch, cfg_, base_rng, **kw):
        batch = next(iter(train_loader))
        video = batch[0][0] if isinstance(batch[0], (tuple, list)) else batch[0]
        seen.append(
            (cur_epoch, video.shape[0], video.shape[1], video.shape[2])
        )
        return real_train_epoch(
            train_loader, state, train_step, train_meter, cur_epoch, cfg_,
            base_rng, **kw,
        )

    val_seen = []  # (epoch, loader_len, meter_max_iter, val batch B)
    real_eval_epoch = trainer_mod.eval_epoch

    def spy_eval_epoch(val_loader, state, eval_step, val_meter, cur_epoch,
                       cfg_, writer=None):
        batch = next(iter(val_loader))
        video = batch[0][0] if isinstance(batch[0], (tuple, list)) else batch[0]
        val_seen.append(
            (cur_epoch, len(val_loader), val_meter.max_iter, video.shape[0])
        )
        return real_eval_epoch(val_loader, state, eval_step, val_meter,
                               cur_epoch, cfg_, writer=writer)

    monkeypatch.setattr(trainer_mod, "train_epoch", spy_train_epoch)
    monkeypatch.setattr(trainer_mod, "eval_epoch", spy_eval_epoch)
    trainer_mod.train(cfg)

    # the val meter is rebuilt with the val loader on every long-cycle
    # change (reference train_net.py:653-675 rebuilds the whole trainer):
    # its sizing must always match the loader it runs over
    assert val_seen and all(ln == mi for _, ln, mi, _ in val_seen), val_seen

    shapes = {(b, t, s) for _, b, t, s in seen}
    assert len(shapes) >= 2, f"shapes never cycled: {seen}"
    # the small-shape cycles must use a LARGER batch than the full shape
    full = [x for x in seen if (x[2], x[3]) == (4, 64)]
    small = [x for x in seen if (x[2], x[3]) != (4, 64)]
    assert full and small
    assert all(x[1] > full[0][1] for x in small)
    # and the last epoch runs at the full (default) shape
    assert (seen[-1][2], seen[-1][3]) == (4, 64)
