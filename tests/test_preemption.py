"""Preemption-aware checkpointing (utils/preemption.py): SIGTERM →
flag → sync-point save of the in-progress epoch → clean exit 0 →
AUTO_RESUME replays the epoch. TPU extension beyond the reference's
epoch-boundary AUTO_RESUME (/root/reference/tools/train_net.py:590-607)."""

import os
import signal

import pytest

from focus_tpu.config import get_cfg
from focus_tpu.utils import preemption


@pytest.fixture(autouse=True)
def _clean_flag():
    preemption.clear_preemption()
    yield
    preemption.clear_preemption()


def test_sigterm_sets_flag():
    assert preemption.install_signal_handlers()
    assert not preemption.preemption_requested()
    os.kill(os.getpid(), signal.SIGTERM)
    assert preemption.preemption_requested()


def test_guard_polls_only_on_period():
    cfg = get_cfg()
    cfg.TPU.PREEMPT_SYNC_PERIOD = 5
    guard = preemption.PreemptionGuard(cfg)
    preemption.request_preemption()
    # iters 0..3 are off-period (cheap no-ops); iter 4 is the sync point
    assert [guard.poll(i) for i in range(5)] == [
        False, False, False, False, True
    ]


def test_guard_disabled_ignores_flag():
    cfg = get_cfg()
    cfg.TPU.PREEMPTION_SAVE = False
    guard = preemption.PreemptionGuard(cfg)
    preemption.request_preemption()
    assert not any(guard.poll(i) for i in range(20))


def _tiny_cfg(tmp_path):
    cfg = get_cfg()
    cfg.MODEL.MODEL_NAME = "ResNet"
    cfg.MODEL.ARCH = "slow"
    cfg.MODEL.NUM_CLASSES = 6
    cfg.TRAIN.DATASET = "synthetic_classification"
    cfg.TEST.DATASET = "synthetic_classification"
    cfg.TRAIN.BATCH_SIZE = 4
    cfg.TEST.BATCH_SIZE = 4
    cfg.DATA.NUM_FRAMES = 4
    cfg.DATA.TRAIN_CROP_SIZE = 64
    cfg.DATA.TEST_CROP_SIZE = 64
    cfg.DATA.SAMPLING_RATE = 2
    cfg.SOLVER.MAX_EPOCH = 50  # never reached when preempted
    cfg.SOLVER.BASE_LR = 0.01
    cfg.SOLVER.WARMUP_EPOCHS = 0
    cfg.TRAIN.EVAL_PERIOD = 100
    cfg.TRAIN.CHECKPOINT_PERIOD = 100
    cfg.TRAIN.AUTO_RESUME = True
    cfg.BN.USE_PRECISE_STATS = False
    cfg.LOG_PERIOD = 2
    cfg.NUM_GPUS = 1
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.TPU.COMPUTE_DTYPE = "float32"
    cfg.TPU.PREEMPT_SYNC_PERIOD = 3
    return cfg


def test_train_preempt_saves_and_resumes(tmp_path):
    """A pre-set preemption flag (deterministic stand-in for a SIGTERM
    landing mid-epoch) makes train() save the in-progress epoch and
    SystemExit(0); a second train() call AUTO_RESUMEs, replays the
    epoch, and runs to completion."""
    from focus_tpu.engine import trainer
    from focus_tpu.utils import checkpoint as cu

    cfg = _tiny_cfg(tmp_path)
    preemption.request_preemption()
    with pytest.raises(SystemExit) as e:
        trainer.train(cfg)
    assert e.value.code == 0
    # saved for the in-progress epoch 0 (completed-epoch count 0)
    last = cu.get_last_checkpoint(str(tmp_path))
    assert last is not None and "00000" in os.path.basename(last)

    # requeue: resume replays epoch 0 and completes the (shortened) run
    preemption.clear_preemption()
    cfg.SOLVER.MAX_EPOCH = 1
    state = trainer.train(cfg)
    assert int(state.step) > 0


def test_slot_train_preempt_saves_and_exits(tmp_path):
    """Same contract on the slot-training loop."""
    from focus_tpu.engine import slot_trainer
    from focus_tpu.utils import checkpoint as cu

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = get_cfg()
    cfg.merge_from_file(
        os.path.join(repo, "configs", "tests", "steve_synthetic.yaml")
    )
    cfg.OUTPUT_DIR = str(tmp_path)
    cfg.EXP.PATH = str(tmp_path)
    cfg.SOLVER.MAX_EPOCH = 50
    cfg.TPU.PREEMPT_SYNC_PERIOD = 2
    cfg.TENSORBOARD.ENABLE = False
    preemption.request_preemption()
    with pytest.raises(SystemExit) as e:
        slot_trainer.slot_train(cfg)
    assert e.value.code == 0
    assert cu.get_last_checkpoint(str(tmp_path)) is not None
