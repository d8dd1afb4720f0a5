"""Async checkpoint writes (cfg.TPU.ASYNC_CHECKPOINT /
save_checkpoint(async_write=True)): serialization + disk IO overlap
training on a background thread; reads wait for pending writes, and
chained writers keep same-path saves ordered."""

import numpy as np

from focus_tpu.config import get_cfg
from focus_tpu.utils import checkpoint as cu


def _state(val):
    return {"w": np.full(1000, val, np.float32)}


def test_async_checkpoint_roundtrip(tmp_path):
    cfg = get_cfg()
    path = cu.save_checkpoint(
        str(tmp_path), _state(3.0), 3, cfg, async_write=True
    )
    cu.wait_for_saves()
    got, epoch = cu.load_checkpoint(path, _state(0.0))
    assert epoch == 3
    np.testing.assert_array_equal(got["w"], _state(3.0)["w"])


def test_load_implicitly_waits_for_async_write(tmp_path):
    cfg = get_cfg()
    path = cu.save_checkpoint(
        str(tmp_path), _state(7.0), 1, cfg, async_write=True
    )
    # no explicit wait: load_checkpoint orders itself behind the write
    got, epoch = cu.load_checkpoint(path, _state(0.0))
    assert epoch == 1
    np.testing.assert_array_equal(got["w"], _state(7.0)["w"])


def test_async_same_path_saves_stay_ordered(tmp_path):
    cfg = get_cfg()
    for i in range(5):
        path = cu.save_checkpoint(
            str(tmp_path), _state(float(i)), i, cfg,
            name="checkpoint", async_write=True,
        )
    got, epoch = cu.load_checkpoint(path, _state(0.0))
    assert epoch == 4
    np.testing.assert_array_equal(got["w"], _state(4.0)["w"])


def test_test_epoch_num_selects_checkpoint(tmp_path):
    """TEST.TEST_EPOCH_NUM tests a SPECIFIC epoch's checkpoint instead
    of the last one (reference checkpoint.py:503-506)."""
    import pytest

    cfg = get_cfg()
    cfg.OUTPUT_DIR = str(tmp_path)
    cu.save_checkpoint(str(tmp_path), _state(1.0), 1, cfg)
    cu.save_checkpoint(str(tmp_path), _state(2.0), 2, cfg)
    cfg.TEST.TEST_EPOCH_NUM = 1
    got = cu.load_test_checkpoint(cfg, _state(0.0))
    np.testing.assert_array_equal(got["w"], _state(1.0)["w"])
    cfg.TEST.TEST_EPOCH_NUM = 0  # default: last checkpoint
    got = cu.load_test_checkpoint(cfg, _state(0.0))
    np.testing.assert_array_equal(got["w"], _state(2.0)["w"])
    cfg.TEST.TEST_EPOCH_NUM = 9
    with pytest.raises(FileNotFoundError):
        cu.load_test_checkpoint(cfg, _state(0.0))


def test_config_gate_defaults_off(tmp_path):
    cfg = get_cfg()
    assert cfg.TPU.ASYNC_CHECKPOINT is False
    # default path stays synchronous: file exists immediately
    import os

    path = cu.save_checkpoint(str(tmp_path), _state(1.0), 1, cfg)
    assert os.path.exists(path)
    assert not cu._PENDING_SAVES
