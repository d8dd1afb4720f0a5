"""Config-system tests: key surface, merge semantics, CLI overrides."""

import os

import pytest

from focus_tpu.config import assert_and_infer_cfg, get_cfg
from focus_tpu.config.node import CfgNode

REF_CONFIG_DIR = "/root/reference/configs"
REPO_CONFIG_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "configs"
)


def test_defaults_key_surface():
    cfg = get_cfg()
    # spot-check the keys every layer depends on
    assert cfg.TRAIN.BATCH_SIZE == 64
    assert cfg.MODEL.MODEL_NAME == "SlowFast"
    assert cfg.MF.EMBED_DIM == 768
    assert cfg.SLOTS.NUM_SLOTS == 7
    assert cfg.ORVIT.O == 5
    assert cfg.SOLVER.LR_POLICY == "cosine"
    assert cfg.MULTIGRID.LONG_CYCLE_FACTORS[0] == (0.25, 0.5 ** 0.5)
    assert cfg.TENSORBOARD.MODEL_VIS.GRAD_CAM.COLORMAP == "viridis"


def test_clone_is_independent():
    a = get_cfg()
    b = a.clone()
    b.TRAIN.BATCH_SIZE = 128
    assert a.TRAIN.BATCH_SIZE == 64


def test_merge_from_list_types():
    cfg = get_cfg()
    cfg.merge_from_list(["TRAIN.BATCH_SIZE", "32", "SOLVER.BASE_LR", "0.005"])
    assert cfg.TRAIN.BATCH_SIZE == 32
    assert cfg.SOLVER.BASE_LR == 0.005
    cfg.merge_from_list(["MODEL.MODEL_NAME", "Motionformer"])
    assert cfg.MODEL.MODEL_NAME == "Motionformer"
    with pytest.raises(KeyError):
        cfg.merge_from_list(["NOT.A.KEY", "1"])


def test_merge_from_yaml(tmp_path):
    p = tmp_path / "t.yaml"
    p.write_text(
        "TRAIN:\n  BATCH_SIZE: 16\n  DATASET: movi_e\nSOLVER:\n  BASE_LR: 5e-5\n"
    )
    cfg = get_cfg()
    cfg.merge_from_file(str(p))
    assert cfg.TRAIN.BATCH_SIZE == 16
    assert cfg.TRAIN.DATASET == "movi_e"
    assert cfg.SOLVER.BASE_LR == 5e-5


def test_freeze_blocks_mutation():
    cfg = get_cfg()
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.TRAIN.BATCH_SIZE = 1
    cfg.defrost()
    cfg.TRAIN.BATCH_SIZE = 1


def test_dump_roundtrip():
    cfg = get_cfg()
    dumped = cfg.dump()
    import yaml

    loaded = yaml.safe_load(dumped)
    assert loaded["TRAIN"]["BATCH_SIZE"] == 64


@pytest.mark.skipif(
    not os.path.isdir(REF_CONFIG_DIR), reason="reference configs not mounted"
)
def test_all_reference_yamls_load():
    """Every YAML shipped with the reference must merge cleanly (north-star:
    existing configs run unchanged)."""
    # These two ship broken in the reference: steve_default_v1.yaml sets
    # SLOTS.DROPOUT (absent from the reference defaults too) and
    # steve_default.yaml is a foreign-format experiment file — both would
    # fail under the reference's own fvcore CfgNode as well.
    broken_upstream = {"steve_default_v1.yaml", "steve_default.yaml"}
    failures = []
    for root, _, files in os.walk(REF_CONFIG_DIR):
        for f in files:
            if not f.endswith(".yaml") or f in broken_upstream:
                continue
            path = os.path.join(root, f)
            cfg = get_cfg()
            try:
                cfg.merge_from_file(path)
                assert_and_infer_cfg(cfg)
            except Exception as e:  # noqa: BLE001
                failures.append((path, repr(e)))
    assert not failures, failures


def test_all_shipped_yamls_load():
    """Every YAML shipped in this repo's config zoo must merge + validate."""
    broken_upstream = {"steve_default_v1.yaml", "steve_default.yaml"}
    failures = []
    for root, _, files in os.walk(REPO_CONFIG_DIR):
        for f in files:
            if not f.endswith(".yaml") or f in broken_upstream:
                continue
            path = os.path.join(root, f)
            cfg = get_cfg()
            try:
                cfg.merge_from_file(path)
                assert_and_infer_cfg(cfg)
            except Exception as e:  # noqa: BLE001
                failures.append((path, repr(e)))
    assert not failures, failures


def test_new_allowed_nested():
    cfg = CfgNode({"A": {"B": 1}}, new_allowed=True)
    cfg.merge_from_list(["NEW_KEY", "5"])
    assert cfg.NEW_KEY == 5
