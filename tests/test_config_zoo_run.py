"""Run real reference YAMLs end-to-end through tools/run_net.py.

The config zoo (configs/) is the framework's public surface; these tests
execute the flagship YAMLs — not just merge them — on synthetic on-disk
data, with only path / size overrides (reference YAMLs otherwise
unchanged). Exercises: YAML merge + assert_and_infer, dataset from cfg,
aug pipeline per cfg flags, model build, train loop, checkpointing,
eval/test meters.
"""

import os
import sys

import pytest

import synthetic_data as synth

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def run_yaml(monkeypatch, yaml_rel, exp_name, overrides):
    import run_net

    argv = [
        "run_net.py", "--cfg", os.path.join(REPO, yaml_rel),
        "--exp_name", exp_name,
    ]
    for k, v in overrides.items():
        argv += [k, str(v)]
    monkeypatch.setattr(sys, "argv", argv)
    run_net.main()


COMMON = {
    "TPU.COMPUTE_DTYPE": "float32",  # CPU XLA lacks bf16 dot thunks
    "TENSORBOARD.ENABLE": "False",
    "DATA_LOADER.NUM_WORKERS": "2",
    "SOLVER.MAX_EPOCH": "1",
    "TRAIN.EVAL_PERIOD": "1",
    "TRAIN.CHECKPOINT_PERIOD": "1",
    "TRAIN.AUTO_RESUME": "False",
    "LOG_PERIOD": "1",
}


def test_orvit_mf_ssv2_yaml_runs(tmp_path, monkeypatch):
    """configs/ORViT/SSv2_ORViT-MF_224_16x4.yaml — the flagship recipe
    (launchers/run_orvit_mf_ssv2.sh)."""
    root = str(tmp_path / "ssv2")
    synth.make_ssv2_tree(root, num_videos=8, num_frames=12, size=48)
    overrides = dict(COMMON)
    overrides.update({
        "TRAIN.METHOD": "sup",  # like launchers/run_orvit_mf_ssv2.sh (reference default is 'slots')
        "TEST.EVAL_TASK": "ar",
        "SSV2.DATA_ROOT": root,
        "SSV2.SPLITS_ROOT": root,
        "TRAIN.CHECKPOINT_FILE_PATH": '""',
        "TRAIN.BATCH_SIZE": "8",
        "TEST.BATCH_SIZE": "8",
        "DATA.NUM_FRAMES": "4",
        "DATA.TRAIN_JITTER_SCALES": "[40,56]",
        "DATA.TRAIN_CROP_SIZE": "32",
        "DATA.TEST_CROP_SIZE": "32",
        "MF.PATCH_SIZE": "8",
        "MF.EMBED_DIM": "24",
        "MF.DEPTH": "3",
        "MF.NUM_HEADS": "2",
        "MF.TEMPORAL_RESOLUTION": "2",
        "ORVIT.LAYERS": "[1]",
        "OUTPUT_DIR": str(tmp_path / "out"),
    })
    run_yaml(monkeypatch, "configs/ORViT/SSv2_ORViT-MF_224_16x4.yaml",
             "zoo_ssv2", overrides)
    ckpt_dir = tmp_path / "out" / "checkpoints"
    assert any(p.name.startswith("checkpoint_epoch") for p in ckpt_dir.iterdir())


def test_kinetics_slowfast_yaml_runs(tmp_path, monkeypatch):
    """configs/Kinetics/SLOWFAST_8x8_R50.yaml — two-pathway ResNet with
    precise-BN and sync-BN-by-construction."""
    pytest.importorskip("cv2")
    root = str(tmp_path / "k400")
    synth.make_kinetics_tree(root, num_videos=8, num_frames=48, size=64)
    overrides = dict(COMMON)
    overrides.update({
        "TRAIN.METHOD": "sup",
        "TEST.EVAL_TASK": "ar",
        "DATA.PATH_TO_DATA_DIR": root,
        "TRAIN.BATCH_SIZE": "8",
        "TEST.BATCH_SIZE": "8",
        "TEST.NUM_ENSEMBLE_VIEWS": "1",
        "TEST.NUM_SPATIAL_CROPS": "3",
        "DATA.NUM_FRAMES": "8",
        "DATA.SAMPLING_RATE": "2",
        "DATA.TRAIN_JITTER_SCALES": "[72,88]",
        "DATA.TRAIN_CROP_SIZE": "64",
        "DATA.TEST_CROP_SIZE": "64",
        "MODEL.NUM_CLASSES": "4",
        "BN.NUM_BATCHES_PRECISE": "2",
        "OUTPUT_DIR": str(tmp_path / "out"),
    })
    run_yaml(monkeypatch, "configs/Kinetics/SLOWFAST_8x8_R50.yaml",
             "zoo_k400", overrides)
    assert (tmp_path / "out" / "checkpoints").is_dir()


def test_movi_steve_yaml_runs(tmp_path, monkeypatch):
    """configs/movi_e/base.yaml — STEVE slot training + segmentation eval
    (launchers/run_steve.sh)."""
    root = str(tmp_path / "movi")
    glob_dir = synth.make_movi_tree(root, num_dirs=12, frames_per_dir=6,
                                    size=64, num_segs=25)
    overrides = dict(COMMON)
    overrides.update({
        "DATA.PATH_TO_DATA_DIR": glob_dir,
        "TEST.ENABLE": "True",
        "TEST.BATCH_SIZE": "4",
        "SLOTS.SIZE": "16",
        "SLOTS.DIM": "16",
        "SLOTS.NUM_SLOTS": "3",
        "SLOTS.MLP_HID_SIZE": "16",
        "SLOTS.CNN_HID_SIZE": "8",
        "SLOTS.VOCAB_SIZE": "32",
        "SLOTS.NUM_PREDICTOR_BLOCKS": "1",
        "SLOTS.NUM_PREDICTOR_HEADS": "2",
        "SLOTS.DECODER.NUM_BLOCKS": "1",
        "SLOTS.DECODER.NUM_HEADS": "2",
        "SLOTS.DECODER.DIM": "16",
        "OUTPUT_DIR": str(tmp_path / "out"),
    })
    run_yaml(monkeypatch, "configs/movi_e/base.yaml", "zoo_movi", overrides)
    ckpt_dir = tmp_path / "out" / "zoo_movi" / "checkpoints"
    assert (ckpt_dir / "best_model.pt").exists()


def test_launcher_scripts_reference_existing_configs():
    import re

    launch_dir = os.path.join(REPO, "launchers")
    for fname in os.listdir(launch_dir):
        text = open(os.path.join(launch_dir, fname)).read()
        for m in re.finditer(r"configs/[\w./-]+\.yaml", text):
            assert os.path.exists(os.path.join(REPO, m.group(0))), (
                fname, m.group(0),
            )


def test_kinetics_mvit_yaml_runs(tmp_path, monkeypatch):
    """configs/Kinetics/MVIT_B_16x4_CONV.yaml — pooled-KV multiscale
    attention with the AUG.ENABLE train recipe (RandAugment + relative
    scales + random erasing + repeated aug)."""
    pytest.importorskip("cv2")
    root = str(tmp_path / "k400")
    synth.make_kinetics_tree(root, num_videos=8, num_frames=48, size=64)
    overrides = dict(COMMON)
    overrides.update({
        "TRAIN.METHOD": "sup",
        "TEST.EVAL_TASK": "ar",
        "DATA.PATH_TO_DATA_DIR": root,
        "TRAIN.BATCH_SIZE": "8",
        "TEST.BATCH_SIZE": "8",
        "TEST.NUM_ENSEMBLE_VIEWS": "1",
        "TEST.NUM_SPATIAL_CROPS": "1",
        "DATA.NUM_FRAMES": "4",
        "DATA.SAMPLING_RATE": "2",
        "DATA.TRAIN_JITTER_SCALES": "[72,88]",
        "DATA.TRAIN_CROP_SIZE": "64",
        "DATA.TEST_CROP_SIZE": "64",
        "MODEL.NUM_CLASSES": "4",
        "MVIT.EMBED_DIM": "24",
        "MVIT.NUM_HEADS": "2",
        "MVIT.DEPTH": "4",
        "MVIT.DIM_MUL": "[[2, 2.0]]",
        "MVIT.HEAD_MUL": "[[2, 2.0]]",
        "MVIT.POOL_Q_STRIDE": "[[2, 1, 2, 2]]",
        "MVIT.POOL_KV_STRIDE_ADAPTIVE": "[1, 2, 2]",
        "OUTPUT_DIR": str(tmp_path / "out"),
    })
    run_yaml(monkeypatch, "configs/Kinetics/MVIT_B_16x4_CONV.yaml",
             "zoo_mvit", overrides)
    assert (tmp_path / "out" / "checkpoints").is_dir()
