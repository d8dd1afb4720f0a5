"""AVA evaluation protocol tests: official csv/labelmap/exclusion reading,
exclusion + whitelist semantics, and a hand-checked mAP, plus the full
detection test path through tools/run_net.py on a synthetic AVA tree
(reference ava_eval_helper.py:49-289, tools/test_net.py:57-158)."""

import os
import sys

import numpy as np

import synthetic_data as synth
from focus_tpu.utils import ava_eval

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def test_read_labelmap_and_exclusions(tmp_path):
    lm = tmp_path / "labelmap.pbtxt"
    lm.write_text(
        'item {\n  name: "stand"\n  id: 1\n}\n'
        'item {\n  name: "sit"\n  label_id: 3\n}\n'
    )
    categories, whitelist = ava_eval.read_labelmap(str(lm))
    assert whitelist == {1, 3}
    assert categories[1] == {"id": 3, "name": "sit"}

    ex = tmp_path / "excl.csv"
    ex.write_text("vidA,0902\nvidB,903\n")
    excluded = ava_eval.read_exclusions(str(ex))
    assert excluded == {"vidA,0902", "vidB,0903"}


def test_read_csv_whitelist_and_scores(tmp_path):
    p = tmp_path / "gt.csv"
    p.write_text(
        "vidA,902,0.1,0.2,0.5,0.6,1,1\n"
        "vidA,902,0.3,0.3,0.7,0.8,9,1\n"  # class 9 not whitelisted
    )
    boxes, labels, scores = ava_eval.read_csv(str(p), class_whitelist={1, 2})
    assert list(boxes) == ["vidA,0902"]
    assert labels["vidA,0902"] == [1]
    # boxes stored [y1, x1, y2, x2]
    np.testing.assert_allclose(boxes["vidA,0902"][0], [0.2, 0.1, 0.6, 0.5])


def test_run_evaluation_handchecked_map():
    categories = [{"id": 1, "name": "a"}]
    gt_boxes = {
        "v,0902": [[0.1, 0.1, 0.5, 0.5]],
        "v,0903": [[0.2, 0.2, 0.6, 0.6]],
    }
    gt_labels = {"v,0902": [1], "v,0903": [1]}
    det_boxes = {
        "v,0902": [[0.1, 0.1, 0.5, 0.5]],   # perfect match, high score
        "v,0903": [[0.7, 0.7, 0.9, 0.9]],   # miss, lower score
    }
    det_labels = {"v,0902": [1], "v,0903": [1]}
    det_scores = {"v,0902": [0.9], "v,0903": [0.5]}

    # no exclusions: tp at rank 1 (rec .5, prec 1), fp at rank 2 -> AP 0.5
    m = ava_eval.run_evaluation(
        categories, (gt_boxes, gt_labels, None),
        (det_boxes, det_labels, det_scores), set(),
    )
    assert np.isclose(m["PascalBoxes_Precision/mAP@0.5IOU"], 0.5)

    # excluding the missed keyframe removes both its GT and detection -> 1.0
    m = ava_eval.run_evaluation(
        categories, (gt_boxes, gt_labels, None),
        (det_boxes, det_labels, det_scores), {"v,0903"},
    )
    assert np.isclose(m["PascalBoxes_Precision/mAP@0.5IOU"], 1.0)


def test_ava_yaml_detection_train_and_test(tmp_path, monkeypatch):
    """configs/AVA/SLOW_8x8_R50_SHORT.yaml end to end: detection train,
    AVAMeter val, and the detection test path with official-protocol eval."""
    import run_net

    root = str(tmp_path / "ava")
    synth.make_ava_tree(root, num_videos=4, num_frames=70, size=64,
                        num_classes=4)
    overrides = {
        "TRAIN.METHOD": "sup",
        "TEST.EVAL_TASK": "ar",
        "AVA.FRAME_DIR": os.path.join(root, "frames"),
        "AVA.FRAME_LIST_DIR": os.path.join(root, "frame_lists"),
        "AVA.ANNOTATION_DIR": os.path.join(root, "annotations"),
        "AVA.TRAIN_GT_BOX_LISTS": '["gt_train.csv"]',
        "AVA.TRAIN_PREDICT_BOX_LISTS": '["person_box_train.csv"]',
        "AVA.TEST_PREDICT_BOX_LISTS": '["person_box_val.csv"]',
        "AVA.GROUNDTRUTH_FILE": "gt_val.csv",
        "AVA.EXCLUSION_FILE": "excluded.csv",
        "AVA.LABEL_MAP_FILE": "labelmap.pbtxt",
        "AVA.DETECTION_SCORE_THRESH": "0.5",
        "MODEL.NUM_CLASSES": "4",
        "TRAIN.BATCH_SIZE": "8",
        "TEST.BATCH_SIZE": "8",
        "DATA.NUM_FRAMES": "4",
        "DATA.SAMPLING_RATE": "2",
        "DATA.TRAIN_JITTER_SCALES": "[72,88]",
        "DATA.TRAIN_CROP_SIZE": "64",
        "DATA.TEST_CROP_SIZE": "64",
        "SOLVER.MAX_EPOCH": "1",
        "SOLVER.WARMUP_EPOCHS": "0.0",
        "TRAIN.EVAL_PERIOD": "1",
        "TRAIN.CHECKPOINT_PERIOD": "1",
        "TRAIN.AUTO_RESUME": "False",
        "TPU.COMPUTE_DTYPE": "float32",
        "TENSORBOARD.ENABLE": "False",
        "DATA_LOADER.NUM_WORKERS": "2",
        "LOG_PERIOD": "1",
        "OUTPUT_DIR": str(tmp_path / "out"),
    }
    argv = [
        "run_net.py", "--cfg",
        os.path.join(REPO, "configs/AVA/SLOW_8x8_R50_SHORT.yaml"),
        "--exp_name", "zoo_ava",
    ]
    for k, v in overrides.items():
        argv += [k, str(v)]
    monkeypatch.setattr(sys, "argv", argv)
    run_net.main()
    assert (tmp_path / "out" / "checkpoints").is_dir()
