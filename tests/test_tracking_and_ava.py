"""SORT tracking and AVA mAP evaluator tests."""

import numpy as np


def test_sort_tracks_moving_boxes():
    from focus_tpu.utils.linkboxes.sort import sort_boxes

    T, O = 12, 3
    dets = []
    for t in range(T):
        # two objects moving right/down steadily
        a = [10 + 2 * t, 10, 30 + 2 * t, 30, 0.9]
        b = [50, 40 + 3 * t, 80, 70 + 3 * t, 0.8]
        dets.append([a, b])
    out = sort_boxes(dets, O)
    assert out.shape == (O, T, 4)
    # tracks stay consistent (trackers iterate reversed, like the
    # reference, so slot 0 is object b and slot 1 is object a)
    for t in range(4, T):
        assert abs(out[1, t, 0] - (10 + 2 * t)) < 3.0, (t, out[1, t])
        assert abs(out[0, t, 1] - (40 + 3 * t)) < 3.0, (t, out[0, t])
    # third slot remains empty
    assert np.all(out[2] == 0)


def test_sort_boxes_sorted_pins_saved_indices():
    from focus_tpu.utils.linkboxes.sort import sort_boxes_sorted

    frames = [
        np.array([[0.1, 0.1, 0.2, 0.2, 7], [0.3, 0.3, 0.4, 0.4, 0]]),
        np.array([[0.5, 0.5, 0.6, 0.6, 1]]),
    ]
    out = sort_boxes_sorted(frames, O=4, saved_indices=[0, 1])
    # track id 0 -> slot 0, id 1 -> slot 1, id 7 -> first free slot (2)
    assert np.allclose(out[0, 0], [0.3, 0.3, 0.4, 0.4])
    assert np.allclose(out[1, 1], [0.5, 0.5, 0.6, 0.6])
    assert np.allclose(out[2, 0], [0.1, 0.1, 0.2, 0.2])


def test_ava_map_perfect_and_degraded():
    from focus_tpu.utils.ava_eval import evaluate_ava_map

    gt = [
        ("img1", np.array([[0.1, 0.1, 0.4, 0.4], [0.5, 0.5, 0.9, 0.9]]),
         np.array([1, 2])),
        ("img2", np.array([[0.2, 0.2, 0.6, 0.6]]), np.array([1])),
    ]
    # perfect detections
    dets = [
        ("img1", np.array([[0.1, 0.1, 0.4, 0.4], [0.5, 0.5, 0.9, 0.9]]),
         np.array([1, 2]), np.array([0.9, 0.8])),
        ("img2", np.array([[0.2, 0.2, 0.6, 0.6]]), np.array([1]),
         np.array([0.7])),
    ]
    res = evaluate_ava_map(dets, gt, num_classes=3)
    assert res["map"] == 1.0
    # one false positive with highest score degrades AP for class 1
    dets_fp = dets + [
        ("img2", np.array([[0.0, 0.0, 0.05, 0.05]]), np.array([1]),
         np.array([0.99]))
    ]
    res2 = evaluate_ava_map(dets_fp, gt, num_classes=3)
    assert res2["map"] < 1.0
    assert res2["ap_per_class"][2] == 1.0
