import numpy as np

from bsc_project_spark.kernels import metrics as M


def _sample():
    target = np.zeros((20, 20), dtype=np.int64)
    target[2:8, 2:8] = 1
    target[12:18, 12:18] = 2
    pred = target.copy()
    pred[2:8, 2:5] = 0      # half of class 1 mispredicted
    pred[12:18, 12:18] = 2  # class 2 perfect
    return pred, target


def test_confusion_and_derived():
    pred, target = _sample()
    c = M.confusion_counts(pred, target, 3)
    assert c["TP"][2] == 36 and c["FN"][2] == 0
    assert c["FN"][1] == 18 and c["TP"][1] == 18
    iou = M.iou_per_class(c)
    assert abs(iou[1] - 18 / 36) < 1e-6
    assert abs(iou[2] - 1.0) < 1e-6
    dice = M.dice_per_class(c)
    assert abs(dice[2] - 1.0) < 1e-6
    assert 0 < M.pixel_accuracy(c) < 1
    # mean IoU only over classes present in GT (all 3 here)
    assert 0 < M.mean_iou(c) <= 1


def test_mean_iou_valid_class_masking():
    target = np.zeros((10, 10), dtype=np.int64)  # only class 0 in GT
    pred = target.copy()
    pred[0, 0] = 5
    c = M.confusion_counts(pred, target, 6)
    assert M.mean_iou(c) == M.iou_per_class(c)[0]  # classes 1-5 masked out


def test_boundary_f1_perfect_and_degraded():
    pred, target = _sample()
    perfect = M.boundary_f1(target, target, 3)
    assert perfect["boundary_f1"] > 0.99
    degraded = M.boundary_f1(pred, target, 3)
    assert degraded["boundary_f1"] < perfect["boundary_f1"]


def test_instance_separation():
    target = np.zeros((20, 20), dtype=np.int64)
    target[2:6, 2:6] = 1
    target[10:14, 10:14] = 1
    pred = target.copy()
    assert M.instance_separation(pred, target, 2) == 1.0
    pred2 = np.zeros_like(target)
    pred2[2:6, 2:6] = 1  # one of two class-1 instances found
    # class 0 (background) scores 1.0, class 1 scores 0.5 -> mean 0.75
    # (the reference loops ALL classes incl. 0, metrics.py:157-158)
    assert abs(M.instance_separation(pred2, target, 2) - 0.75) < 1e-9


def test_levenshtein_and_cer():
    assert M.levenshtein("kitten", "sitting") == 3
    assert M.levenshtein("", "abc") == 3
    assert M.levenshtein("abc", "abc") == 0
    assert M.cer("1907", "1907") == 0.0
    assert M.cer("19o7", "1907") == 0.25
    assert M.cer("", "") == 0.0
    assert M.cer("x", "") == 1.0  # empty-truth guard (evaluate_ocr.py:17-18)


def test_box_mad_and_pixel_diff():
    assert M.box_count_mad({0: 5, 1: 3}, {0: 4, 1: 3}) == 0.5
    a = np.zeros((4, 4))
    b = a.copy()
    b[0, 0] = 1
    assert M.pixel_diff_fraction(a, b) == 1 / 16
