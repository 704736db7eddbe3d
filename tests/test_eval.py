"""DAVIS J/F evaluator unit tests (SURVEY.md §4c)."""

import numpy as np

from osvos_tpu.evaluation.davis_j import (boundary_f_measure, db_eval_iou,
                                          evaluate_sequence)


def _disk(h, w, cy, cx, r):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((yy - cy) ** 2 + (xx - cx) ** 2) <= r * r


def test_iou_basic():
    a = _disk(64, 64, 32, 32, 10)
    assert db_eval_iou(a, a) == 1.0
    assert db_eval_iou(a, ~a) == 0.0
    assert db_eval_iou(np.zeros((4, 4)), np.zeros((4, 4))) == 1.0
    b = _disk(64, 64, 32, 36, 10)
    iou = db_eval_iou(a, b)
    assert 0.4 < iou < 0.9


def test_boundary_f_perfect_and_shifted():
    a = _disk(96, 96, 48, 48, 20)
    assert boundary_f_measure(a, a) == 1.0
    # 1-px shift stays within the 0.8%-diagonal tolerance (~2px at 96x96)
    b = np.roll(a, 1, axis=1)
    assert boundary_f_measure(a, b) == 1.0
    # big shift breaks matching
    c = np.roll(a, 30, axis=1)
    assert boundary_f_measure(a, c) < 0.5
    assert boundary_f_measure(a, np.zeros_like(a)) == 0.0


def test_evaluate_sequence_excludes_first_and_last():
    good = _disk(64, 64, 32, 32, 12)
    bad = np.zeros_like(good)
    anns = [good] * 5
    # wrong predictions only on excluded frames -> still perfect
    segs = [bad, good, good, good, bad]
    m = evaluate_sequence(anns, segs)
    assert m["J_mean"] == 1.0 and m["F_mean"] == 1.0
    # wrong on an interior frame lowers J
    segs2 = [good, good, bad, good, good]
    m2 = evaluate_sequence(anns, segs2)
    assert m2["J_mean"] < 1.0
