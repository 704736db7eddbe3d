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


def _seg2bmap_oracle(seg):
    """Brute-force restatement of the official convention: a pixel is
    boundary iff it differs from an IN-BOUNDS east/south/southeast
    neighbour (the official code's border overrides reduce to exactly
    this)."""
    seg = np.asarray(seg) > 0.5
    h, w = seg.shape
    b = np.zeros((h, w), bool)
    for y in range(h):
        for x in range(w):
            for dy, dx in ((0, 1), (1, 0), (1, 1)):
                if y + dy < h and x + dx < w and seg[y, x] != seg[y + dy,
                                                                  x + dx]:
                    b[y, x] = True
    return b


def test_seg2bmap_matches_official_convention():
    from osvos_tpu.evaluation.davis_j import seg2bmap

    rng = np.random.RandomState(0)
    shapes = [
        _disk(17, 23, 8, 11, 5),                  # disk
        np.pad(np.ones((4, 6), bool), ((3, 5), (2, 4))),  # square
        rng.rand(19, 13) > 0.5,                   # noise
        np.ones((7, 9), bool),                    # all-fg (border rows)
        np.zeros((7, 9), bool),
    ]
    for seg in shapes:
        np.testing.assert_array_equal(seg2bmap(seg), _seg2bmap_oracle(seg))


def test_seg2bmap_half_pixel_side():
    """The official convention marks an edge on its top/left pixel —
    whichever side of the figure that is — unlike erosion-diff (always
    the foreground side). A vertical half-plane edge between columns 2
    and 3 must be marked on BACKGROUND column 2, not foreground 3."""
    from osvos_tpu.evaluation.davis_j import seg2bmap

    seg = np.zeros((8, 8), bool)
    seg[:, 3:] = True
    b = seg2bmap(seg)
    assert b[:, 2].all() and not b[:, 3].any()
    assert b.sum() == 8


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
