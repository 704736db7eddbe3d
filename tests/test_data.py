"""Dataset + transforms tests on the synthetic DAVIS tree (SURVEY.md §4)."""

import os

import numpy as np
import pytest

from osvos_tpu.configs import MEANVAL_BGR, DataConfig
from osvos_tpu.data import (Compose, DAVIS2016, RandomHorizontalFlip, Resize,
                            ScaleNRotate, ToArray)
from osvos_tpu.data.helpers import (construct_name, im_normalize,
                                    overlay_mask, tens2image)
from osvos_tpu.data.synthetic import generate


@pytest.fixture(scope="module")
def davis_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("davis")
    return generate(str(root), height=64, width=96, n_frames=5)


def test_train_split_indexes_all_frames(davis_root):
    ds = DAVIS2016(train=True, db_root_dir=davis_root)
    # 2 train seqs x 5 frames
    assert len(ds) == 10
    img, gt = ds.make_img_gt_pair(0)
    assert img.shape == (64, 96, 3) and gt.shape == (64, 96)
    assert set(np.unique(gt)).issubset({0.0, 1.0})
    # caffe-mean subtraction: values centered near zero
    assert -260 < img.min() < img.max() < 260
    assert abs(float(img.mean())) < 120


def test_seq_train_mode_is_one_shot(davis_root):
    ds = DAVIS2016(train=True, db_root_dir=davis_root, seq_name="synth-val-a")
    assert len(ds) == 1
    sample = ds[0]
    assert sample["fname"].startswith("synth-val-a/")


def test_seq_test_mode_zero_gt_for_unannotated(davis_root):
    ds = DAVIS2016(train=False, db_root_dir=davis_root, seq_name="synth-val-a")
    assert len(ds) == 5
    _, gt0 = ds.make_img_gt_pair(0)
    assert gt0.max() == 1.0
    _, gt3 = ds.make_img_gt_pair(3)
    assert gt3.max() == 0.0  # unannotated -> zeros (davis_2016.py:~55)


def test_input_res_resize(davis_root):
    ds = DAVIS2016(train=True, db_root_dir=davis_root, input_res=(32, 48))
    img, gt = ds.make_img_gt_pair(0)
    assert img.shape == (32, 48, 3) and gt.shape == (32, 48)


def test_transforms_compose(davis_root):
    import random

    tf = Compose([RandomHorizontalFlip(0.5, rng=random.Random(3)),
                  ScaleNRotate(rng=random.Random(4)),
                  Resize((48, 64)), ToArray()])
    ds = DAVIS2016(train=True, db_root_dir=davis_root, transform=tf)
    s = ds[0]
    assert s["image"].shape == (48, 64, 3)
    assert s["gt"].shape == (48, 64, 1)
    assert set(np.unique(s["gt"])).issubset({0.0, 1.0})  # nearest interp


def test_helpers_roundtrip(rng):
    x = rng.rand(1, 8, 9, 1).astype(np.float32)
    assert tens2image(x).shape == (8, 9)
    n = im_normalize(rng.rand(5, 5) * 7 + 3)
    assert n.min() == 0.0 and n.max() == 1.0
    im = (rng.rand(16, 16, 3) * 255).astype(np.uint8)
    ma = rng.rand(16, 16) > 0.5
    ov = overlay_mask(im, ma)
    assert ov.shape == im.shape and ov.dtype == np.uint8
    name = construct_name({"lr": 1e-8, "wd": 2e-4}, "parent")
    assert name == "parent_lr-1e-08_wd-0.0002"


def test_missing_split_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        DAVIS2016(train=True, db_root_dir=str(tmp_path / "nope"))


def test_packaged_davis_2016_splits():
    """The packaged standard DAVIS-2016 splits ship with the library and are
    used as the last-resort fallback (reference expects train_seqs.txt /
    val_seqs.txt at the DAVIS root, davis_2016.py:~35)."""
    import os

    from osvos_tpu.data.davis import _read_split

    root = os.path.join(os.path.dirname(__file__), "nonexistent-davis-root")
    train = _read_split(root, train=True, year="2016")
    val = _read_split(root, train=False, year="2016")
    assert len(train) == 30 and len(val) == 20
    assert "blackswan" in val and "bear" in train
    assert not set(train) & set(val)
