"""Split utilities (reference tests/test_utils.py semantics)."""

import numpy as np
import pytest

from torchmdnet_tpu.utils import make_splits, number, train_val_test_split


def test_make_splits_ratios():
    train, val, test = make_splits(100, 0.7, 0.2, 0.1, seed=0)
    assert len(train) == 70 and len(val) == 20 and len(test) == 10
    all_idx = np.concatenate([train, val, test])
    assert len(np.unique(all_idx)) == 100


def test_make_splits_counts():
    train, val, test = make_splits(100, 50, 20, 10, seed=0)
    assert len(train) == 50 and len(val) == 20 and len(test) == 10


def test_make_splits_none_fills():
    train, val, test = make_splits(100, None, 20, 10, seed=0)
    assert len(train) == 70


def test_make_splits_deterministic_by_seed():
    t1, v1, s1 = make_splits(50, 0.8, 0.1, 0.1, seed=7)
    t2, v2, s2 = make_splits(50, 0.8, 0.1, 0.1, seed=7)
    np.testing.assert_array_equal(t1, t2)
    t3, _, _ = make_splits(50, 0.8, 0.1, 0.1, seed=8)
    assert not np.array_equal(t1, t3)


def test_make_splits_save_load(tmp_path):
    path = str(tmp_path / "splits.npz")
    t1, v1, s1 = make_splits(40, 0.5, 0.25, 0.25, seed=3, filename=path)
    t2, v2, s2 = make_splits(40, None, None, None, seed=99, splits=path)
    np.testing.assert_array_equal(t1, t2)
    np.testing.assert_array_equal(v1, v2)
    np.testing.assert_array_equal(s1, s2)


def test_make_splits_order():
    order = list(range(30))[::-1]
    t, v, s = make_splits(30, 10, 10, 10, seed=0, order=order)
    np.testing.assert_array_equal(t, np.arange(29, 19, -1))


def test_make_splits_errors():
    with pytest.raises(AssertionError):
        train_val_test_split(100, 80, 30, 20, seed=0)
    with pytest.raises(AssertionError):
        train_val_test_split(100, None, None, 10, seed=0)


def test_number():
    assert number("3") == 3 and isinstance(number("3"), int)
    assert number("0.5") == 0.5 and isinstance(number("0.5"), float)
    assert number(None) is None
