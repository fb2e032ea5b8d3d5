"""Wave-183 ops: exact sign test — textbook tails, symmetry cap,
zero handling, comb reference."""

from math import comb

from ocr_service_ray.ops.signtest import sign_test


def test_all_positive_smallest_tail():
    out = sign_test([1] * 10).iloc[0]
    assert out["n"] == 10 and out["n_pos"] == 10
    assert out["p_num"] == 2  # 2 * C(10,0)
    assert out["p_den"] == 1024


def test_balanced_capped_at_one():
    out = sign_test([1, -1, 1, -1]).iloc[0]
    assert out["p_num"] == out["p_den"]  # p = 1 exactly


def test_textbook_9_3():
    # 9 pos, 3 neg: p = 2 * sum_{i<=3} C(12,i) / 2^12
    out = sign_test([1] * 9 + [-1] * 3).iloc[0]
    expect = 2 * sum(comb(12, i) for i in range(4))
    assert out["p_num"] == expect
    assert out["p_den"] == 4096


def test_zeros_dropped():
    out = sign_test([0, 0, 1, -1, 0]).iloc[0]
    assert out["n"] == 2 and out["n_zero"] == 3
    assert out["p_num"] == out["p_den"]


def test_empty_deltas():
    out = sign_test([]).iloc[0]
    assert out["n"] == 0 and out["p_num"] == out["p_den"] == 1
