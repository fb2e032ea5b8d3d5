"""Wave-188 ops: Mood's median test — hypergeometric identities,
closed forms, scipy-free reference parity."""

from math import comb

from ocr_service_ray.ops.moodmedian import mood_median_test


def test_identical_groups_moderate_p():
    out = mood_median_test([1, 3, 5, 7], [2, 4, 6, 8]).iloc[0]
    # pooled lower median of 1..8 is 4; above: {5,7} from g1, {6,8}
    # from g2 -> x=2, n=4, K=4, N=8
    assert out["median_cents"] == 4
    assert out["x_above_1"] == 2 and out["n_above"] == 4
    expect = sum(comb(4, i) * comb(4, 4 - i) for i in range(2, 5))
    assert out["p_num"] == expect
    assert out["p_den"] == comb(8, 4)


def test_fully_separated():
    out = mood_median_test([101, 102, 103], [1, 2, 3]).iloc[0]
    # median = 3 (lower of 6); all of group 1 above -> x = 3 = n
    assert out["x_above_1"] == 3 and out["n_above"] == 3
    assert out["p_num"] == 1  # only the observed extreme table
    assert out["p_den"] == comb(6, 3)


def test_tail_sums_to_den_when_x_zero():
    out = mood_median_test([1, 2], [3, 4]).iloc[0]
    # x = 0 -> tail covers everything: p = 1
    assert out["x_above_1"] == 0
    assert out["p_num"] == out["p_den"]


def test_empty():
    out = mood_median_test([], []).iloc[0]
    assert out["p_num"] == out["p_den"] == 1
