"""Wave-187 ops: exact McNemar — discordant-only dependence,
textbook tails, degenerate cases."""

from math import comb

from ocr_service_ray.ops.mcnemar import mcnemar_exact


def test_concordant_pairs_ignored():
    a = mcnemar_exact(100, 3, 9, 50).iloc[0]
    b = mcnemar_exact(0, 3, 9, 0).iloc[0]
    assert a["p_num"] == b["p_num"] and a["p_den"] == b["p_den"]


def test_textbook_3_9():
    out = mcnemar_exact(0, 3, 9, 0).iloc[0]
    expect = 2 * sum(comb(12, i) for i in range(4))
    assert out["p_num"] == expect
    assert out["p_den"] == 4096


def test_balanced_discordance_p_one():
    out = mcnemar_exact(5, 4, 4, 5).iloc[0]
    assert out["p_num"] == out["p_den"]


def test_no_discordance():
    out = mcnemar_exact(7, 0, 0, 7).iloc[0]
    assert out["p_num"] == out["p_den"] == 1


def test_extreme_one_sided():
    out = mcnemar_exact(0, 10, 0, 0).iloc[0]
    assert out["p_num"] == 2  # 2 * C(10, 0)
    assert out["p_den"] == 1024
