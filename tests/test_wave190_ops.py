"""Wave-190 ops: Palma ratio — cut arithmetic, closed forms,
inequality ordering."""

from ocr_service_ray.ops.palma import palma_ratio


def _p(vals):
    return palma_ratio(list(enumerate(vals)))


def test_cut_sizes():
    out = _p(list(range(10))).iloc[0]
    assert out["k_top"] == 1 and out["k_bot"] == 4
    out = _p(list(range(25))).iloc[0]
    assert out["k_top"] == 3 and out["k_bot"] == 10


def test_uniform_distribution():
    out = _p([5] * 10).iloc[0]
    # top 1 holds 5, bottom 4 hold 20: palma = 0.25
    assert out["s_top"] == 5 and out["s_bot"] == 20
    assert out["palma_milli"] == 250


def test_concentrated_top():
    out = _p([1] * 9 + [91]).iloc[0]
    assert out["s_top"] == 91 and out["s_bot"] == 4
    assert out["palma_milli"] == 1000 * 91 // 4


def test_more_concentration_higher_palma():
    a = _p([10] * 10).iloc[0]["palma_milli"]
    b = _p([5] * 9 + [55]).iloc[0]["palma_milli"]
    assert b > a


def test_zero_bottom_guard():
    out = _p([0, 0, 0, 0, 1, 1, 1, 1, 1, 9]).iloc[0]
    assert out["s_bot"] == 0
    assert out["palma_milli"] == 0
