"""Wave-166 ops: Good-Turing — hand-worked spectrum, the classic
Turing identity, unseen-mass row, cap semantics."""

import pyarrow as pa


def _ds(texts, ray_session):
    import ray.data as rd

    return rd.from_arrow(pa.table({"text": texts}))


def test_hand_worked_spectrum(ray_session):
    from ocr_service_ray.ops.goodturing import good_turing

    # tokens: a a a b b c d e -> counts {a:3, b:2, c:1, d:1, e:1}
    out = good_turing(
        _ds(["a a a b b", "c d e"], ray_session), "text", cap=5
    ).set_index("r")
    assert out.loc[1, "n_r"] == 3
    assert out.loc[2, "n_r"] == 1
    assert out.loc[3, "n_r"] == 1
    # r*=1: 2 * N2/N1 = 2/3
    assert out.loc[1, "gt_rstar_micro"] == 1_000_000 * 2 * 1 // 3
    # r*=2: 3 * N3/N2 = 3
    assert out.loc[2, "gt_rstar_micro"] == 3_000_000
    # r=3 has no N4 -> 0
    assert out.loc[3, "gt_rstar_micro"] == 0
    # unseen mass: N1 / total = 3/8
    assert out.loc[0, "n_r"] == 5  # distinct tokens
    assert out.loc[0, "gt_rstar_micro"] == 1_000_000 * 3 // 8


def test_uniform_counts(ray_session):
    from ocr_service_ray.ops.goodturing import good_turing

    # every token appears exactly twice: N2 = 3, everything else 0
    out = good_turing(
        _ds(["x y z", "x y z"], ray_session), "text", cap=4
    ).set_index("r")
    assert out.loc[2, "n_r"] == 3
    assert out.loc[1, "n_r"] == 0
    assert out.loc[0, "gt_rstar_micro"] == 0  # no hapax -> no unseen mass


def test_cap_plus_one_exact(ray_session):
    from ocr_service_ray.ops.goodturing import good_turing

    # cap=2: a appears 3 times (= cap+1) and must feed r*=2 exactly,
    # even though counts >= cap+2 collapse
    out = good_turing(
        _ds(["a a a b b q q q q"], ray_session), "text", cap=2
    ).set_index("r")
    # counts: a:3, b:2, q:4 -> N2=1, N3=1 (exact), N4 collapsed
    assert out.loc[2, "n_r"] == 1
    assert out.loc[2, "gt_rstar_micro"] == 1_000_000 * 3 * 1 // 1
