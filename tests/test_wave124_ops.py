"""Wave-124 ops: LZ76 complexity — doubling parse, closed forms,
independent-reference parity, ordering behavior."""

import numpy as np
import pyarrow as pa


def _ref(s):
    """Independent reference: scan all earlier start positions."""
    n = len(s)
    p = nf = nl = 0
    while p < n:
        best = 0
        for start in range(p):
            l = 0
            while (
                start + l < p and p + l < n and s[start + l] == s[p + l]
            ):
                l += 1
            best = max(best, l)
        if best == 0:
            nl += 1
            p += 1
        else:
            p += best
        nf += 1
    return nf, nl


def test_lz_doubling_and_closed_forms():
    from ocr_service_ray.ops.lz import lz76_factors

    assert lz76_factors("") == (0, 0)
    assert lz76_factors("a") == (1, 1)
    # a^8: literal, then matches of length 1, 2, 4 -> 4 factors
    assert lz76_factors("aaaaaaaa") == (4, 1)
    # all-novel chars: every factor a literal
    assert lz76_factors("abcdefg") == (7, 7)
    # abab: 'a','b' literals then 'ab' match
    assert lz76_factors("abab") == (3, 2)


def test_lz_random_vs_independent_reference():
    from ocr_service_ray.ops.lz import lz76_factors

    rng = np.random.RandomState(124)
    for _ in range(40):
        n = int(rng.randint(0, 60))
        s = "".join(rng.choice(list("abя")) for _ in range(n))
        assert lz76_factors(s) == _ref(s)


def test_lz_complexity_orders_repetitive_below_random():
    import ray.data as rd

    from ocr_service_ray.ops.lz import lz_complexity

    rng = np.random.RandomState(7)
    rep = "lorem ipsum " * 8
    rand = "".join(rng.choice(list("abcdefghijklmnop")) for _ in range(48))
    out = (
        lz_complexity(
            rd.from_arrow(pa.table({"doc_id": [1, 2], "text": [rep, rand]})),
            "doc_id",
            "text",
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.loc[0, "complexity_ppm"] < out.loc[1, "complexity_ppm"]
    assert out.loc[0, "n_factors"] < out.loc[1, "n_factors"]
