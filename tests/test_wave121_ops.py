"""Wave-121 ops: NW token alignment — reference recursion parity,
metric properties, drift-cost bounds."""

import functools

import numpy as np
import pandas as pd
import pyarrow as pa


def _ref(a, b):
    @functools.lru_cache(maxsize=None)
    def d(i, j):
        if i == 0:
            return j
        if j == 0:
            return i
        return min(
            d(i - 1, j - 1) + (0 if a[i - 1] == b[j - 1] else 1),
            d(i - 1, j) + 1,
            d(i, j - 1) + 1,
        )

    return d(len(a), len(b))


def test_token_levenshtein_hand_checked():
    from ocr_service_ray.ops.align import token_levenshtein

    assert token_levenshtein(["a", "b", "c"], ["a", "b", "c"]) == 0
    assert token_levenshtein(["a", "b"], ["a", "x", "b"]) == 1  # insert
    assert token_levenshtein(["a", "b", "c"], ["a", "c"]) == 1  # delete
    assert token_levenshtein(["a", "b"], ["a", "x"]) == 1  # substitute
    assert token_levenshtein([], ["a", "b"]) == 2


def test_token_levenshtein_random_vs_reference():
    from ocr_service_ray.ops.align import token_levenshtein

    rng = np.random.RandomState(121)
    vocab = ["w%d" % i for i in range(6)]
    for _ in range(30):
        a = [vocab[i] for i in rng.randint(0, 6, rng.randint(0, 9))]
        b = [vocab[i] for i in rng.randint(0, 6, rng.randint(0, 9))]
        assert token_levenshtein(a, b) == _ref(tuple(a), tuple(b))


def test_token_levenshtein_metric_properties():
    from ocr_service_ray.ops.align import token_levenshtein

    rng = np.random.RandomState(2)
    v = ["x", "y", "z"]
    seqs = [
        [v[i] for i in rng.randint(0, 3, rng.randint(1, 7))]
        for _ in range(6)
    ]
    for a in seqs:
        for b in seqs:
            dab = token_levenshtein(a, b)
            assert dab == token_levenshtein(b, a)
            assert dab >= abs(len(a) - len(b))
            for c in seqs:  # triangle inequality
                assert dab <= token_levenshtein(a, c) + token_levenshtein(c, b)


def test_align_vs_edited_cost_bounds():
    import ray.data as rd

    from ocr_service_ray.ops.align import align_vs_edited

    texts = [
        " ".join(f"tok{i}" for i in range(20)),
        "single",
        " ".join(f"w{i}" for i in range(10)),
        "",
    ]
    out = (
        align_vs_edited(
            rd.from_arrow(pa.table({"doc_id": [1, 2, 3, 4], "text": texts})),
            "doc_id",
            "text",
            cap=16,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # doc 1: 16-token window, subs at 3,10 and drop at 5 -> cost 3
    assert out.loc[0, "n_a"] == 16 and out.loc[0, "n_b"] == 15
    assert out.loc[0, "align_cost"] == 3
    # doc 2: one token, no edit positions hit -> identical
    assert out.loc[1, "align_cost"] == 0
    # cost never exceeds edits applied, never below length gap
    for _, r in out.iterrows():
        assert r["align_cost"] >= r["n_a"] - r["n_b"]
        assert r["align_cost"] <= r["n_a"]
