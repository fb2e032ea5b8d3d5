"""Wave-123 ops: suffix-automaton distinct substrings — closed
forms, brute-force parity, density behavior."""

import numpy as np
import pyarrow as pa


def _brute(s):
    return len({s[i:j] for i in range(len(s)) for j in range(i + 1, len(s) + 1)})


def test_distinct_substrings_closed_forms():
    from ocr_service_ray.ops.substrings import count_distinct_substrings as c

    assert c("") == 0
    assert c("a") == 1
    assert c("aaaa") == 4  # all-same: exactly n
    assert c("abcd") == 10  # all-distinct: n(n+1)/2
    assert c("abab") == _brute("abab") == 7


def test_distinct_substrings_random_vs_brute():
    from ocr_service_ray.ops.substrings import count_distinct_substrings as c

    rng = np.random.RandomState(123)
    for _ in range(40):
        n = int(rng.randint(1, 60))
        s = "".join(rng.choice(list("abcа б")) for _ in range(n))
        assert c(s) == _brute(s)


def test_substring_density_repetitive_vs_diverse():
    import ray.data as rd

    from ocr_service_ray.ops.substrings import substring_density

    rep = "spam " * 20  # heavy repetition
    div = "the quick brown fox jumps over a lazy dog 0123456"
    out = (
        substring_density(
            rd.from_arrow(pa.table({"doc_id": [1, 2], "text": [rep, div]})),
            "doc_id",
            "text",
            cap=48,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.loc[0, "density_ppm"] < out.loc[1, "density_ppm"]
    assert out.loc[1, "density_ppm"] > 900_000  # near-maximal diversity
    # exact cross-check vs brute on both rows
    assert out.loc[0, "n_distinct"] == _brute(rep[:48])
    assert out.loc[1, "n_distinct"] == _brute(div[:48])
