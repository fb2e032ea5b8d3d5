"""Wave-147 ops: Manacher longest palindrome — brute parity, closed
forms, tie-to-smallest-start."""

import numpy as np
import pyarrow as pa

from ocr_service_ray.ops.palindrome import manacher_longest


def _brute(s):
    best_len, best_start = 0, 0
    n = len(s)
    for i in range(n):
        for l in range(1, n - i + 1):
            sub = s[i : i + l]
            if sub == sub[::-1] and l > best_len:
                best_len, best_start = l, i
    return best_len, best_start


def test_closed_forms():
    assert manacher_longest("") == (0, 0)
    assert manacher_longest("a") == (1, 0)
    assert manacher_longest("abba") == (4, 0)
    assert manacher_longest("xabay") == (3, 1)
    assert manacher_longest("abcdef") == (1, 0)  # tie -> first char
    assert manacher_longest("aacabad") == (3, 1)  # 'aca' beats 'aa'


def test_even_and_odd_lengths():
    assert manacher_longest("zzabccbayy") == (6, 2)
    assert manacher_longest("zzabcbayy") == (5, 2)


def test_random_vs_brute():
    rng = np.random.RandomState(147)
    for _ in range(120):
        n = int(rng.randint(0, 30))
        s = "".join(rng.choice(list("abя")) for _ in range(n))
        assert manacher_longest(s) == _brute(s)


def test_dataset_pass(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.palindrome import longest_palindromes

    out = (
        longest_palindromes(
            rd.from_arrow(
                pa.table(
                    {
                        "doc_id": [1, 2],
                        "text": ["qzlevelxw", ""],
                    }
                )
            ),
            "doc_id",
            "text",
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.loc[0, "pal"] == "level"
    assert out.loc[0, "pal_start"] == 3  # 1-based
    assert list(out.loc[1, ["pal_len", "pal_start", "pal"]]) == [0, 0, ""]
