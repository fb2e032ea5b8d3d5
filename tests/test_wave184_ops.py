"""Wave-184 ops: Smith-Waterman — textbook local alignment, noise
immunity, brute parity, tie rule."""

import numpy as np

from ocr_service_ray.ops.smithwaterman import sw_local


def _brute(a, b):
    n, m = len(a), len(b)
    H = [[0] * (m + 1) for _ in range(n + 1)]
    best, bi, bj = 0, 0, 0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            H[i][j] = max(
                0,
                H[i - 1][j - 1] + (2 if a[i - 1] == b[j - 1] else -1),
                H[i - 1][j] - 1,
                H[i][j - 1] - 1,
            )
            if H[i][j] > best:
                best, bi, bj = H[i][j], i, j
    return best, bi, bj


def test_exact_substring_found_despite_noise():
    score, i, j = sw_local("xxxbatchyyy", "batch")
    assert score == 10  # 5 matches * 2
    assert (i, j) == (8, 5)  # ends where 'batch' ends


def test_local_beats_global_on_flanked_match():
    # global NW would pay for the flanks; SW ignores them entirely
    score, _, _ = sw_local("zzzzzztable", "table")
    assert score == 10


def test_single_mismatch_inside():
    score, _, _ = sw_local("bXtch", "batch")
    # align 'bXtch' vs 'batch': 4 matches + 1 mismatch = 8 - 1 = 7
    assert score == 7


def test_no_similarity_zero():
    score, i, j = sw_local("qqqq", "zzz")
    assert (score, i, j) == (0, 0, 0)


def test_random_vs_brute():
    rng = np.random.RandomState(184)
    for _ in range(60):
        a = "".join(rng.choice(list("abct "), rng.randint(0, 17)))
        b = "".join(rng.choice(list("abct "), rng.randint(1, 12)))
        assert sw_local(a, b) == _brute(a, b)
