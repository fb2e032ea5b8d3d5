"""Wave-172 ops: LZW parse — textbook example, repetition learning,
brute-reference parity, dictionary accounting."""

import numpy as np

from ocr_service_ray.ops.lzw import lzw_parse


def _ref(s):
    """Independent dict-based reimplementation."""
    if not s:
        return 0, 0
    d = {c: None for c in sorted(set(s))}
    pos, codes = 0, 0
    while pos < len(s):
        L = 1
        while pos + L <= len(s) and s[pos : pos + L] in d:
            best = L
            L += 1
        codes += 1
        if pos + best < len(s):
            d.setdefault(s[pos : pos + best + 1], None)
        pos += best
    return codes, len(d)


def test_textbook_ababab():
    # 'ababab': dict {a,b}; parse a|b|ab|ab -> 4 codes, learns
    # ab, ba, aba
    codes, size = lzw_parse("ababab")
    assert codes == 4
    assert size == 5


def test_all_same_char():
    # 'aaaaaa' parses a|aa|aaa -> 3 codes
    codes, size = lzw_parse("aaaaaa")
    assert codes == 3


def test_all_distinct_no_learning_gain():
    codes, size = lzw_parse("abcdef")
    assert codes == 6  # nothing repeats; one code per char
    assert size == 6 + 5  # still learns 5 bigrams


def test_empty_and_single():
    assert lzw_parse("") == (0, 0)
    assert lzw_parse("x") == (1, 1)


def test_random_vs_reference():
    rng = np.random.RandomState(172)
    for _ in range(80):
        n = int(rng.randint(0, 30))
        s = "".join(rng.choice(list("abя")) for _ in range(n))
        assert lzw_parse(s) == _ref(s)


def test_repetitive_compresses_better():
    rep, _ = lzw_parse("ab" * 12)
    div, _ = lzw_parse("abcdefghijklmnopqrstuvwx")
    assert rep < div
