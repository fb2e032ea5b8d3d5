"""Wave-157 ops: suffix array + Kasai LCP — brute parity, the
distinct-substring identity vs the wave-123 suffix automaton
(independent structures), closed forms."""

import numpy as np

from ocr_service_ray.ops.suffixarray import kasai_lcp, suffix_array


def _brute_sa(s):
    return [i for _, i in sorted((s[i:], i) for i in range(len(s)))]


def _brute_lcp(s, sa):
    out = [0] * len(sa)
    for j in range(1, len(sa)):
        a, b = s[sa[j - 1] :], s[sa[j] :]
        k = 0
        while k < len(a) and k < len(b) and a[k] == b[k]:
            k += 1
        out[j] = k
    return out


def test_banana_closed_form():
    s = "banana"
    sa = suffix_array(s)
    assert sa == [5, 3, 1, 0, 4, 2]  # a, ana, anana, banana, na, nana
    assert kasai_lcp(s, sa) == [0, 1, 3, 0, 0, 2]


def test_random_vs_brute():
    rng = np.random.RandomState(157)
    for _ in range(80):
        n = int(rng.randint(0, 40))
        s = "".join(rng.choice(list("abя ")) for _ in range(n))
        sa = suffix_array(s)
        assert sa == _brute_sa(s)
        if n:
            assert kasai_lcp(s, sa) == _brute_lcp(s, sa)


def test_distinct_identity_vs_suffix_automaton():
    from ocr_service_ray.ops.substrings import count_distinct_substrings

    rng = np.random.RandomState(58)
    for _ in range(40):
        n = int(rng.randint(1, 35))
        s = "".join(rng.choice(list("ab")) for _ in range(n))
        sa = suffix_array(s)
        lcp = kasai_lcp(s, sa)
        ident = n * (n + 1) // 2 - sum(lcp)
        assert ident == count_distinct_substrings(s)


def test_repetitive_vs_diverse():
    s1, s2 = "ab" * 10, "abcdefghijklmnopqrst"
    for s, rep in ((s1, True), (s2, False)):
        sa = suffix_array(s)
        lcp = kasai_lcp(s, sa)
        if rep:
            assert max(lcp) >= len(s) // 2
        else:
            assert max(lcp) == 0
