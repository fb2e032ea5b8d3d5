"""Wave-136 ops: Aho-Corasick — overlap semantics, brute parity,
nested/suffix patterns, actor-stage equivalence."""

import numpy as np
import pyarrow as pa


def _brute(text, patterns):
    total = 0
    hit = set()
    for pi, p in enumerate(patterns):
        for i in range(len(text) - len(p) + 1):
            if text[i : i + len(p)] == p:
                total += 1
                hit.add(pi)
    return total, len(hit)


def test_ac_overlapping_and_nested():
    from ocr_service_ray.ops.ahocorasick import AhoCorasick

    ac = AhoCorasick(["aa", "a"])
    # "aaa": 'a' x3 + 'aa' x2 (overlapping) = 5 matches, 2 patterns
    assert ac.count_matches("aaa") == (5, 2)
    # suffix pattern found via failure links: "she" vs {he, she, e}
    ac2 = AhoCorasick(["he", "she", "e"])
    assert ac2.count_matches("she") == (3, 3)


def test_ac_random_vs_brute():
    from ocr_service_ray.ops.ahocorasick import AhoCorasick

    rng = np.random.RandomState(136)
    pats = ["ab", "ba", "aab", "b", "abab", "я"]
    ac = AhoCorasick(pats)
    for _ in range(40):
        s = "".join(rng.choice(list("abя")) for _ in range(rng.randint(0, 40)))
        assert ac.count_matches(s) == _brute(s, pats)


def test_ac_stage_counts_batchwise():
    import ray.data as rd

    from ocr_service_ray.ops.ahocorasick import scan_patterns

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3],
                "text": ["the batch table", "", "win window winning"],
            }
        )
    )
    out = (
        scan_patterns(docs, ["ta", "win", "the"], "doc_id", "text")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # 'the'(1) + 'ta' in 'table'(1); 'batch' has no 'ta'
    assert out.loc[0, "n_matches"] == 2
    assert out.loc[0, "n_patterns"] == 2
    assert out.loc[1, "n_matches"] == 0
    assert out.loc[2, "n_matches"] == 3 and out.loc[2, "n_patterns"] == 1
