"""Wave-175 ops: MOSS pairs — LCS brute parity, the end-to-end
winnowing guarantee, threshold filtering."""

import numpy as np
import pyarrow as pa

from ocr_service_ray.ops.mosspairs import lcs_length


def _brute_lcs(a, b):
    best = 0
    for i in range(len(a)):
        for j in range(i + 1, len(a) + 1):
            if a[i:j] in b:
                best = max(best, j - i)
    return best


def test_lcs_closed_forms():
    assert lcs_length("", "abc") == 0
    assert lcs_length("abc", "abc") == 3
    assert lcs_length("xabcy", "zabcw") == 3
    assert lcs_length("abcd", "efgh") == 0


def test_lcs_random_vs_brute():
    rng = np.random.RandomState(175)
    for _ in range(60):
        a = "".join(rng.choice(list("abя"), rng.randint(0, 25)))
        b = "".join(rng.choice(list("abя"), rng.randint(0, 25)))
        assert lcs_length(a, b) == _brute_lcs(a, b)


def test_moss_end_to_end(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.mosspairs import moss_pairs

    shared = "quartzjumble"  # 12 shared chars >= 8 guarantee
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2, 3, 4],
                "text": [
                    "xxxx" + shared + "yyyyyyyy",
                    shared + "zzzzzzzzzzzz",
                    "totally different content here",
                    "another unrelated doc body",
                ],
            }
        )
    )
    out = moss_pairs(docs, "doc_id", "text")
    got = set(zip(out["id_a"], out["id_b"]))
    assert (1, 2) in got  # the guarantee: >= w+k-1 shared must pair
    row = out[(out["id_a"] == 1) & (out["id_b"] == 2)].iloc[0]
    assert row["lcs_len"] >= len(shared)
    assert row["n_shared_fp"] >= 1
    # unrelated docs never pair at the threshold
    for pair in got:
        assert 3 not in pair or 4 not in pair


def test_moss_no_subthreshold_pairs(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.mosspairs import moss_pairs

    # overlapping only on a 5-gram (below w+k-1=8): candidates may
    # form, but verification must reject them
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": [1, 2],
                "text": ["aaaaa" + "qqqqqqqqqq", "aaaaa" + "wwwwwwwwww"],
            }
        )
    )
    out = moss_pairs(docs, "doc_id", "text")
    assert len(out) == 0
