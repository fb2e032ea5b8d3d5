"""Wave-158 ops: winnowing — the match guarantee, density bounds,
brute parity, boundary cases."""

import numpy as np
import pyarrow as pa

from ocr_service_ray.ops.winnow import winnow_select


def _brute(s, k=5, w=4):
    import hashlib

    grams = [s[i : i + k] for i in range(max(len(s) - k + 1, 0))]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
    sel = set()
    for j in range(max(len(hs) - w + 1, 0)):
        cand = [(hs[i], i) for i in range(j, j + w)]
        sel.add(min(cand)[1])
    return sorted(sel)


def test_short_strings():
    assert winnow_select("") == (0, [], [])
    assert winnow_select("abcd") == (0, [], [])  # shorter than k
    n, pos, hs = winnow_select("abcde")  # one gram, no full window
    assert n == 1 and pos == []


def test_single_window():
    # 8 chars -> 4 grams -> exactly one window selects one position
    n, pos, hs = winnow_select("abcdefgh")
    assert n == 4 and len(pos) == 1


def test_random_vs_brute():
    rng = np.random.RandomState(158)
    for _ in range(60):
        ln = int(rng.randint(0, 50))
        s = "".join(rng.choice(list("abcя")) for _ in range(ln))
        n, pos, hs = winnow_select(s)
        assert pos == _brute(s)


def test_winnowing_match_guarantee():
    """Docs sharing a substring of length >= w + k - 1 = 8 must
    share at least one selected fingerprint HASH."""
    rng = np.random.RandomState(8)
    for _ in range(20):
        shared = "".join(rng.choice(list("xyz")) for _ in range(12))
        a = "".join(rng.choice(list("ab")) for _ in range(15)) + shared
        b = shared + "".join(rng.choice(list("cd")) for _ in range(15))
        _, _, ha = winnow_select(a)
        _, _, hb = winnow_select(b)
        assert set(ha) & set(hb)


def test_density_is_sublinear():
    s = "".join(
        np.random.RandomState(3).choice(list("abcdefgh"))
        for _ in range(48)
    )
    n, pos, _ = winnow_select(s)
    # winnowing stores far fewer than all grams (expected ~2/(w+1))
    assert len(pos) < n


def test_dataset_pass(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.winnow import winnow_docs

    out = (
        winnow_docs(
            rd.from_arrow(
                pa.table({"doc_id": [1, 2], "text": ["abcdefghij", ""]})
            ),
            "doc_id",
            "text",
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.loc[0, "n_grams"] == 6
    assert out.loc[0, "n_selected"] >= 1
    assert list(out.loc[1, ["n_grams", "n_selected", "density_ppm", "min_fp"]]) == [
        0, 0, 0, 0,
    ]
