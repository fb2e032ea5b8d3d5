"""Wave-160 ops: Kuhn bipartite matching + König — closed forms,
validity, random duality parity."""

import numpy as np
import pandas as pd

from ocr_service_ray.ops.bipartite import (
    kuhn_matching,
    matching_report,
    min_vertex_cover_size,
)


def _df(pairs):
    return pd.DataFrame({"l": [a for a, _ in pairs], "r": [b for _, b in pairs]})


def test_perfect_matching():
    e = _df([(0, 10), (1, 11), (2, 12)])
    out = matching_report(e, "l", "r")
    assert out.loc[0, "matching_size"] == 3
    assert out.loc[0, "min_cover_size"] == 3


def test_star_contention():
    # three left nodes all want the single right node: matching 1
    e = _df([(0, 10), (1, 10), (2, 10)])
    out = matching_report(e, "l", "r")
    assert out.loc[0, "matching_size"] == 1


def test_augmenting_path_needed():
    # greedy 0->10 then 1 stuck unless 0 re-routes to 11
    e = _df([(0, 10), (0, 11), (1, 10)])
    match, _, _ = kuhn_matching(e, "l", "r")
    assert len(match) == 2
    # validity: matched pairs are real edges, no right node reused
    pairs = set(zip(e["l"], e["r"]))
    assert all((u, v) in pairs for u, v in match.items())
    assert len(set(match.values())) == len(match)


def test_random_konig_duality():
    rng = np.random.RandomState(160)
    for _ in range(25):
        nl, nr = int(rng.randint(1, 9)), int(rng.randint(1, 9))
        pairs = {
            (int(a), 100 + int(b))
            for a, b in zip(
                rng.randint(0, nl, 20), rng.randint(0, nr, 20)
            )
        }
        e = _df(sorted(pairs))
        match, _, _ = kuhn_matching(e, "l", "r")
        cover = min_vertex_cover_size(e, "l", "r")
        assert len(match) == cover
        # matching validity
        assert all((u, v) in pairs for u, v in match.items())
        assert len(set(match.values())) == len(match)
        assert len(set(match.keys())) == len(match)
