"""Wave-178 ops: Bron-Kerbosch clique census — closed forms, brute
subset-enumeration parity."""

import itertools

import numpy as np
import pandas as pd

from ocr_service_ray.ops.clique import bron_kerbosch, clique_report


def _df(pairs):
    return pd.DataFrame(
        {"src": [a for a, _ in pairs], "dst": [b for _, b in pairs]}
    )


def _brute(pairs):
    nodes = sorted({x for p in pairs for x in p})
    eset = {(min(a, b), max(a, b)) for a, b in pairs}
    cliques = []
    for r in range(1, len(nodes) + 1):
        for sub in itertools.combinations(nodes, r):
            if all(
                (min(u, v), max(u, v)) in eset
                for u, v in itertools.combinations(sub, 2)
            ):
                cliques.append(set(sub))
    maximal = [
        c
        for c in cliques
        if not any(c < d for d in cliques)
    ]
    w = max(len(c) for c in cliques)
    return w, sum(1 for c in cliques if len(c) == w), len(maximal)


def test_bowtie():
    out = clique_report(_df([(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (2, 4)]))
    assert out.loc[0, "clique_number"] == 3
    assert out.loc[0, "n_maximum"] == 2
    assert out.loc[0, "n_maximal"] == 2


def test_k4_plus_pendant():
    k4 = list(itertools.combinations(range(4), 2))
    out = clique_report(_df(k4 + [(3, 9)]))
    assert out.loc[0, "clique_number"] == 4
    assert out.loc[0, "n_maximum"] == 1
    assert out.loc[0, "n_maximal"] == 2  # K4 and {3,9}


def test_triangle_free_bipartite():
    out = clique_report(_df([(0, 10), (0, 11), (1, 10), (1, 11)]))
    assert out.loc[0, "clique_number"] == 2
    assert out.loc[0, "n_maximum"] == 4
    assert out.loc[0, "n_maximal"] == 4


def test_random_vs_brute():
    rng = np.random.RandomState(178)
    for _ in range(12):
        m = int(rng.randint(3, 22))
        src = rng.randint(0, 8, m)
        dst = rng.randint(0, 8, m)
        keep = src != dst
        pairs = sorted(
            {(min(int(a), int(b)), max(int(a), int(b)))
             for a, b in zip(src[keep], dst[keep])}
        )
        if not pairs:
            continue
        out = clique_report(_df(pairs))
        w, nmax, nmaxl = _brute(pairs)
        assert out.loc[0, "clique_number"] == w
        assert out.loc[0, "n_maximum"] == nmax
        assert out.loc[0, "n_maximal"] == nmaxl
        # BK cliques are all genuinely maximal and pairwise distinct
        adj = {}
        for a, b in pairs:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        cl = bron_kerbosch(adj)
        assert len(set(cl)) == len(cl)
