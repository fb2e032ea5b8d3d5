"""Wave-119 ops: Gale-Shapley — stability invariant, proposer-
optimality vs brute-force enumeration, unequal sides, row-order
invariance."""

import itertools

import numpy as np
import pandas as pd


def _pairs(rng, props, accs, max_score=50):
    rows = []
    for p in props:
        for a in accs:
            if rng.rand() < 0.8:  # some pairs missing -> score 0
                rows.append({"p": p, "a": a, "s": int(rng.randint(0, max_score))})
            else:
                rows.append({"p": p, "a": a, "s": 0})
    return pd.DataFrame(rows)


def _all_stable(pairs):
    """Brute force: enumerate all perfect-ish matchings, keep stable."""
    from ocr_service_ray.ops.matching import is_stable

    props = sorted(pairs["p"].unique())
    accs = sorted(pairs["a"].unique())
    score = {(r.p, r.a): r.s for r in pairs.itertuples()}
    out = []
    k = min(len(props), len(accs))
    for chosen in itertools.permutations(accs, k):
        m = pd.DataFrame(
            {
                "p": props[:k],
                "a": list(chosen),
                "pair_score": [score.get((p, a), 0) for p, a in zip(props[:k], chosen)],
                "n_proposals": 0,
            }
        )
        if is_stable(m, pairs, "p", "a", "s"):
            out.append(dict(zip(m["p"], m["a"])))
    return out


def test_gs_stability_random():
    from ocr_service_ray.ops.matching import is_stable, stable_match

    rng = np.random.RandomState(119)
    for n in (4, 6, 8):
        pairs = _pairs(rng, [f"p{i}" for i in range(n)], [f"a{i}" for i in range(n)])
        out = stable_match(pairs, "p", "a", "s")
        assert len(out) == n  # complete lists -> perfect matching
        assert is_stable(out, pairs, "p", "a", "s")


def test_gs_proposer_optimal_vs_enumeration():
    from ocr_service_ray.ops.matching import stable_match

    rng = np.random.RandomState(7)
    pairs = _pairs(rng, ["p0", "p1", "p2", "p3"], ["a0", "a1", "a2", "a3"])
    out = stable_match(pairs, "p", "a", "s")
    got = dict(zip(out["p"], out["a"]))
    stables = _all_stable(pairs)
    assert got in stables
    # proposer-optimality: each proposer does at least as well as in
    # ANY stable matching (score desc, acceptor asc preference)
    score = {(r.p, r.a): r.s for r in pairs.itertuples()}

    def rank_key(p, a):
        return (-score.get((p, a), 0), a)

    for other in stables:
        for p, a_got in got.items():
            assert rank_key(p, a_got) <= rank_key(p, other[p])


def test_gs_unequal_sides():
    from ocr_service_ray.ops.matching import is_stable, stable_match

    rng = np.random.RandomState(3)
    # more proposers than acceptors: exactly |A| matched
    pairs = _pairs(rng, [f"p{i}" for i in range(5)], ["a0", "a1", "a2"])
    out = stable_match(pairs, "p", "a", "s")
    assert len(out) == 3
    assert is_stable(out, pairs, "p", "a", "s")


def test_gs_row_order_invariance():
    from ocr_service_ray.ops.matching import stable_match

    rng = np.random.RandomState(11)
    pairs = _pairs(rng, [f"p{i}" for i in range(6)], [f"a{i}" for i in range(6)])
    base = stable_match(pairs, "p", "a", "s")
    shuf = pairs.sample(frac=1.0, random_state=1).reset_index(drop=True)
    pd.testing.assert_frame_equal(base, stable_match(shuf, "p", "a", "s"))
