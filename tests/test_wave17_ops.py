"""Wave-17 ops: chi-square contingency, KS distance, set Jaccard,
same-value run histogram, item-item count cosine — vs brute-force
Python references."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(table: dict):
    import ray.data as rd

    return rd.from_arrow(pa.table(table))


def _ts(days):
    base = np.datetime64("2024-03-01", "us")
    return [base + np.timedelta64(int(d) * 86_400_000_000, "us") for d in days]


def test_contingency_chi2_independent_and_skewed():
    from ocr_service_ray.ops.divergence import contingency_chi2

    # perfectly independent 2x2 -> chi2 0
    r = ["a"] * 10 + ["b"] * 10
    c = ([0] * 5 + [1] * 5) * 2
    out = (
        contingency_chi2(_ds({"r": r, "c": c}), "r", "c")
        .set_index("r")
        .sort_index()
    )
    assert set(out["chi2_ppm"]) == {0}
    # brute force on a random table
    rng = np.random.RandomState(4)
    r2 = rng.choice(["x", "y", "z"], 300).tolist()
    c2 = rng.randint(0, 4, 300).tolist()
    out2 = (
        contingency_chi2(_ds({"r": r2, "c": c2}), "r", "c")
        .set_index("r")
        .sort_index()
    )
    df = pd.DataFrame({"r": r2, "c": c2})
    n = len(df)
    col_tot = df.groupby("c").size()
    for key, sub in df.groupby("r"):
        rr = len(sub)
        chi = 0
        for cv in col_tot.index:
            o = int((sub["c"] == cv).sum())
            cc = int(col_tot[cv])
            chi += (1_000_000 * (o * n - rr * cc) ** 2) // (n * rr * cc)
        assert out2.loc[key, "chi2_ppm"] == chi
        assert out2.loc[key, "n_rows"] == rr


def test_ks_distance_brute_force():
    from ocr_service_ray.ops.divergence import ks_distance_by_group

    rng = np.random.RandomState(8)
    g = rng.choice(["p", "q"], 400).tolist()
    # shift q's distribution so KS is clearly nonzero
    v = [int(rng.randint(0, 20)) + (5 if x == "q" else 0) for x in g]
    out = (
        ks_distance_by_group(_ds({"g": g, "v": v}), "g", "v")
        .set_index("g")
        .sort_index()
    )
    df = pd.DataFrame({"g": g, "v": v})
    n = len(df)
    vals = sorted(df["v"].unique())
    for key, sub in df.groupby("g"):
        ng = len(sub)
        best = 0
        for x in vals:
            cg = int((sub["v"] <= x).sum())
            ca = int((df["v"] <= x).sum())
            best = max(best, abs(cg * n - ng * ca))
        assert out.loc[key, "ks_ppm"] == (1_000_000 * best) // (ng * n)
    # identical distributions -> 0
    same = ks_distance_by_group(
        _ds({"g": ["a", "a", "b", "b"], "v": [1, 2, 1, 2]}), "g", "v"
    )
    assert set(same["ks_ppm"]) == {0}


def test_group_set_jaccard_exact_sets():
    from ocr_service_ray.ops.similarity import group_set_jaccard

    # A={1,2,3}, B={2,3,4}, C={9} (disjoint -> omitted)
    g = ["A", "A", "A", "A", "B", "B", "B", "C"]
    v = [1, 2, 3, 2, 2, 3, 4, 9]
    out = group_set_jaccard(_ds({"g": g, "v": v}), "g", "v")
    out = out.set_index(["group_a", "group_b"])
    assert out.loc[("A", "B"), "n_inter"] == 2
    assert out.loc[("A", "B"), "jac_ppm"] == 500_000  # 2/4
    assert len(out) == 1  # C pairs omitted (no shared values)


def test_run_length_histogram_with_tiebreak():
    from ocr_service_ray.ops.retention import run_length_histogram

    # u1: types a,a,a,b ordered by (ts, id) -> run 3
    # u2: same timestamps, order decided by event_id -> a,b,a -> run 1
    ts = _ts([0, 0, 1, 2] + [5, 5, 5])
    ids = [1, 2, 3, 4] + [2, 1, 3]
    users = [1, 1, 1, 1, 2, 2, 2]
    types = ["a", "a", "a", "b", "b", "a", "a"]
    out = (
        run_length_histogram(
            _ds(
                {
                    "user_id": users,
                    "event_type": types,
                    "ts": ts,
                    "event_id": ids,
                }
            )
        )
        .to_pandas()
        .set_index("run_len")
    )
    # u2 ordered by id: (1,'a'), (2,'b'), (3,'a') -> max run 1... wait
    # types by POSITION are [b, a, a] for ids [2, 1, 3]; ordered by id:
    # id1->'a', id2->'b', id3->'a' -> runs a|b|a -> 1
    assert out.loc[3, "n_keys"] == 1
    assert out.loc[1, "n_keys"] == 1


def test_run_length_histogram_brute_force():
    from ocr_service_ray.ops.retention import run_length_histogram

    rng = np.random.RandomState(12)
    n = 300
    users = rng.randint(0, 10, n)
    days = rng.randint(0, 30, n)
    types = rng.choice(["x", "y"], n)
    ids = np.arange(n)
    out = (
        run_length_histogram(
            _ds(
                {
                    "user_id": users,
                    "event_type": types,
                    "ts": _ts(days),
                    "event_id": ids,
                }
            )
        )
        .to_pandas()
        .set_index("run_len")["n_keys"]
        .to_dict()
    )
    expect: dict = {}
    df = pd.DataFrame(
        {"u": users, "d": days, "t": types, "i": ids}
    ).sort_values(["u", "d", "i"])
    for _, sub in df.groupby("u"):
        tv = sub["t"].to_numpy()
        best = run = 1
        for a, b in zip(tv, tv[1:]):
            run = run + 1 if a == b else 1
            best = max(best, run)
        expect[best] = expect.get(best, 0) + 1
    assert out == expect


def test_pair_count_cosine_matches_numpy():
    from ocr_service_ray.ops.lift import pair_count_cosine

    rng = np.random.RandomState(3)
    items = rng.choice(["i1", "i2", "i3"], 500).tolist()
    members = rng.randint(0, 40, 500).tolist()
    out = pair_count_cosine(
        _ds({"it": items, "m": members}), "it", "m"
    ).set_index(["item_a", "item_b"])
    df = pd.DataFrame({"it": items, "m": members})
    mat = df.pivot_table(index="it", columns="m", aggfunc="size", fill_value=0)
    for (a, b), row in out.iterrows():
        va = mat.loc[a].to_numpy(dtype=np.int64)
        vb = mat.loc[b].to_numpy(dtype=np.int64)
        dot = int(va @ vb)
        na, nb = int(va @ va), int(vb @ vb)
        assert row["cos2_ppm"] == (1_000_000 * dot * dot) // (na * nb)
        assert row["n_members_both"] == int(((va > 0) & (vb > 0)).sum())
    assert len(out) == 3  # all unordered pairs co-occur here
