"""Wave-16 ops: Gini concentration, activity-streak histogram, hapax
rate, centroid cosine pairs, two-proportion z^2 — vs brute-force
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


def test_grouped_gini_uniform_and_extreme():
    from ocr_service_ray.ops.divergence import grouped_gini

    # group u: 4 members x 5 rows each -> gini 0; group s: member 0
    # has 9 rows, member 1 has 1 row -> gini = (2*(1*1+2*9) - 3*10)
    # / (2*10) = 8/20 = 0.4
    g = ["u"] * 20 + ["s"] * 10
    m = [i % 4 for i in range(20)] + [0] * 9 + [1]
    out = (
        grouped_gini(_ds({"g": g, "m": m}), "g", "m")
        .to_pandas()
        .set_index("g")
        .sort_index()
    )
    assert out.loc["u", "gini_ppm"] == 0
    assert out.loc["u", "n_members"] == 4
    assert out.loc["s", "gini_ppm"] == 400_000
    assert out.loc["s", "n_rows"] == 10


def test_grouped_gini_brute_force_random():
    from ocr_service_ray.ops.divergence import grouped_gini

    rng = np.random.RandomState(5)
    g = rng.choice(["a", "b"], 400).tolist()
    m = rng.randint(0, 25, 400).tolist()
    out = (
        grouped_gini(_ds({"g": g, "m": m}), "g", "m")
        .to_pandas()
        .set_index("g")
    )
    df = pd.DataFrame({"g": g, "m": m})
    for key, sub in df.groupby("g"):
        c = sorted(sub.groupby("m").size().tolist())
        n, s0 = len(c), sum(c)
        s1 = sum((i + 1) * v for i, v in enumerate(c))
        assert out.loc[key, "gini_ppm"] == (
            1_000_000 * (2 * s1 - (n + 1) * s0)
        ) // (n * s0)


def test_streak_histogram_islands():
    from ocr_service_ray.ops.retention import streak_histogram

    # u1: days 0,1,2,5 -> streak 3; u2: 0,2,4 -> 1; u3: 7 -> 1;
    # duplicates within a day must not inflate runs
    days = [0, 1, 1, 2, 5] + [0, 2, 4] + [7]
    users = [1] * 5 + [2] * 3 + [3]
    out = (
        streak_histogram(_ds({"user_id": users, "ts": _ts(days)}))
        .to_pandas()
        .set_index("streak_len")
        .sort_index()
    )
    assert out.loc[3, "n_keys"] == 1
    assert out.loc[1, "n_keys"] == 2
    assert len(out) == 2


def test_streak_histogram_brute_force_random():
    from ocr_service_ray.ops.retention import streak_histogram

    rng = np.random.RandomState(9)
    users = rng.randint(0, 15, 300)
    days = rng.randint(0, 12, 300)
    out = (
        streak_histogram(_ds({"user_id": users, "ts": _ts(days)}))
        .to_pandas()
        .set_index("streak_len")["n_keys"]
        .to_dict()
    )
    expect: dict = {}
    for u in np.unique(users):
        d = np.unique(days[users == u])
        best = run = 1
        for a, b in zip(d, d[1:]):
            run = run + 1 if b - a == 1 else 1
            best = max(best, run)
        expect[best] = expect.get(best, 0) + 1
    assert out == expect


def test_hapax_by_group_brute_force():
    from ocr_service_ray.ops.text import hapax_by_group

    texts = {
        "s1": ["aa bb aa", "cc dd", ""],
        "s2": ["bb bb ee", "ff gg gg"],
    }
    rows_g, rows_t = [], []
    for g, ts in texts.items():
        for t in ts:
            rows_g.append(g)
            rows_t.append(t)
    out = (
        hapax_by_group(_ds({"source": rows_g, "text": rows_t}))
        .set_index("source")
        .sort_index()
    )
    # corpus counts: aa2 bb3 cc1 dd1 ee1 ff1 gg2 -> hapax {cc,dd}(s1),
    # {ee,ff}(s2); tokens: s1=5, s2=6
    assert out.loc["s1", "n_tokens"] == 5
    assert out.loc["s1", "n_hapax"] == 2
    assert out.loc["s1", "hapax_ppm"] == 400_000
    assert out.loc["s2", "n_tokens"] == 6
    assert out.loc["s2", "n_hapax"] == 2
    assert out.loc["s2", "hapax_ppm"] == 333_333


def test_centroid_cosine_pairs_known_geometry():
    from ocr_service_ray.ops.vector import centroid_cosine_pairs

    # label 0 mean -> (1, 0); label 1 mean -> (0, 1); label 2 -> (-1, 0)
    emb = [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [-1.0, 0.0]]
    lab = [0, 0, 1, 2]
    out = centroid_cosine_pairs(
        _ds({"label": lab, "embedding": emb}), "label"
    ).set_index(["group_a", "group_b"])
    assert out.loc[(0, 1), "cos2_ppm"] == 0
    assert out.loc[(0, 2), "cos2_ppm"] == -1_000_000
    assert out.loc[(1, 2), "cos2_ppm"] == 0


def test_centroid_cosine_pairs_matches_numpy():
    from ocr_service_ray.ops.vector import centroid_cosine_pairs

    rng = np.random.RandomState(2)
    emb = rng.randn(120, 8).astype(np.float32)
    lab = rng.randint(0, 4, 120)
    out = centroid_cosine_pairs(
        _ds({"label": lab.tolist(), "embedding": emb.tolist()}), "label"
    )
    q = np.floor(emb.astype(np.float64) * 1e6 + 0.5)
    for _, r in out.iterrows():
        a = q[lab == r["group_a"]].sum(axis=0)
        b = q[lab == r["group_b"]].sum(axis=0)
        cos = float(a @ b) / np.sqrt((a @ a) * (b @ b))
        got = r["cos2_ppm"] / 1e6
        assert abs(abs(got) - cos * cos) < 1e-5
        assert (got >= 0) == (cos >= 0)


def test_grouped_rate_ztest_brute_force():
    from ocr_service_ray.ops.stats import grouped_rate_ztest

    rng = np.random.RandomState(7)
    g = rng.choice(["a", "b", "c"], 500).tolist()
    f = rng.binomial(1, [0.2 if x == "a" else 0.6 for x in g]).tolist()
    out = (
        grouped_rate_ztest(_ds({"g": g, "f": f}), "g", "f")
        .set_index("g")
        .sort_index()
    )
    df = pd.DataFrame({"g": g, "f": f})
    N, K = len(df), int(df["f"].sum())
    for key, sub in df.groupby("g"):
        n1, k1 = len(sub), int(sub["f"].sum())
        n2, k2 = N - n1, K - k1
        num = k1 * n2 - k2 * n1
        z2 = (1_000_000 * num * num * N) // (n1 * n2 * K * (N - K))
        expect = z2 if num >= 0 else -z2
        assert out.loc[key, "z2_ppm"] == expect
        # float sanity vs the classic pooled z
        p1, p2, p = k1 / n1, k2 / n2, K / N
        z = (p1 - p2) / np.sqrt(p * (1 - p) * (1 / n1 + 1 / n2))
        assert abs(abs(out.loc[key, "z2_ppm"]) / 1e6 - z * z) < 1e-4
    # "a" is deflated, "b"/"c" inflated -> signs
    assert out.loc["a", "z2_ppm"] < 0
    assert out.loc["b", "z2_ppm"] > 0


def test_grouped_rate_ztest_degenerate_flag():
    from ocr_service_ray.ops.stats import grouped_rate_ztest

    out = grouped_rate_ztest(
        _ds({"g": ["a", "a", "b"], "f": [0, 0, 0]}), "g", "f"
    )
    assert set(out["z2_ppm"]) == {0}


def test_hapax_by_group_trigrams_and_empty():
    from ocr_service_ray.ops.text import hapax_by_group

    # trigram shingles: "a b c d" -> {a b c, b c d}; "a b c" -> {a b c}
    out = hapax_by_group(
        _ds({"source": ["s1", "s2"], "text": ["a b c d", "a b c"]}),
        ngram=3,
    ).set_index("source")
    # corpus: "a b c" x2 (not hapax), "b c d" x1 (hapax, s1)
    assert out.loc["s1", "n_tokens"] == 2
    assert out.loc["s1", "n_hapax"] == 1
    assert out.loc["s2", "n_tokens"] == 1
    assert out.loc["s2", "n_hapax"] == 0
    # no-hapax corpus: empty hapax frame must not break the merge
    none = hapax_by_group(
        _ds({"source": ["a", "b"], "text": ["x x", "x x"]})
    ).set_index("source")
    assert set(none["n_hapax"]) == {0}
    assert set(none["hapax_ppm"]) == {0}
