"""Wave-4 curation ops: triangle counting, token chunking, cohort
retention, cumulative distinct, Pareto frontier, grouped comoments —
each vs a brute-force / pandas reference."""

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(table: dict):
    import ray.data as rd

    return rd.from_arrow(pa.table(table))


# ---------------------------------------------------------------- triangles


def _tri_oracle(pairs):
    adj = {}
    edges = set()
    for a, b in pairs:
        if a == b:
            continue
        lo, hi = min(a, b), max(a, b)
        if (lo, hi) in edges:
            continue
        edges.add((lo, hi))
        adj.setdefault(lo, set()).add(hi)
        adj.setdefault(hi, set()).add(lo)
    tri = sum(
        1
        for a, b, c in itertools.combinations(sorted(adj), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    return len(adj), len(edges), tri


@pytest.mark.parametrize(
    "pairs",
    [
        [(1, 2), (2, 3), (1, 3)],  # one triangle
        [(1, 2), (2, 3), (3, 4)],  # path, zero triangles
        [(1, 2), (2, 1), (1, 2), (1, 1)],  # dupes + reversed + self-loop
        [(a, b) for a, b in itertools.combinations(range(7), 2)],  # K7
    ],
)
def test_triangle_count_small(ray_session, pairs):
    from ocr_service_ray.ops.triangles import triangle_count

    ds = _ds(
        {"src": [p[0] for p in pairs], "dst": [p[1] for p in pairs]}
    )
    out = triangle_count(ds)
    n, m, t = _tri_oracle(pairs)
    assert out.iloc[0].tolist() == [n, m, t]


def test_triangle_count_random(ray_session):
    from ocr_service_ray.ops.triangles import triangle_count

    rng = np.random.RandomState(7)
    src = rng.randint(0, 40, 400)
    dst = rng.randint(0, 40, 400)
    keep = src != dst
    pairs = list(zip(src[keep].tolist(), dst[keep].tolist()))
    out = triangle_count(_ds({"src": [p[0] for p in pairs], "dst": [p[1] for p in pairs]}))
    assert out.iloc[0].tolist() == list(_tri_oracle(pairs))


# ----------------------------------------------------------------- chunking


def _chunk_oracle(texts, size, stride):
    rows = []
    for i, t in enumerate(texts):
        toks = t.split(" ")
        for ci, s in enumerate(range(0, len(toks), stride)):
            w = toks[s : s + size]
            rows.append((i, ci, len(w), " ".join(w)))
    return rows


@pytest.mark.parametrize("size,stride", [(4, 3), (5, 5), (3, 1)])
def test_chunk_tokens(ray_session, size, stride):
    from ocr_service_ray.ops.chunking import chunk_tokens

    texts = [
        "a b c d e f g h i j",
        "one",
        "",  # empty text is one 1-token chunk (count(' ')+1 semantics)
        "x " * 7 + "end",  # trailing-space artifacts stay exact
    ]
    out = (
        chunk_tokens(
            _ds({"doc_id": list(range(len(texts))), "text": texts}),
            chunk_size=size,
            stride=stride,
        )
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )
    expect = _chunk_oracle(texts, size, stride)
    got = list(
        zip(out["doc_id"], out["chunk_idx"], out["n_chunk_tokens"], out["chunk_text"])
    )
    assert got == expect


def test_chunk_tokens_rejects_bad_args(ray_session):
    from ocr_service_ray.ops.chunking import chunk_tokens

    with pytest.raises(ValueError):
        chunk_tokens(_ds({"doc_id": [1], "text": ["a"]}), stride=0)


# ---------------------------------------------------------------- retention


def test_cohort_retention_daily(ray_session):
    from ocr_service_ray.ops.retention import cohort_retention

    ts = pd.to_datetime(
        [
            "2024-01-01 05:00", "2024-01-01 09:00", "2024-01-03 01:00",  # u1
            "2024-01-02 00:00", "2024-01-02 23:59",                       # u2
            "2024-01-01 00:00", "2024-02-05 12:00",                       # u3
        ]
    )
    users = [1, 1, 1, 2, 2, 3, 3]
    out = (
        cohort_retention(_ds({"user_id": users, "ts": pa.array(ts)}), period="day")
        .to_pandas()
        .sort_values(["cohort_period", "offset_periods"])
        .reset_index(drop=True)
    )
    d0 = pd.Timestamp("2024-01-01").value // 86_400_000_000_000
    expect = pd.DataFrame(
        {
            "cohort_period": [d0, d0, d0, d0 + 1],
            "offset_periods": [0, 2, 35, 0],
            "n_users": [2, 1, 1, 1],
        }
    )
    pd.testing.assert_frame_equal(
        out.astype("int64"), expect.astype("int64"), check_like=True
    )


def test_cumulative_distinct(ray_session):
    from ocr_service_ray.ops.retention import cumulative_distinct

    df = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4, 5, 6],
            "user_id": [1, 1, 1, 1, 2, 2],
            "ts": pd.to_datetime(
                ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04",
                 "2024-01-01", "2024-01-02"]
            ),
            "event_type": ["a", "b", "a", "c", "x", "x"],
        }
    )
    out = (
        cumulative_distinct(_ds(df.to_dict("list")))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert out["n_distinct_cum"].tolist() == [1, 2, 2, 3, 1, 1]


# ----------------------------------------------------------------- frontier


def _dominated(df, i, min_col, max_col):
    r = df.iloc[i]
    for j in range(len(df)):
        if j == i:
            continue
        s = df.iloc[j]
        if (
            s[min_col] <= r[min_col]
            and s[max_col] >= r[max_col]
            and (s[min_col] < r[min_col] or s[max_col] > r[max_col])
        ):
            return True
    return False


def test_pareto_frontier_matches_brute_force(ray_session):
    from ocr_service_ray.ops.frontier import pareto_frontier

    rng = np.random.RandomState(3)
    df = pd.DataFrame(
        {
            "k": np.arange(300),
            "price": rng.randint(0, 50, 300).astype(float),
            "quality": rng.randint(0, 50, 300),
        }
    )
    # inject exact duplicates — ties dominate neither way, both survive
    df.loc[298, ["price", "quality"]] = df.loc[299, ["price", "quality"]].to_numpy()
    out = pareto_frontier(_ds(df.to_dict("list")), "price", "quality")
    expect = {i for i in range(len(df)) if not _dominated(df, i, "price", "quality")}
    assert set(out["k"]) == {df.iloc[i]["k"] for i in expect}


# ------------------------------------------------------------------ moments


def test_grouped_comoments(ray_session):
    from ocr_service_ray.ops.stats import grouped_comoments

    df = pd.DataFrame(
        {
            "g": ["a", "a", "b", "b", "b"],
            "x": [1, 2, 3, 4, 5],
            "y": [10, 20, 30, 40, 50],
        }
    )
    out = (
        grouped_comoments(_ds(df.to_dict("list")), ["g"], "x", "y")
        .to_pandas()
        .set_index("g")
        .sort_index()
    )
    for g, sub in df.groupby("g"):
        x, y = sub["x"].to_numpy(), sub["y"].to_numpy()
        row = out.loc[g]
        assert row["n"] == len(sub)
        assert row["sum_x"] == x.sum() and row["sum_y"] == y.sum()
        assert row["sum_xx"] == (x * x).sum()
        assert row["sum_yy"] == (y * y).sum()
        assert row["sum_xy"] == (x * y).sum()


def test_grouped_comoments_null_pairwise_deletion(ray_session):
    from ocr_service_ray.ops.stats import grouped_comoments

    t = pa.table(
        {
            "g": ["a", "a", "a"],
            "x": pa.array([1, None, 3], type=pa.int64()),
            "y": pa.array([10, 20, None], type=pa.int64()),
        }
    )
    import ray.data as rd

    out = grouped_comoments(rd.from_arrow(t), ["g"], "x", "y").to_pandas()
    # only the (1, 10) row survives
    assert out.iloc[0][["n", "sum_x", "sum_y", "sum_xy"]].tolist() == [1, 1, 10, 10]
