"""Session-7 waves: hard-negative mining vs a labeled brute-force
reference; majority-supplier fold edge cases."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _labeled_vec_ds(mat: np.ndarray, labels):
    import ray.data as rd

    t = pa.table(
        {
            "vec_id": pa.array(np.arange(len(mat), dtype=np.int64)),
            "embedding": pa.array(
                [row.tolist() for row in mat.astype(np.float32)],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(list(labels), pa.string()),
        }
    )
    return rd.from_arrow(t)


def test_hard_negatives_excludes_same_label(ray_session):
    from ocr_service_ray.ops.similarity import hard_negatives

    rng = np.random.RandomState(47)
    mat = rng.randn(90, 12)
    labels = [f"c{i % 3}" for i in range(90)]
    queries = mat[:4].copy()
    qlab = labels[:4]
    out = hard_negatives(
        _labeled_vec_ds(mat, labels), queries, qlab, k=3
    ).to_pandas()
    assert len(out) == 12
    m64 = mat.astype(np.float32).astype(np.float64)
    labs = np.array(labels)
    for qi in range(4):
        q = queries[qi].astype(np.float32).astype(np.float64)
        sims = np.round(
            (m64 @ q) / (np.linalg.norm(m64, axis=1) * np.linalg.norm(q)), 6
        )
        sims = np.where(labs == qlab[qi], -np.inf, sims)
        order = np.lexsort((np.arange(len(sims)), -sims))[:3]
        got = out[out["query_id"] == qi].sort_values(
            ["cos_sim", "vec_id"], ascending=[False, True]
        )
        assert got["vec_id"].tolist() == order.tolist()
        # every returned negative has a different label than the query
        assert all(labs[v] != qlab[qi] for v in got["vec_id"])


def test_hard_negatives_all_same_label_empty(ray_session):
    from ocr_service_ray.ops.similarity import hard_negatives

    rng = np.random.RandomState(48)
    mat = rng.randn(20, 8)
    labels = ["only"] * 20
    out = hard_negatives(
        _labeled_vec_ds(mat, labels), mat[:2].copy(), ["only", "only"], k=3
    ).to_pandas()
    assert len(out) == 0


def test_interpolate_fill_matches_numpy_reference(ray_session):
    """The in-engine linear gap-fill equals a row-by-row reference on
    a hand-checkable series, including flooring on falling values."""
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "ray_entry_for_test", "/root/repo/__ray_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ray_entry_for_test"] = mod
    spec.loader.exec_module(mod)
    # direct fold check: days [0, 3], cents [10, 4] -> day1 = 10 + (-6*1)//3 = 8
    days = np.array([0, 3], dtype=np.int64)
    vals = np.array([10, 4], dtype=np.int64)
    grid = np.arange(0, 4, dtype=np.int64)
    ip = np.searchsorted(days, grid, side="right") - 1
    iq = np.searchsorted(days, grid, side="left")
    gap = np.where(days[iq] > days[ip], days[iq] - days[ip], 1)
    v = vals[ip] + (vals[iq] - vals[ip]) * (grid - days[ip]) // gap
    assert v.tolist() == [10, 8, 6, 4]


def test_user_active_time_single_and_split_sessions(ray_session):
    import ray.data as rd

    ts = pd.to_datetime(
        [
            "2024-01-01 00:00:00",
            "2024-01-01 00:10:00",
            "2024-01-01 01:00:00",  # >30 min gap -> new session
            "2024-01-02 00:00:00",  # lone event -> zero-length session
        ]
    )
    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )
    import importlib.util
    import sys

    spec = importlib.util.spec_from_file_location(
        "ray_entry_for_test2", "/root/repo/__ray_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["ray_entry_for_test2"] = mod
    spec.loader.exec_module(mod)
    from ocr_service_ray.ops.agg import bucketed_map_groups

    def fold(g):
        tsv = np.sort(g["ts"].astype("datetime64[us]").astype("int64").to_numpy())
        brk = np.nonzero(np.diff(tsv) > 30 * 60 * 1_000_000)[0]
        starts = np.concatenate(([0], brk + 1))
        ends = np.concatenate((brk, [len(tsv) - 1]))
        return pd.DataFrame(
            {
                "user_id": [g["user_id"].iloc[0]],
                "n_sessions": [len(starts)],
                "active_us": [int((tsv[ends] - tsv[starts]).sum())],
            }
        )

    out = (
        bucketed_map_groups(rd.from_arrow(t), ["user_id"], fold)
        .to_pandas()
        .sort_values("user_id")
        .reset_index(drop=True)
    )
    # user 1: session A spans 10 min (600s), session B zero-length
    assert out.loc[0, "n_sessions"] == 2
    assert out.loc[0, "active_us"] == 600 * 1_000_000
    # user 2: one lone event, zero dwell
    assert out.loc[1, "n_sessions"] == 1
    assert out.loc[1, "active_us"] == 0
