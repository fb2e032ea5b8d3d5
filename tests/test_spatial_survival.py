"""Wave-92: grid-blocked L-inf spatial self-join + Kaplan-Meier."""

import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings, strategies as st


def _ds(table: dict):
    import ray.data as rd

    return rd.from_arrow(pa.table(table))


@settings(max_examples=12, deadline=None)
@given(
    pts=st.lists(
        st.tuples(st.integers(-50, 50), st.integers(-50, 50)),
        min_size=1,
        max_size=40,
    ),
    eps=st.integers(1, 25),
)
def test_linf_join_lossless_vs_brute_force(ray_session, pts, eps):
    """The 4-cell replication + min-cell ownership must be LOSSLESS
    and duplicate-free: for any integer point set and eps the result
    equals the naive quadratic join, each pair exactly once."""
    from ocr_service_ray.ops.spatial import linf_self_join

    ids = list(range(len(pts)))
    got = linf_self_join(
        _ds(
            {
                "id": ids,
                "x": [p[0] for p in pts],
                "y": [p[1] for p in pts],
            }
        ),
        "id",
        "x",
        "y",
        eps=eps,
        num_buckets=4,
    ).to_pandas()
    if len(got) == 0:
        got = pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("id_a", "id_b", "linf")}
        )
    got_t = sorted(
        tuple(int(v) for v in row)
        for row in got[["id_a", "id_b", "linf"]].to_numpy()
    )
    expect = []
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            dx = abs(pts[i][0] - pts[j][0])
            dy = abs(pts[i][1] - pts[j][1])
            if dx <= eps and dy <= eps:
                expect.append((i, j, max(dx, dy)))
    assert got_t == sorted(expect)


def test_linf_join_negative_coords_and_cell_edges(ray_session):
    """Floor-division cells: points straddling 0 and exact-eps
    distances (boundary inclusive) pair correctly."""
    from ocr_service_ray.ops.spatial import linf_self_join

    got = linf_self_join(
        _ds({"id": [1, 2, 3], "x": [-5, 0, 5], "y": [-5, 0, 5]}),
        "id",
        "x",
        "y",
        eps=5,
    ).to_pandas()
    got_t = sorted(
        tuple(int(v) for v in row)
        for row in got[["id_a", "id_b", "linf"]].to_numpy()
    )
    assert got_t == [(1, 2, 5), (2, 3, 5)]


@settings(max_examples=15, deadline=None)
@given(
    subjects=st.lists(
        st.tuples(st.integers(0, 20), st.integers(0, 1)),
        min_size=1,
        max_size=60,
    )
)
def test_kaplan_meier_matches_direct_recurrence(ray_session, subjects):
    """KM from the distributed value-counts path equals the direct
    per-subject recurrence (sorted event times, floored-ppm product),
    and the curve is nonincreasing from <= 1e6."""
    from ocr_service_ray.ops.survival import kaplan_meier

    got = kaplan_meier(
        _ds(
            {
                "t": [s[0] for s in subjects],
                "d": [s[1] for s in subjects],
            }
        ),
        "t",
        "d",
    )
    ts = np.array([s[0] for s in subjects])
    ds_ = np.array([s[1] for s in subjects])
    s_ppm = 1_000_000
    expect = []
    for t in sorted(set(ts[ds_ == 1])):
        n_risk = int((ts >= t).sum())
        d = int(((ts == t) & (ds_ == 1)).sum())
        s_ppm = (s_ppm * (n_risk - d)) // n_risk
        expect.append((t, n_risk, d, s_ppm))
    got_t = [
        tuple(int(v) for v in row)
        for row in got[["t", "n_risk", "n_events", "surv_ppm"]].to_numpy()
    ]
    assert got_t == expect
    surv = got["surv_ppm"].to_numpy()
    if len(surv):
        assert surv[0] <= 1_000_000
        assert (np.diff(surv) <= 0).all()


def test_kaplan_meier_all_censored_and_empty(ray_session):
    from ocr_service_ray.ops.survival import kaplan_meier

    out = kaplan_meier(_ds({"t": [3, 5, 7], "d": [0, 0, 0]}), "t", "d")
    assert len(out) == 0
    assert list(out.columns) == ["t", "n_risk", "n_events", "surv_ppm"]
