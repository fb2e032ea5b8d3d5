"""Wave-29 ops: sweep-line peak concurrency — vs brute force."""

import numpy as np
import pyarrow as pa


def _ds(table: dict):
    import ray.data as rd

    return rd.from_arrow(pa.table(table))


def test_peak_concurrency_closed_intervals():
    from ocr_service_ray.ops.intervals import peak_concurrency

    # [0,10] [5,15] [10,20] -> at t=10 all three open (closed ends)
    out = peak_concurrency(
        _ds({"s_us": [0, 5, 10], "e_us": [10, 15, 20]})
    )
    assert out == {"n_intervals": 3, "peak_concurrent": 3}
    # touching end/start counts as overlap; disjoint does not
    assert peak_concurrency(
        _ds({"s_us": [0, 10], "e_us": [10, 20]})
    )["peak_concurrent"] == 2
    assert peak_concurrency(
        _ds({"s_us": [0, 11], "e_us": [10, 20]})
    )["peak_concurrent"] == 1


def test_peak_concurrency_brute_force_random():
    from ocr_service_ray.ops.intervals import peak_concurrency

    rng = np.random.RandomState(23)
    s = rng.randint(0, 1000, 200)
    e = s + rng.randint(0, 100, 200)
    got = peak_concurrency(_ds({"s_us": s.tolist(), "e_us": e.tolist()}))
    # brute force over all boundary points
    peak = 0
    for t in np.unique(np.concatenate([s, e])):
        peak = max(peak, int(((s <= t) & (t <= e)).sum()))
    assert got["peak_concurrent"] == peak
    assert got["n_intervals"] == 200
