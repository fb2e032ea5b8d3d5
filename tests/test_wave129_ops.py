"""Wave-129 ops: priority sampling — brute parity, estimator
exactness when k >= n, tau semantics, layout invariance."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(keys, weights, flags=None):
    import ray.data as rd

    t = {
        "k": pa.array(keys),
        "w": pa.array(weights, type=pa.int64()),
    }
    if flags is not None:
        t["f"] = pa.array(flags, type=pa.int64())
    return rd.from_arrow(pa.table(t))


def _prio(key, w):
    h = int(hashlib.md5(str(key).encode()).hexdigest()[:9], 16)
    return (w * (1 << 36)) // (h + 1)


def test_priority_sample_brute_parity():
    from ocr_service_ray.ops.priority_sample import priority_sample

    rng = np.random.RandomState(129)
    keys = [f"e{i}" for i in range(200)]
    weights = rng.randint(1, 5000, 200).astype(int).tolist()
    out = priority_sample(_ds(keys, weights), "k", "w", k=10)
    ref = sorted(
        ((_prio(k, w), k, w) for k, w in zip(keys, weights)),
        key=lambda r: (-r[0], r[1]),
    )
    assert out["sample"]["key"].tolist() == [r[1] for r in ref[:10]]
    assert out["tau"] == ref[10][0]
    assert out["n_items"] == 200
    assert out["true_total"] == sum(weights)
    # every sampled priority >= tau
    assert (out["sample"]["priority"] >= out["tau"]).all()


def test_priority_sample_exhaustive_is_exact():
    from ocr_service_ray.ops.priority_sample import priority_sample

    # k >= n: tau = 0 and the estimator is the exact total
    keys = ["a", "b", "c"]
    weights = [10, 20, 30]
    flags = [1, 0, 1]
    out = priority_sample(_ds(keys, weights, flags), "k", "w", k=5, est_flag_col="f")
    assert out["tau"] == 0
    assert out["est_total"] == 60
    assert out["est_flagged"] == 40


def test_priority_sample_heavy_item_always_in():
    from ocr_service_ray.ops.priority_sample import priority_sample

    # one overwhelming weight: its priority dominates any hash draw
    keys = [f"e{i}" for i in range(50)]
    weights = [10] * 49 + [10_000_000]
    out = priority_sample(_ds(keys, weights), "k", "w", k=5)
    assert "e49" in set(out["sample"]["key"])


def test_priority_sample_layout_invariance():
    from ocr_service_ray.ops.priority_sample import priority_sample

    rng = np.random.RandomState(3)
    keys = [f"e{i}" for i in range(120)]
    weights = rng.randint(1, 999, 120).astype(int).tolist()
    base = priority_sample(_ds(keys, weights), "k", "w", k=7)
    shuf = _ds(keys[::-1], weights[::-1]).repartition(6)
    out = priority_sample(shuf, "k", "w", k=7)
    pd.testing.assert_frame_equal(base["sample"], out["sample"])
    assert base["tau"] == out["tau"]
