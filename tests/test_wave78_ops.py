"""Wave-78: Neyman stratified sampling (ops/mix.neyman_sample) and
the integer harmonic mean — allocation optimality direction, exact
budgets, layout invariance."""

import numpy as np
import pyarrow as pa


def _events(groups, cents, ids=None):
    n = len(groups)
    return pa.table(
        {
            "event_type": pa.array(groups, pa.string()),
            "event_id": pa.array(ids or list(range(n)), pa.int64()),
            "cents": pa.array(np.asarray(cents, dtype=np.int64)),
        }
    )


def test_neyman_allocates_more_to_high_variance_stratum():
    import ray.data as rd

    from ocr_service_ray.ops.mix import neyman_sample

    rng = np.random.default_rng(30)
    # equal sizes: stratum a near-constant, stratum b high-variance
    ga = ["a"] * 500
    gb = ["b"] * 500
    ca = rng.integers(1000, 1002, 500)
    cb = rng.integers(1, 20000, 500)
    t = _events(ga + gb, np.concatenate([ca, cb]))
    out = (
        neyman_sample(rd.from_arrow(t), "event_type", "event_id", "cents", 200)
        .to_pandas()
    )
    counts = out["event_type"].value_counts()
    assert len(out) == 200  # Hamilton hits the budget exactly
    assert counts.get("b", 0) > counts.get("a", 0) * 3  # spread wins budget
    # layout invariance
    out2 = (
        neyman_sample(
            rd.from_arrow(t).repartition(7),
            "event_type",
            "event_id",
            "cents",
            200,
        ).to_pandas()
    )
    assert sorted(out["event_id"]) == sorted(out2["event_id"])


def test_neyman_zero_variance_falls_back_to_proportional():
    import ray.data as rd

    from ocr_service_ray.ops.mix import neyman_sample

    t = _events(["a"] * 30 + ["b"] * 10, [5] * 40)
    out = (
        neyman_sample(rd.from_arrow(t), "event_type", "event_id", "cents", 20)
        .to_pandas()
    )
    counts = out["event_type"].value_counts()
    assert counts["a"] == 15 and counts["b"] == 5


def test_harmonic_mean_identity():
    # harmonic mean of {20, 50} cents = 2/(1/20 + 1/50) = 28.571…
    r = (1_000_000_000_000 // 20) + (1_000_000_000_000 // 50)
    hm = 2 * 10**18 // r
    assert abs(hm - 28_571_428) < 10  # micro-cents ≈ 28.571428 cents
