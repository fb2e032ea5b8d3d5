"""Wave-74: Poisson bootstrap CI (ops/bootstrap.py) and int8
quantization error audit (ops/vector.quantization_error_audit)."""

import numpy as np
import pyarrow as pa


def test_bootstrap_ci_brackets_mean_and_layout_invariant():
    import ray.data as rd

    from ocr_service_ray.ops.bootstrap import poisson_bootstrap_ci

    rng = np.random.default_rng(21)
    n = 4000
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "event_type": pa.array(
                rng.choice(["a", "b"], n).tolist(), pa.string()
            ),
            "cents": pa.array(rng.integers(0, 10000, n).astype(np.int64)),
        }
    )

    def cents_fn(b):
        return (
            b["event_type"].to_pylist(),
            b["event_id"].to_pylist(),
            b["cents"].to_numpy(zero_copy_only=False),
        )

    o1 = poisson_bootstrap_ci(
        rd.from_arrow(tbl), "event_type", "event_id", cents_fn
    )
    # interval is ordered and brackets the full mean (large n → the
    # resample spread is small and centered)
    assert (o1["lo_micro"] <= o1["hi_micro"]).all()
    assert (o1["lo_micro"] <= o1["mean_micro"]).all()
    assert (o1["mean_micro"] <= o1["hi_micro"]).all()
    # width is sane: within 10% of the mean for n≈2000 per group
    assert (
        (o1["hi_micro"] - o1["lo_micro"]) < o1["mean_micro"] * 0.1
    ).all()
    o2 = poisson_bootstrap_ci(
        rd.from_arrow(tbl).repartition(9), "event_type", "event_id", cents_fn
    )
    assert o1.equals(o2)


def test_bootstrap_multiplicity_distribution():
    from ocr_service_ray.ops.bootstrap import POISSON1_CDF, _multiplicity

    # CDF inversion identities at the exact thresholds
    assert _multiplicity(0.0) == 0
    assert _multiplicity(POISSON1_CDF[0]) == 1  # u < c is strict
    assert _multiplicity(0.99998) == 7  # < P(X≤7) = 0.99998975…
    assert _multiplicity(0.99999) == 8  # ≥ P(X≤7) → the cap bucket
    # mean multiplicity ≈ 1 over a uniform grid
    grid = (np.arange(100000) + 0.5) / 100000
    mean = np.mean([_multiplicity(u) for u in grid])
    assert abs(mean - 1.0) < 0.01


def test_quantization_error_bounds():
    import ray.data as rd

    from ocr_service_ray.ops.vector import quantization_error_audit

    rng = np.random.default_rng(14)
    mat = rng.normal(size=(500, 6)).astype(np.float32)
    mat[:, 3] = 1.5  # constant dim → zero error by the span-0 rule
    tbl = pa.table({"embedding": pa.array(list(mat), pa.list_(pa.float32()))})
    out = quantization_error_audit(rd.from_arrow(tbl))
    assert list(out["dim"]) == [1, 2, 3, 4, 5, 6]
    assert (out["n_rows"] == 500).all()
    assert int(out.loc[out["dim"] == 4, "sse_pico"].iloc[0]) == 0
    # per-element error ≤ one quant step (span/255): sse bounded by
    # n · (span/255)² · 1e12 — check per dim against actual spans
    spans = mat.astype(np.float64).max(axis=0) - mat.astype(np.float64).min(
        axis=0
    )
    for d in range(6):
        bound = 500 * (spans[d] / 255.0) ** 2 * 1e12 + 500
        assert int(out["sse_pico"].iloc[d]) <= bound
    # layout invariance
    out2 = quantization_error_audit(rd.from_arrow(tbl).repartition(7))
    assert out.equals(out2)
