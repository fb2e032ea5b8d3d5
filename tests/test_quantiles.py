"""Exact discrete quantiles (ops/sketch.py): rank arithmetic vs
DuckDB quantile_disc on randomized inputs, global and per-group
operators across block layouts."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ocr_service_ray.ops.sketch import (
    _disc_rank,
    grouped_quantiles,
    value_counts_quantiles,
)

QS = [0.25, 0.5, 0.75, 0.9, 0.99]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_rank_matches_duckdb(seed):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 40, rng.integers(5, 200)).astype(np.int64)
    df = pd.DataFrame({"x": vals})
    for q in QS + [0.0, 1.0]:
        want = duckdb.sql(
            f"SELECT quantile_disc(x, {q}) FROM df"
        ).fetchone()[0]
        got = np.sort(vals)[_disc_rank(q, len(vals))]
        assert got == want, (q, len(vals))


def test_value_counts_quantiles(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(5)
    vals = rng.integers(0, 30, 1000).astype(np.int64)
    t = pa.table({"x": pa.array(vals)})
    out = value_counts_quantiles(rd.from_arrow(t).repartition(7), "x", QS)
    ref = np.sort(vals)
    for pct, v in zip(out["q_pct"], out["value"]):
        assert v == ref[_disc_rank(pct / 100, len(vals))]


def test_quantiles_empty_dataset(ray_session):
    """All three quantile operators return (q_pct, value=None) frames
    on an empty input instead of IndexError (ADVICE r2)."""
    import ray.data as rd

    from ocr_service_ray.ops.sketch import (
        histogram_quantiles,
        value_counts_quantiles_cont,
    )

    empty = rd.from_arrow(pa.table({"x": pa.array([], pa.int64())}))
    for fn in (value_counts_quantiles, value_counts_quantiles_cont, histogram_quantiles):
        out = fn(empty, "x", [0.5, 0.9])
        assert list(out["q_pct"]) == [50, 90]
        assert out["value"].isna().all()


def test_grouped_quantiles(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(9)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 5, 2000),
            "x": rng.integers(0, 50, 2000).astype(np.int64),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(9)
    out = grouped_quantiles(ds, ["g"], "x", [0.5, 0.9]).to_pandas()
    for g, sub in df.groupby("g"):
        ref = np.sort(sub["x"].to_numpy())
        mine = out[out["g"] == g].set_index("q_pct")["value"]
        assert mine[50] == ref[_disc_rank(0.5, len(ref))]
        assert mine[90] == ref[_disc_rank(0.9, len(ref))]


def test_histogram_quantiles_accuracy(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.sketch import histogram_quantiles

    rng = np.random.default_rng(13)
    vals = rng.normal(50.0, 12.0, 30_000)
    t = pa.table({"x": pa.array(vals, pa.float64())})
    out = histogram_quantiles(
        rd.from_arrow(t).repartition(9), "x", [0.1, 0.5, 0.9], bins=4096
    )
    span = vals.max() - vals.min()
    for pct, v in zip(out["q_pct"], out["value"]):
        exact = np.quantile(vals, pct / 100)
        assert abs(v - exact) <= span / 4096 + 1e-9


def test_histogram_quantiles_constant_column(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.sketch import histogram_quantiles

    t = pa.table({"x": pa.array([7.0] * 100)})
    out = histogram_quantiles(rd.from_arrow(t), "x", [0.5, 0.99])
    assert (out["value"] == 7.0).all()


@pytest.mark.parametrize("seed", [4, 5])
def test_quantile_cont_matches_duckdb(ray_session, seed):
    import ray.data as rd

    from ocr_service_ray.ops.sketch import value_counts_quantiles_cont

    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 35, 700).astype(np.int64)
    t = pa.table({"x": pa.array(vals)})
    df = pd.DataFrame({"x": vals})
    out = value_counts_quantiles_cont(
        rd.from_arrow(t).repartition(6), "x", QS
    )
    for pct, v in zip(out["q_pct"], out["value"]):
        want = duckdb.sql(
            f"SELECT quantile_cont(x, {pct / 100}) FROM df"
        ).fetchone()[0]
        assert v == want  # bit-exact interpolation contract
