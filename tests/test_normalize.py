"""Quantile normalization (ops/normalize.py): equalization property,
duckdb window-SQL parity on random counts, edge cases."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_qnorm_counts_matches_duckdb_reference():
    import duckdb

    from ocr_service_ray.ops.normalize import quantile_normalize_counts

    rng = np.random.RandomState(19)
    vc = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], 200),
            "val": rng.randint(0, 50, 200).astype(np.int64),
        }
    )
    vc = vc.groupby(["g", "val"], as_index=False).size().rename(columns={"size": "c"})
    vc["c"] = vc["c"].astype(np.int64)
    got = quantile_normalize_counts(vc.copy()).sort_values(["g", "val"]).reset_index(drop=True)
    ref = duckdb.connect().execute(
        """
        WITH src_cum AS (
          SELECT g, val, c,
                 SUM(c) OVER (PARTITION BY g ORDER BY val) AS r,
                 SUM(c) OVER (PARTITION BY g) AS n_g
          FROM vc),
        pooled AS (SELECT val, SUM(c) AS pc FROM vc GROUP BY val),
        pooled_cum AS (SELECT val, SUM(pc) OVER (ORDER BY val) AS pcum FROM pooled),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS N FROM vc)
        SELECT s.g, s.val, s.c,
               (SELECT min(p.val) FROM pooled_cum p
                WHERE p.pcum >= ((s.r * t.N + s.n_g - 1) // s.n_g)) AS norm_val
        FROM src_cum s, tot t ORDER BY g, val
        """
    ).df()
    assert (got["norm_val"].to_numpy() == ref["norm_val"].to_numpy()).all()


def test_qnorm_equalizes_distributions(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.normalize import quantile_normalize

    rng = np.random.RandomState(23)
    # source a: shifted distribution; source b: baseline — same n
    df = pd.DataFrame(
        {
            "g": ["a"] * 500 + ["b"] * 500,
            "val": np.concatenate(
                [rng.randint(100, 200, 500), rng.randint(0, 100, 500)]
            ).astype(np.int64),
        }
    )
    ds = rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
    ).repartition(5)
    mapped = quantile_normalize(ds, "g", "val")
    sums = (
        mapped.assign(w=mapped["c"] * mapped["norm_val"])
        .groupby("g")["w"]
        .sum()
    )
    # after normalization both sources follow the pooled distribution:
    # their normalized means differ by < 2% (rank-map granularity),
    # while the RAW means differed by ~3x
    assert abs(sums["a"] - sums["b"]) / max(sums["a"], sums["b"]) < 0.02
    raw = df.groupby("g")["val"].sum()
    assert raw["a"] > 2 * raw["b"]
    # identity: a single source maps every value to itself
    one = quantile_normalize(
        rd.from_arrow(
            pa.Table.from_pandas(
                df.assign(g="only"), preserve_index=False
            )
        ),
        "g",
        "val",
    )
    assert (one["val"].to_numpy() == one["norm_val"].to_numpy()).all()


def test_qnorm_empty():
    from ocr_service_ray.ops.normalize import quantile_normalize_counts

    out = quantile_normalize_counts(
        pd.DataFrame({"g": [], "val": [], "c": []})
    )
    assert len(out) == 0 and "norm_val" in out.columns


def test_energy_distance_brute_force_and_properties(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ocr_service_ray.ops.divergence import energy_distance

    rng = np.random.RandomState(29)
    x = rng.randint(0, 40, 300)
    y = rng.randint(10, 60, 200)
    df = pd.DataFrame(
        {
            "g": ["a"] * len(x) + ["b"] * len(y),
            "v": np.concatenate([x, y]).astype(np.int64),
        }
    )
    ds = rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
    ).repartition(5)
    out = energy_distance(ds, "g", "v", "a", "b").iloc[0]
    assert out["s_xy"] == np.abs(x[:, None] - y[None, :]).sum()
    assert out["s_xx"] == np.abs(x[:, None] - x[None, :]).sum()
    assert out["s_yy"] == np.abs(y[:, None] - y[None, :]).sum()
    n, m = len(x), len(y)
    ref = 2 * out["s_xy"] / (n * m) - out["s_xx"] / n**2 - out["s_yy"] / m**2
    assert abs(out["energy_micro"] / 1e6 - ref) < 2e-6
    assert out["energy_micro"] >= 0  # energy distance is a metric
    # identical distributions -> energy 0
    df2 = pd.DataFrame(
        {"g": ["a"] * 100 + ["b"] * 100, "v": list(range(100)) * 2}
    )
    same = energy_distance(
        rd.from_arrow(pa.Table.from_pandas(df2, preserve_index=False)),
        "g",
        "v",
        "a",
        "b",
    ).iloc[0]
    assert same["energy_micro"] == 0
