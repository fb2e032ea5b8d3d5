"""skew_join (ops/skew.py): the hybrid hot-broadcast / cold-shuffle
join must equal a plain inner join bit for bit, with the hot path
genuinely exercised on a skewed fixture and a clean fallback when no
key is hot."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _rd(t):
    import ray.data as rd

    return rd.from_arrow(t)


def _fixture(seed=0, n=8000, hot_share=0.5, n_keys=300):
    rng = np.random.default_rng(seed)
    key = np.where(
        rng.random(n) < hot_share, 7, rng.integers(0, n_keys, n)
    ).astype(np.int64)
    fact = pa.table(
        {"k": pa.array(key), "v": pa.array(rng.integers(0, 100, n), pa.int64())}
    )
    dim = pa.table(
        {
            "k": pa.array(np.arange(n_keys, dtype=np.int64)),
            "attr": pa.array(np.arange(n_keys, dtype=np.int64) * 10),
        }
    )
    return fact, dim


def _canon(df):
    return (
        df[sorted(df.columns)]
        .sort_values(sorted(df.columns))
        .reset_index(drop=True)
    )


def test_skew_join_equals_plain_join_on_skewed_keys(ray_session):
    from ocr_service_ray.ops.skew import hot_keys, skew_join

    fact, dim = _fixture()
    hot = hot_keys(_rd(fact), "k")
    assert 7 in hot  # the hot path is actually exercised
    out = skew_join(_rd(fact), _rd(dim), "k").to_pandas()
    ref = fact.to_pandas().merge(dim.to_pandas(), on="k")
    pd.testing.assert_frame_equal(_canon(out), _canon(ref))


def test_skew_join_explicit_hot_list_and_cold_only(ray_session):
    from ocr_service_ray.ops.skew import skew_join

    fact, dim = _fixture(seed=1, hot_share=0.0)
    ref = _canon(fact.to_pandas().merge(dim.to_pandas(), on="k"))
    # no hot keys detected -> pure hash-join fallback
    out = skew_join(_rd(fact), _rd(dim), "k", min_count=10**9).to_pandas()
    pd.testing.assert_frame_equal(_canon(out), ref)
    # explicit hot list (even a cold key) stays exact — each key takes
    # exactly one path
    out2 = skew_join(_rd(fact), _rd(dim), "k", hot=[3, 11]).to_pandas()
    pd.testing.assert_frame_equal(_canon(out2), ref)


def test_skew_join_string_keys_and_missing_dim_rows(ray_session):
    from ocr_service_ray.ops.skew import skew_join

    rng = np.random.default_rng(2)
    key = np.where(rng.random(2000) < 0.4, 0, rng.integers(0, 50, 2000))
    fact = pa.table(
        {
            "k": pa.array([f"u{i}" for i in key]),
            "v": pa.array(np.arange(2000, dtype=np.int64)),
        }
    )
    # dim covers only even keys: inner join must drop odd-key facts
    dim = pa.table(
        {
            "k": pa.array([f"u{i}" for i in range(0, 50, 2)]),
            "attr": pa.array(np.arange(25, dtype=np.int64)),
        }
    )
    out = skew_join(_rd(fact), _rd(dim), "k").to_pandas()
    ref = fact.to_pandas().merge(dim.to_pandas(), on="k")
    pd.testing.assert_frame_equal(_canon(out), _canon(ref))
