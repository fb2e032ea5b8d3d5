"""Element-pure hashing + pair-dedup regression tests.

Regression context: pd.util.hash_array turned out not to be a pure
function of the element (same string → different hash depending on
the rest of the array), which silently broke hash-bucketed pair dedup
by scattering copies of one pair across buckets."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_hash_column_element_pure_strings():
    from ocr_service_ray.ops.hashing import hash_column

    a = pa.array(["4\x003185", "x", "y"])
    b = pa.array(["zzz", "4\x003185"])
    h_a = hash_column(a)
    h_b = hash_column(b)
    assert h_a[0] == h_b[1]  # same value, different array context


def test_hash_column_element_pure_ints():
    from ocr_service_ray.ops.hashing import hash_column

    a = pa.chunked_array([pa.array([7, 8], pa.int64()), pa.array([9], pa.int64())])
    b = pa.array([9, 7], pa.int32())
    h_a = hash_column(a)
    h_b = hash_column(b)
    assert h_a[0] == h_b[1] and h_a[2] == h_b[0]
    assert len(set(h_a.tolist())) == 3  # scrambled, not identity


def test_hash_pair_order_sensitive():
    from ocr_service_ray.ops.hashing import hash_pair_columns

    a = pa.array([1, 2]); b = pa.array([2, 1])
    h = hash_pair_columns(a, b)
    assert h[0] != h[1]


def test_dedupe_pairs_exact(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.dedup import dedupe_pairs

    rng = np.random.RandomState(0)
    base = pd.DataFrame(
        {
            "id_a": rng.randint(0, 5000, 44000),
            "id_b": rng.randint(0, 5000, 44000),
            "hamming": rng.randint(0, 9, 44000),
        }
    ).drop_duplicates(["id_a", "id_b"])
    dups = base.sample(4000, random_state=1).copy()
    dups["hamming"] += 1
    pairs = pd.concat([base, dups]).reset_index(drop=True)
    ds = rd.from_pandas([pairs.iloc[i::50].copy() for i in range(50)])
    out = dedupe_pairs(ds, "hamming", agg="min").to_pandas()
    assert len(out) == len(base)
    assert out.duplicated(["id_a", "id_b"]).sum() == 0
    # min kept: the 4000 duplicated pairs must carry the ORIGINAL hamming
    merged = out.merge(base, on=["id_a", "id_b"], suffixes=("", "_want"))
    assert (merged["hamming"] == merged["hamming_want"]).all()


def test_grouped_agg_matches_native(ray_session):
    import ray.data as rd
    from ray.data.aggregate import Count, Max, Mean, Min, Sum

    from ocr_service_ray.ops.agg import grouped_agg

    rng = np.random.RandomState(3)
    df = pd.DataFrame(
        {
            "k1": rng.randint(0, 400, 20000).astype(str),
            "k2": rng.choice(["a", "b", "c"], 20000),
            "v": rng.randint(-1000, 1000, 20000),
        }
    )
    ds = rd.from_pandas([df.iloc[i::10].copy() for i in range(10)])
    got = (
        grouped_agg(
            ds,
            ["k1", "k2"],
            {
                "n": (None, "count"),
                "s": ("v", "sum"),
                "lo": ("v", "min"),
                "hi": ("v", "max"),
                "avg": ("v", "mean"),
            },
        )
        .to_pandas()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    want = (
        ds.groupby(["k1", "k2"])
        .aggregate(
            Count(alias_name="n"),
            Sum("v", alias_name="s"),
            Min("v", alias_name="lo"),
            Max("v", alias_name="hi"),
            Mean("v", alias_name="avg"),
        )
        .to_pandas()
        .sort_values(["k1", "k2"])
        .reset_index(drop=True)
    )
    for col in ("n", "s", "lo", "hi"):
        assert (got[col].to_numpy() == want[col].to_numpy()).all()
    assert np.allclose(got["avg"], want["avg"])

def test_hash_column_null_sentinel():
    """Null keys hash to a fixed sentinel — never crash, same bucket
    everywhere (ADVICE r1: a single null user_id/doc_id crashed the
    whole shuffle)."""
    from ocr_service_ray.ops.hashing import hash_column

    s = pa.array(["a", None, "b"])
    h1 = hash_column(s)
    h2 = hash_column(pa.array([None, "zzz"]))
    assert h1[1] == h2[0]  # element-pure including nulls
    assert h1[1] != h1[0] and h1[1] != h1[2]

    i = pa.array([1, None, 3], pa.int64())
    hi1 = hash_column(i)
    hi2 = hash_column(pa.array([None], pa.int32()))
    assert hi1[1] == hi2[0]


def test_grouped_agg_null_keys_and_values(ray_session):
    """SQL null semantics (ADVICE r1): a null group key is a real
    group; COUNT(col) skips nulls; mean = NaN-skipping sum / non-null
    count."""
    import ray.data as rd

    from ocr_service_ray.ops.agg import grouped_agg

    df = pd.DataFrame(
        {
            "k": ["x", "x", None, None, "y"],
            "v": [1.0, None, 2.0, 4.0, None],
        }
    )
    ds = rd.from_pandas([df.iloc[:3].copy(), df.iloc[3:].copy()])
    got = grouped_agg(
        ds,
        ["k"],
        {"n": (None, "count"), "nv": ("v", "count"), "s": ("v", "sum"), "m": ("v", "mean")},
    ).to_pandas()
    got = got.sort_values("k", na_position="last").reset_index(drop=True)
    assert len(got) == 3  # x, y, NULL — null-key group kept
    row_null = got[got["k"].isna()].iloc[0]
    assert row_null["n"] == 2 and row_null["nv"] == 2 and row_null["s"] == 6.0
    assert row_null["m"] == 3.0
    row_x = got[got["k"] == "x"].iloc[0]
    assert row_x["n"] == 2 and row_x["nv"] == 1 and row_x["s"] == 1.0
    assert row_x["m"] == 1.0  # NaN-skipping sum / NON-NULL count, not /2


def test_lsh_signature_parquet_tier(ray_session, tmp_path):
    """signature_path writes the signature/fingerprint table to
    parquet and the pair results are identical to the in-memory tier."""
    import ray.data as rd

    from ocr_service_ray.ops.dedup import minhash_lsh_candidates, simhash_candidates

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    near = base.replace("lazy", "sleepy", 1)
    df = pd.DataFrame({"doc_id": [1, 2, 3], "text": [base, near, "unrelated words " * 10]})

    def pairs(fn, **kw):
        out = fn(rd.from_pandas(df), **kw).to_pandas()
        return sorted(zip(out["id_a"], out["id_b"]))

    assert pairs(minhash_lsh_candidates, threshold=0.5) == pairs(
        minhash_lsh_candidates, threshold=0.5, signature_path=str(tmp_path / "mh")
    )
    assert pairs(simhash_candidates, max_hamming=20) == pairs(
        simhash_candidates, max_hamming=20, signature_path=str(tmp_path / "sh")
    )
    import os

    assert os.path.isdir(tmp_path / "mh") and os.path.isdir(tmp_path / "sh")
