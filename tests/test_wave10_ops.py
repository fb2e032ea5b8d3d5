"""Wave-10 ops: deterministic negative sampling, data-contract
validation — vs brute-force references."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(table: dict):
    import ray.data as rd

    return rd.from_arrow(pa.table(table))


def test_negative_sampling_deterministic_and_excluding(ray_session):
    from ocr_service_ray.ops.negatives import negative_sampling

    users = [1, 1, 1, 2, 2, 3]
    items = [10, 20, 30, 10, 40, 50]
    ds = _ds({"u": users, "it": items})
    out = (
        negative_sampling(ds, "u", "it", k=2, tries=30)
        .to_pandas()
        .sort_values(["u", "rank"])
        .reset_index(drop=True)
    )
    vocab = sorted(set(items))
    pos = {1: {10, 20, 30}, 2: {10, 40}, 3: {50}}
    for u, grp in out.groupby("u"):
        assert len(grp) == 2
        # negatives never collide with positives, no repeats
        assert not (set(grp["neg_item"]) & pos[u])
        assert grp["neg_item"].is_unique
        # exact replay of the md5 draw
        expect, seen = [], set()
        for j in range(30):
            h = int(hashlib.md5(f"neg:{u}:{j}".encode()).hexdigest()[:15], 16)
            item = vocab[h % len(vocab)]
            if item in pos[u] or item in seen:
                continue
            seen.add(item)
            expect.append(item)
            if len(expect) == 2:
                break
        assert grp["neg_item"].tolist() == expect


def test_negative_sampling_exhausted_vocab(ray_session):
    from ocr_service_ray.ops.negatives import negative_sampling

    # user 1 holds the whole vocabulary — zero negatives possible
    out = negative_sampling(
        _ds({"u": [1, 1], "it": [10, 20]}), "u", "it", k=2, tries=10
    ).to_pandas()
    assert len(out) == 0 or (out["u"] != 1).all()


def test_validate_constraints(ray_session):
    from ocr_service_ray.ops.contracts import validate_constraints

    t = pa.table(
        {
            "id": pa.array([1, 2, 2, 4], type=pa.int64()),
            "v": pa.array([5, -1, None, -3], type=pa.int64()),
            "cat": pa.array(["a", "b", "zz", None], type=pa.string()),
        }
    )
    import ray.data as rd

    out = validate_constraints(
        rd.from_arrow(t),
        [
            ("not_null", "v"),
            ("non_negative", "v"),
            ("in_set", "cat", ["a", "b"]),
            ("unique", "id"),
        ],
    ).set_index("rule")["n_violations"]
    assert out["not_null:v"] == 1
    assert out["non_negative:v"] == 2
    assert out["in_set:cat"] == 1  # NULL is not an in_set violation
    assert out["unique:id"] == 1
