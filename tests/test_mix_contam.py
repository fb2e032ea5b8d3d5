"""temperature_sample (ops/mix.py) and contamination_ratio
(ops/decontam.py) — layout invariance, exact targets, hand fixtures."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(df, nblocks):
    import ray.data as rd

    return rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(
        nblocks
    )


@pytest.mark.parametrize("nblocks", [1, 8])
def test_temperature_sample_targets_and_layout(ray_session, nblocks):
    from ocr_service_ray.ops.mix import temperature_sample

    sizes = {"big": 400, "mid": 50, "tiny": 3}
    rows = []
    i = 0
    for s, n in sizes.items():
        for _ in range(n):
            rows.append({"doc_id": i, "source": s})
            i += 1
    df = pd.DataFrame(rows)
    out = (
        temperature_sample(_ds(df, nblocks), "source", "doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = out.groupby("source").size().to_dict()
    assert got == {s: math.isqrt(n) for s, n in sizes.items()}
    # deterministic across layouts: same ids whatever the block count
    out1 = (
        temperature_sample(_ds(df.sample(frac=1, random_state=1), 3), "source", "doc_id")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == out1["doc_id"].tolist()


def test_contamination_ratio_fixture(ray_session):
    from ocr_service_ray.ops.decontam import contamination_ratio

    # 3-grams; eval holds "a b c d" → grams {abc, bcd}
    train = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": [
                "a b c d e",  # grams abc,bcd,cde → 2/3 shared
                "x y z",  # gram xyz → 0/1
                "a b",  # no grams → omitted
            ],
        }
    )
    ev = pd.DataFrame({"doc_id": [100], "text": ["a b c d"]})
    out = (
        contamination_ratio(_ds(train, 2), _ds(ev, 1), n=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out["doc_id"].tolist() == [1, 2]
    assert out["n_grams"].tolist() == [3, 1]
    assert out["n_shared"].tolist() == [2, 0]
    # round-half-up integer micro ratio: 2/3 → 666667
    assert out["ratio_micro"].tolist() == [666667, 0]


def test_contamination_ratio_empty_eval(ray_session):
    from ocr_service_ray.ops.decontam import contamination_ratio

    train = pd.DataFrame({"doc_id": [1], "text": ["a b c d"]})
    ev = pd.DataFrame({"doc_id": [], "text": []}).astype(
        {"doc_id": "int64", "text": "str"}
    )
    out = contamination_ratio(_ds(train, 1), _ds(ev, 1), n=3).to_pandas()
    assert out["n_shared"].tolist() == [0] and out["ratio_micro"].tolist() == [0]
