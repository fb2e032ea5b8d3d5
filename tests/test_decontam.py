"""Decontamination (ops/decontam.py): broadcast == shuffle strategy
equivalence, planted-overlap detection, distinct-gram counting,
decontaminate() filtering, empty eval set."""

import pyarrow as pa
import pytest

from ocr_service_ray.ops.decontam import contamination_pairs, decontaminate

LEAK = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens = one 8-gram

TRAIN = pa.table(
    {
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array(
            [
                f"clean training text with plenty of ordinary words {LEAK}",
                "fully clean second training document with no overlap at all",
                f"{LEAK} {LEAK} repeated leak still counts once per gram",
                "short",
            ]
        ),
    }
)
EVAL = pa.table(
    {
        "doc_id": pa.array([100, 101], pa.int64()),
        "text": pa.array(
            [
                f"benchmark question mentioning {LEAK} verbatim",
                "an unrelated benchmark prompt with its own phrasing",
            ]
        ),
    }
)


def _pairs(strategy):
    import ray.data as rd

    out = contamination_pairs(
        rd.from_arrow(TRAIN), rd.from_arrow(EVAL), n=8, strategy=strategy
    ).to_pandas()
    if out.empty:
        return {}
    return {
        (r.train_id, r.eval_id): r.shared_grams for r in out.itertuples()
    }


def test_strategies_agree_and_detect_leak(ray_session):
    a = _pairs("broadcast")
    b = _pairs("shuffle")
    assert a == b
    # docs 0 and 2 each share exactly the one leaked 8-gram with eval 100
    assert a[(0, 100)] == 1
    assert a[(2, 100)] == 1
    # clean docs / clean eval never appear
    assert not any(t in (1, 3) or e == 101 for t, e in a)


def test_decontaminate_drops_leaky_docs(ray_session):
    import ray.data as rd

    kept = (
        decontaminate(rd.from_arrow(TRAIN), rd.from_arrow(EVAL), n=8)
        .to_pandas()["doc_id"]
        .tolist()
    )
    assert sorted(kept) == [1, 3]


def test_empty_eval_is_noop(ray_session):
    import ray.data as rd

    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())}
    )
    assert _pairs_empty(rd, empty) == {}
    kept = decontaminate(
        rd.from_arrow(TRAIN), rd.from_arrow(empty), n=8
    ).to_pandas()
    assert sorted(kept["doc_id"].tolist()) == [0, 1, 2, 3]


def _pairs_empty(rd, empty):
    out = contamination_pairs(
        rd.from_arrow(TRAIN), rd.from_arrow(empty), n=8
    ).to_pandas()
    return {} if out.empty else dict(out)
