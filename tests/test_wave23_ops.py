"""Wave-23 ops: NTILE aggregation, rank-with-ties top-k, first/last
matrix — vs brute-force Python references."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(table: dict):
    import ray.data as rd

    return rd.from_arrow(pa.table(table))


def _ts_us(us_list):
    base = np.datetime64("2024-03-01", "us")
    return [base + np.timedelta64(int(u), "us") for u in us_list]


def test_grouped_ntile_agg_fill_semantics():
    from ocr_service_ray.ops.window import grouped_ntile_agg

    # 10 rows, 4 tiles -> sizes 3,3,2,2 (first n%k tiles bigger)
    vals = list(range(10))
    out = (
        grouped_ntile_agg(
            _ds({"g": ["a"] * 10, "v": vals, "id": vals}),
            "g",
            ["v", "id"],
            n_tiles=4,
            agg_specs={"n_rows": (None, "count"), "v_sum": ("v", "sum")},
        )
        .to_pandas()
        .set_index("tile")
        .sort_index()
    )
    assert out["n_rows"].tolist() == [3, 3, 2, 2]
    assert out.loc[1, "v_sum"] == 0 + 1 + 2
    assert out.loc[4, "v_sum"] == 8 + 9
    # fewer rows than tiles: 2 rows, 4 tiles -> tiles 1 and 2 only
    small = (
        grouped_ntile_agg(
            _ds({"g": ["b", "b"], "v": [5, 6], "id": [0, 1]}),
            "g",
            ["v", "id"],
            n_tiles=4,
        )
        .to_pandas()
    )
    assert sorted(small["tile"].tolist()) == [1, 2]


def test_topk_with_ties_includes_boundary_ties():
    from ocr_service_ray.ops.relational import topk_with_ties

    # values desc: 9, 8, 7, 7, 7, 3 -> rank()<=3 keeps 9, 8, 7, 7, 7
    vals = [9, 8, 7, 7, 7, 3]
    out = (
        topk_with_ties(_ds({"g": ["x"] * 6, "v": vals}), ["g"], "v", 3)
        .to_pandas()
        .set_index("v")["n_rows"]
        .to_dict()
    )
    assert out == {9: 1, 8: 1, 7: 3}
    # two groups with independent thresholds
    g = ["a"] * 4 + ["b"] * 4
    v = [4, 4, 4, 1, 10, 9, 8, 7]
    out2 = (
        topk_with_ties(_ds({"g": g, "v": v}), ["g"], "v", 3)
        .to_pandas()
        .groupby("g")["n_rows"]
        .sum()
        .to_dict()
    )
    assert out2 == {"a": 3, "b": 3}


def test_first_last_matrix_order_and_span():
    from ocr_service_ray.ops.retention import first_last_matrix

    SEC = 1_000_000
    # u1: view@0 ... purchase@100s -> (view, purchase), span 100
    # u2: single click -> (click, click), span 0
    # u3: same-ts tie broken by event_id: id1 error first, id2 view last
    out = (
        first_last_matrix(
            _ds(
                {
                    "user_id": [1, 1, 1, 2, 3, 3],
                    "ts": _ts_us([0, 50 * SEC, 100 * SEC, 7, 5, 5]),
                    "event_type": [
                        "view",
                        "click",
                        "purchase",
                        "click",
                        "error",
                        "view",
                    ],
                    "event_id": [1, 2, 3, 4, 1, 2],
                }
            )
        )
        .to_pandas()
        .set_index(["first_type", "last_type"])
    )
    assert out.loc[("view", "purchase"), "n_keys"] == 1
    assert out.loc[("view", "purchase"), "span_sec_sum"] == 100
    assert out.loc[("click", "click"), "span_sec_sum"] == 0
    assert out.loc[("error", "view"), "n_keys"] == 1
