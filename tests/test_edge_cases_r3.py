"""Edge-case hardening for the session-2 operator waves: band
boundaries, degenerate graphs, full-draw sampling, partitioning
invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(table: dict, parts: int | None = None):
    import ray.data as rd

    ds = rd.from_arrow(pa.table(table))
    return ds.repartition(parts) if parts else ds


def test_interval_overlap_band_boundaries(ray_session):
    from ocr_service_ray.ops.intervals import interval_overlap_join

    # starts exactly on band edges, zero-length intervals, identical
    # intervals on both sides
    ls = [0, 10, 10, 20, 35]
    le = [0, 10, 20, 30, 35]
    rs = [0, 10, 19, 30, 100]
    re = [5, 10, 21, 30, 200]
    out = interval_overlap_join(
        _ds({"lid": list(range(5)), "s_us": ls, "e_us": le}),
        _ds({"rid": list(range(5)), "s_us": rs, "e_us": re}),
        ["lid"],
        ["rid"],
        band=10,
    ).to_pandas()
    got = set(zip(out["l_lid"], out["r_rid"]))
    expect = {
        (li, ri)
        for li in range(5)
        for ri in range(5)
        if ls[li] <= re[ri] and rs[ri] <= le[li]
    }
    assert got == expect
    assert len(out) == len(expect)


def test_triangle_count_bipartite_zero(ray_session):
    from ocr_service_ray.ops.triangles import triangle_count

    # complete bipartite K3,3 has no triangles
    src = [a for a in range(3) for _ in range(3)]
    dst = [10 + b for _ in range(3) for b in range(3)]
    out = triangle_count(_ds({"src": src, "dst": dst}))
    assert out.iloc[0].tolist() == [6, 9, 0]


def test_rolling_distinct_window_one_is_daily_distinct(ray_session):
    from ocr_service_ray.ops.retention import rolling_distinct

    ts = pd.to_datetime(["2024-01-01", "2024-01-01", "2024-01-02"])
    out = (
        rolling_distinct(
            _ds({"user_id": [1, 2, 1], "ts": pa.array(ts)}), window=1
        )
        .to_pandas()
        .set_index("period")["n_distinct"]
        .sort_index()
    )
    assert out.tolist() == [2, 1]


def test_proportional_sample_full_draw(ray_session):
    from ocr_service_ray.ops.mix import proportional_sample

    out = proportional_sample(
        _ds({"src": ["a", "a", "b"], "id": [1, 2, 3]}), "src", "id", 3
    ).to_pandas()
    assert sorted(out["id"]) == [1, 2, 3]


def test_grouped_sample_k_larger_than_groups(ray_session):
    from ocr_service_ray.ops.relational import grouped_sample_k

    out = grouped_sample_k(
        _ds({"g": ["a", "a", "b"], "id": [1, 2, 3]}), ["g"], "id", 10
    ).to_pandas()
    assert sorted(out["id"]) == [1, 2, 3]


def test_table_checksum_partitioning_invariant(ray_session):
    from ocr_service_ray.ops.diff import table_checksum

    table = {"id": list(range(200)), "v": [f"s{i}" for i in range(200)]}
    a = table_checksum(_ds(table, parts=1), ["id", "v"])
    b = table_checksum(_ds(table, parts=17), ["id", "v"])
    assert a["checksum"].iloc[0] == b["checksum"].iloc[0]
    assert a["n_rows"].iloc[0] == b["n_rows"].iloc[0] == 200


def test_chunk_tokens_long_doc_counts(ray_session):
    from ocr_service_ray.ops.chunking import chunk_tokens

    n = 10_000
    text = " ".join(f"t{i}" for i in range(n))
    out = chunk_tokens(
        _ds({"doc_id": [1], "text": [text]}), chunk_size=512, stride=384
    ).to_pandas()
    import math

    assert len(out) == math.ceil(n / 384)
    # full windows are exactly those with start + 512 <= n
    n_full = sum(1 for s in range(0, n, 384) if s + 512 <= n)
    assert out["n_chunk_tokens"].iloc[:n_full].eq(512).all()
    assert (out["n_chunk_tokens"].iloc[n_full:] < 512).all()
    # token-exact reassembly of the first chunk
    assert out["chunk_text"].iloc[0].split(" ")[:3] == ["t0", "t1", "t2"]


def test_kcore_rounds_idempotent_past_fixpoint(ray_session):
    from ocr_service_ray.ops.kcore import kcore_peel

    src = [1, 2, 3, 1]  # triangle + pendant
    dst = [2, 3, 1, 9]
    a = kcore_peel(_ds({"src": src, "dst": dst}), k=2, rounds=2).to_pandas()
    b = kcore_peel(_ds({"src": src, "dst": dst}), k=2, rounds=6).to_pandas()
    assert sorted(a["node"]) == sorted(b["node"]) == [1, 2, 3]
