"""Prefix scan / sequence packing (ops/scan.py): exclusive cumsum vs
numpy across block layouts, unique-key guard, packing boundary
arithmetic."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ocr_service_ray.ops.scan import pack_sequences, prefix_sum


@pytest.mark.parametrize("nblocks", [1, 7])
def test_prefix_sum_matches_numpy(ray_session, nblocks):
    import ray.data as rd

    rng = np.random.default_rng(6)
    n = 500
    vals = rng.integers(1, 100, n).astype(np.int64)
    t = pa.table(
        {"k": pa.array(range(n), pa.int64()), "v": pa.array(vals)}
    )
    ds = rd.from_arrow(t).repartition(nblocks).sort("k")
    out = (
        prefix_sum(ds, "k", "v")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    ref = np.concatenate(([0], np.cumsum(vals)[:-1]))
    assert out["offset"].to_numpy().tolist() == ref.tolist()


def test_pack_sequences(ray_session):
    import ray.data as rd

    texts = ["a b c", "d e", "f g h i j k", "l"]  # dl = 3, 2, 6, 1
    t = pa.table(
        {
            "doc_id": pa.array(range(4), pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = (
        pack_sequences(rd.from_arrow(t), max_tokens=4)
        .to_pandas()
        .sort_values("doc_id")
        .set_index("doc_id")
    )
    # offsets: 0, 3, 5, 11; seqs of width 4
    assert out["start_offset"].tolist() == [0, 3, 5, 11]
    assert out["first_seq"].tolist() == [0, 0, 1, 2]
    # doc 1 spans tokens 3-4 → seqs 0-1; doc 2 spans 5-10 → seqs 1-2
    assert out["last_seq"].tolist() == [0, 1, 2, 2]


def test_prefix_sum_duplicate_key_guard(ray_session):
    # the ambiguous case is two BLOCKS sharing a first key — build the
    # blocks directly (Ray's sort may merge them otherwise)
    import ray.data as rd

    t1 = pa.table(
        {"k": pa.array([1, 1], pa.int64()), "v": pa.array([1, 1], pa.int64())}
    )
    t2 = pa.table(
        {"k": pa.array([1, 2], pa.int64()), "v": pa.array([1, 1], pa.int64())}
    )
    ds = rd.from_arrow(t1).union(rd.from_arrow(t2))
    with pytest.raises(Exception, match="unique sort key"):
        prefix_sum(ds, "k", "v").to_pandas()


def test_weighted_systematic_sample(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.scan import weighted_systematic_sample

    rng = np.random.default_rng(15)
    n = 400
    w = rng.integers(0, 50, n).astype(np.int64)
    w[7] = 0          # never selected
    w[11] = 500       # >= step: always selected
    t = pa.table({"k": pa.array(range(n), pa.int64()), "w": pa.array(w)})
    step = 100
    got = (
        weighted_systematic_sample(
            rd.from_arrow(t).repartition(6), "k", "w", step
        )
        .to_pandas()["k"]
        .tolist()
    )
    # reference: tick-in-interval on the exclusive cumsum
    off = np.concatenate(([0], np.cumsum(w)[:-1]))
    ref = [
        int(k)
        for k in range(n)
        if (off[k] + w[k] - 1 + step) // step != (off[k] - 1 + step) // step
    ]
    assert sorted(got) == ref
    assert 7 not in got and 11 in got
    # sample size ≈ total weight / step; a row covering multiple ticks
    # (w=500 ≥ step) still counts once, so allow that slack
    assert abs(len(got) - w.sum() / step) <= 2 + (500 // step - 1)


def test_zorder_key_interleave_and_locality(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ocr_service_ray.ops.scan import zorder_key

    df = pd.DataFrame({"a": [0, 1, 0, 3], "b": [0, 0, 1, 3]})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = zorder_key(ds, ["a", "b"], bits=2).to_pandas()
    # a contributes even bit positions, b odd: (1,0)->1, (0,1)->2, (3,3)->15
    assert out["z_key"].tolist() == [0, 1, 2, 15]

    # locality: sorting by z_key keeps a 2x2 tile contiguous
    grid = pd.DataFrame(
        [(x, y) for x in range(8) for y in range(8)], columns=["a", "b"]
    )
    gout = (
        zorder_key(rd.from_arrow(pa.Table.from_pandas(grid, preserve_index=False)),
                   ["a", "b"], bits=3)
        .to_pandas()
        .sort_values("z_key")
        .reset_index(drop=True)
    )
    tile = gout[(gout["a"] < 2) & (gout["b"] < 2)]
    assert tile.index.max() - tile.index.min() == 3  # the 4 rows are adjacent

    with pytest.raises(ValueError, match="exceeds int64"):
        zorder_key(ds, ["a", "b"], bits=32)
    neg = rd.from_items([{"a": -1, "b": 0}])
    with pytest.raises(Exception, match="non-negative"):
        zorder_key(neg, ["a", "b"], bits=4).materialize()


def test_running_max_two_phase(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from ocr_service_ray.ops.scan import running_max

    rng = np.random.RandomState(53)
    keys = np.arange(5000, dtype=np.int64)
    vals = rng.randint(0, 10_000, 5000).astype(np.int64)
    perm = rng.permutation(5000)  # unsorted input
    ds = rd.from_arrow(
        pa.table({"k": keys[perm], "v": vals[perm]})
    ).repartition(13)
    out = (
        running_max(ds, "k", "v")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert (out["running_max"].to_numpy() == np.maximum.accumulate(vals)).all()
