"""grouped_topk / cumulative_by_key (ops/relational.py): per-group
top-k vs a pandas window reference across block layouts; running
totals vs a pandas cumsum reference; tie determinism."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ocr_service_ray.ops.relational import cumulative_by_key, grouped_topk


def _events(n=400, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "grp": rng.integers(0, 7, n),
            "val_cents": rng.integers(0, 500, n).astype(np.int64),
            "ord": rng.integers(0, 10_000, n).astype(np.int64),
        }
    )


@pytest.mark.parametrize("nblocks", [1, 9])
def test_grouped_topk_matches_window(ray_session, nblocks):
    import ray.data as rd

    df = _events()
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(
        nblocks
    )
    got = (
        grouped_topk(ds, ["grp"], ["val_cents", "event_id"], 3, [True, False])
        .to_pandas()
        .sort_values(["grp", "val_cents", "event_id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    ref = (
        df.sort_values(["val_cents", "event_id"], ascending=[False, True])
        .groupby("grp", sort=False)
        .head(3)
        .sort_values(["grp", "val_cents", "event_id"], ascending=[True, False, True])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[ref.columns.tolist()], ref)


def test_grouped_topk_small_groups(ray_session):
    # groups smaller than k emit all their rows
    import ray.data as rd

    df = pd.DataFrame({"grp": [1, 1, 2], "v": [5, 3, 9], "id": [0, 1, 2]})
    got = grouped_topk(
        rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)),
        ["grp"],
        ["v", "id"],
        5,
        [True, False],
    ).to_pandas()
    assert len(got) == 3


def test_cumulative_by_key(ray_session):
    import ray.data as rd

    df = _events(300, seed=11)
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(7)
    got = (
        cumulative_by_key(ds, "grp", ["ord", "event_id"], "val_cents")
        .to_pandas()
        .sort_values(["grp", "ord", "event_id"])
        .reset_index(drop=True)
    )
    ref = df.sort_values(["ord", "event_id"]).copy()
    ref["running_total"] = ref.groupby("grp")["val_cents"].cumsum()
    ref = ref.sort_values(["grp", "ord", "event_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[ref.columns.tolist()], ref)


def test_grouped_sequence(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.relational import grouped_sequence

    df = _events(200, seed=21)
    df["tag"] = np.array(["abcdef"[i] for i in df["val_cents"] % 6])
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(6)
    got = (
        grouped_sequence(ds, "grp", ["ord", "event_id"], "tag")
        .to_pandas()
        .set_index("grp")
    )
    for g, sub in df.groupby("grp"):
        ref = ",".join(sub.sort_values(["ord", "event_id"])["tag"])
        assert got.loc[g, "seq"] == ref
        assert got.loc[g, "n_events"] == len(sub)
