"""CDC latest-wins apply (ops/cdc.py) vs a pandas window reference."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(df, parts=4):
    import ray.data as rd

    return rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
    ).repartition(parts)


def _ref_apply(log: pd.DataFrame) -> pd.DataFrame:
    win = (
        log.sort_values(["k", "seq"], ascending=[True, False], kind="stable")
        .groupby("k", sort=True)
        .head(1)
    )
    return (
        win[win["op"] != "d"]
        .sort_values("k")
        .reset_index(drop=True)[["k", "v", "seq", "op"]]
    )


def test_cdc_latest_wins_reference(ray_session):
    from ocr_service_ray.ops.cdc import apply_changelog

    rng = np.random.RandomState(41)
    keys = np.arange(200)
    base = pd.DataFrame(
        {"k": keys, "v": keys * 10, "seq": 0, "op": "u"}
    )
    # per-key unique seqs: version number IS the seq
    ch_rows = []
    for k in keys[keys % 3 == 0]:
        nv = rng.randint(1, 4)
        for s in range(1, nv + 1):
            op = "d" if (s == nv and k % 9 == 0) else "u"
            ch_rows.append((k, int(k * 10 + s), s, op))
    changes = pd.DataFrame(ch_rows, columns=["k", "v", "seq", "op"])
    got = (
        apply_changelog(_ds(base), _ds(changes, 3), "k")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)[["k", "v", "seq", "op"]]
    )
    ref = _ref_apply(pd.concat([base, changes], ignore_index=True))
    pd.testing.assert_frame_equal(
        got.astype({"k": "int64", "v": "int64", "seq": "int64"}),
        ref.astype({"k": "int64", "v": "int64", "seq": "int64"}),
    )
    # every key whose max-seq change is a tombstone is absent
    last = changes.sort_values("seq").groupby("k").tail(1)
    dead = set(last.loc[last["op"] == "d", "k"])
    assert dead and not got["k"].isin(dead).any()


def test_cdc_reinsert_after_delete_and_empty_base(ray_session):
    from ocr_service_ray.ops.cdc import apply_changelog

    base = pd.DataFrame({"k": [1, 2], "v": [10, 20], "seq": [0, 0], "op": ["u", "u"]})
    changes = pd.DataFrame(
        {
            "k": [1, 1, 2],
            "v": [0, 111, 0],
            "seq": [1, 2, 1],
            "op": ["d", "u", "d"],
        }
    )
    got = (
        apply_changelog(_ds(base, 2), _ds(changes, 2), "k")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    # key 1: deleted at seq 1, re-inserted at seq 2 -> survives with v=111
    # key 2: tombstone wins -> gone
    assert list(got["k"]) == [1]
    assert list(got["v"]) == [111]
    # replay from an empty (schema-only) base
    empty = base.iloc[:0]
    got2 = (
        apply_changelog(_ds(empty, 1), _ds(changes, 2), "k")
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(got2["k"]) == [1] and list(got2["v"]) == [111]
