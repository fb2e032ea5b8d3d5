"""Property tests for session-6 ops: the distributed inversion fold,
the Merkle checksum tree, and the banded window join — each checked
against a brute-force reference and for partition-layout invariance."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _entry():
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "__ray_entry__.py",
    )
    spec = importlib.util.spec_from_file_location("_entry_s6", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_checksum_tree_layout_invariant_and_root(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.diff import checksum_tree, table_checksum

    rng = np.random.default_rng(5)
    df = pd.DataFrame(
        {
            "id": np.arange(200, dtype=np.int64),
            "kind": rng.choice(["a", "b", "c"], 200),
            "part": rng.integers(0, 4, 200).astype(np.int64),
        }
    )
    t = pa.Table.from_pandas(df, preserve_index=False)
    a = checksum_tree(rd.from_arrow(t), ["id", "kind"], "part")
    b = checksum_tree(rd.from_arrow(t).repartition(7), ["id", "kind"], "part")
    assert a.equals(b)  # layout-invariant
    # leaves match per-partition table_checksum
    for p, g in df.groupby("part"):
        leaf = a[a["part"] == p]
        ref = table_checksum(
            rd.from_arrow(pa.Table.from_pandas(g, preserve_index=False)),
            ["id", "kind"],
        )
        assert int(leaf["checksum"].iloc[0]) == int(ref["checksum"].iloc[0])
        assert int(leaf["n_rows"].iloc[0]) == len(g)
    # root changes when any leaf changes
    df2 = df.copy()
    df2.loc[0, "kind"] = "zz"
    c = checksum_tree(
        rd.from_arrow(pa.Table.from_pandas(df2, preserve_index=False)),
        ["id", "kind"],
        "part",
    )
    assert (
        int(c[c["part"] == -1]["checksum"].iloc[0])
        != int(a[a["part"] == -1]["checksum"].iloc[0])
    )


def test_inversion_count_matches_bruteforce(ray_session, tmp_path):
    # drive the query function itself on a synthetic events parquet
    rng = np.random.default_rng(9)
    n = 400
    ts = pd.to_datetime(
        np.sort(rng.choice(10**9, n, replace=False)), unit="s"
    )
    order = rng.permutation(n)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts[order],  # shuffle time against id
            "user_id": rng.integers(0, 20, n).astype(np.int64),
            "event_type": ["purchase"] * n,
            "value": rng.integers(1, 50000, n) / 100.0,
            "props": ["{}"] * n,
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    t = pa.Table.from_pandas(df, preserve_index=False)
    t = t.set_column(
        t.schema.get_field_index("ts"),
        "ts",
        t["ts"].cast(pa.timestamp("us")),
    )
    pa.parquet.write_table(t, str(sf / "events.parquet"))
    mod = _entry()
    out = mod.queries()["inversion_count_purchases"](str(sf))
    out = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    # brute force on (ts, event_id) order
    d = df.sort_values(["ts", "event_id"])
    cents = np.floor(d["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    iu, ju = np.triu_indices(n, k=1)
    want = int((cents[iu] > cents[ju]).sum())
    assert int(out["inversions"].iloc[0]) == want
    assert int(out["n_rows"].iloc[0]) == n


def test_purchase_density_window_matches_bruteforce(ray_session, tmp_path):
    rng = np.random.default_rng(13)
    n = 300
    t_us = np.sort(rng.choice(86_400_000_000, n, replace=False)).astype(np.int64)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(t_us, unit="us"),
            "user_id": np.zeros(n, dtype=np.int64),
            "event_type": ["purchase"] * n,
            "value": np.ones(n),
            "props": ["{}"] * n,
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    t = pa.Table.from_pandas(df, preserve_index=False)
    # testdata contract: ts is timestamp[us] (pandas defaults to ns)
    t = t.set_column(
        t.schema.get_field_index("ts"),
        "ts",
        t["ts"].cast(pa.timestamp("us")),
    )
    pa.parquet.write_table(t, str(sf / "events.parquet"))
    mod = _entry()
    out = mod.queries()["purchase_density_window"](str(sf))
    out = (out if isinstance(out, pd.DataFrame) else out.to_pandas()).sort_values(
        "event_id"
    )
    H = 3_600_000_000
    want = ((np.abs(t_us[:, None] - t_us[None, :]) < H).sum(axis=1) - 1).astype(
        np.int64
    )
    assert (out["n_nearby"].to_numpy(np.int64) == want).all()
