"""Wave-79: churn dataset builder and token fertility — leakage
boundaries, label correctness on a hand-built timeline."""

import numpy as np
import pyarrow as pa


def test_churn_dataset_windows_and_labels():
    import importlib.util

    import duckdb

    spec = importlib.util.spec_from_file_location(
        "re3c", "/root/repo/__ray_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    sf = "/root/testdata/sf0.001"
    got = m.queries()["churn_dataset"](sf)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    ref = con.execute(m.oracle_sql()["churn_dataset"]).fetchdf()
    assert len(got) == len(ref)
    assert list(got["label"]) == list(ref["label"])
    assert list(got["n_events"]) == list(ref["n_events"])
    # no label leakage into features: feature counts only cover the
    # feature window (verified by the oracle equality above), and
    # every emitted user has at least one feature-window event
    assert (got["n_events"] > 0).all()
    assert set(got["label"]) <= {0, 1}


def test_token_fertility_identity():
    import ray.data as rd

    from ocr_service_ray.ops.agg import grouped_agg

    # direct identity on a tiny frame: "ab cd" → 5 chars, 2 tokens
    tbl = pa.table(
        {
            "lang": pa.array(["x", "x"], pa.string()),
            "text": pa.array(["ab cd", "efg"], pa.string()),
            "n_chars": pa.array([5, 3], pa.int64()),
        }
    )
    import pyarrow.compute as pc

    def project(b):
        ntok = pc.add(pc.count_substring(b["text"], " "), pa.scalar(1)).cast(
            pa.int64()
        )
        return pa.table(
            {"lang": b["lang"], "n_chars": b["n_chars"], "n_tokens": ntok}
        )

    agg = grouped_agg(
        rd.from_arrow(tbl).map_batches(project, batch_format="pyarrow"),
        ["lang"],
        {"chars": ("n_chars", "sum"), "toks": ("n_tokens", "sum")},
    ).to_pandas()
    # 8 chars over 3 tokens → 2.666… chars/token
    assert int(agg["chars"].iloc[0]) * 1_000_000 // int(
        agg["toks"].iloc[0]
    ) == 2_666_666
