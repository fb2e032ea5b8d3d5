"""Wave-77: redaction completeness audit and multi-hop broadcast
denormalization — zero-residual invariant, known tiny fixtures."""

import numpy as np
import pyarrow as pa


def test_redaction_residual_is_zero_for_covering_rules():
    import ray.data as rd
    import pyarrow.compute as pc

    from ocr_service_ray.ops.agg import global_agg
    from ocr_service_ray.ops.quality_rules import redact_patterns

    tbl = pa.table(
        {
            "id": pa.array([1, 2, 3], pa.int64()),
            "t": pa.array(
                ["abc 1234 x9", "no digits here", "7 77 777"], pa.string()
            ),
        }
    )
    rules = [("num", "[0-9]{2,}", "<NUM>"), ("digit", "[0-9]", "#")]
    red = redact_patterns(rd.from_arrow(tbl), "t", rules, keep_cols=["id"])

    def residual(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "res": pc.cast(
                    pc.count_substring_regex(b["t"], "[0-9]"), pa.int64()
                ),
                "n_num": b["n_num"],
                "n_digit": b["n_digit"],
            }
        )

    tot = global_agg(
        red.map_batches(residual, batch_format="pyarrow"),
        {
            "res": ("res", "sum"),
            "n_num": ("n_num", "sum"),
            "n_digit": ("n_digit", "sum"),
        },
    )
    assert int(tot["res"]) == 0  # the two rules together cover all digits
    # "1234", "77", "777" → 3 multi-digit runs; then "9" and "7" single
    assert int(tot["n_num"]) == 3
    assert int(tot["n_digit"]) == 2


def test_denormalize_rollup_matches_pandas_reference():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "re3t", "/root/repo/__ray_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    import duckdb

    sf = "/root/testdata/sf0.001"
    got = m.queries()["denormalize_orders"](sf)
    con = duckdb.connect()
    for t in ["orders", "customer", "nation", "region"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    ref = con.execute(m.oracle_sql()["denormalize_orders"]).fetchdf()
    assert len(got) == len(ref)
    assert int(got["revenue_cents"].sum()) == int(ref["revenue_cents"].sum())
    assert int(got["n_orders"].sum()) == int(ref["n_orders"].sum())
