"""In-pytest oracle parity gate: a fast subset of the driver's
DuckDB-oracle comparison (scripts/check_correctness.py) runs at
sf0.001 on every test run, so a drift between a kernel/generative
rule and its SQL mirror is caught immediately instead of at the next
round gate. The full 52-query harness still runs via the script."""

import os
import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"

# The drift-prone subset: everything whose oracle re-derives a
# generative / hash rule that lives in Python source.
SUBSET = [
    "flagship_extraction",
    "render_text",
    "consensus_suggestions",
    "corpus_summary",
    "minhash_dedup",
    "dedup_clusters",
    "dup_ngram_stats",
    "hll_users",
    "bm25_docs",
    "decontam_pairs",
    "grouped_topk_events",
    "event_value_quantiles",
    "label_centroid_sums",
    "distinct_users_per_type",
    "inverted_search",
    "pack_sequences",
    "user_event_sequences",
    "bigram_top",
    "outlier_events",
    "mode_priority",
    "profile_orders",
    "weighted_sample_events",
    "snapshot_diff",
    "running_user_value",
    "simhash_dedup",
    "lsh_knn",
    "classify_docs",
    "fingerprint",
    "multimodal_decode",
    "multimodal_routed",
    "simple_spell",
    "html_main_content",
    "next_epoch",
]


@pytest.fixture(scope="module")
def entry_module(ray_session):
    import importlib.util

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "__ray_entry__.py")
    spec = importlib.util.spec_from_file_location("_entry_for_tests", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_object_dtype(df[c]):
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", SUBSET)
def test_oracle_parity(entry_module, duck, name):
    import pyarrow as pa

    qs = entry_module.queries()
    oracles = entry_module.oracle_sql()
    assert name in oracles, f"{name} lost its oracle"
    result = qs[name](SF)
    if isinstance(result, pa.Table):
        ray_df = result.to_pandas()
    elif isinstance(result, pd.DataFrame):
        ray_df = result
    else:
        ray_df = result.to_pandas()
    sql_df = duck.execute(oracles[name]).fetchdf()
    assert sorted(ray_df.columns) == sorted(sql_df.columns)
    assert len(ray_df) == len(sql_df)
    a, b = _canon(ray_df), _canon(sql_df)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            assert (
                (a[c].to_numpy() == b[c].to_numpy())
                | (a[c].isna().to_numpy() & b[c].isna().to_numpy())
            ).all(), c
        else:
            assert a[c].equals(b[c]), c
