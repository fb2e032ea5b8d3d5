"""Wave-80: RFM decile scoring and per-source chunk-duplication
share — decile arithmetic on a hand-built frame, dup-share identity
on a corpus with one known repeated chunk."""

import importlib.util

import duckdb
import numpy as np


def _entry():
    spec = importlib.util.spec_from_file_location(
        "re3w80", "/root/repo/__ray_entry__.py"
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_rfm_scores_oracle_and_decile_shape():
    m = _entry()
    sf = "/root/testdata/sf0.001"
    got = m.queries()["rfm_scores"](sf)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    ref = con.execute(m.oracle_sql()["rfm_scores"]).fetchdf()
    assert len(got) == len(ref)
    for c in ("user_id", "r_decile", "f_decile", "m_decile", "rfm_code"):
        assert list(got[c]) == list(ref[c]), c
    # decile cuts partition the population: each decile holds
    # floor/ceil(n/10) users, exactly
    n = len(got)
    for c in ("r_decile", "f_decile", "m_decile"):
        counts = got[c].value_counts()
        assert set(got[c]) <= set(range(10))
        assert counts.min() >= n // 10
        assert counts.max() <= -(-n // 10)
    # rfm_code decomposes back into its three digits
    assert (
        (got["rfm_code"] // 100 == got["r_decile"])
        & ((got["rfm_code"] // 10) % 10 == got["f_decile"])
        & (got["rfm_code"] % 10 == got["m_decile"])
    ).all()


def test_chunk_dup_share_identity():
    """A corpus where source A repeats one chunk-sized text twice and
    source B is all-unique: A's dup share counts exactly the repeated
    chunks, B's is zero."""
    import pyarrow as pa
    import ray.data as rd

    from ocr_service_ray.ops.agg import grouped_agg
    from ocr_service_ray.ops.chunking import content_defined_chunks
    from ocr_service_ray.ops.relational import hash_join
    import pyarrow.compute as pc

    rep = "the same boilerplate paragraph appears twice verbatim here"
    uniq = ["alpha beta gamma delta", "epsilon zeta eta theta"]
    tbl = pa.table(
        {
            "doc_id": pa.array(["a1", "a2", "b1", "b2"], pa.string()),
            "text": pa.array([rep, rep] + uniq, pa.string()),
            "source": pa.array(["A", "A", "B", "B"], pa.string()),
        }
    )
    docs = rd.from_arrow(tbl)
    chunks = content_defined_chunks(docs)
    counts = grouped_agg(chunks, ["chunk_md5"], {"occ": (None, "count")})
    with_src = hash_join(chunks, docs.select_columns(["doc_id", "source"]), on="doc_id")
    with_cnt = hash_join(with_src, counts, on="chunk_md5")

    def mark(b):
        return pa.table(
            {
                "source": b["source"],
                "is_dup": pc.cast(pc.greater(b["occ"], 1), pa.int64()),
            }
        )

    out = (
        grouped_agg(
            with_cnt.map_batches(mark, batch_format="pyarrow"),
            ["source"],
            {"n_chunks": (None, "count"), "n_dup": ("is_dup", "sum")},
        )
        .to_pandas()
        .set_index("source")
    )
    # every chunk of the repeated doc occurs >=2x; B has no repeats
    assert out.loc["A", "n_dup"] == out.loc["A", "n_chunks"]
    assert out.loc["B", "n_dup"] == 0
