"""Scale-op tests over the driver testdata tables (sf0.001)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    import ray.data as rd

    return rd.read_parquet(f"{SF}/embeddings.parquet")


def test_token_stats_matches_python(docs_ds):
    from ocr_service_ray.ops.text import token_stats

    out = docs_ds.map_batches(token_stats, batch_format="pyarrow").to_pandas()
    raw = pq.read_table(f"{SF}/documents.parquet").to_pandas()
    merged = out.merge(raw[["doc_id", "text"]], on="doc_id", suffixes=("", "_raw"))
    for _, r in merged.head(50).iterrows():
        assert r["n_tokens"] == r["text"].count(" ") + 1
        assert r["n_words"] == len(r["text"].split())
        assert r["n_chars_utf"] == len(r["text"])


def test_lang_id_and_quality(docs_ds):
    from ocr_service_ray.ops.text import lang_id, quality_score

    out = docs_ds.map_batches(lang_id, batch_format="pyarrow").to_pandas()
    assert set(out["pred_lang"]).issubset({"en", "es", "de", "fr", "ru", "und"})
    q = docs_ds.map_batches(quality_score, batch_format="pyarrow").to_pandas()
    assert ((q["quality_score"] >= 0) & (q["quality_score"] <= 1)).all()


def test_fingerprint_deterministic(docs_ds):
    from ocr_service_ray.ops.text import fingerprint

    a = docs_ds.map_batches(fingerprint, batch_format="pyarrow").to_pandas()
    b = docs_ds.map_batches(fingerprint, batch_format="pyarrow").to_pandas()
    m = a.merge(b, on="doc_id", suffixes=("_a", "_b"))
    assert (m["fingerprint_a"] == m["fingerprint_b"]).all()


def test_exact_dedup(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.dedup import exact_dedup

    df = pd.DataFrame(
        {"doc_id": [3, 1, 2, 10], "text": ["same", "same", "other", "same"]}
    )
    out = exact_dedup(rd.from_pandas(df)).to_pandas()
    assert len(out) == 2
    same = out[out["dups"] == 3].iloc[0]
    assert same["keep_id"] == 1


def test_minhash_lsh_finds_near_dups(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.dedup import minhash_lsh_candidates, ngram_jaccard

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    near = base.replace("lazy", "sleepy", 1)
    far = "completely different content about ray data pipelines and arrow tables " * 5
    df = pd.DataFrame({"doc_id": ["a", "b", "c"], "text": [base, near, far]})
    pairs = minhash_lsh_candidates(rd.from_pandas(df), threshold=0.5).to_pandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    assert ("a", "b") in found
    assert all("c" not in p for p in found)
    # LSH estimate should be in the neighborhood of the exact Jaccard.
    true_j = ngram_jaccard(base, near)
    est = pairs.set_index(["id_a", "id_b"]).loc[("a", "b"), "est_jaccard"]
    assert abs(est - true_j) < 0.25


def test_simhash_candidates(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.dedup import simhash_candidates

    base = "alpha beta gamma delta epsilon zeta eta theta " * 8
    # "tok63" pins fingerprint hamming 2 to base (≤3 — INSIDE the
    # 4×16-bit pigeonhole banding guarantee; beyond 3 a shared band is
    # not guaranteed and recall is probabilistic by design)
    near = base.replace("zeta", "tok63", 1)
    far = "unrelated words entirely here nothing shared at all " * 8
    df = pd.DataFrame({"doc_id": ["x", "y", "z"], "text": [base, near, far]})
    pairs = simhash_candidates(rd.from_pandas(df), max_hamming=6).to_pandas()
    found = set(zip(pairs["id_a"], pairs["id_b"]))
    assert ("x", "y") in found
    assert all("z" not in p for p in found)


def test_dedup_fast_hash_mode_agrees(ray_session):
    """hash="fast" (vectorized polynomial hashing, no per-gram md5)
    must surface the same verified near-dup PAIRS as the md5 oracle
    mode on a fixture corpus — the modes may differ in estimate values
    / hamming distances, never in which documents pair up."""
    import ray.data as rd

    from ocr_service_ray.ops.dedup import minhash_lsh_candidates, simhash_candidates

    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    near = base.replace("lazy", "sleepy", 1)
    near2 = base.replace("again", "anew", 2)
    far = "completely different content about ray data pipelines and arrow tables " * 5
    far2 = "cabbages and kings and sealing wax and whether pigs have wings " * 5
    df = pd.DataFrame(
        {
            "doc_id": ["a", "b", "b2", "c", "d"],
            "text": [base, near, near2, far, far2],
        }
    )

    def pairset(fn, **kw):
        p = fn(rd.from_pandas(df), **kw).to_pandas()
        return set(zip(p["id_a"], p["id_b"]))

    mh_oracle = pairset(minhash_lsh_candidates, threshold=0.5, hash="oracle")
    mh_fast = pairset(minhash_lsh_candidates, threshold=0.5, hash="fast")
    assert mh_oracle == mh_fast and ("a", "b") in mh_fast

    sh_oracle = pairset(simhash_candidates, max_hamming=10, hash="oracle")
    sh_fast = pairset(simhash_candidates, max_hamming=10, hash="fast")
    assert sh_oracle == sh_fast and ("a", "b") in sh_fast
    assert all("c" not in p and "d" not in p for p in sh_fast | mh_fast)


def test_embedding_near_dup_and_knn(emb_ds):
    from ocr_service_ray.ops.dedup import embedding_near_dup
    from ocr_service_ray.ops.similarity import knn_brute

    raw = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    q = np.asarray(raw.iloc[0]["embedding"], dtype=np.float64)

    top = knn_brute(emb_ds, q, k=5).to_pandas()
    assert len(top) == 5
    assert top.iloc[0]["vec_id"] == 0 and top.iloc[0]["cos_sim"] == pytest.approx(1.0)
    assert (top["cos_sim"].diff().dropna() <= 1e-12).all()  # descending

    # brute-force oracle in numpy
    mat = np.stack([np.asarray(v, float) for v in raw["embedding"]])
    sims = (mat @ q) / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    want = set(np.argsort(-np.round(sims, 6))[:5])
    assert set(top["vec_id"]) == {int(raw.iloc[i]["vec_id"]) for i in want}

    # random 64-dim embeddings: 0.9 cosine pairs don't exist; use 0.3
    pairs = embedding_near_dup(emb_ds, threshold=0.3).to_pandas()
    assert len(pairs) > 0
    assert (pairs["cos_sim"] >= 0.3).all()
    assert (pairs["id_a"] < pairs["id_b"]).all()
    # pairs only form within a label block
    lbl = raw.set_index("vec_id")["label"]
    assert (pairs["id_a"].map(lbl).values == pairs["id_b"].map(lbl).values).all()


def test_ivf_recall(emb_ds):
    from ocr_service_ray.ops.similarity import IvfIndex, knn_brute

    raw = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    idx = IvfIndex(nlist=8, nprobe=4).build(emb_ds, sample_size=256)
    hits = 0
    for qi in [0, 7, 42]:
        q = np.asarray(raw.iloc[qi]["embedding"], dtype=np.float64)
        brute = set(knn_brute(emb_ds, q, k=5).to_pandas()["vec_id"])
        ivf = set(idx.search(q, k=5).to_pandas()["vec_id"])
        hits += len(brute & ivf)
    assert hits / 15 >= 0.5  # probing half the cells → decent recall


def test_relational_joins(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.relational import broadcast_join, hash_join

    orders = rd.read_parquet(f"{SF}/orders.parquet")
    cust = pq.read_table(f"{SF}/customer.parquet").to_pandas()
    joined = broadcast_join(orders, cust[["c_custkey", "c_mktsegment"]].rename(
        columns={"c_custkey": "o_custkey"}), on="o_custkey").to_pandas()
    assert len(joined) == 1500 and "c_mktsegment" in joined

    li = rd.read_parquet(f"{SF}/lineitem.parquet").map_batches(
        lambda b: b.rename_columns(
            [c if c != "l_orderkey" else "o_orderkey" for c in b.schema.names]
        ),
        batch_format="pyarrow",
    )
    hj = hash_join(orders, li, on="o_orderkey", num_partitions=4).to_pandas()
    assert len(hj) == 6000  # every lineitem matches exactly one order


def test_windowed_and_sessions(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.relational import sessionize, windowed_agg

    ev = rd.read_parquet(f"{SF}/events.parquet")
    w = windowed_agg(ev).to_pandas()
    assert w["n_events"].sum() == 1000
    s = sessionize(ev, gap_minutes=30).to_pandas()
    assert s["n_events"].sum() == 1000
    assert (s["n_sessions"] >= 1).all()


def test_multimodal_stub_pipeline(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.multimodal import (
        FrameSampleStage,
        decode_pipeline,
        synthesize_media_items,
    )

    items = synthesize_media_items(50)
    out = decode_pipeline(rd.from_arrow(items), batch_size=8).to_pandas()
    assert len(out) == 50
    assert "payload" not in out.columns  # decoded payloads don't cross blocks
    assert out["content_digest"].nunique() == 50

    frames = (
        rd.from_arrow(items)
        .map_batches(FrameSampleStage, batch_format="pyarrow", batch_size=8, concurrency=(1, 2))
        .to_pandas()
    )
    assert len(frames) >= 50
    assert (frames["frame_idx"] % 10 == 0).all()


def test_ivf_probe_prunes_read(emb_ds):
    """The probe must read ONLY the probed cell partitions (VERDICT r1:
    the old probe filtered a full scan)."""
    import glob
    import os

    from ocr_service_ray.ops.similarity import IvfIndex

    idx = IvfIndex(nlist=8, nprobe=3).build(emb_ds, sample_size=256)
    q = np.asarray(
        pq.read_table(f"{SF}/embeddings.parquet").to_pandas().iloc[0]["embedding"],
        dtype=np.float64,
    )
    all_cells = glob.glob(f"{idx.index_path}/ivf_cell=*")
    probed = [p for p in idx.probe_paths(q) if os.path.isdir(p)]
    assert len(all_cells) > 3  # corpus actually spread over >nprobe cells
    assert len(probed) <= 3 < len(all_cells)  # strictly prunes the read
    got = idx.search(q, k=5).to_pandas()
    assert len(got) == 5


def test_ivf_search_all_probed_cells_absent(emb_ds):
    """A probe whose nprobe cells are all empty returns a typed empty
    result, not an IndexError (ADVICE r2). Forced by deleting the
    probed cell dirs from the written index."""
    import os
    import shutil

    from ocr_service_ray.ops.similarity import IvfIndex

    idx = IvfIndex(nlist=8, nprobe=2).build(emb_ds, sample_size=256)
    q = np.asarray(
        pq.read_table(f"{SF}/embeddings.parquet").to_pandas().iloc[3]["embedding"],
        dtype=np.float64,
    )
    for p in idx.probe_paths(q):
        if os.path.isdir(p):
            shutil.rmtree(p)
    got = idx.search(q, k=5)
    # typed empty Dataset (to_pandas drops columns on zero-row data)
    assert got.count() == 0
    assert set(got.schema().names) == {"vec_id", "cos_sim"}


def test_asof_join_matches_merge_asof(ray_session):
    """As-of join (one shuffle + in-group merge_asof) vs a driver-side
    pandas merge_asof oracle, including left rows with no match."""
    import ray.data as rd

    from ocr_service_ray.ops.relational import asof_join

    rng = np.random.RandomState(5)
    left = pd.DataFrame(
        {
            "lid": np.arange(300),
            "k": rng.randint(0, 20, 300),
            "t": rng.randint(0, 10_000, 300).astype("int64"),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.randint(0, 22, 400),  # some keys only on one side
            "t": rng.randint(0, 10_000, 400).astype("int64"),
            "rv": np.arange(400).astype("int64"),
        }
    )
    got = (
        asof_join(
            rd.from_pandas([left.iloc[i::4].copy() for i in range(4)]),
            rd.from_pandas([right.iloc[i::3].copy() for i in range(3)]),
            on="t",
            by="k",
        )
        .to_pandas()
        .sort_values("lid")
        .reset_index(drop=True)
    )
    want = (
        pd.merge_asof(
            left.sort_values("t", kind="stable"),
            right.sort_values("t", kind="stable"),
            on="t",
            by="k",
        )
        .sort_values("lid")
        .reset_index(drop=True)
    )
    assert len(got) == len(left)
    assert (got["lid"].to_numpy() == want["lid"].to_numpy()).all()
    gv, wv = got["rv"].to_numpy(float), want["rv"].to_numpy(float)
    assert ((gv == wv) | (np.isnan(gv) & np.isnan(wv))).all()
    assert np.isnan(wv).any()  # the no-match case is actually exercised


def test_broadcast_range_join(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.relational import broadcast_range_join

    df = pd.DataFrame({"v": [0.0, 4.99, 5.0, 19.9, 20.0, 99.9, 100.0, -1.0, 1e13]})
    ranges = [("low", 0.0, 5.0), ("mid", 5.0, 20.0), ("high", 20.0, 100.0), ("whale", 100.0, 1e12)]
    out = broadcast_range_join(rd.from_pandas(df), ranges, "v").to_pandas()
    got = dict(zip(out["v"], out["bucket"]))
    assert got == {
        0.0: "low", 4.99: "low", 5.0: "mid", 19.9: "mid",
        20.0: "high", 99.9: "high", 100.0: "whale",
    }  # -1.0 (below all) and 1e13 (above all) dropped


def test_lsh_index_prunes_and_matches_restricted_brute(emb_ds):
    """LshIndex: probe reads < 100% of cell partitions and the result
    equals brute-force top-k RESTRICTED to the probed cells (the exact
    contract its SQL oracle checks)."""
    import glob
    import os

    import ray.data as rd

    from ocr_service_ray.ops.similarity import LshIndex, knn_brute

    raw = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    q = np.asarray(raw.iloc[0]["embedding"], dtype=np.float64)
    idx = LshIndex(nbits=4, radius=1).build(emb_ds, dim=len(q))
    cells = idx.probe_cells(q)
    assert len(cells) == 5  # 1 + nbits of 16
    all_cells = glob.glob(f"{idx.index_path}/lsh_cell=*")
    assert len(all_cells) > len(cells)  # probe strictly prunes
    got = idx.search(q, k=5).to_pandas()
    # restricted brute oracle: same cells, full scan inside them
    files = [
        f
        for c in cells
        for f in sorted(glob.glob(f"{idx.index_path}/lsh_cell={c}/*.parquet"))
    ]
    want = knn_brute(rd.read_parquet(files), q, k=5).to_pandas()
    assert list(got["vec_id"]) == list(want["vec_id"])


def test_extract_json_int(ray_session):
    import pyarrow as pa

    from ocr_service_ray.ops.text import extract_json_int

    t = pa.table({"props": ['{"k": 69}', '{"x": 1}', None, '{"k": -3, "j": 4}']})
    out = extract_json_int(t, "props", "k")
    assert out["k"].to_pylist() == [69, None, None, -3]


def test_extract_json_int_rejects_non_integers(ray_session):
    """A float / exponent value must yield null, not its integer
    prefix (ADVICE r2: '"k": 1.5' used to extract 1)."""
    import pyarrow as pa

    from ocr_service_ray.ops.text import extract_json_int

    t = pa.table(
        {
            "props": [
                '{"k": 1.5}',
                '{"k": 2e3}',
                '{"k": 10E2}',
                '{"k": 7}',
                '{"k": -12, "z": 1.5}',
            ]
        }
    )
    out = extract_json_int(t, "props", "k")
    assert out["k"].to_pylist() == [None, None, None, 7, -12]


def test_hash_sample_and_stratified_split(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.relational import hash_sample, stratified_split

    df = pd.DataFrame({"doc_id": np.arange(5000)})
    ds = rd.from_pandas([df.iloc[i::5].copy() for i in range(5)])
    kept = hash_sample(ds, "doc_id", 0.2).to_pandas()
    assert 0.15 < len(kept) / 5000 < 0.25  # rate near p
    # determinism + layout independence: different block layout, same rows
    ds2 = rd.from_pandas([df.iloc[i::3].copy() for i in range(3)])
    kept2 = hash_sample(ds2, "doc_id", 0.2).to_pandas()
    assert set(kept["doc_id"]) == set(kept2["doc_id"])

    split = stratified_split(ds, "doc_id", 0.8).to_pandas()
    assert set(split["split"]) == {"train", "val"}
    frac = (split["split"] == "train").mean()
    assert 0.75 < frac < 0.85
    split2 = stratified_split(ds2, "doc_id", 0.8).to_pandas()
    m = split.merge(split2, on="doc_id", suffixes=("_a", "_b"))
    assert (m["split_a"] == m["split_b"]).all()


def test_grouped_distinct_count(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ocr_service_ray.ops.agg import grouped_distinct_count

    rng = np.random.default_rng(4)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 6, 3000),
            "u": rng.integers(0, 80, 3000),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(8)
    got = (
        grouped_distinct_count(ds, ["g"], "u")
        .to_pandas()
        .set_index("g")["n_distinct"]
        .sort_index()
    )
    ref = df.groupby("g")["u"].nunique()
    assert got.to_dict() == ref.to_dict()


def test_grouped_distinct_count_skips_nulls(ray_session):
    """SQL COUNT(DISTINCT col) semantics: NULL is never counted as a
    distinct value; an all-NULL group drops out of the output
    (documented divergence from SQL's zero row)."""
    import pandas as pd
    import ray.data as rd

    from ocr_service_ray.ops.agg import grouped_distinct_count

    df = pd.DataFrame(
        {
            "g": ["a", "a", "a", "b", "b", "c"],
            "u": [1.0, None, 1.0, 2.0, 3.0, None],
        }
    )
    ds = rd.from_pandas([df.iloc[:3], df.iloc[3:]])
    got = (
        grouped_distinct_count(ds, ["g"], "u")
        .to_pandas()
        .set_index("g")["n_distinct"]
        .to_dict()
    )
    assert got == {"a": 1, "b": 2}  # "c" (all-NULL) absent


def test_bigram_counts(ray_session):
    from collections import Counter

    import pyarrow as pa
    import ray.data as rd

    from ocr_service_ray.ops.text import bigram_counts

    docs = ["a b a b c", "b c", "x"]
    t = pa.table({"text": pa.array(docs)})
    got = bigram_counts(rd.from_arrow(t).repartition(3)).to_pandas()
    ref = Counter()
    for d in docs:
        toks = d.split(" ")
        ref.update(zip(toks, toks[1:]))
    assert {(r.w1, r.w2): r.n for r in got.itertuples()} == dict(ref)


def test_grouped_outliers(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ocr_service_ray.ops.agg import grouped_outliers

    rng = np.random.default_rng(3)
    base = rng.integers(90, 110, 500).astype(np.int64)
    df = pd.DataFrame({"g": rng.integers(0, 3, 500), "v": base})
    # plant extreme outliers
    df.loc[df.index[:3], "v"] = [10_000, -10_000, 9_000]
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(5)
    out = grouped_outliers(ds, ["g"], "v", k=3.0).to_pandas()
    # reference: same arithmetic
    got = set(map(tuple, out[["g", "v"]].to_numpy()))
    ref = set()
    for g, sub in df.groupby("g"):
        v = sub["v"].to_numpy(dtype=np.float64)
        n = len(v)
        mean = v.sum() / n  # ints sum exactly
        var = (sub["v"].astype(np.int64) ** 2).sum() / n - mean * mean
        for x in sub["v"]:
            if (x - mean) ** 2 > 9.0 * var:
                ref.add((g, x))
    assert got == ref and len(got) >= 3


def test_grouped_mode(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ocr_service_ray.ops.agg import grouped_mode

    rng = np.random.default_rng(2)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 4, 2000),
            "v": rng.choice(list("abcde"), 2000),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(7)
    got = grouped_mode(ds, ["g"], "v").to_pandas().set_index("g")
    for g, sub in df.groupby("g"):
        counts = sub["v"].value_counts()
        top = counts.max()
        want = min(counts[counts == top].index)  # tie → smallest value
        assert got.loc[g, "mode"] == want
        assert got.loc[g, "mode_count"] == top


def test_profile_table(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ocr_service_ray.ops.agg import profile_table

    t = pa.table(
        {
            "a": pa.array([1, 2, 2, None, 5], pa.int64()),
            "b": pa.array(["x", None, None, "y", "x"]),
        }
    )
    prof = profile_table(rd.from_arrow(t).repartition(3), ["a", "b"]).set_index(
        "column"
    )
    assert prof.loc["a", "n_rows"] == 5 and prof.loc["a", "n_null"] == 1
    assert prof.loc["a", "n_distinct"] == 3
    assert prof.loc["a", "min"] == "1" and prof.loc["a", "max"] == "5"
    assert prof.loc["b", "n_null"] == 2 and prof.loc["b", "n_distinct"] == 2
