"""Wave-73: ANN recall eval (ops/similarity.ann_recall_eval) and BPE
first-merge pair counts (ops/text.bpe_merge_pairs)."""

import numpy as np
import pyarrow as pa


def test_ann_recall_perfect_for_exhaustive_index():
    import ray.data as rd

    from ocr_service_ray.ops.similarity import LshIndex, ann_recall_eval

    rng = np.random.default_rng(3)
    mat = rng.normal(size=(200, 8)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(200), pa.int64()),
            "embedding": pa.array(list(mat), pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(tbl)
    # radius = nbits probes EVERY cell → the restricted search IS
    # brute force → recall must be exactly 1e6 for every query
    idx = LshIndex(nbits=4, radius=4).build(ds, dim=8)
    out = ann_recall_eval(ds, idx, mat[:5].astype(np.float64), k=5)
    assert list(out["query_id"]) == [0, 1, 2, 3, 4]
    assert (out["recall_ppm"] == 1_000_000).all()


def test_ann_recall_degrades_with_tight_probe():
    import ray.data as rd

    from ocr_service_ray.ops.similarity import LshIndex, ann_recall_eval

    rng = np.random.default_rng(9)
    mat = rng.normal(size=(300, 8)).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(300), pa.int64()),
            "embedding": pa.array(list(mat), pa.list_(pa.float32())),
        }
    )
    ds = rd.from_arrow(tbl)
    wide = ann_recall_eval(
        ds, LshIndex(nbits=4, radius=4).build(ds, dim=8), mat[:8].astype(np.float64)
    )
    tight = ann_recall_eval(
        ds, LshIndex(nbits=4, radius=0).build(ds, dim=8), mat[:8].astype(np.float64)
    )
    assert int(tight["recall_ppm"].sum()) <= int(wide["recall_ppm"].sum())
    assert (tight["recall_ppm"] <= 1_000_000).all()


def test_bpe_merge_pairs_hand_computed():
    import ray.data as rd

    from ocr_service_ray.ops.text import bpe_merge_pairs

    tbl = pa.table(
        {"text": pa.array(["aaab aab", "ab ba"], pa.string())}
    )
    out = bpe_merge_pairs(rd.from_arrow(tbl), top_k=10)
    got = dict(zip(out["pair"], out["n"]))
    # "aaab": aa,aa,ab  "aab": aa,ab  "ab": ab  "ba": ba
    assert got == {"aa": 3, "ab": 3, "ba": 1}
    # deterministic tie order: (n DESC, pair ASC)
    assert list(out["pair"][:2]) == ["aa", "ab"]


def test_bpe_merge_pairs_layout_invariance():
    import ray.data as rd

    from ocr_service_ray.ops.text import bpe_merge_pairs

    rng = np.random.default_rng(10)
    texts = [
        " ".join(
            "".join(rng.choice(list("abcdef"), size=rng.integers(1, 8)))
            for _ in range(rng.integers(1, 15))
        )
        for _ in range(80)
    ]
    tbl = pa.table({"text": pa.array(texts, pa.string())})
    o1 = bpe_merge_pairs(rd.from_arrow(tbl))
    o2 = bpe_merge_pairs(rd.from_arrow(tbl).repartition(7))
    assert o1.equals(o2)
