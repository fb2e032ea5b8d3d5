"""Wave-70 ops: incremental delta dedup (ops/incremental.py) and
power-iteration top component (ops/pca.py) — planted duplicates with
known classifications, numpy reference equality, layout invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _tbl(ids, texts):
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )


def test_delta_dedup_planted_classifications():
    import ray.data as rd

    from ocr_service_ray.ops.incremental import delta_dedup

    base_text = "the quick brown fox jumps over the lazy dog again and again"
    near_text = "the quick brown fox jumps over the lazy dog again and AGAIN"
    base = _tbl(
        [1, 2, 3],
        [base_text, "completely different content here folks", "third base doc"],
    )
    delta = _tbl(
        [10, 11, 12, 13, 14],
        [
            base_text,  # exact dup of base 1
            near_text,  # near dup of base 1
            "wholly novel delta content never seen before",
            "repeated delta content xyz",  # first occurrence → unique
            "repeated delta content xyz",  # exact dup of delta 13
        ],
    )
    out = delta_dedup(rd.from_arrow(base), rd.from_arrow(delta))
    got = dict(zip(out["doc_id"], zip(out["status"], out["match_id"])))
    assert got[10] == ("dup_exact", 1)
    assert got[11] == ("dup_near", 1)
    assert got[12] == ("unique", -1)
    assert got[13] == ("unique", -1)
    assert got[14] == ("dup_exact", 13)


def test_delta_dedup_layout_invariance():
    import ray.data as rd

    from ocr_service_ray.ops.incremental import delta_dedup

    rng = np.random.default_rng(6)
    vocab = [f"tok{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(5, 25)))
        for _ in range(100)
    ]
    # plant some cross-side dups
    texts[60] = texts[5]
    texts[70] = texts[6] + " tail"
    base = _tbl(list(range(50)), texts[:50])
    delta = _tbl(list(range(50, 100)), texts[50:])
    o1 = delta_dedup(rd.from_arrow(base), rd.from_arrow(delta))
    o2 = delta_dedup(
        rd.from_arrow(base).repartition(7), rd.from_arrow(delta).repartition(5)
    )
    assert o1.equals(o2)
    assert dict(zip(o1["doc_id"], o1["status"]))[60] == "dup_exact"


def _pca_reference(X: np.ndarray, iters: int) -> np.ndarray:
    from ocr_service_ray.ops.pca import fixed_order_dot

    dim = X.shape[1]
    v = np.zeros(dim, dtype=np.float64)
    v[0] = 1.0
    for _ in range(iters):
        t = fixed_order_dot(X, v)
        s = (
            np.floor(t[:, None] * X * 1_000_000.0 + 0.5)
            .astype(np.int64)
            .sum(axis=0)
        )
        m = int(np.abs(s).max())
        v = s.astype(np.float64) / float(m)
    return np.floor(v * 1_000_000.0 + 0.5).astype(np.int64)


def test_pca_matches_reference_and_layout_invariant():
    import ray.data as rd

    from ocr_service_ray.ops.pca import pca_top_component

    rng = np.random.default_rng(2)
    # anisotropic cloud: dominant direction along dims 0+1
    base = rng.normal(size=(400, 8)).astype(np.float32)
    base[:, 0] *= 4.0
    base[:, 1] *= 2.0
    tbl = pa.table(
        {"embedding": pa.array(list(base), pa.list_(pa.float32()))}
    )
    ref = _pca_reference(base.astype(np.float64), iters=3)
    got = pca_top_component(rd.from_arrow(tbl), iters=3)
    assert list(got["v_micro"]) == list(ref)
    got2 = pca_top_component(rd.from_arrow(tbl).repartition(9), iters=3)
    assert list(got2["v_micro"]) == list(ref)
    # the dominant dim carries the largest |component|
    assert int(np.abs(got["v_micro"]).idxmax()) == 0


def test_pca_degenerate_all_zero():
    import ray.data as rd

    from ocr_service_ray.ops.pca import pca_top_component

    tbl = pa.table(
        {
            "embedding": pa.array(
                [[0.0] * 4 for _ in range(10)], pa.list_(pa.float32())
            )
        }
    )
    out = pca_top_component(rd.from_arrow(tbl), iters=2)
    # stays at the e1 start vector instead of dividing by zero
    assert list(out["v_micro"]) == [1_000_000, 0, 0, 0]
