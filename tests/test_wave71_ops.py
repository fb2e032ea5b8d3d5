"""Wave-71 ops: content-defined chunking (ops/chunking.py) and
curriculum interleave (ops/curriculum.py) — offset-independence (the
CDC property), boundary identities, exact-decile stratification,
layout invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _chunks(texts, **kw):
    import ray.data as rd

    from ocr_service_ray.ops.chunking import content_defined_chunks

    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts, pa.string()),
        }
    )
    return (
        content_defined_chunks(rd.from_arrow(tbl), **kw)
        .to_pandas()
        .sort_values(["doc_id", "chunk_idx"])
        .reset_index(drop=True)
    )


def test_cdc_offset_independence():
    rng = np.random.default_rng(12)
    vocab = [f"t{i}" for i in range(50)]
    passage = " ".join(rng.choice(vocab, size=200))
    # the same passage behind two DIFFERENT prefixes: interior chunks
    # must coincide (the property fixed-size windows lack)
    a = "xxx yyy " + passage
    b = "a b c d e f g " + passage
    ca, cb = _chunks([a])["chunk_md5"], _chunks([b])["chunk_md5"]
    shared = set(ca) & set(cb)
    # all but the first (prefix-contaminated) and possibly last chunk
    # of each doc coincide
    assert len(shared) >= len(ca) - 2
    assert len(shared) >= 3  # non-trivial chunking actually happened


def test_cdc_token_conservation_and_determinism():
    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(30)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(1, 120)))
        for _ in range(50)
    ]
    out = _chunks(texts)
    # every token lands in exactly one chunk
    for i, t in enumerate(texts):
        got = int(out[out["doc_id"] == i]["n_tokens"].sum())
        assert got == len(t.split(" "))
    # chunk_idx is dense 0..k-1 per doc
    per = out.groupby("doc_id")["chunk_idx"]
    assert (per.min() == 0).all()
    assert (per.max() == per.count() - 1).all()
    # fast mode: same conservation, different boundaries allowed
    fast = _chunks(texts, hash="fast")
    assert int(fast["n_tokens"].sum()) == int(out["n_tokens"].sum())


def test_curriculum_interleave_stratification():
    import ray.data as rd

    from ocr_service_ray.ops.curriculum import curriculum_interleave

    n = 300
    tbl = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "score": pa.array(
                np.random.default_rng(4).integers(0, 1000, n).astype(np.int64)
            ),
        }
    )
    out = (
        curriculum_interleave(rd.from_arrow(tbl), ["score", "doc_id"])
        .to_pandas()
        .sort_values("out_pos")
        .reset_index(drop=True)
    )
    # out_pos is unique; bins are exact deciles of the rank order
    assert out["out_pos"].is_unique
    assert (out.groupby("bin").size() == n // 10).all()
    # stratification: every contiguous window of 10 consecutive
    # emitted rows covers 10 distinct bins (the interleave property)
    w = out.head(10)
    assert sorted(w["bin"]) == list(range(10))
    # layout invariance
    out2 = (
        curriculum_interleave(
            rd.from_arrow(tbl).repartition(8), ["score", "doc_id"]
        )
        .to_pandas()
        .sort_values("out_pos")
        .reset_index(drop=True)
    )
    assert out.equals(out2)
