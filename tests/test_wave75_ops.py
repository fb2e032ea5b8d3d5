"""Wave-75: MMR diverse top-k (ops/similarity.mmr_select) — diversity
beats pure relevance on a planted near-dup pool; greedy reference
equality; layout invariance."""

import numpy as np
import pyarrow as pa


def _ds(mat):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(range(len(mat)), pa.int64()),
                "embedding": pa.array(
                    list(mat.astype(np.float32)), pa.list_(pa.float32())
                ),
            }
        )
    )


def test_mmr_prefers_diverse_over_near_duplicate():
    from ocr_service_ray.ops.similarity import mmr_select

    q = np.array([1.0, 0.0, 0.0, 0.0])
    rows = [
        [0.99, 0.1, 0.0, 0.0],   # 0: most relevant
        [0.989, 0.101, 0.0, 0.0],  # 1: near-duplicate of 0
        [0.7, 0.0, 0.7, 0.0],    # 2: less relevant, diverse
        [0.988, 0.102, 0.0, 0.0],  # 3: another near-dup of 0
        [0.6, 0.0, 0.0, 0.8],    # 4: diverse
    ]
    out = mmr_select(_ds(np.array(rows)), q, k=3, pool=5)
    picked = list(out["vec_id"])
    assert picked[0] == 0  # relevance leads
    # the two diverse vectors beat the near-duplicates for slots 2-3
    assert set(picked[1:]) == {2, 4}


def test_mmr_matches_greedy_reference_any_layout():
    from ocr_service_ray.ops.similarity import mmr_select

    rng = np.random.default_rng(17)
    mat = rng.normal(size=(120, 8))
    q = rng.normal(size=8)

    def ref(mat, q, k, pool, lam=0.5):
        qd = q.astype(np.float64)
        qn = np.linalg.norm(qd) or 1.0
        m = mat.astype(np.float32).astype(np.float64)
        norms = np.linalg.norm(m, axis=1)
        norms[norms == 0] = 1.0
        rel = np.round((m @ qd) / (norms * qn), 6)
        order = sorted(range(len(m)), key=lambda i: (-rel[i], i))[:pool]
        relm = {i: rel[i] for i in order}

        def cos(a, b):
            na = np.linalg.norm(a) or 1.0
            nb = np.linalg.norm(b) or 1.0
            return float(np.round((a @ b) / (na * nb), 6))

        sel = [min(order, key=lambda i: (-relm[i], i))]
        while len(sel) < k:
            best, bs = None, None
            for c in sorted(i for i in order if i not in sel):
                ms = max(cos(m[c], m[s]) for s in sel)
                sc = (lam * relm[c]) - ((1.0 - lam) * ms)
                if bs is None or sc > bs:
                    best, bs = c, sc
            sel.append(best)
        return sel

    expect = ref(mat, q, k=5, pool=20)
    o1 = mmr_select(_ds(mat), q, k=5, pool=20)
    assert list(o1["vec_id"]) == expect
    o2 = mmr_select(_ds(mat).repartition(9), q, k=5, pool=20)
    assert list(o2["vec_id"]) == expect
