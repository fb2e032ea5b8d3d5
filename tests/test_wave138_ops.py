"""Wave-138 ops: DGIM — bucket invariants, 50% error bound,
reference parity, exactness on sparse streams."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_dgim_bucket_invariants():
    from ocr_service_ray.ops.dgim import dgim_fold

    rng = np.random.RandomState(138)
    for _ in range(20):
        bits = (rng.rand(rng.randint(1, 300)) < 0.4).astype(int).tolist()
        bk = dgim_fold(bits)
        sizes = [s for _, s in bk]
        # sizes are powers of two, at most 2 of each
        for s in set(sizes):
            assert s & (s - 1) == 0
            assert sizes.count(s) <= 2
        # positions strictly increasing, sizes non-increasing in time
        poss = [p for p, _ in bk]
        assert poss == sorted(poss)
        # total mass = number of ones
        assert sum(sizes) == sum(bits)


def test_dgim_error_bound_and_exact_when_sparse():
    from ocr_service_ray.ops.dgim import dgim_estimate, dgim_fold

    rng = np.random.RandomState(7)
    w = 16
    for _ in range(30):
        bits = (rng.rand(rng.randint(w, 400)) < 0.3).astype(int).tolist()
        bk = dgim_fold(bits)
        n = len(bits)
        true = sum(bits[-w:])
        est = dgim_estimate(bk, n, w)
        # DGIM bound: straddling bucket contributes at most half
        assert abs(est - true) <= max(1, true) * 0.5 + 1
    # all-zero stream: exact 0
    assert dgim_estimate(dgim_fold([0] * 50), 50, w) == 0
    # fewer than 3 ones ever: no merges, exact count
    bits = [0] * 30 + [1, 0, 1] + [0] * 5
    assert dgim_estimate(dgim_fold(bits), len(bits), w) == 2


def test_dgim_known_merge_cascade():
    from ocr_service_ray.ops.dgim import dgim_fold

    # four 1s: buckets sizes become [2, 1, 1] (two size-1 + merged 2)
    bk = dgim_fold([1, 1, 1, 1])
    assert sorted(s for _, s in bk) == [1, 1, 2]
    # the merged bucket carries the NEWER position of the two oldest
    assert bk[0] == (2, 2)


def test_user_dgim_end_to_end():
    import ray.data as rd

    from ocr_service_ray.ops.dgim import user_dgim

    rows = []
    for u in ("a", "b"):
        for i in range(40):
            rows.append(
                {
                    "user_id": u,
                    "ts": i,
                    "event_id": i,
                    "bit": 1 if (i * 7 + (0 if u == "a" else 3)) % 3 == 0 else 0,
                }
            )
    out = user_dgim(
        rd.from_arrow(pa.table(pd.DataFrame(rows))),
        "user_id",
        "ts",
        "bit",
        window=16,
    )
    assert len(out) == 2
    for _, r in out.iterrows():
        assert abs(r["est_w"] - r["true_w"]) <= max(1, r["true_w"]) * 0.5 + 1
        assert r["n_ones"] >= r["true_w"]
