"""Greedy max-coverage (ops/setcover.py) vs an in-memory reference."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _docs_ds(texts, parts=4):
    import ray.data as rd

    return rd.from_arrow(
        pa.Table.from_pandas(
            pd.DataFrame(
                {"doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}
            ),
            preserve_index=False,
        )
    ).repartition(parts)


def _ref_greedy(texts, k, unit="word"):
    sets = []
    for t in texts:
        ws = t.split() if t else []
        sets.append(
            set(ws) if unit == "word" else {f"{a} {b}" for a, b in zip(ws, ws[1:])}
        )
    covered: set = set()
    out = []
    for rank in range(k):
        gains = [(len(s - covered), i) for i, s in enumerate(sets)]
        gain, neg = max((g, -i) for g, i in gains)
        pick = -neg
        if gain == 0:
            break
        covered |= sets[pick]
        out.append((rank, pick, gain, len(covered)))
    return pd.DataFrame(
        out, columns=["sel_rank", "id", "gain", "covered_total"]
    ).astype("int64")


def test_max_coverage_matches_reference(ray_session):
    from ocr_service_ray.ops.setcover import greedy_max_coverage

    rng = np.random.RandomState(13)
    words = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(words, rng.randint(2, 15)))
        for _ in range(60)
    ]
    for unit in ("word", "bigram"):
        got = greedy_max_coverage(_docs_ds(texts), "doc_id", "text", 8, unit=unit)
        ref = _ref_greedy(texts, 8, unit=unit)
        pd.testing.assert_frame_equal(got, ref)
        # invariants: gains non-increasing, covered_total = cumsum(gain)
        g = got["gain"].to_numpy()
        assert (np.diff(g) <= 0).all()
        assert (got["covered_total"].to_numpy() == np.cumsum(g)).all()


def test_max_coverage_early_stop(ray_session):
    from ocr_service_ray.ops.setcover import greedy_max_coverage

    # 2 distinct docs cover the whole universe -> stops after 2
    texts = ["a b c", "c d", "a b", "d"]
    got = greedy_max_coverage(_docs_ds(texts, 2), "doc_id", "text", 10)
    assert list(got["id"]) == [0, 1]
    assert list(got["gain"]) == [3, 1]
    assert list(got["covered_total"]) == [3, 4]
