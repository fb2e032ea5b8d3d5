"""Wave-19 ops: exact PPJoin-style Jaccard pair join and growth
accounting — vs brute-force Python references."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ds(table: dict):
    import ray.data as rd

    return rd.from_arrow(pa.table(table))


def _ts(days):
    base = np.datetime64("2024-03-01", "us")
    return [base + np.timedelta64(int(d) * 86_400_000_000, "us") for d in days]


def _brute_jaccard_pairs(ids, texts, ngram, t_ppm):
    sets = {}
    for i, t in zip(ids, texts):
        ws = t.split()
        sets[i] = {
            " ".join(ws[j : j + ngram]) for j in range(len(ws) - ngram + 1)
        }
    out = []
    ks = sorted(sets)
    for x in range(len(ks)):
        for y in range(x + 1, len(ks)):
            a, b = sets[ks[x]], sets[ks[y]]
            if not a or not b:
                continue
            ni = len(a & b)
            jp = (1_000_000 * ni) // (len(a) + len(b) - ni)
            if jp >= t_ppm:
                out.append((ks[x], ks[y], ni, jp))
    return sorted(out)


def test_jaccard_pair_join_brute_force():
    from ocr_service_ray.ops.similarity import jaccard_pair_join

    rng = np.random.RandomState(13)
    vocab = [f"w{i}" for i in range(12)]
    ids, texts = [], []
    base = " ".join(rng.choice(vocab, 30))
    for i in range(20):
        ids.append(i)
        if i % 4 == 0:
            # near-duplicate family: base with a small tail tweak
            texts.append(base + " " + " ".join(rng.choice(vocab, 2)))
        else:
            texts.append(" ".join(rng.choice(vocab, 25)))
    got = (
        jaccard_pair_join(
            _ds({"doc_id": ids, "text": texts}),
            "doc_id",
            "text",
            ngram=3,
            threshold_ppm=400_000,
        )
        .to_pandas()
        .sort_values(["id_a", "id_b"])
    )
    expect = _brute_jaccard_pairs(ids, texts, 3, 400_000)
    assert (
        list(map(tuple, got[["id_a", "id_b", "n_inter", "jac_ppm"]].to_numpy()))
        == expect
    )
    assert len(expect) >= 3  # the planted family must actually pair


def test_jaccard_pair_join_no_pairs():
    from ocr_service_ray.ops.similarity import jaccard_pair_join

    # fully distinct docs -> no output rows, schema intact
    out = jaccard_pair_join(
        _ds(
            {
                "doc_id": [1, 2],
                "text": ["a b c d e", "x y z q r"],
            }
        ),
        threshold_ppm=300_000,
    ).to_pandas()
    assert len(out) == 0


def test_growth_accounting_classification():
    from ocr_service_ray.ops.retention import growth_accounting

    # u1 active days 0,1,3 -> new@0, retained@1, resurrected@3
    # u2 active day 1      -> new@1
    days = [0, 1, 3, 1]
    users = [1, 1, 1, 2]
    out = (
        growth_accounting(_ds({"user_id": users, "ts": _ts(days)}))
        .to_pandas()
        .set_index(["day", "category"])["n_keys"]
        .to_dict()
    )
    base = min(k[0] for k in out)
    shifted = {(k[0] - base, k[1]): v for k, v in out.items()}
    assert shifted == {
        (0, "new"): 1,
        (1, "retained"): 1,
        (1, "new"): 1,
        (3, "resurrected"): 1,
    }
