"""Wave-51 ops: Bloom-filter semi-join pruning (ops/bloom.py) and
rare-gram-blocked containment pairs (ops/containment.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_bloom_no_false_negatives_and_prunes(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.bloom import (
        bloom_membership,
        build_bloom,
        bloom_semi_join,
    )

    rng = np.random.RandomState(7)
    keys = rng.choice(1_000_000, size=500, replace=False).astype(np.int64)
    probe = np.arange(0, 1_000_000, 37, dtype=np.int64)

    ds = rd.from_arrow(pa.table({"k": keys}))
    bloom = build_bloom(ds, "k", num_bits=1 << 16)

    member = bloom_membership(pa.array(probe), bloom)
    truth = np.isin(probe, keys)
    # no false negatives
    assert member[truth].all()
    # the filter actually prunes (fp rate far below 50%)
    assert member.sum() < 0.1 * len(probe)

    # semi-join equals exact semi-join bit for bit
    fact = rd.from_arrow(pa.table({"k": probe, "v": probe * 3}))
    got = (
        bloom_semi_join(fact, keys.tolist(), on="k", num_bits=1 << 16)
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        pd.DataFrame({"k": probe, "v": probe * 3})[truth]
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)


def test_bloom_partial_merge_layout_invariant(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.bloom import build_bloom

    keys = np.arange(1000, dtype=np.int64) * 17
    t = pa.table({"k": keys})
    one = build_bloom(rd.from_arrow(t), "k", num_bits=1 << 14)
    many = build_bloom(rd.from_arrow(t).repartition(7), "k", num_bits=1 << 14)
    assert (one == many).all()


def _brute_containment(df, n, tau_ppm):
    """All-pairs reference (no blocking): containment over distinct
    gram STRING sets — hash-free ground truth."""

    def grams(t):
        toks = t.split(" ")
        return {
            " ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)
        }

    g = {r.doc_id: grams(r.text) for r in df.itertuples()}
    rows = []
    ids = sorted(g)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            ga, gb = g[a], g[b]
            if len(ga) < len(gb) or (len(ga) == len(gb)):
                small, big, gs, gl = a, b, ga, gb
            else:
                small, big, gs, gl = b, a, gb, ga
            if not gs:
                continue
            inter = len(gs & gl)
            ppm = (1_000_000 * inter) // len(gs)
            if ppm >= tau_ppm:
                rows.append((small, big, len(gs), inter, ppm))
    return sorted(rows)


def test_containment_finds_planted_subset(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.containment import containment_pairs

    rng = np.random.RandomState(3)
    vocab = [f"w{i}" for i in range(300)]
    texts, ids = [], []
    for i in range(40):
        ids.append(i)
        texts.append(" ".join(rng.choice(vocab, size=60)))
    # planted: doc 100 is a strict 20-token slice of doc 5
    ids.append(100)
    texts.append(" ".join(texts[5].split(" ")[10:30]))
    df = pd.DataFrame({"doc_id": ids, "text": texts})

    got = (
        containment_pairs(
            rd.from_pandas(df).repartition(4), n=3, max_df=6, tau_ppm=900_000
        )
        .to_pandas()
        .sort_values(["id_small", "id_big"])
    )
    assert ((got["id_small"] == 100) & (got["id_big"] == 5)).any()
    row = got[(got["id_small"] == 100) & (got["id_big"] == 5)].iloc[0]
    assert row["containment_ppm"] == 1_000_000

    # rare-gram blocking is lossless here: every brute-force pair with
    # a rare shared gram is found with identical integers
    brute = _brute_containment(df, 3, 900_000)
    got_rows = sorted(
        tuple(int(x) for x in r)
        for r in got[
            ["id_small", "id_big", "n_small", "inter", "containment_ppm"]
        ].to_numpy()
    )
    # brute has no blocking; got ⊆ brute always
    assert set(got_rows) <= set(brute)
    # the planted pair shares rare grams, so it must survive blocking
    assert (100, 5, 18, 18, 1_000_000) in got_rows


def test_containment_fast_hash_mode_same_pairs(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.containment import containment_pairs

    rng = np.random.RandomState(11)
    vocab = [f"t{i}" for i in range(150)]
    texts = [" ".join(rng.choice(vocab, size=40)) for _ in range(30)]
    texts.append(texts[4])  # exact dup
    df = pd.DataFrame({"doc_id": range(31), "text": texts})
    ds = rd.from_pandas(df).repartition(3)

    a = (
        containment_pairs(ds, n=3, max_df=6, tau_ppm=500_000, hash="oracle")
        .to_pandas()
        .sort_values(["id_small", "id_big"])
        .reset_index(drop=True)
    )
    b = (
        containment_pairs(ds, n=3, max_df=6, tau_ppm=500_000, hash="fast")
        .to_pandas()
        .sort_values(["id_small", "id_big"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
