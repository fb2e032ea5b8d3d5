"""BPE vocabulary induction (ops/bpe.py) — byte-exact against an
independent reference implementation, the published worked example,
and driver-path == distributed-path equality."""

import numpy as np
import pandas as pd
import pyarrow as pa


def _ref_learn_bpe(texts, num_merges, min_count=2):
    """Independent reference: re-scans the CORPUS (not the word-freq
    table) every round — a structurally different implementation that
    must produce the identical merge list."""
    corpora = [
        [list(w) + ["</w>"] for w in t.split()] for t in texts if t
    ]
    merges = []
    for rank in range(num_merges):
        counts = {}
        for doc in corpora:
            for syms in doc:
                for a, b in zip(syms, syms[1:]):
                    counts[(a, b)] = counts.get((a, b), 0) + 1
        if not counts:
            break
        (l, r), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_count:
            break
        merges.append((rank, l, r, n))
        for doc in corpora:
            for j, syms in enumerate(doc):
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                        out.append(l + r)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                doc[j] = out
    return pd.DataFrame(
        merges, columns=["merge_rank", "left", "right", "pair_count"]
    )


def _docs_ds(texts):
    import ray.data as rd

    return rd.from_arrow(
        pa.Table.from_pandas(pd.DataFrame({"text": texts}), preserve_index=False)
    ).repartition(4)


def test_bpe_sennrich_worked_example(ray_session):
    from ocr_service_ray.ops.bpe import learn_bpe

    # the ACL-2016 example corpus: low x5, lower x2, newest x6, widest x3
    text = " ".join(
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    m = learn_bpe(_docs_ds([text]), "text", 6)
    got = list(zip(m["left"], m["right"], m["pair_count"]))
    assert got == [
        ("e", "s", 9),
        ("es", "t", 9),
        ("est", "</w>", 9),
        ("l", "o", 7),
        ("lo", "w", 7),
        ("e", "w", 6),
    ]


def test_bpe_matches_independent_reference(ray_session):
    from ocr_service_ray.ops.bpe import learn_bpe

    rng = np.random.RandomState(17)
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "abcab"]
    texts = [
        " ".join(rng.choice(words, rng.randint(3, 40)))
        for _ in range(60)
    ]
    m = learn_bpe(_docs_ds(texts), "text", 25, min_count=2)
    ref = _ref_learn_bpe(texts, 25, min_count=2)
    pd.testing.assert_frame_equal(m, ref)


def test_bpe_driver_equals_distributed(ray_session):
    from ocr_service_ray.ops.bpe import (
        _learn_rounds_distributed,
        learn_bpe,
        word_frequency_table,
    )

    rng = np.random.RandomState(23)
    words = ["spark", "stream", "shard", "shuffle", "stage", "spill"]
    texts = [" ".join(rng.choice(words, 20)) for _ in range(40)]
    ds = _docs_ds(texts)
    local = learn_bpe(ds, "text", 12)  # vocab << threshold: driver path
    dist = _learn_rounds_distributed(
        word_frequency_table(ds, "text"), 12, 2
    )
    pd.testing.assert_frame_equal(local, dist)


def test_bpe_segment_consistent_with_token_table(ray_session):
    from ocr_service_ray.ops.bpe import (
        bpe_segment,
        bpe_token_table,
        learn_bpe,
    )

    texts = ["aa ab aa ba aa ab", "ab aa ba ba aa"]
    ds = _docs_ds(texts)
    m = learn_bpe(ds, "text", 8)
    tt = (
        bpe_token_table(ds, "text", m)
        .to_pandas()
        .sort_values("token")
        .reset_index(drop=True)
    )
    mlist = list(zip(m["left"], m["right"]))
    counts = {}
    for t in texts:
        for tok in bpe_segment(t, mlist):
            counts[tok] = counts.get(tok, 0) + 1
    ref = (
        pd.DataFrame(sorted(counts.items()), columns=["token", "n"])
        .astype({"n": "int64"})
    )
    pd.testing.assert_frame_equal(tt.astype({"n": "int64"}), ref)
    # token-count mass conservation: sum over tokens == total symbols
    assert tt["n"].sum() == sum(counts.values())


def test_bpe_edges(ray_session):
    from ocr_service_ray.ops.bpe import learn_bpe

    # early stop: min_count unreachable -> no merges beyond threshold
    m = learn_bpe(_docs_ds(["x y z"]), "text", 10, min_count=2)
    assert len(m) == 0  # every pair occurs once
    # empty / null texts contribute nothing and do not crash
    m2 = learn_bpe(_docs_ds(["", None, "ab ab ab"]), "text", 2)
    assert list(m2["left"]) == ["a", "ab"]
    # num_merges exhausts available pairs -> stops at exhaustion
    m3 = learn_bpe(_docs_ds(["ab ab"]), "text", 50, min_count=1)
    assert len(m3) <= 3  # a+b, ab+</w>, then single symbol per word
