"""Wave-115 ops: Huffman corpus bits — worked example, entropy
bounds, depth-sum identity, layout invariance."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa


def _hist(counts: dict) -> pd.DataFrame:
    return pd.DataFrame(
        {"cp": list(counts.keys()), "cnt": list(counts.values())}
    )


def test_huffman_clrs_example():
    from ocr_service_ray.ops.huffman import huffman_close

    # CLRS fig 16.5: f:5 e:9 c:12 b:13 d:16 a:45 -> 224 total bits
    out = huffman_close(_hist({102: 5, 101: 9, 99: 12, 98: 13, 100: 16, 97: 45}))
    assert out["huffman_bits"] == 224
    assert out["n_symbols"] == 6
    assert out["total_chars"] == 100
    assert out["fixed_bits"] == 300  # ceil(log2 6) = 3


def test_huffman_entropy_bounds():
    from ocr_service_ray.ops.huffman import huffman_close

    rng = np.random.RandomState(115)
    counts = {i: int(c) for i, c in enumerate(rng.randint(1, 500, 40))}
    out = huffman_close(_hist(counts))
    total = sum(counts.values())
    h = -sum(c / total * math.log2(c / total) for c in counts.values())
    avg = out["huffman_bits"] / total
    assert h - 1e-9 <= avg < h + 1  # Shannon optimality band


def test_huffman_equals_depth_weighted_sum():
    from ocr_service_ray.ops.huffman import huffman_close

    # independent reference: build the tree, sum cnt * depth
    rng = np.random.RandomState(7)
    counts = {i: int(c) for i, c in enumerate(rng.randint(1, 100, 17))}
    h = sorted(counts.items(), key=lambda kv: (kv[1], kv[0]))
    import heapq

    heap = [(c, i + 1, [cp]) for i, (cp, c) in enumerate(h)]
    heapq.heapify(heap)
    nid = len(h) + 1
    depth = {cp: 0 for cp in counts}
    while len(heap) > 1:
        w1, _, l1 = heapq.heappop(heap)
        w2, _, l2 = heapq.heappop(heap)
        for cp in l1 + l2:
            depth[cp] += 1
        heapq.heappush(heap, (w1 + w2, nid, l1 + l2))
        nid += 1
    ref = sum(counts[cp] * d for cp, d in depth.items())
    assert huffman_close(_hist(counts))["huffman_bits"] == ref


def test_huffman_single_symbol():
    from ocr_service_ray.ops.huffman import huffman_close

    out = huffman_close(_hist({97: 42}))
    assert out["huffman_bits"] == 0
    assert out["fixed_bits"] == 42  # width floor of 1 bit


def test_corpus_huffman_layout_invariance():
    import ray.data as rd

    from ocr_service_ray.ops.huffman import corpus_huffman

    texts = ["hello world", "привет мир", "aaaabbbccd", "", "zzz"] * 6
    base = corpus_huffman(rd.from_arrow(pa.table({"text": texts})))
    out = corpus_huffman(
        rd.from_arrow(pa.table({"text": texts[::-1]})).repartition(5)
    )
    pd.testing.assert_frame_equal(base, out)
