"""Huffman optimal prefix-code length of the corpus character
distribution — the classical entropy-coding bound (Huffman 1952),
computed exactly.

The data-parallel phase is ONE corpus scan folding each block to its
character histogram (UTF-32 reinterpret + ``np.unique`` — no Python
per-char loop), merged by a |alphabet|-bounded combiner sum. The
optimal-code close (repeated merge of the two lightest subtrees;
total encoded bits = Σ of merged internal weights) runs on the driver
over the bounded histogram — the same |groups|-bounded-close
discipline as kruskal/quantile ops.

Determinism contract (what makes the merge order — and thus the
oracle replay — unique): leaves are ranked 1..V by (count, codepoint)
and every priority comparison is on the pair ``(weight, id)`` with
internal nodes taking ids V+1, V+2, … in creation order. The SQL
oracle replays the merges over a sorted BIGINT-key list
(``weight·10^6 + id``, exact because id < 10^6) in a recursive CTE.

Use: a byte-budget estimator for tokenizer/compression planning —
how many bits the corpus costs under an optimal char code vs the
fixed-width ceil(log2 V) encoding."""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
import pyarrow as pa


def char_histogram(ds, col: str):
    """Dataset of ``(cp, cnt)`` — corpus codepoint histogram,
    |alphabet|-bounded after the combiner."""
    from ocr_service_ray.ops.agg import grouped_agg

    def partial(b: pa.Table) -> pa.Table:
        texts = b[col].to_pylist()
        blob = "".join(t for t in texts if t is not None)
        if not blob:
            return pa.table(
                {"cp": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())}
            )
        cps = np.frombuffer(blob.encode("utf-32-le"), dtype=np.uint32)
        u, c = np.unique(cps, return_counts=True)
        return pa.table(
            {
                "cp": pa.array(u.astype(np.int64)),
                "cnt": pa.array(c.astype(np.int64)),
            }
        )

    return grouped_agg(
        ds.map_batches(partial, batch_format="pyarrow"),
        ["cp"],
        {"cnt": ("cnt", "sum")},
    )


def huffman_close(hist: pd.DataFrame) -> dict:
    """Exact Huffman total-bits close over a ``(cp, cnt)`` histogram
    (driver-side, |alphabet|-bounded). Returns exact integers."""
    h = hist.sort_values(["cnt", "cp"]).reset_index(drop=True)
    total = int(h["cnt"].sum())
    v = len(h)
    heap = [(int(c), i + 1) for i, c in enumerate(h["cnt"])]
    heapq.heapify(heap)
    next_id = v + 1
    bits = 0
    while len(heap) > 1:
        w1, _ = heapq.heappop(heap)
        w2, _ = heapq.heappop(heap)
        bits += w1 + w2
        heapq.heappush(heap, (w1 + w2, next_id))
        next_id += 1
    width = max(1, (v - 1).bit_length()) if v else 1
    fixed = total * width
    return {
        "n_symbols": v,
        "total_chars": total,
        "huffman_bits": bits,
        "fixed_bits": fixed,
        "avg_len_micro": (bits * 1_000_000) // total if total else 0,
        "saving_ppm": ((fixed - bits) * 1_000_000) // fixed if fixed else 0,
    }


def corpus_huffman(ds, col: str = "text") -> pd.DataFrame:
    """One-row frame: optimal-prefix-code cost of the corpus."""
    hist = char_histogram(ds, col).to_pandas()
    out = huffman_close(hist)
    return pd.DataFrame({k: pd.array([v], dtype="int64") for k, v in out.items()})
