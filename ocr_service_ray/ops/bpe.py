"""Byte-pair-encoding vocabulary induction — distributed BPE learning
(Sennrich, Haddow & Birch, "Neural machine translation of rare words
with subword units", ACL 2016; the GPT-2 tokenizer-training shape).

100-TB shape: BPE never iterates the corpus. ONE corpus scan folds to
the distinct-word frequency table (a ``grouped_agg`` count combiner —
the same |vocab|-bounded reduction as value-counts), and every merge
round runs over that table only: a map_batches pass emits weighted
(left, right) adjacent-pair partials per block, one tiny
``grouped_agg`` sums them, the driver picks the argmax pair
(deterministic tie: highest count, then lexicographically smallest
pair) and the merge is applied to the vocab table in the next round's
scan. R merges cost R passes over |distinct words| rows — never over
documents. The per-round vocab materialization is loop-carried state
(the ops/kmeans.py / ops/graph.py precedent).

No SQL oracle: merge application is iterative string rewriting DuckDB
cannot replay; correctness is pinned by a byte-exact pytest against an
independent single-process reference implementation
(tests/test_bpe.py) plus the hand-checked Sennrich worked example.

Reference behavior modeled (not copied): the subword-nmt
``learn_bpe`` algorithm as published; end-of-word marker ``</w>``
keeps word-final subwords distinct.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

_EOW = "</w>"


def word_frequency_table(ds, text_col: str):
    """ONE corpus scan → Dataset of (word, freq): whitespace tokens,
    per-block count combiner, one grouped sum. The only pass that ever
    touches document text."""
    from ocr_service_ray.ops.agg import grouped_agg

    def partial(b: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for t in b[text_col].to_pylist():
            if not t:
                continue
            for w in t.split():
                counts[w] = counts.get(w, 0) + 1
        return pa.table(
            {
                "word": pa.array(list(counts.keys()), pa.string()),
                "freq": pa.array(list(counts.values()), pa.int64()),
            }
        )

    parts = ds.select_columns([text_col]).map_batches(
        partial, batch_format="pyarrow"
    )
    return grouped_agg(parts, ["word"], {"freq": ("freq", "sum")})


def _symbolize(word: str) -> list[str]:
    return list(word) + [_EOW]


def _merge_word(syms: list[str], left: str, right: str) -> list[str]:
    """Replace non-overlapping (left, right) adjacencies left-to-right
    — the canonical BPE application order."""
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == left and syms[i + 1] == right:
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _pair_counts_partial(b: pa.Table) -> pa.Table:
    counts: dict[tuple[str, str], int] = {}
    words = b["syms"].to_pylist()
    freqs = b["freq"].to_pylist()
    for syms, f in zip(words, freqs):
        for i in range(len(syms) - 1):
            k = (syms[i], syms[i + 1])
            counts[k] = counts.get(k, 0) + f
    return pa.table(
        {
            "left": pa.array([k[0] for k in counts], pa.string()),
            "right": pa.array([k[1] for k in counts], pa.string()),
            "n": pa.array(list(counts.values()), pa.int64()),
        }
    )


def _learn_rounds_local(
    words: list[list[str]], freqs: list[int], num_merges: int, min_count: int
) -> list[tuple[int, str, str, int]]:
    """Merge rounds on an in-memory vocab — the driver fast path.
    IDENTICAL semantics to the distributed rounds (pair counting is an
    associative sum and the argmax tie rule is total), asserted equal
    in tests/test_bpe.py."""
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        counts: dict[tuple[str, str], int] = {}
        for syms, f in zip(words, freqs):
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                counts[k] = counts.get(k, 0) + f
        if not counts:
            break
        (left, right), n = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_count:
            break
        merges.append((rank, left, right, n))
        words = [
            _merge_word(s, left, right) if len(s) > 1 else s for s in words
        ]
    return merges


def learn_bpe(
    ds,
    text_col: str,
    num_merges: int,
    min_count: int = 2,
    driver_threshold: int = 500_000,
) -> pd.DataFrame:
    """Learn ``num_merges`` BPE merges over a document Dataset.
    Returns (merge_rank, left, right, pair_count) — rank 0 first.
    Stops early when no pair reaches ``min_count``.

    A vocab table under ``driver_threshold`` rows runs the merge
    rounds on the driver (the ops/graph.py union-find fast-path
    precedent — one pull of the |words| count table, zero per-round
    shuffles); larger vocabularies run each round distributed over the
    vocab Dataset. Both paths produce the identical merge list."""
    vocab = word_frequency_table(ds, text_col)
    if vocab.count() <= driver_threshold:
        vdf = vocab.to_pandas()
        merges = _learn_rounds_local(
            [_symbolize(w) for w in vdf["word"]],
            [int(f) for f in vdf["freq"]],
            num_merges,
            min_count,
        )
        return pd.DataFrame(
            merges, columns=["merge_rank", "left", "right", "pair_count"]
        )
    return _learn_rounds_distributed(vocab, num_merges, min_count)


def _to_syms(b: pa.Table) -> pa.Table:
    return pa.table(
        {
            "syms": pa.array(
                [_symbolize(w) for w in b["word"].to_pylist()],
                pa.list_(pa.string()),
            ),
            "freq": b["freq"],
        }
    )


def first_round_pair_counts(ds, text_col: str):
    """Round-1 weighted adjacent-pair counts (char + ``</w>`` symbols)
    — the SQL-expressible slice of BPE learning (substring pairs over
    the word-frequency table), the exact-oracle anchor for the
    otherwise iterative merge loop. Dataset of (left, right, n)."""
    from ocr_service_ray.ops.agg import grouped_agg

    state = word_frequency_table(ds, text_col).map_batches(
        _to_syms, batch_format="pyarrow"
    )
    return grouped_agg(
        state.map_batches(_pair_counts_partial, batch_format="pyarrow"),
        ["left", "right"],
        {"n": ("n", "sum")},
    )


def _learn_rounds_distributed(vocab, num_merges: int, min_count: int) -> pd.DataFrame:
    # loop-carried state: the symbolized vocab table (|words| rows)
    state = vocab.map_batches(_to_syms, batch_format="pyarrow").materialize()
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(num_merges):
        from ocr_service_ray.ops.agg import grouped_agg

        pairs = grouped_agg(
            state.map_batches(_pair_counts_partial, batch_format="pyarrow"),
            ["left", "right"],
            {"n": ("n", "sum")},
        ).to_pandas()
        if pairs.empty:
            break
        # deterministic argmax: highest count, then smallest (l, r)
        pairs = pairs.sort_values(
            ["n", "left", "right"], ascending=[False, True, True], kind="mergesort"
        )
        best = pairs.iloc[0]
        if int(best["n"]) < min_count:
            break
        left, right = str(best["left"]), str(best["right"])
        merges.append((rank, left, right, int(best["n"])))

        def apply_merge(b: pa.Table, left=left, right=right) -> pa.Table:
            return pa.table(
                {
                    "syms": pa.array(
                        [
                            _merge_word(s, left, right)
                            for s in b["syms"].to_pylist()
                        ],
                        pa.list_(pa.string()),
                    ),
                    "freq": b["freq"],
                }
            )

        state = state.map_batches(apply_merge, batch_format="pyarrow").materialize()
    return pd.DataFrame(
        merges, columns=["merge_rank", "left", "right", "pair_count"]
    )


def bpe_segment(text: str, merges: list[tuple[str, str]]) -> list[str]:
    """Tokenize one text with a learned merge list (applied in learned
    order per word — the standard greedy-rank encoder)."""
    out: list[str] = []
    for w in text.split():
        syms = _symbolize(w)
        for left, right in merges:
            if len(syms) == 1:
                break
            syms = _merge_word(syms, left, right)
        out.extend(syms)
    return out


def bpe_token_table(ds, text_col: str, merges: pd.DataFrame):
    """Apply learned merges corpus-wide → Dataset of (token, n)
    counts. Each DISTINCT word is segmented once (over the word-
    frequency table, |vocab|-bounded) and its token counts are
    weighted by the word's corpus frequency — segmentation cost is
    ∝ |vocab| × |merges|, never ∝ corpus. The merge list rides the
    closure (vocabulary-sized, broadcast once per task)."""
    from ocr_service_ray.ops.agg import grouped_agg

    mlist = [
        (str(l), str(r))
        for l, r in zip(merges["left"], merges["right"])
    ]

    def partial(b: pa.Table) -> pa.Table:
        counts: dict[str, int] = {}
        for w, f in zip(b["word"].to_pylist(), b["freq"].to_pylist()):
            syms = _symbolize(w)
            for left, right in mlist:
                if len(syms) == 1:
                    break
                syms = _merge_word(syms, left, right)
            for tok in syms:
                counts[tok] = counts.get(tok, 0) + f
        return pa.table(
            {
                "token": pa.array(list(counts.keys()), pa.string()),
                "n": pa.array(list(counts.values()), pa.int64()),
            }
        )

    parts = word_frequency_table(ds, text_col).map_batches(
        partial, batch_format="pyarrow"
    )
    return grouped_agg(parts, ["token"], {"n": ("n", "sum")})
