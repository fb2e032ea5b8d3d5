"""Greedy maximum-coverage document selection (the classic
(1 − 1/e)-approximate greedy set cover — Nemhauser, Wolsey & Fisher
1978; the data-subset-selection pass that picks the fewest documents
covering the most vocabulary, the coverage-objective complement of
the distance-objective k-center coreset in ops/coreset.py).

Semantics (deterministic, SQL-replayable): each round selects the
document with the largest number of distinct tokens NOT yet covered
by the chosen set (tie → smallest doc id); its tokens join the
covered set; stops early when the best marginal gain is 0.

100-TB shape: ONE corpus scan folds to the distinct (doc, token)
pair table (materialized loop state — the per-round unit of work);
each round is a map_batches gain pass with the covered set broadcast
in the closure plus a per-block (max gain, min id) combiner, so only
|blocks| candidate rows reach the driver per round. The covered set
is bounded by the coverage universe — callers at corpus scale bound
it first (e.g. the top-V vocabulary from the Zipf audit), exactly as
documented for the decontamination broadcast set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def doc_token_pairs(ds, id_col: str, text_col: str, unit: str = "word"):
    """ONE corpus scan → distinct (id, token) pairs per document
    (block-local dedup). ``unit``: whitespace words, or adjacent word
    ``bigram``s (space-joined) when the word universe is too small to
    make coverage meaningful."""

    def pairs(b: pa.Table) -> pa.Table:
        ids: list = []
        toks: list = []
        for i, t in zip(b[id_col].to_pylist(), b[text_col].to_pylist()):
            if not t:
                continue
            ws = t.split()
            units = (
                set(ws)
                if unit == "word"
                else {f"{a} {b_}" for a, b_ in zip(ws, ws[1:])}
            )
            for w in units:
                ids.append(i)
                toks.append(w)
        return pa.table(
            {"id": pa.array(ids, pa.int64()), "token": pa.array(toks, pa.string())}
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        pairs, batch_format="pyarrow"
    )


def greedy_max_coverage(
    ds, id_col: str, text_col: str, k: int, unit: str = "word"
) -> pd.DataFrame:
    """Select up to ``k`` documents greedily. Returns
    (sel_rank, id, gain, covered_total) — ``gain`` is the marginal
    distinct-token count the pick added, ``covered_total`` the running
    covered-vocabulary size (strictly increasing)."""
    from ocr_service_ray.ops.agg import grouped_agg
    from ocr_service_ray.ops.relational import topk

    pairs = doc_token_pairs(ds, id_col, text_col, unit=unit).materialize()
    covered: set = set()
    out: list[tuple[int, int, int, int]] = []
    for rank in range(k):
        cov = covered  # closure-captured; broadcast once per task

        def gain_partial(b: pa.Table, cov=cov) -> pa.Table:
            df = pd.DataFrame(
                {
                    "id": b["id"].to_numpy(zero_copy_only=False),
                    "token": b["token"].to_pylist(),
                }
            )
            # block-local PARTIAL per-doc fresh counts (a doc's pairs
            # may straddle split blocks, so partials are summed by the
            # grouped combiner before the argmax — never trusted alone)
            fresh = df[~df["token"].isin(cov)]
            g = fresh.groupby("id", sort=False).size().reset_index(name="g")
            return pa.table(
                {
                    "id": pa.array(g["id"].to_numpy(np.int64)),
                    "g": pa.array(g["g"].to_numpy(np.int64)),
                }
            )

        gains = grouped_agg(
            pairs.map_batches(gain_partial, batch_format="pyarrow"),
            ["id"],
            {"gain": ("g", "sum")},
        )
        cand = topk(gains, ["gain", "id"], 1, descending=[True, False]).to_pandas()
        if cand.empty or int(cand["gain"].iloc[0]) == 0:
            break
        pick = int(cand["id"].iloc[0])

        def toks_of(b: pa.Table, pick=pick) -> pa.Table:
            import pyarrow.compute as pc

            return b.filter(pc.equal(b["id"], pick)).select(["token"])

        new_toks = set(
            pairs.map_batches(toks_of, batch_format="pyarrow")
            .to_pandas()["token"]
        )
        gain = len(new_toks - covered)
        covered |= new_toks
        out.append((rank, pick, gain, len(covered)))
    return pd.DataFrame(
        out, columns=["sel_rank", "id", "gain", "covered_total"]
    ).astype("int64")
