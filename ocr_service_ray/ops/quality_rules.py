"""Heuristic corpus-quality filters (Gopher/C4-style repetition
rules) and pattern redaction — the per-document hygiene pass a
training-data pipeline runs before dedup/mixing.

Shapes (100 TB):

- **Repetition stats shuffle (doc, gram) count rows, never text.**
  The explode is fully vectorized Arrow (``split_pattern`` →
  ``list_flatten`` / ``list_parent_indices``; bigrams are an
  element-wise join of the flat array against itself shifted by one,
  masked at list boundaries) and each block collapses to its distinct
  (doc, gram) counts BEFORE the one coarse-bucketed shuffle
  (``grouped_agg`` combiner) — the bytes moved are bounded by
  distinct grams per doc, not corpus size.
- **Redaction is a stateless map** — zero shuffle, RE2 kernels on
  both sides (pyarrow and DuckDB share the pattern strings, so the
  oracle replays the exact transform).

Rule thresholds follow the published Gopher repetition-filter family
(top-word fraction, duplicate-bigram fraction) but are expressed in
INTEGER cross-multiplied form (``10 * top_count <= 3 * n_words``) so
the Ray kernels and the SQL oracle compare identically with no float
round-trip.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# Integer rule constants (numerator / denominator of the max allowed
# fraction). Shared with the DuckDB oracle in __ray_entry__.py.
TOP_WORD_MAX_NUM, TOP_WORD_MAX_DEN = 3, 10  # top word ≤ 30% of words
DUP_BIGRAM_MAX_NUM, DUP_BIGRAM_MAX_DEN = 2, 10  # dup bigrams ≤ 20%


def explode_grams(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Vectorized explode of a text column into (id, kind, gram) rows
    where kind is 'w' (unigram, single-space split semantics) or 'b'
    (adjacent-pair bigram joined with one space). No Python loop —
    Arrow kernels end to end."""
    words = pc.split_pattern(batch[text_col], " ")
    flat = pc.list_flatten(words)
    parent = pc.list_parent_indices(words).to_numpy(zero_copy_only=False)
    uni_ids = pc.take(batch[id_col], pa.array(parent))

    n = len(flat)
    if n > 1:
        bi = pc.binary_join_element_wise(flat.slice(0, n - 1), flat.slice(1), " ")
        same_doc = parent[:-1] == parent[1:]
        bi = pc.filter(bi, pa.array(same_doc))
        bi_ids = pc.take(batch[id_col], pa.array(parent[:-1][same_doc]))
    else:
        bi = pa.array([], pa.string())
        bi_ids = pa.array([], batch[id_col].type)

    return pa.table(
        {
            id_col: pa.concat_arrays(
                [pc.cast(uni_ids, batch[id_col].type).combine_chunks(),
                 pc.cast(bi_ids, batch[id_col].type).combine_chunks()]
            ),
            "kind": pa.concat_arrays(
                [pa.array(["w"] * n, pa.string()),
                 pa.array(["b"] * len(bi), pa.string())]
            ),
            "gram": pa.concat_arrays([flat.combine_chunks(), bi.combine_chunks()]),
        }
    )


def repetition_stats(ds, text_col: str = "text", id_col: str = "doc_id", append: bool = False):
    """Per-document Gopher-style repetition statistics + keep flags.
    ``append=True`` keeps the original batch columns (text included)
    alongside the stats — the form a filtering pipeline consumes.

    Output (one row per input doc): id_col, n_words, n_distinct_words,
    top_word_count, n_bigrams, n_distinct_bigrams, keep_top_word,
    keep_dup_bigram (int64 counts, bool flags).

    ZERO shuffles: repetition statistics are per-document, and a row
    IS a document, so every gram of a doc already lives in its batch —
    the whole op is one streaming ``map_batches`` (the
    embarrassingly-parallel shape; at 100 TB it pipelines with the
    read and never touches the object store beyond its output). Inside
    the batch the explode is vectorized Arrow and the two groupby
    levels are C-level pandas on integer keys. A single-word doc has
    0 bigrams; its dup-bigram rule passes vacuously (0 <= 0)."""
    import pandas as pd

    def kernel(batch: pa.Table) -> pa.Table:
        g = explode_grams(batch, text_col, id_col)
        # gram rows reference parent docs by id; per-(doc, kind, gram)
        # counts then per-(doc, kind) folds, all within the batch.
        df = pd.DataFrame(
            {
                "id": g[id_col].to_pandas(),
                "kind": g["kind"].to_pandas(),
                "gram": g["gram"].to_pandas(),
            }
        )
        cnt = (
            df.groupby(["id", "kind", "gram"], sort=False, observed=True)
            .size()
            .rename("c")
            .reset_index()
        )
        agg = (
            cnt.groupby(["id", "kind"], sort=False)
            .agg(n=("c", "sum"), nd=("c", "size"), top=("c", "max"))
            .reset_index()
        )
        w = agg[agg["kind"] == "w"].set_index("id")
        b_ = agg[agg["kind"] == "b"].set_index("id")
        ids = batch[id_col].to_pandas()
        nw = ids.map(w["n"]).fillna(0).astype("int64")
        ndw = ids.map(w["nd"]).fillna(0).astype("int64")
        top = ids.map(w["top"]).fillna(0).astype("int64")
        nb = ids.map(b_["n"]).fillna(0).astype("int64")
        ndb = ids.map(b_["nd"]).fillna(0).astype("int64")
        cols = {
            "n_words": pa.array(nw),
            "n_distinct_words": pa.array(ndw),
            "top_word_count": pa.array(top),
            "n_bigrams": pa.array(nb),
            "n_distinct_bigrams": pa.array(ndb),
            "keep_top_word": pa.array(
                TOP_WORD_MAX_DEN * top <= TOP_WORD_MAX_NUM * nw
            ),
            "keep_dup_bigram": pa.array(
                DUP_BIGRAM_MAX_DEN * (nb - ndb) <= DUP_BIGRAM_MAX_NUM * nb
            ),
        }
        if append:
            out = batch
            for name, arr in cols.items():
                out = out.append_column(name, arr)
            return out
        return pa.table({id_col: batch[id_col], **cols})

    return ds.map_batches(kernel, batch_format="pyarrow")


def redact_patterns(
    ds,
    col: str,
    rules: list[tuple[str, str, str]],
    keep_cols: list[str] | None = None,
):
    """Redact ``rules`` = [(name, RE2 pattern, replacement), ...] from
    ``col``, applied in order, emitting the redacted text plus an
    int64 ``n_<name>`` match count per rule (counted against the text
    as each rule sees it, i.e. after the previous rules ran — same
    order the oracle applies them).

    Stateless vectorized map — the PII-scrub shape: at 100 TB this is
    a pure streaming stage with zero shuffle and the patterns live in
    the task closure (bytes, not an index)."""

    def kernel(batch: pa.Table) -> pa.Table:
        text = batch[col]
        cols = {c: batch[c] for c in (keep_cols or [c for c in batch.column_names if c != col])}
        counts = {}
        for name, pattern, replacement in rules:
            counts[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(text, pattern), pa.int64()
            )
            text = pc.replace_substring_regex(text, pattern, replacement)
        cols[col] = text
        cols.update(counts)
        return pa.table(cols)

    return ds.map_batches(kernel, batch_format="pyarrow")
