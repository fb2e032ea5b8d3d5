"""TF-IDF keyword extraction and BM25 retrieval over the corpus —
the term-statistics layer of a training-data / search pipeline.

Shapes (100 TB):

- **Corpus term stats are a combiner aggregate.** Pass 1 explodes
  each document to its DISTINCT terms inside the batch, so the
  ``grouped_agg`` shuffle moves ≤ one row per (doc, distinct term) —
  document frequency, never raw tokens.
- **The idf table is broadcast, not joined.** Vocabulary (or the
  query's terms) go to the object store once; pass 2 re-scans the
  corpus and scores in-kernel — zero shuffle of document rows
  (the same broadcast/shuffle trade as ``ops/ngrams.py``; a
  boilerplate-saturated vocabulary would use the gram-keyed hash-join
  strategy there).
- **BM25 needs ONE corpus pass for stats.** The per-doc
  (dl, tf per query term) projection is tiny (ints), so it is
  materialized once; df/avgdl come from it, and scoring + combiner
  top-k run over it — the text is read exactly once.

Oracle determinism: idf is the BM25 odds ratio WITHOUT the log —
``(N - df + 0.5) / (df + 0.5)`` — because +, ×, ÷ are IEEE-exact and
bit-identical across numpy and DuckDB while ``ln`` is libm-dependent
(the repo-wide no-transcendentals-in-oracled-output discipline). The
log variant changes ranking only via a monotone per-term transform;
``log_idf=True`` enables it for production use and is simply not the
oracled configuration.

Tokenization: single-space split (the repo-wide convention shared
with ``ops/text.py`` / ``ops/ngrams.py`` and DuckDB
``string_split(text, ' ')``).
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa


def _rational_idf(n_docs: int, df: np.ndarray) -> np.ndarray:
    return (n_docs - df + 0.5) / (df + 0.5)


def term_doc_freq(ds, text_col: str = "text"):
    """Dataset ``(term, df)`` — document frequency of every
    single-space token, per-doc-deduplicated inside the batch (the
    combiner: the shuffle moves distinct (doc, term) rows only)."""
    from ocr_service_ray.ops.agg import grouped_agg

    def explode_unique(batch: pa.Table) -> pa.Table:
        out: list[str] = []
        for t in batch[text_col].to_pylist():
            out.extend(set(t.split(" ")))
        return pa.table({"term": pa.array(out, pa.string())})

    pairs = ds.map_batches(explode_unique, batch_format="pyarrow")
    return grouped_agg(pairs, ["term"], {"df": (None, "count")})


def tfidf_topk_terms(
    ds,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    log_idf: bool = False,
):
    """Top-``k`` characteristic terms per document by tf·idf
    (ties → lexicographically smaller term wins; every doc emits
    ``min(k, |distinct terms|)`` rows).

    Two corpus passes, zero shuffle of document rows: pass 1 builds
    the df table (combiner aggregate), which is broadcast; pass 2
    rescans and ranks in-kernel.
    """
    import ray

    df_tbl = term_doc_freq(ds, text_col).to_pandas()
    n_docs = int(ds.count())
    idf_vals = _rational_idf(n_docs, df_tbl["df"].to_numpy(dtype=np.float64))
    if log_idf:
        idf_vals = np.log(1.0 + idf_vals)
    idf_ref = ray.put(dict(zip(df_tbl["term"], idf_vals)))

    class Rank:
        def __init__(self):
            self.idf = ray.get(idf_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, terms, tfs, scores = [], [], [], []
            for key, t in zip(
                batch[id_col].to_pylist(), batch[text_col].to_pylist()
            ):
                counts = Counter(t.split(" "))
                ranked = sorted(
                    (
                        (-float(tf) * self.idf[term], term, tf)
                        for term, tf in counts.items()
                    ),
                )[:k]
                for neg, term, tf in ranked:
                    ids.append(key)
                    terms.append(term)
                    tfs.append(tf)
                    scores.append(-neg)
            return pa.table(
                {
                    id_col: pa.array(ids, batch[id_col].type),
                    "term": pa.array(terms, pa.string()),
                    "tf": pa.array(tfs, pa.int64()),
                    "score": pa.array(scores, pa.float64()),
                }
            )

    return ds.map_batches(Rank, batch_format="pyarrow", concurrency=(1, 8))


def bm25_search(
    ds,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    log_idf: bool = False,
):
    """Top-``k`` documents for a bag-of-terms query by BM25
    (Robertson/Spärck Jones; idf per the module's rational-odds
    contract). Per-term contributions are summed left-associatively
    in ``query_terms`` order — pinned so the oracle folds identically.

    The text is scanned ONCE: per-doc (dl, tf_j) ints are projected
    vectorized (``pc.count_substring`` on a space-doubled pad — token
    == exact ``\\x20term\\x20`` match), materialized (ints only),
    then df/avgdl and the scored combiner top-k run over that tiny
    table."""
    import pyarrow.compute as pc

    from ocr_service_ray.ops.agg import global_agg
    from ocr_service_ray.ops.relational import topk

    tf_cols = [f"_tf{j}" for j in range(len(query_terms))]

    def project(batch: pa.Table) -> pa.Table:
        text = batch[text_col]
        dl = pc.cast(pc.add(pc.count_substring(text, " "), 1), pa.int64())
        # double internal spaces so non-overlapping substring counting
        # sees every token with its own delimiters
        padded = pc.binary_join_element_wise(
            " ",
            pc.replace_substring(text, " ", "  "),
            " ",
            "",  # separator: plain concatenation
            null_handling="replace",
        )
        cols = {id_col: batch[id_col], "dl": dl}
        for j, term in enumerate(query_terms):
            cols[tf_cols[j]] = pc.cast(
                pc.count_substring(padded, f" {term} "), pa.int64()
            )
        return pa.table(cols)

    stats = ds.map_batches(project, batch_format="pyarrow").materialize()

    # df_j = number of docs with tf_j > 0: indicator sum over the
    # materialized int table (second pass over ints, not text)
    def indicators(bt: pa.Table) -> pa.Table:
        cols = {"dl": bt["dl"]}
        for c in tf_cols:
            cols[c] = pc.cast(pc.greater(bt[c], 0), pa.int64())
        return pa.table(cols)

    agg = global_agg(
        stats.map_batches(indicators, batch_format="pyarrow"),
        {
            "n_docs": (None, "count"),
            "dl_sum": ("dl", "sum"),
            **{f"df{j}": (c, "sum") for j, c in enumerate(tf_cols)},
        },
    )
    n_docs = int(agg["n_docs"])
    avgdl = float(agg["dl_sum"]) / n_docs
    idf = _rational_idf(
        n_docs,
        np.array([float(agg[f"df{j}"]) for j in range(len(tf_cols))]),
    )
    if log_idf:
        idf = np.log(1.0 + idf)

    def score(bt: pa.Table) -> pa.Table:
        dl = bt["dl"].to_numpy(zero_copy_only=False).astype(np.float64)
        norm = k1 * (1.0 - b + b * (dl / avgdl))
        s = np.zeros(len(bt), dtype=np.float64)
        for j in range(len(tf_cols)):  # pinned left-assoc term order
            tf = bt[tf_cols[j]].to_numpy(zero_copy_only=False).astype(np.float64)
            s = s + idf[j] * (tf * (k1 + 1.0)) / (tf + norm)
        return pa.table(
            {id_col: bt[id_col], "score": pa.array(s, pa.float64())}
        )

    scored = stats.map_batches(score, batch_format="pyarrow")
    return topk(scored, ["score", id_col], k, descending=[True, False])
