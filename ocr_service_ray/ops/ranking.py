"""TF-IDF keyword extraction and BM25 retrieval over the corpus —
the term-statistics layer of a training-data / search pipeline.

Shapes (100 TB):

- **Corpus term stats are a combiner aggregate.** Pass 1 explodes
  each document to its DISTINCT terms inside the batch, so the
  ``grouped_agg`` shuffle moves ≤ one row per (doc, distinct term) —
  document frequency, never raw tokens.
- **The idf table is broadcast OR joined — caller's choice.**
  ``strategy="broadcast"`` ships the vocabulary to the object store
  once and scores in-kernel (zero shuffle of document rows);
  ``strategy="shuffle"`` keeps the df table distributed and
  hash-joins it to the exploded (doc, term, tf) rows — the 100 TB
  path when a hapax-heavy web vocabulary no longer fits a worker
  heap (the same broadcast/shuffle pairing as ``ops/ngrams.py``,
  tested equal).
- **BM25 needs ONE corpus pass for stats.** The per-doc
  (dl, tf per query term) projection is tiny (ints), so it is
  pinned once; df/avgdl come from it, and scoring + combiner
  top-k run over it — the text is read exactly once. At bench scale
  the pin is an object-store ``materialize()``; ``stats_path`` is
  the 10^12-doc tier — the same projection written as parquet and
  read back (mirror of ``signature_path`` in ``ops/dedup.py``), so
  O(docs) state lives in storage, not cluster memory.

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

from ocr_service_ray.ops.pool import bcast_stage

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
    strategy: str = "broadcast",
):
    """Top-``k`` characteristic terms per document by tf·idf
    (ties → lexicographically smaller term wins; every doc emits
    ``min(k, |distinct terms|)`` rows).

    Two strategies, identical values (asserted in
    ``tests/test_ranking.py`` — the same broadcast/shuffle pairing as
    ``ops/ngrams.py``):

    - ``"broadcast"``: pass 1 builds the df table (combiner
      aggregate), the full-vocabulary idf dict is broadcast, pass 2
      rescans and ranks in-kernel — zero shuffle of document rows.
      Right while the distinct-token vocabulary fits a worker heap.
    - ``"shuffle"``: the df table STAYS a Dataset; the per-doc
      (doc, term, tf) projection (distinct terms only — the combiner)
      is hash-joined to it on ``term``, scored vectorized, and folded
      to per-doc top-k in one ``bucketed_map_groups`` keyed by doc.
      The 100 TB path for hapax-heavy web vocabularies where the idf
      dict itself is too large to pull to the driver or broadcast.
    """
    if strategy == "shuffle":
        return _tfidf_shuffle(ds, k, text_col, id_col, log_idf)
    if strategy != "broadcast":
        raise ValueError(f"unknown strategy: {strategy}")
    import ray

    df_tbl = term_doc_freq(ds, text_col).to_pandas()
    n_docs = int(ds.count())
    idf_vals = _rational_idf(n_docs, df_tbl["df"].to_numpy(dtype=np.float64))
    if log_idf:
        idf_vals = np.log(1.0 + idf_vals)
    idf_lut = dict(zip(df_tbl["term"], idf_vals))
    # measured serialized size (what ray.put ships) — term keys are
    # unbounded-width strings, so a per-slot constant can undercount
    from ocr_service_ray.ops.pool import measured_nbytes

    idf_nbytes = measured_nbytes(idf_lut)
    idf_ref = ray.put(idf_lut)

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

    return bcast_stage(ds, Rank, idf_nbytes)


def _tfidf_shuffle(ds, k, text_col, id_col, log_idf):
    """Gram-keyed shuffle strategy (mirrors ``ngrams._stats_shuffle``):
    no driver pull and no broadcast of the vocabulary — the df table
    is joined to the exploded (doc, term, tf) rows on ``term`` (one
    hash shuffle moving distinct-term rows, never document text), and
    the per-doc fold is one coarse-bucketed groupby on the doc id.

    Every document emits ≥ 1 term row (an empty text tokenizes to the
    single term ``""``, which is in the df table by construction), so
    the inner join preserves the per-doc output contract without a
    spine join."""
    import pandas as pd
    import pyarrow.compute as pc

    from ocr_service_ray.ops.agg import bucketed_map_groups
    from ocr_service_ray.ops.relational import hash_join

    n_docs = int(ds.count())
    df_ds = term_doc_freq(ds, text_col)

    def explode_tf(batch: pa.Table) -> pa.Table:
        ids, terms, tfs = [], [], []
        for key, t in zip(batch[id_col].to_pylist(), batch[text_col].to_pylist()):
            for term, tf in Counter(t.split(" ")).items():
                ids.append(key)
                terms.append(term)
                tfs.append(tf)
        return pa.table(
            {
                id_col: pa.array(ids, batch[id_col].type),
                "term": pa.array(terms, pa.string()),
                "tf": pa.array(tfs, pa.int64()),
            }
        )

    tf_rows = ds.map_batches(explode_tf, batch_format="pyarrow")
    # repartition: term_doc_freq's combiner emits schema-less zero-row
    # blocks for empty buckets and the acero join intermittently
    # rejects them on the probe side (repo landmine — flaked once in a
    # 237-query sweep under load; see hash_join's docstring)
    joined = hash_join(tf_rows, df_ds.repartition(4), on="term")

    def score(b: pa.Table) -> pa.Table:
        tf = b["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        idf = _rational_idf(
            n_docs, b["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        )
        if log_idf:
            idf = np.log(1.0 + idf)
        return pa.table(
            {
                id_col: b[id_col],
                "term": b["term"],
                "tf": pc.cast(b["tf"], pa.int64()),
                "score": pa.array(tf * idf, pa.float64()),
            }
        )

    scored = joined.map_batches(score, batch_format="pyarrow")

    def per_doc_topk(g: pd.DataFrame) -> pd.DataFrame:
        top = g.sort_values(
            ["score", "term"], ascending=[False, True], kind="stable"
        ).head(k)
        return top[[id_col, "term", "tf", "score"]]

    return bucketed_map_groups(scored, [id_col], per_doc_topk)


def bm25_search(
    ds,
    query_terms: list[str],
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    log_idf: bool = False,
    stats_path: str | None = None,
):
    """Top-``k`` documents for a bag-of-terms query by BM25
    (Robertson/Spärck Jones; idf per the module's rational-odds
    contract). Per-term contributions are summed left-associatively
    in ``query_terms`` order — pinned so the oracle folds identically.

    The text is scanned ONCE: per-doc (dl, tf_j) ints are projected
    vectorized (``pc.count_substring`` on a space-doubled pad — token
    == exact ``\\x20term\\x20`` match) and pinned (ints only), then
    df/avgdl and the scored combiner top-k run over that tiny table.
    The pin is the object store by default; pass ``stats_path`` to
    write the projection as parquet and read it back instead — at
    corpus scale the per-doc stats are O(docs) and must live in
    storage, not cluster memory (and a re-run with the same terms can
    reuse them)."""
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

    stats_plan = ds.map_batches(project, batch_format="pyarrow")
    if stats_path is not None:
        from ocr_service_ray.sources.readers import read_parquet_clean
        from ocr_service_ray.sources.sinks import write_parquet_sized

        write_parquet_sized(stats_plan, stats_path)
        stats = read_parquet_clean(stats_path)
    else:
        stats = stats_plan.materialize()

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
