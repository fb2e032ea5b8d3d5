"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship interleaved-document extraction pipeline
on sf0.001; ``queries()`` exposes one callable per implemented
operator/pipeline (SURVEY.md §2 + the training-data scale ops);
``oracle_sql()`` gives the DuckDB-equivalent SQL for every
SQL-expressible query. Ray is initialised by the DRIVER — nothing
here calls ray.init/ray.shutdown.

Exact-match discipline for float-valued oracles: any derived float is
emitted as ``CAST(floor(x * 1000000.0 + 0.5) AS BIGINT)`` (micro
units) computed from the SAME double expression on both sides — floor
of an identical IEEE-754 expression is bit-deterministic, unlike
round() whose half-way rule differs between numpy (half-even) and
DuckDB (half-away). Raw storage floats (no arithmetic) pass through
untouched.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SF_DEFAULT = "/root/testdata/sf0.001"


def _micro(x: np.ndarray) -> np.ndarray:
    return np.floor(x * 1000000.0 + 0.5).astype(np.int64)


def _read(sf_dir: str, name: str, columns=None):
    from ocr_service_ray.sources.readers import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/{name}.parquet", columns=columns)


# ---------------------------------------------------------------- flagship


def _flagship(sf_dir: str):
    from ocr_service_ray.pipelines.derive import derived_corpus
    from ocr_service_ray.pipelines.flagship import run_extraction
    from ocr_service_ray.stages.ocr import GENERATE_MEDIA

    out = run_extraction(derived_corpus(sf_dir), GENERATE_MEDIA)

    def project(batch: pa.Table) -> pa.Table:
        n_spans = pc.list_value_length(batch["spans"])
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_spans": pc.cast(n_spans, pa.int64()),
                "total_pages": pc.cast(batch["total_pages"], pa.int64()),
                "n_corrections": pc.cast(batch["n_corrections"], pa.int64()),
                "ocr_conf_micro": pa.array(
                    _micro(batch["ocr_confidence"].to_numpy(zero_copy_only=False))
                ),
                "quality_micro": pa.array(
                    _micro(batch["overall_quality"].to_numpy(zero_copy_only=False))
                ),
                "needs_review": batch["needs_review"],
            }
        )

    return out.map_batches(project, batch_format="pyarrow")


def entry() -> Any:
    """Flagship pipeline on sf0.001 (driver smoke check)."""
    return _flagship(SF_DEFAULT)


# ---------------------------------------------------------------- queries


def queries() -> dict[str, Callable[[str], Any]]:
    from ocr_service_ray.kernels.correct import CorrectionsDB, correct_text
    from ocr_service_ray.ops import dedup, relational, similarity, text as text_ops
    from ocr_service_ray.sources.synth import corrections_entries

    # -- extraction-engine operators over the documents table --------

    def q_correct_text_guards(sf_dir):
        """M4-M6 correction kernel; Latin/digit guards mean identity on
        this corpus — the oracle asserts the guards hold corpus-wide."""
        entries = corrections_entries()

        class Correct:
            def __init__(self):
                self.db = CorrectionsDB(entries)

            def __call__(self, batch: pa.Table) -> pa.Table:
                corrected, n = [], []
                for t in batch["text"].to_pylist():
                    c, corr = correct_text(t, self.db)
                    corrected.append(c)
                    n.append(len(corr))
                return pa.table(
                    {
                        "doc_id": batch["doc_id"],
                        "corrected_text": pa.array(corrected, pa.string()),
                        "n_corrections": pa.array(n, pa.int64()),
                    }
                )

        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            Correct, batch_format="pyarrow", concurrency=(1, 8)
        )

    def q_token_counts(sf_dir):
        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            lambda b: text_ops.token_counts(b).drop_columns(["text"]),
            batch_format="pyarrow",
        )

    def q_bpe_token_count(sf_dir):
        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            lambda b: text_ops.bpe_token_count(b).drop_columns(["text"]),
            batch_format="pyarrow",
        )

    def q_lang_distribution(sf_dir):
        from ocr_service_ray.ops.agg import grouped_agg

        return grouped_agg(
            _read(sf_dir, "documents", ["lang", "n_chars"]),
            ["lang"],
            {"n_docs": ("n_chars", "count"), "sum_chars": ("n_chars", "sum")},
        )

    def q_top_sources(sf_dir):
        from ocr_service_ray.ops.agg import grouped_agg

        return relational.topk(
            grouped_agg(
                _read(sf_dir, "documents", ["source"]),
                ["source"],
                {"n_docs": (None, "count")},
            ),
            by=["n_docs", "source"],
            k=10,
            descending=[True, False],
        )

    def q_exact_dedup(sf_dir):
        return dedup.exact_dedup(_read(sf_dir, "documents", ["doc_id", "text"]))

    # -- events: windows / A3-shaped promotion / A4 top-k / sessions --

    def q_windowed_events(sf_dir):
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        def add_window(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["window"] = b["ts"].dt.floor("h").dt.strftime("%Y-%m-%d %H:%M:%S")
            # per-row floor-cents BEFORE the sum: integer accumulation is
            # order-independent, so the distributed sum is bit-exact
            b["cents"] = np.floor(b["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
            return b[["window", "event_type", "cents"]]

        return grouped_agg(
            _read(sf_dir, "events", ["ts", "event_type", "value"]).map_batches(
                add_window, batch_format="pandas"
            ),
            ["window", "event_type"],
            {"n_events": ("cents", "count"), "sum_value_cents": ("cents", "sum")},
        )

    def q_sliding_window_events(sf_dir):
        """Hopping-window aggregate (size 2h, hop 1h): each event lands
        in 2 windows; explode + one combined grouped aggregate."""
        return relational.sliding_window_agg(
            _read(sf_dir, "events", ["ts", "event_type", "value"]),
            size_hours=2,
            hop_hours=1,
        )

    def q_promote_shape_events(sf_dir):
        """A3 promotion shape (groupby → count/mean gates) applied to
        the events table: pairs with ≥3 occurrences and mean value ≥ 100."""
        from ocr_service_ray.ops.agg import grouped_agg

        agg = grouped_agg(
            _read(sf_dir, "events", ["user_id", "event_type", "value"]),
            ["user_id", "event_type"],
            {"occurrences": ("value", "count"), "_avg": ("value", "mean")},
        )

        def gate(b: pa.Table) -> pa.Table:
            occ = b["occurrences"].to_numpy(zero_copy_only=False)
            avg = b["_avg"].to_numpy(zero_copy_only=False)
            keep = (occ >= 3) & (avg >= 100.0)
            t = b.filter(pa.array(keep))
            micro = _micro(t["_avg"].to_numpy(zero_copy_only=False))
            return t.drop_columns(["_avg"]).append_column("avg_value_micro", pa.array(micro))

        return agg.map_batches(gate, batch_format="pyarrow")

    def q_top_error_users(sf_dir):
        from ocr_service_ray.ops.agg import grouped_agg

        errors = _read(sf_dir, "events", ["user_id", "event_type"]).map_batches(
            lambda b: b.filter(pc.equal(b["event_type"], "error")).select(["user_id"]),
            batch_format="pyarrow",
        )
        return relational.topk(
            grouped_agg(errors, ["user_id"], {"n_errors": (None, "count")}),
            by=["n_errors", "user_id"],
            k=10,
            descending=[True, False],
        )

    def q_sessionize_users(sf_dir):
        return relational.sessionize(
            _read(sf_dir, "events", ["user_id", "ts"]), gap_minutes=30
        )

    # -- joins ---------------------------------------------------------

    def q_join_orders_customers(sf_dir):
        import pandas as pd
        import pyarrow.parquet as pq

        cust = (
            pq.read_table(
                f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
            )
            .to_pandas()
            .rename(columns={"c_custkey": "o_custkey"})
        )
        joined = relational.broadcast_join(
            _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]), cust, on="o_custkey"
        )

        def to_cents(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["cents"] = np.floor(b["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
            return b[["c_mktsegment", "cents"]]

        from ocr_service_ray.ops.agg import grouped_agg

        return grouped_agg(
            joined.map_batches(to_cents, batch_format="pandas"),
            ["c_mktsegment"],
            {"n_orders": ("cents", "count"), "total_cents": ("cents", "sum")},
        )

    def q_hash_join_orders_lineitem(sf_dir):
        """Large-large hash-partitioned join (Dataset.join)."""
        from ocr_service_ray.ops.agg import grouped_agg

        from ocr_service_ray.ops.relational import join_partitions_for

        orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])
        li = _read(sf_dir, "lineitem", ["l_orderkey"])
        joined = orders.join(
            li,
            join_type="inner",
            # size-derived, not a literal: partition count must track
            # data volume (~128 MB of join input per partition)
            num_partitions=join_partitions_for(orders, li),
            on=("o_orderkey",),
            right_on=("l_orderkey",),
        )
        return grouped_agg(
            joined.select_columns(["o_orderstatus"]),
            ["o_orderstatus"],
            {"n_lineitems": (None, "count")},
        )

    def q_lineitem_pricing(sf_dir):
        """TPC-H-Q1-shaped global aggregate (A7): exact int accumulation
        via per-term floor-cents."""

        def prep(b: pa.Table) -> pa.Table:
            qty = b["l_quantity"].to_numpy(zero_copy_only=False)
            ext = b["l_extendedprice"].to_numpy(zero_copy_only=False)
            disc = b["l_discount"].to_numpy(zero_copy_only=False)
            rev_cents = np.floor(ext * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
            disc_micro = np.floor(disc * 1000000.0 + 0.5).astype(np.int64)
            return pa.table(
                {
                    "l_returnflag": b["l_returnflag"],
                    "l_linestatus": b["l_linestatus"],
                    "qty": pa.array(qty.astype(np.int64)),
                    "rev_cents": pa.array(rev_cents),
                    "disc_micro": pa.array(disc_micro),
                }
            )

        from ocr_service_ray.ops.agg import grouped_agg

        return grouped_agg(
            _read(
                sf_dir,
                "lineitem",
                ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
            ).map_batches(prep, batch_format="pyarrow"),
            ["l_returnflag", "l_linestatus"],
            {
                "sum_qty": ("qty", "sum"),
                "revenue_cents": ("rev_cents", "sum"),
                "sum_disc_micro": ("disc_micro", "sum"),
                "n_rows": ("qty", "count"),
            },
        )

    def q_asof_purchase_click(sf_dir):
        """As-of join: each purchase matched to the user's latest
        click at-or-before the purchase time (DuckDB ASOF LEFT JOIN
        is the oracle). One shuffle on user_id; vectorized
        merge_asof per key group."""
        import pandas as pd

        ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

        # SELF as-of: ONE scan tags both sides (purchase → left row,
        # click → right row) — two filtered sub-plans would scan the
        # events source twice.
        def tag_sides(b: pa.Table) -> pa.Table:
            keep = b.filter(
                pc.is_in(
                    b["event_type"], value_set=pa.array(["purchase", "click"])
                )
            )
            is_click = pc.equal(keep["event_type"], "click")
            us = pc.cast(pc.cast(keep["ts"], pa.timestamp("us")), pa.int64())
            return pa.table(
                {
                    "event_id": pc.if_else(
                        is_click, pa.nulls(keep.num_rows, pa.int64()), keep["event_id"]
                    ),
                    "user_id": keep["user_id"],
                    "ts": keep["ts"],
                    "click_us": pc.if_else(is_click, us, pa.nulls(keep.num_rows, pa.int64())),
                    "_side": pc.cast(is_click, pa.int8()),
                }
            )

        joined = relational.asof_join_tagged(
            ev.map_batches(tag_sides, batch_format="pyarrow"),
            on="ts",
            by="user_id",
            left_cols=["event_id", "user_id", "ts"],
            right_extra=["click_us"],
        )

        def project(b: pd.DataFrame) -> pd.DataFrame:
            # inner semantics for the oracle row (nullable ints don't
            # survive the driver's canonicalization) — the op itself
            # is left-join and pytest covers the no-match case
            b = b[b["click_us"].notna()]
            return pd.DataFrame(
                {
                    "event_id": b["event_id"].astype("int64"),
                    "user_id": b["user_id"].astype("int64"),
                    "purchase_us": b["ts"].astype("datetime64[us]").astype("int64"),
                    "click_us": b["click_us"].astype("int64"),
                }
            )

        return joined.map_batches(project, batch_format="pandas")

    def q_range_join_values(sf_dir):
        """Broadcast range join (value → bucket via searchsorted) +
        grouped totals; oracle is a DuckDB inequality join."""
        ranges = [("low", 0.0, 5.0), ("mid", 5.0, 20.0), ("high", 20.0, 100.0), ("whale", 100.0, 1e12)]
        tagged = relational.broadcast_range_join(
            _read(sf_dir, "events", ["event_type", "value"]), ranges, "value"
        )

        def cents(b: pa.Table) -> pa.Table:
            c = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {"bucket": b["bucket"], "event_type": b["event_type"], "cents": pa.array(c)}
            )

        from ocr_service_ray.ops.agg import grouped_agg

        return grouped_agg(
            tagged.map_batches(cents, batch_format="pyarrow"),
            ["bucket", "event_type"],
            {"n_events": ("cents", "count"), "total_cents": ("cents", "sum")},
        )

    def q_sort_topk_orders(sf_dir):
        return relational.topk(
            _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]),
            by=["o_totalprice", "o_orderkey"],
            k=20,
            descending=[True, False],
        )

    # -- embeddings: similarity search + near-dup ----------------------

    def _query_vec(sf_dir) -> np.ndarray:
        import pyarrow.parquet as pq

        t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
        idx = t["vec_id"].to_pylist().index(0)
        return np.asarray(t["embedding"].to_pylist()[idx], dtype=np.float64)

    def q_knn_brute(sf_dir):
        q = _query_vec(sf_dir)
        top = similarity.knn_brute(_read(sf_dir, "embeddings"), q, k=5)

        def micro(b: pa.Table) -> pa.Table:
            m = _micro(b["cos_sim"].to_numpy(zero_copy_only=False))
            return pa.table({"vec_id": b["vec_id"], "cos_sim_micro": pa.array(m)})

        return top.map_batches(micro, batch_format="pyarrow")

    def q_embedding_norms(sf_dir):
        def norms(b: pa.Table) -> pa.Table:
            mat = similarity._as_matrix(b["embedding"])
            n = _micro(np.sqrt((mat * mat).sum(axis=1)))
            return pa.table({"vec_id": b["vec_id"], "l2_norm_micro": pa.array(n)})

        return _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
            norms, batch_format="pyarrow"
        )

    def q_near_dup_sample(sf_dir):
        sampled = _read(sf_dir, "embeddings").map_batches(
            lambda b: b.filter(
                pa.array(b["vec_id"].to_numpy(zero_copy_only=False) % 10 == 0)
            ),
            batch_format="pyarrow",
        )
        pairs = dedup.embedding_near_dup(sampled, threshold=0.3)

        def micro(b: pa.Table) -> pa.Table:
            m = _micro(b["cos_sim"].to_numpy(zero_copy_only=False))
            return pa.table(
                {"id_a": b["id_a"], "id_b": b["id_b"], "cos_sim_micro": pa.array(m)}
            )

        return pairs.map_batches(micro, batch_format="pyarrow")

    def q_near_dup_lsh_blocked(sf_dir):
        """Embedding near-dup with the CORPUS-SCALE blocking key: the
        hyperplane-LSH cell (not the label column) — the block
        assignment is pure arithmetic, so the oracle reproduces the
        same blocked pairing in SQL. Pairs across different cells are
        (by design) not compared — exactly what the oracle mirrors."""
        planes = np.random.RandomState(13).standard_normal((4, 64))

        def assign(b: pa.Table) -> pa.Table:
            mat = similarity._as_matrix(b["embedding"])
            bits = (mat @ planes.T) > 0.0
            cell = (bits.astype(np.int64) << np.arange(4, dtype=np.int64)).sum(axis=1)
            return b.append_column("lsh_cell", pa.array(cell, pa.int32()))

        sampled = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
            lambda b: b.filter(
                pa.array(b["vec_id"].to_numpy(zero_copy_only=False) % 5 == 0)
            ),
            batch_format="pyarrow",
        )
        pairs = dedup.embedding_near_dup(
            sampled.map_batches(assign, batch_format="pyarrow"),
            block_col="lsh_cell",
            threshold=0.2,
        )

        def micro(b: pa.Table) -> pa.Table:
            m = _micro(b["cos_sim"].to_numpy(zero_copy_only=False))
            return pa.table(
                {"id_a": b["id_a"], "id_b": b["id_b"], "cos_sim_micro": pa.array(m)}
            )

        return pairs.map_batches(micro, batch_format="pyarrow")

    # -- set ops / split / anti-join / optional-ML stages ---------------

    def q_unique_langs(sf_dir):
        """D3 distinct vocabulary via Dataset.unique."""
        langs = relational.distinct_values(_read(sf_dir, "documents", ["lang"]), "lang")
        return pa.table({"lang": pa.array(langs, pa.string())})

    def q_train_val_split(sf_dir):
        """O8 positional 80/20 split (sorted on doc_id first — O1)."""
        train, val = relational.train_val_split(
            _read(sf_dir, "documents", ["doc_id"]), 0.8, sort_col="doc_id"
        )
        return pa.table(
            {
                "split": pa.array(["train", "val"], pa.string()),
                "n_rows": pa.array([train.count(), val.count()], pa.int64()),
            }
        )

    def q_next_epoch(sf_dir):
        """§2.9 epoch semantics end-to-end: promote the feedback
        fixture, anti-join against the current DB's keys, append in
        promotion order. Run against the reference DEFAULT_CORRECTIONS
        (which lacks the promoted key) so BOTH behaviors — keep-order
        and append — are exercised; the oracle re-derives the whole
        next epoch in SQL."""
        import ray.data as rd

        from ocr_service_ray.kernels.correct import DEFAULT_CORRECTIONS
        from ocr_service_ray.pipelines.feedback import next_epoch, promote_corrections
        from ocr_service_ray.sources.synth import generate_feedback

        promoted = promote_corrections(rd.from_arrow(generate_feedback()))
        entries = next_epoch(list(DEFAULT_CORRECTIONS), promoted)
        return pa.table(
            {
                "ord": pa.array(range(len(entries)), pa.int64()),
                "from_": pa.array([e[0] for e in entries], pa.string()),
                "to": pa.array([e[1] for e in entries], pa.string()),
            }
        )

    def q_html_main_content(sf_dir):
        """HTML boilerplate strip via text-density DOM scoring
        (ops/html.py — the north star's Readability/trafilatura-style
        node heuristic): documents are wrapped in a deterministic
        boilerplate template (nav / ads / related links / footer) and
        the extractor must recover EXACTLY the article text — the
        oracle is the identity on documents.text."""
        from ocr_service_ray.ops.html import strip_boilerplate, synthesize_pages

        return strip_boilerplate(
            synthesize_pages(_read(sf_dir, "documents", ["doc_id", "text"]))
        )

    def q_simple_spell(sf_dir):
        """M16 rule-based spell corrector (digit-confusion fix inside
        number-like tokens). Over the ASCII corpus Python's unicode
        \\b and RE2's ASCII \\b agree, so the oracle re-runs the token
        split + translate in SQL. (Cyrillic behavior is pinned by the
        kernel conformance tests.)"""
        from ocr_service_ray.kernels.spell import simple_spell_correct

        def correct(b: pa.Table) -> pa.Table:
            # ASCII confusable prefix planted on BOTH sides so the
            # replacement path is actually exercised corpus-wide (the
            # raw corpus has no number-like tokens)
            out = [
                simple_spell_correct("SG1 l0G " + t) for t in b["text"].to_pylist()
            ]
            return pa.table({"doc_id": b["doc_id"], "spelled": pa.array(out, pa.string())})

        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            correct, batch_format="pyarrow"
        )

    def q_hash_sample_docs(sf_dir):
        """Deterministic 20% hash-sample of the documents table — the
        scale-safe sampling op (no random_shuffle, no RNG state); the
        oracle reproduces the md5-uniform threshold exactly."""
        return relational.hash_sample(
            _read(sf_dir, "documents", ["doc_id", "n_chars"]), "doc_id", 0.2
        )

    def q_stratified_split_counts(sf_dir):
        """Deterministic per-row split assignment, aggregated per
        (lang, split) — layout-independent train/val (every doc_id
        keeps its split on any cluster/partitioning)."""
        from ocr_service_ray.ops.agg import grouped_agg

        assigned = relational.stratified_split(
            _read(sf_dir, "documents", ["doc_id", "lang"]), "doc_id", 0.8
        )
        return grouped_agg(
            assigned.select_columns(["lang", "split"]),
            ["lang", "split"],
            {"n_docs": (None, "count")},
        )

    def q_anti_join_orders(sf_dir):
        """D4 broadcast anti-join: orders whose customer is NOT in the
        BUILDING segment, aggregated by status."""
        import pyarrow.parquet as pq

        from ocr_service_ray.ops.agg import grouped_agg

        cust = pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
        )
        building = cust.filter(pc.equal(cust["c_mktsegment"], "BUILDING"))[
            "c_custkey"
        ].to_pylist()
        kept = relational.broadcast_anti_join(
            _read(sf_dir, "orders", ["o_custkey", "o_orderstatus", "o_totalprice"]),
            building,
            on="o_custkey",
        )

        def cents(b: pa.Table) -> pa.Table:
            c = np.floor(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {"o_orderstatus": b["o_orderstatus"], "cents": pa.array(c)}
            )

        return grouped_agg(
            kept.map_batches(cents, batch_format="pyarrow"),
            ["o_orderstatus"],
            {"n_orders": ("cents", "count"), "total_cents": ("cents", "sum")},
        )

    def q_salted_event_totals(sf_dir):
        """Hot-key-safe two-phase salted aggregation (ops/skew.py):
        result exactly equals the direct GROUP BY."""
        from ocr_service_ray.ops.skew import salted_aggregate

        def cents(b: pa.Table) -> pa.Table:
            c = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table({"event_type": b["event_type"], "cents": pa.array(c)})

        return salted_aggregate(
            _read(sf_dir, "events", ["event_type", "value"]).map_batches(
                cents, batch_format="pyarrow"
            ),
            "event_type",
            num_salts=8,
            count_alias="n_events",
            sum_col="cents",
            sum_alias="total_cents",
        )

    def q_ngram_jaccard(sf_dir):
        """Exact word-3-gram Jaccard over consecutive-id doc pairs —
        the verification kernel of the dedup family, co-located by one
        pair-key groupby."""
        pairs = dedup.ngram_jaccard_pairs(
            _read(sf_dir, "documents", ["doc_id", "text"]), pair_key=lambda i: i // 2
        )

        def micro(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "id_a": pc.cast(b["id_a"], pa.int64()),
                    "id_b": pc.cast(b["id_b"], pa.int64()),
                    "jaccard_micro": pa.array(
                        _micro(b["jaccard"].to_numpy(zero_copy_only=False))
                    ),
                }
            )

        return pairs.map_batches(micro, batch_format="pyarrow")

    def q_dup_ngram_stats(sf_dir):
        """Duplicate n-gram span detection (substring-level corpus
        dedup, ops/ngrams.py): per-doc occurrences + token coverage of
        word-5-grams appearing in >= 2 distinct documents. Runs the
        SHUFFLE strategy (gram-keyed hash join + per-doc fold) — the
        100 TB path; tests assert broadcast == shuffle."""
        from ocr_service_ray.ops.ngrams import duplicate_ngram_stats

        return duplicate_ngram_stats(
            _read(sf_dir, "documents", ["doc_id", "text"]),
            n=5,
            min_df=2,
            strategy="shuffle",
        )

    def q_spell_guard(sf_dir):
        """T2 spell-corrector actor stage; sandbox backend is the
        identity fake, so output text equals input — which is exactly
        what the oracle asserts corpus-wide."""
        from ocr_service_ray.stages.ml import SpellCorrectorStage

        return (
            _read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(
                SpellCorrectorStage, batch_format="pyarrow", concurrency=(1, 4)
            )
            .map_batches(
                lambda b: b.select(["doc_id", "ml_corrected_text", "corrector_backend"]),
                batch_format="pyarrow",
            )
        )

    def q_ml_quality_combined(sf_dir):
        """T4 combined-quality actor stage over SQL-derivable inputs
        (precomputed-score path): ml = (doc_id*2654435761 % 1000003)
        / 1000003, ocr = 0.5 + (doc_id*7919 % 500)/1000, hw = doc_id%5
        — integer arithmetic is exact on both sides, so the verbatim
        combined-score + divergence-fallback formula is bit-checkable."""
        from ocr_service_ray.stages.ml import MLQualityStage

        def derive_inputs(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            ml = (ids * 2654435761 % 1000003) / 1000003.0
            ocr = 0.5 + (ids * 7919 % 500) / 1000.0
            hw = ids % 5
            return pa.table(
                {
                    "doc_id": b["doc_id"],
                    "ml_input": pa.array(ml),
                    "ocr_confidence": pa.array(ocr),
                    "n_handwritten": pa.array(hw),
                }
            )

        staged = (
            _read(sf_dir, "documents", ["doc_id"])
            .map_batches(derive_inputs, batch_format="pyarrow")
            .map_batches(
                MLQualityStage,
                batch_format="pyarrow",
                concurrency=(1, 4),
                fn_constructor_kwargs={"score_col": "ml_input"},
            )
        )

        def micro(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": b["doc_id"],
                    "combined_micro": pa.array(
                        _micro(b["ml_combined_quality"].to_numpy(zero_copy_only=False))
                    ),
                }
            )

        return staged.map_batches(micro, batch_format="pyarrow")

    def q_windowed_streaming(sf_dir):
        """Streaming tumbling-window aggregate with watermark-closed
        windows (raw-actor tier, ops/streaming.py); after the full
        drain it equals the batch hourly aggregate, which the SQL
        window oracle asserts exactly."""
        from ocr_service_ray.ops.streaming import windowed_agg_streaming

        def cents(b: pa.Table) -> pa.Table:
            c = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {"event_type": b["event_type"], "ts": b["ts"], "cents": pa.array(c)}
            )

        out = windowed_agg_streaming(
            _read(sf_dir, "events", ["event_type", "ts", "value"]).map_batches(
                cents, batch_format="pyarrow"
            ),
            window_minutes=60,
            value_col="cents",
        )
        return out.map_batches(
            lambda b: pa.table(
                {
                    "window_us": b["window_us"],
                    "event_type": b["key"],
                    "n_events": b["n_events"],
                    "sum_value_cents": b["sum_value"],
                }
            ),
            batch_format="pyarrow",
        )

    def q_json_props_stats(sf_dir):
        """M18-shaped JSON payload parsing: vectorized RE2 extraction
        of the integer 'k' field from the events props JSON, then a
        combined grouped aggregate (DuckDB json_extract oracle)."""
        from ocr_service_ray.ops.agg import grouped_agg

        parsed = _read(sf_dir, "events", ["event_type", "props"]).map_batches(
            lambda b: text_ops.extract_json_int(b, "props", "k").drop_columns(["props"]),
            batch_format="pyarrow",
        )
        return grouped_agg(
            parsed,
            ["event_type"],
            {"n_with_k": ("k", "count"), "sum_k": ("k", "sum")},
        )

    def q_consensus_suggestions(sf_dir):
        """A2 consensus over the flagship corpus's applied corrections
        (cutoff 1.0 so the reference's vacuous <0.8 filter is actually
        exercised): every planted correction agrees on one fix, so the
        consensus table is one row whose occurrence count the oracle
        re-derives from the generative rule."""
        from ocr_service_ray.pipelines.derive import derived_corpus
        from ocr_service_ray.pipelines.feedback import consensus_suggestions
        from ocr_service_ray.pipelines.flagship import run_extraction
        from ocr_service_ray.stages.ocr import GENERATE_MEDIA

        out = consensus_suggestions(
            run_extraction(derived_corpus(sf_dir), GENERATE_MEDIA), max_confidence=1.0
        )
        return out.map_batches(
            lambda b: pa.table(
                {
                    "from_": b["from_"],
                    "to": b["to"],
                    "confidence": pc.cast(b["confidence"], pa.float64()),
                    "occurrences": pc.cast(b["occurrences"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )

    def q_corpus_summary(sf_dir):
        """A7/S8 corpus statistics (the summary.json aggregate) —
        integer fields only, so the distributed partial+merge is
        bit-exact against the SQL re-derivation. The float means stay
        in the API (pytest-verified) but off the hash row."""
        from ocr_service_ray.pipelines.derive import derived_corpus
        from ocr_service_ray.pipelines.flagship import corpus_summary, run_extraction
        from ocr_service_ray.stages.ocr import GENERATE_MEDIA

        s = corpus_summary(run_extraction(derived_corpus(sf_dir), GENERATE_MEDIA))
        return pa.table(
            {
                "documents": pa.array([int(s["documents"])], pa.int64()),
                "total_corrections": pa.array([int(s["total_corrections"])], pa.int64()),
                "total_pages": pa.array([int(s["total_pages"])], pa.int64()),
            }
        )

    # -- rows-only (non-SQL-expressible) --------------------------------

    def q_flagship_extraction(sf_dir):
        return _flagship(sf_dir)

    def q_classify_docs(sf_dir):
        """T3 classifier actor stage (hash-fake backend) with the
        reference's conditional-application branch."""
        from ocr_service_ray.stages.ml import DocumentClassifierStage

        return (
            _read(sf_dir, "documents", ["doc_id"])
            .map_batches(
                DocumentClassifierStage,
                batch_format="pyarrow",
                concurrency=(1, 4),
            )
            .map_batches(
                lambda b: b.select(["doc_id", "document_type"]),
                batch_format="pyarrow",
            )
        )

    def q_render_json(sf_dir):
        """S9 format_output (JSON rendering) over the flagship output,
        PARTIAL-ORACLED: the real json.dumps output is rendered, then
        json.loads-parsed back (float reprs round-trip exactly) and
        projected to SQL-comparable fields — full_text byte-exact,
        floats as micro-ints, counts and flags. Verifies the JSON is
        well-formed and carries exactly the right values; only the
        literal float byte layout stays unverified (shortest-round-trip
        reprs are not SQL-reproducible, the r1/r2 no_oracle reason)."""
        import json

        from ocr_service_ray.pipelines.derive import derived_corpus
        from ocr_service_ray.pipelines.flagship import run_extraction
        from ocr_service_ray.stages.ocr import GENERATE_MEDIA
        from ocr_service_ray.stages.render import render_output

        rendered = render_output(
            run_extraction(derived_corpus(sf_dir), GENERATE_MEDIA), fmt="json"
        )

        def parse_back(b: pa.Table) -> pa.Table:
            ids, texts, qm, om, nr, nc = [], [], [], [], [], []
            for s in b["rendered"].to_pylist():
                p = json.loads(s)  # proves well-formedness per row
                ids.append(p["doc_id"])
                texts.append(p["full_text"])
                qm.append(int(np.floor(p["overall_quality"] * 1000000.0 + 0.5)))
                om.append(int(np.floor(p["ocr_confidence"] * 1000000.0 + 0.5)))
                nr.append(bool(p["needs_review"]))
                nc.append(len(p["corrections_applied"]))
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.string()),
                    "full_text": pa.array(texts, pa.string()),
                    "quality_micro": pa.array(qm, pa.int64()),
                    "ocr_conf_micro": pa.array(om, pa.int64()),
                    "needs_review": pa.array(nr, pa.bool_()),
                    "n_corrections": pa.array(nc, pa.int64()),
                }
            )

        return rendered.map_batches(parse_back, batch_format="pyarrow")

    def q_render_text(sf_dir):
        """S9 format_output text rendering over the flagship output —
        header, %.3f quality line, corrected full text, corrections
        appendix. Byte-exact against the SQL oracle (the generative
        full text and every float format are reconstructible)."""
        from ocr_service_ray.pipelines.derive import derived_corpus
        from ocr_service_ray.pipelines.flagship import run_extraction
        from ocr_service_ray.stages.ocr import GENERATE_MEDIA
        from ocr_service_ray.stages.render import render_output

        return render_output(
            run_extraction(derived_corpus(sf_dir), GENERATE_MEDIA), fmt="text"
        )

    def q_lang_id(sf_dir):
        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            lambda b: text_ops.lang_id(b).drop_columns(["text"]), batch_format="pyarrow"
        )

    def q_quality_scores(sf_dir):
        """Composite quality heuristic; quality_micro carries the
        raw-ratio composite under the micro-int oracle discipline."""
        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            lambda b: text_ops.quality_score(b).select(["doc_id", "quality_micro"]),
            batch_format="pyarrow",
        )

    def q_fingerprint(sf_dir):
        """Winnowing fingerprint, projected as (hi32, lo32) int64
        halves — DuckDB reproduces the mod-2^64 rolling hash in
        HUGEINT and splits identically."""

        def split(b: pa.Table) -> pa.Table:
            fp = b["fingerprint"].to_numpy(zero_copy_only=False).astype(np.uint64)
            return pa.table(
                {
                    "doc_id": b["doc_id"],
                    "fp_hi": pa.array((fp >> np.uint64(32)).astype(np.int64)),
                    "fp_lo": pa.array((fp & np.uint64(0xFFFFFFFF)).astype(np.int64)),
                }
            )

        return (
            _read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(
                lambda b: text_ops.fingerprint(b).select(["doc_id", "fingerprint"]),
                batch_format="pyarrow",
            )
            .map_batches(split, batch_format="pyarrow")
        )

    def q_minhash_dedup(sf_dir):
        return dedup.minhash_lsh_candidates(
            _read(sf_dir, "documents", ["doc_id", "text"]), threshold=0.4
        )

    def q_snapshot_diff(sf_dir):
        """Incremental-ingest snapshot diff (ops/diff.py): documents
        vs a simulated next crawl (doc_id%17 removed, %10 retexted,
        %23 re-added under id+10M) → added/removed/changed ids via two
        id-keyed left joins over (id, content-hash) — text never
        shuffles. Oracle rebuilds the crawl rule and the diff in SQL."""
        from ocr_service_ray.ops.diff import snapshot_diff_table

        docs = _read(sf_dir, "documents", ["doc_id", "text"])

        def mutate(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            kept = b.filter(pa.array(ids % 17 != 0))
            kids = kept["doc_id"].to_numpy(zero_copy_only=False)
            texts = kept["text"].to_pylist()
            out = [
                t + " v2" if i % 10 == 0 else t for i, t in zip(kids, texts)
            ]
            return pa.table(
                {
                    "doc_id": kept["doc_id"],
                    "text": pa.array(out, pa.string()),
                }
            )

        def readded(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            keep = ids % 23 == 0
            sub = b.filter(pa.array(keep))
            return pa.table(
                {
                    "doc_id": pa.array(
                        sub["doc_id"].to_numpy(zero_copy_only=False)
                        + 10_000_000
                    ),
                    "text": sub["text"],
                }
            )

        # materialize the derived snapshot: the diff's emptiness guard
        # and its two joins would otherwise each re-execute the
        # mutate/readded derivation (the multi-consumer rule — the
        # ADVICE-documented caller contract of snapshot_diff)
        new_ds = (
            docs.map_batches(mutate, batch_format="pyarrow")
            .union(docs.map_batches(readded, batch_format="pyarrow"))
            .materialize()
        )
        return snapshot_diff_table(docs, new_ds)

    def q_weighted_sample_events(sf_dir):
        """Deterministic weight-proportional sampling
        (ops/scan.weighted_systematic_sample): systematic ticks on the
        cumulative cents line in event_id order — pure integer
        arithmetic, zero RNG, layout-invariant. Oracle mirrors the
        tick predicate over a window SUM."""
        from ocr_service_ray.ops.scan import weighted_systematic_sample

        ds = _read(sf_dir, "events", ["event_id", "value"])

        def to_cents(b: pa.Table) -> pa.Table:
            cents = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            # clamp at 0: negative weights are meaningless for PPS
            return pa.table(
                {
                    "event_id": b["event_id"],
                    "cents": pa.array(np.maximum(cents, 0)),
                }
            )

        return weighted_systematic_sample(
            ds.map_batches(to_cents, batch_format="pyarrow"),
            "event_id",
            "cents",
            step=200000,
        )

    def q_mode_priority(sf_dir):
        """Most frequent order priority per order status
        (ops/agg.grouped_mode): value-counts combiner + per-group
        argmax (tie → smallest value) — raw rows never shuffle."""
        from ocr_service_ray.ops.agg import grouped_mode

        out = grouped_mode(
            _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"]),
            ["o_orderstatus"],
            "o_orderpriority",
        )
        return out.map_batches(
            lambda b: b.assign(mode_count=b["mode_count"].astype("int64")),
            batch_format="pandas",
        )

    def q_profile_orders(sf_dir):
        """Per-column data-quality profile of the orders table
        (ops/agg.profile_table): rows / nulls / exact distinct /
        min / max via combiner partials — the pre-training ingest
        audit."""
        from ocr_service_ray.ops.agg import profile_table

        cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
        return profile_table(_read(sf_dir, "orders", cols), cols)

    def q_quantiles_cont_quantity(sf_dir):
        """Interpolated quantiles of lineitem quantity
        (ops/sketch.value_counts_quantiles_cont): value-counts
        combiner + a + frac·(b−a) interpolation — bit-exact against
        DuckDB quantile_cont (tested on randomized inputs)."""
        import pandas as pd

        from ocr_service_ray.ops.sketch import value_counts_quantiles_cont

        out = value_counts_quantiles_cont(
            _read(sf_dir, "lineitem", ["l_quantity"]),
            "l_quantity",
            [0.25, 0.5, 0.75, 0.9, 0.99],
        )
        return pd.DataFrame(
            {
                "q_pct": out["q_pct"].astype("int64"),
                "value_micro": _micro(out["value"].to_numpy()),
            }
        )

    def q_outlier_events(sf_dir):
        """Events > 3σ from their event_type mean
        (ops/agg.grouped_outliers): integer (n, Σv, Σv²) combiner →
        broadcast stats → squared-deviation filter. No sqrt — every
        float op is exact-rounded and mirrors the SQL."""
        from ocr_service_ray.ops.agg import grouped_outliers

        ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

        def to_cents(b: pa.Table) -> pa.Table:
            cents = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "event_id": b["event_id"],
                    "event_type": b["event_type"],
                    "cents": pa.array(cents),
                }
            )

        return grouped_outliers(
            ds.map_batches(to_cents, batch_format="pyarrow"),
            ["event_type"],
            "cents",
            k=3.0,
        )

    def q_bigram_top(sf_dir):
        """Top-20 corpus bigrams by count (ops/text.bigram_counts +
        combiner top-k) — collocation statistics; tiebreak (w1, w2)
        ascending."""
        from ocr_service_ray.ops.text import bigram_counts

        return relational.topk(
            bigram_counts(_read(sf_dir, "documents", ["text"])),
            ["n", "w1", "w2"],
            20,
            descending=[True, False, False],
        )

    def q_user_event_sequences(sf_dir):
        """Per-user ordered behavior sequence (ops/relational.py
        grouped_sequence): event types joined in (ts, event_id) order
        — the collect_list/string_agg shape behavioral training data
        needs. Oracle: string_agg(... ORDER BY ts, event_id)."""
        from ocr_service_ray.ops.relational import grouped_sequence

        out = grouped_sequence(
            _read(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"]),
            "user_id",
            ["ts", "event_id"],
            "event_type",
        )
        return out.map_batches(
            lambda b: b.assign(n_events=b["n_events"].astype("int64")),
            batch_format="pandas",
        )

    def q_pack_sequences(sf_dir):
        """GPT-style concat-and-chop sequence packing (ops/scan.py):
        per-doc placement in the 2048-token packed stream via a
        two-phase distributed prefix scan — per-block totals to the
        driver, broadcast bases, in-block vectorized cumsum. Oracle is
        the equivalent window SUM."""
        from ocr_service_ray.ops.scan import pack_sequences

        return pack_sequences(
            _read(sf_dir, "documents", ["doc_id", "text"]), max_tokens=2048
        )

    def q_inverted_search(sf_dir):
        """Boolean AND retrieval through a term-bucket-partitioned
        inverted index (ops/invindex.py): one build pass writes hive
        postings; each term lookup reads exactly 1/64 of the
        partitions (the IVF pruning pattern applied to text). Oracle
        recomputes the AND from the raw text."""
        import tempfile

        from ocr_service_ray.ops.invindex import InvertedIndex

        idx = InvertedIndex(num_buckets=64).build(
            _read(sf_dir, "documents", ["doc_id", "text"]),
            tempfile.mkdtemp(prefix="inv_q_"),
        )
        import pandas as pd

        ids = idx.search_and(["join", "hash", "vector"])
        return pd.DataFrame({"doc_id": pd.array(ids, dtype="int64")})

    def q_kmeans_clusters(sf_dir):
        """Distributed k-means over the embeddings table
        (ops/kmeans.py): broadcast centroids, one assign+partial-sum
        pass per round, micro-int sums → byte-identical centroids
        under any block layout (tested vs a single-process numpy
        reference). Iterative — not SQL-expressible, so rows-only at
        the driver; the pytest reference check is the exactness
        evidence. Returns per-cluster member counts."""
        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.kmeans import assign_clusters, kmeans

        # materialized: the loop re-consumes the input every round, and
        # at this table size object-store reuse beats re-reading parquet
        # (at 100 TB the per-round re-scan is the right call — don't
        # materialize there; kmeans() leaves that choice to the caller)
        ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).materialize()
        cents, _ = kmeans(ds, k=8, max_iters=10, merge="driver")
        assigned = assign_clusters(ds, cents)
        return grouped_agg(
            assigned, ["cluster"], {"n_vectors": (None, "count")}
        ).map_batches(
            lambda b: b.assign(n_vectors=b["n_vectors"].astype("int64")),
            batch_format="pandas",
        )

    def q_distinct_users_per_type(sf_dir):
        """Exact COUNT(DISTINCT user_id) per event_type
        (ops/agg.grouped_distinct_count): two combiner aggregates —
        block-local (type, user) dedup before the shuffle, then a row
        count per type. The exact counterpart of hll_users."""
        from ocr_service_ray.ops.agg import grouped_distinct_count

        out = grouped_distinct_count(
            _read(sf_dir, "events", ["event_type", "user_id"]),
            ["event_type"],
            "user_id",
        )
        return out.map_batches(
            lambda b: b.assign(n_distinct=b["n_distinct"].astype("int64")),
            batch_format="pandas",
        )

    def q_label_centroid_sums(sf_dir):
        """Per-label embedding centroid sums (ops/vector.py): each
        block collapses to |labels|×dim exploded partials (vectorized
        np.add.at), one grouped_agg merges — vectors never shuffle.
        Micro-int elements make the sums association-order-exact on
        both engines."""
        from ocr_service_ray.ops.vector import grouped_vector_sum

        out = grouped_vector_sum(
            _read(sf_dir, "embeddings", ["label", "embedding"]), "label"
        )

        def project(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "label": pc.cast(b["label"], pa.int64()),
                    "dim": b["dim"],
                    "vsum": b["vsum"],
                    "n": b["n"],
                }
            )

        return out.map_batches(project, batch_format="pyarrow")

    def q_event_value_quantiles(sf_dir):
        """Exact per-group discrete quantiles (ops/sketch.py
        grouped_quantiles) of event value in cents: (group, value)
        count combiner → per-group fold over value-count rows — raw
        rows never shuffle. Rank arithmetic mirrors DuckDB
        quantile_disc."""
        from ocr_service_ray.ops.sketch import grouped_quantiles

        ds = _read(sf_dir, "events", ["event_type", "value"])

        def to_cents(b: pa.Table) -> pa.Table:
            cents = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {"event_type": b["event_type"], "cents": pa.array(cents)}
            )

        out = grouped_quantiles(
            ds.map_batches(to_cents, batch_format="pyarrow"),
            ["event_type"],
            "cents",
            [0.5, 0.9, 0.99],
        )

        def project(b: pd.DataFrame) -> pd.DataFrame:
            b["q_pct"] = b["q_pct"].astype("int64")
            b["value"] = b["value"].astype("int64")
            return b

        return out.map_batches(project, batch_format="pandas")

    def q_grouped_topk_events(sf_dir):
        """Top-3 events per event_type by value (ops/relational.py
        grouped_topk): block-local per-group top-k combiner + one
        coarse-bucket shuffle — the windowed ROW_NUMBER()<=k shape
        without a global sort."""
        from ocr_service_ray.ops.relational import grouped_topk

        out = grouped_topk(
            _read(sf_dir, "events", ["event_type", "event_id", "value"]),
            ["event_type"],
            ["value", "event_id"],
            3,
            [True, False],
        )

        def micro(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "event_type": b["event_type"],
                    "event_id": b["event_id"],
                    "value_micro": pa.array(
                        _micro(b["value"].to_numpy(zero_copy_only=False))
                    ),
                }
            )

        return out.map_batches(micro, batch_format="pyarrow")

    def q_running_user_value(sf_dir):
        """Per-user running total (ops/relational.py cumulative_by_key)
        of event value in CENTS ordered by (ts, event_id) — integer
        summation so the running total is association-order-free and
        matches SQL's window SUM exactly."""
        from ocr_service_ray.ops.relational import cumulative_by_key

        ds = _read(sf_dir, "events", ["user_id", "event_id", "ts", "value"])

        def to_cents(b: pa.Table) -> pa.Table:
            cents = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "user_id": b["user_id"],
                    "event_id": b["event_id"],
                    "ts": b["ts"],
                    "cents": pa.array(cents),
                }
            )

        folded = cumulative_by_key(
            ds.map_batches(to_cents, batch_format="pyarrow"),
            "user_id",
            ["ts", "event_id"],
            "cents",
            out_col="running_cents",
        )

        def project(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "user_id": b["user_id"],
                    "event_id": b["event_id"],
                    "running_cents": pc.cast(b["running_cents"], pa.int64()),
                }
            )

        return folded.map_batches(project, batch_format="pyarrow")

    def q_decontam_pairs(sf_dir):
        """Train/eval decontamination (ops/decontam.py): eval =
        doc_id % 20 == 0 benchmark slice; 8-gram overlap pairs via the
        SHUFFLE strategy (gram-keyed hash join — the giant-eval path;
        tests assert broadcast == shuffle). Oracle rebuilds the split
        and the distinct-gram join in SQL."""
        from ocr_service_ray.ops.decontam import contamination_pairs

        docs = _read(sf_dir, "documents", ["doc_id", "text"])

        def is_eval(b: pa.Table, want: bool) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            m = (ids % 20 == 0) if want else (ids % 20 != 0)
            return b.filter(pa.array(m))

        train = docs.map_batches(
            lambda b: is_eval(b, False), batch_format="pyarrow"
        )
        ev = docs.map_batches(lambda b: is_eval(b, True), batch_format="pyarrow")
        return contamination_pairs(train, ev, n=8, strategy="shuffle")

    def q_decontam_pairs_bloom(sf_dir):
        """Same decontamination contract through the BLOOM tier: the
        eval gram set folded into broadcast bits prefilters the train
        gram rows before the exact join (false positives die in the
        join), so the exchange shrinks by the clean fraction. Same
        oracle as decontam_pairs — the strategies are value-identical
        by construction."""
        from ocr_service_ray.ops.decontam import contamination_pairs

        docs = _read(sf_dir, "documents", ["doc_id", "text"])

        def is_eval(b: pa.Table, want: bool) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False)
            m = (ids % 20 == 0) if want else (ids % 20 != 0)
            return b.filter(pa.array(m))

        train = docs.map_batches(
            lambda b: is_eval(b, False), batch_format="pyarrow"
        )
        ev = docs.map_batches(lambda b: is_eval(b, True), batch_format="pyarrow")
        return contamination_pairs(train, ev, n=8, strategy="bloom")

    def q_global_ranks(sf_dir):
        """L45 global dense rank: every document's 0-based position in
        (n_chars, doc_id) order — Ray's distributed sort (the one
        all-to-all) + the two-phase block-offset scan
        (ops/scan.global_rank); only |blocks| metadata rows reach the
        driver."""
        from ocr_service_ray.ops.scan import global_rank

        return global_rank(
            _read(sf_dir, "documents", ["doc_id", "n_chars"]),
            ["n_chars", "doc_id"],
        )

    def q_heavy_tokens(sf_dir):
        """L46 bounded-memory heavy hitters (Misra–Gries + exact
        verify, ops/heavy.py): top-20 corpus tokens with EXACT counts;
        every sketch intermediate is ≤ capacity rows. Oracle is the
        plain exact GROUP BY — valid because the verify pass makes the
        reported counts exact and the corpus is Zipf-shaped enough for
        the capacity bar (asserted in tests)."""
        from ocr_service_ray.ops.heavy import heavy_hitters

        return heavy_hitters(
            _read(sf_dir, "documents", ["doc_id", "text"]),
            None,
            k=20,
            capacity=4096,
            explode_tokens=True,
        )

    def q_tfidf_topk(sf_dir):
        """Top-3 characteristic terms per document by tf·idf
        (ops/ranking.py) — df via combiner aggregate, idf broadcast,
        rank in-kernel on a second scan. idf is the rational BM25 odds
        ratio (no log), so every float is IEEE-exact on both engines
        and the micro-int score hash-matches."""
        from ocr_service_ray.ops.ranking import tfidf_topk_terms

        out = tfidf_topk_terms(
            _read(sf_dir, "documents", ["doc_id", "text"]), k=3
        )

        def micro(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": b["doc_id"],
                    "term": b["term"],
                    "tf": b["tf"],
                    "score_micro": pa.array(
                        _micro(b["score"].to_numpy(zero_copy_only=False))
                    ),
                }
            )

        return out.map_batches(micro, batch_format="pyarrow")

    def q_tfidf_topk_shuffle(sf_dir):
        """Same tf·idf top-3 via strategy="shuffle" — the df table is
        hash-joined on term instead of broadcast (the 100 TB
        vocabulary path). Same oracle SQL as tfidf_topk: the two
        strategies are value-identical by contract."""
        from ocr_service_ray.ops.ranking import tfidf_topk_terms

        out = tfidf_topk_terms(
            _read(sf_dir, "documents", ["doc_id", "text"]),
            k=3,
            strategy="shuffle",
        )

        def micro(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": b["doc_id"],
                    "term": b["term"],
                    "tf": pc.cast(b["tf"], pa.int64()),
                    "score_micro": pa.array(
                        _micro(b["score"].to_numpy(zero_copy_only=False))
                    ),
                }
            )

        return out.map_batches(micro, batch_format="pyarrow")

    def q_bm25_docs(sf_dir):
        """BM25 top-10 documents for a 3-term query (ops/ranking.py):
        one text scan → int (dl, tf) table, global stats, scored
        combiner top-k. Left-assoc term fold + rational idf keep the
        floats bit-identical to the SQL oracle."""
        from ocr_service_ray.ops.ranking import bm25_search

        out = bm25_search(
            _read(sf_dir, "documents", ["doc_id", "text"]),
            ["join", "hash", "vector"],
            k=10,
        )

        def micro(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": b["doc_id"],
                    "score_micro": pa.array(
                        _micro(b["score"].to_numpy(zero_copy_only=False))
                    ),
                }
            )

        return out.map_batches(micro, batch_format="pyarrow")

    def q_hll_users(sf_dir):
        """HyperLogLog register table (p=10) for distinct event users
        (ops/sketch.py) — combiner-merged byte registers; the md5-based
        hash makes every register value SQL-reproducible, so the whole
        sketch state (not just the estimate) is oracle-checked."""
        from ocr_service_ray.ops.sketch import hll_registers

        return hll_registers(_read(sf_dir, "events", ["user_id"]), "user_id", p=10)

    def q_dedup_clusters(sf_dir):
        """Connected components over the verified minhash near-dup
        pair set (ops/graph.py): cluster_id = min doc_id of each
        component — the pairs→clusters→canonical-survivor step of
        corpus dedup. The oracle recomputes the labels with a
        recursive CTE over the same from-scratch SQL pair set."""
        from ocr_service_ray.ops.graph import connected_components

        pairs = dedup.minhash_lsh_candidates(
            _read(sf_dir, "documents", ["doc_id", "text"]), threshold=0.4
        )
        comps = connected_components(pairs)

        def rename(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": pc.cast(b["node"], pa.int64()),
                    "cluster_id": pc.cast(b["cluster_id"], pa.int64()),
                }
            )

        return comps.map_batches(rename, batch_format="pyarrow")

    def q_simhash_dedup(sf_dir):
        return dedup.simhash_candidates(
            _read(sf_dir, "documents", ["doc_id", "text"]), max_hamming=8
        )

    def q_ivf_knn(sf_dir):
        """IVF-partitioned ANN: probe reads only nprobe/nlist cell
        directories. nprobe=6/8 verified to reach recall 1 on this
        corpus family, which is what lets the brute-force SQL oracle
        check the result exactly."""
        q = _query_vec(sf_dir)
        idx = similarity.IvfIndex(nlist=8, nprobe=6).build(
            _read(sf_dir, "embeddings"), sample_size=512
        )
        found = idx.search(q, k=5)

        def micro(b: pa.Table) -> pa.Table:
            m = _micro(b["cos_sim"].to_numpy(zero_copy_only=False))
            return pa.table({"vec_id": b["vec_id"], "cos_sim_micro": pa.array(m)})

        return found.map_batches(micro, batch_format="pyarrow")

    def q_lsh_knn(sf_dir):
        """Hyperplane-LSH bucketed ANN (radius-1 multi-probe over 16
        sign-bit cells): assignment, probe set and rerank are pure
        arithmetic, so the oracle reproduces the exact same restricted
        search in SQL — green independent of recall."""
        q = _query_vec(sf_dir)
        idx = similarity.LshIndex(nbits=4, radius=1).build(
            _read(sf_dir, "embeddings"), dim=len(q)
        )
        found = idx.search(q, k=5)

        def micro(b: pa.Table) -> pa.Table:
            m = _micro(b["cos_sim"].to_numpy(zero_copy_only=False))
            return pa.table({"vec_id": b["vec_id"], "cos_sim_micro": pa.array(m)})

        return found.map_batches(micro, batch_format="pyarrow")

    def q_multimodal_decode(sf_dir):
        """Decode actor stage over the documents-derived media table;
        byte-stat features + md5 digest are re-derived in SQL."""
        from ocr_service_ray.ops.multimodal import decode_pipeline, derive_media_items

        return decode_pipeline(
            derive_media_items(_read(sf_dir, "documents", ["doc_id", "text"]))
        )

    def q_multimodal_routed(sf_dir):
        """Single-pass type-routed multimodal plan (one scan; resize →
        decode / audio windows / frame samples). The oracle re-derives
        the per-type output cardinalities from the payload-length
        formulas."""
        from ocr_service_ray.ops.multimodal import derive_media_items, media_pipeline

        return media_pipeline(
            derive_media_items(_read(sf_dir, "documents", ["doc_id", "text"]))
        )

    def q_sessionize_streaming(sf_dir):
        """Incremental actor-state sessionization over the ts-ordered
        stream (raw-actor last-resort tier; ops/streaming.py). Emits
        one row per SESSION, streamed out of the bucket actors as a
        Dataset (the driver never holds the session rows)."""
        from ocr_service_ray.ops.streaming import sessionize_streaming

        out = sessionize_streaming(
            _read(sf_dir, "events", ["user_id", "ts"]), gap_minutes=30
        )
        return out.map_batches(
            lambda b: pa.table(
                {
                    "user_id": b["user_id"],
                    "start_us": b["session_start"],
                    "end_us": b["session_end"],
                    "n_events": b["n_events"],
                }
            ),
            batch_format="pyarrow",
        )

    def q_feedback_promote(sf_dir):
        """A3 promotion over the deterministic feedback fixture; the
        oracle re-derives the same fixture as a VALUES CTE and applies
        the promotion GROUP BY/HAVING in SQL."""
        import ray.data as rd

        from ocr_service_ray.pipelines.feedback import promote_corrections
        from ocr_service_ray.sources.synth import generate_feedback

        out = promote_corrections(rd.from_arrow(generate_feedback()))

        def micro(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "original": b["original"],
                    "corrected": b["corrected"],
                    "occurrences": pc.cast(b["occurrences"], pa.int64()),
                    "avg_confidence_micro": pa.array(
                        _micro(b["avg_confidence"].to_numpy(zero_copy_only=False))
                    ),
                }
            )

        return out.map_batches(micro, batch_format="pyarrow")

    def q_repetition_rules(sf_dir):
        """L40 Gopher-style repetition quality rules over documents:
        per-doc word/bigram counts, distinct counts, top-word count,
        and the two integer cross-multiplied keep flags. All phases
        combiner aggregates over (doc, gram) COUNT rows — text never
        shuffles (ops/quality_rules.py)."""
        from ocr_service_ray.ops.quality_rules import repetition_stats

        out = repetition_stats(_read(sf_dir, "documents", ["doc_id", "text"]))

        def flags_to_int(b: pa.Table) -> pa.Table:
            cols = {}
            for c in b.column_names:
                cols[c] = (
                    pc.cast(b[c], pa.int64()) if c.startswith("keep_") else b[c]
                )
            return pa.table(cols)

        return out.map_batches(flags_to_int, batch_format="pyarrow")

    def q_redact_props(sf_dir):
        """L41 pattern redaction (PII-scrub shape) over events.props:
        multi-digit runs → <NUM>, then remaining single digits → '#',
        counting matches per rule in application order. Stateless RE2
        map, zero shuffle (ops/quality_rules.py); the oracle replays
        the same two regexp_replace passes."""
        from ocr_service_ray.ops.quality_rules import redact_patterns

        return redact_patterns(
            _read(sf_dir, "events", ["event_id", "props"]),
            "props",
            [("num", "[0-9]{2,}", "<NUM>"), ("digit", "[0-9]", "#")],
            keep_cols=["event_id"],
        )

    def q_length_deciles(sf_dir):
        """L42 global percentile banding: every document's decile
        bucket over n_chars via the value-counts CDF broadcast
        (ops/sketch.percentile_buckets) — integer rank arithmetic,
        SQL-reproducible with a window-sum CDF join."""
        from ocr_service_ray.ops.sketch import percentile_buckets

        return percentile_buckets(
            _read(sf_dir, "documents", ["doc_id", "n_chars"]),
            "n_chars",
            10,
            ["doc_id"],
        )

    def q_quantized_embeddings(sf_dir):
        """L43 scalar int8-range embedding quantization: per-dim
        global (min, max) combiner broadcast once, then a streaming
        vectorized map — float64 +,-,×,÷,floor only, so the oracle
        replays it bit-exactly (ops/vector.quantize_embeddings).
        Exploded (vec_id, dim, q) is the oracle-comparable surface."""
        from ocr_service_ray.ops.vector import quantize_embeddings

        return quantize_embeddings(
            _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        )

    def q_mix_schedule(sf_dir):
        """L44 deterministic weighted source interleave (training data
        mixing): integer stride schedule mix_key = (2·rank+1)·(lcm/w)
        per source, zero RNG, layout-invariant (ops/mix.py). Sources
        outside the weight map drop out of the mix."""
        from ocr_service_ray.ops.mix import interleave_by_weight

        return interleave_by_weight(
            _read(sf_dir, "documents", ["doc_id", "source"]),
            {"src0": 5, "src1": 3, "src2": 2, "src3": 1},
            source_col="source",
            order_col="doc_id",
        )

    def q_curate_corpus(sf_dir):
        """The END-TO-END curation pipeline (pipelines/curate.py):
        quality rules → exact dedup → MinHash near-dedup clusters →
        decontamination vs the doc_id%20==0 eval slice → weighted mix
        schedule, verified against ONE composite SQL statement built
        from the per-stage oracle fragments. counts=False: the oracle
        run needs no per-stage counts (each would re-execute its
        stage)."""
        from ocr_service_ray.pipelines.curate import curate_corpus

        docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])

        def split(want_eval: bool):
            def f(b: pa.Table) -> pa.Table:
                ids = b["doc_id"].to_numpy(zero_copy_only=False)
                m = (ids % 20 == 0) if want_eval else (ids % 20 != 0)
                return b.filter(pa.array(m))

            return docs.map_batches(f, batch_format="pyarrow")

        out, _ = curate_corpus(
            split(False),
            split(True),
            mix_weights={"src0": 5, "src1": 3, "src2": 2, "src3": 1},
            near_dup_threshold=0.4,
            decontam_ngram=8,
            counts=False,
        )
        return out.select_columns(["doc_id", "source", "rank", "mix_key"])

    def q_event_interarrival(sf_dir):
        """Per-user inter-arrival deltas (ops/window.py
        grouped_lag_delta) — the LAG window shape as one bucketed key
        shuffle + in-group vectorized diff; integer µs, NULL first
        row per user, exactly SQL lag semantics."""
        from ocr_service_ray.ops.window import grouped_lag_delta

        ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
        out = grouped_lag_delta(ev, "user_id", ["ts", "event_id"], "ts")

        def sentinel(b: pa.Table) -> pa.Table:
            # the gate's value-hash comparator wants NULL-free ints;
            # the operator's NULL-first-row semantics are pytest-pinned
            return pa.table(
                {
                    "event_id": b["event_id"],
                    "user_id": b["user_id"],
                    "delta_us": pc.fill_null(
                        pc.cast(b["delta_us"], pa.int64()), -1
                    ),
                }
            )

        return out.map_batches(sentinel, batch_format="pyarrow")

    def q_moving_sum_user_value(sf_dir):
        """Per-user trailing-3-row sum of value CENTS ordered by
        (ts, event_id) (ops/window.py grouped_moving_sum) — the ROWS
        BETWEEN 2 PRECEDING frame; integer summation so the rolling
        total is association-order-free."""
        from ocr_service_ray.ops.window import grouped_moving_sum

        ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

        def to_cents(b: pa.Table) -> pa.Table:
            c = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "event_id": b["event_id"],
                    "user_id": b["user_id"],
                    "ts": b["ts"],
                    "cents": pa.array(c),
                }
            )

        out = grouped_moving_sum(
            ev.map_batches(to_cents, batch_format="pyarrow"),
            "user_id",
            ["ts", "event_id"],
            "cents",
            3,
            out_col="win3_cents",
        )
        return out.select_columns(["event_id", "user_id", "win3_cents"])

    def q_rollup_order_totals(sf_dir):
        """CUBE(o_orderpriority, o_orderstatus) count + price-cents sum
        from ONE source scan (ops/agg.py rollup_agg): finest-level
        combiner aggregate once, coarser grouping sets re-aggregated
        from the |groups|-bounded partial table; grouping_id matches
        DuckDB GROUPING()."""
        from ocr_service_ray.ops.agg import rollup_agg

        od = _read(
            sf_dir, "orders", ["o_orderpriority", "o_orderstatus", "o_totalprice"]
        )

        def cents(b: pa.Table) -> pa.Table:
            c = np.floor(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "o_orderpriority": b["o_orderpriority"],
                    "o_orderstatus": b["o_orderstatus"],
                    "cents": pa.array(c),
                }
            )

        return rollup_agg(
            od.map_batches(cents, batch_format="pyarrow"),
            ["o_orderpriority", "o_orderstatus"],
            {"n_orders": (None, "count"), "sum_price_cents": ("cents", "sum")},
        )

    def q_pivot_user_events(sf_dir):
        """Per-user event counts pivoted by event_type (ops/agg.py
        pivot_counts) — conditional aggregation in one scan: vectorized
        0/1 indicator columns feed a single combiner sum, the COUNT(*)
        FILTER shape."""
        from ocr_service_ray.ops.agg import pivot_counts

        ev = _read(sf_dir, "events", ["user_id", "event_type"])
        return pivot_counts(
            ev, "user_id", "event_type", ["click", "error", "purchase", "signup", "view"]
        )

    def q_paragraph_dedup(sf_dir):
        """RefinedWeb-style paragraph-level exact dedup (ops/dedup.py
        paragraph_dedup): paragraph breaks derived deterministically
        (every ' table ' token becomes a newline — the synthetic docs
        have no newlines of their own), then every paragraph keeps only
        its globally FIRST (doc_id, pos) occurrence and documents
        reassemble in order; fully-duplicated documents drop out."""
        from ocr_service_ray.ops.dedup import paragraph_dedup

        docs = _read(sf_dir, "documents", ["doc_id", "text"])

        def breaks(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": b["doc_id"],
                    "text": pc.replace_substring(b["text"], " table ", "\n"),
                }
            )

        return paragraph_dedup(docs.map_batches(breaks, batch_format="pyarrow"))

    def q_per_source_cap(sf_dir):
        """Per-source document quota (corpus curation's per-domain cap,
        ops/relational.py grouped_topk with ascending doc_id): keep the
        first 50 documents of every source — block-local per-group
        head(k) combiner, one coarse-bucket shuffle, never a global
        sort."""
        from ocr_service_ray.ops.relational import grouped_topk

        docs = _read(sf_dir, "documents", ["doc_id", "source"])
        return grouped_topk(docs, ["source"], ["doc_id"], 50, [False])

    def q_range_sum_user_value(sf_dir):
        """Per-user trailing 1-HOUR time-RANGE sum of value cents
        (ops/window.py grouped_range_sum) — the RANGE BETWEEN INTERVAL
        frame: prefix-sum + searchsorted per user, equal-timestamp
        peers included per SQL frame semantics."""
        from ocr_service_ray.ops.window import grouped_range_sum

        ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

        def to_cents(b: pa.Table) -> pa.Table:
            c = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "event_id": b["event_id"],
                    "user_id": b["user_id"],
                    "ts": b["ts"],
                    "cents": pa.array(c),
                }
            )

        out = grouped_range_sum(
            ev.map_batches(to_cents, batch_format="pyarrow"),
            "user_id",
            "ts",
            "cents",
            3_600_000_000,
            out_col="hour_cents",
        )
        return out.select_columns(["event_id", "user_id", "hour_cents"])

    def q_contamination_ratio(sf_dir):
        """Per-train-doc contamination fraction vs the doc_id%20==0
        eval slice (ops/decontam.py contamination_ratio): distinct
        8-grams shared with ANY eval doc over the doc's distinct
        8-grams, as an exact integer-division micro ratio."""
        from ocr_service_ray.ops.decontam import contamination_ratio

        docs = _read(sf_dir, "documents", ["doc_id", "text"])

        def split(want_eval: bool):
            def f(b: pa.Table) -> pa.Table:
                ids = b["doc_id"].to_numpy(zero_copy_only=False)
                m = (ids % 20 == 0) if want_eval else (ids % 20 != 0)
                return b.filter(pa.array(m))

            return docs.map_batches(f, batch_format="pyarrow")

        return contamination_ratio(split(False), split(True), n=8)

    def q_temperature_mix(sf_dir):
        """Temperature-rebalanced (alpha=0.5) per-source document
        sampling (ops/mix.py temperature_sample): keep floor(sqrt(n))
        docs per source via deterministic integer systematic ticks —
        zero RNG, SQL-reproducible."""
        from ocr_service_ray.ops.mix import temperature_sample

        docs = _read(sf_dir, "documents", ["doc_id", "source"])
        return temperature_sample(docs, "source", "doc_id")

    def _nation_sides(sf_dir):
        cust = _read(sf_dir, "customer", ["c_nationkey"]).map_batches(
            lambda b: pa.table({"nationkey": b["c_nationkey"]}),
            batch_format="pyarrow",
        )
        supp = _read(sf_dir, "supplier", ["s_nationkey"]).map_batches(
            lambda b: pa.table({"nationkey": b["s_nationkey"]}),
            batch_format="pyarrow",
        )
        return cust, supp

    def q_nations_intersect(sf_dir):
        """SQL INTERSECT (ops/relational.py set_op): nations having
        BOTH customers and suppliers — one combiner exchange merging
        per-side presence flags over distinct keys."""
        from ocr_service_ray.ops.relational import set_op

        cust, supp = _nation_sides(sf_dir)
        return set_op(cust, supp, ["nationkey"], "intersect")

    def q_nations_except(sf_dir):
        """SQL EXCEPT (ops/relational.py set_op): nations having
        customers but none of the first ten suppliers — same single
        exchange, opposite flag filter (the supplier side is capped so
        the difference is non-empty at every sf: an empty Dataset
        loses its schema through the gate's to_pandas)."""
        from ocr_service_ray.ops.relational import set_op

        cust = _nation_sides(sf_dir)[0]
        supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
            lambda b: pa.table(
                {"nationkey": b.filter(pc.less_equal(b["s_suppkey"], 10))["s_nationkey"]}
            ),
            batch_format="pyarrow",
        )
        return set_op(cust, supp, ["nationkey"], "except")

    def q_nations_union(sf_dir):
        """SQL UNION DISTINCT (ops/relational.py set_op): every nation
        with a customer OR a supplier, deduplicated — the same single
        presence-flag exchange, no filter."""
        from ocr_service_ray.ops.relational import set_op

        cust, supp = _nation_sides(sf_dir)
        return set_op(cust, supp, ["nationkey"], "union")

    def q_dense_rank_user_value(sf_dir):
        """Per-user DENSE_RANK over value cents (ops/window.py
        grouped_dense_rank): equal cents share a gapless rank — one
        bucketed key shuffle + vectorized boundary cumsum."""
        from ocr_service_ray.ops.window import grouped_dense_rank

        ev = _read(sf_dir, "events", ["event_id", "user_id", "value"])

        def to_cents(b: pa.Table) -> pa.Table:
            c = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "event_id": b["event_id"],
                    "user_id": b["user_id"],
                    "cents": pa.array(c),
                }
            )

        out = grouped_dense_rank(
            ev.map_batches(to_cents, batch_format="pyarrow"),
            "user_id",
            ["cents"],
        )
        return out.select_columns(["event_id", "user_id", "dense_rank"])

    def q_decontam_best_match(sf_dir):
        """Composition: for every eval doc its MOST-contaminating train
        doc — contamination_pairs (gram-keyed shuffle strategy) fed
        into grouped_topk k=1 (block-local per-group argmax combiner).
        Ties break to the smallest train_id."""
        from ocr_service_ray.ops.decontam import contamination_pairs
        from ocr_service_ray.ops.relational import grouped_topk

        docs = _read(sf_dir, "documents", ["doc_id", "text"])

        def split(want_eval: bool):
            def f(b: pa.Table) -> pa.Table:
                ids = b["doc_id"].to_numpy(zero_copy_only=False)
                m = (ids % 20 == 0) if want_eval else (ids % 20 != 0)
                return b.filter(pa.array(m))

            return docs.map_batches(f, batch_format="pyarrow")

        pairs = contamination_pairs(
            split(False), split(True), n=8, strategy="shuffle"
        )
        return grouped_topk(
            pairs, ["eval_id"], ["shared_grams", "train_id"], 1, [True, False]
        )

    def q_prune_corpus(sf_dir):
        """The corpus-PRUNING pipeline (pipelines/curate.py
        prune_corpus): paragraph dedup → source re-attach → per-source
        cap (50) → temperature sampling, verified against ONE composite
        SQL statement chaining the per-stage oracle fragments.
        counts=False: the oracle run needs no per-stage counts."""
        from ocr_service_ray.pipelines.curate import prune_corpus

        docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])

        def breaks(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_id": b["doc_id"],
                    "source": b["source"],
                    "text": pc.replace_substring(b["text"], " table ", "\n"),
                }
            )

        out, _ = prune_corpus(
            docs.map_batches(breaks, batch_format="pyarrow"),
            cap_per_source=50,
            counts=False,
        )
        return out.select_columns(["doc_id", "source", "n_kept"])

    def q_funnel_stages(sf_dir):
        """view → click → purchase conversion funnel (ops/funnel.py):
        first-touch strictly-after matching per user over one bucketed
        key shuffle; the driver sees |stages| integers."""
        from ocr_service_ray.ops.funnel import funnel_stages

        ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
        return funnel_stages(ev, ["view", "click", "purchase"])

    def _events_roundtrip(sf_dir, fmt: str):
        """Write the int/string projection of events once to /tmp in
        ``fmt`` (csv | json lines), read it back with the native Ray
        reader, and aggregate — ingest-parity proof for non-parquet
        sources (floats/timestamps excluded: text round-trips of those
        are representation-dependent by nature)."""
        import os

        import ray.data as rd

        from ocr_service_ray.ops.agg import grouped_agg

        src = _read(sf_dir, "events", ["event_id", "user_id", "event_type"])
        tag = os.path.basename(os.path.normpath(sf_dir))
        path = f"/tmp/ingest_{fmt}_{tag}"
        done = f"{path}/_SUCCESS"
        if not os.path.exists(done):  # write once per sf, reuse after
            import shutil

            shutil.rmtree(path, ignore_errors=True)
            if fmt == "csv":
                src.write_csv(path)
            else:
                src.write_json(path)
            open(done, "w").close()
        files = [
            f"{path}/{f}"
            for f in sorted(os.listdir(path))
            if not f.startswith("_")
        ]
        back = rd.read_csv(files) if fmt == "csv" else rd.read_json(files)
        return grouped_agg(
            back,
            ["event_type"],
            {"n_events": (None, "count"), "sum_user": ("user_id", "sum")},
        )

    def q_funnel_cohorts(sf_dir):
        """view→click→purchase funnel per first-event month cohort
        (ops/funnel.py funnel_by_cohort): cohort derived in the same
        per-user fold; |cohorts| x |stages| rows, zero rows kept."""
        from ocr_service_ray.ops.funnel import funnel_by_cohort

        ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])
        return funnel_by_cohort(ev, ["view", "click", "purchase"])

    def q_source_pagerank(sf_dir):
        """Integer PageRank (ops/graph.py pagerank_int, 3 rounds) over
        the source-similarity graph — sources linked when they share a
        duplicated 5-gram. All-integer micro ranks make the iterative
        algorithm EXACTLY SQL-reproducible (the oracle unrolls the
        same three rounds as chained CTEs); each round is one hash
        join + one combiner sum, ranks stay distributed."""
        import pandas as pd

        from ocr_service_ray.ops.agg import bucketed_map_groups, grouped_agg
        from ocr_service_ray.ops.decontam import _unique_gram_rows
        from ocr_service_ray.ops.graph import pagerank_int

        docs = _read(sf_dir, "documents", ["source", "text"])
        # (source, gram) distinct — per-doc distinct rows deduped by a
        # combiner agg; then source pairs per gram, deduped across grams
        sg = grouped_agg(
            _unique_gram_rows(docs, 5, "text", "source", "src"),
            ["src", "gram_hash"],
            {"_c": (None, "count")},
        )

        def gram_pairs(g: pd.DataFrame) -> pd.DataFrame:
            s = sorted(g["src"].unique())
            if len(s) < 2:
                return None
            pairs = [(a, b) for i, a in enumerate(s) for b in s[i + 1 :]]
            return pd.DataFrame(pairs, columns=["sa", "sb"])

        pairs = grouped_agg(
            bucketed_map_groups(sg, ["gram_hash"], gram_pairs),
            ["sa", "sb"],
            {"_c": (None, "count")},
        )

        def both_dirs(b: pa.Table) -> pa.Table:
            fwd = pa.table({"src": b["sa"], "dst": b["sb"]})
            rev = pa.table({"src": b["sb"], "dst": b["sa"]})
            return pa.concat_tables([fwd, rev]).combine_chunks()

        edges = pairs.map_batches(both_dirs, batch_format="pyarrow").materialize()
        return pagerank_int(edges, "src", "dst", iters=3)

    def q_csv_ingest(sf_dir):
        """CSV source parity: events → write_csv → read_csv → combiner
        aggregate equals the same aggregate on the parquet table."""
        return _events_roundtrip(sf_dir, "csv")

    def q_jsonl_ingest(sf_dir):
        """JSONL source parity: events → write_json → read_json →
        combiner aggregate equals the parquet-table aggregate."""
        return _events_roundtrip(sf_dir, "json")

    def q_event_transitions(sf_dir):
        """Per-user behavioral transition matrix (ops/window.py
        transition_counts): consecutive (prev, next) event-type pair
        counts — the lag + GROUP BY shape, one bucketed key shuffle
        and a |types|^2-bounded merge."""
        from ocr_service_ray.ops.window import transition_counts

        ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
        return transition_counts(ev, "user_id", ["ts", "event_id"], "event_type")

    def q_banded_doc_sample(sf_dir):
        """Length-band-balanced sampling (ops/sketch.py
        percentile_buckets → ops/relational.py banded_sample): docs
        split into 4 global length quartiles, sampled at 80/40/20/10%
        by md5-uniform — the curation move that flattens a length
        distribution with zero RNG."""
        from ocr_service_ray.ops.relational import banded_sample
        from ocr_service_ray.ops.sketch import percentile_buckets

        docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])
        banded = percentile_buckets(docs, "n_chars", 4, keep_cols=["doc_id"])
        out = banded_sample(
            banded, "bucket", {0: 0.8, 1: 0.4, 2: 0.2, 3: 0.1}, "doc_id"
        )
        return out.select_columns(["doc_id", "n_chars", "bucket"])

    def q_view_purchase_attribution(sf_dir):
        """1-hour view→purchase attribution per user (ops/window.py
        attribution_pairs): the inequality self-join counted via
        per-key sort + searchsorted — pair rows never materialize."""
        from ocr_service_ray.ops.window import attribution_pairs

        ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
        out = attribution_pairs(
            ev, "user_id", "ts", "event_type", "view", "purchase", 3_600_000_000
        )
        return out.select_columns(["event_id", "user_id", "n_attributed"])

    def q_streaming_dedup(sf_dir):
        """Ingest-time exact dedup over the id-ordered log
        (ops/streaming.py streaming_dedup): DedupShardActors own
        disjoint shards of the seen-hash index — the shared-mutable-
        index tier; first occurrence survives in LOG order, enforced
        by sequence-numbered dispatch."""
        from ocr_service_ray.ops.streaming import streaming_dedup

        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        return streaming_dedup(docs)

    def q_fuzzy_part_names(sf_dir):
        """Edit-distance near-dup pairs over distinct part names
        (ops/dedup.py fuzzy_pairs, lev <= 2): distinct combiner →
        length-band blocking → in-bucket Levenshtein verify."""
        from ocr_service_ray.ops.dedup import fuzzy_pairs

        parts = _read(sf_dir, "part", ["p_name"])
        return fuzzy_pairs(parts, "p_name", max_dist=2)

    def q_winsorized_values(sf_dir):
        """P1/P99 winsorization of event value cents (ops/sketch.py
        winsorize): exact discrete-quantile bounds from the
        value-counts combiner, one broadcast clip pass."""
        from ocr_service_ray.ops.sketch import winsorize

        ev = _read(sf_dir, "events", ["event_id", "value"])

        def to_cents(b: pa.Table) -> pa.Table:
            c = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table({"event_id": b["event_id"], "cents": pa.array(c)})

        return winsorize(
            ev.map_batches(to_cents, batch_format="pyarrow"),
            "cents",
            0.01,
            0.99,
            keep_cols=["event_id"],
        )

    def q_normalized_dedup(sf_dir):
        """Normalization-aware exact dedup (ops/text.py normalize_text
        → ops/dedup.py exact_dedup): case/whitespace variants of a
        document hash identically before the md5 group — the CCNet
        normalize-then-hash rule. The synthetic corpus is ASCII so
        utf8_lower == SQL lower byte for byte."""
        from ocr_service_ray.ops.dedup import exact_dedup
        from ocr_service_ray.ops.text import normalize_text

        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        normed = docs.map_batches(
            lambda b: normalize_text(b).drop_columns(["text"]),
            batch_format="pyarrow",
        )
        return exact_dedup(normed, "norm_text", "doc_id")

    def q_zorder_orders(sf_dir):
        """Morton z-order clustering key over (o_custkey, o_orderkey)
        low 16 bits (ops/scan.py zorder_key) — the multi-dimension
        layout key for stat-pruned scans; pure integer bit interleave,
        zero shuffle."""
        from ocr_service_ray.ops.scan import zorder_key

        od = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        return zorder_key(od, ["o_custkey", "o_orderkey"], bits=16)

    def q_hll_users_per_type(sf_dir):
        """Per-event-type HLL register tables (ops/sketch.py
        grouped_hll_registers): the sketch answer to distinct-users-
        per-segment — block-local (group, bucket) max combiner, one
        exchange; the register TABLE itself hash-matches SQL."""
        from ocr_service_ray.ops.sketch import grouped_hll_registers

        ev = _read(sf_dir, "events", ["event_type", "user_id"])
        return grouped_hll_registers(ev, "event_type", "user_id", p=10)

    def q_mad_outlier_events(sf_dir):
        """Median/MAD robust outliers over value cents (ops/agg.py
        mad_outliers, |x - median| > 3 * MAD): both medians from ONE
        value-counts combiner pass, integer rule, broadcast filter."""
        from ocr_service_ray.ops.agg import mad_outliers

        ev = _read(sf_dir, "events", ["event_id", "value"])

        def to_cents(b: pa.Table) -> pa.Table:
            c = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table({"event_id": b["event_id"], "cents": pa.array(c)})

        return mad_outliers(
            ev.map_batches(to_cents, batch_format="pyarrow"),
            "cents",
            ["event_id"],
            k_num=3,
            k_den=1,
        )

    def q_part_triangles(sf_dir):
        """Exact triangle count over the part co-occurrence graph
        (ops/triangles.py triangle_count): parts linked when they
        share an order — a sparse ~120-avg-degree graph (the supplier
        version degenerates to a near-complete K_|S| and is the
        wrong shape for a triangle demo). Degree-oriented wedge join:
        out-degree is O(sqrt(m)) under the orientation, so the pair
        explosion is bounded regardless of hub skew; the closure
        check is a presence-tagged union + one combiner agg, never a
        materialized join. Edge generation is bounded by
        lines-per-order (TPC-H <= 7)."""
        from ocr_service_ray.ops.triangles import triangle_count

        return triangle_count(_part_edges(sf_dir))

    def q_chunk_documents(sf_dir):
        """Fixed-size token-window chunking with stride overlap
        (ops/chunking.py chunk_tokens, 16-token windows advancing by
        12): the LLM-pretraining row explosion — a pure flat-map,
        zero shuffle, byte-exact chunk text vs the SQL list-slice
        oracle."""
        from ocr_service_ray.ops.chunking import chunk_tokens

        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        return chunk_tokens(docs, chunk_size=16, stride=12)

    def q_retention_daily(sf_dir):
        """Daily cohort retention matrix (ops/retention.py
        cohort_retention): users cohorted by first-event day; cell
        (cohort_period, offset_periods) counts distinct active users.
        One user-keyed shuffle; the second aggregate sees only
        per-user distinct-day rows."""
        from ocr_service_ray.ops.retention import cohort_retention

        ev = _read(sf_dir, "events", ["user_id", "ts"])
        return cohort_retention(ev, period="day")

    def q_distinct_types_running(sf_dir):
        """Per-user running COUNT(DISTINCT event_type) — the window
        shape SQL can't express directly (ops/retention.py
        cumulative_distinct): one user-keyed shuffle, vectorized
        first-occurrence cumsum inside the group."""
        from ocr_service_ray.ops.retention import cumulative_distinct

        ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
        return cumulative_distinct(ev)

    def q_pareto_parts(sf_dir):
        """Pareto frontier / skyline (ops/frontier.py pareto_frontier):
        parts not dominated on (minimize retail price, maximize size).
        Block-local frontier filter, then a frontier-of-frontiers
        reduce bounded by the (small) local frontier union."""
        from ocr_service_ray.ops.frontier import pareto_frontier

        parts = _read(sf_dir, "part", ["p_partkey", "p_size", "p_retailprice"])
        fr = pareto_frontier(parts, "p_retailprice", "p_size")
        fr = fr.copy()
        fr["price_cents"] = np.floor(
            fr["p_retailprice"].to_numpy() * 100.0 + 0.5
        ).astype(np.int64)
        fr["p_size"] = fr["p_size"].astype("int64")
        return fr[["p_partkey", "p_size", "price_cents"]]

    def q_pricing_comoments(sf_dir):
        """Grouped bivariate moment sums (ops/stats.py
        grouped_comoments): the distributed sufficient statistics for
        corr/covar/OLS over (quantity, revenue) per return flag — six
        integer sums per group, one combiner exchange. y is floored
        to whole currency units so sum_yy stays within int64 at
        bench scale (documented caller contract)."""
        from ocr_service_ray.ops.stats import grouped_comoments

        li = _read(
            sf_dir,
            "lineitem",
            ["l_returnflag", "l_quantity", "l_extendedprice", "l_discount"],
        )

        def prep(b: pa.Table) -> pa.Table:
            qty = b["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
            ext = b["l_extendedprice"].to_numpy(zero_copy_only=False)
            disc = b["l_discount"].to_numpy(zero_copy_only=False)
            rev = np.floor(ext * (1.0 - disc) + 0.5).astype(np.int64)
            return pa.table(
                {
                    "l_returnflag": b["l_returnflag"],
                    "x": pa.array(qty),
                    "y": pa.array(rev),
                }
            )

        return grouped_comoments(
            li.map_batches(prep, batch_format="pyarrow"), ["l_returnflag"], "x", "y"
        )

    def q_revenue_by_nation(sf_dir):
        """TPC-H-Q5-shaped multiway star join: lineitem x orders
        (hash join, date-filtered at the read) x customer (hash join,
        segment-filtered) x supplier->nation (broadcast — dimension
        tables ride ray.put, fact rows never re-shuffle for them).
        Demonstrates join-order discipline: filters push into each
        scan, the two large-large joins share the orderkey/custkey
        partitioning, and revenue folds to cents per nation in one
        combiner agg."""
        import datetime as _dt

        import pandas as pd
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import join_partitions_for

        li = _read(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        )
        od = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

        lo = _dt.datetime(1995, 1, 1)
        hi = _dt.datetime(1996, 1, 1)

        def order_filter(b: pa.Table) -> pa.Table:
            keep = pc.and_(
                pc.greater_equal(b["o_orderdate"], pa.scalar(lo)),
                pc.less(b["o_orderdate"], pa.scalar(hi)),
            )
            return b.filter(keep).drop_columns(["o_orderdate"])

        od = od.map_batches(order_filter, batch_format="pyarrow")
        cu = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])

        def cust_filter(b: pa.Table) -> pa.Table:
            return b.filter(pc.equal(b["c_mktsegment"], "BUILDING")).drop_columns(
                ["c_mktsegment"]
            )

        cu = cu.map_batches(cust_filter, batch_format="pyarrow")
        oc = od.join(
            cu,
            join_type="inner",
            num_partitions=join_partitions_for(od, cu),
            on=("o_custkey",),
            right_on=("c_custkey",),
        )
        lio = li.join(
            oc,
            join_type="inner",
            num_partitions=join_partitions_for(li, oc),
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )

        # supplier -> nation name: small-side broadcast (dimension join)
        sup = pq.read_table(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        ).to_pandas()
        nat = pq.read_table(
            f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
        ).to_pandas()
        s2n = dict(
            zip(
                sup["s_suppkey"],
                sup["s_nationkey"].map(
                    dict(zip(nat["n_nationkey"], nat["n_name"]))
                ),
            )
        )

        def to_nation_cents(b: pd.DataFrame) -> pd.DataFrame:
            rev = np.floor(
                b["l_extendedprice"].to_numpy()
                * (1.0 - b["l_discount"].to_numpy())
                * 100.0
                + 0.5
            ).astype(np.int64)
            return pd.DataFrame(
                {"n_name": b["l_suppkey"].map(s2n), "rev_cents": rev}
            )

        return grouped_agg(
            lio.map_batches(to_nation_cents, batch_format="pandas"),
            ["n_name"],
            {"revenue_cents": ("rev_cents", "sum"), "n_rows": (None, "count")},
        )

    def q_rolling_wau(sf_dir):
        """Rolling 7-day distinct active users per day — the WAU
        curve (ops/retention.py rolling_distinct): (user, day) pairs
        dedup block-locally, explode x7 to the window cells they
        serve, dedup, count. Every exchange moves integer pairs;
        no per-day rescan."""
        from ocr_service_ray.ops.retention import rolling_distinct

        ev = _read(sf_dir, "events", ["user_id", "ts"])
        return rolling_distinct(ev, window=7, period="day")

    def q_hourly_type_grid(sf_dir):
        """Zero-filled (event_type, hour) count grid (ops/grid.py
        dense_grid_counts): observed counts from one combiner agg;
        the |types| x |hours| grid generated driver-side
        (vocabulary x calendar bounded) and left-merged."""
        from ocr_service_ray.ops.grid import dense_grid_counts

        ev = _read(sf_dir, "events", ["event_type", "ts"])
        return dense_grid_counts(ev, "event_type", freq="hour")

    def q_events_checksum(sf_dir):
        """Order-invariant table checksum (ops/diff.py
        table_checksum): sum of row md5-prefix ints mod a 2^63
        prime — the resumable-run verification primitive (same rows
        => same checksum under ANY partitioning / shuffle layout)."""
        from ocr_service_ray.ops.diff import table_checksum

        ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type"])
        return table_checksum(ev, ["event_id", "user_id", "event_type"])

    def q_incremental_event_totals(sf_dir):
        """Incremental aggregation (ops/agg.py merge_agg_states): the
        first half-month's persisted agg state merged with the second
        half's delta state equals the full recompute — the daily-
        pipeline shape that never rescans history. Oracle is the
        plain full-table GROUP BY."""
        import pyarrow.compute as pc

        from ocr_service_ray.ops.agg import grouped_agg, merge_agg_states

        ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

        def prep(b: pa.Table) -> pa.Table:
            micro = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 1_000_000.0 + 0.5
            ).astype(np.int64)
            day = pc.day(b["ts"])
            return pa.table(
                {
                    "event_type": b["event_type"],
                    "micro": pa.array(micro),
                    "day": day,
                }
            )

        prepped = ev.map_batches(prep, batch_format="pyarrow")
        specs = {
            "n": (None, "count"),
            "total_micro": ("micro", "sum"),
            "lo_micro": ("micro", "min"),
            "hi_micro": ("micro", "max"),
        }

        def split(le: bool):
            def f(b: pa.Table) -> pa.Table:
                mask = (
                    pc.less_equal(b["day"], 15) if le else pc.greater(b["day"], 15)
                )
                return b.filter(mask).drop_columns(["day"])

            return f

        old_state = grouped_agg(
            prepped.map_batches(split(True), batch_format="pyarrow"),
            ["event_type"],
            specs,
        )
        delta_state = grouped_agg(
            prepped.map_batches(split(False), batch_format="pyarrow"),
            ["event_type"],
            specs,
        )
        return merge_agg_states([old_state, delta_state], ["event_type"], specs)

    def q_session_overlaps(sf_dir):
        """Banded interval overlap join (ops/intervals.py): even-user
        sessions vs odd-user sessions — which users' activity windows
        collide. Intervals explode to 2-hour cells, the join is
        cell-local, the canonical-cell rule dedups multi-cell pairs
        with no extra exchange; pair rows fold straight into a
        per-user combiner count."""
        import pyarrow.compute as pc

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.intervals import (
            interval_overlap_join,
            session_intervals,
        )

        ev = _read(sf_dir, "events", ["user_id", "ts"])

        def parity(rem: int):
            def f(b: pa.Table) -> pa.Table:
                keep = pc.equal(
                    pc.bit_wise_and(b["user_id"], pa.scalar(1, pa.int64())), rem
                )
                return b.filter(keep)

            return f

        left = session_intervals(ev.map_batches(parity(0), batch_format="pyarrow"))
        right = session_intervals(ev.map_batches(parity(1), batch_format="pyarrow"))
        pairs = interval_overlap_join(
            left,
            right,
            ["user_id", "session_id"],
            ["user_id", "session_id"],
            band=2 * 3600 * 1_000_000,
        )
        out = grouped_agg(pairs, ["l_user_id"], {"n_overlaps": (None, "count")})

        def rename(b: pa.Table) -> pa.Table:
            return b.rename_columns(
                ["user_id" if c == "l_user_id" else c for c in b.column_names]
            )

        return out.map_batches(rename, batch_format="pyarrow")

    def q_balanced_source_sample(sf_dir):
        """Exactly-20-per-source uniform sample (ops/relational.py
        grouped_sample_k): md5-rank order, block-local top-k
        combiner — balanced without ingest-order bias, zero RNG."""
        from ocr_service_ray.ops.relational import grouped_sample_k

        docs = _read(sf_dir, "documents", ["doc_id", "source"])
        return grouped_sample_k(docs, ["source"], "doc_id", 20).select_columns(
            ["doc_id", "source"]
        )

    def q_span_corruption_pairs(sf_dir):
        """T5-style span-corruption pair generation (ops/chunking.py
        span_corruption, every=7 phase=3): deterministic positional
        masking, byte-exact corrupted/target strings vs the SQL
        indexed-lambda oracle. Pure flat map."""
        from ocr_service_ray.ops.chunking import span_corruption

        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        return span_corruption(docs, every=7, phase=3)

    def q_proportional_docs(sf_dir):
        """Exact-200-document corpus cut with source proportions kept
        (ops/mix.py proportional_sample): Hamilton largest-remainder
        quotas from one combiner count, each quota filled by md5
        rank — the budget-exact training-mix draw."""
        from ocr_service_ray.ops.mix import proportional_sample

        docs = _read(sf_dir, "documents", ["doc_id", "source"])
        return proportional_sample(docs, "source", "doc_id", 200)

    def q_frequent_part_pairs(sf_dir):
        """Frequent co-occurring part pairs (market-basket shape):
        distinct (order, part) combiner → bounded per-order pair
        explode → combiner count → support filter (>=3) → top-25
        combiner rank. Pair explosion bounded by lines-per-order."""
        import pyarrow.compute as pc

        from ocr_service_ray.ops.agg import grouped_agg

        def rename(b: pa.Table) -> pa.Table:
            return b.rename_columns(["part_a", "part_b"])

        counted = grouped_agg(
            _part_edges(sf_dir).map_batches(rename, batch_format="pyarrow"),
            ["part_a", "part_b"],
            {"n_orders": (None, "count")},
        )
        frequent = counted.map_batches(
            lambda b: b.filter(pc.greater_equal(b["n_orders"], 3)),
            batch_format="pyarrow",
        )
        return relational.topk(
            frequent,
            by=["n_orders", "part_a", "part_b"],
            k=25,
            descending=[True, False, False],
        )

    def q_type_share_ppm(sf_dir):
        """Percent-of-total as integer parts-per-million: one combiner
        count per type, the |types|-bounded total folded on the
        driver, shares by exact floor division (no float ratios)."""
        from ocr_service_ray.ops.agg import grouped_agg

        ev = _read(sf_dir, "events", ["event_type"])
        counts = grouped_agg(ev, ["event_type"], {"n": (None, "count")}).to_pandas()
        total = int(counts["n"].sum())
        counts["share_ppm"] = (
            counts["n"].to_numpy(dtype=np.int64) * 1_000_000 // total
        )
        return counts.astype({"n": "int64", "share_ppm": "int64"})

    def q_latest_user_event(sf_dir):
        """CDC / upsert compaction: latest version per key
        (ops/relational.py grouped_topk k=1 by (ts, event_id) desc) —
        the keep-newest snapshot materialization, block-local argmax
        combiner instead of a global sort."""
        from ocr_service_ray.ops.relational import grouped_topk

        ev = _read(sf_dir, "events", ["user_id", "event_id", "ts", "event_type"])
        out = grouped_topk(ev, ["user_id"], ["ts", "event_id"], 1, [True, True])
        return out.select_columns(["user_id", "event_id", "event_type"])

    def _part_edges(sf_dir):
        """Shared part co-occurrence edge derivation (see
        q_part_triangles)."""
        import itertools

        import pandas as pd

        from ocr_service_ray.ops.agg import bucketed_map_groups, grouped_agg

        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
        dist = grouped_agg(li, ["l_orderkey", "l_partkey"], {"_c": (None, "count")})

        def pairs(g: pd.DataFrame):
            s = sorted(g["l_partkey"].unique())
            if len(s) < 2:
                return None
            return pd.DataFrame(
                list(itertools.combinations(s, 2)), columns=["src", "dst"]
            )

        return bucketed_map_groups(dist, ["l_orderkey"], pairs)

    def q_part_degree_histogram(sf_dir):
        """Degree histogram of the part co-occurrence graph
        (ops/kcore.py degree_histogram): the skew diagnostic run
        before any graph workload — two combiner aggregates."""
        from ocr_service_ray.ops.kcore import degree_histogram

        return degree_histogram(_part_edges(sf_dir))

    def q_part_kcore(sf_dir):
        """80-core of the part co-occurrence graph (ops/kcore.py
        kcore_peel, 6 rounds — convergence-probed at this scale,
        fixed rounds keep it SQL-unrollable exactly like
        pagerank_int). Each round: one combiner degree count + two
        node-keyed hash joins; payloads never shuffle."""
        from ocr_service_ray.ops.kcore import kcore_peel

        return kcore_peel(_part_edges(sf_dir), k=80, rounds=6)

    def q_rolling_value_outliers(sf_dir):
        """Per-user rolling 3-sigma anomaly flags over value cents
        (ops/rolling.py rolling_zscore_outliers, prior-10 window):
        the streaming anomaly shape as one bucketed key shuffle +
        vectorized in-group integer rule — no sqrt, no float
        division, bit-exact vs windowed-sum SQL."""
        from ocr_service_ray.ops.rolling import rolling_zscore_outliers

        ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

        def cents(b: pa.Table) -> pa.Table:
            c = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "event_id": b["event_id"],
                    "user_id": b["user_id"],
                    "ts": b["ts"],
                    "cents": pa.array(c),
                }
            )

        return rolling_zscore_outliers(
            ev.map_batches(cents, batch_format="pyarrow"),
            "user_id",
            ["ts", "event_id"],
            "cents",
            "event_id",
            window=10,
            k_num=3,
            k_den=1,
            min_n=3,
        )

    def q_source_vocab_overlap(sf_dir):
        """Pairwise source vocabulary Jaccard (ops/overlap.py
        vocab_overlap_matrix): (source, token) dedup is a combiner
        agg (vocabulary-bounded shuffle), per-token source pairs are
        |sources|-bounded, the matrix is |sources|^2 — integer ppm
        Jaccard, exact."""
        from ocr_service_ray.ops.overlap import vocab_overlap_matrix

        docs = _read(sf_dir, "documents", ["source", "text"])
        return vocab_overlap_matrix(docs)

    def q_diverse_top_docs(sf_dir):
        """Diversity-capped top-k: the 30 longest documents with at
        most 5 per source — per-source block-local top-k combiner,
        then a global top-k combiner. The curation move that stops
        one source from monopolizing a showcase/eval set."""
        from ocr_service_ray.ops.relational import grouped_topk

        docs = _read(sf_dir, "documents", ["doc_id", "source", "n_chars"])
        capped = grouped_topk(
            docs, ["source"], ["n_chars", "doc_id"], 5, [True, False]
        )
        return relational.topk(
            capped, by=["n_chars", "doc_id"], k=30, descending=[True, False]
        )

    def q_multi_knn_batch(sf_dir):
        """Batched multi-query exact kNN (ops/similarity.py
        multi_knn): 8 query vectors broadcast once, ONE corpus scan
        with a per-batch matmul, per-query block-local top-k then a
        combiner grouped top-k — the ANN-serving shape (never one
        scan per query)."""
        import pyarrow.parquet as pq

        from ocr_service_ray.ops import similarity

        qt = pq.read_table(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).filter(pa.compute.less(pa.compute.field("vec_id"), 8))
        queries = similarity._as_matrix(qt.sort_by("vec_id")["embedding"])
        top = similarity.multi_knn(_read(sf_dir, "embeddings"), queries, k=5)

        def micro(b: pa.Table) -> pa.Table:
            m = _micro(b["cos_sim"].to_numpy(zero_copy_only=False))
            return pa.table(
                {
                    "query_id": b["query_id"],
                    "vec_id": b["vec_id"],
                    "cos_sim_micro": pa.array(m),
                }
            )

        return top.map_batches(micro, batch_format="pyarrow")

    def q_hashed_embeddings(sf_dir):
        """Feature-hashing projection to 8 integer components
        (ops/vector.py hash_project_quantized): deterministic ±1 md5
        weights over the int8-quantized embedding — the RNG-free
        signed-random-projection, columns-not-rows expansion, one
        combiner sum per vector."""
        from ocr_service_ray.ops.vector import hash_project_quantized

        return hash_project_quantized(
            _read(sf_dir, "embeddings", ["vec_id", "embedding"]), n_out=8
        )

    def q_keyword_contexts_spark(sf_dir):
        """KWIC concordance for the token 'spark' (ops/chunking.py
        keyword_contexts, ±3 tokens): the corpus-inspection
        primitive, pure flat map."""
        from ocr_service_ray.ops.chunking import keyword_contexts

        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        return keyword_contexts(docs, "spark", n_ctx=3)

    def q_langid_confusion(sf_dir):
        """Language-ID confusion matrix: declared lang x heuristic
        pred_lang counts — the classifier-evaluation cross-tab, one
        stateless scoring map + one combiner agg."""
        from ocr_service_ray.ops.agg import grouped_agg

        docs = _read(sf_dir, "documents", ["doc_id", "lang", "text"])
        scored = docs.map_batches(
            lambda b: text_ops.lang_id(b).drop_columns(["text", "doc_id"]),
            batch_format="pyarrow",
        )
        return grouped_agg(scored, ["lang", "pred_lang"], {"n_docs": (None, "count")})

    def q_value_cume_micro(sf_dir):
        """Per-type CUME_DIST of value cents as exact integer
        millionths (ops/window.py cume_dist_micro): cnt_le * 1e6 // n
        — no float division, bit-exact vs a peers-inclusive running
        count window."""
        from ocr_service_ray.ops.window import cume_dist_micro

        ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

        def cents(b: pa.Table) -> pa.Table:
            c = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "event_id": b["event_id"],
                    "event_type": b["event_type"],
                    "cents": pa.array(c),
                }
            )

        return cume_dist_micro(
            ev.map_batches(cents, batch_format="pyarrow"),
            "event_type",
            "cents",
            "event_id",
        )

    def q_embedding_clusters(sf_dir):
        """Semantic dup-cluster composition: LSH-cell-blocked
        embedding near-dup pairs (L5) fed into connected components
        (L6) — the end-to-end semantic-dedup shape, cluster ids are
        component minima. Oracle replays the pairing + a recursive
        min-label CTE."""
        from ocr_service_ray.ops import dedup
        from ocr_service_ray.ops.graph import connected_components

        planes = np.random.RandomState(13).standard_normal((4, 64))

        def assign(b: pa.Table) -> pa.Table:
            mat = similarity._as_matrix(b["embedding"])
            bits = (mat @ planes.T) > 0.0
            cell = (bits.astype(np.int64) << np.arange(4, dtype=np.int64)).sum(
                axis=1
            )
            return b.append_column("lsh_cell", pa.array(cell, pa.int32()))

        sampled = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
            lambda b: b.filter(
                pa.array(b["vec_id"].to_numpy(zero_copy_only=False) % 5 == 0)
            ),
            batch_format="pyarrow",
        )
        pairs = dedup.embedding_near_dup(
            sampled.map_batches(assign, batch_format="pyarrow"),
            block_col="lsh_cell",
            threshold=0.2,
        ).select_columns(["id_a", "id_b"])
        return connected_components(pairs)

    def q_ann_recall_at_k(sf_dir):
        """ANN quality evaluation: recall@5 of the LSH-restricted
        search vs exact brute force, for 8 queries in ONE scan each
        (ops/similarity.py multi_knn + multi_knn_lsh). Emits integer
        hit counts per query — the eval-harness shape, and both
        searches are SQL-reproducible so even the recall itself is
        oracled."""
        import pandas as pd
        import pyarrow.parquet as pq

        from ocr_service_ray.ops import similarity

        qt = pq.read_table(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        ).filter(pa.compute.less(pa.compute.field("vec_id"), 8))
        queries = similarity._as_matrix(qt.sort_by("vec_id")["embedding"])
        brute = similarity.multi_knn(
            _read(sf_dir, "embeddings"), queries, k=5
        ).to_pandas()
        lsh = similarity.multi_knn_lsh(
            _read(sf_dir, "embeddings"), queries, k=5
        ).to_pandas()
        hits = brute.merge(lsh[["query_id", "vec_id"]], on=["query_id", "vec_id"])
        out = (
            hits.groupby("query_id")["vec_id"]
            .count()
            .reindex(range(len(queries)), fill_value=0)
            .reset_index()
        )
        out.columns = ["query_id", "n_hits"]
        return out.astype("int64")

    def q_partitioned_sink_roundtrip(sf_dir):
        """Partitioned-sink parity (the resumable-output layout the
        north rule requires): documents → write_parquet partitioned
        by lang → read back through the native reader → per-lang
        aggregate equals the direct aggregate."""
        import shutil

        import ray.data as rd

        from ocr_service_ray.ops.agg import grouped_agg

        out_dir = "/tmp/graft_part_sink"
        shutil.rmtree(out_dir, ignore_errors=True)
        docs = _read(sf_dir, "documents", ["doc_id", "lang", "n_chars"])
        docs.write_parquet(out_dir, partition_cols=["lang"])
        back = rd.read_parquet(out_dir)

        def norm(b: pa.Table) -> pa.Table:
            # partition values come back as dictionary-encoded strings
            return pa.table(
                {
                    "lang": b["lang"].cast(pa.string()),
                    "n_chars": b["n_chars"],
                }
            )

        return grouped_agg(
            back.map_batches(norm, batch_format="pyarrow"),
            ["lang"],
            {"n_docs": (None, "count"), "sum_chars": ("n_chars", "sum")},
        )

    def q_pruned_read_orders(sf_dir):
        """Predicate-pushdown read: the 1995 date filter is given to
        read_parquet itself (row-group pruning at the scan, not a
        post-read filter) — the prune-at-the-read discipline as a
        verifiable query."""
        import datetime as _dt

        import pyarrow.compute as pc
        import ray.data as rd

        from ocr_service_ray.ops.agg import grouped_agg

        expr = (pc.field("o_orderdate") >= _dt.datetime(1995, 1, 1)) & (
            pc.field("o_orderdate") < _dt.datetime(1996, 1, 1)
        )
        od = rd.read_parquet(
            f"{sf_dir}/orders.parquet",
            columns=["o_orderpriority", "o_orderdate"],
            filter=expr,
        )
        return grouped_agg(
            od.select_columns(["o_orderpriority"]),
            ["o_orderpriority"],
            {"n_orders": (None, "count")},
        )

    def q_negative_part_samples(sf_dir):
        """Deterministic negative sampling (ops/negatives.py): 5
        not-purchased parts per customer from md5 draws over the part
        vocabulary, positives from the orders x lineitem join — the
        contrastive-training pair generator, zero RNG, rejection loop
        bounded by `tries`."""
        from ocr_service_ray.ops.negatives import negative_sampling
        from ocr_service_ray.ops.relational import hash_join

        od = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])

        def rename(b: pa.Table) -> pa.Table:
            return b.rename_columns(
                ["o_orderkey" if c == "l_orderkey" else c for c in b.column_names]
            )

        pos = hash_join(
            od, li.map_batches(rename, batch_format="pyarrow"), on="o_orderkey"
        ).select_columns(["o_custkey", "l_partkey"])
        return negative_sampling(pos, "o_custkey", "l_partkey", k=5, tries=25)

    def q_constraint_report(sf_dir):
        """Data-contract validation (ops/contracts.py
        validate_constraints): declarative rules fold to one
        (rule, n_violations) report — |rules| integers to the driver,
        value-negativity is a real violation in this data."""
        from ocr_service_ray.ops.contracts import validate_constraints

        ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "value"])
        return validate_constraints(
            ev,
            [
                ("not_null", "user_id"),
                ("non_negative", "value"),
                ("in_set", "event_type", ["view", "click", "purchase", "signup", "error"]),
                ("unique", "event_id"),
            ],
        )

    def q_user_rfm(sf_dir):
        """Per-user RFM features (recency hours vs corpus max ts /
        frequency / monetary cents) — the feature-store shape: one
        combiner agg per user + one broadcast global max, all-integer
        output."""
        from ocr_service_ray.ops.agg import global_agg, grouped_agg

        ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

        def cents(b: pa.Table) -> pa.Table:
            c = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            us = b["ts"].cast(pa.int64())
            return pa.table(
                {"user_id": b["user_id"], "cents": pa.array(c), "ts_us": us}
            )

        prepped = ev.map_batches(cents, batch_format="pyarrow")
        gmax = int(global_agg(prepped, {"m": ("ts_us", "max")})["m"])
        per_user = grouped_agg(
            prepped,
            ["user_id"],
            {
                "frequency": (None, "count"),
                "monetary_cents": ("cents", "sum"),
                "_last": ("ts_us", "max"),
            },
        )

        def recency(b: pa.Table) -> pa.Table:
            last = b["_last"].to_numpy(zero_copy_only=False)
            rec = (gmax - last) // 3_600_000_000
            return pa.table(
                {
                    "user_id": b["user_id"],
                    "frequency": b["frequency"],
                    "monetary_cents": b["monetary_cents"],
                    "recency_hours": pa.array(rec.astype(np.int64)),
                }
            )

        return per_user.map_batches(recency, batch_format="pyarrow")

    def q_bpe_merge_candidates(sf_dir):
        """First-iteration BPE merge candidates: top-20 adjacent
        character pairs inside words — tokenizer-training data prep.
        Block-local Counter partials (the combiner), one
        |pairs|-bounded exchange, combiner top-k."""
        from collections import Counter

        from ocr_service_ray.ops.agg import grouped_agg

        docs = _read(sf_dir, "documents", ["text"])

        def pair_partial(b: pa.Table) -> pa.Table:
            cnt: Counter = Counter()
            for t in b["text"].to_pylist():
                for w in (t or "").split(" "):
                    for i in range(len(w) - 1):
                        cnt[w[i : i + 2]] += 1
            if not cnt:
                return pa.table(
                    {"pair": pa.array([], pa.string()), "n": pa.array([], pa.int64())}
                )
            ks, vs = zip(*cnt.items())
            return pa.table(
                {"pair": pa.array(list(ks)), "n": pa.array(list(vs), pa.int64())}
            )

        counted = grouped_agg(
            docs.map_batches(pair_partial, batch_format="pyarrow"),
            ["pair"],
            {"n": ("n", "sum")},
        )
        return relational.topk(counted, by=["n", "pair"], k=20, descending=[True, False])

    def q_dup_weighting(sf_dir):
        """Duplicate-aware loss weighting: weight_ppm = 1e6 //
        duplicate-cluster size per document — the keep-but-downweight
        alternative to hard dedup. One content-hash key shuffle."""
        import pandas as pd

        from ocr_service_ray.ops.agg import bucketed_map_groups
        from ocr_service_ray.ops.text import content_hash

        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        hashed = docs.map_batches(
            lambda b: content_hash(b).drop_columns(["text"]), batch_format="pyarrow"
        )

        def weigh(g: pd.DataFrame) -> pd.DataFrame:
            n = len(g)
            return pd.DataFrame(
                {
                    "doc_id": g["doc_id"].to_numpy(),
                    "dup_count": np.int64(n),
                    "weight_ppm": np.int64(1_000_000 // n),
                }
            )

        return bucketed_map_groups(hashed, ["text_hash"], weigh)

    def q_late_events(sf_dir):
        """Event-time lateness audit (ops/scan.py running_max): the
        watermark as of each ARRIVAL (event_id order) minus the
        event's own time — flags out-of-order arrivals beyond 1 hour.
        Two-phase global running max: one sort, block metadata to the
        driver, vectorized in-block cummax."""
        from ocr_service_ray.ops.scan import running_max

        ev = _read(sf_dir, "events", ["event_id", "ts"])

        def us(b: pa.Table) -> pa.Table:
            return pa.table(
                {"event_id": b["event_id"], "ts_us": b["ts"].cast(pa.int64())}
            )

        run = running_max(
            ev.map_batches(us, batch_format="pyarrow"), "event_id", "ts_us"
        )

        def flag(b: pa.Table) -> pa.Table:
            late = b["running_max"].to_numpy(zero_copy_only=False) - b[
                "ts_us"
            ].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "event_id": b["event_id"],
                    "lateness_us": pa.array(late.astype(np.int64)),
                    "is_late": pa.array(
                        (late > 3_600_000_000).astype(np.int64)
                    ),
                }
            )

        return run.map_batches(flag, batch_format="pyarrow")

    def q_golden_records(sf_dir):
        """Survivorship / golden-record merge: per exact-duplicate
        cluster (md5 of text) keep the min doc_id, the max length and
        the sorted distinct source list — the MDM keep-best compose,
        one content-hash key shuffle."""
        import pandas as pd

        from ocr_service_ray.ops.agg import bucketed_map_groups
        from ocr_service_ray.ops.text import content_hash

        docs = _read(sf_dir, "documents", ["doc_id", "source", "n_chars", "text"])
        hashed = docs.map_batches(
            lambda b: content_hash(b).drop_columns(["text"]), batch_format="pyarrow"
        )

        def merge(g: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "survivor_id": [np.int64(g["doc_id"].min())],
                    "n_dups": [np.int64(len(g))],
                    "max_chars": [np.int64(g["n_chars"].max())],
                    "sources": [",".join(sorted(set(g["source"])))],
                }
            )

        return bucketed_map_groups(hashed, ["text_hash"], merge).select_columns(
            ["survivor_id", "n_dups", "max_chars", "sources"]
        )

    def q_skipgram_pairs(sf_dir):
        """Skip-gram (center, context) pair counts within a ±2 token
        window — word2vec training-data prep. Block-local Counter
        partials, one |pairs|-bounded exchange, combiner top-k."""
        from collections import Counter

        from ocr_service_ray.ops.agg import grouped_agg

        docs = _read(sf_dir, "documents", ["text"])

        def pair_partial(b: pa.Table) -> pa.Table:
            cnt: Counter = Counter()
            for t in b["text"].to_pylist():
                toks = (t or "").split(" ")
                n = len(toks)
                for i, c in enumerate(toks):
                    for j in range(max(0, i - 2), min(n, i + 3)):
                        if j != i:
                            cnt[(c, toks[j])] += 1
            if not cnt:
                return pa.table(
                    {
                        "center": pa.array([], pa.string()),
                        "context": pa.array([], pa.string()),
                        "n": pa.array([], pa.int64()),
                    }
                )
            ks, vs = zip(*cnt.items())
            return pa.table(
                {
                    "center": pa.array([k[0] for k in ks]),
                    "context": pa.array([k[1] for k in ks]),
                    "n": pa.array(list(vs), pa.int64()),
                }
            )

        counted = grouped_agg(
            docs.map_batches(pair_partial, batch_format="pyarrow"),
            ["center", "context"],
            {"n": ("n", "sum")},
        )
        return relational.topk(
            counted, by=["n", "center", "context"], k=30, descending=[True, False, False]
        )

    def q_sliding_distinct_types(sf_dir):
        """Per-user distinct event types among the last 5 events
        (sliding ROWS window COUNT DISTINCT — inexpressible as a SQL
        window function, rewritten as a bounded self-join in the
        oracle). One bucketed key shuffle; O(w) per row in-group."""
        import pandas as pd

        from ocr_service_ray.ops.agg import bucketed_map_groups

        ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["ts", "event_id"], kind="mergesort")
            types = g["event_type"].tolist()
            out = [
                len(set(types[max(0, i - 4) : i + 1])) for i in range(len(types))
            ]
            return pd.DataFrame(
                {
                    "event_id": g["event_id"].to_numpy(),
                    "user_id": g["user_id"].to_numpy(),
                    "n_distinct_5": np.asarray(out, dtype=np.int64),
                }
            )

        return bucketed_map_groups(ev, ["user_id"], fold)

    def q_next_token_top3(sf_dir):
        """Bigram language-model estimation: for every token, its
        top-3 followers by count — Counter combiner partials, one
        exchange, per-center grouped top-k (deterministic tie-break
        on the follower string)."""
        from collections import Counter

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import grouped_topk

        docs = _read(sf_dir, "documents", ["text"])

        def pair_partial(b: pa.Table) -> pa.Table:
            cnt: Counter = Counter()
            for t in b["text"].to_pylist():
                toks = (t or "").split(" ")
                for i in range(len(toks) - 1):
                    cnt[(toks[i], toks[i + 1])] += 1
            if not cnt:
                return pa.table(
                    {
                        "w1": pa.array([], pa.string()),
                        "w2": pa.array([], pa.string()),
                        "n": pa.array([], pa.int64()),
                    }
                )
            ks, vs = zip(*cnt.items())
            return pa.table(
                {
                    "w1": pa.array([k[0] for k in ks]),
                    "w2": pa.array([k[1] for k in ks]),
                    "n": pa.array(list(vs), pa.int64()),
                }
            )

        counted = grouped_agg(
            docs.map_batches(pair_partial, batch_format="pyarrow"),
            ["w1", "w2"],
            {"n": ("n", "sum")},
        )
        return grouped_topk(counted, ["w1"], ["n", "w2"], 3, [True, False])

    def q_quality_rank_in_source(sf_dir):
        """Within-source quality percentile (quality_micro fed into
        ops/window.py cume_dist_micro keyed by source) — the
        per-domain RELATIVE quality filter (FineWeb-style: cut the
        worst X% of each source, not a global threshold)."""
        from ocr_service_ray.ops.window import cume_dist_micro

        docs = _read(sf_dir, "documents", ["doc_id", "source", "text"])
        scored = docs.map_batches(
            lambda b: text_ops.quality_score(b).select(
                ["doc_id", "source", "quality_micro"]
            ),
            batch_format="pyarrow",
        )
        return cume_dist_micro(scored, "source", "quality_micro", "doc_id")

    def q_dedup_rate_by_source(sf_dir):
        """Per-source duplication diagnostic: docs, distinct texts and
        the duplicated fraction in ppm — two combiner aggregates
        (hashes shuffle once, never text)."""
        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.text import content_hash

        docs = _read(sf_dir, "documents", ["source", "text"])
        hashed = docs.map_batches(
            lambda b: content_hash(b).drop_columns(["text"]), batch_format="pyarrow"
        )
        per_hash = grouped_agg(
            hashed, ["source", "text_hash"], {"n": (None, "count")}
        )
        per_source = grouped_agg(
            per_hash,
            ["source"],
            {"n_unique": (None, "count"), "n_docs": ("n", "sum")},
        )

        def rate(b: pa.Table) -> pa.Table:
            nd = b["n_docs"].to_numpy(zero_copy_only=False)
            nu = b["n_unique"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "source": b["source"],
                    "n_docs": b["n_docs"],
                    "n_unique": b["n_unique"],
                    "dup_ppm": pa.array((nd - nu) * 1_000_000 // nd),
                }
            )

        return per_source.map_batches(rate, batch_format="pyarrow")

    def q_value_histogram(sf_dir):
        """Equi-width integer histogram of value cents (1000-cent
        buckets, floor division) — the profiling histogram, one
        combiner agg."""
        from ocr_service_ray.ops.agg import grouped_agg

        ev = _read(sf_dir, "events", ["value"])

        def bucket(b: pa.Table) -> pa.Table:
            c = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table({"bucket": pa.array(c // 1000)})

        return grouped_agg(
            ev.map_batches(bucket, batch_format="pyarrow"),
            ["bucket"],
            {"n": (None, "count")},
        )

    def q_daily_type_delta(sf_dir):
        """Day-over-day event-count deltas per type: combiner counts
        per (type, day), then an in-group LAG fold (first day delta
        0 by COALESCE on both sides) — the monitoring time-series
        shape."""
        import pandas as pd

        from ocr_service_ray.ops.agg import bucketed_map_groups, grouped_agg

        ev = _read(sf_dir, "events", ["event_type", "ts"])

        def day(b: pa.Table) -> pa.Table:
            d = (
                pd.DatetimeIndex(b["ts"].to_pandas())
                .values.astype("datetime64[D]")
                .astype(np.int64)
            )
            return pa.table({"event_type": b["event_type"], "day": pa.array(d)})

        counts = grouped_agg(
            ev.map_batches(day, batch_format="pyarrow"),
            ["event_type", "day"],
            {"n": (None, "count")},
        )

        def delta(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values("day")
            d = g["n"].diff().fillna(0).astype(np.int64)
            return pd.DataFrame(
                {
                    "event_type": g["event_type"].to_numpy(),
                    "day": g["day"].to_numpy(),
                    "n": g["n"].to_numpy(),
                    "delta": d.to_numpy(),
                }
            )

        return bucketed_map_groups(counts, ["event_type"], delta)

    def q_session_count_histogram(sf_dir):
        """Distribution of sessions-per-user (sessionize fold ->
        value-counts combiner): the engagement-shape diagnostic."""
        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import sessionize

        ev = _read(sf_dir, "events", ["user_id", "ts"])
        per_user = sessionize(ev)
        return grouped_agg(
            per_user.select_columns(["n_sessions"]),
            ["n_sessions"],
            {"n_users": (None, "count")},
        )

    def q_top_user_paths(sf_dir):
        """Top-10 behavioral paths: each user's first five event types
        joined '>' (one user-keyed fold), counted with a combiner agg,
        ranked by the block-local top-k combiner — the funnel-mining
        composition, deterministic tie-break on the path string."""
        import pandas as pd

        from ocr_service_ray.ops.agg import bucketed_map_groups, grouped_agg

        ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

        def path(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["ts", "event_id"], kind="mergesort")
            return pd.DataFrame({"path": [">".join(g["event_type"].head(5))]})

        paths = bucketed_map_groups(ev, ["user_id"], path)
        counts = grouped_agg(paths, ["path"], {"n_users": (None, "count")})
        return relational.topk(
            counts, by=["n_users", "path"], k=10, descending=[True, False]
        )

    def q_value_trend_ols(sf_dir):
        """Per-type OLS trend of event value (cents) on the epoch day
        (ops/trend.py grouped_ols): six integer moment sums per group
        ride ONE combiner exchange; slope/intercept close as exact
        bigint floor divisions on the |types|-bounded driver frame.
        The drift monitor a training-data pipeline runs per feature."""
        from ocr_service_ray.ops.trend import grouped_ols

        ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

        def prep(b: pa.Table) -> pa.Table:
            day = (
                b["ts"].to_numpy(zero_copy_only=False)
                .astype("datetime64[D]")
                .astype(np.int64)
            )
            cents = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "event_type": b["event_type"],
                    "x": pa.array(day),
                    "y": pa.array(cents),
                }
            )

        return grouped_ols(
            ev.map_batches(prep, batch_format="pyarrow"), ["event_type"], "x", "y"
        )

    def q_cusum_change_point(sf_dir):
        """Per-type CUSUM change-point peak over the dense daily grid
        (ops/trend.py cusum_peak): denominator-free integer CUSUM
        (D*cum_k - k*total) so the peak day is exact — the
        rate-shift detector behind ingestion monitoring."""
        from ocr_service_ray.ops.trend import cusum_peak

        return cusum_peak(
            _read(sf_dir, "events", ["event_type", "ts"]), "event_type", "ts"
        )

    def q_time_weighted_value(sf_dir):
        """Per-user step-interpolated time-weighted value average
        (ops/trend.py time_weighted_avg): one bucketed exchange, each
        value weighted by the whole seconds until the user's next
        event, closing as an exact integer floor division."""
        from ocr_service_ray.ops.trend import time_weighted_avg

        ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "value"])

        def prep(b: pa.Table) -> pa.Table:
            cents = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "user_id": b["user_id"],
                    "ts": b["ts"],
                    "event_id": b["event_id"],
                    "cents": pa.array(cents),
                }
            )

        return time_weighted_avg(
            ev.map_batches(prep, batch_format="pyarrow"),
            "user_id",
            "ts",
            "cents",
            ["ts", "event_id"],
        )

    def q_user_dom_bitmap(sf_dir):
        """Per-user day-of-month activity bitmap (ops/bitmap.py): a
        combiner dedupe of (user, day) then SUM of distinct powers of
        two == bitwise OR — an 8-byte seasonality mask per user."""
        from ocr_service_ray.ops.bitmap import activity_bitmap

        return activity_bitmap(
            _read(sf_dir, "events", ["user_id", "ts"]),
            "user_id",
            "ts",
            unit="day_of_month",
        )

    def q_benford_totalprice(sf_dir):
        """First-significant-digit (Benford) profile of order totals
        in cents (ops/sketch.py first_digit_counts): lexical digit
        extraction (Arrow cast+slice, no float log10), one combiner
        count, ppm shares by exact floor division."""
        from ocr_service_ray.ops.sketch import first_digit_counts

        orders = _read(sf_dir, "orders", ["o_totalprice"])

        def cents(b: pa.Table) -> pa.Table:
            c = np.floor(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table({"cents": pa.array(c)})

        return first_digit_counts(
            orders.map_batches(cents, batch_format="pyarrow"), "cents"
        )

    def q_event_pair_lift(sf_dir):
        """Association lift per event-type pair within users
        (ops/lift.py pair_lift): combiner dedupe -> bounded per-user
        pair explode -> combiner counts; the overflowing
        1e6*n_pair*n_baskets/(n_a*n_b) ratio closes in Python bigints
        on the |types|^2 driver frame (HUGEINT in the oracle)."""
        from ocr_service_ray.ops.lift import pair_lift

        return pair_lift(
            _read(sf_dir, "events", ["user_id", "event_type"]),
            "user_id",
            "event_type",
        )

    # -------------------------------------------- wave 15: distribution shift

    def q_lang_tv_by_source(sf_dir):
        """Total-variation distance of each source's language mix vs
        the corpus (ops/divergence.py tv_distance_by_group): one
        combiner aggregate to (source, lang) counts, exact single-
        division ppm on the vocabulary-bounded driver frame — the
        slice-drift monitor run before mixing sources into a corpus."""
        from ocr_service_ray.ops.divergence import tv_distance_by_group

        return tv_distance_by_group(
            _read(sf_dir, "documents", ["source", "lang"]), "source", "lang"
        )

    def q_type_user_hhi(sf_dir):
        """Herfindahl concentration of each event type over users
        (ops/divergence.py grouped_hhi): two combiner exchanges (rows
        -> (type,user) counts -> per-type moment sums), bigint close —
        flags slices dominated by a handful of contributors."""
        from ocr_service_ray.ops.divergence import grouped_hhi

        return grouped_hhi(
            _read(sf_dir, "events", ["event_type", "user_id"]),
            "event_type",
            "user_id",
        )

    def q_ewma_event_counts(sf_dir):
        """Geometric-weight (alpha=1/2) moving average of daily event
        counts per type over the dense zero-filled grid (ops/trend.py
        ewma_grid): power-of-two weights keep numpy and the DuckDB
        banded self-join bit-identical — the smoothed ingestion-rate
        monitor."""
        from ocr_service_ray.ops.trend import ewma_grid

        return ewma_grid(_read(sf_dir, "events", ["event_type", "ts"]), "event_type")

    def q_daily_autocorr(sf_dir):
        """Lag-1 autocorrelation of daily counts per event type on the
        dense grid (ops/trend.py lag1_autocorr), reported as signed
        squared correlation in exact ppm (sqrt-free) — the seasonality
        detector behind sampling-schedule decisions."""
        from ocr_service_ray.ops.trend import lag1_autocorr

        return lag1_autocorr(
            _read(sf_dir, "events", ["event_type", "ts"]), "event_type"
        )

    def q_customer_event_reconcile(sf_dir):
        """Full-outer key reconciliation customers vs event actors
        (ops/relational.py reconcile_keys): each side collapses to
        per-key counts in its own combiner, one merged exchange
        assigns both/left_only/right_only — the migration-audit report
        without a row-level full outer join."""
        from ocr_service_ray.ops.relational import reconcile_keys

        return reconcile_keys(
            _read(sf_dir, "customer", ["c_custkey"]),
            _read(sf_dir, "events", ["user_id"]),
            "c_custkey",
            "user_id",
        )

    def q_daily_user_jaccard(sf_dir):
        """Jaccard similarity of consecutive days' active-user sets
        (ops/retention.py day_over_day_jaccard): distinct actives ->
        2x flat-map contributions -> per-day flag sums; exact ppm —
        the audience-churn shape over time."""
        from ocr_service_ray.ops.retention import day_over_day_jaccard

        return day_over_day_jaccard(_read(sf_dir, "events", ["user_id", "ts"]))

    # ------------------------------------------ wave 16: slice health + Q7

    def q_gini_user_activity(sf_dir):
        """Gini concentration of each event type's activity over users
        (ops/divergence.py grouped_gini): combiner to (type, user)
        counts, one bucketed key shuffle, numpy rank fold per type —
        the inequality complement to HHI (needs sorted counts, not a
        moment)."""
        from ocr_service_ray.ops.divergence import grouped_gini

        return grouped_gini(
            _read(sf_dir, "events", ["event_type", "user_id"]),
            "event_type",
            "user_id",
        )

    def q_activity_streaks(sf_dir):
        """Histogram of longest consecutive-day user streaks
        (ops/retention.py streak_histogram): gaps-and-islands via a
        vectorized per-user numpy diff fold after one bucketed key
        shuffle of DISTINCT (user, day) pairs — the engagement-depth
        report."""
        from ocr_service_ray.ops.retention import streak_histogram

        return streak_histogram(_read(sf_dir, "events", ["user_id", "ts"]))

    def q_hapax_by_source(sf_dir):
        """Per-source hapax TRIGRAM-shingle share (ops/text.py
        hapax_by_group, ngram=3): distinct (source, shingle) combiner
        counts, a per-shingle fold (a corpus-hapax lives in exactly
        one source, so max(source) rides along), per-source close in
        exact ppm — the vocabulary-freshness / OCR-noise monitor.
        Trigrams because the synthetic corpus has a 31-word fixed
        vocabulary: no word-level hapax exists, the 3-shingle space is
        ~58% hapax."""
        from ocr_service_ray.ops.text import hapax_by_group

        return hapax_by_group(
            _read(sf_dir, "documents", ["source", "text"]),
            "source",
            "text",
            ngram=3,
        )

    def q7_trade_volume(sf_dir):
        """TPC-H-Q7-shaped nation-pair trade volume by ship year:
        lineitem (date-filtered + cents-rounded at the scan) hash-joins
        orders then customer on the shared key chain; BOTH nation
        lookups (supplier side and customer side) broadcast — fact
        rows shuffle only for the two large-large joins, never for
        dimensions. Cross-border pairs only (supp != cust nation)."""
        import datetime as _dt

        import numpy as np
        import pandas as pd
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as _pq

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import join_partitions_for

        lo = _dt.datetime(1995, 1, 1)
        hi = _dt.datetime(1997, 1, 1)
        li = _read(
            sf_dir,
            "lineitem",
            [
                "l_orderkey",
                "l_suppkey",
                "l_extendedprice",
                "l_discount",
                "l_shipdate",
            ],
        )

        def li_prep(b: pa.Table) -> pa.Table:
            keep = pc.and_(
                pc.greater_equal(b["l_shipdate"], pa.scalar(lo)),
                pc.less(b["l_shipdate"], pa.scalar(hi)),
            )
            b = b.filter(keep)
            rev = np.floor(
                b["l_extendedprice"].to_numpy(zero_copy_only=False)
                * (1.0 - b["l_discount"].to_numpy(zero_copy_only=False))
                * 100.0
                + 0.5
            ).astype(np.int64)
            year = (
                b["l_shipdate"]
                .to_pandas()
                .dt.year.to_numpy()
                .astype(np.int64)
            )
            return pa.table(
                {
                    "l_orderkey": b["l_orderkey"],
                    "l_suppkey": b["l_suppkey"],
                    "l_year": pa.array(year),
                    "rev_cents": pa.array(rev),
                }
            )

        li = li.map_batches(li_prep, batch_format="pyarrow")
        od = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        cu = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
        oc = od.join(
            cu,
            join_type="inner",
            num_partitions=join_partitions_for(od, cu),
            on=("o_custkey",),
            right_on=("c_custkey",),
        )
        lio = li.join(
            oc,
            join_type="inner",
            num_partitions=join_partitions_for(li, oc),
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )

        sup = _pq.read_table(
            f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
        ).to_pandas()
        nat = _pq.read_table(
            f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
        ).to_pandas()
        k2n = dict(zip(nat["n_nationkey"], nat["n_name"]))
        s2n = dict(zip(sup["s_suppkey"], sup["s_nationkey"].map(k2n)))

        def to_pair(b: pd.DataFrame) -> pd.DataFrame:
            out = pd.DataFrame(
                {
                    "supp_nation": b["l_suppkey"].map(s2n),
                    "cust_nation": b["c_nationkey"].map(k2n),
                    "l_year": b["l_year"],
                    "rev_cents": b["rev_cents"],
                }
            )
            return out[out["supp_nation"] != out["cust_nation"]]

        return grouped_agg(
            lio.map_batches(to_pair, batch_format="pandas"),
            ["supp_nation", "cust_nation", "l_year"],
            {"revenue_cents": ("rev_cents", "sum"), "n_rows": (None, "count")},
        )

    def q_label_centroid_cosine(sf_dir):
        """Pairwise signed-squared cosine between per-label centroid
        embeddings (ops/vector.py centroid_cosine_pairs): the member
        counts cancel out of cosine, so micro-int element SUMS make it
        exact bigint arithmetic end to end; vectors never shuffle
        (blocks collapse to |labels| x dim partials)."""
        from ocr_service_ray.ops.vector import centroid_cosine_pairs

        out = centroid_cosine_pairs(
            _read(sf_dir, "embeddings", ["label", "embedding"]), "label"
        )
        out["group_a"] = out["group_a"].astype("int64")
        out["group_b"] = out["group_b"].astype("int64")
        return out

    def q_quality_rate_ztest(sf_dir):
        """Per-source two-proportion z^2 (signed, exact ppm) of the
        long-document rate vs the rest of the corpus (ops/stats.py
        grouped_rate_ztest): one combiner collapses rows to per-source
        (n, k); the pooled-variance close is bigint driver arithmetic
        — the slice-regression alarm."""
        from ocr_service_ray.ops.stats import grouped_rate_ztest

        docs = _read(sf_dir, "documents", ["source", "n_chars"])

        def flag(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "source": b["source"],
                    "is_long": pc.cast(
                        pc.greater_equal(b["n_chars"], 200), pa.int64()
                    ),
                }
            )

        return grouped_rate_ztest(
            docs.map_batches(flag, batch_format="pyarrow"), "source", "is_long"
        )

    # --------------------------------------- wave 17: stats + similarity

    def q_chi2_type_weekday(sf_dir):
        """Chi-square independence check of event type vs day-of-week
        bucket (ops/divergence.py contingency_chi2): one combiner to
        the |types| x 7 contingency cells, exact per-cell ppm close —
        the seasonality-bias test. Weekday = epoch_day mod 7 (identical
        integer convention on both engines, no calendar functions)."""
        from ocr_service_ray.ops.divergence import contingency_chi2

        ev = _read(sf_dir, "events", ["event_type", "ts"])

        def add_dow(b: pa.Table) -> pa.Table:
            day = (
                b["ts"].to_pandas().values.astype("datetime64[D]").astype(np.int64)
            )
            return pa.table(
                {"event_type": b["event_type"], "dow": pa.array(day % 7)}
            )

        return contingency_chi2(
            ev.map_batches(add_dow, batch_format="pyarrow"), "event_type", "dow"
        )

    def q_source_shingle_jaccard(sf_dir):
        """Pairwise Jaccard of sources' DISTINCT trigram-shingle sets
        (ops/similarity.py group_set_jaccard): the inter-slice
        duplication map. Distinct pairs in one combiner, pair emission
        per shingle after one bucketed value shuffle; disjoint source
        pairs (none here) are omitted by contract."""
        from collections import Counter

        from ocr_service_ray.ops.similarity import group_set_jaccard

        docs = _read(sf_dir, "documents", ["source", "text"])

        def explode(batch: pa.Table) -> pa.Table:
            seen = set()
            for g, t in zip(
                batch["source"].to_pylist(), batch["text"].to_pylist()
            ):
                ws = (t or "").split()
                for i in range(len(ws) - 2):
                    seen.add((g, " ".join(ws[i : i + 3])))
            gs = [g for g, _ in seen]
            sh = [w for _, w in seen]
            return pa.table(
                {
                    "source": pa.array(gs, batch["source"].type),
                    "shingle": pa.array(sh, pa.string()),
                }
            )

        return group_set_jaccard(
            docs.map_batches(explode, batch_format="pyarrow"), "source", "shingle"
        )

    def q_length_ks_by_source(sf_dir):
        """Kolmogorov–Smirnov distance of each source's doc-length
        distribution vs the corpus (ops/divergence.py
        ks_distance_by_group): ordered-drift monitor; one combiner to
        (source, n_chars) counts, cumulative max on the distinct-
        value-bounded driver frame, exact single division."""
        from ocr_service_ray.ops.divergence import ks_distance_by_group

        return ks_distance_by_group(
            _read(sf_dir, "documents", ["source", "n_chars"]), "source", "n_chars"
        )

    def q_score_decile_lift(sf_dir):
        """Decile lift table of the quality score against the
        long-document label: global_rank (ops/scan.py — distributed
        sort + block-offset scan) over (quality_micro, doc_id) buckets
        docs into exact deciles; per-decile long-doc rate closes in
        one combiner — the model-eval lift chart."""
        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.scan import global_rank
        from ocr_service_ray.ops.text import quality_score

        docs = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
        n_total = docs.count()

        def score(b: pa.Table) -> pa.Table:
            q = quality_score(b, "text")
            return pa.table(
                {
                    "doc_id": b["doc_id"],
                    "quality_micro": q["quality_micro"],
                    "is_long": pc.cast(
                        pc.greater_equal(b["n_chars"], 200), pa.int64()
                    ),
                }
            )

        ranked = global_rank(
            docs.map_batches(score, batch_format="pyarrow"),
            ["quality_micro", "doc_id"],
        )

        def to_decile(b: pa.Table) -> pa.Table:
            r = b["rank"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "decile": pa.array(r * 10 // n_total),
                    "is_long": b["is_long"],
                }
            )

        agg = grouped_agg(
            ranked.map_batches(to_decile, batch_format="pyarrow"),
            ["decile"],
            {"n_docs": (None, "count"), "n_long": ("is_long", "sum")},
        )

        def close(b: pd.DataFrame) -> pd.DataFrame:
            b = b.astype({"decile": "int64", "n_docs": "int64", "n_long": "int64"})
            b["long_rate_ppm"] = (1_000_000 * b["n_long"]) // b["n_docs"]
            return b

        return agg.map_batches(close, batch_format="pandas")

    def q_event_run_lengths(sf_dir):
        """Histogram of each user's longest same-type event run in
        (ts, event_id) order (ops/retention.py run_length_histogram):
        one bucketed key shuffle, numpy change-point fold per user —
        the bot-burst / stuck-client detector."""
        from ocr_service_ray.ops.retention import run_length_histogram

        return run_length_histogram(
            _read(sf_dir, "events", ["user_id", "event_type", "ts", "event_id"])
        )

    def q_type_user_cosine(sf_dir):
        """Item–item cosine between event types over per-user count
        vectors (ops/lift.py pair_count_cosine): the collaborative-
        filtering similarity kernel, exact signed-squared ppm; raw
        rows shuffle once, pair products emit per user."""
        from ocr_service_ray.ops.lift import pair_count_cosine

        return pair_count_cosine(
            _read(sf_dir, "events", ["event_type", "user_id"]),
            "event_type",
            "user_id",
        )

    # --------------------------------- wave 18: concentration + ML eval

    def q_burstiness_fano(sf_dir):
        """Per-type Fano factor (variance/mean) of daily event counts
        on the dense grid (ops/trend.py fano_grid): the burstiness
        monitor — Poisson-like ingestion scores ~1e6 ppm, batchy
        sources score above. One combiner shuffle; integer moments."""
        from ocr_service_ray.ops.trend import fano_grid

        return fano_grid(_read(sf_dir, "events", ["event_type", "ts"]), "event_type")

    def q_type_top_decile_share(sf_dir):
        """Share of each event type's volume owned by its top 10% of
        users (ops/divergence.py top_share_by_group): the Lorenz-curve
        point behind whale-domination checks; top-k sum is tie-
        permutation invariant so both engines agree exactly."""
        from ocr_service_ray.ops.divergence import top_share_by_group

        return top_share_by_group(
            _read(sf_dir, "events", ["event_type", "user_id"]),
            "event_type",
            "user_id",
            top_pct=10,
        )

    def q_quality_auc(sf_dir):
        """Exact AUC of the quality score against the long-document
        label via the rank formula over the (quality_micro, doc_id)
        global sort (ops/scan.py global_rank — ties broken by doc_id
        identically on both engines):

            AUC = (sum of positives' 1-based ranks - P(P+1)/2) / (P*N)

        One distributed sort + one combiner aggregate; the close is a
        single-row bigint division."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.scan import global_rank
        from ocr_service_ray.ops.text import quality_score

        docs = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

        def score(b: pa.Table) -> pa.Table:
            q = quality_score(b, "text")
            return pa.table(
                {
                    "doc_id": b["doc_id"],
                    "quality_micro": q["quality_micro"],
                    "is_long": pc.cast(
                        pc.greater_equal(b["n_chars"], 200), pa.int64()
                    ),
                }
            )

        ranked = global_rank(
            docs.map_batches(score, batch_format="pyarrow"),
            ["quality_micro", "doc_id"],
        )

        def one_based(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "is_long": b["is_long"],
                    "r1": pc.add(b["rank"], 1),
                }
            )

        per_label = grouped_agg(
            ranked.map_batches(one_based, batch_format="pyarrow"),
            ["is_long"],
            {"n": (None, "count"), "rank_sum": ("r1", "sum")},
        ).to_pandas().set_index("is_long")

        p = int(per_label.loc[1, "n"]) if 1 in per_label.index else 0
        n_neg = int(per_label.loc[0, "n"]) if 0 in per_label.index else 0
        if p == 0 or n_neg == 0:
            auc = 0
        else:
            rs = int(per_label.loc[1, "rank_sum"])
            auc = (1_000_000 * (rs - p * (p + 1) // 2)) // (p * n_neg)
        return pd.DataFrame(
            {
                "n_pos": pd.array([p], dtype="int64"),
                "n_neg": pd.array([n_neg], dtype="int64"),
                "auc_ppm": pd.array([auc], dtype="int64"),
            }
        )

    def q_reorder_gap_quantiles(sf_dir):
        """Exact p25/p50/p75 of per-customer consecutive order-date
        gaps, by market segment: consecutive_gaps (ops/retention.py —
        one bucketed key shuffle + numpy diff) feeds a broadcast
        custkey→segment map, then grouped_quantiles (ops/sketch.py)
        closes combiner-style — the repurchase-cadence report."""
        import pyarrow.parquet as _pq

        from ocr_service_ray.ops.relational import broadcast_join
        from ocr_service_ray.ops.retention import consecutive_gaps
        from ocr_service_ray.ops.sketch import grouped_quantiles

        gaps = consecutive_gaps(
            _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]),
            "o_custkey",
            "o_orderdate",
        )
        seg = _pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
        ).to_pandas()

        def rename(b: pa.Table) -> pa.Table:
            return b.select(["c_mktsegment", "gap"])

        # broadcast_join matches on the shared key name — align first
        def widen(b: pd.DataFrame) -> pd.DataFrame:
            return b.rename(columns={"o_custkey": "c_custkey"})

        joined = broadcast_join(
            gaps.map_batches(widen, batch_format="pandas"), seg, on="c_custkey"
        ).map_batches(rename, batch_format="pyarrow")
        return grouped_quantiles(
            joined, ["c_mktsegment"], "gap", [0.25, 0.5, 0.75]
        )

    def q_systematic_sample_orders(sf_dir):
        """Deterministic systematic 1-in-100 sample along the orderkey
        order (ops/scan.py global_rank): rank % 100 == 0 keeps rows,
        a combiner folds the sample to per-status counts + cents —
        the layout-independent audit sample."""
        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.scan import global_rank

        od = _read(
            sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_totalprice"]
        )
        ranked = global_rank(od, ["o_orderkey"])

        def keep(b: pa.Table) -> pa.Table:
            r = b["rank"].to_numpy(zero_copy_only=False)
            b = b.filter(pa.array(r % 100 == 0))
            cents = np.floor(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {"o_orderstatus": b["o_orderstatus"], "cents": pa.array(cents)}
            )

        return grouped_agg(
            ranked.map_batches(keep, batch_format="pyarrow"),
            ["o_orderstatus"],
            {"n_rows": (None, "count"), "sample_cents": ("cents", "sum")},
        )

    def q_weighted_price_quantiles(sf_dir):
        """Quantity-WEIGHTED price quantiles per return flag
        (ops/sketch.py grouped_weighted_quantiles): quantile_disc over
        the weight-expanded multiset without expanding it — rational
        rank thresholds keep both engines integer-exact."""
        from ocr_service_ray.ops.sketch import grouped_weighted_quantiles

        li = _read(
            sf_dir, "lineitem", ["l_returnflag", "l_extendedprice", "l_quantity"]
        )

        def prep(b: pa.Table) -> pa.Table:
            cents = np.floor(
                b["l_extendedprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            w = (
                b["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
            )
            return pa.table(
                {
                    "l_returnflag": b["l_returnflag"],
                    "cents": pa.array(cents),
                    "w": pa.array(w),
                }
            )

        return grouped_weighted_quantiles(
            li.map_batches(prep, batch_format="pyarrow"),
            ["l_returnflag"],
            "cents",
            "w",
        )

    # ------------------------------ wave 19: exact sim-join + growth

    def q_jaccard_pair_join(sf_dir):
        """Exact PPJoin-style set-similarity self-join (ops/
        similarity.py jaccard_pair_join): every doc pair with trigram
        Jaccard >= 0.5, via prefix filtering under the global (df,
        shingle) token order + exact verification — the zero-false-
        negative complement to MinHash-LSH dedup."""
        from ocr_service_ray.ops.similarity import jaccard_pair_join

        return jaccard_pair_join(
            _read(sf_dir, "documents", ["doc_id", "text"]),
            "doc_id",
            "text",
            ngram=3,
            threshold_ppm=500_000,
        )

    def q_growth_accounting(sf_dir):
        """Daily new / retained / resurrected user decomposition
        (ops/retention.py growth_accounting): distinct actives in one
        combiner, per-user numpy classification after one bucketed key
        shuffle — the DAU growth-accounting report."""
        from ocr_service_ray.ops.retention import growth_accounting

        return growth_accounting(_read(sf_dir, "events", ["user_id", "ts"]))

    def q_above_priority_avg(sf_dir):
        """Orders strictly above their priority class's average price,
        WITHOUT floats: the average compare cross-multiplies
        (cents * n > sum_cents), so one combiner computes per-priority
        (sum, n), the tiny map broadcasts back, and a second combiner
        counts — the correlated-subquery shape made exact."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        od = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

        def to_cents(b: pa.Table) -> pa.Table:
            cents = np.floor(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {"o_orderpriority": b["o_orderpriority"], "cents": pa.array(cents)}
            )

        cents_ds = od.map_batches(to_cents, batch_format="pyarrow")
        stats = (
            grouped_agg(
                cents_ds,
                ["o_orderpriority"],
                {"sum_cents": ("cents", "sum"), "n": (None, "count")},
            )
            .to_pandas()
            .set_index("o_orderpriority")
        )
        sums = {k: int(v) for k, v in stats["sum_cents"].items()}
        ns = {k: int(v) for k, v in stats["n"].items()}

        def flag(b: pd.DataFrame) -> pd.DataFrame:
            s = b["o_orderpriority"].map(sums).to_numpy(dtype=np.int64)
            n = b["o_orderpriority"].map(ns).to_numpy(dtype=np.int64)
            above = (b["cents"].to_numpy(dtype=np.int64) * n > s).astype(
                np.int64
            )
            return pd.DataFrame(
                {"o_orderpriority": b["o_orderpriority"], "above": above}
            )

        return grouped_agg(
            cents_ds.map_batches(flag, batch_format="pandas"),
            ["o_orderpriority"],
            {"n_total": (None, "count"), "n_above": ("above", "sum")},
        )

    def q_rrf_prune_candidates(sf_dir):
        """Reciprocal-rank-fusion of two ascending rankings (quality
        score, doc length) into a prune-candidate top-10: two
        global_rank sorts share the doc_id spine via a hash join,
        per-rank terms are floor(1e6/(60+r)) — integer-exact RRF —
        and a combiner top-k closes. Ties break on doc_id on both
        engines."""
        import pandas as pd

        from ocr_service_ray.ops.relational import hash_join, topk
        from ocr_service_ray.ops.scan import global_rank
        from ocr_service_ray.ops.text import quality_score

        docs = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

        def score(b: pa.Table) -> pa.Table:
            q = quality_score(b, "text")
            return pa.table(
                {
                    "doc_id": b["doc_id"],
                    "quality_micro": q["quality_micro"],
                    "n_chars": b["n_chars"],
                }
            )

        scored = docs.map_batches(score, batch_format="pyarrow")
        r1 = global_rank(
            scored.select_columns(["doc_id", "quality_micro"]),
            ["quality_micro", "doc_id"],
        ).map_batches(
            lambda b: pa.table({"doc_id": b["doc_id"], "r1": pc.add(b["rank"], 1)}),
            batch_format="pyarrow",
        )
        r2 = global_rank(
            scored.select_columns(["doc_id", "n_chars"]),
            ["n_chars", "doc_id"],
        ).map_batches(
            lambda b: pa.table({"doc_id": b["doc_id"], "r2": pc.add(b["rank"], 1)}),
            batch_format="pyarrow",
        )
        both = hash_join(r1.repartition(4), r2.repartition(4), on="doc_id")

        def fuse(b: pd.DataFrame) -> pd.DataFrame:
            s = (1_000_000 // (60 + b["r1"].to_numpy(dtype=np.int64))) + (
                1_000_000 // (60 + b["r2"].to_numpy(dtype=np.int64))
            )
            return pd.DataFrame(
                {"doc_id": b["doc_id"], "rrf_milli": s.astype(np.int64)}
            )

        fused = both.map_batches(fuse, batch_format="pandas")
        return topk(fused, ["rrf_milli", "doc_id"], 10, [True, False])

    def q_order_width_histogram(sf_dir):
        """Histogram of lineitems-per-order INCLUDING empty orders:
        per-order counts in one combiner, a left join onto the orders
        spine zero-fills absentees, a second combiner folds the
        histogram — the fill-rate report."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import hash_join

        li = _read(sf_dir, "lineitem", ["l_orderkey"])
        counts = grouped_agg(li, ["l_orderkey"], {"n_items": (None, "count")})
        spine = _read(sf_dir, "orders", ["o_orderkey"])
        # counts keys are l_orderkey — align names for the join
        aligned = counts.map_batches(
            lambda b: b.rename_columns(
                ["o_orderkey" if c == "l_orderkey" else c for c in b.column_names]
            ),
            batch_format="pyarrow",
        )
        joined = hash_join(
            spine, aligned.repartition(4), on="o_orderkey", join_type="left_outer"
        )

        def fill(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"n_items": b["n_items"].fillna(0).astype("int64")}
            )

        out = grouped_agg(
            joined.map_batches(fill, batch_format="pandas"),
            ["n_items"],
            {"n_orders": (None, "count")},
        )
        return out.map_batches(
            lambda b: b.astype({"n_items": "int64", "n_orders": "int64"}),
            batch_format="pandas",
        )

    # ---------------------------- wave 20: co-movement + coverage

    def q_rolling_type_correlation(sf_dir):
        """Rolling 7-day windowed correlation between the view and
        purchase daily count series (ops/trend.py rolling_window_corr):
        exact signed-squared ppm per day over the shared dense grid —
        the demand co-movement monitor."""
        from ocr_service_ray.ops.trend import rolling_window_corr

        return rolling_window_corr(
            _read(sf_dir, "events", ["event_type", "ts"]),
            "event_type",
            "view",
            "purchase",
        )

    def q_seasonal_outlier_days(sf_dir):
        """Days >10% above their type's same-weekday average
        (ops/trend.py seasonal_outliers, factor 11/10): the
        seasonality-adjusted spike list; weekday = epoch_day mod 7 and
        the average compare cross-multiplies — all integer."""
        from ocr_service_ray.ops.trend import seasonal_outliers

        return seasonal_outliers(
            _read(sf_dir, "events", ["event_type", "ts"]),
            "event_type",
            factor_num=11,
            factor_den=10,
        )

    def q_oov_rate_by_source(sf_dir):
        """Per-source out-of-vocabulary token rate against the corpus
        top-20 vocabulary (ops/text.py oov_rate_by_group): (count
        DESC, word ASC) picks the same boundary words on both engines;
        three combiner passes over (source, word) counts — the
        tokenizer-coverage monitor."""
        from ocr_service_ray.ops.text import oov_rate_by_group

        return oov_rate_by_group(
            _read(sf_dir, "documents", ["source", "text"]),
            "source",
            "text",
            vocab_k=20,
        )

    def q_conversion_lag_quantiles(sf_dir):
        """Exact p25/p50/p75 of first-view→first-purchase lag in
        seconds (ops/retention.py first_conversion_lags + ops/
        sketch.py value_counts_quantiles): one bucketed key shuffle of
        just the two event types, per-user vectorized minima, then the
        value-count quantile fold — the time-to-convert report."""
        from ocr_service_ray.ops.retention import first_conversion_lags
        from ocr_service_ray.ops.sketch import value_counts_quantiles

        lags = first_conversion_lags(
            _read(sf_dir, "events", ["user_id", "ts", "event_type"])
        )
        return value_counts_quantiles(lags, "lag_sec", [0.25, 0.5, 0.75])

    # ---------------------------- wave 21: composites + lead-lag

    def q_slice_health_report(sf_dir):
        """ONE per-source health frame composing three drift monitors
        — language-mix TV distance, doc-length KS distance, long-doc
        two-proportion z² (ops/divergence.py + ops/stats.py): each is
        its own combiner pass over a pruned column pair; the join is
        a |sources|-row driver merge. The report a curation run gates
        a source on before mixing it in."""
        import pandas as pd

        from ocr_service_ray.ops.divergence import (
            ks_distance_by_group,
            tv_distance_by_group,
        )
        from ocr_service_ray.ops.stats import grouped_rate_ztest

        tv = tv_distance_by_group(
            _read(sf_dir, "documents", ["source", "lang"]), "source", "lang"
        )[["source", "n_rows", "tv_ppm"]].rename(columns={"n_rows": "n_docs"})
        ks = ks_distance_by_group(
            _read(sf_dir, "documents", ["source", "n_chars"]),
            "source",
            "n_chars",
        )[["source", "ks_ppm"]]

        docs = _read(sf_dir, "documents", ["source", "n_chars"])

        def flag(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "source": b["source"],
                    "is_long": pc.cast(
                        pc.greater_equal(b["n_chars"], 200), pa.int64()
                    ),
                }
            )

        zt = grouped_rate_ztest(
            docs.map_batches(flag, batch_format="pyarrow"), "source", "is_long"
        )[["source", "z2_ppm"]]
        out = tv.merge(ks, on="source").merge(zt, on="source")
        return out.sort_values("source").reset_index(drop=True)

    def q_snm_candidate_pairs(sf_dir):
        """Sorted-neighborhood dedup blocking: docs globally sorted by
        (n_chars, doc_id) (ops/scan.py global_rank), consecutive-rank
        neighbors paired via a rank-keyed hash join (rank r joins
        r+1), kept when the length gap <= 2 — the entity-resolution
        candidate generator that never compares across the corpus."""
        import pandas as pd

        from ocr_service_ray.ops.relational import hash_join
        from ocr_service_ray.ops.scan import global_rank

        ranked = global_rank(
            _read(sf_dir, "documents", ["doc_id", "n_chars"]),
            ["n_chars", "doc_id"],
        )
        a = ranked.map_batches(
            lambda b: pa.table(
                {"rank": b["rank"], "id_a": b["doc_id"], "n_a": b["n_chars"]}
            ),
            batch_format="pyarrow",
        )
        b_side = ranked.map_batches(
            lambda b: pa.table(
                {
                    "rank": pc.subtract(b["rank"], 1),
                    "id_b": b["doc_id"],
                    "n_b": b["n_chars"],
                }
            ),
            batch_format="pyarrow",
        )
        pairs = hash_join(a.repartition(4), b_side.repartition(4), on="rank")

        def keep(b: pd.DataFrame) -> pd.DataFrame:
            d = (b["n_b"] - b["n_a"]).abs()
            out = b[d <= 2][["id_a", "id_b", "n_a", "n_b"]].copy()
            for c in out.columns:
                out[c] = out[c].astype("int64")
            return out

        return pairs.map_batches(keep, batch_format="pandas")

    def q_leadlag_view_purchase(sf_dir):
        """Lead–lag cross-correlation of view vs purchase daily counts
        for lags 0..3 (ops/trend.py leadlag_corr): exact signed-
        squared ppm per lag over the shared dense grid — which lag the
        demand signal peaks at."""
        from ocr_service_ray.ops.trend import leadlag_corr

        return leadlag_corr(
            _read(sf_dir, "events", ["event_type", "ts"]),
            "event_type",
            "view",
            "purchase",
            max_lag=3,
        )

    def q_cramers_v_lang_source(sf_dir):
        """Cramér's V² between document language and source
        (ops/divergence.py cramers_v2): the single-number association
        summary over the same contingency cells as the chi-square op —
        sum of per-cell floors, one normalizing division."""
        from ocr_service_ray.ops.divergence import cramers_v2

        return cramers_v2(
            _read(sf_dir, "documents", ["lang", "source"]), "lang", "source"
        )

    def q_daily_value_p95(sf_dir):
        """Exact per-(type, day) p95 of event value in cents
        (ops/sketch.py grouped_quantiles over a two-column key): the
        daily-grain tail-metric report; raw rows collapse to value
        counts before any shuffle."""
        from ocr_service_ray.ops.sketch import grouped_quantiles

        ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

        def prep(b: pa.Table) -> pa.Table:
            day = (
                b["ts"].to_pandas().values.astype("datetime64[D]").astype(np.int64)
            )
            cents = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "event_type": b["event_type"],
                    "day": pa.array(day),
                    "cents": pa.array(cents),
                }
            )

        return grouped_quantiles(
            ev.map_batches(prep, batch_format="pyarrow"),
            ["event_type", "day"],
            "cents",
            [0.95],
        )

    # -------------------------- wave 22: baskets + session behavior

    def q_frequent_part_triples(sf_dir):
        """Frequent part 3-itemsets with Apriori pruning (ops/lift.py
        frequent_triples): per-basket triple candidates gated by the
        broadcast frequent-PAIR set (a triple can't beat its worst
        sub-pair), counted in one combiner — the next market-basket
        tier above frequent_part_pairs."""
        from ocr_service_ray.ops.lift import frequent_triples

        return frequent_triples(
            _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]),
            "l_orderkey",
            "l_partkey",
            min_support=2,
        )

    def q_bounce_rate_by_entry(sf_dir):
        """Per-entry-type session bounce rate (ops/retention.py
        bounce_rate_by_entry): 30-min-gap sessions attributed to their
        first event's type in (ts, event_id) order, single-event
        sessions = bounces — the landing-quality report."""
        from ocr_service_ray.ops.retention import bounce_rate_by_entry

        return bounce_rate_by_entry(
            _read(sf_dir, "events", ["user_id", "ts", "event_type", "event_id"])
        )

    def q_user_burstiness(sf_dir):
        """Histogram of per-user inter-event burstiness classes
        (ops/retention.py burstiness_classes): squared coefficient of
        variation of gap seconds in exact ppm, bucketed regular /
        poisson / bursty / degenerate — the bot-cadence screen."""
        from ocr_service_ray.ops.retention import burstiness_classes

        return burstiness_classes(_read(sf_dir, "events", ["user_id", "ts"]))

    def q_daily_mix_drift(sf_dir):
        """Total-variation distance of each DAY's event-type mix vs
        the corpus mix (ops/divergence.py tv_distance_by_group over a
        derived day column): the daily composition-drift monitor —
        same exact single-division ppm as lang_tv_by_source."""
        from ocr_service_ray.ops.divergence import tv_distance_by_group

        ev = _read(sf_dir, "events", ["event_type", "ts"])

        def prep(b: pa.Table) -> pa.Table:
            day = (
                b["ts"].to_pandas().values.astype("datetime64[D]").astype(np.int64)
            )
            return pa.table(
                {"day": pa.array(day), "event_type": b["event_type"]}
            )

        return tv_distance_by_group(
            ev.map_batches(prep, batch_format="pyarrow"), "day", "event_type"
        )

    # --------------------------- wave 23: window-SQL surface closure

    def q_orders_ntile_revenue(sf_dir):
        """NTILE(4) revenue quartiles per order priority (ops/
        window.py grouped_ntile_agg): exact SQL NTILE fill (first n%k
        tiles one row bigger) over the unique (cents, orderkey) sort,
        folded to per-tile row counts + cents sums — the quartile
        revenue report."""
        from ocr_service_ray.ops.window import grouped_ntile_agg

        od = _read(
            sf_dir, "orders", ["o_orderpriority", "o_totalprice", "o_orderkey"]
        )

        def prep(b: pa.Table) -> pa.Table:
            cents = np.floor(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "o_orderpriority": b["o_orderpriority"],
                    "cents": pa.array(cents),
                    "o_orderkey": b["o_orderkey"],
                }
            )

        return grouped_ntile_agg(
            od.map_batches(prep, batch_format="pyarrow"),
            "o_orderpriority",
            ["cents", "o_orderkey"],
            n_tiles=4,
            agg_specs={"n_rows": (None, "count"), "cents_sum": ("cents", "sum")},
        )

    def q_topk_with_ties_orders(sf_dir):
        """RANK() <= 3 top order prices per priority INCLUDING ties
        (ops/relational.py topk_with_ties): block-local top-k finds
        the per-group threshold, one filtered pass + combiner keeps
        the tie multiplicity — the WITH TIES variant grouped_topk
        cannot express."""
        from ocr_service_ray.ops.relational import topk_with_ties

        od = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

        def prep(b: pa.Table) -> pa.Table:
            cents = np.floor(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "o_orderpriority": b["o_orderpriority"],
                    "cents": pa.array(cents),
                }
            )

        return topk_with_ties(
            od.map_batches(prep, batch_format="pyarrow"),
            ["o_orderpriority"],
            "cents",
            3,
        )

    def q_unpivot_roundtrip(sf_dir):
        """Pivot → UNPIVOT round-trip: the per-user conditional-
        aggregation pivot (ops/agg.py pivot_counts) melts back to
        (event_type, n) via a vectorized stack and must reproduce the
        plain GROUP BY counts — the melt/unpivot shape plus a
        conservation proof in one query."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg, pivot_counts

        types = ["click", "error", "purchase", "signup", "view"]
        ev = _read(sf_dir, "events", ["user_id", "event_type"])
        wide = pivot_counts(ev, "user_id", "event_type", types)

        def melt(b: pd.DataFrame) -> pd.DataFrame:
            long = b.melt(
                id_vars=["user_id"],
                value_vars=[f"{t}_cnt" for t in types],
                var_name="event_type",
                value_name="n",
            )
            long["event_type"] = long["event_type"].str.removesuffix("_cnt")
            return long[["event_type", "n"]]

        out = grouped_agg(
            wide.map_batches(melt, batch_format="pandas"),
            ["event_type"],
            {"n": ("n", "sum")},
        )
        return out.map_batches(
            lambda b: b.astype({"n": "int64"}), batch_format="pandas"
        )

    def q_first_last_matrix(sf_dir):
        """First-touch × last-touch event-type attribution matrix with
        per-cell user counts and summed activity spans (ops/
        retention.py first_last_matrix): FIRST_VALUE/LAST_VALUE window
        shapes as one bucketed fold in (ts, event_id) order."""
        from ocr_service_ray.ops.retention import first_last_matrix

        return first_last_matrix(
            _read(sf_dir, "events", ["user_id", "ts", "event_type", "event_id"])
        )

    # ------------------------------- wave 24: graph reach + audits

    def q_part_khop_reach(sf_dir):
        """Bounded 2-hop BFS reach from the smallest part key over the
        part co-occurrence graph (ops/graph.py khop_reach): per round
        one hash join + distinct combiner + distributed EXCEPT — the
        blast-radius / related-items frontier count."""
        from ocr_service_ray.ops.agg import global_agg
        from ocr_service_ray.ops.graph import khop_reach

        edges = _part_edges(sf_dir).map_batches(
            lambda b: b.rename_columns(["lo", "hi"]), batch_format="pyarrow"
        )
        li = _read(sf_dir, "lineitem", ["l_partkey"])
        seed = int(global_agg(li, {"lo": ("l_partkey", "min")})["lo"])
        return khop_reach(edges, [seed], hops=2)

    def q_label_dispersion(sf_dir):
        """Per-label intra-class embedding scatter (ops/vector.py
        label_dispersion): mean pairwise squared distance from two
        moment sums — n·Σ||q||² − ||Σq||² on micro-int vectors, no
        pairwise pass, vectors never shuffle. The label-noise /
        cluster-tightness audit."""
        from ocr_service_ray.ops.vector import label_dispersion

        out = label_dispersion(
            _read(sf_dir, "embeddings", ["label", "embedding"]), "label"
        )
        out["label"] = out["label"].astype("int64")
        return out

    def q_monthly_revenue_reconcile(sf_dir):
        """Monthly revenue reconciliation: lineitem net-of-discount
        gross-of-tax cents (joined to orders for the month) vs the
        orders table's own totalprice cents, with the drift as exact
        ppm — the cross-table consistency audit every warehouse runs.
        One hash join on the shared orderkey chain; both sums fold in
        one combiner each."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import join_partitions_for

        li = _read(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_extendedprice", "l_discount", "l_tax"],
        )
        od = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_totalprice"])

        def od_prep(b: pa.Table) -> pa.Table:
            dt = b["o_orderdate"].to_pandas()
            month = (dt.dt.year * 12 + dt.dt.month - 1).to_numpy(np.int64)
            cents = np.floor(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "o_orderkey": b["o_orderkey"],
                    "month": pa.array(month),
                    "o_cents": pa.array(cents),
                }
            )

        odp = od.map_batches(od_prep, batch_format="pyarrow")
        order_side = grouped_agg(
            odp.select_columns(["month", "o_cents"]),
            ["month"],
            {"order_cents": ("o_cents", "sum"), "n_orders": (None, "count")},
        ).to_pandas()

        def li_prep(b: pa.Table) -> pa.Table:
            gross = np.floor(
                b["l_extendedprice"].to_numpy(zero_copy_only=False)
                * (1.0 - b["l_discount"].to_numpy(zero_copy_only=False))
                * (1.0 + b["l_tax"].to_numpy(zero_copy_only=False))
                * 100.0
                + 0.5
            ).astype(np.int64)
            return pa.table(
                {"l_orderkey": b["l_orderkey"], "li_cents": pa.array(gross)}
            )

        lip = li.map_batches(li_prep, batch_format="pyarrow")
        joined = lip.join(
            odp.select_columns(["o_orderkey", "month"]),
            join_type="inner",
            num_partitions=join_partitions_for(lip, odp),
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
        li_side = grouped_agg(
            joined.select_columns(["month", "li_cents"]),
            ["month"],
            {"lineitem_cents": ("li_cents", "sum")},
        ).to_pandas()
        out = order_side.merge(li_side, on="month", how="left")
        out["lineitem_cents"] = out["lineitem_cents"].fillna(0)
        for c in ("month", "order_cents", "n_orders", "lineitem_cents"):
            out[c] = out[c].astype("int64")
        out["drift_ppm"] = [
            (1_000_000 * int(l)) // int(o) if int(o) else 0
            for l, o in zip(out["lineitem_cents"], out["order_cents"])
        ]
        out["drift_ppm"] = out["drift_ppm"].astype("int64")
        return out.sort_values("month").reset_index(drop=True)

    def q_balance_band_pairs(sf_dir):
        """Broadcast band join: customers paired with suppliers whose
        account balance is within ±1.00, counted per customer nation —
        the |a-b| <= eps theta-join done as a sorted broadcast +
        vectorized searchsorted window per batch (suppliers are the
        small side), no shuffle at all."""
        import pyarrow.parquet as _pq

        from ocr_service_ray.ops.agg import grouped_agg

        sup = _pq.read_table(
            f"{sf_dir}/supplier.parquet", columns=["s_acctbal"]
        ).to_pandas()
        s_cents = np.sort(
            np.floor(sup["s_acctbal"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        )
        cu = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])

        def count_band(b: pa.Table) -> pa.Table:
            c_cents = np.floor(
                b["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            lo = np.searchsorted(s_cents, c_cents - 100, side="left")
            hi = np.searchsorted(s_cents, c_cents + 100, side="right")
            return pa.table(
                {
                    "c_nationkey": pc.cast(b["c_nationkey"], pa.int64()),
                    "n_pairs": pa.array(hi - lo),
                }
            )

        out = grouped_agg(
            cu.map_batches(count_band, batch_format="pyarrow"),
            ["c_nationkey"],
            {"n_pairs": ("n_pairs", "sum"), "n_customers": (None, "count")},
        )
        return out.map_batches(
            lambda b: b.astype(
                {"c_nationkey": "int64", "n_pairs": "int64", "n_customers": "int64"}
            ),
            batch_format="pandas",
        )

    # ------------------------- wave 25: hierarchy + ANOVA + Q16-ish

    def q_nation_share_of_region(sf_dir):
        """Hierarchical share-of-parent revenue: customer-nation
        revenue (one hash join chain, cents combiner) with each
        nation's share of its REGION in exact ppm — the region →
        nation drill-down report (first use of the region dimension).
        Both dimension joins broadcast."""
        import pandas as pd
        import pyarrow.parquet as _pq

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import join_partitions_for

        od = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        cu = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
        oc = od.join(
            cu,
            join_type="inner",
            num_partitions=join_partitions_for(od, cu),
            on=("o_custkey",),
            right_on=("c_custkey",),
        )
        nat = _pq.read_table(
            f"{sf_dir}/nation.parquet",
            columns=["n_nationkey", "n_name", "n_regionkey"],
        ).to_pandas()
        reg = _pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
        n2name = dict(zip(nat["n_nationkey"], nat["n_name"]))
        n2reg = dict(
            zip(
                nat["n_nationkey"],
                nat["n_regionkey"].map(
                    dict(zip(reg["r_regionkey"], reg["r_name"]))
                ),
            )
        )

        def tag(b: pd.DataFrame) -> pd.DataFrame:
            cents = np.floor(
                b["o_totalprice"].to_numpy() * 100.0 + 0.5
            ).astype(np.int64)
            return pd.DataFrame(
                {
                    "r_name": b["c_nationkey"].map(n2reg),
                    "n_name": b["c_nationkey"].map(n2name),
                    "cents": cents,
                }
            )

        per_nation = grouped_agg(
            oc.map_batches(tag, batch_format="pandas"),
            ["r_name", "n_name"],
            {"revenue_cents": ("cents", "sum")},
        ).to_pandas()
        per_region = (
            per_nation.groupby("r_name")["revenue_cents"].sum().to_dict()
        )
        per_nation["share_ppm"] = [
            (1_000_000 * int(c)) // int(per_region[r])
            for r, c in zip(per_nation["r_name"], per_nation["revenue_cents"])
        ]
        per_nation["revenue_cents"] = per_nation["revenue_cents"].astype("int64")
        per_nation["share_ppm"] = per_nation["share_ppm"].astype("int64")
        return per_nation.sort_values(["r_name", "n_name"]).reset_index(
            drop=True
        )

    def q_sentence_stats_by_lang(sf_dir):
        """Per-language sentence statistics: sentence-terminator runs
        ([.!?]+, the shared RE2 pattern) and words, folded to mean
        words-per-sentence in exact milli — the prose-shape profile
        behind readability filters. One combiner; zero shuffle of
        text."""
        from ocr_service_ray.ops.agg import grouped_agg

        docs = _read(sf_dir, "documents", ["lang", "text"])

        def counts(b: pa.Table) -> pa.Table:
            n_sent = pc.cast(
                pc.count_substring_regex(b["text"], r"[.!?]+"), pa.int64()
            )
            n_words = pc.cast(
                pc.count_substring_regex(b["text"], r"\S+"), pa.int64()
            )
            return pa.table(
                {"lang": b["lang"], "n_sent": n_sent, "n_words": n_words}
            )

        agg = grouped_agg(
            docs.map_batches(counts, batch_format="pyarrow"),
            ["lang"],
            {
                "n_docs": (None, "count"),
                "n_sentences": ("n_sent", "sum"),
                "n_words": ("n_words", "sum"),
            },
        )

        def close(b: pd.DataFrame) -> pd.DataFrame:
            for c in ("n_docs", "n_sentences", "n_words"):
                b[c] = b[c].astype("int64")
            b["words_per_sent_milli"] = (
                1000 * b["n_words"] // b["n_sentences"].clip(lower=1)
            ).astype("int64")
            return b

        return agg.map_batches(close, batch_format="pandas")

    def q_price_anova_eta2(sf_dir):
        """One-way ANOVA effect size (eta² = SSB/SST, exact ppm) of
        lineitem price DOLLARS across return flags — "does the flag
        explain price variance?" — from per-group integer moment sums
        only. Exactness trick: scale SSB and SST by N·Π n_g (their
        ratio is unchanged and both become integers — P/n_g divides
        exactly), one floor division closes. One combiner exchange."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        li = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])

        def prep(b: pa.Table) -> pa.Table:
            dollars = np.floor(
                b["l_extendedprice"].to_numpy(zero_copy_only=False)
            ).astype(np.int64)
            return pa.table(
                {
                    "l_returnflag": b["l_returnflag"],
                    "d": pa.array(dollars),
                    "d2": pa.array(dollars * dollars),
                }
            )

        m = grouped_agg(
            li.map_batches(prep, batch_format="pyarrow"),
            ["l_returnflag"],
            {"n": (None, "count"), "s": ("d", "sum"), "s2": ("d2", "sum")},
        ).to_pandas()
        ns = [int(v) for v in m["n"]]
        ss = [int(v) for v in m["s"]]
        s2s = [int(v) for v in m["s2"]]
        n_tot, s_tot, s2_tot = sum(ns), sum(ss), sum(s2s)
        prod = 1
        for v in ns:
            prod *= v
        ssb_scaled = sum(
            sg * sg * n_tot * (prod // ng) for sg, ng in zip(ss, ns)
        ) - prod * s_tot * s_tot
        sst_scaled = prod * (n_tot * s2_tot - s_tot * s_tot)
        eta2 = 0 if sst_scaled == 0 else (1_000_000 * ssb_scaled) // sst_scaled
        return pd.DataFrame(
            {
                "n_groups": pd.array([len(ns)], dtype="int64"),
                "n_rows": pd.array([n_tot], dtype="int64"),
                "eta2_ppm": pd.array([eta2], dtype="int64"),
            }
        )

    def q_brand_supplier_counts(sf_dir):
        """TPC-H-Q16-shaped distinct supplier counts per (brand, type)
        via the lineitem link: part dims broadcast onto the fact scan,
        then exact COUNT(DISTINCT suppkey) per combo through the
        two-combiner distinct-pair fold (ops/agg.py
        grouped_distinct_count) — no row-level fact shuffle."""
        import pandas as pd
        import pyarrow.parquet as _pq

        from ocr_service_ray.ops.agg import grouped_distinct_count

        li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
        part = _pq.read_table(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_type"]
        ).to_pandas()
        p2b = dict(zip(part["p_partkey"], part["p_brand"]))
        p2t = dict(zip(part["p_partkey"], part["p_type"]))

        def tag(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "p_brand": b["l_partkey"].map(p2b),
                    "p_type": b["l_partkey"].map(p2t),
                    "l_suppkey": b["l_suppkey"],
                }
            )

        out = grouped_distinct_count(
            li.map_batches(tag, batch_format="pandas"),
            ["p_brand", "p_type"],
            "l_suppkey",
        )
        return out.map_batches(
            lambda b: b.astype({"n_distinct": "int64"}), batch_format="pandas"
        )

    # --------------------------- wave 26: whales + exact-dup closure

    def q_revenue_whale_share(sf_dir):
        """Revenue share of each nation's top 10% customers by spend
        (ops/divergence.py weighted_top_share_by_group): the
        value-weighted Lorenz point — order cents fold to per-customer
        sums in one combiner, nations attach by broadcast, one
        bucketed fold ranks by spend."""
        import pandas as pd
        import pyarrow.parquet as _pq

        from ocr_service_ray.ops.divergence import weighted_top_share_by_group

        od = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])
        cu = _pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
        ).to_pandas()
        c2n = dict(zip(cu["c_custkey"], cu["c_nationkey"]))

        def prep(b: pd.DataFrame) -> pd.DataFrame:
            cents = np.floor(
                b["o_totalprice"].to_numpy() * 100.0 + 0.5
            ).astype(np.int64)
            return pd.DataFrame(
                {
                    "nationkey": b["o_custkey"].map(c2n).astype("int64"),
                    "custkey": b["o_custkey"],
                    "cents": cents,
                }
            )

        return weighted_top_share_by_group(
            od.map_batches(prep, batch_format="pandas"),
            "nationkey",
            "custkey",
            "cents",
            top_pct=10,
        )

    def q_brand_return_ztest(sf_dir):
        """Per-brand return-rate two-proportion z² vs the rest of the
        corpus (ops/stats.py grouped_rate_ztest over a broadcast part
        dimension): which brands return significantly more — the
        slice-regression alarm pointed at merchandising."""
        import pandas as pd
        import pyarrow.parquet as _pq

        from ocr_service_ray.ops.stats import grouped_rate_ztest

        li = _read(sf_dir, "lineitem", ["l_partkey", "l_returnflag"])
        part = _pq.read_table(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
        ).to_pandas()
        p2b = dict(zip(part["p_partkey"], part["p_brand"]))

        def prep(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "p_brand": b["l_partkey"].map(p2b),
                    "is_return": (b["l_returnflag"] == "R").astype("int64"),
                }
            )

        out = grouped_rate_ztest(
            li.map_batches(prep, batch_format="pandas"), "p_brand", "is_return"
        )
        return out.rename(columns={"n_docs": "n_rows", "n_pass": "n_returns"})

    def q_exact_dup_components(sf_dir):
        """Cluster-size histogram of the EXACT near-dup graph: the
        PPJoin Jaccard self-join (>= 0.5) feeds connected components
        (ops/graph.py), component sizes fold to (size, n_clusters) —
        the zero-false-negative closure of the dedup pipeline
        (pairs → clusters → survivor math)."""
        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.graph import connected_components
        from ocr_service_ray.ops.similarity import jaccard_pair_join

        pairs = jaccard_pair_join(
            _read(sf_dir, "documents", ["doc_id", "text"]),
            "doc_id",
            "text",
            ngram=3,
            threshold_ppm=500_000,
        )
        labels = connected_components(pairs)
        sizes = grouped_agg(
            labels.select_columns(["cluster_id"]),
            ["cluster_id"],
            {"cluster_size": (None, "count")},
        )
        hist = grouped_agg(
            sizes.select_columns(["cluster_size"]),
            ["cluster_size"],
            {"n_clusters": (None, "count")},
        )
        return hist.map_batches(
            lambda b: b.astype({"cluster_size": "int64", "n_clusters": "int64"}),
            batch_format="pandas",
        )

    # ----------------------------- wave 27: churn + complement joins

    def q_churned_customers_1995(sf_dir):
        """EXISTS/NOT-EXISTS combo: customers with >= 1 order in 1995
        and none in 1996, counted per market segment — the churn
        cohort. One combiner collapses orders to per-customer
        (n_1995, n_1996) flags; the segment dimension broadcasts; a
        second combiner closes. No row-level semi/anti join shuffles."""
        import datetime as _dt

        import pandas as pd
        import pyarrow.parquet as _pq

        from ocr_service_ray.ops.agg import grouped_agg

        od = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])

        def flags(b: pa.Table) -> pa.Table:
            y = b["o_orderdate"].to_pandas().dt.year.to_numpy()
            return pa.table(
                {
                    "o_custkey": b["o_custkey"],
                    "in95": pa.array((y == 1995).astype(np.int64)),
                    "in96": pa.array((y == 1996).astype(np.int64)),
                }
            )

        per_cust = grouped_agg(
            od.map_batches(flags, batch_format="pyarrow"),
            ["o_custkey"],
            {"n95": ("in95", "sum"), "n96": ("in96", "sum")},
        )
        seg = _pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
        ).to_pandas()
        c2s = dict(zip(seg["c_custkey"], seg["c_mktsegment"]))

        def churn(b: pd.DataFrame) -> pd.DataFrame:
            keep = b[(b["n95"] > 0) & (b["n96"] == 0)]
            return pd.DataFrame(
                {"c_mktsegment": keep["o_custkey"].map(c2s)}
            )

        out = grouped_agg(
            per_cust.map_batches(churn, batch_format="pandas"),
            ["c_mktsegment"],
            {"n_churned": (None, "count")},
        )
        return out.map_batches(
            lambda b: b.astype({"n_churned": "int64"}), batch_format="pandas"
        )

    def q_median_split_priorities(sf_dir):
        """Median-split contingency: orders above vs at-or-below the
        GLOBAL median price, counted per priority — the exact global
        quantile (ops/sketch.py value_counts_quantiles) broadcast back
        into a one-pass conditional aggregate. Quantile-then-compare
        without a second full sort."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.sketch import value_counts_quantiles

        od = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

        def to_cents(b: pa.Table) -> pa.Table:
            cents = np.floor(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {"o_orderpriority": b["o_orderpriority"], "cents": pa.array(cents)}
            )

        cents_ds = od.map_batches(to_cents, batch_format="pyarrow")
        med = int(
            value_counts_quantiles(cents_ds, "cents", [0.5])["value"].iloc[0]
        )

        def split(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "o_orderpriority": b["o_orderpriority"],
                    "above": (b["cents"] > med).astype("int64"),
                }
            )

        out = grouped_agg(
            cents_ds.map_batches(split, batch_format="pandas"),
            ["o_orderpriority"],
            {"n_total": (None, "count"), "n_above": ("above", "sum")},
        )
        return out.map_batches(
            lambda b: b.astype({"n_total": "int64", "n_above": "int64"}),
            batch_format="pandas",
        )

    def q_parts_never_ordered(sf_dir):
        """Dimension-complement anti join: parts NEVER ordered in bulk
        (no lineitem with quantity >= 45), counted per brand — the
        slow-mover report. The bulk-ordered key set collapses in one
        combiner and broadcasts (ops/relational.py
        broadcast_anti_join); the part scan never shuffles."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import (
            broadcast_anti_join,
            distinct_values,
        )

        li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"]).map_batches(
            lambda b: b.filter(
                pc.greater_equal(b["l_quantity"], 45)
            ).select(["l_partkey"]),
            batch_format="pyarrow",
        )
        ordered = distinct_values(li, "l_partkey")
        part = _read(sf_dir, "part", ["p_partkey", "p_brand"])
        never = broadcast_anti_join(part, ordered, on="p_partkey")
        out = grouped_agg(never, ["p_brand"], {"n_parts": (None, "count")})
        return out.map_batches(
            lambda b: b.astype({"n_parts": "int64"}), batch_format="pandas"
        )

    # ------------------------- wave 28: rank statistics + cohorts

    def q_spearman_balance_activity(sf_dir):
        """EXACT Spearman rank correlation between customer account
        balance and order activity, as signed r² ppm: both variables
        rank through ops/scan.py global_rank with the custkey
        tie-break (identical on both engines), the Pearson moments of
        the two integer rank columns fold in one combiner, one bigint
        close. The monotone-association test without sqrt or floats."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import hash_join
        from ocr_service_ray.ops.scan import global_rank

        cu = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])

        def bal_cents(b: pa.Table) -> pa.Table:
            cents = np.floor(
                b["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {"c_custkey": b["c_custkey"], "bal": pa.array(cents)}
            )

        od = _read(sf_dir, "orders", ["o_custkey"])
        counts = grouped_agg(
            od, ["o_custkey"], {"n_orders": (None, "count")}
        ).map_batches(
            lambda b: b.rename_columns(
                ["c_custkey" if c == "o_custkey" else c for c in b.column_names]
            ),
            batch_format="pyarrow",
        )
        # customers with no orders count as 0 — left join onto the spine
        joined = hash_join(
            cu.map_batches(bal_cents, batch_format="pyarrow"),
            counts.repartition(4),
            on="c_custkey",
            join_type="left_outer",
        ).map_batches(
            lambda b: pd.DataFrame(
                {
                    "c_custkey": b["c_custkey"],
                    "bal": b["bal"],
                    "n_orders": b["n_orders"].fillna(0).astype("int64"),
                }
            ),
            batch_format="pandas",
        )
        r1 = global_rank(
            joined.select_columns(["c_custkey", "bal"]), ["bal", "c_custkey"]
        ).map_batches(
            lambda b: pa.table(
                {"c_custkey": b["c_custkey"], "rx": pc.add(b["rank"], 1)}
            ),
            batch_format="pyarrow",
        )
        r2 = global_rank(
            joined.select_columns(["c_custkey", "n_orders"]),
            ["n_orders", "c_custkey"],
        ).map_batches(
            lambda b: pa.table(
                {"c_custkey": b["c_custkey"], "ry": pc.add(b["rank"], 1)}
            ),
            batch_format="pyarrow",
        )
        both = hash_join(r1.repartition(4), r2.repartition(4), on="c_custkey")

        def moments(b: pd.DataFrame) -> pd.DataFrame:
            x = b["rx"].to_numpy(dtype=np.int64)
            y = b["ry"].to_numpy(dtype=np.int64)
            return pd.DataFrame(
                {
                    "n": [len(x)],
                    "sx": [int(x.sum())],
                    "sy": [int(y.sum())],
                    "sxx": [int((x * x).sum())],
                    "syy": [int((y * y).sum())],
                    "sxy": [int((x * y).sum())],
                }
            )

        m = (
            both.map_batches(moments, batch_format="pandas")
            .to_pandas()
            .sum()
        )
        n, sx, sy = int(m["n"]), int(m["sx"]), int(m["sy"])
        sxx, syy, sxy = int(m["sxx"]), int(m["syy"]), int(m["sxy"])
        num = n * sxy - sx * sy
        den = (n * sxx - sx * sx) * (n * syy - sy * sy)
        if den == 0:
            r2v = 0
        else:
            r2v = (1_000_000 * num * num) // den
            if num < 0:
                r2v = -r2v
        return pd.DataFrame(
            {
                "n_customers": pd.array([n], dtype="int64"),
                "spearman2_ppm": pd.array([r2v], dtype="int64"),
            }
        )

    def q_decile_migration(sf_dir):
        """Year-over-year revenue-decile migration matrix: each
        customer's 1995 spend decile vs their 1996 decile (deciles by
        global_rank over (cents, custkey) within each year's
        population; customers active both years only) — the rank-
        mobility report. Two sorts + one key join; the matrix is
        10x10 bounded."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import hash_join
        from ocr_service_ray.ops.scan import global_rank

        od = _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

        def year_cents(b: pa.Table) -> pa.Table:
            y = b["o_orderdate"].to_pandas().dt.year.to_numpy()
            cents = np.floor(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            keep = (y == 1995) | (y == 1996)
            return pa.table(
                {
                    "o_custkey": pa.array(
                        b["o_custkey"].to_numpy(zero_copy_only=False)[keep]
                    ),
                    "year": pa.array(y[keep].astype(np.int64)),
                    "cents": pa.array(cents[keep]),
                }
            )

        spend = grouped_agg(
            od.map_batches(year_cents, batch_format="pyarrow"),
            ["o_custkey", "year"],
            {"cents": ("cents", "sum")},
        ).materialize()

        def decile_of(year):
            sub = spend.map_batches(
                lambda b, yr=year: b.filter(pc.equal(b["year"], yr)).select(
                    ["o_custkey", "cents"]
                ),
                batch_format="pyarrow",
            )
            n = sub.count()
            ranked = global_rank(sub, ["cents", "o_custkey"])
            return ranked.map_batches(
                lambda b, tot=n: pa.table(
                    {
                        "o_custkey": b["o_custkey"],
                        f"d{year}": pa.array(
                            b["rank"].to_numpy(zero_copy_only=False) * 10 // tot
                        ),
                    }
                ),
                batch_format="pyarrow",
            ).materialize()

        d95 = decile_of(1995)
        d96 = decile_of(1996)
        both = hash_join(d95.repartition(4), d96.repartition(4), on="o_custkey")
        out = grouped_agg(
            both.select_columns(["d1995", "d1996"]),
            ["d1995", "d1996"],
            {"n_customers": (None, "count")},
        )
        return out.map_batches(
            lambda b: b.astype(
                {"d1995": "int64", "d1996": "int64", "n_customers": "int64"}
            ),
            batch_format="pandas",
        )

    def q_weekend_value_ratio(sf_dir):
        """Weekend-vs-weekday mean event value per type as an exact
        cross-multiplied ppm ratio (sum_w * n_d * 1e6 // (n_w *
        sum_d)) — day-of-week = epoch_day mod 7, weekend = days 2,3
        (1970-01-01 is a Thursday: +2 = Saturday, +3 = Sunday). One
        combiner; no floats."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

        def prep(b: pa.Table) -> pa.Table:
            day = (
                b["ts"].to_pandas().values.astype("datetime64[D]").astype(np.int64)
            )
            wk = ((day % 7 == 2) | (day % 7 == 3)).astype(np.int64)
            cents = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "event_type": b["event_type"],
                    "is_weekend": pa.array(wk),
                    "cents": pa.array(cents),
                    "wk_cents": pa.array(wk * cents),
                }
            )

        agg = grouped_agg(
            ev.map_batches(prep, batch_format="pyarrow"),
            ["event_type"],
            {
                "n_total": (None, "count"),
                "n_weekend": ("is_weekend", "sum"),
                "sum_cents": ("cents", "sum"),
                "sum_wk_cents": ("wk_cents", "sum"),
            },
        ).to_pandas()
        rows = []
        for _, r in agg.iterrows():
            nt, nw = int(r["n_total"]), int(r["n_weekend"])
            st, sw = int(r["sum_cents"]), int(r["sum_wk_cents"])
            nd, sd = nt - nw, st - sw
            ratio = (
                (1_000_000 * sw * nd) // (nw * sd)
                if nw > 0 and sd > 0
                else 0
            )
            rows.append(
                {
                    "event_type": r["event_type"],
                    "n_weekend": nw,
                    "n_weekday": nd,
                    "ratio_ppm": ratio,
                }
            )
        out = pd.DataFrame(rows)
        for c in ("n_weekend", "n_weekday", "ratio_ppm"):
            out[c] = out[c].astype("int64")
        return out.sort_values("event_type").reset_index(drop=True)

    # ------------------------ wave 29: sweep-line + leakage matrix

    def q_peak_concurrent_sessions(sf_dir):
        """Maximum simultaneous 30-min-gap sessions (ops/intervals.py
        peak_concurrency): the sweep-line classic — boundary deltas,
        one combiner merge, distributed sort + two-phase prefix scan,
        global max. Capacity planning's favorite number."""
        import pandas as pd

        from ocr_service_ray.ops.intervals import (
            peak_concurrency,
            session_intervals,
        )

        si = session_intervals(
            _read(sf_dir, "events", ["user_id", "ts"])
        )
        out = peak_concurrency(si)
        return pd.DataFrame(
            {
                "n_sessions": pd.array([out["n_intervals"]], dtype="int64"),
                "peak_concurrent": pd.array(
                    [out["peak_concurrent"]], dtype="int64"
                ),
            }
        )

    def q_dup_leakage_matrix(sf_dir):
        """Cross-source near-dup leakage matrix: every exact PPJoin
        pair (Jaccard >= 0.5) attributed to its UNORDERED source pair
        via a broadcast doc→source map — which sources share content,
        the contamination-direction report."""
        import pandas as pd
        import pyarrow.parquet as _pq

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.similarity import jaccard_pair_join

        pairs = jaccard_pair_join(
            _read(sf_dir, "documents", ["doc_id", "text"]),
            "doc_id",
            "text",
            ngram=3,
            threshold_ppm=500_000,
        )
        docs = _pq.read_table(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "source"]
        ).to_pandas()
        d2s = dict(zip(docs["doc_id"], docs["source"]))

        def attribute(b: pd.DataFrame) -> pd.DataFrame:
            sa = b["id_a"].map(d2s)
            sb = b["id_b"].map(d2s)
            lo = np.minimum(sa, sb)
            hi = np.maximum(sa, sb)
            return pd.DataFrame({"source_a": lo, "source_b": hi})

        out = grouped_agg(
            pairs.map_batches(attribute, batch_format="pandas"),
            ["source_a", "source_b"],
            {"n_pairs": (None, "count")},
        )
        return out.map_batches(
            lambda b: b.astype({"n_pairs": "int64"}), batch_format="pandas"
        )

    def q_activity_decile_conversion(sf_dir):
        """Purchase-conversion rate by user-activity decile: users
        ranked by (event count, user_id) through global_rank, bucketed
        into exact deciles, each decile's share of users with >= 1
        purchase in exact ppm — does raw activity predict conversion?"""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import hash_join
        from ocr_service_ray.ops.scan import global_rank

        ev = _read(sf_dir, "events", ["user_id", "event_type"])

        def flags(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "user_id": b["user_id"],
                    "is_purchase": pc.cast(
                        pc.equal(b["event_type"], "purchase"), pa.int64()
                    ),
                }
            )

        per_user = grouped_agg(
            ev.map_batches(flags, batch_format="pyarrow"),
            ["user_id"],
            {"n_events": (None, "count"), "n_purch": ("is_purchase", "sum")},
        ).materialize()
        n_users = per_user.count()
        ranked = global_rank(
            per_user.select_columns(["user_id", "n_events"]),
            ["n_events", "user_id"],
        )
        deciled = ranked.map_batches(
            lambda b, tot=n_users: pa.table(
                {
                    "user_id": b["user_id"],
                    "decile": pa.array(
                        b["rank"].to_numpy(zero_copy_only=False) * 10 // tot
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        joined = hash_join(
            deciled.repartition(4),
            per_user.select_columns(["user_id", "n_purch"]).repartition(4),
            on="user_id",
        )

        def conv(b: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "decile": b["decile"],
                    "converted": (b["n_purch"] > 0).astype("int64"),
                }
            )

        agg = grouped_agg(
            joined.map_batches(conv, batch_format="pandas"),
            ["decile"],
            {"n_users": (None, "count"), "n_converted": ("converted", "sum")},
        )

        def close(b: pd.DataFrame) -> pd.DataFrame:
            b = b.astype(
                {"decile": "int64", "n_users": "int64", "n_converted": "int64"}
            )
            b["conv_ppm"] = (1_000_000 * b["n_converted"]) // b["n_users"]
            return b

        return agg.map_batches(close, batch_format="pandas")

    # ----------------------- wave 30: LTV cohorts + distinctive terms

    def q_cohort_revenue_matrix(sf_dir):
        """Customer-cohort revenue matrix: customers cohorted by the
        integer month (year*12+month-1) of their FIRST order, cell
        (cohort_month, offset_months) = total cents that cohort spent
        that many months later — the LTV triangle. One bucketed key
        shuffle on the customer; the in-group fold pins the cohort and
        emits per-month partials; one combiner closes."""
        import pandas as pd

        from ocr_service_ray.ops.agg import bucketed_map_groups, grouped_agg

        od = _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_totalprice"])

        def prep(b: pa.Table) -> pa.Table:
            dt = b["o_orderdate"].to_pandas()
            month = (dt.dt.year * 12 + dt.dt.month - 1).to_numpy(np.int64)
            cents = np.floor(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "o_custkey": b["o_custkey"],
                    "month": pa.array(month),
                    "cents": pa.array(cents),
                }
            )

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            cohort = int(g["month"].min())
            per = g.groupby("month")["cents"].sum()
            return pd.DataFrame(
                {
                    "cohort_month": np.int64(cohort),
                    "offset_months": (per.index.to_numpy() - cohort).astype(
                        np.int64
                    ),
                    "cents": per.to_numpy(),
                }
            )

        per_cell = bucketed_map_groups(
            od.map_batches(prep, batch_format="pyarrow"),
            ["o_custkey"],
            fold,
        )
        out = grouped_agg(
            per_cell,
            ["cohort_month", "offset_months"],
            {"revenue_cents": ("cents", "sum")},
        )
        return out.map_batches(
            lambda b: b.astype(
                {
                    "cohort_month": "int64",
                    "offset_months": "int64",
                    "revenue_cents": "int64",
                }
            ),
            batch_format="pandas",
        )

    def q_distinctive_terms(sf_dir):
        """Top-3 overrepresented words per source by the exact
        cross-multiplied rate ratio (c_sw * N_total * 1e6) //
        (N_source * c_word) — the log-free tf-idf-flavored
        slice-signature report; ties break on the word. One combiner
        to (source, word) counts; the ratio close runs on the
        vocabulary-bounded driver frame."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        docs = _read(sf_dir, "documents", ["source", "text"])

        def explode(batch: pa.Table) -> pa.Table:
            from collections import Counter

            counts: Counter = Counter()
            for g, t in zip(
                batch["source"].to_pylist(), batch["text"].to_pylist()
            ):
                for w in (t or "").split():
                    counts[(g, w)] += 1
            gs = [g for g, _ in counts]
            ws = [w for _, w in counts]
            cs = [counts[k] for k in counts]
            return pa.table(
                {
                    "source": pa.array(gs, batch["source"].type),
                    "word": pa.array(ws, pa.string()),
                    "c": pa.array(cs, pa.int64()),
                }
            )

        pairs = grouped_agg(
            docs.map_batches(explode, batch_format="pyarrow"),
            ["source", "word"],
            {"c": ("c", "sum")},
        ).to_pandas()
        word_tot = pairs.groupby("word")["c"].sum().to_dict()
        src_tot = pairs.groupby("source")["c"].sum().to_dict()
        n_total = int(sum(word_tot.values()))
        pairs["ratio_ppm"] = [
            (int(c) * n_total * 1_000_000)
            // (int(src_tot[s]) * int(word_tot[w]))
            for s, w, c in zip(pairs["source"], pairs["word"], pairs["c"])
        ]
        pairs = pairs.sort_values(
            ["source", "ratio_ppm", "word"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        out = pairs.groupby("source").head(3).reset_index(drop=True)
        out["c"] = out["c"].astype("int64")
        out["ratio_ppm"] = out["ratio_ppm"].astype("int64")
        return out[["source", "word", "c", "ratio_ppm"]]

    def q_session_depth_survival(sf_dir):
        """Session-depth survival curve: for k = 1..5, how many 30-min
        sessions reach >= k events and the share in exact ppm — the
        engagement funnel beneath bounce rate. Session sizes come from
        one bucketed key fold; the k-expansion is a 5x flat map of the
        span-bounded size histogram."""
        import pandas as pd

        from ocr_service_ray.ops.agg import bucketed_map_groups, grouped_agg

        ev = _read(sf_dir, "events", ["user_id", "ts"])

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            t = np.sort(
                pd.DatetimeIndex(g["ts"]).values.astype("datetime64[us]").astype(np.int64)
            )
            brk = np.zeros(len(t), dtype=np.int64)
            brk[1:] = (np.diff(t) > 1_800_000_000).astype(np.int64)
            sid = np.cumsum(brk)
            sizes = np.bincount(sid)
            return pd.DataFrame({"ssize": sizes[sizes > 0].astype(np.int64)})

        sizes = bucketed_map_groups(
            ev.select_columns(["user_id", "ts"]), ["user_id"], fold
        )
        hist = grouped_agg(
            sizes, ["ssize"], {"n_sessions": (None, "count")}
        ).to_pandas()
        total = int(hist["n_sessions"].sum())
        rows = []
        for k in range(1, 6):
            ge = int(hist.loc[hist["ssize"] >= k, "n_sessions"].sum())
            rows.append(
                {
                    "k": k,
                    "n_ge_k": ge,
                    "share_ppm": (1_000_000 * ge) // total if total else 0,
                }
            )
        out = pd.DataFrame(rows)
        for c in ("k", "n_ge_k", "share_ppm"):
            out[c] = out[c].astype("int64")
        return out

    # -- wave 31: TPC-H relational fill (Q3/Q4/Q14/Q18 shapes) --------

    def q3_shipping_priority(sf_dir):
        """TPC-H Q3 shape (ref has no analytic SQL layer — this is the
        scale-side join discipline demo): lineitem revenue is
        pre-aggregated to per-orderkey cents by the COMBINER before
        any join (partials shuffle, raw lineitem rows never do), then
        one hash join to date-filtered orders x segment-filtered
        customers, then the block-local top-k — no full sort."""
        import datetime as _dt

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import join_partitions_for, topk

        cutoff = _dt.datetime(1996, 6, 1)

        li = _read(
            sf_dir, "lineitem", ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"]
        )

        def li_prep(b: pa.Table) -> pa.Table:
            b = b.filter(pc.greater(b["l_shipdate"], pa.scalar(cutoff)))
            ep = b["l_extendedprice"].to_numpy(zero_copy_only=False)
            dc = b["l_discount"].to_numpy(zero_copy_only=False)
            cents = np.floor(ep * (1.0 - dc) * 100.0 + 0.5).astype(np.int64)
            return pa.table(
                {"l_orderkey": b["l_orderkey"], "cents": pa.array(cents)}
            )

        rev = grouped_agg(
            li.map_batches(li_prep, batch_format="pyarrow"),
            ["l_orderkey"],
            {"revenue_cents": ("cents", "sum")},
        )

        od = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

        def od_prep(b: pa.Table) -> pa.Table:
            b = b.filter(pc.less(b["o_orderdate"], pa.scalar(cutoff)))
            us = b["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "o_orderkey": b["o_orderkey"],
                    "o_custkey": b["o_custkey"],
                    "o_day": pa.array(us // 86_400_000_000),
                }
            )

        od = od.map_batches(od_prep, batch_format="pyarrow")
        cu = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
        # repartition: the segment filter can leave schema-less
        # zero-row blocks that the acero join rejects on the build
        # side (repo landmine — see ops/ranking.py:177)
        cu = cu.map_batches(
            lambda b: b.filter(
                pc.equal(b["c_mktsegment"], "AUTOMOBILE")
            ).drop_columns(["c_mktsegment"]),
            batch_format="pyarrow",
        ).repartition(2)
        oc = od.join(
            cu,
            join_type="inner",
            num_partitions=join_partitions_for(od, cu),
            on=("o_custkey",),
            right_on=("c_custkey",),
        ).select_columns(["o_orderkey", "o_day"]).repartition(2)
        r = rev.join(
            oc,
            join_type="inner",
            num_partitions=join_partitions_for(rev, oc),
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
        out = topk(
            r.select_columns(["l_orderkey", "o_day", "revenue_cents"]),
            by=["revenue_cents", "l_orderkey"],
            k=10,
            descending=[True, False],
        )
        return out.map_batches(
            lambda b: b.rename(columns={"l_orderkey": "o_orderkey"}).astype(
                {"o_orderkey": "int64", "o_day": "int64", "revenue_cents": "int64"}
            ),
            batch_format="pandas",
        )

    def q4_late_priority_counts(sf_dir):
        """TPC-H Q4 shape with EXISTS folded into a combiner max:
        EXISTS(lineitem shipped > orderdate + 30d) == per-order
        max(shipdate) > orderdate + 30d, so lineitem collapses to one
        int per orderkey BEFORE the join — the semi-join never moves
        raw lineitem rows."""
        import datetime as _dt

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import join_partitions_for

        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

        def li_prep(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "l_orderkey": b["l_orderkey"],
                    "ship_us": b["l_shipdate"].cast(pa.int64()),
                }
            )

        mx = grouped_agg(
            li.map_batches(li_prep, batch_format="pyarrow"),
            ["l_orderkey"],
            {"max_ship_us": ("ship_us", "max")},
        )

        lo, hi = _dt.datetime(1996, 1, 1), _dt.datetime(1997, 1, 1)
        od = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])

        def od_prep(b: pa.Table) -> pa.Table:
            keep = pc.and_(
                pc.greater_equal(b["o_orderdate"], pa.scalar(lo)),
                pc.less(b["o_orderdate"], pa.scalar(hi)),
            )
            b = b.filter(keep)
            return pa.table(
                {
                    "o_orderkey": b["o_orderkey"],
                    "o_us": b["o_orderdate"].cast(pa.int64()),
                    "o_orderpriority": b["o_orderpriority"],
                }
            )

        od = od.map_batches(od_prep, batch_format="pyarrow")
        j = od.join(
            mx,
            join_type="inner",
            num_partitions=join_partitions_for(od, mx),
            on=("o_orderkey",),
            right_on=("l_orderkey",),
        )

        THIRTY_D_US = 30 * 86_400_000_000

        def late_only(b: pa.Table) -> pa.Table:
            keep = pc.greater(
                b["max_ship_us"], pc.add(b["o_us"], pa.scalar(THIRTY_D_US))
            )
            return b.filter(keep).select(["o_orderpriority"])

        late = j.map_batches(late_only, batch_format="pyarrow")
        out = grouped_agg(late, ["o_orderpriority"], {"n_late": (None, "count")})
        return out.map_batches(
            lambda b: b.astype({"n_late": "int64"}), batch_format="pandas"
        )

    def q14_promo_revenue(sf_dir):
        """TPC-H Q14 shape: promo-revenue share per shipdate month in
        exact ppm. part is the dimension side — broadcast as a
        partkey->is_promo lookup (ray.put once, read per actor), so
        the fact table joins with zero shuffle; per-month cents fold
        in one combiner agg."""
        import datetime as _dt

        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import broadcast_join

        lo, hi = _dt.datetime(1996, 1, 1), _dt.datetime(1997, 1, 1)
        li = _read(
            sf_dir,
            "lineitem",
            ["l_partkey", "l_shipdate", "l_extendedprice", "l_discount"],
        )

        def li_prep(b: pa.Table) -> pa.Table:
            keep = pc.and_(
                pc.greater_equal(b["l_shipdate"], pa.scalar(lo)),
                pc.less(b["l_shipdate"], pa.scalar(hi)),
            )
            b = b.filter(keep)
            dt = b["l_shipdate"].to_pandas()
            ym = (dt.dt.year * 100 + dt.dt.month).to_numpy(np.int64)
            ep = b["l_extendedprice"].to_numpy(zero_copy_only=False)
            dc = b["l_discount"].to_numpy(zero_copy_only=False)
            cents = np.floor(ep * (1.0 - dc) * 100.0 + 0.5).astype(np.int64)
            return pa.table(
                {
                    "l_partkey": b["l_partkey"],
                    "ym": pa.array(ym),
                    "cents": pa.array(cents),
                }
            )

        facts = li.map_batches(li_prep, batch_format="pyarrow")
        part = (
            _read(sf_dir, "part", ["p_partkey", "p_type"])
            .to_pandas()
            .rename(columns={"p_partkey": "l_partkey"})
        )
        part["promo"] = (part["p_type"] == "PROMO").astype(np.int64)
        joined = broadcast_join(facts, part[["l_partkey", "promo"]], on="l_partkey")

        def weigh(b: pa.Table) -> pa.Table:
            cents = b["cents"].to_numpy(zero_copy_only=False)
            promo = b["promo"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "ym": b["ym"],
                    "cents": b["cents"],
                    "promo_cents": pa.array(cents * promo),
                }
            )

        agg = grouped_agg(
            joined.map_batches(weigh, batch_format="pyarrow"),
            ["ym"],
            {
                "total_cents": ("cents", "sum"),
                "promo_cents": ("promo_cents", "sum"),
            },
        ).to_pandas()
        agg["promo_ppm"] = (
            1_000_000 * agg["promo_cents"].astype(np.int64)
        ) // agg["total_cents"].astype(np.int64)
        for c in ("ym", "total_cents", "promo_cents", "promo_ppm"):
            agg[c] = agg[c].astype("int64")
        return agg[["ym", "total_cents", "promo_cents", "promo_ppm"]]

    def q18_big_quantity_orders(sf_dir):
        """TPC-H Q18 shape (large-volume customers): HAVING over a
        per-orderkey combiner sum prunes lineitem to the whale orders
        before anything joins; customer names attach by broadcast."""
        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import (
            broadcast_join,
            join_partitions_for,
            topk,
        )

        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

        def li_prep(b: pa.Table) -> pa.Table:
            q = b["l_quantity"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "l_orderkey": b["l_orderkey"],
                    "qty": pa.array(np.floor(q + 0.5).astype(np.int64)),
                }
            )

        sums = grouped_agg(
            li.map_batches(li_prep, batch_format="pyarrow"),
            ["l_orderkey"],
            {"total_qty": ("qty", "sum")},
        )
        big = sums.map_batches(
            lambda b: b.filter(pc.greater(b["total_qty"], pa.scalar(240))),
            batch_format="pyarrow",
        )
        od = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

        def od_prep(b: pa.Table) -> pa.Table:
            tp = b["o_totalprice"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "o_orderkey": b["o_orderkey"],
                    "o_custkey": b["o_custkey"],
                    "o_cents": pa.array(
                        np.floor(tp * 100.0 + 0.5).astype(np.int64)
                    ),
                }
            )

        od = od.map_batches(od_prep, batch_format="pyarrow")
        j = big.join(
            od,
            join_type="inner",
            num_partitions=join_partitions_for(big, od),
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
        cust = (
            _read(sf_dir, "customer", ["c_custkey", "c_name"])
            .to_pandas()
            .rename(columns={"c_custkey": "o_custkey"})
        )
        named = broadcast_join(j, cust, on="o_custkey")
        out = topk(
            named.select_columns(
                ["l_orderkey", "c_name", "total_qty", "o_cents"]
            ),
            by=["total_qty", "l_orderkey"],
            k=20,
            descending=[True, False],
        )
        return out.map_batches(
            lambda b: b.rename(columns={"l_orderkey": "o_orderkey"}).astype(
                {"o_orderkey": "int64", "total_qty": "int64", "o_cents": "int64"}
            ),
            batch_format="pandas",
        )

    # -- wave 32: markov stationary / TTR curve / SCD2 islands / drawdown

    def q_markov_stationary(sf_dir):
        """Stationary-distribution estimate of the user behavioral
        Markov chain: the transition matrix comes from the distributed
        lag+GROUP BY combiner (ops/window.transition_counts — raw
        events fold per user, only |types|^2 partials shuffle), then
        THREE unrolled integer power-iteration steps run on the
        |types|^2-bounded driver table. All arithmetic is ppm/micro
        integer (per-term floor), so the unrolled-CTE oracle replays
        it bit-exactly."""
        import pandas as pd

        from ocr_service_ray.ops.relational import distinct_values
        from ocr_service_ray.ops.window import transition_counts

        ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
        tc = transition_counts(ev, "user_id", ["ts", "event_id"], "event_type").to_pandas()
        types = sorted(distinct_values(ev, "event_type"))
        k = len(types)
        rowsum = tc.groupby("prev")["n"].sum().to_dict()
        # P in ppm, per-(prev,next) floor — the SQL mirror's exact form
        p = {
            (r["prev"], r["next"]): (1_000_000 * int(r["n"])) // int(rowsum[r["prev"]])
            for _, r in tc.iterrows()
        }
        v = {t: 1_000_000 // k for t in types} if k else {}
        for _ in range(3):
            nxt = {t: 0 for t in types}
            for (a, b), pp in p.items():
                nxt[b] += (v.get(a, 0) * pp) // 1_000_000
            v = nxt
        out = pd.DataFrame(
            {"event_type": types, "v3": [int(v.get(t, 0)) for t in types]}
        )
        out["v3"] = out["v3"].astype("int64")
        return out

    def q_ttr_by_length_decile(sf_dir):
        """Type-token-ratio curve over global document-length deciles
        (lexical diversity vs length — the classic corpus-linguistics
        diagnostic): decile assignment rides ops/sketch.
        percentile_buckets' broadcast CDF (text rides the SAME scan as
        a keep_col — no join), then one (bucket, word) combiner; the
        close runs on the vocabulary-bounded count table."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.sketch import percentile_buckets

        docs = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
        banded = percentile_buckets(docs, "n_chars", 10, ["doc_id", "text"])

        def explode(batch: pa.Table) -> pa.Table:
            from collections import Counter

            counts: Counter = Counter()
            for bk, t in zip(
                batch["bucket"].to_pylist(), batch["text"].to_pylist()
            ):
                for w in (t or "").split():
                    counts[(bk, w)] += 1
            return pa.table(
                {
                    "bucket": pa.array([b for b, _ in counts], pa.int64()),
                    "word": pa.array([w for _, w in counts], pa.string()),
                    "c": pa.array(list(counts.values()), pa.int64()),
                }
            )

        pairs = grouped_agg(
            banded.map_batches(explode, batch_format="pyarrow"),
            ["bucket", "word"],
            {"c": ("c", "sum")},
        ).to_pandas()
        g = pairs.groupby("bucket").agg(
            total_words=("c", "sum"), distinct_words=("c", "size")
        )
        g["ttr_ppm"] = (1_000_000 * g["distinct_words"]) // g["total_words"]
        out = g.reset_index()
        for c in ("bucket", "total_words", "distinct_words", "ttr_ppm"):
            out[c] = out[c].astype("int64")
        return out

    def q_scd2_type_intervals(sf_dir):
        """SCD2-style validity intervals from an event stream
        (gaps-and-islands): per user, consecutive same-type runs in
        (ts, event_id) order become (island_idx, start_us, end_us)
        rows where end_us is the next island's start (-1 open-ended) —
        the dimension-history build. One bucketed key shuffle, numpy
        change-point fold per user, then the block-local top-50 by run
        size."""
        import pandas as pd

        from ocr_service_ray.ops.agg import bucketed_map_groups
        from ocr_service_ray.ops.relational import topk

        ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["ts", "event_id"], kind="stable")
            t = g["event_type"].to_numpy()
            us = (
                pd.DatetimeIndex(g["ts"]).values.astype("datetime64[us]").astype(np.int64)
            )
            brk = np.ones(len(t), dtype=bool)
            brk[1:] = t[1:] != t[:-1]
            starts = np.flatnonzero(brk)
            ends = np.append(starts[1:], len(t))
            nxt_start = np.append(us[starts[1:]], np.int64(-1))
            return pd.DataFrame(
                {
                    "user_id": np.repeat(
                        np.int64(g["user_id"].iloc[0]), len(starts)
                    ),
                    "island_idx": np.arange(1, len(starts) + 1, dtype=np.int64),
                    "event_type": t[starts],
                    "start_us": us[starts],
                    "end_us": nxt_start,
                    "n_events": (ends - starts).astype(np.int64),
                }
            )

        islands = bucketed_map_groups(ev, ["user_id"], fold)
        out = topk(
            islands,
            by=["n_events", "user_id", "island_idx"],
            k=50,
            descending=[True, False, False],
        )
        return out.map_batches(
            lambda b: b.astype(
                {
                    "user_id": "int64",
                    "island_idx": "int64",
                    "start_us": "int64",
                    "end_us": "int64",
                    "n_events": "int64",
                }
            ),
            batch_format="pandas",
        )

    def q_user_net_drawdown(sf_dir):
        """Max drawdown of each user's net-value ledger (purchases
        credit, errors debit, other events neutral): running sum →
        running max → max(peak - cum), the nested-window shape that
        SQL needs two window passes for. Per-user series fold after
        one bucketed key shuffle; top-20 by drawdown closes
        block-locally."""
        import pandas as pd

        from ocr_service_ray.ops.agg import bucketed_map_groups
        from ocr_service_ray.ops.relational import topk

        ev = _read(
            sf_dir, "events", ["event_id", "user_id", "ts", "event_type", "value"]
        )

        def prep(b: pa.Table) -> pa.Table:
            v = b["value"].to_numpy(zero_copy_only=False)
            cents = np.floor(v * 100.0 + 0.5).astype(np.int64)
            ty = b["event_type"].to_pylist()
            sign = np.array(
                [1 if t == "purchase" else (-1 if t == "error" else 0) for t in ty],
                dtype=np.int64,
            )
            return pa.table(
                {
                    "user_id": b["user_id"],
                    "ts": b["ts"],
                    "event_id": b["event_id"],
                    "flow": pa.array(cents * sign),
                }
            )

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["ts", "event_id"], kind="stable")
            cum = g["flow"].to_numpy().cumsum()
            peak = np.maximum.accumulate(cum)
            dd = int((peak - cum).max()) if len(cum) else 0
            return pd.DataFrame(
                {
                    "user_id": [np.int64(g["user_id"].iloc[0])],
                    "drawdown_cents": [np.int64(dd)],
                    "final_cents": [np.int64(cum[-1])],
                }
            )

        per_user = bucketed_map_groups(
            ev.map_batches(prep, batch_format="pyarrow"), ["user_id"], fold
        )
        out = topk(
            per_user,
            by=["drawdown_cents", "user_id"],
            k=20,
            descending=[True, False],
        )
        return out.map_batches(
            lambda b: b.astype(
                {
                    "user_id": "int64",
                    "drawdown_cents": "int64",
                    "final_cents": "int64",
                }
            ),
            batch_format="pandas",
        )

    # -- wave 33: covariance matmul / CMS / skew audit / grouped medians

    def q_embedding_covariance(sf_dir):
        """Upper-triangle Gram (covariance-sum) matrix of the embedding
        table via per-block integer matmul: each block quantizes to
        milli ints and folds to ONE d x d partial (Q^T Q — the
        combiner), so only |blocks| * d^2/2 partial cells shuffle,
        never vectors. Milli scale keeps the global sums inside int64
        out to ~10^12 rows (|q| <= 578 here -> cell products < 2^19)."""
        from ocr_service_ray.ops.agg import grouped_agg

        emb = _read(sf_dir, "embeddings", ["embedding"])

        def partial(b: pa.Table) -> pa.Table:
            n = len(b)
            if n == 0:
                return pa.table(
                    {
                        "i": pa.array([], pa.int64()),
                        "j": pa.array([], pa.int64()),
                        "s": pa.array([], pa.int64()),
                    }
                )
            arr = b["embedding"].combine_chunks()
            flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            d = flat.size // n
            q = np.floor(flat.reshape(n, d) * 1000.0 + 0.5).astype(np.int64)
            g = q.T @ q
            iu = np.triu_indices(d)
            return pa.table(
                {
                    "i": pa.array((iu[0] + 1).astype(np.int64)),
                    "j": pa.array((iu[1] + 1).astype(np.int64)),
                    "s": pa.array(g[iu]),
                }
            )

        out = grouped_agg(
            emb.map_batches(partial, batch_format="pyarrow"),
            ["i", "j"],
            {"s": ("s", "sum")},
        )
        return out.map_batches(
            lambda b: b.astype({"i": "int64", "j": "int64", "s": "int64"}),
            batch_format="pandas",
        )

    def q_cms_token_counts(sf_dir):
        """Count-min sketch (ops/sketch.cms_build) point-queried at the
        true top-10 tokens: the sketch is the only shuffled state
        (depth x width partial cells per block), the exact top-10 comes
        from the vocabulary-bounded count table, and the output pins
        the one-sided error (est >= true) cell by cell against a
        from-scratch SQL CMS."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.sketch import cms_build, cms_estimate

        docs = _read(sf_dir, "documents", ["text"])
        sk = cms_build(docs, "text", depth=4, width=1024)

        def explode(batch: pa.Table) -> pa.Table:
            from collections import Counter

            counts: Counter = Counter()
            for t in batch["text"].to_pylist():
                for w in (t or "").split():
                    counts[w] += 1
            return pa.table(
                {
                    "token": pa.array(list(counts.keys()), pa.string()),
                    "c": pa.array(list(counts.values()), pa.int64()),
                }
            )

        tc = grouped_agg(
            docs.map_batches(explode, batch_format="pyarrow"),
            ["token"],
            {"true_c": ("c", "sum")},
        ).to_pandas()
        top = tc.sort_values(
            ["true_c", "token"], ascending=[False, True], kind="mergesort"
        ).head(10)
        est = cms_estimate(sk, list(top["token"]), depth=4, width=1024)
        out = top.merge(est, on="token")
        out["over_c"] = out["est_c"] - out["true_c"]
        for c in ("true_c", "est_c", "over_c"):
            out[c] = out[c].astype("int64")
        return out[["token", "true_c", "est_c", "over_c"]]

    def q_skew_audit_events(sf_dir):
        """Pre-shuffle skew audit for the user_id key: per md5 hash
        bucket (the same bucketing discipline the engine shuffles
        with), row count, distinct keys and the hottest key's share in
        ppm — the diagnostic that decides salting. Runs entirely on the
        |keys|-bounded per-user count table (one combiner agg); raw
        events never shuffle."""
        import hashlib as _hl

        from ocr_service_ray.ops.agg import grouped_agg

        ev = _read(sf_dir, "events", ["user_id"])
        uc = grouped_agg(ev, ["user_id"], {"c": (None, "count")})

        def bucketize(b: pa.Table) -> pa.Table:
            us = b["user_id"].to_pylist()
            bk = np.array(
                [
                    int(_hl.md5(f"u{u}".encode()).hexdigest()[:16], 16) % 32
                    for u in us
                ],
                dtype=np.int64,
            )
            return pa.table({"bucket": pa.array(bk), "c": b["c"]})

        bt = grouped_agg(
            uc.map_batches(bucketize, batch_format="pyarrow"),
            ["bucket"],
            {
                "n_rows": ("c", "sum"),
                "n_users": (None, "count"),
                "max_c": ("c", "max"),
            },
        ).to_pandas()
        bt["top_share_ppm"] = (
            1_000_000 * bt["max_c"].astype(np.int64)
        ) // bt["n_rows"].astype(np.int64)
        for c in ("bucket", "n_rows", "n_users", "max_c", "top_share_ppm"):
            bt[c] = bt[c].astype("int64")
        return bt[["bucket", "n_rows", "n_users", "max_c", "top_share_ppm"]]

    def q_median_value_by_type(sf_dir):
        """Per-event-type interpolated quartiles of value cents
        (ops/sketch.grouped_quantiles_cont — quantile_cont semantics):
        the (group, value)-count combiner collapses blocks before the
        shuffle; quarter-fraction interpolation over int cents is exact
        in micro units."""
        from ocr_service_ray.ops.sketch import grouped_quantiles_cont

        ev = _read(sf_dir, "events", ["event_type", "value"])

        def prep(b: pa.Table) -> pa.Table:
            v = b["value"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "event_type": b["event_type"],
                    "cents": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64)),
                }
            )

        out = grouped_quantiles_cont(
            ev.map_batches(prep, batch_format="pyarrow"),
            ["event_type"],
            "cents",
            [0.25, 0.5, 0.75],
        )

        def close(b) -> "pa.Table":
            import pandas as pd

            df = b if hasattr(b, "columns") else b.to_pandas()
            df["value_micro"] = np.floor(
                df["value"].to_numpy(np.float64) * 1_000_000.0 + 0.5
            ).astype(np.int64)
            df["q_pct"] = df["q_pct"].astype("int64")
            return df[["event_type", "q_pct", "value_micro"]]

        return out.map_batches(close, batch_format="pandas")

    # -- wave 34: top-2 margin / debounce / in-row top dims / impurity

    def q_top2_margin_by_type(sf_dir):
        """Winner-vs-runner-up margin per event type (the argmax
        confidence report): per-(type, user) cents totals from one
        combiner agg, then each type's |users|-bounded count rows fold
        to (top, runner-up, margin) — a missing runner-up emits the -1
        sentinel so the row stays integer-typed."""
        import pandas as pd

        from ocr_service_ray.ops.agg import bucketed_map_groups, grouped_agg

        ev = _read(sf_dir, "events", ["event_type", "user_id", "value"])

        def prep(b: pa.Table) -> pa.Table:
            v = b["value"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "event_type": b["event_type"],
                    "user_id": b["user_id"],
                    "cents": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64)),
                }
            )

        tot = grouped_agg(
            ev.map_batches(prep, batch_format="pyarrow"),
            ["event_type", "user_id"],
            {"cents": ("cents", "sum")},
        )

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(
                ["cents", "user_id"], ascending=[False, True], kind="mergesort"
            )
            top_u = np.int64(g["user_id"].iloc[0])
            top_c = np.int64(g["cents"].iloc[0])
            if len(g) > 1:
                ru, rc = np.int64(g["user_id"].iloc[1]), np.int64(g["cents"].iloc[1])
            else:
                ru, rc = np.int64(-1), np.int64(-1)
            return pd.DataFrame(
                {
                    "event_type": [g["event_type"].iloc[0]],
                    "top_user": [top_u],
                    "top_cents": [top_c],
                    "runner_user": [ru],
                    "runner_cents": [rc],
                    "margin_cents": [top_c - rc if rc >= 0 else np.int64(-1)],
                }
            )

        out = bucketed_map_groups(tot, ["event_type"], fold)
        return out.map_batches(
            lambda b: b.astype(
                {
                    "top_user": "int64",
                    "top_cents": "int64",
                    "runner_user": "int64",
                    "runner_cents": "int64",
                    "margin_cents": "int64",
                }
            ),
            batch_format="pandas",
        )

    def q_debounce_events(sf_dir):
        """Telemetry debounce: within each (user, type) stream an event
        is kept only if it is the first or follows the previous kept-
        candidate by > 300 s (plain lag gap, not chained suppression —
        the SQL-window form). Per-type keep rates in exact ppm; one
        bucketed two-key shuffle, numpy diff fold."""
        import pandas as pd

        from ocr_service_ray.ops.agg import bucketed_map_groups, grouped_agg

        ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["ts", "event_id"], kind="stable")
            us = (
                pd.DatetimeIndex(g["ts"]).values.astype("datetime64[us]").astype(np.int64)
            )
            keep = np.ones(len(us), dtype=np.int64)
            if len(us) > 1:
                keep[1:] = (np.diff(us) > 300_000_000).astype(np.int64)
            return pd.DataFrame(
                {
                    "event_type": [g["event_type"].iloc[0]],
                    "n_total": [np.int64(len(us))],
                    "n_kept": [np.int64(keep.sum())],
                }
            )

        per_stream = bucketed_map_groups(ev, ["user_id", "event_type"], fold)
        agg = grouped_agg(
            per_stream,
            ["event_type"],
            {"n_total": ("n_total", "sum"), "n_kept": ("n_kept", "sum")},
        ).to_pandas()
        agg["kept_ppm"] = (
            1_000_000 * agg["n_kept"].astype(np.int64)
        ) // agg["n_total"].astype(np.int64)
        for c in ("n_total", "n_kept", "kept_ppm"):
            agg[c] = agg[c].astype("int64")
        return agg[["event_type", "n_total", "n_kept", "kept_ppm"]]

    def q_embedding_top_dims(sf_dir):
        """Per-vector top-3 dimensions by value (in-row ranked explode
        — the sparse-feature projection): one vectorized argsort per
        batch, embarrassingly parallel, output micro-quantized. No
        shuffle at all."""
        emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

        def top3(b: pa.Table) -> pa.Table:
            n = len(b)
            if n == 0:
                return pa.table(
                    {
                        "vec_id": pa.array([], pa.int64()),
                        "rank": pa.array([], pa.int64()),
                        "dim": pa.array([], pa.int64()),
                        "val_micro": pa.array([], pa.int64()),
                    }
                )
            arr = b["embedding"].combine_chunks()
            flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
            d = flat.size // n
            m = flat.reshape(n, d)
            dims = np.arange(d)
            # sort by (-value, dim): lexsort keys are last-key-primary
            order = np.lexsort(
                (np.broadcast_to(dims, (n, d)), -m), axis=1
            )[:, :3]
            rows = np.repeat(
                b["vec_id"].to_numpy(zero_copy_only=False), 3
            )
            vals = np.take_along_axis(m, order, axis=1).ravel()
            return pa.table(
                {
                    "vec_id": pa.array(rows.astype(np.int64)),
                    "rank": pa.array(
                        np.tile(np.arange(1, 4, dtype=np.int64), n)
                    ),
                    "dim": pa.array((order + 1).astype(np.int64).ravel()),
                    "val_micro": pa.array(
                        np.floor(vals * 1_000_000.0 + 0.5).astype(np.int64)
                    ),
                }
            )

        return emb.map_batches(top3, batch_format="pyarrow")

    def q_lang_impurity_by_source(sf_dir):
        """Gini impurity (1 - sum p^2, the log-free diversity measure)
        of each source's language mix, exact in ppm via integer
        cross-multiplication: impurity_ppm = 1e6 - (1e6 * sum c^2) //
        n^2 over the (source, lang) combiner counts. Python-int close
        (sum c^2 needs HUGEINT at corpus scale)."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        docs = _read(sf_dir, "documents", ["source", "lang"])
        p = grouped_agg(
            docs, ["source", "lang"], {"c": (None, "count")}
        ).to_pandas()
        rows = []
        for s, g in p.groupby("source"):
            n = int(g["c"].sum())
            ss = int((g["c"].astype(object) ** 2).sum())
            rows.append(
                {
                    "source": s,
                    "n_docs": n,
                    "impurity_ppm": 1_000_000 - (1_000_000 * ss) // (n * n),
                }
            )
        out = pd.DataFrame(rows).sort_values("source").reset_index(drop=True)
        out["n_docs"] = out["n_docs"].astype("int64")
        out["impurity_ppm"] = out["impurity_ppm"].astype("int64")
        return out

    # -- wave 35: join sizing / business days / Kendall / trimmed mean

    def q_join_size_estimate(sf_dir):
        """Join-output cardinality computed WITHOUT executing the join
        (the planner's sizing pass): |A join B on k| = sum over keys of
        cA*cB. Both sides collapse to per-key count tables (combiner),
        the count tables key-join (only counts shuffle, never rows),
        and the close reports exact output rows, matching-key count and
        the hottest key's contribution — the skew early-warning."""
        import pandas as pd

        from ocr_service_ray.ops.agg import global_agg, grouped_agg
        from ocr_service_ray.ops.relational import join_partitions_for

        def pair_stats(label, left_ds, lkey, right_ds, rkey):
            ca = grouped_agg(left_ds, [lkey], {"ca": (None, "count")})
            cb = grouped_agg(right_ds, [rkey], {"cb": (None, "count")})
            j = ca.join(
                cb,
                join_type="inner",
                num_partitions=join_partitions_for(ca, cb),
                on=(lkey,),
                right_on=(rkey,),
            )

            def prod(b: pa.Table) -> pa.Table:
                p = b["ca"].to_numpy(zero_copy_only=False) * b[
                    "cb"
                ].to_numpy(zero_copy_only=False)
                return pa.table({"p": pa.array(p.astype(np.int64))})

            agg = global_agg(
                j.map_batches(prod, batch_format="pyarrow"),
                {
                    "est_rows": ("p", "sum"),
                    "n_keys": (None, "count"),
                    "max_key_rows": ("p", "max"),
                },
            )
            return {
                "pair": label,
                "est_rows": int(agg["est_rows"]),
                "n_keys": int(agg["n_keys"]),
                "max_key_rows": int(agg["max_key_rows"]),
            }

        rows = [
            pair_stats(
                "customer_orders",
                _read(sf_dir, "customer", ["c_custkey"]),
                "c_custkey",
                _read(sf_dir, "orders", ["o_custkey"]),
                "o_custkey",
            ),
            pair_stats(
                "orders_lineitem",
                _read(sf_dir, "orders", ["o_orderkey"]),
                "o_orderkey",
                _read(sf_dir, "lineitem", ["l_orderkey"]),
                "l_orderkey",
            ),
        ]
        out = pd.DataFrame(rows)
        for c in ("est_rows", "n_keys", "max_key_rows"):
            out[c] = out[c].astype("int64")
        return out

    def q_business_day_latency(sf_dir):
        """Order-to-first-shipment latency in BUSINESS days per
        priority, with the weekday count as pure integer calendar
        arithmetic (Monday-anchored shift d+3, f(d) = 5*(d'//7) +
        min(d'%7, 5) — no date-function semantics to disagree on).
        lineitem collapses to per-order min epoch-day by the combiner
        before the single join."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import join_partitions_for

        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

        def li_prep(b: pa.Table) -> pa.Table:
            us = b["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "l_orderkey": b["l_orderkey"],
                    "ship_day": pa.array(us // 86_400_000_000),
                }
            )

        first_ship = grouped_agg(
            li.map_batches(li_prep, batch_format="pyarrow"),
            ["l_orderkey"],
            {"ship_day": ("ship_day", "min")},
        )
        od = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])

        def od_prep(b: pa.Table) -> pa.Table:
            us = b["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "o_orderkey": b["o_orderkey"],
                    "o_day": pa.array(us // 86_400_000_000),
                    "o_orderpriority": b["o_orderpriority"],
                }
            )

        j = od.map_batches(od_prep, batch_format="pyarrow").join(
            first_ship,
            join_type="inner",
            num_partitions=join_partitions_for(od, first_ship),
            on=("o_orderkey",),
            right_on=("l_orderkey",),
        )

        def latency(b: pa.Table) -> pa.Table:
            def f(d: np.ndarray) -> np.ndarray:
                dp = d + 3  # epoch day 0 = Thursday; +3 anchors Monday
                return 5 * (dp // 7) + np.minimum(dp % 7, 5)

            o = b["o_day"].to_numpy(zero_copy_only=False)
            s = b["ship_day"].to_numpy(zero_copy_only=False)
            bd = f(s) - f(o)
            return pa.table(
                {
                    "o_orderpriority": b["o_orderpriority"],
                    "bd": pa.array(bd.astype(np.int64)),
                }
            )

        agg = grouped_agg(
            j.map_batches(latency, batch_format="pyarrow"),
            ["o_orderpriority"],
            {
                "n_orders": (None, "count"),
                "sum_bd": ("bd", "sum"),
                "max_bd": ("bd", "max"),
            },
        ).to_pandas()
        # signed mean (synthetic shipdates are not anchored to their
        # order's date): floor of the identical IEEE double expression
        # on both sides — integer // differs on negatives (DuckDB
        # truncates, Python floors)
        agg["mean_bd_micro"] = np.floor(
            1_000_000.0
            * agg["sum_bd"].to_numpy(np.float64)
            / agg["n_orders"].to_numpy(np.float64)
        ).astype(np.int64)
        out = agg[["o_orderpriority", "n_orders", "max_bd", "mean_bd_micro"]]
        for c in ("n_orders", "max_bd", "mean_bd_micro"):
            out[c] = out[c].astype("int64")
        return out

    def q_kendall_even_odd(sf_dir):
        """Exact Kendall concordance between each user's even-epoch-day
        and odd-epoch-day activity counts: the distributed part is one
        (user, parity) combiner; the strict-pair C/D count runs on the
        |users|-bounded driver table (vectorized n^2 — the documented
        bounded-keys close). conc_ppm = 1e6*C // (C+D) keeps every
        division nonnegative (DuckDB // truncates toward zero)."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        ev = _read(sf_dir, "events", ["user_id", "ts"])

        def prep(b: pa.Table) -> pa.Table:
            us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "user_id": b["user_id"],
                    "parity": pa.array((us // 86_400_000_000) % 2),
                }
            )

        pc_tab = grouped_agg(
            ev.map_batches(prep, batch_format="pyarrow"),
            ["user_id", "parity"],
            {"c": (None, "count")},
        ).to_pandas()
        w = (
            pc_tab.pivot_table(
                index="user_id", columns="parity", values="c", fill_value=0
            )
            .reindex(columns=[0, 1], fill_value=0)
            .reset_index()
        )
        x = w[0].to_numpy(np.int64)
        y = w[1].to_numpy(np.int64)
        n = len(w)
        dx = np.sign(x[:, None] - x[None, :])
        dy = np.sign(y[:, None] - y[None, :])
        prod = dx * dy
        iu = np.triu_indices(n, k=1)
        conc = int((prod[iu] > 0).sum())
        disc = int((prod[iu] < 0).sum())
        out = pd.DataFrame(
            {
                "n_users": [n],
                "concordant": [conc],
                "discordant": [disc],
                "conc_ppm": [
                    (1_000_000 * conc) // (conc + disc) if conc + disc else 0
                ],
            }
        )
        return out.astype("int64")

    def q_trimmed_mean_by_type(sf_dir):
        """10%-trimmed mean of value cents per event type, computed on
        the (type, cents) value-counts table (combiner — raw rows never
        shuffle): k = n//10 instances clipped off each end by count
        arithmetic (instances of equal cents are interchangeable for a
        sum, so no per-row tiebreak is needed)."""
        import pandas as pd

        from ocr_service_ray.ops.agg import bucketed_map_groups, grouped_agg

        ev = _read(sf_dir, "events", ["event_type", "value"])

        def prep(b: pa.Table) -> pa.Table:
            v = b["value"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "event_type": b["event_type"],
                    "cents": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64)),
                }
            )

        vc = grouped_agg(
            ev.map_batches(prep, batch_format="pyarrow"),
            ["event_type", "cents"],
            {"c": (None, "count")},
        )

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values("cents")
            c = g["c"].to_numpy(np.int64)
            v = g["cents"].to_numpy(np.int64)
            n = int(c.sum())
            k = n // 10
            cum = np.cumsum(c)
            low_before = cum - c
            drop_low = np.clip(k - low_before, 0, c)
            above = n - cum
            drop_high = np.clip(k - above, 0, c)
            kept = c - drop_low - drop_high
            n_used = int(kept.sum())
            s = int((kept * v).sum())
            return pd.DataFrame(
                {
                    "event_type": [g["event_type"].iloc[0]],
                    "n_used": [np.int64(n_used)],
                    "trimmed_mean_micro": [
                        np.int64((1_000_000 * s) // n_used) if n_used else np.int64(0)
                    ],
                }
            )

        out = bucketed_map_groups(vc, ["event_type"], fold)
        return out.map_batches(
            lambda b: b.astype(
                {"n_used": "int64", "trimmed_mean_micro": "int64"}
            ),
            batch_format="pandas",
        )

    # -- wave 36: RLE runs / partition manifest / WoW lag / Theil-Sen

    def q_rle_runs_orders(sf_dir):
        """Run-length structure of o_orderpriority along the dense
        orderkey axis (the RLE-compressibility estimate a columnar
        writer wants) WITHOUT a global sort: the predecessor row
        attaches by a keyed self-join on orderkey = orderkey + 1
        (dense-key adjacency — only (key, priority) pairs shuffle),
        run starts are prev IS NULL OR prev != cur, one combiner
        closes per priority."""
        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import join_partitions_for

        od = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

        def shift(b: pa.Table) -> pa.Table:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "nxt_key": pa.array((k + 1).astype(np.int64)),
                    "prev_prio": b["o_orderpriority"],
                }
            )

        shifted = od.map_batches(shift, batch_format="pyarrow")
        j = od.join(
            shifted,
            join_type="left_outer",
            num_partitions=join_partitions_for(od, shifted),
            on=("o_orderkey",),
            right_on=("nxt_key",),
        )

        def starts(b: pa.Table) -> pa.Table:
            cur = b["o_orderpriority"].to_pylist()
            prev = b["prev_prio"].to_pylist()
            st = np.array(
                [1 if (p is None or p != c) else 0 for c, p in zip(cur, prev)],
                dtype=np.int64,
            )
            return pa.table(
                {
                    "o_orderpriority": b["o_orderpriority"],
                    "start": pa.array(st),
                }
            )

        agg = grouped_agg(
            j.map_batches(starts, batch_format="pyarrow"),
            ["o_orderpriority"],
            {"n_rows": (None, "count"), "n_runs": ("start", "sum")},
        )
        return agg.map_batches(
            lambda b: b.astype({"n_rows": "int64", "n_runs": "int64"}),
            batch_format="pandas",
        )

    def q_partition_manifest_orders(sf_dir):
        """Partition-pruning manifest for a month-partitioned orders
        layout: per month — row count, min/max totalprice cents and
        distinct order days (the zone-map a reader consults to skip
        partitions). One combiner pass for n/min/max + one
        (month, day)-count combiner folded to day counts."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        od = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

        def prep(b: pa.Table) -> pa.Table:
            dt = b["o_orderdate"].to_pandas()
            ym = (dt.dt.year * 100 + dt.dt.month).to_numpy(np.int64)
            day = (
                b["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                // 86_400_000_000
            )
            tp = b["o_totalprice"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "ym": pa.array(ym),
                    "day": pa.array(day.astype(np.int64)),
                    "cents": pa.array(
                        np.floor(tp * 100.0 + 0.5).astype(np.int64)
                    ),
                }
            )

        prep_ds = od.map_batches(prep, batch_format="pyarrow")
        stats = grouped_agg(
            prep_ds,
            ["ym"],
            {
                "n_orders": (None, "count"),
                "min_cents": ("cents", "min"),
                "max_cents": ("cents", "max"),
            },
        ).to_pandas()
        days = grouped_agg(
            prep_ds, ["ym", "day"], {"c": (None, "count")}
        ).to_pandas()
        nd = days.groupby("ym").size().rename("n_days").reset_index()
        out = stats.merge(nd, on="ym")
        for c in ("ym", "n_orders", "min_cents", "max_cents", "n_days"):
            out[c] = out[c].astype("int64")
        return out[["ym", "n_orders", "min_cents", "max_cents", "n_days"]]

    def q_wow_by_weekday(sf_dir):
        """Week-over-week comparison: each day's event cents total
        against the same weekday one week earlier (lag-by-key
        arithmetic, not row lag — robust to missing days). Daily totals
        come from one combiner; the |days|-bounded table self-joins on
        day = day - 7 at the close."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        ev = _read(sf_dir, "events", ["ts", "value"])

        def prep(b: pa.Table) -> pa.Table:
            day = (
                b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                // 86_400_000_000
            )
            v = b["value"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "day": pa.array(day.astype(np.int64)),
                    "cents": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64)),
                }
            )

        daily = grouped_agg(
            ev.map_batches(prep, batch_format="pyarrow"),
            ["day"],
            {"cents": ("cents", "sum")},
        ).to_pandas()
        prev = daily.rename(columns={"day": "pday", "cents": "prev_cents"})
        prev["day"] = prev["pday"] + 7
        out = daily.merge(prev[["day", "prev_cents"]], on="day", how="inner")
        out["diff_cents"] = out["cents"] - out["prev_cents"]
        for c in ("day", "cents", "prev_cents", "diff_cents"):
            out[c] = out[c].astype("int64")
        return out[["day", "cents", "prev_cents", "diff_cents"]]

    def q_theil_sen_daily(sf_dir):
        """Theil-Sen robust trend of daily event cents: the lower
        median of all pairwise slopes. The distributed part is the
        daily combiner; the |days|^2 pair enumeration runs at the
        bounded close, ordered (slope, i, j) for a deterministic
        median. Slope division and the micro floor are the identical
        IEEE expressions on both sides."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        ev = _read(sf_dir, "events", ["ts", "value"])

        def prep(b: pa.Table) -> pa.Table:
            day = (
                b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                // 86_400_000_000
            )
            v = b["value"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "day": pa.array(day.astype(np.int64)),
                    "cents": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64)),
                }
            )

        daily = (
            grouped_agg(
                ev.map_batches(prep, batch_format="pyarrow"),
                ["day"],
                {"cents": ("cents", "sum")},
            )
            .to_pandas()
            .sort_values("day")
            .reset_index(drop=True)
        )
        x = daily["day"].to_numpy(np.float64)
        y = daily["cents"].to_numpy(np.float64)
        n = len(daily)
        ii, jj = np.triu_indices(n, k=1)
        slopes = (y[jj] - y[ii]) / (x[jj] - x[ii])
        order = np.lexsort((jj, ii, slopes))
        m = len(slopes)
        pick = order[(m + 1) // 2 - 1]
        med = slopes[pick]
        out = pd.DataFrame(
            {
                "n_days": [n],
                "n_pairs": [m],
                "slope_micro": [int(np.floor(med * 1_000_000.0 + 0.5))],
            }
        )
        return out.astype("int64")

    # -- wave 37: TPC-H completion (Q6/Q10/Q13/Q15 shapes) ------------

    def q6_forecast_revenue(sf_dir):
        """TPC-H Q6 shape: pure filter + global fold — the query every
        column-pruned, predicate-pushed scan should make IO-bound. One
        pass, zero shuffle; the aggregate is a single combiner cell."""
        import datetime as _dt

        import pandas as pd

        from ocr_service_ray.ops.agg import global_agg

        li = _read(
            sf_dir,
            "lineitem",
            ["l_shipdate", "l_discount", "l_quantity", "l_extendedprice"],
        )
        lo, hi = _dt.datetime(1996, 1, 1), _dt.datetime(1997, 1, 1)

        def prep(b: pa.Table) -> pa.Table:
            keep = pc.and_(
                pc.and_(
                    pc.greater_equal(b["l_shipdate"], pa.scalar(lo)),
                    pc.less(b["l_shipdate"], pa.scalar(hi)),
                ),
                pc.and_(
                    pc.and_(
                        pc.greater_equal(b["l_discount"], pa.scalar(0.05)),
                        pc.less_equal(b["l_discount"], pa.scalar(0.07)),
                    ),
                    pc.less(b["l_quantity"], pa.scalar(24.0)),
                ),
            )
            b = b.filter(keep)
            ep = b["l_extendedprice"].to_numpy(zero_copy_only=False)
            dc = b["l_discount"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "cents": pa.array(
                        np.floor(ep * dc * 100.0 + 0.5).astype(np.int64)
                    )
                }
            )

        agg = global_agg(
            li.map_batches(prep, batch_format="pyarrow"),
            {"revenue_cents": ("cents", "sum"), "n_rows": (None, "count")},
        )
        return pd.DataFrame(
            {
                "revenue_cents": [int(agg["revenue_cents"])],
                "n_rows": [int(agg["n_rows"])],
            }
        ).astype("int64")

    def q10_returned_revenue(sf_dir):
        """TPC-H Q10 shape (returned-item losses by customer): the
        returnflag filter prunes lineitem at the scan, revenue folds to
        per-order cents by the combiner, one hash join attaches the
        customer through orders, and the block-local top-20 closes —
        no global sort, no raw-lineitem shuffle."""
        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import (
            broadcast_join,
            join_partitions_for,
            topk,
        )

        li = _read(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
        )

        def li_prep(b: pa.Table) -> pa.Table:
            b = b.filter(pc.equal(b["l_returnflag"], "R"))
            ep = b["l_extendedprice"].to_numpy(zero_copy_only=False)
            dc = b["l_discount"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "l_orderkey": b["l_orderkey"],
                    "cents": pa.array(
                        np.floor(ep * (1.0 - dc) * 100.0 + 0.5).astype(np.int64)
                    ),
                }
            )

        rev = grouped_agg(
            li.map_batches(li_prep, batch_format="pyarrow"),
            ["l_orderkey"],
            {"cents": ("cents", "sum")},
        )
        od = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        j = rev.join(
            od,
            join_type="inner",
            num_partitions=join_partitions_for(rev, od),
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
        per_cust = grouped_agg(
            j, ["o_custkey"], {"lost_cents": ("cents", "sum")}
        )
        cust = (
            _read(sf_dir, "customer", ["c_custkey", "c_name", "c_acctbal"])
            .to_pandas()
            .rename(columns={"c_custkey": "o_custkey"})
        )
        cust["acctbal_cents"] = np.floor(
            cust["c_acctbal"].to_numpy(np.float64) * 100.0 + 0.5
        ).astype(np.int64)
        named = broadcast_join(
            per_cust, cust[["o_custkey", "c_name", "acctbal_cents"]], on="o_custkey"
        )
        out = topk(
            named,
            by=["lost_cents", "o_custkey"],
            k=20,
            descending=[True, False],
        )
        return out.map_batches(
            lambda b: b.rename(columns={"o_custkey": "c_custkey"}).astype(
                {
                    "c_custkey": "int64",
                    "lost_cents": "int64",
                    "acctbal_cents": "int64",
                }
            )[["c_custkey", "c_name", "lost_cents", "acctbal_cents"]],
            batch_format="pandas",
        )

    def q13_custdist(sf_dir):
        """TPC-H Q13 shape (customer order-count distribution INCLUDING
        zero-order customers): per-customer order counts by combiner,
        then the zero bucket comes from an anti-join count rather than
        a row-expanding outer join — customers never shuffle."""
        import pandas as pd

        from ocr_service_ray.ops.agg import global_agg, grouped_agg

        od = _read(sf_dir, "orders", ["o_custkey"])
        per_cust = grouped_agg(od, ["o_custkey"], {"n_orders": (None, "count")})
        dist = (
            grouped_agg(per_cust, ["n_orders"], {"n_cust": (None, "count")})
            .to_pandas()
        )
        n_customers = int(
            global_agg(
                _read(sf_dir, "customer", ["c_custkey"]),
                {"n": (None, "count")},
            )["n"]
        )
        with_orders = int(dist["n_cust"].sum())
        zero = n_customers - with_orders
        if zero > 0:
            dist = pd.concat(
                [dist, pd.DataFrame({"n_orders": [0], "n_cust": [zero]})],
                ignore_index=True,
            )
        dist = dist.sort_values(
            ["n_cust", "n_orders"], ascending=[False, False], kind="mergesort"
        ).reset_index(drop=True)
        return dist.astype("int64")

    def q15_top_supplier(sf_dir):
        """TPC-H Q15 shape: suppliers whose window revenue EQUALS the
        maximum (all ties kept — not a top-k): per-supplier cents by
        combiner, the scalar max broadcasts back as a filter. Two
        passes over the |suppliers|-bounded partial table, one over
        lineitem."""
        import datetime as _dt

        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        li = _read(
            sf_dir,
            "lineitem",
            ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"],
        )
        lo, hi = _dt.datetime(1996, 1, 1), _dt.datetime(1996, 4, 1)

        def prep(b: pa.Table) -> pa.Table:
            keep = pc.and_(
                pc.greater_equal(b["l_shipdate"], pa.scalar(lo)),
                pc.less(b["l_shipdate"], pa.scalar(hi)),
            )
            b = b.filter(keep)
            ep = b["l_extendedprice"].to_numpy(zero_copy_only=False)
            dc = b["l_discount"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "l_suppkey": b["l_suppkey"],
                    "cents": pa.array(
                        np.floor(ep * (1.0 - dc) * 100.0 + 0.5).astype(np.int64)
                    ),
                }
            )

        per_supp = grouped_agg(
            li.map_batches(prep, batch_format="pyarrow"),
            ["l_suppkey"],
            {"revenue_cents": ("cents", "sum")},
        ).to_pandas()
        mx = int(per_supp["revenue_cents"].max())
        top = per_supp[per_supp["revenue_cents"] == mx].copy()
        supp = (
            _read(sf_dir, "supplier", ["s_suppkey", "s_name"])
            .to_pandas()
            .rename(columns={"s_suppkey": "l_suppkey"})
        )
        out = top.merge(supp, on="l_suppkey").rename(
            columns={"l_suppkey": "s_suppkey"}
        )
        out = out.sort_values("s_suppkey").reset_index(drop=True)
        out["s_suppkey"] = out["s_suppkey"].astype("int64")
        out["revenue_cents"] = out["revenue_cents"].astype("int64")
        return out[["s_suppkey", "s_name", "revenue_cents"]]

    # -- wave 38: dedup PR eval / latency SLO / revenue waterfall -----

    def q_minhash_pr_eval(sf_dir):
        """Precision/recall of MinHash-LSH candidates against the exact
        PPJoin truth set at the same Jaccard-0.5 threshold — the
        evaluation harness that decides band/permutation settings
        before a corpus-scale dedup run. Both sides are pair tables
        (bounded by similarity, not corpus size); the comparison is one
        driver merge."""
        import pandas as pd

        from ocr_service_ray.ops.dedup import minhash_lsh_candidates
        from ocr_service_ray.ops.similarity import jaccard_pair_join

        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        cand = minhash_lsh_candidates(docs, threshold=0.5).to_pandas()[
            ["id_a", "id_b"]
        ]
        truth = jaccard_pair_join(
            _read(sf_dir, "documents", ["doc_id", "text"]),
            "doc_id",
            "text",
            ngram=3,
            threshold_ppm=500_000,
        ).to_pandas()[["id_a", "id_b"]]
        hit = cand.merge(truth, on=["id_a", "id_b"])
        n_cand, n_truth, n_hit = len(cand), len(truth), len(hit)
        return pd.DataFrame(
            {
                "n_cand": [n_cand],
                "n_truth": [n_truth],
                "n_hit": [n_hit],
                "precision_ppm": [
                    (1_000_000 * n_hit) // n_cand if n_cand else 0
                ],
                "recall_ppm": [
                    (1_000_000 * n_hit) // n_truth if n_truth else 0
                ],
            }
        ).astype("int64")

    def q_latency_slo_report(sf_dir):
        """SLO report: p25/p50/p75 (quantile_disc) of the signed
        business-day order-to-first-ship latency per priority —
        composition of the wave-35 integer calendar arithmetic with
        ops/sketch.grouped_quantiles (value-counts combiner; raw rows
        never shuffle)."""
        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import join_partitions_for
        from ocr_service_ray.ops.sketch import grouped_quantiles

        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

        def li_prep(b: pa.Table) -> pa.Table:
            us = b["l_shipdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "l_orderkey": b["l_orderkey"],
                    "ship_day": pa.array(us // 86_400_000_000),
                }
            )

        first_ship = grouped_agg(
            li.map_batches(li_prep, batch_format="pyarrow"),
            ["l_orderkey"],
            {"ship_day": ("ship_day", "min")},
        )
        od = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"])

        def od_prep(b: pa.Table) -> pa.Table:
            us = b["o_orderdate"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "o_orderkey": b["o_orderkey"],
                    "o_day": pa.array(us // 86_400_000_000),
                    "o_orderpriority": b["o_orderpriority"],
                }
            )

        j = od.map_batches(od_prep, batch_format="pyarrow").join(
            first_ship,
            join_type="inner",
            num_partitions=join_partitions_for(od, first_ship),
            on=("o_orderkey",),
            right_on=("l_orderkey",),
        )

        def latency(b: pa.Table) -> pa.Table:
            def f(d: np.ndarray) -> np.ndarray:
                dp = d + 3
                return 5 * (dp // 7) + np.minimum(dp % 7, 5)

            o = b["o_day"].to_numpy(zero_copy_only=False)
            s = b["ship_day"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "o_orderpriority": b["o_orderpriority"],
                    "bd": pa.array((f(s) - f(o)).astype(np.int64)),
                }
            )

        out = grouped_quantiles(
            j.map_batches(latency, batch_format="pyarrow"),
            ["o_orderpriority"],
            "bd",
            [0.25, 0.5, 0.75],
        )
        return out.map_batches(
            lambda b: b.astype({"q_pct": "int64", "value": "int64"}),
            batch_format="pandas",
        )

    def q_revenue_waterfall_mom(sf_dir):
        """Month-over-month revenue waterfall: the revenue delta split
        into a volume effect ((n2-n1) x month-1 average) and a
        price/mix effect (n2 x (avg2-avg1)) — the contribution
        decomposition every revenue dashboard runs. Monthly (n, cents)
        come from one combiner; the |months|-bounded close uses the
        shared IEEE floor expression for the two float effects (they
        sum to the integer delta only up to rounding — both emitted,
        nothing re-derived)."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        od = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

        def prep(b: pa.Table) -> pa.Table:
            dt = b["o_orderdate"].to_pandas()
            ym = (dt.dt.year * 12 + dt.dt.month - 1).to_numpy(np.int64)
            tp = b["o_totalprice"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "m": pa.array(ym),
                    "cents": pa.array(np.floor(tp * 100.0 + 0.5).astype(np.int64)),
                }
            )

        monthly = (
            grouped_agg(
                od.map_batches(prep, batch_format="pyarrow"),
                ["m"],
                {"n": (None, "count"), "cents": ("cents", "sum")},
            )
            .to_pandas()
            .sort_values("m")
            .reset_index(drop=True)
        )
        cur = monthly.iloc[1:].reset_index(drop=True)
        prv = monthly.iloc[:-1].reset_index(drop=True)
        contiguous = (
            cur["m"].to_numpy(np.int64) - prv["m"].to_numpy(np.int64)
        ) == 1
        cur, prv = cur[contiguous].reset_index(drop=True), prv[
            contiguous
        ].reset_index(drop=True)
        n1 = prv["n"].to_numpy(np.float64)
        n2 = cur["n"].to_numpy(np.float64)
        r1 = prv["cents"].to_numpy(np.float64)
        r2 = cur["cents"].to_numpy(np.float64)
        vol = np.floor((n2 - n1) * (r1 / n1) + 0.5)
        mix = np.floor(n2 * (r2 / n2 - r1 / n1) + 0.5)
        out = pd.DataFrame(
            {
                "m": cur["m"].to_numpy(np.int64),
                "delta_cents": (
                    cur["cents"].to_numpy(np.int64)
                    - prv["cents"].to_numpy(np.int64)
                ),
                "volume_effect_cents": vol.astype(np.int64),
                "mix_effect_cents": mix.astype(np.int64),
            }
        )
        return out.astype("int64")

    # -- wave 39: iterative median / bucketed co-join / HLL union ----

    def q_iterative_median_price(sf_dir):
        """Exact lower median of order price cents WITHOUT the bounded-
        distinct assumption (ops/sketch.iterative_exact_median): each
        round one counting scan folds blocks to 256-bin histograms
        over the bracket, narrowing 256x per round — the algorithm for
        a median over 10^12 near-unique values, where value-counts
        quantiles would shuffle a row per distinct value."""
        import pandas as pd

        from ocr_service_ray.ops.sketch import iterative_exact_median

        od = _read(sf_dir, "orders", ["o_totalprice"])

        def prep(b: pa.Table) -> pa.Table:
            tp = b["o_totalprice"].to_numpy(zero_copy_only=False)
            return pa.table(
                {"cents": pa.array(np.floor(tp * 100.0 + 0.5).astype(np.int64))}
            )

        med, n, rounds = iterative_exact_median(
            od.map_batches(prep, batch_format="pyarrow"), "cents"
        )
        assert rounds >= 1  # the narrowing path actually ran
        return pd.DataFrame(
            {"median_cents": [med], "n_rows": [n]}
        ).astype("int64")

    def q_bucketed_cojoin_revenue(sf_dir):
        """Storage-bucketed co-located join (the Hive bucketed-join
        move): both sides are written ONCE to hive-partitioned parquet
        bucketed by orderkey % 16, then every bucket pair joins
        independently inside a task that reads exactly its two bucket
        directories — the join itself needs NO shuffle, and at corpus
        scale one bucketing write amortizes across every subsequent
        key-aligned join. Verified against the plain SQL join."""
        import shutil

        import pandas as pd
        import pyarrow.parquet as _pq

        from ocr_service_ray.ops.agg import grouped_agg

        root = "/tmp/graft_cojoin"
        shutil.rmtree(root, ignore_errors=True)
        n_buckets = 16

        od = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

        def od_prep(b: pa.Table) -> pa.Table:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "o_orderkey": b["o_orderkey"],
                    "o_orderpriority": b["o_orderpriority"],
                    "bucket": pa.array((k % n_buckets).astype(np.int64)),
                }
            )

        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

        def li_prep(b: pa.Table) -> pa.Table:
            k = b["l_orderkey"].to_numpy(zero_copy_only=False)
            ep = b["l_extendedprice"].to_numpy(zero_copy_only=False)
            dc = b["l_discount"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "l_orderkey": b["l_orderkey"],
                    "cents": pa.array(
                        np.floor(ep * (1.0 - dc) * 100.0 + 0.5).astype(np.int64)
                    ),
                    "bucket": pa.array((k % n_buckets).astype(np.int64)),
                }
            )

        od.map_batches(od_prep, batch_format="pyarrow").write_parquet(
            f"{root}/orders", partition_cols=["bucket"]
        )
        li.map_batches(li_prep, batch_format="pyarrow").write_parquet(
            f"{root}/lineitem", partition_cols=["bucket"]
        )

        import ray.data as rd

        def join_bucket(batch: pd.DataFrame) -> pd.DataFrame:
            frames = []
            for bk in batch["bucket"]:
                o = _pq.read_table(
                    f"{root}/orders/bucket={bk}",
                    columns=["o_orderkey", "o_orderpriority"],
                ).to_pandas()
                l = _pq.read_table(
                    f"{root}/lineitem/bucket={bk}",
                    columns=["l_orderkey", "cents"],
                ).to_pandas()
                m = l.merge(
                    o, left_on="l_orderkey", right_on="o_orderkey"
                )
                frames.append(
                    m.groupby("o_orderpriority", as_index=False)["cents"].sum()
                )
            return pd.concat(frames, ignore_index=True)

        per_bucket = rd.from_items(
            [{"bucket": i} for i in range(n_buckets)]
        ).map_batches(join_bucket, batch_format="pandas", batch_size=1)
        out = grouped_agg(
            per_bucket, ["o_orderpriority"], {"revenue_cents": ("cents", "sum")}
        )
        return out.map_batches(
            lambda b: b.astype({"revenue_cents": "int64"}),
            batch_format="pandas",
        )

    def q_hll_union_users(sf_dir):
        """Sketch-union identity: HLL registers built separately over
        event users and order customers merge by elementwise max into
        the registers of the UNION — the cross-table distinct count
        that never co-shuffles the tables. The whole merged register
        table is SQL-reproducible."""
        import pandas as pd

        from ocr_service_ray.ops.sketch import hll_registers

        a = hll_registers(
            _read(sf_dir, "events", ["user_id"]), "user_id", p=10
        ).to_pandas()
        b = hll_registers(
            _read(sf_dir, "orders", ["o_custkey"]), "o_custkey", p=10
        ).to_pandas()
        m = a.merge(b, on="bucket", how="outer", suffixes=("_a", "_b"))
        m["max_rho"] = (
            m[["max_rho_a", "max_rho_b"]].max(axis=1).astype(np.int64)
        )
        out = m[["bucket", "max_rho"]].sort_values("bucket").reset_index(drop=True)
        return out.astype("int64")

    # -- wave 40: inversions / Merkle checksum tree / max-gap argmax --

    def q_inversion_count_purchases(sf_dir):
        """Exact inversion count of the purchase value sequence in
        (ts, event_id) order — the time-disorder measure behind
        sortedness-aware optimizers. After the range-partitioned global
        sort, each SORTED block emits its internal inversion count plus
        a (value, count) histogram; the driver folds block histograms
        in time order, counting cross-block inversions with one
        suffix-cumsum per block — values themselves never reach the
        driver, only |distinct-per-block| count rows."""
        import pandas as pd

        ev = _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"])

        def prep(b: pa.Table) -> pa.Table:
            b = b.filter(pc.equal(b["event_type"], "purchase"))
            v = b["value"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "ts": b["ts"],
                    "event_id": b["event_id"],
                    "cents": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64)),
                }
            )

        srt = ev.map_batches(prep, batch_format="pyarrow").sort(
            ["ts", "event_id"]
        )

        def block_stats(b: pa.Table) -> pa.Table:
            # one batch per sorted block (batch_size=None contract)
            if len(b) == 0:
                return pa.table(
                    {
                        "blk_ts": pa.array([], pa.int64()),
                        "blk_eid": pa.array([], pa.int64()),
                        "v": pa.array([], pa.int64()),
                        "c": pa.array([], pa.int64()),
                    }
                )
            cents = b["cents"].to_numpy(zero_copy_only=False)
            n = len(cents)
            # internal inversions: pairs i<j with v_i > v_j (rows are
            # already time-ordered within the sorted block). Chunked
            # histogram fold — O(n/2048) passes, never an n^2 buffer
            inv = 0
            vmax_blk = int(cents.max())
            local = np.zeros(vmax_blk + 1, dtype=np.int64)
            for s0 in range(0, n, 2048):
                ch = cents[s0 : s0 + 2048]
                m_ = len(ch)
                if m_ > 1:
                    iu, ju = np.triu_indices(m_, k=1)
                    inv += int((ch[iu] > ch[ju]).sum())
                if s0 > 0:
                    gt = local.sum() - np.cumsum(local)[ch]
                    inv += int(gt.sum())
                np.add.at(local, ch, 1)
            u, c = np.unique(cents, return_counts=True)
            key_ts = int(b["ts"].cast(pa.int64())[0].as_py())
            key_eid = int(b["event_id"][0].as_py())
            vs = np.concatenate([u, [np.int64(-1)]])
            cs = np.concatenate([c, [np.int64(inv)]])
            return pa.table(
                {
                    "blk_ts": pa.array(
                        np.full(len(vs), key_ts, dtype=np.int64)
                    ),
                    "blk_eid": pa.array(
                        np.full(len(vs), key_eid, dtype=np.int64)
                    ),
                    "v": pa.array(vs),
                    "c": pa.array(cs),
                }
            )

        rows = srt.map_batches(
            block_stats, batch_format="pyarrow", batch_size=None
        ).to_pandas()
        total_inv = 0
        n_rows = 0
        grid = np.zeros(0, dtype=np.int64)  # cumulative value histogram
        vmax = int(rows.loc[rows["v"] >= 0, "v"].max()) if len(rows) else 0
        grid = np.zeros(vmax + 1, dtype=np.int64)
        for _, g in rows.sort_values(["blk_ts", "blk_eid"]).groupby(
            ["blk_ts", "blk_eid"], sort=True
        ):
            internal = int(g.loc[g["v"] < 0, "c"].sum())
            total_inv += internal
            vv = g.loc[g["v"] >= 0, "v"].to_numpy(np.int64)
            cc = g.loc[g["v"] >= 0, "c"].to_numpy(np.int64)
            n_rows += int(cc.sum())
            # cross inversions: earlier values strictly greater than v
            greater_than = (
                grid.sum() - np.cumsum(grid)[vv]
            )  # count of prior values > v
            total_inv += int((greater_than * cc).sum())
            np.add.at(grid, vv, cc)
        n_pairs = n_rows * (n_rows - 1) // 2
        return pd.DataFrame(
            {
                "n_rows": [n_rows],
                "n_pairs": [n_pairs],
                "inversions": [total_inv],
            }
        ).astype("int64")

    def q_checksum_tree_events(sf_dir):
        """Merkle-style hierarchical checksum (ops/diff.checksum_tree):
        per-day order-invariant leaf checksums plus a root digest over
        the leaves — a replica syncs by comparing the root, then only
        the differing days. Leaf recipe identical to table_checksum;
        the whole tree is SQL-reproducible."""
        from ocr_service_ray.ops.diff import checksum_tree

        ev = _read(sf_dir, "events", ["event_id", "user_id", "event_type", "ts"])

        def prep(b: pa.Table) -> pa.Table:
            day = (
                b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                // 86_400_000_000
            )
            return pa.table(
                {
                    "event_id": b["event_id"],
                    "user_id": b["user_id"],
                    "event_type": b["event_type"],
                    "day": pa.array(day.astype(np.int64)),
                }
            )

        return checksum_tree(
            ev.map_batches(prep, batch_format="pyarrow"),
            ["event_id", "user_id", "event_type"],
            "day",
        )

    def q_max_gap_endpoints(sf_dir):
        """Per-user argmax retrieval: the single LARGEST inter-event
        gap with both endpoint timestamps (ties -> earliest start) —
        the silence-window report behind churn interventions. One
        bucketed key shuffle, numpy diff+argmax fold; users with one
        event emit nothing."""
        import pandas as pd

        from ocr_service_ray.ops.agg import bucketed_map_groups

        ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["ts", "event_id"], kind="stable")
            us = (
                pd.DatetimeIndex(g["ts"]).values.astype("datetime64[us]").astype(np.int64)
            )
            if len(us) < 2:
                return None
            gaps = np.diff(us)
            i = int(np.argmax(gaps))  # first max -> earliest start
            return pd.DataFrame(
                {
                    "user_id": [np.int64(g["user_id"].iloc[0])],
                    "gap_us": [np.int64(gaps[i])],
                    "start_us": [np.int64(us[i])],
                    "end_us": [np.int64(us[i + 1])],
                }
            )

        out = bucketed_map_groups(ev, ["user_id"], fold)
        return out.map_batches(
            lambda b: b.astype(
                {
                    "user_id": "int64",
                    "gap_us": "int64",
                    "start_us": "int64",
                    "end_us": "int64",
                }
            ),
            batch_format="pandas",
        )

    # -- wave 41: incremental view maintenance / banded window join --

    def q_ivm_join_view(sf_dir):
        """Incremental maintenance of a JOIN view (revenue per priority
        over orders x lineitem): the base window's aggregate state is
        computed once, the late-arriving delta (shipdate >= 2000)
        joins and aggregates ALONE, and the two states merge by
        addition — the base fact table is never rescanned for the
        update. Verified against the full recompute."""
        import datetime as _dt

        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import join_partitions_for

        cutoff = _dt.datetime(2000, 1, 1)
        od = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

        def side_view(pred):
            li = _read(
                sf_dir,
                "lineitem",
                ["l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"],
            )

            def prep(b: pa.Table) -> pa.Table:
                b = b.filter(pred(b))
                ep = b["l_extendedprice"].to_numpy(zero_copy_only=False)
                dc = b["l_discount"].to_numpy(zero_copy_only=False)
                return pa.table(
                    {
                        "l_orderkey": b["l_orderkey"],
                        "cents": pa.array(
                            np.floor(ep * (1.0 - dc) * 100.0 + 0.5).astype(
                                np.int64
                            )
                        ),
                    }
                )

            per_order = grouped_agg(
                li.map_batches(prep, batch_format="pyarrow"),
                ["l_orderkey"],
                {"cents": ("cents", "sum"), "n": (None, "count")},
            )
            j = per_order.join(
                od,
                join_type="inner",
                num_partitions=join_partitions_for(per_order, od),
                on=("l_orderkey",),
                right_on=("o_orderkey",),
            )
            return grouped_agg(
                j,
                ["o_orderpriority"],
                {"revenue_cents": ("cents", "sum"), "n_items": ("n", "sum")},
            ).to_pandas()

        base = side_view(
            lambda b: pc.less(b["l_shipdate"], pa.scalar(cutoff))
        ).set_index("o_orderpriority")
        delta = side_view(
            lambda b: pc.greater_equal(b["l_shipdate"], pa.scalar(cutoff))
        ).set_index("o_orderpriority")
        merged = base.add(delta, fill_value=0).reset_index()
        merged["delta_items"] = (
            merged["o_orderpriority"]
            .map(delta["n_items"])
            .fillna(0)
            .astype(np.int64)
        )
        for c in ("revenue_cents", "n_items", "delta_items"):
            merged[c] = merged[c].astype("int64")
        return merged[
            ["o_orderpriority", "revenue_cents", "n_items", "delta_items"]
        ]

    def q_purchase_density_window(sf_dir):
        """Banded time-window self-join: for every purchase, how many
        OTHER purchases landed within +-1 hour — the market-activity
        density feature. Each event probes its hour bucket while the
        build side replicates into the 3 adjacent buckets (the banded
        join that makes a +-window equi-shuffleable); inside a bucket
        the count is two searchsorted calls, never a pair loop."""
        import pandas as pd

        from ocr_service_ray.ops.agg import bucketed_map_groups

        H = 3_600_000_000
        ev = _read(sf_dir, "events", ["event_id", "ts", "event_type"])

        def prep(side: int, offsets: tuple[int, ...]):
            def fn(b: pa.Table) -> pa.Table:
                b = b.filter(pc.equal(b["event_type"], "purchase"))
                t = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                eid = b["event_id"].to_numpy(zero_copy_only=False)
                hour = t // H
                ids, ts_, bks = [], [], []
                for off in offsets:
                    ids.append(eid)
                    ts_.append(t)
                    bks.append(hour + off)
                return pa.table(
                    {
                        "event_id": pa.array(np.concatenate(ids)),
                        "t": pa.array(np.concatenate(ts_)),
                        "bucket": pa.array(np.concatenate(bks)),
                        "side": pa.array(
                            np.full(len(eid) * len(offsets), side, np.int64)
                        ),
                    }
                )

            return fn

        probe = ev.map_batches(prep(0, (0,)), batch_format="pyarrow")
        build = ev.map_batches(prep(1, (-1, 0, 1)), batch_format="pyarrow")

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            probes = g[g["side"] == 0]
            if probes.empty:
                return None
            builds = np.sort(g.loc[g["side"] == 1, "t"].to_numpy(np.int64))
            t = probes["t"].to_numpy(np.int64)
            n = np.searchsorted(builds, t + H, side="left") - np.searchsorted(
                builds, t - H, side="right"
            )
            return pd.DataFrame(
                {
                    "event_id": probes["event_id"].to_numpy(np.int64),
                    "n_nearby": (n - 1).astype(np.int64),  # exclude self
                }
            )

        out = bucketed_map_groups(probe.union(build), ["bucket"], fold)
        return out.map_batches(
            lambda b: b.astype({"event_id": "int64", "n_nearby": "int64"}),
            batch_format="pandas",
        )

    # -- wave 42: relational division / densify+LOCF / backlog sweep --

    def q_orders_fully_shipped(sf_dir):
        """Relational division (the FOR ALL query): orders where EVERY
        lineitem shipped before 1999 — per-order (n_total, n_early)
        from ONE combiner pass, division = the rows where they are
        equal; per-priority counts close. No NOT EXISTS double scan,
        no raw-row shuffle."""
        import datetime as _dt

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import join_partitions_for

        cutoff = _dt.datetime(1999, 1, 1)
        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

        def prep(b: pa.Table) -> pa.Table:
            early = pc.cast(
                pc.less(b["l_shipdate"], pa.scalar(cutoff)), pa.int64()
            )
            return pa.table({"l_orderkey": b["l_orderkey"], "early": early})

        per_order = grouped_agg(
            li.map_batches(prep, batch_format="pyarrow"),
            ["l_orderkey"],
            {"n_total": (None, "count"), "n_early": ("early", "sum")},
        )
        full = per_order.map_batches(
            lambda b: b.filter(pc.equal(b["n_total"], b["n_early"])).select(
                ["l_orderkey"]
            ),
            batch_format="pyarrow",
        )
        od = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
        j = full.join(
            od,
            join_type="inner",
            num_partitions=join_partitions_for(full, od),
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
        out = grouped_agg(
            j, ["o_orderpriority"], {"n_fully_shipped": (None, "count")}
        )
        return out.map_batches(
            lambda b: b.astype({"n_fully_shipped": "int64"}),
            batch_format="pandas",
        )

    def q_densify_user_days(sf_dir):
        """Gap-fill + LOCF imputation: every (user, day) cell of the
        global day range gets its event count (zero-filled) and the
        last ACTIVE day carried forward (-1 before first activity) —
        the dense feature matrix a training pipeline feeds to
        sequence models. Day range broadcasts from one combiner
        min/max; each user densifies independently after one bucketed
        key shuffle."""
        import pandas as pd

        from ocr_service_ray.ops.agg import bucketed_map_groups, global_agg

        ev = _read(sf_dir, "events", ["user_id", "ts"])

        def prep(b: pa.Table) -> pa.Table:
            day = (
                b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                // 86_400_000_000
            )
            return pa.table(
                {
                    "user_id": b["user_id"],
                    "day": pa.array(day.astype(np.int64)),
                }
            )

        days = ev.map_batches(prep, batch_format="pyarrow")
        span = global_agg(days, {"lo": ("day", "min"), "hi": ("day", "max")})
        lo, hi = int(span["lo"]), int(span["hi"])

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            grid = np.arange(lo, hi + 1, dtype=np.int64)
            counts = np.zeros(len(grid), dtype=np.int64)
            vc = g.groupby("day").size()
            counts[vc.index.to_numpy(np.int64) - lo] = vc.to_numpy(np.int64)
            active_day = np.where(counts > 0, grid, np.int64(-1))
            locf = np.maximum.accumulate(active_day)
            return pd.DataFrame(
                {
                    "user_id": np.repeat(
                        np.int64(g["user_id"].iloc[0]), len(grid)
                    ),
                    "day": grid,
                    "n_events": counts,
                    "last_active_day": locf,
                }
            )

        out = bucketed_map_groups(days, ["user_id"], fold)
        return out.map_batches(
            lambda b: b.astype(
                {
                    "user_id": "int64",
                    "day": "int64",
                    "n_events": "int64",
                    "last_active_day": "int64",
                }
            ),
            batch_format="pandas",
        )

    def q_order_backlog_monthly(sf_dir):
        """Open-order backlog over time: cumulative orders placed minus
        cumulative orders first-shipped, per month — the two-series
        reconciliation sweep. Both monthly series are combiner
        aggregates; the prefix sums run on the |months|-bounded
        close."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        od = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"])

        def od_prep(b: pa.Table) -> pa.Table:
            dt = b["o_orderdate"].to_pandas()
            ym = (dt.dt.year * 12 + dt.dt.month - 1).to_numpy(np.int64)
            return pa.table({"m": pa.array(ym)})

        placed = grouped_agg(
            od.map_batches(od_prep, batch_format="pyarrow"),
            ["m"],
            {"n_placed": (None, "count")},
        ).to_pandas()

        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

        def li_prep(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "l_orderkey": b["l_orderkey"],
                    "ship_us": b["l_shipdate"].cast(pa.int64()),
                }
            )

        first_ship = grouped_agg(
            li.map_batches(li_prep, batch_format="pyarrow"),
            ["l_orderkey"],
            {"first_us": ("ship_us", "min")},
        )

        def to_month(b: pa.Table) -> pa.Table:
            us = b["first_us"].to_numpy(zero_copy_only=False)
            d = pd.to_datetime(us, unit="us")
            ym = (d.year * 12 + d.month - 1).to_numpy()
            return pa.table({"m": pa.array(ym.astype(np.int64))})

        shipped = grouped_agg(
            first_ship.map_batches(to_month, batch_format="pyarrow"),
            ["m"],
            {"n_shipped": (None, "count")},
        ).to_pandas()

        allm = (
            pd.merge(placed, shipped, on="m", how="outer")
            .fillna(0)
            .sort_values("m")
            .reset_index(drop=True)
        )
        allm["backlog"] = (
            allm["n_placed"].cumsum() - allm["n_shipped"].cumsum()
        )
        for c in ("m", "n_placed", "n_shipped", "backlog"):
            allm[c] = allm[c].astype("int64")
        return allm[["m", "n_placed", "n_shipped", "backlog"]]

    # -- wave 43: k-fold scaffold / RBO rank overlap / grouped OLS ----

    def q_kfold_value_stats(sf_dir):
        """Deterministic 5-fold cross-validation scaffold: fold =
        md5(event_id) % 5 (layout-invariant, no RNG), per fold the
        event count and cents sum, plus the LEAVE-ONE-OUT mean of the
        other four folds — the train-side statistic a CV loop feeds
        each holdout. One combiner pass; the LOO close is 5 rows of
        arithmetic."""
        import hashlib as _hl

        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        ev = _read(sf_dir, "events", ["event_id", "value"])

        def prep(b: pa.Table) -> pa.Table:
            ids = b["event_id"].to_pylist()
            fold = np.array(
                [
                    int(_hl.md5(f"f{i}".encode()).hexdigest()[:16], 16) % 5
                    for i in ids
                ],
                dtype=np.int64,
            )
            v = b["value"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "fold": pa.array(fold),
                    "cents": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64)),
                }
            )

        f = grouped_agg(
            ev.map_batches(prep, batch_format="pyarrow"),
            ["fold"],
            {"n": (None, "count"), "sum_cents": ("cents", "sum")},
        ).to_pandas()
        tot_n = int(f["n"].sum())
        tot_s = int(f["sum_cents"].sum())
        f["loo_mean_micro"] = np.floor(
            1_000_000.0
            * (tot_s - f["sum_cents"].to_numpy(np.float64))
            / (tot_n - f["n"].to_numpy(np.float64))
        ).astype(np.int64)
        for c in ("fold", "n", "sum_cents", "loo_mean_micro"):
            f[c] = f[c].astype("int64")
        return f[["fold", "n", "sum_cents", "loo_mean_micro"]]

    def q_rbo_rank_overlap(sf_dir):
        """RBO-style agreement (p = 1/2, integer per-term floor)
        between the top-20 users by purchase cents in the first vs
        second half of the event window: score_ppb = sum over depths d
        of overlap(d) * 1e9 // (d * 2^d) — the ranking-stability
        metric. Two combiner aggregates; the depth fold runs on two
        20-row lists."""
        import pandas as pd

        from ocr_service_ray.ops.agg import global_agg, grouped_agg

        ev = _read(sf_dir, "events", ["user_id", "ts", "event_type", "value"])

        span = global_agg(
            ev.map_batches(
                lambda b: pa.table({"t": b["ts"].cast(pa.int64())}),
                batch_format="pyarrow",
            ),
            {"lo": ("t", "min"), "hi": ("t", "max")},
        )
        mid = (int(span["lo"]) + int(span["hi"])) // 2

        def prep(b: pa.Table) -> pa.Table:
            b = b.filter(pc.equal(b["event_type"], "purchase"))
            t = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            v = b["value"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "user_id": b["user_id"],
                    "half": pa.array((t >= mid).astype(np.int64)),
                    "cents": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64)),
                }
            )

        tot = grouped_agg(
            ev.map_batches(prep, batch_format="pyarrow"),
            ["half", "user_id"],
            {"cents": ("cents", "sum")},
        ).to_pandas()

        def top20(h: int) -> list[int]:
            g = tot[tot["half"] == h].sort_values(
                ["cents", "user_id"], ascending=[False, True], kind="mergesort"
            )
            return [int(u) for u in g["user_id"].head(20)]

        a, b_ = top20(0), top20(1)
        score = 0
        for d in range(1, 21):
            x = len(set(a[:d]) & set(b_[:d]))
            score += (x * 1_000_000_000) // (d * (1 << d))
        return pd.DataFrame(
            {
                "depth": [20],
                "overlap_at_20": [len(set(a) & set(b_))],
                "rbo_ppb": [score],
            }
        ).astype("int64")

    def q_discount_elasticity_by_brand(sf_dir):
        """Grouped OLS: per part brand, the slope of quantity on
        discount (does discounting move volume?) from integer
        (n, Sx, Sy, Sxy, Sxx) combiner sums — the grouped-regression
        shape. part->brand is a broadcast dimension lookup; the slope
        close is |brands| rows with the shared IEEE floor division."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import broadcast_join

        li = _read(sf_dir, "lineitem", ["l_partkey", "l_discount", "l_quantity"])

        def prep(b: pa.Table) -> pa.Table:
            x = np.floor(
                b["l_discount"].to_numpy(zero_copy_only=False) * 1_000_000.0 + 0.5
            ).astype(np.int64)
            y = np.floor(
                b["l_quantity"].to_numpy(zero_copy_only=False) + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "l_partkey": b["l_partkey"],
                    "x": pa.array(x),
                    "y": pa.array(y),
                    "xy": pa.array(x * y),
                    "xx": pa.array(x * x),
                }
            )

        part = (
            _read(sf_dir, "part", ["p_partkey", "p_brand"])
            .to_pandas()
            .rename(columns={"p_partkey": "l_partkey"})
        )
        j = broadcast_join(
            li.map_batches(prep, batch_format="pyarrow"), part, on="l_partkey"
        )
        s = grouped_agg(
            j,
            ["p_brand"],
            {
                "n": (None, "count"),
                "sx": ("x", "sum"),
                "sy": ("y", "sum"),
                "sxy": ("xy", "sum"),
                "sxx": ("xx", "sum"),
            },
        ).to_pandas()
        n = s["n"].to_numpy(np.float64)
        sx = s["sx"].to_numpy(np.float64)
        sy = s["sy"].to_numpy(np.float64)
        sxy = s["sxy"].to_numpy(np.float64)
        sxx = s["sxx"].to_numpy(np.float64)
        s["slope_nano"] = np.floor(
            1_000_000_000.0 * (n * sxy - sx * sy) / (n * sxx - sx * sx)
        ).astype(np.int64)
        out = s[["p_brand", "n", "slope_nano"]].copy()
        out["n"] = out["n"].astype("int64")
        return out

    # -- wave 44: threshold algorithm / mutual argmax / LM holdout ----

    def q_threshold_algorithm_topk(sf_dir):
        """Fagin's Threshold Algorithm: top-5 users by combined score
        (total cents + 100 * event count) probing TWO pre-ranked lists
        page by page, stopping when the 5th-best seen score meets the
        rank-frontier threshold — the early-termination pattern that
        reads a bounded prefix of each index instead of scoring every
        key. The ranked lists are combiner aggregates; TA walks them
        in 32-row pages."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        ev = _read(sf_dir, "events", ["user_id", "value"])

        def prep(b: pa.Table) -> pa.Table:
            v = b["value"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "user_id": b["user_id"],
                    "cents": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64)),
                }
            )

        tot = grouped_agg(
            ev.map_batches(prep, batch_format="pyarrow"),
            ["user_id"],
            {"cents": ("cents", "sum"), "n": (None, "count")},
        ).to_pandas()
        by_cents = tot.sort_values(
            ["cents", "user_id"], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        by_n = tot.sort_values(
            ["n", "user_id"], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        score = {
            int(u): int(c) + 100 * int(n)
            for u, c, n in zip(tot["user_id"], tot["cents"], tot["n"])
        }
        seen: set[int] = set()
        page = 32
        depth = 0
        while True:
            depth += page
            seen.update(int(u) for u in by_cents["user_id"].iloc[:depth])
            seen.update(int(u) for u in by_n["user_id"].iloc[:depth])
            d = min(depth, len(tot)) - 1
            tau = int(by_cents["cents"].iloc[d]) + 100 * int(by_n["n"].iloc[d])
            best = sorted(
                ((score[u], -u) for u in seen), reverse=True
            )[:5]
            if len(best) == 5 and best[-1][0] >= tau:
                break
            if depth >= len(tot):
                break
        rows = [
            {"user_id": -u, "score_cents": s} for s, u in best
        ]
        return pd.DataFrame(rows).astype("int64")

    def q_mutual_best_pairs(sf_dir):
        """Mutual-argmax record linkage: (customer, part) pairs where
        the part is the customer's most-ordered part AND the customer
        is the part's top customer (ties -> smaller key) — the
        stable-match filter behind dedup survivorship and account
        pairing. Interaction counts come from one combiner over the
        lineitem->orders join; both argmaxes fold the |pairs|-bounded
        count table."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import join_partitions_for

        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"])
        od = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        j = li.join(
            od,
            join_type="inner",
            num_partitions=join_partitions_for(li, od),
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
        cnt = grouped_agg(
            j, ["o_custkey", "l_partkey"], {"n": (None, "count")}
        ).to_pandas()
        bp = cnt.sort_values(
            ["o_custkey", "n", "l_partkey"],
            ascending=[True, False, True],
            kind="mergesort",
        ).groupby("o_custkey", as_index=False).head(1)
        bc = cnt.sort_values(
            ["l_partkey", "n", "o_custkey"],
            ascending=[True, False, True],
            kind="mergesort",
        ).groupby("l_partkey", as_index=False).head(1)
        mutual = bp.merge(bc, on=["o_custkey", "l_partkey", "n"])
        out = mutual.sort_values(["o_custkey"]).reset_index(drop=True)
        out = out.rename(
            columns={"o_custkey": "c_custkey", "l_partkey": "p_partkey"}
        )
        return out[["c_custkey", "p_partkey", "n"]].astype("int64")

    def q_bigram_lm_holdout_acc(sf_dir):
        """Held-out top-3 accuracy of the per-user bigram behavior LM:
        transition pairs whose successor lands in the second half of
        the window are EVAL, the rest TRAIN; a hit means the true next
        type is in the train model's top-3 for that prev (ties ->
        lexicographic). The train/eval pair extraction is one bucketed
        key fold; both count tables are |types|^2-bounded."""
        import pandas as pd

        from ocr_service_ray.ops.agg import bucketed_map_groups, global_agg

        ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "event_type"])
        span = global_agg(
            ev.map_batches(
                lambda b: pa.table({"t": b["ts"].cast(pa.int64())}),
                batch_format="pyarrow",
            ),
            {"lo": ("t", "min"), "hi": ("t", "max")},
        )
        mid = (int(span["lo"]) + int(span["hi"])) // 2

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["ts", "event_id"], kind="stable")
            t = g["event_type"].to_numpy()
            us = (
                pd.DatetimeIndex(g["ts"]).values.astype("datetime64[us]").astype(np.int64)
            )
            if len(t) < 2:
                return None
            return pd.DataFrame(
                {
                    "prev": t[:-1],
                    "nxt": t[1:],
                    "is_eval": (us[1:] >= mid).astype(np.int64),
                }
            )

        pairs = bucketed_map_groups(ev, ["user_id"], fold).to_pandas()
        train = (
            pairs[pairs["is_eval"] == 0]
            .groupby(["prev", "nxt"], as_index=False)
            .size()
            .rename(columns={"size": "c"})
        )
        top3 = (
            train.sort_values(
                ["prev", "c", "nxt"],
                ascending=[True, False, True],
                kind="mergesort",
            )
            .groupby("prev")
            .head(3)
        )
        lut = top3.groupby("prev")["nxt"].apply(set).to_dict()
        ev_pairs = pairs[pairs["is_eval"] == 1]
        n_eval = len(ev_pairs)
        n_hit = int(
            sum(
                1
                for p, x in zip(ev_pairs["prev"], ev_pairs["nxt"])
                if x in lut.get(p, set())
            )
        )
        return pd.DataFrame(
            {
                "n_eval": [n_eval],
                "n_hit": [n_hit],
                "acc_ppm": [(1_000_000 * n_hit) // n_eval if n_eval else 0],
            }
        ).astype("int64")

    # -- wave 45: vocab saturation / earliest-k / disjunctive scan ----

    def q_vocab_saturation_doc(sf_dir):
        """How much corpus does 90% of the vocabulary need? Reframed so
        it is one combiner: cumulative-distinct-words-by-doc_id hits
        90% of V exactly at the 90th percentile of each word's
        FIRST-SEEN doc_id — so the answer is min(doc_id) per word (a
        combiner min) + one discrete quantile over the
        |vocabulary|-bounded table. No sequential scan, no
        prefix state."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.sketch import value_counts_quantiles

        docs = _read(sf_dir, "documents", ["doc_id", "text"])

        def explode(batch: pa.Table) -> pa.Table:
            ids, words = [], []
            for i, t in zip(
                batch["doc_id"].to_pylist(), batch["text"].to_pylist()
            ):
                seen = set()
                for w in (t or "").split():
                    if w not in seen:
                        seen.add(w)
                        ids.append(i)
                        words.append(w)
            return pa.table(
                {
                    "doc_id": pa.array(ids, pa.int64()),
                    "word": pa.array(words, pa.string()),
                }
            )

        first = grouped_agg(
            docs.map_batches(explode, batch_format="pyarrow"),
            ["word"],
            {"first_doc": ("doc_id", "min")},
        )
        vc = value_counts_quantiles(first, "first_doc", [0.9])
        vocab = first.count()
        return pd.DataFrame(
            {
                "vocab_size": [int(vocab)],
                "doc90": [int(vc["value"].iloc[0])],
            }
        ).astype("int64")

    def q_earliest_purchasers(sf_dir):
        """Global earliest-k retrieval: the 10 users with the earliest
        FIRST purchase (per-user combiner min, then the block-local
        ascending top-k — no global sort)."""
        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import topk

        ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

        def prep(b: pa.Table) -> pa.Table:
            b = b.filter(pc.equal(b["event_type"], "purchase"))
            return pa.table(
                {
                    "user_id": b["user_id"],
                    "t": b["ts"].cast(pa.int64()),
                }
            )

        f = grouped_agg(
            ev.map_batches(prep, batch_format="pyarrow"),
            ["user_id"],
            {"first_us": ("t", "min")},
        )
        out = topk(
            f, by=["first_us", "user_id"], k=10, descending=[False, False]
        )
        return out.map_batches(
            lambda b: b.astype({"user_id": "int64", "first_us": "int64"}),
            batch_format="pandas",
        )

    def q19_disjunctive_revenue(sf_dir):
        """TPC-H Q19 shape: an OR-of-ANDs predicate (brand x quantity
        band disjunction) evaluated vectorized against the broadcast
        part dimension — the disjunctive-pushdown scan. One pass, one
        global fold."""
        import pandas as pd

        from ocr_service_ray.ops.agg import global_agg
        from ocr_service_ray.ops.relational import broadcast_join

        li = _read(
            sf_dir,
            "lineitem",
            ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        )
        part = (
            _read(sf_dir, "part", ["p_partkey", "p_brand"])
            .to_pandas()
            .rename(columns={"p_partkey": "l_partkey"})
        )
        j = broadcast_join(li, part, on="l_partkey")

        def prep(b: pa.Table) -> pa.Table:
            q = b["l_quantity"].to_numpy(zero_copy_only=False)
            brand = np.asarray(b["p_brand"].to_pylist())
            keep = (
                ((brand == "Brand#1") & (q >= 1.0) & (q <= 10.0))
                | ((brand == "Brand#2") & (q >= 10.0) & (q <= 20.0))
                | ((brand == "Brand#3") & (q >= 20.0) & (q <= 30.0))
            )
            b = b.filter(pa.array(keep))
            ep = b["l_extendedprice"].to_numpy(zero_copy_only=False)
            dc = b["l_discount"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "cents": pa.array(
                        np.floor(ep * (1.0 - dc) * 100.0 + 0.5).astype(np.int64)
                    )
                }
            )

        agg = global_agg(
            j.map_batches(prep, batch_format="pyarrow"),
            {"revenue_cents": ("cents", "sum"), "n_rows": (None, "count")},
        )
        return pd.DataFrame(
            {
                "revenue_cents": [int(agg["revenue_cents"])],
                "n_rows": [int(agg["n_rows"])],
            }
        ).astype("int64")

    # -- wave 46: monotone-stack next-greater / write-audit-publish ---

    def q_next_greater_distance(sf_dir):
        """Next-greater-element: for every event, how many steps until
        the SAME user logs a strictly larger value (-1 if never) — the
        classic monotone-stack shape (price-breakout / escalation
        detector). One bucketed key shuffle; each user's series folds
        with an O(n) descending stack, never a pair scan."""
        import pandas as pd

        from ocr_service_ray.ops.agg import bucketed_map_groups

        ev = _read(sf_dir, "events", ["event_id", "user_id", "ts", "value"])

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["ts", "event_id"], kind="stable")
            cents = np.floor(
                g["value"].to_numpy(np.float64) * 100.0 + 0.5
            ).astype(np.int64)
            n = len(cents)
            dist = np.full(n, -1, dtype=np.int64)
            stack: list[int] = []  # indices with no greater successor yet
            for i in range(n):
                while stack and cents[stack[-1]] < cents[i]:
                    j = stack.pop()
                    dist[j] = i - j
                stack.append(i)
            return pd.DataFrame(
                {
                    "event_id": g["event_id"].to_numpy(np.int64),
                    "steps_to_greater": dist,
                }
            )

        out = bucketed_map_groups(ev, ["user_id"], fold)
        return out.map_batches(
            lambda b: b.astype(
                {"event_id": "int64", "steps_to_greater": "int64"}
            ),
            batch_format="pandas",
        )

    def q_wap_publish_events(sf_dir):
        """Write-Audit-Publish: the projection lands in a STAGING
        directory, the audit re-reads it and compares row count and
        order-invariant checksum against the source, and only a passing
        audit atomically renames staging to published — the pattern
        that keeps a bad write invisible to readers. Output is the
        audit record."""
        import os
        import shutil

        import pandas as pd

        from ocr_service_ray.ops.diff import table_checksum

        root = "/tmp/graft_wap"
        shutil.rmtree(root, ignore_errors=True)
        staging, final = f"{root}/_staging", f"{root}/published"
        cols = ["event_id", "user_id", "event_type"]

        src = _read(sf_dir, "events", cols)
        src_sum = table_checksum(src, cols)
        _read(sf_dir, "events", cols).write_parquet(staging)

        from ocr_service_ray.sources.readers import read_parquet_clean

        staged_sum = table_checksum(read_parquet_clean(staging), cols)
        rows_match = int(
            src_sum["n_rows"].iloc[0] == staged_sum["n_rows"].iloc[0]
        )
        sum_match = int(
            src_sum["checksum"].iloc[0] == staged_sum["checksum"].iloc[0]
        )
        published = 0
        if rows_match and sum_match:
            os.rename(staging, final)  # atomic publish
            published = 1
        return pd.DataFrame(
            {
                "n_rows": [int(src_sum["n_rows"].iloc[0])],
                "checksum": [int(src_sum["checksum"].iloc[0])],
                "rows_match": [rows_match],
                "checksum_match": [sum_match],
                "published": [published],
            }
        ).astype("int64")

    # -- wave 47: manifest time travel / positional phrase search -----

    def q_time_travel_read(sf_dir):
        """Snapshot-isolation reads through version manifests (the
        iceberg/delta move, file-level): v1's manifest lists the
        even-event files, v2 appends the odd-event files WITHOUT
        touching v1's — readers pin a manifest, never a directory
        listing, so an in-flight append is invisible. Output: per
        version, row count + order-invariant checksum, both re-derived
        by the oracle from the id-parity split."""
        import json as _json
        import os
        import shutil

        import pandas as pd

        from ocr_service_ray.ops.diff import table_checksum
        from ocr_service_ray.sources.readers import read_parquet_clean

        root = "/tmp/graft_timetravel"
        shutil.rmtree(root, ignore_errors=True)
        os.makedirs(f"{root}/data", exist_ok=True)
        cols = ["event_id", "user_id", "event_type"]
        ev = _read(sf_dir, "events", cols)

        def parity(p: int):
            return lambda b: b.filter(
                pc.equal(pc.bit_wise_and(b["event_id"], pa.scalar(1)), p)
            )

        ev.map_batches(parity(0), batch_format="pyarrow").write_parquet(
            f"{root}/data/even"
        )
        ev.map_batches(parity(1), batch_format="pyarrow").write_parquet(
            f"{root}/data/odd"
        )

        def files_of(d):
            return sorted(
                f"{d}/{f}" for f in os.listdir(d) if f.endswith(".parquet")
            )

        manifests = {
            1: files_of(f"{root}/data/even"),
            2: files_of(f"{root}/data/even") + files_of(f"{root}/data/odd"),
        }
        for v, fs in manifests.items():
            with open(f"{root}/v{v}.manifest.json", "w") as fh:
                _json.dump({"version": v, "files": fs}, fh)

        rows = []
        for v in (1, 2):
            with open(f"{root}/v{v}.manifest.json") as fh:
                files = _json.load(fh)["files"]
            snap = read_parquet_clean(files)
            cs = table_checksum(snap, cols)
            rows.append(
                {
                    "version": v,
                    "n_rows": int(cs["n_rows"].iloc[0]),
                    "checksum": int(cs["checksum"].iloc[0]),
                }
            )
        return pd.DataFrame(rows).astype("int64")

    def q_phrase_search(sf_dir):
        """Positional phrase retrieval: documents containing the exact
        token sequence "hash table" — adjacency of (doc, term,
        position) postings, the phrase-query shape a positional
        inverted index serves. Stateless vectorized scan; top-10 doc
        ids close block-locally."""
        import pandas as pd

        from ocr_service_ray.ops.agg import global_agg
        from ocr_service_ray.ops.relational import topk

        docs = _read(sf_dir, "documents", ["doc_id", "text"])

        def match(b: pa.Table) -> pa.Table:
            ids, hits = [], []
            for i, t in zip(
                b["doc_id"].to_pylist(), b["text"].to_pylist()
            ):
                ws = (t or "").split()
                hit = any(
                    ws[k] == "hash" and ws[k + 1] == "table"
                    for k in range(len(ws) - 1)
                )
                if hit:
                    ids.append(i)
            return pa.table({"doc_id": pa.array(ids, pa.int64())})

        hits = docs.map_batches(match, batch_format="pyarrow")
        n = int(
            global_agg(hits, {"n": (None, "count")})["n"]
        )
        top = topk(hits, by=["doc_id"], k=10, descending=[False]).to_pandas()
        top["n_matching_docs"] = np.int64(n)
        return top.astype("int64")

    # -- wave 48: delta-encoding estimate / decayed counters ----------

    def q_delta_encoding_estimate(sf_dir):
        """Storage planning: how much does per-user delta-of-timestamp
        varint encoding save over raw int64 columns? Per user the first
        event costs 8 bytes, each successor ceil(bit_length(gap)/7)
        varint bytes — bit lengths via the exact np.frexp exponent
        (length(bin()) in SQL, the HLL discipline). One bucketed fold;
        the ratio closes globally in ppm."""
        import pandas as pd

        from ocr_service_ray.ops.agg import bucketed_map_groups, global_agg

        ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(["ts", "event_id"], kind="stable")
            us = (
                pd.DatetimeIndex(g["ts"]).values.astype("datetime64[us]").astype(np.int64)
            )
            gaps = np.diff(us)
            if len(gaps):
                _, exp = np.frexp(gaps.astype(np.float64))
                bits = np.where(gaps > 0, exp, 1).astype(np.int64)
                vbytes = int(((bits + 6) // 7).sum())
            else:
                vbytes = 0
            return pd.DataFrame(
                {
                    "n": [np.int64(len(us))],
                    "naive": [np.int64(8 * len(us))],
                    "delta": [np.int64(8 + vbytes)],
                }
            )

        per_user = bucketed_map_groups(ev, ["user_id"], fold)
        agg = global_agg(
            per_user,
            {
                "n_rows": ("n", "sum"),
                "naive_bytes": ("naive", "sum"),
                "delta_bytes": ("delta", "sum"),
            },
        )
        naive, delta = int(agg["naive_bytes"]), int(agg["delta_bytes"])
        return pd.DataFrame(
            {
                "n_rows": [int(agg["n_rows"])],
                "naive_bytes": [naive],
                "delta_bytes": [delta],
                "ratio_ppm": [(1_000_000 * delta) // naive if naive else 0],
            }
        ).astype("int64")

    def q_decayed_type_counts(sf_dir):
        """Half-life-decayed event counters (weight halves per week of
        age, exact integer 1e6 >> weeks): the recency-weighted
        popularity feature. The global max day broadcasts from one
        combiner; weights fold per (type) in a second combiner — all
        integer, no exp()."""
        import pandas as pd

        from ocr_service_ray.ops.agg import global_agg, grouped_agg

        ev = _read(sf_dir, "events", ["ts", "event_type"])

        def day_of(b: pa.Table) -> pa.Table:
            d = (
                b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                // 86_400_000_000
            )
            return pa.table(
                {
                    "event_type": b["event_type"],
                    "day": pa.array(d.astype(np.int64)),
                }
            )

        days = ev.map_batches(day_of, batch_format="pyarrow")
        mx = int(global_agg(days, {"m": ("day", "max")})["m"])

        def weigh(b: pa.Table) -> pa.Table:
            d = b["day"].to_numpy(zero_copy_only=False)
            weeks = (mx - d) // 7
            w = (1_000_000 >> weeks.astype(np.int64)).astype(np.int64)
            return pa.table({"event_type": b["event_type"], "w": pa.array(w)})

        out = grouped_agg(
            days.map_batches(weigh, batch_format="pyarrow"),
            ["event_type"],
            {"n": (None, "count"), "decayed_ppm": ("w", "sum")},
        )
        return out.map_batches(
            lambda b: b.astype({"n": "int64", "decayed_ppm": "int64"}),
            batch_format="pandas",
        )

    # -- wave 49: k-anonymity audit / functional-dependency profiling -

    def q_k_anonymity_audit(sf_dir):
        """Privacy-release audit: users bucketed by the quasi-identifier
        (first-activity day, modal event type); report the cell-size
        distribution — smallest cell, cell count, and the ppm of users
        in cells below k=5 (the re-identification risk measure). The
        per-user profile is one bucketed fold; cells close on the
        bounded profile table."""
        import pandas as pd

        from ocr_service_ray.ops.agg import bucketed_map_groups

        ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            us = (
                pd.DatetimeIndex(g["ts"]).values.astype("datetime64[us]").astype(np.int64)
            )
            day0 = int(us.min() // 86_400_000_000)
            vc = g.groupby("event_type").size()
            vc = vc.sort_index()  # ties -> lexicographically smallest
            modal = vc.index[int(np.argmax(vc.to_numpy()))]
            return pd.DataFrame(
                {
                    "first_day": [np.int64(day0)],
                    "modal_type": [modal],
                }
            )

        prof = bucketed_map_groups(ev, ["user_id"], fold).to_pandas()
        cells = prof.groupby(["first_day", "modal_type"]).size()
        n_users = int(cells.sum())
        below = int(cells[cells < 5].sum())
        return pd.DataFrame(
            {
                "n_users": [n_users],
                "n_cells": [len(cells)],
                "min_cell": [int(cells.min())],
                "below_k5_ppm": [
                    (1_000_000 * below) // n_users if n_users else 0
                ],
            }
        ).astype("int64")

    def q_fd_violations(sf_dir):
        """Functional-dependency discovery (data profiling): for each
        candidate FD, how many left-hand values map to MORE than one
        distinct right-hand value — the schema-inference signal. Each
        check is one (lhs, rhs) combiner count folded to per-lhs
        distinct counts; nothing but count rows ever shuffles."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        def check(name, ds, lhs, rhs):
            pairs = grouped_agg(
                ds, [lhs, rhs], {"c": (None, "count")}
            ).to_pandas()
            per_lhs = pairs.groupby(lhs).size()
            return {
                "fd": name,
                "n_lhs": len(per_lhs),
                "n_violating": int((per_lhs > 1).sum()),
            }

        rows = [
            check(
                "p_brand->p_type",
                _read(sf_dir, "part", ["p_brand", "p_type"]),
                "p_brand",
                "p_type",
            ),
            check(
                "p_name->p_brand",
                _read(sf_dir, "part", ["p_name", "p_brand"]),
                "p_name",
                "p_brand",
            ),
            check(
                "o_custkey->o_orderpriority",
                _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]),
                "o_custkey",
                "o_orderpriority",
            ),
        ]
        out = pd.DataFrame(rows)
        out["n_lhs"] = out["n_lhs"].astype("int64")
        out["n_violating"] = out["n_violating"].astype("int64")
        return out[["fd", "n_lhs", "n_violating"]]

    # -- TPC-H completion wave (Q5/Q8/Q17/Q22 shapes on the available
    #    columns; no partsupp/shipmode/receiptdate in this corpus) ----

    def _dim_lookup(sf_dir, table, key, val):
        """Read a dimension table once on the driver and return
        (sorted_keys, vals_in_key_order) numpy arrays for vectorized
        searchsorted lookups inside map_batches. Dimension-sized by
        contract (nation/region/supplier)."""
        import pyarrow.parquet as _pq

        t = _pq.read_table(f"{sf_dir}/{table}.parquet", columns=[key, val])
        k = t[key].to_numpy(zero_copy_only=False)
        v = t[val].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        return k[order], v[order]

    def q5_local_supplier_volume(sf_dir):
        """TPC-H Q5 shape (local supplier volume), region ASIA,
        orders in 1996: revenue per nation where the supplying and
        ordering nations coincide. Scale discipline: every dimension
        chain (supplier→nation, nation→region, nation names) is a
        driver-side numpy searchsorted lookup resolved INSIDE the
        lineitem scan; lineitem collapses to (orderkey, supp_nation)
        integer partials via the combiner before its only shuffle
        join, so raw fact rows never move twice."""
        import datetime as _dt
        import pyarrow.parquet as _pq

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import join_partitions_for

        reg = _pq.read_table(f"{sf_dir}/region.parquet").to_pylist()
        asia = {r["r_regionkey"] for r in reg if r["r_name"] == "ASIA"}
        nat = _pq.read_table(f"{sf_dir}/nation.parquet").to_pylist()
        asia_nk = np.array(
            sorted(r["n_nationkey"] for r in nat if r["n_regionkey"] in asia),
            dtype=np.int64,
        )
        nname = {r["n_nationkey"]: r["n_name"] for r in nat}
        sk, sv = _dim_lookup(sf_dir, "supplier", "s_suppkey", "s_nationkey")

        li = _read(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
        )

        def li_prep(b: pa.Table) -> pa.Table:
            supp = b["l_suppkey"].to_numpy(zero_copy_only=False)
            nk = sv[np.searchsorted(sk, supp)].astype(np.int64)
            keep = np.isin(nk, asia_nk)
            ep = b["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
            dc = b["l_discount"].to_numpy(zero_copy_only=False)[keep]
            cents = np.floor(ep * (1.0 - dc) * 100.0 + 0.5).astype(np.int64)
            return pa.table(
                {
                    "l_orderkey": pa.array(
                        b["l_orderkey"].to_numpy(zero_copy_only=False)[keep]
                    ),
                    "supp_nk": pa.array(nk[keep]),
                    "cents": pa.array(cents),
                }
            )

        partials = grouped_agg(
            li.map_batches(li_prep, batch_format="pyarrow"),
            ["l_orderkey", "supp_nk"],
            {"cents": ("cents", "sum")},
        )

        lo, hi = _dt.datetime(1996, 1, 1), _dt.datetime(1997, 1, 1)
        od = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
        od = od.map_batches(
            lambda b: b.filter(
                pc.and_(
                    pc.greater_equal(b["o_orderdate"], pa.scalar(lo)),
                    pc.less(b["o_orderdate"], pa.scalar(hi)),
                )
            ).drop_columns(["o_orderdate"]),
            batch_format="pyarrow",
        )
        cu = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])

        def cu_prep(b: pa.Table) -> pa.Table:
            nk = b["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = np.isin(nk, asia_nk)
            return pa.table(
                {
                    "c_custkey": pa.array(
                        b["c_custkey"].to_numpy(zero_copy_only=False)[keep]
                    ),
                    "cust_nk": pa.array(nk[keep]),
                }
            )

        cu = cu.map_batches(cu_prep, batch_format="pyarrow").repartition(2)
        oc = od.join(
            cu,
            join_type="inner",
            num_partitions=join_partitions_for(od, cu),
            on=("o_custkey",),
            right_on=("c_custkey",),
        ).select_columns(["o_orderkey", "cust_nk"]).repartition(2)
        j = partials.join(
            oc,
            join_type="inner",
            num_partitions=join_partitions_for(partials, oc),
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
        j = j.map_batches(
            lambda b: b.filter(pc.equal(b["supp_nk"], b["cust_nk"])),
            batch_format="pyarrow",
        )
        out = grouped_agg(
            j, ["supp_nk"], {"revenue_cents": ("cents", "sum")}
        ).to_pandas()
        out["n_name"] = out["supp_nk"].map(nname)
        out = out[["n_name", "revenue_cents"]].sort_values("n_name")
        out["revenue_cents"] = out["revenue_cents"].astype("int64")
        return out.reset_index(drop=True)

    def q8_market_share(sf_dir):
        """TPC-H Q8 shape (national market share): among AMERICA-
        region customers' 1995–1996 orders of ECONOMY-type parts,
        NATION_6's share of supplied revenue per order year, in exact
        ppm (single floor division at the end). lineitem collapses to
        TWO integer sums per orderkey (total cents, target-nation
        cents) before the join — the share never needs a second
        grouping pass over facts."""
        import datetime as _dt
        import pyarrow.parquet as _pq

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import join_partitions_for

        reg = _pq.read_table(f"{sf_dir}/region.parquet").to_pylist()
        america = {r["r_regionkey"] for r in reg if r["r_name"] == "AMERICA"}
        nat = _pq.read_table(f"{sf_dir}/nation.parquet").to_pylist()
        america_nk = np.array(
            sorted(r["n_nationkey"] for r in nat if r["n_regionkey"] in america),
            dtype=np.int64,
        )
        target_nk = next(
            r["n_nationkey"] for r in nat if r["n_name"] == "NATION_6"
        )
        pt = _pq.read_table(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
        )
        econ_parts = np.sort(
            pt.filter(pc.equal(pt["p_type"], "ECONOMY"))["p_partkey"]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        sk, sv = _dim_lookup(sf_dir, "supplier", "s_suppkey", "s_nationkey")

        li = _read(
            sf_dir,
            "lineitem",
            ["l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"],
        )

        def li_prep(b: pa.Table) -> pa.Table:
            part = b["l_partkey"].to_numpy(zero_copy_only=False)
            keep = np.isin(part, econ_parts)
            supp = b["l_suppkey"].to_numpy(zero_copy_only=False)[keep]
            nk = sv[np.searchsorted(sk, supp)].astype(np.int64)
            ep = b["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
            dc = b["l_discount"].to_numpy(zero_copy_only=False)[keep]
            cents = np.floor(ep * (1.0 - dc) * 100.0 + 0.5).astype(np.int64)
            return pa.table(
                {
                    "l_orderkey": pa.array(
                        b["l_orderkey"].to_numpy(zero_copy_only=False)[keep]
                    ),
                    "cents": pa.array(cents),
                    "target_cents": pa.array(
                        np.where(nk == target_nk, cents, 0)
                    ),
                }
            )

        partials = grouped_agg(
            li.map_batches(li_prep, batch_format="pyarrow"),
            ["l_orderkey"],
            {
                "cents": ("cents", "sum"),
                "target_cents": ("target_cents", "sum"),
            },
        )

        lo, hi = _dt.datetime(1995, 1, 1), _dt.datetime(1997, 1, 1)
        od = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])

        def od_prep(b: pa.Table) -> pa.Table:
            b = b.filter(
                pc.and_(
                    pc.greater_equal(b["o_orderdate"], pa.scalar(lo)),
                    pc.less(b["o_orderdate"], pa.scalar(hi)),
                )
            )
            year = (
                b["o_orderdate"].to_pandas().dt.year.to_numpy().astype(np.int64)
            )
            return pa.table(
                {
                    "o_orderkey": b["o_orderkey"],
                    "o_custkey": b["o_custkey"],
                    "o_year": pa.array(year),
                }
            )

        od = od.map_batches(od_prep, batch_format="pyarrow")
        cu = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
        cu = cu.map_batches(
            lambda b: b.filter(
                pc.is_in(
                    pc.cast(b["c_nationkey"], pa.int64()),
                    value_set=pa.array(america_nk),
                )
            ).select(["c_custkey"]),
            batch_format="pyarrow",
        ).repartition(2)
        oc = od.join(
            cu,
            join_type="inner",
            num_partitions=join_partitions_for(od, cu),
            on=("o_custkey",),
            right_on=("c_custkey",),
        ).select_columns(["o_orderkey", "o_year"]).repartition(2)
        j = partials.join(
            oc,
            join_type="inner",
            num_partitions=join_partitions_for(partials, oc),
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
        out = grouped_agg(
            j,
            ["o_year"],
            {
                "total_cents": ("cents", "sum"),
                "target_cents": ("target_cents", "sum"),
            },
        ).to_pandas()
        out["mkt_share_ppm"] = (
            1_000_000 * out["target_cents"]
        ) // out["total_cents"]
        out = out.sort_values("o_year").reset_index(drop=True)
        return out[
            ["o_year", "total_cents", "target_cents", "mkt_share_ppm"]
        ].astype("int64")

    def q17_small_quantity_revenue(sf_dir):
        """TPC-H Q17 shape (small-quantity-order revenue) for
        Brand#13, container predicate dropped (no p_container
        column): average yearly revenue lost if small-quantity
        lineitems (qty < 1/5 of the per-part mean) were not filled.
        The per-part mean is held exact by cross-multiplication
        (5·qty·cnt < Σqty — no float division anywhere); pass 1
        collapses brand lineitems to (Σqty, cnt) integer partials per
        partkey, which broadcast back into the pass-2 filter. Two
        pruned scans of the brand slice ≪ one shuffle of it."""
        from ocr_service_ray.ops.agg import grouped_agg

        import pyarrow.parquet as _pq

        pt = _pq.read_table(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
        )
        brand_parts = np.sort(
            pt.filter(pc.equal(pt["p_brand"], "Brand#13"))["p_partkey"]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )

        li = _read(
            sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"]
        )

        def pass1(b: pa.Table) -> pa.Table:
            part = b["l_partkey"].to_numpy(zero_copy_only=False)
            keep = np.isin(part, brand_parts)
            qty = (
                b["l_quantity"].to_numpy(zero_copy_only=False)[keep]
            ).astype(np.int64)
            return pa.table(
                {"l_partkey": pa.array(part[keep]), "qty": pa.array(qty)}
            )

        stats = grouped_agg(
            li.map_batches(pass1, batch_format="pyarrow"),
            ["l_partkey"],
            {"sum_qty": ("qty", "sum"), "cnt": ("qty", "count")},
        ).to_pandas()
        skey = np.sort(stats["l_partkey"].to_numpy())
        order = np.argsort(stats["l_partkey"].to_numpy(), kind="stable")
        ssum = stats["sum_qty"].to_numpy()[order]
        scnt = stats["cnt"].to_numpy()[order]

        def pass2(b: pa.Table) -> pa.Table:
            part = b["l_partkey"].to_numpy(zero_copy_only=False)
            keep = np.isin(part, skey)
            part = part[keep]
            qty = (
                b["l_quantity"].to_numpy(zero_copy_only=False)[keep]
            ).astype(np.int64)
            ep = b["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
            idx = np.searchsorted(skey, part)
            small = qty * 5 * scnt[idx] < ssum[idx]
            cents = np.floor(ep[small] * 100.0 + 0.5).astype(np.int64)
            return pa.table(
                {
                    "n_rows": pa.array([np.int64(small.sum())]),
                    "cents": pa.array([np.int64(cents.sum())]),
                }
            )

        import pandas as pd

        part2 = li.map_batches(pass2, batch_format="pyarrow").to_pandas()
        n_rows = int(part2["n_rows"].sum())
        total = int(part2["cents"].sum())
        return pd.DataFrame(
            {
                "n_rows": pd.array([n_rows], dtype="int64"),
                "avg_yearly_cents": pd.array([total // 7], dtype="int64"),
            }
        )

    def q22_dormant_balance(sf_dir):
        """TPC-H Q22 shape (global sales opportunity), phone prefix →
        nationkey (no c_phone column) and "no orders at all" → "no
        orders since 2000-01-01" (every customer here has at least
        one order): per nation, count + total balance of customers
        whose balance beats the positive-balance mean and who have
        gone dormant. The global mean stays exact by
        cross-multiplication (bal·n_pos > Σpos); the dormant set is a
        broadcast anti-join on recent-order custkeys."""
        import datetime as _dt

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import broadcast_anti_join

        cu = _read(sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"])

        def cents(b: pa.Table) -> pa.Table:
            cb = np.floor(
                b["c_acctbal"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "c_custkey": b["c_custkey"],
                    "c_nationkey": pc.cast(b["c_nationkey"], pa.int64()),
                    "bal_cents": pa.array(cb),
                }
            )

        cu = cu.map_batches(cents, batch_format="pyarrow")

        # pass 1: global positive-balance partials — |blocks| rows to
        # the driver, summed exactly in int64
        def pos_partial(b: pa.Table) -> pa.Table:
            cb = b["bal_cents"].to_numpy(zero_copy_only=False)
            pos = cb[cb > 0]
            return pa.table(
                {
                    "s": pa.array([np.int64(pos.sum())]),
                    "n": pa.array([np.int64(len(pos))]),
                }
            )

        pp = cu.map_batches(pos_partial, batch_format="pyarrow").to_pandas()
        sum_pos, n_pos = int(pp["s"].sum()), int(pp["n"].sum())

        cutoff = _dt.datetime(2000, 1, 1)
        od = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
        recent_keys = od.map_batches(
            lambda b: b.filter(
                pc.greater_equal(b["o_orderdate"], pa.scalar(cutoff))
            ).select(["o_custkey"]),
            batch_format="pyarrow",
        ).unique("o_custkey")

        rich = cu.map_batches(
            lambda b: b.filter(
                pc.greater(
                    pc.multiply(b["bal_cents"], pa.scalar(n_pos, pa.int64())),
                    pa.scalar(sum_pos, pa.int64()),
                )
            ),
            batch_format="pyarrow",
        )
        dormant = broadcast_anti_join(rich, recent_keys, on="c_custkey")
        out = grouped_agg(
            dormant,
            ["c_nationkey"],
            {"n_cust": (None, "count"), "total_bal_cents": ("bal_cents", "sum")},
        ).to_pandas()
        out = out.sort_values("c_nationkey").reset_index(drop=True)
        return out[["c_nationkey", "n_cust", "total_bal_cents"]].astype("int64")

    def q9_profit_proxy(sf_dir):
        """TPC-H Q9 shape (product-type profit) with p_retailprice as
        the unit-cost proxy (no partsupp/ps_supplycost in this
        corpus): profit per (supplier nation, order year) over parts
        named ``%widget%``. Both dimension chains (part→retail cents,
        supplier→nation) resolve as broadcast searchsorted lookups
        inside the ONE lineitem scan; facts collapse to
        (orderkey, supp_nk) integer partials before the single
        shuffle join to orders — raw fact rows move once."""
        import pandas as pd
        import pyarrow.parquet as _pq

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import join_partitions_for

        nat = _pq.read_table(f"{sf_dir}/nation.parquet").to_pylist()
        nname = {r["n_nationkey"]: r["n_name"] for r in nat}
        sk, sv = _dim_lookup(sf_dir, "supplier", "s_suppkey", "s_nationkey")
        pt = _pq.read_table(
            f"{sf_dir}/part.parquet",
            columns=["p_partkey", "p_name", "p_retailprice"],
        )
        pt = pt.filter(pc.match_substring(pt["p_name"], "widget"))
        pkey = pt["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(pkey, kind="stable")
        pkey = pkey[order]
        retail_cents = np.floor(
            pt["p_retailprice"].to_numpy(zero_copy_only=False)[order] * 100.0
            + 0.5
        ).astype(np.int64)

        li = _read(
            sf_dir,
            "lineitem",
            [
                "l_orderkey",
                "l_partkey",
                "l_suppkey",
                "l_quantity",
                "l_extendedprice",
                "l_discount",
            ],
        )

        def li_prep(b: pa.Table) -> pa.Table:
            part = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = np.isin(part, pkey)
            part = part[keep]
            supp = b["l_suppkey"].to_numpy(zero_copy_only=False)[keep]
            qty = (
                b["l_quantity"].to_numpy(zero_copy_only=False)[keep]
            ).astype(np.int64)
            ep = b["l_extendedprice"].to_numpy(zero_copy_only=False)[keep]
            dc = b["l_discount"].to_numpy(zero_copy_only=False)[keep]
            rev = np.floor(ep * (1.0 - dc) * 100.0 + 0.5).astype(np.int64)
            cost = retail_cents[np.searchsorted(pkey, part)] * qty
            nk = sv[np.searchsorted(sk, supp)].astype(np.int64)
            return pa.table(
                {
                    "l_orderkey": pa.array(
                        b["l_orderkey"].to_numpy(zero_copy_only=False)[keep]
                    ),
                    "supp_nk": pa.array(nk),
                    "profit_cents": pa.array(rev - cost),
                }
            )

        partials = grouped_agg(
            li.map_batches(li_prep, batch_format="pyarrow"),
            ["l_orderkey", "supp_nk"],
            {"profit_cents": ("profit_cents", "sum")},
        )
        od = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
            lambda b: pa.table(
                {
                    "o_orderkey": b["o_orderkey"],
                    "o_year": pc.cast(pc.year(b["o_orderdate"]), pa.int64()),
                }
            ),
            batch_format="pyarrow",
        )
        j = partials.join(
            od,
            join_type="inner",
            num_partitions=join_partitions_for(partials, od),
            on=("l_orderkey",),
            right_on=("o_orderkey",),
        )
        out = grouped_agg(
            j, ["supp_nk", "o_year"], {"profit_cents": ("profit_cents", "sum")}
        ).to_pandas()
        out["n_name"] = out["supp_nk"].map(nname)
        out = out.sort_values(["n_name", "o_year"]).reset_index(drop=True)
        out["o_year"] = out["o_year"].astype("int64")
        out["profit_cents"] = out["profit_cents"].astype("int64")
        return out[["n_name", "o_year", "profit_cents"]]

    def q11_important_parts(sf_dir):
        """TPC-H Q11 shape (important stock value) with shipped
        quantity × retail cents as the value proxy (no partsupp):
        parts whose value exceeds the per-part mean, held exact by
        cross-multiplication (value·n_parts > Σvalue — no float
        fraction, scale-invariant). ONE combiner pass over lineitem emits
        |parts|-bounded (partkey, Σqty) partials; the retail lookup,
        global total, and threshold filter act on that small
        result — facts never shuffle."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        pk, pr = _dim_lookup(sf_dir, "part", "p_partkey", "p_retailprice")
        retail_cents = np.floor(pr * 100.0 + 0.5).astype(np.int64)

        li = _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
        qsum = grouped_agg(
            li.map_batches(
                lambda b: pa.table(
                    {
                        "l_partkey": b["l_partkey"],
                        "qty": pa.array(
                            b["l_quantity"]
                            .to_numpy(zero_copy_only=False)
                            .astype(np.int64)
                        ),
                    }
                ),
                batch_format="pyarrow",
            ),
            ["l_partkey"],
            {"qty": ("qty", "sum")},
        ).to_pandas()
        keys = qsum["l_partkey"].to_numpy().astype(np.int64)
        value = qsum["qty"].to_numpy().astype(np.int64) * retail_cents[
            np.searchsorted(pk, keys)
        ]
        total = int(value.sum())
        keep = value * len(keys) > total
        out = pd.DataFrame(
            {"l_partkey": keys[keep], "value_cents": value[keep]}
        )
        return (
            out.sort_values("l_partkey").reset_index(drop=True).astype("int64")
        )

    def q20_promo_shippers(sf_dir):
        """TPC-H Q20 shape (suppliers with excess availability) on
        shipped quantity (no partsupp): suppliers whose 1996 PROMO
        shipments exceed the per-supplier mean, held exact by
        cross-multiplication (qty·n_suppliers > Σqty). The PROMO
        part-key set broadcasts into the one pruned lineitem scan;
        the combiner emits |suppliers|-bounded partials and the mean
        test + name lookups act on that small result."""
        import datetime as _dt

        import pandas as pd
        import pyarrow.parquet as _pq

        from ocr_service_ray.ops.agg import grouped_agg

        pt = _pq.read_table(
            f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
        )
        promo = np.sort(
            pt.filter(pc.equal(pt["p_type"], "PROMO"))["p_partkey"]
            .to_numpy(zero_copy_only=False)
            .astype(np.int64)
        )
        lo, hi = _dt.datetime(1996, 1, 1), _dt.datetime(1997, 1, 1)

        li = _read(
            sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"]
        )

        def prep(b: pa.Table) -> pa.Table:
            b = b.filter(
                pc.and_(
                    pc.greater_equal(b["l_shipdate"], pa.scalar(lo)),
                    pc.less(b["l_shipdate"], pa.scalar(hi)),
                )
            )
            part = b["l_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = np.isin(part, promo)
            qty = (
                b["l_quantity"].to_numpy(zero_copy_only=False)[keep]
            ).astype(np.int64)
            return pa.table(
                {
                    "l_suppkey": pa.array(
                        b["l_suppkey"].to_numpy(zero_copy_only=False)[keep]
                    ),
                    "qty": pa.array(qty),
                }
            )

        sq = grouped_agg(
            li.map_batches(prep, batch_format="pyarrow"),
            ["l_suppkey"],
            {"qty": ("qty", "sum")},
        ).to_pandas()
        n = len(sq)
        total = int(sq["qty"].sum())
        sq = sq[sq["qty"].to_numpy().astype(np.int64) * n > total]

        sup = _pq.read_table(f"{sf_dir}/supplier.parquet").to_pylist()
        sname = {r["s_suppkey"]: r["s_name"] for r in sup}
        snat = {r["s_suppkey"]: r["s_nationkey"] for r in sup}
        nat = _pq.read_table(f"{sf_dir}/nation.parquet").to_pylist()
        nname = {r["n_nationkey"]: r["n_name"] for r in nat}
        out = pd.DataFrame(
            {
                "s_name": sq["l_suppkey"].map(sname),
                "n_name": sq["l_suppkey"].map(snat).map(nname),
                "qty": sq["qty"].astype("int64"),
            }
        )
        return out.sort_values("s_name").reset_index(drop=True)

    def q21_dominant_supplier(sf_dir):
        """TPC-H Q21 shape (the supplier who held up the order — no
        receipt/commit dates in this corpus): on orders with ≥2
        distinct suppliers, the supplier contributing a STRICT
        majority of the order's quantity (2·max > Σ — unique when it
        exists); top-10 suppliers by dominated-order count,
        suppkey-ascending tiebreak. Facts collapse to
        (orderkey, suppkey) integer partials in the combiner; the
        majority test is an in-group fold over the orderkey-bucketed
        shuffle of those partials — raw lineitems never shuffle."""
        import pandas as pd

        from ocr_service_ray.ops.agg import bucketed_map_groups, grouped_agg
        from ocr_service_ray.ops.relational import topk

        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_quantity"])
        partials = grouped_agg(
            li.map_batches(
                lambda b: pa.table(
                    {
                        "l_orderkey": b["l_orderkey"],
                        "l_suppkey": b["l_suppkey"],
                        "qty": pa.array(
                            b["l_quantity"]
                            .to_numpy(zero_copy_only=False)
                            .astype(np.int64)
                        ),
                    }
                ),
                batch_format="pyarrow",
            ),
            ["l_orderkey", "l_suppkey"],
            {"qty": ("qty", "sum")},
        )

        def dominant(g: pd.DataFrame):
            if len(g) < 2:
                return None
            tot = int(g["qty"].sum())
            mx = int(g["qty"].max())
            if 2 * mx > tot:
                return pd.DataFrame(
                    {"l_suppkey": [int(g.loc[g["qty"].idxmax(), "l_suppkey"])]}
                )
            return None

        dom = bucketed_map_groups(partials, ["l_orderkey"], dominant)
        counts = grouped_agg(
            dom, ["l_suppkey"], {"n_orders": (None, "count")}
        )
        out = topk(
            counts, by=["n_orders", "l_suppkey"], k=10, descending=[True, False]
        ).to_pandas()
        return out[["l_suppkey", "n_orders"]].astype("int64")

    def q_daily_value_ohlc(sf_dir):
        """Per (event_type, day) OHLC bars — the time-series
        downsampling shape (open/high/low/close of value). Each block
        collapses to ONE candidate row per touched (type, day) —
        carrying the block-local first/last (ts, event_id) endpoints —
        so the final fold merges |blocks|-bounded candidates and raw
        events never shuffle. Open/close ties break on
        (ts, event_id): fully deterministic, SQL ROW_NUMBER-matched."""
        import pandas as pd

        from ocr_service_ray.ops.agg import bucketed_map_groups

        ev = _read(sf_dir, "events", ["event_id", "ts", "event_type", "value"])

        def partial(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            ts_us = b["ts"].astype("datetime64[us]").astype("int64")
            b["_ts"] = ts_us
            b["day"] = ts_us // 86_400_000_000
            b["v"] = np.floor(
                b["value"].to_numpy() * 1_000_000.0 + 0.5
            ).astype(np.int64)
            b = b.sort_values(["_ts", "event_id"], kind="stable")
            return b.groupby(["event_type", "day"], as_index=False).agg(
                first_ts=("_ts", "first"),
                first_eid=("event_id", "first"),
                open=("v", "first"),
                last_ts=("_ts", "last"),
                last_eid=("event_id", "last"),
                close=("v", "last"),
                low=("v", "min"),
                high=("v", "max"),
            )

        def fold(g: pd.DataFrame):
            io = np.lexsort(
                (g["first_eid"].to_numpy(), g["first_ts"].to_numpy())
            )[0]
            ic = np.lexsort(
                (g["last_eid"].to_numpy(), g["last_ts"].to_numpy())
            )[-1]
            return pd.DataFrame(
                {
                    "event_type": [g["event_type"].iloc[0]],
                    "day": [int(g["day"].iloc[0])],
                    "open_micro": [int(g["open"].iloc[io])],
                    "high_micro": [int(g["high"].max())],
                    "low_micro": [int(g["low"].min())],
                    "close_micro": [int(g["close"].iloc[ic])],
                }
            )

        out = bucketed_map_groups(
            ev.map_batches(partial, batch_format="pandas"),
            ["event_type", "day"],
            fold,
        ).to_pandas()
        out = out.sort_values(["event_type", "day"]).reset_index(drop=True)
        for c in ("day", "open_micro", "high_micro", "low_micro", "close_micro"):
            out[c] = out[c].astype("int64")
        return out

    def q_script_mix_by_lang(sf_dir):
        """Unicode script profile per language: corpus-wide Cyrillic /
        Latin / digit character counts — the mixed-script corpus audit
        feeding LID quality review. Stateless vectorized map
        (pc.count_substring_regex, RE2) + a |langs|-bounded combiner;
        embarrassingly parallel, pipelines with the read."""
        from ocr_service_ray.ops.agg import grouped_agg

        docs = _read(sf_dir, "documents", ["lang", "text"])

        def prep(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "lang": b["lang"],
                    "n_cyr": pc.cast(
                        pc.count_substring_regex(b["text"], "[а-яёА-ЯЁ]"),
                        pa.int64(),
                    ),
                    "n_lat": pc.cast(
                        pc.count_substring_regex(b["text"], "[A-Za-z]"),
                        pa.int64(),
                    ),
                    "n_dig": pc.cast(
                        pc.count_substring_regex(b["text"], "[0-9]"),
                        pa.int64(),
                    ),
                }
            )

        out = grouped_agg(
            docs.map_batches(prep, batch_format="pyarrow"),
            ["lang"],
            {
                "n_cyr": ("n_cyr", "sum"),
                "n_lat": ("n_lat", "sum"),
                "n_dig": ("n_dig", "sum"),
                "n_docs": (None, "count"),
            },
        ).to_pandas()
        out = out.sort_values("lang").reset_index(drop=True)
        for c in ("n_cyr", "n_lat", "n_dig", "n_docs"):
            out[c] = out[c].astype("int64")
        return out[["lang", "n_cyr", "n_lat", "n_dig", "n_docs"]]

    def q_split_leakage_rate(sf_dir):
        """Train/val near-duplicate leakage audit: the deterministic
        md5 hash split (ops/relational.stratified_split) + CCNet
        normalize-then-fingerprint (md5 of the normalized 80-char
        prefix — the prefix-fingerprint rule that catches shared
        boilerplate heads), then per-fingerprint (n_train, n_val)
        presence sums from ONE scan and one hash-keyed combiner
        exchange — the pre-training split-hygiene check. A val doc
        leaks when its fingerprint also appears on the train side;
        only distinct hashes shuffle, never text, and the driver sees
        three ints."""
        import hashlib

        import pandas as pd

        from ocr_service_ray.ops.agg import global_agg, grouped_agg
        from ocr_service_ray.ops.relational import stratified_split
        from ocr_service_ray.ops.text import normalize_text

        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        assigned = stratified_split(docs, "doc_id", 0.8)

        def hash_batch(b: pa.Table) -> pa.Table:
            nt = normalize_text(b)["norm_text"].to_pylist()
            h = [hashlib.md5(t[:80].encode()).hexdigest() for t in nt]
            is_tr = (
                pc.equal(b["split"], "train").to_numpy(zero_copy_only=False)
            ).astype(np.int64)
            return pa.table(
                {
                    "text_hash": pa.array(h, pa.string()),
                    "n_train": pa.array(is_tr),
                    "n_val": pa.array(1 - is_tr),
                }
            )

        per_hash = grouped_agg(
            assigned.map_batches(hash_batch, batch_format="pyarrow"),
            ["text_hash"],
            {"n_train": ("n_train", "sum"), "n_val": ("n_val", "sum")},
        )

        def flags(b: pa.Table) -> pa.Table:
            n_tr = b["n_train"].to_numpy(zero_copy_only=False)
            n_va = b["n_val"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "n_val": pa.array(n_va),
                    "n_leaked": pa.array(np.where(n_tr > 0, n_va, 0)),
                }
            )

        stats = global_agg(
            per_hash.map_batches(flags, batch_format="pyarrow"),
            {"n_val_docs": ("n_val", "sum"), "n_leaked_docs": ("n_leaked", "sum")},
        )
        n_val = int(stats["n_val_docs"])
        n_leak = int(stats["n_leaked_docs"])
        return pd.DataFrame(
            {
                "n_val_docs": pd.array([n_val], dtype="int64"),
                "n_leaked_docs": pd.array([n_leak], dtype="int64"),
                "leak_ppm": pd.array(
                    [(1_000_000 * n_leak) // n_val if n_val else 0],
                    dtype="int64",
                ),
            }
        )

    def q_hard_negatives(sf_dir):
        """Hard-negative mining (ops/similarity.py hard_negatives):
        for each of 8 query embeddings, the top-3 most-similar
        vectors with a DIFFERENT label — contrastive-training data
        prep. One corpus scan, broadcast query matrix, vectorized
        in-block label mask; rounded-cosine/id tie discipline makes
        the whole search SQL-reproducible."""
        import pyarrow.parquet as pq

        from ocr_service_ray.ops import similarity

        qt = (
            pq.read_table(f"{sf_dir}/embeddings.parquet")
            .filter(pc.less(pc.field("vec_id"), 8))
            .sort_by("vec_id")
        )
        queries_m = similarity._as_matrix(qt["embedding"])
        qlab = qt["label"].to_pylist()
        top = similarity.hard_negatives(
            _read(sf_dir, "embeddings"), queries_m, qlab, k=3
        )

        def micro(b: pa.Table) -> pa.Table:
            m = _micro(b["cos_sim"].to_numpy(zero_copy_only=False))
            return pa.table(
                {
                    "query_id": b["query_id"],
                    "vec_id": b["vec_id"],
                    "cos_sim_micro": pa.array(m),
                }
            )

        return top.map_batches(micro, batch_format="pyarrow")

    def q_topk_users_with_other(sf_dir):
        """Reporting top-k with OTHER rollup: per event_type the top-3
        users by total value cents PLUS one OTHER row carrying the
        remainder — one combiner agg to (type, user) partials; the
        per-group top-k AND the group totals both derive from those
        partials (no second scan); the OTHER fold is |types|-bounded
        driver work. OTHER appears only when a type has > 3 users —
        SQL UNION ALL semantics."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import grouped_topk

        ev = _read(sf_dir, "events", ["event_type", "user_id", "value"])

        def cents(b: pa.Table) -> pa.Table:
            c = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "event_type": b["event_type"],
                    "user_id": b["user_id"],
                    "cents": pa.array(c),
                }
            )

        partials = grouped_agg(
            ev.map_batches(cents, batch_format="pyarrow"),
            ["event_type", "user_id"],
            {"cents": ("cents", "sum")},
        ).materialize()
        top = grouped_topk(
            partials, ["event_type"], ["cents", "user_id"], 3, [True, False]
        ).to_pandas()
        totals = grouped_agg(
            partials,
            ["event_type"],
            {"total_cents": ("cents", "sum"), "n_users": (None, "count")},
        ).to_pandas()

        top["who"] = top["user_id"].astype("int64").astype(str)
        rows = [top[["event_type", "who", "cents"]]]
        t3 = top.groupby("event_type", as_index=False)["cents"].sum()
        m = totals.merge(t3, on="event_type", how="left")
        m["cents"] = m["total_cents"] - m["cents"].fillna(0).astype("int64")
        oth = m[m["n_users"] > 3][["event_type", "cents"]].copy()
        oth["who"] = "OTHER"
        rows.append(oth[["event_type", "who", "cents"]])
        out = pd.concat(rows, ignore_index=True)
        out["cents"] = out["cents"].astype("int64")
        return (
            out.sort_values(["event_type", "who"]).reset_index(drop=True)
        )

    def q_quality_decile_review_rate(sf_dir):
        """Quality-score calibration over the FLAGSHIP output: docs
        banded by quality decile (integer micro // 100000), per-band
        needs_review rate in ppm — the extraction-quality audit as a
        pure combiner over the pipeline's own stream (composes with
        the flagship plan; no extra source scan)."""
        from ocr_service_ray.ops.agg import grouped_agg

        out = _flagship(sf_dir)

        def band(b: pa.Table) -> pa.Table:
            q = b["quality_micro"].to_numpy(zero_copy_only=False)
            nr = (
                b["needs_review"].to_numpy(zero_copy_only=False)
            ).astype(np.int64)
            return pa.table(
                {"band": pa.array(q // 100_000), "n_review": pa.array(nr)}
            )

        res = grouped_agg(
            out.map_batches(band, batch_format="pyarrow"),
            ["band"],
            {"n_docs": (None, "count"), "n_review": ("n_review", "sum")},
        ).to_pandas()
        res["review_ppm"] = (1_000_000 * res["n_review"]) // res["n_docs"]
        res = res.sort_values("band").reset_index(drop=True)
        return res[["band", "n_docs", "n_review", "review_ppm"]].astype(
            "int64"
        )

    def q_knn_mutual_rate(sf_dir):
        """kNN-graph mutuality audit over the vec_id<64 subsample:
        build the directed top-3 cosine graph (self excluded via the
        hard_negatives label mask with label = vec_id) and report the
        reciprocated-edge rate — the embedding-health metric that
        flags hubness before an ANN index build. One scan of the
        subsample, |q|·k edges, trivial driver fold."""
        import pandas as pd
        import pyarrow.parquet as pq

        from ocr_service_ray.ops import similarity

        qt = (
            pq.read_table(f"{sf_dir}/embeddings.parquet")
            .filter(pc.less(pc.field("vec_id"), 64))
            .sort_by("vec_id")
        )
        queries_m = similarity._as_matrix(qt["embedding"])
        qids = qt["vec_id"].to_pylist()
        sub = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).map_batches(
            lambda b: b.filter(pc.less(b["vec_id"], 64)),
            batch_format="pyarrow",
        )
        edges = similarity.hard_negatives(
            sub, queries_m, qids, k=3, label_col="vec_id"
        ).to_pandas()
        pairs = set(zip(edges["query_id"], edges["vec_id"]))
        n_edges = len(pairs)
        n_mutual = sum(1 for a, b in pairs if (b, a) in pairs)
        return pd.DataFrame(
            {
                "n_edges": pd.array([n_edges], dtype="int64"),
                "n_mutual": pd.array([n_mutual], dtype="int64"),
                "mutual_ppm": pd.array(
                    [(1_000_000 * n_mutual) // n_edges if n_edges else 0],
                    dtype="int64",
                ),
            }
        )

    def q_interpolate_user_days(sf_dir):
        """Linear gap-fill densify: per user the full day grid
        min..max, missing days filled by INTEGER linear interpolation
        v_prev + (v_next−v_prev)·(d−d_prev) // gap — the
        training-series densify LOCF can't serve (numpy floor
        division; the oracle reproduces flooring via the
        a − mathmod(a, b) identity over DuckDB's truncating //).
        One combiner to (user, day) partials, one bucketed key
        shuffle, vectorized searchsorted fold per user."""
        import pandas as pd

        from ocr_service_ray.ops.agg import bucketed_map_groups, grouped_agg

        ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

        def prep(b: pa.Table) -> pa.Table:
            us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            c = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "user_id": b["user_id"],
                    "day": pa.array(us // 86_400_000_000),
                    "cents": pa.array(c),
                }
            )

        daily = grouped_agg(
            ev.map_batches(prep, batch_format="pyarrow"),
            ["user_id", "day"],
            {"cents": ("cents", "sum")},
        )

        def fill(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values("day")
            days = g["day"].to_numpy().astype(np.int64)
            vals = g["cents"].to_numpy().astype(np.int64)
            grid = np.arange(days[0], days[-1] + 1, dtype=np.int64)
            ip = np.searchsorted(days, grid, side="right") - 1
            iq = np.searchsorted(days, grid, side="left")
            d_prev, v_prev = days[ip], vals[ip]
            d_next, v_next = days[iq], vals[iq]
            gap = np.where(d_next > d_prev, d_next - d_prev, 1)
            v = v_prev + (v_next - v_prev) * (grid - d_prev) // gap
            known = np.isin(grid, days)
            return pd.DataFrame(
                {
                    "user_id": np.repeat(
                        g["user_id"].iloc[0], len(grid)
                    ),
                    "day": grid,
                    "cents": v,
                    "interpolated": (~known).astype(np.int64),
                }
            )

        return bucketed_map_groups(daily, ["user_id"], fill)

    def q_blocking_eval(sf_dir):
        """Entity-resolution blocking quality (Christen's metrics):
        pair completeness and reduction ratio of the sorted-
        neighborhood candidate generator against the exact PPJoin
        Jaccard≥0.5 truth — the audit that decides whether a cheap
        blocker may replace the quadratic join. Both sides are pair
        tables (ints only — text never moves); candidates are
        O(corpus) two-int rows, truth is similarity-bounded; the
        compare is one pair-keyed driver merge at this scale (a
        pair-keyed hash join at corpus scale)."""
        import pandas as pd

        from ocr_service_ray.ops.relational import hash_join
        from ocr_service_ray.ops.scan import global_rank
        from ocr_service_ray.ops.similarity import jaccard_pair_join

        docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])
        n_docs = docs.count()
        ranked = global_rank(docs, ["n_chars", "doc_id"])
        a = ranked.map_batches(
            lambda b: pa.table(
                {"rank": b["rank"], "id_a": b["doc_id"], "n_a": b["n_chars"]}
            ),
            batch_format="pyarrow",
        )
        b_side = ranked.map_batches(
            lambda b: pa.table(
                {
                    "rank": pc.subtract(b["rank"], 1),
                    "id_b": b["doc_id"],
                    "n_b": b["n_chars"],
                }
            ),
            batch_format="pyarrow",
        )
        cand = (
            hash_join(a.repartition(4), b_side.repartition(4), on="rank")
            .to_pandas()
        )
        cand = cand[(cand["n_b"] - cand["n_a"]).abs() <= 2]
        cand_pairs = pd.DataFrame(
            {
                "lo": np.minimum(cand["id_a"], cand["id_b"]),
                "hi": np.maximum(cand["id_a"], cand["id_b"]),
            }
        )
        truth = jaccard_pair_join(
            _read(sf_dir, "documents", ["doc_id", "text"]),
            "doc_id",
            "text",
            ngram=3,
            threshold_ppm=500_000,
        ).to_pandas()
        truth_pairs = pd.DataFrame(
            {
                "lo": np.minimum(truth["id_a"], truth["id_b"]),
                "hi": np.maximum(truth["id_a"], truth["id_b"]),
            }
        )
        hit = cand_pairs.merge(truth_pairs, on=["lo", "hi"])
        n_cand, n_truth, n_hit = len(cand_pairs), len(truth_pairs), len(hit)
        all_pairs = n_docs * (n_docs - 1) // 2
        return pd.DataFrame(
            {
                "n_cand": [n_cand],
                "n_truth": [n_truth],
                "n_hit": [n_hit],
                "completeness_ppm": [
                    (1_000_000 * n_hit) // n_truth if n_truth else 0
                ],
                "reduction_ppm": [
                    1_000_000 - (1_000_000 * n_cand) // all_pairs
                    if all_pairs
                    else 0
                ],
            }
        ).astype("int64")

    def q_user_active_time(sf_dir):
        """Interval-union engagement time per user: sessions split on
        >30-min gaps (the sessionize rule), total in-session dwell =
        Σ(session last ts − first ts) in integer microseconds — the
        per-user active-time aggregate. One bucketed user shuffle,
        vectorized numpy boundary fold per user."""
        import pandas as pd

        from ocr_service_ray.ops.agg import bucketed_map_groups

        ev = _read(sf_dir, "events", ["user_id", "ts"])

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            ts = np.sort(
                g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
            )
            brk = np.nonzero(np.diff(ts) > 30 * 60 * 1_000_000)[0]
            starts = np.concatenate(([0], brk + 1))
            ends = np.concatenate((brk, [len(ts) - 1]))
            return pd.DataFrame(
                {
                    "user_id": [g["user_id"].iloc[0]],
                    "n_sessions": [len(starts)],
                    "active_us": [int((ts[ends] - ts[starts]).sum())],
                }
            )

        return bucketed_map_groups(ev, ["user_id"], fold)

    def q_mcv_stats_orders(sf_dir):
        """Catalog MCV statistics (the optimizer-stats shape): top-5
        most-common values per column with counts — ONE exploded
        (column, value) scan feeding one count combiner and a
        per-column top-k combiner (the profile_table single-scan
        discipline: C columns, one pass). Values are cast to a
        uniform VARCHAR so every column rides the same exchange."""
        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import grouped_topk

        cols = ["o_orderstatus", "o_orderpriority", "o_custkey"]
        od = _read(sf_dir, "orders", cols)

        def explode(b: pa.Table) -> pa.Table:
            parts = [
                pa.table(
                    {
                        "col": pa.array([c] * b.num_rows, pa.string()),
                        "value": b[c].cast(pa.string()),
                    }
                )
                for c in cols
            ]
            return pa.concat_tables(parts)

        counts = grouped_agg(
            od.map_batches(explode, batch_format="pyarrow"),
            ["col", "value"],
            {"n": (None, "count")},
        )
        return grouped_topk(counts, ["col"], ["n", "value"], 5, [True, False])

    def q_blocklist_audit(sf_dir):
        """Blocklist screening audit (the FineWeb/C4 curation shape):
        for each broadcast blocklist term, how many documents contain
        it and how many total (non-overlapping) occurrences exist —
        the pre-filter report that sizes a removal rule before it
        runs. Vectorized pc.count_substring per term inside ONE scan;
        the |terms|-bounded partials fold in a tiny combiner."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        terms = ["spark", "slow", "dup", "big data"]
        docs = _read(sf_dir, "documents", ["text"])

        def count_terms(b: pa.Table) -> pa.Table:
            rows = []
            for t in terms:
                occ = pc.count_substring(b["text"], t)
                occ_np = occ.to_numpy(zero_copy_only=False).astype(np.int64)
                rows.append(
                    {
                        "term": t,
                        "n_docs": int((occ_np > 0).sum()),
                        "n_occurrences": int(occ_np.sum()),
                    }
                )
            return pa.Table.from_pylist(rows)

        out = grouped_agg(
            docs.map_batches(count_terms, batch_format="pyarrow"),
            ["term"],
            {
                "n_docs": ("n_docs", "sum"),
                "n_occurrences": ("n_occurrences", "sum"),
            },
        ).to_pandas()
        out = out.sort_values("term").reset_index(drop=True)
        out["n_docs"] = out["n_docs"].astype("int64")
        out["n_occurrences"] = out["n_occurrences"].astype("int64")
        return out[["term", "n_docs", "n_occurrences"]]

    def q_cross_lang_dups(sf_dir):
        """Cross-language duplicate audit: normalized 80-char prefix
        fingerprints that appear under MORE THAN ONE language label —
        the LID-error / translated-boilerplate detector that a
        per-language dedup would miss. One scan to (fp, lang) rows,
        then two nested combiners ((fp, lang) counts → per-fp lang
        count + doc sum); only distinct fingerprint pairs shuffle."""
        import hashlib

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.text import normalize_text

        docs = _read(sf_dir, "documents", ["lang", "text"])

        def fp(b: pa.Table) -> pa.Table:
            nt = normalize_text(b)["norm_text"].to_pylist()
            h = [hashlib.md5(t[:80].encode()).hexdigest() for t in nt]
            return pa.table(
                {"th": pa.array(h, pa.string()), "lang": b["lang"]}
            )

        pairs = grouped_agg(
            docs.map_batches(fp, batch_format="pyarrow"),
            ["th", "lang"],
            {"n": (None, "count")},
        )
        per_fp = grouped_agg(
            pairs,
            ["th"],
            {"n_docs": ("n", "sum"), "n_langs": (None, "count")},
        ).to_pandas()
        out = per_fp[per_fp["n_langs"] > 1].sort_values("th")
        out = out.reset_index(drop=True)
        out["n_docs"] = out["n_docs"].astype("int64")
        out["n_langs"] = out["n_langs"].astype("int64")
        return out[["th", "n_docs", "n_langs"]]

    def q_max_event_rate_per_user(sf_dir):
        """Per-user peak event rate: the maximum number of events in
        ANY sliding 60-second window [t, t+60s) anchored at an event —
        the rate-limit / abuse-detection audit. One bucketed user
        shuffle; the per-user fold is two vectorized searchsorteds
        over the sorted timestamp array (value-based bounds, so
        duplicate timestamps count exactly like the SQL range
        self-join)."""
        import pandas as pd

        from ocr_service_ray.ops.agg import bucketed_map_groups

        ev = _read(sf_dir, "events", ["user_id", "ts"])

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            us = np.sort(
                g["ts"].astype("datetime64[us]").astype("int64").to_numpy()
            )
            lo = np.searchsorted(us, us, side="left")
            hi = np.searchsorted(us, us + 60_000_000, side="left")
            return pd.DataFrame(
                {
                    "user_id": [g["user_id"].iloc[0]],
                    "max_per_minute": [int((hi - lo).max())],
                }
            )

        return bucketed_map_groups(ev, ["user_id"], fold)

    def q_vocab_coverage_topk(sf_dir):
        """Zipf tail-mass audit: the share of all token occurrences
        (in ppm) covered by the top-100 / top-1000 / top-10000 tokens —
        the vocabulary-size sizing curve for tokenizer training. One
        token-count combiner over the corpus; the global total is a
        |blocks|-bounded partial sum and the top-k is the combiner
        top-k — the full vocabulary never reaches the driver."""
        import pandas as pd

        from ocr_service_ray.ops.agg import global_agg, grouped_agg
        from ocr_service_ray.ops.relational import topk

        docs = _read(sf_dir, "documents", ["text"])

        def toks(b: pa.Table) -> pa.Table:
            split = pc.split_pattern_regex(b["text"], r"\s+")
            flat = pc.list_flatten(split)
            flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
            return pa.table({"token": flat})

        counts = grouped_agg(
            docs.map_batches(toks, batch_format="pyarrow"),
            ["token"],
            {"n": (None, "count")},
        ).materialize()
        total = int(
            global_agg(counts, {"total": ("n", "sum")})["total"]
        )
        top = topk(
            counts, by=["n", "token"], k=10_000, descending=[True, False]
        ).to_pandas()
        top = top.sort_values(
            ["n", "token"], ascending=[False, True]
        ).reset_index(drop=True)
        csum = top["n"].astype("int64").cumsum()
        rows = []
        for k in (100, 1_000, 10_000):
            covered = int(csum.iloc[min(k, len(csum)) - 1]) if len(csum) else 0
            rows.append(
                {
                    "k": k,
                    "covered": covered,
                    "covered_ppm": (1_000_000 * covered) // total
                    if total
                    else 0,
                }
            )
        return pd.DataFrame(rows).astype("int64")

    def q_filter_ablation(sf_dir):
        """Quality-filter ablation matrix: per curation rule, how many
        docs it flags and how many it ALONE flags (unique
        contribution), plus the any-rule union — the report that
        decides whether a rule earns its false-positive budget before
        a corpus-scale removal run. ONE streaming pass computes all
        four integer rule flags (Gopher repetition stats are
        row-local), a |rules|-bounded combiner folds the matrix; text
        never shuffles."""
        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.quality_rules import repetition_stats

        docs = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])
        stats = repetition_stats(docs, append=True)

        def flags(b: pa.Table) -> pa.Table:
            nw = b["n_words"].to_numpy(zero_copy_only=False)
            ktw = b["keep_top_word"].to_numpy(zero_copy_only=False)
            kdb = b["keep_dup_bigram"].to_numpy(zero_copy_only=False)
            nc = b["n_chars"].to_numpy(zero_copy_only=False)
            rules = {
                "top_word": ~ktw,
                "dup_bigram": ~kdb,
                "too_short": nw < 20,
                "too_long": nc > 450,
            }
            m = np.stack(list(rules.values()))
            tot = m.sum(axis=0)
            rows = [
                {
                    "rule": name,
                    "n_flagged": int(m[i].sum()),
                    "n_only": int((m[i] & (tot == 1)).sum()),
                }
                for i, name in enumerate(rules)
            ]
            rows.append(
                {
                    "rule": "ANY",
                    "n_flagged": int((tot > 0).sum()),
                    "n_only": int((tot == 1).sum()),
                }
            )
            return pa.Table.from_pylist(rows)

        out = grouped_agg(
            stats.map_batches(flags, batch_format="pyarrow"),
            ["rule"],
            {"n_flagged": ("n_flagged", "sum"), "n_only": ("n_only", "sum")},
        ).to_pandas()
        out = out.sort_values("rule").reset_index(drop=True)
        out["n_flagged"] = out["n_flagged"].astype("int64")
        out["n_only"] = out["n_only"].astype("int64")
        return out[["rule", "n_flagged", "n_only"]]

    def q_encoding_plan_orders(sf_dir):
        """Columnar encoding planner (the lakehouse OPTIMIZE shape):
        per column, row count, exact NDV, dictionary index bit-width
        (bit_length(ndv−1)) and a dict-vs-plain recommendation by the
        integer 1% cardinality rule — ONE exploded (column, value)
        scan feeding two nested combiners (the MCV/profile single-pass
        discipline)."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        cols = ["o_orderstatus", "o_orderpriority", "o_custkey"]
        od = _read(sf_dir, "orders", cols)

        def explode(b: pa.Table) -> pa.Table:
            parts = [
                pa.table(
                    {
                        "col": pa.array([c] * b.num_rows, pa.string()),
                        "value": b[c].cast(pa.string()),
                    }
                )
                for c in cols
            ]
            return pa.concat_tables(parts)

        pairs = grouped_agg(
            od.map_batches(explode, batch_format="pyarrow"),
            ["col", "value"],
            {"n": (None, "count")},
        )
        per_col = grouped_agg(
            pairs, ["col"], {"ndv": (None, "count"), "n_rows": ("n", "sum")}
        ).to_pandas()
        ndv = per_col["ndv"].astype("int64")
        per_col["index_bits"] = [
            0 if v <= 1 else int(v - 1).bit_length() for v in ndv
        ]
        per_col["plan"] = np.where(
            ndv * 100 <= per_col["n_rows"].astype("int64"), "dict", "plain"
        )
        per_col = per_col.sort_values("col").reset_index(drop=True)
        for c in ("ndv", "n_rows", "index_bits"):
            per_col[c] = per_col[c].astype("int64")
        return per_col[["col", "n_rows", "ndv", "index_bits", "plan"]]

    def q_q12_returnflag_priority(sf_dir):
        """TPC-H Q12 shape on available columns (no l_shipmode /
        l_receiptdate in this corpus — l_returnflag stands in for the
        ship mode, l_shipdate for the receipt window): lines shipped
        in 1996 join to their orders, per returnflag count
        critical-priority (1-URGENT / 2-HIGH) vs other lines. The
        date filter prunes BEFORE any shuffle and the per-(orderkey,
        returnflag) line counts fold through the COMBINER first (the
        q3 discipline — partials join, raw lineitem rows never move);
        the priority split is a vectorized indicator + combiner sum,
        the COUNT FILTER shape."""
        import datetime as _dt

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import hash_join

        lo, hi = _dt.datetime(1996, 1, 1), _dt.datetime(1997, 1, 1)
        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag", "l_shipdate"])

        def li_prep(b: pa.Table) -> pa.Table:
            keep = pc.and_(
                pc.greater_equal(b["l_shipdate"], pa.scalar(lo)),
                pc.less(b["l_shipdate"], pa.scalar(hi)),
            )
            b = b.filter(keep)
            return b.select(["l_orderkey", "l_returnflag"])

        lines = grouped_agg(
            li.map_batches(li_prep, batch_format="pyarrow"),
            ["l_orderkey", "l_returnflag"],
            {"n_lines": (None, "count")},
        )
        od = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
        # repartition: the combiner emits schema-less zero-row blocks
        # for empty buckets and the acero join rejects them (repo
        # landmine — same interposition as ops/ranking.py:177)
        j = hash_join(lines.repartition(4), od, on="l_orderkey", right_on="o_orderkey")

        def split(b: pa.Table) -> pa.Table:
            pr = b["o_orderpriority"].to_numpy(zero_copy_only=False)
            n = b["n_lines"].to_numpy(zero_copy_only=False).astype(np.int64)
            high = np.isin(pr, ["1-URGENT", "2-HIGH"]).astype(np.int64)
            return pa.table(
                {
                    "l_returnflag": b["l_returnflag"],
                    "high": pa.array(high * n),
                    "low": pa.array((1 - high) * n),
                }
            )

        out = grouped_agg(
            j.map_batches(split, batch_format="pyarrow"),
            ["l_returnflag"],
            {"high_line_count": ("high", "sum"), "low_line_count": ("low", "sum")},
        ).to_pandas()
        out = out.sort_values("l_returnflag").reset_index(drop=True)
        for c in ("high_line_count", "low_line_count"):
            out[c] = out[c].astype("int64")
        return out[["l_returnflag", "high_line_count", "low_line_count"]]

    def q_padding_waste_sweep(sf_dir):
        """Sequence-packing planner for LLM batching: for each
        candidate max_len, how many fixed-length sequences the corpus
        fills when every doc is chunked independently
        (n_seqs = Σ ceil(tokens/L)) and how many pad tokens that
        wastes (Σ n_seqs·L − tokens), plus waste ppm — the report
        that picks the context length BEFORE a tokenize-and-pack run.
        ONE streaming pass computes whitespace token counts
        (the token_counts split semantics); per-L arithmetic is
        integer and block-local, a |L|-bounded combiner folds the
        totals. Text never shuffles."""
        from ocr_service_ray.ops.agg import grouped_agg

        max_lens = [64, 128, 256]
        docs = _read(sf_dir, "documents", ["text"])

        def plan(b: pa.Table) -> pa.Table:
            ntok = pc.add(pc.count_substring(b["text"], " "), 1).to_numpy(
                zero_copy_only=False
            ).astype(np.int64)
            rows = []
            for L in max_lens:
                nseq = -(-ntok // L)  # ceil div, pure int
                rows.append(
                    {
                        "max_len": L,
                        "n_docs": int(len(ntok)),
                        "n_seqs": int(nseq.sum()),
                        "n_pad": int((nseq * L - ntok).sum()),
                    }
                )
            return pa.Table.from_pylist(rows)

        out = grouped_agg(
            docs.map_batches(plan, batch_format="pyarrow"),
            ["max_len"],
            {
                "n_docs": ("n_docs", "sum"),
                "n_seqs": ("n_seqs", "sum"),
                "n_pad": ("n_pad", "sum"),
            },
        ).to_pandas()
        out = out.sort_values("max_len").reset_index(drop=True)
        for c in ("max_len", "n_docs", "n_seqs", "n_pad"):
            out[c] = out[c].astype("int64")
        out["pad_ppm"] = (
            out["n_pad"] * 1000000 // (out["n_seqs"] * out["max_len"])
        ).astype("int64")
        return out

    def q_compaction_bins_orders(sf_dir):
        """Small-file compaction planner (the lakehouse OPTIMIZE
        bin-assignment shape): treat each o_orderdate's row count as
        one input file, walk files in date order and assign each to
        bin = floor(preceding_cumulative / target) — the sequential
        greedy plan a compactor executes. The per-date counts come
        from ONE combiner aggregate (raw rows never shuffle); the
        prefix scan runs on the |days|-bounded partial table
        (driver-side by the scan.py two-phase contract — block
        metadata scale, not data scale)."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        target = 2000
        per_day = grouped_agg(
            _read(sf_dir, "orders", ["o_orderdate"]),
            ["o_orderdate"],
            {"n_rows": (None, "count")},
        ).to_pandas()
        per_day = per_day.sort_values("o_orderdate").reset_index(drop=True)
        n = per_day["n_rows"].astype("int64").to_numpy()
        cum_before = np.concatenate(([0], np.cumsum(n)[:-1]))
        per_day["bin"] = (cum_before // target).astype("int64")
        out = (
            per_day.groupby("bin", as_index=False)
            .agg(
                n_files=("o_orderdate", "count"),
                total_rows=("n_rows", "sum"),
                first_day=("o_orderdate", "min"),
                last_day=("o_orderdate", "max"),
            )
            .sort_values("bin")
            .reset_index(drop=True)
        )
        out["n_files"] = out["n_files"].astype("int64")
        out["total_rows"] = out["total_rows"].astype("int64")
        out["first_day"] = pd.to_datetime(out["first_day"])
        out["last_day"] = pd.to_datetime(out["last_day"])
        return out[["bin", "n_files", "total_rows", "first_day", "last_day"]]

    def q_boilerplate_prefix_share(sf_dir):
        """Source boilerplate detector (the C4 header/nav heuristic):
        per source, the modal first-3-token prefix, how many docs
        start with it, and its share of the source in ppm — a high
        share flags a sitewide boilerplate header worth stripping.
        Prefixes are extracted vectorized (split → slice → join, no
        Python loop); counts fold through the value-counts combiner
        (grouped_mode) so raw text never shuffles; the per-source
        totals come from a second |sources|-bounded combiner and the
        final stitch is a |sources|-row driver merge."""
        from ocr_service_ray.ops.agg import grouped_agg, grouped_mode

        docs = _read(sf_dir, "documents", ["source", "text"])

        def prefix(b: pa.Table) -> pa.Table:
            toks = pc.split_pattern(b["text"], " ")
            p3 = pc.binary_join(pc.list_slice(toks, 0, 3), " ")
            return pa.table({"source": b["source"], "prefix3": p3})

        pref = docs.map_batches(prefix, batch_format="pyarrow")
        modal = grouped_mode(pref, ["source"], "prefix3").to_pandas()
        totals = grouped_agg(
            _read(sf_dir, "documents", ["source"]),
            ["source"],
            {"n_docs": (None, "count")},
        ).to_pandas()
        out = modal.merge(totals, on="source")
        out["mode_count"] = out["mode_count"].astype("int64")
        out["n_docs"] = out["n_docs"].astype("int64")
        out["share_ppm"] = (out["mode_count"] * 1000000 // out["n_docs"]).astype(
            "int64"
        )
        out = out.sort_values("source").reset_index(drop=True)
        out = out.rename(columns={"mode": "prefix3"})
        return out[["source", "prefix3", "mode_count", "n_docs", "share_ppm"]]

    def q_mannwhitney_u_value(sf_dir):
        """Mann-Whitney rank-sum U between click and purchase event
        values, integer-exact: ranking a value depends only on the
        per-distinct-value counts, so the raw rows never move — ONE
        value-counts combiner produces (value, n_click, n_purchase),
        the |distinct|-bounded partial table sorts driver-side (the
        event_value_quantiles discipline) and tie-averaged ranks stay
        integer as avg_rank×2 = 2·cum_before + n_ties + 1. Completes
        the nonparametric family next to Kendall / Spearman / KS."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        ev = _read(sf_dir, "events", ["event_type", "value"])

        def split(b: pa.Table) -> pa.Table:
            keep = pc.is_in(
                b["event_type"], value_set=pa.array(["click", "purchase"])
            )
            b = b.filter(keep)
            is_click = pc.equal(b["event_type"], "click")
            return pa.table(
                {
                    "value": b["value"],
                    "n_click": pc.cast(is_click, pa.int64()),
                    "n_purchase": pc.cast(pc.invert(is_click), pa.int64()),
                }
            )

        vc = grouped_agg(
            ev.map_batches(split, batch_format="pyarrow"),
            ["value"],
            {"n_click": ("n_click", "sum"), "n_purchase": ("n_purchase", "sum")},
        ).to_pandas()
        vc = vc.sort_values("value").reset_index(drop=True)
        n_ties = (vc["n_click"] + vc["n_purchase"]).astype("int64").to_numpy()
        cum_before = np.concatenate(([0], np.cumsum(n_ties)[:-1]))
        avg2 = 2 * cum_before + n_ties + 1
        n1 = int(vc["n_click"].sum())
        n2 = int(vc["n_purchase"].sum())
        r1_times2 = int((vc["n_click"].to_numpy() * avg2).sum())
        # U1 = R1 - n1(n1+1)/2, so 2*U1 = 2*R1 - n1(n1+1); equals the
        # pairwise 2*#(click>purchase) + #(click==purchase)
        u1_times2 = r1_times2 - n1 * (n1 + 1)
        return pd.DataFrame(
            {
                "n_click": [n1],
                "n_purchase": [n2],
                "r1_times2": [r1_times2],
                "u_times2": [u1_times2],
            }
        ).astype("int64")

    def q_simpson_flip_audit(sf_dir):
        """Simpson's-paradox audit over order prices: per priority,
        does mean totalprice of status F minus status O have the same
        sign as the corpus-wide difference? Sign of a mean difference
        is the sign of the cross-multiplication sum_f·n_o − sum_o·n_f
        — pure integer, no division (the repo's cross-multiplied
        threshold discipline). One combiner aggregate per (priority,
        status); the flip test runs on the |priorities|-bounded
        partial table."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        od = _read(
            sf_dir, "orders", ["o_orderpriority", "o_orderstatus", "o_totalprice"]
        )

        def cents(b: pa.Table) -> pa.Table:
            keep = pc.is_in(b["o_orderstatus"], value_set=pa.array(["F", "O"]))
            b = b.filter(keep)
            c = np.floor(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "o_orderpriority": b["o_orderpriority"],
                    "o_orderstatus": b["o_orderstatus"],
                    "cents": pa.array(c),
                }
            )

        g = grouped_agg(
            od.map_batches(cents, batch_format="pyarrow"),
            ["o_orderpriority", "o_orderstatus"],
            {"n": (None, "count"), "s": ("cents", "sum")},
        ).to_pandas()
        piv = g.pivot_table(
            index="o_orderpriority",
            columns="o_orderstatus",
            values=["n", "s"],
            aggfunc="sum",
            fill_value=0,
        )
        out = pd.DataFrame(
            {
                "o_orderpriority": piv.index,
                "n_f": piv[("n", "F")].astype("int64").to_numpy(),
                "n_o": piv[("n", "O")].astype("int64").to_numpy(),
                "s_f": piv[("s", "F")].astype("int64").to_numpy(),
                "s_o": piv[("s", "O")].astype("int64").to_numpy(),
            }
        )
        cross = out["s_f"] * out["n_o"] - out["s_o"] * out["n_f"]
        out["sign"] = np.sign(cross).astype("int64")
        tot_cross = int(out["s_f"].sum()) * int(out["n_o"].sum()) - int(
            out["s_o"].sum()
        ) * int(out["n_f"].sum())
        out["overall_sign"] = np.int64(np.sign(tot_cross))
        out["flipped"] = (
            (out["sign"] != 0) & (out["sign"] != out["overall_sign"])
        ).astype("int64")
        out = out.sort_values("o_orderpriority").reset_index(drop=True)
        return out[
            ["o_orderpriority", "n_f", "n_o", "sign", "overall_sign", "flipped"]
        ]

    def q_cdc_upsert_orders(sf_dir):
        """CDC changelog upsert (the MERGE INTO / compaction shape):
        a deterministic update stream (every 7th orderkey flips to
        status 'U' at seq 2) unions with the seq-1 base snapshot and
        the latest version per key wins. The union is one extra
        streaming map over the SAME pruned read (no second scan
        source), the latest-per-key fold is a per-key max-seq
        combiner + equality filter — base rows never sort, only
        (key, seq) partials shuffle. Output: final status census."""
        from ocr_service_ray.ops.agg import grouped_agg

        od = _read(sf_dir, "orders", ["o_orderkey", "o_orderstatus"])

        def changelog(b: pa.Table) -> pa.Table:
            key = b["o_orderkey"].to_numpy(zero_copy_only=False)
            upd = key % 7 == 0
            base = pa.table(
                {
                    "o_orderkey": b["o_orderkey"],
                    "status": b["o_orderstatus"],
                    "seq": pa.array(np.ones(len(key), np.int64)),
                }
            )
            updates = pa.table(
                {
                    "o_orderkey": pa.array(key[upd]),
                    "status": pa.array(["U"] * int(upd.sum()), pa.string()),
                    "seq": pa.array(np.full(int(upd.sum()), 2, np.int64)),
                }
            )
            return pa.concat_tables([base, updates])

        log = od.map_batches(changelog, batch_format="pyarrow")
        # latest-per-key: per-key max seq is a combiner aggregate;
        # a row survives iff its seq equals its key's max
        latest = grouped_agg(log, ["o_orderkey"], {"max_seq": ("seq", "max")})

        def final_status(b: pa.Table) -> pa.Table:
            # seq-2 rows exist exactly for key%7==0; the winner's
            # status is derivable without re-joining the log (the
            # changelog is deterministic) — 'U' iff max_seq == 2
            mx = b["max_seq"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "o_orderkey": b["o_orderkey"],
                    "is_upd": pa.array((mx == 2).astype(np.int64)),
                }
            )

        from ocr_service_ray.ops.agg import global_agg

        n_upd = int(
            global_agg(
                latest.map_batches(final_status, batch_format="pyarrow"),
                {"n": ("is_upd", "sum")},
            )["n"]
        )
        base_counts = grouped_agg(
            od.map_batches(
                lambda b: b.filter(
                    pa.array(
                        b["o_orderkey"].to_numpy(zero_copy_only=False) % 7 != 0
                    )
                ),
                batch_format="pyarrow",
            ).select_columns(["o_orderstatus"]),
            ["o_orderstatus"],
            {"n_orders": (None, "count")},
        ).to_pandas()
        import pandas as pd

        out = pd.concat(
            [
                base_counts.rename(columns={"o_orderstatus": "status"}),
                pd.DataFrame({"status": ["U"], "n_orders": [n_upd]}),
            ],
            ignore_index=True,
        )
        out["n_orders"] = out["n_orders"].astype("int64")
        return out.sort_values("status").reset_index(drop=True)

    def q_max_token_run(sf_dir):
        """Gopher-style repetition rule the existing repetition_stats
        does not cover: the longest CONSECUTIVE run of one token per
        document (boilerplate separators and stuttering generators
        show up as long runs). Row-local — computed in one streaming
        pass, top-20 runs by block-local top-k; the oracle rebuilds
        runs with SQL gaps-and-islands over the unnested token list."""
        from ocr_service_ray.ops.relational import topk

        docs = _read(sf_dir, "documents", ["doc_id", "text"])

        def runs(b: pa.Table) -> pa.Table:
            out = []
            for txt in b["text"].to_pylist():
                a = np.asarray(txt.split(" "), dtype=object)
                if len(a) < 2:
                    out.append(1)
                    continue
                eq = (a[1:] == a[:-1]).astype(np.int8)
                if not eq.any():
                    out.append(1)
                    continue
                d = np.diff(np.concatenate(([0], eq, [0])))
                starts = np.flatnonzero(d == 1)
                ends = np.flatnonzero(d == -1)
                out.append(int((ends - starts).max()) + 1)
            return pa.table(
                {"doc_id": b["doc_id"], "max_run": pa.array(out, pa.int64())}
            )

        return topk(
            docs.map_batches(runs, batch_format="pyarrow"),
            by=["max_run", "doc_id"],
            k=20,
            descending=[True, False],
        )

    def q_hash_bucket_uniformity(sf_dir):
        """Shuffle-health audit: are md5 bucket assignments uniform
        enough that no hash-partitioned exchange gets a hot
        aggregator? Buckets events by md5('bkt:'||event_id) % 64 (the
        exact SQL-reproducible u64 convention of hash_sample_docs),
        folds per-bucket counts through one combiner, and reports the
        integer chi-square numerator Σ(o·k − n)² plus min/max bucket
        occupancy — scale-free integers a monitor can threshold
        without float arithmetic."""
        import hashlib

        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        K = 64
        ev = _read(sf_dir, "events", ["event_id"])

        def bucket(b: pa.Table) -> pa.Table:
            out = np.empty(b.num_rows, np.int64)
            for i, e in enumerate(b["event_id"].to_pylist()):
                d = hashlib.md5(f"bkt:{e}".encode()).digest()
                out[i] = int.from_bytes(d[:8], "big") % K
            return pa.table({"b": pa.array(out)})

        c = grouped_agg(
            ev.map_batches(bucket, batch_format="pyarrow"),
            ["b"],
            {"o": (None, "count")},
        ).to_pandas()
        # densify: an empty bucket still contributes (0·k − n)²
        o = np.zeros(K, np.int64)
        o[c["b"].astype(int).to_numpy()] = c["o"].astype("int64").to_numpy()
        n = int(o.sum())
        dev = o * K - n
        return pd.DataFrame(
            {
                "n_rows": [n],
                "n_buckets": [K],
                "min_bucket_n": [int(o.min())],
                "max_bucket_n": [int(o.max())],
                "chisq_num": [int((dev * dev).sum())],
            }
        ).astype("int64")

    def q_token_budget_cap(sf_dir):
        """Per-source token-budget trimming (the curation shape AFTER
        per-domain doc caps: each source may contribute at most B
        tokens, earliest doc_ids first). Whitespace token counts are
        one streaming pass; the in-group prefix sum rides
        cumulative_by_key (bucketed key shuffle + in-group cumsum —
        raw text never moves, only (source, doc_id, ntok) partials);
        the budget filter and census are vectorized."""
        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import cumulative_by_key

        budget = 5000
        docs = _read(sf_dir, "documents", ["source", "doc_id", "text"])

        def ntok(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "source": b["source"],
                    "doc_id": b["doc_id"],
                    "ntok": pc.cast(
                        pc.add(pc.count_substring(b["text"], " "), 1), pa.int64()
                    ),
                }
            )

        folded = cumulative_by_key(
            docs.map_batches(ntok, batch_format="pyarrow"),
            "source",
            ["doc_id"],
            "ntok",
            out_col="cum",
        )
        kept = folded.map_batches(
            lambda b: b.filter(pc.less_equal(b["cum"], budget)),
            batch_format="pyarrow",
        )
        out = grouped_agg(
            kept,
            ["source"],
            {"n_docs_kept": (None, "count"), "tokens_kept": ("ntok", "sum")},
        ).to_pandas()
        out = out.sort_values("source").reset_index(drop=True)
        out["n_docs_kept"] = out["n_docs_kept"].astype("int64")
        out["tokens_kept"] = out["tokens_kept"].astype("int64")
        return out

    def q_cube_revenue(sf_dir):
        """GROUPING-SETS lattice (GROUP BY CUBE) via partial reuse:
        the FINEST grain (priority, status) is aggregated ONCE with a
        combiner; every coarser grouping set — (priority, ALL),
        (ALL, status), (ALL, ALL) — is derived from that |P×S|-bounded
        partial driver-side. One scan builds the whole cube; a naive
        engine would scan once per grouping set."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        od = _read(
            sf_dir, "orders", ["o_orderpriority", "o_orderstatus", "o_totalprice"]
        )

        def cents(b: pa.Table) -> pa.Table:
            c = np.floor(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "o_orderpriority": b["o_orderpriority"],
                    "o_orderstatus": b["o_orderstatus"],
                    "cents": pa.array(c),
                }
            )

        fine = grouped_agg(
            od.map_batches(cents, batch_format="pyarrow"),
            ["o_orderpriority", "o_orderstatus"],
            {"n_orders": (None, "count"), "revenue_cents": ("cents", "sum")},
        ).to_pandas()
        fine["n_orders"] = fine["n_orders"].astype("int64")
        fine["revenue_cents"] = fine["revenue_cents"].astype("int64")
        sets = [fine]
        for keys, drop in (
            (["o_orderpriority"], "o_orderstatus"),
            (["o_orderstatus"], "o_orderpriority"),
            ([], None),
        ):
            if keys:
                g = fine.groupby(keys, as_index=False)[
                    ["n_orders", "revenue_cents"]
                ].sum()
                g[drop] = "ALL"
            else:
                g = pd.DataFrame(
                    {
                        "o_orderpriority": ["ALL"],
                        "o_orderstatus": ["ALL"],
                        "n_orders": [int(fine["n_orders"].sum())],
                        "revenue_cents": [int(fine["revenue_cents"].sum())],
                    }
                )
            sets.append(g)
        out = pd.concat(sets, ignore_index=True)
        out["n_orders"] = out["n_orders"].astype("int64")
        out["revenue_cents"] = out["revenue_cents"].astype("int64")
        out = out.sort_values(
            ["o_orderpriority", "o_orderstatus"]
        ).reset_index(drop=True)
        return out[
            ["o_orderpriority", "o_orderstatus", "n_orders", "revenue_cents"]
        ]

    def q_vacuum_plan_orders(sf_dir):
        """Snapshot-retention VACUUM planner (the lakehouse
        expire-snapshots shape): each o_orderdate epoch-day is one
        data file; a deterministic rewrite schedule versions it —
        snapshot s rewrites day d iff (d + s) % 3 == 0, so
        version(d, s) = max rewriting s' <= s (0 = base). Snapshots
        {2, 3} are retained, snapshot 1 expires: a (day, version)
        file is deletable iff snapshot 1 references it and no live
        snapshot does. Per-day row counts come from ONE combiner
        (raw rows never shuffle); the version/set arithmetic runs on
        the |days|-bounded partial."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        per_day = grouped_agg(
            _read(sf_dir, "orders", ["o_orderdate"]).map_batches(
                lambda b: pa.table(
                    {
                        "day": pa.array(
                            b["o_orderdate"]
                            .cast(pa.int64())
                            .to_numpy(zero_copy_only=False)
                            // 86_400_000_000
                        )
                    }
                ),
                batch_format="pyarrow",
            ),
            ["day"],
            {"n_rows": (None, "count")},
        ).to_pandas()
        d = per_day["day"].astype("int64").to_numpy()

        def version(s: int) -> np.ndarray:
            v = np.zeros(len(d), np.int64)
            for sp in range(1, s + 1):
                v = np.where((d + sp) % 3 == 0, sp, v)
            return v

        v1, v2, v3 = version(1), version(2), version(3)
        deletable = (v1 != v2) & (v1 != v3)
        n = per_day["n_rows"].astype("int64").to_numpy()
        # live set = {(d, v2)} ∪ {(d, v3)} — count distinct pairs
        live = {(int(a), int(b)) for a, b in zip(d, v2)} | {
            (int(a), int(b)) for a, b in zip(d, v3)
        }
        return pd.DataFrame(
            {
                "n_days": [len(d)],
                "n_live_files": [len(live)],
                "n_deletable": [int(deletable.sum())],
                "rows_reclaimed": [int(n[deletable].sum())],
            }
        ).astype("int64")

    def q_sorted_lcp_docs(sf_dir):
        """Adjacent longest-common-prefix stats over the GLOBALLY
        text-sorted corpus — the exact form of prefix-duplication
        estimation (the fixed-width prefix-hash leakage audits are
        its sketch). The one all-to-all this op needs is the range-
        partition sort (``ds.sort``); after it, per-BLOCK summaries
        (first/last text + inner LCP partials) flow to the driver —
        |blocks| rows, never data — and the |blocks|−1 boundary pairs
        are stitched there, the scan.py two-phase discipline. Inner
        LCPs are byte-wise per consecutive pair (O(total chars), the
        same work any kernel would do)."""
        import pandas as pd

        docs = _read(sf_dir, "documents", ["doc_id", "text"]).sort(
            ["text", "doc_id"]
        )

        def lcp(a: str, b: str) -> int:
            m = min(len(a), len(b))
            i = 0
            while i < m and a[i] == b[i]:
                i += 1
            return i

        def block_summary(b: pa.Table) -> pa.Table:
            t = b["text"].to_pylist()
            if not t:
                return pa.table(
                    {
                        "first_text": pa.array([], pa.string()),
                        "first_id": pa.array([], pa.int64()),
                        "last_text": pa.array([], pa.string()),
                        "n_rows": pa.array([], pa.int64()),
                        "n_pairs": pa.array([], pa.int64()),
                        "sum_lcp": pa.array([], pa.int64()),
                        "max_lcp": pa.array([], pa.int64()),
                        "n_ge_40": pa.array([], pa.int64()),
                    }
                )
            ls = [lcp(t[i - 1], t[i]) for i in range(1, len(t))]
            return pa.table(
                {
                    "first_text": pa.array([t[0]]),
                    "first_id": pa.array([b["doc_id"][0].as_py()], pa.int64()),
                    "last_text": pa.array([t[-1]]),
                    "n_rows": pa.array([len(t)], pa.int64()),
                    "n_pairs": pa.array([len(ls)], pa.int64()),
                    "sum_lcp": pa.array([int(sum(ls))], pa.int64()),
                    "max_lcp": pa.array([max(ls) if ls else 0], pa.int64()),
                    "n_ge_40": pa.array(
                        [int(sum(1 for x in ls if x >= 40))], pa.int64()
                    ),
                }
            )

        meta = (
            docs.map_batches(
                block_summary, batch_format="pyarrow", batch_size=None
            )
            .to_pandas()
            .sort_values(["first_text", "first_id"])
            .reset_index(drop=True)
        )
        n_pairs = int(meta["n_pairs"].sum())
        sum_lcp = int(meta["sum_lcp"].sum())
        max_lcp = int(meta["max_lcp"].max()) if len(meta) else 0
        n_ge_40 = int(meta["n_ge_40"].sum())
        for i in range(1, len(meta)):
            x = lcp(meta["last_text"].iloc[i - 1], meta["first_text"].iloc[i])
            n_pairs += 1
            sum_lcp += x
            max_lcp = max(max_lcp, x)
            n_ge_40 += int(x >= 40)
        return pd.DataFrame(
            {
                "n_docs": [int(meta["n_rows"].sum())],
                "n_pairs": [n_pairs],
                "sum_lcp": [sum_lcp],
                "max_lcp": [max_lcp],
                "n_ge_40": [n_ge_40],
            }
        ).astype("int64")

    def q_skew_join_user_age(sf_dir):
        """Hybrid skew join (ops/skew.py skew_join): events join their
        user's first-seen epoch-day. Hot users (count ≥ 8× the mean
        per-user load, detected by one combiner census) take a
        BROADCAST map-side path — their rows never enter the shuffle —
        while cold users take the hash-partitioned join, now skew-free.
        Both paths are exact, so the DuckDB oracle is a plain join.
        Output: per event_type, event count and summed account age in
        days at event time."""
        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.skew import skew_join

        ev = _read(sf_dir, "events", ["user_id", "event_type", "ts"])

        def day(b: pa.Table) -> pa.Table:
            d = b["ts"].cast(pa.int64()).to_numpy(
                zero_copy_only=False
            ) // 86_400_000_000
            return pa.table(
                {
                    "user_id": b["user_id"],
                    "event_type": b["event_type"],
                    "day": pa.array(d),
                }
            )

        days = ev.map_batches(day, batch_format="pyarrow")
        dim = grouped_agg(
            days.select_columns(["user_id", "day"]),
            ["user_id"],
            {"first_day": ("day", "min")},
        )
        joined = skew_join(days, dim, "user_id")

        def age(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "event_type": b["event_type"],
                    "age_days": pc.subtract(b["day"], b["first_day"]),
                }
            )

        out = grouped_agg(
            joined.map_batches(age, batch_format="pyarrow"),
            ["event_type"],
            {"n_events": (None, "count"), "sum_age_days": ("age_days", "sum")},
        ).to_pandas()
        out = out.sort_values("event_type").reset_index(drop=True)
        out["n_events"] = out["n_events"].astype("int64")
        out["sum_age_days"] = out["sum_age_days"].astype("int64")
        return out[["event_type", "n_events", "sum_age_days"]]

    def q_positional_delete_orders(sf_dir):
        """Merge-on-read with POSITIONAL delete vectors (the Iceberg
        v2 shape): each o_orderdate epoch-day is one data file, a
        row's position is its 0-based rank by o_orderkey within the
        file, and the delete files mark (file, pos) where
        (file + pos) % 11 == 3. The rank is the one keyed exchange
        (bucketed day shuffle + in-group sort — the
        cumulative_by_key discipline, (day, key, status, cents)
        partials only); the delete-vector check and the surviving
        census are vectorized. Output: per status, surviving rows +
        revenue cents."""
        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import cumulative_by_key

        od = _read(
            sf_dir,
            "orders",
            ["o_orderkey", "o_orderstatus", "o_orderdate", "o_totalprice"],
        )

        def prep(b: pa.Table) -> pa.Table:
            day = b["o_orderdate"].cast(pa.int64()).to_numpy(
                zero_copy_only=False
            ) // 86_400_000_000
            cents = np.floor(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "day": pa.array(day),
                    "o_orderkey": b["o_orderkey"],
                    "o_orderstatus": b["o_orderstatus"],
                    "cents": pa.array(cents),
                    "one": pa.array(np.ones(len(day), np.int64)),
                }
            )

        ranked = cumulative_by_key(
            od.map_batches(prep, batch_format="pyarrow"),
            "day",
            ["o_orderkey"],
            "one",
            out_col="rn",
        )

        def survivors(b: pa.Table) -> pa.Table:
            day = b["day"].to_numpy(zero_copy_only=False)
            pos = b["rn"].to_numpy(zero_copy_only=False) - 1
            keep = (day + pos) % 11 != 3
            b = b.filter(pa.array(keep))
            return b.select(["o_orderstatus", "cents"])

        out = grouped_agg(
            ranked.map_batches(survivors, batch_format="pyarrow"),
            ["o_orderstatus"],
            {"n_rows": (None, "count"), "revenue_cents": ("cents", "sum")},
        ).to_pandas()
        out = out.sort_values("o_orderstatus").reset_index(drop=True)
        out["n_rows"] = out["n_rows"].astype("int64")
        out["revenue_cents"] = out["revenue_cents"].astype("int64")
        return out[["o_orderstatus", "n_rows", "revenue_cents"]]

    def q_isotonic_purchase_rate(sf_dir):
        """Isotonic (PAV) calibration of purchase rate vs hour of day:
        the monotone fit every probability calibrator ships, computed
        by the minimax identity fitted[i] = max_{j<=i} min_{k>=i}
        avg(y[j..k]) on the |hours|-bounded combiner partial (n, Σy
        per hour) — raw events never shuffle; the O(|x|³) minimax is
        driver arithmetic on 24 rows. Rates compare exactly across
        engines because every division is IEEE double of exact
        integers and only the final floor(·×1e6) is emitted."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        ev = _read(sf_dir, "events", ["ts", "event_type"])

        def hour_flag(b: pa.Table) -> pa.Table:
            h = (
                b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
                // 3_600_000_000
            ) % 24
            y = pc.cast(
                pc.equal(b["event_type"], "purchase"), pa.int64()
            )
            return pa.table({"hour": pa.array(h.astype(np.int64)), "y": y})

        g = (
            grouped_agg(
                ev.map_batches(hour_flag, batch_format="pyarrow"),
                ["hour"],
                {"n": (None, "count"), "s": ("y", "sum")},
            )
            .to_pandas()
            .sort_values("hour")
            .reset_index(drop=True)
        )
        n = g["n"].astype("int64").to_numpy()
        s = g["s"].astype("int64").to_numpy()
        m = len(g)
        cn = np.concatenate(([0], np.cumsum(n)))
        cs = np.concatenate(([0], np.cumsum(s)))
        # avg over [j..k] inclusive (float64 of exact ints — IEEE-
        # identical to the DuckDB oracle's double arithmetic)
        fitted = np.empty(m, np.float64)
        for i in range(m):
            best = -np.inf
            for j in range(i + 1):
                lo = np.inf
                for k in range(i, m):
                    a = (cs[k + 1] - cs[j]) / (cn[k + 1] - cn[j])
                    if a < lo:
                        lo = a
                if lo > best:
                    best = lo
            fitted[i] = best
        return pd.DataFrame(
            {
                "hour": g["hour"].astype("int64"),
                "n": n,
                "s": s,
                "rate_ppm": np.floor(s * 1_000_000.0 / n).astype("int64"),
                "fitted_ppm": np.floor(fitted * 1_000_000.0).astype("int64"),
            }
        )

    def q_gmd_value_by_type(sf_dir):
        """Gini mean difference of event value cents per type — the
        pairwise-dispersion statistic Σ_{i<j}|v_i−v_j|, integer-exact
        WITHOUT forming pairs: for a distinct value v with count c and
        C predecessors in a group of n, its contribution is
        v·c·(2C + c − n), so ONE value-counts combiner + a per-type
        sorted fold on the |distinct|-bounded partial computes the
        O(n²) sum in O(distinct) work."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        ev = _read(sf_dir, "events", ["event_type", "value"])

        def cents(b: pa.Table) -> pa.Table:
            c = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table({"event_type": b["event_type"], "v": pa.array(c)})

        vc = (
            grouped_agg(
                ev.map_batches(cents, batch_format="pyarrow"),
                ["event_type", "v"],
                {"cnt": (None, "count")},
            )
            .to_pandas()
            .sort_values(["event_type", "v"])
            .reset_index(drop=True)
        )
        rows = []
        for et, grp in vc.groupby("event_type", sort=True):
            c = grp["cnt"].astype("int64").to_numpy()
            v = grp["v"].astype("int64").to_numpy()
            ntot = int(c.sum())
            cbefore = np.concatenate(([0], np.cumsum(c)[:-1]))
            contrib = v * c * (2 * cbefore + c - ntot)
            rows.append(
                {
                    "event_type": et,
                    "n": ntot,
                    "sum_absdiff": int(contrib.sum()),
                }
            )
        out = pd.DataFrame(rows)
        out["n"] = out["n"].astype("int64")
        out["sum_absdiff"] = out["sum_absdiff"].astype("int64")
        return out

    def q_logistic_gd_purchase(sf_dir):
        """Distributed logistic regression (ops/logistic.py): 15
        rounds of full-batch GD predicting purchase from (bias,
        hour/24, cents-mod-1e5/1e5). Weights broadcast per round; one
        map_batches pass folds each block to dim micro-int gradient
        partials — features never shuffle, byte-identical under any
        layout (asserted vs a numpy reference + repartitioned run in
        pytest). No SQL oracle — iterative float model fitting is not
        SQL-expressible; the driver records rows-only and the pytest
        reference is byte-exact (the kmeans discipline)."""
        import pandas as pd

        from ocr_service_ray.ops.logistic import logistic_gd

        ev = _read(sf_dir, "events", ["ts", "event_type", "value"])

        def feats(b: pa.Table) -> pa.Table:
            tsus = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            hour = ((tsus // 3_600_000_000) % 24).astype(np.float64) / 24.0
            cents = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            v = (cents % 100_000).astype(np.float64) / 100_000.0
            y = pc.cast(pc.equal(b["event_type"], "purchase"), pa.int64())
            X = np.stack([np.ones(len(hour)), hour, v], axis=1)
            return pa.table(
                {
                    "x": pa.array(list(X), pa.list_(pa.float64())),
                    "y": y,
                }
            )

        w, n = logistic_gd(
            ev.map_batches(feats, batch_format="pyarrow").materialize(),
            dim=3,
            iters=15,
            lr=1.0,
        )
        return pd.DataFrame(
            {
                "dim": np.arange(3, dtype=np.int64),
                "w_micro": np.floor(w * 1_000_000.0 + 0.5).astype("int64"),
                "n_rows": np.full(3, n, dtype=np.int64),
            }
        )

    def q_conformal_threshold(sf_dir):
        """Split-conformal threshold + empirical coverage: events
        hash-split into calibration/validation halves (the md5-uniform
        split discipline — zero RNG, layout-invariant), threshold =
        the conformal quantile min{v : #(calib ≤ v) ≥
        ceil(0.9·(n_cal+1))}, coverage = validation share ≤ threshold.
        ONE value-counts combiner per (side, cents) feeds BOTH the
        threshold search and the coverage census driver-side — one
        scan, |distinct|-bounded partials, raw rows never shuffle."""
        import hashlib

        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        ev = _read(sf_dir, "events", ["event_id", "value"])

        def tag(b: pa.Table) -> pa.Table:
            cents = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            is_cal = np.empty(len(cents), np.int64)
            for i, e in enumerate(b["event_id"].to_pylist()):
                d = hashlib.md5(f"conf:{e}".encode()).digest()
                is_cal[i] = int(int.from_bytes(d[:8], "big") % 2 == 0)
            return pa.table(
                {
                    "v": pa.array(cents),
                    "nc": pa.array(is_cal),
                    "nv": pa.array(1 - is_cal),
                }
            )

        vc = (
            grouped_agg(
                ev.map_batches(tag, batch_format="pyarrow"),
                ["v"],
                {"nc": ("nc", "sum"), "nv": ("nv", "sum")},
            )
            .to_pandas()
            .sort_values("v")
            .reset_index(drop=True)
        )
        nc = vc["nc"].astype("int64").to_numpy()
        nv = vc["nv"].astype("int64").to_numpy()
        v = vc["v"].astype("int64").to_numpy()
        n_cal, n_val = int(nc.sum()), int(nv.sum())
        k = (9 * (n_cal + 1) + 9) // 10  # ceil(0.9*(n_cal+1)), pure int
        cum = np.cumsum(nc)
        idx = int(np.searchsorted(cum, k, side="left"))
        threshold = int(v[idx]) if idx < len(v) else int(v[-1])
        covered = int(nv[v <= threshold].sum())
        return pd.DataFrame(
            {
                "n_cal": [n_cal],
                "n_val": [n_val],
                "threshold": [threshold],
                "covered": [covered],
                "coverage_ppm": [covered * 1_000_000 // n_val],
            }
        ).astype("int64")

    def q_bloom_semi_orders(sf_dir):
        """Bloom-filter semi-join (ops/bloom.py): orders of BUILDING-
        segment customers, revenue by priority. The bloom bitmap
        (128 KiB regardless of key count) rejects ~80% of fact rows
        with a few vectorized uint64 ops before the exact is_in
        verify — false positives never reach the output, so the
        result equals the plain semi-join and the oracle needs no
        bloom arithmetic."""
        import pyarrow.parquet as _pq

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.bloom import bloom_semi_join

        cu = _pq.read_table(
            f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
        )
        keys = cu.filter(pc.equal(cu["c_mktsegment"], "BUILDING"))[
            "c_custkey"
        ].to_pylist()
        od = _read(
            sf_dir, "orders", ["o_custkey", "o_orderpriority", "o_totalprice"]
        )
        filt = bloom_semi_join(od, keys, on="o_custkey")

        def cents(b: pa.Table) -> pa.Table:
            c = np.floor(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {"o_orderpriority": b["o_orderpriority"], "cents": pa.array(c)}
            )

        out = grouped_agg(
            filt.map_batches(cents, batch_format="pyarrow"),
            ["o_orderpriority"],
            {"n_orders": (None, "count"), "total_cents": ("cents", "sum")},
        ).to_pandas()
        out = out.sort_values("o_orderpriority").reset_index(drop=True)
        out["n_orders"] = out["n_orders"].astype("int64")
        out["total_cents"] = out["total_cents"].astype("int64")
        return out[["o_orderpriority", "n_orders", "total_cents"]]

    def q_containment_pairs(sf_dir):
        """Asymmetric near-dup (ops/containment.py): rare-gram-blocked
        containment pairs — the quote/subset shape Jaccard dedup
        misses. Candidates share a gram with df in [2,5]; exact
        verification moves candidate rows only."""
        from ocr_service_ray.ops.containment import containment_pairs

        return containment_pairs(
            _read(sf_dir, "documents", ["doc_id", "text"]),
            n=3,
            max_df=5,
            tau_ppm=200_000,
        )

    def q_dsir_selection(sf_dir):
        """DSIR-style data selection (ops/importance.py): rank the
        non-German raw pool by hashed unigram+bigram target-likeness
        vs the lang='de' target set. Two scans, n_buckets-bounded
        state: pass 1 folds every gram occurrence to 256 md5 buckets
        per side (one combiner), the integer odds weights
        ((ct+1)*1e6)//(cr+1) broadcast once, pass 2 scores raw docs
        with block-local top-k heads. Deterministic rank (avg_weight
        DESC, doc_id) replaces DSIR's Gumbel resampling — zero RNG,
        SQL-exact."""
        from ocr_service_ray.ops.importance import importance_scores

        def is_de(b: pa.Table) -> np.ndarray:
            return pc.equal(b["lang"], "de").to_numpy(zero_copy_only=False)

        return importance_scores(
            _read(sf_dir, "documents", ["doc_id", "text", "lang"]),
            is_de,
            n_buckets=256,
            top_n=50,
        )

    def q_zorder_stats_orders(sf_dir):
        """Z-order vs linear clustering stats (ops/zorder.py): the
        per-file min/max footer statistics a ZORDER BY (o_custkey,
        total_cents) rewrite of orders into 16 files would produce,
        next to the single-column linear layout — the planner view
        that quantifies multi-column pruning before paying for the
        rewrite. One scan + one |files|-bounded combiner; quantization
        and the Morton interleave are pure integer floor arithmetic,
        re-derived term-by-term in the oracle."""
        from ocr_service_ray.ops.zorder import zorder_file_stats

        ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

        def cents(b: pa.Table) -> pa.Table:
            c = np.floor(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table({"custkey": b["o_custkey"], "cents": pa.array(c)})

        out = zorder_file_stats(
            ds.map_batches(cents, batch_format="pyarrow"),
            "custkey",
            "cents",
            bits=8,
            n_files=16,
        )
        for c in ["file_id", "n_rows", "min_x", "max_x", "min_y", "max_y"]:
            out[c] = out[c].astype("int64")
        return out

    def q_novelty_report(sf_dir):
        """Per-val-doc trigram novelty vs the train split — the
        memorization / train-val overlap audit (ops/novelty.py).
        Split is the md5-uniform stratified assignment (zero RNG,
        layout-invariant); grams explode per-doc DISTINCT in-block,
        the train vocabulary stays distributed and meets the val
        pairs in ONE gram-keyed hash join (no broadcast of a
        web-scale gram set); novelty_ppm is integer floor."""
        from ocr_service_ray.ops.novelty import novelty_report
        from ocr_service_ray.ops.relational import stratified_split

        docs = stratified_split(
            _read(sf_dir, "documents", ["doc_id", "text"]), "doc_id", 0.8
        )
        train = docs.filter(
            lambda r: r["split"] == "train"
        )
        val = docs.filter(lambda r: r["split"] == "val")
        return novelty_report(train, val, n=3)

    def q_pagerank_nations(sf_dir):
        """Integer-exact PageRank over the nation trade graph
        (supplier nation → customer nation, weight = lineitem count;
        ops/pagerank.py): 3 fixed power-iteration rounds, rank vector
        broadcast per round, per-edge floor-div contributions folded
        by a combiner — edges never shuffle, every round is one scan.
        The oracle unrolls the identical integer rounds as a CTE
        chain."""
        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.pagerank import pagerank
        from ocr_service_ray.ops.relational import hash_join

        import pyarrow.parquet as _pq
        import ray as _ray
        import ray.data as rd

        supp = dict(
            zip(
                *[
                    _pq.read_table(
                        f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"],
                    )[c].to_pylist()
                    for c in ("s_suppkey", "s_nationkey")
                ]
            )
        )
        cust = dict(
            zip(
                *[
                    _pq.read_table(
                        f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"],
                    )[c].to_pylist()
                    for c in ("c_custkey", "c_nationkey")
                ]
            )
        )
        supp_ref, cust_ref = _ray.put(supp), _ray.put(cust)

        def order_nation(b: pa.Table) -> pa.Table:
            cm = _ray.get(cust_ref)
            dn = np.array(
                [cm[int(k)] for k in b["o_custkey"].to_pylist()], dtype=np.int64
            )
            return pa.table({"o_orderkey": b["o_orderkey"], "dst": pa.array(dn)})

        def supp_nation(b: pa.Table) -> pa.Table:
            sm = _ray.get(supp_ref)
            sn = np.array(
                [sm[int(k)] for k in b["l_suppkey"].to_pylist()], dtype=np.int64
            )
            return pa.table({"l_orderkey": b["l_orderkey"], "src": pa.array(sn)})

        od = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
            order_nation, batch_format="pyarrow"
        )
        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"]).map_batches(
            supp_nation, batch_format="pyarrow"
        )
        joined = hash_join(li, od, on="l_orderkey", right_on="o_orderkey")
        edges = grouped_agg(
            joined, ["src", "dst"], {"w": (None, "count")}
        ).to_pandas()
        return pagerank(rd.from_pandas(edges), weight_col="w", iters=3)

    def q_attribution_linear(sf_dir):
        """Linear multi-touch attribution (ops/attribution.py): each
        purchase credits the user's view/click touches of the prior
        24h equally in integer ppm, remainder to the earliest touch
        (credits per conversion sum to exactly 1e6). ONE bucketed
        user shuffle + per-user searchsorted windows — the engine
        never pays the O(conversions x touches) self-join the SQL
        oracle runs."""
        from ocr_service_ray.ops.attribution import linear_attribution

        return linear_attribution(
            _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"])
        )

    def q_reading_order_docs(sf_dir):
        """Layout reading order (ops/layout.py): column clustering by
        x-gap + column-major (column, y, x) ordering per page — the
        XY-cut-family layout-parse step, run on deterministic
        synthetic span geometry (real boxes come from the stubbed PDF
        decode stage; the sandbox multimodal contract). One bucketed
        page shuffle; pages are independent by construction."""
        from ocr_service_ray.ops.layout import reading_order

        def synth_geometry(b: pa.Table) -> pa.Table:
            did = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            nch = b["n_chars"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "page_id": pa.array(did % 20),
                    "span_id": pa.array(did),
                    "x": pa.array((nch * 13) % 997),
                    "y": pa.array((did * 31) % 991),
                }
            )

        spans = _read(sf_dir, "documents", ["doc_id", "n_chars"]).map_batches(
            synth_geometry, batch_format="pyarrow"
        )
        out = reading_order(spans, gap_threshold=50).to_pandas()
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out.sort_values(["page_id", "read_order"]).reset_index(drop=True)

    def q_delta_dedup(sf_dir):
        """Incremental dedup of an appended shard vs the standing
        corpus (ops/incremental.py): documents md5-split 80/20 into
        base/delta; each delta doc classified dup_exact (content hash
        in base or an earlier delta doc), dup_near (MinHash band join
        to base, est >= 0.4) or unique. One content-hash join + one
        (band, band_hash) join — the maintenance shape that never
        re-dedupes the base."""
        from ocr_service_ray.ops.incremental import delta_dedup
        from ocr_service_ray.ops.relational import stratified_split

        docs = stratified_split(
            _read(sf_dir, "documents", ["doc_id", "text"]),
            "doc_id",
            0.8,
            salt="delta",
        )
        base = docs.filter(lambda r: r["split"] == "train").drop_columns(
            ["split"]
        )
        delta = docs.filter(lambda r: r["split"] == "val").drop_columns(
            ["split"]
        )
        return delta_dedup(base, delta)

    def q_pca_top_component(sf_dir):
        """Top principal direction of the embedding table via 3
        power-iteration rounds (ops/pca.py) — broadcast v, micro-int
        contribution partials, Linf renormalization (no sqrt). The
        ONLY exactly-oracled iterative linear-algebra op: the oracle
        unrolls the identical rounds (fixed-order dot generated as a
        left-assoc SQL expression) and hash-matches bit for bit."""
        from ocr_service_ray.ops.pca import pca_top_component

        return pca_top_component(
            _read(sf_dir, "embeddings", ["embedding"]), iters=3
        )

    def q_cdc_chunk_stats(sf_dir):
        """Content-defined chunking summary (ops/chunking.py
        content_defined_chunks): trigram-hash Rabin-style boundaries
        (md5 % 16 == 0), exploded chunks folded to one corpus row —
        docs, chunks, distinct chunk hashes and the chunk-level dup
        rate CDC exists to expose. Flat-map + two combiner counts."""
        from ocr_service_ray.ops.agg import global_agg, grouped_agg
        from ocr_service_ray.ops.chunking import content_defined_chunks

        chunks = content_defined_chunks(
            _read(sf_dir, "documents", ["doc_id", "text"])
        )
        import pandas as _pd

        per_hash = grouped_agg(chunks, ["chunk_md5"], {"n": (None, "count")})
        tot = global_agg(chunks, {"n_chunks": (None, "count")})
        n_chunks = int(tot["n_chunks"])
        n_distinct = int(per_hash.count())
        n_docs = int(_read(sf_dir, "documents", ["doc_id"]).count())
        return _pd.DataFrame(
            {
                "n_docs": _pd.Series([n_docs], dtype="int64"),
                "n_chunks": _pd.Series([n_chunks], dtype="int64"),
                "n_distinct_chunks": _pd.Series([n_distinct], dtype="int64"),
                "dup_chunk_ppm": _pd.Series(
                    [(n_chunks - n_distinct) * 1_000_000 // n_chunks],
                    dtype="int64",
                ),
            }
        )

    def q_curriculum_order(sf_dir):
        """Curriculum interleave (ops/curriculum.py): docs ranked by
        (n_chars, doc_id) via the two-phase global rank, cut into 10
        exact deciles, emitted at position pos_in_decile*10 + decile —
        a deterministic difficulty-stratified training order (every
        contiguous window sees all deciles). Pure integer arithmetic
        on the rank; row_number() reproduces it exactly."""
        from ocr_service_ray.ops.curriculum import curriculum_interleave

        out = curriculum_interleave(
            _read(sf_dir, "documents", ["doc_id", "n_chars"]),
            ["n_chars", "doc_id"],
        ).to_pandas()
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out.sort_values("out_pos").reset_index(drop=True)

    def q_stream_stream_join(sf_dir):
        """Watermark-bounded stream-stream interval join
        (ops/streaming.py stream_stream_join): every (view, purchase)
        pair of the same user with the purchase inside the view's
        following hour, emitted exactly once by keyed actors holding
        ONE window of per-user state (evicted by the watermark) — the
        engine never pays the range self-join the SQL oracle runs."""
        from ocr_service_ray.ops.streaming import stream_stream_join

        out = stream_stream_join(
            _read(sf_dir, "events", ["event_id", "ts", "user_id", "event_type"]),
            window_minutes=60.0,
        ).to_pandas()
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out.sort_values(
            ["user_id", "left_id", "right_id"]
        ).reset_index(drop=True)

    def q_ann_recall(sf_dir):
        """ANN recall@5 eval (ops/similarity.ann_recall_eval): the LSH
        index's restricted search vs exact brute force for the 10
        lowest-id query vectors — the index-quality gate, exactly
        oracled because the LSH restriction is pure arithmetic the
        SQL reproduces (brute ground truth is the expensive side,
        which is why the eval runs on a bounded query sample)."""
        import pyarrow.parquet as _pq

        from ocr_service_ray.ops.similarity import LshIndex, ann_recall_eval

        emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        idx = LshIndex(nbits=4, radius=1).build(emb, dim=64)
        t = _pq.read_table(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        order = np.argsort(t["vec_id"].to_numpy())[:10]
        queries = np.array(
            [t["embedding"].to_pylist()[i] for i in order], dtype=np.float64
        )
        return ann_recall_eval(emb, idx, queries, k=5)

    def q_bpe_merge_pairs(sf_dir):
        """BPE first-merge candidates (ops/text.bpe_merge_pairs): top
        20 adjacent character-pair frequencies over all word
        occurrences — the tokenizer-training bootstrap table. Block
        Counter partials (alphabet-squared-bounded) + one combiner."""
        from ocr_service_ray.ops.text import bpe_merge_pairs

        return bpe_merge_pairs(_read(sf_dir, "documents", ["text"]))

    def q_bootstrap_value_ci(sf_dir):
        """Poisson bootstrap CI for mean event value per type
        (ops/bootstrap.py — the Chamandy-style distributed bootstrap):
        32 deterministic md5-Poisson(1) resamples ride ONE combiner
        exchange of |types|x32 partials; the 5th/95th resample-mean
        order statistics bound the mean. Zero RNG; the oracle
        recomputes every draw."""
        from ocr_service_ray.ops.bootstrap import poisson_bootstrap_ci

        def cents_fn(b: pa.Table):
            c = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return (
                b["event_type"].to_pylist(),
                b["event_id"].to_pylist(),
                c,
            )

        return poisson_bootstrap_ci(
            _read(sf_dir, "events", ["event_id", "event_type", "value"]),
            "event_type",
            "event_id",
            cents_fn,
        )

    def q_quantization_error(sf_dir):
        """int8 quantization reconstruction-error audit per dimension
        (ops/vector.quantization_error_audit): the decide-before-
        reindex compression audit; pico-int squared-error partials,
        bit-exact vs the SQL replay of the identical arithmetic."""
        from ocr_service_ray.ops.vector import quantization_error_audit

        return quantization_error_audit(
            _read(sf_dir, "embeddings", ["embedding"])
        )

    def q_mmr_select(sf_dir):
        """Diverse top-5 via Maximal Marginal Relevance
        (ops/similarity.mmr_select): one scan + combiner top-20 pool
        (vectors ride along), driver greedy over pool-squared 6dp
        cosines — the RAG-serving dedup move. The oracle unrolls the
        greedy step by step with identical float parenthesization."""
        from ocr_service_ray.ops.similarity import mmr_select

        return mmr_select(
            _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
            _query_vec(sf_dir),
            k=5,
            pool=20,
        )

    def q_event_path_trigrams(sf_dir):
        """Top-10 event-type trigram paths over per-user ts-ordered
        timelines — funnel-shape discovery (the sequential-pattern
        sibling of markov_stationary). One bucketed user shuffle,
        Counter partials, one combiner top-k."""
        from ocr_service_ray.ops.agg import bucketed_map_groups, grouped_agg

        ev = _read(sf_dir, "events", ["user_id", "ts", "event_id", "event_type"])

        def per_user(g):
            import pandas as _pd

            t = g.sort_values(["ts", "event_id"])["event_type"].to_list()
            if len(t) < 3:
                return None
            from collections import Counter

            cnt = Counter(
                f"{a}>{b}>{c}" for a, b, c in zip(t, t[1:], t[2:])
            )
            return _pd.DataFrame(
                {"path": list(cnt.keys()), "c": list(cnt.values())}
            )

        counts = grouped_agg(
            bucketed_map_groups(ev, ["user_id"], per_user),
            ["path"],
            {"n": ("c", "sum")},
        ).to_pandas()
        counts["n"] = counts["n"].astype("int64")
        return (
            counts.sort_values(["n", "path"], ascending=[False, True])
            .head(10)
            .reset_index(drop=True)
        )

    def q_label_noise(sf_dir):
        """kNN label-disagreement audit (ops/similarity.
        label_noise_audit — the cleanlab move): rows whose 5 nearest
        in-LSH-cell neighbors majority-vote a different label. One
        bucketed cell shuffle + in-cell matmul; the LSH restriction
        and the vote are replayed exactly in SQL."""
        from ocr_service_ray.ops.similarity import label_noise_audit

        return label_noise_audit(
            _read(sf_dir, "embeddings", ["vec_id", "embedding", "label"])
        )

    def q_dup_cluster_histogram(sf_dir):
        """Near-dup cluster size distribution: minhash pairs →
        connected components (ops/graph.py) → per-cluster size →
        histogram — the dedup-impact report (how much of the corpus
        sits in how-big duplicate families). Two combiner counts over
        the |clusters|-bounded label table."""
        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.graph import connected_components

        pairs = dedup.minhash_lsh_candidates(
            _read(sf_dir, "documents", ["doc_id", "text"]), threshold=0.4
        )
        comps = connected_components(pairs)
        sizes = grouped_agg(
            comps, ["cluster_id"], {"size": (None, "count")}
        )
        hist = grouped_agg(
            sizes, ["size"], {"n_clusters": (None, "count")}
        ).to_pandas()
        hist = hist.rename(columns={"size": "cluster_size"})
        for c in hist.columns:
            hist[c] = hist[c].astype("int64")
        return hist.sort_values("cluster_size").reset_index(drop=True)

    def q_redaction_audit(sf_dir):
        """PII-scrub verification (compose ops/quality_rules.
        redact_patterns with a residual re-scan): per rule, the
        redactions made AND the matches still present afterwards —
        the zero-residual proof a privacy review wants, not just the
        scrub itself. Two stateless RE2 passes, one combiner sum."""
        import pandas as _pd

        from ocr_service_ray.ops.agg import global_agg
        from ocr_service_ray.ops.quality_rules import redact_patterns

        rules = [("num", "[0-9]{2,}", "<NUM>"), ("digit", "[0-9]", "#")]
        red = redact_patterns(
            _read(sf_dir, "events", ["event_id", "props"]),
            "props",
            rules,
            keep_cols=["event_id"],
        )

        def residual(b: pa.Table) -> pa.Table:
            cols = {
                f"n_{n}": b[f"n_{n}"] for n, _, _ in rules
            }
            for n, pat, _ in rules:
                cols[f"res_{n}"] = pc.cast(
                    pc.count_substring_regex(b["props"], pat), pa.int64()
                )
            return pa.table(cols)

        tot = global_agg(
            red.map_batches(residual, batch_format="pyarrow"),
            {
                **{f"n_{n}": (f"n_{n}", "sum") for n, _, _ in rules},
                **{f"res_{n}": (f"res_{n}", "sum") for n, _, _ in rules},
            },
        )
        return _pd.DataFrame(
            {
                "rule": [n for n, _, _ in rules],
                "n_redactions": _pd.Series(
                    [int(tot[f"n_{n}"]) for n, _, _ in rules], dtype="int64"
                ),
                "n_residual": _pd.Series(
                    [int(tot[f"res_{n}"]) for n, _, _ in rules], dtype="int64"
                ),
            }
        )

    def q_denormalize_orders(sf_dir):
        """Star-schema denormalization in ONE scan: orders enriched
        with customer segment, nation and region names via CHAINED
        broadcast dicts (ray.put once each — dims are small by
        definition; zero joins, zero shuffle). The ETL wide-table
        move; the oracle pays the three-way join. Returns a per
        (segment, nation, region) revenue rollup so the surface is
        hash-comparable without shipping 15k denormalized rows."""
        import pyarrow.parquet as _pq
        import ray as _ray

        from ocr_service_ray.ops.agg import grouped_agg

        def _dict(table, k, v):
            t = _pq.read_table(f"{sf_dir}/{table}.parquet", columns=[k, v])
            return dict(zip(t[k].to_pylist(), t[v].to_pylist()))

        cust_seg = _dict("customer", "c_custkey", "c_mktsegment")
        cust_nat = _dict("customer", "c_custkey", "c_nationkey")
        nat_name = _dict("nation", "n_nationkey", "n_name")
        nat_reg = _dict("nation", "n_nationkey", "n_regionkey")
        reg_name = _dict("region", "r_regionkey", "r_name")
        ref = _ray.put((cust_seg, cust_nat, nat_name, nat_reg, reg_name))

        def widen(b: pa.Table) -> pa.Table:
            cs, cn, nn, nr, rn = _ray.get(ref)
            cust = b["o_custkey"].to_pylist()
            cents = np.floor(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            seg = [cs[c] for c in cust]
            nk = [cn[c] for c in cust]
            return pa.table(
                {
                    "segment": pa.array(seg, pa.string()),
                    "nation": pa.array([nn[k] for k in nk], pa.string()),
                    "region": pa.array([rn[nr[k]] for k in nk], pa.string()),
                    "cents": pa.array(cents),
                }
            )

        out = grouped_agg(
            _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
                widen, batch_format="pyarrow"
            ),
            ["segment", "nation", "region"],
            {"n_orders": (None, "count"), "revenue_cents": ("cents", "sum")},
        ).to_pandas()
        for c in ("n_orders", "revenue_cents"):
            out[c] = out[c].astype("int64")
        return out.sort_values(
            ["segment", "nation", "region"]
        ).reset_index(drop=True)

    def q_neyman_sample(sf_dir):
        """Neyman-allocated stratified sample of 1000 events by type
        (ops/mix.neyman_sample): budget ∝ N_h·S_h from one integer
        moment combiner, Hamilton quotas, md5-rank draw — the
        variance-optimal labeling-budget spend, end to end
        deterministic and SQL-replayed (sqrt of an int is IEEE
        correctly rounded on both engines)."""
        from ocr_service_ray.ops.mix import neyman_sample

        ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

        def cents(b: pa.Table) -> pa.Table:
            c = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "event_type": b["event_type"],
                    "event_id": b["event_id"],
                    "cents": pa.array(c),
                }
            )

        out = neyman_sample(
            ev.map_batches(cents, batch_format="pyarrow"),
            "event_type",
            "event_id",
            "cents",
            total_n=1000,
        ).to_pandas()
        out["event_id"] = out["event_id"].astype("int64")
        return out.sort_values(["event_type", "event_id"]).reset_index(
            drop=True
        )

    def q_harmonic_mean_value(sf_dir):
        """Exact integer harmonic mean of positive event values per
        type: pico-scaled reciprocal partials (1e12 // cents) in one
        combiner, the final division in arbitrary-precision ints
        (HUGEINT in SQL) — the rate-averaging mean the arithmetic
        mean gets wrong; zero-cent rows excluded by contract."""
        import pandas as _pd

        from ocr_service_ray.ops.agg import grouped_agg

        def recip(b: pa.Table) -> pa.Table:
            c = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            m = c > 0
            return pa.table(
                {
                    "event_type": b["event_type"].filter(pa.array(m)),
                    "r": pa.array(1_000_000_000_000 // c[m]),
                }
            )

        agg = grouped_agg(
            _read(sf_dir, "events", ["event_type", "value"]).map_batches(
                recip, batch_format="pyarrow"
            ),
            ["event_type"],
            {"n": (None, "count"), "sr": ("r", "sum")},
        ).to_pandas()
        agg["hm_micro_cents"] = [
            int(n) * 10**18 // int(sr) for n, sr in zip(agg["n"], agg["sr"])
        ]
        agg["n"] = agg["n"].astype("int64")
        agg["hm_micro_cents"] = agg["hm_micro_cents"].astype("int64")
        return (
            agg[["event_type", "n", "hm_micro_cents"]]
            .sort_values("event_type")
            .reset_index(drop=True)
        )

    def q_churn_dataset(sf_dir):
        """Supervised churn-dataset builder — the feature/label
        temporal-split discipline: features from the 3-week window
        (events before 2024-01-22: counts, purchases, cents), label =
        purchased in the following week; users seen only in the label
        window are excluded (no feature leakage in either direction).
        ONE scan with indicator projections + one combiner per-user
        fold."""
        from ocr_service_ray.ops.agg import grouped_agg

        feat_end = np.datetime64("2024-01-22T00:00:00", "us").astype(np.int64)
        label_end = np.datetime64("2024-01-29T00:00:00", "us").astype(np.int64)

        def project(b: pa.Table) -> pa.Table:
            us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            cents = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            purch = np.array(
                [t == "purchase" for t in b["event_type"].to_pylist()]
            )
            in_feat = us < feat_end
            in_label = (us >= feat_end) & (us < label_end)
            return pa.table(
                {
                    "user_id": b["user_id"],
                    "f_ev": pa.array(in_feat.astype(np.int64)),
                    "f_purch": pa.array((in_feat & purch).astype(np.int64)),
                    "f_cents": pa.array(np.where(in_feat, cents, 0)),
                    "lbl": pa.array((in_label & purch).astype(np.int64)),
                }
            )

        out = grouped_agg(
            _read(
                sf_dir, "events", ["user_id", "ts", "event_type", "value"]
            ).map_batches(project, batch_format="pyarrow"),
            ["user_id"],
            {
                "n_events": ("f_ev", "sum"),
                "n_purchases": ("f_purch", "sum"),
                "value_cents": ("f_cents", "sum"),
                "lbl_n": ("lbl", "sum"),
            },
        ).to_pandas()
        out = out[out["n_events"] > 0].copy()
        out["label"] = (out["lbl_n"] > 0).astype("int64")
        out = out.drop(columns=["lbl_n"])
        for c in ("user_id", "n_events", "n_purchases", "value_cents"):
            out[c] = out[c].astype("int64")
        return out.sort_values("user_id").reset_index(drop=True)

    def q_token_fertility(sf_dir):
        """Tokenizer fertility per language: chars per whitespace
        token in ppm — the metric that decides whether a lang is
        token-efficient under a given vocab (high chars/token = CJK-
        style scripts suffer). One combiner; token count is the
        repo-wide count(' ')+1 convention."""
        import pandas as _pd

        from ocr_service_ray.ops.agg import grouped_agg

        def project(b: pa.Table) -> pa.Table:
            ntok = pc.add(
                pc.count_substring(b["text"], " "), pa.scalar(1)
            ).cast(pa.int64())
            return pa.table(
                {
                    "lang": b["lang"],
                    "n_chars": b["n_chars"],
                    "n_tokens": ntok,
                }
            )

        agg = grouped_agg(
            _read(sf_dir, "documents", ["lang", "text", "n_chars"]).map_batches(
                project, batch_format="pyarrow"
            ),
            ["lang"],
            {
                "n_docs": (None, "count"),
                "chars": ("n_chars", "sum"),
                "toks": ("n_tokens", "sum"),
            },
        ).to_pandas()
        agg["chars_per_token_ppm"] = (
            agg["chars"] * 1_000_000 // agg["toks"]
        ).astype("int64")
        for c in ("n_docs", "chars", "toks"):
            agg[c] = agg[c].astype("int64")
        return (
            agg.rename(columns={"chars": "n_chars", "toks": "n_tokens"})
            .sort_values("lang")
            .reset_index(drop=True)
        )

    def q_rfm_scores(sf_dir):
        """RFM customer scoring (recency/frequency/monetary deciles —
        the CRM segmentation standard): per-user last-event age,
        event count and cents sum from ONE combiner, then three
        exact-decile cuts via the two-phase global rank ((10·r)//n on
        a (value, user_id) total order — layout-invariant, no NTILE
        row-order dependence). rfm_code = 100·r + 10·f + m."""
        import pandas as _pd

        from ocr_service_ray.ops.agg import grouped_agg

        def project(b: pa.Table) -> pa.Table:
            us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            cents = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "user_id": b["user_id"],
                    "ts_us": pa.array(us),
                    "cents": pa.array(cents),
                }
            )

        per_user = grouped_agg(
            _read(sf_dir, "events", ["user_id", "ts", "value"]).map_batches(
                project, batch_format="pyarrow"
            ),
            ["user_id"],
            {
                "last_us": ("ts_us", "max"),
                "freq": (None, "count"),
                "monet": ("cents", "sum"),
            },
        ).to_pandas()
        n = len(per_user)

        def decile(col, asc=True):
            order = _pd.DataFrame(
                {"v": per_user[col], "u": per_user["user_id"]}
            ).sort_values(["v", "u"], ascending=[asc, True])
            r = np.empty(n, dtype=np.int64)
            r[order.index.to_numpy()] = np.arange(n)
            return (10 * r) // n

        # recency: MORE recent (larger last_us) = better = higher decile
        per_user["r_decile"] = decile("last_us", asc=True)
        per_user["f_decile"] = decile("freq", asc=True)
        per_user["m_decile"] = decile("monet", asc=True)
        per_user["rfm_code"] = (
            100 * per_user["r_decile"]
            + 10 * per_user["f_decile"]
            + per_user["m_decile"]
        )
        out = per_user[
            ["user_id", "r_decile", "f_decile", "m_decile", "rfm_code"]
        ].copy()
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out.sort_values("user_id").reset_index(drop=True)

    def q_chunk_dup_by_source(sf_dir):
        """Per-source boilerplate share at CHUNK granularity: the
        fraction of a source's CDC chunks that occur more than once
        in the corpus (ops/chunking.content_defined_chunks → one
        md5-count combiner → per-source fold) — finds template-heavy
        sources doc-level dedup misses."""
        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.chunking import content_defined_chunks
        from ocr_service_ray.ops.relational import hash_join

        docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])
        chunks = content_defined_chunks(docs)
        counts = grouped_agg(
            chunks, ["chunk_md5"], {"occ": (None, "count")}
        )
        src_map = docs.select_columns(["doc_id", "source"])
        with_src = hash_join(chunks, src_map, on="doc_id")
        with_cnt = hash_join(with_src, counts, on="chunk_md5")

        def mark(b: pa.Table) -> pa.Table:
            dup = pc.greater(b["occ"], 1)
            return pa.table(
                {
                    "source": b["source"],
                    "is_dup": pc.cast(dup, pa.int64()),
                }
            )

        out = grouped_agg(
            with_cnt.map_batches(mark, batch_format="pyarrow"),
            ["source"],
            {"n_chunks": (None, "count"), "n_dup": ("is_dup", "sum")},
        ).to_pandas()
        out["dup_share_ppm"] = (
            out["n_dup"] * 1_000_000 // out["n_chunks"]
        ).astype("int64")
        for c in ("n_chunks", "n_dup"):
            out[c] = out[c].astype("int64")
        return out.sort_values("source").reset_index(drop=True)

    def q_l_diversity_audit(sf_dir):
        """Distinct l-diversity audit (the companion to k-anonymity:
        a QI cell is safe only if its SENSITIVE attribute takes >= l
        distinct values): cells = (event_type, day), sensitive =
        user_id. Two chained combiner aggregates — the corpus never
        shuffles, only (cell, user) count rows; the second fold is
        |cells|-bounded."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

        def project(b: pa.Table) -> pa.Table:
            us = b["ts"].cast(pa.int64()).to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "event_type": b["event_type"],
                    "day": pa.array(us // 86_400_000_000),
                    "user_id": b["user_id"],
                }
            )

        pairs = grouped_agg(
            ev.map_batches(project, batch_format="pyarrow"),
            ["event_type", "day", "user_id"],
            {"c": (None, "count")},
        )
        cells = grouped_agg(
            pairs,
            ["event_type", "day"],
            {"l": (None, "count"), "n_events": ("c", "sum")},
        ).to_pandas()
        n_total = int(cells["n_events"].sum())
        low = cells[cells["l"] < 10]
        return pd.DataFrame(
            {
                "n_cells": [len(cells)],
                "min_l": [int(cells["l"].min())],
                "cells_below_l10": [len(low)],
                "events_low_ppm": [
                    (1_000_000 * int(low["n_events"].sum())) // n_total
                    if n_total
                    else 0
                ],
            }
        ).astype("int64")

    def q_randomized_response_counts(sf_dir):
        """Local-DP frequency estimation via randomized response
        (Warner's mechanism, the local-privacy standard): each event
        reports its true type w.p. 3/4, else a type drawn uniformly
        from the k types — both decided by the md5 draw on event_id,
        zero RNG, SQL-replayable. The unbiased share estimate inverts
        the perturbation with exact integer cross-multiplication:
        est_ppm = max(0, 4k·c_t − N)·1e6 // (3k·N). ONE scan counting
        (true_type, keep, slot) triples; the type list falls out of
        the same aggregate — no second pass."""
        import hashlib as _hl

        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        ev = _read(sf_dir, "events", ["event_id", "event_type"])

        # k (the type count) isn't known inside the scan, so the
        # combiner counts (true type, keep, slot_raw mod 840) — 840 =
        # lcm(1..8) means (slot840 % k) == ((u // 4) % k) for any
        # k <= 8; the mod-k fold happens at the driver on the
        # |types × 2 × 840|-bounded table.
        def project(b: pa.Table) -> pa.Table:
            ids = b["event_id"].to_pylist()
            u = [
                int(_hl.md5(f"rr:{i}".encode()).hexdigest()[:16], 16)
                for i in ids
            ]
            keep = np.array([x % 4 < 3 for x in u], dtype=np.int64)
            slot840 = np.array([(x // 4) % 840 for x in u], dtype=np.int64)
            return pa.table(
                {
                    "event_type": b["event_type"],
                    "keep": pa.array(keep),
                    "slot840": pa.array(slot840),
                }
            )

        agg = grouped_agg(
            ev.map_batches(project, batch_format="pyarrow"),
            ["event_type", "keep", "slot840"],
            {"c": (None, "count")},
        ).to_pandas()
        types = sorted(agg["event_type"].unique())
        k = len(types)
        assert 840 % k == 0, "k must divide 840 (holds for k <= 8)"
        n_total = int(agg["c"].sum())
        true_n = agg.groupby("event_type")["c"].sum()
        rep = {t: 0 for t in types}
        for _, r in agg.iterrows():
            if r["keep"] == 1:
                rep[r["event_type"]] += int(r["c"])
            else:
                rep[types[int(r["slot840"]) % k]] += int(r["c"])
        rows = []
        for i, t in enumerate(types):
            c_t = rep[t]
            num = max(0, 4 * k * c_t - n_total)
            rows.append(
                {
                    "event_type": t,
                    "n_true": int(true_n[t]),
                    "n_reported": c_t,
                    "true_share_ppm": (1_000_000 * int(true_n[t])) // n_total,
                    "est_share_ppm": (1_000_000 * num) // (3 * k * n_total),
                }
            )
        out = pd.DataFrame(rows)
        for c in out.columns[1:]:
            out[c] = out[c].astype("int64")
        return out

    def q_hits_nations(sf_dir):
        """HITS hubs & authorities over the nation trade graph
        (supplier nation → customer nation, weight = lineitem count;
        ops/hits.py): 2 fixed rounds of the mutual hub/authority
        recursion, each half-round one broadcast-score edge scan +
        one |nodes|-bounded combiner, sum-normalized in exact ppm
        integers. The oracle unrolls the identical half-rounds as a
        CTE chain. Edge build shares the pagerank_nations shape
        (broadcast dim lookups, one lineitem-orders join)."""
        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.hits import hits
        from ocr_service_ray.ops.relational import hash_join

        import pyarrow.parquet as _pq
        import ray as _ray
        import ray.data as rd

        supp = dict(
            zip(
                *[
                    _pq.read_table(
                        f"{sf_dir}/supplier.parquet",
                        columns=["s_suppkey", "s_nationkey"],
                    )[c].to_pylist()
                    for c in ("s_suppkey", "s_nationkey")
                ]
            )
        )
        cust = dict(
            zip(
                *[
                    _pq.read_table(
                        f"{sf_dir}/customer.parquet",
                        columns=["c_custkey", "c_nationkey"],
                    )[c].to_pylist()
                    for c in ("c_custkey", "c_nationkey")
                ]
            )
        )
        supp_ref, cust_ref = _ray.put(supp), _ray.put(cust)

        def order_nation(b: pa.Table) -> pa.Table:
            cm = _ray.get(cust_ref)
            dn = np.array(
                [cm[int(k)] for k in b["o_custkey"].to_pylist()], dtype=np.int64
            )
            return pa.table({"o_orderkey": b["o_orderkey"], "dst": pa.array(dn)})

        def supp_nation(b: pa.Table) -> pa.Table:
            sm = _ray.get(supp_ref)
            sn = np.array(
                [sm[int(k)] for k in b["l_suppkey"].to_pylist()], dtype=np.int64
            )
            return pa.table({"l_orderkey": b["l_orderkey"], "src": pa.array(sn)})

        od = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
            order_nation, batch_format="pyarrow"
        )
        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"]).map_batches(
            supp_nation, batch_format="pyarrow"
        )
        joined = hash_join(li, od, on="l_orderkey", right_on="o_orderkey")
        edges = grouped_agg(
            joined, ["src", "dst"], {"w": (None, "count")}
        ).to_pandas()
        return hits(rd.from_pandas(edges), weight_col="w", iters=2)

    def q_permutation_test_value(sf_dir):
        """Fisher-style randomization test for the purchase-vs-click
        mean-value difference, B=200 deterministic pseudo-permutations
        — zero RNG: draw b reassigns each pooled event to group A iff
        ((u·(2b+1) + b) mod 2^64 mod N) < nA, u = md5('perm:'+id).
        Extremeness is exact integer cross-multiplication (no float
        division ever): |sA·nB − sB·nA|·(nAo·nBo) >= obs·(nA_b·nB_b).
        ONE stats pass + ONE scan emitting B per-block partials into a
        B-row combiner; the B-row close runs on the driver with
        Python ints (products exceed int64 by design — SQL uses
        HUGEINT)."""
        import hashlib as _hl

        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        B = 200
        ev = _read(sf_dir, "events", ["event_id", "event_type", "value"])

        def cents_proj(b: pa.Table) -> pa.Table:
            b = b.filter(
                pc.is_in(
                    b["event_type"],
                    value_set=pa.array(["purchase", "click"]),
                )
            )
            c = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "event_id": b["event_id"],
                    "event_type": b["event_type"],
                    "cents": pa.array(c),
                }
            )

        pool = ev.map_batches(cents_proj, batch_format="pyarrow")
        obs = (
            grouped_agg(
                pool,
                ["event_type"],
                {"n": (None, "count"), "s": ("cents", "sum")},
            )
            .to_pandas()
            .set_index("event_type")
        )
        n_a, s_a = int(obs.loc["purchase", "n"]), int(obs.loc["purchase", "s"])
        n_b, s_b = int(obs.loc["click", "n"]), int(obs.loc["click", "s"])
        n_pool, s_pool = n_a + n_b, s_a + s_b
        diff_obs = abs(s_a * n_b - s_b * n_a)

        mults = np.arange(B, dtype=np.uint64) * np.uint64(2) + np.uint64(1)
        adds = np.arange(B, dtype=np.uint64)

        def draws(b: pa.Table) -> pa.Table:
            ids = b["event_id"].to_pylist()
            u = np.array(
                [
                    int(_hl.md5(f"perm:{i}".encode()).hexdigest()[:16], 16)
                    for i in ids
                ],
                dtype=np.uint64,
            )
            cents = b["cents"].to_numpy(zero_copy_only=False)
            with np.errstate(over="ignore"):
                # (rows, B) mixed draws, wrap mod 2^64 like HUGEINT % 2^64
                ub = u[:, None] * mults[None, :] + adds[None, :]
            assign = (ub % np.uint64(n_pool)) < np.uint64(n_a)
            return pa.table(
                {
                    "b": pa.array(np.arange(B, dtype=np.int64)),
                    "na": pa.array(assign.sum(axis=0).astype(np.int64)),
                    "sa": pa.array(
                        (assign * cents[:, None]).sum(axis=0).astype(np.int64)
                    ),
                }
            )

        per_b = (
            grouped_agg(
                pool.map_batches(draws, batch_format="pyarrow"),
                ["b"],
                {"na": ("na", "sum"), "sa": ("sa", "sum")},
            )
            .to_pandas()
            .sort_values("b")
        )
        n_extreme = 0
        for _, r in per_b.iterrows():
            na_b, sa_b = int(r["na"]), int(r["sa"])
            nb_b, sb_b = n_pool - na_b, s_pool - sa_b
            lhs = abs(sa_b * nb_b - sb_b * na_b) * (n_a * n_b)
            rhs = diff_obs * (na_b * nb_b)
            if lhs >= rhs:
                n_extreme += 1
        return pd.DataFrame(
            {
                "n_a": [n_a],
                "n_b": [n_b],
                "sum_a_cents": [s_a],
                "sum_b_cents": [s_b],
                "n_extreme": [n_extreme],
                "p_ppm": [(1_000_000 * (n_extreme + 1)) // (B + 1)],
            }
        ).astype("int64")

    def q_bloom_fpr_audit(sf_dir):
        """Bloom-filter false-positive-rate audit — measures the REAL
        fpr of the m=65536-bit / k=3 filter the bloom semi-join family
        relies on: build from URGENT order keys (one scan → distinct
        bit positions, |m|-bounded), probe with the disjoint
        non-URGENT keys (one scan against the broadcast 8 KiB bitmap),
        report observed fpr in ppm. Bit positions are
        md5('bloom{j}:'+key) % m — SQL replays the exact filter, so
        the audit is oracle-verifiable bit for bit."""
        import hashlib as _hl

        import pandas as pd
        import ray as _ray

        from ocr_service_ray.ops.agg import grouped_agg

        M, K = 65536, 3
        orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

        def member_positions(b: pa.Table) -> pa.Table:
            b = b.filter(pc.equal(b["o_orderpriority"], "1-URGENT"))
            keys = b["o_orderkey"].to_pylist()
            pos = [
                int(_hl.md5(f"bloom{j}:{k}".encode()).hexdigest()[:16], 16) % M
                for k in keys
                for j in range(K)
            ]
            return pa.table({"pos": pa.array(pos, pa.int64())})

        bits_tbl = grouped_agg(
            orders.map_batches(member_positions, batch_format="pyarrow"),
            ["pos"],
            {"c": (None, "count")},
        ).to_pandas()
        bitmap = np.zeros(M, dtype=bool)
        bitmap[bits_tbl["pos"].to_numpy()] = True
        n_set = int(bitmap.sum())
        n_members = int(bits_tbl["c"].sum()) // K
        bm_ref = _ray.put(bitmap)

        def probe(b: pa.Table) -> pa.Table:
            bm = _ray.get(bm_ref)
            b = b.filter(
                pc.invert(pc.equal(b["o_orderpriority"], "1-URGENT"))
            )
            keys = b["o_orderkey"].to_pylist()
            fp = 0
            for k in keys:
                if all(
                    bm[
                        int(
                            _hl.md5(f"bloom{j}:{k}".encode()).hexdigest()[:16],
                            16,
                        )
                        % M
                    ]
                    for j in range(K)
                ):
                    fp += 1
            return pa.table(
                {
                    "n_probes": pa.array([len(keys)], pa.int64()),
                    "n_fp": pa.array([fp], pa.int64()),
                }
            )

        agg = (
            orders.map_batches(probe, batch_format="pyarrow")
            .to_pandas()
            .sum()
        )
        n_probes, n_fp = int(agg["n_probes"]), int(agg["n_fp"])
        return pd.DataFrame(
            {
                "n_members": [n_members],
                "n_set_bits": [n_set],
                "n_probes": [n_probes],
                "n_false_pos": [n_fp],
                "fpr_ppm": [
                    (1_000_000 * n_fp) // n_probes if n_probes else 0
                ],
            }
        ).astype("int64")

    def q_quality_ece(sf_dir):
        """Expected calibration error of the quality score against
        the long-document label, 10 equal-width score bins. The
        per-bin (n_b/N)·|acc_b − conf_b| terms telescope to
        |1e6·n_pos_b − sum_score_b| / N, so the whole ECE is exact
        integer arithmetic over one per-bin combiner — no floats
        anywhere. ONE scan; the close is a 10-row fold."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.text import quality_score

        docs = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

        def score(b: pa.Table) -> pa.Table:
            q = quality_score(b, "text")
            s = q["quality_micro"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "bin": pa.array(np.minimum(s // 100_000, 9)),
                    "pos": pc.cast(
                        pc.greater_equal(b["n_chars"], 200), pa.int64()
                    ),
                    "s": pa.array(s),
                }
            )

        bins = grouped_agg(
            docs.map_batches(score, batch_format="pyarrow"),
            ["bin"],
            {"n_docs": (None, "count"), "n_pos": ("pos", "sum"), "sum_score": ("s", "sum")},
        ).to_pandas()
        n_total = int(bins["n_docs"].sum())
        gap = int(
            np.abs(
                1_000_000 * bins["n_pos"].to_numpy()
                - bins["sum_score"].to_numpy()
            ).sum()
        )
        bins["conf_ppm"] = bins["sum_score"] // bins["n_docs"]
        bins["acc_ppm"] = 1_000_000 * bins["n_pos"] // bins["n_docs"]
        bins["ece_ppm"] = gap // n_total
        out = bins[["bin", "n_docs", "conf_ppm", "acc_ppm", "ece_ppm"]].copy()
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out.sort_values("bin").reset_index(drop=True)

    def q_langid_kappa(sf_dir):
        """Cohen's kappa of the heuristic lang-ID against the declared
        lang — chance-corrected agreement, the single-number companion
        to langid_confusion. One stateless scoring map + one combiner
        over (lang, pred_lang); the kappa close is exact integer
        cross-multiplication on the |langs|²-bounded table (division
        truncates toward zero on BOTH engines — DuckDB `//` truncates,
        so the engine matches with sign-magnitude floor)."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops import text as text_ops

        docs = _read(sf_dir, "documents", ["doc_id", "lang", "text"])
        conf = grouped_agg(
            docs.map_batches(
                lambda b: text_ops.lang_id(b).drop_columns(["text", "doc_id"]),
                batch_format="pyarrow",
            ),
            ["lang", "pred_lang"],
            {"n": (None, "count")},
        ).to_pandas()
        n = int(conf["n"].sum())
        agree = int(conf[conf["lang"] == conf["pred_lang"]]["n"].sum())
        row = conf.groupby("lang")["n"].sum()
        col = conf.groupby("pred_lang")["n"].sum()
        chance = int(
            sum(int(row[l]) * int(col[l]) for l in row.index if l in col.index)
        )
        num = 1_000_000 * (n * agree - chance)
        den = n * n - chance
        kappa = (abs(num) // den) * (1 if num >= 0 else -1)
        return pd.DataFrame(
            {
                "n_docs": [n],
                "n_agree": [agree],
                "accuracy_ppm": [1_000_000 * agree // n],
                "expected_agree_ppm": [1_000_000 * chance // (n * n)],
                "kappa_ppm": [kappa],
            }
        ).astype("int64")

    def q_kruskal_rank_sums(sf_dir):
        """Kruskal-Wallis sufficient statistics across ALL event
        types on value — the k-group generalization of the
        mannwhitney machinery. Ranking depends only on per-distinct-
        value counts, so ONE (value, event_type) combiner aggregate
        is the whole data-parallel phase; the |distinct·types|-bounded
        partial table computes tie-averaged ranks (avg2 = 2·cum_before
        + ties + 1, integer), per-type rank sums r2 = 2·R_g, and the
        tie-correction term Σ(t³−t) driver-side. H itself is a
        rational of these integers (module discipline: emit the exact
        sufficient statistics, never a float)."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        ev = _read(sf_dir, "events", ["event_type", "value"])
        vc = grouped_agg(ev, ["value", "event_type"], {"c": (None, "count")}).to_pandas()
        tot = vc.groupby("value")["c"].sum().sort_index()
        t = tot.to_numpy().astype("int64")
        cum_before = np.concatenate(([0], np.cumsum(t)[:-1]))
        avg2 = pd.DataFrame(
            {"value": tot.index.to_numpy(), "avg2": 2 * cum_before + t + 1}
        )
        n_total = int(t.sum())
        tie_sum = int((t**3 - t).sum())
        m = vc.merge(avg2, on="value")
        m["r2_part"] = m["c"] * m["avg2"]
        g = (
            m.groupby("event_type")
            .agg(n=("c", "sum"), r2=("r2_part", "sum"))
            .reset_index()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        g["avg_rank_micro"] = (500_000 * g["r2"]) // g["n"]
        g["n_total"] = n_total
        g["tie_sum"] = tie_sum
        for c in ("n", "r2", "avg_rank_micro", "n_total", "tie_sum"):
            g[c] = g[c].astype("int64")
        return g

    def q_pr_curve_points(sf_dir):
        """Precision/recall/F1 at EVERY distinct quality-score
        threshold (predict long-doc when quality_micro >= t) — the
        full PR curve from ONE (score) value-counts combiner: the
        |distinct scores|-bounded partial table sorts descending
        driver-side and cumulative tp/fp give every operating point.
        All ratios are ppm integer floors (F1 = 2tp/(2tp+fp+fn) =
        2tp/(tp+fp+P)), so the curve is bit-exact vs SQL. Completes
        the ML-eval family next to quality_auc (one global number)
        with the threshold-sweep view a model-selection user needs."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.text import quality_score

        docs = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

        def score(b: pa.Table) -> pa.Table:
            q = quality_score(b, "text")
            return pa.table(
                {
                    "qm": q["quality_micro"],
                    "pos": pc.cast(
                        pc.greater_equal(b["n_chars"], 200), pa.int64()
                    ),
                }
            )

        vc = grouped_agg(
            docs.map_batches(score, batch_format="pyarrow"),
            ["qm"],
            {"n": (None, "count"), "np": ("pos", "sum")},
        ).to_pandas()
        vc = vc.sort_values("qm", ascending=False).reset_index(drop=True)
        tp = vc["np"].cumsum().astype("int64")
        fp = (vc["n"] - vc["np"]).cumsum().astype("int64")
        p_total = int(vc["np"].sum())
        out = pd.DataFrame(
            {
                "threshold": vc["qm"].astype("int64"),
                "tp": tp,
                "fp": fp,
                "precision_ppm": (1_000_000 * tp) // (tp + fp),
                "recall_ppm": (1_000_000 * tp) // p_total,
                "f1_ppm": (2_000_000 * tp) // (tp + fp + p_total),
            }
        )
        return out.astype("int64")

    def q_brier_decomposition(sf_dir):
        """Murphy decomposition of the Brier score of the quality
        score (milli-quantized to keep every square int64-safe) vs
        the long-doc label, 10 equal-width bins: per-bin integer
        numerators rel_num = (Σs − 1000·np)² (reliability, den
        1e6·n_b·N) and res_num = (N·np − P·n_b)² (resolution, den
        n_b·N³), plus the global brier_num = Σ(s_i − 1000·y_i)²
        (den 1e6·N). One scan, one per-bin combiner; every emitted
        number is an exact integer — the floats are the reader's
        division. Scale note: Σ s² ≤ 1e6·N bounds N at ~9e12 rows
        for int64 partials."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.text import quality_score

        docs = _read(sf_dir, "documents", ["doc_id", "text", "n_chars"])

        def score(b: pa.Table) -> pa.Table:
            q = quality_score(b, "text")
            s = q["quality_micro"].to_numpy(zero_copy_only=False) // 1000
            y = pc.cast(
                pc.greater_equal(b["n_chars"], 200), pa.int64()
            ).to_numpy(zero_copy_only=False)
            d = s - 1000 * y
            return pa.table(
                {
                    "bin": pa.array(np.minimum(s // 100, 9)),
                    "pos": pa.array(y),
                    "s": pa.array(s),
                    "sq": pa.array(d * d),
                }
            )

        bins = grouped_agg(
            docs.map_batches(score, batch_format="pyarrow"),
            ["bin"],
            {
                "n": (None, "count"),
                "n_pos": ("pos", "sum"),
                "sum_s": ("s", "sum"),
                "brier_part": ("sq", "sum"),
            },
        ).to_pandas()
        bins = bins.sort_values("bin").reset_index(drop=True)
        n_total = int(bins["n"].sum())
        p_total = int(bins["n_pos"].sum())
        brier_num = int(bins["brier_part"].sum())
        rel = (bins["sum_s"] - 1000 * bins["n_pos"]) ** 2
        res = (n_total * bins["n_pos"] - p_total * bins["n"]) ** 2
        out = pd.DataFrame(
            {
                "bin": bins["bin"],
                "n": bins["n"],
                "n_pos": bins["n_pos"],
                "sum_conf_milli": bins["sum_s"],
                "rel_num": rel,
                "res_num": res,
                "n_total": n_total,
                "p_total": p_total,
                "brier_num": brier_num,
            }
        )
        return out.astype("int64")

    def q_readability_scores(sf_dir):
        """Flesch-style reading-ease per document as an EXACT integer
        rational: with S = sentence runs ([.!?]+ matches, min 1), W =
        whitespace tokens (min 1), V = vowel-group syllable proxy
        ([aeiouy]+ runs over the lowercased text),

            flesch = 206.835 - 1.015·(W/S) - 84.6·(V/W)
                   = (206835·S·W - 1015·W² - 84600·V·S) / (1000·S·W)

        emitted as (flesch_num, flesch_den=S·W) — no floats, no
        floor-of-negative pitfalls. One stateless vectorized scan
        (pc.count_substring_regex ×3), pipelines with the read."""
        docs = _read(sf_dir, "documents", ["doc_id", "text"])

        def stats(b: pa.Table) -> pa.Table:
            t = b["text"]
            s = np.maximum(
                pc.count_substring_regex(t, r"[.!?]+").to_numpy(
                    zero_copy_only=False
                ),
                1,
            ).astype(np.int64)
            w = np.maximum(
                pc.count_substring_regex(t, r"\S+").to_numpy(
                    zero_copy_only=False
                ),
                1,
            ).astype(np.int64)
            v = pc.count_substring_regex(
                pc.utf8_lower(t), r"[aeiouy]+"
            ).to_numpy(zero_copy_only=False).astype(np.int64)
            num = 206835 * s * w - 1015 * w * w - 84600 * v * s
            return pa.table(
                {
                    "doc_id": b["doc_id"],
                    "n_sentences": pa.array(s),
                    "n_words": pa.array(w),
                    "n_vowel_groups": pa.array(v),
                    "flesch_num": pa.array(num),
                    "flesch_den": pa.array(s * w),
                }
            )

        return docs.map_batches(stats, batch_format="pyarrow")

    def q_phonetic_blocking(sf_dir):
        """Consonant-skeleton blocking over part names: per-skeleton
        block sizes and candidate-pair counts for blocks >= 2. The
        skeleton transform is RE2-safe (no backreferences) so the
        IDENTICAL regex chain runs in pyarrow and the DuckDB oracle;
        see ops/phonetic.py for the 100-TB shape (stateless map +
        one combiner count — pairs counted, never materialized)."""
        from ocr_service_ray.ops.phonetic import blocking_stats

        parts = _read(sf_dir, "part", ["p_name"])
        return blocking_stats(parts, "p_name")

    def q_cuped_moments(sf_dir):
        """CUPED variance-reduced A/B readout (Deng et al. 2013) over
        a deterministic user_id-parity arm split: pre metric X = per-
        user view cents, post metric Y = per-user purchase cents.
        Emits per-arm integer moments (n, sx, sy, sxx, sxy), the
        pooled theta as an exact rational (theta_num = N·Σxy − Σx·Σy,
        theta_den = N·Σxx − Σx²), and the CUPED-adjusted arm
        difference floored to micro-cents with the sign-split
        truncation pattern (HUGEINT in SQL, bigints here). Shape: one
        scan → per-user combiner fold (the only keyed exchange) →
        per-arm combiner → driver close on 2 rows."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        ev = _read(sf_dir, "events", ["user_id", "event_type", "value"])

        def prep(b: pa.Table) -> pa.Table:
            cents = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            et = b["event_type"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "user_id": b["user_id"],
                    "x": pa.array(np.where(et == "view", cents, 0)),
                    "y": pa.array(np.where(et == "purchase", cents, 0)),
                }
            )

        users = grouped_agg(
            ev.map_batches(prep, batch_format="pyarrow"),
            ["user_id"],
            {"x": ("x", "sum"), "y": ("y", "sum")},
        )

        def arm_moments(b: pa.Table) -> pa.Table:
            u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            x = b["x"].to_numpy(zero_copy_only=False).astype(np.int64)
            y = b["y"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "arm": pa.array(u % 2),
                    "one": pa.array(np.ones(len(u), np.int64)),
                    "x": pa.array(x),
                    "y": pa.array(y),
                    "xx": pa.array(x * x),
                    "xy": pa.array(x * y),
                }
            )

        arms = grouped_agg(
            users.map_batches(arm_moments, batch_format="pyarrow"),
            ["arm"],
            {
                "n_users": ("one", "sum"),
                "sx": ("x", "sum"),
                "sy": ("y", "sum"),
                "sxx": ("xx", "sum"),
                "sxy": ("xy", "sum"),
            },
        ).to_pandas()
        arms = arms.sort_values("arm").reset_index(drop=True)
        n = int(arms["n_users"].sum())
        sx, sy = int(arms["sx"].sum()), int(arms["sy"].sum())
        sxx, sxy = int(arms["sxx"].sum()), int(arms["sxy"].sum())
        theta_num = n * sxy - sx * sy
        theta_den = n * sxx - sx * sx
        a0, a1 = arms.iloc[0], arms.iloc[1]
        n0, n1 = int(a0["n_users"]), int(a1["n_users"])
        raw_num = int(a1["sy"]) * n0 - int(a0["sy"]) * n1
        pre_num = int(a1["sx"]) * n0 - int(a0["sx"]) * n1
        adj_num = raw_num * theta_den - theta_num * pre_num
        adj_den = n0 * n1 * theta_den
        scaled = 1_000_000 * adj_num
        adj_micro = (
            scaled // adj_den if scaled >= 0 else -((-scaled) // adj_den)
        )
        out = arms.copy()
        out["theta_num"] = theta_num
        out["theta_den"] = theta_den
        out["adj_diff_microcents"] = int(adj_micro)
        for c in out.columns:
            out[c] = out[c].astype("int64")
        return out

    def q_t_closeness_audit(sf_dir):
        """t-closeness (Li et al. 2007) of order prices within each
        o_orderpriority QI group vs the corpus: ordered EMD over 10
        fixed-width price bands, cross-multiplied to exact integers —
        emd_num = Σ_k |cum_gk·N − cum_k·n_g|, emd_den = n_g·N·9 —
        completing the privacy-audit triple next to k_anonymity_audit
        and l_diversity_audit (EMD is CUMULATIVE band mass, unlike
        the TV/KS families' pointwise or max deviations). One
        (priority, band) combiner; the close runs on a 10×|groups|
        partial table."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        od = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

        def band(b: pa.Table) -> pa.Table:
            v = b["o_totalprice"].to_numpy(zero_copy_only=False)
            k = np.minimum((v // 20000.0).astype(np.int64), 9)
            return pa.table(
                {"o_orderpriority": b["o_orderpriority"], "band": pa.array(k)}
            )

        pb = grouped_agg(
            od.map_batches(band, batch_format="pyarrow"),
            ["o_orderpriority", "band"],
            {"c": (None, "count")},
        ).to_pandas()
        n_total = int(pb["c"].sum())
        glob = (
            pb.groupby("band")["c"].sum().reindex(range(10), fill_value=0)
        )
        gcum = glob.cumsum().astype("int64")
        rows = []
        for prio, g in pb.groupby("o_orderpriority"):
            cg = (
                g.set_index("band")["c"].reindex(range(10), fill_value=0)
            ).cumsum().astype("int64")
            n_g = int(g["c"].sum())
            emd_num = int(
                np.abs(
                    cg.to_numpy() * n_total - gcum.to_numpy() * n_g
                )[:9].sum()
            )
            rows.append((prio, n_g, emd_num, n_g * n_total * 9))
        out = pd.DataFrame(
            rows, columns=["o_orderpriority", "n_g", "emd_num", "emd_den"]
        ).sort_values("o_orderpriority").reset_index(drop=True)
        for c in ("n_g", "emd_num", "emd_den"):
            out[c] = out[c].astype("int64")
        return out

    def q_range_partition_plan(sf_dir):
        """Range-partition plan for an 8-way range-write of orders by
        totalprice cents — exact K-quantile boundaries (value-counts
        combiner) + one assignment scan folded to per-partition
        (n_rows, min_v, max_v). See ops/rangeplan.py: this is the
        plan step of every distributed range sort, emitted as the
        balance audit."""
        from ocr_service_ray.ops.rangeplan import range_partition_plan

        od = _read(sf_dir, "orders", ["o_totalprice"])

        def cents(b: pa.Table) -> pa.Table:
            v = np.floor(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table({"v": pa.array(v)})

        return range_partition_plan(
            od.map_batches(cents, batch_format="pyarrow"), "v", 8
        )

    def q_runs_test_daily(sf_dir):
        """Wald-Wolfowitz runs test on the SIGN of day-over-day
        change in total daily event value (cents): one (day) combiner
        aggregate is the data-parallel phase; the ≤|days| partial
        series computes signs (zeros dropped, standard), the run
        count, and the exact rational E[R] = (2·n₊·n₋ + n)/n and
        Var[R] = 2n₊n₋(2n₊n₋−n) / (n²(n−1)) as integer num/den —
        the randomness audit for daily pipeline volume."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        ev = _read(sf_dir, "events", ["ts", "value"])

        def prep(b: pa.Table) -> pa.Table:
            ts_us = (
                b["ts"].to_numpy(zero_copy_only=False)
                .astype("datetime64[us]")
                .astype(np.int64)
            )
            cents = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {"day": pa.array(ts_us // 86_400_000_000), "c": pa.array(cents)}
            )

        daily = grouped_agg(
            ev.map_batches(prep, batch_format="pyarrow"),
            ["day"],
            {"tot": ("c", "sum")},
        ).to_pandas().sort_values("day").reset_index(drop=True)
        d = np.diff(daily["tot"].to_numpy().astype(np.int64))
        signs = np.sign(d)
        signs = signs[signs != 0]
        n_plus = int((signs > 0).sum())
        n_minus = int((signs < 0).sum())
        n = n_plus + n_minus
        n_runs = int(1 + (signs[1:] != signs[:-1]).sum()) if n > 0 else 0
        two_pm = 2 * n_plus * n_minus
        return pd.DataFrame(
            {
                "n_days": [len(daily)],
                "n_plus": [n_plus],
                "n_minus": [n_minus],
                "n_runs": [n_runs],
                "exp_num": [two_pm + n],
                "exp_den": [n],
                "var_num": [two_pm * (two_pm - n)],
                "var_den": [n * n * (n - 1)],
            }
        ).astype("int64")

    def q_resolve_parts(sf_dir):
        """Composed ENTITY-RESOLUTION pipeline over part names —
        blocking → verify → cluster → canonicalize, each stage an
        already-verified op: consonant-skeleton blocks
        (ops/phonetic.py — the 'stronger block key' fuzzy_pairs'
        docstring calls for at web scale), per-block Levenshtein <= 2
        verify (kernels/correct.py M7 parity kernel) bounded by the
        phonetic block sizes, connected components over the verified
        pair graph (ops/graph.py), canonical label = min partkey.
        Returns (p_partkey, canonical_key) for every entity touched
        by a pair; the oracle replays all four stages including the
        recursive-CTE closure."""
        import pandas as pd

        from ocr_service_ray.kernels.correct import levenshtein_distance
        from ocr_service_ray.ops.agg import bucketed_map_groups
        from ocr_service_ray.ops.graph import connected_components
        from ocr_service_ray.ops.phonetic import skeleton_array

        parts = _read(sf_dir, "part", ["p_partkey", "p_name"])

        def key(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "p_partkey": b["p_partkey"],
                    "p_name": b["p_name"],
                    "skeleton": skeleton_array(b["p_name"]),
                }
            )

        def pairs(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values("p_partkey")
            ids = g["p_partkey"].tolist()
            names = g["p_name"].tolist()
            out_a, out_b = [], []
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    if levenshtein_distance(names[i], names[j]) <= 2:
                        out_a.append(ids[i])
                        out_b.append(ids[j])
            return pd.DataFrame(
                {
                    "id_a": pd.array(out_a, dtype="int64"),
                    "id_b": pd.array(out_b, dtype="int64"),
                }
            )

        cand = bucketed_map_groups(
            parts.map_batches(key, batch_format="pyarrow"),
            ["skeleton"],
            pairs,
        )
        labels = connected_components(cand, "id_a", "id_b")

        def rename(b: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "p_partkey": b["node"],
                    "canonical_key": b["cluster_id"],
                }
            )

        return labels.map_batches(rename, batch_format="pyarrow")

    def q_median_of_means_value(sf_dir):
        """Median-of-means robust estimator of mean event value: 16
        deterministic event_id%16 buckets, ONE combiner aggregate
        produces the (n, sum) pairs, the lower-median bucket by mean
        (IEEE double ratio, tie-broken by bucket id — identical
        ordering on both engines) is the estimate, emitted as the
        exact (mom_num, mom_den) rational. The heavy-tail-robust
        alternative to the trimmed/winsorized family: no quantile
        pass, one scan, O(k) driver work."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        ev = _read(sf_dir, "events", ["event_id", "value"])

        def prep(b: pa.Table) -> pa.Table:
            eid = b["event_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            c = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table({"bucket": pa.array(eid % 16), "c": pa.array(c)})

        a = grouped_agg(
            ev.map_batches(prep, batch_format="pyarrow"),
            ["bucket"],
            {"n": (None, "count"), "s": ("c", "sum")},
        ).to_pandas()
        a["mean"] = a["s"].astype("float64") / a["n"].astype("float64")
        a = a.sort_values(["mean", "bucket"]).reset_index(drop=True)
        med = a.iloc[7]  # lower median of 16 (8th smallest, rank 8)
        return pd.DataFrame(
            {
                "k_buckets": [16],
                "median_bucket": [int(med["bucket"])],
                "mom_num": [int(med["s"])],
                "mom_den": [int(med["n"])],
            }
        ).astype("int64")

    def q_spatial_linf_join(sf_dir):
        """Grid-blocked L-infinity SPATIAL self-join over the 2-D
        projection (embedding dims 0,1, micro-quantized) of the
        embedding table: each point is replicated to its 4
        lower-left eps-cells and every pair is emitted exactly once
        from its min-cell (ops/spatial.py) — the classic grid
        epsilon-join, the spatial sibling of near_dup_lsh_blocked's
        LSH-cell blocking. Blocking must be LOSSLESS: the oracle is
        the naive quadratic join over the same quantized coords."""
        from ocr_service_ray.ops.spatial import linf_self_join

        emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

        def proj(b: pa.Table) -> pa.Table:
            mat = similarity._as_matrix(b["embedding"])
            return pa.table(
                {
                    "vec_id": b["vec_id"],
                    "x": pa.array(_micro(mat[:, 0])),
                    "y": pa.array(_micro(mat[:, 1])),
                }
            )

        return linf_self_join(
            emb.map_batches(proj, batch_format="pyarrow"),
            "vec_id",
            "x",
            "y",
            eps=100_000,
        )

    def q_kaplan_meier_users(sf_dir):
        """Kaplan-Meier survival over per-user activity spans:
        duration = minutes between a user's first and last event,
        event = heavy purchaser (>= 15 purchase events), censored
        otherwise (at sf0.01: 50 events / 100 censored). One
        combiner pass produces per-user (t, d), a second the
        (t, d)-value-counts sufficient statistic; the curve is the
        floored-ppm integer product recurrence of ops/survival.py,
        replayed exactly by the oracle's recursive CTE."""
        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.survival import kaplan_meier

        ev = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

        def prep(b: pa.Table) -> pa.Table:
            ts_us = (
                b["ts"].to_numpy(zero_copy_only=False)
                .astype("datetime64[us]")
                .astype(np.int64)
            )
            is_p = pc.equal(b["event_type"], "purchase")
            return pa.table(
                {
                    "user_id": b["user_id"],
                    "ts_us": pa.array(ts_us),
                    "p": pc.cast(is_p, pa.int64()),
                }
            )

        per_user = grouped_agg(
            ev.map_batches(prep, batch_format="pyarrow"),
            ["user_id"],
            {
                "lo": ("ts_us", "min"),
                "hi": ("ts_us", "max"),
                "np_": ("p", "sum"),
            },
        )

        def td(b: pa.Table) -> pa.Table:
            lo = b["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
            hi = b["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
            npu = b["np_"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "t": pa.array((hi - lo) // 60_000_000),
                    "d": pa.array((npu >= 15).astype(np.int64)),
                }
            )

        return kaplan_meier(
            per_user.map_batches(td, batch_format="pyarrow"), "t", "d"
        )

    def q_hodges_lehmann_value(sf_dir):
        """Hodges-Lehmann robust location estimate of event value on
        the whole-dollar grid: one value-counts combiner reduces the
        corpus to <= |distinct dollars| rows, the driver takes the
        weighted lower median of all D(D+1)/2 Walsh pair sums
        (ops/stats.py hodges_lehmann — exact rational num/2, no
        float). The rank-based complement to median_of_means /
        trimmed_mean: the oracle cross-joins the same value-counts
        table and replays the weighted median pick."""
        from ocr_service_ray.ops.stats import hodges_lehmann

        ev = _read(sf_dir, "events", ["value"])

        def dollars(b: pa.Table) -> pa.Table:
            v = np.floor(
                b["value"].to_numpy(zero_copy_only=False)
            ).astype(np.int64)
            return pa.table({"v": pa.array(v)})

        return hodges_lehmann(
            ev.map_batches(dollars, batch_format="pyarrow"), "v"
        )

    def q_map_eval_sources(sf_dir):
        """Per-source Mean-Average-Precision ranking eval: docs
        ranked by (n_chars DESC, doc_id ASC) within source, relevance
        = lang == 'en'; precision@k floored to ppm at every relevant
        rank, AP = their integer mean — the ranking-eval sibling of
        quality_auc / score_decile_lift, exact at every step. One
        bucketed source shuffle; per-group work is a vectorized
        cumsum (no Python loop over ranks)."""
        import pandas as pd

        from ocr_service_ray.ops.agg import bucketed_map_groups

        docs = _read(
            sf_dir, "documents", ["doc_id", "lang", "source", "n_chars"]
        )

        def ap(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(
                ["n_chars", "doc_id"], ascending=[False, True]
            )
            rel = (g["lang"] == "en").to_numpy().astype(np.int64)
            n_rel = int(rel.sum())
            if n_rel == 0:
                ap_ppm = 0
            else:
                k = np.arange(1, len(g) + 1, dtype=np.int64)
                hits = np.cumsum(rel)
                p_ppm = (hits * 1_000_000) // k
                ap_ppm = int(p_ppm[rel == 1].sum() // n_rel)
            return pd.DataFrame(
                {
                    "source": [g["source"].iloc[0]],
                    "n_docs": pd.array([len(g)], dtype="int64"),
                    "n_rel": pd.array([n_rel], dtype="int64"),
                    "ap_ppm": pd.array([ap_ppm], dtype="int64"),
                }
            )

        return bucketed_map_groups(docs, ["source"], ap)

    def q_did_value(sf_dir):
        """Difference-in-differences estimator over the event stream:
        treatment arm = user parity (the CUPED arm split), period
        split = calendar midpoint (min_day+max_day)//2, metric = mean
        event cents. ONE (arm, day) combiner aggregate is the only
        data-parallel phase; the driver folds the <=2x|days| partial
        table into the 2x2 cells and closes DiD = (Δtreated - Δcontrol)
        exactly — cross-multiplied bigints, sign-split truncation to
        micro-cents (the cuped_moments discipline). Completes the
        causal family next to CUPED and attribution_linear."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        ev = _read(sf_dir, "events", ["user_id", "ts", "value"])

        def prep(b: pa.Table) -> pa.Table:
            ts_us = (
                b["ts"].to_numpy(zero_copy_only=False)
                .astype("datetime64[us]")
                .astype(np.int64)
            )
            u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            cents = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "g": pa.array((u % 2 == 0).astype(np.int64)),
                    "day": pa.array(ts_us // 86_400_000_000),
                    "c": pa.array(cents),
                }
            )

        part = grouped_agg(
            ev.map_batches(prep, batch_format="pyarrow"),
            ["g", "day"],
            {"n": (None, "count"), "s": ("c", "sum")},
        ).to_pandas()
        mid = (int(part["day"].min()) + int(part["day"].max())) // 2
        part["p"] = (part["day"] > mid).astype(np.int64)
        cells = part.groupby(["g", "p"], as_index=False).agg(
            n=("n", "sum"), s=("s", "sum")
        )
        cv = {
            (int(r["g"]), int(r["p"])): (int(r["n"]), int(r["s"]))
            for _, r in cells.iterrows()
        }
        n00, s00 = cv[(0, 0)]
        n01, s01 = cv[(0, 1)]
        n10, s10 = cv[(1, 0)]
        n11, s11 = cv[(1, 1)]
        did_num = (s11 * n10 - s10 * n11) * (n01 * n00) - (
            s01 * n00 - s00 * n01
        ) * (n11 * n10)
        did_den = n11 * n10 * n01 * n00
        scaled = 1_000_000 * did_num
        did_micro = (
            scaled // did_den if scaled >= 0 else -((-scaled) // did_den)
        )
        return pd.DataFrame(
            {
                "split_day": [mid],
                "n00": [n00],
                "s00": [s00],
                "n01": [n01],
                "s01": [s01],
                "n10": [n10],
                "s10": [s10],
                "n11": [n11],
                "s11": [s11],
                "did_microcents": [int(did_micro)],
            }
        ).astype("int64")

    def q_matching_att(sf_dir):
        """Nearest-covariate matching ATT (with replacement): treated
        = odd user_id, covariate = the user's event COUNT, outcome =
        the user's purchase cents. Per-user fold, then an
        (arm, covariate) value-counts combiner — matching runs on the
        bounded distinct-covariate grid, never on users: each treated
        covariate x matches the control covariate minimizing
        (|x-y|, y); matched control means are floored to micro-cents
        per grid point (SQL-replayable), then averaged over treated
        users. The design-based causal complement to did_value."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        ev = _read(sf_dir, "events", ["user_id", "event_type", "value"])

        def prep(b: pa.Table) -> pa.Table:
            cents = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            et = b["event_type"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "user_id": b["user_id"],
                    "y": pa.array(np.where(et == "purchase", cents, 0)),
                    "one": pa.array(np.ones(len(cents), np.int64)),
                }
            )

        users = grouped_agg(
            ev.map_batches(prep, batch_format="pyarrow"),
            ["user_id"],
            {"cnt": ("one", "sum"), "y": ("y", "sum")},
        )

        def arm(b: pa.Table) -> pa.Table:
            u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "g": pa.array(u % 2),
                    "cnt": b["cnt"],
                    "y": b["y"],
                }
            )

        vc = grouped_agg(
            users.map_batches(arm, batch_format="pyarrow"),
            ["g", "cnt"],
            {"n": (None, "count"), "sy": ("y", "sum")},
        ).to_pandas()
        t = vc[vc["g"] == 1].sort_values("cnt").reset_index(drop=True)
        c = vc[vc["g"] == 0].sort_values("cnt").reset_index(drop=True)
        cx = c["cnt"].to_numpy().astype(np.int64)
        cn = c["n"].to_numpy().astype(np.int64)
        cs = c["sy"].to_numpy().astype(np.int64)
        n_t = int(t["n"].sum())
        sy_t = int(t["sy"].sum())
        matched_sum = 0
        for x, k in zip(
            t["cnt"].to_numpy().astype(np.int64),
            t["n"].to_numpy().astype(np.int64),
        ):
            d = np.abs(cx - x)
            # argmin on (|x-y|, y): cx sorted asc, argmin takes first
            j = int(np.argmin(d))
            m_micro = (1_000_000 * int(cs[j])) // int(cn[j])
            matched_sum += int(k) * m_micro
        treated_micro = (1_000_000 * sy_t) // n_t
        control_matched_micro = matched_sum // n_t
        return pd.DataFrame(
            {
                "n_treated": [n_t],
                "n_control": [int(c["n"].sum())],
                "treated_micro": [treated_micro],
                "matched_control_micro": [control_matched_micro],
                "att_micro": [treated_micro - control_matched_micro],
            }
        ).astype("int64")

    def q_sssp_nations(sf_dir):
        """Weighted single-source shortest paths (fixed 4-round
        Bellman-Ford, ops/sssp.py) over the supplier-nation →
        customer-nation trade graph: edge weight = trade-count mod
        29 + 1 (deterministic, varied — so multi-hop relaxation is
        actually exercised on the dense nation graph). The edge table
        is the |nations|^2-bounded reduction of the q7-style 4-way
        join, materialized once; each round is one broadcast-dist
        edge scan + combiner min. Oracle unrolls the 4 rounds as a
        CTE chain (the pagerank/pca discipline)."""
        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.relational import hash_join
        from ocr_service_ray.ops.sssp import bellman_ford_rounds

        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
        od = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        cu = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
        su = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
        j = hash_join(li, od, on="l_orderkey", right_on="o_orderkey")
        j = hash_join(j, cu, on="o_custkey", right_on="c_custkey")
        j = hash_join(j, su, on="l_suppkey", right_on="s_suppkey")
        cnt = grouped_agg(
            j, ["s_nationkey", "c_nationkey"], {"n": (None, "count")}
        )

        def weight(b: pa.Table) -> pa.Table:
            n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "src": b["s_nationkey"],
                    "dst": b["c_nationkey"],
                    "w": pa.array(n % 29 + 1),
                }
            )

        edges = cnt.map_batches(
            weight, batch_format="pyarrow"
        ).materialize()  # |nations|^2-bounded: re-scanned per round
        return bellman_ford_rounds(edges, source=0, rounds=4)

    def q_sparse_cosine_pairs(sf_dir):
        """Exact all-pairs tf-weighted cosine over documents via the
        term-keyed inverted join (ops/allpairs.py — the DISCO shape):
        df cap 50 bounds per-term pair fan-out (the skew control, and
        the oracle replays the cap rule), dot products and norms are
        exact integers, the cos^2 >= 0.04 threshold is
        cross-multiplied so no float forms."""
        from ocr_service_ray.ops.allpairs import sparse_cosine_pairs

        return sparse_cosine_pairs(
            _read(sf_dir, "documents", ["doc_id", "text"]),
            max_df=50,
            t2_ppm=40_000,
        )

    def q_equality_delete_orders(sf_dir):
        """Iceberg-v2 EQUALITY-delete merge-on-read (the key-based
        sibling of q_positional_delete_orders): base rows carry a
        data sequence number (o_orderkey % 3), two derived delete
        files mark keys (%13 at seq 2, %17 at seq 1), and a row
        survives unless some delete on its key has dseq > data_seq
        (the Iceberg strictly-greater rule). The delete table is
        reduced to (key, max dseq) by a combiner and BROADCAST
        (delete files are small by contract — the corrections-DB /
        decontam eval-set shape); the survival scan is a vectorized
        sorted-key searchsorted, no shuffle of base rows. Output:
        surviving census per order status."""
        import ray

        from ocr_service_ray.ops.agg import grouped_agg

        od = _read(
            sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_totalprice"]
        )

        def deletes(b: pa.Table) -> pa.Table:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            d13 = k[k % 13 == 0]
            d17 = k[k % 17 == 0]
            return pa.table(
                {
                    "k": pa.array(np.concatenate([d13, d17])),
                    "ds": pa.array(
                        np.concatenate(
                            [
                                np.full(len(d13), 2, np.int64),
                                np.full(len(d17), 1, np.int64),
                            ]
                        )
                    ),
                }
            )

        dmax = (
            grouped_agg(
                od.map_batches(deletes, batch_format="pyarrow"),
                ["k"],
                {"dmax": ("ds", "max")},
            )
            .to_pandas()
            .sort_values("k")
        )
        keys_ref = ray.put(dmax["k"].to_numpy().astype(np.int64))
        dmax_ref = ray.put(dmax["dmax"].to_numpy().astype(np.int64))

        def survive(b: pa.Table) -> pa.Table:
            import ray as _ray

            dk = _ray.get(keys_ref)
            dv = _ray.get(dmax_ref)
            k = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            cents = np.floor(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            data_seq = k % 3
            if len(dk):
                pos_c = np.minimum(np.searchsorted(dk, k), len(dk) - 1)
                has_del = dk[pos_c] == k
                dseq = np.where(has_del, dv[pos_c], 0)
            else:
                has_del = np.zeros(len(k), bool)
                dseq = np.zeros(len(k), np.int64)
            keep = ~has_del | (data_seq >= dseq)
            t = b.filter(pa.array(keep))
            return pa.table(
                {
                    "o_orderstatus": t["o_orderstatus"],
                    "c": pa.array(cents[keep]),
                }
            )

        return grouped_agg(
            od.map_batches(survive, batch_format="pyarrow"),
            ["o_orderstatus"],
            {"n_rows": (None, "count"), "cents": ("c", "sum")},
        )

    def q_friedman_daily_types(sf_dir):
        """Friedman rank test for daily event-type volume (blocked
        rank ANOVA — the repeated-measures member of the
        Kruskal/Mann-Whitney family): blocks = complete days (all k
        types present), treatments = event types, ranks averaged over
        ties and DOUBLED to stay integer (rank2 = 2r + t - 1). Emits
        per-type doubled rank sums plus the exact rational statistic
        q_num/q_den where Q = [3·Σrank2_sum² − 3n²k(k+1)²] /
        [n·k·(k+1)] (n = complete days). Combiner daily totals → one
        bucketed day shuffle for in-block ranks → per-type combiner;
        the close is O(k) on the driver."""
        import pandas as pd

        from ocr_service_ray.ops.agg import bucketed_map_groups, grouped_agg

        ev = _read(sf_dir, "events", ["ts", "event_type", "value"])

        def prep(b: pa.Table) -> pa.Table:
            ts_us = (
                b["ts"].to_numpy(zero_copy_only=False)
                .astype("datetime64[us]")
                .astype(np.int64)
            )
            cents = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "day": pa.array(ts_us // 86_400_000_000),
                    "event_type": b["event_type"],
                    "c": pa.array(cents),
                }
            )

        daily = grouped_agg(
            ev.map_batches(prep, batch_format="pyarrow"),
            ["day", "event_type"],
            {"v": ("c", "sum")},
        )
        k = int(
            grouped_agg(daily, ["event_type"], {"_n": (None, "count")})
            .to_pandas()
            .shape[0]
        )

        def rank_block(g: pd.DataFrame):
            if len(g) != k:
                return None  # incomplete block drops out (Friedman)
            r2 = (g["v"].rank(method="average") * 2).astype(np.int64)
            return pd.DataFrame({"event_type": g["event_type"], "rank2": r2})

        per_type = (
            grouped_agg(
                bucketed_map_groups(daily, ["day"], rank_block),
                ["event_type"],
                {"rank2_sum": ("rank2", "sum"), "n_days": (None, "count")},
            )
            .to_pandas()
            .sort_values("event_type")
            .reset_index(drop=True)
        )
        n = int(per_type["n_days"].iloc[0])
        sum_sq = int((per_type["rank2_sum"].astype(object) ** 2).sum())
        q_num = 3 * (sum_sq - n * n * k * (k + 1) * (k + 1))
        q_den = n * k * (k + 1)
        out = per_type[["event_type", "rank2_sum"]].copy()
        out["n_days"] = n
        out["k_types"] = k
        out["q_num"] = q_num
        out["q_den"] = q_den
        for c in out.columns[1:]:
            out[c] = out[c].astype("int64")
        return out

    def q_dehyphenate_docs(sf_dir):
        """Line-break de-hyphenation repair (ops/textrepair.py): a
        deterministic RE2 corruption pass hard-wraps long words
        (6+-letter words get "wor-\\nldwide"-style seams — the scanned-page/PDF
        text-layer artifact), the repair kernel rejoins them, and
        the query certifies the round trip per doc: repair count +
        exact-equality flag vs the pristine text. Single stateless
        vectorized scan; the oracle replays corruption AND repair
        with the same RE2 patterns in SQL."""
        from ocr_service_ray.ops.textrepair import (
            dehyphenate_column,
            hyphen_break_counts,
        )

        docs = _read(sf_dir, "documents", ["doc_id", "text"])

        def kernel(b: pa.Table) -> pa.Table:
            wrapped = pc.replace_substring_regex(
                b["text"],
                pattern=r"([a-zA-Z]{3})([a-zA-Z]{3,})",
                replacement="\\1-\n\\2",
            )
            n_rep = hyphen_break_counts(wrapped)
            repaired = dehyphenate_column(wrapped)
            ok = pc.cast(pc.equal(repaired, b["text"]), pa.int64())
            return pa.table(
                {
                    "doc_id": b["doc_id"],
                    "n_repairs": n_rep,
                    "roundtrip_ok": ok,
                }
            )

        return docs.map_batches(kernel, batch_format="pyarrow")

    def q_mojibake_audit(sf_dir):
        """Mojibake (encoding-damage) audit: docs with doc_id % 5 == 0
        get the classic latin-1-decoded-UTF-8 damage injected
        deterministically ('a' -> 'Ã¡'), the detector counts marker
        sequences (Ã / â€ / Â) and scores chars-normalized ppm; the
        audit reports per-source damaged-doc counts and total
        markers. Stateless vectorized scan + one tiny combiner — the
        encoding-health check an ingest pipeline runs per crawl
        source."""
        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.textrepair import mojibake_counts

        docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])

        def kernel(b: pa.Table) -> pa.Table:
            ids = b["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            damaged = pc.replace_substring(b["text"], "a", "Ã¡")
            text = pc.if_else(
                pa.array(ids % 5 == 0), damaged, b["text"]
            )
            markers = mojibake_counts(text)
            n_chars = pc.cast(pc.utf8_length(text), pa.int64())
            ppm = pc.if_else(
                pc.greater(n_chars, 0),
                pc.divide(
                    pc.multiply(markers, pa.scalar(1_000_000, pa.int64())),
                    n_chars,
                ),
                pa.scalar(0, pa.int64()),
            )
            flagged = pc.cast(
                pc.greater(ppm, pa.scalar(1000, pa.int64())), pa.int64()
            )
            return pa.table(
                {
                    "source": b["source"],
                    "markers": markers,
                    "flagged": flagged,
                }
            )

        return grouped_agg(
            docs.map_batches(kernel, batch_format="pyarrow"),
            ["source"],
            {
                "n_docs": (None, "count"),
                "n_flagged": ("flagged", "sum"),
                "total_markers": ("markers", "sum"),
            },
        )

    def q_wasserstein_lengths(sf_dir):
        """Exact Wasserstein-1 (earth-mover) distance between the
        doc-length distributions of lang 'en' and lang 'de': W1 =
        ∫|F_A - F_B| dx computed on the merged distinct-value support
        as the exact rational Σ|cumA·nB − cumB·nA|·Δx / (nA·nB) — the
        value-weighted generalization of the t_closeness band EMD and
        the integral complement of the KS statistic
        (length_ks_by_source). One (group, value) value-counts
        combiner; the close folds the |support|-bounded table."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        docs = _read(sf_dir, "documents", ["lang", "n_chars"])

        def prep(b: pa.Table) -> pa.Table:
            lang = b["lang"].to_numpy(zero_copy_only=False)
            keep = (lang == "en") | (lang == "de")
            t = b.filter(pa.array(keep))
            g = (
                t["lang"].to_numpy(zero_copy_only=False) != "en"
            ).astype(np.int64)
            return pa.table({"g": pa.array(g), "v": t["n_chars"]})

        vc = (
            grouped_agg(
                docs.map_batches(prep, batch_format="pyarrow"),
                ["g", "v"],
                {"n": (None, "count")},
            )
            .to_pandas()
            .pivot_table(
                index="v", columns="g", values="n", fill_value=0
            )
            .reindex(columns=[0, 1], fill_value=0)
            .sort_index()
        )
        ca = vc[0].to_numpy().astype(np.int64)
        cb = vc[1].to_numpy().astype(np.int64)
        v = vc.index.to_numpy().astype(np.int64)
        na, nb = int(ca.sum()), int(cb.sum())
        cuma, cumb = np.cumsum(ca), np.cumsum(cb)
        dx = np.diff(v)
        w1_num = int(
            (np.abs(cuma[:-1] * nb - cumb[:-1] * na) * dx).sum()
        )
        return pd.DataFrame(
            {
                "n_a": [na],
                "n_b": [nb],
                "w1_num": [w1_num],
                "w1_den": [na * nb],
            }
        ).astype("int64")

    def q_schema_evolution_union(sf_dir):
        """Schema-evolution read (UNION ALL BY NAME,
        ops/relational.union_by_name): two derived order snapshots
        with DIFFERENT schemas — an old one (key, cents) and a new
        one that added o_orderstatus — are unioned under the widened
        schema with typed null padding, streaming and shuffle-free
        (the lakehouse old-files-lack-new-columns read). Output keeps
        a snap tag so the oracle's UNION ALL BY NAME replays it."""
        from ocr_service_ray.ops.relational import union_by_name

        od = _read(
            sf_dir, "orders", ["o_orderkey", "o_orderstatus", "o_totalprice"]
        )

        def old_snap(b: pa.Table) -> pa.Table:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = k % 2 == 0
            t = b.filter(pa.array(keep))
            cents = np.floor(
                t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "o_orderkey": t["o_orderkey"],
                    "snap": pa.array(np.zeros(len(cents), np.int64)),
                    "cents": pa.array(cents),
                }
            )

        def new_snap(b: pa.Table) -> pa.Table:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = k % 2 == 1
            t = b.filter(pa.array(keep))
            cents = np.floor(
                t["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "o_orderkey": t["o_orderkey"],
                    "snap": pa.array(np.ones(len(cents), np.int64)),
                    "cents": pa.array(cents),
                    "o_orderstatus": t["o_orderstatus"],
                }
            )

        return union_by_name(
            [
                od.map_batches(old_snap, batch_format="pyarrow"),
                od.map_batches(new_snap, batch_format="pyarrow"),
            ]
        )

    def q_ips_policy_value(sf_dir):
        """Offline policy evaluation (IPS + SNIPS, Horvitz-Thompson /
        counterfactual-bandit family): the logged policy is uniform
        over the k event types (the synthetic-log contract), the
        target policy is the deterministic map context -> type index
        (context·3 + 1) mod k with context = user_id mod 7; reward =
        event cents. IPS = k·Σ(r·match)/n and SNIPS =
        Σ(r·match)/Σ(match), both exact rationals from ONE combiner
        scan (match is vectorized against the broadcast sorted type
        vocabulary). New family: counterfactual policy eval."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        ev = _read(sf_dir, "events", ["user_id", "event_type", "value"])
        types = sorted(
            grouped_agg(ev, ["event_type"], {"_n": (None, "count")})
            .to_pandas()["event_type"]
            .tolist()
        )
        k = len(types)
        tmap = {t: i for i, t in enumerate(types)}

        def prep(b: pa.Table) -> pa.Table:
            u = b["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            cents = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            a = np.array(
                [tmap[t] for t in b["event_type"].to_pylist()],
                dtype=np.int64,
            )
            target = ((u % 7) * 3 + 1) % k
            match = (a == target).astype(np.int64)
            return pa.table(
                {
                    "one": pa.array(np.ones(len(u), np.int64)),
                    "match": pa.array(match),
                    "rm": pa.array(cents * match),
                }
            )

        agg = grouped_agg(
            ev.map_batches(prep, batch_format="pyarrow"),
            ["one"],
            {
                "n": (None, "count"),
                "n_match": ("match", "sum"),
                "sum_rm": ("rm", "sum"),
            },
        ).to_pandas()
        n = int(agg["n"].iloc[0])
        n_match = int(agg["n_match"].iloc[0])
        sum_rm = int(agg["sum_rm"].iloc[0])
        return pd.DataFrame(
            {
                "n": [n],
                "k_actions": [k],
                "n_match": [n_match],
                "sum_matched_cents": [sum_rm],
                "ips_num": [k * sum_rm],
                "ips_den": [n],
                "snips_num": [sum_rm],
                "snips_den": [n_match],
            }
        ).astype("int64")

    def q_ams_f2_users(sf_dir):
        """AMS / count-sketch second-moment (F2) estimation over the
        user_id frequency vector: 8 independent estimators with
        deterministic md5 ±1 signs, each S_j = Σ_v sign_j(v)·c_v
        (computed on the VALUE-COUNTS table — signs hash only
        distinct values, never rows), estimate = lower-median of the
        S_j². Emitted next to the exact F2 = Σc_v² so the sketch
        error is auditable; the whole construction (md5 signs
        included) replays in SQL. Completes the sketch family
        (HLL/CMS/Bloom/histogram) with the F2 member."""
        import hashlib

        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        ev = _read(sf_dir, "events", ["user_id"])
        vc = grouped_agg(
            ev, ["user_id"], {"c": (None, "count")}
        ).to_pandas()
        v = vc["user_id"].to_numpy().astype(np.int64)
        c = vc["c"].to_numpy().astype(np.int64)
        f2_true = int((c.astype(object) ** 2).sum())
        rows = []
        for j in range(8):
            signs = np.array(
                [
                    1
                    if int(
                        hashlib.md5(f"ams{j}:{int(x)}".encode()).hexdigest()[
                            :16
                        ],
                        16,
                    )
                    % 2
                    == 0
                    else -1
                    for x in v
                ],
                dtype=np.int64,
            )
            s = int((signs * c).sum())
            rows.append({"j": j, "s": s, "sq": s * s})
        est = pd.DataFrame(rows)
        med = int(
            est.sort_values(["sq", "j"]).iloc[3]["sq"]
        )  # lower median of 8
        est["f2_true"] = f2_true
        est["f2_est"] = med
        return est.astype("int64")

    def q_haar_synopsis_daily(sf_dir):
        """Unnormalized integer Haar wavelet synopsis of the daily
        value series (the wavelet SYNOPSIS the AQP literature pairs
        with histograms/sketches): days dense-rank into 16
        equal-index bins (one day-combiner, |days|-bounded close),
        then 4 levels of pairwise (sum, difference) — 15 integer
        detail coefficients + the level-4 approximation, losslessly
        invertible, no normalization so every coefficient stays an
        exact integer. Oracle unrolls the 4 levels as grouped CTEs."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        ev = _read(sf_dir, "events", ["ts", "value"])

        def prep(b: pa.Table) -> pa.Table:
            ts_us = (
                b["ts"].to_numpy(zero_copy_only=False)
                .astype("datetime64[us]")
                .astype(np.int64)
            )
            cents = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {"day": pa.array(ts_us // 86_400_000_000), "c": pa.array(cents)}
            )

        daily = (
            grouped_agg(
                ev.map_batches(prep, batch_format="pyarrow"),
                ["day"],
                {"tot": ("c", "sum")},
            )
            .to_pandas()
            .sort_values("day")
            .reset_index(drop=True)
        )
        n = len(daily)
        bins = np.zeros(16, dtype=np.int64)
        pos = (np.arange(n, dtype=np.int64) * 16) // n
        np.add.at(bins, pos, daily["tot"].to_numpy().astype(np.int64))
        rows = []
        cur = bins
        for level in (1, 2, 3, 4):
            s = cur[0::2] + cur[1::2]
            d = cur[0::2] - cur[1::2]
            for k, coef in enumerate(d):
                rows.append({"level": level, "k": k, "coef": int(coef)})
            cur = s
        rows.append({"level": 5, "k": 0, "coef": int(cur[0])})
        return pd.DataFrame(rows).astype("int64")

    def q_lis_daily_values(sf_dir):
        """Longest strictly-increasing and strictly-decreasing
        subsequence lengths of the daily-total series (the
        monotone-trend complement of runs_test_daily — Erdős–
        Szekeres-style sequence structure): one day-combiner is the
        data-parallel phase; the close is the O(n²) DP on the
        |days|-bounded series. The oracle replays the DP as a
        monotone recursive CTE (UNION-deduped states, ≤ n² rows)."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg

        ev = _read(sf_dir, "events", ["ts", "value"])

        def prep(b: pa.Table) -> pa.Table:
            ts_us = (
                b["ts"].to_numpy(zero_copy_only=False)
                .astype("datetime64[us]")
                .astype(np.int64)
            )
            cents = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {"day": pa.array(ts_us // 86_400_000_000), "c": pa.array(cents)}
            )

        daily = (
            grouped_agg(
                ev.map_batches(prep, batch_format="pyarrow"),
                ["day"],
                {"tot": ("c", "sum")},
            )
            .to_pandas()
            .sort_values("day")
            .reset_index(drop=True)
        )
        v = daily["tot"].to_numpy().astype(np.int64)
        n = len(v)

        def lis_len(vals: np.ndarray) -> int:
            if len(vals) == 0:
                return 0
            dp = np.ones(len(vals), dtype=np.int64)
            for i in range(1, len(vals)):
                prior = dp[:i][vals[:i] < vals[i]]
                if len(prior):
                    dp[i] = prior.max() + 1
            return int(dp.max())

        return pd.DataFrame(
            {
                "n_days": [n],
                "lis_len": [lis_len(v)],
                "lds_len": [lis_len(-v)],
            }
        ).astype("int64")

    def q_dbscan_embeddings(sf_dir):
        """DBSCAN over the 2-D embedding projection, composed
        entirely from verified ops: eps-neighborhood pairs from the
        grid-blocked L∞ join (ops/spatial.py, lossless), degree via
        one combiner, core points (>= minPts neighbors incl. self),
        clusters = connected components over the core-core subgraph
        (ops/graph.py, min-id canonical labels), border points join
        the MIN cluster among their core neighbors (the deterministic
        tie rule replacing classic DBSCAN's scan-order dependence —
        documented divergence), everything else is noise. eps=0.02
        micro-units, minPts=4 (324 core / 58 isolated at sf0.01).
        Oracle replays all five stages including the recursive-CTE
        closure. The density-based member of the clustering family
        next to kmeans (centroid) and the LSH near-dup blocks."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.graph import connected_components
        from ocr_service_ray.ops.spatial import linf_self_join

        eps, min_pts = 20_000, 4
        emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

        def proj(b: pa.Table) -> pa.Table:
            mat = similarity._as_matrix(b["embedding"])
            return pa.table(
                {
                    "vec_id": b["vec_id"],
                    "x": pa.array(_micro(mat[:, 0])),
                    "y": pa.array(_micro(mat[:, 1])),
                }
            )

        pts = emb.map_batches(proj, batch_format="pyarrow")
        all_ids = np.sort(
            pts.select_columns(["vec_id"])
            .to_pandas()["vec_id"]
            .to_numpy()
            .astype(np.int64)
        )
        # |pairs|-bounded, reused by degree + core-edge consumers
        pairs = linf_self_join(
            pts, "vec_id", "x", "y", eps=eps
        ).materialize()

        def both_dirs(b: pa.Table) -> pa.Table:
            ia = b["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
            ib = b["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "ia": pa.array(np.concatenate([ia, ib])),
                    "ib": pa.array(np.concatenate([ib, ia])),
                }
            )

        edges = pairs.map_batches(both_dirs, batch_format="pyarrow")
        deg = grouped_agg(edges, ["ia"], {"deg": (None, "count")}).to_pandas()
        core = np.sort(
            deg.loc[deg["deg"] >= min_pts - 1, "ia"]
            .to_numpy()
            .astype(np.int64)
        )

        def in_core(arr: np.ndarray) -> np.ndarray:
            if len(core) == 0:
                return np.zeros(len(arr), bool)
            pos = np.minimum(np.searchsorted(core, arr), len(core) - 1)
            return core[pos] == arr

        def core_edges(b: pa.Table) -> pa.Table:
            ia = b["id_a"].to_numpy(zero_copy_only=False).astype(np.int64)
            ib = b["id_b"].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = in_core(ia) & in_core(ib)
            t = b.filter(pa.array(keep))
            return pa.table({"id_a": t["id_a"], "id_b": t["id_b"]})

        labels = connected_components(
            pairs.map_batches(core_edges, batch_format="pyarrow"),
            "id_a",
            "id_b",
        ).to_pandas()
        cluster_of = dict(
            zip(
                labels["node"].astype(np.int64),
                labels["cluster_id"].astype(np.int64),
            )
        )
        for cid in core:  # isolated cores anchor their own cluster
            cluster_of.setdefault(int(cid), int(cid))

        def border_cand(b: pa.Table) -> pa.Table:
            ia = b["ia"].to_numpy(zero_copy_only=False).astype(np.int64)
            ib = b["ib"].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = (~in_core(ia)) & in_core(ib)
            bi, ci = ia[keep], ib[keep]
            cl = np.array(
                [cluster_of[int(c)] for c in ci], dtype=np.int64
            )
            return pa.table({"bid": pa.array(bi), "cl": pa.array(cl)})

        border = grouped_agg(
            edges.map_batches(border_cand, batch_format="pyarrow"),
            ["bid"],
            {"cluster": ("cl", "min")},
        ).to_pandas()
        border_of = dict(
            zip(
                border.get("bid", pd.Series(dtype="int64")).astype(np.int64),
                border.get("cluster", pd.Series(dtype="int64")).astype(
                    np.int64
                ),
            )
        )
        roles, clusters = [], []
        for i in all_ids:
            i = int(i)
            if i in cluster_of and in_core(np.array([i]))[0]:
                roles.append(2)
                clusters.append(cluster_of[i])
            elif i in border_of:
                roles.append(1)
                clusters.append(border_of[i])
            else:
                roles.append(0)
                clusters.append(-1)
        return pd.DataFrame(
            {"vec_id": all_ids, "role": roles, "cluster": clusters}
        ).astype("int64")

    def q_degree_assortativity(sf_dir):
        """Degree assortativity of the customer→supplier purchase
        graph (distinct (o_custkey, l_suppkey) pairs via the
        orders⋈lineitem join): exact integer moment sums plus the
        signed squared correlation of endpoint degrees. See
        ops/assortativity.py for the 100-TB shape (one edge dedup,
        two degree combiner aggs, two keyed joins, one moment fold)."""
        from ocr_service_ray.ops.assortativity import degree_assortativity

        od = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
        from ocr_service_ray.ops.relational import hash_join

        ed = hash_join(od, li, on="o_orderkey", right_on="l_orderkey").repartition(8)
        return degree_assortativity(ed, src_col="o_custkey", dst_col="l_suppkey")

    def q_kll_quantiles_value(sf_dir):
        """KLL quantile sketch (Karnin-Lang-Liberty 2016, deterministic
        parity-offset compaction) over event values in cents: one
        map_batches pass emits <= k*levels (level, value) rows per
        block, the driver folds the mergeable partials. Approximate BY
        DESIGN — the answer depends on compaction boundaries, so
        rows-only here; tests/test_sketch.py bounds the rank error and
        asserts weight exactness (w_total == COUNT(value)) and exact
        answers below the compaction threshold. The bounded-memory
        complement to the exact value-counts quantiles (L16/L34)."""
        import pandas as pd

        from ocr_service_ray.ops.sketch import kll_quantiles

        ev = _read(sf_dir, "events", ["value"])

        def cents(b: pa.Table) -> pa.Table:
            c = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table({"c": pa.array(c)})

        out = kll_quantiles(
            ev.map_batches(cents, batch_format="pyarrow"),
            "c",
            [0.25, 0.5, 0.75, 0.95],
            k=128,
        )
        return pd.DataFrame(
            {
                "q_pct": out["q_pct"].astype("int64"),
                "value": out["value"].astype("int64"),
                "w_total": out["w_total"].astype("int64"),
            }
        )

    def _kmv_cents(sf_dir):
        ev = _read(sf_dir, "events", ["event_type", "value"])

        def cents(b: pa.Table) -> pa.Table:
            c = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table({"event_type": b["event_type"], "cents": pa.array(c)})

        return ev.map_batches(cents, batch_format="pyarrow")

    def q_kmv_distinct_cents(sf_dir):
        """KMV (bottom-k, k=256) distinct-cents estimate per event
        type (ops/sketch.kmv_group_sketch): the mergeable SET-OPS
        sketch next to HLL — one combiner pass moves <= k hashes per
        (block, group), and because the bottom-k of a set is
        layout-invariant the whole estimate is EXACTLY
        SQL-reproducible (md5 hashes, HUGEINT floor estimator)."""
        import pandas as pd

        from ocr_service_ray.ops.sketch import kmv_estimate, kmv_group_sketch

        sk = kmv_group_sketch(_kmv_cents(sf_dir), "event_type", "cents", k=256)
        out = kmv_estimate(sk, k=256)
        return pd.DataFrame(
            {
                "event_type": out["g"].astype(str),
                "n_kept": out["n_kept"].astype("int64"),
                "n_hat": out["n_hat"].astype("int64"),
            }
        ).sort_values("event_type").reset_index(drop=True)

    def q_kmv_set_ops_cents(sf_dir):
        """KMV union / intersection / Jaccard estimates between the
        purchase and click cents sets (ops/sketch.kmv_pair_ops): the
        bottom-k of the merged sketches is a uniform sample of the
        union, so shared-membership counts give engine-exact floored
        estimates — the set-algebra capability HLL registers cannot
        provide (Beyer et al., SIGMOD 2007)."""
        from ocr_service_ray.ops.sketch import kmv_group_sketch, kmv_pair_ops

        sk = kmv_group_sketch(_kmv_cents(sf_dir), "event_type", "cents", k=256)
        return kmv_pair_ops(sk, 256, "purchase", "click")

    def q_bpe_pair_counts(sf_dir):
        """Round-1 BPE pair statistics (ops/bpe.first_round_pair_counts):
        weighted adjacent-symbol counts (chars + </w>) over the
        word-frequency table — the SQL-expressible anchor of BPE
        learning (the oracle replays word split, substring pairs and
        the weighted sum), top 30 by the learner's argmax order."""
        import pandas as pd

        from ocr_service_ray.ops.bpe import first_round_pair_counts

        docs = _read(sf_dir, "documents", ["text"])
        pc_ = first_round_pair_counts(docs, "text").to_pandas()
        out = pc_.rename(columns={"left": "left_sym", "right": "right_sym"})
        return (
            out.sort_values(
                ["n", "left_sym", "right_sym"],
                ascending=[False, True, True],
                kind="mergesort",
            )
            .head(30)
            .reset_index(drop=True)
            .astype({"n": "int64"})
        )

    def q_bpe_learn_merges(sf_dir):
        """BPE vocabulary induction (ops/bpe.learn_bpe — Sennrich ACL
        2016): 30 merges learned from ONE corpus scan folded to the
        word-frequency combiner table; merge rounds never touch
        documents. Iterative string rewriting — not SQL-expressible
        beyond round 1 (q_bpe_pair_counts is the oracled anchor), so
        rows-only; tests/test_bpe.py pins byte-exact equality against
        an independent corpus-rescan reference implementation, the
        driver==distributed path equality, and the published worked
        example."""
        from ocr_service_ray.ops.bpe import learn_bpe

        docs = _read(sf_dir, "documents", ["text"])
        m = learn_bpe(docs, "text", num_merges=30, min_count=2)
        return m.rename(columns={"left": "left_sym", "right": "right_sym"})

    def q_bpe_subword_counts(sf_dir):
        """Corpus subword frequencies under the learned BPE vocab
        (ops/bpe.bpe_token_table): each DISTINCT word segmented once,
        weighted by corpus frequency — top 20 tokens. Rows-only (the
        token table inherits the merge list's non-SQL closure);
        pytest pins segment/table consistency."""
        from ocr_service_ray.ops.bpe import bpe_token_table, learn_bpe

        docs = _read(sf_dir, "documents", ["text"])
        m = learn_bpe(docs, "text", num_merges=30, min_count=2)
        tt = bpe_token_table(docs, "text", m).to_pandas()
        return (
            tt.sort_values(["n", "token"], ascending=[False, True], kind="mergesort")
            .head(20)
            .reset_index(drop=True)
            .astype({"n": "int64"})
        )

    def q_kcenter_coreset(sf_dir):
        """Greedy k-center coreset (k=8) over the 2-D embedding
        projection (ops/coreset.py — Gonzalez 1985 farthest-point
        selection, the diverse-subset data-selection pass): exact
        integer micro-distances, running-min state updated once per
        round, per-block argmax combiner. The oracle unrolls all 8
        rounds as chained CTEs (the ops/sssp.py fixed-round
        discipline) — selection order, ids and covering radii are
        engine-exact."""
        from ocr_service_ray.ops.coreset import kcenter_greedy

        emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

        def proj(b: pa.Table) -> pa.Table:
            mat = similarity._as_matrix(b["embedding"])
            return pa.table(
                {
                    "vec_id": b["vec_id"],
                    "x": pa.array(_micro(mat[:, 0])),
                    "y": pa.array(_micro(mat[:, 1])),
                }
            )

        pts = emb.map_batches(proj, batch_format="pyarrow")
        return kcenter_greedy(pts, "vec_id", "x", "y", k=8)

    def q_cdc_apply_changelog(sf_dir):
        """CDC latest-wins snapshot materialization (ops/cdc.py):
        base = orders at seq 0; a derived changelog upserts every
        7th key (price +12345 cents, status 'U', seq 1) and
        tombstones every 13th (seq 2). One grouped_topk(k=1) keyed
        max-seq pass — block-local candidates only reach the shuffle;
        deletes beat upserts where both apply (higher seq). The
        replace-payload complement to the wave-96 equality-delete
        reader; oracle replays the log with a seq-desc ROW_NUMBER."""
        import pandas as pd

        from ocr_service_ray.ops.cdc import apply_changelog

        od = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice", "o_orderstatus"])

        def rows(b: pa.Table, which: str) -> pa.Table:
            k = b["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            cents = np.floor(
                b["o_totalprice"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            status = np.asarray(b["o_orderstatus"].to_pylist(), dtype=object)
            if which == "base":
                sel = np.ones(len(k), bool)
                seq, op = 0, "u"
            elif which == "ups":
                sel = k % 7 == 0
                cents, status = cents + 12345, np.full(len(k), "U", object)
                seq, op = 1, "u"
            else:
                sel = k % 13 == 0
                cents, status = np.zeros(len(k), np.int64), np.full(len(k), "", object)
                seq, op = 2, "d"
            return pa.table(
                {
                    "o_orderkey": pa.array(k[sel]),
                    "cents": pa.array(cents[sel]),
                    "status": pa.array(status[sel], pa.string()),
                    "seq": pa.array(np.full(int(sel.sum()), seq, np.int64)),
                    "op": pa.array(np.full(int(sel.sum()), op, object), pa.string()),
                }
            )

        base = od.map_batches(lambda b: rows(b, "base"), batch_format="pyarrow")
        ups = od.map_batches(lambda b: rows(b, "ups"), batch_format="pyarrow")
        dels = od.map_batches(lambda b: rows(b, "dels"), batch_format="pyarrow")
        cur = apply_changelog(base, ups.union(dels), "o_orderkey")
        out = cur.to_pandas().sort_values("o_orderkey").reset_index(drop=True)
        return out[["o_orderkey", "cents", "status", "seq"]].astype(
            {"o_orderkey": "int64", "cents": "int64", "seq": "int64"}
        )

    def q_pq_ann_eval(sf_dir):
        """Product quantization ANN (ops/pq.py — Jégou TPAMI 2011):
        m=4 subspace codebooks trained with the deterministic integer
        kmeans, one-pass encode (4 bytes/vector, 64× compression),
        ADC shortlist from codes alone via a k×m integer LUT, exact
        rerank of just the 100 shortlisted vectors, recall vs the
        combiner-top-k brute ground truth. Rows-only (kmeans training
        is iterative — the kmeans_clusters precedent); pytest pins an
        independent numpy error recomputation, perfect recall on
        separated clusters, and layout invariance."""
        from ocr_service_ray.ops.pq import pq_eval

        emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        return pq_eval(emb, m=4, k=32, rerank=100, max_iters=4)

    def q_ols2_hour_dow(sf_dir):
        """Per-type TWO-feature least squares — value cents on (hour
        of day, day of week) — via exact integer normal equations
        (ops/stats.grouped_ols2): one combiner scan emits the 9
        moments per group, Cramer's rule closes the 3×3 system in
        exact bigints, betas floored to micro with the sign-magnitude
        pattern. The oracle replays the moments AND the whole solve in
        HUGEINT — the multivariate extension of value_trend_ols."""
        import pandas as pd

        from ocr_service_ray.ops.stats import grouped_ols2

        ev = _read(sf_dir, "events", ["event_type", "ts", "value"])

        def prep(b: pa.Table) -> pa.Table:
            ts_us = (
                b["ts"].to_numpy(zero_copy_only=False)
                .astype("datetime64[us]")
                .astype(np.int64)
            )
            cents = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "event_type": b["event_type"],
                    "hour": pa.array((ts_us // 3_600_000_000) % 24),
                    "dow": pa.array((ts_us // 86_400_000_000 + 4) % 7),
                    "cents": pa.array(cents),
                }
            )

        out = grouped_ols2(
            ev.map_batches(prep, batch_format="pyarrow"),
            ["event_type"],
            "hour",
            "dow",
            "cents",
        )
        out = out.sort_values("event_type").reset_index(drop=True)
        for c in out.columns:
            if c != "event_type":
                out[c] = out[c].astype("Int64")
        return out

    def q_max_coverage_docs(sf_dir):
        """Greedy maximum-coverage document selection over the
        word-bigram universe (ops/setcover.py — the (1−1/e) greedy,
        the coverage-objective complement of kcenter_coreset): 6
        rounds, each a broadcast-covered-set gain pass + grouped sum
        + combiner top-1; picks and marginal gains are engine-exact.
        Oracle unrolls all 6 rounds as chained CTEs (NOT-IN covered
        subqueries, the kcenter/sssp fixed-round discipline)."""
        from ocr_service_ray.ops.setcover import greedy_max_coverage

        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        return greedy_max_coverage(docs, "doc_id", "text", k=6, unit="bigram")

    def q_quantile_normalize_lengths(sf_dir):
        """Cross-source quantile normalization of the per-doc token-
        length distribution (ops/normalize.py — Bolstad rank-map onto
        the pooled order statistics, exact integers): one (source,
        length)-count combiner, driver close on the bounded table.
        Output: per-source n_docs + sum of normalized lengths — near-
        equal across sources by construction (the mix-equalization
        property). Oracle replays the cume-rank map with window
        functions and a non-equi min lookup."""
        import pandas as pd

        from ocr_service_ray.ops.normalize import quantile_normalize

        docs = _read(sf_dir, "documents", ["source", "text"])

        def prep(b: pa.Table) -> pa.Table:
            texts = b["text"].to_pylist()
            keep = [i for i, t in enumerate(texts) if t is not None]
            # field count == SQL length(string_split(text, ' '))
            lens = np.fromiter(
                (texts[i].count(" ") + 1 for i in keep),
                dtype=np.int64,
                count=len(keep),
            )
            src = b["source"].take(keep)
            return pa.table({"source": src, "val": pa.array(lens)})

        mapped = quantile_normalize(
            docs.map_batches(prep, batch_format="pyarrow"), "source", "val"
        )
        out = (
            mapped.assign(w=mapped["c"] * mapped["norm_val"])
            .groupby("g", sort=True)
            .agg(n_docs=("c", "sum"), sum_norm_len=("w", "sum"))
            .reset_index()
            .rename(columns={"g": "source"})
        )
        return out.astype({"n_docs": "int64", "sum_norm_len": "int64"})

    def q_energy_distance_values(sf_dir):
        """Two-sample energy distance between purchase and click value
        cents (ops/divergence.energy_distance — Székely-Rizzo
        V-statistic): the three pair-|diff| sums collapse to one scan
        of the merged value-counts support via the gap identity, so
        the metric is exact integers end to end; the oracle replays
        the gap scan with window cumulatives and the HUGEINT
        sign-magnitude close. The metric complement of the KS (sup) /
        Wasserstein (integral) distances in this family."""
        import pandas as pd

        from ocr_service_ray.ops.divergence import energy_distance

        return energy_distance(
            _kmv_cents(sf_dir), "event_type", "cents", "purchase", "click"
        )

    def q_interval_schedule_value(sf_dir):
        """Weighted interval scheduling per user (ops/intervals.
        weighted_interval_max — the Kleinberg-Tardos DP): events get
        deterministic day-scale durations (cents % 2e6 + 86400 s, so
        every user faces real overlap choices — keep ratio ≈ 0.49),
        one coarse-bucket shuffle co-locates users, the in-group DP is
        a searchsorted + linear fold. Oracle replays the DP as a
        list-carrying recursive CTE (dp history per user per step) —
        optimum values engine-exact."""
        from ocr_service_ray.ops.intervals import weighted_interval_max

        ev = _read(sf_dir, "events", ["user_id", "ts", "value", "event_id"])

        def prep(b: pa.Table) -> pa.Table:
            ts_s = (
                b["ts"].to_numpy(zero_copy_only=False)
                .astype("datetime64[us]")
                .astype(np.int64)
            ) // 1_000_000
            v = np.floor(
                b["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
            ).astype(np.int64)
            return pa.table(
                {
                    "user_id": b["user_id"],
                    "s": pa.array(ts_s),
                    "f": pa.array(ts_s + (v % 2_000_000 + 86_400)),
                    "v": pa.array(v),
                    "event_id": b["event_id"],
                }
            )

        out = weighted_interval_max(
            ev.map_batches(prep, batch_format="pyarrow"),
            "user_id",
            "s",
            "f",
            "v",
            "event_id",
        ).to_pandas()
        return (
            out.sort_values("user_id")
            .reset_index(drop=True)
            .astype("int64")
        )

    def q_mst_trade_graph(sf_dir):
        """Minimum spanning forest (ops/mst.boruvka_msf — Borůvka
        rounds: per-component grouped-min outgoing edge + driver
        contraction, <=log2(n) rounds, raw edges never leave the
        cluster) over the canonical undirected supplier↔customer
        nation trade graph. Weights are made UNIQUE per edge
        ((count mod 983)·10⁴ + lo·100 + hi) so the forest — and
        therefore the edge-set checksum — is deterministic; the
        oracle picks the identical edges by replaying Kruskal as a
        component-list-carrying recursive CTE."""
        import pandas as pd

        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.mst import boruvka_msf
        from ocr_service_ray.ops.relational import hash_join

        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
        od = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        cu = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
        su = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
        j = hash_join(li, od, on="l_orderkey", right_on="o_orderkey")
        j = hash_join(j, cu, on="o_custkey", right_on="c_custkey")
        j = hash_join(j, su, on="l_suppkey", right_on="s_suppkey")
        cnt = grouped_agg(
            j, ["s_nationkey", "c_nationkey"], {"n": (None, "count")}
        )

        def canon(b: pa.Table) -> pa.Table:
            s = b["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            c = b["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = s != c
            s, c, n = s[keep], c[keep], n[keep]
            return pa.table(
                {
                    "lo": pa.array(np.minimum(s, c)),
                    "hi": pa.array(np.maximum(s, c)),
                    "n": pa.array(n),
                }
            )

        und = grouped_agg(
            cnt.map_batches(canon, batch_format="pyarrow"),
            ["lo", "hi"],
            {"tot": ("n", "sum")},
        )

        def weight(b: pa.Table) -> pa.Table:
            lo = b["lo"].to_numpy(zero_copy_only=False).astype(np.int64)
            hi = b["hi"].to_numpy(zero_copy_only=False).astype(np.int64)
            t = b["tot"].to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table(
                {
                    "src": pa.array(lo),
                    "dst": pa.array(hi),
                    "w": pa.array((t % 983) * 10_000 + lo * 100 + hi),
                }
            )

        out = boruvka_msf(und.map_batches(weight, batch_format="pyarrow"))
        return pd.DataFrame(
            {
                k: pd.array([out[k]], dtype="int64")
                for k in (
                    "n_nodes",
                    "n_edges",
                    "n_components",
                    "msf_edges",
                    "msf_weight",
                    "edge_checksum",
                )
            }
        )

    def q_hyperball_nations(sf_dir):
        """HyperBall neighborhood function (ops/hyperball.py — Boldi-
        Vigna HLL-counter propagation: ball growth is an elementwise
        register max, so each radius is ONE edge scan + grouped-max
        combiner, never a per-node BFS) over the directed nation
        trade graph sparsified to count%7==0 edges (the dense graph
        saturates at radius 1). Registers follow the ops/sketch md5
        discipline, so the oracle replays the register tables round
        by round and the raw-estimate micro arithmetic in exact
        integers."""
        from ocr_service_ray.ops.agg import grouped_agg
        from ocr_service_ray.ops.hyperball import hyperball_rounds
        from ocr_service_ray.ops.relational import hash_join

        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"])
        od = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        cu = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"])
        su = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"])
        j = hash_join(li, od, on="l_orderkey", right_on="o_orderkey")
        j = hash_join(j, cu, on="o_custkey", right_on="c_custkey")
        j = hash_join(j, su, on="l_suppkey", right_on="s_suppkey")
        cnt = grouped_agg(
            j, ["s_nationkey", "c_nationkey"], {"n": (None, "count")}
        )

        def sparsify(b: pa.Table) -> pa.Table:
            s = b["s_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            c = b["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
            n = b["n"].to_numpy(zero_copy_only=False).astype(np.int64)
            keep = (s != c) & (n % 7 == 0)
            return pa.table(
                {"src": pa.array(s[keep]), "dst": pa.array(c[keep])}
            )

        return hyperball_rounds(
            cnt.map_batches(sparsify, batch_format="pyarrow"), rounds=3, p=4
        )

    return {
        "hyperball_nations": q_hyperball_nations,
        "mst_trade_graph": q_mst_trade_graph,
        "kruskal_rank_sums": q_kruskal_rank_sums,
        "degree_assortativity": q_degree_assortativity,
        "pr_curve_points": q_pr_curve_points,
        "brier_decomposition": q_brier_decomposition,
        "readability_scores": q_readability_scores,
        "phonetic_blocking": q_phonetic_blocking,
        "cuped_moments": q_cuped_moments,
        "t_closeness_audit": q_t_closeness_audit,
        "range_partition_plan": q_range_partition_plan,
        "runs_test_daily": q_runs_test_daily,
        "resolve_parts": q_resolve_parts,
        "median_of_means_value": q_median_of_means_value,
        "spatial_linf_join": q_spatial_linf_join,
        "kaplan_meier_users": q_kaplan_meier_users,
        "hodges_lehmann_value": q_hodges_lehmann_value,
        "map_eval_sources": q_map_eval_sources,
        "did_value": q_did_value,
        "matching_att": q_matching_att,
        "sssp_nations": q_sssp_nations,
        "sparse_cosine_pairs": q_sparse_cosine_pairs,
        "equality_delete_orders": q_equality_delete_orders,
        "friedman_daily_types": q_friedman_daily_types,
        "dehyphenate_docs": q_dehyphenate_docs,
        "mojibake_audit": q_mojibake_audit,
        "wasserstein_lengths": q_wasserstein_lengths,
        "schema_evolution_union": q_schema_evolution_union,
        "ips_policy_value": q_ips_policy_value,
        "ams_f2_users": q_ams_f2_users,
        "haar_synopsis_daily": q_haar_synopsis_daily,
        "lis_daily_values": q_lis_daily_values,
        "dbscan_embeddings": q_dbscan_embeddings,
        "kll_quantiles_value": q_kll_quantiles_value,
        "kmv_distinct_cents": q_kmv_distinct_cents,
        "kmv_set_ops_cents": q_kmv_set_ops_cents,
        "bpe_pair_counts": q_bpe_pair_counts,
        "bpe_learn_merges": q_bpe_learn_merges,
        "bpe_subword_counts": q_bpe_subword_counts,
        "kcenter_coreset": q_kcenter_coreset,
        "cdc_apply_changelog": q_cdc_apply_changelog,
        "pq_ann_eval": q_pq_ann_eval,
        "ols2_hour_dow": q_ols2_hour_dow,
        "max_coverage_docs": q_max_coverage_docs,
        "quantile_normalize_lengths": q_quantile_normalize_lengths,
        "energy_distance_values": q_energy_distance_values,
        "interval_schedule_value": q_interval_schedule_value,
        "correct_text_guards": q_correct_text_guards,
        "token_counts": q_token_counts,
        "bpe_token_count": q_bpe_token_count,
        "lang_distribution": q_lang_distribution,
        "top_sources": q_top_sources,
        "exact_dedup": q_exact_dedup,
        "windowed_events": q_windowed_events,
        "sliding_window_events": q_sliding_window_events,
        "promote_shape_events": q_promote_shape_events,
        "top_error_users": q_top_error_users,
        "sessionize_users": q_sessionize_users,
        "join_orders_customers": q_join_orders_customers,
        "hash_join_orders_lineitem": q_hash_join_orders_lineitem,
        "lineitem_pricing": q_lineitem_pricing,
        "sort_topk_orders": q_sort_topk_orders,
        "asof_purchase_click": q_asof_purchase_click,
        "range_join_values": q_range_join_values,
        "knn_brute": q_knn_brute,
        "embedding_norms": q_embedding_norms,
        "near_dup_sample": q_near_dup_sample,
        "near_dup_lsh_blocked": q_near_dup_lsh_blocked,
        "salted_event_totals": q_salted_event_totals,
        "ngram_jaccard": q_ngram_jaccard,
        "dup_ngram_stats": q_dup_ngram_stats,
        "unique_langs": q_unique_langs,
        "train_val_split": q_train_val_split,
        "next_epoch": q_next_epoch,
        "html_main_content": q_html_main_content,
        "simple_spell": q_simple_spell,
        "hash_sample_docs": q_hash_sample_docs,
        "stratified_split_counts": q_stratified_split_counts,
        "anti_join_orders": q_anti_join_orders,
        "spell_guard": q_spell_guard,
        "ml_quality_combined": q_ml_quality_combined,
        "flagship_extraction": q_flagship_extraction,
        "classify_docs": q_classify_docs,
        "render_json": q_render_json,
        "render_text": q_render_text,
        "lang_id": q_lang_id,
        "quality_scores": q_quality_scores,
        "fingerprint": q_fingerprint,
        "minhash_dedup": q_minhash_dedup,
        "dedup_clusters": q_dedup_clusters,
        "hll_users": q_hll_users,
        "tfidf_topk": q_tfidf_topk,
        "tfidf_topk_shuffle": q_tfidf_topk_shuffle,
        "bm25_docs": q_bm25_docs,
        "decontam_pairs": q_decontam_pairs,
        "grouped_topk_events": q_grouped_topk_events,
        "running_user_value": q_running_user_value,
        "event_value_quantiles": q_event_value_quantiles,
        "label_centroid_sums": q_label_centroid_sums,
        "distinct_users_per_type": q_distinct_users_per_type,
        "kmeans_clusters": q_kmeans_clusters,
        "inverted_search": q_inverted_search,
        "pack_sequences": q_pack_sequences,
        "user_event_sequences": q_user_event_sequences,
        "bigram_top": q_bigram_top,
        "quantiles_cont_quantity": q_quantiles_cont_quantity,
        "outlier_events": q_outlier_events,
        "mode_priority": q_mode_priority,
        "profile_orders": q_profile_orders,
        "weighted_sample_events": q_weighted_sample_events,
        "snapshot_diff": q_snapshot_diff,
        "simhash_dedup": q_simhash_dedup,
        "ivf_knn": q_ivf_knn,
        "lsh_knn": q_lsh_knn,
        "multimodal_decode": q_multimodal_decode,
        "multimodal_routed": q_multimodal_routed,
        "sessionize_streaming": q_sessionize_streaming,
        "feedback_promote": q_feedback_promote,
        "json_props_stats": q_json_props_stats,
        "windowed_streaming": q_windowed_streaming,
        "consensus_suggestions": q_consensus_suggestions,
        "corpus_summary": q_corpus_summary,
        "repetition_rules": q_repetition_rules,
        "redact_props": q_redact_props,
        "length_deciles": q_length_deciles,
        "quantized_embeddings": q_quantized_embeddings,
        "mix_schedule": q_mix_schedule,
        "decontam_pairs_bloom": q_decontam_pairs_bloom,
        "global_ranks": q_global_ranks,
        "heavy_tokens": q_heavy_tokens,
        "curate_corpus": q_curate_corpus,
        "event_interarrival": q_event_interarrival,
        "moving_sum_user_value": q_moving_sum_user_value,
        "rollup_order_totals": q_rollup_order_totals,
        "pivot_user_events": q_pivot_user_events,
        "paragraph_dedup": q_paragraph_dedup,
        "per_source_cap": q_per_source_cap,
        "range_sum_user_value": q_range_sum_user_value,
        "contamination_ratio": q_contamination_ratio,
        "temperature_mix": q_temperature_mix,
        "nations_intersect": q_nations_intersect,
        "nations_except": q_nations_except,
        "nations_union": q_nations_union,
        "dense_rank_user_value": q_dense_rank_user_value,
        "decontam_best_match": q_decontam_best_match,
        "prune_corpus": q_prune_corpus,
        "funnel_stages": q_funnel_stages,
        "mad_outlier_events": q_mad_outlier_events,
        "hll_users_per_type": q_hll_users_per_type,
        "zorder_orders": q_zorder_orders,
        "normalized_dedup": q_normalized_dedup,
        "winsorized_values": q_winsorized_values,
        "fuzzy_part_names": q_fuzzy_part_names,
        "streaming_dedup": q_streaming_dedup,
        "view_purchase_attribution": q_view_purchase_attribution,
        "banded_doc_sample": q_banded_doc_sample,
        "event_transitions": q_event_transitions,
        "csv_ingest": q_csv_ingest,
        "jsonl_ingest": q_jsonl_ingest,
        "source_pagerank": q_source_pagerank,
        "funnel_cohorts": q_funnel_cohorts,
        "part_triangles": q_part_triangles,
        "chunk_documents": q_chunk_documents,
        "retention_daily": q_retention_daily,
        "distinct_types_running": q_distinct_types_running,
        "pareto_parts": q_pareto_parts,
        "pricing_comoments": q_pricing_comoments,
        "revenue_by_nation": q_revenue_by_nation,
        "top_user_paths": q_top_user_paths,
        "rolling_wau": q_rolling_wau,
        "hourly_type_grid": q_hourly_type_grid,
        "events_checksum": q_events_checksum,
        "incremental_event_totals": q_incremental_event_totals,
        "session_overlaps": q_session_overlaps,
        "balanced_source_sample": q_balanced_source_sample,
        "span_corruption_pairs": q_span_corruption_pairs,
        "proportional_docs": q_proportional_docs,
        "frequent_part_pairs": q_frequent_part_pairs,
        "type_share_ppm": q_type_share_ppm,
        "latest_user_event": q_latest_user_event,
        "part_degree_histogram": q_part_degree_histogram,
        "part_kcore": q_part_kcore,
        "rolling_value_outliers": q_rolling_value_outliers,
        "source_vocab_overlap": q_source_vocab_overlap,
        "diverse_top_docs": q_diverse_top_docs,
        "multi_knn_batch": q_multi_knn_batch,
        "hashed_embeddings": q_hashed_embeddings,
        "keyword_contexts_spark": q_keyword_contexts_spark,
        "langid_confusion": q_langid_confusion,
        "value_cume_micro": q_value_cume_micro,
        "embedding_clusters": q_embedding_clusters,
        "ann_recall_at_k": q_ann_recall_at_k,
        "partitioned_sink_roundtrip": q_partitioned_sink_roundtrip,
        "pruned_read_orders": q_pruned_read_orders,
        "negative_part_samples": q_negative_part_samples,
        "constraint_report": q_constraint_report,
        "user_rfm": q_user_rfm,
        "bpe_merge_candidates": q_bpe_merge_candidates,
        "dup_weighting": q_dup_weighting,
        "late_events": q_late_events,
        "golden_records": q_golden_records,
        "skipgram_pairs": q_skipgram_pairs,
        "sliding_distinct_types": q_sliding_distinct_types,
        "next_token_top3": q_next_token_top3,
        "quality_rank_in_source": q_quality_rank_in_source,
        "dedup_rate_by_source": q_dedup_rate_by_source,
        "value_histogram": q_value_histogram,
        "daily_type_delta": q_daily_type_delta,
        "session_count_histogram": q_session_count_histogram,
        "value_trend_ols": q_value_trend_ols,
        "cusum_change_point": q_cusum_change_point,
        "time_weighted_value": q_time_weighted_value,
        "user_dom_bitmap": q_user_dom_bitmap,
        "benford_totalprice": q_benford_totalprice,
        "event_pair_lift": q_event_pair_lift,
        "lang_tv_by_source": q_lang_tv_by_source,
        "type_user_hhi": q_type_user_hhi,
        "ewma_event_counts": q_ewma_event_counts,
        "daily_autocorr": q_daily_autocorr,
        "customer_event_reconcile": q_customer_event_reconcile,
        "daily_user_jaccard": q_daily_user_jaccard,
        "gini_user_activity": q_gini_user_activity,
        "activity_streaks": q_activity_streaks,
        "hapax_by_source": q_hapax_by_source,
        "q7_trade_volume": q7_trade_volume,
        "label_centroid_cosine": q_label_centroid_cosine,
        "quality_rate_ztest": q_quality_rate_ztest,
        "chi2_type_weekday": q_chi2_type_weekday,
        "source_shingle_jaccard": q_source_shingle_jaccard,
        "length_ks_by_source": q_length_ks_by_source,
        "score_decile_lift": q_score_decile_lift,
        "event_run_lengths": q_event_run_lengths,
        "type_user_cosine": q_type_user_cosine,
        "burstiness_fano": q_burstiness_fano,
        "type_top_decile_share": q_type_top_decile_share,
        "quality_auc": q_quality_auc,
        "reorder_gap_quantiles": q_reorder_gap_quantiles,
        "systematic_sample_orders": q_systematic_sample_orders,
        "weighted_price_quantiles": q_weighted_price_quantiles,
        "jaccard_pair_join": q_jaccard_pair_join,
        "growth_accounting": q_growth_accounting,
        "above_priority_avg": q_above_priority_avg,
        "rrf_prune_candidates": q_rrf_prune_candidates,
        "order_width_histogram": q_order_width_histogram,
        "rolling_type_correlation": q_rolling_type_correlation,
        "seasonal_outlier_days": q_seasonal_outlier_days,
        "oov_rate_by_source": q_oov_rate_by_source,
        "conversion_lag_quantiles": q_conversion_lag_quantiles,
        "slice_health_report": q_slice_health_report,
        "snm_candidate_pairs": q_snm_candidate_pairs,
        "leadlag_view_purchase": q_leadlag_view_purchase,
        "cramers_v_lang_source": q_cramers_v_lang_source,
        "daily_value_p95": q_daily_value_p95,
        "frequent_part_triples": q_frequent_part_triples,
        "bounce_rate_by_entry": q_bounce_rate_by_entry,
        "user_burstiness": q_user_burstiness,
        "daily_mix_drift": q_daily_mix_drift,
        "orders_ntile_revenue": q_orders_ntile_revenue,
        "topk_with_ties_orders": q_topk_with_ties_orders,
        "unpivot_roundtrip": q_unpivot_roundtrip,
        "first_last_matrix": q_first_last_matrix,
        "part_khop_reach": q_part_khop_reach,
        "label_dispersion": q_label_dispersion,
        "monthly_revenue_reconcile": q_monthly_revenue_reconcile,
        "balance_band_pairs": q_balance_band_pairs,
        "nation_share_of_region": q_nation_share_of_region,
        "sentence_stats_by_lang": q_sentence_stats_by_lang,
        "price_anova_eta2": q_price_anova_eta2,
        "brand_supplier_counts": q_brand_supplier_counts,
        "revenue_whale_share": q_revenue_whale_share,
        "brand_return_ztest": q_brand_return_ztest,
        "exact_dup_components": q_exact_dup_components,
        "churned_customers_1995": q_churned_customers_1995,
        "median_split_priorities": q_median_split_priorities,
        "parts_never_ordered": q_parts_never_ordered,
        "spearman_balance_activity": q_spearman_balance_activity,
        "decile_migration": q_decile_migration,
        "weekend_value_ratio": q_weekend_value_ratio,
        "peak_concurrent_sessions": q_peak_concurrent_sessions,
        "dup_leakage_matrix": q_dup_leakage_matrix,
        "activity_decile_conversion": q_activity_decile_conversion,
        "cohort_revenue_matrix": q_cohort_revenue_matrix,
        "distinctive_terms": q_distinctive_terms,
        "session_depth_survival": q_session_depth_survival,
        "q3_shipping_priority": q3_shipping_priority,
        "q4_late_priority_counts": q4_late_priority_counts,
        "q14_promo_revenue": q14_promo_revenue,
        "q18_big_quantity_orders": q18_big_quantity_orders,
        "markov_stationary": q_markov_stationary,
        "ttr_by_length_decile": q_ttr_by_length_decile,
        "scd2_type_intervals": q_scd2_type_intervals,
        "user_net_drawdown": q_user_net_drawdown,
        "embedding_covariance": q_embedding_covariance,
        "cms_token_counts": q_cms_token_counts,
        "skew_audit_events": q_skew_audit_events,
        "median_value_by_type": q_median_value_by_type,
        "top2_margin_by_type": q_top2_margin_by_type,
        "debounce_events": q_debounce_events,
        "embedding_top_dims": q_embedding_top_dims,
        "lang_impurity_by_source": q_lang_impurity_by_source,
        "join_size_estimate": q_join_size_estimate,
        "business_day_latency": q_business_day_latency,
        "kendall_even_odd": q_kendall_even_odd,
        "trimmed_mean_by_type": q_trimmed_mean_by_type,
        "rle_runs_orders": q_rle_runs_orders,
        "partition_manifest_orders": q_partition_manifest_orders,
        "wow_by_weekday": q_wow_by_weekday,
        "theil_sen_daily": q_theil_sen_daily,
        "q6_forecast_revenue": q6_forecast_revenue,
        "q10_returned_revenue": q10_returned_revenue,
        "q13_custdist": q13_custdist,
        "q15_top_supplier": q15_top_supplier,
        "minhash_pr_eval": q_minhash_pr_eval,
        "latency_slo_report": q_latency_slo_report,
        "revenue_waterfall_mom": q_revenue_waterfall_mom,
        "iterative_median_price": q_iterative_median_price,
        "bucketed_cojoin_revenue": q_bucketed_cojoin_revenue,
        "hll_union_users": q_hll_union_users,
        "inversion_count_purchases": q_inversion_count_purchases,
        "checksum_tree_events": q_checksum_tree_events,
        "max_gap_endpoints": q_max_gap_endpoints,
        "ivm_join_view": q_ivm_join_view,
        "purchase_density_window": q_purchase_density_window,
        "orders_fully_shipped": q_orders_fully_shipped,
        "densify_user_days": q_densify_user_days,
        "order_backlog_monthly": q_order_backlog_monthly,
        "kfold_value_stats": q_kfold_value_stats,
        "rbo_rank_overlap": q_rbo_rank_overlap,
        "discount_elasticity_by_brand": q_discount_elasticity_by_brand,
        "threshold_algorithm_topk": q_threshold_algorithm_topk,
        "mutual_best_pairs": q_mutual_best_pairs,
        "bigram_lm_holdout_acc": q_bigram_lm_holdout_acc,
        "vocab_saturation_doc": q_vocab_saturation_doc,
        "earliest_purchasers": q_earliest_purchasers,
        "q19_disjunctive_revenue": q19_disjunctive_revenue,
        "next_greater_distance": q_next_greater_distance,
        "wap_publish_events": q_wap_publish_events,
        "time_travel_read": q_time_travel_read,
        "phrase_search": q_phrase_search,
        "delta_encoding_estimate": q_delta_encoding_estimate,
        "decayed_type_counts": q_decayed_type_counts,
        "k_anonymity_audit": q_k_anonymity_audit,
        "fd_violations": q_fd_violations,
        "q5_local_supplier_volume": q5_local_supplier_volume,
        "q8_market_share": q8_market_share,
        "q17_small_quantity_revenue": q17_small_quantity_revenue,
        "q22_dormant_balance": q22_dormant_balance,
        "q9_profit_proxy": q9_profit_proxy,
        "q11_important_parts": q11_important_parts,
        "q20_promo_shippers": q20_promo_shippers,
        "q21_dominant_supplier": q21_dominant_supplier,
        "daily_value_ohlc": q_daily_value_ohlc,
        "script_mix_by_lang": q_script_mix_by_lang,
        "split_leakage_rate": q_split_leakage_rate,
        "hard_negatives": q_hard_negatives,
        "topk_users_with_other": q_topk_users_with_other,
        "quality_decile_review_rate": q_quality_decile_review_rate,
        "knn_mutual_rate": q_knn_mutual_rate,
        "interpolate_user_days": q_interpolate_user_days,
        "blocking_eval": q_blocking_eval,
        "user_active_time": q_user_active_time,
        "mcv_stats_orders": q_mcv_stats_orders,
        "blocklist_audit": q_blocklist_audit,
        "cross_lang_dups": q_cross_lang_dups,
        "max_event_rate_per_user": q_max_event_rate_per_user,
        "vocab_coverage_topk": q_vocab_coverage_topk,
        "filter_ablation": q_filter_ablation,
        "encoding_plan_orders": q_encoding_plan_orders,
        "q12_returnflag_priority": q_q12_returnflag_priority,
        "padding_waste_sweep": q_padding_waste_sweep,
        "compaction_bins_orders": q_compaction_bins_orders,
        "boilerplate_prefix_share": q_boilerplate_prefix_share,
        "mannwhitney_u_value": q_mannwhitney_u_value,
        "simpson_flip_audit": q_simpson_flip_audit,
        "cdc_upsert_orders": q_cdc_upsert_orders,
        "max_token_run": q_max_token_run,
        "hash_bucket_uniformity": q_hash_bucket_uniformity,
        "token_budget_cap": q_token_budget_cap,
        "cube_revenue": q_cube_revenue,
        "vacuum_plan_orders": q_vacuum_plan_orders,
        "sorted_lcp_docs": q_sorted_lcp_docs,
        "skew_join_user_age": q_skew_join_user_age,
        "positional_delete_orders": q_positional_delete_orders,
        "isotonic_purchase_rate": q_isotonic_purchase_rate,
        "gmd_value_by_type": q_gmd_value_by_type,
        "logistic_gd_purchase": q_logistic_gd_purchase,
        "conformal_threshold": q_conformal_threshold,
        "dsir_selection": q_dsir_selection,
        "zorder_stats_orders": q_zorder_stats_orders,
        "novelty_report": q_novelty_report,
        "pagerank_nations": q_pagerank_nations,
        "attribution_linear": q_attribution_linear,
        "reading_order_docs": q_reading_order_docs,
        "delta_dedup": q_delta_dedup,
        "pca_top_component": q_pca_top_component,
        "cdc_chunk_stats": q_cdc_chunk_stats,
        "curriculum_order": q_curriculum_order,
        "stream_stream_join": q_stream_stream_join,
        "ann_recall": q_ann_recall,
        "bpe_merge_pairs": q_bpe_merge_pairs,
        "bootstrap_value_ci": q_bootstrap_value_ci,
        "quantization_error": q_quantization_error,
        "mmr_select": q_mmr_select,
        "event_path_trigrams": q_event_path_trigrams,
        "label_noise": q_label_noise,
        "dup_cluster_histogram": q_dup_cluster_histogram,
        "redaction_audit": q_redaction_audit,
        "denormalize_orders": q_denormalize_orders,
        "neyman_sample": q_neyman_sample,
        "harmonic_mean_value": q_harmonic_mean_value,
        "churn_dataset": q_churn_dataset,
        "token_fertility": q_token_fertility,
        "rfm_scores": q_rfm_scores,
        "chunk_dup_by_source": q_chunk_dup_by_source,
        "l_diversity_audit": q_l_diversity_audit,
        "randomized_response_counts": q_randomized_response_counts,
        "quality_ece": q_quality_ece,
        "langid_kappa": q_langid_kappa,
        "hits_nations": q_hits_nations,
        "permutation_test_value": q_permutation_test_value,
        "bloom_fpr_audit": q_bloom_fpr_audit,
        "bloom_semi_orders": q_bloom_semi_orders,
        "containment_pairs": q_containment_pairs,
    }


# ---------------------------------------------------------------- oracles


# Shared SQL fragments for the generative-media mirror (constants
# imported from sources/synth.py so the Python rule and the SQL oracle
# cannot drift).


def _gen_hj_sql(j: int) -> str:
    return f"((h0 + {(j + 1) * 69427}) % 2147483647)"


def _gen_conf_sql(j: int) -> str:
    h = _gen_hj_sql(j)
    return (
        f"(CAST((CASE WHEN {h} % 7 = 0 THEN 50 ELSE 550 END) + {h} % 400 "
        f"AS DOUBLE) / 1000.0)"
    )


def _gen_conf_mean_sql(max_lines: int) -> str:
    """Left-assoc fold of the ordered line confidences: sum()/len in
    Python is c0, (c0+c1), ((c0+c1)+c2), ... — mirrored exactly."""
    whens = " ".join(
        f"WHEN {n} THEN " + " + ".join(_gen_conf_sql(j) for j in range(n))
        for n in range(1, max_lines)
    )
    last = " + ".join(_gen_conf_sql(j) for j in range(max_lines))
    return f"(CASE n_lines {whens} ELSE {last} END / n_lines)"


def _gen_flag_sql(j: int, mod: int) -> str:
    return f"(CASE WHEN n_lines > {j} AND {_gen_hj_sql(j)} % {mod} = 0 THEN 1 ELSE 0 END)"


def _gen_planted_total_sql() -> str:
    """CTE-free total of planted corrections across the generative
    corpus (shared by the consensus and corpus-summary oracles)."""
    from ocr_service_ray.sources.synth import GEN_LINES_MOD

    planted_sum = " + ".join(_gen_flag_sql(j, 5) for j in range(GEN_LINES_MOD))
    return f"""(
        SELECT COALESCE(SUM({planted_sum}), 0) FROM (
          SELECT h0, 1 + h0 % {GEN_LINES_MOD} AS n_lines FROM (
            SELECT (n * 2654435761 + k * 40503) % 2147483647 AS h0
            FROM (SELECT doc_id AS n FROM documents) d,
                 (VALUES (0), (1), (2)) ks(k)
            WHERE (k = 0 AND n % 3 = 0)
               OR (k = 1 AND n % 7 = 0)
               OR (k = 2 AND n % 11 = 0))))"""


def _flagship_oracle_sql() -> str:
    """DuckDB mirror of the generative flagship derivation.

    The interleaved corpus (pipelines/derive.py) and the generative
    media rule (sources/synth.py generate_media_row) are pure modular
    integer arithmetic of doc_id — this SQL reproduces every
    expression VERBATIM (same constants, same left-associated float
    folds), so the driver independently re-derives span counts,
    planted-correction counts, OCR confidence and the quality formula
    per document. ``needs_review`` is constant TRUE by construction:
    required_fields=None validates all 10 patterns and no generative
    document carries all 10.
    """
    from ocr_service_ray.sources.synth import GEN_LINES_MOD

    conf_mean = _gen_conf_mean_sql(GEN_LINES_MOD)
    planted_sum = " + ".join(_gen_flag_sql(j, 5) for j in range(GEN_LINES_MOD))
    lowconf_sum = " + ".join(_gen_flag_sql(j, 7) for j in range(GEN_LINES_MOD))

    imgq = (
        "(least(CAST(first_h0 % 2500 AS DOUBLE) / 10.0 / 100.0, 1.0) "
        "+ least(CAST(first_h0 % 700 AS DOUBLE) / 10.0 / 50.0, 1.0) "
        "+ (1.0 - abs((40.0 + CAST(first_h0 % 1600 AS DOUBLE) / 10.0) - 127.5) / 127.5)"
        ") / 3.0"
    )

    return f"""
        WITH d AS (SELECT doc_id AS n FROM documents),
        media AS (
          SELECT n, k, (n * 2654435761 + k * 40503) % 2147483647 AS h0
          FROM d, (VALUES (0), (1), (2)) ks(k)
          WHERE (k = 0 AND n % 3 = 0)
             OR (k = 1 AND n % 7 = 0)
             OR (k = 2 AND n % 11 = 0)
        ),
        mlines AS (
          SELECT n, k, h0, 1 + h0 % {GEN_LINES_MOD} AS n_lines FROM media
        ),
        mfeat AS (
          SELECT n, k, h0,
                 {conf_mean} AS conf_mean,
                 {planted_sum} AS planted,
                 {lowconf_sum} AS lowconf
          FROM mlines
        ),
        per_doc AS (
          SELECT d.n,
                 CAST(d.n % 3 = 0 AS INT) AS has_pdf,
                 CAST(d.n % 7 = 0 AS INT) AS has_img,
                 CAST(d.n % 11 = 0 AS INT) AS has_area,
                 p.conf_mean AS pdf_conf,
                 i.conf_mean AS img_conf,
                 COALESCE(p.planted, 0) + COALESCE(i.planted, 0)
                   + COALESCE(a.planted, 0) AS n_corr,
                 COALESCE(i.lowconf, 0) AS n_hw,
                 COALESCE(p.h0, i.h0) AS first_h0
          FROM d
          LEFT JOIN mfeat p ON p.n = d.n AND p.k = 0
          LEFT JOIN mfeat i ON i.n = d.n AND i.k = 1
          LEFT JOIN mfeat a ON a.n = d.n AND a.k = 2
        ),
        scored AS (
          SELECT n,
                 1 + has_pdf + has_img AS total_pages,
                 1 + has_pdf + has_img + has_area AS n_spans,
                 n_corr,
                 ((1.0 + COALESCE(pdf_conf, 0.0)) + COALESCE(img_conf, 0.0))
                   / (1 + has_pdf + has_img) AS ocr_conf,
                 CASE WHEN first_h0 IS NULL THEN 1.0 ELSE {imgq} END AS imgq,
                 n_hw
          FROM per_doc
        )
        SELECT 'tdoc-' || lpad(CAST(n AS VARCHAR), 8, '0') AS doc_id,
               CAST(n_spans AS BIGINT) AS n_spans,
               CAST(total_pages AS BIGINT) AS total_pages,
               CAST(n_corr AS BIGINT) AS n_corrections,
               CAST(floor(ocr_conf * 1000000.0 + 0.5) AS BIGINT) AS ocr_conf_micro,
               CAST(floor(greatest(0.0, least(1.0,
                    imgq * 0.3 + ocr_conf * 0.5 + (1.0 - n_hw * 0.1) * 0.2
                    )) * 1000000.0 + 0.5) AS BIGINT) AS quality_micro,
               TRUE AS needs_review
        FROM scored
    """


def _lang_id_oracle_sql() -> str:
    """Argmax of per-language stopword-profile hits, ties resolved in
    profile order (numpy argmax keeps the FIRST max — mirrored by the
    ordered CASE chain)."""
    from ocr_service_ray.ops.text import LANG_PROFILES

    langs = list(LANG_PROFILES)
    counts = ",\n".join(
        f"                 length(regexp_extract_all(lower(text), '{rx}')) AS c_{lang}"
        for lang, rx in LANG_PROFILES.items()
    )
    greatest_all = ", ".join(f"c_{lang}" for lang in langs)
    chain = []
    for i, lang in enumerate(langs[:-1]):
        conds = " AND ".join(f"c_{lang} >= c_{other}" for other in langs[i + 1 :])
        chain.append(f"WHEN {conds} THEN '{lang}'")
    chain.append(f"ELSE '{langs[-1]}'")
    case_body = "\n                     ".join(chain)
    return f"""
            WITH c AS (
              SELECT doc_id,
{counts}
              FROM documents)
            SELECT doc_id,
                   CASE WHEN greatest({greatest_all}) = 0 THEN 'und'
                     {case_body}
                   END AS pred_lang
            FROM c
        """


def _fingerprint_oracle_sql() -> str:
    """Winnowing fingerprint in SQL: code points via unicode(), the
    8-gram polynomial rolling hash mod 2^64 in HUGEINT (per-window
    weights precomputed mod 2^64 — numpy's uint64 wraparound gives the
    same residues), min over windows, split into (hi32, lo32)."""
    w = [pow(1000003, j, 2**64) for j in range(8)]
    terms = " + ".join(f"CAST(cs[i + {j}] AS HUGEINT) * {w[j]}" for j in range(8))
    return f"""
            WITH codes AS (
              SELECT doc_id,
                     list_transform(regexp_extract_all(text, '(?s).'),
                                    c -> unicode(c)) AS raw_cs
              FROM documents),
            padded AS (
              SELECT doc_id,
                     list_resize(raw_cs, greatest(length(raw_cs), 8), 1) AS cs
              FROM codes),
            fps AS (
              SELECT doc_id,
                     list_aggregate(
                       list_transform(generate_series(1, length(cs) - 7),
                         i -> ({terms}) % 18446744073709551616),
                       'min') AS fp
              FROM padded)
            SELECT doc_id,
                   CAST(fp // 4294967296 AS BIGINT) AS fp_hi,
                   CAST(fp % 4294967296 AS BIGINT) AS fp_lo
            FROM fps
        """


def _next_epoch_oracle_sql() -> str:
    """§2.9: the promoted pair (from the feedback-fixture CTE)
    anti-joined against the inlined current DB keys and appended in
    promotion sort order — the whole next epoch re-derived in SQL."""
    from ocr_service_ray.kernels.correct import DEFAULT_CORRECTIONS
    from ocr_service_ray.sources.synth import generate_feedback

    fb = generate_feedback().to_pylist()
    fb_rows = ",\n              ".join(
        f"('{r['type']}', '{r['original']}', '{r['corrected']}', "
        f"{r['confidence']!r}, {'TRUE' if r['applied'] else 'FALSE'})"
        for r in fb
    )
    cur_rows = ", ".join(
        f"({i}, '{k}', '{v}')" for i, (k, v) in enumerate(DEFAULT_CORRECTIONS)
    )
    return f"""
            WITH fb(type, original, corrected, confidence, applied) AS (VALUES
              {fb_rows}),
            unapplied AS (
              SELECT * FROM fb WHERE NOT applied AND type = 'correction'),
            promoted AS (
              SELECT original, corrected,
                     count(confidence) AS occ,
                     sum(confidence) / count(confidence) AS avg_conf
              FROM unapplied GROUP BY original, corrected
              HAVING count(confidence) >= 2
                 AND sum(confidence) / count(confidence) >= 0.7),
            cur(ord, from_, to_) AS (VALUES {cur_rows}),
            new AS (
              SELECT original, corrected,
                     row_number() OVER (ORDER BY occ DESC, avg_conf DESC) AS rn
              FROM promoted
              WHERE original NOT IN (SELECT from_ FROM cur))
            SELECT CAST(ord AS BIGINT) AS ord, from_, to_ AS "to" FROM cur
            UNION ALL
            SELECT CAST((SELECT count(*) FROM cur) + rn - 1 AS BIGINT),
                   original, corrected
            FROM new
        """


def _feedback_promote_oracle_sql() -> str:
    """A3 promotion logic over the deterministic feedback fixture,
    inlined as a VALUES CTE (the fixture is not a registered view;
    both sides share sources/synth.generate_feedback)."""
    from ocr_service_ray.sources.synth import generate_feedback

    fb = generate_feedback().to_pylist()
    rows = ",\n              ".join(
        f"('{r['type']}', '{r['original']}', '{r['corrected']}', "
        f"{r['confidence']!r}, {'TRUE' if r['applied'] else 'FALSE'})"
        for r in fb
    )
    return f"""
            WITH fb(type, original, corrected, confidence, applied) AS (VALUES
              {rows}),
            unapplied AS (
              SELECT * FROM fb WHERE NOT applied AND type = 'correction'),
            agg AS (
              SELECT original, corrected,
                     count(confidence) AS occurrences,
                     sum(confidence) / count(confidence) AS avg_confidence
              FROM unapplied GROUP BY original, corrected)
            SELECT original, corrected,
                   CAST(occurrences AS BIGINT) AS occurrences,
                   CAST(floor(avg_confidence * 1000000.0 + 0.5) AS BIGINT)
                     AS avg_confidence_micro
            FROM agg
            WHERE occurrences >= 2 AND avg_confidence >= 0.7
        """


def _render_base_ctes() -> str:
    """The shared WITH-chain of both render oracles: reconstructs the
    generative media line texts word by word (list-literal indexing on
    the same modular indices), assembles raw_text with the exact
    separators of kernels/assemble.py, applies the planted-token
    correction as a global replace, and ends in a ``rendered`` CTE
    carrying (n, n_corr, total_pages, ocr_conf, quality, full_text).
    Shares the quality / confidence arithmetic with the flagship
    oracle."""
    from ocr_service_ray.sources.synth import (
        GEN_LINES_MOD,
        GEN_WORDS_BASE,
        GEN_WORDS_MOD,
        _GEN_VOCAB,
    )

    voc = "[" + ", ".join(f"'{w}'" for w in _GEN_VOCAB) + "]"
    max_words = GEN_WORDS_BASE + GEN_WORDS_MOD - 1

    def line(j: int) -> str:
        h = _gen_hj_sql(j)
        parts = [f"{voc}[1 + ({h} + {m * 12289}) % 8]" for m in range(max_words)]
        # first GEN_WORDS_BASE words unconditional; word m (m ≥ base)
        # present iff hj % GEN_WORDS_MOD > m - base
        expr = " || ' ' || ".join(parts[:GEN_WORDS_BASE])
        conds = "".join(
            f" || CASE WHEN {h} % {GEN_WORDS_MOD} > {m - GEN_WORDS_BASE} "
            f"THEN ' ' || {parts[m]} ELSE '' END"
            for m in range(GEN_WORDS_BASE, max_words)
        )
        return (
            f"({expr}{conds}"
            f" || CASE WHEN {h} % 5 = 0 THEN ' пр0верка' ELSE '' END)"
        )

    media_text = (
        f"({line(0)}"
        + "".join(
            f" || CASE WHEN n_lines >= {j + 1} THEN chr(10) || {line(j)} ELSE '' END"
            for j in range(1, GEN_LINES_MOD)
        )
        + ")"
    )
    conf_mean = _gen_conf_mean_sql(GEN_LINES_MOD)
    planted_sum = " + ".join(_gen_flag_sql(j, 5) for j in range(GEN_LINES_MOD))
    lowconf_sum = " + ".join(_gen_flag_sql(j, 7) for j in range(GEN_LINES_MOD))
    imgq = (
        "(least(CAST(first_h0 % 2500 AS DOUBLE) / 10.0 / 100.0, 1.0) "
        "+ least(CAST(first_h0 % 700 AS DOUBLE) / 10.0 / 50.0, 1.0) "
        "+ (1.0 - abs((40.0 + CAST(first_h0 % 1600 AS DOUBLE) / 10.0) - 127.5) / 127.5)"
        ") / 3.0"
    )
    page_sep = "chr(10) || chr(10) || '--- Страница ---' || chr(10) || chr(10)"
    areas_hdr = "chr(10) || chr(10) || '--- ВЫДЕЛЕННЫЕ ОБЛАСТИ (DPI 900) ---' || chr(10) || chr(10)"
    main_hdr = "chr(10) || chr(10) || '--- ОСНОВНОЙ ТЕКСТ ---' || chr(10) || chr(10)"
    corr_line = "'пр0верка -> проверка (contextual_russian_word, 0.95)'"

    return f"""
        WITH d AS (SELECT doc_id AS n, text AS dtext FROM documents),
        media AS (
          SELECT n, k, (n * 2654435761 + k * 40503) % 2147483647 AS h0
          FROM d, (VALUES (0), (1), (2)) ks(k)
          WHERE (k = 0 AND n % 3 = 0)
             OR (k = 1 AND n % 7 = 0)
             OR (k = 2 AND n % 11 = 0)
        ),
        mlines AS (
          SELECT n, k, h0, 1 + h0 % {GEN_LINES_MOD} AS n_lines FROM media
        ),
        mfeat AS (
          SELECT n, k, h0,
                 {conf_mean} AS conf_mean,
                 {planted_sum} AS planted,
                 {lowconf_sum} AS lowconf,
                 {media_text} AS mtext
          FROM mlines
        ),
        per_doc AS (
          SELECT d.n, d.dtext,
                 CAST(d.n % 3 = 0 AS INT) AS has_pdf,
                 CAST(d.n % 7 = 0 AS INT) AS has_img,
                 CAST(d.n % 11 = 0 AS INT) AS has_area,
                 p.conf_mean AS pdf_conf, i.conf_mean AS img_conf,
                 p.mtext AS pdf_text, i.mtext AS img_text, a.mtext AS area_text,
                 COALESCE(p.planted, 0) + COALESCE(i.planted, 0)
                   + COALESCE(a.planted, 0) AS n_corr,
                 COALESCE(i.lowconf, 0) AS n_hw,
                 COALESCE(p.h0, i.h0) AS first_h0
          FROM d
          LEFT JOIN mfeat p ON p.n = d.n AND p.k = 0
          LEFT JOIN mfeat i ON i.n = d.n AND i.k = 1
          LEFT JOIN mfeat a ON a.n = d.n AND a.k = 2
        ),
        assembled AS (
          SELECT n, n_corr,
                 1 + has_pdf + has_img AS total_pages,
                 ((1.0 + COALESCE(pdf_conf, 0.0)) + COALESCE(img_conf, 0.0))
                   / (1 + has_pdf + has_img) AS ocr_conf,
                 CASE WHEN first_h0 IS NULL THEN 1.0 ELSE {imgq} END AS imgq,
                 n_hw,
                 dtext
                   || CASE WHEN has_pdf = 1 THEN {page_sep} || pdf_text ELSE '' END
                   || CASE WHEN has_img = 1 THEN {page_sep} || img_text ELSE '' END
                   AS main_text,
                 has_area, area_text
          FROM per_doc
        ),
        rendered AS (
          SELECT n, n_corr, total_pages, ocr_conf,
                 greatest(0.0, least(1.0,
                   imgq * 0.3 + ocr_conf * 0.5 + (1.0 - n_hw * 0.1) * 0.2)) AS quality,
                 replace(
                   CASE WHEN has_area = 1
                        THEN {areas_hdr} || '[Область 1]: ' || area_text
                             || {main_hdr} || main_text
                        ELSE main_text END,
                   'пр0верка', 'проверка') AS full_text
          FROM assembled
        )
    """


def _render_text_oracle_sql() -> str:
    """TEXT renderer oracle: the shared render CTEs plus the header /
    printf('%.3f') quality line / corrections appendix — C's
    correctly-rounded decimal conversion, identical to Python's
    format()."""
    corr_line = "'пр0верка -> проверка (contextual_russian_word, 0.95)'"
    return f"""
        {_render_base_ctes()}
        SELECT 'tdoc-' || lpad(CAST(n AS VARCHAR), 8, '0') AS doc_id,
               '=== Документ: tdoc-' || lpad(CAST(n AS VARCHAR), 8, '0') || ' ==='
               || chr(10) || 'Качество: ' || printf('%.3f', quality)
               || '  OCR: ' || printf('%.3f', ocr_conf)
               || '  Страниц: ' || CAST(total_pages AS VARCHAR)
               || chr(10) || chr(10) || full_text
               || CASE WHEN n_corr > 0
                       THEN chr(10) || chr(10) || '--- Исправления ---'
                            || repeat(chr(10) || {corr_line}, n_corr)
                       ELSE '' END
               AS rendered
        FROM rendered
    """


def _render_json_oracle_sql() -> str:
    """Partial oracle for the JSON renderer: the driver query renders
    the REAL json.dumps output, json.loads-parses it back (floats
    round-trip exactly), and projects SQL-comparable fields — so this
    SQL verifies every VALUE the JSON carries (full text byte-exact,
    micro-int floats, counts, flags); the one thing left unverified is
    the literal float byte layout (shortest-round-trip reprs are not
    SQL-reproducible — the reason this query was rows-only in r1/r2)."""
    return f"""
        {_render_base_ctes()}
        SELECT 'tdoc-' || lpad(CAST(n AS VARCHAR), 8, '0') AS doc_id,
               full_text,
               CAST(floor(quality * 1000000.0 + 0.5) AS BIGINT) AS quality_micro,
               CAST(floor(ocr_conf * 1000000.0 + 0.5) AS BIGINT) AS ocr_conf_micro,
               TRUE AS needs_review,
               CAST(n_corr AS BIGINT) AS n_corrections
        FROM rendered
    """


def _lsh_cell_terms_sql(vec_var: str, nbits: int = 4, seed: int = 13, dim: int = 64) -> str:
    """SQL expression for the hyperplane-LSH sign-bit cell id of a
    DOUBLE[] column ``vec_var`` — the same seeded planes as
    ops/similarity.LshIndex, inlined as double literals."""
    planes = np.random.RandomState(seed).standard_normal((nbits, dim))
    return " + ".join(
        f"(CASE WHEN list_dot_product({vec_var}, ["
        + ", ".join(repr(float(x)) for x in planes[i])
        + f"]) > 0.0 THEN {1 << i} ELSE 0 END)"
        for i in range(nbits)
    )


def _lsh_knn_oracle_sql(nbits: int = 4, radius: int = 1, seed: int = 13, dim: int = 64, k: int = 5) -> str:
    """Exact SQL mirror of the LshIndex search: the same seeded
    hyperplanes inlined as double literals, sign-bit cell assignment
    via list_dot_product, the radius-``radius`` Hamming probe set, and
    the cosine rerank limited to probed cells. The restriction itself
    is reproduced, so this oracle is exact whatever the recall."""
    cell_terms = _lsh_cell_terms_sql("v", nbits, seed, dim)
    return f"""
            WITH e AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
            cells AS (
              SELECT vec_id, v, {cell_terms} AS cell FROM e),
            q AS (SELECT v AS qv, cell AS qcell FROM cells WHERE vec_id = 0)
            SELECT c.vec_id,
                   CAST(floor(list_cosine_similarity(c.v, q.qv) * 1000000.0 + 0.5)
                        AS BIGINT) AS cos_sim_micro
            FROM cells c, q
            WHERE bit_count(xor(c.cell, q.qcell)) <= {radius}
            ORDER BY list_cosine_similarity(c.v, q.qv) DESC, c.vec_id ASC
            LIMIT {k}
        """


def _max_coverage_oracle_sql(k: int) -> str:
    """Greedy max-coverage unrolled as chained CTEs: dt = distinct
    (doc, word-bigram) pairs; each round's pick is the gain argmax
    (ORDER BY gain DESC, id LIMIT 1) over tokens not in the running
    covered set; a round whose gain table is empty contributes no row
    (the op's early stop)."""
    parts = [
        """w AS (
          SELECT doc_id, string_split(text, ' ') AS ws
          FROM documents WHERE text IS NOT NULL),
        pp AS (
          SELECT doc_id,
                 unnest(generate_series(1, greatest(length(ws) - 1, 0))) AS i,
                 ws
          FROM w),
        dt AS (
          SELECT DISTINCT doc_id AS id, ws[i] || ' ' || ws[i + 1] AS token
          FROM pp),
        g1 AS (SELECT id, CAST(count(*) AS BIGINT) AS gain FROM dt GROUP BY id),
        c1 AS (SELECT id, gain FROM g1 ORDER BY gain DESC, id LIMIT 1),
        cov1 AS (SELECT DISTINCT token FROM dt WHERE id IN (SELECT id FROM c1))"""
    ]
    for r in range(2, k + 1):
        parts.append(
            f"""g{r} AS (
          SELECT id, CAST(count(*) AS BIGINT) AS gain FROM dt
          WHERE token NOT IN (SELECT token FROM cov{r - 1})
          GROUP BY id),
        c{r} AS (SELECT id, gain FROM g{r} ORDER BY gain DESC, id LIMIT 1),
        cov{r} AS (
          SELECT token FROM cov{r - 1}
          UNION
          SELECT token FROM dt WHERE id IN (SELECT id FROM c{r}))"""
        )
    selects = " UNION ALL ".join(
        f"SELECT CAST({r - 1} AS BIGINT) AS sel_rank, id, gain, "
        f"CAST((SELECT count(*) FROM cov{r}) AS BIGINT) AS covered_total FROM c{r}"
        for r in range(1, k + 1)
    )
    return (
        "WITH "
        + ",\n        ".join(parts)
        + f"\n        SELECT * FROM ({selects}) ORDER BY sel_rank"
    )


def _kcenter_oracle_sql(k: int) -> str:
    """Greedy k-center unrolled as chained CTEs: c0 = min-id seed,
    d{r} carries each point's running min squared distance, c{r} is
    the ``ORDER BY d2 DESC, id LIMIT 1`` argmax — the exact total
    order ops/coreset.kcenter_greedy implements."""
    parts = [
        """p AS (
          SELECT vec_id AS id,
                 CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000.0 + 0.5)
                      AS BIGINT) AS x,
                 CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000000.0 + 0.5)
                      AS BIGINT) AS y
          FROM embeddings),
        c0 AS (SELECT id, x, y FROM p ORDER BY id LIMIT 1),
        d0 AS (
          SELECT p.id, p.x, p.y,
                 (p.x - c0.x) * (p.x - c0.x) + (p.y - c0.y) * (p.y - c0.y) AS d2
          FROM p, c0)"""
    ]
    for r in range(1, k):
        parts.append(
            f"c{r} AS (SELECT id, x, y, d2 FROM d{r - 1} ORDER BY d2 DESC, id LIMIT 1)"
        )
        if r < k - 1:
            parts.append(
                f"""d{r} AS (
          SELECT d.id, d.x, d.y,
                 LEAST(d.d2, (d.x - c.x) * (d.x - c.x) + (d.y - c.y) * (d.y - c.y)) AS d2
          FROM d{r - 1} d, c{r} c)"""
            )
    selects = " UNION ALL ".join(
        ["SELECT CAST(0 AS BIGINT) AS center_rank, id, CAST(0 AS BIGINT) AS radius2 FROM c0"]
        + [
            f"SELECT CAST({r} AS BIGINT), id, CAST(d2 AS BIGINT) FROM c{r}"
            for r in range(1, k)
        ]
    )
    return (
        "WITH "
        + ",\n        ".join(parts)
        + f"\n        SELECT * FROM ({selects}) ORDER BY center_rank"
    )


def _hex_bigint_sql(hex_expr: str, start: int, n: int) -> str:
    """SQL parsing ``n`` hex chars of ``hex_expr`` (1-based ``start``)
    big-endian into a BIGINT (n ≤ 15)."""
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substring({hex_expr}, {start + i}, 1)) - 1) * {16 ** (n - 1 - i)}"
        for i in range(n)
    )
    return f"({terms})"


def _md5_u64_sql(hex_expr: str) -> str:
    """SQL: first 16 hex chars of an md5 hex string → its uint64 value
    as HUGEINT (exact)."""
    hi = _hex_bigint_sql(hex_expr, 1, 8)
    lo = _hex_bigint_sql(hex_expr, 9, 8)
    return f"(CAST({hi} AS HUGEINT) * 4294967296 + {lo})"


def _md5_unit_sql(hex_col: str) -> str:
    """SQL: first 16 hex chars of an md5 column → uniform double in
    [0,1) — the exact mirror of ``stages/ml._stable_unit`` (parse hex
    big-endian as uint64, divide by 2^64; HUGEINT keeps the parse
    exact, and /2^64 is an exponent shift so rounding commutes)."""
    return f"(CAST({_md5_u64_sql(hex_col)} AS DOUBLE) / 18446744073709551616.0)"


def _simhash_oracle_sql(max_hamming: int = 8) -> str:
    """SimHash from scratch in SQL: md5-derived 64-bit token hashes,
    per-bit majority vote (integer compare 2·ones > n — exact), the
    4×16-bit pigeonhole banding, pairwise XOR popcount via
    ``bit_count``. Mirrors ops/dedup.simhash64 + simhash_candidates
    bit-for-bit (fingerprints compared as reinterpreted int64)."""
    sums = ",\n                 ".join(
        f"sum(CAST((h // {2**j}) % 2 AS BIGINT)) AS s{j}" for j in range(64)
    )
    fp_terms = " + ".join(
        f"(CASE WHEN 2 * s{j} > n THEN CAST({2**j} AS HUGEINT) ELSE CAST(0 AS HUGEINT) END)"
        for j in range(64)
    )
    return f"""
            WITH toks AS (
              SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS tok
              FROM documents),
            th AS (
              SELECT doc_id, {_md5_u64_sql("md5(tok)")} AS h FROM toks),
            agg AS (
              SELECT doc_id, count(*) AS n,
                 {sums}
              FROM th GROUP BY doc_id),
            fps AS (
              SELECT d.doc_id,
                     COALESCE(({fp_terms}), CAST(0 AS HUGEINT)) AS ufp
              FROM documents d LEFT JOIN agg USING (doc_id)),
            sfp AS (
              SELECT doc_id,
                     CAST(CASE WHEN ufp >= 9223372036854775808
                               THEN ufp - 18446744073709551616
                               ELSE ufp END AS BIGINT) AS fp
              FROM fps),
            bands AS (
              SELECT doc_id, fp, b, (fp >> (b * 16)) & 65535 AS bv
              FROM sfp, (VALUES (0), (1), (2), (3)) bands(b)),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b,
                     a.fp AS fa, c.fp AS fc
              FROM bands a
              JOIN bands c ON a.b = c.b AND a.bv = c.bv AND a.doc_id < c.doc_id)
            SELECT id_a, id_b,
                   CAST(bit_count(xor(fa, fc)) AS BIGINT) AS hamming
            FROM cand WHERE bit_count(xor(fa, fc)) <= {max_hamming}
        """


def _minhash_cte_sql(src: str = "documents") -> str:
    """MinHash-LSH from scratch in SQL, as a CTE chain ending in
    ``est (id_a, id_b, eq)``: distinct word-3-gram shingles,
    md5-derived 32-bit shingle hashes, the 64 inlined (a, b) permanent
    parameters of ops/dedup._perm_params, per-perm min over shingles,
    16×4 banding via ordered string_agg keys, bucket self-join for
    candidates, eq = equal-position signature count. Shared by the
    ``minhash_dedup``, ``dedup_clusters`` and ``curate_corpus``
    oracles (``src`` = the relation/CTE holding the corpus)."""
    from ocr_service_ray.ops.dedup import _perm_params

    a, b = _perm_params(64)
    perm_rows = ", ".join(
        f"({p}, {int(a[p])}, {int(b[p])})" for p in range(64)
    )
    return f"""w AS (
              SELECT doc_id, regexp_extract_all(text, '\\S+') AS ws FROM {src}),
            g AS (
              SELECT doc_id,
                CASE WHEN length(ws) < 3 THEN [array_to_string(ws, ' ')]
                     ELSE list_distinct(list_transform(
                            generate_series(1, length(ws) - 2),
                            i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2]))
                END AS grams
              FROM w),
            gr AS (SELECT doc_id, unnest(grams) AS gram FROM g),
            gh AS (SELECT doc_id, {_hex_bigint_sql("md5(gram)", 1, 8)} AS x FROM gr),
            perms(p, a, b) AS (VALUES {perm_rows}),
            sigs AS (
              SELECT doc_id, p, min((a * x + b) % 2147483647) AS sig
              FROM gh, perms GROUP BY doc_id, p),
            bandkeys AS (
              SELECT doc_id, p // 4 AS band,
                     string_agg(CAST(sig AS VARCHAR), '|' ORDER BY p) AS band_key
              FROM sigs GROUP BY doc_id, p // 4),
            cand AS (
              SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
              FROM bandkeys a
              JOIN bandkeys c ON c.band = a.band AND c.band_key = a.band_key
                             AND a.doc_id < c.doc_id),
            est AS (
              SELECT cand.id_a, cand.id_b,
                     sum(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END) AS eq
              FROM cand
              JOIN sigs sa ON sa.doc_id = cand.id_a
              JOIN sigs sb ON sb.doc_id = cand.id_b AND sb.p = sa.p
              GROUP BY cand.id_a, cand.id_b)"""


def _pca_oracle_sql(dim: int = 64, iters: int = 3) -> str:
    """Power iteration unrolled: per round, t is the fixed-order
    (left-assoc) dot generated term by term — mirroring
    ops/pca.fixed_order_dot — contributions are micro-int floors
    summed as BIGINT, and v renormalizes by the Linf norm (one IEEE
    division per dim, no sqrt). Every float op is parenthesized
    exactly as numpy evaluates it, so v_micro hash-matches."""
    sums = ",\n              ".join(
        f"sum(CAST(floor(t * CAST(embedding[{j + 1}] AS DOUBLE)"
        f" * 1000000.0 + 0.5) AS BIGINT)) AS s{j}"
        for j in range(dim)
    )
    m_expr = "greatest(" + ", ".join(f"abs(s{j})" for j in range(dim)) + ")"
    parts = [
        "emb AS (SELECT embedding FROM embeddings)",
        "r1_t AS (SELECT embedding, CAST(embedding[1] AS DOUBLE) AS t FROM emb)",
    ]
    for k in range(1, iters + 1):
        parts.append(f"r{k}_s AS (SELECT {sums} FROM r{k}_t)")
        parts.append(f"r{k}_m AS (SELECT *, {m_expr} AS m FROM r{k}_s)")
        if k < iters:
            dot = " + ".join(
                f"(CAST(p.s{j} AS DOUBLE) / CAST(p.m AS DOUBLE))"
                f" * CAST(e.embedding[{j + 1}] AS DOUBLE)"
                for j in range(dim)
            )
            parts.append(
                f"r{k + 1}_t AS (SELECT e.embedding, ({dot}) AS t"
                f" FROM emb e, r{k}_m p)"
            )
    finals = "\n        UNION ALL ".join(
        f"SELECT CAST({j} AS BIGINT) AS dim,"
        f" CAST(floor(CAST(s{j} AS DOUBLE) / CAST(m AS DOUBLE)"
        f" * 1000000.0 + 0.5) AS BIGINT) AS v_micro FROM r{iters}_m"
        for j in range(dim)
    )
    return f"WITH {', '.join(parts)}\n        {finals}"


def _minhash_oracle_sql(threshold: float = 0.4) -> str:
    """est-Jaccard = eq/64 — an exact power-of-two division on both
    engines."""
    return f"""
            WITH {_minhash_cte_sql()}
            SELECT id_a, id_b, CAST(eq AS DOUBLE) / 64.0 AS est_jaccard
            FROM est WHERE CAST(eq AS DOUBLE) / 64.0 >= {threshold}
        """


def _bm25_oracle_sql(terms: list[str], k: int = 10) -> str:
    """BM25 mirrored operation-for-operation (ops/ranking.bm25_search):
    rational idf (no log), left-assoc term fold in ``terms`` order,
    every +,×,÷ parenthesized exactly as numpy evaluates it — IEEE
    ops are bit-identical across engines, so score_micro hash-matches."""
    tf_defs = ",\n                ".join(
        f"len(list_filter(ws, x -> x = '{t}')) AS tf{j}"
        for j, t in enumerate(terms)
    )
    df_defs = ", ".join(
        f"SUM(CASE WHEN tf{j} > 0 THEN 1 ELSE 0 END) AS df{j}"
        for j in range(len(terms))
    )
    norm = "(1.2 * ((1.0 - 0.75) + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))"
    contribs = " + ".join(
        f"(((CAST(n AS DOUBLE) - df{j} + 0.5) / (df{j} + 0.5))"
        f" * (CAST(tf{j} AS DOUBLE) * (1.2 + 1.0))"
        f" / (CAST(tf{j} AS DOUBLE) + {norm}))"
        for j in range(len(terms))
    )
    return f"""
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS ws,
                     length(string_split(text, ' ')) AS dl
              FROM documents),
            tf AS (
              SELECT doc_id, dl,
                {tf_defs}
              FROM w),
            st AS (
              SELECT COUNT(*) AS n,
                     CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl,
                     {df_defs}
              FROM tf),
            sc AS (
              SELECT t.doc_id, {contribs} AS score
              FROM tf t, st)
            SELECT doc_id,
                   CAST(floor(score * 1000000.0 + 0.5) AS BIGINT)
                     AS score_micro
            FROM sc ORDER BY score DESC, doc_id LIMIT {k}
        """


def _tfidf_oracle_sql(k: int = 3) -> str:
    """tf·idf top-k terms per doc, rational idf, tie → term ASC."""
    return f"""
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
            tok AS (SELECT doc_id, unnest(ws) AS term FROM w),
            cnt AS (
              SELECT doc_id, term, COUNT(*) AS tf
              FROM tok GROUP BY doc_id, term),
            dfx AS (
              SELECT term, COUNT(DISTINCT doc_id) AS df
              FROM tok GROUP BY term),
            nn AS (SELECT COUNT(*) AS n FROM documents),
            scored AS (
              SELECT c.doc_id, c.term, c.tf,
                     CAST(c.tf AS DOUBLE)
                       * ((CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5)) AS score
              FROM cnt c JOIN dfx d ON d.term = c.term, nn),
            ranked AS (
              SELECT *, ROW_NUMBER() OVER (
                PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rn
              FROM scored)
            SELECT doc_id, term, CAST(tf AS BIGINT) AS tf,
                   CAST(floor(score * 1000000.0 + 0.5) AS BIGINT)
                     AS score_micro
            FROM ranked WHERE rn <= {k}
        """


def _dedup_clusters_oracle_sql(threshold: float = 0.4) -> str:
    """Connected components of the minhash pair graph via a recursive
    CTE: reach(u, lbl) = every component member's label candidates;
    MIN per node = min doc_id of the component — exactly
    ops/graph.connected_components's fixpoint."""
    return f"""
            WITH RECURSIVE {_minhash_cte_sql()},
            p AS (
              SELECT id_a, id_b FROM est
              WHERE CAST(eq AS DOUBLE) / 64.0 >= {threshold}),
            e AS (
              SELECT id_a AS u, id_b AS v FROM p
              UNION
              SELECT id_b, id_a FROM p),
            reach(u, lbl) AS (
              SELECT u, u FROM (SELECT DISTINCT u FROM e)
              UNION
              SELECT e.u, r.lbl FROM e JOIN reach r ON r.u = e.v
            )
            SELECT u AS doc_id, CAST(MIN(lbl) AS BIGINT) AS cluster_id
            FROM reach GROUP BY u
        """


def _curate_oracle_sql() -> str:
    """The FULL curation pipeline replayed in one SQL statement,
    assembled from the already-verified per-stage fragments: Gopher
    repetition rules (row-local) → exact dedup keep-min → MinHash-LSH
    pairs + recursive-CTE components keep-canonical → n-gram
    decontamination (row-local, so order-independent vs dedup) →
    weighted-interleave mix keys. Train = doc_id % 20 != 0, eval =
    the % 20 == 0 slice (the decontam_pairs split)."""
    gram8 = _hex_bigint_sql(
        "md5(array_to_string(list_slice(ws, s, s + 7), ' '))", 1, 15
    )
    return f"""
            WITH RECURSIVE
            train AS (SELECT * FROM documents WHERE doc_id % 20 <> 0),
            -- stage 1: repetition quality rules (row-local)
            wcnt AS (
              SELECT doc_id, g, count(*) AS c
              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS g
                    FROM train)
              GROUP BY doc_id, g),
            wstat AS (
              SELECT doc_id, sum(c) AS nw, max(c) AS topw
              FROM wcnt GROUP BY doc_id),
            bcnt AS (
              SELECT doc_id, g, count(*) AS c
              FROM (SELECT doc_id,
                           unnest(list_transform(
                             generate_series(1, len(ws) - 1),
                             i -> ws[i] || ' ' || ws[i + 1])) AS g
                    FROM (SELECT doc_id, string_split(text, ' ') AS ws
                          FROM train))
              GROUP BY doc_id, g),
            bstat AS (
              SELECT doc_id, sum(c) AS nb, count(*) AS ndb
              FROM bcnt GROUP BY doc_id),
            kq AS (
              SELECT t.* FROM train t
              JOIN wstat USING (doc_id) LEFT JOIN bstat USING (doc_id)
              WHERE 10 * wstat.topw <= 3 * wstat.nw
                AND 10 * (coalesce(bstat.nb, 0) - coalesce(bstat.ndb, 0))
                    <= 2 * coalesce(bstat.nb, 0)),
            -- stage 2: exact dedup, keep the min doc_id per md5(text)
            keepers AS (
              SELECT md5(text) AS h, min(doc_id) AS keep_id
              FROM kq GROUP BY md5(text)),
            ke AS (
              SELECT kq.* FROM kq
              JOIN keepers ON md5(kq.text) = keepers.h
                          AND kq.doc_id = keepers.keep_id),
            -- stage 3: MinHash-LSH pairs over the survivors +
            -- connected components, keep the min-id canonical doc
            {_minhash_cte_sql("ke")},
            p AS (
              SELECT id_a, id_b FROM est
              WHERE CAST(eq AS DOUBLE) / 64.0 >= 0.4),
            e AS (
              SELECT id_a AS u, id_b AS v FROM p
              UNION
              SELECT id_b, id_a FROM p),
            reach(u, lbl) AS (
              SELECT u, u FROM (SELECT DISTINCT u FROM e)
              UNION
              SELECT e.u, r.lbl FROM e JOIN reach r ON r.u = e.v
            ),
            near_drop AS (
              SELECT u AS doc_id FROM reach GROUP BY u
              HAVING MIN(lbl) <> u),
            kn AS (
              SELECT * FROM ke
              WHERE doc_id NOT IN (SELECT doc_id FROM near_drop)),
            -- stage 4: decontamination (per-doc 8-gram overlap with
            -- the eval slice; row-local, so computable from raw text)
            wsx AS (
              SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
            pos AS (
              SELECT doc_id, ws,
                     unnest(generate_series(1, greatest(length(ws) - 7, 0))) AS s
              FROM wsx),
            g8 AS (
              SELECT DISTINCT doc_id, ({gram8}) AS gh FROM pos),
            contaminated AS (
              SELECT DISTINCT tr.doc_id
              FROM (SELECT doc_id, gh FROM g8 WHERE doc_id % 20 <> 0) tr
              JOIN (SELECT doc_id, gh FROM g8 WHERE doc_id % 20 = 0) ev
                USING (gh)),
            kd AS (
              SELECT * FROM kn
              WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
            -- stage 5: weighted interleave mix keys (src0..src3)
            r AS (
              SELECT doc_id, source,
                     CAST(row_number() OVER (PARTITION BY source
                                             ORDER BY doc_id) - 1 AS BIGINT)
                       AS "rank"
              FROM kd WHERE source IN ('src0', 'src1', 'src2', 'src3'))
            SELECT doc_id, source, "rank",
                   CAST((2 * "rank" + 1) *
                        CASE source WHEN 'src0' THEN 6 WHEN 'src1' THEN 10
                             WHEN 'src2' THEN 15 ELSE 30 END AS BIGINT)
                     AS mix_key
            FROM r
        """


def oracle_sql() -> dict[str, str]:
    from ocr_service_ray.ops.text import BPE_TOKEN_RE, PUNCT_RE, STOPWORD_RE, WS_TOKEN_RE

    oracles = {
        "flagship_extraction": _flagship_oracle_sql(),
        "correct_text_guards": """
            SELECT doc_id, text AS corrected_text, CAST(0 AS BIGINT) AS n_corrections
            FROM documents
        """,
        "token_counts": f"""
            SELECT doc_id,
              CAST(length(string_split(text, ' ')) AS BIGINT) AS n_tokens,
              CAST(length(regexp_extract_all(text, '{WS_TOKEN_RE}')) AS BIGINT) AS n_words,
              CAST(length(text) AS BIGINT) AS n_chars_utf,
              CAST(length(regexp_extract_all(text, '{PUNCT_RE}')) AS BIGINT) AS n_punct,
              CAST(length(regexp_extract_all(text, '{STOPWORD_RE}')) AS BIGINT) AS n_stop
            FROM documents
        """,
        "bpe_token_count": f"""
            SELECT doc_id,
              CAST(length(regexp_extract_all(text, '{BPE_TOKEN_RE}')) AS BIGINT) AS n_bpe_tokens
            FROM documents
        """,
        "lang_distribution": """
            SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY lang
        """,
        "top_sources": """
            SELECT source, CAST(count(*) AS BIGINT) AS n_docs
            FROM documents GROUP BY source
            ORDER BY n_docs DESC, source ASC LIMIT 10
        """,
        "exact_dedup": """
            SELECT md5(text) AS text_hash,
                   CAST(min(doc_id) AS BIGINT) AS keep_id,
                   CAST(count(*) AS BIGINT) AS dups
            FROM documents GROUP BY md5(text)
        """,
        "windowed_events": """
            SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window,
                   event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                     AS sum_value_cents
            FROM events GROUP BY 1, 2
        """,
        "sliding_window_events": """
            WITH exploded AS (
              SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S')
                       AS window_start,
                     event_type,
                     CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
              FROM events
              UNION ALL
              SELECT strftime(date_trunc('hour', ts) - INTERVAL 1 HOUR,
                              '%Y-%m-%d %H:%M:%S') AS window_start,
                     event_type,
                     CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
              FROM events)
            SELECT window_start, event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(cents) AS BIGINT) AS sum_value_cents
            FROM exploded GROUP BY window_start, event_type
        """,
        "promote_shape_events": """
            SELECT user_id, event_type,
                   CAST(count(*) AS BIGINT) AS occurrences,
                   CAST(floor(avg(value) * 1000000.0 + 0.5) AS BIGINT) AS avg_value_micro
            FROM events
            GROUP BY user_id, event_type
            HAVING count(*) >= 3 AND avg(value) >= 100.0
        """,
        "top_error_users": """
            SELECT user_id, CAST(count(*) AS BIGINT) AS n_errors
            FROM events WHERE event_type = 'error'
            GROUP BY user_id ORDER BY n_errors DESC, user_id ASC LIMIT 10
        """,
        "sessionize_users": """
            WITH flagged AS (
              SELECT user_id, ts,
                CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                          > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk
              FROM events),
            sess AS (
              SELECT user_id,
                sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id
              FROM flagged),
            per_sess AS (
              SELECT user_id, session_id, count(*) AS n
              FROM sess GROUP BY user_id, session_id)
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_sessions,
                   CAST(max(n) AS BIGINT) AS max_session_events,
                   CAST(sum(n) AS BIGINT) AS n_events
            FROM per_sess GROUP BY user_id
        """,
        "join_orders_customers": """
            SELECT c.c_mktsegment,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                     AS total_cents
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        """,
        "hash_join_orders_lineitem": """
            SELECT o.o_orderstatus, CAST(count(*) AS BIGINT) AS n_lineitems
            FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            GROUP BY o.o_orderstatus
        """,
        "lineitem_pricing": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
                   CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100.0 + 0.5)
                                 AS BIGINT)) AS BIGINT) AS revenue_cents,
                   CAST(sum(CAST(floor(l_discount * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
                     AS sum_disc_micro,
                   CAST(count(*) AS BIGINT) AS n_rows
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "sort_topk_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
        """,
        "knn_brute": """
            WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id = 0)
            SELECT e.vec_id,
                   CAST(floor(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv)
                              * 1000000.0 + 0.5) AS BIGINT) AS cos_sim_micro
            FROM embeddings e, q
            ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) DESC,
                     e.vec_id ASC
            LIMIT 5
        """,
        "embedding_norms": """
            SELECT vec_id,
                   CAST(floor(sqrt(list_aggregate(
                         list_transform(CAST(embedding AS DOUBLE[]), x -> x * x), 'sum'))
                       * 1000000.0 + 0.5) AS BIGINT) AS l2_norm_micro
            FROM embeddings
        """,
        "near_dup_sample": """
            WITH s AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings WHERE vec_id % 10 = 0)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   CAST(floor(list_cosine_similarity(a.v, b.v) * 1000000.0 + 0.5)
                        AS BIGINT) AS cos_sim_micro
            FROM s a JOIN s b ON a.label = b.label AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= 0.3
        """,
        "salted_event_totals": """
            SELECT event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                     AS total_cents
            FROM events GROUP BY event_type
        """,
        "ngram_jaccard": """
            WITH g AS (
              SELECT doc_id, doc_id // 2 AS pair_id,
                     list_distinct(list_transform(
                       generate_series(1, length(string_split(text, ' ')) - 2),
                       i -> string_split(text, ' ')[i] || ' ' ||
                            string_split(text, ' ')[i + 1] || ' ' ||
                            string_split(text, ' ')[i + 2])) AS grams
              FROM documents),
            pairs AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                     length(list_intersect(a.grams, b.grams)) AS inter,
                     length(a.grams) AS la, length(b.grams) AS lb
              FROM g a JOIN g b
                ON a.pair_id = b.pair_id AND a.doc_id < b.doc_id)
            SELECT id_a, id_b,
                   CAST(floor(inter / (la + lb - inter) * 1000000.0 + 0.5)
                        AS BIGINT) AS jaccard_micro
            FROM pairs
        """,
        "dup_ngram_stats": f"""
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS ws,
                     length(string_split(text, ' ')) AS nt
              FROM documents),
            pos AS (
              SELECT doc_id, ws,
                     unnest(generate_series(1, greatest(length(ws) - 4, 0))) AS s
              FROM w),
            grams AS (
              SELECT doc_id, s,
                     {_hex_bigint_sql("md5(array_to_string(list_slice(ws, s, s + 4), ' '))", 1, 15)} AS gh
              FROM pos),
            u AS (SELECT DISTINCT gh, doc_id FROM grams),
            hot AS (SELECT gh FROM u GROUP BY gh HAVING COUNT(*) >= 2),
            hg AS (SELECT doc_id, s FROM grams WHERE gh IN (SELECT gh FROM hot)),
            occ AS (SELECT doc_id, COUNT(*) AS hot_gram_occurrences
                    FROM hg GROUP BY doc_id),
            cov AS (SELECT doc_id, COUNT(DISTINCT t) AS dup_token_count
                    FROM (SELECT doc_id, unnest(generate_series(s, s + 4)) AS t
                          FROM hg)
                    GROUP BY doc_id)
            SELECT w.doc_id, CAST(w.nt AS BIGINT) AS n_tokens,
                   CAST(COALESCE(occ.hot_gram_occurrences, 0) AS BIGINT)
                     AS hot_gram_occurrences,
                   CAST(COALESCE(cov.dup_token_count, 0) AS BIGINT)
                     AS dup_token_count
            FROM w LEFT JOIN occ USING (doc_id) LEFT JOIN cov USING (doc_id)
        """,
        "sessionize_streaming": """
            WITH flagged AS (
              SELECT user_id, ts,
                CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                          > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk
              FROM events),
            sess AS (
              SELECT user_id, ts,
                sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS session_id
              FROM flagged)
            SELECT user_id,
                   CAST(epoch_us(min(ts)) AS BIGINT) AS start_us,
                   CAST(epoch_us(max(ts)) AS BIGINT) AS end_us,
                   CAST(count(*) AS BIGINT) AS n_events
            FROM sess GROUP BY user_id, session_id
        """,
        "unique_langs": """
            SELECT DISTINCT lang FROM documents
        """,
        "train_val_split": """
            WITH n AS (SELECT count(*) AS c FROM documents)
            SELECT 'train' AS split, CAST(floor(c * 0.8) AS BIGINT) AS n_rows FROM n
            UNION ALL
            SELECT 'val' AS split, CAST(c - floor(c * 0.8) AS BIGINT) AS n_rows FROM n
        """,
        "anti_join_orders": """
            SELECT o_orderstatus,
                   CAST(count(*) AS BIGINT) AS n_orders,
                   CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                     AS total_cents
            FROM orders
            WHERE o_custkey NOT IN
                  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
            GROUP BY o_orderstatus
        """,
        "spell_guard": """
            SELECT doc_id, text AS ml_corrected_text,
                   'fake-identity' AS corrector_backend
            FROM documents
        """,
        "ml_quality_combined": """
            WITH inputs AS (
              SELECT doc_id,
                     (doc_id * 2654435761 % 1000003) / 1000003.0 AS ml,
                     0.5 + (doc_id * 7919 % 500) / 1000.0 AS ocr,
                     CAST(doc_id % 5 AS DOUBLE) AS hw
              FROM documents),
            combined AS (
              SELECT doc_id,
                CASE WHEN abs(ml - ocr) > 0.3
                     THEN 0.8 * ocr + 0.2 * ml
                     ELSE 0.2 * ml + 0.6 * ocr
                          + 0.2 * greatest(0.0, least(1.0, 1.0 - 0.05 * hw))
                END AS raw
              FROM inputs)
            SELECT doc_id,
                   CAST(floor(greatest(0.0, least(1.0, raw)) * 1000000.0 + 0.5)
                        AS BIGINT) AS combined_micro
            FROM combined
        """,
        "lang_id": _lang_id_oracle_sql(),
        "quality_scores": f"""
            WITH t AS (
              SELECT doc_id,
                     length(regexp_extract_all(text, '{WS_TOKEN_RE}')) AS n_words,
                     length(text) AS n_chars,
                     length(regexp_extract_all(text, '{PUNCT_RE}')) AS n_punct,
                     length(regexp_extract_all(text, '{STOPWORD_RE}')) AS n_stop
              FROM documents)
            SELECT doc_id,
                   CAST(floor((
                     0.5 * least(CAST(n_words AS DOUBLE) / 100.0, 1.0)
                     + 0.25 * (1.0 - least(
                         CAST(n_punct AS DOUBLE) / greatest(n_chars, 1) * 10.0, 1.0))
                     + 0.25 * (CAST(n_stop AS DOUBLE) / greatest(n_words, 1))
                   ) * 1000000.0 + 0.5) AS BIGINT) AS quality_micro
            FROM t
        """,
        "fingerprint": _fingerprint_oracle_sql(),
        "classify_docs": f"""
            WITH h AS (
              SELECT doc_id,
                     md5('classifier:' || CAST(doc_id AS VARCHAR)) AS hx1,
                     md5('classifier-conf:' || CAST(doc_id AS VARCHAR)) AS hx2
              FROM documents),
            u AS (
              SELECT doc_id,
                     {_md5_unit_sql('hx1')} AS u1,
                     {_md5_unit_sql('hx2')} AS u2
              FROM h)
            SELECT doc_id,
                   CASE WHEN 0.5 + u2 / 2.0 > 0.7 THEN
                     CASE CAST(floor(u1 * 4.0) AS INT) % 4
                       WHEN 0 THEN 'certificate'
                       WHEN 1 THEN 'invoice'
                       WHEN 2 THEN 'letter'
                       ELSE 'form' END
                   ELSE '' END AS document_type
            FROM u
        """,
        "feedback_promote": _feedback_promote_oracle_sql(),
        "next_epoch": _next_epoch_oracle_sql(),
        "html_main_content": """
            SELECT doc_id, text AS main_text FROM documents
        """,
        "simple_spell": """
            WITH t AS (
              SELECT doc_id, text,
                regexp_split_to_array('SG1 l0G ' || text,
                                      '\\b[ОIЗБВSGl0-9]+\\b') AS parts,
                regexp_extract_all('SG1 l0G ' || text,
                                   '\\b[ОIЗБВSGl0-9]+\\b') AS toks
              FROM documents)
            SELECT doc_id,
              array_to_string(
                list_transform(generate_series(1, length(parts)),
                  i -> parts[i] || coalesce(
                         translate(toks[i], 'ОIЗБВSGl', '01368561'), '')),
                '') AS spelled
            FROM t
        """,
        "hash_sample_docs": f"""
            WITH h AS (
              SELECT doc_id, n_chars,
                     md5('sample:' || CAST(doc_id AS VARCHAR)) AS hx
              FROM documents)
            SELECT doc_id, n_chars FROM h
            WHERE {_md5_unit_sql('hx')} < 0.2
        """,
        "stratified_split_counts": f"""
            WITH h AS (
              SELECT doc_id, lang,
                     md5('split:' || CAST(doc_id AS VARCHAR)) AS hx
              FROM documents)
            SELECT lang,
                   CASE WHEN {_md5_unit_sql('hx')} < 0.8 THEN 'train' ELSE 'val' END
                     AS split,
                   CAST(count(*) AS BIGINT) AS n_docs
            FROM h GROUP BY 1, 2
        """,
        "windowed_streaming": """
            SELECT CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) AS window_us,
                   event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                     AS sum_value_cents
            FROM events GROUP BY 1, 2
        """,
        "json_props_stats": """
            SELECT event_type,
                   CAST(count(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
                     AS n_with_k,
                   CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
                     AS sum_k
            FROM events GROUP BY event_type
        """,
        "consensus_suggestions": f"""
            SELECT 'пр0верка' AS from_, 'проверка' AS "to",
                   0.7 AS confidence,
                   CAST({_gen_planted_total_sql()} AS BIGINT) AS occurrences
        """,
        "corpus_summary": f"""
            SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS documents,
                   CAST({_gen_planted_total_sql()} AS BIGINT) AS total_corrections,
                   CAST((SELECT count(*)
                           + sum(CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END)
                           + sum(CASE WHEN doc_id % 7 = 0 THEN 1 ELSE 0 END)
                         FROM documents) AS BIGINT) AS total_pages
        """,
        "minhash_dedup": _minhash_oracle_sql(threshold=0.4),
        "dedup_clusters": _dedup_clusters_oracle_sql(threshold=0.4),
        "tfidf_topk": _tfidf_oracle_sql(k=3),
        "tfidf_topk_shuffle": _tfidf_oracle_sql(k=3),
        "bm25_docs": _bm25_oracle_sql(["join", "hash", "vector"], k=10),
        "snapshot_diff": """
            WITH newt AS (
              SELECT doc_id,
                     CASE WHEN doc_id % 10 = 0 THEN text || ' v2'
                          ELSE text END AS text
              FROM documents WHERE doc_id % 17 <> 0
              UNION ALL
              SELECT doc_id + 10000000, text
              FROM documents WHERE doc_id % 23 = 0)
            SELECT d.doc_id, 'removed' AS status
            FROM documents d
            WHERE d.doc_id NOT IN (SELECT doc_id FROM newt)
            UNION ALL
            SELECT n.doc_id, 'added'
            FROM newt n
            WHERE n.doc_id NOT IN (SELECT doc_id FROM documents)
            UNION ALL
            SELECT d.doc_id, 'changed'
            FROM documents d JOIN newt n USING (doc_id)
            WHERE d.text <> n.text
        """,
        "weighted_sample_events": """
            WITH c AS (
              SELECT event_id,
                     greatest(CAST(floor(value * 100.0 + 0.5) AS BIGINT), 0)
                       AS cents
              FROM events),
            o AS (
              SELECT event_id, cents,
                     COALESCE(SUM(cents) OVER (
                       ORDER BY event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS off
              FROM c)
            SELECT event_id, cents
            FROM o
            WHERE (off + cents - 1 + 200000) // 200000
                  <> (off - 1 + 200000) // 200000
        """,
        "mode_priority": """
            WITH c AS (
              SELECT o_orderstatus, o_orderpriority, COUNT(*) AS cnt
              FROM orders GROUP BY o_orderstatus, o_orderpriority),
            r AS (
              SELECT *, ROW_NUMBER() OVER (
                PARTITION BY o_orderstatus
                ORDER BY cnt DESC, o_orderpriority) AS rn
              FROM c)
            SELECT o_orderstatus, o_orderpriority AS mode,
                   CAST(cnt AS BIGINT) AS mode_count
            FROM r WHERE rn = 1
        """,
        "profile_orders": """
            SELECT 'o_orderkey' AS "column",
                   CAST(COUNT(*) AS BIGINT) AS n_rows,
                   CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_null,
                   CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
                   CAST(MIN(o_orderkey) AS VARCHAR) AS "min",
                   CAST(MAX(o_orderkey) AS VARCHAR) AS "max"
            FROM orders
            UNION ALL
            SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
                   CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
                   CAST(MIN(o_custkey) AS VARCHAR),
                   CAST(MAX(o_custkey) AS VARCHAR)
            FROM orders
            UNION ALL
            SELECT 'o_orderstatus', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(o_orderstatus) AS BIGINT),
                   CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT),
                   CAST(MIN(o_orderstatus) AS VARCHAR),
                   CAST(MAX(o_orderstatus) AS VARCHAR)
            FROM orders
            UNION ALL
            SELECT 'o_orderpriority', CAST(COUNT(*) AS BIGINT),
                   CAST(COUNT(*) - COUNT(o_orderpriority) AS BIGINT),
                   CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT),
                   CAST(MIN(o_orderpriority) AS VARCHAR),
                   CAST(MAX(o_orderpriority) AS VARCHAR)
            FROM orders
        """,
        "quantiles_cont_quantity": """
            SELECT CAST(25 AS BIGINT) AS q_pct,
                   CAST(floor(quantile_cont(l_quantity, 0.25) * 1000000.0 + 0.5)
                     AS BIGINT) AS value_micro FROM lineitem
            UNION ALL SELECT 50,
                   CAST(floor(quantile_cont(l_quantity, 0.5) * 1000000.0 + 0.5)
                     AS BIGINT) FROM lineitem
            UNION ALL SELECT 75,
                   CAST(floor(quantile_cont(l_quantity, 0.75) * 1000000.0 + 0.5)
                     AS BIGINT) FROM lineitem
            UNION ALL SELECT 90,
                   CAST(floor(quantile_cont(l_quantity, 0.9) * 1000000.0 + 0.5)
                     AS BIGINT) FROM lineitem
            UNION ALL SELECT 99,
                   CAST(floor(quantile_cont(l_quantity, 0.99) * 1000000.0 + 0.5)
                     AS BIGINT) FROM lineitem
        """,
        "outlier_events": """
            WITH c AS (
              SELECT event_id, event_type,
                     CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
              FROM events),
            st AS (
              SELECT event_type, COUNT(*) AS n, SUM(cents) AS s,
                     SUM(cents * cents) AS ss
              FROM c GROUP BY event_type)
            SELECT event_id, c.event_type, cents
            FROM c JOIN st USING (event_type)
            WHERE (CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / n)
                  * (CAST(cents AS DOUBLE) - CAST(s AS DOUBLE) / n)
                  > 9.0 * (CAST(ss AS DOUBLE) / n
                           - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n))
        """,
        "bigram_top": """
            WITH w AS (
              SELECT string_split(text, ' ') AS ws FROM documents),
            bg AS (
              SELECT ws[s] AS w1, ws[s + 1] AS w2
              FROM (SELECT ws,
                      unnest(generate_series(1, greatest(length(ws) - 1, 0)))
                        AS s
                    FROM w)),
            c AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n
                  FROM bg GROUP BY w1, w2)
            SELECT w1, w2, n FROM c
            ORDER BY n DESC, w1, w2 LIMIT 20
        """,
        "user_event_sequences": """
            SELECT user_id,
                   string_agg(event_type, ',' ORDER BY ts, event_id) AS seq,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM events GROUP BY user_id
        """,
        "pack_sequences": """
            WITH d AS (
              SELECT doc_id,
                     length(string_split(text, ' ')) AS n_tokens
              FROM documents),
            o AS (
              SELECT doc_id, n_tokens,
                     COALESCE(SUM(n_tokens) OVER (
                       ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                     ), 0) AS start_offset
              FROM d)
            SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
                   CAST(start_offset AS BIGINT) AS start_offset,
                   CAST(start_offset // 2048 AS BIGINT) AS first_seq,
                   CAST((start_offset + n_tokens - 1) // 2048 AS BIGINT)
                     AS last_seq
            FROM o
        """,
        "inverted_search": """
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
            SELECT doc_id FROM w
            WHERE len(list_filter(ws, x -> x = 'join')) > 0
              AND len(list_filter(ws, x -> x = 'hash')) > 0
              AND len(list_filter(ws, x -> x = 'vector')) > 0
        """,
        "distinct_users_per_type": """
            SELECT event_type,
                   CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
            FROM events GROUP BY event_type
        """,
        "label_centroid_sums": """
            WITH e AS (
              SELECT CAST(label AS BIGINT) AS label,
                     unnest(embedding) AS v,
                     unnest(generate_series(0, len(embedding) - 1)) AS dim
              FROM embeddings)
            SELECT label, CAST(dim AS BIGINT) AS dim,
                   CAST(SUM(CAST(floor(CAST(v AS DOUBLE) * 1000000.0 + 0.5)
                        AS BIGINT)) AS BIGINT) AS vsum,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM e GROUP BY label, dim
        """,
        "event_value_quantiles": """
            WITH c AS (
              SELECT event_type,
                     CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
              FROM events)
            SELECT event_type, CAST(50 AS BIGINT) AS q_pct,
                   CAST(quantile_disc(cents, 0.5) AS BIGINT) AS value
            FROM c GROUP BY event_type
            UNION ALL
            SELECT event_type, CAST(90 AS BIGINT),
                   CAST(quantile_disc(cents, 0.9) AS BIGINT)
            FROM c GROUP BY event_type
            UNION ALL
            SELECT event_type, CAST(99 AS BIGINT),
                   CAST(quantile_disc(cents, 0.99) AS BIGINT)
            FROM c GROUP BY event_type
        """,
        "grouped_topk_events": """
            WITH r AS (
              SELECT event_type, event_id, value,
                     ROW_NUMBER() OVER (
                       PARTITION BY event_type
                       ORDER BY value DESC, event_id) AS rn
              FROM events)
            SELECT event_type, event_id,
                   CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS value_micro
            FROM r WHERE rn <= 3
        """,
        "running_user_value": """
            WITH c AS (
              SELECT user_id, event_id, ts,
                     CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
              FROM events)
            SELECT user_id, event_id,
                   CAST(SUM(cents) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_cents
            FROM c
        """,
        "decontam_pairs": f"""
            WITH w AS (
              SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
            pos AS (
              SELECT doc_id, ws,
                     unnest(generate_series(1, greatest(length(ws) - 7, 0))) AS s
              FROM w),
            g AS (
              SELECT DISTINCT doc_id,
                     {_hex_bigint_sql("md5(array_to_string(list_slice(ws, s, s + 7), ' '))", 1, 15)} AS gh
              FROM pos),
            tr AS (SELECT doc_id, gh FROM g WHERE doc_id % 20 <> 0),
            ev AS (SELECT doc_id, gh FROM g WHERE doc_id % 20 = 0)
            SELECT tr.doc_id AS train_id, ev.doc_id AS eval_id,
                   CAST(COUNT(*) AS BIGINT) AS shared_grams
            FROM tr JOIN ev USING (gh)
            GROUP BY tr.doc_id, ev.doc_id
        """,
        # HLL p=10: 32-bit md5-prefix hash, bucket = top 10 bits,
        # rho = 22-bit remainder leading zeros + 1 = 23 - bit_length
        # (length(bin(w)) — exact integer math, mirrors np.frexp)
        "hll_users": f"""
            WITH h AS (
              SELECT {_hex_bigint_sql("md5(CAST(user_id AS VARCHAR))", 1, 8)} AS x
              FROM events WHERE user_id IS NOT NULL),
            b AS (SELECT x // 4194304 AS bucket, x % 4194304 AS w FROM h)
            SELECT CAST(bucket AS BIGINT) AS bucket,
                   CAST(MAX(CASE WHEN w = 0 THEN 23
                                 ELSE 23 - length(bin(w)) END) AS BIGINT)
                     AS max_rho
            FROM b GROUP BY bucket
        """,
        "simhash_dedup": _simhash_oracle_sql(max_hamming=8),
        "lsh_knn": _lsh_knn_oracle_sql(nbits=4, radius=1, seed=13, dim=64, k=5),
        "asof_purchase_click": """
            WITH p AS (SELECT event_id, user_id, ts FROM events
                       WHERE event_type = 'purchase'),
            c AS (SELECT user_id, ts, CAST(epoch_us(ts) AS BIGINT) AS click_us
                  FROM events WHERE event_type = 'click')
            SELECT p.event_id, p.user_id,
                   CAST(epoch_us(p.ts) AS BIGINT) AS purchase_us,
                   c.click_us
            FROM p ASOF JOIN c
              ON p.user_id = c.user_id AND p.ts >= c.ts
        """,
        "range_join_values": """
            WITH r(bucket, lo, hi) AS (VALUES
              ('low', 0.0, 5.0), ('mid', 5.0, 20.0),
              ('high', 20.0, 100.0), ('whale', 100.0, 1e12))
            SELECT r.bucket, e.event_type,
                   CAST(count(*) AS BIGINT) AS n_events,
                   CAST(sum(CAST(floor(e.value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                     AS total_cents
            FROM events e JOIN r ON e.value >= r.lo AND e.value < r.hi
            GROUP BY r.bucket, e.event_type
        """,
        "near_dup_lsh_blocked": f"""
            WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                       FROM embeddings WHERE vec_id % 5 = 0),
            cells AS (SELECT vec_id, v, {_lsh_cell_terms_sql("v")} AS cell FROM s)
            SELECT a.vec_id AS id_a, b.vec_id AS id_b,
                   CAST(floor(list_cosine_similarity(a.v, b.v) * 1000000.0 + 0.5)
                        AS BIGINT) AS cos_sim_micro
            FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
            WHERE list_cosine_similarity(a.v, b.v) >= 0.2
        """,
        "render_text": _render_text_oracle_sql(),
        "render_json": _render_json_oracle_sql(),
        "multimodal_decode": """
            WITH base AS (
              SELECT doc_id, repeat(text, 8) AS p FROM documents),
            feats AS (
              SELECT doc_id, p, length(p) AS n,
                     unicode(substring(p, 1, 1)) + unicode(substring(p, 2, 1))
                       + unicode(substring(p, 3, 1)) + unicode(substring(p, 4, 1))
                       + 1 AS w,
                     list_aggregate(list_transform(
                       regexp_extract_all(p, '(?s).'), c -> unicode(c)), 'sum') AS total
              FROM base)
            SELECT 'item-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS item_id,
                   CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                        ELSE 'video' END AS media_type,
                   CAST(16 + doc_id % 1009 AS INT) AS width,
                   CAST(16 + doc_id % 997 AS INT) AS height,
                   CAST(w AS INT) AS dec_width,
                   CAST(greatest(n // greatest(w, 1), 1) AS INT) AS dec_height,
                   CAST(floor(CAST(total AS DOUBLE) / n * 1000000.0 + 0.5) AS BIGINT)
                     AS pixel_mean_micro,
                   md5(p) AS content_digest
            FROM feats
        """,
        "multimodal_routed": """
            WITH base AS (
              SELECT doc_id, length(text) * 8 AS n FROM documents),
            counts AS (
              SELECT doc_id,
                     CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                          ELSE 'video' END AS feature,
                     CASE doc_id % 3
                       WHEN 0 THEN 1
                       WHEN 1 THEN greatest(n // 1024, 1)
                       ELSE (greatest(n // 256, 1) + 9) // 10 END AS n_rows
              FROM base)
            SELECT 'item-' || lpad(CAST(doc_id AS VARCHAR), 8, '0') AS item_id,
                   feature
            FROM (SELECT doc_id, feature, unnest(generate_series(1, n_rows))
                  FROM counts)
        """,
        # ivf_knn: nprobe=6/8 reaches recall 1 on this corpus family,
        # so the restricted search equals the global brute top-k.
        "ivf_knn": """
            WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id = 0)
            SELECT e.vec_id,
                   CAST(floor(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv)
                              * 1000000.0 + 0.5) AS BIGINT) AS cos_sim_micro
            FROM embeddings e, q
            ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv) DESC,
                     e.vec_id ASC
            LIMIT 5
        """,
        # Gopher-style repetition rules: unigram stats from the
        # word-count CTE, bigram stats from adjacent-pair grams built
        # with list_transform; flags are the integer cross-multiplied
        # thresholds from ops/quality_rules.py (10·top ≤ 3·n etc.).
        "repetition_rules": """
            WITH wc AS (
              SELECT doc_id, g, count(*) AS c
              FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS g
                    FROM documents)
              GROUP BY doc_id, g),
            wstat AS (
              SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
                     CAST(count(*) AS BIGINT) AS n_distinct_words,
                     CAST(max(c) AS BIGINT) AS top_word_count
              FROM wc GROUP BY doc_id),
            bc AS (
              SELECT doc_id, g, count(*) AS c
              FROM (SELECT doc_id,
                           unnest(list_transform(
                             generate_series(1, len(ws) - 1),
                             i -> ws[i] || ' ' || ws[i + 1])) AS g
                    FROM (SELECT doc_id, string_split(text, ' ') AS ws
                          FROM documents))
              GROUP BY doc_id, g),
            bstat AS (
              SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
                     CAST(count(*) AS BIGINT) AS n_distinct_bigrams
              FROM bc GROUP BY doc_id)
            SELECT w.doc_id, w.n_words, w.n_distinct_words, w.top_word_count,
                   coalesce(b.n_bigrams, 0) AS n_bigrams,
                   coalesce(b.n_distinct_bigrams, 0) AS n_distinct_bigrams,
                   CAST(CASE WHEN 10 * w.top_word_count <= 3 * w.n_words
                        THEN 1 ELSE 0 END AS BIGINT) AS keep_top_word,
                   CAST(CASE WHEN 10 * (coalesce(b.n_bigrams, 0)
                                        - coalesce(b.n_distinct_bigrams, 0))
                             <= 2 * coalesce(b.n_bigrams, 0)
                        THEN 1 ELSE 0 END AS BIGINT) AS keep_dup_bigram
            FROM wstat w LEFT JOIN bstat b USING (doc_id)
        """,
        # Redaction rules replayed in the SAME order the kernel
        # applies them: counts are against the text as each rule sees
        # it (rule 2 counts digits REMAINING after rule 1 replaced
        # multi-digit runs).
        "redact_props": """
            WITH s1 AS (
              SELECT event_id,
                     CAST(len(regexp_extract_all(props, '[0-9]{2,}')) AS BIGINT)
                       AS n_num,
                     regexp_replace(props, '[0-9]{2,}', '<NUM>', 'g') AS p1
              FROM events)
            SELECT event_id,
                   regexp_replace(p1, '[0-9]', '#', 'g') AS props,
                   n_num,
                   CAST(len(regexp_extract_all(p1, '[0-9]')) AS BIGINT) AS n_digit
            FROM s1
        """,
        # Percentile banding: strict-less CDF via a window sum over
        # the value counts, bucket = min(n_less·NB // n, NB-1) —
        # identical integer arithmetic to ops/sketch.percentile_buckets.
        "length_deciles": """
            WITH vc AS (
              SELECT n_chars AS v, count(*) AS c FROM documents GROUP BY 1),
            cdf AS (
              SELECT v, CAST(sum(c) OVER (ORDER BY v) - c AS BIGINT) AS lt
              FROM vc),
            tot AS (SELECT count(*) AS n FROM documents)
            SELECT d.doc_id, d.n_chars, cdf.lt AS n_less,
                   CAST(least(cdf.lt * 10 // tot.n, 9) AS BIGINT) AS bucket
            FROM documents d JOIN cdf ON d.n_chars = cdf.v CROSS JOIN tot
        """,
        # Scalar quantization replayed in float64: unnest +
        # generate_subscripts zip positionally (dim is 1-based on both
        # sides); min/max/±/×/÷/floor are IEEE-exact cross-engine.
        "quantized_embeddings": """
            WITH e AS (
              SELECT vec_id,
                     CAST(unnest(embedding) AS DOUBLE) AS v,
                     generate_subscripts(embedding, 1) AS dim
              FROM embeddings),
            st AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM e GROUP BY dim)
            SELECT e.vec_id, CAST(e.dim AS BIGINT) AS dim,
                   CAST(CASE WHEN st.mx > st.mn
                        THEN least(floor((e.v - st.mn) * 255.0 / (st.mx - st.mn)),
                                   255.0)
                        ELSE 0 END AS BIGINT) AS q
            FROM e JOIN st USING (dim)
        """,
        # Stride schedule: rank r of a weight-w source lands at
        # (2r+1)·(lcm/w); lcm(5,3,2,1)=30 → strides 6/10/15/30.
        "mix_schedule": """
            WITH r AS (
              SELECT doc_id, source,
                     CAST(row_number() OVER (PARTITION BY source
                                             ORDER BY doc_id) - 1 AS BIGINT)
                       AS "rank"
              FROM documents
              WHERE source IN ('src0', 'src1', 'src2', 'src3'))
            SELECT doc_id, source, "rank",
                   CAST((2 * "rank" + 1) *
                        CASE source WHEN 'src0' THEN 6 WHEN 'src1' THEN 10
                             WHEN 'src2' THEN 15 ELSE 30 END AS BIGINT)
                     AS mix_key
            FROM r
        """,
        # Global dense rank: the Ray side is a distributed sort + a
        # two-phase block-offset scan; SQL is one window row_number.
        "global_ranks": """
            SELECT doc_id, n_chars,
                   CAST(row_number() OVER (ORDER BY n_chars, doc_id) - 1
                        AS BIGINT) AS "rank"
            FROM documents
        """,
        # Heavy hitters: the sketch discovers candidates, the verify
        # pass makes their counts exact, so the oracle is the plain
        # exact top-k (ties → lexicographically smaller token).
        "heavy_tokens": """
            SELECT g AS value, CAST(count(*) AS BIGINT) AS n
            FROM (SELECT unnest(string_split(text, ' ')) AS g FROM documents)
            GROUP BY g
            ORDER BY n DESC, value ASC
            LIMIT 20
        """,
    }
    # The bloom tier is value-identical to the shuffle strategy by
    # construction (the prefilter only shrinks the exchange; false
    # positives die in the exact join) — same oracle.
    oracles["decontam_pairs_bloom"] = oracles["decontam_pairs"]
    oracles["curate_corpus"] = _curate_oracle_sql()
    oracles["event_interarrival"] = """
        SELECT event_id, user_id,
               CAST(coalesce(epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id), -1) AS BIGINT)
                 AS delta_us
        FROM events
    """
    oracles["moving_sum_user_value"] = """
        SELECT event_id, user_id,
               CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS win3_cents
        FROM events
    """
    oracles["rollup_order_totals"] = """
        SELECT o_orderpriority, o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS sum_price_cents,
               CAST(grouping(o_orderpriority, o_orderstatus) AS BIGINT)
                 AS grouping_id
        FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
    """
    oracles["pivot_user_events"] = """
        SELECT user_id,
               CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click_cnt,
               CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error_cnt,
               CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase_cnt,
               CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup_cnt,
               CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view_cnt
        FROM events GROUP BY user_id
    """
    oracles["paragraph_dedup"] = """
        WITH base AS (
          SELECT doc_id, replace(text, ' table ', chr(10)) AS t FROM documents),
        lists AS (SELECT doc_id, string_split(t, chr(10)) AS l FROM base),
        paras AS (
          SELECT doc_id, unnest(l) AS para,
                 unnest(list_transform(l, (x, i) -> i)) - 1 AS pos
          FROM lists),
        winners AS (
          SELECT doc_id, pos, para,
                 row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
          FROM paras)
        SELECT doc_id, string_agg(para, chr(10) ORDER BY pos) AS text,
               CAST(count(*) AS BIGINT) AS n_kept
        FROM winners WHERE rn = 1 GROUP BY doc_id
    """
    oracles["per_source_cap"] = """
        SELECT doc_id, source FROM documents
        QUALIFY row_number() OVER (PARTITION BY source ORDER BY doc_id) <= 50
    """
    oracles["range_sum_user_value"] = """
        SELECT event_id, user_id,
               CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) OVER (
                   PARTITION BY user_id ORDER BY ts
                   RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS hour_cents
        FROM events
    """
    oracles["contamination_ratio"] = f"""
        WITH w AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        pos AS (
          SELECT doc_id, ws,
                 unnest(generate_series(1, greatest(length(ws) - 7, 0))) AS s
          FROM w),
        g AS (
          SELECT DISTINCT doc_id,
                 {_hex_bigint_sql("md5(array_to_string(list_slice(ws, s, s + 7), ' '))", 1, 15)} AS gh
          FROM pos),
        tr AS (SELECT doc_id, gh FROM g WHERE doc_id % 20 <> 0),
        ev AS (SELECT DISTINCT gh FROM g WHERE doc_id % 20 = 0),
        st AS (
          SELECT doc_id, count(*) AS n_grams,
                 count(*) FILTER (WHERE gh IN (SELECT gh FROM ev)) AS n_shared
          FROM tr GROUP BY doc_id)
        SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
               CAST(n_shared AS BIGINT) AS n_shared,
               CAST((2000000 * n_shared + n_grams) // (2 * n_grams) AS BIGINT)
                 AS ratio_micro
        FROM st
    """
    oracles["temperature_mix"] = """
        WITH n AS (
          SELECT source, count(*) AS n_docs FROM documents GROUP BY source),
        t AS (
          SELECT source, n_docs,
                 CAST(floor(sqrt(n_docs)) AS BIGINT) AS target
          FROM n),
        r AS (
          SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
          FROM documents)
        SELECT r.doc_id, r.source
        FROM r JOIN t USING (source)
        WHERE (rn * target) // n_docs > ((rn - 1) * target) // n_docs
    """
    oracles["nations_intersect"] = """
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """
    oracles["nations_except"] = """
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT
        SELECT s_nationkey AS nationkey FROM supplier WHERE s_suppkey <= 10
    """
    oracles["nations_union"] = """
        SELECT c_nationkey AS nationkey FROM customer
        UNION
        SELECT s_nationkey AS nationkey FROM supplier
    """
    oracles["dense_rank_user_value"] = """
        SELECT event_id, user_id,
               CAST(dense_rank() OVER (
                   PARTITION BY user_id
                   ORDER BY CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                 AS BIGINT) AS dense_rank
        FROM events
    """
    # best train match per eval doc: the decontam_pairs gram CTE +
    # a per-eval argmax window
    oracles["decontam_best_match"] = f"""
        WITH w AS (
          SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        pos AS (
          SELECT doc_id, ws,
                 unnest(generate_series(1, greatest(length(ws) - 7, 0))) AS s
          FROM w),
        g AS (
          SELECT DISTINCT doc_id,
                 {_hex_bigint_sql("md5(array_to_string(list_slice(ws, s, s + 7), ' '))", 1, 15)} AS gh
          FROM pos),
        tr AS (SELECT doc_id, gh FROM g WHERE doc_id % 20 <> 0),
        ev AS (SELECT doc_id, gh FROM g WHERE doc_id % 20 = 0),
        pairs AS (
          SELECT tr.doc_id AS train_id, ev.doc_id AS eval_id,
                 CAST(COUNT(*) AS BIGINT) AS shared_grams
          FROM tr JOIN ev USING (gh)
          GROUP BY tr.doc_id, ev.doc_id)
        SELECT eval_id, train_id, shared_grams FROM pairs
        QUALIFY row_number() OVER (
          PARTITION BY eval_id ORDER BY shared_grams DESC, train_id) = 1
    """
    # prune pipeline: paragraph-dedup fragment → per-source cap →
    # temperature ticks, chained as one statement
    oracles["prune_corpus"] = """
        WITH base AS (
          SELECT doc_id, source, replace(text, ' table ', chr(10)) AS t
          FROM documents),
        lists AS (
          SELECT doc_id, source, string_split(t, chr(10)) AS l FROM base),
        paras AS (
          SELECT doc_id, source, unnest(l) AS para,
                 unnest(list_transform(l, (x, i) -> i)) - 1 AS pos
          FROM lists),
        winners AS (
          SELECT doc_id, source, pos, para,
                 row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
          FROM paras),
        pd AS (
          SELECT doc_id, source, CAST(count(*) AS BIGINT) AS n_kept
          FROM winners WHERE rn = 1 GROUP BY doc_id, source),
        capped AS (
          SELECT * FROM pd
          QUALIFY row_number() OVER (PARTITION BY source ORDER BY doc_id) <= 50),
        n AS (SELECT source, count(*) AS n_docs FROM capped GROUP BY source),
        t AS (
          SELECT source, n_docs, CAST(floor(sqrt(n_docs)) AS BIGINT) AS target
          FROM n),
        r AS (
          SELECT doc_id, source, n_kept,
                 row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
          FROM capped)
        SELECT r.doc_id, r.source, r.n_kept
        FROM r JOIN t USING (source)
        WHERE (rn * target) // n_docs > ((rn - 1) * target) // n_docs
    """
    oracles["funnel_cohorts"] = """
        WITH f AS (
          SELECT user_id, strftime(min(ts), '%Y-%m') AS cohort
          FROM events GROUP BY user_id),
        s1 AS (SELECT user_id, min(ts) AS t FROM events
               WHERE event_type = 'view' GROUP BY user_id),
        s2 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
               JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
               WHERE e.event_type = 'click' GROUP BY e.user_id),
        s3 AS (SELECT e.user_id, min(e.ts) AS t FROM events e
               JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
               WHERE e.event_type = 'purchase' GROUP BY e.user_id),
        stg(stage_idx, stage) AS (
          VALUES (1, 'view'), (2, 'click'), (3, 'purchase')),
        grid AS (
          SELECT DISTINCT f.cohort, stg.stage_idx, stg.stage
          FROM f CROSS JOIN stg),
        cnt AS (
          SELECT cohort, 1 AS stage_idx, count(*) AS n
          FROM s1 JOIN f USING (user_id) GROUP BY cohort
          UNION ALL
          SELECT cohort, 2, count(*) FROM s2 JOIN f USING (user_id)
          GROUP BY cohort
          UNION ALL
          SELECT cohort, 3, count(*) FROM s3 JOIN f USING (user_id)
          GROUP BY cohort)
        SELECT g.cohort, CAST(g.stage_idx AS BIGINT) AS stage_idx, g.stage,
               CAST(coalesce(cnt.n, 0) AS BIGINT) AS n_users
        FROM grid g LEFT JOIN cnt
          ON g.cohort = cnt.cohort AND g.stage_idx = cnt.stage_idx
    """
    oracles["funnel_stages"] = """
        WITH s1 AS (
          SELECT user_id, min(ts) AS t FROM events
          WHERE event_type = 'view' GROUP BY user_id),
        s2 AS (
          SELECT e.user_id, min(e.ts) AS t FROM events e
          JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t
          WHERE e.event_type = 'click' GROUP BY e.user_id),
        s3 AS (
          SELECT e.user_id, min(e.ts) AS t FROM events e
          JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t
          WHERE e.event_type = 'purchase' GROUP BY e.user_id)
        SELECT CAST(1 AS BIGINT) AS stage_idx, 'view' AS stage,
               (SELECT CAST(count(*) AS BIGINT) FROM s1) AS n_users
        UNION ALL
        SELECT CAST(2 AS BIGINT), 'click',
               (SELECT CAST(count(*) AS BIGINT) FROM s2)
        UNION ALL
        SELECT CAST(3 AS BIGINT), 'purchase',
               (SELECT CAST(count(*) AS BIGINT) FROM s3)
    """
    def _zorder_sql(cols: list[str], bits: int) -> str:
        # mirror of ops/scan.zorder_key: bit i of (col % 2^bits) lands
        # at output position i*len(cols)+j — pure integer terms
        m = 1 << bits
        terms = []
        for j, c in enumerate(cols):
            for i in range(bits):
                terms.append(
                    f"((({c} % {m}) // {1 << i}) % 2) * {1 << (i * len(cols) + j)}"
                )
        return " + ".join(terms)

    # integer PageRank: 3 unrolled rounds over the shared-5-gram
    # source graph — every quantity BIGINT, every division `//`
    _pr_gram = _hex_bigint_sql(
        "md5(array_to_string(list_slice(ws, s, s + 4), ' '))", 1, 15
    )
    _pr_sql = f"""
        WITH w AS (
          SELECT source, string_split(text, ' ') AS ws FROM documents),
        pos AS (
          SELECT source, ws,
                 unnest(generate_series(1, greatest(length(ws) - 4, 0))) AS s
          FROM w),
        g AS (SELECT DISTINCT source, {_pr_gram} AS gh FROM pos),
        prs AS (
          SELECT DISTINCT a.source AS sa, b.source AS sb
          FROM g a JOIN g b USING (gh) WHERE a.source < b.source),
        edges AS (
          SELECT sa AS src, sb AS dst FROM prs
          UNION ALL SELECT sb, sa FROM prs),
        deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS d
                FROM edges GROUP BY src),
        it0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM deg)"""
    for _k in range(1, 4):
        _pr_sql += f""",
        it{_k} AS (
          SELECT e.dst AS node,
                 CAST(150000 + (85 * sum(p.r // deg.d)) // 100 AS BIGINT) AS r
          FROM edges e JOIN it{_k - 1} p ON e.src = p.node
          JOIN deg ON e.src = deg.node
          GROUP BY e.dst)"""
    _pr_sql += "\n        SELECT node, r AS rank_micro FROM it3"
    oracles["source_pagerank"] = _pr_sql
    oracles["csv_ingest"] = oracles["jsonl_ingest"] = """
        SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(user_id) AS BIGINT) AS sum_user
        FROM events GROUP BY event_type
    """
    oracles["event_transitions"] = """
        WITH s AS (
          SELECT user_id, event_type,
                 lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS prev
          FROM events)
        SELECT prev, event_type AS next, CAST(count(*) AS BIGINT) AS n
        FROM s WHERE prev IS NOT NULL GROUP BY prev, next
    """
    oracles["banded_doc_sample"] = f"""
        WITH vc AS (
          SELECT n_chars AS v, count(*) AS c FROM documents GROUP BY 1),
        cdf AS (
          SELECT v, CAST(sum(c) OVER (ORDER BY v) - c AS BIGINT) AS lt
          FROM vc),
        tot AS (SELECT count(*) AS n FROM documents),
        banded AS (
          SELECT d.doc_id, d.n_chars,
                 CAST(least(cdf.lt * 4 // tot.n, 3) AS BIGINT) AS bucket,
                 md5('bands:' || CAST(d.doc_id AS VARCHAR)) AS hx
          FROM documents d JOIN cdf ON d.n_chars = cdf.v CROSS JOIN tot)
        SELECT doc_id, n_chars, bucket FROM banded
        WHERE {_md5_unit_sql('hx')} <
              CASE bucket WHEN 0 THEN 0.8 WHEN 1 THEN 0.4
                          WHEN 2 THEN 0.2 ELSE 0.1 END
    """
    oracles["view_purchase_attribution"] = """
        WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
        p AS (SELECT event_id, user_id, ts FROM events
              WHERE event_type = 'purchase')
        SELECT p.event_id, p.user_id,
               CAST(count(v.ts) AS BIGINT) AS n_attributed
        FROM p LEFT JOIN v ON p.user_id = v.user_id
          AND epoch_us(p.ts) - epoch_us(v.ts) BETWEEN 1 AND 3600000000
        GROUP BY p.event_id, p.user_id
    """
    oracles["streaming_dedup"] = """
        SELECT doc_id, md5(text) AS text_hash FROM documents
        QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
    """
    oracles["fuzzy_part_names"] = """
        WITH q AS (SELECT DISTINCT p_name FROM part)
        SELECT a.p_name AS name_a, b.p_name AS name_b,
               CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist
        FROM q a JOIN q b ON a.p_name < b.p_name
        WHERE abs(length(a.p_name) - length(b.p_name)) <= 2
          AND levenshtein(a.p_name, b.p_name) <= 2
    """
    oracles["winsorized_values"] = """
        WITH c AS (
          SELECT event_id, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
          FROM events),
        b AS (
          SELECT CAST(quantile_disc(cents, 0.01) AS BIGINT) AS lo,
                 CAST(quantile_disc(cents, 0.99) AS BIGINT) AS hi
          FROM c)
        SELECT event_id,
               CAST(least(greatest(cents, lo), hi) AS BIGINT) AS cents_w
        FROM c, b
    """
    oracles["normalized_dedup"] = r"""
        WITH n AS (
          SELECT doc_id,
                 trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS nt
          FROM documents)
        SELECT md5(nt) AS text_hash,
               CAST(min(doc_id) AS BIGINT) AS keep_id,
               CAST(count(*) AS BIGINT) AS dups
        FROM n GROUP BY md5(nt)
    """
    oracles["zorder_orders"] = f"""
        SELECT o_orderkey, o_custkey,
               CAST({_zorder_sql(["o_custkey", "o_orderkey"], 16)} AS BIGINT)
                 AS z_key
        FROM orders
    """
    oracles["hll_users_per_type"] = f"""
        WITH h AS (
          SELECT event_type,
                 {_hex_bigint_sql("md5(CAST(user_id AS VARCHAR))", 1, 8)} AS x
          FROM events WHERE user_id IS NOT NULL),
        b AS (SELECT event_type, x // 4194304 AS bucket, x % 4194304 AS w FROM h)
        SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
               CAST(MAX(CASE WHEN w = 0 THEN 23
                             ELSE 23 - length(bin(w)) END) AS BIGINT)
                 AS max_rho
        FROM b GROUP BY event_type, bucket
    """
    oracles["mad_outlier_events"] = """
        WITH c AS (
          SELECT event_id, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
          FROM events),
        m AS (SELECT CAST(2 * median(cents) AS BIGINT) AS med2 FROM c),
        d AS (SELECT event_id, cents, abs(2 * cents - med2) AS dd FROM c, m),
        md AS (SELECT CAST(2 * median(dd) AS BIGINT) AS m2d FROM d)
        SELECT event_id, cents FROM d, md WHERE 2 * 1 * dd > 3 * m2d
    """
    # id-ordered triangle enumeration — orientation-free, equals the
    # degree-oriented distributed count exactly
    oracles["part_triangles"] = """
        WITH e AS (
          SELECT DISTINCT a.l_partkey AS lo, b.l_partkey AS hi
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
        SELECT
          CAST((SELECT count(DISTINCT n) FROM
                 (SELECT lo AS n FROM e UNION ALL SELECT hi FROM e)) AS BIGINT)
            AS n_nodes,
          CAST((SELECT count(*) FROM e) AS BIGINT) AS n_edges,
          CAST((SELECT count(*)
                FROM e e1 JOIN e e2 ON e2.lo = e1.lo AND e2.hi > e1.hi
                          JOIN e e3 ON e3.lo = e1.hi AND e3.hi = e2.hi) AS BIGINT)
            AS n_triangles
    """
    oracles["chunk_documents"] = """
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks,
                          len(string_split(text, ' ')) AS n FROM documents)
        SELECT t.doc_id, CAST(u.start // 12 AS BIGINT) AS chunk_idx,
               CAST(least(u.start + 16, t.n) - u.start AS BIGINT)
                 AS n_chunk_tokens,
               array_to_string(t.toks[u.start + 1 : least(u.start + 16, t.n)], ' ')
                 AS chunk_text
        FROM t, unnest(generate_series(0, CAST(t.n - 1 AS BIGINT), 12)) AS u(start)
    """
    oracles["retention_daily"] = """
        WITH m AS (SELECT user_id,
                          date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS di
                   FROM events),
        c AS (SELECT user_id, min(di) AS cohort FROM m GROUP BY user_id),
        act AS (SELECT DISTINCT m.user_id, c.cohort, m.di - c.cohort AS off
                FROM m JOIN c USING (user_id))
        SELECT CAST(cohort AS BIGINT) AS cohort_period,
               CAST(off AS BIGINT) AS offset_periods,
               CAST(count(*) AS BIGINT) AS n_users
        FROM act GROUP BY 1, 2
    """
    oracles["distinct_types_running"] = """
        SELECT event_id, user_id,
          CAST(sum(ff) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS BIGINT) AS n_distinct_cum
        FROM (SELECT event_id, user_id, ts,
                CASE WHEN row_number() OVER (
                       PARTITION BY user_id, event_type ORDER BY ts, event_id) = 1
                     THEN 1 ELSE 0 END AS ff
              FROM events)
    """
    oracles["pareto_parts"] = """
        SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
               CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT) AS price_cents
        FROM part p
        WHERE NOT EXISTS (SELECT 1 FROM part q
          WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
            AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))
    """
    oracles["pricing_comoments"] = """
        SELECT l_returnflag,
          CAST(count(*) AS BIGINT) AS n,
          CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
          CAST(sum(x * x) AS BIGINT) AS sum_xx,
          CAST(sum(y * y) AS BIGINT) AS sum_yy,
          CAST(sum(x * y) AS BIGINT) AS sum_xy
        FROM (SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
                     CAST(floor(l_extendedprice * (1.0 - l_discount) + 0.5)
                          AS BIGINT) AS y
              FROM lineitem) GROUP BY 1
    """
    oracles["revenue_by_nation"] = """
        SELECT n.n_name,
          CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100.0
                              + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents,
          CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate >= TIMESTAMP '1995-01-01'
          AND o.o_orderdate < TIMESTAMP '1996-01-01'
        GROUP BY 1
    """
    oracles["top_user_paths"] = """
        WITH seq AS (SELECT user_id,
               array_to_string((list(event_type ORDER BY ts, event_id))[1:5], '>')
                 AS path
             FROM events GROUP BY user_id)
        SELECT path, CAST(count(*) AS BIGINT) AS n_users FROM seq GROUP BY 1
        ORDER BY n_users DESC, path LIMIT 10
    """
    oracles["rolling_wau"] = """
        WITH m AS (SELECT DISTINCT user_id,
                     date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
                   FROM events),
        cells AS (SELECT DISTINCT user_id, d + o.off AS period
                  FROM m, unnest(generate_series(0, 6)) AS o(off))
        SELECT CAST(period AS BIGINT) AS period,
               CAST(count(*) AS BIGINT) AS n_distinct
        FROM cells GROUP BY 1
    """
    oracles["hourly_type_grid"] = """
        WITH p AS (SELECT event_type,
                     CAST(floor(epoch(ts) / 3600) AS BIGINT) AS period
                   FROM events),
        span AS (SELECT min(period) AS lo, max(period) AS hi FROM p),
        keys AS (SELECT DISTINCT event_type FROM p),
        grid AS (SELECT k.event_type, g.period
                 FROM keys k, span s,
                      unnest(generate_series(s.lo, s.hi)) AS g(period))
        SELECT grid.event_type, CAST(grid.period AS BIGINT) AS period,
               CAST(count(p.event_type) AS BIGINT) AS n
        FROM grid LEFT JOIN p
          ON p.event_type = grid.event_type AND p.period = grid.period
        GROUP BY 1, 2
    """
    _row_h15 = _hex_bigint_sql(
        "md5(concat_ws('|', CAST(event_id AS VARCHAR), "
        "CAST(user_id AS VARCHAR), event_type))",
        1,
        15,
    )
    oracles["events_checksum"] = f"""
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(CAST(sum(h) AS HUGEINT) % 9223372036854775783 AS BIGINT)
                 AS checksum
        FROM (SELECT {_row_h15} AS h FROM events)
    """
    oracles["incremental_event_totals"] = """
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(m) AS BIGINT) AS total_micro,
               CAST(min(m) AS BIGINT) AS lo_micro,
               CAST(max(m) AS BIGINT) AS hi_micro
        FROM (SELECT event_type,
                CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS m
              FROM events)
        GROUP BY 1
    """
    oracles["session_overlaps"] = """
        WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
        flagged AS (SELECT user_id, tus,
            CASE WHEN tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus)
                      > 1800000000 THEN 1 ELSE 0 END AS brk
          FROM e),
        sess AS (SELECT user_id,
            sum(brk) OVER (PARTITION BY user_id ORDER BY tus
                           ROWS UNBOUNDED PRECEDING) AS sid, tus
          FROM flagged),
        iv AS (SELECT user_id, sid, min(tus) AS s, max(tus) AS e
               FROM sess GROUP BY 1, 2),
        L AS (SELECT * FROM iv WHERE user_id % 2 = 0),
        R AS (SELECT * FROM iv WHERE user_id % 2 = 1)
        SELECT L.user_id, CAST(count(*) AS BIGINT) AS n_overlaps
        FROM L JOIN R ON L.s <= R.e AND R.s <= L.e
        GROUP BY 1
    """
    _gs_rank = _hex_bigint_sql("md5('gsample:' || CAST(doc_id AS VARCHAR))", 1, 15)
    oracles["balanced_source_sample"] = f"""
        WITH r AS (SELECT doc_id, source,
            row_number() OVER (PARTITION BY source
                               ORDER BY {_gs_rank}, doc_id) AS rn
          FROM documents)
        SELECT doc_id, source FROM r WHERE rn <= 20
    """
    oracles["span_corruption_pairs"] = """
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        SELECT doc_id,
          array_to_string(list_transform(toks,
            (x, i) -> CASE WHEN (i - 1) % 7 = 3 THEN '<mask>' ELSE x END), ' ')
            AS corrupted,
          array_to_string(list_filter(list_transform(toks,
            (x, i) -> CASE WHEN (i - 1) % 7 = 3 THEN x ELSE NULL END),
            x -> x IS NOT NULL), ' ') AS target,
          CAST(len(list_filter(toks, (x, i) -> (i - 1) % 7 = 3)) AS BIGINT)
            AS n_masked
        FROM t
    """
    _mix_rank = _hex_bigint_sql("md5('mix:' || CAST(doc_id AS VARCHAR))", 1, 15)
    oracles["proportional_docs"] = f"""
        WITH cnt AS (SELECT source, count(*) AS c FROM documents GROUP BY 1),
        tot AS (SELECT sum(c) AS t FROM cnt),
        alloc AS (SELECT source, c, (200 * c) // t AS base, (200 * c) % t AS rem
                  FROM cnt, tot),
        ex AS (SELECT source, base,
               CASE WHEN row_number() OVER (ORDER BY rem DESC, source)
                    <= 200 - (SELECT sum(base) FROM alloc) THEN 1 ELSE 0 END AS e
               FROM alloc),
        quota AS (SELECT source, base + e AS q FROM ex),
        ranked AS (SELECT doc_id, source,
            row_number() OVER (PARTITION BY source
                               ORDER BY {_mix_rank}, doc_id) AS rn
          FROM documents)
        SELECT r.doc_id, r.source
        FROM ranked r JOIN quota USING (source) WHERE r.rn <= quota.q
    """
    oracles["frequent_part_pairs"] = """
        WITH p AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        pairs AS (SELECT a.l_partkey AS part_a, b.l_partkey AS part_b
          FROM p a JOIN p b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
        SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS n_orders
        FROM pairs GROUP BY 1, 2 HAVING count(*) >= 3
        ORDER BY n_orders DESC, part_a, part_b LIMIT 25
    """
    oracles["type_share_ppm"] = """
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) * 1000000 // (SELECT count(*) FROM events)
                    AS BIGINT) AS share_ppm
        FROM events GROUP BY 1
    """
    oracles["latest_user_event"] = """
        SELECT user_id, event_id, event_type FROM (
          SELECT user_id, event_id, event_type,
            row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
          FROM events) WHERE rn = 1
    """
    # AS MATERIALIZED: every CTE below is referenced 2-3x per round;
    # default inlining would re-expand the whole chain exponentially
    # (3^rounds parquet scans — observed fd exhaustion at 6 rounds)
    _part_e0 = """e0 AS MATERIALIZED (
          SELECT DISTINCT a.l_partkey AS lo, b.l_partkey AS hi
          FROM lineitem a JOIN lineitem b
            ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)"""
    oracles["part_degree_histogram"] = f"""
        WITH {_part_e0},
        d AS (SELECT node, count(*) AS deg FROM
               (SELECT lo AS node FROM e0 UNION ALL SELECT hi FROM e0)
              GROUP BY 1)
        SELECT CAST(deg AS BIGINT) AS deg, CAST(count(*) AS BIGINT) AS n_nodes
        FROM d GROUP BY 1
    """
    # 6 unrolled peeling rounds — same fixed-round discipline as the
    # pagerank_int oracle; extra rounds past the fixpoint are no-ops
    _kcore_ctes = [_part_e0]
    for r in range(1, 7):
        _kcore_ctes.append(
            f"""d{r} AS MATERIALIZED (SELECT node, count(*) AS deg FROM
               (SELECT lo AS node FROM e{r - 1} UNION ALL SELECT hi FROM e{r - 1})
              GROUP BY 1),
        k{r} AS MATERIALIZED (SELECT node FROM d{r} WHERE deg >= 80),
        e{r} AS MATERIALIZED (SELECT e.lo, e.hi FROM e{r - 1} e
                 JOIN k{r} a ON e.lo = a.node JOIN k{r} b ON e.hi = b.node)"""
        )
    oracles["part_kcore"] = (
        "WITH "
        + ",\n        ".join(_kcore_ctes)
        + """
        SELECT node, CAST(deg AS BIGINT) AS deg FROM (
          SELECT node, count(*) AS deg FROM
            (SELECT lo AS node FROM e6 UNION ALL SELECT hi FROM e6)
          GROUP BY 1) WHERE deg >= 80
    """
    )
    oracles["rolling_value_outliers"] = """
        WITH c AS (SELECT event_id, user_id, ts,
                     CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
                   FROM events),
        w AS (SELECT event_id, user_id, cents,
            coalesce(sum(cents) OVER win, 0) AS s,
            coalesce(sum(cents * cents) OVER win, 0) AS q,
            coalesce(count(*) OVER win, 0) AS n
          FROM c
          WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING))
        SELECT event_id, user_id, cents,
          CAST(CASE WHEN n >= 3
                     AND (n * cents - s) * (n * cents - s) * 1
                         > 9 * (n * q - s * s)
               THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
        FROM w
    """
    oracles["source_vocab_overlap"] = """
        WITH st AS (SELECT DISTINCT source, tok FROM
               (SELECT source, unnest(string_split(text, ' ')) AS tok
                FROM documents)),
        sz AS (SELECT source, count(*) AS n FROM st GROUP BY 1),
        sh AS (SELECT a.source AS src_a, b.source AS src_b,
                      count(*) AS n_shared
               FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
               GROUP BY 1, 2)
        SELECT sh.src_a, sh.src_b, CAST(n_shared AS BIGINT) AS n_shared,
               CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
               CAST(n_shared * 1000000 // (sa.n + sb.n - n_shared) AS BIGINT)
                 AS jaccard_ppm
        FROM sh JOIN sz sa ON sh.src_a = sa.source
                JOIN sz sb ON sh.src_b = sb.source
    """
    oracles["diverse_top_docs"] = """
        SELECT doc_id, source, n_chars FROM (
          SELECT doc_id, source, n_chars,
            row_number() OVER (PARTITION BY source
                               ORDER BY n_chars DESC, doc_id) AS rn
          FROM documents) WHERE rn <= 5
        ORDER BY n_chars DESC, doc_id LIMIT 30
    """
    # same float discipline as the proven knn_brute oracle, plus a
    # query partition
    oracles["multi_knn_batch"] = """
        WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id < 8)
        SELECT query_id, vec_id, cos_sim_micro FROM (
          SELECT q.query_id, e.vec_id,
            CAST(floor(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                              q.qv) * 1000000.0 + 0.5) AS BIGINT)
              AS cos_sim_micro,
            row_number() OVER (PARTITION BY q.query_id
              ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                              q.qv) DESC, e.vec_id) AS rn
          FROM embeddings e, q) WHERE rn <= 5
    """
    _w_sql = (
        "CASE WHEN strpos('01234567', substring(md5(CAST(d.dim AS VARCHAR) "
        "|| ':' || CAST(j.j AS VARCHAR)), 1, 1)) > 0 THEN 1 ELSE -1 END"
    )
    _p_cols = ",\n          ".join(
        f"CAST(sum(CASE WHEN w.j = {j} THEN w.w * qq.q ELSE 0 END) AS BIGINT) AS p{j}"
        for j in range(8)
    )
    oracles["hashed_embeddings"] = f"""
        WITH e AS (
          SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
                 generate_subscripts(embedding, 1) AS dim
          FROM embeddings),
        st AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM e GROUP BY dim),
        qq AS (SELECT e.vec_id, e.dim,
                 CAST(CASE WHEN st.mx > st.mn
                      THEN least(floor((e.v - st.mn) * 255.0 / (st.mx - st.mn)),
                                 255.0)
                      ELSE 0 END AS BIGINT) AS q
               FROM e JOIN st USING (dim)),
        w AS (SELECT d.dim, j.j, {_w_sql} AS w
              FROM (SELECT unnest(generate_series(1,
                      (SELECT len(embedding) FROM embeddings LIMIT 1))) AS dim) d,
                   (SELECT unnest(generate_series(0, 7)) AS j) j)
        SELECT qq.vec_id,
          {_p_cols}
        FROM qq JOIN w ON qq.dim = w.dim GROUP BY qq.vec_id
    """
    oracles["keyword_contexts_spark"] = """
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        pos AS (SELECT doc_id, toks,
                  unnest(list_filter(list_transform(toks,
                    (x, i) -> CASE WHEN x = 'spark' THEN i END),
                    x -> x IS NOT NULL)) AS p
                FROM t)
        SELECT doc_id, CAST(p - 1 AS BIGINT) AS pos,
          coalesce(array_to_string(toks[greatest(1, p - 3) : p - 1], ' '), '')
            AS left_ctx,
          coalesce(array_to_string(toks[p + 1 : least(len(toks), p + 3)], ' '), '')
            AS right_ctx
        FROM pos
    """
    oracles["langid_confusion"] = f"""
        WITH pred AS ({_lang_id_oracle_sql()})
        SELECT d.lang, p.pred_lang, CAST(count(*) AS BIGINT) AS n_docs
        FROM documents d JOIN pred p USING (doc_id)
        GROUP BY 1, 2
    """
    oracles["value_cume_micro"] = """
        WITH c AS (SELECT event_id, event_type,
                     CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
                   FROM events),
        w AS (SELECT event_id, event_type,
                count(*) OVER (PARTITION BY event_type ORDER BY cents)
                  AS cnt_le,
                count(*) OVER (PARTITION BY event_type) AS n
              FROM c)
        SELECT event_id, event_type,
               CAST(cnt_le * 1000000 // n AS BIGINT) AS cume_micro
        FROM w
    """
    oracles["embedding_clusters"] = f"""
        WITH RECURSIVE
        s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings WHERE vec_id % 5 = 0),
        cells AS (SELECT vec_id, v, {_lsh_cell_terms_sql("v")} AS cell FROM s),
        p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
              FROM cells a JOIN cells b
                ON a.cell = b.cell AND a.vec_id < b.vec_id
              WHERE list_cosine_similarity(a.v, b.v) >= 0.2),
        e AS (SELECT id_a AS u, id_b AS v FROM p
              UNION SELECT id_b, id_a FROM p),
        reach(u, lbl) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM e)
          UNION
          SELECT e.u, r.lbl FROM e JOIN reach r ON r.u = e.v)
        SELECT u AS node, CAST(MIN(lbl) AS BIGINT) AS cluster_id
        FROM reach GROUP BY u
    """
    oracles["ann_recall_at_k"] = f"""
        WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id < 8),
        v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        vc AS (SELECT vec_id, v, {_lsh_cell_terms_sql("v")} AS cell FROM v),
        qc AS (SELECT query_id, qv, {_lsh_cell_terms_sql("qv")} AS cell FROM q),
        brute AS (SELECT query_id, vec_id FROM (
          SELECT q.query_id, v.vec_id,
            row_number() OVER (PARTITION BY q.query_id
              ORDER BY list_cosine_similarity(v.v, q.qv) DESC, v.vec_id) AS rn
          FROM v, q) WHERE rn <= 5),
        lsh AS (SELECT query_id, vec_id FROM (
          SELECT qc.query_id, vc.vec_id,
            row_number() OVER (PARTITION BY qc.query_id
              ORDER BY list_cosine_similarity(vc.v, qc.qv) DESC, vc.vec_id)
              AS rn
          FROM vc JOIN qc
            ON bit_count(xor(CAST(vc.cell AS BIGINT), CAST(qc.cell AS BIGINT)))
               <= 1) WHERE rn <= 5)
        SELECT b.query_id, CAST(count(l.vec_id) AS BIGINT) AS n_hits
        FROM brute b LEFT JOIN lsh l
          ON b.query_id = l.query_id AND b.vec_id = l.vec_id
        GROUP BY 1
    """
    oracles["partitioned_sink_roundtrip"] = """
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS sum_chars
        FROM documents GROUP BY 1
    """
    oracles["pruned_read_orders"] = """
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1995-01-01'
          AND o_orderdate < TIMESTAMP '1996-01-01'
        GROUP BY 1
    """
    _neg_h = _hex_bigint_sql(
        "md5('neg:' || CAST(us.u AS VARCHAR) || ':' || CAST(j.j AS VARCHAR))", 1, 15
    )
    oracles["negative_part_samples"] = f"""
        WITH pos AS (SELECT DISTINCT o.o_custkey AS u, l.l_partkey AS it
                     FROM orders o JOIN lineitem l
                       ON o.o_orderkey = l.l_orderkey),
        vocab AS (SELECT it, row_number() OVER (ORDER BY it) - 1 AS idx
                  FROM (SELECT DISTINCT it FROM pos)),
        nv AS (SELECT count(*) AS c FROM vocab),
        users AS (SELECT DISTINCT u FROM pos),
        cand AS (SELECT us.u, j.j, v.it
                 FROM users us
                 CROSS JOIN nv
                 CROSS JOIN unnest(generate_series(0, 24)) AS j(j)
                 JOIN vocab v ON v.idx = ({_neg_h}) % nv.c),
        filt AS (SELECT c.u, c.j, c.it FROM cand c
                 WHERE NOT EXISTS (SELECT 1 FROM pos p
                                   WHERE p.u = c.u AND p.it = c.it)),
        firsts AS (SELECT u, it, min(j) AS mj FROM filt GROUP BY 1, 2),
        ranked AS (SELECT u, it,
                     row_number() OVER (PARTITION BY u ORDER BY mj) - 1 AS rank
                   FROM firsts)
        SELECT u AS o_custkey, it AS neg_item, CAST(rank AS BIGINT) AS rank
        FROM ranked WHERE rank < 5
    """
    oracles["constraint_report"] = """
        SELECT 'not_null:user_id' AS rule,
               CAST(count(*) FILTER (WHERE user_id IS NULL) AS BIGINT)
                 AS n_violations FROM events
        UNION ALL
        SELECT 'non_negative:value',
               CAST(count(*) FILTER (WHERE value < 0) AS BIGINT) FROM events
        UNION ALL
        SELECT 'in_set:event_type',
               CAST(count(*) FILTER (WHERE event_type IS NOT NULL
                 AND event_type NOT IN
                   ('view', 'click', 'purchase', 'signup', 'error')) AS BIGINT)
          FROM events
        UNION ALL
        SELECT 'unique:event_id',
               CAST(count(*) - count(DISTINCT event_id) AS BIGINT) FROM events
    """
    oracles["user_rfm"] = """
        WITH g AS (SELECT max(ts) AS gmax FROM events)
        SELECT user_id,
          CAST(count(*) AS BIGINT) AS frequency,
          CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
            AS monetary_cents,
          CAST(date_diff('microsecond', max(ts), g.gmax) // 3600000000
               AS BIGINT) AS recency_hours
        FROM events, g GROUP BY user_id, g.gmax
    """
    oracles["bpe_merge_candidates"] = """
        WITH w AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
        pairs AS (SELECT substring(w, i, 2) AS pair
                  FROM w, unnest(generate_series(1, CAST(length(w) - 1 AS BIGINT)))
                         AS t(i)
                  WHERE length(w) >= 2)
        SELECT pair, CAST(count(*) AS BIGINT) AS n
        FROM pairs GROUP BY 1 ORDER BY n DESC, pair LIMIT 20
    """
    oracles["dup_weighting"] = """
        WITH h AS (SELECT doc_id, md5(text) AS hh FROM documents),
        c AS (SELECT hh, count(*) AS n FROM h GROUP BY 1)
        SELECT h.doc_id, CAST(c.n AS BIGINT) AS dup_count,
               CAST(1000000 // c.n AS BIGINT) AS weight_ppm
        FROM h JOIN c USING (hh)
    """
    oracles["late_events"] = """
        WITH r AS (SELECT event_id, epoch_us(ts) AS tus,
                     max(epoch_us(ts)) OVER (ORDER BY event_id
                       ROWS UNBOUNDED PRECEDING) AS run
                   FROM events)
        SELECT event_id, CAST(run - tus AS BIGINT) AS lateness_us,
               CAST(CASE WHEN run - tus > 3600000000 THEN 1 ELSE 0 END
                    AS BIGINT) AS is_late
        FROM r
    """
    oracles["golden_records"] = """
        WITH h AS (SELECT doc_id, source, n_chars, md5(text) AS hh
                   FROM documents)
        SELECT CAST(min(doc_id) AS BIGINT) AS survivor_id,
               CAST(count(*) AS BIGINT) AS n_dups,
               CAST(max(n_chars) AS BIGINT) AS max_chars,
               array_to_string(list_sort(list(DISTINCT source)), ',')
                 AS sources
        FROM h GROUP BY hh
    """
    oracles["skipgram_pairs"] = """
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        p AS (SELECT doc_id, unnest(toks) AS w,
                     generate_subscripts(toks, 1) AS i FROM t)
        SELECT a.w AS center, b.w AS context, CAST(count(*) AS BIGINT) AS n
        FROM p a JOIN p b
          ON a.doc_id = b.doc_id AND a.i <> b.i AND abs(a.i - b.i) <= 2
        GROUP BY 1, 2 ORDER BY n DESC, center, context LIMIT 30
    """
    oracles["sliding_distinct_types"] = """
        WITH r AS (SELECT user_id, event_id, event_type,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn
                   FROM events)
        SELECT a.event_id, a.user_id,
               CAST(count(DISTINCT b.event_type) AS BIGINT) AS n_distinct_5
        FROM r a JOIN r b
          ON a.user_id = b.user_id AND b.rn BETWEEN a.rn - 4 AND a.rn
        GROUP BY 1, 2
    """
    oracles["next_token_top3"] = """
        WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        p AS (SELECT doc_id, unnest(toks) AS w,
                     generate_subscripts(toks, 1) AS i FROM t),
        bg AS (SELECT a.w AS w1, b.w AS w2, count(*) AS n
               FROM p a JOIN p b ON a.doc_id = b.doc_id AND b.i = a.i + 1
               GROUP BY 1, 2)
        SELECT w1, w2, CAST(n AS BIGINT) AS n FROM (
          SELECT w1, w2, n,
            row_number() OVER (PARTITION BY w1 ORDER BY n DESC, w2) AS rn
          FROM bg) WHERE rn <= 3
    """
    oracles["quality_rank_in_source"] = f"""
        WITH q AS ({oracles["quality_scores"]}),
        j AS (SELECT d.doc_id, d.source, q.quality_micro
              FROM documents d JOIN q USING (doc_id)),
        w AS (SELECT doc_id, source,
                count(*) OVER (PARTITION BY source ORDER BY quality_micro)
                  AS cnt_le,
                count(*) OVER (PARTITION BY source) AS n
              FROM j)
        SELECT doc_id, source, CAST(cnt_le * 1000000 // n AS BIGINT)
          AS cume_micro
        FROM w
    """
    oracles["dedup_rate_by_source"] = """
        WITH h AS (SELECT source, md5(text) AS hh FROM documents),
        s AS (SELECT source, count(*) AS n_docs,
                     count(DISTINCT hh) AS n_unique
              FROM h GROUP BY 1)
        SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
               CAST(n_unique AS BIGINT) AS n_unique,
               CAST((n_docs - n_unique) * 1000000 // n_docs AS BIGINT)
                 AS dup_ppm
        FROM s
    """
    oracles["value_histogram"] = """
        SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) // 1000 AS bucket,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    """
    oracles["daily_type_delta"] = """
        WITH d AS (SELECT event_type,
                     date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                       AS day,
                     count(*) AS n
                   FROM events GROUP BY 1, 2)
        SELECT event_type, CAST(day AS BIGINT) AS day, CAST(n AS BIGINT) AS n,
               CAST(coalesce(n - lag(n) OVER (PARTITION BY event_type
                                              ORDER BY day), 0) AS BIGINT)
                 AS delta
        FROM d
    """
    oracles["session_count_histogram"] = """
        WITH flagged AS (
          SELECT user_id, ts,
            CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                      > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk
          FROM events),
        sess AS (
          SELECT user_id,
            sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_id
          FROM flagged),
        per_user AS (
          SELECT user_id, count(DISTINCT session_id) AS n_sessions
          FROM sess GROUP BY user_id)
        SELECT CAST(n_sessions AS BIGINT) AS n_sessions,
               CAST(count(*) AS BIGINT) AS n_users
        FROM per_user GROUP BY 1
    """
    # Exact floor division for a possibly-negative HUGEINT numerator:
    # (a - mathmod(a, b)) is an exact multiple of b > 0, so DuckDB's
    # truncating // equals Python's flooring // (repo-wide identity).
    oracles["value_trend_ols"] = """
        WITH m AS MATERIALIZED (
          SELECT event_type,
                 CAST(count(*) AS HUGEINT) AS n,
                 CAST(sum(x) AS HUGEINT) AS sx,
                 CAST(sum(y) AS HUGEINT) AS sy,
                 CAST(sum(x * x) AS HUGEINT) AS sxx,
                 CAST(sum(x * y) AS HUGEINT) AS sxy
          FROM (SELECT event_type,
                  CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                       AS BIGINT) AS x,
                  CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS y
                FROM events) GROUP BY 1),
        d AS (SELECT *, n * sxx - sx * sx AS den,
                     1000000 * (n * sxy - sx * sy) AS snum
              FROM m WHERE n * sxx - sx * sx <> 0),
        s AS (SELECT *,
                     (snum - (((snum % den) + den) % den)) // den AS slope
              FROM d),
        i AS (SELECT *, 1000000 * sy - slope * sx AS inum FROM s)
        SELECT event_type, CAST(n AS BIGINT) AS n,
               CAST(slope AS BIGINT) AS slope_micro,
               CAST((inum - (((inum % n) + n) % n)) // n AS BIGINT)
                 AS icept_micro
        FROM i
    """
    oracles["cusum_change_point"] = """
        WITH p AS MATERIALIZED (
          SELECT event_type AS k,
                 date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
          FROM events),
        span AS MATERIALIZED (
          SELECT min(d) AS lo, max(d) AS hi, hi - lo + 1 AS nd FROM p),
        grid AS (SELECT k, g.d
                 FROM (SELECT DISTINCT k FROM p)
                 CROSS JOIN (SELECT unnest(generate_series(
                               (SELECT lo FROM span),
                               (SELECT hi FROM span))) AS d) g),
        c AS (SELECT grid.k, grid.d, count(p.k) AS n
              FROM grid LEFT JOIN p ON p.k = grid.k AND p.d = grid.d
              GROUP BY 1, 2),
        w AS (SELECT k, d,
                     sum(n) OVER (PARTITION BY k ORDER BY d) AS cum,
                     row_number() OVER (PARTITION BY k ORDER BY d) AS rk,
                     sum(n) OVER (PARTITION BY k) AS tot
              FROM c),
        s AS MATERIALIZED (
          SELECT k, d, tot,
                 (SELECT nd FROM span) * cum - rk * tot AS scaled
          FROM w),
        pk AS (SELECT k, max(scaled) AS peak FROM s GROUP BY 1)
        SELECT s.k AS event_type,
               CAST((SELECT nd FROM span) AS BIGINT) AS n_days,
               CAST(s.tot AS BIGINT) AS total,
               CAST(pk.peak AS BIGINT) AS peak_scaled,
               CAST(min(s.d) AS BIGINT) AS peak_day
        FROM s JOIN pk ON s.k = pk.k AND s.scaled = pk.peak
        GROUP BY 1, 2, 3, 4
    """
    oracles["time_weighted_value"] = """
        WITH g AS (
          SELECT user_id,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v,
                 (epoch_us(lead(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id))
                  - epoch_us(ts)) // 1000000 AS gap
          FROM events),
        a AS (SELECT user_id, sum(v * gap) AS wv, sum(gap) AS w
              FROM g WHERE gap IS NOT NULL GROUP BY 1)
        SELECT user_id, CAST(w AS BIGINT) AS w_seconds,
               CAST(wv // w AS BIGINT) AS tw_value
        FROM a WHERE w > 0
    """
    oracles["user_dom_bitmap"] = """
        WITH d AS (SELECT DISTINCT user_id,
                          CAST(day(ts) AS BIGINT) - 1 AS pos
                   FROM events)
        SELECT user_id,
               CAST(sum(CAST(1 AS BIGINT) << pos) AS BIGINT) AS bitmap,
               CAST(count(*) AS BIGINT) AS n_active
        FROM d GROUP BY 1
    """
    oracles["benford_totalprice"] = """
        WITH c AS (SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                     AS cents FROM orders WHERE o_totalprice > 0),
        k AS MATERIALIZED (
          SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
                   AS digit,
                 count(*) AS n
          FROM c GROUP BY 1)
        SELECT digit, CAST(n AS BIGINT) AS n,
               CAST(n * 1000000 // (SELECT sum(n) FROM k) AS BIGINT)
                 AS share_ppm
        FROM k
    """
    oracles["event_pair_lift"] = """
        WITH d AS MATERIALIZED (
          SELECT DISTINCT user_id, event_type FROM events),
        tot AS (SELECT count(DISTINCT user_id) AS nu FROM d),
        m AS MATERIALIZED (
          SELECT event_type, count(*) AS n FROM d GROUP BY 1),
        p AS (SELECT a.event_type AS item_a, b.event_type AS item_b,
                     count(*) AS n_pair
              FROM d a JOIN d b
                ON a.user_id = b.user_id AND a.event_type < b.event_type
              GROUP BY 1, 2)
        SELECT p.item_a, p.item_b, CAST(p.n_pair AS BIGINT) AS n_pair,
               CAST(ma.n AS BIGINT) AS n_a, CAST(mb.n AS BIGINT) AS n_b,
               CAST(tot.nu AS BIGINT) AS n_baskets,
               CAST((1000000 * CAST(p.n_pair AS HUGEINT) * tot.nu)
                    // (ma.n * mb.n) AS BIGINT) AS lift_ppm
        FROM p
        CROSS JOIN tot
        JOIN m ma ON ma.event_type = p.item_a
        JOIN m mb ON mb.event_type = p.item_b
    """
    oracles["lang_tv_by_source"] = """
        WITH c AS MATERIALIZED (
          SELECT source, lang, CAST(count(*) AS HUGEINT) AS c
          FROM documents GROUP BY 1, 2),
        g AS (SELECT source, sum(c) AS ng FROM c GROUP BY 1),
        v AS (SELECT lang, sum(c) AS cv FROM c GROUP BY 1),
        t AS (SELECT sum(c) AS n FROM c),
        cell AS (SELECT g.source, g.ng, v.cv, t.n, COALESCE(c.c, 0) AS c
                 FROM g CROSS JOIN v CROSS JOIN t
                 LEFT JOIN c ON c.source = g.source AND c.lang = v.lang)
        SELECT source, CAST(ng AS BIGINT) AS n_rows,
               CAST((1000000 * sum(abs(c * n - ng * cv)))
                    // (2 * ng * n) AS BIGINT) AS tv_ppm
        FROM cell GROUP BY source, ng, n
    """
    oracles["type_user_hhi"] = """
        WITH p AS MATERIALIZED (
          SELECT event_type, user_id, CAST(count(*) AS HUGEINT) AS c
          FROM events GROUP BY 1, 2)
        SELECT event_type,
               CAST(sum(c) AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_members,
               CAST((1000000 * sum(c * c)) // (sum(c) * sum(c)) AS BIGINT)
                 AS hhi_ppm
        FROM p GROUP BY 1
    """
    oracles["ewma_event_counts"] = """
        WITH p AS MATERIALIZED (
          SELECT event_type,
                 CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                      AS BIGINT) AS d
          FROM events),
        span AS (SELECT min(d) AS lo, max(d) AS hi FROM p),
        keys AS (SELECT DISTINCT event_type FROM p),
        grid AS MATERIALIZED (
          SELECT k.event_type, k.d, count(p.event_type) AS n
          FROM (SELECT k.event_type, gg.d
                FROM keys k, span s,
                     unnest(generate_series(s.lo, s.hi)) AS gg(d)) k
          LEFT JOIN p ON p.event_type = k.event_type AND p.d = k.d
          GROUP BY 1, 2)
        SELECT a.event_type, a.d AS day, CAST(a.n AS BIGINT) AS n,
               CAST((1000 * sum(b.n * CAST(power(2, 7 - (a.d - b.d)) AS BIGINT)))
                    // 255 AS BIGINT) AS ewma_milli
        FROM grid a JOIN grid b
          ON b.event_type = a.event_type
         AND b.d BETWEEN a.d - 7 AND a.d
        GROUP BY a.event_type, a.d, a.n
    """
    oracles["daily_autocorr"] = """
        WITH p AS MATERIALIZED (
          SELECT event_type,
                 CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                      AS BIGINT) AS d
          FROM events),
        span AS (SELECT min(d) AS lo, max(d) AS hi FROM p),
        keys AS (SELECT DISTINCT event_type FROM p),
        grid AS (SELECT k.event_type, k.d, count(p.event_type) AS n
                 FROM (SELECT k.event_type, gg.d
                       FROM keys k, span s,
                            unnest(generate_series(s.lo, s.hi)) AS gg(d)) k
                 LEFT JOIN p ON p.event_type = k.event_type AND p.d = k.d
                 GROUP BY 1, 2),
        pairs AS (SELECT event_type, CAST(n AS HUGEINT) AS x,
                         CAST(lead(n) OVER (PARTITION BY event_type ORDER BY d)
                              AS HUGEINT) AS y
                  FROM grid),
        m AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS n,
                     sum(x) AS sx, sum(y) AS sy,
                     sum(x * x) AS sxx, sum(y * y) AS syy,
                     sum(x * y) AS sxy
              FROM pairs WHERE y IS NOT NULL GROUP BY 1),
        f AS (SELECT event_type, n,
                     n * sxy - sx * sy AS num,
                     (n * sxx - sx * sx) * (n * syy - sy * sy) AS den
              FROM m)
        SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
               CAST(CASE WHEN num >= 0
                         THEN (1000000 * num * num) // den
                         ELSE -((1000000 * num * num) // den)
                    END AS BIGINT) AS acorr2_ppm
        FROM f WHERE den <> 0
    """
    oracles["customer_event_reconcile"] = """
        WITH l AS (SELECT c_custkey AS k, count(*) AS ln
                   FROM customer GROUP BY 1),
        r AS (SELECT user_id AS k, count(*) AS rn FROM events GROUP BY 1),
        f AS (SELECT COALESCE(l.ln, 0) AS ln, COALESCE(r.rn, 0) AS rn
              FROM l FULL OUTER JOIN r ON l.k = r.k)
        SELECT CASE WHEN ln > 0 AND rn > 0 THEN 'both'
                    WHEN ln > 0 THEN 'left_only'
                    ELSE 'right_only' END AS category,
               CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(ln) AS BIGINT) AS left_rows,
               CAST(sum(rn) AS BIGINT) AS right_rows
        FROM f GROUP BY 1
    """
    oracles["daily_user_jaccard"] = """
        WITH du AS MATERIALIZED (
          SELECT DISTINCT
                 CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                      AS BIGINT) AS d,
                 user_id AS k
          FROM events),
        mx AS (SELECT max(d) AS md FROM du),
        e AS (SELECT d, k, 1 AS cur, 0 AS prev FROM du
              UNION ALL
              SELECT d + 1, k, 0, 1 FROM du),
        f AS (SELECT d, k, max(cur) AS cur, max(prev) AS prev
              FROM e GROUP BY 1, 2),
        pd AS (SELECT d, sum(cur) AS n_cur, sum(prev) AS n_prev,
                      sum(cur * prev) AS n_inter
               FROM f GROUP BY 1)
        SELECT d AS day, CAST(n_cur AS BIGINT) AS n_cur,
               CAST(n_prev AS BIGINT) AS n_prev,
               CAST(n_inter AS BIGINT) AS n_inter,
               CAST((1000000 * n_inter) // (n_cur + n_prev - n_inter)
                    AS BIGINT) AS jac_ppm
        FROM pd, mx WHERE d <= md
    """
    oracles["gini_user_activity"] = """
        WITH p AS MATERIALIZED (
          SELECT event_type, user_id, CAST(count(*) AS HUGEINT) AS c
          FROM events GROUP BY 1, 2),
        r AS (SELECT event_type, c,
                     CAST(row_number() OVER (PARTITION BY event_type
                                             ORDER BY c) AS HUGEINT) AS i
              FROM p)
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_members,
               CAST(sum(c) AS BIGINT) AS n_rows,
               CAST((1000000 * (2 * sum(i * c) - (count(*) + 1) * sum(c)))
                    // (count(*) * sum(c)) AS BIGINT) AS gini_ppm
        FROM r GROUP BY 1
    """
    oracles["activity_streaks"] = """
        WITH du AS MATERIALIZED (
          SELECT DISTINCT user_id,
                 CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                      AS BIGINT) AS d
          FROM events),
        i AS (SELECT user_id,
                     d - row_number() OVER (PARTITION BY user_id ORDER BY d)
                       AS isl
              FROM du),
        r AS (SELECT user_id, count(*) AS run FROM i GROUP BY user_id, isl),
        s AS (SELECT user_id, max(run) AS streak FROM r GROUP BY 1)
        SELECT CAST(streak AS BIGINT) AS streak_len,
               CAST(count(*) AS BIGINT) AS n_keys
        FROM s GROUP BY 1
    """
    oracles["hapax_by_source"] = r"""
        WITH d AS MATERIALIZED (
          SELECT source, regexp_extract_all(text, '\S+') AS s
          FROM documents),
        w AS MATERIALIZED (
          SELECT source, s[i] || ' ' || s[i + 1] || ' ' || s[i + 2] AS word
          FROM d, unnest(generate_series(1, len(s) - 2)) AS g(i)),
        p AS MATERIALIZED (
          SELECT source, word, CAST(count(*) AS BIGINT) AS c
          FROM w GROUP BY 1, 2),
        t AS (SELECT word, sum(c) AS tot, max(source) AS grp
              FROM p GROUP BY 1),
        h AS (SELECT grp AS source, count(*) AS n_hapax
              FROM t WHERE tot = 1 GROUP BY 1),
        n AS (SELECT source, sum(c) AS n_tokens FROM p GROUP BY 1)
        SELECT n.source, CAST(n.n_tokens AS BIGINT) AS n_tokens,
               CAST(COALESCE(h.n_hapax, 0) AS BIGINT) AS n_hapax,
               CAST((1000000 * COALESCE(h.n_hapax, 0)) // n.n_tokens
                    AS BIGINT) AS hapax_ppm
        FROM n LEFT JOIN h ON h.source = n.source
        WHERE n.n_tokens > 0
    """
    oracles["q7_trade_volume"] = """
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
               CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                                   * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                 AS revenue_cents,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        WHERE n1.n_name <> n2.n_name
          AND l.l_shipdate >= TIMESTAMP '1995-01-01'
          AND l.l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY 1, 2, 3
    """
    oracles["label_centroid_cosine"] = """
        WITH e AS MATERIALIZED (
          SELECT CAST(label AS BIGINT) AS label,
                 unnest(embedding) AS v,
                 unnest(generate_series(0, len(embedding) - 1)) AS dim
          FROM embeddings),
        s AS MATERIALIZED (
          SELECT label, dim,
                 CAST(SUM(CAST(floor(CAST(v AS DOUBLE) * 1000000.0 + 0.5)
                               AS BIGINT)) AS HUGEINT) AS vsum
          FROM e GROUP BY 1, 2),
        pair AS (SELECT a.label AS group_a, b.label AS group_b,
                        sum(a.vsum * b.vsum) AS dot
                 FROM s a JOIN s b ON a.dim = b.dim AND a.label < b.label
                 GROUP BY 1, 2),
        norm AS (SELECT label, sum(vsum * vsum) AS n2 FROM s GROUP BY 1)
        SELECT p.group_a, p.group_b,
               CAST(CASE WHEN p.dot >= 0
                         THEN (1000000 * p.dot * p.dot) // (na.n2 * nb.n2)
                         ELSE -((1000000 * p.dot * p.dot) // (na.n2 * nb.n2))
                    END AS BIGINT) AS cos2_ppm
        FROM pair p
        JOIN norm na ON na.label = p.group_a
        JOIN norm nb ON nb.label = p.group_b
        WHERE na.n2 > 0 AND nb.n2 > 0
    """
    oracles["quality_rate_ztest"] = """
        WITH g AS (SELECT source,
                          CAST(count(*) AS HUGEINT) AS n,
                          CAST(sum(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END)
                               AS HUGEINT) AS k
                   FROM documents GROUP BY 1),
        tot AS (SELECT sum(n) AS nn, sum(k) AS kk FROM g)
        SELECT g.source,
               CAST(g.n AS BIGINT) AS n_docs,
               CAST(g.k AS BIGINT) AS n_pass,
               CAST(CASE
                 WHEN t.kk = 0 OR t.kk = t.nn THEN 0
                 WHEN g.k * (t.nn - g.n) - (t.kk - g.k) * g.n >= 0
                 THEN (1000000 * (g.k * (t.nn - g.n) - (t.kk - g.k) * g.n)
                               * (g.k * (t.nn - g.n) - (t.kk - g.k) * g.n)
                               * t.nn)
                      // (g.n * (t.nn - g.n) * t.kk * (t.nn - t.kk))
                 ELSE -((1000000 * (g.k * (t.nn - g.n) - (t.kk - g.k) * g.n)
                                 * (g.k * (t.nn - g.n) - (t.kk - g.k) * g.n)
                                 * t.nn)
                        // (g.n * (t.nn - g.n) * t.kk * (t.nn - t.kk)))
               END AS BIGINT) AS z2_ppm
        FROM g, tot t
        WHERE t.nn - g.n > 0
    """
    oracles["chi2_type_weekday"] = """
        WITH p AS MATERIALIZED (
          SELECT event_type,
                 CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                      AS BIGINT) % 7 AS dow
          FROM events),
        c AS (SELECT event_type, dow, CAST(count(*) AS HUGEINT) AS o
              FROM p GROUP BY 1, 2),
        r AS (SELECT event_type, sum(o) AS rr FROM c GROUP BY 1),
        v AS (SELECT dow, sum(o) AS cc FROM c GROUP BY 1),
        t AS (SELECT sum(o) AS n FROM c),
        cell AS (SELECT r.event_type, r.rr, v.cc, t.n, COALESCE(c.o, 0) AS o
                 FROM r CROSS JOIN v CROSS JOIN t
                 LEFT JOIN c ON c.event_type = r.event_type AND c.dow = v.dow)
        SELECT event_type, CAST(rr AS BIGINT) AS n_rows,
               CAST(sum((1000000 * (o * n - rr * cc) * (o * n - rr * cc))
                        // (n * rr * cc)) AS BIGINT) AS chi2_ppm
        FROM cell GROUP BY event_type, rr
    """
    oracles["source_shingle_jaccard"] = r"""
        WITH d AS MATERIALIZED (
          SELECT source, regexp_extract_all(text, '\S+') AS s FROM documents),
        w AS MATERIALIZED (
          SELECT DISTINCT source,
                 s[i] || ' ' || s[i + 1] || ' ' || s[i + 2] AS shingle
          FROM d, unnest(generate_series(1, len(s) - 2)) AS g(i)),
        sz AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM w GROUP BY 1),
        inter AS (SELECT a.source AS group_a, b.source AS group_b,
                         CAST(count(*) AS BIGINT) AS n_inter
                  FROM w a JOIN w b ON a.shingle = b.shingle
                                   AND a.source < b.source
                  GROUP BY 1, 2)
        SELECT i.group_a, i.group_b, i.n_inter,
               CAST((1000000 * i.n_inter) // (sa.n + sb.n - i.n_inter)
                    AS BIGINT) AS jac_ppm
        FROM inter i
        JOIN sz sa ON sa.source = i.group_a
        JOIN sz sb ON sb.source = i.group_b
    """
    oracles["length_ks_by_source"] = """
        WITH c AS MATERIALIZED (
          SELECT source, n_chars AS v, CAST(count(*) AS HUGEINT) AS c
          FROM documents GROUP BY 1, 2),
        vals AS (SELECT DISTINCT v FROM c),
        g AS (SELECT source, sum(c) AS ng FROM c GROUP BY 1),
        t AS (SELECT sum(c) AS n FROM c),
        grid AS (SELECT g.source, g.ng, vals.v, COALESCE(c.c, 0) AS c
                 FROM g CROSS JOIN vals
                 LEFT JOIN c ON c.source = g.source AND c.v = vals.v),
        cum AS (SELECT source, ng, v,
                       sum(c) OVER (PARTITION BY source ORDER BY v) AS cumg
                FROM grid),
        ca AS (SELECT v, sum(c) AS cv FROM c GROUP BY 1),
        cumall AS (SELECT v, sum(cv) OVER (ORDER BY v) AS cuma FROM ca),
        j AS (SELECT cum.source, cum.ng, t.n,
                     abs(cum.cumg * t.n - cum.ng * ca2.cuma) AS num
              FROM cum JOIN cumall ca2 ON ca2.v = cum.v CROSS JOIN t)
        SELECT source, CAST(ng AS BIGINT) AS n_rows,
               CAST((1000000 * max(num)) // (ng * n) AS BIGINT) AS ks_ppm
        FROM j GROUP BY source, ng, n
    """
    oracles["score_decile_lift"] = r"""
        WITH t AS MATERIALIZED (
          SELECT doc_id, n_chars,
                 length(regexp_extract_all(text, '\S+')) AS n_words,
                 length(text) AS n_chars_utf,
                 length(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
                 length(regexp_extract_all(text, '\b(the|a|to|of|and|in|is)\b'))
                   AS n_stop
          FROM documents),
        q AS (SELECT doc_id, n_chars,
                     CAST(floor((
                       0.5 * least(CAST(n_words AS DOUBLE) / 100.0, 1.0)
                       + 0.25 * (1.0 - least(CAST(n_punct AS DOUBLE)
                                 / greatest(n_chars_utf, 1) * 10.0, 1.0))
                       + 0.25 * (CAST(n_stop AS DOUBLE) / greatest(n_words, 1))
                     ) * 1000000.0 + 0.5) AS BIGINT) AS qm
              FROM t),
        r AS (SELECT doc_id, n_chars, qm,
                     row_number() OVER (ORDER BY qm, doc_id) - 1 AS rk,
                     count(*) OVER () AS n
              FROM q),
        d AS (SELECT (rk * 10) // n AS decile,
                     CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS is_long
              FROM r)
        SELECT CAST(decile AS BIGINT) AS decile,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(is_long) AS BIGINT) AS n_long,
               CAST((1000000 * sum(is_long)) // count(*) AS BIGINT)
                 AS long_rate_ppm
        FROM d GROUP BY 1
    """
    oracles["event_run_lengths"] = """
        WITH o AS MATERIALIZED (
          SELECT user_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn,
                 CASE WHEN lag(event_type) OVER (PARTITION BY user_id
                                                 ORDER BY ts, event_id)
                           IS DISTINCT FROM event_type
                      THEN 1 ELSE 0 END AS chg
          FROM events),
        i AS (SELECT user_id, rn,
                     sum(chg) OVER (PARTITION BY user_id ORDER BY rn) AS isl
              FROM o),
        r AS (SELECT user_id, count(*) AS run FROM i GROUP BY user_id, isl),
        s AS (SELECT user_id, max(run) AS mx FROM r GROUP BY 1)
        SELECT CAST(mx AS BIGINT) AS run_len,
               CAST(count(*) AS BIGINT) AS n_keys
        FROM s GROUP BY 1
    """
    oracles["type_user_cosine"] = """
        WITH p AS MATERIALIZED (
          SELECT event_type, user_id, CAST(count(*) AS HUGEINT) AS c
          FROM events GROUP BY 1, 2),
        d AS (SELECT a.event_type AS item_a, b.event_type AS item_b,
                     sum(a.c * b.c) AS dot,
                     CAST(count(*) AS BIGINT) AS n_members_both
              FROM p a JOIN p b ON a.user_id = b.user_id
                               AND a.event_type < b.event_type
              GROUP BY 1, 2),
        n AS (SELECT event_type, sum(c * c) AS n2 FROM p GROUP BY 1)
        SELECT d.item_a, d.item_b, d.n_members_both,
               CAST((1000000 * d.dot * d.dot) // (na.n2 * nb.n2) AS BIGINT)
                 AS cos2_ppm
        FROM d
        JOIN n na ON na.event_type = d.item_a
        JOIN n nb ON nb.event_type = d.item_b
    """
    oracles["burstiness_fano"] = """
        WITH p AS MATERIALIZED (
          SELECT event_type,
                 CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                      AS BIGINT) AS d
          FROM events),
        span AS (SELECT min(d) AS lo, max(d) AS hi FROM p),
        keys AS (SELECT DISTINCT event_type FROM p),
        grid AS (SELECT k.event_type, k.d,
                        CAST(count(p.event_type) AS HUGEINT) AS n
                 FROM (SELECT k.event_type, gg.d
                       FROM keys k, span s,
                            unnest(generate_series(s.lo, s.hi)) AS gg(d)) k
                 LEFT JOIN p ON p.event_type = k.event_type AND p.d = k.d
                 GROUP BY 1, 2),
        m AS (SELECT event_type, CAST(count(*) AS HUGEINT) AS nd,
                     sum(n) AS sx, sum(n * n) AS sxx
              FROM grid GROUP BY 1)
        SELECT event_type, CAST(nd AS BIGINT) AS n_days,
               CAST(sx AS BIGINT) AS n_rows,
               CAST((1000000 * (nd * sxx - sx * sx)) // (nd * sx) AS BIGINT)
                 AS fano_ppm
        FROM m
    """
    oracles["type_top_decile_share"] = """
        WITH p AS MATERIALIZED (
          SELECT event_type, user_id, CAST(count(*) AS HUGEINT) AS c
          FROM events GROUP BY 1, 2),
        r AS (SELECT event_type, c,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY c DESC) AS rn,
                     count(*) OVER (PARTITION BY event_type) AS nm
              FROM p)
        SELECT event_type,
               CAST(max(nm) AS BIGINT) AS n_members,
               CAST(sum(c) AS BIGINT) AS n_rows,
               CAST((1000000 * sum(CASE WHEN rn <= (nm * 10 + 99) // 100
                                        THEN c ELSE 0 END)) // sum(c)
                    AS BIGINT) AS top_share_ppm
        FROM r GROUP BY 1
    """
    oracles["quality_auc"] = r"""
        WITH t AS MATERIALIZED (
          SELECT doc_id, n_chars,
                 length(regexp_extract_all(text, '\S+')) AS n_words,
                 length(text) AS n_chars_utf,
                 length(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
                 length(regexp_extract_all(text, '\b(the|a|to|of|and|in|is)\b'))
                   AS n_stop
          FROM documents),
        q AS (SELECT doc_id, n_chars,
                     CAST(floor((
                       0.5 * least(CAST(n_words AS DOUBLE) / 100.0, 1.0)
                       + 0.25 * (1.0 - least(CAST(n_punct AS DOUBLE)
                                 / greatest(n_chars_utf, 1) * 10.0, 1.0))
                       + 0.25 * (CAST(n_stop AS DOUBLE) / greatest(n_words, 1))
                     ) * 1000000.0 + 0.5) AS BIGINT) AS qm
              FROM t),
        r AS (SELECT n_chars,
                     CAST(row_number() OVER (ORDER BY qm, doc_id) AS HUGEINT)
                       AS r1
              FROM q),
        m AS (SELECT CAST(sum(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END)
                          AS HUGEINT) AS p,
                     CAST(sum(CASE WHEN n_chars >= 200 THEN 0 ELSE 1 END)
                          AS HUGEINT) AS nn,
                     sum(CASE WHEN n_chars >= 200 THEN r1 ELSE 0 END) AS rs
              FROM r)
        SELECT CAST(p AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
               CAST(CASE WHEN p = 0 OR nn = 0 THEN 0
                         ELSE (1000000 * (rs - (p * (p + 1)) // 2)) // (p * nn)
                    END AS BIGINT) AS auc_ppm
        FROM m
    """
    oracles["reorder_gap_quantiles"] = """
        WITH g AS MATERIALIZED (
          SELECT o_custkey,
                 lead(CAST(date_diff('day', DATE '1970-01-01',
                                     CAST(o_orderdate AS DATE)) AS BIGINT))
                   OVER (PARTITION BY o_custkey ORDER BY o_orderdate)
                 - CAST(date_diff('day', DATE '1970-01-01',
                                  CAST(o_orderdate AS DATE)) AS BIGINT) AS gap
          FROM orders),
        j AS MATERIALIZED (
          SELECT c.c_mktsegment, g.gap
          FROM g JOIN customer c ON c.c_custkey = g.o_custkey
          WHERE g.gap IS NOT NULL)
        SELECT c_mktsegment, CAST(25 AS BIGINT) AS q_pct,
               CAST(quantile_disc(gap, 0.25) AS BIGINT) AS value
        FROM j GROUP BY 1
        UNION ALL
        SELECT c_mktsegment, CAST(50 AS BIGINT),
               CAST(quantile_disc(gap, 0.5) AS BIGINT)
        FROM j GROUP BY 1
        UNION ALL
        SELECT c_mktsegment, CAST(75 AS BIGINT),
               CAST(quantile_disc(gap, 0.75) AS BIGINT)
        FROM j GROUP BY 1
    """
    oracles["systematic_sample_orders"] = """
        WITH r AS (SELECT o_orderstatus, o_totalprice,
                          row_number() OVER (ORDER BY o_orderkey) - 1 AS rk
                   FROM orders)
        SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS sample_cents
        FROM r WHERE rk % 100 = 0 GROUP BY 1
    """
    oracles["weighted_price_quantiles"] = """
        WITH c AS MATERIALIZED (
          SELECT l_returnflag,
                 CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT) AS cents,
                 CAST(l_quantity AS BIGINT) AS w
          FROM lineitem),
        tw AS (SELECT l_returnflag, CAST(sum(w) AS HUGEINT) AS tw
               FROM c GROUP BY 1),
        cum AS (SELECT l_returnflag, cents,
                       sum(w) OVER (PARTITION BY l_returnflag
                                    ORDER BY cents) AS cw
                FROM c),
        qq AS (SELECT * FROM (VALUES (1, 4), (1, 2), (3, 4)) AS q(num, den)),
        sel AS (SELECT w.l_returnflag, qq.num, qq.den, min(cum.cents) AS v
                FROM tw w
                JOIN cum ON cum.l_returnflag = w.l_returnflag
                CROSS JOIN qq
                WHERE cum.cw >= greatest(
                        (qq.num * w.tw + qq.den - 1) // qq.den, 1)
                GROUP BY 1, 2, 3)
        SELECT l_returnflag, CAST((100 * num) // den AS BIGINT) AS q_pct,
               CAST(v AS BIGINT) AS value
        FROM sel
    """
    oracles["jaccard_pair_join"] = r"""
        WITH d AS MATERIALIZED (
          SELECT doc_id, regexp_extract_all(text, '\S+') AS s FROM documents),
        w AS MATERIALIZED (
          SELECT DISTINCT doc_id,
                 s[i] || ' ' || s[i + 1] || ' ' || s[i + 2] AS sh
          FROM d, unnest(generate_series(1, len(s) - 2)) AS g(i)),
        sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM w GROUP BY 1),
        inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                         CAST(count(*) AS BIGINT) AS n_inter
                  FROM w a JOIN w b ON a.sh = b.sh AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
        j AS (SELECT i.id_a, i.id_b, i.n_inter,
                     CAST((1000000 * i.n_inter) // (sa.n + sb.n - i.n_inter)
                          AS BIGINT) AS jac_ppm
              FROM inter i
              JOIN sz sa ON sa.doc_id = i.id_a
              JOIN sz sb ON sb.doc_id = i.id_b)
        SELECT * FROM j WHERE jac_ppm >= 500000
    """
    oracles["growth_accounting"] = """
        WITH du AS MATERIALIZED (
          SELECT DISTINCT user_id,
                 CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                      AS BIGINT) AS d
          FROM events),
        c AS (SELECT user_id, d,
                     CASE
                       WHEN lag(d) OVER (PARTITION BY user_id ORDER BY d)
                            IS NULL THEN 'new'
                       WHEN d - lag(d) OVER (PARTITION BY user_id ORDER BY d)
                            = 1 THEN 'retained'
                       ELSE 'resurrected'
                     END AS category
              FROM du)
        SELECT d AS day, category, CAST(count(*) AS BIGINT) AS n_keys
        FROM c GROUP BY 1, 2
    """
    oracles["above_priority_avg"] = """
        WITH c AS MATERIALIZED (
          SELECT o_orderpriority,
                 CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
          FROM orders),
        s AS (SELECT o_orderpriority, CAST(sum(cents) AS HUGEINT) AS sc,
                     CAST(count(*) AS HUGEINT) AS n
              FROM c GROUP BY 1)
        SELECT c.o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN c.cents * s.n > s.sc THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_above
        FROM c JOIN s ON s.o_orderpriority = c.o_orderpriority
        GROUP BY 1
    """
    oracles["rrf_prune_candidates"] = r"""
        WITH t AS MATERIALIZED (
          SELECT doc_id, n_chars,
                 length(regexp_extract_all(text, '\S+')) AS n_words,
                 length(text) AS n_chars_utf,
                 length(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
                 length(regexp_extract_all(text, '\b(the|a|to|of|and|in|is)\b'))
                   AS n_stop
          FROM documents),
        q AS (SELECT doc_id, n_chars,
                     CAST(floor((
                       0.5 * least(CAST(n_words AS DOUBLE) / 100.0, 1.0)
                       + 0.25 * (1.0 - least(CAST(n_punct AS DOUBLE)
                                 / greatest(n_chars_utf, 1) * 10.0, 1.0))
                       + 0.25 * (CAST(n_stop AS DOUBLE) / greatest(n_words, 1))
                     ) * 1000000.0 + 0.5) AS BIGINT) AS qm
              FROM t),
        r AS (SELECT doc_id,
                     row_number() OVER (ORDER BY qm, doc_id) AS r1,
                     row_number() OVER (ORDER BY n_chars, doc_id) AS r2
              FROM q)
        SELECT doc_id,
               CAST(1000000 // (60 + r1) + 1000000 // (60 + r2) AS BIGINT)
                 AS rrf_milli
        FROM r
        ORDER BY rrf_milli DESC, doc_id ASC
        LIMIT 10
    """
    oracles["order_width_histogram"] = """
        WITH c AS (SELECT l_orderkey, count(*) AS n FROM lineitem GROUP BY 1),
        f AS (SELECT COALESCE(c.n, 0) AS n_items
              FROM orders o LEFT JOIN c ON c.l_orderkey = o.o_orderkey)
        SELECT CAST(n_items AS BIGINT) AS n_items,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM f GROUP BY 1
    """
    oracles["rolling_type_correlation"] = """
        WITH p AS MATERIALIZED (
          SELECT event_type,
                 CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                      AS BIGINT) AS d
          FROM events WHERE event_type IN ('view', 'purchase')),
        span AS (SELECT min(d) AS lo, max(d) AS hi FROM p),
        keys AS (SELECT DISTINCT event_type FROM p),
        grid AS (SELECT k.event_type, k.d, count(p.event_type) AS n
                 FROM (SELECT k.event_type, gg.d
                       FROM keys k, span s,
                            unnest(generate_series(s.lo, s.hi)) AS gg(d)) k
                 LEFT JOIN p ON p.event_type = k.event_type AND p.d = k.d
                 GROUP BY 1, 2),
        g2 AS MATERIALIZED (
          SELECT d,
                 CAST(max(CASE WHEN event_type = 'view' THEN n END)
                      AS HUGEINT) AS x,
                 CAST(max(CASE WHEN event_type = 'purchase' THEN n END)
                      AS HUGEINT) AS y
          FROM grid GROUP BY 1),
        win AS (SELECT a.d, a.x AS xa, a.y AS ya,
                       CAST(count(*) AS HUGEINT) AS n,
                       sum(b.x) AS sx, sum(b.y) AS sy,
                       sum(b.x * b.x) AS sxx, sum(b.y * b.y) AS syy,
                       sum(b.x * b.y) AS sxy
                FROM g2 a JOIN g2 b ON b.d BETWEEN a.d - 6 AND a.d
                GROUP BY a.d, a.x, a.y)
        SELECT d AS day, CAST(xa AS BIGINT) AS n_a, CAST(ya AS BIGINT) AS n_b,
               CAST(CASE
                 WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) = 0 THEN 0
                 WHEN n * sxy - sx * sy >= 0
                 THEN (1000000 * (n * sxy - sx * sy) * (n * sxy - sx * sy))
                      // ((n * sxx - sx * sx) * (n * syy - sy * sy))
                 ELSE -((1000000 * (n * sxy - sx * sy) * (n * sxy - sx * sy))
                        // ((n * sxx - sx * sx) * (n * syy - sy * sy)))
               END AS BIGINT) AS rcorr2_ppm
        FROM win
    """
    oracles["seasonal_outlier_days"] = """
        WITH p AS MATERIALIZED (
          SELECT event_type,
                 CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                      AS BIGINT) AS d
          FROM events),
        span AS (SELECT min(d) AS lo, max(d) AS hi FROM p),
        keys AS (SELECT DISTINCT event_type FROM p),
        grid AS MATERIALIZED (
          SELECT k.event_type, k.d, count(p.event_type) AS n
          FROM (SELECT k.event_type, gg.d
                FROM keys k, span s,
                     unnest(generate_series(s.lo, s.hi)) AS gg(d)) k
          LEFT JOIN p ON p.event_type = k.event_type AND p.d = k.d
          GROUP BY 1, 2),
        dw AS (SELECT event_type, d % 7 AS dow,
                      CAST(count(*) AS BIGINT) AS nd,
                      CAST(sum(n) AS BIGINT) AS tot
               FROM grid GROUP BY 1, 2)
        SELECT g.event_type, CAST(g.d AS BIGINT) AS day,
               CAST(g.n AS BIGINT) AS n,
               dw.nd AS dow_days, dw.tot AS dow_total
        FROM grid g
        JOIN dw ON dw.event_type = g.event_type AND dw.dow = g.d % 7
        WHERE g.n * dw.nd * 10 > 11 * dw.tot
    """
    oracles["oov_rate_by_source"] = r"""
        WITH w AS MATERIALIZED (
          SELECT source, unnest(regexp_extract_all(text, '\S+')) AS word
          FROM documents),
        p AS MATERIALIZED (
          SELECT source, word, CAST(count(*) AS BIGINT) AS c
          FROM w GROUP BY 1, 2),
        t AS (SELECT word, sum(c) AS tot FROM p GROUP BY 1),
        v AS (SELECT word FROM t ORDER BY tot DESC, word ASC LIMIT 20),
        o AS (SELECT p.source, sum(p.c) AS n_tokens,
                     sum(CASE WHEN p.word IN (SELECT word FROM v)
                              THEN 0 ELSE p.c END) AS n_oov
              FROM p GROUP BY 1)
        SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(n_oov AS BIGINT) AS n_oov,
               CAST((1000000 * n_oov) // n_tokens AS BIGINT) AS oov_ppm
        FROM o WHERE n_tokens > 0
    """
    oracles["conversion_lag_quantiles"] = """
        WITH v AS MATERIALIZED (
          SELECT user_id, min(ts) AS vt FROM events
          WHERE event_type = 'view' GROUP BY 1),
        pp AS (SELECT e.user_id, min(e.ts) AS pt
               FROM events e JOIN v ON v.user_id = e.user_id
               WHERE e.event_type = 'purchase' AND e.ts >= v.vt
               GROUP BY 1),
        l AS (SELECT (epoch_us(pp.pt) - epoch_us(v.vt)) // 1000000 AS lag
              FROM v JOIN pp ON pp.user_id = v.user_id)
        SELECT CAST(25 AS BIGINT) AS q_pct,
               CAST(quantile_disc(lag, 0.25) AS BIGINT) AS value FROM l
        UNION ALL
        SELECT CAST(50 AS BIGINT), CAST(quantile_disc(lag, 0.5) AS BIGINT)
        FROM l
        UNION ALL
        SELECT CAST(75 AS BIGINT), CAST(quantile_disc(lag, 0.75) AS BIGINT)
        FROM l
    """
    oracles["slice_health_report"] = """
        WITH lc AS MATERIALIZED (
          SELECT source, lang, CAST(count(*) AS HUGEINT) AS c
          FROM documents GROUP BY 1, 2),
        lg AS (SELECT source, sum(c) AS ng FROM lc GROUP BY 1),
        lv AS (SELECT lang, sum(c) AS cv FROM lc GROUP BY 1),
        lt AS (SELECT sum(c) AS n FROM lc),
        lcell AS (SELECT g.source, g.ng, v.cv, t.n, COALESCE(lc.c, 0) AS c
                  FROM lg g CROSS JOIN lv v CROSS JOIN lt t
                  LEFT JOIN lc ON lc.source = g.source AND lc.lang = v.lang),
        tv AS (SELECT source, CAST(ng AS BIGINT) AS n_docs,
                      CAST((1000000 * sum(abs(c * n - ng * cv)))
                           // (2 * ng * n) AS BIGINT) AS tv_ppm
               FROM lcell GROUP BY source, ng, n),
        kc AS MATERIALIZED (
          SELECT source, n_chars AS v, CAST(count(*) AS HUGEINT) AS c
          FROM documents GROUP BY 1, 2),
        kvals AS (SELECT DISTINCT v FROM kc),
        kg AS (SELECT source, sum(c) AS ng FROM kc GROUP BY 1),
        kt AS (SELECT sum(c) AS n FROM kc),
        kgrid AS (SELECT g.source, g.ng, kvals.v, COALESCE(kc.c, 0) AS c
                  FROM kg g CROSS JOIN kvals
                  LEFT JOIN kc ON kc.source = g.source AND kc.v = kvals.v),
        kcum AS (SELECT source, ng, v,
                        sum(c) OVER (PARTITION BY source ORDER BY v) AS cumg
                 FROM kgrid),
        kca AS (SELECT v, sum(c) AS cv FROM kc GROUP BY 1),
        kcumall AS (SELECT v, sum(cv) OVER (ORDER BY v) AS cuma FROM kca),
        kj AS (SELECT kcum.source, kcum.ng, kt.n,
                      abs(kcum.cumg * kt.n - kcum.ng * ca2.cuma) AS num
               FROM kcum JOIN kcumall ca2 ON ca2.v = kcum.v CROSS JOIN kt),
        ks AS (SELECT source,
                      CAST((1000000 * max(num)) // (ng * n) AS BIGINT) AS ks_ppm
               FROM kj GROUP BY source, ng, n),
        zg AS (SELECT source, CAST(count(*) AS HUGEINT) AS n,
                      CAST(sum(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END)
                           AS HUGEINT) AS k
               FROM documents GROUP BY 1),
        ztot AS (SELECT sum(n) AS nn, sum(k) AS kk FROM zg),
        zt AS (SELECT g.source,
                      CAST(CASE
                        WHEN t.kk = 0 OR t.kk = t.nn THEN 0
                        WHEN g.k * (t.nn - g.n) - (t.kk - g.k) * g.n >= 0
                        THEN (1000000
                              * (g.k * (t.nn - g.n) - (t.kk - g.k) * g.n)
                              * (g.k * (t.nn - g.n) - (t.kk - g.k) * g.n)
                              * t.nn)
                             // (g.n * (t.nn - g.n) * t.kk * (t.nn - t.kk))
                        ELSE -((1000000
                                * (g.k * (t.nn - g.n) - (t.kk - g.k) * g.n)
                                * (g.k * (t.nn - g.n) - (t.kk - g.k) * g.n)
                                * t.nn)
                               // (g.n * (t.nn - g.n) * t.kk * (t.nn - t.kk)))
                      END AS BIGINT) AS z2_ppm
               FROM zg g, ztot t WHERE t.nn - g.n > 0)
        SELECT tv.source, tv.n_docs, tv.tv_ppm, ks.ks_ppm, zt.z2_ppm
        FROM tv JOIN ks ON ks.source = tv.source
        JOIN zt ON zt.source = tv.source
    """
    oracles["snm_candidate_pairs"] = """
        WITH r AS (SELECT doc_id, n_chars,
                          lead(doc_id) OVER (ORDER BY n_chars, doc_id) AS nb_id,
                          lead(n_chars) OVER (ORDER BY n_chars, doc_id) AS nb_n
                   FROM documents)
        SELECT CAST(doc_id AS BIGINT) AS id_a, CAST(nb_id AS BIGINT) AS id_b,
               CAST(n_chars AS BIGINT) AS n_a, CAST(nb_n AS BIGINT) AS n_b
        FROM r WHERE nb_id IS NOT NULL AND abs(nb_n - n_chars) <= 2
    """
    oracles["leadlag_view_purchase"] = """
        WITH p AS MATERIALIZED (
          SELECT event_type,
                 CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                      AS BIGINT) AS d
          FROM events WHERE event_type IN ('view', 'purchase')),
        span AS (SELECT min(d) AS lo, max(d) AS hi FROM p),
        keys AS (SELECT DISTINCT event_type FROM p),
        grid AS (SELECT k.event_type, k.d, count(p.event_type) AS n
                 FROM (SELECT k.event_type, gg.d
                       FROM keys k, span s,
                            unnest(generate_series(s.lo, s.hi)) AS gg(d)) k
                 LEFT JOIN p ON p.event_type = k.event_type AND p.d = k.d
                 GROUP BY 1, 2),
        g2 AS MATERIALIZED (
          SELECT d,
                 CAST(max(CASE WHEN event_type = 'view' THEN n END)
                      AS HUGEINT) AS x,
                 CAST(max(CASE WHEN event_type = 'purchase' THEN n END)
                      AS HUGEINT) AS y
          FROM grid GROUP BY 1),
        lags AS (SELECT * FROM (VALUES (0), (1), (2), (3)) AS l(lag)),
        m AS (SELECT l.lag, CAST(count(*) AS HUGEINT) AS n,
                     sum(a.x) AS sx, sum(b.y) AS sy,
                     sum(a.x * a.x) AS sxx, sum(b.y * b.y) AS syy,
                     sum(a.x * b.y) AS sxy
              FROM lags l
              JOIN g2 a ON TRUE
              JOIN g2 b ON b.d = a.d + l.lag
              GROUP BY 1)
        SELECT CAST(lag AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_pairs,
               CAST(CASE
                 WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) = 0 THEN 0
                 WHEN n * sxy - sx * sy >= 0
                 THEN (1000000 * (n * sxy - sx * sy) * (n * sxy - sx * sy))
                      // ((n * sxx - sx * sx) * (n * syy - sy * sy))
                 ELSE -((1000000 * (n * sxy - sx * sy) * (n * sxy - sx * sy))
                        // ((n * sxx - sx * sx) * (n * syy - sy * sy)))
               END AS BIGINT) AS xcorr2_ppm
        FROM m
    """
    oracles["cramers_v_lang_source"] = """
        WITH c AS MATERIALIZED (
          SELECT lang, source, CAST(count(*) AS HUGEINT) AS o
          FROM documents GROUP BY 1, 2),
        r AS (SELECT lang, sum(o) AS rr FROM c GROUP BY 1),
        v AS (SELECT source, sum(o) AS cc FROM c GROUP BY 1),
        t AS (SELECT sum(o) AS n FROM c),
        cell AS (SELECT r.lang, r.rr, v.cc, t.n, COALESCE(c.o, 0) AS o
                 FROM r CROSS JOIN v CROSS JOIN t
                 LEFT JOIN c ON c.lang = r.lang AND c.source = v.source),
        chi AS (SELECT sum((1000000 * (o * n - rr * cc) * (o * n - rr * cc))
                           // (n * rr * cc)) AS x2,
                       max(n) AS n
                FROM cell),
        dims AS (SELECT (SELECT count(*) FROM r) AS rc,
                        (SELECT count(*) FROM v) AS cc2)
        SELECT CAST(chi.n AS BIGINT) AS n_rows,
               CAST(dims.rc AS BIGINT) AS r_cats,
               CAST(dims.cc2 AS BIGINT) AS c_cats,
               CAST(CASE WHEN least(dims.rc - 1, dims.cc2 - 1) = 0 THEN 0
                         ELSE chi.x2 // (chi.n * least(dims.rc - 1,
                                                       dims.cc2 - 1))
                    END AS BIGINT) AS v2_ppm
        FROM chi, dims
    """
    oracles["daily_value_p95"] = """
        WITH c AS (SELECT event_type,
                          CAST(date_diff('day', DATE '1970-01-01',
                                         CAST(ts AS DATE)) AS BIGINT) AS day,
                          CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
                   FROM events)
        SELECT event_type, day, CAST(95 AS BIGINT) AS q_pct,
               CAST(quantile_disc(cents, 0.95) AS BIGINT) AS value
        FROM c GROUP BY 1, 2
    """
    oracles["frequent_part_triples"] = """
        WITH b AS MATERIALIZED (
          SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem)
        SELECT CAST(a.p AS BIGINT) AS item_a, CAST(b2.p AS BIGINT) AS item_b,
               CAST(c.p AS BIGINT) AS item_c,
               CAST(count(*) AS BIGINT) AS n_baskets
        FROM b a
        JOIN b b2 ON a.o = b2.o AND a.p < b2.p
        JOIN b c ON a.o = c.o AND b2.p < c.p
        GROUP BY 1, 2, 3 HAVING count(*) >= 2
    """
    oracles["bounce_rate_by_entry"] = """
        WITH o AS MATERIALIZED (
          SELECT user_id, event_type, event_id, epoch_us(ts) AS t,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM events),
        s AS (SELECT user_id, event_type, rn,
                     CASE WHEN rn = 1
                            OR t - lag(t) OVER (PARTITION BY user_id
                                                ORDER BY rn) > 1800000000
                          THEN 1 ELSE 0 END AS brk
              FROM o),
        s2 AS MATERIALIZED (
          SELECT user_id, event_type, rn,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY rn) AS sid
          FROM s),
        per AS (SELECT user_id, sid, count(*) AS n FROM s2 GROUP BY 1, 2),
        fst AS (SELECT user_id, sid, event_type
                FROM (SELECT user_id, sid, event_type,
                             row_number() OVER (PARTITION BY user_id, sid
                                                ORDER BY rn) AS rr
                      FROM s2)
                WHERE rr = 1)
        SELECT f.event_type AS entry_type,
               CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(sum(CASE WHEN p.n = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_bounces,
               CAST((1000000 * sum(CASE WHEN p.n = 1 THEN 1 ELSE 0 END))
                    // count(*) AS BIGINT) AS bounce_ppm
        FROM fst f
        JOIN per p ON p.user_id = f.user_id AND p.sid = f.sid
        GROUP BY 1
    """
    oracles["user_burstiness"] = """
        WITH t AS MATERIALIZED (
          SELECT user_id, epoch_us(ts) AS t FROM events),
        g AS (SELECT user_id,
                     (lead(t) OVER (PARTITION BY user_id ORDER BY t) - t)
                       // 1000000 AS gap
              FROM t),
        m AS (SELECT user_id, CAST(count(gap) AS HUGEINT) AS n,
                     CAST(sum(gap) AS HUGEINT) AS s,
                     CAST(sum(gap * gap) AS HUGEINT) AS sgg
              FROM g WHERE gap IS NOT NULL GROUP BY 1),
        allu AS (SELECT DISTINCT user_id FROM t),
        cls AS (SELECT a.user_id,
                       CASE
                         WHEN m.user_id IS NULL OR m.s = 0 THEN 'degenerate'
                         WHEN (1000000 * (m.n * m.sgg - m.s * m.s))
                              // (m.s * m.s) < 500000 THEN 'regular'
                         WHEN (1000000 * (m.n * m.sgg - m.s * m.s))
                              // (m.s * m.s) <= 2000000 THEN 'poisson'
                         ELSE 'bursty'
                       END AS class
                FROM allu a LEFT JOIN m ON m.user_id = a.user_id)
        SELECT class, CAST(count(*) AS BIGINT) AS n_keys
        FROM cls GROUP BY 1
    """
    oracles["daily_mix_drift"] = """
        WITH c AS MATERIALIZED (
          SELECT CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                      AS BIGINT) AS day,
                 event_type, CAST(count(*) AS HUGEINT) AS c
          FROM events GROUP BY 1, 2),
        g AS (SELECT day, sum(c) AS ng FROM c GROUP BY 1),
        v AS (SELECT event_type, sum(c) AS cv FROM c GROUP BY 1),
        t AS (SELECT sum(c) AS n FROM c),
        cell AS (SELECT g.day, g.ng, v.cv, t.n, COALESCE(c.c, 0) AS c
                 FROM g CROSS JOIN v CROSS JOIN t
                 LEFT JOIN c ON c.day = g.day AND c.event_type = v.event_type)
        SELECT day, CAST(ng AS BIGINT) AS n_rows,
               CAST((1000000 * sum(abs(c * n - ng * cv)))
                    // (2 * ng * n) AS BIGINT) AS tv_ppm
        FROM cell GROUP BY day, ng, n
    """
    oracles["orders_ntile_revenue"] = """
        WITH c AS (SELECT o_orderpriority,
                          CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                            AS cents,
                          o_orderkey
                   FROM orders),
        r AS (SELECT o_orderpriority, cents,
                     ntile(4) OVER (PARTITION BY o_orderpriority
                                    ORDER BY cents, o_orderkey) AS tile
              FROM c)
        SELECT o_orderpriority, CAST(tile AS BIGINT) AS tile,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(cents) AS BIGINT) AS cents_sum
        FROM r GROUP BY 1, 2
    """
    oracles["topk_with_ties_orders"] = """
        WITH c AS (SELECT o_orderpriority,
                          CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                            AS cents
                   FROM orders),
        r AS (SELECT o_orderpriority, cents,
                     rank() OVER (PARTITION BY o_orderpriority
                                  ORDER BY cents DESC) AS rk
              FROM c)
        SELECT o_orderpriority, cents, CAST(count(*) AS BIGINT) AS n_rows
        FROM r WHERE rk <= 3 GROUP BY 1, 2
    """
    oracles["unpivot_roundtrip"] = """
        SELECT event_type, CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    """
    oracles["first_last_matrix"] = """
        WITH o AS MATERIALIZED (
          SELECT user_id, event_type, epoch_us(ts) AS t,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn,
                 count(*) OVER (PARTITION BY user_id) AS cnt
          FROM events),
        f AS (SELECT user_id,
                     max(CASE WHEN rn = 1 THEN event_type END) AS first_type,
                     max(CASE WHEN rn = cnt THEN event_type END) AS last_type,
                     (max(t) - min(t)) // 1000000 AS span
              FROM o GROUP BY 1)
        SELECT first_type, last_type, CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(span) AS BIGINT) AS span_sec_sum
        FROM f GROUP BY 1, 2
    """
    oracles["part_khop_reach"] = """
        WITH b AS MATERIALIZED (
          SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        e0 AS (SELECT a.p AS s, b2.p AS d
               FROM b a JOIN b b2 ON a.o = b2.o AND a.p < b2.p),
        e AS MATERIALIZED (SELECT s, d FROM e0 UNION SELECT d, s FROM e0),
        seed AS (SELECT min(l_partkey) AS n FROM lineitem),
        h1 AS MATERIALIZED (
          SELECT DISTINCT e.d AS n FROM e JOIN seed ON e.s = seed.n
          WHERE e.d <> seed.n),
        h2 AS (SELECT DISTINCT e.d AS n FROM e JOIN h1 ON e.s = h1.n
               WHERE e.d NOT IN (SELECT n FROM h1)
                 AND e.d <> (SELECT n FROM seed))
        SELECT CAST(0 AS BIGINT) AS hop, CAST(count(*) AS BIGINT) AS n_nodes
        FROM seed
        UNION ALL SELECT 1, CAST(count(*) AS BIGINT) FROM h1
        UNION ALL SELECT 2, CAST(count(*) AS BIGINT) FROM h2
    """
    oracles["label_dispersion"] = """
        WITH e AS MATERIALIZED (
          SELECT CAST(label AS BIGINT) AS lab, vec_id,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000.0
                            + 0.5) AS HUGEINT) AS q,
                 unnest(generate_series(0, len(embedding) - 1)) AS dim
          FROM embeddings),
        m AS (SELECT lab, CAST(count(DISTINCT vec_id) AS HUGEINT) AS n,
                     sum(q * q) AS s2
              FROM e GROUP BY 1),
        vs AS (SELECT lab, dim, sum(q) AS vq FROM e GROUP BY 1, 2),
        vn AS (SELECT lab, sum(vq * vq) AS v2 FROM vs GROUP BY 1)
        SELECT m.lab AS label, CAST(m.n AS BIGINT) AS n,
               CAST(m.n * m.s2 - vn.v2 AS BIGINT) AS scatter_num,
               CAST((2 * (m.n * m.s2 - vn.v2)) // (m.n * m.n * 1000000)
                    AS BIGINT) AS mean_pd2_micro
        FROM m JOIN vn ON vn.lab = m.lab
    """
    oracles["monthly_revenue_reconcile"] = """
        WITH o AS MATERIALIZED (
          SELECT o_orderkey,
                 CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                      AS BIGINT) AS month,
                 CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS oc
          FROM orders),
        os AS (SELECT month, sum(oc) AS order_cents, count(*) AS n_orders
               FROM o GROUP BY 1),
        ls AS (SELECT o.month,
                      sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                                     * (1.0 + l.l_tax) * 100.0 + 0.5)
                               AS BIGINT)) AS lineitem_cents
               FROM lineitem l JOIN o ON o.o_orderkey = l.l_orderkey
               GROUP BY 1)
        SELECT os.month, CAST(os.order_cents AS BIGINT) AS order_cents,
               CAST(os.n_orders AS BIGINT) AS n_orders,
               CAST(COALESCE(ls.lineitem_cents, 0) AS BIGINT)
                 AS lineitem_cents,
               CAST(CASE WHEN os.order_cents = 0 THEN 0
                         ELSE (1000000 * COALESCE(ls.lineitem_cents, 0))
                              // os.order_cents
                    END AS BIGINT) AS drift_ppm
        FROM os LEFT JOIN ls ON ls.month = os.month
    """
    oracles["balance_band_pairs"] = """
        WITH s AS MATERIALIZED (
          SELECT CAST(floor(s_acctbal * 100.0 + 0.5) AS BIGINT) AS sc
          FROM supplier),
        c AS MATERIALIZED (
          SELECT CAST(c_nationkey AS BIGINT) AS c_nationkey,
                 CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS cc
          FROM customer),
        pairsn AS (SELECT c.c_nationkey, CAST(count(*) AS BIGINT) AS np
                   FROM c JOIN s ON abs(c.cc - s.sc) <= 100
                   GROUP BY 1),
        custn AS (SELECT c_nationkey, CAST(count(*) AS BIGINT) AS nc
                  FROM c GROUP BY 1)
        SELECT custn.c_nationkey,
               COALESCE(pairsn.np, 0) AS n_pairs,
               custn.nc AS n_customers
        FROM custn LEFT JOIN pairsn ON pairsn.c_nationkey = custn.c_nationkey
    """
    oracles["nation_share_of_region"] = """
        WITH j AS MATERIALIZED (
          SELECT r.r_name, n.n_name,
                 CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
          FROM orders o
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN nation n ON n.n_nationkey = c.c_nationkey
          JOIN region r ON r.r_regionkey = n.n_regionkey),
        pn AS (SELECT r_name, n_name,
                      CAST(sum(cents) AS HUGEINT) AS revenue_cents
               FROM j GROUP BY 1, 2),
        pr AS (SELECT r_name, sum(revenue_cents) AS rtot FROM pn GROUP BY 1)
        SELECT pn.r_name, pn.n_name,
               CAST(pn.revenue_cents AS BIGINT) AS revenue_cents,
               CAST((1000000 * pn.revenue_cents) // pr.rtot AS BIGINT)
                 AS share_ppm
        FROM pn JOIN pr ON pr.r_name = pn.r_name
    """
    oracles["sentence_stats_by_lang"] = r"""
        WITH c AS (SELECT lang,
                          CAST(length(regexp_extract_all(text, '[.!?]+'))
                               AS BIGINT) AS n_sent,
                          CAST(length(regexp_extract_all(text, '\S+'))
                               AS BIGINT) AS n_words
                   FROM documents)
        SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_sent) AS BIGINT) AS n_sentences,
               CAST(sum(n_words) AS BIGINT) AS n_words,
               CAST((1000 * sum(n_words)) // greatest(sum(n_sent), 1)
                    AS BIGINT) AS words_per_sent_milli
        FROM c GROUP BY 1
    """
    oracles["price_anova_eta2"] = """
        WITH c AS (SELECT l_returnflag AS f,
                          CAST(floor(l_extendedprice) AS HUGEINT) AS d
                   FROM lineitem),
        m AS (SELECT f, CAST(count(*) AS HUGEINT) AS n, sum(d) AS s,
                     sum(d * d) AS s2
              FROM c GROUP BY 1),
        p AS (SELECT CAST(count(*) AS BIGINT) AS ng, sum(n) AS nt,
                     sum(s) AS st, sum(s2) AS s2t,
                     list(n ORDER BY f) AS ln, list(s ORDER BY f) AS ls
              FROM m),
        q AS (SELECT ng, nt, st, s2t,
                     ln[1] * ln[2] * ln[3] AS prod,
                     ls[1] * ls[1] * nt * (ln[2] * ln[3])
                     + ls[2] * ls[2] * nt * (ln[1] * ln[3])
                     + ls[3] * ls[3] * nt * (ln[1] * ln[2]) AS ssb_a
              FROM p)
        SELECT ng AS n_groups, CAST(nt AS BIGINT) AS n_rows,
               CAST(CASE WHEN prod * (nt * s2t - st * st) = 0 THEN 0
                         ELSE (1000000 * (ssb_a - prod * st * st))
                              // (prod * (nt * s2t - st * st))
                    END AS BIGINT) AS eta2_ppm
        FROM q
    """
    oracles["brand_supplier_counts"] = """
        SELECT p.p_brand, p.p_type,
               CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS n_distinct
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1, 2
    """
    oracles["revenue_whale_share"] = """
        WITH pc2 AS MATERIALIZED (
          SELECT CAST(c.c_nationkey AS BIGINT) AS nationkey,
                 o.o_custkey AS custkey,
                 CAST(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
                      AS HUGEINT) AS w
          FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
          GROUP BY 1, 2),
        r AS (SELECT nationkey, w,
                     row_number() OVER (PARTITION BY nationkey
                                        ORDER BY w DESC) AS rn,
                     count(*) OVER (PARTITION BY nationkey) AS nm
              FROM pc2)
        SELECT nationkey, CAST(max(nm) AS BIGINT) AS n_members,
               CAST(sum(w) AS BIGINT) AS weight_total,
               CAST((1000000 * sum(CASE WHEN rn <= (nm * 10 + 99) // 100
                                        THEN w ELSE 0 END)) // sum(w)
                    AS BIGINT) AS top_share_ppm
        FROM r GROUP BY 1
    """
    oracles["brand_return_ztest"] = """
        WITH g AS (SELECT p.p_brand, CAST(count(*) AS HUGEINT) AS n,
                          CAST(sum(CASE WHEN l.l_returnflag = 'R'
                                        THEN 1 ELSE 0 END) AS HUGEINT) AS k
                   FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
                   GROUP BY 1),
        tot AS (SELECT sum(n) AS nn, sum(k) AS kk FROM g)
        SELECT g.p_brand,
               CAST(g.n AS BIGINT) AS n_rows,
               CAST(g.k AS BIGINT) AS n_returns,
               CAST(CASE
                 WHEN t.kk = 0 OR t.kk = t.nn THEN 0
                 WHEN g.k * (t.nn - g.n) - (t.kk - g.k) * g.n >= 0
                 THEN (1000000 * (g.k * (t.nn - g.n) - (t.kk - g.k) * g.n)
                               * (g.k * (t.nn - g.n) - (t.kk - g.k) * g.n)
                               * t.nn)
                      // (g.n * (t.nn - g.n) * t.kk * (t.nn - t.kk))
                 ELSE -((1000000 * (g.k * (t.nn - g.n) - (t.kk - g.k) * g.n)
                                 * (g.k * (t.nn - g.n) - (t.kk - g.k) * g.n)
                                 * t.nn)
                        // (g.n * (t.nn - g.n) * t.kk * (t.nn - t.kk)))
               END AS BIGINT) AS z2_ppm
        FROM g, tot t
        WHERE t.nn - g.n > 0
    """
    oracles["exact_dup_components"] = r"""
        WITH RECURSIVE d AS MATERIALIZED (
          SELECT doc_id, regexp_extract_all(text, '\S+') AS s FROM documents),
        w AS MATERIALIZED (
          SELECT DISTINCT doc_id,
                 s[i] || ' ' || s[i + 1] || ' ' || s[i + 2] AS sh
          FROM d, unnest(generate_series(1, len(s) - 2)) AS g(i)),
        sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM w GROUP BY 1),
        inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                         CAST(count(*) AS BIGINT) AS n_inter
                  FROM w a JOIN w b ON a.sh = b.sh AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
        p AS MATERIALIZED (
          SELECT i.id_a, i.id_b
          FROM inter i
          JOIN sz sa ON sa.doc_id = i.id_a
          JOIN sz sb ON sb.doc_id = i.id_b
          WHERE (1000000 * i.n_inter) // (sa.n + sb.n - i.n_inter) >= 500000),
        e AS (SELECT id_a AS u, id_b AS v FROM p
              UNION SELECT id_b, id_a FROM p),
        reach(u, lbl) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM e)
          UNION
          SELECT e.u, r.lbl FROM e JOIN reach r ON r.u = e.v),
        lab AS (SELECT u, MIN(lbl) AS cluster_id FROM reach GROUP BY 1),
        szs AS (SELECT cluster_id, count(*) AS sz2 FROM lab GROUP BY 1)
        SELECT CAST(sz2 AS BIGINT) AS cluster_size,
               CAST(count(*) AS BIGINT) AS n_clusters
        FROM szs GROUP BY 1
    """
    oracles["churned_customers_1995"] = """
        WITH f AS (SELECT o_custkey,
                          sum(CASE WHEN year(o_orderdate) = 1995
                                   THEN 1 ELSE 0 END) AS n95,
                          sum(CASE WHEN year(o_orderdate) = 1996
                                   THEN 1 ELSE 0 END) AS n96
                   FROM orders GROUP BY 1)
        SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n_churned
        FROM f JOIN customer c ON c.c_custkey = f.o_custkey
        WHERE f.n95 > 0 AND f.n96 = 0
        GROUP BY 1
    """
    oracles["median_split_priorities"] = """
        WITH c AS MATERIALIZED (
          SELECT o_orderpriority,
                 CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
          FROM orders),
        m AS (SELECT quantile_disc(cents, 0.5) AS med FROM c)
        SELECT c.o_orderpriority, CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(CASE WHEN c.cents > m.med THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_above
        FROM c, m GROUP BY 1
    """
    oracles["parts_never_ordered"] = """
        SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n_parts
        FROM part p
        WHERE p.p_partkey NOT IN (SELECT DISTINCT l_partkey FROM lineitem
                                  WHERE l_quantity >= 45)
        GROUP BY 1
    """
    oracles["spearman_balance_activity"] = """
        WITH cnt AS (SELECT o_custkey, count(*) AS n_orders
                     FROM orders GROUP BY 1),
        j AS MATERIALIZED (
          SELECT c.c_custkey,
                 CAST(floor(c.c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal,
                 COALESCE(cnt.n_orders, 0) AS n_orders
          FROM customer c LEFT JOIN cnt ON cnt.o_custkey = c.c_custkey),
        r AS (SELECT CAST(row_number() OVER (ORDER BY bal, c_custkey)
                          AS HUGEINT) AS rx,
                     CAST(row_number() OVER (ORDER BY n_orders, c_custkey)
                          AS HUGEINT) AS ry
              FROM j),
        m AS (SELECT CAST(count(*) AS HUGEINT) AS n, sum(rx) AS sx,
                     sum(ry) AS sy, sum(rx * rx) AS sxx,
                     sum(ry * ry) AS syy, sum(rx * ry) AS sxy
              FROM r)
        SELECT CAST(n AS BIGINT) AS n_customers,
               CAST(CASE
                 WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) = 0 THEN 0
                 WHEN n * sxy - sx * sy >= 0
                 THEN (1000000 * (n * sxy - sx * sy) * (n * sxy - sx * sy))
                      // ((n * sxx - sx * sx) * (n * syy - sy * sy))
                 ELSE -((1000000 * (n * sxy - sx * sy) * (n * sxy - sx * sy))
                        // ((n * sxx - sx * sx) * (n * syy - sy * sy)))
               END AS BIGINT) AS spearman2_ppm
        FROM m
    """
    oracles["decile_migration"] = """
        WITH yc AS MATERIALIZED (
          SELECT o_custkey, CAST(year(o_orderdate) AS BIGINT) AS year,
                 sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                   AS cents
          FROM orders WHERE year(o_orderdate) IN (1995, 1996)
          GROUP BY 1, 2),
        d95 AS (SELECT o_custkey,
                       ((row_number() OVER (ORDER BY cents, o_custkey) - 1)
                        * 10) // (count(*) OVER ()) AS d1995
                FROM yc WHERE year = 1995),
        d96 AS (SELECT o_custkey,
                       ((row_number() OVER (ORDER BY cents, o_custkey) - 1)
                        * 10) // (count(*) OVER ()) AS d1996
                FROM yc WHERE year = 1996)
        SELECT CAST(d95.d1995 AS BIGINT) AS d1995,
               CAST(d96.d1996 AS BIGINT) AS d1996,
               CAST(count(*) AS BIGINT) AS n_customers
        FROM d95 JOIN d96 ON d96.o_custkey = d95.o_custkey
        GROUP BY 1, 2
    """
    oracles["weekend_value_ratio"] = """
        WITH p AS (SELECT event_type,
                          CAST(date_diff('day', DATE '1970-01-01',
                                         CAST(ts AS DATE)) AS BIGINT) % 7
                            AS dow,
                          CAST(floor(value * 100.0 + 0.5) AS HUGEINT) AS cents
                   FROM events),
        a AS (SELECT event_type,
                     CAST(count(*) AS HUGEINT) AS nt,
                     CAST(sum(CASE WHEN dow IN (2, 3) THEN 1 ELSE 0 END)
                          AS HUGEINT) AS nw,
                     sum(cents) AS st,
                     sum(CASE WHEN dow IN (2, 3) THEN cents ELSE 0 END) AS sw
              FROM p GROUP BY 1)
        SELECT event_type, CAST(nw AS BIGINT) AS n_weekend,
               CAST(nt - nw AS BIGINT) AS n_weekday,
               CAST(CASE WHEN nw > 0 AND st - sw > 0
                         THEN (1000000 * sw * (nt - nw)) // (nw * (st - sw))
                         ELSE 0 END AS BIGINT) AS ratio_ppm
        FROM a
    """
    oracles["peak_concurrent_sessions"] = """
        WITH o AS MATERIALIZED (
          SELECT user_id, epoch_us(ts) AS t,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
          FROM events),
        s AS (SELECT user_id, t, rn,
                     CASE WHEN rn = 1
                            OR t - lag(t) OVER (PARTITION BY user_id
                                                ORDER BY rn) > 1800000000
                          THEN 1 ELSE 0 END AS brk
              FROM o),
        s2 AS (SELECT user_id, t,
                      sum(brk) OVER (PARTITION BY user_id ORDER BY rn) AS sid
               FROM s),
        sess AS MATERIALIZED (
          SELECT user_id, sid, min(t) AS st, max(t) AS en
          FROM s2 GROUP BY 1, 2),
        b AS (SELECT st * 2 AS k, 1 AS d FROM sess
              UNION ALL SELECT en * 2 + 1, -1 FROM sess),
        a AS (SELECT k, sum(d) AS d FROM b GROUP BY 1),
        run AS (SELECT sum(d) OVER (ORDER BY k) AS conc FROM a)
        SELECT CAST((SELECT count(*) FROM sess) AS BIGINT) AS n_sessions,
               CAST(max(conc) AS BIGINT) AS peak_concurrent
        FROM run
    """
    oracles["dup_leakage_matrix"] = r"""
        WITH d AS MATERIALIZED (
          SELECT doc_id, regexp_extract_all(text, '\S+') AS s FROM documents),
        w AS MATERIALIZED (
          SELECT DISTINCT doc_id,
                 s[i] || ' ' || s[i + 1] || ' ' || s[i + 2] AS sh
          FROM d, unnest(generate_series(1, len(s) - 2)) AS g(i)),
        sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM w GROUP BY 1),
        inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                         CAST(count(*) AS BIGINT) AS n_inter
                  FROM w a JOIN w b ON a.sh = b.sh AND a.doc_id < b.doc_id
                  GROUP BY 1, 2),
        sel AS (SELECT i.id_a, i.id_b
                FROM inter i
                JOIN sz sa ON sa.doc_id = i.id_a
                JOIN sz sb ON sb.doc_id = i.id_b
                WHERE (1000000 * i.n_inter) // (sa.n + sb.n - i.n_inter)
                      >= 500000),
        m AS (SELECT least(da.source, db.source) AS source_a,
                     greatest(da.source, db.source) AS source_b
              FROM sel
              JOIN documents da ON da.doc_id = sel.id_a
              JOIN documents db ON db.doc_id = sel.id_b)
        SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs
        FROM m GROUP BY 1, 2
    """
    oracles["activity_decile_conversion"] = """
        WITH pu AS MATERIALIZED (
          SELECT user_id, count(*) AS n_events,
                 sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS n_purch
          FROM events GROUP BY 1),
        r AS (SELECT user_id, n_purch,
                     ((row_number() OVER (ORDER BY n_events, user_id) - 1)
                      * 10) // (count(*) OVER ()) AS decile
              FROM pu)
        SELECT CAST(decile AS BIGINT) AS decile,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(sum(CASE WHEN n_purch > 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_converted,
               CAST((1000000 * sum(CASE WHEN n_purch > 0 THEN 1 ELSE 0 END))
                    // count(*) AS BIGINT) AS conv_ppm
        FROM r GROUP BY 1
    """
    oracles["cohort_revenue_matrix"] = """
        WITH p AS MATERIALIZED (
          SELECT o_custkey,
                 CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                      AS BIGINT) AS month,
                 CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
          FROM orders),
        f AS (SELECT o_custkey, min(month) AS cohort FROM p GROUP BY 1)
        SELECT f.cohort AS cohort_month,
               p.month - f.cohort AS offset_months,
               CAST(sum(p.cents) AS BIGINT) AS revenue_cents
        FROM p JOIN f ON f.o_custkey = p.o_custkey
        GROUP BY 1, 2
    """
    oracles["distinctive_terms"] = r"""
        WITH w AS MATERIALIZED (
          SELECT source, unnest(regexp_extract_all(text, '\S+')) AS word
          FROM documents),
        p AS MATERIALIZED (
          SELECT source, word, CAST(count(*) AS HUGEINT) AS c
          FROM w GROUP BY 1, 2),
        wt AS (SELECT word, sum(c) AS cw FROM p GROUP BY 1),
        st AS (SELECT source, sum(c) AS ns FROM p GROUP BY 1),
        tt AS (SELECT sum(c) AS n FROM p),
        r AS (SELECT p.source, p.word, CAST(p.c AS BIGINT) AS c,
                     CAST((p.c * tt.n * 1000000) // (st.ns * wt.cw)
                          AS BIGINT) AS ratio_ppm
              FROM p
              JOIN wt ON wt.word = p.word
              JOIN st ON st.source = p.source
              CROSS JOIN tt),
        k AS (SELECT *, row_number() OVER (PARTITION BY source
                                           ORDER BY ratio_ppm DESC,
                                                    word ASC) AS rn
              FROM r)
        SELECT source, word, c, ratio_ppm FROM k WHERE rn <= 3
    """
    oracles["session_depth_survival"] = """
        WITH o AS MATERIALIZED (
          SELECT user_id, epoch_us(ts) AS t,
                 row_number() OVER (PARTITION BY user_id ORDER BY ts) AS rn
          FROM events),
        s AS (SELECT user_id, rn,
                     CASE WHEN rn = 1
                            OR t - lag(t) OVER (PARTITION BY user_id
                                                ORDER BY rn) > 1800000000
                          THEN 1 ELSE 0 END AS brk
              FROM o),
        s2 AS (SELECT user_id,
                      sum(brk) OVER (PARTITION BY user_id ORDER BY rn) AS sid
               FROM s),
        sz AS MATERIALIZED (
          SELECT user_id, sid, count(*) AS ssize FROM s2 GROUP BY 1, 2),
        t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM sz),
        ks AS (SELECT * FROM (VALUES (1), (2), (3), (4), (5)) AS v(k))
        SELECT CAST(ks.k AS BIGINT) AS k,
               CAST(sum(CASE WHEN sz.ssize >= ks.k THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_ge_k,
               CAST((1000000 * sum(CASE WHEN sz.ssize >= ks.k
                                        THEN 1 ELSE 0 END)) // t.total
                    AS BIGINT) AS share_ppm
        FROM ks CROSS JOIN sz CROSS JOIN t
        GROUP BY ks.k, t.total
    """
    oracles["q3_shipping_priority"] = """
        WITH r AS (
          SELECT l_orderkey,
                 CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                     * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
          FROM lineitem
          WHERE l_shipdate > TIMESTAMP '1996-06-01'
          GROUP BY 1)
        SELECT o.o_orderkey,
               CAST(epoch_us(o.o_orderdate) // 86400000000 AS BIGINT) AS o_day,
               r.revenue_cents
        FROM r
        JOIN orders o ON o.o_orderkey = r.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
                       AND c.c_mktsegment = 'AUTOMOBILE'
        WHERE o.o_orderdate < TIMESTAMP '1996-06-01'
        ORDER BY r.revenue_cents DESC, o.o_orderkey
        LIMIT 10
    """
    oracles["q4_late_priority_counts"] = """
        WITH m AS (
          SELECT l_orderkey, max(epoch_us(l_shipdate)) AS ms
          FROM lineitem GROUP BY 1)
        SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_late
        FROM orders o
        JOIN m ON m.l_orderkey = o.o_orderkey
        WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
          AND m.ms > epoch_us(o.o_orderdate) + 2592000000000
        GROUP BY 1
    """
    oracles["q14_promo_revenue"] = """
        WITH l AS (
          SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT)
                   AS ym,
                 CAST(floor(l_extendedprice * (1.0 - l_discount)
                            * 100.0 + 0.5) AS BIGINT) AS cents,
                 l_partkey
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1997-01-01')
        SELECT ym,
               CAST(sum(cents) AS BIGINT) AS total_cents,
               CAST(sum(CASE WHEN p.p_type = 'PROMO' THEN cents ELSE 0 END)
                    AS BIGINT) AS promo_cents,
               CAST((1000000 * sum(CASE WHEN p.p_type = 'PROMO' THEN cents
                                        ELSE 0 END)) // sum(cents)
                    AS BIGINT) AS promo_ppm
        FROM l JOIN part p ON p.p_partkey = l.l_partkey
        GROUP BY 1
    """
    oracles["q18_big_quantity_orders"] = """
        WITH s AS (
          SELECT l_orderkey,
                 CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT))
                      AS BIGINT) AS total_qty
          FROM lineitem GROUP BY 1
          HAVING sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) > 240)
        SELECT o.o_orderkey, c.c_name, s.total_qty,
               CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT) AS o_cents
        FROM s
        JOIN orders o ON o.o_orderkey = s.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        ORDER BY s.total_qty DESC, o.o_orderkey
        LIMIT 20
    """
    # Integer power iteration replayed as an unrolled CTE: P in ppm
    # (per-cell floor), v0 uniform micro, each step sums per-term
    # floors — identical arithmetic to the driver-side loop.
    oracles["markov_stationary"] = """
        WITH e AS MATERIALIZED (
          SELECT user_id, event_type,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM events),
        t AS MATERIALIZED (
          SELECT a.event_type AS prev, b.event_type AS next,
                 CAST(count(*) AS BIGINT) AS n
          FROM e a JOIN e b ON b.user_id = a.user_id AND b.rn = a.rn + 1
          GROUP BY 1, 2),
        rs AS (SELECT prev, sum(n) AS s FROM t GROUP BY 1),
        p AS MATERIALIZED (
          SELECT t.prev, t.next, (1000000 * t.n) // rs.s AS p
          FROM t JOIN rs ON rs.prev = t.prev),
        ty AS (SELECT DISTINCT event_type FROM events),
        kk AS (SELECT count(*) AS k FROM ty),
        v0 AS (SELECT event_type, 1000000 // kk.k AS v
               FROM ty CROSS JOIN kk),
        v1 AS (SELECT p.next AS event_type,
                      sum((v0.v * p.p) // 1000000) AS v
               FROM v0 JOIN p ON p.prev = v0.event_type GROUP BY 1),
        v2 AS (SELECT p.next AS event_type,
                      sum((v1.v * p.p) // 1000000) AS v
               FROM v1 JOIN p ON p.prev = v1.event_type GROUP BY 1),
        v3 AS (SELECT p.next AS event_type,
                      sum((v2.v * p.p) // 1000000) AS v
               FROM v2 JOIN p ON p.prev = v2.event_type GROUP BY 1)
        SELECT ty.event_type, CAST(coalesce(v3.v, 0) AS BIGINT) AS v3
        FROM ty LEFT JOIN v3 ON v3.event_type = ty.event_type
    """
    oracles["ttr_by_length_decile"] = r"""
        WITH vc AS (
          SELECT n_chars AS v, count(*) AS c FROM documents GROUP BY 1),
        cdf AS (
          SELECT v, CAST(sum(c) OVER (ORDER BY v) - c AS BIGINT) AS lt
          FROM vc),
        tot AS (SELECT count(*) AS n FROM documents),
        b AS MATERIALIZED (
          SELECT d.text,
                 CAST(least(cdf.lt * 10 // tot.n, 9) AS BIGINT) AS bucket
          FROM documents d JOIN cdf ON d.n_chars = cdf.v CROSS JOIN tot),
        w AS (SELECT bucket, unnest(regexp_extract_all(text, '\S+')) AS word
              FROM b)
        SELECT bucket,
               CAST(count(*) AS BIGINT) AS total_words,
               CAST(count(DISTINCT word) AS BIGINT) AS distinct_words,
               CAST((1000000 * count(DISTINCT word)) // count(*)
                    AS BIGINT) AS ttr_ppm
        FROM w GROUP BY 1
    """
    oracles["scd2_type_intervals"] = """
        WITH o AS MATERIALIZED (
          SELECT user_id, event_type, epoch_us(ts) AS t,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM events),
        m AS (SELECT *, CASE WHEN rn = 1
                               OR event_type <> lag(event_type)
                                  OVER (PARTITION BY user_id ORDER BY rn)
                             THEN 1 ELSE 0 END AS brk
              FROM o),
        g AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
                                       ORDER BY rn) AS island_idx
              FROM m),
        i AS (SELECT user_id, island_idx, min(event_type) AS event_type,
                     min(t) AS start_us, count(*) AS n_events
              FROM g GROUP BY 1, 2),
        j AS (SELECT *, coalesce(lead(start_us)
                                 OVER (PARTITION BY user_id
                                       ORDER BY island_idx), -1) AS end_us
              FROM i)
        SELECT user_id, CAST(island_idx AS BIGINT) AS island_idx,
               event_type, CAST(start_us AS BIGINT) AS start_us,
               CAST(end_us AS BIGINT) AS end_us,
               CAST(n_events AS BIGINT) AS n_events
        FROM j
        ORDER BY n_events DESC, user_id, island_idx
        LIMIT 50
    """
    oracles["user_net_drawdown"] = """
        WITH o AS MATERIALIZED (
          SELECT user_id,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                 * (CASE event_type WHEN 'purchase' THEN 1
                                    WHEN 'error' THEN -1
                                    ELSE 0 END) AS flow,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM events),
        c AS (SELECT user_id, rn,
                     sum(flow) OVER (PARTITION BY user_id
                                     ORDER BY rn) AS cum
              FROM o),
        r AS (SELECT user_id, cum,
                     max(cum) OVER (PARTITION BY user_id
                                    ORDER BY rn) AS peak
              FROM c),
        d AS (SELECT user_id,
                     CAST(max(peak - cum) AS BIGINT) AS drawdown_cents
              FROM r GROUP BY 1),
        f AS (SELECT user_id, CAST(sum(flow) AS BIGINT) AS final_cents
              FROM o GROUP BY 1)
        SELECT d.user_id, d.drawdown_cents, f.final_cents
        FROM d JOIN f USING (user_id)
        ORDER BY d.drawdown_cents DESC, d.user_id
        LIMIT 20
    """
    oracles["embedding_covariance"] = """
        WITH e AS MATERIALIZED (
          SELECT vec_id,
                 CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000.0
                            + 0.5) AS BIGINT) AS q,
                 generate_subscripts(embedding, 1) AS dim
          FROM embeddings)
        SELECT CAST(a.dim AS BIGINT) AS i, CAST(b.dim AS BIGINT) AS j,
               CAST(sum(a.q * b.q) AS BIGINT) AS s
        FROM e a JOIN e b ON b.vec_id = a.vec_id AND b.dim >= a.dim
        GROUP BY 1, 2
    """
    _cms_cell = lambda tok_expr, r_expr: (  # noqa: E731
        f"({_md5_u64_sql(f'md5(CAST({r_expr} AS VARCHAR) || chr(58) || {tok_expr})')} % 1024)"
    )
    oracles["cms_token_counts"] = rf"""
        WITH w AS MATERIALIZED (
          SELECT unnest(regexp_extract_all(text, '\S+')) AS tok
          FROM documents),
        tc AS MATERIALIZED (
          SELECT tok, CAST(count(*) AS BIGINT) AS true_c
          FROM w GROUP BY 1),
        top AS MATERIALIZED (
          SELECT tok, true_c FROM tc
          ORDER BY true_c DESC, tok LIMIT 10),
        rws AS (SELECT * FROM (VALUES (0), (1), (2), (3)) r(r)),
        cells AS MATERIALIZED (
          SELECT r.r AS rw, {_cms_cell('w.tok', 'r.r')} AS cell,
                 CAST(count(*) AS BIGINT) AS c
          FROM w CROSS JOIN rws r GROUP BY 1, 2),
        est AS (
          SELECT t.tok, min(c.c) AS est_c
          FROM top t
          CROSS JOIN rws r
          JOIN cells c ON c.rw = r.r
                      AND c.cell = {_cms_cell('t.tok', 'r.r')}
          GROUP BY 1)
        SELECT t.tok AS token, t.true_c,
               CAST(e.est_c AS BIGINT) AS est_c,
               CAST(e.est_c - t.true_c AS BIGINT) AS over_c
        FROM top t JOIN est e ON e.tok = t.tok
    """
    oracles["skew_audit_events"] = f"""
        WITH uc AS MATERIALIZED (
          SELECT user_id, CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1),
        b AS (
          SELECT CAST({_md5_u64_sql("md5('u' || CAST(user_id AS VARCHAR))")}
                      % 32 AS BIGINT) AS bucket, c
          FROM uc)
        SELECT bucket,
               CAST(sum(c) AS BIGINT) AS n_rows,
               CAST(count(*) AS BIGINT) AS n_users,
               CAST(max(c) AS BIGINT) AS max_c,
               CAST((1000000 * max(c)) // sum(c) AS BIGINT) AS top_share_ppm
        FROM b GROUP BY 1
    """
    oracles["median_value_by_type"] = """
        WITH o AS (
          SELECT event_type,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
          FROM events),
        q AS (
          SELECT event_type,
                 unnest([25, 50, 75]) AS q_pct,
                 unnest([quantile_cont(cents, 0.25),
                         quantile_cont(cents, 0.5),
                         quantile_cont(cents, 0.75)]) AS v
          FROM o GROUP BY event_type)
        SELECT event_type, CAST(q_pct AS BIGINT) AS q_pct,
               CAST(floor(v * 1000000.0 + 0.5) AS BIGINT) AS value_micro
        FROM q
    """
    oracles["top2_margin_by_type"] = """
        WITH tot AS MATERIALIZED (
          SELECT event_type, user_id,
                 CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                      AS BIGINT) AS cents
          FROM events GROUP BY 1, 2),
        r AS (SELECT *, row_number() OVER (PARTITION BY event_type
                                           ORDER BY cents DESC,
                                                    user_id ASC) AS rn
              FROM tot)
        SELECT event_type,
               CAST(max(CASE WHEN rn = 1 THEN user_id END) AS BIGINT)
                 AS top_user,
               CAST(max(CASE WHEN rn = 1 THEN cents END) AS BIGINT)
                 AS top_cents,
               CAST(coalesce(max(CASE WHEN rn = 2 THEN user_id END), -1)
                    AS BIGINT) AS runner_user,
               CAST(coalesce(max(CASE WHEN rn = 2 THEN cents END), -1)
                    AS BIGINT) AS runner_cents,
               CAST(CASE WHEN max(CASE WHEN rn = 2 THEN cents END)
                              IS NULL THEN -1
                         ELSE max(CASE WHEN rn = 1 THEN cents END)
                              - max(CASE WHEN rn = 2 THEN cents END)
                    END AS BIGINT) AS margin_cents
        FROM r WHERE rn <= 2 GROUP BY 1
    """
    oracles["debounce_events"] = """
        WITH o AS MATERIALIZED (
          SELECT user_id, event_type, epoch_us(ts) AS t,
                 row_number() OVER (PARTITION BY user_id, event_type
                                    ORDER BY ts, event_id) AS rn
          FROM events),
        k AS (SELECT event_type,
                     CASE WHEN rn = 1
                            OR t - lag(t) OVER (PARTITION BY user_id,
                                                             event_type
                                                ORDER BY rn) > 300000000
                          THEN 1 ELSE 0 END AS kept
              FROM o)
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_total,
               CAST(sum(kept) AS BIGINT) AS n_kept,
               CAST((1000000 * sum(kept)) // count(*) AS BIGINT) AS kept_ppm
        FROM k GROUP BY 1
    """
    oracles["embedding_top_dims"] = """
        WITH e AS MATERIALIZED (
          SELECT vec_id,
                 CAST(unnest(embedding) AS DOUBLE) AS v,
                 generate_subscripts(embedding, 1) AS dim
          FROM embeddings),
        r AS (SELECT *, row_number() OVER (PARTITION BY vec_id
                                           ORDER BY v DESC, dim ASC) AS rk
              FROM e)
        SELECT vec_id, CAST(rk AS BIGINT) AS rank, CAST(dim AS BIGINT) AS dim,
               CAST(floor(v * 1000000.0 + 0.5) AS BIGINT) AS val_micro
        FROM r WHERE rk <= 3
    """
    oracles["lang_impurity_by_source"] = """
        WITH p AS (
          SELECT source, lang, CAST(count(*) AS HUGEINT) AS c
          FROM documents GROUP BY 1, 2),
        s AS (SELECT source, sum(c) AS n, sum(c * c) AS ss FROM p GROUP BY 1)
        SELECT source, CAST(n AS BIGINT) AS n_docs,
               CAST(1000000 - (1000000 * ss) // (n * n) AS BIGINT)
                 AS impurity_ppm
        FROM s
    """
    oracles["join_size_estimate"] = """
        WITH ca AS (SELECT c_custkey AS k, CAST(count(*) AS BIGINT) AS ca
                    FROM customer GROUP BY 1),
        cb AS (SELECT o_custkey AS k, CAST(count(*) AS BIGINT) AS cb
               FROM orders GROUP BY 1),
        p1 AS (SELECT ca.ca * cb.cb AS p FROM ca JOIN cb USING (k)),
        oa AS (SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS ca
               FROM orders GROUP BY 1),
        ob AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS cb
               FROM lineitem GROUP BY 1),
        p2 AS (SELECT oa.ca * ob.cb AS p FROM oa JOIN ob USING (k))
        SELECT 'customer_orders' AS pair,
               CAST(sum(p) AS BIGINT) AS est_rows,
               CAST(count(*) AS BIGINT) AS n_keys,
               CAST(max(p) AS BIGINT) AS max_key_rows
        FROM p1
        UNION ALL
        SELECT 'orders_lineitem',
               CAST(sum(p) AS BIGINT), CAST(count(*) AS BIGINT),
               CAST(max(p) AS BIGINT)
        FROM p2
    """
    oracles["business_day_latency"] = """
        WITH fs AS (
          SELECT l_orderkey,
                 min(epoch_us(l_shipdate) // 86400000000) AS ship_day
          FROM lineitem GROUP BY 1),
        o AS (SELECT o_orderkey, o_orderpriority,
                     epoch_us(o_orderdate) // 86400000000 AS o_day
              FROM orders),
        j AS (SELECT o.o_orderpriority,
                     (5 * ((fs.ship_day + 3) // 7)
                      + least((fs.ship_day + 3) % 7, 5))
                   - (5 * ((o.o_day + 3) // 7)
                      + least((o.o_day + 3) % 7, 5)) AS bd
              FROM o JOIN fs ON fs.l_orderkey = o.o_orderkey)
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(max(bd) AS BIGINT) AS max_bd,
               CAST(floor(1000000.0 * sum(bd) / count(*)) AS BIGINT)
                 AS mean_bd_micro
        FROM j GROUP BY 1
    """
    oracles["kendall_even_odd"] = """
        WITH pcounts AS (
          SELECT user_id,
                 (epoch_us(ts) // 86400000000) % 2 AS parity,
                 count(*) AS c
          FROM events GROUP BY 1, 2),
        u AS (SELECT DISTINCT user_id FROM events),
        w AS MATERIALIZED (
          SELECT u.user_id,
                 coalesce(max(CASE WHEN parity = 0 THEN c END), 0) AS x,
                 coalesce(max(CASE WHEN parity = 1 THEN c END), 0) AS y
          FROM u LEFT JOIN pcounts p ON p.user_id = u.user_id
          GROUP BY 1),
        pr AS (
          SELECT CASE WHEN (a.x - b.x) * (a.y - b.y) > 0 THEN 1 ELSE 0 END
                   AS co,
                 CASE WHEN (a.x - b.x) * (a.y - b.y) < 0 THEN 1 ELSE 0 END
                   AS di
          FROM w a JOIN w b ON a.user_id < b.user_id)
        SELECT CAST((SELECT count(*) FROM w) AS BIGINT) AS n_users,
               CAST(sum(co) AS BIGINT) AS concordant,
               CAST(sum(di) AS BIGINT) AS discordant,
               CAST(CASE WHEN sum(co) + sum(di) = 0 THEN 0
                         ELSE (1000000 * sum(co)) // (sum(co) + sum(di))
                    END AS BIGINT) AS conc_ppm
        FROM pr
    """
    oracles["trimmed_mean_by_type"] = """
        WITH o AS (
          SELECT event_type,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
          FROM events),
        r AS (SELECT event_type, cents,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY cents) AS rn,
                     count(*) OVER (PARTITION BY event_type) AS n
              FROM o)
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_used,
               CAST((1000000 * sum(cents)) // count(*) AS BIGINT)
                 AS trimmed_mean_micro
        FROM r WHERE rn > n // 10 AND rn <= n - n // 10
        GROUP BY 1
    """
    oracles["rle_runs_orders"] = """
        WITH r AS (
          SELECT o_orderpriority,
                 lag(o_orderpriority) OVER (ORDER BY o_orderkey) AS prev
          FROM orders)
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN prev IS NULL
                               OR prev <> o_orderpriority
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_runs
        FROM r GROUP BY 1
    """
    oracles["partition_manifest_orders"] = """
        SELECT CAST(year(o_orderdate) * 100 + month(o_orderdate)
                    AS BIGINT) AS ym,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(min(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS min_cents,
               CAST(max(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS max_cents,
               CAST(count(DISTINCT epoch_us(o_orderdate) // 86400000000)
                    AS BIGINT) AS n_days
        FROM orders GROUP BY 1
    """
    oracles["wow_by_weekday"] = """
        WITH d AS MATERIALIZED (
          SELECT epoch_us(ts) // 86400000000 AS day,
                 CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                      AS BIGINT) AS cents
          FROM events GROUP BY 1)
        SELECT CAST(a.day AS BIGINT) AS day, a.cents,
               b.cents AS prev_cents,
               CAST(a.cents - b.cents AS BIGINT) AS diff_cents
        FROM d a JOIN d b ON b.day = a.day - 7
    """
    oracles["theil_sen_daily"] = """
        WITH d AS MATERIALIZED (
          SELECT epoch_us(ts) // 86400000000 AS day,
                 CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                      AS BIGINT) AS cents
          FROM events GROUP BY 1),
        p AS (
          SELECT (CAST(b.cents AS DOUBLE) - a.cents)
                 / (CAST(b.day AS DOUBLE) - a.day) AS slope,
                 a.day AS i, b.day AS j
          FROM d a JOIN d b ON b.day > a.day),
        r AS (SELECT slope,
                     row_number() OVER (ORDER BY slope, i, j) AS rn,
                     count(*) OVER () AS m
              FROM p)
        SELECT CAST((SELECT count(*) FROM d) AS BIGINT) AS n_days,
               CAST(m AS BIGINT) AS n_pairs,
               CAST(floor(slope * 1000000.0 + 0.5) AS BIGINT) AS slope_micro
        FROM r WHERE rn = (m + 1) // 2
    """
    oracles["q6_forecast_revenue"] = """
        SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100.0
                                   + 0.5) AS BIGINT)) AS BIGINT)
                 AS revenue_cents,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount >= 0.05 AND l_discount <= 0.07
          AND l_quantity < 24
    """
    oracles["q10_returned_revenue"] = """
        WITH rev AS (
          SELECT l_orderkey,
                 CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                     * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                   AS cents
          FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1),
        pc2 AS (
          SELECT o.o_custkey, CAST(sum(rev.cents) AS BIGINT) AS lost_cents
          FROM rev JOIN orders o ON o.o_orderkey = rev.l_orderkey
          GROUP BY 1)
        SELECT pc2.o_custkey AS c_custkey, c.c_name, pc2.lost_cents,
               CAST(floor(c.c_acctbal * 100.0 + 0.5) AS BIGINT)
                 AS acctbal_cents
        FROM pc2 JOIN customer c ON c.c_custkey = pc2.o_custkey
        ORDER BY pc2.lost_cents DESC, pc2.o_custkey
        LIMIT 20
    """
    oracles["q13_custdist"] = """
        WITH pc2 AS (
          SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
          FROM orders GROUP BY 1),
        d AS (SELECT n_orders, CAST(count(*) AS BIGINT) AS n_cust
              FROM pc2 GROUP BY 1),
        z AS (SELECT CAST(0 AS BIGINT) AS n_orders,
                     CAST((SELECT count(*) FROM customer)
                          - (SELECT count(*) FROM pc2) AS BIGINT) AS n_cust)
        SELECT * FROM d
        UNION ALL
        SELECT * FROM z WHERE n_cust > 0
    """
    oracles["q15_top_supplier"] = """
        WITH ps AS (
          SELECT l_suppkey,
                 CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                     * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                   AS revenue_cents
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY 1),
        m AS (SELECT max(revenue_cents) AS mx FROM ps)
        SELECT ps.l_suppkey AS s_suppkey, s.s_name, ps.revenue_cents
        FROM ps
        JOIN m ON ps.revenue_cents = m.mx
        JOIN supplier s ON s.s_suppkey = ps.l_suppkey
    """
    oracles["minhash_pr_eval"] = rf"""
        WITH {_minhash_cte_sql()},
        mh_cand AS MATERIALIZED (
          SELECT id_a, id_b FROM est
          WHERE CAST(eq AS DOUBLE) / 64.0 >= 0.5),
        d2 AS MATERIALIZED (
          SELECT doc_id, regexp_extract_all(text, '\S+') AS s
          FROM documents),
        w2 AS MATERIALIZED (
          SELECT DISTINCT doc_id,
                 s[i] || ' ' || s[i + 1] || ' ' || s[i + 2] AS sh
          FROM d2, unnest(generate_series(1, len(s) - 2)) AS g2(i)),
        sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
               FROM w2 GROUP BY 1),
        inter AS (SELECT a2.doc_id AS id_a, b2.doc_id AS id_b,
                         CAST(count(*) AS BIGINT) AS n_inter
                  FROM w2 a2 JOIN w2 b2 ON a2.sh = b2.sh
                                       AND a2.doc_id < b2.doc_id
                  GROUP BY 1, 2),
        truth AS MATERIALIZED (
          SELECT i.id_a, i.id_b
          FROM inter i
          JOIN sz sa ON sa.doc_id = i.id_a
          JOIN sz sb ON sb.doc_id = i.id_b
          WHERE (1000000 * i.n_inter) // (sa.n + sb.n - i.n_inter)
                >= 500000),
        hit AS (SELECT count(*) AS h
                FROM mh_cand c JOIN truth t ON t.id_a = c.id_a
                                           AND t.id_b = c.id_b),
        nc AS (SELECT count(*) AS c FROM mh_cand),
        nt AS (SELECT count(*) AS t FROM truth)
        SELECT CAST(nc.c AS BIGINT) AS n_cand,
               CAST(nt.t AS BIGINT) AS n_truth,
               CAST(hit.h AS BIGINT) AS n_hit,
               CAST(CASE WHEN nc.c = 0 THEN 0
                         ELSE (1000000 * hit.h) // nc.c END AS BIGINT)
                 AS precision_ppm,
               CAST(CASE WHEN nt.t = 0 THEN 0
                         ELSE (1000000 * hit.h) // nt.t END AS BIGINT)
                 AS recall_ppm
        FROM nc CROSS JOIN nt CROSS JOIN hit
    """
    oracles["latency_slo_report"] = """
        WITH fs AS (
          SELECT l_orderkey,
                 min(epoch_us(l_shipdate) // 86400000000) AS ship_day
          FROM lineitem GROUP BY 1),
        j AS MATERIALIZED (
          SELECT o.o_orderpriority,
                 (5 * ((fs.ship_day + 3) // 7)
                  + least((fs.ship_day + 3) % 7, 5))
               - (5 * (((epoch_us(o.o_orderdate) // 86400000000) + 3) // 7)
                  + least(((epoch_us(o.o_orderdate) // 86400000000) + 3) % 7,
                          5)) AS bd
          FROM orders o JOIN fs ON fs.l_orderkey = o.o_orderkey)
        SELECT o_orderpriority, CAST(25 AS BIGINT) AS q_pct,
               CAST(quantile_disc(bd, 0.25) AS BIGINT) AS value
        FROM j GROUP BY 1
        UNION ALL
        SELECT o_orderpriority, CAST(50 AS BIGINT),
               CAST(quantile_disc(bd, 0.5) AS BIGINT)
        FROM j GROUP BY 1
        UNION ALL
        SELECT o_orderpriority, CAST(75 AS BIGINT),
               CAST(quantile_disc(bd, 0.75) AS BIGINT)
        FROM j GROUP BY 1
    """
    oracles["revenue_waterfall_mom"] = """
        WITH mo AS MATERIALIZED (
          SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                      AS BIGINT) AS m,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                      AS BIGINT) AS cents
          FROM orders GROUP BY 1)
        SELECT b.m,
               CAST(b.cents - a.cents AS BIGINT) AS delta_cents,
               CAST(floor((CAST(b.n AS DOUBLE) - a.n)
                          * (CAST(a.cents AS DOUBLE) / a.n) + 0.5)
                    AS BIGINT) AS volume_effect_cents,
               CAST(floor(CAST(b.n AS DOUBLE)
                          * (CAST(b.cents AS DOUBLE) / b.n
                             - CAST(a.cents AS DOUBLE) / a.n) + 0.5)
                    AS BIGINT) AS mix_effect_cents
        FROM mo a JOIN mo b ON b.m = a.m + 1
    """
    oracles["iterative_median_price"] = """
        WITH c AS (
          SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
          FROM orders)
        SELECT CAST(quantile_disc(cents, 0.5) AS BIGINT) AS median_cents,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM c
    """
    oracles["bucketed_cojoin_revenue"] = """
        SELECT o.o_orderpriority,
               CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                   * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                 AS revenue_cents
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        GROUP BY 1
    """
    oracles["hll_union_users"] = f"""
        WITH h AS (
          SELECT {_hex_bigint_sql("md5(CAST(user_id AS VARCHAR))", 1, 8)} AS x
          FROM events WHERE user_id IS NOT NULL
          UNION ALL
          SELECT {_hex_bigint_sql("md5(CAST(o_custkey AS VARCHAR))", 1, 8)}
          FROM orders WHERE o_custkey IS NOT NULL),
        b AS (SELECT x // 4194304 AS bucket, x % 4194304 AS w FROM h)
        SELECT CAST(bucket AS BIGINT) AS bucket,
               CAST(MAX(CASE WHEN w = 0 THEN 23
                             ELSE 23 - length(bin(w)) END) AS BIGINT)
                 AS max_rho
        FROM b GROUP BY bucket
    """
    oracles["inversion_count_purchases"] = """
        WITH p AS MATERIALIZED (
          SELECT event_id, epoch_us(ts) AS t,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
          FROM events WHERE event_type = 'purchase'),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n_rows FROM p),
        inv AS (
          SELECT CAST(count(*) AS BIGINT) AS inversions
          FROM p a JOIN p b
            ON (a.t < b.t OR (a.t = b.t AND a.event_id < b.event_id))
           AND a.cents > b.cents)
        SELECT n.n_rows,
               CAST(n.n_rows * (n.n_rows - 1) // 2 AS BIGINT) AS n_pairs,
               inv.inversions
        FROM n CROSS JOIN inv
    """
    oracles["checksum_tree_events"] = f"""
        WITH r AS (
          SELECT epoch_us(ts) // 86400000000 AS day, {_row_h15} AS h
          FROM events),
        leaves AS MATERIALIZED (
          SELECT CAST(day AS BIGINT) AS part,
                 CAST(count(*) AS BIGINT) AS n_rows,
                 CAST(CAST(sum(h) AS HUGEINT) % 9223372036854775783
                      AS BIGINT) AS checksum
          FROM r GROUP BY 1),
        root AS (
          SELECT CAST(-1 AS BIGINT) AS part,
                 CAST(sum(n_rows) AS BIGINT) AS n_rows,
                 CAST(CAST(sum({_hex_bigint_sql(
                     "md5('d' || CAST(part AS VARCHAR) || ':' "
                     "|| CAST(checksum AS VARCHAR))", 1, 15)})
                      AS HUGEINT) % 9223372036854775783 AS BIGINT)
                   AS checksum
          FROM leaves)
        SELECT * FROM leaves UNION ALL SELECT * FROM root
    """
    oracles["max_gap_endpoints"] = """
        WITH o AS MATERIALIZED (
          SELECT user_id, epoch_us(ts) AS t,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM events),
        g AS (SELECT user_id, t AS start_us,
                     lead(t) OVER (PARTITION BY user_id ORDER BY rn)
                       AS end_us
              FROM o),
        h AS (SELECT user_id, start_us, end_us,
                     end_us - start_us AS gap_us,
                     row_number() OVER (PARTITION BY user_id
                                        ORDER BY end_us - start_us DESC,
                                                 start_us ASC) AS rk
              FROM g WHERE end_us IS NOT NULL)
        SELECT user_id, CAST(gap_us AS BIGINT) AS gap_us,
               CAST(start_us AS BIGINT) AS start_us,
               CAST(end_us AS BIGINT) AS end_us
        FROM h WHERE rk = 1
    """
    oracles["ivm_join_view"] = """
        WITH per AS (
          SELECT l_orderkey,
                 CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                     * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                   AS cents,
                 CAST(count(*) AS BIGINT) AS n
          FROM lineitem GROUP BY 1),
        fullv AS (
          SELECT o.o_orderpriority,
                 CAST(sum(per.cents) AS BIGINT) AS revenue_cents,
                 CAST(sum(per.n) AS BIGINT) AS n_items
          FROM per JOIN orders o ON o.o_orderkey = per.l_orderkey
          GROUP BY 1),
        dl AS (
          SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS delta_items
          FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
          WHERE l.l_shipdate >= TIMESTAMP '2000-01-01'
          GROUP BY 1)
        SELECT f.o_orderpriority, f.revenue_cents, f.n_items,
               CAST(coalesce(dl.delta_items, 0) AS BIGINT) AS delta_items
        FROM fullv f LEFT JOIN dl USING (o_orderpriority)
    """
    oracles["purchase_density_window"] = """
        WITH p AS MATERIALIZED (
          SELECT event_id, epoch_us(ts) AS t
          FROM events WHERE event_type = 'purchase')
        SELECT a.event_id, CAST(count(b.event_id) AS BIGINT) AS n_nearby
        FROM p a
        LEFT JOIN p b ON b.event_id <> a.event_id
                     AND b.t > a.t - 3600000000
                     AND b.t < a.t + 3600000000
        GROUP BY 1
    """
    oracles["orders_fully_shipped"] = """
        WITH per AS (
          SELECT l_orderkey, count(*) AS n_total,
                 sum(CASE WHEN l_shipdate < TIMESTAMP '1999-01-01'
                          THEN 1 ELSE 0 END) AS n_early
          FROM lineitem GROUP BY 1)
        SELECT o.o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_fully_shipped
        FROM per JOIN orders o ON o.o_orderkey = per.l_orderkey
        WHERE per.n_total = per.n_early
        GROUP BY 1
    """
    oracles["densify_user_days"] = """
        WITH d AS MATERIALIZED (
          SELECT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
        span AS (SELECT min(day) AS lo, max(day) AS hi FROM d),
        u AS (SELECT DISTINCT user_id FROM d),
        grid AS (
          SELECT u.user_id,
                 unnest(generate_series(span.lo, span.hi)) AS day
          FROM u CROSS JOIN span),
        c AS (SELECT user_id, day, CAST(count(*) AS BIGINT) AS n
              FROM d GROUP BY 1, 2),
        j AS (SELECT g.user_id, g.day, coalesce(c.n, 0) AS n_events
              FROM grid g LEFT JOIN c USING (user_id, day)),
        f AS (SELECT *,
                     max(CASE WHEN n_events > 0 THEN day END)
                       OVER (PARTITION BY user_id ORDER BY day) AS la
              FROM j)
        SELECT user_id, CAST(day AS BIGINT) AS day,
               CAST(n_events AS BIGINT) AS n_events,
               CAST(coalesce(la, -1) AS BIGINT) AS last_active_day
        FROM f
    """
    oracles["order_backlog_monthly"] = """
        WITH placed AS (
          SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                      AS BIGINT) AS m,
                 CAST(count(*) AS BIGINT) AS n_placed
          FROM orders GROUP BY 1),
        fs AS (SELECT l_orderkey, min(l_shipdate) AS fd
               FROM lineitem GROUP BY 1),
        shipped AS (
          SELECT CAST(year(fd) * 12 + month(fd) - 1 AS BIGINT) AS m,
                 CAST(count(*) AS BIGINT) AS n_shipped
          FROM fs GROUP BY 1),
        allm AS (
          SELECT coalesce(p.m, s.m) AS m,
                 coalesce(p.n_placed, 0) AS n_placed,
                 coalesce(s.n_shipped, 0) AS n_shipped
          FROM placed p FULL OUTER JOIN shipped s ON s.m = p.m)
        SELECT m, CAST(n_placed AS BIGINT) AS n_placed,
               CAST(n_shipped AS BIGINT) AS n_shipped,
               CAST(sum(n_placed) OVER (ORDER BY m)
                    - sum(n_shipped) OVER (ORDER BY m) AS BIGINT) AS backlog
        FROM allm
    """
    oracles["kfold_value_stats"] = f"""
        WITH e AS (
          SELECT {_md5_u64_sql("md5('f' || CAST(event_id AS VARCHAR))")} % 5
                   AS fold,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
          FROM events),
        f AS (SELECT CAST(fold AS BIGINT) AS fold,
                     CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(cents) AS BIGINT) AS sum_cents
              FROM e GROUP BY 1),
        t AS (SELECT CAST(sum(n) AS BIGINT) AS tn,
                     CAST(sum(sum_cents) AS BIGINT) AS ts
              FROM f)
        SELECT f.fold, f.n, f.sum_cents,
               CAST(floor(1000000.0 * (t.ts - f.sum_cents)
                          / (t.tn - f.n)) AS BIGINT) AS loo_mean_micro
        FROM f CROSS JOIN t
    """
    oracles["rbo_rank_overlap"] = """
        WITH span AS (
          SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
          FROM events),
        p AS (SELECT user_id,
                     CASE WHEN epoch_us(ts) >= span.mid THEN 1 ELSE 0 END
                       AS half,
                     CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
              FROM events CROSS JOIN span
              WHERE event_type = 'purchase'),
        tot AS (SELECT half, user_id, CAST(sum(cents) AS BIGINT) AS cents
                FROM p GROUP BY 1, 2),
        r AS (SELECT *, row_number() OVER (PARTITION BY half
                                           ORDER BY cents DESC,
                                                    user_id) AS rk
              FROM tot),
        t20 AS MATERIALIZED (SELECT half, user_id, rk FROM r WHERE rk <= 20),
        dd AS (SELECT unnest(generate_series(1, 20)) AS d),
        ov AS (SELECT dd.d,
                      (SELECT count(*)
                       FROM t20 a JOIN t20 b ON b.user_id = a.user_id
                       WHERE a.half = 0 AND b.half = 1
                         AND a.rk <= dd.d AND b.rk <= dd.d) AS x
               FROM dd)
        SELECT CAST(20 AS BIGINT) AS depth,
               CAST((SELECT count(*)
                     FROM t20 a JOIN t20 b ON b.user_id = a.user_id
                     WHERE a.half = 0 AND b.half = 1) AS BIGINT)
                 AS overlap_at_20,
               CAST(sum((CAST(ov.x AS BIGINT) * 1000000000)
                        // (ov.d * (CAST(1 AS BIGINT) << ov.d)))
                    AS BIGINT) AS rbo_ppb
        FROM ov
    """
    oracles["discount_elasticity_by_brand"] = """
        WITH l AS (
          SELECT p.p_brand,
                 CAST(floor(l_discount * 1000000.0 + 0.5) AS BIGINT) AS x,
                 CAST(floor(l_quantity + 0.5) AS BIGINT) AS y
          FROM lineitem JOIN part p ON p.p_partkey = lineitem.l_partkey),
        s AS (SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(x) AS BIGINT) AS sx,
                     CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x * y) AS BIGINT) AS sxy,
                     CAST(sum(x * x) AS BIGINT) AS sxx
              FROM l GROUP BY 1)
        SELECT p_brand, n,
               CAST(floor(1000000000.0
                          * (CAST(n AS DOUBLE) * sxy
                             - CAST(sx AS DOUBLE) * sy)
                          / (CAST(n AS DOUBLE) * sxx
                             - CAST(sx AS DOUBLE) * sx)) AS BIGINT)
                 AS slope_nano
        FROM s
    """
    oracles["threshold_algorithm_topk"] = """
        WITH t AS (
          SELECT user_id,
                 CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                      AS BIGINT) AS cents,
                 CAST(count(*) AS BIGINT) AS n
          FROM events GROUP BY 1)
        SELECT user_id, CAST(cents + 100 * n AS BIGINT) AS score_cents
        FROM t ORDER BY score_cents DESC, user_id LIMIT 5
    """
    oracles["mutual_best_pairs"] = """
        WITH cnt AS MATERIALIZED (
          SELECT o.o_custkey, l.l_partkey, CAST(count(*) AS BIGINT) AS n
          FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
          GROUP BY 1, 2),
        bp AS (SELECT *, row_number() OVER (PARTITION BY o_custkey
                                            ORDER BY n DESC,
                                                     l_partkey) AS r1
               FROM cnt),
        bc AS (SELECT *, row_number() OVER (PARTITION BY l_partkey
                                            ORDER BY n DESC,
                                                     o_custkey) AS r2
               FROM cnt)
        SELECT bp.o_custkey AS c_custkey, bp.l_partkey AS p_partkey, bp.n
        FROM bp JOIN bc ON bc.o_custkey = bp.o_custkey
                       AND bc.l_partkey = bp.l_partkey
        WHERE bp.r1 = 1 AND bc.r2 = 1
    """
    oracles["bigram_lm_holdout_acc"] = """
        WITH span AS (
          SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid
          FROM events),
        e AS MATERIALIZED (
          SELECT user_id, event_type, epoch_us(ts) AS t,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM events),
        pr AS MATERIALIZED (
          SELECT a.event_type AS prev, b.event_type AS nxt,
                 CASE WHEN b.t >= span.mid THEN 1 ELSE 0 END AS is_eval
          FROM e a
          JOIN e b ON b.user_id = a.user_id AND b.rn = a.rn + 1
          CROSS JOIN span),
        tr AS (SELECT prev, nxt, count(*) AS c
               FROM pr WHERE is_eval = 0 GROUP BY 1, 2),
        t3 AS (SELECT prev, nxt
               FROM (SELECT *, row_number() OVER (PARTITION BY prev
                                                  ORDER BY c DESC,
                                                           nxt) AS rk
                     FROM tr)
               WHERE rk <= 3),
        ev2 AS (SELECT prev, nxt FROM pr WHERE is_eval = 1),
        h AS (SELECT count(*) AS n_hit
              FROM ev2 JOIN t3 ON t3.prev = ev2.prev
                              AND t3.nxt = ev2.nxt),
        ne AS (SELECT count(*) AS n_eval FROM ev2)
        SELECT CAST(ne.n_eval AS BIGINT) AS n_eval,
               CAST(h.n_hit AS BIGINT) AS n_hit,
               CAST(CASE WHEN ne.n_eval = 0 THEN 0
                         ELSE (1000000 * h.n_hit) // ne.n_eval
                    END AS BIGINT) AS acc_ppm
        FROM ne CROSS JOIN h
    """
    oracles["vocab_saturation_doc"] = r"""
        WITH w AS (
          SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS word
          FROM documents),
        m AS (SELECT word, min(doc_id) AS fd FROM w GROUP BY 1)
        SELECT CAST(count(*) AS BIGINT) AS vocab_size,
               CAST(quantile_disc(fd, 0.9) AS BIGINT) AS doc90
        FROM m
    """
    oracles["earliest_purchasers"] = """
        WITH f AS (
          SELECT user_id, min(epoch_us(ts)) AS first_us
          FROM events WHERE event_type = 'purchase' GROUP BY 1)
        SELECT user_id, CAST(first_us AS BIGINT) AS first_us
        FROM f ORDER BY first_us, user_id LIMIT 10
    """
    oracles["q19_disjunctive_revenue"] = """
        SELECT CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount)
                                   * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                 AS revenue_cents,
               CAST(count(*) AS BIGINT) AS n_rows
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#1'
               AND l.l_quantity >= 1 AND l.l_quantity <= 10)
           OR (p.p_brand = 'Brand#2'
               AND l.l_quantity >= 10 AND l.l_quantity <= 20)
           OR (p.p_brand = 'Brand#3'
               AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """
    oracles["next_greater_distance"] = """
        WITH o AS MATERIALIZED (
          SELECT user_id, event_id,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM events)
        SELECT a.event_id,
               CAST(coalesce(min(b.rn) - a.rn, -1) AS BIGINT)
                 AS steps_to_greater
        FROM o a
        LEFT JOIN o b ON b.user_id = a.user_id
                     AND b.rn > a.rn AND b.cents > a.cents
        GROUP BY a.event_id, a.rn
    """
    # The audit flags are the assertion: a correct WAP run publishes
    # with both matches = 1; the oracle recomputes the source-side
    # count + checksum independently.
    oracles["wap_publish_events"] = f"""
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(CAST(sum(h) AS HUGEINT) % 9223372036854775783 AS BIGINT)
                 AS checksum,
               CAST(1 AS BIGINT) AS rows_match,
               CAST(1 AS BIGINT) AS checksum_match,
               CAST(1 AS BIGINT) AS published
        FROM (SELECT {_row_h15} AS h FROM events)
    """
    oracles["time_travel_read"] = f"""
        SELECT CAST(1 AS BIGINT) AS version,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(CAST(sum(h) AS HUGEINT) % 9223372036854775783 AS BIGINT)
                 AS checksum
        FROM (SELECT {_row_h15} AS h FROM events WHERE event_id % 2 = 0)
        UNION ALL
        SELECT CAST(2 AS BIGINT), CAST(count(*) AS BIGINT),
               CAST(CAST(sum(h) AS HUGEINT) % 9223372036854775783 AS BIGINT)
        FROM (SELECT {_row_h15} AS h FROM events)
    """
    oracles["phrase_search"] = r"""
        WITH d AS (
          SELECT doc_id, regexp_extract_all(text, '\S+') AS ws
          FROM documents),
        m AS (
          SELECT doc_id
          FROM d, unnest(generate_series(1, len(ws) - 1)) g(i)
          WHERE ws[i] = 'hash' AND ws[i + 1] = 'table'),
        u AS (SELECT DISTINCT doc_id FROM m),
        n AS (SELECT count(*) AS c FROM u)
        SELECT u.doc_id, CAST(n.c AS BIGINT) AS n_matching_docs
        FROM u CROSS JOIN n
        ORDER BY u.doc_id LIMIT 10
    """
    oracles["delta_encoding_estimate"] = """
        WITH o AS (
          SELECT user_id, epoch_us(ts) AS t,
                 row_number() OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS rn
          FROM events),
        g AS (SELECT user_id,
                     t - lag(t) OVER (PARTITION BY user_id ORDER BY rn)
                       AS gap
              FROM o),
        b AS (SELECT CASE WHEN gap IS NULL THEN 8
                          WHEN gap = 0 THEN 1
                          ELSE (length(bin(gap)) + 6) // 7
                     END AS bytes
              FROM g)
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(8 * count(*) AS BIGINT) AS naive_bytes,
               CAST(sum(bytes) AS BIGINT) AS delta_bytes,
               CAST((1000000 * sum(bytes)) // (8 * count(*)) AS BIGINT)
                 AS ratio_ppm
        FROM b
    """
    oracles["decayed_type_counts"] = """
        WITH d AS (
          SELECT event_type, epoch_us(ts) // 86400000000 AS day
          FROM events),
        m AS (SELECT max(day) AS mx FROM d)
        SELECT event_type, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(1000000 >> ((m.mx - day) // 7)) AS BIGINT)
                 AS decayed_ppm
        FROM d CROSS JOIN m GROUP BY 1
    """
    oracles["k_anonymity_audit"] = """
        WITH u AS MATERIALIZED (
          SELECT user_id, min(epoch_us(ts)) // 86400000000 AS first_day
          FROM events GROUP BY 1),
        tc AS (SELECT user_id, event_type, count(*) AS c
               FROM events GROUP BY 1, 2),
        md AS (SELECT user_id, event_type AS modal_type
               FROM (SELECT *, row_number() OVER (PARTITION BY user_id
                                                  ORDER BY c DESC,
                                                           event_type) AS rk
                     FROM tc)
               WHERE rk = 1),
        cells AS (SELECT u.first_day, md.modal_type, count(*) AS sz
                  FROM u JOIN md USING (user_id) GROUP BY 1, 2)
        SELECT CAST(sum(sz) AS BIGINT) AS n_users,
               CAST(count(*) AS BIGINT) AS n_cells,
               CAST(min(sz) AS BIGINT) AS min_cell,
               CAST((1000000 * sum(CASE WHEN sz < 5 THEN sz ELSE 0 END))
                    // sum(sz) AS BIGINT) AS below_k5_ppm
        FROM cells
    """
    oracles["fd_violations"] = """
        WITH f1 AS (SELECT p_brand AS l, count(DISTINCT p_type) AS d
                    FROM part GROUP BY 1),
        f2 AS (SELECT p_name AS l, count(DISTINCT p_brand) AS d
               FROM part GROUP BY 1),
        f3 AS (SELECT o_custkey AS l, count(DISTINCT o_orderpriority) AS d
               FROM orders GROUP BY 1)
        SELECT 'p_brand->p_type' AS fd,
               CAST(count(*) AS BIGINT) AS n_lhs,
               CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_violating
        FROM f1
        UNION ALL
        SELECT 'p_name->p_brand', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT)
        FROM f2
        UNION ALL
        SELECT 'o_custkey->o_orderpriority', CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT)
        FROM f3
    """
    oracles["q5_local_supplier_volume"] = """
        SELECT n.n_name AS n_name,
               CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                                   * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
                 AS revenue_cents
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
                     AND c.c_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'ASIA'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY 1
    """
    oracles["q8_market_share"] = """
        WITH rev AS (
          SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
                 CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                            * 100.0 + 0.5) AS BIGINT) AS cents,
                 n.n_name AS supp_nation
          FROM lineitem l
          JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'ECONOMY'
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          JOIN nation n ON s.s_nationkey = n.n_nationkey
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN nation cn ON c.c_nationkey = cn.n_nationkey
          JOIN region r ON cn.n_regionkey = r.r_regionkey
          WHERE r.r_name = 'AMERICA'
            AND o.o_orderdate >= TIMESTAMP '1995-01-01'
            AND o.o_orderdate < TIMESTAMP '1997-01-01')
        SELECT o_year,
               CAST(sum(cents) AS BIGINT) AS total_cents,
               CAST(sum(CASE WHEN supp_nation = 'NATION_6'
                             THEN cents ELSE 0 END) AS BIGINT)
                 AS target_cents,
               CAST((1000000 * sum(CASE WHEN supp_nation = 'NATION_6'
                                        THEN cents ELSE 0 END))
                    // sum(cents) AS BIGINT) AS mkt_share_ppm
        FROM rev GROUP BY 1
    """
    oracles["q17_small_quantity_revenue"] = """
        WITH pk AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#13'),
        st AS (SELECT l_partkey,
                      sum(CAST(l_quantity AS BIGINT)) AS sq,
                      count(*) AS cnt
               FROM lineitem
               WHERE l_partkey IN (SELECT p_partkey FROM pk)
               GROUP BY 1)
        SELECT CAST(count(*) AS BIGINT) AS n_rows,
               CAST(COALESCE(sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5)
                                      AS BIGINT)), 0) // 7 AS BIGINT)
                 AS avg_yearly_cents
        FROM lineitem l
        JOIN st ON l.l_partkey = st.l_partkey
        WHERE CAST(l.l_quantity AS BIGINT) * 5 * st.cnt < st.sq
    """
    oracles["q22_dormant_balance"] = """
        WITH cb AS (
          SELECT c_custkey, CAST(c_nationkey AS BIGINT) AS c_nationkey,
                 CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_cents
          FROM customer),
        stats AS (
          SELECT sum(bal_cents) AS s, count(*) AS n
          FROM cb WHERE bal_cents > 0)
        SELECT cb.c_nationkey,
               CAST(count(*) AS BIGINT) AS n_cust,
               CAST(sum(cb.bal_cents) AS BIGINT) AS total_bal_cents
        FROM cb, stats
        WHERE cb.bal_cents * stats.n > stats.s
          AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = cb.c_custkey
              AND o.o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY 1
    """
    oracles["q9_profit_proxy"] = """
        SELECT n.n_name AS n_name,
               CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               CAST(sum(CAST(floor(l.l_extendedprice * (1.0 - l.l_discount)
                                   * 100.0 + 0.5) AS BIGINT)
                        - CAST(floor(p.p_retailprice * 100.0 + 0.5) AS BIGINT)
                          * CAST(l.l_quantity AS BIGINT)) AS BIGINT)
                 AS profit_cents
        FROM lineitem l
        JOIN part p ON l.l_partkey = p.p_partkey
                   AND p.p_name LIKE '%widget%'
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    """
    oracles["q11_important_parts"] = """
        WITH pv AS (
          SELECT l.l_partkey AS l_partkey,
                 sum(CAST(l.l_quantity AS BIGINT))
                   * CAST(floor(p.p_retailprice * 100.0 + 0.5) AS BIGINT)
                   AS value_cents
          FROM lineitem l
          JOIN part p ON l.l_partkey = p.p_partkey
          GROUP BY l.l_partkey, p.p_retailprice)
        SELECT l_partkey, CAST(value_cents AS BIGINT) AS value_cents
        FROM pv
        WHERE value_cents * (SELECT count(*) FROM pv)
              > (SELECT sum(value_cents) FROM pv)
    """
    oracles["q20_promo_shippers"] = """
        WITH sq AS (
          SELECT l.l_suppkey AS l_suppkey,
                 sum(CAST(l.l_quantity AS BIGINT)) AS qty
          FROM lineitem l
          JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
          WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
            AND l.l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY 1)
        SELECT s.s_name AS s_name, n.n_name AS n_name,
               CAST(sq.qty AS BIGINT) AS qty
        FROM sq
        JOIN supplier s ON sq.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE sq.qty * (SELECT count(*) FROM sq) > (SELECT sum(qty) FROM sq)
    """
    oracles["q21_dominant_supplier"] = """
        WITH osq AS (
          SELECT l_orderkey, l_suppkey,
                 sum(CAST(l_quantity AS BIGINT)) AS qty
          FROM lineitem GROUP BY 1, 2),
        tot AS (
          SELECT l_orderkey, sum(qty) AS total, count(*) AS n_supp
          FROM osq GROUP BY 1)
        SELECT o.l_suppkey AS l_suppkey,
               CAST(count(*) AS BIGINT) AS n_orders
        FROM osq o JOIN tot t ON o.l_orderkey = t.l_orderkey
        WHERE t.n_supp >= 2 AND o.qty * 2 > t.total
        GROUP BY 1
        ORDER BY n_orders DESC, l_suppkey ASC
        LIMIT 10
    """
    oracles["filter_ablation"] = f"""
        WITH rep AS ({oracles["repetition_rules"]}),
        j AS (SELECT r.*, d.n_chars
              FROM rep r JOIN documents d USING (doc_id)),
        f AS (SELECT doc_id,
                CASE WHEN keep_top_word = 0 THEN 1 ELSE 0 END AS f_top,
                CASE WHEN keep_dup_bigram = 0 THEN 1 ELSE 0 END AS f_dup,
                CASE WHEN n_words < 20 THEN 1 ELSE 0 END AS f_short,
                CASE WHEN n_chars > 450 THEN 1 ELSE 0 END AS f_long
              FROM j),
        t AS (SELECT *, f_top + f_dup + f_short + f_long AS tot FROM f)
        SELECT 'top_word' AS rule,
               CAST(sum(f_top) AS BIGINT) AS n_flagged,
               CAST(sum(CASE WHEN f_top = 1 AND tot = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_only FROM t
        UNION ALL
        SELECT 'dup_bigram', CAST(sum(f_dup) AS BIGINT),
               CAST(sum(CASE WHEN f_dup = 1 AND tot = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) FROM t
        UNION ALL
        SELECT 'too_short', CAST(sum(f_short) AS BIGINT),
               CAST(sum(CASE WHEN f_short = 1 AND tot = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) FROM t
        UNION ALL
        SELECT 'too_long', CAST(sum(f_long) AS BIGINT),
               CAST(sum(CASE WHEN f_long = 1 AND tot = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) FROM t
        UNION ALL
        SELECT 'ANY',
               CAST(sum(CASE WHEN tot > 0 THEN 1 ELSE 0 END) AS BIGINT),
               CAST(sum(CASE WHEN tot = 1 THEN 1 ELSE 0 END) AS BIGINT)
        FROM t
    """
    oracles["encoding_plan_orders"] = """
        WITH e AS (
          SELECT 'o_orderstatus' AS col,
                 CAST(o_orderstatus AS VARCHAR) AS value FROM orders
          UNION ALL
          SELECT 'o_orderpriority', CAST(o_orderpriority AS VARCHAR)
          FROM orders
          UNION ALL
          SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders),
        s AS (SELECT col, count(*) AS n_rows, count(DISTINCT value) AS ndv
              FROM e GROUP BY 1)
        SELECT col, CAST(n_rows AS BIGINT) AS n_rows,
               CAST(ndv AS BIGINT) AS ndv,
               CAST(CASE WHEN ndv <= 1 THEN 0
                    ELSE length(bin(ndv - 1)) END AS BIGINT) AS index_bits,
               CASE WHEN ndv * 100 <= n_rows THEN 'dict' ELSE 'plain' END
                 AS plan
        FROM s
    """
    oracles["q12_returnflag_priority"] = """
        SELECT l_returnflag,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1997-01-01'
        GROUP BY l_returnflag
    """
    oracles["padding_waste_sweep"] = """
        WITH t AS (
          SELECT CAST(length(string_split(text, ' ')) AS BIGINT) AS ntok
          FROM documents),
        l AS (SELECT CAST(unnest([64, 128, 256]) AS BIGINT) AS max_len),
        p AS (SELECT max_len, ntok,
                     (ntok + max_len - 1) // max_len AS nseq
              FROM t CROSS JOIN l),
        s AS (SELECT max_len, count(*) AS n_docs, sum(nseq) AS n_seqs,
                     sum(nseq * max_len - ntok) AS n_pad
              FROM p GROUP BY max_len)
        SELECT CAST(max_len AS BIGINT) AS max_len,
               CAST(n_docs AS BIGINT) AS n_docs,
               CAST(n_seqs AS BIGINT) AS n_seqs,
               CAST(n_pad AS BIGINT) AS n_pad,
               CAST((n_pad * 1000000) // (n_seqs * max_len) AS BIGINT)
                 AS pad_ppm
        FROM s
    """
    oracles["compaction_bins_orders"] = """
        WITH d AS (
          SELECT o_orderdate, CAST(count(*) AS BIGINT) AS n_rows
          FROM orders GROUP BY 1),
        c AS (
          SELECT o_orderdate, n_rows,
                 COALESCE(sum(n_rows) OVER (
                   ORDER BY o_orderdate
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS cum_before
          FROM d)
        SELECT CAST(cum_before // 2000 AS BIGINT) AS bin,
               CAST(count(*) AS BIGINT) AS n_files,
               CAST(sum(n_rows) AS BIGINT) AS total_rows,
               min(o_orderdate) AS first_day,
               max(o_orderdate) AS last_day
        FROM c GROUP BY 1
    """
    oracles["boilerplate_prefix_share"] = """
        WITH p AS (
          SELECT source,
                 array_to_string(list_slice(string_split(text, ' '), 1, 3),
                                 ' ') AS prefix3
          FROM documents),
        c AS (SELECT source, prefix3, count(*) AS cnt
              FROM p GROUP BY 1, 2),
        r AS (SELECT *, row_number() OVER (
                PARTITION BY source ORDER BY cnt DESC, prefix3) AS rn
              FROM c),
        t AS (SELECT source, count(*) AS n_docs FROM documents GROUP BY 1)
        SELECT r.source, r.prefix3, CAST(r.cnt AS BIGINT) AS mode_count,
               CAST(t.n_docs AS BIGINT) AS n_docs,
               CAST((r.cnt * 1000000) // t.n_docs AS BIGINT) AS share_ppm
        FROM r JOIN t ON r.source = t.source WHERE r.rn = 1
    """
    oracles["mannwhitney_u_value"] = """
        WITH s AS (
          SELECT event_type, value FROM events
          WHERE event_type IN ('click', 'purchase')),
        r AS (
          SELECT event_type,
                 2 * rank() OVER (ORDER BY value)
                   + count(*) OVER (PARTITION BY value) - 1 AS avg2
          FROM s),
        a AS (
          SELECT
            CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT)
              AS n_click,
            CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
              AS n_purchase,
            CAST(sum(avg2) FILTER (WHERE event_type = 'click') AS BIGINT)
              AS r1_times2
          FROM r)
        SELECT n_click, n_purchase, r1_times2,
               CAST(r1_times2 - n_click * (n_click + 1) AS BIGINT)
                 AS u_times2
        FROM a
    """
    oracles["simpson_flip_audit"] = """
        WITH g AS (
          SELECT o_orderpriority,
                 CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT)
                   AS n_f,
                 CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT)
                   AS n_o,
                 CAST(sum(CASE WHEN o_orderstatus = 'F' THEN
                   CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS s_f,
                 CAST(sum(CASE WHEN o_orderstatus = 'O' THEN
                   CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS s_o
          FROM orders WHERE o_orderstatus IN ('F', 'O')
          GROUP BY o_orderpriority),
        t AS (
          SELECT sum(s_f) AS ts_f, sum(n_o) AS tn_o,
                 sum(s_o) AS ts_o, sum(n_f) AS tn_f
          FROM g)
        SELECT g.o_orderpriority, g.n_f, g.n_o,
               CAST(sign(g.s_f * g.n_o - g.s_o * g.n_f) AS BIGINT) AS sign,
               CAST(sign(t.ts_f * t.tn_o - t.ts_o * t.tn_f) AS BIGINT)
                 AS overall_sign,
               CAST(CASE WHEN sign(g.s_f * g.n_o - g.s_o * g.n_f) <> 0
                         AND sign(g.s_f * g.n_o - g.s_o * g.n_f)
                             <> sign(t.ts_f * t.tn_o - t.ts_o * t.tn_f)
                    THEN 1 ELSE 0 END AS BIGINT) AS flipped
        FROM g CROSS JOIN t
    """
    oracles["cdc_upsert_orders"] = """
        WITH log AS (
          SELECT o_orderkey, o_orderstatus AS status, 1 AS seq FROM orders
          UNION ALL
          SELECT o_orderkey, 'U', 2 FROM orders WHERE o_orderkey % 7 = 0),
        r AS (
          SELECT status,
                 row_number() OVER (PARTITION BY o_orderkey
                                    ORDER BY seq DESC) AS rn
          FROM log)
        SELECT status, CAST(count(*) AS BIGINT) AS n_orders
        FROM r WHERE rn = 1 GROUP BY status
    """
    oracles["max_token_run"] = """
        WITH t AS (
          SELECT doc_id, string_split(text, ' ') AS l FROM documents),
        u AS (
          SELECT doc_id, unnest(l) AS tok,
                 unnest(list_transform(l, (x, i) -> i)) AS pos
          FROM t),
        m AS (
          SELECT doc_id, pos,
                 CASE WHEN lag(tok) OVER (PARTITION BY doc_id ORDER BY pos)
                      = tok THEN 0 ELSE 1 END AS brk
          FROM u),
        g AS (
          SELECT doc_id, pos,
                 sum(brk) OVER (PARTITION BY doc_id ORDER BY pos) AS grp
          FROM m),
        runs AS (
          SELECT doc_id, grp, count(*) AS run FROM g GROUP BY 1, 2),
        best AS (
          SELECT doc_id, CAST(max(run) AS BIGINT) AS max_run
          FROM runs GROUP BY doc_id)
        SELECT doc_id, max_run FROM best
        ORDER BY max_run DESC, doc_id LIMIT 20
    """
    oracles["hash_bucket_uniformity"] = f"""
        WITH h AS (
          SELECT {_md5_u64_sql("md5('bkt:' || CAST(event_id AS VARCHAR))")}
                   % 64 AS b
          FROM events),
        c AS (SELECT b, count(*) AS o FROM h GROUP BY b),
        s AS (
          SELECT g.b, COALESCE(c.o, 0) AS o
          FROM (SELECT unnest(range(64)) AS b) g
          LEFT JOIN c ON g.b = c.b),
        t AS (SELECT sum(o) AS n FROM s)
        SELECT CAST(t.n AS BIGINT) AS n_rows,
               CAST(64 AS BIGINT) AS n_buckets,
               CAST(min(s.o) AS BIGINT) AS min_bucket_n,
               CAST(max(s.o) AS BIGINT) AS max_bucket_n,
               CAST(sum((s.o * 64 - t.n) * (s.o * 64 - t.n)) AS BIGINT)
                 AS chisq_num
        FROM s CROSS JOIN t GROUP BY t.n
    """
    oracles["token_budget_cap"] = """
        WITH t AS (
          SELECT source, doc_id,
                 CAST(length(string_split(text, ' ')) AS BIGINT) AS ntok
          FROM documents),
        c AS (
          SELECT source, ntok,
                 sum(ntok) OVER (PARTITION BY source ORDER BY doc_id) AS cum
          FROM t)
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs_kept,
               CAST(sum(ntok) AS BIGINT) AS tokens_kept
        FROM c WHERE cum <= 5000 GROUP BY source
    """
    oracles["cube_revenue"] = """
        WITH c AS (
          SELECT o_orderpriority, o_orderstatus,
                 CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
          FROM orders)
        SELECT COALESCE(o_orderpriority, 'ALL') AS o_orderpriority,
               COALESCE(o_orderstatus, 'ALL') AS o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(cents) AS BIGINT) AS revenue_cents
        FROM c GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """
    oracles["vacuum_plan_orders"] = """
        WITH days AS (
          SELECT CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS d,
                 CAST(count(*) AS BIGINT) AS n_rows
          FROM orders GROUP BY 1),
        v AS (
          SELECT d, n_rows,
                 CASE WHEN (d + 1) % 3 = 0 THEN 1 ELSE 0 END AS v1,
                 CASE WHEN (d + 2) % 3 = 0 THEN 2
                      WHEN (d + 1) % 3 = 0 THEN 1 ELSE 0 END AS v2,
                 CASE WHEN (d + 3) % 3 = 0 THEN 3
                      WHEN (d + 2) % 3 = 0 THEN 2
                      WHEN (d + 1) % 3 = 0 THEN 1 ELSE 0 END AS v3
          FROM days),
        live AS (
          SELECT d, v2 AS ver FROM v UNION SELECT d, v3 FROM v)
        SELECT CAST((SELECT count(*) FROM v) AS BIGINT) AS n_days,
               CAST((SELECT count(*) FROM live) AS BIGINT) AS n_live_files,
               CAST((SELECT count(*) FROM v WHERE v1 != v2 AND v1 != v3)
                 AS BIGINT) AS n_deletable,
               CAST(COALESCE((SELECT sum(n_rows) FROM v
                              WHERE v1 != v2 AND v1 != v3), 0) AS BIGINT)
                 AS rows_reclaimed
    """
    oracles["sorted_lcp_docs"] = """
        WITH s AS (
          SELECT doc_id, text,
                 lag(text) OVER (ORDER BY text, doc_id) AS prev
          FROM documents),
        p AS (SELECT doc_id, text, prev FROM s WHERE prev IS NOT NULL),
        e AS (
          SELECT p.doc_id,
                 COALESCE(max(CASE
                   WHEN i <= least(length(p.text), length(p.prev))
                    AND substr(p.text, 1, CAST(i AS INT))
                        = substr(p.prev, 1, CAST(i AS INT))
                   THEN i END), 0) AS lcp
          FROM p CROSS JOIN generate_series(1, 1000) t(i)
          GROUP BY p.doc_id)
        SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_pairs,
               CAST(COALESCE(sum(lcp), 0) AS BIGINT) AS sum_lcp,
               CAST(COALESCE(max(lcp), 0) AS BIGINT) AS max_lcp,
               CAST(count(*) FILTER (WHERE lcp >= 40) AS BIGINT) AS n_ge_40
        FROM e
    """
    oracles["skew_join_user_age"] = """
        WITH d AS (
          SELECT user_id, event_type,
                 CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
          FROM events),
        f AS (SELECT user_id, min(day) AS first_day FROM d GROUP BY user_id)
        SELECT d.event_type,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(d.day - f.first_day) AS BIGINT) AS sum_age_days
        FROM d JOIN f USING (user_id)
        GROUP BY d.event_type
    """
    oracles["positional_delete_orders"] = """
        WITH b AS (
          SELECT o_orderstatus,
                 CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS f,
                 CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
                 o_orderkey
          FROM orders),
        p AS (
          SELECT o_orderstatus, f, cents,
                 row_number() OVER (PARTITION BY f ORDER BY o_orderkey) - 1
                   AS pos
          FROM b)
        SELECT o_orderstatus,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(cents) AS BIGINT) AS revenue_cents
        FROM p WHERE (f + pos) % 11 != 3
        GROUP BY o_orderstatus
    """
    oracles["isotonic_purchase_rate"] = """
        WITH g AS (
          SELECT (CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24) AS hour,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(count(*) FILTER (WHERE event_type = 'purchase')
                   AS BIGINT) AS s
          FROM events GROUP BY 1),
        iv AS (
          SELECT j.hour AS jx, k.hour AS kx,
                 sum(m.n) AS n, sum(m.s) AS s
          FROM g j JOIN g k ON j.hour <= k.hour
          JOIN g m ON m.hour BETWEEN j.hour AND k.hour
          GROUP BY 1, 2),
        mn AS (
          SELECT i.hour AS ix, v.jx,
                 min(v.s * 1.0 / v.n) AS mnavg
          FROM g i JOIN iv v ON v.jx <= i.hour AND v.kx >= i.hour
          GROUP BY 1, 2),
        fit AS (SELECT ix AS hour, max(mnavg) AS f FROM mn GROUP BY ix)
        SELECT g.hour, g.n, g.s,
               CAST(floor(g.s * 1000000.0 / g.n) AS BIGINT) AS rate_ppm,
               CAST(floor(f * 1000000.0) AS BIGINT) AS fitted_ppm
        FROM g JOIN fit USING (hour)
    """
    oracles["gmd_value_by_type"] = """
        WITH c AS (
          SELECT event_type,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v
          FROM events),
        r AS (SELECT event_type, v, CAST(count(*) AS BIGINT) AS cnt
              FROM c GROUP BY 1, 2),
        w AS (
          SELECT event_type, v, cnt,
                 sum(cnt) OVER (PARTITION BY event_type ORDER BY v)
                   - cnt AS cbefore,
                 sum(cnt) OVER (PARTITION BY event_type) AS n
          FROM r)
        SELECT event_type,
               CAST(max(n) AS BIGINT) AS n,
               CAST(sum(v * cnt * (2 * cbefore + cnt - n)) AS BIGINT)
                 AS sum_absdiff
        FROM w GROUP BY event_type
    """
    oracles["conformal_threshold"] = f"""
        WITH t AS (
          SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v,
                 ({_md5_u64_sql("md5('conf:' || CAST(event_id AS VARCHAR))")}
                   % 2 = 0) AS is_cal
          FROM events),
        c AS (
          SELECT v,
                 CAST(count(*) FILTER (WHERE is_cal) AS BIGINT) AS nc,
                 CAST(count(*) FILTER (WHERE NOT is_cal) AS BIGINT) AS nv
          FROM t GROUP BY v),
        tot AS (SELECT sum(nc) AS n_cal, sum(nv) AS n_val,
                       max(v) AS vmax FROM c),
        w AS (SELECT v, sum(nc) OVER (ORDER BY v) AS cum_c FROM c),
        thr AS (
          SELECT COALESCE(
                   (SELECT min(w.v) FROM w, tot
                    WHERE w.cum_c >= (9 * (tot.n_cal + 1) + 9) // 10),
                   (SELECT vmax FROM tot)) AS threshold)
        SELECT CAST(tot.n_cal AS BIGINT) AS n_cal,
               CAST(tot.n_val AS BIGINT) AS n_val,
               CAST(thr.threshold AS BIGINT) AS threshold,
               CAST((SELECT sum(nv) FROM c WHERE v <= thr.threshold)
                 AS BIGINT) AS covered,
               CAST((SELECT sum(nv) FROM c WHERE v <= thr.threshold)
                 * 1000000 // tot.n_val AS BIGINT) AS coverage_ppm
        FROM tot, thr
    """
    oracles["cross_lang_dups"] = r"""
        WITH h AS (
          SELECT md5(substr(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                            1, 80)) AS th,
                 lang
          FROM documents),
        p AS (SELECT th, count(*) AS n_docs,
                     count(DISTINCT lang) AS n_langs
              FROM h GROUP BY 1)
        SELECT th, CAST(n_docs AS BIGINT) AS n_docs,
               CAST(n_langs AS BIGINT) AS n_langs
        FROM p WHERE n_langs > 1
    """
    oracles["max_event_rate_per_user"] = """
        WITH e AS (SELECT user_id, epoch_us(ts) AS us FROM events)
        SELECT user_id, CAST(max(c) AS BIGINT) AS max_per_minute FROM (
          SELECT a.user_id, a.us, count(*) AS c
          FROM e a JOIN e b ON a.user_id = b.user_id
                           AND b.us >= a.us
                           AND b.us < a.us + 60000000
          GROUP BY 1, 2)
        GROUP BY 1
    """
    oracles["vocab_coverage_topk"] = r"""
        WITH t AS (
          SELECT unnest(regexp_extract_all(text, '\S+')) AS token
          FROM documents),
        c AS (SELECT token, count(*) AS n FROM t GROUP BY 1),
        r AS (SELECT n, row_number() OVER (ORDER BY n DESC, token) AS rn
              FROM c),
        tot AS (SELECT sum(n) AS total FROM c),
        ks AS (SELECT unnest([100, 1000, 10000]) AS k)
        SELECT CAST(ks.k AS BIGINT) AS k,
               CAST(coalesce(sum(r.n), 0) AS BIGINT) AS covered,
               CAST(1000000 * coalesce(sum(r.n), 0) // (SELECT total FROM tot)
                 AS BIGINT) AS covered_ppm
        FROM ks LEFT JOIN r ON r.rn <= ks.k
        GROUP BY ks.k
    """
    oracles["user_active_time"] = """
        WITH f AS (
          SELECT user_id, ts,
                 CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                              ORDER BY ts)
                           > INTERVAL '30 minutes' THEN 1 ELSE 0 END AS brk
          FROM events),
        s AS (SELECT user_id, ts,
                     sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS sid
              FROM f),
        per AS (SELECT user_id, sid,
                       epoch_us(max(ts)) - epoch_us(min(ts)) AS dur
                FROM s GROUP BY 1, 2)
        SELECT user_id, CAST(count(*) AS BIGINT) AS n_sessions,
               CAST(sum(dur) AS BIGINT) AS active_us
        FROM per GROUP BY 1
    """
    oracles["mcv_stats_orders"] = """
        WITH e AS (
          SELECT 'o_orderstatus' AS col,
                 CAST(o_orderstatus AS VARCHAR) AS value FROM orders
          UNION ALL
          SELECT 'o_orderpriority', CAST(o_orderpriority AS VARCHAR)
          FROM orders
          UNION ALL
          SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders),
        c AS (SELECT col, value, count(*) AS n FROM e GROUP BY 1, 2)
        SELECT col, value, CAST(n AS BIGINT) AS n FROM (
          SELECT col, value, n,
                 row_number() OVER (PARTITION BY col
                                    ORDER BY n DESC, value) AS rn
          FROM c) WHERE rn <= 5
    """
    oracles["blocklist_audit"] = """
        WITH t AS (SELECT unnest(['spark', 'slow', 'dup', 'big data'])
                     AS term)
        SELECT t.term,
               CAST(sum(CASE WHEN strpos(d.text, t.term) > 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
               CAST(sum((length(d.text)
                         - length(replace(d.text, t.term, '')))
                        // length(t.term)) AS BIGINT) AS n_occurrences
        FROM documents d, t
        GROUP BY 1
    """
    oracles["knn_mutual_rate"] = """
        WITH s AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings WHERE vec_id < 64),
        e AS (
          SELECT query_id, vec_id FROM (
            SELECT q.vec_id AS query_id, s.vec_id,
                   row_number() OVER (PARTITION BY q.vec_id
                     ORDER BY list_cosine_similarity(s.v, q.v) DESC,
                              s.vec_id) AS rn
            FROM s, s q WHERE s.vec_id != q.vec_id)
          WHERE rn <= 3)
        SELECT CAST(count(*) AS BIGINT) AS n_edges,
               CAST(sum(CASE WHEN EXISTS (
                      SELECT 1 FROM e r
                      WHERE r.query_id = e.vec_id
                        AND r.vec_id = e.query_id) THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_mutual,
               CAST(1000000 * sum(CASE WHEN EXISTS (
                      SELECT 1 FROM e r
                      WHERE r.query_id = e.vec_id
                        AND r.vec_id = e.query_id) THEN 1 ELSE 0 END)
                    // count(*) AS BIGINT) AS mutual_ppm
        FROM e
    """
    oracles["interpolate_user_days"] = """
        WITH d AS MATERIALIZED (
          SELECT user_id,
                 CAST(date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                      AS BIGINT) AS day,
                 sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS cents
          FROM events GROUP BY 1, 2),
        span AS (SELECT user_id, min(day) AS lo, max(day) AS hi
                 FROM d GROUP BY 1),
        grid AS (SELECT s.user_id, gg.day
                 FROM span s, unnest(generate_series(s.lo, s.hi)) AS gg(day)),
        j AS (SELECT g.user_id, g.day, d.cents
              FROM grid g LEFT JOIN d USING (user_id, day)),
        f AS (SELECT user_id, day, cents,
                last_value(CASE WHEN cents IS NOT NULL THEN day END
                           IGNORE NULLS) OVER w AS d_prev,
                last_value(cents IGNORE NULLS) OVER w AS v_prev,
                first_value(CASE WHEN cents IS NOT NULL THEN day END
                            IGNORE NULLS) OVER w2 AS d_next,
                first_value(cents IGNORE NULLS) OVER w2 AS v_next
              FROM j
              WINDOW w AS (PARTITION BY user_id ORDER BY day
                           ROWS UNBOUNDED PRECEDING),
                     w2 AS (PARTITION BY user_id ORDER BY day
                            ROWS BETWEEN CURRENT ROW
                                     AND UNBOUNDED FOLLOWING))
        SELECT user_id, CAST(day AS BIGINT) AS day,
               CAST(CASE WHEN cents IS NOT NULL THEN cents
                    ELSE v_prev
                       + ((v_next - v_prev) * (day - d_prev)
                          - (((v_next - v_prev) * (day - d_prev))
                              % (d_next - d_prev)
                             + (d_next - d_prev)) % (d_next - d_prev))
                         // (d_next - d_prev)
                    END AS BIGINT) AS cents,
               CAST(CASE WHEN cents IS NULL THEN 1 ELSE 0 END AS BIGINT)
                 AS interpolated
        FROM f
    """
    oracles["blocking_eval"] = f"""
        WITH truth AS ({oracles["jaccard_pair_join"]}),
        r AS (SELECT doc_id, n_chars,
                     lead(doc_id) OVER (ORDER BY n_chars, doc_id) AS nb_id,
                     lead(n_chars) OVER (ORDER BY n_chars, doc_id) AS nb_n
              FROM documents),
        cand AS (
          SELECT least(doc_id, nb_id) AS lo, greatest(doc_id, nb_id) AS hi
          FROM r WHERE nb_id IS NOT NULL AND abs(nb_n - n_chars) <= 2),
        tn AS (SELECT least(id_a, id_b) AS lo, greatest(id_a, id_b) AS hi
               FROM truth),
        m AS (SELECT (SELECT count(*) FROM cand) AS n_cand,
                     (SELECT count(*) FROM tn) AS n_truth,
                     (SELECT count(*) FROM cand JOIN tn USING (lo, hi))
                       AS n_hit,
                     (SELECT count(*) FROM documents) AS n)
        SELECT CAST(n_cand AS BIGINT) AS n_cand,
               CAST(n_truth AS BIGINT) AS n_truth,
               CAST(n_hit AS BIGINT) AS n_hit,
               CAST(CASE WHEN n_truth > 0
                    THEN 1000000 * n_hit // n_truth ELSE 0 END AS BIGINT)
                 AS completeness_ppm,
               CAST(CASE WHEN n * (n - 1) // 2 > 0
                    THEN 1000000 - 1000000 * n_cand // (n * (n - 1) // 2)
                    ELSE 0 END AS BIGINT) AS reduction_ppm
        FROM m
    """
    oracles["hard_negatives"] = """
        WITH q AS (SELECT vec_id AS query_id, label AS qlabel,
                          CAST(embedding AS DOUBLE[]) AS qv
                   FROM embeddings WHERE vec_id < 8)
        SELECT query_id, vec_id, cos_sim_micro FROM (
          SELECT q.query_id, e.vec_id,
            CAST(floor(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                              q.qv) * 1000000.0 + 0.5)
              AS BIGINT) AS cos_sim_micro,
            row_number() OVER (PARTITION BY q.query_id
              ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                              q.qv) DESC, e.vec_id) AS rn
          FROM embeddings e, q WHERE e.label != q.qlabel) WHERE rn <= 3
    """
    oracles["topk_users_with_other"] = """
        WITH p AS (
          SELECT event_type, user_id,
                 sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS cents
          FROM events GROUP BY 1, 2),
        r AS (
          SELECT event_type, user_id, cents,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY cents DESC, user_id) AS rn
          FROM p)
        SELECT event_type, CAST(user_id AS VARCHAR) AS who,
               CAST(cents AS BIGINT) AS cents
        FROM r WHERE rn <= 3
        UNION ALL
        SELECT event_type, 'OTHER' AS who, CAST(sum(cents) AS BIGINT) AS cents
        FROM r WHERE rn > 3 GROUP BY 1
    """
    oracles["quality_decile_review_rate"] = f"""
        WITH flag AS ({oracles["flagship_extraction"]}),
        b AS (SELECT quality_micro // 100000 AS band,
                     CASE WHEN needs_review THEN 1 ELSE 0 END AS nr
              FROM flag)
        SELECT CAST(band AS BIGINT) AS band,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(nr) AS BIGINT) AS n_review,
               CAST(1000000 * sum(nr) // count(*) AS BIGINT) AS review_ppm
        FROM b GROUP BY 1
    """
    oracles["daily_value_ohlc"] = """
        WITH r AS (
          SELECT event_type,
                 date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day,
                 ts, event_id,
                 CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v
          FROM events),
        o AS (
          SELECT event_type, day, v,
                 row_number() OVER (PARTITION BY event_type, day
                                    ORDER BY ts, event_id) AS rn_a,
                 row_number() OVER (PARTITION BY event_type, day
                                    ORDER BY ts DESC, event_id DESC) AS rn_d
          FROM r)
        SELECT a.event_type AS event_type, CAST(a.day AS BIGINT) AS day,
               CAST(op.v AS BIGINT) AS open_micro,
               CAST(a.high AS BIGINT) AS high_micro,
               CAST(a.low AS BIGINT) AS low_micro,
               CAST(cl.v AS BIGINT) AS close_micro
        FROM (SELECT event_type, day, max(v) AS high, min(v) AS low
              FROM r GROUP BY 1, 2) a
        JOIN (SELECT event_type, day, v FROM o WHERE rn_a = 1) op
          USING (event_type, day)
        JOIN (SELECT event_type, day, v FROM o WHERE rn_d = 1) cl
          USING (event_type, day)
    """
    oracles["script_mix_by_lang"] = """
        SELECT lang,
               CAST(sum(length(text)
                    - length(regexp_replace(text, '[а-яёА-ЯЁ]', '', 'g')))
                 AS BIGINT) AS n_cyr,
               CAST(sum(length(text)
                    - length(regexp_replace(text, '[A-Za-z]', '', 'g')))
                 AS BIGINT) AS n_lat,
               CAST(sum(length(text)
                    - length(regexp_replace(text, '[0-9]', '', 'g')))
                 AS BIGINT) AS n_dig,
               CAST(count(*) AS BIGINT) AS n_docs
        FROM documents GROUP BY 1
    """
    oracles["split_leakage_rate"] = rf"""
        WITH h AS (
          SELECT md5(substr(trim(regexp_replace(lower(text), '\s+', ' ', 'g')),
                            1, 80)) AS th,
                 CASE WHEN {_md5_unit_sql(
                     "md5('split:' || CAST(doc_id AS VARCHAR))")} < 0.8
                      THEN 1 ELSE 0 END AS is_train
          FROM documents),
        p AS (SELECT th, sum(is_train) AS n_train,
                     sum(1 - is_train) AS n_val
              FROM h GROUP BY 1)
        SELECT CAST(sum(n_val) AS BIGINT) AS n_val_docs,
               CAST(sum(CASE WHEN n_train > 0 THEN n_val ELSE 0 END)
                 AS BIGINT) AS n_leaked_docs,
               CAST(1000000 * sum(CASE WHEN n_train > 0 THEN n_val ELSE 0 END)
                    // sum(n_val) AS BIGINT) AS leak_ppm
        FROM p
    """
    oracles["bloom_semi_orders"] = """
        SELECT o_orderpriority,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS total_cents
        FROM orders
        WHERE o_custkey IN
              (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        GROUP BY 1
    """
    _cont_gh = _hex_bigint_sql(
        "md5(array_to_string(list_slice(ws, s, s + 2), ' '))", 1, 15
    )
    oracles["containment_pairs"] = f"""
        WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        pos AS (SELECT doc_id, ws,
                       unnest(generate_series(1, greatest(length(ws) - 2, 0)))
                         AS s
                FROM w),
        grams AS (SELECT DISTINCT doc_id, {_cont_gh} AS gh FROM pos),
        sz AS (SELECT doc_id, count(*) AS ng FROM grams GROUP BY 1),
        dfx AS (SELECT gh, count(*) AS df FROM grams GROUP BY 1),
        rare AS (SELECT gh FROM dfx WHERE df BETWEEN 2 AND 5),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                 FROM grams a JOIN grams b
                   ON a.gh = b.gh AND a.doc_id < b.doc_id
                 WHERE a.gh IN (SELECT gh FROM rare)),
        ix AS (SELECT c.id_a, c.id_b, count(*) AS inter
               FROM cand c
               JOIN grams ga ON ga.doc_id = c.id_a
               JOIN grams gb ON gb.doc_id = c.id_b AND gb.gh = ga.gh
               GROUP BY 1, 2),
        oriented AS (
          SELECT CASE WHEN sa.ng <= sb.ng THEN i.id_a ELSE i.id_b END
                   AS id_small,
                 CASE WHEN sa.ng <= sb.ng THEN i.id_b ELSE i.id_a END
                   AS id_big,
                 CASE WHEN sa.ng <= sb.ng THEN sa.ng ELSE sb.ng END
                   AS n_small,
                 i.inter
          FROM ix i JOIN sz sa ON sa.doc_id = i.id_a
                    JOIN sz sb ON sb.doc_id = i.id_b)
        SELECT id_small, id_big,
               CAST(n_small AS BIGINT) AS n_small,
               CAST(inter AS BIGINT) AS inter,
               CAST((1000000 * inter) // n_small AS BIGINT)
                 AS containment_ppm
        FROM oriented
        WHERE (1000000 * inter) // n_small >= 200000
    """
    # DSIR hashed-gram importance: recompute md5 buckets, integer odds
    # weights and per-doc occurrence scores from scratch (the
    # minhash-oracle discipline — SQL derives the identical feature
    # hash, so the weight table and the ranking are bit-equal).
    oracles["dsir_selection"] = f"""
        WITH toks AS (
          SELECT doc_id, lang, string_split(text, ' ') AS ts
          FROM documents),
        uni AS (SELECT doc_id, lang, unnest(ts) AS g FROM toks),
        bi AS (
          SELECT doc_id, lang,
                 ts[CAST(i AS BIGINT)] || ' ' || ts[CAST(i AS BIGINT) + 1]
                   AS g
          FROM (SELECT doc_id, lang, ts,
                       unnest(range(1, len(ts))) AS i
                FROM toks)),
        grams AS (SELECT * FROM uni UNION ALL SELECT * FROM bi),
        b AS (
          SELECT doc_id, lang,
                 CAST({_md5_u64_sql("md5(g)")} % 256 AS BIGINT) AS bucket
          FROM grams),
        cnt AS (
          SELECT bucket,
                 sum(CASE WHEN lang = 'de' THEN 1 ELSE 0 END) AS ct,
                 sum(CASE WHEN lang <> 'de' THEN 1 ELSE 0 END) AS cr
          FROM b GROUP BY bucket),
        w AS (SELECT bucket,
                     CAST(((ct + 1) * 1000000) // (cr + 1) AS BIGINT) AS wgt
              FROM cnt),
        s AS (
          SELECT doc_id, CAST(sum(wgt) AS BIGINT) AS score,
                 CAST(count(*) AS BIGINT) AS n_grams
          FROM b JOIN w USING (bucket)
          WHERE lang <> 'de' GROUP BY doc_id)
        SELECT doc_id, score, n_grams,
               CAST(score // n_grams AS BIGINT) AS avg_weight
        FROM s ORDER BY avg_weight DESC, doc_id LIMIT 50
    """
    # Z-order stats: the Morton interleave as an explicit 8-term
    # shift/mask polynomial per coordinate (the _simhash_oracle_sql
    # generated-arithmetic pattern).
    _morton = " + ".join(
        f"((qx // {1 << j}) % 2) * {1 << (2 * j)}"
        f" + ((qy // {1 << j}) % 2) * {1 << (2 * j + 1)}"
        for j in range(8)
    )
    oracles["zorder_stats_orders"] = f"""
        WITH src AS (
          SELECT o_custkey AS x,
                 CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS y
          FROM orders),
        span AS (SELECT min(x) AS lx, max(x) AS hx,
                        min(y) AS ly, max(y) AS hy FROM src),
        q AS (
          SELECT x, y,
                 CAST(((x - lx) * 256) // (hx - lx + 1) AS BIGINT) AS qx,
                 CAST(((y - ly) * 256) // (hy - ly + 1) AS BIGINT) AS qy
          FROM src, span),
        z AS (SELECT x, y, qx, qy, ({_morton}) AS zv FROM q),
        lay AS (
          SELECT 'zorder' AS layout, zv // 4096 AS file_id, x, y FROM z
          UNION ALL
          SELECT 'linear' AS layout, qx // 16 AS file_id, x, y FROM z)
        SELECT layout, CAST(file_id AS BIGINT) AS file_id,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(min(x) AS BIGINT) AS min_x,
               CAST(max(x) AS BIGINT) AS max_x,
               CAST(min(y) AS BIGINT) AS min_y,
               CAST(max(y) AS BIGINT) AS max_y
        FROM lay GROUP BY layout, file_id
        ORDER BY layout, file_id
    """
    # Trigram novelty vs the train split: the same md5-uniform split,
    # per-doc DISTINCT trigrams, train-set membership via join.
    oracles["novelty_report"] = f"""
        WITH h AS (
          SELECT doc_id, text,
                 md5('split:' || CAST(doc_id AS VARCHAR)) AS hx
          FROM documents),
        s AS (
          SELECT doc_id, text,
                 CASE WHEN {_md5_unit_sql('hx')} < 0.8
                      THEN 'train' ELSE 'val' END AS split
          FROM h),
        toks AS (SELECT doc_id, split, string_split(text, ' ') AS ts FROM s),
        g AS (
          SELECT DISTINCT doc_id, split,
                 ts[CAST(i AS BIGINT)] || ' ' ||
                 ts[CAST(i AS BIGINT) + 1] || ' ' ||
                 ts[CAST(i AS BIGINT) + 2] AS gram
          FROM (SELECT doc_id, split, ts,
                       unnest(range(1, len(ts) - 1)) AS i
                FROM toks)),
        tr AS (SELECT DISTINCT gram FROM g WHERE split = 'train'),
        vg AS (SELECT doc_id, gram FROM g WHERE split = 'val'),
        tot AS (SELECT doc_id, count(*) AS n_grams FROM vg GROUP BY 1),
        sn AS (SELECT doc_id, count(*) AS n_seen
               FROM vg JOIN tr USING (gram) GROUP BY 1),
        ids AS (SELECT doc_id FROM s WHERE split = 'val')
        SELECT ids.doc_id,
               CAST(coalesce(tot.n_grams, 0) AS BIGINT) AS n_grams,
               CAST(coalesce(sn.n_seen, 0) AS BIGINT) AS n_seen,
               CAST(CASE WHEN coalesce(tot.n_grams, 0) = 0 THEN 1000000
                    ELSE ((tot.n_grams - coalesce(sn.n_seen, 0)) * 1000000)
                         // tot.n_grams END AS BIGINT) AS novelty_ppm
        FROM ids LEFT JOIN tot USING (doc_id) LEFT JOIN sn USING (doc_id)
        ORDER BY ids.doc_id
    """
    # PageRank: the identical integer rounds unrolled as a CTE chain
    # (the fixed-iters contract of ops/kmeans.py / ops/logistic.py).
    _pr_rounds = []
    for t in range(3):
        _pr_rounds.append(
            f"""c{t + 1} AS (
          SELECT e.dst AS node,
                 sum((r{t}.r * e.w) // o.outw) AS inflow
          FROM e JOIN r{t} ON r{t}.node = e.src
                 JOIN outd o ON o.src = e.src
          GROUP BY 1),
        r{t + 1} AS (
          SELECT n.node,
                 CAST(150000 + (85 * coalesce(c{t + 1}.inflow, 0)) // 100
                   AS BIGINT) AS r
          FROM nodes n LEFT JOIN c{t + 1} USING (node))"""
        )
    oracles["pagerank_nations"] = f"""
        WITH e AS (
          SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
                 CAST(count(*) AS BIGINT) AS w
          FROM lineitem l
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          GROUP BY 1, 2),
        outd AS (SELECT src, sum(w) AS outw FROM e GROUP BY 1),
        nodes AS (SELECT src AS node FROM e
                  UNION SELECT dst FROM e),
        r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
        {",".join(_pr_rounds)}
        SELECT CAST(node AS BIGINT) AS node, r AS rank_ppm
        FROM r3 ORDER BY node
    """
    # Linear attribution: the naive range self-join the engine avoids.
    oracles["attribution_linear"] = """
        WITH p AS (SELECT event_id AS pid, user_id, ts AS pts
                   FROM events WHERE event_type = 'purchase'),
        t AS (SELECT event_id AS tid, user_id, ts AS tts, event_type
              FROM events WHERE event_type IN ('click', 'view')),
        pair AS (
          SELECT p.pid, t.tid, t.event_type, t.tts
          FROM p JOIN t ON t.user_id = p.user_id
           AND t.tts < p.pts
           AND t.tts >= p.pts - INTERVAL 24 HOUR),
        n AS (SELECT pid, count(*) AS n FROM pair GROUP BY 1),
        r AS (SELECT pair.*, n.n,
                     row_number() OVER (PARTITION BY pair.pid
                                        ORDER BY pair.tts, pair.tid) AS rn
              FROM pair JOIN n USING (pid)),
        cr AS (SELECT event_type,
                      (1000000 // n)
                      + CASE WHEN rn = 1 THEN 1000000 % n ELSE 0 END
                        AS credit
               FROM r),
        un AS (SELECT count(*) AS n_un FROM p
               WHERE pid NOT IN (SELECT DISTINCT pid FROM pair))
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n_credits,
               CAST(sum(credit) AS BIGINT) AS total_credit_ppm,
               CAST((SELECT n_un FROM un) AS BIGINT) AS n_unattributed
        FROM cr GROUP BY event_type ORDER BY event_type
    """
    # Reading order: distinct-x gap clustering via LAG + running sum.
    oracles["reading_order_docs"] = """
        WITH s AS (
          SELECT doc_id % 20 AS page_id, doc_id AS span_id,
                 (n_chars * 13) % 997 AS x, (doc_id * 31) % 991 AS y
          FROM documents),
        ux AS (SELECT DISTINCT page_id, x FROM s),
        lagged AS (
          SELECT page_id, x,
                 CASE WHEN x - lag(x) OVER (PARTITION BY page_id
                                            ORDER BY x) > 50
                      THEN 1 ELSE 0 END AS split
          FROM ux),
        colx AS (
          SELECT page_id, x,
                 sum(split) OVER (PARTITION BY page_id ORDER BY x
                                  ROWS UNBOUNDED PRECEDING) AS column_id
          FROM lagged),
        j AS (SELECT s.page_id, s.span_id, colx.column_id, s.y, s.x
              FROM s JOIN colx ON colx.page_id = s.page_id
                              AND colx.x = s.x),
        o AS (SELECT page_id, span_id,
                     CAST(column_id AS BIGINT) AS column_id,
                     row_number() OVER (PARTITION BY page_id
                       ORDER BY column_id, y, x, span_id) - 1
                       AS read_order
              FROM j)
        SELECT CAST(page_id AS BIGINT) AS page_id,
               CAST(span_id AS BIGINT) AS span_id, column_id,
               CAST(read_order AS BIGINT) AS read_order
        FROM o ORDER BY page_id, read_order
    """
    # Delta dedup: the shared minhash CTE chain (signatures, bands,
    # candidate pairs, eq counts) + an 80/20 md5 side split; exact
    # matches via content-hash self-joins, near matches by filtering
    # the candidate pairs to cross-side ones.
    oracles["delta_dedup"] = f"""
        WITH {_minhash_cte_sql("documents")},
        side AS (
          SELECT doc_id,
                 CASE WHEN {_md5_unit_sql("md5('delta:' || CAST(doc_id AS VARCHAR))")}
                        < 0.8 THEN 'base' ELSE 'delta' END AS side
          FROM documents),
        ch AS (SELECT d.doc_id, md5(d.text) AS h, s.side
               FROM documents d JOIN side s USING (doc_id)),
        eb AS (SELECT c.doc_id, min(b.doc_id) AS base_match
               FROM ch c JOIN ch b ON b.h = c.h AND b.side = 'base'
               WHERE c.side = 'delta' GROUP BY 1),
        ed AS (SELECT c.doc_id, min(e2.doc_id) AS delta_match
               FROM ch c JOIN ch e2 ON e2.h = c.h AND e2.side = 'delta'
                                    AND e2.doc_id < c.doc_id
               WHERE c.side = 'delta' GROUP BY 1),
        nr AS (
          SELECT CASE WHEN sa.side = 'delta' THEN e.id_a ELSE e.id_b END
                   AS doc_id,
                 min(CASE WHEN sa.side = 'delta' THEN e.id_b ELSE e.id_a END)
                   AS near_match
          FROM est e JOIN side sa ON sa.doc_id = e.id_a
                     JOIN side sb ON sb.doc_id = e.id_b
          WHERE CAST(e.eq AS DOUBLE) / 64.0 >= 0.4 AND sa.side <> sb.side
          GROUP BY 1),
        d AS (SELECT doc_id FROM side WHERE side = 'delta')
        SELECT d.doc_id,
               CASE WHEN eb.base_match IS NOT NULL
                      OR ed.delta_match IS NOT NULL THEN 'dup_exact'
                    WHEN nr.near_match IS NOT NULL THEN 'dup_near'
                    ELSE 'unique' END AS status,
               CAST(coalesce(eb.base_match, ed.delta_match,
                             nr.near_match, -1) AS BIGINT) AS match_id
        FROM d LEFT JOIN eb USING (doc_id)
               LEFT JOIN ed USING (doc_id)
               LEFT JOIN nr USING (doc_id)
        ORDER BY d.doc_id
    """
    oracles["pca_top_component"] = _pca_oracle_sql(dim=64, iters=3)
    # CDC chunking: trigram-hash boundary flags, shifted running sum
    # for chunk ids, chunk md5 via ordered string_agg.
    oracles["cdc_chunk_stats"] = f"""
        WITH toks AS (
          SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        pos AS (
          SELECT doc_id, ts, unnest(range(1, len(ts) + 1)) AS p FROM toks),
        flags AS (
          SELECT doc_id, CAST(p AS BIGINT) AS p,
                 ts[CAST(p AS BIGINT)] AS tok,
                 CASE WHEN p >= 3 AND
                   ({_md5_u64_sql(
                       "md5(ts[CAST(p AS BIGINT) - 2] || ' ' || "
                       "ts[CAST(p AS BIGINT) - 1] || ' ' || "
                       "ts[CAST(p AS BIGINT)])"
                   )} % 16) = 0
                 THEN 1 ELSE 0 END AS f
          FROM pos),
        cid AS (
          SELECT doc_id, p, tok,
                 coalesce(sum(f) OVER (PARTITION BY doc_id ORDER BY p
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS chunk_idx
          FROM flags),
        chunks AS (
          SELECT doc_id, chunk_idx,
                 md5(string_agg(tok, ' ' ORDER BY p)) AS chunk_md5
          FROM cid GROUP BY 1, 2)
        SELECT CAST((SELECT count(*) FROM documents) AS BIGINT) AS n_docs,
               CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(count(DISTINCT chunk_md5) AS BIGINT)
                 AS n_distinct_chunks,
               CAST(((count(*) - count(DISTINCT chunk_md5)) * 1000000)
                 // count(*) AS BIGINT) AS dup_chunk_ppm
        FROM chunks
    """
    # Curriculum interleave: row_number rank + the identical integer
    # decile/position arithmetic.
    oracles["curriculum_order"] = """
        WITH n AS (SELECT count(*) AS n FROM documents),
        r AS (SELECT doc_id, n_chars,
                     row_number() OVER (ORDER BY n_chars, doc_id) - 1
                       AS rank
              FROM documents),
        d AS (SELECT r.*, n.n, (10 * rank) // n.n AS bin FROM r, n)
        SELECT CAST(n_chars AS BIGINT) AS n_chars,
               CAST(doc_id AS BIGINT) AS doc_id,
               CAST(rank AS BIGINT) AS rank,
               CAST(bin AS BIGINT) AS bin,
               CAST((rank - (bin * n + 9) // 10) * 10 + bin AS BIGINT)
                 AS out_pos
        FROM d ORDER BY out_pos
    """
    oracles["stream_stream_join"] = """
        SELECT a.user_id, a.event_id AS left_id, b.event_id AS right_id,
               CAST(epoch_us(b.ts) - epoch_us(a.ts) AS BIGINT) AS delta_us
        FROM events a JOIN events b ON b.user_id = a.user_id
        WHERE a.event_type = 'view' AND b.event_type = 'purchase'
          AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 60 MINUTE
        ORDER BY a.user_id, left_id, right_id
    """
    # ANN recall eval: the LSH restriction recomputed in SQL (the
    # lsh_knn oracle generalized to 10 queries), intersected with the
    # brute-force top-k per query.
    oracles["ann_recall"] = f"""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        cells AS (
          SELECT vec_id, v, {_lsh_cell_terms_sql("v")} AS cell FROM e),
        q AS (SELECT vec_id AS qid, v AS qv, cell AS qcell
              FROM cells ORDER BY vec_id LIMIT 10),
        brute AS (
          SELECT q.qid, c.vec_id,
                 row_number() OVER (PARTITION BY q.qid
                   ORDER BY list_cosine_similarity(c.v, q.qv) DESC,
                            c.vec_id ASC) AS rn
          FROM cells c, q),
        bt AS (SELECT qid, vec_id FROM brute WHERE rn <= 5),
        rest AS (
          SELECT q.qid, c.vec_id,
                 row_number() OVER (PARTITION BY q.qid
                   ORDER BY list_cosine_similarity(c.v, q.qv) DESC,
                            c.vec_id ASC) AS rn
          FROM cells c, q
          WHERE bit_count(xor(c.cell, q.qcell)) <= 1),
        rt AS (SELECT qid, vec_id FROM rest WHERE rn <= 5)
        SELECT bt.qid AS query_id,
               CAST(count(rt.vec_id) * 1000000 // 5 AS BIGINT) AS recall_ppm
        FROM bt LEFT JOIN rt ON rt.qid = bt.qid AND rt.vec_id = bt.vec_id
        GROUP BY 1 ORDER BY 1
    """
    oracles["bpe_merge_pairs"] = """
        WITH w AS (
          SELECT unnest(string_split(text, ' ')) AS word FROM documents),
        p AS (
          SELECT substring(word, CAST(i AS BIGINT), 2) AS pair
          FROM (SELECT word, unnest(range(1, length(word))) AS i FROM w))
        SELECT pair, CAST(count(*) AS BIGINT) AS n
        FROM p GROUP BY pair
        ORDER BY n DESC, pair ASC LIMIT 20
    """

    # Poisson bootstrap: every md5 draw + CDF inversion recomputed;
    # the CASE thresholds are repr() of the engine's own float64
    # literals (ops/bootstrap.POISSON1_CDF) — bit-identical compares.
    oracles["bootstrap_value_ci"] = f"""
        WITH base AS (
          SELECT event_type AS g, event_id AS i,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
          FROM events),
        r AS (SELECT g, i, c, unnest(range(0, 32)) AS b FROM base),
        u AS (SELECT g, b, c,
                     {_md5_unit_sql("md5('boot:' || CAST(b AS VARCHAR) || ':' || CAST(i AS VARCHAR))")} AS uu
              FROM r),
        m AS (SELECT g, b, c,
                     CASE WHEN uu < 0.36787944117144233 THEN 0 WHEN uu < 0.7357588823428847 THEN 1 WHEN uu < 0.9196986029286058 THEN 2 WHEN uu < 0.9810118431238462 THEN 3 WHEN uu < 0.9963401531726563 THEN 4 WHEN uu < 0.9994058151824183 THEN 5 WHEN uu < 0.9999167588507119 THEN 6 WHEN uu < 0.9999897508033253 THEN 7 ELSE 8 END AS m
              FROM u),
        agg AS (SELECT g, b, sum(m * c) AS sv, sum(m) AS sm
                FROM m GROUP BY 1, 2 HAVING sum(m) > 0),
        means AS (SELECT g, (sv * 10000) // sm AS mm,
                         row_number() OVER (PARTITION BY g
                           ORDER BY (sv * 10000) // sm) AS rn
                  FROM agg),
        fl AS (SELECT g, (sum(c) * 10000) // count(*) AS mean_micro
               FROM base GROUP BY 1)
        SELECT fl.g AS event_type,
               CAST(fl.mean_micro AS BIGINT) AS mean_micro,
               CAST(lo.mm AS BIGINT) AS lo_micro,
               CAST(hi.mm AS BIGINT) AS hi_micro
        FROM fl JOIN means lo ON lo.g = fl.g AND lo.rn = 2
                JOIN means hi ON hi.g = fl.g AND hi.rn = 30
        ORDER BY fl.g
    """

    oracles["quantization_error"] = """
        WITH e AS (
          SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        x AS (SELECT CAST(j AS BIGINT) AS dim, v[CAST(j AS BIGINT)] AS x
              FROM (SELECT v, unnest(range(1, len(v) + 1)) AS j FROM e)),
        mm AS (SELECT dim, min(x) AS mn, max(x) AS mx FROM x GROUP BY 1),
        q AS (SELECT x.dim, x.x, mm.mn, mm.mx,
                     CASE WHEN mm.mx > mm.mn
                          THEN least(floor(((x.x - mm.mn) * 255.0)
                                           / (mm.mx - mm.mn)), 255.0)
                          ELSE 0.0 END AS qv
              FROM x JOIN mm USING (dim)),
        err AS (SELECT dim,
                       x - (mn + ((qv * (mx - mn)) / 255.0)) AS er
                FROM q)
        SELECT dim, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CAST(floor(er * er * 1000000000000.0 + 0.5)
                 AS BIGINT)) AS BIGINT) AS sse_pico
        FROM err GROUP BY dim ORDER BY dim
    """
    oracles["mmr_select"] = """
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
        scored AS (
          SELECT e.vec_id, e.v,
                 round(list_cosine_similarity(e.v, q.qv), 6) AS rel
          FROM e, q),
        cand AS (SELECT * FROM scored ORDER BY rel DESC, vec_id LIMIT 20),
        p1 AS (SELECT vec_id, v FROM cand ORDER BY rel DESC, vec_id LIMIT 1),
        s2 AS (
          SELECT c.vec_id, c.v,
                 (0.5 * c.rel) - (0.5 * (
                   SELECT max(round(list_cosine_similarity(c.v, p.v), 6))
                   FROM p1 p)) AS sc
          FROM cand c
          WHERE c.vec_id NOT IN (SELECT vec_id FROM p1)),
        pick2 AS (SELECT vec_id, v FROM s2
                    ORDER BY sc DESC, vec_id LIMIT 1),
        p2 AS (SELECT * FROM p1 UNION ALL SELECT * FROM pick2),s3 AS (
          SELECT c.vec_id, c.v,
                 (0.5 * c.rel) - (0.5 * (
                   SELECT max(round(list_cosine_similarity(c.v, p.v), 6))
                   FROM p2 p)) AS sc
          FROM cand c
          WHERE c.vec_id NOT IN (SELECT vec_id FROM p2)),
        pick3 AS (SELECT vec_id, v FROM s3
                    ORDER BY sc DESC, vec_id LIMIT 1),
        p3 AS (SELECT * FROM p2 UNION ALL SELECT * FROM pick3),s4 AS (
          SELECT c.vec_id, c.v,
                 (0.5 * c.rel) - (0.5 * (
                   SELECT max(round(list_cosine_similarity(c.v, p.v), 6))
                   FROM p3 p)) AS sc
          FROM cand c
          WHERE c.vec_id NOT IN (SELECT vec_id FROM p3)),
        pick4 AS (SELECT vec_id, v FROM s4
                    ORDER BY sc DESC, vec_id LIMIT 1),
        p4 AS (SELECT * FROM p3 UNION ALL SELECT * FROM pick4),s5 AS (
          SELECT c.vec_id, c.v,
                 (0.5 * c.rel) - (0.5 * (
                   SELECT max(round(list_cosine_similarity(c.v, p.v), 6))
                   FROM p4 p)) AS sc
          FROM cand c
          WHERE c.vec_id NOT IN (SELECT vec_id FROM p4)),
        pick5 AS (SELECT vec_id, v FROM s5
                    ORDER BY sc DESC, vec_id LIMIT 1),
        p5 AS (SELECT * FROM p4 UNION ALL SELECT * FROM pick5)
        SELECT 1 AS sel_order, vec_id FROM p1 UNION ALL SELECT 2, vec_id FROM pick2 UNION ALL SELECT 3, vec_id FROM pick3 UNION ALL SELECT 4, vec_id FROM pick4 UNION ALL SELECT 5, vec_id FROM pick5
        ORDER BY sel_order
    """
    oracles["event_path_trigrams"] = """
        WITH o AS (
          SELECT event_type,
                 lead(event_type, 1) OVER w AS t2,
                 lead(event_type, 2) OVER w AS t3
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        p AS (SELECT event_type || '>' || t2 || '>' || t3 AS path
              FROM o WHERE t3 IS NOT NULL)
        SELECT path, CAST(count(*) AS BIGINT) AS n
        FROM p GROUP BY 1 ORDER BY n DESC, path LIMIT 10
    """
    oracles["label_noise"] = f"""
        WITH e AS (
          SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings),
        cells AS (
          SELECT vec_id, label, v, {_lsh_cell_terms_sql("v")} AS cell
          FROM e),
        pair AS (
          SELECT a.vec_id, a.label, b.label AS nlabel,
                 row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY round(list_cosine_similarity(a.v, b.v), 6) DESC,
                            b.vec_id ASC) AS rn
          FROM cells a JOIN cells b
            ON b.cell = a.cell AND b.vec_id <> a.vec_id),
        kn AS (SELECT * FROM pair WHERE rn <= 5),
        votes AS (SELECT vec_id, label, nlabel, count(*) AS c
                  FROM kn GROUP BY 1, 2, 3),
        maj AS (SELECT vec_id, label, nlabel AS maj_label,
                       row_number() OVER (PARTITION BY vec_id
                         ORDER BY c DESC, nlabel ASC) AS r
                FROM votes),
        nv AS (SELECT vec_id, count(*) AS n_votes FROM kn GROUP BY 1)
        SELECT m.vec_id, CAST(m.label AS BIGINT) AS label,
               CAST(m.maj_label AS BIGINT) AS maj_label,
               CAST(nv.n_votes AS BIGINT) AS n_votes
        FROM maj m JOIN nv USING (vec_id)
        WHERE m.r = 1 AND m.maj_label <> m.label
        ORDER BY m.vec_id
    """
    oracles["dup_cluster_histogram"] = f"""
        SELECT CAST(sz AS BIGINT) AS cluster_size,
               CAST(count(*) AS BIGINT) AS n_clusters
        FROM (SELECT cluster_id, count(*) AS sz
              FROM ({_dedup_clusters_oracle_sql(threshold=0.4)}) t
              GROUP BY cluster_id) s
        GROUP BY sz ORDER BY sz
    """
    oracles["redaction_audit"] = """
        WITH step1 AS (
          SELECT props,
                 len(regexp_extract_all(props, '[0-9]{2,}')) AS n_num,
                 regexp_replace(props, '[0-9]{2,}', '<NUM>', 'g') AS p1
          FROM events),
        step2 AS (
          SELECT n_num,
                 len(regexp_extract_all(p1, '[0-9]')) AS n_digit,
                 regexp_replace(p1, '[0-9]', '#', 'g') AS p2
          FROM step1),
        tot AS (
          SELECT sum(n_num) AS n_num, sum(n_digit) AS n_digit,
                 sum(len(regexp_extract_all(p2, '[0-9]{2,}'))) AS res_num,
                 sum(len(regexp_extract_all(p2, '[0-9]'))) AS res_digit
          FROM step2)
        SELECT 'num' AS rule, CAST(n_num AS BIGINT) AS n_redactions,
               CAST(res_num AS BIGINT) AS n_residual FROM tot
        UNION ALL
        SELECT 'digit', CAST(n_digit AS BIGINT), CAST(res_digit AS BIGINT)
        FROM tot
    """
    oracles["denormalize_orders"] = """
        SELECT c.c_mktsegment AS segment, n.n_name AS nation,
               r.r_name AS region,
               CAST(count(*) AS BIGINT) AS n_orders,
               CAST(sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT))
                 AS BIGINT) AS revenue_cents
        FROM orders o
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n ON n.n_nationkey = c.c_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
    """
    oracles["neyman_sample"] = """
        WITH base AS (
          SELECT event_type, event_id,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
          FROM events),
        mom AS (
          SELECT event_type, count(*) AS c, sum(cents) AS s,
                 sum(cents * cents) AS s2
          FROM base GROUP BY 1),
        wt AS (
          SELECT event_type, c,
                 c * CAST(floor(sqrt(CAST((c * s2 - s * s) // (c * c)
                   AS DOUBLE))) AS BIGINT) AS w
          FROM mom),
        wt2 AS (
          SELECT event_type, c,
                 CASE WHEN (SELECT sum(w) FROM wt) = 0 THEN c ELSE w END
                   AS w
          FROM wt),
        tot AS (SELECT sum(w) AS ww FROM wt2),
        ham AS (
          SELECT event_type, c,
                 (1000 * w) // tot.ww AS bq,
                 (1000 * w) % tot.ww AS rem
          FROM wt2, tot),
        ex AS (SELECT 1000 - sum(bq) AS extras FROM ham),
        q AS (
          SELECT event_type, c,
                 bq + CASE WHEN row_number() OVER
                        (ORDER BY rem DESC, event_type ASC)
                      <= (SELECT extras FROM ex) THEN 1 ELSE 0 END AS quota
          FROM ham),
        ranked AS (
          SELECT b.event_type, b.event_id,
                 row_number() OVER (PARTITION BY b.event_type ORDER BY
                   {rank_expr} ASC, b.event_id ASC) AS rn
          FROM base b)
        SELECT r.event_type, r.event_id
        FROM ranked r JOIN q ON q.event_type = r.event_type
        WHERE r.rn <= q.quota
        ORDER BY r.event_type, r.event_id
    """.replace("{rank_expr}", _hex_bigint_sql(
        "md5('neyman:' || CAST(b.event_id AS VARCHAR))", 1, 15))
    oracles["harmonic_mean_value"] = """
        WITH base AS (
          SELECT event_type,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
          FROM events),
        r AS (SELECT event_type, 1000000000000 // cents AS r
              FROM base WHERE cents > 0),
        agg AS (SELECT event_type, count(*) AS n, sum(r) AS sr
                FROM r GROUP BY 1)
        SELECT event_type, CAST(n AS BIGINT) AS n,
               CAST((CAST(n AS HUGEINT) * 1000000000000000000) // sr
                 AS BIGINT) AS hm_micro_cents
        FROM agg ORDER BY event_type
    """
    oracles["churn_dataset"] = """
        WITH e AS (
          SELECT user_id, ts, event_type,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
          FROM events),
        agg AS (
          SELECT user_id,
                 sum(CASE WHEN ts < TIMESTAMP '2024-01-22' THEN 1 ELSE 0 END)
                   AS n_events,
                 sum(CASE WHEN ts < TIMESTAMP '2024-01-22'
                          AND event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS n_purchases,
                 sum(CASE WHEN ts < TIMESTAMP '2024-01-22'
                          THEN cents ELSE 0 END) AS value_cents,
                 max(CASE WHEN ts >= TIMESTAMP '2024-01-22'
                          AND ts < TIMESTAMP '2024-01-29'
                          AND event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS label
          FROM e GROUP BY 1)
        SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
               CAST(n_purchases AS BIGINT) AS n_purchases,
               CAST(value_cents AS BIGINT) AS value_cents,
               CAST(label AS BIGINT) AS label
        FROM agg WHERE n_events > 0 ORDER BY user_id
    """
    oracles["token_fertility"] = """
        WITH d AS (
          SELECT lang, n_chars,
                 len(text) - len(replace(text, ' ', '')) + 1 AS n_tokens
          FROM documents),
        agg AS (
          SELECT lang, count(*) AS n_docs, sum(n_chars) AS n_chars,
                 sum(n_tokens) AS n_tokens
          FROM d GROUP BY 1)
        SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
               CAST(n_chars AS BIGINT) AS n_chars,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST((n_chars * 1000000) // n_tokens AS BIGINT)
                 AS chars_per_token_ppm
        FROM agg ORDER BY lang
    """
    oracles["rfm_scores"] = """
        WITH pu AS (
          SELECT user_id, max(epoch_us(ts)) AS last_us,
                 count(*) AS freq,
                 sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS monet
          FROM events GROUP BY 1),
        n AS (SELECT count(*) AS n FROM pu),
        d AS (
          SELECT user_id,
                 (10 * (row_number() OVER (ORDER BY last_us, user_id) - 1))
                   // n.n AS r_decile,
                 (10 * (row_number() OVER (ORDER BY freq, user_id) - 1))
                   // n.n AS f_decile,
                 (10 * (row_number() OVER (ORDER BY monet, user_id) - 1))
                   // n.n AS m_decile
          FROM pu, n)
        SELECT user_id, CAST(r_decile AS BIGINT) AS r_decile,
               CAST(f_decile AS BIGINT) AS f_decile,
               CAST(m_decile AS BIGINT) AS m_decile,
               CAST(100 * r_decile + 10 * f_decile + m_decile AS BIGINT)
                 AS rfm_code
        FROM d ORDER BY user_id
    """
    oracles["chunk_dup_by_source"] = f"""
        WITH toks AS (
          SELECT doc_id, source, string_split(text, ' ') AS ts
          FROM documents),
        pos AS (
          SELECT doc_id, source, ts, unnest(range(1, len(ts) + 1)) AS p
          FROM toks),
        flags AS (
          SELECT doc_id, source, CAST(p AS BIGINT) AS p,
                 ts[CAST(p AS BIGINT)] AS tok,
                 CASE WHEN p >= 3 AND
                   ({_md5_u64_sql(
                       "md5(ts[CAST(p AS BIGINT) - 2] || ' ' || "
                       "ts[CAST(p AS BIGINT) - 1] || ' ' || "
                       "ts[CAST(p AS BIGINT)])"
                   )} % 16) = 0
                 THEN 1 ELSE 0 END AS f
          FROM pos),
        cid AS (
          SELECT doc_id, source, p, tok,
                 coalesce(sum(f) OVER (PARTITION BY doc_id ORDER BY p
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS chunk_idx
          FROM flags),
        chunks AS (
          SELECT doc_id, source, chunk_idx,
                 md5(string_agg(tok, ' ' ORDER BY p)) AS chunk_md5
          FROM cid GROUP BY 1, 2, 3),
        occ AS (SELECT chunk_md5, count(*) AS occ FROM chunks GROUP BY 1)
        SELECT c.source,
               CAST(count(*) AS BIGINT) AS n_chunks,
               CAST(sum(CASE WHEN o.occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_dup,
               CAST((sum(CASE WHEN o.occ > 1 THEN 1 ELSE 0 END) * 1000000)
                 // count(*) AS BIGINT) AS dup_share_ppm
        FROM chunks c JOIN occ o USING (chunk_md5)
        GROUP BY 1 ORDER BY 1
    """
    oracles["l_diversity_audit"] = """
        WITH cells AS (
          SELECT event_type, epoch_us(ts) // 86400000000 AS day,
                 count(DISTINCT user_id) AS l, count(*) AS n_events
          FROM events GROUP BY 1, 2)
        SELECT CAST(count(*) AS BIGINT) AS n_cells,
               CAST(min(l) AS BIGINT) AS min_l,
               CAST(sum(CASE WHEN l < 10 THEN 1 ELSE 0 END) AS BIGINT)
                 AS cells_below_l10,
               CAST((1000000 * sum(CASE WHEN l < 10 THEN n_events
                                        ELSE 0 END)) // sum(n_events)
                    AS BIGINT) AS events_low_ppm
        FROM cells
    """
    oracles["randomized_response_counts"] = f"""
        WITH k AS (SELECT count(DISTINCT event_type) AS k FROM events),
        ty AS (SELECT event_type,
                      row_number() OVER (ORDER BY event_type) - 1 AS idx
               FROM (SELECT DISTINCT event_type FROM events)),
        e AS (SELECT event_type,
                     {_md5_u64_sql("md5('rr:' || CAST(event_id AS VARCHAR))")}
                       AS u
              FROM events),
        rep AS (
          SELECT CASE WHEN e.u % 4 < 3 THEN e.event_type
                      ELSE ty.event_type END AS rtype
          FROM e CROSS JOIN k
          JOIN ty ON ty.idx = CAST((e.u // 4) % k.k AS BIGINT)),
        rc AS (SELECT rtype, count(*) AS c FROM rep GROUP BY 1),
        tc AS (SELECT event_type, count(*) AS n_true FROM events GROUP BY 1),
        n AS (SELECT count(*) AS n FROM events)
        SELECT tc.event_type,
               CAST(tc.n_true AS BIGINT) AS n_true,
               CAST(coalesce(rc.c, 0) AS BIGINT) AS n_reported,
               CAST((1000000 * tc.n_true) // n.n AS BIGINT)
                 AS true_share_ppm,
               CAST((1000000 * greatest(0,
                      4 * k.k * coalesce(rc.c, 0) - n.n))
                    // (3 * k.k * n.n) AS BIGINT) AS est_share_ppm
        FROM tc LEFT JOIN rc ON rc.rtype = tc.event_type
        CROSS JOIN n CROSS JOIN k
        ORDER BY tc.event_type
    """
    oracles["quality_ece"] = f"""
        WITH q AS ({oracles["quality_scores"]}),
        j AS (SELECT q.doc_id, q.quality_micro AS s,
                     CASE WHEN d.n_chars >= 200 THEN 1 ELSE 0 END AS pos
              FROM q JOIN documents d USING (doc_id)),
        b AS (SELECT least(s // 100000, 9) AS bin, count(*) AS n,
                     sum(pos) AS n_pos, sum(s) AS sum_score
              FROM j GROUP BY 1),
        e AS (SELECT sum(abs(1000000 * n_pos - sum_score)) AS gap,
                     sum(n) AS nn
              FROM b)
        SELECT CAST(bin AS BIGINT) AS bin, CAST(n AS BIGINT) AS n_docs,
               CAST(sum_score // n AS BIGINT) AS conf_ppm,
               CAST(1000000 * n_pos // n AS BIGINT) AS acc_ppm,
               CAST(e.gap // e.nn AS BIGINT) AS ece_ppm
        FROM b CROSS JOIN e ORDER BY bin
    """
    oracles["langid_kappa"] = f"""
        WITH pred AS ({_lang_id_oracle_sql()}),
        c AS (SELECT d.lang, p.pred_lang
              FROM documents d JOIN pred p USING (doc_id)),
        n AS (SELECT CAST(count(*) AS HUGEINT) AS n,
                     CAST(sum(CASE WHEN lang = pred_lang THEN 1 ELSE 0 END)
                          AS HUGEINT) AS agree
              FROM c),
        m AS (SELECT CAST(coalesce(sum(r.cnt * col.cnt), 0) AS HUGEINT)
                       AS chance
              FROM (SELECT lang, count(*) AS cnt FROM c GROUP BY 1) r
              JOIN (SELECT pred_lang, count(*) AS cnt FROM c GROUP BY 1) col
                ON r.lang = col.pred_lang)
        SELECT CAST(n.n AS BIGINT) AS n_docs,
               CAST(n.agree AS BIGINT) AS n_agree,
               CAST(1000000 * n.agree // n.n AS BIGINT) AS accuracy_ppm,
               CAST(1000000 * m.chance // (n.n * n.n) AS BIGINT)
                 AS expected_agree_ppm,
               CAST((1000000 * (n.n * n.agree - m.chance))
                    // (n.n * n.n - m.chance) AS BIGINT) AS kappa_ppm
        FROM n CROSS JOIN m
    """
    # HITS: the identical integer half-rounds unrolled as a CTE chain
    # (x0 = hubs at SCALE; each half-round: weighted fold from the
    # opposite endpoint, then sum-normalize to ppm).
    _hits_rounds = []
    _prev_hub = "x0"
    for t in range(1, 3):
        _hits_rounds.append(
            f"""a{t}r AS (
          SELECT e.dst AS node, sum({_prev_hub}.x * e.w) AS s
          FROM e JOIN {_prev_hub} ON {_prev_hub}.node = e.src GROUP BY 1),
        a{t}t AS (SELECT sum(s) AS t FROM a{t}r),
        a{t} AS (
          SELECT n.node,
                 CAST(CASE WHEN coalesce(a{t}t.t, 0) = 0 THEN 0
                      ELSE (1000000 * coalesce(a{t}r.s, 0)) // a{t}t.t
                      END AS HUGEINT) AS x
          FROM nodes n LEFT JOIN a{t}r USING (node) CROSS JOIN a{t}t),
        h{t}r AS (
          SELECT e.src AS node, sum(a{t}.x * e.w) AS s
          FROM e JOIN a{t} ON a{t}.node = e.dst GROUP BY 1),
        h{t}t AS (SELECT sum(s) AS t FROM h{t}r),
        h{t} AS (
          SELECT n.node,
                 CAST(CASE WHEN coalesce(h{t}t.t, 0) = 0 THEN 0
                      ELSE (1000000 * coalesce(h{t}r.s, 0)) // h{t}t.t
                      END AS HUGEINT) AS x
          FROM nodes n LEFT JOIN h{t}r USING (node) CROSS JOIN h{t}t)"""
        )
        _prev_hub = f"h{t}"
    oracles["hits_nations"] = f"""
        WITH e AS (
          SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
                 CAST(count(*) AS HUGEINT) AS w
          FROM lineitem l
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          GROUP BY 1, 2),
        nodes AS (SELECT src AS node FROM e
                  UNION SELECT dst FROM e),
        x0 AS (SELECT node, CAST(1000000 AS HUGEINT) AS x FROM nodes),
        {",".join(_hits_rounds)}
        SELECT CAST(nodes.node AS BIGINT) AS node,
               CAST(h2.x AS BIGINT) AS hub_ppm,
               CAST(a2.x AS BIGINT) AS auth_ppm
        FROM nodes
        JOIN h2 ON h2.node = nodes.node
        JOIN a2 ON a2.node = nodes.node
        ORDER BY nodes.node
    """
    oracles["permutation_test_value"] = f"""
        WITH pool AS (
          SELECT event_id,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_a,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
                 {_md5_u64_sql("md5('perm:' || CAST(event_id AS VARCHAR))")}
                   AS u
          FROM events WHERE event_type IN ('purchase', 'click')),
        obs AS (
          SELECT CAST(sum(is_a) AS HUGEINT) AS n_a,
                 CAST(sum(is_a * cents) AS HUGEINT) AS s_a,
                 CAST(sum(1 - is_a) AS HUGEINT) AS n_b,
                 CAST(sum((1 - is_a) * cents) AS HUGEINT) AS s_b,
                 CAST(count(*) AS HUGEINT) AS n_pool,
                 CAST(sum(cents) AS HUGEINT) AS s_pool
          FROM pool),
        bs AS (SELECT unnest(range(0, 200)) AS b),
        draw AS (
          SELECT bs.b,
                 CASE WHEN ((pool.u * (2 * bs.b + 1) + bs.b)
                            % 18446744073709551616
                            % obs.n_pool) < obs.n_a
                      THEN 1 ELSE 0 END AS assign,
                 pool.cents
          FROM pool CROSS JOIN bs CROSS JOIN obs),
        perb AS (
          SELECT b, CAST(sum(assign) AS HUGEINT) AS na,
                 CAST(sum(assign * cents) AS HUGEINT) AS sa
          FROM draw GROUP BY 1),
        ex AS (
          SELECT count(*) FILTER (
                   abs(perb.sa * (obs.n_pool - perb.na)
                       - (obs.s_pool - perb.sa) * perb.na)
                     * (obs.n_a * obs.n_b)
                   >= abs(obs.s_a * obs.n_b - obs.s_b * obs.n_a)
                     * (perb.na * (obs.n_pool - perb.na))
                 ) AS n_extreme
          FROM perb CROSS JOIN obs)
        SELECT CAST(obs.n_a AS BIGINT) AS n_a,
               CAST(obs.n_b AS BIGINT) AS n_b,
               CAST(obs.s_a AS BIGINT) AS sum_a_cents,
               CAST(obs.s_b AS BIGINT) AS sum_b_cents,
               CAST(ex.n_extreme AS BIGINT) AS n_extreme,
               CAST((1000000 * (ex.n_extreme + 1)) // 201 AS BIGINT)
                 AS p_ppm
        FROM obs CROSS JOIN ex
    """
    _bloom_pos = _md5_u64_sql(
        "md5('bloom' || CAST(j AS VARCHAR) || ':' "
        "|| CAST(o_orderkey AS VARCHAR))"
    )
    oracles["bloom_fpr_audit"] = f"""
        WITH mem AS (SELECT o_orderkey FROM orders
                     WHERE o_orderpriority = '1-URGENT'),
        js AS (SELECT unnest(range(0, 3)) AS j),
        bits AS (
          SELECT DISTINCT CAST({_bloom_pos} % 65536 AS BIGINT) AS pos
          FROM mem CROSS JOIN js),
        pr AS (SELECT o_orderkey FROM orders
               WHERE o_orderpriority <> '1-URGENT'),
        hits AS (
          SELECT pr.o_orderkey,
                 count(*) FILTER (
                   CAST({_bloom_pos} % 65536 AS BIGINT)
                     IN (SELECT pos FROM bits)
                 ) AS k_hit
          FROM pr CROSS JOIN js GROUP BY 1),
        s AS (
          SELECT (SELECT count(*) FROM mem) AS n_members,
                 (SELECT count(*) FROM bits) AS n_set_bits,
                 count(*) AS n_probes,
                 sum(CASE WHEN k_hit = 3 THEN 1 ELSE 0 END) AS n_fp
          FROM hits)
        SELECT CAST(n_members AS BIGINT) AS n_members,
               CAST(n_set_bits AS BIGINT) AS n_set_bits,
               CAST(n_probes AS BIGINT) AS n_probes,
               CAST(n_fp AS BIGINT) AS n_false_pos,
               CAST((1000000 * n_fp) // n_probes AS BIGINT) AS fpr_ppm
        FROM s
    """
    oracles["kruskal_rank_sums"] = """
        WITH vc AS (
          SELECT value, event_type, count(*) AS c
          FROM events GROUP BY 1, 2),
        tot AS (
          SELECT value, CAST(sum(c) AS BIGINT) AS t FROM vc GROUP BY 1),
        r AS (
          SELECT value, t,
                 2 * (sum(t) OVER (ORDER BY value) - t) + t + 1 AS avg2
          FROM tot),
        ties AS (
          SELECT CAST(sum(t * t * t - t) AS BIGINT) AS tie_sum,
                 CAST(sum(t) AS BIGINT) AS n_total
          FROM tot)
        SELECT vc.event_type,
               CAST(sum(vc.c) AS BIGINT) AS n,
               CAST(sum(vc.c * r.avg2) AS BIGINT) AS r2,
               CAST((500000 * sum(vc.c * r.avg2)) // sum(vc.c) AS BIGINT)
                 AS avg_rank_micro,
               ties.n_total, ties.tie_sum
        FROM vc JOIN r USING (value) CROSS JOIN ties
        GROUP BY vc.event_type, ties.n_total, ties.tie_sum
    """
    oracles["degree_assortativity"] = """
        WITH e AS (
          SELECT DISTINCT o_custkey AS s, l_suppkey AS d
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        dx AS (SELECT s, CAST(count(*) AS BIGINT) AS deg_x
               FROM e GROUP BY s),
        dy AS (SELECT d, CAST(count(*) AS BIGINT) AS deg_y
               FROM e GROUP BY d),
        j AS (SELECT deg_x AS x, deg_y AS y
              FROM e JOIN dx USING (s) JOIN dy USING (d)),
        m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                     CAST(sum(x) AS BIGINT) AS sx,
                     CAST(sum(y) AS BIGINT) AS sy,
                     CAST(sum(x * x) AS BIGINT) AS sxx,
                     CAST(sum(y * y) AS BIGINT) AS syy,
                     CAST(sum(x * y) AS BIGINT) AS sxy
              FROM j),
        d2 AS (SELECT n, sx, sy, sxx, syy, sxy,
                      CAST(n AS HUGEINT) * sxy
                        - CAST(sx AS HUGEINT) * sy AS cov_h,
                      CAST(n AS HUGEINT) * sxx
                        - CAST(sx AS HUGEINT) * sx AS varx_h,
                      CAST(n AS HUGEINT) * syy
                        - CAST(sy AS HUGEINT) * sy AS vary_h
               FROM m)
        SELECT n AS n_edges, sx, sy, sxx, syy, sxy,
               CAST(cov_h AS BIGINT) AS cov_num,
               CAST(varx_h AS BIGINT) AS varx_num,
               CAST(vary_h AS BIGINT) AS vary_num,
               CAST(CASE WHEN varx_h * vary_h > 0 THEN
                 CASE WHEN cov_h >= 0
                   THEN (1000000 * cov_h * cov_h) // (varx_h * vary_h)
                   ELSE -((1000000 * cov_h * cov_h) // (varx_h * vary_h))
                 END ELSE 0 END AS BIGINT) AS r2_sign_micro
        FROM d2
    """
    _QUALITY_Q_CTE = r"""
        t AS MATERIALIZED (
          SELECT doc_id, n_chars,
                 length(regexp_extract_all(text, '\S+')) AS n_words,
                 length(text) AS n_chars_utf,
                 length(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
                 length(regexp_extract_all(text, '\b(the|a|to|of|and|in|is)\b'))
                   AS n_stop
          FROM documents),
        q AS (SELECT doc_id, n_chars,
                     CAST(floor((
                       0.5 * least(CAST(n_words AS DOUBLE) / 100.0, 1.0)
                       + 0.25 * (1.0 - least(CAST(n_punct AS DOUBLE)
                                 / greatest(n_chars_utf, 1) * 10.0, 1.0))
                       + 0.25 * (CAST(n_stop AS DOUBLE) / greatest(n_words, 1))
                     ) * 1000000.0 + 0.5) AS BIGINT) AS qm
              FROM t)
    """
    oracles["pr_curve_points"] = f"""
        WITH {_QUALITY_Q_CTE},
        vc AS (
          SELECT qm, count(*) AS n,
                 sum(CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END) AS np
          FROM q GROUP BY qm),
        c AS (
          SELECT qm,
                 sum(np) OVER (ORDER BY qm DESC) AS tp,
                 sum(n - np) OVER (ORDER BY qm DESC) AS fp
          FROM vc),
        tot AS (SELECT CAST(sum(np) AS BIGINT) AS p FROM vc)
        SELECT CAST(qm AS BIGINT) AS threshold,
               CAST(tp AS BIGINT) AS tp,
               CAST(fp AS BIGINT) AS fp,
               CAST((1000000 * tp) // (tp + fp) AS BIGINT) AS precision_ppm,
               CAST((1000000 * tp) // p AS BIGINT) AS recall_ppm,
               CAST((2000000 * tp) // (tp + fp + p) AS BIGINT) AS f1_ppm
        FROM c CROSS JOIN tot
    """
    oracles["brier_decomposition"] = f"""
        WITH {_QUALITY_Q_CTE},
        rows_t AS (
          SELECT least((qm // 1000) // 100, 9) AS bin,
                 qm // 1000 AS s,
                 CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS y
          FROM q),
        b AS (
          SELECT bin, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS BIGINT) AS n_pos,
                 CAST(sum(s) AS BIGINT) AS sum_conf_milli,
                 CAST(sum((s - 1000 * y) * (s - 1000 * y)) AS BIGINT)
                   AS brier_part
          FROM rows_t GROUP BY bin),
        tot AS (
          SELECT CAST(sum(n) AS BIGINT) AS n_total,
                 CAST(sum(n_pos) AS BIGINT) AS p_total,
                 CAST(sum(brier_part) AS BIGINT) AS brier_num
          FROM b)
        SELECT b.bin, b.n, b.n_pos, b.sum_conf_milli,
               CAST((b.sum_conf_milli - 1000 * b.n_pos)
                    * (b.sum_conf_milli - 1000 * b.n_pos) AS BIGINT)
                 AS rel_num,
               CAST((tot.n_total * b.n_pos - tot.p_total * b.n)
                    * (tot.n_total * b.n_pos - tot.p_total * b.n) AS BIGINT)
                 AS res_num,
               tot.n_total, tot.p_total, tot.brier_num
        FROM b CROSS JOIN tot
    """
    oracles["readability_scores"] = r"""
        WITH s AS (
          SELECT doc_id,
                 greatest(length(regexp_extract_all(text, '[.!?]+')), 1)
                   AS ns,
                 greatest(length(regexp_extract_all(text, '\S+')), 1)
                   AS nw,
                 length(regexp_extract_all(lower(text), '[aeiouy]+'))
                   AS nv
          FROM documents)
        SELECT doc_id,
               CAST(ns AS BIGINT) AS n_sentences,
               CAST(nw AS BIGINT) AS n_words,
               CAST(nv AS BIGINT) AS n_vowel_groups,
               CAST(206835 * ns * nw - 1015 * nw * nw - 84600 * nv * ns
                    AS BIGINT) AS flesch_num,
               CAST(ns * nw AS BIGINT) AS flesch_den
        FROM s
    """
    from ocr_service_ray.ops.phonetic import skeleton_sql

    oracles["phonetic_blocking"] = f"""
        WITH k AS (
          SELECT {skeleton_sql("p_name")} AS skeleton FROM part),
        c AS (
          SELECT skeleton, CAST(count(*) AS BIGINT) AS n_members
          FROM k GROUP BY skeleton)
        SELECT skeleton, n_members,
               CAST(n_members * (n_members - 1) // 2 AS BIGINT) AS n_pairs
        FROM c WHERE n_members >= 2
    """
    oracles["cuped_moments"] = """
        WITH u AS (
          SELECT user_id,
                 CAST(sum(CASE WHEN event_type = 'view' THEN
                   CAST(floor(value * 100.0 + 0.5) AS BIGINT) ELSE 0 END)
                   AS BIGINT) AS x,
                 CAST(sum(CASE WHEN event_type = 'purchase' THEN
                   CAST(floor(value * 100.0 + 0.5) AS BIGINT) ELSE 0 END)
                   AS BIGINT) AS y
          FROM events GROUP BY user_id),
        a AS (
          SELECT user_id % 2 AS arm, CAST(count(*) AS BIGINT) AS n_users,
                 CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x * x) AS BIGINT) AS sxx,
                 CAST(sum(x * y) AS BIGINT) AS sxy
          FROM u GROUP BY 1),
        t AS (
          SELECT CAST(sum(n_users) AS HUGEINT) AS n,
                 CAST(sum(sx) AS HUGEINT) AS tsx,
                 CAST(sum(sy) AS HUGEINT) AS tsy,
                 CAST(sum(sxx) AS HUGEINT) AS tsxx,
                 CAST(sum(sxy) AS HUGEINT) AS tsxy
          FROM a),
        th AS (SELECT n * tsxy - tsx * tsy AS theta_num,
                      n * tsxx - tsx * tsx AS theta_den
               FROM t),
        p AS (
          SELECT max(CASE WHEN arm = 0 THEN n_users END) AS n0,
                 max(CASE WHEN arm = 1 THEN n_users END) AS n1,
                 max(CASE WHEN arm = 0 THEN sx END) AS sx0,
                 max(CASE WHEN arm = 1 THEN sx END) AS sx1,
                 max(CASE WHEN arm = 0 THEN sy END) AS sy0,
                 max(CASE WHEN arm = 1 THEN sy END) AS sy1
          FROM a),
        d AS (
          SELECT (CAST(sy1 AS HUGEINT) * n0 - CAST(sy0 AS HUGEINT) * n1)
                   * theta_den
                 - theta_num
                   * (CAST(sx1 AS HUGEINT) * n0 - CAST(sx0 AS HUGEINT) * n1)
                   AS adj_num,
                 CAST(n0 AS HUGEINT) * n1 * theta_den AS adj_den,
                 theta_num, theta_den
          FROM p CROSS JOIN th)
        SELECT a.arm, a.n_users, a.sx, a.sy, a.sxx, a.sxy,
               CAST(d.theta_num AS BIGINT) AS theta_num,
               CAST(d.theta_den AS BIGINT) AS theta_den,
               CAST(CASE WHEN 1000000 * d.adj_num >= 0
                    THEN (1000000 * d.adj_num) // d.adj_den
                    ELSE -((-(1000000 * d.adj_num)) // d.adj_den)
                    END AS BIGINT) AS adj_diff_microcents
        FROM a CROSS JOIN d
    """
    oracles["t_closeness_audit"] = """
        WITH b AS (
          SELECT o_orderpriority,
                 least(CAST(floor(o_totalprice / 20000.0) AS BIGINT), 9)
                   AS band
          FROM orders),
        n AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM b),
        pr AS (SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_g
               FROM b GROUP BY 1),
        cband AS (SELECT o_orderpriority, band, count(*) AS c
                  FROM b GROUP BY 1, 2),
        ks AS (SELECT k FROM (VALUES (0), (1), (2), (3), (4), (5), (6),
                              (7), (8)) t(k)),
        grid AS (
          SELECT pr.o_orderpriority, pr.n_g, ks.k,
                 CAST(coalesce(sum(cb.c), 0) AS BIGINT) AS cg
          FROM pr CROSS JOIN ks
          LEFT JOIN cband cb ON cb.o_orderpriority = pr.o_orderpriority
                             AND cb.band <= ks.k
          GROUP BY 1, 2, 3),
        gt AS (SELECT k, CAST(sum(cg) AS BIGINT) AS ct FROM grid GROUP BY k)
        SELECT g.o_orderpriority, g.n_g,
               CAST(sum(abs(g.cg * n.n_total - gt.ct * g.n_g)) AS BIGINT)
                 AS emd_num,
               CAST(g.n_g * n.n_total * 9 AS BIGINT) AS emd_den
        FROM grid g JOIN gt USING (k) CROSS JOIN n
        GROUP BY g.o_orderpriority, g.n_g, n.n_total
    """
    from ocr_service_ray.ops.rangeplan import range_partition_plan_sql

    oracles["range_partition_plan"] = range_partition_plan_sql(
        "SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS v"
        " FROM orders",
        8,
    )
    oracles["runs_test_daily"] = """
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS day,
                 CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                      AS BIGINT) AS tot
          FROM events GROUP BY 1),
        d AS (
          SELECT day, tot - lag(tot) OVER (ORDER BY day) AS delta
          FROM daily),
        s AS (
          SELECT CAST(sign(delta) AS BIGINT) AS sgn,
                 row_number() OVER (ORDER BY day) AS rn
          FROM d WHERE delta IS NOT NULL AND delta <> 0),
        runs AS (
          SELECT sgn, lag(sgn) OVER (ORDER BY rn) AS prev FROM s),
        agg AS (
          SELECT CAST(sum(CASE WHEN sgn > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_plus,
                 CAST(sum(CASE WHEN sgn < 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_minus,
                 CAST(coalesce(sum(CASE WHEN prev IS NULL
                                        OR sgn <> prev THEN 1 ELSE 0 END),
                               0) AS BIGINT) AS n_runs
          FROM runs),
        nd AS (SELECT CAST(count(*) AS BIGINT) AS n_days FROM daily)
        SELECT nd.n_days, agg.n_plus, agg.n_minus, agg.n_runs,
               CAST(2 * n_plus * n_minus + (n_plus + n_minus) AS BIGINT)
                 AS exp_num,
               CAST(n_plus + n_minus AS BIGINT) AS exp_den,
               CAST(2 * n_plus * n_minus
                    * (2 * n_plus * n_minus - (n_plus + n_minus))
                    AS BIGINT) AS var_num,
               CAST((n_plus + n_minus) * (n_plus + n_minus)
                    * (n_plus + n_minus - 1) AS BIGINT) AS var_den
        FROM agg CROSS JOIN nd
    """
    oracles["resolve_parts"] = f"""
        WITH RECURSIVE k AS (
          SELECT p_partkey, p_name, {skeleton_sql("p_name")} AS sk
          FROM part),
        p AS (
          SELECT a.p_partkey AS id_a, b.p_partkey AS id_b
          FROM k a JOIN k b ON a.sk = b.sk AND a.p_partkey < b.p_partkey
          WHERE levenshtein(a.p_name, b.p_name) <= 2),
        e AS (
          SELECT id_a AS u, id_b AS v FROM p
          UNION
          SELECT id_b, id_a FROM p),
        reach(u, lbl) AS (
          SELECT u, u FROM (SELECT DISTINCT u FROM e)
          UNION
          SELECT e.u, r.lbl FROM e JOIN reach r ON r.u = e.v)
        SELECT u AS p_partkey, CAST(MIN(lbl) AS BIGINT) AS canonical_key
        FROM reach GROUP BY u
    """
    oracles["median_of_means_value"] = """
        WITH b AS (
          SELECT event_id % 16 AS bucket,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
          FROM events),
        a AS (
          SELECT bucket, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(c) AS BIGINT) AS s
          FROM b GROUP BY 1),
        r AS (
          SELECT bucket, n, s,
                 row_number() OVER (
                   ORDER BY CAST(s AS DOUBLE) / n, bucket) AS rk
          FROM a)
        SELECT CAST(16 AS BIGINT) AS k_buckets,
               CAST(bucket AS BIGINT) AS median_bucket,
               s AS mom_num, n AS mom_den
        FROM r WHERE rk = 8
    """
    oracles["spatial_linf_join"] = """
        WITH p AS (
          SELECT vec_id AS id,
                 CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000.0 + 0.5)
                      AS BIGINT) AS x,
                 CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000000.0 + 0.5)
                      AS BIGINT) AS y
          FROM embeddings)
        SELECT a.id AS id_a, b.id AS id_b,
               CAST(greatest(abs(a.x - b.x), abs(a.y - b.y)) AS BIGINT)
                 AS linf
        FROM p a JOIN p b ON a.id < b.id
        WHERE abs(a.x - b.x) <= 100000 AND abs(a.y - b.y) <= 100000
    """
    oracles["kaplan_meier_users"] = """
        WITH RECURSIVE u AS (
          SELECT user_id,
                 CAST((epoch_us(max(ts)) - epoch_us(min(ts))) // 60000000
                      AS BIGINT) AS t,
                 CASE WHEN sum(CASE WHEN event_type = 'purchase'
                                    THEN 1 ELSE 0 END) >= 15
                      THEN 1 ELSE 0 END AS d
          FROM events GROUP BY user_id),
        per_t AS (
          SELECT t, CAST(count(*) AS BIGINT) AS n_all,
                 CAST(sum(d) AS BIGINT) AS deaths
          FROM u GROUP BY t),
        risk AS (
          SELECT t, deaths,
                 CAST((SELECT count(*) FROM u) AS BIGINT)
                   - (sum(n_all) OVER (ORDER BY t
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                      - n_all) AS n_risk
          FROM per_t),
        ev AS (
          SELECT t, deaths, CAST(n_risk AS BIGINT) AS n_risk,
                 row_number() OVER (ORDER BY t) AS rk
          FROM risk WHERE deaths > 0),
        km(rk, t, n_risk, deaths, s) AS (
          SELECT rk, t, n_risk, deaths,
                 (1000000 * (n_risk - deaths)) // n_risk
          FROM ev WHERE rk = 1
          UNION ALL
          SELECT e.rk, e.t, e.n_risk, e.deaths,
                 (km.s * (e.n_risk - e.deaths)) // e.n_risk
          FROM ev e JOIN km ON e.rk = km.rk + 1)
        SELECT t, n_risk, deaths AS n_events, CAST(s AS BIGINT) AS surv_ppm
        FROM km
    """
    oracles["hodges_lehmann_value"] = """
        WITH b AS (SELECT CAST(floor(value) AS BIGINT) AS v FROM events),
        vc AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY v),
        pairs AS (
          SELECT a.v + b.v AS s,
                 CAST(CASE WHEN a.v = b.v THEN a.c * (a.c + 1) // 2
                           ELSE a.c * b.c END AS BIGINT) AS w
          FROM vc a JOIN vc b ON a.v <= b.v),
        tot AS (SELECT CAST(sum(w) AS BIGINT) AS m FROM pairs),
        o AS (
          SELECT s, CAST(sum(w) OVER (ORDER BY s) AS BIGINT) AS cw
          FROM pairs)
        SELECT tot.m AS n_pairs, CAST(min(o.s) AS BIGINT) AS hl_num,
               CAST(2 AS BIGINT) AS hl_den
        FROM o, tot WHERE o.cw >= (tot.m + 1) // 2 GROUP BY tot.m
    """
    oracles["map_eval_sources"] = """
        WITH r AS (
          SELECT source,
                 row_number() OVER (
                   PARTITION BY source ORDER BY n_chars DESC, doc_id) AS k,
                 CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS rel
          FROM documents),
        c AS (
          SELECT source, k, rel,
                 sum(rel) OVER (PARTITION BY source ORDER BY k) AS hits
          FROM r),
        a AS (
          SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(sum(rel) AS BIGINT) AS n_rel,
                 CAST(coalesce(sum(CASE WHEN rel = 1
                                   THEN (hits * 1000000) // k END), 0)
                      AS BIGINT) AS sp
          FROM c GROUP BY source)
        SELECT source, n_docs, n_rel,
               CAST(CASE WHEN n_rel = 0 THEN 0 ELSE sp // n_rel END
                    AS BIGINT) AS ap_ppm
        FROM a
    """
    oracles["did_value"] = """
        WITH e AS (
          SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS g,
                 epoch_us(ts) // 86400000000 AS day,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c
          FROM events),
        m AS (SELECT (min(day) + max(day)) // 2 AS mid FROM e),
        cells AS (
          SELECT g,
                 CASE WHEN day > (SELECT mid FROM m) THEN 1 ELSE 0 END AS p,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(c) AS BIGINT) AS s
          FROM e GROUP BY 1, 2),
        w AS (
          SELECT max(CASE WHEN g = 0 AND p = 0 THEN n END) AS n00,
                 max(CASE WHEN g = 0 AND p = 0 THEN s END) AS s00,
                 max(CASE WHEN g = 0 AND p = 1 THEN n END) AS n01,
                 max(CASE WHEN g = 0 AND p = 1 THEN s END) AS s01,
                 max(CASE WHEN g = 1 AND p = 0 THEN n END) AS n10,
                 max(CASE WHEN g = 1 AND p = 0 THEN s END) AS s10,
                 max(CASE WHEN g = 1 AND p = 1 THEN n END) AS n11,
                 max(CASE WHEN g = 1 AND p = 1 THEN s END) AS s11
          FROM cells),
        d AS (
          SELECT *,
                 (CAST(s11 AS HUGEINT) * n10 - CAST(s10 AS HUGEINT) * n11)
                   * (CAST(n01 AS HUGEINT) * n00)
                 - (CAST(s01 AS HUGEINT) * n00 - CAST(s00 AS HUGEINT) * n01)
                   * (CAST(n11 AS HUGEINT) * n10) AS did_num,
                 CAST(n11 AS HUGEINT) * n10 * n01 * n00 AS did_den
          FROM w)
        SELECT CAST((SELECT mid FROM m) AS BIGINT) AS split_day,
               n00, s00, n01, s01, n10, s10, n11, s11,
               CAST(CASE WHEN 1000000 * did_num >= 0
                    THEN (1000000 * did_num) // did_den
                    ELSE -((-(1000000 * did_num)) // did_den)
                    END AS BIGINT) AS did_microcents
        FROM d
    """
    oracles["matching_att"] = """
        WITH u AS (
          SELECT user_id, user_id % 2 AS g,
                 CAST(count(*) AS BIGINT) AS cnt,
                 CAST(sum(CASE WHEN event_type = 'purchase' THEN
                   CAST(floor(value * 100.0 + 0.5) AS BIGINT) ELSE 0 END)
                   AS BIGINT) AS y
          FROM events GROUP BY user_id),
        vc AS (
          SELECT g, cnt, CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(y) AS BIGINT) AS sy
          FROM u GROUP BY 1, 2),
        t AS (SELECT cnt AS x, n, sy FROM vc WHERE g = 1),
        c AS (SELECT cnt AS yv, n AS cn, sy AS cs FROM vc WHERE g = 0),
        ranked AS (
          SELECT t.x, t.n, c.cn, c.cs,
                 row_number() OVER (
                   PARTITION BY t.x ORDER BY abs(c.yv - t.x), c.yv) AS rk
          FROM t CROSS JOIN c),
        matched AS (
          SELECT x, n, (1000000 * cs) // cn AS m_micro
          FROM ranked WHERE rk = 1),
        agg AS (
          SELECT CAST((SELECT sum(n) FROM t) AS BIGINT) AS n_treated,
                 CAST((SELECT sum(cn) FROM c) AS BIGINT) AS n_control,
                 CAST((SELECT sum(sy) FROM t) AS BIGINT) AS sy_t,
                 CAST(sum(n * m_micro) AS BIGINT) AS matched_sum
          FROM matched)
        SELECT n_treated, n_control,
               CAST((1000000 * sy_t) // n_treated AS BIGINT)
                 AS treated_micro,
               CAST(matched_sum // n_treated AS BIGINT)
                 AS matched_control_micro,
               CAST((1000000 * sy_t) // n_treated
                    - matched_sum // n_treated AS BIGINT) AS att_micro
        FROM agg
    """
    _relax = """
        SELECT v, min(dist) AS dist FROM (
            SELECT v, dist FROM {prev}
            UNION ALL
            SELECT e.dst AS v, {prev}.dist + e.w
            FROM e JOIN {prev} ON {prev}.v = e.src
            WHERE {prev}.dist IS NOT NULL
          ) GROUP BY v
    """
    oracles["sssp_nations"] = (
        """
        WITH e AS (
          SELECT s.s_nationkey AS src, c.c_nationkey AS dst,
                 CAST(count(*) % 29 + 1 AS BIGINT) AS w
          FROM lineitem l
          JOIN orders o ON l.l_orderkey = o.o_orderkey
          JOIN customer c ON o.o_custkey = c.c_custkey
          JOIN supplier s ON l.l_suppkey = s.s_suppkey
          GROUP BY 1, 2),
        nodes AS (
          SELECT DISTINCT src AS v FROM e
          UNION SELECT DISTINCT dst FROM e
          UNION SELECT 0),
        d0 AS (SELECT v, CASE WHEN v = 0 THEN 0 END AS dist FROM nodes),
        d1 AS ("""
        + _relax.format(prev="d0")
        + "), d2 AS ("
        + _relax.format(prev="d1")
        + "), d3 AS ("
        + _relax.format(prev="d2")
        + "), d4 AS ("
        + _relax.format(prev="d3")
        + """)
        SELECT CAST(v AS BIGINT) AS node,
               CAST(coalesce(dist, -1) AS BIGINT) AS dist
        FROM d4
    """
    )
    oracles["sparse_cosine_pairs"] = """
        WITH tok AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS term
          FROM documents),
        tf AS (
          SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
          FROM tok GROUP BY 1, 2),
        df AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        keep AS (
          SELECT tf.doc_id, tf.term, tf.tf
          FROM tf JOIN df USING (term) WHERE df.df <= 50),
        norm AS (
          SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS nn
          FROM keep GROUP BY 1),
        dot AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(sum(a.tf * b.tf) AS BIGINT) AS dot
          FROM keep a JOIN keep b
            ON a.term = b.term AND a.doc_id < b.doc_id
          GROUP BY 1, 2)
        SELECT id_a, id_b, dot, na.nn AS nn_a, nb.nn AS nn_b,
               CAST((1000000 * dot * dot) // (na.nn * nb.nn) AS BIGINT)
                 AS cos2_ppm
        FROM dot
        JOIN norm na ON na.doc_id = dot.id_a
        JOIN norm nb ON nb.doc_id = dot.id_b
        WHERE 1000000 * dot * dot >= 40000 * na.nn * nb.nn
    """
    oracles["equality_delete_orders"] = """
        WITH base AS (
          SELECT o_orderkey AS k, o_orderstatus,
                 CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c,
                 o_orderkey % 3 AS data_seq
          FROM orders),
        del AS (
          SELECT k, max(ds) AS dmax FROM (
            SELECT o_orderkey AS k, 2 AS ds FROM orders
            WHERE o_orderkey % 13 = 0
            UNION ALL
            SELECT o_orderkey, 1 FROM orders WHERE o_orderkey % 17 = 0
          ) GROUP BY k),
        s AS (
          SELECT b.o_orderstatus, b.c
          FROM base b LEFT JOIN del d ON b.k = d.k
          WHERE d.dmax IS NULL OR b.data_seq >= d.dmax)
        SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(c) AS BIGINT) AS cents
        FROM s GROUP BY o_orderstatus
    """
    oracles["friedman_daily_types"] = """
        WITH daily AS (
          SELECT epoch_us(ts) // 86400000000 AS day, event_type,
                 CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                      AS BIGINT) AS v
          FROM events GROUP BY 1, 2),
        kk AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS k
               FROM daily),
        complete AS (
          SELECT day FROM daily GROUP BY day
          HAVING count(*) = (SELECT k FROM kk)),
        ranked AS (
          SELECT d.event_type,
                 2 * rank() OVER (PARTITION BY d.day ORDER BY d.v)
                   + count(*) OVER (PARTITION BY d.day, d.v) - 1
                   AS rank2
          FROM daily d JOIN complete USING (day)),
        per_type AS (
          SELECT event_type,
                 CAST(sum(rank2) AS BIGINT) AS rank2_sum,
                 CAST(count(*) AS BIGINT) AS n_days
          FROM ranked GROUP BY event_type),
        cl AS (
          SELECT max(n_days) AS n, (SELECT k FROM kk) AS k,
                 CAST(sum(rank2_sum * rank2_sum) AS BIGINT) AS sum_sq
          FROM per_type)
        SELECT p.event_type, p.rank2_sum, cl.n AS n_days, cl.k AS k_types,
               CAST(3 * (cl.sum_sq
                    - cl.n * cl.n * cl.k * (cl.k + 1) * (cl.k + 1))
                    AS BIGINT) AS q_num,
               CAST(cl.n * cl.k * (cl.k + 1) AS BIGINT) AS q_den
        FROM per_type p CROSS JOIN cl
    """
    oracles["dehyphenate_docs"] = r"""
        WITH w AS (
          SELECT doc_id, text,
                 regexp_replace(text, '([a-zA-Z]{3})([a-zA-Z]{3,})',
                                '\1-' || chr(10) || '\2', 'g') AS wrapped
          FROM documents)
        SELECT doc_id,
               CAST(length(regexp_split_to_array(wrapped,
                    '[a-zA-Z]-' || chr(10) || '[a-zA-Z]')) - 1 AS BIGINT)
                 AS n_repairs,
               CAST(CASE WHEN regexp_replace(wrapped,
                      '([a-zA-Z])-' || chr(10) || '([a-zA-Z])',
                      '\1\2', 'g') = text
                    THEN 1 ELSE 0 END AS BIGINT) AS roundtrip_ok
        FROM w
    """
    oracles["mojibake_audit"] = """
        WITH t AS (
          SELECT source,
                 CASE WHEN doc_id % 5 = 0 THEN replace(text, 'a', 'Ã¡')
                      ELSE text END AS text
          FROM documents),
        m AS (
          SELECT source,
                 CAST(length(regexp_split_to_array(text, 'Ã|â€|Â')) - 1
                      AS BIGINT) AS markers,
                 CAST(length(text) AS BIGINT) AS n_chars
          FROM t)
        SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(CASE WHEN n_chars > 0
                        AND (markers * 1000000) // n_chars > 1000
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
               CAST(sum(markers) AS BIGINT) AS total_markers
        FROM m GROUP BY source
    """
    oracles["wasserstein_lengths"] = """
        WITH d AS (
          SELECT CASE WHEN lang = 'en' THEN 0 ELSE 1 END AS g,
                 n_chars AS v
          FROM documents WHERE lang IN ('en', 'de')),
        tot AS (
          SELECT CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS na,
                 CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS nb
          FROM d),
        vc AS (
          SELECT v,
                 CAST(sum(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS ca,
                 CAST(sum(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS cb
          FROM d GROUP BY v),
        c AS (
          SELECT v,
                 sum(ca) OVER (ORDER BY v) AS cuma,
                 sum(cb) OVER (ORDER BY v) AS cumb,
                 lead(v) OVER (ORDER BY v) - v AS dx
          FROM vc)
        SELECT tot.na AS n_a, tot.nb AS n_b,
               CAST(sum(abs(cuma * tot.nb - cumb * tot.na) * dx)
                    AS BIGINT) AS w1_num,
               CAST(tot.na * tot.nb AS BIGINT) AS w1_den
        FROM c, tot WHERE dx IS NOT NULL GROUP BY tot.na, tot.nb
    """
    oracles["schema_evolution_union"] = """
        SELECT o_orderkey, CAST(0 AS BIGINT) AS snap,
               CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
        FROM orders WHERE o_orderkey % 2 = 0
        UNION ALL BY NAME
        SELECT o_orderkey, CAST(1 AS BIGINT) AS snap,
               CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
               o_orderstatus
        FROM orders WHERE o_orderkey % 2 = 1
    """
    oracles["ips_policy_value"] = """
        WITH ty AS (
          SELECT event_type,
                 row_number() OVER (ORDER BY event_type) - 1 AS idx
          FROM (SELECT DISTINCT event_type FROM events)),
        kk AS (SELECT CAST(count(*) AS BIGINT) AS k FROM ty),
        e AS (
          SELECT ty.idx AS a,
                 ((ev.user_id % 7) * 3 + 1) % kk.k AS target,
                 CAST(floor(ev.value * 100.0 + 0.5) AS BIGINT) AS r
          FROM events ev JOIN ty USING (event_type) CROSS JOIN kk),
        agg AS (
          SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(CASE WHEN a = target THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_match,
                 CAST(sum(CASE WHEN a = target THEN r ELSE 0 END)
                      AS BIGINT) AS sum_rm
          FROM e)
        SELECT agg.n, kk.k AS k_actions, agg.n_match,
               agg.sum_rm AS sum_matched_cents,
               CAST(kk.k * agg.sum_rm AS BIGINT) AS ips_num,
               agg.n AS ips_den,
               agg.sum_rm AS snips_num,
               agg.n_match AS snips_den
        FROM agg CROSS JOIN kk
    """
    oracles["ams_f2_users"] = f"""
        WITH vc AS (
          SELECT user_id AS v, CAST(count(*) AS BIGINT) AS c
          FROM events GROUP BY 1),
        js AS (SELECT j FROM (VALUES (0), (1), (2), (3), (4), (5), (6),
                              (7)) t(j)),
        signed AS (
          SELECT js.j,
                 CASE WHEN {_md5_u64_sql(
                     "md5('ams' || CAST(js.j AS VARCHAR) || ':' "
                     "|| CAST(vc.v AS VARCHAR))"
                 )} % 2 = 0
                      THEN vc.c ELSE -vc.c END AS sc
          FROM js CROSS JOIN vc),
        est AS (
          SELECT j, CAST(sum(sc) AS BIGINT) AS s,
                 CAST(sum(sc) * sum(sc) AS BIGINT) AS sq
          FROM signed GROUP BY j),
        t AS (SELECT CAST(sum(c * c) AS BIGINT) AS f2_true FROM vc),
        med AS (
          SELECT sq AS f2_est FROM (
            SELECT sq, row_number() OVER (ORDER BY sq, j) AS rk
            FROM est) WHERE rk = 4)
        SELECT est.j, est.s, est.sq, t.f2_true, med.f2_est
        FROM est CROSS JOIN t CROSS JOIN med
    """
    _daily_cents = """
        SELECT epoch_us(ts) // 86400000000 AS day,
               CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT))
                    AS BIGINT) AS tot
        FROM events GROUP BY 1
    """
    oracles["haar_synopsis_daily"] = f"""
        WITH daily AS ({_daily_cents}),
        ranked AS (
          SELECT tot, row_number() OVER (ORDER BY day) - 1 AS rn,
                 (SELECT count(*) FROM daily) AS n
          FROM daily),
        ks AS (SELECT unnest(generate_series(0, 15)) AS pos),
        l0 AS (
          SELECT ks.pos,
                 CAST(coalesce(sum(r.tot), 0) AS BIGINT) AS v
          FROM ks LEFT JOIN ranked r ON (r.rn * 16) // r.n = ks.pos
          GROUP BY ks.pos),
        l1 AS (
          SELECT pos // 2 AS pos, CAST(sum(v) AS BIGINT) AS s,
                 CAST(sum(CASE WHEN pos % 2 = 0 THEN v ELSE -v END)
                      AS BIGINT) AS d
          FROM l0 GROUP BY pos // 2),
        l2 AS (
          SELECT pos // 2 AS pos, CAST(sum(s) AS BIGINT) AS s,
                 CAST(sum(CASE WHEN pos % 2 = 0 THEN s ELSE -s END)
                      AS BIGINT) AS d
          FROM l1 GROUP BY pos // 2),
        l3 AS (
          SELECT pos // 2 AS pos, CAST(sum(s) AS BIGINT) AS s,
                 CAST(sum(CASE WHEN pos % 2 = 0 THEN s ELSE -s END)
                      AS BIGINT) AS d
          FROM l2 GROUP BY pos // 2),
        l4 AS (
          SELECT pos // 2 AS pos, CAST(sum(s) AS BIGINT) AS s,
                 CAST(sum(CASE WHEN pos % 2 = 0 THEN s ELSE -s END)
                      AS BIGINT) AS d
          FROM l3 GROUP BY pos // 2)
        SELECT CAST(1 AS BIGINT) AS level, CAST(pos AS BIGINT) AS k,
               d AS coef FROM l1
        UNION ALL SELECT 2, pos, d FROM l2
        UNION ALL SELECT 3, pos, d FROM l3
        UNION ALL SELECT 4, pos, d FROM l4
        UNION ALL SELECT 5, 0, s FROM l4
    """
    oracles["lis_daily_values"] = f"""
        WITH RECURSIVE daily AS ({_daily_cents}),
        d AS (SELECT row_number() OVER (ORDER BY day) AS rn, tot
              FROM daily),
        up(rn, v, len) AS (
          SELECT rn, tot, 1 FROM d
          UNION
          SELECT d.rn, d.tot, up.len + 1
          FROM d JOIN up ON d.rn > up.rn AND d.tot > up.v),
        dn(rn, v, len) AS (
          SELECT rn, tot, 1 FROM d
          UNION
          SELECT d.rn, d.tot, dn.len + 1
          FROM d JOIN dn ON d.rn > dn.rn AND d.tot < dn.v)
        SELECT CAST((SELECT count(*) FROM daily) AS BIGINT) AS n_days,
               CAST((SELECT max(len) FROM up) AS BIGINT) AS lis_len,
               CAST((SELECT max(len) FROM dn) AS BIGINT) AS lds_len
    """
    oracles["dbscan_embeddings"] = """
        WITH RECURSIVE p AS (
          SELECT vec_id AS id,
                 CAST(floor(CAST(embedding[1] AS DOUBLE) * 1000000.0 + 0.5)
                      AS BIGINT) AS x,
                 CAST(floor(CAST(embedding[2] AS DOUBLE) * 1000000.0 + 0.5)
                      AS BIGINT) AS y
          FROM embeddings),
        e AS (
          SELECT a.id AS ia, b.id AS ib
          FROM p a JOIN p b ON a.id <> b.id
          WHERE abs(a.x - b.x) <= 20000 AND abs(a.y - b.y) <= 20000),
        deg AS (SELECT ia AS id, count(*) AS d FROM e GROUP BY 1),
        core AS (SELECT id FROM deg WHERE d >= 3),
        ce AS (
          SELECT e.ia, e.ib FROM e
          WHERE e.ia IN (SELECT id FROM core)
            AND e.ib IN (SELECT id FROM core)),
        reach(u, lbl) AS (
          SELECT id, id FROM core
          UNION
          SELECT ce.ia, r.lbl FROM ce JOIN reach r ON r.u = ce.ib),
        lab AS (SELECT u AS id, CAST(min(lbl) AS BIGINT) AS cluster
                FROM reach GROUP BY u),
        border AS (
          SELECT e.ia AS id, CAST(min(lab.cluster) AS BIGINT) AS cluster
          FROM e
          JOIN core c ON e.ib = c.id
          JOIN lab ON lab.id = e.ib
          WHERE e.ia NOT IN (SELECT id FROM core)
          GROUP BY e.ia)
        SELECT p.id AS vec_id,
               CAST(CASE WHEN lab.id IS NOT NULL THEN 2
                         WHEN border.id IS NOT NULL THEN 1
                         ELSE 0 END AS BIGINT) AS role,
               CAST(coalesce(lab.cluster, border.cluster, -1) AS BIGINT)
                 AS cluster
        FROM p
        LEFT JOIN lab ON lab.id = p.id
        LEFT JOIN border ON border.id = p.id
    """
    _kmv_h = _md5_u64_sql("md5('kmv:' || CAST(cents AS VARCHAR))")
    _kmv_base = f"""
        dv AS (
          SELECT DISTINCT event_type,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
          FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        hh AS (SELECT DISTINCT event_type, {_kmv_h} AS h FROM dv),
        r AS (
          SELECT event_type, h,
                 ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
          FROM hh)
    """
    _kmv_2_64 = "CAST('18446744073709551616' AS HUGEINT)"
    oracles["kmv_distinct_cents"] = f"""
        -- KMV bottom-k from scratch: md5 uint64 hashes, per-group
        -- rank <= 256, floor estimator (k-1)*2^64 // h_(k) in HUGEINT
        WITH {_kmv_base},
        agg AS (
          SELECT event_type, COUNT(*) AS n_kept, MAX(h) AS hk
          FROM r WHERE rn <= 256 GROUP BY event_type)
        SELECT event_type, CAST(n_kept AS BIGINT) AS n_kept,
               CAST(CASE WHEN n_kept < 256 THEN n_kept
                    ELSE 255 * {_kmv_2_64} // hk END AS BIGINT) AS n_hat
        FROM agg ORDER BY event_type
    """
    oracles["kmv_set_ops_cents"] = f"""
        -- union sketch = bottom-k of the merged sketches; shared
        -- membership over it gives the floored intersection / Jaccard
        WITH {_kmv_base},
        sa AS (SELECT h FROM r WHERE event_type = 'purchase' AND rn <= 256),
        sb AS (SELECT h FROM r WHERE event_type = 'click' AND rn <= 256),
        ux AS (SELECT h FROM (SELECT h FROM sa UNION SELECT h FROM sb)
               ORDER BY h LIMIT 256),
        m AS (
          SELECT COUNT(*) AS kx, MAX(h) AS hmax,
                 SUM(CASE WHEN h IN (SELECT h FROM sa)
                           AND h IN (SELECT h FROM sb)
                     THEN 1 ELSE 0 END) AS shared
          FROM ux),
        u AS (
          SELECT kx, shared,
                 CASE WHEN kx < 256 THEN CAST(kx AS HUGEINT)
                      ELSE 255 * {_kmv_2_64} // hmax END AS uh
          FROM m)
        SELECT CAST(kx AS BIGINT) AS kx,
               CAST(uh AS BIGINT) AS union_hat,
               CAST(shared AS BIGINT) AS shared,
               CAST(CASE WHEN kx = 0 THEN 0
                    ELSE shared * uh // kx END AS BIGINT) AS inter_hat,
               CAST(CASE WHEN kx = 0 THEN 0
                    ELSE shared * 1000000 // kx END AS BIGINT) AS jacc_ppm
        FROM u
    """
    oracles["bpe_pair_counts"] = """
        -- BPE round 1 from scratch: word-frequency table, substring
        -- adjacent pairs with the </w> end-of-word symbol, weighted sum
        WITH w AS (
          SELECT unnest(string_split(text, ' ')) AS word
          FROM documents WHERE text IS NOT NULL),
        wf AS (SELECT word, COUNT(*) AS f FROM w WHERE word <> '' GROUP BY word),
        pos AS (
          SELECT word, f, unnest(generate_series(1, length(word))) AS i
          FROM wf),
        p AS (
          SELECT substring(word, i, 1) AS left_sym,
                 CASE WHEN i = length(word) THEN '</w>'
                      ELSE substring(word, i + 1, 1) END AS right_sym,
                 f
          FROM pos)
        SELECT left_sym, right_sym, CAST(SUM(f) AS BIGINT) AS n
        FROM p GROUP BY left_sym, right_sym
        ORDER BY n DESC, left_sym, right_sym
        LIMIT 30
    """
    oracles["kcenter_coreset"] = _kcenter_oracle_sql(8)
    oracles["cdc_apply_changelog"] = """
        -- CDC latest-wins: base seq 0, upserts seq 1 (k%7), delete
        -- tombstones seq 2 (k%13); max-seq row wins, deletes drop keys
        WITH base AS (
          SELECT o_orderkey,
                 CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
                 o_orderstatus AS status,
                 CAST(0 AS BIGINT) AS seq, 'u' AS op
          FROM orders),
        log AS (
          SELECT * FROM base
          UNION ALL
          SELECT o_orderkey, cents + 12345, 'U', 1, 'u'
          FROM base WHERE o_orderkey % 7 = 0
          UNION ALL
          SELECT o_orderkey, CAST(0 AS BIGINT), '', 2, 'd'
          FROM base WHERE o_orderkey % 13 = 0),
        win AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey
                                       ORDER BY seq DESC) AS rn
          FROM log)
        SELECT o_orderkey, cents, status, seq
        FROM win WHERE rn = 1 AND op <> 'd'
        ORDER BY o_orderkey
    """
    _sm = (
        lambda num, den: f"""CASE WHEN {den} = 0 THEN NULL
            WHEN ({num} >= 0) = ({den} > 0) THEN abs({num}) // abs({den})
            ELSE -(abs({num}) // abs({den})) END"""
    )
    oracles["ols2_hour_dow"] = f"""
        -- two-feature OLS from scratch: integer moments per type,
        -- 3x3 Cramer in HUGEINT, sign-magnitude micro floors
        WITH p AS (
          SELECT event_type,
                 (epoch_us(ts) // 3600000000) % 24 AS x1,
                 ((epoch_us(ts) // 86400000000) + 4) % 7 AS x2,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS y
          FROM events),
        m AS (
          SELECT event_type,
                 CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(x1) AS BIGINT) AS sx1,
                 CAST(sum(x2) AS BIGINT) AS sx2,
                 CAST(sum(y) AS BIGINT) AS sy,
                 CAST(sum(x1 * x1) AS BIGINT) AS sx11,
                 CAST(sum(x2 * x2) AS BIGINT) AS sx22,
                 CAST(sum(x1 * x2) AS BIGINT) AS sx12,
                 CAST(sum(x1 * y) AS BIGINT) AS sx1y,
                 CAST(sum(x2 * y) AS BIGINT) AS sx2y
          FROM p GROUP BY event_type),
        d AS (
          SELECT *,
            CAST(n AS HUGEINT) * (CAST(sx11 AS HUGEINT) * sx22 - CAST(sx12 AS HUGEINT) * sx12)
              - CAST(sx1 AS HUGEINT) * (CAST(sx1 AS HUGEINT) * sx22 - CAST(sx12 AS HUGEINT) * sx2)
              + CAST(sx2 AS HUGEINT) * (CAST(sx1 AS HUGEINT) * sx12 - CAST(sx11 AS HUGEINT) * sx2) AS det,
            CAST(sy AS HUGEINT) * (CAST(sx11 AS HUGEINT) * sx22 - CAST(sx12 AS HUGEINT) * sx12)
              - CAST(sx1 AS HUGEINT) * (CAST(sx1y AS HUGEINT) * sx22 - CAST(sx12 AS HUGEINT) * sx2y)
              + CAST(sx2 AS HUGEINT) * (CAST(sx1y AS HUGEINT) * sx12 - CAST(sx11 AS HUGEINT) * sx2y) AS d0,
            CAST(n AS HUGEINT) * (CAST(sx1y AS HUGEINT) * sx22 - CAST(sx12 AS HUGEINT) * sx2y)
              - CAST(sy AS HUGEINT) * (CAST(sx1 AS HUGEINT) * sx22 - CAST(sx12 AS HUGEINT) * sx2)
              + CAST(sx2 AS HUGEINT) * (CAST(sx1 AS HUGEINT) * sx2y - CAST(sx1y AS HUGEINT) * sx2) AS d1,
            CAST(n AS HUGEINT) * (CAST(sx11 AS HUGEINT) * sx2y - CAST(sx1y AS HUGEINT) * sx12)
              - CAST(sx1 AS HUGEINT) * (CAST(sx1 AS HUGEINT) * sx2y - CAST(sx1y AS HUGEINT) * sx2)
              + CAST(sy AS HUGEINT) * (CAST(sx1 AS HUGEINT) * sx12 - CAST(sx11 AS HUGEINT) * sx2) AS d2
          FROM m)
        SELECT event_type, n, sx1, sx2, sy, sx11, sx22, sx12, sx1y, sx2y,
               CAST({_sm("1000000 * d0", "det")} AS BIGINT) AS beta0_micro,
               CAST({_sm("1000000 * d1", "det")} AS BIGINT) AS beta1_micro,
               CAST({_sm("1000000 * d2", "det")} AS BIGINT) AS beta2_micro
        FROM d ORDER BY event_type
    """
    oracles["max_coverage_docs"] = _max_coverage_oracle_sql(6)
    oracles["quantile_normalize_lengths"] = """
        -- Bolstad rank-map: per-source cume rank -> pooled order
        -- statistic at ceil(r*N/n_g), all integer arithmetic
        WITH v AS (
          SELECT source,
                 CAST(length(string_split(text, ' ')) AS BIGINT) AS val
          FROM documents WHERE text IS NOT NULL),
        vc AS (SELECT source, val, CAST(count(*) AS BIGINT) AS c
               FROM v GROUP BY 1, 2),
        src_cum AS (
          SELECT source, val, c,
                 SUM(c) OVER (PARTITION BY source ORDER BY val) AS r,
                 SUM(c) OVER (PARTITION BY source) AS n_g
          FROM vc),
        pooled AS (SELECT val, SUM(c) AS pc FROM vc GROUP BY val),
        pooled_cum AS (
          SELECT val, SUM(pc) OVER (ORDER BY val) AS pcum FROM pooled),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS N FROM vc),
        mapped AS (
          SELECT s.source, s.c,
                 (SELECT min(p.val) FROM pooled_cum p
                  WHERE p.pcum >= ((s.r * t.N + s.n_g - 1) // s.n_g))
                   AS norm_val
          FROM src_cum s, tot t)
        SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs,
               CAST(SUM(c * norm_val) AS BIGINT) AS sum_norm_len
        FROM mapped GROUP BY source ORDER BY source
    """
    oracles["energy_distance_values"] = f"""
        -- energy distance from scratch: merged-support gap scan with
        -- window cumulatives, HUGEINT sign-magnitude micro close
        WITH v AS (
          SELECT event_type,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
          FROM events WHERE event_type IN ('purchase', 'click')),
        vc AS (
          SELECT cents,
                 CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS cx,
                 CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS cy
          FROM v GROUP BY cents),
        t AS (SELECT CAST(SUM(cx) AS BIGINT) AS n, CAST(SUM(cy) AS BIGINT) AS m FROM vc),
        cum AS (
          SELECT cents,
                 SUM(cx) OVER (ORDER BY cents) AS rx,
                 SUM(cy) OVER (ORDER BY cents) AS ry,
                 lead(cents) OVER (ORDER BY cents) AS nxt
          FROM vc),
        s AS (
          SELECT
            CAST(SUM(CASE WHEN nxt IS NULL THEN 0
                 ELSE (nxt - cents) * (rx * (t.m - ry) + ry * (t.n - rx)) END) AS BIGINT) AS s_xy,
            CAST(SUM(CASE WHEN nxt IS NULL THEN 0
                 ELSE (nxt - cents) * 2 * rx * (t.n - rx) END) AS BIGINT) AS s_xx,
            CAST(SUM(CASE WHEN nxt IS NULL THEN 0
                 ELSE (nxt - cents) * 2 * ry * (t.m - ry) END) AS BIGINT) AS s_yy,
            any_value(t.n) AS n, any_value(t.m) AS m
          FROM cum, t),
        e AS (
          SELECT *,
            2 * CAST(s_xy AS HUGEINT) * n * m
              - CAST(s_xx AS HUGEINT) * m * m
              - CAST(s_yy AS HUGEINT) * n * n AS num,
            CAST(n AS HUGEINT) * n * m * m AS den
          FROM s)
        SELECT CAST(n AS BIGINT) AS n_a, CAST(m AS BIGINT) AS n_b,
               s_xy, s_xx, s_yy,
               CAST(CASE WHEN den = 0 THEN NULL
                    WHEN (1000000 * num >= 0) = (den > 0)
                    THEN abs(1000000 * num) // abs(den)
                    ELSE -(abs(1000000 * num) // abs(den)) END AS BIGINT)
                 AS energy_micro
        FROM e
    """
    oracles["interval_schedule_value"] = """
        -- weighted interval scheduling DP replayed as a list-carrying
        -- recursive CTE: hist[i+1] = max(hist[i], v_i + hist[p(i)+1])
        WITH RECURSIVE e AS (
          SELECT user_id,
                 epoch_us(ts) // 1000000 AS s,
                 CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v,
                 epoch_us(ts) // 1000000
                   + (CAST(floor(value * 100.0 + 0.5) AS BIGINT) % 2000000
                      + 86400) AS f,
                 event_id
          FROM events),
        r AS (
          SELECT user_id, s, f, v,
                 CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                         ORDER BY f, s, v, event_id)
                      AS BIGINT) AS i
          FROM e),
        n AS (
          SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
                 CAST(SUM(v) AS BIGINT) AS total_v
          FROM r GROUP BY user_id),
        p AS (
          SELECT a.user_id, a.i, a.v, coalesce(max(b.i), 0) AS pi
          FROM r a LEFT JOIN r b
            ON b.user_id = a.user_id AND b.f <= a.s
          GROUP BY a.user_id, a.i, a.v),
        dp AS (
          SELECT user_id, CAST(0 AS BIGINT) AS i,
                 [CAST(0 AS BIGINT)] AS hist
          FROM n
          UNION ALL
          SELECT d.user_id, d.i + 1,
                 list_append(d.hist,
                     greatest(d.hist[d.i + 1], p.v + d.hist[p.pi + 1]))
          FROM dp d JOIN p ON p.user_id = d.user_id AND p.i = d.i + 1),
        best AS (
          SELECT d.user_id, d.hist[d.i + 1] AS best_v
          FROM dp d JOIN n ON n.user_id = d.user_id AND d.i = n.n_events)
        SELECT n.user_id, n.n_events, n.total_v,
               CAST(best.best_v AS BIGINT) AS best_v
        FROM n JOIN best ON best.user_id = n.user_id
        ORDER BY n.user_id
    """
    oracles["hyperball_nations"] = f"""
        -- HyperBall p=4: register tables replayed round by round;
        -- rho = 29 - bit_length(28-bit remainder), raw estimate =
        -- 673/1000 * 256 * 2^29 / SUM(2^(29-reg)) as exact micro
        WITH trade AS (
          SELECT s.s_nationkey AS sn, c.c_nationkey AS cn,
                 CAST(count(*) AS BIGINT) AS n
          FROM lineitem l
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          GROUP BY 1, 2),
        ed AS (SELECT sn AS src, cn AS dst FROM trade
               WHERE sn <> cn AND n % 7 = 0),
        nodes AS (SELECT DISTINCT v FROM (
          SELECT src AS v FROM ed UNION SELECT dst FROM ed)),
        h AS (SELECT v AS node,
              {_hex_bigint_sql("md5(CAST(v AS VARCHAR))", 1, 8)} AS x
              FROM nodes),
        r0 AS (SELECT node, x // 268435456 AS bucket,
               CAST(CASE WHEN x % 268435456 = 0 THEN 29
                    ELSE 29 - length(bin(x % 268435456)) END AS BIGINT)
                 AS rho
               FROM h),
        r1 AS (SELECT node, bucket, CAST(MAX(rho) AS BIGINT) AS rho
               FROM (SELECT * FROM r0
                     UNION ALL
                     SELECT e.src, r.bucket, r.rho
                     FROM ed e JOIN r0 r ON r.node = e.dst)
               GROUP BY node, bucket),
        r2 AS (SELECT node, bucket, CAST(MAX(rho) AS BIGINT) AS rho
               FROM (SELECT * FROM r1
                     UNION ALL
                     SELECT e.src, r.bucket, r.rho
                     FROM ed e JOIN r1 r ON r.node = e.dst)
               GROUP BY node, bucket),
        r3 AS (SELECT node, bucket, CAST(MAX(rho) AS BIGINT) AS rho
               FROM (SELECT * FROM r2
                     UNION ALL
                     SELECT e.src, r.bucket, r.rho
                     FROM ed e JOIN r2 r ON r.node = e.dst)
               GROUP BY node, bucket),
        snap AS (
          SELECT 0 AS radius, * FROM r0
          UNION ALL SELECT 1, * FROM r1
          UNION ALL SELECT 2, * FROM r2
          UNION ALL SELECT 3, * FROM r3)
        SELECT CAST(node AS BIGINT) AS node,
               CAST(radius AS BIGINT) AS radius,
               CAST(SUM(rho) AS BIGINT) AS reg_sum,
               CAST(CAST(673 AS BIGINT) * 256 * 536870912 * 1000 // (
                 SUM(CAST(1 AS BIGINT) << (29 - rho))
                 + (16 - COUNT(*)) * 536870912) AS BIGINT) AS est_micro
        FROM snap
        GROUP BY node, radius
        ORDER BY radius, node
    """
    oracles["mst_trade_graph"] = """
        -- Kruskal replayed as a component-list-carrying recursive CTE
        -- (unique weights => identical edge set to Boruvka)
        WITH RECURSIVE trade AS (
          SELECT s.s_nationkey AS sn, c.c_nationkey AS cn,
                 CAST(count(*) AS BIGINT) AS n
          FROM lineitem l
          JOIN orders o ON o.o_orderkey = l.l_orderkey
          JOIN customer c ON c.c_custkey = o.o_custkey
          JOIN supplier s ON s.s_suppkey = l.l_suppkey
          GROUP BY 1, 2),
        und AS (
          SELECT least(sn, cn) AS lo, greatest(sn, cn) AS hi,
                 CAST(SUM(n) AS BIGINT) AS tot
          FROM trade WHERE sn <> cn GROUP BY 1, 2),
        e AS (
          SELECT lo, hi, (tot % 983) * 10000 + lo * 100 + hi AS w,
                 CAST(ROW_NUMBER() OVER (ORDER BY
                   (tot % 983) * 10000 + lo * 100 + hi) AS BIGINT) AS i
          FROM und),
        nodes AS (
          SELECT DISTINCT v FROM (
            SELECT lo AS v FROM e UNION SELECT hi FROM e)),
        init AS (
          SELECT list(struct_pack(n := v, c := v) ORDER BY v) AS comps
          FROM nodes),
        k AS (
          SELECT CAST(0 AS BIGINT) AS i, comps,
                 CAST(0 AS BIGINT) AS acc_w,
                 CAST(0 AS BIGINT) AS acc_e,
                 CAST(0 AS BIGINT) AS acc_ck
          FROM init
          UNION ALL
          SELECT k.i + 1,
                 CASE WHEN cu.c <> cv.c THEN
                   list_transform(k.comps, x -> struct_pack(
                     n := x.n,
                     c := CASE WHEN x.c = cu.c OR x.c = cv.c
                               THEN least(cu.c, cv.c) ELSE x.c END))
                 ELSE k.comps END,
                 k.acc_w + CASE WHEN cu.c <> cv.c THEN e.w ELSE 0 END,
                 k.acc_e + CASE WHEN cu.c <> cv.c THEN 1 ELSE 0 END,
                 k.acc_ck + CASE WHEN cu.c <> cv.c
                                 THEN e.lo * 100003 + e.hi ELSE 0 END
          FROM k
          JOIN e ON e.i = k.i + 1
          CROSS JOIN LATERAL (
            SELECT x.c AS c FROM unnest(k.comps) AS t(x)
            WHERE x.n = e.lo) cu
          CROSS JOIN LATERAL (
            SELECT x.c AS c FROM unnest(k.comps) AS t(x)
            WHERE x.n = e.hi) cv),
        fin AS (
          SELECT * FROM k ORDER BY i DESC LIMIT 1)
        SELECT (SELECT CAST(count(*) AS BIGINT) FROM nodes) AS n_nodes,
               (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
               (SELECT CAST(count(*) AS BIGINT) FROM nodes)
                 - fin.acc_e AS n_components,
               fin.acc_e AS msf_edges,
               fin.acc_w AS msf_weight,
               fin.acc_ck AS edge_checksum
        FROM fin
    """
    return oracles
