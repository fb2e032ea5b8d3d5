"""Inverted index over the corpus — term-bucket-partitioned postings
with pruned lookups.

`ops/ranking.bm25_search` scans the corpus per query; a standing
retrieval workload wants a built INDEX instead: one corpus pass
explodes each document to its distinct terms, buckets each posting by
an element-pure term hash, and writes hive-partitioned parquet
(``term_bucket=N/``). A term lookup then reads exactly ONE of
``num_buckets`` partitions (tests assert < 100% of partitions read) —
the text-retrieval analog of ``similarity.IvfIndex``'s cell layout.

Postings are ``(term, doc_id, tf)`` rows; the index lives in storage
(never the object store), lookups return postings Datasets, and the
multi-term AND intersects the (small) posting lists driver-side —
bounded by document frequency, not the corpus.

Scale notes: the build is one streaming pass (explode is the
combiner: ≤ one row per (doc, distinct term)); the shuffle is the
partitioned WRITE itself. Bucket count is the partition-pruning
granularity — size it so a bucket's postings fit a read task
(hot-term skew within a bucket only affects that bucket's file
count). The tokenizer is the repo-wide single-space split.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa

from ocr_service_ray.ops.hashing import hash_column


class InvertedIndex:
    def __init__(self, num_buckets: int = 64, text_col: str = "text",
                 id_col: str = "doc_id"):
        self.num_buckets = num_buckets
        self.text_col = text_col
        self.id_col = id_col
        self.index_path: str | None = None

    def _bucket_of(self, term: str) -> int:
        h = hash_column(pa.array([term], pa.string()))[0]
        return int(h % np.uint64(self.num_buckets))

    def build(self, ds, index_path: str | None = None):
        import tempfile

        num_buckets = self.num_buckets
        id_col, text_col = self.id_col, self.text_col

        def explode(batch: pa.Table) -> pa.Table:
            ids, terms, tfs = [], [], []
            for key, t in zip(
                batch[id_col].to_pylist(), batch[text_col].to_pylist()
            ):
                for term, tf in Counter(t.split(" ")).items():
                    ids.append(key)
                    terms.append(term)
                    tfs.append(tf)
            term_arr = pa.array(terms, pa.string())
            buckets = (hash_column(term_arr) % np.uint64(num_buckets)).astype(
                np.int32
            )
            return pa.table(
                {
                    id_col: pa.array(ids, batch[id_col].type),
                    "term": term_arr,
                    "tf": pa.array(tfs, pa.int64()),
                    "term_bucket": pa.array(buckets),
                }
            )

        self.index_path = index_path or tempfile.mkdtemp(prefix="inv_index_")
        # one streaming pass: read → explode → partitioned write
        ds.map_batches(explode, batch_format="pyarrow").write_parquet(
            self.index_path, partition_cols=["term_bucket"]
        )
        return self

    def lookup_paths(self, term: str) -> list[str]:
        """The single bucket partition a term lookup reads."""
        assert self.index_path is not None, "call build() first"
        return [f"{self.index_path}/term_bucket={self._bucket_of(term)}"]

    def postings(self, term: str):
        """Dataset ``(doc_id, tf)`` for one term — reads one bucket
        partition, filters to the term inside it."""
        import glob

        import pyarrow.compute as pc

        from ocr_service_ray.sources.readers import read_parquet_clean

        files = [
            f
            for p in self.lookup_paths(term)
            for f in sorted(glob.glob(f"{p}/*.parquet"))
        ]
        if not files:
            import ray.data as rd

            return rd.from_arrow(
                pa.table(
                    {self.id_col: pa.array([], pa.int64()),
                     "tf": pa.array([], pa.int64())}
                )
            )
        bucket = read_parquet_clean(
            files, columns=[self.id_col, "term", "tf"]
        )
        return bucket.map_batches(
            lambda b, t=term: b.filter(pc.equal(b["term"], t)).drop_columns(
                ["term"]
            ),
            batch_format="pyarrow",
        )

    def search_and(self, terms: list[str]) -> list:
        """Doc ids containing ALL ``terms`` (boolean AND), sorted.
        Posting lists are df-bounded — the driver intersection is the
        standard shape; a corpus-sized posting list means the term is
        a stopword and should be pruned upstream."""
        sets = []
        for t in terms:
            df = self.postings(t).to_pandas()
            sets.append(set() if df.empty else set(df[self.id_col]))
        if not sets:
            return []
        out = set.intersection(*sets)
        return sorted(out)
