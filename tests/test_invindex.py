"""Inverted index (ops/invindex.py): postings vs a Counter reference,
pruned partition reads, boolean AND, missing terms."""

import os

import pyarrow as pa
import pytest

from ocr_service_ray.ops.invindex import InvertedIndex

DOCS = [
    "the cat sat on the mat",
    "a dog and a cat",
    "dogs only here",
    "cat cat cat",
]


def _ds():
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(len(DOCS)), pa.int64()),
                "text": pa.array(DOCS),
            }
        )
    )


@pytest.fixture(scope="module")
def built(ray_session, tmp_path_factory):
    idx = InvertedIndex(num_buckets=8)
    return idx.build(_ds(), str(tmp_path_factory.mktemp("inv")))


def test_postings_match_reference(built):
    got = built.postings("cat").to_pandas().set_index("doc_id")["tf"].to_dict()
    assert got == {0: 1, 1: 1, 3: 3}


def test_lookup_reads_one_bucket(built):
    # the pruning contract: a lookup path is exactly one of the
    # num_buckets partitions, and fewer partitions than exist on disk
    parts = [
        d for d in os.listdir(built.index_path) if d.startswith("term_bucket=")
    ]
    assert len(parts) > 1
    assert len(built.lookup_paths("cat")) == 1


def test_search_and(built):
    assert built.search_and(["cat", "the"]) == [0]
    assert built.search_and(["cat"]) == [0, 1, 3]
    assert built.search_and(["cat", "dogs"]) == []


def test_missing_term(built):
    assert built.search_and(["unicorn"]) == []
    assert built.postings("unicorn").to_pandas().empty
