"""Snapshot diff (ops/diff.py): added/removed/changed classification,
identical snapshots, empty sides."""

import pyarrow as pa
import pytest

from ocr_service_ray.ops.diff import snapshot_diff_table


def _ds(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows]),
            }
        )
    )


def test_diff_classification(ray_session):
    old = _ds([(1, "one"), (2, "two"), (3, "three"), (4, "four")])
    new = _ds([(2, "two"), (3, "THREE v2"), (4, "four"), (9, "nine")])
    out = snapshot_diff_table(old, new)
    got = {(r.doc_id, r.status) for r in out.itertuples()}
    assert got == {(1, "removed"), (3, "changed"), (9, "added")}


def test_identical_snapshots(ray_session):
    rows = [(i, f"t{i}") for i in range(50)]
    out = snapshot_diff_table(_ds(rows), _ds(rows))
    assert out.empty


def test_empty_old(ray_session):
    out = snapshot_diff_table(_ds([]), _ds([(1, "a"), (2, "b")]))
    assert {(r.doc_id, r.status) for r in out.itertuples()} == {
        (1, "added"),
        (2, "added"),
    }
