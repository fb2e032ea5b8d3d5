"""Parquet reading with hashable block schemas.

Parquet files written by pandas (including the driver-generated
testdata) embed a ``pandas`` schema-metadata blob; Ray Data hashes
block schemas to deduplicate them when unifying
(``transform_pyarrow.unify_schemas``), and an Arrow schema carrying
that metadata is unhashable (``unhashable type: 'dict'``), so every
such block triggers a per-task WARNING and forces the slow unify
path. Reading with an explicitly stripped schema makes every block's
schema metadata-free (hashable) at the source — no extra pass, no
behavior change.
"""

from __future__ import annotations

import os


def _schema_of(path) -> "pyarrow.Schema | None":  # noqa: F821
    """Footer schema of the first parquet file under ``path`` (file,
    directory, or list), metadata stripped. None when undeterminable
    (then the caller falls back to a plain read)."""
    import pyarrow.parquet as pq

    p = path[0] if isinstance(path, (list, tuple)) else path
    if isinstance(p, str) and os.path.isdir(p):
        names = sorted(
            n for n in os.listdir(p) if n.endswith((".parquet", ".pq"))
        )
        if not names:
            return None
        p = os.path.join(p, names[0])
    try:
        return pq.read_schema(p).remove_metadata()
    except Exception:
        return None


def read_parquet_clean(path, columns=None, **kwargs):
    """``ray.data.read_parquet`` with the file's schema metadata
    stripped (one footer read on the driver). Drop-in replacement for
    every parquet read in this repo.

    The explicit schema must describe the read's OUTPUT exactly: with
    a column selection it is projected to those columns, and when a
    requested column is absent from the footer (a hive partition key)
    the plain read is used instead."""
    import pyarrow as pa
    import ray.data as rd

    schema = _schema_of(path)
    if schema is not None and columns is not None:
        if all(c in schema.names for c in columns):
            schema = pa.schema([schema.field(c) for c in columns])
        else:
            schema = None
    if schema is not None:
        kwargs.setdefault("schema", schema)
    return rd.read_parquet(path, columns=columns, **kwargs)
