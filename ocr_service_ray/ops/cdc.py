"""Change-data-capture apply — latest-wins upsert/delete merge-on-read
(the Hudi/Delta/Iceberg CDC snapshot materialization: base snapshot ∪
changelog, per key the highest-sequence row wins, a winning delete
tombstone removes the key).

The complement to the equality-delete reader (wave-96): equality
deletes drop keys at strictly-greater sequence; CDC apply REPLACES
rows (upserts carry payload) and deletes are just tombstone-payload
rows in the same totally-ordered log.

100-TB shape: one ``grouped_topk(k=1)`` over the key — each block
keeps its per-key local max-seq candidate, so the shuffle moves at
most one candidate row per (block, key), never the corpus; the
changelog is typically ≪ base, and the union is streaming (no
materialization). Contract: ``seq_col`` is unique per key (a total
version order — standard in CDC logs); ties would be
partition-order-dependent, so the op does not define them.
"""

from __future__ import annotations


def apply_changelog(
    base,
    changes,
    key_col: str,
    seq_col: str = "seq",
    op_col: str = "op",
    delete_op: str = "d",
):
    """Materialize the current snapshot: ``base`` rows must carry
    ``seq_col``/``op_col`` too (callers stamp seq=0, op=upsert —
    keeps the union schema-uniform and lets a changelog replay from
    scratch with an empty base). Returns the surviving rows with
    their winning seq/op columns intact (callers project them off)."""
    from ocr_service_ray.ops.relational import grouped_topk

    log = base.union(changes)
    latest = grouped_topk(
        log, [key_col], by=[seq_col], k=1, descending=[True]
    )

    def survivors(b):
        return b[b[op_col] != delete_op]

    return latest.map_batches(survivors, batch_format="pandas", batch_size=None)
