"""Snapshot diff — what changed between two corpus versions.

Incremental ingest at 100 TB reprocesses the DELTA, not the corpus:
given the previous snapshot and the new crawl, emit the added /
removed / changed document ids. Built as two hash-partitioned
LEFT OUTER joins over (id, content-hash) projections — the text never
shuffles, only 8-byte hashes keyed by id (Ray 2.49's ``full_outer``
drops left-only rows — verified — so the diff is composed from the
two directed left joins instead).

Content identity is the int64 md5-prefix (15 hex chars) of the text —
the repo-wide SQL-reproducible hash. The changed/added/removed sets
are bounded by CHURN, never the corpus.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _hash_proj(ds, id_col: str, text_col: str, hash_name: str):
    def f(b: pa.Table) -> pa.Table:
        hs = np.fromiter(
            (
                int(hashlib.md5(t.encode("utf-8")).hexdigest()[:15], 16)
                for t in b[text_col].to_pylist()
            ),
            dtype=np.int64,
            count=len(b),
        )
        return pa.table({id_col: b[id_col], hash_name: pa.array(hs)})

    return ds.map_batches(f, batch_format="pyarrow")


def snapshot_diff(
    old_ds,
    new_ds,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Returns ``{"added": Dataset(id), "removed": Dataset(id),
    "changed": Dataset(id)}`` — unchanged docs never leave the
    joins."""
    import pyarrow.compute as pc

    from ocr_service_ray.ops.relational import hash_join

    o = _hash_proj(old_ds, id_col, text_col, "_h_old")
    n = _hash_proj(new_ds, id_col, text_col, "_h_new")

    def ids_of(side):
        return side.map_batches(
            lambda b: pa.table({id_col: b[id_col]}), batch_format="pyarrow"
        )

    def empty_ids():
        import ray.data as rd

        return rd.from_arrow(pa.table({id_col: pa.array([], pa.int64())}))

    # Degenerate snapshots: Ray's hash join raises on a zero-row side
    # (verified ArrowInvalid in the aggregator finalize). Probe
    # emptiness with limit(1) — early-stopping, so a DERIVED input
    # (map_batches/union lineage, as q_snapshot_diff passes) executes
    # at most one block; count() would have run the full upstream plan
    # once extra (it is metadata-only for plain parquet reads ONLY).
    # The identity map blocks limit pushdown into a Union, which hits
    # a Ray 2.49 planner assertion (len(physical_children) >= 2).
    def _is_empty(ds) -> bool:
        shielded = ds.map_batches(lambda b: b, batch_format="pyarrow")
        return len(shielded.limit(1).take(1)) == 0

    if _is_empty(old_ds):
        return {"removed": empty_ids(), "added": ids_of(n), "changed": empty_ids()}
    if _is_empty(new_ds):
        return {"removed": ids_of(o), "added": empty_ids(), "changed": empty_ids()}

    old_side = hash_join(o, n, on=id_col, join_type="left_outer")
    new_side = hash_join(n, o, on=id_col, join_type="left_outer")

    # removed AND changed come from the SAME join output — fold both
    # into one (id, status) pass and materialize THAT (churn-bounded
    # by contract), so the old-side join executes once, not once per
    # consumer (measured 2x the query cost when left lazy).
    def old_statuses(b: pa.Table) -> pa.Table:
        removed = pc.is_null(b["_h_new"])
        both = pc.and_(pc.is_valid(b["_h_old"]), pc.is_valid(b["_h_new"]))
        changed = pc.fill_null(
            pc.and_(both, pc.not_equal(b["_h_old"], b["_h_new"])), False
        )
        keep = pc.or_(removed, changed)
        sub = b.filter(keep)
        status = np.where(
            pc.is_null(sub["_h_new"]).to_numpy(zero_copy_only=False),
            "removed",
            "changed",
        )
        return pa.table(
            {id_col: sub[id_col], "_status": pa.array(status.tolist(), pa.string())}
        )

    delta_old = old_side.map_batches(
        old_statuses, batch_format="pyarrow"
    ).materialize()

    def pick(status: str):
        def f(b: pa.Table) -> pa.Table:
            return pa.table(
                {id_col: b.filter(pc.equal(b["_status"], status))[id_col]}
            )

        return f

    def only_added(b: pa.Table) -> pa.Table:
        return pa.table({id_col: b.filter(pc.is_null(b["_h_old"]))[id_col]})

    return {
        "removed": delta_old.map_batches(pick("removed"), batch_format="pyarrow"),
        "added": new_side.map_batches(only_added, batch_format="pyarrow"),
        "changed": delta_old.map_batches(pick("changed"), batch_format="pyarrow"),
    }


def snapshot_diff_table(old_ds, new_ds, id_col: str = "doc_id",
                        text_col: str = "text"):
    """One ``(id, status)`` DataFrame — delta sets are churn-bounded,
    so the driver concat is fine by contract."""
    import pandas as pd

    parts = []
    for status, ds in snapshot_diff(old_ds, new_ds, id_col, text_col).items():
        df = ds.to_pandas()
        if df.empty:  # Ray's to_pandas drops columns on zero-row datasets
            continue
        df["status"] = status
        parts.append(df)
    if not parts:
        return pd.DataFrame({id_col: [], "status": []})
    return pd.concat(parts, ignore_index=True)


def table_checksum(ds, cols: list[str], mod: int = (1 << 63) - 25):
    """Order-invariant content checksum of a table projection — the
    cheap cross-cluster verification primitive (does the re-run /
    resumed run / replicated copy hold EXACTLY the same rows?).

    checksum = sum over rows of int64-md5-prefix('|'-joined column
    strings), mod a < 2^63 prime. Addition commutes, so block order,
    partitioning and shuffle layout cannot change the result; any
    lost, duplicated or altered row does. Each block folds to ONE
    partial (Python-int accumulation — no int64 overflow), the
    driver folds |blocks| partials.

    Contract: int / string columns only (str(int) must equal SQL's
    CAST(BIGINT AS VARCHAR)); the default mod is prime so paired
    corruptions don't cancel. Returns a 1-row pandas DataFrame
    (n_rows, checksum).
    """
    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        arrs = [b[c].to_pylist() for c in cols]
        acc = 0
        for vals in zip(*arrs):
            s = "|".join(str(v) for v in vals)
            acc += int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
        return pa.table(
            {
                "_n": pa.array([len(b)], type=pa.int64()),
                "_sum": pa.array([acc % mod], type=pa.int64()),
            }
        )

    n_rows, acc = 0, 0
    for batch in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        n_rows += sum(batch["_n"].to_pylist())
        acc = (acc + sum(batch["_sum"].to_pylist())) % mod
    return pd.DataFrame({"n_rows": [n_rows], "checksum": [acc]}).astype("int64")


def checksum_tree(
    ds, cols: list[str], part_col: str, mod: int = (1 << 63) - 25
):
    """Hierarchical (Merkle-style) content checksum: one order-
    invariant ``table_checksum`` per partition value PLUS a root digest
    over the sorted (partition, checksum) leaves — the incremental-sync
    primitive: a replica compares the root first, then walks only the
    partitions whose leaf digests differ instead of re-hashing 100 TB.

    Leaves: checksum = sum of row md5-prefix ints mod ``mod`` (same row
    recipe and contract as ``table_checksum``; ``part_col`` must be an
    int column, e.g. an epoch day). Root: sum over leaves of
    md5-prefix('d<part>:<checksum>') mod ``mod`` — changes when any
    leaf changes or a partition is relabeled, order-invariant over
    leaves. Each block folds to <= |parts-in-block| partial rows; the
    driver close is |parts|-bounded. Returns (part, n_rows, checksum)
    rows plus the root row with part = -1.
    """
    import pandas as pd

    def partial(b: pa.Table) -> pa.Table:
        parts = b[part_col].to_pylist()
        arrs = [b[c].to_pylist() for c in cols]
        acc: dict[int, int] = {}
        cnt: dict[int, int] = {}
        for p, vals in zip(parts, zip(*arrs)):
            s = "|".join(str(v) for v in vals)
            h = int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
            acc[p] = (acc.get(p, 0) + h) % mod
            cnt[p] = cnt.get(p, 0) + 1
        ps = sorted(acc)
        return pa.table(
            {
                "part": pa.array([int(p) for p in ps], pa.int64()),
                "_n": pa.array([cnt[p] for p in ps], pa.int64()),
                "_sum": pa.array([acc[p] for p in ps], pa.int64()),
            }
        )

    leaves: dict[int, list[int]] = {}
    for batch in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pyarrow"
    ):
        for p, n, s in zip(
            batch["part"].to_pylist(),
            batch["_n"].to_pylist(),
            batch["_sum"].to_pylist(),
        ):
            cur = leaves.setdefault(p, [0, 0])
            cur[0] += n
            cur[1] = (cur[1] + s) % mod
    rows = [
        {"part": p, "n_rows": leaves[p][0], "checksum": leaves[p][1]}
        for p in sorted(leaves)
    ]
    root = 0
    total = 0
    for r in rows:
        total += r["n_rows"]
        root = (
            root
            + int(
                hashlib.md5(
                    f"d{r['part']}:{r['checksum']}".encode("utf-8")
                ).hexdigest()[:15],
                16,
            )
        ) % mod
    rows.append({"part": -1, "n_rows": total, "checksum": root})
    return pd.DataFrame(rows).astype("int64")
