"""Connected components over a near-duplicate pair graph — the
clustering step that turns pairwise dedup candidates into "keep one
canonical document per duplicate cluster".

``ops/dedup.py`` produces verified PAIRS (minhash/simhash/embedding);
dropping one side of every pair over-deletes when duplicates chain
(a~b, b~c: dropping b's partner in both pairs can delete two of the
three). The standard corpus-curation step is: connected components of
the pair graph → keep the minimum id of each component. This module
computes exact component labels with iterative min-label propagation,
expressed entirely as Dataset ops:

    round:  labels(v) ← min(labels(v), min over neighbors u labels(u))
            == one hash join (edge endpoint → label) + one combiner
            grouped-agg min; repeat until the label table stops
            changing (labels are monotone non-increasing, so an
            unchanged (node, label) digest IS the fixpoint).

Scale shape (100 TB corpus): every round touches only the PAIR GRAPH
— |nodes| is bounded by documents that have at least one near-dup,
|edges| by the verified-pair count; the corpus itself is never read.
The label table is materialized once per round (it is the loop-carried
state; re-executing its lineage each round would recompute the
upstream LSH). Every round ALSO pointer-jumps
(labels(v) absorbs labels(labels(v)) via one self-join of the label
table), so chain depth halves per round and even deep-path graphs
converge in O(log diameter) rounds; near-dup components are clique-ish
(duplicates of one source document) and still finish in 2-4 rounds.
``max_iters`` is a safety valve only (diameter > 2^max_iters).

The DuckDB oracle (``dedup_clusters`` in ``__ray_entry__.py``)
recomputes the same labels with a recursive CTE over the same SQL
pair set, so the whole pairs→clusters path is driver-verified.
"""

from __future__ import annotations

from ocr_service_ray.ops.pool import bcast_pool, bcast_stage

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _project(ds, mapping: dict[str, str]):
    """Rename/project columns in one vectorized pass."""

    def f(b: pa.Table) -> pa.Table:
        return pa.table({out: b[src] for out, src in mapping.items()})

    return ds.map_batches(f, batch_format="pyarrow")


def _digest(labels_ds) -> tuple[int, int]:
    """Order-independent digest of the (node, cluster_id) table:
    wrapping uint64 sum of element-pure pair hashes + row count.
    Labels only ever decrease, so digest equality ⟺ fixpoint (up to a
    2^-64 collision)."""
    from ocr_service_ray.ops.hashing import hash_pair_columns

    def h(b: pa.Table) -> pa.Table:
        hp = hash_pair_columns(b["node"], b["cluster_id"])
        return pa.table(
            {
                "h": pa.array([int(hp.sum(dtype=np.uint64))], pa.uint64()),
                "n": pa.array([len(b)], pa.int64()),
            }
        )

    t = labels_ds.map_batches(h, batch_format="pyarrow").to_pandas()
    if len(t) == 0:  # zero-block input: no partial rows at all
        return (0, 0)
    return (
        int(t["h"].to_numpy(dtype=np.uint64).sum(dtype=np.uint64)),
        int(t["n"].sum()),
    )


def _empty_labels(pairs_ds, src_col: str):
    """Typed empty (node, cluster_id) Dataset — grouped_agg over zero
    blocks yields a schemaless Dataset otherwise."""
    import ray.data as rd

    s = pairs_ds.schema()
    base = getattr(s, "base_schema", s)
    if isinstance(base, pa.Schema):
        id_type = base.field(src_col).type
    elif base is None:
        # fully schemaless input (every upstream block was a zero-row
        # normalized block, e.g. a union of empty map outputs) — the
        # id type is unknowable; int64 is only a placeholder on a
        # zero-row table every caller treats as "no clusters"
        id_type = pa.int64()
    else:  # PandasBlockSchema
        id_type = pa.from_numpy_dtype(dict(zip(base.names, base.types))[src_col])
    return rd.from_arrow(
        pa.table(
            {"node": pa.array([], id_type), "cluster_id": pa.array([], id_type)}
        )
    )


def _driver_union_find(edges, pairs_ds, src_col: str):
    """Small-graph fast path: classic path-compressed union-find over
    the pulled edge table. Input size is pre-checked against
    ``driver_threshold``; output is identical to the distributed
    loop's fixpoint (min id per component)."""
    import ray.data as rd

    df = edges.to_pandas()
    if df.empty:
        return _empty_labels(pairs_ds, src_col)
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for a, b in zip(df["node"], df["nbr"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = list(parent)
    labels = [find(x) for x in nodes]
    id_type = edges.schema().base_schema.field("node").type
    return rd.from_arrow(
        pa.table(
            {
                "node": pa.array(nodes, id_type),
                "cluster_id": pa.array(labels, id_type),
            }
        )
    )


def connected_components(
    pairs_ds,
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iters: int = 25,
    driver_threshold: int = 1_000_000,
):
    """Exact component labels for the undirected pair graph.

    Returns a Dataset ``(node, cluster_id)`` — one row per node that
    appears in any pair; ``cluster_id`` is the minimum node id of its
    component (ids must be totally ordered: ints or strings).

    Graphs with ≤ ``driver_threshold`` directed edges collapse
    driver-side with union-find (the edge table is already bounded by
    verified near-dup pairs, so most corpora land here — one tiny
    pull replaces per-round shuffle fixed costs, measured 5s → ms at
    sf0.1); larger graphs run the distributed min-label loop. Both
    paths produce identical labels (tested equal on random graphs).
    Set ``driver_threshold=0`` to force the distributed path."""
    from ocr_service_ray.ops.agg import grouped_agg
    from ocr_service_ray.ops.relational import hash_join

    def both_dirs(b: pa.Table) -> pa.Table:
        fwd = pa.table({"node": b[src_col], "nbr": b[dst_col]})
        rev = pa.table({"node": b[dst_col], "nbr": b[src_col]})
        return pa.concat_tables([fwd, rev]).combine_chunks()

    # Materialized once: the edge list is re-joined every round, and
    # leaving it lazy would re-run the upstream pair derivation (LSH,
    # verification) per round.
    edges = pairs_ds.map_batches(both_dirs, batch_format="pyarrow").materialize()

    if edges.count() <= driver_threshold:
        return _driver_union_find(edges, pairs_ds, src_col)

    def with_self(b: pa.Table) -> pa.Table:
        self_rows = pa.table({"node": b["node"], "nbr": b["node"]})
        return pa.concat_tables([b, self_rows]).combine_chunks()

    # The label table is loop-carried state and feeds the LEFT side of
    # the jump join; map_groups emits schema-less zero-row blocks for
    # empty shuffle partitions, and map transforms pass them through
    # untouched (Ray never calls the fn on an empty block) — pyarrow's
    # join then fails on the missing key field. repartition() merges
    # them away and bounds block-count growth across rounds.
    n_parts = max(2, min(64, edges.num_blocks()))
    labels = (
        grouped_agg(
            edges.map_batches(with_self, batch_format="pyarrow"),
            ["node"],
            {"cluster_id": ("nbr", "min")},
        )
        .repartition(n_parts)
        .materialize()
    )
    prev = _digest(labels)
    if prev[1] == 0:
        return _empty_labels(pairs_ds, src_col)

    for _ in range(max_iters):
        # neighbor labels: one shuffle join keyed by the edge endpoint
        msgs = _project(
            hash_join(
                edges,
                _project(labels, {"nbr": "node", "lbl": "cluster_id"}),
                on="nbr",
            ),
            {"node": "node", "lbl": "lbl"},
        )
        own = _project(labels, {"node": "node", "lbl": "cluster_id"})
        # pointer jump (the hash-to-min escalation, run every round):
        # shortcut label-of-label via one self-join of the label table
        # — labels(v) can absorb labels(labels(v)), so chain depth
        # HALVES per round and deep-path graphs converge in O(log
        # diameter) rounds instead of O(diameter). Near-dup cliques
        # still converge in 2-4 rounds exactly as before; the jump
        # join touches only the |nodes|-row label table.
        jump = _project(
            hash_join(
                _project(labels, {"node": "node", "mid": "cluster_id"}),
                _project(labels, {"mid": "node", "lbl": "cluster_id"}),
                on="mid",
            ),
            {"node": "node", "lbl": "lbl"},
        )
        labels = (
            grouped_agg(
                msgs.union(own).union(jump), ["node"], {"cluster_id": ("lbl", "min")}
            )
            .repartition(n_parts)  # scrub schema-less empty blocks
            .materialize()
        )
        cur = _digest(labels)
        if cur == prev:
            return labels
        prev = cur
    raise RuntimeError(
        f"connected_components did not converge in {max_iters} rounds — "
        "with per-round pointer jumping this needs diameter > "
        f"2^{max_iters}; raise max_iters"
    )


def keep_canonical(
    ds,
    pairs_ds,
    id_col: str = "doc_id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
):
    """Corpus with near-duplicate clusters collapsed to one document:
    drops every doc whose component label is not its own id (the
    canonical survivor is the minimum id). The drop set is broadcast
    (``ray.put`` once, ``pc.is_in`` per batch) — its size is bounded
    by the number of DUPLICATES, never the corpus."""
    import pyarrow.compute as pc
    import ray

    comps = connected_components(pairs_ds, src_col, dst_col).to_pandas()
    if comps.empty:  # Ray's to_pandas drops columns on zero-row datasets
        return ds
    drop_ids = comps.loc[comps["node"] != comps["cluster_id"], "node"]
    drop_arr = pa.array(drop_ids.to_numpy())
    drop_ref = ray.put(drop_arr)

    class DropFilter:
        def __init__(self):
            self.drop = ray.get(drop_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            if len(self.drop) == 0:
                return b
            keep = pc.invert(pc.is_in(b[id_col], value_set=self.drop))
            return b.filter(keep)

    return bcast_stage(ds, DropFilter, drop_arr.nbytes)


def pagerank_int(
    edges_ds,
    src_col: str = "src",
    dst_col: str = "dst",
    iters: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    scale: int = 1_000_000,
    driver_threshold: int = 1_000_000,
):
    """INTEGER PageRank — the distributed iterative graph shape with a
    twist that makes it EXACTLY reproducible in SQL: every quantity is
    an int64 micro-unit and every division is floor division, so rank
    vectors are bit-identical across engines, layouts and cluster
    sizes (float PageRank is association-order-dependent and can only
    ever be approximately compared).

    Per round (the textbook distributed plan):
      contribution(u→v) = rank(u) // out_degree(u)
      rank'(v) = (1-d)*scale + (d_num * Σ contributions into v) // d_den
    computed as ONE hash join (ranks ⋈ edges on src) + ONE combiner
    ``grouped_agg`` sum per round — ranks and edges stay distributed;
    the driver holds nothing. Nodes with no in-edges decay to the
    teleport term; dangling mass is dropped (the simple variant —
    callers wanting it redistributed add the sink term themselves).

    ``iters`` is fixed (not convergence-tested) so the oracle can
    unroll the same number of rounds. Returns {node, rank_micro}.

    Graphs with ≤ ``driver_threshold`` directed edges run the SAME
    integer arithmetic driver-side over the pulled edge table (the
    ``connected_components`` fast-path rule — the edge table is
    pair-bounded, and per-round shuffle fixed costs dwarf a tiny
    graph: measured 80s → ms at 20 nodes); larger graphs run the
    distributed loop. Identical results by construction — the
    arithmetic is integer and order-free. Set ``driver_threshold=0``
    to force the distributed path.
    """
    from ocr_service_ray.ops.agg import grouped_agg
    from ocr_service_ray.ops.relational import hash_join

    base = ((damping_den - damping_num) * scale) // damping_den

    edges_ds = edges_ds.materialize()  # read 2-3x below whatever the path
    if edges_ds.count() <= driver_threshold:
        import ray.data as rd

        df = edges_ds.to_pandas()
        if df.empty:
            s = edges_ds.schema()
            base_s = getattr(s, "base_schema", s)
            id_type = (
                base_s.field(src_col).type
                if isinstance(base_s, pa.Schema)
                else pa.int64()
            )
            return rd.from_arrow(
                pa.table(
                    {
                        "node": pa.array([], id_type),
                        "rank_micro": pa.array([], pa.int64()),
                    }
                )
            )
        node_list = sorted(set(df[src_col]) | set(df[dst_col]))
        idx = {n: i for i, n in enumerate(node_list)}
        src_i = df[src_col].map(idx).to_numpy(dtype=np.int64)
        dst_i = df[dst_col].map(idx).to_numpy(dtype=np.int64)
        deg_arr = np.bincount(src_i, minlength=len(node_list)).astype(np.int64)
        rank = np.full(len(node_list), scale, dtype=np.int64)
        safe_deg = np.maximum(deg_arr, 1)
        for _ in range(iters):
            contrib = np.zeros(len(node_list), dtype=np.int64)
            np.add.at(contrib, dst_i, rank[src_i] // safe_deg[src_i])
            rank = base + (damping_num * contrib) // damping_den
        return rd.from_arrow(
            pa.table(
                {
                    "node": pa.array(node_list),
                    "rank_micro": pa.array(rank),
                }
            )
        )

    # out-degree and the node set (nodes = every src/dst endpoint).
    # repartition: map_groups emits schema-less zero-row blocks for
    # empty shuffle partitions, and pyarrow's join rejects them (same
    # landmine as connected_components' label table)
    deg = grouped_agg(edges_ds, [src_col], {"deg": (None, "count")}).repartition(2)
    nodes = (
        edges_ds.map_batches(
            lambda b: pa.table({"node": b[src_col]}), batch_format="pyarrow"
        )
        .union(
            edges_ds.map_batches(
                lambda b: pa.table({"node": b[dst_col]}), batch_format="pyarrow"
            )
        )
    )
    nodes = (
        grouped_agg(nodes, ["node"], {"_c": (None, "count")})
        .drop_columns(["_c"])
        .repartition(2)
    )

    # rank table: start uniform at `scale`; join degree once (degree is
    # loop-invariant) — carried through every round's rank table
    ranks = hash_join(
        nodes.map_batches(
            lambda b: b.append_column(
                "rank_micro", pa.array(np.full(len(b), scale, dtype=np.int64))
            ),
            batch_format="pyarrow",
        ),
        deg.map_batches(
            lambda b: pa.table({"node": b[src_col], "deg": b["deg"]}),
            batch_format="pyarrow",
        ),
        on="node",
        join_type="left_outer",
    )
    # loop-carried state, read twice per round; repartition merges the
    # join's schema-less empty partitions away before the NEXT join
    ranks = ranks.repartition(2).materialize()

    def to_contrib(b: pa.Table) -> pa.Table:
        # PURE integer floor division (numpy) — a float divide + floor
        # can round up across an integer boundary and diverge from
        # SQL's `//`
        r = b["rank_micro"].to_numpy(zero_copy_only=False).astype(np.int64)
        d_raw = b["deg"].to_numpy(zero_copy_only=False)
        valid = ~pd.isna(d_raw)
        d = np.where(valid, d_raw, 1).astype(np.int64)
        c = np.where(valid, r // np.maximum(d, 1), 0).astype(np.int64)
        return pa.table({src_col: b["node"], "_contrib": pa.array(c)})

    for _ in range(iters):
        contrib = hash_join(
            edges_ds,
            ranks.map_batches(to_contrib, batch_format="pyarrow"),
            on=src_col,
        )
        sums = grouped_agg(
            contrib.map_batches(
                lambda b: pa.table({"node": b[dst_col], "c": b["_contrib"]}),
                batch_format="pyarrow",
            ),
            ["node"],
            {"in_sum": ("c", "sum")},
        ).repartition(2)
        new_ranks = hash_join(
            ranks.select_columns(["node", "deg"]),
            sums,
            on="node",
            join_type="left_outer",
        ).map_batches(
            lambda b: pa.table(
                {
                    "node": b["node"],
                    "deg": b["deg"],
                    "rank_micro": pc.cast(
                        pa.array(
                            base
                            + (
                                damping_num
                                * pc.coalesce(b["in_sum"], 0)
                                .to_numpy(zero_copy_only=False)
                                .astype(np.int64)
                            )
                            // damping_den
                        ),
                        pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        )
        ranks = new_ranks.repartition(2).materialize()

    return ranks.select_columns(["node", "rank_micro"])


def khop_reach(edges_ds, seed_nodes, hops: int = 2):
    """Bounded-round BFS reach — how many nodes first appear at each
    hop distance from a seed set (0 = seeds). The frontier-expansion
    primitive under "related items within 2 clicks" features and
    contamination blast-radius checks.

    Each round is ONE hash join (undirected edges pre-exploded both
    directions) + one distinct combiner + one distributed EXCEPT
    against the visited set (ops/relational.set_op — no driver-side
    set), so frontiers never land on the driver. Rounds are bounded by
    ``hops``; an empty frontier short-circuits (the fully-empty-join
    schema landmine). Fan-out points materialize (visited feeds both
    the EXCEPT and the next union — shared-lazy-subplan landmine).

    Returns a DataFrame (hop, n_nodes)."""
    import ray.data as rd

    from .agg import grouped_agg
    from .relational import hash_join, set_op

    def both_dirs(b: pa.Table) -> pa.Table:
        lo, hi = b["lo"].combine_chunks(), b["hi"].combine_chunks()
        return pa.table(
            {
                "src": pa.chunked_array([lo, hi]),
                "dst": pa.chunked_array([hi, lo]),
            }
        )

    edges = edges_ds.map_batches(both_dirs, batch_format="pyarrow").materialize()

    frontier = rd.from_arrow(
        pa.table({"node": pa.array(sorted(set(int(s) for s in seed_nodes)), pa.int64())})
    ).materialize()
    visited = frontier
    rows = [{"hop": 0, "n_nodes": frontier.count()}]
    for h in range(1, hops + 1):
        probe = frontier.map_batches(
            lambda b: b.rename_columns(
                ["src" if c == "node" else c for c in b.column_names]
            ),
            batch_format="pyarrow",
        )
        hit = hash_join(edges, probe.repartition(4), on="src")
        nxt = (
            grouped_agg(
                hit.map_batches(
                    lambda b: b.select(["dst"]).rename_columns(["node"]),
                    batch_format="pyarrow",
                ),
                ["node"],
                {"_c": (None, "count")},
            )
            .select_columns(["node"])
        )
        new = set_op(nxt, visited, ["node"], "except").materialize()
        n = new.count()
        rows.append({"hop": h, "n_nodes": n})
        if n == 0:
            break
        visited = visited.union(new).materialize()
        frontier = new
    return pd.DataFrame(rows).astype({"hop": "int64", "n_nodes": "int64"})
