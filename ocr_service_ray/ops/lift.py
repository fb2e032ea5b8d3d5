"""Association lift over (basket, item) pairs — market-basket
strength as an exact integer ratio.

For each unordered item pair (a < b):

    lift = P(a,b) / (P(a) * P(b))
         = n_pair * n_baskets / (n_a * n_b)

emitted as ``lift_ppm = floor(1e6 * n_pair * n_baskets / (n_a *
n_b))`` — the intermediate product overflows int64, so the closing
division runs in Python bigints on the driver over the
|items|^2-bounded pair frame (HUGEINT in the DuckDB oracle).

Distributed shape (the frequent_part_pairs recipe, plus marginals):
1. one combiner dedupe of (basket, item);
2. one bucketed exchange on basket; each basket explodes to its
   C(k,2) sorted pairs (bounded by the per-basket item count — the
   caller's contract, as for frequent_part_pairs);
3. one combiner count per pair + one per item + a global basket
   count (tiny exchanges).
Raw rows shuffle once; the driver only touches vocabulary-bounded
frames.
"""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pandas as pd
import pyarrow as pa


def pair_lift(ds, basket_col: str, item_col: str) -> pd.DataFrame:
    """DataFrame ``(item_a, item_b, n_pair, n_a, n_b, n_baskets,
    lift_ppm)`` for every item pair co-occurring in >= 1 basket."""
    from .agg import bucketed_map_groups, grouped_agg

    def prep(b: pa.Table) -> pa.Table:
        return pa.table({"b": b[basket_col], "i": b[item_col]})

    distinct = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["b", "i"],
        {"n": (None, "count")},
    )

    def explode(g: pd.DataFrame) -> pd.DataFrame:
        items = sorted(g["i"].tolist())
        if len(items) < 2:
            return pd.DataFrame({"item_a": [], "item_b": []})
        pairs = list(combinations(items, 2))
        return pd.DataFrame(
            {"item_a": [p[0] for p in pairs], "item_b": [p[1] for p in pairs]}
        )

    pair_counts = grouped_agg(
        bucketed_map_groups(distinct, ["b"], explode),
        ["item_a", "item_b"],
        {"n_pair": (None, "count")},
    ).to_pandas()
    marginals = (
        grouped_agg(distinct, ["i"], {"n": (None, "count")})
        .to_pandas()
        .set_index("i")["n"]
    )
    n_baskets = int(
        grouped_agg(distinct, ["b"], {"n": (None, "count")}).count()
    )

    if pair_counts.empty:
        return pd.DataFrame(
            columns=[
                "item_a", "item_b", "n_pair", "n_a", "n_b", "n_baskets", "lift_ppm",
            ]
        )
    n_a = marginals.loc[pair_counts["item_a"]].to_numpy(dtype=np.int64)
    n_b = marginals.loc[pair_counts["item_b"]].to_numpy(dtype=np.int64)
    lift = [
        (1_000_000 * int(np_) * n_baskets) // (int(a) * int(b))
        for np_, a, b in zip(pair_counts["n_pair"], n_a, n_b)
    ]
    out = pair_counts.copy()
    out["n_a"] = n_a
    out["n_b"] = n_b
    out["n_baskets"] = np.int64(n_baskets)
    out["lift_ppm"] = np.array(lift, dtype=np.int64)
    return out.astype(
        {"n_pair": "int64", "n_a": "int64", "n_b": "int64",
         "n_baskets": "int64", "lift_ppm": "int64"}
    )


def pair_count_cosine(
    ds, item_col: str, member_col: str, scale: int = 1_000_000
) -> pd.DataFrame:
    """Item–item cosine similarity over per-member count vectors —
    the collaborative-filtering co-occurrence kernel (two event types
    are similar when the same members do both, weighted by how much).
    Exact and sqrt-free: with integer count vectors c_a, c_b over the
    member axis, report the SIGNED SQUARED cosine in ppm (counts are
    non-negative, so the sign is always +; kept for interface parity
    with centroid_cosine_pairs):

        cos2_ppm = floor( scale * (Σ_m c_a(m) c_b(m))^2
                          / (Σ c_a^2 * Σ c_b^2) )

    Distribution: one combiner collapses raw rows to (item, member)
    counts; ONE bucketed shuffle on the member then emits, per member,
    its items' pairwise products (|items-per-member| is category-
    bounded) plus squares; a final combiner sums dot products and
    norms. Raw rows shuffle once; the close is |item-pairs| driver
    arithmetic in Python bigints.

    Returns a DataFrame (item_a, item_b, n_members_both, cos2_ppm)
    for pairs with at least one co-active member."""
    from ocr_service_ray.ops.agg import bucketed_map_groups, grouped_agg

    pair = grouped_agg(
        ds.select_columns([item_col, member_col]),
        [item_col, member_col],
        {"c": (None, "count")},
    )

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        items = g[item_col].tolist()
        cs = [int(v) for v in g["c"]]
        order = sorted(range(len(items)), key=lambda i: items[i])
        a_col, b_col, prod, both = [], [], [], []
        for x, y in combinations(order, 2):
            a_col.append(items[x])
            b_col.append(items[y])
            prod.append(cs[x] * cs[y])
            both.append(1)
        # per-item squares ride along as self-pairs (item, item)
        for i in order:
            a_col.append(items[i])
            b_col.append(items[i])
            prod.append(cs[i] * cs[i])
            both.append(1)
        return pd.DataFrame(
            {"item_a": a_col, "item_b": b_col, "prod": prod, "both": both}
        )

    sums = grouped_agg(
        bucketed_map_groups(
            pair.select_columns([member_col, item_col, "c"]),
            [member_col],
            emit,
        ),
        ["item_a", "item_b"],
        {"dot": ("prod", "sum"), "n_members_both": ("both", "sum")},
    ).to_pandas()
    norms = {
        r["item_a"]: int(r["dot"])
        for _, r in sums[sums["item_a"] == sums["item_b"]].iterrows()
    }
    cross = sums[sums["item_a"] != sums["item_b"]].copy()
    cos = [
        (scale * int(d) * int(d)) // (norms[a] * norms[b])
        for a, b, d in zip(cross["item_a"], cross["item_b"], cross["dot"])
    ]
    out = pd.DataFrame(
        {
            "item_a": cross["item_a"].to_numpy(),
            "item_b": cross["item_b"].to_numpy(),
            "n_members_both": cross["n_members_both"].astype("int64").to_numpy(),
            "cos2_ppm": pd.array(cos, dtype="int64"),
        }
    )
    return out.sort_values(["item_a", "item_b"]).reset_index(drop=True)


def frequent_triples(
    ds,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    pair_support: int | None = None,
):
    """Frequent 3-itemsets with APRIORI pruning — candidate triples
    are enumerated per basket ONLY when all three sub-pairs are
    frequent (a triple's support can't exceed any sub-pair's), so the
    combinatorial explode is gated by the frequent-pair set instead of
    basket size alone. ``pair_support`` defaults to ``min_support``
    (the tightest admissible prune).

    Distributed shape: distinct (basket, item) pairs in one combiner;
    frequent PAIRS from one bounded per-basket explode + combiner
    (the frequent_part_pairs recipe); the pair set broadcasts via
    ``ray.put`` (pattern-vocabulary bounded — the Apriori contract);
    a second per-basket pass emits only pruned triples; a final
    combiner counts and filters. Returns a Dataset
    (item_a, item_b, item_c, n_baskets), items ordered ascending."""
    from itertools import combinations

    import ray

    from ocr_service_ray.ops.agg import grouped_agg

    pair_support = min_support if pair_support is None else pair_support

    distinct = grouped_agg(
        ds.select_columns([basket_col, item_col]),
        [basket_col, item_col],
        {"_c": (None, "count")},
    ).select_columns([basket_col, item_col]).materialize()

    def explode_pairs(g: pd.DataFrame) -> pd.DataFrame:
        items = sorted(g[item_col].tolist())
        if len(items) < 2:
            return None
        a, b = zip(*combinations(items, 2))
        return pd.DataFrame({"a": list(a), "b": list(b)})

    from ocr_service_ray.ops.agg import bucketed_map_groups

    pairs = grouped_agg(
        bucketed_map_groups(distinct, [basket_col], explode_pairs),
        ["a", "b"],
        {"n": (None, "count")},
    ).to_pandas()
    freq_pairs = {
        (x, y)
        for x, y, n in zip(pairs["a"], pairs["b"], pairs["n"])
        if int(n) >= pair_support
    }
    pairs_ref = ray.put(freq_pairs)

    # bucketed_map_groups takes a plain fn; bind the broadcast set once
    # per process via a closure over the object ref
    freq_local = {}

    def emit_triples(g: pd.DataFrame) -> pd.DataFrame:
        if "fp" not in freq_local:
            freq_local["fp"] = ray.get(pairs_ref)
        fp = freq_local["fp"]
        items = sorted(g[item_col].tolist())
        if len(items) < 3:
            return None
        rows_a, rows_b, rows_c = [], [], []
        for x, y, z in combinations(items, 3):
            if (x, y) in fp and (x, z) in fp and (y, z) in fp:
                rows_a.append(x)
                rows_b.append(y)
                rows_c.append(z)
        if not rows_a:
            return None
        return pd.DataFrame(
            {"item_a": rows_a, "item_b": rows_b, "item_c": rows_c}
        )

    counted = grouped_agg(
        bucketed_map_groups(distinct, [basket_col], emit_triples),
        ["item_a", "item_b", "item_c"],
        {"n_baskets": (None, "count")},
    )
    import pyarrow as pa
    import pyarrow.compute as pc

    # Empty-result schema anchor: when NO basket yields a pruned
    # triple (reachable at real scales — observed at sf0.1), every
    # emit returns None, the agg dataset has zero blocks, and the
    # result would be SCHEMA-LESS (Ray's zero-row landmine). A
    # one-empty-block union pins the declared output schema so
    # downstream consumers (and the oracle compare) always see
    # (item_a, item_b, item_c, n_baskets).
    dsch = distinct.schema()
    item_type = dsch.types[dsch.names.index(item_col)]
    if not isinstance(item_type, pa.DataType):
        item_type = pa.from_numpy_dtype(item_type)
    out_schema = pa.schema(
        [
            ("item_a", item_type),
            ("item_b", item_type),
            ("item_c", item_type),
            ("n_baskets", pa.int64()),
        ]
    )

    def fin(b: pa.Table) -> pa.Table:
        if b.num_rows == 0 or "n_baskets" not in b.column_names:
            return out_schema.empty_table()
        return b.filter(pc.greater_equal(b["n_baskets"], min_support))

    import ray.data as rd

    anchor = rd.from_arrow(out_schema.empty_table())
    return anchor.union(counted.map_batches(fin, batch_format="pyarrow"))
