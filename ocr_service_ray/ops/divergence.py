"""Distribution-shift / concentration metrics — total-variation
distance per group vs the corpus, and Herfindahl (HHI) concentration
per group. The drift + imbalance monitors a curation pipeline runs
per slice before training.

Both follow the repo's exact-integer oracle discipline: the
data-parallel part is one combiner aggregate over (group, value)
pairs (ops/agg.grouped_agg — raw rows shuffle once, as partials);
the closing ratio is an exact floor division over integer counts —
Python bigints here, HUGEINT in the DuckDB oracle — so no float,
log, or sqrt anywhere.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .agg import grouped_agg


def tv_distance_by_group(
    ds, group_col: str, value_col: str, scale: int = 1_000_000
) -> pd.DataFrame:
    """Total-variation distance between each group's value
    distribution and the corpus-wide distribution, in exact ppm:

        tv(g) = 1/2 * sum_v | c_gv/N_g - c_v/N |
        tv_ppm = floor( scale * sum_v |c_gv*N - N_g*c_v| / (2*N_g*N) )

    The single-division form keeps it exact: the numerator is a sum
    of integer absolute differences (values ABSENT from a group
    contribute |0 - N_g*c_v|), the denominator divides once.

    Distribution: one combiner aggregate collapses the input to
    (group, value) counts; the close runs on the |groups| x |values|
    driver frame (vocabulary-bounded — sources x langs, never rows).
    """
    counts = grouped_agg(
        ds.select_columns([group_col, value_col]),
        [group_col, value_col],
        {"_cnt": (None, "count")},
    ).to_pandas()
    if counts.empty:
        return pd.DataFrame({group_col: [], "n_rows": [], "tv_ppm": []})
    pivot = counts.pivot_table(
        index=group_col, columns=value_col, values="_cnt", aggfunc="sum", fill_value=0
    )
    cell = [[int(v) for v in row] for row in pivot.to_numpy()]
    col_tot = [sum(col) for col in zip(*cell)]
    total = sum(col_tot)
    rows = []
    for gi, gname in enumerate(pivot.index):
        ng = sum(cell[gi])
        num = sum(
            abs(cell[gi][vi] * total - ng * col_tot[vi])
            for vi in range(len(col_tot))
        )
        rows.append(
            {
                group_col: gname,
                "n_rows": ng,
                "tv_ppm": (scale * num) // (2 * ng * total),
            }
        )
    return pd.DataFrame(rows).astype({"n_rows": "int64", "tv_ppm": "int64"})


def grouped_gini(ds, group_col: str, member_col: str, scale: int = 1_000_000):
    """Gini coefficient of each group's activity distribution over its
    members, in exact ppm (0 = perfectly even, →1e6 = one member owns
    everything). Rank form over ascending member counts c_1..c_n:

        gini_ppm = floor( scale * (2*Σ i*c_i - (n+1)*Σ c_i)
                          / (n * Σ c_i) )

    Unlike HHI (a moment, mergeable in one pass) Gini needs the
    per-group SORTED counts, so the close is a per-group fold:
    one combiner aggregate collapses raw rows to (group, member)
    counts, then a single bucketed key shuffle on the group feeds a
    vectorized numpy rank fold — the exchange moves member counts,
    never raw rows, and no group's counts ever sit on the driver.
    Ties in c are order-independent (equal values contribute the same
    Σ i*c_i under any permutation), so no tie-break column is needed.

    Returns a Dataset (group, n_members, n_rows, gini_ppm).
    """
    from .agg import bucketed_map_groups

    pair = grouped_agg(
        ds.select_columns([group_col, member_col]),
        [group_col, member_col],
        {"_cnt": (None, "count")},
    )

    def close(g: pd.DataFrame) -> pd.DataFrame:
        c = sorted(int(v) for v in g["_cnt"])
        n = len(c)
        s0 = sum(c)
        s1 = sum((i + 1) * v for i, v in enumerate(c))
        return pd.DataFrame(
            {
                group_col: [g[group_col].iloc[0]],
                "n_members": pd.array([n], dtype="int64"),
                "n_rows": pd.array([s0], dtype="int64"),
                "gini_ppm": pd.array(
                    [(scale * (2 * s1 - (n + 1) * s0)) // (n * s0)],
                    dtype="int64",
                ),
            }
        )

    return bucketed_map_groups(
        pair.select_columns([group_col, "_cnt"]), [group_col], close
    )


def grouped_hhi(ds, group_col: str, member_col: str, scale: int = 1_000_000):
    """Herfindahl concentration of each group over its members, in
    exact ppm — how dominated a slice is by its heaviest contributors
    (1e6/|members| = uniform, 1e6 = single member):

        hhi_ppm = floor( scale * sum_m c_gm^2 / (sum_m c_gm)^2 )

    Distribution: two combiner aggregates — raw rows collapse to
    (group, member) counts in the first exchange, counts collapse to
    per-group (sum c^2, sum c, members) in the second; no exchange
    ever moves raw rows twice. The closing division runs per
    post-aggregation row with Python bigints (scale * sum_c2 exceeds
    int64 at 100-TB member counts; the oracle uses HUGEINT).

    Returns a Dataset with (group, n_rows, n_members, hhi_ppm).
    """
    pair = grouped_agg(
        ds.select_columns([group_col, member_col]),
        [group_col, member_col],
        {"_cnt": (None, "count")},
    )

    def square(b: pa.Table) -> pa.Table:
        return b.append_column("_cnt2", pc.multiply(b["_cnt"], b["_cnt"]))

    per_g = grouped_agg(
        pair.map_batches(square, batch_format="pyarrow"),
        [group_col],
        {
            "sum_c2": ("_cnt2", "sum"),
            "n_rows": ("_cnt", "sum"),
            "n_members": (None, "count"),
        },
    )

    def close(b: pd.DataFrame) -> pd.DataFrame:
        hhi = [
            (scale * int(s)) // (int(n) * int(n))
            for s, n in zip(b["sum_c2"], b["n_rows"])
        ]
        return pd.DataFrame(
            {
                group_col: b[group_col],
                "n_rows": b["n_rows"].astype("int64"),
                "n_members": b["n_members"].astype("int64"),
                "hhi_ppm": pd.array(hhi, dtype="int64"),
            }
        )

    return per_g.map_batches(close, batch_format="pandas")


def contingency_chi2(ds, row_col: str, col_col: str, scale: int = 1_000_000):
    """Chi-square contingency statistic of two categorical columns,
    reported per row-category in exact ppm — the independence test
    behind seasonality / slice-bias checks (is event mix independent
    of weekday?). Per-cell term with the single-division discipline:

        cell_ppm(r, c) = floor( scale * (o*N - R_r*C_c)^2
                                / (N * R_r * C_c) )
        chi2_ppm(r)    = Σ_c cell_ppm(r, c)

    (the per-cell floor is mirrored verbatim in the oracle, so the sum
    of floors — not the floor of the sum — is the contract; absent
    cells contribute with o = 0). Σ_r chi2_ppm / scale ~ the classic
    X² against chi2((R-1)(C-1)).

    Distribution: ONE combiner aggregate to (row, col) cell counts;
    the close runs on the |rows| x |cols| driver frame (category-
    vocabulary bounded). Returns a DataFrame
    (row_col, n_rows, chi2_ppm)."""
    counts = grouped_agg(
        ds.select_columns([row_col, col_col]),
        [row_col, col_col],
        {"_cnt": (None, "count")},
    ).to_pandas()
    if counts.empty:
        return pd.DataFrame({row_col: [], "n_rows": [], "chi2_ppm": []})
    pivot = counts.pivot_table(
        index=row_col, columns=col_col, values="_cnt", aggfunc="sum", fill_value=0
    )
    cell = [[int(v) for v in row] for row in pivot.to_numpy()]
    col_tot = [sum(col) for col in zip(*cell)]
    total = sum(col_tot)
    rows = []
    for gi, gname in enumerate(pivot.index):
        rr = sum(cell[gi])
        chi = sum(
            (scale * (cell[gi][vi] * total - rr * col_tot[vi]) ** 2)
            // (total * rr * col_tot[vi])
            for vi in range(len(col_tot))
            if col_tot[vi] > 0
        )
        rows.append({row_col: gname, "n_rows": rr, "chi2_ppm": chi})
    return pd.DataFrame(rows).astype({"n_rows": "int64", "chi2_ppm": "int64"})


def ks_distance_by_group(
    ds, group_col: str, value_col: str, scale: int = 1_000_000
):
    """Kolmogorov–Smirnov distance of each group's ORDERED value
    distribution vs the corpus, in exact ppm — the drift monitor for
    numeric columns (TV distance ignores order; KS respects it):

        ks_ppm(g) = floor( scale * max_v |F_g(v)*N_g*N - F(v)*N_g*N|
                           / (N_g * N) )
                  = floor( scale * max_v |cum_g(v)*N - N_g*cum(v)|
                           / (N_g * N) )

    The maximized numerator is exact integer; one division closes.

    Distribution: one combiner aggregate to (group, value) counts;
    the cumulative scan + max runs on the |groups| x |distinct values|
    driver frame — DISTINCT-VALUE bounded by contract (lengths,
    scores, bucketed metrics; not for unbounded-cardinality columns).
    Returns a DataFrame (group, n_rows, ks_ppm)."""
    counts = grouped_agg(
        ds.select_columns([group_col, value_col]),
        [group_col, value_col],
        {"_cnt": (None, "count")},
    ).to_pandas()
    if counts.empty:
        return pd.DataFrame({group_col: [], "n_rows": [], "ks_ppm": []})
    pivot = (
        counts.pivot_table(
            index=group_col,
            columns=value_col,
            values="_cnt",
            aggfunc="sum",
            fill_value=0,
        )
        .sort_index(axis=1)
    )
    cell = [[int(v) for v in row] for row in pivot.to_numpy()]
    col_tot = [sum(col) for col in zip(*cell)]
    total = sum(col_tot)
    rows = []
    for gi, gname in enumerate(pivot.index):
        ng = sum(cell[gi])
        cum_g = 0
        cum_all = 0
        best = 0
        for vi in range(len(col_tot)):
            cum_g += cell[gi][vi]
            cum_all += col_tot[vi]
            best = max(best, abs(cum_g * total - ng * cum_all))
        rows.append(
            {
                group_col: gname,
                "n_rows": ng,
                "ks_ppm": (scale * best) // (ng * total),
            }
        )
    return pd.DataFrame(rows).astype({"n_rows": "int64", "ks_ppm": "int64"})


def top_share_by_group(
    ds,
    group_col: str,
    member_col: str,
    top_pct: int = 10,
    scale: int = 1_000_000,
):
    """Share of each group's activity owned by its top ``top_pct``
    percent of members, exact ppm — the Lorenz-curve point behind
    "the top 10% of users generate X% of events" (complements Gini,
    which integrates the whole curve):

        k          = ceil(n_members * top_pct / 100)
        share_ppm  = floor( scale * sum(top-k counts) / sum(counts) )

    The top-k SUM is permutation-invariant under count ties (tied
    members are interchangeable), so no tie-break column is needed —
    both engines agree whatever order ties land in.

    Distribution: one combiner to (group, member) counts, one
    bucketed key shuffle, a numpy partial-sort fold per group — raw
    rows never shuffle twice, no group's counts reach the driver.
    Returns a Dataset (group, n_members, n_rows, top_share_ppm)."""
    from .agg import bucketed_map_groups

    pair = grouped_agg(
        ds.select_columns([group_col, member_col]),
        [group_col, member_col],
        {"_cnt": (None, "count")},
    )

    def close(g: pd.DataFrame) -> pd.DataFrame:
        c = sorted((int(v) for v in g["_cnt"]), reverse=True)
        n = len(c)
        k = (n * top_pct + 99) // 100
        total = sum(c)
        top = sum(c[:k])
        return pd.DataFrame(
            {
                group_col: [g[group_col].iloc[0]],
                "n_members": pd.array([n], dtype="int64"),
                "n_rows": pd.array([total], dtype="int64"),
                "top_share_ppm": pd.array(
                    [(scale * top) // total], dtype="int64"
                ),
            }
        )

    return bucketed_map_groups(
        pair.select_columns([group_col, "_cnt"]), [group_col], close
    )


def cramers_v2(ds, row_col: str, col_col: str, scale: int = 1_000_000):
    """Cramér's V SQUARED for two categorical columns, exact ppm —
    the normalized-association summary over the same contingency
    cells as ``contingency_chi2`` (V² = X²/(N·min(R-1, C-1)); 0 =
    independent, 1e6 = perfectly associated). The per-cell floor
    terms are summed first (the chi2 contract), then one more floor
    division normalizes — both floors mirrored in the oracle.

    Returns a single-row DataFrame (n_rows, r_cats, c_cats, v2_ppm);
    degenerate tables (one row or one column category) emit v2_ppm 0.
    """
    counts = grouped_agg(
        ds.select_columns([row_col, col_col]),
        [row_col, col_col],
        {"_cnt": (None, "count")},
    ).to_pandas()
    if counts.empty:
        return pd.DataFrame(
            {"n_rows": [0], "r_cats": [0], "c_cats": [0], "v2_ppm": [0]}
        ).astype("int64")
    pivot = counts.pivot_table(
        index=row_col, columns=col_col, values="_cnt", aggfunc="sum", fill_value=0
    )
    cell = [[int(v) for v in row] for row in pivot.to_numpy()]
    col_tot = [sum(col) for col in zip(*cell)]
    total = sum(col_tot)
    r_cats, c_cats = len(cell), len(col_tot)
    chi = 0
    for gi in range(r_cats):
        rr = sum(cell[gi])
        chi += sum(
            (scale * (cell[gi][vi] * total - rr * col_tot[vi]) ** 2)
            // (total * rr * col_tot[vi])
            for vi in range(c_cats)
            if col_tot[vi] > 0 and rr > 0
        )
    minrc = min(r_cats - 1, c_cats - 1)
    v2 = 0 if minrc == 0 else chi // (total * minrc)
    return pd.DataFrame(
        {
            "n_rows": [total],
            "r_cats": [r_cats],
            "c_cats": [c_cats],
            "v2_ppm": [v2],
        }
    ).astype("int64")


def weighted_top_share_by_group(
    ds,
    group_col: str,
    member_col: str,
    weight_col: str,
    top_pct: int = 10,
    scale: int = 1_000_000,
):
    """VALUE-weighted Lorenz share — the fraction of each group's
    total WEIGHT (revenue, bytes, tokens) owned by its top ``top_pct``
    percent of members ranked by their weight sum ("whales own X% of
    revenue"); the count-based ``top_share_by_group`` with money on
    the axis. Integer weights required (cents, bytes). The top-k SUM
    is invariant under weight ties, so both engines agree without a
    tie-break column.

    Distribution: one combiner collapses raw rows to (group, member,
    weight-sum); one bucketed key shuffle + numpy partial sort per
    group. Returns a Dataset
    (group, n_members, weight_total, top_share_ppm)."""
    from .agg import bucketed_map_groups

    pair = grouped_agg(
        ds.select_columns([group_col, member_col, weight_col]),
        [group_col, member_col],
        {"_w": (weight_col, "sum")},
    )

    def close(g: pd.DataFrame) -> pd.DataFrame:
        w = sorted((int(v) for v in g["_w"]), reverse=True)
        n = len(w)
        k = (n * top_pct + 99) // 100
        total = sum(w)
        top = sum(w[:k])
        return pd.DataFrame(
            {
                group_col: [g[group_col].iloc[0]],
                "n_members": pd.array([n], dtype="int64"),
                "weight_total": pd.array([total], dtype="int64"),
                "top_share_ppm": pd.array(
                    [(scale * top) // total if total else 0], dtype="int64"
                ),
            }
        )

    return bucketed_map_groups(
        pair.select_columns([group_col, "_w"]), [group_col], close
    )


def _pair_abs_sums(vals, cx, cy):
    """Exact ΣΣ|x−y| between two weighted samples sharing a sorted
    merged support, via the gap identity: every gap g between
    consecutive support values is crossed by (#x below)·(#y above) +
    (#y below)·(#x above) unordered (x, y) pairs, so the double sum
    collapses to one linear scan — the machinery behind the exact
    Wasserstein/GMD family, reused for all three energy terms.
    Returns (s_xy, s_xx, s_yy) as exact python ints."""
    n = int(sum(cx))
    m = int(sum(cy))
    s_xy = s_xx = s_yy = 0
    run_x = run_y = 0
    for i in range(len(vals) - 1):
        run_x += int(cx[i])
        run_y += int(cy[i])
        gap = int(vals[i + 1]) - int(vals[i])
        s_xy += gap * (run_x * (m - run_y) + run_y * (n - run_x))
        s_xx += gap * 2 * run_x * (n - run_x)
        s_yy += gap * 2 * run_y * (m - run_y)
    return s_xy, s_xx, s_yy


def energy_distance(ds, group_col: str, value_col: str, ga, gb):
    """Two-sample energy distance (Székely & Rizzo, "Energy
    statistics", JSPI 2013; the V-statistic form): E = 2·E|X−Y| −
    E|X−X'| − E|Y−Y'| ≥ 0, zero iff the distributions coincide — the
    metric complement of the KS (sup) and Wasserstein (integral)
    distances already in this family.

    100-TB shape: ONE (group, value)-count combiner is the only
    exchange; the three pair sums collapse to a linear scan of the
    merged |distinct|-bounded support (the gap identity). Exact
    integers end to end; energy is emitted micro-scaled with the
    sign-magnitude floor so SQL replays the whole statistic in
    HUGEINT. Returns one row: (n_a, n_b, s_xy, s_xx, s_yy,
    energy_micro)."""
    import pandas as pd

    from ocr_service_ray.ops.agg import grouped_agg
    from ocr_service_ray.ops.stats import _sm_div

    vc = grouped_agg(
        ds.select_columns([group_col, value_col]),
        [group_col, value_col],
        {"c": (None, "count")},
    ).to_pandas()
    vc = vc[vc[group_col].isin([ga, gb])].dropna()
    piv = (
        vc.pivot_table(
            index=value_col, columns=group_col, values="c", aggfunc="sum"
        )
        .fillna(0)
        .sort_index()
    )
    cx = piv[ga].to_numpy() if ga in piv else []
    cy = piv[gb].to_numpy() if gb in piv else []
    vals = piv.index.to_numpy()
    n = int(sum(cx))
    m = int(sum(cy))
    if n == 0 or m == 0:
        return pd.DataFrame(
            {
                "n_a": [n],
                "n_b": [m],
                "s_xy": [0],
                "s_xx": [0],
                "s_yy": [0],
                "energy_micro": [None],
            }
        )
    s_xy, s_xx, s_yy = _pair_abs_sums(vals, cx, cy)
    num = 2 * s_xy * n * m - s_xx * m * m - s_yy * n * n
    den = n * n * m * m
    return pd.DataFrame(
        {
            "n_a": [n],
            "n_b": [m],
            "s_xy": [s_xy],
            "s_xx": [s_xx],
            "s_yy": [s_yy],
            "energy_micro": [_sm_div(1_000_000 * num, den)],
        }
    ).astype("int64")
