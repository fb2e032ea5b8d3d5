"""HyperLogLog approximate distinct count — combiner-shaped, with an
exactly SQL-reproducible register table.

``Dataset.unique`` / exact COUNT DISTINCT moves every distinct value
through a shuffle; at 100 TB a distinct-URL / distinct-user count
wants the classical sketch instead: 2^p byte registers whose merge is
an elementwise max — the perfect combiner. Each block collapses to
≤ 2^p (bucket, rho) rows, one tiny ``grouped_agg`` max merges them,
and the estimate is arithmetic over the ≤ 2^p-row register table.
Flajolet et al., "HyperLogLog: the analysis of a near-optimal
cardinality estimation algorithm" (AofA 2007).

Determinism/oracle contract: the value hash is the first 8 hex chars
of ``md5(CAST(value AS VARCHAR))`` — a 32-bit integer DuckDB derives
bit-for-bit (the repo-wide md5 discipline); bucket = top ``p`` bits,
rho = leading-zero count of the remaining ``32-p`` bits + 1, computed
with exact integer bit-length (``np.frexp`` exponent here,
``length(bin(w))`` in SQL — no float log anywhere). The register
table, not just the estimate, hash-matches the oracle. A production
deployment at 10^12 rows would swap md5 for a cheaper 64-bit hash
(ops/hashing.py) and keep the identical shape; md5 is the
oracle-parity choice.

Null semantics: nulls are skipped (SQL COUNT(DISTINCT col)).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa


def _hash32(values) -> np.ndarray:
    """First 8 hex chars of md5(str(value)) as uint32 — mirrors DuckDB
    ``md5(CAST(col AS VARCHAR))`` exactly (ints and strings cast the
    same way)."""
    return np.fromiter(
        (
            int(hashlib.md5(str(v).encode("utf-8")).hexdigest()[:8], 16)
            for v in values
            if v is not None
        ),
        dtype=np.uint32,
    )


def _bit_length(w: np.ndarray) -> np.ndarray:
    """Exact integer bit length, vectorized: frexp's exponent of the
    float64 representation (exact for w < 2^53). bit_length(0) = 0."""
    return np.frexp(w.astype(np.float64))[1].astype(np.int64)


def hll_registers(ds, col: str, p: int = 10):
    """Dataset of ``(bucket, max_rho)`` — the merged HLL register
    table, at most 2^p rows (absent buckets mean register 0)."""
    from ocr_service_ray.ops.agg import grouped_agg

    rem = 32 - p
    mask = (1 << rem) - 1

    def partial(b: pa.Table) -> pa.Table:
        h = _hash32(b[col].to_pylist())
        if len(h) == 0:
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "rho": pa.array([], pa.int64()),
                }
            )
        bucket = (h >> np.uint32(rem)).astype(np.int64)
        w = (h & np.uint32(mask)).astype(np.uint32)
        rho = np.where(w == 0, rem + 1, rem + 1 - _bit_length(w)).astype(np.int64)
        # block-local register max — the combiner: ≤ 2^p rows leave
        regs = np.zeros(1 << p, dtype=np.int64)
        np.maximum.at(regs, bucket, rho)
        nz = np.nonzero(regs)[0]
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "rho": pa.array(regs[nz], pa.int64()),
            }
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_agg(partials, ["bucket"], {"max_rho": ("rho", "max")})


def hll_estimate(registers: pd.DataFrame, p: int = 10) -> float:
    """Cardinality estimate from a merged register table (the standard
    HLL formula with the small-range linear-counting correction;
    registers are ≤ 2^p rows, pure driver arithmetic)."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.int64)
    if len(registers):
        regs[registers["bucket"].to_numpy()] = registers["max_rho"].to_numpy()
    alpha = 0.7213 / (1.0 + 1.079 / m)
    raw = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if raw <= 2.5 * m and zeros > 0:
        return m * float(np.log(m / zeros))
    return float(raw)


def approx_distinct(ds, col: str, p: int = 10) -> float:
    """One-call approximate COUNT(DISTINCT col)."""
    return hll_estimate(hll_registers(ds, col, p).to_pandas(), p)


def _disc_rank(q: float, n: int) -> int:
    """DuckDB ``quantile_disc`` index (0-based): max(ceil(q*n)-1, 0)
    — verified empirically against DuckDB 1.x on edge quantiles."""
    import math

    return max(math.ceil(q * n) - 1, 0)


def _empty_quantile_frame(qs: list[float]) -> "pd.DataFrame":
    """(q_pct, value=None) rows — the SQL-NULL analogue for quantiles
    of an empty input (mirrors the hi<=lo early-return shape in
    ``histogram_quantiles``)."""
    return pd.DataFrame(
        {"q_pct": [int(round(q * 100)) for q in qs], "value": [None] * len(qs)}
    )


def value_counts_quantiles(ds, col: str, qs: list[float]) -> "pd.DataFrame":
    """EXACT discrete quantiles of a bounded-cardinality column via
    the value-counts combiner: one ``grouped_agg`` count per distinct
    value (the shuffle moves ≤ |distinct| rows per block), a
    driver-side sort+cumsum over the ≤ |distinct| value-count rows,
    and DuckDB ``quantile_disc`` rank arithmetic. The 100 TB
    assumption is |distinct(col)| ≪ corpus (discrete codes, prices in
    cents, lengths) — for genuinely continuous columns use a
    histogram sketch and accept approximation.

    Returns a DataFrame ``(q_pct, value)``; ``q_pct`` = int(q*100)."""
    from ocr_service_ray.ops.agg import grouped_agg

    vc = grouped_agg(ds, [col], {"cnt": (None, "count")}).to_pandas()
    # guard BEFORE sort/dropna — zero-row to_pandas drops columns;
    # NULL values hold no rank (SQL quantile_disc ignores them)
    vc = vc if vc.empty else vc.dropna(subset=[col])
    if vc.empty:
        return _empty_quantile_frame(qs)
    vc = vc.sort_values(col).reset_index(drop=True)
    cum = vc["cnt"].cumsum().to_numpy()
    n = int(cum[-1])
    rows = []
    for q in qs:
        r = _disc_rank(q, n)
        idx = int(np.searchsorted(cum, r + 1, side="left"))
        rows.append((int(round(q * 100)), vc[col].iloc[idx]))
    return pd.DataFrame(rows, columns=["q_pct", "value"])


def grouped_quantiles(ds, group_keys: list[str], col: str, qs: list[float]):
    """EXACT per-group discrete quantiles, fully combiner-shaped: a
    (group, value)-count ``grouped_agg`` collapses each block before
    the shuffle, then one coarse-bucket pass folds each group's
    ≤ |distinct values| count rows into its quantile rows — raw rows
    never shuffle. Output: group_keys + (q_pct, value) rows."""
    from ocr_service_ray.ops.agg import bucketed_map_groups, grouped_agg

    vc = grouped_agg(ds, group_keys + [col], {"cnt": (None, "count")})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        # NULL values hold no rank; a group whose values are all NULL
        # emits no quantile rows (SQL aggregate-of-NULLs → NULL row
        # callers rarely want — documented divergence)
        g = g.dropna(subset=[col]).sort_values(col)
        if g.empty:
            return None
        cum = g["cnt"].cumsum().to_numpy()
        n = int(cum[-1])
        out = {k: [] for k in group_keys}
        pcts, vals = [], []
        for q in qs:
            r = _disc_rank(q, n)
            idx = int(np.searchsorted(cum, r + 1, side="left"))
            for k in group_keys:
                out[k].append(g[k].iloc[0])
            pcts.append(int(round(q * 100)))
            vals.append(g[col].iloc[idx])
        out["q_pct"] = pcts
        out["value"] = vals
        return pd.DataFrame(out)

    return bucketed_map_groups(vc, group_keys, fold)


def histogram_quantiles(
    ds, col: str, qs: list[float], bins: int = 4096
) -> pd.DataFrame:
    """APPROXIMATE quantiles for continuous columns: pass 1 finds the
    global [min, max] (combiner min/max), pass 2 builds an equi-width
    histogram (each block collapses to ≤ ``bins`` (bin, count)
    partials — the combiner), and the quantile is answered from the
    ≤ ``bins``-row merged histogram with intra-bin linear
    interpolation. Error ≤ (max-min)/bins per answer — the
    deterministic, layout-independent complement of
    ``value_counts_quantiles`` when |distinct| is unbounded.

    Returns ``(q_pct, value)`` with float values."""
    from ocr_service_ray.ops.agg import global_agg, grouped_agg

    span = global_agg(ds, {"lo": (col, "min"), "hi": (col, "max")})
    if span["lo"] is None or span["hi"] is None:  # empty / all-null input
        return _empty_quantile_frame(qs)
    lo, hi = float(span["lo"]), float(span["hi"])
    if hi <= lo:
        return pd.DataFrame(
            {"q_pct": [int(round(q * 100)) for q in qs], "value": [lo] * len(qs)}
        )
    width = (hi - lo) / bins

    def partial(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        idx = np.minimum(((v - lo) / width).astype(np.int64), bins - 1)
        counts = np.bincount(idx, minlength=bins)
        nz = np.nonzero(counts)[0]
        return pa.table(
            {
                "bin": pa.array(nz, pa.int64()),
                "cnt": pa.array(counts[nz], pa.int64()),
            }
        )

    hist = (
        grouped_agg(
            ds.map_batches(partial, batch_format="pyarrow"),
            ["bin"],
            {"cnt": ("cnt", "sum")},
        )
        .to_pandas()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    cum = hist["cnt"].cumsum().to_numpy()
    n = int(cum[-1])
    rows = []
    for q in qs:
        target = q * n
        i = int(np.searchsorted(cum, target, side="left"))
        i = min(i, len(hist) - 1)
        b = int(hist["bin"].iloc[i])
        prev = float(cum[i - 1]) if i > 0 else 0.0
        inbin = float(hist["cnt"].iloc[i])
        frac = (target - prev) / inbin if inbin > 0 else 0.0
        rows.append(
            (int(round(q * 100)), lo + (b + min(max(frac, 0.0), 1.0)) * width)
        )
    return pd.DataFrame(rows, columns=["q_pct", "value"])


def value_counts_quantiles_cont(ds, col: str, qs: list[float]) -> pd.DataFrame:
    """EXACT linearly-interpolated quantiles (DuckDB ``quantile_cont``
    / numpy default) over the value-counts combiner: pos = (n-1)·q,
    value = a + frac·(b - a) between the two straddling order
    statistics — all +,×,÷ so the floats are bit-identical
    cross-engine. Same |distinct|-bounded assumption as
    ``value_counts_quantiles``. Returns ``(q_pct, value)`` floats."""
    import math

    from ocr_service_ray.ops.agg import grouped_agg

    vc = grouped_agg(ds, [col], {"cnt": (None, "count")}).to_pandas()
    # NULLs hold no rank (SQL quantile_cont ignores them); guard order
    # matters — zero-row to_pandas drops columns
    vc = vc if vc.empty else vc.dropna(subset=[col])
    if vc.empty:
        return _empty_quantile_frame(qs)
    vc = vc.sort_values(col).reset_index(drop=True)
    cum = vc["cnt"].cumsum().to_numpy()
    n = int(cum[-1])
    vals = vc[col].to_numpy()

    def order_stat(r: int) -> float:  # r is a 0-based rank
        return float(vals[int(np.searchsorted(cum, r + 1, side="left"))])

    rows = []
    for q in qs:
        pos = (n - 1) * q
        i = math.floor(pos)
        frac = pos - i
        a = order_stat(i)
        b = order_stat(min(i + 1, n - 1))
        rows.append((int(round(q * 100)), a + frac * (b - a)))
    return pd.DataFrame(rows, columns=["q_pct", "value"])


def percentile_buckets(ds, col: str, n_buckets: int, keep_cols: list[str]):
    """Assign every row its global percentile bucket over ``col`` —
    the length/score-banding step of corpus curation (e.g. split a
    corpus into 10 length deciles for per-band sampling rates).

    Exact and integer end to end: pass 1 is the value-counts combiner
    (shuffle moves ≤ |distinct| rows per block); the driver folds the
    ≤ |distinct| counts into a strict-less CDF that is BROADCAST
    (``ray.put`` once, searchsorted per batch); pass 2 streams the
    corpus assigning ``n_less`` (rows strictly below this value) and
    ``bucket = min(n_less * n_buckets // n_total, n_buckets - 1)`` —
    SQL-reproducible with a window-sum CDF join. Ties share a bucket
    by construction (same value → same n_less), so the split is
    deterministic under any row order. Same |distinct(col)|-bounded
    assumption as ``value_counts_quantiles``; pre-bin continuous
    columns first.

    Output: keep_cols + col + n_less + bucket (int64). NULL ``col``
    rows are DROPPED (no order statistic exists for them — the SQL
    analogue's inner CDF join does the same)."""
    import pyarrow.compute as pc
    import ray

    from ocr_service_ray.ops.agg import grouped_agg

    ds = ds.map_batches(
        lambda b: b.filter(pc.is_valid(b[col])), batch_format="pyarrow"
    )
    vc = grouped_agg(ds, [col], {"cnt": (None, "count")}).to_pandas()
    if vc.empty:
        empty = {c: [] for c in keep_cols + [col, "n_less", "bucket"]}
        return ray.data.from_pandas(pd.DataFrame(empty))
    vc = vc.sort_values(col).reset_index(drop=True)
    cum = vc["cnt"].cumsum().to_numpy()
    n_total = int(cum[-1])
    values = vc[col].to_numpy()
    n_less = np.concatenate(([0], cum[:-1])).astype(np.int64)
    cdf_ref = ray.put((values, n_less))

    def assign(b: pa.Table) -> pa.Table:
        values_b, n_less_b = ray.get(cdf_ref)
        v = b[col].to_numpy(zero_copy_only=False)
        idx = np.searchsorted(values_b, v, side="left")
        less = n_less_b[idx]
        bucket = np.minimum(
            less * n_buckets // n_total, n_buckets - 1
        ).astype(np.int64)
        out = {c: b[c] for c in keep_cols}
        out[col] = b[col]
        out["n_less"] = pa.array(less)
        out["bucket"] = pa.array(bucket)
        return pa.table(out)

    return ds.map_batches(assign, batch_format="pyarrow")


def grouped_hll_registers(ds, group_col: str, col: str, p: int = 10):
    """Per-GROUP HyperLogLog register tables — ``(group, bucket,
    max_rho)``, at most ``|groups| * 2^p`` rows: the sketch-sized
    answer to "approximate distinct users per segment" when
    ``grouped_distinct_count`` (exact, ops/agg.py) would move too many
    distinct pairs. Same hash/bucket/rho arithmetic as the global
    ``hll_registers`` (md5-prefix, SQL-reproducible register table);
    each block collapses to its per-(group, bucket) max BEFORE the one
    combiner exchange. NULL values of ``col`` are skipped; NULL groups
    form their own group."""
    from ocr_service_ray.ops.agg import grouped_agg

    rem = 32 - p
    mask = (1 << rem) - 1

    def partial(b: pa.Table) -> pa.Table:
        vals = b[col].to_pylist()
        keep = [i for i, v in enumerate(vals) if v is not None]
        h = np.fromiter(
            (
                int(hashlib.md5(str(vals[i]).encode("utf-8")).hexdigest()[:8], 16)
                for i in keep
            ),
            dtype=np.uint32,
            count=len(keep),
        )
        groups = b[group_col].take(pa.array(keep, pa.int64())).to_pylist()
        if len(h) == 0:
            return pa.table(
                {
                    group_col: pa.array([], b[group_col].type),
                    "bucket": pa.array([], pa.int64()),
                    "rho": pa.array([], pa.int64()),
                }
            )
        bucket = (h >> np.uint32(rem)).astype(np.int64)
        w = (h & np.uint32(mask)).astype(np.uint32)
        rho = np.where(w == 0, rem + 1, rem + 1 - _bit_length(w)).astype(np.int64)
        # block-local per-(group, bucket) max — the combiner
        local = (
            pd.DataFrame({group_col: groups, "bucket": bucket, "rho": rho})
            .groupby([group_col, "bucket"], as_index=False, dropna=False)["rho"]
            .max()
        )
        t = pa.Table.from_pandas(local, preserve_index=False)
        return t.set_column(
            t.schema.get_field_index(group_col),
            group_col,
            t[group_col].cast(b[group_col].type),
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return grouped_agg(partials, [group_col, "bucket"], {"max_rho": ("rho", "max")})


def grouped_approx_distinct(ds, group_col: str, col: str, p: int = 10) -> pd.DataFrame:
    """Per-group approximate COUNT(DISTINCT col): fold each group's
    register rows through the standard HLL estimate. Returns
    ``(group, approx_distinct float)`` — |groups| rows on the driver."""
    regs = grouped_hll_registers(ds, group_col, col, p).to_pandas()
    if regs.empty:
        return pd.DataFrame({group_col: [], "approx_distinct": []})
    rows = [
        (g, hll_estimate(sub, p))
        for g, sub in regs.groupby(group_col, dropna=False, sort=False)
    ]
    return pd.DataFrame(rows, columns=[group_col, "approx_distinct"])


def winsorize(
    ds,
    col: str,
    lo_q: float = 0.01,
    hi_q: float = 0.99,
    keep_cols: list[str] | None = None,
    out_col: str | None = None,
):
    """Percentile clipping (winsorization): values below the ``lo_q``
    discrete quantile clamp up to it, above ``hi_q`` clamp down — the
    standard heavy-tail taming step before scaling/normalizing a
    feature column. EXACT: bounds come from the value-counts combiner
    (``value_counts_quantiles``, DuckDB ``quantile_disc`` rank
    arithmetic), then one broadcast vectorized clip pass — one
    combiner exchange + one rescan, nothing corpus-sized on the
    driver. NULLs pass through unclipped (SQL least/greatest
    propagates NULL)."""
    import pyarrow.compute as pc

    bounds = value_counts_quantiles(ds, col, [lo_q, hi_q])
    lo, hi = bounds["value"].iloc[0], bounds["value"].iloc[1]
    out_name = out_col or f"{col}_w"
    cols = keep_cols if keep_cols is not None else []

    def clip(b: pa.Table) -> pa.Table:
        v = b[col]
        if lo is not None:
            v = pc.max_element_wise(v, pa.scalar(lo, v.type), skip_nulls=False)
            v = pc.min_element_wise(v, pa.scalar(hi, v.type), skip_nulls=False)
        t = b.select(cols) if cols else b.drop_columns([col])
        return t.append_column(out_name, v)

    return ds.map_batches(clip, batch_format="pyarrow")


def first_digit_counts(ds, col: str) -> pd.DataFrame:
    """Benford profile: count of values by FIRST significant digit of
    the positive integer column ``col``, with the share as exact
    parts-per-million (floor(1e6 * n / total) — positive, so integer
    truncation == floor on both engines).

    The digit is taken lexically (first character of the decimal
    string, a pure Arrow cast+slice) rather than via float log10,
    whose rounding at exact powers of ten is engine-dependent. One
    combiner count per digit; the ppm fold runs on the <= 9-row
    driver frame. Non-positive values drop out (Benford is defined on
    positive magnitudes); an all-dropped input returns the empty
    frame."""
    import pyarrow.compute as pc

    from .agg import grouped_agg

    def prep(b: pa.Table) -> pa.Table:
        v = b[col]
        v = b.filter(pc.greater(v, 0))[col]
        s = pc.cast(v, pa.string())
        return pa.table({"digit": pc.cast(pc.utf8_slice_codeunits(s, 0, 1), pa.int64())})

    counts = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["digit"],
        {"n": (None, "count")},
    ).to_pandas()
    if counts.empty:
        return pd.DataFrame(columns=["digit", "n", "share_ppm"]).astype(
            {"digit": "int64", "n": "int64", "share_ppm": "int64"}
        )
    total = int(counts["n"].sum())
    counts = counts.sort_values("digit", kind="stable").reset_index(drop=True)
    counts["share_ppm"] = counts["n"].to_numpy(dtype=np.int64) * 1_000_000 // total
    return counts.astype({"digit": "int64", "n": "int64", "share_ppm": "int64"})


def grouped_weighted_quantiles(
    ds,
    group_keys: list[str],
    col: str,
    weight_col: str,
    qs: list[tuple[int, int]] = ((1, 4), (1, 2), (3, 4)),
):
    """EXACT per-group WEIGHTED discrete quantiles — ``quantile_disc``
    over the multiset where each row is repeated ``weight`` times,
    without ever expanding it. Quantiles are RATIONAL (num, den)
    pairs so the rank threshold is pure integer arithmetic on both
    engines (no float q*W):

        W        = sum of weights in the group
        t(q)     = max( ceil(num*W / den), 1 )
        value(q) = smallest v with cumweight(v) >= t(q)

    (cumweight(v) = total weight of rows with value <= v; for integer
    weights this equals quantile_disc on the expanded multiset.)

    Combiner-shaped like ``grouped_quantiles``: a (group, value)
    weight-sum aggregate collapses raw rows before the shuffle; one
    bucketed fold walks each group's <= |distinct values| rows.
    NULL values or weights drop (SQL aggregate semantics); zero or
    negative weights are the caller's contract violation.
    Output: group_keys + (q_pct, value) rows, q_pct = 100*num//den."""
    import pyarrow.compute as pc

    from ocr_service_ray.ops.agg import bucketed_map_groups, grouped_agg

    def clean(b):
        return b.filter(
            pc.and_(pc.is_valid(b[col]), pc.is_valid(b[weight_col]))
        )

    vc = grouped_agg(
        ds.map_batches(clean, batch_format="pyarrow"),
        group_keys + [col],
        {"_w": (weight_col, "sum")},
    )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(col)
        cum = g["_w"].cumsum().to_numpy()
        total = int(cum[-1])
        out = {k: [] for k in group_keys}
        pcts, vals = [], []
        for num, den in qs:
            t = max((num * total + den - 1) // den, 1)
            idx = int(np.searchsorted(cum, t, side="left"))
            for k in group_keys:
                out[k].append(g[k].iloc[0])
            pcts.append(100 * num // den)
            vals.append(g[col].iloc[idx])
        out["q_pct"] = pcts
        out["value"] = vals
        return pd.DataFrame(out)

    return bucketed_map_groups(vc, group_keys, fold)


def grouped_quantiles_cont(ds, group_keys: list[str], col: str, qs: list[float]):
    """EXACT per-group linearly-interpolated quantiles (DuckDB
    ``quantile_cont`` semantics) — the grouped sibling of
    ``value_counts_quantiles_cont``: one (group, value)-count combiner
    collapses every block before the shuffle, then each group's
    ≤ |distinct values| count rows fold to its quantile rows with
    pos = (n-1)·q, value = a + frac·(b−a) — all +,×,÷, bit-identical
    cross-engine. NULL values hold no rank; an all-NULL group emits
    nothing. Output: group_keys + (q_pct, value[float64]) rows."""
    import math

    from ocr_service_ray.ops.agg import bucketed_map_groups, grouped_agg

    vc = grouped_agg(ds, group_keys + [col], {"cnt": (None, "count")})

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.dropna(subset=[col]).sort_values(col)
        if g.empty:
            return None
        cum = g["cnt"].cumsum().to_numpy()
        n = int(cum[-1])
        vals = g[col].to_numpy()

        def order_stat(r: int) -> float:
            return float(vals[int(np.searchsorted(cum, r + 1, side="left"))])

        out = {k: [] for k in group_keys}
        pcts, vv = [], []
        for q in qs:
            pos = (n - 1) * q
            i = math.floor(pos)
            frac = pos - i
            a = order_stat(i)
            b = order_stat(min(i + 1, n - 1))
            for k in group_keys:
                out[k].append(g[k].iloc[0])
            pcts.append(int(round(q * 100)))
            vv.append(a + frac * (b - a))
        out["q_pct"] = pcts
        out["value"] = vv
        return pd.DataFrame(out)

    return bucketed_map_groups(vc, group_keys, fold)


# ------------------------------------------------------------- count-min

def _cms_cell(token: str, row: int, width: int) -> int:
    """md5-derived CMS cell: first 16 hex chars of md5('<row>:<token>')
    as uint64, mod width — DuckDB replays it bit-for-bit (the repo-wide
    md5 oracle discipline; production would swap in ops/hashing.py)."""
    h = hashlib.md5(f"{row}:{token}".encode()).hexdigest()[:16]
    return int(h, 16) % width


def cms_build(ds, text_col: str, depth: int = 4, width: int = 1024):
    """Count-min sketch over whitespace tokens of ``text_col`` (Cormode
    & Muthukrishnan 2005): every token instance increments one cell per
    row r at ``md5('<r>:<tok>') % width``. Combiner-shaped end to end —
    each block collapses to ≤ depth·width (row, cell) partial counts,
    one tiny ``grouped_agg`` sums them; the sketch (depth·width rows)
    is the ONLY thing that ever shuffles, never tokens. Returns the
    sketch as a pandas DataFrame (bounded driver table by design)."""
    from collections import Counter

    from ocr_service_ray.ops.agg import grouped_agg

    def explode(batch: pa.Table) -> pa.Table:
        counts: Counter = Counter()
        for t in batch[text_col].to_pylist():
            for w in (t or "").split():
                for r in range(depth):
                    counts[(r, _cms_cell(w, r, width))] += 1
        return pa.table(
            {
                "row": pa.array([r for r, _ in counts], pa.int64()),
                "cell": pa.array([c for _, c in counts], pa.int64()),
                "c": pa.array(list(counts.values()), pa.int64()),
            }
        )

    sk = grouped_agg(
        ds.map_batches(explode, batch_format="pyarrow"),
        ["row", "cell"],
        {"c": ("c", "sum")},
    ).to_pandas()
    sk["row"] = sk["row"].astype("int64")
    sk["cell"] = sk["cell"].astype("int64")
    sk["c"] = sk["c"].astype("int64")
    return sk


def cms_estimate(sketch: pd.DataFrame, tokens: list[str], depth: int = 4, width: int = 1024) -> pd.DataFrame:
    """Point-query the CMS: est(tok) = min over rows of the addressed
    cell — always ≥ the true count (one-sided error). Returns
    (token, est_c)."""
    lut = {(int(r), int(c)): int(v) for r, c, v in zip(sketch["row"], sketch["cell"], sketch["c"])}
    ests = []
    for t in tokens:
        ests.append(
            min(lut.get((r, _cms_cell(t, r, width)), 0) for r in range(depth))
        )
    return pd.DataFrame({"token": tokens, "est_c": np.array(ests, dtype=np.int64)})


def iterative_exact_median(
    ds, col: str, bracket_cap: int = 4096, materialize_projection: bool = True
):
    """EXACT lower median of an int64 column with NO bounded-distinct
    assumption — the "median of 10^12 values" algorithm. The
    value-counts quantile path shuffles one row per distinct value,
    which breaks when the column is near-unique; this one never moves
    values at all: each round is ONE counting scan that folds every
    block into a 256-bin histogram over the current bracket [lo, hi]
    (pure combiner — 256 ints per block), the driver walks the
    cumulative counts to the bin holding rank (n+1)//2, and the
    bracket narrows 256x per round (log_256(range) rounds, 3 for
    cents-scale data). When the bracket is <= ``bracket_cap`` wide the
    final scan value-counts just that sliver. Returns (median, n,
    n_rounds). NULLs hold no rank.

    ``materialize_projection`` pins the single-column projection in the
    object store between rounds (right when it fits — spills
    otherwise); pass False at corpus scale to re-run the pruned
    parquet read each round instead (O(log range) IO, zero pin)."""
    import pyarrow.compute as pc

    from ocr_service_ray.ops.agg import global_agg, grouped_agg

    base = ds.map_batches(
        lambda b: b.select([col]).filter(pc.is_valid(b[col])),
        batch_format="pyarrow",
    )
    if materialize_projection:
        base = base.materialize()

    span = global_agg(
        base, {"lo": (col, "min"), "hi": (col, "max"), "n": (None, "count")}
    )
    n = int(span["n"])
    if n == 0:
        return None, 0, 0
    lo, hi = int(span["lo"]), int(span["hi"])
    r = (n + 1) // 2  # 1-based lower-median rank (= quantile_disc 0.5)
    rounds = 0
    rank_left = r  # rank within the current bracket
    while hi - lo > bracket_cap:
        rounds += 1
        width = hi - lo + 1
        clo, cwidth = lo, width

        def hist(b: pa.Table) -> pa.Table:
            v = b[col].to_numpy(zero_copy_only=False)
            v = v[(v >= clo) & (v < clo + cwidth)]
            bins = (v - clo) * 256 // cwidth
            counts = np.bincount(bins, minlength=256)
            return pa.table(
                {
                    "bin": pa.array(np.arange(256, dtype=np.int64)),
                    "c": pa.array(counts.astype(np.int64)),
                }
            )

        h = (
            grouped_agg(
                base.map_batches(hist, batch_format="pyarrow"),
                ["bin"],
                {"c": ("c", "sum")},
            )
            .to_pandas()
            .sort_values("bin")
        )
        cum = 0
        for _, row in h.iterrows():
            if cum + int(row["c"]) >= rank_left:
                b_idx = int(row["bin"])
                rank_left -= cum
                break
            cum += int(row["c"])
        lo2 = clo + b_idx * cwidth // 256
        hi2 = clo + (b_idx + 1) * cwidth // 256 - 1
        # bin edges from integer floor division: recheck containment
        lo, hi = max(lo, lo2), min(hi, hi2)

    flo, fhi = lo, hi

    def bracket_counts(b: pa.Table) -> pa.Table:
        v = b[col].to_numpy(zero_copy_only=False)
        v = v[(v >= flo) & (v <= fhi)]
        u, c = np.unique(v, return_counts=True)
        return pa.table(
            {"v": pa.array(u.astype(np.int64)), "c": pa.array(c.astype(np.int64))}
        )

    vc = (
        grouped_agg(
            base.map_batches(bracket_counts, batch_format="pyarrow"),
            ["v"],
            {"c": ("c", "sum")},
        )
        .to_pandas()
        .sort_values("v")
        .reset_index(drop=True)
    )
    cum = vc["c"].cumsum().to_numpy()
    idx = int(np.searchsorted(cum, rank_left, side="left"))
    return int(vc["v"].iloc[idx]), n, rounds


class KllSketch:
    """Deterministic KLL-style quantile sketch (Karnin-Lang-Liberty
    2016 with the random coin replaced by a level-parity offset —
    fully deterministic, at the cost of the adversarial-input
    guarantee; fine for pipeline telemetry).

    Level i holds <= k items, each representing 2^i inputs. A full
    level sorts, promotes every other item (offset = level % 2) to
    level i+1 and drops the rest — the classic compaction, so rank
    error grows O(levels/k). Mergeable: levelwise concat + compact,
    so per-block partials fold associatively (the HLL-register
    discipline). NOTE: the result depends on compaction boundaries,
    i.e. on the partial/merge order — like any real sketch it is an
    approximation, not a layout-invariant exact answer."""

    def __init__(self, k: int = 64):
        self.k = int(k)
        self.levels: list[list] = [[]]

    def add_many(self, values) -> "KllSketch":
        self.levels[0].extend(
            v for v in values if v is not None and v == v
        )
        self._compact()
        return self

    def merge(self, other: "KllSketch") -> "KllSketch":
        while len(self.levels) < len(other.levels):
            self.levels.append([])
        for i, lv in enumerate(other.levels):
            self.levels[i].extend(lv)
        self._compact()
        return self

    def _compact(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self.k:
                arr = sorted(self.levels[i])
                # odd count: one item stays behind (weight-exact —
                # promoting half of an EVEN run keeps total weight,
                # so weight() == number of inputs, asserted in tests)
                leftover: list = []
                if len(arr) % 2:
                    if i % 2:
                        leftover, arr = [arr[0]], arr[1:]
                    else:
                        leftover, arr = [arr[-1]], arr[:-1]
                promoted = arr[i % 2 :: 2]
                self.levels[i] = leftover
                if i + 1 == len(self.levels):
                    self.levels.append([])
                self.levels[i + 1].extend(promoted)
            i += 1

    def weight(self) -> int:
        return sum(len(lv) << i for i, lv in enumerate(self.levels))

    def items(self) -> "pd.DataFrame":
        rows = [
            (i, v) for i, lv in enumerate(self.levels) for v in lv
        ]
        return pd.DataFrame(rows, columns=["level", "value"])

    @classmethod
    def from_items(cls, frame: "pd.DataFrame", k: int = 64) -> "KllSketch":
        s = cls(k)
        if len(frame):
            top = int(frame["level"].max())
            s.levels = [[] for _ in range(top + 1)] or [[]]
            for lvl, v in zip(frame["level"], frame["value"]):
                s.levels[int(lvl)].append(v)
            s._compact()
        return s

    def quantile(self, q: float):
        """Value whose weighted rank is ceil(q * W) (lower quantile
        over the sketch's weighted item multiset)."""
        pairs = sorted(
            (v, 1 << i)
            for i, lv in enumerate(self.levels)
            for v in lv
        )
        if not pairs:
            return None
        w_total = sum(w for _, w in pairs)
        target = max(1, int(np.ceil(q * w_total)))
        cum = 0
        for v, w in pairs:
            cum += w
            if cum >= target:
                return v
        return pairs[-1][0]


def kll_quantiles(ds, col: str, qs: list[float], k: int = 64):
    """Distributed KLL: one map_batches pass emits per-block partial
    sketches as (level, value) rows — blocks never leave the workers,
    only <= k*levels rows per block do — and the driver folds them
    with the mergeable compaction. Returns (q_pct, value, w_total)
    rows. Approximate BY DESIGN (see KllSketch): rank error is
    bounded by pytest, not a SQL oracle."""

    def partial(b: pa.Table) -> pa.Table:
        s = KllSketch(k).add_many(
            b[col].to_numpy(zero_copy_only=False).tolist()
        )
        f = s.items()
        return pa.table(
            {
                "level": pa.array(f["level"].astype("int64")),
                "value": pa.array(f["value"]),
            }
        )

    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pyarrow"
    ).to_pandas()
    sk = KllSketch.from_items(parts, k=k)
    w = sk.weight()
    return pd.DataFrame(
        {
            "q_pct": [int(round(q * 100)) for q in qs],
            "value": [sk.quantile(q) for q in qs],
            "w_total": [w] * len(qs),
        }
    )


# --------------------------------------------------------------------
# KMV (K-minimum-values / bottom-k) distinct sketch — the mergeable
# set-operations member of the sketch family. Unlike HLL (registers:
# union only) a KMV sketch supports union, intersection and Jaccard
# estimates between groups, because the bottom-k of a set of hashes
# is itself a uniform sample of the union. Bar-Yossef et al.,
# "Counting distinct elements in a data stream" (RANDOM 2002);
# Beyer et al., "On synopses for distinct-value estimation under
# multiset operations" (SIGMOD 2007).
#
# Determinism: hash = first 16 hex chars of md5(salt || ':' || value)
# parsed as uint64 — the repo-wide md5 oracle discipline, so DuckDB
# recomputes every sketch from scratch. And unlike KLL, the bottom-k
# of a SET is layout-invariant: any partitioning folds to the same
# sketch, so the estimates are EXACTLY SQL-reproducible.
#
# 100-TB shape: one map_batches pass emits <= k block-local bottom
# hashes per (block, group) — raw rows never shuffle; the fold sees
# <= blocks * groups * k sketch rows (combiner discipline, same as
# the HLL register table). Estimator: n_hat = (k-1) * 2^64 // h_(k)
# (floor — integer-exact in both engines via HUGEINT), exact n_kept
# when the group holds fewer than k distinct values.


def kmv_group_sketch(ds, group_col: str, value_col: str, k: int = 256, salt: str = "kmv") -> pd.DataFrame:
    """Per-group bottom-k distinct-hash sketch → (g, h) rows, <= k
    uint64 hashes per group, ascending. ``value_col`` must be integer
    (callers project floats to micro-ints first — the md5 string
    must be engine-identical). Nulls in either column are skipped."""

    def partial(b: pa.Table) -> pa.Table:
        df = b.select([group_col, value_col]).to_pandas().dropna()
        gs: list = []
        hs: list = []
        for g, grp in df.groupby(group_col, sort=False):
            uniq = {
                int(hashlib.md5(f"{salt}:{int(v)}".encode()).hexdigest()[:16], 16)
                for v in grp[value_col]
            }
            bot = sorted(uniq)[:k]
            gs.extend([g] * len(bot))
            hs.extend(bot)
        return pa.table(
            {"g": pa.array(gs), "h": pa.array(np.array(hs, dtype=np.uint64))}
        )

    parts = (
        ds.select_columns([group_col, value_col])
        .map_batches(partial, batch_format="pyarrow")
        .to_pandas()
    )
    if parts.empty:
        return pd.DataFrame({"g": pd.Series(dtype=object), "h": pd.Series(dtype="uint64")})
    return (
        parts.drop_duplicates()
        .sort_values(["g", "h"], kind="mergesort")
        .groupby("g", sort=True)
        .head(k)
        .reset_index(drop=True)
    )


def _kmv_n_hat(bot: list[int], k: int) -> int:
    if len(bot) < k:
        return len(bot)
    return (k - 1) * (1 << 64) // int(bot[-1])


def kmv_estimate(sketch: pd.DataFrame, k: int) -> pd.DataFrame:
    """(g, n_kept, n_hat) per group — exact when the group held fewer
    than k distinct values, the (k-1)/U_(k) floor estimate otherwise."""
    rows = []
    for g, grp in sketch.groupby("g", sort=True):
        bot = [int(x) for x in grp["h"]]
        rows.append((g, len(bot), _kmv_n_hat(bot, k)))
    return pd.DataFrame(rows, columns=["g", "n_kept", "n_hat"])


def kmv_pair_ops(sketch: pd.DataFrame, k: int, ga, gb) -> pd.DataFrame:
    """Union / intersection / Jaccard estimates between two groups'
    sketches: X = bottom-k of (S_a ∪ S_b) is a uniform size-kx sample
    of the union, so shared = |X ∩ S_a ∩ S_b| gives jacc ≈ shared/kx
    and inter ≈ shared * union_hat / kx (floored ppm / integer —
    engine-exact). One row: (kx, union_hat, shared, inter_hat,
    jacc_ppm)."""
    sa = set(int(x) for x in sketch.loc[sketch["g"] == ga, "h"])
    sb = set(int(x) for x in sketch.loc[sketch["g"] == gb, "h"])
    ux = sorted(sa | sb)[:k]
    kx = len(ux)
    union_hat = _kmv_n_hat(ux, k)
    shared = sum(1 for h in ux if h in sa and h in sb)
    inter_hat = shared * union_hat // kx if kx else 0
    jacc_ppm = shared * 1_000_000 // kx if kx else 0
    return pd.DataFrame(
        {
            "kx": [kx],
            "union_hat": [union_hat],
            "shared": [shared],
            "inter_hat": [inter_hat],
            "jacc_ppm": [jacc_ppm],
        }
    ).astype("int64")
