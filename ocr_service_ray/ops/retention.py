"""Cohort retention matrix and per-key cumulative distinct counts.

Two first-seen-based temporal shapes over an event stream:

- ``cohort_retention``: classic product-analytics retention triangle
  — users cohorted by the calendar period (day/month) of their FIRST
  event; cell (cohort_period, offset_periods) counts distinct users
  of that cohort active that many periods later. One bucketed key
  shuffle on the user id; each user folds to its (cohort,
  distinct-active-period) rows inside the group, so the second
  aggregate sees at most |users| x |periods| tiny rows and raw
  events shuffle once.

- ``cumulative_distinct``: per key and event, how many distinct
  values of a column the key has seen up to and including that event
  (the COUNT(DISTINCT) OVER shape SQL itself cannot express without
  a first-occurrence-flag rewrite). Same single key shuffle; the
  in-group fold is a vectorized pandas first-occurrence cumsum.

Month arithmetic is integer (year*12 + month), so both ops are
bit-exact against DuckDB oracles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .agg import bucketed_map_groups, grouped_agg


def _period_index(ts: pd.Series, period: str) -> np.ndarray:
    dt = pd.DatetimeIndex(ts)
    if period == "month":
        return (dt.year.to_numpy() * 12 + (dt.month.to_numpy() - 1)).astype(np.int64)
    if period == "day":
        return dt.values.astype("datetime64[D]").astype(np.int64)
    raise ValueError(f"unsupported period: {period}")


def cohort_retention(ds, key_col: str = "user_id", ts_col: str = "ts", period: str = "day"):
    """(cohort_period, offset_periods, n_users) — distinct keys per cell.

    cohort_period is the integer calendar index of the key's FIRST
    event (days since epoch, or year*12+month-1); offset is whole
    periods between an active period and the cohort period. Both
    integer, so the matrix is bit-exact against SQL.
    """

    def per_key(g: pd.DataFrame) -> pd.DataFrame:
        periods = np.unique(_period_index(g[ts_col], period))
        cohort = periods[0]
        return pd.DataFrame(
            {"cohort_period": cohort, "offset_periods": periods - cohort, "_one": 1}
        )

    cells = bucketed_map_groups(ds, [key_col], per_key)
    out = grouped_agg(
        cells, ["cohort_period", "offset_periods"], {"n_users": ("_one", "sum")}
    )
    return out


def rolling_distinct(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    window: int = 7,
    period: str = "day",
):
    """Rolling-window COUNT(DISTINCT key) per period — the WAU/MAU
    shape (distinct users active in the trailing ``window`` days of
    each day).

    Exact and shuffle-light: (key, period) pairs dedup in a combiner
    agg first (raw events collapse block-locally), then each pair
    explodes to the ``window`` period cells it contributes to (a
    bounded x``window`` flat map), dedups again, and a final combiner
    count per cell. No per-cell rescan, no driver state; every
    exchange moves (key, period) integers only. Emits every cell any
    activity contributes to, including trailing cells past the last
    active period (partial windows) — the SQL mirror does the same
    via generate_series.
    """

    def to_period(b: pa.Table) -> pa.Table:
        pi = _period_index(pd.Series(b[ts_col].to_pandas()), period)
        return pa.table({"k": b[key_col], "p": pa.array(pi)})

    pairs = grouped_agg(
        ds.map_batches(to_period, batch_format="pyarrow"),
        ["k", "p"],
        {"_c": (None, "count")},
    )

    def explode(b: pa.Table) -> pa.Table:
        k = b["k"].to_numpy(zero_copy_only=False)
        p = b["p"].to_numpy(zero_copy_only=False)
        n = len(k)
        offs = np.arange(window, dtype=np.int64)
        return pa.table(
            {
                "k": pa.array(np.repeat(k, window)),
                "cell": pa.array((p[:, None] + offs[None, :]).reshape(n * window)),
            }
        )

    cells = grouped_agg(
        pairs.map_batches(explode, batch_format="pyarrow"),
        ["k", "cell"],
        {"_c": (None, "count")},
    )
    out = grouped_agg(cells, ["cell"], {"n_distinct": (None, "count")})

    def rename(b: pa.Table) -> pa.Table:
        return b.rename_columns(
            ["period" if c == "cell" else c for c in b.column_names]
        )

    return out.map_batches(rename, batch_format="pyarrow")


def cumulative_distinct(
    ds,
    key_col: str = "user_id",
    order_cols: list[str] | None = None,
    val_col: str = "event_type",
    id_col: str = "event_id",
    out_col: str = "n_distinct_cum",
):
    """Per key, ordered by order_cols: running count of distinct
    val_col values seen so far (inclusive). Emits (id_col, key_col,
    out_col)."""
    order_cols = order_cols or ["ts", id_col]

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(order_cols, kind="mergesort")
        first = (~g.duplicated(subset=[val_col])).to_numpy().astype(np.int64)
        return pd.DataFrame(
            {
                id_col: g[id_col].to_numpy(),
                key_col: g[key_col].to_numpy(),
                out_col: np.cumsum(first),
            }
        )

    return bucketed_map_groups(ds, [key_col], fold)


def day_over_day_jaccard(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    scale: int = 1_000_000,
):
    """Jaccard similarity of consecutive days' active-key sets — the
    churn-shape monitor (how much of today's audience is yesterday's):

        jac_ppm(d) = floor( scale * |U_{d-1} ∩ U_d|
                            / |U_{d-1} ∪ U_d| )

    Three combiner exchanges, none over raw rows twice:
    1. raw rows collapse to DISTINCT (day, key) actives;
    2. each active contributes to day d as "cur" and to day d+1 as
       "prev" (a 2x flat-map of the DISTINCT pairs), re-grouped per
       (day, key) into {cur, prev} flags;
    3. per-day sums of cur / prev / cur*prev give |U_d|, |U_{d-1}|,
       and the intersection; union = cur + prev - inter.

    The first observed day has no predecessor (prev = 0 → jac 0,
    emitted); the synthetic day AFTER the last observed one is
    dropped (filter d <= max_day). Days with union 0 cannot occur
    inside the span (every emitted d has cur > 0 or prev > 0).

    Returns a Dataset (day, n_prev, n_cur, n_inter, jac_ppm); day is
    integer epoch-days."""
    import pyarrow.compute as pc

    from .agg import global_agg, grouped_agg

    def prep(b: pa.Table) -> pa.Table:
        day = (
            b[ts_col]
            .to_pandas()
            .values.astype("datetime64[D]")
            .astype(np.int64)
        )
        return pa.table({"d": pa.array(day), "k": b[key_col]})

    pairs = ds.map_batches(prep, batch_format="pyarrow")
    distinct = grouped_agg(pairs, ["d", "k"], {"_c": (None, "count")})
    max_day = int(global_agg(pairs, {"hi": ("d", "max")})["hi"])

    def emit(b: pa.Table) -> pa.Table:
        n = len(b)
        one = pa.array(np.ones(n, dtype=np.int64))
        zero = pa.array(np.zeros(n, dtype=np.int64))
        cur = pa.table({"d": b["d"], "k": b["k"], "cur": one, "prev": zero})
        nxt = pa.table(
            {"d": pc.add(b["d"], 1), "k": b["k"], "cur": zero, "prev": one}
        )
        return pa.concat_tables([cur, nxt])

    flags = grouped_agg(
        distinct.map_batches(emit, batch_format="pyarrow"),
        ["d", "k"],
        {"cur": ("cur", "sum"), "prev": ("prev", "sum")},
    )

    def inter(b: pa.Table) -> pa.Table:
        return b.append_column("both", pc.multiply(b["cur"], b["prev"]))

    per_day = grouped_agg(
        flags.map_batches(inter, batch_format="pyarrow"),
        ["d"],
        {
            "n_cur": ("cur", "sum"),
            "n_prev": ("prev", "sum"),
            "n_inter": ("both", "sum"),
        },
    )

    def close(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["d"] <= max_day].copy()
        union = b["n_cur"] + b["n_prev"] - b["n_inter"]
        b["jac_ppm"] = (scale * b["n_inter"]) // union
        for c in ("n_cur", "n_prev", "n_inter", "jac_ppm"):
            b[c] = b[c].astype("int64")
        return b.rename(columns={"d": "day"})

    return per_day.map_batches(close, batch_format="pandas")


def streak_histogram(ds, key_col: str = "user_id", ts_col: str = "ts"):
    """Histogram of longest consecutive-day activity streaks — the
    gaps-and-islands shape (SQL needs the d - row_number() island
    trick; here the island fold is a vectorized numpy diff per key):

        streak(key) = max run length of consecutive active days
        output      = (streak_len, n_keys)

    Two combiner exchanges plus one bucketed key shuffle, none over
    raw rows twice:
    1. raw rows collapse to DISTINCT (key, day) actives (combiner);
    2. one bucketed shuffle on the key; inside each bucket a numpy
       fold sorts the key's days and takes the longest run where
       diff == 1 — each key's distinct days are bounded by the time
       span, never by row count;
    3. per-key streaks collapse to the (streak_len, n_keys) histogram
       (combiner — the output is span-bounded, a few dozen rows).

    Returns a Dataset (streak_len, n_keys)."""
    from .agg import bucketed_map_groups, grouped_agg

    def prep(b: pa.Table) -> pa.Table:
        day = (
            b[ts_col]
            .to_pandas()
            .values.astype("datetime64[D]")
            .astype(np.int64)
        )
        return pa.table({"k": b[key_col], "d": pa.array(day)})

    distinct = grouped_agg(
        ds.map_batches(prep, batch_format="pyarrow"),
        ["k", "d"],
        {"_c": (None, "count")},
    )

    def longest(g: pd.DataFrame) -> pd.DataFrame:
        d = np.sort(g["d"].to_numpy(dtype=np.int64))
        # run boundaries where the day gap exceeds 1
        breaks = np.flatnonzero(np.diff(d) != 1)
        edges = np.concatenate(([-1], breaks, [len(d) - 1]))
        streak = int(np.max(np.diff(edges)))
        return pd.DataFrame(
            {"k": [g["k"].iloc[0]], "streak_len": pd.array([streak], dtype="int64")}
        )

    per_key = bucketed_map_groups(
        distinct.select_columns(["k", "d"]), ["k"], longest
    )
    hist = grouped_agg(per_key, ["streak_len"], {"n_keys": (None, "count")})

    def cast(b: pd.DataFrame) -> pd.DataFrame:
        return b.astype({"streak_len": "int64", "n_keys": "int64"})

    return hist.map_batches(cast, batch_format="pandas")


def run_length_histogram(
    ds,
    key_col: str = "user_id",
    value_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
):
    """Histogram of each key's LONGEST run of consecutive equal values
    in event order — the behavioral-repetition signal (bot bursts,
    stuck clients repeat one action; organic traffic alternates).
    Order within a key is (ts, tiebreak) — deterministic even with
    equal timestamps, matching a SQL ``row_number() OVER (PARTITION BY
    key ORDER BY ts, tiebreak)`` oracle exactly.

    One bucketed key shuffle (raw event rows move once); the in-group
    fold is a vectorized numpy change-point scan; the per-key maxima
    collapse to a span-bounded (run_len, n_keys) histogram in a final
    combiner.

    Returns a Dataset (run_len, n_keys)."""
    from .agg import bucketed_map_groups, grouped_agg

    def longest_run(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, tiebreak_col], kind="mergesort")
        v = g[value_col].to_numpy()
        if len(v) == 0:
            return None
        change = np.flatnonzero(v[1:] != v[:-1])
        edges = np.concatenate(([-1], change, [len(v) - 1]))
        run = int(np.max(np.diff(edges)))
        return pd.DataFrame(
            {"k": [g[key_col].iloc[0]], "run_len": pd.array([run], dtype="int64")}
        )

    per_key = bucketed_map_groups(
        ds.select_columns([key_col, value_col, ts_col, tiebreak_col]),
        [key_col],
        longest_run,
    )
    hist = grouped_agg(per_key, ["run_len"], {"n_keys": (None, "count")})

    def cast(b: pd.DataFrame) -> pd.DataFrame:
        return b.astype({"run_len": "int64", "n_keys": "int64"})

    return hist.map_batches(cast, batch_format="pandas")


def consecutive_gaps(ds, key_col: str, ts_col: str = "ts"):
    """Per-key consecutive-event gaps in whole days — one (key, gap)
    row per adjacent pair of the key's DATE-sorted events (the
    reorder-interval / return-visit signal). The gap MULTISET is
    invariant under same-day tie order (sorted dates diff the same
    whatever permutation ties take), so no tie-break column is needed
    and a SQL ``lead() OVER (ORDER BY date)`` oracle matches exactly.

    One bucketed key shuffle; the in-group fold is a numpy diff.
    Keys with a single event emit nothing.

    Returns a Dataset (key, gap) with gap in integer days."""
    from .agg import bucketed_map_groups

    def prep(b: pa.Table) -> pa.Table:
        day = (
            b[ts_col]
            .to_pandas()
            .values.astype("datetime64[D]")
            .astype(np.int64)
        )
        return pa.table({key_col: b[key_col], "d": pa.array(day)})

    def gaps(g: pd.DataFrame) -> pd.DataFrame:
        d = np.sort(g["d"].to_numpy(dtype=np.int64))
        if len(d) < 2:
            return None
        return pd.DataFrame(
            {
                key_col: np.repeat(g[key_col].iloc[0], len(d) - 1),
                "gap": pd.array(np.diff(d), dtype="int64"),
            }
        )

    return bucketed_map_groups(
        ds.select_columns([key_col, ts_col]).map_batches(
            prep, batch_format="pyarrow"
        ),
        [key_col],
        gaps,
    )


def growth_accounting(ds, key_col: str = "user_id", ts_col: str = "ts"):
    """Daily growth accounting — each active (key, day) classified as

        new          first day the key was ever seen
        retained     also active the previous day
        resurrected  seen before, but not the previous day

    (the standard DAU decomposition product analytics closes with;
    churn falls out as yesterday's actives minus today's retained).

    One combiner collapses raw rows to DISTINCT (key, day) actives;
    one bucketed key shuffle; the per-key numpy fold classifies its
    sorted days (first → new, diff == 1 → retained, else resurrected);
    a final combiner folds to the span-bounded (day, category, n_keys)
    report. Raw rows never shuffle twice.

    Returns a Dataset (day, category, n_keys); day is epoch-days."""
    from .agg import bucketed_map_groups, grouped_agg

    def prep(b: pa.Table) -> pa.Table:
        day = (
            b[ts_col]
            .to_pandas()
            .values.astype("datetime64[D]")
            .astype(np.int64)
        )
        return pa.table({"k": b[key_col], "d": pa.array(day)})

    distinct = grouped_agg(
        ds.select_columns([key_col, ts_col]).map_batches(
            prep, batch_format="pyarrow"
        ),
        ["k", "d"],
        {"_c": (None, "count")},
    )

    def classify(g: pd.DataFrame) -> pd.DataFrame:
        d = np.sort(g["d"].to_numpy(dtype=np.int64))
        cat = np.empty(len(d), dtype=object)
        cat[0] = "new"
        if len(d) > 1:
            gaps = np.diff(d)
            cat[1:] = np.where(gaps == 1, "retained", "resurrected")
        return pd.DataFrame({"day": d, "category": cat})

    per_day = bucketed_map_groups(
        distinct.select_columns(["k", "d"]), ["k"], classify
    )
    out = grouped_agg(per_day, ["day", "category"], {"n_keys": (None, "count")})

    def cast(b: pd.DataFrame) -> pd.DataFrame:
        return b.astype({"day": "int64", "n_keys": "int64"})

    return out.map_batches(cast, batch_format="pandas")


def first_conversion_lags(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    from_val: str = "view",
    to_val: str = "purchase",
):
    """Per-key lag in WHOLE SECONDS from the key's first ``from_val``
    event to its first ``to_val`` event at-or-after it — the
    time-to-convert signal funnels quantile over. Keys without a
    ``from_val`` event, or without a qualifying ``to_val``, emit
    nothing (SQL inner-join semantics).

    One bucketed key shuffle of the two relevant event types only
    (filter pushes into the scan side); the per-key fold is two
    vectorized minima. Returns a Dataset (key, lag_sec)."""
    import pyarrow.compute as pc

    from .agg import bucketed_map_groups

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(
            pc.or_(
                pc.equal(b[type_col], from_val), pc.equal(b[type_col], to_val)
            )
        )

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[ts_col].to_numpy()
        is_from = (g[type_col] == from_val).to_numpy()
        if not is_from.any():
            return None
        vt = ts[is_from].min()
        after = ts[(~is_from) & (ts >= vt)]
        if len(after) == 0:
            return None
        lag = (after.min() - vt).astype("timedelta64[s]").astype(np.int64)
        return pd.DataFrame(
            {
                key_col: [g[key_col].iloc[0]],
                "lag_sec": pd.array([int(lag)], dtype="int64"),
            }
        )

    return bucketed_map_groups(
        ds.select_columns([key_col, ts_col, type_col]).map_batches(
            keep, batch_format="pyarrow"
        ),
        [key_col],
        fold,
    )


def bounce_rate_by_entry(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    gap_us: int = 30 * 60 * 1_000_000,
    scale: int = 1_000_000,
):
    """Per-entry-type session bounce rate — sessions split on gaps
    STRICTLY greater than ``gap_us``, attributed to the type of their
    first event ((ts, tiebreak) order — deterministic under equal
    timestamps), a bounce being a single-event session. The classic
    landing-quality report, integer-exact:

        bounce_ppm = floor( scale * n_bounces / n_sessions )

    One bucketed key shuffle (raw events move once); the in-group fold
    is a vectorized gap-split; a final combiner folds per entry type.
    Returns a Dataset (entry_type, n_sessions, n_bounces, bounce_ppm).
    """
    from .agg import bucketed_map_groups, grouped_agg

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, tiebreak_col], kind="mergesort")
        t = pd.DatetimeIndex(g[ts_col]).values.astype("datetime64[us]").astype(np.int64)
        brk = np.zeros(len(t), dtype=np.int64)
        brk[1:] = (np.diff(t) > gap_us).astype(np.int64)
        sid = np.cumsum(brk)
        types = g[type_col].to_numpy()
        starts = np.flatnonzero(np.concatenate(([1], np.diff(sid)))).astype(int)
        sizes = np.diff(np.concatenate((starts, [len(t)])))
        return pd.DataFrame(
            {
                "entry_type": types[starts],
                "is_bounce": pd.array(
                    (sizes == 1).astype(np.int64), dtype="int64"
                ),
            }
        )

    per_session = bucketed_map_groups(
        ds.select_columns([key_col, ts_col, type_col, tiebreak_col]),
        [key_col],
        fold,
    )
    agg = grouped_agg(
        per_session,
        ["entry_type"],
        {"n_sessions": (None, "count"), "n_bounces": ("is_bounce", "sum")},
    )

    def close(b: pd.DataFrame) -> pd.DataFrame:
        b = b.astype({"n_sessions": "int64", "n_bounces": "int64"})
        b["bounce_ppm"] = (scale * b["n_bounces"]) // b["n_sessions"]
        return b

    return agg.map_batches(close, batch_format="pandas")


def burstiness_classes(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    scale: int = 1_000_000,
):
    """Histogram of per-key inter-event burstiness classes — each
    key's inter-event gaps (whole seconds, event order by ts) scored
    by the squared coefficient of variation in exact ppm:

        cv2_ppm = floor( scale * (n*Σg² - (Σg)²) / (Σg)² )

    (population variance over mean squared — 1e6 ~ Poisson/memoryless,
    below = metronome-regular, above = bursty) and bucketed:

        regular  cv2 <  500_000
        poisson  500_000 <= cv2 <= 2_000_000
        bursty   cv2 >  2_000_000

    Keys with fewer than 2 events or an all-zero gap sum (every event
    in the same second) are classed ``degenerate``. One bucketed key
    shuffle; Python-int moments (second-scale squares stay modest, but
    bigints cost nothing here). Returns a Dataset (class, n_keys)."""
    from .agg import bucketed_map_groups, grouped_agg

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        t = np.sort(
            pd.DatetimeIndex(g[ts_col]).values.astype("datetime64[us]").astype(np.int64)
        )
        gaps = [int(v) // 1_000_000 for v in np.diff(t)]
        n = len(gaps)
        s = sum(gaps)
        if n < 1 or s == 0:
            cls = "degenerate"
        else:
            sgg = sum(v * v for v in gaps)
            cv2 = (scale * (n * sgg - s * s)) // (s * s)
            if cv2 < 500_000:
                cls = "regular"
            elif cv2 <= 2_000_000:
                cls = "poisson"
            else:
                cls = "bursty"
        return pd.DataFrame({"class": [cls]})

    per_key = bucketed_map_groups(
        ds.select_columns([key_col, ts_col]), [key_col], fold
    )
    out = grouped_agg(per_key, ["class"], {"n_keys": (None, "count")})
    return out.map_batches(
        lambda b: b.astype({"n_keys": "int64"}), batch_format="pandas"
    )


def first_last_matrix(
    ds,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
):
    """First-touch x last-touch attribution matrix — each key's FIRST
    and LAST event type in (ts, tiebreak) order, counted into the
    |types|² matrix (plus the key's total span in whole seconds,
    summed per cell). The multi-touch attribution summary marketers
    close with; FIRST_VALUE/LAST_VALUE window shapes as one fold.

    One bucketed key shuffle; vectorized idxmin/idxmax per key; one
    |types|²-bounded combiner. Returns a Dataset
    (first_type, last_type, n_keys, span_sec_sum)."""
    from .agg import bucketed_map_groups, grouped_agg

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, tiebreak_col], kind="mergesort")
        t = pd.DatetimeIndex(g[ts_col]).values.astype("datetime64[us]").astype(np.int64)
        span = int((t[-1] - t[0]) // 1_000_000)
        return pd.DataFrame(
            {
                "first_type": [g[type_col].iloc[0]],
                "last_type": [g[type_col].iloc[-1]],
                "span_sec": pd.array([span], dtype="int64"),
            }
        )

    per_key = bucketed_map_groups(
        ds.select_columns([key_col, ts_col, type_col, tiebreak_col]),
        [key_col],
        fold,
    )
    out = grouped_agg(
        per_key,
        ["first_type", "last_type"],
        {"n_keys": (None, "count"), "span_sec_sum": ("span_sec", "sum")},
    )
    return out.map_batches(
        lambda b: b.astype({"n_keys": "int64", "span_sec_sum": "int64"}),
        batch_format="pandas",
    )
