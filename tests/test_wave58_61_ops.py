"""Property tests for the session-8 folds (waves 58-61): each query
function is driven on a synthetic parquet dir and checked against a
brute-force reference or an algebraic conservation law the fold must
satisfy for ANY input (pad-token conservation, greedy-bin prefix
identity, rank-sum pairwise identity, chi-square numerator identity,
budget-cap prefix semantics)."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq


def _entry():
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "__ray_entry__.py",
    )
    spec = importlib.util.spec_from_file_location("_entry_s8", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _write_docs(sf, texts, sources=None):
    n = len(texts)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": ["en"] * n,
            "source": sources if sources is not None else ["s0"] * n,
            "n_chars": np.array([len(t) for t in texts], np.int64),
        }
    )
    sf.mkdir(exist_ok=True)
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        str(sf / "documents.parquet"),
    )
    return df


def _write_events(sf, event_type, value, user_id=None):
    n = len(value)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(np.arange(n, dtype=np.int64), unit="s"),
            "user_id": (
                user_id if user_id is not None else np.zeros(n, np.int64)
            ),
            "event_type": event_type,
            "value": value,
            "props": ["{}"] * n,
        }
    )
    sf.mkdir(exist_ok=True)
    t = pa.Table.from_pandas(df, preserve_index=False)
    t = t.set_column(
        t.schema.get_field_index("ts"), "ts", t["ts"].cast(pa.timestamp("us"))
    )
    pq.write_table(t, str(sf / "events.parquet"))
    return df


def _write_orders(sf, df):
    sf.mkdir(exist_ok=True)
    t = pa.Table.from_pandas(df, preserve_index=False)
    idx = t.schema.get_field_index("o_orderdate")
    t = t.set_column(idx, "o_orderdate", t["o_orderdate"].cast(pa.timestamp("us")))
    pq.write_table(t, str(sf / "orders.parquet"))


def test_mannwhitney_matches_pairwise_bruteforce(ray_session, tmp_path):
    """u_times2 equals the pairwise definition 2*U1 =
    2*#(click>purchase) + #(click==purchase), including ties."""
    rng = np.random.default_rng(58)
    n = 300
    et = rng.choice(["click", "purchase", "view"], n)
    # coarse values force heavy ties
    val = rng.integers(0, 12, n) / 4.0
    _write_events(tmp_path / "sf", list(et), val)
    out = _entry().queries()["mannwhitney_u_value"](str(tmp_path / "sf"))
    out = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    a = val[et == "click"]
    b = val[et == "purchase"]
    gt = (a[:, None] > b[None, :]).sum()
    eq = (a[:, None] == b[None, :]).sum()
    assert int(out["n_click"].iloc[0]) == len(a)
    assert int(out["n_purchase"].iloc[0]) == len(b)
    assert int(out["u_times2"].iloc[0]) == 2 * int(gt) + int(eq)


def test_token_budget_cap_prefix_semantics(ray_session, tmp_path):
    """Docs are admitted in doc_id order per source until the
    cumulative token count (including the crossing doc? no — the cap
    is cum <= budget, the crossing doc is dropped) exceeds the
    budget; kept totals match a per-source brute force."""
    rng = np.random.default_rng(59)
    texts, sources = [], []
    for s in range(4):
        for _ in range(40):
            texts.append(" ".join(["w"] * int(rng.integers(100, 400))))
            sources.append(f"src{s}")
    df = _write_docs(tmp_path / "sf", texts, sources)
    out = _entry().queries()["token_budget_cap"](str(tmp_path / "sf"))
    out = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    ntok = df["text"].str.count(" ").to_numpy() + 1
    for s, g in df.assign(ntok=ntok).groupby("source"):
        g = g.sort_values("doc_id")
        cum = g["ntok"].cumsum()
        keep = cum <= 5000
        row = out[out["source"] == s]
        assert int(row["n_docs_kept"].iloc[0]) == int(keep.sum())
        assert int(row["tokens_kept"].iloc[0]) == int(g["ntok"][keep].sum())


def test_padding_waste_conservation(ray_session, tmp_path):
    """For every max_len L: n_seqs*L == n_pad + total_tokens (pad
    conservation) and n_seqs >= ceil(total_tokens/L) (independent
    chunking never beats perfect packing)."""
    rng = np.random.default_rng(60)
    texts = [
        " ".join(["t"] * int(rng.integers(1, 700))) for _ in range(120)
    ]
    df = _write_docs(tmp_path / "sf", texts)
    out = _entry().queries()["padding_waste_sweep"](str(tmp_path / "sf"))
    out = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    total = int((df["text"].str.count(" ") + 1).sum())
    for _, r in out.iterrows():
        L = int(r["max_len"])
        assert int(r["n_seqs"]) * L == int(r["n_pad"]) + total
        assert int(r["n_seqs"]) >= -(-total // L)
        assert int(r["n_docs"]) == len(df)


def test_compaction_bins_greedy_identity(ray_session, tmp_path):
    """Each bin's id equals floor(rows-before-bin / target); bins
    cover consecutive, non-overlapping date ranges; totals conserve."""
    rng = np.random.default_rng(61)
    n = 5000
    days = rng.integers(0, 37, n)
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_custkey": np.zeros(n, np.int64),
            "o_orderstatus": ["O"] * n,
            "o_totalprice": np.ones(n),
            "o_orderdate": pd.to_datetime(days, unit="D"),
            "o_orderpriority": ["1-URGENT"] * n,
        }
    )
    _write_orders(tmp_path / "sf", df)
    out = _entry().queries()["compaction_bins_orders"](str(tmp_path / "sf"))
    out = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    out = out.sort_values("bin").reset_index(drop=True)
    assert int(out["total_rows"].sum()) == n
    # prefix identity: bin b starts exactly at cumulative row count
    # of prior bins, and floor(prefix/target) == b for its first file
    prefix = 0
    prev_last = None
    for _, r in out.iterrows():
        assert prefix // 2000 == int(r["bin"])
        if prev_last is not None:
            assert r["first_day"] > prev_last  # disjoint ordered ranges
        assert r["first_day"] <= r["last_day"]
        prev_last = r["last_day"]
        prefix += int(r["total_rows"])


def test_cdc_upsert_census_bruteforce(ray_session, tmp_path):
    """Final census: every key%7==0 reports status U; the rest keep
    their base status — regardless of key distribution."""
    rng = np.random.default_rng(62)
    n = 900
    keys = rng.choice(20000, n, replace=False).astype(np.int64)
    status = rng.choice(["F", "O", "P"], n)
    df = pd.DataFrame(
        {
            "o_orderkey": keys,
            "o_custkey": np.zeros(n, np.int64),
            "o_orderstatus": status,
            "o_totalprice": np.ones(n),
            "o_orderdate": pd.to_datetime(np.zeros(n), unit="D"),
            "o_orderpriority": ["1-URGENT"] * n,
        }
    )
    _write_orders(tmp_path / "sf", df)
    out = _entry().queries()["cdc_upsert_orders"](str(tmp_path / "sf"))
    out = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    upd = keys % 7 == 0
    ref = (
        pd.Series(status[~upd]).value_counts().sort_index().astype("int64")
    )
    got = dict(zip(out["status"], out["n_orders"].astype(int)))
    assert got.pop("U") == int(upd.sum())
    assert got == ref.to_dict()


def test_max_token_run_bruteforce(ray_session, tmp_path):
    """Longest consecutive equal-token run matches a per-doc scan,
    covering all-same, no-repeat, and run-at-end shapes."""
    texts = [
        "a a a b b a",      # run 3
        "x y z",            # run 1
        "m",                # single token
        "p p p p",          # all same, run 4
        "q r r",            # run at end
    ]
    _write_docs(tmp_path / "sf", texts)
    out = _entry().queries()["max_token_run"](str(tmp_path / "sf"))
    out = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    got = dict(zip(out["doc_id"].astype(int), out["max_run"].astype(int)))

    def ref_run(t):
        best = cur = 1
        toks = t.split(" ")
        for i in range(1, len(toks)):
            cur = cur + 1 if toks[i] == toks[i - 1] else 1
            best = max(best, cur)
        return best

    assert got == {i: ref_run(t) for i, t in enumerate(texts)}


def test_hash_bucket_chisq_identity(ray_session, tmp_path):
    """chisq_num equals Σ(o_b*64 − n)² with o_b recomputed from the
    same md5 convention driver-side; min/max match."""
    n = 500
    _write_events(
        tmp_path / "sf", ["view"] * n, np.ones(n), np.zeros(n, np.int64)
    )
    out = _entry().queries()["hash_bucket_uniformity"](str(tmp_path / "sf"))
    out = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    o = np.zeros(64, np.int64)
    for e in range(n):
        d = hashlib.md5(f"bkt:{e}".encode()).digest()
        o[int.from_bytes(d[:8], "big") % 64] += 1
    dev = o * 64 - n
    assert int(out["n_rows"].iloc[0]) == n
    assert int(out["chisq_num"].iloc[0]) == int((dev * dev).sum())
    assert int(out["min_bucket_n"].iloc[0]) == int(o.min())
    assert int(out["max_bucket_n"].iloc[0]) == int(o.max())


def test_simpson_flip_detects_constructed_paradox(ray_session, tmp_path):
    """A textbook Simpson construction: within both priorities F beats
    O, but the O rows concentrate in the high-price priority so the
    pooled sign flips — the audit must mark both groups flipped."""
    rows = []
    # priority A (cheap): F mean 2.0 > O mean 1.0
    rows += [("A", "F", 2.0)] * 10 + [("A", "O", 1.0)] * 2
    # priority B (expensive): F mean 102.0 > O mean 101.0
    rows += [("B", "F", 102.0)] * 2 + [("B", "O", 101.0)] * 10
    df = pd.DataFrame(rows, columns=["o_orderpriority", "o_orderstatus", "o_totalprice"])
    n = len(df)
    df["o_orderkey"] = np.arange(n, dtype=np.int64)
    df["o_custkey"] = np.zeros(n, np.int64)
    df["o_orderdate"] = pd.to_datetime(np.zeros(n), unit="D")
    _write_orders(tmp_path / "sf", df)
    out = _entry().queries()["simpson_flip_audit"](str(tmp_path / "sf"))
    out = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    # per-group F-minus-O is positive in both
    assert (out["sign"] == 1).all()
    # pooled: mean F = (20+204)/12 ≈ 18.7, mean O = (2+1010)/12 ≈ 84.3
    assert int(out["overall_sign"].iloc[0]) == -1
    assert (out["flipped"] == 1).all()


def test_cube_revenue_lattice_consistency(ray_session, tmp_path):
    """Every coarser grouping set must equal the sum of its finer
    children, and the (ALL, ALL) apex equals the raw totals."""
    rng = np.random.default_rng(63)
    n = 800
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_custkey": np.zeros(n, np.int64),
            "o_orderstatus": rng.choice(["F", "O", "P"], n),
            "o_totalprice": rng.integers(100, 10**6, n) / 100.0,
            "o_orderdate": pd.to_datetime(np.zeros(n), unit="D"),
            "o_orderpriority": rng.choice(["1-URGENT", "2-HIGH"], n),
        }
    )
    _write_orders(tmp_path / "sf", df)
    out = _entry().queries()["cube_revenue"](str(tmp_path / "sf"))
    out = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    fine = out[(out["o_orderpriority"] != "ALL") & (out["o_orderstatus"] != "ALL")]
    apex = out[(out["o_orderpriority"] == "ALL") & (out["o_orderstatus"] == "ALL")]
    assert int(apex["n_orders"].iloc[0]) == n
    cents = np.floor(df["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(np.int64)
    assert int(apex["revenue_cents"].iloc[0]) == int(cents.sum())
    for p in ["1-URGENT", "2-HIGH"]:
        row = out[(out["o_orderpriority"] == p) & (out["o_orderstatus"] == "ALL")]
        kids = fine[fine["o_orderpriority"] == p]
        assert int(row["n_orders"].iloc[0]) == int(kids["n_orders"].sum())
        assert int(row["revenue_cents"].iloc[0]) == int(kids["revenue_cents"].sum())
    for s in ["F", "O", "P"]:
        row = out[(out["o_orderstatus"] == s) & (out["o_orderpriority"] == "ALL")]
        kids = fine[fine["o_orderstatus"] == s]
        assert int(row["n_orders"].iloc[0]) == int(kids["n_orders"].sum())


def test_sorted_lcp_multiblock_matches_bruteforce(ray_session, tmp_path):
    """sorted_lcp_docs with the input split across many parquet part
    files (multiple blocks -> real boundary stitching) equals a
    driver brute force over the fully sorted corpus."""
    rng = np.random.default_rng(64)
    prefixes = ["the quick brown fox", "lorem ipsum dolor", "zz"]
    texts = [
        rng.choice(prefixes) + " " + " ".join(
            rng.choice(list("abcdef"), rng.integers(1, 30))
        )
        for _ in range(600)
    ]
    sf = tmp_path / "sf"
    ddir = sf / "documents.parquet"
    ddir.mkdir(parents=True)
    n = len(texts)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": ["en"] * n,
            "source": ["s"] * n,
            "n_chars": np.array([len(t) for t in texts], np.int64),
        }
    )
    for i in range(6):
        part = df.iloc[i * 100 : (i + 1) * 100]
        pq.write_table(
            pa.Table.from_pandas(part, preserve_index=False),
            str(ddir / f"part-{i}.parquet"),
        )
    out = _entry().queries()["sorted_lcp_docs"](str(sf))
    out = out if isinstance(out, pd.DataFrame) else out.to_pandas()

    s = df.sort_values(["text", "doc_id"])["text"].tolist()

    def lcp(a, b):
        m = min(len(a), len(b))
        i = 0
        while i < m and a[i] == b[i]:
            i += 1
        return i

    ls = [lcp(s[i - 1], s[i]) for i in range(1, len(s))]
    assert int(out["n_docs"].iloc[0]) == n
    assert int(out["n_pairs"].iloc[0]) == n - 1
    assert int(out["sum_lcp"].iloc[0]) == sum(ls)
    assert int(out["max_lcp"].iloc[0]) == max(ls)
    assert int(out["n_ge_40"].iloc[0]) == sum(1 for x in ls if x >= 40)


def test_vacuum_plan_version_semantics(ray_session, tmp_path):
    """Deletable = referenced by the expired snapshot only; with the
    (d+s)%3 rewrite rule, exactly the days rewritten at s=1 and again
    at s... brute-forced per day."""
    days = np.arange(100, 130, dtype=np.int64)
    rows = []
    for d in days:
        for _ in range(int(d % 4) + 1):
            rows.append(d)
    n = len(rows)
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_custkey": np.zeros(n, np.int64),
            "o_orderstatus": ["O"] * n,
            "o_totalprice": np.ones(n),
            "o_orderdate": pd.to_datetime(np.array(rows), unit="D"),
            "o_orderpriority": ["1-URGENT"] * n,
        }
    )
    _write_orders(tmp_path / "sf", df)
    out = _entry().queries()["vacuum_plan_orders"](str(tmp_path / "sf"))
    out = out if isinstance(out, pd.DataFrame) else out.to_pandas()

    def version(d, s):
        v = 0
        for sp in range(1, s + 1):
            if (d + sp) % 3 == 0:
                v = sp
        return v

    counts = pd.Series(rows).value_counts()
    deletable = [d for d in days if version(d, 1) not in (version(d, 2), version(d, 3))]
    live = {(d, version(d, 2)) for d in days} | {(d, version(d, 3)) for d in days}
    assert int(out["n_days"].iloc[0]) == len(days)
    assert int(out["n_live_files"].iloc[0]) == len(live)
    assert int(out["n_deletable"].iloc[0]) == len(deletable)
    assert int(out["rows_reclaimed"].iloc[0]) == int(
        sum(counts[d] for d in deletable)
    )


def test_isotonic_fit_is_monotone_and_pools_violators(ray_session, tmp_path):
    """PAV invariants: fitted is non-decreasing; where raw rates are
    already increasing the fit equals them; a violating pair pools to
    its weighted average."""
    # hour 0: 10% (1/10), hour 1: 50% (5/10), hour 2: 20% (2/10)
    # -> hours 1,2 pool to 7/20 = 35%
    et, ts = [], []
    spec = {0: (1, 10), 1: (5, 10), 2: (2, 10)}
    t = 0
    for h, (k, n) in spec.items():
        for i in range(n):
            et.append("purchase" if i < k else "view")
            ts.append(h * 3600 + i)
    df = pd.DataFrame(
        {
            "event_id": np.arange(len(ts), dtype=np.int64),
            "ts": pd.to_datetime(ts, unit="s"),
            "user_id": np.zeros(len(ts), np.int64),
            "event_type": et,
            "value": np.ones(len(ts)),
            "props": ["{}"] * len(ts),
        }
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    t2 = pa.Table.from_pandas(df, preserve_index=False)
    t2 = t2.set_column(
        t2.schema.get_field_index("ts"), "ts", t2["ts"].cast(pa.timestamp("us"))
    )
    pq.write_table(t2, str(sf / "events.parquet"))
    out = _entry().queries()["isotonic_purchase_rate"](str(sf))
    out = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    out = out.sort_values("hour").reset_index(drop=True)
    f = out["fitted_ppm"].to_numpy()
    assert (np.diff(f) >= 0).all()
    assert f[0] == 100_000  # 10% untouched
    assert f[1] == f[2] == 350_000  # pooled to 7/20


def test_gmd_matches_pairwise_bruteforce(ray_session, tmp_path):
    rng = np.random.default_rng(65)
    n = 250
    et = rng.choice(["click", "view"], n)
    val = rng.integers(0, 40, n) / 4.0  # heavy ties
    _write_events(tmp_path / "sf", list(et), val)
    out = _entry().queries()["gmd_value_by_type"](str(tmp_path / "sf"))
    out = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    cents = np.floor(val * 100.0 + 0.5).astype(np.int64)
    for etype in ["click", "view"]:
        v = cents[et == etype]
        ref = int(np.abs(v[:, None] - v[None, :]).sum() // 2)
        row = out[out["event_type"] == etype]
        assert int(row["n"].iloc[0]) == len(v)
        assert int(row["sum_absdiff"].iloc[0]) == ref


def test_positional_delete_bruteforce(ray_session, tmp_path):
    rng = np.random.default_rng(66)
    n = 1200
    days = rng.integers(9000, 9010, n)
    keys = rng.permutation(100000)[:n].astype(np.int64)
    status = rng.choice(["F", "O", "P"], n)
    price = rng.integers(100, 10**6, n) / 100.0
    df = pd.DataFrame(
        {
            "o_orderkey": keys,
            "o_custkey": np.zeros(n, np.int64),
            "o_orderstatus": status,
            "o_totalprice": price,
            "o_orderdate": pd.to_datetime(days, unit="D"),
            "o_orderpriority": ["1-URGENT"] * n,
        }
    )
    _write_orders(tmp_path / "sf", df)
    out = _entry().queries()["positional_delete_orders"](str(tmp_path / "sf"))
    out = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    d = df.copy()
    d["cents"] = np.floor(d["o_totalprice"].to_numpy() * 100.0 + 0.5).astype(
        np.int64
    )
    d["day"] = days.astype(np.int64)
    d["pos"] = d.groupby("day")["o_orderkey"].rank(method="first").astype(int) - 1
    # rank follows o_orderkey order within day
    d = d.sort_values(["day", "o_orderkey"])
    d["pos"] = d.groupby("day").cumcount()
    keep = (d["day"] + d["pos"]) % 11 != 3
    ref = (
        d[keep]
        .groupby("o_orderstatus")
        .agg(n_rows=("cents", "size"), revenue_cents=("cents", "sum"))
        .reset_index()
    )
    got = out.sort_values("o_orderstatus").reset_index(drop=True)
    ref = ref.sort_values("o_orderstatus").reset_index(drop=True)
    assert got["n_rows"].astype(int).tolist() == ref["n_rows"].astype(int).tolist()
    assert (
        got["revenue_cents"].astype(int).tolist()
        == ref["revenue_cents"].astype(int).tolist()
    )
