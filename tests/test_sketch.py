"""HyperLogLog (ops/sketch.py): register arithmetic vs a pure-Python
reference, estimate accuracy vs exact distinct, null skipping, merge
associativity across block layouts."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from ocr_service_ray.ops.sketch import (
    _bit_length,
    approx_distinct,
    hll_estimate,
    hll_registers,
)


def _ref_registers(values, p):
    rem, mask = 32 - p, (1 << (32 - p)) - 1
    regs = {}
    for v in values:
        if v is None:
            continue
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16)
        b, w = h >> rem, h & mask
        rho = rem + 1 if w == 0 else rem + 1 - w.bit_length()
        regs[b] = max(regs.get(b, 0), rho)
    return regs


def test_bit_length_exact():
    w = np.array([0, 1, 2, 3, 4, 255, 256, (1 << 22) - 1, 1 << 21], dtype=np.uint32)
    assert _bit_length(w).tolist() == [int(x).bit_length() for x in w]


@pytest.mark.parametrize("p", [6, 10])
def test_registers_match_reference(ray_session, p):
    import ray.data as rd

    vals = [f"v{i}" for i in range(500)] + [None, None] + [f"v{i}" for i in range(50)]
    t = pa.table({"x": pa.array(vals, pa.string())})
    got = hll_registers(rd.from_arrow(t), "x", p).to_pandas()
    assert dict(zip(got["bucket"], got["max_rho"])) == _ref_registers(vals, p)


def test_registers_block_layout_invariant(ray_session):
    # the merge is max — register table must not depend on block split
    import ray.data as rd

    vals = [f"doc-{i}" for i in range(300)]
    t = pa.table({"x": pa.array(vals)})
    one = hll_registers(rd.from_arrow(t), "x", 8).to_pandas()
    many = hll_registers(
        rd.from_arrow(t).repartition(13), "x", 8
    ).to_pandas()
    a = dict(zip(one["bucket"], one["max_rho"]))
    b = dict(zip(many["bucket"], many["max_rho"]))
    assert a == b


def test_estimate_accuracy(ray_session):
    import ray.data as rd

    n = 20_000
    t = pa.table({"x": pa.array([f"item-{i % n}" for i in range(2 * n)])})
    est = approx_distinct(rd.from_arrow(t).repartition(8), "x", p=11)
    # HLL stderr ~1.04/sqrt(2^11) ≈ 2.3%; allow 4 sigma
    assert abs(est - n) / n < 0.10


def test_int_column_matches_varchar_cast(ray_session):
    # int hashing must mirror CAST(col AS VARCHAR): str(int)
    import ray.data as rd

    vals = list(range(1000))
    t = pa.table({"x": pa.array(vals, pa.int64())})
    got = hll_registers(rd.from_arrow(t), "x", 9).to_pandas()
    assert dict(zip(got["bucket"], got["max_rho"])) == _ref_registers(vals, 9)


def test_small_range_correction():
    # with few distincts the linear-counting branch must engage and be
    # close to exact
    regs = _ref_registers([f"k{i}" for i in range(30)], 10)
    import pandas as pd

    df = pd.DataFrame(
        {"bucket": list(regs), "max_rho": [regs[b] for b in regs]}
    )
    est = hll_estimate(df, 10)
    assert abs(est - 30) < 4


def test_grouped_hll_matches_exact_within_error(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ocr_service_ray.ops.sketch import grouped_approx_distinct

    rng = np.random.default_rng(3)
    df = pd.DataFrame(
        {
            "seg": np.repeat(["a", "b", "c"], 2000),
            "uid": np.concatenate(
                [
                    rng.integers(0, 150, 2000),     # ~150 distinct
                    rng.integers(0, 900, 2000),     # ~850 distinct
                    np.arange(2000),                # 2000 distinct
                ]
            ),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(5)
    out = grouped_approx_distinct(ds, "seg", "uid", p=10)
    exact = df.groupby("seg")["uid"].nunique()
    for _, row in out.iterrows():
        e = exact[row["seg"]]
        # p=10 → ~3.25% std error; allow 5 sigma
        assert abs(row["approx_distinct"] - e) / e < 0.17, (row["seg"], row["approx_distinct"], e)


def test_grouped_hll_registers_equal_global_per_group(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ocr_service_ray.ops.sketch import grouped_hll_registers, hll_registers

    df = pd.DataFrame({"seg": ["x"] * 50 + ["y"] * 30, "uid": list(range(50)) + list(range(100, 130))})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(3)
    grouped = grouped_hll_registers(ds, "seg", "uid", p=6).to_pandas()
    for seg in ["x", "y"]:
        sub = df[df["seg"] == seg]
        solo = hll_registers(
            rd.from_arrow(pa.Table.from_pandas(sub, preserve_index=False)), "uid", p=6
        ).to_pandas().sort_values("bucket").reset_index(drop=True)
        g = (
            grouped[grouped["seg"] == seg][["bucket", "max_rho"]]
            .sort_values("bucket")
            .reset_index(drop=True)
        )
        pd.testing.assert_frame_equal(g, solo, check_dtype=False)


def test_winsorize_clips_to_disc_quantiles(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ocr_service_ray.ops.sketch import winsorize

    df = pd.DataFrame(
        {"i": np.arange(100, dtype=np.int64), "v": np.arange(100, dtype=np.int64)}
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(4)
    out = (
        winsorize(ds, "v", 0.10, 0.90, keep_cols=["i"])
        .to_pandas()
        .sort_values("i")
        .reset_index(drop=True)
    )
    # quantile_disc(0.10) of 0..99 = 9, (0.90) = 89 (ceil(q*n)-1 rank)
    assert out["v_w"].min() == 9 and out["v_w"].max() == 89
    assert out.loc[50, "v_w"] == 50  # mid-range untouched
    # NULLs pass through
    df2 = pd.DataFrame({"i": [0, 1], "v": pd.array([1000, None], dtype="Int64")})
    out2 = winsorize(
        rd.from_arrow(pa.Table.from_pandas(df2, preserve_index=False)),
        "v", 0.0, 1.0, keep_cols=["i"],
    ).to_pandas()
    assert pd.isna(out2.sort_values("i")["v_w"].iloc[1])


def test_quantiles_ignore_nulls(ray_session):
    import duckdb
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ocr_service_ray.ops.sketch import (
        value_counts_quantiles,
        value_counts_quantiles_cont,
    )

    df = pd.DataFrame({"v": pd.array([1, 2, 3, 4, None, None], dtype="Int64")})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(2)
    disc = value_counts_quantiles(ds, "v", [0.5])
    cont = value_counts_quantiles_cont(ds, "v", [0.5])
    ref = duckdb.connect().execute(
        "SELECT quantile_disc(v, 0.5), quantile_cont(v, 0.5) FROM df"
    ).fetchone()
    assert disc["value"].iloc[0] == ref[0]
    assert cont["value"].iloc[0] == ref[1]


def test_grouped_quantiles_cont_matches_numpy(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ocr_service_ray.ops.sketch import grouped_quantiles_cont

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "g": rng.integers(0, 3, 200),
            "v": rng.integers(-50, 5000, 200),
        }
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False)).repartition(5)
    out = (
        grouped_quantiles_cont(ds, ["g"], "v", [0.25, 0.5, 0.9])
        .to_pandas()
        .sort_values(["g", "q_pct"])
        .reset_index(drop=True)
    )
    for g, grp in df.groupby("g"):
        for q in (0.25, 0.5, 0.9):
            want = np.quantile(grp["v"].to_numpy(np.float64), q)  # linear
            got = out[(out["g"] == g) & (out["q_pct"] == int(q * 100))][
                "value"
            ].iloc[0]
            assert got == want, (g, q, got, want)


def test_grouped_quantiles_cont_all_null_group_dropped(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ocr_service_ray.ops.sketch import grouped_quantiles_cont

    df = pd.DataFrame(
        {"g": ["a", "a", "b"], "v": pd.array([1, 3, None], dtype="Int64")}
    )
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    out = grouped_quantiles_cont(ds, ["g"], "v", [0.5]).to_pandas()
    assert set(out["g"]) == {"a"}
    assert out["value"].iloc[0] == 2.0


def test_cms_overestimates_and_is_exact_when_sparse(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ocr_service_ray.ops.sketch import cms_build, cms_estimate

    # heavy token appears 60x, tail tokens once each
    texts = ["heavy " * 6] * 10 + [f"tail{i}" for i in range(30)]
    ds = rd.from_arrow(
        pa.table({"text": pa.array(texts, pa.string())})
    ).repartition(4)
    sk = cms_build(ds, "text", depth=4, width=1024)
    # total mass in every row equals the token-instance count
    assert (sk.groupby("row")["c"].sum() == 90).all()
    est = cms_estimate(sk, ["heavy"] + [f"tail{i}" for i in range(30)] + ["absent"],
                       depth=4, width=1024)
    lut = dict(zip(est["token"], est["est_c"]))
    assert lut["heavy"] >= 60
    for i in range(30):
        assert lut[f"tail{i}"] >= 1
    # 61 distinct tokens in 4x1024 cells: collisions possible but the
    # one-sided bound always holds; the absent token can only collide
    assert lut["absent"] >= 0


def test_cms_block_layout_invariant(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ocr_service_ray.ops.sketch import cms_build

    texts = [f"w{i % 7} w{i % 11}" for i in range(50)]
    t = pa.table({"text": pa.array(texts, pa.string())})
    a = cms_build(rd.from_arrow(t), "text").sort_values(["row", "cell"]).reset_index(drop=True)
    b = (
        cms_build(rd.from_arrow(t).repartition(7), "text")
        .sort_values(["row", "cell"])
        .reset_index(drop=True)
    )
    assert a.equals(b)


def test_iterative_median_matches_quantile_disc(ray_session):
    import duckdb
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ocr_service_ray.ops.sketch import iterative_exact_median

    rng = np.random.default_rng(3)
    for vals in (
        rng.integers(-10_000_000, 10_000_000, 5000),  # wide near-unique
        rng.integers(0, 5, 1000),                     # heavy ties
        np.full(17, 42),                              # degenerate
        np.array([7]),                                # single row
    ):
        df = pd.DataFrame({"v": vals.astype(np.int64)})
        ds = rd.from_arrow(
            pa.Table.from_pandas(df, preserve_index=False)
        ).repartition(4)
        med, n, rounds = iterative_exact_median(ds, "v")
        ref = duckdb.connect().execute(
            "SELECT quantile_disc(v, 0.5) FROM df"
        ).fetchone()[0]
        assert n == len(vals)
        assert med == ref, (med, ref, len(vals))


def test_iterative_median_nulls_and_empty(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ocr_service_ray.ops.sketch import iterative_exact_median

    df = pd.DataFrame({"v": pd.array([None, 5, None, 9], dtype="Int64")})
    ds = rd.from_arrow(pa.Table.from_pandas(df, preserve_index=False))
    med, n, _ = iterative_exact_median(ds, "v")
    assert (med, n) == (5, 2)  # lower median of {5, 9}; NULLs hold no rank
    empty = pd.DataFrame({"v": pd.array([], dtype="Int64")})
    ds0 = rd.from_arrow(pa.Table.from_pandas(empty, preserve_index=False))
    med0, n0, r0 = iterative_exact_median(ds0, "v")
    assert (med0, n0, r0) == (None, 0, 0)


def test_kll_exact_below_compaction_threshold():
    import duckdb
    import numpy as np
    import pandas as pd

    from ocr_service_ray.ops.sketch import KllSketch

    rng = np.random.RandomState(7)
    vals = rng.randint(0, 1000, 60)  # n < k=64: no compaction -> exact
    s = KllSketch(64).add_many(vals.tolist())
    assert s.weight() == 60
    df = pd.DataFrame({"v": vals})
    for q in (0.1, 0.25, 0.5, 0.75, 0.9):
        ref = duckdb.connect().execute(
            f"SELECT quantile_disc(v, {q}) FROM df"
        ).fetchone()[0]
        assert s.quantile(q) == ref, (q, s.quantile(q), ref)


def test_kll_weight_exact_and_rank_error_bounded():
    import numpy as np

    from ocr_service_ray.ops.sketch import KllSketch

    for make in (
        lambda r: r.randint(0, 1_000_000, 50_000),   # uniform
        lambda r: np.arange(50_000),                 # sorted
        lambda r: np.repeat(r.randint(0, 50, 10), 5_000),  # heavy ties
    ):
        rng = np.random.RandomState(11)
        vals = make(rng)
        s = KllSketch(128)
        for i in range(0, len(vals), 1_000):  # block-wise feed
            s.add_many(vals[i : i + 1_000].tolist())
        assert s.weight() == len(vals)  # compaction is weight-exact
        srt = np.sort(vals)
        for q in (0.05, 0.25, 0.5, 0.75, 0.95):
            v = s.quantile(q)
            lo = np.searchsorted(srt, v, side="left") / len(vals)
            hi = np.searchsorted(srt, v, side="right") / len(vals)
            err = 0.0 if lo <= q <= hi else min(abs(lo - q), abs(hi - q))
            assert err <= 0.03, (q, v, lo, hi)


def test_kll_merge_matches_partial_feed():
    import numpy as np

    from ocr_service_ray.ops.sketch import KllSketch

    rng = np.random.RandomState(3)
    vals = rng.randint(0, 1_000_000, 40_000)
    parts = [
        KllSketch(128).add_many(vals[i : i + 4_000].tolist())
        for i in range(0, len(vals), 4_000)
    ]
    merged = KllSketch(128)
    for p in parts:
        merged.merge(p)
    assert merged.weight() == len(vals)
    srt = np.sort(vals)
    for q in (0.25, 0.5, 0.75):
        v = merged.quantile(q)
        lo = np.searchsorted(srt, v, side="left") / len(vals)
        hi = np.searchsorted(srt, v, side="right") / len(vals)
        err = 0.0 if lo <= q <= hi else min(abs(lo - q), abs(hi - q))
        assert err <= 0.03, (q, v)
    # items() -> from_items round-trip preserves the sketch contents
    rt = KllSketch.from_items(merged.items(), k=128)
    assert rt.weight() == merged.weight()
    assert all(rt.quantile(q) == merged.quantile(q) for q in (0.25, 0.5, 0.75))


def test_kll_quantiles_distributed(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ocr_service_ray.ops.sketch import kll_quantiles

    rng = np.random.RandomState(5)
    vals = rng.randint(0, 100_000, 30_000).astype(np.int64)
    df = pd.DataFrame({"v": vals})
    ds = rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
    ).repartition(8)
    out = kll_quantiles(ds, "v", [0.25, 0.5, 0.75], k=128)
    assert list(out["q_pct"]) == [25, 50, 75]
    assert (out["w_total"] == len(vals)).all()  # weight survives the fold
    srt = np.sort(vals)
    for q, v in zip((0.25, 0.5, 0.75), out["value"]):
        lo = np.searchsorted(srt, v, side="left") / len(vals)
        hi = np.searchsorted(srt, v, side="right") / len(vals)
        err = 0.0 if lo <= q <= hi else min(abs(lo - q), abs(hi - q))
        assert err <= 0.03, (q, v)
    # nulls hold no weight
    df2 = pd.DataFrame({"v": pd.array([None, 5, None, 9, 7], dtype="Int64")})
    ds2 = rd.from_arrow(pa.Table.from_pandas(df2, preserve_index=False))
    out2 = kll_quantiles(ds2, "v", [0.5], k=64)
    assert int(out2["w_total"].iloc[0]) == 3
    assert int(out2["value"].iloc[0]) == 7


def test_kmv_layout_invariant_and_exact_below_k(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ocr_service_ray.ops.sketch import kmv_estimate, kmv_group_sketch

    rng = np.random.RandomState(9)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b"], 5_000),
            "v": rng.randint(0, 40, 5_000),  # <= 40 distinct < k
        }
    )
    tbl = pa.Table.from_pandas(df, preserve_index=False)
    sk1 = kmv_group_sketch(rd.from_arrow(tbl).repartition(1), "g", "v", k=64)
    sk7 = kmv_group_sketch(rd.from_arrow(tbl).repartition(7), "g", "v", k=64)
    pd.testing.assert_frame_equal(sk1, sk7)  # bottom-k of a SET
    est = kmv_estimate(sk1, k=64)
    for g in ("a", "b"):
        true = df.loc[df["g"] == g, "v"].nunique()
        row = est.loc[est["g"] == g].iloc[0]
        assert (row["n_kept"], row["n_hat"]) == (true, true)  # exact path


def test_kmv_estimator_error_and_pair_ops(ray_session):
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from ocr_service_ray.ops.sketch import (
        kmv_estimate,
        kmv_group_sketch,
        kmv_pair_ops,
    )

    # a: 0..3999, b: 2000..5999 -> |a|=|b|=4000, inter=2000, union=6000
    va = np.arange(0, 4_000)
    vb = np.arange(2_000, 6_000)
    df = pd.DataFrame(
        {
            "g": ["a"] * len(va) + ["b"] * len(vb),
            "v": np.concatenate([va, vb]),
        }
    )
    ds = rd.from_arrow(
        pa.Table.from_pandas(df, preserve_index=False)
    ).repartition(6)
    k = 256
    sk = kmv_group_sketch(ds, "g", "v", k=k)
    est = kmv_estimate(sk, k=k)
    for g, true in (("a", 4_000), ("b", 4_000)):
        n_hat = int(est.loc[est["g"] == g, "n_hat"].iloc[0])
        assert abs(n_hat - true) / true < 0.2, (g, n_hat)  # ~1/sqrt(k)
    ops = kmv_pair_ops(sk, k, "a", "b").iloc[0]
    assert abs(int(ops["union_hat"]) - 6_000) / 6_000 < 0.2
    assert abs(int(ops["inter_hat"]) - 2_000) / 2_000 < 0.35
    assert abs(int(ops["jacc_ppm"]) - 333_333) / 333_333 < 0.35
    # nulls skipped, empty input -> empty sketch
    dfn = pd.DataFrame({"g": ["a", None], "v": pd.array([None, 3], dtype="Int64")})
    skn = kmv_group_sketch(
        rd.from_arrow(pa.Table.from_pandas(dfn, preserve_index=False)),
        "g",
        "v",
        k=8,
    )
    assert len(skn) == 0
