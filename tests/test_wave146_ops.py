"""Wave-146 ops: BWT run audit — classic worked example, repetitive
vs diverse ordering, inverse-free invariants."""

import numpy as np
import pyarrow as pa

from ocr_service_ray.ops.bwt import _runs, bwt_last_column


def test_banana_worked_example():
    # sentinel-free rotations of 'banana' sorted:
    # abanan, anaban, ananab, banana, nabana, nanaba
    # last column: n, n, b, a, a, a  -> 'nnbaaa'
    assert bwt_last_column("banana") == "nnbaaa"
    assert _runs("nnbaaa") == 3
    assert _runs("banana") == 6


def test_bwt_is_a_permutation():
    rng = np.random.RandomState(146)
    for _ in range(40):
        n = int(rng.randint(0, 25))
        s = "".join(rng.choice(list("abcя")) for _ in range(n))
        assert sorted(bwt_last_column(s)) == sorted(s)


def test_repetitive_text_compresses():
    s = "ab" * 12  # raw runs = 24, BWT groups: 'b'*12 + 'a'*12 -> 2
    assert _runs(s) == 24
    assert _runs(bwt_last_column(s)) == 2


def test_runs_edge_cases():
    assert _runs("") == 0
    assert _runs("x") == 1
    assert bwt_last_column("") == ""
    assert bwt_last_column("q") == "q"


def test_dataset_pass(ray_session):
    import ray.data as rd

    from ocr_service_ray.ops.bwt import bwt_runs

    out = (
        bwt_runs(
            rd.from_arrow(
                pa.table(
                    {
                        "doc_id": [1, 2, 3],
                        "text": ["ab" * 20, "", "banana"],
                    }
                )
            ),
            "doc_id",
            "text",
            cap=24,
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["prefix_len"]) == [24, 0, 6]
    assert out.loc[0, "bwt_runs"] == 2
    assert out.loc[0, "raw_runs"] == 24
    assert out.loc[0, "gain_ppm"] == 1_000_000 * 2 // 24
    assert list(out.loc[1, ["bwt_runs", "raw_runs", "gain_ppm"]]) == [0, 0, 0]
    assert out.loc[2, "bwt_runs"] == 3
