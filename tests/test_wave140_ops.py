"""Wave-140 ops: KMP periodicity — closed forms, brute parity,
Fine-and-Wilf sanity."""

import numpy as np
import pyarrow as pa


def _brute_period(s):
    n = len(s)
    for p in range(1, n + 1):
        if s[p:] == s[: n - p]:
            return p
    return n


def test_periodicity_closed_forms():
    from ocr_service_ray.ops.periodicity import failure_border

    assert failure_border("") == 0
    assert failure_border("abab") == 2  # period 2
    assert failure_border("aaaa") == 3  # period 1
    assert failure_border("abcab") == 2  # border 'ab', period 3
    assert failure_border("abcdef") == 0  # aperiodic


def test_periodicity_random_vs_brute():
    from ocr_service_ray.ops.periodicity import failure_border

    rng = np.random.RandomState(140)
    for _ in range(60):
        n = int(rng.randint(1, 50))
        s = "".join(rng.choice(list("abя")) for _ in range(n))
        assert n - failure_border(s) == _brute_period(s)


def test_periodicity_dataset_flags_loops():
    import ray.data as rd

    from ocr_service_ray.ops.periodicity import periodicity

    out = (
        periodicity(
            rd.from_arrow(
                pa.table(
                    {
                        "doc_id": [1, 2, 3],
                        "text": ["spam " * 20, "no repeats here at all", ""],
                    }
                )
            ),
            "doc_id",
            "text",
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert out.loc[0, "period"] == 5
    assert out.loc[0, "exponent_micro"] == 48 * 1_000_000 // 5  # >= 2e6
    assert out.loc[1, "exponent_micro"] < 2_000_000
    assert out.loc[2, "period"] == 0 and out.loc[2, "prefix_len"] == 0
