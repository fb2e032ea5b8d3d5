"""Wave-181 ops: linear-probing replay — determinism, wraparound,
clustering pathology, accounting."""

import hashlib

import pandas as pd
import pytest

from ocr_service_ray.ops.linprobe import lp_insert_replay


def _h(k, m=32):
    return int(hashlib.md5(f"lp:{k}".encode()).hexdigest()[:15], 16) % m


def test_no_collision_probe_one():
    keys = []
    seen = set()
    k = 0
    while len(keys) < 5:
        if _h(k) not in seen:
            seen.add(_h(k))
            keys.append(k)
        k += 1
    out = lp_insert_replay(keys)
    assert (out["probe_len"] == 1).all()
    assert (out["slot"] == out["h"]).all()


def test_forced_collision_cluster():
    # find three keys with the same home slot: they must occupy
    # consecutive slots with probe lengths 1, 2, 3
    target = _h(0)
    keys = [k for k in range(4000) if _h(k) == target][:3]
    assert len(keys) == 3
    out = lp_insert_replay(sorted(keys))
    assert sorted(out["probe_len"]) == [1, 2, 3]
    assert sorted(out["slot"]) == sorted(
        [(target + d) % 32 for d in range(3)]
    )


def test_slots_unique_and_capacity():
    keys = list(range(24))
    out = lp_insert_replay(keys)
    assert out["slot"].nunique() == 24
    assert (out["probe_len"] >= 1).all()
    with pytest.raises(ValueError):
        lp_insert_replay(list(range(40)), m=32)


def test_wraparound():
    # force a key whose home is slot 31 while 31 is occupied: the
    # probe must wrap to 0
    k31 = next(k for k in range(4000) if _h(k) == 31)
    k31b = next(k for k in range(k31 + 1, 8000) if _h(k) == 31)
    out = lp_insert_replay([k31, k31b])
    s = out.set_index("key")
    assert s.loc[k31, "slot"] == 31
    assert s.loc[k31b, "slot"] == 0
    assert s.loc[k31b, "probe_len"] == 2
