"""Wave-161 ops: cache-policy replay — hand-worked traces, Belady
optimality dominance, policy-separating patterns, accounting."""

import numpy as np

from ocr_service_ray.ops.cachesim import (
    _replay_belady,
    _replay_fifo,
    _replay_lru,
    cache_report,
)


def test_hand_worked_lru():
    # cap 2, trace 1 2 1 3 2: LRU hits = {1@2}, then 3 evicts 2,
    # 2 misses (evicts 1) -> 1 hit
    h, m, e = _replay_lru([1, 2, 1, 3, 2], 2)
    assert (h, m) == (1, 4)
    assert e == 4 - 2


def test_hand_worked_fifo():
    # same trace under FIFO: 1 hits once too, but eviction order
    # differs: fifo evicts 1 (oldest) at 3 -> final cache {2,3},
    # then 2 HITS. 2 hits total.
    h, m, e = _replay_fifo([1, 2, 1, 3, 2], 2)
    assert (h, m) == (2, 3)


def test_sequential_scan_thrash():
    # cyclic scan larger than cap: LRU gets ZERO hits (the classic
    # pathology), FIFO also zero
    trace = [1, 2, 3, 4] * 5
    assert _replay_lru(trace, 3)[0] == 0
    assert _replay_fifo(trace, 3)[0] == 0
    # Belady keeps a working set and does strictly better
    assert _replay_belady(trace, 3)[0] > 0


def test_belady_dominates():
    rng = np.random.RandomState(161)
    for _ in range(20):
        n = int(rng.randint(10, 120))
        trace = [int(x) for x in rng.zipf(1.5, n) % 12]
        for cap in (2, 4, 8):
            hb = _replay_belady(trace, cap)[0]
            assert hb >= _replay_lru(trace, cap)[0]
            assert hb >= _replay_fifo(trace, cap)[0]


def test_accounting():
    rng = np.random.RandomState(7)
    trace = [int(x) for x in rng.randint(0, 9, 60)]
    out = cache_report(trace, cap=4)
    for _, r in out.iterrows():
        assert r["hits"] + r["misses"] == 60
        assert 0 <= r["evictions"] <= r["misses"]


def test_cap_larger_than_universe_no_evictions():
    trace = [1, 2, 3, 1, 2, 3, 1]
    out = cache_report(trace, cap=10)
    assert (out["evictions"] == 0).all()
    assert (out["hits"] == 4).all()
