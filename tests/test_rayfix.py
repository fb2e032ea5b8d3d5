"""Regression tests for ocr_service_ray.rayfix — the Ray 2.49
hash-shuffle schema-broadcast race (see rayfix module docstring) and
the capped aggregator reservation that keeps chained joins from
deadlocking a small cluster (relational.join_aggregator_args)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_rayfix_applies(ray_session):
    from ocr_service_ray import rayfix

    assert rayfix.apply() is True
    assert rayfix.apply() is True  # idempotent


def test_sparse_left_join_with_leading_empty_block(ray_session):
    """dbg shape that reproduced the race: a sparse left side whose
    plan yields schema-ful empty blocks FIRST (union puts the empty
    table at a deterministic position) used to raise ArrowInvalid from
    HashShuffleAggregator.finalize depending on submission order."""
    import ray.data as rd

    from ocr_service_ray.ops.relational import hash_join

    lschema = pa.schema([("k", pa.int64()), ("x", pa.int64())])
    left = rd.from_arrow(lschema.empty_table()).union(
        rd.from_arrow(
            pa.table({"k": pa.array([5, 100], pa.int64()),
                      "x": pa.array([1, 2], pa.int64())})
        ).repartition(6)
    )
    right = rd.from_arrow(
        pa.table({"doc_id": pa.array(list(range(50)), pa.int64()),
                  "text": pa.array(["a"] * 50)})
    )
    out = hash_join(
        left, right, on="k", right_on="doc_id", num_partitions=8
    ).to_pandas()
    assert len(out) == 1
    assert int(out["k"].iloc[0]) == 5


def test_chained_joins_one_dag(ray_session):
    """Two join operators alive in one streaming DAG — upstream
    default aggregator reservations (CPU/2 per join) deadlock a 4-CPU
    cluster; join_aggregator_args caps them."""
    import ray.data as rd

    from ocr_service_ray.ops.relational import hash_join

    a = rd.from_arrow(
        pa.table({"k": pa.array(list(range(100)), pa.int64()),
                  "va": pa.array(list(range(100)), pa.int64())})
    ).repartition(4)
    b = rd.from_arrow(
        pa.table({"k": pa.array(list(range(0, 100, 2)), pa.int64()),
                  "vb": pa.array(list(range(50)), pa.int64())})
    )
    c = rd.from_arrow(
        pa.table({"k": pa.array(list(range(0, 100, 4)), pa.int64()),
                  "vc": pa.array(list(range(25)), pa.int64())})
    )
    j = hash_join(hash_join(a, b, on="k", num_partitions=8), c,
                  on="k", num_partitions=8)
    out = j.to_pandas().sort_values("k").reset_index(drop=True)
    assert len(out) == 25
    assert (out["k"] % 4 == 0).all()


def test_join_aggregator_args_budget(ray_session):
    import ray

    from ocr_service_ray.ops.relational import join_aggregator_args

    args = join_aggregator_args(16)
    cpus = float(ray.cluster_resources().get("CPU", 8.0))
    # per-aggregator share is a fraction; total stays under ~an eighth
    # of the cluster plus the 0.05 floor allowance
    assert 0 < args["num_cpus"] <= 1.0
    assert args["num_cpus"] * 16 <= max(cpus / 8.0, 0.05 * 16) + 1e-9
