"""logistic_gd (ops/logistic.py): byte-exact vs a one-process numpy
reference implementing the identical micro-int arithmetic, and
layout-invariant (repartitioned input gives identical weights)."""

import numpy as np
import pyarrow as pa


def _data(seed=9, n=3000, dim=3):
    rng = np.random.default_rng(seed)
    X = np.concatenate(
        [np.ones((n, 1)), rng.random((n, dim - 1))], axis=1
    )
    true_w = np.array([-1.0, 2.0, -0.5])
    p = 1.0 / (1.0 + np.exp(-(X @ true_w)))
    y = (rng.random(n) < p).astype(np.int64)
    return X, y


def _reference(X, y, iters, lr):
    from ocr_service_ray.ops.logistic import sigmoid_fixed_dot

    w = np.zeros(X.shape[1], dtype=np.float64)
    n = len(X)
    for _ in range(iters):
        r = sigmoid_fixed_dot(X, w) - y.astype(np.float64)
        micro = np.floor((r[:, None] * X) * 1_000_000.0 + 0.5).astype(np.int64)
        grad = micro.sum(axis=0) / 1_000_000.0 / n
        w = w - lr * grad
    return w


def _ds(X, y, blocks=1):
    import ray.data as rd

    n = len(X)
    step = -(-n // blocks)
    tables = []
    for i in range(blocks):
        sl = slice(i * step, min(n, (i + 1) * step))
        if sl.start >= n:
            break
        tables.append(
            pa.table(
                {
                    "x": pa.array(list(X[sl]), pa.list_(pa.float64())),
                    "y": pa.array(y[sl]),
                }
            )
        )
    return rd.from_arrow(tables)


def test_logistic_gd_matches_numpy_reference_bytewise(ray_session):
    from ocr_service_ray.ops.logistic import logistic_gd

    X, y = _data()
    ref = _reference(X, y, iters=8, lr=1.0)
    w, n = logistic_gd(_ds(X, y, blocks=5).materialize(), iters=8, lr=1.0)
    assert n == len(X)
    assert w.tobytes() == ref.tobytes()  # byte-exact, not approx
    # sanity: the fit actually moved toward the generating signs
    assert w[1] > 0 and w[2] < 0 and w[0] < 0


def test_logistic_gd_layout_invariant(ray_session):
    from ocr_service_ray.ops.logistic import logistic_gd

    X, y = _data(seed=10)
    w1, _ = logistic_gd(_ds(X, y, blocks=1).materialize(), iters=5)
    w7, _ = logistic_gd(
        _ds(X, y, blocks=7).materialize().repartition(3), iters=5
    )
    assert w1.tobytes() == w7.tobytes()
