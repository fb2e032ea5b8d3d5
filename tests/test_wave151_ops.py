"""Wave-151 ops: Hilbert curve — bijection, THE adjacency property
(consecutive indices are grid neighbours — Morton fails this),
scalar-reference parity, locality advantage."""

import numpy as np


def _xy2d_scalar(n, x, y):
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_matches_scalar_reference():
    from ocr_service_ray.ops.hilbert import hilbert_index

    for bits in (1, 2, 3, 5):
        n = 1 << bits
        xs, ys = np.meshgrid(np.arange(n), np.arange(n))
        xs, ys = xs.ravel(), ys.ravel()
        got = hilbert_index(xs, ys, bits)
        ref = np.array([_xy2d_scalar(n, int(a), int(b)) for a, b in zip(xs, ys)])
        assert (got == ref).all()


def test_bijection_and_adjacency():
    from ocr_service_ray.ops.hilbert import hilbert_index

    bits = 5
    n = 1 << bits
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    xs, ys = xs.ravel(), ys.ravel()
    d = hilbert_index(xs, ys, bits)
    assert sorted(d) == list(range(n * n))  # bijection
    # invert and check every consecutive pair is a grid neighbour
    pos = np.empty((n * n, 2), np.int64)
    pos[d] = np.stack([xs, ys], axis=1)
    diff = np.abs(np.diff(pos, axis=0)).sum(axis=1)
    assert (diff == 1).all()  # the Hilbert property


def test_hilbert_beats_morton_locality():
    from ocr_service_ray.ops.hilbert import hilbert_index
    from ocr_service_ray.ops.zorder import morton_interleave

    bits = 5
    n = 1 << bits
    xs, ys = np.meshgrid(np.arange(n), np.arange(n))
    xs, ys = xs.ravel().astype(np.int64), ys.ravel().astype(np.int64)
    h = hilbert_index(xs, ys, bits)
    z = morton_interleave(xs, ys, bits)

    # on the full uniform grid both are perfect; compare on a
    # diagonal stripe subset where Morton's quadrant jumps hurt
    stripe = (xs + ys) % 3 == 0
    xs_s, ys_s = xs[stripe], ys[stripe]

    def total_bbox_subset(codes):
        area = 0
        for f in range(16):
            m = (codes >> 6) == f
            if m.any():
                area += (xs_s[m].ptp() + 1) * (ys_s[m].ptp() + 1)
        return area

    assert total_bbox_subset(h[stripe]) <= total_bbox_subset(z[stripe])
