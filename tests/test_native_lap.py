"""Native C++ LAP vs scipy: exact agreement on assignment cost."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from vitadapter.ops.native import lap_solve_batch, native_available


@pytest.mark.skipif(not native_available(), reason="g++ unavailable")
def test_native_lap_matches_scipy():
    rng = np.random.RandomState(0)
    for trial in range(10):
        B, Q, G = 3, 12, rng.randint(1, 12)
        cost = rng.randn(B, Q, G) * 5
        nv = rng.randint(0, G + 1, B)
        out = lap_solve_batch(cost, nv)
        for b in range(B):
            n = nv[b]
            if n == 0:
                assert (out[b] == -1).all()
                continue
            rows, cols = linear_sum_assignment(cost[b, :, :n])
            opt = cost[b][rows, cols].sum()
            got_pairs = [(q, g) for q, g in enumerate(out[b]) if g >= 0]
            assert len(got_pairs) == n
            got = sum(cost[b][q, g] for q, g in got_pairs)
            assert (np.asarray([g for _, g in got_pairs]) < n).all()
            np.testing.assert_allclose(got, opt, rtol=1e-9, atol=1e-9)


@pytest.mark.skipif(not native_available(), reason="g++ unavailable")
def test_native_lap_rectangular_wide():
    rng = np.random.RandomState(1)
    cost = rng.rand(1, 3, 7)  # fewer rows than valid cols
    out = lap_solve_batch(cost, np.asarray([7]))
    rows, cols = linear_sum_assignment(cost[0])
    np.testing.assert_allclose(
        sum(cost[0][q, g] for q, g in enumerate(out[0]) if g >= 0),
        cost[0][rows, cols].sum(), rtol=1e-9)
