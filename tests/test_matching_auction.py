"""Device auction LAP vs scipy: assignment cost must agree (near-)exactly."""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment

from vitadapter.ops.matching import auction_assign


def total_cost(cost, assign):
    t = 0.0
    for q, g in enumerate(assign):
        if g >= 0:
            t += cost[q, g]
    return t


def test_auction_square_matches_scipy_cost():
    rng = np.random.RandomState(0)
    for trial in range(5):
        Q = G = 8
        cost = rng.randn(Q, G).astype(np.float32) * 3
        a = np.asarray(auction_assign(jnp.asarray(cost), jnp.asarray(G)))
        rows, cols = linear_sum_assignment(cost)
        opt = cost[rows, cols].sum()
        got = total_cost(cost, a)
        # each row assigned exactly once to distinct columns
        assigned = a[a >= 0]
        assert len(np.unique(assigned)) == len(assigned) == G
        assert got <= opt + 1e-2 * max(1.0, abs(opt))


def test_auction_rectangular_more_queries():
    rng = np.random.RandomState(1)
    Q, G, n_valid = 10, 6, 4
    cost = rng.rand(Q, G).astype(np.float32)
    a = np.asarray(auction_assign(jnp.asarray(cost), jnp.asarray(n_valid)))
    assigned = a[a >= 0]
    assert len(assigned) == n_valid          # every valid gt matched
    assert (assigned < n_valid).all()        # never assigns invalid columns
    assert len(np.unique(assigned)) == n_valid
    rows, cols = linear_sum_assignment(cost[:, :n_valid])
    opt = cost[rows, cols].sum()
    assert total_cost(cost, a) <= opt + 1e-2


def test_auction_no_valid_gts():
    cost = jnp.ones((5, 3))
    a = np.asarray(auction_assign(cost, jnp.asarray(0)))
    assert (a == -1).all()


def test_auction_under_jit_and_vmap():
    rng = np.random.RandomState(2)
    cost = jnp.asarray(rng.rand(3, 6, 4), jnp.float32)
    nv = jnp.asarray([4, 2, 0], jnp.int32)
    out = jax.jit(jax.vmap(auction_assign))(cost, nv)
    out = np.asarray(out)
    assert (out[2] == -1).all()
    assert (out[1] < 2).all()
