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


# ---- fused Pallas auction (interpret mode on CPU; see tools/tpu_smoke.py
# for the on-chip run) ----

from vitadapter.ops.auction_pallas import auction_assign_pallas
from vitadapter.ops.matching import hungarian_assign


def _scipy_batch(cost, n_valid):
    out = []
    for b in range(cost.shape[0]):
        n = int(n_valid[b])
        if n == 0:
            out.append(-np.inf)
            continue
        rows, cols = linear_sum_assignment(cost[b, :, :n])
        out.append(cost[b][rows, cols].sum())
    return out


def test_auction_pallas_optimal_vs_scipy():
    rng = np.random.RandomState(3)
    B, Q, G = 6, 20, 12
    cost = rng.randn(B, Q, G).astype(np.float32) * 3
    nv = np.asarray([12, 7, 1, 0, 12, 5], np.int32)
    a = np.asarray(auction_assign_pallas(
        jnp.asarray(cost), jnp.asarray(nv), interpret=True))
    opt = _scipy_batch(cost, nv)
    for b in range(B):
        n = int(nv[b])
        assigned = a[b][a[b] >= 0]
        assert len(assigned) == n
        assert len(np.unique(assigned)) == n
        if n:
            assert (assigned < n).all()
            assert total_cost(cost[b], a[b]) <= opt[b] + 1e-2 * max(
                1.0, abs(opt[b]))


def test_auction_pallas_matches_xla_auction():
    """Same algorithm/epsilon policy => identical assignment cost (the
    matchings themselves may permute between equal-cost optima)."""
    rng = np.random.RandomState(4)
    B, Q, G = 4, 16, 9
    cost = rng.rand(B, Q, G).astype(np.float32)
    nv = np.asarray([9, 9, 3, 9], np.int32)
    ap = np.asarray(auction_assign_pallas(
        jnp.asarray(cost), jnp.asarray(nv), interpret=True))
    ax = np.asarray(jax.vmap(auction_assign)(
        jnp.asarray(cost), jnp.asarray(nv)))
    for b in range(B):
        assert abs(total_cost(cost[b], ap[b])
                   - total_cost(cost[b], ax[b])) <= 1e-3


def test_auction_pallas_empty_gt_static_and_dynamic():
    # static G == 0: early return, no kernel launch
    a = np.asarray(auction_assign_pallas(
        jnp.zeros((2, 5, 0)), jnp.zeros((2,), jnp.int32), interpret=True))
    assert a.shape == (2, 5) and (a == -1).all()
    # dynamic n_valid == 0: cond is false on entry
    a = np.asarray(auction_assign_pallas(
        jnp.ones((1, 5, 3)), jnp.asarray([0], jnp.int32), interpret=True))
    assert (a == -1).all()


def test_hungarian_assign_pallas_impl_dispatch():
    rng = np.random.RandomState(5)
    cost = jnp.asarray(rng.rand(2, 8, 5), jnp.float32)
    nv = jnp.asarray([5, 2], jnp.int32)
    out = np.asarray(hungarian_assign(cost, nv, impl="auction_pallas"))
    ref = np.asarray(hungarian_assign(cost, nv, impl="callback"))
    for b in range(2):
        assert abs(total_cost(np.asarray(cost[b]), out[b])
                   - total_cost(np.asarray(cost[b]), ref[b])) <= 1e-3
