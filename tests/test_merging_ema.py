"""PatchMerging / AdaptivePadding / EMA tracking."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from vitadapter.layers.merging import PatchMerging, adaptive_padding
from vitadapter.train.trainer import TrainState


def test_adaptive_padding():
    x = jnp.zeros((1, 7, 9, 3))
    y = adaptive_padding(x, kernel=2, stride=2)
    assert y.shape == (1, 8, 10, 3)
    y2 = adaptive_padding(jnp.zeros((1, 8, 8, 3)), 2, 2)
    assert y2.shape == (1, 8, 8, 3)


def test_patch_merging():
    pm = PatchMerging(out_channels=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 9, 8))
    vars_ = pm.init(jax.random.PRNGKey(1), x)
    y = pm.apply(vars_, x)
    assert y.shape == (2, 4, 5, 16)
    # each output cell depends only on its 2x2 input neighborhood
    x2 = x.at[:, 6, 8].add(100.0)
    y2 = pm.apply(vars_, x2)
    diff = np.abs(np.asarray(y - y2)).sum(axis=-1)
    assert diff[0, 3, 4] > 0
    assert diff[0, :3, :4].max() < 1e-5


def test_ema_tracking():
    params = {"w": jnp.ones(3)}
    tx = optax.sgd(0.1)
    state = TrainState.create(params, {}, tx, ema_decay=0.9)
    grads = {"w": jnp.ones(3)}
    updates, opt_state = tx.update(grads, state.opt_state, state.params)
    state = state.replace(params=optax.apply_updates(state.params, updates),
                          opt_state=opt_state).update_ema()
    np.testing.assert_allclose(np.asarray(state.params["w"]), 0.9, atol=1e-6)
    np.testing.assert_allclose(np.asarray(state.ema_params["w"]), 0.99,
                               atol=1e-6)
    # ema disabled -> stays None
    s2 = TrainState.create(params, {}, tx).update_ema()
    assert s2.ema_params is None
