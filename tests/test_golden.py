"""Golden regression tests: fixed seeds -> pinned statistics.

Guards numerical drift across refactors/rounds (CPU, fp32, highest matmul
precision — set by conftest). Values recorded 2026-08-16 (round 1).
"""

import jax
import jax.numpy as jnp
import numpy as np

from vitadapter.models.vit_adapter import ViTAdapter
from vitadapter.ops.msda import MSDeformAttn


def test_vit_adapter_golden():
    model = ViTAdapter(patch_size=16, embed_dim=48, depth=4, num_heads=4,
                       deform_num_heads=4, conv_inplane=16,
                       interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3)))
    x = jnp.asarray(np.random.RandomState(42).randn(1, 64, 64, 3), jnp.float32)
    v = jax.jit(model.init)(jax.random.PRNGKey(7), x)
    feats = jax.jit(model.apply)(v, x)
    expect = [(0.06101586, 1.97661245), (0.39833173, 2.45364308),
              (-0.00182367, 2.48353004), (-0.29320204, 2.28111982)]
    for f, (m, s) in zip(feats, expect):
        np.testing.assert_allclose(float(f.mean()), m, rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(float(f.std()), s, rtol=2e-4)


def test_msda_module_golden():
    shapes = ((8, 8), (4, 4), (2, 2))
    S = sum(h * w for h, w in shapes)
    mod = MSDeformAttn(d_model=48, n_levels=3, n_heads=4, n_points=4)
    q = jnp.asarray(np.random.RandomState(1).randn(2, 10, 48), jnp.float32)
    feat = jnp.asarray(np.random.RandomState(2).randn(2, S, 48), jnp.float32)
    ref = jnp.asarray(np.random.RandomState(3).rand(2, 10, 3, 2), jnp.float32)
    p = mod.init(jax.random.PRNGKey(5), q, ref, feat, shapes)
    out = mod.apply(p, q, ref, feat, shapes)
    np.testing.assert_allclose(float(out.mean()), 0.01098537, rtol=1e-3,
                               atol=1e-6)
    np.testing.assert_allclose(float(out.std()), 0.13927342, rtol=1e-3)
