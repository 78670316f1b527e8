"""BEiT trunk + BEiTAdapter tests."""

import jax
import jax.numpy as jnp
import numpy as np

from vitadapter.models.beit import BEiT, relative_position_index
from vitadapter.models.beit_adapter import BEiTAdapter
from vitadapter.utils.checkpoint import resample_rel_pos_table


def test_relative_position_index_no_cls():
    idx = relative_position_index(3, 3, with_cls=False)
    assert idx.shape == (9, 9)
    assert idx.max() == 24 and idx.min() == 0       # (2*3-1)^2 buckets
    assert (np.diag(idx) == idx[0, 0]).all()        # zero offset bucket
    # symmetry: idx[i,j] and idx[j,i] mirror around the center bucket
    center = idx[0, 0]
    assert idx[0, 1] + idx[1, 0] == 2 * center


def test_relative_position_index_with_cls():
    idx = relative_position_index(3, 3, with_cls=True)
    nrd = 25 + 3
    assert idx.shape == (10, 10)
    assert (idx[0, 1:] == nrd - 3).all()
    assert (idx[1:, 0] == nrd - 2).all()
    assert idx[0, 0] == nrd - 1


def test_beit_trunk_forward():
    model = BEiT(img_size=32, patch_size=16, embed_dim=48, depth=2,
                 num_heads=4, init_values=1e-6)
    x = jnp.zeros((1, 32, 32, 3))
    vars_ = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(model.apply)(vars_, x)
    assert out.shape == (1, 5, 48)  # 4 patches + cls
    # rel-pos table spans the 2x2 grid with 3 cls buckets
    t = vars_["params"]["blocks_0"]["attn"]["relative_position_bias_table"]
    assert t.shape == (3 * 3 + 3, 4)


def test_beit_adapter_forward_shapes():
    model = BEiTAdapter(img_size=64, patch_size=16, embed_dim=48, depth=4,
                        num_heads=4, deform_num_heads=4, conv_inplane=16,
                        deform_ratio=0.5,
                        interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3)))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    vars_ = jax.jit(model.init)(jax.random.PRNGKey(1), x)
    feats = jax.jit(model.apply)(vars_, x)
    assert [f.shape for f in feats] == [
        (1, 16, 16, 48), (1, 8, 8, 48), (1, 4, 4, 48), (1, 2, 2, 48)]
    assert all(np.isfinite(np.asarray(f)).all() for f in feats)


def test_resample_rel_pos_table_identity_and_shape():
    rng = np.random.RandomState(0)
    t = rng.randn(13 * 13 + 3, 4).astype(np.float32)  # grid 7
    same = resample_rel_pos_table(t, 7, 7)
    np.testing.assert_array_equal(same, t)
    up = resample_rel_pos_table(t, 7, 14)
    assert up.shape == (27 * 27 + 3, 4)
    np.testing.assert_array_equal(up[-3:], t[-3:])  # cls buckets carried over
    # center value is preserved (interpolation through the original point)
    src_c = t[:169].reshape(13, 13, 4)[6, 6]
    dst_c = up[:729].reshape(27, 27, 4)[13, 13]
    np.testing.assert_allclose(dst_c, src_c, atol=1e-4)
