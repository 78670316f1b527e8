"""Windowed BEiT (det variant) + torch .pth checkpoint loading e2e."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from vitadapter.models.beit import BEiT


def test_beit_windowed_blocks():
    """Det-variant BEiT: windowed blocks, no cls token."""
    model = BEiT(img_size=64, patch_size=16, embed_dim=48, depth=3,
                 num_heads=4, init_values=1e-6, use_cls_token=False,
                 window_attn=[True, True, False],
                 window_size=[2, 2, 14])
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    vars_ = jax.jit(model.init)(jax.random.PRNGKey(1), x)
    out = jax.jit(model.apply)(vars_, x)
    assert out.shape == (1, 16, 48)  # patches only
    # windowed blocks carry per-window rel-pos tables (no cls buckets)
    t0 = vars_["params"]["blocks_0"]["attn"]["relative_position_bias_table"]
    assert t0.shape == (3 * 3, 4)
    # global block table spans the full grid, no cls buckets either
    t2 = vars_["params"]["blocks_2"]["attn"]["relative_position_bias_table"]
    assert t2.shape == (7 * 7, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_beit_adapter_windowed_det_variant():
    from vitadapter.models.beit_adapter import BEiTAdapter

    model = BEiTAdapter(img_size=64, patch_size=16, embed_dim=48, depth=2,
                        num_heads=4, deform_num_heads=4, conv_inplane=16,
                        deform_ratio=0.5, use_cls_token=False,
                        window_attn=[True, True], window_size=[2, 2],
                        interaction_indexes=((0, 0), (1, 1)))
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 64, 64, 3))
    vars_ = jax.jit(model.init)(jax.random.PRNGKey(1), x)
    feats = jax.jit(model.apply)(vars_, x)
    assert [f.shape for f in feats] == [
        (1, 16, 16, 48), (1, 8, 8, 48), (1, 4, 4, 48), (1, 2, 2, 48)]
    assert all(np.isfinite(np.asarray(f)).all() for f in feats)


def test_torch_pth_checkpoint_roundtrip(tmp_path):
    """Save a reference-named torch checkpoint, load through the converter."""
    from tests.test_checkpoint import _inverse_backbone
    from vitadapter.models.vit_adapter import ViTAdapter
    from vitadapter.utils.checkpoint import convert_vit_adapter_backbone

    model = ViTAdapter(patch_size=16, embed_dim=48, depth=2, num_heads=4,
                       deform_num_heads=4, conv_inplane=16,
                       interaction_indexes=((0, 0), (1, 1)))
    x = jnp.zeros((1, 32, 32, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    sd = {f"backbone.{k[len('backbone.'):]}": torch.from_numpy(np.asarray(v))
          for k, v in _inverse_backbone(variables).items()}
    path = tmp_path / "ckpt.pth"
    torch.save({"state_dict": sd, "meta": {"note": "synthetic"}}, path)

    loaded = torch.load(path, map_location="cpu", weights_only=False)
    from vitadapter.utils.checkpoint import unwrap_state_dict
    params, stats = convert_vit_adapter_backbone(
        unwrap_state_dict(loaded), prefix="backbone.")
    out = model.apply({"params": params, "batch_stats": stats}, x)
    ref = model.apply(variables, x)
    for a, b in zip(out, ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
