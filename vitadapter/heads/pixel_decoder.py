"""Pixel decoders for MaskFormer/Mask2Former.

Parity targets:
  * `MSDeformAttnPixelDecoder` (reference
    `segmentation/mmseg_custom/models/plugins/msdeformattn_pixel_decoder.py:16-267`):
    1x1+GN input projections on the 3 coarsest scales, a 6-layer deformable
    self-attention encoder over their concatenated tokens (post-norm,
    self_attn -> LN -> FFN -> LN), FPN fusion down to the stride-4
    `mask_feature`.
  * `PixelDecoder` (plain FPN variant, reference `plugins/pixel_decoder.py:10`).

NHWC; spatial shapes static; deformable attention reuses `vitadapter.ops.msda`.
"""

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vitadapter.layers.positional import sine_positional_encoding
from vitadapter.ops.msda import MSDeformAttn
from vitadapter.utils.resize import resize_2d


class DeformableEncoderLayer(nn.Module):
    """Post-norm deformable self-attention layer:
    x = LN(x + MSDA(x+pos)); x = LN(x + FFN(x))."""

    num_heads: int = 8
    n_levels: int = 3
    n_points: int = 4
    ffn_dim: int = 1024
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, pos: jax.Array, ref_points: jax.Array,
                 spatial_shapes) -> jax.Array:
        d = x.shape[-1]
        # mmcv MultiScaleDeformableAttention adds query_pos to the query used
        # for offsets/weights; the value path sees x without pos.
        # the encoder queries ARE the concatenated raster grids of the
        # pyramid levels — declare that so the Pallas kernel's row-band
        # skipping sees level-pure query tiles
        segs = tuple(h * w for h, w in spatial_shapes)
        attn = MSDeformAttn(d_model=d, n_levels=self.n_levels,
                            n_heads=self.num_heads, n_points=self.n_points,
                            dtype=self.dtype, name="attn")(
                                x + pos, ref_points, x, spatial_shapes,
                                query_segments=segs)
        # dtype= keeps the post-norm stream (the scan carry, (B, sumHW, C))
        # in bf16 under mixed precision: without it the LN output — and with
        # it the carried stream — is promoted to fp32, doubling the HBM
        # traffic of every layer. Stats are still computed in fp32 inside
        # flax regardless of dtype.
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(
            x + attn)
        y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="ffn_fc1")(x)
        y = nn.relu(y)
        y = nn.Dense(d, dtype=self.dtype, name="ffn_fc2")(y)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x + y)
        return x


class _ScanEncoderLayer(nn.Module):
    """nn.scan body wrapping DeformableEncoderLayer: the 6 encoder layers are
    identical programs, so they run as ONE traced layer with stacked (L, ...)
    params — 6x smaller jit module (each unrolled layer would embed its own
    serialized Pallas MSDA kernels) and 6x faster compiles."""

    num_heads: int
    n_levels: int
    n_points: int
    ffn_dim: int
    spatial_shapes: Tuple[Tuple[int, int], ...]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, pos, ref):
        x = DeformableEncoderLayer(
            num_heads=self.num_heads, n_levels=self.n_levels,
            n_points=self.n_points, ffn_dim=self.ffn_dim, dtype=self.dtype,
            name="layer")(x, pos, ref, self.spatial_shapes)
        return x, None


class ConvGN(nn.Module):
    """Conv + GroupNorm(32) (mmcv ConvModule with GN, act optional)."""

    features: int
    kernel: int = 1
    groups: int = 32
    act: bool = False
    use_bias: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        pad = self.kernel // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel), padding=pad,
                    use_bias=self.use_bias, dtype=self.dtype, name="conv")(x)
        x = nn.GroupNorm(num_groups=self.groups, epsilon=1e-5,
                         dtype=self.dtype, name="gn")(x)
        return nn.relu(x) if self.act else x


class MSDeformAttnPixelDecoder(nn.Module):
    """feats (strides 4/8/16/32, NHWC) -> (mask_feature stride4,
    [multi_scale_memorys] coarse->fine strides 32/16/8)."""

    feat_channels: int = 256
    out_channels: int = 256
    num_encoder_levels: int = 3
    num_layers: int = 6
    num_heads: int = 8
    n_points: int = 4
    ffn_dim: int = 1024
    num_feats: int = 128  # sine positional encoding half-dim
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]):
        L = self.num_encoder_levels
        n_in = len(feats)
        B = feats[0].shape[0]
        C = self.feat_channels

        level_encoding = self.param("level_encoding",
                                    nn.initializers.normal(1.0), (L, C),
                                    jnp.float32)

        # coarsest-first (stride 32, 16, 8)
        enc_feats = []
        enc_pos = []
        shapes: List[Tuple[int, int]] = []
        ref_pts = []
        for i in range(L):
            level_idx = n_in - i - 1
            f = feats[level_idx]
            H, W = f.shape[1], f.shape[2]
            f = ConvGN(C, kernel=1, use_bias=True, dtype=self.dtype,
                       name=f"input_conv_{i}")(f)
            pos = sine_positional_encoding((H, W), self.num_feats)
            pos = (pos + level_encoding[i]).astype(f.dtype)
            enc_feats.append(f.reshape(B, H * W, C))
            enc_pos.append(pos.reshape(1, H * W, C) * jnp.ones((B, 1, 1), f.dtype))
            shapes.append((H, W))
            ys = (jnp.arange(H, dtype=jnp.float32) + 0.5) / H
            xs = (jnp.arange(W, dtype=jnp.float32) + 0.5) / W
            yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
            ref_pts.append(jnp.stack([xx.reshape(-1), yy.reshape(-1)], -1))

        x = jnp.concatenate(enc_feats, axis=1)
        pos = jnp.concatenate(enc_pos, axis=1)
        # each token references its own normalized location at every level
        ref = jnp.concatenate(ref_pts, axis=0)[None, :, None, :]
        ref = jnp.broadcast_to(ref, (B, ref.shape[1], L, 2))
        spatial_shapes = tuple(shapes)

        scan = nn.scan(
            _ScanEncoderLayer,
            variable_axes={"params": 0},
            split_rngs={"params": True},
            length=self.num_layers,
            in_axes=(nn.broadcast, nn.broadcast))
        x, _ = scan(num_heads=self.num_heads, n_levels=L,
                    n_points=self.n_points, ffn_dim=self.ffn_dim,
                    spatial_shapes=spatial_shapes, dtype=self.dtype,
                    name="encoder_layers")(x, pos, ref)

        # split back to maps, coarse -> fine
        outs = []
        start = 0
        for (H, W) in shapes:
            outs.append(x[:, start:start + H * W].reshape(B, H, W, C))
            start += H * W

        # FPN over the remaining fine levels (stride 4)
        for i in range(n_in - L - 1, -1, -1):
            lateral = ConvGN(C, kernel=1, dtype=self.dtype,
                             name=f"lateral_conv_{i}")(feats[i])
            y = lateral + resize_2d(outs[-1], lateral.shape[1:3], "bilinear")
            y = ConvGN(C, kernel=3, act=True, dtype=self.dtype,
                       name=f"output_conv_{i}")(y)
            outs.append(y)

        mask_feature = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                               name="mask_feature")(outs[-1])
        return mask_feature, outs[:L]
