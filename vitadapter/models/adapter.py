"""ViT-Adapter core modules (the paper's contribution).

Parity targets (reference `detection/mmdet_custom/models/backbones/adapter_modules.py`):
  * `deform_inputs`        — :28-47 (two (reference_points, spatial_shapes) pairs)
  * `ConvFFN` / `DWConv`   — :50-87 (shared depthwise conv over the 3-scale seq)
  * `Extractor`            — :90-124
  * `Injector`             — :127-152 (zero-init gamma residual scale)
  * `InteractionBlock`     — :155-191
  * `SpatialPriorModule`   — :194-246 (conv stem to strides 4/8/16/32)

TPU-first notes: image H, W are static at trace time, so reference points and
spatial shapes are computed host-side with numpy and baked into the compiled
program as constants; all convs run NHWC.
"""

from functools import partial
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vitadapter.layers.drop import DropPath
from vitadapter.layers.mlp import gelu
from vitadapter.layers.norm import BatchNorm
from vitadapter.ops.msda import MSDeformAttn, SpatialShapes


def get_reference_points(spatial_shapes: SpatialShapes) -> np.ndarray:
    """Normalized cell-center grid over the given levels: (1, sum HW, 1, 2) xy."""
    pts = []
    for H, W in spatial_shapes:
        ys = (np.arange(H, dtype=np.float32) + 0.5) / H
        xs = (np.arange(W, dtype=np.float32) + 0.5) / W
        yy, xx = np.meshgrid(ys, xs, indexing="ij")
        pts.append(np.stack([xx.reshape(-1), yy.reshape(-1)], axis=-1))
    ref = np.concatenate(pts, axis=0)[None, :, None, :]
    return ref


def deform_inputs(h: int, w: int):
    """Static deformable-attention geometry for an h x w input image.

    Returns (injector_inputs, extractor_inputs), each a
    (reference_points, spatial_shapes) pair. The injector queries the 16-stride
    token grid against the 3-level [8s, 16s, 32s] prior; the extractor queries
    the 3-level prior against the 16-stride ViT map.
    """
    shapes3 = ((h // 8, w // 8), (h // 16, w // 16), (h // 32, w // 32))
    shapes1 = ((h // 16, w // 16),)
    injector = (jnp.asarray(get_reference_points(shapes1)), shapes3)
    extractor = (jnp.asarray(get_reference_points(shapes3)), shapes1)
    return injector, extractor


class DWConv(nn.Module):
    """Shared 3x3 depthwise conv applied per scale of the 21n-token pyramid seq.

    Token layout (reference `adapter_modules.py:77-87`): the first 16n tokens
    are the (2H, 2W) map, next 4n the (H, W) map, last n the (H/2, W/2) map.
    """

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, H: int, W: int) -> jax.Array:
        B, N, C = x.shape
        n = N // 21
        conv = nn.Conv(C, (3, 3), padding=1, feature_group_count=C,
                       dtype=self.dtype, name="dwconv")
        splits = [
            (x[:, : 16 * n], 2 * H, 2 * W),
            (x[:, 16 * n : 20 * n], H, W),
            (x[:, 20 * n :], H // 2, W // 2),
        ]
        outs = []
        for t, h_, w_ in splits:
            m = conv(t.reshape(B, h_, w_, C))
            outs.append(m.reshape(B, h_ * w_, C))
        return jnp.concatenate(outs, axis=1)


class ConvFFN(nn.Module):
    """FFN with a depthwise conv between fc1 and activation
    (reference `adapter_modules.py:50-69`)."""

    hidden_features: Optional[int] = None
    out_features: Optional[int] = None
    drop: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, H: int, W: int,
                 deterministic: bool = True) -> jax.Array:
        C = x.shape[-1]
        hidden = self.hidden_features or C
        out = self.out_features or C
        x = nn.Dense(hidden, dtype=self.dtype, name="fc1")(x)
        x = DWConv(dtype=self.dtype, name="dwconv")(x, H, W)
        x = gelu(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        x = nn.Dense(out, dtype=self.dtype, name="fc2")(x)
        x = nn.Dropout(self.drop)(x, deterministic=deterministic)
        return x


class Injector(nn.Module):
    """Inject spatial-prior features into ViT tokens via MSDA, gated by a
    zero-init per-channel gamma (reference `adapter_modules.py:127-152`)."""

    num_heads: int = 6
    n_points: int = 4
    n_levels: int = 3
    deform_ratio: float = 1.0
    init_values: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query: jax.Array, reference_points: jax.Array,
                 feat: jax.Array, spatial_shapes: SpatialShapes,
                 query_segments=None) -> jax.Array:
        dim = query.shape[-1]
        q = nn.LayerNorm(epsilon=1e-6, name="query_norm")(query)
        f = nn.LayerNorm(epsilon=1e-6, name="feat_norm")(feat)
        attn = MSDeformAttn(d_model=dim, n_levels=self.n_levels,
                            n_heads=self.num_heads, n_points=self.n_points,
                            ratio=self.deform_ratio, dtype=self.dtype,
                            name="attn")(q, reference_points, f, spatial_shapes,
                                         query_segments=query_segments)
        gamma = self.param(
            "gamma",
            lambda key, shape: jnp.full(shape, self.init_values, jnp.float32),
            (dim,))
        return query + gamma * attn


class Extractor(nn.Module):
    """Extract ViT-token content back into the spatial prior via MSDA +
    optional ConvFFN (reference `adapter_modules.py:90-124`)."""

    num_heads: int = 6
    n_points: int = 4
    n_levels: int = 1
    deform_ratio: float = 1.0
    with_cffn: bool = True
    cffn_ratio: float = 0.25
    drop: float = 0.0
    drop_path: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query: jax.Array, reference_points: jax.Array,
                 feat: jax.Array, spatial_shapes: SpatialShapes,
                 H: int, W: int, deterministic: bool = True,
                 query_segments=None) -> jax.Array:
        dim = query.shape[-1]
        q = nn.LayerNorm(epsilon=1e-6, name="query_norm")(query)
        f = nn.LayerNorm(epsilon=1e-6, name="feat_norm")(feat)
        attn = MSDeformAttn(d_model=dim, n_levels=self.n_levels,
                            n_heads=self.num_heads, n_points=self.n_points,
                            ratio=self.deform_ratio, dtype=self.dtype,
                            name="attn")(q, reference_points, f, spatial_shapes,
                                         query_segments=query_segments)
        query = query + attn
        if self.with_cffn:
            ffn = ConvFFN(hidden_features=int(dim * self.cffn_ratio),
                          drop=self.drop, dtype=self.dtype, name="ffn")
            y = ffn(nn.LayerNorm(epsilon=1e-6, name="ffn_norm")(query), H, W,
                    deterministic=deterministic)
            query = query + DropPath(self.drop_path)(y, deterministic=deterministic)
        return query


class InteractionBlock(nn.Module):
    """Injector -> span of ViT blocks -> Extractor (+2 extra extractors in the
    final block) — reference `adapter_modules.py:155-191`."""

    num_heads: int = 6
    n_points: int = 4
    init_values: float = 0.0
    deform_ratio: float = 1.0
    with_cffn: bool = True
    cffn_ratio: float = 0.25
    drop: float = 0.0
    drop_path: float = 0.0
    extra_extractor: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.injector = Injector(num_heads=self.num_heads, n_points=self.n_points,
                                 n_levels=3, deform_ratio=self.deform_ratio,
                                 init_values=self.init_values, dtype=self.dtype)
        self.extractor = Extractor(num_heads=self.num_heads, n_points=self.n_points,
                                   n_levels=1, deform_ratio=self.deform_ratio,
                                   with_cffn=self.with_cffn,
                                   cffn_ratio=self.cffn_ratio, drop=self.drop,
                                   drop_path=self.drop_path, dtype=self.dtype)
        if self.extra_extractor:
            self.extra_extractors = [
                Extractor(num_heads=self.num_heads, n_points=self.n_points,
                          n_levels=1, deform_ratio=self.deform_ratio,
                          with_cffn=self.with_cffn, cffn_ratio=self.cffn_ratio,
                          drop=self.drop, drop_path=self.drop_path,
                          dtype=self.dtype, name=f"extra_extractors_{i}")
                for i in range(2)
            ]
        else:
            self.extra_extractors = None

    def __call__(self, x: jax.Array, c: jax.Array, blocks_fn: Callable,
                 injector_inputs, extractor_inputs, H: int, W: int,
                 deterministic: bool = True):
        ref1, shapes1 = injector_inputs
        ref2, shapes2 = extractor_inputs
        # both query sets are raster-grid concats: ViT tokens (the extractor
        # VALUE grid, shapes2) and the SPM pyramid (the injector VALUE
        # pyramid, shapes1) — declare them for kernel row-band skipping
        inj_segs = tuple(h * w for h, w in shapes2)
        ext_segs = tuple(h * w for h, w in shapes1)
        x = self.injector(x, ref1, c, shapes1, query_segments=inj_segs)
        x = blocks_fn(x)
        c = self.extractor(c, ref2, x, shapes2, H, W,
                           deterministic=deterministic,
                           query_segments=ext_segs)
        if self.extra_extractors is not None:
            for ex in self.extra_extractors:
                c = ex(c, ref2, x, shapes2, H, W,
                       deterministic=deterministic, query_segments=ext_segs)
        return x, c


class SpatialPriorModule(nn.Module):
    """Conv stem emitting a 4-scale prior: c1 map (stride 4, NHWC) and c2..c4
    token sequences at strides 8/16/32 (reference `adapter_modules.py:194-246`)."""

    inplanes: int = 64
    embed_dim: int = 384
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        use_ra = not train
        conv = partial(nn.Conv, use_bias=False, dtype=self.dtype)

        def cbr(y, ch, stride, name):
            y = conv(ch, (3, 3), strides=(stride, stride), padding=1,
                     name=f"{name}_conv")(y)
            y = BatchNorm(name=f"{name}_bn")(y, use_running_average=use_ra)
            return nn.relu(y)

        y = cbr(x, self.inplanes, 2, "stem1")
        y = cbr(y, self.inplanes, 1, "stem2")
        y = cbr(y, self.inplanes, 1, "stem3")
        c1 = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        c2 = cbr(c1, 2 * self.inplanes, 2, "conv2")
        c3 = cbr(c2, 4 * self.inplanes, 2, "conv3")
        c4 = cbr(c3, 4 * self.inplanes, 2, "conv4")

        fc = partial(nn.Conv, self.embed_dim, (1, 1), use_bias=True,
                     dtype=self.dtype)
        c1 = fc(name="fc1")(c1)
        c2 = fc(name="fc2")(c2)
        c3 = fc(name="fc3")(c3)
        c4 = fc(name="fc4")(c4)

        B = x.shape[0]
        D = self.embed_dim
        c2 = c2.reshape(B, -1, D)
        c3 = c3.reshape(B, -1, D)
        c4 = c4.reshape(B, -1, D)
        return c1, c2, c3, c4
