"""MaskFormer head + plain pixel decoders (the Mask2Former predecessors).

Parity targets:
  * `MaskFormerHead` (reference
    `segmentation/mmseg_custom/models/decode_heads/maskformer_head.py`, 519
    LoC): plain FPN (or DETR-encoder) pixel decoder, 6-layer DETR decoder
    WITHOUT masked attention, cls + 3-layer mask MLP, einsum mask logits.
  * `PixelDecoder` / `TransformerEncoderPixelDecoder` (reference
    `segmentation/mmseg_custom/models/plugins/pixel_decoder.py:10,114`).
"""

from typing import List, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from vitadapter.heads.mask2former import MultiheadAttention
from vitadapter.heads.pixel_decoder import ConvGN
from vitadapter.layers.positional import sine_positional_encoding
from vitadapter.utils.resize import resize_2d


class PixelDecoder(nn.Module):
    """Plain FPN pixel decoder: top-down 1x1(+GN) laterals + 3x3 outputs,
    final 3x3 mask_feature conv (reference `pixel_decoder.py:10`)."""

    feat_channels: int = 256
    out_channels: int = 256
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]):
        L = len(feats)
        y = ConvGN(self.feat_channels, kernel=3, act=True, dtype=self.dtype,
                   name=f"last_conv")(feats[-1])
        memory = feats[-1]
        for i in range(L - 2, -1, -1):
            lat = ConvGN(self.feat_channels, kernel=1, dtype=self.dtype,
                         name=f"lateral_{i}")(feats[i])
            y = lat + resize_2d(y, lat.shape[1:3], "nearest")
            y = ConvGN(self.feat_channels, kernel=3, act=True,
                       dtype=self.dtype, name=f"output_{i}")(y)
        mask_feature = nn.Conv(self.out_channels, (3, 3), padding=1,
                               dtype=self.dtype, name="mask_feature")(y)
        return mask_feature, memory


class TransformerEncoderPixelDecoder(nn.Module):
    """PixelDecoder with a global self-attention encoder on the coarsest
    level (reference `pixel_decoder.py:114`)."""

    feat_channels: int = 256
    out_channels: int = 256
    num_layers: int = 6
    num_heads: int = 8
    ffn_dim: int = 2048
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feats: Sequence[jax.Array]):
        f = feats[-1]
        B, H, W, C = f.shape
        x = nn.Conv(self.feat_channels, (1, 1), dtype=self.dtype,
                    name="encoder_in_proj")(f).reshape(B, H * W, -1)
        pos = sine_positional_encoding((H, W), self.feat_channels // 2)
        pos = jnp.broadcast_to(pos.reshape(1, H * W, -1), x.shape).astype(x.dtype)
        for i in range(self.num_layers):
            # q/k carry the positional encoding, v does NOT (mmcv
            # MultiheadAttention: value = query without query_pos)
            a = MultiheadAttention(num_heads=self.num_heads,
                                   dtype=self.dtype,
                                   name=f"enc_attn_{i}")(x + pos, x + pos, x)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name=f"enc_norm1_{i}")(x + a)
            y = nn.Dense(self.ffn_dim, dtype=self.dtype,
                         name=f"enc_fc1_{i}")(x)
            y = nn.Dense(self.feat_channels, dtype=self.dtype,
                         name=f"enc_fc2_{i}")(nn.relu(y))
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                             name=f"enc_norm2_{i}")(x + y)
        memory = x.reshape(B, H, W, -1)
        y = ConvGN(self.feat_channels, kernel=3, act=True, dtype=self.dtype,
                   name="last_conv")(memory)
        for i in range(len(feats) - 2, -1, -1):
            lat = ConvGN(self.feat_channels, kernel=1, dtype=self.dtype,
                         name=f"lateral_{i}")(feats[i])
            y = lat + resize_2d(y, lat.shape[1:3], "nearest")
            y = ConvGN(self.feat_channels, kernel=3, act=True,
                       dtype=self.dtype, name=f"output_{i}")(y)
        mask_feature = nn.Conv(self.out_channels, (3, 3), padding=1,
                               dtype=self.dtype, name="mask_feature")(y)
        return mask_feature, memory


class DetrDecoderLayer(nn.Module):
    """Post-norm DETR decoder layer, SELF-attention first — MaskFormer's
    order, unlike Mask2Former's cross-first
    (reference `_base_/models/maskformer_beit.py` operation_order
    ('self_attn','norm','cross_attn','norm','ffn','norm'))."""

    num_heads: int
    ffn_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, query_pos, key, key_pos, attn_mask):
        d = query.shape[-1]
        x = query + MultiheadAttention(self.num_heads, dtype=self.dtype,
                                       name="self_attn")(
            query + query_pos, query + query_pos, query, None)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x + MultiheadAttention(self.num_heads, dtype=self.dtype,
                                   name="cross_attn")(
            x + query_pos, key + key_pos, key, attn_mask)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="ffn_fc1")(x)
        y = nn.relu(y)
        y = nn.Dense(d, dtype=self.dtype, name="ffn_fc2")(y)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x + y)
        return x


class MaskFormerHead(nn.Module):
    num_classes: int = 150
    num_queries: int = 100
    feat_channels: int = 256
    out_channels: int = 256
    num_decoder_layers: int = 6
    num_heads: int = 8
    decoder_ffn_dim: int = 2048
    use_encoder_decoder: bool = False
    pixel_encoder_layers: int = 6
    pixel_encoder_ffn_dim: int = 2048
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        C = self.feat_channels
        if self.use_encoder_decoder:
            self.pixel_decoder = TransformerEncoderPixelDecoder(
                feat_channels=C, out_channels=self.out_channels,
                num_layers=self.pixel_encoder_layers,
                num_heads=self.num_heads,
                ffn_dim=self.pixel_encoder_ffn_dim, dtype=self.dtype)
        else:
            self.pixel_decoder = PixelDecoder(
                feat_channels=C, out_channels=self.out_channels,
                dtype=self.dtype)
        self.query_embed = self.param("query_embed",
                                      nn.initializers.normal(1.0),
                                      (self.num_queries, C), jnp.float32)
        self.decoder_layers = [
            DetrDecoderLayer(self.num_heads, self.decoder_ffn_dim,
                             dtype=self.dtype, name=f"decoder_layer_{i}")
            for i in range(self.num_decoder_layers)
        ]
        self.post_norm = nn.LayerNorm(epsilon=1e-5, name="post_norm")
        self.cls_embed = nn.Dense(self.num_classes + 1, name="cls_embed")
        self.mask_embed = [
            nn.Dense(C, dtype=self.dtype, name=f"mask_embed_{i}")
            for i in range(2)
        ] + [nn.Dense(self.out_channels, dtype=self.dtype,
                      name="mask_embed_2")]

    def __call__(self, feats: Sequence[jax.Array], train: bool = False):
        B = feats[0].shape[0]
        mask_feature, memory = self.pixel_decoder(feats)
        H, W = memory.shape[1], memory.shape[2]
        if memory.shape[-1] != self.feat_channels:
            raise ValueError("memory dim mismatch")
        mem = memory.reshape(B, H * W, -1)
        pos = sine_positional_encoding((H, W), self.feat_channels // 2)
        pos = jnp.broadcast_to(pos.reshape(1, H * W, -1), mem.shape).astype(
            mem.dtype)
        query = jnp.zeros((B, self.num_queries, self.feat_channels),
                          mem.dtype)
        query_pos = jnp.broadcast_to(self.query_embed[None].astype(mem.dtype),
                                     query.shape)
        cls_list: List[jax.Array] = []
        mask_list: List[jax.Array] = []
        for layer in self.decoder_layers:
            query = layer(query, query_pos, mem, pos, None)
            x = self.post_norm(query)
            cls_list.append(self.cls_embed(x).astype(jnp.float32))
            m = x
            for i, fc in enumerate(self.mask_embed):
                m = fc(m)
                if i < 2:
                    m = nn.relu(m)
            mask_list.append(jnp.einsum("bqc,bhwc->bqhw", m, mask_feature,
                                        preferred_element_type=jnp.float32))
        return cls_list, mask_list
