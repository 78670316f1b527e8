"""Mask2Former head: masked-attention transformer decoder over pixel-decoder
features.

Parity target: `Mask2FormerHead`
(reference `segmentation/mmseg_custom/models/decode_heads/mask2former_head.py:21-579`):
  * pixel decoder plug-in (see `pixel_decoder.py`)
  * 9-layer decoder, post-norm, operation order (cross_attn, norm, self_attn,
    norm, ffn, norm), level-cycled memories (`forward:446-525`)
  * per-layer `forward_head` (`:404-444`): post_norm -> cls logits, mask
    logits via einsum(bqc,bhwc->bqhw), and the sigmoid<0.5 attention mask,
    with the all-masked row reset (`forward:506-508`)
  * semantic fusion einsum at test time (`forward_test:557-579`)
"""

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from vitadapter.heads.pixel_decoder import MSDeformAttnPixelDecoder
from vitadapter.layers.positional import sine_positional_encoding
from vitadapter.utils.resize import resize_2d, resize_hw

NEG_INF = -1e9  # large negative for masked attention logits (fp32-safe)


class MultiheadAttention(nn.Module):
    """torch-style MHA with separate q/k/v inputs and optional boolean
    attention mask (True = disallowed)."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q: jax.Array, k: jax.Array, v: jax.Array,
                 attn_mask: Optional[jax.Array] = None) -> jax.Array:
        B, Nq, C = q.shape
        Nk = k.shape[1]
        h = self.num_heads
        Dh = C // h
        qp = nn.Dense(C, dtype=self.dtype, name="q_proj")(q)
        kp = nn.Dense(C, dtype=self.dtype, name="k_proj")(k)
        vp = nn.Dense(C, dtype=self.dtype, name="v_proj")(v)
        qp = qp.reshape(B, Nq, h, Dh).transpose(0, 2, 1, 3)
        kp = kp.reshape(B, Nk, h, Dh).transpose(0, 2, 1, 3)
        vp = vp.reshape(B, Nk, h, Dh).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qp, kp,
                            preferred_element_type=jnp.float32) * (Dh ** -0.5)
        if attn_mask is not None:
            # attn_mask: (B, h, Nq, Nk) bool, True = masked out
            logits = jnp.where(attn_mask, NEG_INF, logits)
        # store O(N^2) logits in the compute dtype (see layers.attention.mha)
        logits = logits.astype(vp.dtype)
        w = jax.nn.softmax(logits.astype(jnp.float32),
                           axis=-1).astype(vp.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, vp)
        out = out.transpose(0, 2, 1, 3).reshape(B, Nq, C)
        return nn.Dense(C, dtype=self.dtype, name="out_proj")(out)


class DecoderLayer(nn.Module):
    """Post-norm DETR decoder layer: cross -> LN -> self -> LN -> FFN -> LN."""

    num_heads: int
    ffn_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, query, query_pos, key, key_pos,
                 attn_mask: Optional[jax.Array]) -> jax.Array:
        d = query.shape[-1]
        x = query + MultiheadAttention(self.num_heads, dtype=self.dtype,
                                       name="cross_attn")(
            query + query_pos, key + key_pos, key, attn_mask)
        # dtype= keeps the post-norm query stream bf16 under mixed precision
        # (stats still fp32 inside flax)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x + MultiheadAttention(self.num_heads, dtype=self.dtype,
                                   name="self_attn")(
            x + query_pos, x + query_pos, x, None)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(self.ffn_dim, dtype=self.dtype, name="ffn_fc1")(x)
        y = nn.relu(y)
        y = nn.Dense(d, dtype=self.dtype, name="ffn_fc2")(y)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x + y)
        return x


class Mask2FormerHead(nn.Module):
    num_classes: int = 150
    num_queries: int = 100
    feat_channels: int = 256
    out_channels: int = 256
    num_transformer_feat_level: int = 3
    num_decoder_layers: int = 9
    num_heads: int = 8
    decoder_ffn_dim: int = 2048
    pixel_encoder_ffn_dim: int = 1024
    pixel_encoder_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        C = self.feat_channels
        self.pixel_decoder = MSDeformAttnPixelDecoder(
            feat_channels=C, out_channels=self.out_channels,
            num_encoder_levels=self.num_transformer_feat_level,
            num_heads=self.pixel_encoder_heads,
            ffn_dim=self.pixel_encoder_ffn_dim,
            num_feats=C // 2, dtype=self.dtype)
        self.query_embed = self.param("query_embed",
                                      nn.initializers.normal(1.0),
                                      (self.num_queries, C), jnp.float32)
        self.query_feat = self.param("query_feat",
                                     nn.initializers.normal(1.0),
                                     (self.num_queries, C), jnp.float32)
        self.level_embed = self.param("level_embed",
                                      nn.initializers.normal(1.0),
                                      (self.num_transformer_feat_level, C),
                                      jnp.float32)
        self.decoder_layers = [
            DecoderLayer(self.num_heads, self.decoder_ffn_dim,
                         dtype=self.dtype, name=f"decoder_layer_{i}")
            for i in range(self.num_decoder_layers)
        ]
        self.post_norm = nn.LayerNorm(epsilon=1e-5, name="post_norm")
        self.cls_embed = nn.Dense(self.num_classes + 1, name="cls_embed")
        self.mask_embed = [
            nn.Dense(C, dtype=self.dtype, name=f"mask_embed_{i}")
            for i in range(2)
        ] + [nn.Dense(self.out_channels, dtype=self.dtype, name="mask_embed_2")]

    def _forward_head(self, decoder_out, mask_feature, attn_size,
                      mask_feature_small=None):
        """cls logits, mask logits, attention mask for the next layer."""
        x = self.post_norm(decoder_out)
        cls_pred = self.cls_embed(x).astype(jnp.float32)
        m = x
        for i, layer in enumerate(self.mask_embed):
            m = layer(m)
            if i < 2:
                m = nn.relu(m)
        # mask_feature: (B, H, W, C) NHWC
        mask_pred = jnp.einsum("bqc,bhwc->bqhw", m, mask_feature,
                               preferred_element_type=jnp.float32)
        if mask_feature_small is not None:
            # bilinear resize is linear in mask_feature and acts on the hw
            # axes, which are free indices of the q-contraction — so the
            # einsum against the ONCE-resized mask feature equals
            # resize(mask_pred) up to float reassociation. At eval this
            # makes the full-res (Q, H, W) mask_pred of every intermediate
            # layer dead code (only the final layer's is consumed), replacing
            # ten full-res einsums + downsamples with three small resizes.
            am = jnp.einsum("bqc,bhwc->bqhw", m, mask_feature_small,
                            preferred_element_type=jnp.float32)
        else:
            am = resize_hw(mask_pred, attn_size, "bilinear")
        B, Q = am.shape[0], am.shape[1]
        am = (jax.nn.sigmoid(am) < 0.5).reshape(B, Q, -1)
        # all-masked rows attend everywhere instead (reference :506-508)
        all_masked = am.all(axis=-1, keepdims=True)
        am = jnp.where(all_masked, False, am)
        am = jax.lax.stop_gradient(am)
        # (B, Q, S) -> (B, heads, Q, S)
        am = jnp.broadcast_to(am[:, None], (B, self.num_heads) + am.shape[1:])
        return cls_pred, mask_pred, am

    def __call__(self, feats: Sequence[jax.Array], train: bool = False):
        """feats: 4-scale NHWC pyramid. Returns (cls_list, mask_list) with
        num_decoder_layers+1 entries."""
        B = feats[0].shape[0]
        L = self.num_transformer_feat_level
        mask_feature, memories = self.pixel_decoder(feats)

        dec_inputs = []
        dec_pos = []
        sizes = []
        for i in range(L):
            mem = memories[i]
            H, W = mem.shape[1], mem.shape[2]
            x = mem.reshape(B, H * W, -1) + self.level_embed[i]
            pos = sine_positional_encoding((H, W), self.feat_channels // 2)
            dec_inputs.append(x)
            dec_pos.append(jnp.broadcast_to(
                pos.reshape(1, H * W, -1), x.shape).astype(x.dtype))
            sizes.append((H, W))

        query = jnp.broadcast_to(self.query_feat[None], (B,) + self.query_feat.shape)
        query_pos = jnp.broadcast_to(self.query_embed[None],
                                     (B,) + self.query_embed.shape)

        # at eval, attention masks come from mask features pre-resized to the
        # three memory scales (see `_forward_head`); at train the full-res
        # mask logits are alive anyway (losses), so resizing them is cheaper
        # than a second einsum
        mf_small = (None if train else
                    [resize_2d(mask_feature, s, "bilinear") for s in sizes])

        cls_list: List[jax.Array] = []
        mask_list: List[jax.Array] = []
        cls_pred, mask_pred, attn_mask = self._forward_head(
            query, mask_feature, sizes[0],
            None if train else mf_small[0])
        cls_list.append(cls_pred)
        mask_list.append(mask_pred)

        for i, layer in enumerate(self.decoder_layers):
            li = i % L
            query = layer(query, query_pos, dec_inputs[li], dec_pos[li],
                          attn_mask)
            cls_pred, mask_pred, attn_mask = self._forward_head(
                query, mask_feature, sizes[(i + 1) % L],
                None if train else mf_small[(i + 1) % L])
            cls_list.append(cls_pred)
            mask_list.append(mask_pred)

        return cls_list, mask_list

    @staticmethod
    def semantic_inference(cls_pred: jax.Array, mask_pred: jax.Array) -> jax.Array:
        """Fuse final-layer predictions into per-class logits
        (reference `forward_test:557-579`). Returns (B, h, w, K)."""
        prob = jax.nn.softmax(cls_pred.astype(jnp.float32), axis=-1)[..., :-1]
        mask = jax.nn.sigmoid(mask_pred.astype(jnp.float32))
        seg = jnp.einsum("bqc,bqhw->bhwc", prob, mask)
        return seg
