"""Uni-Perceiver multimodal trunk (UnifiedBertEncoder) in flax.

Parity target: reference `wsdm2023/mmdet_custom/models/backbones/base/
uniperceiver.py`:
  * `MultiModelBertLayer` (:171-223): joint self-attention over the
    concatenated [image tokens; text tokens] with an optional text padding
    mask, shared FFN, zero-init gamma_1/gamma_2 residual scales, and a SHARED
    LayerNorm applied to both modalities.
  * windowed variant (:119-168): text tokens are replicated into every local
    window, jointly attended, and the per-window text outputs averaged back.
  * `VisualPatchEmbedding` (:226-293): conv patchify + bicubic-resampled
    learned spatial pos-embed + temporal pos-embed slot 0 + LN.
  * `TokenBaseEmbedding` (:307): vocab 49411 (CLIP BPE + specials), learned
    positions (512), token-type 0, LN.
"""

import math
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vitadapter.layers.attention import window_partition, window_reverse
from vitadapter.layers.drop import DropPath
from vitadapter.layers.mlp import gelu
from vitadapter.models.vit import resample_abs_pos_embed

NEG_INF = -1e9


class JointAttention(nn.Module):
    """Self-attention over [image; text] with optional text key mask."""

    num_heads: int = 12
    windowed: bool = False
    window_size: int = 14
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, q: jax.Array,
                 q_mask: Optional[jax.Array], H: int, W: int):
        C = x.shape[-1]
        h = self.num_heads
        Dh = C // h
        scale = Dh ** -0.5
        in_proj = nn.Dense(3 * C, use_bias=True, dtype=self.dtype,
                           name="in_proj")
        out_proj = nn.Dense(C, dtype=self.dtype, name="out_proj")

        def attend(tokens, key_mask):
            b, n, _ = tokens.shape
            qkv = in_proj(tokens).reshape(b, n, 3, h, Dh)
            qq, kk, vv = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
            logits = jnp.einsum("bhqd,bhkd->bhqk", qq * scale, kk,
                                preferred_element_type=jnp.float32)
            if key_mask is not None:
                logits = jnp.where(key_mask[:, None, None, :], logits, NEG_INF)
            logits = logits.astype(vv.dtype)  # see layers.attention.mha
            w = jax.nn.softmax(logits.astype(jnp.float32),
                               axis=-1).astype(vv.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", w, vv)
            return out.transpose(0, 2, 1, 3).reshape(b, n, C)

        B, N, _ = x.shape
        Nq = q.shape[1]
        if not self.windowed:
            tokens = jnp.concatenate([x, q], axis=1)
            key_mask = None
            if q_mask is not None:
                key_mask = jnp.concatenate(
                    [jnp.ones((B, N), bool), q_mask.astype(bool)], axis=1)
            out = out_proj(attend(tokens, key_mask))
            return out[:, :N], out[:, N:]

        ws = self.window_size
        H_ = math.ceil(H / ws) * ws
        W_ = math.ceil(W / ws) * ws
        xm = x.reshape(B, H, W, C)
        xm = jnp.pad(xm, ((0, 0), (0, H_ - H), (0, W_ - W), (0, 0)))
        wnd = window_partition(xm, ws)  # (B, L, ws*ws, C)
        L, Nw = wnd.shape[1], ws * ws
        # replicate text into every window
        qx = jnp.broadcast_to(q[:, None], (B, L, Nq, C))
        tokens = jnp.concatenate([wnd, qx], axis=2).reshape(B * L, Nw + Nq, C)
        key_mask = None
        if q_mask is not None:
            key_mask = jnp.concatenate(
                [jnp.ones((B, Nw), bool), q_mask.astype(bool)], axis=1)
            key_mask = jnp.broadcast_to(key_mask[:, None],
                                        (B, L, Nw + Nq)).reshape(B * L, -1)
        out = attend(tokens, key_mask).reshape(B, L, Nw + Nq, C)
        img = window_reverse(out[:, :, :Nw], ws, H_, W_)[:, :H, :W]
        img = out_proj(img.reshape(B, N, C))
        txt = out_proj(out[:, :, Nw:].mean(axis=1))  # batch_mean over windows
        return img, txt


class MultiModelBertLayer(nn.Module):
    num_heads: int = 12
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    windowed: bool = False
    window_size: int = 14
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, q, q_mask, H, W, deterministic: bool = True):
        C = x.shape[-1]
        norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1")
        norm2 = nn.LayerNorm(epsilon=1e-5, name="norm2")
        fc1 = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype,
                       name="linear1")
        fc2 = nn.Dense(C, dtype=self.dtype, name="linear2")
        g1 = self.param("gamma_1", nn.initializers.zeros, (C,), jnp.float32)
        g2 = self.param("gamma_2", nn.initializers.zeros, (C,), jnp.float32)
        dp = DropPath(self.drop_path)

        x_, q_ = JointAttention(self.num_heads, self.windowed,
                                self.window_size, dtype=self.dtype,
                                name="self_attn")(norm1(x), norm1(q), q_mask,
                                                  H, W)
        x = x + dp(g1 * x_, deterministic=deterministic)
        q = q + dp(g1 * q_, deterministic=deterministic)
        x_ = fc2(gelu(fc1(norm2(x))))
        q_ = fc2(gelu(fc1(norm2(q))))
        x = x + dp(g2 * x_, deterministic=deterministic)
        q = q + dp(g2 * q_, deterministic=deterministic)
        return x, q


class VisualPatchEmbedding(nn.Module):
    embed_dim: int = 768
    patch_size: int = 16
    pretrain_size: int = 224
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array):
        p = self.patch_size
        y = nn.Conv(self.embed_dim, (p, p), strides=(p, p), padding="VALID",
                    dtype=self.dtype, name="proj")(x)
        B, H, W, C = y.shape
        y = y.reshape(B, H * W, C)
        g = self.pretrain_size // self.patch_size
        spatial = self.param("spatial_pos_embed", nn.initializers.normal(0.02),
                             (g * g, self.embed_dim), jnp.float32)
        temporal = self.param("temporal_pos_embed",
                              nn.initializers.normal(0.02),
                              (8, self.embed_dim), jnp.float32)
        pe = resample_abs_pos_embed(spatial[None].astype(jnp.float32),
                                    (g, g), (H, W))
        y = y + pe.astype(y.dtype) + temporal[0].astype(y.dtype)
        y = nn.LayerNorm(epsilon=1e-5, name="embeddings_norm")(y)
        return y, H, W


class TokenBaseEmbedding(nn.Module):
    vocab_size: int = 49411
    embed_dim: int = 768
    max_len: int = 512
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, ids: jax.Array) -> jax.Array:
        emb = nn.Embed(self.vocab_size, self.embed_dim,
                       dtype=self.dtype, name="embeddings")(ids)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (self.max_len, self.embed_dim), jnp.float32)
        tok_type = self.param("token_type", nn.initializers.normal(0.02),
                              (2, self.embed_dim), jnp.float32)
        n = ids.shape[1]
        emb = emb + pos[:n].astype(emb.dtype) + tok_type[0].astype(emb.dtype)
        return nn.LayerNorm(epsilon=1e-5, name="embeddings_norm")(emb)


class UnifiedBertEncoder(nn.Module):
    """Uni-Perceiver trunk exposing embed()/run_layers() for the adapter."""

    patch_size: int = 16
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    drop_path_rate: float = 0.0
    window_attn: Sequence[bool] | bool = False
    window_size: Sequence[int] | int = 14
    pretrain_size: int = 224
    vocab_size: int = 49411
    with_cp: bool = False
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        depth = self.depth
        wa = (self.window_attn if isinstance(self.window_attn, (list, tuple))
              else [self.window_attn] * depth)
        ws = (self.window_size if isinstance(self.window_size, (list, tuple))
              else [self.window_size] * depth)
        dpr = np.linspace(0, self.drop_path_rate, depth)
        layer_cls = (nn.remat(MultiModelBertLayer,
                              static_argnums=(4, 5, 6))
                     if self.with_cp else MultiModelBertLayer)
        self.layers = [
            layer_cls(num_heads=self.num_heads,
                                mlp_ratio=self.mlp_ratio,
                                drop_path=float(dpr[i]), windowed=bool(wa[i]),
                                window_size=int(ws[i] or 14),
                                dtype=self.dtype, name=f"layers_{i}")
            for i in range(depth)
        ]
        self.visual_embed = VisualPatchEmbedding(
            embed_dim=self.embed_dim, patch_size=self.patch_size,
            pretrain_size=self.pretrain_size, dtype=self.dtype)
        self.token_embed = TokenBaseEmbedding(vocab_size=self.vocab_size,
                                              embed_dim=self.embed_dim,
                                              dtype=self.dtype)

    def run_layers(self, x, q, q_mask, H, W, start, end,
                   deterministic: bool = True):
        for layer in self.layers[start:end]:
            x, q = layer(x, q, q_mask, H, W, deterministic)
        return x, q

    def __call__(self, img, question, q_mask=None, deterministic: bool = True):
        x, H, W = self.visual_embed(img)
        q = self.token_embed(question)
        x, q = self.run_layers(x, q, q_mask, H, W, 0, self.depth,
                               deterministic)
        return x, q


class GroundingCrossAttention(nn.Module):
    """Text -> image cross-attention block (reference
    `wsdm2023/.../base/grounding_block.py:7-67`): pre-norm, q from image
    tokens, k/v from text, + MLP."""

    num_heads: int = 12
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, text: jax.Array,
                 text_mask: Optional[jax.Array] = None) -> jax.Array:
        C = x.shape[-1]
        h = self.num_heads
        Dh = C // h
        # the reference applies ONE shared norm1 to both modalities
        # (`grounding_block.py:66`: attn(norm1(x), norm1(r)))
        norm1 = nn.LayerNorm(epsilon=1e-5, name="norm1")
        xq = norm1(x)
        tk = norm1(text)
        qp = nn.Dense(C, dtype=self.dtype, name="q_proj")(xq)
        kp = nn.Dense(C, dtype=self.dtype, name="k_proj")(tk)
        vp = nn.Dense(C, dtype=self.dtype, name="v_proj")(tk)
        B, N, _ = x.shape
        M = text.shape[1]
        qp = qp.reshape(B, N, h, Dh).transpose(0, 2, 1, 3)
        kp = kp.reshape(B, M, h, Dh).transpose(0, 2, 1, 3)
        vp = vp.reshape(B, M, h, Dh).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhqd,bhkd->bhqk", qp * (Dh ** -0.5), kp,
                            preferred_element_type=jnp.float32)
        if text_mask is not None:
            logits = jnp.where(text_mask[:, None, None, :].astype(bool),
                               logits, NEG_INF)
        logits = logits.astype(vp.dtype)  # see layers.attention.mha
        w = jax.nn.softmax(logits.astype(jnp.float32), -1).astype(vp.dtype)
        att = jnp.einsum("bhqk,bhkd->bhqd", w, vp)
        att = att.transpose(0, 2, 1, 3).reshape(B, N, C)
        x = x + nn.Dense(C, dtype=self.dtype, name="out_proj")(att)
        y = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype,
                     name="mlp_fc1")(nn.LayerNorm(epsilon=1e-5, name="norm2")(x))
        y = nn.Dense(C, dtype=self.dtype, name="mlp_fc2")(gelu(y))
        return x + y
