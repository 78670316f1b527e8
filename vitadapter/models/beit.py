"""BEiT backbone trunk (flax, NHWC / tokens-(B,N,C)).

Parity target: reference `segmentation/mmseg_custom/models/backbones/base/beit.py`
(the variant used by the ADE20K flagship):
  * qkv projection without bias + separate q_bias / v_bias (k bias zero) —
    reference `:72-78,120-123`
  * per-block relative-position bias tables over the full patch grid with
    three extra cls entries (cls->tok, tok->cls, cls->cls) — `:80-108`
  * layer scale gamma_1 / gamma_2 (init_values, e.g. 1e-6) — `:165-170`
  * no absolute pos embed by default (`use_abs_pos_emb=False`)
  * a cls token rides along every block (`beit_adapter.py:104-115`)
The detection variant's windowed attention (det `base/beit.py:177-195`) is
supported via `windowed`/`window_size` per block; rel-pos tables then span the
attention window without cls entries.
"""

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from vitadapter.layers.attention import window_partition, window_reverse
from vitadapter.layers.drop import DropPath
from vitadapter.layers.mlp import Mlp
from vitadapter.layers.patch_embed import HybridEmbed, PatchEmbed


def relative_position_index(wh: int, ww: int, with_cls: bool) -> np.ndarray:
    """Pairwise relative-position bucket ids over a (wh, ww) grid.

    With cls: (wh*ww+1, wh*ww+1) ids into a table of (2wh-1)(2ww-1)+3 buckets
    (reference seg `base/beit.py:88-103`); without: (wh*ww, wh*ww) ids into
    (2wh-1)(2ww-1) buckets (det variant).
    """
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww),
                                  indexing="ij"))  # (2, wh, ww)
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    idx = rel.sum(-1)  # (N, N)
    if not with_cls:
        return idx
    nrd = (2 * wh - 1) * (2 * ww - 1) + 3
    out = np.zeros((idx.shape[0] + 1, idx.shape[1] + 1), np.int64)
    out[1:, 1:] = idx
    out[0, :] = nrd - 3
    out[:, 0] = nrd - 2
    out[0, 0] = nrd - 1
    return out


class BEiTAttention(nn.Module):
    """BEiT MHSA: no-bias qkv + q/v biases, relative-position bias table."""

    num_heads: int = 12
    qkv_bias: bool = True
    rel_pos_grid: Optional[Tuple[int, int]] = None  # grid the table spans
    with_cls: bool = True
    windowed: bool = False
    window_size: int = 14
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, H: int, W: int) -> jax.Array:
        B, N, C = x.shape
        h = self.num_heads
        Dh = C // h
        scale = Dh ** -0.5

        qkv_w = nn.Dense(3 * C, use_bias=False, dtype=self.dtype, name="qkv")
        bias = None
        if self.qkv_bias:
            q_bias = self.param("q_bias", nn.initializers.zeros, (C,),
                                jnp.float32)
            v_bias = self.param("v_bias", nn.initializers.zeros, (C,),
                                jnp.float32)
            bias = jnp.concatenate([q_bias, jnp.zeros_like(q_bias), v_bias])

        rel_bias = None
        if self.rel_pos_grid is not None:
            gh, gw = self.rel_pos_grid
            nrd = (2 * gh - 1) * (2 * gw - 1) + (3 if self.with_cls else 0)
            table = self.param("relative_position_bias_table",
                               nn.initializers.zeros, (nrd, h), jnp.float32)
            idx = relative_position_index(gh, gw, self.with_cls)
            rel_bias = table[jnp.asarray(idx.reshape(-1))].reshape(
                idx.shape[0], idx.shape[1], h)
            rel_bias = rel_bias.transpose(2, 0, 1)[None]  # (1, h, N, N)

        def attend(tokens):
            b, n, _ = tokens.shape
            qkv = qkv_w(tokens)
            if bias is not None:
                qkv = qkv + bias.astype(qkv.dtype)
            qkv = qkv.reshape(b, n, 3, h, Dh)
            q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
            logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k,
                                preferred_element_type=jnp.float32)
            if rel_bias is not None:
                logits = logits + rel_bias
            # store O(N^2) logits in the compute dtype (see layers.attention.mha)
            logits = logits.astype(v.dtype)
            w = jax.nn.softmax(logits.astype(jnp.float32),
                               axis=-1).astype(v.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", w, v)
            return out.transpose(0, 2, 1, 3).reshape(b, n, C)

        if not self.windowed:
            out = attend(x)
        else:
            ws = self.window_size
            import math
            H_ = math.ceil(H / ws) * ws
            W_ = math.ceil(W / ws) * ws
            xm = x.reshape(B, H, W, C)
            xm = jnp.pad(xm, ((0, 0), (0, H_ - H), (0, W_ - W), (0, 0)))
            wnd = window_partition(xm, ws)  # (B, L, ws*ws, C)
            L = wnd.shape[1]
            out = attend(wnd.reshape(B * L, ws * ws, C)).reshape(B, L, ws * ws, C)
            out = window_reverse(out, ws, H_, W_)[:, :H, :W].reshape(B, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class BEiTBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: float = 0.0
    init_values: Optional[float] = 1e-6
    rel_pos_grid: Optional[Tuple[int, int]] = None
    with_cls: bool = True
    windowed: bool = False
    window_size: int = 14
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, H: int, W: int,
                 deterministic: bool = True) -> jax.Array:
        dim = x.shape[-1]
        attn = BEiTAttention(num_heads=self.num_heads, qkv_bias=self.qkv_bias,
                             rel_pos_grid=self.rel_pos_grid,
                             with_cls=self.with_cls, windowed=self.windowed,
                             window_size=self.window_size, dtype=self.dtype,
                             name="attn")
        dp = DropPath(self.drop_path)
        a = attn(nn.LayerNorm(epsilon=1e-6, name="norm1")(x), H, W)
        if self.init_values is not None:
            g1 = self.param("gamma_1",
                            lambda k, s: jnp.full(s, self.init_values,
                                                  jnp.float32), (dim,))
            a = g1 * a
        x = x + dp(a, deterministic=deterministic)
        m = Mlp(hidden_features=int(dim * self.mlp_ratio), dtype=self.dtype,
                name="mlp")(nn.LayerNorm(epsilon=1e-6, name="norm2")(x),
                            deterministic=deterministic)
        if self.init_values is not None:
            g2 = self.param("gamma_2",
                            lambda k, s: jnp.full(s, self.init_values,
                                                  jnp.float32), (dim,))
            m = g2 * m
        return x + dp(m, deterministic=deterministic)


class BEiT(nn.Module):
    """BEiT trunk exposing `embed()` / `run_blocks()` for adapter interleaving.

    rel-pos tables span `img_size//patch_size` for global blocks (seg variant)
    or the attention window for windowed blocks (det variant).
    """

    img_size: int = 512
    patch_size: int = 16
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    init_values: Optional[float] = 1e-6
    drop_path_rate: float = 0.0
    use_abs_pos_emb: bool = False
    use_rel_pos_bias: bool = True
    window_attn: Sequence[bool] | bool = False
    window_size: Sequence[int] | int = 14
    pretrain_size: int = 224
    with_cp: bool = False
    # seg variant threads a cls token (tables carry 3 cls buckets); the det
    # windowed variant drops it entirely (reference det `base/beit.py`)
    use_cls_token: bool = True
    # optional CNN stem replacing the patchify conv (reference HybridEmbed,
    # det `base/beit.py:270`): any NHWC conv module; its last feature map is
    # flattened and projected to embed_dim
    hybrid_backbone: Optional[nn.Module] = None
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        depth = self.depth
        wa = (self.window_attn if isinstance(self.window_attn, (list, tuple))
              else [self.window_attn] * depth)
        ws = (self.window_size if isinstance(self.window_size, (list, tuple))
              else [self.window_size] * depth)
        grid = self.img_size // self.patch_size
        dpr = np.linspace(0, self.drop_path_rate, depth)
        if self.hybrid_backbone is not None:
            self.patch_embed = HybridEmbed(backbone=self.hybrid_backbone,
                                           embed_dim=self.embed_dim,
                                           dtype=self.dtype)
        else:
            self.patch_embed = PatchEmbed(patch_size=self.patch_size,
                                          embed_dim=self.embed_dim,
                                          dtype=self.dtype)
        self.cls_token = self.param("cls_token",
                                    nn.initializers.normal(0.02),
                                    (1, 1, self.embed_dim), jnp.float32)
        if self.use_abs_pos_emb:
            gp = self.pretrain_size // self.patch_size
            self.pos_embed = self.param("pos_embed",
                                        nn.initializers.normal(0.02),
                                        (1, gp * gp, self.embed_dim),
                                        jnp.float32)
        block_cls = BEiTBlock
        if self.with_cp:
            block_cls = nn.remat(BEiTBlock, static_argnums=(2, 3, 4))
        blocks = []
        for i in range(depth):
            windowed = bool(wa[i])
            if self.use_rel_pos_bias:
                rp_grid = ((int(ws[i] or 14), int(ws[i] or 14)) if windowed
                           else (grid, grid))
            else:
                rp_grid = None
            blocks.append(block_cls(
                num_heads=self.num_heads, mlp_ratio=self.mlp_ratio,
                qkv_bias=self.qkv_bias, drop_path=float(dpr[i]),
                init_values=self.init_values, rel_pos_grid=rp_grid,
                with_cls=self.use_cls_token and not windowed,
                windowed=windowed,
                window_size=int(ws[i] or 14), dtype=self.dtype,
                name=f"blocks_{i}"))
        self.blocks = blocks

    def embed(self, x: jax.Array, deterministic: bool = True):
        tokens, H, W = self.patch_embed(x)
        if self.use_abs_pos_emb:
            from vitadapter.models.vit import resample_abs_pos_embed
            gp = self.pretrain_size // self.patch_size
            pe = resample_abs_pos_embed(self.pos_embed.astype(jnp.float32),
                                        (gp, gp), (H, W))
            tokens = tokens + pe.astype(tokens.dtype)
        return tokens, H, W

    def run_blocks(self, x: jax.Array, H: int, W: int, start: int, end: int,
                   deterministic: bool = True) -> jax.Array:
        for blk in self.blocks[start:end]:
            x = blk(x, H, W, deterministic)
        return x

    def __call__(self, x: jax.Array, deterministic: bool = True) -> jax.Array:
        tokens, H, W = self.embed(x, deterministic)
        B = tokens.shape[0]
        if self.use_cls_token:
            cls = jnp.broadcast_to(self.cls_token.astype(tokens.dtype),
                                   (B, 1, self.embed_dim))
            tokens = jnp.concatenate([cls, tokens], axis=1)
        return self.run_blocks(tokens, H, W, 0, self.depth, deterministic)
