"""Pure-torch mini-reference of the ViT-Adapter / BEiT-Adapter backbones.

Used by tests/test_torch_parity.py as the full-model numerical oracle: a
random torch ``state_dict`` from these modules is converted with
`vitadapter.utils.checkpoint` and the fp32 activations of the flax models are
asserted against this implementation.

This is an independent implementation of the reference math contract
(reference `detection/mmdet_custom/models/backbones/vit_adapter.py:90-132`,
`adapter_modules.py`, `base/vit.py`, seg `base/beit.py`,
`ops/functions/ms_deform_attn_func.py:49-71`), written against the behavior
documented in /root/repo/SURVEY.md — deliberately using torch-native ops
(F.grid_sample, F.interpolate, F.unfold/F.fold) so that every flax/Pallas
formulation in the package is checked against a genuinely different code path.

State-dict key names follow the reference module naming, which is the scheme
`vitadapter.utils.checkpoint.convert_vit_adapter_backbone` /
`convert_beit_backbone` consume.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


# ---------------------------------------------------------------------------
# MSDA (grid_sample formulation — the reference's own CUDA-parity oracle)
# ---------------------------------------------------------------------------

def msda_core_torch(value, spatial_shapes, sampling_locations,
                    attention_weights):
    """value (B,S,M,D); loc (B,Lq,M,L,P,2) in [0,1]; weights (B,Lq,M,L,P)."""
    B, S, M, D = value.shape
    _, Lq, _, L, P, _ = sampling_locations.shape
    out = 0.0
    start = 0
    for lvl, (H, W) in enumerate(spatial_shapes):
        v = value[:, start:start + H * W]                      # (B, HW, M, D)
        v = v.permute(0, 2, 3, 1).reshape(B * M, D, H, W)
        g = 2.0 * sampling_locations[:, :, :, lvl] - 1.0        # (B,Lq,M,P,2)
        g = g.permute(0, 2, 1, 3, 4).reshape(B * M, Lq, P, 2)
        s = F.grid_sample(v, g, mode="bilinear", padding_mode="zeros",
                          align_corners=False)                  # (B*M,D,Lq,P)
        w = attention_weights[:, :, :, lvl].permute(0, 2, 1, 3)
        w = w.reshape(B * M, 1, Lq, P)
        out = out + (s * w).sum(-1)                             # (B*M, D, Lq)
        start += H * W
    out = out.reshape(B, M, D, Lq).permute(0, 3, 1, 2)
    return out.reshape(B, Lq, M * D)


class MSDeformAttnT(nn.Module):
    def __init__(self, d_model, n_levels, n_heads, n_points, ratio=1.0):
        super().__init__()
        self.n_levels, self.n_heads, self.n_points = n_levels, n_heads, n_points
        d_value = int(d_model * ratio)
        self.sampling_offsets = nn.Linear(d_model, n_heads * n_levels * n_points * 2)
        self.attention_weights = nn.Linear(d_model, n_heads * n_levels * n_points)
        self.value_proj = nn.Linear(d_model, d_value)
        self.output_proj = nn.Linear(d_value, d_model)

    def forward(self, query, reference_points, feat, spatial_shapes):
        B, Lq, _ = query.shape
        S = feat.shape[1]
        M, L, P = self.n_heads, self.n_levels, self.n_points
        value = self.value_proj(feat).view(B, S, M, -1)
        off = self.sampling_offsets(query).view(B, Lq, M, L, P, 2)
        w = self.attention_weights(query).view(B, Lq, M, L * P)
        w = F.softmax(w, -1).view(B, Lq, M, L, P)
        if reference_points.shape[-1] == 4:
            loc = (reference_points[:, :, None, :, None, :2]
                   + off / P * reference_points[:, :, None, :, None, 2:]
                   * 0.5)
        else:
            normalizer = torch.tensor([[wd, ht] for ht, wd in spatial_shapes],
                                      dtype=torch.float32)
            loc = (reference_points[:, :, None, :, None, :]
                   + off / normalizer[None, None, None, :, None, :])
        return self.output_proj(msda_core_torch(value, spatial_shapes, loc, w))


# ---------------------------------------------------------------------------
# Adapter modules
# ---------------------------------------------------------------------------

def reference_points_torch(spatial_shapes):
    pts = []
    for H, W in spatial_shapes:
        ys = (torch.arange(H, dtype=torch.float32) + 0.5) / H
        xs = (torch.arange(W, dtype=torch.float32) + 0.5) / W
        yy, xx = torch.meshgrid(ys, xs, indexing="ij")
        pts.append(torch.stack([xx.reshape(-1), yy.reshape(-1)], -1))
    return torch.cat(pts, 0)[None, :, None, :]


class DWConvT(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.dwconv = nn.Conv2d(dim, dim, 3, 1, 1, groups=dim)

    def forward(self, x, H, W):
        B, N, C = x.shape
        n = N // 21
        parts = [(x[:, :16 * n], 2 * H, 2 * W),
                 (x[:, 16 * n:20 * n], H, W),
                 (x[:, 20 * n:], H // 2, W // 2)]
        outs = []
        for t, h, w in parts:
            m = t.transpose(1, 2).reshape(B, C, h, w)
            m = self.dwconv(m)
            outs.append(m.reshape(B, C, h * w).transpose(1, 2))
        return torch.cat(outs, 1)


class ConvFFNT(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.dwconv = DWConvT(hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x, H, W):
        x = self.fc1(x)
        x = self.dwconv(x, H, W)
        x = F.gelu(x)
        return self.fc2(x)


class InjectorT(nn.Module):
    def __init__(self, dim, num_heads, n_points, deform_ratio):
        super().__init__()
        self.query_norm = nn.LayerNorm(dim, eps=1e-6)
        self.feat_norm = nn.LayerNorm(dim, eps=1e-6)
        self.attn = MSDeformAttnT(dim, 3, num_heads, n_points, deform_ratio)
        self.gamma = nn.Parameter(torch.zeros(dim))

    def forward(self, query, ref, feat, shapes):
        attn = self.attn(self.query_norm(query), ref, self.feat_norm(feat),
                         shapes)
        return query + self.gamma * attn


class ExtractorT(nn.Module):
    def __init__(self, dim, num_heads, n_points, deform_ratio, with_cffn,
                 cffn_ratio):
        super().__init__()
        self.query_norm = nn.LayerNorm(dim, eps=1e-6)
        self.feat_norm = nn.LayerNorm(dim, eps=1e-6)
        self.attn = MSDeformAttnT(dim, 1, num_heads, n_points, deform_ratio)
        self.with_cffn = with_cffn
        if with_cffn:
            self.ffn_norm = nn.LayerNorm(dim, eps=1e-6)
            self.ffn = ConvFFNT(dim, int(dim * cffn_ratio))

    def forward(self, query, ref, feat, shapes, H, W):
        attn = self.attn(self.query_norm(query), ref, self.feat_norm(feat),
                         shapes)
        query = query + attn
        if self.with_cffn:
            query = query + self.ffn(self.ffn_norm(query), H, W)
        return query


class InteractionBlockT(nn.Module):
    def __init__(self, dim, num_heads, n_points, deform_ratio, with_cffn,
                 cffn_ratio, extra_extractor):
        super().__init__()
        self.injector = InjectorT(dim, num_heads, n_points, deform_ratio)
        self.extractor = ExtractorT(dim, num_heads, n_points, deform_ratio,
                                    with_cffn, cffn_ratio)
        if extra_extractor:
            self.extra_extractors = nn.ModuleList([
                ExtractorT(dim, num_heads, n_points, deform_ratio, with_cffn,
                           cffn_ratio) for _ in range(2)])
        else:
            self.extra_extractors = None

    def forward(self, x, c, blocks_fn, inj_in, ext_in, H, W):
        ref1, shapes1 = inj_in
        ref2, shapes2 = ext_in
        x = self.injector(x, ref1, c, shapes1)
        x = blocks_fn(x)
        c = self.extractor(c, ref2, x, shapes2, H, W)
        if self.extra_extractors is not None:
            for ex in self.extra_extractors:
                c = ex(c, ref2, x, shapes2, H, W)
        return x, c


class SpatialPriorModuleT(nn.Module):
    def __init__(self, inplanes, embed_dim):
        super().__init__()
        def cbr(cin, cout, stride):
            return [nn.Conv2d(cin, cout, 3, stride, 1, bias=False),
                    nn.BatchNorm2d(cout), nn.ReLU(inplace=True)]
        self.stem = nn.Sequential(*cbr(3, inplanes, 2), *cbr(inplanes, inplanes, 1),
                                  *cbr(inplanes, inplanes, 1),
                                  nn.MaxPool2d(3, 2, 1))
        self.conv2 = nn.Sequential(*cbr(inplanes, 2 * inplanes, 2))
        self.conv3 = nn.Sequential(*cbr(2 * inplanes, 4 * inplanes, 2))
        self.conv4 = nn.Sequential(*cbr(4 * inplanes, 4 * inplanes, 2))
        self.fc1 = nn.Conv2d(inplanes, embed_dim, 1)
        self.fc2 = nn.Conv2d(2 * inplanes, embed_dim, 1)
        self.fc3 = nn.Conv2d(4 * inplanes, embed_dim, 1)
        self.fc4 = nn.Conv2d(4 * inplanes, embed_dim, 1)

    def forward(self, x):
        c1 = self.stem(x)
        c2 = self.conv2(c1)
        c3 = self.conv3(c2)
        c4 = self.conv4(c3)
        c1 = self.fc1(c1)
        c2 = self.fc2(c2)
        c3 = self.fc3(c3)
        c4 = self.fc4(c4)
        B, D = c2.shape[0], c2.shape[1]
        c2 = c2.reshape(B, D, -1).transpose(1, 2)
        c3 = c3.reshape(B, D, -1).transpose(1, 2)
        c4 = c4.reshape(B, D, -1).transpose(1, 2)
        return c1, c2, c3, c4


# ---------------------------------------------------------------------------
# Plain ViT trunk
# ---------------------------------------------------------------------------

class MlpT(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.fc1 = nn.Linear(dim, hidden)
        self.fc2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class AttentionT(nn.Module):
    def __init__(self, dim, num_heads, qkv_bias):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, H, W):
        B, N, C = x.shape
        h = self.num_heads
        qkv = self.qkv(x).reshape(B, N, 3, h, C // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(out)


class WindowedAttentionT(nn.Module):
    """unfold/fold windowed MHSA (the reference det formulation: qkv computed
    on the unpadded tokens first, zero-padded to a window multiple, softmax
    over the full window including padded keys)."""

    def __init__(self, dim, num_heads, qkv_bias, window_size):
        super().__init__()
        self.num_heads = num_heads
        self.ws = window_size
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
        self.proj = nn.Linear(dim, dim)

    def forward(self, x, H, W):
        B, N, C = x.shape
        ws, h = self.ws, self.num_heads
        H_ = math.ceil(H / ws) * ws
        W_ = math.ceil(W / ws) * ws
        qkv = self.qkv(x)                                   # (B, N, 3C)
        qkv = qkv.transpose(1, 2).reshape(B, 3 * C, H, W)
        qkv = F.pad(qkv, (0, W_ - W, 0, H_ - H))
        qkv = F.unfold(qkv, ws, stride=ws)                  # (B, 3C*ws*ws, L)
        L = qkv.shape[-1]
        qkv = qkv.reshape(B, 3, h, C // h, ws * ws, L)
        qkv = qkv.permute(1, 0, 5, 2, 4, 3)                 # (3, B, L, h, n, d)
        q, k, v = qkv.unbind(0)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(-1)
        out = attn @ v                                      # (B, L, h, n, d)
        out = out.permute(0, 2, 4, 3, 1).reshape(B, C * ws * ws, L)
        out = F.fold(out, (H_, W_), ws, stride=ws)          # (B, C, H_, W_)
        out = out[:, :, :H, :W].reshape(B, C, N).transpose(1, 2)
        return self.proj(out)


class LayerNorm2dT(nn.Module):
    """Channel-first LayerNorm over NCHW maps."""

    def __init__(self, dim, eps=1e-6):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(dim))
        self.bias = nn.Parameter(torch.zeros(dim))
        self.eps = eps

    def forward(self, x):
        u = x.mean(1, keepdim=True)
        s = (x - u).pow(2).mean(1, keepdim=True)
        x = (x - u) / torch.sqrt(s + self.eps)
        return x * self.weight[:, None, None] + self.bias[:, None, None]


class ResBottleneckBlockT(nn.Module):
    def __init__(self, dim):
        super().__init__()
        mid = dim // 2
        self.conv1 = nn.Conv2d(dim, mid, 1, bias=False)
        self.norm1 = LayerNorm2dT(mid)
        self.conv2 = nn.Conv2d(mid, mid, 3, 1, 1, bias=False)
        self.norm2 = LayerNorm2dT(mid)
        self.conv3 = nn.Conv2d(mid, dim, 1, bias=False)
        self.norm3 = LayerNorm2dT(dim)

    def forward(self, x):
        out = F.gelu(self.norm1(self.conv1(x)))
        out = F.gelu(self.norm2(self.conv2(out)))
        out = self.norm3(self.conv3(out))
        return x + out


class BlockT(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio, qkv_bias, layer_scale,
                 windowed, window_size, use_residual):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        if windowed:
            self.attn = WindowedAttentionT(dim, num_heads, qkv_bias, window_size)
        else:
            self.attn = AttentionT(dim, num_heads, qkv_bias)
        self.mlp = MlpT(dim, int(dim * mlp_ratio))
        self.layer_scale = layer_scale
        if layer_scale:
            self.gamma1 = nn.Parameter(torch.ones(dim))
            self.gamma2 = nn.Parameter(torch.ones(dim))
        self.residual = ResBottleneckBlockT(dim) if use_residual else None

    def forward(self, x, H, W):
        a = self.attn(self.norm1(x), H, W)
        x = x + (self.gamma1 * a if self.layer_scale else a)
        m = self.mlp(self.norm2(x))
        x = x + (self.gamma2 * m if self.layer_scale else m)
        if self.residual is not None:
            B, N, C = x.shape
            xm = x.transpose(1, 2).reshape(B, C, H, W)
            xm = self.residual(xm)
            x = xm.reshape(B, C, N).transpose(1, 2)
        return x


class ViTAdapterT(nn.Module):
    """Full ViT-Adapter backbone mini-reference (strides 4/8/16/32 pyramid)."""

    def __init__(self, embed_dim=48, depth=4, num_heads=4, mlp_ratio=4.0,
                 qkv_bias=True, layer_scale=True, patch_size=16,
                 pretrain_size=224, conv_inplane=16, deform_num_heads=6,
                 n_points=4, deform_ratio=1.0, cffn_ratio=0.25,
                 interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3)),
                 window_attn=False, window_size=14, residual_indices=(),
                 add_vit_feature=True):
        super().__init__()
        self.patch_size = patch_size
        self.pretrain_size = pretrain_size
        self.interaction_indexes = interaction_indexes
        self.add_vit_feature = add_vit_feature
        grid = pretrain_size // patch_size
        self.pos_embed = nn.Parameter(torch.zeros(1, grid * grid + 1, embed_dim))
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, embed_dim, patch_size, patch_size)
        wa = window_attn if isinstance(window_attn, (list, tuple)) \
            else [window_attn] * depth
        wsz = window_size if isinstance(window_size, (list, tuple)) \
            else [window_size] * depth
        self.blocks = nn.ModuleList([
            BlockT(embed_dim, num_heads, mlp_ratio, qkv_bias, layer_scale,
                   bool(wa[i]), int(wsz[i] or 14), i in residual_indices)
            for i in range(depth)])
        self.level_embed = nn.Parameter(torch.zeros(3, embed_dim))
        self.spm = SpatialPriorModuleT(conv_inplane, embed_dim)
        n_inter = len(interaction_indexes)
        self.interactions = nn.ModuleList([
            InteractionBlockT(embed_dim, deform_num_heads, n_points,
                              deform_ratio, True, cffn_ratio,
                              extra_extractor=(i == n_inter - 1))
            for i in range(n_inter)])
        self.up = nn.ConvTranspose2d(embed_dim, embed_dim, 2, 2)
        self.norm1 = nn.BatchNorm2d(embed_dim)
        self.norm2 = nn.BatchNorm2d(embed_dim)
        self.norm3 = nn.BatchNorm2d(embed_dim)
        self.norm4 = nn.BatchNorm2d(embed_dim)

    def _pos_embed(self, H, W):
        grid = self.pretrain_size // self.patch_size
        pe = self.pos_embed[:, 1:]
        D = pe.shape[-1]
        pe = pe.reshape(1, grid, grid, D).permute(0, 3, 1, 2)
        pe = F.interpolate(pe, size=(H, W), mode="bicubic",
                           align_corners=False)
        return pe.reshape(1, D, H * W).transpose(1, 2)

    def forward(self, x):
        """x: (B, 3, H, W) NCHW. Returns 4 NCHW maps."""
        B = x.shape[0]
        h_img, w_img = x.shape[2], x.shape[3]
        shapes3 = ((h_img // 8, w_img // 8), (h_img // 16, w_img // 16),
                   (h_img // 32, w_img // 32))
        shapes1 = (shapes3[1],)
        inj_in = (reference_points_torch(shapes1), shapes3)
        ext_in = (reference_points_torch(shapes3), shapes1)

        c1, c2, c3, c4 = self.spm(x)
        c2 = c2 + self.level_embed[0]
        c3 = c3 + self.level_embed[1]
        c4 = c4 + self.level_embed[2]
        c = torch.cat([c2, c3, c4], 1)
        n2, n3 = c2.shape[1], c3.shape[1]

        t = self.patch_embed.proj(x)
        H, W = t.shape[2], t.shape[3]
        D = t.shape[1]
        t = t.reshape(B, D, H * W).transpose(1, 2)
        t = t + self._pos_embed(H, W)

        for i, layer in enumerate(self.interactions):
            a, b = self.interaction_indexes[i]

            def blocks_fn(tokens, _a=a, _b=b):
                for blk in self.blocks[_a:_b + 1]:
                    tokens = blk(tokens, H, W)
                return tokens

            t, c = layer(t, c, blocks_fn, inj_in, ext_in, H, W)

        c2 = c[:, :n2].transpose(1, 2).reshape(B, D, H * 2, W * 2)
        c3 = c[:, n2:n2 + n3].transpose(1, 2).reshape(B, D, H, W)
        c4 = c[:, n2 + n3:].transpose(1, 2).reshape(B, D, H // 2, W // 2)
        c1 = self.up(c2) + c1

        if self.add_vit_feature:
            x3 = t.transpose(1, 2).reshape(B, D, H, W)
            up = lambda m, s: F.interpolate(m, scale_factor=s, mode="bilinear",
                                            align_corners=False)
            c1 = c1 + up(x3, 4)
            c2 = c2 + up(x3, 2)
            c3 = c3 + x3
            c4 = c4 + up(x3, 0.5)

        return [self.norm1(c1), self.norm2(c2), self.norm3(c3), self.norm4(c4)]


# ---------------------------------------------------------------------------
# BEiT trunk + adapter (seg variant: cls token, per-block rel-pos tables)
# ---------------------------------------------------------------------------

def rel_pos_index_torch(g):
    """(g*g+1, g*g+1) bucket ids into a ((2g-1)^2 + 3, ...) table."""
    coords = torch.stack(torch.meshgrid(torch.arange(g), torch.arange(g),
                                        indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.permute(1, 2, 0).contiguous()
    rel[:, :, 0] += g - 1
    rel[:, :, 1] += g - 1
    rel[:, :, 0] *= 2 * g - 1
    idx = rel.sum(-1)
    n = (2 * g - 1) ** 2 + 3
    out = torch.zeros(idx.shape[0] + 1, idx.shape[1] + 1, dtype=torch.long)
    out[1:, 1:] = idx
    out[0, :] = n - 3
    out[:, 0] = n - 2
    out[0, 0] = n - 1
    return out


class BEiTAttentionT(nn.Module):
    def __init__(self, dim, num_heads, grid):
        super().__init__()
        self.num_heads = num_heads
        self.scale = (dim // num_heads) ** -0.5
        self.qkv = nn.Linear(dim, dim * 3, bias=False)
        self.q_bias = nn.Parameter(torch.zeros(dim))
        self.v_bias = nn.Parameter(torch.zeros(dim))
        self.proj = nn.Linear(dim, dim)
        n = (2 * grid - 1) ** 2 + 3
        self.relative_position_bias_table = nn.Parameter(
            torch.zeros(n, num_heads))
        self.register_buffer("relative_position_index",
                             rel_pos_index_torch(grid), persistent=False)

    def forward(self, x):
        B, N, C = x.shape
        h = self.num_heads
        bias = torch.cat([self.q_bias, torch.zeros_like(self.q_bias),
                          self.v_bias])
        qkv = F.linear(x, self.qkv.weight, bias)
        qkv = qkv.reshape(B, N, 3, h, C // h).permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        attn = (q * self.scale) @ k.transpose(-2, -1)
        idx = self.relative_position_index
        rel = self.relative_position_bias_table[idx.reshape(-1)]
        rel = rel.reshape(idx.shape[0], idx.shape[1], h).permute(2, 0, 1)
        attn = attn + rel[None]
        attn = attn.softmax(-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, C)
        return self.proj(out)


class BEiTBlockT(nn.Module):
    def __init__(self, dim, num_heads, mlp_ratio, init_values, grid):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = BEiTAttentionT(dim, num_heads, grid)
        self.mlp = MlpT(dim, int(dim * mlp_ratio))
        self.gamma_1 = nn.Parameter(init_values * torch.ones(dim))
        self.gamma_2 = nn.Parameter(init_values * torch.ones(dim))

    def forward(self, x):
        x = x + self.gamma_1 * self.attn(self.norm1(x))
        x = x + self.gamma_2 * self.mlp(self.norm2(x))
        return x


class BEiTAdapterT(nn.Module):
    """BEiT-Adapter mini-reference (seg variant: cls token rides the trunk,
    per-interaction maps feed add_vit_feature)."""

    def __init__(self, img_size=64, patch_size=16, embed_dim=48, depth=4,
                 num_heads=4, mlp_ratio=4.0, init_values=0.1,
                 conv_inplane=16, deform_num_heads=6, n_points=4,
                 deform_ratio=0.5, cffn_ratio=0.25,
                 interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3))):
        super().__init__()
        self.interaction_indexes = interaction_indexes
        grid = img_size // patch_size
        self.cls_token = nn.Parameter(torch.zeros(1, 1, embed_dim))
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, embed_dim, patch_size, patch_size)
        self.blocks = nn.ModuleList([
            BEiTBlockT(embed_dim, num_heads, mlp_ratio, init_values, grid)
            for _ in range(depth)])
        self.level_embed = nn.Parameter(torch.zeros(3, embed_dim))
        self.spm = SpatialPriorModuleT(conv_inplane, embed_dim)
        n_inter = len(interaction_indexes)
        self.interactions = nn.ModuleList([
            InteractionBlockT(embed_dim, deform_num_heads, n_points,
                              deform_ratio, True, cffn_ratio,
                              extra_extractor=(i == n_inter - 1))
            for i in range(n_inter)])
        self.up = nn.ConvTranspose2d(embed_dim, embed_dim, 2, 2)
        self.norm1 = nn.BatchNorm2d(embed_dim)
        self.norm2 = nn.BatchNorm2d(embed_dim)
        self.norm3 = nn.BatchNorm2d(embed_dim)
        self.norm4 = nn.BatchNorm2d(embed_dim)

    def forward(self, x):
        B = x.shape[0]
        h_img, w_img = x.shape[2], x.shape[3]
        shapes3 = ((h_img // 8, w_img // 8), (h_img // 16, w_img // 16),
                   (h_img // 32, w_img // 32))
        shapes1 = (shapes3[1],)
        inj_in = (reference_points_torch(shapes1), shapes3)
        ext_in = (reference_points_torch(shapes3), shapes1)

        c1, c2, c3, c4 = self.spm(x)
        c2 = c2 + self.level_embed[0]
        c3 = c3 + self.level_embed[1]
        c4 = c4 + self.level_embed[2]
        c = torch.cat([c2, c3, c4], 1)
        n2, n3 = c2.shape[1], c3.shape[1]

        t = self.patch_embed.proj(x)
        H, W = t.shape[2], t.shape[3]
        D = t.shape[1]
        t = t.reshape(B, D, H * W).transpose(1, 2)
        cls = self.cls_token.expand(B, -1, -1)

        outs = []
        for i, layer in enumerate(self.interactions):
            a, b = self.interaction_indexes[i]

            def blocks_fn(tokens, _a=a, _b=b):
                nonlocal cls
                tokens = torch.cat([cls, tokens], 1)
                for blk in self.blocks[_a:_b + 1]:
                    tokens = blk(tokens)
                cls = tokens[:, :1]
                return tokens[:, 1:]

            t, c = layer(t, c, blocks_fn, inj_in, ext_in, H, W)
            outs.append(t.transpose(1, 2).reshape(B, D, H, W))

        c2 = c[:, :n2].transpose(1, 2).reshape(B, D, H * 2, W * 2)
        c3 = c[:, n2:n2 + n3].transpose(1, 2).reshape(B, D, H, W)
        c4 = c[:, n2 + n3:].transpose(1, 2).reshape(B, D, H // 2, W // 2)
        c1 = self.up(c2) + c1

        x1, x2, x3, x4 = outs
        up = lambda m, s: F.interpolate(m, scale_factor=s, mode="bilinear",
                                        align_corners=False)
        c1 = c1 + up(x1, 4)
        c2 = c2 + up(x2, 2)
        c3 = c3 + x3
        c4 = c4 + up(x4, 0.5)

        return [self.norm1(c1), self.norm2(c2), self.norm3(c3), self.norm4(c4)]


# ---------------------------------------------------------------------------
# Mask2Former head (pixel decoder + masked-attention DETR decoder)
# Mini-reference of `mmseg_custom/models/decode_heads/mask2former_head.py` +
# `plugins/msdeformattn_pixel_decoder.py`, with the mmseg key scheme that
# `vitadapter.utils.checkpoint.convert_mask2former_head` consumes.
# ---------------------------------------------------------------------------

def sine_pos_torch(hw, num_feats, temperature=10000.0, scale=2 * math.pi,
                   eps=1e-6):
    """mmcv SinePositionalEncoding with an all-valid mask: (H, W, 2F)."""
    H, W = hw
    y = torch.arange(1, H + 1, dtype=torch.float32)[:, None].expand(H, W)
    x = torch.arange(1, W + 1, dtype=torch.float32)[None, :].expand(H, W)
    y = y / (H + eps) * scale
    x = x / (W + eps) * scale
    dim_t = torch.arange(num_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * torch.div(dim_t, 2, rounding_mode="floor")
                            / num_feats)
    pos_y = y[..., None] / dim_t
    pos_x = x[..., None] / dim_t
    pos_y = torch.stack([pos_y[..., 0::2].sin(), pos_y[..., 1::2].cos()],
                        -1).reshape(H, W, num_feats)
    pos_x = torch.stack([pos_x[..., 0::2].sin(), pos_x[..., 1::2].cos()],
                        -1).reshape(H, W, num_feats)
    return torch.cat([pos_y, pos_x], -1)


class ConvGNT(nn.Module):
    """mmcv ConvModule(conv, GN(32)) as named by the converter."""

    def __init__(self, cin, cout, kernel=1, bias=False, act=False):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, kernel, padding=kernel // 2,
                              bias=bias)
        self.gn = nn.GroupNorm(32, cout, eps=1e-5)
        self.act = act

    def forward(self, x):
        x = self.gn(self.conv(x))
        return F.relu(x) if self.act else x


class MHAWrapT(nn.Module):
    """mmcv MultiheadAttention: torch MHA under `.attn`, residual outside."""

    def __init__(self, C, heads):
        super().__init__()
        self.attn = nn.MultiheadAttention(C, heads, batch_first=True)


class FFNT2(nn.Module):
    """mmcv FFN: layers = Sequential(Sequential(Linear, ReLU), Linear)."""

    def __init__(self, C, hidden):
        super().__init__()
        self.layers = nn.Sequential(
            nn.Sequential(nn.Linear(C, hidden), nn.ReLU()),
            nn.Linear(hidden, C))


class DetrDecoderLayerT(nn.Module):
    """Post-norm order: cross_attn, norm, self_attn, norm, ffn, norm."""

    def __init__(self, C, heads, ffn_dim):
        super().__init__()
        self.attentions = nn.ModuleList(
            [MHAWrapT(C, heads), MHAWrapT(C, heads)])
        self.norms = nn.ModuleList([nn.LayerNorm(C) for _ in range(3)])
        self.ffns = nn.ModuleList([FFNT2(C, ffn_dim)])

    def forward(self, q, q_pos, k, k_pos, attn_mask):
        a, _ = self.attentions[0].attn(q + q_pos, k + k_pos, k,
                                       attn_mask=attn_mask)
        q = self.norms[0](q + a)
        a, _ = self.attentions[1].attn(q + q_pos, q + q_pos, q)
        q = self.norms[1](q + a)
        y = self.ffns[0].layers(q)
        return self.norms[2](q + y)


class DeformableEncoderLayerT(nn.Module):
    def __init__(self, C, heads, n_levels, n_points, ffn_dim):
        super().__init__()
        self.attentions = nn.ModuleList(
            [MSDeformAttnT(C, n_levels, heads, n_points)])
        self.norms = nn.ModuleList([nn.LayerNorm(C) for _ in range(2)])
        self.ffns = nn.ModuleList([FFNT2(C, ffn_dim)])

    def forward(self, x, pos, ref, shapes):
        a = self.attentions[0](x + pos, ref, x, shapes)
        x = self.norms[0](x + a)
        y = self.ffns[0].layers(x)
        return self.norms[1](x + y)


class MSDeformAttnPixelDecoderT(nn.Module):
    def __init__(self, in_channels, C, num_layers=6, heads=8, n_points=4,
                 ffn_dim=1024, num_encoder_levels=3):
        super().__init__()
        L = self.L = num_encoder_levels
        self.level_encoding = nn.Embedding(L, C)
        self.input_convs = nn.ModuleList(
            [ConvGNT(in_channels[-1 - i], C, 1, bias=True)
             for i in range(L)])
        n_fpn = len(in_channels) - L
        self.lateral_convs = nn.ModuleList(
            [ConvGNT(in_channels[i], C, 1) for i in range(n_fpn)])
        self.output_convs = nn.ModuleList(
            [ConvGNT(C, C, 3, act=True) for i in range(n_fpn)])
        self.mask_feature = nn.Conv2d(C, C, 1)
        self.encoder = nn.Module()
        self.encoder.layers = nn.ModuleList(
            [DeformableEncoderLayerT(C, heads, L, n_points, ffn_dim)
             for _ in range(num_layers)])
        self.num_feats = C // 2

    def forward(self, feats):
        L = self.L
        n_in = len(feats)
        B = feats[0].shape[0]
        toks, poss, shapes, refs = [], [], [], []
        for i in range(L):
            f = feats[n_in - 1 - i]
            H, W = f.shape[2], f.shape[3]
            f = self.input_convs[i](f)
            pos = sine_pos_torch((H, W), self.num_feats)
            pos = pos + self.level_encoding.weight[i]
            toks.append(f.flatten(2).transpose(1, 2))
            poss.append(pos.reshape(1, H * W, -1).expand(B, -1, -1))
            shapes.append((H, W))
            ys = (torch.arange(H, dtype=torch.float32) + 0.5) / H
            xs = (torch.arange(W, dtype=torch.float32) + 0.5) / W
            yy, xx = torch.meshgrid(ys, xs, indexing="ij")
            refs.append(torch.stack([xx.reshape(-1), yy.reshape(-1)], -1))
        x = torch.cat(toks, 1)
        pos = torch.cat(poss, 1)
        ref = torch.cat(refs, 0)[None, :, None, :].expand(B, -1, L, -1)
        for layer in self.encoder.layers:
            x = layer(x, pos, ref, shapes)
        outs = []
        start = 0
        for (H, W) in shapes:
            outs.append(x[:, start:start + H * W].transpose(1, 2)
                        .reshape(B, -1, H, W))
            start += H * W
        for i in range(n_in - L - 1, -1, -1):
            lat = self.lateral_convs[i](feats[i])
            y = lat + F.interpolate(outs[-1], size=lat.shape[2:],
                                    mode="bilinear", align_corners=False)
            outs.append(self.output_convs[i](y))
        return self.mask_feature(outs[-1]), outs[:L]


class Mask2FormerHeadT(nn.Module):
    """Key scheme matches the converter; forward matches
    `mask2former_head.py:404-525` (level-cycled memories, per-layer
    forward_head, all-masked-row reset)."""

    def __init__(self, in_channels, C, num_classes, num_queries,
                 num_decoder_layers=9, heads=8, dec_ffn=2048, enc_ffn=1024,
                 enc_heads=8, num_enc_layers=6):
        super().__init__()
        self.heads = heads
        self.L = 3
        self.pixel_decoder = MSDeformAttnPixelDecoderT(
            in_channels, C, num_layers=num_enc_layers, heads=enc_heads,
            ffn_dim=enc_ffn)
        self.query_embed = nn.Embedding(num_queries, C)
        self.query_feat = nn.Embedding(num_queries, C)
        self.level_embed = nn.Embedding(self.L, C)
        self.cls_embed = nn.Linear(C, num_classes + 1)
        self.mask_embed = nn.Sequential(
            nn.Linear(C, C), nn.ReLU(), nn.Linear(C, C), nn.ReLU(),
            nn.Linear(C, C))
        self.transformer_decoder = nn.Module()
        self.transformer_decoder.layers = nn.ModuleList(
            [DetrDecoderLayerT(C, heads, dec_ffn)
             for _ in range(num_decoder_layers)])
        self.transformer_decoder.post_norm = nn.LayerNorm(C)
        self.num_feats = C // 2

    def _forward_head(self, q, mask_feature, attn_size):
        x = self.transformer_decoder.post_norm(q)
        cls_pred = self.cls_embed(x)
        m = self.mask_embed(x)
        mask_pred = torch.einsum("bqc,bchw->bqhw", m, mask_feature)
        am = F.interpolate(mask_pred, size=attn_size, mode="bilinear",
                           align_corners=False)
        B, Q = am.shape[:2]
        am = (am.sigmoid() < 0.5).reshape(B, Q, -1)
        all_masked = am.all(-1, keepdim=True)
        am = am & ~all_masked
        am = am[:, None].expand(B, self.heads, Q, am.shape[-1])
        return cls_pred, mask_pred, am.reshape(B * self.heads, Q, -1)

    def forward(self, feats):
        B = feats[0].shape[0]
        mask_feature, memories = self.pixel_decoder(feats)
        dec_in, dec_pos, sizes = [], [], []
        for i in range(self.L):
            mem = memories[i]
            H, W = mem.shape[2], mem.shape[3]
            x = mem.flatten(2).transpose(1, 2) + self.level_embed.weight[i]
            pos = sine_pos_torch((H, W), self.num_feats)
            dec_in.append(x)
            dec_pos.append(pos.reshape(1, H * W, -1).expand(B, -1, -1))
            sizes.append((H, W))
        q = self.query_feat.weight[None].expand(B, -1, -1)
        q_pos = self.query_embed.weight[None].expand(B, -1, -1)
        cls_list, mask_list = [], []
        cls_pred, mask_pred, am = self._forward_head(q, mask_feature,
                                                     sizes[0])
        cls_list.append(cls_pred)
        mask_list.append(mask_pred)
        for i, layer in enumerate(self.transformer_decoder.layers):
            li = i % self.L
            q = layer(q, q_pos, dec_in[li], dec_pos[li], am)
            cls_pred, mask_pred, am = self._forward_head(
                q, mask_feature, sizes[(i + 1) % self.L])
            cls_list.append(cls_pred)
            mask_list.append(mask_pred)
        return cls_list, mask_list


# ---------------------------------------------------------------------------
# UniPerceiver (UnifiedBertEncoder) trunk + adapter + grounding stack
# Mini-reference of `wsdm2023/mmdet_custom/models/backbones/base/
# uniperceiver.py` + `uniperceiver_adapter.py` + `base/grounding_block.py`,
# key scheme consumed by `convert_uniperceiver_backbone`.
# ---------------------------------------------------------------------------

class JointAttentionT(nn.Module):
    """Self-attention over [image; text]; out_proj on the joint output."""

    def __init__(self, dim, heads):
        super().__init__()
        self.heads = heads
        self.scale = (dim // heads) ** -0.5
        self.in_proj = nn.Linear(dim, 3 * dim, bias=True)
        self.out_proj = nn.Linear(dim, dim)

    def _attend(self, tokens, key_mask=None):
        B, N, C = tokens.shape
        h = self.heads
        qkv = self.in_proj(tokens).reshape(B, N, 3, h, C // h)
        qkv = qkv.permute(2, 0, 3, 1, 4)
        q, k, v = qkv.unbind(0)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        if key_mask is not None:
            attn = attn.masked_fill(
                ~key_mask[:, None, None, :], float("-inf"))
        attn = attn.softmax(-1)
        return (attn @ v).transpose(1, 2).reshape(B, N, C)

    def forward(self, x, q, q_mask, H, W):
        B, N, C = x.shape
        Nq = q.shape[1]
        tokens = torch.cat([x, q], 1)
        mask = None
        if q_mask is not None:
            mask = torch.cat([torch.ones(B, N, dtype=torch.bool),
                              q_mask.bool()], 1)
        out = self.out_proj(self._attend(tokens, mask))
        return out[:, :N], out[:, N:]


class WindowedJointAttentionT(JointAttentionT):
    """Windowed variant: text replicated per window, averaged back."""

    def __init__(self, dim, heads, window_size):
        super().__init__(dim, heads)
        self.ws = window_size

    def forward(self, x, q, q_mask, H, W):
        B, N, C = x.shape
        Nq = q.shape[1]
        ws = self.ws
        H_ = math.ceil(H / ws) * ws
        W_ = math.ceil(W / ws) * ws
        xm = x.view(B, H, W, C)
        xm = F.pad(xm, [0, 0, 0, W_ - W, 0, H_ - H])
        xm = xm.view(B, H_ // ws, ws, W_ // ws, ws, C)
        wnd = xm.permute(0, 1, 3, 2, 4, 5).reshape(B, -1, ws * ws, C)
        L, Nw = wnd.shape[1], ws * ws
        qx = q[:, None].expand(B, L, Nq, C)
        tokens = torch.cat([wnd, qx], 2).reshape(B * L, Nw + Nq, C)
        mask = None
        if q_mask is not None:
            mask = torch.cat([torch.ones(B, Nw, dtype=torch.bool),
                              q_mask.bool()], 1)
            mask = mask[:, None].expand(B, L, Nw + Nq).reshape(B * L, -1)
        out = self._attend(tokens, mask).reshape(B, L, Nw + Nq, C)
        img = out[:, :, :Nw].reshape(B, H_ // ws, W_ // ws, ws, ws, C)
        img = img.permute(0, 1, 3, 2, 4, 5).reshape(B, H_, W_, C)
        img = img[:, :H, :W].reshape(B, N, C)
        txt = out[:, :, Nw:].mean(1)
        return self.out_proj(img), self.out_proj(txt)


class MultiModelBertLayerT(nn.Module):
    def __init__(self, dim, heads, mlp_ratio=4.0, windowed=False,
                 window_size=14):
        super().__init__()
        if windowed:
            self.self_attn = WindowedJointAttentionT(dim, heads, window_size)
        else:
            self.self_attn = JointAttentionT(dim, heads)
        self.linear1 = nn.Linear(dim, int(dim * mlp_ratio))
        self.linear2 = nn.Linear(int(dim * mlp_ratio), dim)
        self.norm1 = nn.LayerNorm(dim)
        self.norm2 = nn.LayerNorm(dim)
        self.gamma_1 = nn.Parameter(torch.zeros(dim))
        self.gamma_2 = nn.Parameter(torch.zeros(dim))

    def forward(self, x, q, q_mask, H, W):
        x_, q_ = self.self_attn(self.norm1(x), self.norm1(q), q_mask, H, W)
        x = x + self.gamma_1 * x_
        q = q + self.gamma_1 * q_
        x_ = self.linear2(F.gelu(self.linear1(self.norm2(x))))
        q_ = self.linear2(F.gelu(self.linear1(self.norm2(q))))
        return x + self.gamma_2 * x_, q + self.gamma_2 * q_


class VisualPatchEmbeddingT(nn.Module):
    def __init__(self, dim, patch_size=16, pretrain_size=224):
        super().__init__()
        g = pretrain_size // patch_size
        self.g = g
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, dim, patch_size, patch_size)
        self.patch_embed.spatial_pos_embed = nn.Embedding(g * g, dim)
        self.patch_embed.temporal_pos_embed = nn.Embedding(8, dim)
        self.embeddings_norm = nn.LayerNorm(dim)

    def forward(self, x):
        t = self.patch_embed.proj(x)
        B, D, H, W = t.shape
        t = t.reshape(B, D, H * W).transpose(1, 2)
        pe = self.patch_embed.spatial_pos_embed.weight
        pe = pe.reshape(1, self.g, self.g, D).permute(0, 3, 1, 2)
        pe = F.interpolate(pe, size=(H, W), mode="bicubic",
                           align_corners=False)
        pe = pe.reshape(1, D, H * W).transpose(1, 2)
        t = t + pe + self.patch_embed.temporal_pos_embed.weight[0]
        return self.embeddings_norm(t), H, W


class TokenBaseEmbeddingT(nn.Module):
    def __init__(self, dim, vocab):
        super().__init__()
        self.embeddings = nn.Embedding(vocab, dim)
        self.embeddings_pos = nn.Module()
        self.embeddings_pos.position_embeddings = nn.Embedding(512, dim)
        self.embeddings_token_type = nn.Embedding(2, dim)
        self.embeddings_norm = nn.LayerNorm(dim)

    def forward(self, ids):
        e = self.embeddings(ids)
        n = ids.shape[1]
        e = e + self.embeddings_pos.position_embeddings.weight[:n]
        e = e + self.embeddings_token_type.weight[0]
        return self.embeddings_norm(e)


class GroundingCrossAttentionT(nn.Module):
    """norm1 SHARED across modalities (grounding_block.py:66)."""

    def __init__(self, dim, heads, mlp_ratio=4.0):
        super().__init__()
        self.heads = heads
        self.scale = (dim // heads) ** -0.5
        self.norm1 = nn.LayerNorm(dim)
        self.attn = nn.Module()
        self.attn.kv = nn.Linear(dim, 2 * dim, bias=True)
        self.attn.q = nn.Linear(dim, dim, bias=True)
        self.attn.proj = nn.Linear(dim, dim)
        self.norm2 = nn.LayerNorm(dim)
        self.mlp = nn.Module()
        self.mlp.fc1 = nn.Linear(dim, int(dim * mlp_ratio))
        self.mlp.fc2 = nn.Linear(int(dim * mlp_ratio), dim)

    def forward(self, x, r):
        B, N, C = x.shape
        M = r.shape[1]
        h = self.heads
        xn, rn = self.norm1(x), self.norm1(r)
        kv = self.attn.kv(rn).reshape(B, M, 2, h, C // h).permute(2, 0, 3, 1, 4)
        k, v = kv.unbind(0)
        q = self.attn.q(xn).reshape(B, N, h, C // h).permute(0, 2, 1, 3)
        attn = (q @ k.transpose(-2, -1)) * self.scale
        attn = attn.softmax(-1)
        o = (attn @ v).transpose(1, 2).reshape(B, N, C)
        x = x + self.attn.proj(o)
        y = self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
        return x + y


class UniPerceiverAdapterT(nn.Module):
    """Full UniPerceiver-Adapter mini-reference (joint img/text trunk)."""

    def __init__(self, dim=48, depth=4, heads=4, mlp_ratio=4.0, vocab=100,
                 patch_size=16, pretrain_size=224, conv_inplane=16,
                 deform_num_heads=4, n_points=4, deform_ratio=1.0,
                 cffn_ratio=0.25, num_cross_attn=0,
                 interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3)),
                 window_attn=False, window_size=14):
        super().__init__()
        self.patch_size = patch_size
        self.interaction_indexes = interaction_indexes
        wa = window_attn if isinstance(window_attn, (list, tuple)) \
            else [window_attn] * depth
        wsz = window_size if isinstance(window_size, (list, tuple)) \
            else [window_size] * depth
        self.layers = nn.ModuleList([
            MultiModelBertLayerT(dim, heads, mlp_ratio, bool(wa[i]),
                                 int(wsz[i] or 14))
            for i in range(depth)])
        self.visual_embed = VisualPatchEmbeddingT(dim, patch_size,
                                                  pretrain_size)
        self.token_embed = TokenBaseEmbeddingT(dim, vocab)
        self.cross_attn = nn.ModuleList([
            GroundingCrossAttentionT(dim, heads)
            for _ in range(num_cross_attn)])
        self.level_embed = nn.Parameter(torch.zeros(3, dim))
        self.spm = SpatialPriorModuleT(conv_inplane, dim)
        n_inter = len(interaction_indexes)
        self.interactions = nn.ModuleList([
            InteractionBlockT(dim, deform_num_heads, n_points, deform_ratio,
                              True, cffn_ratio,
                              extra_extractor=(i == n_inter - 1))
            for i in range(n_inter)])
        self.up = nn.ConvTranspose2d(dim, dim, 2, 2)
        self.norm1 = nn.BatchNorm2d(dim)
        self.norm2 = nn.BatchNorm2d(dim)
        self.norm3 = nn.BatchNorm2d(dim)
        self.norm4 = nn.BatchNorm2d(dim)

    def forward(self, x, ids, q_mask=None):
        B = x.shape[0]
        h_img, w_img = x.shape[2], x.shape[3]
        shapes3 = ((h_img // 8, w_img // 8), (h_img // 16, w_img // 16),
                   (h_img // 32, w_img // 32))
        shapes1 = (shapes3[1],)
        inj_in = (reference_points_torch(shapes1), shapes3)
        ext_in = (reference_points_torch(shapes3), shapes1)

        c1, c2, c3, c4 = self.spm(x)
        c2 = c2 + self.level_embed[0]
        c3 = c3 + self.level_embed[1]
        c4 = c4 + self.level_embed[2]
        c = torch.cat([c2, c3, c4], 1)
        n2, n3 = c2.shape[1], c3.shape[1]

        t, H, W = self.visual_embed(x)
        q = self.token_embed(ids)
        D = t.shape[-1]

        state = {"q": q}
        for i, layer in enumerate(self.interactions):
            a, b = self.interaction_indexes[i]

            def blocks_fn(tokens, _a=a, _b=b):
                for blk in self.layers[_a:_b + 1]:
                    tokens, state["q"] = blk(tokens, state["q"], q_mask,
                                             H, W)
                return tokens

            t, c = layer(t, c, blocks_fn, inj_in, ext_in, H, W)
        q = state["q"]

        for g in self.cross_attn:
            t = g(t, q)

        c2 = c[:, :n2].transpose(1, 2).reshape(B, D, H * 2, W * 2)
        c3 = c[:, n2:n2 + n3].transpose(1, 2).reshape(B, D, H, W)
        c4 = c[:, n2 + n3:].transpose(1, 2).reshape(B, D, H // 2, W // 2)
        c1 = self.up(c2) + c1

        x3 = t.transpose(1, 2).reshape(B, D, H, W)
        up = lambda m, s: F.interpolate(m, scale_factor=s, mode="bilinear",
                                        align_corners=False)
        c1 = c1 + up(x3, 4)
        c2 = c2 + up(x3, 2)
        c3 = c3 + x3
        c4 = c4 + up(x3, 0.5)
        return [self.norm1(c1), self.norm2(c2), self.norm3(c3),
                self.norm4(c4)]


# ---------------------------------------------------------------------------
# DINO two-stage deformable transformer (+ per-layer prediction branches)
# Mini-reference of `wsdm2023/mmdet_custom/models/utils/transformer.py`
# (DinoTransformer / DinoTransformerDecoder) + the branch layout of
# `dense_heads/dino_head.py`, mmdet key scheme under `bbox_head.`.
# ---------------------------------------------------------------------------

class DinoDecoderLayerT(nn.Module):
    """self_attn, norm, deformable cross_attn, norm, ffn, norm."""

    def __init__(self, C, heads, ffn_dim, n_levels=4, n_points=4):
        super().__init__()
        self.attentions = nn.ModuleList(
            [MHAWrapT(C, heads),
             MSDeformAttnT(C, n_levels, heads, n_points)])
        self.norms = nn.ModuleList([nn.LayerNorm(C) for _ in range(3)])
        self.ffns = nn.ModuleList([FFNT2(C, ffn_dim)])

    def forward(self, q, qpos, memory, shapes, refs, attn_mask=None):
        a, _ = self.attentions[0].attn(q + qpos, q + qpos, q,
                                       attn_mask=attn_mask)
        x = self.norms[0](q + a)
        ca = self.attentions[1](x + qpos, refs, memory, shapes)
        x = self.norms[1](x + ca)
        y = self.ffns[0].layers(x)
        return self.norms[2](x + y)


def sine_embed_yx_torch(coords, num_feats):
    """gen_sineembed_for_position: blocks in (y, x, w, h) order."""
    scale = 2 * math.pi
    dim_t = torch.arange(num_feats, dtype=torch.float32)
    dim_t = 10000.0 ** (2 * torch.div(dim_t, 2, rounding_mode="floor")
                        / num_feats)

    def one(v):
        p = v[..., None] * scale / dim_t
        return torch.stack([p[..., 0::2].sin(), p[..., 1::2].cos()],
                           -1).flatten(-2)

    blocks = [one(coords[..., 1]), one(coords[..., 0])]
    if coords.shape[-1] == 4:
        blocks += [one(coords[..., 2]), one(coords[..., 3])]
    return torch.cat(blocks, -1)


class DinoTransformerT(nn.Module):
    def __init__(self, C=48, heads=4, num_enc=2, num_dec=3, n_points=4,
                 ffn_dim=96, num_queries=12, num_classes=5):
        super().__init__()
        self.C, self.heads = C, heads
        self.num_queries = num_queries
        self.num_dec = num_dec
        self.transformer = nn.Module()
        tr = self.transformer
        tr.level_embeds = nn.Parameter(torch.zeros(4, C))
        tr.enc_output = nn.Linear(C, C)
        tr.enc_output_norm = nn.LayerNorm(C)
        tr.query_embed = nn.Embedding(num_queries, C)
        tr.encoder = nn.Module()
        tr.encoder.layers = nn.ModuleList(
            [DeformableEncoderLayerT(C, heads, 4, n_points, ffn_dim)
             for _ in range(num_enc)])
        tr.decoder = nn.Module()
        tr.decoder.layers = nn.ModuleList(
            [DinoDecoderLayerT(C, heads, ffn_dim, 4, n_points)
             for _ in range(num_dec)])
        tr.decoder.norm = nn.LayerNorm(C)
        tr.decoder.ref_point_head = nn.Sequential(
            nn.Linear(2 * C, C), nn.ReLU(), nn.Linear(C, C))
        self.cls_branches = nn.ModuleList(
            [nn.Linear(C, num_classes) for _ in range(num_dec + 1)])
        self.reg_branches = nn.ModuleList([
            nn.Sequential(nn.Linear(C, C), nn.ReLU(), nn.Linear(C, C),
                          nn.ReLU(), nn.Linear(C, 4))
            for _ in range(num_dec + 1)])

    def forward(self, feats, dn_queries=None, dn_refs=None,
                dn_attn_mask=None):
        tr = self.transformer
        C = self.C
        B = feats[0].shape[0]
        toks, poss, shapes, refs_l, props_l = [], [], [], [], []
        for i, f in enumerate(feats):
            H, W = f.shape[2], f.shape[3]
            toks.append(f.flatten(2).transpose(1, 2))
            p = sine_pos_torch((H, W), C // 2).reshape(1, H * W, C)
            poss.append(p + tr.level_embeds[i])
            shapes.append((H, W))
            ys = (torch.arange(H, dtype=torch.float32) + 0.5) / H
            xs = (torch.arange(W, dtype=torch.float32) + 0.5) / W
            yy, xx = torch.meshgrid(ys, xs, indexing="ij")
            grid = torch.stack([xx.reshape(-1), yy.reshape(-1)], -1)
            refs_l.append(grid)
            wh = torch.full_like(grid, 0.05 * (2.0 ** i))
            props_l.append(torch.cat([grid, wh], -1))
        memory = torch.cat(toks, 1)
        pos = torch.cat(poss, 1).expand(B, -1, -1)
        ref = torch.cat(refs_l, 0)[None, :, None, :].expand(B, -1, 4, -1)
        for layer in tr.encoder.layers:
            memory = layer(memory, pos, ref, shapes)

        props = torch.cat(props_l, 0)[None]
        valid = ((props > 0.01) & (props < 0.99)).all(-1, keepdim=True)
        props_unact = torch.log(props / (1 - props)).masked_fill(
            ~valid, float("inf"))
        mem_in = memory.masked_fill(~valid, 0.0)
        out_memory = tr.enc_output_norm(tr.enc_output(mem_in))
        enc_cls = self.cls_branches[-1](out_memory)
        enc_delta = self.reg_branches[-1](out_memory)
        enc_boxes = (enc_delta + props_unact).sigmoid()
        top_idx = enc_cls.max(-1)[0].topk(self.num_queries, dim=1)[1]
        refs = torch.gather(enc_boxes, 1,
                            top_idx[..., None].expand(-1, -1, 4)).detach()
        enc_cls_top = torch.gather(
            enc_cls, 1, top_idx[..., None].expand(-1, -1,
                                                  enc_cls.shape[-1]))
        enc_box_top = torch.gather(enc_boxes, 1,
                                   top_idx[..., None].expand(-1, -1, 4))

        query = tr.query_embed.weight[None].expand(B, -1, -1)
        attn_mask = None
        if dn_queries is not None:
            query = torch.cat([dn_queries, query], 1)
            refs = torch.cat([dn_refs, refs], 1)
            n = refs.shape[1]
            attn_mask = dn_attn_mask[None].expand(
                B * self.heads, n, n) if dn_attn_mask is not None else None

        def inv_sig(x):
            x = x.clamp(1e-3, 1 - 1e-3)
            return torch.log(x / (1 - x))

        cls_list, box_list = [], []
        base = refs
        for i, layer in enumerate(tr.decoder.layers):
            emb = sine_embed_yx_torch(refs, C // 2)
            qpos = tr.decoder.ref_point_head(emb)
            query = layer(query, qpos, memory, shapes,
                          refs[:, :, None, :].expand(-1, -1, 4, -1),
                          attn_mask)
            normed = tr.decoder.norm(query)
            cls_list.append(self.cls_branches[i](normed))
            box_list.append(
                (self.reg_branches[i](normed) + inv_sig(base)).sigmoid())
            new_refs = (self.reg_branches[i](query) + inv_sig(refs)).sigmoid()
            base = new_refs
            refs = new_refs.detach()
        return {"cls": cls_list, "boxes": box_list,
                "enc_cls": enc_cls_top, "enc_boxes": enc_box_top}


# ---------------------------------------------------------------------------
# UperNet decode head + FCN auxiliary head (mmseg key scheme consumed by
# `convert_upernet_heads`). Mini-reference of upstream mmseg UPerHead as
# configured by the reference (`segmentation/configs/_base_/models/
# upernet_r50.py`: pool_scales (1,2,3,6), align_corners=False,
# concat_input=False aux).
# ---------------------------------------------------------------------------

class ConvBNT(nn.Module):
    def __init__(self, cin, cout, kernel):
        super().__init__()
        self.conv = nn.Conv2d(cin, cout, kernel, padding=kernel // 2,
                              bias=False)
        self.bn = nn.BatchNorm2d(cout)

    def forward(self, x):
        return F.relu(self.bn(self.conv(x)))


class UPerHeadT(nn.Module):
    def __init__(self, in_channels, channels, num_classes,
                 pool_scales=(1, 2, 3, 6)):
        super().__init__()
        self.pool_scales = pool_scales
        cin = in_channels
        self.psp_modules = nn.ModuleList([
            nn.Sequential(nn.AdaptiveAvgPool2d(s), ConvBNT(cin, channels, 1))
            for s in pool_scales])
        self.bottleneck = ConvBNT(cin + len(pool_scales) * channels,
                                  channels, 3)
        self.lateral_convs = nn.ModuleList(
            [ConvBNT(cin, channels, 1) for _ in range(3)])
        self.fpn_convs = nn.ModuleList(
            [ConvBNT(channels, channels, 3) for _ in range(3)])
        self.fpn_bottleneck = ConvBNT(4 * channels, channels, 3)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, feats):
        x = feats[-1]
        size = x.shape[2:]
        psp = [x] + [
            F.interpolate(m(x), size=size, mode="bilinear",
                          align_corners=False) for m in self.psp_modules]
        psp = self.bottleneck(torch.cat(psp, 1))
        laterals = [conv(feats[i])
                    for i, conv in enumerate(self.lateral_convs)] + [psp]
        for i in range(len(laterals) - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + F.interpolate(
                laterals[i], size=laterals[i - 1].shape[2:], mode="bilinear",
                align_corners=False)
        outs = [self.fpn_convs[i](laterals[i]) for i in range(3)]
        outs.append(laterals[-1])
        outs = [outs[0]] + [
            F.interpolate(o, size=outs[0].shape[2:], mode="bilinear",
                          align_corners=False) for o in outs[1:]]
        x = self.fpn_bottleneck(torch.cat(outs, 1))
        return self.conv_seg(x)


class FCNHeadT(nn.Module):
    def __init__(self, in_channels, channels, num_classes, num_convs=1):
        super().__init__()
        convs = [ConvBNT(in_channels if i == 0 else channels, channels, 3)
                 for i in range(num_convs)]
        self.convs = nn.ModuleList(convs)
        self.conv_seg = nn.Conv2d(channels, num_classes, 1)

    def forward(self, x):
        for c in self.convs:
            x = c(x)
        return self.conv_seg(x)


# ---------------------------------------------------------------------------
# MaskFormer head + plain/encoder pixel decoders (mmseg key scheme consumed
# by `convert_maskformer_head`). Reference `decode_heads/maskformer_head.py`
# + `plugins/pixel_decoder.py` — DETR decoder with SELF-attention first and
# nearest-mode FPN top-down interpolation.
# ---------------------------------------------------------------------------

class MaskFormerDecoderLayerT(nn.Module):
    def __init__(self, C, heads, ffn_dim):
        super().__init__()
        self.attentions = nn.ModuleList(
            [MHAWrapT(C, heads), MHAWrapT(C, heads)])
        self.norms = nn.ModuleList([nn.LayerNorm(C) for _ in range(3)])
        self.ffns = nn.ModuleList([FFNT2(C, ffn_dim)])

    def forward(self, q, qpos, k, kpos):
        a, _ = self.attentions[0].attn(q + qpos, q + qpos, q)
        x = self.norms[0](q + a)
        a, _ = self.attentions[1].attn(x + qpos, k + kpos, k)
        x = self.norms[1](x + a)
        y = self.ffns[0].layers(x)
        return self.norms[2](x + y)


class TransformerEncoderPixelDecoderT(nn.Module):
    def __init__(self, in_channels, C, num_layers=6, heads=8, ffn_dim=2048):
        super().__init__()
        n = len(in_channels)
        self.lateral_convs = nn.ModuleList(
            [ConvGNT(in_channels[i], C, 1) for i in range(n - 1)])
        self.output_convs = nn.ModuleList(
            [ConvGNT(C, C, 3, act=True) for _ in range(n - 1)])
        self.encoder_in_proj = nn.Conv2d(in_channels[-1], C, 1)
        self.encoder_out_proj = ConvGNT(C, C, 3, act=True)
        self.encoder = nn.Module()
        self.encoder.layers = nn.ModuleList([
            _EncLayerT(C, heads, ffn_dim) for _ in range(num_layers)])
        self.mask_feature = nn.Conv2d(C, C, 3, padding=1)
        self.num_feats = C // 2

    def forward(self, feats):
        f = feats[-1]
        B, _, H, W = f.shape
        x = self.encoder_in_proj(f).flatten(2).transpose(1, 2)
        pos = sine_pos_torch((H, W), self.num_feats).reshape(1, H * W, -1)
        for layer in self.encoder.layers:
            x = layer(x, pos)
        memory = x.transpose(1, 2).reshape(B, -1, H, W)
        y = self.encoder_out_proj(memory)
        for i in range(len(feats) - 2, -1, -1):
            lat = self.lateral_convs[i](feats[i])
            y = lat + F.interpolate(y, size=lat.shape[2:], mode="nearest")
            y = self.output_convs[i](y)
        return self.mask_feature(y), memory


class _EncLayerT(nn.Module):
    """DetrTransformerEncoderLayer: self_attn (q/k get pos, v does not),
    norm, ffn, norm."""

    def __init__(self, C, heads, ffn_dim):
        super().__init__()
        self.attentions = nn.ModuleList([MHAWrapT(C, heads)])
        self.norms = nn.ModuleList([nn.LayerNorm(C) for _ in range(2)])
        self.ffns = nn.ModuleList([FFNT2(C, ffn_dim)])

    def forward(self, x, pos):
        a, _ = self.attentions[0].attn(x + pos, x + pos, x)
        x = self.norms[0](x + a)
        y = self.ffns[0].layers(x)
        return self.norms[1](x + y)


class MaskFormerHeadT(nn.Module):
    def __init__(self, in_channels, C, num_classes, num_queries,
                 num_dec=6, heads=8, dec_ffn=2048, enc_layers=6,
                 enc_ffn=2048):
        super().__init__()
        self.pixel_decoder = TransformerEncoderPixelDecoderT(
            in_channels, C, enc_layers, heads, enc_ffn)
        self.query_embed = nn.Embedding(num_queries, C)
        self.transformer_decoder = nn.Module()
        self.transformer_decoder.layers = nn.ModuleList(
            [MaskFormerDecoderLayerT(C, heads, dec_ffn)
             for _ in range(num_dec)])
        self.transformer_decoder.post_norm = nn.LayerNorm(C)
        self.cls_embed = nn.Linear(C, num_classes + 1)
        self.mask_embed = nn.Sequential(
            nn.Linear(C, C), nn.ReLU(), nn.Linear(C, C), nn.ReLU(),
            nn.Linear(C, C))
        self.num_feats = C // 2

    def forward(self, feats):
        B = feats[0].shape[0]
        mask_feature, memory = self.pixel_decoder(feats)
        H, W = memory.shape[2:]
        mem = memory.flatten(2).transpose(1, 2)
        pos = sine_pos_torch((H, W), self.num_feats).reshape(1, H * W, -1)
        q = torch.zeros(B, self.query_embed.weight.shape[0],
                        mem.shape[-1])
        qpos = self.query_embed.weight[None].expand(B, -1, -1)
        cls_list, mask_list = [], []
        for layer in self.transformer_decoder.layers:
            q = layer(q, qpos, mem, pos)
            x = self.transformer_decoder.post_norm(q)
            cls_list.append(self.cls_embed(x))
            m = self.mask_embed(x)
            mask_list.append(torch.einsum("bqc,bchw->bqhw", m, mask_feature))
        return cls_list, mask_list
