"""Torch checkpoint -> flax variables converter, plus orbax train-state IO.

Parity target: the reference smart loader
(`detection/mmcv_custom/checkpoint.py:312-497`): root-key detection
(state_dict/model/module), `module.`/`backbone.` prefix stripping, and weight
layout conversion. Positional-embedding resampling is handled at runtime in
the model (`models/vit.py:resample_abs_pos_embed`), matching torch bicubic
exactly, so the converter stores tables as-is.

Layout rules:
  torch Linear  (out, in)        -> flax Dense kernel (in, out)
  torch Conv2d  (O, I, kh, kw)   -> flax Conv kernel (kh, kw, I, O)
  torch depthwise Conv2d (C,1,k,k) -> flax kernel (k, k, 1, C)
  torch ConvTranspose2d (I,O,kh,kw) -> flax ConvTranspose kernel (kh,kw,I,O)
  torch LN/BN weight/bias        -> scale/bias (+ batch_stats mean/var)
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import numpy as np


def _t(w):  # torch tensor/np -> np
    return np.asarray(w.detach().cpu().numpy() if hasattr(w, "detach") else w)


def linear(w):
    return _t(w).T


def conv(w):
    return _t(w).transpose(2, 3, 1, 0)


def dwconv(w):
    # torch (C, 1, kh, kw) -> flax (kh, kw, 1, C) for feature_group_count=C
    return _t(w).transpose(2, 3, 1, 0)


def conv_transpose(w):
    # torch (in, out, kh, kw) -> flax (kh, kw, in, out) with spatial flip:
    # flax ConvTranspose (transpose_kernel=False) runs a fractionally-strided
    # forward conv, so torch's gradient-style kernel must be mirrored.
    return _t(w).transpose(2, 3, 0, 1)[::-1, ::-1].copy()


def unwrap_state_dict(ckpt) -> Dict[str, Any]:
    """Root-key detection + prefix stripping (reference checkpoint.py:332-350)."""
    sd = ckpt
    for key in ("state_dict", "model", "module"):
        if isinstance(sd, dict) and key in sd and isinstance(sd[key], dict):
            sd = sd[key]
    out = {}
    for k, v in sd.items():
        for pre in ("module.", "encoder."):
            if k.startswith(pre):
                k = k[len(pre):]
        out[k] = v
    return out


def _set(tree: dict, path: Tuple[str, ...], value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


class ConversionError(KeyError):
    pass


def convert_vit_adapter_backbone(sd: Dict[str, Any], prefix: str = ""):
    """Convert a reference ViTAdapter state_dict subtree -> (params, batch_stats).

    `prefix` is e.g. 'backbone.' for full-segmentor checkpoints.
    Key scheme documented from reference `vit_adapter.py:21-56`,
    `adapter_modules.py`, `base/vit.py`.
    """
    params: dict = {}
    stats: dict = {}
    unused = []

    def bn(src: str, dst: Tuple[str, ...]):
        _set(params, dst + ("scale",), _t(sd[src + ".weight"]))
        _set(params, dst + ("bias",), _t(sd[src + ".bias"]))
        _set(stats, dst + ("mean",), _t(sd[src + ".running_mean"]))
        _set(stats, dst + ("var",), _t(sd[src + ".running_var"]))

    def ln(src: str, dst: Tuple[str, ...]):
        _set(params, dst + ("scale",), _t(sd[src + ".weight"]))
        _set(params, dst + ("bias",), _t(sd[src + ".bias"]))

    def dense(src: str, dst: Tuple[str, ...]):
        _set(params, dst + ("kernel",), linear(sd[src + ".weight"]))
        if src + ".bias" in sd:
            _set(params, dst + ("bias",), _t(sd[src + ".bias"]))

    def conv2d(src: str, dst: Tuple[str, ...], tf=conv, bias=True):
        _set(params, dst + ("kernel",), tf(sd[src + ".weight"]))
        if bias and src + ".bias" in sd:
            _set(params, dst + ("bias",), _t(sd[src + ".bias"]))

    def msda(src: str, dst: Tuple[str, ...]):
        for name in ("sampling_offsets", "attention_weights", "value_proj",
                     "output_proj"):
            dense(f"{src}.{name}", dst + (name,))

    def extractor(src: str, dst: Tuple[str, ...]):
        ln(src + ".query_norm", dst + ("query_norm",))
        ln(src + ".feat_norm", dst + ("feat_norm",))
        msda(src + ".attn", dst + ("attn",))
        if src + ".ffn_norm.weight" in sd:
            ln(src + ".ffn_norm", dst + ("ffn_norm",))
            dense(src + ".ffn.fc1", dst + ("ffn", "fc1"))
            dense(src + ".ffn.fc2", dst + ("ffn", "fc2"))
            conv2d(src + ".ffn.dwconv.dwconv", dst + ("ffn", "dwconv", "dwconv"),
                   tf=dwconv)

    p = prefix
    # --- ViT trunk ---
    _set(params, ("vit", "pos_embed"), _t(sd[p + "pos_embed"]))
    conv2d(p + "patch_embed.proj", ("vit", "patch_embed", "proj"))
    depth = 0
    while f"{p}blocks.{depth}.norm1.weight" in sd:
        depth += 1
    for i in range(depth):
        src = f"{p}blocks.{i}"
        dst = ("vit", f"blocks_{i}")
        ln(src + ".norm1", dst + ("norm1",))
        ln(src + ".norm2", dst + ("norm2",))
        dense(src + ".attn.qkv", dst + ("attn", "qkv"))
        dense(src + ".attn.proj", dst + ("attn", "proj"))
        dense(src + ".mlp.fc1", dst + ("mlp", "fc1"))
        dense(src + ".mlp.fc2", dst + ("mlp", "fc2"))
        if src + ".gamma1" in sd:
            _set(params, dst + ("gamma1",), _t(sd[src + ".gamma1"]))
            _set(params, dst + ("gamma2",), _t(sd[src + ".gamma2"]))
        if src + ".residual.conv1.weight" in sd:
            r = dst + ("residual",)
            for j in (1, 2, 3):
                conv2d(f"{src}.residual.conv{j}", r + (f"conv{j}",), bias=False)
            for j in (1, 2):
                _set(params, r + (f"norm{j}", "weight"),
                     _t(sd[f"{src}.residual.norm{j}.weight"]))
                _set(params, r + (f"norm{j}", "bias"),
                     _t(sd[f"{src}.residual.norm{j}.bias"]))
            _set(params, r + ("norm3_weight",), _t(sd[src + ".residual.norm3.weight"]))
            _set(params, r + ("norm3_bias",), _t(sd[src + ".residual.norm3.bias"]))

    # --- adapter ---
    convert_adapter_keys(sd, p, params, stats)
    return params, stats


def convert_adapter_keys(sd: Dict[str, Any], p: str, params: dict,
                         stats: dict) -> None:
    """Adapter-side keys shared by ViTAdapter / BEiTAdapter / UniPerceiver-
    Adapter (level_embed, spm, interactions, up, out-norms)."""

    def bn(src, dst):
        _set(params, dst + ("scale",), _t(sd[src + ".weight"]))
        _set(params, dst + ("bias",), _t(sd[src + ".bias"]))
        _set(stats, dst + ("mean",), _t(sd[src + ".running_mean"]))
        _set(stats, dst + ("var",), _t(sd[src + ".running_var"]))

    def ln(src, dst):
        _set(params, dst + ("scale",), _t(sd[src + ".weight"]))
        _set(params, dst + ("bias",), _t(sd[src + ".bias"]))

    def dense(src, dst):
        _set(params, dst + ("kernel",), linear(sd[src + ".weight"]))
        if src + ".bias" in sd:
            _set(params, dst + ("bias",), _t(sd[src + ".bias"]))

    def conv2d(src, dst, tf=conv, bias=True):
        _set(params, dst + ("kernel",), tf(sd[src + ".weight"]))
        if bias and src + ".bias" in sd:
            _set(params, dst + ("bias",), _t(sd[src + ".bias"]))

    def msda(src, dst):
        for name in ("sampling_offsets", "attention_weights", "value_proj",
                     "output_proj"):
            dense(f"{src}.{name}", dst + (name,))

    def extractor(src, dst):
        ln(src + ".query_norm", dst + ("query_norm",))
        ln(src + ".feat_norm", dst + ("feat_norm",))
        msda(src + ".attn", dst + ("attn",))
        if src + ".ffn_norm.weight" in sd:
            ln(src + ".ffn_norm", dst + ("ffn_norm",))
            dense(src + ".ffn.fc1", dst + ("ffn", "fc1"))
            dense(src + ".ffn.fc2", dst + ("ffn", "fc2"))
            conv2d(src + ".ffn.dwconv.dwconv",
                   dst + ("ffn", "dwconv", "dwconv"), tf=dwconv)

    _set(params, ("level_embed",), _t(sd[p + "level_embed"]))
    stem_convs = {0: "stem1", 3: "stem2", 6: "stem3"}
    for t_idx, name in stem_convs.items():
        conv2d(f"{p}spm.stem.{t_idx}", ("spm", f"{name}_conv"), bias=False)
        bn(f"{p}spm.stem.{t_idx + 1}", ("spm", f"{name}_bn"))
    for c in (2, 3, 4):
        conv2d(f"{p}spm.conv{c}.0", ("spm", f"conv{c}_conv"), bias=False)
        bn(f"{p}spm.conv{c}.1", ("spm", f"conv{c}_bn"))
    for f in (1, 2, 3, 4):
        conv2d(f"{p}spm.fc{f}", ("spm", f"fc{f}"))

    n_inter = 0
    while f"{p}interactions.{n_inter}.injector.gamma" in sd:
        n_inter += 1
    for i in range(n_inter):
        src = f"{p}interactions.{i}"
        dst = (f"interactions_{i}",)
        ln(src + ".injector.query_norm", dst + ("injector", "query_norm"))
        ln(src + ".injector.feat_norm", dst + ("injector", "feat_norm"))
        msda(src + ".injector.attn", dst + ("injector", "attn"))
        _set(params, dst + ("injector", "gamma"),
             _t(sd[src + ".injector.gamma"]))
        extractor(src + ".extractor", dst + ("extractor",))
        for j in (0, 1):
            if f"{src}.extra_extractors.{j}.query_norm.weight" in sd:
                extractor(f"{src}.extra_extractors.{j}",
                          dst + (f"extra_extractors_{j}",))

    if p + "up.weight" in sd:  # only when 0 in out_indices (uniperceiver)
        conv2d(p + "up", ("up",), tf=conv_transpose)
    for n in (1, 2, 3, 4):
        if f"{p}norm{n}.weight" in sd:
            bn(f"{p}norm{n}", (f"norm{n}",))


def resample_rel_pos_table(table: np.ndarray, src_grid: int, dst_grid: int,
                           n_extra: int = 3) -> np.ndarray:
    """Geometric-progression cubic resampling of a BEiT relative-position bias
    table ((2g-1)^2 + n_extra, heads) from grid g=src to g=dst.

    Reproduces the reference loader (`detection/mmcv_custom/checkpoint.py:
    396-445`): source coordinates follow a geometric progression (binary
    search for ratio q so the cumulative span reaches the target half-window),
    then per-head bicubic interpolation on the non-uniform grid; the n_extra
    cls entries are carried over unchanged.
    """
    from scipy import interpolate

    if src_grid == dst_grid:
        return table
    src = 2 * src_grid - 1
    dst = 2 * dst_grid - 1
    heads = table.shape[1]
    extra = table[src * src:]
    body = table[: src * src]

    def geometric_positions(size, target):
        # find q with sum_{i=1..size//2} q^i == target (reference binary search)
        left, right = 1.01, 1.5
        while right - left > 1e-6:
            q = (left + right) / 2.0
            gp = (q ** np.arange(1, size // 2 + 1)).sum()
            if gp > target:
                right = q
            else:
                left = q
        q = (left + right) / 2.0
        dis = np.cumsum(q ** np.arange(1, size // 2 + 1))
        return np.concatenate([-dis[::-1], [0.0], dis])

    x = geometric_positions(src, dst // 2.0)
    t = dst // 2.0
    dx = np.arange(-t, t + 0.1, 1.0)
    out = np.zeros((dst * dst, heads), np.float32)
    for h in range(heads):
        z = body[:, h].reshape(src, src).astype(np.float64)
        f = interpolate.RectBivariateSpline(x, x, z, kx=3, ky=3)
        out[:, h] = f(dx, dx).reshape(-1).astype(np.float32)
    return np.concatenate([out, extra], axis=0)


def convert_beit_backbone(sd: Dict[str, Any], prefix: str = "",
                          target_grid: Optional[int] = None):
    """Convert a reference BEiTAdapter/BEiT state_dict subtree.

    Key scheme from reference `segmentation/.../base/beit.py` and
    `beit_adapter.py`. If `target_grid` is given, per-block
    relative_position_bias_table entries are geometrically resampled to the
    model's grid (reference loader behavior at non-pretrain resolutions).
    """
    params: dict = {}
    stats: dict = {}
    p = prefix

    def ln(src, dst):
        _set(params, dst + ("scale",), _t(sd[src + ".weight"]))
        _set(params, dst + ("bias",), _t(sd[src + ".bias"]))

    def dense(src, dst):
        _set(params, dst + ("kernel",), linear(sd[src + ".weight"]))
        if src + ".bias" in sd:
            _set(params, dst + ("bias",), _t(sd[src + ".bias"]))

    _set(params, ("beit", "cls_token"), _t(sd[p + "cls_token"]))
    _set(params, ("beit", "patch_embed", "proj", "kernel"),
         conv(sd[p + "patch_embed.proj.weight"]))
    _set(params, ("beit", "patch_embed", "proj", "bias"),
         _t(sd[p + "patch_embed.proj.bias"]))
    if p + "pos_embed" in sd:
        _set(params, ("beit", "pos_embed"), _t(sd[p + "pos_embed"]))

    depth = 0
    while f"{p}blocks.{depth}.norm1.weight" in sd:
        depth += 1
    for i in range(depth):
        src = f"{p}blocks.{i}"
        dst = ("beit", f"blocks_{i}")
        ln(src + ".norm1", dst + ("norm1",))
        ln(src + ".norm2", dst + ("norm2",))
        _set(params, dst + ("attn", "qkv", "kernel"),
             linear(sd[src + ".attn.qkv.weight"]))
        _set(params, dst + ("attn", "q_bias"), _t(sd[src + ".attn.q_bias"]))
        _set(params, dst + ("attn", "v_bias"), _t(sd[src + ".attn.v_bias"]))
        dense(src + ".attn.proj", dst + ("attn", "proj"))
        dense(src + ".mlp.fc1", dst + ("mlp", "fc1"))
        dense(src + ".mlp.fc2", dst + ("mlp", "fc2"))
        _set(params, dst + ("gamma_1",), _t(sd[src + ".gamma_1"]))
        _set(params, dst + ("gamma_2",), _t(sd[src + ".gamma_2"]))
        tkey = src + ".attn.relative_position_bias_table"
        if tkey in sd:
            table = _t(sd[tkey])
            if target_grid is not None:
                n = table.shape[0]
                n_extra = 3 if int(np.sqrt(n - 3)) ** 2 == n - 3 else 0
                src_grid = (int(np.sqrt(n - n_extra)) + 1) // 2
                table = resample_rel_pos_table(table, src_grid, target_grid,
                                               n_extra)
            _set(params, dst + ("attn", "relative_position_bias_table"), table)

    # adapter keys (shared scheme with ViTAdapter)
    if p + "level_embed" in sd:
        convert_adapter_keys(sd, p, params, stats)
    return params, stats


def convert_upernet_heads(sd: Dict[str, Any]):
    """Convert mmseg UPerHead (+FCNHead aux) keys -> (params, batch_stats).

    mmseg naming: decode_head.{psp_modules.N.1, bottleneck, lateral_convs.N,
    fpn_convs.N, fpn_bottleneck, conv_seg}, auxiliary_head.{convs.N, conv_seg}.
    """
    params: dict = {}
    stats: dict = {}

    def cbr(src: str, dst: Tuple[str, ...]):
        _set(params, dst + ("conv", "kernel"), conv(sd[src + ".conv.weight"]))
        _set(params, dst + ("bn", "scale"), _t(sd[src + ".bn.weight"]))
        _set(params, dst + ("bn", "bias"), _t(sd[src + ".bn.bias"]))
        _set(stats, dst + ("bn", "mean"), _t(sd[src + ".bn.running_mean"]))
        _set(stats, dst + ("bn", "var"), _t(sd[src + ".bn.running_var"]))

    d = "decode_head"
    i = 0
    while f"{d}.psp_modules.{i}.1.conv.weight" in sd:
        cbr(f"{d}.psp_modules.{i}.1", (d, "psp", f"pool_{i}"))
        i += 1
    cbr(f"{d}.bottleneck", (d, "psp_bottleneck"))
    i = 0
    while f"{d}.lateral_convs.{i}.conv.weight" in sd:
        cbr(f"{d}.lateral_convs.{i}", (d, f"lateral_{i}"))
        cbr(f"{d}.fpn_convs.{i}", (d, f"fpn_conv_{i}"))
        i += 1
    cbr(f"{d}.fpn_bottleneck", (d, "fpn_bottleneck"))
    _set(params, (d, "conv_seg", "kernel"), conv(sd[f"{d}.conv_seg.weight"]))
    _set(params, (d, "conv_seg", "bias"), _t(sd[f"{d}.conv_seg.bias"]))

    a = "auxiliary_head"
    if f"{a}.conv_seg.weight" in sd:
        i = 0
        while f"{a}.convs.{i}.conv.weight" in sd:
            cbr(f"{a}.convs.{i}", (a, f"conv_{i}"))
            i += 1
        _set(params, (a, "conv_seg", "kernel"), conv(sd[f"{a}.conv_seg.weight"]))
        _set(params, (a, "conv_seg", "bias"), _t(sd[f"{a}.conv_seg.bias"]))
    return params, stats


def convert_mask2former_head(sd: Dict[str, Any], prefix: str = "decode_head."):
    """Convert mmseg Mask2FormerHead keys -> (params, batch_stats).

    Key scheme from reference `mmseg_custom/models/decode_heads/
    mask2former_head.py:95-126` (query/level embeddings, 9 DetrTransformer
    DecoderLayers with nn.MultiheadAttention, cls/mask embeds) and
    `plugins/msdeformattn_pixel_decoder.py:79-130` (input/lateral/output
    ConvModules, 6-layer deformable encoder, mask_feature conv). The encoder
    layers land STACKED on axis 0 (our pixel decoder runs them via nn.scan).
    """
    params: dict = {}
    stats: dict = {}
    p = prefix

    def ln(src, dst):
        _set(params, dst + ("scale",), _t(sd[src + ".weight"]))
        _set(params, dst + ("bias",), _t(sd[src + ".bias"]))

    def dense(src, dst):
        _set(params, dst + ("kernel",), linear(sd[src + ".weight"]))
        if src + ".bias" in sd:
            _set(params, dst + ("bias",), _t(sd[src + ".bias"]))

    def conv_gn(src, dst):
        _set(params, dst + ("conv", "kernel"), conv(sd[src + ".conv.weight"]))
        if src + ".conv.bias" in sd:
            _set(params, dst + ("conv", "bias"), _t(sd[src + ".conv.bias"]))
        _set(params, dst + ("gn", "scale"), _t(sd[src + ".gn.weight"]))
        _set(params, dst + ("gn", "bias"), _t(sd[src + ".gn.bias"]))

    def mha(src, dst):
        # torch nn.MultiheadAttention: in_proj_weight rows are [q; k; v]
        w = _t(sd[src + ".attn.in_proj_weight"])
        b = _t(sd[src + ".attn.in_proj_bias"])
        C = w.shape[1]
        for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
            _set(params, dst + (name, "kernel"), w[i * C:(i + 1) * C].T)
            _set(params, dst + (name, "bias"), b[i * C:(i + 1) * C])
        dense(src + ".attn.out_proj", dst + ("out_proj",))

    # --- embeddings / heads ---
    _set(params, ("query_embed",), _t(sd[p + "query_embed.weight"]))
    _set(params, ("query_feat",), _t(sd[p + "query_feat.weight"]))
    _set(params, ("level_embed",), _t(sd[p + "level_embed.weight"]))
    dense(p + "cls_embed", ("cls_embed",))
    for i, t_idx in enumerate((0, 2, 4)):  # Sequential(Linear,ReLU,...)
        dense(f"{p}mask_embed.{t_idx}", (f"mask_embed_{i}",))
    ln(p + "transformer_decoder.post_norm", ("post_norm",))

    # --- transformer decoder layers (cross_attn, norm, self_attn, norm,
    # ffn, norm -> attentions.0=cross, attentions.1=self) ---
    n_dec = 0
    while f"{p}transformer_decoder.layers.{n_dec}.norms.0.weight" in sd:
        n_dec += 1
    for i in range(n_dec):
        src = f"{p}transformer_decoder.layers.{i}"
        dst = (f"decoder_layer_{i}",)
        mha(src + ".attentions.0", dst + ("cross_attn",))
        mha(src + ".attentions.1", dst + ("self_attn",))
        for j in (0, 1, 2):
            ln(f"{src}.norms.{j}", dst + (f"norm{j + 1}",))
        dense(src + ".ffns.0.layers.0.0", dst + ("ffn_fc1",))
        dense(src + ".ffns.0.layers.1", dst + ("ffn_fc2",))

    # --- pixel decoder ---
    pd = p + "pixel_decoder."
    pp = ("pixel_decoder",)
    _set(params, pp + ("level_encoding",), _t(sd[pd + "level_encoding.weight"]))
    i = 0
    while f"{pd}input_convs.{i}.conv.weight" in sd:
        conv_gn(f"{pd}input_convs.{i}", pp + (f"input_conv_{i}",))
        i += 1
    i = 0
    while f"{pd}lateral_convs.{i}.conv.weight" in sd:
        conv_gn(f"{pd}lateral_convs.{i}", pp + (f"lateral_conv_{i}",))
        conv_gn(f"{pd}output_convs.{i}", pp + (f"output_conv_{i}",))
        i += 1
    _set(params, pp + ("mask_feature", "kernel"),
         conv(sd[pd + "mask_feature.weight"]))
    _set(params, pp + ("mask_feature", "bias"), _t(sd[pd + "mask_feature.bias"]))

    # encoder layers: per-layer torch weights -> stacked (L, ...) scan params
    n_enc = 0
    while f"{pd}encoder.layers.{n_enc}.norms.0.weight" in sd:
        n_enc += 1
    per_layer: list = []
    for li in range(n_enc):
        lp: dict = {}
        lsrc = f"{pd}encoder.layers.{li}"

        def ldense(src, dst):
            _set(lp, dst + ("kernel",), linear(sd[src + ".weight"]))
            _set(lp, dst + ("bias",), _t(sd[src + ".bias"]))

        for name in ("sampling_offsets", "attention_weights", "value_proj",
                     "output_proj"):
            ldense(f"{lsrc}.attentions.0.{name}", ("attn", name))
        for j, norm in ((0, "norm1"), (1, "norm2")):
            _set(lp, (norm, "scale"), _t(sd[f"{lsrc}.norms.{j}.weight"]))
            _set(lp, (norm, "bias"), _t(sd[f"{lsrc}.norms.{j}.bias"]))
        ldense(f"{lsrc}.ffns.0.layers.0.0", ("ffn_fc1",))
        ldense(f"{lsrc}.ffns.0.layers.1", ("ffn_fc2",))
        per_layer.append(lp)
    if per_layer:
        import jax

        stacked = jax.tree_util.tree_map(
            lambda *xs: np.stack(xs, axis=0), *per_layer)
        _set(params, pp + ("encoder_layers",), {"layer": stacked})
    return params, stats


def convert_maskformer_head(sd: Dict[str, Any], prefix: str = "decode_head."):
    """Convert mmseg MaskFormerHead keys -> flax `heads.maskformer` params.

    Reference `mmseg_custom/models/decode_heads/maskformer_head.py` +
    `plugins/pixel_decoder.py` (plain FPN or TransformerEncoder variant)."""
    params: dict = {}
    p = prefix

    def ln(src, dst):
        _set(params, dst + ("scale",), _t(sd[src + ".weight"]))
        _set(params, dst + ("bias",), _t(sd[src + ".bias"]))

    def dense(src, dst):
        _set(params, dst + ("kernel",), linear(sd[src + ".weight"]))
        if src + ".bias" in sd:
            _set(params, dst + ("bias",), _t(sd[src + ".bias"]))

    def conv_gn(src, dst):
        _set(params, dst + ("conv", "kernel"), conv(sd[src + ".conv.weight"]))
        if src + ".conv.bias" in sd:
            _set(params, dst + ("conv", "bias"), _t(sd[src + ".conv.bias"]))
        _set(params, dst + ("gn", "scale"), _t(sd[src + ".gn.weight"]))
        _set(params, dst + ("gn", "bias"), _t(sd[src + ".gn.bias"]))

    def mha(src, dst):
        w = _t(sd[src + ".attn.in_proj_weight"])
        b = _t(sd[src + ".attn.in_proj_bias"])
        C = w.shape[1]
        for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
            _set(params, dst + (name, "kernel"), w[i * C:(i + 1) * C].T)
            _set(params, dst + (name, "bias"), b[i * C:(i + 1) * C])
        dense(src + ".attn.out_proj", dst + ("out_proj",))

    pd = p + "pixel_decoder."
    pp = ("pixel_decoder",)
    i = 0
    while f"{pd}lateral_convs.{i}.conv.weight" in sd:
        conv_gn(f"{pd}lateral_convs.{i}", pp + (f"lateral_{i}",))
        conv_gn(f"{pd}output_convs.{i}", pp + (f"output_{i}",))
        i += 1
    if pd + "last_feat_conv.conv.weight" in sd:
        conv_gn(pd + "last_feat_conv", pp + ("last_conv",))
    _set(params, pp + ("mask_feature", "kernel"),
         conv(sd[pd + "mask_feature.weight"]))
    _set(params, pp + ("mask_feature", "bias"),
         _t(sd[pd + "mask_feature.bias"]))
    if pd + "encoder_in_proj.weight" in sd:
        _set(params, pp + ("encoder_in_proj", "kernel"),
             conv(sd[pd + "encoder_in_proj.weight"]))
        _set(params, pp + ("encoder_in_proj", "bias"),
             _t(sd[pd + "encoder_in_proj.bias"]))
        conv_gn(pd + "encoder_out_proj", pp + ("last_conv",))
        i = 0
        while f"{pd}encoder.layers.{i}.norms.0.weight" in sd:
            src = f"{pd}encoder.layers.{i}"
            mha(src + ".attentions.0", pp + (f"enc_attn_{i}",))
            ln(src + ".norms.0", pp + (f"enc_norm1_{i}",))
            ln(src + ".norms.1", pp + (f"enc_norm2_{i}",))
            dense(src + ".ffns.0.layers.0.0", pp + (f"enc_fc1_{i}",))
            dense(src + ".ffns.0.layers.1", pp + (f"enc_fc2_{i}",))
            i += 1

    _set(params, ("query_embed",), _t(sd[p + "query_embed.weight"]))
    dense(p + "cls_embed", ("cls_embed",))
    for i, t_idx in enumerate((0, 2, 4)):
        dense(f"{p}mask_embed.{t_idx}", (f"mask_embed_{i}",))
    ln(p + "transformer_decoder.post_norm", ("post_norm",))
    i = 0
    while f"{p}transformer_decoder.layers.{i}.norms.0.weight" in sd:
        src = f"{p}transformer_decoder.layers.{i}"
        dst = (f"decoder_layer_{i}",)
        # MaskFormer order: attentions.0 = self, attentions.1 = cross
        mha(src + ".attentions.0", dst + ("self_attn",))
        mha(src + ".attentions.1", dst + ("cross_attn",))
        for j in (0, 1, 2):
            ln(f"{src}.norms.{j}", dst + (f"norm{j + 1}",))
        dense(src + ".ffns.0.layers.0.0", dst + ("ffn_fc1",))
        dense(src + ".ffns.0.layers.1", dst + ("ffn_fc2",))
        i += 1
    return params


def convert_dino_head(sd: Dict[str, Any], prefix: str = "bbox_head."):
    """Convert a reference DINOHead subtree (mmdet key scheme:
    `bbox_head.transformer.{encoder,decoder,enc_output,query_embed}`,
    `bbox_head.{cls,reg}_branches`) -> flax `det.dino.DinoTransformer`
    params. Reference `wsdm2023/mmdet_custom/models/utils/transformer.py:30,
    145` + `dense_heads/dino_head.py:16`."""
    params: dict = {}
    p = prefix
    tr = p + "transformer."

    def ln(src, dst):
        _set(params, dst + ("scale",), _t(sd[src + ".weight"]))
        _set(params, dst + ("bias",), _t(sd[src + ".bias"]))

    def dense(src, dst):
        _set(params, dst + ("kernel",), linear(sd[src + ".weight"]))
        if src + ".bias" in sd:
            _set(params, dst + ("bias",), _t(sd[src + ".bias"]))

    def mha(src, dst):
        w = _t(sd[src + ".attn.in_proj_weight"])
        b = _t(sd[src + ".attn.in_proj_bias"])
        C = w.shape[1]
        for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
            _set(params, dst + (name, "kernel"), w[i * C:(i + 1) * C].T)
            _set(params, dst + (name, "bias"), b[i * C:(i + 1) * C])
        dense(src + ".attn.out_proj", dst + ("out_proj",))

    def msda(src, dst):
        for name in ("sampling_offsets", "attention_weights", "value_proj",
                     "output_proj"):
            dense(f"{src}.{name}", dst + (name,))

    _set(params, ("level_embed",), _t(sd[tr + "level_embeds"]))
    dense(tr + "enc_output", ("enc_output",))
    ln(tr + "enc_output_norm", ("enc_output_norm",))
    _set(params, ("query_embed",), _t(sd[tr + "query_embed.weight"]))
    ln(tr + "decoder.norm", ("decoder_norm",))
    dense(tr + "decoder.ref_point_head.0", ("ref_point_fc1",))
    dense(tr + "decoder.ref_point_head.2", ("ref_point_fc2",))

    i = 0
    while f"{tr}encoder.layers.{i}.norms.0.weight" in sd:
        src = f"{tr}encoder.layers.{i}"
        dst = (f"encoder_layer_{i}",)
        msda(src + ".attentions.0", dst + ("attn",))
        ln(src + ".norms.0", dst + ("norm1",))
        ln(src + ".norms.1", dst + ("norm2",))
        dense(src + ".ffns.0.layers.0.0", dst + ("ffn_fc1",))
        dense(src + ".ffns.0.layers.1", dst + ("ffn_fc2",))
        i += 1
    n_dec = 0
    while f"{tr}decoder.layers.{n_dec}.norms.0.weight" in sd:
        src = f"{tr}decoder.layers.{n_dec}"
        dst = (f"decoder_layer_{n_dec}",)
        mha(src + ".attentions.0", dst + ("self_attn",))
        msda(src + ".attentions.1", dst + ("cross_attn",))
        for j in (0, 1, 2):
            ln(f"{src}.norms.{j}", dst + (f"norm{j + 1}",))
        dense(src + ".ffns.0.layers.0.0", dst + ("ffn_fc1",))
        dense(src + ".ffns.0.layers.1", dst + ("ffn_fc2",))
        n_dec += 1
    for i in range(n_dec + 1):
        dense(f"{p}cls_branches.{i}", (f"cls_branch_{i}",))
        for j, t_idx in ((0, 0), (1, 2)):
            dense(f"{p}reg_branches.{i}.{t_idx}",
                  (f"reg_branch_{i}_fc{j}",))
        dense(f"{p}reg_branches.{i}.4", (f"reg_branch_{i}_out",))
    return params


def convert_uniperceiver_backbone(sd: Dict[str, Any], prefix: str = ""):
    """Convert a reference UniPerceiverAdapter state_dict subtree ->
    (params, batch_stats).

    Key scheme from reference `wsdm2023/mmdet_custom/models/backbones/base/
    uniperceiver.py` (MultiModelBertLayer: self_attn.in_proj/out_proj,
    linear1/linear2, norm1/norm2, gamma_1/gamma_2; VisualPatchEmbedding;
    TokenBaseEmbedding) and `uniperceiver_adapter.py:101-160` (adapter keys,
    optional GroundingCrossAttention stack). Run
    `tools/convert_checkpoint.py --kind uniperceiver` first for official
    Uni-Perceiver releases (`in_proj_weight` -> `in_proj.weight` etc.)."""
    params: dict = {}
    stats: dict = {}
    p = prefix

    def ln(src, dst):
        _set(params, dst + ("scale",), _t(sd[src + ".weight"]))
        _set(params, dst + ("bias",), _t(sd[src + ".bias"]))

    def dense(src, dst):
        _set(params, dst + ("kernel",), linear(sd[src + ".weight"]))
        if src + ".bias" in sd:
            _set(params, dst + ("bias",), _t(sd[src + ".bias"]))

    # --- trunk ---
    t = ("trunk",)
    depth = 0
    while f"{p}layers.{depth}.norm1.weight" in sd:
        depth += 1
    for i in range(depth):
        src = f"{p}layers.{i}"
        dst = t + (f"layers_{i}",)
        dense(src + ".self_attn.in_proj", dst + ("self_attn", "in_proj"))
        dense(src + ".self_attn.out_proj", dst + ("self_attn", "out_proj"))
        dense(src + ".linear1", dst + ("linear1",))
        dense(src + ".linear2", dst + ("linear2",))
        ln(src + ".norm1", dst + ("norm1",))
        ln(src + ".norm2", dst + ("norm2",))
        _set(params, dst + ("gamma_1",), _t(sd[src + ".gamma_1"]))
        _set(params, dst + ("gamma_2",), _t(sd[src + ".gamma_2"]))

    ve = p + "visual_embed."
    _set(params, t + ("visual_embed", "proj", "kernel"),
         conv(sd[ve + "patch_embed.proj.weight"]))
    _set(params, t + ("visual_embed", "proj", "bias"),
         _t(sd[ve + "patch_embed.proj.bias"]))
    _set(params, t + ("visual_embed", "spatial_pos_embed"),
         _t(sd[ve + "patch_embed.spatial_pos_embed.weight"]))
    _set(params, t + ("visual_embed", "temporal_pos_embed"),
         _t(sd[ve + "patch_embed.temporal_pos_embed.weight"]))
    ln(ve + "embeddings_norm", t + ("visual_embed", "embeddings_norm"))

    te = p + "token_embed."
    _set(params, t + ("token_embed", "embeddings", "embedding"),
         _t(sd[te + "embeddings.weight"]))
    _set(params, t + ("token_embed", "pos_embed"),
         _t(sd[te + "embeddings_pos.position_embeddings.weight"]))
    _set(params, t + ("token_embed", "token_type"),
         _t(sd[te + "embeddings_token_type.weight"]))
    ln(te + "embeddings_norm", t + ("token_embed", "embeddings_norm"))

    # --- grounding cross-attention stack (optional) ---
    g = 0
    while f"{p}cross_attn.{g}.norm1.weight" in sd:
        src = f"{p}cross_attn.{g}"
        dst = (f"grounding_{g}",)
        ln(src + ".norm1", dst + ("norm1",))
        ln(src + ".norm2", dst + ("norm2",))
        # fused kv Linear -> split k/v projections
        kvw = linear(sd[src + ".attn.kv.weight"])          # (C, 2C)
        C = kvw.shape[0]
        _set(params, dst + ("k_proj", "kernel"), kvw[:, :C])
        _set(params, dst + ("v_proj", "kernel"), kvw[:, C:])
        if src + ".attn.kv.bias" in sd:
            kvb = _t(sd[src + ".attn.kv.bias"])
            _set(params, dst + ("k_proj", "bias"), kvb[:C])
            _set(params, dst + ("v_proj", "bias"), kvb[C:])
        dense(src + ".attn.q", dst + ("q_proj",))
        dense(src + ".attn.proj", dst + ("out_proj",))
        dense(src + ".mlp.fc1", dst + ("mlp_fc1",))
        dense(src + ".mlp.fc2", dst + ("mlp_fc2",))
        g += 1

    # --- adapter ---
    convert_adapter_keys(sd, p, params, stats)
    return params, stats


def convert_detector_checkpoint(ckpt):
    """Full reference Mask R-CNN / Cascade / HTC++ checkpoint -> flax
    variables (mmdet key scheme: backbone/neck/rpn_head/roi_head).

    Handles: ViT-Adapter or BEiT-Adapter backbones (auto-detected), FPN or
    ChannelMapperWithPooling necks, the HTC++ ExtraAttention pre-neck,
    single or per-stage bbox/mask heads (incl. HTC mask info flow), and the
    HTC FusedSemanticHead."""
    sd = unwrap_state_dict(ckpt)
    if "backbone.blocks.0.attn.q_bias" in sd:
        bk_params, bk_stats = convert_beit_backbone(sd, prefix="backbone.")
    else:
        bk_params, bk_stats = convert_vit_adapter_backbone(sd,
                                                           prefix="backbone.")
    params: dict = {"backbone": bk_params}
    stats: dict = {"backbone": bk_stats}

    def ln(src, dst):
        _set(params, dst + ("scale",), _t(sd[src + ".weight"]))
        _set(params, dst + ("bias",), _t(sd[src + ".bias"]))

    def dense(src, dst):
        _set(params, dst + ("kernel",), linear(sd[src + ".weight"]))
        if src + ".bias" in sd:
            _set(params, dst + ("bias",), _t(sd[src + ".bias"]))

    def conv2d(src, dst, tf=conv):
        _set(params, dst + ("kernel",), tf(sd[src + ".weight"]))
        if src + ".bias" in sd:
            _set(params, dst + ("bias",), _t(sd[src + ".bias"]))

    # --- neck (possibly a Sequential list: ExtraAttention then FPN) ---
    necks = [""]
    if "neck.0.norm1.weight" in sd or "neck.1.lateral_convs.0.conv.weight" in sd:
        necks = ["0.", "1."]
    for np_ in necks:
        n = f"neck.{np_}"
        if f"{n}norm1.weight" in sd:  # ExtraAttention
            dst = ("extra_attn",)
            ln(f"{n}norm1", dst + ("norm1_0",))
            dense(f"{n}attn.qkv", dst + ("attn_0", "qkv"))
            dense(f"{n}attn.proj", dst + ("attn_0", "proj"))
            if f"{n}norm2.weight" in sd:
                ln(f"{n}norm2", dst + ("norm2_0",))
                dense(f"{n}ffn.fc1", dst + ("ffn_fc1_0",))
                dense(f"{n}ffn.fc2", dst + ("ffn_fc2_0",))
            if f"{n}final_norm.weight" in sd:
                ln(f"{n}final_norm", dst + ("final_norm_0",))
            if f"{n}gamma_1" in sd:
                _set(params, dst + ("gamma_1_0",), _t(sd[f"{n}gamma_1"]))
                _set(params, dst + ("gamma_2_0",), _t(sd[f"{n}gamma_2"]))
        i = 0
        while f"{n}lateral_convs.{i}.conv.weight" in sd:  # FPN
            conv2d(f"{n}lateral_convs.{i}.conv", ("neck", f"lateral_{i}"))
            i += 1
        i = 0
        while f"{n}fpn_convs.{i}.conv.weight" in sd:
            # fpn_convs may outnumber laterals: add_extra_convs='on_output'
            conv2d(f"{n}fpn_convs.{i}.conv", ("neck", f"fpn_conv_{i}"))
            i += 1
        i = 0
        while f"{n}convs.{i}.conv.weight" in sd:  # ChannelMapperWithPooling
            conv2d(f"{n}convs.{i}.conv", ("neck", f"conv_{i}"))
            _set(params, ("neck", f"gn_{i}", "scale"),
                 _t(sd[f"{n}convs.{i}.gn.weight"]))
            _set(params, ("neck", f"gn_{i}", "bias"),
                 _t(sd[f"{n}convs.{i}.gn.bias"]))
            i += 1

    # --- Sparse R-CNN (EmbeddingRPNHead + DII stages) ---
    if "rpn_head.init_proposal_features.weight" in sd:
        _set(params, ("init_proposal_features",),
             _t(sd["rpn_head.init_proposal_features.weight"]))
        _set(params, ("init_proposal_boxes",),
             _t(sd["rpn_head.init_proposal_bboxes.weight"]))

        def mha(src, dst):
            w = _t(sd[src + ".in_proj_weight"])
            b = _t(sd[src + ".in_proj_bias"])
            Cd = w.shape[1]
            for i, name in enumerate(("q_proj", "k_proj", "v_proj")):
                _set(params, dst + (name, "kernel"),
                     w[i * Cd:(i + 1) * Cd].T)
                _set(params, dst + (name, "bias"), b[i * Cd:(i + 1) * Cd])
            dense(src + ".out_proj", dst + ("out_proj",))

        s = 0
        while f"roi_head.bbox_head.{s}.fc_cls.weight" in sd:
            src = f"roi_head.bbox_head.{s}"
            dst = (f"stage_{s}",)
            mha(src + ".attention.attn", dst + ("self_attn",))
            ln(src + ".attention_norm", dst + ("norm_attn",))
            ic = src + ".instance_interactive_conv"
            dense(ic + ".dynamic_layer", dst + ("dynamic_conv",
                                                "dynamic_layer"))
            ln(ic + ".norm_in", dst + ("dynamic_conv", "norm1"))
            ln(ic + ".norm_out", dst + ("dynamic_conv", "norm2"))
            dense(ic + ".fc_layer", dst + ("dynamic_conv", "fc_out"))
            ln(ic + ".fc_norm", dst + ("dynamic_conv", "norm3"))
            ln(src + ".instance_interactive_conv_norm",
               dst + ("norm_inter",))
            dense(src + ".ffn.layers.0.0", dst + ("ffn_fc1",))
            dense(src + ".ffn.layers.1", dst + ("ffn_fc2",))
            ln(src + ".ffn_norm", dst + ("norm_ffn",))
            # towers: ModuleList [Linear, LN, ReLU] repeated
            for j in range(1):
                dense(f"{src}.cls_fcs.{3 * j}", dst + (f"cls_fc_{j}",))
                ln(f"{src}.cls_fcs.{3 * j + 1}", dst + (f"cls_ln_{j}",))
            for j in range(3):
                dense(f"{src}.reg_fcs.{3 * j}", dst + (f"reg_fc_{j}",))
                ln(f"{src}.reg_fcs.{3 * j + 1}", dst + (f"reg_ln_{j}",))
            dense(src + ".fc_cls", dst + ("fc_cls",))
            dense(src + ".fc_reg", dst + ("fc_reg",))
            s += 1
        return {"params": params, "batch_stats": stats}

    # --- single-stage ATSS/GFL head ---
    for fam in ("atss", "gfl"):
        if f"bbox_head.{fam}_cls.weight" not in sd:
            continue
        dst = ("head",)
        for tower, src_t in (("cls_tower", "cls_convs"),
                             ("reg_tower", "reg_convs")):
            i = 0
            while f"bbox_head.{src_t}.{i}.conv.weight" in sd:
                conv2d(f"bbox_head.{src_t}.{i}.conv",
                       dst + (tower, f"conv_{i}"))
                _set(params, dst + (tower, f"gn_{i}", "scale"),
                     _t(sd[f"bbox_head.{src_t}.{i}.gn.weight"]))
                _set(params, dst + (tower, f"gn_{i}", "bias"),
                     _t(sd[f"bbox_head.{src_t}.{i}.gn.bias"]))
                i += 1
        conv2d(f"bbox_head.{fam}_cls", dst + ("atss_cls",))
        conv2d(f"bbox_head.{fam}_reg", dst + ("atss_reg",))
        if "bbox_head.atss_centerness.weight" in sd:
            conv2d("bbox_head.atss_centerness", dst + ("atss_centerness",))
        scales, i = [], 0
        while f"bbox_head.scales.{i}.scale" in sd:
            scales.append(float(_t(sd[f"bbox_head.scales.{i}.scale"])))
            i += 1
        if scales:
            _set(params, dst + ("scales",), np.asarray(scales, np.float32))
        return {"params": params, "batch_stats": stats}

    # --- RPN ---
    conv2d("rpn_head.rpn_conv", ("rpn_head", "rpn_conv"))
    conv2d("rpn_head.rpn_cls", ("rpn_head", "rpn_cls"))
    conv2d("rpn_head.rpn_reg", ("rpn_head", "rpn_reg"))

    # --- RoI heads ---
    def shared_fc0(src, dst, roi=7):
        """mmdet flattens RoI feats channel-FIRST; our NHWC layout flattens
        channel-LAST — permute fc rows accordingly."""
        w = _t(sd[src + ".weight"])                 # (out, C*roi*roi)
        out = w.shape[0]
        C = w.shape[1] // (roi * roi)
        w = w.reshape(out, C, roi, roi).transpose(0, 2, 3, 1)
        _set(params, dst + ("kernel",), w.reshape(out, -1).T)
        _set(params, dst + ("bias",), _t(sd[src + ".bias"]))

    def bbox_head(src, dst):
        shared_fc0(src + ".shared_fcs.0", dst + ("fc1",))
        dense(src + ".shared_fcs.1", dst + ("fc2",))
        dense(src + ".fc_cls", dst + ("fc_cls",))
        dense(src + ".fc_reg", dst + ("fc_reg",))

    def mask_head(src, dst):
        i = 0
        while f"{src}.convs.{i}.conv.weight" in sd:
            conv2d(f"{src}.convs.{i}.conv", dst + (f"conv_{i}",))
            i += 1
        if f"{src}.conv_res_feat.conv.weight" in sd:  # HTC info flow
            conv2d(f"{src}.conv_res_feat.conv", dst + ("conv_res_feat",))
        conv2d(f"{src}.upsample", dst + ("upsample",), tf=conv_transpose)
        conv2d(f"{src}.conv_logits", dst + ("conv_logits",))

    r = "roi_head."
    if r + "bbox_head.fc_cls.weight" in sd:  # single-stage RoI (Mask R-CNN)
        bbox_head(r + "bbox_head", ("bbox_head",))
        if r + "mask_head.conv_logits.weight" in sd:
            mask_head(r + "mask_head", ("mask_head",))
    else:  # cascade
        s = 0
        while f"{r}bbox_head.{s}.fc_cls.weight" in sd:
            bbox_head(f"{r}bbox_head.{s}", (f"bbox_head_{s}",))
            if f"{r}mask_head.{s}.conv_logits.weight" in sd:
                mask_head(f"{r}mask_head.{s}", (f"mask_head_{s}",))
            s += 1

    # --- HTC semantic-fusion branch ---
    sh = r + "semantic_head."
    if sh + "conv_logits.weight" in sd:
        dst = ("semantic_head",)
        fusion = 1  # mmdet fusion_level for HTC
        i = 0
        while f"{sh}lateral_convs.{i}.conv.weight" in sd:
            name = "lateral_fuse" if i == fusion else f"lateral_{i}"
            conv2d(f"{sh}lateral_convs.{i}.conv", dst + (name,))
            i += 1
        i = 0
        while f"{sh}convs.{i}.conv.weight" in sd:
            conv2d(f"{sh}convs.{i}.conv", dst + (f"conv_{i}",))
            i += 1
        conv2d(sh + "conv_embedding.conv", dst + ("conv_embedding",))
        conv2d(sh + "conv_logits", dst + ("conv_seg",))

    return {"params": params, "batch_stats": stats}


def convert_grounding_dino_checkpoint(ckpt):
    """Full reference DINO / GroundingDINO checkpoint -> flax variables:
    backbone (UniPerceiver-Adapter, BEiT-Adapter or ViT-Adapter,
    auto-detected) + ChannelMapper neck + DINO transformer head + CDN label
    embedding. Aux FPN seg-head keys (train-only branch) are ignored."""
    sd = unwrap_state_dict(ckpt)
    if "backbone.layers.0.self_attn.in_proj.weight" in sd:
        bk_params, bk_stats = convert_uniperceiver_backbone(sd,
                                                            prefix="backbone.")
    elif "backbone.blocks.0.attn.q_bias" in sd:
        bk_params, bk_stats = convert_beit_backbone(sd, prefix="backbone.")
    else:
        bk_params, bk_stats = convert_vit_adapter_backbone(sd,
                                                           prefix="backbone.")
    head = convert_dino_head(sd, prefix="bbox_head.")

    neck: dict = {}
    i = 0
    while f"neck.convs.{i}.conv.weight" in sd:
        _set(neck, (f"conv_{i}", "kernel"),
             conv(sd[f"neck.convs.{i}.conv.weight"]))
        _set(neck, (f"gn_{i}", "scale"), _t(sd[f"neck.convs.{i}.gn.weight"]))
        _set(neck, (f"gn_{i}", "bias"), _t(sd[f"neck.convs.{i}.gn.bias"]))
        i += 1
    j = 0
    while f"neck.extra_convs.{j}.conv.weight" in sd:
        _set(neck, (f"extra_conv_{j}", "kernel"),
             conv(sd[f"neck.extra_convs.{j}.conv.weight"]))
        _set(neck, (f"extra_gn_{j}", "scale"),
             _t(sd[f"neck.extra_convs.{j}.gn.weight"]))
        _set(neck, (f"extra_gn_{j}", "bias"),
             _t(sd[f"neck.extra_convs.{j}.gn.bias"]))
        j += 1

    params = {"backbone": bk_params, "neck": neck, "transformer": head,
              "label_embed": _t(sd["bbox_head.label_embedding.weight"])}
    stats = {"backbone": bk_stats}
    return {"params": params, "batch_stats": stats}


def convert_segmentor_checkpoint(ckpt, target_grid: Optional[int] = None):
    """Full reference segmentor checkpoint -> {'params':..., 'batch_stats':...}.

    Detects the trunk family (BEiT has a cls_token + q_bias keys) and the head
    family (UperNet vs Mask2Former) from the key scheme.
    """
    sd = unwrap_state_dict(ckpt)
    if "backbone.blocks.0.attn.q_bias" in sd:
        bk_params, bk_stats = convert_beit_backbone(sd, prefix="backbone.",
                                                    target_grid=target_grid)
    else:
        bk_params, bk_stats = convert_vit_adapter_backbone(sd, prefix="backbone.")
    if "decode_head.pixel_decoder.level_encoding.weight" in sd:
        # Mask2Former (the deformable pixel decoder has level_encoding;
        # MaskFormer's plain/encoder pixel decoders do not)
        hd_params, hd_stats = convert_mask2former_head(sd)
        hd_params = {"decode_head": hd_params}
        hd_stats = {"decode_head": hd_stats} if hd_stats else {}
    elif "panoptic_head.pixel_decoder.mask_feature.weight" in sd:
        # mmdet COCO-panoptic Mask2Former: same head under `panoptic_head.`
        # (the fusion head carries no parameters)
        hd_params, _ = convert_mask2former_head(sd, prefix="panoptic_head.")
        hd_params = {"decode_head": hd_params}
        hd_stats = {}
    elif "decode_head.transformer_decoder.post_norm.weight" in sd:
        # MaskFormer (plain/encoder pixel decoder)
        hd_params = {"decode_head": convert_maskformer_head(sd)}
        hd_stats = {}
    else:
        hd_params, hd_stats = convert_upernet_heads(sd)
    params = {"backbone": bk_params, **hd_params}
    stats = {"backbone": bk_stats, **hd_stats}
    return {"params": params, "batch_stats": stats}
