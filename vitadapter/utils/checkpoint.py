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

    conv2d(p + "up", ("up",), tf=conv_transpose)
    for n in (1, 2, 3, 4):
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
    hd_params, hd_stats = convert_upernet_heads(sd)
    params = {"backbone": bk_params, **hd_params}
    stats = {"backbone": bk_stats, **hd_stats}
    return {"params": params, "batch_stats": stats}
