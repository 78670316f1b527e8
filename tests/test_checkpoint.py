"""Checkpoint converter tests.

(1) Layout rules verified numerically against torch ops.
(2) Structural: a synthetic reference-named state_dict converts into exactly
    the variable tree our models expect (tree structure + shapes match init).
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F
from flax import linen as nn

from vitadapter.utils import checkpoint as ckpt


def test_linear_layout():
    w = torch.randn(8, 5)
    b = torch.randn(8)
    x = torch.randn(3, 5)
    ref = F.linear(x, w, b).numpy()
    ours = np.asarray(x.numpy() @ ckpt.linear(w) + b.numpy())
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_conv_layout():
    w = torch.randn(6, 3, 3, 3)
    x = torch.randn(2, 3, 8, 8)
    ref = F.conv2d(x, w, padding=1).permute(0, 2, 3, 1).numpy()
    ours = jax.lax.conv_general_dilated(
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(ckpt.conv(w)), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_depthwise_conv_layout():
    C = 4
    w = torch.randn(C, 1, 3, 3)
    x = torch.randn(1, C, 6, 6)
    ref = F.conv2d(x, w, padding=1, groups=C).permute(0, 2, 3, 1).numpy()
    ours = jax.lax.conv_general_dilated(
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(ckpt.dwconv(w)), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def test_conv_transpose_layout():
    """torch ConvTranspose2d(k=2, s=2) == flax ConvTranspose with converted w."""
    tin, tout = 5, 7
    w = torch.randn(tin, tout, 2, 2)
    b = torch.randn(tout)
    x = torch.randn(2, tin, 4, 6)
    ref = F.conv_transpose2d(x, w, b, stride=2).permute(0, 2, 3, 1).numpy()

    mod = nn.ConvTranspose(tout, (2, 2), strides=(2, 2))
    vars_ = {"params": {"kernel": jnp.asarray(ckpt.conv_transpose(w)),
                        "bias": jnp.asarray(b.numpy())}}
    ours = mod.apply(vars_, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-4)


def _inverse_backbone(variables, prefix="backbone."):
    """Build a reference-named torch state_dict from our variable tree.

    This is the inverse of convert_vit_adapter_backbone's documented mapping —
    used to check converter/model structural agreement offline (real-name
    fidelity is validated against released checkpoints when available).
    """
    sd = {}
    params = variables["params"]
    stats = variables["batch_stats"]

    def inv_dense(node, name):
        sd[name + ".weight"] = np.asarray(node["kernel"]).T
        if "bias" in node:
            sd[name + ".bias"] = np.asarray(node["bias"])

    def inv_conv(node, name, tf="conv"):
        k = np.asarray(node["kernel"])
        if tf == "conv":
            sd[name + ".weight"] = k.transpose(3, 2, 0, 1)
        elif tf == "dw":
            sd[name + ".weight"] = k.transpose(3, 2, 0, 1)
        elif tf == "convT":
            sd[name + ".weight"] = k[::-1, ::-1].transpose(2, 3, 0, 1).copy()
        if "bias" in node:
            sd[name + ".bias"] = np.asarray(node["bias"])

    def inv_ln(node, name):
        sd[name + ".weight"] = np.asarray(node["scale"])
        sd[name + ".bias"] = np.asarray(node["bias"])

    def inv_bn(pnode, snode, name):
        sd[name + ".weight"] = np.asarray(pnode["scale"])
        sd[name + ".bias"] = np.asarray(pnode["bias"])
        sd[name + ".running_mean"] = np.asarray(snode["mean"])
        sd[name + ".running_var"] = np.asarray(snode["var"])

    def inv_msda(node, name):
        for n in ("sampling_offsets", "attention_weights", "value_proj",
                  "output_proj"):
            inv_dense(node[n], f"{name}.{n}")

    def inv_extractor(node, name):
        inv_ln(node["query_norm"], name + ".query_norm")
        inv_ln(node["feat_norm"], name + ".feat_norm")
        inv_msda(node["attn"], name + ".attn")
        if "ffn" in node:
            inv_ln(node["ffn_norm"], name + ".ffn_norm")
            inv_dense(node["ffn"]["fc1"], name + ".ffn.fc1")
            inv_dense(node["ffn"]["fc2"], name + ".ffn.fc2")
            inv_conv(node["ffn"]["dwconv"]["dwconv"], name + ".ffn.dwconv.dwconv",
                     "dw")

    p = prefix
    sd[p + "pos_embed"] = np.asarray(params["vit"]["pos_embed"])
    inv_conv(params["vit"]["patch_embed"]["proj"], p + "patch_embed.proj")
    i = 0
    while f"blocks_{i}" in params["vit"]:
        blk = params["vit"][f"blocks_{i}"]
        name = f"{p}blocks.{i}"
        inv_ln(blk["norm1"], name + ".norm1")
        inv_ln(blk["norm2"], name + ".norm2")
        inv_dense(blk["attn"]["qkv"], name + ".attn.qkv")
        inv_dense(blk["attn"]["proj"], name + ".attn.proj")
        inv_dense(blk["mlp"]["fc1"], name + ".mlp.fc1")
        inv_dense(blk["mlp"]["fc2"], name + ".mlp.fc2")
        if "gamma1" in blk:
            sd[name + ".gamma1"] = np.asarray(blk["gamma1"])
            sd[name + ".gamma2"] = np.asarray(blk["gamma2"])
        i += 1
    sd[p + "level_embed"] = np.asarray(params["level_embed"])
    spm_p, spm_s = params["spm"], stats["spm"]
    for t_idx, nm in {0: "stem1", 3: "stem2", 6: "stem3"}.items():
        inv_conv(spm_p[f"{nm}_conv"], f"{p}spm.stem.{t_idx}")
        inv_bn(spm_p[f"{nm}_bn"], spm_s[f"{nm}_bn"], f"{p}spm.stem.{t_idx+1}")
    for c in (2, 3, 4):
        inv_conv(spm_p[f"conv{c}_conv"], f"{p}spm.conv{c}.0")
        inv_bn(spm_p[f"conv{c}_bn"], spm_s[f"conv{c}_bn"], f"{p}spm.conv{c}.1")
    for f in (1, 2, 3, 4):
        inv_conv(spm_p[f"fc{f}"], f"{p}spm.fc{f}")
    i = 0
    while f"interactions_{i}" in params:
        node = params[f"interactions_{i}"]
        name = f"{p}interactions.{i}"
        inv_ln(node["injector"]["query_norm"], name + ".injector.query_norm")
        inv_ln(node["injector"]["feat_norm"], name + ".injector.feat_norm")
        inv_msda(node["injector"]["attn"], name + ".injector.attn")
        sd[name + ".injector.gamma"] = np.asarray(node["injector"]["gamma"])
        inv_extractor(node["extractor"], name + ".extractor")
        for j in (0, 1):
            if f"extra_extractors_{j}" in node:
                inv_extractor(node[f"extra_extractors_{j}"],
                              name + f".extra_extractors.{j}")
        i += 1
    inv_conv(params["up"], p + "up", "convT")
    for n in (1, 2, 3, 4):
        inv_bn(params[f"norm{n}"], stats[f"norm{n}"], f"{p}norm{n}")
    return sd


def test_backbone_convert_structure_roundtrip():
    from vitadapter.models.vit_adapter import ViTAdapter

    model = ViTAdapter(patch_size=16, embed_dim=48, depth=4, num_heads=4,
                       deform_num_heads=4, conv_inplane=16,
                       interaction_indexes=((0, 0), (1, 1), (2, 2), (3, 3)))
    x = jnp.zeros((1, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    sd = _inverse_backbone(variables)
    params, stats = ckpt.convert_vit_adapter_backbone(sd, prefix="backbone.")

    got = jax.tree_util.tree_map(np.shape, params)
    want = jax.tree_util.tree_map(
        np.shape, jax.tree_util.tree_map(np.asarray, variables["params"]))
    assert got == want
    # converted values run through the model
    out = model.apply({"params": params,
                       "batch_stats": stats}, x)
    assert out[0].shape == (1, 8, 8, 48)
    # numerically identical to original params (roundtrip is lossless)
    orig = model.apply(variables, x)
    for a, b in zip(out, orig):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_unwrap_state_dict_roots_and_prefixes():
    inner = {"module.pos_embed": 1, "encoder.blocks.0.w": 2}
    assert ckpt.unwrap_state_dict({"state_dict": inner}) == {
        "pos_embed": 1, "blocks.0.w": 2}
    assert ckpt.unwrap_state_dict({"model": inner})["pos_embed"] == 1


def _torch_m2f_head_sd(params, n_dec, n_enc):
    """Build a reference-named (mmseg Mask2FormerHead) state_dict whose
    shapes invert our flax tree; values random except encoder weights,
    which are layer-constant to assert stacking order."""
    sd = {}
    d = "decode_head."

    def dense_inv(dst, kernel, bias=True):
        sd[dst + ".weight"] = torch.randn(*np.asarray(kernel).T.shape)
        if bias:
            sd[dst + ".bias"] = torch.randn(np.asarray(kernel).shape[1])

    def ln_inv(dst, scale):
        sd[dst + ".weight"] = torch.randn(*np.asarray(scale).shape)
        sd[dst + ".bias"] = torch.randn(*np.asarray(scale).shape)

    def convgn_inv(dst, sub):
        k = np.asarray(sub["conv"]["kernel"])
        sd[dst + ".conv.weight"] = torch.randn(*k.transpose(3, 2, 0, 1).shape)
        if "bias" in sub["conv"]:
            sd[dst + ".conv.bias"] = torch.randn(k.shape[3])
        ln_inv(dst + ".gn", sub["gn"]["scale"])

    for name in ("query_embed", "query_feat", "level_embed"):
        sd[f"{d}{name}.weight"] = torch.randn(*np.asarray(params[name]).shape)
    dense_inv(d + "cls_embed", params["cls_embed"]["kernel"])
    for i, t_idx in enumerate((0, 2, 4)):
        dense_inv(f"{d}mask_embed.{t_idx}",
                  params[f"mask_embed_{i}"]["kernel"])
    ln_inv(d + "transformer_decoder.post_norm",
           params["post_norm"]["scale"])
    C = np.asarray(params["query_embed"]).shape[1]
    for i in range(n_dec):
        src = f"{d}transformer_decoder.layers.{i}"
        for a in (0, 1):
            sd[f"{src}.attentions.{a}.attn.in_proj_weight"] = torch.randn(3 * C, C)
            sd[f"{src}.attentions.{a}.attn.in_proj_bias"] = torch.randn(3 * C)
            sd[f"{src}.attentions.{a}.attn.out_proj.weight"] = torch.randn(C, C)
            sd[f"{src}.attentions.{a}.attn.out_proj.bias"] = torch.randn(C)
        lp = params[f"decoder_layer_{i}"]
        for j in (0, 1, 2):
            ln_inv(f"{src}.norms.{j}", lp[f"norm{j + 1}"]["scale"])
        dense_inv(f"{src}.ffns.0.layers.0.0", lp["ffn_fc1"]["kernel"])
        dense_inv(f"{src}.ffns.0.layers.1", lp["ffn_fc2"]["kernel"])

    pd = d + "pixel_decoder."
    pp = params["pixel_decoder"]
    sd[pd + "level_encoding.weight"] = torch.randn(
        *np.asarray(pp["level_encoding"]).shape)
    i = 0
    while f"input_conv_{i}" in pp:
        convgn_inv(f"{pd}input_convs.{i}", pp[f"input_conv_{i}"])
        i += 1
    i = 0
    while f"lateral_conv_{i}" in pp:
        convgn_inv(f"{pd}lateral_convs.{i}", pp[f"lateral_conv_{i}"])
        convgn_inv(f"{pd}output_convs.{i}", pp[f"output_conv_{i}"])
        i += 1
    mk = np.asarray(pp["mask_feature"]["kernel"])
    sd[pd + "mask_feature.weight"] = torch.randn(*mk.transpose(3, 2, 0, 1).shape)
    sd[pd + "mask_feature.bias"] = torch.randn(mk.shape[3])

    enc = pp["encoder_layers"]["layer"]
    for li in range(n_enc):
        src = f"{pd}encoder.layers.{li}"
        for name in ("sampling_offsets", "attention_weights", "value_proj",
                     "output_proj"):
            k = np.asarray(enc["attn"][name]["kernel"])[li]
            # layer-constant fill: converter must keep layer order
            sd[f"{src}.attentions.0.{name}.weight"] = torch.full(
                tuple(k.T.shape), float(li))
            sd[f"{src}.attentions.0.{name}.bias"] = torch.full(
                (k.shape[1],), float(li))
        for j, norm in ((0, "norm1"), (1, "norm2")):
            s = np.asarray(enc[norm]["scale"])[li]
            sd[f"{src}.norms.{j}.weight"] = torch.full(tuple(s.shape), float(li))
            sd[f"{src}.norms.{j}.bias"] = torch.full(tuple(s.shape), float(li))
        for fc, tsrc in (("ffn_fc1", ".ffns.0.layers.0.0"),
                         ("ffn_fc2", ".ffns.0.layers.1")):
            k = np.asarray(enc[fc]["kernel"])[li]
            sd[f"{src}{tsrc}.weight"] = torch.full(tuple(k.T.shape), float(li))
            sd[f"{src}{tsrc}.bias"] = torch.full((k.shape[1],), float(li))
    return sd


def test_mask2former_head_convert_structure():
    from vitadapter.heads.mask2former import Mask2FormerHead

    head = Mask2FormerHead(num_classes=7, num_queries=5, feat_channels=32,
                           out_channels=32, num_decoder_layers=3,
                           num_heads=4, decoder_ffn_dim=64,
                           pixel_encoder_ffn_dim=64, pixel_encoder_heads=4)
    feats = [jnp.zeros((1, 32 // s, 32 // s, 32)) for s in (1, 2, 4, 8)]
    variables = jax.jit(head.init)(jax.random.PRNGKey(0), feats)
    p0 = jax.tree_util.tree_map(np.asarray, variables["params"])

    sd = _torch_m2f_head_sd(p0, n_dec=3, n_enc=6)
    params, stats = ckpt.convert_mask2former_head(sd)
    got = jax.tree_util.tree_map(np.shape, params)
    want = jax.tree_util.tree_map(np.shape, p0)
    assert got == want
    # encoder layers keep per-layer order in the stacked scan layout
    enc = params["pixel_decoder"]["encoder_layers"]["layer"]
    for li in range(6):
        assert float(enc["attn"]["value_proj"]["kernel"][li][0, 0]) == li
        assert float(enc["norm2"]["bias"][li][0]) == li
    # converted values run through the head
    cls_list, mask_list = jax.jit(
        lambda v, f: head.apply(v, f))({"params": params}, feats)
    assert cls_list[-1].shape == (1, 5, 8)
